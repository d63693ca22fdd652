"""Structured grounding-span extraction: OCR text -> (label, bbox) rows.

The reference parses grounding tags ad hoc inside each script
(match_tags + eval of coord lists + int(c/999*dim) scaling,
run_dpsk_ocr_pdf.py:124-191, Lib/postprocessor.py:93-139). Here it is
one stateless vectorized stage producing a queryable table: one row per
(document, tag, box), with both virtual-grid and pixel coordinates.
"""

from __future__ import annotations

from typing import Optional

import pyarrow as pa

from ..functions.cleaning import TAG_PATTERN
from ..functions.grounding import extract_coordinates_and_label, scale_box

GROUNDING_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("offset", pa.int32()),
        ("tag_index", pa.int32()),   # tag order within the span text
        ("box_index", pa.int32()),   # box order within the tag
        ("label", pa.string()),
        ("is_image", pa.bool_()),
        ("vx1", pa.float64()),       # 0..999 virtual grid (model output)
        ("vy1", pa.float64()),
        ("vx2", pa.float64()),
        ("vy2", pa.float64()),
        ("px1", pa.int32()),         # pixel coords (scaled; -1 if degenerate)
        ("py1", pa.int32()),
        ("px2", pa.int32()),
        ("py2", pa.int32()),
        ("degenerate", pa.bool_()),  # x1>=x2 or y1>=y2 skip rule
    ]
)


def extract_grounding_rows(batch: pa.Table, width: int = 999, height: int = 999) -> pa.Table:
    """Exploded span rows (doc_id, offset, text, ...) -> grounding rows.

    Parse failures (the reference's eval-raises path) produce no row for
    that tag, matching extract_coordinates_and_label -> None
    (run_dpsk_ocr_pdf.py:139-149).
    """
    rows = []
    for doc_id, offset, text in zip(
        batch.column("doc_id").to_pylist(),
        batch.column("offset").to_pylist(),
        batch.column("text").to_pylist(),
    ):
        for ti, m in enumerate(TAG_PATTERN.findall(text)):
            parsed = extract_coordinates_and_label(m)
            if parsed is None:
                continue
            label, boxes = parsed
            for bi, box in enumerate(boxes):
                scaled = scale_box(box, width, height)
                rows.append(
                    {
                        "doc_id": doc_id,
                        "offset": offset,
                        "tag_index": ti,
                        "box_index": bi,
                        "label": label,
                        "is_image": "<|ref|>image<|/ref|>" in m[0],
                        "vx1": box[0], "vy1": box[1], "vx2": box[2], "vy2": box[3],
                        "px1": scaled[0] if scaled else -1,
                        "py1": scaled[1] if scaled else -1,
                        "px2": scaled[2] if scaled else -1,
                        "py2": scaled[3] if scaled else -1,
                        "degenerate": scaled is None,
                    }
                )
    if not rows:
        return GROUNDING_SCHEMA.empty_table()
    return pa.Table.from_pylist(rows, schema=GROUNDING_SCHEMA)


def grounding_spans(flat_ds, width: int = 999, height: int = 999):
    """Dataset of exploded (OCR'd) spans -> grounding-span table."""
    return flat_ds.map_batches(
        lambda b: extract_grounding_rows(b, width, height), batch_format="pyarrow"
    )
