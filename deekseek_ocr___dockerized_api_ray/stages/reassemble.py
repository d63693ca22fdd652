"""Per-document reassembly: the engine's one semantic shuffle.

OCR'd spans rejoin their document by ``groupby("doc_id")`` -- key-based,
never positional, so spans may arrive from any block in any order
(SURVEY.md section 2.5/2.6 G3). Inside each group we sort by ``offset``
(the reference's page order is Python list order,
run_dpsk_ocr_pdf.py:302; ours is explicit data), join with the page
split marker (start_server.py:467) and clean per the API path
(Lib/postprocessor.py:177-237).

Mode semantics mirror the CLI presets (pdf_to_markdown_cli.py:353-364):
``markdown``/``ocr`` clean with remove_page_splits; ``custom`` means
raw output -- no cleaning (pdf_to_markdown_cli.py:354-360).
"""

from __future__ import annotations

import pyarrow as pa

from ..functions.cleaning import clean_content, join_pages
from ..schema import EXTRACTED_SCHEMA

_ERROR_PREFIX = "[Error processing page "


def build_document(group: pa.Table, mode: str = "markdown") -> pa.Table:
    """One group (all spans of one doc) -> one EXTRACTED_SCHEMA row."""
    g = group.sort_by("offset")
    doc_id = g.column("doc_id")[0].as_py()
    texts = g.column("text").to_pylist()
    joined = join_pages(texts)
    if mode == "custom":
        markdown = joined  # raw output, no cleaning
    else:
        markdown = clean_content(joined, remove_page_splits=True)
    spans = [
        {
            "kind": k,
            "text": t,
            "media_ref": m,
            "offset": o,
        }
        for k, t, m, o in zip(
            g.column("kind").to_pylist(),
            texts,
            g.column("media_ref").to_pylist(),
            g.column("offset").to_pylist(),
        )
    ]
    n_errors = sum(1 for t in texts if t.startswith(_ERROR_PREFIX))
    return pa.Table.from_pylist(
        [
            {
                "doc_id": doc_id,
                "spans": spans,
                "markdown": markdown,
                "n_spans": len(spans),
                "n_errors": n_errors,
            }
        ],
        schema=EXTRACTED_SCHEMA,
    )


def reassemble(ds, mode: str = "markdown"):
    """groupby(doc_id).map_groups -- hash-partitioned keyed shuffle."""
    return ds.groupby("doc_id").map_groups(
        lambda g: build_document(g, mode), batch_format="pyarrow"
    )
