"""Explode interleaved documents into flat per-span rows.

The reference's unit of OCR work is a page, not a document
(docker/start_server.py:456-466 loops pages); exploding BEFORE the OCR
stage is the engine's skew defense (SURVEY.md section 4): a 200-span
heavyweight document becomes 200 independent rows that spread across
blocks, so no single actor is monopolized the way the reference's
single-job server is by a 500-page PDF.

Arrow list flatten + take are zero-copy-ish kernels; no Python row loop.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from ..schema import FLAT_SPAN_SCHEMA


def explode_spans(batch: pa.Table) -> pa.Table:
    """(doc_id, spans[list<struct>]) -> one row per span.

    Output: (doc_id, kind, text, media_ref, offset, n_spans).
    """
    spans = batch.column("spans")
    if isinstance(spans, pa.ChunkedArray):
        spans = spans.combine_chunks()
    parent = pc.list_parent_indices(spans)
    flat = spans.flatten()
    doc_ids = pc.take(batch.column("doc_id").combine_chunks(), parent)
    n_spans = pc.take(pc.list_value_length(spans), parent).cast(pa.int32())
    return pa.Table.from_arrays(
        [
            doc_ids,
            flat.field("kind"),
            flat.field("text"),
            flat.field("media_ref"),
            flat.field("offset"),
            n_spans,
        ],
        schema=FLAT_SPAN_SCHEMA,
    )


def explode(ds, batch_size: int = 512):
    """Dataset-level explode: map_batches over Arrow, streaming."""
    return ds.map_batches(explode_spans, batch_format="pyarrow", batch_size=batch_size)
