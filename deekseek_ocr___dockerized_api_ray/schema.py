"""Arrow schemas for the engine's tables (BASELINE.json input_hint shape).

The corpus is a Lance table in production (``ray.data.read_lance``);
tests and benches use identical-schema Parquet because the sandbox has
no lance package. All stages use ``batch_format="pyarrow"`` against
these types, so pandas object-dtype round-trips never touch the hot
path.
"""

from __future__ import annotations

import pyarrow as pa

#: One span of an interleaved document. Order within the document is the
#: ``offset`` column (0-based, dense), NOT list position -- the generator
#: shuffles list position deliberately (FIXTURES.md section 1).
SPAN_STRUCT = pa.struct(
    [
        ("kind", pa.string()),       # "text" | "image" | "pdf_page"
        ("text", pa.string()),       # raw content; "" for media spans pre-OCR
        ("media_ref", pa.string()),  # "" for text spans; "media://{doc}/{k}"
        ("offset", pa.int32()),
    ]
)

SPAN_LIST = pa.list_(SPAN_STRUCT)

#: Input corpus table (input_hint: doc_id + spans).
DOCUMENTS_SCHEMA = pa.schema([("doc_id", pa.string()), ("spans", SPAN_LIST)])

#: Exploded per-span working table (one row per span).
FLAT_SPAN_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("kind", pa.string()),
        ("text", pa.string()),
        ("media_ref", pa.string()),
        ("offset", pa.int32()),
        ("n_spans", pa.int32()),  # spans in the parent doc (skew stats / sanity)
    ]
)

#: Media payload side table (FIXTURES.md section 2).
MEDIA_SCHEMA = pa.schema(
    [
        ("media_ref", pa.string()),
        ("kind", pa.string()),
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("payload", pa.binary()),
    ]
)

#: Extraction output: input shape + the document's final markdown (the
#: reference's result.md artifact) + error count (lineage M15).
EXTRACTED_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("spans", SPAN_LIST),
        ("markdown", pa.string()),
        ("n_spans", pa.int32()),
        ("n_errors", pa.int32()),
    ]
)

#: Per-partition lineage record (SURVEY.md section 4, checkpoint row).
LINEAGE_SCHEMA = pa.schema(
    [
        ("partition_id", pa.int32()),
        ("doc_count", pa.int64()),
        ("span_count", pa.int64()),
        ("error_count", pa.int64()),
        ("wall_ms", pa.float64()),
        ("status", pa.string()),
    ]
)
