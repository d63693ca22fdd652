"""Deterministic synthetic interleaved corpus (FIXTURES.md sections 1-2).

Generates the input_hint-shaped table ``(doc_id, spans)`` plus a media
side table. Generation is seeded PER DOCUMENT (``random.Random(f"{seed}:{i}")``)
so it is embarrassingly parallel and byte-identical at any parallelism:
``corpus_dataset`` builds it as a Ray Dataset (``range -> map_batches``),
``generate_documents`` builds the same rows single-process for oracles.

Text spans embed the exact raw-OCR constructs the reference cleans
(grounding tags, EOS variants, truncated tags, page-split markers,
LaTeX, newline runs -- see FIXTURES.md section 1 table with citations),
so the finalize stage is fully exercised. Span list positions are
SHUFFLED relative to ``offset`` so pipelines that ignore ``offset``
fail the order check.
"""

from __future__ import annotations

import hashlib
import random
import struct
from typing import Dict, Iterable, List, Optional

import numpy as np
import pyarrow as pa

from ..schema import DOCUMENTS_SCHEMA, MEDIA_SCHEMA, SPAN_LIST

P_MEDIA = 0.35

_FILLER = (
    "alpha beta gamma delta sigma lambda vector tensor matrix graph node edge "
    "stream batch shard block page table text image span offset corpus token"
).split()

# Raw-OCR constructs (FIXTURES.md section 1); each is a template the
# generator may embed in a text span.
_CONSTRUCTS = [
    "<|ref|>title<|/ref|><|det|>[[12, 34, 500, 80]]<|/det|># Heading {w}\n\n",
    "<|ref|>image<|/ref|><|det|>[[100, 100, 400, 300]]<|/det|>",
    "<|ref|>image<|/ref|><|det|>[[400, 300, 100, 100]]<|/det|>",  # degenerate box
    "<|ref|>image<|/ref|><|det|>[[0, 0, 10, 10], [20, 20, 30, 30]]<|/det|>",  # multi-box
    "<｜end▁of▁sentence｜>",  # fullwidth EOS (passes through API path)
    "<|endofsentence|>",  # ASCII EOS (stripped by server path M2)
    "tail<|ref|>table",  # truncated trailing ref
    "tail<|det|>[[12, 5",  # truncated trailing det
    "\n<--- Page Split --->\n",
    "a \\coloneqq b and c \\eqqcolon d",
    "gap\n\n\n\n\ngap",
    "\\[ E = mc^2 \\quad (1.2) \\]",
    "<center>centered {w}</center>",
    "| a | b |\n|---|---|\n| <td>1</td> | 2 |",
    "先天下之忧而忧 {w} \U0001f600",
    "<|ref|>footnote<|/ref|><|det|>[[5, 900, 990, 950]]<|/det|>note {w}",
]

# Media dims pin the reference tiling decision table (FIXTURES.md section 2).
_DIM_CASES = [
    (640, 640),
    (641, 640),
    (1280, 720),
    (720, 1280),
    (2480, 3508),
    (4961, 3508),
    (512, 512),
    (10000, 100),
    (1024, 1024),
    (800, 600),
]


def _doc_id(i: int) -> str:
    return f"doc-{i:06d}"


def _span_count(rng: random.Random, profile: str = "default") -> int:
    # Long-tailed: most docs 2-8 spans, some 9-30, a few heavyweight 50-200
    # (skew fixture for size-aware repartitioning, FIXTURES.md section 1).
    # "bench" profile models realistic multi-page documents (10-24 spans,
    # same heavy tail) so benchmark jobs are compute-bound.
    r = rng.random()
    if r < 0.02:
        return rng.randint(50, 200)
    if profile == "bench":
        return rng.randint(10, 24)
    if r < 0.10:
        return rng.randint(9, 30)
    return rng.randint(2, 8)


def _text_span(rng: random.Random) -> str:
    parts: List[str] = []
    n_chunks = rng.randint(1, 4)
    for _ in range(n_chunks):
        if rng.random() < 0.45:
            tmpl = rng.choice(_CONSTRUCTS)
            parts.append(tmpl.replace("{w}", rng.choice(_FILLER)))
        else:
            parts.append(" ".join(rng.choice(_FILLER) for _ in range(rng.randint(3, 12))) + ". ")
    return "".join(parts)


def generate_doc(doc_index: int, seed: int = 42, profile: str = "default") -> Dict:
    """One document row; pure function of (doc_index, seed, profile)."""
    rng = random.Random(f"{seed}:{doc_index}")
    doc_id = _doc_id(doc_index)
    n = _span_count(rng, profile)
    spans = []
    media_ordinal = 0
    for off in range(n):
        if rng.random() < P_MEDIA:
            kind = rng.choice(["image", "pdf_page"])
            spans.append(
                {
                    "kind": kind,
                    "text": "",
                    "media_ref": f"media://{doc_id}/{media_ordinal}",
                    "offset": off,
                }
            )
            media_ordinal += 1
        else:
            spans.append(
                {"kind": "text", "text": _text_span(rng), "media_ref": "", "offset": off}
            )
    rng.shuffle(spans)  # list position must NOT encode order
    return {"doc_id": doc_id, "spans": spans}


def docs_table(indices: Iterable[int], seed: int = 42, profile: str = "default") -> pa.Table:
    """Arrow table of documents for the given indices."""
    rows = [generate_doc(i, seed, profile) for i in indices]
    return pa.Table.from_arrays(
        [
            pa.array([r["doc_id"] for r in rows], type=pa.string()),
            pa.array([r["spans"] for r in rows], type=SPAN_LIST),
        ],
        schema=DOCUMENTS_SCHEMA,
    )


def generate_documents(n_docs: int, seed: int = 42, profile: str = "default") -> pa.Table:
    """Whole corpus as one Arrow table (driver-side; small scales only)."""
    return docs_table(range(n_docs), seed, profile)


def media_row(media_ref: str, kind: str) -> Dict:
    """Deterministic media payload row for a ref (FIXTURES.md section 2).

    Payload is a tiny deterministic fake image: magic + packed dims + a
    sha256 stripe (the sandbox has no PIL; stages/multimodal.py parses
    exactly this layout in its stubbed decode path).
    """
    h = int.from_bytes(hashlib.sha256(media_ref.encode()).digest()[:8], "big")
    width, height = _DIM_CASES[h % len(_DIM_CASES)]
    payload = (
        b"FAKEPNG0"
        + struct.pack("<II", width, height)
        + hashlib.sha256(media_ref.encode()).digest()
    )
    return {
        "media_ref": media_ref,
        "kind": kind,
        "width": width,
        "height": height,
        "payload": payload,
    }


def fixture_media_dims(media_ref: str) -> "tuple[int, int]":
    """(width, height) of a fixture media payload -- the deterministic
    stand-in for a media-table dims lookup (production: broadcast the
    media table's (ref -> dims) map via ray.put)."""
    h = int.from_bytes(hashlib.sha256(media_ref.encode()).digest()[:8], "big")
    return _DIM_CASES[h % len(_DIM_CASES)]


def media_table_for_docs(docs: pa.Table) -> pa.Table:
    refs: List[Dict] = []
    for spans in docs.column("spans").to_pylist():
        for s in spans:
            if s["media_ref"]:
                refs.append(media_row(s["media_ref"], s["kind"]))
    if not refs:
        return MEDIA_SCHEMA.empty_table()
    return pa.Table.from_pylist(refs, schema=MEDIA_SCHEMA)


def corpus_dataset(n_docs: int, seed: int = 42, parallelism: Optional[int] = None,
                   profile: str = "default"):
    """The corpus as a Ray Dataset, generated in parallel.

    ``range(n) -> map_batches(gen)``: each batch generates its own doc
    rows from (seed, index) only, so output is byte-identical at any
    parallelism -- the property the N-vs-4N scaling runs rely on.
    """
    import ray.data as rd

    if parallelism is None:
        # cap at 64 blocks: enough parallelism for any sandbox level while
        # keeping per-task scheduling cost amortized over big blocks
        parallelism = max(1, min(64, n_docs // 500))

    def _gen(batch: pa.Table) -> pa.Table:
        return docs_table(batch.column("id").to_pylist(), seed, profile)

    return rd.range(n_docs, override_num_blocks=parallelism).map_batches(
        _gen, batch_format="pyarrow"
    )


def write_corpus(out_dir: str, n_docs: int, seed: int = 42,
                 profile: str = "default") -> str:
    """Materialize the corpus to Parquet (Lance-schema twin) at out_dir."""
    ds = corpus_dataset(n_docs, seed, profile=profile)
    ds.write_parquet(out_dir)
    return out_dir


def cached_corpus_path(n_docs: int, seed: int = 42, root: str = "/tmp/deekseek_corpus",
                       profile: str = "default") -> str:
    """Generate-once cache for benches/queries, keyed by (n, seed, profile)."""
    import os

    suffix = "" if profile == "default" else f"_{profile}"
    path = f"{root}/n{n_docs}_s{seed}{suffix}"
    marker = f"{path}/_SUCCESS"
    if not os.path.exists(marker):
        os.makedirs(path, exist_ok=True)
        write_corpus(path, n_docs, seed, profile)
        with open(marker, "w") as f:
            f.write("ok")
    return path


def read_corpus(path: str):
    """Read the corpus: Lance in production, Parquet twin in the sandbox;
    JSONL accepted for interchange (see read_corpus_jsonl)."""
    import ray.data as rd

    if path.endswith(".lance"):
        try:
            return rd.read_lance(path)
        except (ImportError, AttributeError):
            raise NotImplementedError(
                "lance is not installed in this sandbox; use the Parquet twin"
            )
    if path.endswith((".jsonl", ".json")):
        return read_corpus_jsonl(path)
    return rd.read_parquet(path)


def read_corpus_jsonl(path: str):
    """Interchange reader: JSON-lines of {"doc_id": ..., "spans": [...]}
    coerced onto the exact corpus Arrow schema (missing span fields get
    the column defaults: text "", media_ref "", sequential offsets)."""
    import ray.data as rd

    ds = rd.read_json(path)

    def _coerce(batch: pa.Table) -> pa.Table:
        rows = batch.to_pylist()
        fixed = []
        for r in rows:
            spans = []
            for i, s in enumerate(r.get("spans") or []):
                spans.append(
                    {
                        "kind": s.get("kind", "text"),
                        "text": s.get("text") or "",
                        "media_ref": s.get("media_ref") or "",
                        "offset": int(s["offset"]) if s.get("offset") is not None else i,
                    }
                )
            fixed.append({"doc_id": str(r["doc_id"]), "spans": spans})
        return pa.Table.from_arrays(
            [
                pa.array([r["doc_id"] for r in fixed], type=pa.string()),
                pa.array([r["spans"] for r in fixed], type=SPAN_LIST),
            ],
            schema=DOCUMENTS_SCHEMA,
        )

    return ds.map_batches(_coerce, batch_format="pyarrow")


def pdf_table_for_docs(docs: pa.Table) -> pa.Table:
    """One FAKEPDF payload per document: page dims = the doc's media
    spans' fixture dims at 72 dpi (S2 fixture twin; the rasterize stage
    scales them by dpi/72). Docs without media spans are omitted."""
    ids, payloads = [], []
    for doc_id, spans in zip(docs.column("doc_id").to_pylist(),
                             docs.column("spans").to_pylist()):
        dims = [fixture_media_dims(s["media_ref"]) for s in
                sorted(spans, key=lambda s: s["offset"]) if s["media_ref"]]
        if not dims:
            continue
        payload = b"FAKEPDF0" + struct.pack("<I", len(dims))
        for w, h in dims:
            payload += struct.pack("<II", w, h)
        ids.append(doc_id)
        payloads.append(payload)
    return pa.Table.from_arrays(
        [pa.array(ids, type=pa.string()), pa.array(payloads, type=pa.binary())],
        names=["media_ref", "payload"],
    )
