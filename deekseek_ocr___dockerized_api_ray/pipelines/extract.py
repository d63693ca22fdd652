"""Flagship extraction pipeline (the reference's API job, Ray-Data-first).

Reference lifecycle (SURVEY.md section 3.1): upload PDF -> rasterize
pages -> per-page vLLM OCR -> join with page-split marker -> client-side
clean_content. One job at a time, in-memory state, nothing resumable.

Two physical strategies, same semantics (both span-equal vs the oracle):

``fused`` (default -- cheap/CPU OCR backends):
    read corpus -> map_batches(FusedExtractStage, actor pool)
    A document's spans are already co-located in its input row, so when
    per-span cost is small the whole explode/OCR/reassemble/clean chain
    runs inside ONE actor-pool stage. Zero shuffles; scales linearly.

``exploded`` (heavy per-span backends, e.g. real GPU OCR at ~1 s/page):
    read -> map_batches(explode)          # span rows: skew defense
         -> map_batches(OCRStage, pool)   # batched model inference
         -> bucketed keyed reassembly     # the one all-to-all exchange
    Exploding makes the GPU work unit a span, so a 200-page document
    cannot monopolize an actor (the reference's single-job failure mode,
    docker/start_server.py:456-466). Reassembly groups by a 64-bucket
    hash of doc_id and rebuilds every document of a bucket in one call
    (cheaper than one map_groups call per document).

``reference_extract_document`` is the deliberately naive single-process
oracle used by tests to compute expected outputs independently of the
distributed machinery (FIXTURES.md section 3).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Set, Union

import pyarrow as pa

from ..functions.cleaning import (
    PAGE_SPLIT_BATCH,
    clean_content,
    clean_content_batch_script,
    has_model_eos,
    join_pages,
    page_error_text,
    strip_model_eos,
    strip_server_eos,
)
from ..functions.mock_ocr import mock_ocr_text
from ..functions.text_stats import sha1_64
from ..schema import EXTRACTED_SCHEMA, SPAN_LIST
from ..sources.corpus import read_corpus
from ..stages.explode import explode
from ..stages.ocr import OCRStage, make_backend
from ..stages.reassemble import reassemble

_ERROR_PREFIX = "[Error processing page "


def _doc_markdown(doc_id: str, spans: List[dict], mode: str,
                  extract_images: bool, media_dims_fn) -> str:
    """Join + clean one doc's processed spans (reference API path).

    extract_images=True replicates M6 (Lib/postprocessor.py:66-139): the
    doc's MEDIA spans play the role of the rasterized page list, so the
    reference's modulo page-pairing quirk maps to ``img_idx % n_media``;
    link names are deterministic ``{doc_id}_img{i}.jpg``.
    """
    joined = join_pages([s["text"] for s in spans])
    if mode == "custom":
        return joined  # raw output, no cleaning
    page_dims = None
    if extract_images:
        page_dims = [
            media_dims_fn(s["media_ref"]) for s in spans if s["media_ref"]
        ]
    return clean_content(
        joined,
        extract_images=extract_images,
        page_dims=page_dims,
        link_name_fn=lambda i: f"{doc_id}_img{i}.jpg",
        remove_page_splits=True,
    )


def _build_extracted_rows(doc_ids: List[str], docs_spans: List[List[dict]],
                          mode: str, extract_images: bool = False,
                          media_dims_fn=None) -> pa.Table:
    """Assemble EXTRACTED_SCHEMA rows from per-doc span dicts (already
    OCR'd, sorted by offset)."""
    if extract_images and media_dims_fn is None:
        from ..sources.corpus import fixture_media_dims as media_dims_fn
    markdowns, n_spans, n_errors = [], [], []
    for doc_id, spans in zip(doc_ids, docs_spans):
        markdowns.append(_doc_markdown(doc_id, spans, mode, extract_images, media_dims_fn))
        n_spans.append(len(spans))
        n_errors.append(sum(1 for s in spans if s["text"].startswith(_ERROR_PREFIX)))
    return pa.Table.from_arrays(
        [
            pa.array(doc_ids, type=pa.string()),
            pa.array(docs_spans, type=SPAN_LIST),
            pa.array(markdowns, type=pa.string()),
            pa.array(n_spans, type=pa.int32()),
            pa.array(n_errors, type=pa.int32()),
        ],
        schema=EXTRACTED_SCHEMA,
    )


class FusedExtractStage:
    """Whole-document extraction in one actor-pool stage (fused path).

    Per doc (page loop analog, docker/start_server.py:456-467): sort
    spans by offset, OCR media spans through the backend (per-span error
    -> reference error string, M15), join + clean per mode.
    """

    def __init__(self, mode: str = "markdown", backend: str = "mock",
                 fail_refs: Optional[Set[str]] = None, max_pages: int = 0,
                 extract_images: bool = False):
        self.mode = mode
        self.max_pages = max_pages
        self.extract_images = extract_images
        self.backend = make_backend(backend, mode, fail_refs=fail_refs)

    def __call__(self, batch: pa.Table) -> pa.Table:
        if not self.extract_images:
            return self._call_vectorized(batch)
        return self._call_rowwise(batch)

    def _call_vectorized(self, batch: pa.Table) -> pa.Table:
        """Default path: Arrow list flatten + one vectorized sort, no
        per-span Python dicts (those dominated the hot loop)."""
        import numpy as np
        import pyarrow.compute as pc

        spans = batch.column("spans")
        if isinstance(spans, pa.ChunkedArray):
            spans = spans.combine_chunks()
        doc_ids = batch.column("doc_id").to_pylist()
        parent = pc.list_parent_indices(spans)
        flat = spans.flatten()
        # one vectorized sort by (doc, offset) restores per-doc span order
        order = pc.sort_indices(
            pa.table({"p": parent, "o": flat.field("offset")}),
            sort_keys=[("p", "ascending"), ("o", "ascending")],
        )
        parent_np = pc.take(parent, order).to_numpy(zero_copy_only=False)
        kinds = pc.take(flat.field("kind"), order)
        texts = pc.take(flat.field("text"), order).to_pylist()
        refs = pc.take(flat.field("media_ref"), order)
        offs = pc.take(flat.field("offset"), order)

        if self.max_pages > 0:
            # O1: MAX_PAGES truncation (start_server.py:444-450) -- keep
            # the first max_pages spans of each doc (offsets are dense)
            keep = pc.less(offs, pa.scalar(self.max_pages, pa.int32()))
            keep_np = keep.to_numpy(zero_copy_only=False)
            parent_np = parent_np[keep_np]
            kinds = kinds.filter(keep)
            refs = refs.filter(keep)
            offs = offs.filter(keep)
            texts = [t for t, k in zip(texts, keep_np) if k]

        kinds_np = kinds.to_numpy(zero_copy_only=False)
        refs_list = refs.to_pylist()
        offs_np = offs.to_numpy(zero_copy_only=False)
        media_idx = np.nonzero(kinds_np != "text")[0]
        if len(media_idx):
            media_refs = [refs_list[i] for i in media_idx]
            try:
                # one BATCHED inference call per batch (the GPU shape,
                # run_dpsk_ocr_pdf.py:284-287 single llm.generate)
                results = self.backend.generate(media_refs)
                for i, r in zip(media_idx, results):
                    texts[i] = strip_server_eos(r)
            except Exception:
                # isolate the poisoned rows: per-row fallback preserving
                # the reference's per-page error semantics (M15)
                for i in media_idx:
                    try:
                        texts[i] = strip_server_eos(self.backend.generate_one(refs_list[i]))
                    except Exception as e:
                        texts[i] = page_error_text(int(offs_np[i]) + 1, str(e))

        # doc boundaries -> list offsets (some docs may have 0 spans kept)
        counts = np.bincount(parent_np, minlength=len(doc_ids))
        list_offsets = np.zeros(len(doc_ids) + 1, dtype=np.int32)
        np.cumsum(counts, out=list_offsets[1:])
        struct = pa.StructArray.from_arrays(
            [kinds, pa.array(texts, type=pa.string()), refs, offs],
            names=["kind", "text", "media_ref", "offset"],
        )
        spans_out = pa.ListArray.from_arrays(pa.array(list_offsets, type=pa.int32()), struct)

        markdowns, n_errors = [], []
        for d in range(len(doc_ids)):
            lo, hi = list_offsets[d], list_offsets[d + 1]
            doc_texts = texts[lo:hi]
            joined = join_pages(doc_texts)
            if self.mode == "custom":
                markdowns.append(joined)
            else:
                markdowns.append(clean_content(joined, remove_page_splits=True))
            n_errors.append(sum(1 for t in doc_texts if t.startswith(_ERROR_PREFIX)))
        return pa.Table.from_arrays(
            [
                pa.array(doc_ids, type=pa.string()),
                spans_out,
                pa.array(markdowns, type=pa.string()),
                pa.array(counts.astype(np.int32)),
                pa.array(n_errors, type=pa.int32()),
            ],
            schema=EXTRACTED_SCHEMA,
        )

    def _call_rowwise(self, batch: pa.Table) -> pa.Table:
        """extract_images path (per-doc media-dims context needed)."""
        doc_ids = batch.column("doc_id").to_pylist()
        all_spans = batch.column("spans").to_pylist()
        out_spans: List[List[dict]] = []
        for spans in all_spans:
            spans = sorted(spans, key=lambda s: s["offset"])
            if self.max_pages > 0:
                # O1: MAX_PAGES truncation (start_server.py:444-450) --
                # the page-list slice maps to the first max_pages spans
                spans = spans[: self.max_pages]
            processed = []
            for s in spans:
                if s["kind"] == "text":
                    text = s["text"]
                else:
                    try:
                        text = strip_server_eos(self.backend.generate_one(s["media_ref"]))
                    except Exception as e:
                        text = page_error_text(s["offset"] + 1, str(e))
                processed.append(
                    {"kind": s["kind"], "text": text,
                     "media_ref": s["media_ref"], "offset": s["offset"]}
                )
            out_spans.append(processed)
        return _build_extracted_rows(doc_ids, out_spans, self.mode,
                                     self.extract_images)


def _make_bucket_builder(mode: str, extract_images: bool):
    """The whole-bucket rebuild function shared by both exchange
    implementations (Ray groupby shuffle and disk spill)."""

    def _build_bucket(group: pa.Table) -> pa.Table:
        import numpy as np
        import pyarrow.compute as pc

        g = group.sort_by([("doc_id", "ascending"), ("offset", "ascending")])
        n = g.num_rows
        if n == 0:
            return EXTRACTED_SCHEMA.empty_table()
        doc_arr = g.column("doc_id")
        if isinstance(doc_arr, pa.ChunkedArray):
            doc_arr = doc_arr.combine_chunks()
        if extract_images:
            # per-doc media-dims context -> row-wise build
            doc_col = doc_arr.to_pylist()
            kinds_l = g.column("kind").to_pylist()
            texts_l = g.column("text").to_pylist()
            refs_l = g.column("media_ref").to_pylist()
            offs_l = g.column("offset").to_pylist()
            doc_ids: List[str] = []
            docs_spans: List[List[dict]] = []
            start = 0
            for i in range(1, n + 1):
                if i == n or doc_col[i] != doc_col[start]:
                    doc_ids.append(doc_col[start])
                    docs_spans.append(
                        [
                            {"kind": kinds_l[j], "text": texts_l[j],
                             "media_ref": refs_l[j], "offset": offs_l[j]}
                            for j in range(start, i)
                        ]
                    )
                    start = i
            return _build_extracted_rows(doc_ids, docs_spans, mode, extract_images)

        # vectorized: doc boundaries via one shifted comparison, ListArray
        # rebuild -- no per-span Python objects
        same = pc.equal(doc_arr.slice(1), doc_arr.slice(0, n - 1)).to_numpy(
            zero_copy_only=False
        )
        starts = np.concatenate(([0], np.nonzero(~same)[0] + 1))
        list_offsets = np.concatenate((starts, [n])).astype(np.int32)
        doc_id_arr = doc_arr.take(pa.array(starts))
        texts = g.column("text").to_pylist()
        struct = pa.StructArray.from_arrays(
            [
                g.column("kind").combine_chunks() if isinstance(g.column("kind"), pa.ChunkedArray) else g.column("kind"),
                pa.array(texts, type=pa.string()),
                g.column("media_ref").combine_chunks() if isinstance(g.column("media_ref"), pa.ChunkedArray) else g.column("media_ref"),
                g.column("offset").combine_chunks() if isinstance(g.column("offset"), pa.ChunkedArray) else g.column("offset"),
            ],
            names=["kind", "text", "media_ref", "offset"],
        )
        spans_out = pa.ListArray.from_arrays(pa.array(list_offsets, type=pa.int32()), struct)
        markdowns, n_errors, n_spans = [], [], []
        for d in range(len(starts)):
            lo, hi = list_offsets[d], list_offsets[d + 1]
            doc_texts = texts[lo:hi]
            joined = join_pages(doc_texts)
            if mode == "custom":
                markdowns.append(joined)
            else:
                markdowns.append(clean_content(joined, remove_page_splits=True))
            n_errors.append(sum(1 for t in doc_texts if t.startswith(_ERROR_PREFIX)))
            n_spans.append(hi - lo)
        return pa.Table.from_arrays(
            [
                doc_id_arr,
                spans_out,
                pa.array(markdowns, type=pa.string()),
                pa.array(n_spans, type=pa.int32()),
                pa.array(n_errors, type=pa.int32()),
            ],
            schema=EXTRACTED_SCHEMA,
        )

    return _build_bucket


def _add_doc_bucket(flat_ds, n_buckets: int):
    def _add(batch: pa.Table) -> pa.Table:
        import numpy as np
        import pyarrow.compute as pc

        # span rows repeat each doc_id ~n_spans times: hash the
        # dictionary (one sha1 per UNIQUE doc), then take per row
        col = batch.column("doc_id")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        enc = pc.dictionary_encode(col)
        per_doc = np.fromiter(
            (sha1_64(d) % n_buckets for d in enc.dictionary.to_pylist()),
            dtype=np.int32, count=len(enc.dictionary),
        )
        buckets = per_doc[enc.indices.to_numpy(zero_copy_only=False)]
        return batch.append_column("bucket", pa.array(buckets, type=pa.int32()))

    return flat_ds.map_batches(_add, batch_format="pyarrow")


def _bucketed_reassemble(flat_ds, mode: str, n_buckets: int = 64,
                         extract_images: bool = False):
    """Exploded-path reassembly via Ray's keyed shuffle: one hash bucket
    (many docs) per group call instead of one call per doc."""
    bucketed = _add_doc_bucket(flat_ds, n_buckets)
    builder = _make_bucket_builder(mode, extract_images)
    return bucketed.groupby("bucket").map_groups(builder, batch_format="pyarrow")


def _spill_reassemble(flat_ds, mode: str, n_buckets: int, spill_dir: str,
                      extract_images: bool = False,
                      exchange_timings: Optional[dict] = None):
    """Exploded-path reassembly via the disk-based partitioned exchange
    (stages/exchange.py): map-side bucket spill, one reduce task per
    bucket -- no global sort. ~3-4x faster than the sort shuffle at
    10M+ span rows on this box; on a cluster the spill dir is shared
    storage (the standard external-shuffle layout)."""
    from ..stages.exchange import partitioned_exchange

    bucketed = _add_doc_bucket(flat_ds, n_buckets)
    builder = _make_bucket_builder(mode, extract_images)
    return partitioned_exchange(bucketed, "bucket", n_buckets, spill_dir,
                                builder, EXTRACTED_SCHEMA,
                                timings=exchange_timings)


def run_extract(
    source: Union[str, "object"],
    *,
    mode: str = "markdown",
    backend: str = "mock",
    strategy: str = "fused",
    span_batch_size: int = 1024,
    doc_batch_size: int = 256,
    ocr_concurrency: Optional[object] = None,
    fail_refs: Optional[Set[str]] = None,
    reassemble_buckets: int = 64,
    max_pages: int = 0,
    extract_images: bool = False,
    spill_dir: Optional[str] = None,
    exchange_timings: Optional[dict] = None,
):
    """Build the (lazy) extraction Dataset for a corpus path or Dataset.

    strategy="fused" (default): docs stay co-located; media spans are
    OCR'd through the backend's BATCHED generate inside the stage (the
    GPU-batching shape of run_dpsk_ocr_pdf.py:284-287), zero shuffles.
    strategy="exploded": span-level work units + keyed reassembly --
    correct under ANY row placement (e.g. after repartition(shuffle=True)
    or whale-doc splitting). Reassembly exchange: Ray's sort shuffle by
    default; pass ``spill_dir`` to use the disk-based partitioned
    exchange instead (faster at tens of millions of span rows; NOTE:
    it materializes the OCR'd spans to spill_dir at the barrier).
    Consumption (write/iter/count) is the caller's choice.
    """
    ds = read_corpus(source) if isinstance(source, str) else source
    concurrency = ocr_concurrency if ocr_concurrency is not None else (1, 8)

    if strategy == "fused":
        return ds.map_batches(
            FusedExtractStage,
            fn_constructor_kwargs=dict(mode=mode, backend=backend, fail_refs=fail_refs,
                                       max_pages=max_pages, extract_images=extract_images),
            batch_format="pyarrow",
            batch_size=doc_batch_size,
            concurrency=concurrency,
        )

    if strategy != "exploded":
        raise ValueError(f"unknown strategy {strategy!r}")

    flat = explode(ds)
    if max_pages > 0:
        import pyarrow.compute as pc

        flat = flat.map_batches(
            lambda t: t.filter(pc.less(t.column("offset"), pa.scalar(max_pages, pa.int32()))),
            batch_format="pyarrow",
        )
    ocrd = flat.map_batches(
        OCRStage,
        fn_constructor_kwargs=dict(mode=mode, backend=backend, fail_refs=fail_refs),
        batch_format="pyarrow",
        batch_size=span_batch_size,
        concurrency=concurrency,
    )
    if spill_dir is not None:
        return _spill_reassemble(ocrd, mode, reassemble_buckets, spill_dir,
                                 extract_images=extract_images,
                                 exchange_timings=exchange_timings)
    return _bucketed_reassemble(ocrd, mode, reassemble_buckets,
                                extract_images=extract_images)


def run_extract_per_doc_groups(source, mode: str = "markdown", backend: str = "mock",
                               fail_refs: Optional[Set[str]] = None,
                               ocr_concurrency: Optional[object] = None):
    """Exploded path with the textbook one-group-per-document reassembly
    (stages/reassemble.py) -- kept as the semantic baseline the bucketed
    variant is tested against."""
    ds = read_corpus(source) if isinstance(source, str) else source
    flat = explode(ds)
    ocrd = flat.map_batches(
        OCRStage,
        fn_constructor_kwargs=dict(mode=mode, backend=backend, fail_refs=fail_refs),
        batch_format="pyarrow",
        batch_size=1024,
        concurrency=ocr_concurrency if ocr_concurrency is not None else (1, 8),
    )
    return reassemble(ocrd, mode=mode)


# ---------------------------------------------------------------------------
# Naive single-process oracle (test-side expected output)
# ---------------------------------------------------------------------------

def reference_extract_document(
    doc: Dict, mode: str = "markdown", fail_refs: Optional[Set[str]] = None,
    max_pages: int = 0, extract_images: bool = False,
) -> Dict:
    """Straight-line restatement of the reference pipeline for ONE doc.

    Per span (page analog, docker/start_server.py:456-466): text spans
    pass through; media spans get (mock) OCR output with the server's
    ASCII EOS strip (start_server.py:427-428); a failed span becomes the
    reference's inline error string (start_server.py:464-466). Then the
    API-path join (start_server.py:467) + client clean_content with
    remove_page_splits (CLI defaults pdf_to_markdown_cli.py:313-320);
    ``custom`` mode = raw, no cleaning (pdf_to_markdown_cli.py:354-360).
    """
    fail_refs = fail_refs or set()
    spans = sorted(doc["spans"], key=lambda s: s["offset"])
    if max_pages > 0:
        spans = spans[:max_pages]
    out_spans = []
    for s in spans:
        if s["kind"] == "text":
            text = s["text"]
        else:
            if s["media_ref"] in fail_refs:
                text = page_error_text(
                    s["offset"] + 1, f"mock backend failure for {s['media_ref']}"
                )
            else:
                text = strip_server_eos(mock_ocr_text(s["media_ref"], mode))
        out_spans.append(
            {"kind": s["kind"], "text": text, "media_ref": s["media_ref"], "offset": s["offset"]}
        )
    markdown = _doc_markdown(doc["doc_id"], out_spans, mode, extract_images, None
                             if not extract_images else
                             __import__("deekseek_ocr___dockerized_api_ray.sources.corpus",
                                        fromlist=["fixture_media_dims"]).fixture_media_dims)
    n_errors = sum(1 for s in out_spans if s["text"].startswith(_ERROR_PREFIX))
    return {
        "doc_id": doc["doc_id"],
        "spans": out_spans,
        "markdown": markdown,
        "n_spans": len(out_spans),
        "n_errors": n_errors,
    }


def expected_table(n_docs: int, seed: int = 42, mode: str = "markdown") -> pa.Table:
    """Expected extraction output for the synthetic corpus (oracle table)."""
    from ..sources.corpus import generate_doc

    rows = [reference_extract_document(generate_doc(i, seed), mode) for i in range(n_docs)]
    return pa.Table.from_pylist(rows, schema=EXTRACTED_SCHEMA)


# ---------------------------------------------------------------------------
# Batch-script path (run_dpsk_ocr_pdf.py) -- optional mode
# ---------------------------------------------------------------------------

BATCH_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("raw_text", pa.string()),    # contents_det (W3 *_det.mmd)
        ("clean_text", pa.string()),  # contents (W3 *.mmd)
        ("n_kept", pa.int32()),
        ("n_dropped", pa.int32()),
    ]
)

#: per-page suffix the batch script appends: content + "\n" + page_num + "\n"
#: with page_num = "\n<--- Page Split --->" (run_dpsk_ocr_pdf.py:312-314)
_BATCH_SUFFIX = "\n\n<--- Page Split --->\n"


def batch_script_document(doc: Dict, mode: str = "markdown",
                          skip_repeat: bool = True) -> Dict:
    """Naive oracle for the batch-script path (run_dpsk_ocr_pdf.py:296-341).

    Interleaved mapping: every span is a "page"; media spans are OCR'd
    with the fullwidth model EOS; SKIP_REPEAT drops media pages whose
    output lacks it (text spans always count as kept). ``jdx`` (the link
    page index) counts KEPT pages only, matching the script's counter.
    """
    from ..functions.mock_ocr import mock_ocr_text_batch

    spans = sorted(doc["spans"], key=lambda s: s["offset"])
    raw_parts, clean_parts = [], []
    jdx = 0
    dropped = 0
    for s in spans:
        if s["kind"] == "text":
            content = s["text"]
        else:
            content = mock_ocr_text_batch(s["media_ref"], mode)
            if has_model_eos(content):
                content = strip_model_eos(content)
            elif skip_repeat:
                dropped += 1
                continue
        raw_parts.append(content + _BATCH_SUFFIX)
        clean_parts.append(clean_content_batch_script(content, jdx) + _BATCH_SUFFIX)
        jdx += 1
    return {
        "doc_id": doc["doc_id"],
        "raw_text": "".join(raw_parts),
        "clean_text": "".join(clean_parts),
        "n_kept": jdx,
        "n_dropped": dropped,
    }


class BatchScriptExtractStage:
    """Fused actor stage for the batch-script path (same dataflow shape
    as FusedExtractStage; semantics of run_dpsk_ocr_pdf.py)."""

    def __init__(self, mode: str = "markdown", skip_repeat: bool = True):
        from ..functions.mock_ocr import mock_ocr_text_batch

        self.mode = mode
        self.skip_repeat = skip_repeat
        self._ocr = mock_ocr_text_batch

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows = []
        for doc_id, spans in zip(batch.column("doc_id").to_pylist(),
                                 batch.column("spans").to_pylist()):
            rows.append(
                batch_script_document({"doc_id": doc_id, "spans": spans},
                                      self.mode, self.skip_repeat)
            )
        return pa.Table.from_pylist(rows, schema=BATCH_SCHEMA)


def run_extract_batch_script(source, *, mode: str = "markdown",
                             skip_repeat: bool = True,
                             doc_batch_size: int = 256,
                             concurrency=(1, 8)):
    """Batch-script-path pipeline: (doc_id, raw_text, clean_text, ...)."""
    ds = read_corpus(source) if isinstance(source, str) else source
    return ds.map_batches(
        BatchScriptExtractStage,
        fn_constructor_kwargs=dict(mode=mode, skip_repeat=skip_repeat),
        batch_format="pyarrow",
        batch_size=doc_batch_size,
        concurrency=concurrency,
    )


# ---------------------------------------------------------------------------
# Eval-batch path (run_dpsk_ocr_eval_batch.py) -- optional mode
# ---------------------------------------------------------------------------

EVAL_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("offset", pa.int32()),
        ("media_ref", pa.string()),
        ("raw_text", pa.string()),    # *_det.md (verbatim model output, EOS kept)
        ("clean_text", pa.string()),  # *.md (clean_formula + per-tag cleanup)
    ]
)


def eval_document_rows(doc: Dict, mode: str = "markdown") -> List[Dict]:
    """Naive oracle for the eval path: one output row per span ("image"),
    raw output verbatim (no EOS strip on this path,
    run_dpsk_ocr_eval_batch.py:165-180) + eval_clean_page cleanup."""
    from ..functions.cleaning import eval_clean_page
    from ..functions.mock_ocr import mock_ocr_text_batch

    rows = []
    for s in sorted(doc["spans"], key=lambda x: x["offset"]):
        raw = s["text"] if s["kind"] == "text" else mock_ocr_text_batch(s["media_ref"], mode)
        rows.append(
            {
                "doc_id": doc["doc_id"],
                "offset": s["offset"],
                "media_ref": s["media_ref"],
                "raw_text": raw,
                "clean_text": eval_clean_page(raw),
            }
        )
    return rows


class EvalExtractStage:
    """Fused actor stage for the eval-batch path (per-span output rows)."""

    def __init__(self, mode: str = "markdown"):
        self.mode = mode

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows: List[Dict] = []
        for doc_id, spans in zip(batch.column("doc_id").to_pylist(),
                                 batch.column("spans").to_pylist()):
            rows.extend(eval_document_rows({"doc_id": doc_id, "spans": spans}, self.mode))
        if not rows:
            return EVAL_SCHEMA.empty_table()
        return pa.Table.from_pylist(rows, schema=EVAL_SCHEMA)


def run_extract_eval(source, *, mode: str = "markdown",
                     doc_batch_size: int = 256, concurrency=(1, 8)):
    """Eval-batch-path pipeline: per-span (doc_id, offset, raw, clean)."""
    ds = read_corpus(source) if isinstance(source, str) else source
    return ds.map_batches(
        EvalExtractStage,
        fn_constructor_kwargs=dict(mode=mode),
        batch_format="pyarrow",
        batch_size=doc_batch_size,
        concurrency=concurrency,
    )
