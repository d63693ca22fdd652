"""Flagship extraction pipeline (the reference's API job, Ray-Data-first).

Reference lifecycle (SURVEY.md section 3.1): upload PDF -> rasterize
pages -> per-page vLLM OCR -> join with page-split marker -> client-side
clean_content. One job at a time, in-memory state, nothing resumable.

Engine pipeline (streaming, every stage backpressured):

    read corpus (doc_id, spans)
      -> map_batches(explode_spans)           # doc -> span rows (skew defense)
      -> map_batches(OCRStage, concurrency=N) # stateful actor pool, media rows only
      -> groupby(doc_id).map_groups(build_document)  # THE one keyed shuffle
      [-> write_parquet(out)]

``reference_extract_document`` is the deliberately naive single-process
oracle: a straight-line re-statement of the reference semantics used by
the test suite to compute expected outputs independently of the
distributed machinery (FIXTURES.md section 3).
"""

from __future__ import annotations

from typing import Dict, Optional, Set, Union

import pyarrow as pa

from ..functions.cleaning import clean_content, join_pages, page_error_text, strip_server_eos
from ..functions.mock_ocr import mock_ocr_text
from ..schema import EXTRACTED_SCHEMA
from ..sources.corpus import read_corpus
from ..stages.explode import explode
from ..stages.ocr import OCRStage
from ..stages.reassemble import reassemble


def run_extract(
    source: Union[str, "object"],
    *,
    mode: str = "markdown",
    backend: str = "mock",
    span_batch_size: int = 1024,
    ocr_concurrency: Optional[int] = None,
    fail_refs: Optional[Set[str]] = None,
):
    """Build the (lazy) extraction Dataset for a corpus path or Dataset.

    ``ocr_concurrency=None`` lets Ray autoscale the stage as plain tasks
    would -- we still pass a callable class so backend state is built
    once per actor. Consumption (write/iter/count) is the caller's
    choice; nothing here materializes.
    """
    import ray.data  # noqa: F401  (Dataset type only)

    ds = read_corpus(source) if isinstance(source, str) else source
    flat = explode(ds)
    kwargs = dict(
        fn_constructor_kwargs=dict(mode=mode, backend=backend, fail_refs=fail_refs),
        batch_format="pyarrow",
        batch_size=span_batch_size,
    )
    # Autoscaling pool with min=1: a fixed pool equal to the CPU count
    # starves the groupby shuffle (the pool reserves every CPU); min=1
    # guarantees forward progress at any cluster size.
    kwargs["concurrency"] = ocr_concurrency if ocr_concurrency is not None else (1, 8)
    ocrd = flat.map_batches(OCRStage, **kwargs)
    return reassemble(ocrd, mode=mode)


# ---------------------------------------------------------------------------
# Naive single-process oracle (test-side expected output)
# ---------------------------------------------------------------------------

def reference_extract_document(
    doc: Dict, mode: str = "markdown", fail_refs: Optional[Set[str]] = None
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
    joined = join_pages([s["text"] for s in out_spans])
    if mode == "custom":
        markdown = joined
    else:
        markdown = clean_content(joined, remove_page_splits=True)
    n_errors = sum(1 for s in out_spans if s["text"].startswith("[Error processing page "))
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
