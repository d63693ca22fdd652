"""The stateful OCR stage: an actor-pool ``map_batches`` callable class.

This replaces the reference's Docker client/server round-trip and its
module-global vLLM engine (docker/start_server.py:229-231,298-380): the
engine/backend is constructed ONCE per actor in ``__init__`` and every
``__call__`` processes one Arrow batch of exploded spans, OCR-ing only
the media rows (text spans pass through).

Backends:
  - ``MockOCRBackend`` (default in this sandbox): deterministic text from
    (media_ref, mode) -- see functions/mock_ocr.py. Same role as the
    reference's greedy (temperature=0.0) decode: pure function of input.
  - ``VLLMOCRBackend``: the real-model shape (vLLM LLM + sampling params
    per docker/start_server.py:298-380); constructor raises in this
    sandbox (no GPU/vllm). The dataflow around it is identical, so
    swapping backends does not change the pipeline.

Error semantics replicate the reference exactly: a per-row backend
failure becomes the page text ``[Error processing page {n}: {e}]`` and
the job continues (docker/start_server.py:464-466, M15).
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Set

import pyarrow as pa

from ..functions.cleaning import EOS_MODEL, EOS_SERVER, page_error_text, strip_server_eos
from ..functions.mock_ocr import mock_ocr_text

#: Default prompt (docker/overrides/config.py:33).
DEFAULT_PROMPT = "<image>\n<|grounding|>Convert the document to markdown."
#: Prompt presets (pdf_to_markdown_cli.py:40-43).
PROMPTS = {
    "markdown": DEFAULT_PROMPT,
    "ocr": "<image>\nFree OCR.",
    "custom": DEFAULT_PROMPT,  # caller overrides via prompt= arg
}


class MockOCRBackend:
    """Deterministic stand-in for the GPU model (tests/bench)."""

    def __init__(self, mode: str = "markdown", eos_token: str = EOS_SERVER,
                 fail_refs: Optional[Set[str]] = None):
        self.mode = mode
        self.eos_token = eos_token
        self.fail_refs = fail_refs or set()

    def generate(self, media_refs: Sequence[str]) -> List[str]:
        out = []
        for ref in media_refs:
            if ref in self.fail_refs:
                raise_ref = ValueError(f"mock backend failure for {ref}")
                raise raise_ref
            out.append(mock_ocr_text(ref, self.mode, self.eos_token))
        return out

    def generate_one(self, media_ref: str) -> str:
        if media_ref in self.fail_refs:
            raise ValueError(f"mock backend failure for {media_ref}")
        return mock_ocr_text(media_ref, self.mode, self.eos_token)


class VLLMOCRBackend:
    """Real-model backend boundary (NOT exercised in this sandbox).

    Mirrors the reference engine construction: ``LLM(model=...,
    hf_overrides={"architectures": ["DeepseekOCRForCausalLM"]},
    enforce_eager, max_model_len, max_num_seqs, gpu_memory_utilization,
    dtype by compute capability)`` with greedy sampling and the
    no-repeat-ngram processor (docker/start_server.py:298-380). The
    media_ref would be resolved to pixels by the multimodal stage and
    tokenized per image_process.tokenize_with_images semantics.
    """

    def __init__(self, model_path: str, **kwargs):
        try:
            import vllm  # noqa: F401
        except ImportError as e:
            raise NotImplementedError(
                "vLLM backend requires GPU + vllm; use MockOCRBackend in the sandbox"
            ) from e

    def generate(self, media_refs: Sequence[str]) -> List[str]:  # pragma: no cover
        raise NotImplementedError


def make_backend(backend: str = "mock", mode: str = "markdown",
                 eos_token: str = EOS_SERVER,
                 fail_refs: Optional[Set[str]] = None,
                 model_path: str = "deepseek-ai/DeepSeek-OCR"):
    if backend == "mock":
        return MockOCRBackend(mode=mode, eos_token=eos_token, fail_refs=fail_refs)
    if backend == "vllm":
        return VLLMOCRBackend(model_path)
    raise ValueError(f"unknown backend {backend!r}")


class OCRStage:
    """Actor-pool stage: OCR media spans in an exploded batch.

    Use as ``ds.map_batches(OCRStage, fn_constructor_kwargs=...,
    concurrency=N, batch_size=B, batch_format="pyarrow")``. State
    (backend/model) is built once per actor; ``__call__`` is per batch.

    ``strip_eos=True`` applies the API server's per-page ASCII EOS strip
    (start_server.py:427-428) to OCR output -- text spans are passed
    through untouched (they are already extracted content).
    """

    def __init__(self, mode: str = "markdown", backend: str = "mock",
                 eos_token: str = EOS_SERVER, strip_eos: bool = True,
                 fail_refs: Optional[Set[str]] = None,
                 model_path: str = "deepseek-ai/DeepSeek-OCR"):
        self.mode = mode
        self.strip_eos = strip_eos
        self.backend = make_backend(backend, mode, eos_token, fail_refs, model_path)

    def __call__(self, batch: pa.Table) -> pa.Table:
        kinds = batch.column("kind").to_pylist()
        texts = batch.column("text").to_pylist()
        refs = batch.column("media_ref").to_pylist()
        offsets = batch.column("offset").to_pylist()

        media_idx = [i for i, k in enumerate(kinds) if k != "text"]
        if media_idx:
            try:
                # one BATCHED inference call per batch -- the whole point
                # of the exploded path is continuous batching on the GPU
                # backend (vLLM max_num_seqs), matching the fused path and
                # run_dpsk_ocr_pdf.py:284-287's single llm.generate
                results = self.backend.generate([refs[i] for i in media_idx])
                for i, r in zip(media_idx, results):
                    texts[i] = strip_server_eos(r) if self.strip_eos else r
            except Exception:
                # isolate poisoned rows: per-row fallback preserving the
                # reference's per-page error semantics (M15,
                # docker/start_server.py:464-466)
                for i in media_idx:
                    try:
                        result = self.backend.generate_one(refs[i])
                        texts[i] = strip_server_eos(result) if self.strip_eos else result
                    except Exception as e:
                        texts[i] = page_error_text(int(offsets[i]) + 1, str(e))

        idx = batch.schema.get_field_index("text")
        return batch.set_column(idx, "text", pa.array(texts, type=pa.string()))


class BatchScriptOCRStage(OCRStage):
    """Batch-script-path variant: fullwidth EOS + SKIP_REPEAT filter.

    Pages whose output lacks the model EOS token are DROPPED (runaway
    repetition guard, run_dpsk_ocr_pdf.py:305-309 + config.py:20).
    """

    def __init__(self, mode: str = "markdown", backend: str = "mock",
                 fail_refs: Optional[Set[str]] = None):
        super().__init__(mode=mode, backend=backend, eos_token=EOS_MODEL,
                         strip_eos=False, fail_refs=fail_refs)

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..functions.cleaning import has_model_eos, strip_model_eos

        kinds = batch.column("kind").to_pylist()
        texts = batch.column("text").to_pylist()
        refs = batch.column("media_ref").to_pylist()
        keep = [True] * len(kinds)
        media_idx = [i for i, k in enumerate(kinds) if k != "text"]
        if media_idx:
            # batched inference (run_dpsk_ocr_pdf.py:284-287); the batch
            # script has no per-page error substitution, so a backend
            # failure fails the task -- same as the reference script.
            results = self.backend.generate([refs[i] for i in media_idx])
            for i, raw in zip(media_idx, results):
                if has_model_eos(raw):
                    texts[i] = strip_model_eos(raw)
                else:
                    keep[i] = False  # SKIP_REPEAT drop
        idx = batch.schema.get_field_index("text")
        out = batch.set_column(idx, "text", pa.array(texts, type=pa.string()))
        return out.filter(pa.array(keep, type=pa.bool_()))
