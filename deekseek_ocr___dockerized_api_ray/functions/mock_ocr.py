"""Deterministic mock OCR text generation.

The sandbox has no GPU / vLLM, so the OCR actor stage's default backend
is this pure function: ``mock_ocr_text(media_ref, mode)`` -- raw
OCR-shaped output (grounding tags, EOS token, markdown) derived only
from the media_ref string. Any worker at any parallelism level produces
the identical bytes, which is what makes N-vs-4N scaling runs and
kill/resume runs span-equal (FIXTURES.md section "Media-span payloads").

The emitted constructs mirror what the real model emits per the
reference's parsing code (grounding tag grammar Lib/postprocessor.py:29;
EOS token run_dpsk_ocr_pdf.py:305; markdown body
docker/overrides/config.py:33's "Convert the document to markdown.").
"""

from __future__ import annotations

import hashlib

from .cleaning import EOS_MODEL, EOS_SERVER

_WORDS = (
    "document layout table figure heading paragraph caption text margin "
    "column row cell title abstract section body footer header index note"
).split()

_LABELS = ["title", "table", "paragraph", "figure_caption", "footnote"]

#: modes mirror the reference prompt presets (pdf_to_markdown_cli.py:40-43).
MODES = ("markdown", "ocr", "custom")


def _h(key: str) -> int:
    return int.from_bytes(hashlib.sha256(key.encode("utf-8")).digest()[:8], "big")


def _words(key: str, n: int) -> str:
    h = _h(key)
    out = []
    for i in range(n):
        out.append(_WORDS[(h >> (i * 4)) % len(_WORDS) if i < 14 else _h(f"{key}:{i}") % len(_WORDS)])
    return " ".join(out)


def mock_ocr_text(media_ref: str, mode: str = "markdown", eos_token: str = EOS_SERVER) -> str:
    """Raw OCR output for a media span -- pure function of (media_ref, mode).

    Shape: optional grounded title tag, markdown-ish body lines, an image
    grounding tag on ~1/3 of pages (sometimes with a degenerate box to
    exercise the skip rule Lib/postprocessor.py:116-117), occasionally a
    truncated trailing tag, and the EOS token on ~95% of pages (pages
    without it exercise SKIP_REPEAT, run_dpsk_ocr_pdf.py:305-309).

    ``eos_token`` lets the API-path pipeline use the ASCII variant the
    server strips (start_server.py:427) and the batch-path pipeline use
    the fullwidth model token (run_dpsk_ocr_pdf.py:305).
    """
    h = _h(f"{media_ref}|{mode}")
    label = _LABELS[h % len(_LABELS)]
    x1, y1 = h % 400, (h >> 8) % 400
    x2, y2 = x1 + 50 + (h >> 16) % 500, y1 + 40 + (h >> 24) % 500
    x2, y2 = min(x2, 999), min(y2, 999)

    parts = []
    if mode == "markdown":
        parts.append(
            f"<|ref|>{label}<|/ref|><|det|>[[{x1}, {y1}, {x2}, {y2}]]<|/det|>"
            f"## {_words(media_ref + ':t', 3).title()}\n\n"
        )
    parts.append(_words(media_ref + ":b1", 10) + ".\n\n")

    if h % 3 == 0:
        ix1, iy1 = (h >> 4) % 300, (h >> 12) % 300
        if h % 9 == 0:
            # degenerate box first, then a valid one (first-valid-box rule)
            boxes = f"[[{ix1 + 200}, {iy1 + 200}, {ix1}, {iy1}], [{ix1}, {iy1}, {ix1 + 250}, {iy1 + 180}]]"
        else:
            boxes = f"[[{ix1}, {iy1}, {ix1 + 250}, {iy1 + 180}]]"
        parts.append(f"<|ref|>image<|/ref|><|det|>{boxes}<|/det|>\n\n")

    parts.append(_words(media_ref + ":b2", 12) + ".")
    if h % 17 == 0:
        parts.append("\n\\[ E = mc^2 \\quad (1.2) \\]")
    if h % 23 == 0:
        parts.append(" x \\coloneqq y")
    if h % 29 == 0:
        # truncated trailing tag (exercises Lib/postprocessor.py:219-223)
        parts.append("\n<|ref|>table")

    text = "".join(parts)
    if h % 20 != 0:
        text += eos_token
    return text


def mock_ocr_text_batch(media_ref: str, mode: str = "markdown") -> str:
    """Batch-script variant: emits the fullwidth model EOS token."""
    return mock_ocr_text(media_ref, mode, eos_token=EOS_MODEL)
