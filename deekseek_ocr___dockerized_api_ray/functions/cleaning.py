"""Byte-exact reimplementation of the reference's text-cleaning semantics.

Every function here replicates a deterministic transform of the reference
repo (cited by file:line into /root/reference) so the engine's output is
span/byte-equal to the reference API path. These are pure string
functions: they run inside ``map_batches`` UDFs over Arrow string
columns; all regexes are compiled once at module import (shared by every
task / actor in a worker process).

Reference citations:
  - match_tags / tag pattern ............ Lib/postprocessor.py:26-41
  - server EOS strip .................... docker/start_server.py:427-428
  - model (fullwidth) EOS strip ......... docker/overrides/run_dpsk_ocr_pdf.py:305-306
  - mojibake EOS strip .................. Lib/postprocessor.py:202-203
  - page join marker .................... docker/start_server.py:467
  - clean_content chain ................. Lib/postprocessor.py:177-237
  - image-tag link rewrite .............. Lib/postprocessor.py:66-139
  - clean_formula / <center> strip ...... docker/overrides/run_dpsk_ocr_eval_batch.py:54-69,173-174
  - per-page error string ............... docker/start_server.py:464-466
"""

from __future__ import annotations

import re
import urllib.parse
from typing import Callable, List, NamedTuple, Optional, Tuple

from .grounding import parse_det_coords

# ---------------------------------------------------------------------------
# Token / marker constants (exact bytes matter; three distinct EOS variants
# appear in the reference and they are NOT the same string).
# ---------------------------------------------------------------------------

#: ASCII variant stripped per page by the API server (start_server.py:427-428).
EOS_SERVER = "<|endofsentence|>"
#: Fullwidth-bar variant the model actually emits; stripped by the batch
#: script (run_dpsk_ocr_pdf.py:305-306). U+FF5C bars + U+2581 blocks.
EOS_MODEL = "<\uff5cend\u2581of\u2581sentence\uff5c>"
#: Mojibake variant checked by the client post-processor
#: (Lib/postprocessor.py:202-203) -- literal question marks.
EOS_MOJIBAKE = "<?end?of?sentence?>"

#: Page join marker used by the API path (start_server.py:467).
PAGE_SPLIT_JOIN = "\n\n<--- Page Split --->\n\n"
#: Per-page suffix marker used by the batch script (run_dpsk_ocr_pdf.py:312-314).
PAGE_SPLIT_BATCH = "\n<--- Page Split --->\n"

#: Grounding-tag pattern (Lib/postprocessor.py:29). DOTALL: labels/coords
#: may span newlines.
TAG_PATTERN = re.compile(r"(<\|ref\|>(.*?)<\|/ref\|><\|det\|>(.*?)<\|/det\|>)", re.DOTALL)
#: Marker distinguishing image tags (Lib/postprocessor.py:36).
IMAGE_REF_MARKER = "<|ref|>image<|/ref|>"
#: det-extraction pattern inside an image tag (Lib/postprocessor.py:98).
#: Deliberately NOT DOTALL: the reference's re.search there is flagless, so
#: an image tag whose det payload contains a newline is left in place (the
#: rewrite is skipped) -- we match that behavior exactly.
IMAGE_DET_PATTERN = re.compile(r"<\|ref\|>image<\|/ref\|><\|det\|>(.*?)<\|/det\|>")

# Truncated/incomplete trailing-tag cleanup -- 5 ordered regexes
# (Lib/postprocessor.py:219-223). Order is semantic; do not reorder.
_TRUNCATED_RES = [
    re.compile(r"<\|ref\|>[^<]*$"),
    re.compile(r"<\|det\|>[^<]*$"),
    re.compile(r"<\|ref\|>\w+<\|/ref\|><\|det\|>\[\[[\d\s,\.]*$"),
    re.compile(r"<\|ref\|>(?![^<]*<\|/ref\|>)"),
    re.compile(r"<\|det\|>(?![^<]*<\|/det\|>)"),
]

#: Page-split removal (Lib/postprocessor.py:227).
PAGE_SPLIT_RE = re.compile(r"\n*<-+\s*Page\s*Split\s*-+>\n*", re.IGNORECASE)
#: Newline-run normalization step 1 (Lib/postprocessor.py:234).
_NL4_RE = re.compile(r"\n{4,}")

#: Formula cleanup (run_dpsk_ocr_eval_batch.py:56-61).
_FORMULA_RE = re.compile(r"\\\[(.*?)\\\]")
_FORMULA_QUAD_RE = re.compile(r"\\quad\s*\([^)]*\)")


def match_tags(text: str) -> Tuple[List[Tuple[str, str, str]], List[str], List[str]]:
    """Find grounding tags; partition into image vs other.

    Replicates PostProcessor.match_tags (Lib/postprocessor.py:26-41):
    returns (all_matches, image_tag_strings, other_tag_strings) where a
    tag is an "image" tag iff the full tag contains ``<|ref|>image<|/ref|>``.
    """
    matches = TAG_PATTERN.findall(text)
    matches_image: List[str] = []
    matches_other: List[str] = []
    for m in matches:
        if IMAGE_REF_MARKER in m[0]:
            matches_image.append(m[0])
        else:
            matches_other.append(m[0])
    return matches, matches_image, matches_other


def strip_server_eos(text: str) -> str:
    """Per-page EOS strip done by the API server (start_server.py:427-428).

    Note: the server strips the ASCII variant only; the fullwidth model
    token would pass through -- we replicate that behavior exactly.
    """
    if EOS_SERVER in text:
        text = text.replace(EOS_SERVER, "")
    return text


def has_model_eos(text: str) -> bool:
    """True if the fullwidth model EOS token is present.

    The batch script drops pages lacking it when SKIP_REPEAT is on
    (run_dpsk_ocr_pdf.py:305-309) -- a runaway-repetition guard.
    """
    return EOS_MODEL in text


def strip_model_eos(text: str) -> str:
    """Batch-script EOS strip (run_dpsk_ocr_pdf.py:305-306)."""
    return text.replace(EOS_MODEL, "")


def page_error_text(page_num_1based: int, error: str) -> str:
    """Reference per-page failure placeholder (start_server.py:466)."""
    return f"[Error processing page {page_num_1based}: {error}]"


def join_pages(page_texts: List[str]) -> str:
    """API-path document join (start_server.py:467)."""
    return PAGE_SPLIT_JOIN.join(page_texts)


class CropSpec(NamedTuple):
    """One successful image extraction: which page to crop where, and the
    filename the markdown link points to (W4)."""

    img_idx: int      # index among the doc's image tags
    page_index: int   # modulo-paired page (Lib/postprocessor.py:105)
    filename: str     # link_name_fn(total_extracted)
    x1: int
    y1: int
    x2: int
    y2: int


def rewrite_image_tags_with_crops(
    content: str,
    matches_images: List[str],
    page_dims: List[Tuple[int, int]],
    link_name_fn: Callable[[int], str],
) -> Tuple[str, List[CropSpec]]:
    """Image-tag -> markdown-link rewrite + the crop plan (extraction mode).

    Replicates extract_and_save_images (Lib/postprocessor.py:93-139); the
    returned CropSpecs are exactly the crops the reference would save
    (the pixel crop itself runs in stages/crops.py):

      - no pages available -> every image tag becomes ``[Image]``
        (Lib/postprocessor.py:88-91), no crops
      - page paired by ``img_idx % n_pages`` (``:105`` -- the reference's
        modulo quirk, reproduced deliberately)
      - coords parsed from det content (reference uses ``eval``,
        Lib/postprocessor.py:104 -- we use ast.literal_eval, see
        grounding.parse_det_coords)
      - scale ``int(c/999*dim)``; skip degenerate ``x1>=x2 or y1>=y2``
        boxes; only the FIRST valid box is used (``break``, ``:131``)
      - replacement ``\\n![Extracted Image](images/{urlquoted name})\\n``,
        first occurrence only (``:128``)
      - parse failure -> ``[Image - extraction failed]`` (``:134``)
    """
    crops: List[CropSpec] = []
    if not page_dims:
        for tag in matches_images:
            content = content.replace(tag, "[Image]", 1)
        return content, crops

    total_extracted = 0
    for img_idx, img_tag in enumerate(matches_images):
        det_match = IMAGE_DET_PATTERN.search(img_tag)
        if not det_match:
            continue
        try:
            coordinates = parse_det_coords(det_match.group(1))
            page_to_use = img_idx % len(page_dims) if len(page_dims) > 1 else 0
            width, height = page_dims[page_to_use]
            for points in coordinates:
                x1, y1, x2, y2 = points
                x1 = int(x1 / 999 * width)
                y1 = int(y1 / 999 * height)
                x2 = int(x2 / 999 * width)
                y2 = int(y2 / 999 * height)
                if x1 >= x2 or y1 >= y2:
                    continue
                image_filename = link_name_fn(total_extracted)
                encoded = urllib.parse.quote(image_filename)
                markdown_link = f"\n![Extracted Image](images/{encoded})\n"
                content = content.replace(img_tag, markdown_link, 1)
                crops.append(CropSpec(img_idx, page_to_use, image_filename,
                                      x1, y1, x2, y2))
                total_extracted += 1
                break
        except Exception:
            content = content.replace(img_tag, "[Image - extraction failed]", 1)
    return content, crops


def rewrite_image_tags(
    content: str,
    matches_images: List[str],
    page_dims: List[Tuple[int, int]],
    link_name_fn: Callable[[int], str],
) -> str:
    """Text-only view of rewrite_image_tags_with_crops (M6)."""
    out, _ = rewrite_image_tags_with_crops(content, matches_images, page_dims,
                                           link_name_fn)
    return out


def clean_content(
    content: str,
    *,
    extract_images: bool = False,
    page_dims: Optional[List[Tuple[int, int]]] = None,
    link_name_fn: Optional[Callable[[int], str]] = None,
    remove_page_splits: bool = False,
) -> str:
    """The reference's clean_content chain, byte-exact, in its exact order
    (Lib/postprocessor.py:177-237):

      1. mojibake EOS strip
      2. image tags: link-rewrite (extract mode) or remove-first-occurrence
      3. other tags: re-matched on the CURRENT content, remove ALL occurrences
      4. five ordered truncated-tag regexes
      5. optional page-split removal
      6. LaTeX ``\\coloneqq``/``\\eqqcolon`` substitution
      7. newline normalization (``\\n{4,}`` -> 3, then ``\\n\\n\\n`` -> 2)
      8. final strip()

    Empty input returns unchanged (``:198-199``, no strip applied).
    """
    if not content:
        return content

    if EOS_MOJIBAKE in content:
        content = content.replace(EOS_MOJIBAKE, "")

    _, matches_images, _ = match_tags(content)
    if extract_images:
        content = rewrite_image_tags(
            content,
            matches_images,
            page_dims or [],
            link_name_fn or (lambda i: f"img{i}.jpg"),
        )
    else:
        for tag in matches_images:
            content = content.replace(tag, "", 1)

    # Other tags are re-matched AFTER image handling (Lib/postprocessor.py:214).
    _, _, matches_other = match_tags(content)
    for tag in matches_other:
        content = content.replace(tag, "")

    for rx in _TRUNCATED_RES:
        content = rx.sub("", content)

    if remove_page_splits:
        content = PAGE_SPLIT_RE.sub("\n\n", content)

    content = content.replace("\\coloneqq", ":=")
    content = content.replace("\\eqqcolon", "=:")

    content = _NL4_RE.sub("\n\n\n", content)
    content = content.replace("\n\n\n", "\n\n")

    return content.strip()


def clean_formula(text: str) -> str:
    """Eval-mode formula cleanup (run_dpsk_ocr_eval_batch.py:54-69):
    inside every ``\\[...\\]`` block drop ``\\quad\\s*\\([^)]*\\)`` then strip."""

    def _process(match: "re.Match[str]") -> str:
        formula = _FORMULA_QUAD_RE.sub("", match.group(1))
        return r"\[" + formula.strip() + r"\]"

    return _FORMULA_RE.sub(_process, text)


def strip_center_tags(text: str) -> str:
    """Eval-mode ``<center>`` strip (run_dpsk_ocr_eval_batch.py:173-174)."""
    return text.replace("<center>", "").replace("</center>", "")


def eval_clean_page(content: str) -> str:
    """Eval-batch-script per-image cleaning (run_dpsk_ocr_eval_batch.py:
    172-174): clean_formula, then for EVERY grounding tag (the eval
    script's re_match does not split out image tags, :71-80) remove the
    tag and chain the newline + <center> replaces PER ITERATION -- so a
    page with no tags gets no newline/center cleanup at all (reference
    quirk, reproduced deliberately). No EOS strip on this path."""
    content = clean_formula(content)
    matches = TAG_PATTERN.findall(content)
    for m in matches:
        content = (
            content.replace(m[0], "")
            .replace("\n\n\n\n", "\n\n")
            .replace("\n\n\n", "\n\n")
            .replace("<center>", "")
            .replace("</center>", "")
        )
    return content


def clean_content_batch_script(content: str, page_idx: int) -> str:
    """The batch-script per-page cleaning variant (run_dpsk_ocr_pdf.py:302-336):
    image tags -> ``![](images/{page}_{idx}.jpg)\\n`` links (replace ALL
    occurrences -- unlike the API path's replace-first), other tags removed
    with chained LaTeX + newline replaces per match (``:326-330``)."""
    _, matches_images, matches_other = match_tags(content)
    for idx, tag in enumerate(matches_images):
        content = content.replace(tag, f"![](images/{page_idx}_{idx}.jpg)\n")
    for tag in matches_other:
        content = (
            content.replace(tag, "")
            .replace("\\coloneqq", ":=")
            .replace("\\eqqcolon", "=:")
            .replace("\n\n\n\n", "\n\n")
            .replace("\n\n\n", "\n\n")
        )
    return content
