"""Differential conformance: our clean_content vs the reference's, byte-exact.

Loads /root/reference/Lib/postprocessor.py directly (its fitz/PIL imports
stubbed -- the non-extract clean path never touches them) and compares
outputs on hypothesis-generated raw-OCR-shaped inputs plus the synthetic
corpus generator's construct pool. This pins the engine to the actual
reference behavior rather than to our reading of it.
"""

import importlib.util
import os
import sys
import types

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from deekseek_ocr___dockerized_api_ray.functions.cleaning import clean_content, clean_formula
from deekseek_ocr___dockerized_api_ray.sources.corpus import generate_doc

REF_PP = "/root/reference/Lib/postprocessor.py"


def _load_reference_postprocessor():
    for name in ("fitz", "PIL", "PIL.Image"):
        if name not in sys.modules:
            sys.modules[name] = types.ModuleType(name)
    sys.modules["PIL.Image"].Image = type("Image", (), {})  # annotation target
    sys.modules["PIL"].Image = sys.modules["PIL.Image"]
    pkg = types.ModuleType("refLib")
    pkg.__path__ = [os.path.dirname(REF_PP)]
    sys.modules["refLib"] = pkg
    cfg = types.ModuleType("refLib.config")

    class Config:  # the clean path never reads config fields
        pass

    cfg.Config = Config
    sys.modules["refLib.config"] = cfg
    spec = importlib.util.spec_from_file_location("refLib.postprocessor", REF_PP)
    mod = importlib.util.module_from_spec(spec)
    sys.modules["refLib.postprocessor"] = mod
    spec.loader.exec_module(mod)
    return mod


needs_ref = pytest.mark.skipif(not os.path.exists(REF_PP), reason="reference not present")


@pytest.fixture(scope="module")
def ref_pp():
    mod = _load_reference_postprocessor()
    return mod.PostProcessor(config=None)


_fragments = st.sampled_from(
    [
        "<|ref|>", "<|/ref|>", "<|det|>", "<|/det|>", "image", "title", "table",
        "[[1, 2, 3, 4]]", "[[9, 9, 1, 1]]", "[[1, 2, 3, 4], [5, 6, 7, 8]]",
        "[[12, 5", "\n", "\n\n", "\n\n\n\n", "plain text ", "# Heading\n",
        "<--- Page Split --->", "\n<--- Page Split --->\n", "<?end?of?sentence?>",
        "<|endofsentence|>", "<｜end▁of▁sentence｜>",
        "\\coloneqq", "\\eqqcolon", "\\[ x \\quad (1) \\]", "<center>c</center>",
        "<|ref|>image<|/ref|><|det|>[[100, 100, 400, 300]]<|/det|>",
        "<|ref|>footnote<|/ref|><|det|>[[5, 900, 990, 950]]<|/det|>",
        "word ", "先忧 ", "<", ">", "|",
    ]
)
_raw_texts = st.lists(_fragments, min_size=0, max_size=12).map("".join)


@needs_ref
@settings(max_examples=300, deadline=None)
@given(content=_raw_texts, remove_splits=st.booleans())
def test_clean_content_parity(ref_pp, content, remove_splits):
    expected, imgs = ref_pp.clean_content(
        content, extract_images=False, remove_page_splits=remove_splits
    )
    assert imgs == []
    got = clean_content(content, remove_page_splits=remove_splits)
    assert got == expected


@needs_ref
def test_clean_content_parity_on_corpus_spans(ref_pp):
    # every text span the synthetic generator can emit, joined as the
    # pipeline would, must clean identically
    for i in range(200):
        doc = generate_doc(i, seed=42)
        texts = [s["text"] for s in sorted(doc["spans"], key=lambda s: s["offset"])]
        joined = "\n\n<--- Page Split --->\n\n".join(texts)
        expected, _ = ref_pp.clean_content(
            joined, extract_images=False, remove_page_splits=True
        )
        assert clean_content(joined, remove_page_splits=True) == expected


@needs_ref
def test_match_tags_parity(ref_pp):
    samples = [
        "<|ref|>image<|/ref|><|det|>[[1, 2, 3, 4]]<|/det|>",
        "a<|ref|>x<|/ref|><|det|>y<|/det|>b<|ref|>image<|/ref|><|det|>z<|/det|>",
        "nothing here",
        "<|ref|>nested image label<|/ref|><|det|>[[0, 0, 1, 1]]<|/det|>",
    ]
    from deekseek_ocr___dockerized_api_ray.functions.cleaning import match_tags

    for s in samples:
        assert match_tags(s) == ref_pp.match_tags(s)


@needs_ref
def test_clean_formula_parity():
    # clean_formula lives in the eval batch script; execute just that def
    import re as _re

    src = open("/root/reference/docker/overrides/run_dpsk_ocr_eval_batch.py").read()
    m = _re.search(r"def clean_formula.*?(?=\ndef )", src, _re.S)
    ns = {"re": _re}
    exec(m.group(0), ns)  # noqa: S102 -- test-only differential check
    ref_fn = ns["clean_formula"]
    for s in [
        "\\[ E = mc^2 \\quad (1.2) \\]",
        "pre \\[ a + b \\] post",
        "\\[\\quad (x)\\]",
        "no formula",
        "\\[ one \\] mid \\[ two \\quad (3) \\]",
    ]:
        assert clean_formula(s) == ref_fn(s)


@needs_ref
def test_eval_clean_page_parity():
    # differential check vs the eval script's own functions + its exact
    # per-tag cleanup loop (run_dpsk_ocr_eval_batch.py:165-180)
    import re as _re

    from deekseek_ocr___dockerized_api_ray.functions.cleaning import eval_clean_page
    from deekseek_ocr___dockerized_api_ray.functions.mock_ocr import mock_ocr_text_batch

    src = open("/root/reference/docker/overrides/run_dpsk_ocr_eval_batch.py").read()
    ns = {"re": _re}
    for name in ("clean_formula", "re_match"):
        m = _re.search(rf"def {name}.*?(?=\ndef |\nclass )", src, _re.S)
        exec(m.group(0), ns)  # noqa: S102 -- test-only differential check

    def ref_eval_clean(content):
        content = ns["clean_formula"](content)
        _, mathes_other = ns["re_match"](content)
        for a_match_other in mathes_other:
            content = (
                content.replace(a_match_other, "")
                .replace("\n\n\n\n", "\n\n")
                .replace("\n\n\n", "\n\n")
                .replace("<center>", "")
                .replace("</center>", "")
            )
        return content

    samples = [
        "plain page, no tags, with\n\n\n\nruns and <center>kept</center>",
        "<|ref|>title<|/ref|><|det|>[[1, 2, 3, 4]]<|/det|>x\n\n\n\ny<center>z</center>",
        "\\[ E = mc^2 \\quad (1.2) \\]<|ref|>image<|/ref|><|det|>[[9, 9, 1, 1]]<|/det|>",
        "",
    ] + [mock_ocr_text_batch(f"media://p/{i}", "markdown") for i in range(50)]
    for s in samples:
        assert eval_clean_page(s) == ref_eval_clean(s)


@needs_ref
def test_image_rewrite_parity(ref_pp, tmp_path, monkeypatch):
    """Differential check of the extract_images path: which tags get
    rewritten to links, left in place, or error-substituted must match
    the reference's extract_and_save_images exactly (link filenames are
    timestamped in the reference, so both outputs are normalized to a
    placeholder before comparing). Includes the newline-in-det-payload
    case: the reference's det re.search is flagless (not DOTALL), so
    such a tag is left untouched."""
    import re as _re

    from deekseek_ocr___dockerized_api_ray.functions.cleaning import (
        match_tags,
        rewrite_image_tags,
    )

    class _FakeCrop:
        def save(self, path):
            pass

    ref_crop_log = []

    class _FakePage:
        def __init__(self, idx, size):
            self.idx = idx
            self.size = size

        def crop(self, box):
            ref_crop_log.append((self.idx, box))
            return _FakeCrop()

    page_dims = [(850, 1100), (425, 550), (1700, 2200)]

    def fake_pdf_to_images(pdf_path, dpi=None):
        return [_FakePage(i, s) for i, s in enumerate(page_dims)]

    monkeypatch.setattr(ref_pp, "pdf_to_images", fake_pdf_to_images)

    link_re = _re.compile(r"!\[Extracted Image\]\(images/[^)]*\)")

    samples = [
        # ordinary single-box tag -> rewritten
        "a<|ref|>image<|/ref|><|det|>[[100, 100, 400, 300]]<|/det|>b",
        # newline INSIDE the det payload -> reference leaves the tag
        "x<|ref|>image<|/ref|><|det|>[[100,\n 100, 400, 300]]<|/det|>y",
        # degenerate box then valid box -> second box used
        "m<|ref|>image<|/ref|><|det|>[[9, 9, 1, 1], [10, 10, 500, 500]]<|/det|>n",
        # all boxes degenerate -> tag stays (no replacement, no error)
        "q<|ref|>image<|/ref|><|det|>[[9, 9, 1, 1]]<|/det|>r",
        # unparseable det payload -> '[Image - extraction failed]'
        "u<|ref|>image<|/ref|><|det|>not a list<|/det|>v",
        # two tags across the modulo page pairing
        (
            "p1 <|ref|>image<|/ref|><|det|>[[10, 10, 600, 600]]<|/det|> mid "
            "<|ref|>image<|/ref|><|det|>[[20, 20, 700, 700]]<|/det|> p2 "
            "<|ref|>image<|/ref|><|det|>[[30, 30, 800, 800]]<|/det|> end"
        ),
        # non-image tag untouched, image tag rewritten
        "<|ref|>title<|/ref|><|det|>[[1, 2, 3, 4]]<|/det|>"
        "<|ref|>image<|/ref|><|det|>[[50, 50, 900, 900]]<|/det|>",
    ]
    from deekseek_ocr___dockerized_api_ray.functions.cleaning import (
        rewrite_image_tags_with_crops,
    )

    for content in samples:
        ref_crop_log.clear()
        expected, _paths = ref_pp.extract_and_save_images(
            "/tmp/fake.pdf", content, output_dir=tmp_path
        )
        _, matches_images, _ = match_tags(content)
        got, crops = rewrite_image_tags_with_crops(
            content, matches_images, page_dims, lambda i: f"crop_{i}.jpg"
        )
        assert rewrite_image_tags(
            content, matches_images, page_dims, lambda i: f"crop_{i}.jpg"
        ) == got
        assert link_re.sub("![Extracted Image](images/X)", got) == link_re.sub(
            "![Extracted Image](images/X)", expected
        )
        # W4 parity: exactly the reference's crop calls, same pages and boxes
        # (the reference also crops degenerate-then-valid lists identically)
        assert [(c.page_index, (c.x1, c.y1, c.x2, c.y2)) for c in crops] == ref_crop_log
