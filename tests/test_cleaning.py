"""Byte-exact unit tests for the cleaning semantics (SURVEY.md M1-M15).

Expected strings are hand-derived from the reference code paths cited in
functions/cleaning.py -- each test name carries the M-number."""

from deekseek_ocr___dockerized_api_ray.functions import cleaning as c
from deekseek_ocr___dockerized_api_ray.functions.grounding import (
    extract_coordinates_and_label,
    parse_det_coords,
    scale_box,
)


def test_m1_match_tags_partition():
    text = (
        "<|ref|>image<|/ref|><|det|>[[1, 2, 3, 4]]<|/det|>x"
        "<|ref|>title<|/ref|><|det|>[[5, 6, 7, 8]]<|/det|>y"
    )
    all_m, imgs, others = c.match_tags(text)
    assert len(all_m) == 2
    assert imgs == ["<|ref|>image<|/ref|><|det|>[[1, 2, 3, 4]]<|/det|>"]
    assert others == ["<|ref|>title<|/ref|><|det|>[[5, 6, 7, 8]]<|/det|>"]


def test_m1_dotall_spans_newlines():
    text = "<|ref|>ti\ntle<|/ref|><|det|>[[1,\n2, 3, 4]]<|/det|>"
    all_m, imgs, others = c.match_tags(text)
    assert len(all_m) == 1 and not imgs and len(others) == 1


def test_m2_eos_variants_are_distinct():
    assert c.EOS_SERVER != c.EOS_MODEL != c.EOS_MOJIBAKE
    assert c.strip_server_eos("a<|endofsentence|>b") == "ab"
    # the server does NOT strip the fullwidth model token (start_server.py:427)
    assert c.strip_server_eos("a" + c.EOS_MODEL) == "a" + c.EOS_MODEL
    assert c.strip_model_eos("a" + c.EOS_MODEL + "b") == "ab"
    assert c.has_model_eos("x" + c.EOS_MODEL)
    assert not c.has_model_eos("x" + c.EOS_SERVER)


def test_m3_page_join():
    assert c.join_pages(["p1", "p2"]) == "p1\n\n<--- Page Split --->\n\np2"


def test_m4_page_split_removal():
    out = c.clean_content("a\n\n<--- Page Split --->\n\nb", remove_page_splits=True)
    assert out == "a\n\nb"
    # case-insensitive, variable dashes
    out = c.clean_content("a\n<-- page split -->\nb", remove_page_splits=True)
    assert out == "a\n\nb"
    # flag off -> marker retained
    out = c.clean_content("a\n\n<--- Page Split --->\n\nb", remove_page_splits=False)
    assert "<--- Page Split --->" in out


def test_m5_image_tag_removed_first_occurrence():
    tag = "<|ref|>image<|/ref|><|det|>[[1, 1, 9, 9]]<|/det|>"
    out = c.clean_content(f"x{tag}y{tag}z")
    assert out == "xyz"


def test_m7_other_tags_removed_all_occurrences():
    tag = "<|ref|>title<|/ref|><|det|>[[1, 1, 9, 9]]<|/det|>"
    out = c.clean_content(f"x{tag}y{tag}z")
    assert out == "xyz"


def test_m8_truncated_tag_cleanup_order():
    # trailing incomplete ref (rule 1)
    assert c.clean_content("body<|ref|>tab") == "body"
    # trailing incomplete det (rule 2)
    assert c.clean_content("body<|det|>[[12, 5") == "body"
    # orphan ref not followed by closing (rule 4)
    assert c.clean_content("a<|ref|>b<c") == "ab<c"


def test_m9_latex_substitution():
    assert c.clean_content("a \\coloneqq b \\eqqcolon c") == "a := b =: c"


def test_m10_newline_normalization():
    # \n{4,} -> \n\n\n -> \n\n  (two-step, Lib/postprocessor.py:234-235)
    assert c.clean_content("a\n\n\n\n\n\nb") == "a\n\nb"
    assert c.clean_content("a\n\n\nb") == "a\n\nb"
    assert c.clean_content("a\n\nb") == "a\n\nb"


def test_mojibake_eos_strip():
    assert c.clean_content("a<?end?of?sentence?>b") == "ab"


def test_empty_content_returned_unchanged():
    assert c.clean_content("") == ""


def test_final_strip():
    assert c.clean_content("  x  \n") == "x"


def test_m6_image_link_rewrite_first_valid_box():
    # degenerate box first -> skipped; second box used; modulo page pairing
    tag = "<|ref|>image<|/ref|><|det|>[[9, 9, 1, 1], [100, 100, 400, 300]]<|/det|>"
    out = c.clean_content(
        f"pre{tag}post",
        extract_images=True,
        page_dims=[(999, 999)],
        link_name_fn=lambda i: f"img{i}.jpg",
    )
    assert "![Extracted Image](images/img0.jpg)" in out
    assert "<|ref|>" not in out


def test_m6_no_pages_placeholder():
    tag = "<|ref|>image<|/ref|><|det|>[[1, 1, 9, 9]]<|/det|>"
    out = c.clean_content(f"a{tag}b", extract_images=True, page_dims=[])
    assert out == "a[Image]b"


def test_m6_parse_failure_placeholder():
    tag = "<|ref|>image<|/ref|><|det|>[[oops]]<|/det|>"
    out = c.clean_content(f"a{tag}b", extract_images=True, page_dims=[(100, 100)])
    assert out == "a[Image - extraction failed]b"


def test_m11_clean_formula():
    assert c.clean_formula("\\[ E = mc^2 \\quad (1.2) \\]") == "\\[E = mc^2\\]"
    assert c.clean_formula("no formula") == "no formula"


def test_m12_center_strip():
    assert c.strip_center_tags("<center>x</center>") == "x"


def test_m13_batch_script_image_links():
    tag = "<|ref|>image<|/ref|><|det|>[[1, 1, 9, 9]]<|/det|>"
    out = c.clean_content_batch_script(f"a{tag}b", page_idx=3)
    assert out == "a![](images/3_0.jpg)\nb"


def test_m14_coordinate_parse():
    assert parse_det_coords("[[1, 2, 3, 4]]") == [[1.0, 2.0, 3.0, 4.0]]
    assert parse_det_coords("[[1, 2, 3, 4], [5, 6, 7, 8]]")[1] == [5.0, 6.0, 7.0, 8.0]
    label_coords = extract_coordinates_and_label(("full", "title", "[[1, 2, 3, 4]]"))
    assert label_coords == ("title", [[1.0, 2.0, 3.0, 4.0]])
    assert extract_coordinates_and_label(("full", "t", "[[bad]]")) is None
    # never eval: expressions must fail, not execute
    assert extract_coordinates_and_label(("f", "t", "__import__('os')")) is None


def test_scale_box_semantics():
    # int(c/999*dim) + degenerate skip (Lib/postprocessor.py:111-117)
    assert scale_box([0, 0, 999, 999], 640, 480) == (0, 0, 640, 480)
    assert scale_box([500, 500, 100, 600], 640, 480) is None
    assert scale_box([100, 100, 400, 300], 999, 999) == (100, 100, 400, 300)


def test_m15_page_error_text():
    assert c.page_error_text(3, "boom") == "[Error processing page 3: boom]"


def test_clean_order_other_tags_rematched_after_image_removal():
    # an "other" tag fully inside content only matchable after image removal
    # would differ if match order were wrong; build a case where the image
    # tag sits between the halves of nothing -- simpler: verify both removed
    img = "<|ref|>image<|/ref|><|det|>[[1, 1, 5, 5]]<|/det|>"
    other = "<|ref|>header<|/ref|><|det|>[[2, 2, 6, 6]]<|/det|>"
    assert c.clean_content(f"{img}{other}mid{other}") == "mid"
