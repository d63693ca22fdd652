"""A4 preprocessing pure math: pad geometry, normalize, token layout."""

import math

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from deekseek_ocr___dockerized_api_ray.functions.preprocess import (
    PAD_FILL,
    build_token_layout,
    contain_size,
    image_token_run,
    normalize_chw,
    pad_geometry,
    pad_global_view,
)
from deekseek_ocr___dockerized_api_ray.functions.tiling import image_token_count


def test_pad_fill_is_mean_gray():
    # tuple(int(x*255) for x in (0.5, 0.5, 0.5)) -- image_process.py:381
    assert PAD_FILL == (127, 127, 127)


@pytest.mark.parametrize(
    "w,h,target,expect",
    [
        (1024, 1024, 1024, (1024, 1024, 0, 0)),   # exact fit, no pad
        (2048, 1024, 1024, (1024, 512, 0, 256)),  # wide -> y-centered
        (1024, 2048, 1024, (512, 1024, 256, 0)),  # tall -> x-centered
        (640, 480, 1024, (1024, 768, 0, 128)),    # upscale allowed (contain)
        (850, 1100, 1024, (791, 1024, 116, 0)),   # US-letter-ish page: round(850/1100*1024)=791, round((1024-791)*0.5)=116 (banker's)
    ],
)
def test_pad_geometry_cases(w, h, target, expect):
    g = pad_geometry(w, h, target)
    assert (g.resized_w, g.resized_h, g.paste_x, g.paste_y) == expect


@settings(max_examples=300, deadline=None)
@given(w=st.integers(1, 5000), h=st.integers(1, 5000))
def test_pad_geometry_invariants(w, h):
    from hypothesis import assume

    # aspect ratios beyond ~1000:1 contain-round to a 0-sized dimension,
    # where PIL itself errors -- out of the function's domain
    assume(max(w, h) / min(w, h) <= 500)
    g = pad_geometry(w, h, 1024)
    # fits the canvas, one dimension pinned, centered within 1px rounding
    assert 0 < g.resized_w <= 1024 and 0 < g.resized_h <= 1024
    assert g.resized_w == 1024 or g.resized_h == 1024
    assert 0 <= g.paste_x <= 1024 - g.resized_w
    assert 0 <= g.paste_y <= 1024 - g.resized_h
    assert abs(g.paste_x - (1024 - g.resized_w) / 2) <= 0.5
    assert abs(g.paste_y - (1024 - g.resized_h) / 2) <= 0.5
    # aspect preserved within the +-0.5px rounding PIL itself applies to
    # the non-pinned dimension
    if g.resized_w == 1024:
        assert abs(g.resized_h - h / w * 1024) <= 0.5 + 1e-9
    else:
        assert abs(g.resized_w - w / h * 1024) <= 0.5 + 1e-9


def test_contain_equal_ratio_shortcut():
    # equal ratios return the target untouched (PIL's early path)
    assert contain_size(100, 100, 1024, 1024) == (1024, 1024)


def test_normalize_chw_values():
    arr = np.zeros((2, 3, 3), dtype=np.uint8)
    arr[0, 0] = (0, 127, 255)
    out = normalize_chw(arr)
    assert out.shape == (3, 2, 3)
    assert out.dtype == np.float32
    assert out[0, 0, 0] == pytest.approx(-1.0)
    assert out[1, 0, 0] == pytest.approx((127 / 255 - 0.5) / 0.5)
    assert out[2, 0, 0] == pytest.approx(1.0)


def test_pad_global_view_paste():
    g = pad_geometry(2048, 1024, 1024)  # -> 1024x512 content
    content = np.full((g.resized_h, g.resized_w, 3), 9, dtype=np.uint8)
    canvas = pad_global_view(content, 1024)
    assert canvas.shape == (1024, 1024, 3)
    assert (canvas[g.paste_y : g.paste_y + 512] == 9).all()
    assert (canvas[: g.paste_y] == 127).all() and (canvas[g.paste_y + 512 :] == 127).all()
    with pytest.raises(ValueError):
        pad_global_view(np.zeros((10, 10, 3), dtype=np.uint8), 1024)


@settings(max_examples=300, deadline=None)
@given(w=st.integers(1, 6000), h=st.integers(1, 6000))
def test_token_run_matches_token_count(w, h):
    # the sequence-construction length must equal the closed-form count
    # (deepseek_ocr.py:81-126 vs image_process.py:426-431)
    assert image_token_run(w, h) == image_token_count(w, h)


def test_build_token_layout_structure():
    # prompt "<image>\n..." => text segments [0, n_text]; one 850x1100 page
    lay = build_token_layout([0, 7], [(850, 1100)])
    nit = image_token_run(850, 1100)
    # BOS + image run + 7 text tokens (EOS stripped by inference_mode)
    assert lay.total_len == 1 + nit + 7
    assert lay.num_image_tokens == [nit]
    assert lay.seq_mask[0] is False                 # BOS
    assert all(lay.seq_mask[1 : 1 + nit])           # image run
    assert not any(lay.seq_mask[1 + nit :])         # trailing text
    # without inference-mode strip the EOS slot survives
    full = build_token_layout([0, 7], [(850, 1100)], inference_mode=False)
    assert full.total_len == lay.total_len + 1
    # multi-image interleave keeps one run per image
    two = build_token_layout([2, 3, 4], [(640, 640), (2000, 1000)])
    assert two.num_image_tokens == [image_token_run(640, 640), image_token_run(2000, 1000)]
    assert sum(two.seq_mask) == sum(two.num_image_tokens)
    with pytest.raises(ValueError):
        build_token_layout([1], [(10, 10)])
    with pytest.raises(ValueError):
        build_token_layout([0, 0], [(10, 10)], eos=False, inference_mode=True)


def test_preprocess_plan_stage(ray_session):
    import ray.data as rd

    from deekseek_ocr___dockerized_api_ray.stages.multimodal import preprocess_plan

    media = rd.from_items(
        [{"media_ref": f"m{i}", "width": w, "height": h}
         for i, (w, h) in enumerate([(640, 640), (850, 1100), (4000, 200)])]
    )
    out = preprocess_plan(media).to_pandas().sort_values("media_ref")
    assert list(out.n_seq_tokens) == [
        image_token_run(640, 640), image_token_run(850, 1100), image_token_run(4000, 200),
    ]
    g = pad_geometry(850, 1100)
    row = out[out.media_ref == "m1"].iloc[0]
    assert (row.pad_resized_w, row.pad_resized_h, row.pad_x, row.pad_y) == (
        g.resized_w, g.resized_h, g.paste_x, g.paste_y,
    )
