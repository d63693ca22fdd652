"""Tiling math pinned against the reference formulas (A5, image_process.py)."""

import pytest

from deekseek_ocr___dockerized_api_ray.functions import tiling as t


def test_candidate_grids_gundam():
    grids = t.candidate_grids(2, 6)
    assert all(2 <= a * b <= 6 for a, b in grids)
    assert grids == sorted(grids, key=lambda x: x[0] * x[1])
    assert (1, 2) in grids and (6, 1) in grids and (2, 3) in grids
    assert (1, 1) not in grids and (3, 3) not in grids


# Expected values computed by hand-executing image_process.py:11-42
# (the FIXTURES.md section 2 dimension cases).
@pytest.mark.parametrize(
    "w,h,expected",
    [
        (1280, 720, (2, 1)),     # aspect 1.78 -> closest grid 2x1
        (720, 1280, (1, 2)),
        (2480, 3508, (2, 3)),    # A4 portrait, aspect 0.707
        (512, 512, (2, 2)),      # count_tiles itself has no 640 shortcut
        (10000, 100, (6, 1)),    # pathological wide
        (1024, 1024, (2, 2)),    # square: (2,2) aspect diff 0
        (641, 640, (2, 2)),
        (4961, 3508, (3, 2)),    # extreme landscape A4@600
        (1920, 1080, (2, 1)),
    ],
)
def test_count_tiles_cases(w, h, expected):
    assert t.count_tiles(w, h) == expected


def test_tile_grid_shortcut():
    # tokenizer path: both dims <=640 -> no tiling (image_process.py:355-366)
    assert t.tile_grid(640, 640) == (1, 1)
    assert t.tile_grid(512, 512) == (1, 1)
    assert t.tile_grid(641, 640) != (1, 1)
    assert t.tile_grid(2480, 3508) == (2, 3)
    # crop_mode off -> never tiles
    assert t.tile_grid(4000, 4000, crop_mode=False) == (1, 1)


def test_tile_boxes_row_major():
    (tw, th), boxes = t.tile_boxes(1280, 720)
    assert (tw, th) == (1280, 640)
    assert boxes == [(0, 0, 640, 640), (640, 0, 1280, 640)]
    (tw, th), boxes = t.tile_boxes(2480, 3508)
    assert (tw, th) == (1280, 1920)
    assert len(boxes) == 6
    assert boxes[0] == (0, 0, 640, 640)
    assert boxes[1] == (640, 0, 1280, 640)
    assert boxes[2] == (0, 640, 640, 1280)


def test_image_token_count_formula():
    # deepseek_ocr.py:81-126: base 1024 -> h=w=16, global=16*17=272, +1 sep
    assert t.image_token_count(640, 640) == 272 + 0 + 1
    assert t.image_token_count(512, 512) == 273
    # 1280x720 -> tiles (2,1), image 640 -> h2=w2=10: local=(1*10)*(2*10+1)=210
    assert t.image_token_count(1280, 720) == 272 + 210 + 1
    # 2480x3508 -> (2,3): local=(3*10)*(2*10+1)=630
    assert t.image_token_count(2480, 3508) == 272 + 630 + 1
    # crop_mode off -> global only
    assert t.image_token_count(4000, 4000, crop_mode=False) == 273


def test_presets():
    assert t.PRESETS["gundam"].base_size == 1024
    assert t.PRESETS["gundam"].image_size == 640
    assert t.PRESETS["gundam"].crop_mode is True
    assert t.PRESETS["tiny"].crop_mode is False


def test_count_tiles_hypothesis_parity_vs_reference():
    """Property test: our count_tiles equals the reference's own function
    (executed from /root/reference source) across the whole realistic
    dimension range."""
    import os
    import re as _re

    import pytest as _pytest

    ref_path = "/root/reference/docker/overrides/process/image_process.py"
    if not os.path.exists(ref_path):
        _pytest.skip("reference not present")
    src = open(ref_path).read()
    m = _re.search(r"def find_closest_aspect_ratio.*?(?=\ndef dynamic_preprocess)", src, _re.S)
    ns = {"MIN_CROPS": 2, "MAX_CROPS": 6}
    exec("MIN_CROPS=2\nMAX_CROPS=6\n" + m.group(0), ns)  # noqa: S102 -- differential
    ref_count = ns["count_tiles"]

    from hypothesis import given, settings
    from hypothesis import strategies as st_

    @settings(max_examples=400, deadline=None)
    @given(w=st_.integers(min_value=1, max_value=12000),
           h=st_.integers(min_value=1, max_value=12000))
    def check(w, h):
        assert t.count_tiles(w, h) == tuple(ref_count(w, h, image_size=640))

    check()
