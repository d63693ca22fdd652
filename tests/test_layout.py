"""XY-cut reading-order tests: canonical Manhattan layouts, tie-break
determinism, degenerate-box handling, and the Ray pipeline surface."""

import os
import sys

import numpy as np
import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from deekseek_ocr___dockerized_api_ray.stages.layout import (  # noqa: E402
    xy_cut_order,
)

SF = "/root/testdata/sf0.001"
needs_data = pytest.mark.skipif(not os.path.isdir(SF), reason="driver testdata absent")


def test_two_column_page_reads_header_col1_col2_footer():
    # header (full width), two columns of two boxes each, footer
    #   0: header, 1/2: left col, 3/4: right col, 5: footer
    x1 = [0, 0, 0, 550, 550, 0]
    x2 = [999, 450, 450, 999, 999, 999]
    y1 = [0, 120, 400, 120, 400, 900]
    y2 = [100, 380, 850, 380, 850, 999]
    ranks = xy_cut_order(x1, y1, x2, y2)
    assert list(ranks) == [0, 1, 2, 3, 4, 5]


def test_row_major_when_rows_separate_cleanly():
    # 2x2 grid with clean horizontal gaps -> row-major order
    x1 = [0, 500, 0, 500]
    x2 = [450, 999, 450, 999]
    y1 = [0, 0, 500, 500]
    y2 = [450, 450, 999, 999]
    ranks = xy_cut_order(x1, y1, x2, y2)
    assert list(ranks) == [0, 1, 2, 3]


def test_overlapping_boxes_fall_back_to_y_x_tiebreak():
    # identical geometry -> tie broken by (tie1, tie2)
    x1 = [0, 0, 0]
    x2 = [999, 999, 999]
    y1 = [0, 0, 0]
    y2 = [999, 999, 999]
    ranks = xy_cut_order(x1, y1, x2, y2, tie1=[2, 0, 1], tie2=[0, 0, 0])
    assert list(ranks) == [2, 0, 1]


def test_ranks_are_a_permutation():
    rng = np.random.default_rng(7)
    for _ in range(20):
        n = int(rng.integers(1, 30))
        x1 = rng.uniform(0, 900, n)
        y1 = rng.uniform(0, 900, n)
        x2 = x1 + rng.uniform(1, 99, n)
        y2 = y1 + rng.uniform(1, 99, n)
        ranks = xy_cut_order(x1, y1, x2, y2,
                             tie1=np.arange(n), tie2=np.zeros(n))
        assert sorted(ranks) == list(range(n))


def test_nested_cut_left_column_splits_further():
    # left column itself has two stacked sub-blocks plus a wide box
    # spanning only the right side -> left sub-blocks stay adjacent
    x1 = [0, 0, 500]
    x2 = [450, 450, 999]
    y1 = [0, 600, 0]
    y2 = [500, 999, 999]
    ranks = xy_cut_order(x1, y1, x2, y2)
    assert list(ranks) == [0, 1, 2]


@needs_data
def test_pipeline_reading_order_surface(ray_session):
    import ray.data as rd

    from deekseek_ocr___dockerized_api_ray.stages.layout import (
        add_reading_order,
    )

    boxes = pd.DataFrame({
        "doc_id": ["d1"] * 4 + ["d2"] * 2,
        "offset": [0, 0, 1, 1, 0, 0],
        "tag_index": [0, 1, 0, 1, 0, 1],
        "box_index": [0, 0, 0, 0, 0, 0],
        "degenerate": [False, False, False, True, False, False],
        "vx1": [0.0, 0.0, 0.0, 50.0, 0.0, 0.0],
        "vy1": [500.0, 0.0, 0.0, 50.0, 600.0, 0.0],
        "vx2": [999.0, 999.0, 999.0, 40.0, 999.0, 999.0],
        "vy2": [999.0, 450.0, 999.0, 60.0, 999.0, 500.0],
    })
    out = add_reading_order(rd.from_pandas(boxes), n_buckets=2).to_pandas()
    out = out.sort_values(["doc_id", "offset", "tag_index"]).reset_index(drop=True)
    # d1 page 0: box at y=0 reads before y=500
    assert out.loc[0, "reading_rank"] == 1 and out.loc[1, "reading_rank"] == 0
    # d1 page 1: degenerate box ranked last
    assert out.loc[2, "reading_rank"] == 0 and out.loc[3, "reading_rank"] == 1
    # d2: its own page ordering
    assert out.loc[4, "reading_rank"] == 1 and out.loc[5, "reading_rank"] == 0
