"""Compaction: row preservation, file-count reduction, no-op guard."""

import os
import sys

import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture()
def small_files_dir(tmp_path):
    d = tmp_path / "out"
    d.mkdir()
    for i in range(8):
        pd.DataFrame({"k": range(i * 100, (i + 1) * 100),
                      "v": [f"row{j}" for j in range(100)]}
                     ).to_parquet(d / f"part_{i:03d}.parquet")
    return str(d)


def test_compact_preserves_rows_and_reduces_files(ray_session, small_files_dir):
    from deekseek_ocr___dockerized_api_ray.state.compact import compact_parquet

    before = pd.concat(
        [pd.read_parquet(os.path.join(small_files_dir, f))
         for f in os.listdir(small_files_dir)]
    ).sort_values("k").reset_index(drop=True)

    stats = compact_parquet(small_files_dir, target_rows=400)
    assert stats["files_before"] == 8
    assert stats["files_after"] <= 2
    assert stats["rows"] == 800

    after = pd.concat(
        [pd.read_parquet(os.path.join(small_files_dir, f))
         for f in os.listdir(small_files_dir) if f.endswith(".parquet")]
    ).sort_values("k").reset_index(drop=True)
    assert after.equals(before)


def test_compact_noop_on_single_file(ray_session, tmp_path):
    from deekseek_ocr___dockerized_api_ray.state.compact import compact_parquet

    d = tmp_path / "one"
    d.mkdir()
    pd.DataFrame({"k": [1, 2, 3]}).to_parquet(d / "only.parquet")
    stats = compact_parquet(str(d), target_rows=100)
    assert stats["files_after"] == stats["files_before"] == 1
