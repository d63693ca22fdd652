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


def test_compact_recovers_from_crash_window(ray_session, small_files_dir):
    """A kill between the two renames leaves src_dir missing and the data
    in a .precompact_* sibling; the next compact_parquet call must
    restore it before proceeding (ADVICE r2)."""
    import shutil

    from deekseek_ocr___dockerized_api_ray.state.compact import (
        compact_parquet, recover_compaction)

    before = sorted(os.listdir(small_files_dir))
    # simulate the crash: src renamed away, a stale tmp dir dangling
    backup = small_files_dir + ".precompact_deadbeef"
    os.replace(small_files_dir, backup)
    stale_tmp = small_files_dir + ".compact_cafebabe"
    os.makedirs(stale_tmp)
    assert not os.path.isdir(small_files_dir)

    stats = compact_parquet(small_files_dir, target_rows=400)
    assert stats["rows"] == 800
    assert not os.path.isdir(backup)
    assert not os.path.isdir(stale_tmp)
    # idempotent when nothing is wrong
    assert recover_compaction(small_files_dir) is False
    assert sorted(f for f in os.listdir(small_files_dir)
                  if f.endswith(".parquet"))
    del before


def test_compact_empty_files_noop(ray_session, tmp_path):
    """>=2 files totaling 0 rows must no-op (write_parquet of an empty
    dataset creates no tmp dir -- ADVICE r2), not raise."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from deekseek_ocr___dockerized_api_ray.state.compact import compact_parquet

    d = tmp_path / "empty"
    d.mkdir()
    empty = pa.table({"k": pa.array([], type=pa.int64())})
    pq.write_table(empty, d / "a.parquet")
    pq.write_table(empty, d / "b.parquet")
    stats = compact_parquet(str(d), target_rows=100)
    assert stats["rows"] == 0
    assert stats["files_after"] == stats["files_before"] == 2


def test_compact_merges_many_small_files_below_target(ray_session, small_files_dir):
    """Many small files each below target_rows is the core use case --
    the gate must not skip it (ADVICE r2 precedence bug)."""
    from deekseek_ocr___dockerized_api_ray.state.compact import compact_parquet

    stats = compact_parquet(small_files_dir, target_rows=10_000)
    assert stats["files_before"] == 8
    assert stats["files_after"] == 1
    assert stats["rows"] == 800


def test_recover_sweeps_stale_backup_when_src_present(ray_session,
                                                      small_files_dir):
    """A backup left behind AFTER a completed second rename (crash before
    the cleanup rmtree) is garbage; recover_compaction must sweep it when
    src_dir exists, or a later between-renames crash could restore the
    STALE snapshot over newer data (ADVICE r3)."""
    import shutil

    from deekseek_ocr___dockerized_api_ray.state.compact import (
        recover_compaction)

    # stale backup = an OLD snapshot (fewer files) next to a live src
    stale = small_files_dir + ".precompact_00000000"
    os.makedirs(stale)
    pd.DataFrame({"k": [0]}).to_parquet(os.path.join(stale, "old.parquet"))
    live_files = sorted(os.listdir(small_files_dir))

    assert recover_compaction(small_files_dir) is False
    assert not os.path.isdir(stale)          # swept
    assert sorted(os.listdir(small_files_dir)) == live_files  # untouched

    # the dangerous sequel: crash between renames NOW leaves exactly one
    # backup, so the restore branch can never pick a stale snapshot
    backup = small_files_dir + ".precompact_ffffffff"
    os.replace(small_files_dir, backup)
    assert recover_compaction(small_files_dir) is True
    assert sorted(os.listdir(small_files_dir)) == live_files
    del shutil
