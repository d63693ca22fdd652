"""Incremental dedup index: two-step ingestion must equal one-shot
exact dedup, the index must accumulate, and re-ingesting the same data
must yield zero survivors."""

import os
import sys

import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = "/root/testdata/sf0.001"
needs_data = pytest.mark.skipif(not os.path.isdir(SF), reason="driver testdata absent")


@needs_data
def test_two_step_ingest_equals_one_shot(ray_session, tmp_path):
    import ray.data as rd

    from deekseek_ocr___dockerized_api_ray.stages.incremental import ingest_dedup

    docs = pd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    a = docs[docs["doc_id"] % 2 == 0]
    b = docs[docs["doc_id"] % 2 == 1]
    idx_dir = str(tmp_path / "index")

    surv_a = ingest_dedup(rd.from_pandas(a), idx_dir).to_pandas()
    surv_b = ingest_dedup(rd.from_pandas(b), idx_dir).to_pandas()

    # survivors of A: distinct texts within A
    assert set(surv_a["text"]) == set(a["text"])
    # survivors of B: texts of B never seen in A
    assert set(surv_b["text"]) == set(b["text"]) - set(a["text"])
    # union covers every distinct text exactly once
    both = pd.concat([surv_a, surv_b])
    assert sorted(both["text"]) == sorted(set(docs["text"]))
    # first-ingestion-wins + min-id-within-ingest
    for _, row in surv_a.iterrows():
        dups = a[a["text"] == row["text"]]
        assert row["doc_id"] == dups["doc_id"].min()

    # index accumulated one file set per ingest
    files = [f for f in os.listdir(idx_dir) if f.endswith(".parquet")]
    assert len(files) >= 2

    # re-ingesting everything yields zero survivors
    surv_again = ingest_dedup(rd.from_pandas(docs), idx_dir).to_pandas()
    assert len(surv_again) == 0


@needs_data
def test_ingest_matches_exact_dedup_operator(ray_session, tmp_path):
    import ray.data as rd

    from deekseek_ocr___dockerized_api_ray.stages.dedup import exact_dedup
    from deekseek_ocr___dockerized_api_ray.stages.incremental import ingest_dedup

    docs = rd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    one_shot = exact_dedup(docs).to_pandas()
    inc = ingest_dedup(docs, str(tmp_path / "idx")).to_pandas()
    # single ingest == one-shot exact dedup (same min-id-per-text rule)
    assert (sorted(inc["doc_id"].tolist())
            == sorted(one_shot["doc_id"].tolist()))


@needs_data
def test_stale_tmp_dir_does_not_poison_index(ray_session, tmp_path):
    """A killed ingest leaves a tmp_* subdir inside the index dir; the
    index reader must ignore it (only top-level *.parquet files count)
    and the next ingest must still be correct."""
    import ray.data as rd

    from deekseek_ocr___dockerized_api_ray.stages.incremental import ingest_dedup

    docs = pd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    idx_dir = tmp_path / "index"
    idx_dir.mkdir()
    # simulate a crash: a stale tmp dir containing a parquet of digests
    # that were NEVER committed to the index
    stale = idx_dir / "tmp_deadbeef"
    stale.mkdir()
    pd.DataFrame({"digest": [b"\x00" * 20], "dig64": [0]}).to_parquet(
        stale / "orphan.parquet")

    surv = ingest_dedup(rd.from_pandas(docs), str(idx_dir)).to_pandas()
    assert set(surv["text"]) == set(docs["text"])  # stale tmp ignored
    # the committed index now dedups a re-ingest to zero
    again = ingest_dedup(rd.from_pandas(docs), str(idx_dir)).to_pandas()
    assert len(again) == 0


@needs_data
def test_anti_join_paths_agree(ray_session, tmp_path):
    """broadcast_digests=0 forces the distributed hash anti-join; it
    must produce exactly the broadcast-set path's survivors."""
    import ray.data as rd

    from deekseek_ocr___dockerized_api_ray.stages.incremental import ingest_dedup

    docs = pd.read_parquet(f"{SF}/documents.parquet",
                           columns=["doc_id", "text"])
    a = docs[docs["doc_id"] % 2 == 0]
    b = docs[docs["doc_id"] % 2 == 1]

    idx1, idx2 = str(tmp_path / "i1"), str(tmp_path / "i2")
    ingest_dedup(rd.from_pandas(a), idx1).to_pandas()
    ingest_dedup(rd.from_pandas(a), idx2).to_pandas()

    surv_bcast = ingest_dedup(rd.from_pandas(b), idx1).to_pandas()
    surv_join = ingest_dedup(rd.from_pandas(b), idx2,
                             broadcast_digests=0).to_pandas()
    cols = ["doc_id", "text"]
    lhs = surv_bcast[cols].sort_values("doc_id").reset_index(drop=True)
    rhs = surv_join[cols].sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(lhs, rhs)
    assert len(lhs) > 0
