"""Kill/resume: per-partition checkpointing and lineage (SURVEY.md section 4)."""

import os

import pyarrow.parquet as pq
import pytest

from deekseek_ocr___dockerized_api_ray.pipelines.extract import reference_extract_document
from deekseek_ocr___dockerized_api_ray.sources.corpus import generate_doc, write_corpus
from deekseek_ocr___dockerized_api_ray.state.checkpoint import (
    CheckpointManifest,
    plan_partitions,
    run_extract_checkpointed,
)

N_DOCS = 80
SEED = 42


@pytest.fixture(scope="module")
def corpus_dir(ray_session, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("ckpt_corpus"))
    # write in several files so partitions are non-trivial
    import ray.data as rd

    from deekseek_ocr___dockerized_api_ray.sources.corpus import corpus_dataset

    corpus_dataset(N_DOCS, SEED, parallelism=8).write_parquet(d)
    return d


def test_partition_plan_stable(corpus_dir):
    p1 = plan_partitions(corpus_dir, 4)
    p2 = plan_partitions(corpus_dir, 4)
    assert p1 == p2
    all_files = sorted(f for part in p1 for f in part)
    assert len(all_files) == len(set(all_files))


def test_kill_and_resume(corpus_dir, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("ckpt_out"))

    # first run "crashes" after 2 partitions
    r1 = run_extract_checkpointed(corpus_dir, out, n_partitions=4, stop_after=2)
    assert len(r1["completed"]) == 2 and r1["skipped"] == []
    manifest = CheckpointManifest(out)
    assert manifest.completed() == set(r1["completed"])

    done_parts = [manifest.partition_out(p) for p in r1["completed"]]
    mtimes_before = {
        p: max(os.path.getmtime(os.path.join(p, f)) for f in os.listdir(p))
        for p in done_parts
    }

    # resume: completed partitions are skipped (not recomputed), rest finish
    r2 = run_extract_checkpointed(corpus_dir, out, n_partitions=4)
    assert sorted(r2["skipped"]) == sorted(r1["completed"])
    assert sorted(r1["completed"] + r2["completed"]) == [0, 1, 2, 3]
    for p, m in mtimes_before.items():
        now = max(os.path.getmtime(os.path.join(p, f)) for f in os.listdir(p))
        assert now == m, f"partition {p} was rewritten on resume"

    # lineage complete and consistent
    lin = manifest.lineage_table()
    assert lin.num_rows == 4
    assert sum(lin.column("doc_count").to_pylist()) == N_DOCS
    assert all(s == "completed" for s in lin.column("status").to_pylist())

    # output spans match the oracle for every doc across all partitions
    tables = []
    for pid in range(4):
        pdir = manifest.partition_out(pid)
        for f in os.listdir(pdir):
            if f.endswith(".parquet"):
                tables.append(pq.read_table(os.path.join(pdir, f)))
    import pyarrow as pa

    got = pa.concat_tables(tables)
    assert got.num_rows == N_DOCS
    by_id = {
        d: (s, m)
        for d, s, m in zip(
            got.column("doc_id").to_pylist(),
            got.column("spans").to_pylist(),
            got.column("markdown").to_pylist(),
        )
    }
    for i in range(N_DOCS):
        doc = generate_doc(i, SEED)
        exp = reference_extract_document(doc, "markdown")
        spans, md = by_id[doc["doc_id"]]
        assert md == exp["markdown"]
        key = lambda s: s["offset"]
        assert [
            (s["kind"], s["text"], s["media_ref"], s["offset"]) for s in sorted(spans, key=key)
        ] == [
            (s["kind"], s["text"], s["media_ref"], s["offset"])
            for s in sorted(exp["spans"], key=key)
        ]


def test_resume_after_crash_between_rename_and_mark(corpus_dir, tmp_path_factory):
    """Crash window: output dir renamed into place but mark_done never ran.
    Resume must re-run that partition (replacing the orphan dir), not die
    on ENOTEMPTY."""
    out = str(tmp_path_factory.mktemp("ckpt_orphan"))
    r1 = run_extract_checkpointed(corpus_dir, out, n_partitions=4, stop_after=2)
    manifest = CheckpointManifest(out)

    # simulate the crash: partition 1's output exists, manifest record gone
    victim = r1["completed"][1]
    os.remove(os.path.join(out, "_manifest", f"{victim:04d}.json"))
    orphan = manifest.partition_out(victim)
    assert os.path.isdir(orphan) and os.listdir(orphan)

    r2 = run_extract_checkpointed(corpus_dir, out, n_partitions=4)
    assert victim in r2["completed"]
    assert manifest.completed() == {0, 1, 2, 3}
    # re-run output is complete parquet
    assert pq.read_table(orphan).num_rows > 0


def test_overlapped_equals_sequential(corpus_dir, tmp_path_factory):
    """overlap=3 must produce the same per-partition outputs as overlap=1."""
    out_a = str(tmp_path_factory.mktemp("ckpt_seq"))
    out_b = str(tmp_path_factory.mktemp("ckpt_par"))
    run_extract_checkpointed(corpus_dir, out_a, n_partitions=4, overlap=1)
    run_extract_checkpointed(corpus_dir, out_b, n_partitions=4, overlap=3)
    for pid in range(4):
        a = pq.read_table(os.path.join(out_a, f"part={pid:04d}")).sort_by("doc_id")
        b = pq.read_table(os.path.join(out_b, f"part={pid:04d}")).sort_by("doc_id")
        assert a.equals(b)
