"""Per-partition checkpointing, lineage and resume.

The reference has NO resume story: stale job dirs are deleted on startup
and only the last result is retained (docker/start_server.py:89-97,
152-155). At 10^12-document scale a job WILL be interrupted, so the
engine's unit of recovery is a partition of input files:

  out_dir/
    part=0000/ ... parquet ...       (renamed into place atomically)
    _manifest/0000.json              (written only after the rename)
    _lineage/0000.parquet            (doc/span/error counts + wall_ms)

A partition is "done" iff its manifest record exists; manifest records
are written tmp -> fsync -> rename, AFTER the output directory rename,
so a killed run never records a half-written partition. On resume,
completed partitions are skipped before any Dataset is built -- the
filter happens on the partition list, not the data.
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict, List, Optional, Sequence, Set

import pyarrow as pa
import pyarrow.parquet as pq

from ..schema import LINEAGE_SCHEMA


class CheckpointManifest:
    def __init__(self, out_dir: str):
        self.out_dir = out_dir
        self.manifest_dir = os.path.join(out_dir, "_manifest")
        self.lineage_dir = os.path.join(out_dir, "_lineage")
        os.makedirs(self.manifest_dir, exist_ok=True)
        os.makedirs(self.lineage_dir, exist_ok=True)

    def completed(self) -> Set[int]:
        done = set()
        for name in os.listdir(self.manifest_dir):
            if name.endswith(".json"):
                done.add(int(name[:-5]))
        return done

    def partition_out(self, pid: int) -> str:
        return os.path.join(self.out_dir, f"part={pid:04d}")

    def mark_done(self, pid: int, lineage: Dict) -> None:
        """Atomic write-then-rename of lineage + manifest record."""
        lin_tmp = os.path.join(self.lineage_dir, f".{pid:04d}.tmp")
        lin_path = os.path.join(self.lineage_dir, f"{pid:04d}.parquet")
        pq.write_table(pa.Table.from_pylist([lineage], schema=LINEAGE_SCHEMA), lin_tmp)
        os.replace(lin_tmp, lin_path)

        man_tmp = os.path.join(self.manifest_dir, f".{pid:04d}.tmp")
        man_path = os.path.join(self.manifest_dir, f"{pid:04d}.json")
        with open(man_tmp, "w") as f:
            json.dump(lineage, f)
            f.flush()
            os.fsync(f.fileno())
        os.replace(man_tmp, man_path)

    def lineage_table(self) -> pa.Table:
        files = [
            os.path.join(self.lineage_dir, n)
            for n in sorted(os.listdir(self.lineage_dir))
            if n.endswith(".parquet")
        ]
        if not files:
            return LINEAGE_SCHEMA.empty_table()
        return pa.concat_tables([pq.read_table(f) for f in files])


def plan_partitions(input_dir: str, n_partitions: int) -> List[List[str]]:
    """Round-robin the input parquet files into n partitions (sorted, so
    the plan is stable across runs -- required for resume correctness)."""
    files = sorted(
        os.path.join(input_dir, n)
        for n in os.listdir(input_dir)
        if n.endswith(".parquet")
    )
    if not files:
        raise ValueError(f"no parquet files in {input_dir}")
    n_partitions = min(n_partitions, len(files))
    parts: List[List[str]] = [[] for _ in range(n_partitions)]
    for i, f in enumerate(files):
        parts[i % n_partitions].append(f)
    return parts


def run_extract_checkpointed(
    input_dir: str,
    out_dir: str,
    n_partitions: int = 8,
    *,
    mode: str = "markdown",
    backend: str = "mock",
    stop_after: Optional[int] = None,
    **extract_kwargs,
) -> Dict:
    """Checkpointed flagship run: per-partition pipeline + manifest.

    ``stop_after`` processes at most that many *incomplete* partitions
    then returns (the kill/resume test's crash injection point).
    Returns {"completed": [...], "skipped": [...], "lineage": Table}.
    """
    import ray.data as rd

    from ..pipelines.extract import run_extract

    manifest = CheckpointManifest(out_dir)
    parts = plan_partitions(input_dir, n_partitions)
    done = manifest.completed()
    completed, skipped = [], []
    processed = 0
    for pid, files in enumerate(parts):
        if pid in done:
            skipped.append(pid)
            continue
        if stop_after is not None and processed >= stop_after:
            break
        t0 = time.perf_counter()
        ds = run_extract(rd.read_parquet(files), mode=mode, backend=backend, **extract_kwargs)
        final_out = manifest.partition_out(pid)
        tmp_out = final_out + ".tmp"
        if os.path.exists(tmp_out):  # stale from a killed run
            import shutil

            shutil.rmtree(tmp_out)
        if os.path.exists(final_out):
            # Crash window: the previous run died after os.replace(tmp, final)
            # but before mark_done -- the partition dir exists without a
            # manifest entry. We only reach here when pid is NOT completed,
            # so the dir is an orphan; remove it or os.replace below raises
            # ENOTEMPTY and the job can never resume.
            import shutil

            shutil.rmtree(final_out)
        ds = ds.materialize()
        doc_count = ds.count()
        agg = ds.sum(["n_spans", "n_errors"])
        ds.write_parquet(tmp_out)
        os.replace(tmp_out, final_out)
        manifest.mark_done(
            pid,
            {
                "partition_id": pid,
                "doc_count": int(doc_count),
                "span_count": int(agg["sum(n_spans)"]),
                "error_count": int(agg["sum(n_errors)"]),
                "wall_ms": (time.perf_counter() - t0) * 1000.0,
                "status": "completed",
            },
        )
        completed.append(pid)
        processed += 1
    return {
        "completed": completed,
        "skipped": skipped,
        "lineage": manifest.lineage_table(),
    }
