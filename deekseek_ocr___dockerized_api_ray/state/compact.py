"""Small-file compaction for partitioned parquet output.

A long-running checkpointed job (state/checkpoint.py) accumulates many
small files -- one or more per partition attempt -- and small files are
the classic read-amplification killer at 100 TB (footer parse + open
per file; row-group pruning can't help a 2 MB file). Compaction rewrites
a directory to ~``target_rows`` rows per file while PRESERVING rows
exactly, and is itself resumable: output goes to a tmp dir that is
atomically renamed over the source only after the row-count check
passes, so a killed compaction leaves the source untouched.

Streaming shape: read_parquet (pruned nothing -- compaction is by
definition a full copy) -> repartition to ceil(total/target) blocks ->
write_parquet. No driver materialization at any size.
"""

from __future__ import annotations

import os
import shutil
import uuid


def recover_compaction(src_dir: str) -> bool:
    """Crash recovery: a kill between the two renames in
    ``compact_parquet`` can leave ``src_dir`` missing with the data
    sitting in a ``.precompact_*`` sibling. Restore it (and sweep any
    dangling ``.compact_*`` tmp dirs). Returns True if a restore
    happened. Called automatically at the top of ``compact_parquet``."""
    parent = os.path.dirname(src_dir.rstrip("/")) or "."
    base = os.path.basename(src_dir.rstrip("/"))
    restored = False
    if not os.path.isdir(parent):
        return False
    siblings = sorted(os.listdir(parent))
    backups = [d for d in siblings if d.startswith(base + ".precompact_")]
    if not os.path.isdir(src_dir):
        if backups:
            # at most one can exist here: the stale-backup sweep below
            # (run whenever src_dir IS present) removes any backup left
            # behind by a crash after the second rename, so a missing
            # src_dir can only co-exist with the single backup made by
            # the run that just crashed between its two renames.
            os.replace(os.path.join(parent, backups[0]), src_dir)
            restored = True
    else:
        # src_dir present => every .precompact_* is garbage by
        # construction (its run completed the second rename); sweep
        # them so a later crash can never pick a stale snapshot.
        for d in backups:
            shutil.rmtree(os.path.join(parent, d), ignore_errors=True)
    for d in siblings:
        if d.startswith(base + ".compact_"):
            shutil.rmtree(os.path.join(parent, d), ignore_errors=True)
    return restored


def compact_parquet(src_dir: str, target_rows: int = 1_000_000,
                    min_files: int = 2) -> dict:
    """Compact ``src_dir`` in place. Returns a stats dict
    (files_before, files_after, rows). No-op (files_after ==
    files_before) when the directory has fewer than ``min_files``
    files, or is empty (0 rows) -- many small files BELOW target_rows
    is exactly the case compaction exists for, so a low row count does
    NOT gate it. Resumable: recovers a crashed prior compaction first,
    writes to a tmp dir, verifies row counts, then swaps."""
    import pyarrow.parquet as pq
    import ray.data as rd

    recover_compaction(src_dir)
    files = sorted(
        os.path.join(src_dir, f) for f in os.listdir(src_dir)
        if f.endswith(".parquet")
    )
    rows = sum(pq.ParquetFile(f).metadata.num_rows for f in files)
    stats = {"files_before": len(files), "files_after": len(files), "rows": rows}
    # rows == 0 early-return also dodges the Ray gotcha that
    # write_parquet of an empty dataset creates no output directory.
    if len(files) < min_files or rows == 0:
        return stats

    n_out = max(1, (rows + target_rows - 1) // target_rows)
    tmp = f"{src_dir.rstrip('/')}.compact_{uuid.uuid4().hex}"
    ds = rd.read_parquet(files)
    ds.repartition(n_out).write_parquet(tmp)

    out_files = [f for f in os.listdir(tmp) if f.endswith(".parquet")]
    out_rows = sum(pq.ParquetFile(os.path.join(tmp, f)).metadata.num_rows
                   for f in out_files)
    if out_rows != rows:  # refuse to replace on any row-count drift
        shutil.rmtree(tmp, ignore_errors=True)
        raise RuntimeError(
            f"compaction row mismatch: {out_rows} != {rows}; source untouched")

    backup = f"{src_dir.rstrip('/')}.precompact_{uuid.uuid4().hex}"
    os.replace(src_dir, backup)
    # crash window between the two renames: src_dir is momentarily
    # missing, but the data lives in `backup` and recover_compaction()
    # restores it on the next call -- the resumability contract.
    os.replace(tmp, src_dir)
    shutil.rmtree(backup, ignore_errors=True)
    stats["files_after"] = len(out_files)
    return stats
