"""Disk-based key-partitioned exchange (external shuffle).

Ray Data's groupby shuffle is a global SORT -- correct, but for a
bucketed key it pays an all-to-all sort of every row. This exchange is
the classic map-side-partition / reduce-side-merge alternative:

  map side:    every upstream task splits its batch by ``bucket`` and
               appends one parquet file per touched bucket under
               ``spill_dir/bucket=%05d/`` (unique filenames; no
               coordination, no ordering)
  barrier:     the writer Dataset is consumed (a shuffle IS a barrier)
  reduce side: one task per bucket reads its directory and applies the
               caller's reduce function to the whole bucket

On one node the spill dir is local disk; on a cluster it is the shared
filesystem / object store -- the same layout production engines use for
external shuffle. Memory per reduce task = one bucket, so ``n_buckets``
is chosen so corpus_size / n_buckets fits a worker's heap.
"""

from __future__ import annotations

import os
import uuid
from typing import Callable, Optional

import pyarrow as pa
import pyarrow.compute as pc

#: Spill-stage re-batch size. The map side writes one file per TOUCHED
#: bucket per batch, so file count ~ (rows / batch_size) * n_buckets --
#: at the default 1024-row batches a 10M-span job with 64 buckets would
#: spray ~600k 16-row files. 64k-row batches put ~1k rows in each file.
SPILL_BATCH_ROWS = 65536

_SPILL_EXT = ".arrow"
_IPC_OPTS = pa.ipc.IpcWriteOptions(compression="lz4")


def _write_spill_file(table: pa.Table, path: str) -> None:
    with pa.OSFile(path, "wb") as sink:
        with pa.ipc.new_file(sink, table.schema, options=_IPC_OPTS) as w:
            w.write_table(table)


def _read_spill_file(path: str) -> pa.Table:
    with pa.memory_map(path, "r") as src:
        return pa.ipc.open_file(src).read_all()


def spill_write(ds, bucket_col: str, n_buckets: int, spill_dir: str) -> int:
    """Map side: partition every batch by bucket into per-bucket Arrow-IPC
    appends (lz4 frames -- ~3x cheaper to encode/decode than parquet for
    a spill file that lives minutes). Returns total rows written
    (consumes the Dataset).

    Refuses a dirty spill_dir: stale files from a previous map phase
    would be read by the reduce side and silently inflate results.
    """
    for b in range(n_buckets):
        bdir = os.path.join(spill_dir, f"bucket={b:05d}")
        os.makedirs(bdir, exist_ok=True)
        stale = [f for f in os.listdir(bdir) if f.endswith(_SPILL_EXT)]
        if stale:
            raise ValueError(
                f"spill dir {bdir} already contains {len(stale)} spill file(s); "
                "pass a fresh directory or let partitioned_exchange(fresh=True) clean it"
            )

    def _write(batch: pa.Table) -> pa.Table:
        if batch.num_rows:
            # ONE sort by bucket, then contiguous zero-copy slices per
            # touched bucket (a filter per touched bucket would rescan
            # the whole batch n_touched times)
            order = pc.sort_indices(batch.column(bucket_col))
            sorted_batch = batch.take(order)
            bvals = sorted_batch.column(bucket_col).to_numpy(zero_copy_only=False)
            import numpy as np

            uniq, starts = np.unique(bvals, return_index=True)
            bounds = list(starts) + [len(bvals)]
            body = sorted_batch.drop_columns([bucket_col])
            for b, lo, hi in zip(uniq, bounds[:-1], bounds[1:]):
                path = os.path.join(
                    spill_dir, f"bucket={int(b):05d}", f"{uuid.uuid4().hex}{_SPILL_EXT}"
                )
                _write_spill_file(body.slice(lo, hi - lo), path)
        return pa.Table.from_arrays(
            [pa.array([batch.num_rows], type=pa.int64())], names=["rows"]
        )

    # The per-batch appends are a side effect: a retried map task would
    # append a second copy of its bucket files and the reduce side would
    # silently double-count. Retries are therefore DISABLED for the spill
    # stage -- a task death fails the exchange loudly and the caller
    # re-runs it against a fresh spill_dir. (A cluster-grade variant
    # would use deterministic per-block filenames with overwrite
    # semantics; single-node, fail-fast is the simpler correct choice.)
    stats = ds.map_batches(
        _write,
        batch_format="pyarrow",
        batch_size=SPILL_BATCH_ROWS,
        max_retries=0,
        retry_exceptions=False,
    )
    return int(stats.sum("rows") or 0)


def reduce_buckets(spill_dir: str, n_buckets: int,
                   reduce_fn: Callable[[pa.Table], pa.Table],
                   empty_schema: Optional[pa.Schema] = None):
    """Reduce side: a Dataset with one task per bucket; each reads its
    whole bucket directory and applies ``reduce_fn`` to it."""
    import ray.data as rd

    def _reduce(batch: pa.Table) -> pa.Table:
        outs = []
        for b in batch.column("id").to_pylist():
            bdir = os.path.join(spill_dir, f"bucket={int(b):05d}")
            files = [os.path.join(bdir, f) for f in os.listdir(bdir) if f.endswith(_SPILL_EXT)]
            if not files:
                continue
            outs.append(reduce_fn(pa.concat_tables([_read_spill_file(f) for f in files])))
        if not outs:
            return empty_schema.empty_table() if empty_schema is not None else pa.table({})
        return pa.concat_tables(outs)

    return rd.range(n_buckets, override_num_blocks=n_buckets).map_batches(
        _reduce, batch_format="pyarrow", batch_size=1
    )


def partitioned_exchange(ds, bucket_col: str, n_buckets: int, spill_dir: str,
                         reduce_fn: Callable[[pa.Table], pa.Table],
                         empty_schema: Optional[pa.Schema] = None,
                         fresh: bool = True,
                         timings: Optional[dict] = None):
    """spill_write + reduce_buckets.

    fresh=True (default) deletes any existing spill_dir first -- a stale
    map phase mixed with a new one silently inflates results. Pass
    fresh=False to reuse an INTACT map phase (e.g. re-running only the
    reduce after a failure): spill_write is then skipped entirely if the
    directory already has bucket files.

    ``timings`` (optional dict) receives ``map_sec``: the wall time of
    the consuming map phase (read -> upstream stages -> bucket spill up
    to the barrier), so a caller timing the whole job can attribute
    map vs reduce cost from the artifact alone.
    """
    import shutil
    import time

    has_existing = os.path.isdir(spill_dir) and any(
        d.startswith("bucket=") and os.listdir(os.path.join(spill_dir, d))
        for d in os.listdir(spill_dir)
    )
    t0 = time.perf_counter()
    if fresh:
        if os.path.isdir(spill_dir):
            shutil.rmtree(spill_dir)
        spill_write(ds, bucket_col, n_buckets, spill_dir)
    elif not has_existing:
        spill_write(ds, bucket_col, n_buckets, spill_dir)
    if timings is not None:
        timings["map_sec"] = time.perf_counter() - t0
    return reduce_buckets(spill_dir, n_buckets, reduce_fn, empty_schema)
