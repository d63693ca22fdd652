"""Join helper that survives Ray 2.49's chained-hash-join bug.

Root cause (pinned by ``tests/test_joins.py::test_raw_second_join_collides``):
``Dataset.join`` does NOT suffix colliding column names. When the
second join's probe side still carries a payload column whose NAME also
exists on the build side (e.g. attaching the same ``(node, k)`` degree
table to both endpoints of an edge list), ``HashShuffleAggregator
.finalize`` raises ``KeyError`` / "no match or multiple matches for key
field reference" at execution time -- ``materialize()`` in between does
NOT help, because the collision survives materialization.

``checkpointed_join`` therefore renames every colliding non-key column
on the RIGHT side with a deterministic suffix (a zero-copy Arrow
projection inside ``map_batches``) before the exchange, which makes
join-after-join (and N-deep join chains) plan and execute correctly.

This replaces the round-3 workaround shapes (broadcast label maps /
bucketed keyed groupbys standing in for a second join) where a real
join is the natural operator.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import pyarrow as pa


def default_num_partitions(*row_counts: int, cap: int = 64) -> int:
    """Hash-join partition count safe for Ray 2.49: half the cluster
    CPUs (each partition spawns an aggregator actor -- more partitions
    than CPUs deadlocks a small cluster), clamped by ``cap`` and by
    every known side's row count (empty hash partitions crash the
    2.49 join)."""
    import ray

    cpus = int(ray.cluster_resources().get("CPU", 4)) \
        if ray.is_initialized() else 4
    n = max(2, cpus // 2)
    n = min(n, cap)
    for rc in row_counts:
        n = min(n, max(1, int(rc)))
    return n


def _rename_batch(mapping):
    def fn(batch: pa.Table) -> pa.Table:
        return batch.rename_columns(
            [mapping.get(c, c) for c in batch.column_names])
    return fn


def checkpointed_join(left, right, *, on: Sequence[str],
                      right_on: Optional[Sequence[str]] = None,
                      join_type: str = "inner",
                      num_partitions: int = 4,
                      suffix: str = "_r",
                      left_cols: Optional[Sequence[str]] = None,
                      right_cols: Optional[Sequence[str]] = None):
    """``left.join(right)`` safe to chain after another join.

    ``left_cols`` / ``right_cols``: the column names of each side, if
    the caller knows them (avoids a ``schema()`` metadata fetch on a
    lazy dataset). Colliding right-side payload columns come out
    renamed ``<name><suffix>``; join keys are never renamed.

    ``num_partitions`` must stay <= the smaller side's row count (Ray
    2.49 hash join fails on empty hash partitions) -- callers joining
    possibly-tiny datasets should derive it from a cheap ``count()``.
    """
    on = tuple(on)
    right_on = tuple(right_on) if right_on is not None else on

    lcols = list(left_cols) if left_cols is not None else left.schema().names
    rcols = list(right_cols) if right_cols is not None else right.schema().names

    collide = [c for c in rcols if c in lcols and c not in right_on]
    if collide:
        mapping = {c: c + suffix for c in collide}
        right = right.map_batches(_rename_batch(mapping),
                                  batch_format="pyarrow")
    return left.join(right, join_type=join_type, on=on,
                     right_on=right_on, num_partitions=num_partitions)
