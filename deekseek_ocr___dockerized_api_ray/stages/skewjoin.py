"""Skew-resilient inner join: hot-key split (the "salt the hot keys"
pattern).

A plain hash join sends every row of a key to ONE reduce partition; a
web-scale fact table with a few hot keys (the empty-string document,
the null user, the viral URL) wedges those partitions while the rest of
the cluster idles. This stage:

  1. approximates the left side's key histogram with per-batch partial
     counts + one tiny bucketed reduce (combiner shape -- the full key
     column never leaves the cluster),
  2. declares keys above ``hot_threshold`` (or the top ``max_hot``)
     HOT,
  3. routes COLD rows through the ordinary ``Dataset.join`` exchange,
  4. routes HOT rows through a broadcast map-side join: the right
     side's rows for the hot keys (a handful of keys by construction)
     are collected once, ``ray.put``, and joined inside ``map_batches``
     -- hot keys never enter the shuffle at all.

Output = cold-path join UNION hot-path join; row-identical to a plain
join (path-equivalence tested, and the driver query using it is
DuckDB-oracled).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .agg import grouped_agg


def skew_join(left, right, on: str, right_on: str,
              hot_threshold: int = 100_000, max_hot: int = 64,
              num_partitions: int = 4):
    """Inner join left.on == right.right_on with hot-key splitting.

    ``right`` must be slim on the hot keys (dimension-like or
    pre-aggregated): the hot path broadcasts right-side rows for hot
    keys only.
    """
    import ray

    def key_partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(on, as_index=False, sort=False).agg(n=(on, "size"))
        return g

    counts = grouped_agg(
        left.map_batches(key_partial, batch_format="pandas",
                         batch_size=131072),
        [on], {"n": ("n", "sum")}, n_buckets=16)
    hot_df = (counts.map_batches(
        lambda df: df[df["n"] >= hot_threshold], batch_format="pandas")
        # bound: limit(max_hot) hot keys
        .sort("n", descending=True).limit(max_hot).to_pandas())
    # an empty Ray->pandas result can lose its columns entirely
    hot_keys = set(hot_df[on].tolist()) if on in hot_df.columns else set()

    if not hot_keys:
        return left.join(right, join_type="inner",
                         num_partitions=num_partitions,
                         on=(on,), right_on=(right_on,))

    hot_arr = np.asarray(sorted(hot_keys))

    def split(df: pd.DataFrame, want_hot: bool) -> pd.DataFrame:
        mask = np.isin(df[on].to_numpy(), hot_arr)
        return df[mask] if want_hot else df[~mask]

    cold = left.map_batches(lambda df: split(df, False),
                            batch_format="pandas", batch_size=131072)
    hot = left.map_batches(lambda df: split(df, True),
                           batch_format="pandas", batch_size=131072)

    cold_joined = cold.join(right, join_type="inner",
                            num_partitions=num_partitions,
                            on=(on,), right_on=(right_on,))

    # right side rows for hot keys: few keys by construction -> tiny
    right_hot = right.map_batches(
        lambda df: df[np.isin(df[right_on].to_numpy(), hot_arr)],
        # bound: right rows of the few hot keys (hot set is tiny by construction)
        batch_format="pandas", batch_size=131072).to_pandas()
    rh_ref = ray.put(right_hot)

    def bcast_join(df: pd.DataFrame) -> pd.DataFrame:
        rh = ray.get(rh_ref)
        out = df.merge(rh, left_on=on, right_on=right_on, how="inner")
        if right_on != on:
            out = out.drop(columns=[right_on])
        return out

    hot_joined = hot.map_batches(bcast_join, batch_format="pandas",
                                 batch_size=131072)
    # align column order AND block type (arrow) before union -- the join
    # emits arrow blocks, the pandas map-side path must match
    cols = cold_joined.schema().names
    hot_arrow = hot_joined.select_columns(cols).map_batches(
        lambda t: t, batch_format="pyarrow")
    return cold_joined.union(hot_arrow)
