"""Two-phase grouped aggregation: partial per batch + bucketed reduce.

``ray.data``'s native ``groupby().aggregate()`` is semantically right
but carries a large fixed all-to-all cost per query in this Ray version
(boundary sampling + sort). For sum/count-shaped aggregates the engine
uses the classic combiner pattern instead:

  1. partial:   pandas named-agg inside ``map_batches`` -- one output
                row per (key, batch); this is what crosses the wire
  2. shuffle:   ONE keyed exchange on ``hash(keys) % n_buckets``
  3. reduce:    per bucket, one vectorized pandas groupby-sum over all
                keys in the bucket (n_buckets group calls total, not
                one per key)

Associative aggregates only (sum / count / min / max); means and ratios
are derived after the reduce.
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import numpy as np
import pandas as pd

from ..functions.text_stats import sha1_64

#: partial spec: out_col -> (in_col, pandas_agg_name)
AggSpec = Dict[str, Tuple[str, str]]

_REDUCE_FOR = {"sum": "sum", "size": "sum", "count": "sum", "min": "min", "max": "max"}


def _bucket_of(df: pd.DataFrame, keys: Sequence[str], n_buckets: int) -> np.ndarray:
    h = np.zeros(len(df), dtype=np.uint64)
    for k in keys:
        col = df[k]
        if np.issubdtype(col.dtype, np.integer):
            kh = col.to_numpy(dtype=np.int64).astype(np.uint64)
            with np.errstate(over="ignore"):
                kh = kh * np.uint64(0x9E3779B97F4A7C15)
                kh ^= kh >> np.uint64(29)
        else:
            kh = np.fromiter((sha1_64(str(v)) for v in col), dtype=np.uint64, count=len(col))
        with np.errstate(over="ignore"):
            h = h * np.uint64(1099511628211) + kh
    return (h % np.uint64(n_buckets)).astype(np.int32)


def grouped_agg(ds, keys: Sequence[str], spec: AggSpec, n_buckets: int = 64):
    """Partial-then-reduce grouped aggregation. Returns a Dataset with
    columns keys + spec keys."""
    keys = list(keys)
    reduce_ops = {out: _REDUCE_FOR[agg] for out, (_, agg) in spec.items()}

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame(columns=keys + list(spec) + ["bucket"])
        g = df.groupby(keys, as_index=False, sort=False).agg(
            **{out: (col, agg) for out, (col, agg) in spec.items()}
        )
        g["bucket"] = _bucket_of(g, keys, n_buckets)
        return g

    def reduce(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby(keys, as_index=False, sort=False).agg(
            **{c: (c, op) for c, op in reduce_ops.items()}
        )
        return out[keys + list(spec)]

    partials = ds.map_batches(partial, batch_format="pandas", batch_size=131072)
    return partials.groupby("bucket").map_groups(reduce, batch_format="pandas")
