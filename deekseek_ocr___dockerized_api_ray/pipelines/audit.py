"""Cross-table data-quality audit: referential integrity, primary-key
uniqueness, domain/range rules -- the validation pass a production
ingest runs before promoting a snapshot.

Scale shapes:

  - FK orphan counts are KEYS-ONLY distributed anti joins: the child
    side is combiner-reduced to (key, n_rows) distinct keys, the parent
    side to flagged distinct keys; one bucketed keyed exchange merges
    them and orphan child rows are summed per bucket.  No broadcast of
    a growing dimension, nothing driver-side but the final scalar --
    the exchange carries distinct KEYS, never rows.
  - PK-duplicate and range checks are partial-count map_batches + a
    scalar sum (pruned reads: only the checked column leaves storage).

Each check yields one (check_name, n_violations) row; zeros are
meaningful output (clean data), and the anti-join kernel's nonzero
behavior is pinned by injected-orphan unit tests
(tests/test_audit.py).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..stages.agg import grouped_agg


def _scalar_sum(ds, col: str) -> int:
    got = ds.sum(col)
    return int(got) if got is not None else 0


def anti_join_count(child_ds, child_key: str, parent_ds, parent_key: str,
                    n_buckets: int = 32) -> int:
    """Rows of ``child_ds`` whose key has NO match in ``parent_ds`` --
    keys-only: both sides reduce to distinct keys before the exchange."""

    def child_part(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(child_key, sort=False).size()
        return pd.DataFrame({"key": g.index.to_numpy(dtype=np.int64),
                             "child_n": g.to_numpy(dtype=np.int64),
                             "parent": np.zeros(len(g), dtype=np.int64)})

    def parent_part(df: pd.DataFrame) -> pd.DataFrame:
        keys = df[parent_key].unique()
        return pd.DataFrame({"key": keys.astype(np.int64),
                             "child_n": np.zeros(len(keys), dtype=np.int64),
                             "parent": np.ones(len(keys), dtype=np.int64)})

    both = (child_ds.map_batches(child_part, batch_format="pandas",
                                 batch_size=131072)
            .union(parent_ds.map_batches(parent_part, batch_format="pandas",
                                         batch_size=131072)))
    merged = grouped_agg(both, ["key"],
                         {"child_n": ("child_n", "sum"),
                          "parent": ("parent", "sum")}, n_buckets=n_buckets)

    def orphans(df: pd.DataFrame) -> pd.DataFrame:
        bad = df[df["parent"] == 0]
        return pd.DataFrame({"n": [int(bad["child_n"].sum())]})

    return _scalar_sum(merged.map_batches(orphans, batch_format="pandas"), "n")


def dup_pk_count(ds, key: str, n_buckets: int = 32) -> int:
    """Rows beyond the first per key value: SUM(max(n-1, 0))."""

    def part(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(key, sort=False).size()
        return pd.DataFrame({"key": g.index.to_numpy(dtype=np.int64),
                             "n": g.to_numpy(dtype=np.int64)})

    per_key = grouped_agg(ds.map_batches(part, batch_format="pandas",
                                         batch_size=131072),
                          ["key"], {"n": ("n", "sum")}, n_buckets=n_buckets)

    def extra(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"n": [int((df["n"].to_numpy() - 1).sum())]})

    return _scalar_sum(per_key.map_batches(extra, batch_format="pandas"), "n")


def predicate_count(ds, fn) -> int:
    """Rows where the vectorized predicate ``fn(df) -> bool array`` holds."""

    def part(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"n": [int(np.asarray(fn(df)).sum())]})

    return _scalar_sum(ds.map_batches(part, batch_format="pandas",
                                      batch_size=131072), "n")


def data_quality_audit(sf_dir: str) -> pd.DataFrame:
    """Run the audit suite; returns (check_name, n_violations) sorted by
    check_name.  The assembled report is 7 rows -- driver-side assembly
    of scalars is the intended shape; each check itself streams."""
    import ray.data as rd

    def rp(table: str, cols):
        return rd.read_parquet(f"{sf_dir}/{table}.parquet", columns=cols)

    checks = {
        "fk_orders_customer": lambda: anti_join_count(
            rp("orders", ["o_custkey"]), "o_custkey",
            rp("customer", ["c_custkey"]), "c_custkey"),
        "fk_lineitem_orders": lambda: anti_join_count(
            rp("lineitem", ["l_orderkey"]), "l_orderkey",
            rp("orders", ["o_orderkey"]), "o_orderkey"),
        "fk_customer_nation": lambda: anti_join_count(
            rp("customer", ["c_nationkey"]), "c_nationkey",
            rp("nation", ["n_nationkey"]), "n_nationkey"),
        "pk_dup_orders": lambda: dup_pk_count(
            rp("orders", ["o_orderkey"]), "o_orderkey"),
        "range_lineitem_quantity_gt45": lambda: predicate_count(
            rp("lineitem", ["l_quantity"]),
            lambda df: df["l_quantity"].to_numpy() > 45),
        "range_events_value_gt400": lambda: predicate_count(
            rp("events", ["value"]),
            lambda df: df["value"].to_numpy() > 400),
        "doc_text_too_short_lt20": lambda: predicate_count(
            rp("documents", ["text"]),
            lambda df: df["text"].str.len().to_numpy() < 20),
    }
    # independent Ray pipelines: overlap them from a small thread pool
    # instead of serializing 7 cluster-idle gaps (fsspec probe must be
    # hardened first -- concurrent first-imports raise bare ImportError)
    from concurrent.futures import ThreadPoolExecutor

    from ..state.checkpoint import _harden_fsspec_probe

    _harden_fsspec_probe()

    names = sorted(checks)
    with ThreadPoolExecutor(max_workers=4) as pool:
        counts = list(pool.map(lambda n: int(checks[n]()), names))
    return pd.DataFrame({"check_name": names,
                         "n_violations": pd.array(counts, dtype="int64")})


def corpus_health_report(sf_dir: str):
    """One-call corpus HEALTH REPORT: the scalar audit statistics of
    seven already-oracled operators as a (metric, value) table -- the
    dashboard row a curation run logs per snapshot.  Each member is the
    full distributed operator (nothing re-implemented); this composite
    just harvests their scalar outputs, and its oracle is the UNION ALL
    of the members' own SQL.

    Metrics: zipf_slope, heaps_beta, ks_click_view, mutual_info_nmi,
    entropy_rate_ratio, weekend_jsd_norm, mannwhitney_z,
    quality_keep_rate (the learned classifier gate's keep fraction).

    Output: (metric, value r6) sorted by metric.
    """
    import pandas as pd

    from .curation import quality_keep_rate
    from .sequences import (
        event_weekday_mutual_info,
        events_ks_test,
        events_mannwhitney_u,
        markov_entropy_rate,
        weekend_type_jsd,
    )
    from .text import corpus_heaps_fit, corpus_zipf_fit

    def scalar(res, col: str) -> float:
        # bound: every member emits exactly one row
        df = res.to_pandas() if hasattr(res, "to_pandas") else res
        return float(df[col].iloc[0])

    rows = [
        ("entropy_rate_ratio", scalar(markov_entropy_rate(sf_dir), "ratio")),
        ("heaps_beta", scalar(corpus_heaps_fit(sf_dir), "beta")),
        ("ks_click_view", scalar(events_ks_test(sf_dir), "ks_d")),
        ("mannwhitney_z", scalar(events_mannwhitney_u(sf_dir), "z")),
        ("mutual_info_nmi", scalar(event_weekday_mutual_info(sf_dir),
                                   "nmi")),
        ("quality_keep_rate", scalar(quality_keep_rate(sf_dir),
                                     "keep_rate")),
        ("weekend_jsd_norm", scalar(weekend_type_jsd(sf_dir), "jsd_norm")),
        ("zipf_slope", scalar(corpus_zipf_fit(sf_dir), "slope")),
    ]
    return pd.DataFrame(rows, columns=["metric", "value"])
