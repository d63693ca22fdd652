"""Relational pipelines over the TPC-H-ish test tables.

The reference has no query engine (SURVEY.md section 2.5-2.7: no joins,
three trivial aggregations), but the engine ships general relational
capability built scale-first:

  - column-pruned reads (``read_parquet(columns=...)``)
  - partial pre-aggregation inside ``map_batches`` before every groupby
    (the shuffle moves one row per key per batch, not the corpus)
  - broadcast hash joins for dimension tables (``ray.put`` once, dict
    lookup per batch -- no shuffle)
  - explicit sort+limit top-k with deterministic tie-breaks

Column names match the DuckDB oracle SQL in __ray_entry__ exactly.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions.rounding import round_series

_EPOCH_S = "datetime64[s]"


def _epoch_seconds(series: pd.Series) -> np.ndarray:
    return np.asarray(series, dtype=_EPOCH_S).astype(np.int64)


def q1_pricing_summary(sf_dir: str):
    """TPC-H Q1-style pricing summary with partial pre-aggregation.

    Money columns are DECIMAL quantities stored as doubles, so the
    price terms integerize per row BEFORE aggregation (price*(1-disc)
    is exactly a 4-decimal number; the double product is bit-identical
    in numpy and SQL, and floor(x*1e4 + 0.5) recovers the exact decimal
    integer). Integer sums are order-independent, so the result is
    bit-deterministic under ANY partitioning -- a raw float sum of
    ~0.5M terms at 1e9 magnitude drifts by more than the half-cent
    rounding guard between engines (observed at sf0.1).

    Output: (l_returnflag, l_linestatus, sum_qty, sum_base_price,
    sum_disc_price, avg_qty, count_order), sums/avg rounded to 2.
    """
    import ray.data as rd

    from ..stages.agg import grouped_agg

    ds = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice",
                 "l_discount", "l_shipdate"],
    )
    cutoff = pd.Timestamp("1998-09-02")

    def prep(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["l_shipdate"] <= cutoff]
        price = df["l_extendedprice"].to_numpy(np.float64)
        dp = price * (1.0 - df["l_discount"].to_numpy(np.float64))
        return df.assign(
            price_c=np.floor(price * 100.0 + 0.5).astype(np.int64),
            disc_price_u=np.floor(dp * 10000.0 + 0.5).astype(np.int64),
        )

    prepped = ds.map_batches(prep, batch_format="pandas", batch_size=131072)
    final = grouped_agg(
        prepped,
        ["l_returnflag", "l_linestatus"],
        {
            "sum_qty": ("l_quantity", "sum"),
            "sum_base_price": ("price_c", "sum"),
            "sum_disc_price": ("disc_price_u", "sum"),
            "count_order": ("l_quantity", "size"),
        },
    )

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        df["avg_qty"] = round_series(df["sum_qty"] / df["count_order"], 2)
        df["sum_qty"] = round_series(df["sum_qty"], 2)
        df["sum_base_price"] = round_series(
            df["sum_base_price"].astype(np.float64) / 100.0, 2)
        df["sum_disc_price"] = round_series(
            df["sum_disc_price"].astype(np.float64) / 10000.0, 2)
        df["count_order"] = df["count_order"].astype("int64")
        return df[["l_returnflag", "l_linestatus", "sum_qty", "sum_base_price",
                   "sum_disc_price", "avg_qty", "count_order"]]

    return final.map_batches(finish, batch_format="pandas")


def top_revenue_customers(sf_dir: str, k: int = 10):
    """Revenue per customer via a distributed hash join: orders are
    pre-aggregated to ONE row per custkey (partial + bucketed reduce), so
    the join ships only the aggregate side against the customer
    dimension. Customer is a GROWING dimension (15M rows at sf100) and is
    never materialized on the driver. Then sort desc + limit with custkey
    tie-break.

    Output: (c_custkey, c_name, total_revenue r2).
    """
    import ray
    import ray.data as rd

    from ..stages.agg import grouped_agg

    cust = rd.read_parquet(f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_name"])
    orders = rd.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_totalprice"])

    total = grouped_agg(orders, ["o_custkey"], {"total_revenue": ("o_totalprice", "sum")})

    cpus = int(ray.cluster_resources().get("CPU", 4)) if ray.is_initialized() else 4
    joined = total.map_batches(lambda b: b, batch_format="pyarrow").join(
        cust, join_type="inner", num_partitions=max(2, cpus // 2),
        on=("o_custkey",), right_on=("c_custkey",),
    )

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        df["total_revenue"] = round_series(df["total_revenue"], 2)
        df = df.rename(columns={"o_custkey": "c_custkey"})
        return df[["c_custkey", "c_name", "total_revenue"]]

    return (
        joined.map_batches(finish, batch_format="pandas")
        .sort(["total_revenue", "c_custkey"], descending=[True, False])
        .limit(k)
    )


def revenue_by_region(sf_dir: str):
    """3-way broadcast dimension join: lineitem -> supplier -> nation ->
    region, revenue summed per region name. All three dims are broadcast
    dicts (tiny); only the final 5-row groupby shuffles.

    Output: (r_name, revenue r2).
    """
    import ray
    import ray.data as rd

    import pyarrow.parquet as pq

    from ..stages.agg import grouped_agg

    from ..functions.lookup import VecLookup

    sup = pq.read_table(f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"])
    nat = pq.read_table(f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_regionkey"])
    reg = pq.read_table(f"{sf_dir}/region.parquet", columns=["r_regionkey", "r_name"])
    n2r = dict(zip(nat.column("n_nationkey").to_pylist(), nat.column("n_regionkey").to_pylist()))
    r2name = dict(zip(reg.column("r_regionkey").to_pylist(), reg.column("r_name").to_pylist()))
    # suppkey -> regionkey as a vectorized int lookup; region NAME only
    # attaches at the 5-row finish stage (strings never cross the shuffle)
    s_nat = sup.column("s_nationkey").to_numpy(zero_copy_only=False)
    s2r_ref = ray.put(VecLookup(
        sup.column("s_suppkey").to_numpy(zero_copy_only=False),
        np.fromiter((n2r[int(n)] for n in s_nat), dtype=np.int64, count=len(s_nat)),
    ))

    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_suppkey", "l_extendedprice", "l_discount"],
    )

    def prep(df: pd.DataFrame) -> pd.DataFrame:
        lut: VecLookup = ray.get(s2r_ref)
        rkey, _ = lut.lookup(df["l_suppkey"].to_numpy())
        return pd.DataFrame({
            "r_key": rkey,
            "rev": (df["l_extendedprice"] * (1.0 - df["l_discount"])).to_numpy(),
        })

    prepped = li.map_batches(prep, batch_format="pandas", batch_size=131072)
    total = grouped_agg(prepped, ["r_key"], {"revenue": ("rev", "sum")}, n_buckets=8)

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        df["r_name"] = df["r_key"].map(r2name)
        df["revenue"] = round_series(df["revenue"], 2)
        return df[["r_name", "revenue"]]

    return total.map_batches(finish, batch_format="pandas")


def events_tumbling_hour(sf_dir: str):
    """Tumbling 1-hour window aggregate over the events stream table.

    Window identity = epoch seconds of the hour floor (int64, so the
    DuckDB oracle compares exactly). Partial pre-agg per batch.

    Output: (window_start_s, event_type, n_events, sum_value r2).
    """
    import ray.data as rd

    from ..stages.agg import grouped_agg

    ev = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["ts", "event_type", "value"])

    def prep(df: pd.DataFrame) -> pd.DataFrame:
        return df.assign(window_start_s=_epoch_seconds(df["ts"].dt.floor("h")))

    prepped = ev.map_batches(prep, batch_format="pandas", batch_size=131072)
    final = grouped_agg(
        prepped,
        ["window_start_s", "event_type"],
        {"n_events": ("value", "size"), "sum_value": ("value", "sum")},
    )

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        df["sum_value"] = round_series(df["sum_value"], 2)
        df["n_events"] = df["n_events"].astype("int64")
        return df[["window_start_s", "event_type", "n_events", "sum_value"]]

    return final.map_batches(finish, batch_format="pandas")


def part_filter_topk(sf_dir: str, min_size: int = 25, k: int = 20):
    """Filter + sort + limit: largest-retail-price parts of size >= min_size.

    Output: (p_partkey, p_name, p_retailprice); tie-break on p_partkey.
    """
    import pyarrow.compute as pc
    import ray.data as rd

    parts = rd.read_parquet(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_name", "p_retailprice", "p_size"]
    )
    filtered = parts.map_batches(
        lambda t: t.filter(pc.greater_equal(t.column("p_size"), pa.scalar(min_size))),
        batch_format="pyarrow",
    )
    return (
        filtered.sort(["p_retailprice", "p_partkey"], descending=[True, False])
        .limit(k)
        .select_columns(["p_partkey", "p_name", "p_retailprice"])
    )


def orders_first_per_customer(sf_dir: str):
    """Per-group first: each customer's earliest order (dedup-by-key
    semantics, order = (o_orderdate, o_orderkey)).

    Output: (o_custkey, first_orderkey, first_order_epoch_s).
    """
    import ray.data as rd

    from ..stages.dedup import first_per_group

    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_orderkey", "o_orderdate"]
    )
    firsts = first_per_group(orders, "o_custkey", ["o_orderdate", "o_orderkey"])

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        df["first_orderkey"] = df["o_orderkey"].astype("int64")
        df["first_order_epoch_s"] = _epoch_seconds(df["o_orderdate"])
        return df[["o_custkey", "first_orderkey", "first_order_epoch_s"]]

    return firsts.map_batches(finish, batch_format="pandas")


def q3_shipping_priority(sf_dir: str, k: int = 10):
    """Large-large hash join: lineitem JOIN orders on the order key via
    ``Dataset.join`` (both sides big -- no broadcast), then grouped
    revenue and top-k. Partition count adapts to the cluster so the
    join's shuffle aggregators always fit.

    Output: (l_orderkey, revenue r2, orderdate_s, o_custkey).
    """
    import ray
    import ray.data as rd

    from ..stages.agg import grouped_agg

    cpus = int(ray.cluster_resources().get("CPU", 4)) if ray.is_initialized() else 4
    num_partitions = max(2, cpus // 2)

    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey", "o_orderdate"]
    )
    cutoff = pd.Timestamp("1995-03-15")

    def prep_orders(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["o_orderdate"] < cutoff]
        return df.assign(orderdate_s=_epoch_seconds(df["o_orderdate"]))[
            ["o_orderkey", "o_custkey", "orderdate_s"]
        ]

    orders = orders.map_batches(prep_orders, batch_format="pandas", batch_size=131072)

    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount"],
    )

    def prep_li(df: pd.DataFrame) -> pd.DataFrame:
        return df.assign(rev=df["l_extendedprice"] * (1.0 - df["l_discount"]))[
            ["l_orderkey", "rev"]
        ]

    li = li.map_batches(prep_li, batch_format="pandas", batch_size=131072)

    joined = li.join(
        orders, join_type="inner", num_partitions=num_partitions,
        on=("l_orderkey",), right_on=("o_orderkey",),
    )
    total = grouped_agg(
        joined, ["l_orderkey", "orderdate_s", "o_custkey"], {"revenue": ("rev", "sum")}
    )

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        df["revenue"] = round_series(df["revenue"], 2)
        return df[["l_orderkey", "revenue", "orderdate_s", "o_custkey"]]

    return (
        total.map_batches(finish, batch_format="pandas")
        .sort(["revenue", "l_orderkey"], descending=[True, False])
        .limit(k)
    )


def _rich_customer_keys(sf_dir: str, min_acctbal: float = 5000.0):
    """Broadcast key set: customers with acctbal > threshold.

    Size bound: this ships a FILTERED key set (ints only, no payload)
    via ``ray.put`` once -- ~8 bytes/key, so ~120 MB at sf100's 15M
    customers worst-case. Acceptable for a semi/anti-join key set; if the
    filter were unselective at larger scales, switch to the hash-join
    shape used by top_revenue_customers.
    """
    import pyarrow.parquet as pq
    import ray

    cust = pq.read_table(f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_acctbal"])
    keys = {
        k for k, b in zip(cust.column("c_custkey").to_pylist(),
                          cust.column("c_acctbal").to_pylist())
        if b > min_acctbal
    }
    return ray.put(keys)


def orders_semi_join(sf_dir: str, min_acctbal: float = 5000.0):
    """SEMI join via broadcast key set (guide pattern: ship the key set,
    filter inside map_batches -- no shuffle): orders whose customer has
    acctbal > threshold. Output: (o_orderkey, o_custkey)."""
    import ray
    import ray.data as rd

    ref = _rich_customer_keys(sf_dir, min_acctbal)
    orders = rd.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"])

    def keep(df: pd.DataFrame) -> pd.DataFrame:
        keys = ray.get(ref)
        return df[df["o_custkey"].isin(keys)]

    return orders.map_batches(keep, batch_format="pandas", batch_size=131072)


def orders_anti_join(sf_dir: str, min_acctbal: float = 5000.0):
    """ANTI join, same broadcast shape: orders whose customer does NOT
    have acctbal > threshold. Output: (o_orderkey, o_custkey)."""
    import ray
    import ray.data as rd

    ref = _rich_customer_keys(sf_dir, min_acctbal)
    orders = rd.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"])

    def drop(df: pd.DataFrame) -> pd.DataFrame:
        keys = ray.get(ref)
        return df[~df["o_custkey"].isin(keys)]

    return orders.map_batches(drop, batch_format="pandas", batch_size=131072)


def top2_orders_per_customer(sf_dir: str):
    """Per-group top-k (window-rank shape): each customer's two highest-
    price orders. One bucketed keyed shuffle; within each bucket a single
    vectorized sort + groupby-head over all customers in the bucket.

    Output: (o_custkey, o_orderkey, o_totalprice, rk).
    """
    import ray.data as rd

    from ..functions.text_stats import sha1_64

    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_orderkey", "o_totalprice"]
    )
    n_buckets = 64

    def bucket(df: pd.DataFrame) -> pd.DataFrame:
        h = df["o_custkey"].to_numpy(dtype=np.int64).astype(np.uint64)
        with np.errstate(over="ignore"):
            h = h * np.uint64(0x9E3779B97F4A7C15)
            h ^= h >> np.uint64(29)
        df["bucket"] = (h % np.uint64(n_buckets)).astype("int32")
        return df

    def topk(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["o_custkey", "o_totalprice", "o_orderkey"],
                            ascending=[True, False, True])
        df["rk"] = df.groupby("o_custkey").cumcount() + 1
        out = df[df["rk"] <= 2].drop(columns=["bucket"])
        out["rk"] = out["rk"].astype("int64")
        return out[["o_custkey", "o_orderkey", "o_totalprice", "rk"]]

    return orders.map_batches(bucket, batch_format="pandas", batch_size=131072) \
                 .groupby("bucket").map_groups(topk, batch_format="pandas")


def events_user_reach(sf_dir: str):
    """Exact distinct-count per group: distinct users per event_type.
    Partial per-batch dedup -> one bucketed reduce that counts distinct
    (the general mergeable-state shape; for high-cardinality keys swap
    the set for an HLL sketch, see events_user_reach_hll).

    Output: (event_type, n_users).
    """
    import ray.data as rd

    ev = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_type", "user_id"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop_duplicates(["event_type", "user_id"])

    def reduce(df: pd.DataFrame) -> pd.DataFrame:
        out = df.drop_duplicates(["event_type", "user_id"]).groupby(
            "event_type", as_index=False
        ).agg(n_users=("user_id", "size"))
        out["n_users"] = out["n_users"].astype("int64")
        return out[["event_type", "n_users"]]

    # few event types -> every type fits one reduce call; key the shuffle
    # by event_type hash directly
    partials = ev.map_batches(partial, batch_format="pandas", batch_size=131072)

    def bucket(df: pd.DataFrame) -> pd.DataFrame:
        from ..functions.text_stats import sha1_64

        df["bucket"] = [sha1_64(v) % 8 for v in df["event_type"]]
        return df

    return partials.map_batches(bucket, batch_format="pandas") \
                   .groupby("bucket").map_groups(
                       lambda df: reduce(df.drop(columns=["bucket"])),
                       batch_format="pandas")


def events_user_reach_hll(sf_dir: str, p: int = 12):
    """Approximate distinct users per event_type via mergeable HLL
    sketches: one serialized sketch per (batch, type) -> merge in a tiny
    reduce. ~1.6% relative error at p=12; the scale path when the exact
    per-group set no longer fits a reduce task.

    Output: (event_type, n_users_approx).
    """
    import pyarrow as pa
    import ray.data as rd

    from ..functions.sketch import HyperLogLog

    ev = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_type", "user_id"])

    def partial(batch: pa.Table) -> pa.Table:
        sketches = {}
        for et, uid in zip(batch.column("event_type").to_pylist(),
                           batch.column("user_id").to_pylist()):
            sketches.setdefault(et, HyperLogLog(p)).add(str(uid))
        return pa.Table.from_arrays(
            [pa.array(list(sketches), type=pa.string()),
             pa.array([s.serialize() for s in sketches.values()], type=pa.binary())],
            names=["event_type", "sketch"],
        )

    def merge(batch: pa.Table) -> pa.Table:
        merged = {}
        for et, data in zip(batch.column("event_type").to_pylist(),
                            batch.column("sketch").to_pylist()):
            h = HyperLogLog.deserialize(data, p)
            merged[et] = merged[et].merge(h) if et in merged else h
        return pa.Table.from_arrays(
            [pa.array(list(merged), type=pa.string()),
             pa.array([int(round(s.estimate())) for s in merged.values()], type=pa.int64())],
            names=["event_type", "n_users_approx"],
        )

    def add_bucket(batch: pa.Table) -> pa.Table:
        from ..functions.text_stats import sha1_64

        b = [sha1_64(v) % 16 for v in batch.column("event_type").to_pylist()]
        return batch.append_column("bucket", pa.array(b, type=pa.int32()))

    partials = ev.map_batches(partial, batch_format="pyarrow", batch_size=131072)
    # keyed reduce: sketches for the same event_type co-locate by key
    # hash, so the merge scales with key cardinality (a repartition(1)
    # single-task merge would cap at one reducer for high-cardinality
    # keys; a 16-bucket keyed groupby handles both regimes)
    return partials.map_batches(add_bucket, batch_format="pyarrow") \
        .groupby("bucket").map_groups(
            lambda t: merge(t.drop_columns(["bucket"])), batch_format="pyarrow")


def events_user_reach_kmv(sf_dir: str, k: int = 8):
    """KMV / bottom-k distinct-count sketch per event_type (Bar-Yossef
    et al. 2002; Beyer et al. 2007 "Distinct-value synopses"): keep the
    k smallest DISTINCT 64-bit hashes of the user ids; the estimator is
    (k-1) * 2^64 / h_(k). The sketch is mergeable -- the union's
    bottom-k is the bottom-k of the union of per-batch bottom-k sets --
    so each batch ships <= k rows per type and the keyed reduce is
    exact on the sketch. The deterministic counterpart of
    events_user_reach_hll: same reach question, but every intermediate
    is a plain hash value a SQL oracle can rebuild.

    Evaluation-op pattern (ann_recall_at_k): the output carries the
    EXACT distinct count next to the estimate plus rel_err, so the
    driver oracle certifies the estimator's VALUE, not just execution.
    Hash = md5_number_lower(user_id) (functions/hashing._hash64); when
    a type has fewer than k distinct hashes the sketch IS the exact set
    and the estimate is its size (the standard KMV small-cardinality
    convention), CASE-mirrored in the oracle. h_k -> double and the
    division run in the same operand order on both sides.

    Output: (event_type, n_exact, n_sketch, h_k, est_users r6,
    rel_err r6) sorted by event_type.
    """
    import ray.data as rd

    from ..functions.hashing import _hash64
    from ..functions.rounding import round_half_away

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "user_id"])

    def sketch_partial(df: pd.DataFrame) -> pd.DataFrame:
        d = df.drop_duplicates(["event_type", "user_id"]).copy()
        d["h"] = np.array([_hash64(str(int(u))) for u in d["user_id"]],
                          dtype=np.uint64)
        rows = []
        for et, g in d.groupby("event_type", sort=False):
            hs = np.unique(g["h"].to_numpy())[:k]
            rows.append(pd.DataFrame({"event_type": et, "h": hs}))
        if not rows:
            return pd.DataFrame({"event_type": pd.Series(dtype=object),
                                 "h": pd.Series(dtype=np.uint64)})
        return pd.concat(rows, ignore_index=True)

    def sketch_reduce(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for et, g in df.groupby("event_type", sort=False):
            hs = np.unique(g["h"].to_numpy())[:k]
            rows.append({"event_type": et, "n_sketch": len(hs),
                         "h_k": hs[-1]})
        return pd.DataFrame(rows)

    def exact_partial(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop_duplicates(["event_type", "user_id"])

    def exact_reduce(df: pd.DataFrame) -> pd.DataFrame:
        out = df.drop_duplicates(["event_type", "user_id"]).groupby(
            "event_type", as_index=False).agg(n_exact=("user_id", "size"))
        return out

    def bucket(df: pd.DataFrame) -> pd.DataFrame:
        from ..functions.text_stats import sha1_64

        df = df.copy()
        df["bucket"] = [sha1_64(v) % 8 for v in df["event_type"]]
        return df

    sk = ev.map_batches(sketch_partial, batch_format="pandas",
                        batch_size=131072) \
           .map_batches(bucket, batch_format="pandas") \
           .groupby("bucket").map_groups(
               lambda df: sketch_reduce(df.drop(columns=["bucket"])),
               batch_format="pandas")
    ex = ev.map_batches(exact_partial, batch_format="pandas",
                        batch_size=131072) \
           .map_batches(bucket, batch_format="pandas") \
           .groupby("bucket").map_groups(
               lambda df: exact_reduce(df.drop(columns=["bucket"])),
               batch_format="pandas")

    # bound: event_type grain (combiner-reduced sketch + count rows)
    skd = sk.to_pandas()
    # bound: event_type grain (combiner-reduced distinct counts)
    exd = ex.to_pandas()
    out = exd.merge(skd, on="event_type").sort_values("event_type") \
             .reset_index(drop=True)
    n_sk = out["n_sketch"].to_numpy(dtype=np.int64)
    h_k = out["h_k"].to_numpy(dtype=np.uint64).astype(np.float64)
    n_ex = out["n_exact"].to_numpy(dtype=np.float64)
    est = np.where(n_sk < k, n_sk.astype(np.float64),
                   ((k - 1) * 18446744073709551616.0)
                   / np.where(h_k > 0, h_k, 1.0))
    res = pd.DataFrame({
        "event_type": out["event_type"],
        "n_exact": out["n_exact"].astype("int64"),
        "n_sketch": out["n_sketch"].astype("int64"),
        "h_k": out["h_k"].astype("uint64"),
        "est_users": [round_half_away(v, 6) for v in est],
        "rel_err": [round_half_away(v, 6) for v in (est - n_ex) / n_ex],
    })
    return rd.from_pandas(res)


def events_last_order_asof(sf_dir: str, n_buckets: int = 64):
    """AS-OF JOIN: for each event, the user's most recent order at event
    time (greatest o_orderdate <= ts; ties on date broken by MIN
    o_orderkey via a pre-dedup).

    Custom-operator composition per the cogroup pattern: both sides are
    tagged and bucketed on hash(user) -- ONE keyed shuffle co-locates a
    user's events and orders -- then each bucket runs a single vectorized
    ``pandas.merge_asof`` (sorted by time, by=user) over all users in the
    bucket. No global sort, no driver materialization; the partitioning
    assumption is only that one bucket's rows fit a task (salt n_buckets
    up for hot users).

    Output: (event_id, user_id, ts_s, last_orderkey, last_order_date_s);
    events with no prior order are dropped (inner as-of).
    """
    import numpy as np
    import ray.data as rd

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "user_id", "ts"])
    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_custkey", "o_orderdate"])

    def tag_events(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({
            "user_id": df["user_id"].astype("int64"),
            "event_id": df["event_id"].astype("Int64"),
            "t": np.asarray(df["ts"], dtype="datetime64[us]"),
            "o_orderkey": pd.Series([pd.NA] * len(df), dtype="Int64"),
            "side": 0,
        })
        out["bucket"] = (out["user_id"] % n_buckets).astype("int32")
        return out

    def tag_orders(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({
            "user_id": df["o_custkey"].astype("int64"),
            "event_id": pd.Series([pd.NA] * len(df), dtype="Int64"),
            "t": np.asarray(df["o_orderdate"], dtype="datetime64[us]"),
            "o_orderkey": df["o_orderkey"].astype("Int64"),
            "side": 1,
        })
        out["bucket"] = (out["user_id"] % n_buckets).astype("int32")
        return out

    def asof_bucket(group: pd.DataFrame) -> pd.DataFrame:
        left = group[group["side"] == 0]
        right = group[group["side"] == 1]
        if left.empty:
            return pd.DataFrame(columns=["event_id", "user_id", "ts_s",
                                         "last_orderkey", "last_order_date_s"])
        if right.empty:
            merged = left.iloc[0:0]
        else:
            # tie-dedup: MIN orderkey per (user, date), deterministic
            right = (right.sort_values(["user_id", "t", "o_orderkey"])
                     .drop_duplicates(["user_id", "t"], keep="first"))
            merged = pd.merge_asof(
                left.sort_values("t"),
                right[["user_id", "t", "o_orderkey"]].sort_values("t")
                    .rename(columns={"o_orderkey": "last_orderkey", "t": "od"}),
                left_on="t", right_on="od", by="user_id",
                direction="backward", allow_exact_matches=True,
            )
            merged = merged[merged["last_orderkey"].notna()]
        if merged.empty:
            return pd.DataFrame(columns=["event_id", "user_id", "ts_s",
                                         "last_orderkey", "last_order_date_s"])
        return pd.DataFrame({
            "event_id": merged["event_id"].astype("int64"),
            "user_id": merged["user_id"].astype("int64"),
            "ts_s": np.asarray(merged["t"], dtype="datetime64[s]").astype("int64"),
            "last_orderkey": merged["last_orderkey"].astype("int64"),
            "last_order_date_s": np.asarray(merged["od"], dtype="datetime64[s]").astype("int64"),
        })

    both = ev.map_batches(tag_events, batch_format="pandas", batch_size=131072).union(
        orders.map_batches(tag_orders, batch_format="pandas", batch_size=131072)
    )
    return both.groupby("bucket").map_groups(asof_bucket, batch_format="pandas")


def events_followups_range(sf_dir: str, window_s: int = 86400, n_buckets: int = 64):
    """RANGE self-join: for each event, the same user's strictly-later
    events within ``window_s`` seconds ((ts, ts + window]).

    Custom-operator composition: ONE keyed shuffle on hash(user)
    co-locates each user's events; within a bucket the rows are sorted by
    (user, ts, event_id) and the per-row candidate range comes from two
    vectorized ``searchsorted`` bounds clamped to the user's segment --
    the pair explosion is a ``np.repeat`` + concatenated aranges, no
    Python loop over rows. Partitioning assumption: one bucket's events
    fit a task (salt n_buckets up for hot users).

    Output: (user_id, event_id_a, event_id_b).
    """
    import numpy as np
    import ray.data as rd

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "user_id", "ts"])

    def bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.assign(bucket=(df["user_id"].astype("int64") % n_buckets).astype("int32"))
        return df

    def pairs(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        uid = g["user_id"].to_numpy(dtype=np.int64)
        ts = np.asarray(g["ts"], dtype="datetime64[us]").astype(np.int64)
        eid = g["event_id"].to_numpy(dtype=np.int64)
        n = len(g)
        if n == 0:
            return pd.DataFrame(columns=["user_id", "event_id_a", "event_id_b"])
        # user segments: ts is sorted only WITHIN a user's run (the array
        # is a per-user sawtooth), so bounds are computed per segment --
        # one vectorized searchsorted over each segment's queries; the
        # Python loop is per USER, not per row
        seg_change = np.nonzero(np.diff(uid))[0] + 1
        seg_starts = np.concatenate(([0], seg_change))
        seg_ends = np.concatenate((seg_change, [n]))
        w = np.int64(window_s) * 1_000_000
        lo = np.empty(n, dtype=np.int64)
        hi = np.empty(n, dtype=np.int64)
        for a, b in zip(seg_starts, seg_ends):
            seg = ts[a:b]
            lo[a:b] = a + np.searchsorted(seg, seg, side="right")
            hi[a:b] = a + np.searchsorted(seg, seg + w, side="right")
        counts = np.maximum(hi - lo, 0)
        total = int(counts.sum())
        if total == 0:
            return pd.DataFrame(columns=["user_id", "event_id_a", "event_id_b"])
        src = np.repeat(np.arange(n), counts)
        # concatenated aranges lo[i]..hi[i]
        offsets = np.concatenate(([0], np.cumsum(counts)))[:-1]
        dst = (np.arange(total) - np.repeat(offsets, counts)) + np.repeat(lo, counts)
        return pd.DataFrame({
            "user_id": uid[src],
            "event_id_a": eid[src],
            "event_id_b": eid[dst],
        })

    return (
        ev.map_batches(bucket, batch_format="pandas", batch_size=131072)
        .groupby("bucket")
        .map_groups(lambda df: pairs(df.drop(columns=["bucket"])), batch_format="pandas")
    )


def customer_orders_full_outer(sf_dir: str):
    """FULL OUTER join demo: order volume per customer INCLUDING
    customers that never ordered (right-null side -> zero counts) and
    any order custkeys missing from the dimension (left-null side ->
    segment 'none'). Orders are pre-aggregated to one row per custkey
    before the join, so the exchange ships one slim row per key from
    each side -- the classic reconciliation/audit join at corpus scale.

    Output: (custkey, segment, n_orders, total r2) sorted by custkey.
    """
    import ray
    import ray.data as rd

    from ..stages.agg import grouped_agg

    cust = rd.read_parquet(f"{sf_dir}/customer.parquet",
                           columns=["c_custkey", "c_mktsegment"])
    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_custkey", "o_totalprice"])

    oa = grouped_agg(orders, ["o_custkey"],
                     {"n_orders": ("o_totalprice", "size"),
                      "total": ("o_totalprice", "sum")})

    cpus = int(ray.cluster_resources().get("CPU", 4)) if ray.is_initialized() else 4
    joined = cust.join(
        oa.map_batches(lambda b: b, batch_format="pyarrow"),
        join_type="full_outer", num_partitions=max(2, cpus // 2),
        on=("c_custkey",), right_on=("o_custkey",),
    )

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "custkey": df["c_custkey"].astype("int64"),
            "segment": df["c_mktsegment"].fillna("none"),
            "n_orders": df["n_orders"].fillna(0).astype("int64"),
            "total": round_series(df["total"].fillna(0.0), 2),
        })

    return joined.map_batches(finish, batch_format="pandas").sort("custkey")


def segment_revenue_skew_join(sf_dir: str, hot_threshold: int = 8):
    """Order revenue per market segment via the skew-resilient hot-key
    split join (stages/skewjoin.py): the orders->customer key histogram
    is approximated with a combiner, keys above ``hot_threshold`` orders
    bypass the exchange through a broadcast map-side join, the cold tail
    takes the ordinary hash join. The low default threshold deliberately
    forces BOTH paths live at test scale; output is row-identical to a
    plain join (oracled + path-equivalence-tested).

    Output: (c_mktsegment, n_orders, revenue r2) sorted by segment.
    """
    import ray.data as rd

    from ..stages.agg import grouped_agg
    from ..stages.skewjoin import skew_join

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_custkey", "o_totalprice"])
    cust = rd.read_parquet(f"{sf_dir}/customer.parquet",
                           columns=["c_custkey", "c_mktsegment"])

    joined = skew_join(orders, cust, on="o_custkey", right_on="c_custkey",
                       hot_threshold=hot_threshold)
    agg = grouped_agg(joined, ["c_mktsegment"],
                      {"n_orders": ("o_totalprice", "size"),
                       "revenue": ("o_totalprice", "sum")}, n_buckets=4)

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "c_mktsegment": df["c_mktsegment"],
            "n_orders": df["n_orders"].astype("int64"),
            "revenue": round_series(df["revenue"], 2),
        })

    return agg.map_batches(finish, batch_format="pandas").sort("c_mktsegment")


def orders_snapshot_diff(sf_dir: str, n_buckets: int = 64):
    """CDC snapshot diff: classify every key as added / removed /
    changed between snapshot A (the orders table) and a deterministic
    next-day snapshot B derived from it (keys %97 deleted, keys %89
    repriced +10% (r2), keys %101 cloned as NEW keys offset by 1e9 --
    both engines derive B by the same rules, so the DIFF itself is what
    is under test).

    Shape: both snapshots tag (key, present, price) rows; ONE bucketed
    keyed reduce merges the two sides (each key has <=1 row per side,
    so presence flags and prices ride the combiner as sums); the
    classification filter is vectorized.  No full outer join
    materialization, no driver state -- the canonical
    compare-two-snapshots-at-scale shape.

    Output: (o_orderkey, change_type) sorted by key.
    """
    import ray.data as rd

    from ..stages.agg import grouped_agg

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_totalprice"])

    def a_side(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "k": df["o_orderkey"].to_numpy(dtype=np.int64),
            "a_n": np.ones(len(df), dtype=np.int64),
            "b_n": np.zeros(len(df), dtype=np.int64),
            "ap": df["o_totalprice"].to_numpy(dtype=np.float64),
            "bp": np.zeros(len(df), dtype=np.float64),
        })

    def b_side(df: pd.DataFrame) -> pd.DataFrame:
        k = df["o_orderkey"].to_numpy(dtype=np.int64)
        p = df["o_totalprice"].to_numpy(dtype=np.float64)
        kept = k % 97 != 0
        kk, pk = k[kept], p[kept]
        repr_mask = kk % 89 == 0
        pk = pk.copy()
        pk[repr_mask] = round_series(
            pd.Series(pk[repr_mask] * 1.1), 2).to_numpy()
        add = k % 101 == 0
        out_k = np.concatenate([kk, k[add] + 1_000_000_000])
        out_p = np.concatenate([pk, p[add]])
        return pd.DataFrame({
            "k": out_k,
            "a_n": np.zeros(len(out_k), dtype=np.int64),
            "b_n": np.ones(len(out_k), dtype=np.int64),
            "ap": np.zeros(len(out_k), dtype=np.float64),
            "bp": out_p,
        })

    both = (orders.map_batches(a_side, batch_format="pandas",
                               batch_size=131072)
            .union(orders.map_batches(b_side, batch_format="pandas",
                                      batch_size=131072)))
    merged = grouped_agg(both, ["k"],
                         {"a_n": ("a_n", "sum"), "b_n": ("b_n", "sum"),
                          "ap": ("ap", "sum"), "bp": ("bp", "sum")},
                         n_buckets=n_buckets)

    def classify(df: pd.DataFrame) -> pd.DataFrame:
        a_n = df["a_n"].to_numpy()
        b_n = df["b_n"].to_numpy()
        ap, bp = df["ap"].to_numpy(), df["bp"].to_numpy()
        change = np.where(a_n == 0, "added",
                          np.where(b_n == 0, "removed", "changed"))
        keep = (a_n == 0) | (b_n == 0) | (ap != bp)
        return pd.DataFrame({
            "o_orderkey": df["k"].to_numpy(dtype=np.int64)[keep],
            "change_type": change[keep],
        })

    return merged.map_batches(classify, batch_format="pandas").sort("o_orderkey")


def streaming_user_reach_hll(sf_dir: str, p: int = 12, n_chunks: int = 4,
                             n_buckets: int = 16):
    """STREAMING distinct-user reach per event_type: the event log is
    processed as ``n_chunks`` time-ordered micro-batches, each running
    the same distributed HLL partial+keyed merge as the batch operator
    (`events_user_reach_hll`); per-type REGISTERS carry across chunks
    and merge by register-wise max.  Because max is associative,
    commutative and idempotent, the final registers are IDENTICAL to
    the batch pass no matter how the stream is chunked -- the
    differential test asserts exact equality, not approximation.

    State = |event_types| x 2^p bytes (key-cardinality bounded; at
    high-cardinality keys keep the state table distributed and merge
    via the same keyed groupby -- the sketches are already rows).

    Output: (event_type, n_users_approx) -- byte-equal to the batch op.
    """
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from ..functions.sketch import HyperLogLog
    from ..functions.text_stats import sha1_64

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "user_id", "ts"])

    def mm(df: pd.DataFrame) -> pd.DataFrame:
        ts_us = np.asarray(df["ts"], dtype="datetime64[us]").astype(np.int64)
        return pd.DataFrame({"lo": [ts_us.min()], "hi": [ts_us.max()]})

    # bound: one (lo, hi) row per block
    mms = ev.map_batches(mm, batch_format="pandas",
                         batch_size=262144).to_pandas()
    lo, hi = int(mms["lo"].min()), int(mms["hi"].max())
    bounds = np.linspace(lo, hi + 1, n_chunks + 1).astype(np.int64)

    def chunk_partial(batch: pa.Table, lo_us: int, hi_us: int) -> pa.Table:
        df = batch.to_pandas()
        ts_us = np.asarray(df["ts"], dtype="datetime64[us]").astype(np.int64)
        keep = (ts_us >= lo_us) & (ts_us < hi_us)
        sketches: dict = {}
        for et, uid in zip(df["event_type"].to_numpy()[keep],
                           df["user_id"].to_numpy()[keep]):
            sketches.setdefault(et, HyperLogLog(p)).add(str(uid))
        return pa.Table.from_arrays(
            [pa.array(list(sketches), type=pa.string()),
             pa.array([s.serialize() for s in sketches.values()],
                      type=pa.binary())],
            names=["event_type", "sketch"])

    def merge_regs(batch: pa.Table) -> pa.Table:
        merged: dict = {}
        for et, data in zip(batch.column("event_type").to_pylist(),
                            batch.column("sketch").to_pylist()):
            h = HyperLogLog.deserialize(data, p)
            merged[et] = merged[et].merge(h) if et in merged else h
        return pa.Table.from_arrays(
            [pa.array(list(merged), type=pa.string()),
             pa.array([s.serialize() for s in merged.values()],
                      type=pa.binary())],
            names=["event_type", "sketch"])

    def add_bucket(batch: pa.Table) -> pa.Table:
        b = [sha1_64(v) % n_buckets
             for v in batch.column("event_type").to_pylist()]
        return batch.append_column("bucket", pa.array(b, type=pa.int32()))

    # bound: |event_types| x 2^p-byte register state (the stream state)
    state = pd.DataFrame({"event_type": pd.Series(dtype="object"),
                          "sketch": pd.Series(dtype=object)})
    for i in range(n_chunks):
        lo_us, hi_us = int(bounds[i]), int(bounds[i + 1])
        # bound: one sketch row per (block, type) reduced to |types|
        chunk = (ev.map_batches(
            lambda b, a=lo_us, c=hi_us: chunk_partial(b, a, c),
            batch_format="pyarrow", batch_size=131072)
            .map_batches(add_bucket, batch_format="pyarrow")
            .groupby("bucket").map_groups(
                lambda t: merge_regs(t.drop_columns(["bucket"])),
                batch_format="pyarrow")
            # bound: |event_types| sketch rows after the keyed merge
            .to_pandas())
        both = pd.concat([state, chunk], ignore_index=True)
        folded: dict = {}
        for et, data in zip(both["event_type"], both["sketch"]):
            h = HyperLogLog.deserialize(bytes(data), p)
            folded[et] = folded[et].merge(h) if et in folded else h
        state = pd.DataFrame({
            "event_type": list(folded),
            "sketch": [s.serialize() for s in folded.values()]})

    out = pd.DataFrame({
        "event_type": state["event_type"].to_numpy(),
        "n_users_approx": [
            int(round(HyperLogLog.deserialize(bytes(d), p).estimate()))
            for d in state["sketch"]]})
    return out.sort_values("event_type").reset_index(drop=True)


def events_nearest_order_join(sf_dir: str, n_buckets: int = 64):
    """NEAREST temporal join: for each event, the user's order closest
    in time in EITHER direction -- the enrichment an attribution model
    wants when effects precede or follow the touchpoint.  Deterministic
    tie rules: equal distance prefers the EARLIER (backward) order;
    equal dates pre-dedup to MIN o_orderkey (same as the as-of twin).

    Shape: identical to events_last_order_asof's cogroup -- both sides
    tagged and bucketed on hash(user), ONE keyed shuffle, then per
    bucket a backward and a strictly-forward ``pandas.merge_asof``
    with a vectorized pick; no global sort, no driver state.

    Output: (event_id, user_id, ts_s, nearest_orderkey,
    nearest_date_s, dist_s); events whose user has no orders drop out.
    """
    import numpy as np
    import ray.data as rd

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "user_id", "ts"])
    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_custkey",
                                      "o_orderdate"])

    def tag_events(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({
            "user_id": df["user_id"].astype("int64"),
            "event_id": df["event_id"].astype("Int64"),
            "t": np.asarray(df["ts"], dtype="datetime64[us]"),
            "o_orderkey": pd.Series([pd.NA] * len(df), dtype="Int64"),
            "side": 0,
        })
        out["bucket"] = (out["user_id"] % n_buckets).astype("int32")
        return out

    def tag_orders(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({
            "user_id": df["o_custkey"].astype("int64"),
            "event_id": pd.Series([pd.NA] * len(df), dtype="Int64"),
            "t": np.asarray(df["o_orderdate"], dtype="datetime64[us]"),
            "o_orderkey": df["o_orderkey"].astype("Int64"),
            "side": 1,
        })
        out["bucket"] = (out["user_id"] % n_buckets).astype("int32")
        return out

    cols = ["event_id", "user_id", "ts_s", "nearest_orderkey",
            "nearest_date_s", "dist_s"]

    def nearest_bucket(group: pd.DataFrame) -> pd.DataFrame:
        left = group[group["side"] == 0]
        right = group[group["side"] == 1]
        if left.empty or right.empty:
            # typed empty frame: object-dtype columns become null-typed
            # in Arrow and clash with nonempty groups' int64 schema
            return pd.DataFrame({c: pd.Series(dtype="int64") for c in cols})
        right = (right.sort_values(["user_id", "t", "o_orderkey"])
                 .drop_duplicates(["user_id", "t"], keep="first"))
        rr = (right[["user_id", "t", "o_orderkey"]].sort_values("t")
              .rename(columns={"o_orderkey": "nk", "t": "od"}))
        ls = left.sort_values("t")
        back = pd.merge_asof(ls, rr, left_on="t", right_on="od",
                             by="user_id", direction="backward",
                             allow_exact_matches=True)
        fwd = pd.merge_asof(ls, rr, left_on="t", right_on="od",
                            by="user_id", direction="forward",
                            allow_exact_matches=False)
        t_us = np.asarray(back["t"], dtype="datetime64[us]").astype(np.int64)
        # NaT.astype(float) is iNaT (-9.2e18), NOT NaN: mask via isna
        # BEFORE the numeric view
        bmiss = back["od"].isna().to_numpy()
        fmiss = fwd["od"].isna().to_numpy()
        bd = np.asarray(back["od"], dtype="datetime64[us]").astype(np.float64)
        fd = np.asarray(fwd["od"], dtype="datetime64[us]").astype(np.float64)
        bdist = t_us - bd
        fdist = fd - t_us
        use_b = ~bmiss & (fmiss | (bdist <= fdist))
        nd = np.where(use_b, bd, fd)
        nk = np.where(use_b, back["nk"].to_numpy(dtype="float64",
                                                 na_value=np.nan),
                      fwd["nk"].to_numpy(dtype="float64", na_value=np.nan))
        # keep any event with >=1 neighbor; ~use_b with both present
        # means forward is strictly closer (NOT a drop -- the driver
        # corpus never exercises both-sides, the synthetic test does)
        keep = ~(bmiss & fmiss)
        # integer microseconds end-to-end: float-divide-then-truncate
        # disagrees with SQL casts, int64 floor-div cannot
        nd_i = nd[keep].astype(np.int64)
        t_k = t_us[keep]
        dist_us = np.where(use_b[keep], t_k - nd_i, nd_i - t_k)
        return pd.DataFrame({
            "event_id": back["event_id"].to_numpy(dtype="int64",
                                                  na_value=0)[keep],
            "user_id": back["user_id"].to_numpy(dtype=np.int64)[keep],
            "ts_s": (t_k // 1_000_000).astype(np.int64),
            "nearest_orderkey": nk[keep].astype(np.int64),
            "nearest_date_s": (nd_i // 1_000_000).astype(np.int64),
            "dist_s": (dist_us // 1_000_000).astype(np.int64),
        })

    both = (ev.map_batches(tag_events, batch_format="pandas",
                           batch_size=131072)
            .union(orders.map_batches(tag_orders, batch_format="pandas",
                                      batch_size=131072)))
    return (both.groupby("bucket")
            .map_groups(lambda g: nearest_bucket(g.drop(columns=["bucket"])),
                        batch_format="pandas"))


def events_next_purchase_asof(sf_dir: str, n_buckets: int = 64):
    """FORWARD as-of join inside the event stream: for each event, the
    same user's NEXT purchase STRICTLY after it (least purchase ts >
    event ts; ts ties among purchases broken by MIN event_id via a
    pre-dedup) -- the time-to-conversion attribution primitive,
    mirror-image of ``events_last_order_asof``.

    Same cogroup shape: ONE keyed shuffle on hash(user) co-locates a
    user's events and purchases, then a single vectorized
    ``pandas.merge_asof(direction='forward', allow_exact_matches=
    False)`` per bucket. Events with no later purchase drop (inner
    as-of).

    Output: (event_id, user_id, ts_s, purchase_event_id,
    purchase_ts_s, wait_s) sorted by event_id.
    """
    import numpy as np
    import ray.data as rd

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "user_id", "ts",
                                  "event_type"])

    def tag(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({
            "user_id": df["user_id"].astype("int64"),
            "event_id": df["event_id"].astype("int64"),
            "t": np.asarray(df["ts"], dtype="datetime64[us]"),
            "is_purchase": (df["event_type"] == "purchase"),
        })
        out["bucket"] = (out["user_id"] % n_buckets).astype("int32")
        return out

    cols = ["event_id", "user_id", "ts_s", "purchase_event_id",
            "purchase_ts_s", "wait_s"]

    def asof_bucket(group: pd.DataFrame) -> pd.DataFrame:
        left = group
        right = group[group["is_purchase"]]
        if left.empty or right.empty:
            return pd.DataFrame({c: pd.Series([], dtype="int64")
                                 for c in cols})
        # ts ties among purchases: keep MIN event_id (deterministic)
        right = (right.sort_values(["user_id", "t", "event_id"])
                 .drop_duplicates(["user_id", "t"], keep="first"))
        merged = pd.merge_asof(
            left.sort_values(["t", "event_id"]),
            right[["user_id", "t", "event_id"]].sort_values("t")
                .rename(columns={"event_id": "purchase_event_id",
                                 "t": "pt"}),
            left_on="t", right_on="pt", by="user_id",
            direction="forward", allow_exact_matches=False,
        )
        merged = merged[merged["purchase_event_id"].notna()]
        if merged.empty:
            return pd.DataFrame({c: pd.Series([], dtype="int64")
                                 for c in cols})
        ts_s = np.asarray(merged["t"], dtype="datetime64[s]").astype("int64")
        pt_s = np.asarray(merged["pt"], dtype="datetime64[s]").astype("int64")
        return pd.DataFrame({
            "event_id": merged["event_id"].astype("int64"),
            "user_id": merged["user_id"].astype("int64"),
            "ts_s": ts_s,
            "purchase_event_id": merged["purchase_event_id"].astype("int64"),
            "purchase_ts_s": pt_s,
            "wait_s": pt_s - ts_s,
        })

    both = ev.map_batches(tag, batch_format="pandas", batch_size=131072)
    return (both.groupby("bucket").map_groups(asof_bucket,
                                              batch_format="pandas")
            .sort("event_id"))


def events_quantile_sketch(sf_dir: str, s: int = 256, n_buckets: int = 8):
    """Sample-based quantile sketch with certified error -- the
    mergeable quantile-estimation pattern (the quantile counterpart of
    ``events_user_reach_kmv``): a deterministic uniform sample of the
    events table is the s smallest rows by 64-bit hash rank
    (``md5_number_lower(event_id)`` -- bottom-s of a union is the
    bottom-s of per-batch bottom-s partials, so the sketch is mergeable
    and every batch ships <= s rows), and the p25/p50/p75 of ``value``
    are estimated by explicit sorted-pick over the sample (integer
    index ((n-1)*p) // 4, no interpolation convention to desync).

    Evaluation-op pattern: the output carries the EXACT quantile (the
    same sorted-pick over the full table, computed from ONE distributed
    sort sliced at the three global indices -- the emb_norm_outliers /
    ppl_buckets one-sort shape) next to the estimate plus abs_err, so
    the oracle certifies the estimator's VALUE, not just execution.

    Scale shape: sample side = per-batch bottom-s partials, one
    hash-bucketed keyed reduce (per-bucket bottom-s), driver merge of
    <= n_buckets*s rows; exact side = ONE distributed sort + 3
    single-index slices. At 100 TB the exact side is the expensive leg
    you run once to calibrate s, then drop.

    Output: (q 'p25'|'p50'|'p75', n_total, n_sample, est r6, exact r6,
    abs_err r6) sorted by q.
    """
    import ray.data as rd

    from ..functions.hashing import _hash64
    from ..functions.rounding import round_half_away

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "value"])

    def sample_partial(df: pd.DataFrame) -> pd.DataFrame:
        d = df.copy()
        d["h"] = np.array([_hash64(str(int(e))) for e in d["event_id"]],
                          dtype=np.uint64)
        d = d.sort_values(["h", "event_id"]).head(s)
        d["bucket"] = (d["h"] % n_buckets).astype(np.int64)
        return d[["bucket", "h", "event_id", "value"]]

    def bucket_reduce(df: pd.DataFrame) -> pd.DataFrame:
        return (df.sort_values(["h", "event_id"]).head(s)
                [["h", "event_id", "value"]])

    samp = (ev.map_batches(sample_partial, batch_format="pandas",
                           batch_size=131072)
            .groupby("bucket")
            .map_groups(bucket_reduce, batch_format="pandas"))
    # bound: <= n_buckets * s rows (per-bucket bottom-s partials)
    sd = samp.to_pandas().sort_values(["h", "event_id"]).head(s)
    sv = np.sort(sd["value"].to_numpy(np.float64))
    n_s = len(sv)

    # exact side: ONE distributed sort, sliced at the 3 global indices
    vt = ev.select_columns(["value"]).materialize()
    n = vt.count()
    idx0 = sorted({((n - 1) * p) // 4 for p in (1, 2, 3)})
    cuts: list = []
    for i in idx0:
        cuts.extend([i, i + 1])
    snt = vt.sort("value").materialize()
    parts = snt.split_at_indices(cuts)
    exact_at = {}
    for j, i in enumerate(idx0):
        # bound: 1 row (single-index slice of the sorted table)
        exact_at[i] = float(parts[2 * j + 1].take_all()[0]["value"])

    rows = []
    for p, q in ((1, "p25"), (2, "p50"), (3, "p75")):
        est = float(sv[((n_s - 1) * p) // 4])
        exact = exact_at[((n - 1) * p) // 4]
        rows.append({"q": q, "n_total": np.int64(n),
                     "n_sample": np.int64(n_s),
                     "est": round_half_away(est, 6),
                     "exact": round_half_away(exact, 6),
                     "abs_err": round_half_away(abs(est - exact), 6)})
    out = pd.DataFrame(rows).sort_values("q").reset_index(drop=True)
    return rd.from_pandas(out)
