"""Windowed analytics and multi-join reporting queries.

Window functions (LAG, running SUM) follow the engine's partitioned-log
pattern (see pipelines/windows.py): ONE bucketed keyed shuffle on the
partition key, then a vectorized per-bucket kernel over the sorted
frame -- never a per-user Python loop and never a driver materialize.

The TPC-H-shaped reports (q4/q5/q6/q14/q18 analogues over the driver's
synthetic tables) demonstrate the engine's join ladder:

  - fact-to-fact:       pre-aggregate the fact to one row per key, then
                        ``Dataset.join`` (hash exchange on both sides)
  - growing dimension:  ``Dataset.join`` (customer/part grow with sf);
                        SIZE-GATED: below ``broadcast_rows`` the dim (or
                        a derived bitmap / VecLookup of it) broadcasts
                        via ``ray.put`` and the query collapses to one
                        zero-shuffle streaming pass (q4/q5/q14); the
                        join path stays live above the gate and is
                        pinned by path-equivalence tests
  - tiny dimension:     ``ray.put`` broadcast dict (supplier/nation/region)
  - q18 deliberately keeps the un-gated fact-fact hash join as the
    representative of that shape

Summation order inside a group is not bitwise-stable across engines;
all money outputs are rounded (half away from zero, DuckDB ROUND
convention) before comparison, same as the rest of the relational suite.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..functions.rounding import round_series
from ..stages.agg import grouped_agg

_TS_US = 1_000_000


def _cpus() -> int:
    import ray

    return int(ray.cluster_resources().get("CPU", 4)) if ray.is_initialized() else 4


def _join_partitions(expected_rows: int) -> int:
    """Hash-join partition count: scale with the cluster but never above
    ~1 partition per 50 expected build rows (Ray 2.49's hash join raises
    ArrowInvalid on EMPTY partitions; tiny test inputs hit that with
    cluster-sized partition counts)."""
    return int(max(2, min(_cpus() // 2, max(2, expected_rows // 50))))


def _user_bucket(df: pd.DataFrame, col: str, n_buckets: int) -> pd.DataFrame:
    h = df[col].to_numpy(dtype=np.int64).astype(np.uint64)
    with np.errstate(over="ignore"):
        h = h * np.uint64(0x9E3779B97F4A7C15)
        h ^= h >> np.uint64(29)
    df["bucket"] = (h % np.uint64(n_buckets)).astype(np.int32)
    return df


# ---------------------------------------------------------------------------
# window functions
# ---------------------------------------------------------------------------

def events_lag_delta(sf_dir: str, n_buckets: int = 64):
    """LAG window: microseconds since the user's previous event.

    Per-user total order is (ts, event_id); the first event of each user
    has no predecessor and is dropped (matches QUALIFY delta IS NOT NULL).
    Output: (event_id, user_id, delta_us).
    """
    import ray.data as rd

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "ts", "user_id"])

    def lag_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"])
        ts_us = np.asarray(df["ts"], dtype="datetime64[us]").astype(np.int64)
        user = df["user_id"].to_numpy()
        same_user = np.empty(len(df), dtype=bool)
        same_user[0] = False
        same_user[1:] = user[1:] == user[:-1]
        delta = np.empty(len(df), dtype=np.int64)
        delta[0] = 0
        delta[1:] = ts_us[1:] - ts_us[:-1]
        out = pd.DataFrame({
            "event_id": df["event_id"].to_numpy()[same_user],
            "user_id": user[same_user],
            "delta_us": delta[same_user],
        })
        return out

    bucketed = ev.map_batches(
        lambda df: _user_bucket(df, "user_id", n_buckets),
        batch_format="pandas", batch_size=131072,
    )
    return bucketed.groupby("bucket").map_groups(lag_bucket, batch_format="pandas")


def customer_running_revenue(sf_dir: str, n_buckets: int = 64):
    """Running SUM window: cumulative order revenue per customer in
    (o_orderdate, o_orderkey) order. Sequential cumsum inside the sorted
    partition matches SUM() OVER (... ROWS UNBOUNDED PRECEDING) bitwise
    because both add in the same order.

    Output: (o_orderkey, o_custkey, running_revenue r2).
    """
    import ray.data as rd

    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"],
    )

    def running_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["o_custkey", "o_orderdate", "o_orderkey"])
        run = df.groupby("o_custkey", sort=False)["o_totalprice"].cumsum()
        return pd.DataFrame({
            "o_orderkey": df["o_orderkey"].to_numpy(),
            "o_custkey": df["o_custkey"].to_numpy(),
            "running_revenue": round_series(run, 2).to_numpy(),
        })

    bucketed = orders.map_batches(
        lambda df: _user_bucket(df, "o_custkey", n_buckets),
        batch_format="pandas", batch_size=131072,
    )
    return bucketed.groupby("bucket").map_groups(running_bucket, batch_format="pandas")


# ---------------------------------------------------------------------------
# TPC-H-shaped reports
# ---------------------------------------------------------------------------

def q6_forecast_revenue(sf_dir: str):
    """TPC-H q6 analogue: a pure filter + global sum -- the cheapest
    possible shape (pruned 4-column read, per-batch vectorized predicate,
    one scalar aggregate; no shuffle at all).

    Output: one row (revenue r2).
    """
    import ray.data as rd

    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_shipdate", "l_discount", "l_quantity", "l_extendedprice"],
    )

    lo = np.datetime64("1996-01-01", "us")
    hi = np.datetime64("1997-01-01", "us")

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        ship = np.asarray(df["l_shipdate"], dtype="datetime64[us]")
        disc = df["l_discount"].to_numpy()
        mask = ((ship >= lo) & (ship < hi)
                & (disc >= 0.05) & (disc <= 0.07)
                & (df["l_quantity"].to_numpy() < 24.0))
        rev = (df["l_extendedprice"].to_numpy()[mask] * disc[mask]).sum()
        return pd.DataFrame({"rev": [rev]})

    total = li.map_batches(partial, batch_format="pandas", batch_size=131072).sum("rev")
    return pd.DataFrame({"revenue": [round_series(pd.Series([total]), 2).iloc[0]]})


def order_priority_counts(sf_dir: str, broadcast_rows: int = 50_000_000):
    """TPC-H q4 analogue: orders with at least one line item shipped
    after the order date, counted per priority.

    Under the gate (orders bitmap fits workers; 1 bit per order --
    50M orders = 6 MiB), the EXISTS is a mergeable BITMAP: broadcast
    (orderkey -> row index, orderdate), stream lineitem ONCE emitting a
    per-batch packed bitmap of orders seen with a late line item, OR the
    tiny bitmap partials, count per priority vectorized. Zero shuffles.

    Above the gate: pre-aggregated max(l_shipdate) per orderkey (fact
    reduced to one row per key BEFORE the join) + one hash join.

    Output: (o_orderpriority, n_orders).
    """
    import ray
    import ray.data as rd
    import pyarrow.parquet as pq

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_shipdate"])

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        df["n_orders"] = df["n_orders"].astype("int64")
        return df[["o_orderpriority", "n_orders"]]

    n_orders = pq.ParquetFile(f"{sf_dir}/orders.parquet").metadata.num_rows
    if n_orders <= broadcast_rows:
        from ..functions.lookup import VecLookup

        ot = pq.read_table(f"{sf_dir}/orders.parquet",
                           columns=["o_orderkey", "o_orderdate", "o_orderpriority"])
        okey = ot.column("o_orderkey").to_numpy(zero_copy_only=False)
        odate = (ot.column("o_orderdate").to_numpy(zero_copy_only=False)
                 .astype("datetime64[us]").astype(np.int64))
        order = np.argsort(okey, kind="stable")
        okey_s, odate_s = okey[order], odate[order]
        idx_lut = VecLookup(okey_s, np.arange(len(okey_s), dtype=np.int64))
        ref = ray.put((idx_lut, odate_s))
        nbytes = (len(okey_s) + 7) // 8

        def bitmap_partial(df: pd.DataFrame) -> pd.DataFrame:
            lut, odates = ray.get(ref)
            idx, found = lut.lookup(df["l_orderkey"].to_numpy())
            ship = np.asarray(df["l_shipdate"], dtype="datetime64[us]").astype(np.int64)
            late_idx = idx[found & (ship > odates[idx])]
            bits = np.zeros(nbytes, dtype=np.uint8)
            np.bitwise_or.at(bits, late_idx >> 3,
                             (np.uint8(1) << (late_idx & 7).astype(np.uint8)))
            return pd.DataFrame({"bits": [bits.tobytes()]})

        parts = li.map_batches(bitmap_partial, batch_format="pandas",
                               # bound: one n_orders-bit bitmap per block (inside the orders broadcast gate)
                               batch_size=131072).take_all()
        merged = np.zeros(nbytes, dtype=np.uint8)
        for row in parts:
            merged |= np.frombuffer(row["bits"], dtype=np.uint8)
        has_late = (np.unpackbits(merged, bitorder="little")[: len(okey_s)]
                    .astype(bool))
        # bound: inside the n_orders <= broadcast_rows gate (pruned orders dim)
        prio = ot.column("o_orderpriority").to_pandas().to_numpy()[order]
        out = (pd.DataFrame({"o_orderpriority": prio[has_late]})
               .groupby("o_orderpriority", as_index=False).size()
               .rename(columns={"size": "n_orders"}))
        return finish(out)

    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderdate", "o_orderpriority"],
    )
    max_ship = grouped_agg(li, ["l_orderkey"], {"max_ship": ("l_shipdate", "max")})
    joined = orders.join(
        max_ship, join_type="inner", num_partitions=_join_partitions(n_orders),
        on=("o_orderkey",), right_on=("l_orderkey",),
    )

    def late(df: pd.DataFrame) -> pd.DataFrame:
        keep = (np.asarray(df["max_ship"], dtype="datetime64[us]")
                > np.asarray(df["o_orderdate"], dtype="datetime64[us]"))
        return df.loc[keep, ["o_orderpriority"]].assign(one=np.int64(1))

    filtered = joined.map_batches(late, batch_format="pandas")
    counts = grouped_agg(filtered, ["o_orderpriority"],
                         {"n_orders": ("one", "sum")}, n_buckets=8)
    return counts.map_batches(finish, batch_format="pandas")


def nation_volume_q5(sf_dir: str, broadcast_rows: int = 5_000_000):
    """TPC-H q5 analogue: revenue per nation from 1996 orders where the
    supplying nation equals the customer's nation.

    Size-gated like the engine's other broadcast-vs-shuffle hybrids:

    - Under the gate (filtered orders fit a driver/worker dict): build
      orderkey -> customer-nation ONCE (orders joined to customer via
      two pruned column reads), ``ray.put`` it, and reduce the whole
      query to a single zero-shuffle pass over lineitem + an 8-bucket
      aggregate. The year filter keeps this side ~1/6 of orders.
    - Above the gate: orders JOIN customer (growing dim -> hash join),
      then ONE fact-to-fact hash join lineitem->orders on orderkey.

    supplier/nation are tiny dims -> broadcast dicts on both paths.
    Output: (n_name, revenue r2) sorted by revenue desc.
    """
    import ray
    import ray.data as rd
    import pyarrow.parquet as pq

    sup = pq.read_table(f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"])
    nat = pq.read_table(f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"])
    s2n = dict(zip(sup.column("s_suppkey").to_pylist(), sup.column("s_nationkey").to_pylist()))
    n2name = dict(zip(nat.column("n_nationkey").to_pylist(), nat.column("n_name").to_pylist()))
    s2n_ref = ray.put(s2n)

    lo = np.datetime64("1996-01-01", "us")
    hi = np.datetime64("1997-01-01", "us")

    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"],
    )

    def same_nation(df: pd.DataFrame) -> pd.DataFrame:
        keep = df["s_nationkey"].to_numpy() == df["c_nationkey"].to_numpy(dtype=np.int32)
        return df.loc[keep, ["s_nationkey", "rev"]].rename(
            columns={"s_nationkey": "n_nationkey"})

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        df["n_name"] = df["n_nationkey"].map(n2name)
        df["revenue"] = round_series(df["revenue"], 2)
        return df[["n_name", "revenue"]]

    n_orders = pq.ParquetFile(f"{sf_dir}/orders.parquet").metadata.num_rows
    if n_orders <= broadcast_rows:
        # broadcast path: one pruned read of each dim column pair, one
        # dict, one streaming pass over the fact table
        from ..functions.lookup import VecLookup

        ot = pq.read_table(f"{sf_dir}/orders.parquet",
                           columns=["o_orderkey", "o_custkey", "o_orderdate"])
        od = ot.column("o_orderdate").to_numpy(zero_copy_only=False)
        m = (od >= lo) & (od < hi)
        okey = ot.column("o_orderkey").to_numpy(zero_copy_only=False)[m]
        ocust = ot.column("o_custkey").to_numpy(zero_copy_only=False)[m]
        ct = pq.read_table(f"{sf_dir}/customer.parquet",
                           columns=["c_custkey", "c_nationkey"])
        cust_lut = VecLookup(ct.column("c_custkey").to_numpy(zero_copy_only=False),
                             ct.column("c_nationkey").to_numpy(zero_copy_only=False))
        onat, _ = cust_lut.lookup(ocust)  # FK is total: every cust resolves
        o2nat_ref = ray.put(VecLookup(okey, onat))
        sup_lut_ref = ray.put(
            VecLookup(sup.column("s_suppkey").to_numpy(zero_copy_only=False),
                      sup.column("s_nationkey").to_numpy(zero_copy_only=False)))

        def one_pass(df: pd.DataFrame) -> pd.DataFrame:
            o_lut: VecLookup = ray.get(o2nat_ref)
            s_lut: VecLookup = ray.get(sup_lut_ref)
            cn, found = o_lut.lookup(df["l_orderkey"].to_numpy())
            sn, _ = s_lut.lookup(df["l_suppkey"].to_numpy())
            keep = found & (sn == cn)
            rev = (df["l_extendedprice"] * (1.0 - df["l_discount"])).to_numpy()[keep]
            return pd.DataFrame({"n_nationkey": sn[keep].astype(np.int32),
                                 "rev": rev})

        matched = li.map_batches(one_pass, batch_format="pandas", batch_size=131072)
        rev = grouped_agg(matched, ["n_nationkey"],
                          {"revenue": ("rev", "sum")}, n_buckets=8)
        return (rev.map_batches(finish, batch_format="pandas")
                   .sort(["revenue", "n_name"], descending=[True, False]))

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_custkey", "o_orderdate"])

    def filter_orders(df: pd.DataFrame) -> pd.DataFrame:
        od = np.asarray(df["o_orderdate"], dtype="datetime64[us]")
        return df.loc[(od >= lo) & (od < hi), ["o_orderkey", "o_custkey"]]

    orders_96 = orders.map_batches(filter_orders, batch_format="pandas")

    cust = rd.read_parquet(f"{sf_dir}/customer.parquet",
                           columns=["c_custkey", "c_nationkey"])
    o_with_nat = orders_96.join(
        cust, join_type="inner", num_partitions=_join_partitions(n_orders),
        on=("o_custkey",), right_on=("c_custkey",),
    )

    def attach_supplier_nation(df: pd.DataFrame) -> pd.DataFrame:
        lookup = ray.get(s2n_ref)
        return pd.DataFrame({
            "l_orderkey": df["l_orderkey"].to_numpy(),
            "s_nationkey": df["l_suppkey"].map(lookup).to_numpy(dtype=np.int32),
            "rev": (df["l_extendedprice"] * (1.0 - df["l_discount"])).to_numpy(),
        })

    li_nat = li.map_batches(attach_supplier_nation, batch_format="pandas",
                            batch_size=131072)

    joined = li_nat.join(
        o_with_nat, join_type="inner", num_partitions=_join_partitions(n_orders),
        on=("l_orderkey",), right_on=("o_orderkey",),
    )

    rev = grouped_agg(
        joined.map_batches(same_nation, batch_format="pandas"),
        ["n_nationkey"], {"revenue": ("rev", "sum")}, n_buckets=8,
    )
    return (rev.map_batches(finish, batch_format="pandas")
               .sort(["revenue", "n_name"], descending=[True, False]))


def promo_revenue_q14(sf_dir: str, broadcast_rows: int = 20_000_000):
    """TPC-H q14 analogue: percentage of 1997 revenue from PROMO parts.

    IMPORTANT numeric detail on both paths: revenue is summed PER
    PARTKEY first and the promo/total split happens on those per-part
    subtotals -- the same grouping the oracle uses -- so the float
    summation tree agrees to ~1e-12 relative.

    Under the gate, the part dimension ships as a broadcast
    (partkey -> is_promo) VecLookup and the whole query is one streaming
    pass + driver division. Above it: per-partkey combiner agg (the only
    shuffle) hash-joined against part, then two scalar sums.

    Output: one row (promo_revenue_pct r6).
    """
    import ray
    import ray.data as rd
    import pyarrow.parquet as pq

    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_shipdate", "l_extendedprice", "l_discount"],
    )
    lo = np.datetime64("1997-01-01", "us")
    hi = np.datetime64("1998-01-01", "us")

    def prep(df: pd.DataFrame) -> pd.DataFrame:
        ship = np.asarray(df["l_shipdate"], dtype="datetime64[us]")
        m = (ship >= lo) & (ship < hi)
        return pd.DataFrame({
            "l_partkey": df["l_partkey"].to_numpy()[m],
            "rev": (df["l_extendedprice"].to_numpy()[m]
                    * (1.0 - df["l_discount"].to_numpy()[m])),
        })

    per_part = grouped_agg(
        li.map_batches(prep, batch_format="pandas", batch_size=131072),
        ["l_partkey"], {"rev": ("rev", "sum")},
    )

    n_parts = pq.ParquetFile(f"{sf_dir}/part.parquet").metadata.num_rows
    if n_parts <= broadcast_rows:
        from ..functions.lookup import VecLookup

        pt = pq.read_table(f"{sf_dir}/part.parquet", columns=["p_partkey", "p_type"])
        # bound: inside the n_parts <= broadcast_rows gate (2-col part dim)
        promo = (pt.column("p_type").to_pandas().to_numpy() == "PROMO")
        lut_ref = ray.put(VecLookup(
            pt.column("p_partkey").to_numpy(zero_copy_only=False),
            promo.astype(np.int64)))

        def split_bcast(df: pd.DataFrame) -> pd.DataFrame:
            lut: VecLookup = ray.get(lut_ref)
            is_promo, found = lut.lookup(df["l_partkey"].to_numpy())
            rev = df["rev"].to_numpy()
            keep = found
            p = rev[keep & (is_promo == 1)].sum()
            t = rev[keep].sum()
            return pd.DataFrame({"promo_rev": [p], "total_rev": [t]})

        parts = per_part.map_batches(split_bcast, batch_format="pandas")
    else:
        part = rd.read_parquet(f"{sf_dir}/part.parquet",
                               columns=["p_partkey", "p_type"])
        joined = per_part.join(
            part, join_type="inner", num_partitions=_join_partitions(n_parts),
            on=("l_partkey",), right_on=("p_partkey",),
        )

        def split(df: pd.DataFrame) -> pd.DataFrame:
            promo = df["p_type"].to_numpy() == "PROMO"
            rev = df["rev"].to_numpy()
            return pd.DataFrame({"promo_rev": [rev[promo].sum()],
                                 "total_rev": [rev.sum()]})

        parts = joined.map_batches(split, batch_format="pandas")

    from ray.data.aggregate import Sum

    sums = parts.aggregate(Sum("promo_rev"), Sum("total_rev"))
    pct = 100.0 * sums["sum(promo_rev)"] / sums["sum(total_rev)"]
    return pd.DataFrame(
        {"promo_revenue_pct": [round_series(pd.Series([pct]), 6).iloc[0]]})


def large_orders_q18(sf_dir: str, min_qty: float = 150.0, k: int = 100):
    """TPC-H q18 analogue: orders whose total line-item quantity exceeds
    min_qty, with order metadata; top-k by quantity.

    Shape: partial+bucketed sum of quantity per orderkey, HAVING filter
    inside the reduce output, then top-k ON THE AGGREGATE -- the
    orderkey is the orders PK, so sort+limit commutes with the inner
    join and only k rows ever need order metadata. The metadata attach
    is a pushed-down parquet point read (k keys) rather than a
    fact-sized hash join.

    Output: (o_orderkey, o_custkey, o_totalprice, total_qty r2).
    """
    import ray.data as rd
    import pyarrow.parquet as pq

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_quantity"])
    qty = grouped_agg(li, ["l_orderkey"], {"total_qty": ("l_quantity", "sum")})

    def having(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["total_qty"] > min_qty].copy()
        df["total_qty"] = round_series(df["total_qty"], 2)
        return df

    topk = (qty.map_batches(having, batch_format="pandas")
               .sort(["total_qty", "l_orderkey"], descending=[True, False])
               .limit(k)
               # bound: limit(k)
               .to_pandas())  # k rows

    keys = topk["l_orderkey"].tolist()
    meta = pq.read_table(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_totalprice"],
        filters=[("o_orderkey", "in", keys)],
    # bound: point-read of the k winning order keys
    ).to_pandas()
    out = (topk.rename(columns={"l_orderkey": "o_orderkey"})
               .merge(meta, on="o_orderkey", how="inner"))
    return (out[["o_orderkey", "o_custkey", "o_totalprice", "total_qty"]]
            .sort_values(["total_qty", "o_orderkey"], ascending=[False, True])
            .reset_index(drop=True))


def user_event_pivot(sf_dir: str):
    """Pivot: per-user event counts spread into one column per event
    type (the 5 types are a FIXED schema, not data-driven). Pure
    partial+reduce -- boolean indicator sums inside map_batches, one
    bucketed keyed reduce.

    Output: (user_id, n_click, n_error, n_purchase, n_signup, n_view,
    n_total).
    """
    import ray.data as rd

    types = ["click", "error", "purchase", "signup", "view"]
    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "event_type"])

    def indicators(df: pd.DataFrame) -> pd.DataFrame:
        et = df["event_type"].to_numpy()
        out = pd.DataFrame({"user_id": df["user_id"].to_numpy()})
        for t in types:
            out[f"n_{t}"] = (et == t).astype(np.int64)
        out["n_total"] = np.int64(1)
        return out

    prepped = ev.map_batches(indicators, batch_format="pandas", batch_size=131072)
    spec = {f"n_{t}": (f"n_{t}", "sum") for t in types}
    spec["n_total"] = ("n_total", "sum")
    agg = grouped_agg(prepped, ["user_id"], spec)

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        for c in df.columns:
            if c != "user_id":
                df[c] = df[c].astype("int64")
        return df[["user_id"] + [f"n_{t}" for t in types] + ["n_total"]]

    return agg.map_batches(finish, batch_format="pandas")


def revenue_rollup(sf_dir: str):
    """GROUP BY ROLLUP(region, nation): per-(region, nation) revenue plus
    per-region subtotals and a grand total, with 'ALL' as the rollup
    marker. The fact scan aggregates to the (region, nation) grain
    distributed (broadcast dims + partial/bucketed reduce); subtotals
    derive from that ~25-row aggregate on the driver -- rollup levels of
    a small key space never justify extra shuffles.

    Output: (r_name, n_name, revenue r2).
    """
    import ray
    import ray.data as rd
    import pyarrow.parquet as pq

    sup = pq.read_table(f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"])
    nat = pq.read_table(f"{sf_dir}/nation.parquet",
                        columns=["n_nationkey", "n_name", "n_regionkey"])
    reg = pq.read_table(f"{sf_dir}/region.parquet", columns=["r_regionkey", "r_name"])
    from ..functions.lookup import VecLookup

    n2name = dict(zip(nat.column("n_nationkey").to_pylist(), nat.column("n_name").to_pylist()))
    n2r = dict(zip(nat.column("n_nationkey").to_pylist(), nat.column("n_regionkey").to_pylist()))
    r2name = dict(zip(reg.column("r_regionkey").to_pylist(), reg.column("r_name").to_pylist()))
    # int nationkey through the shuffle; names attach at the 25-row grain
    lut_ref = ray.put(VecLookup(
        sup.column("s_suppkey").to_numpy(zero_copy_only=False),
        sup.column("s_nationkey").to_numpy(zero_copy_only=False)))

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_suppkey", "l_extendedprice", "l_discount"])

    def prep(df: pd.DataFrame) -> pd.DataFrame:
        lut: VecLookup = ray.get(lut_ref)
        nkey, _ = lut.lookup(df["l_suppkey"].to_numpy())
        return pd.DataFrame({
            "n_key": nkey,
            "rev": (df["l_extendedprice"] * (1.0 - df["l_discount"])).to_numpy(),
        })

    base = grouped_agg(
        li.map_batches(prep, batch_format="pandas", batch_size=131072),
        ["n_key"], {"revenue": ("rev", "sum")}, n_buckets=8,
    # bound: nation grain
    ).to_pandas()  # ~|nation| rows: the rollup grain, not the fact table
    base["r_name"] = base["n_key"].map(lambda n: r2name[n2r[int(n)]])
    base["n_name"] = base["n_key"].map(n2name)
    base = base[["r_name", "n_name", "revenue"]]

    region = base.groupby("r_name", as_index=False)["revenue"].sum()
    region["n_name"] = "ALL"
    total = pd.DataFrame({"r_name": ["ALL"], "n_name": ["ALL"],
                          "revenue": [base["revenue"].sum()]})
    out = pd.concat([base, region, total], ignore_index=True)
    out["revenue"] = round_series(out["revenue"], 2)
    return (out[["r_name", "n_name", "revenue"]]
            .sort_values(["r_name", "n_name"]).reset_index(drop=True))


def events_value_histogram(sf_dir: str, bin_width: float = 25.0):
    """Fixed-width histogram of the event value distribution: bins of
    ``bin_width`` keyed by floor(value / width) * width. Pure
    partial+reduce; the histogram itself is the (tiny) shuffle payload.

    Output: (bin_start, n_events, sum_value r2).
    """
    import ray.data as rd

    ev = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["value"])

    def binit(df: pd.DataFrame) -> pd.DataFrame:
        v = df["value"].to_numpy()
        return pd.DataFrame({"bin_start": np.floor(v / bin_width) * bin_width,
                             "value": v})

    binned = ev.map_batches(binit, batch_format="pandas", batch_size=131072)
    agg = grouped_agg(binned, ["bin_start"],
                      {"n_events": ("value", "size"), "sum_value": ("value", "sum")},
                      n_buckets=8)

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        df["n_events"] = df["n_events"].astype("int64")
        df["sum_value"] = round_series(df["sum_value"], 2)
        return df[["bin_start", "n_events", "sum_value"]]

    return agg.map_batches(finish, batch_format="pandas")


def events_props_stats(sf_dir: str):
    """Semi-structured extraction: parse the JSON ``props`` payload,
    pull the integer field ``k``, aggregate per event type. The parse is
    a vectorized C-regex extract (pandas ``str.extract``) -- the props
    schema here is flat {"k": int}; swap in a real JSON kernel
    (pyarrow/simdjson) for nested payloads, the pipeline shape stays.

    Output: (event_type, n_events, sum_k, min_k, max_k).
    """
    import ray.data as rd

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "props"])

    def extract(df: pd.DataFrame) -> pd.DataFrame:
        k = df["props"].str.extract(r'"k"\s*:\s*(-?\d+)', expand=False)
        return pd.DataFrame({
            "event_type": df["event_type"].to_numpy(),
            "k": k.astype("int64").to_numpy(),
        })

    parsed = ev.map_batches(extract, batch_format="pandas", batch_size=131072)
    agg = grouped_agg(parsed, ["event_type"],
                      {"n_events": ("k", "size"), "sum_k": ("k", "sum"),
                       "min_k": ("k", "min"), "max_k": ("k", "max")},
                      n_buckets=8)

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        for c in ("n_events", "sum_k", "min_k", "max_k"):
            df[c] = df[c].astype("int64")
        return df[["event_type", "n_events", "sum_k", "min_k", "max_k"]]

    return agg.map_batches(finish, batch_format="pandas")


def lapsed_customers_except(sf_dir: str):
    """Set difference (EXCEPT): customers who ordered in 1996 but not in
    1997. Both sides reduce to distinct keys via the partial+bucketed
    combiner (year flags aggregated per custkey in ONE pass over orders,
    no self-join, no second scan), so the "except" is a vectorized flag
    test inside the reduce.

    Output: (o_custkey,).
    """
    import ray.data as rd

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_custkey", "o_orderdate"])
    lo96 = np.datetime64("1996-01-01", "us")
    lo97 = np.datetime64("1997-01-01", "us")
    lo98 = np.datetime64("1998-01-01", "us")

    def flags(df: pd.DataFrame) -> pd.DataFrame:
        od = np.asarray(df["o_orderdate"], dtype="datetime64[us]")
        return pd.DataFrame({
            "o_custkey": df["o_custkey"].to_numpy(),
            "in96": ((od >= lo96) & (od < lo97)).astype(np.int64),
            "in97": ((od >= lo97) & (od < lo98)).astype(np.int64),
        })

    prepped = orders.map_batches(flags, batch_format="pandas", batch_size=131072)
    agg = grouped_agg(prepped, ["o_custkey"],
                      {"n96": ("in96", "sum"), "n97": ("in97", "sum")})

    def except_filter(df: pd.DataFrame) -> pd.DataFrame:
        keep = (df["n96"].to_numpy() > 0) & (df["n97"].to_numpy() == 0)
        return df.loc[keep, ["o_custkey"]]

    return agg.map_batches(except_filter, batch_format="pandas")


def customer_rank_in_nation(sf_dir: str, n_buckets: int = 16):
    """Per-group window rank: customers ranked inside their nation by
    account balance (desc, custkey tie-break). Bucketed keyed shuffle on
    the partition key + one vectorized groupby-cumcount per bucket.

    Output: (c_custkey, c_nationkey, rk).
    """
    import ray.data as rd

    cust = rd.read_parquet(f"{sf_dir}/customer.parquet",
                           columns=["c_custkey", "c_nationkey", "c_acctbal"])

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        h = df["c_nationkey"].to_numpy(dtype=np.int64).astype(np.uint64)
        with np.errstate(over="ignore"):
            h = h * np.uint64(0x9E3779B97F4A7C15)
            h ^= h >> np.uint64(29)
        df["bucket"] = (h % np.uint64(n_buckets)).astype(np.int32)
        return df

    def rank_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["c_nationkey", "c_acctbal", "c_custkey"],
                            ascending=[True, False, True])
        rk = df.groupby("c_nationkey", sort=False).cumcount() + 1
        return pd.DataFrame({
            "c_custkey": df["c_custkey"].to_numpy(),
            "c_nationkey": df["c_nationkey"].to_numpy(),
            "rk": rk.to_numpy(dtype=np.int64),
        })

    bucketed = cust.map_batches(add_bucket, batch_format="pandas",
                                batch_size=131072)
    return bucketed.groupby("bucket").map_groups(rank_bucket, batch_format="pandas")


def active_both_years_intersect(sf_dir: str):
    """Set intersection (INTERSECT): customers who ordered in BOTH 1996
    and 1997 -- same one-pass year-flag combiner as
    ``lapsed_customers_except``, different flag test in the reduce.

    Output: (o_custkey,).
    """
    import ray.data as rd

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_custkey", "o_orderdate"])
    lo96 = np.datetime64("1996-01-01", "us")
    lo97 = np.datetime64("1997-01-01", "us")
    lo98 = np.datetime64("1998-01-01", "us")

    def flags(df: pd.DataFrame) -> pd.DataFrame:
        od = np.asarray(df["o_orderdate"], dtype="datetime64[us]")
        return pd.DataFrame({
            "o_custkey": df["o_custkey"].to_numpy(),
            "in96": ((od >= lo96) & (od < lo97)).astype(np.int64),
            "in97": ((od >= lo97) & (od < lo98)).astype(np.int64),
        })

    prepped = orders.map_batches(flags, batch_format="pandas", batch_size=131072)
    agg = grouped_agg(prepped, ["o_custkey"],
                      {"n96": ("in96", "sum"), "n97": ("in97", "sum")})

    def both(df: pd.DataFrame) -> pd.DataFrame:
        keep = (df["n96"].to_numpy() > 0) & (df["n97"].to_numpy() > 0)
        return df.loc[keep, ["o_custkey"]]

    return agg.map_batches(both, batch_format="pandas")


def events_moving_avg(sf_dir: str, window: int = 3, n_buckets: int = 64):
    """Framed window function: per-user moving average of ``value`` over
    the current + 2 preceding events ((ts, event_id) order). Same
    bucketed-partition pattern as the other window kernels; the rolling
    mean is one vectorized pandas groupby-rolling per bucket.

    Output: (event_id, user_id, mavg r6).
    """
    import ray.data as rd

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "ts", "user_id", "value"])

    def mavg_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"])
        m = (df.groupby("user_id", sort=False)["value"]
               .rolling(window, min_periods=1).mean()
               .reset_index(drop=True))
        return pd.DataFrame({
            "event_id": df["event_id"].to_numpy(),
            "user_id": df["user_id"].to_numpy(),
            "mavg": round_series(m, 6).to_numpy(),
        })

    bucketed = ev.map_batches(
        lambda df: _user_bucket(df, "user_id", n_buckets),
        batch_format="pandas", batch_size=131072,
    )
    return bucketed.groupby("bucket").map_groups(mavg_bucket, batch_format="pandas")


def events_outliers_zscore(sf_dir: str, z: float = 3.0):
    """Two-pass normalized filter: per-type mean/stddev (combiner agg on
    sum/sumsq), broadcast the 5-row stats, then one streaming pass keeps
    events with |value - mu| > z * sigma.

    Output: (event_id, event_type, value, zscore r6).
    """
    import ray
    import ray.data as rd

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "event_type", "value"])

    def moments(df: pd.DataFrame) -> pd.DataFrame:
        # pre-reduce inside the batch: the partial is <=5 rows (one per
        # event type), so the global reduce is a driver concat+groupby
        # over n_batches*5 rows -- no shuffle for this grain
        v = df["value"].to_numpy()
        return (pd.DataFrame({"event_type": df["event_type"].to_numpy(),
                              "n": np.int64(1), "s1": v, "s2": v * v})
                .groupby("event_type", as_index=False)
                .agg(n=("n", "sum"), s1=("s1", "sum"), s2=("s2", "sum")))

    agg = (ev.map_batches(moments, batch_format="pandas", batch_size=131072)
             # bound: event_type grain (combiner-reduced moments)
             .to_pandas()
             .groupby("event_type", as_index=False)
             .agg(n=("n", "sum"), s1=("s1", "sum"), s2=("s2", "sum")))
    n = agg["n"].to_numpy(dtype=np.float64)
    mu = agg["s1"].to_numpy() / n
    # sample variance from the merged moments (ddof=1, like stddev_samp)
    var = (agg["s2"].to_numpy() - n * mu * mu) / (n - 1.0)
    stats = {t: (m, float(np.sqrt(v)))
             for t, m, v in zip(agg["event_type"], mu, var)}
    stats_ref = ray.put(stats)

    def keep_outliers(df: pd.DataFrame) -> pd.DataFrame:
        st = ray.get(stats_ref)
        mus = df["event_type"].map(lambda t: st[t][0]).to_numpy()
        sds = df["event_type"].map(lambda t: st[t][1]).to_numpy()
        zs = (df["value"].to_numpy() - mus) / sds
        keep = np.abs(zs) > z
        out = df.loc[keep, ["event_id", "event_type", "value"]].copy()
        out["zscore"] = round_series(pd.Series(zs[keep]), 6).to_numpy()
        return out

    return ev.map_batches(keep_outliers, batch_format="pandas", batch_size=131072)


def small_quantity_revenue_q17(sf_dir: str, broadcast_rows: int = 20_000_000):
    """TPC-H q17 analogue (correlated aggregate subquery): average
    yearly revenue lost if small orders (quantity below 20% of the
    part's average quantity) weren't filled.

    Pass 1 computes avg(l_quantity) per partkey with the combiner agg;
    under the gate those per-part thresholds broadcast as a float
    VecLookup and pass 2 is one streaming filter+sum over lineitem.
    Above the gate the thresholds hash-join back instead. The correlated
    subquery never becomes a self-join either way.

    Output: one row (avg_yearly r2).
    """
    import ray
    import ray.data as rd
    import pyarrow.parquet as pq

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_partkey", "l_quantity", "l_extendedprice"])

    per_part = grouped_agg(li, ["l_partkey"],
                           {"s_qty": ("l_quantity", "sum"),
                            "n_qty": ("l_quantity", "size")})

    def thresholds(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "l_partkey": df["l_partkey"].to_numpy(),
            "thresh": 0.2 * df["s_qty"].to_numpy() / df["n_qty"].to_numpy(),
        })

    thr = per_part.map_batches(thresholds, batch_format="pandas")

    n_parts = pq.ParquetFile(f"{sf_dir}/part.parquet").metadata.num_rows
    if n_parts <= broadcast_rows:
        from ..functions.lookup import VecLookup

        # bound: one row per partkey, inside the broadcast_rows gate
        tdf = thr.to_pandas()  # one row per partkey, gated
        lut_ref = ray.put(VecLookup(tdf["l_partkey"].to_numpy(),
                                    tdf["thresh"].to_numpy()))

        def small_rev(df: pd.DataFrame) -> pd.DataFrame:
            lut: VecLookup = ray.get(lut_ref)
            t, found = lut.lookup(df["l_partkey"].to_numpy())
            keep = found & (df["l_quantity"].to_numpy() < t)
            return pd.DataFrame(
                {"rev": [df["l_extendedprice"].to_numpy()[keep].sum()]})

        parts = li.map_batches(small_rev, batch_format="pandas",
                               batch_size=131072)
    else:
        joined = li.join(
            thr, join_type="inner", num_partitions=_join_partitions(n_parts),
            on=("l_partkey",), right_on=("l_partkey",),
        )

        def small_rev_join(df: pd.DataFrame) -> pd.DataFrame:
            keep = df["l_quantity"].to_numpy() < df["thresh"].to_numpy()
            return pd.DataFrame(
                {"rev": [df["l_extendedprice"].to_numpy()[keep].sum()]})

        parts = joined.map_batches(small_rev_join, batch_format="pandas")

    total = parts.sum("rev")
    return pd.DataFrame(
        {"avg_yearly": [round_series(pd.Series([total / 7.0]), 2).iloc[0]]})


def returned_item_report_q10(sf_dir: str, k: int = 20,
                             broadcast_rows: int = 20_000_000):
    """TPC-H q10 analogue: customers ranked by revenue lost to returned
    items (l_returnflag = 'R'). lineitem filters and
    pre-aggregates to one revenue row per orderkey; the orderkey ->
    custkey hop and the customer name attach both ride ``Dataset.join``
    (both sides keyed, customer a growing dimension); final sort+limit.

    Under the gate, the orderkey -> custkey hop is a broadcast VecLookup
    folded into the SAME pass that filters returnflag (so revenue
    aggregates per custkey in one shuffle-free partial + one tiny keyed
    reduce); customer names attach to only the k winners via a
    pushed-down parquet point read. Above the gate: two hash joins.

    Float-tree note: the broadcast path aggregates per custkey directly
    (combiner partials), the join path per orderkey then custkey; both
    stay within the 1e-12 band the r2 rounding absorbs.

    Output: (c_custkey, c_name, revenue r2).
    """
    import ray
    import ray.data as rd
    import pyarrow.parquet as pq

    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_returnflag", "l_extendedprice", "l_discount"],
    )
    n_orders = pq.ParquetFile(f"{sf_dir}/orders.parquet").metadata.num_rows

    if n_orders <= broadcast_rows:
        from ..functions.lookup import VecLookup

        ot = pq.read_table(f"{sf_dir}/orders.parquet",
                           columns=["o_orderkey", "o_custkey"])
        lut_ref = ray.put(VecLookup(
            ot.column("o_orderkey").to_numpy(zero_copy_only=False),
            ot.column("o_custkey").to_numpy(zero_copy_only=False)))

        def returned_cust(df: pd.DataFrame) -> pd.DataFrame:
            lut: VecLookup = ray.get(lut_ref)
            m = df["l_returnflag"].to_numpy() == "R"
            ck, found = lut.lookup(df["l_orderkey"].to_numpy()[m])
            rev = (df["l_extendedprice"].to_numpy()[m]
                   * (1.0 - df["l_discount"].to_numpy()[m]))
            return pd.DataFrame({"o_custkey": ck[found], "rev": rev[found]})

        per_cust = grouped_agg(
            li.map_batches(returned_cust, batch_format="pandas",
                           batch_size=131072),
            ["o_custkey"], {"revenue": ("rev", "sum")},
        )

        def rounded(df: pd.DataFrame) -> pd.DataFrame:
            df["revenue"] = round_series(df["revenue"], 2)
            return df

        topk = (per_cust.map_batches(rounded, batch_format="pandas")
                        .sort(["revenue", "o_custkey"],
                              descending=[True, False])
                        # bound: limit(k)
                        .limit(k).to_pandas())
        names = pq.read_table(
            f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_name"],
            filters=[("c_custkey", "in", topk["o_custkey"].tolist())],
        # bound: point-read of the k winning customers
        ).to_pandas()
        out = (topk.rename(columns={"o_custkey": "c_custkey"})
                   .merge(names, on="c_custkey", how="inner"))
        return (out[["c_custkey", "c_name", "revenue"]]
                .sort_values(["revenue", "c_custkey"], ascending=[False, True])
                .reset_index(drop=True))

    def returned(df: pd.DataFrame) -> pd.DataFrame:
        m = df["l_returnflag"].to_numpy() == "R"
        return pd.DataFrame({
            "l_orderkey": df["l_orderkey"].to_numpy()[m],
            "rev": (df["l_extendedprice"].to_numpy()[m]
                    * (1.0 - df["l_discount"].to_numpy()[m])),
        })

    per_order = grouped_agg(
        li.map_batches(returned, batch_format="pandas", batch_size=131072),
        ["l_orderkey"], {"rev": ("rev", "sum")},
    )

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_custkey"])
    with_cust = per_order.join(
        orders, join_type="inner", num_partitions=_join_partitions(n_orders),
        on=("l_orderkey",), right_on=("o_orderkey",),
    )
    per_cust = grouped_agg(with_cust, ["o_custkey"], {"revenue": ("rev", "sum")})

    cust = rd.read_parquet(f"{sf_dir}/customer.parquet",
                           columns=["c_custkey", "c_name"])
    n_cust = pq.ParquetFile(f"{sf_dir}/customer.parquet").metadata.num_rows
    named = per_cust.join(
        cust, join_type="inner", num_partitions=_join_partitions(n_cust),
        on=("o_custkey",), right_on=("c_custkey",),
    )

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        df = df.rename(columns={"o_custkey": "c_custkey"})
        df["revenue"] = round_series(df["revenue"], 2)
        return df[["c_custkey", "c_name", "revenue"]]

    return (named.map_batches(finish, batch_format="pandas")
                 .sort(["revenue", "c_custkey"], descending=[True, False])
                 .limit(k))


def discounted_brand_revenue_q19(sf_dir: str):
    """TPC-H q19 analogue (disjunctive predicate join): revenue from
    line items matching EITHER (small Brand#1 parts, qty < 15) OR
    (mid-size Brand#2 parts, qty >= 15). The part predicate evaluates
    VECTORIZED against a broadcast (partkey -> class) VecLookup built
    from two pruned column reads; lineitem streams once, no shuffle but
    the final 1-row sum.

    Output: one row (revenue r2).
    """
    import ray
    import ray.data as rd
    import pyarrow.parquet as pq

    from ..functions.lookup import VecLookup

    pt = pq.read_table(f"{sf_dir}/part.parquet",
                       columns=["p_partkey", "p_brand", "p_size"])
    # bound: 3-col part dim build side; swap to the hash-join variant (see brand_revenue_hhi) above a broadcast gate
    brand = pt.column("p_brand").to_pandas().to_numpy()
    size = pt.column("p_size").to_numpy(zero_copy_only=False)
    # class 1: Brand#1, size 1..10; class 2: Brand#2, size 11..30
    cls = np.where((brand == "Brand#1") & (size >= 1) & (size <= 10), 1,
                   np.where((brand == "Brand#2") & (size >= 11) & (size <= 30),
                            2, 0)).astype(np.int64)
    lut_ref = ray.put(VecLookup(
        pt.column("p_partkey").to_numpy(zero_copy_only=False), cls))

    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_quantity", "l_extendedprice", "l_discount"],
    )

    def match(df: pd.DataFrame) -> pd.DataFrame:
        lut: VecLookup = ray.get(lut_ref)
        c, found = lut.lookup(df["l_partkey"].to_numpy())
        qty = df["l_quantity"].to_numpy()
        keep = found & (((c == 1) & (qty < 15)) | ((c == 2) & (qty >= 15)))
        rev = (df["l_extendedprice"].to_numpy()[keep]
               * (1.0 - df["l_discount"].to_numpy()[keep]))
        return pd.DataFrame({"rev": [rev.sum()]})

    total = li.map_batches(match, batch_format="pandas", batch_size=131072).sum("rev")
    return pd.DataFrame({"revenue": [round_series(pd.Series([total]), 2).iloc[0]]})


def customer_acctbal_cume(sf_dir: str, n_buckets: int = 16):
    """Distribution window functions: percent_rank and cume_dist of each
    customer's balance WITHIN its nation. Same bucketed-partition kernel
    as the rank query; both statistics are closed-form from the sorted
    position and group size, so ties use the SQL definitions exactly
    (percent_rank on rank-of-first-peer, cume_dist on rank-of-last-peer).

    Output: (c_custkey, c_nationkey, pct_rank r6, cume r6).
    """
    import ray.data as rd

    cust = rd.read_parquet(f"{sf_dir}/customer.parquet",
                           columns=["c_custkey", "c_nationkey", "c_acctbal"])

    def dist_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["c_nationkey", "c_acctbal"])
        g = df.groupby("c_nationkey", sort=False)
        n = g["c_acctbal"].transform("size").to_numpy(dtype=np.float64)
        # rank of first peer (SQL RANK) and of last peer, tie-aware
        rk_min = g["c_acctbal"].rank(method="min").to_numpy()
        rk_max = g["c_acctbal"].rank(method="max").to_numpy()
        pct = np.where(n > 1, (rk_min - 1.0) / (n - 1.0), 0.0)
        cume = rk_max / n
        return pd.DataFrame({
            "c_custkey": df["c_custkey"].to_numpy(),
            "c_nationkey": df["c_nationkey"].to_numpy(),
            "pct_rank": round_series(pd.Series(pct), 6).to_numpy(),
            "cume": round_series(pd.Series(cume), 6).to_numpy(),
        })

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        h = df["c_nationkey"].to_numpy(dtype=np.int64).astype(np.uint64)
        with np.errstate(over="ignore"):
            h = h * np.uint64(0x9E3779B97F4A7C15)
            h ^= h >> np.uint64(29)
        df["bucket"] = (h % np.uint64(n_buckets)).astype(np.int32)
        return df

    return (cust.map_batches(add_bucket, batch_format="pandas", batch_size=131072)
                .groupby("bucket").map_groups(dist_bucket, batch_format="pandas"))


def order_rank_windows(sf_dir: str, n_buckets: int = 64, tiles: int = 4):
    """Three window functions in one per-customer pass: dense_rank over
    order priority, NTILE(tiles) over order date, and LEAD(orderdate)
    (epoch seconds, -1 for the last order -- COALESCE'd the same way in
    the oracle).

    Shape: one bucketed keyed shuffle on o_custkey, then fully
    vectorized per-bucket numpy (cumsum'd change-flags for dense_rank,
    np.repeat'd tile sizes for NTILE, shift for LEAD).

    Output: (o_orderkey, o_custkey, drk, quartile, next_orderdate_s).
    """
    import ray.data as rd

    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderpriority", "o_orderdate"],
    )

    def win(df: pd.DataFrame) -> pd.DataFrame:
        # dense_rank: sort by (cust, priority); ntile/lead: by (cust, date, key)
        d = df.sort_values(["o_custkey", "o_orderpriority", "o_orderkey"])
        cust = d["o_custkey"].to_numpy()
        prio = d["o_orderpriority"].to_numpy()
        new_cust = np.empty(len(d), dtype=bool)
        new_cust[0] = True
        new_cust[1:] = cust[1:] != cust[:-1]
        new_prio = np.empty(len(d), dtype=bool)
        new_prio[0] = True
        new_prio[1:] = (prio[1:] != prio[:-1]) | new_cust[1:]
        grp_start = np.flatnonzero(new_cust)
        drk = np.cumsum(new_prio)
        # reset the cumsum at each customer boundary
        base = np.zeros(len(d), dtype=np.int64)
        base[grp_start] = drk[grp_start] - 1
        base = np.maximum.accumulate(base)
        d = d.assign(drk=(drk - base).astype(np.int64))

        d = d.sort_values(["o_custkey", "o_orderdate", "o_orderkey"])
        cust = d["o_custkey"].to_numpy()
        starts = np.flatnonzero(np.concatenate(([True], cust[1:] != cust[:-1])))
        sizes = np.diff(np.append(starts, len(d)))
        # SQL NTILE closed form (first n%k tiles get one extra row),
        # fully vectorized: r = row index within customer, n = group size
        n_grp = np.repeat(sizes, sizes)
        r_in = np.arange(len(d)) - np.repeat(starts, sizes)
        big = n_grp % tiles
        size_big = n_grp // tiles + 1
        cut = big * size_big
        small = np.maximum(n_grp // tiles, 1)
        quart = np.where(r_in < cut,
                         r_in // size_big + 1,
                         big + (r_in - cut) // small + 1).astype(np.int64)
        od = _epoch_seconds_np(d["o_orderdate"])
        nxt = np.empty(len(d), dtype=np.int64)
        nxt[:-1] = od[1:]
        nxt[-1] = -1
        last_of_cust = np.concatenate((cust[1:] != cust[:-1], [True]))
        nxt[last_of_cust] = -1
        return pd.DataFrame({
            "o_orderkey": d["o_orderkey"].to_numpy(),
            "o_custkey": d["o_custkey"].to_numpy(),
            "drk": d["drk"].to_numpy(),
            "quartile": quart,
            "next_orderdate_s": nxt,
        })

    bucketed = orders.map_batches(
        lambda df: _user_bucket(df, "o_custkey", n_buckets),
        batch_format="pandas", batch_size=131072)
    return bucketed.groupby("bucket").map_groups(win, batch_format="pandas")


def _epoch_seconds_np(series: pd.Series) -> np.ndarray:
    return np.asarray(series, dtype="datetime64[s]").astype(np.int64)


def doc_unigram_logprob(sf_dir: str):
    """Unigram language-model score per document: the average token
    log-probability under the corpus's own unigram distribution,
    ROUND(SUM(tf * ln(cnt)) / SUM(tf) - ln(total), 6) -- the exact
    algebra the oracle uses, so float trees agree to the rounding digit.

    Shape: exploded (doc, term, tf) rows hash-join the combiner-reduced
    global term counts (vocabulary can be huge -> a real join, not a
    broadcast), then ONE per-doc combiner pass. The scalar ln(total)
    is driver-side.

    Output: (doc_id, n_tokens, logprob r6) sorted by doc_id.
    """
    import ray
    import ray.data as rd

    from ..stages.agg import grouped_agg

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def counts(batch) -> pd.DataFrame:
        df = batch.to_pandas() if not isinstance(batch, pd.DataFrame) else batch
        ex = (df.assign(term=df["text"].str.split(" "))
              .loc[:, ["doc_id", "term"]].explode("term"))
        ex = ex[ex["term"] != ""]
        return (ex.groupby(["doc_id", "term"], as_index=False, sort=False)
                .agg(tf=("term", "size")))

    toks = ds.map_batches(counts, batch_format="pyarrow", batch_size=8192)
    vocab = grouped_agg(toks, ["term"], {"cnt": ("tf", "sum")}, n_buckets=16)
    total = int(vocab.sum("cnt"))

    cpus = int(ray.cluster_resources().get("CPU", 4)) if ray.is_initialized() else 4
    joined = toks.join(vocab, join_type="inner",
                       num_partitions=max(2, cpus // 2), on=("term",))

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        tf = df["tf"].to_numpy(dtype=np.float64)
        cnt = df["cnt"].to_numpy(dtype=np.float64)
        return pd.DataFrame({"doc_id": df["doc_id"].to_numpy(),
                             "wsum": tf * np.log(cnt),
                             "ntok": df["tf"].to_numpy(dtype=np.int64)})

    agg = grouped_agg(joined.map_batches(partial, batch_format="pandas"),
                      ["doc_id"], {"wsum": ("wsum", "sum"),
                                   "ntok": ("ntok", "sum")})

    ln_total = float(np.log(float(total)))

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        lp = df["wsum"].to_numpy() / df["ntok"].to_numpy(dtype=np.float64) - ln_total
        return pd.DataFrame({"doc_id": df["doc_id"].astype("int64"),
                             "n_tokens": df["ntok"].astype("int64"),
                             "logprob": round_series(pd.Series(lp), 6)})

    return agg.map_batches(finish, batch_format="pandas").sort("doc_id")


def events_funnel(sf_dir: str, n_buckets: int = 64,
                  start: str = "signup", goal: str = "purchase"):
    """Two-step funnel: for every user with a ``start`` event, the first
    ``goal`` event at or after their first ``start``.

    Shape: the event log is filtered to the two funnel steps at the
    batch level (a tiny fraction of the stream), then ONE bucketed keyed
    shuffle on user_id and a vectorized per-bucket kernel (groupby-min
    for the start, a merge + groupby-min for the goal). No self-join of
    the full log, no driver materialization.

    Output: (user_id, signup_ts_us, first_purchase_us [-1 if never],
    converted 0/1) sorted by user_id.
    """
    import ray.data as rd

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts", "event_type"])

    def prefilter(df: pd.DataFrame) -> pd.DataFrame:
        return df[df["event_type"].isin((start, goal))]

    def funnel(df: pd.DataFrame) -> pd.DataFrame:
        ts_us = np.asarray(df["ts"], dtype="datetime64[us]").astype(np.int64)
        d = pd.DataFrame({"user_id": df["user_id"].to_numpy(),
                          "ts_us": ts_us,
                          "event_type": df["event_type"].to_numpy()})
        s = (d[d["event_type"] == start]
             .groupby("user_id", as_index=False)["ts_us"].min()
             .rename(columns={"ts_us": "signup_ts_us"}))
        if s.empty:
            return pd.DataFrame({"user_id": pd.Series(dtype="int64"),
                                 "signup_ts_us": pd.Series(dtype="int64"),
                                 "first_purchase_us": pd.Series(dtype="int64"),
                                 "converted": pd.Series(dtype="int64")})
        g = d[d["event_type"] == goal].merge(s, on="user_id")
        g = g[g["ts_us"] >= g["signup_ts_us"]]
        p = (g.groupby("user_id", as_index=False)["ts_us"].min()
             .rename(columns={"ts_us": "first_purchase_us"}))
        out = s.merge(p, on="user_id", how="left")
        conv = out["first_purchase_us"].notna()
        out["first_purchase_us"] = (
            out["first_purchase_us"].fillna(-1).astype(np.int64))
        out["converted"] = conv.astype(np.int64)
        return out

    bucketed = (ev.map_batches(prefilter, batch_format="pandas",
                               batch_size=131072)
                  .map_batches(lambda df: _user_bucket(df, "user_id", n_buckets),
                               batch_format="pandas", batch_size=131072))
    return (bucketed.groupby("bucket")
                    .map_groups(funnel, batch_format="pandas")
                    .sort("user_id"))


def user_retention_weeks(sf_dir: str, n_buckets: int = 64):
    """Cohort retention triangle: users grouped by the week of their
    first event (cohort_week = epoch_us // 1 week), counted in every
    later week they were active (week_offset = active week - cohort).

    Shape: per-batch dedup to (user_id, week) slims the shuffle, one
    bucketed keyed shuffle on user_id computes each user's cohort and
    offsets locally (users never straddle buckets, so summing per-bucket
    partial counts is an EXACT distinct-user count), then a tiny
    grouped_agg over (cohort_week, week_offset).

    Output: (cohort_week, week_offset, n_users).
    """
    import ray.data as rd

    week_us = 7 * 24 * 3600 * 1_000_000

    ev = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id", "ts"])

    def to_weeks(df: pd.DataFrame) -> pd.DataFrame:
        week = (np.asarray(df["ts"], dtype="datetime64[us]").astype(np.int64)
                // week_us)
        return (pd.DataFrame({"user_id": df["user_id"].to_numpy(),
                              "week": week})
                .drop_duplicates())

    def cohort(df: pd.DataFrame) -> pd.DataFrame:
        d = df.drop_duplicates(["user_id", "week"])
        coh = d.groupby("user_id")["week"].transform("min")
        part = (pd.DataFrame({"cohort_week": coh.to_numpy(),
                              "week_offset": (d["week"] - coh).to_numpy()})
                .groupby(["cohort_week", "week_offset"], as_index=False)
                .agg(n_users=("week_offset", "size")))
        return part

    bucketed = (ev.map_batches(to_weeks, batch_format="pandas",
                               batch_size=131072)
                  .map_batches(lambda df: _user_bucket(df, "user_id", n_buckets),
                               batch_format="pandas", batch_size=131072))
    parts = bucketed.groupby("bucket").map_groups(cohort, batch_format="pandas")
    out = grouped_agg(parts, ["cohort_week", "week_offset"],
                      {"n_users": ("n_users", "sum")}, n_buckets=16)

    def cast(df: pd.DataFrame) -> pd.DataFrame:
        return df.astype({"cohort_week": "int64", "week_offset": "int64",
                          "n_users": "int64"})

    return (out.map_batches(cast, batch_format="pandas")
               .sort(["cohort_week", "week_offset"]))


def events_mad(sf_dir: str):
    """Robust per-type statistics: exact median and median absolute
    deviation of ``value`` per event_type (quantile_cont semantics --
    numpy linear interpolation).

    Grain is event_type (a handful of groups), so the per-group exact
    kernel is safe: each group must fit one task. For high-cardinality
    grains use the mergeable QuantileSketch path (events_value_quantiles)
    instead -- this operator is the exact-at-small-grain companion.

    Output: (event_type, med r6, mad r6, n).
    """
    import ray.data as rd

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "value"])

    def mad_of(group: pd.DataFrame) -> pd.DataFrame:
        v = group["value"].to_numpy(dtype=np.float64)
        med = float(np.quantile(v, 0.5))
        mad = float(np.quantile(np.abs(v - med), 0.5))
        return pd.DataFrame({
            "event_type": [group["event_type"].iloc[0]],
            "med": round_series(pd.Series([med]), 6),
            "mad": round_series(pd.Series([mad]), 6),
            "n": np.array([len(v)], dtype=np.int64),
        })

    return (ev.groupby("event_type")
              .map_groups(mad_of, batch_format="pandas")
              .sort("event_type"))


def orders_monthly_gapfill(sf_dir: str):
    """Monthly order volume as a GAP-FREE time series: months inside
    [first, last] with no orders appear with zero counts (the shape every
    monitoring/trend consumer needs). The fact reduces to one row per
    month via the partial+bucketed combiner; the gap-fill reindex runs on
    the driver over that tiny month grain (a few dozen rows however big
    the fact is).

    Output: (year, month, n_orders, revenue r2) sorted chronologically.
    """
    import ray.data as rd

    from ..stages.agg import grouped_agg

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderdate", "o_totalprice"])

    def to_month(df: pd.DataFrame) -> pd.DataFrame:
        dt = pd.DatetimeIndex(df["o_orderdate"])
        return pd.DataFrame({"mi": (dt.year * 12 + dt.month - 1).astype(np.int64),
                             "price": df["o_totalprice"].to_numpy()})

    monthly = grouped_agg(
        orders.map_batches(to_month, batch_format="pandas",
                           batch_size=131072),
        ["mi"], {"n_orders": ("price", "size"), "revenue": ("price", "sum")},
        # bound: month grain (calendar)
        n_buckets=8).to_pandas()

    full = pd.DataFrame({"mi": np.arange(monthly["mi"].min(),
                                         monthly["mi"].max() + 1)})
    out = full.merge(monthly, on="mi", how="left")
    return pd.DataFrame({
        "year": (out["mi"] // 12).astype("int64"),
        "month": (out["mi"] % 12 + 1).astype("int64"),
        "n_orders": out["n_orders"].fillna(0).astype("int64"),
        "revenue": round_series(out["revenue"].fillna(0.0), 2),
    }).sort_values(["year", "month"]).reset_index(drop=True)


def revenue_cube(sf_dir: str, broadcast_rows: int = 5_000_000):
    """GROUP BY CUBE(r_name, c_mktsegment) over order revenue: all four
    grains -- (region, segment), per-region, per-segment, grand total --
    with 'ALL' markers. Like ``revenue_rollup``, the fact scan reduces
    to the finest (region x segment) grain distributed (one pass with a
    gated customer->(region, segment) broadcast lut, hash-join path
    above the gate); the 3 coarser grains derive from that ~25-row
    aggregate on the driver.

    Output: (r_name, c_mktsegment, n_orders, revenue r2) sorted.
    """
    import pyarrow.parquet as pq
    import ray
    import ray.data as rd

    from ..functions.lookup import VecLookup

    nat = pq.read_table(f"{sf_dir}/nation.parquet",
                        columns=["n_nationkey", "n_regionkey"])
    reg = pq.read_table(f"{sf_dir}/region.parquet",
                        columns=["r_regionkey", "r_name"])
    n2r = dict(zip(nat.column("n_nationkey").to_pylist(),
                   nat.column("n_regionkey").to_pylist()))
    r2name = dict(zip(reg.column("r_regionkey").to_pylist(),
                      reg.column("r_name").to_pylist()))

    n_cust = pq.ParquetFile(f"{sf_dir}/customer.parquet").metadata.num_rows
    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_custkey", "o_totalprice"])

    segs = sorted(set(pq.read_table(
        f"{sf_dir}/customer.parquet",
        columns=["c_mktsegment"]).column("c_mktsegment").to_pylist()))
    seg_idx = {s: i for i, s in enumerate(segs)}

    if n_cust <= broadcast_rows:
        ct = pq.read_table(f"{sf_dir}/customer.parquet",
                           columns=["c_custkey", "c_nationkey", "c_mktsegment"])
        rkey = np.asarray([n2r[int(n)]
                           for n in ct.column("c_nationkey").to_pylist()],
                          dtype=np.int64)
        sidx = np.asarray([seg_idx[s]
                           for s in ct.column("c_mktsegment").to_pylist()],
                          dtype=np.int64)
        lut_ref = ray.put(VecLookup(
            ct.column("c_custkey").to_numpy(zero_copy_only=False),
            rkey * 64 + sidx))

        def prep(df: pd.DataFrame) -> pd.DataFrame:
            lut: VecLookup = ray.get(lut_ref)
            code, _ = lut.lookup(df["o_custkey"].to_numpy())
            return pd.DataFrame({"code": code,
                                 "one": np.ones(len(df), dtype=np.int64),
                                 "rev": df["o_totalprice"].to_numpy()})

        base = grouped_agg(
            orders.map_batches(prep, batch_format="pandas", batch_size=131072),
            ["code"], {"n_orders": ("one", "sum"), "revenue": ("rev", "sum")},
            # bound: order-priority code grain
            n_buckets=8).to_pandas()
        base["r_name"] = (base["code"] // 64).map(r2name)
        base["c_mktsegment"] = (base["code"] % 64).map(
            dict(enumerate(segs)))
    else:
        cust = rd.read_parquet(
            f"{sf_dir}/customer.parquet",
            columns=["c_custkey", "c_nationkey", "c_mktsegment"])
        joined = orders.join(cust, join_type="inner",
                             num_partitions=_join_partitions(n_cust),
                             on=("o_custkey",), right_on=("c_custkey",))

        def prep_j(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({
                "rkey": df["c_nationkey"].map(n2r).to_numpy(dtype=np.int64),
                "c_mktsegment": df["c_mktsegment"].to_numpy(),
                "one": np.ones(len(df), dtype=np.int64),
                "rev": df["o_totalprice"].to_numpy(),
            })

        base = grouped_agg(
            joined.map_batches(prep_j, batch_format="pandas"),
            ["rkey", "c_mktsegment"],
            {"n_orders": ("one", "sum"), "revenue": ("rev", "sum")},
            # bound: region x market-segment grain
            n_buckets=8).to_pandas()
        base["r_name"] = base["rkey"].map(r2name)

    base = base[["r_name", "c_mktsegment", "n_orders", "revenue"]]
    by_r = base.groupby("r_name", as_index=False).agg(
        n_orders=("n_orders", "sum"), revenue=("revenue", "sum"))
    by_r["c_mktsegment"] = "ALL"
    by_s = base.groupby("c_mktsegment", as_index=False).agg(
        n_orders=("n_orders", "sum"), revenue=("revenue", "sum"))
    by_s["r_name"] = "ALL"
    total = pd.DataFrame({"r_name": ["ALL"], "c_mktsegment": ["ALL"],
                          "n_orders": [base["n_orders"].sum()],
                          "revenue": [base["revenue"].sum()]})
    out = pd.concat([base, by_r, by_s, total], ignore_index=True)
    out["n_orders"] = out["n_orders"].astype("int64")
    out["revenue"] = round_series(out["revenue"], 2)
    return (out[["r_name", "c_mktsegment", "n_orders", "revenue"]]
            .sort_values(["r_name", "c_mktsegment"]).reset_index(drop=True))


def user_time_to_convert(sf_dir: str, n_buckets: int = 16):
    """Time-to-convert: per user, seconds from FIRST 'view' to FIRST
    'purchase' (users with both, purchase not before view).  Pure
    combiner shape -- two conditional MINs per user ride the same
    grouped reduce (sentinel int64-max for absent), so the event stream
    is scanned once and never re-shuffled beyond the tiny keyed reduce.

    Output: (user_id, secs_to_convert) sorted by user_id.
    """
    import ray.data as rd

    from ..stages.agg import grouped_agg

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "event_type", "ts"])
    SENT = np.iinfo(np.int64).max

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        ts_us = np.asarray(df["ts"], dtype="datetime64[us]").astype(np.int64)
        typ = df["event_type"].to_numpy()
        return pd.DataFrame({
            "user_id": df["user_id"].to_numpy(dtype=np.int64),
            "first_view": np.where(typ == "view", ts_us, SENT),
            "first_buy": np.where(typ == "purchase", ts_us, SENT),
        })

    agg = grouped_agg(
        ev.map_batches(partial, batch_format="pandas", batch_size=131072),
        ["user_id"],
        {"first_view": ("first_view", "min"),
         "first_buy": ("first_buy", "min")}, n_buckets=n_buckets)

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        fv = df["first_view"].to_numpy(dtype=np.int64)
        fb = df["first_buy"].to_numpy(dtype=np.int64)
        keep = (fv != SENT) & (fb != SENT) & (fb >= fv)
        secs = fb[keep] // 1_000_000 - fv[keep] // 1_000_000
        return pd.DataFrame({
            "user_id": df["user_id"].to_numpy(dtype=np.int64)[keep],
            "secs_to_convert": secs.astype(np.int64),
        })

    return agg.map_batches(finish, batch_format="pandas").sort("user_id")


def basket_part_pairs(sf_dir: str, k: int = 25, n_buckets: int = 64):
    """Market-basket association pairs: parts bought together in the
    same order, top-k by co-count, with support (n_ab / n_orders) and
    lift (n_ab * N / (n_a * n_b)) -- association-rule mining's counting
    core as a distributed pipeline.

    Shape: one bucketed keyed shuffle co-locates each ORDER's items
    (cross-batch order splits would silently undercount if pairs were
    generated per batch); per-bucket pair emission is combiner-reduced;
    marginals are a second tiny keyed reduce joined onto the k
    survivors on the driver (k rows).  Integer products, then one
    float division -- identical doubles in both engines.

    Output: (part_a, part_b, n_ab, support r6, lift r6) ranked by
    (n_ab desc, part_a, part_b), top k.
    """
    import ray.data as rd

    from ..functions.rounding import round_series
    from ..stages.agg import grouped_agg

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_partkey"])

    bucketed = li.map_batches(
        lambda df: _user_bucket(df, "l_orderkey", n_buckets),
        batch_format="pandas", batch_size=131072)

    def pair_part(df: pd.DataFrame) -> pd.DataFrame:
        # vectorized per-order pair generation: orders bucketed by
        # basket SIZE, then one triu broadcast per distinct size --
        # no Python loop over orders
        d = (df.drop_duplicates(["l_orderkey", "l_partkey"])
             .sort_values(["l_orderkey", "l_partkey"]))
        k = d["l_orderkey"].to_numpy(dtype=np.int64)
        p = d["l_partkey"].to_numpy(dtype=np.int64)
        starts = np.nonzero(np.concatenate(([True], k[1:] != k[:-1])))[0]
        sizes = np.diff(np.concatenate((starts, [len(k)])))
        out_a, out_b = [], []
        for s in np.unique(sizes):
            if s < 2:
                continue
            st = starts[sizes == s]
            mat = p[(st[:, None] + np.arange(s)[None, :])]
            ii, jj = np.triu_indices(int(s), k=1)
            out_a.append(mat[:, ii].ravel())
            out_b.append(mat[:, jj].ravel())
        if not out_a:
            return pd.DataFrame({"pa": pd.array([], dtype="int64"),
                                 "pb": pd.array([], dtype="int64"),
                                 "n_ab": pd.array([], dtype="int64")})
        part = pd.DataFrame({"pa": np.concatenate(out_a),
                             "pb": np.concatenate(out_b)})
        return (part.groupby(["pa", "pb"], as_index=False, sort=False)
                .agg(n_ab=("pa", "size")))

    pairs = grouped_agg(
        bucketed.groupby("bucket").map_groups(
            lambda df: pair_part(df.drop(columns=["bucket"])),
            batch_format="pandas"),
        ["pa", "pb"], {"n_ab": ("n_ab", "sum")}, n_buckets=32)

    def marg_part(df: pd.DataFrame) -> pd.DataFrame:
        d = df.drop_duplicates(["l_orderkey", "l_partkey"])
        g = d.groupby("l_partkey", sort=False).size()
        n_ord = d["l_orderkey"].nunique()
        return pd.DataFrame({"p": np.concatenate([
            g.index.to_numpy(dtype=np.int64), [-1]]),
            "n": np.concatenate([g.to_numpy(dtype=np.int64), [n_ord]])})

    marg = grouped_agg(
        bucketed.groupby("bucket").map_groups(
            lambda df: marg_part(df.drop(columns=["bucket"])),
            batch_format="pandas"),
        ["p"], {"n": ("n", "sum")}, n_buckets=8)

    top = (pairs.sort(["n_ab", "pa", "pb"], descending=[True, False, False])
           # bound: limit(k)
           .limit(k).to_pandas())
    need = set(top["pa"].astype(int)) | set(top["pb"].astype(int)) | {-1}
    m = marg.map_batches(
        lambda df: df[df["p"].isin(list(need))],
        # bound: marginals of the <= 2k parts named in the top-k pairs
        batch_format="pandas").to_pandas()
    n_orders = int(m.loc[m["p"] == -1, "n"].iloc[0])
    lut = dict(zip(m["p"].astype(int), m["n"].astype(int)))
    na = top["pa"].map(lut).to_numpy(dtype=np.int64)
    nb = top["pb"].map(lut).to_numpy(dtype=np.int64)
    n_ab = top["n_ab"].to_numpy(dtype=np.int64)
    return pd.DataFrame({
        "part_a": top["pa"].to_numpy(dtype=np.int64),
        "part_b": top["pb"].to_numpy(dtype=np.int64),
        "n_ab": n_ab,
        "support": round_series(pd.Series(n_ab / n_orders), 6).to_numpy(),
        "lift": round_series(
            pd.Series((n_ab * n_orders) / (na * nb)), 6).to_numpy(),
    })


def customer_rfm(sf_dir: str, n_buckets: int = 16):
    """RFM segmentation: per customer, recency (days from their last
    order to the corpus max), frequency (order count), monetary
    (integer CENTS -- floats never touch a threshold compare), each
    scored into quintiles 1-5 by quantile_disc (inverted-cdf order
    statistics), plus the concatenated segment code.

    Shape: one combiner reduce builds the per-customer (r, f, m) table;
    quintile thresholds come from mergeable HISTOGRAM CELLS (distinct
    values x counts -- the hist_length_quantiles trick; cents can be
    bucketed at web scale to bound cell count) -- no global sort; score
    assignment is a vectorized broadcast compare against 12 scalars.
    All-integer metrics keep both engines' thresholds and compares
    bitwise-identical.

    Output: (o_custkey, r_days, f, m_cents, r_score, f_score, m_score,
    rfm) sorted by custkey.  Note r_score 5 = LEAST recent.
    """
    import ray.data as rd

    from ..functions.rounding import round_series
    from ..stages.agg import grouped_agg

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_custkey", "o_orderdate",
                                      "o_totalprice"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        days = (np.asarray(df["o_orderdate"], dtype="datetime64[us]")
                .astype(np.int64) // 86_400_000_000)
        cents = round_series(
            pd.Series(df["o_totalprice"].to_numpy(dtype=np.float64) * 100.0),
            0).to_numpy().astype(np.int64)
        return pd.DataFrame({
            "o_custkey": df["o_custkey"].to_numpy(dtype=np.int64),
            "maxd": days, "f": np.ones(len(df), dtype=np.int64),
            "m": cents,
        })

    base = grouped_agg(
        orders.map_batches(partial, batch_format="pandas",
                           batch_size=131072),
        ["o_custkey"],
        {"maxd": ("maxd", "max"), "f": ("f", "sum"), "m": ("m", "sum")},
        n_buckets=n_buckets).materialize()

    gmax = int(base.max("maxd"))

    def with_r(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["r"] = gmax - df["maxd"].to_numpy(dtype=np.int64)
        return df[["o_custkey", "r", "f", "m"]]

    rfm = base.map_batches(with_r, batch_format="pandas").materialize()

    def quintile_thresholds(metric: str) -> np.ndarray:
        cells = grouped_agg(rfm, [metric], {"cnt": (metric, "size")},
                            # bound: distinct metric values (<= |customers|); web scale: t-digest sketch
                            n_buckets=8).to_pandas().sort_values(metric)
        vals = cells[metric].to_numpy(dtype=np.int64)
        cum = cells["cnt"].to_numpy(dtype=np.int64).cumsum()
        n = int(cum[-1])
        # quantile_disc == inverted_cdf: 1-based order stat ceil(q*n)
        idx = [int(np.ceil(q * n)) for q in (0.2, 0.4, 0.6, 0.8)]
        return np.array([vals[np.searchsorted(cum, j)] for j in idx],
                        dtype=np.int64)

    tr = quintile_thresholds("r")
    tf = quintile_thresholds("f")
    tm = quintile_thresholds("m")

    def score(df: pd.DataFrame) -> pd.DataFrame:
        def s(v: np.ndarray, t: np.ndarray) -> np.ndarray:
            out = np.ones(len(v), dtype=np.int64)
            for ti in t:
                out += (v > ti).astype(np.int64)
            return out

        r = df["r"].to_numpy(dtype=np.int64)
        f = df["f"].to_numpy(dtype=np.int64)
        mm = df["m"].to_numpy(dtype=np.int64)
        rs, fs, ms = s(r, tr), s(f, tf), s(mm, tm)
        code = (rs * 100 + fs * 10 + ms).astype(np.int64)
        return pd.DataFrame({
            "o_custkey": df["o_custkey"].to_numpy(dtype=np.int64),
            "r_days": r, "f": f, "m_cents": mm,
            "r_score": rs, "f_score": fs, "m_score": ms, "rfm": code,
        })

    return rfm.map_batches(score, batch_format="pandas").sort("o_custkey")


def revenue_changepoint(sf_dir: str, n_buckets: int = 16):
    """CUSUM change-point detection on the daily revenue series: the
    day k maximizing |prefix_k - k/n * total| (the classic cumulative
    deviation-from-mean statistic).  ALL-INTEGER algebra: revenue is
    summed in cents and the statistic is compared as
    |n * prefix_k - k * total| (scaling by n clears the rational mean),
    so both engines pick the identical argmax with no float boundary.

    Shape: a combiner reduce to the bounded DAY grain (one row per
    calendar day -- the revenue_cube driver-grain rule), then a single
    vectorized prefix-sum finish.  The orders table itself never
    re-shuffles.

    Output: one row (n_days, cp_day (epoch days), cusum_scaled --
    the max |n*prefix - k*total|, exact integer).
    """
    import ray.data as rd

    from ..functions.rounding import round_series
    from ..stages.agg import grouped_agg

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderdate", "o_totalprice"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        days = (np.asarray(df["o_orderdate"], dtype="datetime64[us]")
                .astype(np.int64) // 86_400_000_000)
        cents = round_series(
            pd.Series(df["o_totalprice"].to_numpy(dtype=np.float64) * 100.0),
            0).to_numpy().astype(np.int64)
        return pd.DataFrame({"day": days, "cents": cents})

    daily = grouped_agg(
        orders.map_batches(partial, batch_format="pandas",
                           batch_size=131072),
        ["day"], {"cents": ("cents", "sum")}, n_buckets=n_buckets)

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values("day")
        day = df["day"].to_numpy(dtype=np.int64)
        c = df["cents"].to_numpy(dtype=np.int64)
        n = len(c)
        # python-int prefix math: n * prefix can exceed int64 at scale
        prefix = np.cumsum(c.astype(object))
        total = int(prefix[-1])
        k = np.arange(1, n + 1, dtype=object)
        stat = abs(n * prefix - k * total)
        best = int(np.argmax(stat))  # first max = earliest day, both engines
        return pd.DataFrame({
            "n_days": pd.array([n], dtype="int64"),
            "cp_day": pd.array([int(day[best])], dtype="int64"),
            "cusum_scaled": [str(int(stat[best]))],
        })

    # bounded day grain: single-batch finish
    return (daily.repartition(1)
            .map_batches(finish, batch_format="pandas", batch_size=1 << 20))


def cohort_ltv(sf_dir: str, n_buckets: int = 64):
    """Cohort LTV triangle: users grouped by FIRST-ACTIVITY month, value
    summed by (cohort_month, months_since_cohort) -- the revenue twin
    of the retention triangle.

    Shape: ONE bucketed keyed shuffle on user_id; inside each bucket the
    cohort month is the user's min month (computed locally -- the user's
    whole history is co-located), so no second pass and no join; the
    (cohort, month_index) rollup is a tiny combiner.  Months are exact
    integers via datetime64[M] (== months-since-epoch), mirroring the
    oracle's datediff('month', ...).

    Output: (cohort_month, month_index, n_users, sum_value r2) sorted.
    """
    import ray.data as rd

    from ..functions.rounding import round_series
    from ..stages.agg import grouped_agg

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts", "value"])

    def per_user(df: pd.DataFrame) -> pd.DataFrame:
        mon = np.asarray(df["ts"], dtype="datetime64[us]") \
            .astype("datetime64[M]").astype(np.int64)
        user = df["user_id"].to_numpy(dtype=np.int64)
        g = pd.DataFrame({"user_id": user, "mon": mon,
                          "value": df["value"].to_numpy(dtype=np.float64)})
        first = g.groupby("user_id", sort=False)["mon"].transform("min")
        g["cohort_month"] = first
        g["month_index"] = g["mon"] - first
        per_cell_user = g.groupby(
            ["cohort_month", "month_index", "user_id"], as_index=False,
            sort=False).agg(v=("value", "sum"))
        out = per_cell_user.groupby(
            ["cohort_month", "month_index"], as_index=False,
            sort=False).agg(n_users=("user_id", "size"), sv=("v", "sum"))
        return out

    bucketed = ev.map_batches(
        lambda df: _user_bucket(df, "user_id", n_buckets),
        batch_format="pandas", batch_size=131072)
    cells = bucketed.groupby("bucket").map_groups(
        lambda df: per_user(df.drop(columns=["bucket"])),
        batch_format="pandas")
    agg = grouped_agg(cells, ["cohort_month", "month_index"],
                      {"n_users": ("n_users", "sum"), "sv": ("sv", "sum")},
                      n_buckets=8)

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "cohort_month": df["cohort_month"].astype("int64"),
            "month_index": df["month_index"].astype("int64"),
            "n_users": df["n_users"].astype("int64"),
            "sum_value": round_series(df["sv"], 2).to_numpy(),
        })

    return (agg.map_batches(finish, batch_format="pandas")
            .sort(["cohort_month", "month_index"]))


def dau_wau(sf_dir: str, n_buckets: int = 32):
    """Engagement series: per activity day, DAU (distinct users) and
    WAU (distinct users over the trailing 7 days) plus the stickiness
    ratio -- exact distinct counts, no sketch.

    Shape: the event stream combiner-reduces to DISTINCT (user, day)
    pairs (one keyed exchange); each pair then EXPLODES into its <=7
    contributing window days (a map, not a self-join -- the
    windows.py rule) and a second distinct+count reduce yields WAU.
    Day grain is bounded, so the final join of the two series is
    single-batch.

    Output: (day, dau, wau, ratio r6) sorted by day; only days with
    activity appear (ratio = dau/wau of that day's trailing window).
    """
    import ray.data as rd

    from ..functions.rounding import round_series
    from ..stages.agg import grouped_agg

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts"])

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        day = (np.asarray(df["ts"], dtype="datetime64[us]")
               .astype(np.int64) // 86_400_000_000)
        g = pd.DataFrame({"user_id": df["user_id"].to_numpy(dtype=np.int64),
                          "day": day})
        return g.drop_duplicates()

    ud = grouped_agg(
        ev.map_batches(pairs, batch_format="pandas", batch_size=131072),
        ["user_id", "day"], {"one": ("day", "size")},
        n_buckets=n_buckets)

    dau = grouped_agg(ud, ["day"], {"dau": ("one", "size")}, n_buckets=8)

    def explode_window(df: pd.DataFrame) -> pd.DataFrame:
        day = df["day"].to_numpy(dtype=np.int64)
        user = df["user_id"].to_numpy(dtype=np.int64)
        w = np.arange(7, dtype=np.int64)
        wday = (day[:, None] + w[None, :]).ravel()
        wuser = np.repeat(user, 7)
        g = pd.DataFrame({"user_id": wuser, "wday": wday})
        return g.drop_duplicates()

    wau_pairs = grouped_agg(
        ud.map_batches(explode_window, batch_format="pandas",
                       batch_size=65536),
        ["user_id", "wday"], {"one": ("wday", "size")}, n_buckets=n_buckets)
    wau = grouped_agg(wau_pairs, ["wday"], {"wau": ("one", "size")},
                      n_buckets=8)

    def _rename(df: pd.DataFrame) -> pd.DataFrame:
        return df.rename(columns={"wday": "day"})[["day", "wau"]]

    joined = dau.join(
        wau.map_batches(_rename, batch_format="pandas"),
        join_type="inner", num_partitions=2, on=("day",))

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        d = df["dau"].to_numpy(dtype=np.int64)
        w = df["wau"].to_numpy(dtype=np.int64)
        return pd.DataFrame({
            "day": df["day"].astype("int64"),
            "dau": d, "wau": w,
            "ratio": round_series(pd.Series(d / w), 6).to_numpy(),
        })

    return joined.map_batches(finish, batch_format="pandas").sort("day")


def revenue_acf(sf_dir: str, max_lag: int = 14, n_buckets: int = 16):
    """Autocorrelation function of the gap-filled daily revenue series
    at lags 1..max_lag -- the seasonality probe (lag 7 = weekly cycle).

    ALL-EXACT operands: revenue is summed in integer cents per day
    (revenue_changepoint's grain), missing days fill with 0 over
    [min_day, max_day], and every Pearson moment sum (sx, sxy, ...) is
    computed in unbounded python ints; only the final
    ``num / sqrt(a * b)`` division goes through float64, on identical
    operands in both engines.

    Shape: one combiner reduce to the bounded DAY grain, then a single
    vectorized finish; the orders table never re-shuffles.

    Output: (lag, n, r r6) for lag = 1..max_lag, sorted by lag.
    """
    import math

    import ray.data as rd

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderdate", "o_totalprice"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        days = (np.asarray(df["o_orderdate"], dtype="datetime64[us]")
                .astype(np.int64) // 86_400_000_000)
        cents = round_series(
            pd.Series(df["o_totalprice"].to_numpy(dtype=np.float64) * 100.0),
            0).to_numpy().astype(np.int64)
        return pd.DataFrame({"day": days, "cents": cents})

    daily = grouped_agg(
        orders.map_batches(partial, batch_format="pandas",
                           batch_size=131072),
        ["day"], {"cents": ("cents", "sum")}, n_buckets=n_buckets)

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values("day")
        day = df["day"].to_numpy(dtype=np.int64)
        full = np.zeros(int(day[-1] - day[0]) + 1, dtype=np.int64)
        full[day - day[0]] = df["cents"].to_numpy(dtype=np.int64)
        series = full.astype(object)          # exact python-int algebra
        rows = []
        for lag in range(1, max_lag + 1):
            x, y = series[:-lag], series[lag:]
            n = len(x)
            sx, sy = int(x.sum()), int(y.sum())
            sxx, syy = int((x * x).sum()), int((y * y).sum())
            sxy = int((x * y).sum())
            num = n * sxy - sx * sy
            a, b = n * sxx - sx * sx, n * syy - sy * sy
            r = float(num) / math.sqrt(float(a) * float(b))
            rows.append((lag, n, r))
        out = pd.DataFrame(rows, columns=["lag", "n", "r"])
        return pd.DataFrame({
            "lag": out["lag"].astype("int64"),
            "n": out["n"].astype("int64"),
            "r": round_series(out["r"], 6).to_numpy(),
        })

    # bounded day grain: single-batch finish
    return (daily.repartition(1)
            .map_batches(finish, batch_format="pandas", batch_size=1 << 20))


def user_activity_gini(sf_dir: str, n_buckets: int = 32):
    """Exact Gini coefficient of per-user event counts -- the activity
    inequality scalar (0 = uniform, ->1 = a few users dominate).

    Scale shape: the sorted-index Gini formula normally needs a global
    sort + prefix rank over every user; here the per-user counts reduce
    to their VALUE HISTOGRAM (count value k -> f users), which is tiny
    (counts are small integers), and within a tied value the sort order
    is irrelevant, so the rank sum collapses to the closed form
    sum k*f*(2*cf - f + 1) = 2*sum(i*x_i) over cumulative frequencies.
    Two keyed combiner reduces, one single-batch finish, all-integer.

    Output: one row (n_users, mean_events r6, gini r6).
    """
    import ray.data as rd

    ev = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id"])

    counts = grouped_agg(ev, ["user_id"], {"k": ("user_id", "size")},
                         n_buckets=n_buckets)
    hist = grouped_agg(counts, ["k"], {"f": ("k", "size")}, n_buckets=4)

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values("k")
        k = df["k"].to_numpy(dtype=np.int64).astype(object)
        f = df["f"].to_numpy(dtype=np.int64).astype(object)
        n = int(f.sum())
        tot = int((k * f).sum())
        cf = np.cumsum(f)
        two_t = int((k * f * (2 * cf - f + 1)).sum())
        gini = float(two_t - (n + 1) * tot) / float(n * tot)
        return pd.DataFrame({
            "n_users": pd.array([n], dtype="int64"),
            "mean_events": round_series(
                pd.Series([float(tot) / float(n)]), 6).to_numpy(),
            "gini": round_series(pd.Series([gini]), 6).to_numpy(),
        })

    # count-value grain is tiny: single-batch finish
    return (hist.repartition(1)
            .map_batches(finish, batch_format="pandas", batch_size=1 << 20))


def source_quality_report(sf_dir: str, n_buckets: int = 32):
    """Per-(source, lang) corpus curation report: doc count, EXACT
    distinct-text count, mean length, and the duplication rate
    1 - distinct/count -- the per-domain table a crawl-curation pass
    ranks and prunes by.

    Shape: the distinct side pre-dedups (source, lang, text) inside
    each batch (combiner), so the keyed exchange carries one row per
    distinct text, never the raw corpus; dedup is on the FULL text (no
    64-bit hash merge hazard).  The count/length side is an ordinary
    combiner reduce.  Both land on the bounded (source, lang) grain and
    hash-join there.

    Output: (source, lang, n_docs, n_distinct_texts, mean_chars r2,
    dup_rate r6) sorted.
    """
    import ray.data as rd

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["source", "lang", "text", "n_chars"])

    stats = grouped_agg(
        docs.map_batches(
            lambda df: df[["source", "lang", "n_chars"]],
            batch_format="pandas", batch_size=65536),
        ["source", "lang"],
        {"n_docs": ("n_chars", "size"), "sc": ("n_chars", "sum")},
        n_buckets=8)

    def local_distinct(df: pd.DataFrame) -> pd.DataFrame:
        return df[["source", "lang", "text"]].drop_duplicates()

    uniq = grouped_agg(
        docs.map_batches(local_distinct, batch_format="pandas",
                         batch_size=65536),
        ["source", "lang", "text"], {"one": ("text", "size")},
        n_buckets=n_buckets)
    distinct = grouped_agg(uniq, ["source", "lang"],
                           {"n_distinct_texts": ("one", "size")},
                           n_buckets=8)

    joined = stats.join(distinct, join_type="inner", num_partitions=2,
                        on=("source", "lang"))

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        n = df["n_docs"].to_numpy(dtype=np.int64)
        d = df["n_distinct_texts"].to_numpy(dtype=np.int64)
        sc = df["sc"].to_numpy(dtype=np.int64)
        return pd.DataFrame({
            "source": df["source"].to_numpy(),
            "lang": df["lang"].to_numpy(),
            "n_docs": n, "n_distinct_texts": d,
            "mean_chars": round_series(pd.Series(sc / n), 2).to_numpy(),
            "dup_rate": round_series(pd.Series(1.0 - d / n), 6).to_numpy(),
        })

    return (joined.map_batches(finish, batch_format="pandas")
            .sort(["source", "lang"]))


def peak_minute_load(sf_dir: str, n_buckets: int = 8):
    """Peak ingest load: the 1-minute window with the most events (ties
    -> earliest minute) -- the capacity-planning scalar. Combiner counts
    on the minute grain; the argmax runs on the tiny minute table.

    Output: one row (peak_minute_s, n_events).
    """
    import ray.data as rd

    from ..stages.agg import grouped_agg

    ev = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["ts"])

    def part(df: pd.DataFrame) -> pd.DataFrame:
        mn = (np.asarray(df["ts"], dtype="datetime64[us]").astype(np.int64)
              // (60 * 1_000_000))
        return (pd.DataFrame({"minute": mn})
                .groupby("minute", as_index=False).agg(c=("minute", "size")))

    agg = grouped_agg(ev.map_batches(part, batch_format="pandas",
                                     batch_size=131072),
                      ["minute"], {"c": ("c", "sum")},
                      # bound: minute grain (calendar)
                      n_buckets=n_buckets).to_pandas()
    agg = agg.sort_values(["c", "minute"],
                          ascending=[False, True]).reset_index(drop=True)
    return rd.from_pandas(pd.DataFrame({
        "peak_minute_s": np.asarray([agg["minute"].iloc[0] * 60],
                                    dtype=np.int64),
        "n_events": np.asarray([agg["c"].iloc[0]], dtype=np.int64),
    }))


def monthly_fulfillment_rate(sf_dir: str, n_buckets: int = 8):
    """Share of lineitems in final status ('F') per ship month -- the
    operational-health time series. Pure combiner counts on the integer
    month grain; the rate divide is integer-exact on both sides.

    Output: (mon, n_items, n_final, rate r6) sorted by mon.
    """
    import ray.data as rd

    from ..functions.rounding import round_series
    from ..stages.agg import grouped_agg

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_shipdate", "l_linestatus"])

    def part(df: pd.DataFrame) -> pd.DataFrame:
        d = pd.DatetimeIndex(df["l_shipdate"])
        mon = (d.year.to_numpy() - 1970) * 12 + d.month.to_numpy() - 1
        f = (df["l_linestatus"].to_numpy() == "F").astype(np.int64)
        return (pd.DataFrame({"mon": mon.astype(np.int64), "f": f,
                              "one": np.ones(len(f), dtype=np.int64)})
                .groupby("mon", as_index=False)
                .agg(n_items=("one", "sum"), n_final=("f", "sum")))

    agg = grouped_agg(li.map_batches(part, batch_format="pandas",
                                     batch_size=131072),
                      ["mon"], {"n_items": ("n_items", "sum"),
                                "n_final": ("n_final", "sum")},
                      n_buckets=n_buckets)

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        df["rate"] = round_series(df["n_final"] / df["n_items"], 6)
        df["mon"] = df["mon"].astype("int64")
        df["n_items"] = df["n_items"].astype("int64")
        df["n_final"] = df["n_final"].astype("int64")
        return df[["mon", "n_items", "n_final", "rate"]]

    return agg.map_batches(finish, batch_format="pandas").sort("mon")


def nation_acctbal_boxplot(sf_dir: str, n_buckets: int = 8):
    """Per-nation boxplot statistics of customer account balance:
    p25/p50/p75 (quantile_cont == numpy linear) and the count of 1.5-IQR
    outliers. One nation-bucketed keyed shuffle; the quantiles run per
    nation segment (customers per nation are a bounded slice of the
    dimension). The outlier fences are written as the SAME float
    expression tree on both sides.

    Output: (c_nationkey, n_customers, p25, p50, p75, n_outliers).
    """
    import ray.data as rd

    from ..functions.rounding import round_half_away

    cust = rd.read_parquet(f"{sf_dir}/customer.parquet",
                           columns=["c_nationkey", "c_acctbal"])

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df["bucket"] = (df["c_nationkey"].to_numpy(dtype=np.int64)
                        % n_buckets).astype(np.int32)
        return df

    def box(df: pd.DataFrame) -> pd.DataFrame:
        out = []
        for nk, g in df.groupby("c_nationkey", sort=False):
            x = g["c_acctbal"].to_numpy(dtype=np.float64)
            p25, p50, p75 = (float(np.quantile(x, q, method="linear"))
                             for q in (0.25, 0.5, 0.75))
            lo = p25 - 1.5 * (p75 - p25)
            hi = p75 + 1.5 * (p75 - p25)
            out.append((int(nk), len(x),
                        round_half_away(p25, 6), round_half_away(p50, 6),
                        round_half_away(p75, 6),
                        int(((x < lo) | (x > hi)).sum())))
        return pd.DataFrame(out, columns=["c_nationkey", "n_customers",
                                          "p25", "p50", "p75",
                                          "n_outliers"]).astype(
            {"c_nationkey": "int64", "n_customers": "int64",
             "n_outliers": "int64"})

    bucketed = cust.map_batches(add_bucket, batch_format="pandas",
                                batch_size=131072)
    return (bucketed.groupby("bucket")
            .map_groups(lambda df: box(df.drop(columns=["bucket"])),
                        batch_format="pandas")
            .sort("c_nationkey"))


def priority_segment_matrix(sf_dir: str, n_buckets: int = 8,
                            broadcast_rows: int = 20_000_000):
    """Order count matrix by (order priority x customer market segment)
    -- the cross-dimensional report shape. The customer segment attaches
    via the size-gated broadcast VecLookup (int codes for the segment
    strings so the lookup array stays numeric); counts reduce in one
    tiny keyed combiner.

    Output: (o_orderpriority, c_mktsegment, n_orders) sorted.
    """
    import pyarrow.parquet as pq
    import ray.data as rd

    from ..functions.lookup import VecLookup
    from ..stages.agg import grouped_agg

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_custkey", "o_orderpriority"])
    n_cust = pq.ParquetFile(f"{sf_dir}/customer.parquet").metadata.num_rows
    if n_cust <= broadcast_rows:
        ct = pq.read_table(f"{sf_dir}/customer.parquet",
                           columns=["c_custkey", "c_mktsegment"])
        # bound: inside the n_cust <= broadcast_rows gate
        seg = ct.column("c_mktsegment").to_pandas()
        cats = np.asarray(sorted(seg.unique()))
        lut = VecLookup(ct.column("c_custkey").to_numpy(),
                        np.searchsorted(cats, seg.to_numpy()))

        def part(df: pd.DataFrame) -> pd.DataFrame:
            codes, found = lut.lookup(df["o_custkey"].to_numpy())
            df = df[found].assign(
                c_mktsegment=cats[codes[found].astype(np.int64)])
            return (df.groupby(["o_orderpriority", "c_mktsegment"],
                               as_index=False)
                    .agg(n_orders=("o_custkey", "size")))

        partials = orders.map_batches(part, batch_format="pandas",
                                      batch_size=131072)
    else:
        # above the gate: hash-join orders against the customer dim
        import ray

        cpus = (int(ray.cluster_resources().get("CPU", 4))
                if ray.is_initialized() else 4)
        cust_ds = rd.read_parquet(f"{sf_dir}/customer.parquet",
                                  columns=["c_custkey", "c_mktsegment"])
        joined = orders.join(cust_ds, join_type="inner",
                             num_partitions=max(2, cpus // 2),
                             on=("o_custkey",), right_on=("c_custkey",))
        partials = joined.map_batches(
            lambda df: df.groupby(["o_orderpriority", "c_mktsegment"],
                                  as_index=False)
            .agg(n_orders=("o_custkey", "size")), batch_format="pandas")

    agg = grouped_agg(partials,
                      ["o_orderpriority", "c_mktsegment"],
                      {"n_orders": ("n_orders", "sum")}, n_buckets=n_buckets)

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        df["n_orders"] = df["n_orders"].astype("int64")
        return df[["o_orderpriority", "c_mktsegment", "n_orders"]]

    return agg.map_batches(finish, batch_format="pandas").sort(
        ["o_orderpriority", "c_mktsegment"])


def customer_order_gap_median(sf_dir: str, n_buckets: int = 64):
    """Repeat-purchase latency: per customer the exact MEDIAN day gap
    between consecutive orders (customers with >= 2 orders). One
    customer-bucketed shuffle; gaps and their median are computed per
    segment (bounded per-customer work; quantile_cont == numpy linear
    on the sorted gap array).

    Output: (o_custkey, n_orders, median_gap_days r6).
    """
    import ray.data as rd

    from ..functions.rounding import round_half_away

    ds = rd.read_parquet(f"{sf_dir}/orders.parquet",
                         columns=["o_custkey", "o_orderdate", "o_orderkey"])

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        h = df["o_custkey"].to_numpy(dtype=np.int64).astype(np.uint64)
        with np.errstate(over="ignore"):
            h = h * np.uint64(0x9E3779B97F4A7C15)
            h ^= h >> np.uint64(29)
        df["bucket"] = (h % np.uint64(n_buckets)).astype(np.int32)
        return df

    def medians(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["o_custkey", "o_orderdate", "o_orderkey"])
        day = (np.asarray(df["o_orderdate"], dtype="datetime64[us]")
               .astype(np.int64) // (86_400 * 1_000_000))
        cust = df["o_custkey"].to_numpy()
        seg = np.flatnonzero(np.concatenate(([True], cust[1:] != cust[:-1])))
        seg_end = np.append(seg[1:], len(df))
        out_c, out_n, out_m = [], [], []
        for a, b in zip(seg, seg_end):
            if b - a < 2:
                continue
            gaps = np.diff(day[a:b]).astype(np.float64)
            out_c.append(cust[a])
            out_n.append(b - a)
            out_m.append(round_half_away(
                float(np.quantile(gaps, 0.5, method="linear")), 6))
        return pd.DataFrame({
            "o_custkey": np.asarray(out_c, dtype=np.int64),
            "n_orders": np.asarray(out_n, dtype=np.int64),
            "median_gap_days": out_m,
        })

    bucketed = ds.map_batches(add_bucket, batch_format="pandas",
                              batch_size=131072)
    return bucketed.groupby("bucket").map_groups(medians,
                                                 batch_format="pandas")


def weekly_new_vs_returning(sf_dir: str, n_buckets: int = 64):
    """Weekly active users split into NEW (first-ever event falls in
    this week) vs RETURNING -- the growth-accounting view. One
    user-keyed shuffle computes each user's first week AND distinct
    active weeks locally in the same segment pass (no first-week
    broadcast or second join); a tiny keyed reduce sums the per-week
    flags.

    Week identity = epoch_days // 7 (no calendar alignment -- both
    engines share the convention).

    Output: (week, n_new, n_returning) sorted by week.
    """
    import ray.data as rd

    from ..stages.agg import grouped_agg

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["ts", "user_id"])

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        h = df["user_id"].to_numpy(dtype=np.int64).astype(np.uint64)
        with np.errstate(over="ignore"):
            h = h * np.uint64(0x9E3779B97F4A7C15)
            h ^= h >> np.uint64(29)
        df["bucket"] = (h % np.uint64(n_buckets)).astype(np.int32)
        return df

    def weeks(df: pd.DataFrame) -> pd.DataFrame:
        wk = (np.asarray(df["ts"], dtype="datetime64[us]").astype(np.int64)
              // (7 * 86_400 * 1_000_000))
        g = (pd.DataFrame({"user_id": df["user_id"].to_numpy(), "week": wk})
             .drop_duplicates())
        first = g.groupby("user_id")["week"].transform("min")
        g["is_new"] = (g["week"] == first).astype(np.int64)
        g["one"] = 1
        return (g.groupby("week", as_index=False)
                .agg(n_new=("is_new", "sum"), n_active=("one", "sum")))

    bucketed = ev.map_batches(add_bucket, batch_format="pandas",
                              batch_size=131072)
    partial = bucketed.groupby("bucket").map_groups(
        lambda df: weeks(df.drop(columns=["bucket"])),
        batch_format="pandas")
    agg = grouped_agg(partial, ["week"],
                      {"n_new": ("n_new", "sum"),
                       "n_active": ("n_active", "sum")}, n_buckets=8)

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        df["n_returning"] = (df["n_active"] - df["n_new"]).astype("int64")
        df["n_new"] = df["n_new"].astype("int64")
        df["week"] = df["week"].astype("int64")
        return df[["week", "n_new", "n_returning"]]

    return agg.map_batches(finish, batch_format="pandas").sort("week")


def supplier_count_rank(sf_dir: str, n_buckets: int = 16,
                        broadcast_rows: int = 20_000_000):
    """RANK-with-ties leaderboard: suppliers ranked inside their nation
    by lineitem count (integer counts, so ties are REAL and the
    tie-sharing RANK semantics differ from row_number). One combiner
    count per supplier, size-gated broadcast nation lookup, rank
    computed per nation as 1 + |strictly greater| via searchsorted on
    the sorted count array -- no window, no per-row loop.

    Output: (s_suppkey, n_nationkey, n_items, rnk) sorted.
    """
    import pyarrow.parquet as pq
    import ray.data as rd

    from ..functions.lookup import VecLookup
    from ..stages.agg import grouped_agg

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_suppkey"])

    def part(df: pd.DataFrame) -> pd.DataFrame:
        return (df.groupby("l_suppkey", as_index=False)
                .agg(n_items=("l_suppkey", "size")))

    per_supp = grouped_agg(li.map_batches(part, batch_format="pandas"),
                           ["l_suppkey"], {"n_items": ("n_items", "sum")},
                           n_buckets=n_buckets)

    n_supp = pq.ParquetFile(f"{sf_dir}/supplier.parquet").metadata.num_rows
    if n_supp <= broadcast_rows:
        st = pq.read_table(f"{sf_dir}/supplier.parquet",
                           columns=["s_suppkey", "s_nationkey"])
        lut = VecLookup(st.column("s_suppkey").to_numpy(),
                        st.column("s_nationkey").to_numpy())

        def attach_batch(df: pd.DataFrame) -> pd.DataFrame:
            vals, found = lut.lookup(df["l_suppkey"].to_numpy())
            return df[found].assign(n_nationkey=vals[found])

        attached = per_supp.map_batches(attach_batch, batch_format="pandas")
    else:
        # above the gate: hash-join the per-supplier aggregate against
        # the supplier dim (one row per suppkey on both sides)
        import ray

        cpus = (int(ray.cluster_resources().get("CPU", 4))
                if ray.is_initialized() else 4)
        st_ds = rd.read_parquet(f"{sf_dir}/supplier.parquet",
                                columns=["s_suppkey", "s_nationkey"])
        attached = (per_supp.join(st_ds, join_type="inner",
                                  num_partitions=max(2, cpus // 2),
                                  on=("l_suppkey",),
                                  right_on=("s_suppkey",))
                    .map_batches(lambda df: df.rename(
                        columns={"s_nationkey": "n_nationkey"}),
                        batch_format="pandas"))

    def rank_nation(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["n_nationkey", "l_suppkey"])
        out = []
        for _, g in df.groupby("n_nationkey", sort=False):
            c = g["n_items"].to_numpy(dtype=np.int64)
            srt = np.sort(c)
            # RANK = 1 + number of STRICTLY greater counts in the nation
            rnk = 1 + (len(c) - np.searchsorted(srt, c, side="right"))
            out.append(g.assign(rnk=rnk.astype(np.int64)))
        return pd.concat(out, ignore_index=True)

    def rekey(df: pd.DataFrame) -> pd.DataFrame:
        df["bucket"] = (df["n_nationkey"].to_numpy(dtype=np.int64)
                        % 8).astype(np.int32)
        return df

    ranked = (attached.map_batches(rekey, batch_format="pandas")
              .groupby("bucket")
              .map_groups(lambda df: rank_nation(df.drop(columns=["bucket"])),
                          batch_format="pandas"))

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        df = df.rename(columns={"l_suppkey": "s_suppkey"})
        for c in ("s_suppkey", "n_nationkey", "n_items", "rnk"):
            df[c] = df[c].astype("int64")
        return df[["s_suppkey", "n_nationkey", "n_items", "rnk"]]

    return ranked.map_batches(finish, batch_format="pandas").sort(
        ["n_nationkey", "rnk", "s_suppkey"])


def event_type_burstiness(sf_dir: str, n_buckets: int = 8):
    """Fano factor (variance / mean of the per-hour arrival counts) per
    event type -- the burstiness diagnostic: ~1 for Poisson arrivals,
    >1 bursty. The hourly counts are INTEGERS, so the population
    moments come from exact integer power sums (sum, sum of squares)
    and the engine/oracle float expressions are identical.

    Hours with zero events do not enter the series (both sides use the
    same convention -- the observed-hour grain).

    Output: (event_type, n_hours, mean_r6, var_r6, fano r6).
    """
    import ray.data as rd

    from ..functions.rounding import round_series
    from ..stages.agg import grouped_agg

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["ts", "event_type"])

    def hour_part(df: pd.DataFrame) -> pd.DataFrame:
        hr = (np.asarray(df["ts"], dtype="datetime64[us]").astype(np.int64)
              // (3600 * 1_000_000))
        return (pd.DataFrame({"event_type": df["event_type"].to_numpy(),
                              "hour": hr})
                .groupby(["event_type", "hour"], as_index=False)
                .agg(c=("hour", "size")))

    hourly = grouped_agg(ev.map_batches(hour_part, batch_format="pandas"),
                         ["event_type", "hour"], {"c": ("c", "sum")},
                         n_buckets=n_buckets)

    def mom_part(df: pd.DataFrame) -> pd.DataFrame:
        c = df["c"].to_numpy(dtype=np.int64)
        return (pd.DataFrame({"event_type": df["event_type"].to_numpy(),
                              "n": 1, "s": c, "ss": c * c})
                .groupby("event_type", as_index=False)
                .agg(n=("n", "sum"), s=("s", "sum"), ss=("ss", "sum")))

    agg = grouped_agg(hourly.map_batches(mom_part, batch_format="pandas"),
                      ["event_type"],
                      {"n": ("n", "sum"), "s": ("s", "sum"),
                       "ss": ("ss", "sum")}, n_buckets=4)

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        n = df["n"].to_numpy(dtype=np.float64)
        s = df["s"].to_numpy(dtype=np.float64)
        ss = df["ss"].to_numpy(dtype=np.float64)
        mean = s / n
        var = ss / n - mean * mean
        return pd.DataFrame({
            "event_type": df["event_type"],
            "n_hours": df["n"].astype("int64"),
            "mean_r6": round_series(pd.Series(mean), 6).to_numpy(),
            "var_r6": round_series(pd.Series(var), 6).to_numpy(),
            "fano": round_series(pd.Series(var / mean), 6).to_numpy(),
        })

    return agg.map_batches(finish, batch_format="pandas").sort("event_type")


def qty_discount_corr(sf_dir: str, n_buckets: int = 8):
    """Pearson correlation of lineitem quantity and discount -- a
    single-row data-understanding probe. Both columns are exact in
    integer units (quantity is whole, discount has 2 decimals), so the
    five power sums are exact integers and the correlation expression
    is the identical float tree on both sides (the revenue_acf
    convention).

    Output: one row (n, corr r6).
    """
    import ray.data as rd

    from ..functions.rounding import round_half_away
    from ..stages.agg import grouped_agg

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_quantity", "l_discount"])

    def part(df: pd.DataFrame) -> pd.DataFrame:
        q = np.floor(df["l_quantity"].to_numpy() + 0.5).astype(np.int64)
        d = np.floor(df["l_discount"].to_numpy() * 100 + 0.5).astype(np.int64)
        return pd.DataFrame({
            "g": [0], "n": [len(q)], "sq": [int(q.sum())],
            "sd": [int(d.sum())], "sqq": [int((q * q).sum())],
            "sdd": [int((d * d).sum())], "sqd": [int((q * d).sum())],
        })

    agg = grouped_agg(li.map_batches(part, batch_format="pandas",
                                     batch_size=131072),
                      ["g"], {"n": ("n", "sum"), "sq": ("sq", "sum"),
                              "sd": ("sd", "sum"), "sqq": ("sqq", "sum"),
                              "sdd": ("sdd", "sum"), "sqd": ("sqd", "sum")},
                      # bound: tiny group grain
                      n_buckets=2).to_pandas()
    n = float(agg["n"].iloc[0])
    sq, sd = float(agg["sq"].iloc[0]), float(agg["sd"].iloc[0])
    sqq, sdd = float(agg["sqq"].iloc[0]), float(agg["sdd"].iloc[0])
    sqd = float(agg["sqd"].iloc[0])
    corr = ((n * sqd - sq * sd)
            / np.sqrt(n * sqq - sq * sq)
            / np.sqrt(n * sdd - sd * sd))
    return rd.from_pandas(pd.DataFrame({
        "n": np.asarray([int(n)], dtype=np.int64),
        "corr": [round_half_away(float(corr), 6)],
    }))


def order_value_deciles(sf_dir: str, n_buckets: int = 16):
    """Equi-depth decile edges of order value: the 9 interior
    quantile_disc cuts (exact order statistics -- integers in cents, so
    the boundary is bitwise-stable in both engines), from a
    (cents -> count) combiner histogram; only the tiny histogram
    reaches the driver.

    Output: (decile 1..9, cents) sorted by decile.
    """
    import ray.data as rd

    from ..stages.agg import grouped_agg

    ds = rd.read_parquet(f"{sf_dir}/orders.parquet",
                         columns=["o_totalprice"])

    def part(df: pd.DataFrame) -> pd.DataFrame:
        cents = np.floor(df["o_totalprice"].to_numpy() * 100
                         + 0.5).astype(np.int64)
        return (pd.DataFrame({"cents": cents})
                .groupby("cents", as_index=False).agg(cnt=("cents", "size")))

    hist = (grouped_agg(ds.map_batches(part, batch_format="pandas"),
                        ["cents"], {"cnt": ("cnt", "sum")},
                        n_buckets=n_buckets)
            # bound: cents-histogram grain
            .to_pandas().sort_values("cents").reset_index(drop=True))
    n = int(hist["cnt"].sum())
    cum = hist["cnt"].cumsum()
    deciles, values = [], []
    for d in range(1, 10):
        k = -(-d * n // 10)  # ceil(d/10 * n): quantile_disc order stat
        values.append(int(hist.loc[int(cum.searchsorted(k)), "cents"]))
        deciles.append(d)
    return rd.from_pandas(pd.DataFrame({
        "decile": np.asarray(deciles, dtype=np.int64),
        "cents": np.asarray(values, dtype=np.int64),
    }))


def brand_revenue_hhi(sf_dir: str, broadcast_rows: int = 20_000_000):
    """Market concentration of lineitem revenue by part brand: the
    Herfindahl-Hirschman index (sum of squared brand shares) plus the
    top brand's share. Revenue sums PER PARTKEY first (the oracle's
    grouping, so float trees agree; see promo_revenue_q14), the brand
    attaches via the size-gated broadcast VecLookup, and the HHI runs
    on the tiny brand table.

    Output: one row (n_brands, hhi r6, top_share r6).
    """
    import pyarrow.parquet as pq
    import ray.data as rd

    from ..functions.lookup import VecLookup
    from ..functions.rounding import round_half_away
    from ..stages.agg import grouped_agg

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_partkey", "l_extendedprice",
                                  "l_discount"])

    def prep(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "l_partkey": df["l_partkey"].to_numpy(),
            "rev": (df["l_extendedprice"].to_numpy()
                    * (1.0 - df["l_discount"].to_numpy())),
        })

    per_part = grouped_agg(
        li.map_batches(prep, batch_format="pandas", batch_size=131072),
        ["l_partkey"], {"rev": ("rev", "sum")},
    )

    n_parts = pq.ParquetFile(f"{sf_dir}/part.parquet").metadata.num_rows
    if n_parts <= broadcast_rows:
        pt = pq.read_table(f"{sf_dir}/part.parquet",
                           columns=["p_partkey", "p_brand"])
        lut = VecLookup(pt.column("p_partkey").to_numpy(),
                        # bound: inside the n_parts <= broadcast_rows gate
                        pt.column("p_brand").to_pandas().to_numpy())

        def attach(df: pd.DataFrame) -> pd.DataFrame:
            vals, found = lut.lookup(df["l_partkey"].to_numpy())
            df = df[found].assign(p_brand=vals[found])
            return (df.groupby("p_brand", as_index=False)
                    .agg(rev=("rev", "sum")))

        branded = per_part.map_batches(attach, batch_format="pandas")
    else:
        # above the gate the part dim hash-joins against the per-part
        # aggregate (already one row per partkey)
        import ray

        cpus = (int(ray.cluster_resources().get("CPU", 4))
                if ray.is_initialized() else 4)
        part_ds = rd.read_parquet(f"{sf_dir}/part.parquet",
                                  columns=["p_partkey", "p_brand"])
        joined = per_part.join(part_ds, join_type="inner",
                               num_partitions=max(2, cpus // 2),
                               on=("l_partkey",), right_on=("p_partkey",))
        branded = joined.map_batches(
            lambda df: df.groupby("p_brand", as_index=False)
            .agg(rev=("rev", "sum")), batch_format="pandas")

    brands = grouped_agg(branded, ["p_brand"], {"rev": ("rev", "sum")},
                         # bound: brand grain
                         n_buckets=8).to_pandas()
    rev = brands["rev"].to_numpy()
    total = rev.sum()
    share = rev / total
    out = pd.DataFrame({
        "n_brands": np.asarray([len(brands)], dtype=np.int64),
        "hhi": [round_half_away(float((share * share).sum()), 6)],
        "top_share": [round_half_away(float(share.max()), 6)],
    })
    return rd.from_pandas(out)


def revenue_pareto(sf_dir: str, top_num: int = 1, top_den: int = 5,
                   n_buckets: int = 32):
    """Pareto concentration: the share of total order revenue coming
    from the top 20% of customers (the 80/20 Lorenz point). Per-customer
    cents totals reduce via one combiner shuffle and STAY a Dataset (the
    customer dim grows with scale -- never collected); the top-k slice
    is one distributed sort + limit where k = ceil(0.2 * n), and both
    sums are scalar combiners. All-integer cents, so the share is exact.

    Output: one row (n_customers, k_top, top_share r6).
    """
    import ray.data as rd

    from ..functions.rounding import round_half_away
    from ..stages.agg import grouped_agg

    ds = rd.read_parquet(f"{sf_dir}/orders.parquet",
                         columns=["o_custkey", "o_totalprice"])

    def part(df: pd.DataFrame) -> pd.DataFrame:
        cents = np.floor(df["o_totalprice"].to_numpy() * 100
                         + 0.5).astype(np.int64)
        return (pd.DataFrame({"o_custkey": df["o_custkey"], "cents": cents})
                .groupby("o_custkey", as_index=False).agg(cents=("cents",
                                                                 "sum")))

    per_cust = grouped_agg(ds.map_batches(part, batch_format="pandas"),
                           ["o_custkey"], {"cents": ("cents", "sum")},
                           n_buckets=n_buckets)
    n = per_cust.count()
    k = -(-top_num * n // top_den)  # ceil(n/5)

    def cents_sum(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"s": [int(df["cents"].sum())]})

    total = int(per_cust.map_batches(cents_sum,
                                     batch_format="pandas")
                # bound: one scalar per block
                .to_pandas()["s"].sum())
    top = (per_cust.sort(["cents", "o_custkey"], descending=[True, False])
           .limit(k))
    top_sum = int(top.map_batches(cents_sum, batch_format="pandas")
                  # bound: k rows summed
                  .to_pandas()["s"].sum())
    out = pd.DataFrame({
        "n_customers": np.asarray([n], dtype=np.int64),
        "k_top": np.asarray([k], dtype=np.int64),
        "top_share": [round_half_away(top_sum / total, 6)],
    })
    return rd.from_pandas(out)


def churn_features(sf_dir: str, churn_days: int = 28, n_buckets: int = 64):
    """Per-user churn feature table -- the ML-feature-engineering
    composite: event count, total value (cents-exact), days since last
    activity (vs the corpus max timestamp), mean inter-event gap, and
    the churn label (no activity in the trailing ``churn_days``). All
    per-user stats come from ONE user-bucketed shuffle; the corpus max
    timestamp is a scalar combiner (never a second shuffle).

    Output: (user_id, n_events, sum_value_cents, days_since_last,
    mean_gap_s r6 [0 when < 2 events], churned).
    """
    import ray.data as rd

    from ..functions.rounding import round_series

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "ts", "user_id", "value"])

    def max_ts_part(df: pd.DataFrame) -> pd.DataFrame:
        ts = np.asarray(df["ts"], dtype="datetime64[us]").astype(np.int64)
        return pd.DataFrame({"mx": [int(ts.max())]})

    mx_us = int(ev.map_batches(max_ts_part,
                               # bound: one scalar per block
                               batch_format="pandas").to_pandas()["mx"].max())

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        h = df["user_id"].to_numpy(dtype=np.int64).astype(np.uint64)
        with np.errstate(over="ignore"):
            h = h * np.uint64(0x9E3779B97F4A7C15)
            h ^= h >> np.uint64(29)
        df["bucket"] = (h % np.uint64(n_buckets)).astype(np.int32)
        return df

    def features(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"])
        ts = np.asarray(df["ts"], dtype="datetime64[us]").astype(np.int64)
        user = df["user_id"].to_numpy()
        cents = np.asarray(
            [int(v) for v in np.floor(df["value"].to_numpy() * 100 + 0.5)],
            dtype=np.int64)
        seg = np.flatnonzero(np.concatenate(([True], user[1:] != user[:-1])))
        seg_end = np.append(seg[1:], len(df))
        n = seg_end - seg
        last = ts[seg_end - 1]
        first = ts[seg]
        g = pd.DataFrame({
            "user_id": user[seg],
            "n_events": n.astype("int64"),
            "sum_value_cents": np.add.reduceat(cents, seg).astype("int64"),
            "days_since_last": ((mx_us - last)
                                // (86_400 * 1_000_000)).astype("int64"),
        })
        # mean gap = (last - first) / (n - 1): consecutive diffs telescope
        gap = np.where(n > 1, (last - first) / np.maximum(n - 1, 1) / 1e6,
                       0.0)
        g["mean_gap_s"] = round_series(pd.Series(gap), 6)
        g["churned"] = (mx_us - last
                        > churn_days * 86_400 * 1_000_000)
        return g[["user_id", "n_events", "sum_value_cents",
                  "days_since_last", "mean_gap_s", "churned"]]

    bucketed = ev.map_batches(add_bucket, batch_format="pandas",
                              batch_size=131072)
    return bucketed.groupby("bucket").map_groups(features,
                                                 batch_format="pandas")


def user_type_interarrival(sf_dir: str, n_buckets: int = 64):
    """Mean inter-arrival seconds per (user, event_type) -- the
    per-entity cadence metric (bounded groups; a per-TYPE global
    ordering would make one giant skewed group at corpus scale). One
    user-bucketed keyed shuffle; diffs are computed per (user, type)
    SEGMENT over the sorted frame (the sawtooth rule), exact integer
    microseconds divided once at the end.

    Output: (user_id, event_type, n_gaps, mean_gap_s r6) for pairs
    with >= 2 events.
    """
    import ray.data as rd

    from ..functions.rounding import round_series
    from ..stages.agg import grouped_agg

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "event_type", "ts", "event_id"])

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        h = df["user_id"].to_numpy(dtype=np.int64).astype(np.uint64)
        with np.errstate(over="ignore"):
            h = h * np.uint64(0x9E3779B97F4A7C15)
            h ^= h >> np.uint64(29)
        df["bucket"] = (h % np.uint64(n_buckets)).astype(np.int32)
        return df

    def gaps(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "event_type", "ts", "event_id"])
        ts = np.asarray(df["ts"], dtype="datetime64[us]").astype(np.int64)
        user = df["user_id"].to_numpy()
        typ = df["event_type"].to_numpy()
        same = np.concatenate(
            ([False], (user[1:] == user[:-1]) & (typ[1:] == typ[:-1])))
        d = np.empty(len(df), dtype=np.int64)
        d[0] = 0
        d[1:] = ts[1:] - ts[:-1]
        g = pd.DataFrame({"user_id": user[same], "event_type": typ[same],
                          "gap_us": d[same]})
        out = g.groupby(["user_id", "event_type"], as_index=False).agg(
            n_gaps=("gap_us", "size"), sum_us=("gap_us", "sum"))
        out["mean_gap_s"] = round_series(
            out["sum_us"] / out["n_gaps"] / 1e6, 6)
        out["n_gaps"] = out["n_gaps"].astype("int64")
        return out[["user_id", "event_type", "n_gaps", "mean_gap_s"]]

    bucketed = ev.map_batches(add_bucket, batch_format="pandas",
                              batch_size=131072)
    return bucketed.groupby("bucket").map_groups(gaps, batch_format="pandas")


def events_hour_weekday_heatmap(sf_dir: str, n_buckets: int = 8):
    """Calendar heatmap grain: event counts and value sums per
    (weekday, hour-of-day) cell -- 168 cells total, the classic
    activity-rhythm view. Pure combiner aggregation.

    Output: (weekday [0=Sunday, DuckDB dayofweek], hour, n_events,
    sum_value r2).
    """
    import ray.data as rd

    from ..functions.rounding import round_series
    from ..stages.agg import grouped_agg

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["ts", "value"])

    def part(df: pd.DataFrame) -> pd.DataFrame:
        d = pd.DatetimeIndex(df["ts"])
        # pandas dayofweek: Monday=0; DuckDB dayofweek: Sunday=0
        wd = (d.dayofweek.to_numpy() + 1) % 7
        return (pd.DataFrame({"weekday": wd.astype(np.int64),
                              "hour": d.hour.to_numpy().astype(np.int64),
                              "value": df["value"].to_numpy()})
                .groupby(["weekday", "hour"], as_index=False)
                .agg(n_events=("value", "size"), sum_value=("value", "sum")))

    agg = grouped_agg(ev.map_batches(part, batch_format="pandas"),
                      ["weekday", "hour"],
                      {"n_events": ("n_events", "sum"),
                       "sum_value": ("sum_value", "sum")}, n_buckets=n_buckets)

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        df["n_events"] = df["n_events"].astype("int64")
        df["sum_value"] = round_series(df["sum_value"], 2)
        return df[["weekday", "hour", "n_events", "sum_value"]]

    return agg.map_batches(finish, batch_format="pandas").sort(
        ["weekday", "hour"])


def orders_rolling_30d_daily(sf_dir: str, window_days: int = 30,
                             n_buckets: int = 16):
    """Rolling 30-day order count for EVERY day in the order-date range
    (including gap days): the interval-counting pattern -- each order
    emits +1 at its day and -1 at day+window, partials combine per
    batch, one tiny keyed reduce sums deltas per day, and the cumsum
    runs on the gap-filled day grain (thousands of rows) on the driver.
    No range self-join, no window explode proportional to the window
    width.

    Output: (day_s, n_orders_30d) for each day between the first and
    last order date; day_s = epoch seconds of the day start.
    """
    import ray.data as rd

    from ..stages.agg import grouped_agg

    ds = rd.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_orderdate"])

    def deltas(df: pd.DataFrame) -> pd.DataFrame:
        day = (np.asarray(df["o_orderdate"], dtype="datetime64[us]")
               .astype(np.int64) // (86_400 * 1_000_000))
        up = pd.DataFrame({"day": day, "delta": 1})
        dn = pd.DataFrame({"day": day + window_days, "delta": -1})
        both = pd.concat([up, dn], ignore_index=True)
        return both.groupby("day", as_index=False).agg(delta=("delta", "sum"))

    def day_range(df: pd.DataFrame) -> pd.DataFrame:
        day = (np.asarray(df["o_orderdate"], dtype="datetime64[us]")
               .astype(np.int64) // (86_400 * 1_000_000))
        return pd.DataFrame({"mn": [int(day.min())], "mx": [int(day.max())]})

    agg = grouped_agg(ds.map_batches(deltas, batch_format="pandas"),
                      ["day"], {"delta": ("delta", "sum")},
                      # bound: day grain (calendar)
                      n_buckets=n_buckets).to_pandas().sort_values("day")
    days = agg["day"].to_numpy(dtype=np.int64)
    # output range = [first, last ORDER day] from the dates themselves
    # (the max net-delta day can cancel to <= 0 -- don't infer it)
    # bound: one (min,max) day pair per block
    mm = ds.map_batches(day_range, batch_format="pandas").to_pandas()
    lo = int(mm["mn"].min())
    hi = int(mm["mx"].max())
    full = np.arange(lo, hi + 1, dtype=np.int64)
    d = np.zeros(len(full), dtype=np.int64)
    inside = (days >= lo) & (days <= hi)
    d[days[inside] - lo] = agg["delta"].to_numpy()[inside]
    out = pd.DataFrame({
        "day_s": full * 86_400,
        "n_orders_30d": np.cumsum(d).astype("int64"),
    })
    return rd.from_pandas(out)


def event_type_geo_mean(sf_dir: str, n_buckets: int = 8):
    """Geometric mean of positive event values per type:
    exp(mean(ln v)) from one (sum_ln, n) combiner pass -- the
    log-domain mergeable aggregate (arithmetic mean overstates skewed
    value distributions; geo mean is the standard robust center).

    Output: (event_type, n_pos, geo_mean r6) sorted by type.
    """
    import ray.data as rd

    from ..functions.rounding import round_series
    from ..stages.agg import grouped_agg

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "value"])

    def part(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["value"] > 0]
        return (df.assign(ln=np.log(df["value"].to_numpy()))
                .groupby("event_type", as_index=False)
                .agg(sum_ln=("ln", "sum"), n_pos=("ln", "size")))

    agg = grouped_agg(ds.map_batches(part, batch_format="pandas"),
                      ["event_type"],
                      {"sum_ln": ("sum_ln", "sum"), "n_pos": ("n_pos", "sum")},
                      n_buckets=n_buckets)

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        df["geo_mean"] = round_series(
            pd.Series(np.exp(df["sum_ln"] / df["n_pos"])), 6)
        df["n_pos"] = df["n_pos"].astype("int64")
        return df[["event_type", "n_pos", "geo_mean"]]

    return agg.map_batches(finish, batch_format="pandas").sort("event_type")


def customer_adoption_curve(sf_dir: str, n_buckets: int = 32):
    """Cumulative customer adoption by month: new customers (first-ever
    order) per integer month plus the running total. First-order dates
    come from one per-customer combiner MIN (never the orders table
    through a shuffle twice); the month histogram and cumsum run on the
    tiny month grain.

    Output: (mon, n_new, n_cum) sorted by mon; mon = (year-1970)*12 +
    month-1, the repo's integer month convention.
    """
    import ray.data as rd

    from ..stages.agg import grouped_agg

    ds = rd.read_parquet(f"{sf_dir}/orders.parquet",
                         columns=["o_custkey", "o_orderdate"])

    def part(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("o_custkey", as_index=False).agg(
            first=("o_orderdate", "min"))

    first = grouped_agg(ds.map_batches(part, batch_format="pandas"),
                        ["o_custkey"], {"first": ("first", "min")},
                        n_buckets=n_buckets)

    # month histogram partials stay distributed (the customer dim is a
    # growing table -- never collected); only the month grain reaches
    # the driver for the cumsum
    def month_part(df: pd.DataFrame) -> pd.DataFrame:
        d = pd.DatetimeIndex(df["first"])
        mon = (d.year.to_numpy() - 1970) * 12 + d.month.to_numpy() - 1
        return (pd.DataFrame({"mon": mon})
                .groupby("mon", as_index=False).agg(n_new=("mon", "size")))

    hist = grouped_agg(first.map_batches(month_part, batch_format="pandas"),
                       ["mon"], {"n_new": ("n_new", "sum")},
                       # bound: month grain (calendar)
                       n_buckets=8).to_pandas().sort_values("mon")
    out = pd.DataFrame({
        "mon": hist["mon"].to_numpy(dtype=np.int64),
        "n_new": hist["n_new"].to_numpy(dtype=np.int64),
    })
    out["n_cum"] = out["n_new"].cumsum().astype("int64")
    return rd.from_pandas(out)


def orders_yoy(sf_dir: str, n_buckets: int = 16):
    """Year-over-year growth: monthly revenue vs the same month one
    year earlier.  Months are exact integers (months since epoch),
    revenue in exact cents; growth = (rev - prev) / prev on identical
    integer operands in both engines.  Only months with a 12-months-ago
    counterpart appear.

    Shape: one combiner reduce to the bounded MONTH grain, then a
    single-batch finish does the self-shift with a dict lookup -- no
    self-join, no gapfill shuffle.

    Output: (mon, rev_cents, prev_cents, yoy r6) sorted by mon.
    """
    import ray.data as rd

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderdate", "o_totalprice"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        d = np.asarray(df["o_orderdate"], dtype="datetime64[us]")
        mon = d.astype("datetime64[M]").astype(np.int64)
        cents = round_series(
            pd.Series(df["o_totalprice"].to_numpy(dtype=np.float64) * 100.0),
            0).to_numpy().astype(np.int64)
        return pd.DataFrame({"mon": mon, "cents": cents})

    monthly = grouped_agg(
        orders.map_batches(partial, batch_format="pandas",
                           batch_size=131072),
        ["mon"], {"cents": ("cents", "sum")}, n_buckets=n_buckets)

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values("mon")
        mon = df["mon"].to_numpy(dtype=np.int64)
        c = df["cents"].to_numpy(dtype=np.int64)
        prev = pd.Series(c, index=mon).reindex(mon - 12).to_numpy()
        keep = ~np.isnan(prev)
        prev_i = prev[keep].astype(np.int64)
        cur = c[keep]
        return pd.DataFrame({
            "mon": mon[keep],
            "rev_cents": cur,
            "prev_cents": prev_i,
            "yoy": round_series(
                pd.Series((cur - prev_i) / prev_i), 6).to_numpy(),
        })

    # bounded month grain: single-batch finish
    return (monthly.repartition(1)
            .map_batches(finish, batch_format="pandas", batch_size=1 << 20))


def benford_order_totals(sf_dir: str, n_buckets: int = 4):
    """Benford's-law first-significant-digit audit of order totals --
    the classic fraud/synthetic-data screen.  Digit taken from the
    decimal string of floor(o_totalprice) (all totals >= 1), so both
    engines extract it with exact integer/string ops, no log10-of-value
    float risk; the expected Benford share log10(1 + 1/d) and the
    observed fraction round at r6.

    Shape: per-batch partial counts per digit (<= 9 rows cross the
    wire per batch), one tiny keyed reduce, 9-row finish -- the order
    stream is never shuffled.

    Output: (digit, n, frac r6, p_benford r6) sorted by digit.
    """
    import ray.data as rd

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_totalprice"])

    def cells(df: pd.DataFrame) -> pd.DataFrame:
        dg = np.floor(df["o_totalprice"].to_numpy(dtype=np.float64)).astype(np.int64)
        while (dg >= 10).any():  # <= 6 strides: leading decimal digit
            dg = np.where(dg >= 10, dg // 10, dg)
        g = pd.DataFrame({"digit": dg})
        return g.groupby("digit", as_index=False).agg(n=("digit", "size"))

    counts = grouped_agg(
        orders.map_batches(cells, batch_format="pandas", batch_size=131072),
        ["digit"], {"n": ("n", "sum")}, n_buckets=n_buckets)

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        g = df.sort_values("digit").reset_index(drop=True)
        n = g["n"].to_numpy(dtype=np.int64)
        tot = int(n.sum())
        d = g["digit"].to_numpy(dtype=np.int64)
        return pd.DataFrame({
            "digit": d,
            "n": n,
            "frac": round_series(pd.Series(n / tot), 6).to_numpy(),
            "p_benford": round_series(
                pd.Series(np.log10(1.0 + 1.0 / d)), 6).to_numpy(),
        })

    # 9 digit rows: the finish legitimately runs in one tiny batch
    return (counts.repartition(1)
            .map_batches(finish, batch_format="pandas", batch_size=1 << 20))


def part_authority_hits(sf_dir: str, k: int = 20, n_buckets: int = 16):
    """HITS authority scores on the customer -> part bipartite purchase
    graph (Kleinberg): one unnormalized hub/authority sweep -- hub(u) =
    total items bought by u, authority(p) = sum over buyers of
    w_up * hub(u) -- then ONE normalization by the max at the end.  All
    intermediate sums are integer counts (exact in doubles), so the
    distributed sum order cannot drift the float tree; the only division
    happens once on the driver-visible top-k.

    Shape: lineitem joins orders on orderkey (one distributed hash
    join), (cust, part) combiner weights, hub totals via a keyed reduce
    joined back edge-side (second hash join -- customer cardinality is
    dimension-bounded but never collected), authority via a second
    keyed reduce, then a distributed sort+limit for the top-k (the
    driver sees k rows).

    Output: (p_partkey, authority r6, rk) -- top-k by raw authority
    desc, partkey asc; authority normalized to max = 1.
    """
    import ray
    import ray.data as rd

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_partkey"])
    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_custkey"])

    if ray.is_initialized():
        cpus = int(ray.cluster_resources().get("CPU", 4))
    else:
        cpus = 4
    nparts = max(2, cpus // 2)

    e = li.join(orders, join_type="inner", num_partitions=nparts,
                on=("l_orderkey",), right_on=("o_orderkey",))

    def w_partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["o_custkey", "l_partkey"], as_index=False,
                       sort=False).agg(w=("l_partkey", "size"))
        return g

    edges = grouped_agg(
        e.map_batches(w_partial, batch_format="pandas", batch_size=131072),
        ["o_custkey", "l_partkey"], {"w": ("w", "sum")}, n_buckets=n_buckets)

    hub = grouped_agg(edges, ["o_custkey"], {"hub": ("w", "sum")},
                      n_buckets=n_buckets)

    eh = edges.join(hub, join_type="inner", num_partitions=nparts,
                    on=("o_custkey",))

    def wa_partial(df: pd.DataFrame) -> pd.DataFrame:
        g = pd.DataFrame({
            "l_partkey": df["l_partkey"].to_numpy(dtype=np.int64),
            "wa": (df["w"].to_numpy(dtype=np.int64)
                   * df["hub"].to_numpy(dtype=np.int64)),
        })
        return g.groupby("l_partkey", as_index=False).agg(wa=("wa", "sum"))

    auth = grouped_agg(
        eh.map_batches(wa_partial, batch_format="pandas",
                       batch_size=131072),
        ["l_partkey"], {"wa": ("wa", "sum")}, n_buckets=n_buckets)

    # bound: k rows (distributed sort+limit; raw authorities are exact
    # int64 so the top-k and its max are order-independent)
    top = (auth.sort(["wa", "l_partkey"], descending=[True, False])
           .limit(k).to_pandas())
    mx = float(top["wa"].max())

    top = top.reset_index(drop=True)
    out = pd.DataFrame({
        "p_partkey": top["l_partkey"].to_numpy(dtype=np.int64),
        "authority": round_series(
            pd.Series(top["wa"].to_numpy(dtype=np.float64) / mx), 6
        ).to_numpy(),
        "rk": np.arange(1, len(top) + 1, dtype=np.int64),
    })
    return out


def user_decayed_value(sf_dir: str, half_life_days: float = 7.0,
                       n_buckets: int = 16):
    """Per-user exponentially time-decayed value score -- the standard
    recency-weighted engagement feature: sum of value * exp(-lambda *
    age_days) with lambda = ln(2) / half_life, ages measured from the
    global max timestamp in EXACT int64 microseconds before the single
    double division (both engines share the float tree; the summed
    per-row terms commute within the r6 rounding digit, same contract
    as every revenue sum in this suite).

    Shape: one scalar max-ts aggregate, then per-batch partial decayed
    sums per user -> one keyed combiner reduce. The event stream is
    never shuffled raw.

    Output: (user_id, n, decayed r6) sorted by user_id.
    """
    import ray.data as rd

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts", "value"])

    tmax_us = pd.Timestamp(ev.max("ts")).value // 1000  # ns -> us
    lam = np.log(2.0) / half_life_days

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        ts_us = (pd.to_datetime(df["ts"]).astype("datetime64[us]")
                 .astype("int64").to_numpy())
        age_days = (tmax_us - ts_us).astype(np.float64) / 86400000000.0
        dec = df["value"].to_numpy(dtype=np.float64) * np.exp(-lam * age_days)
        g = pd.DataFrame({"user_id": df["user_id"].to_numpy(dtype=np.int64),
                          "n": np.ones(len(df), dtype=np.int64),
                          "decayed": dec})
        return g.groupby("user_id", as_index=False).agg(
            n=("n", "sum"), decayed=("decayed", "sum"))

    agg = grouped_agg(
        ev.map_batches(partial, batch_format="pandas", batch_size=131072),
        ["user_id"], {"n": ("n", "sum"), "decayed": ("decayed", "sum")},
        n_buckets=n_buckets)

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "user_id": df["user_id"].to_numpy(dtype=np.int64),
            "n": df["n"].to_numpy(dtype=np.int64),
            "decayed": round_series(df["decayed"], 6).to_numpy(),
        })

    return agg.map_batches(finish, batch_format="pandas",
                           batch_size=131072).sort("user_id")


def customer_value_trend(sf_dir: str, n_buckets: int = 32):
    """Per-customer OLS trend of order value over time -- group-wise
    regression at REAL key cardinality (every customer, not a handful
    of types): slope in currency/day from the moment sums
    (n, Sx, Sy, Sxx, Sxy) accumulated as combiner partials per
    customer.  x = days since the 1992-01-01 epoch from exact integer
    dates, so both engines share the float tree; customers need >= 2
    distinct-x orders for a defined slope (degenerate ones drop out).

    Shape: one streaming pass emitting per-batch per-customer moment
    partials -> ONE keyed combiner reduce -> vectorized closed-form
    slope.  No window, no sort, no driver state: the canonical
    "per-entity model fit" shape that still works when customers number
    10^9.

    Output: (o_custkey, n, slope r6) sorted by custkey.
    """
    import ray.data as rd

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_custkey", "o_orderdate",
                                      "o_totalprice"])

    origin = np.datetime64("1992-01-01", "D").astype(np.int64)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        x = (np.asarray(df["o_orderdate"], dtype="datetime64[D]")
             .astype(np.int64) - origin).astype(np.float64)
        y = df["o_totalprice"].to_numpy(dtype=np.float64)
        g = pd.DataFrame({
            "o_custkey": df["o_custkey"].to_numpy(dtype=np.int64),
            "n": np.ones(len(df), dtype=np.int64),
            "sx": x, "sy": y, "sxx": x * x, "sxy": x * y,
        })
        return g.groupby("o_custkey", as_index=False).agg(
            n=("n", "sum"), sx=("sx", "sum"), sy=("sy", "sum"),
            sxx=("sxx", "sum"), sxy=("sxy", "sum"))

    agg = grouped_agg(
        orders.map_batches(partial, batch_format="pandas",
                           batch_size=131072),
        ["o_custkey"],
        {"n": ("n", "sum"), "sx": ("sx", "sum"), "sy": ("sy", "sum"),
         "sxx": ("sxx", "sum"), "sxy": ("sxy", "sum")},
        n_buckets=n_buckets)

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        n = df["n"].to_numpy(dtype=np.float64)
        sx = df["sx"].to_numpy()
        sy = df["sy"].to_numpy()
        sxx = df["sxx"].to_numpy()
        sxy = df["sxy"].to_numpy()
        denom = n * sxx - sx * sx
        ok = (df["n"].to_numpy() >= 2) & (denom != 0.0)
        slope = np.zeros(len(df))
        slope[ok] = (n[ok] * sxy[ok] - sx[ok] * sy[ok]) / denom[ok]
        out = pd.DataFrame({
            "o_custkey": df["o_custkey"].to_numpy(dtype=np.int64)[ok],
            "n": df["n"].to_numpy(dtype=np.int64)[ok],
            "slope": round_series(pd.Series(slope[ok]), 6).to_numpy(),
        })
        return out

    return (agg.map_batches(finish, batch_format="pandas",
                            batch_size=131072).sort("o_custkey"))


def orders_skyline(sf_dir: str):
    """2-D Pareto frontier (SKYLINE) of orders over (o_totalprice,
    o_orderdate): the orders no other order beats on BOTH price and
    recency -- the classic custom operator the Dataset API lacks.
    Domination: b dominates a iff b.price >= a.price AND b.date >=
    a.date AND at least one strictly greater (exact ties on both dims
    all survive).

    Shape: the skyline operator's textbook distributed form -- each
    batch computes its LOCAL skyline (one vectorized sorted prune;
    local skylines preserve the global skyline because domination is
    transitive), and only local survivors reach the final merge, which
    runs the IDENTICAL prune once more.  Survivor volume is the
    frontier size, not the corpus.

    Output: (o_orderkey, o_totalprice, date_s) sorted by o_orderkey;
    date_s = epoch seconds of the order date.
    """
    import ray.data as rd

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_totalprice",
                                      "o_orderdate"])

    def prune(g: pd.DataFrame) -> pd.DataFrame:
        """Drop dominated rows. dominated(i) = max{d : p > p_i} >= d_i
        OR max{d : p == p_i} > d_i -- both terms vectorized over the
        (p desc, d desc) sort."""
        g = g.sort_values(["o_totalprice", "date_s", "o_orderkey"],
                          ascending=[False, False, True]).reset_index(drop=True)
        p = g["o_totalprice"].to_numpy()
        d = g["date_s"].to_numpy()
        grp_max_d = pd.Series(d).groupby(p, sort=False).transform("max").to_numpy()
        run = np.maximum.accumulate(d)
        new_grp = np.concatenate(([True], p[1:] != p[:-1]))
        starts = np.flatnonzero(new_grp)
        prev_run = np.concatenate(
            ([np.iinfo(np.int64).min], run[:-1]))[starts]
        prefix_max = np.repeat(prev_run, np.diff(
            np.concatenate((starts, [len(p)]))))
        dominated = (prefix_max >= d) | (grp_max_d > d)
        return g[~dominated]

    def local_skyline(df: pd.DataFrame) -> pd.DataFrame:
        d = np.asarray(df["o_orderdate"], dtype="datetime64[s]").astype(np.int64)
        g = pd.DataFrame({
            "o_orderkey": df["o_orderkey"].to_numpy(dtype=np.int64),
            "o_totalprice": df["o_totalprice"].to_numpy(dtype=np.float64),
            "date_s": d,
        })
        return prune(g)

    # local skylines preserve the global frontier; the union is
    # frontier-sized. bound: local-skyline survivor union
    cand = orders.map_batches(local_skyline, batch_format="pandas",
                              batch_size=131072).to_pandas()
    return (prune(cand).sort_values("o_orderkey").reset_index(drop=True)
            [["o_orderkey", "o_totalprice", "date_s"]])


def revenue_seasonal_decompose(sf_dir: str, window: int = 7,
                               n_buckets: int = 8):
    """Classical additive decomposition of daily order revenue:
    trend = centered ``window``-row moving average over the observed
    day sequence (partial frames at the edges, min_periods=1 ==
    SQL's ROWS BETWEEN k PRECEDING AND k FOLLOWING), weekday seasonal =
    mean detrended residual per weekday (Monday=0 origin), remainder =
    revenue - trend - seasonal.  The anomaly-screening view of the
    revenue series (a spike shows up in the remainder, not the level).

    Shape: one day-grain combiner over orders; the decomposition runs
    on the driver over the CALENDAR-BOUNDED day table (bound: observed
    days).  Row-based windows over observed days -- gapfill first if
    calendar exactness matters (orders_monthly_gapfill).

    Output: (day_s, revenue r2, trend r6, seasonal r6, resid r6)
    sorted by day.
    """
    import ray.data as rd

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderdate", "o_totalprice"])

    def cells(df: pd.DataFrame) -> pd.DataFrame:
        d = np.asarray(df["o_orderdate"], dtype="datetime64[D]")
        # integer cents: daily sums and window means stay EXACT doubles
        # (integers < 2^53), so rolling-sum accumulation cannot drift
        # the float tree vs the oracle's per-frame AVG
        cents = np.floor(df["o_totalprice"].to_numpy(dtype=np.float64)
                         * 100 + 0.5).astype(np.int64)
        g = pd.DataFrame({"day": d, "rev_c": cents})
        return g.groupby("day", as_index=False).agg(rev_c=("rev_c", "sum"))

    daily = grouped_agg(
        orders.map_batches(cells, batch_format="pandas",
                           batch_size=131072),
        ["day"], {"rev_c": ("rev_c", "sum")}, n_buckets=n_buckets)

    # bound: observed-day grain (the calendar, not the order stream)
    df = daily.to_pandas().sort_values("day").reset_index(drop=True)
    rev = df["rev_c"].to_numpy(dtype=np.int64) / 100.0
    trend = (pd.Series(df["rev_c"].to_numpy(dtype=np.float64))
             .rolling(window, center=True, min_periods=1)
             .mean().to_numpy()) / 100.0
    wd = pd.to_datetime(df["day"]).dt.dayofweek.to_numpy(dtype=np.int64)
    det = rev - trend
    seasonal_by_wd = pd.Series(det).groupby(wd).mean()
    seasonal = seasonal_by_wd.reindex(wd).to_numpy()
    resid = rev - trend - seasonal
    day_s = (np.asarray(df["day"], dtype="datetime64[s]")
             .astype(np.int64))
    return pd.DataFrame({
        "day_s": day_s,
        "revenue": round_series(pd.Series(rev), 2).to_numpy(),
        "trend": round_series(pd.Series(trend), 6).to_numpy(),
        "seasonal": round_series(pd.Series(seasonal), 6).to_numpy(),
        "resid": round_series(pd.Series(resid), 6).to_numpy(),
    })


def order_cohort_retention(sf_dir: str, max_offset: int = 8,
                           n_buckets: int = 16):
    """Quarterly cohort retention over orders: customers grouped by the
    quarter of their FIRST order; for each offset 0..max_offset, the
    share of the cohort that placed an order in cohort_quarter + offset
    -- the classic retention triangle, on the orders table.

    Quarter index = year * 4 + (quarter - 1), exact integer math in
    both engines.

    Shape: per-customer first-quarter (combiner min) and distinct
    (customer, quarter) activity (combiner max-one) -> cohort attaches
    to activity via ONE hash join keyed on customer -> (cohort, offset)
    combiner counts -> cohort-size divide at the |cohorts x offsets|
    finish.  The orders stream never shuffles raw.

    Output: (cohort_q, offset, n_active, retention r6) sorted; offset 0
    rows have retention 1.0 by construction.
    """
    import ray
    import ray.data as rd

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_custkey", "o_orderdate"])

    def qidx(dates) -> np.ndarray:
        d = pd.to_datetime(pd.Series(np.asarray(dates)))
        return (d.dt.year * 4 + (d.dt.quarter - 1)).to_numpy(
            dtype=np.int64)

    def first_part(df: pd.DataFrame) -> pd.DataFrame:
        g = pd.DataFrame({"c": df["o_custkey"].to_numpy(dtype=np.int64),
                          "q": qidx(df["o_orderdate"])})
        return g.groupby("c", as_index=False).agg(fq=("q", "min"))

    first = grouped_agg(
        orders.map_batches(first_part, batch_format="pandas",
                           batch_size=131072),
        ["c"], {"fq": ("fq", "min")}, n_buckets=n_buckets)

    def act_part(df: pd.DataFrame) -> pd.DataFrame:
        g = pd.DataFrame({"c": df["o_custkey"].to_numpy(dtype=np.int64),
                          "q": qidx(df["o_orderdate"]),
                          "one": np.ones(len(df), dtype=np.int64)})
        return g.groupby(["c", "q"], as_index=False).agg(one=("one", "max"))

    act = grouped_agg(
        orders.map_batches(act_part, batch_format="pandas",
                           batch_size=131072),
        ["c", "q"], {"one": ("one", "max")}, n_buckets=n_buckets)

    if ray.is_initialized():
        cpus = int(ray.cluster_resources().get("CPU", 4))
    else:
        cpus = 4
    j = act.join(first, join_type="inner",
                 num_partitions=max(2, cpus // 2), on=("c",))

    def off_part(df: pd.DataFrame) -> pd.DataFrame:
        off = df["q"].to_numpy(dtype=np.int64) - df["fq"].to_numpy(
            dtype=np.int64)
        keep = off <= max_offset
        g = pd.DataFrame({"cohort_q": df["fq"].to_numpy(
            dtype=np.int64)[keep], "offset": off[keep],
            "one": np.ones(int(keep.sum()), dtype=np.int64)})
        return g.groupby(["cohort_q", "offset"], as_index=False).agg(
            n_active=("one", "sum"))

    cells = grouped_agg(
        j.map_batches(off_part, batch_format="pandas",
                      batch_size=131072),
        ["cohort_q", "offset"], {"n_active": ("n_active", "sum")},
        n_buckets=8)

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["cohort_q", "offset"]).reset_index(drop=True)
        base = df.loc[df["offset"] == 0].set_index("cohort_q")["n_active"]
        size = df["cohort_q"].map(base).to_numpy(dtype=np.float64)
        return pd.DataFrame({
            "cohort_q": df["cohort_q"].to_numpy(dtype=np.int64),
            "offset": df["offset"].to_numpy(dtype=np.int64),
            "n_active": df["n_active"].to_numpy(dtype=np.int64),
            "retention": round_series(
                pd.Series(df["n_active"].to_numpy(dtype=np.float64)
                          / size), 6).to_numpy(),
        })

    # |cohorts x offsets| cells: the finish legitimately runs in one batch
    return (cells.repartition(1)
            .map_batches(finish, batch_format="pandas",
                         batch_size=1 << 20))


def events_windowed_funnel(sf_dir: str, window_hours: int = 168,
                           n_buckets: int = 64):
    """Three-step WINDOWED funnel view -> click -> purchase: each next
    step must land STRICTLY AFTER the previous step and within
    ``window_hours`` of it -- the time-bound conversion definition
    product analytics actually uses (an unbounded funnel overcounts).
    First qualifying event per step (earliest-anchor semantics: t2 =
    first click in (t1, t1+W], t3 = first purchase in (t2, t2+W]).

    Shape: batch-level prefilter to the three step types, ONE bucketed
    keyed shuffle on user_id, then a vectorized per-bucket kernel
    (three chained groupby-min + window-filtered merges). No self-join
    of the log, no driver state.

    Output: (user_id, t1_us, t2_us [-1], t3_us [-1], stage 1|2|3)
    sorted by user_id, for every user with a view event.
    """
    import ray.data as rd

    w_us = window_hours * 3_600_000_000

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts", "event_type"])

    def prefilter(df: pd.DataFrame) -> pd.DataFrame:
        m = df[df["event_type"].isin(("view", "click", "purchase"))]
        out = pd.DataFrame({
            "user_id": m["user_id"].to_numpy(dtype=np.int64),
            "t": np.asarray(m["ts"], dtype="datetime64[us]")
                 .astype(np.int64),
            "event_type": m["event_type"].to_numpy()})
        return out.assign(bucket=(out["user_id"] % n_buckets)
                          .astype("int32"))

    def funnel(df: pd.DataFrame) -> pd.DataFrame:
        s1 = (df[df["event_type"] == "view"]
              .groupby("user_id", as_index=False)["t"].min()
              .rename(columns={"t": "t1"}))
        if s1.empty:
            return pd.DataFrame({"user_id": pd.Series(dtype="int64"),
                                 "t1_us": pd.Series(dtype="int64"),
                                 "t2_us": pd.Series(dtype="int64"),
                                 "t3_us": pd.Series(dtype="int64"),
                                 "stage": pd.Series(dtype="int64")})
        c = df[df["event_type"] == "click"].merge(s1, on="user_id")
        c = c[(c["t"] > c["t1"]) & (c["t"] <= c["t1"] + w_us)]
        s2 = (c.groupby("user_id", as_index=False)["t"].min()
              .rename(columns={"t": "t2"}))
        p = df[df["event_type"] == "purchase"].merge(s2, on="user_id")
        p = p[(p["t"] > p["t2"]) & (p["t"] <= p["t2"] + w_us)]
        s3 = (p.groupby("user_id", as_index=False)["t"].min()
              .rename(columns={"t": "t3"}))
        out = (s1.merge(s2, on="user_id", how="left")
               .merge(s3, on="user_id", how="left"))
        stage = np.where(out["t3"].notna(), 3,
                         np.where(out["t2"].notna(), 2, 1))
        return pd.DataFrame({
            "user_id": out["user_id"].to_numpy(dtype=np.int64),
            "t1_us": out["t1"].to_numpy(dtype=np.int64),
            "t2_us": out["t2"].fillna(-1).to_numpy(dtype=np.int64),
            "t3_us": out["t3"].fillna(-1).to_numpy(dtype=np.int64),
            "stage": stage.astype(np.int64),
        })

    return (ev.map_batches(prefilter, batch_format="pandas",
                           batch_size=131072)
            .groupby("bucket")
            .map_groups(lambda g: funnel(g.drop(columns=["bucket"])),
                        batch_format="pandas")
            .sort("user_id"))
