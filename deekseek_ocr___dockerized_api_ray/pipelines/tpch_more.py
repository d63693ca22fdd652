"""Second batch of TPC-H-shaped relational pipelines (q7/q8/q9/q13/q15/q22
analogues over the sandbox schema -- no partsupp table, so q9 profit is
revenue-based and q2/q11/q16/q20 are out of scope).

Same scale rules as pipelines/analytics.py:

  - every read is column-pruned
  - facts are reduced with the partial+bucketed ``grouped_agg`` combiner
    BEFORE anything wide
  - tiny dims (nation, supplier) broadcast as VecLookup arrays via
    ``ray.put``; growing dims (customer, orders) broadcast only under an
    explicit row gate with a live hash-join path above it
  - float thresholds that gate row membership are computed in integer
    cents so the engine and the DuckDB oracle agree bitwise (q22)
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..functions.rounding import round_series
from ..stages.agg import grouped_agg
from .analytics import _join_partitions


def _tiny_report(ds, dtypes: dict[str, str], sort_cols: list[str],
                 ascending: list[bool] | None = None) -> pd.DataFrame:
    """Collect a tiny (<= hundreds of rows by construction) aggregate as
    a pandas report with a STABLE schema even when empty -- an empty Ray
    Dataset loses its column names, which would break the driver's
    schema compare on legitimately-empty small-sf results."""
    # bound: callers pass report-grain datasets only (schema-stabilizing helper)
    df = ds.to_pandas()
    if df.empty:
        df = pd.DataFrame({c: pd.Series(dtype=t) for c, t in dtypes.items()})
    return (df[list(dtypes)]
            .sort_values(sort_cols, ascending=ascending or [True] * len(sort_cols))
            .reset_index(drop=True))


def _nation_names(sf_dir: str) -> dict[int, str]:
    import pyarrow.parquet as pq

    nat = pq.read_table(f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"])
    return dict(zip(nat.column("n_nationkey").to_pylist(),
                    nat.column("n_name").to_pylist()))


def _supplier_nation_lut(sf_dir: str):
    """VecLookup s_suppkey -> s_nationkey (tiny dim, broadcast)."""
    import pyarrow.parquet as pq

    from ..functions.lookup import VecLookup

    sup = pq.read_table(f"{sf_dir}/supplier.parquet",
                        columns=["s_suppkey", "s_nationkey"])
    return VecLookup(sup.column("s_suppkey").to_numpy(zero_copy_only=False),
                     sup.column("s_nationkey").to_numpy(zero_copy_only=False))


def _order_lut(sf_dir: str, value_col: str, values: np.ndarray | None = None,
               mask: np.ndarray | None = None):
    """VecLookup o_orderkey -> derived order attribute (gated broadcast
    helper for the q5-shaped one-pass plans)."""
    import pyarrow.parquet as pq

    from ..functions.lookup import VecLookup

    cols = ["o_orderkey"] + ([] if values is not None else [value_col])
    ot = pq.read_table(f"{sf_dir}/orders.parquet", columns=cols)
    okey = ot.column("o_orderkey").to_numpy(zero_copy_only=False)
    vals = values if values is not None else ot.column(value_col).to_numpy(zero_copy_only=False)
    if mask is not None:
        okey, vals = okey[mask], vals[mask]
    return VecLookup(okey, vals)


def nation_trade_volume_q7(sf_dir: str, nations: tuple[int, ...] = (0, 1, 2, 3, 4),
                           broadcast_rows: int = 5_000_000):
    """TPC-H q7 analogue: cross-nation shipping volume by year within a
    nation group (q7's two-nation pair is too sparse on this generator's
    small scales, so the group generalizes it: every ordered cross pair
    inside ``nations``).

    Revenue of lineitems shipped 1996-1997 where supplier nation and
    customer nation are distinct members of the group, grouped by the
    ordered pair and ship year.

    Shape: the supplier-side filter (suppkey -> nation in {A,B}) is a
    broadcast VecLookup applied IN the first streaming pass over
    lineitem, cutting the fact to ~2/25 before anything else. The
    customer nation reaches the lineitem through an
    orderkey -> cust-nation lookup: built driver-side under the row gate
    (two pruned dim reads), or via orders JOIN customer then
    lineitem JOIN orders above it. Final groupby is 4 keys -- tiny.

    Output: (supp_nation, cust_nation, l_year, revenue r2).
    """
    import pyarrow.parquet as pq
    import ray
    import ray.data as rd

    from ..functions.lookup import VecLookup

    _Q7_DTYPES = {"supp_nation": "object", "cust_nation": "object",
                  "l_year": "int64", "revenue": "float64"}

    n2name = _nation_names(sf_dir)
    pair = set(nations)
    sup_ref = ray.put(_supplier_nation_lut(sf_dir))

    lo = np.datetime64("1996-01-01", "us")
    hi = np.datetime64("1998-01-01", "us")

    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount",
                 "l_shipdate"],
    )

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        df["supp_nation"] = df["s_nat"].map(n2name)
        df["cust_nation"] = df["c_nat"].map(n2name)
        df["revenue"] = round_series(df["revenue"], 2)
        return df[["supp_nation", "cust_nation", "l_year", "revenue"]]

    n_orders = pq.ParquetFile(f"{sf_dir}/orders.parquet").metadata.num_rows
    if n_orders <= broadcast_rows:
        ot = pq.read_table(f"{sf_dir}/orders.parquet",
                           columns=["o_orderkey", "o_custkey"])
        ct = pq.read_table(f"{sf_dir}/customer.parquet",
                           columns=["c_custkey", "c_nationkey"])
        cust_lut = VecLookup(ct.column("c_custkey").to_numpy(zero_copy_only=False),
                             ct.column("c_nationkey").to_numpy(zero_copy_only=False))
        onat, _ = cust_lut.lookup(ot.column("o_custkey").to_numpy(zero_copy_only=False))
        keep = np.isin(onat, list(pair))  # only orders from the two nations
        o2nat_ref = ray.put(_order_lut(sf_dir, "", values=onat, mask=keep))

        def one_pass(df: pd.DataFrame) -> pd.DataFrame:
            s_lut: VecLookup = ray.get(sup_ref)
            o_lut: VecLookup = ray.get(o2nat_ref)
            ship = np.asarray(df["l_shipdate"], dtype="datetime64[us]")
            sn, _ = s_lut.lookup(df["l_suppkey"].to_numpy())
            m = (ship >= lo) & (ship < hi) & np.isin(sn, list(pair))
            if not m.any():
                return pd.DataFrame({"s_nat": np.array([], np.int64),
                                     "c_nat": np.array([], np.int64),
                                     "l_year": np.array([], np.int64),
                                     "rev": np.array([], np.float64)})
            cn, found = o_lut.lookup(df["l_orderkey"].to_numpy()[m])
            sn = sn[m]
            cross = found & (sn != cn)  # (A,B) or (B,A), both in pair
            rev = (df["l_extendedprice"].to_numpy()[m]
                   * (1.0 - df["l_discount"].to_numpy()[m]))[cross]
            year = ship[m][cross].astype("datetime64[Y]").astype(np.int64) + 1970
            return pd.DataFrame({"s_nat": sn[cross], "c_nat": cn[cross],
                                 "l_year": year, "rev": rev})

        agg = grouped_agg(
            li.map_batches(one_pass, batch_format="pandas", batch_size=131072),
            ["s_nat", "c_nat", "l_year"], {"revenue": ("rev", "sum")}, n_buckets=8)
        return _tiny_report(agg.map_batches(finish, batch_format="pandas"),
                            _Q7_DTYPES, ["supp_nation", "cust_nation", "l_year"])

    # hash-join path: orders(pair-nation customers) JOIN customer, then
    # supplier-filtered lineitem JOIN those orders on orderkey.
    cust = rd.read_parquet(f"{sf_dir}/customer.parquet",
                           columns=["c_custkey", "c_nationkey"])
    cust_pair = cust.map_batches(
        lambda df: df[df["c_nationkey"].isin(pair)], batch_format="pandas")
    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_custkey"])
    o_nat = orders.join(cust_pair, join_type="inner",
                        num_partitions=_join_partitions(n_orders),
                        on=("o_custkey",), right_on=("c_custkey",))

    def li_prep(df: pd.DataFrame) -> pd.DataFrame:
        from ..functions.lookup import VecLookup as VL  # noqa: F401

        s_lut = ray.get(sup_ref)
        ship = np.asarray(df["l_shipdate"], dtype="datetime64[us]")
        sn, _ = s_lut.lookup(df["l_suppkey"].to_numpy())
        m = (ship >= lo) & (ship < hi) & np.isin(sn, list(pair))
        return pd.DataFrame({
            "l_orderkey": df["l_orderkey"].to_numpy()[m],
            "s_nat": sn[m],
            "l_year": ship[m].astype("datetime64[Y]").astype(np.int64) + 1970,
            "rev": (df["l_extendedprice"].to_numpy()[m]
                    * (1.0 - df["l_discount"].to_numpy()[m])),
        })

    li_f = li.map_batches(li_prep, batch_format="pandas", batch_size=131072)
    joined = li_f.join(o_nat, join_type="inner",
                       num_partitions=_join_partitions(n_orders),
                       on=("l_orderkey",), right_on=("o_orderkey",))

    def cross_only(df: pd.DataFrame) -> pd.DataFrame:
        keep = df["s_nat"].to_numpy() != df["c_nationkey"].to_numpy(dtype=np.int64)
        out = df.loc[keep, ["s_nat", "c_nationkey", "l_year", "rev"]]
        return out.rename(columns={"c_nationkey": "c_nat"})

    agg = grouped_agg(joined.map_batches(cross_only, batch_format="pandas"),
                      ["s_nat", "c_nat", "l_year"],
                      {"revenue": ("rev", "sum")}, n_buckets=8)
    return _tiny_report(agg.map_batches(finish, batch_format="pandas"),
                        _Q7_DTYPES, ["supp_nation", "cust_nation", "l_year"])


def market_share_q8(sf_dir: str, target_nation: int = 3, region: int = 1,
                    part_type: str = "ECONOMY"):
    """TPC-H q8 analogue: target nation's share of region-1 customers'
    ECONOMY-part revenue by order year (1996-1997).

    Shape: part is filtered to one type and ships as a broadcast key
    array (p_type has 6 values -> ~1/6 of part; part is a SLOWLY growing
    dim, and only int keys ship). The region's customer set reaches the
    plan as orderkey -> (year, in-region) driver-built lookups under the
    same gate discipline as q5/q7 -- region math happens on the tiny
    nation dim. Revenue splits per (year, supplier==target) inside the
    streaming pass; the final agg is <= a few rows per year.

    Output: (o_year, mkt_share r6).
    """
    import pyarrow.parquet as pq
    import ray
    import ray.data as rd

    from ..functions.lookup import VecLookup

    nat = pq.read_table(f"{sf_dir}/nation.parquet",
                        columns=["n_nationkey", "n_regionkey"])
    region_nations = {
        k for k, r in zip(nat.column("n_nationkey").to_pylist(),
                          nat.column("n_regionkey").to_pylist()) if r == region
    }
    pt = pq.read_table(f"{sf_dir}/part.parquet", columns=["p_partkey", "p_type"])
    part_keys = pt.column("p_partkey").to_numpy(zero_copy_only=False)[
        # bound: 2-col part dim filter build; gate to the hash-join variant at web scale
        pt.column("p_type").to_pandas().to_numpy() == part_type]
    part_keys.sort()
    part_ref = ray.put(part_keys)
    sup_ref = ray.put(_supplier_nation_lut(sf_dir))

    ot = pq.read_table(f"{sf_dir}/orders.parquet",
                       columns=["o_orderkey", "o_custkey", "o_orderdate"])
    od = ot.column("o_orderdate").to_numpy(zero_copy_only=False)
    year = od.astype("datetime64[Y]").astype(np.int64) + 1970
    in_window = (year >= 1996) & (year <= 1997)
    ct = pq.read_table(f"{sf_dir}/customer.parquet",
                       columns=["c_custkey", "c_nationkey"])
    cust_lut = VecLookup(ct.column("c_custkey").to_numpy(zero_copy_only=False),
                         ct.column("c_nationkey").to_numpy(zero_copy_only=False))
    cnat, _ = cust_lut.lookup(ot.column("o_custkey").to_numpy(zero_copy_only=False))
    keep = in_window & np.isin(cnat, list(region_nations))
    o2year_ref = ray.put(_order_lut(sf_dir, "", values=year, mask=keep))

    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice",
                 "l_discount"],
    )

    def one_pass_vec(df: pd.DataFrame) -> pd.DataFrame:
        pk = ray.get(part_ref)
        s_lut: VecLookup = ray.get(sup_ref)
        o_lut: VecLookup = ray.get(o2year_ref)
        lpart = df["l_partkey"].to_numpy()
        idx = np.clip(np.searchsorted(pk, lpart), 0, max(len(pk) - 1, 0))
        is_part = (pk[idx] == lpart) if len(pk) else np.zeros(len(lpart), bool)
        yr, found = o_lut.lookup(df["l_orderkey"].to_numpy())
        m = is_part & found
        if not m.any():
            return pd.DataFrame({"o_year": np.array([], np.int64),
                                 "target_rev": np.array([], np.float64),
                                 "total_rev": np.array([], np.float64)})
        sn, _ = s_lut.lookup(df["l_suppkey"].to_numpy()[m])
        rev = (df["l_extendedprice"].to_numpy()[m]
               * (1.0 - df["l_discount"].to_numpy()[m]))
        tgt = np.where(sn == target_nation, rev, 0.0)
        g = pd.DataFrame({"o_year": yr[m], "target_rev": tgt, "total_rev": rev})
        return g.groupby("o_year", as_index=False, sort=False).sum()

    parts = li.map_batches(one_pass_vec, batch_format="pandas", batch_size=131072)
    agg = grouped_agg(parts, ["o_year"],
                      {"target_rev": ("target_rev", "sum"),
                       "total_rev": ("total_rev", "sum")}, n_buckets=4)

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        share = 100.0 * df["target_rev"] / df["total_rev"]
        return pd.DataFrame({"o_year": df["o_year"].astype("int64"),
                             "mkt_share": round_series(share, 6)})

    return agg.map_batches(finish, batch_format="pandas").sort("o_year")


def product_profit_q9(sf_dir: str, name_substr: str = "widget",
                      broadcast_rows: int = 5_000_000):
    """TPC-H q9 analogue (no partsupp -> profit is discounted revenue):
    revenue from parts whose name contains a substring, grouped by
    supplier nation and order year.

    Shape: part name filter -> sorted broadcast key array (substring
    selects ~1/5 of a slowly-growing dim; int keys only). Supplier
    nation is a broadcast VecLookup. Order year reaches lineitem via the
    gated orderkey -> year lookup (driver-built under the gate,
    lineitem JOIN orders above it). One streaming pass + 8-bucket agg.

    Revenue is summed EXACTLY in fixed point (price cents x discount
    basis points -> int64), so the result is independent of summation
    order and agrees with the DuckDB oracle (which uses the same integer
    form) bitwise. Float SUM order differences were observed to flip a
    ROUND(.,2) boundary at sf0.01.

    Output: (n_name, o_year, profit r2) sorted n_name, o_year desc.
    """
    import pyarrow.parquet as pq
    import ray
    import ray.data as rd

    from ..functions.lookup import VecLookup

    n2name = _nation_names(sf_dir)
    pt = pq.read_table(f"{sf_dir}/part.parquet", columns=["p_partkey", "p_name"])
    # bound: 2-col part dim (p_name prefix scan); gate to hash join at web scale
    names = pt.column("p_name").to_pandas()
    part_keys = pt.column("p_partkey").to_numpy(zero_copy_only=False)[
        names.str.contains(name_substr, regex=False).to_numpy()]
    part_keys.sort()
    part_ref = ray.put(part_keys)
    sup_ref = ray.put(_supplier_nation_lut(sf_dir))

    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice",
                 "l_discount"],
    )

    def _rev_e4(df: pd.DataFrame, m: np.ndarray) -> np.ndarray:
        cents = np.rint(df["l_extendedprice"].to_numpy()[m] * 100.0).astype(np.int64)
        bps = 100 - np.rint(df["l_discount"].to_numpy()[m] * 100.0).astype(np.int64)
        return cents * bps  # revenue x 10^4, exact

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        df["n_name"] = df["s_nat"].map(n2name)
        df["profit"] = round_series(df["profit_e4"] / 10000.0, 2)
        df["o_year"] = df["o_year"].astype("int64")
        return df[["n_name", "o_year", "profit"]]

    n_orders = pq.ParquetFile(f"{sf_dir}/orders.parquet").metadata.num_rows
    if n_orders <= broadcast_rows:
        ot = pq.read_table(f"{sf_dir}/orders.parquet",
                           columns=["o_orderkey", "o_orderdate"])
        year = (ot.column("o_orderdate").to_numpy(zero_copy_only=False)
                .astype("datetime64[Y]").astype(np.int64) + 1970)
        o2year_ref = ray.put(_order_lut(sf_dir, "", values=year))

        def one_pass(df: pd.DataFrame) -> pd.DataFrame:
            pk = ray.get(part_ref)
            s_lut: VecLookup = ray.get(sup_ref)
            o_lut: VecLookup = ray.get(o2year_ref)
            lpart = df["l_partkey"].to_numpy()
            idx = np.clip(np.searchsorted(pk, lpart), 0, max(len(pk) - 1, 0))
            m = (pk[idx] == lpart) if len(pk) else np.zeros(len(lpart), bool)
            if not m.any():
                return pd.DataFrame({"s_nat": np.array([], np.int64),
                                     "o_year": np.array([], np.int64),
                                     "rev_e4": np.array([], np.int64)})
            sn, _ = s_lut.lookup(df["l_suppkey"].to_numpy()[m])
            yr, _ = o_lut.lookup(df["l_orderkey"].to_numpy()[m])
            return pd.DataFrame({"s_nat": sn, "o_year": yr,
                                 "rev_e4": _rev_e4(df, m)})

        agg = grouped_agg(
            li.map_batches(one_pass, batch_format="pandas", batch_size=131072),
            ["s_nat", "o_year"], {"profit_e4": ("rev_e4", "sum")}, n_buckets=8)
        return (agg.map_batches(finish, batch_format="pandas")
                   .sort(["n_name", "o_year"], descending=[False, True]))

    def li_prep(df: pd.DataFrame) -> pd.DataFrame:
        pk = ray.get(part_ref)
        s_lut: VecLookup = ray.get(sup_ref)
        lpart = df["l_partkey"].to_numpy()
        idx = np.clip(np.searchsorted(pk, lpart), 0, max(len(pk) - 1, 0))
        m = (pk[idx] == lpart) if len(pk) else np.zeros(len(lpart), bool)
        sn, _ = s_lut.lookup(df["l_suppkey"].to_numpy()[m])
        return pd.DataFrame({
            "l_orderkey": df["l_orderkey"].to_numpy()[m],
            "s_nat": sn,
            "rev_e4": _rev_e4(df, m),
        })

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_orderdate"])

    def o_prep(df: pd.DataFrame) -> pd.DataFrame:
        od = np.asarray(df["o_orderdate"], dtype="datetime64[us]")
        return pd.DataFrame({
            "o_orderkey": df["o_orderkey"].to_numpy(),
            "o_year": od.astype("datetime64[Y]").astype(np.int64) + 1970,
        })

    joined = li.map_batches(li_prep, batch_format="pandas", batch_size=131072).join(
        orders.map_batches(o_prep, batch_format="pandas"),
        join_type="inner", num_partitions=_join_partitions(n_orders),
        on=("l_orderkey",), right_on=("o_orderkey",),
    )
    agg = grouped_agg(joined, ["s_nat", "o_year"],
                      {"profit_e4": ("rev_e4", "sum")}, n_buckets=8)
    return (agg.map_batches(finish, batch_format="pandas")
               .sort(["n_name", "o_year"], descending=[False, True]))


def customer_distribution_q13(sf_dir: str):
    """TPC-H q13 analogue: distribution of customers by order count,
    including zero-order customers.

    Shape: ONE combiner aggregation (orders -> count per custkey), then a
    SECOND tiny combiner over the counts themselves (the histogram's key
    cardinality is <= max orders per customer, i.e. tens). Zero-order
    customers never need the join TPC-H writes: their count is
    |customer| - |distinct custkeys in orders| -- both scalars the plan
    already has (parquet metadata + the first agg's row count). No
    customer-table scan at all.

    Output: (c_count, custdist) sorted custdist desc, c_count desc.
    """
    import pyarrow.parquet as pq
    import ray.data as rd

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_custkey"])
    per_cust = grouped_agg(orders, ["o_custkey"], {"c_count": ("o_custkey", "size")})

    hist = grouped_agg(per_cust, ["c_count"],
                       {"custdist": ("c_count", "size")}, n_buckets=4)
    # bound: <= max-orders-per-customer rows
    hist_df = hist.to_pandas()  # <= max-orders-per-customer rows: tiny

    n_customers = pq.ParquetFile(f"{sf_dir}/customer.parquet").metadata.num_rows
    n_with_orders = int(hist_df["custdist"].sum())
    zero = n_customers - n_with_orders
    if zero > 0:
        hist_df = pd.concat(
            [hist_df, pd.DataFrame({"c_count": [0], "custdist": [zero]})],
            ignore_index=True)
    hist_df["c_count"] = hist_df["c_count"].astype("int64")
    hist_df["custdist"] = hist_df["custdist"].astype("int64")
    return (hist_df.sort_values(["custdist", "c_count"], ascending=[False, False])
            .reset_index(drop=True))


def top_supplier_q15(sf_dir: str):
    """TPC-H q15 analogue: the supplier(s) with maximum revenue in
    1996-Q1.

    Shape: combiner agg lineitem -> (suppkey, revenue r2), driver-side
    max over the (supplier-cardinality, already tiny) aggregate via
    Dataset.max, filter to the max, then a POINT READ of supplier
    metadata for the <= handful of winners (q18's k-row attach pattern;
    never a supplier-table hash join for k rows). Revenue is rounded to
    2 before the max on BOTH sides so the tie boundary is stable.

    Output: (s_suppkey, s_name, total_revenue) sorted s_suppkey.
    """
    import pyarrow.compute as pc
    import pyarrow.parquet as pq
    import ray.data as rd

    lo = np.datetime64("1996-01-01", "us")
    hi = np.datetime64("1996-04-01", "us")

    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_suppkey", "l_extendedprice", "l_discount", "l_shipdate"],
    )

    def prep(df: pd.DataFrame) -> pd.DataFrame:
        ship = np.asarray(df["l_shipdate"], dtype="datetime64[us]")
        m = (ship >= lo) & (ship < hi)
        return pd.DataFrame({
            "l_suppkey": df["l_suppkey"].to_numpy()[m],
            "rev": (df["l_extendedprice"].to_numpy()[m]
                    * (1.0 - df["l_discount"].to_numpy()[m])),
        })

    per_supp = grouped_agg(li.map_batches(prep, batch_format="pandas",
                                          batch_size=131072),
                           ["l_suppkey"], {"total_revenue": ("rev", "sum")})
    rounded = per_supp.map_batches(
        lambda df: df.assign(total_revenue=round_series(df["total_revenue"], 2)),
        batch_format="pandas")
    rounded = rounded.materialize()  # consumed twice: max + filter
    best = rounded.max("total_revenue")
    # bound: suppliers tied at the max revenue
    winners = rounded.filter(expr=f"total_revenue == {best!r}").to_pandas()

    st = pq.read_table(f"{sf_dir}/supplier.parquet",
                       columns=["s_suppkey", "s_name"],
                       filters=pc.field("s_suppkey").isin(winners["l_suppkey"].tolist()))
    # bound: point-read of the winning suppliers
    out = st.to_pandas().merge(winners.rename(columns={"l_suppkey": "s_suppkey"}),
                               on="s_suppkey")
    return (out[["s_suppkey", "s_name", "total_revenue"]]
            .sort_values("s_suppkey").reset_index(drop=True))


def lapsed_rich_customers_q22(sf_dir: str, nations: tuple[int, ...] = (1, 3, 5, 7, 9, 11, 13),
                              cutoff: str = "2000-01-01"):
    """TPC-H q22 analogue: per-nation count + balance of above-average-
    balance customers (within a nation subset) with no orders on/after
    ``cutoff`` (this generator gives every customer at least one order
    ever, so q22's "never ordered" becomes "lapsed since cutoff").

    The "above average" threshold is evaluated in INTEGER CENTS:
    acctbal_cents * n_positive > total_positive_cents, which is exact in
    int64 -- the engine and the DuckDB oracle agree bitwise regardless of
    float summation order (the oracle SQL uses the same integer form).

    Shape: customer scans once with a combiner that emits per-batch
    (count, cents-sum) partials for the threshold plus the candidate
    rows; never-ordered is an anti-join against the DISTINCT order
    custkeys -- reduced to one int64 row per customer by the same
    combiner agg, then hash-joined (left anti via bloom-free exact set
    difference within buckets). At this schema's scale the distinct-key
    side stays a Dataset end to end.

    Output: (c_nationkey, numcust, totacctbal r2) sorted c_nationkey.
    """
    import ray.data as rd

    nations_set = set(nations)

    cust = rd.read_parquet(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_nationkey", "c_acctbal"],
    )

    # pass 1 partials: positive-balance cents total + count (for the
    # threshold), restricted to the nation subset
    def bal_partial(df: pd.DataFrame) -> pd.DataFrame:
        m = df["c_nationkey"].isin(nations_set).to_numpy() & (df["c_acctbal"].to_numpy() > 0.0)
        cents = np.rint(df["c_acctbal"].to_numpy()[m] * 100.0).astype(np.int64)
        return pd.DataFrame({"k": [0], "cents": [int(cents.sum())],
                             "n": [int(m.sum())]})

    bal = grouped_agg(cust.map_batches(bal_partial, batch_format="pandas",
                                       batch_size=131072),
                      ["k"], {"cents": ("cents", "sum"), "n": ("n", "sum")},
                      # bound: single-cell aggregate
                      n_buckets=1).to_pandas()
    total_cents, n_pos = int(bal["cents"].iloc[0]), int(bal["n"].iloc[0])

    # candidates: nation subset, cents * n_pos > total_cents (exact)
    def candidates(df: pd.DataFrame) -> pd.DataFrame:
        m = df["c_nationkey"].isin(nations_set).to_numpy()
        cents = np.rint(df["c_acctbal"].to_numpy() * 100.0).astype(np.int64)
        m &= cents * n_pos > total_cents
        return df.loc[m, ["c_custkey", "c_nationkey", "c_acctbal"]]

    cand = cust.map_batches(candidates, batch_format="pandas", batch_size=131072)

    # anti-join: distinct RECENT order custkeys (combiner-reduced, one
    # row/key after the date filter)
    cutoff_ts = np.datetime64(cutoff, "us")
    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_custkey", "o_orderdate"])

    def recent(df: pd.DataFrame) -> pd.DataFrame:
        od = np.asarray(df["o_orderdate"], dtype="datetime64[us]")
        return df.loc[od >= cutoff_ts, ["o_custkey"]]

    orders = orders.map_batches(recent, batch_format="pandas", batch_size=131072)
    ordered = grouped_agg(orders, ["o_custkey"], {"nn": ("o_custkey", "size")})
    ordered = ordered.map_batches(lambda df: df[["o_custkey"]].assign(had=np.int64(1)),
                                  batch_format="pandas")

    import pyarrow.parquet as pq

    n_cust = pq.ParquetFile(f"{sf_dir}/customer.parquet").metadata.num_rows
    joined = cand.join(ordered, join_type="left_outer",
                       num_partitions=_join_partitions(n_cust),
                       on=("c_custkey",), right_on=("o_custkey",))

    def never_ordered(df: pd.DataFrame) -> pd.DataFrame:
        m = df["had"].isna().to_numpy()
        out = df.loc[m]
        cents = np.rint(out["c_acctbal"].to_numpy() * 100.0).astype(np.int64)
        g = pd.DataFrame({"c_nationkey": out["c_nationkey"].to_numpy(),
                          "numcust": np.int64(1), "cents": cents})
        return g.groupby("c_nationkey", as_index=False, sort=False).agg(
            numcust=("numcust", "sum"), cents=("cents", "sum"))

    agg = grouped_agg(joined.map_batches(never_ordered, batch_format="pandas"),
                      ["c_nationkey"],
                      {"numcust": ("numcust", "sum"), "cents": ("cents", "sum")},
                      n_buckets=4)

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "c_nationkey": df["c_nationkey"].astype("int64"),
            "numcust": df["numcust"].astype("int64"),
            "totacctbal": round_series(df["cents"] / 100.0, 2),
        })

    return _tiny_report(agg.map_batches(finish, batch_format="pandas"),
                        {"c_nationkey": "int64", "numcust": "int64",
                         "totacctbal": "float64"},
                        ["c_nationkey"])


def sole_return_supplier_q21(sf_dir: str, n_buckets: int = 64,
                             limit: int = 100):
    """q21-analogue (suppliers who kept orders waiting, EXISTS / NOT
    EXISTS folded into group logic): in every order served by >= 2
    distinct suppliers, find the suppliers that are the ONLY supplier
    with a returned ('R') line, and count such orders per supplier.

    The reference query's correlated EXISTS / NOT EXISTS self-joins on
    lineitem collapse into per-order set logic: reduce lineitem to one
    row per (order, supplier) with a has_r flag (grouped_agg combiner),
    then ONE bucketed pass keyed on l_orderkey computes n_supp / n_r via
    groupby-transform and filters -- no self-join ever ships the fact
    table twice. A final tiny grouped_agg counts per supplier.

    Output: (suppkey, numwait) sorted numwait DESC, suppkey ASC, top
    ``limit``.
    """
    import ray.data as rd

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_suppkey", "l_returnflag"])

    def flag_partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df.assign(has_r=(df["l_returnflag"] == "R").astype(np.int64))
        return (df.groupby(["l_orderkey", "l_suppkey"], as_index=False,
                           sort=False).agg(has_r=("has_r", "max")))

    per_os = grouped_agg(
        li.map_batches(flag_partial, batch_format="pandas",
                       batch_size=131072),
        ["l_orderkey", "l_suppkey"], {"has_r": ("has_r", "max")},
        n_buckets=n_buckets)

    def sole(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("l_orderkey")
        n_supp = g["l_suppkey"].transform("size")
        n_r = g["has_r"].transform("sum")
        hit = df[(df["has_r"] == 1) & (n_supp >= 2) & (n_r == 1)]
        return (hit.groupby("l_suppkey", as_index=False, sort=False)
                .agg(numwait=("l_suppkey", "size")))

    # re-key the (order, supplier) rows by order so each order's supplier
    # set is complete inside one group
    from .analytics import _user_bucket

    by_order = (per_os.map_batches(
        lambda df: _user_bucket(df, "l_orderkey", n_buckets),
        batch_format="pandas", batch_size=131072)
        .groupby("bucket").map_groups(sole, batch_format="pandas"))

    counts = grouped_agg(by_order, ["l_suppkey"],
                         {"numwait": ("numwait", "sum")}, n_buckets=16)

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"suppkey": df["l_suppkey"].astype("int64"),
                             "numwait": df["numwait"].astype("int64")})

    # bound: one row per waiting supplier (supplier grain)
    out = counts.map_batches(finish, batch_format="pandas").to_pandas()
    out = (out.sort_values(["numwait", "suppkey"], ascending=[False, True])
           .head(limit).reset_index(drop=True))
    return out
