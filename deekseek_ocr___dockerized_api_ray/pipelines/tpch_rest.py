"""Final TPC-H batch: q2/q11/q12/q16/q20 analogues over the sandbox
schema. There is no ``partsupp`` table, so the part-supplier relation is
DERIVED from lineitem (a supplier "supplies" a part iff a lineitem pairs
them) and availability/cost come from shipped quantities and unit prices:

  - q2  min-cost supplier: cost(part, supp) = MIN(l_extendedprice /
        l_quantity) -- a MIN of IEEE ratios, summation-order-free, so the
        engine and the DuckDB oracle agree bitwise on the argmin.
  - q11 important parts: part value = discounted revenue from one
        nation's suppliers in exact fixed point (cents x basis points,
        int64); the HAVING threshold is the scale-free all-integer
        comparison ``value_e4 * n_parts > 2 * total_e4``.
  - q12 priority shipping mix: l_returnflag stands in for the absent
        l_shipmode; counts are integers (trivially stable).
  - q16 supplier counts per part attribute group: exact distinct
        (brand, type, size, suppkey) via partial dedup + ONE keyed
        shuffle on the attribute-group hash.
  - q20 heavy suppliers of a part family: integer quantity sums with a
        scale-free all-integer threshold (qty * 10 * n > 12 * total:
        "20% above the mean supplier").

Scale rules follow pipelines/analytics.py: pruned reads, broadcast only
tiny dims (supplier, nation) or gated growing dims (orders, part) with a
live hash-join path above the gate, partial+bucketed combiners before
anything wide.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..functions.rounding import round_series
from ..stages.agg import grouped_agg
from .analytics import _join_partitions
from .tpch_more import _nation_names, _order_lut, _tiny_report


def _sorted_key_lut(keys: np.ndarray, *cols: np.ndarray):
    """Sort ``keys`` and co-sort the attribute columns; returns
    (sorted_keys, [sorted_cols...]) for searchsorted membership+attr
    lookups inside map_batches (broadcast once via ray.put)."""
    order = np.argsort(keys, kind="stable")
    return keys[order], [c[order] for c in cols]


def _member_idx(sorted_keys: np.ndarray, probe: np.ndarray):
    """(mask, idx): which probe values are in sorted_keys, and where."""
    if len(sorted_keys) == 0:
        return np.zeros(len(probe), bool), np.zeros(len(probe), np.int64)
    idx = np.clip(np.searchsorted(sorted_keys, probe), 0, len(sorted_keys) - 1)
    return sorted_keys[idx] == probe, idx


def _supplier_table(sf_dir: str, columns: list[str]) -> dict[str, np.ndarray]:
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/supplier.parquet", columns=columns)
    return {c: t.column(c).to_numpy(zero_copy_only=False) for c in columns}


# ---------------------------------------------------------------------------
# q2: min-cost supplier per part
# ---------------------------------------------------------------------------

def min_cost_supplier_q2(sf_dir: str, region: int = 1, max_size: int = 15,
                         part_type: str = "SMALL",
                         broadcast_rows: int = 5_000_000):
    """TPC-H q2 analogue: for every part of a given type with
    ``p_size <= max_size``, the region's supplier quoting the lowest
    unit price (MIN over that pair's lineitems), ties broken by suppkey.

    Shape: ONE streaming pass over lineitem (region-supplier membership
    and part qualification both via broadcast sorted-key arrays) -> pair
    combiner MIN via ``grouped_agg`` -> per-part argmin in a second tiny
    keyed reduce bucketed on partkey -> winner attrs attached from the
    broadcast luts (supplier is a tiny dim; qualifying-part names ride
    the same gated broadcast as the membership array, with a hash-join
    path above the gate for the part dim).

    Output: (s_acctbal, s_name, n_name, p_partkey, p_name, cost r4)
    sorted s_acctbal desc, n_name, s_name, p_partkey.
    """
    import pyarrow.parquet as pq
    import ray
    import ray.data as rd

    from ..stages.agg import _bucket_of

    _DTYPES = {"s_acctbal": "float64", "s_name": "object", "n_name": "object",
               "p_partkey": "int64", "p_name": "object", "cost": "float64"}

    n2name = _nation_names(sf_dir)
    nat = pq.read_table(f"{sf_dir}/nation.parquet",
                        columns=["n_nationkey", "n_regionkey"])
    region_nations = set(
        np.asarray(nat.column("n_nationkey"))[
            np.asarray(nat.column("n_regionkey")) == region].tolist())

    sup = _supplier_table(sf_dir, ["s_suppkey", "s_nationkey", "s_name", "s_acctbal"])
    in_region = np.isin(sup["s_nationkey"], list(region_nations))
    sup_keys, (sup_nat, sup_name, sup_bal) = _sorted_key_lut(
        sup["s_suppkey"][in_region], sup["s_nationkey"][in_region],
        sup["s_name"][in_region], sup["s_acctbal"][in_region])
    sup_keys_ref = ray.put(sup_keys)

    n_part = pq.ParquetFile(f"{sf_dir}/part.parquet").metadata.num_rows
    gated = n_part <= broadcast_rows

    if gated:
        pt = pq.read_table(f"{sf_dir}/part.parquet",
                           columns=["p_partkey", "p_name", "p_type", "p_size"])
        ok = ((np.asarray(pt.column("p_size")) <= max_size)
              # bound: inside the n_part <= broadcast_rows gate
              & (pt.column("p_type").to_pandas().to_numpy() == part_type))
        part_keys, (part_names,) = _sorted_key_lut(
            pt.column("p_partkey").to_numpy(zero_copy_only=False)[ok],
            # bound: inside the n_part <= broadcast_rows gate
            pt.column("p_name").to_pandas().to_numpy()[ok])
        part_keys_ref = ray.put(part_keys)
    else:
        part_keys_ref = None

    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_suppkey", "l_extendedprice", "l_quantity"],
    )

    def one_pass(df: pd.DataFrame) -> pd.DataFrame:
        sk = ray.get(sup_keys_ref)
        sup_m, _ = _member_idx(sk, df["l_suppkey"].to_numpy())
        m = sup_m
        if part_keys_ref is not None:
            part_m, _ = _member_idx(ray.get(part_keys_ref),
                                    df["l_partkey"].to_numpy())
            m = m & part_m
        return pd.DataFrame({
            "l_partkey": df["l_partkey"].to_numpy()[m],
            "l_suppkey": df["l_suppkey"].to_numpy()[m],
            "unit": (df["l_extendedprice"].to_numpy()[m]
                     / df["l_quantity"].to_numpy()[m]),
        })

    pair_cost = grouped_agg(
        li.map_batches(one_pass, batch_format="pandas", batch_size=131072),
        ["l_partkey", "l_suppkey"], {"cost": ("unit", "min")}, n_buckets=32)

    if not gated:
        # part dim above the gate: hash-join the qualifying parts in
        part = rd.read_parquet(f"{sf_dir}/part.parquet",
                               columns=["p_partkey", "p_name", "p_type", "p_size"])
        part_q = part.map_batches(
            lambda df: df.loc[(df["p_size"] <= max_size)
                              & (df["p_type"] == part_type),
                              ["p_partkey", "p_name"]],
            batch_format="pandas")
        pair_cost = pair_cost.join(
            part_q, join_type="inner", num_partitions=_join_partitions(n_part),
            on=("l_partkey",), right_on=("p_partkey",))

    def bucket(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            cols = list(df.columns) + ["bucket"]
            return pd.DataFrame(columns=cols)
        df = df.copy()
        df["bucket"] = _bucket_of(df, ["l_partkey"], 16)
        return df

    def argmin_per_part(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop(columns=["bucket"])
        win = (df.sort_values(["l_partkey", "cost", "l_suppkey"])
                 .groupby("l_partkey", as_index=False).first())
        sk = ray.get(sup_keys_ref)
        _, sidx = _member_idx(sk, win["l_suppkey"].to_numpy())
        out = pd.DataFrame({
            "s_acctbal": sup_bal[sidx],
            "s_name": sup_name[sidx],
            "n_name": pd.Series(sup_nat[sidx]).map(n2name).to_numpy(),
            "p_partkey": win["l_partkey"].to_numpy(),
            "cost": round_series(win["cost"], 4),
        })
        if gated:
            _, pidx = _member_idx(part_keys, win["l_partkey"].to_numpy())
            out["p_name"] = part_names[pidx]
        else:
            out["p_name"] = win["p_name"].to_numpy()
        return out[list(_DTYPES)]

    winners = (pair_cost.map_batches(bucket, batch_format="pandas")
               .groupby("bucket").map_groups(argmin_per_part,
                                             batch_format="pandas"))
    return _tiny_report(winners, _DTYPES,
                        ["s_acctbal", "n_name", "s_name", "p_partkey"],
                        ascending=[False, True, True, True])


# ---------------------------------------------------------------------------
# q11: important parts by stocked value
# ---------------------------------------------------------------------------

def important_parts_q11(sf_dir: str, nation: int = 3, mult_num: int = 2,
                        mult_den: int = 1):
    """TPC-H q11 analogue: value of each part supplied by one nation's
    suppliers (discounted revenue in exact fixed point), keeping parts
    whose value exceeds ``mult_num/mult_den`` times the AVERAGE
    supplied part's value -- a scale-free threshold (q11's fixed
    fraction selects nothing once the part dim grows 10x).

    The threshold compare is all-integer
    (``value_e4 * n_parts * mult_den > mult_num * total_e4``), so
    engine and oracle agree bitwise at the boundary.

    Shape: one streaming pass (supplier-nation membership broadcast) ->
    partkey combiner sum -> the per-part aggregate is materialized once
    (bounded by the part dim, ~20M rows at SF100) and consumed twice:
    a scalar total reduce, then the threshold filter.

    Output: (p_partkey, value r2) sorted value desc, p_partkey.
    """
    import ray
    import ray.data as rd

    _DTYPES = {"p_partkey": "int64", "value": "float64"}

    sup = _supplier_table(sf_dir, ["s_suppkey", "s_nationkey"])
    keys = np.sort(sup["s_suppkey"][sup["s_nationkey"] == nation])
    keys_ref = ray.put(keys)

    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_suppkey", "l_extendedprice", "l_discount"],
    )

    def one_pass(df: pd.DataFrame) -> pd.DataFrame:
        m, _ = _member_idx(ray.get(keys_ref), df["l_suppkey"].to_numpy())
        cents = np.rint(df["l_extendedprice"].to_numpy()[m] * 100.0).astype(np.int64)
        bps = 100 - np.rint(df["l_discount"].to_numpy()[m] * 100.0).astype(np.int64)
        return pd.DataFrame({"l_partkey": df["l_partkey"].to_numpy()[m],
                             "value_e4": cents * bps})

    agg = grouped_agg(
        li.map_batches(one_pass, batch_format="pandas", batch_size=131072),
        ["l_partkey"], {"value_e4": ("value_e4", "sum")}, n_buckets=32,
    ).materialize()

    def partial_total(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"t": [df["value_e4"].to_numpy().sum()],
                             "k": [len(df)]})

    # bound: one (total, count) row per block
    tk = agg.map_batches(partial_total, batch_format="pandas").to_pandas()
    total_e4 = int(tk["t"].sum())
    n_parts = int(tk["k"].sum())

    def keep(df: pd.DataFrame) -> pd.DataFrame:
        v = df["value_e4"].to_numpy()
        m = v * n_parts * mult_den > mult_num * total_e4
        return pd.DataFrame({"p_partkey": df["l_partkey"].to_numpy()[m],
                             "value": round_series(pd.Series(v[m] / 10000.0), 2)})

    return _tiny_report(agg.map_batches(keep, batch_format="pandas"),
                        _DTYPES, ["value", "p_partkey"], ascending=[False, True])


# ---------------------------------------------------------------------------
# q12: priority mix by return flag
# ---------------------------------------------------------------------------

def priority_shipping_q12(sf_dir: str, year: int = 1996,
                          broadcast_rows: int = 5_000_000):
    """TPC-H q12 analogue (no l_shipmode column -> group by
    l_returnflag): for lineitems shipped in ``year``, per return flag,
    how many belong to high-priority orders (1-URGENT / 2-HIGH) vs not.

    Shape: the order priority reaches lineitem via the gated
    orderkey -> is-high lookup (driver-built under the row gate; above
    it, lineitem JOIN orders). Counts are integers. Output:
    (l_returnflag, high_line_count, low_line_count) sorted by flag.
    """
    import pyarrow.parquet as pq
    import ray
    import ray.data as rd

    _DTYPES = {"l_returnflag": "object", "high_line_count": "int64",
               "low_line_count": "int64"}
    lo = np.datetime64(f"{year}-01-01", "us")
    hi = np.datetime64(f"{year + 1}-01-01", "us")

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_returnflag", "l_shipdate"])

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        df["high_line_count"] = df["high_line_count"].astype("int64")
        df["low_line_count"] = df["low_line_count"].astype("int64")
        return df[list(_DTYPES)]

    n_orders = pq.ParquetFile(f"{sf_dir}/orders.parquet").metadata.num_rows
    if n_orders <= broadcast_rows:
        ot = pq.read_table(f"{sf_dir}/orders.parquet",
                           columns=["o_orderkey", "o_orderpriority"])
        # bound: inside the n_orders <= broadcast_rows gate
        is_high = (ot.column("o_orderpriority").to_pandas()
                   .isin(["1-URGENT", "2-HIGH"]).to_numpy().astype(np.int64))
        o2high_ref = ray.put(_order_lut(sf_dir, "", values=is_high))

        def one_pass(df: pd.DataFrame) -> pd.DataFrame:
            ship = np.asarray(df["l_shipdate"], dtype="datetime64[us]")
            m = (ship >= lo) & (ship < hi)
            high, _ = ray.get(o2high_ref).lookup(df["l_orderkey"].to_numpy()[m])
            return pd.DataFrame({"l_returnflag": df["l_returnflag"].to_numpy()[m],
                                 "high": high, "low": 1 - high})

        agg = grouped_agg(
            li.map_batches(one_pass, batch_format="pandas", batch_size=131072),
            ["l_returnflag"],
            {"high_line_count": ("high", "sum"), "low_line_count": ("low", "sum")},
            n_buckets=4)
        return _tiny_report(agg.map_batches(finish, batch_format="pandas"),
                            _DTYPES, ["l_returnflag"])

    def li_prep(df: pd.DataFrame) -> pd.DataFrame:
        ship = np.asarray(df["l_shipdate"], dtype="datetime64[us]")
        m = (ship >= lo) & (ship < hi)
        return pd.DataFrame({"l_orderkey": df["l_orderkey"].to_numpy()[m],
                             "l_returnflag": df["l_returnflag"].to_numpy()[m]})

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_orderpriority"])

    def o_prep(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "o_orderkey": df["o_orderkey"].to_numpy(),
            "high": df["o_orderpriority"].isin(["1-URGENT", "2-HIGH"])
                      .to_numpy().astype(np.int64),
        })

    joined = li.map_batches(li_prep, batch_format="pandas", batch_size=131072).join(
        orders.map_batches(o_prep, batch_format="pandas"),
        join_type="inner", num_partitions=_join_partitions(n_orders),
        on=("l_orderkey",), right_on=("o_orderkey",))

    def mix(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["low"] = 1 - df["high"]
        return df[["l_returnflag", "high", "low"]]

    agg = grouped_agg(joined.map_batches(mix, batch_format="pandas"),
                      ["l_returnflag"],
                      {"high_line_count": ("high", "sum"),
                       "low_line_count": ("low", "sum")}, n_buckets=4)
    return _tiny_report(agg.map_batches(finish, batch_format="pandas"),
                        _DTYPES, ["l_returnflag"])


# ---------------------------------------------------------------------------
# q16: supplier counts per part attribute group
# ---------------------------------------------------------------------------

def part_supplier_counts_q16(sf_dir: str, brand_not: str = "Brand#1",
                             sizes: tuple[int, ...] = (1, 4, 7, 10, 13, 16, 19, 22),
                             broadcast_rows: int = 5_000_000):
    """TPC-H q16 analogue: distinct suppliers per (brand, type, size)
    for qualifying parts, from the lineitem-derived part-supplier
    relation, excluding suppliers with negative account balance (the
    "complaints" NOT IN of q16).

    Shape: per-batch dedup of (partkey, suppkey) with the excluded-
    supplier set and part qualification applied in the same pass (part
    attrs via the gated broadcast lut; hash-join path above the gate),
    then ONE keyed shuffle on hash(brand, type, size) -- each attribute
    group lands whole in one reduce call, which dedups
    (group, suppkey) exactly and counts. A group's distinct-supplier
    rows are bounded by the supplier dim, so no reduce-side skew.

    Output: (p_brand, p_type, p_size, supplier_cnt) sorted cnt desc,
    then brand/type/size.
    """
    import pyarrow.parquet as pq
    import ray
    import ray.data as rd

    from ..stages.agg import _bucket_of

    _DTYPES = {"p_brand": "object", "p_type": "object", "p_size": "int64",
               "supplier_cnt": "int64"}

    sup = _supplier_table(sf_dir, ["s_suppkey", "s_acctbal"])
    excluded = np.sort(sup["s_suppkey"][sup["s_acctbal"] < 0])
    excluded_ref = ray.put(excluded)
    sizes_arr = np.asarray(sizes, dtype=np.int64)

    n_part = pq.ParquetFile(f"{sf_dir}/part.parquet").metadata.num_rows
    gated = n_part <= broadcast_rows

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_partkey", "l_suppkey"])

    if gated:
        pt = pq.read_table(f"{sf_dir}/part.parquet",
                           columns=["p_partkey", "p_brand", "p_type", "p_size"])
        psize = np.asarray(pt.column("p_size"), dtype=np.int64)
        ok = (np.isin(psize, sizes_arr)
              # bound: inside the n_part <= broadcast_rows gate
              & (pt.column("p_brand").to_pandas().to_numpy() != brand_not))
        part_keys, (pbrand, ptype, psz) = _sorted_key_lut(
            pt.column("p_partkey").to_numpy(zero_copy_only=False)[ok],
            # bound: inside the n_part <= broadcast_rows gate
            pt.column("p_brand").to_pandas().to_numpy()[ok],
            # bound: inside the n_part <= broadcast_rows gate
            pt.column("p_type").to_pandas().to_numpy()[ok], psize[ok])
        lut_ref = ray.put((part_keys, pbrand, ptype, psz))

        def partial(df: pd.DataFrame) -> pd.DataFrame:
            keys, br, ty, sz = ray.get(lut_ref)
            exc = ray.get(excluded_ref)
            lp = df["l_partkey"].to_numpy()
            ls = df["l_suppkey"].to_numpy()
            pm, pidx = _member_idx(keys, lp)
            em, _ = _member_idx(exc, ls)
            m = pm & ~em
            out = pd.DataFrame({"p_brand": br[pidx[m]], "p_type": ty[pidx[m]],
                                "p_size": sz[pidx[m]], "l_suppkey": ls[m]})
            return out.drop_duplicates()

        pairs = li.map_batches(partial, batch_format="pandas", batch_size=131072)
    else:
        part = rd.read_parquet(f"{sf_dir}/part.parquet",
                               columns=["p_partkey", "p_brand", "p_type", "p_size"])
        part_q = part.map_batches(
            lambda df: df[df["p_size"].isin(list(sizes))
                          & (df["p_brand"] != brand_not)],
            batch_format="pandas")

        def li_dedup(df: pd.DataFrame) -> pd.DataFrame:
            exc = ray.get(excluded_ref)
            em, _ = _member_idx(exc, df["l_suppkey"].to_numpy())
            return df[~em].drop_duplicates()

        pairs = li.map_batches(li_dedup, batch_format="pandas",
                               batch_size=131072).join(
            part_q, join_type="inner", num_partitions=_join_partitions(n_part),
            on=("l_partkey",), right_on=("p_partkey",),
        ).map_batches(
            lambda df: df[["p_brand", "p_type", "p_size", "l_suppkey"]]
                         .drop_duplicates(),
            batch_format="pandas")

    def bucket(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame(columns=list(df.columns) + ["bucket"])
        df = df.copy()
        df["p_size"] = df["p_size"].astype("int64")
        df["bucket"] = _bucket_of(df, ["p_brand", "p_type", "p_size"], 16)
        return df

    def count_distinct(df: pd.DataFrame) -> pd.DataFrame:
        out = (df.drop(columns=["bucket"]).drop_duplicates()
                 .groupby(["p_brand", "p_type", "p_size"], as_index=False)
                 .agg(supplier_cnt=("l_suppkey", "size")))
        out["supplier_cnt"] = out["supplier_cnt"].astype("int64")
        return out

    counts = (pairs.map_batches(bucket, batch_format="pandas")
              .groupby("bucket").map_groups(count_distinct, batch_format="pandas"))
    return _tiny_report(counts, _DTYPES,
                        ["supplier_cnt", "p_brand", "p_type", "p_size"],
                        ascending=[False, True, True, True])


# ---------------------------------------------------------------------------
# q20: heavy suppliers of a part family
# ---------------------------------------------------------------------------

def heavy_part_suppliers_q20(sf_dir: str, name_prefix: str = "red ",
                             year: int = 1996):
    """TPC-H q20 analogue (no partsupp availqty): suppliers whose
    shipped quantity of the part family (p_name starting with
    ``name_prefix``) in ``year`` is more than 20% above the mean
    supplying supplier's -- the all-integer comparison
    ``qty * 10 * n_suppliers > 12 * total_qty`` (quantities are
    integer-valued doubles, so BIGINT sums are exact).

    Shape: one streaming pass (family partkeys broadcast sorted-key
    array, date filter inline) -> suppkey combiner sum. The aggregate is
    one row per supplier -- a tiny dim -- so thresholding and attribute
    attach finish driver-side.

    Output: (s_suppkey, s_name, n_name, qty) sorted by s_suppkey.
    """
    import pyarrow.parquet as pq
    import ray
    import ray.data as rd

    _DTYPES = {"s_suppkey": "int64", "s_name": "object", "n_name": "object",
               "qty": "int64"}

    n2name = _nation_names(sf_dir)
    pt = pq.read_table(f"{sf_dir}/part.parquet", columns=["p_partkey", "p_name"])
    # bound: 2-col part dim (p_name prefix scan); gate to hash join at web scale
    fam = pt.column("p_name").to_pandas().str.startswith(name_prefix).to_numpy()
    fam_keys = np.sort(pt.column("p_partkey").to_numpy(zero_copy_only=False)[fam])
    fam_ref = ray.put(fam_keys)

    lo = np.datetime64(f"{year}-01-01", "us")
    hi = np.datetime64(f"{year + 1}-01-01", "us")

    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_suppkey", "l_quantity", "l_shipdate"],
    )

    def one_pass(df: pd.DataFrame) -> pd.DataFrame:
        ship = np.asarray(df["l_shipdate"], dtype="datetime64[us]")
        m = (ship >= lo) & (ship < hi)
        fm, _ = _member_idx(ray.get(fam_ref), df["l_partkey"].to_numpy())
        m &= fm
        return pd.DataFrame({
            "l_suppkey": df["l_suppkey"].to_numpy()[m],
            "qty": np.rint(df["l_quantity"].to_numpy()[m]).astype(np.int64),
        })

    agg = grouped_agg(
        li.map_batches(one_pass, batch_format="pandas", batch_size=131072),
        ["l_suppkey"], {"qty": ("qty", "sum")}, n_buckets=8)

    # bound: one row per supplier (tiny dim)
    df = agg.to_pandas()  # <= one row per supplier (tiny dim)
    if df.empty:
        return pd.DataFrame({c: pd.Series(dtype=t) for c, t in _DTYPES.items()})
    total = int(df["qty"].sum())
    n = len(df)
    keep = df["qty"].to_numpy() * 10 * n > 12 * total
    win = df[keep]

    sup = _supplier_table(sf_dir, ["s_suppkey", "s_name", "s_nationkey"])
    skeys, (sname, snat) = _sorted_key_lut(sup["s_suppkey"], sup["s_name"],
                                           sup["s_nationkey"])
    _, idx = _member_idx(skeys, win["l_suppkey"].to_numpy())
    out = pd.DataFrame({
        "s_suppkey": win["l_suppkey"].to_numpy(),
        "s_name": sname[idx],
        "n_name": pd.Series(snat[idx]).map(n2name).to_numpy(),
        "qty": win["qty"].to_numpy().astype("int64"),
    })
    return out.sort_values("s_suppkey").reset_index(drop=True)
