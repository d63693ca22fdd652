"""Edge cases for the second TPC-H batch (full oracle parity is swept in
test_entry.py): gated-vs-join path equivalence and a pandas reference
for the zero-order arithmetic in q13."""

import os
import sys

import numpy as np
import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = "/root/testdata/sf0.001"
needs_data = pytest.mark.skipif(not os.path.isdir(SF), reason="driver testdata absent")


def _df(res):
    return res.to_pandas() if hasattr(res, "to_pandas") else res


@needs_data
def test_q7_gated_paths_agree(ray_session):
    from deekseek_ocr___dockerized_api_ray.pipelines.tpch_more import (
        nation_trade_volume_q7,
    )

    fast = _df(nation_trade_volume_q7(SF))
    slow = _df(nation_trade_volume_q7(SF, broadcast_rows=0))
    pd.testing.assert_frame_equal(fast, slow)
    assert len(fast) > 0
    # cross pairs only: supplier nation never equals customer nation
    assert (fast["supp_nation"] != fast["cust_nation"]).all()


@needs_data
def test_q9_gated_paths_agree(ray_session):
    from deekseek_ocr___dockerized_api_ray.pipelines.tpch_more import (
        product_profit_q9,
    )

    fast = _df(product_profit_q9(SF)).reset_index(drop=True)
    slow = _df(product_profit_q9(SF, broadcast_rows=0)).reset_index(drop=True)
    pd.testing.assert_frame_equal(fast, slow)
    assert len(fast) > 0


@needs_data
def test_q13_matches_pandas_reference(ray_session):
    from deekseek_ocr___dockerized_api_ray.pipelines.tpch_more import (
        customer_distribution_q13,
    )

    got = _df(customer_distribution_q13(SF))
    orders = pd.read_parquet(f"{SF}/orders.parquet", columns=["o_custkey"])
    cust = pd.read_parquet(f"{SF}/customer.parquet", columns=["c_custkey"])
    counts = orders.groupby("o_custkey").size()
    full = counts.reindex(cust["c_custkey"], fill_value=0)
    ref = (full.value_counts().rename_axis("c_count").reset_index(name="custdist")
           .sort_values(["custdist", "c_count"], ascending=[False, False])
           .reset_index(drop=True))
    assert np.array_equal(got["c_count"].to_numpy(), ref["c_count"].to_numpy())
    assert np.array_equal(got["custdist"].to_numpy(), ref["custdist"].to_numpy())
    # total accounts for every customer exactly once
    assert int(got["custdist"].sum()) == len(cust)


@needs_data
def test_q15_winner_is_argmax(ray_session):
    from deekseek_ocr___dockerized_api_ray.functions.rounding import round_series
    from deekseek_ocr___dockerized_api_ray.pipelines.tpch_more import top_supplier_q15

    got = _df(top_supplier_q15(SF))
    li = pd.read_parquet(f"{SF}/lineitem.parquet")
    m = (li["l_shipdate"] >= "1996-01-01") & (li["l_shipdate"] < "1996-04-01")
    rev = (li[m].assign(r=li["l_extendedprice"] * (1 - li["l_discount"]))
           .groupby("l_suppkey")["r"].sum())
    rev = round_series(rev, 2)
    assert set(got["s_suppkey"]) == set(rev[rev == rev.max()].index)


@needs_data
def test_q22_threshold_is_exact_cents(ray_session):
    from deekseek_ocr___dockerized_api_ray.pipelines.tpch_more import (
        lapsed_rich_customers_q22,
    )

    got = _df(lapsed_rich_customers_q22(SF))
    cust = pd.read_parquet(f"{SF}/customer.parquet")
    orders = pd.read_parquet(f"{SF}/orders.parquet", columns=["o_custkey", "o_orderdate"])
    nations = {1, 3, 5, 7, 9, 11, 13}
    sub = cust[cust["c_nationkey"].isin(nations)]
    pos = sub[sub["c_acctbal"] > 0]
    cents = np.rint(pos["c_acctbal"].to_numpy() * 100).astype(np.int64)
    total, n = int(cents.sum()), len(pos)
    recent = set(orders.loc[orders["o_orderdate"] >= "2000-01-01", "o_custkey"])
    c_cents = np.rint(sub["c_acctbal"].to_numpy() * 100).astype(np.int64)
    keep = (c_cents * n > total) & ~sub["c_custkey"].isin(recent).to_numpy()
    ref = (sub[keep].groupby("c_nationkey")
           .agg(numcust=("c_custkey", "size"), tot=("c_acctbal", "sum"))
           .reset_index().sort_values("c_nationkey"))
    assert np.array_equal(got["c_nationkey"].to_numpy(), ref["c_nationkey"].to_numpy())
    assert np.array_equal(got["numcust"].to_numpy(), ref["numcust"].to_numpy())
