"""Kernel-level edge cases for the windowed analytics operators (the
full queries are oracle-swept in test_entry.py)."""

import os
import sys

import numpy as np
import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = "/root/testdata/sf0.001"
needs_data = pytest.mark.skipif(not os.path.isdir(SF), reason="driver testdata absent")


@needs_data
def test_lag_delta_drops_single_event_users(ray_session):
    from deekseek_ocr___dockerized_api_ray.pipelines.analytics import events_lag_delta

    df = events_lag_delta(SF).to_pandas()
    ev = pd.read_parquet(f"{SF}/events.parquet", columns=["user_id"])
    per_user = ev.groupby("user_id").size()
    # each user contributes (n_events - 1) lag rows
    assert len(df) == int((per_user - 1).sum())
    assert (df["delta_us"] >= 0).all()


@needs_data
def test_running_revenue_matches_pandas_reference(ray_session):
    from deekseek_ocr___dockerized_api_ray.pipelines.analytics import (
        customer_running_revenue,
    )
    from deekseek_ocr___dockerized_api_ray.functions.rounding import round_series

    got = (customer_running_revenue(SF).to_pandas()
           .sort_values("o_orderkey").reset_index(drop=True))
    orders = pd.read_parquet(f"{SF}/orders.parquet")
    ref = orders.sort_values(["o_custkey", "o_orderdate", "o_orderkey"]).copy()
    ref["running_revenue"] = round_series(
        ref.groupby("o_custkey", sort=False)["o_totalprice"].cumsum(), 2)
    ref = ref.sort_values("o_orderkey").reset_index(drop=True)
    assert np.array_equal(got["o_orderkey"].to_numpy(), ref["o_orderkey"].to_numpy())
    assert np.allclose(got["running_revenue"].to_numpy(),
                       ref["running_revenue"].to_numpy())


@needs_data
def test_user_pivot_rows_sum_to_total(ray_session):
    from deekseek_ocr___dockerized_api_ray.pipelines.analytics import user_event_pivot

    df = user_event_pivot(SF).to_pandas()
    parts = df[["n_click", "n_error", "n_purchase", "n_signup", "n_view"]].sum(axis=1)
    assert (parts == df["n_total"]).all()


@needs_data
def test_q4_q14_gated_paths_agree(ray_session):
    import pandas as pd

    from deekseek_ocr___dockerized_api_ray.pipelines.analytics import (
        order_priority_counts,
        promo_revenue_q14,
    )

    def as_pd(r):
        return r.to_pandas() if hasattr(r, "to_pandas") else r

    fast4 = (as_pd(order_priority_counts(SF))
             .sort_values("o_orderpriority").reset_index(drop=True))
    join4 = (as_pd(order_priority_counts(SF, broadcast_rows=0))
             .sort_values("o_orderpriority").reset_index(drop=True))
    assert fast4.equals(join4)

    fast14 = promo_revenue_q14(SF)
    join14 = promo_revenue_q14(SF, broadcast_rows=0)
    assert fast14["promo_revenue_pct"].iloc[0] == join14["promo_revenue_pct"].iloc[0]


@needs_data
def test_q5_gated_paths_agree(ray_session):
    from deekseek_ocr___dockerized_api_ray.pipelines.analytics import nation_volume_q5

    fast = nation_volume_q5(SF).to_pandas().reset_index(drop=True)
    join = nation_volume_q5(SF, broadcast_rows=0).to_pandas().reset_index(drop=True)
    assert fast.equals(join)


def test_grouped_agg_skew_resilient(ray_session):
    """A 90%-hot key must not break or mis-aggregate the combiner:
    partial aggregation collapses the hot key to one row per batch
    BEFORE the shuffle, so no reducer ever sees the raw hot rows."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from deekseek_ocr___dockerized_api_ray.stages.agg import grouped_agg

    rng = np.random.default_rng(11)
    n = 200_000
    keys = np.where(rng.random(n) < 0.9, 7, rng.integers(0, 1000, n))
    vals = rng.random(n)
    df = pd.DataFrame({"k": keys.astype(np.int64), "v": vals})

    got = (grouped_agg(rd.from_pandas(df), ["k"],
                       {"s": ("v", "sum"), "n": ("v", "size")})
           .to_pandas().sort_values("k").reset_index(drop=True))
    ref = (df.groupby("k", as_index=False)
             .agg(s=("v", "sum"), n=("v", "size"))
             .sort_values("k").reset_index(drop=True))
    assert got["k"].tolist() == ref["k"].tolist()
    assert got["n"].astype(int).tolist() == ref["n"].tolist()
    assert np.allclose(got["s"].to_numpy(), ref["s"].to_numpy())


@needs_data
def test_corpus_prep_chain(ray_session):
    import pandas as pd

    from deekseek_ocr___dockerized_api_ray.pipelines.prep import prep_corpus

    plan = prep_corpus(SF).to_pandas()
    assert len(plan) > 0
    # survivors are unique docs, gated to the keep languages
    assert plan["doc_id"].is_unique
    assert set(plan["lang_pred"]) <= {"en", "de", "fr", "es"}
    # bins respect the token budget (oversize rows exempt by definition)
    per_bin = (plan[~plan["oversize"]]
               .groupby(["shard", "bin_id"])["n_tokens"].sum())
    assert (per_bin <= 512).all()
    # the chain never invents docs: every survivor exists in the input
    docs = pd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id"])
    assert set(plan["doc_id"]) <= set(docs["doc_id"])


@needs_data
def test_q10_gated_paths_agree(ray_session):
    from deekseek_ocr___dockerized_api_ray.pipelines.analytics import (
        returned_item_report_q10,
    )

    fast = returned_item_report_q10(SF).reset_index(drop=True)
    join = (returned_item_report_q10(SF, broadcast_rows=0)
            .to_pandas().reset_index(drop=True))
    assert fast.equals(join)


@needs_data
def test_funnel_invariants(ray_session):
    from deekseek_ocr___dockerized_api_ray.pipelines.analytics import events_funnel

    df = events_funnel(SF).to_pandas()
    ev = pd.read_parquet(f"{SF}/events.parquet")
    signup_users = set(ev.loc[ev["event_type"] == "signup", "user_id"])
    assert set(df["user_id"]) == signup_users
    conv = df[df["converted"] == 1]
    # goal events never precede the start event
    assert (conv["first_purchase_us"] >= conv["signup_ts_us"]).all()
    assert (df.loc[df["converted"] == 0, "first_purchase_us"] == -1).all()


@needs_data
def test_retention_counts_are_exact_distinct(ray_session):
    from deekseek_ocr___dockerized_api_ray.pipelines.analytics import (
        user_retention_weeks,
    )

    df = user_retention_weeks(SF).to_pandas()
    ev = pd.read_parquet(f"{SF}/events.parquet", columns=["user_id", "ts"])
    week = (ev["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
            // (7 * 24 * 3600 * 1_000_000))
    uw = pd.DataFrame({"user_id": ev["user_id"], "week": week}).drop_duplicates()
    # total count over all cells == |distinct (user, week)|
    assert int(df["n_users"].sum()) == len(uw)
    # offset-0 cells count each user exactly once
    assert int(df.loc[df["week_offset"] == 0, "n_users"].sum()) == uw["user_id"].nunique()


@needs_data
def test_sole_return_supplier_matches_pandas(ray_session):
    from deekseek_ocr___dockerized_api_ray.pipelines.tpch_more import (
        sole_return_supplier_q21,
    )

    got = sole_return_supplier_q21(SF)
    li = pd.read_parquet(f"{SF}/lineitem.parquet",
                         columns=["l_orderkey", "l_suppkey", "l_returnflag"])
    rl = (li.assign(has_r=(li["l_returnflag"] == "R").astype(int))
          .groupby(["l_orderkey", "l_suppkey"], as_index=False)
          .agg(has_r=("has_r", "max")))
    g = rl.groupby("l_orderkey")
    hit = rl[(rl["has_r"] == 1)
             & (g["l_suppkey"].transform("size") >= 2)
             & (g["has_r"].transform("sum") == 1)]
    ref = (hit.groupby("l_suppkey").size().rename("numwait").reset_index()
           .sort_values(["numwait", "l_suppkey"], ascending=[False, True])
           .head(100).reset_index(drop=True))
    assert np.array_equal(got["suppkey"].to_numpy(), ref["l_suppkey"].to_numpy())
    assert np.array_equal(got["numwait"].to_numpy(), ref["numwait"].to_numpy())


@needs_data
def test_streaming_sessionize_equals_batch(ray_session):
    """Micro-batched incremental processing must reproduce the batch
    sessionize stream exactly, for several chunkings (sessions that
    straddle chunk boundaries are the interesting case)."""
    from deekseek_ocr___dockerized_api_ray.pipelines.windows import (
        events_sessionize,
        streaming_sessionize,
    )

    cols = ["user_id", "session_start_s", "n_events", "sum_value"]
    ref = (events_sessionize(SF).to_pandas()[cols]
           .sort_values(cols).reset_index(drop=True))
    for n_chunks in (1, 3, 7):
        got = (streaming_sessionize(SF, n_chunks=n_chunks).to_pandas()[cols]
               .sort_values(cols).reset_index(drop=True))
        pd.testing.assert_frame_equal(got, ref, check_dtype=False)


def test_skew_join_path_equivalence(ray_session):
    """90%-hot key: hot-broadcast + cold-hash union must equal a plain
    join, with the hot path actually live at the low threshold."""
    import ray.data as rd

    from deekseek_ocr___dockerized_api_ray.stages.skewjoin import skew_join

    rng = np.random.RandomState(7)
    n = 20_000
    keys = np.where(rng.rand(n) < 0.9, 1, rng.randint(2, 200, size=n))
    left = pd.DataFrame({"k": keys.astype(np.int64),
                         "x": np.arange(n, dtype=np.int64)})
    right = pd.DataFrame({"rk": np.arange(200, dtype=np.int64),
                          "label": [f"v{i}" for i in range(200)]})

    def run(threshold):
        out = skew_join(rd.from_pandas(left), rd.from_pandas(right),
                        on="k", right_on="rk", hot_threshold=threshold,
                        num_partitions=2)
        return (out.to_pandas().sort_values(["k", "x"])
                .reset_index(drop=True)[["k", "x", "label"]])

    with_hot = run(1000)        # key 1 (18k rows) goes broadcast
    no_hot = run(10**9)         # plain hash join path only
    pd.testing.assert_frame_equal(with_hot, no_hot)
    assert len(with_hot) == n   # every row matched exactly once


@needs_data
def test_revenue_acf_matches_numpy_corrcoef(ray_session):
    from deekseek_ocr___dockerized_api_ray.pipelines.analytics import revenue_acf
    from deekseek_ocr___dockerized_api_ray.functions.rounding import round_series

    got = revenue_acf(SF, max_lag=5).to_pandas().sort_values("lag")
    orders = pd.read_parquet(f"{SF}/orders.parquet")
    day = (orders["o_orderdate"].to_numpy().astype("datetime64[D]")
           .astype(np.int64))
    cents = round_series(orders["o_totalprice"] * 100.0, 0).astype(np.int64)
    daily = pd.DataFrame({"day": day, "c": cents}).groupby("day")["c"].sum()
    full = np.zeros(int(daily.index.max() - daily.index.min()) + 1)
    full[daily.index.to_numpy() - daily.index.min()] = daily.to_numpy()
    for lag, r in zip(got["lag"], got["r"]):
        ref = np.corrcoef(full[:-lag], full[lag:])[0, 1]
        assert abs(r - ref) < 1e-6, (lag, r, ref)


@needs_data
def test_gini_matches_sorted_index_formula(ray_session):
    from deekseek_ocr___dockerized_api_ray.pipelines.analytics import user_activity_gini

    got = user_activity_gini(SF).to_pandas()
    ev = pd.read_parquet(f"{SF}/events.parquet", columns=["user_id"])
    x = np.sort(ev.groupby("user_id").size().to_numpy())
    n, s = len(x), x.sum()
    ref = (2 * np.sum(np.arange(1, n + 1) * x)) / (n * s) - (n + 1) / n
    assert int(got["n_users"].iloc[0]) == n
    assert abs(float(got["gini"].iloc[0]) - ref) < 1e-6


@needs_data
def test_source_quality_report_distinct_is_exact(ray_session):
    from deekseek_ocr___dockerized_api_ray.pipelines.analytics import (
        source_quality_report,
    )

    got = (source_quality_report(SF).to_pandas()
           .set_index(["source", "lang"]).sort_index())
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    ref = docs.groupby(["source", "lang"]).agg(
        n_docs=("text", "size"), n_distinct_texts=("text", "nunique"))
    assert len(got) == len(ref)
    assert (got["n_docs"] == ref["n_docs"]).all()
    assert (got["n_distinct_texts"] == ref["n_distinct_texts"]).all()
    assert ((got["dup_rate"] >= 0) & (got["dup_rate"] < 1)).all()


@needs_data
def test_range_hour_matches_bruteforce(ray_session):
    from deekseek_ocr___dockerized_api_ray.pipelines.windows import (
        events_range_hour,
    )

    got = (events_range_hour(SF).to_pandas()
           .set_index("event_id").sort_index())
    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["event_id", "ts", "user_id", "value"])
    ts_us = ev["ts"].astype("datetime64[us]").astype("int64")
    n_ref, s_ref = {}, {}
    for _, g in ev.assign(ts_us=ts_us).groupby("user_id"):
        t = g["ts_us"].to_numpy()
        v = g["value"].to_numpy()
        for eid, ti in zip(g["event_id"], t):
            m = (t >= ti - 3_600_000_000) & (t <= ti)
            n_ref[eid] = int(m.sum())
            s_ref[eid] = round(float(v[m].sum()), 2)
    assert len(got) == len(ev)
    assert (got["n_1h"] == pd.Series(n_ref).sort_index()).all()
    assert np.allclose(got["sum_1h"], pd.Series(s_ref).sort_index(), atol=0.011)


@needs_data
def test_capped_sessionize_matches_reference(ray_session):
    from deekseek_ocr___dockerized_api_ray.pipelines.windows import (
        events_sessionize,
        events_sessionize_capped,
    )

    cap_s = 3600
    got = (events_sessionize_capped(SF, cap_s=cap_s).to_pandas()
           .sort_values(["user_id", "session_start_s"])
           .reset_index(drop=True))
    # single-process reference with the same anchor recurrence
    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["event_id", "ts", "user_id", "value"])
    ev = ev.sort_values(["user_id", "ts", "event_id"])
    rows = []
    for uid, g in ev.groupby("user_id"):
        ts = g["ts"].astype("datetime64[us]").astype("int64").to_numpy()
        v = g["value"].to_numpy()
        anchor, start = ts[0], 0
        for i in range(1, len(ts) + 1):
            if i == len(ts) or ts[i] - ts[i - 1] > 1800e6 or ts[i] - anchor > cap_s * 1e6:
                rows.append((uid, anchor // 10**6, i - start,
                             round(float(v[start:i].sum()), 2)))
                if i < len(ts):
                    anchor, start = ts[i], i
    ref = (pd.DataFrame(rows, columns=["user_id", "session_start_s",
                                       "n_events", "sum_value"])
           .sort_values(["user_id", "session_start_s"])
           .reset_index(drop=True))
    assert got[["user_id", "session_start_s", "n_events"]].equals(
        ref[["user_id", "session_start_s", "n_events"]])
    assert np.allclose(got["sum_value"], ref["sum_value"], atol=0.011)
    # cap = huge -> identical to the plain gap sessionizer
    plain = (events_sessionize(SF).to_pandas()
             .sort_values(["user_id", "session_start_s"])
             .reset_index(drop=True))
    capped = (events_sessionize_capped(SF, cap_s=10**9).to_pandas()
              .sort_values(["user_id", "session_start_s"])
              .reset_index(drop=True))
    assert capped[["user_id", "session_start_s", "n_events"]].equals(
        plain[["user_id", "session_start_s", "n_events"]])


@needs_data
def test_dim_broadcast_gates_path_equivalence(ray_session):
    """The three dim-attach ops produce identical output on the
    broadcast fast path and the above-the-gate hash-join path."""
    from deekseek_ocr___dockerized_api_ray.pipelines.analytics import (
        brand_revenue_hhi,
        priority_segment_matrix,
        supplier_count_rank,
    )

    for fn, keys in [(brand_revenue_hhi, None),
                     (priority_segment_matrix,
                      ["o_orderpriority", "c_mktsegment"]),
                     (supplier_count_rank,
                      ["n_nationkey", "rnk", "s_suppkey"])]:
        fast = fn(SF).to_pandas()
        slow = fn(SF, broadcast_rows=0).to_pandas()
        if keys:
            fast = fast.sort_values(keys).reset_index(drop=True)
            slow = slow.sort_values(keys).reset_index(drop=True)
        assert fast.equals(slow), fn.__name__
