"""Edge cases for the sequence/distribution operators (full oracle
parity is swept in test_entry.py): invariants plus pandas references."""

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
def test_transitions_probabilities_sum_to_one(ray_session):
    from deekseek_ocr___dockerized_api_ray.pipelines.sequences import (
        event_transitions,
    )

    got = _df(event_transitions(SF))
    assert len(got) > 0
    sums = got.groupby("src_type")["p"].sum()
    assert np.allclose(sums, 1.0, atol=1e-5)
    # total transitions = total events minus one per user
    ev = pd.read_parquet(f"{SF}/events.parquet", columns=["user_id"])
    assert got["n"].sum() == len(ev) - ev["user_id"].nunique()


@needs_data
def test_entropy_matches_pandas_reference(ray_session):
    from deekseek_ocr___dockerized_api_ray.pipelines.sequences import (
        user_event_entropy,
    )

    got = _df(user_event_entropy(SF)).set_index("user_id")
    ev = pd.read_parquet(f"{SF}/events.parquet", columns=["user_id", "event_type"])
    for uid, g in ev.groupby("user_id"):
        c = g["event_type"].value_counts().to_numpy(dtype=np.float64)
        n = c.sum()
        ref = np.log(n) - float((c * np.log(c)).sum()) / n
        assert abs(got.loc[uid, "entropy"] - ref) < 1e-5
        assert got.loc[uid, "n_types"] == len(c)
    # entropy bounded by ln(n_types)
    assert (got["entropy"] <= np.log(got["n_types"]) + 1e-9).all()
    assert (got["entropy"] >= -1e-9).all()


@needs_data
def test_winsorize_matches_numpy_reference(ray_session):
    from deekseek_ocr___dockerized_api_ray.pipelines.sequences import (
        winsorized_event_stats,
    )

    got = _df(winsorized_event_stats(SF)).set_index("event_type")
    ev = pd.read_parquet(f"{SF}/events.parquet", columns=["event_type", "value"])
    for et, g in ev.groupby("event_type"):
        v = g["value"].to_numpy(dtype=np.float64)
        qlo, qhi = np.quantile(v, [0.05, 0.95], method="linear")
        assert abs(got.loc[et, "q_lo"] - qlo) < 1e-5
        assert abs(got.loc[et, "q_hi"] - qhi) < 1e-5
        assert abs(got.loc[et, "wmean"]
                   - float(np.mean(np.clip(v, qlo, qhi)))) < 1e-5
    # winsorized mean lies within the clamp bounds
    assert ((got["wmean"] >= got["q_lo"]) & (got["wmean"] <= got["q_hi"])).all()


@needs_data
def test_bigram_logprob_short_docs_absent_and_bounds(ray_session):
    from deekseek_ocr___dockerized_api_ray.pipelines.sequences import (
        doc_bigram_logprob,
    )

    got = _df(doc_bigram_logprob(SF))
    docs = pd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    n_toks = docs["text"].str.split(" ").map(
        lambda ts: len([t for t in ts if t]))
    expect_ids = set(docs.loc[n_toks >= 2, "doc_id"])
    assert set(got["doc_id"]) == expect_ids
    # MLE bigram logprob is <= 0; n_bigrams = n_tokens - 1 per doc
    assert (got["logprob"] <= 1e-9).all()
    ref = (n_toks - 1)[n_toks >= 2]
    ref.index = docs.loc[n_toks >= 2, "doc_id"]
    merged = got.set_index("doc_id")["n_bigrams"]
    assert (merged == ref.reindex(merged.index)).all()


@needs_data
def test_ols_matches_numpy_polyfit(ray_session):
    from deekseek_ocr___dockerized_api_ray.pipelines.sequences import (
        TREND_ORIGIN_US,
        events_trend_ols,
    )

    got = _df(events_trend_ols(SF)).set_index("event_type")
    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["event_type", "ts", "value"])
    for et, g in ev.groupby("event_type"):
        x = (g["ts"].astype("int64").to_numpy() - TREND_ORIGIN_US) / 86400e6
        y = g["value"].to_numpy(dtype=np.float64)
        slope, intercept = np.polyfit(x, y, 1)
        assert abs(got.loc[et, "slope"] - slope) < 1e-4
        assert abs(got.loc[et, "intercept"] - intercept) < 1e-2
        r = np.corrcoef(x, y)[0, 1]
        assert abs(got.loc[et, "r2"] - r * r) < 1e-4
        assert 0.0 <= got.loc[et, "r2"] <= 1.0


@needs_data
def test_attribution_matches_pandas_reference(ray_session):
    from deekseek_ocr___dockerized_api_ray.pipelines.sequences import (
        first_touch_attribution,
    )

    got = _df(first_touch_attribution(SF)).set_index("first_type")
    ev = pd.read_parquet(
        f"{SF}/events.parquet",
        columns=["event_id", "ts", "user_id", "event_type"])
    ev = ev.sort_values(["user_id", "ts", "event_id"])
    first = ev.groupby("user_id").first()["event_type"]
    conv = ev.groupby("user_id")["event_type"].apply(
        lambda s: (s == "purchase").any())
    ref = pd.DataFrame({"first_type": first, "converted": conv}).groupby(
        "first_type").agg(n_users=("converted", "size"),
                          n_converted=("converted", "sum"))
    assert (got["n_users"] == ref["n_users"]).all()
    assert (got["n_converted"] == ref["n_converted"]).all()
    assert got["n_users"].sum() == ev["user_id"].nunique()


@needs_data
def test_corr_matches_numpy_reference(ray_session):
    from deekseek_ocr___dockerized_api_ray.pipelines.sequences import (
        event_type_value_corr,
    )

    got = _df(event_type_value_corr(SF))
    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["user_id", "event_type", "value"])
    means = ev.groupby(["user_id", "event_type"])["value"].mean().unstack()
    for _, row in got.iterrows():
        pair = means[[row["type_a"], row["type_b"]]].dropna()
        assert row["n"] == len(pair)
        ref = np.corrcoef(pair.iloc[:, 0], pair.iloc[:, 1])[0, 1]
        assert abs(row["r"] - ref) < 1e-5
        assert -1.0 - 1e-9 <= row["r"] <= 1.0 + 1e-9


def test_levenshtein_vec_reference_cases():
    from deekseek_ocr___dockerized_api_ray.pipelines.text import (
        levenshtein_vec,
    )

    cases = [("kitten", "sitting", 3), ("flaw", "lawn", 2), ("", "", 0),
             ("abc", "", 3), ("", "xyz", 3), ("same", "same", 0),
             ("ab", "ba", 2)]
    for a, b, d in cases:
        assert levenshtein_vec(a, b) == d
        assert levenshtein_vec(b, a) == d  # symmetric


@needs_data
def test_revenue_cube_gated_paths_agree(ray_session):
    from deekseek_ocr___dockerized_api_ray.pipelines.analytics import (
        revenue_cube,
    )

    fast = revenue_cube(SF)
    slow = revenue_cube(SF, broadcast_rows=0)
    pd.testing.assert_frame_equal(fast, slow)
    # grand total row reconciles with the finest grain
    grains = fast[(fast["r_name"] != "ALL") & (fast["c_mktsegment"] != "ALL")]
    total = fast[(fast["r_name"] == "ALL") & (fast["c_mktsegment"] == "ALL")]
    assert total["n_orders"].iloc[0] == grains["n_orders"].sum()


@needs_data
def test_streaming_tumbling_chunk_invariance_and_lateness(ray_session):
    """The watermark stream must equal the batch result for ANY chunk
    count and lateness horizon; state must stay bounded by open
    windows."""
    from deekseek_ocr___dockerized_api_ray.pipelines.windows import (
        streaming_tumbling_hour,
    )

    base = streaming_tumbling_hour(SF, n_chunks=1)
    for n_chunks in (3, 7):
        got = streaming_tumbling_hour(SF, n_chunks=n_chunks)
        pd.testing.assert_frame_equal(got, base)
    late = streaming_tumbling_hour(SF, n_chunks=4, lateness_s=7200)
    pd.testing.assert_frame_equal(late, base)


@needs_data
def test_streaming_tumbling_out_of_order_arrivals(ray_session):
    """With jittered arrival order, a lateness horizon >= the jitter
    bound must still reproduce the batch result exactly; a too-short
    horizon emits late-correction rows (more rows, same totals), never
    drops events."""
    from deekseek_ocr___dockerized_api_ray.pipelines.windows import (
        streaming_tumbling_hour,
    )

    base = streaming_tumbling_hour(SF, n_chunks=1)
    covered = streaming_tumbling_hour(SF, n_chunks=5, lateness_s=7200,
                                      arrival_jitter_s=7200)
    pd.testing.assert_frame_equal(covered, base)
    short = streaming_tumbling_hour(SF, n_chunks=5, lateness_s=0,
                                    arrival_jitter_s=7200)
    assert len(short) >= len(base)
    merged = (short.groupby(["window_start_s", "event_type"], as_index=False)
              .agg(n_events=("n_events", "sum")))
    ref = base[["window_start_s", "event_type", "n_events"]].reset_index(drop=True)
    pd.testing.assert_frame_equal(
        merged.sort_values(["window_start_s", "event_type"]).reset_index(drop=True),
        ref)


@needs_data
def test_events_late_data_matches_sequential_watermark(ray_session):
    """Differential: the hour-decomposed distributed scan must equal a
    single sequential pass over arrival order."""
    from deekseek_ocr___dockerized_api_ray.pipelines.windows import (
        events_late_data,
    )

    got = events_late_data(SF).to_pandas().reset_index(drop=True)

    ev = pd.read_parquet(f"{SF}/events.parquet", columns=["event_id", "ts"])
    ts_us = np.asarray(ev["ts"], dtype="datetime64[us]").astype(np.int64)
    eid = ev["event_id"].to_numpy(np.int64)
    arr = ts_us + ((eid % 86400) * 48271 % 601) * 1_000_000
    order = np.lexsort((eid, arr))
    run = np.maximum.accumulate(ts_us[order])
    hwm = np.empty(len(run)); hwm[0] = -np.inf; hwm[1:] = run[:-1]
    late = ts_us[order] < hwm - 120_000_000
    exp = pd.DataFrame({
        "event_id": eid[order], "is_late": late,
        "lateness_obs_s": np.where(
            late, (hwm - 120_000_000 - ts_us[order]) // 1_000_000, 0
        ).astype(np.int64),
    }).sort_values("event_id").reset_index(drop=True)

    assert got["event_id"].tolist() == exp["event_id"].tolist()
    assert got["is_late"].tolist() == exp["is_late"].tolist()
    assert got["lateness_obs_s"].tolist() == exp["lateness_obs_s"].tolist()
    # the jitter/lateness pair is discriminative: some but not all late
    assert 0 < int(got["is_late"].sum()) < len(got)


@needs_data
def test_events_late_data_grain_invariant(ray_session):
    """Path equivalence: sub-bucketing hot hours by minute (grain_s=60)
    -- the skew defense for event-rate-unbounded hour groups -- yields
    byte-identical output to the default hour grain."""
    from deekseek_ocr___dockerized_api_ray.pipelines.windows import (
        events_late_data,
    )

    hour = events_late_data(SF).to_pandas().reset_index(drop=True)
    minute = (events_late_data(SF, grain_s=60)
              .to_pandas().reset_index(drop=True))
    pd.testing.assert_frame_equal(hour, minute)


def test_events_ewma_alerts_matches_local_recursion(ray_session):
    """The distributed hour-count + driver-scan EWMA equals a local
    pandas recompute with the same recursion; alerts are exactly the
    |resid| > 3*RMS rows on r6-rounded operands."""
    from deekseek_ocr___dockerized_api_ray.functions.rounding import (
        round_half_away,
    )
    from deekseek_ocr___dockerized_api_ray.pipelines.windows import (
        events_ewma_alerts,
    )

    got = events_ewma_alerts(SF).to_pandas()

    ev = pd.read_parquet(f"{SF}/events.parquet", columns=["ts"])
    hour = (ev["ts"].to_numpy(dtype="datetime64[us]").astype(np.int64)
            // 3_600_000_000) * 3600
    counts = (pd.Series(hour).value_counts().sort_index())
    x = counts.to_numpy(dtype=np.float64)
    lam = 2 / 10
    s = np.empty(len(x)); resid = np.zeros(len(x))
    for t in range(len(x)):
        if t == 0:
            s[t] = x[t]
        else:
            resid[t] = x[t] - s[t - 1]
            s[t] = lam * x[t] + (1.0 - lam) * s[t - 1]
    assert got["hour_s"].tolist() == counts.index.tolist()
    assert got["n_events"].tolist() == counts.to_numpy(np.int64).tolist()
    assert got["ewma"].tolist() == [round_half_away(float(v), 6) for v in s]
    gate = round_half_away(3 * float(np.sqrt((resid[1:] ** 2).sum()
                                             / max(1, len(x) - 1))), 6)
    r6 = np.asarray([round_half_away(float(v), 6) for v in resid])
    assert got["is_alert"].tolist() == (np.abs(r6) > gate).tolist()
    assert not got["is_alert"].iloc[0]


@needs_data
def test_events_theil_sen_matches_local(ray_session):
    """The distributed hourly-count + driver pairwise-slope median
    equals a local recompute with the identical median formula, and the
    estimator is the median of slopes (bounded by their extremes)."""
    from deekseek_ocr___dockerized_api_ray.functions.rounding import (
        round_half_away,
    )
    from deekseek_ocr___dockerized_api_ray.pipelines.windows import (
        events_theil_sen,
    )

    got = events_theil_sen(SF).to_pandas()

    ev = pd.read_parquet(f"{SF}/events.parquet", columns=["ts"])
    hour = (ev["ts"].to_numpy(dtype="datetime64[us]").astype(np.int64)
            // 3_600_000_000) * 3600
    counts = pd.Series(hour).value_counts().sort_index()
    hx = (counts.index.to_numpy(dtype=np.int64)
          - int(counts.index.min())) // 3600
    n = counts.to_numpy(dtype=np.int64)

    def med(v):
        v = np.sort(v)
        m = len(v)
        return (float(v[(m - 1) // 2]) + float(v[m // 2])) / 2.0

    i, j = np.triu_indices(len(n), k=1)
    slopes = (n[j] - n[i]).astype(np.float64) / (hx[j] - hx[i]).astype(
        np.float64)
    slope = med(slopes)
    icpt = med(n.astype(np.float64) - slope * hx.astype(np.float64))
    assert int(got["n_hours"].iloc[0]) == len(n)
    assert float(got["slope"].iloc[0]) == round_half_away(slope, 6)
    assert float(got["intercept"].iloc[0]) == round_half_away(icpt, 6)
    assert slopes.min() <= slope <= slopes.max()


@needs_data
def test_events_holt_forecast_matches_local_recursion(ray_session):
    """The distributed hour-count + driver Holt recursion equals a local
    pandas recompute; the first forecast is defined as x_0 (err 0) and
    every later forecast is level+trend of the previous hour."""
    from deekseek_ocr___dockerized_api_ray.functions.rounding import (
        round_half_away,
    )
    from deekseek_ocr___dockerized_api_ray.pipelines.windows import (
        events_holt_forecast,
    )

    got = events_holt_forecast(SF).to_pandas()

    ev = pd.read_parquet(f"{SF}/events.parquet", columns=["ts"])
    hour = (ev["ts"].to_numpy(dtype="datetime64[us]").astype(np.int64)
            // 3_600_000_000) * 3600
    counts = pd.Series(hour).value_counts().sort_index()
    x = counts.to_numpy(dtype=np.float64)
    alpha, beta = 3 / 10, 1 / 10
    lvl = np.empty(len(x)); trd = np.empty(len(x)); fct = np.empty(len(x))
    lvl[0] = x[0]; trd[0] = float(int(x[1]) - int(x[0])); fct[0] = x[0]
    for t in range(1, len(x)):
        fct[t] = lvl[t - 1] + trd[t - 1]
        l_new = alpha * x[t] + (1.0 - alpha) * (lvl[t - 1] + trd[t - 1])
        trd[t] = beta * (l_new - lvl[t - 1]) + (1.0 - beta) * trd[t - 1]
        lvl[t] = l_new
    assert got["hour_s"].tolist() == counts.index.tolist()
    assert got["level"].tolist() == [round_half_away(float(v), 6)
                                     for v in lvl]
    assert got["trend"].tolist() == [round_half_away(float(v), 6)
                                     for v in trd]
    assert got["forecast"].tolist() == [round_half_away(float(v), 6)
                                        for v in fct]
    assert float(got["err"].iloc[0]) == 0.0


def test_training_shuffle_plan_properties(ray_session):
    """Deterministic in seed, dense per-shard positions, hash-ordered
    within shard, and the balance report equals the plan's own
    per-shard rollup."""
    import numpy as np

    from deekseek_ocr___dockerized_api_ray.functions.hashing import _hash64
    from deekseek_ocr___dockerized_api_ray.pipelines.sequences import (
        shard_balance_report,
        training_shuffle_plan,
    )

    sf = "/root/testdata/sf0.001"
    a = training_shuffle_plan(sf).to_pandas()
    b = training_shuffle_plan(sf).to_pandas()
    pd.testing.assert_frame_equal(a, b)  # same seed -> identical plan
    c = training_shuffle_plan(sf, seed=7).to_pandas()
    assert not a["shard"].equals(c["shard"])  # seed moves the plan

    docs = pd.read_parquet(f"{sf}/documents.parquet",
                           columns=["doc_id", "n_chars"])
    assert len(a) == len(docs) and a["doc_id"].is_unique
    for shard, g in a.groupby("shard"):
        assert (g["pos"].to_numpy() == np.arange(len(g))).all()
        hs = np.array([_hash64(f"42:{int(d)}") for d in g["doc_id"]],
                      dtype=np.uint64)
        assert (np.sort(hs) == hs).all()

    rep = shard_balance_report(sf).to_pandas().set_index("shard")
    j = a.merge(docs, on="doc_id")
    for shard, g in j.groupby("shard"):
        assert rep.loc[shard, "n_docs"] == len(g)
        assert rep.loc[shard, "n_chars"] == g["n_chars"].sum()
