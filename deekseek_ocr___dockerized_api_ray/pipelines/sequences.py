"""Event-sequence and distribution operators: Markov transition counts,
per-user event-type entropy, winsorized robust stats, and a bigram
language-model scorer.

Scale shapes (same rules as pipelines/analytics.py):

  - transitions: ONE bucketed keyed shuffle on user_id, per-bucket
    vectorized shift (the events_lag_delta pattern), then a tiny
    (src, dst) combiner aggregation -- never a self-join of the log.
  - entropy: (user, type) combiner counts -> per-user bucketed reduce
    with the exact algebra H = ln(n) - SUM(c ln c)/n so the oracle's
    float tree matches to the rounding digit.
  - winsorize: per-group EXACT quantiles; event_type cardinality is
    tiny and bounded, so each group's values fit one reduce call (the
    unbounded-cardinality scale path is the mergeable QuantileSketch in
    scale_ops.events_value_quantiles).
  - bigram LM: exploded (doc, w1, w2, tf) rows hash-join the
    combiner-reduced global bigram counts and the first-word marginals
    (vocabulary can be huge -> real joins, not broadcasts), then one
    per-doc combiner pass. p(w2|w1) = cnt2 / cnt1 where cnt1 is the
    marginal of cnt2 over w2 -- derivable in both engines exactly.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..functions.rounding import round_series
from ..stages.agg import grouped_agg
from .analytics import _user_bucket


def transition_dwell_times(sf_dir: str, n_buckets: int = 64):
    """Mean dwell seconds per (src_type, dst_type) transition: how long
    users sit on each step before the next -- the weighted edge view of
    event_transitions. Same one-keyed-shuffle shape; integer-microsecond
    gap sums divide once at the end.

    Output: (src_type, dst_type, n, mean_dwell_s r6) sorted.
    """
    import ray.data as rd

    from ..functions.rounding import round_series

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "ts", "user_id", "event_type"])

    def pairs_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"])
        ts = np.asarray(df["ts"], dtype="datetime64[us]").astype(np.int64)
        user = df["user_id"].to_numpy()
        et = df["event_type"].to_numpy()
        same = np.empty(len(df), dtype=bool)
        if len(df):
            same[0] = False
            same[1:] = user[1:] == user[:-1]
        gap = np.empty(len(df), dtype=np.int64)
        gap[0] = 0
        gap[1:] = ts[1:] - ts[:-1]
        return (pd.DataFrame({"src_type": np.roll(et, 1)[same],
                              "dst_type": et[same],
                              "gap_us": gap[same]})
                .groupby(["src_type", "dst_type"], as_index=False,
                         sort=False)
                .agg(n=("gap_us", "size"), sum_us=("gap_us", "sum")))

    bucketed = ev.map_batches(
        lambda df: _user_bucket(df, "user_id", n_buckets),
        batch_format="pandas", batch_size=131072,
    )
    partial = bucketed.groupby("bucket").map_groups(
        lambda df: pairs_bucket(df.drop(columns=["bucket"])),
        batch_format="pandas")
    counts = grouped_agg(partial, ["src_type", "dst_type"],
                         {"n": ("n", "sum"), "sum_us": ("sum_us", "sum")},
                         n_buckets=8)

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        df["mean_dwell_s"] = round_series(
            df["sum_us"] / df["n"] / 1e6, 6)
        df["n"] = df["n"].astype("int64")
        return df[["src_type", "dst_type", "n", "mean_dwell_s"]]

    return counts.map_batches(finish, batch_format="pandas").sort(
        ["src_type", "dst_type"])


def view_purchase_conversion(sf_dir: str, window_s: int = 3600,
                             n_buckets: int = 64):
    """Time-bound conversion: per user, purchases preceded by a view
    within the last hour (view strictly before, window inclusive at the
    far edge) -- the funnel-with-deadline primitive. One user-bucketed
    shuffle; per user segment the qualifying test is two searchsorted
    probes of the purchase times against the user's sorted view times
    (no event self-join, no window explode).

    Output: (user_id, n_purchases, n_qualified) for users with >= 1
    purchase, sorted by user_id.
    """
    import ray.data as rd

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["ts", "user_id", "event_type"])

    def conv_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts"])
        ts = np.asarray(df["ts"], dtype="datetime64[us]").astype(np.int64)
        user = df["user_id"].to_numpy()
        et = df["event_type"].to_numpy()
        seg = np.flatnonzero(np.concatenate(([True], user[1:] != user[:-1])))
        seg_end = np.append(seg[1:], len(df))
        w_us = window_s * 1_000_000
        out_u, out_p, out_q = [], [], []
        for a, b in zip(seg, seg_end):
            is_p = et[a:b] == "purchase"
            if not is_p.any():
                continue
            pt = ts[a:b][is_p]
            vt = ts[a:b][et[a:b] == "view"]
            lo = np.searchsorted(vt, pt - w_us, side="left")
            hi = np.searchsorted(vt, pt, side="left")  # strictly before
            out_u.append(user[a])
            out_p.append(len(pt))
            out_q.append(int((hi > lo).sum()))
        return pd.DataFrame({
            "user_id": np.asarray(out_u, dtype=np.int64),
            "n_purchases": np.asarray(out_p, dtype=np.int64),
            "n_qualified": np.asarray(out_q, dtype=np.int64),
        })

    bucketed = ev.map_batches(
        lambda df: _user_bucket(df, "user_id", n_buckets),
        batch_format="pandas", batch_size=131072,
    )
    return bucketed.groupby("bucket").map_groups(
        lambda df: conv_bucket(df.drop(columns=["bucket"])),
        batch_format="pandas").sort("user_id")


def event_trigrams(sf_dir: str, n_buckets: int = 64):
    """Second-order path counts: every consecutive event-type TRIPLE of
    one user (ordered by ts, event_id) -- the 3-step funnel/sankey
    grain. Same one-keyed-shuffle shape as event_transitions; triples
    come from two shifted masks over the bucket-sorted frame.

    Output: (t1, t2, t3, n) sorted by (t1, t2, t3).
    """
    import ray.data as rd

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "ts", "user_id", "event_type"])

    def triples_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"])
        user = df["user_id"].to_numpy()
        et = df["event_type"].to_numpy()
        n = len(df)
        if n < 3:
            return pd.DataFrame({"t1": [], "t2": [], "t3": [], "n": []})
        same3 = (user[2:] == user[1:-1]) & (user[1:-1] == user[:-2])
        return (pd.DataFrame({"t1": et[:-2][same3], "t2": et[1:-1][same3],
                              "t3": et[2:][same3]})
                .groupby(["t1", "t2", "t3"], as_index=False, sort=False)
                .agg(n=("t3", "size")))

    bucketed = ev.map_batches(
        lambda df: _user_bucket(df, "user_id", n_buckets),
        batch_format="pandas", batch_size=131072,
    )
    partial = bucketed.groupby("bucket").map_groups(
        lambda df: triples_bucket(df.drop(columns=["bucket"])),
        batch_format="pandas")
    counts = grouped_agg(partial, ["t1", "t2", "t3"],
                         {"n": ("n", "sum")}, n_buckets=8)

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        df["n"] = df["n"].astype("int64")
        return df[["t1", "t2", "t3", "n"]]

    return counts.map_batches(finish, batch_format="pandas").sort(
        ["t1", "t2", "t3"])


def event_transitions(sf_dir: str, n_buckets: int = 64):
    """First-order Markov transitions: for every consecutive event pair
    of one user (ordered by ts, event_id), count (src_type, dst_type)
    and the transition probability p = n / n_src.

    Output: (src_type, dst_type, n, p r6) sorted by src, dst.
    """
    import ray.data as rd

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "ts", "user_id", "event_type"])

    def pairs_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"])
        user = df["user_id"].to_numpy()
        et = df["event_type"].to_numpy()
        same = np.empty(len(df), dtype=bool)
        if len(df):
            same[0] = False
            same[1:] = user[1:] == user[:-1]
        src = np.roll(et, 1)[same]
        dst = et[same]
        return (pd.DataFrame({"src_type": src, "dst_type": dst})
                .groupby(["src_type", "dst_type"], as_index=False, sort=False)
                .agg(n=("dst_type", "size")))

    bucketed = ev.map_batches(
        lambda df: _user_bucket(df, "user_id", n_buckets),
        batch_format="pandas", batch_size=131072,
    )
    partial = bucketed.groupby("bucket").map_groups(
        lambda df: pairs_bucket(df.drop(columns=["bucket"])),
        batch_format="pandas")
    counts = grouped_agg(partial, ["src_type", "dst_type"],
                         {"n": ("n", "sum")}, n_buckets=8)

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        # per-source totals: event_type cardinality is tiny -> this is a
        # tiny aggregate; compute within the (already keyed) reduce by
        # regrouping the full counts table, which fits one batch
        df = df.sort_values(["src_type", "dst_type"])
        tot = df.groupby("src_type")["n"].transform("sum").to_numpy()
        return pd.DataFrame({
            "src_type": df["src_type"].to_numpy(),
            "dst_type": df["dst_type"].to_numpy(),
            "n": df["n"].to_numpy().astype("int64"),
            "p": round_series(pd.Series(df["n"].to_numpy() / tot), 6).to_numpy(),
        })

    # counts is (|types|^2) rows -- tiny; one repartition collapses it so
    # the per-source marginal sees every dst
    return counts.repartition(1).map_batches(finish, batch_format="pandas")


def user_event_entropy(sf_dir: str, n_buckets: int = 64):
    """Shannon entropy (nats) of each user's event-type distribution,
    via the summation-order-stable algebra
    ``H = ln(n) - SUM(c * ln(c)) / n``.

    Output: (user_id, n_events, n_types, entropy r6) sorted by user_id.
    """
    import ray.data as rd

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "event_type"])

    per_type = grouped_agg(ev, ["user_id", "event_type"],
                           {"c": ("event_type", "size")}, n_buckets=n_buckets)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        c = df["c"].to_numpy(dtype=np.float64)
        return pd.DataFrame({"user_id": df["user_id"].to_numpy(),
                             "clnc": c * np.log(c),
                             "n": df["c"].to_numpy(dtype=np.int64),
                             "k": np.ones(len(df), dtype=np.int64)})

    agg = grouped_agg(per_type.map_batches(partial, batch_format="pandas"),
                      ["user_id"],
                      {"clnc": ("clnc", "sum"), "n": ("n", "sum"),
                       "k": ("k", "sum")}, n_buckets=16)

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        n = df["n"].to_numpy(dtype=np.float64)
        ent = np.log(n) - df["clnc"].to_numpy() / n
        return pd.DataFrame({
            "user_id": df["user_id"].astype("int64"),
            "n_events": df["n"].astype("int64"),
            "n_types": df["k"].astype("int64"),
            "entropy": round_series(pd.Series(ent), 6).to_numpy(),
        })

    return agg.map_batches(finish, batch_format="pandas").sort("user_id")


def source_lang_entropy(sf_dir: str, n_buckets: int = 8):
    """Language diversity per corpus source: Shannon entropy (nats) of
    each source's language distribution -- the corpus-mixing diagnostic.
    Same summation-order-stable algebra as user_event_entropy
    (H = ln n - sum(c ln c) / n) over a (source, lang) count combiner.

    Output: (source, n_docs, n_langs, entropy r6) sorted by source.
    """
    import ray.data as rd

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["source", "lang"])

    per_lang = grouped_agg(docs, ["source", "lang"],
                           {"c": ("lang", "size")}, n_buckets=n_buckets)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        c = df["c"].to_numpy(dtype=np.float64)
        return pd.DataFrame({"source": df["source"].to_numpy(),
                             "clnc": c * np.log(c),
                             "n": df["c"].to_numpy(dtype=np.int64),
                             "k": np.ones(len(df), dtype=np.int64)})

    agg = grouped_agg(per_lang.map_batches(partial, batch_format="pandas"),
                      ["source"],
                      {"clnc": ("clnc", "sum"), "n": ("n", "sum"),
                       "k": ("k", "sum")}, n_buckets=4)

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        n = df["n"].to_numpy(dtype=np.float64)
        ent = np.log(n) - df["clnc"].to_numpy() / n
        return pd.DataFrame({
            "source": df["source"],
            "n_docs": df["n"].astype("int64"),
            "n_langs": df["k"].astype("int64"),
            "entropy": round_series(pd.Series(ent), 6).to_numpy(),
        })

    return agg.map_batches(finish, batch_format="pandas").sort("source")


def winsorized_event_stats(sf_dir: str, lo: float = 0.05, hi: float = 0.95):
    """Per event type: exact lo/hi quantiles (linear interpolation, the
    quantile_cont convention) and the winsorized mean (values clamped to
    [q_lo, q_hi] before averaging).

    Exact per-group quantiles require the group's values in one reduce
    call -- sound here because event_type cardinality is tiny and
    bounded. For unbounded group keys use the mergeable QuantileSketch
    (scale_ops.events_value_quantiles) instead.

    Output: (event_type, n, q_lo r6, q_hi r6, wmean r6) sorted by type.
    """
    import ray.data as rd

    from ..functions.text_stats import sha1_64

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "value"])

    def bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["bucket"] = [sha1_64(v) % 8 for v in df["event_type"]]
        return df

    def stats(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for et, g in df.groupby("event_type", sort=False):
            v = g["value"].to_numpy(dtype=np.float64)
            qlo, qhi = np.quantile(v, [lo, hi], method="linear")
            rows.append((et, len(v), qlo, qhi,
                         float(np.mean(np.clip(v, qlo, qhi)))))
        out = pd.DataFrame(rows, columns=["event_type", "n", "q_lo", "q_hi",
                                          "wmean"])
        out["n"] = out["n"].astype("int64")
        for c in ("q_lo", "q_hi", "wmean"):
            out[c] = round_series(out[c], 6)
        return out

    return (ev.map_batches(bucket, batch_format="pandas", batch_size=131072)
            .groupby("bucket").map_groups(
                lambda df: stats(df.drop(columns=["bucket"])),
                batch_format="pandas")
            .sort("event_type"))


def doc_bigram_logprob(sf_dir: str):
    """Bigram language-model score per document: average bigram
    log-probability under the corpus's own MLE bigram model,
    ``SUM(tf * (ln(cnt2) - ln(cnt1))) / SUM(tf)`` where cnt2 is the
    corpus count of the bigram and cnt1 the marginal count of its first
    word over all bigrams.

    Documents with fewer than 2 tokens have no bigrams and are absent
    (matching the oracle's inner join).

    Output: (doc_id, n_bigrams, logprob r6) sorted by doc_id.
    """
    import ray
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def bigram_counts(batch) -> pd.DataFrame:
        df = batch.to_pandas() if not isinstance(batch, pd.DataFrame) else batch
        ids, w1s, w2s = [], [], []
        for doc_id, text in zip(df["doc_id"].to_numpy(), df["text"]):
            toks = [t for t in text.split(" ") if t]
            if len(toks) < 2:
                continue
            a = np.asarray(toks, dtype=object)
            ids.append(np.full(len(a) - 1, doc_id, dtype=np.int64))
            w1s.append(a[:-1])
            w2s.append(a[1:])
        if not ids:
            return pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                                 "w1": pd.Series(dtype="object"),
                                 "w2": pd.Series(dtype="object"),
                                 "tf": pd.Series(dtype="int64")})
        ex = pd.DataFrame({"doc_id": np.concatenate(ids),
                           "w1": np.concatenate(w1s),
                           "w2": np.concatenate(w2s)})
        return (ex.groupby(["doc_id", "w1", "w2"], as_index=False, sort=False)
                .agg(tf=("w2", "size")))

    toks = ds.map_batches(bigram_counts, batch_format="pyarrow", batch_size=8192)
    vocab2 = grouped_agg(toks, ["w1", "w2"], {"cnt2": ("tf", "sum")},
                         n_buckets=16).materialize()
    vocab1 = grouped_agg(vocab2, ["w1"], {"cnt1": ("cnt2", "sum")}, n_buckets=16)

    cpus = int(ray.cluster_resources().get("CPU", 4)) if ray.is_initialized() else 4
    nparts = max(2, cpus // 2)
    joined = (toks.join(vocab2, join_type="inner", num_partitions=nparts,
                        on=("w1", "w2"))
              .join(vocab1, join_type="inner", num_partitions=nparts,
                    on=("w1",)))

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        tf = df["tf"].to_numpy(dtype=np.float64)
        lp = np.log(df["cnt2"].to_numpy(dtype=np.float64)) \
            - np.log(df["cnt1"].to_numpy(dtype=np.float64))
        return pd.DataFrame({"doc_id": df["doc_id"].to_numpy(),
                             "wsum": tf * lp,
                             "nbig": df["tf"].to_numpy(dtype=np.int64)})

    agg = grouped_agg(joined.map_batches(partial, batch_format="pandas"),
                      ["doc_id"], {"wsum": ("wsum", "sum"),
                                   "nbig": ("nbig", "sum")})

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        lp = df["wsum"].to_numpy() / df["nbig"].to_numpy(dtype=np.float64)
        return pd.DataFrame({"doc_id": df["doc_id"].astype("int64"),
                             "n_bigrams": df["nbig"].astype("int64"),
                             "logprob": round_series(pd.Series(lp), 6)})

    return agg.map_batches(finish, batch_format="pandas").sort("doc_id")


#: fixed origin (1998-01-01 UTC, microseconds) -- x values are centered
#: days so the moment sums stay in a well-conditioned float range and
#: the engine and the oracle compute identical doubles from epoch_us
TREND_ORIGIN_US = 883_612_800_000_000


def events_trend_ols(sf_dir: str, n_buckets: int = 8):
    """Per-event-type least-squares trend of value over time: slope per
    day, intercept at the fixed origin and R^2, from the classic moment
    sums (n, Sx, Sy, Sxx, Sxy, Syy) -- a pure combiner aggregation, no
    sort, no window. x = (epoch_us - origin) / 86400e6 is computed from
    exact int64 microseconds in BOTH engines, so the float trees agree
    to the rounding digit.

    Output: (event_type, n, slope r6, intercept r4, r2 r6) sorted by
    type. The intercept sits ~1e3x farther from the data centroid than
    the slope scale, so sum-order noise reaches its 6th decimal --
    rounded at 4.
    """
    import ray.data as rd

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "ts", "value"])

    def moments(df: pd.DataFrame) -> pd.DataFrame:
        ts_us = np.asarray(df["ts"], dtype="datetime64[us]").astype(np.int64)
        x = (ts_us - TREND_ORIGIN_US) / 86400e6
        y = df["value"].to_numpy(dtype=np.float64)
        return pd.DataFrame({
            "event_type": df["event_type"].to_numpy(),
            "n": np.ones(len(df), dtype=np.int64),
            "sx": x, "sy": y, "sxx": x * x, "sxy": x * y, "syy": y * y,
        })

    agg = grouped_agg(
        ev.map_batches(moments, batch_format="pandas", batch_size=131072),
        ["event_type"],
        {c: (c, "sum") for c in ("n", "sx", "sy", "sxx", "sxy", "syy")},
        n_buckets=n_buckets)

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        n = df["n"].to_numpy(dtype=np.float64)
        sx, sy = df["sx"].to_numpy(), df["sy"].to_numpy()
        sxx, sxy, syy = df["sxx"].to_numpy(), df["sxy"].to_numpy(), df["syy"].to_numpy()
        cov = n * sxy - sx * sy
        varx = n * sxx - sx * sx
        vary = n * syy - sy * sy
        slope = cov / varx
        intercept = (sy - slope * sx) / n
        r2 = (cov * cov) / (varx * vary)
        return pd.DataFrame({
            "event_type": df["event_type"].to_numpy(),
            "n": df["n"].astype("int64"),
            "slope": round_series(pd.Series(slope), 6).to_numpy(),
            "intercept": round_series(pd.Series(intercept), 4).to_numpy(),
            "r2": round_series(pd.Series(r2), 6).to_numpy(),
        })

    return agg.map_batches(finish, batch_format="pandas").sort("event_type")


def last_touch_attribution(sf_dir: str, goal: str = "purchase",
                           n_buckets: int = 64):
    """Last-touch attribution: credit each converting user's FIRST
    ``goal`` event to the latest non-goal event before it (the
    marketing counterpart of first_touch_attribution); users whose
    first goal has no prior touch credit ``(direct)``. One user-keyed
    shuffle; the per-user scan runs on the bucket-sorted segment.

    Output: (last_type, n_conversions) sorted by type.
    """
    import ray.data as rd

    from ..stages.agg import grouped_agg

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "ts", "user_id", "event_type"])

    def per_user(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"])
        user = df["user_id"].to_numpy()
        et = df["event_type"].to_numpy()
        seg = np.flatnonzero(np.concatenate(([True], user[1:] != user[:-1])))
        seg_end = np.append(seg[1:], len(df))
        out = []
        for a, b in zip(seg, seg_end):
            goal_idx = np.flatnonzero(et[a:b] == goal)
            if len(goal_idx) == 0:
                continue
            g = a + goal_idx[0]
            prior = np.flatnonzero(et[a:g] != goal)
            out.append(et[a + prior[-1]] if len(prior) else "(direct)")
        return (pd.DataFrame({"last_type": out})
                .groupby("last_type", as_index=False)
                .agg(n_conversions=("last_type", "size")))

    bucketed = ev.map_batches(
        lambda df: _user_bucket(df, "user_id", n_buckets),
        batch_format="pandas", batch_size=131072,
    )
    partial = bucketed.groupby("bucket").map_groups(
        lambda df: per_user(df.drop(columns=["bucket"])),
        batch_format="pandas")
    agg = grouped_agg(partial, ["last_type"],
                      {"n_conversions": ("n_conversions", "sum")},
                      n_buckets=4)

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        df["n_conversions"] = df["n_conversions"].astype("int64")
        return df[["last_type", "n_conversions"]]

    return agg.map_batches(finish, batch_format="pandas").sort("last_type")


def first_touch_attribution(sf_dir: str, goal: str = "purchase",
                            n_buckets: int = 64):
    """First-touch attribution: credit each user's conversion (any
    ``goal`` event) to their FIRST event's type, reporting per channel
    the users acquired, conversions and conversion rate.

    Shape: one bucketed keyed shuffle on user_id; the per-bucket kernel
    is a vectorized groupby-idxmin (first touch) + any-goal flag; the
    final per-channel rollup is a tiny combiner aggregate.

    Output: (first_type, n_users, n_converted, cvr r6) sorted by type.
    """
    import ray.data as rd

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "ts", "user_id", "event_type"])

    def per_user(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"])
        first = df.groupby("user_id", sort=False).first()
        conv = (df["event_type"] == goal).groupby(
            df["user_id"], sort=False).any()
        return pd.DataFrame({
            "first_type": first["event_type"].to_numpy(),
            "converted": conv.reindex(first.index).to_numpy().astype(np.int64),
            "one": np.ones(len(first), dtype=np.int64),
        })

    bucketed = ev.map_batches(
        lambda df: _user_bucket(df, "user_id", n_buckets),
        batch_format="pandas", batch_size=131072,
    )
    partial = bucketed.groupby("bucket").map_groups(
        lambda df: per_user(df.drop(columns=["bucket"])),
        batch_format="pandas")
    agg = grouped_agg(partial, ["first_type"],
                      {"n_users": ("one", "sum"),
                       "n_converted": ("converted", "sum")}, n_buckets=4)

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "first_type": df["first_type"].to_numpy(),
            "n_users": df["n_users"].astype("int64"),
            "n_converted": df["n_converted"].astype("int64"),
            "cvr": round_series(
                pd.Series(df["n_converted"].to_numpy()
                          / df["n_users"].to_numpy()), 6).to_numpy(),
        })

    return agg.map_batches(finish, batch_format="pandas").sort("first_type")


def event_type_value_corr(sf_dir: str, n_buckets: int = 64):
    """Pearson correlation, across users, between per-user MEAN values
    of every event-type pair -- the correlation-matrix operator. Only
    users with both types contribute to a pair.

    Shape: (user, type) combiner means -> per-user bucketed pairing
    (each user emits its type-pair moment rows) -> tiny pair-moment
    combiner -> closed-form r. The moment algebra
    ``r = (n*sxy - sx*sy) / sqrt((n*sxx - sx^2) * (n*syy - sy^2))``
    is shared with the oracle.

    Output: (type_a, type_b, n, r r6) for type_a < type_b, sorted.
    """
    import ray.data as rd

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "event_type", "value"])

    means = grouped_agg(ev, ["user_id", "event_type"],
                        {"s": ("value", "sum"), "c": ("value", "count")},
                        n_buckets=n_buckets)

    def pair_moments(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["m"] = df["s"].to_numpy() / df["c"].to_numpy(dtype=np.float64)
        rows = []
        for _, g in df.groupby("user_id", sort=False):
            g = g.sort_values("event_type")
            types = g["event_type"].to_numpy()
            m = g["m"].to_numpy()
            for i in range(len(g)):
                for j in range(i + 1, len(g)):
                    rows.append((types[i], types[j], m[i], m[j]))
        if not rows:
            return pd.DataFrame({"type_a": pd.Series(dtype="object"),
                                 "type_b": pd.Series(dtype="object"),
                                 "x": pd.Series(dtype="float64"),
                                 "y": pd.Series(dtype="float64")})
        return pd.DataFrame(rows, columns=["type_a", "type_b", "x", "y"])

    def bucket(df: pd.DataFrame) -> pd.DataFrame:
        return _user_bucket(df, "user_id", n_buckets)

    paired = (means.map_batches(bucket, batch_format="pandas")
              .groupby("bucket").map_groups(
                  lambda df: pair_moments(df.drop(columns=["bucket"])),
                  batch_format="pandas"))

    def moments(df: pd.DataFrame) -> pd.DataFrame:
        x = df["x"].to_numpy()
        y = df["y"].to_numpy()
        return pd.DataFrame({
            "type_a": df["type_a"].to_numpy(),
            "type_b": df["type_b"].to_numpy(),
            "n": np.ones(len(df), dtype=np.int64),
            "sx": x, "sy": y, "sxx": x * x, "sxy": x * y, "syy": y * y,
        })

    agg = grouped_agg(paired.map_batches(moments, batch_format="pandas"),
                      ["type_a", "type_b"],
                      {c: (c, "sum")
                       for c in ("n", "sx", "sy", "sxx", "sxy", "syy")},
                      n_buckets=4)

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        n = df["n"].to_numpy(dtype=np.float64)
        sx, sy = df["sx"].to_numpy(), df["sy"].to_numpy()
        sxx, sxy, syy = (df["sxx"].to_numpy(), df["sxy"].to_numpy(),
                         df["syy"].to_numpy())
        r = (n * sxy - sx * sy) / np.sqrt(
            (n * sxx - sx * sx) * (n * syy - sy * sy))
        return pd.DataFrame({
            "type_a": df["type_a"].to_numpy(),
            "type_b": df["type_b"].to_numpy(),
            "n": df["n"].astype("int64"),
            "r": round_series(pd.Series(r), 6).to_numpy(),
        })

    return (agg.map_batches(finish, batch_format="pandas")
            .sort(["type_a", "type_b"]))


def user_mode_event_type(sf_dir: str, n_buckets: int = 16):
    """MODE aggregate: each user's most frequent event type (ties to
    the lexicographically smallest type -- a total order both engines
    share). (user, type) combiner counts -> per-user bucketed argmax.

    Output: (user_id, mode_type, n) sorted by user_id.
    """
    import ray.data as rd

    from ..stages.agg import _bucket_of

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "event_type"])
    counts = grouped_agg(ev, ["user_id", "event_type"],
                         {"n": ("event_type", "size")}, n_buckets=n_buckets)

    def bucket(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame(columns=list(df.columns) + ["bucket"])
        df = df.copy()
        df["bucket"] = _bucket_of(df, ["user_id"], n_buckets)
        return df

    def argmax(df: pd.DataFrame) -> pd.DataFrame:
        win = (df.drop(columns=["bucket"])
               .sort_values(["user_id", "n", "event_type"],
                            ascending=[True, False, True])
               .groupby("user_id", as_index=False).first())
        return pd.DataFrame({"user_id": win["user_id"].astype("int64"),
                             "mode_type": win["event_type"].to_numpy(),
                             "n": win["n"].astype("int64")})

    return (counts.map_batches(bucket, batch_format="pandas")
            .groupby("bucket").map_groups(argmax, batch_format="pandas")
            .sort("user_id"))


def user_event_type_set(sf_dir: str, n_buckets: int = 16):
    """Set/list aggregation: each user's distinct event types as a
    sorted comma-joined string (the string_agg(DISTINCT ... ORDER BY)
    shape). Partial per-batch dedup -> per-user bucketed reduce that
    dedups exactly and joins -- the mergeable-set pattern shared with
    events_user_reach.

    Output: (user_id, n_types, type_set) sorted by user_id.
    """
    import ray.data as rd

    from ..stages.agg import _bucket_of

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "event_type"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop_duplicates(["user_id", "event_type"])

    def bucket(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame(columns=list(df.columns) + ["bucket"])
        df = df.copy()
        df["bucket"] = _bucket_of(df, ["user_id"], n_buckets)
        return df

    def reduce(df: pd.DataFrame) -> pd.DataFrame:
        df = (df.drop(columns=["bucket"])
              .drop_duplicates(["user_id", "event_type"])
              .sort_values(["user_id", "event_type"]))
        g = df.groupby("user_id", sort=False)["event_type"]
        out = g.agg(lambda s: ",".join(s)).reset_index(name="type_set")
        out["n_types"] = g.size().to_numpy()
        out["user_id"] = out["user_id"].astype("int64")
        out["n_types"] = out["n_types"].astype("int64")
        return out[["user_id", "n_types", "type_set"]]

    return (ev.map_batches(partial, batch_format="pandas", batch_size=131072)
            .map_batches(bucket, batch_format="pandas")
            .groupby("bucket").map_groups(reduce, batch_format="pandas")
            .sort("user_id"))


def user_event_unpivot(sf_dir: str):
    """UNPIVOT/melt: the inverse of ``user_event_pivot`` -- the wide
    per-user count matrix melted back to (user_id, event_type, n) long
    rows, dropping zero cells (the sparse long form). The wide table is
    computed by the pivot operator itself, so pivot -> unpivot is an
    exercised round trip; the melt is a stateless vectorized map.

    Output: (user_id, event_type, n) sorted by user, type.
    """
    from .analytics import user_event_pivot

    types = ["click", "error", "purchase", "signup", "view"]
    wide = user_event_pivot(sf_dir)

    def melt(df: pd.DataFrame) -> pd.DataFrame:
        out = df.melt(id_vars=["user_id"],
                      value_vars=[f"n_{t}" for t in types],
                      var_name="event_type", value_name="n")
        out["event_type"] = out["event_type"].str.slice(2)
        out = out[out["n"] > 0]
        out["n"] = out["n"].astype("int64")
        return out[["user_id", "event_type", "n"]]

    return wide.map_batches(melt, batch_format="pandas").sort(
        ["user_id", "event_type"])


def event_value_quantiles_disc(sf_dir: str, qs=(0.25, 0.5, 0.75, 0.95)):
    """Discrete per-group quantiles (quantile_disc: the value AT the
    lower order statistic, never interpolated) per event type -- the
    companion of the continuous winsorize/quantile ops. Exact per-group
    computation in one bucketed reduce (tiny bounded group keys; the
    unbounded-key scale path is the mergeable sketch).

    Output: (event_type, n, q25, q50, q75, q95) r6, sorted by type.
    """
    import ray.data as rd

    from ..functions.text_stats import sha1_64

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "value"])

    def bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["bucket"] = [sha1_64(v) % 8 for v in df["event_type"]]
        return df

    def stats(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for et, g in df.groupby("event_type", sort=False):
            v = np.sort(g["value"].to_numpy(dtype=np.float64))
            n = len(v)
            # DuckDB quantile_disc picks the order statistic at
            # ceil(q*n) (the inverted-CDF convention), which is numpy's
            # method="inverted_cdf" -- NOT method="lower"
            picks = [float(np.quantile(v, q, method="inverted_cdf"))
                     for q in qs]
            rows.append((et, n, *picks))
        cols = ["event_type", "n"] + [f"q{int(q * 100)}" for q in qs]
        out = pd.DataFrame(rows, columns=cols)
        out["n"] = out["n"].astype("int64")
        for c in cols[2:]:
            out[c] = round_series(out[c], 6)
        return out

    return (ev.map_batches(bucket, batch_format="pandas", batch_size=131072)
            .groupby("bucket").map_groups(
                lambda df: stats(df.drop(columns=["bucket"])),
                batch_format="pandas")
            .sort("event_type"))


def event_pattern_counts(sf_dir: str, pattern: str = "sv*p",
                         n_buckets: int = 64):
    """CEP-style sequence pattern matching (the MATCH_RECOGNIZE shape):
    each user's time-ordered event stream is reduced to an initials
    string (c/e/p/s/v) and scanned for non-overlapping regex matches --
    e.g. the default 'sv*p' = signup, any views, then a purchase. Both
    engines scan left-to-right non-overlapping (Python re.findall ==
    DuckDB regexp_extract_all for this pattern class).

    Shape: ONE bucketed keyed shuffle on user_id; the per-bucket kernel
    builds each user's sequence (vectorized sort + per-user join) and
    applies one compiled regex. Output: (user_id, n_events, n_matches)
    sorted by user_id.
    """
    import re

    import ray.data as rd

    rx = re.compile(pattern)
    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "ts", "user_id", "event_type"])

    def per_user(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"])
        initials = df["event_type"].str.slice(0, 1)
        seqs = initials.groupby(df["user_id"].to_numpy(), sort=True).agg("".join)
        return pd.DataFrame({
            "user_id": seqs.index.to_numpy().astype(np.int64),
            "n_events": np.asarray([len(s) for s in seqs], dtype=np.int64),
            "n_matches": np.asarray([len(rx.findall(s)) for s in seqs],
                                    dtype=np.int64),
        })

    bucketed = ev.map_batches(
        lambda df: _user_bucket(df, "user_id", n_buckets),
        batch_format="pandas", batch_size=131072,
    )
    return bucketed.groupby("bucket").map_groups(
        lambda df: per_user(df.drop(columns=["bucket"])),
        batch_format="pandas").sort("user_id")


def events_value_moments(sf_dir: str, n_buckets: int = 8):
    """Per-event-type distribution profile -- mean, population variance,
    skewness and EXCESS kurtosis -- from the raw power sums
    (n, s1..s4): a pure combiner aggregation, the standard one-pass
    shape for distribution monitoring over a 100 TB stream (no sort, no
    second pass, partials merge by addition).

    Central moments from raw sums use the SAME float expression tree as
    the SQL oracle (products left-associated, sqrt not pow), so after
    summation both engines agree to the rounding digit:

        m1 = s1/n
        m2 = s2/n - m1*m1
        m3 = s3/n - 3*m1*(s2/n) + 2*m1*m1*m1
        m4 = s4/n - 4*m1*(s3/n) + 6*m1*m1*(s2/n) - 3*m1*m1*m1*m1
        skew = m3 / (m2 * sqrt(m2));  kurt = m4 / (m2*m2) - 3

    Output: (event_type, n, mean r6, var r6, skew r6, kurt r6) sorted
    by type.
    """
    import ray.data as rd

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "value"])

    def powers(df: pd.DataFrame) -> pd.DataFrame:
        y = df["value"].to_numpy(dtype=np.float64)
        y2 = y * y
        y3 = y2 * y
        y4 = y3 * y
        return pd.DataFrame({
            "event_type": df["event_type"].to_numpy(),
            "n": np.ones(len(df), dtype=np.int64),
            "s1": y, "s2": y2, "s3": y3, "s4": y4,
        })

    agg = grouped_agg(
        ev.map_batches(powers, batch_format="pandas", batch_size=131072),
        ["event_type"],
        {c: (c, "sum") for c in ("n", "s1", "s2", "s3", "s4")},
        n_buckets=n_buckets)

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        n = df["n"].to_numpy(dtype=np.float64)
        s1, s2 = df["s1"].to_numpy(), df["s2"].to_numpy()
        s3, s4 = df["s3"].to_numpy(), df["s4"].to_numpy()
        m1 = s1 / n
        m2 = s2 / n - m1 * m1
        m3 = s3 / n - 3 * m1 * (s2 / n) + 2 * m1 * m1 * m1
        m4 = (s4 / n - 4 * m1 * (s3 / n) + 6 * m1 * m1 * (s2 / n)
              - 3 * m1 * m1 * m1 * m1)
        return pd.DataFrame({
            "event_type": df["event_type"].to_numpy(),
            "n": df["n"].astype("int64"),
            "mean": round_series(pd.Series(m1), 6).to_numpy(),
            "var_pop": round_series(pd.Series(m2), 6).to_numpy(),
            "skew": round_series(pd.Series(m3 / (m2 * np.sqrt(m2))), 6).to_numpy(),
            "kurt": round_series(pd.Series(m4 / (m2 * m2) - 3), 6).to_numpy(),
        })

    return agg.map_batches(finish, batch_format="pandas").sort("event_type")


def user_event_runs(sf_dir: str, n_buckets: int = 64):
    """Gaps-and-islands: collapse each user's CONSECUTIVE same-type
    events (ordered by ts, event_id) into runs -- the streak/dimension
    -interval primitive behind SCD-2 builds and engagement streaks.

    Shape: one bucketed keyed shuffle on user_id; the per-bucket kernel
    is fully vectorized (sort, shift-compare, cumsum run ids, one
    groupby min/count) -- the engine-side equivalent of SQL's
    ROW_NUMBER-difference trick, with no window function and no
    self-join.

    Output: (user_id, event_type, run_start_s, n_in_run) sorted by
    user, start, type.
    """
    import ray.data as rd

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "ts", "user_id", "event_type"])

    def runs_of(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"])
        user = df["user_id"].to_numpy(dtype=np.int64)
        typ = df["event_type"].to_numpy()
        new_run = np.ones(len(df), dtype=bool)
        new_run[1:] = (user[1:] != user[:-1]) | (typ[1:] != typ[:-1])
        run_id = np.cumsum(new_run) - 1
        ts_s = (np.asarray(df["ts"], dtype="datetime64[us]")
                .astype(np.int64) // 1_000_000)
        g = pd.DataFrame({"run_id": run_id, "user_id": user,
                          "event_type": typ, "ts_s": ts_s})
        out = g.groupby("run_id", sort=True).agg(
            user_id=("user_id", "first"), event_type=("event_type", "first"),
            run_start_s=("ts_s", "min"), n_in_run=("ts_s", "size"))
        return out.astype({"user_id": "int64", "run_start_s": "int64",
                           "n_in_run": "int64"}).reset_index(drop=True)

    bucketed = ev.map_batches(
        lambda df: _user_bucket(df, "user_id", n_buckets),
        batch_format="pandas", batch_size=131072,
    )
    return (bucketed.groupby("bucket")
            .map_groups(lambda df: runs_of(df.drop(columns=["bucket"])),
                        batch_format="pandas")
            .sort(["user_id", "run_start_s", "event_type"]))


def events_debounce(sf_dir: str, min_gap_s: int = 86400, n_buckets: int = 64):
    """Debounce/throttle: suppress an event arriving within
    ``min_gap_s`` of the PREVIOUS event of the same (user, type) --
    lag-based suppression, the stream-hygiene filter that dedups
    retry storms before sessionization.

    Shape: one bucketed keyed shuffle on user_id; per-bucket kernel is
    a vectorized sort + shift + integer-microsecond gap compare (exact
    in both engines -- no float time math).

    Output: (event_id, user_id, event_type, ts_s) kept events sorted by
    event_id.
    """
    import ray.data as rd

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "ts", "user_id", "event_type"])
    gap_us = int(min_gap_s) * 1_000_000

    def keep_of(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "event_type", "ts", "event_id"])
        user = df["user_id"].to_numpy(dtype=np.int64)
        typ = df["event_type"].to_numpy()
        ts_us = np.asarray(df["ts"], dtype="datetime64[us]").astype(np.int64)
        new_grp = np.ones(len(df), dtype=bool)
        new_grp[1:] = (user[1:] != user[:-1]) | (typ[1:] != typ[:-1])
        gap = np.empty(len(df), dtype=np.int64)
        gap[0] = gap_us
        gap[1:] = ts_us[1:] - ts_us[:-1]
        keep = new_grp | (gap >= gap_us)
        out = df.loc[keep]
        return pd.DataFrame({
            "event_id": out["event_id"].to_numpy(dtype=np.int64),
            "user_id": out["user_id"].to_numpy(dtype=np.int64),
            "event_type": out["event_type"].to_numpy(),
            "ts_s": (np.asarray(out["ts"], dtype="datetime64[us]")
                     .astype(np.int64) // 1_000_000),
        })

    bucketed = ev.map_batches(
        lambda df: _user_bucket(df, "user_id", n_buckets),
        batch_format="pandas", batch_size=131072,
    )
    return (bucketed.groupby("bucket")
            .map_groups(lambda df: keep_of(df.drop(columns=["bucket"])),
                        batch_format="pandas")
            .sort("event_id"))


def event_weekday_chi2(sf_dir: str, n_buckets: int = 8):
    """Chi-square test of independence for event_type x weekday -- the
    distribution-drift / independence check a data-quality monitor runs
    per partition.  Expected counts include EMPTY cells (full row x col
    cross), e = (row_total * col_total) / N, chi2 = sum d*d/e with the
    identical float tree in the SQL oracle (products, not pow).

    Shape: one combiner count per (type, weekday) cell -- 35 cells --
    then a trivially small finish; the event stream is never shuffled.

    Output: one row (n, dof, chi2 r6).
    """
    import ray.data as rd

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "ts"])

    def cells(df: pd.DataFrame) -> pd.DataFrame:
        wd = pd.to_datetime(df["ts"]).dt.dayofweek.to_numpy(dtype=np.int64)
        g = pd.DataFrame({"event_type": df["event_type"].to_numpy(),
                          "weekday": wd})
        return (g.groupby(["event_type", "weekday"], as_index=False,
                          sort=False).agg(o=("weekday", "size")))

    counts = grouped_agg(
        ev.map_batches(cells, batch_format="pandas", batch_size=131072),
        ["event_type", "weekday"], {"o": ("o", "sum")}, n_buckets=n_buckets)

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        full = df.pivot_table(index="event_type", columns="weekday",
                              values="o", fill_value=0, aggfunc="sum")
        obs = full.to_numpy(dtype=np.float64)
        n = obs.sum()
        r = obs.sum(axis=1, keepdims=True)
        c = obs.sum(axis=0, keepdims=True)
        e = (r * c) / n
        d = obs - e
        chi2 = (d * d / e).sum()
        dof = (obs.shape[0] - 1) * (obs.shape[1] - 1)
        return pd.DataFrame({
            "n": pd.array([int(n)], dtype="int64"),
            "dof": pd.array([dof], dtype="int64"),
            "chi2": round_series(pd.Series([chi2]), 6).to_numpy(),
        })

    # 35 cells: the finish legitimately runs in one tiny batch
    return (counts.repartition(1)
            .map_batches(finish, batch_format="pandas", batch_size=1 << 20))


def events_ks_test(sf_dir: str, type_a: str = "click", type_b: str = "view",
                   n_buckets: int = 8):
    """Two-sample Kolmogorov-Smirnov statistic between the ``value``
    distributions of two event types -- the drift detector a data-quality
    monitor runs between cohorts/partitions.  D = max over pooled
    distinct values v of |ECDF_a(v) - ECDF_b(v)|.

    Shape: per-batch partial counts per (value, side) -- the VALUE GRAIN,
    not the event stream -- combiner-reduced with one keyed shuffle; the
    driver then folds the distinct-value histogram into cumulative counts
    (bound: distinct values of a bounded-precision metric, ~6.6k at
    sf0.01; at 100 TB quantize the metric or pre-bin to cap the grain).

    Output: one row (n_a, n_b, ks_d r6).
    """
    import ray.data as rd

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "value"])

    def cells(df: pd.DataFrame) -> pd.DataFrame:
        m = df[df["event_type"].isin([type_a, type_b])]
        if m.empty:
            return pd.DataFrame({"value": pd.Series([], dtype="float64"),
                                 "ca": pd.Series([], dtype="int64"),
                                 "cb": pd.Series([], dtype="int64")})
        is_a = (m["event_type"] == type_a).to_numpy()
        g = pd.DataFrame({"value": m["value"].to_numpy(),
                          "ca": is_a.astype(np.int64),
                          "cb": (~is_a).astype(np.int64)})
        return g.groupby("value", as_index=False, sort=False).agg(
            ca=("ca", "sum"), cb=("cb", "sum"))

    counts = grouped_agg(
        ev.map_batches(cells, batch_format="pandas", batch_size=131072),
        ["value"], {"ca": ("ca", "sum"), "cb": ("cb", "sum")},
        n_buckets=n_buckets)

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        g = df.sort_values("value").reset_index(drop=True)
        cca = g["ca"].to_numpy(dtype=np.int64).cumsum()
        ccb = g["cb"].to_numpy(dtype=np.int64).cumsum()
        na, nb = int(cca[-1]), int(ccb[-1])
        d = np.abs(cca / na - ccb / nb).max()
        return pd.DataFrame({
            "n_a": pd.array([na], dtype="int64"),
            "n_b": pd.array([nb], dtype="int64"),
            "ks_d": round_series(pd.Series([d]), 6).to_numpy(),
        })

    # value-grain histogram: the finish legitimately runs in one batch
    return (counts.repartition(1)
            .map_batches(finish, batch_format="pandas", batch_size=1 << 22))


def event_weekday_mutual_info(sf_dir: str, n_buckets: int = 8):
    """Mutual information (nats) between event_type and weekday, with
    the marginal entropies and the normalized MI -- the dependence
    strength companion to event_weekday_chi2's significance test.
    MI sums OBSERVED cells only (0 ln 0 = 0 by convention), each term
    (o/n) * ln(o*n / (r*c)) with the identical float tree in the SQL
    oracle.

    Shape: one combiner count per (type, weekday) cell -- 35 cells --
    then a trivially small finish; the event stream is never shuffled.

    Output: one row (n, mi r6, h_type r6, h_weekday r6, nmi r6).
    """
    import ray.data as rd

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "ts"])

    def cells(df: pd.DataFrame) -> pd.DataFrame:
        wd = pd.to_datetime(df["ts"]).dt.dayofweek.to_numpy(dtype=np.int64)
        g = pd.DataFrame({"event_type": df["event_type"].to_numpy(),
                          "weekday": wd})
        return (g.groupby(["event_type", "weekday"], as_index=False,
                          sort=False).agg(o=("weekday", "size")))

    counts = grouped_agg(
        ev.map_batches(cells, batch_format="pandas", batch_size=131072),
        ["event_type", "weekday"], {"o": ("o", "sum")}, n_buckets=n_buckets)

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        full = df.pivot_table(index="event_type", columns="weekday",
                              values="o", fill_value=0, aggfunc="sum")
        obs = full.to_numpy(dtype=np.float64)
        n = obs.sum()
        r = obs.sum(axis=1, keepdims=True)
        c = obs.sum(axis=0, keepdims=True)
        nz = obs > 0
        mi = ((obs / n) * np.log((obs * n) / (r * c), where=nz,
                                 out=np.zeros_like(obs)))[nz].sum()
        pr, pc = r / n, c / n
        h_r = -(pr * np.log(pr)).sum()
        h_c = -(pc * np.log(pc)).sum()
        nmi = mi / np.sqrt(h_r * h_c)
        return pd.DataFrame({
            "n": pd.array([int(n)], dtype="int64"),
            "mi": round_series(pd.Series([mi]), 6).to_numpy(),
            "h_type": round_series(pd.Series([h_r]), 6).to_numpy(),
            "h_weekday": round_series(pd.Series([h_c]), 6).to_numpy(),
            "nmi": round_series(pd.Series([nmi]), 6).to_numpy(),
        })

    # 35 cells: the finish legitimately runs in one tiny batch
    return (counts.repartition(1)
            .map_batches(finish, batch_format="pandas", batch_size=1 << 20))


def events_mannwhitney_u(sf_dir: str, type_a: str = "click",
                         type_b: str = "view", n_buckets: int = 8):
    """Mann-Whitney U (rank-sum) test between the value distributions
    of two event types -- the nonparametric median-shift companion to
    ``events_ks_test``'s shape test.  Midranks handle ties exactly:
    rank sums are multiples of 1/2, exactly representable in doubles,
    so U is bit-identical in both engines regardless of sum order; the
    tie-corrected normal approximation z divides once at the end.

    Shape: identical to events_ks_test -- (value, side) combiner counts
    (the VALUE GRAIN crosses the wire, never the stream), cumulative
    midranks folded on the driver (bound: distinct values).

    Output: one row (n_a, n_b, u_a r6, z r6).
    """
    import ray.data as rd

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "value"])

    def cells(df: pd.DataFrame) -> pd.DataFrame:
        m = df[df["event_type"].isin([type_a, type_b])]
        if m.empty:
            return pd.DataFrame({"value": pd.Series([], dtype="float64"),
                                 "ca": pd.Series([], dtype="int64"),
                                 "cb": pd.Series([], dtype="int64")})
        is_a = (m["event_type"] == type_a).to_numpy()
        g = pd.DataFrame({"value": m["value"].to_numpy(),
                          "ca": is_a.astype(np.int64),
                          "cb": (~is_a).astype(np.int64)})
        return g.groupby("value", as_index=False, sort=False).agg(
            ca=("ca", "sum"), cb=("cb", "sum"))

    counts = grouped_agg(
        ev.map_batches(cells, batch_format="pandas", batch_size=131072),
        ["value"], {"ca": ("ca", "sum"), "cb": ("cb", "sum")},
        n_buckets=n_buckets)

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        g = df.sort_values("value").reset_index(drop=True)
        ca = g["ca"].to_numpy(dtype=np.float64)
        cb = g["cb"].to_numpy(dtype=np.float64)
        t = ca + cb
        before = t.cumsum() - t
        midrank = before + (t + 1.0) / 2.0
        na, nb = ca.sum(), cb.sum()
        ra = (ca * midrank).sum()
        u_a = ra - na * (na + 1.0) / 2.0
        nn = na + nb
        ties = (t * t * t - t).sum()
        var = (na * nb / 12.0) * ((nn + 1.0) - ties / (nn * (nn - 1.0)))
        z = (u_a - na * nb / 2.0) / np.sqrt(var)
        return pd.DataFrame({
            "n_a": pd.array([int(na)], dtype="int64"),
            "n_b": pd.array([int(nb)], dtype="int64"),
            "u_a": round_series(pd.Series([u_a]), 6).to_numpy(),
            "z": round_series(pd.Series([z]), 6).to_numpy(),
        })

    # value-grain histogram: the finish legitimately runs in one batch
    return (counts.repartition(1)
            .map_batches(finish, batch_format="pandas", batch_size=1 << 22))


def weekend_conversion_ztest(sf_dir: str, n_buckets: int = 4):
    """Two-proportion z-test: is the purchase share of events different
    on weekends vs weekdays?  The A/B-test primitive over calendar
    segments.  Group membership is the DAY SET {Saturday, Sunday} --
    identical under pandas' Monday-origin and DuckDB's Sunday-origin
    weekday numbering, so no label translation is needed.  Pooled
    p = (x1+x2)/(n1+n2); z = (p1-p2)/sqrt(p(1-p)(1/n1+1/n2)).

    Shape: four combiner counts; the event stream is never shuffled.

    Output: one row (n_wd, n_we, p_wd r6, p_we r6, z r6).
    """
    import ray.data as rd

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "ts"])

    def cells(df: pd.DataFrame) -> pd.DataFrame:
        dow = pd.to_datetime(df["ts"]).dt.dayofweek.to_numpy(dtype=np.int64)
        we = (dow >= 5).astype(np.int64)  # Sat=5, Sun=6 (Monday origin)
        pur = (df["event_type"] == "purchase").to_numpy().astype(np.int64)
        g = pd.DataFrame({"we": we, "n": np.ones(len(df), dtype=np.int64),
                          "x": pur})
        return g.groupby("we", as_index=False).agg(n=("n", "sum"),
                                                   x=("x", "sum"))

    counts = grouped_agg(
        ev.map_batches(cells, batch_format="pandas", batch_size=131072),
        ["we"], {"n": ("n", "sum"), "x": ("x", "sum")}, n_buckets=n_buckets)

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        g = df.set_index("we")
        n1, x1 = float(g.loc[0, "n"]), float(g.loc[0, "x"])  # weekday
        n2, x2 = float(g.loc[1, "n"]), float(g.loc[1, "x"])  # weekend
        p1, p2 = x1 / n1, x2 / n2
        p = (x1 + x2) / (n1 + n2)
        z = (p1 - p2) / np.sqrt(p * (1.0 - p) * (1.0 / n1 + 1.0 / n2))
        return pd.DataFrame({
            "n_wd": pd.array([int(n1)], dtype="int64"),
            "n_we": pd.array([int(n2)], dtype="int64"),
            "p_wd": round_series(pd.Series([p1]), 6).to_numpy(),
            "p_we": round_series(pd.Series([p2]), 6).to_numpy(),
            "z": round_series(pd.Series([z]), 6).to_numpy(),
        })

    # 2 rows: the finish legitimately runs in one tiny batch
    return (counts.repartition(1)
            .map_batches(finish, batch_format="pandas", batch_size=1 << 20))


def weekend_type_jsd(sf_dir: str, n_buckets: int = 4):
    """Jensen-Shannon divergence between the event-type distributions
    of weekdays vs weekends -- the symmetric, bounded [0, ln 2]
    distribution-shift measure (the KS/U tests compare VALUES; this
    compares the categorical MIX).  JSD = H(M) - (H(P)+H(Q))/2 with
    M = (P+Q)/2, natural log; jsd_norm divides by ln 2.  Group
    membership is the {Saturday, Sunday} day set (origin-invariant).

    Shape: one combiner count per (event_type, is_weekend) cell --
    2 x |types| cells -- then a trivially small finish.

    Output: one row (n_wd, n_we, jsd r6, jsd_norm r6).
    """
    import ray.data as rd

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "ts"])

    def cells(df: pd.DataFrame) -> pd.DataFrame:
        dow = pd.to_datetime(df["ts"]).dt.dayofweek.to_numpy(dtype=np.int64)
        g = pd.DataFrame({"event_type": df["event_type"].to_numpy(),
                          "we": (dow >= 5).astype(np.int64)})
        return (g.groupby(["event_type", "we"], as_index=False)
                .agg(o=("we", "size")))

    counts = grouped_agg(
        ev.map_batches(cells, batch_format="pandas", batch_size=131072),
        ["event_type", "we"], {"o": ("o", "sum")}, n_buckets=n_buckets)

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        full = df.pivot_table(index="event_type", columns="we", values="o",
                              fill_value=0, aggfunc="sum")
        for col in (0, 1):
            if col not in full.columns:
                full[col] = 0
        wd = full[0].to_numpy(dtype=np.float64)
        we = full[1].to_numpy(dtype=np.float64)
        n1, n2 = wd.sum(), we.sum()
        p, q = wd / n1, we / n2
        m = (p + q) / 2.0

        def h(x):
            nz = x > 0
            return -(x[nz] * np.log(x[nz])).sum()

        jsd = h(m) - (h(p) + h(q)) / 2.0
        return pd.DataFrame({
            "n_wd": pd.array([int(n1)], dtype="int64"),
            "n_we": pd.array([int(n2)], dtype="int64"),
            "jsd": round_series(pd.Series([jsd]), 6).to_numpy(),
            "jsd_norm": round_series(pd.Series([jsd / np.log(2.0)]),
                                     6).to_numpy(),
        })

    # 2 x |types| cells: the finish legitimately runs in one tiny batch
    return (counts.repartition(1)
            .map_batches(finish, batch_format="pandas", batch_size=1 << 20))


def markov_entropy_rate(sf_dir: str, n_buckets: int = 64):
    """Entropy rate of the first-order event-type Markov chain under
    the empirical source distribution: H = sum_src pi(src) * H(dst|src)
    with pi(src) = n_src / n and the per-source conditional entropy in
    the suite's exact algebra H = ln(n_src) - sum(c ln c)/n_src.  Low
    entropy rate = templated/bot-like sessions; high = organic mixing.

    Shape: the event_transitions kernel (ONE keyed shuffle on user,
    per-bucket vectorized shift) -> (src, dst) combiner counts -> a
    |types|^2-cell finish.

    Output: one row (n_transitions, entropy_rate r6, h_max r6,
    ratio r6); h_max = ln(|dst types observed|).
    """
    import ray.data as rd

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "ts", "user_id", "event_type"])

    def pairs_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"])
        user = df["user_id"].to_numpy()
        et = df["event_type"].to_numpy()
        same = np.empty(len(df), dtype=bool)
        if len(df):
            same[0] = False
            same[1:] = user[1:] == user[:-1]
        src = np.roll(et, 1)[same]
        dst = et[same]
        return (pd.DataFrame({"src_type": src, "dst_type": dst})
                .groupby(["src_type", "dst_type"], as_index=False,
                         sort=False).agg(n=("dst_type", "size")))

    bucketed = ev.map_batches(
        lambda df: _user_bucket(df, "user_id", n_buckets),
        batch_format="pandas", batch_size=131072)
    partial = bucketed.groupby("bucket").map_groups(
        lambda df: pairs_bucket(df.drop(columns=["bucket"])),
        batch_format="pandas")
    counts = grouped_agg(partial, ["src_type", "dst_type"],
                         {"n": ("n", "sum")}, n_buckets=8)

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["src_type", "dst_type"]).reset_index(drop=True)
        c = df["n"].to_numpy(dtype=np.float64)
        clnc = c * np.log(c)
        g = pd.DataFrame({"src": df["src_type"], "c": c, "clnc": clnc})
        per_src = g.groupby("src").agg(ns=("c", "sum"), sc=("clnc", "sum"))
        ns = per_src["ns"].to_numpy()
        h_src = np.log(ns) - per_src["sc"].to_numpy() / ns
        n = ns.sum()
        rate = ((ns / n) * h_src).sum()
        h_max = np.log(float(df["dst_type"].nunique()))
        return pd.DataFrame({
            "n_transitions": pd.array([int(n)], dtype="int64"),
            "entropy_rate": round_series(pd.Series([rate]), 6).to_numpy(),
            "h_max": round_series(pd.Series([h_max]), 6).to_numpy(),
            "ratio": round_series(pd.Series([rate / h_max]), 6).to_numpy(),
        })

    # |types|^2 cells: the finish legitimately runs in one tiny batch
    return (counts.repartition(1)
            .map_batches(finish, batch_format="pandas", batch_size=1 << 20))


def event_weekday_residuals(sf_dir: str, n_buckets: int = 8):
    """Standardized residuals (obs - exp) / sqrt(exp) for every
    event_type x weekday cell -- the drill-down that says WHICH cells
    drive ``event_weekday_chi2``.  Expected counts come from the full
    row x col cross INCLUDING empty cells, identical float tree to the
    chi2 op; weekday labels use the pandas Monday=0 origin and the
    oracle translates DuckDB's Sunday origin to match.

    Shape: the chi2 combiner (35 cells) with a per-cell finish.

    Output: (event_type, weekday, obs, expected r6, std_resid r6)
    sorted by type, weekday.
    """
    import ray.data as rd

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "ts"])

    def cells(df: pd.DataFrame) -> pd.DataFrame:
        wd = pd.to_datetime(df["ts"]).dt.dayofweek.to_numpy(dtype=np.int64)
        g = pd.DataFrame({"event_type": df["event_type"].to_numpy(),
                          "weekday": wd})
        return (g.groupby(["event_type", "weekday"], as_index=False,
                          sort=False).agg(o=("weekday", "size")))

    counts = grouped_agg(
        ev.map_batches(cells, batch_format="pandas", batch_size=131072),
        ["event_type", "weekday"], {"o": ("o", "sum")}, n_buckets=n_buckets)

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        full = df.pivot_table(index="event_type", columns="weekday",
                              values="o", fill_value=0, aggfunc="sum")
        obs = full.to_numpy(dtype=np.float64)
        n = obs.sum()
        r = obs.sum(axis=1, keepdims=True)
        c = obs.sum(axis=0, keepdims=True)
        e = (r * c) / n
        resid = (obs - e) / np.sqrt(e)
        rows = []
        for i, et in enumerate(full.index):
            for j, wd in enumerate(full.columns):
                rows.append((et, int(wd), int(obs[i, j]), e[i, j],
                             resid[i, j]))
        out = pd.DataFrame(rows, columns=["event_type", "weekday", "obs",
                                          "expected", "std_resid"])
        out["expected"] = round_series(out["expected"], 6)
        out["std_resid"] = round_series(out["std_resid"], 6)
        out["obs"] = out["obs"].astype("int64")
        out["weekday"] = out["weekday"].astype("int64")
        return out.sort_values(["event_type", "weekday"]).reset_index(drop=True)

    # 35 cells: the finish legitimately runs in one tiny batch
    return (counts.repartition(1)
            .map_batches(finish, batch_format="pandas", batch_size=1 << 20))


def events_hour_anova(sf_dir: str, n_buckets: int = 8):
    """One-way ANOVA of event value by hour-of-day: eta-squared
    (SS_between / SS_total, the variance-explained effect size) and the
    F statistic -- the variance-decomposition audit that says whether
    a metric actually has a diurnal cycle.  All sums-of-squares come
    from per-group (n, sum, sumsq) moments, the exact algebra shared
    with the oracle: SS_total = S2 - S^2/N, SS_between =
    sum(s_g^2 / n_g) - S^2/N.

    Shape: one combiner reduce over the 24-cell hour grain; the event
    stream is never shuffled.

    Output: one row (n, df_b, df_w, eta2 r6, f_stat r6).
    """
    import ray.data as rd

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["ts", "value"])

    def cells(df: pd.DataFrame) -> pd.DataFrame:
        hr = pd.to_datetime(df["ts"]).dt.hour.to_numpy(dtype=np.int64)
        v = df["value"].to_numpy(dtype=np.float64)
        g = pd.DataFrame({"hour": hr, "n": np.ones(len(df), dtype=np.int64),
                          "s": v, "s2": v * v})
        return g.groupby("hour", as_index=False).agg(
            n=("n", "sum"), s=("s", "sum"), s2=("s2", "sum"))

    counts = grouped_agg(
        ev.map_batches(cells, batch_format="pandas", batch_size=131072),
        ["hour"], {"n": ("n", "sum"), "s": ("s", "sum"),
                   "s2": ("s2", "sum")}, n_buckets=n_buckets)

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        n_g = df["n"].to_numpy(dtype=np.float64)
        s_g = df["s"].to_numpy()
        n = n_g.sum()
        s = s_g.sum()
        s2 = df["s2"].to_numpy().sum()
        grand = s * s / n
        ss_total = s2 - grand
        ss_between = (s_g * s_g / n_g).sum() - grand
        k = len(df)
        df_b, df_w = k - 1, int(n) - k
        eta2 = ss_between / ss_total
        f = (ss_between / df_b) / ((ss_total - ss_between) / df_w)
        return pd.DataFrame({
            "n": pd.array([int(n)], dtype="int64"),
            "df_b": pd.array([df_b], dtype="int64"),
            "df_w": pd.array([df_w], dtype="int64"),
            "eta2": round_series(pd.Series([eta2]), 6).to_numpy(),
            "f_stat": round_series(pd.Series([f]), 6).to_numpy(),
        })

    # 24 hour cells: the finish legitimately runs in one tiny batch
    return (counts.repartition(1)
            .map_batches(finish, batch_format="pandas", batch_size=1 << 20))


def training_shuffle_plan(sf_dir: str, n_shards: int = 16, seed: int = 42):
    """Deterministic pseudorandom GLOBAL SHUFFLE PLAN for training-data
    sharding: shard = md5(seed:doc_id) % n_shards, position = rank of
    the hash within the shard. At 100 TB you never ``random_shuffle``
    the corpus -- you assign a pseudorandom key at read time and sort
    WITHIN shards (each shard bounded at corpus/n_shards, sorted in
    parallel, resumable per shard), which yields exactly one keyed
    exchange and a per-shard-local ordering. Deterministic in seed, so
    a killed job re-derives the identical plan (the checkpoint story
    for shuffles).

    Output: (doc_id, shard, pos) sorted by (shard, pos); pos is dense
    0..len(shard)-1.
    """
    import ray.data as rd

    from ..functions.hashing import _hash64

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])

    def assign(df: pd.DataFrame) -> pd.DataFrame:
        ids = df["doc_id"].to_numpy()
        h = np.array([_hash64(f"{seed}:{int(d)}") for d in ids],
                     dtype=np.uint64)
        return pd.DataFrame({
            "doc_id": pd.Series(ids, dtype="int64"),
            "shard": pd.Series((h % np.uint64(n_shards)).astype(np.int64),
                               dtype="int64"),
            "h": pd.Series(h, dtype="uint64"),
        })

    def order(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["h", "doc_id"], kind="mergesort") \
               .reset_index(drop=True)
        return pd.DataFrame({
            "doc_id": df["doc_id"].astype("int64"),
            "shard": df["shard"].astype("int64"),
            "pos": pd.Series(np.arange(len(df), dtype=np.int64),
                             dtype="int64"),
        })

    return ds.map_batches(assign, batch_format="pandas",
                          batch_size=131072) \
             .groupby("shard").map_groups(order, batch_format="pandas") \
             .sort(["shard", "pos"])


def shard_balance_report(sf_dir: str, n_shards: int = 16, seed: int = 42):
    """Per-shard balance of the training shuffle plan: doc and char
    counts per shard (the skew check a sharded writer runs before
    committing a layout). Pure combiner aggregation at shard grain --
    the plan's hash assignment is recomputed per batch, so NO join
    against the plan is needed and nothing but n_shards rows per batch
    crosses the wire.

    Output: (shard, n_docs, n_chars) sorted by shard.
    """
    import ray.data as rd

    from ..functions.hashing import _hash64
    from ..stages.agg import grouped_agg

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "n_chars"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        ids = df["doc_id"].to_numpy()
        h = np.array([_hash64(f"{seed}:{int(d)}") for d in ids],
                     dtype=np.uint64)
        g = pd.DataFrame({"shard": (h % np.uint64(n_shards)).astype(np.int64),
                          "n_docs": np.ones(len(ids), dtype=np.int64),
                          "n_chars": df["n_chars"].to_numpy(dtype=np.int64)})
        return g.groupby("shard", as_index=False).agg(
            n_docs=("n_docs", "sum"), n_chars=("n_chars", "sum"))

    agg = grouped_agg(ds.map_batches(partial, batch_format="pandas",
                                     batch_size=131072),
                      ["shard"],
                      {"n_docs": ("n_docs", "sum"),
                       "n_chars": ("n_chars", "sum")},
                      # bound-static: shard grain
                      n_buckets=8)

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values("shard").reset_index(drop=True)
        for c in ("shard", "n_docs", "n_chars"):
            df[c] = df[c].astype("int64")
        return df[["shard", "n_docs", "n_chars"]]

    return agg.repartition(1).map_batches(finish, batch_format="pandas",
                                          batch_size=1 << 20)
