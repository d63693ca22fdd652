"""Unit/invariant tests for the statistical corpus-audit operators
(SNM blocking, two-sample KS, Benford audit, Fightin'-Words log-odds);
full oracle parity is swept in test_entry.py."""

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
def test_snm_pairs_match_pandas_reference(ray_session):
    import ray.data as rd

    from deekseek_ocr___dockerized_api_ray.stages.dedup import (
        snm_candidate_pairs,
    )

    docs = rd.read_parquet(f"{SF}/documents.parquet",
                           columns=["doc_id", "text"])
    got = (_df(snm_candidate_pairs(docs, skey_len=16, blk_len=4, window=5))
           .sort_values(["blk", "id_a", "id_b"]).reset_index(drop=True))

    pdf = pd.read_parquet(f"{SF}/documents.parquet",
                          columns=["doc_id", "text"])
    pdf["skey"] = pdf["text"].str.lower().str.slice(0, 16)
    pdf["blk"] = pdf["skey"].str.slice(0, 4)
    rows = []
    for blk, g in pdf.groupby("blk"):
        ids = g.sort_values(["skey", "doc_id"])["doc_id"].to_numpy()
        for i in range(len(ids)):
            for j in range(1, 5):
                if i + j < len(ids):
                    rows.append((blk, ids[i], ids[i + j], j))
    want = (pd.DataFrame(rows, columns=["blk", "id_a", "id_b", "gap"])
            .sort_values(["blk", "id_a", "id_b"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(
        got[["blk", "id_a", "id_b", "gap"]].astype({"gap": "int64"}), want)


@needs_data
def test_ks_statistic_matches_ecdf_reference(ray_session):
    from deekseek_ocr___dockerized_api_ray.pipelines.sequences import (
        events_ks_test,
    )

    got = _df(events_ks_test(SF))
    assert len(got) == 1

    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["event_type", "value"])
    a = np.sort(ev.loc[ev["event_type"] == "click", "value"].to_numpy())
    b = np.sort(ev.loc[ev["event_type"] == "view", "value"].to_numpy())
    pooled = np.unique(np.concatenate([a, b]))
    ca = np.searchsorted(a, pooled, side="right") / len(a)
    cb = np.searchsorted(b, pooled, side="right") / len(b)
    d_ref = np.abs(ca - cb).max()

    assert int(got["n_a"].iloc[0]) == len(a)
    assert int(got["n_b"].iloc[0]) == len(b)
    assert abs(float(got["ks_d"].iloc[0]) - d_ref) < 1e-6
    assert 0.0 <= float(got["ks_d"].iloc[0]) <= 1.0


@needs_data
def test_benford_digits_cover_orders(ray_session):
    from deekseek_ocr___dockerized_api_ray.pipelines.analytics import (
        benford_order_totals,
    )

    got = _df(benford_order_totals(SF))
    orders = pd.read_parquet(f"{SF}/orders.parquet", columns=["o_totalprice"])
    first = (orders["o_totalprice"].astype("int64").astype(str)
             .str.slice(0, 1).astype(int))
    want = first.value_counts().sort_index()

    assert got["n"].sum() == len(orders)
    assert list(got["digit"]) == list(want.index)
    assert list(got["n"]) == list(want.values)
    # observed fractions and Benford expectations each total ~1 when all
    # nine digits appear
    assert abs(got["frac"].sum() - 1.0) < 1e-4
    if len(got) == 9:
        assert abs(got["p_benford"].sum() - 1.0) < 1e-4


@needs_data
def test_logodds_formula_and_vocab_cap(ray_session):
    from deekseek_ocr___dockerized_api_ray.pipelines.text import (
        lang_term_logodds,
    )

    got = _df(lang_term_logodds(SF, max_vocab=16, k=5))

    docs = pd.read_parquet(f"{SF}/documents.parquet",
                           columns=["lang", "text"])
    ex = (docs.assign(term=docs["text"].str.split(" "))
          .loc[:, ["lang", "term"]].explode("term"))
    ex = ex[ex["term"] != ""]
    lt = ex.groupby(["lang", "term"], as_index=False).size()
    tv = (lt.groupby("term", as_index=False)["size"].sum()
          .sort_values(["size", "term"], ascending=[False, True]).head(16))
    vocab = dict(zip(tv["term"], tv["size"]))
    l2 = lt[lt["term"].isin(vocab)].copy()
    n = float(sum(vocab.values()))
    nl = l2.groupby("lang")["size"].sum().to_dict()
    a0 = 200.0

    # every reported term is inside the capped vocabulary
    assert set(got["term"]).issubset(set(vocab))

    y = l2["size"].to_numpy(dtype=np.float64)
    yw = l2["term"].map(vocab).to_numpy(dtype=np.float64)
    n_l = l2["lang"].map(nl).to_numpy(dtype=np.float64)
    aw = a0 * yw / n
    delta = (np.log((y + aw) / (n_l + a0 - y - aw))
             - np.log(((yw - y) + aw) / (n - n_l + a0 - (yw - y) - aw)))
    z = np.round(delta / np.sqrt(1.0 / (y + aw) + 1.0 / ((yw - y) + aw)), 6)
    l2["z"] = z
    want = (l2.sort_values(["lang", "z", "term"],
                           ascending=[True, False, True])
            .groupby("lang").head(5))
    for lang, g in want.groupby("lang"):
        gg = got[got["lang"] == lang].sort_values("rk")
        assert list(gg["term"]) == list(g["term"])
        assert np.allclose(gg["z"].to_numpy(),
                           g["z"].to_numpy(), atol=1e-6)


@needs_data
def test_logodds_uncapped_equals_full_vocab(ray_session):
    """With the cap above the true vocabulary size the cap is a no-op:
    both settings must produce identical rankings."""
    from deekseek_ocr___dockerized_api_ray.pipelines.text import (
        lang_term_logodds,
    )

    wide = _df(lang_term_logodds(SF, max_vocab=1000, k=3))
    wider = _df(lang_term_logodds(SF, max_vocab=5000, k=3))
    pd.testing.assert_frame_equal(wide.reset_index(drop=True),
                                  wider.reset_index(drop=True))


@needs_data
def test_mutual_info_matches_pandas_reference(ray_session):
    from deekseek_ocr___dockerized_api_ray.pipelines.sequences import (
        event_weekday_mutual_info,
    )

    got = _df(event_weekday_mutual_info(SF))
    assert len(got) == 1

    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["event_type", "ts"])
    ct = pd.crosstab(ev["event_type"],
                     pd.to_datetime(ev["ts"]).dt.dayofweek).to_numpy(float)
    n = ct.sum()
    r = ct.sum(axis=1, keepdims=True)
    c = ct.sum(axis=0, keepdims=True)
    nz = ct > 0
    mi_ref = ((ct / n) * np.log((ct * n) / (r * c),
                                where=nz, out=np.zeros_like(ct)))[nz].sum()

    assert int(got["n"].iloc[0]) == int(n)
    assert abs(float(got["mi"].iloc[0]) - mi_ref) < 1e-6
    # MI bounded by min of the marginal entropies; NMI in [0, 1]
    assert 0.0 <= float(got["mi"].iloc[0]) <= min(
        float(got["h_type"].iloc[0]), float(got["h_weekday"].iloc[0])) + 1e-9
    assert 0.0 <= float(got["nmi"].iloc[0]) <= 1.0


@needs_data
def test_hits_authority_matches_pandas_reference(ray_session):
    from deekseek_ocr___dockerized_api_ray.pipelines.analytics import (
        part_authority_hits,
    )

    got = _df(part_authority_hits(SF, k=20))
    li = pd.read_parquet(f"{SF}/lineitem.parquet",
                         columns=["l_orderkey", "l_partkey"])
    orders = pd.read_parquet(f"{SF}/orders.parquet",
                             columns=["o_orderkey", "o_custkey"])
    e = (li.merge(orders, left_on="l_orderkey", right_on="o_orderkey")
         .groupby(["o_custkey", "l_partkey"], as_index=False)
         .agg(w=("l_partkey", "size")))
    hub = e.groupby("o_custkey")["w"].sum().rename("hub")
    e = e.join(hub, on="o_custkey")
    auth = ((e["w"] * e["hub"]).groupby(e["l_partkey"]).sum()
            .sort_values(ascending=False))
    want = (pd.DataFrame({"p": auth.index, "wa": auth.values})
            .sort_values(["wa", "p"], ascending=[False, True]).head(20))

    assert list(got["p_partkey"]) == list(want["p"])
    assert np.allclose(got["authority"].to_numpy(),
                       want["wa"].to_numpy(float)
                       / float(want["wa"].max()), atol=1e-6)
    assert float(got["authority"].iloc[0]) == 1.0


@needs_data
def test_mutual_nn_pairs_reciprocal_and_complete(ray_session):
    import ray.data as rd

    from deekseek_ocr___dockerized_api_ray.stages.similarity import (
        mutual_nn_pairs,
    )

    got = _df(mutual_nn_pairs(
        rd.read_parquet(f"{SF}/embeddings.parquet")))

    emb = pd.read_parquet(f"{SF}/embeddings.parquet",
                          columns=["vec_id", "embedding"])
    ids = emb["vec_id"].to_numpy(dtype=np.int64)
    m = np.stack(emb["embedding"].to_numpy())
    m = m / np.linalg.norm(m, axis=1, keepdims=True)
    sim = m @ m.T
    np.fill_diagonal(sim, -np.inf)
    # nearest neighbor, cosine desc then vec_id asc (matches the oracle)
    order = np.lexsort((ids[None, :].repeat(len(ids), 0),
                        -sim))  # lexsort: last key primary
    nn = ids[order[:, 0]]
    nn_of = dict(zip(ids, nn))
    want = sorted({(min(a, b), max(a, b))
                   for a, b in nn_of.items() if nn_of[b] == a})
    got_pairs = sorted(zip(got["id_a"], got["id_b"]))
    assert got_pairs == want
    assert all(a < b for a, b in got_pairs)


@needs_data
def test_contamination_matrix_totals_and_orientation(ray_session):
    from deekseek_ocr___dockerized_api_ray.pipelines.curation import (
        source_contamination_matrix,
    )
    from deekseek_ocr___dockerized_api_ray.stages.dedup import (
        lsh_candidate_pairs,
        verify_pairs_ngram_jaccard,
    )
    import ray.data as rd

    got = _df(source_contamination_matrix(SF))
    docs = rd.read_parquet(f"{SF}/documents.parquet",
                           columns=["doc_id", "text", "source"])
    n_pairs = verify_pairs_ngram_jaccard(
        lsh_candidate_pairs(docs), docs, threshold=0.3, n=3).count()

    # every verified pair lands in exactly one matrix cell
    assert int(got["n_pairs"].sum()) == n_pairs
    assert (got["source_a"] <= got["source_b"]).all()
    assert (got["n_pairs"] > 0).all()


@needs_data
def test_zipf_fit_matches_polyfit(ray_session):
    from deekseek_ocr___dockerized_api_ray.pipelines.text import (
        corpus_zipf_fit,
    )

    got = _df(corpus_zipf_fit(SF, max_rank=24))
    docs = pd.read_parquet(f"{SF}/documents.parquet", columns=["text"])
    tf = (docs["text"].str.split(" ").explode().replace("", np.nan)
          .dropna().value_counts())
    top = tf.sort_values(ascending=False).head(24)
    x = np.log(np.arange(1, len(top) + 1, dtype=np.float64))
    y = np.log(top.to_numpy(dtype=np.float64))
    slope_ref, intercept_ref = np.polyfit(x, y, 1)
    r2_ref = np.corrcoef(x, y)[0, 1] ** 2

    assert int(got["n_terms"].iloc[0]) == 24
    assert abs(float(got["slope"].iloc[0]) - slope_ref) < 1e-5
    assert abs(float(got["intercept"].iloc[0]) - intercept_ref) < 1e-5
    assert abs(float(got["r2"].iloc[0]) - r2_ref) < 1e-5
    assert float(got["slope"].iloc[0]) < 0  # Zipf: frequency falls with rank


@needs_data
def test_heaps_fit_matches_pandas_reference(ray_session):
    from deekseek_ocr___dockerized_api_ray.pipelines.text import (
        corpus_heaps_fit,
    )

    got = _df(corpus_heaps_fit(SF, n_checkpoints=10))
    docs = pd.read_parquet(f"{SF}/documents.parquet",
                           columns=["doc_id", "text"])
    ex = (docs.assign(term=docs["text"].str.split(" "))
          .loc[:, ["doc_id", "term"]].explode("term"))
    ex = ex[ex["term"] != ""]
    m = int(docs["doc_id"].max())
    thr = [((i + 1) * m) // 10 for i in range(10)]
    T = np.array([int((ex["doc_id"] <= t).sum()) for t in thr], float)
    first = ex.groupby("term")["doc_id"].min()
    V = np.array([int((first <= t).sum()) for t in thr], float)
    beta_ref, lnk_ref = np.polyfit(np.log(T), np.log(V), 1)

    assert int(got["n_points"].iloc[0]) == 10
    assert abs(float(got["beta"].iloc[0]) - beta_ref) < 1e-5
    assert abs(float(got["lnk"].iloc[0]) - lnk_ref) < 1e-5
    # vocabulary grows sublinearly in tokens on this closed-vocab corpus
    assert 0.0 <= float(got["beta"].iloc[0]) < 1.0


@needs_data
def test_decayed_value_matches_pandas_reference(ray_session):
    from deekseek_ocr___dockerized_api_ray.pipelines.analytics import (
        user_decayed_value,
    )

    got = _df(user_decayed_value(SF)).set_index("user_id")
    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["user_id", "ts", "value"])
    ts_us = ev["ts"].astype("datetime64[us]").astype("int64")
    age_days = (int(ts_us.max()) - ts_us) / 86400000000.0
    lam = np.log(2.0) / 7.0
    dec = ev["value"] * np.exp(-lam * age_days)
    want = dec.groupby(ev["user_id"]).sum()

    assert np.allclose(got["decayed"].reindex(want.index).to_numpy(),
                       want.to_numpy(), atol=1e-5)
    # decay only shrinks: every score is <= the plain sum and positive
    plain = ev.groupby("user_id")["value"].sum()
    assert (got["decayed"].reindex(plain.index).to_numpy()
            <= plain.to_numpy() + 1e-9).all()
    assert (got["decayed"] > 0).all()
    assert int(got["n"].sum()) == len(ev)


@needs_data
def test_mannwhitney_matches_reference(ray_session):
    from deekseek_ocr___dockerized_api_ray.pipelines.sequences import (
        events_mannwhitney_u,
    )

    got = _df(events_mannwhitney_u(SF))
    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["event_type", "value"])
    a = ev.loc[ev["event_type"] == "click", "value"].to_numpy()
    b = ev.loc[ev["event_type"] == "view", "value"].to_numpy()
    pooled = np.concatenate([a, b])
    ranks = pd.Series(pooled).rank(method="average").to_numpy()
    ra = ranks[: len(a)].sum()
    u_ref = ra - len(a) * (len(a) + 1) / 2.0

    assert int(got["n_a"].iloc[0]) == len(a)
    assert int(got["n_b"].iloc[0]) == len(b)
    assert abs(float(got["u_a"].iloc[0]) - u_ref) < 1e-6
    # U bounded by n_a * n_b
    assert 0.0 <= float(got["u_a"].iloc[0]) <= len(a) * len(b)


@needs_data
def test_weekend_ztest_matches_reference(ray_session):
    from deekseek_ocr___dockerized_api_ray.pipelines.sequences import (
        weekend_conversion_ztest,
    )

    got = _df(weekend_conversion_ztest(SF))
    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["event_type", "ts"])
    we = pd.to_datetime(ev["ts"]).dt.dayofweek >= 5
    pur = ev["event_type"] == "purchase"
    n1, x1 = int((~we).sum()), int((pur & ~we).sum())
    n2, x2 = int(we.sum()), int((pur & we).sum())
    p = (x1 + x2) / (n1 + n2)
    z_ref = ((x1 / n1 - x2 / n2)
             / np.sqrt(p * (1 - p) * (1 / n1 + 1 / n2)))

    assert int(got["n_wd"].iloc[0]) == n1
    assert int(got["n_we"].iloc[0]) == n2
    assert abs(float(got["z"].iloc[0]) - z_ref) < 1e-6


@needs_data
def test_quality_survivors_keep_best_member(ray_session):
    import ray.data as rd

    from deekseek_ocr___dockerized_api_ray.stages.dedup import (
        component_labels,
        lsh_candidate_pairs,
        quality_survivors,
        verify_pairs_jaccard,
    )

    docs = rd.read_parquet(f"{SF}/documents.parquet")
    pairs = verify_pairs_jaccard(lsh_candidate_pairs(docs), docs,
                                 threshold=0.8)
    got = quality_survivors(docs, pairs).to_pandas()
    labels = component_labels(pairs).to_pandas()

    pdf = pd.read_parquet(f"{SF}/documents.parquet",
                          columns=["doc_id", "n_chars"])
    lab = labels.merge(pdf, left_on="node", right_on="doc_id")
    best = (lab.sort_values(["n_chars", "node"], ascending=[False, True])
            .groupby("label").head(1)["node"])
    in_comp = set(labels["node"])
    want = (set(pdf["doc_id"]) - in_comp) | set(best)

    assert set(got["doc_id"]) == want
    # one survivor per cluster, and it is the max-quality member
    assert len(got) == len(pdf) - len(in_comp) + lab["label"].nunique()


@needs_data
def test_doc_lang_mix_invariants(ray_session):
    from deekseek_ocr___dockerized_api_ray.pipelines.text import (
        doc_lang_mix,
        lang_term_logodds,
    )

    got = _df(doc_lang_mix(SF))
    lex = _df(lang_term_logodds(SF, max_vocab=16, k=5))

    # all 500 docs hit the lexicon on this corpus (shared vocabulary)
    assert len(got) == 500
    assert set(got["top_lang"]).issubset(set(lex["lang"]))
    assert (got["n_hits_top"] <= got["n_hits_total"]).all()
    assert (got["mix_entropy"] >= 0).all()
    # single-language docs have zero entropy; mixed docs positive
    single = got["n_hits_top"] == got["n_hits_total"]
    assert (got.loc[single, "mix_entropy"] == 0).all()
    assert (got.loc[~single, "mix_entropy"] > 0).all()

    # spot-check one doc against a direct count
    docs = pd.read_parquet(f"{SF}/documents.parquet",
                           columns=["doc_id", "text"])
    row = docs.iloc[0]
    toks = [t for t in row["text"].split(" ") if t]
    counts = {}
    for _, r in lex.iterrows():
        c = sum(1 for t in toks if t == r["term"])
        if c:
            counts[r["lang"]] = counts.get(r["lang"], 0) + c
    g0 = got[got["doc_id"] == row["doc_id"]].iloc[0]
    assert int(g0["n_hits_total"]) == sum(counts.values())
    assert int(g0["n_hits_top"]) == max(counts.values())


@needs_data
def test_streaming_hll_equals_batch_exactly(ray_session):
    """Register-max merging is associative/commutative/idempotent, so
    the chunked stream must reproduce the batch estimates EXACTLY."""
    from deekseek_ocr___dockerized_api_ray.pipelines.relational import (
        events_user_reach_hll,
        streaming_user_reach_hll,
    )

    batch = (_df(events_user_reach_hll(SF))
             .sort_values("event_type").reset_index(drop=True))
    for n_chunks in (1, 3, 5):
        stream = streaming_user_reach_hll(SF, n_chunks=n_chunks)
        pd.testing.assert_frame_equal(stream, batch)


@needs_data
def test_jsd_matches_reference_and_bounds(ray_session):
    from deekseek_ocr___dockerized_api_ray.pipelines.sequences import (
        weekend_type_jsd,
    )

    got = _df(weekend_type_jsd(SF))
    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["event_type", "ts"])
    we = pd.to_datetime(ev["ts"]).dt.dayofweek >= 5
    pv = ev.loc[~we, "event_type"].value_counts(normalize=True)
    qv = ev.loc[we, "event_type"].value_counts(normalize=True)
    types = sorted(set(pv.index) | set(qv.index))
    p = np.array([pv.get(t, 0.0) for t in types])
    q = np.array([qv.get(t, 0.0) for t in types])
    m = (p + q) / 2

    def h(x):
        nz = x > 0
        return -(x[nz] * np.log(x[nz])).sum()

    jsd_ref = h(m) - (h(p) + h(q)) / 2

    assert abs(float(got["jsd"].iloc[0]) - jsd_ref) < 1e-6
    assert 0.0 <= float(got["jsd"].iloc[0]) <= np.log(2.0) + 1e-9
    assert 0.0 <= float(got["jsd_norm"].iloc[0]) <= 1.0


@needs_data
def test_wilson_interval_brackets_p(ray_session):
    from deekseek_ocr___dockerized_api_ray.pipelines.text import (
        source_pii_rate,
        source_pii_wilson,
    )

    got = _df(source_pii_wilson(SF))
    rate = _df(source_pii_rate(SF)).set_index("source")

    assert (got["lo"] <= got["p"]).all() and (got["p"] <= got["hi"]).all()
    assert (got["lo"] >= 0).all() and (got["hi"] <= 1).all()
    # p agrees with the plain-rate op
    assert np.allclose(got.set_index("source")["p"]
                       .reindex(rate.index).to_numpy(),
                       rate["pii_rate"].to_numpy(), atol=1e-6)
    # wider interval for smaller n at similar p: monotone sanity on one
    # pair if available
    w = (got["hi"] - got["lo"]).to_numpy()
    assert (w > 0).all()


@needs_data
def test_customer_trend_matches_polyfit(ray_session):
    from deekseek_ocr___dockerized_api_ray.pipelines.analytics import (
        customer_value_trend,
    )

    got = _df(customer_value_trend(SF)).set_index("o_custkey")
    orders = pd.read_parquet(
        f"{SF}/orders.parquet",
        columns=["o_custkey", "o_orderdate", "o_totalprice"])
    origin = np.datetime64("1992-01-01", "D").astype(np.int64)
    orders["x"] = (orders["o_orderdate"].to_numpy()
                   .astype("datetime64[D]").astype(np.int64)
                   - origin).astype(float)
    checked = 0
    for ck, g in orders.groupby("o_custkey"):
        if len(g) < 2 or g["x"].nunique() < 2:
            assert ck not in got.index
            continue
        slope_ref = np.polyfit(g["x"], g["o_totalprice"], 1)[0]
        assert abs(float(got.loc[ck, "slope"]) - slope_ref) < 1e-4
        checked += 1
        if checked >= 30:
            break
    assert checked == 30


@needs_data
def test_degree_hist_totals(ray_session):
    import ray.data as rd

    from deekseek_ocr___dockerized_api_ray.stages.dedup import (
        lsh_candidate_pairs,
        neardup_degree_hist,
        verify_pairs_jaccard,
    )

    docs = rd.read_parquet(f"{SF}/documents.parquet",
                           columns=["doc_id", "text"])
    pairs = verify_pairs_jaccard(lsh_candidate_pairs(docs), docs,
                                 threshold=0.8)
    pdf = pairs.to_pandas()
    got = _df(neardup_degree_hist(docs, pairs))

    # sum of degree*count == 2 * |edges|; doc totals == distinct endpoints
    assert int((got["degree"] * got["n_docs"]).sum()) == 2 * len(pdf)
    assert int(got["n_docs"].sum()) == len(
        set(pdf["id_a"]) | set(pdf["id_b"]))


@needs_data
def test_entropy_rate_matches_reference(ray_session):
    from deekseek_ocr___dockerized_api_ray.pipelines.sequences import (
        markov_entropy_rate,
    )

    got = _df(markov_entropy_rate(SF))
    ev = (pd.read_parquet(f"{SF}/events.parquet",
                          columns=["event_id", "ts", "user_id",
                                   "event_type"])
          .sort_values(["user_id", "ts", "event_id"]))
    src = ev.groupby("user_id")["event_type"].shift(1)
    tr = pd.DataFrame({"src": src, "dst": ev["event_type"]}).dropna()
    cnt = tr.groupby(["src", "dst"]).size()
    h_rate = 0.0
    n = len(tr)
    for s, g in cnt.groupby(level=0):
        p = g / g.sum()
        h_rate += (g.sum() / n) * -(p * np.log(p)).sum()

    assert int(got["n_transitions"].iloc[0]) == n
    assert abs(float(got["entropy_rate"].iloc[0]) - h_rate) < 1e-6
    assert 0.0 <= float(got["ratio"].iloc[0]) <= 1.0


@needs_data
def test_checksums_partition_invariant_and_sensitive(ray_session):
    """XOR fingerprints must be identical under any partitioning and
    flip when a single doc changes."""
    import hashlib

    from deekseek_ocr___dockerized_api_ray.pipelines.text import (
        source_checksums,
    )

    got = _df(source_checksums(SF)).set_index("source")
    docs = pd.read_parquet(f"{SF}/documents.parquet",
                           columns=["doc_id", "source", "text"])

    # single-threaded reference fold (reverse order: XOR is commutative)
    ref = {}
    for _, r in docs.iloc[::-1].iterrows():
        dig = hashlib.md5(f"{r['doc_id']}:{r['text']}".encode()).digest()
        lo = int.from_bytes(dig[8:], "little")
        hi = int.from_bytes(dig[:8], "little")
        c = ref.setdefault(r["source"], [0, 0, 0])
        c[0] += 1
        c[1] ^= lo
        c[2] ^= hi
    for src, (n, lo, hi) in ref.items():
        assert int(got.loc[src, "n_docs"]) == n
        assert int(got.loc[src, "xor_lo"]) == lo
        assert int(got.loc[src, "xor_hi"]) == hi

    # sensitivity: changing one doc's text changes that source's
    # fingerprint (swap old digest out of the fold, new one in)
    d0 = docs.iloc[0]
    old = hashlib.md5(f"{d0['doc_id']}:{d0['text']}".encode()).digest()
    new = hashlib.md5(f"{d0['doc_id']}:{d0['text']}X".encode()).digest()
    mutated = (ref[d0["source"]][1]
               ^ int.from_bytes(old[8:], "little")
               ^ int.from_bytes(new[8:], "little"))
    assert mutated != int(got.loc[d0["source"], "xor_lo"])


@needs_data
def test_residuals_reconstruct_chi2(ray_session):
    """Sum of squared standardized residuals == the chi2 statistic."""
    from deekseek_ocr___dockerized_api_ray.pipelines.sequences import (
        event_weekday_chi2,
        event_weekday_residuals,
    )

    res = _df(event_weekday_residuals(SF))
    chi = _df(event_weekday_chi2(SF))
    # residuals are rounded r6; reconstruction is approximate at 1e-3
    assert abs((res["std_resid"] ** 2).sum()
               - float(chi["chi2"].iloc[0])) < 1e-3
    assert int(res["obs"].sum()) == int(chi["n"].iloc[0])
    assert len(res) == 35  # full 5-type x 7-day cross incl. empty cells


@needs_data
def test_dedup_rate_consistent_with_pairs(ray_session):
    import ray.data as rd

    from deekseek_ocr___dockerized_api_ray.pipelines.curation import (
        dedup_rate_by_source,
    )
    from deekseek_ocr___dockerized_api_ray.stages.dedup import (
        lsh_candidate_pairs,
        verify_pairs_jaccard,
    )

    got = _df(dedup_rate_by_source(SF))
    docs = rd.read_parquet(f"{SF}/documents.parquet",
                           columns=["doc_id", "text", "source"])
    pdf = verify_pairs_jaccard(lsh_candidate_pairs(docs), docs,
                               threshold=0.8).to_pandas()
    members = set(pdf["id_a"]) | set(pdf["id_b"])
    ddf = pd.read_parquet(f"{SF}/documents.parquet",
                          columns=["doc_id", "source"])
    want = (ddf.assign(d=ddf["doc_id"].isin(members).astype(int))
            .groupby("source").agg(n=("d", "size"), x=("d", "sum")))

    g = got.set_index("source")
    assert (g["n_docs"].reindex(want.index) == want["n"]).all()
    assert (g["n_dup_docs"].reindex(want.index) == want["x"]).all()
    assert int(g["n_dup_docs"].sum()) == len(members)


@needs_data
def test_part_name_er_canonicalization(ray_session):
    """ER output: canonical is a member of each name's JW component,
    idempotent (canonical of canonical = itself), and unmatched names
    map to themselves."""
    from deekseek_ocr___dockerized_api_ray.pipelines.text import (
        part_name_er,
        part_name_jw_pairs,
    )

    got = _df(part_name_er(SF, threshold=0.9))
    pairs = _df(part_name_jw_pairs(SF, threshold=0.9))

    cmap = dict(zip(got["p_name"], got["canonical_name"]))
    # idempotence
    for n, c in cmap.items():
        assert cmap[c] == c
    # matched pairs share a canonical name (edges are within components)
    for _, r in pairs.iterrows():
        assert cmap[r["name_a"]] == cmap[r["name_b"]]
    # names not in any pair are their own canonical
    in_pairs = set(pairs["name_a"]) | set(pairs["name_b"])
    for n, c in cmap.items():
        if n not in in_pairs:
            assert c == n
    # every name accounted for exactly once
    docs = pd.read_parquet(f"{SF}/part.parquet", columns=["p_name"])
    assert set(got["p_name"]) == set(docs["p_name"].unique())
    assert len(got) == docs["p_name"].nunique()


@needs_data
def test_minhash_estimator_error_bound(ray_session):
    """The estimator audit's observed error obeys the binomial bound:
    mean abs error well under 3 * sd(J=0.5) = 3 * 0.0625."""
    import ray.data as rd

    from deekseek_ocr___dockerized_api_ray.stages.dedup import (
        minhash_estimator_audit,
    )

    docs = rd.read_parquet(f"{SF}/documents.parquet",
                           columns=["doc_id", "text"])
    got = _df(minhash_estimator_audit(docs))

    assert len(got) > 100
    assert ((got["est_jaccard"] >= 0) & (got["est_jaccard"] <= 1)).all()
    assert ((got["exact_jaccard"] >= 0)
            & (got["exact_jaccard"] <= 1)).all()
    assert np.allclose(
        got["abs_err"],
        (got["est_jaccard"] - got["exact_jaccard"]).abs().round(6),
        atol=2e-6)
    assert got["abs_err"].mean() < 3 * 0.0625


@needs_data
def test_seasonal_decompose_reconstructs(ray_session):
    from deekseek_ocr___dockerized_api_ray.pipelines.analytics import (
        revenue_seasonal_decompose,
    )

    got = _df(revenue_seasonal_decompose(SF))
    # additive identity: trend + seasonal + resid == revenue (r6 slack)
    recon = got["trend"] + got["seasonal"] + got["resid"]
    assert np.allclose(recon, got["revenue"], atol=5e-6)
    # seasonal components sum to ~0 across weekdays (mean detrended)
    wd = pd.to_datetime(got["day_s"], unit="s").dt.dayofweek
    per_wd = got.groupby(wd.to_numpy())["seasonal"].first()
    assert len(per_wd) == 7
    # total revenue matches the orders table in cents
    orders = pd.read_parquet(f"{SF}/orders.parquet",
                             columns=["o_totalprice"])
    cents = np.floor(orders["o_totalprice"].to_numpy() * 100
                     + 0.5).astype(np.int64).sum()
    assert abs(got["revenue"].sum() * 100 - cents) < 1


@needs_data
def test_nearest_join_against_brute_force(ray_session):
    from deekseek_ocr___dockerized_api_ray.pipelines.relational import (
        events_nearest_order_join,
    )

    got = _df(events_nearest_order_join(SF)).set_index("event_id")
    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["event_id", "user_id", "ts"])
    orders = pd.read_parquet(f"{SF}/orders.parquet",
                             columns=["o_orderkey", "o_custkey",
                                      "o_orderdate"])
    od = (orders.sort_values(["o_custkey", "o_orderdate", "o_orderkey"])
          .drop_duplicates(["o_custkey", "o_orderdate"]))
    by_u = {u: g for u, g in od.groupby("o_custkey")}
    checked = 0
    for _, r in ev.head(200).iterrows():
        g = by_u.get(r["user_id"])
        if g is None:
            assert r["event_id"] not in got.index
            continue
        t = r["ts"].value // 1000  # us
        d_us = g["o_orderdate"].astype("datetime64[us]").astype("int64")
        dist = (t - d_us).abs()
        # equal distance prefers the earlier date (backward)
        best = g.loc[dist.idxmin()] if (dist == dist.min()).sum() == 1 \
            else g.loc[d_us[dist == dist.min()].idxmin()]
        row = got.loc[r["event_id"]]
        assert int(row["nearest_orderkey"]) == int(best["o_orderkey"])
        checked += 1
    assert checked >= 150


@needs_data
def test_temperature_sample_quota_semantics(ray_session):
    from deekseek_ocr___dockerized_api_ray.pipelines.text import (
        temperature_mixture_sample,
    )

    got = _df(temperature_mixture_sample(SF, total=200))
    docs = pd.read_parquet(f"{SF}/documents.parquet",
                           columns=["doc_id", "source"])

    assert len(got) == 200
    # equal-size sources (25 docs x 20 sources) -> exactly 10 each
    per_src = got.groupby("source").size()
    assert (per_src == 10).all() and len(per_src) == 20
    # each source's picks are its md5-order head
    import hashlib
    for src, g in got.groupby("source"):
        pool = docs.loc[docs["source"] == src, "doc_id"]
        h = {d: int.from_bytes(hashlib.md5(str(d).encode()).digest()[8:],
                               "little") for d in pool}
        want = sorted(pool, key=lambda d: (h[d], d))[:10]
        assert sorted(g["doc_id"]) == sorted(want)


@needs_data
def test_hard_negatives_are_wrong_label(ray_session):
    import ray.data as rd

    from deekseek_ocr___dockerized_api_ray.stages.similarity import (
        hard_negative_topk,
    )

    emb = pd.read_parquet(f"{SF}/embeddings.parquet")
    labels = dict(zip(emb["vec_id"], emb["label"]))
    got = _df(hard_negative_topk(
        rd.read_parquet(f"{SF}/embeddings.parquet"), [0, 1, 2, 3, 4],
        k=3))

    assert len(got) == 15
    for _, r in got.iterrows():
        assert labels[r["vec_id"]] != labels[r["query_id"]]
        assert r["vec_id"] != r["query_id"]
    # ranks are 1..3 per query
    assert (got.groupby("query_id")["rank"].apply(
        lambda s: sorted(s) == [1, 2, 3])).all()


@needs_data
def test_leakage_safe_split_clusters_stay_together(ray_session):
    import ray.data as rd

    from deekseek_ocr___dockerized_api_ray.pipelines.curation import (
        leakage_safe_split,
    )
    from deekseek_ocr___dockerized_api_ray.stages.dedup import (
        lsh_candidate_pairs,
        verify_pairs_jaccard,
    )

    got = _df(leakage_safe_split(SF)).set_index("doc_id")
    docs = rd.read_parquet(f"{SF}/documents.parquet",
                           columns=["doc_id", "text"])
    pairs = verify_pairs_jaccard(lsh_candidate_pairs(docs), docs,
                                 threshold=0.8).to_pandas()

    # every verified near-dup pair shares cluster AND split side
    for _, r in pairs.iterrows():
        assert (got.loc[r["id_a"], "cluster_id"]
                == got.loc[r["id_b"], "cluster_id"])
        assert got.loc[r["id_a"], "split"] == got.loc[r["id_b"], "split"]
    assert len(got) == 500
    # all three splits appear and shares are roughly 80/10/10
    frac = got["split"].value_counts(normalize=True)
    assert set(frac.index) == {"train", "val", "test"}
    assert 0.6 < frac["train"] < 0.95


@needs_data
def test_char_entropy_bounds_and_reference(ray_session):
    from deekseek_ocr___dockerized_api_ray.pipelines.text import (
        doc_char_entropy,
    )

    got = _df(doc_char_entropy(SF))
    docs = pd.read_parquet(f"{SF}/documents.parquet",
                           columns=["doc_id", "text"])
    assert len(got) == len(docs)
    # entropy in [0, ln(charset)]
    assert (got["entropy"] >= 0).all()
    assert (got["entropy"] <= np.log(got["charset"]) + 1e-9).all()
    # spot-check one doc
    t = docs["text"].iloc[0]
    b = np.frombuffer(t.encode(), dtype=np.uint8)
    _, c = np.unique(b, return_counts=True)
    p = c / c.sum()
    h_ref = -(p * np.log(p)).sum()
    assert abs(float(got["entropy"].iloc[0]) - h_ref) < 1e-6


@needs_data
def test_cohort_retention_triangle(ray_session):
    from deekseek_ocr___dockerized_api_ray.pipelines.analytics import (
        order_cohort_retention,
    )

    got = _df(order_cohort_retention(SF))
    # offset-0 retention is exactly 1, later offsets never exceed it
    base = got[got["offset"] == 0]
    assert (base["retention"] == 1.0).all()
    assert (got["retention"] <= 1.0).all() and (got["retention"] > 0).all()
    # monotone cohort sizes: n_active at offset>0 <= cohort size
    sizes = base.set_index("cohort_q")["n_active"]
    assert (got["n_active"] <= got["cohort_q"].map(sizes)).all()
    # cohort sizes sum to the distinct customer count
    orders = pd.read_parquet(f"{SF}/orders.parquet",
                             columns=["o_custkey"])
    assert int(sizes.sum()) == orders["o_custkey"].nunique()


@needs_data
def test_source_length_drift_vs_pairwise_ks(ray_session):
    from deekseek_ocr___dockerized_api_ray.pipelines.text import (
        source_length_drift,
    )

    got = _df(source_length_drift(SF)).set_index("source")
    docs = pd.read_parquet(f"{SF}/documents.parquet",
                           columns=["source", "n_chars"])
    src = docs["source"].iloc[0]
    a = np.sort(docs.loc[docs["source"] == src, "n_chars"].to_numpy())
    b = np.sort(docs.loc[docs["source"] != src, "n_chars"].to_numpy())
    pooled = np.unique(docs["n_chars"].to_numpy())
    d_ref = np.abs(np.searchsorted(a, pooled, "right") / len(a)
                   - np.searchsorted(b, pooled, "right") / len(b)).max()

    assert abs(float(got.loc[src, "ks_d"]) - d_ref) < 1e-6
    assert int(got.loc[src, "n_src"]) == len(a)
    assert ((got["ks_d"] >= 0) & (got["ks_d"] <= 1)).all()
    assert (got["n_src"] + got["n_rest"] == len(docs)).all()


@needs_data
def test_windowed_funnel_semantics(ray_session):
    from deekseek_ocr___dockerized_api_ray.pipelines.analytics import (
        events_windowed_funnel,
    )

    got = _df(events_windowed_funnel(SF))
    w_us = 168 * 3_600_000_000
    # window + ordering constraints hold wherever a step fired
    s2 = got[got["t2_us"] >= 0]
    assert ((s2["t2_us"] > s2["t1_us"])
            & (s2["t2_us"] <= s2["t1_us"] + w_us)).all()
    s3 = got[got["t3_us"] >= 0]
    assert ((s3["t3_us"] > s3["t2_us"])
            & (s3["t3_us"] <= s3["t2_us"] + w_us)).all()
    # stage is consistent with which steps fired
    assert (got.loc[got["stage"] == 1, "t2_us"] == -1).all()
    assert (got.loc[got["stage"] == 2, "t3_us"] == -1).all()
    assert (got.loc[got["stage"] == 3, "t3_us"] >= 0).all()
    # one row per user with a view
    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["user_id", "event_type"])
    assert len(got) == ev.loc[ev["event_type"] == "view",
                              "user_id"].nunique()


@needs_data
def test_triangle_census_identities(ray_session):
    from deekseek_ocr___dockerized_api_ray.pipelines.curation import (
        term_graph_triangles,
    )

    got = _df(term_graph_triangles(SF)).iloc[0]
    # 0 <= clustering <= 1; closed wedges = 3 * triangles <= wedges
    assert 0.0 <= got["clustering"] <= 1.0
    assert 3 * got["n_triangles"] <= got["n_wedges"]
    # brute-force check on the small test graph
    docs = pd.read_parquet(f"{SF}/documents.parquet", columns=["text"])
    from itertools import combinations
    edges = set()
    for t in docs["text"]:
        terms = sorted(set(x for x in t.split(" ") if x))
        edges.update(combinations(terms, 2))
    nodes = sorted({n for e in edges for n in e})
    tri = 0
    for a, b, c in combinations(nodes, 3):
        if ((a, b) in edges and (a, c) in edges and (b, c) in edges):
            tri += 1
    assert int(got["n_triangles"]) == tri
    assert int(got["n_edges"]) == len(edges)
    assert int(got["n_nodes"]) == len(nodes)


@needs_data
def test_assortativity_matches_numpy(ray_session):
    from itertools import combinations

    from deekseek_ocr___dockerized_api_ray.pipelines.curation import (
        term_graph_assortativity,
    )

    got = _df(term_graph_assortativity(SF)).iloc[0]
    docs = pd.read_parquet(f"{SF}/documents.parquet", columns=["text"])
    edges = set()
    for t in docs["text"]:
        terms = sorted(set(x for x in t.split(" ") if x))
        edges.update(combinations(terms, 2))
    deg = {}
    for a, b in edges:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    xs, ys = [], []
    for a, b in edges:
        xs += [deg[a], deg[b]]
        ys += [deg[b], deg[a]]
    r_ref = np.corrcoef(xs, ys)[0, 1]
    if np.isnan(r_ref):  # constant-degree graph: engine defines r := 0
        r_ref = 0.0
    assert int(got["n_edges_directed"]) == 2 * len(edges)
    assert abs(float(got["r"]) - r_ref) < 1e-6
    assert -1.0 <= float(got["r"]) <= 1.0


@needs_data
def test_anova_matches_reference(ray_session):
    from deekseek_ocr___dockerized_api_ray.pipelines.sequences import (
        events_hour_anova,
    )

    got = _df(events_hour_anova(SF)).iloc[0]
    ev = pd.read_parquet(f"{SF}/events.parquet", columns=["ts", "value"])
    hr = pd.to_datetime(ev["ts"]).dt.hour
    v = ev["value"]
    grand = v.mean()
    ss_total = ((v - grand) ** 2).sum()
    ss_between = sum(len(g) * (g.mean() - grand) ** 2
                     for _, g in v.groupby(hr.to_numpy()))
    eta2_ref = ss_between / ss_total
    assert abs(float(got["eta2"]) - eta2_ref) < 1e-6
    assert 0.0 <= float(got["eta2"]) <= 1.0
    assert int(got["df_b"]) == hr.nunique() - 1
    assert int(got["df_w"]) == len(ev) - hr.nunique()


def test_assortativity_star_graph_negative(ray_session, tmp_path):
    """A star graph (hub-spoke) must give the textbook r = -1 -- drives
    the non-degenerate branch the complete test corpus cannot."""
    from deekseek_ocr___dockerized_api_ray.pipelines.curation import (
        term_graph_assortativity,
    )

    # docs that induce a star: hub co-occurs with each spoke separately
    docs = pd.DataFrame({
        "doc_id": range(4),
        "text": ["hub spokea", "hub spokeb", "hub spokec", "hub spoked"],
    })
    docs.to_parquet(tmp_path / "documents.parquet")
    got = _df(term_graph_assortativity(str(tmp_path))).iloc[0]
    assert int(got["n_edges_directed"]) == 8
    assert abs(float(got["r"]) - (-1.0)) < 1e-6


@needs_data
def test_fdr_monotone_and_bounds(ray_session):
    from deekseek_ocr___dockerized_api_ray.pipelines.text import (
        source_drift_fdr,
    )

    got = _df(source_drift_fdr(SF))
    assert ((got["p"] >= 0) & (got["p"] <= 1)).all()
    assert ((got["p_adj"] >= 0) & (got["p_adj"] <= 1)).all()
    # BH never shrinks a p-value (within r6 rounding slack)
    assert (got["p_adj"] >= got["p"] - 1e-6).all()
    # adjusted values are monotone in the p-ordering
    o = got.sort_values(["p", "source"]).reset_index(drop=True)
    assert (np.diff(o["p_adj"].to_numpy()) >= -1e-9).all()
    # sig flags agree with the 0.05 threshold on p_adj
    assert (got["sig"] == (got["p_adj"] <= 0.05).astype(int)).all()


@needs_data
def test_twoway_anova_identities(ray_session):
    from deekseek_ocr___dockerized_api_ray.pipelines.text import (
        doclen_twoway_anova,
    )

    got = _df(doclen_twoway_anova(SF)).iloc[0]
    docs = pd.read_parquet(f"{SF}/documents.parquet",
                           columns=["lang", "source", "n_chars"])
    v = docs["n_chars"].astype(float)
    grand = v.mean()
    ss_total = ((v - grand) ** 2).sum()
    ss_lang = sum(len(g) * (g.mean() - grand) ** 2
                  for _, g in v.groupby(docs["lang"].to_numpy()))
    assert abs(float(got["ss_lang"]) - ss_lang) < 1e-2
    # decomposition reassembles the total
    total = (float(got["ss_lang"]) + float(got["ss_source"])
             + float(got["ss_inter"]) + float(got["ss_resid"]))
    assert abs(total - ss_total) < 1e-2
    assert 0.0 <= float(got["eta2_lang"]) <= 1.0
    assert 0.0 <= float(got["eta2_source"]) <= 1.0
    assert int(got["n"]) == len(docs)


def test_temperature_sample_unequal_sources(ray_session, tmp_path):
    """Unequal source sizes drive the largest-remainder branch the
    uniform driver corpus never hits: quotas must sum exactly to the
    target, favor small sources at T=0.5, and never exceed a source's
    size when the quota is larger than the pool."""
    from deekseek_ocr___dockerized_api_ray.pipelines.text import (
        temperature_mixture_sample,
    )

    sizes = {"big": 400, "mid": 80, "tiny": 8}
    rows = []
    i = 0
    for src, n in sizes.items():
        for _ in range(n):
            rows.append((i, f"doc {i}", src))
            i += 1
    pd.DataFrame(rows, columns=["doc_id", "text", "source"]).to_parquet(
        tmp_path / "documents.parquet")

    total = 100
    got = _df(temperature_mixture_sample(str(tmp_path), total=total))
    per = got.groupby("source").size()

    # replicate the quota solver
    import numpy as np
    srcs = sorted(sizes)
    w = np.power([float(sizes[s]) for s in srcs], 0.5)
    share = w / w.sum() * total
    base = np.floor(share).astype(int)
    rem = share - base
    short = total - base.sum()
    order = np.lexsort((np.arange(len(rem)), -rem))
    quota = base.copy()
    quota[order[:short]] += 1
    for s, q in zip(srcs, quota):
        assert per.get(s, 0) == min(q, sizes[s])
    # T=0.5 upweights: tiny's share of the sample >> its corpus share
    assert per["tiny"] / total > sizes["tiny"] / sum(sizes.values())


def test_heaps_fit_sparse_docid_matches_oracle(ray_session, tmp_path):
    """Empty doc-id checkpoints (ids clustered near max) must be dropped
    from the fit on BOTH sides: the oracle's INNER JOIN silently drops
    them; the engine previously fit log(0) = -inf points (ADVICE r3)."""
    import duckdb

    from deekseek_ocr___dockerized_api_ray.pipelines.text import (
        corpus_heaps_fit,
    )

    # ids 900..1000 => thresholds 100..800 see no docs: 8 empty points
    rng = np.random.default_rng(7)
    ids = np.arange(900, 1001)
    vocab = [f"w{i}" for i in range(40)]
    texts = [" ".join(rng.choice(vocab, size=12)) for _ in ids]
    pd.DataFrame({"doc_id": ids, "text": texts}).to_parquet(
        tmp_path / "documents.parquet")

    got = _df(corpus_heaps_fit(str(tmp_path), n_checkpoints=10))
    assert np.isfinite(got[["beta", "lnk", "r2"]].to_numpy()).all()
    assert int(got["n_points"].iloc[0]) == 2  # only thresholds 900, 1000

    import __ray_entry__ as m

    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{tmp_path}/documents.parquet')")
    sdf = con.execute(m.oracle_sql()["corpus_heaps_fit"]).df()
    cols = sorted(got.columns)
    assert cols == sorted(sdf.columns)
    a = got[cols].reset_index(drop=True).astype(str)
    b = sdf[cols].reset_index(drop=True).astype(str)
    assert a.equals(b), (a, b)


def test_nearest_order_join_one_sided_bucket_schema(ray_session, tmp_path):
    """A bucket whose users have only events (or only orders) returns the
    typed empty frame; object-dtype empties become null-typed in Arrow
    and crash map_groups schema unification (ADVICE r3)."""
    from deekseek_ocr___dockerized_api_ray.pipelines.relational import (
        events_nearest_order_join,
    )

    # n_buckets=4: user 1 events-only (bucket 1), user 2 orders-only
    # (bucket 2), user 3 both (bucket 3) -> two one-sided buckets
    ev = pd.DataFrame({
        "event_id": [10, 11, 12],
        "user_id": [1, 3, 3],
        "ts": pd.to_datetime(["2024-01-05", "2024-02-01", "2024-03-01"]),
    })
    orders = pd.DataFrame({
        "o_orderkey": [100, 101, 102],
        "o_custkey": [2, 3, 3],
        "o_orderdate": pd.to_datetime(["2024-01-10", "2024-01-20",
                                       "2024-02-10"]),
    })
    ev.to_parquet(tmp_path / "events.parquet")
    orders.to_parquet(tmp_path / "orders.parquet")

    got = (events_nearest_order_join(str(tmp_path), n_buckets=4)
           .to_pandas().sort_values("event_id").reset_index(drop=True))
    # only user 3's events survive; user 1 (no orders) drops out
    assert got["event_id"].tolist() == [11, 12]
    assert got["user_id"].tolist() == [3, 3]
    # 2024-02-01 is 12d from 01-20, 9d from 02-10 -> forward order 102
    assert got["nearest_orderkey"].tolist() == [102, 102]
    assert (got.dtypes == "int64").all(), got.dtypes

    # oracle parity on the synthetic tables: the driver corpus never
    # has both neighbors for one event, this fixture does
    import duckdb

    import __ray_entry__ as m

    con = duckdb.connect()
    for t in ("events", "orders"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{tmp_path}/{t}.parquet')")
    sdf = con.execute(m.oracle_sql()["events_nearest_order_join"]).df()
    cols = sorted(got.columns)
    assert cols == sorted(sdf.columns)
    a = got[cols].sort_values(cols).reset_index(drop=True).astype(str)
    b = sdf[cols].sort_values(cols).reset_index(drop=True).astype(str)
    assert a.equals(b), (a, b)
