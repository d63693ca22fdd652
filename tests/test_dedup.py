"""Dedup operators: exact, first-per-group, MinHash+LSH (candidates,
verify, survivors), SimHash, distinct."""

import pyarrow as pa
import pytest

from deekseek_ocr___dockerized_api_ray.functions.hashing import (
    MinHasher,
    char_shingles,
    hamming64,
    jaccard,
    shingle_hashes,
    simhash64,
    simhash_bands,
)
from deekseek_ocr___dockerized_api_ray.stages.dedup import (
    distinct_rows,
    exact_dedup,
    first_per_group,
    lsh_candidate_pairs,
    minhash_dedup,
    simhash_neardup_pairs,
    verify_pairs_jaccard,
)

BASE = (
    "the quick brown fox jumps over the lazy dog while the cat watches "
    "from a warm windowsill in the late afternoon sun of october"
)


def _docs_ds(rows):
    import ray.data as rd

    return rd.from_arrow(pa.Table.from_pylist(rows))


@pytest.fixture(scope="module")
def dup_corpus(ray_session):
    # 3 exact copies of BASE, 2 near-copies (1-word edit), rest distinct
    rows = []
    for i in range(3):
        rows.append({"doc_id": f"d{i:03d}", "text": BASE})
    rows.append({"doc_id": "d100", "text": BASE.replace("october", "november")})
    rows.append({"doc_id": "d101", "text": BASE.replace("cat", "kitten")})
    for i in range(40):
        rows.append(
            {"doc_id": f"u{i:03d}",
             "text": f"unique document number {i} talking about topic-{i*7} and "
                     f"entity-{i*13} with completely different content words {i}"}
        )
    return rows


def test_exact_dedup(dup_corpus):
    out = exact_dedup(_docs_ds(dup_corpus)).take_all()
    ids = sorted(r["doc_id"] for r in out)
    # of the 3 exact copies only min id d000 survives; near-copies stay
    assert "d000" in ids and "d001" not in ids and "d002" not in ids
    assert "d100" in ids and "d101" in ids
    assert len(out) == len(dup_corpus) - 2


def test_first_per_group(ray_session):
    rows = [
        {"k": "a", "ord": 2, "v": "second"},
        {"k": "a", "ord": 1, "v": "first"},
        {"k": "b", "ord": 9, "v": "only"},
        {"k": "a", "ord": 3, "v": "third"},
    ]
    out = first_per_group(_docs_ds(rows), "k", ["ord"]).take_all()
    got = {r["k"]: r["v"] for r in out}
    assert got == {"a": "first", "b": "only"}


def test_minhash_estimates_jaccard():
    mh = MinHasher(128, 42)
    a = BASE
    b = BASE.replace("october", "november")
    true = jaccard(char_shingles(a), char_shingles(b))
    est = float(
        (mh.signature(shingle_hashes(a)) == mh.signature(shingle_hashes(b))).mean()
    )
    assert abs(true - est) < 0.15
    assert true > 0.8


def test_lsh_finds_planted_neardups(dup_corpus):
    pairs = lsh_candidate_pairs(_docs_ds(dup_corpus)).take_all()
    pairset = {(r["id_a"], r["id_b"]) for r in pairs}
    # exact copies must be candidates
    assert ("d000", "d001") in pairset
    assert ("d000", "d002") in pairset
    # near-copies (jaccard ~0.9) must be candidates
    assert ("d000", "d100") in pairset


def test_verify_and_survivors(dup_corpus):
    ds = _docs_ds(dup_corpus)
    pairs = lsh_candidate_pairs(ds)
    verified = verify_pairs_jaccard(pairs, ds, threshold=0.8).take_all()
    vset = {(r["id_a"], r["id_b"]) for r in verified}
    assert ("d000", "d001") in vset
    for r in verified:
        assert r["jaccard"] >= 0.8

    survivors = minhash_dedup(ds, threshold=0.8).take_all()
    ids = {r["doc_id"] for r in survivors}
    # the whole near-dup cluster collapses to its min id
    assert "d000" in ids
    assert {"d001", "d002", "d100", "d101"} & ids == set()
    assert all(f"u{i:03d}" in ids for i in range(40))


def test_simhash_neardup(dup_corpus):
    h1 = simhash64(BASE)
    h2 = simhash64(BASE.replace("october", "november"))
    assert hamming64(h1, h2) <= 10
    assert len(simhash_bands(h1, 4)) == 4
    pairs = simhash_neardup_pairs(_docs_ds(dup_corpus), max_hamming=6).take_all()
    pairset = {(r["id_a"], r["id_b"]) for r in pairs}
    assert ("d000", "d001") in pairset  # identical -> hamming 0
    for r in pairs:
        assert r["hamming"] <= 6


def test_distinct_rows(ray_session):
    rows = [{"a": i % 3, "b": i % 2} for i in range(60)]
    out = distinct_rows(_docs_ds(rows), ["a", "b"]).take_all()
    assert len(out) == 6
    assert len({(r["a"], r["b"]) for r in out}) == 6


def test_ngram_jaccard_verify(dup_corpus):
    from deekseek_ocr___dockerized_api_ray.stages.dedup import (
        verify_pairs_ngram_jaccard,
    )

    ds = _docs_ds(dup_corpus)
    pairs = lsh_candidate_pairs(ds)
    verified = verify_pairs_ngram_jaccard(pairs, ds, threshold=0.5, n=3).take_all()
    vset = {(r["id_a"], r["id_b"]) for r in verified}
    assert ("d000", "d001") in vset  # identical docs: ngram jaccard 1.0
    for r in verified:
        assert r["ngram_jaccard"] >= 0.5


def test_simhash_dedup_survivors(dup_corpus):
    from deekseek_ocr___dockerized_api_ray.stages.dedup import simhash_dedup

    out = simhash_dedup(_docs_ds(dup_corpus), max_hamming=6).take_all()
    ids = {r["doc_id"] for r in out}
    assert "d000" in ids
    # the exact copies collapse (hamming 0); near-copies collapse iff within 6 bits
    assert "d001" not in ids and "d002" not in ids


def test_survivor_paths_agree(ray_session):
    """The size-gated driver union-find and the distributed min-label
    propagation must produce identical survivors."""
    import ray.data as rd

    from deekseek_ocr___dockerized_api_ray.stages.dedup import survivors_from_pairs

    docs = rd.from_items([{"doc_id": f"d{i:02d}", "text": f"t{i}"} for i in range(12)])
    # two components (one a chain, exercising multi-round propagation) + singletons
    pairs = rd.from_items([
        {"id_a": "d00", "id_b": "d01"},
        {"id_a": "d01", "id_b": "d02"},
        {"id_a": "d02", "id_b": "d03"},   # chain d00-d01-d02-d03
        {"id_a": "d05", "id_b": "d07"},
        {"id_a": "d07", "id_b": "d06"},   # triangle-ish d05-d07-d06
    ])
    fast = sorted(r["doc_id"] for r in
                  survivors_from_pairs(docs, pairs).take_all())
    dist = sorted(r["doc_id"] for r in
                  survivors_from_pairs(docs, pairs, driver_threshold=0).take_all())
    assert fast == dist
    assert fast == ["d00", "d04", "d05", "d08", "d09", "d10", "d11"]


def test_verify_text_attach_paths_agree(ray_session):
    """Broadcast text attach (under the gate) and join attach (above it)
    must verify identically. (The join path needs enough pairs that no
    hash partition is empty -- Ray 2.49's hash join errors on
    schema-less empty partitions, which real above-the-gate workloads
    never produce.)"""
    import ray.data as rd

    from deekseek_ocr___dockerized_api_ray.stages.dedup import verify_pairs_jaccard

    base = "the quick brown fox jumps over the lazy dog number"
    docs = rd.from_items(
        [{"doc_id": f"d{i:02d}", "text": f"{base} {i}"} for i in range(20)]
        + [{"doc_id": "x00", "text": "completely different content here entirely"}]
    )
    pairs = rd.from_items(
        [{"id_a": f"d{i:02d}", "id_b": f"d{i+1:02d}"} for i in range(19)]
        + [{"id_a": "d00", "id_b": "x00"}]
    )
    fast = sorted((r["id_a"], r["id_b"], r["jaccard"]) for r in
                  verify_pairs_jaccard(pairs, docs, threshold=0.5).take_all())
    joins = sorted((r["id_a"], r["id_b"], r["jaccard"]) for r in
                   verify_pairs_jaccard(pairs, docs, threshold=0.5,
                                        broadcast_bytes=0).take_all())
    assert fast == joins and len(fast) == 19


def test_component_labels_paths_agree(ray_session):
    """component_labels: driver union-find and distributed propagation
    emit the same (node, label) table; labels are component minima."""
    import ray.data as rd

    from deekseek_ocr___dockerized_api_ray.stages.dedup import component_labels

    pairs = rd.from_items([
        {"id_a": 10, "id_b": 11},
        {"id_a": 11, "id_b": 12},
        {"id_a": 12, "id_b": 13},     # chain -> all label 10
        {"id_a": 25, "id_b": 27},
        {"id_a": 27, "id_b": 26},     # -> all label 25
    ])
    want = {10: 10, 11: 10, 12: 10, 13: 10, 25: 25, 26: 25, 27: 25}
    fast = {r["node"]: r["label"] for r in component_labels(pairs).take_all()}
    dist = {r["node"]: r["label"] for r in
            component_labels(pairs, driver_threshold=0).take_all()}
    assert fast == want
    assert dist == want


def test_containment_scores_excerpt_high(ray_session):
    """A short doc fully embedded in a long one: containment 1.0 even
    though Jaccard is low; both size-gate paths agree."""
    import ray.data as rd

    from deekseek_ocr___dockerized_api_ray.stages.dedup import (
        verify_pairs_containment,
        verify_pairs_ngram_jaccard,
    )

    long = " ".join(f"w{i}" for i in range(100))
    short = " ".join(f"w{i}" for i in range(40, 50))  # embedded excerpt
    docs = rd.from_items([
        {"doc_id": 1, "text": long},
        {"doc_id": 2, "text": short},
        {"doc_id": 3, "text": "totally unrelated words only here"},
    ])
    pairs = rd.from_items([{"id_a": 1, "id_b": 2}, {"id_a": 1, "id_b": 3}])
    fast = {(r["id_a"], r["id_b"]): r["containment"] for r in
            verify_pairs_containment(pairs, docs, threshold=0.5).take_all()}
    join = {(r["id_a"], r["id_b"]): r["containment"] for r in
            verify_pairs_containment(pairs, docs, threshold=0.5,
                                     broadcast_bytes=0).take_all()}
    assert fast == join == {(1, 2): 1.0}
    jac = {(r["id_a"], r["id_b"]): r["ngram_jaccard"] for r in
           verify_pairs_ngram_jaccard(pairs, docs, threshold=0.0).take_all()}
    assert jac[(1, 2)] < 0.1  # Jaccard misses the excerpt relationship


def test_tfidf_vocab_cap_floors_tail_idf(ray_session):
    """Top-V idf cap (VERDICT r2 #1): with max_vocab < vocabulary size,
    kept tokens keep their exact idf and tail tokens take the FLOOR
    ln(N/df_V); with max_vocab >= vocabulary the result is the uncapped
    score. Pinned against an independent local computation."""
    import math

    import ray.data as rd

    from deekseek_ocr___dockerized_api_ray.stages.dedup import (
        verify_pairs_tfidf_cosine,
    )

    # df: "common" in all 4 docs, "shared" in 2, rare-* in 1 each
    rows = [
        {"doc_id": 0, "text": "common shared rare0 rare0"},
        {"doc_id": 1, "text": "common shared rare1"},
        {"doc_id": 2, "text": "common rare2"},
        {"doc_id": 3, "text": "common rare3"},
    ]
    docs = _docs_ds(rows)
    pairs = _docs_ds([{"id_a": 0, "id_b": 1}])

    def local_score(vocab_cap):
        n, df = 4, {"common": 4, "shared": 2, "rare0": 1, "rare1": 1,
                    "rare2": 1, "rare3": 1}
        kept = sorted(df.items(), key=lambda kv: (-kv[1], kv[0]))[:vocab_cap]
        kept_idf = {t: math.log(n / d) for t, d in kept}
        tail = (math.log(n / kept[-1][1])
                if len(df) > vocab_cap else None)

        def wv(toks):
            from collections import Counter
            tf = Counter(toks.split())
            return {t: c * kept_idf.get(t, tail) for t, c in tf.items()}

        wa, wb = wv(rows[0]["text"]), wv(rows[1]["text"])
        na = math.sqrt(sum(x * x for x in wa.values()))
        nb = math.sqrt(sum(x * x for x in wb.values()))
        return sum(w * wb[t] for t, w in wa.items() if t in wb) / (na * nb)

    for cap in (2, 3, 100):
        got = verify_pairs_tfidf_cosine(
            pairs, docs, threshold=0.0, max_vocab=cap).to_pandas()
        assert len(got) == 1
        expect = round(local_score(cap), 6)
        assert abs(got["tfidf_cosine"].iloc[0] - expect) < 1e-9, cap

    # the cap must actually change the score here (tail floor engaged):
    capped = verify_pairs_tfidf_cosine(
        pairs, docs, threshold=0.0, max_vocab=2).to_pandas()["tfidf_cosine"].iloc[0]
    uncapped = verify_pairs_tfidf_cosine(
        pairs, docs, threshold=0.0).to_pandas()["tfidf_cosine"].iloc[0]
    assert capped != uncapped


def test_prefix_filter_exact_paths_agree(ray_session):
    """prefix_filter_ngram_pairs: broadcast-df and join-df gate paths
    emit identical pairs on the real corpus, and the exact join is a
    SUPERSET of the LSH-blocked chain (same measure, same threshold --
    LSH can only lose candidates, never add)."""
    import pandas as pd
    import ray.data as rd

    from deekseek_ocr___dockerized_api_ray.stages.dedup import (
        lsh_candidate_pairs,
        prefix_filter_ngram_pairs,
        verify_pairs_ngram_jaccard,
    )

    docs = rd.read_parquet("/root/testdata/sf0.001/documents.parquet",
                           columns=["doc_id", "text"])
    a = prefix_filter_ngram_pairs(docs, threshold=0.3, n=3).to_pandas()
    b = prefix_filter_ngram_pairs(docs, threshold=0.3, n=3,
                                  broadcast_df=0).to_pandas()
    key = ["id_a", "id_b"]
    pd.testing.assert_frame_equal(
        a.sort_values(key).reset_index(drop=True),
        b.sort_values(key).reset_index(drop=True))
    assert len(a) > 0

    lsh = verify_pairs_ngram_jaccard(
        lsh_candidate_pairs(docs), docs, threshold=0.3, n=3).to_pandas()
    exact_set = set(zip(a["id_a"], a["id_b"]))
    assert set(zip(lsh["id_a"], lsh["id_b"])) <= exact_set


def test_similar_docs_topk_is_ranked_slice_of_exact_pairs(ray_session):
    import os

    import pandas as pd
    import pytest
    import ray.data as rd

    SF = "/root/testdata/sf0.001"
    if not os.path.isdir(SF):
        pytest.skip("driver testdata absent")

    from deekseek_ocr___dockerized_api_ray.stages.dedup import (
        prefix_filter_ngram_pairs,
        similar_docs_topk,
    )

    docs = rd.read_parquet(f"{SF}/documents.parquet",
                           columns=["doc_id", "text"])
    got = similar_docs_topk(docs, k=3, threshold=0.3, n=3).to_pandas()
    docs2 = rd.read_parquet(f"{SF}/documents.parquet",
                            columns=["doc_id", "text"])
    pairs = prefix_filter_ngram_pairs(docs2, threshold=0.3, n=3).to_pandas()
    sym = pd.concat([
        pairs.rename(columns={"id_a": "doc_id", "id_b": "other_id"}),
        pairs.rename(columns={"id_b": "doc_id", "id_a": "other_id"}),
    ], ignore_index=True)
    sym = sym.sort_values(["doc_id", "ngram_jaccard", "other_id"],
                          ascending=[True, False, True])
    sym["rk"] = sym.groupby("doc_id").cumcount() + 1
    exp = sym[sym["rk"] <= 3][["doc_id", "other_id", "ngram_jaccard", "rk"]]
    exp = exp.reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), exp, check_dtype=False)
    assert (got.groupby("doc_id")["rk"].max() <= 3).all()


def test_prefix_filter_ppjoin_filters_lossless(ray_session):
    """The PPJoin positional + length candidate filters (Xiao et al.
    2008) and the gated gram-id fast verify are LOSSLESS: the engine's
    pair set equals brute-force all-pairs word-n-gram Jaccard >= t
    (values r6-identical), and the fast-verify path equals the
    text-reverify fallback path bit-for-bit."""
    import itertools

    import pandas as pd
    import pyarrow.parquet as pq
    import ray.data as rd

    from deekseek_ocr___dockerized_api_ray.functions.hashing import (
        jaccard,
        word_ngrams,
    )
    from deekseek_ocr___dockerized_api_ray.functions.rounding import (
        round_half_away,
    )
    from deekseek_ocr___dockerized_api_ray.stages.dedup import (
        prefix_filter_ngram_pairs,
    )

    pdf = pq.read_table("/root/testdata/sf0.001/documents.parquet",
                        columns=["doc_id", "text"]).to_pandas()
    grams = {i: word_ngrams(t, 3) for i, t in zip(pdf["doc_id"], pdf["text"])}
    rows = []
    for a, b in itertools.combinations(sorted(grams), 2):
        j = round_half_away(jaccard(grams[a], grams[b]), 6)
        if j >= 0.3:
            rows.append((a, b, j))
    exp = pd.DataFrame(rows, columns=["id_a", "id_b", "ngram_jaccard"])

    docs = rd.read_parquet("/root/testdata/sf0.001/documents.parquet",
                           columns=["doc_id", "text"])
    key = ["id_a", "id_b"]
    fast = prefix_filter_ngram_pairs(docs, threshold=0.3, n=3).to_pandas()
    pd.testing.assert_frame_equal(
        fast.sort_values(key).reset_index(drop=True),
        exp.sort_values(key).reset_index(drop=True), check_dtype=False)

    slow = prefix_filter_ngram_pairs(
        docs, threshold=0.3, n=3, verify_broadcast_occ=0).to_pandas()
    pd.testing.assert_frame_equal(
        fast.sort_values(key).reset_index(drop=True),
        slow.sort_values(key).reset_index(drop=True), check_dtype=False)
    assert len(fast) > 0


def test_lsh_recall_eval_counts_consistent(ray_session):
    """The evaluation op's counts equal the row counts of the two pair
    pipelines it grades; the LSH-verified set is a subset of the exact
    set (same threshold, same measure), so precision is exactly 1.0 and
    n_hit == n_lsh."""
    import ray.data as rd

    from deekseek_ocr___dockerized_api_ray.stages.dedup import (
        lsh_candidate_pairs,
        lsh_recall_eval,
        prefix_filter_ngram_pairs,
        verify_pairs_ngram_jaccard,
    )

    docs = rd.read_parquet("/root/testdata/sf0.001/documents.parquet",
                           columns=["doc_id", "text"])
    got = lsh_recall_eval(docs, threshold=0.3, n=3).to_pandas().iloc[0]

    n_exact = prefix_filter_ngram_pairs(docs, threshold=0.3, n=3).count()
    n_lsh = verify_pairs_ngram_jaccard(
        lsh_candidate_pairs(docs), docs, threshold=0.3, n=3).count()
    assert got["n_exact"] == n_exact > 0
    assert got["n_lsh"] == n_lsh
    assert got["n_hit"] == n_lsh  # verified subset of exact
    assert got["lsh_precision"] == 1.0
    assert got["lsh_recall"] == n_lsh / float(n_exact)
    assert 0.0 < got["lsh_recall"] <= 1.0


def test_neardup_kcore_matches_local_peel(ray_session):
    """The distributed bounded-round peel equals a single-process
    recompute over the same verified pairs, and the core is a strict
    subset of the near-dup nodes (pairwise dups peel away)."""
    import collections

    import ray.data as rd

    from deekseek_ocr___dockerized_api_ray.stages.dedup import (
        lsh_candidate_pairs,
        neardup_kcore,
        verify_pairs_jaccard,
    )

    docs = rd.read_parquet("/root/testdata/sf0.001/documents.parquet",
                           columns=["doc_id", "text"])
    pairs = verify_pairs_jaccard(lsh_candidate_pairs(docs), docs,
                                 threshold=0.8).to_pandas()
    edges = {(int(a), int(b)) for a, b in zip(pairs["id_a"], pairs["id_b"])}
    sym = {(a, b) for a, b in edges} | {(b, a) for a, b in edges}
    k = 2
    for _ in range(2):
        deg = collections.Counter(a for a, _ in sym)
        keep = {n for n, d in deg.items() if d >= k}
        sym = {(a, b) for a, b in sym if a in keep and b in keep}
    deg = collections.Counter(a for a, _ in sym)
    expect = sorted(deg.items())

    got = neardup_kcore(docs, k=2, rounds=2, threshold=0.8).to_pandas()
    assert list(zip(got["doc_id"], got["core_deg"])) == expect
    all_nodes = {n for e in edges for n in e}
    assert 0 < len(got) < len(all_nodes)


def test_neardup_threshold_sweep_monotone_and_counts(ray_session):
    """The calibration curve is non-increasing in the threshold, its
    lowest cut equals the full pair-table size, and each count matches
    a direct filter of the exact pair table."""
    import numpy as np
    import ray.data as rd

    from deekseek_ocr___dockerized_api_ray.stages.dedup import (
        neardup_threshold_sweep,
        prefix_filter_ngram_pairs,
    )

    docs = rd.read_parquet("/root/testdata/sf0.001/documents.parquet",
                           columns=["doc_id", "text"])
    out = (neardup_threshold_sweep(docs, grid_pcts=(20, 40, 60, 80))
           .to_pandas().sort_values("threshold_pct"))
    assert list(out["threshold_pct"]) == [20, 40, 60, 80]
    n = out["n_pairs"].to_numpy()
    assert (n[:-1] >= n[1:]).all(), "curve must be non-increasing"

    pairs = prefix_filter_ngram_pairs(docs, threshold=0.2, n=3).to_pandas()
    j = pairs["ngram_jaccard"].to_numpy(np.float64)
    for pct, got in zip(out["threshold_pct"], n):
        assert int(got) == int((j >= pct / 100.0).sum()), pct
