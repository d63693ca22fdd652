"""Property tests for the corpus-curation operators (full oracle parity
is swept in test_entry.py)."""

import os
import sys

import numpy as np
import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = "/root/testdata/sf0.001"
needs_data = pytest.mark.skipif(not os.path.isdir(SF), reason="driver testdata absent")


@needs_data
def test_decontaminate_excludes_benchmark_and_flags_dups(ray_session):
    from deekseek_ocr___dockerized_api_ray.pipelines.curation import (
        _BENCH_MOD,
        decontaminate,
    )

    df = decontaminate(SF).to_pandas()
    # benchmark docs never appear in the scored output
    assert (df["doc_id"] % _BENCH_MOD != 0).all()
    # the corpus plants near-duplicates, so some training docs must be
    # flagged -- and not all of them (the ratio is discriminative)
    n_flagged = int(df["contaminated"].sum())
    assert 0 < n_flagged < len(df)
    # flag is exactly the integer-ratio predicate
    expect = df["n_overlap"] * 10 >= 9 * df["n_shingles"]
    assert (df["contaminated"] == expect).all()


@needs_data
def test_tfidf_top_term_matches_pandas(ray_session):
    from deekseek_ocr___dockerized_api_ray.pipelines.curation import (
        doc_tfidf_top_terms,
    )

    got = doc_tfidf_top_terms(SF).to_pandas().sort_values("doc_id").reset_index(drop=True)
    docs = pd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    ex = (docs.assign(term=docs["text"].str.split(" "))
          .loc[:, ["doc_id", "term"]].explode("term"))
    ex = ex[ex["term"] != ""]
    tc = ex.groupby(["doc_id", "term"], as_index=False).agg(tf=("term", "size"))
    top = (tc.sort_values(["doc_id", "tf", "term"], ascending=[True, False, True])
           .drop_duplicates("doc_id").reset_index(drop=True))
    dfreq = tc.groupby("term")["doc_id"].size()
    assert np.array_equal(got["doc_id"].to_numpy(), top["doc_id"].to_numpy())
    assert (got["term"].to_numpy() == top["term"].to_numpy()).all()
    assert np.array_equal(got["tf"].to_numpy(), top["tf"].to_numpy())
    assert np.array_equal(got["df"].to_numpy(),
                          dfreq.loc[top["term"]].to_numpy())


@needs_data
def test_semdedup_dropped_have_earlier_close_clustermate(ray_session):
    import ray.data as rd

    from deekseek_ocr___dockerized_api_ray.pipelines.curation import semdedup
    from deekseek_ocr___dockerized_api_ray.stages.similarity import lloyd_codebook

    thr = 0.4
    survivors = set(semdedup(SF, threshold=thr).to_pandas()["vec_id"])
    emb = pd.read_parquet(f"{SF}/embeddings.parquet").sort_values("vec_id")
    # recompute the SAME trained codebook assignment semdedup uses
    # (k=12 Lloyd, squared Euclidean, ties to the lowest cluster)
    cents = lloyd_codebook(
        rd.read_parquet(f"{SF}/embeddings.parquet",
                        columns=["vec_id", "embedding"]), 12, 2)
    raw = np.stack([np.asarray(v, dtype=np.float64)
                    for v in emb["embedding"]])
    d = ((raw[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
    emb = emb.assign(assigned_label=np.argmin(d, axis=1))
    dropped = [v for v in emb["vec_id"] if v not in survivors]
    assert dropped, "threshold 0.4 should prune planted near-dups"

    mat = np.stack([np.asarray(v, dtype=np.float64) for v in emb["embedding"]])
    mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    ids = emb["vec_id"].to_numpy()
    lab = emb["assigned_label"].to_numpy()
    by_id = {v: i for i, v in enumerate(ids)}
    for v in dropped:
        i = by_id[v]
        earlier = (ids < v) & (lab == lab[i])
        cos = mat[earlier] @ mat[i]
        cos = np.floor(np.abs(cos) * 1e6 + 0.5) / 1e6 * np.sign(cos)
        assert (cos > thr).any(), f"vec {v} dropped without a close earlier mate"


@needs_data
def test_bm25_zero_hit_docs_score_zero(ray_session):
    from deekseek_ocr___dockerized_api_ray.pipelines.curation import (
        _BM25_TERMS,
        doc_bm25,
    )

    df = doc_bm25(SF).to_pandas()
    docs = pd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    toks = docs["text"].str.split(" ")
    hits = toks.apply(lambda w: any(t in w for t in _BM25_TERMS))
    no_hit = set(docs.loc[~hits, "doc_id"])
    assert len(df) == len(docs)
    assert (df.loc[df["doc_id"].isin(no_hit), "bm25"] == 0.0).all()
    assert (df.loc[~df["doc_id"].isin(no_hit), "bm25"] > 0.0).all()
    # dl == non-empty token count
    dl_ref = toks.apply(lambda w: sum(1 for t in w if t != ""))
    merged = df.merge(pd.DataFrame({"doc_id": docs["doc_id"], "dl_ref": dl_ref}),
                      on="doc_id")
    assert (merged["dl"] == merged["dl_ref"]).all()


@needs_data
def test_duplicate_chunks_shape(ray_session):
    from deekseek_ocr___dockerized_api_ray.pipelines.curation import duplicate_chunks

    df = duplicate_chunks(SF).to_pandas()
    assert (df["n_docs"] >= 2).all()
    assert (df["n_occur"] >= df["n_docs"]).all()
    # every chunk is exactly 4 space-separated words
    assert (df["chunk"].str.split(" ").str.len() == 4).all()
    # first_doc is a real doc that contains the chunk
    docs = pd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    sample = df.head(20).merge(docs, left_on="first_doc", right_on="doc_id")
    for chunk, text in zip(sample["chunk"], sample["text"]):
        assert chunk in text


@needs_data
def test_pagerank_is_a_probability_distribution(ray_session):
    from deekseek_ocr___dockerized_api_ray.pipelines.curation import term_pagerank

    df = term_pagerank(SF).to_pandas()
    assert (df["pr"] > 0).all()
    # power iteration preserves total mass (symmetric graph, no dangling)
    assert abs(df["pr"].sum() - 1.0) < 1e-3
    # more iterations keep mass conserved too
    df4 = term_pagerank(SF, iters=4).to_pandas()
    assert abs(df4["pr"].sum() - 1.0) < 1e-3


@needs_data
def test_bpe_train_matches_single_process_reference(ray_session):
    """Differential: the distributed merge loop must produce the exact
    merge table a textbook single-process BPE produces."""
    from collections import Counter

    from deekseek_ocr___dockerized_api_ray.pipelines.curation import bpe_train

    got = bpe_train(SF, n_merges=8)

    docs = pd.read_parquet(f"{SF}/documents.parquet", columns=["text"])
    wf = Counter()
    for t in docs["text"]:
        for w in t.split(" "):
            if w:
                wf[w] += 1
    vocab = {w: list(w) + ["</w>"] for w in wf}
    ref = []
    for rank in range(8):
        pc = Counter()
        for w, syms in vocab.items():
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += wf[w]
        if not pc:
            break
        best = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        (a, b), freq = best
        ref.append((rank, a, b, freq))
        for w, syms in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b); i += 2
                else:
                    out.append(syms[i]); i += 1
            vocab[w] = out
    ref_df = pd.DataFrame(ref, columns=["rank", "left", "right", "freq"])
    pd.testing.assert_frame_equal(got.reset_index(drop=True), ref_df,
                                  check_dtype=False)


@needs_data
def test_doc_chunks_cover_and_overlap(ray_session):
    from deekseek_ocr___dockerized_api_ray.pipelines.curation import doc_chunks

    df = doc_chunks(SF, size=16, stride=12).to_pandas()
    docs = pd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    words = docs.set_index("doc_id")["text"].str.split(" ")
    lens = words.str.len()
    # every doc emits exactly (n-1)//stride + 1 chunks
    per_doc = df.groupby("doc_id").size()
    assert (per_doc == ((lens - 1) // 12 + 1)).all()
    # spot-check reassembly: concatenating stride-prefixes + final tail
    # reproduces the original token stream
    for doc_id in docs["doc_id"].head(5):
        g = df[df["doc_id"] == doc_id].sort_values("chunk_idx")
        toks = []
        chunks = g["chunk"].tolist()
        for ch in chunks[:-1]:
            toks.extend(ch.split(" ")[:12])
        toks.extend(chunks[-1].split(" "))
        assert toks == words.loc[doc_id]
    # overlap: consecutive chunks share size-stride tokens
    g = df[df["doc_id"] == docs["doc_id"].iloc[0]].sort_values("chunk_idx")
    if len(g) > 1:
        a = g["chunk"].iloc[0].split(" ")
        b = g["chunk"].iloc[1].split(" ")
        assert a[12:] == b[:len(a) - 12]


def test_dedup_chunks_global_c4_semantics(ray_session, tmp_path):
    """All occurrences of a repeated 4-word chunk are dropped (the C4
    rule), unique chunks and the <4-word tail survive in order, and a
    fully-duplicated doc reconstructs to its bare tail/empty string."""
    import pandas as pd

    from deekseek_ocr___dockerized_api_ray.pipelines.curation import (
        dedup_chunks_global,
    )

    dup = "a b c d"              # appears in docs 1 and 2 -> dropped everywhere
    docs = pd.DataFrame({
        "doc_id": [1, 2, 3, 4],
        "text": [
            f"{dup} e f g h tail1 tail2",   # unique chunk + 2-word tail kept
            f"{dup}",                       # only the dup chunk -> empty
            "p q r s",                      # unique chunk, no tail
            "x y",                          # no full chunk, tail only
        ],
    })
    docs.to_parquet(tmp_path / "documents.parquet")
    got = (dedup_chunks_global(str(tmp_path)).to_pandas()
           .set_index("doc_id").sort_index())
    assert got.loc[1, "dedup_text"] == "e f g h tail1 tail2"
    assert got.loc[1, "n_chunks"] == 2 and got.loc[1, "n_dropped"] == 1
    assert got.loc[2, "dedup_text"] == "" and got.loc[2, "n_dropped"] == 1
    assert got.loc[3, "dedup_text"] == "p q r s"
    assert got.loc[4, "dedup_text"] == "x y" and got.loc[4, "n_chunks"] == 0


def test_soft_dedup_keeps_uniques_and_thins_dups(ray_session, tmp_path):
    import pandas as pd

    from deekseek_ocr___dockerized_api_ray.functions.hashing import _hash64
    from deekseek_ocr___dockerized_api_ray.pipelines.curation import soft_dedup

    docs = pd.DataFrame({
        "doc_id": list(range(1, 9)),
        "text": ["dup"] * 4 + [f"unique {i}" for i in range(4)],
    })
    docs.to_parquet(tmp_path / "documents.parquet")
    got = soft_dedup(str(tmp_path)).to_pandas()
    # all unique docs survive with n_copies 1
    uniq = got[got["doc_id"] >= 5]
    assert len(uniq) == 4 and (uniq["n_copies"] == 1).all()
    # dup class survivors = exactly the ids passing the md5 gate
    expect = [d for d in range(1, 5) if _hash64(str(d)) % 4 == 0]
    assert sorted(got[got["doc_id"] < 5]["doc_id"]) == expect
    assert (got[got["doc_id"] < 5]["n_copies"] == 4).all()


def test_length_percentile_gate_threshold_is_order_statistic(ray_session,
                                                             tmp_path):
    import numpy as np
    import pandas as pd

    from deekseek_ocr___dockerized_api_ray.pipelines.curation import (
        length_percentile_gate,
    )

    lens = np.arange(10, 110)  # 100 docs, n_chars 10..109
    docs = pd.DataFrame({
        "doc_id": np.arange(100), "n_chars": lens,
        "text": ["x" * int(c) for c in lens],
    })
    docs.to_parquet(tmp_path / "documents.parquet")
    got = length_percentile_gate(str(tmp_path)).to_pandas()
    # ceil(0.1*100)=10th order statistic = 19 -> keep n_chars >= 19
    assert got["n_chars"].min() == 19 and len(got) == 91


def test_dsir_weights_match_brute_force(ray_session, tmp_path):
    import numpy as np
    import pandas as pd

    from deekseek_ocr___dockerized_api_ray.pipelines.curation import (
        dsir_importance_weights,
    )

    # 2 'en' (target) docs + 2 'de' docs over a 4-term vocabulary; one
    # doc carries only an out-of-vocab term when the cap bites (V=3)
    docs = pd.DataFrame({
        "doc_id": [0, 1, 2, 3, 4],
        "lang": ["en", "en", "de", "de", "de"],
        "text": ["alpha alpha beta", "alpha gamma", "beta beta gamma gamma",
                 "beta delta", "delta"],
    })
    docs.to_parquet(tmp_path / "documents.parquet")
    got = (dsir_importance_weights(str(tmp_path), max_vocab=3)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))

    # brute force: vocab = top-3 by corpus tf (beta 4, alpha 3, gamma 3;
    # delta 2 misses the cap)
    counts = {"beta": (1, 4), "alpha": (3, 3), "gamma": (1, 3)}
    n_t = sum(ct for ct, _ in counts.values())
    n_r = sum(cr for _, cr in counts.values())
    v = 3
    lw = {t: np.log((ct + 1.0) * (n_r + v)) - np.log((cr + 1.0) * (n_t + v))
          for t, (ct, cr) in counts.items()}
    expect = {
        0: 2 * lw["alpha"] + lw["beta"],
        1: lw["alpha"] + lw["gamma"],
        2: 2 * lw["beta"] + 2 * lw["gamma"],
        3: lw["beta"],
        # doc 4: only the OOV 'delta' -> dropped (no evidence)
    }
    assert got["doc_id"].tolist() == [0, 1, 2, 3]
    assert got["n_vocab_tokens"].tolist() == [3, 2, 4, 1]
    for _, r in got.iterrows():
        assert abs(r["logweight"] - expect[r["doc_id"]]) < 1e-6
    # directional: the all-target-heavy doc outranks the raw-heavy one
    w = dict(zip(got["doc_id"], got["logweight"]))
    assert w[0] > w[2]


@needs_data
def test_ppl_buckets_are_ntile_terciles_of_logprob(ray_session):
    from deekseek_ocr___dockerized_api_ray.pipelines.curation import ppl_buckets

    got = ppl_buckets(SF).to_pandas()
    n = len(got)
    b1 = (n + 2) // 3
    b2 = b1 + (n + 1) // 3
    sizes = got["bucket"].value_counts()
    assert sizes["tail"] == b1
    assert sizes["middle"] == b2 - b1
    assert sizes["head"] == n - b2
    # bucket order respects the (logprob, doc_id) total order
    s = got.sort_values(["logprob", "doc_id"]).reset_index(drop=True)
    ranks = {"tail": 0, "middle": 1, "head": 2}
    assert s["bucket"].map(ranks).is_monotonic_increasing
    # the head's worst score is >= the tail's best
    assert (got.loc[got["bucket"] == "head", "logprob"].min()
            >= got.loc[got["bucket"] == "tail", "logprob"].max())


def test_label_propagation_matches_networkless_reference(ray_session, tmp_path):
    """2-round min-label propagation on a hand-built graph: a path
    component and an isolated edge; round counts matter (the path is
    too long for every node to reach the min in 2 hops)."""
    import pandas as pd

    from deekseek_ocr___dockerized_api_ray.pipelines.curation import (
        term_label_propagation,
    )

    # doc-level co-occurrence builds the edges: docs define cliques
    docs = pd.DataFrame({
        "doc_id": [0, 1, 2, 3],
        "text": ["a b", "b c", "c d e", "x y"],
        # graph: a-b-c-(d,e clique), x-y
    })
    docs.to_parquet(tmp_path / "documents.parquet")
    got = term_label_propagation(str(tmp_path), rounds=2).to_pandas()
    lab = dict(zip(got["term"], got["label"]))
    # round 1: b->a, c->b, d->c, e->c, a->a, x->x, y->x
    # round 2: min over closed nbhd of round-1 labels
    #   a: min(a, l1(b)=a) = a;  b: min(a, a, b(c's l1=b)) = a
    #   c: min(b, l1(b)=a, l1(d)=c, l1(e)=c) = a
    #   d: min(c, l1(c)=b, l1(e)=c) = b;  e likewise b
    #   x, y: x
    assert lab == {"a": "a", "b": "a", "c": "a", "d": "b", "e": "b",
                   "x": "x", "y": "x"}
    # more rounds converge d/e to the component min
    got4 = term_label_propagation(str(tmp_path), rounds=4).to_pandas()
    lab4 = dict(zip(got4["term"], got4["label"]))
    assert lab4 == {"a": "a", "b": "a", "c": "a", "d": "a", "e": "a",
                    "x": "x", "y": "x"}


def test_quality_classifier_gate_brute_force(ray_session, tmp_path):
    """Weights and scores equal a single-process naive-Bayes log-odds
    recount on a tiny corpus with known lexical signal; the gate is
    discriminative and token-less docs score the bare prior."""
    import hashlib

    import numpy as np
    import pandas as pd

    from deekseek_ocr___dockerized_api_ray.pipelines.curation import (
        quality_classifier_gate,
    )

    docs = pd.DataFrame({
        "doc_id": range(8),
        "lang": ["en", "en", "en", "en", "de", "de", "de", "de"],
        "text": ["the cat sat", "the dog ran", "the cat ran the",
                 "", "der hund", "der katze der", "der der", "die katze"],
    })
    docs.to_parquet(tmp_path / "documents.parquet")
    D = 256
    got = (quality_classifier_gate(str(tmp_path), n_features=D)
           .to_pandas().set_index("doc_id"))

    def h64(s):
        return int.from_bytes(hashlib.md5(s.encode()).digest()[8:],
                              "little")

    from collections import Counter
    c_p, c_a = Counter(), Counter()
    for _, r in docs.iterrows():
        for t in r["text"].split(" "):
            if not t:
                continue
            b = h64(t) % D
            c_a[b] += 1
            if r["lang"] == "en":
                c_p[b] += 1
    n_p = sum(c_p.values())
    n_n = sum(c_a.values()) - n_p
    w = {b: np.log((c_p.get(b, 0) + 1.0) * (n_n + D))
         - np.log((c_a[b] - c_p.get(b, 0) + 1.0) * (n_p + D))
         for b in c_a}
    w0 = np.log(4 + 1.0) - np.log(4 + 1.0)  # balanced prior = 0
    for _, r in docs.iterrows():
        toks = [t for t in r["text"].split(" ") if t]
        s = w0 + sum(w[h64(t) % D] for t in toks)
        row = got.loc[r["doc_id"]]
        assert row["n_feat_tokens"] == len(toks)
        assert abs(row["score"] - s) < 2e-6
        assert bool(row["keep"]) == (round(s, 6) >= 0)
    # en docs keep, de docs drop (real lexical signal here)
    assert got.loc[[0, 1, 2], "keep"].all()
    assert not got.loc[[4, 5, 6, 7], "keep"].any()
    # token-less doc: bare prior (0 here) -> keep at threshold 0
    assert got.loc[3, "score"] == 0.0


def test_quality_gate_discriminative_on_testdata(ray_session):
    """On the sf corpus the gate keeps a strict subset with
    above-base-rate positive-class purity (it learned SOMETHING)."""
    import os

    import pandas as pd

    from deekseek_ocr___dockerized_api_ray.pipelines.curation import (
        quality_classifier_gate,
    )

    sf = "/root/testdata/sf0.001"
    if not os.path.isdir(sf):
        pytest.skip("driver testdata absent")
    got = quality_classifier_gate(sf).to_pandas()
    docs = pd.read_parquet(f"{sf}/documents.parquet",
                           columns=["doc_id", "lang"])
    j = got.merge(docs, on="doc_id")
    rate = j["keep"].mean()
    assert 0.0 < rate < 1.0, "gate must be discriminative"
    base = (j["lang"] == "en").mean()
    purity = (j.loc[j["keep"], "lang"] == "en").mean()
    assert purity > base


def test_source_unigram_kl_matches_local_reference(ray_session, tmp_path):
    """KL(P_source || P_corpus) equals a single-process pandas/numpy
    recompute with the same per-cell double-op order; sources identical
    to the blend score ~0, skewed sources score higher."""
    from deekseek_ocr___dockerized_api_ray.pipelines.curation import (
        source_unigram_kl,
    )

    rng = np.random.RandomState(3)
    vocab = [f"w{i}" for i in range(12)]
    rows = []
    for i in range(240):
        src = ["web", "books", "code"][i % 3]
        # "code" draws from a skewed distribution, others near-uniform
        p = (np.ones(12) / 12 if src != "code"
             else np.array([4.0] * 3 + [0.25] * 9) / (12.0 + 2.25 - 2.25))
        p = p / p.sum()
        words = rng.choice(vocab, size=30, p=p)
        rows.append({"doc_id": i, "text": " ".join(words), "source": src})
    docs = pd.DataFrame(rows)
    docs.to_parquet(tmp_path / "documents.parquet")

    got = source_unigram_kl(str(tmp_path)).to_pandas()

    ex = (docs.assign(term=docs["text"].str.split(" "))
          .loc[:, ["source", "term"]].explode("term"))
    ex = ex[ex["term"] != ""]
    cells = ex.groupby(["source", "term"], as_index=False).agg(
        tf=("term", "size"))
    ct = cells.groupby("term")["tf"].sum()
    n_s = cells.groupby("source")["tf"].sum()
    n = float(n_s.sum())
    for _, row in got.iterrows():
        src = row["source"]
        g = cells[cells["source"] == src]
        ps = g["tf"].to_numpy(dtype=np.float64) / float(n_s[src])
        pc = ct[g["term"]].to_numpy(dtype=np.float64) / n
        kl = float((ps * np.log(ps / pc)).sum())
        assert abs(row["kl_unigram"] - round(kl, 6)) < 2e-6, src
        assert row["n_tokens"] == int(n_s[src])
    kl_by = dict(zip(got["source"], got["kl_unigram"]))
    assert kl_by["code"] > kl_by["web"]
    assert kl_by["code"] > kl_by["books"]


def test_source_epoch_plan_conserves_budget(ray_session, tmp_path):
    """Weights sum to 1, target tokens sum to the budget, and epochs
    are target/n_tokens -- a source with more tokens gets a LOWER
    epoch count at alpha < 1 (the up/down-sampling direction)."""
    from deekseek_ocr___dockerized_api_ray.pipelines.curation import (
        source_epoch_plan,
    )

    docs = pd.DataFrame({
        "doc_id": range(60),
        "text": ["alpha beta"] * 50 + ["gamma delta eps zeta eta"] * 10,
        "source": ["big"] * 50 + ["small"] * 10,
    })
    docs.to_parquet(tmp_path / "documents.parquet")
    got = (source_epoch_plan(str(tmp_path), budget_tokens=1000)
           .to_pandas().set_index("source"))
    assert abs(got["weight"].sum() - 1.0) < 1e-5
    assert abs(got["target_tokens"].sum() - 1000.0) < 0.05
    for s in ("big", "small"):
        # target is rounded r2, epochs r6 -- consistency, not identity
        assert abs(got.loc[s, "epochs"]
                   - got.loc[s, "target_tokens"] / got.loc[s, "n_tokens"]) < 1e-3
    # big: 100 tokens, small: 50 -> sqrt weights 2:sqrt(2)... big still
    # gets more tokens but FEWER epochs per token mass
    assert got.loc["big", "target_tokens"] > got.loc["small", "target_tokens"]
    assert got.loc["big", "epochs"] < got.loc["small", "epochs"]


def test_hybrid_search_rrf_fuses_both_rankings(ray_session):
    """RRF output contains docs from BOTH legs, scores equal the
    reciprocal-rank algebra over the legs' own rankings, and a doc in
    both legs outranks same-rank single-leg docs."""
    import ray.data as rd

    from deekseek_ocr___dockerized_api_ray.pipelines.curation import (
        bm25_search_topk,
        hybrid_search_rrf,
    )
    from deekseek_ocr___dockerized_api_ray.stages.similarity import (
        brute_force_topk,
    )

    SF = "/root/testdata/sf0.001"
    got = hybrid_search_rrf(SF, k=10).to_pandas()
    lex = bm25_search_topk(SF, k=10)
    vec = brute_force_topk(
        rd.read_parquet(f"{SF}/embeddings.parquet"), [0], k=10).to_pandas()

    contrib = {}
    for d, r in zip(lex["doc_id"], lex["rk"]):
        contrib[int(d)] = contrib.get(int(d), 0.0) + 1.0 / (60 + int(r))
    for d, r in zip(vec["vec_id"], vec["rank"]):
        contrib[int(d)] = contrib.get(int(d), 0.0) + 1.0 / (60 + int(r))
    expect = sorted(contrib.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert [int(d) for d, _ in expect] == got["doc_id"].tolist()
    for (_, c), s in zip(expect, got["rrf_score"]):
        assert abs(round(c, 6) - s) < 1e-9
    assert set(got["doc_id"]) & set(lex["doc_id"].astype(int))
    assert set(got["doc_id"]) & set(vec["vec_id"].astype(int))


@needs_data
def test_decontaminate_bloom_path_equivalence(ray_session):
    """The Bloom-pruned exact-verify path emits EXACTLY the exact
    broadcast path's rows (no false negatives by the Bloom property;
    false positives die in the verify join) -- including with a tiny
    filter whose high FP rate floods the verify join with candidates."""
    from deekseek_ocr___dockerized_api_ray.pipelines.curation import (
        decontaminate,
        decontaminate_bloom,
    )

    exact = (decontaminate(SF).to_pandas()
             .sort_values("doc_id").reset_index(drop=True))
    for m_bits in (1 << 22, 1 << 12):  # healthy filter; saturated filter
        bloom = (decontaminate_bloom(SF, m_bits=m_bits).to_pandas()
                 .sort_values("doc_id").reset_index(drop=True))
        pd.testing.assert_frame_equal(
            exact, bloom[exact.columns], check_dtype=False)


@needs_data
def test_cdc_duplicate_chunks_matches_local_reference(ray_session):
    """The distributed CDC chunker equals a per-doc local recompute with
    the same boundary rule (md5_number_lower(3-gram) % 8 == 0 closes a
    chunk), and boundaries are content-defined: identical word suffixes
    in different docs chunk identically past the first k-1 words."""
    from deekseek_ocr___dockerized_api_ray.functions.hashing import _hash64
    from deekseek_ocr___dockerized_api_ray.pipelines.curation import (
        cdc_duplicate_chunks,
    )

    got = cdc_duplicate_chunks(SF).to_pandas().reset_index(drop=True)

    docs = pd.read_parquet(f"{SF}/documents.parquet",
                           columns=["doc_id", "text"])
    rows = []
    for doc_id, text in zip(docs["doc_id"], docs["text"]):
        words = text.split()
        chunks, cur = [], []
        for i, w in enumerate(words):
            cur.append(w)
            if i >= 2 and _hash64(" ".join(words[i - 2:i + 1])) % 8 == 0:
                chunks.append(" ".join(cur))
                cur = []
        if cur:
            chunks.append(" ".join(cur))
        rows += [(c, doc_id) for c in chunks]
    ref = pd.DataFrame(rows, columns=["chunk", "doc_id"])
    agg = (ref.groupby("chunk")
           .agg(n_occur=("doc_id", "size"), n_docs=("doc_id", "nunique"),
                first_doc=("doc_id", "min"))
           .reset_index())
    agg = (agg[agg["n_docs"] >= 2].sort_values("chunk")
           .reset_index(drop=True))
    pd.testing.assert_frame_equal(
        got, agg.astype({"n_occur": "int64", "n_docs": "int64",
                         "first_doc": "int64"}))
    # expected chunk length ~ divisor words; nothing pathological
    assert (got["chunk"].str.split(" ").str.len() >= 1).all()
    assert len(got) > 0


def _naive_winnow(text: str, k: int = 3, w: int = 4):
    """Straight-from-the-paper winnowing: hash every word k-gram, slide
    a w-window, select the rightmost minimum per window."""
    from deekseek_ocr___dockerized_api_ray.functions.hashing import _hash64

    words = text.split()
    if len(words) < k:
        return set(), 0
    hs = [_hash64(" ".join(words[i:i + k]))
          for i in range(len(words) - k + 1)]
    sel = set()
    if len(hs) < w:
        m = min(hs)
        sel.add(max(i for i, h in enumerate(hs) if h == m))
    else:
        for j in range(len(hs) - w + 1):
            win = hs[j:j + w]
            m = min(win)
            sel.add(j + max(i for i, h in enumerate(win) if h == m))
    return {hs[p] for p in sel}, len(hs)


@needs_data
def test_winnowing_fingerprints_matches_naive(ray_session):
    """The vectorized flat-array winnowing equals the per-doc textbook
    loop, and density stays near the paper's 2/(w+1) expectation."""
    from deekseek_ocr___dockerized_api_ray.pipelines.curation import (
        winnowing_fingerprints,
    )

    got = winnowing_fingerprints(SF).to_pandas()
    docs = pd.read_parquet(f"{SF}/documents.parquet",
                           columns=["doc_id", "text"])
    ref = []
    for doc_id, text in zip(docs["doc_id"], docs["text"]):
        fps, ng = _naive_winnow(text)
        if ng:
            ref.append((doc_id, ng, len(fps), round(len(fps) / ng, 6)))
    ref = pd.DataFrame(ref, columns=["doc_id", "n_grams", "n_fp",
                                     "density"]).sort_values("doc_id")
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True),
        ref.reset_index(drop=True).astype(
            {"n_grams": "int64", "n_fp": "int64"}),
        check_dtype=False, atol=1e-9)
    # winnowing guarantee: at least one selection per window; density
    # for random input concentrates near 2/(w+1) = 0.4
    assert 0.1 < got["density"].mean() < 0.8


@needs_data
def test_winnowing_pairs_matches_naive(ray_session):
    """The distributed fp-bucketed pair expansion equals a local
    recompute from the naive per-doc fingerprint sets (df gate
    included), and every pair is ordered doc_a < doc_b."""
    from collections import Counter, defaultdict

    from deekseek_ocr___dockerized_api_ray.pipelines.curation import (
        winnowing_pairs,
    )

    got = winnowing_pairs(SF).to_pandas()
    docs = pd.read_parquet(f"{SF}/documents.parquet",
                           columns=["doc_id", "text"])
    holders = defaultdict(list)
    for doc_id, text in zip(docs["doc_id"], docs["text"]):
        fps, _ = _naive_winnow(text)
        for h in fps:
            holders[h].append(doc_id)
    shared = Counter()
    for h, ds_ in holders.items():
        if len(ds_) > 20:           # max_df boilerplate gate
            continue
        ds_ = sorted(ds_)
        for x in range(len(ds_)):
            for y in range(x + 1, len(ds_)):
                shared[(ds_[x], ds_[y])] += 1
    ref = (pd.DataFrame([(a, b, n) for (a, b), n in shared.items()
                         if n >= 2],
                        columns=["doc_a", "doc_b", "n_shared"])
           .sort_values(["doc_a", "doc_b"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(got.reset_index(drop=True), ref,
                                  check_dtype=False)
    assert (got["doc_a"] < got["doc_b"]).all()


def test_winnow_selected_short_doc_edge():
    """A doc with fewer grams than the window width selects exactly the
    rightmost minimum of all its grams; a doc below k words is
    excluded."""
    from deekseek_ocr___dockerized_api_ray.functions.hashing import _hash64
    from deekseek_ocr___dockerized_api_ray.pipelines.curation import (
        _winnow_selected,
    )

    short = "alpha beta gamma delta"            # 2 grams < w=4
    tiny = "alpha beta"                         # < k words: no grams
    df = pd.DataFrame({"doc_id": [7, 8], "text": [short, tiny]})
    out = _winnow_selected(df, 3, 4)
    assert set(out["doc_id"]) == {7}
    hs = [_hash64("alpha beta gamma"), _hash64("beta gamma delta")]
    m = min(hs)
    want = {hs[max(i for i, h in enumerate(hs) if h == m)]}
    assert set(out["fp"]) == want
    assert out["n_grams"].tolist() == [2]


def test_bm25_prf_expansion_and_rerank(ray_session):
    """bm25_prf_search == doc_bm25 re-ranked over base + the expansion a
    naive driver-side Rocchio recompute picks; the expansion is disjoint
    from the base query and ranks are 1..k."""
    import numpy as np
    import pyarrow.parquet as pq

    from deekseek_ocr___dockerized_api_ray.functions.rounding import (
        round_half_away,
    )
    from deekseek_ocr___dockerized_api_ray.pipelines.curation import (
        _BM25_TERMS,
        _ranked_topk,
        bm25_prf_search,
        bm25_search_topk,
        doc_bm25,
    )

    k, f, e = 10, 5, 3
    got = bm25_prf_search(SF, k=k, f=f, e=e)
    assert got["rk"].tolist() == list(range(1, k + 1))

    # naive Rocchio: feedback top-f -> tf x idf weights -> top-e terms
    fb_ids = set(bm25_search_topk(SF, k=f)["doc_id"].astype(int))
    t = pq.read_table(f"{SF}/documents.parquet",
                      columns=["doc_id", "text"]).to_pylist()
    n_docs = len(t)
    cand_tf, docs_of = {}, {}
    for r in t:
        toks = [w for w in r["text"].split(" ") if w]
        for w in set(toks):
            docs_of.setdefault(w, set()).add(r["doc_id"])
        if r["doc_id"] in fb_ids:
            for w in toks:
                if w not in _BM25_TERMS:
                    cand_tf[w] = cand_tf.get(w, 0) + 1
    weights = sorted(
        ((round_half_away(
            tf * float(np.log(1.0 + (n_docs - len(docs_of[w]) + 0.5)
                              / (len(docs_of[w]) + 0.5))), 6), w)
         for w, tf in cand_tf.items()),
        key=lambda x: (-x[0], x[1]))
    expansion = tuple(w for _, w in weights[:e])
    assert expansion and not set(expansion) & set(_BM25_TERMS)
    want = _ranked_topk(doc_bm25(SF, terms=_BM25_TERMS + expansion), k)
    assert got[["doc_id", "dl", "bm25", "rk"]].values.tolist() == \
        want[["doc_id", "dl", "bm25", "rk"]].values.tolist()


def test_gate_agreement_matrix_consistent_with_gates(ray_session):
    """Pair counts equal a driver-side recompute from the four gate
    pipelines' own keep vectors; jaccard = both / union."""
    from deekseek_ocr___dockerized_api_ray.functions.rounding import (
        round_half_away,
    )
    from deekseek_ocr___dockerized_api_ray.pipelines.c4 import (
        badword_gate,
        c4_filter,
    )
    from deekseek_ocr___dockerized_api_ray.pipelines.curation import (
        gate_agreement_matrix,
        quality_classifier_gate,
    )
    from deekseek_ocr___dockerized_api_ray.pipelines.text import gopher_gate

    got = gate_agreement_matrix(SF).to_pandas()
    flags = {}
    for name, op in (("badword", badword_gate), ("c4", c4_filter),
                     ("classifier", quality_classifier_gate),
                     ("gopher", gopher_gate)):
        df = op(SF).to_pandas()
        flags[name] = dict(zip(df["doc_id"].astype(int),
                               df["keep"].astype(bool)))
    names = sorted(flags)
    docs = set(flags[names[0]])
    assert all(set(f) == docs for f in flags.values())
    assert len(got) == 6
    for _, row in got.iterrows():
        a, b = row["gate_a"], row["gate_b"]
        ka = {d for d in docs if flags[a][d]}
        kb = {d for d in docs if flags[b][d]}
        assert int(row["n_keep_a"]) == len(ka)
        assert int(row["n_keep_b"]) == len(kb)
        assert int(row["n_keep_both"]) == len(ka & kb)
        u = len(ka | kb)
        assert row["jaccard"] == (round_half_away(len(ka & kb) / u, 6)
                                  if u else 0.0)


def test_quality_gate_funnel_monotone_and_consistent(ray_session):
    """Funnel counts are monotone non-increasing, stage 0 is the corpus
    size, and each stage equals the cumulative AND of the gate keeps."""
    from deekseek_ocr___dockerized_api_ray.pipelines.c4 import (
        badword_gate,
        c4_filter,
    )
    from deekseek_ocr___dockerized_api_ray.pipelines.curation import (
        quality_classifier_gate,
        quality_gate_funnel,
    )
    from deekseek_ocr___dockerized_api_ray.pipelines.text import gopher_gate

    got = quality_gate_funnel(SF).to_pandas().sort_values("stage")
    keeps = {}
    for name, op in (("badword", badword_gate), ("c4", c4_filter),
                     ("classifier", quality_classifier_gate),
                     ("gopher", gopher_gate)):
        df = op(SF).to_pandas()
        keeps[name] = {int(d) for d, k in zip(df["doc_id"], df["keep"])
                       if k}
        all_docs = set(df["doc_id"].astype(int))
    alive = set(all_docs)
    assert int(got.iloc[0]["n_docs"]) == len(all_docs)
    for i, g in enumerate(("gopher", "c4", "badword", "classifier"), 1):
        alive &= keeps[g]
        row = got[got["stage"] == i].iloc[0]
        assert row["gate"] == g and int(row["n_docs"]) == len(alive)
    ns = got["n_docs"].tolist()
    assert all(a >= b for a, b in zip(ns, ns[1:]))


def test_unimax_waterfill_invariants(ray_session, tmp_path):
    """unimax_mixing_plan vs a hand-computed waterfill on a 3-source
    corpus where one source is too small to absorb the fair share: its
    surplus must redistribute to the larger sources, nothing may exceed
    its epoch cap, and the whole budget is spent when capacity allows."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from deekseek_ocr___dockerized_api_ray.pipelines.curation import (
        unimax_mixing_plan,
    )

    # sources with 2 / 10 / 30 tokens per doc-set
    rows = (
        [("a", "w w")]                        # 2 tokens
        + [("b", "w w w w w")] * 2            # 10 tokens
        + [("c", "w w w w w w")] * 5          # 30 tokens
    )
    t = pa.Table.from_arrays(
        [pa.array([f"d{i}" for i in range(len(rows))]),
         pa.array([s for s, _ in rows]),
         pa.array([x for _, x in rows])],
        names=["doc_id", "source", "text"],
    )
    pq.write_table(t, tmp_path / "documents.parquet")

    out = (unimax_mixing_plan(str(tmp_path), budget_tokens=100,
                              epoch_cap=4)
           .to_pandas().set_index("source"))
    # caps: a=8, b=40, c=120; ascending visit a,b,c with budget 100:
    #   a: min(8, 100//3=33) = 8, rem 92
    #   b: min(40, 92//2=46) = 40, rem 52
    #   c: min(120, 52//1)   = 52
    assert int(out.loc["a", "alloc_tokens"]) == 8
    assert int(out.loc["b", "alloc_tokens"]) == 40
    assert int(out.loc["c", "alloc_tokens"]) == 52
    assert int(out["alloc_tokens"].sum()) == 100
    assert (out["alloc_tokens"] <= out["cap_tokens"]).all()
    assert float(out.loc["a", "epochs"]) == 4.0


def test_curriculum_plan_matches_naive(ray_session):
    """curriculum_plan == naive NTILE-over-score + within-stage hash
    rank recomputed in-process from the gate's own output."""
    import numpy as np
    import pandas as pd

    from deekseek_ocr___dockerized_api_ray.functions.hashing import _hash64
    from deekseek_ocr___dockerized_api_ray.pipelines.curation import (
        curriculum_plan,
        quality_classifier_gate,
    )

    sf = "/root/testdata/sf0.001"
    got = curriculum_plan(sf, n_stages=4, seed=42).to_pandas()

    g = (quality_classifier_gate(sf)
         .select_columns(["doc_id", "score"]).to_pandas())
    g = g.sort_values(["score", "doc_id"],
                      ascending=[False, True]).reset_index(drop=True)
    n, k = len(g), 4
    sizes = [n // k + (1 if i < n % k else 0) for i in range(k)]
    g["stage"] = np.repeat(np.arange(k), sizes)
    g["h"] = [np.uint64(_hash64(f"42:{int(d)}")) for d in g["doc_id"]]
    g = g.sort_values(["stage", "h", "doc_id"]).reset_index(drop=True)
    g["pos"] = g.groupby("stage").cumcount()
    want = g[["doc_id", "stage", "pos", "score"]] \
        .sort_values("doc_id").reset_index(drop=True)
    for c in ("doc_id", "stage", "pos"):
        want[c] = want[c].astype("int64")

    pd.testing.assert_frame_equal(
        got.sort_values("doc_id").reset_index(drop=True), want)
    # positions are dense 0..size-1 per stage
    for s, grp in got.groupby("stage"):
        assert sorted(grp["pos"]) == list(range(len(grp)))


def test_dedup_agreement_matrix_composes_legs(ray_session):
    """The matrix's counts must equal set algebra over the four dedup
    pipelines' own keep sets (composition, not re-derivation)."""
    import ray.data as rd

    from deekseek_ocr___dockerized_api_ray.pipelines.curation import (
        dedup_agreement_matrix,
    )
    from deekseek_ocr___dockerized_api_ray.pipelines.text import exact_dedup_docs
    from deekseek_ocr___dockerized_api_ray.stages.dedup import (
        minhash_dedup,
        prefix_filter_ngram_pairs,
        simhash_dedup,
        survivors_from_pairs,
    )

    sf = "/root/testdata/sf0.001"
    got = dedup_agreement_matrix(sf).to_pandas()
    assert len(got) == 6

    def docs():
        return rd.read_parquet(f"{sf}/documents.parquet")

    keep = {
        "exact": set(exact_dedup_docs(sf).to_pandas()["doc_id"]),
        "minhash": set(minhash_dedup(docs(), threshold=0.8)
                       .to_pandas()["doc_id"]),
        "ngram": set(survivors_from_pairs(
            docs(), prefix_filter_ngram_pairs(docs(), threshold=0.3, n=3))
            .to_pandas()["doc_id"]),
        "simhash": set(simhash_dedup(docs(), max_hamming=3)
                       .to_pandas()["doc_id"]),
    }
    for _, r in got.iterrows():
        a, b = keep[r["method_a"]], keep[r["method_b"]]
        assert int(r["n_keep_a"]) == len(a)
        assert int(r["n_keep_b"]) == len(b)
        assert int(r["n_keep_both"]) == len(a & b)
        assert 0.0 < float(r["jaccard"]) <= 1.0
