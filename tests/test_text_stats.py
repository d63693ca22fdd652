"""Text-analysis primitives + the agg helper."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from deekseek_ocr___dockerized_api_ray.functions.rounding import (
    round_half_away,
    round_series,
)
from deekseek_ocr___dockerized_api_ray.functions.text_stats import (
    bpe_token_count,
    detect_language,
    md5_fingerprint,
    normalize_for_fingerprint,
    quality_metrics,
    rolling_fingerprint,
    sha1_64,
    token_count,
)


def test_token_count():
    assert token_count("one two  three\nfour") == 4
    assert token_count("") == 0
    assert token_count("   ") == 0


def test_bpe_token_count():
    assert bpe_token_count("it's a test-case 123") >= 6
    assert bpe_token_count("") == 0


def test_quality_metrics():
    m = quality_metrics("the cat, and dog.")
    assert m["n_chars"] == 17
    assert m["n_tokens"] == 4
    assert m["punct_ratio"] == round_half_away(2 / 17, 6)
    assert m["stopword_ratio"] == round_half_away(2 / 4, 6)
    empty = quality_metrics("")
    assert empty["avg_token_len"] == 0.0


def test_detect_language():
    assert detect_language("the cat and the dog went to the park in the morning") == "en"
    assert detect_language("der Hund und die Katze sind nicht mit der Maus im Haus") == "de"
    assert detect_language("le chat et le chien sont dans la maison avec les enfants") == "fr"
    assert detect_language("el perro y el gato no las casas por una ventana") == "es"
    assert detect_language("今天天气很好我们一起去公园散步吧") == "zh"
    assert detect_language("") == "und"
    assert detect_language("12345 67890 !!!") == "und"


def test_fingerprints():
    assert normalize_for_fingerprint("  A\tB\nC ") == " a b c "
    assert md5_fingerprint("A  b") == md5_fingerprint("a b")
    assert md5_fingerprint("x") != md5_fingerprint("y")
    assert rolling_fingerprint("abc") == rolling_fingerprint("ABC")
    assert rolling_fingerprint("abc") != rolling_fingerprint("abd")
    assert sha1_64("x") != sha1_64("y")


def test_round_half_away_matches_duckdb():
    import duckdb

    vals = [0.125, 0.135, 2.675, -0.125, 1.0005, 0.0000005, 123.456789]
    for v in vals:
        for d in (2, 6):
            got = round_half_away(v, d)
            exp = duckdb.sql(f"SELECT ROUND(CAST({v!r} AS DOUBLE), {d})").fetchone()[0]
            assert got == exp, (v, d, got, exp)
    s = round_series(pd.Series(vals), 2)
    for v, r in zip(vals, s):
        assert r == round_half_away(v, 2)


def test_grouped_agg_matches_pandas(ray_session):
    import ray.data as rd

    from deekseek_ocr___dockerized_api_ray.stages.agg import grouped_agg

    rng = np.random.RandomState(3)
    df = pd.DataFrame(
        {
            "k1": rng.randint(0, 7, 5000),
            "k2": rng.choice(["x", "y", "z"], 5000),
            "v": rng.normal(size=5000),
        }
    )
    ds = rd.from_pandas(df).repartition(8)
    out = (
        grouped_agg(ds, ["k1", "k2"], {"s": ("v", "sum"), "n": ("v", "size"),
                                       "mx": ("v", "max")})
        .to_pandas()
        .sort_values(["k1", "k2"])
        .reset_index(drop=True)
    )
    exp = (
        df.groupby(["k1", "k2"], as_index=False)
        .agg(s=("v", "sum"), n=("v", "size"), mx=("v", "max"))
        .sort_values(["k1", "k2"])
        .reset_index(drop=True)
    )
    assert len(out) == len(exp)
    assert (out["n"].to_numpy() == exp["n"].to_numpy()).all()
    assert np.allclose(out["s"].to_numpy(), exp["s"].to_numpy())
    assert np.allclose(out["mx"].to_numpy(), exp["mx"].to_numpy())


def test_hll_accuracy_and_merge():
    from deekseek_ocr___dockerized_api_ray.functions.sketch import HyperLogLog

    h = HyperLogLog(12)
    h.add_many(str(i) for i in range(10_000))
    assert abs(h.estimate() - 10_000) / 10_000 < 0.05

    # merge(a, b) == sketch of the union
    a, b = HyperLogLog(12), HyperLogLog(12)
    a.add_many(str(i) for i in range(5_000))
    b.add_many(str(i) for i in range(2_500, 7_500))
    merged = a.merge(b)
    assert abs(merged.estimate() - 7_500) / 7_500 < 0.05

    # serialize round-trip preserves the estimate exactly
    rt = HyperLogLog.deserialize(merged.serialize(), 12)
    assert rt.estimate() == merged.estimate()

    # small-cardinality regime (linear counting) is near-exact
    s = HyperLogLog(12)
    s.add_many(str(i) for i in range(50))
    assert abs(s.estimate() - 50) < 3


def test_repetition_metrics():
    from deekseek_ocr___dockerized_api_ray.functions.text_stats import (
        repetition_metrics,
    )

    m = repetition_metrics("a b\na b\nc d c d c d")
    # 3 lines, 2 distinct -> 1/3; dup chars = 3 of 17 line chars;
    # top 2-gram "c d" occurs 3x (len 3) over 19 text chars
    assert m["dup_line_frac"] == 0.333333
    assert m["dup_line_char_frac"] == round(3 / 17, 6)
    assert m["top_2gram_char_frac"] == round(9 / 19, 6)
    assert repetition_metrics("") == {
        "dup_line_frac": 0.0, "dup_line_char_frac": 0.0, "top_2gram_char_frac": 0.0,
    }
    # tie on count -> lexicographically smallest gram wins (deterministic)
    t = repetition_metrics("b a a b")
    assert t["top_2gram_char_frac"] == round(1 * 3 / 7, 6)


def test_scrub_pii():
    from deekseek_ocr___dockerized_api_ray.functions.text_stats import scrub_pii

    r = scrub_pii("mail me at a.b+c@example.org or visit https://ex.com/a?b=1 "
                  "or call +1 (555) 123-4567 now")
    assert r["scrubbed"] == "mail me at <EMAIL> or visit <URL> or call <PHONE> now"
    assert (r["n_urls"], r["n_emails"], r["n_phones"]) == (1, 1, 1)
    # email inside a URL scrubs as part of the URL (URL-first order)
    r2 = scrub_pii("see https://x.com/mail?to=a@b.co end")
    assert r2["scrubbed"] == "see <URL> end"
    assert (r2["n_urls"], r2["n_emails"], r2["n_phones"]) == (1, 0, 0)
    assert scrub_pii("nothing here") == {
        "scrubbed": "nothing here", "n_urls": 0, "n_emails": 0, "n_phones": 0,
    }


def test_per_key_sample_deterministic_and_bounded(ray_session):
    import pandas as pd

    from deekseek_ocr___dockerized_api_ray.pipelines.text import per_key_sample

    sf = "/root/testdata/sf0.001"
    got = per_key_sample(sf, n=5).to_pandas()
    again = per_key_sample(sf, n=5).to_pandas()
    pd.testing.assert_frame_equal(got.reset_index(drop=True),
                                  again.reset_index(drop=True))
    docs = pd.read_parquet(f"{sf}/documents.parquet",
                           columns=["doc_id", "source"])
    sizes = docs.groupby("source").size()
    per_key = got.groupby("source").size()
    for key, n in per_key.items():
        assert n == min(5, sizes[key])


def test_weighted_sample_matches_local_aes(ray_session):
    """Engine A-ES selection == an independent local computation of the
    same seedless keys; higher weights must be overrepresented."""
    import numpy as np
    import pandas as pd

    from deekseek_ocr___dockerized_api_ray.functions.hashing import _hash64
    from deekseek_ocr___dockerized_api_ray.pipelines.text import weighted_sample

    sf = "/root/testdata/sf0.001"
    got = weighted_sample(sf, k=50).to_pandas()
    docs = pd.read_parquet(f"{sf}/documents.parquet",
                           columns=["doc_id", "n_chars"])
    h = np.asarray([float(_hash64(str(int(d)))) for d in docs["doc_id"]])
    u = (h + 0.5) / 2.0 ** 64
    key = -np.log(u) / docs["n_chars"].to_numpy(dtype=np.float64)
    order = np.lexsort((docs["doc_id"].to_numpy(), key))[:50]
    expect = set(docs["doc_id"].to_numpy()[order].tolist())
    assert set(got["doc_id"]) == expect
    # weight bias: sampled docs should skew longer than the corpus mean
    assert got["n_chars"].mean() > docs["n_chars"].mean()


def test_inverted_index_invariants(ray_session):
    import pandas as pd

    from deekseek_ocr___dockerized_api_ray.pipelines.text import inverted_index

    sf = "/root/testdata/sf0.001"
    idx = inverted_index(sf).to_pandas()
    docs = pd.read_parquet(f"{sf}/documents.parquet",
                           columns=["doc_id", "text"])
    assert (idx["postings"].str.count(",") + 1 == idx["df"]).all()
    # spot-check 3 terms against a pandas recomputation
    for _, row in idx.head(3).iterrows():
        member = docs[docs["text"].str.split().apply(
            lambda ws, t=row["term"]: t in ws)]
        assert row["postings"] == ",".join(
            str(v) for v in sorted(member["doc_id"]))


def test_bigram_lm_score_caps_and_shape(ray_session):
    import pandas as pd

    from deekseek_ocr___dockerized_api_ray.pipelines.text import bigram_lm_score

    sf = "/root/testdata/sf0.001"
    capped = bigram_lm_score(sf, max_bigrams=150, max_contexts=24).to_pandas()
    uncapped = bigram_lm_score(sf).to_pandas()
    docs = pd.read_parquet(f"{sf}/documents.parquet",
                           columns=["doc_id", "text"])
    ntok = docs.set_index("doc_id")["text"].str.split().str.len()
    for _, r in capped.head(20).iterrows():
        assert r["n_bigrams"] == ntok[r["doc_id"]] - 1
    # the caps must actually engage (916 bigrams / 31 contexts in data)
    assert not capped["lm_score"].equals(uncapped["lm_score"])
    # floored contexts only ever over-penalize
    m = capped.merge(uncapped, on="doc_id", suffixes=("_c", "_u"))
    assert (m["lm_score_c"] <= m["lm_score_u"] + 1e-9).all()


def test_phrase_search_matches_regex_scan(ray_session):
    """The positional intersection equals a word-split sliding scan,
    incl. multi-occurrence counts and 3-word phrases."""
    import numpy as np
    import pandas as pd

    import os

    from deekseek_ocr___dockerized_api_ray.pipelines.text import phrase_search

    sf = "/root/testdata/sf0.001"
    if not os.path.isdir(sf):
        pytest.skip("driver testdata absent")
    for phrase in ["table hash", "the fast key"]:
        got = phrase_search(sf, phrase=phrase).to_pandas()
        docs = pd.read_parquet(f"{sf}/documents.parquet",
                               columns=["doc_id", "text"])
        words = phrase.split(" ")
        exp = {}
        for _, r in docs.iterrows():
            toks = r["text"].split(" ")
            hits = [i + 1 for i in range(len(toks) - len(words) + 1)
                    if toks[i:i + len(words)] == words]
            if hits:
                exp[int(r["doc_id"])] = (len(hits), hits[0])
        assert dict(zip(got["doc_id"],
                        zip(got["n_matches"], got["first_pos"]))) == exp, phrase
        assert got["doc_id"].is_monotonic_increasing


def test_gopher_gate_flags_are_the_rule_conjunction(ray_session):
    import os

    import pandas as pd

    from deekseek_ocr___dockerized_api_ray.functions.text_stats import (
        quality_metrics,
        repetition_metrics,
    )
    from deekseek_ocr___dockerized_api_ray.pipelines.text import gopher_gate

    sf = "/root/testdata/sf0.001"
    if not os.path.isdir(sf):
        pytest.skip("driver testdata absent")
    got = gopher_gate(sf).to_pandas().set_index("doc_id")
    docs = pd.read_parquet(f"{sf}/documents.parquet",
                           columns=["doc_id", "text"])
    n_keep = int(got["keep"].sum())
    assert 0 < n_keep < len(got), "gate must be discriminative"
    rules = ["r_tokens", "r_wordlen", "r_punct", "r_stop",
             "r_dupline", "r_dupchar", "r_top2"]
    assert (got["keep"] == got[rules].all(axis=1)).all()
    for _, r in docs.head(80).iterrows():
        q, rep = quality_metrics(r["text"]), repetition_metrics(r["text"])
        row = got.loc[r["doc_id"]]
        assert bool(row["r_tokens"]) == (30 <= q["n_tokens"] <= 100000)
        assert bool(row["r_stop"]) == (q["stopword_ratio"] >= 0.02)
        assert bool(row["r_top2"]) == (rep["top_2gram_char_frac"] <= 0.18)


def test_tokenizer_fertility_matches_regex_recount(ray_session):
    import os
    import re

    import pandas as pd

    from deekseek_ocr___dockerized_api_ray.pipelines.text import (
        tokenizer_fertility,
    )

    sf = "/root/testdata/sf0.001"
    if not os.path.isdir(sf):
        pytest.skip("driver testdata absent")
    got = tokenizer_fertility(sf).to_pandas().set_index("lang")
    docs = pd.read_parquet(f"{sf}/documents.parquet",
                           columns=["lang", "text"])
    sub = re.compile(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]")
    ws = re.compile(r"\S+")
    for lang, g in docs.groupby("lang"):
        n_w = sum(len(ws.findall(t)) for t in g["text"])
        n_s = sum(len(sub.findall(t)) for t in g["text"])
        row = got.loc[lang]
        assert row["n_words"] == n_w and row["n_subtokens"] == n_s
        assert abs(row["fertility"] - n_s / n_w) < 1e-6
    # fertility >= 1: the pre-tok split never merges whitespace words
    assert (got["fertility"] >= 1.0).all()


def test_tokenizer_fertility_zero_word_language(ray_session, tmp_path):
    """A language whose docs contain no \\S+ tokens must yield 0.0
    ratios, not NaN/inf (ADVICE r4: division-by-zero guard, mirrored
    by CASE WHEN in the oracle)."""
    import pandas as pd

    from deekseek_ocr___dockerized_api_ray.pipelines.text import (
        tokenizer_fertility,
    )

    pd.DataFrame({
        "doc_id": [0, 1, 2],
        "lang": ["zz", "zz", "en"],
        "text": ["", "  \n\t ", "hello world"],
    }).to_parquet(tmp_path / "documents.parquet")
    got = tokenizer_fertility(str(tmp_path)).to_pandas().set_index("lang")
    assert got.loc["zz", "n_words"] == 0
    assert got.loc["zz", "fertility"] == 0.0
    assert got.loc["zz", "chars_per_subtoken"] == 0.0
    assert got.loc["en", "fertility"] == 1.0


def test_doc_readability_matches_naive(ray_session):
    import os
    import re

    import pandas as pd

    from deekseek_ocr___dockerized_api_ray.pipelines.text import doc_readability

    sf = "/root/testdata/sf0.001"
    if not os.path.isdir(sf):
        pytest.skip("driver testdata absent")
    got = doc_readability(sf).to_pandas().set_index("doc_id").sort_index()
    docs = pd.read_parquet(f"{sf}/documents.parquet", columns=["doc_id", "text"])
    ws = re.compile(r"\S+")
    sent = re.compile(r"[.!?]+")
    vow = re.compile(r"[aeiouy]+")
    for doc_id, t in zip(docs["doc_id"], docs["text"]):
        w = len(ws.findall(t))
        s = max(len(sent.findall(t)), 1)
        y = len(vow.findall(t.lower()))
        row = got.loc[doc_id]
        assert row["n_words"] == w
        assert row["n_sentences"] == s
        assert row["n_syllables"] == y
        if w > 0:
            assert row["flesch"] == round_half_away(
                206.835 - 1.015 * (w / s) - 84.6 * (y / w), 6)
            assert row["fk_grade"] == round_half_away(
                0.39 * (w / s) + 11.8 * (y / w) - 15.59, 6)
        else:
            assert row["flesch"] == 0.0 and row["fk_grade"] == 0.0


def test_doc_readability_edge_cases(ray_session, tmp_path):
    """Zero-word docs emit 0.0 scores (not NaN/inf); fragments without
    sentence punctuation use the min-1 sentence denominator; vowel-free
    text yields 0 syllables but finite scores."""
    import pandas as pd

    from deekseek_ocr___dockerized_api_ray.pipelines.text import doc_readability

    pd.DataFrame({
        "doc_id": [0, 1, 2, 3],
        "text": ["", "no sentence punctuation here",
                 "Tsk tsk. Hmm!", "One. Two? Three!"],
    }).to_parquet(tmp_path / "documents.parquet")
    got = doc_readability(str(tmp_path)).to_pandas().set_index("doc_id")
    assert got.loc[0, "n_words"] == 0
    assert got.loc[0, "n_sentences"] == 1
    assert got.loc[0, "flesch"] == 0.0 and got.loc[0, "fk_grade"] == 0.0
    assert got.loc[1, "n_sentences"] == 1  # fragment denominator
    assert got.loc[2, "n_syllables"] == 0  # tsk/hmm: no aeiouy groups
    assert np.isfinite(got["flesch"]).all() and np.isfinite(got["fk_grade"]).all()
    # doc 3: 3 words, 3 sentences, 4 vowel groups (o-n-e counts two)
    assert got.loc[3, "n_words"] == 3 and got.loc[3, "n_sentences"] == 3
    assert got.loc[3, "n_syllables"] == 4
    assert got.loc[3, "flesch"] == round_half_away(
        206.835 - 1.015 * (3 / 3) - 84.6 * (4 / 3), 6)


def test_source_distinct_ngrams_matches_naive(ray_session, tmp_path):
    import pandas as pd

    from deekseek_ocr___dockerized_api_ray.pipelines.text import (
        source_distinct_ngrams,
    )

    # src a: heavy repetition (distinct-2 < 1); src b: all-unique text;
    # src c: single one-word doc (no bigrams -> no gram_order=2 row).
    pd.DataFrame({
        "doc_id": [0, 1, 2, 3],
        "source": ["a", "a", "b", "c"],
        "text": ["x y x y", "x y", "p q r", "solo"],
    }).to_parquet(tmp_path / "documents.parquet")
    got = source_distinct_ngrams(str(tmp_path)).to_pandas()
    got = got.set_index(["source", "gram_order"]).sort_index()
    # src a unigrams: 6 occurrences {x,y} -> 2 distinct
    assert got.loc[("a", 1), "n_grams"] == 6
    assert got.loc[("a", 1), "n_distinct"] == 2
    assert got.loc[("a", 1), "distinct_ratio"] == round_half_away(2 / 6, 6)
    # src a bigrams: "x y","y x","x y" + "x y" -> 4 occurrences, 2 distinct
    assert got.loc[("a", 2), "n_grams"] == 4
    assert got.loc[("a", 2), "n_distinct"] == 2
    # src b: fully diverse
    assert got.loc[("b", 1), "distinct_ratio"] == 1.0
    assert got.loc[("b", 2), "distinct_ratio"] == 1.0
    # src c: one word, no bigram row
    assert got.loc[("c", 1), "n_grams"] == 1
    assert ("c", 2) not in got.index


def test_source_distinct_ngrams_sf0001_recount(ray_session):
    import os
    import re

    import pandas as pd

    from deekseek_ocr___dockerized_api_ray.pipelines.text import (
        source_distinct_ngrams,
    )

    sf = "/root/testdata/sf0.001"
    if not os.path.isdir(sf):
        pytest.skip("driver testdata absent")
    got = source_distinct_ngrams(sf).to_pandas()
    got = got.set_index(["source", "gram_order"]).sort_index()
    docs = pd.read_parquet(f"{sf}/documents.parquet", columns=["source", "text"])
    ws = re.compile(r"\S+")
    for src, g in docs.groupby("source"):
        uni, bi = [], []
        for t in g["text"]:
            toks = ws.findall(t)
            uni.extend(toks)
            bi.extend(a + " " + b for a, b in zip(toks, toks[1:]))
        assert got.loc[(src, 1), "n_grams"] == len(uni)
        assert got.loc[(src, 1), "n_distinct"] == len(set(uni))
        if bi:
            assert got.loc[(src, 2), "n_grams"] == len(bi)
            assert got.loc[(src, 2), "n_distinct"] == len(set(bi))


def test_cross_source_vocab_overlap_small(ray_session, tmp_path):
    """Hand-computable vocabularies; zero-overlap pairs absent."""
    import pandas as pd

    from deekseek_ocr___dockerized_api_ray.pipelines.text import (
        cross_source_vocab_overlap,
    )

    pd.DataFrame({
        "source": ["a", "a", "b", "c"],
        "text": ["x y z", "x q", "x y", "unique only"],
    }).to_parquet(tmp_path / "documents.parquet")
    got = cross_source_vocab_overlap(str(tmp_path)).to_pandas()
    got = got.set_index(["src_a", "src_b"]).sort_index()
    # a vocab {x,y,z,q} (4), b vocab {x,y} (2): common 2
    assert got.loc[("a", "b"), "n_a"] == 4
    assert got.loc[("a", "b"), "n_b"] == 2
    assert got.loc[("a", "b"), "n_common"] == 2
    assert got.loc[("a", "b"), "jaccard"] == 0.5
    assert got.loc[("a", "b"), "containment"] == 1.0
    # c shares nothing with a or b -> pairs absent
    assert ("a", "c") not in got.index
    assert ("b", "c") not in got.index
    assert len(got) == 1


def test_cross_source_vocab_overlap_sf0001_recount(ray_session):
    import os
    import re

    import pandas as pd

    from deekseek_ocr___dockerized_api_ray.pipelines.text import (
        cross_source_vocab_overlap,
    )

    sf = "/root/testdata/sf0.001"
    if not os.path.isdir(sf):
        pytest.skip("driver testdata absent")
    got = cross_source_vocab_overlap(sf).to_pandas()
    got = got.set_index(["src_a", "src_b"]).sort_index()
    docs = pd.read_parquet(f"{sf}/documents.parquet",
                           columns=["source", "text"])
    ws = re.compile(r"\S+")
    vocab = {src: set().union(*(ws.findall(t) for t in g["text"]))
             for src, g in docs.groupby("source")}
    srcs = sorted(vocab)
    n_pairs = 0
    for i, a in enumerate(srcs):
        for b in srcs[i + 1:]:
            common = vocab[a] & vocab[b]
            if not common:
                assert (a, b) not in got.index
                continue
            n_pairs += 1
            row = got.loc[(a, b)]
            assert row["n_a"] == len(vocab[a])
            assert row["n_b"] == len(vocab[b])
            assert row["n_common"] == len(common)
            assert row["jaccard"] == round_half_away(
                len(common) / len(vocab[a] | vocab[b]), 6)
            assert row["containment"] == round_half_away(
                len(common) / min(len(vocab[a]), len(vocab[b])), 6)
    assert len(got) == n_pairs


def test_doc_oov_rate_small(ray_session, tmp_path):
    """4 docs: threshold = ceil(100*4/1000) = 1, so rare = df == 1."""
    import pandas as pd

    from deekseek_ocr___dockerized_api_ray.pipelines.text import doc_oov_rate

    pd.DataFrame({
        "doc_id": [0, 1, 2, 3],
        "text": ["common common rare1", "common", "common rare2 rare2", ""],
    }).to_parquet(tmp_path / "documents.parquet")
    got = doc_oov_rate(str(tmp_path)).to_pandas().set_index("doc_id")
    # df: common=3, rare1=1, rare2=1; threshold 1
    assert got.loc[0, "n_tokens"] == 3 and got.loc[0, "n_rare"] == 1
    assert got.loc[0, "rare_rate"] == round_half_away(1 / 3, 6)
    assert got.loc[1, "n_rare"] == 0 and got.loc[1, "rare_rate"] == 0.0
    assert got.loc[2, "n_tokens"] == 3 and got.loc[2, "n_rare"] == 2
    assert 3 not in got.index  # zero-token doc absent
    assert len(got) == 3


def test_doc_oov_rate_sf0001_recount(ray_session):
    import os
    import re
    from collections import Counter

    import pandas as pd

    from deekseek_ocr___dockerized_api_ray.pipelines.text import doc_oov_rate

    sf = "/root/testdata/sf0.001"
    if not os.path.isdir(sf):
        pytest.skip("driver testdata absent")
    got = doc_oov_rate(sf).to_pandas().set_index("doc_id").sort_index()
    docs = pd.read_parquet(f"{sf}/documents.parquet",
                           columns=["doc_id", "text"])
    ws = re.compile(r"\S+")
    per_doc = {d: Counter(ws.findall(t))
               for d, t in zip(docs["doc_id"], docs["text"])}
    df = Counter()
    for c in per_doc.values():
        df.update(c.keys())
    thr = (100 * len(docs) + 999) // 1000
    for d, c in per_doc.items():
        n_tok = sum(c.values())
        if n_tok == 0:
            assert d not in got.index
            continue
        n_rare = sum(v for t, v in c.items() if df[t] <= thr)
        assert got.loc[d, "n_tokens"] == n_tok
        assert got.loc[d, "n_rare"] == n_rare
        assert got.loc[d, "rare_rate"] == round_half_away(n_rare / n_tok, 6)


def test_vocab_coverage_curve_naive(ray_session):
    """vocab_coverage_curve == naive in-process recount: cumulative
    top-V token share under (tf desc, term) order."""
    import pandas as pd
    import pyarrow.parquet as pq

    from deekseek_ocr___dockerized_api_ray.pipelines.text import (
        vocab_coverage_curve,
    )

    sf = "/root/testdata/sf0.001"
    got = vocab_coverage_curve(sf, grid=(4, 32, 100000)).to_pandas() \
        .sort_values("vocab_size").reset_index(drop=True)

    texts = pq.read_table(f"{sf}/documents.parquet",
                          columns=["text"]).column("text").to_pylist()
    from collections import Counter
    c = Counter(t for s in texts for t in s.split(" ") if t != "")
    ranked = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))
    total = sum(c.values())
    for _, r in got.iterrows():
        v = int(r["vocab_size"])
        cov = sum(n for _, n in ranked[:v])
        assert int(r["covered_tokens"]) == cov
        assert int(r["total_tokens"]) == total
        assert abs(float(r["coverage"]) - cov / total) < 1e-6
    # grid beyond the vocab covers everything
    assert int(got.iloc[-1]["covered_tokens"]) == total
