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
