"""Substring-level exact dedup (ExactSubstr, Lee et al. 2021).

Removal semantics on a hand-built corpus with KNOWN duplicated
passages, path-equivalence across the broadcast/join gates, and the
mask-union invariant (spans never overlap, clean text never contains a
duplicated k-gram)."""

import numpy as np
import pandas as pd
import pytest

from deekseek_ocr___dockerized_api_ray.pipelines.substring import (
    duplicated_substring_spans,
    substring_dedup_clean,
)

SF = "/root/testdata/sf0.001"


def _mini_corpus(tmp_path):
    """Docs 1 and 2 share an 11-word passage; doc 3 repeats a 9-word
    phrase INSIDE itself (within-doc duplication counts, per the paper);
    doc 4 is all-unique filler; doc 5 is a verbatim copy of doc 4's
    text (fully masked)."""
    shared = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda"
    inner = "one two three four five six seven eight nine"
    uniq = lambda p, n: " ".join(f"{p}{i}" for i in range(n))
    docs = pd.DataFrame({
        "doc_id": [1, 2, 3, 4, 5],
        "text": [
            uniq("a", 6) + " " + shared + " " + uniq("b", 6),
            uniq("c", 4) + " " + shared + " " + uniq("d", 9),
            inner + " " + uniq("e", 7) + " " + inner,
            uniq("f", 30),
            uniq("f", 30),
        ],
    })
    d = tmp_path / "sf"
    d.mkdir()
    docs.to_parquet(d / "documents.parquet", index=False)
    return str(d), docs


def test_known_spans(ray_session, tmp_path):
    sf, docs = _mini_corpus(tmp_path)
    spans = duplicated_substring_spans(sf, k=5).to_pandas()
    got = {(r.doc_id, r.start_word, r.end_word)
           for r in spans.itertuples()}
    # doc 1: shared passage = words 7..17; doc 2: words 5..15
    # doc 3: inner phrase at 1..9 and again at 17..25
    # docs 4+5: fully covered 1..30
    assert got == {(1, 7, 17), (2, 5, 15), (3, 1, 9), (3, 17, 25),
                   (4, 1, 30), (5, 1, 30)}
    assert (spans["n_words"] == spans["end_word"] - spans["start_word"] + 1).all()


def test_removal_semantics(ray_session, tmp_path):
    sf, docs = _mini_corpus(tmp_path)
    clean = substring_dedup_clean(sf, k=5).to_pandas().set_index("doc_id")
    # doc 1 keeps exactly its unique flanks
    assert clean.loc[1, "clean_text"] == \
        " ".join(f"a{i}" for i in range(6)) + " " + " ".join(f"b{i}" for i in range(6))
    assert clean.loc[1, "n_removed_words"] == 11
    # doc 3 keeps only the middle filler
    assert clean.loc[3, "clean_text"] == " ".join(f"e{i}" for i in range(7))
    assert clean.loc[3, "n_removed_words"] == 18
    # full copies vanish entirely
    assert clean.loc[4, "clean_text"] == "" and clean.loc[5, "clean_text"] == ""
    assert clean.loc[4, "n_removed_words"] == 30
    # no duplicated 5-gram survives in any clean text (the paper's
    # fixed-point property at the chosen grain)
    grams = {}
    for t in clean["clean_text"]:
        ws = t.split(" ") if t else []
        for i in range(len(ws) - 4):
            g = " ".join(ws[i:i + 5])
            grams[g] = grams.get(g, 0) + 1
    assert all(v == 1 for v in grams.values())


def test_gate_path_equivalence(ray_session):
    """Broadcast (default) and join (gate forced to 0) paths emit
    identical rows on the real sf0.001 corpus, for both queries."""
    a = duplicated_substring_spans(SF, k=8).to_pandas()
    b = duplicated_substring_spans(SF, k=8, broadcast_grams=0).to_pandas()
    key = ["doc_id", "start_word"]
    pd.testing.assert_frame_equal(
        a.sort_values(key).reset_index(drop=True),
        b.sort_values(key).reset_index(drop=True))
    assert len(a) > 0  # the corpus must actually exercise the operator

    ca = substring_dedup_clean(SF, k=8).to_pandas()
    cb = substring_dedup_clean(
        SF, k=8, broadcast_grams=0, broadcast_spans=0).to_pandas()
    pd.testing.assert_frame_equal(
        ca.sort_values("doc_id").reset_index(drop=True),
        cb.sort_values("doc_id").reset_index(drop=True))


def test_spans_disjoint_and_maximal(ray_session):
    spans = duplicated_substring_spans(SF, k=8).to_pandas()
    for _, g in spans.groupby("doc_id"):
        g = g.sort_values("start_word")
        # disjoint AND non-adjacent (adjacent would have merged)
        assert (g["start_word"].to_numpy()[1:]
                > g["end_word"].to_numpy()[:-1] + 1).all()
        assert (g["n_words"] >= 8).all()
