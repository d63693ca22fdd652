"""C4 page-cleaning gate (pipelines/c4.py): line-view determinism,
rule-by-rule behavior on crafted pages, and engine/naive agreement
over the sf0.001 corpus."""

import pandas as pd
import pytest

from deekseek_ocr___dockerized_api_ray.functions.hashing import _hash64
from deekseek_ocr___dockerized_api_ray.pipelines.c4 import (
    _BRACE_LINE,
    _JS_LINE,
    _LOREM_LINE,
    clean_page,
    page_lines,
)

SF = "/root/testdata/sf0.001"


def test_page_lines_packing_and_gates():
    words = " ".join(f"w{i}" for i in range(30))  # 12 + 12 + 6 words
    # find a doc_id with every boilerplate gate CLOSED
    d = next(i for i in range(1000)
             if _hash64(f"{i}:js") % 5 and _hash64(f"{i}:lorem") % 11
             and _hash64(f"{i}:brace") % 13)
    lines = page_lines(d, words)
    assert len(lines) == 3
    body0 = lines[0].rstrip('.!?"')
    assert body0 == " ".join(f"w{i}" for i in range(12))
    # terminal punct is one of the drawn chars (possibly none)
    assert lines[2].rstrip('.!?"').split() == [f"w{i}" for i in range(24, 30)]
    # and a doc_id with every gate OPEN gains exactly the 3 lines in order
    d2 = next(i for i in range(100000)
              if _hash64(f"{i}:js") % 5 == 0
              and _hash64(f"{i}:lorem") % 11 == 0
              and _hash64(f"{i}:brace") % 13 == 0)
    lines2 = page_lines(d2, words)
    assert lines2[-3:] == [_JS_LINE, _LOREM_LINE, _BRACE_LINE]


def test_clean_page_rules():
    d = next(i for i in range(1000)
             if _hash64(f"{i}:js") % 5 and _hash64(f"{i}:lorem") % 11
             and _hash64(f"{i}:brace") % 13)
    # every body line here draws SOME punct or none; recompute kept set
    text = " ".join(f"tok{i}" for i in range(60))
    n_lines, n_kept, n_sent, lorem, brace, keep, clean = clean_page(d, text)
    assert n_lines == 5 and not lorem and not brace
    kept_lines = clean.split("\n") if clean else []
    assert len(kept_lines) == n_kept
    for ln in kept_lines:
        assert len(ln.split()) >= 3
        assert ln.endswith((".", "!", "?", '"'))
        assert "javascript" not in ln.lower()
    assert n_sent == sum(clean.count(c) for c in ".!?")
    # empty page
    assert clean_page(d, "")[:3] == (0, 0, 0)
    # a 2-word tail line is dropped by the word rule
    d3, text3 = d, " ".join(f"x{i}" for i in range(14))  # 12 + 2
    n_l, n_k, *_ = clean_page(d3, text3)
    assert n_l == 2 and n_k <= 1


def test_c4_filter_engine_matches_naive(ray_session):
    from deekseek_ocr___dockerized_api_ray.pipelines.c4 import c4_filter

    got = c4_filter(SF).to_pandas().set_index("doc_id")
    docs = pd.read_parquet(f"{SF}/documents.parquet",
                           columns=["doc_id", "text"])
    hit_lorem = hit_brace = hit_js = dropped_page = 0
    for d, t in zip(docs["doc_id"], docs["text"]):
        n_lines, n_kept, n_sent, lorem, brace, keep, clean = clean_page(
            int(d), t)
        row = got.loc[int(d)]
        assert (row["n_lines"], row["n_kept"], row["n_sentences"]) == \
            (n_lines, n_kept, n_sent)
        assert bool(row["has_lorem"]) == lorem
        assert bool(row["has_brace"]) == brace
        assert bool(row["keep"]) == keep
        assert row["clean_text"] == clean
        hit_lorem += lorem
        hit_brace += brace
        hit_js += _JS_LINE in page_lines(int(d), t)
        dropped_page += not keep
    # every rule has real positives on the fixture corpus
    assert hit_lorem and hit_brace and hit_js and dropped_page
    assert (got["keep"]).any()


def test_c4_keep_rate_consistency(ray_session):
    from deekseek_ocr___dockerized_api_ray.pipelines.c4 import (
        c4_filter,
        c4_keep_rate,
    )

    rate = c4_keep_rate(SF).to_pandas().set_index("source")
    per_doc = c4_filter(SF).to_pandas()
    docs = pd.read_parquet(f"{SF}/documents.parquet",
                           columns=["doc_id", "source"])
    j = per_doc.merge(docs, on="doc_id")
    for src, g in j.groupby("source"):
        assert rate.loc[src, "n_docs"] == len(g)
        assert rate.loc[src, "n_keep"] == int(g["keep"].sum())
    assert ((rate["keep_rate"] >= 0) & (rate["keep_rate"] <= 1)).all()


def test_boilerplate_lines_census_matches_naive(ray_session):
    from collections import Counter

    from deekseek_ocr___dockerized_api_ray.pipelines.c4 import (
        boilerplate_lines,
    )

    got = boilerplate_lines(SF).to_pandas().set_index("line")
    docs = pd.read_parquet(f"{SF}/documents.parquet",
                           columns=["doc_id", "text"])
    occ, dd = Counter(), Counter()
    for d, t in zip(docs["doc_id"], docs["text"]):
        lines = page_lines(int(d), t)
        occ.update(lines)
        dd.update(set(lines))
    want = {ln for ln, n in dd.items() if n >= 2}
    assert set(got.index) == want
    for ln in want:
        assert got.loc[ln, "n_docs"] == dd[ln]
        assert got.loc[ln, "n_occurrences"] == occ[ln]
    # the injected page furniture is always in the census
    assert {_JS_LINE, _LOREM_LINE, _BRACE_LINE} <= want


def test_line_dedup_clean_paths_equivalent(ray_session):
    """broadcast path (gate open) == join path (broadcast_lines=0) --
    the two-path shape is pinned byte-identical, and removed lines are
    exactly the >= min_docs census."""
    from deekseek_ocr___dockerized_api_ray.pipelines.c4 import (
        boilerplate_lines,
        line_dedup_clean,
    )

    a = line_dedup_clean(SF, min_docs=5).to_pandas()
    b = line_dedup_clean(SF, min_docs=5, broadcast_lines=0).to_pandas()
    pd.testing.assert_frame_equal(a.reset_index(drop=True),
                                  b.reset_index(drop=True))
    dup = set(boilerplate_lines(SF, min_docs=5).to_pandas()["line"])
    docs = pd.read_parquet(f"{SF}/documents.parquet",
                           columns=["doc_id", "text"])
    g = a.set_index("doc_id")
    removed_total = 0
    for d, t in zip(docs["doc_id"], docs["text"]):
        lines = page_lines(int(d), t)
        kept = [ln for ln in lines if ln not in dup]
        row = g.loc[int(d)]
        assert row["n_lines"] == len(lines)
        assert row["n_removed"] == len(lines) - len(kept)
        assert row["clean_text"] == "\n".join(kept)
        removed_total += row["n_removed"]
    assert removed_total > 0


def test_badword_gate_matches_naive(ray_session):
    """Engine gate equals the per-doc naive recompute of the hash-gated
    blocklist; both keeps and drops are populated on the fixture."""
    import pyarrow.parquet as pq

    from deekseek_ocr___dockerized_api_ray.pipelines.c4 import badword_gate

    got = badword_gate(SF).to_pandas()
    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["doc_id", "text"]).to_pylist()
    for r in docs[:50]:
        toks = r["text"].split()
        n_bad = sum(1 for w in toks if _hash64(f"naughty:{w}") % 37 == 0)
        row = got[got["doc_id"] == r["doc_id"]].iloc[0]
        assert int(row["n_tokens"]) == len(toks)
        assert int(row["n_bad"]) == n_bad
        assert bool(row["keep"]) == (n_bad == 0)
    assert got["keep"].any() and (~got["keep"]).any()
