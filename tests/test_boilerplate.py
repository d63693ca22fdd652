"""Unit suite for the HTML main-content extraction stage: decision-tree
branch coverage on handcrafted pages, parser robustness on malformed
input, and the Ray pipeline round-trip (the exact-recovery oracle parity
is swept in test_entry.py)."""

import os
import sys

import numpy as np
import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from deekseek_ocr___dockerized_api_ray.stages.boilerplate import (  # noqa: E402
    article_title,
    classify_blocks,
    n_paragraphs,
    parse_blocks,
    render_html,
)

SF = "/root/testdata/sf0.001"
needs_data = pytest.mark.skipif(not os.path.isdir(SF), reason="driver testdata absent")


def _blocks(**cols):
    n = len(next(iter(cols.values())))
    base = {"tag": ["p"] * n, "depth": [1] * n, "text": ["x"] * n,
            "n_chars": [10] * n}
    base.update(cols)
    return pd.DataFrame(base)


def test_tree_link_dense_block_is_boilerplate():
    b = _blocks(n_words=[50], link_density=[0.5])
    assert classify_blocks(b).tolist() == [False]


def test_tree_long_block_is_content():
    b = _blocks(n_words=[17], link_density=[0.0])
    assert classify_blocks(b).tolist() == [True]


def test_tree_short_block_rescued_by_next():
    # curr <= 16 words but next > 15 -> content
    b = _blocks(n_words=[10, 16], link_density=[0.0, 0.0])
    assert classify_blocks(b).tolist()[0] is True


def test_tree_short_isolated_block_is_boilerplate():
    # curr <= 16, next <= 15, prev <= 4 words -> boilerplate
    b = _blocks(n_words=[3, 10, 5], link_density=[0.0, 0.0, 0.0])
    assert classify_blocks(b).tolist()[1] is False


def test_tree_after_link_dense_prev_needs_18_word_next():
    # prev LD > 0.555: curr <= 40 content iff next > 17
    b = _blocks(n_words=[5, 20, 18], link_density=[0.9, 0.0, 0.0])
    assert classify_blocks(b).tolist()[1] is True
    b2 = _blocks(n_words=[5, 20, 17], link_density=[0.9, 0.0, 0.0])
    assert classify_blocks(b2).tolist()[1] is False


def test_parser_counts_anchor_chars_and_blocks():
    page = ('<html><body><nav><a href="/">home page</a></nav>'
            "<p>plain paragraph text</p></body></html>")
    b = parse_blocks(page)
    assert list(b["tag"]) == ["nav", "p"]
    assert b.loc[0, "link_density"] == 1.0
    assert b.loc[1, "link_density"] == 0.0
    assert b.loc[1, "n_words"] == 3


def test_parser_skips_script_style_head_and_survives_malformed():
    page = ("<html><head><title>t</title><style>p{}</style></head><body>"
            "<script>var x = 'not content words';</script>"
            "<p>real <b>words</p><div>tail without close"
            "<p>&amp; escaped entity</p>")
    b = parse_blocks(page)
    joined = " ".join(b["text"])
    assert "not content" not in joined and "p{}" not in joined
    assert "real words" in joined
    assert "& escaped entity" in joined


def test_paragraph_packing_closed_form():
    for n in [1, 10, 17, 18, 23, 24, 40, 41, 47, 48, 50, 99, 240]:
        words = " ".join(f"w{i}" for i in range(n))
        page = render_html(7, words)
        b = parse_blocks(page)
        assert (b["tag"] == "p").sum() == n_paragraphs(n)


def test_renderer_geometry_invariants():
    page = render_html(3, "alpha beta gamma delta epsilon")
    b = parse_blocks(page)
    # title is 5 words (prev_words > 4 is load-bearing)
    h1 = b[b["tag"] == "h1"]
    assert len(h1) == 1 and h1["n_words"].iloc[0] == 5
    # breadcrumb LD in (1/3, 0.555]; footer-note LD > 1/3 with >= 16 words
    crumb = b.iloc[1]
    assert 1 / 3 < crumb["link_density"] <= 0.555
    note = b[b["text"].str.startswith("published by")].iloc[0]
    assert note["link_density"] > 1 / 3 and note["n_words"] >= 16


@needs_data
def test_pipeline_recovers_articles_exactly(ray_session):
    from deekseek_ocr___dockerized_api_ray.stages.boilerplate import (
        html_block_features,
        html_main_content,
    )

    got = html_main_content(SF).to_pandas()
    docs = pd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    docs = docs.sort_values("doc_id").reset_index(drop=True)
    want = docs.apply(
        lambda r: article_title(r["doc_id"]) + " " + r["text"], axis=1)
    assert (got["main_text"] == want).all()
    assert (got["n_boilerplate_blocks"] == 6).all()

    feats = html_block_features(SF).to_pandas()
    # per-doc block labels agree with the content pipeline's counts
    agg = feats.groupby("doc_id")["is_content"].sum()
    assert (agg.to_numpy() == got.set_index("doc_id")["n_content_blocks"]
            .reindex(agg.index).to_numpy()).all()
    # block_idx is a dense 0..k-1 sequence per doc
    first = feats[feats["doc_id"] == feats["doc_id"].iloc[0]]
    assert list(first["block_idx"]) == list(range(len(first)))


@needs_data
def test_web_prep_chain_matches_plain_prep_on_titleless_docs(ray_session):
    """The web chain differs from corpus_prep only by the title words the
    renderer adds and the HTML round-trip; with the same gates both
    chains keep a survivor set derived from the same articles, and every
    surviving doc's token count is its article tokens + the 5 title
    tokens."""
    from deekseek_ocr___dockerized_api_ray.pipelines.prep import (
        prep_corpus,
        web_prep_corpus,
    )

    web = web_prep_corpus(SF).to_pandas()
    plain = prep_corpus(SF).to_pandas()
    assert len(web) > 0
    # minhash near-dedup may differ because the added title shifts
    # shingles, but exact-dedup survivors are keyed on distinct article
    # text, so the web chain can never keep MORE docs than distinct
    # articles nor fewer than plain's minhash survivors minus collisions
    docs = pd.read_parquet(f"{SF}/documents.parquet", columns=["text"])
    assert len(web) <= docs["text"].nunique()
    w = web.set_index("doc_id")
    p = plain.set_index("doc_id")
    common = w.index.intersection(p.index)
    assert len(common) > 0
    assert ((w.loc[common, "n_tokens"] - p.loc[common, "n_tokens"]) == 5).all()
