"""Media-payload dedup family (pipelines/media.py): fixture
determinism, payload layout, and brute-force agreement of the three
queries over the sf0.001 documents table."""

import hashlib
import struct

import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def brute():
    """Driver-side recompute of the whole media fixture (sf0.001 is
    ~500 docs -- tiny)."""
    from deekseek_ocr___dockerized_api_ray.pipelines.media import (
        _doc_media,
        content_key,
    )

    docs = pd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id"])
    df = _doc_media(docs["doc_id"].to_numpy())
    df["content_key"] = [content_key(p) for p in df["payload"]]
    return df


def test_payload_layout_and_determinism(brute):
    from deekseek_ocr___dockerized_api_ray.pipelines.media import (
        N_ASSETS,
        asset_payload,
    )

    for a in range(N_ASSETS):
        p = asset_payload(a)
        assert p[:8] == b"FAKEPNG0"
        w, h = struct.unpack("<II", p[8:16])
        assert 64 <= w <= 176 and 48 <= h <= 176
        assert p[16:] == hashlib.sha256(f"asset:{a}".encode()).digest()
        assert asset_payload(a) == p  # pure function
    # every asset in the pool is actually embedded at this scale
    assert brute["asset_id"].nunique() == N_ASSETS
    # repetition is real: average copies per asset >> 1
    assert len(brute) / N_ASSETS > 3


def test_media_dedup_matches_bruteforce(ray_session, brute):
    from deekseek_ocr___dockerized_api_ray.pipelines.media import media_dedup

    got = media_dedup(SF).to_pandas()
    want = (brute.groupby("content_key")
            .agg(keeper_ref=("media_ref", "min"),
                 n_copies=("media_ref", "size"))
            .reset_index().sort_values("content_key")
            .reset_index(drop=True))
    want["n_copies"] = want["n_copies"].astype("int64")
    pd.testing.assert_frame_equal(
        got, want[["content_key", "keeper_ref", "n_copies"]],
        check_dtype=False)
    assert got["n_copies"].sum() == len(brute)


def test_repeated_media_census_matches_bruteforce(ray_session, brute):
    from deekseek_ocr___dockerized_api_ray.pipelines.media import (
        repeated_media_census,
    )

    got = repeated_media_census(SF).to_pandas()
    want = (brute.groupby("content_key")
            .agg(n_refs=("media_ref", "size"),
                 n_docs=("doc_id", "nunique"))
            .reset_index())
    want = (want[want["n_refs"] >= 2].sort_values("content_key")
            .reset_index(drop=True))
    pd.testing.assert_frame_equal(
        got, want[["content_key", "n_refs", "n_docs"]], check_dtype=False)
    # a doc embedding the same asset twice makes n_docs < n_refs somewhere
    assert (got["n_docs"] <= got["n_refs"]).all()


def test_doc_media_stats_consistency(ray_session, brute):
    from deekseek_ocr___dockerized_api_ray.pipelines.media import (
        doc_media_stats,
    )

    got = doc_media_stats(SF).to_pandas().set_index("doc_id")
    assert (got["n_dup_refs"] == got["n_media"] - got["n_distinct"]).all()
    assert got["n_media"].sum() == len(brute)
    per_doc = brute.groupby("doc_id")["asset_id"].nunique()
    for d, nd in per_doc.items():
        assert got.loc[d, "n_distinct"] == nd
    # docs with zero media still appear
    docs = pd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id"])
    assert len(got) == len(docs)


def test_media_simhash_pairs_matches_bruteforce(ray_session):
    """Banded near-dup pairs == exact all-pairs hamming ball over the
    distinct variant-payload pool (banding losslessness at the chosen
    threshold), and the threshold separates: every surviving pair is a
    same-asset variant pair."""
    import numpy as np

    from deekseek_ocr___dockerized_api_ray.functions.hashing import (
        _hash64,
        hamming64,
    )
    from deekseek_ocr___dockerized_api_ray.pipelines.media import (
        MAX_MEDIA_PER_DOC,
        N_ASSETS,
        _simhash_hex,
        content_key,
        media_simhash_pairs,
        variant_payload,
    )

    got = media_simhash_pairs(SF).to_pandas()

    docs = pd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id"])
    pool = set()
    for d in docs["doc_id"]:
        d = int(d)
        for j in range(_hash64(f"{d}:nm") % MAX_MEDIA_PER_DOC):
            pool.add((_hash64(f"{d}:m{j}") % N_ASSETS,
                      _hash64(f"{d}:mv{j}") % 3))
    rows = []
    for a, v in sorted(pool):
        p = variant_payload(a, v)
        rows.append((content_key(p), a, _simhash_hex(p.hex())))
    want = []
    for i in range(len(rows)):
        for j in range(i + 1, len(rows)):
            x, y = sorted((rows[i], rows[j]))
            d = hamming64(x[2], y[2])
            if d <= 10:
                want.append((x[0], y[0], d, x[1] == y[1]))
    want_df = (pd.DataFrame(want, columns=["key_a", "key_b", "hamming",
                                           "same_asset"])
               .sort_values(["key_a", "key_b"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), want_df, check_dtype=False)
    assert len(got) > 0
    # separation: the hamming-10 ball contains only same-asset variants
    assert got["same_asset"].all()
    # distinct payloads only (hamming 0 is fine -- a 1-byte variant can
    # leave every sign-sum unflipped -- but the keys must differ)
    assert (got["key_a"] != got["key_b"]).all()
