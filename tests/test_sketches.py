"""Property tests for the mergeable sketches (Bloom, Count-Min) and
the sketch-pruned pipelines built on them (oracle-swept in
test_entry.py; these pin the sketch guarantees themselves)."""

import os
import sys

import numpy as np
import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from deekseek_ocr___dockerized_api_ray.functions.sketch import (  # noqa: E402
    BloomFilter,
    CountMinSketch,
)

SF = "/root/testdata/sf0.001"
needs_data = pytest.mark.skipif(not os.path.isdir(SF), reason="driver testdata absent")


def test_bloom_no_false_negatives_and_merge():
    keys = np.arange(0, 20_000, dtype=np.int64)
    a, b = BloomFilter(), BloomFilter()
    a.add(keys[:10_000])
    b.add(keys[10_000:])
    merged = a.merge(b)
    assert merged.probe(keys).all()  # Bloom guarantee: no false negatives
    # merge == build-all-at-once
    full = BloomFilter()
    full.add(keys)
    assert np.array_equal(merged.bits, full.bits)
    # false-positive rate stays tiny at this load factor
    fp = merged.probe(np.arange(1_000_000, 1_100_000, dtype=np.int64)).mean()
    assert fp < 0.01


def test_bloom_roundtrip():
    bf = BloomFilter(1 << 16, 3)
    bf.add(np.array([1, 2, 3], dtype=np.int64))
    back = BloomFilter.deserialize(bf.serialize(), 1 << 16, 3)
    assert np.array_equal(bf.bits, back.bits)


def test_cms_overestimates_only_and_merge():
    rng = np.random.default_rng(7)
    keys = rng.integers(0, 2**63, size=5000, dtype=np.int64).astype(np.uint64)
    counts = rng.integers(1, 50, size=5000).astype(np.int64)
    half = 2500
    a, b = CountMinSketch(), CountMinSketch()
    a.update(keys[:half], counts[:half])
    b.update(keys[half:], counts[half:])
    merged = a.merge(b)
    # exact totals per unique key
    import collections

    exact = collections.Counter()
    for k, c in zip(keys.tolist(), counts.tolist()):
        exact[k] += c
    uniq = np.fromiter(exact.keys(), dtype=np.uint64, count=len(exact))
    true = np.fromiter(exact.values(), dtype=np.int64, count=len(exact))
    est = merged.estimate(uniq)
    assert (est >= true).all()  # CMS never undercounts
    # with w=65536 and ~5k keys, estimates are near-exact
    assert np.mean(est - true) < 1.0
    back = CountMinSketch.deserialize(merged.serialize())
    assert (back.estimate(uniq) == est).all()


@needs_data
def test_cms_top_ngrams_equals_exact(ray_session):
    from deekseek_ocr___dockerized_api_ray.pipelines.scale_ops import cms_top_ngrams
    from deekseek_ocr___dockerized_api_ray.pipelines.text import corpus_top_ngrams

    approx_path = cms_top_ngrams(SF, k=30).to_pandas().reset_index(drop=True)
    exact_path = corpus_top_ngrams(SF, k=30).to_pandas().reset_index(drop=True)
    assert approx_path.equals(exact_path)


@needs_data
def test_bloom_semi_join_matches_plain_filter(ray_session):
    import pandas as pd

    from deekseek_ocr___dockerized_api_ray.pipelines.scale_ops import (
        orders_bloom_semi_join,
    )

    got = (orders_bloom_semi_join(SF).to_pandas()
           .sort_values("o_orderkey").reset_index(drop=True))
    cust = pd.read_parquet(f"{SF}/customer.parquet")
    rich = set(cust.loc[cust["c_acctbal"] >= 7000.0, "c_custkey"])
    orders = pd.read_parquet(f"{SF}/orders.parquet",
                             columns=["o_orderkey", "o_custkey"])
    ref = (orders[orders["o_custkey"].isin(rich)]
           .sort_values("o_orderkey").reset_index(drop=True))
    assert got[["o_orderkey", "o_custkey"]].equals(ref)


@needs_data
def test_events_value_quantiles_error_bound(ray_session):
    import pandas as pd

    from deekseek_ocr___dockerized_api_ray.pipelines.scale_ops import (
        events_value_quantiles,
    )

    got = events_value_quantiles(SF).to_pandas().set_index("event_type")
    ev = pd.read_parquet(f"{SF}/events.parquet", columns=["event_type", "value"])
    for et, g in ev.groupby("event_type"):
        vals = np.sort(g["value"].to_numpy())
        for col, q in (("p50", 0.50), ("p95", 0.95), ("p99", 0.99)):
            est = got.loc[et, col]
            rank = np.searchsorted(vals, est) / len(vals)
            assert abs(rank - q) < 0.02, (et, col, rank)


def test_veclookup_hits_and_misses():
    from deekseek_ocr___dockerized_api_ray.functions.lookup import VecLookup

    lut = VecLookup(np.array([5, 1, 9]), np.array([50, 10, 90]))
    vals, found = lut.lookup(np.array([1, 2, 9, 100, 5]))
    assert found.tolist() == [True, False, True, False, True]
    assert vals[found].tolist() == [10, 90, 50]


@needs_data
def test_kmeans_fit_converges_toward_lower_inertia(ray_session):
    """Each Lloyd round must not increase total inertia (squared-distance
    sum) -- the classic monotonicity invariant."""
    from deekseek_ocr___dockerized_api_ray.pipelines.scale_ops import kmeans_fit

    i0 = kmeans_fit(SF, iters=0).to_pandas()["dist"].sum()
    i2 = kmeans_fit(SF, iters=2).to_pandas()["dist"].sum()
    i4 = kmeans_fit(SF, iters=4).to_pandas()["dist"].sum()
    assert i2 <= i0 + 1e-9
    assert i4 <= i2 + 1e-9


@needs_data
def test_exact_median_matches_numpy(ray_session):
    from deekseek_ocr___dockerized_api_ray.pipelines.scale_ops import (
        events_exact_median,
    )

    got = events_exact_median(SF)
    v = pd.read_parquet(f"{SF}/events.parquet", columns=["value"])["value"].to_numpy()
    assert int(got["n"].iloc[0]) == len(v)
    assert abs(got["q50"].iloc[0] - np.quantile(v, 0.5)) < 1e-6
    assert abs(got["q99"].iloc[0] - np.quantile(v, 0.99)) < 1e-6


def test_label_silhouette_matches_bruteforce(ray_session, tmp_path):
    import numpy as np
    import pandas as pd

    from deekseek_ocr___dockerized_api_ray.pipelines.scale_ops import (
        label_silhouette,
    )

    rng = np.random.RandomState(3)
    centers = rng.normal(size=(3, 6)) * 5
    labels = np.repeat(np.arange(3), 40)
    emb = (centers[labels] + rng.normal(size=(120, 6)) * 0.1).astype(np.float32)
    pd.DataFrame({
        "vec_id": np.arange(120, dtype=np.int64),
        "embedding": [e.tolist() for e in emb],
        "label": labels.astype(np.int32),
    }).to_parquet(tmp_path / "embeddings.parquet")
    got = label_silhouette(str(tmp_path)).to_pandas().set_index("label")
    m = emb.astype(np.float64)
    cents = np.stack([m[labels == l].mean(axis=0) for l in range(3)])
    d2 = ((m[:, None, :] - cents[None]) ** 2).sum(axis=2)
    a = d2[np.arange(120), labels]
    d2[np.arange(120), labels] = np.inf
    b = d2.min(axis=1)
    s = (b - a) / np.maximum(a, b)
    for l in range(3):
        assert abs(got.loc[l, "mean_silhouette"] - s[labels == l].mean()) < 1e-5
        assert got.loc[l, "n_vecs"] == 40
    # tight, well-separated clusters -> silhouette near 1
    assert (got["mean_silhouette"] > 0.95).all()


def test_veclookup_empty_keys_all_miss():
    """An empty dimension must return found=False everywhere, not
    IndexError (ADVICE r2)."""
    from deekseek_ocr___dockerized_api_ray.functions.lookup import VecLookup

    lut = VecLookup(np.array([], dtype=np.int64), np.array([], dtype=np.int64))
    vals, found = lut.lookup(np.array([1, 2, 3]))
    assert found.tolist() == [False, False, False]
    assert len(vals) == 3


@needs_data
def test_emb_whiten_decorrelates(ray_session):
    """Whitened output has ~identity covariance (eps-regularized), and
    emb_covariance equals the numpy population covariance."""
    import numpy as np
    import pandas as pd

    from deekseek_ocr___dockerized_api_ray.pipelines.scale_ops import (
        emb_covariance,
        emb_whiten,
    )

    raw = pd.read_parquet(f"{SF}/embeddings.parquet")
    x = np.stack([np.asarray(v, dtype=np.float64) for v in raw["embedding"]])
    n, d = x.shape

    cov_long = emb_covariance(SF).to_pandas()
    assert len(cov_long) == d * (d + 1) // 2
    ref = np.cov(x, rowvar=False, bias=True)
    got = np.zeros((d, d))
    got[cov_long["i"] - 1, cov_long["j"] - 1] = cov_long["cov"]
    iu = np.triu_indices(d)
    assert np.allclose(got[iu], ref[iu], atol=2e-6)

    z_long = emb_whiten(SF).to_pandas()
    z = np.zeros((n, d))
    ids = {v: k for k, v in enumerate(sorted(raw["vec_id"]))}
    z[[ids[v] for v in z_long["vec_id"]], z_long["dim"] - 1] = z_long["value"]
    zc = np.cov(z, rowvar=False, bias=True)
    # eigen-directions decorrelate: off-diagonals ~ 0, diagonals ~ 1
    off = zc - np.diag(np.diag(zc))
    assert np.abs(off).max() < 1e-3
    assert np.allclose(np.diag(zc), 1.0, atol=1e-2)


def test_mg_compress_guarantee_and_bound():
    """Misra-Gries compression: at most k survivors, every survivor's
    residual underestimates its true count by at most N/(k+1), and any
    item with count > N/(k+1) survives -- on a synthetic Zipf-skewed
    stream whose vocabulary is far larger than k (so pruning really
    runs, unlike the fixture's small bigram vocab)."""
    from collections import Counter

    from deekseek_ocr___dockerized_api_ray.pipelines.scale_ops import (
        mg_compress,
    )

    rng = np.random.default_rng(7)
    items = rng.zipf(1.3, size=200_000)
    items = items[items < 50_000]
    c = Counter(items.tolist())
    k = 100
    assert len(c) > 10 * k  # pruning is actually exercised
    surv = mg_compress(c, k)
    n_total = sum(c.values())
    assert len(surv) <= k
    bound = n_total / (k + 1)
    for g, r in surv.items():
        assert 0 < r <= c[g]
        assert c[g] - r <= bound + 1e-9
    for g, true in c.items():
        if true > bound:
            assert g in surv


@needs_data
def test_mg_heavy_hitters_equals_exact(ray_session):
    """The two-pass MG plan returns EXACTLY the bigrams with count >
    N*phi (recomputed locally), independent of mg_k as long as the
    superset precondition holds; an undersized mg_k raises."""
    from collections import Counter

    from deekseek_ocr___dockerized_api_ray.pipelines.scale_ops import (
        mg_heavy_hitters,
    )

    got = mg_heavy_hitters(SF).to_pandas()

    docs = pd.read_parquet(f"{SF}/documents.parquet", columns=["text"])
    c = Counter()
    for t in docs["text"]:
        ws = t.split()
        c.update(" ".join(ws[i:i + 2]) for i in range(len(ws) - 1))
    n = sum(c.values())
    ref = (pd.DataFrame([(g, v) for g, v in c.items() if v * 800 > n],
                        columns=["gram", "n_occurrences"])
           .sort_values("gram").reset_index(drop=True))
    pd.testing.assert_frame_equal(got.reset_index(drop=True), ref,
                                  check_dtype=False)
    with pytest.raises(ValueError):
        mg_heavy_hitters(SF, phi_num=1, phi_den=800, mg_k=700)


def test_kmv_reach_matches_naive_and_merges(ray_session):
    """events_user_reach_kmv == a driver-side KMV over the whole events
    table; the bottom-k of unioned per-half bottom-k sets equals the
    global bottom-k (mergeability); small cardinalities fall back to
    the exact count."""
    import numpy as np

    from deekseek_ocr___dockerized_api_ray.functions.hashing import _hash64
    from deekseek_ocr___dockerized_api_ray.functions.rounding import (
        round_half_away,
    )
    from deekseek_ocr___dockerized_api_ray.pipelines.relational import (
        events_user_reach_kmv,
    )

    k = 8
    got = events_user_reach_kmv(SF, k=k).to_pandas().set_index("event_type")

    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["event_type", "user_id"])
    for et, g in ev.groupby("event_type"):
        users = sorted(set(int(u) for u in g["user_id"]))
        hs = np.unique(np.array([_hash64(str(u)) for u in users],
                                dtype=np.uint64))
        sk = hs[:k]
        row = got.loc[et]
        assert row["n_exact"] == len(hs)
        assert row["n_sketch"] == len(sk)
        assert row["h_k"] == sk[-1]
        if len(sk) < k:
            est = float(len(sk))
        else:
            est = (k - 1) * 18446744073709551616.0 / np.float64(sk[-1])
        assert row["est_users"] == round_half_away(est, 6)
        assert row["rel_err"] == round_half_away(
            (est - len(hs)) / len(hs), 6)
        # mergeability: bottom-k of the union of per-half bottom-k
        half = len(hs) // 2
        merged = np.unique(np.concatenate([hs[:half][:k], hs[half:][:k]]))[:k]
        assert (merged == sk).all()


def test_quantile_sketch_matches_naive(ray_session):
    """events_quantile_sketch == a driver-side recompute: the sample is
    the TRUE global bottom-s by hash rank (mergeability of bottom-s),
    estimates are sorted-pick over it, exact values are sorted-pick over
    the full column, abs_err is their difference."""
    import numpy as np
    import pyarrow.parquet as pq

    from deekseek_ocr___dockerized_api_ray.functions.hashing import _hash64
    from deekseek_ocr___dockerized_api_ray.functions.rounding import (
        round_half_away,
    )
    from deekseek_ocr___dockerized_api_ray.pipelines.relational import (
        events_quantile_sketch,
    )

    sf = "/root/testdata/sf0.001"
    s = 64
    got = events_quantile_sketch(sf, s=s).to_pandas().set_index("q")
    t = pq.read_table(f"{sf}/events.parquet",
                      columns=["event_id", "value"]).to_pandas()
    h = np.array([_hash64(str(int(e))) for e in t["event_id"]],
                 dtype=np.uint64)
    order = np.lexsort((t["event_id"].to_numpy(), h))
    sample = np.sort(t["value"].to_numpy(np.float64)[order[:s]])
    full = np.sort(t["value"].to_numpy(np.float64))
    n, n_s = len(full), len(sample)
    for p, q in ((1, "p25"), (2, "p50"), (3, "p75")):
        est = round_half_away(float(sample[((n_s - 1) * p) // 4]), 6)
        exact = round_half_away(float(full[((n - 1) * p) // 4]), 6)
        row = got.loc[q]
        assert row["est"] == est and row["exact"] == exact, q
        assert row["abs_err"] == round_half_away(abs(
            float(sample[((n_s - 1) * p) // 4])
            - float(full[((n - 1) * p) // 4])), 6)
        assert int(row["n_total"]) == n and int(row["n_sample"]) == n_s


def test_zorder_interleave_and_plan_prunes(ray_session, tmp_path):
    """_zorder_interleave vs a bit-by-bit reference, and the full plan
    on a synthetic 2-D grid: every file's zone map must be consistent
    (min<=max, counts sum to n) and the z-layout must let the middle
    probe box prune at least one file -- the property a single-column
    sort cannot guarantee on the anti-correlated diagonal."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from deekseek_ocr___dockerized_api_ray.pipelines.scale_ops import (
        _zorder_interleave,
        zorder_layout_plan,
    )

    rng = np.random.RandomState(3)
    ux = rng.randint(0, 4096, size=200).astype(np.int64)
    uy = rng.randint(0, 4096, size=200).astype(np.int64)
    z = _zorder_interleave(ux, uy, bits=12)
    for j in (0, 17, 101):
        expect = 0
        for i in range(12):
            expect |= ((int(ux[j]) >> i) & 1) << (2 * i)
            expect |= ((int(uy[j]) >> i) & 1) << (2 * i + 1)
        assert int(z[j]) == expect

    # synthetic orders: x uniform, date spanning two years
    n = 3000
    keys = np.arange(1, n + 1, dtype=np.int64)
    x = rng.randint(1, 1500, size=n).astype(np.int64)
    days = rng.randint(8000, 8730, size=n).astype(np.int64)
    ts = (days * 86_400_000_000).astype("datetime64[us]")
    t = pa.Table.from_arrays(
        [pa.array(keys), pa.array(x), pa.array(ts)],
        names=["o_orderkey", "o_custkey", "o_orderdate"],
    )
    pq.write_table(t, tmp_path / "orders.parquet")

    out = zorder_layout_plan(str(tmp_path), n_files=8).to_pandas()
    assert len(out) == 8
    assert int(out["n_rows"].sum()) == n
    assert (out["x_min"] <= out["x_max"]).all()
    assert (out["y_min"] <= out["y_max"]).all()
    # the probe box is the middle quarter of each dim: on a z-layout
    # some files are fully outside it
    assert int(out["probe_hit"].sum()) < 8
    assert int(out["probe_hit"].sum()) >= 1
