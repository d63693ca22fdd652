"""Scale-path operators: sketch-pruned variants of exact queries.

Each operator here produces EXACTLY the same rows as a naive exact
query (so all three are DuckDB-oracled) while demonstrating the shape
that survives 100 TB:

- ``orders_bloom_semi_join``: a Bloom filter built from the small side
  prunes the big side BEFORE the exchange; the exact verify join then
  runs over the ~matching subset only. False positives are removed by
  the verify join; false negatives don't exist (Bloom property), so the
  output is exact.
- ``cms_top_ngrams``: heavy hitters without shuffling the full
  vocabulary -- per-batch local top-M candidates + a merged Count-Min
  sketch to rank the candidate union, then ONE exact counting pass over
  the small broadcast candidate set. CMS only overestimates, so a true
  top-k gram can only be displaced from the candidate cut by an
  overestimate above it -- the cut keeps cand_k >> k to make that
  impossible in practice (oracle equality asserts it per run).
- ``token_doc_freq``: per-token document frequency (the IDF building
  block): per-doc DISTINCT tokens -> per-batch partial counts -> one
  bucketed keyed reduce. The per-occurrence stream never crosses the
  wire, only (token, batch) partials.

Sketch partials are one tiny row per batch; this module merges them on
the driver (take of N_batches rows, ~1 MiB each). At real scale, route
the partials through an intermediate ``groupby(shard).map_groups``
tree-reduce first -- the sketches are associative, nothing else changes.
"""

from __future__ import annotations

from collections import Counter

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions.sketch import BloomFilter, CountMinSketch
from ..functions.text_stats import TOKEN_RE, sha1_64
from ..stages.agg import grouped_agg


def _cpus() -> int:
    import ray

    return int(ray.cluster_resources().get("CPU", 4)) if ray.is_initialized() else 4


def orders_bloom_semi_join(sf_dir: str, min_acctbal: float = 7000.0,
                           m_bits: int = 1 << 20, k_hashes: int = 4):
    """orders WHERE o_custkey IN (rich customers), Bloom-pruned.

    1. Build: rich-customer keys -> one serialized Bloom partial per
       batch -> OR-merge -> ``ray.put`` (the filter ships ONCE per node,
       not per batch).
    2. Prune: vectorized probe inside ``map_batches`` drops definite
       non-matches before anything is shuffled.
    3. Verify: exact hash semi-join of the surviving orders against the
       key set removes Bloom false positives.

    Output: (o_orderkey, o_custkey).
    """
    import ray
    import ray.data as rd

    cust = rd.read_parquet(f"{sf_dir}/customer.parquet",
                           columns=["c_custkey", "c_acctbal"])

    def rich_only(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return batch.filter(
            pc.greater_equal(batch.column("c_acctbal"), min_acctbal)
        ).select(["c_custkey"])

    rich = cust.map_batches(rich_only, batch_format="pyarrow", batch_size=131072)

    def bloom_partial(batch: pa.Table) -> pa.Table:
        bf = BloomFilter(m_bits, k_hashes)
        bf.add(batch.column("c_custkey").to_numpy(zero_copy_only=False))
        return pa.Table.from_arrays([pa.array([bf.serialize()], type=pa.binary())],
                                    names=["bits"])

    partials = rich.map_batches(bloom_partial, batch_format="pyarrow",
                                # bound: one serialized Bloom per block
                                batch_size=131072).take_all()
    merged = BloomFilter(m_bits, k_hashes)
    for row in partials:
        merged = merged.merge(BloomFilter.deserialize(row["bits"], m_bits, k_hashes))
    bloom_ref = ray.put(merged.serialize())

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_custkey"])

    def prune(batch: pa.Table) -> pa.Table:
        import ray as _ray

        bf = BloomFilter.deserialize(_ray.get(bloom_ref), m_bits, k_hashes)
        keys = batch.column("o_custkey").to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(bf.probe(keys)))

    candidates = orders.map_batches(prune, batch_format="pyarrow",
                                    batch_size=131072)
    n_parts = max(2, min(_cpus() // 2, max(2, orders.count() // 200)))
    verified = candidates.join(
        rich, join_type="inner", num_partitions=n_parts,
        on=("o_custkey",), right_on=("c_custkey",),
    )
    return verified.select_columns(["o_orderkey", "o_custkey"])


def token_doc_freq(sf_dir: str, k: int = 200):
    """Top-k tokens by document frequency (tokens = ``\\S+`` runs, each
    doc counted at most once per token). Output: (token, df)."""
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])

    def partial(batch: pa.Table) -> pa.Table:
        c = Counter()
        for t in batch.column("text").to_pylist():
            c.update(set(TOKEN_RE.findall(t)))
        return pa.Table.from_arrays(
            [pa.array(list(c.keys()), type=pa.string()),
             pa.array(list(c.values()), type=pa.int64())],
            names=["token", "df"],
        )

    partials = ds.map_batches(partial, batch_format="pyarrow")
    total = grouped_agg(partials, ["token"], {"df": ("df", "sum")})

    def cast(df: pd.DataFrame) -> pd.DataFrame:
        df["df"] = df["df"].astype("int64")
        return df

    return (total.map_batches(cast, batch_format="pandas")
                 .sort(["df", "token"], descending=[True, False])
                 .limit(k))


def cms_top_ngrams(sf_dir: str, n: int = 2, k: int = 30,
                   local_m: int = 2000, cand_mult: int = 20,
                   d: int = 4, w: int = 1 << 16):
    """Exact top-k n-grams via CMS-pruned candidates + one exact pass.

    Pass 1 (one row per batch): local gram Counter -> top ``local_m``
    candidate grams + a CountMinSketch of ALL the batch's grams.
    Driver: sum the sketches, union the candidates, keep the
    ``cand_mult * k`` candidates with the largest CMS estimates.
    Pass 2: exact counts of the small broadcast candidate set only
    (filtered partial Counter -> bucketed reduce), sort, limit k.

    Output: (gram, n_occurrences) -- identical to the exact
    ``corpus_top_ngrams`` for the same (n, k).
    """
    import ray
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])

    def sketch_partial(batch: pa.Table) -> pa.Table:
        c = Counter()
        for t in batch.column("text").to_pylist():
            words = TOKEN_RE.findall(t)
            c.update(" ".join(words[i:i + n]) for i in range(len(words) - n + 1))
        cms = CountMinSketch(d, w)
        if c:
            grams = list(c.keys())
            keys = np.fromiter((sha1_64(g) for g in grams),
                               dtype=np.uint64, count=len(grams))
            cms.update(keys, np.fromiter(c.values(), dtype=np.int64, count=len(c)))
        top = [g for g, _ in c.most_common(local_m)]
        return pa.Table.from_arrays(
            [pa.array([cms.serialize()], type=pa.binary()),
             pa.array([top], type=pa.list_(pa.string()))],
            names=["cms", "cands"],
        )

    rows = ds.map_batches(sketch_partial, batch_format="pyarrow",
                          # bound: one fixed-size sketch per block
                          batch_size=16384).take_all()
    merged = CountMinSketch(d, w)
    cands: set = set()
    for row in rows:
        merged = merged.merge(CountMinSketch.deserialize(bytes(row["cms"]), d, w))
        cands.update(row["cands"])

    cand_list = sorted(cands)
    keys = np.fromiter((sha1_64(g) for g in cand_list),
                       dtype=np.uint64, count=len(cand_list))
    est = merged.estimate(keys)
    order = sorted(range(len(cand_list)), key=lambda i: (-est[i], cand_list[i]))
    keep = set(cand_list[i] for i in order[: cand_mult * k])
    keep_ref = ray.put(keep)

    def exact_partial(batch: pa.Table) -> pa.Table:
        import ray as _ray

        wanted = _ray.get(keep_ref)
        c = Counter()
        for t in batch.column("text").to_pylist():
            words = TOKEN_RE.findall(t)
            c.update(g for i in range(len(words) - n + 1)
                     if (g := " ".join(words[i:i + n])) in wanted)
        return pa.Table.from_arrays(
            [pa.array(list(c.keys()), type=pa.string()),
             pa.array(list(c.values()), type=pa.int64())],
            names=["gram", "n_occurrences"],
        )

    partials = ds.map_batches(exact_partial, batch_format="pyarrow")
    total = grouped_agg(partials, ["gram"],
                        {"n_occurrences": ("n_occurrences", "sum")}, n_buckets=16)

    def cast(df: pd.DataFrame) -> pd.DataFrame:
        df["n_occurrences"] = df["n_occurrences"].astype("int64")
        return df

    return (total.map_batches(cast, batch_format="pandas")
                 .sort(["n_occurrences", "gram"], descending=[True, False])
                 .limit(k))


def emb_quantize(sf_dir: str):
    """Per-dimension int8 scalar quantization of the embedding table:
    global (min, max) per dim from one combiner pass (a dim x 2 vector
    per batch -- tiny), then q = round_half_away((v - mn)/(mx - mn)*255)
    streamed with the broadcast range scalars. The expression tree is
    written identically in the engine and the oracle, so the quantized
    codes match bit-for-bit (min/max selection is exact; the affine map
    is the same IEEE op sequence on both sides).

    Output: long-form (vec_id, dim [1-based], q in 0..255).
    """
    import ray
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])

    def mm_partial(batch: pa.Table) -> pa.Table:
        emb = batch.column("embedding")
        if isinstance(emb, pa.ChunkedArray):
            emb = emb.combine_chunks()
        dim = len(emb[0])
        mat = emb.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
        mat = mat.reshape(-1, dim)
        return pa.Table.from_arrays(
            [pa.array(np.arange(1, dim + 1, dtype=np.int64)),
             pa.array(mat.min(axis=0)), pa.array(mat.max(axis=0))],
            names=["dim", "mn", "mx"],
        )

    mm = (ds.map_batches(mm_partial, batch_format="pyarrow",
                         # bound: one (min,max) row per block
                         batch_size=65536).to_pandas()
          .groupby("dim").agg(mn=("mn", "min"), mx=("mx", "max")))
    mn = mm["mn"].to_numpy()
    mx = mm["mx"].to_numpy()
    ref = ray.put((mn, mx))

    def quant(batch: pa.Table) -> pa.Table:
        lo, hi = ray.get(ref)
        emb = batch.column("embedding")
        if isinstance(emb, pa.ChunkedArray):
            emb = emb.combine_chunks()
        dim = len(emb[0])
        mat = emb.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
        mat = mat.reshape(-1, dim)
        rng = hi - lo
        safe = np.where(rng > 0, rng, 1.0)
        x = (mat - lo) / safe * 255.0
        q = np.where(rng > 0, np.floor(x + 0.5), 0.0).astype(np.int64)
        ids = np.asarray(batch.column("vec_id").to_pylist(), dtype=np.int64)
        return pa.Table.from_arrays(
            [pa.array(np.repeat(ids, dim)),
             pa.array(np.tile(np.arange(1, dim + 1, dtype=np.int64), len(ids))),
             pa.array(q.reshape(-1))],
            names=["vec_id", "dim", "q"],
        )

    return ds.map_batches(quant, batch_format="pyarrow")


def label_silhouette(sf_dir: str):
    """Per-label simplified (centroid-based) silhouette over the
    embedding table: for each vector, a = squared Euclid distance to
    its own label centroid, b = min distance to any other centroid,
    s = (b - a) / max(a, b); report each label's mean s -- the standard
    cheap clustering-quality score (Rousseeuw's silhouette with the
    medoid replaced by the centroid, the large-scale variant).

    Shape: pass 1 = label_centroids' combiner (one (label, sum_vec, n)
    partial per batch, tiny driver combine -- the centroid matrix is
    k x dim, broadcast once via ray.put); pass 2 streams the corpus,
    one (batch x k) distance matrix per batch, per-label partial
    (sum_s, n) rows into a 4-bucket reduce. The corpus crosses the wire
    exactly zero times.

    Output: (label, n_vecs, mean_silhouette r6) sorted by label.
    """
    import ray
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["embedding", "label"])

    def cpartial(batch: pa.Table) -> pa.Table:
        emb = batch.column("embedding")
        if isinstance(emb, pa.ChunkedArray):
            emb = emb.combine_chunks()
        dim = len(emb[0])
        mat = emb.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
        mat = mat.reshape(-1, dim)
        labels = batch.column("label").to_numpy(zero_copy_only=False)
        order = np.argsort(labels, kind="stable")
        uniq, starts = np.unique(labels[order], return_index=True)
        sums = np.add.reduceat(mat[order], starts, axis=0)
        counts = np.diff(np.append(starts, len(labels)))
        return pa.Table.from_arrays(
            [pa.array(uniq.astype(np.int64)),
             pa.array(list(sums), type=pa.list_(pa.float64())),
             pa.array(counts.astype(np.int64))],
            names=["label", "sum_vec", "n"],
        )

    parts = ds.map_batches(cpartial, batch_format="pyarrow",
                           # bound: label-grain (k x dim) centroid partials per block
                           batch_size=65536).to_pandas()
    labs, cents = [], []
    for label, g in parts.groupby("label", sort=True):
        labs.append(int(label))
        cents.append(np.sum(np.stack(g["sum_vec"].to_numpy()), axis=0)
                     / g["n"].sum())
    label_vals = np.asarray(labs, dtype=np.int64)
    cent_ref = ray.put(np.stack(cents))

    def spartial(batch: pa.Table) -> pd.DataFrame:
        cent = ray.get(cent_ref)
        emb = batch.column("embedding")
        if isinstance(emb, pa.ChunkedArray):
            emb = emb.combine_chunks()
        dim = len(emb[0])
        mat = emb.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
        mat = mat.reshape(-1, dim)
        labels = batch.column("label").to_numpy(zero_copy_only=False)
        li = np.searchsorted(label_vals, labels)
        d2 = ((mat[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
        rows = np.arange(len(labels))
        a = d2[rows, li]
        d2[rows, li] = np.inf
        b = d2.min(axis=1)
        denom = np.maximum(a, b)
        s = np.where(denom > 0, (b - a) / denom, 0.0)
        order = np.argsort(labels, kind="stable")
        uniq, starts = np.unique(labels[order], return_index=True)
        return pd.DataFrame({
            "label": uniq.astype(np.int64),
            "sum_s": np.add.reduceat(s[order], starts),
            "n_vecs": np.diff(np.append(starts, len(labels))).astype(np.int64),
        })

    agg = grouped_agg(ds.map_batches(spartial, batch_format="pyarrow",
                                     batch_size=65536),
                      ["label"], {"sum_s": ("sum_s", "sum"),
                                  "n_vecs": ("n_vecs", "sum")}, n_buckets=4)

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        from ..functions.rounding import round_series

        df["mean_silhouette"] = round_series(df["sum_s"] / df["n_vecs"], 6)
        df["n_vecs"] = df["n_vecs"].astype("int64")
        return df[["label", "n_vecs", "mean_silhouette"]]

    return agg.map_batches(finish, batch_format="pandas").sort("label")


def label_centroids(sf_dir: str):
    """Per-label centroid of the embedding vectors (the k-means update
    step, and the trained-codebook path for the IVF index). Vector
    aggregation follows the combiner shape: each batch emits ONE
    (label, sum_vec, n) partial -- a float64 matmul-free groupby-sum of
    the stacked float32 block -- and the tiny reduce averages them.

    Output: (label, dim, centroid r6), dim 1-based to match SQL list
    indexing.
    """
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["embedding", "label"])

    def partial(batch: pa.Table) -> pa.Table:
        emb = batch.column("embedding")
        if isinstance(emb, pa.ChunkedArray):
            emb = emb.combine_chunks()
        dim = len(emb[0])
        mat = emb.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
        mat = mat.reshape(-1, dim)
        labels = batch.column("label").to_numpy(zero_copy_only=False)
        order = np.argsort(labels, kind="stable")
        uniq, starts = np.unique(labels[order], return_index=True)
        sums = np.add.reduceat(mat[order], starts, axis=0)
        counts = np.diff(np.append(starts, len(labels)))
        return pa.Table.from_arrays(
            [pa.array(uniq.astype(np.int64)),
             pa.array(list(sums), type=pa.list_(pa.float64())),
             pa.array(counts.astype(np.int64))],
            names=["label", "sum_vec", "n"],
        )

    partials = ds.map_batches(partial, batch_format="pyarrow", batch_size=65536)

    def reduce(df: pd.DataFrame) -> pd.DataFrame:
        frames = []
        for label, g in df.groupby("label", sort=False):
            vec = np.sum(np.stack(g["sum_vec"].to_numpy()), axis=0)
            mean = vec / g["n"].sum()
            frames.append(pd.DataFrame({
                "label": np.int64(label),
                "dim": np.arange(1, len(mean) + 1, dtype=np.int64),
                "centroid": mean,
            }))
        return pd.concat(frames, ignore_index=True)

    def bucket(df: pd.DataFrame) -> pd.DataFrame:
        df["bucket"] = (df["label"].to_numpy(dtype=np.int64) % 4).astype(np.int32)
        return df

    out = (partials.map_batches(bucket, batch_format="pandas")
                   .groupby("bucket").map_groups(reduce, batch_format="pandas"))

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        from ..functions.rounding import round_series

        df["centroid"] = round_series(df["centroid"], 6)
        return df[["label", "dim", "centroid"]]

    return out.map_batches(finish, batch_format="pandas")


def hist_length_quantiles(sf_dir: str):
    """EXACT per-language length quantiles from a mergeable integer
    histogram -- the scale path for quantiles over integer-valued
    columns. The shuffle payload is (lang, n_chars, count) histogram
    cells (bounded by the number of DISTINCT lengths, not by row count);
    order statistics and quantile_cont interpolation are computed from
    cumulative counts per language on the tiny reduced histogram.

    Output: (lang, p25, p50, p75) -- identical to the sort-based
    ``doc_length_quantiles``.
    """
    import ray.data as rd

    from ..functions.rounding import round_half_away

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["lang", "n_chars"])
    hist = grouped_agg(ds, ["lang", "n_chars"],
                       {"cnt": ("n_chars", "size")}, n_buckets=16)

    def quantiles(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for lang, g in df.groupby("lang", sort=False):
            g = g.sort_values("n_chars")
            vals = g["n_chars"].to_numpy(dtype=np.float64)
            cum = g["cnt"].to_numpy(dtype=np.int64).cumsum()
            ntot = int(cum[-1])

            def order_stat(j: int) -> float:
                return float(vals[np.searchsorted(cum, j + 1)])

            out = {"lang": lang}
            for name, q in (("p25", 0.25), ("p50", 0.50), ("p75", 0.75)):
                h = (ntot - 1) * q
                lo = int(np.floor(h))
                x0 = order_stat(lo)
                x1 = order_stat(min(lo + 1, ntot - 1))
                out[name] = round_half_away(x0 + (h - lo) * (x1 - x0), 6)
            rows.append(out)
        return pd.DataFrame(rows, columns=["lang", "p25", "p50", "p75"])

    def lang_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df["b2"] = np.fromiter((sha1_64(s) % 4 for s in df["lang"]),
                               dtype=np.int64, count=len(df)).astype(np.int32)
        return df

    return (hist.map_batches(lang_bucket, batch_format="pandas")
                .groupby("b2").map_groups(quantiles, batch_format="pandas"))


def kmeans_assign(sf_dir: str):
    """One Lloyd assignment step against TRAINED centroids (the per-label
    means): each vector goes to the centroid minimizing squared Euclidean
    distance, lowest label on ties.

    The centroid table (k x dim, tiny) is computed distributed (same
    combiner as ``label_centroids``), collected once, and broadcast via
    ``ray.put``; assignment is a per-batch vectorized (n, k, dim)
    squared-diff reduction. This is the trained-codebook path for the
    IVF index (stages/similarity.py uses a seeded random codebook).

    Output: (vec_id, assigned_label).
    """
    import ray
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet")
    cent_ref = ray.put(trained_centroids(sf_dir))

    def assign(batch: pa.Table) -> pa.Table:
        import ray as _ray

        labs, cents = _ray.get(cent_ref)
        emb = batch.column("embedding")
        if isinstance(emb, pa.ChunkedArray):
            emb = emb.combine_chunks()
        dim = cents.shape[1]
        mat = emb.flatten().to_numpy(zero_copy_only=False).astype(np.float64).reshape(-1, dim)
        # explicit (e - c)^2 reduction (same arithmetic as the SQL oracle,
        # unlike the ||e||^2 - 2ec + ||c||^2 expansion)
        diff = mat[:, None, :] - cents[None, :, :]
        dist = np.einsum("nkd,nkd->nk", diff, diff)
        nearest = labs[np.argmin(dist, axis=1)]
        return pa.Table.from_arrays(
            [batch.column("vec_id"), pa.array(nearest)],
            names=["vec_id", "assigned_label"],
        )

    return ds.map_batches(assign, batch_format="pyarrow", batch_size=8192)


def trained_centroids(sf_dir: str):
    """Distributed per-label mean vectors (the trained codebook for
    kmeans_assign / semdedup): combiner partials per batch, tiny k x dim
    collect on the driver. Returns (labels sorted, centroid matrix)."""
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet")

    def partial(batch: pa.Table) -> pa.Table:
        emb = batch.column("embedding")
        if isinstance(emb, pa.ChunkedArray):
            emb = emb.combine_chunks()
        dim = len(emb[0])
        mat = emb.flatten().to_numpy(zero_copy_only=False).astype(np.float64).reshape(-1, dim)
        labels = batch.column("label").to_numpy(zero_copy_only=False)
        order = np.argsort(labels, kind="stable")
        uniq, starts = np.unique(labels[order], return_index=True)
        sums = np.add.reduceat(mat[order], starts, axis=0)
        counts = np.diff(np.append(starts, len(labels)))
        return pa.Table.from_arrays(
            [pa.array(uniq.astype(np.int64)),
             pa.array(list(sums), type=pa.list_(pa.float64())),
             pa.array(counts.astype(np.int64))],
            names=["label", "sum_vec", "n"],
        )

    # centroid table is k x dim -- collecting it is the broadcast step
    parts = ds.map_batches(partial, batch_format="pyarrow",
                           # bound: one (k x dim) centroid partial per block
                           batch_size=65536).take_all()
    acc: dict = {}
    for row in parts:
        lab = int(row["label"])
        vec = np.asarray(row["sum_vec"], dtype=np.float64)
        if lab in acc:
            acc[lab] = (acc[lab][0] + vec, acc[lab][1] + int(row["n"]))
        else:
            acc[lab] = (vec, int(row["n"]))
    labels_sorted = sorted(acc)
    centroids = np.stack([acc[lab][0] / acc[lab][1] for lab in labels_sorted])
    return np.asarray(labels_sorted, dtype=np.int64), centroids


def events_value_quantiles(sf_dir: str, b: int = 1024):
    """Approximate p50/p95/p99 of event value per event type via the
    mergeable QuantileSketch -- the scale path for quantiles over
    REAL-valued columns (the integer histogram trick of
    ``hist_length_quantiles`` doesn't apply). One sketch row per
    (event_type, batch) crosses the wire; the reduce merges sketches per
    type. Rank error O(1/b) per merge level (test-pinned < 2%); no
    oracle entry because the estimate is approximate by design.

    Output: (event_type, p50, p95, p99).
    """
    import ray.data as rd

    from ..functions.sketch import QuantileSketch

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "value"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for et, g in df.groupby("event_type", sort=False):
            sk = QuantileSketch.from_values(g["value"].to_numpy(), b)
            rows.append({"event_type": et, "sketch": sk.serialize()})
        return pd.DataFrame(rows, columns=["event_type", "sketch"])

    def reduce(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for et, g in df.groupby("event_type", sort=False):
            merged = QuantileSketch.deserialize(g["sketch"].iloc[0], b)
            for s in g["sketch"].iloc[1:]:
                merged = merged.merge(QuantileSketch.deserialize(s, b))
            rows.append({"event_type": et,
                         "p50": merged.quantile(0.50),
                         "p95": merged.quantile(0.95),
                         "p99": merged.quantile(0.99)})
        return pd.DataFrame(rows, columns=["event_type", "p50", "p95", "p99"])

    def bucket(df: pd.DataFrame) -> pd.DataFrame:
        df["bucket"] = np.fromiter((sha1_64(s) % 4 for s in df["event_type"]),
                                   dtype=np.int64, count=len(df)).astype(np.int32)
        return df

    partials = ev.map_batches(partial, batch_format="pandas", batch_size=131072)
    return (partials.map_batches(bucket, batch_format="pandas")
                    .groupby("bucket").map_groups(reduce, batch_format="pandas"))


def kmeans_fit(sf_dir: str, k: int = 6, iters: int = 2):
    """Distributed Lloyd's k-means: ``iters`` full update rounds then a
    final assignment, with deterministic seeding (the embeddings of
    vec_id 0..k-1) and deterministic ties (lowest cluster id).

    This is the engine's ITERATIVE-ALGORITHM template: per round, the
    k x dim centroid matrix (tiny, model state) broadcasts to a
    stateless vectorized assignment pass, which emits ONE partial row
    per (batch, cluster) -- count + per-dim sum -- and the driver folds
    the partials into the next round's centroids. The corpus streams
    every round; nothing corpus-sized is ever collected. An empty
    cluster keeps its previous centroid (and the oracle mirrors that
    with a COALESCE).

    Output: (vec_id, cluster, dist r6) -- final assignment + squared
    Euclidean distance, sorted by vec_id.
    """
    import ray
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])

    def _matrix(batch: pa.Table) -> np.ndarray:
        emb = batch.column("embedding")
        if isinstance(emb, pa.ChunkedArray):
            emb = emb.combine_chunks()
        flat = emb.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
        return flat.reshape(batch.num_rows, -1)

    # deterministic seeds: vec_id 0..k-1 (a k-row point read with a
    # pushed-down row filter -- never a scan of the corpus)
    import pyarrow.parquet as pq

    seed_df = (pq.read_table(f"{sf_dir}/embeddings.parquet",
                             columns=["vec_id", "embedding"],
                             filters=[("vec_id", "<", k)])
               # bound: k seed rows (pushed-down point filter)
               .to_pandas().sort_values("vec_id"))
    centroids = np.asarray(
        [np.asarray(v, dtype=np.float64) for v in seed_df["embedding"]])

    def _round(cents: np.ndarray):
        cent_ref = ray.put(cents)

        def partial(batch: pa.Table) -> pd.DataFrame:
            c = ray.get(cent_ref)
            mat = _matrix(batch)
            diff = mat[:, None, :] - c[None, :, :]
            dist = np.einsum("nkd,nkd->nk", diff, diff)
            near = np.argmin(dist, axis=1)
            rows = []
            for cl in np.unique(near):
                sel = mat[near == cl]
                rows.append({"cluster": int(cl), "cnt": len(sel),
                             "sums": sel.sum(axis=0).tolist()})
            out = pd.DataFrame(rows)
            return out

        parts = (ds.map_batches(partial, batch_format="pyarrow",
                                # bound: one (k x dim) partial per block
                                batch_size=8192).to_pandas())
        new = cents.copy()
        for cl, grp in parts.groupby("cluster"):
            cnt = int(grp["cnt"].sum())
            if cnt > 0:
                new[int(cl)] = np.sum(np.stack(grp["sums"].to_numpy()),
                                      axis=0) / cnt
        return new

    for _ in range(iters):
        centroids = _round(centroids)

    final_ref = ray.put(centroids)

    def assign(batch: pa.Table) -> pd.DataFrame:
        c = ray.get(final_ref)
        mat = _matrix(batch)
        diff = mat[:, None, :] - c[None, :, :]
        dist = np.einsum("nkd,nkd->nk", diff, diff)
        near = np.argmin(dist, axis=1)
        from ..functions.rounding import round_series

        vec_ids = batch.column("vec_id").to_numpy(zero_copy_only=False)
        return pd.DataFrame({
            "vec_id": vec_ids.astype(np.int64),
            "cluster": near.astype(np.int64),
            "dist": round_series(
                pd.Series(dist[np.arange(len(near)), near]), 6),
        })

    return (ds.map_batches(assign, batch_format="pyarrow", batch_size=8192)
              .sort("vec_id"))


def events_exact_median(sf_dir: str, qs: tuple = (0.5, 0.99),
                        n_hist: int = 8192):
    """EXACT global quantiles (quantile_cont interpolation) without ever
    sorting the column: pass 1 streams a fixed-width histogram partial
    per batch (merged by key on the driver -- n_hist counters, not rows);
    the target order statistics' buckets are identified from the
    cumulative counts; pass 2 streams again collecting ONLY the values
    inside those buckets (~n/n_hist rows), which are order-stat-selected
    locally. Two scans, O(n_hist + n/n_hist) driver memory, exact result
    -- the scale alternative to both a full sort and an approximate
    sketch (events_value_quantiles).

    Output: one row (n, q50 r6, q99 r6).
    """
    import ray.data as rd

    from ..functions.rounding import round_series

    ev = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["value"])

    # bounds + count in the same first pass as the histogram would need
    # them; Ray's min/max/count aggregates are one streaming pass
    lo = float(ev.min("value"))
    hi = float(ev.max("value"))
    n = ev.count()
    width = (hi - lo) / n_hist or 1.0

    def hist_partial(df: pd.DataFrame) -> pd.DataFrame:
        v = df["value"].to_numpy(dtype=np.float64)
        b = np.clip(((v - lo) / width).astype(np.int64), 0, n_hist - 1)
        cnt = np.bincount(b, minlength=n_hist)
        nz = np.flatnonzero(cnt)
        return pd.DataFrame({"b": nz.astype(np.int64), "cnt": cnt[nz]})

    hist = (ev.map_batches(hist_partial, batch_format="pandas",
                           # bound: histogram-bucket grain per block
                           batch_size=262144).to_pandas()
            .groupby("b")["cnt"].sum())
    counts = np.zeros(n_hist, dtype=np.int64)
    counts[hist.index.to_numpy()] = hist.to_numpy()
    cum = np.concatenate(([0], np.cumsum(counts)))

    # ranks needed for quantile_cont: floor and ceil of (n-1)*q
    ranks = sorted({r for q in qs
                    for r in (int(np.floor((n - 1) * q)),
                              int(np.ceil((n - 1) * q)))})
    need_buckets = sorted({int(np.searchsorted(cum, r + 1) - 1)
                           for r in ranks})
    bset = set(need_buckets)

    def collect(df: pd.DataFrame) -> pd.DataFrame:
        v = df["value"].to_numpy(dtype=np.float64)
        b = np.clip(((v - lo) / width).astype(np.int64), 0, n_hist - 1)
        keep = np.isin(b, list(bset))
        return pd.DataFrame({"b": b[keep], "value": v[keep]})

    got = (ev.map_batches(collect, batch_format="pandas",
                          # bound: rows in the few rank-straddling buckets (narrow by construction; re-bucket on skew)
                          batch_size=262144).to_pandas())

    rank_val = {}
    for bk in need_buckets:
        vals = np.sort(got.loc[got["b"] == bk, "value"].to_numpy())
        for r in ranks:
            if cum[bk] <= r < cum[bk + 1]:
                rank_val[r] = float(vals[r - cum[bk]])

    out = {"n": np.array([n], dtype=np.int64)}
    for q in qs:
        pos = (n - 1) * q
        f, c = int(np.floor(pos)), int(np.ceil(pos))
        v = (rank_val[f] if f == c
             else rank_val[f] + (pos - f) * (rank_val[c] - rank_val[f]))
        out[f"q{int(q * 100)}"] = round_series(pd.Series([v]), 6)
    return pd.DataFrame(out)


def embedding_dim_stats(sf_dir: str, n_buckets: int = 4):
    """Per-DIMENSION corpus statistics of the embedding column (n, mean,
    population std) -- the feature-normalization pass that precedes ANN
    indexing / whitening at 100 TB.  One streaming map emits 64 partial
    rows (dim, n, s1, s2) PER BATCH (matrix column sums in float64, no
    per-row work), a tiny keyed reduce merges them; the corpus itself
    never re-shuffles.

    The float tree mirrors the oracle exactly: mean = s1/n,
    std = sqrt(s2/n - m1*m1); dims are 1-based to match DuckDB's
    generate_subscripts.

    Output: (dim, n, mean r6, std_pop r6) sorted by dim.
    """
    import ray.data as rd

    from ..functions.rounding import round_series
    from ..stages.similarity import _batch_matrix

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["embedding"])

    def partial(batch: pa.Table) -> pd.DataFrame:
        x = _batch_matrix(batch, "embedding")
        d = x.shape[1] if len(x) else 0
        return pd.DataFrame({
            "dim": np.arange(1, d + 1, dtype=np.int64),
            "n": np.full(d, len(x), dtype=np.int64),
            "s1": x.sum(axis=0, dtype=np.float64),
            "s2": (x * x).sum(axis=0, dtype=np.float64),
        })

    agg = grouped_agg(
        ds.map_batches(partial, batch_format="pyarrow", batch_size=4096),
        ["dim"],
        {"n": ("n", "sum"), "s1": ("s1", "sum"), "s2": ("s2", "sum")},
        n_buckets=n_buckets)

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        n = df["n"].to_numpy(dtype=np.float64)
        m1 = df["s1"].to_numpy() / n
        r2 = df["s2"].to_numpy() / n
        return pd.DataFrame({
            "dim": df["dim"].astype("int64"),
            "n": df["n"].astype("int64"),
            "mean": round_series(pd.Series(m1), 6).to_numpy(),
            "std_pop": round_series(
                pd.Series(np.sqrt(r2 - m1 * m1)), 6).to_numpy(),
        })

    return agg.map_batches(finish, batch_format="pandas").sort("dim")


def emb_covariance(sf_dir: str, n_buckets: int = 8):
    """Full covariance matrix of the embedding table (population
    normalization) -- the moment pass PCA / whitening / Mahalanobis
    indexing starts from. One streaming map emits the dim x dim
    cross-moment partial PER BATCH (a single einsum; d^2 floats, never
    the corpus), a keyed reduce folds them, and the driver finishes the
    d x d algebra: cov[i,j] = sxy/n - mean_i * mean_j.

    Upper triangle only (i <= j, 1-based dims to match DuckDB's
    generate_subscripts); r6 absorbs the engines' summation-order
    difference.

    Output: (i, j, cov r6) sorted by (i, j).
    """
    import ray.data as rd

    from ..functions.rounding import round_series
    from ..stages.agg import grouped_agg
    from ..stages.similarity import _batch_matrix

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["embedding"])

    def partial(batch: pa.Table) -> pd.DataFrame:
        x = _batch_matrix(batch, "embedding")
        if not len(x):
            return pd.DataFrame({"i": pd.Series([], dtype="int64"),
                                 "j": pd.Series([], dtype="int64"),
                                 "n": pd.Series([], dtype="int64"),
                                 "sx": pd.Series([], dtype="float64"),
                                 "sy": pd.Series([], dtype="float64"),
                                 "sxy": pd.Series([], dtype="float64")})
        d = x.shape[1]
        xtx = x.T @ x  # (d, d) cross moments, one einsum per batch
        s1 = x.sum(axis=0, dtype=np.float64)
        iu, ju = np.triu_indices(d)
        return pd.DataFrame({
            "i": (iu + 1).astype(np.int64), "j": (ju + 1).astype(np.int64),
            "n": np.full(len(iu), len(x), dtype=np.int64),
            "sx": s1[iu], "sy": s1[ju], "sxy": xtx[iu, ju],
        })

    agg = grouped_agg(ds.map_batches(partial, batch_format="pyarrow",
                                     batch_size=8192),
                      ["i", "j"],
                      {"n": ("n", "sum"), "sx": ("sx", "sum"),
                       "sy": ("sy", "sum"), "sxy": ("sxy", "sum")},
                      # bound-static: d(d+1)/2 rows (dimension grain)
                      n_buckets=n_buckets).to_pandas()
    n = agg["n"].to_numpy(np.float64)
    cov = (agg["sxy"].to_numpy(np.float64) / n
           - (agg["sx"].to_numpy(np.float64) / n)
           * (agg["sy"].to_numpy(np.float64) / n))
    out = pd.DataFrame({"i": agg["i"].astype("int64"),
                        "j": agg["j"].astype("int64"),
                        "cov": round_series(pd.Series(cov), 6)})
    return rd.from_pandas(out.sort_values(["i", "j"]).reset_index(drop=True))


def emb_whiten(sf_dir: str, eps: float = 1e-6):
    """PCA whitening of the embedding table: project every vector onto
    the covariance eigenbasis and rescale by 1/sqrt(eigenvalue + eps)
    -- the decorrelation step that makes downstream cosine/Euclidean
    geometry isotropic (ZCA/PCA whitening; Bell & Sejnowski 1997).

    The d x d covariance comes from emb_covariance's combiner pass; the
    eigendecomposition is a driver-side O(d^3) on the TINY matrix (64 x
    64 -- bound-static: dimension grain, never corpus-dependent); the
    projection streams with the broadcast rotation. Eigenvector SIGN is
    basis-ambiguous across LAPACK builds, so this op is rows-only (no
    SQL eigensolver anyway); its invariants -- identity covariance of
    the output, norm preservation under pure rotation -- are pinned by
    tests instead.

    Output: (vec_id, dim [1-based], value r6) long-form whitened
    coordinates sorted by (vec_id, dim).
    """
    import ray
    import ray.data as rd

    from ..functions.rounding import round_series
    from ..stages.similarity import _batch_matrix

    # bound-static: d(d+1)/2 rows (dimension grain)
    cov_long = emb_covariance(sf_dir).to_pandas()
    d = int(cov_long["j"].max())
    cov = np.zeros((d, d))
    cov[cov_long["i"] - 1, cov_long["j"] - 1] = cov_long["cov"]
    cov = cov + np.triu(cov, 1).T  # mirror the upper triangle

    # mean vector for centering (same combiner as embedding_dim_stats)
    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])

    def mean_part(batch: pa.Table) -> pd.DataFrame:
        x = _batch_matrix(batch, "embedding")
        return pd.DataFrame({"n": [len(x)],
                             "s": [x.sum(axis=0, dtype=np.float64).tolist()]})

    # bound: one d-vector row per batch
    mp = ds.map_batches(mean_part, batch_format="pyarrow",
                        batch_size=8192).to_pandas()
    mean = (np.sum(np.stack(mp["s"].to_numpy()), axis=0)
            / float(mp["n"].sum()))

    evals, evecs = np.linalg.eigh(cov)  # driver-side: 64x64
    # deterministic sign: make each eigenvector's largest-|.| entry
    # positive (kills the LAPACK sign ambiguity within one build)
    flip = np.sign(evecs[np.argmax(np.abs(evecs), axis=0),
                         np.arange(d)])
    evecs = evecs * flip
    w = evecs / np.sqrt(np.maximum(evals, 0.0) + eps)  # (d, d) rotation+scale
    wref = ray.put((mean, w))

    def project(batch: pa.Table) -> pd.DataFrame:
        m, ww = ray.get(wref)
        ids = np.asarray(batch.column("vec_id").to_pylist(), dtype=np.int64)
        x = _batch_matrix(batch, "embedding") - m
        z = x @ ww
        nloc, dd = z.shape
        return pd.DataFrame({
            "vec_id": np.repeat(ids, dd),
            "dim": np.tile(np.arange(1, dd + 1, dtype=np.int64), nloc),
            "value": round_series(pd.Series(z.reshape(-1)), 6),
        })

    return ds.map_batches(project, batch_format="pyarrow",
                          batch_size=8192).sort(["vec_id", "dim"])


def mg_compress(counts: Counter, k: int) -> Counter:
    """Misra-Gries compression of an exact counter to at most ``k``
    entries: subtract the (k+1)-th largest count from every entry and
    keep the positive remainders. By the mergeable-summaries theorem
    (Agarwal et al. 2012) this equals running the classic MG stream
    algorithm with k counters over the same items, so every item with
    frequency > N/(k+1) in the counted stream survives."""
    if len(counts) <= k:
        return Counter(counts)
    off = sorted(counts.values(), reverse=True)[k]
    return Counter({g: c - off for g, c in counts.items() if c > off})


def mg_heavy_hitters(sf_dir: str, phi_num: int = 1, phi_den: int = 800,
                     mg_k: int = 1600, n: int = 2):
    """EXACT phi-heavy hitters (grams with count > N * phi) via a
    two-pass Misra-Gries plan (Misra & Gries 1982; merge rule from
    Agarwal et al. 2012) -- the deterministic counterpart of the
    CMS-pruned ``cms_top_ngrams``:

    Pass 1: each batch exact-counts its grams, MG-compresses to at most
    ``mg_k`` survivors (``mg_compress``), and emits ONE row (survivor
    keys + the batch token total). Any item with global count
    > N/(mg_k+1) must exceed N_b/(mg_k+1) in at least one batch (sum
    argument), so the UNION of batch survivor sets is a certified
    superset of the phi-heavy hitters whenever mg_k + 1 > phi_den /
    phi_num -- enforced below. Driver state is bounded: batches x mg_k
    keys, corpus-independent per batch.

    Pass 2: exact recount of the broadcast candidate set only (tiny
    shuffle: one row per (candidate, bucket)), then the integer-exact
    gate count * phi_den > N * phi_num.

    At 100 TB this replaces a full gram-vocabulary shuffle (billions of
    keys) with a bounded candidate recount; the fixture's bigram
    vocabulary is smaller than mg_k, so compression is a no-op here --
    the MG pruning itself is pinned by a synthetic-skew unit test.

    Output: (gram, n_occurrences) for grams with count > N*phi, by gram.
    """
    import ray
    import ray.data as rd

    if mg_k + 1 <= phi_den // max(phi_num, 1):
        raise ValueError("mg_k too small for phi: superset guarantee "
                         "needs mg_k + 1 > phi_den/phi_num")

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])

    def mg_partial(batch: pa.Table) -> pa.Table:
        c: Counter = Counter()
        total = 0
        for t in batch.column("text").to_pylist():
            words = TOKEN_RE.findall(t)
            grams = [" ".join(words[i:i + n])
                     for i in range(len(words) - n + 1)]
            total += len(grams)
            c.update(grams)
        surv = mg_compress(c, mg_k)
        return pa.Table.from_arrays(
            [pa.array([list(surv.keys())], type=pa.list_(pa.string())),
             pa.array([total], type=pa.int64())],
            names=["cands", "n_tokens"],
        )

    rows = ds.map_batches(mg_partial, batch_format="pyarrow",
                          # bound: one <=mg_k-key row per block
                          batch_size=16384).take_all()
    cands: set = set()
    total_n = 0
    for row in rows:
        cands.update(row["cands"])
        total_n += int(row["n_tokens"])
    keep_ref = ray.put(cands)

    def exact_partial(batch: pa.Table) -> pa.Table:
        import ray as _ray

        wanted = _ray.get(keep_ref)
        c = Counter()
        for t in batch.column("text").to_pylist():
            words = TOKEN_RE.findall(t)
            c.update(g for i in range(len(words) - n + 1)
                     if (g := " ".join(words[i:i + n])) in wanted)
        return pa.Table.from_arrays(
            [pa.array(list(c.keys()), type=pa.string()),
             pa.array(list(c.values()), type=pa.int64())],
            names=["gram", "n_occurrences"],
        )

    partials = ds.map_batches(exact_partial, batch_format="pyarrow")
    total = grouped_agg(partials, ["gram"],
                        {"n_occurrences": ("n_occurrences", "sum")},
                        n_buckets=16)

    def gate(df: pd.DataFrame) -> pd.DataFrame:
        out = df[df["n_occurrences"].astype("int64") * phi_den
                 > total_n * phi_num]
        return out.astype({"n_occurrences": "int64"})

    return (total.map_batches(gate, batch_format="pandas").sort("gram"))


def _zorder_interleave(ux: np.ndarray, uy: np.ndarray,
                       bits: int = 12) -> np.ndarray:
    """Morton (z-order) bit interleave of two ``bits``-bit ints:
    bit i of ux lands at position 2i, bit i of uy at 2i+1."""
    z = np.zeros_like(ux)
    for i in range(bits):
        z |= ((ux >> i) & 1) << (2 * i)
        z |= ((uy >> i) & 1) << (2 * i + 1)
    return z


def zorder_layout_plan(sf_dir: str, n_files: int = 8, bits: int = 12):
    """Z-order (Morton-curve) data-layout plan over orders -- the
    OPTIMIZE ZORDER BY (custkey, orderdate) shape every lakehouse table
    format ships (Delta/Iceberg/Hudi): co-locate rows that are close in
    BOTH dimensions so per-file min/max zone maps prune 2-D predicates,
    which a single-column sort cannot do. At 100 TB this plan IS the
    file layout; here it reports, per planned file, the row count, the
    min/max zone map of both dimensions, and whether a fixed probe box
    (the middle quarter of each dimension's range) can prune the file.

    Everything in the ranking key is integer math, so the plan is
    bit-deterministic and DuckDB-oracleable:

    - dims: x = o_custkey, y = epoch-day of o_orderdate;
    - pass 1 (combiner): global (min, max) of each dim -- one 4-value
      partial per batch;
    - quantize each dim to ``bits`` bits by integer floor division,
      interleave to the Morton key z, composite = z * 2^38 + o_orderkey
      (unique -> total order; orderkey < 2^38 asserted);
    - pass 2: ONE distributed sort by composite; the K-1 file-boundary
      composites are rows at global ranks ceil(f*n/K) picked by
      ``split_at_indices`` (index slicing on the sorted materialization,
      not an exchange -- the events_exact_median pattern);
    - pass 3: streams the table once more, assigns
      file = searchsorted(boundaries, composite, 'right') against the
      broadcast K-1 boundary keys, and emits per-(batch, file) zone-map
      partials -- <= K rows per batch -- combined on the driver.

    Output: (file_id, n_rows, x_min, x_max, y_min, y_max, probe_hit)
    sorted by file_id; probe_hit = 1 iff the file's zone map intersects
    the probe box (the files a zone-map reader must open).
    """
    import ray
    import ray.data as rd

    cols = ["o_orderkey", "o_custkey", "o_orderdate"]
    ds = rd.read_parquet(f"{sf_dir}/orders.parquet", columns=cols)

    def _xy(batch: pa.Table):
        x = batch.column("o_custkey").to_numpy(zero_copy_only=False).astype(np.int64)
        ts = batch.column("o_orderdate")
        if isinstance(ts, pa.ChunkedArray):
            ts = ts.combine_chunks()
        us = ts.cast(pa.int64()).to_numpy(zero_copy_only=False)
        y = us // 86_400_000_000  # epoch day (dates are post-1970)
        return x, y

    def mm_partial(batch: pa.Table) -> pa.Table:
        x, y = _xy(batch)
        return pa.Table.from_arrays(
            [pa.array([int(x.min())]), pa.array([int(x.max())]),
             pa.array([int(y.min())]), pa.array([int(y.max())])],
            names=["xmn", "xmx", "ymn", "ymx"],
        )

    # bound: one 4-value partial row per block
    mm = ds.map_batches(mm_partial, batch_format="pyarrow",
                        batch_size=131072).to_pandas()
    xmn, xmx = int(mm["xmn"].min()), int(mm["xmx"].max())
    ymn, ymx = int(mm["ymn"].min()), int(mm["ymx"].max())
    top = (1 << bits) - 1

    def _composite(batch: pa.Table) -> pa.Table:
        x, y = _xy(batch)
        keys = np.asarray(
            batch.column("o_orderkey").to_numpy(zero_copy_only=False),
            dtype=np.int64)
        assert keys.max(initial=0) < (1 << 38), "orderkey exceeds 38 bits"
        ux = ((x - xmn) * top) // (xmx - xmn) if xmx > xmn \
            else np.zeros_like(x)
        uy = ((y - ymn) * top) // (ymx - ymn) if ymx > ymn \
            else np.zeros_like(y)
        z = _zorder_interleave(ux, uy, bits)
        return pa.Table.from_arrays(
            [pa.array(z * (1 << 38) + keys, type=pa.int64()),
             pa.array(x), pa.array(y)],
            names=["composite", "x", "y"],
        )

    zt = ds.map_batches(_composite, batch_format="pyarrow").materialize()
    n = zt.count()
    k = min(n_files, n)
    # 0-based rank r -> file (r*k)//n; boundary f starts at ceil(f*n/k)
    bounds_idx = sorted({(f * n + k - 1) // k for f in range(1, k)})
    cuts: list = []
    for i in bounds_idx:
        cuts.extend([i, i + 1])
    snt = zt.sort("composite").materialize()
    parts = snt.split_at_indices(cuts)
    boundaries = np.asarray(
        # bound: 1 row each (single-index slices of the sorted table)
        [parts[2 * j + 1].take_all()[0]["composite"]
         for j in range(len(bounds_idx))], dtype=np.int64)
    bref = ray.put(boundaries)

    def zone_partial(batch: pa.Table) -> pa.Table:
        b = ray.get(bref)
        comp = batch.column("composite").to_numpy(zero_copy_only=False)
        x = batch.column("x").to_numpy(zero_copy_only=False)
        y = batch.column("y").to_numpy(zero_copy_only=False)
        fid = np.searchsorted(b, comp, side="right").astype(np.int64)
        df = pd.DataFrame({"file_id": fid, "x": x, "y": y})
        g = df.groupby("file_id").agg(
            n_rows=("x", "size"),
            x_min=("x", "min"), x_max=("x", "max"),
            y_min=("y", "min"), y_max=("y", "max")).reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    # bound: <= n_files zone-map partial rows per block
    zones = (zt.map_batches(zone_partial, batch_format="pyarrow",
                            batch_size=131072)
             .to_pandas()
             .groupby("file_id")
             .agg(n_rows=("n_rows", "sum"),
                  x_min=("x_min", "min"), x_max=("x_max", "max"),
                  y_min=("y_min", "min"), y_max=("y_max", "max"))
             .reset_index())

    # fixed probe box: the middle quarter of each dimension's range
    qxlo = xmn + ((xmx - xmn) * 3) // 8
    qxhi = xmn + ((xmx - xmn) * 5) // 8
    qylo = ymn + ((ymx - ymn) * 3) // 8
    qyhi = ymn + ((ymx - ymn) * 5) // 8
    hit = ~((zones["x_max"] < qxlo) | (zones["x_min"] > qxhi)
            | (zones["y_max"] < qylo) | (zones["y_min"] > qyhi))
    zones["probe_hit"] = hit.astype(np.int64)
    for c in zones.columns:
        zones[c] = zones[c].astype(np.int64)
    out = zones.sort_values("file_id").reset_index(drop=True)
    return rd.from_pandas(out)
