"""Corpus-curation operators a training-data pipeline needs beyond
dedup: benchmark decontamination, TF-IDF term scoring, and SemDeDup-style
semantic pruning.

Scale shapes:

  - ``decontaminate``: the benchmark (eval/heldout) shingle-hash set is
    SMALL by definition -- it broadcasts once as a sorted u64 array
    (``ray.put``), and the whole corpus streams against it with a
    vectorized ``searchsorted`` membership test. No shuffle at all.
  - ``doc_tfidf_top_terms``: per-doc top term is computed LOCALLY per
    batch (docs are whole rows); only (term, df-partial) rows cross the
    wire for the document-frequency combiner, then one hash join
    attaches df to the one-row-per-doc top-term table.
  - ``semdedup``: vectors group by their trained-centroid assignment
    (kmeans_assign's codebook); the pairwise cosine test runs per
    cluster. SemDeDup's contract is that k (number of clusters) scales
    with the corpus so clusters stay bounded -- with the sandbox's
    per-label codebook that bound is |corpus|/k and documented here.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions.rounding import round_series
from ..stages.agg import grouped_agg

_BENCH_MOD = 37  # doc_id % 37 == 0 -> member of the "benchmark" set


def decontaminate(sf_dir: str, k: int = 5, num: int = 9, den: int = 10):
    """Flag training documents contaminated by benchmark overlap: a doc
    is contaminated when >= num/den of its distinct k-char shingle
    hashes appear in the benchmark set (docs with doc_id %% 37 == 0).

    The ratio test runs in integers (n_overlap * den >= num * n_shingles)
    so the engine and the SQL oracle agree exactly.

    Output: (doc_id, n_overlap, n_shingles, contaminated) for every
    non-benchmark doc, sorted by doc_id.
    """
    import ray
    import ray.data as rd

    from ..functions.hashing import shingle_hashes

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    # benchmark shingle set: built DISTRIBUTED (per-batch set partials),
    # collected once -- tiny by definition (a heldout benchmark is
    # thousands of docs, not billions) -- then broadcast sorted.
    def bench_partial(batch: pa.Table) -> pa.Table:
        doc_ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        texts = batch.column("text").to_pylist()
        hs: set = set()
        for did, text in zip(doc_ids, texts):
            if did % _BENCH_MOD == 0:
                hs.update(shingle_hashes(text, k=k).tolist())
        return pa.Table.from_arrays(
            [pa.array(sorted(hs), type=pa.uint64())], names=["h"])

    bench_rows = ds.map_batches(bench_partial, batch_format="pyarrow",
                                batch_size=8192).to_pandas()
    bench_arr = np.unique(bench_rows["h"].to_numpy(dtype=np.uint64))
    bench_ref = ray.put(bench_arr)

    def score(batch: pa.Table) -> pa.Table:
        bench = ray.get(bench_ref)
        doc_ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        keep = doc_ids % _BENCH_MOD != 0
        texts = batch.column("text").to_pylist()
        out_id, out_ov, out_n = [], [], []
        for did, flag, text in zip(doc_ids, keep, texts):
            if not flag:
                continue
            h = shingle_hashes(text, k=k)
            idx = np.searchsorted(bench, h)
            idx_c = np.clip(idx, 0, max(len(bench) - 1, 0))
            hits = int((bench[idx_c] == h).sum()) if len(bench) else 0
            out_id.append(int(did)); out_ov.append(hits); out_n.append(len(h))
        contaminated = [ov * den >= num * n for ov, n in zip(out_ov, out_n)]
        return pa.Table.from_arrays(
            [pa.array(out_id, type=pa.int64()),
             pa.array(out_ov, type=pa.int64()),
             pa.array(out_n, type=pa.int64()),
             pa.array(contaminated, type=pa.bool_())],
            names=["doc_id", "n_overlap", "n_shingles", "contaminated"])

    return ds.map_batches(score, batch_format="pyarrow",
                          batch_size=4096).sort("doc_id")


def doc_tfidf_top_terms(sf_dir: str):
    """Per-document top TF-IDF candidate: the term with the highest
    in-doc frequency (ties -> lexicographically smallest), its document
    frequency over the whole corpus, and tf * ln(N/df) rounded to 6.

    Split convention is single-space (matching the oracle's
    ``string_split(text, ' ')``), empty tokens dropped.

    Output: (doc_id, term, tf, df, tfidf r6) sorted by doc_id.
    """
    import pyarrow.parquet as pq
    import ray.data as rd

    n_docs = pq.ParquetFile(f"{sf_dir}/documents.parquet").metadata.num_rows
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def counts(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas()
        ex = (df.assign(term=df["text"].str.split(" "))
              .loc[:, ["doc_id", "term"]].explode("term"))
        ex = ex[ex["term"] != ""]
        return (ex.groupby(["doc_id", "term"], as_index=False, sort=False)
                .agg(tf=("term", "size")))

    # docs are whole rows within a batch -> both the per-doc top and the
    # per-batch df partial are local to the batch
    def top_of(tc: pd.DataFrame) -> pd.DataFrame:
        return (tc.sort_values(["doc_id", "tf", "term"],
                               ascending=[True, False, True])
                .drop_duplicates("doc_id"))

    def top_batch(batch: pa.Table) -> pd.DataFrame:
        return top_of(counts(batch))

    def df_partial(batch: pa.Table) -> pd.DataFrame:
        tc = counts(batch)
        return (tc.groupby("term", as_index=False, sort=False)
                .agg(df=("doc_id", "size")))

    tops = ds.map_batches(top_batch, batch_format="pyarrow", batch_size=8192)
    dfreq = grouped_agg(
        ds.map_batches(df_partial, batch_format="pyarrow", batch_size=8192),
        ["term"], {"df": ("df", "sum")}, n_buckets=16)

    import ray

    cpus = int(ray.cluster_resources().get("CPU", 4)) if ray.is_initialized() else 4
    joined = tops.join(dfreq, join_type="inner",
                       num_partitions=max(2, cpus // 2), on=("term",))

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        tf = df["tf"].to_numpy(dtype=np.float64)
        dfr = df["df"].to_numpy(dtype=np.float64)
        tfidf = round_series(pd.Series(tf * np.log(float(n_docs) / dfr)), 6)
        return pd.DataFrame({"doc_id": df["doc_id"].astype("int64"),
                             "term": df["term"],
                             "tf": df["tf"].astype("int64"),
                             "df": df["df"].astype("int64"),
                             "tfidf": tfidf})

    return joined.map_batches(finish, batch_format="pandas").sort("doc_id")


def semdedup(sf_dir: str, threshold: float = 0.4):
    """SemDeDup-style semantic pruning: assign every embedding to its
    trained (per-label mean) centroid, then inside each cluster drop any
    vector that has an earlier (lower vec_id) cluster-mate with cosine
    similarity above the threshold. The dominated-by-earlier rule (not
    greedy chaining) keeps the op order-free and SQL-expressible.

    Cosine is f64 on normalized vectors and the comparison happens on
    ROUND(cos, 6) -- the same boundary convention as emb_neardup_exact,
    so the oracle agrees at the threshold.

    Scale note: per-cluster work is O(|cluster|^2) -- SemDeDup's contract
    is that the codebook size k scales with the corpus so clusters stay
    bounded (here k = |labels|; at 100 TB you'd train k ~ sqrt(N)
    centroids and this groupby shape is unchanged).

    Output: (vec_id,) survivors, sorted.
    """
    import ray
    import ray.data as rd

    from .scale_ops import trained_centroids

    cent_ref = ray.put(trained_centroids(sf_dir))
    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])

    # assignment inline (no join: Arrow hash joins reject list<float>
    # payloads and the vector must reach the per-cluster stage anyway);
    # the embedding rides the ONE keyed shuffle packed as f64 bytes.
    def assign(batch: pa.Table) -> pa.Table:
        labs, cents = ray.get(cent_ref)
        emb = batch.column("embedding")
        if isinstance(emb, pa.ChunkedArray):
            emb = emb.combine_chunks()
        dim = cents.shape[1]
        mat = (emb.flatten().to_numpy(zero_copy_only=False)
               .astype(np.float64).reshape(-1, dim))
        diff = mat[:, None, :] - cents[None, :, :]
        dist = np.einsum("nkd,nkd->nk", diff, diff)
        nearest = labs[np.argmin(dist, axis=1)]
        packed = [row.tobytes() for row in mat]
        return pa.Table.from_arrays(
            [batch.column("vec_id"), pa.array(nearest),
             pa.array(packed, type=pa.binary())],
            names=["vec_id", "assigned_label", "vec_bytes"])

    assigned = ds.map_batches(assign, batch_format="pyarrow", batch_size=8192)

    def prune(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values("vec_id")
        mat = np.stack([np.frombuffer(b, dtype=np.float64)
                        for b in g["vec_bytes"]])
        norms = np.linalg.norm(mat, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        mat = mat / norms
        raw = mat @ mat.T
        # half-away-from-zero at 6 digits, matching DuckDB ROUND
        cos = np.where(raw >= 0, np.floor(raw * 1e6 + 0.5) / 1e6,
                       -np.floor(-raw * 1e6 + 0.5) / 1e6)
        # dominated: any earlier row (strict lower triangle) above threshold
        tri = np.tril(cos > threshold, k=-1)
        dominated = tri.any(axis=1)
        return pd.DataFrame({"vec_id": g["vec_id"].to_numpy()[~dominated]})

    return (assigned.groupby("assigned_label")
            .map_groups(prune, batch_format="pandas")
            .sort("vec_id"))
