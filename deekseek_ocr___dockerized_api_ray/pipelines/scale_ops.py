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
