"""Substring-level exact deduplication (ExactSubstr semantics).

Finds every maximal word-span that appears verbatim >= 2 times anywhere
in the corpus (including a second occurrence inside the same document)
and removes the covered words -- the removal semantics of Lee et al.
2021, "Deduplicating Training Data Makes Language Models Better"
(arXiv:2107.06499), at word k-gram grain: a position is part of a
duplicated substring of length >= k words IFF some k-window covering it
occurs >= 2 times, so the union of duplicated k-gram extents is EXACTLY
the ExactSubstr removal mask at threshold k. This replaces the paper's
monolithic suffix array with shapes the engine already has:

  pass 1: per-batch k-gram partial counts (one row per distinct gram
          per batch) -> grouped_agg -> grams with total count >= 2
  gate:   the duplicated-gram set broadcasts once (``ray.put``) when it
          has <= ``broadcast_grams`` entries; above the gate the second
          scan emits (gram, doc_id, pos) rows and an inner hash join
          keeps the duplicated ones (the driver never holds the set)
  pass 2: seed positions merge into maximal spans per doc -- a local
          per-batch operation below the gate, one slim (doc_id, pos)
          keyed shuffle above it

No counterpart in the reference repo (a single-document OCR service);
this is part of the training-data operator suite mandated beyond it.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..stages.agg import grouped_agg

#: Above this many distinct duplicated grams the seed attach switches
#: from a broadcast set to a distributed hash join.
BROADCAST_GRAMS = 2_000_000


def _docs(sf_dir: str):
    import ray.data as rd

    return rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])


def _batch_grams(df: pd.DataFrame, k: int):
    """All overlapping k-word grams of a batch: (gram, doc_id, pos)
    numpy arrays, pos 1-based. Vectorized over the batch's flat word
    array (no per-document Python loop)."""
    words = df["text"].str.split(" ")
    lens = words.str.len().to_numpy(dtype=np.int64)
    npos = np.maximum(lens - k + 1, 0)
    total = int(npos.sum())
    if total == 0:
        e = np.empty(0, dtype=object)
        return e, np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
    flat = np.concatenate([np.empty(0, dtype=object), *words.to_numpy()])
    doc_starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
    pos0 = np.arange(total) - np.repeat(
        np.concatenate(([0], np.cumsum(npos)[:-1])), npos)
    win_start = np.repeat(doc_starts, npos) + pos0
    gram = flat[win_start].copy()
    for j in range(1, k):
        gram = gram + " "
        gram = gram + flat[win_start + j]
    doc_ids = np.repeat(df["doc_id"].to_numpy(dtype=np.int64), npos)
    return gram, doc_ids, pos0 + 1


def _dup_grams(docs, k: int, n_buckets: int):
    """Dataset of gram strings whose total corpus occurrence count >= 2
    (within-doc repeats count, per ExactSubstr)."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        gram, _, _ = _batch_grams(df, k)
        if len(gram) == 0:
            return pd.DataFrame({"gram": pd.Series([], dtype="object"),
                                 "n": pd.Series([], dtype="int64")})
        return (pd.DataFrame({"gram": gram})
                .groupby("gram", as_index=False, sort=False)
                .agg(n=("gram", "size")))

    counts = grouped_agg(
        docs.map_batches(partial, batch_format="pandas", batch_size=8192),
        ["gram"], {"n": ("n", "sum")}, n_buckets=n_buckets)
    return counts.map_batches(
        lambda df: df[df["n"] >= 2][["gram"]],
        batch_format="pandas", batch_size=131072)


def _seed_positions(docs, k: int, broadcast_grams: int, n_buckets: int):
    """(doc_id, pos) rows for every duplicated k-gram occurrence."""
    import ray

    dup = _dup_grams(docs, k, n_buckets).materialize()
    n_dup = dup.count()

    if n_dup <= broadcast_grams:
        # bound: gated at broadcast_grams distinct duplicated grams
        # (inner hash join above the gate)
        gset = set(r["gram"] for r in dup.iter_rows())
        gref = ray.put(gset)

        def seeds_local(df: pd.DataFrame) -> pd.DataFrame:
            gs = ray.get(gref)
            gram, doc_ids, pos = _batch_grams(df, k)
            hit = pd.Series(gram).isin(gs).to_numpy()
            return pd.DataFrame({"doc_id": doc_ids[hit], "pos": pos[hit]})

        return docs.map_batches(seeds_local, batch_format="pandas",
                                batch_size=8192)

    from ..stages.joins import default_num_partitions

    def emit(df: pd.DataFrame) -> pd.DataFrame:
        gram, doc_ids, pos = _batch_grams(df, k)
        return pd.DataFrame({"gram": gram, "doc_id": doc_ids, "pos": pos})

    occ = docs.map_batches(emit, batch_format="pandas", batch_size=8192)
    joined = occ.join(dup, join_type="inner",
                      num_partitions=default_num_partitions(n_dup),
                      on=("gram",), right_on=("gram",))
    return joined.select_columns(["doc_id", "pos"])


def _merge_islands(df: pd.DataFrame, k: int) -> pd.DataFrame:
    """Maximal spans from seed positions (vectorized gaps-and-islands);
    expects all seeds of a doc present in ``df``."""
    if df.empty:
        return pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                             "start_word": pd.Series([], dtype="int64"),
                             "end_word": pd.Series([], dtype="int64"),
                             "n_words": pd.Series([], dtype="int64")})
    df = df.sort_values(["doc_id", "pos"], kind="mergesort").reset_index(drop=True)
    df = df.assign(end=df["pos"] + (k - 1))
    df["run_end"] = df.groupby("doc_id", sort=False)["end"].cummax()
    prev_end = df.groupby("doc_id", sort=False)["run_end"].shift(1)
    new_island = prev_end.isna() | (df["pos"] > prev_end + 1)
    island = new_island.cumsum()
    out = (df.assign(island=island)
           .groupby(["doc_id", "island"], as_index=False, sort=False)
           .agg(start_word=("pos", "min"), end_word=("end", "max")))
    out["n_words"] = out["end_word"] - out["start_word"] + 1
    return out[["doc_id", "start_word", "end_word", "n_words"]].astype("int64")


def _spans_ds(seeds, k: int, n_buckets: int):
    from ..functions.text_stats import sha1_64

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        b = df["doc_id"].map(lambda d: sha1_64(str(d)) % n_buckets)
        return df.assign(bucket=b.astype(np.int32))

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        return _merge_islands(df.drop(columns=["bucket"]), k)

    return (seeds.map_batches(add_bucket, batch_format="pandas",
                              batch_size=131072)
            .groupby("bucket").map_groups(per_bucket, batch_format="pandas"))


def duplicated_substring_spans(sf_dir: str, k: int = 8,
                               broadcast_grams: int = BROADCAST_GRAMS,
                               n_buckets: int = 64):
    """Maximal duplicated word-spans per document: every maximal run of
    words covered by some k-gram occurring >= 2 times in the corpus.

    Output: (doc_id, start_word, end_word, n_words), positions 1-based
    inclusive, sorted by (doc_id, start_word).
    """
    docs = _docs(sf_dir)
    seeds = _seed_positions(docs, k, broadcast_grams, n_buckets)
    return _spans_ds(seeds, k, n_buckets).sort(["doc_id", "start_word"])


def _rebuild_clean(df: pd.DataFrame, spans_by_doc: dict, k: int) -> pd.DataFrame:
    texts, removed = [], []
    for doc_id, text in zip(df["doc_id"].to_numpy(), df["text"].to_numpy()):
        spans = spans_by_doc.get(int(doc_id))
        if not spans:
            texts.append(text)
            removed.append(0)
            continue
        ws = text.split(" ")
        mask = np.zeros(len(ws), dtype=bool)
        for s, e in spans:
            mask[s - 1:e] = True
        texts.append(" ".join(w for w, m in zip(ws, mask) if not m))
        removed.append(int(mask.sum()))
    return pd.DataFrame({"doc_id": df["doc_id"].to_numpy(dtype=np.int64),
                         "clean_text": texts,
                         "n_removed_words": np.asarray(removed, dtype=np.int64)})


def substring_dedup_clean(sf_dir: str, k: int = 8,
                          broadcast_grams: int = BROADCAST_GRAMS,
                          broadcast_spans: int = 4_000_000,
                          n_buckets: int = 64):
    """ExactSubstr removal: documents with every duplicated word-span
    (per ``duplicated_substring_spans``) deleted.

    Output: (doc_id, clean_text, n_removed_words).

    The span table broadcasts when it has <= ``broadcast_spans`` rows
    (spans are rare relative to documents -- they exist only where text
    duplicates); above the gate it hash-joins back to the documents.
    """
    import ray

    docs = _docs(sf_dir)
    seeds = _seed_positions(docs, k, broadcast_grams, n_buckets)
    spans = _spans_ds(seeds, k, n_buckets).materialize()
    n_spans = spans.count()

    if n_spans <= broadcast_spans:
        # bound: gated at broadcast_spans span rows (hash join back to
        # the documents above the gate)
        by_doc: dict = {}
        for r in spans.iter_rows():
            by_doc.setdefault(int(r["doc_id"]), []).append(
                (int(r["start_word"]), int(r["end_word"])))
        sref = ray.put(by_doc)

        def clean_local(df: pd.DataFrame) -> pd.DataFrame:
            return _rebuild_clean(df, ray.get(sref), k)

        return docs.map_batches(clean_local, batch_format="pandas",
                                batch_size=8192)

    from ..stages.joins import default_num_partitions

    def pack(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["doc_id", "start_word"], kind="mergesort")
        enc = (df["start_word"].astype(str) + "-" + df["end_word"].astype(str))
        g = pd.DataFrame({"doc_id": df["doc_id"].to_numpy(), "enc": enc.to_numpy()})
        return g.groupby("doc_id", as_index=False, sort=False).agg(
            spans_enc=("enc", ",".join))

    # per-batch partial packs, then one keyed merge per doc (span order
    # inside the encoding is irrelevant: the rebuild takes a mask UNION)
    packed = (
        spans.map_batches(pack, batch_format="pandas", batch_size=131072)
        .groupby("doc_id").map_groups(
            lambda df: pd.DataFrame(
                {"doc_id": [df["doc_id"].iloc[0]],
                 "spans_enc": [",".join(df["spans_enc"])]})
            if len(df) else df,
            batch_format="pandas")
    )
    joined = docs.join(packed, join_type="left_outer",
                       num_partitions=default_num_partitions(n_spans),
                       on=("doc_id",), right_on=("doc_id",))

    def clean_joined(df: pd.DataFrame) -> pd.DataFrame:
        by_doc = {}
        for doc_id, enc in zip(df["doc_id"].to_numpy(), df["spans_enc"].to_numpy()):
            if isinstance(enc, str) and enc:
                by_doc[int(doc_id)] = [
                    tuple(int(x) for x in p.split("-")) for p in enc.split(",")]
        return _rebuild_clean(df, by_doc, k)

    return joined.map_batches(clean_joined, batch_format="pandas",
                              batch_size=8192)
