"""End-to-end training-data prep: the composite pipeline a corpus team
actually runs, chaining the engine's text operators in their canonical
order. One lazy Dataset graph -- every stage streams, the only
exchanges are exact-dedup's hash bucket shuffle, the MinHash band
shuffle, and the packing shard groupby.

    read (pruned) -> clean (reference-exact chain) -> language gate
    -> quality gate (length / stopword / repetition) -> exact dedup
    -> MinHash near-dedup survivors -> sequence packing

Returns the pack plan rows joined with per-doc provenance columns so a
caller can audit why any document survived. The stage gates are the
standard web-corpus heuristics (Gopher-flavored), parameterized so
tests can widen/narrow them.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

from ..functions.cleaning import clean_content
from ..functions.text_stats import (
    TOKEN_RE,
    detect_language,
    quality_metrics,
    repetition_metrics,
)


def prep_corpus(sf_dir: str, keep_langs=("en", "de", "fr", "es"),
                min_tokens: int = 5, max_stopword_ratio: float = 1.0,
                max_dup_line_frac: float = 0.5, minhash_threshold: float = 0.8,
                max_tokens_per_seq: int = 512, n_shards: int = 16):
    """Run the full prep chain; returns one row per surviving doc:
    (doc_id, lang_pred, n_tokens, shard, bin_id, oversize)."""
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    return _prep_chain(ds, keep_langs, min_tokens, max_stopword_ratio,
                       max_dup_line_frac, minhash_threshold,
                       max_tokens_per_seq, n_shards)


def web_prep_corpus(sf_dir: str, keep_langs=("en", "de", "fr", "es"),
                    min_tokens: int = 5, max_stopword_ratio: float = 1.0,
                    max_dup_line_frac: float = 0.5,
                    minhash_threshold: float = 0.8,
                    max_tokens_per_seq: int = 512, n_shards: int = 16):
    """The extraction-tier composite: raw HTML pages -> DOM block parse
    + densitometric boilerplate strip (stages/boilerplate) -> the same
    gate -> dedup -> pack chain as ``prep_corpus``. One lazy Dataset
    graph from markup to pack plan -- the pipeline shape of the
    north-star main-content extraction service."""
    from ..stages.boilerplate import HtmlContentStage, _html_pages

    content = _html_pages(sf_dir).map_batches(
        HtmlContentStage(mode="content"),
        batch_format="pandas", batch_size=256,
    )

    def as_text(df: pd.DataFrame) -> pd.DataFrame:
        out = df[["doc_id", "main_text"]].rename(columns={"main_text": "text"})
        return out

    ds = content.map_batches(as_text, batch_format="pandas")
    return _prep_chain(ds, keep_langs, min_tokens, max_stopword_ratio,
                       max_dup_line_frac, minhash_threshold,
                       max_tokens_per_seq, n_shards)


def _prep_chain(ds, keep_langs, min_tokens, max_stopword_ratio,
                max_dup_line_frac, minhash_threshold, max_tokens_per_seq,
                n_shards):
    from ..stages.dedup import exact_dedup, minhash_dedup
    from ..stages.packing import pack_sequences

    keep_set = set(keep_langs)

    def clean_and_gate(batch: pa.Table) -> pa.Table:
        ids, texts, langs = [], [], []
        for i, t in zip(batch.column("doc_id").to_pylist(),
                        batch.column("text").to_pylist()):
            c = clean_content(t, remove_page_splits=True)
            lang = detect_language(c)
            if lang not in keep_set:
                continue
            q = quality_metrics(c)
            if q["n_tokens"] < min_tokens:
                continue
            if q["stopword_ratio"] > max_stopword_ratio:
                continue
            r = repetition_metrics(c)
            if r["dup_line_frac"] > max_dup_line_frac:
                continue
            ids.append(i)
            texts.append(c)
            langs.append(lang)
        return pa.Table.from_arrays(
            [pa.array(ids, type=pa.int64()), pa.array(texts, type=pa.string()),
             pa.array(langs, type=pa.string())],
            names=["doc_id", "text", "lang_pred"],
        )

    gated = ds.map_batches(clean_and_gate, batch_format="pyarrow")
    # BRANCH-POINT CACHES: minhash_dedup consumes its input THREE times
    # (signatures, pair verify, survivor filter) and `survivors` feeds
    # both the pack plan and the provenance join.  Ray Data re-executes
    # the upstream graph once per consumer, so without pinning these two
    # points the whole render -> parse -> clean -> gate chain runs 4-5x.
    # materialize() holds the (gate-shrunk) corpus in the object store
    # -- the idiomatic multi-consumer cache; it spills under pressure.
    deduped = exact_dedup(gated, text_col="text", id_col="doc_id").materialize()
    survivors = minhash_dedup(deduped, threshold=minhash_threshold).materialize()

    plan = pack_sequences(survivors, max_tokens=max_tokens_per_seq,
                          n_shards=n_shards)

    # provenance attach: survivors' lang back onto the plan rows (small
    # per-shard hash join expressed as a bucketed cogroup)
    lang_side = survivors.select_columns(["doc_id", "lang_pred"])
    import ray

    cpus = int(ray.cluster_resources().get("CPU", 4)) if ray.is_initialized() else 4
    joined = plan.join(
        lang_side, join_type="inner", num_partitions=max(2, cpus // 2),
        on=("doc_id",), right_on=("doc_id",),
    )

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        for c in ("doc_id", "n_tokens", "bin_id"):
            df[c] = df[c].astype("int64")
        return df[["doc_id", "lang_pred", "n_tokens", "shard", "bin_id",
                   "oversize"]]

    return joined.map_batches(finish, batch_format="pandas")
