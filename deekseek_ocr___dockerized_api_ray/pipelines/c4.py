"""C4-style page cleaning (Raffel et al. 2020, section 2.2): the
published line- and page-level heuristics every web-scale text pipeline
runs before quality scoring --

  line rules (drop the line):   fewer than 3 words; does not end in a
                                terminal punctuation mark (. ! ? ");
                                contains the word "javascript"
  page rules (drop the page):   contains "lorem ipsum"; contains a
                                curly bracket; fewer than 5 sentences
                                after line filtering

The fixture documents are clean single-line text, so -- like the media
table (pipelines/media.py) and the rendered HTML pages
(stages/boilerplate.py) -- the raw-page LINE view is synthesized
DETERMINISTICALLY from each document: words pack into fixed 12-word
lines, each line draws its terminal punctuation from
md5_number_lower(doc_id:p{i}) % 8 (25% of lines get none, so the punct
rule actually fires), and three hash-gated boilerplate lines are
appended ("enable javascript ...", "lorem ipsum ...", a curly-brace
config line) so every rule has real positives. The SQL oracle rebuilds
the identical line table inline and applies the same predicates, so
the whole gate is value-checked end to end.

Scale shape: the line view is a pure function of (doc_id, text) --
stateless vectorized map_batches, ZERO shuffle; at 100 TB this is one
streaming pass like doc_quality/gopher_gate.
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions.hashing import _hash64

#: fixed word stride -- SQL replicates the packing with list_slice
LINE_WORDS = 12

#: md5 % 8 -> terminal char (6, 7 -> none); index by residue
_PUNCT = [".", ".", ".", "!", "?", '"', "", ""]

_JS_LINE = "enable javascript to view the full article content here."
_LOREM_LINE = "lorem ipsum dolor sit amet consectetur adipiscing elit sed do."
_BRACE_LINE = "window config block { colors: dark } end."

_TERMINAL = (".", "!", "?", '"')


def page_lines(doc_id: int, text: str) -> List[str]:
    """The deterministic raw-page line view of one document: 12-word
    body lines with hash-drawn terminal punctuation, then the
    hash-gated boilerplate lines (javascript gate 1-in-5, lorem
    1-in-11, curly brace 1-in-13)."""
    words = text.split()
    lines = []
    for i in range(0, max(len(words) + LINE_WORDS - 1, 0) // LINE_WORDS):
        body = " ".join(words[i * LINE_WORDS:(i + 1) * LINE_WORDS])
        p = _PUNCT[_hash64(f"{doc_id}:p{i}") % 8]
        lines.append(body + p)
    if _hash64(f"{doc_id}:js") % 5 == 0:
        lines.append(_JS_LINE)
    if _hash64(f"{doc_id}:lorem") % 11 == 0:
        lines.append(_LOREM_LINE)
    if _hash64(f"{doc_id}:brace") % 13 == 0:
        lines.append(_BRACE_LINE)
    return lines


def clean_page(doc_id: int, text: str) -> Tuple[int, int, int, bool, bool, bool, str]:
    """Apply the C4 rules to one page; returns (n_lines, n_kept,
    n_sentences, has_lorem, has_brace, keep, clean_text)."""
    lines = page_lines(doc_id, text)
    kept = [
        ln for ln in lines
        if len(ln.split()) >= 3
        and ln.endswith(_TERMINAL)
        and "javascript" not in ln.lower()
    ]
    page_text = "\n".join(lines)
    clean_text = "\n".join(kept)
    n_sentences = sum(clean_text.count(c) for c in ".!?")
    has_lorem = "lorem ipsum" in page_text.lower()
    has_brace = "{" in page_text
    keep = (not has_lorem) and (not has_brace) and n_sentences >= 5
    return (len(lines), len(kept), n_sentences, has_lorem, has_brace,
            keep, clean_text)


def c4_filter(sf_dir: str):
    """The C4 cleaning gate over the synthesized raw-page view: per-doc
    line stats, the three page-level flags, the keep decision and the
    cleaned text (kept lines joined by newline).

    Output: (doc_id, n_lines, n_kept, n_sentences, has_lorem,
    has_brace, keep, clean_text) sorted by doc_id.
    """
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])

    def gate(batch: pa.Table) -> pd.DataFrame:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        texts = batch.column("text").to_pylist()
        rows = [clean_page(int(d), t) for d, t in zip(ids, texts)]
        cols = list(zip(*rows)) if rows else [[]] * 7
        return pd.DataFrame({
            "doc_id": pd.Series(ids, dtype="int64"),
            "n_lines": pd.Series(cols[0], dtype="int64"),
            "n_kept": pd.Series(cols[1], dtype="int64"),
            "n_sentences": pd.Series(cols[2], dtype="int64"),
            "has_lorem": pd.Series(cols[3], dtype=bool),
            "has_brace": pd.Series(cols[4], dtype=bool),
            "keep": pd.Series(cols[5], dtype=bool),
            "clean_text": pd.Series(cols[6], dtype=object),
        })

    return ds.map_batches(gate, batch_format="pyarrow",
                          batch_size=8192).sort("doc_id")


def c4_keep_rate(sf_dir: str):
    """Per-source C4 keep rate + mean kept-line share -- the corpus
    health view of the gate (what fraction of each source survives C4,
    and how much of each page's text the line rules keep). One combiner
    pass at source grain, zero wide shuffle.

    Output: (source, n_docs, n_keep, keep_rate r6, kept_line_share r6)
    sorted by source.
    """
    import ray.data as rd

    from ..functions.rounding import round_series
    from ..stages.agg import grouped_agg

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text", "source"])

    def partial(batch: pa.Table) -> pd.DataFrame:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        texts = batch.column("text").to_pylist()
        srcs = batch.column("source").to_pylist()
        n_docs, n_keep, n_lines, n_kept = {}, {}, {}, {}
        for d, t, s in zip(ids, texts, srcs):
            nl, nk, _, _, _, keep, _ = clean_page(int(d), t)
            n_docs[s] = n_docs.get(s, 0) + 1
            n_keep[s] = n_keep.get(s, 0) + int(keep)
            n_lines[s] = n_lines.get(s, 0) + nl
            n_kept[s] = n_kept.get(s, 0) + nk
        return pd.DataFrame({
            "source": list(n_docs),
            "n_docs": np.array(list(n_docs.values()), dtype=np.int64),
            "n_keep": np.array(list(n_keep.values()), dtype=np.int64),
            "n_lines": np.array(list(n_lines.values()), dtype=np.int64),
            "n_kept": np.array(list(n_kept.values()), dtype=np.int64),
        })

    agg = grouped_agg(ds.map_batches(partial, batch_format="pyarrow",
                                     batch_size=8192),
                      ["source"],
                      {"n_docs": ("n_docs", "sum"),
                       "n_keep": ("n_keep", "sum"),
                       "n_lines": ("n_lines", "sum"),
                       "n_kept": ("n_kept", "sum")},
                      # bound-static: source grain
                      n_buckets=8).to_pandas().sort_values("source")
    out = pd.DataFrame({
        "source": agg["source"],
        "n_docs": agg["n_docs"].astype("int64"),
        "n_keep": agg["n_keep"].astype("int64"),
        "keep_rate": round_series(
            agg["n_keep"].astype(np.float64)
            / agg["n_docs"].astype(np.float64), 6),
        "kept_line_share": round_series(
            agg["n_kept"].astype(np.float64)
            / agg["n_lines"].astype(np.float64), 6),
    }).reset_index(drop=True)
    return rd.from_pandas(out)


def _line_explode(sf_dir: str):
    """(doc_id, line_idx, line) rows of the raw-page view. A document
    is one input row, so its lines never span batches -- per-batch
    distinct-doc partials sum to exact global distinct-doc counts (the
    repeated_media_census argument)."""
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])

    def explode(batch: pa.Table) -> pd.DataFrame:
        out_d, out_i, out_l = [], [], []
        for d, t in zip(batch.column("doc_id").to_numpy(),
                        batch.column("text").to_pylist()):
            for i, ln in enumerate(page_lines(int(d), t)):
                out_d.append(int(d))
                out_i.append(i)
                out_l.append(ln)
        return pd.DataFrame({"doc_id": pd.Series(out_d, dtype="int64"),
                             "line_idx": pd.Series(out_i, dtype="int64"),
                             "line": pd.Series(out_l, dtype=object)})

    return ds.map_batches(explode, batch_format="pyarrow", batch_size=8192)


def _line_census(sf_dir: str, min_docs: int, n_buckets: int = 64):
    """Lines whose distinct-doc frequency >= min_docs, with occurrence
    counts: per-batch (line -> n_occurrences, n_docs) partials, ONE
    keyed reduce at line grain. The shuffle moves one row per distinct
    line per batch, never page text."""
    from ..stages.agg import grouped_agg

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({"line": pd.Series(dtype=object),
                                 "n_occurrences": pd.Series(dtype="int64"),
                                 "n_docs": pd.Series(dtype="int64")})
        return df.groupby("line", as_index=False).agg(
            n_occurrences=("doc_id", "size"),
            n_docs=("doc_id", "nunique"))

    agg = grouped_agg(
        _line_explode(sf_dir).map_batches(partial, batch_format="pandas",
                                          batch_size=131072),
        ["line"],
        {"n_occurrences": ("n_occurrences", "sum"),
         "n_docs": ("n_docs", "sum")},
        n_buckets=n_buckets)

    def keep(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["n_docs"] >= min_docs].copy()
        df["n_occurrences"] = df["n_occurrences"].astype("int64")
        df["n_docs"] = df["n_docs"].astype("int64")
        return df[["line", "n_docs", "n_occurrences"]]

    return agg.map_batches(keep, batch_format="pandas")


def boilerplate_lines(sf_dir: str, min_docs: int = 2):
    """Cross-document LINE census (the CCNet paragraph-hash / RefinedWeb
    duplicated-lines signal): lines of the raw-page view that occur in
    >= min_docs distinct documents -- the nav/footer/notice boilerplate
    a line-level dedup pass removes. The injected page furniture
    (javascript / lorem / brace lines) repeats across 8-20% of docs, so
    the census has guaranteed positives at every scale.

    Output: (line, n_docs, n_occurrences) sorted by line.
    """
    return _line_census(sf_dir, min_docs).sort("line")


def line_dedup_clean(sf_dir: str, min_docs: int = 5,
                     broadcast_lines: int = 2_000_000,
                     n_buckets: int = 64):
    """Line-level cross-document dedup (CCNet, Wenzek et al. 2020;
    RefinedWeb, Penedo et al. 2023): delete every line that occurs in
    >= min_docs distinct documents, keeping the page otherwise intact.

    Scale shape: the duplicated-line set broadcasts once (``ray.put``)
    when it has <= broadcast_lines rows -- boilerplate is by definition
    high-frequency, so the >= min_docs census is tiny relative to the
    corpus; above the gate the removal set hash-joins back to the
    exploded lines and the removed line_idx list packs per doc (the
    substring_dedup_clean two-path shape).

    Output: (doc_id, n_lines, n_removed, clean_text) sorted by doc_id.
    """
    import ray
    import ray.data as rd

    dup = _line_census(sf_dir, min_docs, n_buckets) \
        .select_columns(["line"]).materialize()
    n_dup = dup.count()

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])

    def rebuild(df: pd.DataFrame, removed_idx: dict) -> pd.DataFrame:
        out = {"doc_id": [], "n_lines": [], "n_removed": [],
               "clean_text": []}
        for d, t in zip(df["doc_id"].to_numpy(), df["text"]):
            d = int(d)
            lines = page_lines(d, t)
            rm = removed_idx.get(d, ())
            kept = [ln for i, ln in enumerate(lines) if i not in rm]
            out["doc_id"].append(d)
            out["n_lines"].append(len(lines))
            out["n_removed"].append(len(lines) - len(kept))
            out["clean_text"].append("\n".join(kept))
        res = pd.DataFrame(out)
        res["doc_id"] = res["doc_id"].astype("int64")
        res["n_lines"] = res["n_lines"].astype("int64")
        res["n_removed"] = res["n_removed"].astype("int64")
        return res

    if n_dup <= broadcast_lines:
        # bound: gated at broadcast_lines census rows (hash join back
        # to the exploded lines above the gate)
        dset = set(r["line"] for r in dup.iter_rows())
        dref = ray.put(dset)

        def clean_local(df: pd.DataFrame) -> pd.DataFrame:
            ds_ = ray.get(dref)
            out = {"doc_id": [], "n_lines": [], "n_removed": [],
                   "clean_text": []}
            for d, t in zip(df["doc_id"].to_numpy(), df["text"]):
                lines = page_lines(int(d), t)
                kept = [ln for ln in lines if ln not in ds_]
                out["doc_id"].append(int(d))
                out["n_lines"].append(len(lines))
                out["n_removed"].append(len(lines) - len(kept))
                out["clean_text"].append("\n".join(kept))
            res = pd.DataFrame(out)
            for c in ("doc_id", "n_lines", "n_removed"):
                res[c] = res[c].astype("int64")
            return res

        return docs.map_batches(clean_local, batch_format="pandas",
                                batch_size=8192).sort("doc_id")

    from ..stages.joins import default_num_partitions

    removed = _line_explode(sf_dir).join(
        dup, join_type="inner",
        num_partitions=default_num_partitions(n_dup),
        on=("line",), right_on=("line",)).select_columns(
            ["doc_id", "line_idx"])

    def pack(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                                 "idx_enc": pd.Series(dtype=object)})
        g = df.copy()
        g["idx_enc"] = g["line_idx"].astype(str)
        return g.groupby("doc_id", as_index=False, sort=False).agg(
            idx_enc=("idx_enc", ",".join))

    packed = (removed.map_batches(pack, batch_format="pandas",
                                  batch_size=131072)
              .groupby("doc_id").map_groups(
                  lambda df: pd.DataFrame(
                      {"doc_id": [df["doc_id"].iloc[0]],
                       "idx_enc": [",".join(df["idx_enc"])]})
                  if len(df) else df,
                  batch_format="pandas"))
    joined = docs.join(packed, join_type="left_outer",
                       num_partitions=default_num_partitions(n_dup),
                       on=("doc_id",), right_on=("doc_id",))

    def clean_joined(df: pd.DataFrame) -> pd.DataFrame:
        by_doc = {}
        for doc_id, enc in zip(df["doc_id"].to_numpy(),
                               df["idx_enc"].to_numpy()):
            if isinstance(enc, str) and enc:
                by_doc[int(doc_id)] = {int(x) for x in enc.split(",")}
        return rebuild(df, by_doc)

    return joined.map_batches(clean_joined, batch_format="pandas",
                              batch_size=8192).sort("doc_id")


def badword_gate(sf_dir: str, salt: str = "naughty", modulus: int = 37):
    """C4's word-blocklist page filter (Raffel et al. 2020, section
    2.2: any page containing a word from the "List of Dirty, Naughty,
    Obscene or Otherwise Bad Words" is removed).  The published list is
    a STATIC lexicon; this fixture stands it in with a deterministic
    hash gate -- a token is on the blocklist iff
    ``md5_number_lower(salt:token) % modulus == 0`` -- so the oracle
    reproduces membership without external data (the repo-wide
    hash-gated-fixture convention; at the defaults exactly one corpus
    vocabulary word is "bad" and both keeps and drops are well
    populated at every scale).

    Scale shape: membership is a pure function of the token, so the
    gate is ONE stateless vectorized streaming pass, zero shuffle --
    identical to production, where the static list broadcasts once
    (``ray.put`` of a frozenset / Bloom filter) and the per-batch test
    is the same unique-term membership probe.

    Output: (doc_id, n_tokens, n_bad, keep) sorted by doc_id; keep is
    the C4 decision (no blocklist occurrence).
    """
    import ray.data as rd

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])

    def gate(batch: pa.Table) -> pd.DataFrame:
        ids = np.asarray(batch.column("doc_id").to_pylist(), dtype=np.int64)
        texts = batch.column("text").to_pylist()
        toks = [t.split() for t in texts]
        lens = np.asarray([len(t) for t in toks], dtype=np.int64)
        flat = np.asarray([w for t in toks for w in t], dtype=object)
        didx = np.repeat(np.arange(len(ids)), lens)
        n_bad = np.zeros(len(ids), dtype=np.int64)
        if len(flat):
            uniq, inv = np.unique(flat, return_inverse=True)
            # membership probe at UNIQUE-term grain (the broadcast-set
            # lookup in production); ~vocab hashes per batch, not per token
            bad = np.asarray([_hash64(f"{salt}:{u}") % modulus == 0
                              for u in uniq])
            np.add.at(n_bad, didx, bad[inv].astype(np.int64))
        return pd.DataFrame({"doc_id": ids, "n_tokens": lens,
                             "n_bad": n_bad, "keep": n_bad == 0})

    return docs.map_batches(gate, batch_format="pyarrow").sort("doc_id")
