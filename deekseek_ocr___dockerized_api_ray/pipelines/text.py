"""Text-analysis pipelines over the ``documents`` table.

Each function reads only the columns it needs and runs one stateless
vectorized ``map_batches``; column names line up with the DuckDB oracle
SQL in __ray_entry__ (same regexes, same rounding).
"""

from __future__ import annotations

from typing import List

import pyarrow as pa

from ..functions.cleaning import clean_content
from ..functions.text_stats import (
    detect_language,
    md5_fingerprint,
    quality_metrics,
    token_count,
)


def _docs(sf_dir: str, columns: List[str]):
    import ray.data as rd

    return rd.read_parquet(f"{sf_dir}/documents.parquet", columns=columns)


def doc_token_stats(sf_dir: str):
    """(doc_id, n_tokens, n_chars_calc) -- whitespace tokens + char count."""
    ds = _docs(sf_dir, ["doc_id", "text"])

    def stats(batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        return pa.Table.from_arrays(
            [
                batch.column("doc_id").combine_chunks(),
                pa.array([token_count(t) for t in texts], type=pa.int64()),
                pa.array([len(t) for t in texts], type=pa.int64()),
            ],
            names=["doc_id", "n_tokens", "n_chars_calc"],
        )

    return ds.map_batches(stats, batch_format="pyarrow")


def doc_quality(sf_dir: str):
    """(doc_id, n_chars, n_tokens, avg_token_len, punct_ratio,
    stopword_ratio) -- Boilerpipe-style density/quality signals, r6."""
    ds = _docs(sf_dir, ["doc_id", "text"])

    def q(batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        ms = [quality_metrics(t) for t in texts]
        return pa.Table.from_arrays(
            [
                batch.column("doc_id").combine_chunks(),
                pa.array([m["n_chars"] for m in ms], type=pa.int64()),
                pa.array([m["n_tokens"] for m in ms], type=pa.int64()),
                pa.array([m["avg_token_len"] for m in ms], type=pa.float64()),
                pa.array([m["punct_ratio"] for m in ms], type=pa.float64()),
                pa.array([m["stopword_ratio"] for m in ms], type=pa.float64()),
            ],
            names=["doc_id", "n_chars", "n_tokens", "avg_token_len",
                   "punct_ratio", "stopword_ratio"],
        )

    return ds.map_batches(q, batch_format="pyarrow")


def doc_clean_text(sf_dir: str):
    """(doc_id, clean_text): the reference clean_content chain applied to
    the documents table (remove_page_splits on, no image extraction)."""
    ds = _docs(sf_dir, ["doc_id", "text"])

    def clean(batch: pa.Table) -> pa.Table:
        texts = [clean_content(t, remove_page_splits=True) for t in batch.column("text").to_pylist()]
        return pa.Table.from_arrays(
            [batch.column("doc_id").combine_chunks(), pa.array(texts, type=pa.string())],
            names=["doc_id", "clean_text"],
        )

    return ds.map_batches(clean, batch_format="pyarrow")


def doc_fingerprint(sf_dir: str):
    """(doc_id, fingerprint): md5 of lower+whitespace-collapsed text."""
    ds = _docs(sf_dir, ["doc_id", "text"])

    def fp(batch: pa.Table) -> pa.Table:
        fps = [md5_fingerprint(t) for t in batch.column("text").to_pylist()]
        return pa.Table.from_arrays(
            [batch.column("doc_id").combine_chunks(), pa.array(fps, type=pa.string())],
            names=["doc_id", "fingerprint"],
        )

    return ds.map_batches(fp, batch_format="pyarrow")


def lang_count(sf_dir: str):
    """(lang, n_docs): groupby-count over the labeled lang column."""
    from ..stages.agg import grouped_agg

    ds = _docs(sf_dir, ["lang"])
    return grouped_agg(ds, ["lang"], {"n_docs": ("lang", "size")}, n_buckets=8)


def langid_predict(sf_dir: str):
    """(doc_id, lang_pred): heuristic n-gram/stopword language ID
    (SQL-oracled: oracles.langid_predict_sql replicates the marker-word
    counts and first-max-wins tie-break)."""
    ds = _docs(sf_dir, ["doc_id", "text"])

    def lid(batch: pa.Table) -> pa.Table:
        preds = [detect_language(t) for t in batch.column("text").to_pylist()]
        return pa.Table.from_arrays(
            [batch.column("doc_id").combine_chunks(), pa.array(preds, type=pa.string())],
            names=["doc_id", "lang_pred"],
        )

    return ds.map_batches(lid, batch_format="pyarrow")


def exact_dedup_docs(sf_dir: str):
    """(doc_id, text): survivors after exact dedup (min doc_id per text)."""
    from ..stages.dedup import exact_dedup

    ds = _docs(sf_dir, ["doc_id", "text"])
    return exact_dedup(ds, text_col="text", id_col="doc_id")


def doc_repetition(sf_dir: str):
    """(doc_id, dup_line_frac, dup_line_char_frac, top_2gram_char_frac):
    Gopher-style repetition quality signals (SQL-oracled)."""
    from ..functions.text_stats import repetition_metrics

    ds = _docs(sf_dir, ["doc_id", "text"])

    def rep(batch: pa.Table) -> pa.Table:
        ms = [repetition_metrics(t) for t in batch.column("text").to_pylist()]
        return pa.Table.from_arrays(
            [batch.column("doc_id").combine_chunks(),
             pa.array([m["dup_line_frac"] for m in ms], type=pa.float64()),
             pa.array([m["dup_line_char_frac"] for m in ms], type=pa.float64()),
             pa.array([m["top_2gram_char_frac"] for m in ms], type=pa.float64())],
            names=["doc_id", "dup_line_frac", "dup_line_char_frac",
                   "top_2gram_char_frac"],
        )

    return ds.map_batches(rep, batch_format="pyarrow")


def corpus_top_ngrams(sf_dir: str, n: int = 2, k: int = 50):
    """Corpus-wide top-k word n-grams by total occurrence count (the
    heavy-hitter statistic used for tokenizer/vocab work).

    Combiner shape: per-batch Counter partial (one row per (gram, batch)
    crosses the wire, not one per occurrence) -> bucketed keyed reduce ->
    global sort + limit with a lexicographic tie-break.

    Output: (gram, n_occurrences).
    """
    from collections import Counter

    from ..functions.text_stats import TOKEN_RE
    from ..stages.agg import grouped_agg

    ds = _docs(sf_dir, ["text"])

    def partial(batch: pa.Table) -> pa.Table:
        c = Counter()
        for t in batch.column("text").to_pylist():
            words = TOKEN_RE.findall(t)
            c.update(" ".join(words[i : i + n]) for i in range(len(words) - n + 1))
        return pa.Table.from_arrays(
            [pa.array(list(c.keys()), type=pa.string()),
             pa.array(list(c.values()), type=pa.int64())],
            names=["gram", "n_occurrences"],
        )

    partials = ds.map_batches(partial, batch_format="pyarrow")
    total = grouped_agg(partials, ["gram"], {"n_occurrences": ("n_occurrences", "sum")})

    def cast(df):
        df["n_occurrences"] = df["n_occurrences"].astype("int64")
        return df

    return (
        total.map_batches(cast, batch_format="pandas")
        .sort(["n_occurrences", "gram"], descending=[True, False])
        .limit(k)
    )


def doc_length_quantiles(sf_dir: str):
    """(lang, p25, p50, p75): exact linear-interpolation quantiles of doc
    character length per language.

    Bucketed-by-lang keyed shuffle; each group computes its quantiles
    with one vectorized numpy percentile (numpy 'linear' == DuckDB
    quantile_cont). Exact per-group quantiles require the group's values
    in one task -- fine for per-LANG groups (bounded cardinality, value
    vector = 8 bytes/doc); for unbounded groups switch to a mergeable
    quantile sketch.
    """
    import numpy as np
    import pandas as pd

    from ..functions.rounding import round_half_away
    from ..functions.text_stats import sha1_64

    ds = _docs(sf_dir, ["lang", "text"])

    def prep(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        langs = batch.column("lang")
        lens = pc.utf8_length(batch.column("text"))
        bucket = pa.array([sha1_64(v) % 8 for v in langs.to_pylist()], type=pa.int32())
        return pa.Table.from_arrays(
            [langs.combine_chunks(), lens.combine_chunks()
             if isinstance(lens, pa.ChunkedArray) else lens, bucket],
            names=["lang", "n_chars", "bucket"],
        )

    def quant(group: pd.DataFrame) -> pd.DataFrame:
        out = []
        for lang, g in group.groupby("lang", sort=False):
            v = g["n_chars"].to_numpy(dtype=np.float64)
            p25, p50, p75 = np.percentile(v, [25, 50, 75], method="linear")
            out.append({"lang": lang,
                        "p25": round_half_away(float(p25), 6),
                        "p50": round_half_away(float(p50), 6),
                        "p75": round_half_away(float(p75), 6)})
        return pd.DataFrame(out, columns=["lang", "p25", "p50", "p75"])

    return (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(lambda df: quant(df.drop(columns=["bucket"])), batch_format="pandas")
    )


def stratified_sample(sf_dir: str, rates: dict | None = None, mod: int = 10000):
    """Deterministic per-language stratified sample: keep a doc iff
    ``md5_number_lower(doc_id) % mod < mod * rate[lang]`` -- the standard
    reproducible hash-gate for data mixing (same doc always lands on the
    same side, independent of partitioning/row order; no RNG state).

    Output: (doc_id, lang). Languages absent from ``rates`` keep 0.
    """
    import hashlib

    ds = _docs(sf_dir, ["doc_id", "lang"])
    rates = rates or {"en": 0.5, "de": 0.25, "fr": 0.25, "es": 0.25, "zh": 1.0}
    cuts = {lang: int(mod * r) for lang, r in rates.items()}

    def keep(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        langs = batch.column("lang").to_pylist()
        mask = []
        for d, lang in zip(ids, langs):
            # hash the DECIMAL-STRING form so the SQL oracle's implicit
            # int->varchar cast computes the identical md5
            h = int.from_bytes(hashlib.md5(str(d).encode()).digest()[8:], "little")
            mask.append(h % mod < cuts.get(lang, 0))
        return batch.filter(pa.array(mask, type=pa.bool_()))

    return ds.map_batches(keep, batch_format="pyarrow")


def doc_scrub_pii(sf_dir: str):
    """(doc_id, scrubbed, n_urls, n_emails, n_phones): emails/URLs/phone
    runs replaced by placeholder tokens (SQL-oracled; fixed URL ->
    email -> phone order)."""
    from ..functions.text_stats import scrub_pii

    ds = _docs(sf_dir, ["doc_id", "text"])

    def scrub(batch: pa.Table) -> pa.Table:
        rs = [scrub_pii(t) for t in batch.column("text").to_pylist()]
        return pa.Table.from_arrays(
            [batch.column("doc_id").combine_chunks(),
             pa.array([r["scrubbed"] for r in rs], type=pa.string()),
             pa.array([r["n_urls"] for r in rs], type=pa.int64()),
             pa.array([r["n_emails"] for r in rs], type=pa.int64()),
             pa.array([r["n_phones"] for r in rs], type=pa.int64())],
            names=["doc_id", "scrubbed", "n_urls", "n_emails", "n_phones"],
        )

    return ds.map_batches(scrub, batch_format="pyarrow")


def train_test_split(sf_dir: str, train_pct: int = 80, val_pct: int = 10,
                     mod: int = 100):
    """Deterministic 3-way split for data mixing: every doc lands in
    train/val/test by ``md5_number_lower(doc_id) % mod`` against the
    cumulative cut points -- reproducible across runs, partitionings and
    row orders (no RNG state to ship), and any shard can be re-derived
    independently (the property a resumable 100 TB mixing job needs).

    Output: (doc_id, split) with split in {'train','val','test'}.
    """
    import hashlib

    ds = _docs(sf_dir, ["doc_id"])
    c1, c2 = train_pct, train_pct + val_pct

    def tag(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        splits = []
        for d in ids:
            h = int.from_bytes(hashlib.md5(str(d).encode()).digest()[8:],
                               "little") % mod
            splits.append("train" if h < c1 else ("val" if h < c2 else "test"))
        return pa.Table.from_arrays(
            [batch.column("doc_id").combine_chunks(),
             pa.array(splits, type=pa.string())],
            names=["doc_id", "split"])

    return ds.map_batches(tag, batch_format="pyarrow")


def term_cooccurrence(sf_dir: str, k: int = 50):
    """Top-k co-occurring term pairs across the corpus with pointwise
    mutual information: pairs of DISTINCT terms appearing in the same
    document (term_a < term_b), ranked by document co-count, with
    pmi = ln(n_ab * N / (n_a * n_b)) over document frequencies.

    Shape: the pair explosion is per-doc local (distinct terms within a
    row), per-batch partial counts slim the exchange, then a bucketed
    grouped_agg reduces pair counts; marginals come from a second tiny
    keyed reduce and join the k survivors on the driver (k rows).

    Output: (term_a, term_b, n_ab, pmi r6) ranked by (n_ab desc,
    term_a, term_b), top k.
    """
    from itertools import combinations

    import numpy as np
    import pandas as pd
    import pyarrow.parquet as pq

    from ..functions.rounding import round_series
    from ..stages.agg import grouped_agg

    n_docs = pq.ParquetFile(f"{sf_dir}/documents.parquet").metadata.num_rows
    ds = _docs(sf_dir, ["doc_id", "text"])

    def pair_partial(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas()
        rows_a, rows_b = [], []
        for text in df["text"]:
            terms = sorted(set(t for t in text.split(" ") if t))
            for a, b in combinations(terms, 2):
                rows_a.append(a)
                rows_b.append(b)
        part = pd.DataFrame({"term_a": rows_a, "term_b": rows_b})
        return (part.groupby(["term_a", "term_b"], as_index=False, sort=False)
                .agg(n_ab=("term_a", "size")))

    def df_partial(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas()
        ex = (df.assign(term=df["text"].str.split(" "))
              .loc[:, ["doc_id", "term"]].explode("term"))
        ex = ex[ex["term"] != ""].drop_duplicates()
        return (ex.groupby("term", as_index=False, sort=False)
                .agg(n=("doc_id", "size")))

    pairs = grouped_agg(
        ds.map_batches(pair_partial, batch_format="pyarrow", batch_size=2048),
        ["term_a", "term_b"], {"n_ab": ("n_ab", "sum")}, n_buckets=64)
    marg = grouped_agg(
        ds.map_batches(df_partial, batch_format="pyarrow", batch_size=8192),
        ["term"], {"n": ("n", "sum")}, n_buckets=16)

    top = (pairs.sort(["n_ab", "term_a", "term_b"],
                      descending=[True, False, False])
           # bound: limit(k)
           .limit(k).to_pandas())
    # only the <=2k marginal rows the survivors touch reach the driver
    needed = set(top["term_a"]) | set(top["term_b"])
    mrows = marg.map_batches(
        lambda df: df[df["term"].isin(needed)], batch_format="pandas"
    # bound: marginals of the <= 2k terms in the top-k pairs
    ).to_pandas()
    mdf = dict(zip(mrows["term"], mrows["n"]))
    na = top["term_a"].map(mdf).to_numpy(dtype=np.float64)
    nb = top["term_b"].map(mdf).to_numpy(dtype=np.float64)
    pmi = np.log(top["n_ab"].to_numpy(dtype=np.float64) * float(n_docs)
                 / (na * nb))
    top["n_ab"] = top["n_ab"].astype("int64")
    top["pmi"] = round_series(pd.Series(pmi), 6)
    return top


def weighted_sample_topk(sf_dir: str, k: int = 100):
    """Deterministic weighted sampling without replacement (Efraimidis-
    Spirakis A-ES): every doc gets key = ln(u) / w with u a hash-derived
    uniform in (0,1] (md5 of the doc_id string -- no RNG state) and
    w = n_chars; the k LARGEST keys win. One streaming pass emitting a
    per-batch local top-k, then a tiny global top-k -- the distributed
    weighted reservoir, reproducible under any partitioning.

    Output: (doc_id, n_chars, skey r6) sorted by skey desc, doc_id.
    """
    import hashlib

    import numpy as np
    import pandas as pd

    from ..functions.rounding import round_series

    ds = _docs(sf_dir, ["doc_id", "n_chars"])
    m = float(1 << 53)

    def local_top(batch: pa.Table) -> pd.DataFrame:
        ids = batch.column("doc_id").to_pylist()
        w = np.asarray(batch.column("n_chars").to_pylist(), dtype=np.float64)
        u = np.array(
            [(int.from_bytes(hashlib.md5(str(d).encode()).digest()[8:],
                             "little") % (1 << 53)) + 1 for d in ids],
            dtype=np.float64) / m
        key = np.log(u) / w
        order = np.argsort(-key)[:k]
        return pd.DataFrame({
            "doc_id": np.asarray(ids, dtype=np.int64)[order],
            "n_chars": np.asarray(batch.column("n_chars").to_pylist(),
                                  dtype=np.int64)[order],
            "skey": key[order],
        })

    tops = ds.map_batches(local_top, batch_format="pyarrow", batch_size=8192)
    final = (tops.sort(["skey", "doc_id"], descending=[True, False])
             # bound: limit(k)
             .limit(k).to_pandas())
    final["skey"] = round_series(final["skey"], 6)
    return final


def lang_top_terms(sf_dir: str, k: int = 5):
    """Per-language top-k terms by total occurrences (tf desc, term asc
    tie-break) -- grouped heavy hitters over the exploded token stream.
    Shape: per-batch partial counts per (lang, term) -> bucketed
    grouped_agg -> per-lang top-k via a keyed groupby over the tiny
    (|langs| x |vocab|) aggregate.

    Output: (lang, term, tf, rk) sorted by lang, rk.
    """
    import numpy as np
    import pandas as pd

    from ..stages.agg import grouped_agg

    ds = _docs(sf_dir, ["lang", "text"])

    def counts(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas()
        ex = (df.assign(term=df["text"].str.split(" "))
              .loc[:, ["lang", "term"]].explode("term"))
        ex = ex[ex["term"] != ""]
        return (ex.groupby(["lang", "term"], as_index=False, sort=False)
                .agg(tf=("term", "size")))

    agg = grouped_agg(
        ds.map_batches(counts, batch_format="pyarrow", batch_size=8192),
        ["lang", "term"], {"tf": ("tf", "sum")}, n_buckets=16)

    def topk(group: pd.DataFrame) -> pd.DataFrame:
        g = (group.sort_values(["tf", "term"], ascending=[False, True])
             .head(k).reset_index(drop=True))
        g["rk"] = np.arange(1, len(g) + 1, dtype=np.int64)
        g["tf"] = g["tf"].astype("int64")
        return g[["lang", "term", "tf", "rk"]]

    return (agg.groupby("lang").map_groups(topk, batch_format="pandas")
            .sort(["lang", "rk"]))


def lang_sample_exact_k(sf_dir: str, k: int = 10):
    """Exact-k deterministic sample per language: within each language,
    the k docs with the SMALLEST ``md5_number_lower(doc_id)`` hash (ties
    by doc_id) win -- the fixed-size counterpart of the rate-gate
    ``stratified_sample``, reproducible under any partitioning.

    Shape: one streaming pass emitting a per-batch local top-k per
    language, then a tiny global reduce over (|langs| x k x n_batches)
    candidate rows -- the distributed per-group reservoir; nothing
    corpus-sized is collected.

    Output: (lang, doc_id, rk) sorted by lang, rk.
    """
    import hashlib

    import numpy as np
    import pandas as pd

    ds = _docs(sf_dir, ["doc_id", "lang"])

    def local_top(batch: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame({
            "doc_id": np.asarray(batch.column("doc_id").to_pylist(),
                                 dtype=np.int64),
            "lang": batch.column("lang").to_pylist(),
        })
        # decimal-string md5 (DuckDB's implicit int->varchar cast parity)
        df["h"] = [
            np.uint64(int.from_bytes(
                hashlib.md5(str(d).encode()).digest()[8:], "little"))
            for d in df["doc_id"]
        ]
        return (df.sort_values(["lang", "h", "doc_id"])
                .groupby("lang", as_index=False, sort=False).head(k))

    tops = ds.map_batches(local_top, batch_format="pyarrow", batch_size=8192)

    def final(df: pd.DataFrame) -> pd.DataFrame:
        win = (df.sort_values(["lang", "h", "doc_id"])
               .groupby("lang", as_index=False, sort=False).head(k))
        win = win.sort_values(["lang", "h", "doc_id"])
        win["rk"] = win.groupby("lang", sort=False).cumcount() + 1
        return win[["lang", "doc_id", "rk"]].astype(
            {"doc_id": "int64", "rk": "int64"})

    # candidate set is tiny (per-batch k per lang); one reduce call
    return (tops.repartition(1).map_batches(final, batch_format="pandas")
            .sort(["lang", "rk"]))


def levenshtein_vec(a: str, b: str) -> int:
    """Unit-cost edit distance with the vectorized row DP: the insertion
    recurrence cur[j] = min_k<=j (cur[k] + (j - k)) collapses to a
    running minimum of (cur - j), so each DP row is O(1) numpy calls."""
    import numpy as np

    if a == b:
        return 0
    aa = np.frombuffer(a.encode("utf-32-le"), dtype=np.uint32)
    bb = np.frombuffer(b.encode("utf-32-le"), dtype=np.uint32)
    m = len(bb)
    idx = np.arange(m + 1)
    prev = idx.astype(np.int64)
    cur = np.empty(m + 1, dtype=np.int64)
    for i, ca in enumerate(aa, 1):
        cur[0] = i
        cur[1:] = np.minimum(prev[1:] + 1, prev[:-1] + (bb != ca))
        cur = np.minimum.accumulate(cur - idx) + idx
        prev, cur = cur, prev
    return int(prev[-1])


def edit_distance_topk(sf_dir: str, query_ids=(0, 1, 2), k: int = 5):
    """String-similarity search: for each query document, the k nearest
    same-language documents by Levenshtein distance (ties by doc_id) --
    the text counterpart of the embedding ANN suite, with the same
    broadcast-queries / per-batch local top-k / tiny global reduce
    shape. The corpus streams; only (queries x k) candidate rows per
    batch cross the wire.

    Output: (query_id, doc_id, dist, rank) sorted query_id, rank.
    """
    import numpy as np
    import pandas as pd
    import ray

    ds = _docs(sf_dir, ["doc_id", "text", "lang"])
    qset = set(int(q) for q in query_ids)

    def pick(batch: pa.Table) -> pa.Table:
        keep = [int(v) in qset for v in batch.column("doc_id").to_pylist()]
        return batch.filter(pa.array(keep, type=pa.bool_()))

    # bound: |query_ids| rows (point filter)
    qrows = ds.map_batches(pick, batch_format="pyarrow").take_all()
    qrows.sort(key=lambda r: int(r["doc_id"]))
    q_ref = ray.put([(int(r["doc_id"]), r["text"], r["lang"]) for r in qrows])

    def local_top(batch: pa.Table) -> pd.DataFrame:
        queries = ray.get(q_ref)
        ids = np.asarray(batch.column("doc_id").to_pylist(), dtype=np.int64)
        texts = batch.column("text").to_pylist()
        langs = batch.column("lang").to_pylist()
        out_q, out_id, out_d = [], [], []
        for qid, qt, ql in queries:
            cand = [(levenshtein_vec(t, qt), int(i))
                    for i, t, l in zip(ids, texts, langs)
                    if l == ql and int(i) != qid]
            cand.sort()
            for d, i in cand[:k]:
                out_q.append(qid)
                out_id.append(i)
                out_d.append(d)
        return pd.DataFrame({"query_id": np.asarray(out_q, dtype=np.int64),
                             "doc_id": np.asarray(out_id, dtype=np.int64),
                             "dist": np.asarray(out_d, dtype=np.int64)})

    # row-wise DP work: small batches so the task pool actually fans out
    tops = ds.map_batches(local_top, batch_format="pyarrow", batch_size=512)
    final = (tops.sort(["query_id", "dist", "doc_id"])
             # bound: |blocks| x k x |queries| local-top candidates
             .to_pandas().groupby("query_id", as_index=False).head(k))
    final = final.reset_index(drop=True)
    final["rank"] = final.groupby("query_id", sort=False).cumcount() + 1
    final["rank"] = final["rank"].astype("int64")
    return final


def part_name_jw_pairs(sf_dir: str, threshold: float = 0.85,
                       chunk_pairs: int = 500_000):
    """Record-linkage blocking join over the DISTINCT part-name
    dictionary: block on the first word (the Winkler prefix head), then
    all-pairs Jaro-Winkler INSIDE each block via the vectorized pair
    kernel (functions/jaro.py -- bit-exact vs DuckDB's
    ``jaro_winkler_similarity``, verified on 20k random pairs), keeping
    pairs >= ``threshold``.

    Scale shape: linkage runs over the distinct-NAME dictionary (grows
    sublinearly vs the row table), never the raw rows; one keyed
    exchange on the block key; per-block work is quadratic only within
    a block and chunked to bound memory. Because kernel and oracle
    produce IDENTICAL doubles, the threshold compares raw values -- no
    rounding guard, no boundary flap.

    Output: (name_a, name_b, jw r6) sorted name_a, name_b.
    """
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from ..functions.jaro import jaro_winkler_pairs
    from ..functions.rounding import round_series
    from ..stages.agg import grouped_agg

    ds = rd.read_parquet(f"{sf_dir}/part.parquet", columns=["p_name"])

    def batch_distinct(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"p_name": df["p_name"].unique()})

    names = grouped_agg(
        ds.map_batches(batch_distinct, batch_format="pandas",
                       batch_size=65536),
        ["p_name"], {"n": ("p_name", "size")}, n_buckets=8)

    def with_block(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "p_name": df["p_name"].to_numpy(),
            "blk": df["p_name"].str.split(" ").str[0].to_numpy(),
        })

    def pairs_of(df: pd.DataFrame) -> pd.DataFrame:
        nm = np.sort(df["p_name"].to_numpy())
        ii, jj = np.triu_indices(len(nm), k=1)
        out_a: list = []
        out_b: list = []
        out_jw: list = []
        for lo in range(0, len(ii), chunk_pairs):
            a = nm[ii[lo: lo + chunk_pairs]]
            b = nm[jj[lo: lo + chunk_pairs]]
            jw = jaro_winkler_pairs(list(a), list(b))
            keep = jw >= threshold
            out_a.append(a[keep])
            out_b.append(b[keep])
            out_jw.append(jw[keep])
        if not out_a:
            return pd.DataFrame({"name_a": [], "name_b": [], "jw": []})
        return pd.DataFrame({
            "name_a": np.concatenate(out_a),
            "name_b": np.concatenate(out_b),
            "jw": round_series(pd.Series(np.concatenate(out_jw)), 6).to_numpy(),
        })

    return (names.map_batches(with_block, batch_format="pandas")
            .groupby("blk")
            .map_groups(lambda df: pairs_of(df.drop(columns=["blk"])),
                        batch_format="pandas")
            .sort(["name_a", "name_b"]))


def term_graph_stats(sf_dir: str, n_buckets: int = 32):
    """Triangle count + global clustering coefficient of the STRONG
    term co-occurrence graph (edges with doc co-count > 1.02x the
    average co-count -- an all-integer, scale-free compare
    ``n*P*50 > 51*S``, so the edge set is bitwise-stable in both
    engines and non-degenerate at every sf).

    Distribution shape: edge counts are a combiner + one keyed reduce
    (the term_cooccurrence build); wedges come from per-MIDDLE-vertex
    adjacency groups (edges already satisfy a<b, so each triangle
    m<x<y is generated exactly once at its smallest vertex); candidate
    (x,y) wedge pairs hash-join the edge table to confirm closure.
    Degrees reduce per node.  Nothing corpus-sized touches the driver
    -- only the 4 report scalars.  Partitioning note: per-middle wedge
    generation is quadratic in that vertex's degree; for web-scale
    graphs the standard mitigation (degree-ordered orientation) is
    exactly the a<b orientation already used here.

    Output: one row (n_nodes, n_edges, n_wedges, n_triangles,
    clustering r6).
    """
    import numpy as np
    import pandas as pd

    from ..functions.rounding import round_series
    from ..stages.agg import grouped_agg

    ds = _docs(sf_dir, ["doc_id", "text"])

    def pair_partial(batch: pa.Table) -> pd.DataFrame:
        from itertools import combinations

        df = batch.to_pandas()
        rows_a, rows_b = [], []
        for text in df["text"]:
            terms = sorted(set(t for t in text.split(" ") if t))
            for a, b in combinations(terms, 2):
                rows_a.append(a)
                rows_b.append(b)
        part = pd.DataFrame({"a": rows_a, "b": rows_b})
        return (part.groupby(["a", "b"], as_index=False, sort=False)
                .agg(n=("a", "size")))

    edges = grouped_agg(
        ds.map_batches(pair_partial, batch_format="pyarrow", batch_size=2048),
        ["a", "b"], {"n": ("n", "sum")}, n_buckets=n_buckets).materialize()

    s_total = int(edges.sum("n"))
    p_total = int(edges.count())

    def strong_only(df: pd.DataFrame) -> pd.DataFrame:
        keep = df["n"].to_numpy(dtype=np.int64) * p_total * 50 > 51 * s_total
        return df.loc[keep, ["a", "b"]]

    strong = edges.map_batches(strong_only, batch_format="pandas").materialize()
    n_edges = int(strong.count())

    # degrees over both endpoints -> wedge count sum(d*(d-1)/2)
    def both_ends(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "node": np.concatenate([df["a"].to_numpy(), df["b"].to_numpy()]),
            "one": np.ones(2 * len(df), dtype=np.int64)})

    deg = grouped_agg(strong.map_batches(both_ends, batch_format="pandas"),
                      ["node"], {"d": ("one", "sum")}, n_buckets=8)

    def wedge_part(df: pd.DataFrame) -> pd.DataFrame:
        d = df["d"].to_numpy(dtype=np.int64)
        return pd.DataFrame({"w": [int((d * (d - 1) // 2).sum())],
                             "nodes": [len(d)]})

    wtab = deg.map_batches(wedge_part, batch_format="pandas")
    n_wedges = int(wtab.sum("w") or 0)
    n_nodes = int(wtab.sum("nodes") or 0)

    # wedge candidates at the smallest vertex; close via hash join
    def wedge_pairs(df: pd.DataFrame) -> pd.DataFrame:
        from itertools import combinations

        nb = np.sort(df["b"].to_numpy())
        xs, ys = [], []
        for x, y in combinations(nb, 2):
            xs.append(x)
            ys.append(y)
        return pd.DataFrame({"a": xs, "b": ys})

    cands = strong.groupby("a").map_groups(
        lambda df: wedge_pairs(df), batch_format="pandas")
    closed = cands.join(strong, join_type="inner", num_partitions=4,
                        on=("a", "b"))
    n_tri = int(closed.count())

    clustering = round_series(
        pd.Series([3.0 * n_tri / n_wedges if n_wedges else 0.0]), 6)[0]
    return pd.DataFrame({
        "n_nodes": pd.array([n_nodes], dtype="int64"),
        "n_edges": pd.array([n_edges], dtype="int64"),
        "n_wedges": pd.array([n_wedges], dtype="int64"),
        "n_triangles": pd.array([n_tri], dtype="int64"),
        "clustering": [clustering],
    })


def langid_confusion(sf_dir: str):
    """Language-ID quality matrix: (true lang, predicted lang, count)
    over the whole corpus -- the evaluation view of langid_predict.
    One streamed pass emits per-batch (lang, lang_pred) partial counts;
    a tiny 8-bucket reduce sums them (never one row per doc across the
    wire).

    Output: (lang, lang_pred, n_docs) sorted by (lang, lang_pred).
    """
    import pandas as pd

    from ..stages.agg import grouped_agg

    ds = _docs(sf_dir, ["lang", "text"])

    def part(batch: pa.Table) -> "pd.DataFrame":
        df = pd.DataFrame({
            "lang": batch.column("lang").to_pylist(),
            "lang_pred": [detect_language(t)
                          for t in batch.column("text").to_pylist()],
        })
        return df.groupby(["lang", "lang_pred"], as_index=False).agg(
            n_docs=("lang", "size"))

    parts = ds.map_batches(part, batch_format="pyarrow")
    return grouped_agg(parts, ["lang", "lang_pred"],
                       {"n_docs": ("n_docs", "sum")},
                       n_buckets=8).sort(["lang", "lang_pred"])


def source_pii_rate(sf_dir: str):
    """Corpus-safety report: per source, how many documents contain any
    PII (URL, email, or phone by the scrub_pii patterns) and the rate.
    Per-batch partial counts (docs are whole rows), one tiny keyed
    reduce -- integer counts so the rate divide is bit-identical to the
    oracle.

    Output: (source, n_docs, n_pii_docs, pii_rate r6) sorted by source.
    """
    import pandas as pd

    from ..functions.rounding import round_series
    from ..functions.text_stats import scrub_pii
    from ..stages.agg import grouped_agg

    ds = _docs(sf_dir, ["source", "text"])

    def part(batch: pa.Table) -> "pd.DataFrame":
        flags = []
        for t in batch.column("text").to_pylist():
            r = scrub_pii(t)
            flags.append(int(r["n_urls"] + r["n_emails"] + r["n_phones"] > 0))
        df = pd.DataFrame({"source": batch.column("source").to_pylist(),
                           "pii": flags})
        return df.groupby("source", as_index=False).agg(
            n_docs=("pii", "size"), n_pii_docs=("pii", "sum"))

    agg = grouped_agg(ds.map_batches(part, batch_format="pyarrow"),
                      ["source"],
                      {"n_docs": ("n_docs", "sum"),
                       "n_pii_docs": ("n_pii_docs", "sum")}, n_buckets=8)

    def finish(df: "pd.DataFrame") -> "pd.DataFrame":
        df["pii_rate"] = round_series(df["n_pii_docs"] / df["n_docs"], 6)
        df["n_docs"] = df["n_docs"].astype("int64")
        df["n_pii_docs"] = df["n_pii_docs"].astype("int64")
        return df[["source", "n_docs", "n_pii_docs", "pii_rate"]]

    return agg.map_batches(finish, batch_format="pandas").sort("source")


def lang_hapax_rate(sf_dir: str, n_buckets: int = 32):
    """Vocabulary richness per language: hapax legomena (tokens
    occurring exactly once in the language) as a share of the
    language's vocabulary -- the classic corpus-linguistics diagnostic.
    Per-batch (lang, token) partial counts, ONE token-keyed reduce,
    then a tiny per-lang rollup; integer counts so the rate divide is
    bit-identical to the oracle.

    Output: (lang, vocab, n_hapax, hapax_rate r6) sorted by lang.
    """
    import numpy as np
    import pandas as pd

    from ..functions.rounding import round_series
    from ..stages.agg import grouped_agg

    ds = _docs(sf_dir, ["lang", "text"])

    def part(batch: pa.Table) -> "pd.DataFrame":
        rows_l, rows_t = [], []
        for lang, t in zip(batch.column("lang").to_pylist(),
                           batch.column("text").to_pylist()):
            for tok in t.split():
                rows_l.append(lang)
                rows_t.append(tok)
        df = pd.DataFrame({"lang": rows_l, "token": rows_t})
        return df.groupby(["lang", "token"], as_index=False).agg(
            c=("token", "size"))

    per_tok = grouped_agg(ds.map_batches(part, batch_format="pyarrow"),
                          ["lang", "token"], {"c": ("c", "sum")},
                          n_buckets=n_buckets)

    def roll(df: pd.DataFrame) -> pd.DataFrame:
        df = df.assign(hapax=(df["c"] == 1).astype(np.int64),
                       one=np.ones(len(df), dtype=np.int64))
        return (df.groupby("lang", as_index=False)
                .agg(vocab=("one", "sum"), n_hapax=("hapax", "sum")))

    agg = grouped_agg(per_tok.map_batches(roll, batch_format="pandas"),
                      ["lang"], {"vocab": ("vocab", "sum"),
                                 "n_hapax": ("n_hapax", "sum")}, n_buckets=4)

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        df["hapax_rate"] = round_series(df["n_hapax"] / df["vocab"], 6)
        df["vocab"] = df["vocab"].astype("int64")
        df["n_hapax"] = df["n_hapax"].astype("int64")
        return df[["lang", "vocab", "n_hapax", "hapax_rate"]]

    return agg.map_batches(finish, batch_format="pandas").sort("lang")


def per_key_sample(sf_dir: str, n: int = 5, key_col: str = "source"):
    """Deterministic per-key sample: the ``n`` docs per ``key_col`` value
    that rank first by (md5_number_lower(doc_id), doc_id) -- a seedless,
    shuffle-free reservoir equivalent (the hash IS the random order, and
    it is the same order on any cluster size or batch layout).

    Shape: per-batch local prune to <= n rows per key (a batch can never
    contribute more than n survivors for a key), then ONE bucketed keyed
    reduce takes the global head-n per key. Shuffle volume <= n x
    |batches| x |keys-per-batch| rows, never the corpus.

    Output: (doc_id, source) sorted by doc_id.
    """
    import numpy as np
    import pandas as pd

    from ..functions.hashing import _hash64
    from ..functions.text_stats import sha1_64

    ds = _docs(sf_dir, ["doc_id", key_col])

    def local_prune(df: pd.DataFrame) -> pd.DataFrame:
        h = np.asarray([_hash64(str(int(d))) for d in df["doc_id"]],
                       dtype=np.uint64)
        d = df.assign(h=h).sort_values(["h", "doc_id"])
        d = d.groupby(key_col, sort=False).head(n)
        buckets = [sha1_64(str(v)) % 16 for v in d[key_col]]
        return d.assign(bucket=np.asarray(buckets, dtype=np.int32))

    def final(group: pd.DataFrame) -> pd.DataFrame:
        g = (group.sort_values(["h", "doc_id"])
             .groupby(key_col, sort=False).head(n))
        return g[["doc_id", key_col]].astype({"doc_id": "int64"})

    return (ds.map_batches(local_prune, batch_format="pandas",
                           batch_size=65536)
            .groupby("bucket").map_groups(final, batch_format="pandas")
            .sort("doc_id"))


def weighted_sample(sf_dir: str, k: int = 100, weight_col: str = "n_chars"):
    """Deterministic weighted sampling WITHOUT replacement (Efraimidis-
    Spirakis A-ES): each row's key is -ln(u)/w with u derived from the
    md5 hash of its doc_id (u = (h + 0.5) / 2^64 in double -- seedless
    and layout-independent) and w = ``weight_col``; the k smallest keys
    are the sample, giving inclusion probability proportional to weight.

    Shape: per-batch local top-k (a batch contributes at most k), then
    one distributed sort + limit(k) -- the corpus never moves.

    Output: (doc_id, n_chars, skey r6) sorted by doc_id.
    """
    import numpy as np
    import pandas as pd

    from ..functions.hashing import _hash64
    from ..functions.rounding import round_series

    ds = _docs(sf_dir, ["doc_id", weight_col])

    def local_top(df: pd.DataFrame) -> pd.DataFrame:
        h = np.asarray([float(_hash64(str(int(d)))) for d in df["doc_id"]],
                       dtype=np.float64)
        u = (h + 0.5) / 18446744073709551616.0
        key = -np.log(u) / df[weight_col].to_numpy(dtype=np.float64)
        return (df.assign(skey_raw=key)
                .sort_values(["skey_raw", "doc_id"]).head(k))

    got = (ds.map_batches(local_top, batch_format="pandas",
                          batch_size=65536)
           .sort(["skey_raw", "doc_id"]).limit(k))

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "doc_id": df["doc_id"].astype("int64"),
            weight_col: df[weight_col].astype("int64"),
            "skey": round_series(df["skey_raw"], 6),
        })

    return got.map_batches(finish, batch_format="pandas").sort("doc_id")


def inverted_index(sf_dir: str):
    """Build the term -> postings inverted index: per distinct term its
    document frequency and the comma-joined sorted doc-id posting list
    (the retrieval substrate; postings serialize as a string so the
    driver's value-hash compare is format-stable).

    Shape: per-batch distinct (term, doc_id) pairs, ONE keyed shuffle on
    the term, per-term vectorized assembly. Posting lists are the true
    output size; a web-scale deployment range-partitions the output by
    term (the groupby already is that partitioning).

    Output: (term, df, postings) sorted by term.
    """
    import numpy as np
    import pandas as pd

    from ..functions.text_stats import sha1_64

    ds = _docs(sf_dir, ["doc_id", "text"])

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        ex = (df.assign(term=df["text"].str.split())
              .loc[:, ["doc_id", "term"]].explode("term"))
        ex = ex[ex["term"].notna() & (ex["term"] != "")].drop_duplicates()
        b = np.asarray([sha1_64(t) % 32 for t in ex["term"]], dtype=np.int32)
        return ex.assign(bucket=b)

    def assemble(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["term", "doc_id"])
        out = (g.groupby("term", sort=True)
               .agg(df=("doc_id", "nunique"),
                    postings=("doc_id",
                              lambda s: ",".join(str(int(v))
                                                 for v in sorted(set(s)))))
               .reset_index())
        out["df"] = out["df"].astype("int64")
        return out[["term", "df", "postings"]]

    return (ds.map_batches(pairs, batch_format="pandas", batch_size=8192)
            .groupby("bucket").map_groups(assemble, batch_format="pandas")
            .sort("term"))


def bigram_lm_score(sf_dir: str, max_bigrams: int = 1_000_000,
                    max_contexts: int = 1_000_000):
    """Per-document bigram language-model score: the mean Laplace
    log-probability ln((c(w1,w2)+1) / (ctx(w1)+|V|)) over the doc's
    bigrams -- the classic LM-perplexity quality filter for training
    corpora.

    Scale shape (mirrors the tfidf vocab cap): both count tables are
    combiner-reduced then TOP-CAPPED before broadcast -- the top
    ``max_bigrams`` bigrams keep exact counts (a dropped bigram counts
    0, its Laplace numerator is 1 anyway) and the top ``max_contexts``
    contexts keep exact counts with the tail FLOORED at the last kept
    count (an upper bound on any dropped context -- tail docs are
    slightly over-penalized, never under). |V| is one distinct-count
    aggregate. Only the capped tables reach the driver.

    Output: (doc_id, n_bigrams, lm_score r6) for docs with >= 1 bigram,
    sorted by doc_id.
    """
    import math

    import numpy as np
    import pandas as pd
    import ray

    from ..functions.rounding import round_series
    from ..stages.agg import grouped_agg

    ds = _docs(sf_dir, ["doc_id", "text"])

    def big_part(df: pd.DataFrame) -> pd.DataFrame:
        from collections import Counter

        c: Counter = Counter()
        for t in df["text"]:
            ws = t.split()
            c.update(zip(ws[:-1], ws[1:]))
        ks = list(c.keys())
        return pd.DataFrame({"w1": [a for a, _ in ks],
                             "w2": [b for _, b in ks],
                             "c": [c[kk] for kk in ks]})

    bc_ds = grouped_agg(ds.map_batches(big_part, batch_format="pandas",
                                       batch_size=8192),
                        ["w1", "w2"], {"c": ("c", "sum")}, n_buckets=16)
    # bound: max_bigrams rows (top-cap, exact head of the count order)
    bc = (bc_ds.sort(["c", "w1", "w2"], descending=[True, False, False])
          .limit(max_bigrams).to_pandas())

    def ctx_part(df: pd.DataFrame) -> pd.DataFrame:
        from collections import Counter

        c: Counter = Counter()
        for t in df["text"]:
            ws = t.split()
            c.update(ws[:-1])
        return pd.DataFrame({"w1": list(c.keys()),
                             "c": list(c.values())})

    ctx_ds = grouped_agg(ds.map_batches(ctx_part, batch_format="pandas",
                                        batch_size=8192),
                         ["w1"], {"c": ("c", "sum")}, n_buckets=16)
    # bound: max_contexts rows (top-cap with tail floor)
    ctx = (ctx_ds.sort(["c", "w1"], descending=[True, False])
           .limit(max_contexts).to_pandas())
    ctx_floor = (int(ctx["c"].iloc[-1])
                 if len(ctx) == max_contexts else None)

    def tok_part(df: pd.DataFrame) -> pd.DataFrame:
        toks = set()
        for t in df["text"]:
            toks.update(t.split())
        return pd.DataFrame({"tok": sorted(toks)})

    # |V|: one distinct-count over the token stream (a scalar; HLL it at
    # web scale if exactness is not required)
    vocab = grouped_agg(ds.map_batches(tok_part, batch_format="pandas",
                                       batch_size=8192),
                        ["tok"], {"n": ("tok", "size")},
                        n_buckets=16).count()

    bc_map = {(a, b): int(c) for a, b, c in zip(bc["w1"], bc["w2"], bc["c"])}
    ctx_map = {w: int(c) for w, c in zip(ctx["w1"], ctx["c"])}
    model_ref = ray.put((bc_map, ctx_map, ctx_floor, int(vocab)))

    def score(df: pd.DataFrame) -> pd.DataFrame:
        bcm, cxm, cf, v = ray.get(model_ref)
        ids, nb, sc = [], [], []
        for did, t in zip(df["doc_id"], df["text"]):
            ws = t.split()
            if len(ws) < 2:
                continue
            s = 0.0
            for a, b in zip(ws[:-1], ws[1:]):
                cx = cxm.get(a, cf)
                s += math.log((bcm.get((a, b), 0) + 1) / (cx + v))
            ids.append(int(did))
            nb.append(len(ws) - 1)
            sc.append(s / (len(ws) - 1))
        return pd.DataFrame({"doc_id": pd.Series(ids, dtype="int64"),
                             "n_bigrams": pd.Series(nb, dtype="int64"),
                             "lm_score": round_series(pd.Series(sc), 6)})

    return ds.map_batches(score, batch_format="pandas",
                          batch_size=8192).sort("doc_id")


def doc_length_percentile(sf_dir: str):
    """Global percent_rank of every document's length -- the window
    function ``percent_rank() OVER (ORDER BY n_chars)`` WITHOUT a global
    sort: one combiner-reduced value histogram (the n_chars grain, not
    the corpus) broadcasts its cumulative counts, and a second streaming
    pass maps each row to cnt_smaller / (n - 1). Ties share a rank,
    exactly as SQL rank() does.

    Output: (doc_id, n_chars, pct_rank r6) sorted by doc_id.
    """
    import numpy as np
    import pandas as pd
    import ray

    from ..functions.rounding import round_series
    from ..stages.agg import grouped_agg

    ds = _docs(sf_dir, ["doc_id", "n_chars"])

    def hist_part(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("n_chars", as_index=False).agg(cnt=("n_chars", "size"))
        return g

    # bound: n_chars value grain (a histogram, never the corpus)
    hist = grouped_agg(ds.map_batches(hist_part, batch_format="pandas",
                                      batch_size=131072),
                       ["n_chars"], {"cnt": ("cnt", "sum")},
                       n_buckets=8).to_pandas().sort_values("n_chars")
    vals = hist["n_chars"].to_numpy(dtype=np.int64)
    cum_below = np.concatenate(([0], np.cumsum(
        hist["cnt"].to_numpy(dtype=np.int64))))[:-1]
    n_total = int(hist["cnt"].sum())
    cdf_ref = ray.put((vals, cum_below, n_total))

    def rank_batch(df: pd.DataFrame) -> pd.DataFrame:
        v, below, n = ray.get(cdf_ref)
        idx = np.searchsorted(v, df["n_chars"].to_numpy(dtype=np.int64))
        pr = below[idx] / max(n - 1, 1)
        return pd.DataFrame({
            "doc_id": df["doc_id"].astype("int64"),
            "n_chars": df["n_chars"].astype("int64"),
            "pct_rank": round_series(pd.Series(pr), 6),
        })

    return ds.map_batches(rank_batch, batch_format="pandas",
                          batch_size=131072).sort("doc_id")


def lang_term_logodds(sf_dir: str, max_vocab: int = 16, a0: float = 200.0,
                      k: int = 5, n_buckets: int = 16):
    """Per-language most-distinctive terms by log-odds ratio with an
    informative Dirichlet prior (Monroe/Colaresi/Quinn "Fightin' Words"):
    z = delta / sqrt(var) where delta compares a term's odds inside the
    language vs the rest of the corpus, shrunk toward the corpus
    distribution by the prior alpha_w = a0 * y_w / n.  Unlike tf top-k
    (lang_top_terms) this surfaces terms OVER-represented per language,
    the signal a corpus-mixing monitor wants.

    Scale shape: (lang, term) combiner counts -> term totals -> the
    vocabulary CAPPED at top-``max_vocab`` by corpus tf via a distributed
    sort+limit (the driver sees V rows, never the Heaps-law vocabulary);
    scoring is a vectorized map over the vocab-filtered (lang, term)
    aggregate with the V-term prior map and the |langs|-bounded totals
    broadcast; top-k per language is a keyed groupby over <= V rows per
    group.  Observed (lang, term) pairs only -- a vocab term absent from
    a language scores nothing (it could never rank in the top-k, z < 0).

    max_vocab=16 < the 31-token test vocabulary, so the cap branch is
    what the oracle checks.

    Output: (lang, term, y_lw, z r6, rk) sorted by lang, rk.
    """
    import numpy as np
    import pandas as pd
    import ray

    from ..functions.rounding import round_series
    from ..stages.agg import grouped_agg

    ds = _docs(sf_dir, ["lang", "text"])

    def counts(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas()
        ex = (df.assign(term=df["text"].str.split(" "))
              .loc[:, ["lang", "term"]].explode("term"))
        ex = ex[ex["term"] != ""]
        return (ex.groupby(["lang", "term"], as_index=False, sort=False)
                .agg(y=("term", "size")))

    lt = grouped_agg(
        ds.map_batches(counts, batch_format="pyarrow", batch_size=8192),
        ["lang", "term"], {"y": ("y", "sum")}, n_buckets=n_buckets)

    tv = grouped_agg(lt, ["term"], {"yw": ("y", "sum")}, n_buckets=n_buckets)
    # bound: max_vocab rows (the cap IS the bound; tail terms never leave
    # the cluster)
    vocab = (tv.sort(["yw", "term"], descending=[True, False])
             .limit(max_vocab).to_pandas())
    yw_map = dict(zip(vocab["term"], vocab["yw"].astype(np.int64)))
    n_total = float(vocab["yw"].sum())

    vocab_ref = ray.put(yw_map)

    def keep_vocab(df: pd.DataFrame) -> pd.DataFrame:
        vm = ray.get(vocab_ref)
        return df[df["term"].isin(vm)]

    l2 = lt.map_batches(keep_vocab, batch_format="pandas",
                        batch_size=131072)
    # bound: |langs| rows (language cardinality, not the corpus)
    nl = grouped_agg(l2, ["lang"], {"n_l": ("y", "sum")},
                     n_buckets=4).to_pandas()
    nl_map = dict(zip(nl["lang"], nl["n_l"].astype(np.int64)))
    nl_ref = ray.put(nl_map)

    def score(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({"lang": pd.Series([], dtype=object),
                                 "term": pd.Series([], dtype=object),
                                 "y_lw": pd.Series([], dtype="int64"),
                                 "z": pd.Series([], dtype="float64")})
        vm = ray.get(vocab_ref)
        nlm = ray.get(nl_ref)
        y = df["y"].to_numpy(dtype=np.float64)
        yw = df["term"].map(vm).to_numpy(dtype=np.float64)
        n_l = df["lang"].map(nlm).to_numpy(dtype=np.float64)
        n = n_total
        aw = a0 * yw / n
        delta = (np.log((y + aw) / (n_l + a0 - y - aw))
                 - np.log(((yw - y) + aw) / (n - n_l + a0 - (yw - y) - aw)))
        var = 1.0 / (y + aw) + 1.0 / ((yw - y) + aw)
        z = delta / np.sqrt(var)
        return pd.DataFrame({"lang": df["lang"].to_numpy(),
                             "term": df["term"].to_numpy(),
                             "y_lw": df["y"].to_numpy(dtype=np.int64),
                             "z": round_series(pd.Series(z), 6).to_numpy()})

    scored = l2.map_batches(score, batch_format="pandas",
                            batch_size=131072)

    def topk(group: pd.DataFrame) -> pd.DataFrame:
        g = (group.sort_values(["z", "term"], ascending=[False, True])
             .head(k).reset_index(drop=True))
        g["rk"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g[["lang", "term", "y_lw", "z", "rk"]]

    return (scored.groupby("lang").map_groups(topk, batch_format="pandas")
            .sort(["lang", "rk"]))


def corpus_zipf_fit(sf_dir: str, max_rank: int = 24, n_buckets: int = 16):
    """Zipf's-law fit over the corpus term-frequency distribution:
    OLS of ln(tf) on ln(rank) for the top-``max_rank`` terms (tf desc,
    term asc tie-break -- ties make rank order float-relevant, so both
    engines pin it).  The Zipf exponent s = -slope; r2 says how
    Zipf-like the corpus is (a synthetic/templated corpus shows up as a
    flat, high-r2-but-small-s profile).

    Scale shape: term totals are a combiner aggregate; the fit inputs
    come from a distributed sort+limit -- the driver sees max_rank
    rows, never the Heaps-law vocabulary.  max_rank=24 < the 31-token
    test vocabulary, so the driver checks the capped branch.

    Output: one row (n_terms, slope r6, intercept r6, r2 r6).
    """
    import numpy as np
    import pandas as pd

    from ..functions.rounding import round_series
    from ..stages.agg import grouped_agg

    ds = _docs(sf_dir, ["text"])

    def counts(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas()
        ex = df["text"].str.split(" ").explode()
        ex = ex[ex != ""]
        g = ex.value_counts().rename_axis("term").reset_index(name="tf")
        return g

    tv = grouped_agg(
        ds.map_batches(counts, batch_format="pyarrow", batch_size=8192),
        ["term"], {"tf": ("tf", "sum")}, n_buckets=n_buckets)

    # bound: max_rank rows (distributed sort+limit IS the cap)
    top = (tv.sort(["tf", "term"], descending=[True, False])
           .limit(max_rank).to_pandas())
    r = np.arange(1, len(top) + 1, dtype=np.float64)
    x = np.log(r)
    y = np.log(top["tf"].to_numpy(dtype=np.float64))
    n = float(len(top))
    sx, sy = x.sum(), y.sum()
    sxx, sxy, syy = (x * x).sum(), (x * y).sum(), (y * y).sum()
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    intercept = (sy - slope * sx) / n
    r2 = (n * sxy - sx * sy) ** 2 / ((n * sxx - sx * sx)
                                     * (n * syy - sy * sy))
    return pd.DataFrame({
        "n_terms": pd.array([int(n)], dtype="int64"),
        "slope": round_series(pd.Series([slope]), 6).to_numpy() + 0.0,
        "intercept": round_series(pd.Series([intercept]), 6).to_numpy() + 0.0,
        "r2": round_series(pd.Series([r2]), 6).to_numpy() + 0.0,
    })


def corpus_heaps_fit(sf_dir: str, n_checkpoints: int = 10,
                     n_buckets: int = 16):
    """Heaps'-law fit V = K * T^beta: vocabulary growth against token
    count along the doc_id order, sampled at ``n_checkpoints`` doc-id
    thresholds t_i = ((i+1) * max_id) // n  (exact integer math in both
    engines).  V_i counts terms whose FIRST containing doc_id <= t_i;
    T_i sums tokens of docs <= t_i.  OLS of ln V on ln T gives beta
    (typically 0.4-0.6 on natural text; ~0 on a closed-vocabulary
    corpus -- exactly the synthetic-data signature this audits).

    Scale shape: per-term min-doc and per-doc token counts are combiner
    aggregates (two keyed shuffles on the term / doc grain); each term
    and doc then folds into its checkpoint BUCKET, so only
    n_checkpoints partial rows reach the driver, never the vocabulary
    or the corpus.  The docstring of `corpus_zipf_fit` covers the
    rank-capped frequency twin.

    Output: one row (n_points, beta r6, lnk r6, r2 r6).
    """
    import numpy as np
    import pandas as pd

    from ..functions.rounding import round_series
    from ..stages.agg import grouped_agg

    ds = _docs(sf_dir, ["doc_id", "text"])

    max_id = int(ds.max("doc_id"))
    thr = np.array([((i + 1) * max_id) // n_checkpoints
                    for i in range(n_checkpoints)], dtype=np.int64)

    def tok_rows(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas()
        ex = (df.assign(term=df["text"].str.split(" "))
              .loc[:, ["doc_id", "term"]].explode("term"))
        ex = ex[ex["term"] != ""]
        cnt = ex.groupby("doc_id").size()
        bkt = np.searchsorted(thr, cnt.index.to_numpy(dtype=np.int64),
                              side="left")
        g = pd.DataFrame({"bkt": bkt,
                          "ntok": cnt.to_numpy(dtype=np.int64)})
        return g.groupby("bkt", as_index=False).agg(ntok=("ntok", "sum"))

    tsum = grouped_agg(
        ds.map_batches(tok_rows, batch_format="pyarrow", batch_size=8192),
        ["bkt"], {"ntok": ("ntok", "sum")}, n_buckets=4)

    def term_first(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas()
        ex = (df.assign(term=df["text"].str.split(" "))
              .loc[:, ["doc_id", "term"]].explode("term"))
        ex = ex[ex["term"] != ""]
        return (ex.groupby("term", as_index=False)
                .agg(fdoc=("doc_id", "min")))

    fd = grouped_agg(
        ds.map_batches(term_first, batch_format="pyarrow", batch_size=8192),
        ["term"], {"fdoc": ("fdoc", "min")}, n_buckets=n_buckets)

    def first_bucket(df: pd.DataFrame) -> pd.DataFrame:
        bkt = np.searchsorted(thr, df["fdoc"].to_numpy(dtype=np.int64),
                              side="left")
        g = pd.DataFrame({"bkt": bkt})
        return g.groupby("bkt", as_index=False).agg(v=("bkt", "size"))

    vsum = grouped_agg(
        fd.map_batches(first_bucket, batch_format="pandas",
                       batch_size=131072),
        ["bkt"], {"v": ("v", "sum")}, n_buckets=4)

    # bound: n_checkpoints rows each (the checkpoint grain)
    tp = tsum.to_pandas().set_index("bkt")["ntok"]
    vp = vsum.to_pandas().set_index("bkt")["v"]
    t_cum = np.zeros(n_checkpoints, dtype=np.int64)
    v_cum = np.zeros(n_checkpoints, dtype=np.int64)
    for i in range(n_checkpoints):
        t_cum[i] = (t_cum[i - 1] if i else 0) + int(tp.get(i, 0))
        v_cum[i] = (v_cum[i - 1] if i else 0) + int(vp.get(i, 0))

    # empty checkpoints (no tokens / no first-seen terms yet -- a
    # sparse or skewed doc_id space) carry no Heaps evidence: drop them
    # from the fit, exactly as the oracle's INNER JOIN tcum/vcum
    # USING (i) drops checkpoint rows with empty cumulative groups
    keep = (t_cum > 0) & (v_cum > 0)
    x = np.log(t_cum[keep].astype(np.float64))
    y = np.log(v_cum[keep].astype(np.float64))
    n = float(keep.sum())
    sx, sy = x.sum(), y.sum()
    sxx, sxy, syy = (x * x).sum(), (x * y).sum(), (y * y).sum()
    beta = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    lnk = (sy - beta * sx) / n
    r2 = (n * sxy - sx * sy) ** 2 / ((n * sxx - sx * sx)
                                     * (n * syy - sy * sy))
    # + 0.0 normalizes IEEE -0.0: on a closed-vocab corpus beta's tiny
    # numerator sign is sum-order noise, and str(-0.0) != str(0.0)
    return pd.DataFrame({
        "n_points": pd.array([int(n)], dtype="int64"),
        "beta": round_series(pd.Series([beta]), 6).to_numpy() + 0.0,
        "lnk": round_series(pd.Series([lnk]), 6).to_numpy() + 0.0,
        "r2": round_series(pd.Series([r2]), 6).to_numpy() + 0.0,
    })


def doc_lang_mix(sf_dir: str, max_vocab: int = 16, k: int = 5):
    """Per-document language-mix classification against the INDUCED
    lexicons: the top-``k`` log-odds terms of each language (from
    ``lang_term_logodds``) become that language's lexicon; every doc is
    scored by lexicon-hit counts -- majority language, hit totals, and
    the mix entropy ln(n) - sum(c ln c)/n (0 = single-language doc,
    higher = code-switching / template mixing).  Operator COMPOSITION:
    lexicon induction feeds classification, both oracled.

    Scale shape: the lexicon is |langs| x k rows (driver-bounded,
    broadcast once); scoring is ONE streaming map_batches -- each doc's
    hits resolve entirely inside its batch via a vectorized merge, so
    the corpus is never shuffled.  Zero-hit docs drop out (no lexicon
    evidence).

    Output: (doc_id, top_lang, n_hits_top, n_hits_total,
    mix_entropy r6) sorted by doc_id.
    """
    import numpy as np
    import pandas as pd
    import ray

    from ..functions.rounding import round_series

    # bound: |langs| x k rows (the induced lexicon)
    lex = lang_term_logodds(sf_dir, max_vocab=max_vocab,
                            k=k).to_pandas()[["term", "lang"]]
    lex_ref = ray.put(lex)

    ds = _docs(sf_dir, ["doc_id", "text"])

    def score(batch: pa.Table) -> pd.DataFrame:
        lx = ray.get(lex_ref)
        df = batch.to_pandas()
        ex = (df.assign(term=df["text"].str.split(" "))
              .loc[:, ["doc_id", "term"]].explode("term"))
        ex = ex[ex["term"] != ""]
        m = ex.merge(lx, on="term")
        if m.empty:
            return pd.DataFrame({
                "doc_id": pd.Series([], dtype="int64"),
                "top_lang": pd.Series([], dtype=object),
                "n_hits_top": pd.Series([], dtype="int64"),
                "n_hits_total": pd.Series([], dtype="int64"),
                "mix_entropy": pd.Series([], dtype="float64"),
            })
        hits = (m.groupby(["doc_id", "lang"], as_index=False)
                .agg(c=("lang", "size")))
        c = hits["c"].to_numpy(dtype=np.float64)
        hits["clnc"] = c * np.log(c)
        tot = hits.groupby("doc_id").agg(n=("c", "sum"),
                                         sc=("clnc", "sum"))
        top = (hits.sort_values(["doc_id", "c", "lang"],
                                ascending=[True, False, True])
               .groupby("doc_id").head(1).set_index("doc_id"))
        n = tot["n"].to_numpy(dtype=np.float64)
        ent = np.log(n) - tot["sc"].to_numpy() / n
        return pd.DataFrame({
            "doc_id": tot.index.to_numpy(dtype=np.int64),
            "top_lang": top["lang"].reindex(tot.index).to_numpy(),
            "n_hits_top": top["c"].reindex(tot.index).to_numpy(np.int64),
            "n_hits_total": tot["n"].to_numpy(dtype=np.int64),
            "mix_entropy": round_series(pd.Series(ent), 6).to_numpy(),
        })

    return ds.map_batches(score, batch_format="pyarrow",
                          batch_size=8192).sort("doc_id")


def source_pii_wilson(sf_dir: str, z: float = 1.96):
    """Per-source PII rate with the Wilson score interval -- the
    uncertainty-aware version of ``source_pii_rate`` (a 25-doc source
    at 8% and a 10k-doc source at 8% are very different findings).
    Wilson bounds: (p + z^2/2n -/+ z*sqrt(p(1-p)/n + z^2/4n^2))
    / (1 + z^2/n); z = 1.96 literal in both engines.

    Shape: identical to source_pii_rate -- whole-doc flags in one
    streaming pass, a |sources|-bounded combiner reduce, bounds
    computed on the aggregate rows.

    Output: (source, n_docs, n_pii_docs, p r6, lo r6, hi r6) sorted.
    """
    import numpy as np
    import pandas as pd

    from ..functions.rounding import round_series
    from ..functions.text_stats import scrub_pii
    from ..stages.agg import grouped_agg

    ds = _docs(sf_dir, ["source", "text"])

    def part(batch: pa.Table) -> "pd.DataFrame":
        flags = []
        for t in batch.column("text").to_pylist():
            r = scrub_pii(t)
            flags.append(int(r["n_urls"] + r["n_emails"] + r["n_phones"] > 0))
        df = pd.DataFrame({"source": batch.column("source").to_pylist(),
                           "pii": flags})
        return df.groupby("source", as_index=False).agg(
            n_docs=("pii", "size"), n_pii_docs=("pii", "sum"))

    agg = grouped_agg(ds.map_batches(part, batch_format="pyarrow"),
                      ["source"],
                      {"n_docs": ("n_docs", "sum"),
                       "n_pii_docs": ("n_pii_docs", "sum")}, n_buckets=8)

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        n = df["n_docs"].to_numpy(dtype=np.float64)
        x = df["n_pii_docs"].to_numpy(dtype=np.float64)
        p = x / n
        z2 = z * z
        center = p + z2 / (2.0 * n)
        spread = z * np.sqrt(p * (1.0 - p) / n + z2 / (4.0 * n * n))
        denom = 1.0 + z2 / n
        return pd.DataFrame({
            "source": df["source"].to_numpy(),
            "n_docs": df["n_docs"].to_numpy(dtype=np.int64),
            "n_pii_docs": df["n_pii_docs"].to_numpy(dtype=np.int64),
            "p": round_series(pd.Series(p), 6).to_numpy(),
            "lo": round_series(pd.Series((center - spread) / denom),
                               6).to_numpy(),
            "hi": round_series(pd.Series((center + spread) / denom),
                               6).to_numpy(),
        })

    return (agg.map_batches(finish, batch_format="pandas",
                            batch_size=1 << 20).sort("source"))


def source_checksums(sf_dir: str):
    """Order-invariant integrity fingerprints per source: XOR-fold of
    per-doc 128-bit md5 digests (as DuckDB's md5_number_lower/upper
    halves of ``doc_id || ':' || text``) plus counts -- the Merkle-lite
    dataset checksum that verifies a copied / re-partitioned / resumed
    corpus bit-for-bit without ordering or single-threaded hashing.
    XOR is associative, commutative and self-inverse, so ANY
    partitioning computes the same fingerprint, and a single changed,
    dropped or duplicated doc flips it.

    Shape: per-batch per-source partials (XOR + count), one tiny
    |sources|-grain finish.  The corpus streams once; nothing larger
    than the source grain crosses the wire.

    Output: (source, n_docs, xor_lo, xor_hi) sorted by source
    (uint64 fingerprint halves).
    """
    import hashlib

    import numpy as np
    import pandas as pd
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "source", "text"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        lo = np.empty(len(df), dtype=np.uint64)
        hi = np.empty(len(df), dtype=np.uint64)
        for i, (d, t) in enumerate(zip(df["doc_id"].astype(str),
                                       df["text"])):
            dig = hashlib.md5((d + ":" + t).encode("utf-8")).digest()
            lo[i] = int.from_bytes(dig[8:], "little")
            hi[i] = int.from_bytes(dig[:8], "little")
        g = pd.DataFrame({"source": df["source"].to_numpy(),
                          "lo": lo, "hi": hi})
        agg = g.groupby("source").agg(
            n_docs=("lo", "size"),
            xor_lo=("lo", lambda s: np.bitwise_xor.reduce(
                s.to_numpy(dtype=np.uint64))),
            xor_hi=("hi", lambda s: np.bitwise_xor.reduce(
                s.to_numpy(dtype=np.uint64))))
        return agg.reset_index()

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        agg = df.groupby("source").agg(
            n_docs=("n_docs", "sum"),
            xor_lo=("xor_lo", lambda s: np.bitwise_xor.reduce(
                s.to_numpy(dtype=np.uint64))),
            xor_hi=("xor_hi", lambda s: np.bitwise_xor.reduce(
                s.to_numpy(dtype=np.uint64)))).reset_index()
        agg["n_docs"] = agg["n_docs"].astype("int64")
        return agg.sort_values("source").reset_index(drop=True)

    # |sources| partial rows per batch: the finish is grain-bounded
    return (ds.map_batches(partial, batch_format="pandas",
                           batch_size=131072)
            .repartition(1)
            .map_batches(finish, batch_format="pandas",
                         batch_size=1 << 20))


def part_name_er(sf_dir: str, threshold: float = 0.9,
                 num_partitions: int = 8, broadcast_labels: int = 1_000_000,
                 n_buckets: int = 16):
    """End-to-end ENTITY RESOLUTION over the part-name dictionary --
    the full record-linkage composition, each stage already oracled on
    its own: first-word blocking + vectorized Jaro-Winkler verify
    (`part_name_jw_pairs`), connected components over the match edges
    (`component_labels`' size-gated hybrid), and canonicalization to
    the component's minimum name-hash member.  Names are keyed by
    ``md5_number_lower(name) >> 1`` (63-bit, so int64 min-label order
    == DuckDB's UBIGINT LEAST order).

    Shape: linkage over the distinct-name dictionary; the (node ->
    label) table broadcasts when component membership is under
    ``broadcast_labels``, else attaches via ONE hash join; canonical
    names then resolve inside a bucketed keyed groupby on the label
    (each component's canonical member is in its own group -- no second
    join, which trips Ray 2.49's join-after-join key resolution).

    Output: (p_name, canonical_name) for every distinct name (self
    when unmatched), sorted by p_name.
    """
    import numpy as np
    import pandas as pd
    import ray
    import ray.data as rd

    from ..functions.hashing import _hash64
    from ..functions.text_stats import sha1_64
    from ..stages.agg import grouped_agg
    from ..stages.dedup import component_labels

    pairs = part_name_jw_pairs(sf_dir, threshold=threshold)

    def to_edges(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "id_a": np.array([_hash64(s) >> 1 for s in df["name_a"]],
                             dtype=np.int64),
            "id_b": np.array([_hash64(s) >> 1 for s in df["name_b"]],
                             dtype=np.int64),
        })

    edges = pairs.map_batches(to_edges, batch_format="pandas",
                              batch_size=131072)
    labels = component_labels(edges).materialize()
    n_lab = labels.count()

    names = rd.read_parquet(f"{sf_dir}/part.parquet", columns=["p_name"])

    def name_hid(df: pd.DataFrame) -> pd.DataFrame:
        u = df["p_name"].unique()
        return pd.DataFrame({
            "p_name": u,
            "hid": np.array([_hash64(s) >> 1 for s in u], dtype=np.int64),
            "one": np.ones(len(u), dtype=np.int64),
        })

    dic = grouped_agg(
        names.map_batches(name_hid, batch_format="pandas",
                          batch_size=131072),
        ["p_name", "hid"], {"one": ("one", "max")},
        n_buckets=8).select_columns(["p_name", "hid"])

    if n_lab <= broadcast_labels:
        # bound: gated at broadcast_labels (node -> label) rows
        labmap = {r["node"]: r["label"] for r in labels.iter_rows()}
        lab_ref = ray.put(labmap)

        def attach(df: pd.DataFrame) -> pd.DataFrame:
            lm = ray.get(lab_ref)
            lbl = df["hid"].map(lambda h: lm.get(h, h)).to_numpy(
                dtype=np.int64)
            return df.assign(lbl=lbl)

        withlab = dic.map_batches(attach, batch_format="pandas",
                                  batch_size=131072)
    else:
        lab2 = labels.rename_columns({"node": "hid2"})
        j = dic.join(lab2, join_type="left_outer",
                     num_partitions=num_partitions,
                     on=("hid",), right_on=("hid2",))

        def attach_joined(df: pd.DataFrame) -> pd.DataFrame:
            lbl = df["label"].where(df["label"].notna(),
                                    df["hid"]).to_numpy(dtype=np.int64)
            return pd.DataFrame({"p_name": df["p_name"].to_numpy(),
                                 "hid": df["hid"].to_numpy(dtype=np.int64),
                                 "lbl": lbl})

        withlab = j.map_batches(attach_joined, batch_format="pandas",
                                batch_size=131072)

    def bucket(df: pd.DataFrame) -> pd.DataFrame:
        h = df["lbl"].to_numpy(dtype=np.int64).astype(np.uint64)
        with np.errstate(over="ignore"):
            h = h * np.uint64(0x9E3779B97F4A7C15)
            h ^= h >> np.uint64(29)
        return df.assign(bucket=(h % np.uint64(n_buckets)).astype(np.int32))

    def resolve(df: pd.DataFrame) -> pd.DataFrame:
        canon = df.loc[df["hid"] == df["lbl"], ["lbl", "p_name"]].rename(
            columns={"p_name": "canonical_name"})
        out = df.merge(canon, on="lbl", how="left")
        cn = out["canonical_name"].where(out["canonical_name"].notna(),
                                         out["p_name"])
        return pd.DataFrame({"p_name": out["p_name"].to_numpy(),
                             "canonical_name": cn.to_numpy()})

    return (withlab.map_batches(bucket, batch_format="pandas",
                                batch_size=131072)
            .groupby("bucket").map_groups(
                lambda g: resolve(g.drop(columns=["bucket"])),
                batch_format="pandas")
            .sort("p_name"))


def temperature_mixture_sample(sf_dir: str, total: int = 200,
                               temp_num: int = 1, temp_den: int = 2,
                               key_col: str = "source"):
    """Temperature-based mixture sampling -- the data-mixing primitive
    multilingual/multi-source LLM pipelines use (alpha-sampling a la
    mC4/XLM-R): per-source quotas proportional to n_s^T (T =
    temp_num/temp_den, default 0.5 upweights small sources), allocated
    by largest remainder (ties: source asc) so quotas sum to ``total``
    exactly, then the deterministic seedless per-source head by
    (md5(doc_id), doc_id) order -- the per_key_sample machinery with a
    PER-KEY quota.

    Shape: one |sources|-grain count reduce -> driver quota solve
    (bound: source grain) -> broadcast quota map -> per-batch local
    prune to <= quota_s rows per source -> ONE bucketed keyed reduce.
    A quota can exceed a source's size; the head then just takes the
    whole source.

    Output: (doc_id, source) sorted by doc_id.
    """
    import numpy as np
    import pandas as pd
    import ray

    from ..functions.hashing import _hash64
    from ..functions.text_stats import sha1_64
    from ..stages.agg import grouped_agg

    ds = _docs(sf_dir, ["doc_id", key_col])

    def cnt_part(df: pd.DataFrame) -> pd.DataFrame:
        return (df.groupby(key_col, as_index=False)
                .agg(n=(key_col, "size")))

    counts = grouped_agg(
        ds.map_batches(cnt_part, batch_format="pandas",
                       batch_size=131072),
        [key_col], {"n": ("n", "sum")}, n_buckets=4
        # bound: |sources| rows (the mixing grain)
    ).to_pandas().sort_values(key_col).reset_index(drop=True)

    t = temp_num / temp_den
    w = np.power(counts["n"].to_numpy(dtype=np.float64), t)
    share = w / w.sum() * total
    base = np.floor(share).astype(np.int64)
    rem = share - base
    short = int(total - base.sum())
    # largest remainder, ties by source asc (counts already source-asc)
    order = np.lexsort((np.arange(len(rem)), -rem))
    quota = base.copy()
    quota[order[:short]] += 1
    qmap = dict(zip(counts[key_col], quota))
    q_ref = ray.put(qmap)

    def local_prune(df: pd.DataFrame) -> pd.DataFrame:
        qm = ray.get(q_ref)
        h = np.asarray([_hash64(str(int(d))) for d in df["doc_id"]],
                       dtype=np.uint64)
        d = df.assign(h=h).sort_values(["h", "doc_id"])
        d = (d.groupby(key_col, sort=False, group_keys=False)
             .apply(lambda g: g.head(int(qm.get(g.name, 0)))))
        if d.empty:
            return pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                                 key_col: pd.Series(dtype=object),
                                 "h": pd.Series(dtype="uint64"),
                                 "bucket": pd.Series(dtype="int32")})
        buckets = [sha1_64(str(v)) % 16 for v in d[key_col]]
        return d.assign(bucket=np.asarray(buckets, dtype=np.int32))

    def final(group: pd.DataFrame) -> pd.DataFrame:
        qm = ray.get(q_ref)
        g = (group.sort_values(["h", "doc_id"])
             .groupby(key_col, sort=False, group_keys=False)
             .apply(lambda x: x.head(int(qm.get(x.name, 0)))))
        return g[["doc_id", key_col]].astype({"doc_id": "int64"})

    return (ds.map_batches(local_prune, batch_format="pandas",
                           batch_size=65536)
            .groupby("bucket").map_groups(final, batch_format="pandas")
            .sort("doc_id"))


def doc_char_entropy(sf_dir: str):
    """Per-document character-distribution entropy -- the cheap
    gibberish/encoding-damage quality signal (natural text sits in a
    narrow entropy band; base64 blobs and aaaa-runs fall outside).
    H = ln(n) - sum(c ln c)/n over the doc's character counts, the
    suite's exact entropy algebra.

    Shape: one stateless streaming pass; each doc's character histogram
    is built inside its batch with one vectorized byte-level
    np.unique per doc (ASCII corpus == byte == char, matching DuckDB's
    string_split(text, '')).

    Output: (doc_id, n_chars_calc, charset, entropy r6) sorted by
    doc_id.
    """
    import numpy as np
    import pandas as pd

    from ..functions.rounding import round_series

    ds = _docs(sf_dir, ["doc_id", "text"])

    def ent(batch: pa.Table) -> pd.DataFrame:
        ids = batch.column("doc_id").to_pylist()
        out_n, out_k, out_h = [], [], []
        for t in batch.column("text").to_pylist():
            b = np.frombuffer(t.encode("utf-8"), dtype=np.uint8)
            _, counts = np.unique(b, return_counts=True)
            c = counts.astype(np.float64)
            n = c.sum()
            h = np.log(n) - (c * np.log(c)).sum() / n
            out_n.append(int(n))
            out_k.append(len(c))
            out_h.append(h)
        return pd.DataFrame({
            "doc_id": np.asarray(ids, dtype=np.int64),
            "n_chars_calc": np.asarray(out_n, dtype=np.int64),
            "charset": np.asarray(out_k, dtype=np.int64),
            "entropy": round_series(pd.Series(out_h), 6).to_numpy(),
        })

    return ds.map_batches(ent, batch_format="pyarrow",
                          batch_size=8192).sort("doc_id")


def source_length_drift(sf_dir: str, n_buckets: int = 8):
    """Per-source distribution drift: the two-sample KS statistic
    between each source's doc-length distribution and the REST of the
    corpus -- the per-feed outlier screen (a feed whose length profile
    diverges usually changed its extraction or got polluted).

    Shape: ONE (n_chars, source) combiner histogram (value grain x
    source grain crosses the wire, never the corpus); the driver then
    computes every source-vs-complement ECDF pair from the same
    histogram (bound: |sources| x value grain).

    Output: (source, n_src, n_rest, ks_d r6) sorted by source.
    """
    import numpy as np
    import pandas as pd

    from ..functions.rounding import round_series
    from ..stages.agg import grouped_agg

    ds = _docs(sf_dir, ["source", "n_chars"])

    def cells(df: pd.DataFrame) -> pd.DataFrame:
        return (df.groupby(["n_chars", "source"], as_index=False)
                .agg(cnt=("source", "size")))

    hist = grouped_agg(
        ds.map_batches(cells, batch_format="pandas", batch_size=131072),
        ["n_chars", "source"], {"cnt": ("cnt", "sum")},
        n_buckets=n_buckets
        # bound: |sources| x n_chars value grain (a histogram)
    ).to_pandas()

    pivot = (hist.pivot_table(index="n_chars", columns="source",
                              values="cnt", fill_value=0, aggfunc="sum")
             .sort_index())
    counts = pivot.to_numpy(dtype=np.int64)
    totals = counts.sum(axis=0)
    grand = counts.sum(axis=1)
    rows = []
    for j, src in enumerate(pivot.columns):
        ca = counts[:, j].cumsum()
        cb = (grand - counts[:, j]).cumsum()
        na, nb = int(ca[-1]), int(cb[-1])
        d = np.abs(ca / na - cb / nb).max()
        rows.append((src, na, nb, d))
    out = pd.DataFrame(rows, columns=["source", "n_src", "n_rest", "ks_d"])
    out["ks_d"] = round_series(out["ks_d"], 6)
    return out.sort_values("source").reset_index(drop=True)


def source_drift_fdr(sf_dir: str, alpha_num: int = 5,
                     alpha_den: int = 100):
    """Multiple-testing-corrected drift report: the per-source KS
    statistics (`source_length_drift`) converted to asymptotic
    p-values (two-sided Kolmogorov series truncated at 5 terms,
    lambda = sqrt(na*nb/(na+nb)) * D on the r6 statistic so both
    engines share operands exactly) and Benjamini-Hochberg adjusted --
    20 sources means ONE source at p=0.04 is expected noise; the FDR
    step is what makes the drift screen actionable.

    Shape: the member op does the distributed work; this runs on its
    |sources|-grain output (bound: source grain).

    Output: (source, ks_d, p r6, p_adj r6, sig) sorted by source;
    sig = 1 iff p_adj <= alpha.
    """
    import numpy as np
    import pandas as pd

    from ..functions.rounding import round_series

    stats = source_length_drift(sf_dir)  # pandas, |sources| rows

    na = stats["n_src"].to_numpy(dtype=np.float64)
    nb = stats["n_rest"].to_numpy(dtype=np.float64)
    d = stats["ks_d"].to_numpy(dtype=np.float64)
    lam = np.sqrt(na * nb / (na + nb)) * d
    t = [np.exp(-2.0 * (k * k) * (lam * lam)) for k in (1, 2, 3, 4, 5)]
    p = 2.0 * (t[0] - t[1] + t[2] - t[3] + t[4])
    p = np.minimum(np.maximum(p, 0.0), 1.0)

    n = len(stats)
    order = np.lexsort((stats["source"].to_numpy(), p))
    ranked = p[order] * n / np.arange(1, n + 1, dtype=np.float64)
    adj_sorted = np.minimum(np.minimum.accumulate(ranked[::-1])[::-1], 1.0)
    adj = np.empty(n)
    adj[order] = adj_sorted
    alpha = alpha_num / alpha_den
    out = pd.DataFrame({
        "source": stats["source"].to_numpy(),
        "ks_d": stats["ks_d"].to_numpy(),
        "p": round_series(pd.Series(p), 6).to_numpy(),
        "p_adj": round_series(pd.Series(adj), 6).to_numpy(),
        "sig": (adj <= alpha).astype(np.int64),
    })
    return out.sort_values("source").reset_index(drop=True)


def doclen_twoway_anova(sf_dir: str, n_buckets: int = 8):
    """Two-way variance decomposition of document length over
    lang x source: factor sums of squares from the cell-moment
    identities (SS_A = sum_a S_a^2/n_a - S^2/N, likewise B; cells =
    sum_ab S_ab^2/n_ab - S^2/N; interaction = cells - A - B; residual =
    total - cells; sequential identities, exact parity with the
    oracle on possibly unbalanced cells).  Answers "is doc length a
    language effect, a feed effect, or their interaction?".

    Shape: ONE combiner reduce over the |langs| x |sources| cell grain
    (every SS above derives from cell (n, sum) + a global sumsq); the
    corpus is never shuffled.

    Output: one row (n, ss_lang r4, ss_source r4, ss_inter r4,
    ss_resid r4, eta2_lang r6, eta2_source r6).
    """
    import numpy as np
    import pandas as pd

    from ..functions.rounding import round_series
    from ..stages.agg import grouped_agg

    ds = _docs(sf_dir, ["lang", "source", "n_chars"])

    def cells(df: pd.DataFrame) -> pd.DataFrame:
        v = df["n_chars"].to_numpy(dtype=np.float64)
        g = pd.DataFrame({"lang": df["lang"].to_numpy(),
                          "source": df["source"].to_numpy(),
                          "n": np.ones(len(df), dtype=np.int64),
                          "s": v, "s2": v * v})
        return g.groupby(["lang", "source"], as_index=False).agg(
            n=("n", "sum"), s=("s", "sum"), s2=("s2", "sum"))

    agg = grouped_agg(
        ds.map_batches(cells, batch_format="pandas", batch_size=131072),
        ["lang", "source"], {"n": ("n", "sum"), "s": ("s", "sum"),
                             "s2": ("s2", "sum")}, n_buckets=n_buckets)

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        n_ab = df["n"].to_numpy(dtype=np.float64)
        s_ab = df["s"].to_numpy()
        n = n_ab.sum()
        s = s_ab.sum()
        s2 = df["s2"].to_numpy().sum()
        grand = s * s / n
        la = df.assign(nn=n_ab, ss=s_ab).groupby("lang").agg(
            nn=("nn", "sum"), ss=("ss", "sum"))
        sb = df.assign(nn=n_ab, ss=s_ab).groupby("source").agg(
            nn=("nn", "sum"), ss=("ss", "sum"))
        ss_a = (la["ss"].to_numpy() ** 2 / la["nn"].to_numpy()).sum() - grand
        ss_b = (sb["ss"].to_numpy() ** 2 / sb["nn"].to_numpy()).sum() - grand
        ss_cells = (s_ab * s_ab / n_ab).sum() - grand
        ss_total = s2 - grand
        ss_inter = ss_cells - ss_a - ss_b
        ss_resid = ss_total - ss_cells
        return pd.DataFrame({
            "n": pd.array([int(n)], dtype="int64"),
            "ss_lang": round_series(pd.Series([ss_a]), 4).to_numpy(),
            "ss_source": round_series(pd.Series([ss_b]), 4).to_numpy(),
            "ss_inter": round_series(pd.Series([ss_inter]), 4).to_numpy(),
            "ss_resid": round_series(pd.Series([ss_resid]), 4).to_numpy(),
            "eta2_lang": round_series(pd.Series([ss_a / ss_total]),
                                      6).to_numpy(),
            "eta2_source": round_series(pd.Series([ss_b / ss_total]),
                                        6).to_numpy(),
        })

    # |langs| x |sources| cells: the finish legitimately runs in one batch
    return (agg.repartition(1)
            .map_batches(finish, batch_format="pandas", batch_size=1 << 20))


def phrase_search(sf_dir: str, phrase: str = "table hash"):
    """Positional phrase query: all docs containing the exact
    consecutive word sequence ``phrase``, with match count and first
    position (1-based over the raw single-space token array --
    ``inverted_index``'s tokenization).

    Scale shape: a document is a whole row, so every term position of a
    doc is already local to its batch -- the phrase match is ONE
    stateless streaming pass, vectorized ACROSS docs: word j's
    positions shift to candidate starts (pos - j) and L-1 batch-local
    hash joins on (doc_id, start) keep only complete phrases. ZERO
    shuffle. (An index-side phrase
    query over a PREBUILT positional posting store would instead join
    k posting lists on (doc_id, pos+j); with the corpus as input that
    join is strictly worse than this scan -- the postings extraction
    here reads exactly the phrase's terms, the moral equivalent of the
    posting read.)

    Output: (doc_id, n_matches, first_pos) sorted by doc_id.
    """
    import numpy as np
    import pandas as pd

    words = [w for w in phrase.split(" ") if w != ""]
    assert len(words) >= 2, "phrase_search wants a multi-word phrase"
    wset = set(words)

    ds = _docs(sf_dir, ["doc_id", "text"])

    def match(df: pd.DataFrame) -> pd.DataFrame:
        ex = (df.assign(term=df["text"].str.split(" "))
              .loc[:, ["doc_id", "term"]].explode("term"))
        ex["pos"] = ex.groupby("doc_id").cumcount() + 1  # 1-based
        ex = ex[ex["term"].isin(wset)]
        # vectorized ACROSS docs (no per-doc Python loop): word j's
        # occurrences shifted to candidate phrase starts (pos - j),
        # then L-1 hash joins on (doc_id, start) -- a phrase match at
        # start p exists iff every word survives the join chain. Each
        # (doc_id, pos) is unique per word slice, so the joins never
        # fan out.
        base = None
        for j, w in enumerate(words):
            sj = ex.loc[ex["term"] == w, ["doc_id", "pos"]]
            sj = pd.DataFrame({"doc_id": sj["doc_id"].to_numpy(np.int64),
                               "start": sj["pos"].to_numpy(np.int64) - j})
            base = sj if j == 0 else base.merge(sj, on=["doc_id", "start"])
            if base.empty:
                break
        if base is None or base.empty:
            return pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                                 "n_matches": pd.Series([], dtype="int64"),
                                 "first_pos": pd.Series([], dtype="int64")})
        out = (base.groupby("doc_id")["start"]
               .agg(n_matches="count", first_pos="min").reset_index())
        return pd.DataFrame({"doc_id": out["doc_id"].astype("int64"),
                             "n_matches": out["n_matches"].astype("int64"),
                             "first_pos": out["first_pos"].astype("int64")})

    return ds.map_batches(match, batch_format="pandas",
                          batch_size=8192).sort("doc_id")


def gopher_gate(sf_dir: str, min_tokens: int = 30, max_tokens: int = 100000):
    """Gopher-rule composite quality GATE (Rae et al. 2021, A1.1): the
    keep/drop decision a web pipeline actually executes, applying the
    published rule bundle over this engine's quality + repetition
    metrics -- doc length in [min_tokens, max_tokens], mean word length
    in [3, 10], punctuation ratio <= 0.1, stopword ratio >= 0.02,
    duplicate-line fraction <= 0.3, duplicate-line char fraction
    <= 0.2, top-2-gram char fraction <= 0.18. Every rule compares the
    r6-ROUNDED metric (the exact values doc_quality / doc_repetition
    emit), so the flag vector is bit-deterministic in both engines.

    One stateless streaming pass, zero shuffle (all metrics are
    doc-local).

    Output: (doc_id, n_tokens, one boolean per rule, keep) sorted by
    doc_id.
    """
    import numpy as np

    from ..functions.text_stats import quality_metrics, repetition_metrics

    ds = _docs(sf_dir, ["doc_id", "text"])

    def gate(batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        qs = [quality_metrics(t) for t in texts]
        rs = [repetition_metrics(t) for t in texts]
        nt = np.asarray([q["n_tokens"] for q in qs], dtype=np.int64)
        atl = np.asarray([q["avg_token_len"] for q in qs])
        pr = np.asarray([q["punct_ratio"] for q in qs])
        sr = np.asarray([q["stopword_ratio"] for q in qs])
        dl = np.asarray([r["dup_line_frac"] for r in rs])
        dc = np.asarray([r["dup_line_char_frac"] for r in rs])
        t2 = np.asarray([r["top_2gram_char_frac"] for r in rs])
        r_tokens = (nt >= min_tokens) & (nt <= max_tokens)
        r_wordlen = (atl >= 3.0) & (atl <= 10.0)
        r_punct = pr <= 0.1
        r_stop = sr >= 0.02
        r_dupline = dl <= 0.3
        r_dupchar = dc <= 0.2
        r_top2 = t2 <= 0.18
        keep = (r_tokens & r_wordlen & r_punct & r_stop
                & r_dupline & r_dupchar & r_top2)
        return pa.Table.from_arrays(
            [batch.column("doc_id").combine_chunks(),
             pa.array(nt), pa.array(r_tokens), pa.array(r_wordlen),
             pa.array(r_punct), pa.array(r_stop), pa.array(r_dupline),
             pa.array(r_dupchar), pa.array(r_top2), pa.array(keep)],
            names=["doc_id", "n_tokens", "r_tokens", "r_wordlen",
                   "r_punct", "r_stop", "r_dupline", "r_dupchar",
                   "r_top2", "keep"])

    return ds.map_batches(gate, batch_format="pyarrow",
                          batch_size=8192).sort("doc_id")


def tokenizer_fertility(sf_dir: str, n_buckets: int = 4):
    """Per-language tokenizer fertility: pre-tokenizer subword tokens
    (letter runs / digit runs / single non-alnum marks -- the GPT-2-
    style pre-tok split) per whitespace word -- the statistic tokenizer
    budgeting runs per language before training (fertility >> 1 means
    the language pays more sequence length per word).

    Counts are exact integers from one combiner pass at language grain;
    the two ratios round r6 identically in both engines.

    Output: (lang, n_words, n_subtokens, fertility r6,
    chars_per_subtoken r6) sorted by lang.
    """
    import re

    import numpy as np
    import pandas as pd

    from ..functions.rounding import round_series
    from ..stages.agg import grouped_agg

    sub_re = re.compile(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]")
    ws_re = re.compile(r"\S+")

    ds = _docs(sf_dir, ["lang", "text"])

    def partial(batch: pa.Table) -> "pd.DataFrame":
        df = batch.to_pandas()
        rows = []
        for lang, g in df.groupby("lang"):
            n_w = n_s = n_c = 0
            for t in g["text"]:
                n_w += len(ws_re.findall(t))
                subs = sub_re.findall(t)
                n_s += len(subs)
                n_c += sum(len(x) for x in subs)
            rows.append({"lang": lang, "n_words": n_w,
                         "n_subtokens": n_s, "n_subchars": n_c})
        return pd.DataFrame(rows)

    agg = grouped_agg(ds.map_batches(partial, batch_format="pyarrow",
                                     batch_size=8192),
                      ["lang"],
                      {"n_words": ("n_words", "sum"),
                       "n_subtokens": ("n_subtokens", "sum"),
                       "n_subchars": ("n_subchars", "sum")},
                      # bound-static: language grain
                      n_buckets=n_buckets).to_pandas().sort_values("lang")
    # zero guards: a language whose docs have no \S+ words (or no
    # subtokens) yields 0.0, not NaN/inf -- mirrored by CASE WHEN in
    # the oracle SQL so both engines agree on degenerate languages.
    n_w = agg["n_words"].astype(np.float64)
    n_s = agg["n_subtokens"].astype(np.float64)
    n_c = agg["n_subchars"].astype(np.float64)
    out = pd.DataFrame({
        "lang": agg["lang"],
        "n_words": agg["n_words"].astype("int64"),
        "n_subtokens": agg["n_subtokens"].astype("int64"),
        "fertility": round_series(pd.Series(
            np.where(n_w > 0, n_s / np.where(n_w > 0, n_w, 1.0), 0.0),
            index=agg.index), 6),
        "chars_per_subtoken": round_series(pd.Series(
            np.where(n_s > 0, n_c / np.where(n_s > 0, n_s, 1.0), 0.0),
            index=agg.index), 6),
    }).reset_index(drop=True)
    import ray.data as rd

    return rd.from_pandas(out)


def doc_readability(sf_dir: str):
    """Flesch reading-ease + Flesch-Kincaid grade per document (Flesch
    1948; Kincaid et al. 1975) from three deterministic counts:
    words = \\S+ runs, sentences = [.!?]+ runs (min 1 so fragments get
    a denominator), syllables = [aeiouy]+ vowel groups of the lowered
    text (the standard regex syllable proxy). Zero-word docs emit 0.0
    for both scores (mirrored by CASE WHEN in the oracle).

    Shape: stateless vectorized map_batches, zero shuffle -- the same
    ship-at-100x shape as doc_quality. Scores are double arithmetic in
    the SAME operand order as the oracle SQL, r6-rounded half-away.

    Output: (doc_id, n_words, n_sentences, n_syllables, flesch r6,
    fk_grade r6), one row per document.
    """
    import re

    import numpy as np
    import pandas as pd

    from ..functions.rounding import round_series
    from ..functions.text_stats import TOKEN_RE

    sent_re = re.compile(r"[.!?]+")
    vowel_re = re.compile(r"[aeiouy]+")

    ds = _docs(sf_dir, ["doc_id", "text"])

    def scores(batch: pa.Table) -> pd.DataFrame:
        texts = batch.column("text").to_pylist()
        w = np.array([len(TOKEN_RE.findall(t)) for t in texts], dtype=np.int64)
        s = np.array([max(len(sent_re.findall(t)), 1) for t in texts], dtype=np.int64)
        y = np.array([len(vowel_re.findall(t.lower())) for t in texts], dtype=np.int64)
        wf = w.astype(np.float64)
        sf = s.astype(np.float64)
        yf = y.astype(np.float64)
        safe_w = np.where(w > 0, wf, 1.0)
        wps = wf / sf
        spw = yf / safe_w
        flesch = np.where(w > 0, 206.835 - 1.015 * wps - 84.6 * spw, 0.0)
        fk = np.where(w > 0, 0.39 * wps + 11.8 * spw - 15.59, 0.0)
        return pd.DataFrame({
            "doc_id": batch.column("doc_id").to_numpy(zero_copy_only=False),
            "n_words": w,
            "n_sentences": s,
            "n_syllables": y,
            "flesch": round_series(pd.Series(flesch), 6),
            "fk_grade": round_series(pd.Series(fk), 6),
        })

    return ds.map_batches(scores, batch_format="pyarrow")


def source_distinct_ngrams(sf_dir: str, n_buckets: int = 32):
    """Distinct-n lexical diversity per source (Li et al. 2016's
    distinct-1/distinct-2, the standard corpus-diversity diagnostic):
    for gram_order in {1, 2}, the share of n-gram OCCURRENCES that are
    unique strings within the source. Low distinct_ratio flags
    template/boilerplate-heavy sources before they flood a mixture.

    Shape: per-batch combiner counts at (source, gram_order, gram)
    grain (one output row per distinct gram per batch), ONE keyed
    exchange to global gram grain, then each post-reduce row IS one
    distinct gram so the source-grain rollup is a row-count + sum --
    a second tiny grouped_agg. No distinct-set ever materializes in
    one place. At 100 TB the gram aggregate wants the dsir-style
    capped-vocab guard; at fixture vocab it is exact.

    Output: (source, gram_order, n_grams, n_distinct, distinct_ratio
    r6) sorted by (source, gram_order) -- long format, two rows per
    source, so no driver-side pivot exists.
    """
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from ..functions.rounding import round_series
    from ..functions.text_stats import TOKEN_RE
    from ..stages.agg import grouped_agg

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["source", "text"])

    def gram_counts(batch: pa.Table) -> pd.DataFrame:
        srcs = batch.column("source").to_pylist()
        texts = batch.column("text").to_pylist()
        src_out: list = []
        order_out: list = []
        gram_out: list = []
        for src, t in zip(srcs, texts):
            toks = TOKEN_RE.findall(t)
            src_out.extend([src] * (len(toks) + max(len(toks) - 1, 0)))
            order_out.extend([1] * len(toks))
            gram_out.extend(toks)
            if len(toks) >= 2:
                order_out.extend([2] * (len(toks) - 1))
                gram_out.extend([a + " " + b for a, b in zip(toks, toks[1:])])
        if not gram_out:
            return pd.DataFrame({"source": pd.Series([], dtype=object),
                                 "gram_order": pd.Series([], dtype=np.int64),
                                 "gram": pd.Series([], dtype=object),
                                 "n": pd.Series([], dtype=np.int64)})
        df = pd.DataFrame({"source": src_out,
                           "gram_order": np.asarray(order_out, dtype=np.int64),
                           "gram": gram_out})
        return (df.groupby(["source", "gram_order", "gram"], as_index=False,
                           sort=False).agg(n=("gram", "size")))

    cells = grouped_agg(
        ds.map_batches(gram_counts, batch_format="pyarrow", batch_size=8192),
        ["source", "gram_order", "gram"], {"n": ("n", "sum")},
        n_buckets=n_buckets)

    rolled = grouped_agg(
        cells, ["source", "gram_order"],
        {"n_distinct": ("gram", "size"), "n_grams": ("n", "sum")},
        # bound-static: |sources| x 2 rows
        n_buckets=4).to_pandas()
    rolled = rolled.sort_values(["source", "gram_order"]).reset_index(drop=True)
    out = pd.DataFrame({
        "source": rolled["source"],
        "gram_order": rolled["gram_order"].astype("int64"),
        "n_grams": rolled["n_grams"].astype("int64"),
        "n_distinct": rolled["n_distinct"].astype("int64"),
        "distinct_ratio": round_series(
            rolled["n_distinct"].astype(np.float64)
            / rolled["n_grams"].astype(np.float64), 6),
    })
    return rd.from_pandas(out)


def cross_source_vocab_overlap(sf_dir: str, n_buckets: int = 32):
    """Pairwise vocabulary overlap between sources: for each unordered
    source pair that shares at least one unigram, the distinct-unigram
    Jaccard and containment (|common| / min vocab). The corpus-mixture
    redundancy diagnostic: a pair with high containment means one
    source's vocabulary is (nearly) subsumed by another's -- a signal
    the mixture over-weights one register.

    Shape: per-batch distinct (source, term) combiner rows, ONE
    term-hash-bucketed exchange; inside each bucket group a vectorized
    self-merge on term yields pair-count partials and the per-source
    marginal partials (the bucket partitions the vocabulary, so both
    are exact partial sums). A tiny grouped sum at pair grain + a
    driver-side finish over <= |sources|^2 rows (bound: source-pair
    grain, corpus-size-independent). No vocabulary set ever
    materializes in one place.

    Output: (src_a, src_b, n_a, n_b, n_common, jaccard r6,
    containment r6) with src_a < src_b, sorted; pairs with zero shared
    terms are absent (mirrored by the oracle's inner join).
    """
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from ..functions.rounding import round_series
    from ..functions.text_stats import TOKEN_RE
    from ..stages.agg import _bucket_of, grouped_agg

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["source", "text"])

    empty = pd.DataFrame({"source": pd.Series([], dtype=object),
                          "term": pd.Series([], dtype=object),
                          "bucket": pd.Series([], dtype=np.int32)})

    def batch_vocab(batch: pa.Table) -> pd.DataFrame:
        srcs = batch.column("source").to_pylist()
        texts = batch.column("text").to_pylist()
        s_out: list = []
        t_out: list = []
        for src, t in zip(srcs, texts):
            toks = set(TOKEN_RE.findall(t))
            s_out.extend([src] * len(toks))
            t_out.extend(toks)
        if not t_out:
            return empty.copy()
        df = pd.DataFrame({"source": s_out, "term": t_out})
        df = df.drop_duplicates(ignore_index=True)
        df["bucket"] = _bucket_of(df, ["term"], n_buckets)
        return df

    sv = ds.map_batches(batch_vocab, batch_format="pyarrow",
                        batch_size=8192)

    def bucket_stats(g: pd.DataFrame) -> pd.DataFrame:
        d = g[["source", "term"]].drop_duplicates()
        marg = d.groupby("source", as_index=False).agg(n=("term", "size"))
        m = pd.DataFrame({"src_a": marg["source"], "src_b": "",
                          "n": marg["n"].astype(np.int64)})
        p = d.merge(d, on="term", suffixes=("_a", "_b"))
        p = p[p["source_a"] < p["source_b"]]
        if len(p):
            pc = p.groupby(["source_a", "source_b"], as_index=False).size()
            pairs = pd.DataFrame({"src_a": pc["source_a"],
                                  "src_b": pc["source_b"],
                                  "n": pc["size"].astype(np.int64)})
            return pd.concat([m, pairs], ignore_index=True)
        return m

    parts = sv.groupby("bucket").map_groups(bucket_stats,
                                            batch_format="pandas")
    # bound: |sources|^2 rows (pair grain + per-source marginals)
    agg = grouped_agg(parts, ["src_a", "src_b"], {"n": ("n", "sum")},
                      n_buckets=4).to_pandas()
    marg = (agg[agg["src_b"] == ""].set_index("src_a")["n"]
            .astype(np.int64))
    pairs = agg[agg["src_b"] != ""].copy()
    pairs = pairs.sort_values(["src_a", "src_b"]).reset_index(drop=True)
    n_a = pairs["src_a"].map(marg).astype(np.int64)
    n_b = pairs["src_b"].map(marg).astype(np.int64)
    n_common = pairs["n"].astype(np.int64)
    out = pd.DataFrame({
        "src_a": pairs["src_a"],
        "src_b": pairs["src_b"],
        "n_a": n_a,
        "n_b": n_b,
        "n_common": n_common,
        "jaccard": round_series(
            n_common.astype(np.float64)
            / (n_a + n_b - n_common).astype(np.float64), 6),
        "containment": round_series(
            n_common.astype(np.float64)
            / np.minimum(n_a, n_b).astype(np.float64), 6),
    })
    return rd.from_pandas(out)


def doc_oov_rate(sf_dir: str, rare_permille: int = 100,
                 n_buckets: int = 32):
    """Per-document rare-term (OOV-risk) rate: the share of a doc's
    token OCCURRENCES whose corpus document frequency is at or below
    ceil(rare_permille * n_docs / 1000) documents -- integer
    ceil-division so DuckDB reproduces the threshold exactly. Docs
    dominated by corpus-rare terms are tokenizer-hostile (long BPE
    splits) and frequent memorization outliers; this is the per-doc
    counterpart of lang_hapax_rate.

    Shape: per-batch (doc_id, term, cnt) counts (each doc is one row,
    so the counts are exact batch-locally), ONE term-hash-bucketed
    exchange in which each bucket group computes df per term (all rows
    of a term co-locate) and collapses to per-(doc, bucket) partials
    (n_tok_partial, n_rare_partial), then a doc-grain grouped sum and
    a stateless ratio map. Two keyed exchanges, both at bounded grain;
    the rare-term set never materializes centrally (at web scale it is
    most of the vocabulary).

    Output: (doc_id, n_tokens, n_rare, rare_rate r6), one row per doc
    with >= 1 token (zero-token docs are absent -- mirrored by the
    oracle, which derives rows from the token table).
    """
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from ..functions.rounding import round_series
    from ..functions.text_stats import TOKEN_RE
    from ..stages.agg import _bucket_of, grouped_agg

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])
    n_docs = docs.count()  # parquet metadata count, no scan
    threshold = (rare_permille * n_docs + 999) // 1000

    empty = pd.DataFrame({"doc_id": pd.Series([], dtype=np.int64),
                          "term": pd.Series([], dtype=object),
                          "cnt": pd.Series([], dtype=np.int64),
                          "bucket": pd.Series([], dtype=np.int32)})

    def doc_terms(batch: pa.Table) -> pd.DataFrame:
        ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        id_out: list = []
        t_out: list = []
        for doc_id, t in zip(ids, texts):
            toks = TOKEN_RE.findall(t)
            id_out.extend([doc_id] * len(toks))
            t_out.extend(toks)
        if not t_out:
            return empty.copy()
        df = pd.DataFrame({"doc_id": np.asarray(id_out, dtype=np.int64),
                           "term": t_out})
        df = df.groupby(["doc_id", "term"], as_index=False,
                        sort=False).agg(cnt=("term", "size"))
        df["cnt"] = df["cnt"].astype(np.int64)
        df["bucket"] = _bucket_of(df, ["term"], n_buckets)
        return df

    dt = docs.map_batches(doc_terms, batch_format="pyarrow",
                          batch_size=8192)

    def bucket_rare(g: pd.DataFrame) -> pd.DataFrame:
        df_per_term = g.groupby("term")["doc_id"].transform("size")
        rare = (df_per_term <= threshold).to_numpy()
        cnt = g["cnt"].to_numpy(dtype=np.int64)
        part = pd.DataFrame({"doc_id": g["doc_id"].to_numpy(np.int64),
                             "n_tok": cnt,
                             "n_rare": np.where(rare, cnt, 0)})
        return part.groupby("doc_id", as_index=False).agg(
            n_tok=("n_tok", "sum"), n_rare=("n_rare", "sum"))

    parts = dt.groupby("bucket").map_groups(bucket_rare,
                                            batch_format="pandas")
    per_doc = grouped_agg(parts, ["doc_id"],
                          {"n_tokens": ("n_tok", "sum"),
                           "n_rare": ("n_rare", "sum")},
                          n_buckets=n_buckets)

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "doc_id": df["doc_id"].astype(np.int64),
            "n_tokens": df["n_tokens"].astype(np.int64),
            "n_rare": df["n_rare"].astype(np.int64),
            "rare_rate": round_series(
                df["n_rare"].astype(np.float64)
                / df["n_tokens"].astype(np.float64), 6),
        })

    return per_doc.map_batches(finish, batch_format="pandas")


def vocab_coverage_curve(sf_dir: str, grid=(16, 64, 256, 1024, 4096)):
    """Tokenizer VOCABULARY SIZING curve: for each candidate vocab size
    V, the fraction of all token occurrences covered by the top-V terms
    (tf desc, term asc) -- the number a BPE/unigram tokenizer build is
    sized by (coverage@V flattens out = the vocab is big enough; the
    long tail past it is what byte-fallback absorbs).

    Shape: ONE combiner pass for term counts (term-grain grouped_agg),
    ONE distributed sort of the vocab-grain table, and |grid|+1 slice
    SUMs over ``split_at_indices`` boundaries (block slicing by global
    row index, not another exchange -- the ppl_buckets convention).
    Integer token counts throughout, so coverage = one double division
    per grid row.

    Output: (vocab_size, covered_tokens, total_tokens, coverage r6)
    sorted by vocab_size.
    """
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from ..functions.rounding import round_half_away
    from ..stages.agg import grouped_agg

    ds = _docs(sf_dir, ["text"])

    def counts(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas()
        ex = df["text"].str.split(" ").explode()
        ex = ex[ex != ""]
        g = ex.value_counts().rename_axis("term").reset_index(name="c")
        return g[["term", "c"]]

    tc = grouped_agg(
        ds.map_batches(counts, batch_format="pyarrow", batch_size=8192),
        ["term"], {"c": ("c", "sum")}, n_buckets=16)

    def neg(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["negc"] = -df["c"].to_numpy(np.int64)
        return df

    srt = (tc.map_batches(neg, batch_format="pandas")
           .sort(["negc", "term"]).materialize())
    n_terms = srt.count()
    gvals = sorted(int(v) for v in grid)
    idxs = [min(v, n_terms) for v in gvals]
    parts = srt.split_at_indices(idxs)

    def _part_sum(p):
        # bound-static: |grid|+1 scalar slice sums (distributed
        # aggregates over index slices of the sorted vocab table)
        s = p.sum("c") if p.count() else 0
        return int(s or 0)

    total = _part_sum(srt)
    covered, acc = [], 0
    for j in range(len(gvals)):
        acc += _part_sum(parts[j])
        covered.append(acc)

    out = pd.DataFrame({
        "vocab_size": pd.Series(gvals, dtype="int64"),
        "covered_tokens": pd.Series(covered, dtype="int64"),
        "total_tokens": pd.Series([total] * len(gvals), dtype="int64"),
        "coverage": [round_half_away(cv / total, 6) if total else 0.0
                     for cv in covered],
    })
    return rd.from_pandas(out)
