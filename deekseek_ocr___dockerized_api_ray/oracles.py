"""DuckDB oracle-SQL builders for the sketch/dedup/langid pipelines.

These replicate, in pure ANSI-ish DuckDB SQL, the exact numeric
semantics of the engine's Python/numpy implementations so the driver's
rows+schema+value-hash comparison can cover them:

  - shingle hashing: polynomial FNV fold over UTF-32 codepoints mod 2^64
    + murmur3 finalizer (functions/hashing.shingle_hashes), done in
    HUGEINT with an explicit 64x64->64 modmul decomposition (DuckDB has
    no wrapping multiply)
  - MinHash permutations: the (a*x+b) mod 2^31-1 universal hashes with
    the a/b constants INLINED from the seeded numpy RNG at SQL-build
    time (the RNG itself is not SQL-expressible, its output is)
  - LSH candidates: pairs sharing a band = equality of the signature's
    band SEGMENT (the engine's 64-bit band-key hash is an implementation
    detail of the shuffle; segment equality is the semantic)
  - SimHash: md5_number_lower token hashes (functions/hashing._hash64
    uses the md5-upper-8-little-endian convention precisely so both
    sides agree), sign-sum bits, pigeonhole banding == exact hamming
    filter (hamming <= max_hamming guarantees a shared band, so the
    banded candidate set is lossless)
  - connected components: recursive transitive closure (UNION-dedup
    recursion terminates); a doc survives iff nothing smaller is
    reachable -- identical to min-label propagation convergence
  - language ID: marker-word hit counts with the Python dict's
    first-max-wins tie-break reproduced by CASE ordering
"""

from __future__ import annotations

from .functions.hashing import _MERSENNE31, MinHasher

_FNV = 1099511628211
_M64 = 1 << 64
_POWS = [pow(_FNV, j, _M64) for j in range(5)]
_C1 = 0xFF51AFD7ED558CCD
_C2 = 0xC4CEB9FE1A85EC53
_LANGS = [
    ("en", "the and of to in is you that it for was with his they at"),
    ("de", "der die das und ist nicht ein eine ich sie mit von für auf"),
    ("fr", "le la les et est une je vous pas pour dans qui sur avec"),
    ("es", "el la los las y es una que no por para con su del se"),
]


def _modmul(h: str, c: int) -> str:
    """SQL for (h * c) mod 2^64 with h < 2^64: split h into 32-bit halves
    so every HUGEINT intermediate stays below 2^97."""
    return (
        f"CAST(( (({h}) % 4294967296)::HUGEINT * {c} + "
        f"((( ({h}) >> 32)::HUGEINT * {c}) % 4294967296) * 4294967296 ) "
        f"% 18446744073709551616 AS UBIGINT)"
    )


def _mix64(col: str) -> str:
    """murmur3 finalizer, matching functions/hashing._mix64."""
    s1 = f"xor({col}, {col} >> 33)"
    s2 = _modmul(s1, _C1)
    s3 = f"xor({s2}, {s2} >> 33)"
    s4 = _modmul(s3, _C2)
    return f"xor({s4}, {s4} >> 33)"


def _shingle_hash_ctes(k: int = 5) -> str:
    """CTEs ending in ``sh(doc_id, h)``: distinct mixed shingle hashes per
    doc, byte-identical to functions/hashing.shingle_hashes."""
    poly = " + ".join(
        f"unicode(substr(norm, i+{j}, 1))::HUGEINT * {_POWS[j]}" for j in range(k)
    )
    short_poly = " + ".join(
        f"CASE WHEN length(norm) > {j} THEN unicode(substr(norm, {j+1}, 1))::HUGEINT * {_POWS[j]} ELSE 0 END"
        for j in range(k - 1)
    )
    return f"""
norm_t AS (SELECT doc_id, trim(regexp_replace(text, '\\s+', ' ', 'g')) AS norm FROM documents),
win AS (
  SELECT doc_id, CAST(({poly}) % 18446744073709551616 AS UBIGINT) AS h0
  FROM norm_t, unnest(range(1, length(norm) - {k - 2})) AS u(i)
  WHERE length(norm) >= {k}
),
shrt AS (
  SELECT doc_id, CAST(({short_poly}) % 18446744073709551616 AS UBIGINT) AS h0
  FROM norm_t WHERE length(norm) BETWEEN 1 AND {k - 1}
),
sh AS MATERIALIZED (SELECT DISTINCT doc_id, {_mix64('h0')} AS h
       FROM (SELECT * FROM win UNION ALL SELECT * FROM shrt))"""


def _minhash_cand_ctes(n_hashes: int = 64, bands: int = 16, k: int = 5,
                       seed: int = 42) -> str:
    """CTEs ending in ``cand(id_a, id_b)``: distinct LSH candidate pairs,
    matching stages/dedup.lsh_candidate_pairs."""
    mh = MinHasher(n_hashes=n_hashes, seed=seed)
    perm_vals = ",".join(
        f"({i},{int(a)},{int(b)})" for i, (a, b) in enumerate(zip(mh.a, mh.b))
    )
    rows = n_hashes // bands
    return f"""{_shingle_hash_ctes(k)},
perm(hid, a, b) AS (VALUES {perm_vals}),
sig AS MATERIALIZED (
  SELECT doc_id, hid, min((a * (h % {_MERSENNE31}) + b) % {_MERSENNE31}) AS mv
  FROM sh CROSS JOIN perm GROUP BY doc_id, hid
),
bandseg AS MATERIALIZED (
  SELECT doc_id, hid // {rows} AS band, list(mv ORDER BY hid) AS seg
  FROM sig GROUP BY doc_id, hid // {rows}
),
cand AS MATERIALIZED (
  SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
  FROM bandseg x JOIN bandseg y
    ON x.band = y.band AND x.seg = y.seg AND x.doc_id < y.doc_id
)"""


def minhash_candidates_sql() -> str:
    return f"WITH {_minhash_cand_ctes()}\nSELECT id_a, id_b FROM cand"


def _char_jaccard_verified_ctes(threshold: float, k: int = 5) -> str:
    """CTEs (appended after cand) ending in ``verified(id_a, id_b,
    jaccard)``: exact char-k-shingle Jaccard >= threshold, matching
    stages/dedup.verify_pairs_jaccard (shingles as strings)."""
    return f""",
vsh AS MATERIALIZED (
  SELECT DISTINCT doc_id, substr(norm, i, {k}) AS s
  FROM norm_t, unnest(range(1, length(norm) - {k - 2})) AS u(i)
  WHERE length(norm) >= {k}
  UNION
  SELECT DISTINCT doc_id, norm AS s FROM norm_t WHERE length(norm) BETWEEN 1 AND {k - 1}
),
vcnt AS (SELECT doc_id, count(*) AS n FROM vsh GROUP BY doc_id),
inter AS (
  SELECT c.id_a, c.id_b, count(*) AS ni
  FROM cand c
  JOIN vsh x ON x.doc_id = c.id_a
  JOIN vsh y ON y.doc_id = c.id_b AND y.s = x.s
  GROUP BY c.id_a, c.id_b
),
verified AS MATERIALIZED (
  SELECT c.id_a, c.id_b,
         ROUND(COALESCE(i.ni, 0)::DOUBLE / (na.n + nb.n - COALESCE(i.ni, 0)), 6) AS jaccard
  FROM cand c
  LEFT JOIN inter i ON i.id_a = c.id_a AND i.id_b = c.id_b
  JOIN vcnt na ON na.doc_id = c.id_a
  JOIN vcnt nb ON nb.doc_id = c.id_b
  WHERE ROUND(COALESCE(i.ni, 0)::DOUBLE / (na.n + nb.n - COALESCE(i.ni, 0)), 6) >= {threshold}
)"""


def _survivors_select(pairs_cte: str) -> str:
    """Recursive-closure survivor selection over symmetric edges from
    ``pairs_cte(id_a, id_b)``: a doc survives iff no smaller id is
    reachable (== its min-label is itself)."""
    return f""",
sym AS (SELECT id_a AS src, id_b AS dst FROM {pairs_cte}
        UNION SELECT id_b, id_a FROM {pairs_cte}),
reach(src, dst) AS (
  SELECT src, dst FROM sym
  UNION
  SELECT r.src, s.dst FROM reach r JOIN sym s ON r.dst = s.src
)
SELECT d.doc_id, d.text FROM documents d
WHERE NOT EXISTS (SELECT 1 FROM reach WHERE reach.src = d.doc_id AND reach.dst < d.doc_id)"""


def minhash_survivors_sql(threshold: float = 0.8) -> str:
    return (
        f"WITH RECURSIVE {_minhash_cand_ctes()}"
        f"{_char_jaccard_verified_ctes(threshold)}"
        f"{_survivors_select('verified')}"
    )


def neardup_clusters_sql(threshold: float = 0.8) -> str:
    """Component labels over the verified minhash pairs: for every node
    in any pair, its cluster id = min(own id, min reachable id) through
    the recursive transitive closure (same closure as the survivors
    SQL, emitting the label instead of filtering on it)."""
    return (
        f"WITH RECURSIVE {_minhash_cand_ctes()}"
        f"{_char_jaccard_verified_ctes(threshold)}"
        """,
sym AS (SELECT id_a AS src, id_b AS dst FROM verified
        UNION SELECT id_b, id_a FROM verified),
reach(src, dst) AS (
  SELECT src, dst FROM sym
  UNION
  SELECT r.src, s.dst FROM reach r JOIN sym s ON r.dst = s.src
)
SELECT CAST(n.src AS BIGINT) AS doc_id,
       CAST(LEAST(n.src, MIN(r.dst)) AS BIGINT) AS cluster_id
FROM (SELECT DISTINCT src FROM sym) n
JOIN reach r ON r.src = n.src
GROUP BY n.src ORDER BY doc_id"""
    )


def neardup_kcore_sql(k: int = 2, rounds: int = 2,
                      threshold: float = 0.8) -> str:
    """Bounded-round k-core peel over the verified near-dup graph
    (stages/dedup.neardup_kcore): the peel rounds unroll to chained
    CTEs over the same verified-pairs machinery as minhash_survivors,
    so the graph this grades cannot desync from the dedup chain."""
    body = """,
sym0 AS (SELECT id_a AS node, id_b AS nbr FROM verified
         UNION SELECT id_b, id_a FROM verified)"""
    prev = "sym0"
    for r in range(rounds):
        body += f""",
d{r} AS (SELECT node, COUNT(*) AS deg FROM {prev} GROUP BY node),
k{r} AS (SELECT node FROM d{r} WHERE deg >= {k}),
sym{r + 1} AS (SELECT s.node, s.nbr FROM {prev} s
               JOIN k{r} x ON x.node = s.node
               JOIN k{r} y ON y.node = s.nbr)"""
        prev = f"sym{r + 1}"
    return (
        f"WITH RECURSIVE {_minhash_cand_ctes()}"
        f"{_char_jaccard_verified_ctes(threshold)}"
        f"{body}\n"
        f"SELECT CAST(node AS BIGINT) AS doc_id,\n"
        f"       CAST(COUNT(*) AS BIGINT) AS core_deg\n"
        f"FROM {prev} GROUP BY node ORDER BY doc_id"
    )


def ngram_jaccard_pairs_sql(threshold: float = 0.3, n: int = 3) -> str:
    """LSH candidates verified by word-n-gram Jaccard, matching
    stages/dedup.verify_pairs_ngram_jaccard (n-grams as strings; < n
    words collapses to the single joined string)."""
    gram = " || ' ' || ".join(f"w[i+{j}]" for j in range(n))
    return f"""WITH {_minhash_cand_ctes()},
wrds AS (SELECT doc_id, regexp_extract_all(text, '\\S+') AS w FROM documents),
ngr AS MATERIALIZED (
  SELECT DISTINCT doc_id, {gram} AS g
  FROM wrds, unnest(range(1, len(w) - {n - 2})) AS u(i)
  WHERE len(w) >= {n}
  UNION
  SELECT DISTINCT doc_id, array_to_string(w, ' ') AS g
  FROM wrds WHERE len(w) BETWEEN 1 AND {n - 1}
),
gcnt AS (SELECT doc_id, count(*) AS n FROM ngr GROUP BY doc_id),
ginter AS (
  SELECT c.id_a, c.id_b, count(*) AS ni
  FROM cand c
  JOIN ngr x ON x.doc_id = c.id_a
  JOIN ngr y ON y.doc_id = c.id_b AND y.g = x.g
  GROUP BY c.id_a, c.id_b
)
SELECT c.id_a, c.id_b,
       ROUND(COALESCE(i.ni, 0)::DOUBLE / (na.n + nb.n - COALESCE(i.ni, 0)), 6) AS ngram_jaccard
FROM cand c
LEFT JOIN ginter i ON i.id_a = c.id_a AND i.id_b = c.id_b
JOIN gcnt na ON na.doc_id = c.id_a
JOIN gcnt nb ON nb.doc_id = c.id_b
WHERE ROUND(COALESCE(i.ni, 0)::DOUBLE / (na.n + nb.n - COALESCE(i.ni, 0)), 6) >= {threshold}"""


def ngram_containment_pairs_sql(threshold: float = 0.5, n: int = 3) -> str:
    """LSH candidates verified by word-n-gram CONTAINMENT
    |A ∩ B| / min(|A|, |B|), matching stages/dedup.verify_pairs_containment
    (same distinct-gram convention as ngram_jaccard_pairs_sql; pairs with
    an empty gram set on either side drop out via the inner gcnt joins)."""
    gram = " || ' ' || ".join(f"w[i+{j}]" for j in range(n))
    return f"""WITH {_minhash_cand_ctes()},
wrds AS (SELECT doc_id, regexp_extract_all(text, '\\S+') AS w FROM documents),
ngr AS MATERIALIZED (
  SELECT DISTINCT doc_id, {gram} AS g
  FROM wrds, unnest(range(1, len(w) - {n - 2})) AS u(i)
  WHERE len(w) >= {n}
  UNION
  SELECT DISTINCT doc_id, array_to_string(w, ' ') AS g
  FROM wrds WHERE len(w) BETWEEN 1 AND {n - 1}
),
gcnt AS (SELECT doc_id, count(*) AS n FROM ngr GROUP BY doc_id),
ginter AS (
  SELECT c.id_a, c.id_b, count(*) AS ni
  FROM cand c
  JOIN ngr x ON x.doc_id = c.id_a
  JOIN ngr y ON y.doc_id = c.id_b AND y.g = x.g
  GROUP BY c.id_a, c.id_b
)
SELECT c.id_a, c.id_b,
       ROUND(COALESCE(i.ni, 0)::DOUBLE / LEAST(na.n, nb.n), 6) AS containment
FROM cand c
LEFT JOIN ginter i ON i.id_a = c.id_a AND i.id_b = c.id_b
JOIN gcnt na ON na.doc_id = c.id_a
JOIN gcnt nb ON nb.doc_id = c.id_b
WHERE ROUND(COALESCE(i.ni, 0)::DOUBLE / LEAST(na.n, nb.n), 6) >= {threshold}"""


def tfidf_cosine_pairs_sql(threshold: float = 0.2,
                           max_vocab: int = 2_000_000) -> str:
    """LSH candidates verified by TF-IDF weighted cosine, matching
    stages/dedup.verify_pairs_tfidf_cosine (raw-count tf over
    whitespace tokens, idf = ln(N/df), vocabulary capped at the
    top-``max_vocab`` tokens by df with the tail idf FLOORED at
    ln(N/df_V) -- df_V = smallest kept df. When the full vocabulary
    fits under the cap the fallback df_v is never reached (every token
    joins vocab), so the uncapped semantics are preserved)."""
    return f"""WITH {_minhash_cand_ctes()},
tok AS MATERIALIZED (
  SELECT doc_id, tok, count(*) AS tf FROM (
    SELECT doc_id, unnest(regexp_extract_all(text, '\\S+')) AS tok
    FROM documents)
  GROUP BY 1, 2),
nd AS (SELECT count(*) AS n FROM documents),
df AS (SELECT tok, count(*) AS df FROM tok GROUP BY 1),
vocab AS MATERIALIZED (
  SELECT tok, df FROM df ORDER BY df DESC, tok ASC LIMIT {max_vocab}),
fl AS (SELECT min(df) AS df_v FROM vocab),
w AS MATERIALIZED (
  SELECT t.doc_id, t.tok,
         t.tf * ln(CAST(nd.n AS DOUBLE) / COALESCE(v.df, fl.df_v)) AS w
  FROM tok t LEFT JOIN vocab v USING (tok), nd, fl),
nrm AS (SELECT doc_id, sqrt(SUM(w * w)) AS nrm FROM w GROUP BY 1),
dt AS (
  SELECT c.id_a, c.id_b, SUM(x.w * y.w) AS dot
  FROM cand c
  JOIN w x ON x.doc_id = c.id_a
  JOIN w y ON y.doc_id = c.id_b AND y.tok = x.tok
  GROUP BY 1, 2)
SELECT c.id_a, c.id_b,
       ROUND(COALESCE(d.dot, 0) / (na.nrm * nb.nrm), 6) AS tfidf_cosine
FROM cand c
LEFT JOIN dt d ON d.id_a = c.id_a AND d.id_b = c.id_b
JOIN nrm na ON na.doc_id = c.id_a
JOIN nrm nb ON nb.doc_id = c.id_b
WHERE na.nrm > 0 AND nb.nrm > 0
  AND ROUND(COALESCE(d.dot, 0) / (na.nrm * nb.nrm), 6) >= {threshold}"""


def random_projection_sql(out_dim: int = 16, dim: int = 64,
                          seed: int = 42) -> str:
    """Seeded Gaussian projection matching
    stages/similarity.random_projection: the RNG's OUTPUT matrix is
    inlined as VALUES (same convention as ann_lsh_sql)."""
    import numpy as np

    planes = np.random.RandomState(seed).normal(size=(dim, out_dim))
    return f"""
WITH p(i, j, v) AS (VALUES {_plane_values(planes)})
SELECT e.vec_id, CAST(p.j AS BIGINT) AS dim,
       -- CAST before multiply: FLOAT * DOUBLE in DuckDB loses the
       -- double precision the engine's f64 matmul keeps
       ROUND(SUM(CAST(e.embedding[p.i] AS DOUBLE) * p.v), 6) AS value
FROM embeddings e, p GROUP BY e.vec_id, p.j"""


def _simhash_ctes() -> str:
    """CTEs ending in ``ssig(doc_id, sim)``: the 64-bit SimHash of
    functions/hashing.simhash64 (md5_number_lower token hashes, term
    frequency weights, sign-sum bits; no tokens -> 0)."""
    return """
toks AS (SELECT doc_id, unnest(regexp_extract_all(text, '\\S+')) AS tok FROM documents),
th AS (SELECT doc_id, md5_number_lower(tok) AS h FROM toks),
bitsum AS (
  SELECT doc_id, j,
         sum(CASE WHEN (h >> j::INTEGER) & 1 = 1 THEN 1 ELSE -1 END) AS s
  FROM th CROSS JOIN (SELECT unnest(range(64)) AS j) jj
  GROUP BY doc_id, j
),
rawsig AS MATERIALIZED (
  SELECT doc_id,
         CAST(sum(CASE WHEN s > 0 THEN (1::HUGEINT << j::INTEGER) ELSE 0 END) % 18446744073709551616 AS UBIGINT) AS sim
  FROM bitsum GROUP BY doc_id
),
ssig AS MATERIALIZED (
  SELECT d.doc_id, COALESCE(r.sim, 0::UBIGINT) AS sim
  FROM documents d LEFT JOIN rawsig r ON r.doc_id = d.doc_id
)"""


def simhash_pairs_sql(max_hamming: int = 3) -> str:
    """All pairs within hamming <= max_hamming. The engine's 4x16-bit
    banding is pigeonhole-lossless for max_hamming < 4, so the banded
    candidate set equals the exact hamming ball and no band logic is
    needed in the oracle."""
    return f"""WITH {_simhash_ctes()}
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       CAST(bit_count(xor(a.sim, b.sim)) AS INTEGER) AS hamming
FROM ssig a JOIN ssig b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.sim, b.sim)) <= {max_hamming}"""


def simhash_survivors_sql(max_hamming: int = 3) -> str:
    return f"""WITH RECURSIVE {_simhash_ctes()},
spairs AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b
  FROM ssig a JOIN ssig b ON a.doc_id < b.doc_id
  WHERE bit_count(xor(a.sim, b.sim)) <= {max_hamming}
){_survivors_select('spairs')}"""


def langid_predict_sql() -> str:
    """Marker-word language ID matching functions/text_stats.detect_language:
    CJK-share gate, then first-max-wins over the marker tables."""
    word_class = "[a-zäöüßéèêàçñáíóú]+"
    hit_cols = []
    for lang, markers in _LANGS:
        lst = ",".join(f"'{m}'" for m in markers.split())
        hit_cols.append(
            f"len(list_filter(regexp_extract_all(lower(text), '{word_class}'), w -> w IN ({lst}))) AS h_{lang}"
        )
    first_max = " ".join(
        f"WHEN h_{lang} = best THEN '{lang}'" for lang, _ in _LANGS
    )
    return f"""WITH h AS (
  SELECT doc_id, text, {", ".join(hit_cols)},
         len(regexp_extract_all(text, '[\\x{{4e00}}-\\x{{9fff}}]')) AS n_cjk
  FROM documents
),
m AS (SELECT *, greatest(h_en, h_de, h_fr, h_es) AS best FROM h)
SELECT doc_id,
       CASE WHEN length(text) = 0 THEN 'und'
            WHEN n_cjk::DOUBLE / greatest(length(text), 1) > 0.05 THEN 'zh'
            WHEN best = 0 THEN 'und'
            {first_max}
            ELSE 'und' END AS lang_pred
FROM m"""


def emb_neardup_exact_sql(threshold: float = 0.4) -> str:
    """Exact all-pairs cosine >= threshold (the brute-force baseline the
    LSH-banded emb_neardup approximates). f64 math on both sides."""
    return f"""
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       ROUND(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) AS cosine
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE ROUND(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) >= {threshold}"""


def decontaminate_sql(k: int = 5, num: int = 9, den: int = 10,
                      mod: int = 37) -> str:
    """Benchmark-overlap decontamination: per non-benchmark doc, the
    count of distinct shingle hashes shared with the benchmark set
    (doc_id % mod == 0), and the integer-ratio contamination flag
    n_overlap * den >= num * n_shingles (exact on both sides)."""
    return f"""
WITH {_shingle_hash_ctes(k)},
bench AS MATERIALIZED (SELECT DISTINCT h FROM sh WHERE doc_id % {mod} = 0),
own AS (SELECT doc_id, COUNT(*) AS n_shingles FROM sh
        WHERE doc_id % {mod} != 0 GROUP BY doc_id),
ov AS (SELECT s.doc_id, COUNT(*) AS n_overlap FROM sh s JOIN bench USING (h)
       WHERE s.doc_id % {mod} != 0 GROUP BY s.doc_id)
SELECT o.doc_id, COALESCE(n_overlap, 0) AS n_overlap, n_shingles,
       COALESCE(n_overlap, 0) * {den} >= {num} * n_shingles AS contaminated
FROM own o LEFT JOIN ov USING (doc_id)
ORDER BY doc_id"""


def doc_tfidf_top_terms_sql() -> str:
    """Per-doc top term by (tf desc, term asc) with corpus df and
    tf * ln(N/df) r6; single-space split, empty tokens dropped."""
    return """
WITH toks AS MATERIALIZED (
  SELECT doc_id, term, COUNT(*) AS tf
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents)
  WHERE term != '' GROUP BY doc_id, term),
top AS (SELECT doc_id, term, tf FROM toks
        QUALIFY row_number() OVER (PARTITION BY doc_id
                                   ORDER BY tf DESC, term) = 1),
dfreq AS (SELECT term, COUNT(*) AS df FROM toks GROUP BY term)
SELECT doc_id, term, tf, df,
       ROUND(tf * ln((SELECT COUNT(*) FROM documents)::DOUBLE / df), 6) AS tfidf
FROM top JOIN dfreq USING (term)
ORDER BY doc_id"""


def semdedup_sql(threshold: float = 0.4, n_clusters: int = 12) -> str:
    """SemDeDup dominated-by-earlier pruning inside TRAINED-codebook
    clusters (``lloyd_assign_ctes`` -- the same 2-iter Lloyd fit as the
    engine's lloyd_codebook, k decoupled from the label count); the
    ROUND(cos,6) boundary convention of emb_neardup_exact."""
    return f"""
WITH {lloyd_assign_ctes(n_clusters)}
SELECT a.vec_id FROM assign a
WHERE NOT EXISTS (
  SELECT 1 FROM assign b
  JOIN embeddings ea ON ea.vec_id = a.vec_id
  JOIN embeddings eb ON eb.vec_id = b.vec_id
  WHERE b.cl = a.cl AND b.vec_id < a.vec_id
    AND ROUND(list_cosine_similarity(ea.embedding::DOUBLE[],
                                     eb.embedding::DOUBLE[]), 6) > {threshold})
ORDER BY a.vec_id"""


def _plane_values(planes) -> str:
    """(dim, n_planes) matrix -> SQL VALUES tuples (i 1-based dim index,
    j 0-based plane index, v full-precision literal)."""
    rows = []
    for i in range(planes.shape[0]):
        for j in range(planes.shape[1]):
            rows.append(f"({i + 1},{j},{planes[i, j]!r})")
    return ",".join(rows)


def ann_lsh_sql(query_ids=(0, 1, 2, 3, 4), k: int = 10, bands: int = 16,
                rows_per_band: int = 6, dim: int = 64, seed: int = 42) -> str:
    """Banded hyperplane-LSH top-k (stages/similarity.lsh_topk): the
    seeded plane matrix is INLINED (the RNG's output, not the RNG), sign
    bits / band keys / the salted wanted-set are computed in SQL, and
    the exact cosine top-k runs over the candidate union. Sign bits are
    scale-invariant, so SQL skips the normalize the Ray side does."""
    import numpy as np

    planes = np.random.RandomState(seed).normal(size=(dim, bands * rows_per_band))
    qs = ",".join(str(int(q)) for q in query_ids)
    salt = 1 << rows_per_band
    return f"""
WITH p(i, j, v) AS (VALUES {_plane_values(planes)}),
bits AS MATERIALIZED (
  SELECT e.vec_id, p.j,
         CASE WHEN SUM(e.embedding[p.i] * p.v) > 0 THEN 1 ELSE 0 END AS bit
  FROM embeddings e, p GROUP BY e.vec_id, p.j),
keys AS MATERIALIZED (
  SELECT vec_id,
         CAST(SUM(bit << (j % {rows_per_band})) + (j // {rows_per_band}) * {salt}
              AS BIGINT) AS key
  FROM bits GROUP BY vec_id, j // {rows_per_band}),
qk AS (SELECT DISTINCT key FROM keys WHERE vec_id IN ({qs})),
cand AS (SELECT DISTINCT k.vec_id FROM keys k JOIN qk USING (key)),
q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qe
      FROM embeddings WHERE vec_id IN ({qs})),
s AS (SELECT q.query_id, e.vec_id,
             list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.qe) AS sim
      FROM embeddings e JOIN cand USING (vec_id), q
      WHERE e.vec_id <> q.query_id)
SELECT query_id, vec_id, CAST(rank AS BIGINT) AS rank FROM (
  SELECT query_id, vec_id,
         row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, vec_id) AS rank
  FROM s)
WHERE rank <= {k}"""


def ann_ivf_sql(query_ids=(0, 1, 2, 3, 4), k: int = 10, n_lists: int = 16,
                n_probe: int = 4, dim: int = 64, seed: int = 42) -> str:
    """IVF-probed top-k (stages/similarity.ivf_topk): the seeded
    NORMALIZED codebook is inlined; list assignment (argmax dot) and the
    per-query probe set (top n_probe dots) are computed in SQL; exact
    cosine top-k over the probed lists' members. Dot-ordering is
    scale-invariant per row, so raw embeddings stand in for the
    normalized ones."""
    import numpy as np

    rng = np.random.RandomState(seed)
    c = rng.normal(size=(n_lists, dim))
    c = c / np.linalg.norm(c, axis=1, keepdims=True)
    qs = ",".join(str(int(q)) for q in query_ids)
    return f"""
WITH c(i, cl, v) AS (VALUES {_plane_values(c.T)}),
dot AS MATERIALIZED (
  SELECT e.vec_id, c.cl, SUM(e.embedding[c.i] * c.v) AS d
  FROM embeddings e, c GROUP BY e.vec_id, c.cl),
assign AS (
  SELECT vec_id, cl FROM dot
  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY d DESC, cl) = 1),
probed AS (
  SELECT DISTINCT cl FROM (
    SELECT vec_id, cl FROM dot WHERE vec_id IN ({qs})
    QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY d DESC, cl)
            <= {n_probe})),
cand AS (SELECT a.vec_id FROM assign a JOIN probed USING (cl)),
q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qe
      FROM embeddings WHERE vec_id IN ({qs})),
s AS (SELECT q.query_id, e.vec_id,
             list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.qe) AS sim
      FROM embeddings e JOIN cand USING (vec_id), q
      WHERE e.vec_id <> q.query_id)
SELECT query_id, vec_id, CAST(rank AS BIGINT) AS rank FROM (
  SELECT query_id, vec_id,
         row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, vec_id) AS rank
  FROM s)
WHERE rank <= {k}"""


def ann_exact_topk_sql(query_ids=(0, 1, 2, 3, 4), k: int = 10) -> str:
    """Exact brute-force cosine top-k (stages/similarity.brute_force_topk):
    the ground-truth ranking every ANN variant is measured against.
    Shared builder so ann_topk and ann_recall_at_k cannot desync."""
    qs = ",".join(str(int(q)) for q in query_ids)
    return f"""
WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qe
           FROM embeddings WHERE vec_id IN ({qs})),
s AS (SELECT q.query_id, e.vec_id,
             list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.qe) AS sim
      FROM embeddings e, q WHERE e.vec_id <> q.query_id)
SELECT query_id, vec_id, CAST(rank AS BIGINT) AS rank FROM (
  SELECT query_id, vec_id,
         row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, vec_id) AS rank
  FROM s)
WHERE rank <= {k}"""


def ann_recall_sql(query_ids=(0, 1, 2, 3, 4), k: int = 10, n_lists: int = 16,
                   n_probe: int = 4, dim: int = 64, seed: int = 42) -> str:
    """Recall@k of the IVF probe path vs the exact baseline
    (stages/similarity.ann_recall_at_k): |approx top-k ∩ exact top-k| / k
    per query. Composes ann_exact_topk_sql and ann_ivf_sql verbatim so
    the evaluation oracle can never drift from the rankings it grades.
    The division is one double op on an integer count, so no rounding is
    needed for exact-float agreement with the engine."""
    exact = ann_exact_topk_sql(query_ids, k)
    approx = ann_ivf_sql(query_ids, k, n_lists, n_probe, dim, seed)
    return f"""
WITH exact AS ({exact}),
approx AS ({approx})
SELECT e.query_id,
       CAST(COUNT(a.vec_id) AS DOUBLE) / {k} AS recall_at_k
FROM exact e LEFT JOIN approx a
  ON e.query_id = a.query_id AND e.vec_id = a.vec_id
GROUP BY e.query_id ORDER BY e.query_id"""


def emb_neardup_sql(threshold: float = 0.4, bands: int = 6,
                    rows_per_band: int = 3, dim: int = 64,
                    seed: int = 42) -> str:
    """Banded-LSH near-dup pairs (stages/similarity.embedding_neardup_pairs):
    inlined seeded planes, band-bucket candidate pairs (pair shares ANY
    band bucket), exact-cosine verify at the RAW >= threshold boundary
    (the Ray verify compares unrounded cosine; output is rounded r6)."""
    import numpy as np

    planes = np.random.RandomState(seed).normal(size=(dim, bands * rows_per_band))
    return f"""
WITH p(i, j, v) AS (VALUES {_plane_values(planes)}),
bits AS MATERIALIZED (
  SELECT e.vec_id, p.j,
         CASE WHEN SUM(e.embedding[p.i] * p.v) > 0 THEN 1 ELSE 0 END AS bit
  FROM embeddings e, p GROUP BY e.vec_id, p.j),
keys AS MATERIALIZED (
  SELECT vec_id, j // {rows_per_band} AS band,
         CAST(SUM(bit << (j % {rows_per_band})) AS BIGINT) AS key
  FROM bits GROUP BY vec_id, j // {rows_per_band}),
cand AS (
  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
  FROM keys a JOIN keys b ON a.band = b.band AND a.key = b.key
                         AND a.vec_id < b.vec_id)
SELECT c.id_a, c.id_b,
       ROUND(list_cosine_similarity(ea.embedding::DOUBLE[],
                                    eb.embedding::DOUBLE[]), 6) AS cosine
FROM cand c
JOIN embeddings ea ON ea.vec_id = c.id_a
JOIN embeddings eb ON eb.vec_id = c.id_b
WHERE list_cosine_similarity(ea.embedding::DOUBLE[],
                             eb.embedding::DOUBLE[]) >= {threshold}
ORDER BY id_a, id_b"""

def lloyd_assign_ctes(n_clusters: int) -> str:
    """CTE chain re-deriving stages/similarity.lloyd_codebook in SQL:
    2-iteration Lloyd training UNROLLED (seeds = vec_id < n_clusters,
    argmin by (dist, cl), empty clusters COALESCE to the previous
    round), ending in ``d3(vec_id, cl, dist)`` (distances to the final
    centroids) and ``assign(vec_id, cl)`` (final assignment). Shared by
    the trained-IVF and semdedup oracles."""
    return f"""c0 AS MATERIALIZED (
  SELECT vec_id AS cl, i, CAST(embedding[i] AS DOUBLE) AS cv
  FROM embeddings, unnest(range(1, len(embedding) + 1)) AS t(i)
  WHERE vec_id < {n_clusters}),
d1 AS (
  SELECT e.vec_id, c.cl, SUM((e.embedding[c.i] - c.cv) ^ 2) AS dist
  FROM embeddings e, c0 c GROUP BY 1, 2),
a1 AS (
  SELECT vec_id, cl FROM d1
  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY dist, cl) = 1),
n1 AS (
  SELECT a.cl, t.i, AVG(e.embedding[t.i]) AS cv
  FROM a1 a JOIN embeddings e USING (vec_id),
       unnest(range(1, len(e.embedding) + 1)) AS t(i)
  GROUP BY 1, 2),
c1 AS MATERIALIZED (
  SELECT c0.cl, c0.i, COALESCE(n1.cv, c0.cv) AS cv
  FROM c0 LEFT JOIN n1 ON n1.cl = c0.cl AND n1.i = c0.i),
d2 AS (
  SELECT e.vec_id, c.cl, SUM((e.embedding[c.i] - c.cv) ^ 2) AS dist
  FROM embeddings e, c1 c GROUP BY 1, 2),
a2 AS (
  SELECT vec_id, cl FROM d2
  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY dist, cl) = 1),
n2 AS (
  SELECT a.cl, t.i, AVG(e.embedding[t.i]) AS cv
  FROM a2 a JOIN embeddings e USING (vec_id),
       unnest(range(1, len(e.embedding) + 1)) AS t(i)
  GROUP BY 1, 2),
c2 AS MATERIALIZED (
  SELECT c1.cl, c1.i, COALESCE(n2.cv, c1.cv) AS cv
  FROM c1 LEFT JOIN n2 ON n2.cl = c1.cl AND n2.i = c1.i),
d3 AS MATERIALIZED (
  SELECT e.vec_id, c.cl, SUM((e.embedding[c.i] - c.cv) ^ 2) AS dist
  FROM embeddings e, c2 c GROUP BY 1, 2),
assign AS (
  SELECT vec_id, cl FROM d3
  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY dist, cl) = 1)"""


def ann_ivf_trained_sql(query_ids=(0, 1, 2, 3, 4), k: int = 10,
                        n_clusters: int = 6, n_probe: int = 2) -> str:
    """Trained-IVF top-k (stages/similarity.ivf_trained_topk): the
    2-iteration Lloyd training is UNROLLED in SQL (the kmeans_fit CTE
    chain -- seeds = vec_id < n_clusters, argmin by (dist, cl), empty
    clusters COALESCE to the previous round), then list assignment,
    the per-query n_probe probe set and the exact cosine top-k are all
    computed from the trained centroids."""
    qs = ",".join(str(int(q)) for q in query_ids)
    return f"""
WITH {lloyd_assign_ctes(n_clusters)},
probed AS (
  SELECT DISTINCT cl FROM (
    SELECT vec_id, cl FROM d3 WHERE vec_id IN ({qs})
    QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY dist, cl)
            <= {n_probe})),
cand AS (SELECT a.vec_id FROM assign a JOIN probed USING (cl)),
q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qe
      FROM embeddings WHERE vec_id IN ({qs})),
s AS (SELECT q.query_id, e.vec_id,
             list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.qe) AS sim
      FROM embeddings e JOIN cand USING (vec_id), q
      WHERE e.vec_id <> q.query_id)
SELECT query_id, vec_id, CAST(rank AS BIGINT) AS rank FROM (
  SELECT query_id, vec_id,
         row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, vec_id) AS rank
  FROM s)
WHERE rank <= {k}"""


def quality_survivors_sql(threshold: float = 0.8) -> str:
    """Quality-aware survivor selection: in each component of the
    verified-pair closure keep the member with max n_chars (ties by
    min doc_id); docs outside any component always survive.  Matches
    stages/dedup.quality_survivors over the same verified pairs."""
    return (
        f"WITH RECURSIVE {_minhash_cand_ctes()}"
        f"{_char_jaccard_verified_ctes(threshold)}"
        """,
sym AS (SELECT id_a AS src, id_b AS dst FROM verified
        UNION SELECT id_b, id_a FROM verified),
reach(src, dst) AS (
  SELECT src, dst FROM sym
  UNION
  SELECT r.src, s.dst FROM reach r JOIN sym s ON r.dst = s.src
),
lab AS (
  SELECT n.src AS doc_id, LEAST(n.src, MIN(r.dst)) AS cluster_id
  FROM (SELECT DISTINCT src FROM sym) n
  JOIN reach r ON r.src = n.src GROUP BY n.src),
best AS (
  SELECT doc_id FROM (
    SELECT l.doc_id,
           row_number() OVER (
             PARTITION BY l.cluster_id
             ORDER BY d.n_chars DESC, l.doc_id) AS rk
    FROM lab l JOIN documents d USING (doc_id)) WHERE rk = 1)
SELECT d.* FROM documents d
LEFT JOIN lab ON lab.doc_id = d.doc_id
WHERE lab.doc_id IS NULL OR d.doc_id IN (SELECT doc_id FROM best)
ORDER BY d.doc_id"""
    )


def neardup_degree_hist_sql(threshold: float = 0.8) -> str:
    """Degree histogram of the verified near-dup graph; matches
    stages/dedup.neardup_degree_hist over the same verified pairs."""
    return (
        f"WITH {_minhash_cand_ctes()}"
        f"{_char_jaccard_verified_ctes(threshold)}"
        """,
e AS (SELECT id_a AS id FROM verified
      UNION ALL SELECT id_b FROM verified),
d AS (SELECT id, COUNT(*) AS deg FROM e GROUP BY id)
SELECT CAST(deg AS BIGINT) AS degree,
       CAST(COUNT(*) AS BIGINT) AS n_docs
FROM d GROUP BY deg ORDER BY degree"""
    )


def dedup_rate_by_source_sql(threshold: float = 0.8) -> str:
    """Per-source verified near-dup involvement; matches
    pipelines/curation.dedup_rate_by_source."""
    return (
        f"WITH {_minhash_cand_ctes()}"
        f"{_char_jaccard_verified_ctes(threshold)}"
        """,
m AS (SELECT DISTINCT id FROM (
        SELECT id_a AS id FROM verified
        UNION ALL SELECT id_b FROM verified))
SELECT d.source, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN m.id IS NOT NULL THEN 1 ELSE 0 END)
            AS BIGINT) AS n_dup_docs,
       ROUND(CAST(SUM(CASE WHEN m.id IS NOT NULL THEN 1 ELSE 0 END)
                  AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6) AS dup_rate
FROM documents d LEFT JOIN m ON m.id = d.doc_id
GROUP BY d.source ORDER BY d.source"""
    )


def minhash_estimator_audit_sql(n_hashes: int = 64) -> str:
    """Per-candidate-pair MinHash estimate vs exact char-Jaccard;
    matches stages/dedup.minhash_estimator_audit (threshold-0 verified
    CTE supplies the exact score; est = equal-component fraction from
    the sig CTE; abs_err computed from the two ROUNDED operands in
    both engines)."""
    return (
        f"WITH {_minhash_cand_ctes()}"
        f"{_char_jaccard_verified_ctes(threshold=0.0)}"
        f""",
est AS (
  SELECT c.id_a, c.id_b,
         SUM(CASE WHEN sa.mv = sb.mv THEN 1 ELSE 0 END) AS eq
  FROM cand c
  JOIN sig sa ON sa.doc_id = c.id_a
  JOIN sig sb ON sb.doc_id = c.id_b AND sb.hid = sa.hid
  GROUP BY c.id_a, c.id_b)
SELECT v.id_a, v.id_b,
       ROUND(CAST(e.eq AS DOUBLE) / {n_hashes}, 6) AS est_jaccard,
       v.jaccard AS exact_jaccard,
       ROUND(ABS(ROUND(CAST(e.eq AS DOUBLE) / {n_hashes}, 6)
                 - v.jaccard), 6) AS abs_err
FROM verified v JOIN est e ON e.id_a = v.id_a AND e.id_b = v.id_b
ORDER BY v.id_a, v.id_b"""
    )


def leakage_safe_split_sql(threshold: float = 0.8) -> str:
    """Cluster-keyed 80/10/10 split; matches
    pipelines/curation.leakage_safe_split."""
    return (
        f"WITH RECURSIVE {_minhash_cand_ctes()}"
        f"{_char_jaccard_verified_ctes(threshold)}"
        """,
sym AS (SELECT id_a AS src, id_b AS dst FROM verified
        UNION SELECT id_b, id_a FROM verified),
reach(src, dst) AS (
  SELECT src, dst FROM sym
  UNION
  SELECT r.src, s.dst FROM reach r JOIN sym s ON r.dst = s.src
),
lab AS (
  SELECT n.src AS doc_id, LEAST(n.src, MIN(r.dst)) AS cluster_id
  FROM (SELECT DISTINCT src FROM sym) n
  JOIN reach r ON r.src = n.src GROUP BY n.src),
keyed AS (
  SELECT d.doc_id, COALESCE(lab.cluster_id, d.doc_id) AS cluster_id
  FROM documents d LEFT JOIN lab ON lab.doc_id = d.doc_id)
SELECT doc_id, cluster_id,
       CASE WHEN md5_number_lower(CAST(cluster_id AS VARCHAR)) % 100 < 80
            THEN 'train'
            WHEN md5_number_lower(CAST(cluster_id AS VARCHAR)) % 100 < 90
            THEN 'val' ELSE 'test' END AS split
FROM keyed ORDER BY doc_id"""
    )


def exact_ngram_pairs_sql(threshold: float = 0.3, n: int = 3) -> str:
    """ALL pairs (id_a < id_b) with word-n-gram Jaccard >= threshold --
    the blocking-free ground truth that prefix_filter_ngram_pairs must
    reproduce exactly (same distinct-gram convention and r6 rounding as
    ngram_jaccard_pairs_sql)."""
    gram = " || ' ' || ".join(f"w[i+{j}]" for j in range(n))
    return f"""WITH wrds AS (
  SELECT doc_id, regexp_extract_all(text, '\\S+') AS w FROM documents),
ngr AS MATERIALIZED (
  SELECT DISTINCT doc_id, {gram} AS g
  FROM wrds, unnest(range(1, len(w) - {n - 2})) AS u(i)
  WHERE len(w) >= {n}
  UNION
  SELECT DISTINCT doc_id, array_to_string(w, ' ') AS g
  FROM wrds WHERE len(w) BETWEEN 1 AND {n - 1}
),
gcnt AS (SELECT doc_id, count(*) AS n FROM ngr GROUP BY doc_id),
ginter AS (
  SELECT x.doc_id AS id_a, y.doc_id AS id_b, count(*) AS ni
  FROM ngr x JOIN ngr y ON y.g = x.g AND x.doc_id < y.doc_id
  GROUP BY 1, 2
)
SELECT i.id_a, i.id_b,
       ROUND(i.ni::DOUBLE / (na.n + nb.n - i.ni), 6) AS ngram_jaccard
FROM ginter i
JOIN gcnt na ON na.doc_id = i.id_a
JOIN gcnt nb ON nb.doc_id = i.id_b
WHERE ROUND(i.ni::DOUBLE / (na.n + nb.n - i.ni), 6) >= {threshold}"""


def minhash_recall_sql(threshold: float = 0.3, n: int = 3) -> str:
    """LSH-chain recall/precision vs the exact similarity join
    (stages/dedup.lsh_recall_eval): composes exact_ngram_pairs_sql and
    ngram_jaccard_pairs_sql verbatim so the evaluation can never drift
    from the joins it grades; the ratios are single double ops on
    integer counts."""
    return f"""
WITH exact AS ({exact_ngram_pairs_sql(threshold, n)}),
lsh AS ({ngram_jaccard_pairs_sql(threshold, n)}),
ne AS (SELECT COUNT(*) AS n_exact FROM exact),
nl AS (SELECT COUNT(*) AS n_lsh FROM lsh),
h AS (SELECT COUNT(*) AS n_hit
      FROM exact e JOIN lsh l ON e.id_a = l.id_a AND e.id_b = l.id_b)
SELECT CAST(ne.n_exact AS BIGINT) AS n_exact,
       CAST(nl.n_lsh AS BIGINT) AS n_lsh,
       CAST(h.n_hit AS BIGINT) AS n_hit,
       CASE WHEN ne.n_exact > 0
            THEN CAST(h.n_hit AS DOUBLE) / ne.n_exact ELSE 0.0 END
         AS lsh_recall,
       CASE WHEN nl.n_lsh > 0
            THEN CAST(h.n_hit AS DOUBLE) / nl.n_lsh ELSE 0.0 END
         AS lsh_precision
FROM ne, nl, h"""


def lloyd_assign_ctes_slice(n_clusters: int, lo: int, hi: int,
                            prefix: str) -> str:
    """``lloyd_assign_ctes`` restricted to embedding dims [lo, hi]
    (1-based, inclusive) with CTE names prefixed -- the per-subspace
    building block of the product-quantization oracle. Seeds are the
    SLICES of vec_id < n_clusters, matching the engine's per-subspace
    lloyd_codebook fit."""
    p = prefix
    rng = f"range({lo}, {hi + 1})"
    return f"""{p}c0 AS MATERIALIZED (
  SELECT vec_id AS cl, i, CAST(embedding[i] AS DOUBLE) AS cv
  FROM embeddings, unnest({rng}) AS t(i)
  WHERE vec_id < {n_clusters}),
{p}d1 AS (
  SELECT e.vec_id, c.cl, SUM((e.embedding[c.i] - c.cv) ^ 2) AS dist
  FROM embeddings e, {p}c0 c GROUP BY 1, 2),
{p}a1 AS (
  SELECT vec_id, cl FROM {p}d1
  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY dist, cl) = 1),
{p}n1 AS (
  SELECT a.cl, t.i, AVG(e.embedding[t.i]) AS cv
  FROM {p}a1 a JOIN embeddings e USING (vec_id),
       unnest({rng}) AS t(i)
  GROUP BY 1, 2),
{p}c1 AS MATERIALIZED (
  SELECT {p}c0.cl, {p}c0.i, COALESCE({p}n1.cv, {p}c0.cv) AS cv
  FROM {p}c0 LEFT JOIN {p}n1 ON {p}n1.cl = {p}c0.cl AND {p}n1.i = {p}c0.i),
{p}d2 AS (
  SELECT e.vec_id, c.cl, SUM((e.embedding[c.i] - c.cv) ^ 2) AS dist
  FROM embeddings e, {p}c1 c GROUP BY 1, 2),
{p}a2 AS (
  SELECT vec_id, cl FROM {p}d2
  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY dist, cl) = 1),
{p}n2 AS (
  SELECT a.cl, t.i, AVG(e.embedding[t.i]) AS cv
  FROM {p}a2 a JOIN embeddings e USING (vec_id),
       unnest({rng}) AS t(i)
  GROUP BY 1, 2),
{p}c2 AS MATERIALIZED (
  SELECT {p}c1.cl, {p}c1.i, COALESCE({p}n2.cv, {p}c1.cv) AS cv
  FROM {p}c1 LEFT JOIN {p}n2 ON {p}n2.cl = {p}c1.cl AND {p}n2.i = {p}c1.i),
{p}d3 AS MATERIALIZED (
  SELECT e.vec_id, c.cl, SUM((e.embedding[c.i] - c.cv) ^ 2) AS dist
  FROM embeddings e, {p}c2 c GROUP BY 1, 2),
{p}assign AS (
  SELECT vec_id, cl, dist FROM {p}d3
  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY dist, cl) = 1)"""


def pq_encode_sql(dim: int, m: int = 2, n_clusters: int = 4) -> str:
    """Product-quantization codes (stages/similarity.pq_encode): the
    embedding splits into ``m`` contiguous subspaces, each with its own
    2-iter Lloyd codebook fit on the subspace slices; a vector's code
    is its per-subspace nearest-centroid tuple and qerr the summed
    squared residual. Deterministic given the shared seed convention
    (vec_id < k slices)."""
    assert dim % m == 0
    w = dim // m
    ctes, cols, joins, err = [], [], [], []
    for j in range(m):
        p = f"s{j}_"
        ctes.append(lloyd_assign_ctes_slice(n_clusters, j * w + 1,
                                            (j + 1) * w, p))
        cols.append(f"{p}assign.cl AS code{j}")
        err.append(f"{p}assign.dist")
        joins.append(f"{p}assign")
    base = joins[0]
    join_sql = f"FROM {base}\n" + "\n".join(
        f"JOIN {t} USING (vec_id)" for t in joins[1:])
    return f"""
WITH {",".join(ctes)}
SELECT vec_id, {", ".join(cols)},
       ROUND({" + ".join(err)}, 6) AS qerr
{join_sql}
ORDER BY vec_id"""


def pq_adc_topk_sql(query_ids=(0, 1, 2, 3, 4), k: int = 10, dim: int = 64,
                    m: int = 2, n_clusters: int = 4) -> str:
    """PQ asymmetric-distance top-k (stages/similarity.pq_adc_topk):
    per-subspace query-to-centroid lookup distances from the unrolled
    sliced-Lloyd centroids, summed over each vector's assigned code
    tuple; rank by (adc, vec_id), self excluded. Vectors sharing a code
    tuple tie exactly on adc in BOTH engines (the distance is a
    function of the code alone), so the vec_id tie-break is load-
    bearing and deterministic."""
    assert dim % m == 0
    w = dim // m
    qs = ",".join(str(int(q)) for q in query_ids)
    ctes, luts = [], []
    for j in range(m):
        p = f"s{j}_"
        ctes.append(lloyd_assign_ctes_slice(n_clusters, j * w + 1,
                                            (j + 1) * w, p))
        luts.append(f"""lut{j} AS (
  SELECT e.vec_id AS query_id, c.cl, SUM((e.embedding[c.i] - c.cv) ^ 2) AS d
  FROM embeddings e, {p}c2 c
  WHERE e.vec_id IN ({qs}) GROUP BY 1, 2)""")
    adc_join = "\n".join(
        [f"FROM s0_assign a0"]
        + [f"JOIN s{j}_assign a{j} USING (vec_id)" for j in range(1, m)]
        + ["JOIN lut0 l0 ON l0.cl = a0.cl"]
        + [f"JOIN lut{j} l{j} ON l{j}.cl = a{j}.cl"
           f" AND l{j}.query_id = l0.query_id" for j in range(1, m)])
    adc_sum = " + ".join(f"l{j}.d" for j in range(m))
    return f"""
WITH {",".join(ctes)},
{",".join(luts)},
adc AS (
  SELECT l0.query_id, a0.vec_id, {adc_sum} AS adc
  {adc_join})
SELECT query_id, vec_id, CAST(rank AS BIGINT) AS rank FROM (
  SELECT query_id, vec_id,
         row_number() OVER (PARTITION BY query_id ORDER BY adc, vec_id) AS rank
  FROM adc WHERE vec_id <> query_id)
WHERE rank <= {k}
ORDER BY query_id, rank"""


def similar_docs_topk_sql(k: int = 5, threshold: float = 0.3,
                          n: int = 3) -> str:
    """Per-doc top-k related documents: the exact all-pairs join
    (exact_ngram_pairs_sql) symmetrized and ranked per doc by
    (jaccard desc, other_id)."""
    return f"""
WITH base AS MATERIALIZED (
  SELECT * FROM ({exact_ngram_pairs_sql(threshold, n)})),
sym AS (
  SELECT id_a AS doc_id, id_b AS other_id, ngram_jaccard FROM base
  UNION ALL
  SELECT id_b, id_a, ngram_jaccard FROM base)
SELECT doc_id, other_id, ngram_jaccard, CAST(rk AS BIGINT) AS rk FROM (
  SELECT *, row_number() OVER (
           PARTITION BY doc_id
           ORDER BY ngram_jaccard DESC, other_id) AS rk
  FROM sym)
WHERE rk <= {k}
ORDER BY doc_id, rk"""


# ---------------------------------------------------------------------------
# Shared per-doc metric CTE builders (quality + repetition)
#
# doc_quality, doc_repetition AND gopher_gate compose their oracles
# from THESE builders so the three can never silently desync (ADVICE
# r4): the gate's rule thresholds compare the exact r6-rounded values
# the metric queries publish (functions/text_stats.py).
# ---------------------------------------------------------------------------

STOP_SQL = r"\b(?:the|and|of|to|a|in|is|it|for|on)\b"


def quality_metrics_ctes(table: str = "documents") -> str:
    """CTE chain ``q, qm``: per-doc counts (n_chars, n_tokens) and the
    r6-rounded ratios atl (avg token len), pr (punct ratio), sr
    (stopword ratio) -- functions/text_stats.py quality_metrics."""
    return rf"""q AS (
              SELECT doc_id,
                     length(text) AS n_chars,
                     len(regexp_extract_all(text, '\S+')) AS n_tokens,
                     len(regexp_extract_all(text, '[.,;:!?]')) AS n_punct,
                     len(regexp_extract_all(lower(text), '{STOP_SQL}')) AS n_stop
              FROM {table}),
            qm AS (
              SELECT doc_id, n_chars, n_tokens,
                     CASE WHEN n_tokens > 0 THEN ROUND(CAST(n_chars AS DOUBLE)/n_tokens, 6) ELSE 0.0 END AS atl,
                     CASE WHEN n_chars > 0 THEN ROUND(CAST(n_punct AS DOUBLE)/n_chars, 6) ELSE 0.0 END AS pr,
                     CASE WHEN n_tokens > 0 THEN ROUND(CAST(n_stop AS DOUBLE)/n_tokens, 6) ELSE 0.0 END AS sr
              FROM q)"""


def repetition_metrics_ctes(table: str = "documents") -> str:
    """CTE chain ``lines..rm``: per-doc r6-rounded repetition metrics
    dl (dup-line frac), dc (dup-line char frac), t2 (top-2-gram char
    frac) -- functions/text_stats.py repetition_metrics. ``rm`` left-
    joins back to ``table`` so every doc_id appears (zero metrics for
    degenerate docs)."""
    return rf"""lines AS (
              SELECT doc_id, unnest(string_split(text, chr(10))) AS line FROM {table}),
            lc AS (SELECT doc_id, line, count(*) AS cnt FROM lines GROUP BY 1, 2),
            lstats AS (
              SELECT doc_id, sum(cnt) AS n_lines, count(*) AS n_distinct,
                     sum(cnt * length(line)) AS total_chars,
                     sum((cnt - 1) * length(line)) AS dup_chars
              FROM lc GROUP BY 1),
            w AS (SELECT doc_id, regexp_extract_all(text, '\S+') AS ws,
                         length(text) AS n_chars FROM {table}),
            g AS (SELECT doc_id, ws[i] || ' ' || ws[i+1] AS gram, n_chars
                  FROM w, unnest(range(1, len(ws))) AS u(i) WHERE len(ws) >= 2),
            gc AS (SELECT doc_id, gram, count(*) AS cnt,
                          any_value(n_chars) AS n_chars FROM g GROUP BY 1, 2),
            topg AS (
              SELECT doc_id, (cnt * length(gram))::DOUBLE / n_chars AS frac,
                     row_number() OVER (PARTITION BY doc_id
                                        ORDER BY cnt DESC, gram ASC) AS rk
              FROM gc),
            rm AS (
              SELECT d.doc_id,
                     ROUND(CASE WHEN s.n_lines > 0
                           THEN (s.n_lines - s.n_distinct)::DOUBLE / s.n_lines
                           ELSE 0 END, 6) AS dl,
                     ROUND(CASE WHEN s.total_chars > 0
                           THEN s.dup_chars::DOUBLE / s.total_chars
                           ELSE 0 END, 6) AS dc,
                     ROUND(COALESCE(t.frac, 0), 6) AS t2
              FROM {table} d
              LEFT JOIN lstats s ON s.doc_id = d.doc_id
              LEFT JOIN (SELECT doc_id, frac FROM topg WHERE rk = 1) t
                ON t.doc_id = d.doc_id)"""


# ---------------------------------------------------------------------------
# Media-payload dedup family (pipelines/media.py)
#
# The fixture media table is rebuilt INLINE: every pick uses
# md5_number_lower (the engine's functions/hashing._hash64 twin) and
# the payload's canonical lowercase-hex serialization is re-hashed
# with sha256 -- DuckDB's sha256 only takes VARCHAR, so the content
# key is sha256(hex(payload)) on both sides.
# ---------------------------------------------------------------------------

def _le32_hex(expr: str) -> str:
    """Lowercase hex of a value < 256 packed as little-endian uint32
    (the struct.pack('<I', v) bytes of the fixture dims)."""
    return f"lower(lpad(to_hex({expr}), 2, '0')) || '000000'"


def media_fixture_ctes(table: str = "documents", n_assets: int = 64,
                       max_media: int = 4) -> str:
    """CTE chain ``md, mr, mp``: the deterministic doc->media explode
    (0..max_media-1 refs per doc, asset pool of n_assets) ending in
    (doc_id, media_ref, asset_id, content_key)."""
    magic_hex = "46414b45504e4730"  # b"FAKEPNG0".hex()
    w = f"64 + (asset_id % 8) * 16"
    h = f"48 + (asset_id % 5) * 32"
    return f"""md AS (
              SELECT doc_id,
                     CAST(md5_number_lower(doc_id::VARCHAR || ':nm')
                          % {max_media} AS BIGINT) AS n_m
              FROM {table}),
            mr AS (
              SELECT doc_id, CAST(j AS BIGINT) AS j,
                     CAST(md5_number_lower(doc_id::VARCHAR || ':m'
                          || j::VARCHAR) % {n_assets} AS BIGINT) AS asset_id
              FROM md, unnest(range(0, n_m)) AS u(j)),
            mp AS (
              SELECT doc_id,
                     'media://' || doc_id::VARCHAR || '/' || j::VARCHAR
                       AS media_ref,
                     asset_id,
                     sha256('{magic_hex}'
                            || {_le32_hex(w)}
                            || {_le32_hex(h)}
                            || sha256('asset:' || asset_id::VARCHAR))
                       AS content_key
              FROM mr)"""


def media_dedup_sql() -> str:
    return f"""
WITH {media_fixture_ctes()}
SELECT content_key, MIN(media_ref) AS keeper_ref,
       CAST(COUNT(*) AS BIGINT) AS n_copies
FROM mp GROUP BY content_key ORDER BY content_key"""


def repeated_media_census_sql(min_refs: int = 2) -> str:
    return f"""
WITH {media_fixture_ctes()}
SELECT content_key, CAST(COUNT(*) AS BIGINT) AS n_refs,
       CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
FROM mp GROUP BY content_key
HAVING COUNT(*) >= {min_refs}
ORDER BY content_key"""


def doc_media_stats_sql() -> str:
    return f"""
WITH {media_fixture_ctes()},
s AS (SELECT doc_id, COUNT(*) AS n_media,
             COUNT(DISTINCT asset_id) AS n_distinct
      FROM mp GROUP BY doc_id)
SELECT md.doc_id,
       CAST(COALESCE(s.n_media, 0) AS BIGINT) AS n_media,
       CAST(COALESCE(s.n_distinct, 0) AS BIGINT) AS n_distinct,
       CAST(COALESCE(s.n_media, 0) - COALESCE(s.n_distinct, 0) AS BIGINT)
         AS n_dup_refs
FROM md LEFT JOIN s USING (doc_id)
ORDER BY md.doc_id"""


# ---------------------------------------------------------------------------
# Learned quality gate (pipelines/curation.quality_classifier_gate)
# ---------------------------------------------------------------------------

def quality_classifier_gate_sql(pos_col: str = "lang",
                                pos_values=("en",),
                                n_features: int = 256) -> str:
    """Naive-Bayes log-odds over hashed unigram features, recomputed
    inline: md5_number_lower is the engine's _hash64 twin and every ln
    operand is an exact integer, so the weight table agrees bit-for-bit
    and the per-doc score agrees at r6 (sum-order drift only)."""
    pos = ", ".join(f"'{v}'" for v in pos_values)
    d = n_features
    return f"""
WITH tk AS (
  SELECT doc_id, {pos_col}, term,
         CAST(md5_number_lower(term) % {d} AS BIGINT) AS b
  FROM (SELECT doc_id, {pos_col}, unnest(string_split(text, ' ')) AS term
        FROM documents)
  WHERE term <> ''),
cls AS (
  SELECT b,
         SUM(CASE WHEN {pos_col} IN ({pos}) THEN 1 ELSE 0 END) AS c_p,
         COUNT(*) AS c_a
  FROM tk GROUP BY b),
tot AS (SELECT SUM(c_p) AS n_p, SUM(c_a - c_p) AS n_n FROM cls),
dc AS (SELECT COUNT(*) FILTER (WHERE {pos_col} IN ({pos})) AS d_p,
              COUNT(*) AS d_a FROM documents),
w AS (SELECT b,
             ln(CAST((c_p + 1) * (n_n + {d}) AS DOUBLE))
             - ln(CAST((c_a - c_p + 1) * (n_p + {d}) AS DOUBLE)) AS wgt
      FROM cls, tot),
feat AS (SELECT doc_id, b, COUNT(*) AS n FROM tk GROUP BY doc_id, b),
ss AS (SELECT doc_id, SUM(n * wgt) AS s, SUM(n) AS n_tok
       FROM feat JOIN w USING (b) GROUP BY doc_id)
SELECT doc_id, n_feat_tokens, score, score >= 0 AS keep FROM (
  SELECT d.doc_id,
         CAST(COALESCE(ss.n_tok, 0) AS BIGINT) AS n_feat_tokens,
         ROUND(ln(CAST(dc.d_p + 1 AS DOUBLE))
               - ln(CAST(dc.d_a - dc.d_p + 1 AS DOUBLE))
               + COALESCE(ss.s, 0.0), 6) AS score
  FROM documents d CROSS JOIN dc
  LEFT JOIN ss ON ss.doc_id = d.doc_id)
ORDER BY doc_id"""


def quality_keep_rate_sql() -> str:
    return f"""
SELECT ROUND(CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(*), 6) AS keep_rate
FROM ({quality_classifier_gate_sql()})"""


def ann_shard_plan_sql(n_clusters: int = 6, n_shards: int = 3) -> str:
    """stages/similarity.ann_shard_plan: the cell census comes from the
    shared ``lloyd_assign_ctes`` fit (ground truth cannot desync from
    the trained-IVF oracle), and the greedy LPT packing -- cells in
    descending (n_vecs, cl) order, each to the lightest shard, first
    (= lowest-id) shard on ties -- is a RECURSIVE CTE whose state is
    the per-shard load list (list_position(loads, list_min(loads))
    picks the same argmin as the engine's (load, shard-id) min)."""
    return f"""
WITH RECURSIVE {lloyd_assign_ctes(n_clusters)},
census AS (
  SELECT t.cl, COALESCE(a.n, 0) AS n_vecs
  FROM (SELECT unnest(range({n_clusters})) AS cl) t
  LEFT JOIN (SELECT cl, COUNT(*) AS n FROM assign GROUP BY cl) a
         USING (cl)),
ordered AS (
  SELECT cl, n_vecs, row_number() OVER (ORDER BY n_vecs DESC, cl) AS rn
  FROM census),
pack(rn, cl, n_vecs, shard, loads) AS (
  SELECT CAST(0 AS BIGINT), CAST(NULL AS BIGINT), CAST(NULL AS BIGINT),
         CAST(NULL AS BIGINT),
         list_transform(range({n_shards}), x -> CAST(0 AS BIGINT))
  UNION ALL
  SELECT o.rn, o.cl, o.n_vecs,
         CAST(list_position(p.loads, list_min(p.loads)) - 1 AS BIGINT),
         list_transform(range(1, {n_shards} + 1),
           i -> p.loads[i]
                + CASE WHEN i = list_position(p.loads, list_min(p.loads))
                       THEN o.n_vecs ELSE CAST(0 AS BIGINT) END)
  FROM pack p JOIN ordered o ON o.rn = p.rn + 1)
SELECT cl, CAST(n_vecs AS BIGINT) AS n_vecs, shard
FROM pack WHERE rn > 0 ORDER BY cl"""


def emb_norm_outliers_sql(q_lo_pm: int = 10, q_hi_pm: int = 990) -> str:
    """stages/similarity.emb_norm_outliers: the L-infinity norm is a
    pure per-row abs+max (no float summation, bit-identical to numpy),
    rounded r6 before ranking; the band edges are the same order
    statistics (per-mille edge ranks in INTEGER ceil-division, ascending
    and descending via QUALIFY row_number), and membership is the
    identical strict compare."""
    return f"""
WITH norms AS MATERIALIZED (
  SELECT vec_id,
         ROUND(list_max(list_transform(embedding::DOUBLE[],
                                       x -> abs(x))), 6) AS inf_norm
  FROM embeddings),
n AS (SELECT COUNT(*) AS n FROM norms),
lo AS (SELECT inf_norm AS v FROM norms, n
       QUALIFY row_number() OVER (ORDER BY inf_norm)
               = GREATEST(1, (n.n * {q_lo_pm} + 999) // 1000)),
hi AS (SELECT inf_norm AS v FROM norms, n
       QUALIFY row_number() OVER (ORDER BY inf_norm DESC)
               = GREATEST(1, (n.n * (1000 - {q_hi_pm}) + 999) // 1000))
SELECT vec_id, inf_norm,
       CASE WHEN inf_norm < (SELECT v FROM lo) THEN 'low' ELSE 'high' END AS tag
FROM norms
WHERE inf_norm < (SELECT v FROM lo) OR inf_norm > (SELECT v FROM hi)
ORDER BY vec_id"""


# ---------------------------------------------------------------------------
# KMV distinct sketch (pipelines/relational.events_user_reach_kmv)
# ---------------------------------------------------------------------------

def events_user_reach_kmv_sql(k: int = 8) -> str:
    """Rebuilds the bottom-k sketch exactly: distinct md5_number_lower
    user hashes per type, the k smallest, h_k = their max; estimate
    (k-1) * 2^64 / h_k (or the sketch size when it holds the whole set)
    with the engine's operand order, r6 on the final projection only."""
    return f"""
WITH d AS (SELECT DISTINCT event_type,
                  md5_number_lower(user_id::VARCHAR) AS h
           FROM events),
r AS (SELECT event_type, h,
             row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn,
             count(*) OVER (PARTITION BY event_type) AS n_exact
      FROM d),
s AS (SELECT event_type, any_value(n_exact) AS n_exact,
             count(*) AS n_sketch, max(h) AS h_k
      FROM r WHERE rn <= {k} GROUP BY event_type),
e AS (SELECT event_type, n_exact, n_sketch, h_k,
             CASE WHEN n_sketch < {k} THEN CAST(n_sketch AS DOUBLE)
                  ELSE ({k - 1} * 18446744073709551616.0)
                       / CAST(h_k AS DOUBLE) END AS est
      FROM s)
SELECT event_type,
       CAST(n_exact AS BIGINT) AS n_exact,
       CAST(n_sketch AS BIGINT) AS n_sketch,
       h_k,
       ROUND(est, 6) AS est_users,
       ROUND((est - CAST(n_exact AS DOUBLE)) / CAST(n_exact AS DOUBLE), 6)
         AS rel_err
FROM e ORDER BY event_type"""


# ---------------------------------------------------------------------------
# C4 page cleaning (pipelines/c4.py)
# ---------------------------------------------------------------------------

_C4_JS = "enable javascript to view the full article content here."
_C4_LOREM = ("lorem ipsum dolor sit amet consectetur adipiscing elit "
             "sed do.")
_C4_BRACE = "window config block { colors: dark } end."


def c4_lines_ctes() -> str:
    """CTE chain ending in ``c4f(doc_id, line_idx, line, kept)``: the
    deterministic raw-page line view of pipelines/c4.page_lines (12-word
    body lines + hash-drawn terminal punctuation + hash-gated
    boilerplate lines) with the per-line C4 keep predicate."""
    return f"""w AS (SELECT doc_id, regexp_extract_all(text, '\\S+') AS ws
       FROM documents),
c4body AS (
  SELECT doc_id, CAST(i AS BIGINT) AS line_idx,
         array_to_string(list_slice(ws, i * 12 + 1, i * 12 + 12), ' ')
         || CASE md5_number_lower(doc_id::VARCHAR || ':p' || i::VARCHAR) % 8
              WHEN 3 THEN '!' WHEN 4 THEN '?' WHEN 5 THEN '"'
              WHEN 6 THEN '' WHEN 7 THEN '' ELSE '.' END AS line
  FROM w, unnest(range(0, (len(ws) + 11) // 12)) t(i)),
c4extra AS (
  SELECT doc_id, CAST(10000000 AS BIGINT) AS line_idx,
         '{_C4_JS}' AS line
  FROM documents
  WHERE md5_number_lower(doc_id::VARCHAR || ':js') % 5 = 0
  UNION ALL
  SELECT doc_id, CAST(10000001 AS BIGINT), '{_C4_LOREM}'
  FROM documents
  WHERE md5_number_lower(doc_id::VARCHAR || ':lorem') % 11 = 0
  UNION ALL
  SELECT doc_id, CAST(10000002 AS BIGINT), '{_C4_BRACE}'
  FROM documents
  WHERE md5_number_lower(doc_id::VARCHAR || ':brace') % 13 = 0),
c4ln AS (SELECT * FROM c4body UNION ALL SELECT * FROM c4extra),
c4f AS (SELECT doc_id, line_idx, line,
               len(regexp_extract_all(line, '\\S+')) >= 3
               AND right(line, 1) IN ('.', '!', '?', '"')
               AND NOT contains(lower(line), 'javascript') AS kept
        FROM c4ln)"""


def c4_filter_sql() -> str:
    return f"""
WITH {c4_lines_ctes()},
agg AS (
  SELECT doc_id,
         count(*) AS n_lines,
         count(*) FILTER (WHERE kept) AS n_kept,
         COALESCE(string_agg(line, chr(10) ORDER BY line_idx)
                  FILTER (WHERE kept), '') AS clean_text,
         contains(lower(string_agg(line, chr(10) ORDER BY line_idx)),
                  'lorem ipsum') AS has_lorem,
         contains(string_agg(line, chr(10) ORDER BY line_idx), '{{')
           AS has_brace
  FROM c4f GROUP BY doc_id)
SELECT d.doc_id,
       CAST(COALESCE(a.n_lines, 0) AS BIGINT) AS n_lines,
       CAST(COALESCE(a.n_kept, 0) AS BIGINT) AS n_kept,
       CAST(len(regexp_extract_all(COALESCE(a.clean_text, ''), '[.!?]'))
            AS BIGINT) AS n_sentences,
       COALESCE(a.has_lorem, FALSE) AS has_lorem,
       COALESCE(a.has_brace, FALSE) AS has_brace,
       NOT COALESCE(a.has_lorem, FALSE) AND NOT COALESCE(a.has_brace, FALSE)
       AND len(regexp_extract_all(COALESCE(a.clean_text, ''), '[.!?]')) >= 5
         AS keep,
       COALESCE(a.clean_text, '') AS clean_text
FROM documents d LEFT JOIN agg a USING (doc_id)
ORDER BY d.doc_id"""


def c4_keep_rate_sql() -> str:
    """Composes c4_filter_sql verbatim (the shared-builder rule): the
    per-source rollup cannot desync from the per-doc gate."""
    return f"""
WITH c4 AS ({c4_filter_sql()}),
j AS (SELECT d.source, c4.keep, c4.n_lines, c4.n_kept
      FROM c4 JOIN documents d USING (doc_id))
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(count(*) FILTER (WHERE keep) AS BIGINT) AS n_keep,
       ROUND(CAST(count(*) FILTER (WHERE keep) AS DOUBLE)
             / CAST(count(*) AS DOUBLE), 6) AS keep_rate,
       ROUND(CAST(sum(n_kept) AS DOUBLE)
             / CAST(sum(n_lines) AS DOUBLE), 6) AS kept_line_share
FROM j GROUP BY source ORDER BY source"""


# ---------------------------------------------------------------------------
# Media near-dup SimHash (pipelines/media.media_simhash_pairs)
# ---------------------------------------------------------------------------

def media_simhash_pairs_sql(max_hamming: int = 10,
                            n_variants: int = 3) -> str:
    """Rebuilds the variant payload hex inline (media_fixture_ctes +
    the 1-byte variant tail), then the byte-4-gram SimHash with the
    shared bitsum algebra (_simhash_ctes convention) and exact all-pairs
    hamming -- the engine's 16x4-bit banding is pigeonhole-lossless for
    hamming <= 15 so no band logic is needed here."""
    w = "64 + (asset_id % 8) * 16"
    h = "48 + (asset_id % 5) * 32"
    return f"""
WITH {media_fixture_ctes()},
mv AS (SELECT DISTINCT asset_id,
              CAST(md5_number_lower(doc_id::VARCHAR || ':mv' || j::VARCHAR)
                   % {n_variants} AS BIGINT) AS v
       FROM mr),
px AS (SELECT asset_id, v,
              '46414b45504e4730' || {_le32_hex(w)} || {_le32_hex(h)}
              || sha256('asset:' || asset_id::VARCHAR)
              || lower(lpad(to_hex(v), 2, '0')) AS hx
       FROM mv),
g AS (SELECT asset_id, v,
             md5_number_lower(substr(hx, CAST(i * 2 + 1 AS INTEGER), 8)) AS h
      FROM px, unnest(range(0, (length(hx) - 8) // 2 + 1)) t(i)),
bitsum AS (SELECT asset_id, v, j,
                  sum(CASE WHEN (h >> j::INTEGER) & 1 = 1
                           THEN 1 ELSE -1 END) AS s
           FROM g CROSS JOIN (SELECT unnest(range(64)) AS j) jj
           GROUP BY asset_id, v, j),
sig AS (SELECT asset_id, v,
               CAST(sum(CASE WHEN s > 0 THEN (1::HUGEINT << j::INTEGER)
                             ELSE 0 END) % 18446744073709551616
                    AS UBIGINT) AS sim
        FROM bitsum GROUP BY asset_id, v),
keyed AS (SELECT p.asset_id, sha256(p.hx) AS content_key, s.sim
          FROM px p JOIN sig s ON s.asset_id = p.asset_id AND s.v = p.v)
SELECT a.content_key AS key_a, b.content_key AS key_b,
       CAST(bit_count(xor(a.sim, b.sim)) AS BIGINT) AS hamming,
       a.asset_id = b.asset_id AS same_asset
FROM keyed a JOIN keyed b ON a.content_key < b.content_key
WHERE bit_count(xor(a.sim, b.sim)) <= {max_hamming}
ORDER BY key_a, key_b"""


def boilerplate_lines_sql(min_docs: int = 2) -> str:
    """Composes c4_lines_ctes verbatim: the census cannot desync from
    the c4 gate's line view."""
    return f"""
WITH {c4_lines_ctes()}
SELECT line,
       CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
       CAST(count(*) AS BIGINT) AS n_occurrences
FROM c4ln GROUP BY line
HAVING count(DISTINCT doc_id) >= {min_docs}
ORDER BY line"""


def line_dedup_clean_sql(min_docs: int = 5) -> str:
    return f"""
WITH {c4_lines_ctes()},
dupl AS (SELECT line FROM c4ln GROUP BY line
         HAVING count(DISTINCT doc_id) >= {min_docs}),
keepln AS (SELECT doc_id, line_idx, line FROM c4ln
           WHERE line NOT IN (SELECT line FROM dupl)),
tot AS (SELECT doc_id, count(*) AS n_lines FROM c4ln GROUP BY doc_id),
agg AS (SELECT doc_id, count(*) AS n_kept,
               string_agg(line, chr(10) ORDER BY line_idx) AS clean_text
        FROM keepln GROUP BY doc_id)
SELECT d.doc_id,
       CAST(COALESCE(t.n_lines, 0) AS BIGINT) AS n_lines,
       CAST(COALESCE(t.n_lines, 0) - COALESCE(a.n_kept, 0) AS BIGINT)
         AS n_removed,
       COALESCE(a.clean_text, '') AS clean_text
FROM documents d
LEFT JOIN tot t USING (doc_id)
LEFT JOIN agg a USING (doc_id)
ORDER BY d.doc_id"""


def training_shuffle_plan_sql(n_shards: int = 16, seed: int = 42) -> str:
    """md5_number_lower is _hash64's twin; rank within shard by
    (hash, doc_id) exactly as the engine's per-shard mergesort."""
    return f"""
WITH h AS (SELECT doc_id,
                  md5_number_lower('{seed}:' || doc_id::VARCHAR) AS h
           FROM documents)
SELECT doc_id,
       CAST(h % {n_shards} AS BIGINT) AS shard,
       CAST(row_number() OVER (PARTITION BY h % {n_shards}
                               ORDER BY h, doc_id) - 1 AS BIGINT) AS pos
FROM h ORDER BY shard, pos"""


def shard_balance_report_sql(n_shards: int = 16, seed: int = 42) -> str:
    return f"""
SELECT CAST(md5_number_lower('{seed}:' || doc_id::VARCHAR)
            % {n_shards} AS BIGINT) AS shard,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS n_chars
FROM documents GROUP BY shard ORDER BY shard"""


def emb_recall_sql(threshold: float = 0.4) -> str:
    """Embedding-LSH recall/precision vs the exact all-pairs baseline
    (stages/similarity.emb_recall_eval): composes emb_neardup_exact_sql
    and emb_neardup_sql verbatim so the evaluation cannot drift from
    the pipelines it grades."""
    return f"""
WITH exact AS ({emb_neardup_exact_sql(threshold)}),
lsh AS ({emb_neardup_sql(threshold)}),
ne AS (SELECT COUNT(*) AS n_exact FROM exact),
nl AS (SELECT COUNT(*) AS n_lsh FROM lsh),
h AS (SELECT COUNT(*) AS n_hit
      FROM exact e JOIN lsh l ON e.id_a = l.id_a AND e.id_b = l.id_b)
SELECT CAST(ne.n_exact AS BIGINT) AS n_exact,
       CAST(nl.n_lsh AS BIGINT) AS n_lsh,
       CAST(h.n_hit AS BIGINT) AS n_hit,
       CASE WHEN ne.n_exact > 0
            THEN CAST(h.n_hit AS DOUBLE) / ne.n_exact ELSE 0.0 END
         AS lsh_recall,
       CASE WHEN nl.n_lsh > 0
            THEN CAST(h.n_hit AS DOUBLE) / nl.n_lsh ELSE 0.0 END
         AS lsh_precision
FROM ne, nl, h"""


def lloyd_resid_ctes_slice(n_clusters: int, lo: int, hi: int,
                           prefix: str) -> str:
    """``lloyd_assign_ctes_slice`` re-based onto the ``resid`` long
    table (vec_id, i, rv) -- the residual-subspace building block of
    the IVF+PQ oracle.  Seeds are the residual SLICES of
    vec_id < n_clusters, matching the engine's per-subspace
    lloyd_codebook fit over the residual view."""
    p = prefix
    dims = f"i BETWEEN {lo} AND {hi}"
    return f"""{p}c0 AS MATERIALIZED (
  SELECT vec_id AS cl, i, rv AS cv FROM resid
  WHERE vec_id < {n_clusters} AND {dims}),
{p}d1 AS (
  SELECT r.vec_id, c.cl, SUM((r.rv - c.cv) ^ 2) AS dist
  FROM resid r JOIN {p}c0 c ON c.i = r.i GROUP BY 1, 2),
{p}a1 AS (
  SELECT vec_id, cl FROM {p}d1
  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY dist, cl) = 1),
{p}n1 AS (
  SELECT a.cl, r.i, AVG(r.rv) AS cv
  FROM {p}a1 a JOIN resid r USING (vec_id)
  WHERE {dims} GROUP BY 1, 2),
{p}c1 AS MATERIALIZED (
  SELECT {p}c0.cl, {p}c0.i, COALESCE({p}n1.cv, {p}c0.cv) AS cv
  FROM {p}c0 LEFT JOIN {p}n1 ON {p}n1.cl = {p}c0.cl AND {p}n1.i = {p}c0.i),
{p}d2 AS (
  SELECT r.vec_id, c.cl, SUM((r.rv - c.cv) ^ 2) AS dist
  FROM resid r JOIN {p}c1 c ON c.i = r.i GROUP BY 1, 2),
{p}a2 AS (
  SELECT vec_id, cl FROM {p}d2
  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY dist, cl) = 1),
{p}n2 AS (
  SELECT a.cl, r.i, AVG(r.rv) AS cv
  FROM {p}a2 a JOIN resid r USING (vec_id)
  WHERE {dims} GROUP BY 1, 2),
{p}c2 AS MATERIALIZED (
  SELECT {p}c1.cl, {p}c1.i, COALESCE({p}n2.cv, {p}c1.cv) AS cv
  FROM {p}c1 LEFT JOIN {p}n2 ON {p}n2.cl = {p}c1.cl AND {p}n2.i = {p}c1.i),
{p}d3 AS MATERIALIZED (
  SELECT r.vec_id, c.cl, SUM((r.rv - c.cv) ^ 2) AS dist
  FROM resid r JOIN {p}c2 c ON c.i = r.i GROUP BY 1, 2),
{p}assign AS (
  SELECT vec_id, cl FROM {p}d3
  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY dist, cl) = 1)"""


def ivf_pq_topk_sql(query_ids=(0, 1, 2, 3, 4), k: int = 10, dim: int = 64,
                    n_lists: int = 6, m: int = 2, n_clusters: int = 4,
                    n_probe: int = 2) -> str:
    """IVF+PQ asymmetric-distance top-k (stages/similarity.ivf_pq_topk,
    the Jegou et al. 2011 IVFADC index): the coarse unrolled Lloyd
    (``lloyd_assign_ctes`` -- shared with the trained-IVF oracle, so
    the list structure cannot desync), a residual long table against
    the final coarse centroids, per-subspace residual Lloyd fits
    (``lloyd_resid_ctes_slice``), per-(query, probed list) ADC lookup
    tables, and the (adc, vec_id)-ranked top-k over probed lists with
    self excluded."""
    assert dim % m == 0
    w = dim // m
    qs = ",".join(str(int(q)) for q in query_ids)
    sub = [lloyd_resid_ctes_slice(n_clusters, j * w + 1, (j + 1) * w,
                                  f"s{j}_") for j in range(m)]
    luts = [f"""lut{j} AS (
  SELECT p.query_id, p.cl AS pcell, b.cl AS code,
         SUM((CAST(e.embedding[b.i] AS DOUBLE) - cc.cv - b.cv) ^ 2) AS d
  FROM probes p
  JOIN embeddings e ON e.vec_id = p.query_id
  JOIN c2 cc ON cc.cl = p.cl
  JOIN s{j}_c2 b ON b.i = cc.i
  GROUP BY 1, 2, 3)""" for j in range(m)]
    code_joins = "\n".join(
        f"  JOIN s{j}_assign a{j} ON a{j}.vec_id = c.vec_id"
        for j in range(m))
    lut_joins = "\n".join(
        f"  JOIN lut{j} l{j} ON l{j}.query_id = c.query_id"
        f" AND l{j}.pcell = c.cl AND l{j}.code = a{j}.cl"
        for j in range(m))
    adc_sum = " + ".join(f"l{j}.d" for j in range(m))
    return f"""
WITH {lloyd_assign_ctes(n_lists)},
resid AS MATERIALIZED (
  SELECT e.vec_id, c.i, CAST(e.embedding[c.i] AS DOUBLE) - c.cv AS rv
  FROM embeddings e JOIN assign a USING (vec_id)
  JOIN c2 c ON c.cl = a.cl),
{",".join(sub)},
probes AS (
  SELECT vec_id AS query_id, cl FROM d3 WHERE vec_id IN ({qs})
  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY dist, cl)
          <= {n_probe}),
{",".join(luts)},
cand AS (
  SELECT p.query_id, a.vec_id, a.cl FROM probes p JOIN assign a USING (cl)),
adc AS (
  SELECT c.query_id, c.vec_id, {adc_sum} AS adc
  FROM cand c
{code_joins}
{lut_joins})
SELECT query_id, vec_id, CAST(rank AS BIGINT) AS rank FROM (
  SELECT query_id, vec_id,
         row_number() OVER (PARTITION BY query_id ORDER BY adc, vec_id) AS rank
  FROM adc WHERE vec_id <> query_id)
WHERE rank <= {k}
ORDER BY query_id, rank"""


def ivf_pq_recall_sql(query_ids=(0, 1, 2, 3, 4), k: int = 10,
                      dim: int = 64, n_lists: int = 6, m: int = 2,
                      n_clusters: int = 4, n_probe: int = 2) -> str:
    """Recall@k of the IVF+PQ path vs the exact baseline
    (stages/similarity.ivf_pq_recall_at_k): composes ann_exact_topk_sql
    and ivf_pq_topk_sql verbatim (the ann_recall_sql pattern), so the
    evaluation oracle can never drift from the rankings it grades."""
    exact = ann_exact_topk_sql(query_ids, k)
    approx = ivf_pq_topk_sql(query_ids, k, dim, n_lists, m, n_clusters,
                             n_probe)
    return f"""
WITH exact AS ({exact}),
approx AS ({approx})
SELECT e.query_id,
       CAST(COUNT(a.vec_id) AS DOUBLE) / {k} AS recall_at_k
FROM exact e LEFT JOIN approx a
  ON e.query_id = a.query_id AND e.vec_id = a.vec_id
GROUP BY e.query_id ORDER BY e.query_id"""


def events_quantile_sketch_sql(s: int = 256) -> str:
    """Rebuilds the bottom-s hash sample exactly (row_number over
    (hash, event_id)), picks p25/p50/p75 by the engine's integer
    sorted-pick index ((n-1)*p) // 4 on BOTH the sample and the full
    table, r6 on the final projection with the engine's operand order
    (pipelines/relational.events_quantile_sketch)."""
    return f"""
WITH h AS (SELECT event_id, value,
                  md5_number_lower(CAST(event_id AS VARCHAR)) AS h
           FROM events),
samp AS (SELECT value FROM h
         QUALIFY row_number() OVER (ORDER BY h, event_id) <= {s}),
sv AS (SELECT value, row_number() OVER (ORDER BY value) AS rn FROM samp),
ns AS (SELECT count(*) AS n FROM samp),
evv AS (SELECT value, row_number() OVER (ORDER BY value) AS rn FROM events),
ne AS (SELECT count(*) AS n FROM events),
ps(p, q) AS (VALUES (1, 'p25'), (2, 'p50'), (3, 'p75')),
est AS (SELECT ps.p, ps.q, sv.value AS est
        FROM ps CROSS JOIN ns
        JOIN sv ON sv.rn = ((ns.n - 1) * ps.p) // 4 + 1),
ex AS (SELECT ps.p, evv.value AS exact
       FROM ps CROSS JOIN ne
       JOIN evv ON evv.rn = ((ne.n - 1) * ps.p) // 4 + 1)
SELECT est.q,
       CAST(ne.n AS BIGINT) AS n_total,
       CAST(ns.n AS BIGINT) AS n_sample,
       ROUND(est.est, 6) AS est,
       ROUND(ex.exact, 6) AS exact,
       ROUND(ABS(est.est - ex.exact), 6) AS abs_err
FROM est JOIN ex USING (p) CROSS JOIN ne CROSS JOIN ns
ORDER BY est.q"""


def sq8_quantize_ctes() -> str:
    """Shared SQ8 scalar-quantization CTEs (the emb_quantize affine):
    per-dim global (min, max) + q = ROUND((v - mn)/(mx - mn) * 255) as
    BIGINT, 0 where the dim is constant. Factored so emb_quantize-style
    codes and the SQ8 ANN ranking cannot desync."""
    return """
e8 AS (
  SELECT vec_id, i AS dim, CAST(embedding[i] AS DOUBLE) AS v
  FROM embeddings, unnest(range(1, len(embedding) + 1)) AS t(i)),
mm8 AS (SELECT dim, min(v) AS mn, max(v) AS mx FROM e8 GROUP BY 1),
q8 AS (
  SELECT vec_id, e8.dim,
         CASE WHEN mx > mn
              THEN CAST(ROUND((v - mn) / (mx - mn) * 255) AS BIGINT)
              ELSE 0 END AS q
  FROM e8 JOIN mm8 USING (dim))"""


def sq8_topk_sql(query_ids=(0, 1, 2, 3, 4), k: int = 10) -> str:
    """SQ8 scalar-quantized ANN top-k (stages/similarity.sq8_topk):
    squared L2 distance between 0..255 codes, rank (dist ASC, vec_id
    ASC) per query excluding self. The distance is an int64 sum --
    exact and order-independent -- so engine/oracle agree
    bit-for-bit."""
    qs = ",".join(str(int(q)) for q in query_ids)
    return f"""
WITH {sq8_quantize_ctes()},
qq AS (SELECT vec_id AS query_id, dim, q FROM q8 WHERE vec_id IN ({qs})),
s AS (
  SELECT qq.query_id, c.vec_id,
         SUM((c.q - qq.q) * (c.q - qq.q)) AS dist
  FROM q8 c JOIN qq ON c.dim = qq.dim AND c.vec_id <> qq.query_id
  GROUP BY 1, 2)
SELECT query_id, vec_id, CAST(rank AS BIGINT) AS rank,
       CAST(dist AS BIGINT) AS dist
FROM (
  SELECT query_id, vec_id, dist,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY dist ASC, vec_id) AS rank
  FROM s)
WHERE rank <= {k}
ORDER BY query_id, rank"""


def zorder_layout_plan_sql(n_files: int = 8, bits: int = 12) -> str:
    """Z-order layout plan (pipelines/scale_ops.zorder_layout_plan):
    integer Morton-key ranking over (o_custkey, epoch-day(o_orderdate)),
    ROW_NUMBER file assignment (r*K)//n, per-file zone maps + probe-box
    hit flag. Every operand is integer, so engine/oracle agree
    bit-for-bit. The interleave is unrolled to 2*bits shift terms --
    the same bit algebra as the engine's _zorder_interleave."""
    top = (1 << bits) - 1
    zx = " + ".join(f"(((ux >> {i}) & 1) << {2 * i})" for i in range(bits))
    zy = " + ".join(f"(((uy >> {i}) & 1) << {2 * i + 1})"
                    for i in range(bits))
    return f"""
WITH base AS (
  SELECT o_orderkey AS id, o_custkey AS x,
         datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS y
  FROM orders),
mm AS (SELECT min(x) AS xmn, max(x) AS xmx,
              min(y) AS ymn, max(y) AS ymx FROM base),
u AS (
  SELECT id, x, y,
         CASE WHEN xmx > xmn THEN ((x - xmn) * {top}) // (xmx - xmn)
              ELSE 0 END AS ux,
         CASE WHEN ymx > ymn THEN ((y - ymn) * {top}) // (ymx - ymn)
              ELSE 0 END AS uy
  FROM base, mm),
z AS (SELECT id, x, y, ({zx}) + ({zy}) AS zkey FROM u),
r AS (
  SELECT x, y,
         row_number() OVER (ORDER BY zkey * {1 << 38} + id) - 1 AS rn,
         count(*) OVER () AS n
  FROM z),
f AS (SELECT x, y, (rn * {n_files}) // n AS file_id FROM r),
zones AS (
  SELECT file_id, count(*) AS n_rows,
         min(x) AS x_min, max(x) AS x_max,
         min(y) AS y_min, max(y) AS y_max
  FROM f GROUP BY 1),
probe AS (
  SELECT xmn + ((xmx - xmn) * 3) // 8 AS qxlo,
         xmn + ((xmx - xmn) * 5) // 8 AS qxhi,
         ymn + ((ymx - ymn) * 3) // 8 AS qylo,
         ymn + ((ymx - ymn) * 5) // 8 AS qyhi
  FROM mm)
SELECT CAST(file_id AS BIGINT) AS file_id,
       CAST(n_rows AS BIGINT) AS n_rows,
       CAST(x_min AS BIGINT) AS x_min, CAST(x_max AS BIGINT) AS x_max,
       CAST(y_min AS BIGINT) AS y_min, CAST(y_max AS BIGINT) AS y_max,
       CAST(NOT (x_max < qxlo OR x_min > qxhi
                 OR y_max < qylo OR y_min > qyhi) AS BIGINT) AS probe_hit
FROM zones, probe
ORDER BY file_id"""


def neardup_threshold_sweep_sql(grid_pcts=(20, 30, 40, 50, 60, 70, 80),
                                n: int = 3) -> str:
    """Threshold calibration curve (stages/dedup.neardup_threshold_sweep):
    composes exact_ngram_pairs_sql at the grid minimum verbatim, then
    counts surviving pairs per grid threshold (rounded-jaccard >=
    pct/100.0, the same comparison the engine runs)."""
    pcts = sorted(int(p) for p in grid_pcts)
    lo = min(pcts) / 100.0
    vals = ", ".join(f"({p})" for p in pcts)
    return f"""
WITH pairs AS ({exact_ngram_pairs_sql(lo, n)}),
grid(threshold_pct) AS (VALUES {vals})
SELECT CAST(threshold_pct AS BIGINT) AS threshold_pct,
       CAST((SELECT count(*) FROM pairs
             WHERE ngram_jaccard >= threshold_pct / 100.0) AS BIGINT)
         AS n_pairs
FROM grid ORDER BY threshold_pct"""


def emb_lof_sql(k: int = 5) -> str:
    """Local Outlier Factor (stages/similarity.lof_outliers): the
    integer-ppm variant -- d = 1e6 - r6-cosine-ppm (the emb_neardup
    boundary convention), N_k = rank 1..k under (d, dst), reach floored
    at 1 ppm, lrd_ppm = ROUND(k*1e12/sum_reach), LOF r6. Every operand
    integer until the two final divisions, so agreement is bit-exact
    given the r6 cosine agreement the emb_neardup family already
    certifies."""
    return f"""
WITH e AS (
  SELECT a.vec_id AS src, b.vec_id AS dst,
         1000000 - CAST(ROUND(list_cosine_similarity(
             CAST(a.embedding AS DOUBLE[]),
             CAST(b.embedding AS DOUBLE[])) * 1e6) AS BIGINT) AS d
  FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id),
r AS (SELECT src, dst, d,
             row_number() OVER (PARTITION BY src ORDER BY d, dst) AS rnk
      FROM e),
knn AS (SELECT src, dst, d FROM r WHERE rnk <= {k}),
kd AS (SELECT src AS id, d AS kdist FROM r WHERE rnk = {k}),
s AS (SELECT knn.src, SUM(GREATEST(kd.kdist, knn.d, 1)) AS sr
      FROM knn JOIN kd ON kd.id = knn.dst GROUP BY knn.src),
lrd AS (SELECT src AS id,
               CAST(ROUND({k} * 1e12 / CAST(sr AS DOUBLE)) AS BIGINT)
                 AS lrd_ppm
        FROM s),
agg AS (SELECT knn.src, SUM(l.lrd_ppm) AS slrd
        FROM knn JOIN lrd l ON l.id = knn.dst GROUP BY knn.src)
SELECT a.src AS vec_id, lp.lrd_ppm,
       ROUND(CAST(a.slrd AS DOUBLE) / ({k} * CAST(lp.lrd_ppm AS DOUBLE)), 6)
         AS lof
FROM agg a JOIN lrd lp ON lp.id = a.src
ORDER BY vec_id"""


def curriculum_plan_sql(n_stages: int = 4, seed: int = 42) -> str:
    """Quality-curriculum ordering plan (pipelines/curation
    .curriculum_plan): composes quality_classifier_gate_sql verbatim
    (the shared-builder rule); stage = NTILE over (score DESC, doc_id),
    within-stage position = rank of md5_number_lower(seed:doc_id) --
    _hash64's twin, the training_shuffle_plan convention."""
    return f"""
WITH g AS ({quality_classifier_gate_sql()}),
h AS (SELECT doc_id, score,
             md5_number_lower('{seed}:' || doc_id::VARCHAR) AS h
      FROM g),
s AS (SELECT doc_id, score, h,
             ntile({n_stages}) OVER (ORDER BY score DESC, doc_id) - 1
               AS stage
      FROM h)
SELECT doc_id, CAST(stage AS BIGINT) AS stage,
       CAST(row_number() OVER (PARTITION BY stage ORDER BY h, doc_id) - 1
            AS BIGINT) AS pos,
       score
FROM s ORDER BY doc_id"""


def dedup_agreement_sql(mh_threshold: float = 0.8, sh_max_hamming: int = 3,
                        ng_threshold: float = 0.3, n: int = 3) -> str:
    """Dedup-method keep-set agreement (pipelines/curation
    .dedup_agreement_matrix): composes the exact-dedup, minhash-
    survivors, ngram-survivors and simhash-survivors SQL verbatim
    (the shared-builder rule), each wrapped as a subquery so their
    recursive CTE names cannot collide."""
    exact = "SELECT min(doc_id) AS doc_id FROM documents GROUP BY text"
    mh = minhash_survivors_sql(mh_threshold)
    ng = ("WITH RECURSIVE pairs AS ("
          + exact_ngram_pairs_sql(ng_threshold, n) + ")"
          + _survivors_select("pairs"))
    sh = simhash_survivors_sql(sh_max_hamming)
    methods = [("exact", exact), ("minhash", mh), ("ngram", ng),
               ("simhash", sh)]
    ctes = ",\n".join(f"m_{k} AS (SELECT doc_id FROM ({sql}))"
                      for k, sql in methods)
    rows = []
    for i, (a, _) in enumerate(methods):
        for b, _ in methods[i + 1:]:
            rows.append(f"""
SELECT '{a}' AS method_a, '{b}' AS method_b,
       (SELECT count(*) FROM m_{a}) AS n_keep_a,
       (SELECT count(*) FROM m_{b}) AS n_keep_b,
       (SELECT count(*) FROM m_{a} JOIN m_{b} USING (doc_id))
         AS n_keep_both""")
    body = "\nUNION ALL".join(rows)
    return f"""
WITH {ctes}
SELECT method_a, method_b,
       CAST(n_keep_a AS BIGINT) AS n_keep_a,
       CAST(n_keep_b AS BIGINT) AS n_keep_b,
       CAST(n_keep_both AS BIGINT) AS n_keep_both,
       ROUND(CAST(n_keep_both AS DOUBLE)
             / (n_keep_a + n_keep_b - n_keep_both), 6) AS jaccard
FROM ({body})
ORDER BY method_a, method_b"""


def vocab_coverage_sql(grid=(16, 64, 256, 1024, 4096)) -> str:
    """Vocabulary coverage curve (pipelines/text.vocab_coverage_curve):
    top-V term ranking by (tf DESC, term), integer covered/total token
    counts, coverage r6. Same string_split tokenization as the
    classifier gate / lang_top_terms."""
    vals = ", ".join(f"({int(v)})" for v in sorted(int(v) for v in grid))
    return f"""
WITH tc AS (
  SELECT term, count(*) AS c
  FROM (SELECT unnest(string_split(text, ' ')) AS term FROM documents)
  WHERE term <> '' GROUP BY term),
r AS (SELECT c, row_number() OVER (ORDER BY c DESC, term) AS rk FROM tc),
t AS (SELECT SUM(c) AS tot FROM tc),
grid(v) AS (VALUES {vals})
SELECT CAST(v AS BIGINT) AS vocab_size,
       CAST(COALESCE((SELECT SUM(c) FROM r WHERE rk <= v), 0) AS BIGINT)
         AS covered_tokens,
       CAST(t.tot AS BIGINT) AS total_tokens,
       ROUND(COALESCE((SELECT SUM(c) FROM r WHERE rk <= v), 0)
             / CAST(t.tot AS DOUBLE), 6) AS coverage
FROM grid, t ORDER BY vocab_size"""
