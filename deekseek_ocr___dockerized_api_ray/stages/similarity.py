"""Similarity search over an embedding column (list<float>).

Brute-force cosine top-k is the exact baseline: the (small) query matrix
is broadcast once via ``ray.put`` and every batch does one f64 matmul;
per-batch local top-k candidates then reduce through one tiny keyed
groupby -- the full corpus is never collected. The LSH variant
(random-hyperplane buckets) is the scale path: comparisons happen only
inside matching buckets.

Embedding near-dup (cosine >= threshold pairs) reuses the same bucketed
shape.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.rounding import round_half_away


def _batch_matrix(batch: pa.Table, col: str) -> np.ndarray:
    arr = batch.column(col)
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    flat = np.asarray(arr.flatten(), dtype=np.float64)
    n = len(arr)
    return flat.reshape(n, -1)


def _normalize(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return m / norms


def query_matrix(emb_ds, query_ids: Sequence[int], id_col: str = "vec_id",
                 emb_col: str = "embedding"):
    """Materialize the (tiny) query rows and broadcast via ray.put."""
    import ray

    qset = set(int(q) for q in query_ids)

    def _pick(batch: pa.Table) -> pa.Table:
        keep = [int(v) in qset for v in batch.column(id_col).to_pylist()]
        return batch.filter(pa.array(keep, type=pa.bool_()))

    # bound: |query_ids| rows (point filter)
    rows = emb_ds.map_batches(_pick, batch_format="pyarrow").take_all()
    rows.sort(key=lambda r: int(r[id_col]))
    ids = [int(r[id_col]) for r in rows]
    mat = _normalize(np.asarray([r[emb_col] for r in rows], dtype=np.float64))
    return ids, ray.put(mat)


class CosineTopKStage:
    """Per batch, cosine of every row vs the broadcast query matrix;
    emits each query's batch-local top-k candidate rows. Constructed
    ONCE on the driver and shipped as a pickled task callable (the query
    matrix is nq x dim -- tiny); an actor pool here would pay ~2-3 s of
    spin-up for a stage with no real per-actor state."""

    def __init__(self, query_ids: List[int], query_ref, k: int,
                 id_col: str = "vec_id", emb_col: str = "embedding"):
        import ray

        self.query_ids = query_ids
        self.q = ray.get(query_ref)  # resolved once at construction
        self.k = k
        self.id_col = id_col
        self.emb_col = emb_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch.column(self.id_col).to_pylist(), dtype=np.int64)
        m = _normalize(_batch_matrix(batch, self.emb_col))
        sims = m @ self.q.T  # (batch, n_queries)
        out_q, out_id, out_sim = [], [], []
        k = min(self.k, len(ids))
        for qi, qid in enumerate(self.query_ids):
            col = sims[:, qi]
            # top-k by (sim desc, vec_id asc) -- deterministic tie-break
            order = np.lexsort((ids, -col))[:k]
            out_q.extend([qid] * len(order))
            out_id.extend(ids[order].tolist())
            out_sim.extend(col[order].tolist())
        return pa.Table.from_arrays(
            [pa.array(out_q, type=pa.int64()), pa.array(out_id, type=pa.int64()),
             pa.array(out_sim, type=pa.float64())],
            names=["query_id", "vec_id", "cosine"],
        )


def brute_force_topk(emb_ds, query_ids: Sequence[int], k: int = 10,
                     id_col: str = "vec_id", emb_col: str = "embedding",
                     exclude_self: bool = True, queries=None):
    """Exact cosine top-k: broadcast queries, per-batch matmul + local
    top-k, final per-query reduce. Returns (query_id, vec_id, rank).

    Ranking ties break on vec_id ascending (float64 math on both the Ray
    and DuckDB oracle sides, so orderings agree).

    ``queries``: optional precomputed ``(sorted_ids, query_matrix_ref)``
    from ``query_matrix``. ANN callers that pass a FILTERED lazy dataset
    as ``emb_ds`` MUST supply this (extracted from the base corpus):
    otherwise the query-extraction take_all re-executes the whole filter
    chain -- the assignment matmul runs twice (the r2 ann_ivf 3.8x bench
    regression).
    """
    ids, qref = (queries if queries is not None
                 else query_matrix(emb_ds, query_ids, id_col, emb_col))

    cand = emb_ds.map_batches(
        CosineTopKStage(query_ids=ids, query_ref=qref,
                        k=k + (1 if exclude_self else 0),
                        id_col=id_col, emb_col=emb_col),
        batch_format="pyarrow",
    )

    def _final(group: pa.Table) -> pa.Table:
        qid = group.column("query_id")[0].as_py()
        vids = np.asarray(group.column("vec_id").to_pylist(), dtype=np.int64)
        sims = np.asarray(group.column("cosine").to_pylist(), dtype=np.float64)
        if exclude_self:
            mask = vids != qid
            vids, sims = vids[mask], sims[mask]
        order = np.lexsort((vids, -sims))[:k]
        return pa.Table.from_arrays(
            [pa.array([qid] * len(order), type=pa.int64()),
             pa.array(vids[order].tolist(), type=pa.int64()),
             pa.array(list(range(1, len(order) + 1)), type=pa.int64())],
            names=["query_id", "vec_id", "rank"],
        )

    return cand.groupby("query_id").map_groups(_final, batch_format="pyarrow")


class FilteredCosineTopKStage:
    """CosineTopKStage with a metadata pre-filter: a corpus row is a
    candidate for a query only when it shares the query's
    ``filter_col`` value. The filter shrinks the candidate set BEFORE
    ranking (pre-filter semantics), applied as a vectorized mask on the
    batch -- the shape of filtered vector search in every production
    vector store."""

    def __init__(self, query_ids, query_labels, query_ref, k,
                 id_col: str = "vec_id", emb_col: str = "embedding",
                 filter_col: str = "label", negate: bool = False):
        import ray

        self.query_ids = query_ids
        self.query_labels = query_labels
        self.q = ray.get(query_ref)  # resolved once at construction
        self.k = k
        self.id_col = id_col
        self.emb_col = emb_col
        self.filter_col = filter_col
        # negate=True flips the predicate: candidates must NOT share the
        # query's filter value (hard-negative mining)
        self.negate = negate

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch.column(self.id_col).to_pylist(), dtype=np.int64)
        labels = np.asarray(batch.column(self.filter_col).to_pylist())
        m = _normalize(_batch_matrix(batch, self.emb_col))
        sims = m @ self.q.T
        out_q, out_id, out_sim = [], [], []
        for qi, (qid, ql) in enumerate(zip(self.query_ids, self.query_labels)):
            mask = (labels != ql) if self.negate else (labels == ql)
            if not mask.any():
                continue
            sub_ids, sub = ids[mask], sims[mask, qi]
            order = np.lexsort((sub_ids, -sub))[:min(self.k, len(sub_ids))]
            out_q.extend([qid] * len(order))
            out_id.extend(sub_ids[order].tolist())
            out_sim.extend(sub[order].tolist())
        return pa.Table.from_arrays(
            [pa.array(out_q, type=pa.int64()), pa.array(out_id, type=pa.int64()),
             pa.array(out_sim, type=pa.float64())],
            names=["query_id", "vec_id", "cosine"],
        )


def filtered_topk(emb_ds, query_ids: Sequence[int], k: int = 10,
                  id_col: str = "vec_id", emb_col: str = "embedding",
                  filter_col: str = "label"):
    """Exact cosine top-k restricted to corpus rows sharing each query's
    ``filter_col`` value (excluding the query row itself). Same
    broadcast-queries / per-batch matmul / tiny keyed reduce shape as
    brute_force_topk; the filter never causes a second corpus pass.

    Returns (query_id, vec_id, rank) with rank 1..k.
    """
    import ray

    qset = set(int(q) for q in query_ids)

    def _pick(batch: pa.Table) -> pa.Table:
        keep = [int(v) in qset for v in batch.column(id_col).to_pylist()]
        return batch.filter(pa.array(keep, type=pa.bool_()))

    # bound: |query_ids| rows (point filter)
    rows = emb_ds.map_batches(_pick, batch_format="pyarrow").take_all()
    rows.sort(key=lambda r: int(r[id_col]))
    ids = [int(r[id_col]) for r in rows]
    qlabels = np.asarray([r[filter_col] for r in rows])
    mat = _normalize(np.asarray([r[emb_col] for r in rows], dtype=np.float64))
    qref = ray.put(mat)

    cand = emb_ds.map_batches(
        FilteredCosineTopKStage(query_ids=ids, query_labels=qlabels,
                                query_ref=qref, k=k + 1, id_col=id_col,
                                emb_col=emb_col, filter_col=filter_col),
        batch_format="pyarrow",
    )

    def _final(group: pa.Table) -> pa.Table:
        qid = group.column("query_id")[0].as_py()
        vids = np.asarray(group.column("vec_id").to_pylist(), dtype=np.int64)
        sims = np.asarray(group.column("cosine").to_pylist(), dtype=np.float64)
        mask = vids != qid
        vids, sims = vids[mask], sims[mask]
        order = np.lexsort((vids, -sims))[:k]
        return pa.Table.from_arrays(
            [pa.array([qid] * len(order), type=pa.int64()),
             pa.array(vids[order].tolist(), type=pa.int64()),
             pa.array(list(range(1, len(order) + 1)), type=pa.int64())],
            names=["query_id", "vec_id", "rank"],
        )

    return cand.groupby("query_id").map_groups(_final, batch_format="pyarrow")


def mmr_topk(emb_ds, query_ids: Sequence[int], k: int = 10, pool: int = 50,
             lam: float = 0.7, id_col: str = "vec_id",
             emb_col: str = "embedding"):
    """Maximal Marginal Relevance re-rank (Carbonell & Goldstein 1998):
    from each query's exact top-``pool`` cosine candidates, greedily
    pick ``k`` maximizing lam*sim(q,d) - (1-lam)*max_sel sim(d,s) --
    diversity-aware retrieval on top of the brute-force scan.

    Shape: the candidate pool is |queries| x pool rows BY CONSTRUCTION
    (tiny at any corpus scale), so after the distributed top-pool scan
    the pool vectors are fetched in one filtered streaming pass,
    broadcast via ray.put, and the greedy runs per query inside a keyed
    map_groups. The corpus itself is never collected.

    Returns (query_id, vec_id, mmr_rank) with mmr_rank 1..k.
    """
    import ray

    cand = brute_force_topk(emb_ds, query_ids, k=pool, id_col=id_col,
                            emb_col=emb_col).materialize()
    pool_ids = set()
    # bound: |queries| x pool candidate ids
    for row in cand.iter_rows():
        pool_ids.add(int(row["vec_id"]))
    pool_ids |= set(int(q) for q in query_ids)

    def _pick(batch: pa.Table) -> pa.Table:
        keep = [int(v) in pool_ids for v in batch.column(id_col).to_pylist()]
        return batch.filter(pa.array(keep, type=pa.bool_()))

    # bound: |queries| x pool vectors (point filter on pool_ids)
    rows = emb_ds.map_batches(_pick, batch_format="pyarrow").take_all()
    vecs = {int(r[id_col]): np.asarray(r[emb_col], dtype=np.float64)
            for r in rows}
    for i, v in vecs.items():
        n = np.linalg.norm(v)
        vecs[i] = v / n if n > 0 else v
    vec_ref = ray.put(vecs)

    def _greedy(group: pa.Table) -> pa.Table:
        v = ray.get(vec_ref)
        qid = group.column("query_id")[0].as_py()
        g = group.sort_by([("rank", "ascending")])
        ids = [int(x) for x in g.column("vec_id").to_pylist()]
        mat = np.stack([v[i] for i in ids])
        qsim = mat @ v[qid]
        pair = mat @ mat.T
        chosen: list = []
        remaining = list(range(len(ids)))
        while remaining and len(chosen) < k:
            if chosen:
                red = pair[np.ix_(remaining, chosen)].max(axis=1)
            else:
                red = np.zeros(len(remaining))
            score = lam * qsim[remaining] - (1 - lam) * red
            # deterministic: best score, ties -> lower vec_id
            cand_ids = np.asarray([ids[r] for r in remaining])
            best = np.lexsort((cand_ids, -score))[0]
            chosen.append(remaining.pop(best))
        return pa.Table.from_arrays(
            [pa.array([qid] * len(chosen), type=pa.int64()),
             pa.array([ids[c] for c in chosen], type=pa.int64()),
             pa.array(list(range(1, len(chosen) + 1)), type=pa.int64())],
            names=["query_id", "vec_id", "mmr_rank"],
        )

    return cand.groupby("query_id").map_groups(_greedy, batch_format="pyarrow")


def random_projection(emb_ds, out_dim: int = 16, dim: int = 64, seed: int = 42,
                      id_col: str = "vec_id", emb_col: str = "embedding"):
    """Johnson-Lindenstrauss random projection: embed (n x dim) down to
    ``out_dim`` with a seeded Gaussian matrix -- the standard cheap
    dimensionality reduction before ANN indexing. The projection matrix
    derives from the seed only (tiny, shipped in the task closure); the
    pass is one zero-copy batch matmul, no shuffle.

    Output: long-form (vec_id, dim [0-based], value r6).
    """
    from ..functions.rounding import round_half_away

    planes = np.random.RandomState(seed).normal(size=(dim, out_dim))

    def project(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch.column(id_col).to_pylist(), dtype=np.int64)
        m = _batch_matrix(batch, emb_col)
        proj = m @ planes
        n = len(ids)
        vals = [round_half_away(v, 6) for v in proj.reshape(-1)]
        return pa.Table.from_arrays(
            [pa.array(np.repeat(ids, out_dim)),
             pa.array(np.tile(np.arange(out_dim, dtype=np.int64), n)),
             pa.array(vals, type=pa.float64())],
            names=["vec_id", "dim", "value"],
        )

    return emb_ds.map_batches(project, batch_format="pyarrow")


class HyperplaneLSH:
    """Random-hyperplane signatures: sign pattern of x @ H, H seeded."""

    def __init__(self, dim: int, n_planes: int = 8, seed: int = 42):
        rng = np.random.RandomState(seed)
        self.planes = rng.normal(size=(dim, n_planes))

    def bucket(self, m: np.ndarray) -> np.ndarray:
        bits = (m @ self.planes) > 0
        return bits @ (1 << np.arange(bits.shape[1]))


def lsh_topk(emb_ds, query_ids: Sequence[int], k: int = 10, bands: int = 16,
             rows_per_band: int = 6, id_col: str = "vec_id",
             emb_col: str = "embedding", seed: int = 42,
             dim: Optional[int] = None):
    """Approximate top-k via banded (OR-amplified) hyperplane LSH: a row
    is a candidate if ANY of its ``bands`` sign-bit band keys matches a
    query's. Recall for a neighbor at angle theta ~ 1-(1-p^r)^B with
    p = 1 - theta/pi: true near-neighbors (small theta) are found with
    high probability, while near-orthogonal "neighbors" of random data
    are inherently hard for LSH (their measured recall is low -- that is
    the method, not a bug). Short bands (small r) degenerate to keeping
    almost everything once several queries' keys union. The bench
    reports measured recall AND the candidate fraction vs brute force."""
    import ray

    ids, qref = query_matrix(emb_ds, query_ids, id_col, emb_col)
    qmat = ray.get(qref)
    if dim is None:
        dim = qmat.shape[1]
    n_planes = bands * rows_per_band
    lsh = HyperplaneLSH(dim, n_planes, seed)

    def _band_keys(m: np.ndarray) -> np.ndarray:
        bits = (m @ lsh.planes) > 0  # (n, bands*r)
        keys = np.empty((m.shape[0], bands), dtype=np.int64)
        weights = 1 << np.arange(rows_per_band)
        for b in range(bands):
            seg = bits[:, b * rows_per_band : (b + 1) * rows_per_band]
            keys[:, b] = seg @ weights + (b << rows_per_band)  # band-salted
        return keys

    wanted = {int(v) for v in _band_keys(qmat).ravel()}

    def _bucket_filter(batch: pa.Table) -> pa.Table:
        m = _normalize(_batch_matrix(batch, emb_col))
        keys = _band_keys(m)
        keep = np.isin(keys, list(wanted)).any(axis=1)
        return batch.filter(pa.array(keep.tolist(), type=pa.bool_()))

    filtered = emb_ds.map_batches(_bucket_filter, batch_format="pyarrow")
    return brute_force_topk(filtered, query_ids, k, id_col, emb_col,
                            queries=(ids, qref))


def embedding_neardup_pairs(emb_ds, threshold: float = 0.95, bands: int = 6,
                            rows_per_band: int = 3, id_col: str = "vec_id",
                            emb_col: str = "embedding", seed: int = 42,
                            broadcast_verify_bytes: int = 256 * 1024 * 1024):
    """Near-duplicate vector pairs (cosine >= threshold) via banded
    random-hyperplane LSH (OR-amplified, MinHash-banding shape): each
    vector gets `bands` bucket keys of `rows_per_band` sign bits; pairs
    sharing ANY band bucket are candidates, verified by exact cosine.
    Returns distinct (id_a, id_b, cosine r6).

    The candidate stage is always the slim keyed shuffle (id, band, key).
    The VERIFY stage is size-gated like a broadcast-vs-shuffle join:
    when the f32 corpus matrix fits ``broadcast_verify_bytes`` it is
    ray.put once and pairs verify by indexed matmul (no joins); above
    the gate, vectors rejoin the candidate pairs via two hash joins with
    the embedding packed as fixed-size binary.

    Recall for a pair at angle theta: 1-(1-p^r)^B with p = 1 - theta/pi
    (approximate by design; raise bands for higher recall).
    """
    import ray

    n_planes = bands * rows_per_band
    lsh_holder = {}

    def _assign(batch: pa.Table) -> pa.Table:
        # SLIM shuffle rows: (id, band_id, band_key) only -- the embedding
        # vector is NOT duplicated x bands through the exchange (that
        # would make shuffle volume = bands x the corpus); vectors are
        # rejoined onto the surviving candidate pairs by hash join below.
        m = _normalize(_batch_matrix(batch, emb_col))
        if "lsh" not in lsh_holder:
            lsh_holder["lsh"] = HyperplaneLSH(m.shape[1], n_planes, seed)
        bits = (m @ lsh_holder["lsh"].planes) > 0  # (n, bands*r)
        n = len(m)
        weights = 1 << np.arange(rows_per_band)
        keys = bits.reshape(n, bands, rows_per_band) @ weights  # (n, bands)
        ids = np.repeat(
            np.asarray(batch.column(id_col).to_pylist(), dtype=np.int64), bands
        )
        band_ids = np.tile(np.arange(bands, dtype=np.int32), n)
        return pa.Table.from_arrays(
            [pa.array(ids, type=pa.int64()), pa.array(band_ids, type=pa.int32()),
             pa.array(keys.reshape(-1).astype(np.int32), type=pa.int32())],
            names=[id_col, "band_id", "band_key"],
        )

    def _bucket_pairs(group: pa.Table) -> pa.Table:
        ids = sorted(set(int(v) for v in group.column(id_col).to_pylist()))
        a, b = [], []
        for ii in range(len(ids)):
            for jj in range(ii + 1, len(ids)):
                a.append(ids[ii])
                b.append(ids[jj])
        return pa.Table.from_arrays(
            [pa.array(a, type=pa.int64()), pa.array(b, type=pa.int64())],
            names=["id_a", "id_b"],
        )

    from .dedup import distinct_rows

    assigned = emb_ds.map_batches(_assign, batch_format="pyarrow")
    cand = assigned.groupby(["band_id", "band_key"]).map_groups(
        _bucket_pairs, batch_format="pyarrow"
    )
    # dedup candidates BEFORE shipping any vectors (a pair sharing k bands
    # appears k times)
    pairs = distinct_rows(cand, ["id_a", "id_b"]).map_batches(
        lambda t: t, batch_format="pyarrow"
    )

    # size-gated verify: broadcast indexed matmul under the gate
    n_vecs = emb_ds.count()
    head = emb_ds.take(1)
    dim = len(head[0][emb_col]) if head else 0
    if n_vecs * dim * 4 <= broadcast_verify_bytes:
        ids_list, mats = [], []
        for b in emb_ds.select_columns([id_col, emb_col]).iter_batches(
            batch_size=8192, batch_format="pyarrow"
        ):
            ids_list.append(np.asarray(b.column(id_col).to_pylist(), dtype=np.int64))
            mats.append(_normalize(_batch_matrix(b, emb_col)))
        all_ids = np.concatenate(ids_list) if ids_list else np.empty(0, np.int64)
        mat = np.vstack(mats) if mats else np.empty((0, 0))
        index = {int(v): i for i, v in enumerate(all_ids)}
        ref = ray.put((index, mat))

        def _verify_broadcast(batch: pa.Table) -> pa.Table:
            if batch.num_rows == 0:
                return pa.Table.from_arrays(
                    [pa.array([], type=pa.int64()), pa.array([], type=pa.int64()),
                     pa.array([], type=pa.float64())],
                    names=["id_a", "id_b", "cosine"],
                )
            idx, m = ray.get(ref)
            ia = np.asarray([idx[int(v)] for v in batch.column("id_a").to_pylist()])
            ib = np.asarray([idx[int(v)] for v in batch.column("id_b").to_pylist()])
            cos = np.einsum("ij,ij->i", m[ia], m[ib])
            keep = cos >= threshold
            out = batch.select(["id_a", "id_b"]).filter(pa.array(keep))
            return out.append_column(
                "cosine",
                pa.array([round_half_away(float(c), 6) for c in cos[keep]],
                         type=pa.float64()),
            )

        return pairs.map_batches(_verify_broadcast, batch_format="pyarrow")

    # exact-cosine verify via two hash joins (pair -> emb_a, pair -> emb_b).
    # Arrow's hash join rejects list<float> payloads, so vectors ride the
    # join as fixed-size binary (zero-copy pack/unpack of the float32 buffer).
    def _pack(batch: pa.Table) -> pa.Table:
        arr = batch.column(emb_col)
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        flat = np.asarray(arr.flatten(), dtype=np.float32)
        n = len(arr)
        width = (flat.size // n) * 4 if n else 4
        packed = pa.Array.from_buffers(
            pa.binary(width), n, [None, pa.py_buffer(flat.tobytes())]
        )
        return pa.Table.from_arrays(
            [batch.column(id_col).combine_chunks(), packed], names=[id_col, "embb"]
        )

    def _unpack(col) -> np.ndarray:
        arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        width = arr.type.byte_width
        buf = arr.buffers()[1]
        flat = np.frombuffer(buf, dtype=np.float32,
                             count=len(arr) * width // 4,
                             offset=arr.offset * width)
        return flat.reshape(len(arr), -1).astype(np.float64)

    cpus = int(ray.cluster_resources().get("CPU", 4)) if ray.is_initialized() else 4
    nparts = max(2, cpus // 2)
    embs = emb_ds.select_columns([id_col, emb_col]).map_batches(
        _pack, batch_format="pyarrow"
    )
    wa = pairs.join(embs, join_type="inner", num_partitions=nparts,
                    on=("id_a",), right_on=(id_col,))
    wa = wa.rename_columns({"embb": "emb_a"})
    wb = wa.join(embs, join_type="inner", num_partitions=nparts,
                 on=("id_b",), right_on=(id_col,))
    wb = wb.rename_columns({"embb": "emb_b"})

    def _verify(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.Table.from_arrays(
                [pa.array([], type=pa.int64()), pa.array([], type=pa.int64()),
                 pa.array([], type=pa.float64())],
                names=["id_a", "id_b", "cosine"],
            )
        ma = _normalize(_unpack(batch.column("emb_a")))
        mb = _normalize(_unpack(batch.column("emb_b")))
        cos = np.einsum("ij,ij->i", ma, mb)
        keep = cos >= threshold
        out = batch.select(["id_a", "id_b"]).filter(pa.array(keep))
        return out.append_column(
            "cosine", pa.array([round_half_away(float(c), 6) for c in cos[keep]], type=pa.float64())
        )

    return wb.map_batches(_verify, batch_format="pyarrow")


def ivf_topk(emb_ds, query_ids: Sequence[int], k: int = 10, n_lists: int = 16,
             n_probe: int = 4, id_col: str = "vec_id", emb_col: str = "embedding",
             seed: int = 42):
    """IVF-style ANN: vectors are assigned to the nearest of ``n_lists``
    deterministic centroids (seeded gaussian directions, normalized --
    a fixed codebook, no training pass); a query probes only its
    ``n_probe`` closest lists. Exact cosine within probed lists.

    Recall < 1 by design; report overlap vs brute_force_topk to measure.
    """
    import ray

    ids, qref = query_matrix(emb_ds, query_ids, id_col, emb_col)
    qmat = ray.get(qref)
    dim = qmat.shape[1]
    rng = np.random.RandomState(seed)
    centroids = _normalize(rng.normal(size=(n_lists, dim)))
    q_lists = np.argsort(-(qmat @ centroids.T), axis=1)[:, :n_probe]  # (nq, n_probe)
    probed = {int(l) for row in q_lists for l in row}

    def _list_filter(batch: pa.Table) -> pa.Table:
        m = _normalize(_batch_matrix(batch, emb_col))
        assign = np.argmax(m @ centroids.T, axis=1)
        keep = np.isin(assign, list(probed))
        return batch.filter(pa.array(keep.tolist(), type=pa.bool_()))

    if len(probed) >= n_lists:
        # the probe union covers every list: the filter would keep all
        # rows, so skip the assignment pass entirely (pure brute force)
        filtered = emb_ds
    else:
        filtered = emb_ds.map_batches(_list_filter, batch_format="pyarrow")
    return brute_force_topk(filtered, query_ids, k, id_col, emb_col,
                            queries=(ids, qref))


def ann_recall_at_k(emb_ds, query_ids: Sequence[int], k: int = 10,
                    n_lists: int = 16, n_probe: int = 4,
                    id_col: str = "vec_id", emb_col: str = "embedding",
                    seed: int = 42):
    """Recall@k evaluation of the IVF probe path against the exact
    brute-force baseline -- the standard ANN quality metric (recall =
    |approx top-k ∩ exact top-k| / k per query). Both rankings run as
    their normal distributed pipelines over the SAME corpus scan graph;
    the comparison is a union of the two (|queries| x k)-row results
    tagged by side plus one keyed groupby at query grain -- nothing
    corpus-sized moves after the rankings themselves.

    At 100 TB this is how probe budgets get tuned: run on a sampled
    query set, sweep n_probe, read the recall/latency curve.

    Output: (query_id, recall_at_k) -- recall is an integer count
    divided by k (one double op, exact-float comparable).
    """
    exact = brute_force_topk(emb_ds, query_ids, k, id_col, emb_col)
    approx = ivf_topk(emb_ds, query_ids, k, n_lists, n_probe,
                      id_col, emb_col, seed)
    return _recall_eval(exact, approx, k)


def _recall_eval(exact, approx, k: int):
    """Shared recall@k core: union of two tagged (query_id, vec_id)
    rankings + ONE keyed groupby at query grain (nothing corpus-sized
    moves after the rankings themselves)."""

    def _tag(src: int):
        def f(t: pa.Table) -> pa.Table:
            return t.select(["query_id", "vec_id"]).append_column(
                "src", pa.array([src] * t.num_rows, type=pa.int32()))
        return f

    both = exact.map_batches(_tag(0), batch_format="pyarrow").union(
        approx.map_batches(_tag(1), batch_format="pyarrow"))

    def _recall(group: pa.Table) -> pa.Table:
        qid = group.column("query_id")[0].as_py()
        src = np.asarray(group.column("src").to_pylist(), dtype=np.int64)
        vids = np.asarray(group.column("vec_id").to_pylist(), dtype=np.int64)
        hits = len(set(vids[src == 0].tolist())
                   & set(vids[src == 1].tolist()))
        return pa.Table.from_arrays(
            [pa.array([qid], type=pa.int64()),
             pa.array([hits / float(k)], type=pa.float64())],
            names=["query_id", "recall_at_k"],
        )

    return both.groupby("query_id").map_groups(_recall,
                                               batch_format="pyarrow")


def knn_graph(emb_ds, k: int = 5, id_col: str = "vec_id",
              emb_col: str = "embedding", broadcast_rows: int = 200_000,
              n_clusters: int = 16, n_probe: int = 4, iters: int = 2):
    """k-nearest-neighbor graph: every vector's top-k cosine neighbors
    (the substrate for SemDeDup-style clustering, label propagation,
    and graph-based retrieval). SIZE-GATED hybrid:

    - ``n <= broadcast_rows``: EXACT -- the normalized corpus matrix is
      ``ray.put`` once and every batch does one matmul against it (zero
      shuffle, O(n^2) compute; the only whole-corpus materialization,
      bounded by the gate).
    - above the gate: trained-IVF probe lists (``lloyd_codebook``) --
      each vector is a MEMBER of its nearest cell and a PROBE of its
      ``n_probe`` nearest cells; candidates are ranked inside each
      cell's cogroup (one keyed shuffle of n x n_probe slim rows, the
      embedding packed as fixed-size binary), then a per-vector keyed
      reduce keeps the global top-k. Approximate with the usual IVF
      recall/probe trade-off; with ``n_probe == n_clusters`` probe
      coverage is total and the result is EXACT (the path-equivalence
      test's configuration). Partitioning assumption: cells are
      balanced by the Lloyd fit; a pathologically skewed corpus (one
      cell holding most rows) degrades the per-cell matmul toward
      O(n^2) -- raise n_clusters (~sqrt(n)) as the corpus grows.

    Returns (vec_id, neighbor_id, rank) with rank 1..k by (cosine desc,
    neighbor_id asc) -- identical tie-break on both paths (float64 dot
    of normalized vectors is grouping-invariant).
    """
    import ray

    n = emb_ds.count()
    if n <= broadcast_rows:
        ids_list, mats = [], []
        for b in emb_ds.select_columns([id_col, emb_col]).iter_batches(
            batch_size=8192, batch_format="pyarrow"
        ):
            ids_list.append(np.asarray(b.column(id_col).to_pylist(),
                                       dtype=np.int64))
            mats.append(_normalize(_batch_matrix(b, emb_col)))
        corpus_ids = (np.concatenate(ids_list) if ids_list
                      else np.empty(0, np.int64))
        corpus = np.vstack(mats) if mats else np.empty((0, 0))
        ref = ray.put((corpus_ids, corpus))

        def _topk(batch: pa.Table) -> pa.Table:
            cids, cmat = ray.get(ref)
            rids = np.asarray(batch.column(id_col).to_pylist(), dtype=np.int64)
            m = _normalize(_batch_matrix(batch, emb_col))
            sims = m @ cmat.T
            out_v, out_n, out_r = [], [], []
            kk = min(k, max(0, len(cids) - 1))
            for row, rid in enumerate(rids):
                col = sims[row]
                order = np.lexsort((cids, -col))
                order = order[cids[order] != rid][:kk]
                out_v.extend([rid] * len(order))
                out_n.extend(cids[order].tolist())
                out_r.extend(range(1, len(order) + 1))
            return pa.Table.from_arrays(
                [pa.array(out_v, type=pa.int64()),
                 pa.array(out_n, type=pa.int64()),
                 pa.array(out_r, type=pa.int64())],
                names=["vec_id", "neighbor_id", "rank"],
            )

        return emb_ds.map_batches(_topk, batch_format="pyarrow")

    # ---- scale path: IVF-bucketed candidates, no corpus on the driver
    centroids = lloyd_codebook(emb_ds, n_clusters, iters, id_col, emb_col)
    cent_ref = ray.put(centroids)
    probe = min(n_probe, n_clusters)

    def _expand(batch: pa.Table) -> pa.Table:
        c = ray.get(cent_ref)
        mat = _batch_matrix(batch, emb_col)
        rids = np.asarray(batch.column(id_col).to_pylist(), dtype=np.int64)
        diff = mat[:, None, :] - c[None, :, :]
        dist = np.einsum("nkd,nkd->nk", diff, diff)
        order = np.argsort(dist, axis=1, kind="stable")[:, :probe]
        nrows = len(rids)
        packed = _normalize(mat).astype(np.float64)
        blobs = [packed[i].tobytes() for i in range(nrows)]
        out_cl, out_id, out_bin, out_mem = [], [], [], []
        for j in range(probe):
            out_cl.extend(order[:, j].tolist())
            out_id.extend(rids.tolist())
            out_bin.extend(blobs)
            out_mem.extend([j == 0] * nrows)
        return pa.Table.from_arrays(
            [pa.array(out_cl, type=pa.int32()),
             pa.array(out_id, type=pa.int64()),
             pa.array(out_bin, type=pa.binary()),
             pa.array(out_mem, type=pa.bool_())],
            names=["cluster", id_col, "embin", "is_member"],
        )

    expanded = emb_ds.map_batches(_expand, batch_format="pyarrow")

    def _cell_topk(group: pa.Table) -> pa.Table:
        mem_mask = np.asarray(group.column("is_member").to_pylist())
        ids_all = np.asarray(group.column(id_col).to_pylist(), dtype=np.int64)
        blobs = group.column("embin").to_pylist()
        mat_all = np.vstack([np.frombuffer(b, dtype=np.float64)
                             for b in blobs])
        m_ids, m_mat = ids_all[mem_mask], mat_all[mem_mask]
        if len(m_ids) == 0:
            return pa.Table.from_arrays(
                [pa.array([], type=pa.int64()), pa.array([], type=pa.int64()),
                 pa.array([], type=pa.float64())],
                names=["vec_id", "neighbor_id", "cosine"],
            )
        sims = mat_all @ m_mat.T  # (probes, members), both normalized
        out_v, out_n, out_s = [], [], []
        kk = min(k, len(m_ids))
        for row in range(len(ids_all)):
            col = sims[row]
            order = np.lexsort((m_ids, -col))
            order = order[m_ids[order] != ids_all[row]][:kk]
            out_v.extend([int(ids_all[row])] * len(order))
            out_n.extend(m_ids[order].tolist())
            out_s.extend(col[order].tolist())
        return pa.Table.from_arrays(
            [pa.array(out_v, type=pa.int64()), pa.array(out_n, type=pa.int64()),
             pa.array(out_s, type=pa.float64())],
            names=["vec_id", "neighbor_id", "cosine"],
        )

    cand = expanded.groupby("cluster").map_groups(
        _cell_topk, batch_format="pyarrow")
    # a vector probing several cells may surface the same neighbor in
    # each (the neighbor is also multi-probed): dedupe inside the final
    # per-vector reduce before ranking

    def _final(group: pa.Table) -> pa.Table:
        vid = group.column("vec_id")[0].as_py()
        nids = np.asarray(group.column("neighbor_id").to_pylist(),
                          dtype=np.int64)
        sims = np.asarray(group.column("cosine").to_pylist(),
                          dtype=np.float64)
        nids, uniq_idx = np.unique(nids, return_index=True)
        sims = sims[uniq_idx]
        order = np.lexsort((nids, -sims))[:k]
        return pa.Table.from_arrays(
            [pa.array([vid] * len(order), type=pa.int64()),
             pa.array(nids[order].tolist(), type=pa.int64()),
             pa.array(list(range(1, len(order) + 1)), type=pa.int64())],
            names=["vec_id", "neighbor_id", "rank"],
        )

    return cand.groupby("vec_id").map_groups(_final, batch_format="pyarrow")


def _neardup_pairs_ivf(emb_ds, threshold: float, id_col: str, emb_col: str,
                       n_clusters: int, n_probe: int, iters: int):
    """Scale path of ``embedding_neardup_exact``: trained-IVF cell
    cogroups emit (probe x member) qualifying pairs per cell; one keyed
    shuffle of n x n_probe slim rows in, one per-pair dedup reduce out.
    Exact when n_probe == n_clusters (total coverage)."""
    import ray

    centroids = lloyd_codebook(emb_ds, n_clusters, iters, id_col, emb_col)
    cent_ref = ray.put(centroids)
    probe = min(n_probe, n_clusters)

    def _expand(batch: pa.Table) -> pa.Table:
        c = ray.get(cent_ref)
        mat = _batch_matrix(batch, emb_col)
        rids = np.asarray(batch.column(id_col).to_pylist(), dtype=np.int64)
        diff = mat[:, None, :] - c[None, :, :]
        dist = np.einsum("nkd,nkd->nk", diff, diff)
        order = np.argsort(dist, axis=1, kind="stable")[:, :probe]
        packed = _normalize(mat)
        blobs = [packed[i].tobytes() for i in range(len(rids))]
        out_cl, out_id, out_bin, out_mem = [], [], [], []
        for j in range(probe):
            out_cl.extend(order[:, j].tolist())
            out_id.extend(rids.tolist())
            out_bin.extend(blobs)
            out_mem.extend([j == 0] * len(rids))
        return pa.Table.from_arrays(
            [pa.array(out_cl, type=pa.int32()),
             pa.array(out_id, type=pa.int64()),
             pa.array(out_bin, type=pa.binary()),
             pa.array(out_mem, type=pa.bool_())],
            names=["cluster", id_col, "embin", "is_member"],
        )

    def _cell_pairs(group: pa.Table) -> pa.Table:
        mem_mask = np.asarray(group.column("is_member").to_pylist())
        ids_all = np.asarray(group.column(id_col).to_pylist(), dtype=np.int64)
        blobs = group.column("embin").to_pylist()
        empty = pa.Table.from_arrays(
            [pa.array([], type=pa.int64()), pa.array([], type=pa.int64()),
             pa.array([], type=pa.float64())],
            names=["id_a", "id_b", "cosine"])
        if not mem_mask.any():
            return empty
        mat_all = np.vstack([np.frombuffer(b, dtype=np.float64)
                             for b in blobs])
        m_ids, m_mat = ids_all[mem_mask], mat_all[mem_mask]
        sims = mat_all @ m_mat.T  # (probes, members), both normalized
        # half-away r6 BEFORE the threshold compare (exact-path parity)
        r6 = np.where(sims >= 0, np.floor(sims * 1e6 + 0.5) / 1e6,
                      -np.floor(-sims * 1e6 + 0.5) / 1e6)
        mask = r6 >= threshold
        pi, mi = np.nonzero(mask)
        a, b = ids_all[pi], m_ids[mi]
        keep = a != b
        a, b, v = a[keep], b[keep], r6[pi[keep], mi[keep]]
        lo, hi = np.minimum(a, b), np.maximum(a, b)
        return pa.Table.from_arrays(
            [pa.array(lo, type=pa.int64()), pa.array(hi, type=pa.int64()),
             pa.array(v, type=pa.float64())],
            names=["id_a", "id_b", "cosine"],
        )

    cand = (emb_ds.map_batches(_expand, batch_format="pyarrow")
            .groupby("cluster")
            .map_groups(_cell_pairs, batch_format="pyarrow"))

    def _dedup(group: pa.Table) -> pa.Table:
        import pandas as pd

        # bound: per-group conversion inside map_groups (one id_a's
        # pairs), not a driver materialization
        df = group.to_pandas().drop_duplicates(["id_a", "id_b"])
        return pa.Table.from_pandas(df, preserve_index=False)

    # a pair surfaces once per shared cell; dedup in a keyed reduce
    return cand.groupby("id_a").map_groups(_dedup, batch_format="pyarrow")


def embedding_neardup_exact(emb_ds, threshold: float = 0.4,
                            id_col: str = "vec_id", emb_col: str = "embedding",
                            broadcast_rows: int = 200_000,
                            n_clusters: int = 16, n_probe: int = 4,
                            iters: int = 2):
    """All-pairs cosine >= threshold -- the brute-force baseline the
    banded `embedding_neardup_pairs` approximates. SIZE-GATED hybrid
    (same construction as ``knn_graph``):

    - ``n <= broadcast_rows``: EXACT -- the normalized corpus matrix is
      broadcast ONCE via ``ray.put`` (ids + f64 matrix), every batch
      does one matmul against it and emits its (id_a < id_b) qualifying
      pairs; zero shuffle, O(n^2) compute, the only whole-corpus
      materialization (bounded by the gate).
    - above the gate: trained-IVF cell cogroups -- each vector is a
      MEMBER of its nearest cell and a PROBE of its ``n_probe`` nearest
      cells; pairs are emitted inside each cell between probes and
      members (id_a < id_b, dedup across cells in the keyed reduce).
      With ``n_probe == n_clusters`` coverage is total and the output is
      EXACT; partial probing trades recall for pruning exactly like IVF
      search. No driver-side corpus at any size.

    Returns (id_a, id_b, cosine r6).
    """
    import ray

    n = emb_ds.count()
    if n > broadcast_rows:
        return _neardup_pairs_ivf(emb_ds, threshold, id_col, emb_col,
                                  n_clusters, n_probe, iters)

    # bound: gated at broadcast_rows vectors (exact baseline twin)
    ids_list, mats = [], []
    for b in emb_ds.select_columns([id_col, emb_col]).iter_batches(
        batch_size=8192, batch_format="pyarrow"
    ):
        ids_list.append(np.asarray(b.column(id_col).to_pylist(), dtype=np.int64))
        mats.append(_normalize(_batch_matrix(b, emb_col)))
    corpus_ids = np.concatenate(ids_list) if ids_list else np.empty(0, np.int64)
    corpus = np.vstack(mats) if mats else np.empty((0, 0))
    ref = ray.put((corpus_ids, corpus))

    def _pairs(batch: pa.Table) -> pa.Table:
        cids, cmat = ray.get(ref)
        rids = np.asarray(batch.column(id_col).to_pylist(), dtype=np.int64)
        m = _normalize(_batch_matrix(batch, emb_col))
        sims = m @ cmat.T  # (batch, corpus)
        # half-away r6 BEFORE the threshold compare (matches the oracle's
        # WHERE ROUND(...) >= t)
        r6 = np.where(sims >= 0,
                      np.floor(sims * 1e6 + 0.5) / 1e6,
                      -np.floor(-sims * 1e6 + 0.5) / 1e6)
        mask = (rids[:, None] < cids[None, :]) & (r6 >= threshold)
        ai, ci = np.nonzero(mask)
        return pa.Table.from_arrays(
            [pa.array(rids[ai], type=pa.int64()),
             pa.array(cids[ci], type=pa.int64()),
             pa.array(r6[ai, ci], type=pa.float64())],
            names=["id_a", "id_b", "cosine"],
        )

    return emb_ds.map_batches(_pairs, batch_format="pyarrow")

def lloyd_codebook(emb_ds, n_clusters: int, iters: int = 2,
                   id_col: str = "vec_id", emb_col: str = "embedding"
                   ) -> np.ndarray:
    """Distributed Lloyd-fitted IVF codebook: deterministic seeds = the
    embeddings of vec_id 0..n_clusters-1 (tiny point read), then
    ``iters`` rounds where the k x dim centroid matrix broadcasts via
    ``ray.put`` and a stateless streaming pass emits one (cluster,
    count, dim-sums) partial per batch that the driver folds (k x dim
    floats -- bounded by the codebook, never the corpus). Assignment is
    squared Euclidean, ties to the lowest cluster (the kmeans_fit
    template). Shared by ``ivf_trained_topk`` and ``knn_graph``'s scale
    path."""
    import ray

    seed_set = set(range(n_clusters))

    def _pick_seeds(batch: pa.Table) -> pa.Table:
        keep = [int(v) in seed_set for v in batch.column(id_col).to_pylist()]
        return batch.filter(pa.array(keep, type=pa.bool_()))

    # bound: n_clusters seed rows (point filter)
    rows = emb_ds.map_batches(_pick_seeds, batch_format="pyarrow").take_all()
    rows.sort(key=lambda r: int(r[id_col]))
    centroids = np.asarray([np.asarray(r[emb_col], dtype=np.float64)
                            for r in rows])

    def _round(cents: np.ndarray) -> np.ndarray:
        cent_ref = ray.put(cents)

        def partial(batch: pa.Table) -> "pd.DataFrame":
            import pandas as pd

            c = ray.get(cent_ref)
            mat = _batch_matrix(batch, emb_col)
            diff = mat[:, None, :] - c[None, :, :]
            dist = np.einsum("nkd,nkd->nk", diff, diff)
            near = np.argmin(dist, axis=1)
            rows = [{"cluster": int(cl), "cnt": int((near == cl).sum()),
                     "sums": mat[near == cl].sum(axis=0).tolist()}
                    for cl in np.unique(near)]
            return pd.DataFrame(rows)

        parts = emb_ds.map_batches(partial, batch_format="pyarrow",
                                   # bound: one (<=k x dim) partial per block, not the corpus
                                   batch_size=8192).to_pandas()
        new = cents.copy()
        for cl, grp in parts.groupby("cluster"):
            cnt = int(grp["cnt"].sum())
            if cnt > 0:
                new[int(cl)] = np.sum(np.stack(grp["sums"].to_numpy()),
                                      axis=0) / cnt
        return new

    for _ in range(iters):
        centroids = _round(centroids)
    return centroids


def ivf_trained_topk(emb_ds, query_ids: Sequence[int], k: int = 10,
                     n_clusters: int = 6, n_probe: int = 2, iters: int = 2,
                     id_col: str = "vec_id", emb_col: str = "embedding"):
    """IVF ANN with TRAINED centroids (``lloyd_codebook``): vectors and
    queries are assigned/probed by squared Euclidean distance, and exact
    cosine ranks the probed lists' members. Upgrade path over
    ``ivf_topk``'s fixed random codebook: the lists follow the data
    distribution, so a given recall needs fewer probes.
    """
    import ray

    def _raw_matrix(batch: pa.Table) -> np.ndarray:
        return _batch_matrix(batch, emb_col)

    centroids = lloyd_codebook(emb_ds, n_clusters, iters, id_col, emb_col)

    # probe: each query's n_probe nearest centroids by (sq dist, cluster)
    qset = set(int(q) for q in query_ids)

    def _pick_q(batch: pa.Table) -> pa.Table:
        keep = [int(v) in qset for v in batch.column(id_col).to_pylist()]
        return batch.filter(pa.array(keep, type=pa.bool_()))

    # bound: |query_ids| rows (point filter)
    qrows = emb_ds.map_batches(_pick_q, batch_format="pyarrow").take_all()
    qrows.sort(key=lambda r: int(r[id_col]))
    qmat = np.asarray([np.asarray(r[emb_col], dtype=np.float64)
                       for r in qrows])
    qdiff = qmat[:, None, :] - centroids[None, :, :]
    qdist = np.einsum("nkd,nkd->nk", qdiff, qdiff)
    probed = {int(cl) for row in np.argsort(qdist, axis=1, kind="stable")[:, :n_probe]
              for cl in row}
    cent_ref = ray.put(centroids)

    def _list_filter(batch: pa.Table) -> pa.Table:
        c = ray.get(cent_ref)
        mat = _raw_matrix(batch)
        diff = mat[:, None, :] - c[None, :, :]
        dist = np.einsum("nkd,nkd->nk", diff, diff)
        keep = np.isin(np.argmin(dist, axis=1), list(probed))
        return batch.filter(pa.array(keep.tolist(), type=pa.bool_()))

    if len(probed) >= n_clusters:
        filtered = emb_ds  # probe union covers every list: skip the pass
    else:
        filtered = emb_ds.map_batches(_list_filter, batch_format="pyarrow")
    # queries precomputed from the BASE corpus (qrows is already sorted
    # by id and cosine ranking normalizes): never re-execute `filtered`
    # for query extraction
    import ray as _ray

    q_ids_sorted = [int(r[id_col]) for r in qrows]
    qref = _ray.put(_normalize(qmat.copy()))
    return brute_force_topk(filtered, query_ids, k, id_col, emb_col,
                            queries=(q_ids_sorted, qref))


def mutual_nn_pairs(emb_ds, id_col: str = "vec_id",
                    emb_col: str = "embedding", **knn_kwargs):
    """Mutual-nearest-neighbor pairs: (a, b) such that b is a's single
    nearest cosine neighbor AND a is b's -- the high-precision pairing
    rule entity-resolution and bitext-mining pipelines use (Artetxe &
    Schwenk's margin criterion reduces to this at k=1).

    Shape: the k=1 kNN graph (size-gated exact/IVF hybrid from
    ``knn_graph``) self-joined against its own reversal -- ONE
    distributed hash join on (vec_id, neighbor_id) -- then a vectorized
    orientation filter keeps each mutual pair once (id_a < id_b).
    Nothing corpus-sized is collected beyond knn_graph's own gate.

    Output: (id_a, id_b) -- id_a < id_b.
    """
    import ray

    nn = knn_graph(emb_ds, k=1, id_col=id_col, emb_col=emb_col,
                   **knn_kwargs).select_columns(["vec_id", "neighbor_id"])

    rev = nn.rename_columns({"vec_id": "r_nbr", "neighbor_id": "r_vec"})
    if ray.is_initialized():
        cpus = int(ray.cluster_resources().get("CPU", 4))
    else:
        cpus = 4
    j = nn.join(rev, join_type="inner",
                num_partitions=max(2, cpus // 2),
                on=("vec_id", "neighbor_id"), right_on=("r_vec", "r_nbr"))

    def orient(batch: pa.Table) -> pa.Table:
        a = np.asarray(batch.column("vec_id").to_pylist(), dtype=np.int64)
        b = np.asarray(batch.column("neighbor_id").to_pylist(),
                       dtype=np.int64)
        keep = a < b
        return pa.Table.from_arrays(
            [pa.array(a[keep], type=pa.int64()),
             pa.array(b[keep], type=pa.int64())],
            names=["id_a", "id_b"])

    return j.map_batches(orient, batch_format="pyarrow")


def hard_negative_topk(emb_ds, query_ids: Sequence[int], k: int = 3,
                       id_col: str = "vec_id", emb_col: str = "embedding",
                       filter_col: str = "label"):
    """HARD-NEGATIVE MINING: for each query vector, the top-k most
    cosine-similar corpus vectors with a DIFFERENT ``filter_col`` value
    -- the contrastive-training pair miner (nearest wrong-label
    neighbors are the informative negatives).  Same broadcast-queries /
    per-batch matmul / tiny keyed reduce shape as brute_force_topk;
    the negated label mask is the only change.

    Returns (query_id, vec_id, rank) with rank 1..k.
    """
    import ray

    qset = set(int(q) for q in query_ids)

    def _pick(batch: pa.Table) -> pa.Table:
        keep = [int(v) in qset for v in batch.column(id_col).to_pylist()]
        return batch.filter(pa.array(keep, type=pa.bool_()))

    # bound: |query_ids| rows (point filter)
    rows = emb_ds.map_batches(_pick, batch_format="pyarrow").take_all()
    rows.sort(key=lambda r: int(r[id_col]))
    ids = [int(r[id_col]) for r in rows]
    qlabels = np.asarray([r[filter_col] for r in rows])
    mat = _normalize(np.asarray([r[emb_col] for r in rows], dtype=np.float64))
    qref = ray.put(mat)

    cand = emb_ds.map_batches(
        FilteredCosineTopKStage(query_ids=ids, query_labels=qlabels,
                                query_ref=qref, k=k + 1, id_col=id_col,
                                emb_col=emb_col, filter_col=filter_col,
                                negate=True),
        batch_format="pyarrow",
    )

    def _final(group: pa.Table) -> pa.Table:
        qid = group.column("query_id")[0].as_py()
        vids = np.asarray(group.column("vec_id").to_pylist(), dtype=np.int64)
        sims = np.asarray(group.column("cosine").to_pylist(), dtype=np.float64)
        mask = vids != qid
        vids, sims = vids[mask], sims[mask]
        order = np.lexsort((vids, -sims))[:k]
        return pa.Table.from_arrays(
            [pa.array([qid] * len(order), type=pa.int64()),
             pa.array(vids[order].tolist(), type=pa.int64()),
             pa.array(list(range(1, len(order) + 1)), type=pa.int64())],
            names=["query_id", "vec_id", "rank"],
        )

    return cand.groupby("query_id").map_groups(_final,
                                               batch_format="pyarrow")


def range_search(emb_ds, query_ids, threshold: float = 0.3,
                 id_col: str = "vec_id", emb_col: str = "embedding",
                 queries=None):
    """Cosine RANGE query: every corpus vector within similarity >=
    ``threshold`` of each query (the radius-limited dual of
    brute_force_topk -- the retrieval primitive for "all sufficiently
    similar", e.g. near-dup candidate pull or recall-complete eval).

    The threshold compares against the r6-ROUNDED similarity on both
    engines (same boundary discipline as emb_neardup_exact), so the
    membership set is deterministic. Broadcast query matrix, one
    zero-copy batch matmul, vectorized mask -- fully streaming, no
    reduce stage at all (unlike top-k there is no cross-batch ranking).

    Zero-norm corpus vectors are EXCLUDED (cosine is undefined for
    them): the SQL oracle's list_cosine_similarity yields NULL for a
    zero vector and NULL fails any >= comparison, so dropping them in
    the engine keeps the sets identical at every threshold, including
    threshold <= 0 (ADVICE r4).

    Output: (query_id, vec_id, cosine r6) sorted by query_id, vec_id.
    """
    import pandas as pd
    import ray

    ids, qref = (queries if queries is not None
                 else query_matrix(emb_ds, query_ids, id_col, emb_col))
    qid_arr = np.asarray(ids, dtype=np.int64)

    class _RangeStage:
        def __init__(self):
            self.q = ray.get(qref)

        def __call__(self, batch: pa.Table) -> pd.DataFrame:
            vids = np.asarray(batch.column(id_col).to_pylist(),
                              dtype=np.int64)
            raw = _batch_matrix(batch, emb_col)
            nonzero = np.linalg.norm(raw, axis=1) > 0
            vids, raw = vids[nonzero], raw[nonzero]
            m = _normalize(raw)
            sims = m @ self.q.T  # (batch, n_queries)
            r6 = np.where(sims >= 0,
                          np.floor(sims * 1e6 + 0.5) / 1e6,
                          -np.floor(-sims * 1e6 + 0.5) / 1e6)
            row, col = np.nonzero(
                (r6 >= threshold) & (vids[:, None] != qid_arr[None, :]))
            return pd.DataFrame({
                "query_id": qid_arr[col],
                "vec_id": vids[row],
                "cosine": r6[row, col],
            })

    return emb_ds.map_batches(_RangeStage(), batch_format="pyarrow").sort(
        ["query_id", "vec_id"])


def pq_encode(emb_ds, m: int = 2, n_clusters: int = 4, iters: int = 2,
              id_col: str = "vec_id", emb_col: str = "embedding"):
    """Product quantization (Jegou et al. 2011): the embedding splits
    into ``m`` contiguous subspaces; each subspace gets its own Lloyd
    codebook (the shared 2-iter ``lloyd_codebook`` fit, seeds = the
    SLICES of vec_id < k); a vector's code is the per-subspace
    nearest-centroid tuple, qerr the summed squared residual. PQ is the
    memory-scale path for 100 TB ANN: m codes of log2(k) bits replace
    dim floats (here 2 bytes vs 256 -- the asymmetric-distance index
    stores ONLY these codes plus the m small codebooks).

    Scale shape: training is m bounded Lloyd fits (k x dim/m partials,
    never the corpus); encoding is one stateless streaming pass against
    the broadcast codebook stack. No shuffle anywhere.

    Output: (vec_id, code0..code{m-1} int64, qerr r6) sorted by vec_id.
    """
    import pandas as pd
    import ray

    from ..functions.rounding import round_series

    # bound-static: 1 row (dim probe)
    first = emb_ds.limit(1).take_all()[0]
    dim = len(first[emb_col])
    assert dim % m == 0, (dim, m)
    w = dim // m

    def _slice_ds(j: int):
        lo, hi = j * w, (j + 1) * w

        def cut(batch: pa.Table) -> pa.Table:
            ids = batch.column(id_col)
            mat = _batch_matrix(batch, emb_col)[:, lo:hi]
            return pa.Table.from_arrays(
                [ids, pa.array(mat.tolist(),
                               type=pa.list_(pa.float64()))],
                names=[id_col, emb_col])

        return emb_ds.map_batches(cut, batch_format="pyarrow")

    books = np.stack([lloyd_codebook(_slice_ds(j), n_clusters, iters,
                                     id_col, emb_col)
                      for j in range(m)])  # (m, k, w)
    bref = ray.put(books)

    def encode(batch: pa.Table) -> pd.DataFrame:
        b = ray.get(bref)
        ids = np.asarray(batch.column(id_col).to_pylist(), dtype=np.int64)
        mat = _batch_matrix(batch, emb_col)
        out = {"vec_id": ids}
        qerr = np.zeros(len(ids), dtype=np.float64)
        for j in range(m):
            sub = mat[:, j * w:(j + 1) * w]
            diff = sub[:, None, :] - b[j][None, :, :]
            dist = np.einsum("nkd,nkd->nk", diff, diff)
            code = np.argmin(dist, axis=1)  # ties -> lowest cluster
            out[f"code{j}"] = code.astype(np.int64)
            qerr += dist[np.arange(len(ids)), code]
        out["qerr"] = round_series(pd.Series(qerr), 6).to_numpy()
        return pd.DataFrame(out)

    return emb_ds.map_batches(encode, batch_format="pyarrow",
                              batch_size=8192).sort(id_col)


def pq_adc_topk(emb_ds, query_ids, k: int = 10, m: int = 2,
                n_clusters: int = 4, iters: int = 2,
                id_col: str = "vec_id", emb_col: str = "embedding"):
    """PQ asymmetric-distance top-k (the ADC search of Jegou et al.
    2011): corpus vectors are reduced to their ``pq_encode`` codes; a
    query scans CODES ONLY, with per-subspace lookup tables
    LUT[j][c] = ||q_j - centroid_jc||^2 precomputed once per query, so
    the per-vector cost is m table lookups + adds instead of a dim-wide
    float op. This is what makes 100 TB ANN memory-feasible: the scan
    touches 2 bytes/vector, not 256.

    Codes come from the same deterministic codebook fit as pq_encode,
    so the result is exactly reproducible in SQL (the oracle recomputes
    ADC from the unrolled-Lloyd centroids). Ranking ties break on
    vec_id ascending. Self-match excluded.

    Output: (query_id, vec_id, rank 1..k) sorted by query_id, rank.
    """
    import pandas as pd
    import ray

    # --- index build (shared with pq_encode: m bounded Lloyd fits) ---
    # bound-static: 1 row (dim probe)
    first = emb_ds.limit(1).take_all()[0]
    dim = len(first[emb_col])
    assert dim % m == 0, (dim, m)
    w = dim // m

    def _slice_ds(j: int):
        lo, hi = j * w, (j + 1) * w

        def cut(batch: pa.Table) -> pa.Table:
            ids = batch.column(id_col)
            mat = _batch_matrix(batch, emb_col)[:, lo:hi]
            return pa.Table.from_arrays(
                [ids, pa.array(mat.tolist(), type=pa.list_(pa.float64()))],
                names=[id_col, emb_col])

        return emb_ds.map_batches(cut, batch_format="pyarrow")

    books = np.stack([lloyd_codebook(_slice_ds(j), n_clusters, iters,
                                     id_col, emb_col)
                      for j in range(m)])  # (m, k, w)
    bref = ray.put(books)

    # query rows (bounded point filter) -> per-query LUTs, broadcast once
    qset = set(int(q) for q in query_ids)

    def _pick(batch: pa.Table) -> pa.Table:
        keep = [int(v) in qset for v in batch.column(id_col).to_pylist()]
        return batch.filter(pa.array(keep, type=pa.bool_()))

    # bound: |query_ids| rows (point filter)
    qrows = emb_ds.map_batches(_pick, batch_format="pyarrow").take_all()
    qrows.sort(key=lambda r: int(r[id_col]))
    qids = np.asarray([int(r[id_col]) for r in qrows], dtype=np.int64)
    qmat = np.asarray([np.asarray(r[emb_col], dtype=np.float64)
                       for r in qrows])
    # LUT[q, j, c] = squared distance of query q's subspace j to centroid c
    lut = np.stack([
        ((qmat[:, j * w:(j + 1) * w][:, None, :]
          - books[j][None, :, :]) ** 2).sum(axis=2)
        for j in range(m)], axis=1)
    lref = ray.put(lut)

    def scan(batch: pa.Table) -> pd.DataFrame:
        b = ray.get(bref)
        lt = ray.get(lref)
        ids = np.asarray(batch.column(id_col).to_pylist(), dtype=np.int64)
        mat = _batch_matrix(batch, emb_col)
        # encode this batch (in the real index the codes ARE the stored
        # column; here they derive on the fly from the same codebooks)
        adc = np.zeros((len(ids), len(qids)), dtype=np.float64)
        for j in range(m):
            sub = mat[:, j * w:(j + 1) * w]
            diff = sub[:, None, :] - b[j][None, :, :]
            dist = np.einsum("nkd,nkd->nk", diff, diff)
            code = np.argmin(dist, axis=1)
            adc += lt[:, j, :][:, code].T  # (batch, nq)
        kk = min(k + 1, len(ids))
        out = []
        for qi, qid in enumerate(qids):
            col = adc[:, qi]
            order = np.lexsort((ids, col))[:kk]
            out.append(pd.DataFrame({"query_id": qid, "vec_id": ids[order],
                                     "adc": col[order]}))
        return pd.concat(out, ignore_index=True)

    cand = emb_ds.map_batches(scan, batch_format="pyarrow", batch_size=8192)

    def _final(group: pd.DataFrame) -> pd.DataFrame:
        qid = int(group["query_id"].iloc[0])
        g = group[group["vec_id"] != qid]
        g = g.sort_values(["adc", "vec_id"]).head(k)
        return pd.DataFrame({"query_id": qid, "vec_id": g["vec_id"].to_numpy(),
                             "rank": np.arange(1, len(g) + 1, dtype=np.int64)})

    return (cand.groupby("query_id").map_groups(_final, batch_format="pandas")
            .sort(["query_id", "rank"]))


def ann_shard_plan(emb_ds, n_clusters: int = 6, n_shards: int = 3,
                   iters: int = 2, id_col: str = "vec_id",
                   emb_col: str = "embedding"):
    """IVF shard-packing plan: fit the shared ``lloyd_codebook``, count
    vectors per cell with a streaming census, then pack the cells into
    ``n_shards`` shards with the greedy LPT heuristic (Graham 1969:
    cells in descending size order, each to the currently-lightest
    shard, ties to the lowest ids). This is the index-build planning
    step a sharded ANN service runs before writing posting lists --
    the shard map decides which node serves which cells.

    Scale shape: the census is one (<= n_clusters)-row partial per
    batch folded on the driver (bounded by the codebook like
    ``lloyd_codebook``'s own round partials); LPT runs driver-side over
    n_clusters rows (cell grain -- corpus-independent). Empty cells
    still appear in the plan (count 0) so every posting list has a
    home.

    Output: (cl, n_vecs, shard) sorted by cl.
    """
    import pandas as pd
    import ray
    import ray.data as rd

    centroids = lloyd_codebook(emb_ds, n_clusters, iters, id_col, emb_col)
    cent_ref = ray.put(centroids)

    def census(batch: pa.Table):
        import pandas as pd

        c = ray.get(cent_ref)
        mat = _batch_matrix(batch, emb_col)
        diff = mat[:, None, :] - c[None, :, :]
        dist = np.einsum("nkd,nkd->nk", diff, diff)
        near = np.argmin(dist, axis=1)
        cnt = np.bincount(near, minlength=n_clusters)
        return pd.DataFrame({"cl": np.arange(n_clusters, dtype=np.int64),
                             "cnt": cnt.astype(np.int64)})

    # bound: one (<= n_clusters)-row partial per block, not the corpus
    parts = emb_ds.map_batches(census, batch_format="pyarrow",
                               batch_size=8192).to_pandas()
    counts = (parts.groupby("cl", sort=True)["cnt"].sum()
              .reindex(range(n_clusters), fill_value=0)
              .to_numpy(np.int64))

    # greedy LPT over cell grain (n_clusters rows; driver-side by design)
    order = sorted(range(n_clusters), key=lambda c: (-int(counts[c]), c))
    loads = [0] * n_shards
    shard_of = [0] * n_clusters
    for c in order:
        s = min(range(n_shards), key=lambda i: (loads[i], i))
        shard_of[c] = s
        loads[s] += int(counts[c])

    out = pd.DataFrame({
        "cl": np.arange(n_clusters, dtype=np.int64),
        "n_vecs": counts,
        "shard": np.asarray(shard_of, dtype=np.int64),
    })
    return rd.from_pandas(out)


def emb_norm_outliers(emb_ds, q_lo_pm: int = 10, q_hi_pm: int = 990,
                      id_col: str = "vec_id", emb_col: str = "embedding"):
    """Embedding hygiene gate: flag vectors whose L-INFINITY norm (max
    |component|) falls outside the corpus's [q_lo, q_hi] order-statistic
    band. The fixture's vectors are unit-L2 (their L2 norm is
    degenerate -- constant 1.0), so the inf-norm measures how
    CONCENTRATED a unit vector's mass is: spikes (one coordinate
    dominating -- collapsed/one-hot-ish encoder outputs) and overly
    flat vectors both retrieve poorly, so an ingest pipeline
    quarantines the tails before indexing.

    Determinism: the inf-norm is a pure per-row abs+max (NO float
    summation anywhere -- bit-identical in numpy and SQL), rounded to 6
    decimals (half-away, the DuckDB ROUND convention) BEFORE ranking;
    the two band edges are exact order statistics of that rounded
    multiset (rank ceil(q_lo_pm*n/1000) from the bottom, rank
    ceil((1000-q_hi_pm)*n/1000) from the top, both in integer
    arithmetic), and membership is a strict value compare -- ties at an
    edge stay inside the band in both engines.

    Scale shape: the norm table is one streaming vectorized pass (vec
    grain); BOTH band edges come from ONE distributed sort of it --
    ``split_at_indices`` on the materialized sorted result is block
    slicing by global row index, not another exchange (the ppl_buckets
    pattern); tagging is a stateless broadcast-threshold filter.

    Output: (vec_id, inf_norm r6, tag in {'low','high'}) -- outlier rows
    only, sorted by vec_id.
    """
    import pandas as pd

    from ..functions.rounding import round_series

    def norms(batch: pa.Table):
        import pandas as pd

        ids = np.asarray(batch.column(id_col).to_pylist(), dtype=np.int64)
        mat = _batch_matrix(batch, emb_col)
        nrm = np.abs(mat).max(axis=1)
        return pd.DataFrame({id_col: ids,
                             "inf_norm": round_series(pd.Series(nrm), 6)})

    nt = emb_ds.map_batches(norms, batch_format="pyarrow",
                            batch_size=8192).materialize()
    n = nt.count()
    lo_k = max(1, (n * q_lo_pm + 999) // 1000)           # 1-based, ascending
    hi_k = max(1, (n * (1000 - q_hi_pm) + 999) // 1000)  # from the top

    # the ONE sort; edge rows sliced by global index
    snt = nt.sort("inf_norm").materialize()
    parts = snt.split_at_indices([lo_k - 1, lo_k, n - hi_k, n - hi_k + 1])

    def edge(part) -> float:
        # bound: 1 row (single-index slice of the sorted table)
        return float(part.take_all()[0]["inf_norm"])

    lo_val, hi_val = edge(parts[1]), edge(parts[3])

    def tag(df: pd.DataFrame) -> pd.DataFrame:
        v = df["inf_norm"].to_numpy(np.float64)
        keep = (v < lo_val) | (v > hi_val)
        out = df.loc[keep, [id_col, "inf_norm"]].copy()
        out["tag"] = np.where(out["inf_norm"].to_numpy(np.float64) < lo_val,
                              "low", "high")
        return out

    return nt.map_batches(tag, batch_format="pandas").sort(id_col)


def emb_recall_eval(emb_ds, threshold: float = 0.4, bands: int = 6,
                    rows_per_band: int = 3, n_buckets: int = 16):
    """Recall/precision of the banded-LSH embedding near-dup chain
    (embedding_neardup_pairs) against the exact all-pairs baseline
    (embedding_neardup_exact) -- the embedding counterpart of
    stages/dedup.lsh_recall_eval: the knob it grades is bands x
    rows_per_band. Precision is 1.0 by construction (candidates verify
    with the same exact cosine) but is COMPUTED, not assumed.

    Shape: both pair pipelines run their normal distributed plans; one
    pair-keyed combiner groupby + a distributed sum reduce to three
    scalar counts -- the pair tables never collect.

    Output: one row (n_exact, n_lsh, n_hit, lsh_recall, lsh_precision);
    ratios are single double ops on integer counts (exact-float
    comparable).
    """
    import pandas as pd
    import ray.data as rd

    from ..stages.agg import grouped_agg

    exact = embedding_neardup_exact(emb_ds, threshold=threshold)
    approx = embedding_neardup_pairs(emb_ds, threshold=threshold,
                                     bands=bands,
                                     rows_per_band=rows_per_band)

    def _tag(side: str):
        def f(t: pa.Table) -> pd.DataFrame:
            # bound: per-batch conversion inside map_batches (pair ids
            # only, two int64 columns)
            df = t.select(["id_a", "id_b"]).to_pandas()
            df["ex"] = np.int64(1 if side == "exact" else 0)
            df["ls"] = np.int64(0 if side == "exact" else 1)
            return df
        return f

    both = exact.map_batches(_tag("exact"), batch_format="pyarrow").union(
        approx.map_batches(_tag("lsh"), batch_format="pyarrow"))
    pair_grain = grouped_agg(both, ["id_a", "id_b"],
                             {"ex": ("ex", "sum"), "ls": ("ls", "sum")},
                             n_buckets=n_buckets)

    def _ind(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "ex": (df["ex"] > 0).astype(np.int64),
            "ls": (df["ls"] > 0).astype(np.int64),
            "hit": ((df["ex"] > 0) & (df["ls"] > 0)).astype(np.int64),
        })

    sums = pair_grain.map_batches(_ind, batch_format="pandas").sum(
        ["ex", "ls", "hit"])  # bound: three scalars (distributed sum)
    sums = sums or {}  # Ray returns None on an all-empty dataset
    n_exact = int(sums.get("sum(ex)") or 0)
    n_lsh = int(sums.get("sum(ls)") or 0)
    n_hit = int(sums.get("sum(hit)") or 0)
    out = pd.DataFrame({
        "n_exact": pd.Series([n_exact], dtype="int64"),
        "n_lsh": pd.Series([n_lsh], dtype="int64"),
        "n_hit": pd.Series([n_hit], dtype="int64"),
        "lsh_recall": [float(n_hit) / n_exact if n_exact else 0.0],
        "lsh_precision": [float(n_hit) / n_lsh if n_lsh else 0.0],
    })
    return rd.from_pandas(out)


def ivf_pq_topk(emb_ds, query_ids, k: int = 10, n_lists: int = 6,
                m: int = 2, n_clusters: int = 4, n_probe: int = 2,
                iters: int = 2, id_col: str = "vec_id",
                emb_col: str = "embedding"):
    """IVF+PQ asymmetric-distance top-k -- the canonical 100 TB ANN
    index (Jegou et al. 2011 IVFADC): a coarse ``lloyd_codebook``
    partitions the corpus into inverted lists, each vector stores only
    its PQ code of the RESIDUAL to its list centroid, and a query
    probes its ``n_probe`` nearest lists with a per-(query, list) ADC
    lookup table over the residual codebooks.  Composition of the
    existing ``ivf_trained_topk`` (coarse probe) and ``pq_adc_topk``
    (ADC scan), with the residual encoding that makes the combination
    the published index rather than two independent tricks.

    Scale shape: the index build is 1 + m bounded Lloyd fits (k x dim
    partials, never the corpus; the residual pass is a stateless
    streaming map against the broadcast coarse codebook).  The search
    is one streaming scan that touches only rows in probed lists
    (m code lookups + adds per row), batch-local top-(k+1) partials,
    then ONE bounded query-keyed groupby.  No shuffle anywhere else.

    Determinism: every argmin ties to the lowest cluster and the final
    ranking ties on vec_id ascending, so the oracle's unrolled-Lloyd
    SQL reproduces the result exactly.  Self-match excluded.

    Output: (query_id, vec_id, rank 1..k) sorted by query_id, rank.
    """
    import pandas as pd
    import ray

    # --- coarse codebook + residual view ---------------------------------
    cents = lloyd_codebook(emb_ds, n_lists, iters, id_col, emb_col)
    cref = ray.put(cents)
    # bound-static: 1 row (dim probe)
    dim = len(emb_ds.limit(1).take_all()[0][emb_col])
    assert dim % m == 0, (dim, m)
    w = dim // m

    def _coarse(mat: np.ndarray, c: np.ndarray) -> np.ndarray:
        diff = mat[:, None, :] - c[None, :, :]
        dist = np.einsum("nkd,nkd->nk", diff, diff)
        return np.argmin(dist, axis=1)  # ties -> lowest list

    def _resid_slice_ds(j: int):
        lo, hi = j * w, (j + 1) * w

        def cut(batch: pa.Table) -> pa.Table:
            c = ray.get(cref)
            ids = batch.column(id_col)
            mat = _batch_matrix(batch, emb_col)
            res = (mat - c[_coarse(mat, c)])[:, lo:hi]
            return pa.Table.from_arrays(
                [ids, pa.array(res.tolist(), type=pa.list_(pa.float64()))],
                names=[id_col, emb_col])

        return emb_ds.map_batches(cut, batch_format="pyarrow")

    # --- m residual sub-codebooks (seeds = residuals of vec_id < k) ------
    books = np.stack([lloyd_codebook(_resid_slice_ds(j), n_clusters, iters,
                                     id_col, emb_col)
                      for j in range(m)])  # (m, k, w)
    bref = ray.put(books)

    # --- query rows -> per-(query, probed list) residual-ADC LUTs --------
    qset = set(int(q) for q in query_ids)

    def _pick_q(batch: pa.Table) -> pa.Table:
        keep = [int(v) in qset for v in batch.column(id_col).to_pylist()]
        return batch.filter(pa.array(keep, type=pa.bool_()))

    # bound: |query_ids| rows (point filter)
    qrows = emb_ds.map_batches(_pick_q, batch_format="pyarrow").take_all()
    qrows.sort(key=lambda r: int(r[id_col]))
    qids = np.asarray([int(r[id_col]) for r in qrows], dtype=np.int64)
    qmat = np.asarray([np.asarray(r[emb_col], dtype=np.float64)
                       for r in qrows])
    qdiff = qmat[:, None, :] - cents[None, :, :]
    qdist = np.einsum("nkd,nkd->nk", qdiff, qdiff)
    # stable argsort == order by (dist, list): ties to the lowest list
    probes = np.argsort(qdist, axis=1, kind="stable")[:, :n_probe]  # (nq, p)
    # LUT[q, p, j, c] = || (query_q - coarse_centroid_{probes[q,p]})_j
    #                      - residual_codeword_jc ||^2
    targets = qmat[:, None, :] - cents[probes]           # (nq, p, dim)
    lut = np.stack([
        ((targets[:, :, None, j * w:(j + 1) * w]
          - books[j][None, None, :, :]) ** 2).sum(axis=3)
        for j in range(m)], axis=2)                      # (nq, p, m, k)
    pref = ray.put((probes, lut))

    # --- streaming ADC scan over probed lists ----------------------------
    def scan(batch: pa.Table) -> pd.DataFrame:
        c = ray.get(cref)
        b = ray.get(bref)
        pr, lt = ray.get(pref)
        ids = np.asarray(batch.column(id_col).to_pylist(), dtype=np.int64)
        mat = _batch_matrix(batch, emb_col)
        cl = _coarse(mat, c)
        res = mat - c[cl]
        codes = np.empty((m, len(ids)), dtype=np.int64)
        for j in range(m):
            sub = res[:, j * w:(j + 1) * w]
            diff = sub[:, None, :] - b[j][None, :, :]
            dist = np.einsum("nkd,nkd->nk", diff, diff)
            codes[j] = np.argmin(dist, axis=1)  # ties -> lowest code
        kk = k + 1
        out = []
        for qi, qid in enumerate(qids):
            for pi in range(pr.shape[1]):
                mask = cl == pr[qi, pi]
                if not mask.any():
                    continue
                adc = np.zeros(int(mask.sum()), dtype=np.float64)
                for j in range(m):
                    adc += lt[qi, pi, j][codes[j][mask]]
                mids = ids[mask]
                order = np.lexsort((mids, adc))[:kk]
                out.append(pd.DataFrame({
                    "query_id": qid, "vec_id": mids[order],
                    "adc": adc[order]}))
        if not out:
            return pd.DataFrame({
                "query_id": pd.Series([], dtype="int64"),
                "vec_id": pd.Series([], dtype="int64"),
                "adc": pd.Series([], dtype="float64")})
        return pd.concat(out, ignore_index=True)

    cand = emb_ds.map_batches(scan, batch_format="pyarrow", batch_size=8192)

    def _final(group: pd.DataFrame) -> pd.DataFrame:
        qid = int(group["query_id"].iloc[0])
        g = group[group["vec_id"] != qid]
        g = g.sort_values(["adc", "vec_id"]).head(k)
        return pd.DataFrame({"query_id": qid,
                             "vec_id": g["vec_id"].to_numpy(),
                             "rank": np.arange(1, len(g) + 1,
                                               dtype=np.int64)})

    # bound: one keyed groupby at query grain (|Q| x (k+1) x n_probe rows)
    return (cand.groupby("query_id").map_groups(_final,
                                                batch_format="pandas")
            .sort(["query_id", "rank"]))


def ivf_pq_recall_at_k(emb_ds, query_ids, k: int = 10, n_lists: int = 6,
                       m: int = 2, n_clusters: int = 4, n_probe: int = 2,
                       iters: int = 2, id_col: str = "vec_id",
                       emb_col: str = "embedding"):
    """Recall@k of the IVF+PQ (IVFADC) index vs the exact brute-force
    baseline -- the evaluation twin of ``ann_recall_at_k`` for the
    compressed-code path, measuring BOTH loss sources at once (the
    coarse probe miss AND the PQ quantization error). At 100 TB this is
    the curve that trades code bytes (m, n_clusters) and probe budget
    against recall. Same shape as ``ann_recall_at_k``: the two rankings
    run as their normal distributed pipelines; the comparison is the
    shared ``_recall_eval`` union + one query-grain groupby.

    Output: (query_id, recall_at_k) -- integer count / k.
    """
    exact = brute_force_topk(emb_ds, query_ids, k, id_col, emb_col)
    approx = ivf_pq_topk(emb_ds, query_ids, k, n_lists, m, n_clusters,
                         n_probe, iters, id_col, emb_col)
    return _recall_eval(exact, approx, k)


def _sq8_minmax(emb_ds, emb_col: str = "embedding"):
    """Global per-dimension (min, max) of the embedding table via one
    combiner pass: each batch emits a (dim x 2) partial -- tiny -- and
    the driver combine is dimension-grain (corpus-independent)."""
    import pandas as pd

    def mm_partial(batch: pa.Table) -> pa.Table:
        mat = _batch_matrix(batch, emb_col)
        dim = mat.shape[1]
        return pa.Table.from_arrays(
            [pa.array(np.arange(1, dim + 1, dtype=np.int64)),
             pa.array(mat.min(axis=0)), pa.array(mat.max(axis=0))],
            names=["dim", "mn", "mx"],
        )

    # bound: one (dim x 2) partial row-group per block
    mm = (emb_ds.map_batches(mm_partial, batch_format="pyarrow",
                             batch_size=65536).to_pandas()
          .groupby("dim").agg(mn=("mn", "min"), mx=("mx", "max"))
          .sort_index())
    return mm["mn"].to_numpy(np.float64), mm["mx"].to_numpy(np.float64)


def _sq8_codes(mat: np.ndarray, mn: np.ndarray, mx: np.ndarray) -> np.ndarray:
    """Int8 scalar quantization codes (stored int64 for exact matmul):
    q = round_half_away((v - mn) / (mx - mn) * 255), 0 where the dim is
    constant. Identical IEEE op sequence as the emb_quantize oracle's
    ROUND((v - mn)/(mx - mn) * 255) (operands are non-negative, so
    floor(x + 0.5) == DuckDB's half-away ROUND)."""
    rng = mx - mn
    safe = np.where(rng > 0, rng, 1.0)
    x = (mat - mn) / safe * 255.0
    return np.where(rng > 0, np.floor(x + 0.5), 0.0).astype(np.int64)


class SQ8TopKStage:
    """Per batch: quantize the corpus rows with the broadcast global
    affine, integer distance against the broadcast quantized query
    codes, emit each query's batch-local top-k. The ranking key is the
    squared L2 distance BETWEEN CODES, sum_d (qc_d - qq_d)^2 -- an int64
    sum, order-independent and bit-identical between numpy and the SQL
    oracle (no float accumulation anywhere in the ranking key). Note a
    raw dot product of affine codes would NOT approximate cosine (the
    min-shift adds a magnitude bias term); code-space L2 is the metric
    uniform scalar quantizers actually rank by."""

    def __init__(self, query_ids, mnmx_ref, qcodes_ref, k: int,
                 id_col: str = "vec_id", emb_col: str = "embedding"):
        import ray

        self.query_ids = query_ids
        self.mn, self.mx = ray.get(mnmx_ref)
        self.qc = ray.get(qcodes_ref)  # (n_queries, dim) int64
        self.k = k
        self.id_col = id_col
        self.emb_col = emb_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch.column(self.id_col).to_pylist(), dtype=np.int64)
        codes = _sq8_codes(_batch_matrix(batch, self.emb_col),
                           self.mn, self.mx)
        # ||c - q||^2 = ||c||^2 + ||q||^2 - 2 c.q  -- all int64, exact
        c2 = (codes * codes).sum(axis=1, keepdims=True)
        q2 = (self.qc * self.qc).sum(axis=1)
        dist = c2 + q2[None, :] - 2 * (codes @ self.qc.T)
        out_q, out_id, out_d = [], [], []
        k = min(self.k, len(ids))
        for qi, qid in enumerate(self.query_ids):
            col = dist[:, qi]
            order = np.lexsort((ids, col))[:k]
            out_q.extend([qid] * len(order))
            out_id.extend(ids[order].tolist())
            out_d.extend(col[order].tolist())
        return pa.Table.from_arrays(
            [pa.array(out_q, type=pa.int64()),
             pa.array(out_id, type=pa.int64()),
             pa.array(out_d, type=pa.int64())],
            names=["query_id", "vec_id", "dist"],
        )


def sq8_topk(emb_ds, query_ids: Sequence[int], k: int = 10,
             id_col: str = "vec_id", emb_col: str = "embedding"):
    """SQ8 scalar-quantized ANN top-k -- the third classic compression
    point alongside PQ/IVFADC (trains nothing, 1 byte/dim, exact integer
    scoring); what FAISS calls IndexScalarQuantizer(QT_8bit) and every
    vector store ships as "scalar quantization". At 100 TB the wins are
    (a) 8x smaller scan footprint vs f64 and (b) an integer-SIMD
    distance kernel; unlike PQ there is no codebook fit, so index build
    is one metadata pass.

    Ranking metric: squared L2 distance in CODE space (asc). On the
    unit-L2 embedding fixture, exact L2 ranks identically to cosine, so
    the quantized-L2 ranking is the natural SQ8 approximation of the
    cosine rankings the other ANN ops produce (a raw dot product of
    affine 0..255 codes would NOT be -- the min-shift adds a magnitude
    bias that swamps direction).

    Shape: pass 1 = per-dim global (min, max) combiner (dim x 2 rows per
    batch); queries quantized on the driver with the same affine and
    broadcast with the range scalars via ray.put; pass 2 streams the
    corpus once -- quantize, int64 distance matrix, batch-local
    top-(k+1) -- and ONE bounded query-keyed groupby ranks
    (dist asc, vec_id asc), excluding self. Zero shuffle of corpus-grain
    data.

    Output: (query_id, vec_id, rank 1..k, dist int64).
    """
    import ray

    mn, mx = _sq8_minmax(emb_ds, emb_col)
    qset = set(int(q) for q in query_ids)

    def _pick(batch: pa.Table) -> pa.Table:
        keep = [int(v) in qset for v in batch.column(id_col).to_pylist()]
        return batch.filter(pa.array(keep, type=pa.bool_()))

    # bound: |query_ids| rows (point filter)
    rows = emb_ds.map_batches(_pick, batch_format="pyarrow").take_all()
    rows.sort(key=lambda r: int(r[id_col]))
    ids = [int(r[id_col]) for r in rows]
    qmat = np.asarray([r[emb_col] for r in rows], dtype=np.float64)
    qcodes = _sq8_codes(qmat, mn, mx)

    mnmx_ref = ray.put((mn, mx))
    qcodes_ref = ray.put(qcodes)

    cand = emb_ds.map_batches(
        SQ8TopKStage(query_ids=ids, mnmx_ref=mnmx_ref,
                     qcodes_ref=qcodes_ref, k=k + 1,
                     id_col=id_col, emb_col=emb_col),
        batch_format="pyarrow",
    )

    def _final(group: pa.Table) -> pa.Table:
        qid = group.column("query_id")[0].as_py()
        vids = np.asarray(group.column("vec_id").to_pylist(), dtype=np.int64)
        dd = np.asarray(group.column("dist").to_pylist(), dtype=np.int64)
        mask = vids != qid
        vids, dd = vids[mask], dd[mask]
        order = np.lexsort((vids, dd))[:k]
        n = len(order)
        return pa.Table.from_arrays(
            [pa.array([qid] * n, type=pa.int64()),
             pa.array(vids[order].tolist(), type=pa.int64()),
             pa.array(list(range(1, n + 1)), type=pa.int64()),
             pa.array(dd[order].tolist(), type=pa.int64())],
            names=["query_id", "vec_id", "rank", "dist"],
        )

    # bound: one keyed groupby at query grain (|Q| x (k+1) rows)
    return (cand.groupby("query_id").map_groups(_final,
                                                batch_format="pyarrow")
            .sort(["query_id", "rank"]))


def _cos_ppm(sims: np.ndarray) -> np.ndarray:
    """Vectorized half-away r6 cosine in integer PPM units: the exact
    quantity emb_neardup's boundary convention already pins cross-engine
    (ROUND(list_cosine_similarity(..), 6) * 1e6 in DuckDB)."""
    return np.where(sims >= 0,
                    np.floor(sims * 1e6 + 0.5),
                    -np.floor(-sims * 1e6 + 0.5)).astype(np.int64)


def _lof_edges_broadcast(emb_ds, kk: int, id_col: str, emb_col: str):
    """Exact kNN edge list (vec_id, neighbor_id, d, rnk) with
    d = 1e6 - r6-cosine-ppm (integer cosine DISTANCE in ppm units);
    corpus matrix broadcast once (the knn_graph exact-path shape)."""
    import ray

    ids_list, mats = [], []
    for b in emb_ds.select_columns([id_col, emb_col]).iter_batches(
        batch_size=8192, batch_format="pyarrow"
    ):
        ids_list.append(np.asarray(b.column(id_col).to_pylist(),
                                   dtype=np.int64))
        mats.append(_normalize(_batch_matrix(b, emb_col)))
    corpus_ids = np.concatenate(ids_list) if ids_list else np.empty(0, np.int64)
    corpus = np.vstack(mats) if mats else np.empty((0, 0))
    ref = ray.put((corpus_ids, corpus))

    def _topk(batch: pa.Table) -> pa.Table:
        cids, cmat = ray.get(ref)
        rids = np.asarray(batch.column(id_col).to_pylist(), dtype=np.int64)
        m = _normalize(_batch_matrix(batch, emb_col))
        dmat = 1_000_000 - _cos_ppm(m @ cmat.T)
        out_v, out_n, out_d, out_r = [], [], [], []
        for row, rid in enumerate(rids):
            drow = dmat[row]
            order = np.lexsort((cids, drow))
            order = order[cids[order] != rid][:kk]
            out_v.extend([int(rid)] * len(order))
            out_n.extend(cids[order].tolist())
            out_d.extend(drow[order].tolist())
            out_r.extend(range(1, len(order) + 1))
        return pa.Table.from_arrays(
            [pa.array(out_v, type=pa.int64()),
             pa.array(out_n, type=pa.int64()),
             pa.array(out_d, type=pa.int64()),
             pa.array(out_r, type=pa.int64())],
            names=["vec_id", "neighbor_id", "d", "rnk"],
        )

    return emb_ds.map_batches(_topk, batch_format="pyarrow")


def _lof_edges_ivf(emb_ds, kk: int, id_col: str, emb_col: str,
                   n_clusters: int, n_probe: int, iters: int):
    """Scale path for the LOF edge list: trained-IVF cell cogroups
    (the knn_graph scale-path construction) emitting integer ppm
    cosine distances; EXACT when n_probe == n_clusters (total probe
    coverage -- the path-equivalence test's configuration)."""
    import ray

    centroids = lloyd_codebook(emb_ds, n_clusters, iters, id_col, emb_col)
    cent_ref = ray.put(centroids)
    probe = min(n_probe, n_clusters)

    def _expand(batch: pa.Table) -> pa.Table:
        c = ray.get(cent_ref)
        mat = _batch_matrix(batch, emb_col)
        rids = np.asarray(batch.column(id_col).to_pylist(), dtype=np.int64)
        diff = mat[:, None, :] - c[None, :, :]
        dist = np.einsum("nkd,nkd->nk", diff, diff)
        order = np.argsort(dist, axis=1, kind="stable")[:, :probe]
        packed = _normalize(mat)
        blobs = [packed[i].tobytes() for i in range(len(rids))]
        out_cl, out_id, out_bin, out_mem = [], [], [], []
        for j in range(probe):
            out_cl.extend(order[:, j].tolist())
            out_id.extend(rids.tolist())
            out_bin.extend(blobs)
            out_mem.extend([j == 0] * len(rids))
        return pa.Table.from_arrays(
            [pa.array(out_cl, type=pa.int32()),
             pa.array(out_id, type=pa.int64()),
             pa.array(out_bin, type=pa.binary()),
             pa.array(out_mem, type=pa.bool_())],
            names=["cluster", id_col, "embin", "is_member"],
        )

    def _cell_topk(group: pa.Table) -> pa.Table:
        mem_mask = np.asarray(group.column("is_member").to_pylist())
        ids_all = np.asarray(group.column(id_col).to_pylist(), dtype=np.int64)
        empty = pa.Table.from_arrays(
            [pa.array([], type=pa.int64()), pa.array([], type=pa.int64()),
             pa.array([], type=pa.int64())],
            names=["vec_id", "neighbor_id", "d"])
        if not mem_mask.any():
            return empty
        mat_all = np.vstack([np.frombuffer(b, dtype=np.float64)
                             for b in group.column("embin").to_pylist()])
        m_ids, m_mat = ids_all[mem_mask], mat_all[mem_mask]
        dmat = 1_000_000 - _cos_ppm(mat_all @ m_mat.T)
        out_v, out_n, out_d = [], [], []
        cap = min(kk, len(m_ids))
        for row in range(len(ids_all)):
            drow = dmat[row]
            order = np.lexsort((m_ids, drow))
            order = order[m_ids[order] != ids_all[row]][:cap]
            out_v.extend([int(ids_all[row])] * len(order))
            out_n.extend(m_ids[order].tolist())
            out_d.extend(drow[order].tolist())
        return pa.Table.from_arrays(
            [pa.array(out_v, type=pa.int64()),
             pa.array(out_n, type=pa.int64()),
             pa.array(out_d, type=pa.int64())],
            names=["vec_id", "neighbor_id", "d"],
        )

    cand = (emb_ds.map_batches(_expand, batch_format="pyarrow")
            .groupby("cluster").map_groups(_cell_topk,
                                           batch_format="pyarrow"))

    def _final(group: pa.Table) -> pa.Table:
        vid = group.column("vec_id")[0].as_py()
        nids = np.asarray(group.column("neighbor_id").to_pylist(),
                          dtype=np.int64)
        dd = np.asarray(group.column("d").to_pylist(), dtype=np.int64)
        nids, uniq_idx = np.unique(nids, return_index=True)
        dd = dd[uniq_idx]
        order = np.lexsort((nids, dd))[:kk]
        n = len(order)
        return pa.Table.from_arrays(
            [pa.array([vid] * n, type=pa.int64()),
             pa.array(nids[order].tolist(), type=pa.int64()),
             pa.array(dd[order].tolist(), type=pa.int64()),
             pa.array(list(range(1, n + 1)), type=pa.int64())],
            names=["vec_id", "neighbor_id", "d", "rnk"],
        )

    return cand.groupby("vec_id").map_groups(_final, batch_format="pyarrow")


def lof_outliers(emb_ds, k: int = 5, id_col: str = "vec_id",
                 emb_col: str = "embedding", broadcast_rows: int = 200_000,
                 n_clusters: int = 16, n_probe: int = 4, iters: int = 2):
    """Local Outlier Factor (Breunig et al. 2000) over the embedding
    column -- DENSITY-based outlier detection, the curation complement
    of ``emb_norm_outliers`` (magnitude) and ``semdedup`` (redundancy):
    LOF >> 1 flags vectors whose local density is far below their
    neighbors' (mislabeled/garbage embeddings), LOF ~ 1 is inlier.

    Variant pinned here (the oracle's twin, integer-exact throughout):

    - distance d(p,o) = 1e6 - round6(cos(p,o))*1e6, an INTEGER ppm
      cosine distance (reuses the r6-cosine boundary convention the
      emb_neardup family already pins cross-engine);
    - N_k(p) = the exact rank-1..k neighbor set under (d, neighbor_id)
      order (no tie expansion -- deterministic both engines);
    - reach_k(p,o) = max(kdist(o), d(p,o), 1) -- the 1-ppm floor
      removes the classic LOF duplicate-point singularity;
    - lrd_ppm(p)  = round(k * 1e12 / sum_o reach_k(p,o))  (int64);
    - LOF(p)      = round6(sum_o lrd_ppm(o) / (k * lrd_ppm(p))).

    Scale shape: edge construction is SIZE-GATED like ``knn_graph``
    (corpus-matrix broadcast below ``broadcast_rows``, trained-IVF
    probe cogroups above -- exact at n_probe == n_clusters); the LOF
    algebra itself is ALWAYS distributed and collects nothing: kdist
    attach = one hash join at edge grain, lrd = one combiner-reduced
    grouped sum, neighbor-lrd attach = one more join + grouped sum,
    finish = one point-grain join. All operands integer until the two
    final divisions, so the oracle matches bit-for-bit.

    Output: (vec_id, lrd_ppm, lof r6) sorted by vec_id.
    """
    from .agg import grouped_agg
    from .joins import checkpointed_join, default_num_partitions

    n = emb_ds.count()
    kk = min(k, max(0, n - 1))
    if kk == 0:
        import ray.data as rd
        return rd.from_arrow(pa.Table.from_arrays(
            [pa.array([], type=pa.int64()), pa.array([], type=pa.int64()),
             pa.array([], type=pa.float64())],
            names=["vec_id", "lrd_ppm", "lof"]))

    if n <= broadcast_rows:
        # bound: gated at broadcast_rows vectors (knn_graph exact twin)
        edges = _lof_edges_broadcast(emb_ds, kk, id_col, emb_col)
    else:
        edges = _lof_edges_ivf(emb_ds, kk, id_col, emb_col,
                               n_clusters, n_probe, iters)
    edges = edges.materialize()

    parts = default_num_partitions(n)

    # kdist(o) = the rank-k distance; keyed by neighbor_id for the join
    def _kd(batch: pa.Table) -> pa.Table:
        m = batch.filter(pc.equal(batch.column("rnk"), kk))
        return pa.Table.from_arrays(
            [m.column("vec_id"), m.column("d")],
            names=["neighbor_id", "kdist"])

    kd = edges.map_batches(_kd, batch_format="pyarrow")

    slim = edges.select_columns(["vec_id", "neighbor_id", "d"])
    j1 = checkpointed_join(slim, kd, on=("neighbor_id",),
                           num_partitions=parts,
                           left_cols=["vec_id", "neighbor_id", "d"],
                           right_cols=["neighbor_id", "kdist"])

    def _reach(df: pd.DataFrame) -> pd.DataFrame:
        r = np.maximum.reduce([df["kdist"].to_numpy(np.int64),
                               df["d"].to_numpy(np.int64),
                               np.ones(len(df), dtype=np.int64)])
        return pd.DataFrame({"vec_id": df["vec_id"].astype("int64"),
                             "reach": pd.Series(r, dtype="int64")})

    # materialized once: consumed by BOTH lrd projections below (point
    # grain, object store only -- without this the kdist join re-runs)
    sums = grouped_agg(j1.map_batches(_reach, batch_format="pandas"),
                       ["vec_id"], {"sr": ("reach", "sum")},
                       n_buckets=max(4, parts)).materialize()

    def _lrd(keyname):
        def fn(df: pd.DataFrame) -> pd.DataFrame:
            sr = df["sr"].to_numpy(np.float64)
            lrd = np.floor(kk * 1e12 / sr + 0.5).astype(np.int64)
            return pd.DataFrame({keyname: df["vec_id"].astype("int64"),
                                 "lrd_ppm": pd.Series(lrd, dtype="int64")})
        return fn

    lrd_n = sums.map_batches(_lrd("neighbor_id"), batch_format="pandas")
    lrd_v = sums.map_batches(_lrd("vec_id"), batch_format="pandas")

    j2 = checkpointed_join(slim.select_columns(["vec_id", "neighbor_id"]),
                           lrd_n, on=("neighbor_id",),
                           num_partitions=parts,
                           left_cols=["vec_id", "neighbor_id"],
                           right_cols=["neighbor_id", "lrd_ppm"])
    slrd = grouped_agg(j2.map_batches(
        lambda df: pd.DataFrame({"vec_id": df["vec_id"].astype("int64"),
                                 "s": df["lrd_ppm"].astype("int64")}),
        batch_format="pandas"),
        ["vec_id"], {"slrd": ("s", "sum")}, n_buckets=max(4, parts))

    j3 = checkpointed_join(slrd, lrd_v, on=("vec_id",),
                           num_partitions=parts,
                           left_cols=["vec_id", "slrd"],
                           right_cols=["vec_id", "lrd_ppm"])

    def _finish(df: pd.DataFrame) -> pd.DataFrame:
        lof = df["slrd"].to_numpy(np.float64) / (
            kk * df["lrd_ppm"].to_numpy(np.float64))
        lof = np.floor(lof * 1e6 + 0.5) / 1e6  # lof > 0 always
        return pd.DataFrame({"vec_id": df["vec_id"].astype("int64"),
                             "lrd_ppm": df["lrd_ppm"].astype("int64"),
                             "lof": pd.Series(lof, dtype="float64")})

    return j3.map_batches(_finish, batch_format="pandas").sort("vec_id")
