"""Deduplication operators for training-data pipelines.

The reference only names dedup (an MD5-12 filename prefix with no actual
skip, Lib/file_utils.py:24-30); a 100 TB corpus engine needs the real
thing. All operators are Dataset -> Dataset and streaming:

  exact_dedup        hash-partition on a content hash + per-group min-id
  first_per_group    keep first row per key under an explicit order
  minhash signatures shingle -> minhash -> LSH band explode -> band groupby
  simhash_neardup    64-bit simhash, banded (pigeonhole) candidate pairs
  verified minhash   candidate pairs hash-joined back to texts, exact
                     Jaccard verify, then min-label propagation to pick
                     survivors (connected components via iterated groupby)

Partitioning assumptions are stated per function; the only all-to-all
exchanges are the keyed groupbys on (hash) / (band key) -- both uniform
keys by construction, so no salt is needed.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.hashing import (
    MinHasher,
    band_keys,
    jaccard,
    char_shingles,
    shingle_hashes,
    simhash64,
    simhash_bands,
)
from ..functions.rounding import round_half_away
from ..functions.text_stats import sha1_64


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------

def add_content_hash(batch: pa.Table, text_col: str = "text", out_col: str = "content_hash") -> pa.Table:
    hashes = [sha1_64(t) for t in batch.column(text_col).to_pylist()]
    return batch.append_column(out_col, pa.array(hashes, type=pa.uint64()))


def exact_dedup(ds, text_col: str = "text", id_col: str = "doc_id",
                n_buckets: int = 256):
    """Keep, per distinct text, the row with the smallest id.

    Keyed shuffle on ``content_hash % n_buckets`` (uniform 64-bit hash;
    the text itself never becomes a shuffle key); within each bucket one
    vectorized sort + drop_duplicates handles every hash group at once.
    """
    import pandas as pd

    def _hash_bucket(batch: pa.Table) -> pa.Table:
        b = add_content_hash(batch, text_col)
        bucket = pc.cast(
            pc.bit_wise_and(b.column("content_hash"), pa.scalar(n_buckets - 1, pa.uint64())),
            pa.int32(),
        )
        return b.append_column("bucket", bucket)

    def _keep_min(group: pd.DataFrame) -> pd.DataFrame:
        # Dedup on the TEXT, not the truncated hash: two distinct texts
        # colliding in 64 bits land in the same bucket but must both
        # survive (birthday-bound hazard at 10^10+ docs). The hash leads
        # the sort key so string comparisons only occur between
        # hash-equal rows.
        out = group.sort_values(["content_hash", text_col, id_col]).drop_duplicates(
            ["content_hash", text_col]
        )
        return out.drop(columns=["content_hash", "bucket"])

    hashed = ds.map_batches(_hash_bucket, batch_format="pyarrow")
    return hashed.groupby("bucket").map_groups(_keep_min, batch_format="pandas")


def first_per_group(ds, key: str, order_cols: Sequence[str], n_buckets: int = 256):
    """Per-group first row under an explicit sort order (dedup-by-key).
    Bucketed: one shuffle on hash(key), one vectorized
    sort+drop_duplicates per bucket."""
    import pandas as pd

    def _bucket(batch: pa.Table) -> pa.Table:
        buckets = [sha1_64(str(v)) % n_buckets for v in batch.column(key).to_pylist()]
        return batch.append_column("bucket", pa.array(buckets, type=pa.int32()))

    def _first(group: pd.DataFrame) -> pd.DataFrame:
        out = group.sort_values([key, *order_cols]).drop_duplicates(key)
        return out.drop(columns=["bucket"])

    return ds.map_batches(_bucket, batch_format="pyarrow").groupby("bucket").map_groups(
        _first, batch_format="pandas"
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

class MinHashStage:
    """Task stage: text -> minhash signature (+ precomputed band keys).

    Hash-permutation parameters derive from the fixed seed only, so the
    instance is constructed ONCE on the driver and pickled to plain
    tasks -- an actor pool here only added per-query worker spin-up
    (~2-3 s measured) for state that costs microseconds to build.
    """

    def __init__(self, n_hashes: int = 64, bands: int = 16, k: int = 5,
                 text_col: str = "text", id_col: str = "doc_id", seed: int = 42):
        self.mh = MinHasher(n_hashes=n_hashes, seed=seed)
        self.bands = bands
        self.k = k
        self.text_col = text_col
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self.text_col).to_pylist()
        ids = batch.column(self.id_col)
        sigs = [self.mh.signature(shingle_hashes(t, self.k)) for t in texts]
        sig_arr = pa.array([s.tolist() for s in sigs], type=pa.list_(pa.uint64()))
        return pa.Table.from_arrays([ids.combine_chunks() if isinstance(ids, pa.ChunkedArray) else ids, sig_arr],
                                    names=[self.id_col, "minhash"])


def minhash_signatures(ds, n_hashes: int = 64, bands: int = 16, k: int = 5,
                       text_col: str = "text", id_col: str = "doc_id", seed: int = 42):
    return ds.map_batches(
        MinHashStage(n_hashes=n_hashes, bands=bands, k=k,
                     text_col=text_col, id_col=id_col, seed=seed),
        batch_format="pyarrow",
    )


def _explode_bands(batch: pa.Table, bands: int, id_col: str) -> pa.Table:
    ids, band_ids, keys = [], [], []
    for doc, sig in zip(batch.column(id_col).to_pylist(), batch.column("minhash").to_pylist()):
        for bi, bk in enumerate(band_keys(np.asarray(sig, dtype=np.uint64), bands)):
            ids.append(doc)
            band_ids.append(bi)
            keys.append(bk)
    return pa.Table.from_arrays(
        [pa.array(ids), pa.array(band_ids, type=pa.int32()), pa.array(keys, type=pa.uint64())],
        names=[id_col, "band_id", "band_key"],
    )


def lsh_candidate_pairs(ds, n_hashes: int = 64, bands: int = 16, k: int = 5,
                        text_col: str = "text", id_col: str = "doc_id", seed: int = 42,
                        n_buckets: int = 256):
    """Distinct candidate pairs (id_a < id_b) sharing >= 1 LSH band.

    shingle -> minhash (actor pool) -> band explode -> ONE keyed shuffle
    on ``band_key % n_buckets`` (each group call handles a whole bucket
    of band-buckets, pairing within each band vectorized-ish) -> distinct
    within a second bucketed groupby using Arrow's native group_by.

    Grouping by a hash bucket instead of the raw (band_id, band_key)
    pair turns ~n_docs*bands tiny map_groups calls into n_buckets calls;
    the shuffle volume is identical. Expected bucket size is uniform
    (mixed 64-bit band keys); a pathological band bucket means the
    corpus genuinely contains a giant near-duplicate cluster and the
    pair blow-up is the true output size.
    """
    sigs = minhash_signatures(ds, n_hashes, bands, k, text_col, id_col, seed)
    exploded = sigs.map_batches(
        lambda b: _explode_bands(b, bands, id_col), batch_format="pyarrow"
    )

    def _add_bucket(batch: pa.Table) -> pa.Table:
        bucket = pc.cast(
            pc.bit_wise_and(batch.column("band_key"), pa.scalar(n_buckets - 1, pa.uint64())),
            pa.int32(),
        )
        return batch.append_column("bucket", bucket)

    def _pairs_in_bucket(group: pa.Table) -> pa.Table:
        g = group.sort_by(
            [("band_id", "ascending"), ("band_key", "ascending"), (id_col, "ascending")]
        )
        bids = g.column("band_id").to_pylist()
        keys = g.column("band_key").to_pylist()
        ids = g.column(id_col).to_pylist()
        a, b = [], []
        start = 0
        n = len(ids)
        for i in range(1, n + 1):
            if i == n or bids[i] != bids[start] or keys[i] != keys[start]:
                members = sorted(set(ids[start:i]))
                for x in range(len(members)):
                    for y in range(x + 1, len(members)):
                        a.append(members[x])
                        b.append(members[y])
                start = i
        id_type = group.schema.field(id_col).type
        return pa.Table.from_arrays(
            [pa.array(a, type=id_type), pa.array(b, type=id_type)], names=["id_a", "id_b"]
        )

    bucketed = exploded.map_batches(_add_bucket, batch_format="pyarrow")
    pairs = bucketed.groupby("bucket").map_groups(_pairs_in_bucket, batch_format="pyarrow")
    return distinct_rows(pairs, ["id_a", "id_b"], n_buckets=n_buckets)


def distinct_rows(ds, cols: Sequence[str], n_buckets: int = 256):
    """DISTINCT over ``cols``: bucket by a row hash, then Arrow-native
    group_by within each bucket (one call per bucket, not per key)."""

    def _add_bucket(batch: pa.Table) -> pa.Table:
        h = np.zeros(batch.num_rows, dtype=np.uint64)
        for c in cols:
            col = batch.column(c)
            if pa.types.is_integer(col.type):
                # vectorized splitmix64 -- bucket assignment only needs
                # within-run determinism, not the sha1 convention
                z = np.asarray(
                    col.combine_chunks().to_numpy(zero_copy_only=False)
                    if isinstance(col, pa.ChunkedArray)
                    else col.to_numpy(zero_copy_only=False)
                ).astype(np.uint64)
                with np.errstate(over="ignore"):
                    z = z + np.uint64(0x9E3779B97F4A7C15)
                    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
                    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
                col_h = z ^ (z >> np.uint64(31))
            else:
                col_h = np.asarray([sha1_64(str(v)) for v in col.to_pylist()],
                                   dtype=np.uint64)
            with np.errstate(over="ignore"):
                h = h * np.uint64(1099511628211) + col_h
        return batch.append_column(
            "bucket", pa.array((h % np.uint64(n_buckets)).astype(np.int32))
        )

    def _distinct(group: pa.Table) -> pa.Table:
        return group.select(list(cols)).group_by(list(cols)).aggregate([])

    bucketed = ds.map_batches(_add_bucket, batch_format="pyarrow")
    return bucketed.groupby("bucket").map_groups(_distinct, batch_format="pyarrow")


def _pair_texts(pairs_ds, docs_ds, text_col: str, id_col: str,
                num_partitions: Optional[int],
                broadcast_bytes: int) -> "object":
    """Attach text_a/text_b to candidate pairs -- size-gated like a
    broadcast-vs-shuffle join:

      - corpus text volume (sampled-avg x count) under ``broadcast_bytes``:
        ray.put one id->text dict, attach per batch (no joins).
      - above the gate: two hash joins (pair -> text_a, pair -> text_b);
        the corpus is never broadcast.

    num_partitions defaults to half the cluster CPUs: the join's
    hash-shuffle aggregators each need a slot, and over-partitioning a
    small cluster deadlocks the executor.
    """
    import ray

    n = docs_ds.count()
    sample = docs_ds.take(min(50, n)) if n else []
    avg = sum(len(r[text_col]) for r in sample) / max(1, len(sample))
    if n * avg <= broadcast_bytes:
        texts = {}
        for b in docs_ds.select_columns([id_col, text_col]).iter_batches(
            batch_size=8192, batch_format="pyarrow"
        ):
            texts.update(zip(b.column(id_col).to_pylist(),
                             b.column(text_col).to_pylist()))
        ref = ray.put(texts)

        def _attach(batch: pa.Table) -> pa.Table:
            t = ray.get(ref)
            ta = [t[i] for i in batch.column("id_a").to_pylist()]
            tb = [t[i] for i in batch.column("id_b").to_pylist()]
            return batch.append_column(
                "text_a", pa.array(ta, type=pa.string())
            ).append_column("text_b", pa.array(tb, type=pa.string()))

        return pairs_ds.map_batches(_attach, batch_format="pyarrow")

    if num_partitions is None:
        cpus = int(ray.cluster_resources().get("CPU", 4)) if ray.is_initialized() else 4
        num_partitions = max(2, cpus // 2)
    texts_ds = docs_ds.select_columns([id_col, text_col])
    a = pairs_ds.join(texts_ds, join_type="inner", num_partitions=num_partitions,
                      on=("id_a",), right_on=(id_col,))
    a = a.rename_columns({text_col: "text_a"}) if text_col != "text_a" else a
    b = a.join(texts_ds, join_type="inner", num_partitions=num_partitions,
               on=("id_b",), right_on=(id_col,))
    return b.rename_columns({text_col: "text_b"}) if text_col != "text_b" else b


def verify_pairs_jaccard(pairs_ds, docs_ds, threshold: float = 0.8,
                         k: int = 5, text_col: str = "text", id_col: str = "doc_id",
                         num_partitions: Optional[int] = None,
                         broadcast_bytes: int = 256 * 1024 * 1024):
    """Exact-Jaccard verification of candidate pairs; pair texts attach
    via the size-gated broadcast-or-join helper (_pair_texts). Returns
    (id_a, id_b, jaccard) rows >= threshold."""
    b = _pair_texts(pairs_ds, docs_ds, text_col, id_col, num_partitions,
                    broadcast_bytes)

    def _verify(batch: pa.Table) -> pa.Table:
        ja = [
            jaccard(char_shingles(ta, k), char_shingles(tb, k))
            for ta, tb in zip(batch.column("text_a").to_pylist(), batch.column("text_b").to_pylist())
        ]
        out = batch.select(["id_a", "id_b"]).append_column(
            "jaccard", pa.array([round_half_away(j, 6) for j in ja], type=pa.float64())
        )
        return out.filter(pc.greater_equal(out.column("jaccard"), pa.scalar(threshold)))

    return b.map_batches(_verify, batch_format="pyarrow")


def _drop_set_filter(docs_ds, drop, id_col: str):
    """Filter out rows whose id is in the broadcast drop set."""
    import ray

    drop_ref = ray.put(drop)

    def _filter(batch: pa.Table) -> pa.Table:
        d = ray.get(drop_ref)
        keep = [i not in d for i in batch.column(id_col).to_pylist()]
        return batch.filter(pa.array(keep, type=pa.bool_()))

    return docs_ds.map_batches(_filter, batch_format="pyarrow")


def _driver_union_find_labels(edges) -> dict:
    """Driver-side union-find over a SMALL edge list (below the size
    gate); union-by-min-value makes every root the component minimum,
    so the returned node -> root map IS the min-label table."""
    parent: dict = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]  # path halving
            x = parent[x]
        return x

    for batch in edges.iter_batches(batch_size=65536, batch_format="pyarrow"):
        for a, b in zip(batch.column("id_a").to_pylist(),
                        batch.column("id_b").to_pylist()):
            ra, rb = find(a), find(b)
            if ra != rb:
                # union by value: smaller id becomes the root
                if rb < ra:
                    ra, rb = rb, ra
                parent[rb] = ra
    return {n: find(n) for n in parent}


def _driver_union_find_drop(edges) -> set:
    """Drop set (non-minimal component members) from the driver path:
    exact same survivors as the distributed propagation."""
    return {n for n, l in _driver_union_find_labels(edges).items() if l != n}


def component_labels(pairs_ds, max_rounds: int = 10,
                     num_partitions: Optional[int] = None,
                     driver_threshold: int = 2_000_000):
    """Connected-component labels over an (id_a, id_b) pair Dataset:
    one row (node, label) per distinct endpoint, label = the component's
    minimum id. The clustering twin of ``survivors_from_pairs`` (which
    keeps only label == node) -- use this when the caller needs the
    cluster assignment itself (dup-cluster audits, canonical-doc maps).

    Same size-gated hybrid: small edge lists run driver union-find;
    above the gate the labels come from the distributed iterated
    min-label propagation (never collecting edges on the driver).
    """
    import pandas as pd
    import ray.data as rd

    edges = pairs_ds.select_columns(["id_a", "id_b"]).materialize()
    n_edges = edges.count()
    if n_edges == 0:
        return rd.from_pandas(pd.DataFrame(
            {"node": pd.Series(dtype="int64"),
             "label": pd.Series(dtype="int64")}))
    if n_edges <= driver_threshold:
        lab = _driver_union_find_labels(edges)
        nodes = sorted(lab)
        return rd.from_pandas(pd.DataFrame(
            {"node": pd.array(nodes, dtype="int64"),
             "label": pd.array([lab[n] for n in nodes], dtype="int64")}))
    return _distributed_labels(edges, max_rounds, num_partitions)


def survivors_from_pairs(docs_ds, verified_pairs_ds, id_col: str = "doc_id",
                         max_rounds: int = 10, num_partitions: Optional[int] = None,
                         driver_threshold: int = 2_000_000):
    """Connected components over the verified duplicate pairs; survivors
    = docs whose component label is their own id (the component minimum).

    Size-gated hybrid, the same shape as a broadcast-vs-shuffle join
    choice:

      - edge count <= ``driver_threshold``: driver union-find with path
        halving (a few million edges is tens of MB -- iterating them on
        the driver is cheaper than multi-round distributed joins, whose
        per-round fixed cost dominates at this size).
      - above the gate (web corpora are 30-50% near-dup, so at corpus
        scale the edge list is billions of rows): DISTRIBUTED iterated
        min-label propagation -- per round, two hash joins (edge endpoint
        -> current label) plus one bucketed groupby-min over emitted
        messages; rounds needed = component diameter (LSH dup clusters
        are near-cliques, so a handful); convergence by an
        order-independent label-table checksum carried across rounds.
        The edge list is never collected on the driver.

    The final non-survivor filter broadcasts the drop-ID set when small,
    else hash-anti-joins against the label table. Both paths produce
    identical survivors (tested against each other).
    """
    import ray

    edges = verified_pairs_ds.select_columns(["id_a", "id_b"]).materialize()
    n_edges = edges.count()
    if n_edges == 0:
        return docs_ds

    if n_edges <= driver_threshold:
        return _drop_set_filter(docs_ds, _driver_union_find_drop(edges), id_col)

    if num_partitions is None:
        cpus = int(ray.cluster_resources().get("CPU", 4)) if ray.is_initialized() else 4
        num_partitions = max(2, cpus // 2)

    labels = _distributed_labels(edges, max_rounds, num_partitions)

    # non-survivors: label != node
    drop_ds = labels.map_batches(
        lambda b: b.filter(pc.not_equal(b.column("label"), b.column("node"))),
        batch_format="pyarrow",
    ).select_columns(["node"]).materialize()
    n_drop = drop_ds.count()

    if n_drop <= 1_000_000:  # broadcast path: ship the key set once
        return _drop_set_filter(
            # bound: gated at 1M drop keys (broadcast path; anti-join above)
            docs_ds, set(r["node"] for r in drop_ds.iter_rows()), id_col
        )

    # scale path: hash anti-join (left join + null filter on the marker)
    marked = drop_ds.map_batches(
        lambda b: b.append_column("__dup", pa.array([1] * b.num_rows, pa.int8())),
        batch_format="pyarrow",
    )
    joined = docs_ds.join(marked, join_type="left_outer",
                          num_partitions=num_partitions,
                          on=(id_col,), right_on=("node",))
    return joined.map_batches(
        lambda b: b.filter(pc.is_null(b.column("__dup"))).drop_columns(["__dup"]),
        batch_format="pyarrow",
    )


def _distributed_labels(edges, max_rounds: int = 10,
                        num_partitions: Optional[int] = None):
    """Iterated distributed min-label propagation over a materialized
    (id_a, id_b) edge Dataset; returns the converged (node, label)
    Dataset. Per round: two hash joins (endpoint -> current label), one
    bucketed groupby-min over the emitted messages; convergence via an
    order-independent label checksum. Edges never touch the driver."""
    import numpy as np
    import ray

    from .agg import grouped_agg

    if num_partitions is None:
        cpus = int(ray.cluster_resources().get("CPU", 4)) if ray.is_initialized() else 4
        num_partitions = max(2, cpus // 2)

    def _cc(col):
        return col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col

    # initial labels: every endpoint labels itself (grouped-min dedups)
    def _endpoints(batch: pa.Table) -> pa.Table:
        ids = pa.concat_arrays([_cc(batch.column("id_a")), _cc(batch.column("id_b"))])
        return pa.Table.from_arrays([ids, ids], names=["node", "label"])

    def _arrow(ds):
        # grouped_agg emits pandas blocks; union/join peers must share the
        # Arrow block type
        return ds.map_batches(lambda b: b, batch_format="pyarrow")

    labels = _arrow(grouped_agg(
        edges.map_batches(_endpoints, batch_format="pyarrow"),
        ["node"], {"label": ("label", "min")},
    )).materialize()

    def _messages(batch: pa.Table) -> pa.Table:
        # edge (a, b) with labels (la, lb): both endpoints receive min(la, lb)
        a = _cc(batch.column("id_a"))
        b = _cc(batch.column("id_b"))
        la = np.asarray(batch.column("label_a").to_pylist(), dtype=object)
        lb = np.asarray(batch.column("label_b").to_pylist(), dtype=object)
        m = pa.array(np.minimum(la, lb))
        return pa.Table.from_arrays(
            [pa.concat_arrays([a, b]), pa.concat_arrays([m, m])],
            names=["node", "label"],
        )

    # convergence: order-independent checksum over (node, label) rows
    # (emitted as wrapped int64 -- sum equality mod 2^64 is preserved and
    # Arrow/Ray aggregate int64 natively); carried across rounds so each
    # round pays ONE checksum pass, not two
    def _ck(batch: pa.Table) -> pa.Table:
        s = np.uint64(0)
        with np.errstate(over="ignore"):
            for n, l in zip(batch.column("node").to_pylist(),
                            batch.column("label").to_pylist()):
                s += np.uint64(sha1_64(f"{n}\x00{l}"))
        return pa.Table.from_arrays(
            [pa.array([int(s.astype(np.int64))], type=pa.int64())], names=["ck"]
        )

    def _checksum(ds):
        return int(ds.map_batches(_ck, batch_format="pyarrow").sum("ck") or 0) & ((1 << 64) - 1)

    prev_ck = _checksum(labels)
    for _ in range(max_rounds):
        la = edges.join(labels, join_type="inner", num_partitions=num_partitions,
                        on=("id_a",), right_on=("node",))
        la = la.rename_columns({"label": "label_a"})
        lab = la.join(labels, join_type="inner", num_partitions=num_partitions,
                      on=("id_b",), right_on=("node",))
        lab = lab.rename_columns({"label": "label_b"})
        msgs = lab.map_batches(_messages, batch_format="pyarrow")
        # self-message keeps isolated-in-this-round labels; groupby-min merges
        new_labels = _arrow(grouped_agg(
            msgs.union(labels), ["node"], {"label": ("label", "min")}
        )).materialize()

        new_ck = _checksum(new_labels)
        labels = new_labels
        if new_ck == prev_ck:
            break
        prev_ck = new_ck

    return labels


def minhash_dedup(docs_ds, threshold: float = 0.8, n_hashes: int = 64,
                  bands: int = 16, k: int = 5, text_col: str = "text",
                  id_col: str = "doc_id", seed: int = 42):
    """Full near-dup removal: LSH candidates -> Jaccard verify -> survivors."""
    pairs = lsh_candidate_pairs(docs_ds, n_hashes, bands, k, text_col, id_col, seed)
    verified = verify_pairs_jaccard(pairs, docs_ds, threshold, k, text_col, id_col)
    return survivors_from_pairs(docs_ds, verified, id_col)


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def simhash_signatures(ds, text_col: str = "text", id_col: str = "doc_id"):
    def _sig(batch: pa.Table) -> pa.Table:
        sigs = [simhash64(t) for t in batch.column(text_col).to_pylist()]
        ids = batch.column(id_col)
        return pa.Table.from_arrays(
            [ids.combine_chunks() if isinstance(ids, pa.ChunkedArray) else ids,
             pa.array(sigs, type=pa.uint64())],
            names=[id_col, "simhash"],
        )

    return ds.map_batches(_sig, batch_format="pyarrow")


def simhash_neardup_pairs(ds, max_hamming: int = 3, bands: int = 4,
                          text_col: str = "text", id_col: str = "doc_id"):
    """Near-dup pairs by SimHash banding: pairs within hamming < bands
    share a band (pigeonhole); band-bucket groupby then exact hamming
    filter inside the group. Returns (id_a, id_b, hamming)."""
    from ..functions.hashing import hamming64

    sigs = simhash_signatures(ds, text_col, id_col)

    def _explode(batch: pa.Table) -> pa.Table:
        ids, band_ids, keys, hs = [], [], [], []
        for doc, h in zip(batch.column(id_col).to_pylist(), batch.column("simhash").to_pylist()):
            for bi, bk in enumerate(simhash_bands(int(h), bands)):
                ids.append(doc)
                band_ids.append(bi)
                keys.append(bk)
                hs.append(h)
        return pa.Table.from_arrays(
            [pa.array(ids), pa.array(band_ids, type=pa.int32()),
             pa.array(keys, type=pa.uint64()), pa.array(hs, type=pa.uint64())],
            names=[id_col, "band_id", "band_key", "simhash"],
        )

    def _pairs(group: pa.Table) -> pa.Table:
        rows = sorted(
            set(zip(group.column(id_col).to_pylist(), group.column("simhash").to_pylist()))
        )
        a, b, d = [], [], []
        for i in range(len(rows)):
            for j in range(i + 1, len(rows)):
                dist = hamming64(int(rows[i][1]), int(rows[j][1]))
                if dist <= max_hamming:
                    a.append(rows[i][0])
                    b.append(rows[j][0])
                    d.append(dist)
        return pa.Table.from_arrays(
            [pa.array(a), pa.array(b), pa.array(d, type=pa.int32())],
            names=["id_a", "id_b", "hamming"],
        )

    exploded = sigs.map_batches(_explode, batch_format="pyarrow")
    pairs = exploded.groupby(["band_id", "band_key"]).map_groups(_pairs, batch_format="pyarrow")
    return distinct_rows(pairs, ["id_a", "id_b", "hamming"])


def verify_pairs_ngram_jaccard(pairs_ds, docs_ds, threshold: float = 0.5,
                               n: int = 3, text_col: str = "text",
                               id_col: str = "doc_id",
                               num_partitions: Optional[int] = None,
                               broadcast_bytes: int = 256 * 1024 * 1024):
    """Word-n-gram Jaccard verification (the n-gram flavor of near-dup;
    char-shingle flavor is verify_pairs_jaccard). Same size-gated
    broadcast-or-join text attach; returns (id_a, id_b, ngram_jaccard r6)
    rows >= threshold."""
    from ..functions.hashing import word_ngrams

    b = _pair_texts(pairs_ds, docs_ds, text_col, id_col, num_partitions,
                    broadcast_bytes)

    def _verify(batch: pa.Table) -> pa.Table:
        ja = [
            jaccard(word_ngrams(ta, n), word_ngrams(tb, n))
            for ta, tb in zip(batch.column("text_a").to_pylist(),
                              batch.column("text_b").to_pylist())
        ]
        out = batch.select(["id_a", "id_b"]).append_column(
            "ngram_jaccard", pa.array([round_half_away(j, 6) for j in ja], type=pa.float64())
        )
        return out.filter(pc.greater_equal(out.column("ngram_jaccard"), pa.scalar(threshold)))

    return b.map_batches(_verify, batch_format="pyarrow")


def verify_pairs_containment(pairs_ds, docs_ds, threshold: float = 0.5,
                             n: int = 3, text_col: str = "text",
                             id_col: str = "doc_id",
                             num_partitions: Optional[int] = None,
                             broadcast_bytes: int = 256 * 1024 * 1024):
    """Word-n-gram CONTAINMENT verification: |A ∩ B| / min(|A|, |B|)
    over distinct word-n-gram sets. Containment (Broder 1997) is the
    near-dup measure for subset/superset relationships -- a short doc
    fully embedded in a long one scores ~1.0 here but low on Jaccard,
    which is why excerpt/quotation dedup uses it instead.

    Same size-gated text attach as verify_pairs_ngram_jaccard; pairs
    where either side has no n-grams are dropped (undefined ratio),
    matching the oracle's inner join on the per-doc gram counts.

    Returns (id_a, id_b, containment r6) rows >= threshold.
    """
    from ..functions.hashing import word_ngrams

    b = _pair_texts(pairs_ds, docs_ds, text_col, id_col, num_partitions,
                    broadcast_bytes)

    def _verify(batch: pa.Table) -> pa.Table:
        ids_a, ids_b, vals = [], [], []
        for ia, ib, ta, tb in zip(batch.column("id_a").to_pylist(),
                                  batch.column("id_b").to_pylist(),
                                  batch.column("text_a").to_pylist(),
                                  batch.column("text_b").to_pylist()):
            ga, gb = word_ngrams(ta, n), word_ngrams(tb, n)
            denom = min(len(ga), len(gb))
            if denom == 0:
                continue
            c = round_half_away(len(ga & gb) / denom, 6)
            if c >= threshold:
                ids_a.append(ia)
                ids_b.append(ib)
                vals.append(c)
        return pa.Table.from_arrays(
            [pa.array(ids_a, type=pa.int64()), pa.array(ids_b, type=pa.int64()),
             pa.array(vals, type=pa.float64())],
            names=["id_a", "id_b", "containment"],
        )

    return b.map_batches(_verify, batch_format="pyarrow")


def verify_pairs_tfidf_cosine(pairs_ds, docs_ds, threshold: float = 0.2,
                              text_col: str = "text", id_col: str = "doc_id",
                              num_partitions: Optional[int] = None,
                              broadcast_bytes: int = 256 * 1024 * 1024,
                              max_vocab: int = 2_000_000):
    """TF-IDF weighted cosine verification of candidate pairs: the
    similarity measure that discounts stop-word overlap (raw-count tf,
    idf = ln(N/df) over whitespace tokens). Document frequencies come
    from one combiner-reduced pass (distinct tokens per doc per batch,
    keyed sum); only the TOP-``max_vocab`` tokens by df reach the
    driver (distributed sort + limit -- the web-corpus vocabulary is
    billions of tokens under Heaps' law, so the broadcast dict must be
    bounded). Tail tokens (df below the kept minimum df_V) take the
    FLOOR idf ln(N/df_V): df_V upper-bounds their true df, so ln(N/df_V)
    lower-bounds their true idf -- they are slightly underweighted,
    never overweighted, and a boundary token scores identically whether
    kept or floored (its df == df_V either way). Texts attach with the
    size-gated broadcast-or-join.

    Returns (id_a, id_b, tfidf_cosine r6) rows >= threshold.
    """
    import math
    from collections import Counter

    import ray

    n_docs = docs_ds.count()

    def df_part(batch: pa.Table) -> "pd.DataFrame":
        import pandas as pd

        c: Counter = Counter()
        for t in batch.column(text_col).to_pylist():
            c.update(set(t.split()))
        return pd.DataFrame({"tok": list(c.keys()),
                             "df": list(c.values())})

    from .agg import grouped_agg

    df_ds = grouped_agg(
        docs_ds.map_batches(df_part, batch_format="pyarrow"),
        ["tok"], {"df": ("df", "sum")}, n_buckets=32)
    # top-V by df: distributed sort, only V rows ever reach the driver
    # bound: max_vocab rows (the top-V cap)
    df_tbl = (df_ds.sort(["df", "tok"], descending=[True, False])
              .limit(max_vocab).to_pandas())
    idf = {t: math.log(n_docs / d)
           for t, d in zip(df_tbl["tok"], df_tbl["df"])}
    if len(df_tbl) == max_vocab:  # vocabulary was truncated: floor the tail
        tail_idf = math.log(n_docs / int(df_tbl["df"].iloc[-1]))
    else:
        tail_idf = None  # full vocabulary kept; every token is exact
    idf_ref = ray.put((idf, tail_idf))

    b = _pair_texts(pairs_ds, docs_ds, text_col, id_col, num_partitions,
                    broadcast_bytes)

    def _score(batch: pa.Table) -> pa.Table:
        idf_map, tail = ray.get(idf_ref)
        cache: dict = {}

        def wvec(i, t):
            v = cache.get(i)
            if v is None:
                tf = Counter(t.split())
                if tail is None:
                    v = {tok: c * idf_map[tok] for tok, c in tf.items()}
                else:
                    v = {tok: c * idf_map.get(tok, tail)
                         for tok, c in tf.items()}
                nrm = math.sqrt(sum(x * x for x in v.values()))
                cache[i] = v = (v, nrm)
            return v

        ids_a, ids_b, vals = [], [], []
        for ia, ib, ta, tb in zip(batch.column("id_a").to_pylist(),
                                  batch.column("id_b").to_pylist(),
                                  batch.column("text_a").to_pylist(),
                                  batch.column("text_b").to_pylist()):
            (wa, na), (wb, nb) = wvec(ia, ta), wvec(ib, tb)
            if na == 0 or nb == 0:
                continue
            if len(wb) < len(wa):
                wa, wb = wb, wa
            dot = sum(w * wb[tok] for tok, w in wa.items() if tok in wb)
            c = round_half_away(dot / (na * nb), 6)
            if c >= threshold:
                ids_a.append(ia)
                ids_b.append(ib)
                vals.append(c)
        return pa.Table.from_arrays(
            [pa.array(ids_a, type=pa.int64()), pa.array(ids_b, type=pa.int64()),
             pa.array(vals, type=pa.float64())],
            names=["id_a", "id_b", "tfidf_cosine"],
        )

    return b.map_batches(_score, batch_format="pyarrow")


def simhash_dedup(docs_ds, max_hamming: int = 3, bands: int = 4,
                  text_col: str = "text", id_col: str = "doc_id"):
    """SimHash near-dup REMOVAL: banded pairs -> min-label components ->
    survivors (same component collapse as minhash_dedup)."""
    pairs = simhash_neardup_pairs(docs_ds, max_hamming, bands, text_col, id_col)
    return survivors_from_pairs(docs_ds, pairs, id_col)


# ---------------------------------------------------------------------------
# sorted-neighborhood (SNM) candidate generation
# ---------------------------------------------------------------------------

def snm_candidate_pairs(docs_ds, skey_len: int = 16, blk_len: int = 4,
                        window: int = 5, text_col: str = "text",
                        id_col: str = "doc_id", n_buckets: int = 16):
    """Sorted-Neighborhood Method candidate pairs (Hernandez & Stolfo,
    SIGMOD'95): records sorted by a cheap surrogate key are compared only
    with the next ``window - 1`` records, turning O(N^2) comparison into
    O(N * w).  The sort key is ``lower(text)[:skey_len]``; the sliding
    window never crosses a *block* (the first ``blk_len`` chars of the
    key), which is what makes the op shuffle-parallel: blocks are
    independent, so the only exchange is ONE keyed shuffle on
    ``hash(blk) % n_buckets``.  Per bucket the window pairs come from a
    vectorized shift-compare (no per-row loop, no per-group loop).

    At 100 TB the block grain is the skew control: ``blk_len`` bounds
    rows per block (lengthen it for hot prefixes); per-block work is
    O(rows * window) and nothing corpus-sized is collected.  Window
    comparisons intentionally do NOT cross block boundaries (classic
    blocked-SNM trade-off; mirrorred exactly by the oracle's
    PARTITION BY blk).

    Output: (blk, id_a, id_b, gap) -- id_a sorts before id_b within the
    block, gap = their distance in the sorted order (1..window-1).
    """
    import pandas as pd

    def keys(batch: pa.Table) -> pa.Table:
        low = pc.utf8_lower(batch.column(text_col))
        # ASCII corpus: codeunit slicing == character slicing (matches
        # DuckDB substring() semantics on this data)
        skey = pc.utf8_slice_codeunits(low, 0, skey_len)
        blk = pc.utf8_slice_codeunits(low, 0, blk_len)
        bucket = pa.array(
            [sha1_64(b) % n_buckets for b in blk.to_pylist()],
            type=pa.int32())
        return pa.Table.from_arrays(
            [blk, skey, batch.column(id_col).combine_chunks(), bucket],
            names=["blk", "skey", id_col, "bucket"])

    def bucket_pairs(df: pd.DataFrame) -> pd.DataFrame:
        g = df.sort_values(["blk", "skey", id_col]).reset_index(drop=True)
        blks = g["blk"].to_numpy()
        ids = g[id_col].to_numpy(dtype=np.int64)
        outs = []
        for j in range(1, window):
            if len(ids) <= j:
                break
            same = blks[j:] == blks[:-j]
            outs.append(pd.DataFrame({
                "blk": blks[:-j][same],
                "id_a": ids[:-j][same],
                "id_b": ids[j:][same],
                "gap": np.full(int(same.sum()), j, dtype=np.int64),
            }))
        if not outs:
            return pd.DataFrame({"blk": pd.Series([], dtype=object),
                                 "id_a": pd.Series([], dtype="int64"),
                                 "id_b": pd.Series([], dtype="int64"),
                                 "gap": pd.Series([], dtype="int64")})
        return pd.concat(outs, ignore_index=True)

    keyed = docs_ds.map_batches(keys, batch_format="pyarrow")
    return keyed.groupby("bucket").map_groups(bucket_pairs,
                                              batch_format="pandas")


def quality_survivors(docs_ds, verified_pairs_ds, quality_col: str = "n_chars",
                      id_col: str = "doc_id",
                      num_partitions: Optional[int] = None,
                      broadcast_drop: int = 1_000_000):
    """Quality-aware near-dup collapse: within each connected component
    of the verified duplicate pairs keep the HIGHEST-quality member
    (quality desc, id asc tie-break) instead of ``survivors_from_pairs``'
    minimum id -- what production curation actually ships (drop the
    truncated mirror, keep the full-length original).

    Shape: component labels from the size-gated ``component_labels``
    hybrid; quality attaches to the label table via ONE distributed
    hash join (labels are pair-endpoint-sized, far smaller than the
    corpus); each cluster's non-representatives come out of a keyed
    groupby (cluster cardinality-bounded groups); the final filter is
    broadcast-set below ``broadcast_drop`` drop keys, hash anti-join
    above -- the survivors_from_pairs gate, same path equivalence.

    Output: the surviving docs_ds rows (all columns).
    """
    import pandas as pd
    import ray

    labels = component_labels(verified_pairs_ds)
    if labels.count() == 0:
        return docs_ds

    if num_partitions is None:
        cpus = int(ray.cluster_resources().get("CPU", 4)) if ray.is_initialized() else 4
        num_partitions = max(2, cpus // 2)

    q = docs_ds.select_columns([id_col, quality_col])
    lq = labels.join(q, join_type="inner", num_partitions=num_partitions,
                     on=("node",), right_on=(id_col,))

    def drops_of_cluster(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values([quality_col, "node"],
                              ascending=[False, True])
        return pd.DataFrame({"node": g["node"].to_numpy(dtype=np.int64)[1:]})

    drop_ds = (lq.groupby("label")
               .map_groups(drops_of_cluster, batch_format="pandas")
               .materialize())
    n_drop = drop_ds.count()

    if n_drop <= broadcast_drop:
        # bound: gated at broadcast_drop keys (anti-join above the gate)
        return _drop_set_filter(
            docs_ds, set(r["node"] for r in drop_ds.iter_rows()), id_col)

    marked = drop_ds.map_batches(
        lambda b: b.append_column("__dup", pa.array([1] * b.num_rows, pa.int8())),
        batch_format="pyarrow",
    )
    joined = docs_ds.join(marked, join_type="left_outer",
                          num_partitions=num_partitions,
                          on=(id_col,), right_on=("node",))
    return joined.map_batches(
        lambda b: b.filter(pc.is_null(b.column("__dup"))).drop_columns(["__dup"]),
        batch_format="pyarrow",
    )


def neardup_degree_hist(docs_ds, verified_pairs_ds, n_buckets: int = 8):
    """Degree histogram of the verified near-dup graph: how many docs
    have exactly k verified duplicates -- the audit that tells a
    template-heavy crawl (hub docs with degree 100+) from organic
    near-dups (degree 1-2), and the empirical input to the
    survivors_from_pairs component-diameter bound.

    Shape: endpoint explode -> per-id degree (keyed combiner on the
    pair-endpoint grain) -> degree histogram (keyed combiner on the
    degree grain). Nothing corpus-sized leaves the cluster.

    Output: (degree, n_docs) sorted by degree.
    """
    import pandas as pd

    from .agg import grouped_agg

    def endpoints(batch: pa.Table) -> pd.DataFrame:
        ids = np.concatenate([
            np.asarray(batch.column("id_a").to_pylist(), dtype=np.int64),
            np.asarray(batch.column("id_b").to_pylist(), dtype=np.int64)])
        g = pd.DataFrame({"id": ids})
        return g.groupby("id", as_index=False).agg(deg=("id", "size"))

    deg = grouped_agg(
        verified_pairs_ds.map_batches(endpoints, batch_format="pyarrow",
                                      batch_size=131072),
        ["id"], {"deg": ("deg", "sum")}, n_buckets=n_buckets)

    def hist_part(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("deg", as_index=False).agg(n_docs=("deg", "size"))
        return g

    hist = grouped_agg(
        deg.map_batches(hist_part, batch_format="pandas",
                        batch_size=131072),
        ["deg"], {"n_docs": ("n_docs", "sum")}, n_buckets=4)

    def cast(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "degree": df["deg"].to_numpy(dtype=np.int64),
            "n_docs": df["n_docs"].to_numpy(dtype=np.int64)})

    return (hist.map_batches(cast, batch_format="pandas",
                             batch_size=1 << 20).sort("degree"))


def minhash_estimator_audit(docs_ds, n_hashes: int = 64, bands: int = 16,
                            k: int = 5, seed: int = 42,
                            text_col: str = "text", id_col: str = "doc_id"):
    """Sketch-quality audit: for every LSH candidate pair, the MinHash
    ESTIMATE of Jaccard (fraction of equal signature components)
    against the EXACT char-k-shingle Jaccard, plus the absolute error
    -- the report that justifies (or re-sizes) the signature length
    before trusting banded dedup at corpus scale.  E[est] = J and
    sd = sqrt(J(1-J)/n_hashes), so n_hashes=64 puts ~95% of pairs
    within +/-0.125.

    Shape: candidates from the oracled LSH chain; pair texts attach via
    the size-gated ``_pair_texts`` helper, and BOTH scores recompute
    per batch from the texts (signatures are deterministic), so no
    signature table is joined or shuffled.

    Output: (id_a, id_b, est_jaccard r6, exact_jaccard r6, abs_err r6).
    """
    import pandas as pd

    pairs = lsh_candidate_pairs(docs_ds, n_hashes, bands, k,
                                text_col, id_col, seed)
    b = _pair_texts(pairs, docs_ds, text_col, id_col, None,
                    256 * 1024 * 1024)
    mh = MinHasher(n_hashes=n_hashes, seed=seed)

    def _score(batch: pa.Table) -> pa.Table:
        ta = batch.column("text_a").to_pylist()
        tb = batch.column("text_b").to_pylist()
        est, exact, err = [], [], []
        for x, y in zip(ta, tb):
            sa = mh.signature(shingle_hashes(x, k))
            sb = mh.signature(shingle_hashes(y, k))
            e = round_half_away(float((sa == sb).mean()), 6)
            j = round_half_away(
                jaccard(char_shingles(x, k), char_shingles(y, k)), 6)
            est.append(e)
            exact.append(j)
            err.append(round_half_away(abs(e - j), 6))
        return pa.Table.from_arrays(
            [batch.column("id_a"), batch.column("id_b"),
             pa.array(est, type=pa.float64()),
             pa.array(exact, type=pa.float64()),
             pa.array(err, type=pa.float64())],
            names=["id_a", "id_b", "est_jaccard", "exact_jaccard",
                   "abs_err"])

    return b.map_batches(_score, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# exact all-pairs similarity join (prefix filtering)
# ---------------------------------------------------------------------------

def prefix_filter_ngram_pairs(docs_ds, threshold: float = 0.3, n: int = 3,
                              text_col: str = "text", id_col: str = "doc_id",
                              broadcast_df: int = 5_000_000,
                              n_buckets: int = 64,
                              verify_broadcast_occ: int = 32_000_000):
    """EXACT set-similarity join: every pair with word-n-gram Jaccard
    >= threshold, found by prefix filtering (Chaudhuri et al. 2006 /
    Bayardo et al. 2007 "All Pairs") instead of approximate LSH
    blocking -- the exact counterpart of the LSH-blocked
    ``verify_pairs_ngram_jaccard`` chain, same measure and rounding.

    Blocking invariant: with every doc's distinct gram set ordered by
    the GLOBAL (df asc, gram asc) order, two sets with J >= t must
    share a token inside their first ``sz - ceil(t*sz) + 1`` tokens,
    so grouping prefix tokens finds every qualifying pair; exact
    verification then removes false candidates. Prefix tokens are the
    RAREST by construction, which keeps per-token groups small (the
    published skew defense of this algorithm).

    Low-selectivity corpora (a tiny vocabulary makes every gram
    common) defeat the rare-prefix defense, so each prefix token also
    carries its POSITION in the doc's df-ordered gram list and the
    candidate stage applies PPJoin's positional + length filters
    (Xiao et al. 2008) vectorized over one hash merge per gram-chunk
    -- see ``pairs_in_group`` -- instead of one pandas merge per gram.

    The gram -> df table broadcasts once below ``broadcast_df`` distinct
    grams; above the gate, gram-occurrence rows hash-join the df table
    and prefixes are selected inside a doc-keyed bucket groupby.
    Returns (id_a, id_b, ngram_jaccard r6) rows >= threshold.
    """
    import math

    import pandas as pd
    import ray

    from ..functions.hashing import word_ngrams
    from ..stages.agg import grouped_agg

    def doc_grams(df: pd.DataFrame) -> pd.DataFrame:
        ids, gs = [], []
        for i, t in zip(df[id_col].to_numpy(), df[text_col].to_numpy()):
            for g in word_ngrams(t, n):
                ids.append(i)
                gs.append(g)
        return pd.DataFrame({id_col: np.asarray(ids, dtype=np.int64),
                             "g": gs, "one": np.ones(len(ids), np.int64)})

    occ = docs_ds.map_batches(doc_grams, batch_format="pandas",
                              batch_size=4096)
    dfreq = grouped_agg(occ, ["g"], {"df": ("one", "sum")},
                        n_buckets=n_buckets).materialize()
    n_grams = dfreq.count()

    def prefix_of(group: pd.DataFrame) -> pd.DataFrame:
        """group = all (gram, df) rows of >=1 docs; emit each doc's
        prefix tokens + (position, set size) -- the PPJoin filter
        payload -- vectorized per doc via cumcount."""
        g = group.sort_values([id_col, "df", "g"], kind="mergesort")
        sz = g.groupby(id_col, sort=False)[id_col].transform("size")
        rank = g.groupby(id_col, sort=False).cumcount()
        p = sz - np.ceil(threshold * sz).astype(np.int64) + 1
        keep = rank < p
        return pd.DataFrame({
            "g": g["g"].to_numpy()[keep],
            id_col: g[id_col].to_numpy()[keep],
            "sz": sz.to_numpy()[keep],
            "pos": rank.to_numpy()[keep].astype(np.int64)})

    if n_grams <= broadcast_df:
        # bound: gated at broadcast_df distinct grams (hash join +
        # doc-keyed bucket groupby above the gate).  to_pandas, not
        # iter_rows: the per-row proxy path costs ~0.6 ms/row.
        dpdf = dfreq.to_pandas()
        dref = ray.put(dict(zip(dpdf["g"], dpdf["df"].astype(np.int64))))

        def prefix_local(df: pd.DataFrame) -> pd.DataFrame:
            dm = ray.get(dref)
            rows = doc_grams(df)
            rows["df"] = rows["g"].map(dm).astype(np.int64)
            return prefix_of(rows)

        prefixes = docs_ds.map_batches(prefix_local, batch_format="pandas",
                                       batch_size=4096)
    else:
        from ..stages.joins import default_num_partitions

        joined = occ.select_columns([id_col, "g"]).join(
            dfreq, join_type="inner",
            num_partitions=default_num_partitions(n_grams),
            on=("g",), right_on=("g",))

        def bucket_docs(df: pd.DataFrame) -> pd.DataFrame:
            b = df[id_col].map(lambda d: sha1_64(str(d)) % n_buckets)
            return df.assign(bucket=b.astype(np.int32))

        prefixes = (joined.map_batches(bucket_docs, batch_format="pandas",
                                       batch_size=131072)
                    .groupby("bucket")
                    .map_groups(lambda g: prefix_of(g.drop(columns=["bucket"])),
                                batch_format="pandas"))

    # per-merge pair-volume cap: bounds the materialized candidate frame
    # regardless of gram-group skew (low-selectivity corpora)
    pair_chunk = 4_000_000
    empty_pairs = pd.DataFrame({"id_a": pd.Series([], dtype="int64"),
                                "id_b": pd.Series([], dtype="int64"),
                                "one": pd.Series([], dtype="int64")})

    def pairs_in_group(group: pd.DataFrame) -> pd.DataFrame:
        """Candidate pairs sharing a prefix gram: ONE hash merge per
        gram-chunk (not one pandas merge per gram -- merge setup alone
        dominates on many-small-group corpora), then PPJoin's filters
        (Xiao et al. 2008) vectorized over the merged frame:

        - length filter: t * max(sz) <= min(sz);
        - positional filter: a pair witnessed by a shared prefix token
          at positions (pa, pb) of the df-ordered gram lists has
          overlap <= min(pa, pb) + min(sz_a - pa, sz_b - pb): shared
          tokens strictly before the witness are bounded by the
          shorter preceding span, the witness plus its suffix by the
          shorter remaining span.  The bound holds at EVERY shared
          token, so a true pair (overlap >= alpha) survives from all
          of its witnesses and per-witness pruning loses nothing.

        alpha = ceil(t/(1+t) * (sz_a + sz_b)) is the overlap J >= t
        requires; the 1e-9 slack keeps float ceil from over-pruning
        exact-integer boundaries (verification is exact regardless).
        """
        g = group.sort_values("g", kind="mergesort", ignore_index=True)
        code = pd.factorize(g["g"], sort=False)[0]
        cnt = np.bincount(code).astype(np.int64)
        multi = cnt[code] >= 2
        if not multi.any():
            return empty_pairs
        g = g.loc[multi].reset_index(drop=True)
        code = pd.factorize(g["g"], sort=False)[0]
        cnt = np.bincount(code).astype(np.int64)
        # chunk grams so each merge materializes <= ~pair_chunk rows
        # (a single gram bigger than the cap still merges alone)
        w = cnt * cnt
        gram_chunk = (np.cumsum(w) - w) // pair_chunk
        row_chunk = gram_chunk[code]
        outs = []
        for c in np.unique(row_chunk):
            sub = g.loc[row_chunk == c]
            m = sub.merge(sub, on="g", suffixes=("_a", "_b"))
            ia = m[f"{id_col}_a"].to_numpy(np.int64)
            ib = m[f"{id_col}_b"].to_numpy(np.int64)
            sa = m["sz_a"].to_numpy(np.int64)
            sb = m["sz_b"].to_numpy(np.int64)
            pos_a = m["pos_a"].to_numpy(np.int64)
            pos_b = m["pos_b"].to_numpy(np.int64)
            keep = ia < ib
            lo = np.minimum(sa, sb)
            hi = np.maximum(sa, sb)
            keep &= threshold * hi <= lo
            alpha = np.ceil(
                threshold * (sa + sb) / (1.0 + threshold) - 1e-9)
            ubound = (np.minimum(pos_a, pos_b)
                      + np.minimum(sa - pos_a, sb - pos_b))
            keep &= ubound >= alpha
            if keep.any():
                outs.append(pd.DataFrame({
                    "id_a": ia[keep], "id_b": ib[keep],
                    "one": np.ones(int(keep.sum()), dtype=np.int64)}))
        if not outs:
            return empty_pairs
        return pd.concat(outs, ignore_index=True).drop_duplicates(
            ["id_a", "id_b"], ignore_index=True)

    def bucket_gram(df: pd.DataFrame) -> pd.DataFrame:
        b = df["g"].map(lambda s: sha1_64(s) % n_buckets)
        return df.assign(bucket=b.astype(np.int32))

    cand = (prefixes.map_batches(bucket_gram, batch_format="pandas",
                                 batch_size=131072)
            .groupby("bucket")
            .map_groups(lambda g: pairs_in_group(g.drop(columns=["bucket"])),
                        batch_format="pandas"))
    uniq = grouped_agg(cand, ["id_a", "id_b"], {"one": ("one", "max")},
                       n_buckets=n_buckets).select_columns(["id_a", "id_b"])

    occ_total = int(dpdf["df"].sum()) if n_grams <= broadcast_df else None
    if occ_total is not None and occ_total <= verify_broadcast_occ:
        # bound: gated at broadcast_df distinct grams AND 32M total gram
        # occurrences (~256 MB of int64 ids): verify against broadcast
        # per-doc sorted gram-ID arrays with numpy intersections instead
        # of re-tokenizing both texts per pair in Python -- exact ids
        # from the global gram table, so values match the text path
        # bit-for-bit (intersection over ids == intersection over grams).
        gid = {g: i for i, g in enumerate(dpdf["g"])}
        gid_ref = ray.put(gid)

        def to_id_lists(df: pd.DataFrame) -> pd.DataFrame:
            gm = ray.get(gid_ref)
            arrs = [np.sort(np.fromiter((gm[g] for g in word_ngrams(t, n)),
                                        dtype=np.int64)).tolist()
                    for t in df[text_col].to_numpy()]
            return pd.DataFrame({id_col: df[id_col].to_numpy(np.int64),
                                 "gids": arrs})

        doc_arrs = {}
        for b in (docs_ds.map_batches(to_id_lists, batch_format="pandas",
                                      batch_size=4096)
                  .iter_batches(batch_size=8192, batch_format="pyarrow")):
            for i, lst in zip(b.column(id_col).to_pylist(),
                              b.column("gids").to_pylist()):
                doc_arrs[i] = np.asarray(lst, dtype=np.int64)
        arr_ref = ray.put(doc_arrs)

        def verify_ids(batch: pa.Table) -> pa.Table:
            arrs = ray.get(arr_ref)
            ia = batch.column("id_a").to_pylist()
            ib = batch.column("id_b").to_pylist()
            out_a, out_b, out_j = [], [], []
            for x, y in zip(ia, ib):
                A, B = arrs[x], arrs[y]
                inter = np.intersect1d(A, B, assume_unique=True).size
                union = A.size + B.size - inter
                j = 1.0 if union == 0 else inter / union
                j = round_half_away(j, 6)
                if j >= threshold:
                    out_a.append(x)
                    out_b.append(y)
                    out_j.append(j)
            return pa.Table.from_arrays(
                [pa.array(out_a, type=pa.int64()),
                 pa.array(out_b, type=pa.int64()),
                 pa.array(out_j, type=pa.float64())],
                names=["id_a", "id_b", "ngram_jaccard"])

        return uniq.map_batches(verify_ids, batch_format="pyarrow")

    return verify_pairs_ngram_jaccard(uniq, docs_ds, threshold=threshold, n=n,
                                      text_col=text_col, id_col=id_col)


def similar_docs_topk(docs_ds, k: int = 5, threshold: float = 0.3,
                      n: int = 3, text_col: str = "text",
                      id_col: str = "doc_id", n_buckets: int = 64):
    """Per-doc top-k most-similar documents ("related documents"): the
    EXACT prefix-filter similarity join supplies every pair with
    word-n-gram Jaccard >= threshold; each doc then keeps its k best
    neighbors by (jaccard desc, other_id asc). Because the join is
    exact (not LSH-blocked), the ranking is the true similarity
    ranking above the radius -- the deterministic twin of an
    approximate similar-items index.

    Shape: the pair table symmetrizes batch-locally (each undirected
    pair emits both directions) and ONE doc-keyed bucket groupby ranks
    per doc; pair volume above the threshold is the true output grain.

    Output: (doc_id, other_id, ngram_jaccard r6, rk 1..k) sorted by
    (doc_id, rk).
    """
    import pandas as pd

    pairs = prefix_filter_ngram_pairs(docs_ds, threshold=threshold, n=n,
                                      text_col=text_col, id_col=id_col,
                                      n_buckets=n_buckets)

    def symmetrize(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({
            "doc_id": pd.concat([df["id_a"], df["id_b"]],
                                ignore_index=True),
            "other_id": pd.concat([df["id_b"], df["id_a"]],
                                  ignore_index=True),
            "ngram_jaccard": pd.concat([df["ngram_jaccard"]] * 2,
                                       ignore_index=True),
        })
        h = out["doc_id"].to_numpy(np.int64).astype(np.uint64)
        with np.errstate(over="ignore"):
            h = h * np.uint64(0x9E3779B97F4A7C15)
            h ^= h >> np.uint64(29)
        out["bucket"] = (h % np.uint64(n_buckets)).astype(np.int32)
        return out

    def rank_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["doc_id", "ngram_jaccard", "other_id"],
                            ascending=[True, False, True])
        df["rk"] = df.groupby("doc_id").cumcount() + 1
        df = df[df["rk"] <= k]
        return df[["doc_id", "other_id", "ngram_jaccard", "rk"]].assign(
            rk=df["rk"].astype("int64"))

    return (pairs.map_batches(symmetrize, batch_format="pandas")
            .groupby("bucket").map_groups(rank_bucket,
                                          batch_format="pandas")
            .sort(["doc_id", "rk"]))


def lsh_recall_eval(docs_ds, threshold: float = 0.3, n: int = 3,
                    text_col: str = "text", id_col: str = "doc_id",
                    n_buckets: int = 16):
    """Recall/precision evaluation of the MinHash-LSH near-dup chain
    against the exact prefix-filter similarity join -- the dedup
    counterpart of ann_recall_at_k (how many true >=threshold pairs the
    banding actually surfaces; the knob it tunes is bands x rows).
    Precision is 1.0 by construction (candidates are verified with the
    same exact Jaccard), but it is COMPUTED, not assumed, so a
    verification bug would show up here.

    Shape: both pair pipelines run their normal distributed plans; the
    comparison tags each side, takes one pair-keyed combiner groupby,
    and reduces to three scalar counts with a distributed sum -- the
    pair tables never collect.

    Output: one row (n_exact, n_lsh, n_hit, lsh_recall, lsh_precision)
    -- the ratios are single double ops on integer counts
    (exact-float comparable).
    """
    import pandas as pd
    import ray.data as rd

    from ..stages.agg import grouped_agg

    exact = prefix_filter_ngram_pairs(docs_ds, threshold, n,
                                      text_col=text_col, id_col=id_col)
    approx = verify_pairs_ngram_jaccard(
        lsh_candidate_pairs(docs_ds, id_col=id_col, text_col=text_col),
        docs_ds, threshold=threshold, n=n,
        text_col=text_col, id_col=id_col)

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
        "n_exact": np.asarray([n_exact], dtype=np.int64),
        "n_lsh": np.asarray([n_lsh], dtype=np.int64),
        "n_hit": np.asarray([n_hit], dtype=np.int64),
        "lsh_recall": [n_hit / float(n_exact) if n_exact else 0.0],
        "lsh_precision": [n_hit / float(n_lsh) if n_lsh else 0.0],
    })
    return rd.from_pandas(out)


def neardup_kcore(docs_ds, k: int = 2, rounds: int = 2,
                  threshold: float = 0.8, id_col: str = "doc_id",
                  text_col: str = "text", n_buckets: int = 16):
    """Bounded-round k-core peeling over the verified near-dup graph:
    nodes are docs, edges are MinHash-verified pairs (char-shingle
    Jaccard >= threshold); each round drops nodes whose degree < k and
    the edges incident to them. The surviving subgraph after ``rounds``
    peels is the DENSE duplicate core -- pairwise near-dup clusters
    peel away, template/boilerplate families (every member similar to
    every other) survive. Fixed round count keeps the op deterministic
    and lets the SQL oracle unroll the same rounds.

    Scale shape: degrees via combiner-reduced grouped counts at node
    grain; each peel is two ``checkpointed_join`` semi-joins (node
    side, then nbr side) with the edge table materialized between
    rounds (the Ray 2.49 chained-join rule); partition counts derive
    from live row counts (the empty-hash-partition rule). Nothing
    touches the driver beyond per-round scalar counts.

    Output: (doc_id, core_deg) -- survivors with their degree INSIDE
    the surviving subgraph -- sorted by doc_id.
    """
    import pandas as pd
    import ray.data as rd

    from ..stages.agg import grouped_agg
    from ..stages.joins import checkpointed_join, default_num_partitions

    def _empty():
        return rd.from_pandas(pd.DataFrame({
            "doc_id": pd.Series([], dtype="int64"),
            "core_deg": pd.Series([], dtype="int64"),
        }))

    pairs = verify_pairs_jaccard(
        lsh_candidate_pairs(docs_ds, id_col=id_col, text_col=text_col),
        docs_ds, threshold=threshold, id_col=id_col, text_col=text_col)

    def _sym(t: pa.Table) -> pa.Table:
        a = np.asarray(t.column("id_a").to_pylist(), dtype=np.int64)
        b = np.asarray(t.column("id_b").to_pylist(), dtype=np.int64)
        return pa.Table.from_arrays(
            [pa.array(np.concatenate([a, b]), type=pa.int64()),
             pa.array(np.concatenate([b, a]), type=pa.int64())],
            names=["node", "nbr"])

    sym = pairs.map_batches(_sym, batch_format="pyarrow").materialize()
    n_edges = sym.count()  # bound: scalar per round (peeling progress)
    if n_edges == 0:
        return _empty()

    def _deg(edges):
        return grouped_agg(
            edges.map_batches(
                lambda df: df.assign(one=np.ones(len(df), dtype=np.int64)),
                batch_format="pandas"),
            ["node"], {"deg": ("one", "sum")}, n_buckets=n_buckets)

    for _ in range(rounds):
        keep = _deg(sym).map_batches(
            lambda df: df[df["deg"] >= k][["node"]],
            batch_format="pandas").materialize()
        n_keep = keep.count()  # bound: scalar per round
        if n_keep == 0:
            return _empty()
        nparts = default_num_partitions(n_edges, n_keep)
        half = checkpointed_join(sym, keep, on=("node",),
                                 num_partitions=nparts,
                                 left_cols=["node", "nbr"],
                                 right_cols=["node"]).materialize()
        n_half = half.count()
        if n_half == 0:
            return _empty()
        sym = checkpointed_join(
            half, keep.map_batches(
                lambda df: df.rename(columns={"node": "nbr"}),
                batch_format="pandas"),
            on=("nbr",), num_partitions=default_num_partitions(n_half, n_keep),
            left_cols=["node", "nbr"], right_cols=["nbr"]).materialize()
        n_edges = sym.count()
        if n_edges == 0:
            return _empty()

    return (_deg(sym).map_batches(
        lambda df: pd.DataFrame({"doc_id": df["node"].astype("int64"),
                                 "core_deg": df["deg"].astype("int64")}),
        batch_format="pandas").sort("doc_id"))


def neardup_threshold_sweep(docs_ds, grid_pcts=(20, 30, 40, 50, 60, 70, 80),
                            n: int = 3):
    """Dedup-threshold calibration curve: the verified pair count at
    each Jaccard threshold in a grid -- the diagnostic a curation run
    consults BEFORE picking its dedup threshold (too low over-merges
    templated families, too high leaves near-dups in). One exact pair
    join at the grid minimum (PPJoin-filtered prefix join) produces the
    pair table; the sweep is then a single streaming pass emitting a
    grid-length count partial per batch -- nothing else touches the
    corpus.

    Comparisons happen on the r6-ROUNDED jaccard (the pair table's
    published value) against pct/100.0 double literals, identical on
    both engine and oracle sides.

    Output: (threshold_pct int, n_pairs int) sorted by threshold_pct.
    """
    import pandas as pd
    import ray.data as rd

    lo = min(grid_pcts) / 100.0
    pairs = prefix_filter_ngram_pairs(docs_ds, threshold=lo, n=n)
    pcts = sorted(int(p) for p in grid_pcts)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        j = df["ngram_jaccard"].to_numpy(np.float64)
        return pd.DataFrame({
            "threshold_pct": np.asarray(pcts, dtype=np.int64),
            "n_pairs": np.asarray([(j >= p / 100.0).sum() for p in pcts],
                                  dtype=np.int64),
        })

    # bound: grid-length partial per block of the (small) pair table
    parts = pairs.map_batches(partial, batch_format="pandas").to_pandas()
    out = (parts.groupby("threshold_pct", as_index=False)
           .agg(n_pairs=("n_pairs", "sum")))
    # grid rows with zero surviving pairs must still appear
    out = (pd.DataFrame({"threshold_pct": np.asarray(pcts, np.int64)})
           .merge(out, on="threshold_pct", how="left")
           .fillna({"n_pairs": 0}))
    out["n_pairs"] = out["n_pairs"].astype("int64")
    return rd.from_pandas(out.sort_values("threshold_pct")
                          .reset_index(drop=True))
