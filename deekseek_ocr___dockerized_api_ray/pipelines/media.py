"""Media-payload dedup family: exact content-key dedup and census over
an opaque-binary media column.

A training-data pipeline dedups repeated MEDIA across documents (the
same figure / logo / stock photo embedded in thousands of pages), not
just repeated text. The content identity of a media object is a
checksum of its payload bytes; everything downstream (keeper choice,
copy counts, per-doc stats) is ordinary keyed aggregation at ASSET
grain -- tiny next to the corpus, so the shuffles here are bounded by
the distinct-asset count, not the document count.

Fixture: the sandbox has no real image corpus, so the media table is
synthesized DETERMINISTICALLY from the sf documents table -- each doc
embeds 0-3 media refs whose payloads come from a bounded pool of 64
distinct assets (the repetition a census needs), using DuckDB's
``md5_number_lower`` convention (functions/hashing._hash64) for every
pick so the SQL oracle rebuilds the identical table inline. Payloads
are REAL bytes in the engine (the FAKEPNG layout of
sources/corpus.media_row: magic + LE32 dims + sha256 stripe); the
content key is sha256 over the payload's lowercase-hex serialization,
the canonical byte encoding both engines can hash (DuckDB's sha256
only accepts VARCHAR).

Reference behavior note: the reference pipeline stores cropped media
alongside extracted text (docker/overrides/process/image_process.py
crop saves); dedup of those stored payloads is the natural scale
extension this family covers.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions.hashing import _hash64

#: bounded asset pool -- small enough that sf0.001's ~500 docs already
#: repeat every asset many times (a census with no repeats is vacuous)
N_ASSETS = 64
MAX_MEDIA_PER_DOC = 4  # n_media(doc) in 0..3

_MAGIC = b"FAKEPNG0"


def _asset_dims(asset_id: int) -> tuple[int, int]:
    """Pure-arithmetic dims (SQL-expressible, single byte each)."""
    return 64 + (asset_id % 8) * 16, 48 + (asset_id % 5) * 32


def asset_payload(asset_id: int) -> bytes:
    """Deterministic payload bytes for a pool asset: the media_row
    layout (sources/corpus.py:147) keyed by asset, not by ref, so the
    same asset embedded in many docs is byte-identical."""
    w, h = _asset_dims(asset_id)
    return (_MAGIC + struct.pack("<II", w, h)
            + hashlib.sha256(f"asset:{asset_id}".encode()).digest())


def content_key(payload: bytes) -> str:
    """sha256 over the lowercase-hex serialization of the payload --
    the canonical byte encoding DuckDB's VARCHAR-only sha256 can
    recompute (``sha256(lower(hex(payload)))``)."""
    return hashlib.sha256(payload.hex().encode()).hexdigest()


def _doc_media(doc_ids: np.ndarray) -> pd.DataFrame:
    """Explode each doc's deterministic media refs: (doc_id, media_ref,
    asset_id, payload). Pure function of doc_id -- batch-local, zero
    shuffle, identical at any partitioning."""
    rows_doc, rows_ref, rows_asset = [], [], []
    for d in doc_ids:
        d = int(d)
        n_m = _hash64(f"{d}:nm") % MAX_MEDIA_PER_DOC
        for j in range(n_m):
            rows_doc.append(d)
            rows_ref.append(f"media://{d}/{j}")
            rows_asset.append(_hash64(f"{d}:m{j}") % N_ASSETS)
    payloads = [asset_payload(a) for a in rows_asset]
    return pd.DataFrame({
        "doc_id": pd.Series(rows_doc, dtype="int64"),
        "media_ref": pd.Series(rows_ref, dtype="string"),
        "asset_id": pd.Series(rows_asset, dtype="int64"),
        "payload": pd.Series(payloads, dtype=object),
    })


def media_fixture(sf_dir: str):
    """The synthesized media table as a Dataset: (doc_id, media_ref,
    width, height, payload binary). The stand-in for a real media side
    table keyed by ref (sources/corpus.MEDIA_SCHEMA shape)."""
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])

    def gen(batch: pa.Table) -> pa.Table:
        df = _doc_media(batch.column("doc_id").to_numpy())
        dims = [_asset_dims(int(a)) for a in df["asset_id"]]
        return pa.Table.from_arrays(
            [pa.array(df["doc_id"], type=pa.int64()),
             pa.array(df["media_ref"], type=pa.string()),
             pa.array([w for w, _ in dims], type=pa.int64()),
             pa.array([h for _, h in dims], type=pa.int64()),
             pa.array(df["payload"].tolist(), type=pa.binary())],
            names=["doc_id", "media_ref", "width", "height", "payload"],
        )

    return ds.map_batches(gen, batch_format="pyarrow", batch_size=8192)


def _keyed_partials(sf_dir: str):
    """Per-batch media rows with content keys (the checksum runs over
    the REAL payload bytes built in-batch)."""
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])

    def gen(batch: pa.Table) -> pd.DataFrame:
        df = _doc_media(batch.column("doc_id").to_numpy())
        df["content_key"] = [content_key(p) for p in df["payload"]]
        return df[["doc_id", "media_ref", "content_key"]]

    return ds.map_batches(gen, batch_format="pyarrow", batch_size=8192)


def media_dedup(sf_dir: str, n_buckets: int = 16):
    """Exact media dedup: one keeper per distinct payload content key
    (the lexicographically-smallest media_ref -- deterministic without
    any ordering assumption on the scan), plus the copy count.

    Scale shape: batch-local combiner (min ref + count per key), then
    one grouped reduce at ASSET grain -- the shuffle moves |assets|
    rows per batch, never payload bytes.

    Output: (content_key, keeper_ref, n_copies) sorted by content_key.
    """
    from ..stages.agg import grouped_agg

    rows = _keyed_partials(sf_dir)
    agg = grouped_agg(rows, ["content_key"],
                      {"keeper_ref": ("media_ref", "min"),
                       "n_copies": ("media_ref", "size")},
                      # bound-static: content-key grain, gated at N_ASSETS
                      n_buckets=n_buckets)

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values("content_key").reset_index(drop=True)
        df["n_copies"] = df["n_copies"].astype("int64")
        return df[["content_key", "keeper_ref", "n_copies"]]

    return agg.repartition(1).map_batches(finish, batch_format="pandas",
                                          batch_size=1 << 20)


def repeated_media_census(sf_dir: str, min_refs: int = 2,
                          n_buckets: int = 16):
    """Per-asset repetition census: content keys embedded >= min_refs
    times, with ref and distinct-doc counts -- the "same figure in
    thousands of docs" statistic that decides which assets are worth a
    dedicated dedup pass.

    Distinct-doc counting exploits that the fixture derives media from
    docs, so each doc's refs are batch-local and a doc never spans
    batches: per-batch distinct (content_key, doc_id) counts sum to the
    global distinct count without a distinct-shuffle. (With an external
    media table the same shape holds after one doc-keyed bucketing.)

    Output: (content_key, n_refs, n_docs) sorted by content_key.
    """
    from ..stages.agg import grouped_agg

    rows = _keyed_partials(sf_dir)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({"content_key": pd.Series(dtype="string"),
                                 "n_refs": pd.Series(dtype="int64"),
                                 "n_docs": pd.Series(dtype="int64")})
        g = df.groupby("content_key", as_index=False).agg(
            n_refs=("media_ref", "size"),
            n_docs=("doc_id", "nunique"))
        return g

    partials = rows.map_batches(partial, batch_format="pandas",
                                batch_size=1 << 20)
    agg = grouped_agg(partials, ["content_key"],
                      {"n_refs": ("n_refs", "sum"),
                       "n_docs": ("n_docs", "sum")},
                      # bound-static: content-key grain, gated at N_ASSETS
                      n_buckets=n_buckets)

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["n_refs"] >= min_refs]
        df = df.sort_values("content_key").reset_index(drop=True)
        df["n_refs"] = df["n_refs"].astype("int64")
        df["n_docs"] = df["n_docs"].astype("int64")
        return df[["content_key", "n_refs", "n_docs"]]

    return agg.repartition(1).map_batches(finish, batch_format="pandas",
                                          batch_size=1 << 20)


def variant_payload(asset_id: int, v: int) -> bytes:
    """A near-duplicate VARIANT of a pool asset: the asset payload plus
    a 1-byte variant tail (think re-encode / metadata touch of the same
    image). Variants of one asset differ in 1 of 49 bytes, so their
    byte-gram SimHashes land within hamming ~1-8 while distinct assets
    sit at ~19-39 (measured on the pool) -- the separation a near-dup
    threshold exploits."""
    return asset_payload(asset_id) + bytes([v])


def _simhash_hex(hx: str, k: int = 4) -> int:
    """64-bit SimHash over byte k-grams of a payload's lowercase-hex
    serialization (stride 1 byte = 2 hex chars), each gram hashed with
    _hash64 (DuckDB's md5_number_lower) and counted per occurrence --
    the byte-level twin of functions/hashing.simhash64, replicable in
    SQL with substr + the shared bitsum algebra."""
    acc = np.zeros(64, dtype=np.int64)
    one = np.uint64(1)
    for i in range(0, len(hx) - 2 * k + 2, 2):
        h = np.uint64(_hash64(hx[i:i + 2 * k]))
        bits = ((h >> np.arange(64, dtype=np.uint64)) & one).astype(np.int64)
        acc += 2 * bits - 1
    sig = 0
    for j in range(64):
        if acc[j] > 0:
            sig |= 1 << j
    return sig


def media_simhash_pairs(sf_dir: str, max_hamming: int = 10,
                        n_variants: int = 3, bands: int = 16):
    """Near-duplicate MEDIA detection: SimHash over payload byte-grams,
    banded candidate generation, exact hamming verify -- the media twin
    of the text simhash_pairs family, catching re-encoded / lightly
    edited copies of the same asset that exact content-key dedup
    (media_dedup) cannot see.

    Fixture extension: each media ref carries a deterministic VARIANT
    v = md5(doc:mv{j}) % n_variants of its pool asset, so the distinct
    payload pool is N_ASSETS x n_variants and same-asset variant pairs
    are genuine near-dups (1 differing byte of 49).

    Scale shape: (1) batch-distinct (asset, variant) combiner rows ->
    one keyed reduce at PAYLOAD grain (bounded by the pool, never the
    corpus); (2) per-payload SimHash; (3) band exchange -- 16 x 4-bit
    bands, pigeonhole-lossless for hamming <= 15 >= the threshold, so
    the banded candidate set provably contains the full hamming ball
    and the oracle needs no band logic; (4) exact hamming + distinct.
    With an unbounded payload pool the same chain holds: only the band
    groupby is corpus-sized.

    Output: (key_a, key_b, hamming, same_asset) at distinct-payload
    grain (keys = content_key of the variant payload), sorted.
    """
    import ray.data as rd

    from ..functions.hashing import hamming64, simhash_bands
    from ..stages.agg import grouped_agg
    from ..stages.dedup import distinct_rows

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])

    def variants(batch: pa.Table) -> pd.DataFrame:
        rows_a, rows_v = [], []
        for d in batch.column("doc_id").to_numpy():
            d = int(d)
            n_m = _hash64(f"{d}:nm") % MAX_MEDIA_PER_DOC
            for j in range(n_m):
                rows_a.append(_hash64(f"{d}:m{j}") % N_ASSETS)
                rows_v.append(_hash64(f"{d}:mv{j}") % n_variants)
        df = pd.DataFrame({"asset_id": pd.Series(rows_a, dtype="int64"),
                           "v": pd.Series(rows_v, dtype="int64")})
        return df.drop_duplicates()

    pool = grouped_agg(ds.map_batches(variants, batch_format="pyarrow",
                                      batch_size=8192),
                       ["asset_id", "v"], {"n": ("asset_id", "size")},
                       # bound-static: payload-pool grain (<= N_ASSETS * n_variants)
                       n_buckets=16)

    def sig_rows(df: pd.DataFrame) -> pd.DataFrame:
        keys, sigs = [], []
        for a, v in zip(df["asset_id"], df["v"]):
            hx = variant_payload(int(a), int(v)).hex()
            keys.append(content_key(bytes.fromhex(hx)))
            sigs.append(_simhash_hex(hx))
        return pd.DataFrame({"asset_id": df["asset_id"].astype("int64"),
                             "content_key": pd.Series(keys, dtype="string"),
                             "sim": pd.Series(sigs, dtype="uint64")})

    sigs = pool.map_batches(sig_rows, batch_format="pandas",
                            batch_size=1 << 20)

    def explode(df: pd.DataFrame) -> pd.DataFrame:
        out_k, out_a, out_s, out_b, out_bk = [], [], [], [], []
        for a, ck, s in zip(df["asset_id"], df["content_key"], df["sim"]):
            for bi, bk in enumerate(simhash_bands(int(s), bands)):
                out_k.append(ck)
                out_a.append(a)
                out_s.append(s)
                out_b.append(bi)
                out_bk.append(bk)
        return pd.DataFrame({"content_key": pd.Series(out_k, dtype="string"),
                             "asset_id": pd.Series(out_a, dtype="int64"),
                             "sim": pd.Series(out_s, dtype="uint64"),
                             "band_id": pd.Series(out_b, dtype="int64"),
                             "band_key": pd.Series(out_bk, dtype="uint64")})

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        rows = sorted(set(zip(df["content_key"], df["asset_id"],
                              df["sim"])))
        a, b, hm, sa = [], [], [], []
        for i in range(len(rows)):
            for j in range(i + 1, len(rows)):
                d = hamming64(int(rows[i][2]), int(rows[j][2]))
                if d <= max_hamming:
                    a.append(rows[i][0])
                    b.append(rows[j][0])
                    hm.append(d)
                    sa.append(rows[i][1] == rows[j][1])
        return pd.DataFrame({"key_a": pd.Series(a, dtype="string"),
                             "key_b": pd.Series(b, dtype="string"),
                             "hamming": pd.Series(hm, dtype="int64"),
                             "same_asset": pd.Series(sa, dtype=bool)})

    cand = sigs.map_batches(explode, batch_format="pandas") \
               .groupby(["band_id", "band_key"]) \
               .map_groups(pairs, batch_format="pandas")
    return distinct_rows(cand,
                         ["key_a", "key_b", "hamming", "same_asset"]) \
        .sort(["key_a", "key_b"])


def doc_media_stats(sf_dir: str):
    """Per-doc distinct-media stats: how many media refs a doc embeds,
    how many DISTINCT payloads that is, and how many refs are
    within-doc duplicates. Stateless, zero shuffle (a doc's media
    derivation is row-local).

    Output: (doc_id, n_media, n_distinct, n_dup_refs) sorted by doc_id.
    """
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])

    def stats(batch: pa.Table) -> pd.DataFrame:
        out_id, out_n, out_d = [], [], []
        for d in batch.column("doc_id").to_numpy():
            d = int(d)
            n_m = _hash64(f"{d}:nm") % MAX_MEDIA_PER_DOC
            assets = {_hash64(f"{d}:m{j}") % N_ASSETS for j in range(n_m)}
            out_id.append(d)
            out_n.append(n_m)
            out_d.append(len(assets))
        df = pd.DataFrame({"doc_id": pd.Series(out_id, dtype="int64"),
                           "n_media": pd.Series(out_n, dtype="int64"),
                           "n_distinct": pd.Series(out_d, dtype="int64")})
        df["n_dup_refs"] = (df["n_media"] - df["n_distinct"]).astype("int64")
        return df

    return ds.map_batches(stats, batch_format="pyarrow",
                          batch_size=8192).sort("doc_id")
