"""Sequence packing: group documents into token-budget bins for training
batch construction (the standard "pack short docs together" step before
tokenization at scale).

Layout: docs are hash-sharded (ONE stateless map assigns shards, one
keyed shuffle co-locates a shard) and each shard packs independently and
deterministically -- doc order inside a shard is doc_id order, so the
same corpus always yields the same bins regardless of partitioning or
execution order. Packing itself is greedy next-fit over the sorted
docs: O(docs-in-shard) bookkeeping per task (the heavy work -- token
counting -- is vectorized upstream).

Oversized docs (> max_tokens) get a bin of their own; splitting is a
downstream tokenizer concern, flagged via ``oversize``.
"""

from __future__ import annotations

import pyarrow as pa

from ..functions.text_stats import TOKEN_RE, sha1_64


def pack_sequences(docs_ds, max_tokens: int = 2048, n_shards: int = 64,
                   text_col: str = "text", id_col: str = "doc_id"):
    """Returns one row per doc: (shard, bin_id, doc_id, n_tokens,
    oversize) where (shard, bin_id) identifies the packed sequence."""

    def count_and_shard(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_pylist()
        counts = [len(TOKEN_RE.findall(t)) for t in batch.column(text_col).to_pylist()]
        shards = [sha1_64(str(i)) % n_shards for i in ids]
        id_arr = batch.column(id_col)
        return pa.Table.from_arrays(
            [id_arr.combine_chunks() if isinstance(id_arr, pa.ChunkedArray) else id_arr,
             pa.array(counts, type=pa.int64()),
             pa.array(shards, type=pa.int32())],
            names=[id_col, "n_tokens", "shard"],
        )

    def pack_shard(group: pa.Table) -> pa.Table:
        g = group.sort_by([(id_col, "ascending")])
        ids = g.column(id_col).to_pylist()
        counts = g.column("n_tokens").to_pylist()
        shard = g.column("shard")[0].as_py() if g.num_rows else 0
        bins, fill, bin_id = [], 0, 0
        oversize = []
        first = True
        for c in counts:
            if c > max_tokens:
                # oversized doc -> own bin
                if not first:
                    bin_id += 1
                bins.append(bin_id)
                oversize.append(True)
                bin_id += 1
                fill = 0
                first = False
                continue
            if not first and fill + c > max_tokens:
                bin_id += 1
                fill = 0
            bins.append(bin_id)
            oversize.append(False)
            fill += c
            first = False
        return pa.Table.from_arrays(
            [pa.array([shard] * len(ids), type=pa.int32()),
             pa.array(bins, type=pa.int64()),
             pa.array(ids, type=g.schema.field(id_col).type),
             pa.array(counts, type=pa.int64()),
             pa.array(oversize, type=pa.bool_())],
            names=["shard", "bin_id", id_col, "n_tokens", "oversize"],
        )

    counted = docs_ds.map_batches(count_and_shard, batch_format="pyarrow")
    return counted.groupby("shard").map_groups(pack_shard, batch_format="pyarrow")
