"""BPE tokenizer as an actor-pool stage (SURVEY A3).

The reference loads its tokenizer exactly once at module import
(``AutoTokenizer.from_pretrained(MODEL_PATH, trust_remote_code=True)``,
docker/overrides/config.py:45-47) and every request reuses that single
instance.  The Ray-Data shape for the same lifecycle is a callable CLASS
passed to ``map_batches``: the merge ranks and vocab are compiled ONCE
per actor in ``__init__`` -- optionally fetched from a ``ray.put``
broadcast so N actors share one object-store copy instead of N pickled
copies riding every task -- and ``__call__`` encodes one Arrow batch.

Encoding is standard bottom-up BPE: repeatedly merge the adjacent symbol
pair with the LOWEST merge rank until no ranked pair remains.  The
symbol alphabet matches ``pipelines.curation.bpe_train`` (characters +
``</w>`` end-of-word marker), so a merge table trained by that operator
drops straight in.  A word-TYPE cache persists across batches inside
each actor: a Zipfian corpus encodes each distinct word once per actor,
not once per occurrence -- the same economics as the reference's
tokenizer cache, expressed per actor instead of per process.
"""

from __future__ import annotations

import string
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np
import pandas as pd
import pyarrow as pa

#: Mersenne prime modulus for the order-sensitive token checksum.
_CHECKSUM_MOD = (1 << 61) - 1

#: Deterministic default alphabet: every printable ASCII char, sorted.
DEFAULT_ALPHABET: Tuple[str, ...] = tuple(sorted(set(string.printable)))

UNK_ID = 0
END_WORD = "</w>"


def build_vocab(merges: Sequence[Tuple[str, str]],
                alphabet: Sequence[str] = DEFAULT_ALPHABET) -> Dict[str, int]:
    """id 0 = <unk>; 1 = </w>; then the base alphabet in sorted order;
    then each merge product in rank order.  Pure function of the merge
    table -> every actor builds the identical vocab."""
    vocab: Dict[str, int] = {"<unk>": UNK_ID, END_WORD: 1}
    for ch in alphabet:
        if ch not in vocab:
            vocab[ch] = len(vocab)
    for a, b in merges:
        prod = a + b
        if prod not in vocab:
            vocab[prod] = len(vocab)
    return vocab


def encode_word(word: str, merges: Sequence[Tuple[str, str]]) -> List[str]:
    """BPE-encode one word (+ ``</w>``) by applying the merge table
    SEQUENTIALLY IN RANK ORDER, left-to-right within the word -- the
    exact convention ``bpe_train``'s training loop uses
    (pipelines/curation.py ``symbols_of``), so encoding the training
    corpus reproduces the trainer's final symbol state."""
    syms: List[str] = list(word) + [END_WORD]
    for a, b in merges:
        if len(syms) < 2:
            break
        i, out = 0, []
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


class BPETokenizerStage:
    """Actor-pool stage: encode document text with a trained BPE merge
    table.  Tokenizer state (ranks, vocab, word cache) is built once per
    actor in ``__init__`` -- the Ray analogue of the reference's
    module-import tokenizer load (docker/overrides/config.py:45-47, A3).

    ``merges`` may be a plain list of (left, right) pairs or a
    ``ray.ObjectRef`` from ``ray.put`` (one object-store copy shared by
    the whole actor pool).

    Output columns per document: ``doc_id``, ``n_tokens``, ``n_unk``,
    ``token_checksum`` (position-weighted sum of ids mod 2^61-1 -- an
    order-sensitive fingerprint of the full id sequence).
    """

    def __init__(self, merges, alphabet: Optional[Sequence[str]] = None):
        import ray

        if isinstance(merges, ray.ObjectRef):
            merges = ray.get(merges)
        self.merges: List[Tuple[str, str]] = [tuple(m) for m in merges]
        self.vocab = build_vocab(self.merges, alphabet or DEFAULT_ALPHABET)
        self._cache: Dict[str, np.ndarray] = {}

    def _ids_of_word(self, word: str) -> np.ndarray:
        got = self._cache.get(word)
        if got is None:
            v = self.vocab
            got = np.array(
                [v.get(s, UNK_ID) for s in encode_word(word, self.merges)],
                dtype=np.int64)
            self._cache[word] = got
        return got

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        texts = batch.column("text").to_pylist()
        n_tokens = np.zeros(len(texts), dtype=np.int64)
        n_unk = np.zeros(len(texts), dtype=np.int64)
        checksum = np.zeros(len(texts), dtype=np.int64)
        for i, text in enumerate(texts):
            ids_parts = [self._ids_of_word(w) for w in text.split(" ") if w]
            if not ids_parts:
                continue
            ids = np.concatenate(ids_parts)
            n_tokens[i] = len(ids)
            n_unk[i] = int((ids == UNK_ID).sum())
            # position-weighted modular checksum, vectorized; chunked so
            # the uint64 partial sum never overflows (chunk * max_term
            # stays far below 2^64 for any realistic vocab size)
            acc = 0
            pos = np.arange(1, len(ids) + 1, dtype=np.uint64)
            terms = pos * (ids.astype(np.uint64) + np.uint64(1))
            for lo in range(0, len(terms), 65536):
                acc = (acc + int(terms[lo: lo + 65536].sum(dtype=np.uint64))) \
                    % _CHECKSUM_MOD
            checksum[i] = acc
        return pa.Table.from_arrays(
            [pa.array(doc_ids, type=pa.int64()),
             pa.array(n_tokens), pa.array(n_unk), pa.array(checksum)],
            names=["doc_id", "n_tokens", "n_unk", "token_checksum"])


def encode_corpus(ds, merges: Sequence[Tuple[str, str]],
                  concurrency: Tuple[int, int] = (1, 4),
                  batch_size: int = 4096):
    """Documents Dataset -> per-doc token stats via an actor pool whose
    tokenizer is built once per actor (merge table broadcast via
    ``ray.put``).  Sorted by doc_id."""
    import ray

    merges_ref = ray.put([tuple(m) for m in merges])
    return (ds.map_batches(
                BPETokenizerStage,
                fn_constructor_kwargs={"merges": merges_ref},
                concurrency=concurrency, batch_size=batch_size,
                batch_format="pyarrow")
              .sort("doc_id"))
