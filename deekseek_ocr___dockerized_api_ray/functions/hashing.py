"""Sketch/hashing primitives: shingles, MinHash, SimHash, Jaccard.

Vectorized with numpy where the math allows (the MinHash permutation is
one (n_hashes x n_shingles) broadcast min; SimHash is one sign-sum).
Deterministic: permutation parameters derive from a fixed seed so every
worker computes identical signatures.
"""

from __future__ import annotations

import hashlib
from typing import List, Sequence, Set

import numpy as np

#: 31-bit Mersenne prime: (a*x+b) with a,x < 2^31 fits in uint64, so the
#: whole MinHash permutation is one overflow-safe numpy broadcast.
_MERSENNE31 = (1 << 31) - 1


def char_shingles(text: str, k: int = 5) -> Set[str]:
    """Character k-shingles over the whitespace-normalized text."""
    norm = " ".join(text.split())
    if len(norm) < k:
        return {norm} if norm else set()
    return {norm[i : i + k] for i in range(len(norm) - k + 1)}


def word_ngrams(text: str, n: int = 3) -> Set[str]:
    words = text.split()
    if len(words) < n:
        return {" ".join(words)} if words else set()
    return {" ".join(words[i : i + n]) for i in range(len(words) - n + 1)}


def _hash64(s: str) -> int:
    """64-bit token hash == DuckDB's ``md5_number_lower`` (little-endian
    read of the md5 digest's upper 8 bytes), so SimHash signatures are
    replicable in the SQL oracle."""
    return int.from_bytes(hashlib.md5(s.encode("utf-8")).digest()[8:], "little")


def _fnv_powers(k: int) -> np.ndarray:
    """[FNV_prime^0 .. ^{k-1}] with deliberate uint64 wraparound."""
    pows = np.empty(k, dtype=np.uint64)
    pows[0] = 1
    with np.errstate(over="ignore"):
        for i in range(1, k):
            pows[i] = pows[i - 1] * np.uint64(1099511628211)
    return pows


def _mix64(h: np.ndarray) -> np.ndarray:
    """murmur3 finalizer (vectorized, uint64 wraparound) -- avalanches the
    clustered polynomial rolling-hash values into uniform [0, 2^64)."""
    h = h.copy()
    h ^= h >> np.uint64(33)
    h *= np.uint64(0xFF51AFD7ED558CCD)
    h ^= h >> np.uint64(33)
    h *= np.uint64(0xC4CEB9FE1A85EC53)
    h ^= h >> np.uint64(33)
    return h


def shingle_hashes(text: str, k: int = 5) -> np.ndarray:
    """uint64 hashes of the text's distinct char-k-shingles.

    Fully vectorized: codepoints via utf-32 view, sliding windows, one
    polynomial dot per window (natural mod-2^64 wraparound), murmur
    finalize, np.unique. No per-shingle Python or digest calls.
    """
    norm = " ".join(text.split())
    if not norm:
        return np.empty(0, dtype=np.uint64)
    codes = np.frombuffer(norm.encode("utf-32-le"), dtype=np.uint32).astype(np.uint64)
    k = min(k, len(codes))
    win = np.lib.stride_tricks.sliding_window_view(codes, k)
    pows = _fnv_powers(k)
    with np.errstate(over="ignore"):
        h = (win * pows).sum(axis=1, dtype=np.uint64)
    return np.unique(_mix64(h))


class MinHasher:
    """n_hashes universal-hash permutations h_i(x) = (a_i*x + b_i) mod p,
    p = 2^31-1 (32-bit MinHash, the standard large-corpus choice).

    Parameters derive from ``seed`` only -- identical on every worker.
    Construct once per actor / module, reuse per batch. The signature is
    one (n_hashes x n_shingles) uint64 broadcast + row-min: no Python
    loop over shingles.
    """

    def __init__(self, n_hashes: int = 64, seed: int = 42):
        rng = np.random.RandomState(seed)
        self.n_hashes = n_hashes
        self.a = rng.randint(1, _MERSENNE31, size=n_hashes).astype(np.uint64)
        self.b = rng.randint(0, _MERSENNE31, size=n_hashes).astype(np.uint64)

    def signature(self, shingle_hash_arr: np.ndarray) -> np.ndarray:
        """(n_hashes,) uint64 MinHash signature; empty set -> all-max."""
        if shingle_hash_arr.size == 0:
            return np.full(self.n_hashes, np.iinfo(np.uint64).max, dtype=np.uint64)
        x = (shingle_hash_arr % np.uint64(_MERSENNE31)).astype(np.uint64)
        prod = (self.a[:, None] * x[None, :] + self.b[:, None]) % np.uint64(_MERSENNE31)
        return prod.min(axis=1)

    def signature_batch(self, shingle_sets: Sequence[np.ndarray]) -> np.ndarray:
        """(n_docs, n_hashes) signatures."""
        return np.stack([self.signature(arr) for arr in shingle_sets])


def band_keys(signature: np.ndarray, bands: int = 16) -> List[int]:
    """LSH band keys: one mixed polynomial fold per band (vectorized)."""
    rows = signature.size // bands
    seg = signature[: bands * rows].reshape(bands, rows).astype(np.uint64)
    pows = _fnv_powers(rows)
    with np.errstate(over="ignore"):
        h = (seg * pows).sum(axis=1, dtype=np.uint64)
        h += np.arange(bands, dtype=np.uint64) * np.uint64(0x9E3779B97F4A7C15)
    return _mix64(h).tolist()


def jaccard(a: Set, b: Set) -> float:
    if not a and not b:
        return 1.0
    if not a or not b:
        return 0.0
    return len(a & b) / len(a | b)


def simhash64(text: str, token_re=None) -> int:
    """64-bit SimHash over whitespace tokens (weight = term frequency).

    One blake2b per token, then a single vectorized sign-sum over the
    (n_tokens, 64) bit matrix.
    """
    tokens = text.split()
    if not tokens:
        return 0
    hs = np.asarray([_hash64(t) for t in tokens], dtype=np.uint64)
    bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1)).astype(np.int64)
    acc = (2 * bits - 1).sum(axis=0)
    return int(((acc > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)).sum())


def hamming64(a: int, b: int) -> int:
    return bin(a ^ b).count("1")


def simhash_bands(h: int, bands: int = 4) -> List[int]:
    """Split a 64-bit simhash into `bands` equal bit-bands; two docs within
    hamming distance < bands share at least one band value (pigeonhole)."""
    width = 64 // bands
    mask = (1 << width) - 1
    return [(h >> (i * width)) & mask for i in range(bands)]
