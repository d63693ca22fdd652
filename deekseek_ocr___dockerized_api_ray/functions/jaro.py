"""Vectorized Jaro / Jaro-Winkler similarity over PAIR LISTS.

The textbook algorithm (greedy windowed matching + transposition count,
Winkler prefix boost of 0.1/char up to 4 chars applied only when
jaro > 0.7) -- the same convention DuckDB's ``jaro_winkler_similarity``
implements, which is what makes the record-linkage operator fully
SQL-oracle-able.

Shape: everything is numpy over a (pairs x max_len) code matrix; the
only Python loop is over character POSITIONS of the longer string
(bounded, ~25 for name data), vectorized across all pairs at once --
the edit_distance_topk row-DP trick applied to Jaro's greedy matcher.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np

_PAD_A = -1
_PAD_B = -2


def _codes(strs: Sequence[str], max_len: int, pad: int) -> np.ndarray:
    out = np.full((len(strs), max(max_len, 1)), pad, dtype=np.int32)
    for i, s in enumerate(strs):
        if s:
            out[i, : len(s)] = np.frombuffer(
                s.encode("utf-32-le"), dtype=np.uint32).astype(np.int32)
    return out


def jaro_winkler_pairs(a: Sequence[str], b: Sequence[str],
                       winkler: bool = True) -> np.ndarray:
    """Similarity for each aligned pair (a[i], b[i]); float64 array."""
    n = len(a)
    if n == 0:
        return np.zeros(0, dtype=np.float64)
    len1 = np.array([len(s) for s in a], dtype=np.int64)
    len2 = np.array([len(s) for s in b], dtype=np.int64)
    L1, L2 = int(len1.max()), int(len2.max())
    A = _codes(a, L1, _PAD_A)
    B = _codes(b, L2, _PAD_B)

    w = np.maximum(np.maximum(len1, len2) // 2 - 1, 0)
    jidx = np.arange(max(L2, 1), dtype=np.int64)[None, :]
    used2 = np.zeros_like(B, dtype=bool)
    match1 = np.zeros_like(A, dtype=bool)
    for i in range(L1):
        cand = ((B == A[:, i: i + 1])
                & (jidx >= (i - w)[:, None])
                & (jidx <= (i + w)[:, None])
                & ~used2)
        hit = cand.any(axis=1)
        j = cand.argmax(axis=1)
        rows = np.nonzero(hit)[0]
        used2[rows, j[rows]] = True
        match1[rows, i] = True

    m = match1.sum(axis=1).astype(np.int64)

    # transpositions: k-th matched char of s1 vs k-th matched char of s2
    r1 = match1.cumsum(axis=1) - 1
    r2 = used2.cumsum(axis=1) - 1
    mmax = int(m.max()) if len(m) else 0
    M1 = np.full((n, max(mmax, 1)), _PAD_A, dtype=np.int32)
    M2 = np.full((n, max(mmax, 1)), _PAD_B, dtype=np.int32)
    p1, i1 = np.nonzero(match1)
    p2, j2 = np.nonzero(used2)
    M1[p1, r1[p1, i1]] = A[p1, i1]
    M2[p2, r2[p2, j2]] = B[p2, j2]
    # DuckDB (rapidfuzz convention) FLOORS the half-count
    t = (((M1 != M2) & (M1 != _PAD_A)).sum(axis=1) // 2).astype(np.float64)

    mf = m.astype(np.float64)
    with np.errstate(divide="ignore", invalid="ignore"):
        jaro = (mf / len1 + mf / len2 + (mf - t) / mf) / 3.0
    jaro = np.where(m > 0, jaro, 0.0)

    if not winkler:
        return jaro
    k = min(4, L1, L2)
    if k > 0:
        eq = (A[:, :k] == B[:, :k]).astype(np.int64)
        pl = eq.cumprod(axis=1).sum(axis=1).astype(np.float64)
    else:
        pl = np.zeros(n, dtype=np.float64)
    return np.where(jaro > 0.7, jaro + pl * 0.1 * (1.0 - jaro), jaro)
