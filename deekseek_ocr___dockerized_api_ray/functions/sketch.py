"""Mergeable sketches: HyperLogLog distinct-count.

The combiner pattern for aggregates the guide calls out: emit one
serialized sketch per batch, merge sketches in a tiny reduce --
mergeability is the whole point. Standard HLL with the small-range
linear-counting correction; register hashes from blake2b so estimates
are deterministic across workers.
"""

from __future__ import annotations

import hashlib
from typing import Iterable

import numpy as np


class HyperLogLog:
    """HLL with 2^p registers (p=12 -> ~1.6% relative error, 4 KiB)."""

    def __init__(self, p: int = 12, registers: "np.ndarray | None" = None):
        self.p = p
        self.m = 1 << p
        self.registers = (
            registers.copy() if registers is not None else np.zeros(self.m, dtype=np.uint8)
        )

    def add(self, value: str) -> None:
        h = int.from_bytes(hashlib.blake2b(value.encode("utf-8"), digest_size=8).digest(), "big")
        idx = h >> (64 - self.p)
        rest = (h << self.p) & ((1 << 64) - 1)
        # rank = leading zeros of the remaining bits (as a 64-bit word) + 1
        rank = (64 - rest.bit_length() + 1) if rest else (64 - self.p + 1)
        if rank > self.registers[idx]:
            self.registers[idx] = rank

    def add_many(self, values: Iterable[str]) -> None:
        for v in values:
            self.add(v)

    def merge(self, other: "HyperLogLog") -> "HyperLogLog":
        assert self.p == other.p
        return HyperLogLog(self.p, np.maximum(self.registers, other.registers))

    def estimate(self) -> float:
        m = float(self.m)
        alpha = 0.7213 / (1 + 1.079 / m)
        e = alpha * m * m / np.sum(np.power(2.0, -self.registers.astype(np.float64)))
        if e <= 2.5 * m:
            zeros = int((self.registers == 0).sum())
            if zeros:
                e = m * np.log(m / zeros)  # linear counting
        return float(e)

    def serialize(self) -> bytes:
        return self.registers.tobytes()

    @classmethod
    def deserialize(cls, data: bytes, p: int = 12) -> "HyperLogLog":
        return cls(p, np.frombuffer(data, dtype=np.uint8))
