"""Vectorized Bloom filter over uint64 keys (numpy bitset).

Pre-filter for the URL-seen cuckoo shards (SURVEY.md §2.3 T5): a negative
bloom answer proves "never seen" without touching the cuckoo table; the
bloom absorbs the overwhelmingly-common novel-URL case at frontier scale.

k probe positions are derived from the key by splitmix64 rounds, so the
filter is fully defined by (n_bits, k, seed) + the bit array — trivially
checkpointable as bytes.
"""

from __future__ import annotations

import numpy as np

from ..hashing import splitmix64

_U64 = np.uint64


class BloomFilter:
    def __init__(self, n_bits: int = 1 << 20, k: int = 4, seed: int = 0x5EED):
        if n_bits & (n_bits - 1):
            raise ValueError("n_bits must be a power of two")
        self.n_bits = n_bits
        self.k = k
        self.seed = seed
        self.words = np.zeros(n_bits // 64, dtype=_U64)

    @classmethod
    def sized_for(cls, n_items: int, fp_rate: float = 0.01, seed: int = 0x5EED):
        """Power-of-two bit count for a target false-positive rate."""
        import math
        bits = max(1024, int(-n_items * math.log(fp_rate) / (math.log(2) ** 2)))
        n_bits = 1 << (bits - 1).bit_length()
        k = max(1, round(n_bits / max(1, n_items) * math.log(2)))
        return cls(n_bits=n_bits, k=min(k, 8), seed=seed)

    def _positions(self, keys: np.ndarray) -> np.ndarray:
        """(len(keys), k) probe bit positions."""
        keys = np.asarray(keys, dtype=_U64)
        pos = np.empty((len(keys), self.k), dtype=_U64)
        h = keys ^ _U64(self.seed)
        for i in range(self.k):
            h = splitmix64(h)
            pos[:, i] = h & _U64(self.n_bits - 1)
        return pos

    def add_many(self, keys: np.ndarray) -> None:
        pos = self._positions(keys).ravel()
        np.bitwise_or.at(self.words, (pos >> _U64(6)).astype(np.int64),
                         _U64(1) << (pos & _U64(63)))

    def contains_many(self, keys: np.ndarray) -> np.ndarray:
        """bool array: True = maybe present, False = definitely absent."""
        keys = np.asarray(keys, dtype=_U64)
        if len(keys) == 0:
            return np.zeros(0, dtype=bool)
        pos = self._positions(keys)
        word = self.words[(pos >> _U64(6)).astype(np.int64)]
        bit = (word >> (pos & _U64(63))) & _U64(1)
        return bit.all(axis=1)

    def add(self, key: int) -> None:
        self.add_many(np.array([key], dtype=_U64))

    def __contains__(self, key: int) -> bool:
        return bool(self.contains_many(np.array([key], dtype=_U64))[0])

    # --- checkpoint ---
    def to_bytes(self) -> bytes:
        return self.words.tobytes()

    @classmethod
    def from_bytes(cls, data: bytes, n_bits: int, k: int, seed: int) -> "BloomFilter":
        b = cls(n_bits=n_bits, k=k, seed=seed)
        b.words = np.frombuffer(data, dtype=_U64).copy()
        return b
