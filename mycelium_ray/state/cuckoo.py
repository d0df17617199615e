"""Cuckoo filter over uint64 keys (numpy bucket table).

Primary membership structure of the URL-seen shards (north-star design:
sharded cuckoo filter keyed on canonical-URL hashes; the reference's exact
analog is the big_hash disk store, /root/reference/src/common/bighash.cc —
SHA1-sharded buckets with ≤3 collision slots; the cuckoo generalizes that to
constant-memory membership at ~16 bits/key with bounded-kick eviction).

Layout: 2^b buckets × 4 slots of uint16 fingerprints (0 = empty sentinel).
Candidate buckets: i1 = mix(key) & mask, i2 = i1 ^ mix(fp) — the standard
partial-cuckoo-hashing pair, so either bucket is derivable from the other
plus the fingerprint. Lookups are fully vectorized; inserts loop only over
novel keys (a few hundred per batch at steady state).
"""

from __future__ import annotations

import numpy as np

from ..hashing import splitmix64

_U64 = np.uint64
_U16 = np.uint16
SLOTS = 4


class CuckooFull(Exception):
    pass


class CuckooFilter:
    def __init__(self, n_buckets: int = 1 << 16, seed: int = 0xC0C0, max_kicks: int = 500):
        if n_buckets & (n_buckets - 1):
            raise ValueError("n_buckets must be a power of two")
        self.n_buckets = n_buckets
        self.seed = seed
        self.max_kicks = max_kicks
        self.table = np.zeros((n_buckets, SLOTS), dtype=_U16)
        self.count = 0
        self._rng_state = seed & 0xFFFFFFFF or 1

    @classmethod
    def sized_for(cls, n_items: int, seed: int = 0xC0C0) -> "CuckooFilter":
        # target ≤95% load factor
        need = max(1024, int(n_items / (SLOTS * 0.95)) + 1)
        return cls(n_buckets=1 << (need - 1).bit_length(), seed=seed)

    # --- derived values (vectorized) ---
    def _fp(self, keys: np.ndarray) -> np.ndarray:
        fp = (splitmix64(np.asarray(keys, dtype=_U64) ^ _U64(self.seed))
              & _U64(0xFFFF)).astype(_U16)
        # fingerprint 0 is the empty sentinel → remap to 1
        fp[fp == 0] = 1
        return fp

    def _i1(self, keys: np.ndarray) -> np.ndarray:
        return (splitmix64(np.asarray(keys, dtype=_U64))
                & _U64(self.n_buckets - 1)).astype(np.int64)

    def _alt(self, i: np.ndarray, fp: np.ndarray) -> np.ndarray:
        mix = splitmix64(fp.astype(_U64) ^ _U64(0xF1E2D3C4B5A69788))
        return (i.astype(np.int64) ^ (mix & _U64(self.n_buckets - 1)).astype(np.int64))

    # --- queries ---
    def contains_many(self, keys: np.ndarray) -> np.ndarray:
        keys = np.asarray(keys, dtype=_U64)
        if len(keys) == 0:
            return np.zeros(0, dtype=bool)
        fp = self._fp(keys)
        i1 = self._i1(keys)
        i2 = self._alt(i1, fp)
        fpc = fp[:, None]
        return ((self.table[i1] == fpc) | (self.table[i2] == fpc)).any(axis=1)

    def __contains__(self, key: int) -> bool:
        return bool(self.contains_many(np.array([key], dtype=_U64))[0])

    # --- inserts (python loop over novel keys only) ---
    def _rand(self) -> int:
        # xorshift32 — deterministic eviction choices for resumability
        x = self._rng_state
        x ^= (x << 13) & 0xFFFFFFFF
        x ^= x >> 17
        x ^= (x << 5) & 0xFFFFFFFF
        self._rng_state = x
        return x

    def _insert_fp(self, i1: int, fp: int) -> None:
        tbl = self.table
        i2 = int(self._alt(np.array([i1]), np.array([fp], dtype=_U16))[0])
        for i in (i1, i2):
            row = tbl[i]
            empty = np.nonzero(row == 0)[0]
            if len(empty):
                row[empty[0]] = fp
                self.count += 1
                return
        # evict
        i = i1 if self._rand() & 1 else i2
        cur = fp
        for _ in range(self.max_kicks):
            slot = self._rand() % SLOTS
            cur, tbl[i, slot] = int(tbl[i, slot]), cur
            i = int(self._alt(np.array([i]), np.array([cur], dtype=_U16))[0])
            row = tbl[i]
            empty = np.nonzero(row == 0)[0]
            if len(empty):
                row[empty[0]] = cur
                self.count += 1
                return
        raise CuckooFull(f"cuckoo filter full at {self.count} items")

    def add_many(self, keys: np.ndarray) -> None:
        keys = np.asarray(keys, dtype=_U64)
        fps = self._fp(keys)
        i1s = self._i1(keys)
        for k in range(len(keys)):
            self._insert_fp(int(i1s[k]), int(fps[k]))

    def add(self, key: int) -> None:
        self.add_many(np.array([key], dtype=_U64))

    @property
    def load_factor(self) -> float:
        return self.count / (self.n_buckets * SLOTS)

    # --- checkpoint ---
    def to_bytes(self) -> bytes:
        return self.table.tobytes()

    @classmethod
    def from_bytes(cls, data: bytes, n_buckets: int, seed: int,
                   count: int, rng_state: int, max_kicks: int = 500) -> "CuckooFilter":
        c = cls(n_buckets=n_buckets, seed=seed, max_kicks=max_kicks)
        c.table = np.frombuffer(data, dtype=_U16).reshape(n_buckets, SLOTS).copy()
        c.count = count
        c._rng_state = rng_state
        return c
