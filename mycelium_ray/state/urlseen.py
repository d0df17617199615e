"""URL-seen membership shards: bloom pre-filter → cuckoo filter → optional
exact verification.

Replaces the reference's MongoDB upsert-keyed-on-url dedup (Doc::save /
Doc::load_url, /root/reference/src/common/Doc.cc:15-156) and its big_hash
disk store (bighash.cc:110-173) with the north-star design: membership
shards keyed on ``url_hash64(canonical_url)``, routed by
``shard_of(h, n_shards)`` so each hash range has exactly one owner.

Probe order per batch (all vectorized):
1. bloom ``contains_many`` — negatives are definitively novel;
2. cuckoo ``contains_many`` on bloom-positives — negatives are novel;
3. cuckoo positives are either true dups or false positives (~2⁻¹³/probe):
   with ``exact_verify=True`` (default; parity/test mode) an exact uint64
   set arbitrates, giving zero false drops; at 10^10-key scale the exact
   layer is switched off and the documented FP rate is the accepted cost
   (a falsely-"seen" URL is simply not re-crawled).

Shards are plain Python objects here; the crawl pipeline wraps them in Ray
actors (one actor per shard, ``max_concurrency=1``) and checkpoints
``to_state()`` per round for byte-identical resume.
"""

from __future__ import annotations

import numpy as np

from ..hashing import shard_of, url_hash64_many
from .bloom import BloomFilter
from .cuckoo import CuckooFilter

_U64 = np.uint64


class UrlSeenShard:
    def __init__(self, shard_id: int = 0, capacity: int = 1 << 17,
                 exact_verify: bool = True, seed: int = 42):
        self.shard_id = shard_id
        self.capacity = capacity
        self.exact_verify = exact_verify
        self.seed = seed
        self.bloom = BloomFilter.sized_for(capacity, fp_rate=0.01,
                                           seed=seed ^ (shard_id * 0x9E37 + 1))
        self.cuckoo = CuckooFilter.sized_for(capacity,
                                             seed=seed ^ (shard_id * 0xC0C0 + 7))
        self.exact: set[int] = set()
        self.n_seen = 0

    def check_and_insert(self, keys: np.ndarray) -> np.ndarray:
        """For each key: True ⇒ novel (and now inserted), False ⇒ seen.

        Duplicate keys within the batch: only the FIRST occurrence can be
        novel (mirrors the serial upsert semantics of Doc::save).
        """
        keys = np.asarray(keys, dtype=_U64)
        n = len(keys)
        if n == 0:
            return np.zeros(0, dtype=bool)
        if self.exact_verify and n <= 8:
            # tiny-batch fast path (outlink discovery probes 2-3 keys per
            # page): with the exact layer on, the DECISION is exactly
            # exact-set membership; skip the vectorized bloom/cuckoo probe
            # machinery but keep the filters updated for checkpoint parity
            novel = np.zeros(n, dtype=bool)
            exact = self.exact
            fresh = []
            for i, k in enumerate(keys):
                ki = int(k)
                if ki not in exact:
                    novel[i] = True
                    exact.add(ki)
                    fresh.append(ki)
            if fresh:
                arr = np.array(fresh, dtype=_U64)
                self.bloom.add_many(arr)
                self.cuckoo.add_many(arr)
                self.n_seen += len(fresh)
            return novel
        # first-occurrence mask within the batch
        _, first_idx = np.unique(keys, return_index=True)
        first = np.zeros(n, dtype=bool)
        first[first_idx] = True

        novel = np.zeros(n, dtype=bool)
        maybe = self.bloom.contains_many(keys)
        novel[first & ~maybe] = True
        check2 = first & maybe & ~novel
        if check2.any():
            idx2 = np.nonzero(check2)[0]
            in_cuckoo = self.cuckoo.contains_many(keys[idx2])
            novel[idx2[~in_cuckoo]] = True
            if self.exact_verify:
                pos = idx2[in_cuckoo]
                if len(pos):
                    exact = self.exact
                    fp_mask = np.fromiter(
                        (int(k) not in exact for k in keys[pos]),
                        dtype=bool, count=len(pos))
                    novel[pos] = fp_mask
        new_keys = keys[novel]
        if len(new_keys):
            self.bloom.add_many(new_keys)
            self.cuckoo.add_many(new_keys)
            if self.exact_verify:
                self.exact.update(int(k) for k in new_keys)
            self.n_seen += len(new_keys)
        return novel

    def contains(self, keys: np.ndarray) -> np.ndarray:
        keys = np.asarray(keys, dtype=_U64)
        maybe = self.bloom.contains_many(keys) & self.cuckoo.contains_many(keys)
        if self.exact_verify and maybe.any():
            idx = np.nonzero(maybe)[0]
            exact = self.exact
            maybe[idx] = np.fromiter((int(k) in exact for k in keys[idx]),
                                     dtype=bool, count=len(idx))
        return maybe

    # --- checkpoint ---
    def to_state(self) -> dict:
        return {
            "shard_id": self.shard_id,
            "capacity": self.capacity,
            "exact_verify": self.exact_verify,
            "seed": self.seed,
            "n_seen": self.n_seen,
            "bloom_bits": self.bloom.to_bytes(),
            "bloom_meta": (self.bloom.n_bits, self.bloom.k, self.bloom.seed),
            "cuckoo_tbl": self.cuckoo.to_bytes(),
            "cuckoo_meta": (self.cuckoo.n_buckets, self.cuckoo.seed,
                            self.cuckoo.count, self.cuckoo._rng_state),
            "exact": np.fromiter(self.exact, dtype=_U64,
                                 count=len(self.exact)).tobytes(),
        }

    @classmethod
    def from_state(cls, st: dict) -> "UrlSeenShard":
        s = cls(st["shard_id"], st["capacity"], st["exact_verify"], st["seed"])
        nb, k, bseed = st["bloom_meta"]
        s.bloom = BloomFilter.from_bytes(st["bloom_bits"], nb, k, bseed)
        nbk, cseed, count, rng = st["cuckoo_meta"]
        s.cuckoo = CuckooFilter.from_bytes(st["cuckoo_tbl"], nbk, cseed, count, rng)
        s.exact = set(int(x) for x in np.frombuffer(st["exact"], dtype=_U64))
        s.n_seen = st["n_seen"]
        return s


class UrlSeen:
    """Driver-side sharded facade (serial use: simulator, tests).

    The distributed pipeline does NOT use this class — it routes batches to
    shard actors with ``shard_of`` and merges the boolean masks back; this
    facade exists so serial code paths share the identical routing+probe
    logic.
    """

    def __init__(self, n_shards: int = 4, capacity_per_shard: int = 1 << 17,
                 exact_verify: bool = True, seed: int = 42):
        self.n_shards = n_shards
        self.shards = [UrlSeenShard(i, capacity_per_shard, exact_verify, seed)
                       for i in range(n_shards)]

    def check_and_insert_hashes(self, keys: np.ndarray) -> np.ndarray:
        keys = np.asarray(keys, dtype=_U64)
        out = np.zeros(len(keys), dtype=bool)
        sh = shard_of(keys, self.n_shards)
        for i, shard in enumerate(self.shards):
            idx = np.nonzero(sh == i)[0]
            if len(idx):
                out[idx] = shard.check_and_insert(keys[idx])
        return out

    def check_and_insert_urls(self, urls: list[str]) -> np.ndarray:
        return self.check_and_insert_hashes(url_hash64_many(urls))

    def contains_hashes(self, keys: np.ndarray) -> np.ndarray:
        keys = np.asarray(keys, dtype=_U64)
        out = np.zeros(len(keys), dtype=bool)
        sh = shard_of(keys, self.n_shards)
        for i, shard in enumerate(self.shards):
            idx = np.nonzero(sh == i)[0]
            if len(idx):
                out[idx] = shard.contains(keys[idx])
        return out

    @property
    def n_seen(self) -> int:
        return sum(s.n_seen for s in self.shards)
