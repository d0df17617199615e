"""Distributed cardinality sketch: HyperLogLog (Flajolet et al. 2007).

The scale path for COUNT(DISTINCT) at 100 TB: exact distinct needs an
all-to-all shuffle of every key; the HLL register array is a fixed
2^P bytes no matter how many rows stream through, merges with an
elementwise max, and rides an ordinary ``map_batches`` → tiny reduce.

Layout: P index bits, 64-P rank bits over a 64-bit hash (xxhash-strength
splitmix64 from ``hashing.url_hash64_many``). Standard error ≈
1.04/sqrt(2^P) — P=14 ⇒ ~0.8%. Bias correction: linear counting for the
small range (HLL++-style switch), raw estimator elsewhere (the classic
large-range correction is unnecessary with 64-bit hashes).

Rebuild-only component (the reference has no approximate aggregates —
SURVEY.md §2.5); mandated by the training-data op suite, not parity.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..hashing import url_hash64_many

P = 14
M = 1 << P
_ALPHA = 0.7213 / (1 + 1.079 / M)  # alpha_m for m >= 128


def empty_registers() -> np.ndarray:
    return np.zeros(M, dtype=np.uint8)


def add_hashed(regs: np.ndarray, h: np.ndarray) -> np.ndarray:
    """Fold a batch of uint64 hashes into the register array (in place)."""
    h = h.astype(np.uint64, copy=False)
    idx = (h >> np.uint64(64 - P)).astype(np.int64)
    rest = h << np.uint64(P)  # low 64-P bits, left-aligned
    # rank = leading zeros of the remaining bits + 1, capped at 64-P+1
    lz = np.full(len(h), 64 - P, dtype=np.uint8)
    mask = rest != 0
    if mask.any():
        # float64 log2 is exact for the leading-bit position of a uint64
        # except at the very top — handle via bit-length arithmetic instead
        r = rest[mask]
        bits = np.zeros(len(r), dtype=np.uint8)
        for shift in (32, 16, 8, 4, 2, 1):
            step = r >= (np.uint64(1) << np.uint64(shift))
            hi = r >> np.uint64(shift)
            r = np.where(step, hi, r)
            bits = bits + np.where(step, np.uint8(shift), np.uint8(0))
        lz[mask] = 63 - bits  # 64 - (bits+1) leading zeros in the u64 view
    rank = lz.astype(np.uint8) + 1
    np.maximum.at(regs, idx, rank)
    return regs


def add_values(regs: np.ndarray, values) -> np.ndarray:
    strs = pd.Series(values).astype(str).tolist()
    return add_hashed(regs, url_hash64_many(strs))


def merge(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    return np.maximum(a, b)


def estimate(regs: np.ndarray) -> float:
    inv = np.ldexp(1.0, -regs.astype(np.int64))  # 2^-reg
    raw = _ALPHA * M * M / inv.sum()
    zeros = int((regs == 0).sum())
    if raw <= 2.5 * M and zeros:
        return M * np.log(M / zeros)  # linear counting, small range
    return raw


# --------------------------------------------------------------------------
# Count-min sketch (Cormode & Muthukrishnan 2005) — the frequency cousin
# of the HLL above: fixed D×W int64 grid, linear (partials merge by +),
# est(key) = min over rows ≥ true count (one-sided error ≤ εN with
# ε = e/W at probability 1−e^−D). Used by analytics.heavy_hitters as the
# candidate filter of an EXACT two-pass top-k.
# --------------------------------------------------------------------------
CMS_D = 4
CMS_W = 8192
_CMS_SEEDS = np.array([0x9E3779B97F4A7C15, 0xC2B2AE3D27D4EB4F,
                       0x165667B19E3779F9, 0x27D4EB2F165667C5],
                      dtype=np.uint64)


def cms_empty() -> np.ndarray:
    return np.zeros((CMS_D, CMS_W), dtype=np.int64)


def _cms_cols(keys: np.ndarray) -> np.ndarray:
    """(D, n) column indices for uint64 keys."""
    from ..hashing import splitmix64
    k = keys.astype(np.uint64, copy=False)
    return np.stack([
        (splitmix64(k ^ s) % np.uint64(CMS_W)).astype(np.int64)
        for s in _CMS_SEEDS])


def cms_add(cms: np.ndarray, keys: np.ndarray,
            counts: np.ndarray) -> np.ndarray:
    """Fold (key, count) pairs into the sketch in place."""
    cols = _cms_cols(keys)
    c = counts.astype(np.int64, copy=False)
    for d in range(CMS_D):
        np.add.at(cms[d], cols[d], c)
    return cms


def cms_estimate(cms: np.ndarray, keys: np.ndarray) -> np.ndarray:
    """Upper-bound count estimates (vectorized min over rows)."""
    cols = _cms_cols(keys)
    return np.min(np.stack([cms[d][cols[d]] for d in range(CMS_D)]),
                  axis=0)


# --------------------------------------------------------------------------
# Mergeable quantile summary (deterministic equal-weight compaction — the
# KLL/GK shape without randomness, so runs are reproducible): a summary
# is a value-sorted pair of arrays (values, weights) holding at most
# QSUMMARY_SIZE entries. Folding a batch or merging two summaries
# concatenates and recompacts to S equal-weight groups, keeping each
# group's weight-midpoint value. Each compaction perturbs any rank by at
# most W/(2S) (W = total weight compacted), so with the two-level
# pipeline below (batch fold → one merge pass) the final rank error is
# ≤ ~W/S — asserted against the exact dual in tests.
# --------------------------------------------------------------------------
QSUMMARY_SIZE = 1024


def qsummary_from(values: np.ndarray, size: int = QSUMMARY_SIZE):
    v = np.sort(values.astype(np.int64, copy=False), kind="stable")
    w = np.ones(len(v), dtype=np.int64)
    return _qcompact(v, w, size)


def qsummary_merge(a, b, size: int = QSUMMARY_SIZE):
    return qsummary_compact(np.concatenate([a[0], b[0]]),
                            np.concatenate([a[1], b[1]]), size)


def qsummary_compact(v: np.ndarray, w: np.ndarray,
                     size: int = QSUMMARY_SIZE):
    """Sort an unsorted weighted-value multiset and compact it to a
    summary — the public fold used by both qsummary_merge and the
    pipeline's final reduce."""
    order = np.argsort(v, kind="stable")
    return _qcompact(v[order].astype(np.int64, copy=False),
                     w[order].astype(np.int64, copy=False), size)


def _qcompact(v: np.ndarray, w: np.ndarray, size: int):
    """v sorted; keep ≤ size entries, each representing an equal slice of
    the total weight by its weight-midpoint value."""
    if len(v) <= size:
        return v, w
    total = int(w.sum())
    cum = np.cumsum(w)                       # inclusive cumulative weight
    # group g covers weight ((g*total)//size, ((g+1)*total)//size];
    # representative = value at the slice's midpoint weight
    bounds = (np.arange(size + 1, dtype=np.int64) * total) // size
    mids = (bounds[:-1] + bounds[1:] + 1) // 2
    idx = np.searchsorted(cum, mids, side="left")
    gw = np.diff(bounds)
    keep = gw > 0
    return v[idx[keep]], gw[keep]


def qsummary_quantile(v: np.ndarray, w: np.ndarray, q: float) -> int:
    """Value at rank ceil(q * W) of the summary's weighted distribution.
    q is resolved to parts-per-million before the integer ceil so any
    ppm-representable quantile (0.995, 0.001, ...) targets the exact
    rank — int(q*100) would quantize to whole percents."""
    total = int(w.sum())
    qppm = int(round(q * 1_000_000))
    target = max(1, -(-qppm * total // 1_000_000))    # ceil, pure ints
    cum = np.cumsum(w)
    return int(v[np.searchsorted(cum, target, side="left")])
