"""Content-defined chunking (gear rolling hash, FastCDC-style cut
discipline): the storage-dedup primitive — identical byte runs chunk
identically regardless of their offset, so duplicate payloads share all
their chunk hashes and an insertion near the front re-synchronizes
within O(1) chunks (the property fixed-size blocking fundamentally
lacks; pinned in tests/test_cdc.py).

Vectorized exactly: the gear hash at position i is
``sum_{k<64} GEAR[b[i-k]] << k`` (older bytes have shifted out of the
64-bit window), which is 64 shifted numpy adds over the whole buffer —
no per-byte Python. Cut positions then apply the min/avg/max discipline
over the (sparse) candidate set only.

Published-algorithm provenance: gear hashing and the normalized-chunking
cut rule are from Xia et al., "FastCDC" (USENIX ATC 2016); constants are
derived in-repo (splitmix64 stream) rather than copied.
"""

from __future__ import annotations

import numpy as np

from ..hashing import splitmix64

# deterministic 256-entry gear table from the in-repo splitmix64 stream
GEAR = np.array([splitmix64(0xCDC0 + i) for i in range(256)],
                dtype=np.uint64)

MIN_SIZE = 256
AVG_SIZE = 1024
MAX_SIZE = 4096
_MASK = np.uint64(AVG_SIZE - 1)
_WINDOW = 64


def gear_hashes(data: bytes) -> np.ndarray:
    """uint64 gear hash at every byte position (value after consuming
    that byte)."""
    b = np.frombuffer(data, dtype=np.uint8)
    n = len(b)
    g = GEAR[b]
    acc = np.zeros(n, dtype=np.uint64)
    for k in range(min(_WINDOW, n)):
        acc[k:] += g[:n - k] << np.uint64(k)
    return acc


def cdc_boundaries(data: bytes) -> list[int]:
    """Chunk END offsets (exclusive), covering the buffer exactly:
    a cut where the gear hash masks to zero, at least MIN_SIZE and at
    most MAX_SIZE bytes per chunk; the tail closes the last chunk."""
    n = len(data)
    if n == 0:
        return []
    h = gear_hashes(data)
    candidates = np.nonzero((h & _MASK) == 0)[0]
    out: list[int] = []
    start = 0
    ci = 0
    m = len(candidates)
    while start < n:
        lo = start + MIN_SIZE
        hi = start + MAX_SIZE
        while ci < m and candidates[ci] < lo:
            ci += 1
        if ci < m and candidates[ci] < hi:
            end = int(candidates[ci]) + 1
            ci += 1
        else:
            end = min(hi, n)
        out.append(end)
        start = end
    return out


def cdc_chunks(data: bytes) -> list[bytes]:
    """The chunk byte slices themselves."""
    out = []
    start = 0
    for end in cdc_boundaries(data):
        out.append(data[start:end])
        start = end
    return out


def chunk_hashes(data: bytes) -> list[int]:
    """Signed-int64 content hash per chunk (blake2b-8; the dedup key)."""
    import hashlib
    out = []
    start = 0
    for end in cdc_boundaries(data):
        h = int.from_bytes(
            hashlib.blake2b(data[start:end], digest_size=8).digest(),
            "big", signed=True)
        out.append(h)
        start = end
    return out
