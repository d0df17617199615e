"""Content-defined chunking (functions/cdc.py): coverage, size bounds,
offset-robust resynchronization (the property fixed blocking lacks),
duplicate-region detection, determinism. The cdc_image_dedup pipeline
key is covered by the oracle parametrization in test_queries.py."""

import random

import numpy as np
import pytest

from mycelium_ray.functions.cdc import (AVG_SIZE, MAX_SIZE, MIN_SIZE,
                                        cdc_boundaries, cdc_chunks,
                                        chunk_hashes, gear_hashes)

RNG = random.Random(5)
DATA = bytes(RNG.randrange(256) for _ in range(50000))


def test_coverage_and_size_bounds():
    bs = cdc_boundaries(DATA)
    assert bs[-1] == len(DATA)
    sizes = np.diff([0] + bs)
    assert (sizes[:-1] >= MIN_SIZE).all()
    assert (sizes <= MAX_SIZE).all()
    # mean lands near the target (mask = AVG_SIZE - 1)
    assert AVG_SIZE / 2 < sizes.mean() < AVG_SIZE * 2
    assert b"".join(cdc_chunks(DATA)) == DATA


def test_deterministic():
    assert chunk_hashes(DATA) == chunk_hashes(bytes(DATA))


@pytest.mark.parametrize("edit_at", [0, 1, 100, 500])
def test_front_edit_resynchronizes(edit_at):
    """An insertion near the front must perturb only O(1) chunks —
    every later boundary re-synchronizes (fixed-size blocking would
    shift EVERY block)."""
    mutated = DATA[:edit_at] + b"\x42" + DATA[edit_at:]
    s1, s2 = set(chunk_hashes(DATA)), set(chunk_hashes(mutated))
    assert len(s1 & s2) >= len(s1) - 5


def test_shared_region_detected_across_buffers():
    other = (bytes(RNG.randrange(256) for _ in range(5000))
             + DATA[10000:30000]
             + bytes(RNG.randrange(256) for _ in range(5000)))
    shared = set(chunk_hashes(other)) & set(chunk_hashes(DATA))
    # ~20 chunks of shared content, minus the two boundary chunks
    assert len(shared) >= 10


def test_gear_window_semantics():
    """The vectorized gear hash must equal the sequential definition
    h_i = (h_{i-1} << 1) + GEAR[b_i] (mod 2^64)."""
    from mycelium_ray.functions.cdc import GEAR
    data = DATA[:512]
    h = np.uint64(0)
    seq = []
    for byte in data:
        h = np.uint64((int(h) << 1) + int(GEAR[byte]) & (1 << 64) - 1)
        seq.append(int(h))
    vec = gear_hashes(data)
    assert [int(v) for v in vec] == seq


def test_empty_and_tiny_inputs():
    assert cdc_boundaries(b"") == []
    assert cdc_boundaries(b"x") == [1]
    assert cdc_boundaries(b"y" * 100) == [100]
