"""Regression tests for the round-2 review findings: webp decoder error
typing + fast-path eligibility, checkpoint version monotonicity under
vacuum, and park-refusal without renice capability."""

import numpy as np
import pytest

from mycelium_ray.imaging import ImageDecodeError, decode_image
from mycelium_ray.webp import (WebpError, _LsbWriter, _write_code_lengths,
                               _write_single_symbol_code,
                               decode_webp_lossless, encode_webp_lossless)


def test_webp_fuzzed_tails_raise_webperror_only():
    """Any malformed VP8L payload must surface as WebpError (→
    ImageDecodeError in the dispatcher), never ValueError/IndexError —
    one fuzzed blob in a crawl must not kill the decode map task."""
    rng = np.random.default_rng(11)
    good = encode_webp_lossless(
        rng.integers(0, 256, size=(6, 7, 3), dtype=np.uint8))
    for trial in range(200):
        cut = int(rng.integers(21, len(good)))
        blob = bytearray(good[:cut])
        n_flips = int(rng.integers(1, 6))
        for _ in range(n_flips):
            i = int(rng.integers(20, len(blob)))  # keep RIFF/VP8L header
            blob[i] ^= int(rng.integers(1, 256))
        try:
            decode_image(bytes(blob))
        except ImageDecodeError:
            pass  # the only acceptable failure type


def _encode_green_shifted(px: np.ndarray) -> bytes:
    """Spec-valid VP8L stream whose 256-entry 8-bit GREEN code covers
    symbols 1..256 (not 0..255): canonical code for symbol s is s-1, so
    a decoder that assumes code==symbol misreads every green byte by one.
    Valid only for images whose green channel avoids 0."""
    import struct as _struct
    h, w, _ = px.shape
    bw = _LsbWriter()
    bw.put(w - 1, 14)
    bw.put(h - 1, 14)
    bw.put(0, 1)
    bw.put(0, 3)
    bw.put(0, 1)
    bw.put(0, 1)
    bw.put(0, 1)
    green_lengths = [0] + [8] * 256 + [0] * 23     # symbols 1..256
    byte_lengths = [8] * 256
    _write_code_lengths(bw, green_lengths)
    _write_code_lengths(bw, byte_lengths)          # red: identity
    _write_code_lengths(bw, byte_lengths)          # blue: identity
    _write_single_symbol_code(bw, 0xFF)
    _write_single_symbol_code(bw, 0)
    rev8 = [int(f"{v:08b}"[::-1], 2) for v in range(256)]
    for r, g, b in px.reshape(-1, 3):
        bw.put(rev8[int(g) - 1], 8)                # code = symbol - 1
        bw.put(rev8[int(r)], 8)
        bw.put(rev8[int(b)], 8)
    payload = bw.finish()
    vp8l = b"\x2f" + payload
    chunk = b"VP8L" + _struct.pack("<I", len(vp8l)) + vp8l
    if len(vp8l) & 1:
        chunk += b"\x00"
    return b"RIFF" + _struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk


def test_webp_fast_path_requires_identity_green_code():
    """A valid stream whose green code is NOT the identity mapping must
    fall back to the general decoder and still round-trip exactly."""
    rng = np.random.default_rng(12)
    px = rng.integers(0, 256, size=(5, 9, 3), dtype=np.uint8)
    px[:, :, 1] = rng.integers(1, 256, size=(5, 9))  # green avoids 0
    out = decode_webp_lossless(_encode_green_shifted(px))
    assert (out == px).all()


def test_checkpoint_versions_monotonic_under_vacuum(tmp_path):
    """Post-resume checkpoints numerically below stale blobs must bump
    past them — otherwise vacuum deletes the fresh snapshot and restore
    resurrects pre-crash state."""
    from mycelium_ray.corpus import generate_corpus
    from mycelium_ray.pipelines.crawl import RayCrawler
    from mycelium_ray.state.store import TableStore
    _, site, seeds = generate_corpus(n_hosts=4, pages_per_host=3, seed=42)
    store = TableStore(str(tmp_path / "s"))
    c = RayCrawler(site, parallel=4, n_fetchers=2, store=store)
    c.feed(seeds)
    c.checkpoint(2005)   # pre-crash: flush_version=2, waves=5
    c.checkpoint(2010)
    # resumed run resets waves → same flush_version gives a LOWER number
    c.checkpoint(2003)
    vs = store.blob_versions("crawl_ckpt")
    assert vs[-1] > 2010          # bumped past the stale snapshots
    assert len(vs) <= 2           # vacuum keeps the newest two
    assert vs == sorted(vs)


def test_set_nice_refuses_one_way_park(monkeypatch):
    """Without CAP_SYS_NICE / RLIMIT_NICE headroom, parking would be a
    one-way trap — set_nice must refuse and leave priority unchanged."""
    import os
    import resource

    from mycelium_ray.pipelines.crawl_sharded import PlannerShard
    cls = PlannerShard.__ray_metadata__.modified_class
    shard = cls.__new__(cls)  # set_nice touches no instance state
    monkeypatch.setattr(os, "geteuid", lambda: 1000)
    monkeypatch.setattr(resource, "getrlimit", lambda which: (0, 0))
    before = os.getpriority(os.PRIO_PROCESS, 0)
    assert shard.set_nice(19) == before
    assert os.getpriority(os.PRIO_PROCESS, 0) == before


def test_jpeg_malformed_raises_jpegerror_only():
    """Truncated/corrupt JPEG segments must surface as JpegError (→
    ImageDecodeError), never struct.error/IndexError (review reproducers)."""
    from mycelium_ray.jpeg import JpegError, decode_jpeg
    for blob in (b"\xff\xd8\xff\xc0\x00\x05\x08\x00\x00\xff\xd9",
                 b"\xff\xd8\xff\xda\x00\x02\xff\xd9"):
        with pytest.raises(JpegError):
            decode_jpeg(blob)
        with pytest.raises(ImageDecodeError):
            decode_image(blob)
    # fuzz sweep like the webp one
    from mycelium_ray.imaging import encode_image
    rng = np.random.default_rng(13)
    good = encode_image(rng.integers(0, 256, (8, 9, 3), dtype=np.uint8),
                        "jpeg")
    for _ in range(150):
        cut = int(rng.integers(4, len(good)))
        blob = bytearray(good[:cut])
        for _ in range(int(rng.integers(1, 5))):
            i = int(rng.integers(2, len(blob)))
            blob[i] ^= int(rng.integers(1, 256))
        try:
            decode_image(bytes(blob))
        except ImageDecodeError:
            pass


def test_webp_two_symbol_simple_code_transmission_order():
    """RFC 9649: simple-code code 0 is the FIRST transmitted symbol even
    when numerically greater than the second — decoding canonically by
    symbol value would swap the two green values."""
    import struct as _struct

    from mycelium_ray.webp import _LsbWriter, _write_code_lengths, \
        _write_single_symbol_code
    first, second = 200, 100          # transmission order: 200 then 100
    greens = [first, second, second, first, first, second]
    h, w = 2, 3
    bw = _LsbWriter()
    bw.put(w - 1, 14); bw.put(h - 1, 14)
    bw.put(0, 1); bw.put(0, 3); bw.put(0, 1); bw.put(0, 1); bw.put(0, 1)
    # green: simple 2-symbol code, first > second
    bw.put(1, 1)                      # simple
    bw.put(1, 1)                      # num_symbols - 1 = 1
    bw.put(1, 1)                      # first symbol in 8 bits
    bw.put(first, 8)
    bw.put(second, 8)
    _write_code_lengths(bw, [8] * 256)             # red identity
    _write_code_lengths(bw, [8] * 256)             # blue identity
    _write_single_symbol_code(bw, 0xFF)            # alpha
    _write_single_symbol_code(bw, 0)               # distance
    from mycelium_ray.webp import _REV8
    for g in greens:
        bw.put(0 if g == first else 1, 1)          # green: 1-bit code
        bw.put(int(_REV8[7]), 8)                   # red = 7
        bw.put(int(_REV8[9]), 8)                   # blue = 9
    payload = bw.finish()
    vp8l = b"\x2f" + payload
    chunk = b"VP8L" + _struct.pack("<I", len(vp8l)) + vp8l
    if len(vp8l) & 1:
        chunk += b"\x00"
    data = b"RIFF" + _struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk
    out = decode_webp_lossless(data)
    assert out[:, :, 1].reshape(-1).tolist() == greens
    assert (out[:, :, 0] == 7).all() and (out[:, :, 2] == 9).all()


def test_dedup_clusters_empty_pair_graph(ray_session):
    """Zero near-dup pairs (a clean corpus) must yield an empty result,
    not KeyError 'node' (confirmed review crash)."""
    from mycelium_ray.pipelines.dedup import dedup_clusters
    from tests.conftest import ds_to_pandas
    t = dedup_clusters("/root/testdata/sf0.001", threshold=1.5)
    df = ds_to_pandas(t)
    assert len(df) == 0
    assert list(df.columns) == ["doc_id", "rep"]


def test_merge_topk_zero_partials(ray_session):
    """No partial rows anywhere → empty result table, not KeyError."""
    import pyarrow as pa
    import ray.data as rd

    from mycelium_ray.pipelines.ann import _merge_topk
    empty = pa.table({"query_id": pa.array([], pa.int64()),
                      "vec_id": pa.array([], pa.int64()),
                      "sim": pa.array([], pa.float64()),
                      "n_cand": pa.array([], pa.int64()),
                      "n_total": pa.array([], pa.int64())})
    table, stats = _merge_topk(rd.from_arrow(empty), k=5, with_stats=True)
    assert table.num_rows == 0
    assert stats == {"n_candidates": 0, "n_rows_x_queries": 0}
