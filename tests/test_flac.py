"""FLAC codec (RFC 9639 subset, mycelium_ray/flac.py): encoder→decoder
round trips, plus hand-built streams for the decoder-only features our
encoder never emits (LPC subframes, stereo decorrelation, Rice
partitions > order 0, escaped partitions, wasted bits), and the
corruption/failure paths (CRC-8, CRC-16, MD5, bad sync)."""
import hashlib
import struct

import numpy as np
import pytest

from mycelium_ray.flac import (FlacError, _BitWriter, _fixed_residual,
                               _utf8_encode, _write_rice, _zigzag, crc8,
                               crc16, decode_flac, encode_flac)


# --------------------------------------------------------------------------
# round trips
# --------------------------------------------------------------------------
@pytest.mark.parametrize("seed,n,ch,rate", [(0, 8000, 1, 16000),
                                            (1, 5000, 2, 44100),
                                            (2, 12289, 2, 8000),
                                            (3, 1, 1, 96000)])
def test_roundtrip_bit_exact(seed, n, ch, rate):
    rng = np.random.default_rng(seed)
    base = rng.integers(-2000, 2000, size=(n, ch)).astype(np.int64)
    x = np.cumsum(base, axis=0).clip(-32768, 32767).astype(np.int16)
    sr, nch, out = decode_flac(encode_flac(x, rate))
    assert (sr, nch) == (rate, ch)
    assert np.array_equal(out, x.astype(np.int32).reshape(n, ch))


def test_compression_on_smooth_signals():
    t = np.arange(16000)
    x = (12000 * np.sin(2 * np.pi * 220 * t / 16000)).astype(np.int16)
    blob = encode_flac(x, 16000)
    assert blob[:4] == b"fLaC"
    assert len(blob) < 0.75 * 2 * len(x)  # genuinely compressed


def test_rejects_out_of_range_and_empty():
    with pytest.raises(FlacError):
        encode_flac(np.array([40000], np.int32), 8000)
    with pytest.raises(FlacError):
        encode_flac(np.array([], np.int16), 8000)


# --------------------------------------------------------------------------
# hand-built streams: decoder-only features
# --------------------------------------------------------------------------
def _streaminfo(rate, ch, n, samples):
    info = bytearray(34)
    info[0:2] = struct.pack(">H", min(4096, n))
    info[2:4] = struct.pack(">H", min(4096, n))
    packed = (rate << 44) | ((ch - 1) << 41) | (15 << 36) | n
    info[10:18] = packed.to_bytes(8, "big")
    info[18:34] = hashlib.md5(
        samples.astype("<i2").tobytes(order="C")).digest()
    return b"fLaC" + bytes([0x80]) + (34).to_bytes(3, "big") + bytes(info)


def _frame_header(bw, ch_code, bs):
    bw.write(0x3FFE, 14)
    bw.write(0, 1)
    bw.write(0, 1)
    bw.write(7, 4)       # blocksize: 16 bit at end
    bw.write(0, 4)       # rate from STREAMINFO
    bw.write(ch_code, 4)
    bw.write(0b100, 3)   # 16 bps
    bw.write(0, 1)
    for b in _utf8_encode(0):
        bw.write(b, 8)
    bw.write(bs - 1, 16)
    bw.write(crc8(bytes(bw.buf)), 8)


def _finish_frame(bw):
    bw.align()
    body = bytes(bw.buf)
    return body + struct.pack(">H", crc16(body))


def _verbatim_subframe(bw, x, bits):
    bw.write(0, 1)
    bw.write(1, 6)
    bw.write(0, 1)
    for v in x.tolist():
        bw.write(int(v) & ((1 << bits) - 1), bits)


def test_decoder_lpc_subframe():
    # x[i] = (2*x[i-1] - x[i-2]) >> 0 + residual — an order-2 LPC with
    # integer coefficients [2, -1], precision 4, shift 0
    n = 64
    rng = np.random.default_rng(5)
    resid = rng.integers(-4, 5, size=n - 2)
    x = np.empty(n, dtype=np.int64)
    x[0], x[1] = 100, 103
    for i in range(2, n):
        x[i] = 2 * x[i - 1] - x[i - 2] + resid[i - 2]
    assert np.abs(x).max() < 32768
    bw = _BitWriter()
    _frame_header(bw, 0, n)           # 1 channel independent
    bw.write(0, 1)
    bw.write(32 + 1, 6)               # LPC, order 2 (100001 = 32+order-1)
    bw.write(0, 1)
    for v in x[:2].tolist():
        bw.write(int(v) & 0xFFFF, 16)
    bw.write(3, 4)                    # precision-1 = 3 → 4 bits
    bw.write(0, 5)                    # shift 0
    bw.write(2 & 0xF, 4)              # coef 2
    bw.write(-1 & 0xF, 4)             # coef -1
    bw.write(0, 2)                    # residual method 0
    bw.write(0, 4)                    # partition order 0
    k = 3
    bw.write(k, 4)
    _write_rice(bw, resid, k)
    blob = _streaminfo(8000, 1, n, x[:, None]) + _finish_frame(bw)
    sr, ch, out = decode_flac(blob)
    assert np.array_equal(out[:, 0], x)


@pytest.mark.parametrize("ch_code", [8, 9, 10])
def test_decoder_stereo_decorrelation(ch_code):
    n = 32
    rng = np.random.default_rng(ch_code)
    L = rng.integers(-3000, 3000, size=n).astype(np.int64)
    R = rng.integers(-3000, 3000, size=n).astype(np.int64)
    side = L - R
    bw = _BitWriter()
    _frame_header(bw, ch_code, n)
    if ch_code == 8:      # left-side: L (16b), side (17b)
        _verbatim_subframe(bw, L, 16)
        _verbatim_subframe(bw, side, 17)
    elif ch_code == 9:    # right-side: side (17b), R (16b)
        _verbatim_subframe(bw, side, 17)
        _verbatim_subframe(bw, R, 16)
    else:                 # mid-side: mid (16b), side (17b)
        mid = (L + R) >> 1
        _verbatim_subframe(bw, mid, 16)
        _verbatim_subframe(bw, side, 17)
    x = np.stack([L, R], axis=1)
    blob = _streaminfo(8000, 2, n, x) + _finish_frame(bw)
    sr, ch, out = decode_flac(blob)
    assert np.array_equal(out, x)


def test_decoder_rice_partitions_and_escape():
    # order-0 FIXED subframe, partition order 2 (4 partitions), last
    # partition escaped (raw 6-bit residuals)
    n = 64
    rng = np.random.default_rng(11)
    x = rng.integers(-30, 31, size=n).astype(np.int64)
    bw = _BitWriter()
    _frame_header(bw, 0, n)
    bw.write(0, 1)
    bw.write(8, 6)                    # FIXED order 0
    bw.write(0, 1)
    bw.write(0, 2)                    # method 0
    bw.write(2, 4)                    # partition order 2
    per = n // 4
    for p in range(4):
        part = x[p * per:(p + 1) * per]
        if p == 3:
            bw.write(15, 4)           # escape
            bw.write(6, 5)            # 6-bit raw
            for v in part.tolist():
                bw.write(int(v) & 0x3F, 6)
        else:
            k = 2
            bw.write(k, 4)
            _write_rice(bw, part, k)
    blob = _streaminfo(8000, 1, n, x[:, None]) + _finish_frame(bw)
    assert np.array_equal(decode_flac(blob)[2][:, 0], x)


def test_decoder_wasted_bits():
    n = 16
    x = (np.arange(n, dtype=np.int64) - 8) << 2   # 2 wasted bits
    bw = _BitWriter()
    _frame_header(bw, 0, n)
    bw.write(0, 1)
    bw.write(1, 6)                    # VERBATIM
    bw.write(1, 1)                    # wasted-bits flag
    bw.write(0, 1)                    # unary 1 → k=2? (1+unary(0s));
    bw.write(1, 1)                    # 0 then 1 → unary=1 → wasted = 2
    for v in (x >> 2).tolist():
        bw.write(int(v) & 0x3FFF, 14)  # 16-2 effective bits
    blob = _streaminfo(8000, 1, n, x[:, None]) + _finish_frame(bw)
    assert np.array_equal(decode_flac(blob)[2][:, 0], x)


# --------------------------------------------------------------------------
# corruption paths
# --------------------------------------------------------------------------
def _good_blob():
    x = (np.arange(500) % 100).astype(np.int16)
    return encode_flac(x, 8000), x


def test_corrupt_crc16_detected():
    blob, _ = _good_blob()
    bad = blob[:-1] + bytes([blob[-1] ^ 0xFF])
    with pytest.raises(FlacError):
        decode_flac(bad)


def test_corrupt_header_crc8_detected():
    blob, _ = _good_blob()
    # byte right after metadata (42 bytes) starts the frame; flip a
    # header byte inside it (blocksize field)
    i = 42 + 5
    bad = blob[:i] + bytes([blob[i] ^ 0x01]) + blob[i + 1:]
    with pytest.raises(FlacError):
        decode_flac(bad)


def test_md5_guard():
    x = (np.arange(200) % 50).astype(np.int16)
    blob = bytearray(encode_flac(x, 8000))
    blob[8 + 18] ^= 0xFF  # flip a byte of the STREAMINFO MD5
    with pytest.raises(FlacError, match="MD5"):
        decode_flac(bytes(blob))


def test_not_flac():
    with pytest.raises(FlacError):
        decode_flac(b"RIFFxxxxWAVE")


def test_fixed_residual_restore_inverse():
    rng = np.random.default_rng(9)
    x = rng.integers(-1000, 1000, size=300).astype(np.int64)
    from mycelium_ray.flac import _fixed_restore
    for order in range(5):
        r = _fixed_residual(x, order)
        assert np.array_equal(_fixed_restore(r, x[:order], order), x)


# --------------------------------------------------------------------------
# property: any int16 signal round-trips bit-exactly
# --------------------------------------------------------------------------
try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=30, deadline=None)
    @given(st.lists(st.integers(-32768, 32767), min_size=1, max_size=3000),
           st.sampled_from([1, 2]),
           st.sampled_from([8000, 44100, 48000]))
    def test_property_roundtrip(vals, ch, rate):
        n = (len(vals) // ch) * ch
        if n == 0:
            vals = vals * ch
            n = ch
        x = np.array(vals[:n], np.int16).reshape(-1, ch)
        sr, nch, out = decode_flac(encode_flac(x, rate))
        assert (sr, nch) == (rate, ch)
        assert np.array_equal(out, x.astype(np.int32))
except ImportError:  # pragma: no cover
    pass
