"""TIFF (mycelium_ray/tiff.py) and BMP (mycelium_ray/bmp.py) codecs:
LZW/PackBits round trips, predictor, strips, both byte orders, header-only
probes, sniffing integration, and honest-boundary errors."""

import struct

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from mycelium_ray.bmp import BmpError, decode_bmp, encode_bmp, probe_bmp_meta
from mycelium_ray.http_headers import sniff_format
from mycelium_ray.imaging import decode_image, encode_image, probe_image_meta
from mycelium_ray.tiff import (TiffError, decode_tiff, encode_tiff,
                               lzw_decode, lzw_encode, packbits_decode,
                               packbits_encode, probe_tiff_meta)

RNG = np.random.default_rng(11)


# --------------------------------------------------------------------- LZW
@pytest.mark.parametrize("n,nsym", [
    (0, 2), (1, 2), (10, 2), (400, 4), (5000, 16),
    (20000, 256),          # random 256-sym → table passes every width bump
    (120000, 256),         # forces the 4094-entry Clear + rebuild
])
def test_lzw_roundtrip(n, nsym):
    payload = bytes(RNG.integers(0, nsym, n, dtype=np.uint8))
    assert lzw_decode(lzw_encode(payload)) == payload


def test_lzw_runs_compress():
    payload = b"\x00" * 10000 + b"\xAB" * 10000
    enc = lzw_encode(payload)
    assert len(enc) < len(payload) // 20
    assert lzw_decode(enc) == payload


@settings(max_examples=40, deadline=None)
@given(st.binary(max_size=4000))
def test_lzw_property_roundtrip(payload):
    assert lzw_decode(lzw_encode(payload)) == payload


# ---------------------------------------------------------------- PackBits
@pytest.mark.parametrize("payload", [
    b"", b"x", b"x" * 2, b"x" * 3, b"x" * 128, b"x" * 129, b"x" * 400,
    b"abcdef", b"ab" * 300, bytes(range(256)) * 3,
    b"a" * 130 + b"xyz" + b"b" * 2 + b"q",
])
def test_packbits_roundtrip(payload):
    assert packbits_decode(packbits_encode(payload), len(payload)) == payload


@settings(max_examples=40, deadline=None)
@given(st.binary(max_size=4000))
def test_packbits_property_roundtrip(payload):
    assert packbits_decode(packbits_encode(payload), len(payload)) == payload


def test_packbits_short_strip_raises():
    with pytest.raises(TiffError):
        packbits_decode(packbits_encode(b"abc")[:1], 3)


# -------------------------------------------------------------- TIFF codec
@pytest.mark.parametrize("h,w", [(1, 1), (3, 5), (16, 16), (17, 33),
                                 (64, 48), (129, 31)])
@pytest.mark.parametrize("comp", ["none", "lzw", "packbits"])
def test_tiff_rgb_roundtrip(h, w, comp):
    px = RNG.integers(0, 256, (h, w, 3), dtype=np.uint8)
    data = encode_tiff(px, compression=comp)
    assert np.array_equal(decode_tiff(data), px)
    assert probe_tiff_meta(data) == (w, h)


def test_tiff_predictor_off_roundtrip():
    px = RNG.integers(0, 256, (40, 30, 3), dtype=np.uint8)
    data = encode_tiff(px, compression="lzw", predictor=False)
    assert np.array_equal(decode_tiff(data), px)


def test_tiff_gray_roundtrip():
    g = RNG.integers(0, 256, (25, 40), dtype=np.uint8)
    for comp in ("none", "lzw", "packbits"):
        assert np.array_equal(decode_tiff(encode_tiff(g, compression=comp)), g)


def test_tiff_predictor_helps_smooth_content():
    # a horizontal gradient: differencing turns rows into near-constant
    # runs, so predictor-2 LZW must beat predictor-1 LZW
    x = np.tile(np.arange(256, dtype=np.uint8), (64, 1))
    px = np.repeat(x[:, :, None], 3, axis=2)
    with_pred = encode_tiff(px, compression="lzw", predictor=True)
    without = encode_tiff(px, compression="lzw", predictor=False)
    assert len(with_pred) < len(without)
    assert np.array_equal(decode_tiff(with_pred), px)


def test_tiff_multistrip_assembly():
    # 129 rows at 16 rows/strip → 9 strips incl. a 1-row tail
    px = RNG.integers(0, 256, (129, 20, 3), dtype=np.uint8)
    data = encode_tiff(px, compression="lzw")
    assert np.array_equal(decode_tiff(data), px)


def _mm_tiff_2x2(px: np.ndarray) -> bytes:
    """Handcraft a big-endian uncompressed 2x2 RGB TIFF (the MM decode
    leg — our encoder emits II only)."""
    raw = px.tobytes()                      # 12 bytes, fits before IFD
    ifd_off = 8 + len(raw)
    out = bytearray(b"MM\x00*" + struct.pack(">I", ifd_off) + raw)
    entries = [
        (256, 4, 1, struct.pack(">I", 2)),
        (257, 4, 1, struct.pack(">I", 2)),
        (258, 3, 3, None),                  # out-of-line 3 SHORTs
        (259, 3, 1, struct.pack(">HH", 1, 0)),
        (262, 3, 1, struct.pack(">HH", 2, 0)),
        (273, 4, 1, struct.pack(">I", 8)),
        (277, 3, 1, struct.pack(">HH", 3, 0)),
        (278, 4, 1, struct.pack(">I", 2)),
        (279, 4, 1, struct.pack(">I", len(raw))),
    ]
    extra_base = ifd_off + 2 + 12 * len(entries) + 4
    ifd = bytearray(struct.pack(">H", len(entries)))
    extra = struct.pack(">HHH", 8, 8, 8)
    for tag, typ, cnt, val in entries:
        if val is None:
            val = struct.pack(">I", extra_base)
        ifd += struct.pack(">HHI", tag, typ, cnt) + val
    ifd += struct.pack(">I", 0)
    return bytes(out + ifd + extra)


def test_tiff_big_endian_decode():
    px = RNG.integers(0, 256, (2, 2, 3), dtype=np.uint8)
    data = _mm_tiff_2x2(px)
    assert np.array_equal(decode_tiff(data), px)
    assert probe_tiff_meta(data) == (2, 2)
    assert sniff_format(data) == "tiff"


@pytest.mark.parametrize("mutate,msg", [
    (lambda d: b"XX" + d[2:], "byte-order"),
    (lambda d: d[:40], "overruns|out of range|truncated"),
])
def test_tiff_corrupt_raises(mutate, msg):
    data = encode_tiff(RNG.integers(0, 256, (8, 8, 3), dtype=np.uint8))
    with pytest.raises(TiffError):
        decode_tiff(mutate(data))


def test_tiff_unsupported_variant_raises():
    data = bytearray(encode_tiff(np.zeros((4, 4, 3), np.uint8),
                                 compression="none"))
    # flip the compression SHORT (tag 259) to 7 (JPEG-in-TIFF)
    idx = data.find(struct.pack("<HH", 259, 3))
    assert idx > 0
    struct.pack_into("<H", data, idx + 8, 7)
    with pytest.raises(TiffError, match="compression"):
        decode_tiff(bytes(data))


# --------------------------------------------------------------- BMP codec
@pytest.mark.parametrize("h,w", [(1, 1), (3, 5), (16, 16), (17, 33),
                                 (40, 31)])
def test_bmp_roundtrip(h, w):
    px = RNG.integers(0, 256, (h, w, 3), dtype=np.uint8)
    data = encode_bmp(px)
    assert np.array_equal(decode_bmp(data), px)
    assert probe_bmp_meta(data) == (w, h)


def test_bmp_topdown_and_32bpp_decode():
    px = RNG.integers(0, 256, (5, 7, 3), dtype=np.uint8)
    h, w = 5, 7
    # top-down 32bpp BI_RGB variant, handcrafted
    rows = np.zeros((h, w, 4), dtype=np.uint8)
    rows[:, :, :3] = px[:, :, ::-1]  # BGRA
    data = rows.tobytes()
    off = 54
    hdr = struct.pack("<2sIHHI", b"BM", off + len(data), 0, 0, off)
    info = struct.pack("<IiiHHIIiiII", 40, w, -h, 1, 32, 0, len(data),
                       0, 0, 0, 0)
    assert np.array_equal(decode_bmp(hdr + info + data), px)


def test_bmp_paletted_decode():
    h, w = 6, 9
    pal = RNG.integers(0, 256, (16, 3), dtype=np.uint8)
    idx = RNG.integers(0, 16, (h, w), dtype=np.uint8)
    stride = (w + 3) & ~3
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, :w] = idx[::-1]
    off = 54 + 16 * 4
    hdr = struct.pack("<2sIHHI", b"BM", off + rows.nbytes, 0, 0, off)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 8, 0, rows.nbytes,
                       0, 0, 16, 0)
    palblock = b"".join(bytes([c[2], c[1], c[0], 0]) for c in pal)
    out = decode_bmp(hdr + info + palblock + rows.tobytes())
    assert np.array_equal(out, pal[idx])


def test_bmp_rle_raises():
    data = bytearray(encode_bmp(np.zeros((4, 4, 3), np.uint8)))
    struct.pack_into("<I", data, 30, 1)  # BI_RLE8
    with pytest.raises(BmpError, match="compression"):
        decode_bmp(bytes(data))


# ------------------------------------------------------ dispatch + sniffing
@pytest.mark.parametrize("fmt", ["tiff", "tiff_packbits", "tiff_none", "bmp"])
def test_dispatch_roundtrip(fmt):
    px = RNG.integers(0, 256, (21, 34, 3), dtype=np.uint8)
    data = encode_image(px, fmt)
    out, f = decode_image(data)
    base = fmt.split("_")[0]
    assert f == base and np.array_equal(out, px)
    pf, w, h = probe_image_meta(data)
    assert (pf, w, h) == (base, 34, 21)
    assert sniff_format(data) == base


def test_gray_tiff_decodes_to_rgb_via_dispatch():
    g = RNG.integers(0, 256, (9, 9), dtype=np.uint8)
    out, f = decode_image(encode_tiff(g))
    assert f == "tiff" and out.shape == (9, 9, 3)
    assert np.array_equal(out[:, :, 0], g)


def test_bm_text_never_sniffs_as_bmp():
    assert sniff_format(b"BMW reviews and other text " * 10) == "unknown"
