"""Netpbm + TGA codecs (mycelium_ray/netpbm.py): round trips (binary +
ASCII netpbm, raw + RLE TGA), orientation/descriptor variants, RLE
row-boundary discipline, probes, dispatch, honest errors."""

import struct

import numpy as np
import pytest

from mycelium_ray.imaging import decode_image, encode_image, probe_image_meta
from mycelium_ray.netpbm import (NetpbmError, TgaError, decode_ppm,
                                 decode_tga, encode_ppm, encode_tga,
                                 probe_ppm_meta, probe_tga_meta)

RNG = np.random.default_rng(8)


@pytest.mark.parametrize("h,w", [(1, 1), (7, 13), (33, 21), (64, 48)])
def test_ppm_roundtrip(h, w):
    px = RNG.integers(0, 256, (h, w, 3), dtype=np.uint8)
    assert np.array_equal(decode_ppm(encode_ppm(px)), px)
    assert probe_ppm_meta(encode_ppm(px)) == (w, h)
    g = RNG.integers(0, 256, (h, w), dtype=np.uint8)
    assert np.array_equal(decode_ppm(encode_ppm(g)), g)


def test_ppm_ascii_and_comments():
    a = b"P3\n# comment\n2 2\n255\n255 0 0  0 255 0\n0 0 255  10 20 30\n"
    out = decode_ppm(a)
    assert out.shape == (2, 2, 3) and tuple(out[1, 1]) == (10, 20, 30)
    g = decode_ppm(b"P2\n2 1\n255\n7 250\n")
    assert g.shape == (1, 2) and g[0, 1] == 250


def test_ppm_errors():
    with pytest.raises(NetpbmError):
        decode_ppm(b"P7\nnope")
    with pytest.raises(NetpbmError):
        decode_ppm(b"P6\n2 2\n65535\n" + b"\x00" * 24)   # 16-bit maxval
    with pytest.raises(NetpbmError):
        decode_ppm(b"P6\n4 4\n255\n\x00\x01")            # truncated


@pytest.mark.parametrize("h,w", [(1, 1), (7, 13), (40, 31)])
@pytest.mark.parametrize("rle", [True, False])
def test_tga_roundtrip(h, w, rle):
    px = RNG.integers(0, 256, (h, w, 3), dtype=np.uint8)
    b = encode_tga(px, rle=rle)
    assert np.array_equal(decode_tga(b), px)
    assert probe_tga_meta(b) == (w, h)


def test_tga_rle_compresses_flat_content():
    flat = np.full((50, 60, 3), 7, np.uint8)
    assert len(encode_tga(flat, True)) < len(encode_tga(flat, False)) / 10
    assert np.array_equal(decode_tga(encode_tga(flat)), flat)


def test_tga_topdown_32bpp_and_gray():
    h, w = 3, 4
    bgra = np.zeros((h, w, 4), np.uint8)
    bgra[..., :3] = RNG.integers(0, 256, (h, w, 3))
    hdr = struct.pack("<BBBHHBHHHHBB", 0, 0, 2, 0, 0, 0, 0, 0, w, h,
                      32, 0x20)
    assert np.array_equal(decode_tga(hdr + bgra.tobytes()),
                          bgra[:, :, 2::-1])
    g = RNG.integers(0, 256, (h, w), dtype=np.uint8)
    ghdr = struct.pack("<BBBHHBHHHHBB", 0, 0, 3, 0, 0, 0, 0, 0, w, h,
                       8, 0x20)
    out = decode_tga(ghdr + g.tobytes())
    assert np.array_equal(out[:, :, 0], g)


def test_tga_errors():
    with pytest.raises(TgaError):
        decode_tga(b"\x00" * 10)
    hdr = struct.pack("<BBBHHBHHHHBB", 0, 1, 1, 0, 4, 24, 0, 0, 2, 2,
                      8, 0)
    with pytest.raises(TgaError):
        decode_tga(hdr + b"\x00" * 64)   # paletted


@pytest.mark.parametrize("fmt", ["ppm", "tga", "tga_raw"])
def test_dispatch_roundtrip(fmt):
    px = RNG.integers(0, 256, (19, 27, 3), dtype=np.uint8)
    data = encode_image(px, fmt)
    out, f = decode_image(data)
    base = fmt.split("_")[0]
    assert f == base and np.array_equal(out, px)
    assert probe_image_meta(data) == (base, 27, 19)
