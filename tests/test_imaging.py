"""Image codec invariants: lossless exactness, lossy PSNR ≥ 40 dB, sniffing."""
import numpy as np
import pytest

from mycelium_ray.http_headers import sniff_format
from mycelium_ray.imaging import (
    ImageDecodeError, decode_image, encode_image, encode_png, decode_png,
    hamming64, phash64, psnr,
)


def _img(seed=0, h=48, w=64):
    return np.random.default_rng(seed).integers(0, 256, size=(h, w, 3), dtype=np.uint8)


def test_png_roundtrip_exact():
    px = _img(1)
    data = encode_png(px)
    out, fmt = decode_image(data)
    assert fmt == "png"
    assert (out == px).all()
    assert psnr(px, out) == float("inf")
    assert sniff_format(data) == "png"


def test_png_is_structurally_valid():
    data = encode_png(_img(2, 5, 7))
    assert data.startswith(b"\x89PNG\r\n\x1a\n")
    assert b"IHDR" in data and b"IDAT" in data and data.endswith(
        b"IEND" + data[-4:])


def test_png_rejects_corruption():
    data = bytearray(encode_png(_img(3)))
    data[30] ^= 0xFF  # flip a byte inside IHDR/IDAT region
    with pytest.raises(ImageDecodeError):
        decode_png(bytes(data))


@pytest.mark.parametrize("fmt", ["jpeg", "webp"])
def test_lossy_psnr_over_40(fmt):
    px = _img(4)
    data = encode_image(px, fmt)
    out, got_fmt = decode_image(data)
    assert got_fmt == fmt
    assert sniff_format(data) == fmt
    p = psnr(px, out)
    assert p >= 40.0, f"PSNR {p} < 40 dB"
    assert p != float("inf")  # genuinely lossy


def test_decode_garbage():
    with pytest.raises(ImageDecodeError):
        decode_image(b"this is not an image at all")
    assert sniff_format(b"junk") == "unknown"


def test_phash_properties():
    px = _img(5)
    h1 = phash64(px)
    assert -(1 << 63) <= h1 < (1 << 63)
    # stable
    assert phash64(px) == h1
    # robust to lossy re-encode (near-dup detection path)
    out, _ = decode_image(encode_image(px, "jpeg"))
    assert hamming64(h1, phash64(out)) <= 4
    # different image → far hash
    h2 = phash64(_img(99))
    assert hamming64(h1, h2) > 10


def test_odd_sizes():
    for h, w in [(8, 8), (9, 13), (33, 17)]:
        px = _img(6, h, w)
        out, _ = decode_image(encode_png(px))
        assert (out == px).all()
        phash64(px)  # must not raise
