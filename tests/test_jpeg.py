"""Baseline-JPEG codec (mycelium_ray/jpeg.py): structure, round-trip
fidelity (the BASELINE.json per-row invariant PSNR ≥ 40 dB for lossy
formats), determinism, and error paths."""
import struct

import numpy as np
import pytest

from mycelium_ray.imaging import decode_image, encode_image, psnr
from mycelium_ray.jpeg import (DEFAULT_QUALITY, JpegError, decode_jpeg,
                               encode_jpeg)

RNG = np.random.default_rng(7)


def _noise(h, w):
    return RNG.integers(0, 256, (h, w, 3), dtype=np.uint8)


@pytest.mark.parametrize("h,w", [(8, 8), (16, 16), (17, 9), (23, 37),
                                 (40, 33), (64, 64), (1, 1), (3, 70)])
def test_roundtrip_noise_psnr(h, w):
    """Uniform noise is the worst case for transform coding; the 40 dB
    invariant must hold even there (orthonormal DCT bounds pixel MSE by
    the quantization step, independent of content)."""
    px = _noise(h, w)
    out = decode_jpeg(encode_jpeg(px))
    assert out.shape == px.shape
    assert psnr(px, out) >= 40.0


def test_flat_and_gradient_near_exact():
    flat = np.full((24, 24, 3), 130, dtype=np.uint8)
    assert psnr(flat, decode_jpeg(encode_jpeg(flat))) > 50
    grad = (np.arange(48)[:, None, None]
            * np.array([5, 3, 1])[None, None, :] % 256).astype(np.uint8) \
        .repeat(16, 1)
    assert psnr(grad, decode_jpeg(encode_jpeg(grad))) > 50


def test_stream_structure():
    """Interchange-format markers in spec order; 0xFF bytes inside the
    entropy segment are stuffed (no accidental markers)."""
    b = encode_jpeg(_noise(16, 16))
    assert b[:2] == b"\xFF\xD8" and b[-2:] == b"\xFF\xD9"
    assert b[2:4] == b"\xFF\xE0" and b[6:11] == b"JFIF\x00"
    # walk the segments to SOS; between SOS payload and EOI every 0xFF
    # must be followed by 0x00 (stuffing)
    pos = 2
    seen = []
    while True:
        marker = b[pos + 1]
        seen.append(marker)
        (ln,) = struct.unpack(">H", b[pos + 2:pos + 4])
        pos += 2 + ln
        if marker == 0xDA:
            break
    assert 0xDB in seen and 0xC0 in seen and 0xC4 in seen
    entropy = b[pos:-2]
    i = entropy.find(b"\xFF")
    while i != -1:
        assert entropy[i + 1] == 0x00
        i = entropy.find(b"\xFF", i + 2)


def test_deterministic():
    px = _noise(20, 31)
    assert encode_jpeg(px) == encode_jpeg(px)


def test_quality_monotonic_on_noise():
    px = _noise(32, 32)
    p = [psnr(px, decode_jpeg(encode_jpeg(px, q))) for q in (80, 90, 98)]
    assert p[0] < p[1] < p[2]


def test_dispatch_via_imaging():
    px = _noise(19, 21)
    data = encode_image(px, "jpeg")
    assert data[:3] == b"\xFF\xD8\xFF"  # real JPEG magic, sniffable
    out, fmt = decode_image(data)
    assert fmt == "jpeg" and out.shape == px.shape
    assert psnr(px, out) >= 40.0


def test_error_paths():
    with pytest.raises(JpegError):
        decode_jpeg(b"\x00\x01\x02")
    with pytest.raises(JpegError):
        decode_jpeg(b"\xFF\xD8\xFF\xDA\x00\x04\x00\x00")  # SOS w/o SOF
    good = encode_jpeg(_noise(16, 16))
    with pytest.raises(JpegError):
        decode_jpeg(good[:40])  # truncated mid-segment
    # progressive SOF2 must be rejected, not mis-decoded
    prog = good.replace(b"\xFF\xC0", b"\xFF\xC2", 1)
    with pytest.raises(JpegError):
        decode_jpeg(prog)


def test_default_quality_is_contracted():
    assert DEFAULT_QUALITY == 98  # q95 measures ~36 dB on noise: too low
