"""Progressive JPEG (SOF2, T.81 Annex G) codec tests.

The load-bearing invariant: progressive and baseline encodings at the
same quality share jpeg._quantize_image, so their decoded outputs must
be BIT-IDENTICAL — any divergence is an entropy-layer bug, not noise.
"""

import numpy as np
import pytest

from mycelium_ray.imaging import decode_image, encode_image, psnr
from mycelium_ray.jpeg import JpegError, decode_jpeg, encode_jpeg
from mycelium_ray.jpegprog import _SCAN_SCRIPT, encode_jpeg_progressive


def _img(kind: str, h: int, w: int, seed: int = 7) -> np.ndarray:
    rng = np.random.default_rng(seed)
    if kind == "noise":
        return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    if kind == "smooth":
        y = np.linspace(0, 255, h)[:, None]
        x = np.linspace(0, 255, w)[None, :]
        return np.stack([y + 0 * x, 0 * y + x, (y + x) / 2],
                        axis=-1).astype(np.uint8)
    if kind == "flat":
        return np.full((h, w, 3), 137, dtype=np.uint8)
    if kind == "checker":
        g = ((np.arange(h)[:, None] + np.arange(w)[None, :]) % 2) * 255
        return np.stack([g, 255 - g, g], axis=-1).astype(np.uint8)
    raise AssertionError(kind)


@pytest.mark.parametrize("kind", ["noise", "smooth", "flat", "checker"])
@pytest.mark.parametrize("shape", [(8, 8), (16, 24), (17, 31), (64, 64),
                                   (1, 1), (9, 130)])
def test_progressive_matches_baseline_bit_exact(kind, shape):
    img = _img(kind, *shape)
    base = decode_jpeg(encode_jpeg(img))
    prog = decode_jpeg(encode_jpeg_progressive(img))
    assert np.array_equal(base, prog)


def test_progressive_psnr_bound():
    img = _img("noise", 64, 64, seed=3)
    out = decode_jpeg(encode_jpeg_progressive(img))
    assert psnr(img, out) >= 40.0


def test_progressive_smaller_than_baseline_on_typical_content():
    # optimized per-scan Huffman + banding should not bloat the stream
    img = _img("smooth", 64, 64)
    assert len(encode_jpeg_progressive(img)) < len(encode_jpeg(img))


def test_decode_image_dispatch_reports_jpeg():
    img = _img("smooth", 16, 16)
    data = encode_image(img, "jpeg_progressive")
    px, fmt = decode_image(data)
    assert fmt == "jpeg"
    assert px.shape == (16, 16, 3)


def test_sof2_marker_present_and_baseline_decoder_not_used():
    data = encode_jpeg_progressive(_img("noise", 8, 8))
    assert b"\xFF\xC2" in data[:200]
    assert b"\xFF\xC0" not in data[:200]


@pytest.mark.parametrize("scans", [
    # spectral selection only, no successive approximation
    [((0, 1, 2), 0, 0, 0, 0),
     ((0,), 1, 63, 0, 0), ((1,), 1, 63, 0, 0), ((2,), 1, 63, 0, 0)],
    # fine band splits
    [((0, 1, 2), 0, 0, 0, 0),
     ((0,), 1, 2, 0, 0), ((0,), 3, 63, 0, 0),
     ((1,), 1, 10, 0, 0), ((1,), 11, 63, 0, 0),
     ((2,), 1, 63, 0, 0)],
    # deep successive approximation on luma AC
    [((0, 1, 2), 0, 0, 0, 2), ((0, 1, 2), 0, 0, 2, 1),
     ((0, 1, 2), 0, 0, 1, 0),
     ((0,), 1, 63, 0, 3), ((0,), 1, 63, 3, 2), ((0,), 1, 63, 2, 1),
     ((0,), 1, 63, 1, 0),
     ((1,), 1, 63, 0, 0), ((2,), 1, 63, 0, 0)],
])
def test_alternate_scan_scripts_round_trip(scans):
    img = _img("noise", 24, 40, seed=11)
    base = decode_jpeg(encode_jpeg(img))
    prog = decode_jpeg(encode_jpeg_progressive(img, scans=scans))
    assert np.array_equal(base, prog)


def test_eob_run_stress_many_empty_blocks():
    # mostly-flat image with one hot block: AC scans are one long EOB run
    # wrapped around a single coded block — exercises EOBn extension bits
    img = np.full((128, 128, 3), 100, dtype=np.uint8)
    img[64:72, 64:72] = _img("noise", 8, 8, seed=5)
    base = decode_jpeg(encode_jpeg(img))
    prog = decode_jpeg(encode_jpeg_progressive(img))
    assert np.array_equal(base, prog)


def test_refinement_correction_bits_sparse_extremes():
    # sparse large coefficients: refinement scans carry correction bits
    # for history coefficients across EOB runs (the G.1.2.3 buffering)
    rng = np.random.default_rng(13)
    img = np.full((64, 64, 3), 128, dtype=np.uint8)
    mask = rng.random((64, 64)) < 0.02
    img[mask] = 255
    base = decode_jpeg(encode_jpeg(img))
    prog = decode_jpeg(encode_jpeg_progressive(img))
    assert np.array_equal(base, prog)


def test_truncated_stream_raises_jpeg_error():
    data = encode_jpeg_progressive(_img("noise", 16, 16))
    for cut in (10, len(data) // 2, len(data) - 3):
        with pytest.raises(JpegError):
            decode_jpeg(data[:cut] + b"\xff\xd9")


def test_garbage_entropy_raises_jpeg_error():
    data = bytearray(encode_jpeg_progressive(_img("noise", 16, 16)))
    # stomp the middle of the last scan's entropy bytes
    data[len(data) - 40:len(data) - 20] = b"\x55" * 20
    with pytest.raises(JpegError):
        decode_jpeg(bytes(data))


def test_invalid_scan_scripts_rejected():
    img = _img("flat", 8, 8)
    with pytest.raises(ValueError):
        encode_jpeg_progressive(img, scans=[((0, 1), 1, 63, 0, 0)])
    with pytest.raises(ValueError):
        encode_jpeg_progressive(img, scans=[((0, 1, 2), 0, 5, 0, 0)])
    with pytest.raises(ValueError):
        encode_jpeg_progressive(img, scans=[((0,), 1, 63, 3, 1)])


def test_default_script_is_complete():
    # every (component, coefficient) reaches Al=0 exactly once
    for c in range(3):
        for k in range(64):
            chain = [(ss, se, ah, al) for comps, ss, se, ah, al
                     in _SCAN_SCRIPT
                     if c in comps and (ss <= k <= se or (k == 0 and
                                                          ss == 0))]
            chain = [(ss, se, ah, al) for ss, se, ah, al in chain
                     if ss <= k <= se]
            assert chain[0][2] == 0            # first scan has Ah=0
            assert chain[-1][3] == 0           # ends at full precision
            for (s0, e0, a0, l0), (s1, e1, a1, l1) in zip(chain,
                                                          chain[1:]):
                assert a1 == l0 and l1 == l0 - 1
