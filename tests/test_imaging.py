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


def test_lossy_psnr_over_40():
    """jpeg is the (real) lossy format: >= 40 dB but not exact."""
    px = _img(4)
    data = encode_image(px, "jpeg")
    out, got_fmt = decode_image(data)
    assert got_fmt == "jpeg"
    assert sniff_format(data) == "jpeg"
    p = psnr(px, out)
    assert p >= 40.0, f"PSNR {p} < 40 dB"
    assert p != float("inf")  # genuinely lossy


def test_webp_vp8l_roundtrip_exact():
    """webp is the real VP8L LOSSLESS codec: bit-exact round trip."""
    px = _img(4)
    data = encode_image(px, "webp")
    out, got_fmt = decode_image(data)
    assert got_fmt == "webp"
    assert sniff_format(data) == "webp"
    assert (out == px).all()
    assert data[:4] == b"RIFF" and data[8:16] == b"WEBPVP8L"


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


def test_fake_lossy_codec_contract():
    """The stand-in codec must behave like a REAL lossy codec for the
    north-rule invariant to be exercised meaningfully: (a) deterministic
    byte output, (b) genuinely lossy (finite PSNR — quantization changes
    pixels), (c) PSNR >= 40 dB across content classes (noise, gradient,
    flat). Real libjpeg/libwebp are absent from this container (no
    PIL/cv2); imaging.encode_image raises NotImplementedError for any
    format beyond the documented stubs."""
    import numpy as np
    rng = np.random.default_rng(3)
    imgs = {
        "noise": rng.integers(0, 256, size=(40, 56, 3), dtype=np.uint8),
        "gradient": np.stack(np.meshgrid(
            np.arange(48), np.arange(32), indexing="ij"), axis=-1)
            .sum(axis=-1)[..., None].repeat(3, -1).astype(np.uint8),
        "flat": np.full((24, 24, 3), 130, dtype=np.uint8),
    }
    for fmt in ("jpeg", "webp"):
        for kind, px in imgs.items():
            b1 = encode_image(px, fmt)
            b2 = encode_image(px, fmt)
            assert b1 == b2, (fmt, kind)  # deterministic
            out, got_fmt = decode_image(b1)
            assert got_fmt == fmt
            p = psnr(px, out)
            assert p >= 40.0, (fmt, kind, p)
    # lossy in at least one content class (identity would make the PSNR
    # assertion vacuous)
    noisy = imgs["noise"]
    out, _ = decode_image(encode_image(noisy, "jpeg"))
    assert not np.array_equal(noisy, out)
    assert psnr(noisy, out) != float("inf")


def test_webp_vp8l_shape_sweep_and_error_paths():
    """VP8L round-trips bit-exactly across degenerate and odd shapes;
    lossy-VP8 chunks and truncated streams are rejected with WebpError
    (surfaced as ImageDecodeError through decode_image)."""
    import numpy as np
    import pytest

    from mycelium_ray.webp import (WebpError, decode_webp_lossless,
                                   encode_webp_lossless)
    rng = np.random.default_rng(7)
    for shape in [(1, 1, 3), (1, 64, 3), (64, 1, 3), (3, 5, 3),
                  (48, 33, 3), (129, 17, 3)]:
        px = rng.integers(0, 256, size=shape, dtype=np.uint8)
        out = decode_webp_lossless(encode_webp_lossless(px))
        assert (out == px).all(), shape
    with pytest.raises(WebpError):  # lossy VP8 chunk
        decode_webp_lossless(b"RIFF\x00\x00\x00\x00WEBPVP8 \x04\x00\x00\x00....")
    blob = encode_webp_lossless(
        rng.integers(0, 256, size=(8, 8, 3), dtype=np.uint8))
    with pytest.raises(WebpError):  # truncated entropy stream
        decode_webp_lossless(blob[:30])
    with pytest.raises(ImageDecodeError):  # surfaced through the dispatcher
        decode_image(blob[:30])


def test_vp8l_huffman_long_code_slow_path():
    """Codes longer than the 9-bit LUT root take the dict slow path —
    never produced by our encoder (lengths ≤ 8), so drive the decoder
    directly: a skewed canonical code with 12-bit leaves must round-trip
    every symbol, and a garbage 12-bit pattern must raise."""
    import pytest as _pytest
    from mycelium_ray.webp import (WebpError, _CanonDecoder, _LsbReader,
                                   _canonical_codes)
    # Kraft-complete skewed lengths: 1, 2, ..., 11, 12, 12
    lengths = list(range(1, 12)) + [12, 12]
    dec = _CanonDecoder(lengths)
    assert dec.maxlen == 12 and dec.rootbits == 9
    assert len(dec._long) == 4  # lengths 10, 11, 12, 12
    codes = _canonical_codes(lengths)

    def encode(symbols):
        acc = nbits = 0
        out = bytearray()
        for s in symbols:
            code, ln = codes[s]
            rev = int(f"{code:0{ln}b}"[::-1], 2)
            acc |= rev << nbits
            nbits += ln
            while nbits >= 8:
                out.append(acc & 0xFF)
                acc >>= 8
                nbits -= 8
        if nbits:
            out.append(acc & 0xFF)
        return bytes(out)

    symbols = [0, 12, 11, 1, 10, 9, 12, 0, 11, 5]
    br = _LsbReader(encode(symbols))
    assert [dec.decode(br) for s in symbols] == symbols

    # all-ones 12-bit pattern: descends past every root slot and misses
    # the long dict → must raise, not mis-decode
    br = _LsbReader(b"\xff\xff\xff")
    got = []
    with _pytest.raises(WebpError):
        for _ in range(30):
            got.append(dec.decode(br))
