"""Seeded mutation fuzz over every round-4 parser: corrupt bytes in a
crawl must surface as the module's typed error (becoming a decode_ok /
error row in the pipeline), NEVER as a raw struct.error / IndexError /
UnicodeDecodeError / zlib.error that would kill a map task. The same
harness at 15-30k mutations ran leak-free during development; this
seeded slice pins the fixes (IFD bounds, tag type coercions, syncsafe
guards, deflate wrapping)."""

import random

import numpy as np
import pytest

from mycelium_ray.audiotags import (AudioTagError, flac_get_tags,
                                    flac_set_tags, id3_build, id3_parse)
from mycelium_ray.bmp import BmpError, decode_bmp, encode_bmp
from mycelium_ray.dnsfixture import (DnsError, encode_response, parse_query,
                                     parse_response)
from mycelium_ray.exif import (ExifError, build_exif, extract_exif_jpeg,
                               insert_exif_jpeg, parse_exif_block)
from mycelium_ray.flac import encode_flac
from mycelium_ray.imaging import (ImageDecodeError, encode_image, encode_png,
                                  insert_png_text, png_text_chunks)
from mycelium_ray.tiff import TiffError, decode_tiff, encode_tiff, \
    probe_tiff_meta

PX = np.random.default_rng(0).integers(0, 256, (12, 15, 3), dtype=np.uint8)
N = 1500


def _mutations(base: bytes, seed: int):
    rng = random.Random(seed)
    for _ in range(N):
        b = bytearray(base)
        for _ in range(rng.randint(1, 6)):
            op = rng.random()
            if op < 0.5 and len(b) > 1:
                b[rng.randrange(len(b))] = rng.randrange(256)
            elif op < 0.8 and len(b) > 4:
                lo = rng.randrange(len(b) - 2)
                del b[lo:rng.randrange(lo, len(b) - 1) + 1]
            else:
                b[rng.randrange(len(b)):][:0] = bytes([rng.randrange(256)])
        yield bytes(b)


def _assert_typed(fn, base, errtypes, seed):
    for blob in _mutations(base, seed):
        try:
            fn(blob)
        except errtypes:
            pass
        # anything else propagates and fails the test with the real error


def test_tiff_decode_fuzz():
    _assert_typed(decode_tiff, encode_tiff(PX), (TiffError,), 11)


def test_tiff_probe_fuzz():
    _assert_typed(probe_tiff_meta, encode_tiff(PX), (TiffError,), 12)


def test_bmp_fuzz():
    _assert_typed(decode_bmp, encode_bmp(PX), (BmpError,), 13)


def _bmp_8bpp(w=4, h=3, n_pal=8):
    import struct
    pal = b"".join(struct.pack("<BBBB", i, i * 2, i * 3, 0)
                   for i in range(n_pal))
    stride = (w + 3) & ~3
    px = bytes((x % n_pal) for _ in range(h) for x in range(stride))
    off = 14 + 40 + len(pal)
    hdr = (b"BM" + struct.pack("<IHHI", off + len(px), 0, 0, off)
           + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 8, 0, len(px),
                         0, 0, n_pal, 0))
    return hdr + pal + px


def test_bmp_8bpp_truncated_palette_typed():
    """A palette region shorter than 4*n_pal (or not a multiple of 4)
    must raise BmpError, not numpy's reshape ValueError."""
    blob = _bmp_8bpp()
    assert decode_bmp(blob).shape == (3, 4, 3)
    for cut in (1, 2, 3, 5, 30):  # both %4 != 0 and whole-entry cuts
        with pytest.raises(BmpError):
            decode_bmp(blob[:len(blob) - cut])


def test_bmp_8bpp_fuzz():
    _assert_typed(decode_bmp, _bmp_8bpp(), (BmpError,), 27)


def test_exif_block_fuzz():
    base = build_exif(make="M", model="X", orientation=6,
                      datetime="2026:01:01 00:00:00",
                      pixel_w=3, pixel_h=4)[6:]
    _assert_typed(parse_exif_block, base, (ExifError,), 14)


def test_exif_jpeg_fuzz():
    base = insert_exif_jpeg(encode_image(PX, "jpeg"),
                            build_exif(orientation=3))
    _assert_typed(extract_exif_jpeg, base, (ExifError,), 15)


def test_flac_tags_fuzz():
    base = flac_set_tags(encode_flac(np.zeros(500, np.int16), 8000),
                         {"TITLE": "x"})
    _assert_typed(flac_get_tags, base, (AudioTagError,), 16)


def test_id3_fuzz():
    _assert_typed(id3_parse, id3_build({"TIT2": "abc", "TPE1": "def"}),
                  (AudioTagError,), 17)


def test_dns_response_fuzz():
    base = encode_response(7, "a.test", 1, ["1.2.3.4"])
    _assert_typed(lambda b: parse_response(b, 7, "a.test"), base,
                  (DnsError,), 18)


def test_dns_query_fuzz():
    base = (b"\x00\x07\x01\x00\x00\x01\x00\x00\x00\x00\x00\x00"
            b"\x01a\x04test\x00\x00\x01\x00\x01")
    _assert_typed(parse_query, base, (DnsError,), 19)


@pytest.mark.parametrize("kind", ["tEXt", "zTXt", "iTXt"])
def test_png_text_fuzz(kind):
    base = insert_png_text(encode_png(PX),
                           {"K": "value☃" if kind == "iTXt" else "value"},
                           kind)
    _assert_typed(png_text_chunks, base, (ImageDecodeError,), 20)


def test_zip_fuzz():
    from mycelium_ray.zipfmt import ZipError, pack_zip, read_zip
    base = pack_zip([("a.png", bytes(range(256)) * 3), ("a.txt", b"hello")])
    _assert_typed(read_zip, base, (ZipError,), 21)


def test_ppm_fuzz():
    from mycelium_ray.netpbm import NetpbmError, decode_ppm, encode_ppm
    _assert_typed(decode_ppm, encode_ppm(PX), (NetpbmError,), 22)


def test_tga_fuzz():
    from mycelium_ray.netpbm import TgaError, decode_tga, encode_tga
    _assert_typed(decode_tga, encode_tga(PX), (TgaError,), 23)
