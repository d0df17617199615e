"""Exif layer (mycelium_ray/exif.py): APP1 build/embed/extract/strip
round trips, sub-IFD layout, orientation transform algebra, and honest
errors. The image_exif / image_autorotate pipeline keys are covered by
the oracle parametrization in test_queries.py."""

import struct

import numpy as np
import pytest

from mycelium_ray.exif import (ExifError, apply_orientation, build_exif,
                               extract_exif_jpeg, insert_exif_jpeg,
                               parse_exif_block, strip_exif_jpeg)
from mycelium_ray.imaging import decode_image, encode_image

RNG = np.random.default_rng(5)


def _jpeg(h=20, w=27):
    return encode_image(RNG.integers(0, 256, (h, w, 3), dtype=np.uint8),
                        "jpeg")


def test_full_lifecycle_roundtrip():
    jp = _jpeg()
    payload = build_exif(make="CamCo", model="X100", orientation=6,
                         datetime="2026:08:20 12:00:00",
                         pixel_w=27, pixel_h=20)
    tagged = insert_exif_jpeg(jp, payload)
    assert np.array_equal(decode_image(tagged)[0], decode_image(jp)[0])
    meta = extract_exif_jpeg(tagged)
    assert meta == {"make": "CamCo", "model": "X100", "orientation": 6,
                    "datetime": "2026:08:20 12:00:00",
                    "datetime_original": "2026:08:20 12:00:00",
                    "pixel_w": 27, "pixel_h": 20}
    assert strip_exif_jpeg(tagged) == jp


def test_untagged_returns_none_and_strip_is_noop():
    jp = _jpeg()
    assert extract_exif_jpeg(jp) is None
    assert strip_exif_jpeg(jp) is jp or strip_exif_jpeg(jp) == jp


def test_minimal_block_orientation_only():
    assert parse_exif_block(build_exif(orientation=3)[6:]) == {
        "orientation": 3}


def test_partial_fields_omitted():
    meta = parse_exif_block(build_exif(make="A", orientation=2)[6:])
    assert meta == {"make": "A", "orientation": 2}


def test_big_endian_block_parses():
    # handcraft an MM block with just Orientation=5
    body = (b"MM\x00*" + struct.pack(">I", 8)
            + struct.pack(">H", 1)
            + struct.pack(">HHI", 274, 3, 1) + struct.pack(">HH", 5, 0)
            + struct.pack(">I", 0))
    assert parse_exif_block(body) == {"orientation": 5}


def test_multiple_app1_segments_all_stripped():
    jp = _jpeg()
    tagged = insert_exif_jpeg(
        insert_exif_jpeg(jp, build_exif(orientation=2)),
        build_exif(orientation=7))
    assert extract_exif_jpeg(tagged)["orientation"] == 7  # first APP1 wins
    assert strip_exif_jpeg(tagged) == jp


def test_bad_inputs_raise():
    with pytest.raises(ExifError):
        insert_exif_jpeg(b"nope", build_exif(orientation=1))
    with pytest.raises(ExifError):
        parse_exif_block(b"XXXX\x00\x00\x00\x00")
    with pytest.raises(ValueError):
        build_exif(orientation=9)
    with pytest.raises(ValueError):
        apply_orientation(np.zeros((2, 2, 3), np.uint8), 0)


@pytest.mark.parametrize("o", range(1, 9))
def test_orientation_dims_and_inverse(o):
    px = RNG.integers(0, 256, (13, 21, 3), dtype=np.uint8)
    up = apply_orientation(px, o)
    assert up.shape[:2] == ((21, 13) if o >= 5 else (13, 21))
    inverse = {1: 1, 2: 2, 3: 3, 4: 4, 5: 5, 6: 8, 7: 7, 8: 6}[o]
    assert np.array_equal(apply_orientation(up, inverse), px)


def test_orientation_group_closure():
    # rotating 90 CW four times is the identity; mirror twice likewise
    px = RNG.integers(0, 256, (9, 14, 3), dtype=np.uint8)
    cur = px
    for _ in range(4):
        cur = apply_orientation(cur, 6)
    assert np.array_equal(cur, px)


def test_exif_survives_in_tagged_stream_after_probe():
    # header-only probe still reports the true dims on a tagged stream
    from mycelium_ray.imaging import probe_image_meta
    jp = _jpeg(18, 25)
    tagged = insert_exif_jpeg(jp, build_exif(orientation=6))
    assert probe_image_meta(tagged) == ("jpeg", 25, 18)


def test_thumbnail_lifecycle():
    from mycelium_ray.imaging import decode_image, psnr
    px = RNG.integers(0, 256, (32, 40, 3), dtype=np.uint8)
    th = px.reshape(16, 2, 20, 2, 3).mean(axis=(1, 3)).astype(np.uint8)
    thumb = encode_image(th, "jpeg")
    jp = encode_image(px, "jpeg")
    tagged = insert_exif_jpeg(jp, build_exif(make="C", orientation=1,
                                             thumbnail=thumb))
    meta = extract_exif_jpeg(tagged)
    assert meta["thumbnail"] == thumb
    tp, fmt = decode_image(meta["thumbnail"])
    assert fmt == "jpeg" and tp.shape == (16, 20, 3)
    assert psnr(tp, th) > 35
    # main image unaffected; strip removes IFD1 with everything else
    assert np.array_equal(decode_image(tagged)[0], decode_image(jp)[0])
    assert strip_exif_jpeg(tagged) == jp
    # blocks without a thumbnail don't grow the key
    m2 = extract_exif_jpeg(insert_exif_jpeg(jp, build_exif(orientation=2)))
    assert "thumbnail" not in m2
