"""PNG textual metadata (imaging.py tEXt/zTXt/iTXt): embed/extract/strip
round trips, all three chunk kinds, decode-neutrality, honest errors.
The image_png_text pipeline key is covered by the oracle parametrization
in test_queries.py."""

import numpy as np
import pytest

from mycelium_ray.imaging import (ImageDecodeError, decode_png, encode_png,
                                  insert_png_text, png_text_chunks,
                                  strip_png_text)

RNG = np.random.default_rng(9)


def _png():
    return encode_png(RNG.integers(0, 256, (8, 12, 3), dtype=np.uint8))


@pytest.mark.parametrize("kind", ["tEXt", "zTXt", "iTXt"])
def test_each_kind_roundtrip(kind):
    p = _png()
    text = "uni☃code" if kind == "iTXt" else "plain\xe9"
    tagged = insert_png_text(p, {"Key": text}, kind)
    assert png_text_chunks(tagged) == {"Key": text}
    assert np.array_equal(decode_png(tagged), decode_png(p))
    assert strip_png_text(tagged) == p


def test_mixed_kinds_accumulate():
    p = _png()
    t = insert_png_text(p, {"A": "1", "B": "2"}, "tEXt")
    t = insert_png_text(t, {"C": "c" * 300}, "zTXt")
    t = insert_png_text(t, {"D": "☃"}, "iTXt")
    assert png_text_chunks(t) == {"A": "1", "B": "2", "C": "c" * 300,
                                  "D": "☃"}
    assert strip_png_text(t) == p


def test_untagged_empty_and_strip_noop():
    p = _png()
    assert png_text_chunks(p) == {}
    assert strip_png_text(p) == p


def test_bad_inputs_raise():
    with pytest.raises(ImageDecodeError):
        png_text_chunks(b"not a png")
    with pytest.raises(ValueError):
        insert_png_text(_png(), {"": "x"}, "tEXt")       # empty keyword
    with pytest.raises(ValueError):
        insert_png_text(_png(), {"k" * 80: "x"}, "tEXt")  # >79 chars
    with pytest.raises(ValueError):
        insert_png_text(_png(), {"K": "x"}, "wEIRD")
