"""Local-indexer source + scalar function library tests."""
import os

import numpy as np
import pytest

from mycelium_ray.functions.scalars import (
    casefold, fmt_bytes, fmt_kbytes_s, hex_to_sha1, sha1_to_hex, tokenize,
    uniq, valid_utf8, word_tokenize)
from mycelium_ray.imaging import encode_image
from mycelium_ray.sources.files import (
    file_url, filter_ascii_control, index_directory)


def test_fmt_bytes():
    assert fmt_bytes(512) == "512.00 iB"
    assert fmt_bytes(2048) == "2.05 KiB"       # decimal-1000 steps (quirk kept)
    assert fmt_bytes(3_000_000) == "3.00 MiB"
    assert fmt_kbytes_s(500) == "500.00 KB/s"
    assert fmt_kbytes_s(2500) == "2.50 MB/s"


def test_hex_codecs():
    d = bytes(range(20))
    assert hex_to_sha1(sha1_to_hex(d)) == d


def test_valid_utf8():
    assert valid_utf8("héllo".encode())
    assert not valid_utf8(b"\xff\xfe\xfd")


def test_uniq_stable():
    assert uniq([3, 1, 3, 2, 1]) == [3, 1, 2]


def test_tokenizers():
    assert tokenize("a b, c-d") == ["a", "b", "c", "d"]
    assert word_tokenize("don't stop 42") == ["don't", "stop", "42"]
    assert casefold("ÄBC") == "äbc"


def test_filter_ascii_control():
    # reference predicate (dist/local_indexer.py:36-37) keeps 0xA-0xD and
    # printable >0x1F except DEL; note TAB (0x9) is dropped (strict >)
    assert filter_ascii_control("a\x00b\tc\x7fd") == "abcd"
    assert filter_ascii_control("x\ny\rz") == "x\ny\rz"


def test_file_url():
    u = file_url("/tmp/x/../y.png")
    assert u.startswith("file:///") and ".." not in u


def test_index_directory(ray_session, tmp_path):
    rng = np.random.default_rng(3)
    for i, fmt in enumerate(["png", "jpeg", "webp"]):
        px = rng.integers(0, 256, size=(10, 10, 3), dtype=np.uint8)
        ext = fmt if fmt != "jpeg" else "jpg"
        (tmp_path / f"img{i}.{ext}").write_bytes(encode_image(px, fmt))
    (tmp_path / "broken.png").write_bytes(b"not an image")
    (tmp_path / "ignored.txt").write_text("not an image ext")

    ds = index_directory(str(tmp_path))
    df = ds.to_pandas()
    assert len(df) == 4  # 3 images + 1 broken; .txt gated out
    ok = df[df["http_code"] == 200]
    bad = df[df["http_code"] == 415]
    assert len(ok) == 3 and len(bad) == 1
    assert bad.iloc[0]["path"].endswith("broken.png")
    assert all(u.startswith("file:///") for u in df["url"])
    assert (ok["w"] == 10).all() and (ok["h"] == 10).all()
