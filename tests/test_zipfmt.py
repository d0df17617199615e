"""From-scratch ZIP container (mycelium_ray/zipfmt.py): round trips,
determinism, STORE/DEFLATE selection, honest errors — and the real
correctness claim: byte-level interop with the stdlib ``zipfile``
module in BOTH directions. The zip_roundtrip pipeline key is covered by
the oracle parametrization in test_queries.py."""

import io
import random
import zipfile

import pytest

from mycelium_ray.zipfmt import ZipError, pack_zip, read_zip

MEMBERS = [("a/x.png", b"\x89PNG" + bytes(range(256)) * 4),
           ("a/x.txt", "caption ☃ text".encode()),
           ("empty.bin", b""),
           ("rep.bin", b"abc" * 5000)]


def test_roundtrip_and_determinism():
    blob = pack_zip(MEMBERS)
    assert read_zip(blob) == MEMBERS
    assert pack_zip(MEMBERS) == blob


def test_stdlib_reads_ours():
    zf = zipfile.ZipFile(io.BytesIO(pack_zip(MEMBERS)))
    assert zf.namelist() == [n for n, _ in MEMBERS]
    for n, payload in MEMBERS:
        assert zf.read(n) == payload
    assert zf.testzip() is None        # stdlib CRC pass over every member


@pytest.mark.parametrize("method", [zipfile.ZIP_DEFLATED, zipfile.ZIP_STORED])
def test_we_read_stdlib(method):
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", method) as z:
        for n, payload in MEMBERS:
            z.writestr(n, payload)
    assert dict(read_zip(buf.getvalue())) == dict(MEMBERS)


def test_incompressible_payload_stays_stored():
    rnd = bytes(random.Random(1).randrange(256) for _ in range(4000))
    blob = pack_zip([("r.bin", rnd)])
    # STORE chosen → archive isn't bigger than payload + headers
    assert len(blob) < len(rnd) + 200
    assert read_zip(blob) == [("r.bin", rnd)]


def test_corrupt_inputs_raise():
    blob = pack_zip(MEMBERS)
    with pytest.raises(ZipError):
        read_zip(blob[:-10])           # truncated EOCD/central dir
    b = bytearray(blob)
    b[60] ^= 0xFF                      # flip a payload byte → CRC
    with pytest.raises(ZipError):
        read_zip(bytes(b))
    with pytest.raises(ZipError):
        read_zip(b"not a zip at all")
