"""WARC (ISO 28500) codec + pipeline tests: record framing, digest
verification, deterministic repack, CDX random-access slicing, and the
image-payload byte pinning the SQL oracle can't express."""

import gzip
import os
import shutil

import pytest

from mycelium_ray.warc import (build_record, gzip_member, iter_members,
                               parse_record, payload_digest, read_warc_gz,
                               warc_date)
from mycelium_ray.pipelines import warcops

SF = "/root/testdata/sf0.001"


def _record(payload=b"hello warc", uri="http://a.example.com/x"):
    return build_record("resource", payload, target_uri=uri,
                        date=warc_date(800_000_000),
                        content_type="application/octet-stream")


def test_record_roundtrip():
    payload = b"\x00\x01binary payload\xff" * 7
    raw = _record(payload)
    headers, got = parse_record(raw)
    assert got == payload
    assert headers["WARC-Type"] == "resource"
    assert headers["WARC-Target-URI"] == "http://a.example.com/x"
    assert headers["Content-Length"] == str(len(payload))
    assert headers["WARC-Payload-Digest"] == payload_digest(payload)
    assert headers["WARC-Record-ID"].startswith("<urn:uuid:")


def test_parse_rejects_corruption():
    raw = bytearray(_record())
    # flip one payload byte -> digest mismatch must raise
    raw[raw.find(b"\r\n\r\n") + 5] ^= 0x40
    with pytest.raises(ValueError, match="digest"):
        parse_record(bytes(raw))
    with pytest.raises(ValueError, match="version"):
        parse_record(b"WARC/9.9\r\nContent-Length: 0\r\n\r\n\r\n\r\n")
    with pytest.raises(ValueError, match="truncated"):
        parse_record(_record()[:-10])


def test_record_id_deterministic_and_distinct():
    a1 = _record(b"payload A")
    a2 = _record(b"payload A")
    b = _record(b"payload B")
    assert a1 == a2                      # pure function of content
    hid = lambda r: parse_record(r)[0]["WARC-Record-ID"]
    assert hid(a1) != hid(b)             # distinct payloads, distinct ids


def test_pack_shard_deterministic_and_readable():
    rows = [(i, f"http://src{i % 3}.example.com/d/{i}/asset.png",
             warc_date(800_000_000 + i), "png",
             b"IMG%d" % i, f"caption {i}") for i in range(5)]
    s1 = warcops.pack_warc_shard(list(reversed(rows)))
    s2 = warcops.pack_warc_shard(rows)
    assert s1 == s2                      # order-independent, byte-identical
    recs = read_warc_gz(s1)
    # warcinfo + (resource + metadata) per doc
    assert len(recs) == 1 + 2 * len(rows)
    assert recs[0][2]["WARC-Type"] == "warcinfo"
    img = recs[1][2]
    cap = recs[2][2]
    assert img["WARC-Type"] == "resource"
    assert cap["WARC-Type"] == "metadata"
    # caption record links back to its image record
    assert cap["WARC-Concurrent-To"] == img["WARC-Record-ID"]
    assert recs[1][3] == b"IMG0"
    assert recs[2][3] == b"caption 0"


def test_cdx_random_access_slice():
    """The CDX contract: (offset, member_length) slices of the shard
    stream inflate + parse independently — one ranged read per record."""
    rows = [(i, f"http://src0.example.com/d/{i}/asset.png",
             warc_date(800_000_000 + i), "png",
             os.urandom(64), f"cap {i}") for i in range(4)]
    stream = warcops.pack_warc_shard(rows)
    members = list(iter_members(stream))
    assert members[-1][0] + members[-1][1] == len(stream)  # full coverage
    for off, rlen, inflated in members:
        sliced = stream[off:off + rlen]
        assert gzip.decompress(sliced) == inflated
        parse_record(inflated)           # verifies framing + digest


def test_surt():
    assert (warcops.surt("http://src7.example.com/d/9/asset.png")
            == "com,example,src7)/d/9/asset.png")
    assert (warcops.surt("http://host.example.com:8080/p")
            == "com,example,host)/p")


@pytest.fixture(scope="module")
def warc_dir(ray_session):
    d = warcops._warc_dir(SF)
    shutil.rmtree(d, ignore_errors=True)
    yield warcops._ensure_written(SF)
    shutil.rmtree(d, ignore_errors=True)


def test_warc_image_payload_byte_exact(warc_dir):
    """The oracle pins caption bytes via sha256; the image leg is pinned
    here — every resource payload read back from disk is byte-identical
    to the synth path's encoding for that doc (decoded-pixel parity
    follows from the codec round-trip suites)."""
    import duckdb

    from mycelium_ray.pipelines.flagship import synth_image_row

    con = duckdb.connect()
    docs = dict(con.execute(
        f"SELECT doc_id, text FROM '{SF}/documents.parquet'").fetchall())
    n_img = 0
    for fn in sorted(os.listdir(warc_dir)):
        if not fn.endswith(".warc.gz"):
            continue
        with open(os.path.join(warc_dir, fn), "rb") as f:
            stream = f.read()
        for _off, _rlen, headers, payload in read_warc_gz(stream):
            if headers["WARC-Type"] != "resource":
                continue
            doc_id = warcops._doc_id_of(headers["WARC-Target-URI"])
            want, _w, _h, fmt = synth_image_row(doc_id, docs[doc_id])
            assert payload == want
            assert headers["Content-Type"] == f"image/{fmt}"
            n_img += 1
    assert n_img == len(docs)


def test_warc_resume_skips_finished_shards(warc_dir):
    """skip-if-present: a shard's mtime must not change across a second
    _ensure_written call (the packing rerun re-does only missing work)."""
    p = os.path.join(warc_dir, "shard-00000.warc.gz")
    before = os.stat(p).st_mtime_ns
    os.remove(os.path.join(warc_dir, "_SUCCESS"))
    warcops._ensure_written(SF)
    assert os.stat(p).st_mtime_ns == before
    # and a from-scratch repack of a DELETED shard is byte-identical
    with open(p, "rb") as f:
        bytes_before = f.read()
    os.remove(p)
    os.remove(os.path.join(warc_dir, "_SUCCESS"))
    warcops._ensure_written(SF)
    with open(p, "rb") as f:
        assert f.read() == bytes_before


def test_revisit_dedup_pack(ray_session, tmp_path):
    """Revisit-dedup archive semantics beyond the oracle: duplicate
    payloads are stored ONCE — revisit members carry zero payload bytes
    but declare the original's digest, Refers-To names a real stored
    record, and the deduped shard set is strictly smaller than the full
    pack of the same corpus."""
    import os

    from mycelium_ray.pipelines import warcops
    from mycelium_ray.warc import read_warc_gz, record_id

    sf = "/root/testdata/sf0.001"
    full_dir = warcops._ensure_written(sf)
    dd_dir = str(tmp_path / "dedup")
    warcops.write_warc_dedup(sf, dd_dir)

    def total(d):
        return sum(os.path.getsize(os.path.join(d, f))
                   for f in os.listdir(d) if f.endswith(".warc.gz"))

    assert total(dd_dir) < total(full_dir)

    # collect all records across shards
    stored = {}    # digest -> (rid, uri)
    revisits = []
    for f in sorted(os.listdir(dd_dir)):
        if not f.endswith(".warc.gz"):
            continue
        with open(os.path.join(dd_dir, f), "rb") as fh:
            for _o, _l, h, payload in read_warc_gz(fh.read()):
                if h["WARC-Type"] == "resource":
                    stored[h["WARC-Payload-Digest"]] = (
                        h["WARC-Record-ID"], h["WARC-Target-URI"])
                elif h["WARC-Type"] == "revisit":
                    assert payload == b""
                    assert "identical-payload-digest" in h["WARC-Profile"]
                    revisits.append(h)
    assert revisits, "corpus must contain planted duplicates"
    for h in revisits:
        dig = h["WARC-Payload-Digest"]
        assert dig in stored, "revisit points at an unstored digest"
        rid, uri = stored[dig]
        assert h["WARC-Refers-To"] == rid
        assert h["WARC-Refers-To-Target-URI"] == uri
        # Refers-To id is recomputable from (uri, digest) — the
        # deterministic-record-id contract
        assert rid == f'<{record_id("resource", uri, dig)}>'
