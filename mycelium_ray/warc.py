"""From-scratch WARC (ISO 28500 / WARC/1.1) record writer + reader.

The Web ARChive format is the industry-standard crawl archive layout
(Common Crawl, Internet Archive): a stream of records, each a CRLF-line
header block + payload, conventionally stored one-gzip-member-per-record
so readers can seek to a record offset and inflate just that member.

Reference analog: larroy/mycelium persists fetched pages into MongoDB
(`crawler.cc` store path / `dist/` page tables); this module is the
archive-file dual of that store for the build brief's image+caption
corpus — same payloads, portable format, random-access via the CDX
index built in ``pipelines/warcops``.

Determinism contract (needed for byte-identical resume/repack, the same
property ``flagship.pack_tar`` gives tar shards): record ids are UUIDv5
of (type, uri, payload-digest), dates derive from doc metadata — never
wall clock — and gzip members are written with mtime=0, so a shard's
bytes are a pure function of its rows.

Everything here is stdlib (gzip/zlib, hashlib, uuid) + the WARC/1.1
spec; no warcio or other archive libraries involved.
"""

from __future__ import annotations

import base64
import gzip
import hashlib
import uuid
import zlib

CRLF = b"\r\n"
WARC_VERSION = b"WARC/1.1"

# fixed namespace for deterministic record ids (uuid5 over record identity)
_NS = uuid.UUID("6ba7b810-9dad-11d1-80b4-00c04fd430c8")  # RFC 4122 DNS ns


def payload_digest(payload: bytes) -> str:
    """``sha1:<base32>`` — the WARC-Payload-Digest convention used by
    Common Crawl / wget (RFC 4648 base32 of the SHA-1)."""
    return "sha1:" + base64.b32encode(
        hashlib.sha1(payload).digest()).decode("ascii")


def record_id(rec_type: str, target_uri: str, digest: str) -> str:
    """Deterministic ``urn:uuid:`` record id (UUIDv5 of the record's
    identity triple) — stable across repacks, unique across records."""
    u = uuid.uuid5(_NS, f"{rec_type}|{target_uri}|{digest}")
    return f"urn:uuid:{u}"


def warc_date(epoch_s: int) -> str:
    """ISO 8601 Z timestamp from an integer epoch (callers derive the
    epoch from row metadata, keeping records wall-clock-free)."""
    # time.gmtime is deterministic for a fixed epoch
    import time
    t = time.gmtime(int(epoch_s))
    return (f"{t.tm_year:04d}-{t.tm_mon:02d}-{t.tm_mday:02d}"
            f"T{t.tm_hour:02d}:{t.tm_min:02d}:{t.tm_sec:02d}Z")


def build_record(rec_type: str, payload: bytes, *,
                 target_uri: str | None = None,
                 date: str,
                 content_type: str,
                 extra: list[tuple[str, str]] | None = None,
                 digest: str | None = None) -> bytes:
    """Serialize ONE uncompressed WARC/1.1 record (header block +
    payload + the spec's two trailing CRLFs). ``digest`` overrides the
    computed WARC-Payload-Digest — a ``revisit`` record stores NO
    payload but still declares the digest of the deduplicated one
    (identical-payload-digest profile)."""
    if digest is None:
        digest = payload_digest(payload)
    rid = record_id(rec_type, target_uri or "", digest)
    headers: list[tuple[str, str]] = [
        ("WARC-Type", rec_type),
        ("WARC-Record-ID", f"<{rid}>"),
        ("WARC-Date", date),
    ]
    if target_uri is not None:
        headers.append(("WARC-Target-URI", target_uri))
    headers.append(("WARC-Payload-Digest", digest))
    if extra:
        headers.extend(extra)
    headers.append(("Content-Type", content_type))
    headers.append(("Content-Length", str(len(payload))))

    lines = [WARC_VERSION]
    lines += [f"{k}: {v}".encode("utf-8") for k, v in headers]
    return CRLF.join(lines) + CRLF + CRLF + payload + CRLF + CRLF


def gzip_member(record: bytes) -> bytes:
    """One deterministic gzip member per record (mtime=0) — the
    one-member-per-record convention that makes (offset, length) slices
    independently inflatable."""
    return gzip.compress(record, compresslevel=6, mtime=0)


def parse_record(raw: bytes) -> tuple[dict[str, str], bytes]:
    """Parse ONE uncompressed record → (headers, payload). Verifies the
    version line, Content-Length framing, and WARC-Payload-Digest."""
    sep = raw.find(CRLF + CRLF)
    if sep < 0:
        raise ValueError("warc: no header/payload separator")
    header_block = raw[:sep].split(CRLF)
    if header_block[0] != WARC_VERSION:
        raise ValueError(f"warc: bad version line {header_block[0]!r}")
    headers: dict[str, str] = {}
    for line in header_block[1:]:
        k, _, v = line.partition(b":")
        headers[k.decode("utf-8").strip()] = v.decode("utf-8").strip()
    n = int(headers["Content-Length"])
    payload = raw[sep + 4:sep + 4 + n]
    if len(payload) != n:
        raise ValueError("warc: truncated payload")
    if raw[sep + 4 + n:sep + 4 + n + 4] != CRLF + CRLF:
        raise ValueError("warc: missing record trailer")
    want = headers.get("WARC-Payload-Digest")
    # a revisit record declares the digest of the payload it does NOT
    # store (identical-payload-digest profile) — nothing to verify here;
    # the dedup reader checks it against the referred-to record instead
    if want and headers.get("WARC-Type") != "revisit" \
            and payload_digest(payload) != want:
        raise ValueError("warc: payload digest mismatch")
    return headers, payload


def iter_members(stream: bytes):
    """Walk a multi-member gzip stream → yields (offset, member_length,
    inflated_bytes) per member — the exact fields a CDX line carries."""
    pos = 0
    n = len(stream)
    while pos < n:
        d = zlib.decompressobj(wbits=31)
        inflated = d.decompress(stream[pos:])
        consumed = n - pos - len(d.unused_data)
        if not d.eof:
            raise ValueError("warc: truncated gzip member")
        yield pos, consumed, inflated
        pos += consumed


def read_warc_gz(stream: bytes):
    """Parse a ``.warc.gz`` shard → list of (offset, member_length,
    headers, payload) tuples, one per record."""
    out = []
    for off, rlen, raw in iter_members(stream):
        headers, payload = parse_record(raw)
        out.append((off, rlen, headers, payload))
    return out
