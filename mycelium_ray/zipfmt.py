"""From-scratch ZIP container (PKWARE APPNOTE layout): local file
headers + central directory + EOCD, methods STORE and DEFLATE (zlib raw
streams), CRC-32 verified on read. Deterministic output — fixed DOS
timestamp (1980-01-01), members written in the given order — so a shard
repack is byte-identical (the resume contract every archive writer in
this repo honors).

Interop is the correctness claim: tests/test_zipfmt.py round-trips both
directions against the stdlib ``zipfile`` module (our writer's output is
read by zipfile; zipfile's output is read by us), so this is the real
format, not a private dialect. ZIP64 is out of scope (shards are bounded
well under 4 GiB by construction); a central directory that needs it
raises ``ZipError``.
"""

from __future__ import annotations

import struct
import zlib

_LOCAL_SIG = b"PK\x03\x04"
_CENTRAL_SIG = b"PK\x01\x02"
_EOCD_SIG = b"PK\x05\x06"
_DOS_DATE = (0 << 9) | (1 << 5) | 1   # 1980-01-01, the DOS epoch
_DOS_TIME = 0


class ZipError(ValueError):
    pass


def pack_zip(members: list[tuple[str, bytes]], compress: bool = True) -> bytes:
    """[(name, payload)] → ZIP bytes. DEFLATE when it helps (and
    ``compress``), STORE otherwise — the same rule Info-ZIP applies."""
    out = bytearray()
    central = bytearray()
    for name, payload in members:
        raw = bytes(payload)
        nameb = name.encode("utf-8")
        crc = zlib.crc32(raw) & 0xFFFFFFFF
        comp = b""
        method = 0
        if compress and raw:
            d = zlib.compressobj(6, zlib.DEFLATED, -15)
            comp = d.compress(raw) + d.flush()
            if len(comp) < len(raw):
                method = 8
        data = comp if method == 8 else raw
        off = len(out)
        if off >= 0xFFFFFFFF or len(raw) >= 0xFFFFFFFF:
            raise ZipError("archive needs ZIP64 (out of scope)")
        hdr = struct.pack("<HHHHHIII", 20, 0, method, _DOS_TIME, _DOS_DATE,
                          crc, len(data), len(raw))
        out += _LOCAL_SIG + hdr + struct.pack("<HH", len(nameb), 0) + nameb
        out += data
        central += _CENTRAL_SIG + struct.pack("<H", 20) + hdr
        central += struct.pack("<HHHHHII", len(nameb), 0, 0, 0, 0, 0, off)
        central += nameb
    cd_off = len(out)
    out += central
    out += _EOCD_SIG + struct.pack("<HHHHIIH", 0, 0, len(members),
                                   len(members), len(central), cd_off, 0)
    return bytes(out)


def read_zip(data: bytes) -> list[tuple[str, bytes]]:
    """ZIP bytes → [(name, payload)] in central-directory order; CRC-32
    verified per member; malformed input raises ZipError."""
    # EOCD: scan back from the end (comment can push it inward)
    tail = data[-(0xFFFF + 22):]
    p = tail.rfind(_EOCD_SIG)
    if p < 0:
        raise ZipError("no end-of-central-directory record")
    eocd = tail[p:]
    if len(eocd) < 22:
        raise ZipError("truncated EOCD")
    try:
        (_dn, _cdn, n_here, n_total, cd_size, cd_off,
         _clen) = struct.unpack("<HHHHIIH", eocd[4:22])
    except struct.error as e:
        raise ZipError(f"malformed EOCD: {e}") from e
    if n_total == 0xFFFF or cd_off == 0xFFFFFFFF:
        raise ZipError("ZIP64 archives unsupported")
    pos = cd_off
    out: list[tuple[str, bytes]] = []
    for _ in range(n_total):
        if data[pos:pos + 4] != _CENTRAL_SIG:
            raise ZipError("bad central-directory entry signature")
        try:
            (_vmade, _vneed, _flags, method, _t, _d, crc, csize, usize,
             nlen, xlen, clen, _disk, _iattr, _eattr,
             lho) = struct.unpack("<HHHHHHIIIHHHHHII",
                                  data[pos + 4:pos + 46])
        except struct.error as e:
            raise ZipError(f"truncated central entry: {e}") from e
        try:
            name = data[pos + 46:pos + 46 + nlen].decode("utf-8")
        except UnicodeDecodeError as e:
            raise ZipError(f"undecodable member name: {e}") from e
        pos += 46 + nlen + xlen + clen
        # local header: skip to the payload (its own name/extra lengths
        # can differ from the central ones per spec)
        if data[lho:lho + 4] != _LOCAL_SIG or lho + 30 > len(data):
            raise ZipError(f"bad local header for {name!r}")
        lnlen, lxlen = struct.unpack("<HH", data[lho + 26:lho + 30])
        start = lho + 30 + lnlen + lxlen
        blob = data[start:start + csize]
        if len(blob) != csize:
            raise ZipError(f"member {name!r} overruns archive")
        if method == 0:
            raw = blob
        elif method == 8:
            try:
                raw = zlib.decompress(blob, -15)
            except zlib.error as e:
                raise ZipError(f"member {name!r}: corrupt deflate: {e}") \
                    from e
        else:
            raise ZipError(f"member {name!r}: method {method} unsupported")
        if len(raw) != usize:
            raise ZipError(f"member {name!r}: size mismatch")
        if zlib.crc32(raw) & 0xFFFFFFFF != crc:
            raise ZipError(f"member {name!r}: CRC mismatch")
        out.append((name, raw))
    return out
