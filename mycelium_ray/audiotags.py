"""Audio tag metadata: FLAC VORBIS_COMMENT blocks and MP3 ID3v2.4 tags —
set / get / strip, completing the per-container metadata family
(exif.py for JPEG, imaging PNG text chunks for PNG).

- FLAC: a VORBIS_COMMENT metadata block (type 4, RFC 9639 §8.6 carrying
  the Vorbis-comment layout: LE u32 lengths, ``KEY=value`` utf-8 pairs,
  keys case-insensitive, stored upper here) inserted after STREAMINFO.
  Metadata blocks are skipped by every decoder (ours included), so
  tagged streams decode sample-identically and strip restores the exact
  original bytes.
- MP3: an ID3v2.4 tag (syncsafe sizes, utf-8 text frames TIT2/TPE1/...)
  prepended to the frame stream; the frame-header walk in audiometa
  already skips ID3v2, so probing is tag-neutral.

No reference analog (the reference crawler reads no media metadata);
formats from the published FLAC/Vorbis-comment and id3.org v2.4 specs.
"""

from __future__ import annotations

import struct


class AudioTagError(ValueError):
    pass


# --------------------------------------------------------------------------
# FLAC VORBIS_COMMENT
# --------------------------------------------------------------------------
_VC_TYPE = 4


def _vc_body(tags: dict[str, str], vendor: str) -> bytes:
    out = bytearray()
    v = vendor.encode("utf-8")
    out += struct.pack("<I", len(v)) + v
    out += struct.pack("<I", len(tags))
    for k, val in tags.items():
        if "=" in k or not k.isascii() or not k:
            raise AudioTagError(f"bad comment key {k!r}")
        pair = f"{k.upper()}={val}".encode("utf-8")
        out += struct.pack("<I", len(pair)) + pair
    return bytes(out)


def _walk_flac_blocks(data: bytes):
    """Yield (pos, last, btype, length) for each metadata block."""
    if data[:4] != b"fLaC":
        raise AudioTagError("not a FLAC stream")
    pos = 4
    while True:
        if pos + 4 > len(data):
            raise AudioTagError("truncated metadata")
        hdr = data[pos]
        last = hdr >> 7
        btype = hdr & 0x7F
        ln = int.from_bytes(data[pos + 1:pos + 4], "big")
        if pos + 4 + ln > len(data):
            raise AudioTagError("metadata block overruns stream")
        yield pos, last, btype, ln
        pos += 4 + ln
        if last:
            return


def flac_set_tags(data: bytes, tags: dict[str, str],
                  vendor: str = "mycelium-ray") -> bytes:
    """Insert (or replace) the VORBIS_COMMENT block right after
    STREAMINFO. Audio frames are untouched."""
    stripped = flac_strip_tags(data)
    blocks = list(_walk_flac_blocks(stripped))
    first_pos, first_last, first_type, first_len = blocks[0]
    if first_type != 0:
        raise AudioTagError("first metadata block is not STREAMINFO")
    body = _vc_body(tags, vendor)
    if len(body) >= 1 << 24:
        raise AudioTagError("comment block too large")
    insert_at = first_pos + 4 + first_len
    vc_last = 1 if first_last else 0
    vc = bytes([(vc_last << 7) | _VC_TYPE]) \
        + len(body).to_bytes(3, "big") + body
    out = bytearray(stripped[:insert_at])
    if first_last:  # STREAMINFO was the last block: it no longer is
        out[first_pos] &= 0x7F
    out += vc + stripped[insert_at:]
    return bytes(out)


def flac_get_tags(data: bytes) -> dict[str, str]:
    """{KEY: value} from the first VORBIS_COMMENT block ({} if none)."""
    for pos, _last, btype, ln in _walk_flac_blocks(data):
        if btype != _VC_TYPE:
            continue
        body = data[pos + 4:pos + 4 + ln]
        try:
            (vlen,) = struct.unpack("<I", body[:4])
            p = 4 + vlen
            (n,) = struct.unpack("<I", body[p:p + 4])
            p += 4
            out = {}
            for _ in range(n):
                (plen,) = struct.unpack("<I", body[p:p + 4])
                p += 4
                pair = body[p:p + plen].decode("utf-8")
                p += plen
                k, _, v = pair.partition("=")
                out[k.upper()] = v
            return out
        except (struct.error, IndexError, UnicodeDecodeError) as e:
            raise AudioTagError(f"malformed VORBIS_COMMENT: {e}") from e
    return {}


def flac_strip_tags(data: bytes) -> bytes:
    """Drop every VORBIS_COMMENT block (metadata hygiene); fixes up the
    last-block flag so the stream stays well-formed."""
    blocks = list(_walk_flac_blocks(data))
    if not any(bt == _VC_TYPE for _, _, bt, _ in blocks):
        return data
    keep = [(p, bt, ln) for p, _, bt, ln in blocks if bt != _VC_TYPE]
    if not keep:
        raise AudioTagError("stream had only comment blocks")
    out = bytearray(b"fLaC")
    audio_start = blocks[-1][0] + 4 + blocks[-1][3]
    for i, (p, bt, ln) in enumerate(keep):
        last = 1 if i == len(keep) - 1 else 0
        out += bytes([(last << 7) | bt]) + ln.to_bytes(3, "big")
        out += data[p + 4:p + 4 + ln]
    out += data[audio_start:]
    return bytes(out)


# --------------------------------------------------------------------------
# MP3 ID3v2.4
# --------------------------------------------------------------------------
def _syncsafe(n: int) -> bytes:
    if n >= 1 << 28:
        raise AudioTagError("tag too large for syncsafe size")
    return bytes([(n >> 21) & 0x7F, (n >> 14) & 0x7F,
                  (n >> 7) & 0x7F, n & 0x7F])


def _unsyncsafe(b: bytes) -> int:
    if len(b) < 4:
        raise AudioTagError("truncated syncsafe size")
    return (b[0] & 0x7F) << 21 | (b[1] & 0x7F) << 14 \
        | (b[2] & 0x7F) << 7 | (b[3] & 0x7F)


def id3_build(frames: dict[str, str]) -> bytes:
    """ID3v2.4 tag bytes from {frame-id: text} (text frames only,
    utf-8 encoding byte 3, no unsynchronization, no footer)."""
    body = bytearray()
    for fid, text in frames.items():
        if len(fid) != 4 or not fid.isascii():
            raise AudioTagError(f"bad frame id {fid!r}")
        payload = b"\x03" + text.encode("utf-8")
        body += fid.encode("ascii") + _syncsafe(len(payload)) + b"\x00\x00"
        body += payload
    return b"ID3\x04\x00\x00" + _syncsafe(len(body)) + bytes(body)


def id3_parse(data: bytes) -> dict[str, str]:
    """{frame-id: text} from a leading ID3v2.3/2.4 tag ({} if absent)."""
    if data[:3] != b"ID3" or len(data) < 10:
        return {}
    ver = data[3]
    size = _unsyncsafe(data[6:10])
    end = 10 + size
    pos = 10
    if data[5] & 0x40:  # extended header present: skip it
        if len(data) < 14:
            raise AudioTagError("truncated extended header")
        if ver == 4:
            pos += _unsyncsafe(data[10:14])
        else:
            pos += 4 + struct.unpack(">I", data[10:14])[0]
    out = {}
    while pos + 10 <= min(end, len(data)):
        fid = data[pos:pos + 4]
        if fid == b"\x00\x00\x00\x00":
            break  # padding
        if not all(0x30 <= c <= 0x5A and (c <= 0x39 or c >= 0x41)
                   for c in fid):
            raise AudioTagError(f"bad frame id bytes {fid!r}")
        raw_sz = data[pos + 4:pos + 8]
        sz = _unsyncsafe(raw_sz) if ver == 4 \
            else struct.unpack(">I", raw_sz)[0]
        payload = data[pos + 10:pos + 10 + sz]
        if len(payload) != sz:
            raise AudioTagError("frame overruns tag")
        if fid[:1] == b"T" and payload:
            enc = payload[0]
            text = payload[1:]
            try:
                if enc == 0:
                    val = text.decode("latin-1")
                elif enc == 1:
                    val = text.decode("utf-16")
                elif enc == 2:
                    val = text.decode("utf-16-be")
                elif enc == 3:
                    val = text.decode("utf-8")
                else:
                    raise AudioTagError(f"unknown text encoding {enc}")
            except UnicodeDecodeError as e:
                raise AudioTagError(f"undecodable text frame: {e}") from e
            out[fid.decode("ascii")] = val.rstrip("\x00")
        pos += 10 + sz
    return out


def _id3_extent(data: bytes) -> int:
    """Byte length of a leading ID3v2 tag (0 if none)."""
    if data[:3] != b"ID3" or len(data) < 10:
        return 0
    n = 10 + _unsyncsafe(data[6:10])
    if data[5] & 0x10:  # footer flag
        n += 10
    return n


def mp3_set_tags(data: bytes, frames: dict[str, str]) -> bytes:
    """Prepend an ID3v2.4 tag (replacing any existing one)."""
    return id3_build(frames) + data[_id3_extent(data):]


def mp3_get_tags(data: bytes) -> dict[str, str]:
    return id3_parse(data)


def mp3_strip_tags(data: bytes) -> bytes:
    return data[_id3_extent(data):]
