"""Exif metadata for JPEG payloads: build, embed, extract, strip, and the
orientation transform — from the published Exif 2.3 / TIFF 6.0 layout,
numpy + stdlib only.

An Exif block is a TIFF structure (II/MM header + IFDs) wrapped in a JPEG
APP1 segment whose payload starts ``Exif\\0\\0``. The IFD walker is shared
with the TIFF codec (tiff._read_ifd). Scope:

- IFD0 tags: Make (271), Model (272), Orientation (274), DateTime (306),
  plus the Exif sub-IFD pointer (34665)
- Exif sub-IFD tags: DateTimeOriginal (36867), PixelXDimension (40962),
  PixelYDimension (40963)
- ``apply_orientation`` implements all 8 viewer transforms (Exif 2.3
  §4.6.4 table 6); 5-8 swap width/height
- ``strip_exif_jpeg`` drops every APP1 segment — the PII-hygiene step a
  training-data pipeline runs before publishing crawled images

Unknown tags are preserved on read (returned in the raw dict) and simply
absent from built blocks. No reference analog (the reference crawler never
reads image metadata); this extends the image-payload triage path of
BASELINE.json's input_hint.
"""

from __future__ import annotations

import struct

import numpy as np

from .tiff import TiffError, _read_ifd

_MAKE, _MODEL, _ORIENT, _DATETIME = 271, 272, 274, 306
_EXIF_IFD = 34665
_JPEG_IF, _JPEG_IF_LEN = 513, 514
_DT_ORIGINAL, _PIX_X, _PIX_Y = 36867, 40962, 40963

_EXIF_HDR = b"Exif\x00\x00"


class ExifError(ValueError):
    pass


# --------------------------------------------------------------------------
# build
# --------------------------------------------------------------------------
def build_exif(make: str = "", model: str = "", orientation: int = 1,
               datetime: str = "", pixel_w: int | None = None,
               pixel_h: int | None = None,
               thumbnail: bytes | None = None) -> bytes:
    """APP1 payload bytes (``Exif\\0\\0`` + little-endian TIFF block).

    ``thumbnail``: JPEG bytes embedded the camera way — IFD1 (linked
    from IFD0's next-IFD pointer) with Compression=6 and the
    JPEGInterchangeFormat/Length pair pointing at the appended stream
    (Exif 2.3 §4.6.3)."""
    if not 1 <= orientation <= 8:
        raise ValueError("orientation must be 1..8")

    entries0 = []   # (tag, type, count, raw little-endian value bytes)

    def ascii_ent(entries, tag, s):
        if s:
            raw = s.encode("ascii") + b"\x00"
            entries.append((tag, 2, len(raw), raw))

    ascii_ent(entries0, _MAKE, make)
    ascii_ent(entries0, _MODEL, model)
    entries0.append((_ORIENT, 3, 1, struct.pack("<H", orientation)))
    ascii_ent(entries0, _DATETIME, datetime)

    sub = []
    ascii_ent(sub, _DT_ORIGINAL, datetime)
    if pixel_w is not None:
        sub.append((_PIX_X, 4, 1, struct.pack("<I", pixel_w)))
    if pixel_h is not None:
        sub.append((_PIX_Y, 4, 1, struct.pack("<I", pixel_h)))

    # layout: header(8) | IFD0 | IFD0 out-of-line | sub-IFD | sub out-of-line
    n0 = len(entries0) + (1 if sub else 0)
    ifd0_off = 8
    ifd0_size = 2 + 12 * n0 + 4
    extra0 = bytearray()
    body0 = bytearray()

    def pack_entries(entries, base_off, extra, extra_base):
        out = bytearray()
        for tag, typ, cnt, raw in sorted(entries):
            if len(raw) <= 4:
                val = raw.ljust(4, b"\x00")
            else:
                val = struct.pack("<I", extra_base + len(extra))
                extra += raw
                if len(extra) & 1:
                    extra += b"\x00"
            out += struct.pack("<HHI", tag, typ, cnt) + val
        return out

    # first pass: sizes (out-of-line area for IFD0 follows its own table)
    extra0_base = ifd0_off + ifd0_size
    tmp_extra0 = bytearray()
    pack_entries(entries0, ifd0_off, tmp_extra0, extra0_base)
    sub_off = extra0_base + len(tmp_extra0)

    all0 = list(entries0)
    if sub:
        all0.append((_EXIF_IFD, 4, 1, struct.pack("<I", sub_off)))
    body0 += struct.pack("<H", n0)
    body0 += pack_entries(all0, ifd0_off, extra0, extra0_base)
    body0 += struct.pack("<I", 0)

    out = bytearray(b"II*\x00" + struct.pack("<I", ifd0_off))
    out += body0 + extra0
    assert len(out) == sub_off or not sub
    if sub:
        nsub = len(sub)
        sub_size = 2 + 12 * nsub + 4
        extra_sub = bytearray()
        body_sub = struct.pack("<H", nsub) \
            + pack_entries(sub, sub_off, extra_sub, sub_off + sub_size) \
            + struct.pack("<I", 0)
        out += body_sub + extra_sub
    if thumbnail is not None:
        # IFD1: Compression=6 (JPEG thumbnail), JPEGInterchangeFormat /
        # ...Length point at the stream appended right after the table
        ifd1_off = len(out)
        thumb_off = ifd1_off + 2 + 12 * 3 + 4
        ifd1 = struct.pack("<H", 3)
        ifd1 += struct.pack("<HHI", 259, 3, 1) + struct.pack("<HH", 6, 0)
        ifd1 += struct.pack("<HHI", _JPEG_IF, 4, 1) \
            + struct.pack("<I", thumb_off)
        ifd1 += struct.pack("<HHI", _JPEG_IF_LEN, 4, 1) \
            + struct.pack("<I", len(thumbnail))
        ifd1 += struct.pack("<I", 0)
        # IFD0's next-IFD pointer is the last 4 bytes of body0 — located
        # right before extra0 in the output
        next_ptr_at = 8 + len(body0) - 4
        struct.pack_into("<I", out, next_ptr_at, ifd1_off)
        out += ifd1 + thumbnail
    return _EXIF_HDR + bytes(out)


def insert_exif_jpeg(jpeg: bytes, exif_payload: bytes) -> bytes:
    """Insert an APP1 Exif segment right after SOI (before APP0, which is
    where real cameras put it; decoders skip both regardless)."""
    if jpeg[:2] != b"\xFF\xD8":
        raise ExifError("not a JPEG (missing SOI)")
    if len(exif_payload) + 2 > 0xFFFF:
        raise ExifError("Exif payload exceeds one APP1 segment")
    seg = b"\xFF\xE1" + struct.pack(">H", len(exif_payload) + 2) + exif_payload
    return jpeg[:2] + seg + jpeg[2:]


# --------------------------------------------------------------------------
# extract / strip
# --------------------------------------------------------------------------
def _iter_segments(jpeg: bytes):
    """Yield (marker, seg_start, seg_end) for length-prefixed segments up
    to SOS/EOI (the entropy stream is not walked)."""
    pos = 2
    n = len(jpeg)
    while pos + 4 <= n:
        if jpeg[pos] != 0xFF:
            return
        marker = jpeg[pos + 1]
        if marker == 0xFF:
            pos += 1
            continue
        if marker in (0xD8, 0xD9, 0xDA) or 0xD0 <= marker <= 0xD7:
            return
        (length,) = struct.unpack(">H", jpeg[pos + 2:pos + 4])
        if length < 2 or pos + 2 + length > n:
            return
        yield marker, pos, pos + 2 + length
        pos += 2 + length


def extract_exif_jpeg(jpeg: bytes) -> dict | None:
    """Parsed Exif dict, or None when the stream carries no Exif APP1.

    Keys: make, model, orientation, datetime, datetime_original,
    pixel_w, pixel_h (absent fields omitted)."""
    if jpeg[:2] != b"\xFF\xD8":
        raise ExifError("not a JPEG (missing SOI)")
    for marker, s, e in _iter_segments(jpeg):
        if marker != 0xE1 or jpeg[s + 4:s + 10] != _EXIF_HDR:
            continue
        return parse_exif_block(jpeg[s + 10:e])
    return None


def parse_exif_block(tiffdata: bytes) -> dict:
    """TIFF-structure bytes (after ``Exif\\0\\0``) → field dict."""
    if tiffdata[:4] == b"II*\x00":
        eb = "<"
    elif tiffdata[:4] == b"MM\x00*":
        eb = ">"
    else:
        raise ExifError("bad Exif TIFF header")
    # a fuzzed/corrupt block can put ANY type behind any tag (an ASCII
    # string where a LONG belongs, a rational where a SHORT belongs) —
    # every coercion failure is a malformed block, not a crash
    try:
        ifd0 = _read_ifd(tiffdata, eb)
        sub = {}
        if _EXIF_IFD in ifd0:
            sub = _read_ifd(tiffdata, eb, int(ifd0[_EXIF_IFD][0]))
        out = {}
        if _MAKE in ifd0:
            out["make"] = str(ifd0[_MAKE][0])
        if _MODEL in ifd0:
            out["model"] = str(ifd0[_MODEL][0])
        if _ORIENT in ifd0:
            out["orientation"] = int(ifd0[_ORIENT][0])
        if _DATETIME in ifd0:
            out["datetime"] = str(ifd0[_DATETIME][0])
        if _DT_ORIGINAL in sub:
            out["datetime_original"] = str(sub[_DT_ORIGINAL][0])
        if _PIX_X in sub:
            out["pixel_w"] = int(sub[_PIX_X][0])
        if _PIX_Y in sub:
            out["pixel_h"] = int(sub[_PIX_Y][0])
        # IFD1 (thumbnail): follow IFD0's next-IFD pointer
        (ifd0_off,) = struct.unpack(eb + "I", tiffdata[4:8])
        (n0,) = struct.unpack(eb + "H",
                              tiffdata[ifd0_off:ifd0_off + 2])
        nxt_at = ifd0_off + 2 + 12 * n0
        if nxt_at + 4 <= len(tiffdata):
            (ifd1_off,) = struct.unpack(eb + "I",
                                        tiffdata[nxt_at:nxt_at + 4])
            if ifd1_off:
                ifd1 = _read_ifd(tiffdata, eb, ifd1_off)
                if _JPEG_IF in ifd1 and _JPEG_IF_LEN in ifd1:
                    o = int(ifd1[_JPEG_IF][0])
                    ln = int(ifd1[_JPEG_IF_LEN][0])
                    blob = tiffdata[o:o + ln]
                    if len(blob) != ln:
                        raise ExifError("thumbnail overruns block")
                    out["thumbnail"] = blob
        return out
    except (TiffError, ValueError, TypeError, IndexError,
            struct.error) as e:
        raise ExifError(f"malformed Exif block: {e}") from e


def strip_exif_jpeg(jpeg: bytes) -> bytes:
    """Remove every APP1 segment (Exif and XMP both live there) — the
    metadata-hygiene pass. The entropy stream is untouched, so stripped
    images decode to identical pixels."""
    if jpeg[:2] != b"\xFF\xD8":
        raise ExifError("not a JPEG (missing SOI)")
    drops = [(s, e) for marker, s, e in _iter_segments(jpeg)
             if marker == 0xE1]
    if not drops:
        return jpeg
    out = bytearray()
    pos = 0
    for s, e in drops:
        out += jpeg[pos:s]
        pos = e
    out += jpeg[pos:]
    return bytes(out)


# --------------------------------------------------------------------------
# orientation (Exif 2.3 §4.6.4, tag 274)
# --------------------------------------------------------------------------
def apply_orientation(px: np.ndarray, orientation: int) -> np.ndarray:
    """Upright the pixel array per the Exif orientation tag — the
    transform a viewer applies before display. 5-8 swap w/h."""
    if orientation == 1:
        return px
    if orientation == 2:            # mirror horizontal
        return px[:, ::-1]
    if orientation == 3:            # rotate 180
        return px[::-1, ::-1]
    if orientation == 4:            # mirror vertical
        return px[::-1, :]
    if orientation == 5:            # transpose (mirror + 90 CW)
        return np.swapaxes(px, 0, 1)
    if orientation == 6:            # rotate 90 CW
        return np.rot90(px, k=-1)
    if orientation == 7:            # transverse (mirror + 90 CCW)
        return np.swapaxes(px[::-1, ::-1], 0, 1)
    if orientation == 8:            # rotate 90 CCW
        return np.rot90(px, k=1)
    raise ValueError("orientation must be 1..8")
