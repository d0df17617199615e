"""From-scratch baseline TIFF 6.0 codec (decode + encode), numpy only.

Scope (the baseline-TIFF profile that covers the overwhelming majority of
real .tif image payloads a crawler meets):

- byte order: decode both ``II`` (little) and ``MM`` (big endian);
  encode emits ``II``
- photometric 1 (BlackIsZero, 8-bit grayscale) and 2 (RGB, 8-bit/sample)
- compression 1 (none), 5 (LZW, TIFF flavor with *early change* and the
  4094-entry Clear discipline, spec §13), 32773 (PackBits, spec §9)
- predictor 1 (none) / 2 (horizontal differencing, spec §14) for LZW
- any strip layout (RowsPerStrip / StripOffsets / StripByteCounts);
  the encoder writes 16-row strips so multi-strip assembly is always
  exercised

Everything else (tiles, planar config 2, palettes, >8-bit samples, alpha)
raises ``TiffError`` with a clear message — the honest boundary, same
contract as the other from-scratch codecs here (jpeg.py, webp.py, gif.py).

Reference role: the decode/transcode surface of the reference crawler
(utils.cc charset/format sniffing → content decode) extended to the image
payload of BASELINE.json's input_hint; no reference code exists for TIFF —
this is ISO/Adobe TIFF 6.0 (1992) implemented from the published spec.
"""

from __future__ import annotations

import struct

import numpy as np


class TiffError(ValueError):
    pass


# IFD entry types we read; (struct char, size)
_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8}

# tags
_W, _H, _BITS, _COMP, _PHOTO = 256, 257, 258, 259, 262
_STRIP_OFF, _SPP, _ROWS_PER_STRIP, _STRIP_CNT = 273, 277, 278, 279
_PLANAR, _PREDICTOR = 284, 317


# --------------------------------------------------------------------------
# LZW (TIFF flavor: MSB-first bit packing, Clear=256, EOI=257, early change)
# --------------------------------------------------------------------------
_CLEAR, _EOI = 256, 257


def lzw_decode(data: bytes, expected: int | None = None) -> bytes:
    """TIFF §13 LZW decompressor. ``expected`` (decoded size) lets the
    strip reader stop at spurious trailing bits without a spec violation."""
    out = bytearray()
    # bit reader, MSB first
    bitpos = 0
    nbits = len(data) * 8

    def read(width: int) -> int:
        nonlocal bitpos
        if bitpos + width > nbits:
            return _EOI
        byte0 = bitpos >> 3
        # widths are ≤ 12, so 3 bytes always suffice
        chunk = int.from_bytes(data[byte0:byte0 + 3].ljust(3, b"\0"), "big")
        val = (chunk >> (24 - (bitpos & 7) - width)) & ((1 << width) - 1)
        bitpos += width
        return val

    width = 9
    table: list[bytes] = []
    prev: bytes | None = None

    def reset():
        nonlocal width, table, prev
        width = 9
        table = [bytes([i]) for i in range(256)] + [b"", b""]
        prev = None

    reset()
    while True:
        code = read(width)
        if code == _EOI:
            break
        if code == _CLEAR:
            reset()
            continue
        if prev is None:
            if code > 255:
                raise TiffError("LZW: first code after Clear not a literal")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise TiffError("LZW: code beyond table")
        out += entry
        prev = entry
        # early change (spec §13): the encoder bumps width when its next
        # assignable code hits 2^w - 1; the decoder's table lags the
        # encoder's by ONE entry (no entry for the first code after
        # Clear), so its bump point is 2^w - 2
        if len(table) == (1 << width) - 2 and width < 12:
            width += 1
        if expected is not None and len(out) >= expected:
            break
    return bytes(out)


def lzw_encode(data: bytes) -> bytes:
    """TIFF §13 LZW compressor (early change, Clear at 4094 entries)."""
    out = bytearray()
    acc = 0
    accbits = 0

    def write(code: int, width: int):
        nonlocal acc, accbits
        acc = (acc << width) | code
        accbits += width
        while accbits >= 8:
            accbits -= 8
            out.append((acc >> accbits) & 0xFF)

    width = 9
    table: dict[bytes, int] = {}

    def reset():
        nonlocal width, table
        width = 9
        table = {bytes([i]): i for i in range(256)}

    reset()
    nxt = 258
    write(_CLEAR, width)
    run = b""
    for i in range(len(data)):
        c = data[i:i + 1]
        cand = run + c
        if cand in table or (len(cand) == 1):
            if len(cand) == 1 and cand not in table:  # unreachable; literals preseeded
                table[cand] = ord(cand)
            run = cand
            continue
        write(table[run], width)
        table[cand] = nxt
        nxt += 1
        # early change: bump width as soon as the next assignable code
        # equals 2^width - 1 (decoder mirrors this exactly)
        if nxt == (1 << width) - 1 and width < 12:
            width += 1
        if nxt == 4094:  # spec: emit Clear before the table is full
            write(_CLEAR, width)
            reset()
            nxt = 258
        run = c
    if run:
        write(table[run], width)
    write(_EOI, width)
    if accbits:
        out.append((acc << (8 - accbits)) & 0xFF)
    return bytes(out)


# --------------------------------------------------------------------------
# PackBits (spec §9)
# --------------------------------------------------------------------------
def packbits_decode(data: bytes, expected: int) -> bytes:
    out = bytearray()
    i = 0
    n = len(data)
    while i < n and len(out) < expected:
        b = data[i]
        i += 1
        if b == 128:        # noop
            continue
        if b < 128:         # literal run of b+1
            out += data[i:i + b + 1]
            i += b + 1
        else:               # repeat next byte 257-b times
            if i >= n:
                raise TiffError("PackBits: truncated repeat")
            out += bytes([data[i]]) * (257 - b)
            i += 1
    if len(out) < expected:
        raise TiffError("PackBits: short strip")
    return bytes(out[:expected])


def packbits_encode(data: bytes) -> bytes:
    out = bytearray()
    i = 0
    n = len(data)
    while i < n:
        # find run length at i
        j = i + 1
        while j < n and j - i < 128 and data[j] == data[i]:
            j += 1
        if j - i >= 2:      # repeat run
            out.append(257 - (j - i))
            out.append(data[i])
            i = j
            continue
        # literal run: until the next ≥3-byte repeat or 128 bytes
        j = i + 1
        while j < n and j - i < 128:
            if j + 2 < n and data[j] == data[j + 1] == data[j + 2]:
                break
            j += 1
        out.append(j - i - 1)
        out += data[i:j]
        i = j
    return bytes(out)


# --------------------------------------------------------------------------
# decode
# --------------------------------------------------------------------------
def _read_ifd(data: bytes, eb: str, off: int | None = None):
    """Parse one IFD into {tag: [values]}. ``off`` names an explicit IFD
    offset (Exif sub-IFDs — exif.py); None reads it from the TIFF header."""
    if off is None:
        if len(data) < 8:
            raise TiffError("truncated TIFF header")
        (off,) = struct.unpack(eb + "I", data[4:8])
    if off + 2 > len(data):
        raise TiffError("IFD offset out of range")
    (n,) = struct.unpack(eb + "H", data[off:off + 2])
    tags: dict[int, list] = {}
    for k in range(n):
        e = off + 2 + 12 * k
        if e + 12 > len(data):
            raise TiffError("IFD entry overruns file")
        tag, typ, cnt = struct.unpack(eb + "HHI", data[e:e + 8])
        if typ not in _TYPE_SIZE or cnt == 0:
            continue
        size = _TYPE_SIZE[typ] * cnt
        if size <= 4:
            raw = data[e + 8:e + 8 + size]
        else:
            (voff,) = struct.unpack(eb + "I", data[e + 8:e + 12])
            raw = data[voff:voff + size]
            if len(raw) != size:
                raise TiffError(f"tag {tag}: value overruns file")
        if typ == 3:
            vals = list(struct.unpack(eb + "H" * cnt, raw))
        elif typ == 4:
            vals = list(struct.unpack(eb + "I" * cnt, raw))
        elif typ == 1:
            vals = list(raw)
        elif typ == 5:
            parts = struct.unpack(eb + "II" * cnt, raw)
            vals = [(parts[2 * i], parts[2 * i + 1]) for i in range(cnt)]
        else:  # ASCII
            vals = [raw.rstrip(b"\0").decode("latin-1")]
        tags[tag] = vals
    return tags


def decode_tiff(data: bytes) -> np.ndarray:
    """TIFF bytes → (h, w, 3) or (h, w) uint8 pixels."""
    if data[:4] == b"II*\0":
        eb = "<"
    elif data[:4] == b"MM\0*":
        eb = ">"
    else:
        raise TiffError("not a TIFF (bad byte-order header)")
    tags = _read_ifd(data, eb)
    try:
        # int() coercions: a corrupt IFD can put an ASCII or RATIONAL
        # value behind any tag — that's a malformed file, not a crash
        w = int(tags[_W][0])
        h = int(tags[_H][0])
        offs = [int(v) for v in tags[_STRIP_OFF]]
        cnts = [int(v) for v in tags[_STRIP_CNT]]
        spp = int(tags.get(_SPP, [1])[0])
        bits = [int(v) for v in tags.get(_BITS, [8] * max(spp, 1))]
        comp = int(tags.get(_COMP, [1])[0])
        photo = int(tags.get(_PHOTO, [1])[0])
        pred = int(tags.get(_PREDICTOR, [1])[0])
        planar = int(tags.get(_PLANAR, [1])[0])
        rps = int(tags.get(_ROWS_PER_STRIP, [h])[0])
    except KeyError as e:
        raise TiffError(f"missing required tag {e}") from e
    except (ValueError, TypeError) as e:
        raise TiffError(f"malformed tag value: {e}") from e
    if w <= 0 or h <= 0 or rps <= 0:
        raise TiffError("non-positive dimensions")
    if planar != 1:
        raise TiffError("planar configuration 2 unsupported")
    if any(b != 8 for b in bits):
        raise TiffError(f"bits-per-sample {bits} unsupported (8 only)")
    if (photo, spp) not in ((1, 1), (2, 3)):
        raise TiffError(f"photometric {photo} with {spp} samples unsupported")
    if comp not in (1, 5, 32773):
        raise TiffError(f"compression {comp} unsupported (1/5/32773 only)")
    if len(offs) != len(cnts):
        raise TiffError("StripOffsets/StripByteCounts length mismatch")
    row_bytes = w * spp
    raw = bytearray()
    for si, (o, c) in enumerate(zip(offs, cnts)):
        strip = data[o:o + c]
        if len(strip) != c:
            raise TiffError("strip overruns file")
        nrows = min(rps, h - si * rps)
        if nrows <= 0:
            raise TiffError("more strips than image rows")
        want = nrows * row_bytes
        if comp == 1:
            if len(strip) < want:
                raise TiffError("short uncompressed strip")
            dec = strip[:want]
        elif comp == 5:
            dec = lzw_decode(strip, want)
            if len(dec) < want:
                raise TiffError("short LZW strip")
            dec = dec[:want]
        else:
            dec = packbits_decode(strip, want)
        arr = np.frombuffer(dec, np.uint8).reshape(nrows, row_bytes)
        if pred == 2:
            # horizontal differencing: per row, per sample channel
            arr = arr.reshape(nrows, w, spp).astype(np.uint8)
            arr = np.cumsum(arr, axis=1, dtype=np.uint8)  # mod-256 undo
            arr = arr.reshape(nrows, row_bytes)
        elif pred != 1:
            raise TiffError(f"predictor {pred} unsupported")
        raw += arr.tobytes()
    if len(raw) != h * row_bytes:
        raise TiffError("strip data does not cover the image")
    px = np.frombuffer(bytes(raw), np.uint8)
    if spp == 3:
        return px.reshape(h, w, 3).copy()
    return px.reshape(h, w).copy()


# --------------------------------------------------------------------------
# encode
# --------------------------------------------------------------------------
_STRIP_ROWS = 16


def encode_tiff(pixels: np.ndarray, compression: str = "lzw",
                predictor: bool = True) -> bytes:
    """(h, w, 3) RGB8 or (h, w) gray8 → little-endian baseline TIFF.

    compression: "none" | "lzw" | "packbits"; ``predictor`` applies
    horizontal differencing (LZW only, where it's the win)."""
    px = np.ascontiguousarray(pixels, dtype=np.uint8)
    if px.ndim == 2:
        h, w = px.shape
        spp, photo = 1, 1
    elif px.ndim == 3 and px.shape[2] == 3:
        h, w, _ = px.shape
        spp, photo = 3, 2
    else:
        raise ValueError("expected (h, w, 3) or (h, w) uint8")
    comp = {"none": 1, "lzw": 5, "packbits": 32773}.get(compression)
    if comp is None:
        raise ValueError(f"compression {compression!r}")
    use_pred = predictor and comp == 5
    flat = px.reshape(h, w * spp)
    strips = []
    for y0 in range(0, h, _STRIP_ROWS):
        block = flat[y0:y0 + _STRIP_ROWS]
        if use_pred:
            a = block.reshape(-1, w, spp)
            d = a.copy()
            d[:, 1:, :] = a[:, 1:, :] - a[:, :-1, :]  # uint8 wraps mod 256
            block = d.reshape(-1, w * spp)
        raw = block.tobytes()
        if comp == 1:
            strips.append(raw)
        elif comp == 5:
            strips.append(lzw_encode(raw))
        else:
            strips.append(packbits_encode(raw))

    # layout: header(8) | strip data | IFD | out-of-line values
    out = bytearray(b"II*\0\0\0\0\0")
    offs = []
    for s in strips:
        offs.append(len(out))
        out += s
        if len(out) & 1:
            out += b"\0"   # word-align next strip (spec recommends)
    ifd_off = len(out)
    struct.pack_into("<I", out, 4, ifd_off)

    entries = []        # (tag, type, count, packed-value-or-None, values)
    extra = bytearray()  # out-of-line value area, appended after the IFD

    def ent(tag, typ, vals):
        cnt = len(vals)
        fmt = {3: "H", 4: "I"}[typ]
        raw = struct.pack("<" + fmt * cnt, *vals)
        entries.append((tag, typ, cnt, raw))

    ent(_W, 4, [w])
    ent(_H, 4, [h])
    ent(_BITS, 3, [8] * spp)
    ent(_COMP, 3, [comp])
    ent(_PHOTO, 3, [photo])
    ent(_STRIP_OFF, 4, offs)
    ent(_SPP, 3, [spp])
    ent(_ROWS_PER_STRIP, 4, [_STRIP_ROWS])
    ent(_STRIP_CNT, 4, [len(s) for s in strips])
    if use_pred:
        ent(_PREDICTOR, 3, [2])
    entries.sort()  # spec: entries in ascending tag order

    n = len(entries)
    ifd = bytearray(struct.pack("<H", n))
    extra_base = ifd_off + 2 + 12 * n + 4
    for tag, typ, cnt, raw in entries:
        if len(raw) <= 4:
            val = raw.ljust(4, b"\0")
        else:
            val = struct.pack("<I", extra_base + len(extra))
            extra += raw
            if len(extra) & 1:
                extra += b"\0"
        ifd += struct.pack("<HHI", tag, typ, cnt) + val
    ifd += struct.pack("<I", 0)  # next-IFD pointer: none
    return bytes(out + ifd + extra)


def probe_tiff_meta(data: bytes) -> tuple[int, int]:
    """(w, h) from the IFD only — no strip decode (the triage path)."""
    if data[:4] == b"II*\0":
        eb = "<"
    elif data[:4] == b"MM\0*":
        eb = ">"
    else:
        raise TiffError("not a TIFF")
    tags = _read_ifd(data, eb)
    try:
        return int(tags[_W][0]), int(tags[_H][0])
    except (KeyError, ValueError, TypeError) as e:
        raise TiffError("TIFF missing/malformed dimension tags") from e
