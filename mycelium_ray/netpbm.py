"""Netpbm (PPM/PGM) and TGA codecs — the remaining classic uncompressed
raster formats a crawler meets, numpy only, same honest-boundary
contract as the sibling codecs.

Netpbm: P6 (binary RGB) and P5 (binary gray) encode + decode, P3/P2
(ASCII) decode; maxval 255; comment lines handled per the spec.
TGA: type 2 (uncompressed true-color) and type 10 (RLE true-color)
encode + decode, 24/32 bpp, bottom-up or top-down via the descriptor
origin bit; type 3/11 grayscale decode. Everything else (palettes,
16 bpp) raises the module error.
"""

from __future__ import annotations

import struct

import numpy as np


class NetpbmError(ValueError):
    pass


class TgaError(ValueError):
    pass


# --------------------------------------------------------------------------
# netpbm
# --------------------------------------------------------------------------
def encode_ppm(pixels: np.ndarray) -> bytes:
    """(h, w, 3) RGB8 → P6, or (h, w) gray8 → P5."""
    px = np.ascontiguousarray(pixels, dtype=np.uint8)
    if px.ndim == 3 and px.shape[2] == 3:
        magic, h, w = b"P6", px.shape[0], px.shape[1]
    elif px.ndim == 2:
        magic, h, w = b"P5", px.shape[0], px.shape[1]
    else:
        raise ValueError("expected (h, w, 3) or (h, w) uint8")
    return magic + f"\n{w} {h}\n255\n".encode() + px.tobytes()


def _pnm_tokens(data: bytes, pos: int, n: int):
    """Yield n whitespace-separated tokens, skipping # comments."""
    out = []
    i = pos
    while len(out) < n:
        while i < len(data) and data[i:i + 1].isspace():
            i += 1
        if i < len(data) and data[i:i + 1] == b"#":
            j = data.find(b"\n", i)
            i = len(data) if j < 0 else j + 1
            continue
        j = i
        while j < len(data) and not data[j:j + 1].isspace():
            j += 1
        if j == i:
            raise NetpbmError("truncated header")
        out.append(data[i:j])
        i = j
    return out, i


def decode_ppm(data: bytes) -> np.ndarray:
    """P6/P5 (binary) or P3/P2 (ASCII) → RGB8 or gray8 pixels."""
    magic = data[:2]
    if magic not in (b"P6", b"P5", b"P3", b"P2"):
        raise NetpbmError("not a PPM/PGM")
    toks, pos = _pnm_tokens(data, 2, 3)
    try:
        w, h, maxval = (int(t) for t in toks)
    except ValueError as e:
        raise NetpbmError(f"bad header token: {e}") from e
    if w <= 0 or h <= 0:
        raise NetpbmError("bad dimensions")
    if maxval != 255:
        raise NetpbmError(f"maxval {maxval} unsupported (255 only)")
    ch = 3 if magic in (b"P6", b"P3") else 1
    n = w * h * ch
    if magic in (b"P6", b"P5"):
        raw = data[pos + 1:pos + 1 + n]   # single whitespace after maxval
        if len(raw) != n:
            raise NetpbmError("truncated pixel data")
        px = np.frombuffer(raw, np.uint8)
    else:
        toks, _ = _pnm_tokens(data, pos, n)
        try:
            vals = [int(t) for t in toks]
        except ValueError as e:
            raise NetpbmError(f"bad ASCII sample: {e}") from e
        if any(v < 0 or v > 255 for v in vals):
            raise NetpbmError("sample out of range")
        px = np.array(vals, np.uint8)
    return px.reshape(h, w, 3) if ch == 3 else px.reshape(h, w)


def probe_ppm_meta(data: bytes) -> tuple[int, int]:
    if data[:2] not in (b"P6", b"P5", b"P3", b"P2"):
        raise NetpbmError("not a PPM/PGM")
    toks, _ = _pnm_tokens(data, 2, 2)
    return int(toks[0]), int(toks[1])


# --------------------------------------------------------------------------
# TGA
# --------------------------------------------------------------------------
def encode_tga(pixels: np.ndarray, rle: bool = True) -> bytes:
    """(h, w, 3) RGB8 → TGA type 10 (RLE) or type 2, bottom-up, 24 bpp."""
    px = np.ascontiguousarray(pixels, dtype=np.uint8)
    if px.ndim != 3 or px.shape[2] != 3:
        raise ValueError("expected (h, w, 3) uint8")
    h, w, _ = px.shape
    bgr = px[::-1, :, ::-1]             # bottom-up rows, BGR order
    header = struct.pack("<BBBHHBHHHHBB", 0, 0, 10 if rle else 2,
                         0, 0, 0, 0, 0, w, h, 24, 0)
    if not rle:
        return header + bgr.tobytes()
    out = bytearray(header)
    flat = bgr.reshape(-1, 3)
    i = 0
    n = len(flat)
    row = w                              # RLE packets must not cross rows
    while i < n:
        row_end = (i // row + 1) * row
        j = i + 1
        while j < row_end and j - i < 128 and (flat[j] == flat[i]).all():
            j += 1
        if j - i >= 2:                  # run packet
            out.append(0x80 | (j - i - 1))
            out += flat[i].tobytes()
            i = j
            continue
        j = i + 1                        # raw packet
        while j < row_end and j - i < 128:
            if j + 1 < row_end and (flat[j] == flat[j + 1]).all():
                break
            j += 1
        out.append(j - i - 1)
        out += flat[i:j].tobytes()
        i = j
    return bytes(out)


def decode_tga(data: bytes) -> np.ndarray:
    """TGA type 2/10 (true-color) or 3/11 (gray) → RGB8 pixels."""
    if len(data) < 18:
        raise TgaError("truncated TGA header")
    (idlen, cmap_type, img_type, _cfirst, _clen, _csize, _x0, _y0,
     w, h, bpp, desc) = struct.unpack("<BBBHHBHHHHBB", data[:18])
    if cmap_type != 0:
        raise TgaError("palette TGA unsupported")
    if img_type not in (2, 3, 10, 11):
        raise TgaError(f"TGA image type {img_type} unsupported")
    gray = img_type in (3, 11)
    if gray and bpp != 8:
        raise TgaError("grayscale TGA must be 8 bpp")
    if not gray and bpp not in (24, 32):
        raise TgaError(f"{bpp} bpp unsupported (24/32)")
    if w <= 0 or h <= 0:
        raise TgaError("bad dimensions")
    nch = bpp // 8
    pos = 18 + idlen
    need = w * h * nch
    if img_type in (2, 3):
        raw = data[pos:pos + need]
        if len(raw) != need:
            raise TgaError("truncated pixel data")
        flat = np.frombuffer(raw, np.uint8)
    else:
        out = bytearray()
        i = pos
        nd = len(data)
        while len(out) < need:
            if i >= nd:
                raise TgaError("truncated RLE stream")
            pkt = data[i]
            i += 1
            cnt = (pkt & 0x7F) + 1
            if pkt & 0x80:               # run
                if i + nch > nd:
                    raise TgaError("truncated RLE run")
                out += data[i:i + nch] * cnt
                i += nch
            else:                        # raw
                if i + cnt * nch > nd:
                    raise TgaError("truncated RLE raw packet")
                out += data[i:i + cnt * nch]
                i += cnt * nch
        if len(out) != need:
            raise TgaError("RLE packet crosses image end")
        flat = np.frombuffer(bytes(out), np.uint8)
    if gray:
        img = flat.reshape(h, w)
        px = np.repeat(img[:, :, None], 3, axis=2)
    else:
        img = flat.reshape(h, w, nch)
        px = img[:, :, 2::-1]           # BGR(A) → RGB
    if not desc & 0x20:                 # origin bit: 0 = bottom-up
        px = px[::-1]
    return np.ascontiguousarray(px)


def probe_tga_meta(data: bytes) -> tuple[int, int]:
    if len(data) < 18:
        raise TgaError("truncated TGA header")
    w, h = struct.unpack("<HH", data[12:16])
    if data[1] not in (0, 1) or data[2] not in (1, 2, 3, 9, 10, 11):
        raise TgaError("not a TGA")
    return int(w), int(h)
