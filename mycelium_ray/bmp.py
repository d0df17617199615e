"""From-scratch Windows BMP codec (decode + encode), numpy only.

Scope: the classic uncompressed profile — BITMAPFILEHEADER +
BITMAPINFOHEADER (40 bytes), 24 bpp BI_RGB, bottom-up or top-down row
order, 4-byte row stride; decode additionally accepts 32 bpp BI_RGB
(alpha/padding byte dropped) and 8 bpp paletted. Everything else (RLE4/8,
bitfields, OS/2 cores, 1/4 bpp) raises ``BmpError`` — the honest boundary,
same contract as the sibling codecs (tiff.py, gif.py, jpeg.py).

No reference analog exists (the reference crawler never decodes pixels);
this extends the image-payload decode matrix of BASELINE.json's input_hint
from the published Windows GDI format layout.
"""

from __future__ import annotations

import struct

import numpy as np


class BmpError(ValueError):
    pass


def encode_bmp(pixels: np.ndarray) -> bytes:
    """(h, w, 3) RGB8 → 24-bpp bottom-up BI_RGB BMP bytes."""
    px = np.ascontiguousarray(pixels, dtype=np.uint8)
    if px.ndim != 3 or px.shape[2] != 3:
        raise ValueError("expected (h, w, 3) uint8")
    h, w, _ = px.shape
    stride = (w * 3 + 3) & ~3
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, :w * 3] = px[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up, BGR
    data = rows.tobytes()
    off = 14 + 40
    header = struct.pack("<2sIHHI", b"BM", off + len(data), 0, 0, off)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data),
                       2835, 2835, 0, 0)
    return header + info + data


def decode_bmp(data: bytes) -> np.ndarray:
    """BMP bytes → (h, w, 3) RGB8 pixels."""
    if data[:2] != b"BM" or len(data) < 54:
        raise BmpError("not a BMP")
    (off,) = struct.unpack("<I", data[10:14])
    hdr_size, w, h_signed = struct.unpack("<Iii", data[14:26])
    if hdr_size < 40:
        raise BmpError(f"header size {hdr_size} unsupported (BITMAPINFOHEADER+)")
    planes, bpp, comp = struct.unpack("<HHI", data[26:34])
    if planes != 1:
        raise BmpError("planes != 1")
    if comp != 0:
        raise BmpError(f"compression {comp} unsupported (BI_RGB only)")
    top_down = h_signed < 0
    h = -h_signed if top_down else h_signed
    if w <= 0 or h <= 0:
        raise BmpError("bad dimensions")
    if bpp == 24:
        stride = (w * 3 + 3) & ~3
        need = off + stride * h
        if len(data) < need:
            raise BmpError("truncated pixel array")
        rows = np.frombuffer(data[off:need], np.uint8).reshape(h, stride)
        px = rows[:, :w * 3].reshape(h, w, 3)[:, :, ::-1]  # BGR → RGB
    elif bpp == 32:
        stride = w * 4
        need = off + stride * h
        if len(data) < need:
            raise BmpError("truncated pixel array")
        rows = np.frombuffer(data[off:need], np.uint8).reshape(h, w, 4)
        px = rows[:, :, 2::-1]  # BGRA → RGB
    elif bpp == 8:
        (used,) = struct.unpack("<I", data[46:50])
        n_pal = used or 256
        pal_off = 14 + hdr_size
        if pal_off + 4 * n_pal > len(data):
            raise BmpError("truncated palette")
        pal = np.frombuffer(data[pal_off:pal_off + 4 * n_pal],
                            np.uint8).reshape(-1, 4)[:, 2::-1]  # BGRX → RGB
        stride = (w + 3) & ~3
        need = off + stride * h
        if len(data) < need:
            raise BmpError("truncated pixel array")
        idx = np.frombuffer(data[off:need], np.uint8).reshape(h, stride)[:, :w]
        if idx.max(initial=0) >= len(pal):
            raise BmpError("palette index out of range")
        px = pal[idx]
    else:
        raise BmpError(f"{bpp} bpp unsupported (8/24/32 only)")
    if not top_down:
        px = px[::-1]
    return np.ascontiguousarray(px)


def probe_bmp_meta(data: bytes) -> tuple[int, int]:
    """(w, h) from the info header only."""
    if data[:2] != b"BM" or len(data) < 26:
        raise BmpError("not a BMP")
    _, w, h = struct.unpack("<Iii", data[14:26])
    return int(w), int(abs(h))
