"""From-scratch GIF87a/89a codec (LZW) — the palette member of the image
codec family (png/jpeg/jpegprog/webp-VP8L live alongside in this package).

Implemented straight from the published GIF89a specification (CompuServe,
1990) and the Welch LZW paper (IEEE Computer, 1984), matching the honesty
contract of the other in-repo codecs: no image library, numpy only.

Reference analog: none (larroy/mycelium carries no GIF path); this serves
the build brief's multimodal image axis — GIF is the one mainstream web
image format the repo's codec family was still missing, and its animation
frames double as a third REAL video-ish container for the SampleFrames
stage (video.py:390 open_video dispatches animated GIFs here).

Scope (explicit, like the PNG/VP8L codecs' subsets):

- ENCODE: RGB8 frames sharing ONE global palette of ≤256 exact colors
  (GIF is a palette format — callers with truecolor content must
  quantize first; ``posterize_216`` provides the classic web-safe cube).
  Multi-frame input emits GIF89a with per-frame Graphic Control
  Extensions and a NETSCAPE2.0 loop block; single-frame emits minimal
  GIF89a. Output is byte-deterministic for identical input.
- DECODE: any GIF87a/89a stream with global and/or local color tables,
  interlaced or not, full or partial frame rects, transparency, and
  disposal methods 0/1 (leave) and 2 (restore background). Disposal 3
  (restore previous) raises GifError — a documented subset boundary.
- LZW: variable-width 3..12-bit codes, LSB-first packing, CLEAR/EOI
  handling, the KwKwK corner case, and encoder table reset at 4096.
"""

from __future__ import annotations

import struct

import numpy as np

GIF87 = b"GIF87a"
GIF89 = b"GIF89a"
_MAX_CODE_WIDTH = 12


class GifError(ValueError):
    pass


# ==========================================================================
# LZW (GIF variant): LSB-first bit packing, ≤255-byte data sub-blocks
# ==========================================================================
def _lzw_encode(indices: np.ndarray, min_code_size: int) -> bytes:
    """Index stream → LZW code bytes (NOT sub-block framed)."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    width = min_code_size + 1
    table: dict[tuple[int, int], int] = {}
    next_code = eoi + 1
    emit(clear, width)
    seq = indices.tolist()
    if not seq:
        emit(eoi, width)
        if nbits:
            out.append(acc & 0xFF)
        return bytes(out)
    prefix = seq[0]
    for c in seq[1:]:
        key = (prefix, c)
        code = table.get(key)
        if code is not None:
            prefix = code
            continue
        emit(prefix, width)
        table[key] = next_code
        next_code += 1
        # the decoder's table stays ONE entry behind (its first data code
        # appends nothing), so it widens when len(table) == 1<<width; the
        # encoder mirrors that point as next_code == (1<<width) + 1
        if next_code == (1 << width) + 1 and width < _MAX_CODE_WIDTH:
            width += 1
        elif next_code == (1 << _MAX_CODE_WIDTH):
            emit(clear, width)
            table.clear()
            next_code = eoi + 1
            width = min_code_size + 1
        prefix = c
    emit(prefix, width)
    emit(eoi, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _lzw_decode(data: bytes, min_code_size: int, n_pixels: int) -> np.ndarray:
    """LZW code bytes (sub-blocks already joined) → uint8 index array."""
    if not 2 <= min_code_size <= 8:     # palette ≤ 256 ⇒ roots ≤ 256
        raise GifError(f"bad LZW minimum code size {min_code_size}")
    clear = 1 << min_code_size
    eoi = clear + 1
    base = [bytes([i]) for i in range(clear)] + [b"", b""]
    table = list(base)
    width = min_code_size + 1
    out = bytearray()
    acc = 0
    nbits = 0
    pos = 0
    n = len(data)
    prev: int | None = None
    while len(out) < n_pixels:
        while nbits < width:
            if pos >= n:
                raise GifError("LZW stream truncated")
            acc |= data[pos] << nbits
            pos += 1
            nbits += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            table = list(base)
            width = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            if code >= len(table):
                raise GifError("first LZW code not a root")
            out.extend(table[code])
            prev = code
            continue
        if code < len(table):
            entry = table[code]
        elif code == len(table):           # KwKwK
            entry = table[prev] + table[prev][:1]
        else:
            raise GifError("LZW code out of range")
        out.extend(entry)
        table.append(table[prev] + entry[:1])
        prev = code
        if len(table) == (1 << width) and width < _MAX_CODE_WIDTH:
            width += 1
    if len(out) < n_pixels:
        raise GifError("LZW output short of frame size")
    return np.frombuffer(bytes(out[:n_pixels]), dtype=np.uint8)


def _sub_blocks(data: bytes) -> bytes:
    out = bytearray()
    for i in range(0, len(data), 255):
        chunk = data[i:i + 255]
        out.append(len(chunk))
        out.extend(chunk)
    out.append(0)
    return bytes(out)


def _join_sub_blocks(data: bytes, pos: int) -> tuple[bytes, int]:
    out = bytearray()
    while True:
        if pos >= len(data):
            raise GifError("truncated sub-block stream")
        n = data[pos]
        pos += 1
        if n == 0:
            return bytes(out), pos
        if pos + n > len(data):
            raise GifError("truncated sub-block")
        out.extend(data[pos:pos + n])
        pos += n


# ==========================================================================
# palette helpers
# ==========================================================================
def build_palette(frames: list[np.ndarray]) -> tuple[np.ndarray, list[np.ndarray]]:
    """Exact shared palette: (palette (k,3) uint8 sorted, index frames).

    Raises GifError if the frames hold > 256 distinct colors — GIF is a
    palette format; quantize first (see posterize_216)."""
    flat = np.concatenate([np.ascontiguousarray(f, dtype=np.uint8)
                           .reshape(-1, 3) for f in frames], axis=0)
    packed = (flat[:, 0].astype(np.uint32) << 16 \
              | flat[:, 1].astype(np.uint32) << 8 | flat[:, 2])
    colors = np.unique(packed)
    if len(colors) > 256:
        raise GifError(f"{len(colors)} distinct colors — GIF holds ≤256; "
                       "quantize first (posterize_216)")
    palette = np.stack([(colors >> 16) & 0xFF, (colors >> 8) & 0xFF,
                        colors & 0xFF], axis=1).astype(np.uint8)
    idx_frames = []
    for f in frames:
        p = (f[..., 0].astype(np.uint32) << 16
             | f[..., 1].astype(np.uint32) << 8 | f[..., 2].astype(np.uint32))
        idx_frames.append(np.searchsorted(colors, p.ravel())
                          .astype(np.uint8).reshape(f.shape[:2]))
    return palette, idx_frames


def posterize_216(px: np.ndarray) -> np.ndarray:
    """Map RGB8 to the classic 6×6×6 web-safe cube (the standard GIF
    quantization baseline) — ≤216 colors, safe for encode_gif."""
    q = (px.astype(np.uint16) + 25) // 51
    return (np.minimum(q, 5) * 51).astype(np.uint8)


# ==========================================================================
# encode
# ==========================================================================
def encode_gif(frames: np.ndarray | list[np.ndarray],
               delays_cs: list[int] | None = None,
               loop: int = 0) -> bytes:
    """RGB8 frame(s) → GIF bytes (GIF89a; exact palette, see module doc).

    ``frames``: one (h,w,3) array or a list of same-shaped arrays.
    ``delays_cs``: per-frame delay in centiseconds (animation only).
    ``loop``: NETSCAPE loop count, 0 = forever (animation only)."""
    if isinstance(frames, np.ndarray):
        frames = [frames]
    if not frames:
        raise GifError("no frames")
    shapes = {f.shape for f in frames}
    if len(shapes) != 1 or frames[0].ndim != 3 or frames[0].shape[2] != 3:
        raise GifError("frames must share one (h, w, 3) shape")
    h, w, _ = frames[0].shape
    if not (0 < w < 65536 and 0 < h < 65536):
        raise GifError("dimensions out of GIF range")
    palette, idx_frames = build_palette([np.asarray(f, np.uint8)
                                         for f in frames])
    pal_bits = max(1, int(len(palette) - 1).bit_length())   # table size 2^n
    pal_size = 1 << pal_bits
    pal_bytes = np.zeros((pal_size, 3), dtype=np.uint8)
    pal_bytes[:len(palette)] = palette
    mcs = max(2, pal_bits)

    out = bytearray(GIF89)
    # logical screen descriptor: global table flag, color res, size bits
    out += struct.pack("<HHBBB", w, h,
                       0x80 | ((pal_bits - 1) << 4) | (pal_bits - 1), 0, 0)
    out += pal_bytes.tobytes()
    animated = len(frames) > 1
    if animated:
        out += b"\x21\xff\x0bNETSCAPE2.0\x03\x01" \
               + struct.pack("<H", loop) + b"\x00"
    if delays_cs is None:
        delays_cs = [10] * len(frames)
    if len(delays_cs) != len(frames):
        raise GifError("delays_cs length mismatch")
    for idx, delay in zip(idx_frames, delays_cs):
        if animated:
            # GCE: disposal 1 (leave), no transparency
            out += b"\x21\xf9\x04" + bytes([0x04]) \
                   + struct.pack("<H", delay) + b"\x00\x00"
        out += b"\x2c" + struct.pack("<HHHH", 0, 0, w, h) + b"\x00"
        out.append(mcs)
        out += _sub_blocks(_lzw_encode(idx.ravel(), mcs))
    out.append(0x3B)
    return bytes(out)


# ==========================================================================
# decode
# ==========================================================================
_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _deinterlace(rows: np.ndarray) -> np.ndarray:
    h = rows.shape[0]
    order = np.concatenate([np.arange(start, h, step)
                            for start, step in _INTERLACE_PASSES])
    out = np.empty_like(rows)
    out[order] = rows
    return out


def _parse(data: bytes, want_frames: bool):
    """Shared walker → (w, h, frames list | n_frames, n_loops|None).

    With want_frames=False only counts image descriptors (header-only
    triage: skips every data sub-block without LZW work)."""
    if data[:6] not in (GIF87, GIF89):
        raise GifError("not a GIF")
    if len(data) < 13:
        raise GifError("truncated GIF header")
    w, h, packed, _bg, _ar = struct.unpack("<HHBBB", data[6:13])
    if w == 0 or h == 0:
        raise GifError("zero-size logical screen")
    pos = 13
    global_pal = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        if pos + 3 * n > len(data):
            raise GifError("truncated global color table")
        global_pal = np.frombuffer(data[pos:pos + 3 * n],
                                   dtype=np.uint8).reshape(n, 3)
        pos += 3 * n
    canvas = np.zeros((h, w, 3), dtype=np.uint8)
    if global_pal is not None:
        canvas[:] = global_pal[min(_bg, len(global_pal) - 1)]
    bg = canvas[0, 0].copy()
    frames: list[np.ndarray] = []
    n_frames = 0
    loops = None
    transparent = None
    disposal = 0
    total_delay_cs = 0
    saw_gce = False
    while pos < len(data):
        b = data[pos]
        pos += 1
        if b == 0x3B:                      # trailer
            break
        if b == 0x21:                      # extension
            if pos >= len(data):
                raise GifError("truncated extension")
            label = data[pos]
            pos += 1
            if label == 0xF9:                      # graphic control
                body, npos = _join_sub_blocks(data, pos)
                if len(body) >= 4:
                    flags = body[0]
                    disposal = (flags >> 2) & 0x07
                    transparent = body[3] if flags & 0x01 else None
                    total_delay_cs += struct.unpack("<H", body[1:3])[0]
                    saw_gce = True
                pos = npos
            elif label == 0xFF:                    # application
                body, npos = _join_sub_blocks(data, pos)
                if body[:11] == b"NETSCAPE2.0" and len(body) >= 14:
                    loops = struct.unpack("<H", body[12:14])[0]
                pos = npos
            else:
                _, pos = _join_sub_blocks(data, pos)
            continue
        if b != 0x2C:
            raise GifError(f"unexpected GIF block 0x{b:02x}")
        if pos + 9 > len(data):
            raise GifError("truncated image descriptor")
        fx, fy, fw, fh, fpk = struct.unpack("<HHHHB", data[pos:pos + 9])
        pos += 9
        pal = global_pal
        if fpk & 0x80:
            n = 2 << (fpk & 0x07)
            if pos + 3 * n > len(data):
                raise GifError("truncated local color table")
            pal = np.frombuffer(data[pos:pos + 3 * n],
                                dtype=np.uint8).reshape(n, 3)
            pos += 3 * n
        if pos >= len(data):
            raise GifError("missing LZW minimum code size")
        mcs = data[pos]
        pos += 1
        if not want_frames:
            _, pos = _join_sub_blocks(data, pos)
            n_frames += 1
            continue
        if pal is None:
            raise GifError("frame without any color table")
        if fx + fw > w or fy + fh > h:
            raise GifError("frame rect exceeds logical screen")
        lzw, pos = _join_sub_blocks(data, pos)
        idx = _lzw_decode(lzw, mcs, fw * fh).reshape(fh, fw)
        if fpk & 0x40:
            idx = _deinterlace(idx)
        if idx.max(initial=0) >= len(pal):
            raise GifError("pixel index outside color table")
        rect = pal[idx]
        if transparent is not None:
            keep = idx != transparent
            base = canvas[fy:fy + fh, fx:fx + fw]
            rect = np.where(keep[..., None], rect, base)
        canvas[fy:fy + fh, fx:fx + fw] = rect
        frames.append(canvas.copy())
        if disposal == 2:                  # restore to background color
            canvas[fy:fy + fh, fx:fx + fw] = bg
        elif disposal == 3:
            raise GifError("disposal 3 (restore previous) unsupported "
                           "(documented subset boundary)")
        transparent = None
        disposal = 0
    duration_ms = 10 * total_delay_cs if saw_gce else -1
    if want_frames:
        if not frames:
            raise GifError("GIF with no image data")
        return w, h, frames, loops, duration_ms
    return w, h, n_frames, loops, duration_ms


def decode_gif_frames(data: bytes) -> list[np.ndarray]:
    """GIF bytes → list of composited full-canvas (h,w,3) uint8 frames."""
    return _parse(data, want_frames=True)[2]


def decode_gif(data: bytes) -> np.ndarray:
    """GIF bytes → first composited frame (h,w,3) uint8."""
    return decode_gif_frames(data)[0]


def probe_gif_meta(data: bytes) -> dict:
    """Header-only triage: dims + frame count + loop + total duration,
    NO pixel decode (sub-blocks are length-skipped, LZW never touched).
    duration_ms sums the GCE delays; -1 when the GIF carries no GCE."""
    w, h, n_frames, loops, duration_ms = _parse(data, want_frames=False)
    return {"format": "gif", "width": int(w), "height": int(h),
            "n_frames": int(n_frames),
            "animated": n_frames > 1,
            "duration_ms": int(duration_ms),
            "loop_count": -1 if loops is None else int(loops)}


class GifClip:
    """Animated-GIF clip reader with the video.py open_video interface
    (n_frames / frame_rgb / frame_encoded / frame_pair) so SampleFrames
    treats GIF as a third real container alongside MJPEG-AVI and Y4M.

    GIF frames composite sequentially, so random access decodes frames
    0..i once and memoizes the list (clips are short by construction;
    the SampleFrames contract of 'cost ∝ n_samples' holds per unique
    prefix, matching Y4mClip's decode-on-demand spirit)."""

    def __init__(self, data: bytes):
        meta = probe_gif_meta(data)
        self._data = data
        self._n = meta["n_frames"]
        self.width = meta["width"]
        self.height = meta["height"]
        self._frames: list[np.ndarray] | None = None

    @property
    def n_frames(self) -> int:
        return self._n

    def _decoded(self) -> list[np.ndarray]:
        if self._frames is None:
            self._frames = decode_gif_frames(self._data)
        return self._frames

    def frame_rgb(self, i: int) -> np.ndarray:
        return self._decoded()[i]

    def frame_encoded(self, i: int) -> bytes:
        from .imaging import encode_png
        return encode_png(self.frame_rgb(i))

    def frame_pair(self, i: int) -> tuple[bytes, np.ndarray]:
        px = self.frame_rgb(i)
        from .imaging import encode_png
        return encode_png(px), px


def median_cut_palette(px: np.ndarray, n_colors: int = 256) -> np.ndarray:
    """Adaptive palette via median cut (Heckbert 1982): repeatedly split
    the color box with the widest channel range at its median until
    ``n_colors`` boxes exist; each box contributes its mean color.
    Returns a (k, 3) uint8 palette, k <= n_colors."""
    flat = np.ascontiguousarray(px, dtype=np.uint8).reshape(-1, 3)

    def _stat(b):
        # (widest channel range, widest channel) — computed ONCE per box
        if len(b) <= 1:
            return -1, 0
        r = b.max(0).astype(int) - b.min(0).astype(int)
        ch = int(np.argmax(r))
        return int(r[ch]), ch

    boxes = [flat]
    stats = [_stat(flat)]
    while len(boxes) < n_colors:
        i = max(range(len(boxes)), key=lambda j: stats[j][0])
        width, ch = stats[i]
        if width <= 0:
            break
        b = boxes.pop(i)
        stats.pop(i)
        order = np.argsort(b[:, ch], kind="stable")
        mid = len(b) // 2
        for part in (b[order[:mid]], b[order[mid:]]):
            boxes.append(part)
            stats.append(_stat(part))
    pal = np.array([b.mean(0).round() for b in boxes], dtype=np.uint8)
    # dedupe (distinct boxes can average to the same color)
    return np.unique(pal.reshape(-1, 3), axis=0)


def quantize_to_palette(px: np.ndarray, pal: np.ndarray) -> np.ndarray:
    """Map every pixel to its nearest palette color (squared-distance
    argmin, vectorized (n_pixels, k) matmul expansion)."""
    flat = px.reshape(-1, 3).astype(np.int32)
    p = pal.astype(np.int32)
    # ||x-c||^2 = ||x||^2 - 2 x.c + ||c||^2 ; argmin over c
    d = (-2 * flat @ p.T) + (p * p).sum(1)[None, :]
    idx = np.argmin(d, axis=1)
    return pal[idx].reshape(px.shape)
