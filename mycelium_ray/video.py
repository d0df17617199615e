"""From-scratch video container support: AVI (RIFF) MJPEG and YUV4MPEG2.

Two REAL, publicly-specified container formats so the video
frame-sampling stage (stages/media.SampleFrames) runs on genuine video
bytes instead of only the test fixture:

- **AVI / MJPEG** — the RIFF 'AVI ' container (Microsoft AVI RIFF File
  Reference; OpenDML AVI extensions) carrying one Motion-JPEG video
  stream: each '00dc' chunk inside the 'movi' LIST is a complete
  baseline JPEG image, decoded by the in-repo from-scratch JPEG codec
  (mycelium_ray.jpeg, ITU-T T.81). The muxer writes a standards-shaped
  file (hdrl/avih/strl/strh/strf + movi + idx1) so the demuxer is
  exercised against realistic structure, and the demuxer is a tolerant
  chunk walk (skips unknown chunks, accepts '00db' raw-DIB-style ids,
  handles odd-size padding) as real AVI readers must be.

- **YUV4MPEG2 (.y4m)** — the mjpegtools uncompressed interchange
  format: an ASCII header line ("YUV4MPEG2 W.. H.. F..:.. Ip A..:..
  C..\\n") followed by per-frame "FRAME\\n" + raw planar YCbCr.
  Supports C444 and C420/C420jpeg/C420mpeg2 (2x2 chroma subsampling),
  with ITU-R BT.601 *limited-range* matrixing (Y 16..235, C 16..240) —
  the wire convention for y4m. Round-trip PSNR ≥ 40 dB is asserted in
  tests (the same bar the north rule sets for lossy image formats).

Frame *pixels* never leave the stage that decodes them; sampling
selects frame indices BEFORE decode so a 10k-frame clip with
n_samples=4 decodes 4 frames, not 10k (the reason the demux returns
offsets, not materialized frames).

mp4 (ISO 14496-12) and Matroska/webm (RFC 8794 EBML) are ALSO real for
intra-frame Motion-JPEG payloads: mux_mp4_mjpeg/Mp4Clip resolve full
stsd/stts/stsc/stsz/stco sample tables, and mux_mkv_mjpeg/MkvClip walk
Tracks/Clusters/SimpleBlocks for CodecID "V_MJPEG". The honest
NotImplementedError boundary now sits at the CODEC level: avc1/hev1 in
mp4 and V_VP8/V_VP9/V_AV1 in webm need ffmpeg-class inter-frame
decoders that are out of scope, and container METADATA (duration,
track dims) is parsed for real by probe_mp4_meta/probe_webm_meta so
triage works even where frame decode cannot.

Reference parity note: larroy/mycelium has no video path at all; this
module exists for the build brief's multimodal-column story.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = [
    "VideoFormatError", "probe_video", "open_video",
    "mux_avi_mjpeg", "AviClip",
    "encode_y4m", "Y4mClip",
    "mux_mp4_mjpeg", "Mp4Clip",
    "mux_mkv_mjpeg", "MkvClip",
    "rgb_to_ycbcr601", "ycbcr601_to_rgb",
]


class VideoFormatError(ValueError):
    pass


# ==========================================================================
# BT.601 limited-range colour matrixing (shared by Y4M; JPEG uses the
# full-range variant inside mycelium_ray.jpeg)
# ==========================================================================
_KR, _KG, _KB = 0.299, 0.587, 0.114


def rgb_to_ycbcr601(px: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(h, w, 3) uint8 RGB → limited-range (Y, Cb, Cr) uint8 planes."""
    r = px[..., 0].astype(np.float64) / 255.0
    g = px[..., 1].astype(np.float64) / 255.0
    b = px[..., 2].astype(np.float64) / 255.0
    ey = _KR * r + _KG * g + _KB * b
    epb = 0.5 * (b - ey) / (1.0 - _KB)
    epr = 0.5 * (r - ey) / (1.0 - _KR)
    y = np.clip(np.rint(16.0 + 219.0 * ey), 16, 235).astype(np.uint8)
    cb = np.clip(np.rint(128.0 + 224.0 * epb), 16, 240).astype(np.uint8)
    cr = np.clip(np.rint(128.0 + 224.0 * epr), 16, 240).astype(np.uint8)
    return y, cb, cr


def ycbcr601_to_rgb(y: np.ndarray, cb: np.ndarray, cr: np.ndarray) -> np.ndarray:
    """Limited-range (Y, Cb, Cr) planes (same shape) → (h, w, 3) uint8."""
    ey = (y.astype(np.float64) - 16.0) / 219.0
    epb = (cb.astype(np.float64) - 128.0) / 224.0
    epr = (cr.astype(np.float64) - 128.0) / 224.0
    r = ey + 2.0 * (1.0 - _KR) * epr
    b = ey + 2.0 * (1.0 - _KB) * epb
    g = (ey - _KR * r - _KB * b) / _KG
    out = np.stack([r, g, b], axis=-1)
    return np.clip(np.rint(out * 255.0), 0, 255).astype(np.uint8)


# ==========================================================================
# AVI (RIFF) — MJPEG
# ==========================================================================
def _fourcc(tag: bytes) -> bytes:
    assert len(tag) == 4
    return tag


def _chunk(tag: bytes, payload: bytes) -> bytes:
    pad = b"\x00" if len(payload) % 2 else b""
    return _fourcc(tag) + struct.pack("<I", len(payload)) + payload + pad


def _list(kind: bytes, payload: bytes) -> bytes:
    return _chunk(b"LIST", _fourcc(kind) + payload)


def mux_avi_mjpeg(jpeg_frames: list[bytes], width: int, height: int,
                  fps: int = 25) -> bytes:
    """Mux pre-encoded JPEG frames into a single-stream MJPEG AVI.

    Every frame chunk is '00dc' (stream 0, compressed video) with an
    idx1 keyframe entry (MJPEG frames are all intra). Header fields
    follow the AVI RIFF reference: avih (MainAVIHeader, 56 bytes),
    strh (AVIStreamHeader 'vids'/'MJPG', 56 bytes), strf
    (BITMAPINFOHEADER, biCompression='MJPG').
    """
    n = len(jpeg_frames)
    max_bytes = max((len(f) for f in jpeg_frames), default=0)
    usec_per_frame = int(round(1_000_000 / fps)) if fps else 0

    avih = struct.pack(
        "<14I",
        usec_per_frame,            # dwMicroSecPerFrame
        max_bytes * fps,           # dwMaxBytesPerSec (approx)
        0,                         # dwPaddingGranularity
        0x10,                      # dwFlags: AVIF_HASINDEX
        n,                         # dwTotalFrames
        0,                         # dwInitialFrames
        1,                         # dwStreams
        max_bytes,                 # dwSuggestedBufferSize
        width, height,
        0, 0, 0, 0)                # dwReserved[4]

    strh = (b"vids" + b"MJPG"
            + struct.pack("<IHHIIIIIIII",
                          0,       # dwFlags
                          0, 0,    # wPriority, wLanguage
                          0,       # dwInitialFrames
                          1,       # dwScale
                          fps,     # dwRate (rate/scale = fps)
                          0,       # dwStart
                          n,       # dwLength (frames)
                          max_bytes,  # dwSuggestedBufferSize
                          0xFFFFFFFF,  # dwQuality (default)
                          0)       # dwSampleSize (0 = varies)
            + struct.pack("<4H", 0, 0, width, height))  # rcFrame

    strf = struct.pack("<IiiHH4sIiiII",
                       40,                 # biSize
                       width, height,
                       1, 24,              # biPlanes, biBitCount
                       b"MJPG",            # biCompression
                       width * height * 3,  # biSizeImage
                       0, 0, 0, 0)

    hdrl = _list(b"hdrl",
                 _chunk(b"avih", avih)
                 + _list(b"strl", _chunk(b"strh", strh)
                         + _chunk(b"strf", strf)))

    movi_parts = []
    idx_entries = []
    # idx1 offsets are relative to the start of the 'movi' fourcc
    off = 4
    for f in jpeg_frames:
        movi_parts.append(_chunk(b"00dc", f))
        idx_entries.append(struct.pack("<4sIII", b"00dc", 0x10, off, len(f)))
        off += 8 + len(f) + (len(f) % 2)
    movi = _list(b"movi", b"".join(movi_parts))
    idx1 = _chunk(b"idx1", b"".join(idx_entries))

    body = _fourcc(b"AVI ") + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(body)) + body


class AviClip:
    """Lazy MJPEG AVI reader: one tolerant chunk walk records (offset,
    length, fourcc) of every frame chunk; frame bytes/pixels are sliced
    and decoded on demand (a sampler touching 4 of 10k frames decodes
    4)."""

    def __init__(self, data: bytes):
        if data[:4] != b"RIFF" or data[8:12] != b"AVI ":
            raise VideoFormatError("not a RIFF/AVI file")
        self._data = data
        self.width = self.height = 0
        self._frames: list[tuple[int, int]] = []  # (offset, length)
        self._walk(data)
        if not self._frames:
            raise VideoFormatError("AVI contains no video frame chunks")

    # -- parsing ----------------------------------------------------------
    def _walk(self, data: bytes) -> None:
        end = min(len(data), 8 + struct.unpack("<I", data[4:8])[0])
        self._walk_list(data, 12, end)

    def _walk_list(self, data: bytes, pos: int, end: int) -> None:
        end = min(end, len(data))
        while pos + 8 <= end:
            tag = data[pos:pos + 4]
            (size,) = struct.unpack("<I", data[pos + 4:pos + 8])
            body0 = pos + 8
            if tag == b"LIST":
                kind = data[body0:body0 + 4]
                if kind in (b"hdrl", b"movi", b"strl", b"rec "):
                    self._walk_list(data, body0 + 4, body0 + size)
            elif tag == b"avih" and size >= 40:
                w, h = struct.unpack("<II", data[body0 + 32:body0 + 40])
                self.width, self.height = int(w), int(h)
            elif tag[2:4] in (b"dc", b"db") and tag[:2].isdigit():
                self._frames.append((body0, size))
            pos = body0 + size + (size % 2)

    # -- access -----------------------------------------------------------
    @property
    def n_frames(self) -> int:
        return len(self._frames)

    def frame_encoded(self, i: int) -> bytes:
        off, ln = self._frames[i]
        return self._data[off:off + ln]

    def frame_rgb(self, i: int) -> np.ndarray:
        from .imaging import decode_image
        px, _fmt = decode_image(self.frame_encoded(i))
        return px

    def frame_pair(self, i: int) -> tuple[bytes, np.ndarray]:
        """(encoded bytes, pixels) with exactly one decode — the stored
        JPEG chunk is the encoded form."""
        fb = self.frame_encoded(i)
        from .imaging import decode_image
        px, _fmt = decode_image(fb)
        return fb, px


# ==========================================================================
# YUV4MPEG2
# ==========================================================================
_Y4M_MAGIC = b"YUV4MPEG2"
_FRAME_MAGIC = b"FRAME"


def encode_y4m(frames_rgb: list[np.ndarray], fps: tuple[int, int] = (25, 1),
               colorspace: str = "C444") -> bytes:
    """RGB frames → YUV4MPEG2 bytes (limited-range BT.601).

    C444 stores full-resolution chroma; C420 variants subsample chroma
    2x2 by plane mean (width/height must be even).
    """
    if not frames_rgb:
        raise VideoFormatError("need at least one frame")
    h, w, _ = frames_rgb[0].shape
    sub = colorspace.startswith("C420")
    if sub and (w % 2 or h % 2):
        raise VideoFormatError("C420 needs even dimensions")
    out = [b"%s W%d H%d F%d:%d Ip A1:1 %s\n"
           % (_Y4M_MAGIC, w, h, fps[0], fps[1], colorspace.encode())]
    for px in frames_rgb:
        if px.shape != (h, w, 3):
            raise VideoFormatError("all frames must share dimensions")
        y, cb, cr = rgb_to_ycbcr601(px)
        if sub:
            cb = _subsample2x2(cb)
            cr = _subsample2x2(cr)
        out.append(_FRAME_MAGIC + b"\n")
        out.append(y.tobytes())
        out.append(cb.tobytes())
        out.append(cr.tobytes())
    return b"".join(out)


def _subsample2x2(plane: np.ndarray) -> np.ndarray:
    h, w = plane.shape
    p = plane.astype(np.float64).reshape(h // 2, 2, w // 2, 2)
    return np.clip(np.rint(p.mean(axis=(1, 3))), 0, 255).astype(np.uint8)


def _upsample2x2(plane: np.ndarray) -> np.ndarray:
    return np.repeat(np.repeat(plane, 2, axis=0), 2, axis=1)


class Y4mClip:
    """Lazy YUV4MPEG2 reader: the header parse records every frame's
    byte offset; planes are materialized per frame_rgb() call only."""

    def __init__(self, data: bytes):
        if not data.startswith(_Y4M_MAGIC):
            raise VideoFormatError("not a YUV4MPEG2 stream")
        nl = data.find(b"\n")
        if nl < 0:
            raise VideoFormatError("truncated y4m header")
        self._data = data
        self.width = self.height = 0
        self.colorspace = "C420jpeg"  # the y4m default when C is absent
        for tok in data[len(_Y4M_MAGIC):nl].split():
            c, v = tok[:1], tok[1:]
            if c == b"W":
                self.width = int(v)
            elif c == b"H":
                self.height = int(v)
            elif c == b"C":
                self.colorspace = tok.decode("ascii")
        if self.width <= 0 or self.height <= 0:
            raise VideoFormatError("y4m header missing W/H")
        cs = self.colorspace
        if cs.startswith("C444"):
            self._sub = False
        elif cs.startswith("C420"):
            self._sub = True
            if self.width % 2 or self.height % 2:
                raise VideoFormatError(
                    "C420 y4m needs even dimensions, got "
                    f"{self.width}x{self.height}")
        else:
            raise VideoFormatError(f"unsupported y4m colorspace {cs!r}")
        ysz = self.width * self.height
        csz = ysz // 4 if self._sub else ysz
        self._plane_sizes = (ysz, csz, csz)
        frame_bytes = ysz + 2 * csz
        self._offsets: list[int] = []
        pos = nl + 1
        n = len(data)
        while pos < n:
            # per-frame header: "FRAME[ params]\n"
            if data[pos:pos + len(_FRAME_MAGIC)] != _FRAME_MAGIC:
                raise VideoFormatError("corrupt y4m frame header")
            fnl = data.find(b"\n", pos)
            if fnl < 0 or fnl + 1 + frame_bytes > n:
                raise VideoFormatError("truncated y4m frame")
            self._offsets.append(fnl + 1)
            pos = fnl + 1 + frame_bytes
        if not self._offsets:
            raise VideoFormatError("y4m stream contains no frames")

    @property
    def n_frames(self) -> int:
        return len(self._offsets)

    def frame_rgb(self, i: int) -> np.ndarray:
        off = self._offsets[i]
        w, h = self.width, self.height
        ysz, csz, _ = self._plane_sizes
        y = np.frombuffer(self._data, np.uint8, ysz, off).reshape(h, w)
        cb = np.frombuffer(self._data, np.uint8, csz, off + ysz)
        cr = np.frombuffer(self._data, np.uint8, csz, off + ysz + csz)
        if self._sub:
            cb = _upsample2x2(cb.reshape(h // 2, w // 2))
            cr = _upsample2x2(cr.reshape(h // 2, w // 2))
        else:
            cb = cb.reshape(h, w)
            cr = cr.reshape(h, w)
        return ycbcr601_to_rgb(y, cb, cr)

    def frame_encoded(self, i: int) -> bytes:
        """Sampled frames re-encode as PNG (lossless, in-repo codec) —
        y4m frames have no per-frame compressed representation to
        pass through."""
        from .imaging import encode_png
        return encode_png(self.frame_rgb(i))

    def frame_pair(self, i: int) -> tuple[bytes, np.ndarray]:
        """(encoded bytes, pixels) with exactly one y4m decode and one
        PNG encode — no decode-back of the PNG."""
        from .imaging import encode_png
        px = self.frame_rgb(i)
        return encode_png(px), px


# ==========================================================================
# probing / dispatch
# ==========================================================================
def probe_video(data: bytes) -> str | None:
    """'avi' | 'y4m' | 'gif' | 'fakevid' | 'mp4' | 'webm' | None."""
    if data[:4] == b"RIFF" and data[8:12] == b"AVI ":
        return "avi"
    if data.startswith(_Y4M_MAGIC):
        return "y4m"
    if data.startswith(b"FAKEVID1"):
        return "fakevid"
    if data[:6] in (b"GIF87a", b"GIF89a"):
        return "gif"          # animated GIF: third real frame container
    if len(data) >= 12 and data[4:8] == b"ftyp":
        return "mp4"
    if data[:4] == b"\x1a\x45\xdf\xa3":
        return "webm"
    return None


def open_video(data: bytes):
    """Dispatch to a clip reader (n_frames / frame_rgb / frame_encoded).

    mp4 dispatches to Mp4Clip, which decodes 'jpeg' (MJPEG) sample
    entries for real and raises NotImplementedError for inter-frame
    codecs; webm raises NotImplementedError (VP8/VP9/AV1 need
    ffmpeg-class decoders); unknown bytes raise VideoFormatError.
    """
    kind = probe_video(data)
    if kind == "avi":
        return AviClip(data)
    if kind == "y4m":
        return Y4mClip(data)
    if kind == "gif":
        from .gif import GifClip
        return GifClip(data)
    if kind == "fakevid":
        from .stages.media import FixtureClip
        return FixtureClip(data)
    if kind == "mp4":
        return Mp4Clip(data)
    if kind == "webm":
        return MkvClip(data)
    raise VideoFormatError("unrecognized video container")


# ==========================================================================
# MP4 / ISO BMFF (ISO/IEC 14496-12) — METADATA ONLY
# ==========================================================================
# The codec layer (H.264/H.265/AV1) stays honestly stubbed, but the
# CONTAINER metadata a triage pass needs — movie duration, track count,
# track dimensions — lives in plain box structure: moov/mvhd carries
# (timescale, duration), each trak/tkhd its 16.16-fixed width/height.
# Box walk: [size u32][type 4cc][payload]; size==1 → 64-bit largesize
# follows; size==0 → box extends to EOF.

def _iter_boxes(data: bytes, pos: int, end: int):
    while pos + 8 <= end:
        (size,) = struct.unpack(">I", data[pos:pos + 4])
        typ = data[pos + 4:pos + 8]
        body = pos + 8
        if size == 1:
            if body + 8 > end:
                raise VideoFormatError("truncated mp4 largesize box")
            (size,) = struct.unpack(">Q", data[body:body + 8])
            body += 8
            if size < 16:  # a largesize box is at least 16 bytes
                raise VideoFormatError("bad mp4 largesize")
        elif size == 0:
            size = end - pos
        if size < 8 or pos + size > end:
            raise VideoFormatError("bad mp4 box size")
        yield typ, body, pos + size
        pos += size


def probe_mp4_meta(data: bytes) -> dict:
    """{'duration_ms', 'timescale', 'n_tracks', 'tracks': [(w, h), ...]}
    from the moov box — no sample data touched."""
    if len(data) < 12 or data[4:8] != b"ftyp":
        raise VideoFormatError("not an ISO BMFF (mp4) file")
    duration_ms = -1
    timescale = 0
    tracks: list[tuple[int, int]] = []
    for typ, body, end in _iter_boxes(data, 0, len(data)):
        if typ != b"moov":
            continue
        for t2, b2, e2 in _iter_boxes(data, body, end):
            if t2 == b"mvhd":
                ver = data[b2]
                need = (b2 + 32) if ver == 1 else (b2 + 20)
                if need > e2:
                    raise VideoFormatError("truncated mp4 mvhd")
                if ver == 1:
                    timescale, dur = struct.unpack(
                        ">IQ", data[b2 + 20:b2 + 32])
                else:
                    timescale, dur = struct.unpack(
                        ">II", data[b2 + 12:b2 + 20])
                if timescale:
                    duration_ms = dur * 1000 // timescale
            elif t2 == b"trak":
                for t3, b3, e3 in _iter_boxes(data, b2, e2):
                    if t3 == b"tkhd":
                        if e3 - b3 < 16:
                            raise VideoFormatError("truncated mp4 tkhd")
                        off = e3 - 8  # width/height are the LAST 8 bytes
                        w16, h16 = struct.unpack(">II", data[off:off + 8])
                        tracks.append((w16 >> 16, h16 >> 16))
    if not timescale:
        raise VideoFormatError("mp4 missing moov/mvhd")
    return {"duration_ms": duration_ms, "timescale": timescale,
            "n_tracks": len(tracks), "tracks": tracks}


def write_mp4_skeleton(duration_ms: int, width: int, height: int,
                       timescale: int = 1000) -> bytes:
    """Minimal structurally-valid mp4: ftyp + moov(mvhd + trak(tkhd)).
    A metadata fixture (no mdat/samples), like the audiometa writers."""
    def box(typ: bytes, payload: bytes) -> bytes:
        return struct.pack(">I", 8 + len(payload)) + typ + payload

    dur = duration_ms * timescale // 1000
    mvhd = (bytes([0]) + b"\x00\x00\x00"        # version 0 + flags
            + struct.pack(">II", 0, 0)           # creation/modification
            + struct.pack(">II", timescale, dur)
            + struct.pack(">I", 0x00010000)      # rate 1.0
            + struct.pack(">H", 0x0100)          # volume 1.0
            + b"\x00" * 10                       # reserved
            + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0,
                          0x40000000)            # identity matrix
            + b"\x00" * 24                       # pre_defined
            + struct.pack(">I", 2))              # next_track_ID
    tkhd = (bytes([0]) + b"\x00\x00\x07"        # version 0, enabled flags
            + struct.pack(">II", 0, 0)
            + struct.pack(">I", 1)               # track_ID
            + struct.pack(">I", 0)               # reserved
            + struct.pack(">I", dur)
            + b"\x00" * 8
            + struct.pack(">HHHH", 0, 0, 0, 0)   # layer/group/volume/rsvd
            + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0,
                          0x40000000)
            + struct.pack(">II", width << 16, height << 16))
    moov = box(b"moov", box(b"mvhd", mvhd) + box(b"trak", box(b"tkhd", tkhd)))
    ftyp = box(b"ftyp", b"isom" + struct.pack(">I", 0x200) + b"isomiso2")
    return ftyp + moov


# ==========================================================================
# MP4 MJPEG (ISO/IEC 14496-12 full sample tables, 'jpeg' sample entry)
# ==========================================================================
# Motion-JPEG in an ISO BMFF container is the one mp4 variant a
# from-scratch build can honestly decode: every sample is an intra-coded
# JPEG picture (the in-repo T.81 codec), and the container work is pure
# box/sample-table structure — stsd/stts/stsc/stsz/stco per 14496-12
# §8.5-8.7. Inter-frame codecs (H.264/H.265/AV1) stay stubbed.

def _box(typ: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", 8 + len(payload)) + typ + payload


def _full_box(typ: bytes, version: int, flags: int, payload: bytes) -> bytes:
    return _box(typ, bytes([version]) + flags.to_bytes(3, "big") + payload)


def mux_mp4_mjpeg(jpeg_frames: list[bytes], width: int, height: int,
                  fps: tuple[int, int] = (25, 1),
                  timescale: int = 1000) -> bytes:
    """Mux pre-encoded JPEG frames into a single-track MJPEG mp4.

    One mdat chunk holds all samples back to back; the sample tables
    describe them exactly (stts one run, stsc one run, stsz per-sample
    sizes, stco one chunk offset). Layout is ftyp + moov + mdat; the
    moov byte length does not depend on the stco VALUE, so the chunk
    offset is computed in a second pass."""
    n = len(jpeg_frames)
    if n == 0:
        raise VideoFormatError("mp4 mux needs at least one frame")
    delta = max(1, timescale * fps[1] // fps[0])
    dur = n * delta

    entry = (b"\x00" * 6 + struct.pack(">H", 1)          # data_ref_idx
             + struct.pack(">HH", 0, 0)                   # pre_def/rsvd
             + struct.pack(">III", 0, 0, 0)               # pre_defined
             + struct.pack(">HH", width, height)
             + struct.pack(">II", 0x00480000, 0x00480000)  # 72 dpi
             + struct.pack(">I", 0)                        # reserved
             + struct.pack(">H", 1)                        # frame_count
             + bytes([4]) + b"mjpg" + b"\x00" * 27         # compressorname
             + struct.pack(">Hh", 24, -1))                 # depth, pre_def
    stsd = _full_box(b"stsd", 0, 0,
                     struct.pack(">I", 1) + _box(b"jpeg", entry))
    stts = _full_box(b"stts", 0, 0, struct.pack(">III", 1, n, delta))
    stsc = _full_box(b"stsc", 0, 0, struct.pack(">IIII", 1, 1, n, 1))
    stsz = _full_box(b"stsz", 0, 0,
                     struct.pack(">II", 0, n)
                     + b"".join(struct.pack(">I", len(f))
                                for f in jpeg_frames))

    def build(chunk_off: int) -> bytes:
        stco = _full_box(b"stco", 0, 0,
                         struct.pack(">II", 1, chunk_off))
        stbl = _box(b"stbl", stsd + stts + stsc + stsz + stco)
        vmhd = _full_box(b"vmhd", 0, 1, struct.pack(">HHHH", 0, 0, 0, 0))
        dref = _full_box(b"dref", 0, 0,
                         struct.pack(">I", 1) + _full_box(b"url ", 0, 1,
                                                          b""))
        minf = _box(b"minf", vmhd + _box(b"dinf", dref) + stbl)
        mdhd = _full_box(b"mdhd", 0, 0,
                         struct.pack(">IIII", 0, 0, timescale, dur)
                         + struct.pack(">HH", 0x55C4, 0))   # 'und'
        hdlr = _full_box(b"hdlr", 0, 0,
                         struct.pack(">I", 0) + b"vide"
                         + b"\x00" * 12 + b"VideoHandler\x00")
        mdia = _box(b"mdia", mdhd + hdlr + minf)
        tkhd = _full_box(b"tkhd", 0, 7,
                         struct.pack(">IIII", 0, 0, 1, 0)
                         + struct.pack(">I", dur) + b"\x00" * 8
                         + struct.pack(">HHHH", 0, 0, 0, 0)
                         + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000,
                                       0, 0, 0, 0x40000000)
                         + struct.pack(">II", width << 16, height << 16))
        mvhd = _full_box(b"mvhd", 0, 0,
                         struct.pack(">IIII", 0, 0, timescale, dur)
                         + struct.pack(">I", 0x00010000)
                         + struct.pack(">H", 0x0100) + b"\x00" * 10
                         + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000,
                                       0, 0, 0, 0x40000000)
                         + b"\x00" * 24 + struct.pack(">I", 2))
        moov = _box(b"moov", mvhd + _box(b"trak", tkhd + mdia))
        ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 0x200)
                    + b"isomiso2mp41")
        mdat = _box(b"mdat", b"".join(jpeg_frames))
        return ftyp + moov + mdat

    probe = build(0)
    mdat_payload_off = len(probe) - sum(len(f) for f in jpeg_frames)
    return build(mdat_payload_off)


class Mp4Clip:
    """ISO BMFF reader for intra-frame ('jpeg' sample entry) tracks:
    full stsd/stsz/stsc/stco(+co64) sample-table resolution, lazy frame
    slicing (a sampler touching 4 of 10k samples decodes 4). Tracks
    whose sample entry is an inter-frame codec raise NotImplementedError
    — that boundary is unchanged."""

    def __init__(self, data: bytes):
        if len(data) < 12 or data[4:8] != b"ftyp":
            raise VideoFormatError("not an ISO BMFF (mp4) file")
        self._data = data
        self.width = self.height = 0
        self._frames: list[tuple[int, int]] = []
        codec = None
        for typ, body, end in _iter_boxes(data, 0, len(data)):
            if typ == b"moov":
                codec = self._walk_moov(body, end)
                break
        if not self._frames:
            if codec is not None:
                raise NotImplementedError(
                    f"mp4 sample entry {codec!r} is an inter-frame codec "
                    "(needs ffmpeg/PyAV, absent here); 'jpeg' (MJPEG) "
                    "tracks decode for real")
            raise VideoFormatError("mp4 has no decodable video track")

    def _walk_moov(self, pos: int, end: int):
        data = self._data
        codec_seen = None
        for t, b, e in _iter_boxes(data, pos, end):
            if t != b"trak":
                continue
            for t2, b2, e2 in _iter_boxes(data, b, e):
                if t2 != b"mdia":
                    continue
                for t3, b3, e3 in _iter_boxes(data, b2, e2):
                    if t3 != b"minf":
                        continue
                    for t4, b4, e4 in _iter_boxes(data, b3, e3):
                        if t4 == b"stbl":
                            c = self._parse_stbl(b4, e4)
                            if self._frames:
                                return c
                            codec_seen = codec_seen or c
        return codec_seen

    def _parse_stbl(self, pos: int, end: int):
        data = self._data
        fmt = None
        sizes: list[int] = []
        chunk_offs: list[int] = []
        stsc_runs: list[tuple[int, int]] = []  # (first_chunk, per_chunk)
        for t, b, e in _iter_boxes(data, pos, end):
            if t == b"stsd":
                (cnt,) = struct.unpack(">I", data[b + 4:b + 8])
                if cnt >= 1:
                    fmt = data[b + 12:b + 16]
                    if fmt == b"jpeg" and e - b >= 44:
                        self.width, self.height = struct.unpack(
                            ">HH", data[b + 40:b + 44])
            elif t == b"stsz":
                fixed, n = struct.unpack(">II", data[b + 4:b + 12])
                if fixed:
                    sizes = [fixed] * n
                else:
                    sizes = list(struct.unpack(
                        f">{n}I", data[b + 12:b + 12 + 4 * n]))
            elif t == b"stco":
                (n,) = struct.unpack(">I", data[b + 4:b + 8])
                chunk_offs = list(struct.unpack(
                    f">{n}I", data[b + 8:b + 8 + 4 * n]))
            elif t == b"co64":
                (n,) = struct.unpack(">I", data[b + 4:b + 8])
                chunk_offs = list(struct.unpack(
                    f">{n}Q", data[b + 8:b + 8 + 8 * n]))
            elif t == b"stsc":
                (n,) = struct.unpack(">I", data[b + 4:b + 8])
                for i in range(n):
                    fc, spc, _sdi = struct.unpack(
                        ">III", data[b + 8 + 12 * i:b + 20 + 12 * i])
                    stsc_runs.append((fc, spc))
        if fmt != b"jpeg" or not sizes or not chunk_offs or not stsc_runs:
            return fmt
        # expand chunk runs → per-sample (offset, size)
        si = 0
        for ci, coff in enumerate(chunk_offs, start=1):
            spc = next((spc for fc, spc in reversed(stsc_runs)
                        if fc <= ci), stsc_runs[0][1])
            off = coff
            for _ in range(spc):
                if si >= len(sizes):
                    break
                self._frames.append((off, sizes[si]))
                off += sizes[si]
                si += 1
        if si != len(sizes):
            raise VideoFormatError("mp4 sample tables are inconsistent")
        return fmt

    @property
    def n_frames(self) -> int:
        return len(self._frames)

    def frame_encoded(self, i: int) -> bytes:
        off, ln = self._frames[i]
        if off + ln > len(self._data):
            raise VideoFormatError("mp4 sample points past EOF")
        return self._data[off:off + ln]

    def frame_rgb(self, i: int) -> np.ndarray:
        from .imaging import decode_image
        px, _fmt = decode_image(self.frame_encoded(i))
        return px

    def frame_pair(self, i: int) -> tuple[bytes, np.ndarray]:
        fb = self.frame_encoded(i)
        from .imaging import decode_image
        px, _fmt = decode_image(fb)
        return fb, px


# ==========================================================================
# WebM / Matroska (EBML, RFC 8794) — METADATA ONLY
# ==========================================================================
# Same honest boundary as mp4: VP8/VP9/AV1 frame decode needs ffmpeg,
# but the EBML element structure carrying duration and track dimensions
# is fully parseable from the public spec. Element = [varint ID]
# [varint size][payload]; IDs keep their marker bit, sizes drop it.

_EBML_SEGMENT = 0x18538067
_EBML_INFO = 0x1549A966
_EBML_TIMESCALE = 0x2AD7B1       # TimestampScale, ns per tick (default 1e6)
_EBML_DURATION = 0x4489          # float, in ticks
_EBML_TRACKS = 0x1654AE6B
_EBML_TRACKENTRY = 0xAE
_EBML_VIDEO = 0xE0
_EBML_PIXELW = 0xB0
_EBML_PIXELH = 0xBA


_EBML_UNKNOWN = -1


def _ebml_varint(data: bytes, pos: int, keep_marker: bool) -> tuple[int, int]:
    """(value, new_pos). EBML varint: leading zero bits of the first
    byte give the length; IDs keep the marker bit, sizes mask it off.
    An all-VINT_DATA-ones size (RFC 8794 §6: e.g. 0xFF) means UNKNOWN
    length — what live muxers (MediaRecorder etc.) emit for a streamed
    Segment — returned as _EBML_UNKNOWN."""
    if pos >= len(data):
        raise VideoFormatError("truncated EBML varint")
    first = data[pos]
    if first == 0:
        raise VideoFormatError("invalid EBML varint")
    length = 8 - first.bit_length() + 1
    if pos + length > len(data):
        raise VideoFormatError("truncated EBML varint body")
    val = first if keep_marker else first & (0xFF >> length)
    for i in range(1, length):
        val = (val << 8) | data[pos + i]
    if not keep_marker and val == (1 << (7 * length)) - 1:
        return _EBML_UNKNOWN, pos + length
    return val, pos + length


def _ebml_iter(data: bytes, pos: int, end: int):
    while pos < end:
        eid, pos = _ebml_varint(data, pos, keep_marker=True)
        size, pos = _ebml_varint(data, pos, keep_marker=False)
        if size == _EBML_UNKNOWN:
            size = end - pos  # unknown-size element runs to parent end
        if pos + size > end:
            raise VideoFormatError("truncated EBML element")
        yield eid, pos, pos + size
        pos += size


def _ebml_uint(data: bytes, a: int, b: int) -> int:
    v = 0
    for i in range(a, b):
        v = (v << 8) | data[i]
    return v


def _ebml_float(data: bytes, a: int, b: int) -> float:
    n = b - a
    if n == 4:
        return struct.unpack(">f", data[a:b])[0]
    if n == 8:
        return struct.unpack(">d", data[a:b])[0]
    raise VideoFormatError(f"bad EBML float width {n}")


def probe_webm_meta(data: bytes) -> dict:
    """{'duration_ms', 'n_tracks', 'tracks': [(w, h), ...]} from the EBML
    Segment Info/Tracks elements — no block data touched."""
    if data[:4] != b"\x1a\x45\xdf\xa3":
        raise VideoFormatError("not an EBML (webm/matroska) file")
    timescale_ns = 1_000_000   # spec default: 1 ms ticks
    duration_ticks = -1.0
    tracks: list[tuple[int, int]] = []
    for eid, a, b in _ebml_iter(data, 0, len(data)):
        if eid != _EBML_SEGMENT:
            continue
        for e2, a2, b2 in _ebml_iter(data, a, b):
            if e2 == _EBML_INFO:
                for e3, a3, b3 in _ebml_iter(data, a2, b2):
                    if e3 == _EBML_TIMESCALE:
                        timescale_ns = _ebml_uint(data, a3, b3)
                    elif e3 == _EBML_DURATION:
                        duration_ticks = _ebml_float(data, a3, b3)
            elif e2 == _EBML_TRACKS:
                for e3, a3, b3 in _ebml_iter(data, a2, b2):
                    if e3 != _EBML_TRACKENTRY:
                        continue
                    for e4, a4, b4 in _ebml_iter(data, a3, b3):
                        if e4 == _EBML_VIDEO:
                            w = h = -1
                            for e5, a5, b5 in _ebml_iter(data, a4, b4):
                                if e5 == _EBML_PIXELW:
                                    w = _ebml_uint(data, a5, b5)
                                elif e5 == _EBML_PIXELH:
                                    h = _ebml_uint(data, a5, b5)
                            tracks.append((w, h))
    if duration_ticks < 0 and not tracks:
        raise VideoFormatError("webm missing Segment Info/Tracks")
    duration_ms = int(duration_ticks * timescale_ns / 1e6) \
        if duration_ticks >= 0 else -1
    return {"duration_ms": duration_ms, "n_tracks": len(tracks),
            "tracks": tracks}


def _ebml_id_bytes(eid: int) -> bytes:
    # element IDs serialize with their marker bit as stored
    n = (eid.bit_length() + 7) // 8
    return eid.to_bytes(n, "big")


def _ebml_size_bytes(n: int) -> bytes:
    # 4-byte size varint covers every payload we write (≤ 2^28-1)
    if n >= 0x10000000:
        raise VideoFormatError("EBML payload too large for 4-byte size")
    return struct.pack(">I", n | 0x10000000)


def _ebml_elem(eid: int, payload: bytes) -> bytes:
    return _ebml_id_bytes(eid) + _ebml_size_bytes(len(payload)) + payload


def _ebml_uint_payload(v: int) -> bytes:
    n = max(1, (v.bit_length() + 7) // 8)
    return v.to_bytes(n, "big")


def write_webm_skeleton(duration_ms: int, width: int, height: int) -> bytes:
    """Minimal structurally-valid webm: EBML header + Segment(Info +
    Tracks(TrackEntry(Video))). Metadata fixture, no Clusters."""
    elem, uint_payload = _ebml_elem, _ebml_uint_payload

    ebml_hdr = elem(0x1A45DFA3,
                    elem(0x4282, b"webm")        # DocType
                    + elem(0x4287, b"\x02"))     # DocTypeVersion
    info = elem(_EBML_INFO,
                elem(_EBML_TIMESCALE, uint_payload(1_000_000))
                + elem(_EBML_DURATION, struct.pack(">d",
                                                   float(duration_ms))))
    video = elem(_EBML_VIDEO,
                 elem(_EBML_PIXELW, uint_payload(width))
                 + elem(_EBML_PIXELH, uint_payload(height)))
    track = elem(_EBML_TRACKENTRY,
                 elem(0xD7, b"\x01")              # TrackNumber
                 + elem(0x83, b"\x01")            # TrackType: video
                 + video)
    segment = elem(_EBML_SEGMENT,
                   info + elem(_EBML_TRACKS, track))
    return ebml_hdr + segment


# ==========================================================================
# Matroska V_MJPEG (RFC 8794 EBML + Matroska codec id "V_MJPEG")
# ==========================================================================
# The same move as MJPEG-mp4: Matroska's block structure is pure EBML,
# and V_MJPEG samples are intra-coded JPEG pictures the in-repo T.81
# codec decodes for real. VP8/VP9/AV1 (the codecs actual .webm files
# carry) stay honestly stubbed — MkvClip raises NotImplementedError on
# them by CodecID.

_EBML_CLUSTER = 0x1F43B675
_EBML_CLUSTER_TS = 0xE7
_EBML_SIMPLEBLOCK = 0xA3
_EBML_BLOCKGROUP = 0xA0
_EBML_BLOCK = 0xA1
_EBML_TRACKNUMBER = 0xD7
_EBML_TRACKTYPE = 0x83
_EBML_CODECID = 0x86


def mux_mkv_mjpeg(jpeg_frames: list[bytes], width: int, height: int,
                  fps: tuple[int, int] = (25, 1)) -> bytes:
    """Mux pre-encoded JPEG frames into a single-track V_MJPEG
    Matroska file: EBML header (DocType 'matroska') + Segment(Info,
    Tracks, one Cluster of SimpleBlocks). Timestamps: 1 ms ticks,
    frame i at i·1000·fps_den/fps_num ms, all keyframes (MJPEG is
    intra-only)."""
    if not jpeg_frames:
        raise VideoFormatError("mkv mux needs at least one frame")
    elem, uintp = _ebml_elem, _ebml_uint_payload
    n = len(jpeg_frames)
    delta_ms = max(1, 1000 * fps[1] // fps[0])
    if (n - 1) * delta_ms > 0x7FFF:
        raise VideoFormatError("clip too long for one mkv cluster")

    ebml_hdr = elem(0x1A45DFA3,
                    elem(0x4282, b"matroska")    # DocType
                    + elem(0x4287, b"\x04"))     # DocTypeVersion
    info = elem(_EBML_INFO,
                elem(_EBML_TIMESCALE, uintp(1_000_000))
                + elem(_EBML_DURATION,
                       struct.pack(">d", float(n * delta_ms))))
    video = elem(_EBML_VIDEO,
                 elem(_EBML_PIXELW, uintp(width))
                 + elem(_EBML_PIXELH, uintp(height)))
    track = elem(_EBML_TRACKENTRY,
                 elem(_EBML_TRACKNUMBER, b"\x01")
                 + elem(0x73C5, b"\x01")          # TrackUID
                 + elem(_EBML_TRACKTYPE, b"\x01")  # video
                 + elem(_EBML_CODECID, b"V_MJPEG")
                 + video)
    blocks = []
    for i, f in enumerate(jpeg_frames):
        # SimpleBlock: track varint (0x81 = track 1) + s16 relative
        # timecode + flags (0x80 keyframe, no lacing) + frame bytes
        hdr = b"\x81" + struct.pack(">h", i * delta_ms) + b"\x80"
        blocks.append(elem(_EBML_SIMPLEBLOCK, hdr + f))
    cluster = elem(_EBML_CLUSTER,
                   elem(_EBML_CLUSTER_TS, uintp(0)) + b"".join(blocks))
    segment = elem(_EBML_SEGMENT,
                   info + elem(_EBML_TRACKS, track) + cluster)
    return ebml_hdr + segment


class MkvClip:
    """Matroska/webm reader for V_MJPEG tracks: EBML walk over
    Tracks (codec dispatch) and Clusters (SimpleBlock + BlockGroup/
    Block), lazy frame slicing. Tracks carrying inter-frame codecs
    (V_VP8/V_VP9/V_AV1/...) raise NotImplementedError — the honest
    boundary, now at the CODEC level instead of the container."""

    def __init__(self, data: bytes):
        if data[:4] != b"\x1a\x45\xdf\xa3":
            raise VideoFormatError("not an EBML (webm/matroska) file")
        self._data = data
        self.width = self.height = 0
        self._frames: list[tuple[int, int]] = []
        track_num = None
        codec = None
        cluster_spans: list[tuple[int, int]] = []
        for eid, a, b in _ebml_iter(data, 0, len(data)):
            if eid != _EBML_SEGMENT:
                continue
            for e2, a2, b2 in _ebml_iter(data, a, b):
                if e2 == _EBML_TRACKS:
                    for e3, a3, b3 in _ebml_iter(data, a2, b2):
                        if e3 != _EBML_TRACKENTRY:
                            continue
                        tn = ttype = None
                        cid = None
                        w = h = 0
                        for e4, a4, b4 in _ebml_iter(data, a3, b3):
                            if e4 == _EBML_TRACKNUMBER:
                                tn = _ebml_uint(data, a4, b4)
                            elif e4 == _EBML_TRACKTYPE:
                                ttype = _ebml_uint(data, a4, b4)
                            elif e4 == _EBML_CODECID:
                                cid = data[a4:b4].rstrip(b"\x00")
                            elif e4 == _EBML_VIDEO:
                                for e5, a5, b5 in _ebml_iter(data, a4, b4):
                                    if e5 == _EBML_PIXELW:
                                        w = _ebml_uint(data, a5, b5)
                                    elif e5 == _EBML_PIXELH:
                                        h = _ebml_uint(data, a5, b5)
                        if ttype == 1 and track_num is None:
                            track_num, codec = tn, cid
                            self.width, self.height = w, h
                elif e2 == _EBML_CLUSTER:
                    cluster_spans.append((a2, b2))
        if track_num is None:
            raise VideoFormatError("mkv has no video track")
        if codec is None:
            # a metadata skeleton (no CodecID) is malformed as a CLIP,
            # not an unsupported codec
            raise VideoFormatError("mkv video track has no CodecID")
        if codec != b"V_MJPEG":
            raise NotImplementedError(
                f"mkv codec {codec!r} is an inter-frame codec (needs "
                "ffmpeg/PyAV, absent here); V_MJPEG tracks decode for "
                "real")
        for a2, b2 in cluster_spans:
            for e3, a3, b3 in _ebml_iter(data, a2, b2):
                if e3 == _EBML_SIMPLEBLOCK:
                    self._add_block(a3, b3, track_num)
                elif e3 == _EBML_BLOCKGROUP:
                    for e4, a4, b4 in _ebml_iter(data, a3, b3):
                        if e4 == _EBML_BLOCK:
                            self._add_block(a4, b4, track_num)
        if not self._frames:
            raise VideoFormatError("mkv V_MJPEG track has no blocks")

    def _add_block(self, a: int, b: int, track_num: int) -> None:
        data = self._data
        tn, pos = _ebml_varint(data, a, keep_marker=False)
        if tn != track_num:
            return
        if pos + 3 > b:
            raise VideoFormatError("truncated mkv block header")
        flags = data[pos + 2]
        if flags & 0x06:
            raise VideoFormatError("mkv block lacing is not supported")
        self._frames.append((pos + 3, b - (pos + 3)))

    @property
    def n_frames(self) -> int:
        return len(self._frames)

    def frame_encoded(self, i: int) -> bytes:
        off, ln = self._frames[i]
        return self._data[off:off + ln]

    def frame_rgb(self, i: int) -> np.ndarray:
        from .imaging import decode_image
        px, _fmt = decode_image(self.frame_encoded(i))
        return px

    def frame_pair(self, i: int) -> tuple[bytes, np.ndarray]:
        fb = self.frame_encoded(i)
        from .imaging import decode_image
        px, _fmt = decode_image(fb)
        return fb, px
