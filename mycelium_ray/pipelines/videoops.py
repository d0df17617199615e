"""Video-payload pipeline over derived clips — the video analog of
audio.py: each document seeds a deterministic short clip, muxed with the
from-scratch container writers (doc_id%5 → MJPEG AVI via
mycelium_ray/video.py, YUV4MPEG2, animated GIF via mycelium_ray/gif.py,
MJPEG mp4 with full ISO 14496-12 sample tables, or V_MJPEG Matroska
over RFC 8794 EBML) and REALLY demuxed + frame-decoded by the
SampleFrames actor stage, so the driver's oracle gate exercises the
full mux→demux→JPEG/Y4M/GIF-LZW-decode path end to end across all five
containers.

Clip geometry (frame count, width, height) derives from doc_id by pure
integer arithmetic mirrored in the SQL oracle, so the sampled frame
indices and dimensions are provably exact while the codec work is real.

Reference analog: none (larroy/mycelium has no video path); this is the
build brief's multimodal frame-sample story made concrete.
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data as rd

_KNUTH = 2654435761  # same multiplicative-hash constant as audio.py
N_SAMPLES = 4


def _clip_params(doc_id: int) -> tuple[int, int, int]:
    """(n_frames, w, h) — integer arithmetic only (SQL-expressible)."""
    k = (doc_id * _KNUTH) % (1 << 32)
    n_frames = 2 + (k // 16) % 7        # 2..8
    w = 16 + 8 * (k % 3)                # 16/24/32 (even: C420-safe)
    h = 16 + 8 * ((k // 256) % 2)       # 16/24
    return n_frames, w, h


def _frame_px(doc_id: int, i: int, w: int, h: int) -> np.ndarray:
    """Deterministic smooth gradient frame (JPEG-friendly)."""
    gx = np.linspace(0, 255, w)[None, :]
    gy = np.linspace(0, 255, h)[:, None]
    r = np.clip(gx + 10.0 * i, 0, 255)
    g = np.clip(gy + 5.0 * (doc_id % 16), 0, 255)
    b = np.clip((gx + gy) / 2.0, 0, 255)
    return np.dstack([np.broadcast_to(r, (h, w)),
                      np.broadcast_to(g, (h, w)),
                      np.broadcast_to(b, (h, w))]).astype(np.uint8)


_GIF_PAL = np.stack([np.arange(16, dtype=np.uint16) * 17,
                     255 - np.arange(16, dtype=np.uint16) * 17,
                     (np.arange(16, dtype=np.uint16) * 29) % 256],
                    axis=1).astype(np.uint8)


def _gif_frame_px(doc_id: int, i: int, w: int, h: int) -> np.ndarray:
    """Deterministic 16-color indexed pattern (GIF is palette-based, so
    the GIF route gets exact-palette content instead of the smooth
    gradients the DCT routes use). The doc seed enters as an exact index
    shift — two seeds differing mod 16 differ at EVERY pixel, so
    content-equality ⇔ (w, h, doc_id%16, frame index), which is what the
    dup-group oracle asserts arithmetically."""
    x = np.arange(w)[None, :]
    y = np.arange(h)[:, None]
    idx = (x + 3 * y + 7 * i + doc_id % 16) % 16
    return _GIF_PAL[idx]


def synth_video_row(doc_id: int) -> bytes:
    """Deterministic clip bytes, doc_id%5 → MJPEG AVI / Y4M / animated
    GIF / MJPEG mp4 / V_MJPEG Matroska (the five REAL frame
    containers)."""
    from ..video import (encode_y4m, mux_avi_mjpeg, mux_mkv_mjpeg,
                         mux_mp4_mjpeg)
    n, w, h = _clip_params(doc_id)
    kind = doc_id % 5
    if kind == 2:
        from ..gif import encode_gif
        return encode_gif([_gif_frame_px(doc_id, i, w, h)
                           for i in range(n)])
    frames = [_frame_px(doc_id, i, w, h) for i in range(n)]
    if kind == 1:
        return encode_y4m(frames, colorspace="C420jpeg")
    from ..jpeg import encode_jpeg
    jpegs = [encode_jpeg(f) for f in frames]
    if kind == 0:
        return mux_avi_mjpeg(jpegs, w, h)
    if kind == 3:
        return mux_mp4_mjpeg(jpegs, w, h)
    return mux_mkv_mjpeg(jpegs, w, h)


def derive_video_batch(batch: pa.Table) -> pa.Table:
    ids = batch["doc_id"].to_pylist()
    return pa.table({
        "video_id": pa.array([f"http://vid.test/d/{d}" for d in ids],
                             pa.string()),
        "video": pa.array([synth_video_row(d) for d in ids], pa.binary()),
    })


def video_frame_sample(sf_dir: str):
    """(video_id, doc_id, frame_idx, w, h, sample_ok) — one row per
    sampled frame (≤ N_SAMPLES evenly-spaced indices per clip), via the
    REAL container demux + frame decode in the SampleFrames actor pool.
    Everything but the codec work is integer arithmetic mirrored in the
    oracle, which therefore checks the demuxed frame dims and the exact
    sampling rule."""
    from ..stages.media import SampleFrames

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id"])
    ds = ds.map_batches(derive_video_batch, batch_format="pyarrow",
                        batch_size=128)
    frames = ds.map_batches(SampleFrames(n_samples=N_SAMPLES),
                            batch_format="pyarrow", batch_size=64,
                            concurrency=4)

    def attach(t: pa.Table) -> pa.Table:
        ids = [int(s.rsplit("/", 1)[1]) for s in
               t["video_id"].to_pylist()]
        return pa.table({
            "video_id": t["video_id"],
            "doc_id": pa.array(ids, pa.int64()),
            "frame_idx": t["frame_idx"],
            "w": pa.array(t["w"].to_numpy().astype("int64"), pa.int64()),
            "h": pa.array(t["h"].to_numpy().astype("int64"), pa.int64()),
            "sample_ok": t["sample_ok"],
        })

    return frames.map_batches(attach, batch_format="pyarrow")


VIDEO_FRAME_SAMPLE_SQL = f"""
WITH d AS (
  SELECT doc_id, (doc_id * {_KNUTH}) % {1 << 32} AS k FROM documents
), p AS (
  SELECT doc_id,
         2 + (k // 16) % 7 AS n_frames,
         16 + 8 * (k % 3) AS w,
         16 + 8 * ((k // 256) % 2) AS h
  FROM d
), s AS (
  SELECT doc_id, n_frames, w, h,
         unnest(generate_series(0, CAST(least({N_SAMPLES}, n_frames)
                                        AS BIGINT) - 1)) AS i
  FROM p
)
SELECT 'http://vid.test/d/' || CAST(doc_id AS VARCHAR) AS video_id,
       doc_id,
       CAST(i * n_frames // least({N_SAMPLES}, n_frames) AS BIGINT)
         AS frame_idx,
       CAST(w AS BIGINT) AS w,
       CAST(h AS BIGINT) AS h,
       TRUE AS sample_ok
FROM s
"""


# --------------------------------------------------------------------------
# video_dup_groups: video-level exact near-dup grouping — the multimodal
# dedup pass over clips: sample frames (same rule as video_frame_sample),
# decode them, and group videos by the content signature of their sampled
# frames (container kind + per-frame dims + raw decoded pixels). Videos
# with bit-identical sampled content collapse into one group; rep = min
# doc_id (the kept representative). One bucketed groupby on the 64-bit
# signature — the dedup_exact shuffle shape, rows ∝ videos.
#
# The oracle derives the same groups arithmetically: two derived clips
# have identical sampled content iff they share (container kind, w, h,
# pixel seed doc_id%16, sampled index list) — codec determinism makes
# param-equality imply content-equality, and the container kind baked
# into the signature plus dims/pixel hashing make the converse hold on
# this corpus (a collision would fail the driver compare loudly).
# --------------------------------------------------------------------------
def _video_signature(data: bytes, n_samples: int = N_SAMPLES) -> int:
    import hashlib

    from ..video import open_video, probe_video
    clip = open_video(data)
    n = clip.n_frames
    take = min(n_samples, n)
    h = hashlib.blake2b(digest_size=8)
    h.update((probe_video(data) or "?").encode())
    for i in (j * n // take for j in range(take)):
        px = clip.frame_rgb(i)
        h.update(np.asarray(px.shape, dtype=np.int64).tobytes())
        h.update(px.tobytes())
    return int.from_bytes(h.digest(), "big") >> 1  # non-negative int64


def video_dup_groups(sf_dir: str):
    """(doc_id, rep, group_n) — every video assigned to its sampled-
    content dup group; rep = min doc_id of the group."""
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id"])

    def sig_rows(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        sigs = [_video_signature(synth_video_row(d)) for d in ids]
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "sig": pa.array(sigs, pa.int64()),
        })

    def group_rows(g) -> pa.Table:
        ids = g["doc_id"].to_numpy()
        rep = int(ids.min())
        return pa.table({
            "doc_id": pa.array(np.sort(ids).astype("int64"), pa.int64()),
            "rep": pa.array(np.full(len(ids), rep, dtype="int64"),
                            pa.int64()),
            "group_n": pa.array(np.full(len(ids), len(ids), dtype="int64"),
                                pa.int64()),
        })

    from .dedup import sorted_or_empty
    grouped = ds.map_batches(sig_rows, batch_format="pyarrow",
                             batch_size=128, concurrency=4) \
        .groupby("sig").map_groups(group_rows, batch_format="pandas")
    return sorted_or_empty(
        grouped, "doc_id",
        pa.table({"doc_id": pa.array([], pa.int64()),
                  "rep": pa.array([], pa.int64()),
                  "group_n": pa.array([], pa.int64())}))


VIDEO_DUP_GROUPS_SQL = f"""
WITH d AS (
  SELECT doc_id, (doc_id * {_KNUTH}) % {1 << 32} AS k FROM documents
), p AS (
  SELECT doc_id,
         2 + (k // 16) % 7 AS n_frames,
         16 + 8 * (k % 3) AS w,
         16 + 8 * ((k // 256) % 2) AS h
  FROM d
), gk AS (
  SELECT doc_id,
         CAST(doc_id % 5 AS VARCHAR) || '|' || CAST(w AS VARCHAR) || '|'
           || CAST(h AS VARCHAR) || '|' || CAST(doc_id % 16 AS VARCHAR)
           || '|' || array_to_string(
                list_transform(
                  generate_series(0, CAST(least({N_SAMPLES}, n_frames)
                                          AS BIGINT) - 1),
                  i -> CAST(i * n_frames
                            // least({N_SAMPLES}, n_frames) AS VARCHAR)),
                ',') AS gkey
  FROM p
)
SELECT doc_id,
       CAST(min(doc_id) OVER (PARTITION BY gkey) AS BIGINT) AS rep,
       CAST(count(*) OVER (PARTITION BY gkey) AS BIGINT) AS group_n
FROM gk
ORDER BY doc_id
"""


# --------------------------------------------------------------------------
# video_metadata: container-level triage across five video containers —
# the video analog of audio_metadata. AVI/Y4M report frame counts + dims
# from their real demux; mp4 rows exercise the ISO 14496-12 box walk
# (duration/dims from moov, codec honestly absent). Geometry derives from
# doc_id arithmetically → full oracle.
# --------------------------------------------------------------------------
def _vmeta_params(doc_id: int) -> tuple[str, int, int, int]:
    """(fmt, n_frames, w, h); webm n_frames is -1 (its metadata
    skeleton carries duration instead of a sample table); mp4 rows are
    REAL MJPEG clips, so their sample count is readable from stsz."""
    k = (doc_id * _KNUTH) % (1 << 32)
    kind = doc_id % 5
    n_frames = 2 + (k // 16) % 7
    w = 16 + 8 * (k % 3)
    h = 16 + 8 * ((k // 256) % 2)
    if kind == 2:
        return "mp4", n_frames, w, h
    if kind == 3:
        return "webm", -1, w, h
    if kind == 4:
        return "gif", n_frames, w, h
    return ("avi" if kind == 0 else "y4m"), n_frames, w, h


def synth_video_meta_row(doc_id: int) -> bytes:
    from ..video import (encode_y4m, mux_avi_mjpeg, mux_mp4_mjpeg,
                         write_webm_skeleton)
    fmt, n, w, h = _vmeta_params(doc_id)
    k = (doc_id * _KNUTH) % (1 << 32)
    if fmt == "mp4":
        from ..jpeg import encode_jpeg
        return mux_mp4_mjpeg([encode_jpeg(_frame_px(doc_id, i, w, h))
                              for i in range(n)], w, h)
    if fmt == "webm":
        return write_webm_skeleton(1000 + k % 9000, w, h)
    if fmt == "gif":
        from ..gif import encode_gif
        # default 10 cs/frame GCE delay ⇒ duration = 100·n_frames ms,
        # mirrored in the oracle
        return encode_gif([_gif_frame_px(doc_id, i, w, h)
                           for i in range(n)])
    frames = [_frame_px(doc_id, i, w, h) for i in range(n)]
    if fmt == "avi":
        from ..jpeg import encode_jpeg
        return mux_avi_mjpeg([encode_jpeg(f) for f in frames], w, h)
    return encode_y4m(frames, colorspace="C420jpeg")


class VideoProbe:
    """video:binary → (fmt, n_frames, w, h, duration_ms, meta_ok) from
    container structure only (AVI/Y4M: real demux headers + frame count;
    mp4: moov box walk; webm: EBML walk; GIF: block walk, LZW untouched).
    No frame decode anywhere — the triage pass."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..video import (open_video, probe_mp4_meta, probe_video,
                             probe_webm_meta)
        ids = batch["video_id"].to_pylist()
        blobs = batch["video"].to_pylist()
        out = {"video_id": [], "fmt": [], "n_frames": [], "w": [],
               "h": [], "duration_ms": [], "meta_ok": []}
        for vid, data in zip(ids, blobs):
            fmt, nf, w, h, dur, ok = "unknown", -1, -1, -1, -1, False
            try:
                kind = probe_video(data)
                if kind in ("mp4", "webm"):
                    m = probe_mp4_meta(data) if kind == "mp4" \
                        else probe_webm_meta(data)
                    # first track with real dimensions — in real files
                    # the first trak is often the audio track with 0x0
                    vt = next((t for t in m["tracks"] if t[0] and t[1]),
                              (-1, -1))
                    fmt, (w, h) = kind, vt
                    dur, ok = m["duration_ms"], True
                    # intra-frame (MJPEG) tracks expose their samples
                    # in container structure — Mp4Clip parses the
                    # stsz/stco tables, MkvClip walks Cluster blocks,
                    # neither decodes a frame. Inter-frame codecs /
                    # metadata-only skeletons keep n_frames = -1.
                    from ..video import MkvClip, Mp4Clip
                    try:
                        nf = (Mp4Clip(data) if kind == "mp4"
                              else MkvClip(data)).n_frames
                    except Exception:
                        pass
                elif kind == "gif":
                    from ..gif import probe_gif_meta
                    m = probe_gif_meta(data)   # header walk, no LZW
                    fmt, nf = "gif", m["n_frames"]
                    w, h = m["width"], m["height"]
                    dur, ok = m["duration_ms"], True
                elif kind in ("avi", "y4m", "fakevid"):
                    clip = open_video(data)
                    fmt, nf = kind, clip.n_frames
                    w = getattr(clip, "width", -1)
                    h = getattr(clip, "height", -1)
                    ok = True
            except Exception:
                pass
            out["video_id"].append(vid)
            out["fmt"].append(fmt)
            out["n_frames"].append(nf)
            out["w"].append(w)
            out["h"].append(h)
            out["duration_ms"].append(dur)
            out["meta_ok"].append(ok)
        return pa.table({
            "video_id": pa.array(out["video_id"], pa.string()),
            "fmt": pa.array(out["fmt"], pa.string()),
            "n_frames": pa.array(out["n_frames"], pa.int64()),
            "w": pa.array(out["w"], pa.int64()),
            "h": pa.array(out["h"], pa.int64()),
            "duration_ms": pa.array(out["duration_ms"], pa.int64()),
            "meta_ok": pa.array(out["meta_ok"], pa.bool_()),
        })


def video_metadata(sf_dir: str):
    """(video_id, doc_id, fmt, n_frames, w, h, duration_ms, meta_ok) via
    the VideoProbe actor pool over the 5-container derived corpus."""
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id"])

    def derive(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        return pa.table({
            "video_id": pa.array([f"http://vid.test/m/{d}" for d in ids],
                                 pa.string()),
            "video": pa.array([synth_video_meta_row(d) for d in ids],
                              pa.binary()),
        })

    probed = ds.map_batches(derive, batch_format="pyarrow",
                            batch_size=128) \
        .map_batches(VideoProbe(), batch_format="pyarrow",
                     batch_size=128, concurrency=4)

    def attach(t: pa.Table) -> pa.Table:
        ids = [int(s.rsplit("/", 1)[1]) for s in
               t["video_id"].to_pylist()]
        return t.append_column("doc_id", pa.array(ids, pa.int64()))

    return probed.map_batches(attach, batch_format="pyarrow")


VIDEO_METADATA_SQL = f"""
WITH d AS (
  SELECT doc_id, (doc_id * {_KNUTH}) % {1 << 32} AS k, doc_id % 5 AS kind
  FROM documents
), p AS (
  SELECT doc_id, k, kind,
         CASE kind WHEN 0 THEN 'avi' WHEN 1 THEN 'y4m'
                   WHEN 2 THEN 'mp4' WHEN 3 THEN 'webm' ELSE 'gif' END
           AS fmt,
         CASE WHEN kind = 3 THEN -1 ELSE 2 + (k // 16) % 7 END
           AS n_frames,
         16 + 8 * (k % 3) AS w,
         16 + 8 * ((k // 256) % 2) AS h
  FROM d
)
SELECT 'http://vid.test/m/' || CAST(doc_id AS VARCHAR) AS video_id,
       fmt,
       CAST(n_frames AS BIGINT) AS n_frames,
       CAST(w AS BIGINT) AS w,
       CAST(h AS BIGINT) AS h,
       CAST(CASE WHEN kind = 2 THEN 40 * n_frames
                 WHEN kind = 3 THEN 1000 + k % 9000
                 WHEN kind = 4 THEN 100 * n_frames
                 ELSE -1 END AS BIGINT) AS duration_ms,
       TRUE AS meta_ok,
       doc_id
FROM p
"""


# --------------------------------------------------------------------------
# video_scene_cuts: shot-boundary detection — the first real analysis a
# video pipeline runs after demux (split clips into shots before
# dedup/sampling). Consecutive decoded frames are compared by mean
# absolute pixel difference; a boundary is a jump above CUT_THRESH.
# Clips derive with smooth gradient motion (diff ~3/frame incl. codec
# noise) and, on doc_id % 3 != 0 rows, ONE planted hard cut (frames
# invert from a derived index on: boundary diff ~100+), so the
# threshold sits in a 10x margin and the oracle pins the exact cut
# index arithmetically while the demux + frame decode work is real.
# --------------------------------------------------------------------------
CUT_THRESH = 60.0


def _cut_params(doc_id: int) -> tuple[int, int, int, int]:
    """(n_frames, w, h, cut_index) — cut_index -1 when no cut."""
    n, w, h = _clip_params(doc_id)
    if doc_id % 3 == 0:
        return n, w, h, -1
    k = (doc_id * _KNUTH) % (1 << 32)
    return n, w, h, 1 + k % (n - 1)


def synth_cut_clip(doc_id: int) -> bytes:
    """Gradient clip, doc_id%4 → AVI / Y4M / MP4 / MKV (the four
    gradient-content containers; GIF's palette pattern changes every
    pixel every frame, which IS a cut, so it stays out of this corpus)."""
    from ..jpeg import encode_jpeg
    from ..video import (encode_y4m, mux_avi_mjpeg, mux_mkv_mjpeg,
                         mux_mp4_mjpeg)
    n, w, h, cut = _cut_params(doc_id)
    frames = []
    for i in range(n):
        px = _frame_px(doc_id, i, w, h)
        if cut >= 0 and i >= cut:
            px = (255 - px.astype(np.int32)).astype(np.uint8)
        frames.append(px)
    kind = doc_id % 4
    if kind == 1:
        return encode_y4m(frames, colorspace="C420jpeg")
    jpegs = [encode_jpeg(f) for f in frames]
    if kind == 0:
        return mux_avi_mjpeg(jpegs, w, h)
    if kind == 2:
        return mux_mp4_mjpeg(jpegs, w, h)
    return mux_mkv_mjpeg(jpegs, w, h)


class SceneCuts:
    """video:binary → (n_cuts, cut_frame, scan_ok): decode every frame
    (clips here are short; a long clip would stride), diff consecutive
    frames, report boundaries above the threshold."""

    def __init__(self, thresh: float = CUT_THRESH):
        self.thresh = thresh

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..video import open_video
        vids = batch["video_id"].to_pylist()
        out = {"video_id": [], "n_cuts": [], "cut_frame": [], "scan_ok": []}
        for vid, data in zip(vids, batch["video"].to_pylist()):
            try:
                clip = open_video(data)
                prev = None
                n_cuts, first = 0, -1
                for i in range(clip.n_frames):
                    px = clip.frame_rgb(i).astype(np.float64)
                    if prev is not None:
                        d = float(np.abs(px - prev).mean())
                        if d > self.thresh:
                            n_cuts += 1
                            if first < 0:
                                first = i
                    prev = px
                out["video_id"].append(vid)
                out["n_cuts"].append(n_cuts)
                out["cut_frame"].append(first)
                out["scan_ok"].append(True)
            except Exception:
                out["video_id"].append(vid)
                out["n_cuts"].append(-1)
                out["cut_frame"].append(-1)
                out["scan_ok"].append(False)
        return pa.table({
            "video_id": pa.array(out["video_id"], pa.string()),
            "n_cuts": pa.array(out["n_cuts"], pa.int64()),
            "cut_frame": pa.array(out["cut_frame"], pa.int64()),
            "scan_ok": pa.array(out["scan_ok"], pa.bool_()),
        })


def video_scene_cuts(sf_dir: str):
    """(video_id, doc_id, n_cuts, cut_frame, scan_ok), oracle-exact."""
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id"])

    def derive(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        return pa.table({
            "video_id": pa.array([f"http://vid.test/c/{d}" for d in ids],
                                 pa.string()),
            "video": pa.array([synth_cut_clip(d) for d in ids],
                              pa.binary()),
        })

    scanned = ds.map_batches(derive, batch_format="pyarrow",
                             batch_size=128) \
        .map_batches(SceneCuts(), batch_format="pyarrow", batch_size=64,
                     concurrency=4)

    def attach(t: pa.Table) -> pa.Table:
        ids = [int(s.rsplit("/", 1)[1]) for s in
               t["video_id"].to_pylist()]
        return pa.table({
            "video_id": t["video_id"],
            "doc_id": pa.array(ids, pa.int64()),
            "n_cuts": t["n_cuts"],
            "cut_frame": t["cut_frame"],
            "scan_ok": t["scan_ok"],
        })

    return scanned.map_batches(attach, batch_format="pyarrow")


VIDEO_SCENE_CUTS_SQL = f"""
WITH d AS (
  SELECT doc_id, (doc_id * {_KNUTH}) % {1 << 32} AS k FROM documents
), p AS (
  SELECT doc_id, k, 2 + (k // 16) % 7 AS n_frames FROM d
)
SELECT 'http://vid.test/c/' || CAST(doc_id AS VARCHAR) AS video_id,
       doc_id,
       CAST(CASE WHEN doc_id % 3 = 0 THEN 0 ELSE 1 END AS BIGINT)
         AS n_cuts,
       CAST(CASE WHEN doc_id % 3 = 0 THEN -1
                 ELSE 1 + k % (n_frames - 1) END AS BIGINT) AS cut_frame,
       TRUE AS scan_ok
FROM p
"""
