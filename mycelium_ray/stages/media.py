"""Multimodal actor-pool stages beyond decode: resize and video
frame-sampling (build-brief §multimodal: "decode / feature-extract /
resize / frame-sample as actor-pool map_batches stages").

``ResizeImages`` is REAL: block-mean downscale in pure numpy (the same
bucketed-index reduction as imaging.phash64's 8×8 step, generalized to any
target), re-encoded with the available codecs. ``SampleFrames`` is REAL
for MJPEG AVI and YUV4MPEG2 payloads (from-scratch container parsers in
mycelium_ray.video, frames decoded by the in-repo JPEG / BT.601 paths)
plus the FAKEVID1 fixture; mp4/webm remain NotImplementedError — their
inter-frame codecs need ffmpeg-class decoders absent from this
container — and surface as explicit sample_ok=False rows.

Fixture video container (``FAKEVID1``): magic ``FAKEVID1`` + uint32 frame
count + frames, each uint32 length + encoded-image bytes (any
imaging.decode_image format).
"""

from __future__ import annotations

import struct

import numpy as np
import pyarrow as pa

from ..imaging import ImageDecodeError, decode_image, encode_image

VIDEO_MAGIC = b"FAKEVID1"


def resize_block_mean(px: np.ndarray, tw: int, th: int) -> np.ndarray:
    """Block-mean resize (h, w, 3) → (th, tw, 3) uint8 for any size ≥
    target; pure numpy (bucketed indices + np.add.at), no image libs."""
    h, w, _ = px.shape
    yi = (np.arange(h) * th // h)
    xi = (np.arange(w) * tw // w)
    acc = np.zeros((th, tw, 3), dtype=np.float64)
    cnt = np.zeros((th, tw, 1), dtype=np.float64)
    np.add.at(acc, (yi[:, None].repeat(w, 1), xi[None, :].repeat(h, 0)),
              px.astype(np.float64))
    np.add.at(cnt, (yi[:, None].repeat(w, 1), xi[None, :].repeat(h, 0)), 1.0)
    return np.clip(np.rint(acc / np.maximum(cnt, 1)), 0, 255).astype(np.uint8)


class ResizeImages:
    """content:binary → (content resized+re-encoded, w, h) actor stage.

    __init__ holds the target (and would hold codec state with a real
    libjpeg); __call__ is per-batch. Rows that fail to decode pass
    through unchanged with resize_ok=False.
    """

    def __init__(self, target_w: int = 16, target_h: int = 16):
        self.tw, self.th = target_w, target_h

    def __call__(self, batch: pa.Table) -> pa.Table:
        contents = batch["content"].to_pylist()
        out_bytes, ws, hs, ok = [], [], [], []
        for data in contents:
            try:
                px, fmt = decode_image(data)
                small = resize_block_mean(px, self.tw, self.th)
                out_bytes.append(encode_image(small, fmt))
                ws.append(self.tw)
                hs.append(self.th)
                ok.append(True)
            except (ImageDecodeError, Exception):
                out_bytes.append(data)
                ws.append(-1)
                hs.append(-1)
                ok.append(False)
        return batch.drop_columns(["content"]) \
            .append_column("content", pa.array(out_bytes, pa.binary())) \
            .append_column("resized_w", pa.array(ws, pa.int32())) \
            .append_column("resized_h", pa.array(hs, pa.int32())) \
            .append_column("resize_ok", pa.array(ok, pa.bool_()))


# --------------------------------------------------------------------------
# video frame sampling
# --------------------------------------------------------------------------
def encode_fixture_video(frames: list[np.ndarray], fmt: str = "png") -> bytes:
    """Test-fixture container: concatenated encoded frames."""
    blobs = [encode_image(f, fmt) for f in frames]
    out = [VIDEO_MAGIC, struct.pack(">I", len(blobs))]
    for b in blobs:
        out.append(struct.pack(">I", len(b)))
        out.append(b)
    return b"".join(out)


def _decode_fixture_video(data: bytes) -> list[bytes]:
    (n,) = struct.unpack(">I", data[8:12])
    off = 12
    frames = []
    for _ in range(n):
        (ln,) = struct.unpack(">I", data[off:off + 4])
        off += 4
        frames.append(data[off:off + ln])
        off += ln
    return frames


class FixtureClip:
    """Clip adapter for the FAKEVID1 fixture container (same n_frames /
    frame_rgb / frame_encoded protocol as video.AviClip / Y4mClip)."""

    def __init__(self, data: bytes):
        self._frames = _decode_fixture_video(data)

    @property
    def n_frames(self) -> int:
        return len(self._frames)

    def frame_encoded(self, i: int) -> bytes:
        return self._frames[i]

    def frame_rgb(self, i: int):
        px, _fmt = decode_image(self._frames[i])
        return px

    def frame_pair(self, i: int):
        fb = self._frames[i]
        px, _fmt = decode_image(fb)
        return fb, px


class AudioProbe:
    """audio:binary → container-metadata row, NO sample decode.

    The triage pass a 100-TB audio corpus runs first: duration / sample
    rate / channels straight from the container layer (WAV fmt chunk,
    FLAC STREAMINFO, Ogg page granules incl. vorbis and opus, MP3 frame-
    header walk — mycelium_ray/audiometa.py, all from public specs), so
    filtering by length/rate never pays codec cost. Unparseable bytes
    surface as meta_ok=False rows.
    """

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..audiometa import probe_audio
        ids = batch["audio_id"].to_pylist()
        blobs = batch["audio"].to_pylist()
        out = {"audio_id": [], "fmt": [], "sample_rate": [],
               "channels": [], "duration_ms": [], "meta_ok": []}
        for aid, data in zip(ids, blobs):
            try:
                m = probe_audio(data)
                row = (m.fmt, m.sample_rate, m.channels, m.duration_ms,
                       True)
            except Exception:
                row = ("unknown", -1, -1, -1, False)
            out["audio_id"].append(aid)
            out["fmt"].append(row[0])
            out["sample_rate"].append(row[1])
            out["channels"].append(row[2])
            out["duration_ms"].append(row[3])
            out["meta_ok"].append(row[4])
        return pa.table({
            "audio_id": pa.array(out["audio_id"], pa.string()),
            "fmt": pa.array(out["fmt"], pa.string()),
            "sample_rate": pa.array(out["sample_rate"], pa.int64()),
            "channels": pa.array(out["channels"], pa.int64()),
            "duration_ms": pa.array(out["duration_ms"], pa.int64()),
            "meta_ok": pa.array(out["meta_ok"], pa.bool_()),
        })


class AudioFeatures:
    """audio:binary → per-clip features (duration, rms, peak,
    zero-crossing rate). WAV decode is REAL for every sample format
    (from-scratch wavcodec.py: 8/16/24/32-bit PCM, float32/64, G.711
    A-law/µ-law, IMA ADPCM, WAVE_FORMAT_EXTENSIBLE) and so is FLAC
    (from-scratch RFC 9639 decoder, mycelium_ray/flac.py), Ogg FLAC and
    Ogg VORBIS (from-scratch Vorbis I transform decoder,
    mycelium_ray/vorbis.py); mp3/opus remain the stub boundary and raise
    NotImplementedError internally (no libsndfile/ffmpeg in this
    container), surfacing as audio_ok=False rows.
    """

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["audio_id"].to_pylist()
        blobs = batch["audio"].to_pylist()
        out = {"audio_id": [], "duration_ms": [], "rms": [], "peak": [],
               "zcr_ppm": [], "sample_rate": [], "audio_ok": []}
        for aid, data in zip(ids, blobs):
            try:
                sr, samples = self._decode(data)
                x = samples.astype(np.float64) / 32768.0
                out["audio_id"].append(aid)
                out["duration_ms"].append(int(len(x) * 1000 / sr))
                out["rms"].append(float(np.sqrt(np.mean(x * x))) if len(x)
                                  else 0.0)
                out["peak"].append(float(np.abs(x).max()) if len(x) else 0.0)
                zc = int((np.signbit(x[1:]) != np.signbit(x[:-1])).sum()) \
                    if len(x) > 1 else 0
                out["zcr_ppm"].append(int(zc * 1_000_000 / max(len(x) - 1, 1)))
                out["sample_rate"].append(sr)
                out["audio_ok"].append(True)
            except (NotImplementedError, Exception):
                out["audio_id"].append(aid)
                out["duration_ms"].append(-1)
                out["rms"].append(0.0)
                out["peak"].append(0.0)
                out["zcr_ppm"].append(-1)
                out["sample_rate"].append(-1)
                out["audio_ok"].append(False)
        return pa.table({
            "audio_id": pa.array(out["audio_id"], pa.string()),
            "duration_ms": pa.array(out["duration_ms"], pa.int64()),
            "rms": pa.array(out["rms"], pa.float64()),
            "peak": pa.array(out["peak"], pa.float64()),
            "zcr_ppm": pa.array(out["zcr_ppm"], pa.int64()),
            "sample_rate": pa.array(out["sample_rate"], pa.int32()),
            "audio_ok": pa.array(out["audio_ok"], pa.bool_()),
        })

    @staticmethod
    def _decode(data: bytes) -> tuple[int, np.ndarray]:
        """bytes → (sample_rate, mono int16 samples). WAV and FLAC are
        REAL (FLAC: from-scratch RFC 9639 decoder in mycelium_ray/flac.py,
        CRC + MD5-verified); mp3/ogg remain the stub boundary."""
        if data[:4] == b"fLaC":
            from ..flac import decode_flac
            sr, ch, x = decode_flac(data)
            if ch > 1:  # downmix to mono, same rule as the WAV path
                x = x.mean(axis=1).astype(np.int16)
            else:
                x = x[:, 0].astype(np.int16)
            return sr, x
        if data[:4] == b"OggS":
            # Ogg FLAC and Ogg VORBIS both decode for real (vorbis.py is
            # the from-scratch Vorbis I transform decoder); opus remains
            # the codec-level stub boundary inside decode_ogg_flac
            nsegs = data[26] if len(data) > 26 else 0
            bos = data[27 + nsegs: 27 + nsegs + 7]
            if bos.startswith(b"\x01vorbis"):
                from ..vorbis import decode_ogg_vorbis_int16
                sr, ch, x = decode_ogg_vorbis_int16(data)
            else:
                from ..audiometa import decode_ogg_flac
                sr, ch, x = decode_ogg_flac(data)
            if ch > 1:
                x = x.mean(axis=1).astype(np.int16)
            else:
                x = x[:, 0].astype(np.int16)
            return sr, x
        if data[:4] == b"RIFF" and data[8:12] == b"WAVE":
            # from-scratch RIFF walk (wavcodec.py): 8/16/24/32-bit PCM,
            # float32/64, G.711 A-law/µ-law, WAVE_FORMAT_EXTENSIBLE —
            # the old "only 16-bit PCM WAV" boundary is gone
            from ..wavcodec import decode_wav_any
            sr, ch, x = decode_wav_any(data)
            if ch > 1:  # downmix to mono
                x = x.mean(axis=1).astype(np.int16)
            else:
                x = x[:, 0]
            return sr, x
        raise NotImplementedError(
            "mp3/ogg need libsndfile/ffmpeg, absent from this container; "
            "WAV (all PCM/float/G.711 variants) and FLAC decode for real")


def encode_wav(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """int16 mono samples → WAV bytes (test fixture helper)."""
    import io
    import wave
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(np.asarray(samples, dtype="<i2").tobytes())
    return buf.getvalue()


class SampleFrames:
    """video:binary → one output row per sampled frame.

    Deterministic sampling: ``n_samples`` frame indices evenly spaced
    over the clip (same rule a production pipeline uses for thumbnail /
    embedding extraction). REAL containers: MJPEG AVI (RIFF), MJPEG mp4
    (ISO 14496-12 sample tables), YUV4MPEG2 and animated GIF via the
    from-scratch parsers in mycelium_ray.video/gif, plus the FAKEVID1
    test fixture. Sampling picks indices BEFORE any frame decode (the
    clip readers are lazy), so cost ∝ n_samples, not clip length.
    webm and inter-frame mp4 codecs (H.264 etc.) stay
    NotImplementedError — they need ffmpeg-class decoders absent from
    this environment — and produce an explicit error row instead of
    failing the batch.
    """

    def __init__(self, n_samples: int = 4):
        self.n_samples = n_samples

    def _frames(self, data: bytes) -> list[bytes]:
        """Back-compat shim (tests): all frames of a decodable clip."""
        from ..video import open_video
        clip = open_video(data)
        return [clip.frame_encoded(i) for i in range(clip.n_frames)]

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..video import open_video
        vids = batch["video_id"].to_pylist()
        blobs = batch["video"].to_pylist()
        out = {"video_id": [], "frame_idx": [], "frame": [],
               "w": [], "h": [], "sample_ok": []}
        for vid, data in zip(vids, blobs):
            # per-CLIP failure isolation: a corrupt container OR a
            # corrupt frame inside a valid container must cost one
            # sample_ok=False row, never the batch (a 100-TB corpus
            # always contains some broken bytes)
            try:
                clip = open_video(data)
                n = clip.n_frames
                take = min(self.n_samples, n)
                idxs = (np.arange(take) * n // take) if take else []
                rows = []
                for i in idxs:
                    # frame_pair: exactly one decode per sampled frame
                    # (AVI passes the stored JPEG through; y4m encodes
                    # the decoded pixels to PNG once, no decode-back)
                    fb, px = clip.frame_pair(int(i))
                    rows.append((int(i), fb, px.shape[1], px.shape[0]))
            except Exception:
                out["video_id"].append(vid)
                out["frame_idx"].append(-1)
                out["frame"].append(b"")
                out["w"].append(-1)
                out["h"].append(-1)
                out["sample_ok"].append(False)
                continue
            for i, fb, w, h in rows:
                out["video_id"].append(vid)
                out["frame_idx"].append(i)
                out["frame"].append(fb)
                out["w"].append(w)
                out["h"].append(h)
                out["sample_ok"].append(True)
        return pa.table({
            "video_id": pa.array(out["video_id"], pa.string()),
            "frame_idx": pa.array(out["frame_idx"], pa.int64()),
            "frame": pa.array(out["frame"], pa.binary()),
            "w": pa.array(out["w"], pa.int32()),
            "h": pa.array(out["h"], pa.int32()),
            "sample_ok": pa.array(out["sample_ok"], pa.bool_()),
        })


# --------------------------------------------------------------------------
# image augmentation (1 row → k augmented rows)
# --------------------------------------------------------------------------
AUG_OPS = ("hflip", "rot90")


class AugmentImages:
    """content:binary → one row PER AUGMENTATION (1→k fan-out on the
    image path, the train-time counterpart of SampleFrames' 1→k):
    horizontal flip and 90°-counterclockwise rotation, decoded → numpy
    view op → re-encoded in the source format. Emits (image_id, aug,
    content, out_w, out_h, dims_ok, aug_ok): ``dims_ok`` asserts the
    geometry contract (flip preserves dims, rot90 swaps them) so the
    driver oracle can value-check it; exact pixel semantics
    (fliplr/rot90, double-flip identity) are pinned by pytest on the
    lossless codecs.
    """

    def __init__(self, ops: tuple[str, ...] = AUG_OPS,
                 id_col: str = "image_id"):
        unknown = set(ops) - set(AUG_OPS)
        if unknown:
            raise ValueError(f"unknown augmentations: {sorted(unknown)}")
        self.ops = ops
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col].to_pylist()
        contents = batch["content"].to_pylist()
        o_id, o_aug, o_bytes, o_w, o_h, o_dims, o_ok = \
            [], [], [], [], [], [], []
        for rid, data in zip(ids, contents):
            try:
                px, fmt = decode_image(data)
            except (ImageDecodeError, Exception):
                for op in self.ops:
                    o_id.append(rid)
                    o_aug.append(op)
                    o_bytes.append(data)
                    o_w.append(-1)
                    o_h.append(-1)
                    o_dims.append(False)
                    o_ok.append(False)
                continue
            h, w = px.shape[0], px.shape[1]
            for op in self.ops:
                if op == "hflip":
                    out = px[:, ::-1]
                    want = (w, h)
                else:  # rot90 counterclockwise
                    out = np.rot90(px)
                    want = (h, w)
                oh, ow = out.shape[0], out.shape[1]
                o_id.append(rid)
                o_aug.append(op)
                o_bytes.append(encode_image(np.ascontiguousarray(out), fmt))
                o_w.append(ow)
                o_h.append(oh)
                o_dims.append((ow, oh) == want)
                o_ok.append(True)
        return pa.table({
            self.id_col: pa.array(o_id),
            "aug": pa.array(o_aug, pa.string()),
            "content": pa.array(o_bytes, pa.binary()),
            "out_w": pa.array(o_w, pa.int32()),
            "out_h": pa.array(o_h, pa.int32()),
            "dims_ok": pa.array(o_dims, pa.bool_()),
            "aug_ok": pa.array(o_ok, pa.bool_()),
        })


# --------------------------------------------------------------------------
# region redaction (image-PII blurring)
# --------------------------------------------------------------------------
def pixelate_region(px: np.ndarray, x0: int, y0: int, bw: int, bh: int,
                    cell: int = 4) -> np.ndarray:
    """Replace the (x0, y0, bw, bh) box with cellxcell-superpixel means —
    the standard face/PII mosaic. Fully vectorized: zero-pad the box to
    cell multiples, one reshape-sum per axis pair, divide by true pixel
    counts so partial edge cells average only their own pixels."""
    out = px.copy()
    box = out[y0:y0 + bh, x0:x0 + bw].astype(np.float64)
    h, w, c = box.shape
    ph = -(-h // cell) * cell
    pw = -(-w // cell) * cell
    padded = np.zeros((ph, pw, c), dtype=np.float64)
    padded[:h, :w] = box
    ones = np.zeros((ph, pw, 1), dtype=np.float64)
    ones[:h, :w] = 1.0
    sums = padded.reshape(ph // cell, cell, pw // cell, cell, c) \
        .sum(axis=(1, 3))
    cnts = ones.reshape(ph // cell, cell, pw // cell, cell, 1) \
        .sum(axis=(1, 3))
    means = sums / np.maximum(cnts, 1.0)
    full = np.repeat(np.repeat(means, cell, axis=0), cell, axis=1)[:h, :w]
    out[y0:y0 + bh, x0:x0 + bw] = np.clip(
        np.rint(full), 0, 255).astype(np.uint8)
    return out


class RedactRegions:
    """content:binary → content with a doc-derived detection box
    pixelated, re-encoded in the source format. The box stands in for a
    face/plate detector's output (the detector model would load in
    __init__ on a real deployment); geometry = the middle-half box
    offset by doc_id so every image redacts a different region.

    Rows that fail to decode pass through with redact_ok=False — the
    same error-row contract as ResizeImages.
    """

    def __init__(self, cell: int = 4):
        self.cell = cell

    @staticmethod
    def box_of(doc_id: int, w: int, h: int) -> tuple[int, int, int, int]:
        bw, bh = max(1, w // 2), max(1, h // 2)
        x0 = (doc_id % 3) * (w - bw) // 2 if w > bw else 0
        y0 = ((doc_id // 3) % 3) * (h - bh) // 2 if h > bh else 0
        return x0, y0, bw, bh

    def __call__(self, batch: pa.Table) -> pa.Table:
        contents = batch["content"].to_pylist()
        doc_ids = batch["doc_id"].to_numpy()
        out_bytes, ok, xs, ys, ws, hs = [], [], [], [], [], []
        for data, doc in zip(contents, doc_ids):
            try:
                px, fmt = decode_image(data)
                x0, y0, bw, bh = self.box_of(int(doc), px.shape[1],
                                             px.shape[0])
                red = pixelate_region(px, x0, y0, bw, bh, self.cell)
                out_bytes.append(encode_image(red, fmt))
                xs.append(x0)
                ys.append(y0)
                ws.append(bw)
                hs.append(bh)
                ok.append(True)
            except (ImageDecodeError, Exception):
                out_bytes.append(data)
                xs.append(-1)
                ys.append(-1)
                ws.append(-1)
                hs.append(-1)
                ok.append(False)
        return batch.drop_columns(["content"]) \
            .append_column("content", pa.array(out_bytes, pa.binary())) \
            .append_column("box_x", pa.array(xs, pa.int32())) \
            .append_column("box_y", pa.array(ys, pa.int32())) \
            .append_column("box_w", pa.array(ws, pa.int32())) \
            .append_column("box_h", pa.array(hs, pa.int32())) \
            .append_column("redact_ok", pa.array(ok, pa.bool_()))


class CropBorders:
    """content:binary → letterbox/pillarbox removal: strip maximal
    uniform edge bands (every pixel equal to its corner pixel), the
    standard pre-phash cleanup for scraped images (borders dominate the
    hash and hide near-dups). Real decode; lossless PNG re-encode so the
    crop is byte-faithful. Error rows pass through crop_ok=False."""

    @staticmethod
    def detect(px: np.ndarray) -> tuple[int, int, int, int]:
        """(top, bottom, left, right) uniform-band widths."""
        h, w = px.shape[:2]

        def band(axis_slices, corner):
            n = 0
            for sl in axis_slices:
                plane = px[sl]
                if np.all(plane == corner):
                    n += 1
                else:
                    break
            return n

        top = band([np.s_[i, :] for i in range(h - 1)], px[0, 0])
        bot = band([np.s_[h - 1 - i, :] for i in range(h - 1 - top)],
                   px[h - 1, 0])
        left = band([np.s_[:, i] for i in range(w - 1)], px[0, 0])
        right = band([np.s_[:, w - 1 - i] for i in range(w - 1 - left)],
                     px[0, w - 1])
        return top, bot, left, right

    def __call__(self, batch: pa.Table) -> pa.Table:
        out_bytes, ok, hb, wc, hc = [], [], [], [], []
        for data in batch["content"].to_pylist():
            try:
                px, _ = decode_image(data)
                t, b, l, r = self.detect(px)
                h, w = px.shape[:2]
                cropped = px[t:h - b, l:w - r]
                out_bytes.append(encode_image(cropped, "png"))
                ok.append(True)
                hb.append(bool(t or b or l or r))
                hc.append(cropped.shape[0])
                wc.append(cropped.shape[1])
            except (ImageDecodeError, Exception):
                out_bytes.append(data)
                ok.append(False)
                hb.append(False)
                hc.append(-1)
                wc.append(-1)
        return batch.drop_columns(["content"]) \
            .append_column("content", pa.array(out_bytes, pa.binary())) \
            .append_column("had_border", pa.array(hb, pa.bool_())) \
            .append_column("cropped_w", pa.array(wc, pa.int32())) \
            .append_column("cropped_h", pa.array(hc, pa.int32())) \
            .append_column("crop_ok", pa.array(ok, pa.bool_()))
