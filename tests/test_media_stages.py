"""Multimodal resize + frame-sample actor stages (build-brief §multimodal):
resize is REAL (block-mean numpy); video decode is the stub boundary, with
the Ray-side plumbing driven end-to-end through the FAKEVID1 fixture."""
import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from mycelium_ray.imaging import decode_image, encode_image, psnr
from mycelium_ray.stages.media import (ResizeImages, SampleFrames,
                                       encode_fixture_video,
                                       resize_block_mean)


def _img(seed, w, h):
    return np.random.default_rng(seed).integers(
        0, 256, size=(h, w, 3), dtype=np.uint8)


def test_resize_block_mean_properties():
    px = _img(1, 40, 32)
    small = resize_block_mean(px, 16, 16)
    assert small.shape == (16, 16, 3) and small.dtype == np.uint8
    # global mean is preserved to block-rounding error
    assert abs(px.mean() - small.mean()) < 4.0
    flat = np.full((24, 24, 3), 77, dtype=np.uint8)
    assert (resize_block_mean(flat, 8, 8) == 77).all()


def test_resize_stage_over_dataset(ray_session):
    rows = []
    for i in range(6):
        px = _img(i, 20 + i, 30)
        rows.append({"image_id": f"i{i}",
                     "content": encode_image(px, ["png", "jpeg", "webp"][i % 3])})
    rows.append({"image_id": "bad", "content": b"not an image"})
    ds = rd.from_arrow(pa.table({
        "image_id": pa.array([r["image_id"] for r in rows]),
        "content": pa.array([r["content"] for r in rows], pa.binary()),
    }))
    out = ds.map_batches(ResizeImages(16, 16), batch_format="pyarrow",
                         batch_size=4, concurrency=2).to_pandas()
    good = out[out["resize_ok"]]
    assert len(good) == 6 and (good["resized_w"] == 16).all()
    for _, row in good.iterrows():
        px, _ = decode_image(row["content"])
        assert px.shape == (16, 16, 3)
    bad = out[~out["resize_ok"]]
    assert list(bad["image_id"]) == ["bad"]
    assert bad["content"].iloc[0] == b"not an image"  # passthrough


def test_frame_sampling_plumbing(ray_session):
    clips = []
    for v in range(3):
        frames = [_img(10 * v + f, 18, 12) for f in range(5 + v * 3)]
        clips.append((f"v{v}", encode_fixture_video(frames)))
    clips.append(("real.mp4", b"\x00\x00\x00\x18ftypmp42"))  # real container
    ds = rd.from_arrow(pa.table({
        "video_id": pa.array([c[0] for c in clips]),
        "video": pa.array([c[1] for c in clips], pa.binary()),
    }))
    out = ds.map_batches(SampleFrames(n_samples=4), batch_format="pyarrow",
                         batch_size=2, concurrency=2).to_pandas()
    ok = out[out["sample_ok"]]
    # 1 row in -> k frame rows out, evenly spaced, decodable
    assert ok.groupby("video_id").size().to_dict() == {"v0": 4, "v1": 4, "v2": 4}
    v2 = ok[ok["video_id"] == "v2"]["frame_idx"].tolist()
    assert v2 == [0, 2, 5, 8]  # evenly spaced over 11 frames
    px, _ = decode_image(ok["frame"].iloc[0])
    assert px.shape == (12, 18, 3)
    # real containers: clearly-marked stub, row survives with sample_ok=False
    stub = out[~out["sample_ok"]]
    assert list(stub["video_id"]) == ["real.mp4"]


def test_frame_sampler_stub_raises_directly():
    # the honest boundary is now at the CODEC level: a structurally
    # valid mkv whose track carries an inter-frame codec (VP9) raises
    # NotImplementedError (mp4/mkv MJPEG tracks decode for real; see
    # test_video.py for the round trips)
    from mycelium_ray.jpeg import encode_jpeg
    from mycelium_ray.video import mux_mkv_mjpeg
    frame = np.zeros((16, 16, 3), dtype=np.uint8)
    mkv = mux_mkv_mjpeg([encode_jpeg(frame)], 16, 16)
    vp9 = mkv.replace(b"V_MJPEG", b"V_VP9\x00\x00", 1)
    with pytest.raises(NotImplementedError):
        SampleFrames()._frames(vp9)


def test_audio_features_real_wav(ray_session):
    """WAV decode is REAL: a pure sine's RMS is 1/sqrt(2) of peak, its
    zero-crossing rate matches 2f/sr, and duration is exact; compressed
    payloads surface as audio_ok=False (stub boundary)."""
    from mycelium_ray.stages.media import AudioFeatures, encode_wav
    sr, f = 16000, 440.0
    t = np.arange(sr)  # exactly 1 s
    sine = (0.5 * 32767 * np.sin(2 * np.pi * f * t / sr)).astype(np.int16)
    silence = np.zeros(sr // 2, dtype=np.int16)
    ds = rd.from_arrow(pa.table({
        "audio_id": pa.array(["sine", "silence", "mp3"]),
        "audio": pa.array([encode_wav(sine, sr), encode_wav(silence, sr),
                           b"ID3\x04fakempeg"], pa.binary()),
    }))
    out = ds.map_batches(AudioFeatures(), batch_format="pyarrow",
                         batch_size=2, concurrency=2).to_pandas()
    out = out.set_index("audio_id")
    s = out.loc["sine"]
    assert s["audio_ok"] and s["duration_ms"] == 1000 and s["sample_rate"] == sr
    assert abs(s["rms"] - s["peak"] / np.sqrt(2)) < 0.01
    assert abs(s["zcr_ppm"] / 1e6 - 2 * f / sr) < 0.005
    q = out.loc["silence"]
    assert q["audio_ok"] and q["duration_ms"] == 500 and q["rms"] == 0.0
    assert not out.loc["mp3"]["audio_ok"]


# --------------------------------------------------------------------------
# AugmentImages
# --------------------------------------------------------------------------
def _aug_table(pxs, fmt="png"):
    import pyarrow as pa
    from mycelium_ray.imaging import encode_image
    return pa.table({
        "image_id": pa.array([f"img{i}" for i in range(len(pxs))]),
        "content": pa.array([encode_image(p, fmt) for p in pxs],
                            pa.binary()),
    })


def test_augment_pixel_semantics_lossless():
    import numpy as np
    from mycelium_ray.imaging import decode_image
    from mycelium_ray.stages.media import AugmentImages
    rng = np.random.default_rng(3)
    px = rng.integers(0, 256, size=(11, 17, 3), dtype=np.uint8)
    out = AugmentImages()(_aug_table([px], fmt="png"))
    rows = {out["aug"][i].as_py(): out["content"][i].as_py()
            for i in range(len(out))}
    flip, _ = decode_image(rows["hflip"])
    rot, _ = decode_image(rows["rot90"])
    assert np.array_equal(flip, px[:, ::-1])
    assert np.array_equal(rot, np.rot90(px))
    assert out["dims_ok"].to_pylist() == [True, True]
    # double flip = identity; rot90 of (11,17) has shape (17,11)
    flip2, _ = decode_image(
        AugmentImages()(_aug_table([flip], fmt="png"))["content"][0].as_py())
    assert np.array_equal(flip2, px)
    assert rot.shape == (17, 11, 3)


def test_augment_bad_payload_flagged_not_dropped():
    import pyarrow as pa
    from mycelium_ray.stages.media import AugmentImages
    t = pa.table({"image_id": pa.array(["bad"]),
                  "content": pa.array([b"not an image"], pa.binary())})
    out = AugmentImages()(t)
    assert len(out) == 2
    assert out["aug_ok"].to_pylist() == [False, False]
    assert out["dims_ok"].to_pylist() == [False, False]


def test_augment_rejects_unknown_op():
    import pytest as _pytest
    from mycelium_ray.stages.media import AugmentImages
    with _pytest.raises(ValueError):
        AugmentImages(ops=("hflip", "blur"))


def test_audio_features_flac_matches_wav():
    """The same samples through the FLAC path and the WAV path must give
    identical features (FLAC is lossless; both decode to the same int16)."""
    import numpy as np
    import pyarrow as pa
    from mycelium_ray.flac import encode_flac
    from mycelium_ray.stages.media import AudioFeatures, encode_wav
    t = np.arange(16000)
    x = (9000 * np.sin(2 * np.pi * 330 * t / 16000)).astype(np.int16)
    batch = pa.table({
        "audio_id": pa.array(["wav", "flac", "mp3ish"]),
        "audio": pa.array([encode_wav(x, 16000), encode_flac(x, 16000),
                           b"\xff\xfb garbage"], pa.binary()),
    })
    out = AudioFeatures()(batch)
    cols = {c: out[c].to_pylist() for c in out.column_names}
    assert cols["audio_ok"] == [True, True, False]
    for f in ("duration_ms", "rms", "peak", "zcr_ppm", "sample_rate"):
        assert cols[f][0] == cols[f][1], f
    assert cols["duration_ms"][0] == 1000
