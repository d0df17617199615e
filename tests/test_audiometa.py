"""Container-metadata probing (audiometa.py): WAV / FLAC / Ogg / MP3.

The skeleton writers produce structurally-valid containers; the parsers
must recover the exact geometry, verify Ogg page CRCs, and fail loudly
on corrupt or unknown bytes.
"""
import numpy as np
import pyarrow as pa
import pytest

from mycelium_ray.audiometa import (AudioMeta, AudioMetaError, ogg_crc,
                                    probe_audio,
                                    write_flac_streaminfo_skeleton,
                                    write_mp3_skeleton,
                                    write_ogg_opus_skeleton,
                                    write_ogg_vorbis_skeleton,
                                    write_wav_skeleton)


def test_wav_probe_exact():
    m = probe_audio(write_wav_skeleton(16000, 2, 8000))
    assert m == AudioMeta("wav", 16000, 2, 500, 8000)


def test_wav_probe_matches_stdlib_writer():
    from mycelium_ray.stages.media import encode_wav
    wav = encode_wav(np.zeros(12345, dtype=np.int16), 8000)
    m = probe_audio(wav)
    assert (m.fmt, m.sample_rate, m.channels, m.n_units) == \
        ("wav", 8000, 1, 12345)


def test_flac_probe_skeleton_and_real_encoder():
    m = probe_audio(write_flac_streaminfo_skeleton(22050, 2, 44100))
    assert (m.fmt, m.sample_rate, m.channels, m.duration_ms) == \
        ("flac", 22050, 2, 2000)
    # the from-scratch FLAC encoder's STREAMINFO must parse identically
    from mycelium_ray.flac import encode_flac
    x = (np.sin(np.arange(4000) * 0.1) * 1000).astype(np.int16)
    m = probe_audio(encode_flac(x, 8000))
    assert (m.fmt, m.sample_rate, m.channels, m.n_units) == \
        ("flac", 8000, 1, 4000)


def test_ogg_vorbis_probe_and_crc():
    data = write_ogg_vorbis_skeleton(44100, 2, 44100 * 3)
    m = probe_audio(data)
    assert (m.fmt, m.sample_rate, m.channels, m.duration_ms) == \
        ("ogg-vorbis", 44100, 2, 3000)
    # flip one body byte: the page CRC must catch it
    bad = bytearray(data)
    bad[40] ^= 1
    with pytest.raises(AudioMetaError, match="CRC"):
        probe_audio(bytes(bad))


def test_ogg_opus_preskip_subtracted():
    m = probe_audio(write_ogg_opus_skeleton(1, 96000, pre_skip=312))
    assert (m.fmt, m.sample_rate, m.duration_ms, m.n_units) == \
        ("ogg-opus", 48000, 2000, 96000)


def test_ogg_crc_is_not_zlib():
    import zlib
    blob = b"OggS test vector"
    assert ogg_crc(blob) != zlib.crc32(blob)
    assert ogg_crc(b"") == 0


def test_mp3_mpeg1_and_mpeg2_frame_walk():
    m = probe_audio(write_mp3_skeleton(44100, 128, 38))
    assert (m.fmt, m.sample_rate, m.channels, m.n_units) == \
        ("mp3", 44100, 1, 38)
    assert m.duration_ms == 38 * 1152 * 1000 // 44100
    m = probe_audio(write_mp3_skeleton(16000, 32, 50))
    assert (m.sample_rate, m.duration_ms) == (16000, 50 * 576 * 1000 // 16000)


def test_mp3_id3v2_skip():
    id3 = b"ID3\x04\x00\x00\x00\x00\x00\x0a" + b"\x00" * 10
    m = probe_audio(id3 + write_mp3_skeleton(44100, 128, 5))
    assert m.n_units == 5


def test_unknown_container_raises():
    with pytest.raises(AudioMetaError):
        probe_audio(b"not audio at all")
    with pytest.raises(AudioMetaError):
        probe_audio(b"RIFF\x00\x00\x00\x00AVI ")  # video, not audio


def test_audio_probe_stage_rows(ray_session):
    import ray.data as rd

    from mycelium_ray.stages.media import AudioProbe
    rows = {
        "a.wav": write_wav_skeleton(16000, 1, 4000),
        "b.ogg": write_ogg_vorbis_skeleton(44100, 1, 44100),
        "c.mp3": write_mp3_skeleton(44100, 128, 10),
        "d.bad": b"garbage bytes",
    }
    ds = rd.from_arrow(pa.table({
        "audio_id": pa.array(list(rows)),
        "audio": pa.array(list(rows.values()), pa.binary()),
    }))
    out = ds.map_batches(AudioProbe(),
                         batch_format="pyarrow").to_pandas() \
        .set_index("audio_id")
    assert out.loc["a.wav", "fmt"] == "wav"
    assert out.loc["a.wav", "duration_ms"] == 250
    assert out.loc["b.ogg", "fmt"] == "ogg-vorbis"
    assert out.loc["b.ogg", "duration_ms"] == 1000
    assert out.loc["c.mp3", "fmt"] == "mp3"
    assert not out.loc["d.bad", "meta_ok"]
    assert out.loc["d.bad", "sample_rate"] == -1
    assert out["meta_ok"].sum() == 3


def test_audio_metadata_pipeline_vs_params(ray_session):
    from mycelium_ray.pipelines.audio import _meta_params, audio_metadata
    df = audio_metadata("/root/testdata/sf0.001").to_pandas()
    assert df["meta_ok"].all()
    assert set(df["fmt"]) == {"wav", "flac", "ogg-vorbis", "ogg-opus",
                              "mp3"}
    for _, r in df.sample(50, random_state=1).iterrows():
        fmt, sr, n = _meta_params(int(r["doc_id"]))
        assert r["fmt"] == fmt and r["sample_rate"] == sr


def test_mp3_id3v24_footer_flag_skipped():
    """ID3v2.4 footer flag adds 10 bytes of tag after the synchsafe size
    (review finding r4)."""
    body = write_mp3_skeleton(44100, 128, 5)
    tag = bytearray(b"ID3\x04\x00\x10\x00\x00\x00\x0a")
    tag += b"\x00" * 10          # extended body (size=10)
    tag += b"3DI\x04\x00\x10\x00\x00\x00\x0a"  # the 10-byte footer
    m = probe_audio(bytes(tag) + body)
    assert m.n_units == 5


def test_truncated_wav_raises_audiometaerror_not_struct_error():
    import struct
    blob = (b"RIFF" + struct.pack("<I", 30) + b"WAVEfmt "
            + struct.pack("<I", 16) + b"\x01\x00\x01\x00")
    with pytest.raises(AudioMetaError):
        probe_audio(blob)
