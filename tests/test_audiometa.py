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
                              "mp3", "ogg-flac"}
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


# --------------------------------------------------------------------------
# Ogg FLAC (the FLAC-to-Ogg mapping): REAL decode path
# --------------------------------------------------------------------------
def test_ogg_flac_bit_exact_roundtrip():
    import numpy as np

    from mycelium_ray.audiometa import (decode_ogg_flac, encode_ogg_flac,
                                        probe_audio)
    sr = 8000
    t = np.arange(sr // 2)
    x = (0.4 * 32767 * np.sin(2 * np.pi * 300 * t / sr)).astype(np.int16)
    ogg = encode_ogg_flac(x, sr, blocksize=1024)
    sr2, ch, y = decode_ogg_flac(ogg)
    assert (sr2, ch) == (sr, 1)
    assert np.array_equal(y[:, 0], x)
    m = probe_audio(ogg)
    assert m.fmt == "ogg-flac" and m.sample_rate == sr
    assert m.n_units == len(x)
    assert m.duration_ms == len(x) * 1000 // sr


def test_ogg_flac_vorbis_and_opus_stay_stubbed():
    import pytest

    from mycelium_ray.audiometa import (decode_ogg_flac,
                                        write_ogg_opus_skeleton,
                                        write_ogg_vorbis_skeleton)
    with pytest.raises(NotImplementedError, match="vorbis"):
        decode_ogg_flac(write_ogg_vorbis_skeleton(44100, 1, 1000))
    with pytest.raises(NotImplementedError, match="opus"):
        decode_ogg_flac(write_ogg_opus_skeleton(1, 48000))


def test_ogg_flac_corrupt_page_crc_detected():
    import numpy as np
    import pytest

    from mycelium_ray.audiometa import (AudioMetaError, decode_ogg_flac,
                                        encode_ogg_flac)
    x = (np.arange(2000) % 100).astype(np.int16)
    ogg = bytearray(encode_ogg_flac(x, 8000))
    ogg[-1] ^= 0xFF  # flip a body byte in the last page
    with pytest.raises(AudioMetaError, match="CRC"):
        decode_ogg_flac(bytes(ogg))


def test_audio_features_stage_decodes_ogg_flac(ray_session):
    import numpy as np
    import pyarrow as pa

    from mycelium_ray.audiometa import encode_ogg_flac
    from mycelium_ray.stages.media import AudioFeatures
    sr = 8000
    t = np.arange(sr)
    x = (0.5 * 32767 * np.sin(2 * np.pi * 440 * t / sr)).astype(np.int16)
    out = AudioFeatures()(pa.table({
        "audio_id": pa.array(["a.oga", "b.ogg-vorbis"]),
        "audio": pa.array([encode_ogg_flac(x, sr),
                           b"OggS" + b"\x00" * 30], pa.binary()),
    })).to_pandas().set_index("audio_id")
    a = out.loc["a.oga"]
    assert a["audio_ok"] and a["duration_ms"] == 1000
    assert a["sample_rate"] == sr
    assert abs(a["rms"] - 0.5 / np.sqrt(2)) < 0.01
    assert not out.loc["b.ogg-vorbis"]["audio_ok"]
