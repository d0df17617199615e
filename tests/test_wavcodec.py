"""wavcodec.py conformance: G.711 closed-form identities, every WAV
sample-format round trip, container-walk robustness, and the
AudioFeatures integration across all six derived codec kinds."""
import numpy as np
import pytest

from mycelium_ray.wavcodec import (ENCODINGS, alaw_decode, alaw_encode,
                                   decode_wav_any, encode_wav_any,
                                   ulaw_decode, ulaw_encode)


def test_g711_all_codes_round_trip():
    codes = np.arange(256, dtype=np.uint8)
    # A-law: exact identity over the full code space
    assert np.array_equal(alaw_encode(alaw_decode(codes)), codes)
    # µ-law: identity except the canonical negative-zero code 0x7F
    # (decodes to 0, which re-encodes as +0 = 0xFF)
    rt = ulaw_encode(ulaw_decode(codes))
    bad = codes[rt != codes]
    assert bad.tolist() == [0x7F]
    assert ulaw_decode(np.array([0x7F], np.uint8))[0] == 0
    assert ulaw_decode(np.array([0xFF], np.uint8))[0] == 0


def test_g711_decode_tables_shape():
    codes = np.arange(256, dtype=np.uint8)
    u, a = ulaw_decode(codes), alaw_decode(codes)
    # known table extremes
    assert u.max() == 32124 and u.min() == -32124
    assert a.max() == 32256 and a.min() == -32256
    # odd symmetry between the sign halves (up to the -0 special case)
    assert np.array_equal(u[:127], -u[128:255])
    # monotone within the negative half: -32124 rises to -0
    assert np.all(np.diff(u[:128]) > 0)
    assert np.all(np.diff(np.sort(a)) >= 0)


SINE = np.rint(np.sin(np.arange(5000) / 17.0) * 21000).astype(np.int16)


@pytest.mark.parametrize("enc", ENCODINGS)
def test_wav_round_trip_every_encoding(enc):
    sr, ch, y = decode_wav_any(encode_wav_any(SINE, 12345, enc))
    assert (sr, ch) == (12345, 1)
    y = y[:, 0]
    assert len(y) == len(SINE)
    if enc in ("pcm16", "pcm16x", "pcm24", "pcm32", "float32", "float64"):
        np.testing.assert_array_equal(y, SINE)   # lossless for int16 input
    elif enc == "pcm8":
        assert np.abs(y.astype(int) - SINE.astype(int)).max() <= 255
    else:  # G.711 companding: relative error bounded by segment size
        err = np.abs(y.astype(int) - SINE.astype(int))
        assert err.max() <= 1024
        assert err.mean() < 200


def test_wav_chunk_walk_robustness():
    import struct
    base = encode_wav_any(SINE[:100], 8000, "pcm16")
    # insert a LIST chunk (odd length → pad byte) before fmt
    junk = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"
    reordered = base[:12] + junk + base[12:]
    total = len(reordered) - 8
    reordered = reordered[:4] + struct.pack("<I", total) + reordered[8:]
    sr, ch, y = decode_wav_any(reordered)
    np.testing.assert_array_equal(y[:, 0], SINE[:100])
    with pytest.raises(ValueError):
        decode_wav_any(b"RIFF\x00\x00\x00\x00AVI fake")
    with pytest.raises(ValueError):  # fmt present, data missing
        decode_wav_any(base[: base.index(b"data")])


def test_stereo_decode_and_downmix_shape():
    import struct
    # interleave two channels by hand (encoder is mono by design)
    x = SINE[:200]
    inter = np.empty(400, dtype=np.int16)
    inter[0::2] = x
    inter[1::2] = -x
    mono = encode_wav_any(inter, 8000, "pcm16")
    # patch channels=2 in fmt (offset: RIFF(12) + 'fmt '+len(8) + tag(2))
    fmt_off = 12 + 8
    patched = bytearray(mono)
    patched[fmt_off + 2:fmt_off + 4] = struct.pack("<H", 2)
    sr, ch, y = decode_wav_any(bytes(patched))
    assert ch == 2 and y.shape == (200, 2)
    np.testing.assert_array_equal(y[:, 0], x)
    np.testing.assert_array_equal(y[:, 1], -x)


def test_audio_features_decodes_all_seven_kinds(ray_session):
    import pyarrow.parquet as pq

    from mycelium_ray.pipelines.audio import (SR, _KNUTH,
                                              audio_features_pipeline)

    got = audio_features_pipeline("/root/testdata/sf0.001").to_pandas()
    assert got["audio_ok"].all()
    assert (got["sample_rate"] == SR).all()
    # every codec kind present and duration exact per the derivation
    kinds = got["doc_id"] % 7
    assert set(kinds.unique()) == set(range(7))
    k = (got["doc_id"].to_numpy().astype(np.uint64) * _KNUTH) % (1 << 32)
    n_samples = SR // 2 + k % (SR // 2)
    np.testing.assert_array_equal(
        got["duration_ms"].to_numpy(), n_samples * 1000 // SR)


def test_adpcm_properties():
    from mycelium_ray.wavcodec import (ADPCM_SPB, adpcm_decode,
                                       adpcm_encode)
    x = np.rint(np.sin(np.arange(7000) / 13.0) * 18000).astype(np.int16)
    blob, n = adpcm_encode(x)
    y = adpcm_decode(blob, n)
    assert len(y) == len(x)
    err = np.abs(y.astype(int) - x.astype(int))
    snr = 10 * np.log10((x.astype(float) ** 2).mean()
                        / (err.astype(float) ** 2).mean())
    assert snr > 35
    # block independence (the seek/resume property): decoding any block
    # slice alone equals that slice of the full decode
    from mycelium_ray.wavcodec import _ADPCM_BLOCK_ALIGN
    b2 = blob[_ADPCM_BLOCK_ALIGN:2 * _ADPCM_BLOCK_ALIGN]
    solo = adpcm_decode(b2)
    np.testing.assert_array_equal(solo, adpcm_decode(blob)[ADPCM_SPB:
                                                           2 * ADPCM_SPB])
    # fact-chunk truncation: non-multiple lengths round-trip exactly
    xs = x[:ADPCM_SPB + 17]
    blob2, n2 = adpcm_encode(xs)
    assert n2 == len(xs) and len(adpcm_decode(blob2, n2)) == len(xs)


# ---------------------------------------------------------------------------
# hypothesis properties (same style as test_kernels_property.py)
# ---------------------------------------------------------------------------
from hypothesis import given, settings
from hypothesis import strategies as st

_int16s = st.lists(st.integers(-32768, 32767), min_size=1, max_size=3000)


@settings(max_examples=50, deadline=None)
@given(_int16s)
def test_prop_g711_error_bounds(xs):
    x = np.asarray(xs, dtype=np.int16)
    for enc, dec, bound in ((ulaw_encode, ulaw_decode, 1024),
                            (alaw_encode, alaw_decode, 1024)):
        y = dec(enc(x))
        err = np.abs(y.astype(np.int32) - x.astype(np.int32))
        # error ≤ half the widest segment step, everywhere, any input
        assert err.max() <= bound
        # companding is idempotent: re-encoding the decode is a fixpoint
        assert np.array_equal(dec(enc(y)), y)


@settings(max_examples=50, deadline=None)
@given(_int16s, st.sampled_from(["pcm16", "pcm24", "pcm32", "float32",
                                 "float64", "pcm16x"]))
def test_prop_lossless_wav_round_trip(xs, enc):
    x = np.asarray(xs, dtype=np.int16)
    sr, ch, y = decode_wav_any(encode_wav_any(x, 8000, enc))
    np.testing.assert_array_equal(y[:, 0], x)


@settings(max_examples=30, deadline=None)
@given(_int16s)
def test_prop_adpcm_bounded_and_length_exact(xs):
    from mycelium_ray.wavcodec import adpcm_decode, adpcm_encode
    x = np.asarray(xs, dtype=np.int16)
    blob, n = adpcm_encode(x)
    y = adpcm_decode(blob, n)
    assert len(y) == len(x)
    # worst-case per-sample slew is bounded by the largest step's
    # reconstruction (step + step/2 + step/4 + step/8 < 2*32767·…);
    # outputs are always valid int16 and the first block sample is exact
    assert y.dtype == np.int16
    assert y[0] == x[0]
