"""From-scratch Ogg Vorbis codec (mycelium_ray/vorbis.py): TDAC
identity, PSNR round-trips, spec codeword assignment (the Vorbis I
worked example), header/packet error typing, probe + AudioFeatures
integration."""

import numpy as np
import pytest

from mycelium_ray.vorbis import (BitReader, BitWriter, VorbisError,
                                 assign_codewords, decode_vorbis,
                                 encode_vorbis, float32_pack,
                                 float32_unpack, ilog, imdct,
                                 mdct_forward, vorbis_window)


def _sig(n, sr, f=440.0, amp=0.7):
    t = np.arange(n) / sr
    return amp * np.sin(2 * np.pi * f * t) \
        + 0.2 * amp * np.sin(2 * np.pi * 3.3 * f * t)


def _psnr(ref, dec):
    noise = dec[:len(ref)] - ref[:len(dec)]
    return 10 * np.log10(np.max(ref ** 2) / np.mean(noise ** 2))


# ---- primitives -----------------------------------------------------------
def test_bitpacking_lsb_first_roundtrip():
    bw = BitWriter()
    vals = [(5, 3), (1, 1), (0x2AD, 10), (0, 2), (0xFFFFFFFF, 32), (9, 5)]
    for v, b in vals:
        bw.write(v, b)
    br = BitReader(bw.bytes())
    for v, b in vals:
        assert br.read(b) == v & ((1 << b) - 1)


def test_ilog():
    assert [ilog(x) for x in (0, 1, 2, 3, 4, 7)] == [0, 1, 2, 2, 3, 3]


def test_float32_pack_unpack():
    for v in (1.0, -1.0, 0.0, 2.0 / 254, -(2.0 / 254) * 128, 0.25, 1000.0):
        got = float32_unpack(float32_pack(v))
        assert got == pytest.approx(v, rel=1e-6), v


def test_float32_pack_mantissa_boundary():
    """Values just below a power of two round UP to 2^21 in mantissa
    space; pack must renormalize, not wrap the field to 0."""
    for k in (-3, 0, 5):
        v = (2.0 ** 21 - 0.4) / 2.0 ** 21 * 2.0 ** k
        got = float32_unpack(float32_pack(v))
        assert got == pytest.approx(v, rel=1e-6)
        assert got != 0.0


def test_codeword_assignment_spec_example():
    """The Vorbis I specification's §3.2.1 worked example: entry lengths
    [2,4,4,4,4,2,3,3] must yield codewords 00, 0100, 0101, 0110, 0111,
    10, 110, 111 under the lowest-available-codeword rule."""
    codes = assign_codewords([2, 4, 4, 4, 4, 2, 3, 3])
    assert codes == [0b00, 0b0100, 0b0101, 0b0110, 0b0111,
                     0b10, 0b110, 0b111]


def test_codeword_assignment_overspecified():
    with pytest.raises(VorbisError):
        assign_codewords([1, 1, 1])


def test_tdac_identity():
    rng = np.random.default_rng(0)
    n, h = 512, 256
    x = rng.standard_normal(h * 8)
    xp = np.concatenate([np.zeros(h), x, np.zeros(h)])
    win = vorbis_window(n)
    out = np.zeros(len(xp))
    for j in range((len(xp) - n) // h + 1):
        out[j * h:j * h + n] += imdct(
            mdct_forward(xp[j * h:j * h + n] * win)) * win
    assert np.abs(out[h:-h] - x).max() < 1e-10


# ---- round trips ----------------------------------------------------------
def test_roundtrip_mono_psnr():
    sr = 16000
    sig = _sig(sr, sr)
    rate, ch, dec = decode_vorbis(encode_vorbis(sig, sr))
    assert (rate, ch) == (sr, 1)
    assert len(dec) == len(sig)          # granule-exact length
    assert _psnr(sig, dec[:, 0]) >= 55.0   # two-pass cascade headroom


def test_roundtrip_stereo_psnr():
    sr = 22050
    a = _sig(10000, sr)
    st = np.stack([a, 0.5 * np.roll(a, 97)], axis=1)
    rate, ch, dec = decode_vorbis(encode_vorbis(st, sr))
    assert (rate, ch) == (sr, 2)
    assert dec.shape == st.shape
    assert _psnr(st, dec) >= 55.0


def test_roundtrip_int16_and_silence():
    sr = 8000
    x = np.zeros(5000)
    x[1000:4000] = _sig(3000, sr, amp=0.5)
    xi = np.rint(x * 32767).astype(np.int16)
    rate, ch, dec = decode_vorbis(encode_vorbis(xi, sr))
    assert len(dec) == len(x)
    # leading silence stays essentially silent (class-0 partitions are
    # exact zeros; only window leakage from the neighbouring block)
    assert np.abs(dec[:512, 0]).max() < 2e-3
    assert _psnr(x, dec[:, 0]) >= 40.0


def test_roundtrip_short_clip():
    sr = 8000
    sig = _sig(100, sr)   # shorter than one block
    rate, ch, dec = decode_vorbis(encode_vorbis(sig, sr))
    assert len(dec) == 100


# ---- error typing ---------------------------------------------------------
def test_errors_are_typed():
    sr = 8000
    ogg = encode_vorbis(_sig(2000, sr), sr)
    with pytest.raises(VorbisError):
        decode_vorbis(b"not ogg at all")
    with pytest.raises(VorbisError):
        decode_vorbis(ogg[:40])              # truncated mid-page
    bad = bytearray(ogg)
    bad[100] ^= 0xFF                         # CRC breaks → typed
    with pytest.raises(VorbisError):
        decode_vorbis(bytes(bad))


def test_fuzz_decode_typed_only():
    import random
    sr = 8000
    base = encode_vorbis(_sig(1500, sr), sr)
    rng = random.Random(99)
    for _ in range(300):
        b = bytearray(base)
        for _ in range(rng.randint(1, 4)):
            op = rng.random()
            if op < 0.6:
                b[rng.randrange(len(b))] = rng.randrange(256)
            elif op < 0.85 and len(b) > 10:
                lo = rng.randrange(len(b) - 2)
                del b[lo:lo + rng.randrange(1, 9)]
            else:
                b[rng.randrange(len(b)):][:0] = bytes([rng.randrange(256)])
        try:
            decode_vorbis(bytes(b))
        except VorbisError:
            pass
        # anything else propagates and fails the test


# ---- integration ----------------------------------------------------------
def test_probe_and_audiofeatures_integration():
    from mycelium_ray.audiometa import probe_audio
    from mycelium_ray.stages.media import AudioFeatures
    sr, n = 8000, 6000
    ogg = encode_vorbis(_sig(n, sr, amp=0.5), sr)
    m = probe_audio(ogg)
    assert (m.fmt, m.sample_rate, m.n_units) == ("ogg-vorbis", sr, n)
    rate, x = AudioFeatures._decode(ogg)
    assert rate == sr and len(x) == n and x.dtype == np.int16
    assert np.abs(x.astype(np.float64)).max() > 10000  # real samples


def test_synth_audio_row_vorbis_kind_decodes():
    from mycelium_ray.pipelines.audio import SR, synth_audio_row
    from mycelium_ray.stages.media import AudioFeatures
    doc_id = 7   # doc_id % 8 == 7 → ogg-vorbis
    blob = synth_audio_row(doc_id)
    assert blob[:4] == b"OggS"
    rate, x = AudioFeatures._decode(blob)
    assert rate == SR
    k = (doc_id * 2654435761) % (1 << 32)
    assert len(x) == SR // 2 + k % (SR // 2)


def test_fuzz_decode_typed_only_crc_fixed():
    """Stronger fuzz: recompute page CRCs after mutation so corrupt
    bytes actually REACH the header/codebook/floor/residue parsers
    instead of dying at the Ogg CRC gate — still typed errors only."""
    import random
    import struct

    from mycelium_ray.audiometa import ogg_crc

    def refix_crc(data: bytes) -> bytes:
        out = bytearray(data)
        pos = 0
        while pos + 27 <= len(out):
            if out[pos:pos + 4] != b"OggS":
                break
            nsegs = out[pos + 26]
            body = sum(out[pos + 27:pos + 27 + nsegs])
            end = pos + 27 + nsegs + body
            if end > len(out):
                break
            page = bytearray(out[pos:end])
            page[22:26] = b"\0\0\0\0"
            out[pos + 22:pos + 26] = struct.pack(
                "<I", ogg_crc(bytes(page)))
            pos = end
        return bytes(out)

    sr = 8000
    base = encode_vorbis(_sig(1500, sr), sr)
    rng = random.Random(7)
    for _ in range(300):
        b = bytearray(base)
        for _ in range(rng.randint(1, 3)):
            b[rng.randrange(28, len(b))] = rng.randrange(256)
        try:
            decode_vorbis(refix_crc(bytes(b)))
        except VorbisError:
            pass
        # anything else propagates and fails the test
