"""Property tests (hypothesis) for the r4 container codecs: AVI, Y4M,
and the audio metadata writers/parsers — the writer→parser pair must be
an identity on the metadata for ANY valid parameters, not just the
fixtures the unit tests picked."""
import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from mycelium_ray.audiometa import (probe_audio, write_flac_streaminfo_skeleton,
                                    write_mp3_skeleton,
                                    write_ogg_opus_skeleton,
                                    write_ogg_vorbis_skeleton,
                                    write_wav_skeleton)
from mycelium_ray.video import AviClip, Y4mClip, encode_y4m, mux_avi_mjpeg

_SET = settings(max_examples=25, deadline=None)


@st.composite
def _frames(draw, even=False):
    w = draw(st.integers(8, 40))
    h = draw(st.integers(8, 40))
    if even:
        w, h = w - w % 2, h - h % 2
        w, h = max(w, 8), max(h, 8)
    n = draw(st.integers(1, 6))
    rng = np.random.default_rng(draw(st.integers(0, 2**32 - 1)))
    return [rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
            for _ in range(n)], w, h


@_SET
@given(_frames())
def test_avi_roundtrip_any_payload(fwh):
    # frames here are arbitrary BYTES payloads (mux/demux never inspects
    # them) — the container must return them bit-exact in order
    frames, w, h = fwh
    blobs = [f.tobytes() for f in frames]
    clip = AviClip(mux_avi_mjpeg(blobs, w, h))
    assert clip.n_frames == len(blobs)
    assert (clip.width, clip.height) == (w, h)
    assert all(clip.frame_encoded(i) == b for i, b in enumerate(blobs))


@_SET
@given(_frames(even=True), st.sampled_from(["C444", "C420jpeg"]))
def test_y4m_roundtrip_any_frames(fwh, cs):
    frames, w, h = fwh
    clip = Y4mClip(encode_y4m(frames, colorspace=cs))
    assert clip.n_frames == len(frames)
    assert (clip.width, clip.height) == (w, h)
    for i in (0, len(frames) - 1):
        px = clip.frame_rgb(i)
        assert px.shape == (h, w, 3)
        # lossy (limited range + optional 420), but bounded: random noise
        # is the chroma-subsampling worst case, so only C444 gets a
        # tight bound; C420 must still be within the 8-bit ballpark
        err = np.abs(px.astype(int) - frames[i].astype(int)).mean()
        assert err < (6 if cs == "C444" else 80)


@_SET
@given(st.sampled_from([8000, 16000, 44100]), st.integers(1, 2),
       st.integers(1, 10**6))
def test_wav_flac_skeleton_probe_identity(sr, ch, n):
    m = probe_audio(write_wav_skeleton(sr, ch, n))
    assert (m.fmt, m.sample_rate, m.channels, m.n_units) == \
        ("wav", sr, ch, n)
    assert m.duration_ms == n * 1000 // sr
    m = probe_audio(write_flac_streaminfo_skeleton(sr, ch, n))
    assert (m.fmt, m.sample_rate, m.channels, m.n_units) == \
        ("flac", sr, ch, n)


@_SET
@given(st.sampled_from([8000, 44100, 48000]), st.integers(1, 2),
       st.integers(0, 10**7))
def test_ogg_skeleton_probe_identity(sr, ch, n):
    m = probe_audio(write_ogg_vorbis_skeleton(sr, ch, n))
    assert (m.fmt, m.sample_rate, m.channels, m.n_units) == \
        ("ogg-vorbis", sr, ch, n)
    m = probe_audio(write_ogg_opus_skeleton(ch, n))
    assert (m.fmt, m.sample_rate, m.n_units) == ("ogg-opus", 48000, n)


@_SET
@given(st.sampled_from([(44100, 128), (48000, 192), (32000, 64),
                        (22050, 48), (16000, 32)]),
       st.integers(1, 200))
def test_mp3_skeleton_probe_identity(srbr, nf):
    sr, br = srbr
    m = probe_audio(write_mp3_skeleton(sr, br, nf))
    assert (m.fmt, m.sample_rate, m.n_units) == ("mp3", sr, nf)
    spf = 1152 if sr >= 32000 else 576
    assert m.duration_ms == nf * spf * 1000 // sr


@_SET
@given(st.data())
def test_ogg_any_corruption_detected_or_changes_meta(data):
    """Flipping one byte of an Ogg stream must never SILENTLY yield the
    same metadata with a valid parse: either the CRC/framing rejects it,
    or the parse result differs (header fields feed the CRC too)."""
    blob = bytearray(write_ogg_vorbis_skeleton(44100, 1, 12345))
    i = data.draw(st.integers(0, len(blob) - 1))
    bit = 1 << data.draw(st.integers(0, 7))
    blob[i] ^= bit
    try:
        m = probe_audio(bytes(blob))
    except Exception:
        return  # rejected: good
    base = probe_audio(write_ogg_vorbis_skeleton(44100, 1, 12345))
    assert m != base


@st.composite
def _gif_frames(draw):
    w = draw(st.integers(1, 40))
    h = draw(st.integers(1, 40))
    n = draw(st.integers(1, 5))
    n_colors = draw(st.integers(1, 256))
    rng = np.random.default_rng(draw(st.integers(0, 2**32 - 1)))
    pal = rng.integers(0, 256, (n_colors, 3), dtype=np.uint8)
    return [pal[rng.integers(0, n_colors, (h, w))] for _ in range(n)]


@_SET
@given(_gif_frames())
def test_gif_roundtrip_any_palette(frames):
    """encode_gif → decode_gif_frames is an identity for ANY frame list
    sharing ≤256 colors (palette size 1..256, dims 1..40, 1..5 frames —
    covers every LZW min-code-size 2..8 and the width-growth ladder)."""
    from mycelium_ray.gif import decode_gif_frames, encode_gif, probe_gif_meta
    data = encode_gif(frames)
    dec = decode_gif_frames(data)
    assert len(dec) == len(frames)
    for a, b in zip(dec, frames):
        assert np.array_equal(a, b)
    m = probe_gif_meta(data)
    assert (m["width"], m["height"]) == (frames[0].shape[1],
                                         frames[0].shape[0])
    assert m["n_frames"] == len(frames)
