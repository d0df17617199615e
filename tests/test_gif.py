"""GIF codec (mycelium_ray/gif.py): LZW round trips, animation,
compositing subset, header-only probe, and the video-container bridge."""

import numpy as np
import pytest

from mycelium_ray.gif import (GifClip, GifError, _lzw_decode, _lzw_encode,
                              build_palette, decode_gif, decode_gif_frames,
                              encode_gif, posterize_216, probe_gif_meta)
from mycelium_ray.imaging import (decode_image, decode_png, encode_image,
                                  probe_image_meta)

RNG = np.random.default_rng(7)


def _pal_image(n_colors: int, h: int, w: int, seed: int = 0) -> np.ndarray:
    rng = np.random.default_rng(seed)
    pal = rng.integers(0, 256, (n_colors, 3), dtype=np.uint8)
    return pal[rng.integers(0, n_colors, (h, w))]


# --------------------------------------------------------------------- LZW
@pytest.mark.parametrize("mcs,nsym,n", [
    (2, 2, 1), (2, 3, 10), (2, 4, 400), (4, 16, 5000),
    (8, 256, 20000), (2, 2, 100000),       # 100k forces a table reset
])
def test_lzw_roundtrip(mcs, nsym, n):
    seq = RNG.integers(0, nsym, n).astype(np.uint8)
    assert np.array_equal(_lzw_decode(_lzw_encode(seq, mcs), mcs, n), seq)


def test_lzw_truncation_raises():
    seq = RNG.integers(0, 4, 500).astype(np.uint8)
    enc = _lzw_encode(seq, 2)
    with pytest.raises(GifError):
        _lzw_decode(enc[: len(enc) // 2], 2, 500)


# ------------------------------------------------------------------- codec
@pytest.mark.parametrize("n_colors", [2, 5, 16, 100, 256])
def test_single_frame_exact_roundtrip(n_colors):
    px = _pal_image(n_colors, 37, 53, seed=n_colors)
    out = decode_gif(encode_gif(px))
    assert np.array_equal(out, px)


def test_flat_and_1x1():
    one = np.array([[[7, 8, 9]]], dtype=np.uint8)
    assert np.array_equal(decode_gif(encode_gif(one)), one)
    flat = np.full((20, 30, 3), 77, np.uint8)
    assert np.array_equal(decode_gif(encode_gif(flat)), flat)


def test_truecolor_rejected_posterize_accepted():
    big = RNG.integers(0, 256, (48, 48, 3), dtype=np.uint8)
    with pytest.raises(GifError, match="quantize"):
        encode_gif(big)
    post = posterize_216(big)
    assert np.array_equal(decode_gif(encode_gif(post)), post)
    # posterize is idempotent and ≤216 colors
    assert np.array_equal(posterize_216(post), post)
    assert len(build_palette([post])[0]) <= 216


def test_animation_roundtrip_and_probe():
    pal = RNG.integers(0, 256, (16, 3), dtype=np.uint8)
    frames = [pal[RNG.integers(0, 16, (24, 32))] for _ in range(5)]
    data = encode_gif(frames, delays_cs=[5, 10, 15, 20, 25], loop=3)
    dec = decode_gif_frames(data)
    assert len(dec) == 5
    for a, b in zip(dec, frames):
        assert np.array_equal(a, b)
    m = probe_gif_meta(data)
    assert m == {"format": "gif", "width": 32, "height": 24,
                 "n_frames": 5, "animated": True,
                 "duration_ms": 750, "loop_count": 3}
    # probe walks headers only: corrupting LZW payload bytes must not
    # change the probe result (it never touches them)
    corrupt = bytearray(data)
    corrupt[-20] ^= 0xFF
    assert probe_gif_meta(bytes(corrupt)) == m


def test_probe_static_gif():
    px = _pal_image(8, 10, 12)
    m = probe_gif_meta(encode_gif(px))
    assert (m["n_frames"], m["animated"], m["duration_ms"],
            m["loop_count"]) == (1, False, -1, -1)


# -------------------------------------------- decode-side spec features
def test_interlaced_decode():
    """Hand-build an interlaced stream: rows stored in pass order."""
    px = _pal_image(4, 16, 8, seed=3)
    plain = bytearray(encode_gif(px))
    # image descriptor starts right after header+LSD+palette(4→table 4)
    # locate 0x2C and set the interlace flag, re-encoding rows in the
    # 4-pass order
    pal, (idx,) = build_palette([px])
    order = np.concatenate([np.arange(s, 16, st)
                            for s, st in ((0, 8), (4, 8), (2, 4), (1, 2))])
    inter = idx[order]
    from mycelium_ray.gif import _sub_blocks
    pos = plain.index(0x2C, 13)
    packed = plain[pos + 9] | 0x40
    body = plain[: pos + 9] + bytes([packed]) + bytes([plain[pos + 10]])
    body += _sub_blocks(_lzw_encode(inter.ravel(), plain[pos + 10]))
    body += b"\x3b"
    assert np.array_equal(decode_gif(bytes(body)), px)


def test_partial_frame_transparency_disposal():
    """Frame 2 paints a sub-rect with a transparent index over frame 1;
    frame 3 follows a disposal-2 (restore bg) frame."""
    import struct

    from mycelium_ray.gif import _sub_blocks
    # global palette: 4 colors; bg index 0
    pal = bytes([10, 10, 10, 200, 0, 0, 0, 200, 0, 0, 0, 200])
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", 8, 8, 0x80 | 0x01, 0, 0)  # 4-entry table
    out += pal
    full = np.full(64, 1, np.uint8)                        # frame 1: red
    out += b"\x2c" + struct.pack("<HHHH", 0, 0, 8, 8) + b"\x00\x02"
    out += _sub_blocks(_lzw_encode(full, 2))
    # frame 2: 4x4 rect at (2,2), color 2 with index 3 transparent,
    # disposal 2 (restore to background after)
    rect = np.array([2, 3] * 8, np.uint8)                  # checker 2/trans
    out += b"\x21\xf9\x04" + bytes([(2 << 2) | 1]) + b"\x05\x00\x03\x00"
    out += b"\x2c" + struct.pack("<HHHH", 2, 2, 4, 4) + b"\x00\x02"
    out += _sub_blocks(_lzw_encode(rect, 2))
    # frame 3: full green
    out += b"\x2c" + struct.pack("<HHHH", 0, 0, 8, 8) + b"\x00\x02"
    out += _sub_blocks(_lzw_encode(np.full(64, 2, np.uint8), 2))
    out += b"\x3b"
    f = decode_gif_frames(bytes(out))
    assert len(f) == 3
    red, green, bg = (200, 0, 0), (0, 200, 0), (10, 10, 10)
    assert tuple(f[0][0, 0]) == red
    # frame 2: transparent pixels keep red, painted ones are green(idx 2)
    assert tuple(f[1][2, 2]) == green and tuple(f[1][2, 3]) == red
    # frame 3 painted over a canvas whose rect was restored to bg first —
    # but frame 3 covers everything, so it's all green
    assert (f[2] == np.array(green)).all()


def test_disposal_3_raises():
    import struct

    from mycelium_ray.gif import _sub_blocks
    out = bytearray(b"GIF89a") + struct.pack("<HHBBB", 4, 4, 0x80, 0, 0)
    out += bytes([0, 0, 0, 255, 255, 255] * 1)  # 2-entry table
    out += b"\x21\xf9\x04" + bytes([(3 << 2)]) + b"\x05\x00\x00\x00"
    out += b"\x2c" + struct.pack("<HHHH", 0, 0, 4, 4) + b"\x00\x02"
    out += _sub_blocks(_lzw_encode(np.zeros(16, np.uint8), 2)) + b"\x3b"
    with pytest.raises(GifError, match="disposal 3"):
        decode_gif_frames(bytes(out))


def test_garbage_raises():
    for junk in (b"", b"GIF89a", b"GIF89a" + b"\x00" * 7,
                 b"NOTAGIF" + b"\x00" * 20):
        with pytest.raises(GifError):
            decode_gif(junk)


# -------------------------------------------------- imaging integration
def test_imaging_dispatch_and_meta():
    px = _pal_image(16, 21, 34)
    data = encode_image(px, "gif")
    out, fmt = decode_image(data)
    assert fmt == "gif" and np.array_equal(out, px)
    assert probe_image_meta(data) == ("gif", 34, 21)


def test_sniff_format_gif():
    from mycelium_ray.http_headers import sniff_format
    assert sniff_format(encode_gif(_pal_image(4, 8, 8))) == "gif"
    assert sniff_format(b"GIF87a" + b"\x00" * 10) == "gif"


# ----------------------------------------------------- video-side bridge
def test_open_video_gif_clip():
    from mycelium_ray.video import open_video, probe_video
    pal = RNG.integers(0, 256, (8, 3), dtype=np.uint8)
    frames = [pal[RNG.integers(0, 8, (16, 16))] for _ in range(4)]
    data = encode_gif(frames)
    assert probe_video(data) == "gif"
    clip = open_video(data)
    assert isinstance(clip, GifClip)
    assert clip.n_frames == 4 and (clip.width, clip.height) == (16, 16)
    fb, px = clip.frame_pair(2)
    assert np.array_equal(px, frames[2])
    assert np.array_equal(decode_png(fb), frames[2])


def test_sample_frames_over_gif():
    import pyarrow as pa

    from mycelium_ray.stages.media import SampleFrames
    pal = RNG.integers(0, 256, (8, 3), dtype=np.uint8)
    frames = [pal[RNG.integers(0, 8, (16, 24))] for _ in range(6)]
    batch = pa.table({
        "video_id": pa.array(["gif:0", "bad:1"], pa.string()),
        "video": pa.array([encode_gif(frames), b"garbage"], pa.binary()),
    })
    out = SampleFrames(n_samples=4)(batch)
    ok = out.filter(pa.compute.field("sample_ok"))
    assert ok.num_rows == 4
    assert ok["frame_idx"].to_pylist() == [0, 1, 3, 4]
    assert set(ok["w"].to_pylist()) == {24}
    bad = out.filter(pa.compute.invert(out["sample_ok"].combine_chunks()))
    assert bad.num_rows == 1


def test_median_cut_palette_and_quantize():
    from mycelium_ray.gif import (median_cut_palette, posterize_216,
                                  quantize_to_palette)
    px = RNG.integers(0, 256, (40, 40, 3), dtype=np.uint8)
    pal = median_cut_palette(px, 216)
    assert pal.shape[1] == 3 and 1 <= len(pal) <= 216
    q = quantize_to_palette(px, pal)
    assert len(np.unique(q.reshape(-1, 3), axis=0)) <= 216
    # adaptive beats the fixed 6x6x6 cube at the same budget
    mse = ((q.astype(float) - px) ** 2).mean()
    mse_ps = ((posterize_216(px).astype(float) - px) ** 2).mean()
    assert mse <= mse_ps
    # identity when the image already fits the budget
    small = _pal_image(32, 20, 20, seed=4)
    pal2 = median_cut_palette(small, 216)
    assert np.array_equal(quantize_to_palette(small, pal2), small)
    # structured content collapses to near-zero error
    grad = np.repeat(np.linspace(0, 255, 40).astype(np.uint8)[None, :, None],
                     40, 0)
    grad = np.concatenate([grad, grad // 2, grad // 3], axis=2)
    qg = quantize_to_palette(grad, median_cut_palette(grad, 64))
    assert ((qg.astype(float) - grad) ** 2).mean() < 5
