"""From-scratch RIFF/WAVE codec layer — every sample format a crawl
corpus actually contains, not just 16-bit PCM.

Formats (WAVE format tags, Microsoft WAVE spec / RFC 2361 registry):

- ``1``  PCM integer: 8-bit unsigned, 16/24/32-bit little-endian signed
- ``3``  IEEE float: float32 / float64 in [-1, 1]
- ``6``  ITU-T G.711 A-law  (closed-form segment companding)
- ``7``  ITU-T G.711 µ-law  (closed-form, bias 0x84, clip 32635)
- ``0xFFFE`` WAVE_FORMAT_EXTENSIBLE wrapping any of the above (SubFormat
  GUID's first 2 bytes are the real tag)

The G.711 pair is implemented from the ITU closed forms (segment +
mantissa encoding); conformance is pinned by the all-256-codes
``encode(decode(c)) == c`` round-trip identity plus monotonicity in
tests/test_wavcodec.py. Everything is vectorized numpy — no per-sample
Python in the decode path.

The stdlib ``wave`` module (used by the original 16-bit-only path)
rejects anything but integer PCM; this module replaces it behind
``stages.media.AudioFeatures`` so the documented "only 16-bit PCM WAV"
stub boundary is gone.
"""
from __future__ import annotations

import struct

import numpy as np

_ULAW_BIAS = 0x84
_ULAW_CLIP = 32635


# --------------------------------------------------------------------------
# G.711 µ-law
# --------------------------------------------------------------------------
def ulaw_encode(x: np.ndarray) -> np.ndarray:
    """int16 samples → µ-law codes (uint8)."""
    x = np.asarray(x, dtype=np.int32)
    sign = (x < 0).astype(np.uint8)
    mag = np.where(sign, -x, x)
    mag = np.minimum(mag, _ULAW_CLIP) + _ULAW_BIAS
    # floor(log2(mag)) exactly via frexp (mag < 2^15 always after clip)
    msb = np.frexp(mag.astype(np.float64))[1] - 1
    exp = (msb - 7).astype(np.int32)
    mant = (mag >> (exp + 3)) & 0x0F
    code = ~((sign << 7) | (exp.astype(np.uint8) << 4)
             | mant.astype(np.uint8))
    return code.astype(np.uint8)


def ulaw_decode(code: np.ndarray) -> np.ndarray:
    """µ-law codes (uint8) → int16 samples."""
    u = (~np.asarray(code, dtype=np.uint8)).astype(np.int32)
    sign = (u >> 7) & 1
    exp = (u >> 4) & 7
    mant = u & 0x0F
    mag = (((mant << 3) + _ULAW_BIAS) << exp) - _ULAW_BIAS
    return np.where(sign, -mag, mag).astype(np.int16)


# --------------------------------------------------------------------------
# G.711 A-law
# --------------------------------------------------------------------------
_ALAW_SEG_END = np.array([0x1F, 0x3F, 0x7F, 0xFF, 0x1FF, 0x3FF, 0x7FF,
                          0xFFF], dtype=np.int32)


def alaw_encode(x: np.ndarray) -> np.ndarray:
    """int16 samples → A-law codes (uint8)."""
    x = np.asarray(x, dtype=np.int32) >> 3  # 13-bit domain
    mask = np.where(x >= 0, 0xD5, 0x55).astype(np.uint8)
    mag = np.where(x >= 0, x, -x - 1)
    seg = np.searchsorted(_ALAW_SEG_END, mag, side="left").astype(np.int32)
    over = seg >= 8
    seg = np.minimum(seg, 7)
    shift = np.where(seg < 2, 1, seg)
    aval = ((seg << 4) | ((mag >> shift) & 0x0F)).astype(np.uint8)
    aval = np.where(over, np.uint8(0x7F), aval)
    return (aval ^ mask).astype(np.uint8)


def alaw_decode(code: np.ndarray) -> np.ndarray:
    """A-law codes (uint8) → int16 samples."""
    a = (np.asarray(code, dtype=np.uint8) ^ 0x55).astype(np.int32)
    seg = (a & 0x70) >> 4
    t = (a & 0x0F) << 4
    mag = np.where(seg == 0, t + 8,
                   np.where(seg == 1, t + 0x108,
                            (t + 0x108) << np.maximum(seg - 1, 0)))
    # already in the 16-bit domain: the <<4 mantissa placement undoes
    # the encoder's >>3 plus the seg<2 half-step
    return np.where(a & 0x80, mag, -mag).astype(np.int16)


# --------------------------------------------------------------------------
# WAVE container
# --------------------------------------------------------------------------
_FMT_PCM = 1
_FMT_FLOAT = 3
_FMT_ALAW = 6
_FMT_ULAW = 7
_FMT_EXTENSIBLE = 0xFFFE

ENCODINGS = ("pcm8", "pcm16", "pcm24", "pcm32", "float32", "float64",
             "alaw", "ulaw", "pcm16x", "ima_adpcm")


def encode_wav_any(samples: np.ndarray, sample_rate: int,
                   encoding: str = "pcm16") -> bytes:
    """int16 mono samples → WAV bytes in any supported encoding
    (``pcm16x`` = 16-bit PCM wrapped in WAVE_FORMAT_EXTENSIBLE)."""
    x = np.asarray(samples, dtype=np.int16)
    if encoding == "pcm8":
        payload = ((x.astype(np.int32) >> 8) + 128).astype(np.uint8) \
            .tobytes()
        tag, width = _FMT_PCM, 1
    elif encoding in ("pcm16", "pcm16x"):
        payload = x.astype("<i2").tobytes()
        tag, width = _FMT_PCM, 2
    elif encoding == "pcm24":
        v = (x.astype(np.int32) << 8).astype("<i4").tobytes()
        b = np.frombuffer(v, dtype=np.uint8).reshape(-1, 4)
        # the 24-bit value x<<8 sits in LE bytes 0..2; byte 3 is sign ext
        payload = b[:, 0:3].tobytes()
        tag, width = _FMT_PCM, 3
    elif encoding == "pcm32":
        payload = (x.astype(np.int32) << 16).astype("<i4").tobytes()
        tag, width = _FMT_PCM, 4
    elif encoding == "float32":
        payload = (x.astype(np.float32) / 32768.0).astype("<f4").tobytes()
        tag, width = _FMT_FLOAT, 4
    elif encoding == "float64":
        payload = (x.astype(np.float64) / 32768.0).astype("<f8").tobytes()
        tag, width = _FMT_FLOAT, 8
    elif encoding == "alaw":
        payload = alaw_encode(x).tobytes()
        tag, width = _FMT_ALAW, 1
    elif encoding == "ulaw":
        payload = ulaw_encode(x).tobytes()
        tag, width = _FMT_ULAW, 1
    elif encoding == "ima_adpcm":
        payload, _ = adpcm_encode(x)
        tag, width = _FMT_IMA_ADPCM, 0
    else:
        raise ValueError(f"unknown encoding {encoding!r}")

    if encoding == "ima_adpcm":
        fmt = struct.pack("<HHIIHHHH", _FMT_IMA_ADPCM, 1, sample_rate,
                          sample_rate * _ADPCM_BLOCK_ALIGN // ADPCM_SPB,
                          _ADPCM_BLOCK_ALIGN, 4, 2, ADPCM_SPB)
    elif encoding == "pcm16x":
        sub = struct.pack("<H", _FMT_PCM) + b"\x00\x00" + \
            b"\x00\x00\x10\x00\x80\x00\x00\xaa\x00\x38\x9b\x71"
        fmt = struct.pack("<HHIIHHHHI", _FMT_EXTENSIBLE, 1, sample_rate,
                          sample_rate * width, width, 8 * width, 22,
                          8 * width, 0x4) + sub
    else:
        fmt = struct.pack("<HHIIHH", tag, 1, sample_rate,
                          sample_rate * width, width, 8 * width)
    chunks = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    if tag != _FMT_PCM:  # fact chunk mandatory for non-PCM
        chunks += b"fact" + struct.pack("<II", 4, len(x))
    chunks += b"data" + struct.pack("<I", len(payload)) + payload
    if len(payload) % 2:
        chunks += b"\x00"  # RIFF chunks are word-aligned
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def decode_wav_any(data: bytes) -> tuple[int, int, np.ndarray]:
    """WAV bytes → (sample_rate, channels, int16 samples[n, ch]).

    Full chunk walk: arbitrary chunk order, pad bytes, extensible
    headers. Raises ValueError on malformed containers and
    NotImplementedError on format tags outside the table above."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE stream")
    pos, end = 12, len(data)
    tag = None
    sr = ch = width = None
    payload = None
    n_fact = None
    while pos + 8 <= end:
        cid = data[pos:pos + 4]
        (ln,) = struct.unpack("<I", data[pos + 4:pos + 8])
        body = data[pos + 8:pos + 8 + ln]
        if cid == b"fact" and ln >= 4:
            (n_fact,) = struct.unpack("<I", body[:4])
        if cid == b"fmt ":
            if ln < 16:
                raise ValueError("short fmt chunk")
            tag, ch, sr, _, _, bits = struct.unpack("<HHIIHH", body[:16])
            if tag == _FMT_EXTENSIBLE:
                if ln < 40:
                    raise ValueError("short extensible fmt chunk")
                (tag,) = struct.unpack("<H", body[24:26])
            width = bits // 8
        elif cid == b"data":
            payload = body
        pos += 8 + ln + (ln & 1)  # word alignment
    if tag is None or payload is None:
        raise ValueError("missing fmt or data chunk")

    if tag == _FMT_PCM and width == 1:
        x = (np.frombuffer(payload, dtype=np.uint8).astype(np.int32)
             - 128) << 8
    elif tag == _FMT_PCM and width == 2:
        x = np.frombuffer(payload, dtype="<i2").astype(np.int32)
    elif tag == _FMT_PCM and width == 3:
        b = np.frombuffer(payload[:len(payload) - len(payload) % 3],
                          dtype=np.uint8).reshape(-1, 3)
        v = np.zeros((len(b), 4), dtype=np.uint8)
        v[:, 1:4] = b
        x = v.view("<i4").ravel() >> 8
        x = x >> 8  # 24-bit value → 16-bit samples
    elif tag == _FMT_PCM and width == 4:
        x = np.frombuffer(payload, dtype="<i4") >> 16
    elif tag == _FMT_FLOAT and width == 4:
        x = np.clip(np.rint(np.frombuffer(payload, dtype="<f4")
                            .astype(np.float64) * 32768.0),
                    -32768, 32767).astype(np.int32)
    elif tag == _FMT_FLOAT and width == 8:
        x = np.clip(np.rint(np.frombuffer(payload, dtype="<f8") * 32768.0),
                    -32768, 32767).astype(np.int32)
    elif tag == _FMT_ALAW:
        x = alaw_decode(np.frombuffer(payload, dtype=np.uint8)) \
            .astype(np.int32)
    elif tag == _FMT_ULAW:
        x = ulaw_decode(np.frombuffer(payload, dtype=np.uint8)) \
            .astype(np.int32)
    elif tag == _FMT_IMA_ADPCM:
        if ch != 1:
            raise NotImplementedError("multi-channel IMA ADPCM")
        x = adpcm_decode(payload, n_fact).astype(np.int32)
    else:
        raise NotImplementedError(f"WAVE format tag {tag} width {width}")

    n = (len(x) // ch) * ch
    return int(sr), int(ch), x[:n].astype(np.int16).reshape(-1, ch)


# --------------------------------------------------------------------------
# IMA/DVI4 ADPCM (WAVE format tag 0x11) — the predictive-codec class:
# 4-bit codes against an adaptive step-size table, per-block predictor
# reset (each block decodes independently — the seek/resume property).
# Encoder and decoder run the identical reconstruction, vectorized
# ACROSS blocks (the per-sample loop is the codec's data dependency; the
# batch axis is free parallelism).
# --------------------------------------------------------------------------
_IMA_STEPS = np.array([
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767],
    dtype=np.int32)
_IMA_INDEX = np.array([-1, -1, -1, -1, 2, 4, 6, 8], dtype=np.int32)

_FMT_IMA_ADPCM = 0x11
_ADPCM_BLOCK_ALIGN = 256                      # mono bytes per block
ADPCM_SPB = (_ADPCM_BLOCK_ALIGN - 4) * 2 + 1  # samples per block (505)


def _ima_reconstruct(pred, idx, code):
    """One IMA step for vectors of (predictor, table index, 4-bit code):
    returns (new_pred, new_idx). Shared verbatim by encode and decode —
    drift between the two is structurally impossible."""
    step = _IMA_STEPS[idx]
    diffq = (step >> 3) + np.where(code & 4, step, 0) \
        + np.where(code & 2, step >> 1, 0) + np.where(code & 1, step >> 2, 0)
    pred = np.where(code & 8, pred - diffq, pred + diffq)
    pred = np.clip(pred, -32768, 32767)
    idx = np.clip(idx + _IMA_INDEX[code & 7], 0, 88)
    return pred, idx


def adpcm_encode(x: np.ndarray) -> tuple[bytes, int]:
    """int16 mono samples → (IMA ADPCM block stream, n_samples). The
    last block is zero-padded; the true length travels in the WAV fact
    chunk."""
    x = np.asarray(x, dtype=np.int16)
    n = len(x)
    n_blocks = max(1, -(-n // ADPCM_SPB))
    xp = np.zeros(n_blocks * ADPCM_SPB, dtype=np.int16)
    xp[:n] = x
    blk = xp.reshape(n_blocks, ADPCM_SPB).astype(np.int32)

    pred = blk[:, 0].copy()
    # seed each block's table index from its own difference scale (the
    # header carries it, so any choice is conformant; starting at 0
    # would slew-rate-limit the first samples of every block)
    dscale = np.percentile(np.abs(np.diff(blk, axis=1)), 90, axis=1) \
        .astype(np.int32)
    idx = np.clip(np.searchsorted(_IMA_STEPS, dscale), 0, 88) \
        .astype(np.int32)
    idx0 = idx.copy()
    codes = np.empty((n_blocks, ADPCM_SPB - 1), dtype=np.uint8)
    for t in range(1, ADPCM_SPB):
        step = _IMA_STEPS[idx]
        diff = blk[:, t] - pred
        sign = (diff < 0).astype(np.int32)
        mag = np.abs(diff)
        code = np.zeros(n_blocks, dtype=np.int32)
        s = step.copy()
        for bit in (4, 2, 1):
            ge = mag >= s
            code |= np.where(ge, bit, 0)
            mag = np.where(ge, mag - s, mag)
            s >>= 1
        code |= sign << 3
        pred, idx = _ima_reconstruct(pred, idx, code)
        codes[:, t - 1] = code
    # headers + packed nibbles (low nibble first), per block
    lo = codes[:, 0::2]
    hi = codes[:, 1::2]
    packed = (lo | (hi << 4)).astype(np.uint8)
    out = bytearray()
    for b in range(n_blocks):
        out += struct.pack("<hBB", int(blk[b, 0]), int(idx0[b]), 0)
        out += packed[b].tobytes()
    return bytes(out), n


def adpcm_decode(data: bytes, n_samples: int | None = None) -> np.ndarray:
    """IMA ADPCM block stream → int16 mono samples (truncated to
    ``n_samples`` when the fact chunk supplied one)."""
    if len(data) % _ADPCM_BLOCK_ALIGN:
        raise ValueError("ADPCM stream not block-aligned")
    raw = np.frombuffer(data, dtype=np.uint8) \
        .reshape(-1, _ADPCM_BLOCK_ALIGN)
    n_blocks = len(raw)
    pred = raw[:, 0:2].copy().view("<i2")[:, 0].astype(np.int32)
    idx = np.clip(raw[:, 2].astype(np.int32), 0, 88)
    packed = raw[:, 4:]
    codes = np.empty((n_blocks, (ADPCM_SPB - 1)), dtype=np.int32)
    codes[:, 0::2] = packed & 0x0F
    codes[:, 1::2] = packed >> 4
    out = np.empty((n_blocks, ADPCM_SPB), dtype=np.int16)
    out[:, 0] = pred.astype(np.int16)
    for t in range(1, ADPCM_SPB):
        pred, idx = _ima_reconstruct(pred, idx, codes[:, t - 1])
        out[:, t] = pred.astype(np.int16)
    flat = out.ravel()
    return flat[:n_samples] if n_samples is not None else flat
