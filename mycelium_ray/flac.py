"""From-scratch FLAC codec (RFC 9639 / the published FLAC format spec),
pure Python + numpy — no audio library.

Closes the compressed-audio stub in ``stages/media.AudioFeatures``: the
container ships no libsndfile/ffmpeg, and the reference's converter fork
(src/local_indexer/local_indexer.cc:98-131, M19/M22 analog) assumed
external tools; here the format itself is implemented from the public
spec, the same posture as jpeg.py (ITU-T T.81) and webp.py (RFC 9649).

Scope (the spec "subset" profile, 16-bit):
- Decoder: full frame parsing — fixed AND variable blocking strategy,
  all blocksize/sample-rate codes, UTF-8 coded frame/sample numbers,
  CRC-8 header + CRC-16 frame checks, wasted bits, subframe types
  CONSTANT / VERBATIM / FIXED(0-4) / LPC(1-32), Rice residual partitions
  of any order incl. escaped partitions, channel assignments
  independent / left-side / right-side / mid-side, and the STREAMINFO
  MD5 verification of the decoded output.
- Encoder: fixed 4096-sample frames, per-subframe best-of fixed
  predictors (orders 0-2) vs CONSTANT vs VERBATIM, single-partition Rice
  residuals, independent channels, full CRCs + MD5 — a valid stream any
  conforming decoder accepts (and our decoder round-trips bit-exactly).

Streams are seconds-long clips (feature extraction inputs), decoded in
one numpy pass per subframe — fine for actor-pool batch stages.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np


class FlacError(ValueError):
    pass


# --------------------------------------------------------------------------
# CRCs (frame header CRC-8 poly 0x07, frame CRC-16 poly 0x8005)
# --------------------------------------------------------------------------
def _crc_table(poly: int, width: int) -> np.ndarray:
    top = 1 << (width - 1)
    mask = (1 << width) - 1
    tab = np.zeros(256, dtype=np.uint32)
    for b in range(256):
        r = b << (width - 8)
        for _ in range(8):
            r = ((r << 1) ^ poly) if (r & top) else (r << 1)
        tab[b] = r & mask
    return tab


_CRC8_TAB = _crc_table(0x07, 8)
_CRC16_TAB = _crc_table(0x8005, 16)


def crc8(data: bytes) -> int:
    r = 0
    for b in data:
        r = int(_CRC8_TAB[(r ^ b) & 0xFF])
    return r


def crc16(data: bytes) -> int:
    r = 0
    for b in data:
        r = ((r << 8) & 0xFFFF) ^ int(_CRC16_TAB[((r >> 8) ^ b) & 0xFF])
    return r


# --------------------------------------------------------------------------
# MSB-first bit I/O (FLAC packs big-endian)
# --------------------------------------------------------------------------
class _BitReader:
    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.bytepos = pos
        self.bitpos = 0  # bits consumed of current byte, MSB first

    def read(self, n: int) -> int:
        out = 0
        while n > 0:
            if self.bytepos >= len(self.data):
                raise FlacError("truncated FLAC stream")
            avail = 8 - self.bitpos
            take = min(n, avail)
            cur = self.data[self.bytepos]
            out = (out << take) | \
                ((cur >> (avail - take)) & ((1 << take) - 1))
            self.bitpos += take
            if self.bitpos == 8:
                self.bitpos = 0
                self.bytepos += 1
            n -= take
        return out

    def read_signed(self, n: int) -> int:
        v = self.read(n)
        return v - (1 << n) if v >> (n - 1) else v

    def unary(self) -> int:
        n = 0
        while True:
            if self.read(1):
                return n
            n += 1

    def align(self):
        if self.bitpos:
            self.bitpos = 0
            self.bytepos += 1


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, n: int):
        self.acc = (self.acc << n) | (value & ((1 << n) - 1))
        self.nbits += n
        while self.nbits >= 8:
            self.nbits -= 8
            self.buf.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def align(self):
        if self.nbits:
            self.write(0, 8 - self.nbits)

    def bytes(self) -> bytes:
        assert self.nbits == 0
        return bytes(self.buf)


# --------------------------------------------------------------------------
# UTF-8-style coded numbers (frame/sample number field)
# --------------------------------------------------------------------------
def _utf8_encode(n: int) -> bytes:
    if n < 0x80:
        return bytes([n])
    out = []
    nbytes = 2
    while n >= (1 << (5 * nbytes + 1)) and nbytes < 7:
        nbytes += 1
    lead = (0xFF << (8 - nbytes)) & 0xFF
    shift = 6 * (nbytes - 1)
    out.append(lead | (n >> shift))
    for i in range(nbytes - 2, -1, -1):
        out.append(0x80 | ((n >> (6 * i)) & 0x3F))
    return bytes(out)


def _utf8_decode(br: _BitReader) -> int:
    b0 = br.read(8)
    if b0 < 0x80:
        return b0
    nbytes = 0
    probe = b0
    while probe & 0x80:
        nbytes += 1
        probe = (probe << 1) & 0xFF
    if nbytes < 2 or nbytes > 7:
        raise FlacError("bad UTF-8 coded number")
    n = b0 & (0x7F >> nbytes)
    for _ in range(nbytes - 1):
        b = br.read(8)
        if (b & 0xC0) != 0x80:
            raise FlacError("bad UTF-8 continuation")
        n = (n << 6) | (b & 0x3F)
    return n


# --------------------------------------------------------------------------
# fixed predictors (spec §9.2.2): residual = convolution with these taps
# --------------------------------------------------------------------------
_FIXED_COEFS = {
    0: np.array([], dtype=np.int64),
    1: np.array([1], dtype=np.int64),
    2: np.array([2, -1], dtype=np.int64),
    3: np.array([3, -3, 1], dtype=np.int64),
    4: np.array([4, -6, 4, -1], dtype=np.int64),
}


def _fixed_residual(x: np.ndarray, order: int) -> np.ndarray:
    r = x.astype(np.int64)
    for _ in range(order):
        r = np.diff(r)
    return r


def _fixed_restore(residual: np.ndarray, warmup: np.ndarray,
                   order: int) -> np.ndarray:
    """Invert the order-th difference: level k's sequence s_k satisfies
    s_k[i+1] = s_k[i] + s_{k+1}[i]; the warmup samples pin s_k[0..order-1-k]
    (their k-th differences), the rest is one exact-int64 cumsum per
    level."""
    if order == 0:
        return residual.astype(np.int64)
    s = residual.astype(np.int64)                      # s_order
    w = warmup.astype(np.int64)
    for k in range(order - 1, -1, -1):
        known = np.diff(w, k) if k else w              # s_k[0..order-1-k]
        start = order - 1 - k
        tail = known[start] + np.cumsum(s[start:], dtype=np.int64)
        s = np.concatenate([known[:start + 1], tail])
    return s


# --------------------------------------------------------------------------
# Rice coding
# --------------------------------------------------------------------------
def _zigzag(r: np.ndarray) -> np.ndarray:
    return np.where(r >= 0, r.astype(np.int64) << 1,
                    ((-r.astype(np.int64)) << 1) - 1)


def _rice_bits(u: np.ndarray, k: int) -> int:
    return int((u >> k).sum()) + len(u) * (k + 1)


def _best_rice_k(u: np.ndarray) -> int:
    if len(u) == 0:
        return 0
    best_k, best = 0, _rice_bits(u, 0)
    for k in range(1, 15):
        b = _rice_bits(u, k)
        if b < best:
            best_k, best = k, b
    return best_k


def _write_rice(bw: _BitWriter, r: np.ndarray, k: int):
    for u in _zigzag(r).tolist():
        q = u >> k
        bw.write(0, q) if q else None
        bw.write(1, 1)
        if k:
            bw.write(u & ((1 << k) - 1), k)


def _read_rice(br: _BitReader, n: int, k: int) -> np.ndarray:
    out = np.empty(n, dtype=np.int64)
    for i in range(n):
        q = br.unary()
        u = (q << k) | (br.read(k) if k else 0)
        out[i] = (u >> 1) if (u & 1) == 0 else -((u + 1) >> 1)
    return out


# --------------------------------------------------------------------------
# decoder
# --------------------------------------------------------------------------
_BLOCKSIZE_CODES = {1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608,
                    8: 256, 9: 512, 10: 1024, 11: 2048, 12: 4096,
                    13: 8192, 14: 16384, 15: 32768}
_RATE_CODES = {1: 88200, 2: 176400, 3: 192000, 4: 8000, 5: 16000,
               6: 22050, 7: 24000, 8: 32000, 9: 44100, 10: 48000,
               11: 96000}
_BPS_CODES = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}


def _read_residual(br: _BitReader, blocksize: int,
                   order: int) -> np.ndarray:
    method = br.read(2)
    if method > 1:
        raise FlacError("reserved residual coding method")
    kbits = 4 if method == 0 else 5
    escape = (1 << kbits) - 1
    part_order = br.read(4)
    nparts = 1 << part_order
    if blocksize % nparts or (blocksize >> part_order) <= order:
        raise FlacError("bad Rice partition order")
    out = []
    for p in range(nparts):
        n = (blocksize >> part_order) - (order if p == 0 else 0)
        k = br.read(kbits)
        if k == escape:
            bits = br.read(5)
            vals = np.array([br.read_signed(bits) if bits else 0
                             for _ in range(n)], dtype=np.int64)
            out.append(vals)
        else:
            out.append(_read_rice(br, n, k))
    return np.concatenate(out) if out else np.empty(0, np.int64)


def _read_subframe(br: _BitReader, blocksize: int, bps: int) -> np.ndarray:
    if br.read(1):
        raise FlacError("bad subframe padding bit")
    sf_type = br.read(6)
    wasted = 0
    if br.read(1):
        wasted = 1 + br.unary()
    eff = bps - wasted
    if sf_type == 0:          # CONSTANT
        v = br.read_signed(eff)
        x = np.full(blocksize, v, dtype=np.int64)
    elif sf_type == 1:        # VERBATIM
        x = np.array([br.read_signed(eff) for _ in range(blocksize)],
                     dtype=np.int64)
    elif 8 <= sf_type <= 12:  # FIXED order 0-4
        order = sf_type - 8
        warm = np.array([br.read_signed(eff) for _ in range(order)],
                        dtype=np.int64)
        resid = _read_residual(br, blocksize, order)
        x = _fixed_restore(resid, warm, order)
    elif sf_type >= 32:       # LPC order 1-32
        order = sf_type - 31
        warm = np.array([br.read_signed(eff) for _ in range(order)],
                        dtype=np.int64)
        prec = br.read(4) + 1
        if prec == 16:
            raise FlacError("invalid LPC precision")
        shift = br.read_signed(5)
        if shift < 0:
            raise FlacError("negative LPC shift")
        coefs = np.array([br.read_signed(prec) for _ in range(order)],
                         dtype=np.int64)
        resid = _read_residual(br, blocksize, order)
        x = np.empty(blocksize, dtype=np.int64)
        x[:order] = warm
        for i in range(order, blocksize):
            pred = int(np.dot(coefs, x[i - 1::-1][:order])) >> shift
            x[i] = pred + resid[i - order]
    else:
        raise FlacError("reserved subframe type")
    return x << wasted


def decode_flac(data: bytes) -> tuple[int, int, np.ndarray]:
    """bytes → (sample_rate, channels, samples int32 array of shape
    (n, channels)). Verifies header CRC-8, frame CRC-16 and the
    STREAMINFO MD5 of the decoded audio."""
    if data[:4] != b"fLaC":
        raise FlacError("not a FLAC stream")
    pos = 4
    info = None
    while True:
        if pos + 4 > len(data):
            raise FlacError("truncated metadata")
        hdr = data[pos]
        last = hdr >> 7
        btype = hdr & 0x7F
        ln = int.from_bytes(data[pos + 1:pos + 4], "big")
        body = data[pos + 4:pos + 4 + ln]
        if btype == 0:
            if ln != 34:
                raise FlacError("bad STREAMINFO length")
            info = body
        pos += 4 + ln
        if last:
            break
    if info is None:
        raise FlacError("missing STREAMINFO")
    sample_rate = int.from_bytes(info[10:13], "big") >> 4
    channels = ((info[12] >> 1) & 0x7) + 1
    bps = (((info[12] & 1) << 4) | (info[13] >> 4)) + 1
    total = ((info[13] & 0x0F) << 32) | int.from_bytes(info[14:18], "big")
    md5_want = info[18:34]
    if sample_rate == 0:
        raise FlacError("bad sample rate")

    chans: list[list[np.ndarray]] = [[] for _ in range(channels)]
    ngot = 0
    while pos < len(data) and (total == 0 or ngot < total):
        frame_start = pos
        br = _BitReader(data, pos)
        sync = br.read(14)
        if sync != 0x3FFE:
            raise FlacError("bad frame sync")
        if br.read(1):
            raise FlacError("bad frame reserved bit")
        br.read(1)  # blocking strategy (we accept both)
        bs_code = br.read(4)
        sr_code = br.read(4)
        ch_code = br.read(4)
        bps_code = br.read(3)
        if br.read(1):
            raise FlacError("bad frame header padding")
        _utf8_decode(br)  # frame/sample number
        if bs_code == 0:
            raise FlacError("reserved blocksize code")
        elif bs_code == 6:
            blocksize = br.read(8) + 1
        elif bs_code == 7:
            blocksize = br.read(16) + 1
        else:
            blocksize = _BLOCKSIZE_CODES[bs_code]
        if sr_code == 0:
            rate = sample_rate
        elif sr_code in _RATE_CODES:
            rate = _RATE_CODES[sr_code]
        elif sr_code == 12:
            rate = br.read(8) * 1000
        elif sr_code == 13:
            rate = br.read(16)
        elif sr_code == 14:
            rate = br.read(16) * 10
        else:
            raise FlacError("invalid sample-rate code")
        fbps = bps if bps_code == 0 else _BPS_CODES.get(bps_code)
        if fbps is None:
            raise FlacError("reserved bits-per-sample code")
        # every field above is a whole number of bits summing to byte
        # alignment, so the CRC-8 is the next aligned byte
        br.align()
        want8 = br.read(8)
        if crc8(data[frame_start:br.bytepos - 1]) != want8:
            raise FlacError("frame header CRC-8 mismatch")

        if ch_code < 8:
            nch = ch_code + 1
            if nch != channels:
                raise FlacError("channel count change mid-stream")
            subs = [_read_subframe(br, blocksize, fbps)
                    for _ in range(nch)]
        elif ch_code == 8:    # left-side
            left = _read_subframe(br, blocksize, fbps)
            side = _read_subframe(br, blocksize, fbps + 1)
            subs = [left, left - side]
        elif ch_code == 9:    # right-side
            side = _read_subframe(br, blocksize, fbps + 1)
            right = _read_subframe(br, blocksize, fbps)
            subs = [right + side, right]
        elif ch_code == 10:   # mid-side: L+R = (mid<<1)|(side&1), L-R = side
            mid = _read_subframe(br, blocksize, fbps)
            side = _read_subframe(br, blocksize, fbps + 1)
            left = (((mid << 1) | (side & 1)) + side) >> 1
            subs = [left, left - side]
        else:
            raise FlacError("reserved channel assignment")
        if ch_code in (8, 9, 10) and channels != 2:
            raise FlacError("stereo decorrelation in non-stereo stream")

        br.align()
        crc_hi = br.read(8)
        crc_lo = br.read(8)
        if crc16(data[frame_start:br.bytepos - 2]) != \
                ((crc_hi << 8) | crc_lo):
            raise FlacError("frame CRC-16 mismatch")
        for c in range(channels):
            chans[c].append(subs[c])
        ngot += blocksize
        pos = br.bytepos
        del rate  # per-frame rate must match STREAMINFO for our subset

    out = np.stack([np.concatenate(c) if c else np.empty(0, np.int64)
                    for c in chans], axis=1)
    if total and len(out) != total:
        raise FlacError("sample count mismatch")
    if md5_want != b"\x00" * 16:
        if _samples_md5(out, bps) != md5_want:
            raise FlacError("MD5 mismatch: decoded audio is corrupt")
    return sample_rate, channels, out.astype(np.int32)


def _samples_md5(samples: np.ndarray, bps: int) -> bytes:
    if bps != 16:
        raise FlacError("md5 check implemented for 16-bit only")
    return hashlib.md5(
        samples.astype("<i2").tobytes(order="C")).digest()


# --------------------------------------------------------------------------
# encoder
# --------------------------------------------------------------------------
def _encode_subframe(bw: _BitWriter, x: np.ndarray, bps: int):
    if np.all(x == x[0]):
        bw.write(0, 1)
        bw.write(0, 6)        # CONSTANT
        bw.write(0, 1)
        bw.write(int(x[0]) & ((1 << bps) - 1), bps)
        return
    best = None  # (bits, order, resid, k)
    for order in (0, 1, 2):
        if len(x) <= order:
            continue
        resid = _fixed_residual(x, order)
        u = _zigzag(resid)
        k = _best_rice_k(u)
        bits = order * bps + 6 + _rice_bits(u, k)
        if best is None or bits < best[0]:
            best = (bits, order, resid, k)
    verbatim_bits = len(x) * bps
    if best is None or best[0] >= verbatim_bits:
        bw.write(0, 1)
        bw.write(1, 6)        # VERBATIM
        bw.write(0, 1)
        for v in x.tolist():
            bw.write(int(v) & ((1 << bps) - 1), bps)
        return
    _, order, resid, k = best
    bw.write(0, 1)
    bw.write(8 + order, 6)    # FIXED
    bw.write(0, 1)            # no wasted bits
    for v in x[:order].tolist():
        bw.write(int(v) & ((1 << bps) - 1), bps)
    bw.write(0, 2)            # residual method 0 (4-bit Rice)
    bw.write(0, 4)            # partition order 0
    bw.write(k, 4)
    _write_rice(bw, resid, k)


def encode_flac(samples: np.ndarray, sample_rate: int,
                blocksize: int = 4096) -> bytes:
    """(n,) or (n, channels) int16-range samples → FLAC bytes.

    Independent channels, fixed predictors 0-2 / constant / verbatim,
    one Rice partition per subframe — a small but fully conforming
    encoder (CRC-8, CRC-16, STREAMINFO MD5 all real)."""
    header, frames = encode_flac_parts(samples, sample_rate, blocksize)
    return header + b"".join(frames)


def encode_flac_parts(samples: np.ndarray, sample_rate: int,
                      blocksize: int = 4096) -> tuple[bytes, list[bytes]]:
    """(native header 'fLaC'+STREAMINFO, [frame bytes, ...]) — the
    pieces the FLAC-to-Ogg mapping needs (one audio PACKET per frame),
    concatenated verbatim by encode_flac for the native stream."""
    x = np.asarray(samples, dtype=np.int64)
    if x.ndim == 1:
        x = x[:, None]
    n, channels = x.shape
    if not (1 <= channels <= 8):
        raise FlacError("1-8 channels")
    if n == 0:
        raise FlacError("empty audio")
    if x.min() < -(1 << 15) or x.max() >= (1 << 15):
        raise FlacError("16-bit sample range required")
    bps = 16

    frames: list[bytes] = []
    fno = 0
    for off in range(0, n, blocksize):
        blk = x[off:off + blocksize]
        bs = len(blk)
        bw = _BitWriter()
        bw.write(0x3FFE, 14)
        bw.write(0, 1)
        bw.write(0, 1)            # fixed blocking strategy
        bw.write(7, 4)            # blocksize: 16-bit at end of header
        bw.write(0, 4)            # sample rate: from STREAMINFO
        bw.write(channels - 1, 4)  # independent channels
        bw.write(0b100, 3)        # 16 bps
        bw.write(0, 1)
        for b in _utf8_encode(fno):
            bw.write(b, 8)
        bw.write(bs - 1, 16)
        hdr = bw.buf[:]           # aligned: all fields above are 8-bit mult
        assert bw.nbits == 0
        bw.write(crc8(bytes(hdr)), 8)
        for c in range(channels):
            _encode_subframe(bw, blk[:, c], bps)
        bw.align()
        body = bytes(bw.buf)
        frames.append(body + struct.pack(">H", crc16(body)))
        fno += 1

    info = bytearray(34)
    bsz = min(blocksize, n)
    info[0:2] = struct.pack(">H", bsz)
    info[2:4] = struct.pack(">H", bsz)
    # min/max frame size unknown (0); then one 64-bit field:
    # rate(20) | channels-1(3) | bps-1(5) | total-samples(36)
    packed = (sample_rate << 44) | ((channels - 1) << 41) | \
        ((bps - 1) << 36) | n
    info[10:18] = packed.to_bytes(8, "big")
    info[18:34] = _samples_md5(x, bps)
    header = b"fLaC" + bytes([0x80]) + len(info).to_bytes(3, "big") + \
        bytes(info)
    return header, frames
