"""Progressive JPEG (SOF2) codec in pure numpy/Python — a REAL spec codec.

Extends the baseline T.81 implementation (jpeg.py) with the progressive
DCT Huffman process from the published spec (ITU-T T.81 Annex G):
spectral selection + successive approximation, EOB-run coding across
blocks, DC/AC first and refinement scans, and per-scan OPTIMIZED Huffman
tables built with the Annex K.2 two-pass frequency algorithm (progressive
AC scans emit EOBn symbols 0x10..0xE0 which the Annex-K "typical" tables
cannot code, so real progressive streams always carry custom DHTs — as
this encoder does; everything a decoder needs is in the stream).

The scan script is the conventional 10-scan luma/chroma script
(DC Al=1 → banded AC → refinements → final DC/AC Al=0), so the stream is
COMPLETE: decoded output is bit-identical to decoding the baseline
encoding of the same image at the same quality (both share
jpeg._quantize_image; the parity test asserts this).

The decoder reads any 8-bit 3-component 4:4:4 SOF2 stream without
restart markers: arbitrary scan scripts, redefined DHTs between scans,
interleaved or single-component scans, successive approximation in any
legal order. Entry is through jpeg.decode_jpeg, which sniffs the SOF
marker and routes here.

No code from libjpeg; the coding procedures follow the published spec
(T.81 Figures G.3-G.7, K.2). Reference behavior analog: transcode
surface M19 (/root/reference/src/html_lexer/Unicode_wrap.cc:141-228 —
decode as a per-record transform with an error path).
"""

from __future__ import annotations

import struct

import numpy as np

from .jpeg import (
    DEFAULT_QUALITY,
    JpegError,
    UNZIGZAG,
    ZIGZAG,
    _BitWriter,
    _DCT,
    _HuffDecoder,
    _huff_long,
    _IDCT,
    _build_huffman,
    _quantize_image,
    _ycbcr_to_rgb,
)

# (component ids in scan, Ss, Se, Ah, Al) — the conventional progressive
# script: coarse DC, banded luma AC + full chroma AC at reduced
# precision, then refinement scans down to full precision.
_SCAN_SCRIPT = [
    ((0, 1, 2), 0, 0, 0, 1),
    ((0,), 1, 5, 0, 2),
    ((2,), 1, 63, 0, 1),
    ((1,), 1, 63, 0, 1),
    ((0,), 6, 63, 0, 2),
    ((0,), 1, 63, 2, 1),
    ((0, 1, 2), 0, 0, 1, 0),
    ((2,), 1, 63, 1, 0),
    ((1,), 1, 63, 1, 0),
    ((0,), 1, 63, 1, 0),
]

_MAX_EOBRUN = 0x7FFF  # EOBn codes span 1..32767 (r ≤ 14)


# --------------------------------------------------------------------------
# optimal Huffman table generation (T.81 Annex K.2)
# --------------------------------------------------------------------------
def _optimal_table(freq_in: dict[int, int]) -> tuple[list[int], list[int]]:
    """Symbol frequencies → (BITS[1..16], HUFFVAL) per the spec's
    code-size / adjust-BITS procedure. Index 256 is the reserved
    always-least-frequent symbol that guarantees no real symbol gets the
    all-ones code."""
    freq = [0] * 257
    for sym, f in freq_in.items():
        freq[sym] = f
    freq[256] = 1
    codesize = [0] * 257
    others = [-1] * 257
    while True:
        v1 = -1
        for i in range(257):
            if freq[i] > 0 and (v1 < 0 or freq[i] < freq[v1]
                                or (freq[i] == freq[v1] and i > v1)):
                v1 = i
        v2 = -1
        for i in range(257):
            if i != v1 and freq[i] > 0 and (
                    v2 < 0 or freq[i] < freq[v2]
                    or (freq[i] == freq[v2] and i > v2)):
                v2 = i
        if v2 < 0:
            break
        freq[v1] += freq[v2]
        freq[v2] = 0
        codesize[v1] += 1
        while others[v1] >= 0:
            v1 = others[v1]
            codesize[v1] += 1
        others[v1] = v2
        codesize[v2] += 1
        while others[v2] >= 0:
            v2 = others[v2]
            codesize[v2] += 1
    nbits = [0] * 33
    for i in range(257):
        if codesize[i]:
            nbits[codesize[i]] += 1
    i = 32                              # limit code lengths to 16
    while i > 16:
        while nbits[i] > 0:
            j = i - 2
            while nbits[j] == 0:
                j -= 1
            nbits[i] -= 2
            nbits[i - 1] += 1
            nbits[j + 1] += 2
            nbits[j] -= 1
        i -= 1
    i = 16                              # drop the reserved symbol's slot
    while nbits[i] == 0:
        i -= 1
    nbits[i] -= 1
    vals = [s for _, s in sorted((codesize[s], s) for s in range(256)
                                 if codesize[s])]
    return nbits[1:17], vals


# --------------------------------------------------------------------------
# encoder scan kernels — each yields ops: (table_key, sym, value, nbits).
# sym is a Huffman symbol (or None for raw bits); value:nbits are the
# appended magnitude/sign/correction bits.
# --------------------------------------------------------------------------
def _ops_dc_first(comp_zz, scan_comps, al):
    ops = []
    n_blocks = comp_zz[0].shape[0]
    shifted = {c: (comp_zz[c][:, 0] >> al) for c in scan_comps}
    prev = {c: 0 for c in scan_comps}
    for m in range(n_blocks):
        for c in scan_comps:
            tkey = ("dc", 0 if c == 0 else 1)
            diff = int(shifted[c][m]) - prev[c]
            prev[c] = int(shifted[c][m])
            s = abs(diff).bit_length()
            mag = diff if diff > 0 else ((1 << s) - 1 + diff)
            ops.append((tkey, s, mag & ((1 << s) - 1), s))
    return ops


def _ops_dc_refine(comp_zz, scan_comps, al):
    ops = []
    n_blocks = comp_zz[0].shape[0]
    bits = {c: ((comp_zz[c][:, 0] >> al) & 1) for c in scan_comps}
    for m in range(n_blocks):
        for c in scan_comps:
            ops.append((None, None, int(bits[c][m]), 1))
    return ops


def _ops_ac_first(zz, ss, se, al):
    """Single-component AC first scan (T.81 G.1.2.2): point transform
    truncates magnitudes toward zero; trailing-zero blocks fold into
    EOB runs coded once per run."""
    ops = []
    tkey = ("ac", 0)
    eobrun = 0

    def flush():
        nonlocal eobrun
        if eobrun:
            r = eobrun.bit_length() - 1
            ops.append((tkey, r << 4, eobrun & ((1 << r) - 1), r))
            eobrun = 0

    band_all = zz[:, ss:se + 1]
    for bi in range(zz.shape[0]):
        band = band_all[bi]
        r = 0
        for v in band.tolist():
            a = (v if v > 0 else -v) >> al
            if a == 0:
                r += 1
                continue
            flush()
            while r > 15:
                ops.append((tkey, 0xF0, 0, 0))
                r -= 16
            s = a.bit_length()
            mag = a if v > 0 else ((1 << s) - 1 - a)
            ops.append((tkey, (r << 4) | s, mag, s))
            r = 0
        if r > 0:
            eobrun += 1
            if eobrun == _MAX_EOBRUN:
                flush()
    flush()
    return ops


def _ops_ac_refine(zz, ss, se, al):
    """Single-component AC refinement scan (T.81 G.1.2.3): newly
    significant coefficients get (run,1)+sign; history coefficients get
    correction bits, buffered so fully-EOB blocks ride the EOB run."""
    ops = []
    tkey = ("ac", 0)
    eobrun = 0
    pending: list[int] = []

    def flush():
        nonlocal eobrun, pending
        if eobrun:
            r = eobrun.bit_length() - 1
            ops.append((tkey, r << 4, eobrun & ((1 << r) - 1), r))
            ops.extend((None, None, b, 1) for b in pending)
            pending = []
            eobrun = 0

    band_all = zz[:, ss:se + 1]
    for bi in range(zz.shape[0]):
        band = band_all[bi].tolist()
        absv = [(v if v > 0 else -v) >> al for v in band]
        eob = -1
        for k, a in enumerate(absv):
            if a == 1:
                eob = k
        r = 0
        br: list[int] = []
        for k, a in enumerate(absv):
            if a == 0:
                r += 1
                continue
            while r > 15 and k <= eob:
                flush()
                ops.append((tkey, 0xF0, 0, 0))
                r -= 16
                ops.extend((None, None, b, 1) for b in br)
                br = []
            if a > 1:
                br.append(a & 1)
                continue
            flush()
            ops.append((tkey, (r << 4) | 1, 1 if band[k] > 0 else 0, 1))
            r = 0
            ops.extend((None, None, b, 1) for b in br)
            br = []
        if r > 0 or br:
            eobrun += 1
            pending.extend(br)
            if eobrun == _MAX_EOBRUN:
                flush()
    flush()
    return ops


def encode_jpeg_progressive(pixels: np.ndarray,
                            quality: int = DEFAULT_QUALITY,
                            scans: list | None = None) -> bytes:
    """RGB8 (h, w, 3) uint8 → progressive (SOF2) JFIF 4:4:4 JPEG bytes.
    Coefficient data is identical to encode_jpeg at the same quality —
    only the entropy layering differs. ``scans`` overrides the default
    script with a list of (component_ids, Ss, Se, Ah, Al); each
    coefficient's successive-approximation chain must be legal (first
    scan Ah=0, refinements step Al down by one) and complete if full
    precision is wanted."""
    comp_zz, qlum, qchr, h, w, ph, pw = _quantize_image(pixels, quality)
    script = _SCAN_SCRIPT if scans is None else scans
    for comps, ss, se, ah, al in script:
        if ss == 0 and se != 0:
            raise ValueError("DC scan must have Se=0")
        if ss > 0 and len(comps) != 1:
            raise ValueError("AC scans must be single-component")
        if ah and ah != al + 1:
            raise ValueError("refinement must step Al down by one")

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">HH", marker, len(body) + 2) + body

    out = bytearray(b"\xFF\xD8")
    out += seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xFFDB, b"\x00" + bytes(qlum.astype(np.uint8).ravel()[ZIGZAG]))
    out += seg(0xFFDB, b"\x01" + bytes(qchr.astype(np.uint8).ravel()[ZIGZAG]))
    sof = struct.pack(">BHHB", 8, h, w, 3)
    for cid, tq in ((1, 0), (2, 1), (3, 1)):
        sof += struct.pack(">BBB", cid, 0x11, tq)
    out += seg(0xFFC2, sof)                           # SOF2 progressive

    for comps, ss, se, ah, al in script:
        if ss == 0:                                   # DC scan
            ops = (_ops_dc_first(comp_zz, comps, al) if ah == 0
                   else _ops_dc_refine(comp_zz, comps, al))
        else:
            (c,) = comps
            ops = (_ops_ac_first(comp_zz[c], ss, se, al) if ah == 0
                   else _ops_ac_refine(comp_zz[c], ss, se, al))

        freqs: dict[tuple, dict[int, int]] = {}
        for tkey, sym, _v, _n in ops:
            if sym is not None:
                f = freqs.setdefault(tkey, {})
                f[sym] = f.get(sym, 0) + 1
        tables = {}
        for tkey, f in freqs.items():
            bits, vals = _optimal_table(f)
            tables[tkey] = _build_huffman(bits, vals)
            kind, tid = tkey
            tc_th = (0x10 if kind == "ac" else 0x00) | tid
            out += seg(0xFFC4, bytes([tc_th]) + bytes(bits) + bytes(vals))

        sos = bytes([len(comps)])
        for c in comps:
            td = 0 if c == 0 else 1
            ta = 0
            sos += bytes([c + 1, ((td << 4) | ta) if ss == 0 else ta])
        sos += bytes([ss, se, (ah << 4) | al])
        out += seg(0xFFDA, sos)

        bw = _BitWriter()
        for tkey, sym, v, n in ops:
            if sym is not None:
                code, ln = tables[tkey][sym]
                bw.put((code << n) | v, ln + n)
            elif n:
                bw.put(v, n)
        out += bw.finish()

    out += b"\xFF\xD9"
    return bytes(out)


# --------------------------------------------------------------------------
# decoder
# --------------------------------------------------------------------------
class _BitReader:
    """MSB-first reader over an unstuffed entropy segment."""

    __slots__ = ("buf", "pos", "acc", "nbits", "n")

    def __init__(self, buf: bytes):
        self.buf = buf
        self.n = len(buf)
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def _fill(self, need: int):
        while self.nbits < need:
            if self.pos >= self.n:
                raise JpegError("truncated entropy data")
            self.acc = ((self.acc << 8) | self.buf[self.pos]) \
                & 0xFFFFFFFFFFFF
            self.pos += 1
            self.nbits += 8

    def bits(self, n: int) -> int:
        if n == 0:
            return 0
        self._fill(n)
        self.nbits -= n
        return (self.acc >> self.nbits) & ((1 << n) - 1)

    def huff(self, dec) -> int:
        # fill to a 16-bit peek; at segment end pad the peek with zeros
        # (the final code of a scan may sit in fewer than 16 real bits)
        while self.nbits < 16 and self.pos < self.n:
            self.acc = ((self.acc << 8) | self.buf[self.pos]) \
                & 0xFFFFFFFFFFFF
            self.pos += 1
            self.nbits += 8
        if self.nbits >= 16:
            peek = (self.acc >> (self.nbits - 16)) & 0xFFFF
        else:
            peek = (self.acc << (16 - self.nbits)) & 0xFFFF
        e = dec.lut[peek >> 4]
        if e == 0:
            e = _huff_long(peek, dec.long_starts, dec.long_entries)
        ln = e >> 8
        if ln > self.nbits:
            raise JpegError("bad Huffman code")
        self.nbits -= ln
        return e & 0xFF


def _extend(v: int, s: int) -> int:
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


def _entropy_extent(data: bytes, start: int) -> int:
    """End offset of an entropy segment: first 0xFF not followed by 0x00."""
    n = len(data)
    i = start
    while i < n:
        if data[i] == 0xFF and i + 1 < n and data[i + 1] != 0x00:
            return i
        i += 1
    return n


def decode_jpeg_progressive(data: bytes) -> np.ndarray:
    try:
        return _decode_progressive(data)
    except JpegError:
        raise
    except (ValueError, IndexError, struct.error) as e:
        raise JpegError(f"malformed progressive JPEG stream: {e}") from e


def _decode_progressive(data: bytes) -> np.ndarray:
    if not data.startswith(b"\xFF\xD8"):
        raise JpegError("not a JPEG (missing SOI)")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff: dict[int, _HuffDecoder] = {}
    h = w = None
    comps: list[tuple[int, int]] = []
    coef: list[list[list[int]]] = []    # [comp][block][zigzag k]
    n = len(data)
    while pos + 2 <= n:
        if data[pos] != 0xFF:
            raise JpegError("marker expected")
        marker = data[pos + 1]
        if marker == 0xFF:
            pos += 1
            continue
        if marker == 0xD9:
            break
        if pos + 4 > n:
            raise JpegError("truncated segment")
        (length,) = struct.unpack(">H", data[pos + 2:pos + 4])
        body = data[pos + 4:pos + 2 + length]
        if len(body) != length - 2:
            raise JpegError("truncated segment")
        if marker == 0xDB:
            b = 0
            while b < len(body):
                pq, tq = body[b] >> 4, body[b] & 0xF
                if pq != 0:
                    raise JpegError("16-bit quant tables unsupported")
                if b + 65 > len(body):
                    raise JpegError("truncated DQT")
                qt[tq] = np.frombuffer(body[b + 1:b + 65], dtype=np.uint8) \
                    .astype(np.float64)[UNZIGZAG].reshape(8, 8)
                b += 65
        elif marker == 0xC2:
            prec, h, w, nc = struct.unpack(">BHHB", body[:6])
            if prec != 8 or nc != 3:
                raise JpegError("only 8-bit 3-component streams supported")
            for i in range(3):
                cid, hv, tq = body[6 + 3 * i:9 + 3 * i]
                if hv != 0x11:
                    raise JpegError("only 4:4:4 (no subsampling) supported")
                comps.append((cid, tq))
            nb = (-(-h // 8)) * (-(-w // 8))
            coef = [[[0] * 64 for _ in range(nb)] for _ in range(3)]
        elif marker in (0xC0, 0xC1, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise JpegError("not a progressive (SOF2) stream")
        elif marker == 0xC4:
            b = 0
            while b < len(body):
                tc_th = body[b]
                bits = list(body[b + 1:b + 17])
                cnt = sum(bits)
                vals = list(body[b + 17:b + 17 + cnt])
                if len(bits) < 16 or len(vals) < cnt:
                    raise JpegError("truncated DHT")
                huff[tc_th] = _HuffDecoder(bits, vals)
                b += 17 + cnt
        elif marker == 0xDD:
            raise JpegError("restart intervals unsupported")
        elif marker == 0xDA:
            if h is None:
                raise JpegError("SOS before SOF")
            scan_comps: list[tuple[int, int, int]] = []  # (ci, td, ta)
            ns = body[0]
            if not 1 <= ns <= 3 or len(body) < 4 + 2 * ns:
                raise JpegError("bad SOS header")
            for i in range(ns):
                cid, tbls = body[1 + 2 * i], body[2 + 2 * i]
                ci = next((j for j, (c, _q) in enumerate(comps)
                           if c == cid), None)
                if ci is None:
                    raise JpegError("scan references unknown component")
                scan_comps.append((ci, tbls >> 4, tbls & 0xF))
            ss, se, ahal = body[1 + 2 * ns:4 + 2 * ns]
            ah, al = ahal >> 4, ahal & 0xF
            start = pos + 2 + length
            end = _entropy_extent(data, start)
            br = _BitReader(data[start:end].replace(b"\xFF\x00", b"\xFF"))
            _decode_scan(coef, scan_comps, ss, se, ah, al, br, huff)
            pos = end
            continue
        pos += 2 + length
    if h is None:
        raise JpegError("missing SOF2")

    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    chans = []
    for c in range(3):
        tq = comps[c][1]
        if tq not in qt:
            raise JpegError("missing quant table")
        arr = np.array(coef[c], dtype=np.float64)
        coeffs = arr[:, UNZIGZAG].reshape(-1, 8, 8) * qt[tq][None, :, :]
        blocks = np.einsum("nk,bkl,lm->bnm", _IDCT, coeffs, _DCT) + 128.0
        chans.append(blocks.reshape(ph // 8, pw // 8, 8, 8)
                     .transpose(0, 2, 1, 3).reshape(ph, pw))
    ycc = np.stack(chans, axis=-1)[:h, :w]
    return _ycbcr_to_rgb(ycc)


def _decode_scan(coef, scan_comps, ss, se, ah, al, br, huff):
    if ss == 0:
        if se != 0:
            raise JpegError("DC scan must have Se=0")
        if ah == 0:
            _scan_dc_first(coef, scan_comps, al, br, huff)
        else:
            _scan_dc_refine(coef, scan_comps, al, br)
    else:
        if len(scan_comps) != 1:
            raise JpegError("AC scans must be single-component")
        ci, _td, ta = scan_comps[0]
        lut = _get_lut(huff, 0x10 | ta)
        if ah == 0:
            _scan_ac_first(coef[ci], ss, se, al, br, lut)
        else:
            _scan_ac_refine(coef[ci], ss, se, al, br, lut)


def _get_lut(huff, key):
    dec = huff.get(key)
    if dec is None:
        raise JpegError("missing Huffman table")
    return dec


def _scan_dc_first(coef, scan_comps, al, br, huff):
    luts = [(_get_lut(huff, td)) for _ci, td, _ta in scan_comps]
    prev = [0] * len(scan_comps)
    for m in range(len(coef[0])):
        for i, (ci, _td, _ta) in enumerate(scan_comps):
            s = br.huff(luts[i])
            if s:
                prev[i] += _extend(br.bits(s), s)
            coef[ci][m][0] = prev[i] << al


def _scan_dc_refine(coef, scan_comps, al, br):
    p1 = 1 << al
    for m in range(len(coef[0])):
        for ci, _td, _ta in scan_comps:
            if br.bits(1):
                coef[ci][m][0] |= p1


def _scan_ac_first(cblocks, ss, se, al, br, lut):
    eobrun = 0
    for blk in cblocks:
        if eobrun > 0:
            eobrun -= 1
            continue
        k = ss
        while k <= se:
            sym = br.huff(lut)
            r, s = sym >> 4, sym & 0xF
            if s == 0:
                if r == 15:
                    k += 16
                    continue
                eobrun = (1 << r) + (br.bits(r) if r else 0) - 1
                break
            k += r
            if k > se:
                raise JpegError("AC coefficient overrun")
            blk[k] = _extend(br.bits(s), s) << al
            k += 1


def _scan_ac_refine(cblocks, ss, se, al, br, lut):
    p1 = 1 << al
    eobrun = 0
    for blk in cblocks:
        k = ss
        if eobrun == 0:
            while k <= se:
                sym = br.huff(lut)
                r, s = sym >> 4, sym & 0xF
                newval = 0
                if s:
                    if s != 1:
                        raise JpegError("bad refinement symbol")
                    newval = p1 if br.bits(1) else -p1
                elif r != 15:
                    eobrun = (1 << r) + (br.bits(r) if r else 0)
                    break
                while k <= se:
                    v = blk[k]
                    if v != 0:
                        if br.bits(1) and (v & p1) == 0:
                            blk[k] = v + (p1 if v >= 0 else -p1)
                    else:
                        if r == 0:
                            break
                        r -= 1
                    k += 1
                if newval:
                    if k > se:
                        raise JpegError("refinement overrun")
                    blk[k] = newval
                k += 1
        if eobrun > 0:
            while k <= se:
                v = blk[k]
                if v != 0:
                    if br.bits(1) and (v & p1) == 0:
                        blk[k] = v + (p1 if v >= 0 else -p1)
                k += 1
            eobrun -= 1
