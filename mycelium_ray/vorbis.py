"""Ogg Vorbis I codec (from-scratch, pure numpy).

The reference treats compressed audio as opaque payloads; this rebuild's
audio stages decode WAV/FLAC/Ogg-FLAC for real and previously stubbed
every transform codec. Vorbis is the one transform codec whose spec is
fully self-contained (Vorbis I specification, xiph.org: bit-packing
convention, codebook format, floor1, residue, IMDCT and window are all
normatively specified prose+pseudocode, no opaque tables beyond the
floor dB curve) — so the DECODER here implements the published Vorbis I
decode algorithms, and the ENCODER emits a deliberately small legal
subset of the format that the decoder (or any spec decoder) can read:

- one blocksize (no long/short window switching),
- floor 1 with zero partitions (a flat two-post envelope per packet,
  carrying the per-packet amplitude scale),
- residue type 2 (channel-interleaved) with one coded class and a
  256-level scalar (dim-1, lookup-type-1) VQ codebook,
- uniform-length Huffman codebooks (the canonical lowest-available
  codeword assignment then degenerates to entry order, so encoder and
  decoder agree by construction AND by the general assignment
  algorithm implemented below).

Cannot be validated against libvorbis in this container (no such
library); tests pin (a) bit-exact decode of our own streams against the
written spectral data, (b) PSNR ≥ 40 dB signal round-trips, (c) header/
packet parse errors as typed VorbisError, (d) interop of the Ogg layer
with the existing audiometa probe. The floor dB table is generated
geometrically from the normative endpoints (1.0649863e-07 → 0.9921257
over 256 steps), which matches the published table's geometric ladder.

Reference parity note: the reference (crawler.cc tree) never decodes
audio; this module exists for the LLM-data-pipeline audio operators
(SURVEY.md §2.7 additions), replacing one documented honest stub.
"""

from __future__ import annotations

import struct

import numpy as np


class VorbisError(ValueError):
    """Typed parse/decode failure (corrupt or unsupported stream)."""


# ==========================================================================
# bit packing (Vorbis: LSB-first within bytes)
# ==========================================================================
class BitWriter:
    def __init__(self) -> None:
        self._buf = bytearray()
        self._acc = 0
        self._n = 0

    def write(self, value: int, bits: int) -> None:
        """Write `bits` low bits of value, LSB first."""
        self._acc |= (value & ((1 << bits) - 1)) << self._n
        self._n += bits
        while self._n >= 8:
            self._buf.append(self._acc & 0xFF)
            self._acc >>= 8
            self._n -= 8

    def write_code(self, code: int, bits: int) -> None:
        """Write a Huffman codeword: MSB of the codeword first."""
        for i in range(bits - 1, -1, -1):
            self.write((code >> i) & 1, 1)

    def bytes(self) -> bytes:
        out = bytes(self._buf)
        if self._n:
            out += bytes([self._acc & 0xFF])
        return out


class BitReader:
    def __init__(self, data: bytes) -> None:
        self._d = data
        self._pos = 0  # bit position

    def read(self, bits: int) -> int:
        p = self._pos
        end = p + bits
        if (end + 7) >> 3 > len(self._d):
            raise VorbisError("bit reader past end of packet")
        chunk = int.from_bytes(self._d[p >> 3: (end + 7) >> 3], "little")
        self._pos = end
        return (chunk >> (p & 7)) & ((1 << bits) - 1)

    def read1(self) -> int:
        p = self._pos
        byte = p >> 3
        if byte >= len(self._d):
            raise VorbisError("bit reader past end of packet")
        self._pos += 1
        return (self._d[byte] >> (p & 7)) & 1


def ilog(x: int) -> int:
    """Vorbis ilog: bits needed for x (ilog(0)=0, ilog(7)=3)."""
    n = 0
    while x > 0:
        n += 1
        x >>= 1
    return n


# ==========================================================================
# Vorbis custom float (32-bit: 21-bit mantissa, 10-bit exponent biased
# 788, sign)
# ==========================================================================
def float32_unpack(x: int) -> float:
    mantissa = x & 0x1FFFFF
    sign = -1.0 if x & 0x80000000 else 1.0
    exponent = (x & 0x7FE00000) >> 21
    return sign * mantissa * (2.0 ** (exponent - 788))


def float32_pack(v: float) -> int:
    """Inverse of float32_unpack (nearest representable)."""
    if v == 0.0:
        return 0
    sign = 0x80000000 if v < 0 else 0
    v = abs(v)
    exponent = 788
    # scale mantissa into [2^20, 2^21)
    while v < (1 << 20) and exponent > 0:
        v *= 2.0
        exponent -= 1
    while v >= (1 << 21) and exponent < 1023:
        v /= 2.0
        exponent += 1
    m = int(round(v))
    if m >= (1 << 21):
        # v in [2^21 - 0.5, 2^21) rounds up past the mantissa width:
        # renormalize instead of letting the field mask wrap it to 0
        m >>= 1
        exponent += 1
    return sign | (exponent << 21) | m


# ==========================================================================
# Huffman codeword assignment — the spec's "lowest valued unused
# codeword of the required length" rule, via an explicit binary trie
# (books here are small; clarity over speed)
# ==========================================================================
def assign_codewords(lengths: list[int]) -> list[int | None]:
    """entry lengths (0 = unused) → codeword ints (MSB-first semantics),
    or None for unused entries. Raises VorbisError on an over-specified
    tree (the spec's invalid-codebook condition)."""
    # trie nodes: dict id -> [child0, child1, full]; id 0 = root
    nodes: list[list] = [[None, None, False]]

    def alloc(length: int) -> int:
        # DFS preferring the 0 branch → lowest-valued codeword
        def walk(nid: int, depth: int, prefix: int):
            node = nodes[nid]
            if node[2]:
                return None
            if depth == length:
                if node[0] is None and node[1] is None:
                    node[2] = True
                    return prefix
                return None
            for b in (0, 1):
                if node[b] is None:
                    nodes.append([None, None, False])
                    node[b] = len(nodes) - 1
                r = walk(node[b], depth + 1, (prefix << 1) | b)
                if r is not None:
                    return r
            return None

        r = walk(0, 0, 0)
        if r is None:
            raise VorbisError("over-specified Huffman codebook")
        # mark fully-used subtrees so later allocations skip them
        def sweep(nid: int) -> bool:
            node = nodes[nid]
            if node[2]:
                return True
            if node[0] is not None and node[1] is not None \
                    and sweep(node[0]) and sweep(node[1]):
                node[2] = True
                return True
            return False

        sweep(0)
        return r

    return [alloc(l) if l > 0 else None for l in lengths]


class Codebook:
    """Decoded codebook: Huffman decode map + optional VQ value table."""

    def __init__(self, dimensions: int, entries: int, lengths: list[int],
                 lookup_type: int = 0, minimum: float = 0.0,
                 delta: float = 0.0, value_bits: int = 0,
                 sequence_p: int = 0,
                 multiplicands: list[int] | None = None):
        self.dimensions = dimensions
        self.entries = entries
        self.lengths = lengths
        self.lookup_type = lookup_type
        self.minimum = minimum
        self.delta = delta
        self.value_bits = value_bits
        self.sequence_p = sequence_p
        self.multiplicands = multiplicands or []
        codes = assign_codewords(lengths)
        self.codes = codes
        self._dec = {(lengths[i], codes[i]): i
                     for i in range(entries) if lengths[i] > 0}
        # LSB-first-packed form of each MSB-first codeword: writing the
        # bit-reversed word in one BitWriter.write call emits the same
        # bits as an MSB-first per-bit loop (the encoder hot path)
        self.codes_rev = [
            None if codes[i] is None else
            int(format(codes[i], f"0{lengths[i]}b")[::-1], 2)
            for i in range(entries)]
        # uniform complete books (every length L, entries == 2^L) admit
        # an O(1) decode: L bits read LSB-first ARE the bit-reversed
        # codeword, a bijection onto entries — table-invert it once
        self._uniform = 0
        self._rev_table: list[int] = []
        if entries and all(l == lengths[0] for l in lengths) \
                and entries == (1 << lengths[0]):
            self._uniform = lengths[0]
            self._rev_table = [0] * entries
            for e, rv in enumerate(self.codes_rev):
                self._rev_table[rv] = e
        self.values = None
        if lookup_type in (1, 2):
            self.values = self._build_values()
        elif lookup_type != 0:
            raise VorbisError(f"reserved lookup type {lookup_type}")

    # ---- VQ value table (spec lookup 1 lattice / 2 explicit) ----
    def _lookup1_values(self) -> int:
        n = 0
        while (n + 1) ** self.dimensions <= self.entries:
            n += 1
        return n

    def _build_values(self) -> np.ndarray:
        mult = np.asarray(self.multiplicands, dtype=np.float64)
        vals = np.empty((self.entries, self.dimensions), dtype=np.float64)
        if self.lookup_type == 1:
            count = self._lookup1_values()
            if len(mult) < count:
                raise VorbisError("codebook lookup-1 multiplicands short")
            for e in range(self.entries):
                last = 0.0
                idiv = 1
                for d in range(self.dimensions):
                    off = (e // idiv) % count
                    v = mult[off] * self.delta + self.minimum + last
                    vals[e, d] = v
                    if self.sequence_p:
                        last = v
                    idiv *= count
        else:
            if len(mult) < self.entries * self.dimensions:
                raise VorbisError("codebook lookup-2 multiplicands short")
            for e in range(self.entries):
                last = 0.0
                for d in range(self.dimensions):
                    v = mult[e * self.dimensions + d] * self.delta \
                        + self.minimum + last
                    vals[e, d] = v
                    if self.sequence_p:
                        last = v
        return vals

    # ---- scalar Huffman decode ----
    def decode_scalar(self, br: BitReader) -> int:
        if self._uniform:
            return self._rev_table[br.read(self._uniform)]
        code = 0
        for length in range(1, 33):
            code = (code << 1) | br.read1()
            hit = self._dec.get((length, code))
            if hit is not None:
                return hit
        raise VorbisError("codeword longer than 32 bits")

    def decode_vector(self, br: BitReader) -> np.ndarray:
        if self.values is None:
            raise VorbisError("VQ decode from a scalar-only codebook")
        return self.values[self.decode_scalar(br)]

    # ---- serialization (setup header) ----
    def pack(self, bw: BitWriter) -> None:
        bw.write(0x564342, 24)
        bw.write(self.dimensions, 16)
        bw.write(self.entries, 24)
        bw.write(0, 1)   # unordered
        bw.write(0, 1)   # non-sparse
        for l in self.lengths:
            bw.write(l - 1, 5)
        bw.write(self.lookup_type, 4)
        if self.lookup_type in (1, 2):
            bw.write(float32_pack(self.minimum), 32)
            bw.write(float32_pack(self.delta), 32)
            bw.write(self.value_bits - 1, 4)
            bw.write(self.sequence_p, 1)
            for m in self.multiplicands:
                bw.write(m, self.value_bits)

    @classmethod
    def unpack(cls, br: BitReader) -> "Codebook":
        if br.read(24) != 0x564342:
            raise VorbisError("codebook sync lost")
        dims = br.read(16)
        entries = br.read(24)
        if dims == 0 or entries == 0 or dims * entries > (1 << 22):
            raise VorbisError("codebook too large for this decoder")
        ordered = br.read1()
        lengths: list[int] = []
        if not ordered:
            sparse = br.read1()
            for _ in range(entries):
                if sparse:
                    if br.read1():
                        lengths.append(br.read(5) + 1)
                    else:
                        lengths.append(0)
                else:
                    lengths.append(br.read(5) + 1)
        else:
            cur_len = br.read(5) + 1
            n = 0
            while n < entries:
                num = br.read(ilog(entries - n))
                lengths.extend([cur_len] * num)
                n += num
                cur_len += 1
                if cur_len > 32:
                    raise VorbisError("ordered codebook lengths overflow")
        lookup = br.read(4)
        minimum = delta = 0.0
        value_bits = 0
        seq = 0
        mult: list[int] = []
        if lookup in (1, 2):
            minimum = float32_unpack(br.read(32))
            delta = float32_unpack(br.read(32))
            value_bits = br.read(4) + 1
            seq = br.read1()
            book = cls.__new__(cls)  # temp for lookup1_values calc
            book.dimensions = dims
            book.entries = entries
            count = book._lookup1_values() if lookup == 1 \
                else entries * dims
            mult = [br.read(value_bits) for _ in range(count)]
        elif lookup != 0:
            raise VorbisError(f"reserved lookup type {lookup}")
        return cls(dims, entries, lengths, lookup, minimum, delta,
                   value_bits, seq, mult)


# ==========================================================================
# floor 1 (zero-partition subset is what the encoder emits; the decoder
# handles the general post list with the spec's render_line math)
# ==========================================================================
_FLOOR1_RANGES = (256, 128, 86, 64)


def _floor1_db_table() -> np.ndarray:
    """256-entry amplitude ladder, geometric between the normative
    endpoints (Vorbis I spec §10: 1.0649863e-07 … 0.9921257)."""
    lo, hi = 1.0649863e-07, 0.9921257
    i = np.arange(256, dtype=np.float64)
    return lo * (hi / lo) ** (i / 255.0)


FLOOR1_DB = _floor1_db_table()


def render_line(x0: int, y0: int, x1: int, y1: int, out: np.ndarray) -> None:
    """Spec render_line: integer Bresenham in dB-index space over
    [x0, min(x1, len(out)))."""
    dy = y1 - y0
    adx = x1 - x0
    base = dy // adx if dy >= 0 else -((-dy) // adx)
    ady = abs(dy) - abs(base) * adx
    x_end = min(x1, len(out))
    y = y0
    err = 0
    sy = base + (1 if dy >= 0 else -1)
    if x0 < len(out):
        out[x0] = y0
    for x in range(x0 + 1, x_end):
        err += ady
        if err >= adx:
            err -= adx
            y += sy
        else:
            y += base
        out[x] = y


class Floor1:
    def __init__(self, multiplier: int, rangebits: int,
                 x_list: list[int], partitions: int = 0,
                 class_list: list[int] | None = None,
                 class_dims: list[int] | None = None):
        self.multiplier = multiplier
        self.rangebits = rangebits
        self.x_list = x_list
        self.partitions = partitions
        self.class_list = class_list or []
        self.class_dims = class_dims or []

    def pack(self, bw: BitWriter) -> None:
        if self.partitions != 0:
            raise VorbisError("encoder emits zero-partition floors only")
        bw.write(0, 5)                    # floor1_partitions
        bw.write(self.multiplier - 1, 2)
        bw.write(self.rangebits, 4)

    @classmethod
    def unpack(cls, br: BitReader) -> "Floor1":
        partitions = br.read(5)
        class_list = [br.read(4) for _ in range(partitions)]
        max_class = max(class_list) if class_list else -1
        class_dims = []
        for _ in range(max_class + 1):
            dim = br.read(3) + 1
            sub = br.read(2)
            if sub:
                br.read(8)  # masterbook (unused in flat decode subset)
            for _ in range(1 << sub):
                br.read(8)  # subclass books
            class_dims.append(dim)
            if sub:
                raise VorbisError(
                    "floor1 subclasses unsupported by this decoder "
                    "subset (encoder never emits them)")
        multiplier = br.read(2) + 1
        rangebits = br.read(4)
        x_list = [0, 1 << rangebits]
        for i in range(partitions):
            for _ in range(class_dims[class_list[i]]):
                x_list.append(br.read(rangebits))
        if len(set(x_list)) != len(x_list):
            raise VorbisError("floor1 X list has duplicates")
        return cls(multiplier, rangebits, x_list, partitions, class_list,
                   class_dims)

    # ---- per-packet ----
    def write_posts(self, bw: BitWriter, y0: int, y1: int) -> None:
        rng = _FLOOR1_RANGES[self.multiplier - 1]
        bw.write(1, 1)  # nonzero
        bits = ilog(rng - 1)
        bw.write(y0, bits)
        bw.write(y1, bits)

    def decode_curve(self, br: BitReader, n2: int) -> np.ndarray | None:
        """Returns the floor amplitude curve over [0, n2), or None when
        the channel's floor is flagged empty."""
        if not br.read1():
            return None
        rng = _FLOOR1_RANGES[self.multiplier - 1]
        bits = ilog(rng - 1)
        ys = [br.read(bits), br.read(bits)]
        if self.partitions:
            raise VorbisError("nonzero floor1 partitions in packet "
                              "(outside the encoder subset)")
        idx = np.zeros(n2, dtype=np.int64)
        render_line(0, ys[0] * self.multiplier,
                    self.x_list[1], ys[1] * self.multiplier, idx)
        np.clip(idx, 0, 255, out=idx)
        return FLOOR1_DB[idx]


# ==========================================================================
# residue type 2 (single interleaved vector, format-1 body)
# ==========================================================================
class Residue2:
    def __init__(self, begin: int, end: int, partition_size: int,
                 classifications: int, classbook: int,
                 class_books: list[list[int | None]]):
        self.begin = begin
        self.end = end
        self.partition_size = partition_size
        self.classifications = classifications
        self.classbook = classbook
        self.class_books = class_books  # [cls][pass] -> book index | None

    def pack(self, bw: BitWriter) -> None:
        bw.write(self.begin, 24)
        bw.write(self.end, 24)
        bw.write(self.partition_size - 1, 24)
        bw.write(self.classifications - 1, 6)
        bw.write(self.classbook, 8)
        for books in self.class_books:
            bitmap = 0
            for p, b in enumerate(books):
                if b is not None:
                    bitmap |= 1 << p
            bw.write(bitmap & 7, 3)
            if bitmap > 7:
                bw.write(1, 1)
                bw.write(bitmap >> 3, 5)
            else:
                bw.write(0, 1)
        for books in self.class_books:
            for b in books:
                if b is not None:
                    bw.write(b, 8)

    @classmethod
    def unpack(cls, br: BitReader) -> "Residue2":
        begin = br.read(24)
        end = br.read(24)
        psize = br.read(24) + 1
        ncls = br.read(6) + 1
        classbook = br.read(8)
        bitmaps = []
        for _ in range(ncls):
            low = br.read(3)
            if br.read1():
                low |= br.read(5) << 3
            bitmaps.append(low)
        class_books: list[list[int | None]] = []
        for bm in bitmaps:
            books: list[int | None] = []
            for p in range(8):
                books.append(br.read(8) if (bm >> p) & 1 else None)
            class_books.append(books)
        return cls(begin, end, psize, ncls, classbook, class_books)

    def decode(self, br: BitReader, books: list[Codebook],
               n_out: int) -> np.ndarray:
        v = np.zeros(n_out, dtype=np.float64)
        if self.classbook >= len(books):
            raise VorbisError("residue classbook index out of range")
        for bl in self.class_books:
            for b in bl:
                if b is not None and b >= len(books):
                    raise VorbisError("residue book index out of range")
        cb = books[self.classbook]
        end = min(self.end, n_out)
        n_read = end - self.begin
        if n_read <= 0:
            return v
        n_part = n_read // self.partition_size
        classes = np.zeros(n_part + cb.dimensions, dtype=np.int64)
        for p_pass in range(8):
            # pass 0 always runs (it carries the classwords); later
            # passes only when some class has a book there
            if p_pass > 0 and not any(bl[p_pass] is not None
                                      for bl in self.class_books):
                continue
            i = 0
            while i < n_part:
                if p_pass == 0:
                    cw = cb.decode_scalar(br)
                    for j in range(cb.dimensions - 1, -1, -1):
                        classes[i + j] = cw % self.classifications
                        cw //= self.classifications
                for _j in range(cb.dimensions):
                    if i >= n_part:
                        break
                    book_idx = self.class_books[classes[i]][p_pass]
                    if book_idx is not None:
                        book = books[book_idx]
                        off = self.begin + i * self.partition_size
                        if book._uniform and book.dimensions == 1 \
                                and book.values is not None:
                            # bulk path: a partition's codes are one
                            # contiguous fixed-width bit run
                            L = book._uniform
                            ps = self.partition_size
                            raw = br.read(L * ps)
                            mask = (1 << L) - 1
                            rt = book._rev_table
                            ents = [rt[(raw >> (L * t)) & mask]
                                    for t in range(ps)]
                            v[off: off + ps] += book.values[ents, 0]
                        else:
                            k = 0
                            while k < self.partition_size:
                                vec = book.decode_vector(br)
                                v[off + k: off + k + book.dimensions] \
                                    += vec
                                k += book.dimensions
                    i += 1
        return v


# ==========================================================================
# MDCT / window
# ==========================================================================
def vorbis_window(n: int) -> np.ndarray:
    j = np.arange(n, dtype=np.float64)
    return np.sin(0.5 * np.pi
                  * np.sin(np.pi * (j + 0.5) / n) ** 2)


def _mdct_basis(n: int) -> np.ndarray:
    """cos( pi/(2n) * (2j+1+n/2) * (2k+1) ), shape (n/2, n)."""
    j = np.arange(n, dtype=np.float64)
    k = np.arange(n // 2, dtype=np.float64)
    return np.cos(np.pi / (2 * n)
                  * np.outer(2 * k + 1, 2 * j + 1 + n / 2))


_BASIS_CACHE: dict[int, np.ndarray] = {}


def _basis(n: int) -> np.ndarray:
    b = _BASIS_CACHE.get(n)
    if b is None:
        b = _BASIS_CACHE[n] = _mdct_basis(n)
    return b


def mdct_forward(frame: np.ndarray) -> np.ndarray:
    """Windowed frame (length n) → n/2 coefficients, scaled so the spec
    IMDCT + overlap-add reconstructs exactly (verified by the TDAC
    round-trip test)."""
    n = len(frame)
    return (4.0 / n) * (_basis(n) @ frame)


def imdct(coeffs: np.ndarray) -> np.ndarray:
    """Spec IMDCT: n/2 coefficients → n time samples (pre-window)."""
    n = 2 * len(coeffs)
    return _basis(n).T @ coeffs


# ==========================================================================
# stream-level encode / decode
# ==========================================================================
_BLOCKSIZE = 512


def _ident_packet(channels: int, rate: int, blocksize: int) -> bytes:
    lg = blocksize.bit_length() - 1
    return (b"\x01vorbis" + struct.pack("<I", 0) + bytes([channels])
            + struct.pack("<I", rate) + struct.pack("<iii", 0, 0, 0)
            + bytes([lg | (lg << 4)]) + b"\x01")


def _comment_packet(vendor: bytes = b"mycelium-ray vorbis") -> bytes:
    return (b"\x03vorbis" + struct.pack("<I", len(vendor)) + vendor
            + struct.pack("<I", 0) + b"\x01")


def _make_books(channels: int, blocksize: int):
    n2 = blocksize // 2
    classbook = Codebook(dimensions=2, entries=4, lengths=[2, 2, 2, 2])
    levels = 256
    # level k → minimum + k*delta, centered so k=128 is EXACTLY zero
    # (class-0 "uncoded partition" then really means silence). Both
    # constants round-trip through the wire float format here so the
    # encoder quantizes against the decoder's exact values.
    delta = float32_unpack(float32_pack(2.0 / (levels - 2)))
    minimum = float32_unpack(float32_pack(-delta * (levels // 2)))
    value_book = Codebook(
        dimensions=1, entries=levels, lengths=[8] * levels,
        lookup_type=1, minimum=minimum,
        delta=delta, value_bits=8, sequence_p=0,
        multiplicands=list(range(levels)))
    # refinement book (cascade pass 1): 32 levels spanning one coarse
    # step, so the two-pass sum quantizes at ~13 bits — this is what
    # lifts spectrally flat frames (clip edges) past the 40 dB bar
    fine_levels = 32
    fdelta = float32_unpack(float32_pack(delta / (fine_levels - 1)))
    fmin = float32_unpack(float32_pack(-fdelta * (fine_levels // 2)))
    fine_book = Codebook(
        dimensions=1, entries=fine_levels, lengths=[5] * fine_levels,
        lookup_type=1, minimum=fmin, delta=fdelta, value_bits=8,
        sequence_p=0, multiplicands=list(range(fine_levels)))
    floor = Floor1(multiplier=1, rangebits=ilog(n2 - 1),
                   x_list=[0, 1 << ilog(n2 - 1)])
    residue = Residue2(begin=0, end=n2 * channels, partition_size=16,
                       classifications=2, classbook=0,
                       class_books=[[None] * 8,
                                    [1, 2] + [None] * 6])
    return [classbook, value_book, fine_book], floor, residue


def _setup_packet(books, floor: Floor1, residue: Residue2) -> bytes:
    bw = BitWriter()
    for b in b"\x05vorbis":
        bw.write(b, 8)
    bw.write(len(books) - 1, 8)
    for b in books:
        b.pack(bw)
    bw.write(0, 6)     # time_count - 1
    bw.write(0, 16)    # time transform 0
    bw.write(0, 6)     # floor_count - 1
    bw.write(1, 16)    # floor type 1
    floor.pack(bw)
    bw.write(0, 6)     # residue_count - 1
    bw.write(2, 16)    # residue type 2
    residue.pack(bw)
    bw.write(0, 6)     # mapping_count - 1
    bw.write(0, 16)    # mapping type 0
    bw.write(0, 1)     # no submaps flag
    bw.write(0, 1)     # no coupling flag
    bw.write(0, 2)     # reserved
    bw.write(0, 8)     # submap time config (placeholder)
    bw.write(0, 8)     # floor number
    bw.write(0, 8)     # residue number
    bw.write(0, 6)     # mode_count - 1
    bw.write(0, 1)     # mode blockflag
    bw.write(0, 16)    # window type
    bw.write(0, 16)    # transform type
    bw.write(0, 8)     # mapping number
    bw.write(1, 1)     # framing
    return bw.bytes()


def encode_vorbis(samples: np.ndarray, sample_rate: int,
                  serial: int = 1) -> bytes:
    """float samples in [-1, 1] (shape (n,) or (n, ch), ch ≤ 2) or int16
    → Ogg Vorbis bytes."""
    from .audiometa import _ogg_page
    x = np.asarray(samples)
    if x.dtype.kind in "iu":
        x = x.astype(np.float64) / 32768.0
    else:
        x = x.astype(np.float64)
    if x.ndim == 1:
        x = x[:, None]
    n_samp, channels = x.shape
    if channels > 2:
        raise VorbisError("encoder supports mono/stereo only")
    n = _BLOCKSIZE
    h = n // 2
    books, floor, residue = _make_books(channels, n)
    win = vorbis_window(n)
    value_book = books[1]
    levels = value_book.entries
    vq = value_book.values[:, 0]          # decoder-exact level values
    n_frames = max(1, -(-n_samp // h)) + 1
    pad = np.zeros((h, channels))
    xp = np.concatenate(
        [pad, x, np.zeros(((n_frames + 1) * h - n_samp - h, channels))])

    pages = [
        _ogg_page(serial, 0, 0, 0x02, _ident_packet(channels,
                                                    sample_rate, n)),
        _ogg_page(serial, 1, 0, 0x00, _comment_packet()),
        _ogg_page(serial, 2, 0, 0x00, _setup_packet(books, floor,
                                                    residue)),
    ]
    seq = 3
    f_max = FLOOR1_DB[255]
    for fidx in range(n_frames):
        frame = xp[fidx * h: fidx * h + n]
        coeffs = np.stack([mdct_forward(frame[:, c] * win)
                           for c in range(channels)])  # (ch, n/2)
        bw = BitWriter()
        bw.write(0, 1)          # audio packet
        # mode number: ilog(0) = 0 bits
        peak = float(np.abs(coeffs).max())
        if peak == 0.0:
            for _ in range(channels):
                bw.write(0, 1)  # zero floor → silent channel
        else:
            # flat floor at the smallest table amplitude ≥ peak
            y = int(np.searchsorted(FLOOR1_DB, min(peak, f_max)))
            y = min(y, 255)
            fval = FLOOR1_DB[y]
            for _ in range(channels):
                floor.write_posts(bw, y, y)
            r = coeffs / fval  # |r| ≤ 1 (≤ f_max clip is negligible)
            inter = np.empty(r.shape[1] * channels)
            for c in range(channels):
                inter[c::channels] = r[c]
            q = np.clip(np.rint((inter - value_book.minimum)
                                / value_book.delta),
                        0, levels - 1).astype(np.int64)
            n_part = len(inter) // residue.partition_size
            cls = np.ones(n_part, dtype=np.int64)
            # class 0 (uncoded partition) only for EXACT silence — the
            # decoder contributes zeros there, so the round trip stays
            # lossless for silent regions
            for i in range(n_part):
                sl = inter[i * residue.partition_size:
                           (i + 1) * residue.partition_size]
                if not np.any(sl):
                    cls[i] = 0
            # cascade pass 1: refine the coarse quantization error with
            # the fine book (decoder SUMS the two passes)
            fine_book = books[2]
            resid = inter - (value_book.minimum
                             + q * value_book.delta)
            q2 = np.clip(np.rint((resid - fine_book.minimum)
                                 / fine_book.delta),
                         0, fine_book.entries - 1).astype(np.int64)
            cb = books[0]
            ps = residue.partition_size
            # pass 0: classwords + coarse values (spec bit order: each
            # pass is a full sweep over the partitions)
            i = 0
            while i < n_part:
                cw = 0
                for j in range(cb.dimensions):
                    c = cls[i + j] if i + j < n_part else 0
                    cw = cw * residue.classifications + c
                bw.write(cb.codes_rev[cw], cb.lengths[cw])
                for j in range(cb.dimensions):
                    if i >= n_part:
                        break
                    if cls[i] == 1:
                        vrev = value_book.codes_rev
                        vlen = value_book.lengths
                        for e in q[i * ps:(i + 1) * ps]:
                            bw.write(vrev[e], vlen[e])
                    i += 1
            # pass 1: fine values for coded partitions (no classwords)
            frev = fine_book.codes_rev
            flen = fine_book.lengths
            for i in range(n_part):
                if cls[i] == 1:
                    for e in q2[i * ps:(i + 1) * ps]:
                        bw.write(frev[e], flen[e])
        # packet j (j ≥ 1) completes j*h output samples; packet 0 only
        # primes the overlap. The EOS page carries the true length.
        granule = min(fidx * h, n_samp)
        htype = 0x04 if fidx == n_frames - 1 else 0x00
        if fidx == n_frames - 1:
            granule = n_samp
        pages.append(_ogg_page(serial, seq, granule, htype, bw.bytes()))
        seq += 1
    return b"".join(pages)


def decode_vorbis(data: bytes):
    """Ogg Vorbis bytes → (sample_rate, channels, float64 samples
    (n, ch)). Implements the Vorbis I decode path for the header
    features the encoder subset uses; anything outside it raises
    VorbisError (typed, never a crash)."""
    from .audiometa import AudioMetaError, _ogg_packets
    try:
        pkts = _ogg_packets(data)
    except AudioMetaError as e:
        raise VorbisError(str(e)) from e
    if len(pkts) < 3 or not pkts[0].startswith(b"\x01vorbis"):
        raise VorbisError("not an Ogg Vorbis stream")
    ident = pkts[0]
    if len(ident) < 30:
        raise VorbisError("truncated identification header")
    if struct.unpack("<I", ident[7:11])[0] != 0:
        raise VorbisError("unknown Vorbis version")
    channels = ident[11]
    rate = struct.unpack("<I", ident[12:16])[0]
    bs_byte = ident[28]
    bs0, bs1 = 1 << (bs_byte & 0x0F), 1 << (bs_byte >> 4)
    if channels == 0 or rate == 0 or bs0 > bs1 \
            or not 64 <= bs0 <= 8192 or not 64 <= bs1 <= 8192:
        raise VorbisError("invalid identification header")
    if bs1 > 2048 or channels > 8:
        # legal Vorbis, outside this decoder subset — bounds the IMDCT
        # basis/work arrays a corrupt header could otherwise demand
        raise VorbisError("blocksize/channel count beyond decoder subset")
    if not pkts[1].startswith(b"\x03vorbis"):
        raise VorbisError("missing comment header")
    setup = pkts[2]
    if not setup.startswith(b"\x05vorbis"):
        raise VorbisError("missing setup header")
    br = BitReader(setup[7:])
    n_books = br.read(8) + 1
    books = [Codebook.unpack(br) for _ in range(n_books)]
    n_times = br.read(6) + 1
    for _ in range(n_times):
        if br.read(16) != 0:
            raise VorbisError("nonzero time transform")
    n_floors = br.read(6) + 1
    floors = []
    for _ in range(n_floors):
        ftype = br.read(16)
        if ftype != 1:
            raise VorbisError(f"floor type {ftype} unsupported "
                              "(encoder subset is floor 1)")
        floors.append(Floor1.unpack(br))
    n_res = br.read(6) + 1
    residues = []
    for _ in range(n_res):
        rtype = br.read(16)
        if rtype != 2:
            raise VorbisError(f"residue type {rtype} unsupported "
                              "(encoder subset is residue 2)")
        residues.append(Residue2.unpack(br))
    n_maps = br.read(6) + 1
    mappings = []
    for _ in range(n_maps):
        if br.read(16) != 0:
            raise VorbisError("nonzero mapping type")
        submaps = br.read1() and (br.read(4) + 1) or 1
        if br.read1():
            raise VorbisError("channel coupling unsupported "
                              "(encoder subset emits none)")
        if br.read(2):
            raise VorbisError("mapping reserved bits set")
        if submaps > 1:
            raise VorbisError("multiple submaps unsupported")
        br.read(8)
        floor_n = br.read(8)
        res_n = br.read(8)
        if floor_n >= n_floors or res_n >= n_res:
            raise VorbisError("mapping references a missing floor/residue")
        mappings.append((floor_n, res_n))
    n_modes = br.read(6) + 1
    modes = []
    for _ in range(n_modes):
        blockflag = br.read1()
        if br.read(16) or br.read(16):
            raise VorbisError("nonzero window/transform type")
        mapping = br.read(8)
        if mapping >= n_maps:
            raise VorbisError("mode references a missing mapping")
        modes.append((blockflag, mapping))
    if not br.read1():
        raise VorbisError("setup framing bit unset")

    n = bs0
    n2 = n // 2
    win = vorbis_window(n)
    halves = None   # previous right half per channel, post-window
    out: list[np.ndarray] = []
    final_granule = None
    # granule of the last page: re-scan pages for trimming
    pos = 0
    while pos + 27 <= len(data):
        g = struct.unpack("<q", data[pos + 6:pos + 14])[0]
        nsegs = data[pos + 26]
        body = sum(data[pos + 27:pos + 27 + nsegs])
        if data[pos + 5] & 0x04 or pos + 27 + nsegs + body >= len(data):
            final_granule = g
        pos += 27 + nsegs + body

    for pkt in pkts[3:]:
        pr = BitReader(pkt)
        if pr.read1():
            raise VorbisError("header packet in audio stream")
        mode_bits = ilog(len(modes) - 1)
        blockflag, mapping = modes[pr.read(mode_bits) if mode_bits else 0]
        if blockflag:
            raise VorbisError("long blocks unsupported "
                              "(encoder subset is single-blocksize)")
        floor_n, res_n = mappings[mapping]
        floor = floors[floor_n]
        residue = residues[res_n]
        curves = [floor.decode_curve(pr, n2) for _ in range(channels)]
        if any(c is not None for c in curves):
            vec = residue.decode(pr, books, n2 * channels)
            chans = []
            for c in range(channels):
                r = vec[c::channels]
                f = curves[c]
                chans.append(r * f if f is not None else np.zeros(n2))
        else:
            chans = [np.zeros(n2) for _ in range(channels)]
        rights = []
        cols = []
        for c in range(channels):
            t = imdct(np.asarray(chans[c])) * win
            left, right = t[:n2], t[n2:]
            if halves is not None:
                cols.append(halves[c] + left)
            rights.append(right)
        if halves is not None and cols:
            out.append(np.stack(cols, axis=1))
        halves = rights
    samples = (np.concatenate(out, axis=0) if out
               else np.zeros((0, channels)))
    if final_granule is not None and 0 <= final_granule < len(samples):
        samples = samples[:final_granule]
    return rate, channels, samples


def decode_ogg_vorbis_int16(data: bytes):
    """(sample_rate, channels, int16 samples (n, ch)) — the shape the
    audio stages consume (matches decode_ogg_flac's contract)."""
    rate, ch, x = decode_vorbis(data)
    return rate, ch, np.clip(np.rint(x * 32768.0),
                             -32768, 32767).astype(np.int16)
