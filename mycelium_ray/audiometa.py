"""From-scratch audio container METADATA probing: WAV, FLAC, Ogg, MP3.

A training-data pipeline triages audio corpora by container metadata
(duration, sample rate, channels) long before it decodes samples — and
metadata needs only the container layer, which is fully implementable
from the public specs even where the codec layer (mp3 synthesis
filterbank, vorbis/opus transforms) is out of scope without ffmpeg:

- **WAV**: RIFF 'WAVE' fmt/data chunk walk.
- **FLAC**: the STREAMINFO metadata block (RFC 9639 §8.2) — sample
  rate / channels / total samples live in the first 34 bytes of
  metadata; no frame decode needed.
- **Ogg** (RFC 3533): page-structure walk with the Ogg CRC-32
  (polynomial 0x04c11db7, unreflected, zero init — distinct from zlib's)
  verified per page; codec identified from the BOS packet (Vorbis
  identification header / OpusHead), duration from the last page's
  granule position (PCM samples for Vorbis; 48 kHz ticks minus pre-skip
  for Opus, per RFC 7845 §4).
- **MP3** (MPEG-1/2/2.5 audio, layer III): optional ID3v2 skip
  (synchsafe size), then a frame-header walk — version/layer/bitrate/
  samplerate indices give each frame's byte length and sample count
  (1152 samples per MPEG-1 frame, 576 for MPEG-2/2.5), summed to an
  exact duration for CBR and VBR alike.

``probe_audio`` dispatches on magic. The skeleton writers at the bottom
generate structurally-valid containers (correct framing, CRCs, headers;
placeholder codec payloads) for tests and the derived metadata corpus —
they are fixtures, not encoders.

Reference parity: the reference crawler types content but has no audio
path; this is build-brief multimodal coverage (the decode-level FLAC/WAV
path lives in flac.py / stages/media.py).
"""

from __future__ import annotations

import struct
from dataclasses import dataclass

__all__ = ["AudioMeta", "AudioMetaError", "probe_audio",
           "ogg_crc", "write_ogg_vorbis_skeleton",
           "write_ogg_opus_skeleton", "write_mp3_skeleton",
           "write_flac_streaminfo_skeleton", "write_wav_skeleton"]


class AudioMetaError(ValueError):
    pass


@dataclass(frozen=True)
class AudioMeta:
    fmt: str            # wav | flac | ogg-vorbis | ogg-opus | ogg-flac | mp3
    sample_rate: int
    channels: int
    duration_ms: int    # -1 when indeterminable
    n_units: int        # samples (wav/flac/ogg) or frames (mp3)


# ==========================================================================
# WAV
# ==========================================================================
def _probe_wav(data: bytes) -> AudioMeta:
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise AudioMetaError("not RIFF/WAVE")
    pos, n = 12, len(data)
    sr = ch = bits = 0
    data_len = -1
    while pos + 8 <= n:
        tag = data[pos:pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4:pos + 8])
        body = pos + 8
        if tag == b"fmt " and size >= 16:
            ch, sr = struct.unpack("<HI", data[body + 2:body + 8])
            (bits,) = struct.unpack("<H", data[body + 14:body + 16])
        elif tag == b"data":
            data_len = size
        pos = body + size + (size % 2)
    if not sr or not ch or not bits:
        raise AudioMetaError("WAV missing fmt chunk")
    if data_len < 0:
        raise AudioMetaError("WAV missing data chunk")
    n_samples = data_len // (ch * (bits // 8 or 1))
    return AudioMeta("wav", sr, ch, n_samples * 1000 // sr, n_samples)


# ==========================================================================
# FLAC STREAMINFO
# ==========================================================================
def _probe_flac(data: bytes) -> AudioMeta:
    if data[:4] != b"fLaC":
        raise AudioMetaError("not FLAC")
    pos = 4
    while pos + 4 <= len(data):
        hdr = data[pos]
        btype = hdr & 0x7F
        (size,) = struct.unpack(">I", b"\x00" + data[pos + 1:pos + 4])
        body = data[pos + 4:pos + 4 + size]
        if btype == 0:  # STREAMINFO
            if len(body) < 18:
                raise AudioMetaError("short STREAMINFO")
            # bytes 10..17: sr(20) ch(3) bps(5) total_samples(36)
            bits = int.from_bytes(body[10:18], "big")
            sr = bits >> 44
            ch = ((bits >> 41) & 0x7) + 1
            total = bits & ((1 << 36) - 1)
            if not sr:
                raise AudioMetaError("STREAMINFO sample rate 0")
            dur = total * 1000 // sr if total else -1
            return AudioMeta("flac", sr, ch, dur, total)
        if hdr & 0x80:  # last-metadata-block flag
            break
        pos += 4 + size
    raise AudioMetaError("FLAC missing STREAMINFO")


# ==========================================================================
# Ogg (RFC 3533)
# ==========================================================================
_OGG_POLY = 0x04C11DB7
_OGG_TABLE = []


def _ogg_table():
    if not _OGG_TABLE:
        for i in range(256):
            r = i << 24
            for _ in range(8):
                r = ((r << 1) ^ _OGG_POLY) if r & 0x80000000 else (r << 1)
                r &= 0xFFFFFFFF
            _OGG_TABLE.append(r)
    return _OGG_TABLE


def ogg_crc(data: bytes) -> int:
    """The Ogg page CRC-32: poly 0x04c11db7, no reflection, init 0,
    no final xor (RFC 3533 §6 note) — NOT zlib.crc32."""
    tbl = _ogg_table()
    crc = 0
    for b in data:
        crc = ((crc << 8) & 0xFFFFFFFF) ^ tbl[((crc >> 24) & 0xFF) ^ b]
    return crc


def _probe_ogg(data: bytes) -> AudioMeta:
    if data[:4] != b"OggS":
        raise AudioMetaError("not Ogg")
    pos, n = 0, len(data)
    fmt = None
    sr = ch = 0
    pre_skip = 0
    last_granule = 0
    saw_page = False
    while pos + 27 <= n:
        if data[pos:pos + 4] != b"OggS":
            raise AudioMetaError("lost Ogg page sync")
        (ver, htype) = data[pos + 4], data[pos + 5]
        if ver != 0:
            raise AudioMetaError(f"Ogg version {ver}")
        (granule,) = struct.unpack("<q", data[pos + 6:pos + 14])
        nsegs = data[pos + 26]
        seg_table = data[pos + 27:pos + 27 + nsegs]
        if len(seg_table) < nsegs:
            raise AudioMetaError("truncated Ogg segment table")
        body0 = pos + 27 + nsegs
        body_len = sum(seg_table)
        if body0 + body_len > n:
            raise AudioMetaError("truncated Ogg page body")
        # CRC check: stored field zeroed during computation
        page = bytearray(data[pos:body0 + body_len])
        stored = struct.unpack("<I", page[22:26])[0]
        page[22:26] = b"\x00\x00\x00\x00"
        if ogg_crc(bytes(page)) != stored:
            raise AudioMetaError("Ogg page CRC mismatch")
        body = data[body0:body0 + body_len]
        if htype & 0x02:  # BOS: identify the codec from the first packet
            if body.startswith(b"\x01vorbis") and len(body) >= 30:
                fmt = "ogg-vorbis"
                ch = body[11]
                (sr,) = struct.unpack("<I", body[12:16])
            elif body.startswith(b"OpusHead") and len(body) >= 19:
                fmt = "ogg-opus"
                ch = body[9]
                (pre_skip,) = struct.unpack("<H", body[10:12])
                sr = 48000  # opus granules tick at 48 kHz (RFC 7845 §4)
            elif body.startswith(b"\x7fFLAC") and len(body) >= 13:
                # FLAC-to-Ogg mapping: native fLaC+STREAMINFO at +9
                m = _probe_flac(body[9:])
                fmt = "ogg-flac"
                sr, ch = m.sample_rate, m.channels
            else:
                raise AudioMetaError("unsupported Ogg codec")
        if granule >= 0:
            last_granule = max(last_granule, granule)
        saw_page = True
        pos = body0 + body_len
    if not saw_page or fmt is None or not sr:
        raise AudioMetaError("no decodable Ogg stream")
    units = last_granule - (pre_skip if fmt == "ogg-opus" else 0)
    units = max(units, 0)
    return AudioMeta(fmt, sr, ch, units * 1000 // sr, units)


# ==========================================================================
# MP3 (MPEG audio frame headers, layer III)
# ==========================================================================
_MP3_BITRATE_V1 = [0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192,
                   224, 256, 320, -1]
_MP3_BITRATE_V2 = [0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128,
                   144, 160, -1]
_MP3_SR = {3: (44100, 48000, 32000),    # MPEG-1  (version bits 11)
           2: (22050, 24000, 16000),    # MPEG-2  (10)
           0: (11025, 12000, 8000)}     # MPEG-2.5 (00)


def _probe_mp3(data: bytes) -> AudioMeta:
    pos, n = 0, len(data)
    if data[:3] == b"ID3" and n >= 10:
        size = ((data[6] & 0x7F) << 21 | (data[7] & 0x7F) << 14
                | (data[8] & 0x7F) << 7 | (data[9] & 0x7F))
        pos = 10 + size
        if data[5] & 0x10:  # ID3v2.4 footer flag: 10 more bytes of tag
            pos += 10
    sr = ch = 0
    n_frames = 0
    total_samples = 0
    while pos + 4 <= n:
        h = struct.unpack(">I", data[pos:pos + 4])[0]
        if (h >> 21) & 0x7FF != 0x7FF:
            if n_frames:
                break  # trailing junk/tag after last frame
            raise AudioMetaError("no MP3 frame sync")
        ver = (h >> 19) & 0x3
        layer = (h >> 17) & 0x3
        if ver == 1 or layer != 1:  # reserved version / not layer III
            raise AudioMetaError("not MPEG layer III")
        br_idx = (h >> 12) & 0xF
        sr_idx = (h >> 10) & 0x3
        pad = (h >> 9) & 0x1
        if sr_idx == 3:
            raise AudioMetaError("reserved MP3 sample-rate index")
        table = _MP3_BITRATE_V1 if ver == 3 else _MP3_BITRATE_V2
        br = table[br_idx]
        if br <= 0:
            raise AudioMetaError("free/bad MP3 bitrate")
        fsr = _MP3_SR[ver][sr_idx]
        mode = (h >> 6) & 0x3
        fch = 1 if mode == 3 else 2
        spf = 1152 if ver == 3 else 576
        flen = (144000 if ver == 3 else 72000) * br // fsr + pad
        if flen <= 4 or pos + flen > n:
            break
        if sr and (fsr != sr or fch != ch):
            break  # stream parameter change: stop at the consistent run
        sr, ch = fsr, fch
        n_frames += 1
        total_samples += spf
        pos += flen
    if not n_frames:
        raise AudioMetaError("no MP3 frames")
    return AudioMeta("mp3", sr, ch, total_samples * 1000 // sr, n_frames)


# ==========================================================================
# dispatch
# ==========================================================================
def probe_audio(data: bytes) -> AudioMeta:
    try:
        if data[:4] == b"RIFF" and data[8:12] == b"WAVE":
            return _probe_wav(data)
        if data[:4] == b"fLaC":
            return _probe_flac(data)
        if data[:4] == b"OggS":
            return _probe_ogg(data)
        if data[:3] == b"ID3" or (len(data) >= 2 and data[0] == 0xFF
                                  and data[1] & 0xE0 == 0xE0):
            return _probe_mp3(data)
    except struct.error as e:
        # truncated container: the advertised failure type is
        # AudioMetaError, never a raw struct.error
        raise AudioMetaError(f"truncated container: {e}") from e
    raise AudioMetaError("unrecognized audio container")


# ==========================================================================
# skeleton writers (test / derived-corpus fixtures)
# ==========================================================================
def _ogg_page(serial: int, seq: int, granule: int, htype: int,
              packet: bytes) -> bytes:
    segs = []
    rest = len(packet)
    while rest >= 255:
        segs.append(255)
        rest -= 255
    segs.append(rest)  # final short lace (0 for exact multiples)
    hdr = (b"OggS" + bytes([0, htype])
           + struct.pack("<q", granule)
           + struct.pack("<I", serial)
           + struct.pack("<I", seq)
           + b"\x00\x00\x00\x00"
           + bytes([len(segs)]) + bytes(segs))
    page = bytearray(hdr + packet)
    crc = ogg_crc(bytes(page))
    page[22:26] = struct.pack("<I", crc)
    return bytes(page)


def write_ogg_vorbis_skeleton(sample_rate: int, channels: int,
                              n_samples: int, serial: int = 1) -> bytes:
    ident = (b"\x01vorbis" + struct.pack("<I", 0) + bytes([channels])
             + struct.pack("<I", sample_rate)
             + struct.pack("<iii", -1, 128000, -1)
             + bytes([0xB8])   # blocksizes 256/2048 (log2 8 | 11<<4)
             + b"\x01")
    pages = [_ogg_page(serial, 0, 0, 0x02, ident)]
    # one placeholder audio page carrying the final granule position
    pages.append(_ogg_page(serial, 1, n_samples, 0x04, b"\x00" * 32))
    return b"".join(pages)


def write_ogg_opus_skeleton(channels: int, n_samples_48k: int,
                            pre_skip: int = 312, serial: int = 1) -> bytes:
    head = (b"OpusHead" + bytes([1, channels])
            + struct.pack("<H", pre_skip)
            + struct.pack("<I", 48000)
            + struct.pack("<h", 0) + bytes([0]))
    pages = [_ogg_page(serial, 0, 0, 0x02, head)]
    pages.append(_ogg_page(serial, 1, n_samples_48k + pre_skip, 0x04,
                           b"\x00" * 32))
    return b"".join(pages)


def write_mp3_skeleton(sample_rate: int, bitrate_kbps: int,
                       n_frames: int, mono: bool = True) -> bytes:
    """CBR MPEG-1/2 layer-III frame skeletons (headers + zero payload)."""
    if sample_rate in (44100, 48000, 32000):
        ver, table = 3, _MP3_BITRATE_V1
    elif sample_rate in (22050, 24000, 16000):
        ver, table = 2, _MP3_BITRATE_V2
    else:
        raise AudioMetaError(f"unsupported MP3 sample rate {sample_rate}")
    sr_idx = _MP3_SR[ver].index(sample_rate)
    br_idx = table.index(bitrate_kbps)
    mode = 3 if mono else 1
    h = (0x7FF << 21 | ver << 19 | 0x1 << 17 | 0x1 << 16  # sync/ver/L3/no-crc
         | br_idx << 12 | sr_idx << 10 | mode << 6)
    flen = (144000 if ver == 3 else 72000) * bitrate_kbps // sample_rate
    frame = struct.pack(">I", h) + b"\x00" * (flen - 4)
    return frame * n_frames


def write_flac_streaminfo_skeleton(sample_rate: int, channels: int,
                                   n_samples: int) -> bytes:
    """'fLaC' + a lone STREAMINFO block (no frames — metadata only)."""
    bits = (sample_rate << 44) | ((channels - 1) << 41) | (15 << 36) \
        | (n_samples & ((1 << 36) - 1))
    body = (struct.pack(">HH", 4096, 4096)   # min/max blocksize
            + b"\x00\x00\x00" * 2            # min/max framesize (unknown)
            + bits.to_bytes(8, "big")
            + b"\x00" * 16)                  # md5 unset
    return b"fLaC" + bytes([0x80]) + len(body).to_bytes(3, "big") + body


def write_wav_skeleton(sample_rate: int, channels: int,
                       n_samples: int) -> bytes:
    """Valid WAV header + zeroed 16-bit PCM data."""
    data_len = n_samples * channels * 2
    fmt = struct.pack("<HHIIHH", 1, channels, sample_rate,
                      sample_rate * channels * 2, channels * 2, 16)
    body = (b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", data_len) + b"\x00" * data_len)
    return b"RIFF" + struct.pack("<I", len(body)) + body


# ==========================================================================
# Ogg FLAC (the FLAC-to-Ogg mapping, RFC 9639 §10.2 / flac.xiph.org)
# ==========================================================================
# The one Ogg codec a from-scratch build can decode for real: the BOS
# packet is 0x7F 'FLAC' major minor header_count(u16 BE) followed by the
# NATIVE 'fLaC' magic + STREAMINFO; every audio packet is one native
# FLAC frame. Reassembling the packets therefore reconstructs a native
# FLAC stream for the in-repo RFC 9639 decoder (CRC/MD5 verification
# included). Vorbis/Opus stay honestly stubbed at the codec level.

def _ogg_packets(data: bytes) -> list[bytes]:
    """Full packet reassembly (lacing + page continuation), with the
    same CRC verification as _probe_ogg."""
    if data[:4] != b"OggS":
        raise AudioMetaError("not Ogg")
    packets: list[bytes] = []
    cur = bytearray()
    pos, n = 0, len(data)
    while pos + 27 <= n:
        if data[pos:pos + 4] != b"OggS":
            raise AudioMetaError("lost Ogg page sync")
        nsegs = data[pos + 26]
        seg_table = data[pos + 27:pos + 27 + nsegs]
        if len(seg_table) < nsegs:
            raise AudioMetaError("truncated Ogg segment table")
        body0 = pos + 27 + nsegs
        body_len = sum(seg_table)
        if body0 + body_len > n:
            raise AudioMetaError("truncated Ogg page body")
        page = bytearray(data[pos:body0 + body_len])
        stored = struct.unpack("<I", page[22:26])[0]
        page[22:26] = b"\x00\x00\x00\x00"
        if ogg_crc(bytes(page)) != stored:
            raise AudioMetaError("Ogg page CRC mismatch")
        off = body0
        for seg in seg_table:
            cur += data[off:off + seg]
            off += seg
            if seg < 255:  # lace < 255 terminates a packet
                packets.append(bytes(cur))
                cur = bytearray()
        pos = body0 + body_len
    if cur:
        raise AudioMetaError("Ogg stream ends mid-packet")
    return packets


def encode_ogg_flac(samples, sample_rate: int, serial: int = 1,
                    blocksize: int = 4096) -> bytes:
    """int16 samples → Ogg FLAC bytes (one native frame per packet/page,
    granule = last sample position per the mapping spec)."""
    from .flac import encode_flac_parts
    header, frames = encode_flac_parts(samples, sample_rate, blocksize)
    first = b"\x7fFLAC\x01\x00" + struct.pack(">H", 0) + header
    pages = [_ogg_page(serial, 0, 0, 0x02, first)]
    import numpy as np
    n = np.asarray(samples).shape[0]
    granule = 0
    for i, fr in enumerate(frames):
        granule = min((i + 1) * blocksize, n)
        htype = 0x04 if i == len(frames) - 1 else 0x00
        pages.append(_ogg_page(serial, i + 1, granule, htype, fr))
    return b"".join(pages)


def decode_ogg_flac(data: bytes):
    """Ogg FLAC bytes → (sample_rate, channels, samples) via native
    stream reconstruction + the real RFC 9639 decoder. Vorbis/Opus BOS
    packets raise NotImplementedError (inter-op with libvorbis-class
    DSP is out of scope); anything else is a parse error."""
    pkts = _ogg_packets(data)
    if not pkts:
        raise AudioMetaError("empty Ogg stream")
    first = pkts[0]
    if first.startswith(b"\x01vorbis") or first.startswith(b"OpusHead"):
        codec = "vorbis" if first.startswith(b"\x01vorbis") else "opus"
        raise NotImplementedError(
            f"ogg {codec} needs a transform-codec decoder "
            "(libvorbis/libopus, absent here); Ogg FLAC decodes for "
            "real")
    if not first.startswith(b"\x7fFLAC") or len(first) < 9:
        raise AudioMetaError("not an Ogg FLAC stream")
    hcount = struct.unpack(">H", first[7:9])[0]
    native = first[9:]
    if native[:4] != b"fLaC":
        raise AudioMetaError("Ogg FLAC BOS missing native magic")
    if 1 + hcount > len(pkts):
        raise AudioMetaError("Ogg FLAC header packets missing")
    if hcount:
        # later metadata blocks follow; clear STREAMINFO's last flag
        native = (native[:4] + bytes([native[4] & 0x7F]) + native[5:]
                  + b"".join(pkts[1:1 + hcount]))
    from .flac import decode_flac
    return decode_flac(native + b"".join(pkts[1 + hcount:]))
