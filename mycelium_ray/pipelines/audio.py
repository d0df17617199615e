"""Audio-payload pipeline over derived FLAC clips — the compressed-audio
analog of flagship.py's image derivation: each document seeds a
deterministic sine clip, encoded with the from-scratch FLAC encoder
(mycelium_ray/flac.py, RFC 9639) and REALLY decoded back by the
AudioFeatures actor stage (CRC-8/CRC-16/MD5-verified), so the driver's
oracle gate exercises the full encode→decode path end to end. The clip
LENGTH derives from doc_id by pure integer arithmetic mirrored in the
SQL oracle, so duration_ms and sample counts are provably exact while
the decode work is real.

Reference analog: M19 transcode (src/html_lexer/Unicode_wrap.cc:141-228)
on the audio axis; reference has no audio path — this is build-brief
multimodal coverage.
"""
from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

SR = 8000
_KNUTH = 2654435761  # same multiplicative-hash constant as sample_per_source


def synth_audio_row(doc_id: int) -> bytes:
    """Deterministic clip for a doc, doc_id%8 → FLAC / WAV-16 /
    Ogg FLAC / WAV-24 / WAV-µlaw / WAV-alaw / WAV-IMA-ADPCM / Ogg VORBIS
    (every codec path AudioFeatures REALLY decodes — the r4 wavcodec.py
    G.711 companders and predictive ADPCM coder, and the r5 from-scratch
    Vorbis I transform codec included): n_samples and pitch derive from
    doc_id by integer arithmetic (SQL-expressible); waveform is a pure
    sine, so the encoders see realistic smooth data (fixed predictors +
    Rice actually compress; companding quantization actually bites; the
    MDCT actually concentrates energy)."""
    k = (doc_id * _KNUTH) % (1 << 32)
    n_samples = SR // 2 + k % (SR // 2)  # 0.5 – 1.0 s (the pure-python
    # Rice bit-writer costs ~5 ms/ksample; this bounds the driver's
    # per-query wall at ~12 s for 500 clips)
    freq = 100 + (k >> 16) % 400
    t = np.arange(n_samples, dtype=np.float64)
    x = np.rint(np.sin(2 * np.pi * freq * t / SR) * 0.5 * 32767) \
        .astype(np.int16)
    kind = doc_id % 8
    if kind == 1:
        from ..stages.media import encode_wav
        return encode_wav(x, SR)
    if kind == 2:
        from ..audiometa import encode_ogg_flac
        return encode_ogg_flac(x, SR)
    if kind == 7:
        from ..vorbis import encode_vorbis
        return encode_vorbis(x, SR)
    if kind >= 3:
        from ..wavcodec import encode_wav_any
        enc = {3: "pcm24", 4: "ulaw", 5: "alaw", 6: "ima_adpcm"}[kind]
        return encode_wav_any(x, SR, enc)
    from ..flac import encode_flac
    return encode_flac(x, SR)


def derive_audio_batch(batch: pa.Table) -> pa.Table:
    ids = batch["doc_id"].to_pylist()
    blobs = [synth_audio_row(d) for d in ids]
    return pa.table({
        "audio_id": pa.array([f"http://aud.test/d/{d}" for d in ids],
                             pa.string()),
        "doc_id": pa.array(ids, pa.int64()),
        "audio": pa.array(blobs, pa.binary()),
    })


def audio_features_pipeline(sf_dir: str):
    """(audio_id, doc_id, duration_ms, sample_rate, audio_ok) — derive →
    REAL FLAC decode (actor pool) → features. duration_ms is exact
    integer arithmetic on the decoded sample count, mirrored in SQL."""
    from ..stages.media import AudioFeatures

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id"])
    ds = ds.map_batches(derive_audio_batch, batch_format="pyarrow",
                        batch_size=256)
    feats = ds.map_batches(AudioFeatures(), batch_format="pyarrow",
                           batch_size=128, concurrency=4)

    def attach(t: pa.Table) -> pa.Table:
        # audio_id is 'http://aud.test/d/<doc_id>' — recover doc_id
        ids = [int(s.rsplit("/", 1)[1]) for s in
               t["audio_id"].to_pylist()]
        return pa.table({
            "audio_id": t["audio_id"],
            "doc_id": pa.array(ids, pa.int64()),
            "duration_ms": t["duration_ms"],
            "sample_rate": pa.array(
                t["sample_rate"].to_numpy().astype("int64"), pa.int64()),
            "audio_ok": t["audio_ok"],
        })

    return feats.map_batches(attach, batch_format="pyarrow")


AUDIO_FEATURES_SQL = f"""
WITH d AS (
  SELECT doc_id,
         {SR // 2} + (doc_id * {_KNUTH}) % {1 << 32} % {SR // 2}
           AS n_samples
  FROM documents
)
SELECT 'http://aud.test/d/' || CAST(doc_id AS VARCHAR) AS audio_id,
       doc_id,
       CAST(n_samples * 1000 // {SR} AS BIGINT) AS duration_ms,
       CAST({SR} AS BIGINT) AS sample_rate,
       TRUE AS audio_ok
FROM d
"""


# --------------------------------------------------------------------------
# audio_metadata: container-level triage across five formats (wav, flac,
# ogg-vorbis, ogg-opus, mp3). Per-doc container choice + geometry derive
# from doc_id by integer arithmetic, so the oracle checks the parsers'
# outputs exactly while the container walking (RIFF chunks, STREAMINFO
# bits, Ogg pages + CRC, MP3 frame-header sums) is real work.
# --------------------------------------------------------------------------
def _meta_params(doc_id: int) -> tuple[str, int, int]:
    """(fmt, sample_rate, n_units) — integer arithmetic only."""
    k = (doc_id * _KNUTH) % (1 << 32)
    kind = doc_id % 6
    if kind == 0:
        return "wav", 16000, 8000 + k % 8000
    if kind == 1:
        return "flac", 22050, 11025 + k % 22050
    if kind == 2:
        return "ogg-vorbis", 44100, 22050 + k % 44100
    if kind == 3:
        return "ogg-opus", 48000, 24000 + k % 48000
    if kind == 5:
        # REAL Ogg FLAC files (not skeletons): short enough that the
        # FLAC encode stays cheap, long enough to vary per doc
        return "ogg-flac", 8000, 2000 + k % 2000
    return "mp3", 44100, 10 + k % 40  # n_units = frames


def synth_audio_meta_row(doc_id: int) -> bytes:
    from ..audiometa import (encode_ogg_flac,
                             write_flac_streaminfo_skeleton,
                             write_mp3_skeleton, write_ogg_opus_skeleton,
                             write_ogg_vorbis_skeleton, write_wav_skeleton)
    fmt, sr, n = _meta_params(doc_id)
    if fmt == "wav":
        return write_wav_skeleton(sr, 1, n)
    if fmt == "flac":
        return write_flac_streaminfo_skeleton(sr, 1, n)
    if fmt == "ogg-vorbis":
        return write_ogg_vorbis_skeleton(sr, 1, n)
    if fmt == "ogg-opus":
        return write_ogg_opus_skeleton(1, n)
    if fmt == "ogg-flac":
        k = (doc_id * _KNUTH) % (1 << 32)
        t = np.arange(n, dtype=np.float64)
        freq = 100 + (k >> 16) % 400
        x = np.rint(np.sin(2 * np.pi * freq * t / sr) * 0.4 * 32767) \
            .astype(np.int16)
        return encode_ogg_flac(x, sr)
    return write_mp3_skeleton(sr, 128, n, mono=True)


def audio_metadata(sf_dir: str):
    """(audio_id, doc_id, fmt, sample_rate, channels, duration_ms,
    meta_ok) via the REAL container parsers in audiometa.py (AudioProbe
    actor pool — no sample decode)."""
    from ..stages.media import AudioProbe

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id"])

    def derive(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        return pa.table({
            "audio_id": pa.array([f"http://aud.test/m/{d}" for d in ids],
                                 pa.string()),
            "audio": pa.array([synth_audio_meta_row(d) for d in ids],
                              pa.binary()),
        })

    probed = ds.map_batches(derive, batch_format="pyarrow",
                            batch_size=256) \
        .map_batches(AudioProbe(), batch_format="pyarrow",
                     batch_size=128, concurrency=4)

    def attach(t: pa.Table) -> pa.Table:
        ids = [int(s.rsplit("/", 1)[1]) for s in
               t["audio_id"].to_pylist()]
        return pa.table({
            "audio_id": t["audio_id"],
            "doc_id": pa.array(ids, pa.int64()),
            "fmt": t["fmt"],
            "sample_rate": t["sample_rate"],
            "channels": t["channels"],
            "duration_ms": t["duration_ms"],
            "meta_ok": t["meta_ok"],
        })

    return probed.map_batches(attach, batch_format="pyarrow")


AUDIO_METADATA_SQL = f"""
WITH d AS (
  SELECT doc_id, (doc_id * {_KNUTH}) % {1 << 32} AS k, doc_id % 6 AS kind
  FROM documents
), p AS (
  SELECT doc_id, kind,
         CASE kind WHEN 0 THEN 'wav' WHEN 1 THEN 'flac'
                   WHEN 2 THEN 'ogg-vorbis' WHEN 3 THEN 'ogg-opus'
                   WHEN 5 THEN 'ogg-flac'
                   ELSE 'mp3' END AS fmt,
         CASE kind WHEN 0 THEN 16000 WHEN 1 THEN 22050
                   WHEN 2 THEN 44100 WHEN 3 THEN 48000
                   WHEN 5 THEN 8000
                   ELSE 44100 END AS sample_rate,
         CASE kind WHEN 0 THEN 8000 + k % 8000
                   WHEN 1 THEN 11025 + k % 22050
                   WHEN 2 THEN 22050 + k % 44100
                   WHEN 3 THEN 24000 + k % 48000
                   WHEN 5 THEN 2000 + k % 2000
                   ELSE 10 + k % 40 END AS n_units
  FROM d
)
SELECT 'http://aud.test/m/' || CAST(doc_id AS VARCHAR) AS audio_id,
       doc_id, fmt,
       CAST(sample_rate AS BIGINT) AS sample_rate,
       CAST(1 AS BIGINT) AS channels,
       CAST(CASE WHEN fmt = 'mp3' THEN n_units * 1152 * 1000 // 44100
                 ELSE n_units * 1000 // sample_rate END AS BIGINT)
         AS duration_ms,
       TRUE AS meta_ok
FROM p
"""


# --------------------------------------------------------------------------
# audio_silence_trim: VAD-lite clip trimming — strip leading/trailing
# silence runs before feature extraction (the audio dual of the image
# letterbox crop). Clips derive LOUD everywhere (12000 + 4000*cos, so a
# codec's zero-adjacent quantization can never fake silence at the
# edges) with planted zero padding on doc_id % 5 ∈ {2, 3} rows; codecs
# rotate over the six exact-zero-preserving paths (FLAC / WAV-16 /
# Ogg FLAC / WAV-24 / µ-law / A-law — A-law's zero decodes to ±8, which
# sets the silence threshold). The oracle pins the exact pad lengths.
# --------------------------------------------------------------------------
SILENCE_ABS = 8  # A-law has no true zero: its silence decodes to ±8


def _trim_params(doc_id: int) -> tuple[int, int, int]:
    """(n_samples, lead_pad, tail_pad) — integer arithmetic only."""
    k = (doc_id * _KNUTH) % (1 << 32)
    n_samples = SR // 2 + k % (SR // 2)
    if doc_id % 5 in (2, 3):
        return n_samples, 50 + k % 200, 30 + k % 100
    return n_samples, 0, 0


def synth_trim_row(doc_id: int) -> bytes:
    k = (doc_id * _KNUTH) % (1 << 32)
    n, lead, tail = _trim_params(doc_id)
    freq = 100 + (k >> 16) % 400
    t = np.arange(n, dtype=np.float64)
    loud = np.rint(12000 + 4000 * np.cos(2 * np.pi * freq * t / SR)) \
        .astype(np.int16)
    x = np.concatenate([np.zeros(lead, np.int16), loud,
                        np.zeros(tail, np.int16)])
    kind = doc_id % 6
    if kind == 0:
        from ..flac import encode_flac
        return encode_flac(x, SR)
    if kind == 1:
        from ..stages.media import encode_wav
        return encode_wav(x, SR)
    if kind == 2:
        from ..audiometa import encode_ogg_flac
        return encode_ogg_flac(x, SR)
    from ..wavcodec import encode_wav_any
    return encode_wav_any(x, SR, {3: "pcm24", 4: "ulaw", 5: "alaw"}[kind])


class TrimSilence:
    """audio:binary → (lead_trimmed, tail_trimmed, kept_ms, trim_ok):
    REAL decode (any supported codec), strip the maximal |x| <= thresh
    runs at both ends."""

    def __init__(self, thresh: int = SILENCE_ABS):
        self.thresh = thresh

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..stages.media import AudioFeatures
        out = {"audio_id": [], "lead_trimmed": [], "tail_trimmed": [],
               "kept_ms": [], "trim_ok": []}
        for aid, data in zip(batch["audio_id"].to_pylist(),
                             batch["audio"].to_pylist()):
            try:
                sr, x = AudioFeatures._decode(data)
                loud = np.abs(x.astype(np.int32)) > self.thresh
                idx = np.nonzero(loud)[0]
                if len(idx):
                    lo, hi = int(idx[0]), int(idx[-1]) + 1
                else:
                    lo, hi = 0, 0
                out["audio_id"].append(aid)
                out["lead_trimmed"].append(lo)
                out["tail_trimmed"].append(len(x) - hi)
                out["kept_ms"].append((hi - lo) * 1000 // sr)
                out["trim_ok"].append(True)
            except Exception:
                out["audio_id"].append(aid)
                out["lead_trimmed"].append(-1)
                out["tail_trimmed"].append(-1)
                out["kept_ms"].append(-1)
                out["trim_ok"].append(False)
        return pa.table({
            "audio_id": pa.array(out["audio_id"], pa.string()),
            "lead_trimmed": pa.array(out["lead_trimmed"], pa.int64()),
            "tail_trimmed": pa.array(out["tail_trimmed"], pa.int64()),
            "kept_ms": pa.array(out["kept_ms"], pa.int64()),
            "trim_ok": pa.array(out["trim_ok"], pa.bool_()),
        })


def audio_silence_trim(sf_dir: str):
    """(audio_id, doc_id, lead_trimmed, tail_trimmed, kept_ms, trim_ok),
    oracle-exact per row."""
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id"])

    def derive(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        return pa.table({
            "audio_id": pa.array([f"http://aud.test/t/{d}" for d in ids],
                                 pa.string()),
            "audio": pa.array([synth_trim_row(d) for d in ids],
                              pa.binary()),
        })

    trimmed = ds.map_batches(derive, batch_format="pyarrow",
                             batch_size=256) \
        .map_batches(TrimSilence(), batch_format="pyarrow",
                     batch_size=128, concurrency=4)

    def attach(t: pa.Table) -> pa.Table:
        ids = [int(s.rsplit("/", 1)[1]) for s in
               t["audio_id"].to_pylist()]
        return pa.table({
            "audio_id": t["audio_id"],
            "doc_id": pa.array(ids, pa.int64()),
            "lead_trimmed": t["lead_trimmed"],
            "tail_trimmed": t["tail_trimmed"],
            "kept_ms": t["kept_ms"],
            "trim_ok": t["trim_ok"],
        })

    return trimmed.map_batches(attach, batch_format="pyarrow")


AUDIO_SILENCE_TRIM_SQL = f"""
WITH d AS (
  SELECT doc_id, (doc_id * {_KNUTH}) % {1 << 32} AS k FROM documents
), p AS (
  SELECT doc_id,
         {SR // 2} + k % {SR // 2} AS n_samples,
         CASE WHEN doc_id % 5 IN (2, 3) THEN 50 + k % 200 ELSE 0 END
           AS lead,
         CASE WHEN doc_id % 5 IN (2, 3) THEN 30 + k % 100 ELSE 0 END
           AS tail
  FROM d
)
SELECT 'http://aud.test/t/' || CAST(doc_id AS VARCHAR) AS audio_id,
       doc_id,
       CAST(lead AS BIGINT) AS lead_trimmed,
       CAST(tail AS BIGINT) AS tail_trimmed,
       CAST(n_samples * 1000 // {SR} AS BIGINT) AS kept_ms,
       TRUE AS trim_ok
FROM p
"""


# --- audio tag metadata lifecycle (audiotags.py) --------------------------
# FLAC rows carry a real VORBIS_COMMENT block inside a real encoded
# stream; MP3 rows carry an ID3v2.4 tag ahead of real frame headers.
# Tag values are pure functions of doc_id, mirrored exactly in SQL.


def audio_tags(sf_dir: str):
    """(audio_id, container, title, artist, track, roundtrip_ok,
    strip_ok) — the audio metadata lifecycle: derive a clip (doc_id%2 →
    FLAC sine clip / MP3 frame skeleton), SET doc_id-derived tags
    (VORBIS_COMMENT / ID3v2.4), READ them back with the real parsers,
    verify tagging is decode/probe-neutral, and verify stripping
    restores the original bytes byte-identically."""
    import ray.data as rd

    from ..audiometa import probe_audio, write_mp3_skeleton
    from ..audiotags import (flac_get_tags, flac_set_tags, flac_strip_tags,
                             mp3_get_tags, mp3_set_tags, mp3_strip_tags)
    from ..flac import decode_flac, encode_flac

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id"])

    def lifecycle(t: pa.Table) -> pa.Table:
        cols = {k: [] for k in ("audio_id", "container", "title", "artist",
                                "track", "roundtrip_ok", "strip_ok")}
        for d in t["doc_id"].to_pylist():
            k = (d * _KNUTH) % (1 << 32)
            title = f"Track {d % 97}"
            artist = f"Artist {d % 11}"
            track = str(1 + d % 12)
            if d % 2 == 0:
                n = SR // 4 + k % (SR // 8)
                x = np.rint(np.sin(2 * np.pi * (100 + k % 300)
                                   * np.arange(n) / SR) * 12000) \
                    .astype(np.int16)
                base = encode_flac(x, SR)
                tagged = flac_set_tags(base, {"TITLE": title,
                                              "ARTIST": artist,
                                              "TRACKNUMBER": track})
                got = flac_get_tags(tagged)
                ok = (got == {"TITLE": title, "ARTIST": artist,
                              "TRACKNUMBER": track}
                      and np.array_equal(decode_flac(tagged)[2],
                                         decode_flac(base)[2])
                      and probe_audio(tagged).sample_rate == SR)
                strip_ok = (flac_strip_tags(tagged) == base
                            and flac_get_tags(base) == {})
                container = "flac"
            else:
                base = write_mp3_skeleton(44100, 128, 8 + d % 8)
                tagged = mp3_set_tags(base, {"TIT2": title, "TPE1": artist,
                                             "TRCK": track})
                got = {"TITLE": mp3_get_tags(tagged).get("TIT2", ""),
                       "ARTIST": mp3_get_tags(tagged).get("TPE1", ""),
                       "TRACKNUMBER": mp3_get_tags(tagged).get("TRCK", "")}
                ok = (got == {"TITLE": title, "ARTIST": artist,
                              "TRACKNUMBER": track}
                      and probe_audio(tagged).sample_rate == 44100)
                strip_ok = (mp3_strip_tags(tagged) == base
                            and mp3_get_tags(base) == {})
                container = "mp3"
            cols["audio_id"].append(f"http://audio.test/d/{d}")
            cols["container"].append(container)
            cols["title"].append(got.get("TITLE", ""))
            cols["artist"].append(got.get("ARTIST", ""))
            cols["track"].append(got.get("TRACKNUMBER", ""))
            cols["roundtrip_ok"].append(bool(ok))
            cols["strip_ok"].append(bool(strip_ok))
        return pa.table({
            "audio_id": pa.array(cols["audio_id"], pa.string()),
            "container": pa.array(cols["container"], pa.string()),
            "title": pa.array(cols["title"], pa.string()),
            "artist": pa.array(cols["artist"], pa.string()),
            "track": pa.array(cols["track"], pa.string()),
            "roundtrip_ok": pa.array(cols["roundtrip_ok"], pa.bool_()),
            "strip_ok": pa.array(cols["strip_ok"], pa.bool_()),
        })

    return ds.map_batches(lifecycle, batch_format="pyarrow",
                          batch_size=128)


AUDIO_TAGS_SQL = """
SELECT 'http://audio.test/d/' || CAST(doc_id AS VARCHAR) AS audio_id,
       CASE WHEN doc_id % 2 = 0 THEN 'flac' ELSE 'mp3' END AS container,
       'Track ' || CAST(doc_id % 97 AS VARCHAR) AS title,
       'Artist ' || CAST(doc_id % 11 AS VARCHAR) AS artist,
       CAST(1 + doc_id % 12 AS VARCHAR) AS track,
       TRUE AS roundtrip_ok,
       TRUE AS strip_ok
FROM documents
"""


# --------------------------------------------------------------------------
# vorbis_roundtrip: the transform-codec gauntlet — every doc's derived
# clip goes through the REAL from-scratch Vorbis I encoder AND decoder
# (mycelium_ray/vorbis.py) inside the map stage; the op emits measured
# facts (decoded length, duration) plus a PSNR >= 40 dB gate. Geometry
# derives from doc_id by integer arithmetic so the oracle pins every
# value; psnr_ok = TRUE in SQL asserts the codec's quality contract —
# a single lossy regression anywhere in MDCT/floor/residue/Huffman
# flips a row and fails the hash compare.
# --------------------------------------------------------------------------
def vorbis_roundtrip(sf_dir: str):
    """(doc_id, n_samples, duration_ms, stereo, psnr_ok) via real Vorbis
    encode→decode per document."""
    from ..vorbis import decode_vorbis, encode_vorbis

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id"])

    def run(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        cols = {"doc_id": [], "n_samples": [], "duration_ms": [],
                "stereo": [], "psnr_ok": []}
        for d in ids:
            k = (d * _KNUTH) % (1 << 32)
            n = SR // 4 + k % (SR // 4)          # 0.25 – 0.5 s
            freq = 100 + (k >> 16) % 400
            t = np.arange(n, dtype=np.float64)
            x = 0.6 * np.sin(2 * np.pi * freq * t / SR) \
                + 0.15 * np.sin(2 * np.pi * 3 * freq * t / SR)
            stereo = d % 2 == 1
            sig = np.stack([x, 0.5 * x], axis=1) if stereo else x
            rate, ch, dec = decode_vorbis(encode_vorbis(sig, SR))
            ref2 = sig if sig.ndim == 2 else sig[:, None]
            noise = dec - ref2
            psnr = 10 * np.log10(
                np.max(ref2 ** 2) / max(np.mean(noise ** 2), 1e-300))
            cols["doc_id"].append(d)
            cols["n_samples"].append(len(dec))
            cols["duration_ms"].append(len(dec) * 1000 // rate)
            cols["stereo"].append(ch == 2)
            cols["psnr_ok"].append(bool(psnr >= 40.0))
        return pa.table({
            "doc_id": pa.array(cols["doc_id"], pa.int64()),
            "n_samples": pa.array(cols["n_samples"], pa.int64()),
            "duration_ms": pa.array(cols["duration_ms"], pa.int64()),
            "stereo": pa.array(cols["stereo"], pa.bool_()),
            "psnr_ok": pa.array(cols["psnr_ok"], pa.bool_()),
        })

    return ds.map_batches(run, batch_format="pyarrow", batch_size=64,
                          concurrency=8)


VORBIS_ROUNDTRIP_SQL = f"""
SELECT doc_id,
       CAST({SR // 4} + (doc_id * {_KNUTH}) % {1 << 32} % {SR // 4}
            AS BIGINT) AS n_samples,
       CAST(({SR // 4} + (doc_id * {_KNUTH}) % {1 << 32} % {SR // 4})
            * 1000 // {SR} AS BIGINT) AS duration_ms,
       doc_id % 2 = 1 AS stereo,
       TRUE AS psnr_ok
FROM documents
"""
