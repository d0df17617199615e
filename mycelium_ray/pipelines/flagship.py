"""Flagship pipeline for ``entry()``: the minimum-slice crawl shape
(SURVEY.md §7.1) over driver testdata.

documents.parquet → derive deterministic image+caption rows (the corpus
shape from BASELINE.json input_hint; pixels are a pure function of doc_id)
→ encode → decode/validate (DecodeValidate actor stage) → caption clean →
phash + validity columns. Exercises the full payload path: binary Arrow
columns end-to-end, pyarrow batches, no pandas on the pixel path.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data as rd

from ..hashing import url_hash64
from ..imaging import encode_image
from ..stages.decode import DecodeValidate, clean_caption_batch

_FMTS = ["png", "jpeg", "webp"]

# a deterministic fraction of docs reuse pixels across a coarse group so
# the near-dup pair set is NON-EMPTY at every sf (the testdata corpus has
# no exact-text duplicates below sf0.1, which made the driver's phash
# check vacuous — 0 rows both sides proves nothing)
DUP_EVERY = 50   # docs with doc_id % 50 == 0 join a shared-pixel group
DUP_GROUPS = 150  # ... keyed by doc_id % 150 (3 groups over any 500 docs)


def _seed_key(doc_id: int, text: str) -> str:
    if doc_id % DUP_EVERY == 0:
        return f"dup:{doc_id % DUP_GROUPS}"
    return "txt:" + (text or "")


def synth_image_row(doc_id: int, text: str) -> tuple[bytes, int, int, str]:
    """Deterministic image for a doc row, seeded by the TEXT content hash
    (exact-duplicate documents carry byte-identical images — same pixels
    AND format), except for the planted dup-group fraction (_seed_key),
    which shares pixels across a coarsened doc_id key. Both rules are
    mirrored in the SQL oracles, so phash-hamming-0 pairs are exactly the
    same-seed-key pairs — non-vacuously provable at every sf."""
    return synth_image_from_seed(url_hash64(_seed_key(doc_id, text)))


def synth_image_from_seed(seed: int) -> tuple[bytes, int, int, str]:
    """The raw render recipe behind ``synth_image_row``: 64-bit seed →
    (encoded bytes, w, h, fmt). Exposed separately so the caption tower
    of the alignment scorer (imageann.caption_align) can render a
    caption-only seed through the IDENTICAL byte path — equal seeds give
    byte-identical images, hence cosine exactly 1 after decode+embed."""
    rng = np.random.default_rng(seed)
    w = int(rng.integers(16, 41))
    h = int(rng.integers(16, 41))
    px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    fmt = _FMTS[seed % 3]
    # a deterministic 1/8 of jpeg rows are PROGRESSIVE (SOF2) streams so
    # the multi-scan decode path is exercised end-to-end at every sf; the
    # fmt column stays "jpeg" (that's what sniffing reports) and bytes
    # remain a pure function of the seed, so every oracle is unaffected
    enc_fmt = ("jpeg_progressive"
               if fmt == "jpeg" and (seed >> 8) % 8 == 0 else fmt)
    return encode_image(px, enc_fmt), w, h, fmt


def derive_images_batch(batch: pa.Table) -> pa.Table:
    ids = batch["doc_id"].to_pylist()
    texts = batch["text"].to_pylist()
    payloads = [synth_image_row(d, t) for d, t in zip(ids, texts)]
    return pa.table({
        "image_id": pa.array([f"http://img.test/d/{d}" for d in ids]),
        "doc_id": pa.array(ids, pa.int64()),
        "content": pa.array([p[0] for p in payloads], pa.binary()),
        "w_true": pa.array([p[1] for p in payloads], pa.int32()),
        "h_true": pa.array([p[2] for p in payloads], pa.int32()),
        "fmt": pa.array([p[3] for p in payloads], pa.string()),
        "caption": batch["text"],
    })


def flagship(sf_dir: str):
    """Returns a Dataset of decoded+validated image rows."""
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    ds = ds.map_batches(derive_images_batch, batch_format="pyarrow",
                        batch_size=256)
    ds = ds.map_batches(DecodeValidate(), batch_format="pyarrow",
                        batch_size=128)
    ds = ds.map_batches(clean_caption_batch, batch_format="pyarrow")
    return ds


def image_phash_neardup(sf_dir: str):
    """End-to-end multimodal dedup: derive/decode image rows (flagship
    path), then phash-band near-dup over the decoded-pixel hashes. With
    text-hash-seeded images, the hamming-0 pair set is EXACTLY the
    exact-text-duplicate pair set (id_a < id_b as strings), so this
    pipeline is full-value oracle-checked despite running real image
    bytes through decode + perceptual hashing. Random non-duplicate
    phashes land within hamming 6 with probability ~5e-12 per pair —
    never at test scales."""
    from .imagedup import phash_neardup
    return phash_neardup(flagship(sf_dir).select_columns(
        ["image_id", "phash"]))


def image_resize(sf_dir: str, tw: int = 16, th: int = 16):
    """End-to-end multimodal resize: derive/decode image rows, then the
    ResizeImages actor stage (block-mean numpy + re-encode). The oracle
    asserts the full contract the pipeline can prove in SQL: every
    document's derived image decodes and resizes to the target (one row
    per doc, resize_ok all true, target dims)."""
    from ..stages.media import ResizeImages
    ds = flagship(sf_dir).select_columns(["image_id", "content"])
    out = ds.map_batches(ResizeImages(tw, th), batch_format="pyarrow",
                         batch_size=128)
    return out.select_columns(["image_id", "resized_w", "resized_h",
                               "resize_ok"])


IMAGE_RESIZE_SQL = """
SELECT 'http://img.test/d/' || CAST(doc_id AS VARCHAR) AS image_id,
       CAST(16 AS INTEGER) AS resized_w,
       CAST(16 AS INTEGER) AS resized_h,
       TRUE AS resize_ok
FROM documents
"""


MM_MIN_CAPTION_CHARS = 100


def multimodal_filter(sf_dir: str, min_caption_chars: int = MM_MIN_CAPTION_CHARS):
    """(image_id, doc_id) of image+caption rows kept by the multimodal
    cleaning pipeline — the corpus_filter analog on the graft payload:

    1. gates: decode_ok (REAL decode of the image bytes) and cleaned
       caption length ≥ ``min_caption_chars``;
    2. exact-image dedup: the row is the min-doc_id representative of its
       image-byte group (64-bit hash of the CONTENT BYTES, pre-aggregated
       per batch as in dedup_exact).

    Oracle-provability: images are text-hash-seeded (byte-identical iff
    caption text identical) and the corpus text is entity/control-free
    (caption cleaning is identity), so the SQL contract is exact — while
    the Ray side decodes real bytes and hashes real payloads; a decode or
    cleaning regression breaks the value-hash match. Verdict rows meet in
    one bucketed groupby; the decoded corpus is materialized ONCE as the
    natural stage boundary (at 100 TB this is the persisted decode
    output both dedup and gating read)."""
    from ray.data.aggregate import Min

    from ..hashing import url_hash64
    from .dedup import N_BUCKETS

    rows = flagship(sf_dir).select_columns(
        ["doc_id", "caption", "content", "decode_ok"]).materialize()

    def gate_rows(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        doc_id = t["doc_id"].to_numpy()
        caplen = pc.utf8_length(pc.fill_null(t["caption"], "")).to_numpy()
        ok = (t["decode_ok"].to_numpy(zero_copy_only=False)
              & (caplen >= min_caption_chars)).astype("int64")
        return pa.table({
            "doc_id": pa.array(doc_id, pa.int64()),
            "kind": pa.array(np.zeros(len(ok), dtype="int64")),
            "flag": pa.array(ok, pa.int64()),
            "bucket": pa.array((doc_id % N_BUCKETS).astype("int64")),
        })

    def hash_partial(t: pa.Table) -> pa.Table:
        h = np.array([url_hash64(c) for c in t["content"].to_pylist()],
                     dtype=np.uint64).astype("int64")
        g = pa.table({"content_hash": pa.array(h), "doc_id": t["doc_id"]}) \
            .group_by("content_hash").aggregate([("doc_id", "min")])
        return pa.table({"content_hash": g["content_hash"],
                         "doc_id": g["doc_id_min"]})

    reps = rows.map_batches(hash_partial, batch_format="pyarrow") \
        .groupby("content_hash") \
        .aggregate(Min("doc_id", alias_name="doc_id")) \
        .map_batches(lambda t: pa.table({
            "doc_id": t["doc_id"],
            "kind": pa.array(np.ones(len(t), dtype="int64")),
            "flag": pa.array(np.ones(len(t), dtype="int64")),
            "bucket": pa.array((t["doc_id"].to_numpy() % N_BUCKETS)
                               .astype("int64")),
        }), batch_format="pyarrow")

    def decide(g) -> pa.Table:
        p = g.pivot_table(index="doc_id", columns="kind", values="flag",
                          aggfunc="max", fill_value=0)
        import pandas as pd
        gate = p[0] if 0 in p.columns else pd.Series(0, index=p.index)
        rep = p[1] if 1 in p.columns else pd.Series(0, index=p.index)
        keep = p.index[(gate == 1) & (rep == 1)].to_numpy().astype("int64")
        return pa.table({"doc_id": pa.array(keep)})

    out = rows.map_batches(gate_rows, batch_format="pyarrow").union(reps) \
        .groupby("bucket").map_groups(decide, batch_format="pandas")
    ids = np.sort(out.to_pandas()["doc_id"].to_numpy().astype("int64"))
    return pa.table({
        "image_id": pa.array([f"http://img.test/d/{d}" for d in ids],
                             pa.string()),
        "doc_id": pa.array(ids, pa.int64()),
    })


MULTIMODAL_FILTER_SQL = f"""
WITH gated AS (
  SELECT doc_id FROM documents
  WHERE length(text) >= {MM_MIN_CAPTION_CHARS}
), reps AS (
  SELECT min(doc_id) AS doc_id FROM documents
  GROUP BY CASE WHEN doc_id % {DUP_EVERY} = 0
                THEN 'dup:' || CAST(doc_id % {DUP_GROUPS} AS VARCHAR)
                ELSE 'txt:' || text END
)
SELECT 'http://img.test/d/' || CAST(g.doc_id AS VARCHAR) AS image_id,
       g.doc_id
FROM gated g JOIN reps r ON r.doc_id = g.doc_id
ORDER BY g.doc_id
"""


IMAGE_PHASH_NEARDUP_SQL = f"""
WITH ids AS (
  SELECT doc_id,
         CASE WHEN doc_id % {DUP_EVERY} = 0
              THEN 'dup:' || CAST(doc_id % {DUP_GROUPS} AS VARCHAR)
              ELSE 'txt:' || text END AS seedkey,
         'http://img.test/d/' || CAST(doc_id AS VARCHAR) AS iid
  FROM documents
)
SELECT a.iid AS id_a, b.iid AS id_b, CAST(0 AS BIGINT) AS hamming
FROM ids a JOIN ids b ON a.seedkey = b.seedkey AND a.iid < b.iid
"""


def image_augment(sf_dir: str):
    """End-to-end multimodal augmentation: derive/decode image rows, then
    the AugmentImages 1→2 fan-out stage (hflip + rot90, re-encoded in the
    source format). The SQL-provable contract: exactly one row per
    (document, augmentation), every augmentation succeeds, and the
    geometry invariant holds (dims preserved under flip, swapped under
    rot90 — folded into dims_ok by the stage). Pixel-exact semantics are
    pinned by tests on the lossless codecs (double-flip identity,
    rot90⁴ = id)."""
    from ..stages.media import AugmentImages
    ds = flagship(sf_dir).select_columns(["image_id", "content"])
    out = ds.map_batches(AugmentImages(), batch_format="pyarrow",
                         batch_size=128)
    return out.select_columns(["image_id", "aug", "dims_ok", "aug_ok"])


IMAGE_AUGMENT_SQL = """
SELECT 'http://img.test/d/' || CAST(doc_id AS VARCHAR) AS image_id,
       t.aug, TRUE AS dims_ok, TRUE AS aug_ok
FROM documents CROSS JOIN (VALUES ('hflip'), ('rot90')) t(aug)
"""


# --------------------------------------------------------------------------
# image_metadata: header-only triage over the derived image rows — dims
# and format from container headers (PNG IHDR / JPEG SOF scan / VP8L
# bits), NO pixel decode. Rows-only for the driver (dims are
# rng-seeded, not SQL-expressible); the probe==decode invariant is
# pinned by pytest over every row at sf0.001.
# --------------------------------------------------------------------------
def image_metadata(sf_dir: str):
    """(image_id, doc_id, fmt, w, h, probe_ok) via probe_image_meta."""
    from ..imaging import probe_image_meta

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    ds = ds.map_batches(derive_images_batch, batch_format="pyarrow",
                        batch_size=256)

    def probe(t: pa.Table) -> pa.Table:
        blobs = t["content"].to_pylist()
        fmts, ws, hs, oks = [], [], [], []
        for b in blobs:
            try:
                f, w, h = probe_image_meta(b)
                fmts.append(f)
                ws.append(w)
                hs.append(h)
                oks.append(True)
            except Exception:
                fmts.append("unknown")
                ws.append(-1)
                hs.append(-1)
                oks.append(False)
        return pa.table({
            "image_id": t["image_id"],
            "doc_id": t["doc_id"],
            "fmt": pa.array(fmts, pa.string()),
            "w": pa.array(ws, pa.int64()),
            "h": pa.array(hs, pa.int64()),
            "probe_ok": pa.array(oks, pa.bool_()),
        })

    return ds.map_batches(probe, batch_format="pyarrow")


def image_channel_stats(sf_dir: str):
    """Corpus-wide per-channel pixel statistics (mean/std per R,G,B) —
    the classic normalization precompute every image-training pipeline
    runs before the first epoch. Rows-only by design: SQL cannot decode
    image bytes (same contract as image_metadata).

    Distributed shape: decode inside map_batches and emit EXACT integer
    partials per batch (pixel count, sum, sum of squares per channel —
    int64 is safe to ~3.6e5 terapixels); one tiny combine task reduces
    all partials to 3 rows and derives mean/std. A single streaming pass
    over the corpus, no shuffle, nothing driver-side.
    """
    import pyarrow.compute as pc

    from ..imaging import ImageDecodeError, decode_image

    def partial(t: pa.Table) -> pa.Table:
        n = np.zeros(3, dtype=np.int64)
        s = np.zeros(3, dtype=np.int64)
        ss = np.zeros(3, dtype=np.int64)
        for data in t["content"].to_pylist():
            if not data:
                continue
            try:
                px, _ = decode_image(data)
            except ImageDecodeError:
                continue
            p = px.reshape(-1, px.shape[-1]).astype(np.int64)
            n += p.shape[0]
            s += p.sum(axis=0)
            ss += (p * p).sum(axis=0)
        return pa.table({"channel": pa.array([0, 1, 2], pa.int64()),
                         "n_px": pa.array(n), "px_sum": pa.array(s),
                         "px_sumsq": pa.array(ss)})

    def finish(df):
        g = df.groupby("channel", as_index=False).sum()
        n = g["n_px"].to_numpy().astype("float64")
        mean = g["px_sum"].to_numpy() / n
        var = g["px_sumsq"].to_numpy() / n - mean * mean
        g["mean"] = mean
        g["std"] = np.sqrt(np.maximum(var, 0.0))
        return g

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    ds = ds.map_batches(derive_images_batch, batch_format="pyarrow",
                        batch_size=256)
    return ds.map_batches(partial, batch_format="pyarrow",
                          batch_size=128) \
        .repartition(1).map_batches(finish, batch_format="pandas")


def _laplacian_var(px: np.ndarray) -> float:
    """Variance of the 4-neighbor Laplacian over the luma plane — the
    classic single-number sharpness/blur statistic (high = sharp edges,
    near-zero = flat or blurred). Pure numpy slicing, no per-pixel loop."""
    g = (0.299 * px[..., 0] + 0.587 * px[..., 1]
         + 0.114 * px[..., 2]).astype(np.float64)
    lap = (g[:-2, 1:-1] + g[2:, 1:-1] + g[1:-1, :-2] + g[1:-1, 2:]
           - 4.0 * g[1:-1, 1:-1])
    return float(lap.var()) if lap.size else 0.0


def image_sharpness(sf_dir: str):
    """Per-image sharpness score (Laplacian variance of the luma plane)
    plus a corpus-relative blur flag — the quality gate an image-training
    pipeline runs to drop blurred/flat frames before the expensive
    stages. Rows-only by design: SQL cannot decode image bytes (same
    contract as image_metadata / image_channel_stats).

    Distributed shape: one streaming decode+score pass per batch (decode
    is inherently per-payload; the Laplacian itself is vectorized numpy);
    the blur threshold is a FIXED absolute floor, not a corpus quantile,
    so no second pass and no shuffle — the op stays a single map.
    """
    from ..imaging import ImageDecodeError, decode_image

    BLUR_FLOOR = 50.0  # uniform-noise synth images score in the 1000s

    def score(t: pa.Table) -> pa.Table:
        ids, sharp, ok = [], [], []
        for doc_id, data in zip(t["doc_id"].to_pylist(),
                                t["content"].to_pylist()):
            ids.append(doc_id)
            try:
                px, _ = decode_image(data)
                sharp.append(_laplacian_var(px))
                ok.append(True)
            except ImageDecodeError:
                sharp.append(0.0)
                ok.append(False)
        s = np.array(sharp, dtype=np.float64)
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "sharpness": pa.array(s),
            "decode_ok": pa.array(ok, pa.bool_()),
            "is_blurry": pa.array(s < BLUR_FLOOR),
        })

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    ds = ds.map_batches(derive_images_batch, batch_format="pyarrow",
                        batch_size=256)
    return ds.map_batches(score, batch_format="pyarrow", batch_size=128)


# --------------------------------------------------------------------------
# WebDataset-style shard packer: the standard layout for feeding
# image+caption corpora to training jobs (tar shards of {key}.{fmt} +
# {key}.txt member pairs). Routing is a pure key hash (doc_id % N), so
# at 100 TB each shard group streams through one map_groups task and the
# tars land as independently resumable units; nothing crosses the driver.
# --------------------------------------------------------------------------
N_PACK_SHARDS = 32


def pack_tar(rows: list[tuple[int, str, bytes, str]]) -> bytes:
    """Deterministic POSIX ustar stream for (doc_id, fmt, content,
    caption) rows: members sorted by key, zeroed mtime/uid/gid, so the
    shard bytes are a pure function of its rows (byte-identical repack
    on resume — the same atomic-publish property TableStore gives
    parquet)."""
    import io
    import tarfile

    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w",
                      format=tarfile.USTAR_FORMAT) as tf:
        for doc_id, fmt, content, caption in sorted(rows):
            key = f"{doc_id:012d}"
            for name, data in ((f"{key}.{fmt}", bytes(content)),
                               (f"{key}.txt",
                                (caption or "").encode("utf-8"))):
                ti = tarfile.TarInfo(name)
                ti.size = len(data)
                ti.mtime = 0
                tf.addfile(ti, io.BytesIO(data))
    return buf.getvalue()


def image_shard_pack(sf_dir: str):
    """(shard, n_samples, caption_bytes) per packed shard — the stats are
    read BACK out of the tar stream (member count / .txt member sizes),
    so the SQL oracle transitively pins the packer's member layout, not
    just the routing. Caption cleaning is identity on this corpus (see
    multimodal_filter), so caption bytes == octet_length(text) in SQL."""
    import io
    import tarfile

    ds = flagship(sf_dir).select_columns(
        ["doc_id", "content", "fmt", "caption"])

    def prep(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        shard = pc.cast(
            pc.subtract(t["doc_id"],
                        pc.multiply(pc.divide(t["doc_id"], N_PACK_SHARDS),
                                    N_PACK_SHARDS)), pa.int64())
        return t.append_column("shard", shard)

    def pack(g) -> "pa.Table":
        rows = list(zip(g["doc_id"].tolist(), g["fmt"].tolist(),
                        g["content"].tolist(), g["caption"].tolist()))
        tar = pack_tar(rows)
        cap_bytes = 0
        n = 0
        with tarfile.open(fileobj=io.BytesIO(tar)) as tf:
            for m in tf.getmembers():
                if m.name.endswith(".txt"):
                    cap_bytes += m.size
                    n += 1
        return pa.table({
            "shard": pa.array([int(g["shard"].iloc[0])], pa.int64()),
            "n_samples": pa.array([n], pa.int64()),
            "caption_bytes": pa.array([cap_bytes], pa.int64()),
        })

    return ds.map_batches(prep, batch_format="pyarrow") \
        .groupby("shard").map_groups(pack, batch_format="pandas")


IMAGE_SHARD_PACK_SQL = f"""
SELECT CAST(doc_id % {N_PACK_SHARDS} AS BIGINT) AS shard,
       CAST(count(*) AS BIGINT) AS n_samples,
       CAST(sum(strlen(text)) AS BIGINT) AS caption_bytes
FROM documents
GROUP BY 1
"""


def webdataset_roundtrip(sf_dir: str):
    """Full WebDataset I/O loop: pack the derived corpus into tar shards
    on disk (sources/webdataset.write_webdataset — tmp+rename publish,
    skip-if-present resume), read them BACK through the shard source,
    and verify every sample end-to-end: the member pairing must
    reassemble (image, caption), the image must header-probe as exactly
    the format its member extension claims. Output one row per sample:
    (doc_id, caption_bytes, fmt_ok, decode_ok) — the oracle pins that
    every document comes back exactly once with its caption intact,
    which transitively checks pack → disk → untar → pairing → probe."""
    import os

    from ..imaging import ImageDecodeError, probe_image_meta
    from ..sources.webdataset import read_webdataset, write_webdataset

    out_dir = ("/tmp/mycelium_wds_"
               + os.path.basename(os.path.normpath(sf_dir)))
    ds = flagship(sf_dir).select_columns(
        ["doc_id", "content", "fmt", "caption"])
    write_webdataset(ds, out_dir, N_PACK_SHARDS)

    def check(t: pa.Table) -> pa.Table:
        ids, capb, fmt_ok, dec_ok = [], [], [], []
        for key, fmt, img, cap in zip(t["key"].to_pylist(),
                                      t["fmt"].to_pylist(),
                                      t["image"].to_pylist(),
                                      t["caption"].to_pylist()):
            ids.append(int(key))
            capb.append(len(cap.encode("utf-8")))
            try:
                probed, _w, _h = probe_image_meta(img)
                fmt_ok.append(probed == fmt)
                dec_ok.append(True)
            except ImageDecodeError:
                fmt_ok.append(False)
                dec_ok.append(False)
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "caption_bytes": pa.array(capb, pa.int64()),
            "fmt_ok": pa.array(fmt_ok, pa.bool_()),
            "decode_ok": pa.array(dec_ok, pa.bool_()),
        })

    return read_webdataset(out_dir).map_batches(
        check, batch_format="pyarrow")


WEBDATASET_ROUNDTRIP_SQL = """
SELECT doc_id,
       CAST(octet_length(encode(text)) AS BIGINT) AS caption_bytes,
       TRUE AS fmt_ok,
       TRUE AS decode_ok
FROM documents
"""


def image_redact(sf_dir: str):
    """End-to-end image-PII redaction: derive/decode image rows, then the
    RedactRegions actor stage (doc-derived detection box, pixelated with
    4x4 superpixel means, re-encoded in the source format). The oracle
    asserts the SQL-provable contract (one row per doc, redact_ok true —
    a decode/encode regression breaks it); the pixel semantics (outside
    the box byte-stable for lossless formats, inside mosaicked) are
    pinned by tests/test_r4_ops.py over the same derived corpus."""
    from ..stages.media import RedactRegions
    ds = flagship(sf_dir).select_columns(["image_id", "doc_id", "content"])
    out = ds.map_batches(RedactRegions(), batch_format="pyarrow",
                         batch_size=128)
    return out.select_columns(["image_id", "redact_ok"])


IMAGE_REDACT_SQL = """
SELECT 'http://img.test/d/' || CAST(doc_id AS VARCHAR) AS image_id,
       TRUE AS redact_ok
FROM documents
"""


BORDER_MOD = 9
BORDER_RES = 4


def image_border_crop(sf_dir: str):
    """(image_id, had_border, dims_match, crop_ok) — letterbox removal
    end-to-end: derive image rows, plant a constant gray letterbox on
    doc_id % 9 == 4 rows (3 + doc_id % 5 rows top and bottom, re-encoded
    losslessly), then the CropBorders stage detects and strips it. The
    oracle pins detection exactness per row: had_border on exactly the
    planted rows, and dims_match — the crop restored the ORIGINAL
    geometry (an over- or under-crop anywhere breaks the value hash).
    Random-noise content makes a false uniform edge vanishingly unlikely
    (P ≈ 256^-(3w) per row)."""
    from ..imaging import decode_image, encode_image
    from ..stages.media import CropBorders

    ds = flagship(sf_dir).select_columns(
        ["image_id", "doc_id", "content", "w_true", "h_true"])

    def plant(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        blobs = t["content"].to_pylist()
        out = []
        for d, data in zip(ids, blobs):
            px, _ = decode_image(data)
            if d % BORDER_MOD == BORDER_RES:
                k = 3 + d % 5
                pad = np.full((k, px.shape[1], 3), 128, dtype=np.uint8)
                px = np.concatenate([pad, px, pad], axis=0)
            # lossless re-encode for ALL rows so detection is exact and
            # every row pays the same codec path
            out.append(encode_image(px, "png"))
        return pa.table({
            "image_id": t["image_id"],
            "doc_id": t["doc_id"],
            "content": pa.array(out, pa.binary()),
            "w_true": t["w_true"],
            "h_true": t["h_true"],
        })

    planted = ds.map_batches(plant, batch_format="pyarrow",
                             batch_size=128)
    cropped = planted.map_batches(CropBorders(), batch_format="pyarrow",
                                  batch_size=128, concurrency=4)

    def verdict(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        match = pc.and_(
            pc.equal(pc.cast(t["cropped_w"], pa.int32()),
                     pc.cast(t["w_true"], pa.int32())),
            pc.equal(pc.cast(t["cropped_h"], pa.int32()),
                     pc.cast(t["h_true"], pa.int32())))
        return pa.table({
            "image_id": t["image_id"],
            "had_border": t["had_border"],
            "dims_match": match,
            "crop_ok": t["crop_ok"],
        })

    return cropped.map_batches(verdict, batch_format="pyarrow")


IMAGE_BORDER_CROP_SQL = f"""
SELECT 'http://img.test/d/' || CAST(doc_id AS VARCHAR) AS image_id,
       doc_id % {BORDER_MOD} = {BORDER_RES} AS had_border,
       TRUE AS dims_match,
       TRUE AS crop_ok
FROM documents
"""


# formats added in round 4 (tiff.py, bmp.py) — all lossless, so the
# transcode contract below is EXACT pixel equality, not a PSNR bound
_TRANSCODE_FMTS = ["tiff", "tiff_packbits", "tiff_none", "bmp",
                   "ppm", "tga", "tga_raw"]


def image_transcode_matrix(sf_dir: str):
    """(image_id, fmt_out, transcode_ok, dims_match) — end-to-end format
    conversion through the round-4 codecs: derive + decode each image
    (flagship corpus: png/jpeg/webp wire bytes), re-encode the pixels as
    baseline TIFF (LZW+predictor / PackBits / uncompressed) and BMP, then
    decode the transcoded bytes back and require EXACT pixel equality
    (every target is lossless) plus header-probe dims agreement. One row
    per (doc, target format); the oracle pins the full matrix TRUE — any
    codec regression (strip assembly, LZW early change, predictor,
    BGR/row-order handling) breaks the value hash."""
    from ..imaging import decode_image, encode_image, probe_image_meta

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    ds = ds.map_batches(derive_images_batch, batch_format="pyarrow",
                        batch_size=256)

    def transcode(t: pa.Table) -> pa.Table:
        ids = t["image_id"].to_pylist()
        blobs = t["content"].to_pylist()
        ws = t["w_true"].to_pylist()
        hs = t["h_true"].to_pylist()
        out_id, out_fmt, out_ok, out_dims = [], [], [], []
        for iid, data, w, h in zip(ids, blobs, ws, hs):
            px, _ = decode_image(data)
            for fmt in _TRANSCODE_FMTS:
                enc = encode_image(px, fmt)
                base = fmt.split("_")[0]
                try:
                    rt, got_fmt = decode_image(enc)
                    ok = bool(got_fmt == base and np.array_equal(rt, px))
                    pf, pw, ph = probe_image_meta(enc)
                    dims = bool(pf == base and pw == w and ph == h)
                except Exception:
                    ok = dims = False
                out_id.append(iid)
                out_fmt.append(fmt)
                out_ok.append(ok)
                out_dims.append(dims)
        return pa.table({
            "image_id": pa.array(out_id, pa.string()),
            "fmt_out": pa.array(out_fmt, pa.string()),
            "transcode_ok": pa.array(out_ok, pa.bool_()),
            "dims_match": pa.array(out_dims, pa.bool_()),
        })

    return ds.map_batches(transcode, batch_format="pyarrow",
                          batch_size=128)


IMAGE_TRANSCODE_SQL = f"""
SELECT 'http://img.test/d/' || CAST(doc_id AS VARCHAR) AS image_id,
       f.fmt_out,
       TRUE AS transcode_ok,
       TRUE AS dims_match
FROM documents
CROSS JOIN (VALUES {", ".join(f"('{f}')" for f in _TRANSCODE_FMTS)})
           AS f(fmt_out)
"""


def _exif_fields(doc_id: int) -> tuple[str, str, int, str]:
    """Deterministic Exif fields for a doc row — mirrored in the SQL
    oracles exactly (make/model/orientation/datetime are pure functions
    of doc_id)."""
    day = 1 + doc_id % 28
    return (f"Cam{doc_id % 5}", f"M{doc_id % 3}", 1 + doc_id % 8,
            f"2026:01:{day:02d} 00:00:00")


def image_exif(sf_dir: str):
    """(image_id, make, model, orientation, datetime, dims_ok,
    roundtrip_ok, strip_ok) — the Exif lifecycle end-to-end: decode each
    derived image, re-encode as baseline JPEG, embed a built Exif APP1
    (fields a pure function of doc_id), then EXTRACT the fields back with
    the real parser, verify tagged bytes still decode to identical
    pixels, and verify strip_exif_jpeg restores the untagged bytes
    byte-identically. The oracle pins every extracted field and all
    three booleans — any APP1 layout/parse/strip regression breaks the
    value hash."""
    from ..exif import (build_exif, extract_exif_jpeg, insert_exif_jpeg,
                        strip_exif_jpeg)
    from ..imaging import decode_image, encode_image

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    ds = ds.map_batches(derive_images_batch, batch_format="pyarrow",
                        batch_size=256)

    def lifecycle(t: pa.Table) -> pa.Table:
        ids = t["image_id"].to_pylist()
        dids = t["doc_id"].to_pylist()
        blobs = t["content"].to_pylist()
        ws = t["w_true"].to_pylist()
        hs = t["h_true"].to_pylist()
        cols = {k: [] for k in ("image_id", "make", "model", "orientation",
                                "datetime", "dims_ok", "roundtrip_ok",
                                "strip_ok")}
        for iid, d, data, w, h in zip(ids, dids, blobs, ws, hs):
            px, _ = decode_image(data)
            jp = encode_image(px, "jpeg")
            make, model, orient, dt = _exif_fields(d)
            tagged = insert_exif_jpeg(jp, build_exif(
                make=make, model=model, orientation=orient, datetime=dt,
                pixel_w=w, pixel_h=h))
            meta = extract_exif_jpeg(tagged) or {}
            base, _ = decode_image(jp)
            rt, _ = decode_image(tagged)
            stripped = strip_exif_jpeg(tagged)
            cols["image_id"].append(iid)
            cols["make"].append(meta.get("make", ""))
            cols["model"].append(meta.get("model", ""))
            cols["orientation"].append(meta.get("orientation", -1))
            cols["datetime"].append(meta.get("datetime", ""))
            cols["dims_ok"].append(meta.get("pixel_w") == w
                                   and meta.get("pixel_h") == h)
            cols["roundtrip_ok"].append(bool(np.array_equal(rt, base)))
            cols["strip_ok"].append(stripped == jp
                                    and extract_exif_jpeg(stripped) is None)
        return pa.table({
            "image_id": pa.array(cols["image_id"], pa.string()),
            "make": pa.array(cols["make"], pa.string()),
            "model": pa.array(cols["model"], pa.string()),
            "orientation": pa.array(cols["orientation"], pa.int64()),
            "datetime": pa.array(cols["datetime"], pa.string()),
            "dims_ok": pa.array(cols["dims_ok"], pa.bool_()),
            "roundtrip_ok": pa.array(cols["roundtrip_ok"], pa.bool_()),
            "strip_ok": pa.array(cols["strip_ok"], pa.bool_()),
        })

    return ds.map_batches(lifecycle, batch_format="pyarrow", batch_size=128)


IMAGE_EXIF_SQL = """
SELECT 'http://img.test/d/' || CAST(doc_id AS VARCHAR) AS image_id,
       'Cam' || CAST(doc_id % 5 AS VARCHAR) AS make,
       'M' || CAST(doc_id % 3 AS VARCHAR) AS model,
       1 + doc_id % 8 AS orientation,
       '2026:01:' || lpad(CAST(1 + doc_id % 28 AS VARCHAR), 2, '0')
                  || ' 00:00:00' AS datetime,
       TRUE AS dims_ok,
       TRUE AS roundtrip_ok,
       TRUE AS strip_ok
FROM documents
"""


# exif orientations 6 and 8 invert each other; the rest self-invert
_ORIENT_INVERSE = {1: 1, 2: 2, 3: 3, 4: 4, 5: 5, 6: 8, 7: 7, 8: 6}


def image_autorotate(sf_dir: str):
    """(image_id, orientation, dims_ok, pixel_roundtrip_ok) — the
    viewer-side upright transform: tag each derived image with a
    doc_id-derived orientation, apply apply_orientation, check the
    output geometry (w/h swap exactly for orientations 5-8) and that the
    inverse transform restores the original pixels bit-exactly."""
    from ..exif import apply_orientation

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    ds = ds.map_batches(derive_images_batch, batch_format="pyarrow",
                        batch_size=256)

    def rotate(t: pa.Table) -> pa.Table:
        from ..imaging import decode_image
        ids = t["image_id"].to_pylist()
        dids = t["doc_id"].to_pylist()
        blobs = t["content"].to_pylist()
        ws = t["w_true"].to_pylist()
        hs = t["h_true"].to_pylist()
        oid, oor, odims, opix = [], [], [], []
        for iid, d, data, w, h in zip(ids, dids, blobs, ws, hs):
            px, _ = decode_image(data)
            orient = 1 + d % 8
            up = apply_orientation(px, orient)
            want = (w, h) if orient < 5 else (h, w)
            back = apply_orientation(up, _ORIENT_INVERSE[orient])
            oid.append(iid)
            oor.append(orient)
            odims.append((up.shape[1], up.shape[0]) == want)
            opix.append(bool(np.array_equal(back, px)))
        return pa.table({
            "image_id": pa.array(oid, pa.string()),
            "orientation": pa.array(oor, pa.int64()),
            "dims_ok": pa.array(odims, pa.bool_()),
            "pixel_roundtrip_ok": pa.array(opix, pa.bool_()),
        })

    return ds.map_batches(rotate, batch_format="pyarrow", batch_size=128)


IMAGE_AUTOROTATE_SQL = """
SELECT 'http://img.test/d/' || CAST(doc_id AS VARCHAR) AS image_id,
       1 + doc_id % 8 AS orientation,
       TRUE AS dims_ok,
       TRUE AS pixel_roundtrip_ok
FROM documents
"""


def image_png_text(sf_dir: str):
    """(image_id, title, author, comment, note, roundtrip_ok, strip_ok)
    — the PNG textual-metadata lifecycle (the tEXt/zTXt/iTXt counterpart
    of image_exif): re-encode each derived image as PNG, embed doc_id-
    derived values through all three chunk kinds (tEXt latin-1, zTXt
    deflated, iTXt utf-8), extract them back, verify tagged bytes decode
    pixel-identically, and verify strip_png_text restores the untagged
    bytes byte-identically. Oracle pins every extracted value."""
    from ..imaging import (decode_image, encode_png, insert_png_text,
                           png_text_chunks, strip_png_text)

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    ds = ds.map_batches(derive_images_batch, batch_format="pyarrow",
                        batch_size=256)

    def lifecycle(t: pa.Table) -> pa.Table:
        ids = t["image_id"].to_pylist()
        dids = t["doc_id"].to_pylist()
        blobs = t["content"].to_pylist()
        cols = {k: [] for k in ("image_id", "title", "author", "comment",
                                "note", "roundtrip_ok", "strip_ok")}
        for iid, d, data in zip(ids, dids, blobs):
            px, _ = decode_image(data)
            png = encode_png(px)
            tagged = insert_png_text(png, {
                "Title": f"T{d % 100}", "Author": f"A{d % 7}"}, "tEXt")
            tagged = insert_png_text(tagged,
                                     {"Comment": "c" * (1 + d % 40)}, "zTXt")
            tagged = insert_png_text(tagged,
                                     {"Note": f"n☃{d % 13}"}, "iTXt")
            meta = png_text_chunks(tagged)
            rt, _ = decode_image(tagged)
            stripped = strip_png_text(tagged)
            cols["image_id"].append(iid)
            cols["title"].append(meta.get("Title", ""))
            cols["author"].append(meta.get("Author", ""))
            cols["comment"].append(meta.get("Comment", ""))
            cols["note"].append(meta.get("Note", ""))
            cols["roundtrip_ok"].append(bool(np.array_equal(rt, px)))
            cols["strip_ok"].append(stripped == png
                                    and png_text_chunks(stripped) == {})
        return pa.table({
            "image_id": pa.array(cols["image_id"], pa.string()),
            "title": pa.array(cols["title"], pa.string()),
            "author": pa.array(cols["author"], pa.string()),
            "comment": pa.array(cols["comment"], pa.string()),
            "note": pa.array(cols["note"], pa.string()),
            "roundtrip_ok": pa.array(cols["roundtrip_ok"], pa.bool_()),
            "strip_ok": pa.array(cols["strip_ok"], pa.bool_()),
        })

    return ds.map_batches(lifecycle, batch_format="pyarrow", batch_size=128)


IMAGE_PNG_TEXT_SQL = """
SELECT 'http://img.test/d/' || CAST(doc_id AS VARCHAR) AS image_id,
       'T' || CAST(doc_id % 100 AS VARCHAR) AS title,
       'A' || CAST(doc_id % 7 AS VARCHAR) AS author,
       repeat('c', CAST(1 + doc_id % 40 AS INTEGER)) AS comment,
       'n' || chr(9731) || CAST(doc_id % 13 AS VARCHAR) AS note,
       TRUE AS roundtrip_ok,
       TRUE AS strip_ok
FROM documents
"""


SSIM_DEGRADE_MOD = 6
SSIM_DEGRADE_RES = 2


def image_ssim(sf_dir: str):
    """(image_id, verdict, exact_one_ok, jpeg_band_ok) — SSIM quality
    gate (Wang 2004, uniform 8×8 window): for each derived image, score
    (a) the lossless PNG round trip — must be EXACTLY 1.0, (b) the real
    baseline-JPEG round trip — must sit in the transform-coding band
    (0.99, 1.0), and (c) classify a candidate copy as clean/degraded at
    the 0.95 threshold, where doc_id-planted rows (% 6 == 2) are 3×3
    box-blurred (SSIM collapses to ~0.15 on noise content) and the rest
    are lossless copies. The oracle pins the planted class exactly."""
    from ..imaging import decode_image, encode_image, encode_png, ssim

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    ds = ds.map_batches(derive_images_batch, batch_format="pyarrow",
                        batch_size=256)

    def _boxblur3(px: np.ndarray) -> np.ndarray:
        from numpy.lib.stride_tricks import sliding_window_view
        pad = np.pad(px, ((1, 1), (1, 1), (0, 0)),
                     mode="edge").astype(np.float64)
        return sliding_window_view(pad, (3, 3), axis=(0, 1)) \
            .mean(axis=(-1, -2)).astype(np.uint8)

    def score(t: pa.Table) -> pa.Table:
        ids = t["image_id"].to_pylist()
        dids = t["doc_id"].to_pylist()
        blobs = t["content"].to_pylist()
        oid, over, oone, ojpeg = [], [], [], []
        for iid, d, data in zip(ids, dids, blobs):
            px, _ = decode_image(data)
            s_self = ssim(px, decode_image(encode_png(px))[0])
            s_jpeg = ssim(px, decode_image(encode_image(px, "jpeg"))[0])
            cand = _boxblur3(px) if d % SSIM_DEGRADE_MOD == SSIM_DEGRADE_RES \
                else px
            verdict = "degraded" if ssim(px, cand) < 0.95 else "clean"
            oid.append(iid)
            over.append(verdict)
            oone.append(s_self == 1.0)
            ojpeg.append(0.99 < s_jpeg <= 1.0)
        return pa.table({
            "image_id": pa.array(oid, pa.string()),
            "verdict": pa.array(over, pa.string()),
            "exact_one_ok": pa.array(oone, pa.bool_()),
            "jpeg_band_ok": pa.array(ojpeg, pa.bool_()),
        })

    return ds.map_batches(score, batch_format="pyarrow", batch_size=128)


IMAGE_SSIM_SQL = f"""
SELECT 'http://img.test/d/' || CAST(doc_id AS VARCHAR) AS image_id,
       CASE WHEN doc_id % {SSIM_DEGRADE_MOD} = {SSIM_DEGRADE_RES}
            THEN 'degraded' ELSE 'clean' END AS verdict,
       TRUE AS exact_one_ok,
       TRUE AS jpeg_band_ok
FROM documents
"""


ROT_MOD = 30
ROT_RES = 11


def rot_canonical_phash(px: np.ndarray) -> int:
    """Rotation-canonical perceptual hash: min of phash64 over the four
    90-degree orientations — rotated duplicates collide, which plain
    phash cannot do (a 90-degree rotation permutes the 8x8 mean grid)."""
    from ..imaging import phash64
    return min(phash64(np.rot90(px, k)) for k in range(4))


def image_rot_invariant(sf_dir: str):
    """(image_id, planted, canon_invariant_ok, plain_phash_changed) —
    rotated-duplicate robustness end-to-end: doc_id % 30 == 11 rows are
    re-encoded as a 90/180/270-degree rotation of their own pixels (real
    codec bytes both ways); the rotation-canonical hash must be
    IDENTICAL across the rotation while the plain phash must differ
    (random-noise content: P[rot-invariant bit pattern] ~ 2^-48). The
    oracle pins the planted class and both invariants per row."""
    from ..imaging import decode_image, encode_image, phash64

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    ds = ds.map_batches(derive_images_batch, batch_format="pyarrow",
                        batch_size=256)

    def score(t: pa.Table) -> pa.Table:
        ids = t["image_id"].to_pylist()
        dids = t["doc_id"].to_pylist()
        blobs = t["content"].to_pylist()
        oid, opl, oinv, ochg = [], [], [], []
        for iid, d, data in zip(ids, dids, blobs):
            px, fmt = decode_image(data)
            planted = d % ROT_MOD == ROT_RES
            if planted:
                rot = np.rot90(px, 1 + d % 3)
                # lossless wire round trip for the rotated variant so
                # both hashes see real codec bytes
                rot, _ = decode_image(encode_image(
                    np.ascontiguousarray(rot), "png"))
                oinv.append(rot_canonical_phash(rot)
                            == rot_canonical_phash(px))
                ochg.append(phash64(rot) != phash64(px))
            else:
                oinv.append(rot_canonical_phash(px)
                            == rot_canonical_phash(px.copy()))
                ochg.append(True)
            oid.append(iid)
            opl.append(planted)
        return pa.table({
            "image_id": pa.array(oid, pa.string()),
            "planted": pa.array(opl, pa.bool_()),
            "canon_invariant_ok": pa.array(oinv, pa.bool_()),
            "plain_phash_changed": pa.array(ochg, pa.bool_()),
        })

    return ds.map_batches(score, batch_format="pyarrow", batch_size=128)


IMAGE_ROT_INVARIANT_SQL = f"""
SELECT 'http://img.test/d/' || CAST(doc_id AS VARCHAR) AS image_id,
       doc_id % {ROT_MOD} = {ROT_RES} AS planted,
       TRUE AS canon_invariant_ok,
       TRUE AS plain_phash_changed
FROM documents
"""


def image_exif_thumbnail(sf_dir: str):
    """(image_id, has_thumb, thumb_decodes, thumb_dims_ok, strip_ok) —
    the camera-thumbnail lifecycle (Exif 2.3 §4.6.3 IFD1): derive each
    image, re-encode as JPEG, embed a REAL half-resolution JPEG
    thumbnail (block-mean resize → in-repo encoder) via IFD1's
    JPEGInterchangeFormat pointer pair, extract it back, decode it with
    the real decoder and check its geometry; stripping restores the
    untagged bytes. Every row TRUE in the oracle — any IFD1 layout,
    pointer, or thumbnail-codec regression breaks the value hash."""
    from ..exif import (build_exif, extract_exif_jpeg, insert_exif_jpeg,
                        strip_exif_jpeg)
    from ..imaging import decode_image, encode_image
    from ..stages.media import resize_block_mean

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    ds = ds.map_batches(derive_images_batch, batch_format="pyarrow",
                        batch_size=256)

    def lifecycle(t: pa.Table) -> pa.Table:
        ids = t["image_id"].to_pylist()
        blobs = t["content"].to_pylist()
        ws = t["w_true"].to_pylist()
        hs = t["h_true"].to_pylist()
        cols = {k: [] for k in ("image_id", "has_thumb", "thumb_decodes",
                                "thumb_dims_ok", "strip_ok")}
        for iid, data, w, h in zip(ids, blobs, ws, hs):
            px, _ = decode_image(data)
            tw, th = max(1, w // 2), max(1, h // 2)
            thumb = encode_image(resize_block_mean(px, tw, th), "jpeg")
            jp = encode_image(px, "jpeg")
            tagged = insert_exif_jpeg(jp, build_exif(orientation=1,
                                                     thumbnail=thumb))
            meta = extract_exif_jpeg(tagged) or {}
            got = meta.get("thumbnail")
            ok_dims = ok_dec = False
            if got is not None:
                try:
                    tp, fmt = decode_image(bytes(got))
                    ok_dec = fmt == "jpeg"
                    ok_dims = tp.shape == (th, tw, 3)
                except Exception:
                    pass
            cols["image_id"].append(iid)
            cols["has_thumb"].append(got == thumb)
            cols["thumb_decodes"].append(ok_dec)
            cols["thumb_dims_ok"].append(ok_dims)
            cols["strip_ok"].append(strip_exif_jpeg(tagged) == jp)
        return pa.table({
            "image_id": pa.array(cols["image_id"], pa.string()),
            "has_thumb": pa.array(cols["has_thumb"], pa.bool_()),
            "thumb_decodes": pa.array(cols["thumb_decodes"], pa.bool_()),
            "thumb_dims_ok": pa.array(cols["thumb_dims_ok"], pa.bool_()),
            "strip_ok": pa.array(cols["strip_ok"], pa.bool_()),
        })

    return ds.map_batches(lifecycle, batch_format="pyarrow",
                          batch_size=128)


IMAGE_EXIF_THUMBNAIL_SQL = """
SELECT 'http://img.test/d/' || CAST(doc_id AS VARCHAR) AS image_id,
       TRUE AS has_thumb,
       TRUE AS thumb_decodes,
       TRUE AS thumb_dims_ok,
       TRUE AS strip_ok
FROM documents
"""


def image_palette_gif(sf_dir: str):
    """(image_id, n_colors_ok, gif_exact, beats_fixed_cube) — adaptive
    palette quantization end-to-end: median-cut (Heckbert 1982) each
    derived image to <=216 colors, map pixels to the palette, push the
    quantized frame through the REAL GIF codec (exact for palettized
    content), and require the adaptive palette to beat the fixed
    web-safe 6x6x6 cube on MSE (it always does: same budget, placed
    where this image's colors actually live). Oracle pins all three
    verdicts per row."""
    from ..gif import (decode_gif, encode_gif, median_cut_palette,
                       posterize_216, quantize_to_palette)
    from ..imaging import decode_image

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    ds = ds.map_batches(derive_images_batch, batch_format="pyarrow",
                        batch_size=256)

    def run(t: pa.Table) -> pa.Table:
        ids = t["image_id"].to_pylist()
        blobs = t["content"].to_pylist()
        oid, ocol, oexact, obeat = [], [], [], []
        for iid, data in zip(ids, blobs):
            px, _ = decode_image(data)
            pal = median_cut_palette(px, 216)
            q = quantize_to_palette(px, pal)
            rt = decode_gif(encode_gif(q))
            mse_mc = float(((q.astype(np.float64) - px) ** 2).mean())
            ps = posterize_216(px)
            mse_ps = float(((ps.astype(np.float64) - px) ** 2).mean())
            oid.append(iid)
            ocol.append(len(pal) <= 216)
            oexact.append(bool(np.array_equal(rt, q)))
            obeat.append(mse_mc <= mse_ps)
        return pa.table({
            "image_id": pa.array(oid, pa.string()),
            "n_colors_ok": pa.array(ocol, pa.bool_()),
            "gif_exact": pa.array(oexact, pa.bool_()),
            "beats_fixed_cube": pa.array(obeat, pa.bool_()),
        })

    return ds.map_batches(run, batch_format="pyarrow", batch_size=128)


IMAGE_PALETTE_GIF_SQL = """
SELECT 'http://img.test/d/' || CAST(doc_id AS VARCHAR) AS image_id,
       TRUE AS n_colors_ok,
       TRUE AS gif_exact,
       TRUE AS beats_fixed_cube
FROM documents
"""


N_ZIP_SHARDS = 16


def zip_roundtrip(sf_dir: str):
    """Full ZIP-archive I/O loop (zipfmt.py, the from-scratch PKWARE
    container with stdlib-zipfile interop pinned in tests): hash-route
    derived (image, caption) pairs to zip shards on disk (deterministic
    bytes, tmp+rename publish, skip-if-present resume), read every shard
    BACK through the CRC-verifying reader, and emit one row per doc:
    (doc_id, caption_bytes, fmt_ok, n_members_ok). The oracle pins that
    every document comes back exactly once with caption intact —
    transitively checking writer → deflate members → central directory →
    reader → pairing → probe."""
    import os

    from ..imaging import ImageDecodeError, probe_image_meta
    from ..zipfmt import pack_zip, read_zip

    out_dir = ("/tmp/mycelium_zip_"
               + os.path.basename(os.path.normpath(sf_dir)))
    os.makedirs(out_dir, exist_ok=True)
    ds = flagship(sf_dir).select_columns(
        ["doc_id", "content", "fmt", "caption"])

    def route(t: pa.Table) -> pa.Table:
        shard = pa.array([int(d) % N_ZIP_SHARDS
                          for d in t["doc_id"].to_pylist()], pa.int64())
        return t.append_column("shard", shard)

    def pack_and_publish(g) -> pa.Table:
        s = int(g["shard"].iloc[0])
        path = os.path.join(out_dir, f"shard-{s:05d}.zip")
        if not os.path.exists(path):
            g = g.sort_values("doc_id")
            members = []
            for r in g.itertuples(index=False):
                key = f"{int(r.doc_id):012d}"
                members.append((f"{key}.{r.fmt}", bytes(r.content)))
                members.append((f"{key}.txt",
                                (r.caption or "").encode("utf-8")))
            tmp = path + ".tmp"
            with open(tmp, "wb") as f:
                f.write(pack_zip(members))
            os.replace(tmp, path)
        return pa.table({"path": pa.array([path], pa.string())})

    ds.map_batches(route, batch_format="pyarrow") \
        .groupby("shard").map_groups(pack_and_publish,
                                     batch_format="pandas").materialize()

    paths = sorted(os.path.join(out_dir, f) for f in os.listdir(out_dir)
                   if f.endswith(".zip"))

    def parse_shard(batch: pa.Table) -> pa.Table:
        ids, capb, fmt_ok, nmem_ok = [], [], [], []
        for p in batch["path"].to_pylist():
            with open(p, "rb") as f:
                members = read_zip(f.read())
            docs: dict[int, dict] = {}
            for name, payload in members:
                key, _, ext = name.partition(".")
                d = docs.setdefault(int(key), {"n": 0})
                d["n"] += 1
                if ext == "txt":
                    d["cap"] = len(payload)
                else:
                    try:
                        probed, _w, _h = probe_image_meta(payload)
                        d["fmt_ok"] = probed == ext
                    except ImageDecodeError:
                        d["fmt_ok"] = False
            for did in sorted(docs):
                ids.append(did)
                capb.append(docs[did].get("cap", -1))
                fmt_ok.append(docs[did].get("fmt_ok", False))
                nmem_ok.append(docs[did]["n"] == 2)
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "caption_bytes": pa.array(capb, pa.int64()),
            "fmt_ok": pa.array(fmt_ok, pa.bool_()),
            "n_members_ok": pa.array(nmem_ok, pa.bool_()),
        })

    return rd.from_items(
        [{"path": p} for p in paths], override_num_blocks=len(paths),
    ).map_batches(parse_shard, batch_format="pyarrow", batch_size=1)


ZIP_ROUNDTRIP_SQL = """
SELECT doc_id,
       CAST(octet_length(encode(text)) AS BIGINT) AS caption_bytes,
       TRUE AS fmt_ok,
       TRUE AS n_members_ok
FROM documents
"""
