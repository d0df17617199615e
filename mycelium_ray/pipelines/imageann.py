"""Image embedding + similarity search — the image leg of the ANN
family (pipelines/ann.py runs the same shapes over the embeddings
table; here the vectors come from REAL pixel decode).

Embedding: decode → grayscale → 8×8 block-mean → CENTER (subtract the
vector's own mean — uncentered block-means of natural/noise content are
all ≈ the global brightness, which pushes every cosine toward 1) →
fixed seeded random projection 64→32 → unit norm. The projection matrix
is "model state": built once per actor in ``__init__``, applied as one
matmul per batch — the actor-pool inference shape from the build brief.

Identical pixels ⇒ identical embeddings (cosine exactly 1), independent
images land near-orthogonal (centered projections; empirically
|cos| ≲ 0.6 ≪ the 0.99 gate at corpus scale), so the similarity search
over the flagship corpus is fully ORACLE-CHECKED: matches ≥ 0.99 are
exactly the planted same-seed-key pairs (the image_phash_neardup
argument, transferred from hamming-0 to cosine-1).

Scale story: query embeddings are broadcast once via ``ray.put``; each
batch does one (batch × 32) · (32 × Q) matmul and emits only rows above
the gate — shuffle ∝ matches, never ∝ corpus × Q. The embed stage
itself is embarrassingly parallel over batches.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data as rd

EMBED_DIM = 32
_PROJ_SEED = 20260819
SIM_THRESHOLD = 0.99
# the planted dup-group reps from flagship._seed_key: doc_id % 50 == 0
# join group doc_id % 150 — one query per group
QUERY_DOC_IDS = (0, 50, 100)


def _projection() -> np.ndarray:
    """Fixed signed projection (64 → EMBED_DIM), same for every actor."""
    rng = np.random.default_rng(_PROJ_SEED)
    return rng.standard_normal((64, EMBED_DIM)).astype(np.float64)


def embed_pixels(px: np.ndarray, proj: np.ndarray) -> np.ndarray:
    """(h, w, 3) uint8 → unit-norm float64[EMBED_DIM] (see module doc)."""
    g = (0.299 * px[..., 0] + 0.587 * px[..., 1]
         + 0.114 * px[..., 2]).astype(np.float64)
    h, w = g.shape
    yi = np.arange(h) * 8 // h
    xi = np.arange(w) * 8 // w
    small = np.zeros((8, 8))
    cnt = np.zeros((8, 8))
    np.add.at(small, (yi[:, None].repeat(w, 1),
                      xi[None, :].repeat(h, 0)), g)
    np.add.at(cnt, (yi[:, None].repeat(w, 1),
                    xi[None, :].repeat(h, 0)), 1.0)
    feat = (small / np.maximum(cnt, 1)).ravel()
    feat = feat - feat.mean()
    v = feat @ proj
    n = np.linalg.norm(v)
    return v / n if n > 0 else v


class ImageEmbed:
    """content:binary → embedding:list<double>[EMBED_DIM] (+decode_ok).
    Projection built once per actor; per-row decode is inherent to
    variable-size compressed payloads, everything after is matmul."""

    def __init__(self, content_col: str = "content"):
        self.content_col = content_col
        self.proj = _projection()

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..imaging import ImageDecodeError, decode_image
        embs = []
        ok = []
        for data in batch[self.content_col].to_pylist():
            try:
                px, _ = decode_image(data)
                embs.append(embed_pixels(px, self.proj))
                ok.append(True)
            except ImageDecodeError:
                embs.append(np.zeros(EMBED_DIM))
                ok.append(False)
        flat = np.concatenate(embs) if embs else np.zeros(0)
        col = pa.FixedSizeListArray.from_arrays(
            pa.array(flat, pa.float64()), EMBED_DIM)
        return (batch.append_column("embedding", col)
                     .append_column("embed_ok", pa.array(ok)))


def image_embed(sf_dir: str):
    """(doc_id, embedding, embed_ok) over the derived image corpus —
    rows-only key (pixel-derived floats have no SQL dual; unit-norm /
    determinism / dup-identity invariants are pinned in pytest)."""
    from .flagship import flagship
    ds = flagship(sf_dir).select_columns(["doc_id", "content"])
    ds = ds.map_batches(ImageEmbed(), batch_format="pyarrow",
                        batch_size=128, concurrency=4)
    return ds.select_columns(["doc_id", "embedding", "embed_ok"])


def image_similarity_search(sf_dir: str,
                            threshold: float = SIM_THRESHOLD):
    """(query_id, match_id) — corpus images whose embedding cosine with
    a query image clears ``threshold`` (self-matches included). Query
    vectors are computed once on the driver from 3 derived rows and
    broadcast; the scan emits only gated rows."""
    import pyarrow.parquet as pq

    from ..imaging import decode_image
    from .flagship import synth_image_row

    docs = pq.read_table(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    texts = {d: t for d, t in zip(docs["doc_id"].to_pylist(),
                                  docs["text"].to_pylist())
             if d in QUERY_DOC_IDS}
    proj = _projection()
    qids = sorted(texts)
    qmat = np.stack([
        embed_pixels(decode_image(synth_image_row(d, texts[d])[0])[0],
                     proj) for d in qids])           # (Q, EMBED_DIM)
    q_ref = ray.put((np.asarray(qids, dtype=np.int64), qmat))

    emb = image_embed(sf_dir)

    def probe(t: pa.Table) -> pa.Table:
        qid_arr, qm = ray.get(q_ref)
        m = np.asarray(t["embedding"].combine_chunks().flatten()) \
            .reshape(-1, EMBED_DIM)
        ok = t["embed_ok"].to_numpy(zero_copy_only=False)
        sims = m @ qm.T                              # (rows, Q)
        rows, qs = np.nonzero((sims >= threshold) & ok[:, None])
        ids = t["doc_id"].to_numpy()
        return pa.table({
            "query_id": pa.array(qid_arr[qs], pa.int64()),
            "match_id": pa.array(ids[rows].astype("int64"), pa.int64()),
        })

    from .dedup import sorted_or_empty
    return sorted_or_empty(
        emb.map_batches(probe, batch_format="pyarrow"),
        ["query_id", "match_id"],
        pa.table({"query_id": pa.array([], pa.int64()),
                  "match_id": pa.array([], pa.int64())}))


ALIGN_SWAP_MOD = 17   # doc_id % 17 == 3 → planted mismatched caption
_ALIGN_SWAP_SUFFIX = " [swapped]"


class CaptionAlignScore:
    """(content, caption) → align_ok — a CLIP-score-style two-tower
    alignment gate, the core curation op of web-scale image+caption
    pipelines (LAION-style filtering: score every pair, keep above a
    threshold). Image tower: REAL decode → embed_pixels. Caption tower:
    deterministic render of the caption through the corpus's own byte
    path (flagship.synth_image_from_seed) → decode → embed, so an
    aligned pair scores cosine exactly 1.0 and any mismatch lands
    near-orthogonal (module doc) — far below the 0.99 gate.

    Actor state (projection matrix + a bounded caption-embedding cache
    for exact-duplicate captions) is built once per actor; per-row
    decode is inherent to variable-size compressed payloads."""

    _CACHE_MAX = 4096

    def __init__(self, threshold: float = SIM_THRESHOLD):
        self.proj = _projection()
        self.threshold = threshold
        self._cap_cache: dict[int, np.ndarray] = {}

    def _caption_embedding(self, caption: str) -> np.ndarray:
        from ..hashing import url_hash64
        from ..imaging import decode_image
        from .flagship import synth_image_from_seed
        seed = url_hash64("txt:" + (caption or ""))
        hit = self._cap_cache.get(seed)
        if hit is not None:
            return hit
        px, _ = decode_image(synth_image_from_seed(seed)[0])
        v = embed_pixels(px, self.proj)
        if len(self._cap_cache) < self._CACHE_MAX:
            self._cap_cache[seed] = v
        return v

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..imaging import ImageDecodeError, decode_image
        ok = []
        for data, cap in zip(batch["content"].to_pylist(),
                             batch["caption"].to_pylist()):
            try:
                px, _ = decode_image(data)
                img_e = embed_pixels(px, self.proj)
                cap_e = self._caption_embedding(cap)
                ok.append(bool(img_e @ cap_e >= self.threshold))
            except ImageDecodeError:
                ok.append(False)
        return pa.table({"doc_id": batch["doc_id"],
                         "align_ok": pa.array(ok, pa.bool_())})


def caption_align(sf_dir: str, threshold: float = SIM_THRESHOLD):
    """(doc_id, align_ok) — caption↔image alignment over the derived
    corpus, with a planted mismatch class so BOTH outcomes are
    non-vacuous at every sf:

    - rows with ``doc_id % 17 == 3`` carry a deliberately wrong caption
      (suffix-mangled, so its render seed can never equal the image's);
    - planted dup-group rows (``doc_id % 50 == 0``) keep their caption
      but their PIXELS are keyed off the shared dup group, not the text
      (flagship._seed_key) — a naturally misaligned pair, exactly the
      shape LAION-style filters drop.

    Everything else renders from its own caption → cosine exactly 1.
    The SQL dual is pure integer arithmetic on doc_id."""
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])

    def derive(batch: pa.Table) -> pa.Table:
        from .flagship import synth_image_row
        ids = batch["doc_id"].to_pylist()
        texts = batch["text"].to_pylist()
        caps = [t + _ALIGN_SWAP_SUFFIX if d % ALIGN_SWAP_MOD == 3 else t
                for d, t in zip(ids, texts)]
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "content": pa.array(
                [synth_image_row(d, t)[0] for d, t in zip(ids, texts)],
                pa.binary()),
            "caption": pa.array(caps, pa.string()),
        })

    ds = ds.map_batches(derive, batch_format="pyarrow", batch_size=256)
    scored = ds.map_batches(CaptionAlignScore(threshold),
                            batch_format="pyarrow", batch_size=128,
                            concurrency=4)
    return scored.sort("doc_id")


CAPTION_ALIGN_SQL = """
SELECT doc_id,
       (doc_id % 17 <> 3 AND doc_id % 50 <> 0) AS align_ok
FROM documents
ORDER BY doc_id
"""


# Matches ≥ 0.99 are exactly the same-seed-key pairs (identical pixels):
# the queries are dup-group reps (doc_id % 50 == 0), whose seed key is
# dup:(doc_id % 150) — so a corpus doc matches iff it sits in the same
# planted group. Non-dup cosines stay far below the gate (see module
# doc); a violation would fail this compare loudly.
IMAGE_SIMILARITY_SQL = """
SELECT q.doc_id AS query_id, d.doc_id AS match_id
FROM documents q, documents d
WHERE q.doc_id IN (0, 50, 100)
  AND d.doc_id % 50 = 0
  AND d.doc_id % 150 = q.doc_id % 150
"""


# --------------------------------------------------------------------------
# image_curation_pipeline: the image-side dual of textops.curation_pipeline
# — one composed LAION-style curation pass over derived image+caption rows:
#   1. caption-length gate (cheap, BEFORE any decode);
#   2. alignment gate (REAL decode + two-tower cosine, CaptionAlignScore
#      semantics incl. the swapped-caption and dup-pixel plants);
#   3. exact-image dedup among survivors (REAL byte hashing, min-doc_id
#      representative — one bucketed shuffle, dedup_exact's shape).
# A dup-family plant (doc_id % 23 == 7 → one of 3 shared captions) keeps
# the 'duplicate' outcome non-vacuous at every sf; every status class is
# populated everywhere. Per-row verdicts, CASE precedence mirrored in SQL.
# --------------------------------------------------------------------------
CUR_FAM_MOD = 23
CUR_FAM_RES = 7
CUR_MIN_CAPTION = 100


def _family_caption(m: int) -> str:
    return (f"curation dup family {m}: "
            + "shared caption for exact byte image dedup " * 3)


class CurationScore:
    """(doc_id, content, caption) → (doc_id, caplen_ok, align_ok,
    img_hash). Length gate runs before decode (drop cheap, decode only
    what survives); alignment reuses the CaptionAlignScore towers;
    img_hash is the 64-bit hash of the REAL encoded bytes."""

    def __init__(self, threshold: float = SIM_THRESHOLD,
                 min_caption: int = CUR_MIN_CAPTION):
        self.align = CaptionAlignScore(threshold)
        self.min_caption = min_caption

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..hashing import url_hash64
        from ..imaging import ImageDecodeError, decode_image
        caplen_ok, align_ok, hashes = [], [], []
        for data, cap in zip(batch["content"].to_pylist(),
                             batch["caption"].to_pylist()):
            if len(cap or "") < self.min_caption:
                caplen_ok.append(False)
                align_ok.append(False)
                hashes.append(0)
                continue
            caplen_ok.append(True)
            try:
                px, _ = decode_image(data)
                img_e = embed_pixels(px, self.align.proj)
                cap_e = self.align._caption_embedding(cap)
                ok = bool(img_e @ cap_e >= self.align.threshold)
            except ImageDecodeError:
                ok = False
            align_ok.append(ok)
            hashes.append(
                int(np.uint64(url_hash64(data)).astype(np.int64)) if ok
                else 0)
        return pa.table({
            "doc_id": batch["doc_id"],
            "caplen_ok": pa.array(caplen_ok, pa.bool_()),
            "align_ok": pa.array(align_ok, pa.bool_()),
            "img_hash": pa.array(hashes, pa.int64()),
        })


def image_curation_pipeline(sf_dir: str):
    """(doc_id, status) with status ∈ {kept, short_caption, misaligned,
    duplicate} under the composed gates, value-checked end-to-end."""
    from .dedup import N_BUCKETS

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])

    def derive(batch: pa.Table) -> pa.Table:
        from .flagship import synth_image_row
        ids = batch["doc_id"].to_pylist()
        texts = batch["text"].to_pylist()
        base = [_family_caption(d % 3)
                if d % CUR_FAM_MOD == CUR_FAM_RES else t
                for d, t in zip(ids, texts)]
        caps = [b + _ALIGN_SWAP_SUFFIX if d % ALIGN_SWAP_MOD == 3 else b
                for d, b in zip(ids, base)]
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "content": pa.array(
                [synth_image_row(d, b)[0] for d, b in zip(ids, base)],
                pa.binary()),
            "caption": pa.array(caps, pa.string()),
        })

    scored = ds.map_batches(derive, batch_format="pyarrow",
                            batch_size=256) \
        .map_batches(CurationScore(), batch_format="pyarrow",
                     batch_size=128, concurrency=4).materialize()

    def dropped(t: pa.Table) -> pa.Table:
        cl = t["caplen_ok"].to_numpy(zero_copy_only=False)
        al = t["align_ok"].to_numpy(zero_copy_only=False)
        ids = t["doc_id"].to_numpy()
        keep = ~(cl & al)
        status = np.where(cl[keep], "misaligned", "short_caption")
        return pa.table({"doc_id": pa.array(ids[keep], pa.int64()),
                         "status": pa.array(status)})

    def surv(t: pa.Table) -> pa.Table:
        m = (t["caplen_ok"].to_numpy(zero_copy_only=False)
             & t["align_ok"].to_numpy(zero_copy_only=False))
        h = t["img_hash"].to_numpy()[m]
        return pa.table({
            "doc_id": pa.array(t["doc_id"].to_numpy()[m], pa.int64()),
            "img_hash": pa.array(h, pa.int64()),
            "bucket": pa.array(h % N_BUCKETS, pa.int64()),
        })

    def dedup(g):
        rep = g.groupby("img_hash")["doc_id"].transform("min")
        # arrow output so the union's block types match the dropped side
        return pa.table({
            "doc_id": pa.array(g["doc_id"].to_numpy(), pa.int64()),
            "status": pa.array(
                np.where(g["doc_id"].to_numpy() == rep.to_numpy(),
                         "kept", "duplicate")),
        })

    verdicts = scored.map_batches(surv, batch_format="pyarrow") \
        .groupby("bucket").map_groups(dedup, batch_format="pandas") \
        .union(scored.map_batches(dropped, batch_format="pyarrow"))
    return verdicts.sort("doc_id")


IMAGE_CURATION_SQL = f"""
WITH base AS (
  SELECT doc_id,
         CASE WHEN doc_id % {CUR_FAM_MOD} = {CUR_FAM_RES}
              THEN {len(_family_caption(0))} ELSE length(text) END
           + CASE WHEN doc_id % {ALIGN_SWAP_MOD} = 3 THEN 10 ELSE 0 END
           AS caplen,
         (doc_id % {ALIGN_SWAP_MOD} <> 3 AND doc_id % 50 <> 0) AS aligned,
         CASE WHEN doc_id % {CUR_FAM_MOD} = {CUR_FAM_RES}
              THEN 'F' || CAST(doc_id % 3 AS VARCHAR)
              ELSE 'T' || text END AS pix_key
  FROM documents
), surv AS (
  SELECT doc_id, pix_key FROM base
  WHERE caplen >= {CUR_MIN_CAPTION} AND aligned
), rep AS (SELECT pix_key, min(doc_id) AS rep_id FROM surv GROUP BY 1)
SELECT b.doc_id,
       CASE WHEN b.caplen < {CUR_MIN_CAPTION} THEN 'short_caption'
            WHEN NOT b.aligned THEN 'misaligned'
            WHEN b.doc_id <> r.rep_id THEN 'duplicate'
            ELSE 'kept' END AS status
FROM base b LEFT JOIN rep r ON b.pix_key = r.pix_key
ORDER BY b.doc_id
"""
