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
