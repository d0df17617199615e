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


def emb_matrix(col) -> np.ndarray:
    """Arrow list<float> column (Array or ChunkedArray) → (n, dim)
    float64 matrix in one vectorized flatten+reshape — no per-row
    stacking (the flatten respects list offsets, so sliced/chunked
    blocks convert correctly)."""
    import pyarrow as pa
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    vals = col.flatten().to_numpy(zero_copy_only=False)
    if n == 0:
        return vals.reshape(0, 0).astype(np.float64)
    return vals.reshape(n, -1).astype(np.float64)


def _query_matrix(sf_dir: str) -> tuple[np.ndarray, np.ndarray]:
    import pyarrow.parquet as pq
    import pyarrow.compute as pc
    t = pq.read_table(f"{sf_dir}/embeddings.parquet",
                      columns=["vec_id", "embedding"])
    mask = pc.less(t["vec_id"], N_QUERIES)
    t = t.filter(mask).sort_by("vec_id")
    return t["vec_id"].to_numpy(), emb_matrix(t["embedding"])


def _topk_idx(sims: np.ndarray, vids: np.ndarray, k: int) -> np.ndarray:
    """Indices of the top-k by (sim desc, vec_id asc). argpartition alone
    breaks exact-sim ties arbitrarily at the k-th slot — with duplicate
    embeddings the kept vec_id would then depend on Ray block boundaries;
    a full deterministic lexsort keeps the global merge reproducible and
    oracle-consistent (batches are small; ties can be arbitrarily wide)."""
    n = len(sims)
    take = min(k, n)
    if take == 0:
        return np.array([], dtype=np.int64)
    order = np.lexsort((vids, -sims))  # full sort: ties can be arbitrarily
    return order[:take]                # wide, and batches are small


def _score_candidates(mn: np.ndarray, vids: np.ndarray, qids: np.ndarray,
                      qnm: np.ndarray, k: int, cand_mask_fn,
                      with_stats: bool) -> pd.DataFrame:
    """Shared exact-ranking tail of every bucketed ANN scorer (LSH, IVF,
    persisted-index probe): per query, ``cand_mask_fn(qi)`` masks this
    batch's candidate rows, exact sims run on candidates only, and a
    per-batch partial top-k caps the shuffle at k rows/query/batch.
    ``with_stats`` appends one query_id=-1 stats row with the batch's
    candidate count. One copy keeps the three callers bit-identical."""
    rows = {"query_id": [], "vec_id": [], "sim": []}
    n_cand_total = 0
    for qi in range(qnm.shape[0]):
        cand = cand_mask_fn(qi)
        n_cand = int(cand.sum())
        n_cand_total += n_cand
        if n_cand == 0:
            continue
        sims_c = mn[cand] @ qnm[qi]
        cvids = vids[cand]
        idx = _topk_idx(sims_c, cvids, k)
        rows["query_id"].extend([int(qids[qi])] * len(idx))
        rows["vec_id"].extend(cvids[idx].tolist())
        rows["sim"].extend(sims_c[idx].tolist())
    out = pd.DataFrame(rows)
    out["n_cand"] = 0
    out["n_total"] = 0
    if with_stats:
        out = pd.concat([out, pd.DataFrame(
            {"query_id": [-1], "vec_id": [-1], "sim": [0.0],
             "n_cand": [n_cand_total],
             "n_total": [len(vids) * qnm.shape[0]]})],
            ignore_index=True)
    return out


def _emb_vids(t: pa.Table, dim: int) -> tuple[np.ndarray, np.ndarray]:
    """Arrow batch → (L2-normalized (n, dim) float64 matrix, vec_ids) via
    the vectorized emb_matrix — empty-batch safe (Arrow can't tell us the
    list width of zero rows, hence the explicit ``dim``)."""
    if t.num_rows == 0:
        return (np.empty((0, dim), dtype="float64"),
                np.empty(0, dtype="int64"))
    m = emb_matrix(t["embedding"])
    return (m / np.linalg.norm(m, axis=1, keepdims=True),
            t["vec_id"].to_numpy())


def _batch_sims(t: pa.Table, q: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Arrow batch → (vec_ids, (rows, n_queries) cosine sims). Vectorized
    emb_matrix (flatten+reshape on list offsets) — no per-row stacking."""
    if t.num_rows == 0:
        return (np.empty(0, dtype="int64"),
                np.empty((0, q.shape[0]), dtype="float64"))
    m = emb_matrix(t["embedding"])
    qn = q / np.linalg.norm(q, axis=1, keepdims=True)
    mn = m / np.linalg.norm(m, axis=1, keepdims=True)
    return t["vec_id"].to_numpy(), mn @ qn.T  # (rows, n_queries)


def _merge_topk(parts_ds, k: int, with_stats: bool):
    """Distributed final merge of per-batch partial top-k rows: groupby
    query_id → per-query (sim desc, vec_id asc) cut with rank. The driver
    collects k rows per query (plus one summed stats row when requested)
    instead of k·queries·blocks partial rows — at 10^6 input blocks the
    old driver-side merge would itself be a scale bottleneck. Returns
    (table, stats|None)."""
    def topk_of_query(g: pd.DataFrame) -> pd.DataFrame:
        if (g["query_id"] < 0).all():  # stats rows: sum across batches
            out = g.iloc[:1].copy()
            if "n_cand" in g.columns:
                out["n_cand"] = g["n_cand"].sum()
                out["n_total"] = g["n_total"].sum()
            out["rank"] = 0
            return out
        g = g.sort_values(["sim", "vec_id"],
                          ascending=[False, True]).head(k).copy()
        g["rank"] = np.arange(1, len(g) + 1, dtype="int64")
        return g

    merged = parts_ds.groupby("query_id").map_groups(
        topk_of_query, batch_format="pandas").to_pandas()
    if "query_id" not in merged.columns:  # zero partial rows anywhere →
        # empty groupby yields a column-less frame, not an empty schema
        empty = pa.table({"query_id": pa.array([], pa.int64()),
                          "rank": pa.array([], pa.int64()),
                          "vec_id": pa.array([], pa.int64())})
        return (empty, None) if not with_stats else \
            (empty, {"n_candidates": 0, "n_rows_x_queries": 0})
    res = merged[merged["query_id"] >= 0] \
        .sort_values(["query_id", "rank"])
    table = pa.table({
        "query_id": pa.array(res["query_id"].astype("int64")),
        "rank": pa.array(res["rank"].astype("int64")),
        "vec_id": pa.array(res["vec_id"].astype("int64")),
    })
    if not with_stats:
        return table, None
    srows = merged[merged["query_id"] < 0]
    return table, {"n_candidates": int(srows["n_cand"].sum()),
                   "n_rows_x_queries": int(srows["n_total"].sum())}


def ann_topk(sf_dir: str, k: int = TOPK):
    """(query_id, rank, vec_id) — exact cosine top-k per query vector.

    Per-batch partial top-k (the combiner) keeps only k rows per query per
    batch; the final per-query cut is a tiny distributed groupby — no
    global sort, and the driver only ever sees k rows per query.
    """
    qids, q = _query_matrix(sf_dir)
    q_ref = ray.put(q)

    def partial_topk(t: pa.Table) -> pd.DataFrame:
        qm = ray.get(q_ref)
        vids, sims = _batch_sims(t, qm)
        rows = {"query_id": [], "vec_id": [], "sim": []}
        for qi in range(sims.shape[1]):
            s = sims[:, qi]
            idx = _topk_idx(s, vids, k)
            rows["query_id"].extend([int(qids[qi])] * len(idx))
            rows["vec_id"].extend(vids[idx].tolist())
            rows["sim"].extend(s[idx].tolist())
        return pd.DataFrame(rows)

    parts = _read_emb(sf_dir).map_batches(partial_topk,
                                          batch_format="pyarrow")
    table, _ = _merge_topk(parts, k, with_stats=False)
    return table


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


def ann_topk_lsh(sf_dir: str, k: int = TOPK, with_stats: bool = False):
    """Approximate top-k: multi-table random-hyperplane LSH; candidates
    (any-table collision with the query) are exact-ranked. Signatures are
    computed FIRST and similarities only for the candidate subset — the
    pruning is real: exact dot products run on ~L·n/2^b of the corpus, not
    all of it (the amortized-at-scale cost is the signature pass, which a
    persisted IVF/LSH index would precompute once). Per-batch partial
    top-k caps the shuffle at k rows per query per batch. Recall vs brute
    force and candidate-fraction ≪ 1 are asserted in tests (testdata
    embeddings are unclustered — LSH's worst case — so the recall floor
    there is modest). ``with_stats`` returns (table, {n_candidates,
    n_scored_rows, n_rows_x_queries})."""
    qids, q = _query_matrix(sf_dir)
    planes = _hyperplanes(q.shape[1])
    qn = q / np.linalg.norm(q, axis=1, keepdims=True)
    qsig = _signatures(qn, planes)  # (n_queries, N_TABLES)
    planes_ref = ray.put(planes)
    qn_ref = ray.put(qn)
    qsig_ref = ray.put(qsig)

    def bucket_and_score(t: pa.Table) -> pd.DataFrame:
        pl = ray.get(planes_ref)
        qnm = ray.get(qn_ref)
        qs = ray.get(qsig_ref)
        mn, vids = _emb_vids(t, qnm.shape[1])
        sigs = _signatures(mn, pl)  # (rows, N_TABLES)
        # exact sims for the CANDIDATES only — the pruned matmul
        return _score_candidates(
            mn, vids, qids, qnm, k,
            lambda qi: (sigs == qs[qi][None, :]).any(axis=1), with_stats)

    parts = _read_emb(sf_dir).map_batches(bucket_and_score,
                                          batch_format="pyarrow")
    table, stats = _merge_topk(parts, k, with_stats)
    return (table, stats) if with_stats else table


# --------------------------------------------------------------------------
# IVF-bucketed ANN (the coarse-quantizer scale path): k-means centroids
# trained on a deterministic sample, broadcast once; each batch assigns
# rows to their nearest centroid and scores a row for a query only when
# the row's cell is among the query's nprobe nearest cells.
# --------------------------------------------------------------------------
N_CENTROIDS = 32
NPROBE = 8
KMEANS_ITERS = 10
TRAIN_SAMPLE_STRIDE = 4  # train on vec_id % stride == 0 (bounded sample)


def _train_sample(sf_dir: str) -> np.ndarray:
    """L2-normalized strided training sample, shared by the IVF coarse
    quantizer and the PQ codebooks (ONE sampling policy — the sample is
    the scale story: at 10^10 rows you train on ~10^5 rows, never the
    table). The stride predicate is pushed INTO the scan (pyarrow
    dataset filter) so non-sample rows never materialize on the driver;
    a row cap bounds training regardless of table size."""
    import pyarrow.compute as pc
    import pyarrow.dataset as pads
    dset = pads.dataset(f"{sf_dir}/embeddings.parquet")
    t = dset.to_table(
        columns=["vec_id", "embedding"],
        filter=pc.bit_wise_and(pc.field("vec_id"),
                               TRAIN_SAMPLE_STRIDE - 1) == 0)
    t = t.sort_by("vec_id").slice(0, 200_000)  # hard training-row cap
    x = emb_matrix(t["embedding"])
    return x / np.linalg.norm(x, axis=1, keepdims=True)


def _train_centroids(sf_dir: str, seed: int = 42) -> np.ndarray:
    """Deterministic spherical k-means on the shared strided sample.
    Returns L2-normalized (N_CENTROIDS, dim)."""
    xn = _train_sample(sf_dir)
    rng = np.random.default_rng(seed)
    cent = xn[rng.choice(len(xn), size=min(N_CENTROIDS, len(xn)),
                         replace=False)]
    for _ in range(KMEANS_ITERS):
        assign = np.argmax(xn @ cent.T, axis=1)
        for c in range(len(cent)):
            m = assign == c
            if m.any():
                v = xn[m].mean(axis=0)
                n = np.linalg.norm(v)
                if n > 0:
                    cent[c] = v / n
    return cent


def ann_topk_ivf(sf_dir: str, k: int = TOPK, nprobe: int = NPROBE,
                 with_stats: bool = False):
    """Approximate top-k via IVF coarse quantization: rows in the query's
    nprobe nearest cells are exact-ranked, everything else skipped — the
    candidate fraction is ~nprobe/N_CENTROIDS by construction. Centroids
    broadcast once via ray.put; assignment + pruned matmul per batch;
    partial top-k caps the shuffle at k rows per query per batch.
    Rows-only oracle (approximate); recall floor + pruning asserted in
    tests."""
    qids, q = _query_matrix(sf_dir)
    cent = _train_centroids(sf_dir)
    qn = q / np.linalg.norm(q, axis=1, keepdims=True)
    # nprobe nearest cells per query
    qcells = np.argsort(-(qn @ cent.T), axis=1)[:, :nprobe]
    cent_ref = ray.put(cent)
    qn_ref = ray.put(qn)
    qcells_ref = ray.put(qcells)

    def probe_and_score(t: pa.Table) -> pd.DataFrame:
        ct = ray.get(cent_ref)
        qnm = ray.get(qn_ref)
        qc = ray.get(qcells_ref)
        mn, vids = _emb_vids(t, qnm.shape[1])
        cells = np.argmax(mn @ ct.T, axis=1)  # (rows,)
        return _score_candidates(mn, vids, qids, qnm, k,
                                 lambda qi: np.isin(cells, qc[qi]),
                                 with_stats)

    parts = _read_emb(sf_dir).map_batches(probe_and_score,
                                          batch_format="pyarrow")
    table, stats = _merge_topk(parts, k, with_stats)
    return (table, stats) if with_stats else table


# --------------------------------------------------------------------------
# Persisted IVF index: build once (centroids + vectors hive-partitioned by
# coarse cell), probe by reading ONLY the matching cell directories —
# pruning at the READ, the durable-index scale path. ann_topk_ivf assigns
# cells in-memory per run; at 10^10 vectors you build this once and every
# query run opens nprobe/N_CENTROIDS of the bytes.
# --------------------------------------------------------------------------
def ann_index_build(sf_dir: str, index_dir: str) -> np.ndarray:
    """Builds (idempotently) the on-disk IVF index under ``index_dir``:
    ``centroids.npy`` plus ``cell=N/`` hive partitions of (vec_id,
    embedding, label) rows. Assignment runs as one map_batches pass with
    the centroids broadcast once; the partitioned write is Ray Data's
    write_parquet(partition_cols) so rows never cross the driver.
    Returns the centroid matrix."""
    import os
    import shutil
    ok = os.path.join(index_dir, "_OK")
    cpath = os.path.join(index_dir, "centroids.npy")
    if os.path.exists(ok):
        return np.load(cpath)
    cent = _train_centroids(sf_dir)
    shutil.rmtree(index_dir, ignore_errors=True)
    os.makedirs(index_dir, exist_ok=True)
    cent_ref = ray.put(cent)

    def assign(t: pa.Table) -> pa.Table:
        ct = ray.get(cent_ref)
        mn, _ = _emb_vids(t, ct.shape[1])
        cells = np.argmax(mn @ ct.T, axis=1).astype("int64")
        return t.append_column("cell", pa.array(cells, pa.int64()))

    _read_emb(sf_dir).map_batches(assign, batch_format="pyarrow") \
        .write_parquet(index_dir, partition_cols=["cell"])
    np.save(cpath, cent)
    with open(ok, "w") as f:
        f.write("ok\n")
    return cent


def ann_topk_indexed(sf_dir: str, k: int = TOPK, nprobe: int = NPROBE,
                     index_dir: str | None = None, with_stats: bool = False):
    """IVF top-k against the PERSISTED index: loads centroids, computes
    each query's nprobe cells, and reads only those ``cell=N`` partition
    directories — unneeded cells never leave storage. Scoring recomputes
    the (deterministic) cell per row to mask candidates per query, so the
    output is bit-identical to ann_topk_ivf at equal parameters (asserted
    in tests). Rows-only oracle (approximate)."""
    import os
    if index_dir is None:
        # key by corpus identity, not basename: /a/sf0.001 and /b/sf0.001
        # (or a regenerated corpus at the same path) must not share an
        # _OK-marked index, or the probe silently serves stale results
        src = os.path.abspath(f"{sf_dir}/embeddings.parquet")
        st = os.stat(src)
        import hashlib
        key = hashlib.sha1(
            f"{src}|{st.st_size}|{st.st_mtime_ns}".encode()).hexdigest()[:16]
        index_dir = os.path.join("/tmp/mycelium_ann_index", key)
    import glob
    cent = ann_index_build(sf_dir, index_dir)
    qids, q = _query_matrix(sf_dir)
    qn = q / np.linalg.norm(q, axis=1, keepdims=True)
    qcells = np.argsort(-(qn @ cent.T), axis=1)[:, :nprobe]
    needed = sorted({int(c) for c in qcells.ravel()})
    dirs = [d for d in (os.path.join(index_dir, f"cell={c}")
                        for c in needed) if os.path.isdir(d)]
    files = [f for d in dirs
             for f in sorted(glob.glob(os.path.join(d, "*.parquet")))]
    cent_ref = ray.put(cent)
    qn_ref = ray.put(qn)
    qcells_ref = ray.put(qcells)

    def probe(t: pa.Table) -> pd.DataFrame:
        ct = ray.get(cent_ref)
        qnm = ray.get(qn_ref)
        qc = ray.get(qcells_ref)
        mn, vids = _emb_vids(t, qnm.shape[1])
        cells = np.argmax(mn @ ct.T, axis=1)
        return _score_candidates(mn, vids, qids, qnm, k,
                                 lambda qi: np.isin(cells, qc[qi]),
                                 with_stats)

    parts = rd.read_parquet(files, columns=["vec_id", "embedding"]) \
        .map_batches(probe, batch_format="pyarrow")
    table, stats = _merge_topk(parts, k, with_stats)
    if with_stats:
        stats["n_cells_read"] = len(dirs)
        stats["n_cells_total"] = N_CENTROIDS
        return table, stats
    return table


# --------------------------------------------------------------------------
# embedding cosine near-dup pairs
# --------------------------------------------------------------------------
NEARDUP_THRESHOLD = 0.25  # testdata embeddings are unclustered; 0.25 yields
                          # a few hundred same-label pairs at sf0.001


NEARDUP_BLOCK_ELEMS = 1 << 24  # ≤128 MiB f64 sim block per step


def embedding_neardup(sf_dir: str, threshold: float = NEARDUP_THRESHOLD):
    """(vec_id_a, vec_id_b, sim_micro) for same-label pairs with cosine ≥
    threshold. Label blocking (groupby label → per-group matmul) keeps the
    pair space linear-ish and is the standard bucketed-pairs shape at scale.
    Inside a label the matmul is BLOCKWISE (fixed-size row blocks against
    the remaining suffix) so a hot label costs bounded peak memory instead
    of O(label²) — one skewed key no longer OOMs its task (the further
    scale path, banding by (label, lsh_bucket), trades recall and isn't
    needed while per-label vectors fit a worker heap). sim_micro =
    floor(sim * 1e6) as int64 — float-hash-safe vs the oracle (which casts
    the float32 lists to DOUBLE so both sides sum in f64)."""
    empty = pa.table({"vec_id_a": pa.array([], pa.int64()),
                      "vec_id_b": pa.array([], pa.int64()),
                      "sim_micro": pa.array([], pa.int64())})

    def pairs(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return empty
        m = emb_matrix(g["embedding"])
        mn = m / np.linalg.norm(m, axis=1, keepdims=True)
        ids = g["vec_id"].to_numpy()
        n = len(ids)
        block = max(16, NEARDUP_BLOCK_ELEMS // max(n, 1))
        a_out, b_out, s_out = [], [], []
        for i0 in range(0, n, block):
            i1 = min(i0 + block, n)
            # rectangle (rows i0:i1) × (cols i0:n); keep col > row only
            sims = mn[i0:i1] @ mn[i0:].T
            r, c = np.nonzero(sims >= threshold)
            keep = (c + i0) > (r + i0)  # strict upper triangle, global idx
            r, c = r[keep], c[keep]
            gi, gj = ids[r + i0], ids[c + i0]
            a_out.append(np.minimum(gi, gj).astype("int64"))
            b_out.append(np.maximum(gi, gj).astype("int64"))
            s_out.append(np.floor(sims[r, c] * 1e6).astype("int64"))
        if not a_out:
            return empty
        return pa.table({
            "vec_id_a": pa.array(np.concatenate(a_out), pa.int64()),
            "vec_id_b": pa.array(np.concatenate(b_out), pa.int64()),
            "sim_micro": pa.array(np.concatenate(s_out), pa.int64()),
        })

    # Distributed final order — the pair set is data-dependent and
    # unbounded at 100 TB, so it must never collect on the driver
    # (sorted_or_empty keeps the typed schema when zero pairs exist).
    from .dedup import sorted_or_empty
    return sorted_or_empty(
        _read_emb(sf_dir).groupby("label").map_groups(
            pairs, batch_format="pyarrow"),
        ["vec_id_a", "vec_id_b"], empty)


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


# --------------------------------------------------------------------------
# embedding_dim_minmax: per-dimension corpus min/max — the embedding-
# column profile pass (normalization bounds, quantization calibration).
# Exact despite floats: min/max are order-independent, so no accumulation
# -order hazard. Per-batch (dim, min, max) partials (DIMS rows per batch,
# one vstack + two reductions) → tiny groupby; shuffle ∝ DIMS×batches.
# --------------------------------------------------------------------------
def embedding_dim_minmax(sf_dir: str):
    """(dim, vmin, vmax) with dim 1-based, values exact float64 upcasts
    of the stored float32."""
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["embedding"])

    def partial(t: pa.Table) -> pa.Table:
        arrs = t["embedding"].combine_chunks()
        m = np.vstack(arrs.to_numpy(zero_copy_only=False))
        dims = np.arange(1, m.shape[1] + 1, dtype="int64")
        return pa.table({
            "dim": pa.array(dims, pa.int64()),
            "vmin": pa.array(m.min(axis=0).astype("float64"), pa.float64()),
            "vmax": pa.array(m.max(axis=0).astype("float64"), pa.float64()),
        })

    from ray.data.aggregate import Max, Min
    return ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("dim").aggregate(Min("vmin", alias_name="vmin"),
                                  Max("vmax", alias_name="vmax"))


EMBEDDING_DIM_MINMAX_SQL = """
SELECT i AS dim,
       CAST(min(embedding[i]) AS DOUBLE) AS vmin,
       CAST(max(embedding[i]) AS DOUBLE) AS vmax
FROM embeddings,
     LATERAL (SELECT unnest(generate_series(1, len(embedding))) AS i) g
GROUP BY i
"""


# --------------------------------------------------------------------------
# source_label_profile: cross-modal JOIN of the two big tables — documents
# (text side) ⋈ embeddings (vector side) on doc_id == vec_id — reduced to
# the (source, label) contingency table a dataset-curation pass audits.
# Both sides hash-bucket on the id (the standard partitioned join; no
# broadcast — both sides are corpus-sized at 100 TB) and the per-bucket
# merge folds straight into partial counts, so only (source, label, n)
# rows leave the shuffle.
# --------------------------------------------------------------------------
def source_label_profile(sf_dir: str):
    """(source, label, n) over the doc↔embedding join."""
    import pandas as pd
    import ray.data as rd

    from .analytics import _n_join_buckets
    n_buckets = _n_join_buckets()

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "source"])
    emb = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                          columns=["vec_id", "label"])

    def tag_docs(df: pd.DataFrame) -> pd.DataFrame:
        key = df["doc_id"].to_numpy().astype("int64")
        return pd.DataFrame({
            "key": key, "source": df["source"].astype("object"),
            "label": np.zeros(len(df), dtype="int64"),
            "side": np.zeros(len(df), dtype="int64"),
            "bucket": (key.astype("uint64")
                       % np.uint64(n_buckets)).astype("int64"),
        })

    def tag_emb(df: pd.DataFrame) -> pd.DataFrame:
        key = df["vec_id"].to_numpy().astype("int64")
        return pd.DataFrame({
            "key": key, "source": pd.Series([""] * len(df), dtype="object"),
            "label": df["label"].to_numpy().astype("int64"),
            "side": np.ones(len(df), dtype="int64"),
            "bucket": (key.astype("uint64")
                       % np.uint64(n_buckets)).astype("int64"),
        })

    def join_bucket(g: pd.DataFrame) -> pd.DataFrame:
        d = g[g["side"] == 0][["key", "source"]]
        e = g[g["side"] == 1][["key", "label"]]
        m = d.merge(e, on="key")
        out = m.groupby(["source", "label"], as_index=False).size()
        return pd.DataFrame({"source": out["source"],
                             "label": out["label"].astype("int64"),
                             "n": out["size"].astype("int64")})

    from ray.data.aggregate import Sum
    return docs.map_batches(tag_docs, batch_format="pandas") \
        .union(emb.map_batches(tag_emb, batch_format="pandas")) \
        .groupby("bucket").map_groups(join_bucket, batch_format="pandas") \
        .groupby(["source", "label"]).aggregate(Sum("n", alias_name="n"))


SOURCE_LABEL_PROFILE_SQL = """
SELECT d.source, CAST(e.label AS BIGINT) AS label,
       CAST(count(*) AS BIGINT) AS n
FROM documents d JOIN embeddings e ON e.vec_id = d.doc_id
GROUP BY d.source, e.label
"""


# --------------------------------------------------------------------------
# Product-quantization ANN (the memory-compression scale path): at 10^10
# vectors the float embeddings don't fit the cluster's RAM, but PQ codes
# do — 64 float32 dims (256 B) become PQ_M uint8 codes (8 B, 32x). The
# codebooks train once on the same strided sample as the IVF coarse
# quantizer; each batch encodes to codes and scores queries by ADC
# (asymmetric distance computation): per-query lookup tables T[m, k] =
# <q_m, c_mk> are broadcast once, and a vector's approximate inner
# product is a sum of M table lookups — no float-vector math per row at
# query time. Per-batch partial top-k caps the shuffle at k rows per
# query per batch (the ann_topk combiner shape). Rows-only oracle
# (approximate); recall floor + reconstruction quality pinned in tests.
# --------------------------------------------------------------------------
PQ_M = 8          # subspaces (64 dims -> 8 dims per subspace)
PQ_K = 32         # codes per subspace (uint8 storage, 5 bits used)
PQ_ITERS = 8


def _nearest_code(sub: np.ndarray, cent: np.ndarray) -> np.ndarray:
    """argmin_k ||x - c_k||² via the matmul form: ||x||² is constant per
    row, so argmin(||c||² - 2 x·cᵀ) — an (n, k) result without the
    (n, k, d) broadcast temporary (410 MB per iteration at the 200k-row
    training cap with the naive form)."""
    return np.argmin((cent * cent).sum(axis=1)[None, :] - 2.0 * (sub @ cent.T),
                     axis=1)


def _train_pq_codebooks(sf_dir: str, seed: int = 42) -> np.ndarray:
    """(PQ_M, PQ_K, dsub) codebooks: per-subspace Lloyd k-means on the
    shared strided sample (same bounded-sample policy as the IVF coarse
    quantizer — training never touches the full table)."""
    xn = _train_sample(sf_dir)
    dim = xn.shape[1]
    if dim % PQ_M:
        raise ValueError(f"dim {dim} not divisible by PQ_M={PQ_M}")
    dsub = dim // PQ_M
    rng = np.random.default_rng(seed)
    books = np.empty((PQ_M, PQ_K, dsub))
    for m in range(PQ_M):
        sub = xn[:, m * dsub:(m + 1) * dsub]
        kk = min(PQ_K, len(sub))
        cent = sub[rng.choice(len(sub), size=kk, replace=False)]
        for _ in range(PQ_ITERS):
            assign = _nearest_code(sub, cent)
            for c in range(kk):
                mask = assign == c
                if mask.any():
                    cent[c] = sub[mask].mean(axis=0)
        if kk < PQ_K:  # degenerate tiny sample: repeat last centroid
            cent = np.vstack([cent, np.repeat(cent[-1:], PQ_K - kk, 0)])
        books[m] = cent
    return books


def _pq_encode(mn: np.ndarray, books: np.ndarray) -> np.ndarray:
    """(rows, dim) normalized -> (rows, PQ_M) uint8 codes."""
    n, dim = mn.shape
    dsub = dim // PQ_M
    codes = np.empty((n, PQ_M), dtype=np.uint8)
    for m in range(PQ_M):
        sub = mn[:, m * dsub:(m + 1) * dsub]
        codes[:, m] = _nearest_code(sub, books[m]).astype(np.uint8)
    return codes


def ann_topk_pq(sf_dir: str, k: int = TOPK, with_stats: bool = False):
    """Approximate cosine top-k via PQ/ADC: encode each batch to PQ
    codes, score queries by summed table lookups, keep per-batch partial
    top-k. ``with_stats`` also returns {bytes_raw, bytes_pq} — the
    compression the codes realize."""
    qids, q = _query_matrix(sf_dir)
    qn = q / np.linalg.norm(q, axis=1, keepdims=True)
    books = _train_pq_codebooks(sf_dir)
    dsub = qn.shape[1] // PQ_M
    # per-query ADC tables: T[q, m, k] = <q_m, c_mk>
    tables = np.einsum("qmd,mkd->qmk",
                       qn.reshape(len(qn), PQ_M, dsub), books)
    books_ref = ray.put(books)
    tables_ref = ray.put(tables)

    qn_ref = ray.put(qn)
    rerank = 8 * k  # ADC shortlist width per query per batch

    def encode_and_score(t: pa.Table) -> pd.DataFrame:
        bk = ray.get(books_ref)
        tb = ray.get(tables_ref)
        qnm = ray.get(qn_ref)
        mn, vids = _emb_vids(t, bk.shape[0] * bk.shape[2])
        codes = _pq_encode(mn, bk)
        rows = {"query_id": [], "vec_id": [], "sim": []}
        marange = np.arange(PQ_M)
        for qi in range(tb.shape[0]):
            # stage 1: ADC over the CODES (8 B/vector — the only pass
            # that touches every row; at scale the float vectors for
            # this pass stay on disk)
            adc = tb[qi][marange[None, :], codes].sum(axis=1)
            short = _topk_idx(adc, vids, min(rerank, len(vids)))
            # stage 2: exact rerank of the shortlist only (the standard
            # PQ refine step — float math on ≤ 8k rows per batch)
            exact = mn[short] @ qnm[qi]
            idx = short[_topk_idx(exact, vids[short], k)]
            rows["query_id"].extend([int(qids[qi])] * len(idx))
            rows["vec_id"].extend(vids[idx].tolist())
            rows["sim"].extend((mn[idx] @ qnm[qi]).tolist())
        return pd.DataFrame(rows)

    parts = _read_emb(sf_dir).map_batches(encode_and_score,
                                          batch_format="pyarrow")
    table, _ = _merge_topk(parts, k, with_stats=False)
    if not with_stats:
        return table
    n_rows = _read_emb(sf_dir).count()
    dim = PQ_M * dsub
    return table, {"bytes_raw": n_rows * dim * 4,
                   "bytes_pq": n_rows * PQ_M,
                   "compression": dim * 4 / PQ_M}


# --------------------------------------------------------------------------
# ann_recall: the ANN family's evaluation harness — recall@k of every
# approximate path (LSH, IVF, persisted-index IVF, PQ/ADC) against the
# exact scan, per query and averaged. Each path's scan is the same
# distributed pipeline users run; only the k·Q-row result sets meet on
# the driver (bounded by construction). Rows-only oracle (approximate by
# design); the recall floors are pinned in tests/test_ann.py.
# --------------------------------------------------------------------------
def ann_recall(sf_dir: str, k: int = TOPK):
    """(method, recall_at_k, n_queries) over the approximate ANN paths."""
    exact = ann_topk(sf_dir, k).to_pandas()
    truth = {int(q): set(g["vec_id"].tolist())
             for q, g in exact.groupby("query_id")}

    def recall_of(table) -> float:
        df = table.to_pandas()
        if len(df) == 0:
            return 0.0
        per_q = []
        for q, g in df.groupby("query_id"):
            t = truth.get(int(q), set())
            if t:
                per_q.append(len(t & set(g["vec_id"].tolist())) / len(t))
        return float(np.mean(per_q)) if per_q else 0.0

    methods = [
        ("hnsw", lambda: ann_topk_hnsw(sf_dir, k)),
        ("lsh", lambda: ann_topk_lsh(sf_dir, k)),
        ("ivf", lambda: ann_topk_ivf(sf_dir, k)),
        ("ivf_indexed", lambda: ann_topk_indexed(sf_dir, k)),
        ("pq", lambda: ann_topk_pq(sf_dir, k)),
    ]
    rows = [(name, recall_of(fn()), len(truth)) for name, fn in methods]
    return pa.table({
        "method": pa.array([r[0] for r in rows], pa.string()),
        "recall_at_k": pa.array([r[1] for r in rows], pa.float64()),
        "n_queries": pa.array([r[2] for r in rows], pa.int64()),
    })


# --------------------------------------------------------------------------
# HNSW ANN (graph path): one from-scratch HNSW (hnsw.py, Malkov 2016)
# per hash partition — builds embarrassingly parallel, queries fan out
# over partitions and merge through the shared partial-top-k path. A
# bigger corpus is MORE partitions (each graph stays memory-bounded),
# never a bigger single build.
# --------------------------------------------------------------------------
N_HNSW_PARTS = 4
HNSW_EF_SEARCH = 64


def ann_topk_hnsw(sf_dir: str, k: int = TOPK):
    """(query_id, rank, vec_id) — approximate top-k via per-partition
    HNSW graphs. Rows-only by design (graph search is approximate);
    recall vs the exact scan is floored in tests and measured by
    ann_recall."""
    from ..hnsw import HNSW

    qids, q = _query_matrix(sf_dir)
    q_ref = ray.put(q)

    def build_and_score(g: pd.DataFrame) -> pd.DataFrame:
        qm = ray.get(q_ref)
        vids = g["vec_id"].to_numpy()
        mat = np.stack(g["embedding"].to_numpy())
        order = np.argsort(vids, kind="stable")  # insertion-order stable
        idx = HNSW(mat.shape[1])
        for i in order:
            idx.add(int(vids[i]), mat[i])
        rows = {"query_id": [], "vec_id": [], "sim": []}
        for qi in range(qm.shape[0]):
            for s, vid in idx.search(qm[qi], k, ef=HNSW_EF_SEARCH):
                rows["query_id"].append(int(qids[qi]))
                rows["vec_id"].append(int(vid))
                rows["sim"].append(float(s))
        return pd.DataFrame(rows)

    ds = _read_emb(sf_dir)

    def add_part(t: pa.Table) -> pa.Table:
        vids = t["vec_id"].to_numpy(zero_copy_only=False)
        part = pa.array((vids % N_HNSW_PARTS).astype("int64"))
        return t.append_column("part", part)

    parts = ds.map_batches(add_part, batch_format="pyarrow") \
        .groupby("part").map_groups(build_and_score, batch_format="pandas")
    table, _ = _merge_topk(parts, k, with_stats=False)
    return table
