"""Distributed embedding clustering + SemDeDup-style semantic dedup.

``embedding_kmeans`` is full-table distributed spherical Lloyd's: unlike
``ann._train_centroids`` (which trains on a bounded sample for IVF coarse
cells), every iteration here streams the WHOLE table through map_batches —
each batch emits per-centroid partial (count, vector-sum) rows, and the
driver reduces only K × n_blocks tiny rows (bounded by K and block count,
never by table size). Centroids broadcast once per iteration via ray.put.
That per-iteration reduce is the textbook scalable k-means shape
(the same combiner pattern as mllib/Spark k-means).

``semantic_dedup`` composes it into the SemDeDup recipe (Abbas et al.
2023, arXiv:2303.09540): cluster → within-cluster cosine pairs
(blockwise matmul, bounded peak memory) → connected components → keep the
min-vec_id representative per component. Rows-only oracle (k-means is
iterative/seeded, not SQL-expressible); invariants pytest-checked:
determinism, exact-duplicate removal, label homogeneity on the
synthetic clustered fixture.

Reference analog: the dedup decision path (A3/§2.7) applied to the
embedding payload instead of token shingles.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data as rd

from .ann import NEARDUP_BLOCK_ELEMS
from .dedup import connected_components


def _read_emb(sf_dir: str):
    # pruned read: clustering never needs the label column
    return rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                           columns=["vec_id", "embedding"])

K_CLUSTERS = 10
LLOYD_ITERS = 8
SEMDEDUP_THRESHOLD = 0.25  # testdata embeddings are diffuse (see ann.py)


def _init_centroids(sf_dir: str, k: int, seed: int = 7) -> np.ndarray:
    """Deterministic seeded init from a strided bounded sample (pushed into
    the scan) — at 10^10 rows the init reads ~1/stride of one column, the
    iterations below still see every row."""
    import pyarrow.compute as pc
    import pyarrow.dataset as pads
    dset = pads.dataset(f"{sf_dir}/embeddings.parquet")
    t = dset.to_table(columns=["vec_id", "embedding"],
                      filter=pc.bit_wise_and(pc.field("vec_id"), 3) == 0)
    t = t.sort_by("vec_id").slice(0, 100_000)
    from .ann import emb_matrix
    x = emb_matrix(t["embedding"])
    xn = x / np.linalg.norm(x, axis=1, keepdims=True)
    rng = np.random.default_rng(seed)
    return xn[rng.choice(len(xn), size=min(k, len(xn)), replace=False)]


def _norm_blocks(sf_dir: str):
    """embeddings.parquet → MATERIALIZED Dataset of per-batch rows
    (n, dim, blob): each row is one L2-normalized float32 matrix packed
    as bytes. Lloyd's streams the whole table once per iteration; paying
    the parquet scan + list-column conversion + normalization EIGHT
    times was pure waste — cache the normalized matrices in the object
    store instead (the standard cached-input k-means shape; float32
    halves the footprint and the store spills under pressure, so this
    holds at cluster scale too)."""
    from .ann import emb_matrix

    def pack(t: pa.Table) -> pa.Table:
        m = emb_matrix(t["embedding"])
        mn = (m / np.linalg.norm(m, axis=1, keepdims=True)) \
            .astype(np.float32)
        return pa.table({
            "n": pa.array([mn.shape[0]], pa.int64()),
            "dim": pa.array([mn.shape[1]], pa.int64()),
            "blob": pa.array([mn.tobytes()], pa.binary()),
        })

    return _read_emb(sf_dir).select_columns(["embedding"]) \
        .map_batches(pack, batch_format="pyarrow", batch_size=4096) \
        .materialize()


def train_kmeans(sf_dir: str, k: int = K_CLUSTERS,
                 iters: int = LLOYD_ITERS) -> np.ndarray:
    """Full-table distributed spherical Lloyd's; returns (k, dim)
    L2-normalized centroids."""
    ds = _norm_blocks(sf_dir)
    cent = _init_centroids(sf_dir, k)

    for _ in range(iters):
        cent_ref = ray.put(cent.astype(np.float32))

        def partial(t: pa.Table) -> pa.Table:
            ct = ray.get(cent_ref)
            kk, dim = ct.shape
            sums = np.zeros((kk, dim), dtype=np.float64)
            cnts = np.zeros(kk, dtype=np.int64)
            for n_, d_, blob in zip(t["n"].to_pylist(),
                                    t["dim"].to_pylist(),
                                    t["blob"].to_pylist()):
                mn = np.frombuffer(blob, np.float32).reshape(n_, d_)
                assign = np.argmax(mn @ ct.T, axis=1)
                cnts += np.bincount(assign, minlength=kk)
                for c in np.unique(assign):
                    sums[c] += mn[assign == c].sum(axis=0,
                                                   dtype=np.float64)
            nz = np.nonzero(cnts)[0]
            return pa.table({
                "cid": pa.array(nz.astype("int64")),
                "cnt": pa.array(cnts[nz]),
                "vsum": pa.array([sums[c].tobytes() for c in nz],
                                 pa.binary()),
            })

        # K × n_blocks tiny partial rows — the ONLY thing the driver sees
        parts = ds.map_batches(partial, batch_format="pyarrow").take_all()
        sums = np.zeros_like(cent)
        cnts = np.zeros(len(cent), dtype=np.int64)
        for r in parts:
            sums[r["cid"]] += np.frombuffer(r["vsum"], dtype=np.float64)
            cnts[r["cid"]] += r["cnt"]
        for c in range(len(cent)):
            if cnts[c] > 0:
                v = sums[c] / cnts[c]
                n = np.linalg.norm(v)
                if n > 0:
                    cent[c] = v / n
        # empty centroids keep their previous position (deterministic)
    return cent


def embedding_kmeans(sf_dir: str, k: int = K_CLUSTERS,
                     iters: int = LLOYD_ITERS):
    """(vec_id, cluster) assignment of every embedding to its nearest
    trained centroid. Rows-only oracle (iterative, seeded)."""
    cent = train_kmeans(sf_dir, k, iters)
    cent_ref = ray.put(cent)

    def assign(t: pa.Table) -> pa.Table:
        from .ann import emb_matrix
        ct = ray.get(cent_ref)
        m = emb_matrix(t["embedding"])
        mn = m / np.linalg.norm(m, axis=1, keepdims=True)
        return pa.table({
            "vec_id": t["vec_id"].cast(pa.int64()),
            "cluster": pa.array(np.argmax(mn @ ct.T, axis=1)
                                .astype("int64"))})

    return _read_emb(sf_dir).map_batches(assign, batch_format="pyarrow")


def _cluster_pairs(g: pa.Table, threshold: float) -> pd.DataFrame:
    """Blockwise within-cluster cosine pairs (same bounded-memory shape as
    ann.embedding_neardup). Arrow in (vectorized emb_matrix, no per-row
    stacking); narrow pair rows out."""
    from .ann import emb_matrix
    if g.num_rows == 0:
        return pd.DataFrame({"doc_id_a": pd.Series([], dtype="int64"),
                             "doc_id_b": pd.Series([], dtype="int64")})
    m = emb_matrix(g["embedding"])
    mn = m / np.linalg.norm(m, axis=1, keepdims=True)
    ids = g["vec_id"].to_numpy().astype("int64")
    n = len(ids)
    block = max(16, NEARDUP_BLOCK_ELEMS // max(n, 1))
    outs = []
    for i0 in range(0, n, block):
        i1 = min(i0 + block, n)
        sims = mn[i0:i1] @ mn[i0:].T
        r, c = np.nonzero(sims >= threshold)
        keep = (c + i0) > (r + i0)
        r, c = r[keep], c[keep]
        gi, gj = ids[r + i0], ids[c + i0]
        outs.append(pd.DataFrame({
            "doc_id_a": np.minimum(gi, gj).astype("int64"),
            "doc_id_b": np.maximum(gi, gj).astype("int64")}))
    if not outs:
        return pd.DataFrame({"doc_id_a": pd.Series([], dtype="int64"),
                             "doc_id_b": pd.Series([], dtype="int64")})
    return pd.concat(outs, ignore_index=True)


def semantic_dedup(sf_dir: str, threshold: float = SEMDEDUP_THRESHOLD,
                   k: int = K_CLUSTERS, iters: int = LLOYD_ITERS):
    """SemDeDup: kmeans-cluster the embeddings, find within-cluster cosine
    near-dup pairs, resolve connected components, keep the min-vec_id
    representative of each component (singletons always kept).
    Output: (vec_id, kept, rep) for every vector — kept=1 iff the vector
    survives dedup; rep = its component representative (itself when kept).
    Rows-only oracle; invariants in tests/test_cluster.py."""
    cent = train_kmeans(sf_dir, k, iters)
    cent_ref = ray.put(cent)

    def assign(t: pa.Table) -> pa.Table:
        from .ann import emb_matrix
        ct = ray.get(cent_ref)
        m = emb_matrix(t["embedding"])
        mn = m / np.linalg.norm(m, axis=1, keepdims=True)
        return t.select(["vec_id", "embedding"]).append_column(
            "cluster", pa.array(np.argmax(mn @ ct.T, axis=1)
                                .astype("int64")))

    clustered = _read_emb(sf_dir).map_batches(assign,
                                              batch_format="pyarrow")
    pairs = clustered.groupby("cluster").map_groups(
        lambda g: _cluster_pairs(g, threshold), batch_format="pyarrow")
    comps = connected_components(pairs)  # (node, label) for paired nodes

    # join the component labels back to ALL vec_ids (bucketed, like the
    # rest of the dedup family): unmatched rows are singletons (kept)
    comp_rows = comps.map_batches(
        lambda df: pd.DataFrame({
            "vec_id": df["node"].astype("int64"),
            "rep": df["label"].astype("int64"),
            "bucket": (df["node"].astype("int64") % 64)}),
        batch_format="pandas")
    id_rows = _read_emb(sf_dir).map_batches(
        lambda df: pd.DataFrame({
            "vec_id": df["vec_id"].astype("int64"),
            "rep": np.int64(-1),
            "bucket": (df["vec_id"].astype("int64") % 64)}),
        batch_format="pandas")

    def decide(g: pd.DataFrame) -> pd.DataFrame:
        reps = g[g["rep"] >= 0].drop_duplicates("vec_id") \
            .set_index("vec_id")["rep"]
        ids = g[g["rep"] < 0]["vec_id"].drop_duplicates()
        rep = reps.reindex(ids)
        rep = rep.fillna(pd.Series(ids.to_numpy(), index=ids)).astype("int64")
        return pd.DataFrame({
            "vec_id": ids.to_numpy(),
            "kept": (rep.to_numpy() == ids.to_numpy()).astype("int64"),
            "rep": rep.to_numpy()})

    return comp_rows.union(id_rows).groupby("bucket").map_groups(
        decide, batch_format="pandas")
