"""Distributed link-graph analytics (PageRank) the Ray Data way.

The link graph derives deterministically from the ``documents`` table so
the operator is oracle-checkable: doc ``d`` links to
``(d*31 + 17*j) % N`` for ``j`` in 1..3 (self-loops dropped), with
``N = |documents|`` and contiguous doc_ids 0..N-1 (asserted). Every node
keeps outdeg >= 2 (at most one of the three targets can be a self-loop
for N > 51), so there is no dangling-mass term.

PageRank runs in **int64 fixed-point** (SCALE = 1e12 units of total rank
mass) with floor division everywhere — float summation order differs
between engines and would break value-hash parity with the DuckDB
oracle; integer arithmetic is bit-identical in both.

Scale notes (the 100-TB story): each iteration is two bucketed
shuffles — (1) ranks ⋈ edges on src (bucketed hash join, per-group
pre-agg of contributions by dst), (2) contributions ∪ node-base rows
grouped by dst bucket to apply damping — the standard BSP PageRank
shape. Rank state (N rows of two int64s) is materialized per iteration
so the lazy DAG doesn't re-execute prior iterations; edges are
materialized once and reused across all iterations. Buckets scale with
cluster CPUs (see ``_n_join_buckets``); a skewed in-degree key would be
salted into sub-buckets, but this graph's in-degree is ~3 uniform.

Reference analog: the crawl's host-graph analytics (A1/A5 family,
doc/sphinx/source/crawler.rst) — rebuilt as an iterative Dataset loop.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray.data as rd
from ray.data.aggregate import Max, Min, Sum

from .analytics import _n_join_buckets
from .dedup import SMALL_GRAPH_EDGES

SCALE = 10**12
DAMP_NUM, DAMP_DEN = 85, 100  # d = 0.85
N_ITERS = 5
FANOUT = 3


def _edges_ds(docs: rd.Dataset, n: int) -> rd.Dataset:
    """(src, dst, outdeg) rows; outdeg computed per src inside the batch
    (all of a src's edges are generated together, so no extra shuffle)."""

    def gen(df: pd.DataFrame) -> pd.DataFrame:
        src = df["doc_id"].to_numpy(dtype="int64")
        srcs = np.repeat(src, FANOUT)
        js = np.tile(np.arange(1, FANOUT + 1, dtype="int64"), len(src))
        dsts = (srcs * 31 + 17 * js) % n
        keep = dsts != srcs
        srcs, dsts = srcs[keep], dsts[keep]
        out = pd.DataFrame({"src": srcs, "dst": dsts})
        deg = out.groupby("src")["dst"].transform("size").astype("int64")
        out["outdeg"] = deg
        return out

    return docs.map_batches(gen, batch_format="pandas")


def pagerank(sf_dir: str, n_iters: int = N_ITERS):
    """Fixed-point PageRank over the derived document link graph.

    Output: (doc_id, rank_fp) — rank in SCALE=1e12 fixed-point units,
    bit-identical to the unrolled-CTE DuckDB oracle.
    """
    n_buckets = _n_join_buckets()
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    n = docs.count()
    # the derived edge mapping and rank indexing require doc_ids exactly
    # 0..N-1 (the testdata contract); fail loudly instead of a cryptic
    # IndexError or a silent oracle divergence on a filtered table
    bounds = docs.aggregate(Min("doc_id"), Max("doc_id"))
    if bounds["min(doc_id)"] != 0 or bounds["max(doc_id)"] != n - 1:
        raise ValueError(
            f"pagerank requires contiguous doc_ids 0..N-1; got "
            f"[{bounds['min(doc_id)']}, {bounds['max(doc_id)']}] with N={n}")
    base = (15 * SCALE) // (100 * n)

    edges = _edges_ds(docs, n).materialize()

    if edges.count() <= SMALL_GRAPH_EDGES:
        # Small-graph fast path (mirrors dedup.connected_components): the
        # edge list fits one worker, so 2 shuffles x n_iters are pure
        # overhead — run every iteration in ONE task with the identical
        # int64 fixed-point arithmetic (per-edge floor-div, exact int64
        # sums, same damping), bit-equal to the BSP path and the oracle.
        def whole_graph_pr(g: pd.DataFrame) -> pd.DataFrame:
            src = g["src"].to_numpy(dtype="int64")
            dst = g["dst"].to_numpy(dtype="int64")
            outdeg = g["outdeg"].to_numpy(dtype="int64")
            rank = np.full(n, SCALE // n, dtype=np.int64)
            for _ in range(n_iters):
                s = np.zeros(n, dtype=np.int64)
                np.add.at(s, dst, rank[src] // outdeg)
                rank = base + (DAMP_NUM * s) // DAMP_DEN
            return pd.DataFrame({"doc_id": np.arange(n, dtype="int64"),
                                 "rank_fp": rank})

        return edges.map_batches(
            lambda df: df.assign(one=np.int64(0)), batch_format="pandas") \
            .groupby("one").map_groups(
                lambda g: whole_graph_pr(g), batch_format="pandas")

    def tag_rank(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "key": df["doc_id"].astype("int64"),
            "bucket": (df["doc_id"] % n_buckets).astype("int64"),
            "side": 0, "rank": df["rank_fp"].astype("int64"),
            "dst": np.int64(0), "outdeg": np.int64(1)})

    def tag_edges(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "key": df["src"].astype("int64"),
            "bucket": (df["src"] % n_buckets).astype("int64"),
            "side": 1, "rank": np.int64(0),
            "dst": df["dst"].astype("int64"),
            "outdeg": df["outdeg"].astype("int64")})

    def contribs_bucket(g: pd.DataFrame) -> pd.DataFrame:
        r = g[g["side"] == 0][["key", "rank"]]
        e = g[g["side"] == 1][["key", "dst", "outdeg"]]
        m = e.merge(r, on="key")
        if len(m) == 0:
            return pd.DataFrame({"dst": pd.Series([], dtype="int64"),
                                 "c": pd.Series([], dtype="int64")})
        m["c"] = m["rank"].to_numpy() // m["outdeg"].to_numpy()
        return m.groupby("dst", as_index=False).agg(c=("c", "sum"))

    def tag_base(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "dst": df["doc_id"].astype("int64"),
            "bucket2": (df["doc_id"] % n_buckets).astype("int64"),
            "c": np.int64(0)})

    def tag_contrib(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["bucket2"] = (df["dst"] % n_buckets).astype("int64")
        return df[["dst", "bucket2", "c"]]

    def apply_damp(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby("dst", as_index=False).agg(c=("c", "sum"))
        rank = base + (DAMP_NUM * s["c"].to_numpy()) // DAMP_DEN
        return pd.DataFrame({"doc_id": s["dst"].astype("int64"),
                             "rank_fp": rank.astype("int64")})

    def init_rank(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"doc_id": df["doc_id"].astype("int64"),
                             "rank_fp": np.full(len(df), SCALE // n,
                                                dtype="int64")})

    ranks = docs.map_batches(init_rank, batch_format="pandas").materialize()

    for _ in range(n_iters):
        both = ranks.map_batches(tag_rank, batch_format="pandas").union(
            edges.map_batches(tag_edges, batch_format="pandas"))
        contribs = both.groupby("bucket").map_groups(
            contribs_bucket, batch_format="pandas")
        # outer-apply over ALL nodes (a node with no in-links still gets
        # the base term): contributions ∪ zero-rows, grouped by dst bucket
        allc = contribs.map_batches(tag_contrib, batch_format="pandas") \
            .union(docs.map_batches(tag_base, batch_format="pandas"))
        ranks = allc.groupby("bucket2").map_groups(
            apply_damp, batch_format="pandas").materialize()

    return ranks


def _pagerank_sql(n_iters: int = N_ITERS) -> str:
    """Unrolled-CTE DuckDB oracle mirroring the fixed-point arithmetic
    exactly (// is floor division on positive int64 in both engines)."""
    nn = "(SELECT count(*) FROM documents)"
    parts = [f"""
WITH edges AS (
  SELECT src, dst,
         count(*) OVER (PARTITION BY src) AS outdeg
  FROM (
    SELECT d.doc_id AS src,
           (d.doc_id * 31 + 17 * j.j) % {nn} AS dst
    FROM documents d, (VALUES (1), (2), (3)) AS j(j)
  ) WHERE dst <> src
),
r0 AS (
  SELECT doc_id, CAST({SCALE} // {nn} AS BIGINT) AS rank_fp
  FROM documents
)"""]
    for i in range(1, n_iters + 1):
        parts.append(f""",
r{i} AS (
  SELECT d.doc_id,
         CAST((15 * {SCALE}) // (100 * {nn})
              + (85 * COALESCE(s.s, 0)) // 100 AS BIGINT) AS rank_fp
  FROM documents d
  LEFT JOIN (
    SELECT e.dst AS doc_id, sum(r.rank_fp // e.outdeg) AS s
    FROM edges e JOIN r{i - 1} r ON e.src = r.doc_id
    GROUP BY e.dst
  ) s ON d.doc_id = s.doc_id
)""")
    parts.append(f"\nSELECT doc_id, rank_fp FROM r{n_iters}")
    return "".join(parts)


PAGERANK_SQL = _pagerank_sql()


# --------------------------------------------------------------------------
# triangle_count: distributed undirected triangle counting — the standard
# two-shuffle algorithm (wedge generation at the low-id endpoint, then a
# closing-edge hash join), the graph-analytics benchmark a link-graph
# pipeline needs beyond PageRank. The test graph is a deterministic
# circulant (doc d ~ d±1, d±2, d±3 mod N ⇒ exactly 3N triangles), so the
# count is oracle-checkable; the operator itself never assumes that
# structure.
#
# Scale shape: edges oriented low→high id; wedges (b, c) are generated
# per low endpoint a inside an a-hash-bucket group (wedge count is
# Σ deg(a)², the algorithm's known cost), then hash on the packed (b, c)
# key against the oriented edge set — both shuffles ∝ cluster CPUs, and
# a high-degree hub would be mitigated by degree-ordering orientation
# (here: id order, degree-uniform graph).
# --------------------------------------------------------------------------
TRI_OFFSETS = (1, 2, 3)


def triangle_count(sf_dir: str):
    """One row: (n_triangles,) over the derived circulant graph."""
    n_buckets = _n_join_buckets()
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    n = docs.count()

    def gen_edges(df: pd.DataFrame) -> pd.DataFrame:
        u = df["doc_id"].to_numpy(dtype="int64")
        us = np.repeat(u, len(TRI_OFFSETS))
        js = np.tile(np.array(TRI_OFFSETS, dtype="int64"), len(u))
        vs = (us + js) % n
        keep = us != vs
        us, vs = us[keep], vs[keep]
        a = np.minimum(us, vs)            # orient low → high
        b = np.maximum(us, vs)
        out = pd.DataFrame({"a": a, "b": b}).drop_duplicates()
        out["bucket"] = (out["a"].to_numpy().astype("uint64")
                         % np.uint64(n_buckets)).astype("int64")
        return out

    edges = docs.map_batches(gen_edges, batch_format="pandas") \
        .materialize()  # reused by both shuffles below

    def _pair_bucket(x: np.ndarray, y: np.ndarray) -> np.ndarray:
        # hash BOTH columns into the bucket (never a packed single key:
        # (x << 32) | y silently corrupts ids ≥ 2^31/2^32, i.e. exactly
        # the 10^10-node regime these ops are written for); the join
        # itself compares the (b, c) column pair
        h = (x.astype("uint64") * np.uint64(0x9E3779B97F4A7C15)
             + y.astype("uint64") * np.uint64(0xC2B2AE3D27D4EB4F))
        return (h % np.uint64(n_buckets)).astype("int64")

    def wedges_of_bucket(g: pd.DataFrame) -> pd.DataFrame:
        # the wrap-around edges (0, N-k) can arrive from two generating
        # batches — dedup per a-group before pairing
        g = g.drop_duplicates(["a", "b"])
        m = g.merge(g, on="a", suffixes=("1", "2"))
        m = m[m["b1"] < m["b2"]]          # unordered neighbor pair, once
        b = m["b1"].to_numpy().astype("int64")
        c = m["b2"].to_numpy().astype("int64")
        return pd.DataFrame({
            "b": b, "c": c,
            "w": np.ones(len(m), dtype="int64"),
            "kbucket": _pair_bucket(b, c),
        })

    wedges = edges.groupby("bucket").map_groups(wedges_of_bucket,
                                                batch_format="pandas")

    def edge_keys(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop_duplicates(["a", "b"])
        b = df["a"].to_numpy().astype("int64")
        c = df["b"].to_numpy().astype("int64")
        return pd.DataFrame({
            "b": b, "c": c,
            "w": np.zeros(len(df), dtype="int64"),  # w=0 marks edge side
            "kbucket": _pair_bucket(b, c),
        })

    def close_bucket(g: pd.DataFrame) -> pd.DataFrame:
        # a wedge (b, c) is a triangle iff the oriented edge (b, c)
        # exists — an exact two-column merge, overflow-free at any id
        have = g[g["w"] == 0][["b", "c"]].drop_duplicates()
        nw = g[g["w"] == 1][["b", "c"]]
        n_tri = len(nw.merge(have, on=["b", "c"]))
        return pd.DataFrame({"n": [n_tri]})

    counts = wedges.union(edges.map_batches(edge_keys,
                                            batch_format="pandas")) \
        .groupby("kbucket").map_groups(close_bucket, batch_format="pandas")

    def total(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"n_triangles": pd.Series([int(df["n"].sum())],
                                                      dtype="int64")})

    return counts.repartition(1).map_batches(total, batch_format="pandas")


TRIANGLE_COUNT_SQL = """
WITH raw AS (
  SELECT d.doc_id AS u,
         (d.doc_id + j.j) % (SELECT count(*) FROM documents) AS v
  FROM documents d, (VALUES (1), (2), (3)) j(j)
), e AS (
  SELECT DISTINCT least(u, v) AS a, greatest(u, v) AS b
  FROM raw WHERE u <> v
)
SELECT CAST(count(*) AS BIGINT) AS n_triangles
FROM e e1 JOIN e e2 ON e2.a = e1.a AND e2.b > e1.b
     JOIN e e3 ON e3.a = e1.b AND e3.b = e2.b
"""
