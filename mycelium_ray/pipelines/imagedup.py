"""Perceptual near-duplicate detection over image rows (SURVEY.md §2.7:
"Graft adds phash:int64 column; near-dup = groupby on phash bands").

Banding: a 64-bit phash splits into max_hamming+1 disjoint segments
(_simhash_segments — 7 segments of 10/9 bits at the default d≤6); by
pigeonhole any pair within hamming distance d agrees on at least one
segment, so the candidate set is COMPLETE for the advertised contract at
the lowest collision rate the guarantee allows.
Candidates (any-band match) are verified with exact hamming distance —
vectorized popcount on the two hashes riding in each candidate row, INSIDE
the bucketed map_groups; a second pair-key-bucketed groupby collapses
cross-band duplicates. Nothing row-shaped reaches the driver except the
final thresholded pair set (the query result). Same skeleton as the text
SimHash pairs (pipelines/dedup.py:simhash_neardup_pairs); ids here are
strings, so the pair key is a hash-bucket column rather than a packed int.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

from .dedup import N_BUCKETS, _popcount64, _simhash_segments


def phash_neardup(ds_or_table, max_hamming: int = 6,
                  id_col: str = "image_id", phash_col: str = "phash"):
    """Pairs of images with phash hamming ≤ max_hamming.

    Input: a ray.data.Dataset or pyarrow Table with (id_col, phash_col).
    Output: pa.Table (id_a, id_b, hamming), id_a < id_b lexicographically.
    Banding is d+1 disjoint pigeonhole segments (shared with the text
    simhash op) — complete for the advertised contract at the lowest
    candidate-collision rate the guarantee allows.
    """
    spans = _simhash_segments(max_hamming)
    if isinstance(ds_or_table, pa.Table):
        ds = rd.from_arrow(ds_or_table.select([id_col, phash_col]))
    else:
        ds = ds_or_table.select_columns([id_col, phash_col])

    def bands(df: pd.DataFrame) -> pd.DataFrame:
        h = df[phash_col].to_numpy().astype("uint64")
        out = []
        for b, (shift, width) in enumerate(spans):
            mask = np.uint64((1 << width) - 1)
            band_val = ((h >> np.uint64(shift)) & mask).astype("int64")
            out.append(pd.DataFrame({
                "id": df[id_col], "phash": h.astype("int64"),
                "band": b, "band_val": band_val,
                "bucket": ((b * 65599 + band_val) % N_BUCKETS).astype("int64"),
            }))
        return pd.concat(out, ignore_index=True)

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        m = g.merge(g, on=["band", "band_val"])
        m = m[m["id_x"] < m["id_y"]]
        if len(m) == 0:
            return pd.DataFrame({"id_a": pd.Series([], dtype="str"),
                                 "id_b": pd.Series([], dtype="str"),
                                 "hamming": pd.Series([], dtype="int64"),
                                 "pbucket": pd.Series([], dtype="int64")})
        m = m.drop_duplicates(subset=["id_x", "id_y"])
        # verify HERE: both hashes are in the pair row already
        x = m["phash_x"].to_numpy().astype("uint64") ^ \
            m["phash_y"].to_numpy().astype("uint64")
        ham = _popcount64(x)
        keep = ham <= max_hamming
        m = m[keep]
        return pd.DataFrame({
            "id_a": m["id_x"].astype(str),
            "id_b": m["id_y"].astype(str),
            "hamming": ham[keep],
            "pbucket": (pd.util.hash_pandas_object(
                (m["id_x"] + "\x00" + m["id_y"]).reset_index(drop=True),
                index=False).to_numpy() % N_BUCKETS).astype("int64"),
        })

    def dedup_pairs(g: pd.DataFrame) -> pa.Table:
        # Arrow-typed final: schema survives all-empty results
        g = g.drop_duplicates(subset=["id_a", "id_b"])
        return pa.table({
            "id_a": pa.array(g["id_a"].astype(str), pa.string()),
            "id_b": pa.array(g["id_b"].astype(str), pa.string()),
            "hamming": pa.array(g["hamming"].to_numpy().astype("int64"),
                                pa.int64()),
        })

    # Distributed final order (pair set is unbounded at scale)
    from .dedup import sorted_or_empty
    pairs = ds.map_batches(bands, batch_format="pandas") \
        .groupby("bucket").map_groups(bucket_pairs, batch_format="pandas") \
        .groupby("pbucket").map_groups(dedup_pairs, batch_format="pandas")
    return sorted_or_empty(
        pairs, ["id_a", "id_b"],
        pa.table({"id_a": pa.array([], pa.string()),
                  "id_b": pa.array([], pa.string()),
                  "hamming": pa.array([], pa.int64())}))
