"""Perceptual near-duplicate detection over image rows (SURVEY.md §2.7:
"Graft adds phash:int64 column; near-dup = groupby on phash bands").

Banding: a 64-bit phash splits into 4 × 16-bit bands; images within
hamming distance ≤ 3×(bands-1)... pigeonhole: any pair within hamming d
agree on at least one band when d < n_bands. Candidates (any-band match)
are verified with exact hamming distance. Same skeleton as the text
SimHash pairs — map_batches banding → coarse-bucket groupby → verify.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

N_BANDS = 4  # 16-bit bands over the 64-bit phash


def phash_neardup(ds_or_table, max_hamming: int = 6,
                  id_col: str = "image_id", phash_col: str = "phash"):
    """Pairs of images with phash hamming ≤ max_hamming.

    Input: a ray.data.Dataset or pyarrow Table with (id_col, phash_col).
    Output: pa.Table (id_a, id_b, hamming), id_a < id_b lexicographically.
    """
    if isinstance(ds_or_table, pa.Table):
        ds = rd.from_arrow(ds_or_table.select([id_col, phash_col]))
    else:
        ds = ds_or_table.select_columns([id_col, phash_col])

    def bands(df: pd.DataFrame) -> pd.DataFrame:
        h = df[phash_col].to_numpy().astype("uint64")
        out = []
        for b in range(N_BANDS):
            band_val = ((h >> np.uint64(16 * b)) & np.uint64(0xFFFF)).astype("int64")
            out.append(pd.DataFrame({
                "id": df[id_col], "phash": h.astype("int64"),
                "band": b, "band_val": band_val,
                "bucket": (band_val % 64).astype("int64"),
            }))
        return pd.concat(out, ignore_index=True)

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        m = g.merge(g, on=["band", "band_val"])
        m = m[m["id_x"] < m["id_y"]]
        if len(m) == 0:
            return pd.DataFrame({"id_a": pd.Series([], dtype="object"),
                                 "id_b": pd.Series([], dtype="object"),
                                 "ph_a": pd.Series([], dtype="int64"),
                                 "ph_b": pd.Series([], dtype="int64")})
        m = m.drop_duplicates(subset=["id_x", "id_y"])
        return pd.DataFrame({"id_a": m["id_x"], "id_b": m["id_y"],
                             "ph_a": m["phash_x"], "ph_b": m["phash_y"]})

    cand = ds.map_batches(bands, batch_format="pandas") \
        .groupby("bucket").map_groups(bucket_pairs, batch_format="pandas") \
        .to_pandas()
    if len(cand) == 0:
        return pa.table({"id_a": pa.array([], pa.string()),
                         "id_b": pa.array([], pa.string()),
                         "hamming": pa.array([], pa.int64())})
    cand = cand.drop_duplicates(subset=["id_a", "id_b"])
    x = cand["ph_a"].to_numpy().astype("uint64") ^ \
        cand["ph_b"].to_numpy().astype("uint64")
    # vectorized popcount via byte-view + lookup table
    lut = np.array([bin(i).count("1") for i in range(256)], dtype="uint8")
    ham = lut[x.view("uint8").reshape(len(x), 8)].sum(axis=1).astype("int64")
    keep = ham <= max_hamming
    out = cand[keep].assign(hamming=ham[keep])
    out = out.sort_values(["id_a", "id_b"]).reset_index(drop=True)
    return pa.table({
        "id_a": pa.array(out["id_a"].astype(str)),
        "id_b": pa.array(out["id_b"].astype(str)),
        "hamming": pa.array(out["hamming"].astype("int64")),
    })
