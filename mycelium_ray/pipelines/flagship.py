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

from ..imaging import encode_image
from ..stages.decode import DecodeValidate, clean_caption_batch

_FMTS = ["png", "jpeg", "webp"]


def synth_image_row(doc_id: int) -> tuple[bytes, int, int, str]:
    """Deterministic image for a doc row: seeded by doc_id only."""
    rng = np.random.default_rng(1_000_003 * doc_id + 7)
    w = int(rng.integers(16, 41))
    h = int(rng.integers(16, 41))
    px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    fmt = _FMTS[doc_id % 3]
    return encode_image(px, fmt), w, h, fmt


def derive_images_batch(batch: pa.Table) -> pa.Table:
    ids = batch["doc_id"].to_pylist()
    payloads = [synth_image_row(int(d)) for d in ids]
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
