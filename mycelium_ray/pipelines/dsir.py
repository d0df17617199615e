"""DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
arXiv:2302.03169 — public) over the ``documents`` table.

Selects raw-corpus documents whose hashed-bigram distribution looks like
a target domain. The two-pass distributed shape:

1. **Feature histograms** (one streaming pass): every doc's word bigrams
   hash into ``N_FEATURE_BUCKETS`` buckets; per-batch partial counts for
   the target slice (``source == TARGET_SOURCE``) and the raw slice
   reduce through one small groupby — the driver only ever sees
   ≤ N_FEATURE_BUCKETS rows, never row data.
2. **Weight + Gumbel top-k** (second streaming pass): the smoothed
   log-ratio vector is broadcast once (``ray.put``); each raw doc gets
   log w(x) = Σ_grams log p_target[b]/q_raw[b] and a deterministic
   Gumbel perturbation keyed on doc_id (splitmix64 — reproducible across
   runs and partitionings). Selection = top-``N_SELECT`` by perturbed
   key: per-batch partial top-k, then one tiny final cut. Sampling
   without replacement via Gumbel-top-k is the paper's resampling step
   made deterministic.

Rows-only oracle (hashed features are not SQL-expressible);
tests/test_dsir.py pins the exact selected set + weights against an
independent single-process reference.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data as rd

from ..hashing import url_hash64_many

N_FEATURE_BUCKETS = 8192
N_SELECT = 100
TARGET_SOURCE = "src1"
_SMOOTH = 1.0  # add-one smoothing on both histograms
_GUMBEL_SALT = np.uint64(0x5D51_7E32_A1B4_C9D7)


def _read(sf_dir: str, columns=None):
    return rd.read_parquet(f"{sf_dir}/documents.parquet", columns=columns)


def _bigram_buckets(text: str, n_buckets: int) -> np.ndarray:
    """Hashed word-bigram bucket ids of one document (order-preserving
    multiset). Tokens are whitespace runs; per-word hashes use the
    engine's stable sha1-based 64-bit hash (process-invariant — Python's
    built-in str hash is salted per process and would break
    reproducibility across workers), combined per bigram via splitmix."""
    toks = text.split() if text else []
    if len(toks) < 2:
        return np.empty(0, dtype=np.int64)
    h = url_hash64_many(toks).astype(np.uint64)
    with np.errstate(over="ignore"):
        pair = splitmix64_vec((h[:-1] * np.uint64(0x9E37_79B9_7F4A_7C15))
                              ^ h[1:])
    return (pair % np.uint64(n_buckets)).astype(np.int64)


def splitmix64_vec(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer over uint64 (same constants as
    hashing.splitmix64)."""
    with np.errstate(over="ignore"):
        z = (x + np.uint64(0x9E3779B97F4A7C15))
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return z ^ (z >> np.uint64(31))


def feature_histograms(sf_dir: str,
                       n_buckets: int = N_FEATURE_BUCKETS,
                       target_source: str = TARGET_SOURCE):
    """→ (tgt_counts, raw_counts): bucket count vectors (driver-side,
    size n_buckets) reduced from per-batch sparse partials."""
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        texts = t["text"].to_pylist()
        srcs = t["source"].to_pylist()
        tgt = np.zeros(n_buckets, dtype=np.int64)
        raw = np.zeros(n_buckets, dtype=np.int64)
        for txt, s in zip(texts, srcs):
            b = _bigram_buckets(txt or "", n_buckets)
            if len(b) == 0:
                continue
            acc = tgt if s == target_source else raw
            np.add.at(acc, b, 1)
        nz = np.nonzero(tgt | raw)[0]
        return pa.table({"bucket": pa.array(nz.astype("int64")),
                         "tgt": pa.array(tgt[nz]),
                         "raw": pa.array(raw[nz])})

    agg = _read(sf_dir, ["text", "source"]) \
        .map_batches(partial, batch_format="pyarrow") \
        .groupby("bucket").aggregate(Sum("tgt", alias_name="tgt"),
                                     Sum("raw", alias_name="raw")) \
        .to_pandas()
    tgt = np.zeros(n_buckets, dtype=np.int64)
    raw = np.zeros(n_buckets, dtype=np.int64)
    idx = agg["bucket"].to_numpy().astype(np.int64)
    tgt[idx] = agg["tgt"].to_numpy()
    raw[idx] = agg["raw"].to_numpy()
    return tgt, raw


def _log_ratio(tgt: np.ndarray, raw: np.ndarray) -> np.ndarray:
    p = (tgt + _SMOOTH) / (tgt.sum() + _SMOOTH * len(tgt))
    q = (raw + _SMOOTH) / (raw.sum() + _SMOOTH * len(raw))
    return np.log(p) - np.log(q)


def _gumbel_keys(doc_ids: np.ndarray) -> np.ndarray:
    """Deterministic per-doc Gumbel(0,1) noise from splitmix64(doc_id ^
    salt) mapped to (0,1): reproducible across runs/partitionings."""
    u64 = splitmix64_vec(doc_ids.astype(np.uint64) ^ _GUMBEL_SALT)
    u = (u64.astype(np.float64) + 0.5) / 2.0 ** 64
    return -np.log(-np.log(u))


def dsir_resample(sf_dir: str, n_select: int = N_SELECT,
                  n_buckets: int = N_FEATURE_BUCKETS,
                  target_source: str = TARGET_SOURCE):
    """(doc_id, logw) of the n_select raw documents chosen by
    Gumbel-top-k importance resampling toward the target domain."""
    tgt, raw = feature_histograms(sf_dir, n_buckets, target_source)
    lr_ref = ray.put(_log_ratio(tgt, raw))

    def score(t: pa.Table) -> pa.Table:
        lr = ray.get(lr_ref)
        ids = t["doc_id"].to_numpy().astype(np.int64)
        texts = t["text"].to_pylist()
        srcs = t["source"].to_pylist()
        logw = np.zeros(len(ids), dtype=np.float64)
        keep = np.zeros(len(ids), dtype=bool)
        for i, (txt, s) in enumerate(zip(texts, srcs)):
            if s == target_source:
                continue  # resample only the raw slice
            keep[i] = True
            b = _bigram_buckets(txt or "", n_buckets)
            if len(b):
                logw[i] = lr[b].sum()
        key = logw + _gumbel_keys(ids)
        out = pa.table({"doc_id": pa.array(ids[keep]),
                        "logw": pa.array(logw[keep]),
                        "key": pa.array(key[keep])})
        # partial top-k: at most n_select rows leave each batch
        idx = np.argsort(out["key"].to_numpy())[::-1][:n_select]
        return out.take(np.sort(idx))

    def final_cut(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values("key", ascending=False).head(n_select)
        return df[["doc_id", "logw"]].sort_values("doc_id") \
            .reset_index(drop=True)

    return _read(sf_dir, ["doc_id", "text", "source"]) \
        .map_batches(score, batch_format="pyarrow") \
        .repartition(1).map_batches(final_cut, batch_format="pandas")
