"""Text-analysis operators over the ``documents`` table.

Large-scale training-data ops (per the build brief) re-expressed as
Ray Data ``map_batches`` stages: token counting, quality scoring,
language-ID, document fingerprinting, caption/text cleaning. Each has a
DuckDB-oracle-compatible definition: integer counts and single IEEE
divisions only (no float accumulation), so value-hash comparison is exact.

Reference lineage: tokenizers at /root/reference/dist/utils/__init__.py:66-79
(M25), control-char filter local_indexer.cc:74-82 (M21), UTF-8 validation
dist/utils/__init__.py:5-25 (M23).
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

from ..hashing import url_hash64_many

STOP_EN = ("the", "a", "of", "and", "to", "in", "is")
STOP_ES = ("el", "la", "de", "y", "en", "un", "es")

_WS = re.compile(r"\s+")


def _read(sf_dir: str, name: str, columns=None):
    return rd.read_parquet(f"{sf_dir}/{name}.parquet", columns=columns)


def _tokens(series: pd.Series) -> pd.Series:
    # str.split() splits on whitespace runs and drops empties — identical to
    # string_split_regex(trim(text), '\s+') in the SQL oracle
    return series.fillna("").str.split()


# --------------------------------------------------------------------------
# token_count: (doc_id, n_tokens)
# --------------------------------------------------------------------------
def token_count_batch(df: pd.DataFrame) -> pd.DataFrame:
    return pd.DataFrame({
        "doc_id": df["doc_id"],
        "n_tokens": _tokens(df["text"]).str.len().astype("int64"),
    })


def token_count(sf_dir: str):
    return _read(sf_dir, "documents", ["doc_id", "text"]) \
        .map_batches(token_count_batch, batch_format="pandas")


TOKEN_COUNT_SQL = """
SELECT doc_id,
       len(string_split_regex(trim(text), '\\s+')) AS n_tokens
FROM documents
"""


# --------------------------------------------------------------------------
# quality_score: integer counts + one IEEE division
# --------------------------------------------------------------------------
def quality_score_batch(df: pd.DataFrame) -> pd.DataFrame:
    toks = _tokens(df["text"])
    n_tokens = toks.str.len().astype("int64")
    stop = set(STOP_EN)
    n_stop = toks.map(lambda ws: sum(1 for w in ws if w in stop)).astype("int64")
    n_chars = df["text"].fillna("").str.len().astype("int64")
    return pd.DataFrame({
        "doc_id": df["doc_id"],
        "n_chars_c": n_chars,
        "n_tokens": n_tokens,
        "n_stopwords": n_stop,
        "stop_ratio": n_stop.to_numpy() / np.maximum(n_tokens.to_numpy(), 1),
    })


def quality_score(sf_dir: str):
    return _read(sf_dir, "documents", ["doc_id", "text"]) \
        .map_batches(quality_score_batch, batch_format="pandas")


QUALITY_SCORE_SQL = f"""
WITH t AS (
  SELECT doc_id,
         length(text) AS n_chars_c,
         string_split_regex(trim(text), '\\s+') AS toks
  FROM documents
)
SELECT doc_id, n_chars_c,
       len(toks) AS n_tokens,
       len(list_filter(toks, w -> w IN {STOP_EN!r})) AS n_stopwords,
       CAST(len(list_filter(toks, w -> w IN {STOP_EN!r})) AS DOUBLE)
         / greatest(len(toks), 1) AS stop_ratio
FROM t
"""


# --------------------------------------------------------------------------
# lang_id: stopword-hit n-gram heuristic
# --------------------------------------------------------------------------
def lang_id_batch(df: pd.DataFrame) -> pd.DataFrame:
    toks = _tokens(df["text"])
    en, es = set(STOP_EN), set(STOP_ES)
    n_en = toks.map(lambda ws: sum(1 for w in ws if w in en))
    n_es = toks.map(lambda ws: sum(1 for w in ws if w in es))
    pred = np.where(n_en > n_es, "en", np.where(n_es > n_en, "es", "und"))
    return pd.DataFrame({"doc_id": df["doc_id"], "lang_pred": pred})


def lang_id(sf_dir: str):
    return _read(sf_dir, "documents", ["doc_id", "text"]) \
        .map_batches(lang_id_batch, batch_format="pandas")


LANG_ID_SQL = f"""
WITH t AS (
  SELECT doc_id,
         len(list_filter(string_split_regex(trim(text), '\\s+'),
                         w -> w IN {STOP_EN!r})) AS n_en,
         len(list_filter(string_split_regex(trim(text), '\\s+'),
                         w -> w IN {STOP_ES!r})) AS n_es
  FROM documents
)
SELECT doc_id,
       CASE WHEN n_en > n_es THEN 'en'
            WHEN n_es > n_en THEN 'es'
            ELSE 'und' END AS lang_pred
FROM t
"""


# --------------------------------------------------------------------------
# fingerprint: rolling-hash document fingerprint (non-SQL; rows-only check)
# --------------------------------------------------------------------------
def fingerprint_batch(df: pd.DataFrame, window: int = 4) -> pd.DataFrame:
    """Winnowing-style fingerprint: min rolling hash over token windows.

    64-bit FNV-1a over each token window; the doc fingerprint is the MIN
    window hash (deterministic, order-sensitive, content-addressed).
    """
    out = np.zeros(len(df), dtype=np.uint64)
    texts = df["text"].fillna("").tolist()
    for i, text in enumerate(texts):
        ws = text.split()
        if not ws:
            continue
        if len(ws) < window:
            grams = [" ".join(ws)]
        else:
            grams = [" ".join(ws[j:j + window])
                     for j in range(len(ws) - window + 1)]
        h = url_hash64_many(grams)
        out[i] = h.min()
    return pd.DataFrame({"doc_id": df["doc_id"],
                         "fingerprint": out.astype("int64")})


def fingerprint(sf_dir: str):
    return _read(sf_dir, "documents", ["doc_id", "text"]) \
        .map_batches(fingerprint_batch, batch_format="pandas")
