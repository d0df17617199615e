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
def token_count_batch(t: pa.Table) -> pa.Table:
    """Arrow-native: a token is one ``\\S+`` run (RE2), identical to the
    oracle's ``string_split_regex(trim(text), '\\s+')`` length — counted
    without materializing the split (zero-copy in, no pandas boxing)."""
    import pyarrow.compute as pc
    text = pc.fill_null(t["text"], "")
    return pa.table({
        "doc_id": t["doc_id"],
        "n_tokens": pc.cast(pc.count_substring_regex(text, r"\S+"),
                            pa.int64()),
    })


def token_count(sf_dir: str):
    return _read(sf_dir, "documents", ["doc_id", "text"]) \
        .map_batches(token_count_batch, batch_format="pyarrow")


TOKEN_COUNT_SQL = """
SELECT doc_id,
       len(string_split_regex(trim(text), '\\s+')) AS n_tokens
FROM documents
"""


# --------------------------------------------------------------------------
# quality_score: integer counts + one IEEE division
# --------------------------------------------------------------------------
def _stopword_hits(t: pa.Table, *stopsets) -> list[np.ndarray]:
    """Per-row counts of tokens ∈ each stopset, Arrow-vectorized: one
    regex split, list_flatten + list_parent_indices, is_in per set, and a
    single Arrow group_by on the parent index (no per-token Python)."""
    import pyarrow.compute as pc
    text = pc.fill_null(t["text"], "")
    toks = pc.split_pattern_regex(text, r"\s+")
    flat = pc.list_flatten(toks)
    parent = pc.list_parent_indices(toks)
    cols = {"p": parent}
    for i, ss in enumerate(stopsets):
        hit = pc.is_in(flat, value_set=pa.array(list(ss)))
        cols[f"h{i}"] = pc.cast(hit, pa.int64())
    grp = pa.table(cols).group_by("p").aggregate(
        [(f"h{i}", "sum") for i in range(len(stopsets))])
    idx = grp["p"].to_numpy()
    outs = []
    for i in range(len(stopsets)):
        out = np.zeros(len(t), dtype=np.int64)
        out[idx] = grp[f"h{i}_sum"].to_numpy()
        outs.append(out)
    return outs


def quality_score_batch(t: pa.Table) -> pa.Table:
    import pyarrow.compute as pc
    text = pc.fill_null(t["text"], "")
    n_tokens = pc.cast(pc.count_substring_regex(text, r"\S+"),
                       pa.int64()).to_numpy()
    (n_stop,) = _stopword_hits(t, STOP_EN)
    n_chars = pc.cast(pc.utf8_length(text), pa.int64())
    return pa.table({
        "doc_id": t["doc_id"],
        "n_chars_c": n_chars,
        "n_tokens": pa.array(n_tokens, pa.int64()),
        "n_stopwords": pa.array(n_stop, pa.int64()),
        "stop_ratio": pa.array(n_stop / np.maximum(n_tokens, 1),
                               pa.float64()),
    })


def quality_score(sf_dir: str):
    return _read(sf_dir, "documents", ["doc_id", "text"]) \
        .map_batches(quality_score_batch, batch_format="pyarrow")


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
def lang_id_batch(t: pa.Table) -> pa.Table:
    n_en, n_es = _stopword_hits(t, STOP_EN, STOP_ES)
    pred = np.where(n_en > n_es, "en", np.where(n_es > n_en, "es", "und"))
    return pa.table({"doc_id": t["doc_id"],
                     "lang_pred": pa.array(pred, pa.string())})


def lang_id(sf_dir: str):
    return _read(sf_dir, "documents", ["doc_id", "text"]) \
        .map_batches(lang_id_batch, batch_format="pyarrow")


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


# --------------------------------------------------------------------------
# stem_stats: Porter-stemmed token statistics (M26; non-SQL → rows-only —
# the container's DuckDB cannot load the fts extension offline)
# --------------------------------------------------------------------------
def stem_stats_batch(df: pd.DataFrame) -> pd.DataFrame:
    """(doc_id, n_tokens, n_distinct_stems, top_stem) per document using
    the from-scratch Porter stemmer (functions/stemmer.py). The distinct-
    value memo inside porter_stem_many makes the per-token cost ~a dict
    hit on Zipfian text."""
    from collections import Counter

    from ..functions.stemmer import porter_stem_many
    toks = _tokens(df["text"])
    n_tok, n_stem, top = [], [], []
    for ws in toks:
        stems = porter_stem_many([w.lower() for w in ws])
        n_tok.append(len(ws))
        n_stem.append(len(set(stems)))
        if stems:
            c = Counter(stems)
            top.append(min(c.items(), key=lambda kv: (-kv[1], kv[0]))[0])
        else:
            top.append("")
    return pd.DataFrame({
        "doc_id": df["doc_id"],
        "n_tokens": pd.Series(n_tok, dtype="int64"),
        "n_distinct_stems": pd.Series(n_stem, dtype="int64"),
        "top_stem": pd.Series(top, dtype="str"),
    })


def stem_stats(sf_dir: str):
    return _read(sf_dir, "documents", ["doc_id", "text"]) \
        .map_batches(stem_stats_batch, batch_format="pandas")


# --------------------------------------------------------------------------
# word_count_topk: classic distributed word count with partial aggregation,
# top-k terms. The flat_map blow-up (1 doc → n tokens) never leaves the
# batch: tokens are counted per batch first, so the shuffle moves one row
# per distinct (token) per batch, not one row per token occurrence.
# Tokens are ASCII [A-Za-z0-9]+ runs extracted BEFORE lowercasing so the
# lowercase step only ever sees ASCII — bit-identical between Python and
# the DuckDB/ICU oracle regardless of the surrounding Unicode text.
# --------------------------------------------------------------------------
WORDCOUNT_TOPK = 20


def word_count_topk(sf_dir: str, k: int = WORDCOUNT_TOPK):
    """(token, n) for the k most frequent ASCII word tokens,
    (n desc, token asc)-ordered with rank."""
    import pyarrow.compute as pc

    def partial(t: pa.Table) -> pa.Table:
        text = pc.fill_null(t["text"], "")
        # Arrow-vectorized flat_map: split on non-token runs → list array,
        # flatten, drop the empty boundary tokens, ASCII-lowercase, count.
        toks = pc.list_flatten(
            pc.split_pattern_regex(text, "[^A-Za-z0-9]+"))
        toks = pc.utf8_lower(toks.filter(pc.not_equal(toks, "")))
        vc = pc.value_counts(toks)
        return pa.table({"token": vc.field("values"),
                         "n": pc.cast(vc.field("counts"), pa.int64())})

    from ray.data.aggregate import Sum
    agg = _read(sf_dir, "documents", ["text"]) \
        .map_batches(partial, batch_format="pyarrow") \
        .groupby("token").aggregate(Sum("n", alias_name="n"))

    def partial_topk(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(["n", "token"],
                              ascending=[False, True]).head(k)

    pdf = agg.map_batches(partial_topk, batch_format="pandas").to_pandas()
    pdf = pdf.sort_values(["n", "token"], ascending=[False, True]).head(k)
    pdf["rank"] = np.arange(1, len(pdf) + 1, dtype="int64")
    return pa.Table.from_pandas(pdf.reset_index(drop=True),
                                preserve_index=False)


WORD_COUNT_SQL = f"""
WITH toks AS (
  SELECT lower(unnest(regexp_extract_all(text, '[A-Za-z0-9]+'))) AS token
  FROM documents
), c AS (
  SELECT token, count(*) AS n FROM toks GROUP BY token
)
SELECT token, n,
       row_number() OVER (ORDER BY n DESC, token ASC) AS rank
FROM c ORDER BY n DESC, token ASC LIMIT {WORDCOUNT_TOPK}
"""
