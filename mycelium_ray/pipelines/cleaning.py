"""Corpus-cleaning operators: PII redaction, repetition filtering, and
benchmark decontamination over the ``documents`` table.

These are the safety/quality gates a large-scale training-data pipeline
runs between raw crawl output and dedup (reference analog: the caption/
text cleaning maps M21/M23/M24, /root/reference/dist/utils/__init__.py:5-25
and sgml_stripper.py:10-29 — same per-record map shape, grown to the ops a
100-TB text corpus actually needs).

Scale design:
- ``pii_redact`` / ``repetition_filter`` are pure map stages — zero-copy
  Arrow in/out, RE2 kernels (`replace_substring_regex`), no shuffle, no
  state; they stream at read throughput on any cluster size.
- ``decontaminate`` is the canonical broadcast-membership shape: the
  benchmark ("eval") side is tiny by construction, so its 8-gram hash set
  is built once, ``ray.put`` once, and probed inside ``map_batches`` with
  a vectorized ``np.isin`` — the 100-TB side streams map-only, no join
  shuffle. Gram hashing is a numpy rolling polynomial over per-token
  64-bit hashes (no per-gram Python, no gram strings materialized).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data as rd

from ..hashing import token_hash64_many, url_hash64_many

# RE2 patterns — identical semantics in Arrow's replace_substring_regex
# and DuckDB's regexp_replace (both RE2), verified side-by-side.
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IPV4 = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PII_PHONE = r"\b\d{3}[-. ]\d{3}[-. ]\d{4}\b"

REP_MAX_RATIO = 0.5  # keep docs whose duplicate-token ratio is <= this
DECON_NGRAM = 8      # benchmark-overlap gram width (tokens)


def _read(sf_dir: str, name: str, columns=None):
    return rd.read_parquet(f"{sf_dir}/{name}.parquet", columns=columns)


# --------------------------------------------------------------------------
# pii_redact: (doc_id, clean_text, n_pii)
# --------------------------------------------------------------------------
def pii_redact_batch(t: pa.Table) -> pa.Table:
    """Sequential email -> IPv4 -> phone redaction; each pattern is counted
    on the text it actually sees (post prior redactions), matching the
    nested-CTE oracle exactly."""
    import pyarrow.compute as pc
    text = pc.fill_null(t["text"], "")
    n = pc.cast(pc.count_substring_regex(text, PII_EMAIL), pa.int64())
    text = pc.replace_substring_regex(text, PII_EMAIL, "<EMAIL>")
    for pat, repl in ((PII_IPV4, "<IP>"), (PII_PHONE, "<PHONE>")):
        n = pc.add(n, pc.cast(pc.count_substring_regex(text, pat), pa.int64()))
        text = pc.replace_substring_regex(text, pat, repl)
    return pa.table({"doc_id": t["doc_id"], "clean_text": text, "n_pii": n})


def pii_redact(sf_dir: str):
    return _read(sf_dir, "documents", ["doc_id", "text"]) \
        .map_batches(pii_redact_batch, batch_format="pyarrow")


PII_REDACT_SQL = f"""
WITH s1 AS (
  SELECT doc_id,
         len(regexp_extract_all(text, '{PII_EMAIL}')) AS c1,
         regexp_replace(text, '{PII_EMAIL}', '<EMAIL>', 'g') AS t1
  FROM documents
), s2 AS (
  SELECT doc_id, c1,
         len(regexp_extract_all(t1, '{PII_IPV4}')) AS c2,
         regexp_replace(t1, '{PII_IPV4}', '<IP>', 'g') AS t2
  FROM s1
)
SELECT doc_id,
       regexp_replace(t2, '{PII_PHONE}', '<PHONE>', 'g') AS clean_text,
       c1 + c2 + len(regexp_extract_all(t2, '{PII_PHONE}')) AS n_pii
FROM s2
"""


# --------------------------------------------------------------------------
# repetition_filter: (doc_id, n_tokens_f, n_distinct, rep_ratio, keep)
# --------------------------------------------------------------------------
def repetition_filter_batch(t: pa.Table) -> pa.Table:
    """Gopher-style repetition gate: duplicate-token ratio per document.
    Fully Arrow-vectorized — one regex split, then two group_bys (per-row
    distinct count via (row, token) group, then per-row total); no
    per-document Python loop."""
    import pyarrow.compute as pc
    text = pc.utf8_lower(pc.fill_null(t["text"], ""))
    toks = pc.split_pattern_regex(text, r"\s+")
    flat = pc.list_flatten(toks)
    parent = pc.list_parent_indices(toks)
    keep_tok = pc.not_equal(flat, "")
    pairs = pa.table({"p": pc.filter(parent, keep_tok),
                      "tok": pc.filter(flat, keep_tok)})
    per_tok = pairs.group_by(["p", "tok"]).aggregate([("tok", "count")])
    per_doc = per_tok.group_by("p").aggregate([("tok_count", "sum"),
                                               ("tok_count", "count")])
    n_tok = np.zeros(len(t), dtype=np.int64)
    n_dis = np.zeros(len(t), dtype=np.int64)
    idx = per_doc["p"].to_numpy()
    n_tok[idx] = per_doc["tok_count_sum"].to_numpy()
    n_dis[idx] = per_doc["tok_count_count"].to_numpy()
    ratio = 1.0 - n_dis / np.maximum(n_tok, 1)
    return pa.table({
        "doc_id": t["doc_id"],
        "n_tokens_f": pa.array(n_tok, pa.int64()),
        "n_distinct": pa.array(n_dis, pa.int64()),
        "rep_ratio": pa.array(ratio, pa.float64()),
        "keep": pa.array(ratio <= REP_MAX_RATIO, pa.bool_()),
    })


def repetition_filter(sf_dir: str):
    return _read(sf_dir, "documents", ["doc_id", "text"]) \
        .map_batches(repetition_filter_batch, batch_format="pyarrow")


REPETITION_FILTER_SQL = f"""
WITH t AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '\\s+'),
                     x -> x <> '') AS toks
  FROM documents
)
SELECT doc_id,
       len(toks) AS n_tokens_f,
       len(list_distinct(toks)) AS n_distinct,
       1.0 - CAST(len(list_distinct(toks)) AS DOUBLE)
           / greatest(len(toks), 1) AS rep_ratio,
       (1.0 - CAST(len(list_distinct(toks)) AS DOUBLE)
            / greatest(len(toks), 1)) <= {REP_MAX_RATIO} AS keep
FROM t
"""


# --------------------------------------------------------------------------
# decontaminate: (doc_id, contaminated) for non-eval docs
# --------------------------------------------------------------------------
_GRAM_P = np.uint64(1099511628211)  # FNV prime; rolling polynomial base


def _gram_hashes(texts, n: int = DECON_NGRAM):
    """Vectorized token-``n``-gram hashes: (doc_index, gram_hash) arrays.

    Tokens are lowercased whitespace runs (empty-filtered) — the same
    token definition as the oracle's list_filter(string_split_regex(...)).
    A gram hash is a degree-``n`` polynomial over per-token 64-bit hashes
    (uint64 wraparound); grams never cross a document boundary. Tokens
    containing no whitespace make join-by-space injective, so hash
    equality mirrors the oracle's joined-string equality (64-bit
    collisions are negligible at any realistic gram count)."""
    import pyarrow.compute as pc
    toks = pc.split_pattern_regex(pc.utf8_lower(pc.fill_null(texts, "")),
                                  r"\s+")
    flat = pc.list_flatten(toks)
    parent = pc.list_parent_indices(toks).to_numpy()
    flat_np = np.asarray(flat.to_pandas(), dtype=object)
    mask = flat_np != ""
    flat_np, parent = flat_np[mask], parent[mask]
    if len(flat_np) < n:
        return np.empty(0, np.int64), np.empty(0, np.uint64)
    th = token_hash64_many(list(flat_np))
    m = len(th) - n + 1
    acc = th[:m].copy()
    for j in range(1, n):
        acc = acc * _GRAM_P + th[j:m + j]
    valid = parent[:m] == parent[n - 1:]
    return parent[:m][valid].astype(np.int64), acc[valid]


class _EvalGramProbe:
    """Actor-pool stage: holds the broadcast eval gram-hash set (sorted
    uint64 array) once per actor; flags any doc sharing a gram."""

    def __init__(self, eval_ref):
        # robust to Ray resolving ctor-arg ObjectRefs before delivery
        self._grams = ray.get(eval_ref) \
            if isinstance(eval_ref, ray.ObjectRef) else eval_ref

    def __call__(self, t: pa.Table) -> pa.Table:
        doc_idx, gh = _gram_hashes(t["text"])
        flags = np.zeros(len(t), dtype=bool)
        if len(gh):
            hit = np.isin(gh, self._grams)
            np.logical_or.at(flags, doc_idx[hit], True)
        return pa.table({"doc_id": t["doc_id"],
                         "contaminated": pa.array(flags, pa.bool_())})


def decontaminate(sf_dir: str):
    """Benchmark decontamination: docs with ``doc_id % 100 == 0`` stand in
    for the eval/benchmark set; every other doc is flagged if it shares
    any token-8-gram with that set. Eval side is built once and broadcast
    (ray.put); the corpus side streams map-only — no shuffle."""
    import pyarrow.compute as pc

    def eval_grams(t: pa.Table) -> pa.Table:
        sel = pa.array(t["doc_id"].to_numpy() % 100 == 0)
        _, gh = _gram_hashes(pc.filter(t["text"], sel))
        return pa.table({"g": pa.array(gh, pa.uint64())})

    eval_g = _read(sf_dir, "documents", ["doc_id", "text"]) \
        .map_batches(eval_grams, batch_format="pyarrow") \
        .to_pandas()["g"].to_numpy()          # tiny: eval-set grams only
    grams = np.unique(eval_g.astype(np.uint64))
    eval_ref = ray.put(grams)

    def non_eval(t: pa.Table) -> pa.Table:
        return t.filter(pa.array(t["doc_id"].to_numpy() % 100 != 0))

    return _read(sf_dir, "documents", ["doc_id", "text"]) \
        .map_batches(non_eval, batch_format="pyarrow") \
        .map_batches(_EvalGramProbe, fn_constructor_args=(eval_ref,),
                     concurrency=(1, 8), batch_format="pyarrow")


# --------------------------------------------------------------------------
# boilerplate_lines: (doc_id, clean_text, n_lines, n_dropped)
# --------------------------------------------------------------------------
BOILERPLATE_MAX_DF = 2  # a line present in > this many docs is boilerplate


def _split_lines(t: pa.Table):
    """(flat_lines ndarray[object], parent ndarray[int64]) for a batch."""
    import pyarrow.compute as pc
    lines = pc.split_pattern(pc.fill_null(t["text"], ""), "\n")
    flat = np.asarray(pc.list_flatten(lines).to_pandas(), dtype=object)
    parent = pc.list_parent_indices(lines).to_numpy()
    return flat, parent


class _BannedLineFilter:
    """Map-only rewrite against the broadcast banned-line hash set."""

    def __init__(self, banned_ref):
        self._banned = ray.get(banned_ref) \
            if isinstance(banned_ref, ray.ObjectRef) else banned_ref

    def __call__(self, t: pa.Table) -> pa.Table:
        import pandas as pd
        flat, parent = _split_lines(t)
        h = token_hash64_many(list(flat)).view(np.int64)
        keep = ~np.isin(h, self._banned)
        n_lines = np.bincount(parent, minlength=len(t))
        n_drop = np.bincount(parent[~keep], minlength=len(t))
        joined = pd.Series(flat[keep]).groupby(parent[keep]).agg("\n".join)
        clean = np.full(len(t), "", dtype=object)
        clean[joined.index.to_numpy()] = joined.to_numpy()
        return pa.table({
            "doc_id": t["doc_id"],
            "clean_text": pa.array(clean, pa.string()),
            "n_lines": pa.array(n_lines.astype(np.int64), pa.int64()),
            "n_dropped": pa.array(n_drop.astype(np.int64), pa.int64()),
        })


def boilerplate_lines(sf_dir: str, max_df: int = BOILERPLATE_MAX_DF):
    """CCNet/RefinedWeb-style boilerplate removal: drop every line whose
    document frequency exceeds ``max_df``, preserving line order.

    Two streaming passes — the 100-TB shape:
    1. per-batch (line_hash, distinct-doc partial count) -> one small
       ``groupby.sum`` -> ONLY the banned lines (df > max_df, i.e. the
       boilerplate set itself, which is tiny by definition) come to the
       driver and broadcast via ``ray.put``. Exact: a doc's lines live in
       one input batch, so within-batch distinct-by-(line, doc) partials
       sum to true document frequency.
    2. map-only rewrite per batch against the broadcast set — no join
       shuffle, no reassembly groupby.
    Membership is by 64-bit line hash (collisions negligible; the oracle
    compares exact strings and agrees at any tested scale).
    """
    from ray.data.aggregate import Sum

    def df_partial(t: pa.Table) -> pa.Table:
        flat, parent = _split_lines(t)
        h = token_hash64_many(list(flat)).view(np.int64)
        doc = t["doc_id"].to_numpy()[parent]
        import pandas as pd
        uniq = pd.DataFrame({"h": h, "d": doc}).drop_duplicates()
        hh, cnt = np.unique(uniq["h"].to_numpy(), return_counts=True)
        return pa.table({"line_hash": pa.array(hh, pa.int64()),
                         "n": pa.array(cnt.astype(np.int64), pa.int64())})

    df = _read(sf_dir, "documents", ["doc_id", "text"]) \
        .map_batches(df_partial, batch_format="pyarrow") \
        .groupby("line_hash").aggregate(Sum("n", alias_name="df"))
    banned_tbl = df.filter(expr=f"df > {max_df}").to_pandas()
    banned = np.sort(banned_tbl["line_hash"].to_numpy().astype(np.int64)) \
        if "line_hash" in banned_tbl.columns else np.empty(0, np.int64)
    banned_ref = ray.put(banned)

    return _read(sf_dir, "documents", ["doc_id", "text"]) \
        .map_batches(_BannedLineFilter, fn_constructor_args=(banned_ref,),
                     concurrency=(1, 8), batch_format="pyarrow")


BOILERPLATE_LINES_SQL = f"""
WITH lines AS (
  SELECT doc_id,
         unnest(string_split(text, chr(10))) AS line,
         unnest(range(1, len(string_split(text, chr(10))) + 1)) AS pos
  FROM documents
), df AS (
  SELECT line, count(DISTINCT doc_id) AS df FROM lines GROUP BY line
), kept AS (
  SELECT l.doc_id, l.pos, l.line
  FROM lines l JOIN df ON l.line = df.line
  WHERE df.df <= {BOILERPLATE_MAX_DF}
), agg AS (
  SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS clean_text,
         count(*) AS n_kept
  FROM kept GROUP BY doc_id
), tot AS (
  SELECT doc_id, count(*) AS n_lines FROM lines GROUP BY doc_id
)
SELECT t.doc_id,
       coalesce(a.clean_text, '') AS clean_text,
       t.n_lines AS n_lines,
       t.n_lines - coalesce(a.n_kept, 0) AS n_dropped
FROM tot t LEFT JOIN agg a USING (doc_id)
"""


DECONTAMINATE_SQL = f"""
WITH tok AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '\\s+'),
                     x -> x <> '') AS toks
  FROM documents
), grams AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(toks) - {DECON_NGRAM - 2}),
                i -> array_to_string(toks[i:i + {DECON_NGRAM - 1}], ' ')))
           AS gram
  FROM tok
), eval_grams AS (
  SELECT DISTINCT gram FROM grams WHERE doc_id % 100 = 0
), hits AS (
  SELECT DISTINCT g.doc_id
  FROM grams g JOIN eval_grams e USING (gram)
  WHERE g.doc_id % 100 <> 0
)
SELECT t.doc_id,
       t.doc_id IN (SELECT doc_id FROM hits) AS contaminated
FROM tok t
WHERE t.doc_id % 100 <> 0
"""
