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

from ..hashing import token_hash64_many, url_hash64_many

STOP_EN = ("the", "a", "of", "and", "to", "in", "is")
STOP_ES = ("el", "la", "de", "y", "en", "un", "es")
STOP_DE = ("der", "die", "das", "und", "nicht", "ein", "zu")
STOP_FR = ("le", "les", "et", "est", "une", "dans", "que")

_WS = re.compile(r"\s+")


def _read(sf_dir: str, name: str, columns=None):
    return rd.read_parquet(f"{sf_dir}/{name}.parquet", columns=columns)


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
       len(list_filter(string_split_regex(trim(text), '\\s+'),
                       x -> x <> '')) AS n_tokens
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
_LANGS = np.array(["en", "es", "de", "fr"])


def _lang_pred(t: pa.Table) -> np.ndarray:
    """Per-row language from stopword-hit argmax over en/es/de/fr;
    'und' on ties (including the all-zero case) — the unique-max rule,
    mirrored exactly by the SQL CASE chain."""
    hits = np.stack(_stopword_hits(t, STOP_EN, STOP_ES, STOP_DE, STOP_FR))
    mx = hits.max(axis=0)
    unique = (hits == mx).sum(axis=0) == 1
    return np.where(unique & (mx > 0), _LANGS[hits.argmax(axis=0)], "und")


def lang_id_batch(t: pa.Table) -> pa.Table:
    return pa.table({"doc_id": t["doc_id"],
                     "lang_pred": pa.array(_lang_pred(t), pa.string())})


def lang_id(sf_dir: str):
    return _read(sf_dir, "documents", ["doc_id", "text"]) \
        .map_batches(lang_id_batch, batch_format="pyarrow")


LANG_ID_SQL = f"""
WITH t AS (
  SELECT doc_id,
         len(list_filter(string_split_regex(trim(text), '\\s+'),
                         w -> w IN {STOP_EN!r})) AS n_en,
         len(list_filter(string_split_regex(trim(text), '\\s+'),
                         w -> w IN {STOP_ES!r})) AS n_es,
         len(list_filter(string_split_regex(trim(text), '\\s+'),
                         w -> w IN {STOP_DE!r})) AS n_de,
         len(list_filter(string_split_regex(trim(text), '\\s+'),
                         w -> w IN {STOP_FR!r})) AS n_fr
  FROM documents
)
SELECT doc_id,
       CASE WHEN n_en > greatest(n_es, n_de, n_fr) THEN 'en'
            WHEN n_es > greatest(n_en, n_de, n_fr) THEN 'es'
            WHEN n_de > greatest(n_en, n_es, n_fr) THEN 'de'
            WHEN n_fr > greatest(n_en, n_es, n_de) THEN 'fr'
            ELSE 'und' END AS lang_pred
FROM t
"""


# --------------------------------------------------------------------------
# fingerprint: rolling-hash document fingerprint (non-SQL; rows-only check)
# --------------------------------------------------------------------------
def fingerprint_batch(t: pa.Table, window: int = 4) -> pa.Table:
    """Winnowing-style fingerprint: min rolling hash over token windows.

    64-bit FNV-1a over each token window; the doc fingerprint is the MIN
    window hash (deterministic, order-sensitive, content-addressed).
    Arrow in/out — the per-doc window loop is inherent to the op, the
    pandas conversion of the wide text column around it was not.
    """
    texts = t["text"].to_pylist()
    out = np.zeros(len(texts), dtype=np.uint64)
    for i, text in enumerate(texts):
        ws = (text or "").split()
        if not ws:
            continue
        if len(ws) < window:
            grams = [" ".join(ws)]
        else:
            grams = [" ".join(ws[j:j + window])
                     for j in range(len(ws) - window + 1)]
        h = url_hash64_many(grams)
        out[i] = h.min()
    return pa.table({"doc_id": t["doc_id"],
                     "fingerprint": pa.array(out.astype("int64"),
                                             pa.int64())})


def fingerprint(sf_dir: str):
    return _read(sf_dir, "documents", ["doc_id", "text"]) \
        .map_batches(fingerprint_batch, batch_format="pyarrow")


# --------------------------------------------------------------------------
# stem_stats: Porter-stemmed token statistics (M26; non-SQL → rows-only —
# the container's DuckDB cannot load the fts extension offline)
# --------------------------------------------------------------------------
def stem_stats_batch(t: pa.Table) -> pa.Table:
    """(doc_id, lang, n_tokens, n_distinct_stems, top_stem) per document.

    The stemmer is selected PER DOCUMENT from the lang_id heuristic —
    the libstemmer surface the reference exposes (language-parameterized
    Snowball; doc/sphinx/source/stemmer.rst:1-14): en → Porter
    (functions/stemmer.py), es/de/fr → the from-scratch Snowball rules
    (functions/snowball.py), 'und' → Porter (the fallback convention).
    The distinct-value memo inside stem_many makes the per-token cost ~a
    dict hit on Zipfian text. Arrow in/out; the per-doc loop is the op."""
    from collections import Counter

    from ..functions.snowball import stem_many
    texts = t["text"].to_pylist()
    langs = _lang_pred(t)
    n_tok, n_stem, top = [], [], []
    for text, lang in zip(texts, langs):
        ws = (text or "").split()
        stems = stem_many([w.lower() for w in ws], lang)
        n_tok.append(len(ws))
        n_stem.append(len(set(stems)))
        if stems:
            c = Counter(stems)
            top.append(min(c.items(), key=lambda kv: (-kv[1], kv[0]))[0])
        else:
            top.append("")
    return pa.table({
        "doc_id": t["doc_id"],
        "lang": pa.array(langs, pa.string()),
        "n_tokens": pa.array(n_tok, pa.int64()),
        "n_distinct_stems": pa.array(n_stem, pa.int64()),
        "top_stem": pa.array(top, pa.string()),
    })


def stem_stats(sf_dir: str):
    return _read(sf_dir, "documents", ["doc_id", "text"]) \
        .map_batches(stem_stats_batch, batch_format="pyarrow")


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

    def partial_topk(t: pa.Table) -> pa.Table:
        # Arrow-native per-block top-k (the blocks are already Arrow off
        # the groupby — no pandas conversion tax on the distinct-token set)
        idx = pc.sort_indices(t, sort_keys=[("n", "descending"),
                                            ("token", "ascending")])
        return t.take(idx[:k])

    import ray as _ray
    parts = [p for p in
             _ray.get(agg.map_batches(partial_topk, batch_format="pyarrow")
                      .to_arrow_refs()) if p.num_rows]
    tbl = pa.concat_tables(parts) if parts else pa.table(
        {"token": pa.array([], pa.string()),
         "n": pa.array([], pa.int64())})
    idx = pc.sort_indices(tbl, sort_keys=[("n", "descending"),
                                          ("token", "ascending")])
    tbl = tbl.take(idx[:k]).combine_chunks()
    return tbl.append_column(
        "rank", pa.array(np.arange(1, tbl.num_rows + 1), pa.int64()))


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


# --------------------------------------------------------------------------
# sample_per_source: deterministic stratified sampling — k docs per source
# group, chosen as the k smallest multiplicative-hash keys of doc_id (a
# fixed uniform-ish permutation, reproducible across engines). The
# distributed shape is partial top-k-smallest per batch → tiny groupby —
# the per-group sample a training pipeline takes for eval/audit splits
# without shuffling the corpus.
# --------------------------------------------------------------------------
SAMPLE_K = 10
_KNUTH = 2654435761  # Knuth multiplicative hash constant (2^32 scale)


def sample_per_source(sf_dir: str, k: int = SAMPLE_K):
    """(source, doc_id) of the k-per-source deterministic sample: the k
    docs with smallest (doc_id * 2654435761) mod 2^32, ties by doc_id.
    Per-batch partial top-k caps the shuffle at k rows per source per
    batch; the final per-source cut is a small groupby."""
    import pyarrow.compute as pc

    def partial(t: pa.Table) -> pa.Table:
        # Arrow-native per-batch top-k per source (the scan batches are
        # zero-copy Arrow; no pandas round-trip of the full table)
        d = t["doc_id"].to_numpy().astype("uint64")
        skey = ((d * np.uint64(_KNUTH)) % np.uint64(1 << 32)).astype("int64")
        tb = pa.table({"source": t["source"],
                       "doc_id": pc.cast(t["doc_id"], pa.int64()),
                       "skey": pa.array(skey, pa.int64())})
        tb = tb.take(pc.sort_indices(tb, sort_keys=[
            ("source", "ascending"), ("skey", "ascending"),
            ("doc_id", "ascending")]))
        src = tb["source"].combine_chunks().to_numpy(zero_copy_only=False)
        if len(src) == 0:
            return tb
        # rank within each sorted source run, vectorized
        starts = np.flatnonzero(np.r_[True, src[1:] != src[:-1]])
        runs = np.diff(np.r_[starts, len(src)])
        rank = np.arange(len(src)) - np.repeat(starts, runs)
        return tb.filter(pa.array(rank < k))

    def final_cut(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["source", "skey", "doc_id"]) \
            .groupby("source", as_index=False).head(k)
        return g[["source", "doc_id"]]

    out = _read(sf_dir, "documents", ["doc_id", "source"]) \
        .map_batches(partial, batch_format="pyarrow") \
        .groupby("source").map_groups(final_cut, batch_format="pandas")
    pdf = out.to_pandas().sort_values(["source", "doc_id"]) \
        .reset_index(drop=True)
    return pa.table({
        "source": pa.array(pdf["source"], pa.string()),
        "doc_id": pa.array(pdf["doc_id"].astype("int64")),
    })


SAMPLE_PER_SOURCE_SQL = f"""
WITH keyed AS (
  SELECT source, doc_id,
         CAST((CAST(doc_id AS HUGEINT) * {_KNUTH}) % 4294967296 AS BIGINT)
           AS skey,
         row_number() OVER (
           PARTITION BY source ORDER BY
           CAST((CAST(doc_id AS HUGEINT) * {_KNUTH}) % 4294967296 AS BIGINT),
           doc_id) AS rn
  FROM documents
)
SELECT source, doc_id FROM keyed WHERE rn <= {SAMPLE_K}
ORDER BY source, doc_id
"""


# --------------------------------------------------------------------------
# tfidf_top_terms: inverted-index term weighting — per-doc top-k terms by
# tf/df (rarity-weighted frequency; the exact-rational stand-in for tf·idf
# chosen so the score is ONE IEEE division of two ints and therefore
# hash-identical to the SQL oracle — a log() would differ in final ulps).
# Distributed shape: postings (term, doc_id, tf) built per batch, then a
# term-bucketed groupby where each term's df is counted AND attached to
# its postings in the same pass (all rows of a term land in one group —
# no separate df table, no second join), then a doc-bucketed groupby for
# the per-doc top-k. Two shuffles total, both on coarse buckets.
# --------------------------------------------------------------------------
TFIDF_K = 5


def tfidf_top_terms(sf_dir: str, k: int = TFIDF_K):
    """(doc_id, term, tf, df, rank) for each doc's k highest-tf/df ASCII
    word terms; ties broken by term asc. Terms are [A-Za-z0-9]+ runs,
    ASCII-lowercased (bit-identical to the oracle's regexp_extract_all)."""
    import pyarrow.compute as pc

    from .dedup import N_BUCKETS

    def postings(t: pa.Table) -> pa.Table:
        text = pc.fill_null(t["text"], "")
        toks = pc.split_pattern_regex(text, "[^A-Za-z0-9]+")
        flat = pc.list_flatten(toks)
        parent = pc.list_parent_indices(toks)
        keep = pc.not_equal(flat, "")
        flat = pc.utf8_lower(flat.filter(keep))
        doc = pc.take(t["doc_id"], parent.filter(keep))
        tf = pa.table({"doc_id": doc, "term": flat}) \
            .group_by(["doc_id", "term"]).aggregate([([], "count_all")])
        # deterministic 64-bit term hash (Python's hash() is per-process
        # randomized — it would split one term across shuffle buckets)
        term_hash = token_hash64_many(tf["term"])
        return pa.table({
            "doc_id": pc.cast(tf["doc_id"], pa.int64()),
            "term": tf["term"],
            "tf": pc.cast(tf["count_all"], pa.int64()),
            "tbucket": pa.array(
                (term_hash % np.uint64(N_BUCKETS)).astype("int64")),
        })

    def attach_df(g: pd.DataFrame) -> pd.DataFrame:
        # every posting of a term is in this group: df = distinct docs
        df_per_term = g.groupby("term")["doc_id"].nunique()
        out = pd.DataFrame({
            "doc_id": g["doc_id"].to_numpy(),
            "term": g["term"].to_numpy(),
            "tf": g["tf"].to_numpy(),
            "df": df_per_term.reindex(g["term"]).to_numpy().astype("int64"),
        })
        out["dbucket"] = (out["doc_id"].to_numpy()
                          % N_BUCKETS).astype("int64")
        return out

    def doc_topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.assign(score=g["tf"].to_numpy().astype("float64")
                     / g["df"].to_numpy())
        g = g.sort_values(["doc_id", "score", "term"],
                          ascending=[True, False, True])
        g["rank"] = g.groupby("doc_id").cumcount() + 1
        g = g[g["rank"] <= k]
        return g[["doc_id", "term", "tf", "df", "rank"]].astype(
            {"doc_id": "int64", "tf": "int64", "df": "int64",
             "rank": "int64"})

    # Distributed final order: the result is k rows per surviving doc —
    # corpus-sized, so it must not collect on the driver for the sort.
    from .dedup import sorted_or_empty
    scored = _read(sf_dir, "documents", ["doc_id", "text"]) \
        .map_batches(postings, batch_format="pyarrow") \
        .groupby("tbucket").map_groups(attach_df, batch_format="pandas") \
        .groupby("dbucket").map_groups(doc_topk, batch_format="pandas")
    return sorted_or_empty(
        scored, ["doc_id", "rank"],
        pa.table({"doc_id": pa.array([], pa.int64()),
                  "term": pa.array([], pa.string()),
                  "tf": pa.array([], pa.int64()),
                  "df": pa.array([], pa.int64()),
                  "rank": pa.array([], pa.int64())}))


TFIDF_SQL = f"""
WITH toks AS (
  SELECT doc_id,
         lower(unnest(regexp_extract_all(text, '[A-Za-z0-9]+'))) AS term
  FROM documents
), tf AS (
  SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2
), df AS (
  SELECT term, count(DISTINCT doc_id) AS df FROM tf GROUP BY 1
), scored AS (
  SELECT tf.doc_id, tf.term, tf.tf, df.df,
         row_number() OVER (
           PARTITION BY tf.doc_id
           ORDER BY CAST(tf.tf AS DOUBLE) / df.df DESC, tf.term ASC
         ) AS rank
  FROM tf JOIN df ON df.term = tf.term
)
SELECT doc_id, term, tf, df, rank FROM scored
WHERE rank <= {TFIDF_K}
ORDER BY doc_id, rank
"""


# --------------------------------------------------------------------------
# corpus_filter: the composed LLM-corpus cleaning pipeline — quality/lang
# gates ∩ exact-dedup representative ∩ near-dup cluster representative.
# This is the end-to-end "which documents survive cleaning" decision that
# the individual ops feed at 100 TB; each leg is an independent Dataset
# branch and the three keep/drop sets meet in ONE bucketed groupby on
# doc_id (no driver-side set logic).
# --------------------------------------------------------------------------
CORPUS_MIN_TOKENS = 30
CORPUS_LANG = "en"


def corpus_filter(sf_dir: str, min_tokens: int = CORPUS_MIN_TOKENS,
                  lang: str = CORPUS_LANG, threshold: float = 0.5):
    """doc_id-ordered form of _corpus_filter_ds (the driver/oracle
    surface; the composable distributed form is the _ds). The survivor
    set is corpus-sized, so the order is a distributed sort — nothing
    collects on the driver."""
    out = _corpus_filter_ds(sf_dir, min_tokens, lang, threshold)

    def keep_only(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "doc_id" not in t.column_names:
            return pa.table({"doc_id": pa.array([], pa.int64())})
        return pa.table({"doc_id": t["doc_id"].cast(pa.int64())})

    from .dedup import sorted_or_empty
    return sorted_or_empty(
        out.map_batches(keep_only, batch_format="pyarrow"), "doc_id",
        pa.table({"doc_id": pa.array([], pa.int64())}))


def _corpus_filter_ds(sf_dir: str, min_tokens: int = CORPUS_MIN_TOKENS,
                      lang: str = CORPUS_LANG, threshold: float = 0.5):
    """(doc_id) of documents kept by the full cleaning pipeline:

    1. gates: predicted language == ``lang`` (stopword-hit heuristic,
       same rule as lang_id) and n_tokens ≥ ``min_tokens``;
    2. exact dedup: doc is the min-doc_id representative of its exact
       text group (64-bit content hash pre-aggregation, as dedup_exact);
    3. near-dup dedup: doc is NOT a non-representative member of a
       trigram-Jaccard ≥ threshold connected component (dedup_clusters).

    Verdict rows (doc_id, kind, flag) from the three branches meet in a
    bucketed groupby; a doc is kept iff gate=1 ∧ exact-kept present ∧ no
    drop row. Only the final doc_id list is collected."""
    import pyarrow.compute as pc

    from ..hashing import token_hash64_many, url_hash64_many
    from .dedup import N_BUCKETS, _jaccard_pairs_ds, connected_components

    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    # branch 1: per-doc gates (one Arrow-native pass)
    def gate_rows(t: pa.Table) -> pa.Table:
        text = pc.fill_null(t["text"], "")
        n_tokens = pc.cast(pc.count_substring_regex(text, r"\S+"),
                           pa.int64()).to_numpy()
        n_en, n_es = _stopword_hits(t, STOP_EN, STOP_ES)
        pred = np.where(n_en > n_es, "en",
                        np.where(n_es > n_en, "es", "und"))
        ok = ((pred == lang) & (n_tokens >= min_tokens)).astype("int64")
        doc_id = t["doc_id"].to_numpy()
        return pa.table({
            "doc_id": pa.array(doc_id, pa.int64()),
            "kind": pa.array(np.zeros(len(ok), dtype="int64")),
            "flag": pa.array(ok, pa.int64()),
            "bucket": pa.array((doc_id % N_BUCKETS).astype("int64")),
        })

    gates = docs.map_batches(gate_rows, batch_format="pyarrow")

    # branch 2: exact-dedup representatives (hash pre-agg → groupby min)
    def hash_partial(t: pa.Table) -> pa.Table:
        h = url_hash64_many(
            pc.fill_null(t["text"], "").to_pylist()).astype("int64")
        g = pa.table({"content_hash": pa.array(h), "doc_id": t["doc_id"]}) \
            .group_by("content_hash").aggregate([("doc_id", "min")])
        return pa.table({"content_hash": g["content_hash"],
                         "doc_id": g["doc_id_min"]})

    from ray.data.aggregate import Min
    kept_exact = docs.map_batches(hash_partial, batch_format="pyarrow") \
        .groupby("content_hash") \
        .aggregate(Min("doc_id", alias_name="doc_id")) \
        .map_batches(lambda t: pa.table({
            "doc_id": t["doc_id"],
            "kind": pa.array(np.ones(len(t), dtype="int64")),
            "flag": pa.array(np.ones(len(t), dtype="int64")),
            "bucket": pa.array((t["doc_id"].to_numpy() % N_BUCKETS)
                               .astype("int64")),
        }), batch_format="pyarrow")

    # branch 3: near-dup cluster drops (node that is not its cluster rep)
    def drop_rows(t: pa.Table) -> pa.Table:
        node = t["node"].to_numpy()
        keep = node != t["label"].to_numpy()
        doc_id = node[keep].astype("int64")
        return pa.table({
            "doc_id": pa.array(doc_id),
            "kind": pa.array(np.full(len(doc_id), 2, dtype="int64")),
            "flag": pa.array(np.ones(len(doc_id), dtype="int64")),
            "bucket": pa.array((doc_id % N_BUCKETS).astype("int64")),
        })

    drops = connected_components(_jaccard_pairs_ds(sf_dir, threshold)) \
        .map_batches(drop_rows, batch_format="pyarrow")

    def decide(g: pd.DataFrame) -> pd.DataFrame:
        p = g.pivot_table(index="doc_id", columns="kind", values="flag",
                          aggfunc="max", fill_value=0)
        gate = p[0] if 0 in p.columns else pd.Series(0, index=p.index)
        exact = p[1] if 1 in p.columns else pd.Series(0, index=p.index)
        drop = p[2] if 2 in p.columns else pd.Series(0, index=p.index)
        keep = (gate == 1) & (exact == 1) & (drop == 0)
        return pd.DataFrame({"doc_id": p.index[keep].astype("int64")})

    return gates.union(kept_exact).union(drops) \
        .groupby("bucket").map_groups(decide, batch_format="pandas")


CORPUS_FILTER_SQL = f"""
WITH RECURSIVE toks AS (
  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS ws FROM documents
), grams AS (
  SELECT doc_id,
         unnest(list_distinct(
           CASE WHEN len(ws) < 3 THEN [array_to_string(ws, ' ')]
                ELSE list_transform(range(1, len(ws) - 1),
                       i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])
           END)) AS g
  FROM toks
), sz AS (
  SELECT doc_id, count(*) AS n FROM grams GROUP BY doc_id
), inter AS (
  SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS i
  FROM grams a JOIN grams b ON a.g = b.g AND a.doc_id < b.doc_id
  GROUP BY 1, 2
), pairs AS (
  SELECT da, db FROM inter
  JOIN sz sa ON sa.doc_id = da
  JOIN sz sb ON sb.doc_id = db
  WHERE CAST(i AS DOUBLE) / (sa.n + sb.n - i) >= 0.5
), edges AS (
  SELECT da AS u, db AS v FROM pairs
  UNION ALL SELECT db, da FROM pairs
), reach(node, lab) AS (
  SELECT u, u FROM edges
  UNION
  SELECT e.v, r.lab FROM reach r JOIN edges e ON e.u = r.node
), drops AS (
  SELECT node AS doc_id FROM reach GROUP BY node HAVING node != min(lab)
), lang_gate AS (
  SELECT doc_id,
         len(list_filter(ws, w -> w IN {STOP_EN!r})) AS n_en,
         len(list_filter(ws, w -> w IN {STOP_ES!r})) AS n_es,
         len(ws) AS n_tokens
  FROM toks
), gates AS (
  SELECT doc_id FROM lang_gate
  WHERE (CASE WHEN n_en > n_es THEN 'en'
              WHEN n_es > n_en THEN 'es' ELSE 'und' END) = '{CORPUS_LANG}'
    AND n_tokens >= {CORPUS_MIN_TOKENS}
), kept_exact AS (
  SELECT min(doc_id) AS doc_id FROM documents GROUP BY text
)
SELECT g.doc_id FROM gates g
JOIN kept_exact k ON k.doc_id = g.doc_id
WHERE g.doc_id NOT IN (SELECT doc_id FROM drops)
ORDER BY g.doc_id
"""


# --------------------------------------------------------------------------
# Training-set assembly ops: deterministic split + sequence packing.
# --------------------------------------------------------------------------
SPLIT_TEST_PCT = 10
PACK_BUDGET = 1024  # tokens per packed training sequence


def train_test_split(sf_dir: str, test_pct: int = SPLIT_TEST_PCT):
    """(doc_id, split) deterministic holdout assignment: split='test' iff
    (doc_id * KNUTH) mod 2^32, scaled to 0..99, falls below test_pct.
    Pure per-batch map (no shuffle, no RNG state) — the split is stable
    under re-runs, resharding, and resumed jobs, which is the property a
    100-TB corpus split actually needs. Oracle-checked (same integer hash
    in SQL)."""
    def tag(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        d = t["doc_id"].to_numpy(zero_copy_only=False).astype("uint64")
        pct = ((d * np.uint64(_KNUTH)) % np.uint64(1 << 32)) \
            * np.uint64(100) >> np.uint64(32)
        split = np.where(pct < test_pct, "test", "train")
        return pa.table({"doc_id": t["doc_id"],
                         "split": pa.array(split, pa.string())})

    return _read(sf_dir, "documents", ["doc_id"]) \
        .map_batches(tag, batch_format="pyarrow")


TRAIN_TEST_SPLIT_SQL = f"""
SELECT doc_id,
       CASE WHEN (CAST(doc_id AS HUGEINT) * {_KNUTH}) % 4294967296
                 * 100 // 4294967296 < {SPLIT_TEST_PCT}
            THEN 'test' ELSE 'train' END AS split
FROM documents
"""


def _source_bucket_ids(sources: np.ndarray) -> np.ndarray:
    """crc32&63 bucket per source, looping only over UNIQUE sources."""
    import zlib
    uniq, inv = np.unique(sources, return_inverse=True)
    bmap = np.array([zlib.crc32(str(s).encode()) & 63 for s in uniq],
                    dtype=np.int64)
    return bmap[inv]


def _pack_group(g: pd.DataFrame, budget: int) -> pd.DataFrame:
    """The sequence-packing kernel shared by sequence_pack and
    curation_pipeline: per-source prefix sums (vectorized reset at source
    boundaries within the bucket), seq_id = floor(prefix_before / budget)."""
    g = g.sort_values(["source", "doc_id"])
    tok = g["n_tokens"].to_numpy()
    cum = np.cumsum(tok)
    start = cum - tok  # prefix sum BEFORE each doc
    src = g["source"].to_numpy()
    boundary = np.r_[True, src[1:] != src[:-1]]
    base = np.where(boundary, start, 0)
    np.maximum.accumulate(base, out=base)
    start = start - base
    return pd.DataFrame({
        "doc_id": g["doc_id"].astype("int64"),
        "source": src,
        "n_tokens": tok.astype("int64"),
        "seq_id": (start // budget).astype("int64")})


def sequence_pack(sf_dir: str, budget: int = PACK_BUDGET):
    """(doc_id, source, n_tokens, seq_id) — concat-and-chunk sequence
    packing for LM training: docs are laid out per source in doc_id order
    and cut into fixed token-budget sequences; a doc's seq_id is the chunk
    its FIRST token lands in (floor(prefix_sum_before / budget)).

    Distributed shape: token counts are the Arrow-native per-batch map
    (no shuffle), then ONE groupby over hash(source) buckets — the prefix
    sum within a (source-sorted, doc_id-sorted) group is a vectorized
    cumsum, never a per-row loop. Sources are the natural packing unit
    (training shards stay source-contiguous); a single hot source is
    still one group, which matches the sequential-prefix-sum semantics —
    the parallelism unit at scale is the source count, not doc count.
    Oracle: SQL window prefix-sum, integer-exact."""
    import pyarrow.compute as pc

    def counts(t: pa.Table) -> pa.Table:
        text = pc.fill_null(t["text"], "")
        n = pc.cast(pc.count_substring_regex(text, r"\S+"), pa.int64())
        b = _source_bucket_ids(t["source"].to_numpy(zero_copy_only=False))
        return pa.table({"doc_id": t["doc_id"], "source": t["source"],
                         "n_tokens": n,
                         "bucket": pa.array(b, pa.int64())})

    return _read(sf_dir, "documents", ["doc_id", "source", "text"]) \
        .map_batches(counts, batch_format="pyarrow") \
        .groupby("bucket").map_groups(lambda g: _pack_group(g, budget),
                                      batch_format="pandas")


SEQUENCE_PACK_SQL = f"""
WITH toks AS (
  SELECT doc_id, source,
         CAST(len(list_filter(string_split_regex(trim(text), '\\s+'),
                              x -> x <> '')) AS BIGINT)
           AS n_tokens
  FROM documents
), cums AS (
  SELECT doc_id, source, n_tokens,
         sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                             ROWS UNBOUNDED PRECEDING) - n_tokens
           AS start_tok
  FROM toks
)
SELECT doc_id, source, n_tokens,
       CAST(start_tok // {PACK_BUDGET} AS BIGINT) AS seq_id
FROM cums
"""


# --------------------------------------------------------------------------
# token_freq_score: corpus-frequency quality signal (doc_id, freq_sum,
# n_tokens, mean_freq) — mean over a doc's token occurrences of each
# token's GLOBAL corpus occurrence count. Low mean = rare vocabulary
# (specialist/noisy text), high mean = stopword-heavy boilerplate; the
# integer-exact cousin of a unigram-LM perplexity gate (CCNet-style).
# --------------------------------------------------------------------------
def token_freq_score(sf_dir: str):
    """Distributed shape: explode (token_hash, doc_id) occurrence rows
    bucketed by token hash — every occurrence of one token lands in one
    bucket, so a single map_groups computes GLOBAL per-token counts
    (transform 'size') and per-doc partial numerators in the same pass;
    a second narrow groupby sums partials per doc. The driver sees one
    row per document.

    freq_sum and n_tokens are exact int64 both sides; mean_freq is one
    IEEE division of the two, so the value-hash comparison vs the SQL
    oracle is exact. Token equality is by 64-bit hash in Ray vs string
    in SQL — identical modulo ~n²/2⁶⁵ collision odds.
    """
    from ray.data.aggregate import Max, Sum

    from .dedup import _adaptive_buckets, _doc_count
    n_docs = _doc_count(sf_dir)
    nb = np.uint64(_adaptive_buckets(n_docs * 64))

    def explode(t: pa.Table) -> pa.Table:
        # Arrow-vectorized flat_map (split/flatten/parent-indices, no
        # Python list-of-lists); hashing hits url_hash64_many's
        # dictionary-encode fast path (one SHA1 per DISTINCT token).
        # tf is pre-aggregated per (token, doc) HERE, so the th-bucket
        # shuffle carries one row per distinct (token, doc) pair instead
        # of one per occurrence — 2-5× fewer rows on natural text.
        import pyarrow.compute as pc
        text = pc.fill_null(t["text"], "")
        toks = pc.split_pattern_regex(text, r"\s+")
        flat = pc.list_flatten(toks)
        parent = pc.list_parent_indices(toks)
        keep = pc.not_equal(flat, "")
        flat = flat.filter(keep)
        parent = parent.filter(keep)
        th = token_hash64_many(flat)
        g = pa.table({"th": pa.array(th.astype("int64")),
                      "doc_id": pc.take(t["doc_id"], parent)}) \
            .group_by(["th", "doc_id"]).aggregate([([], "count_all")])
        thv = g["th"].to_numpy().astype("uint64")
        return pa.table({
            "th": g["th"],
            "doc_id": pc.cast(g["doc_id"], pa.int64()),
            "tf": pc.cast(g["count_all"], pa.int64()),
            "bucket": pa.array((thv % nb).astype("int64")),
        })

    def partial_numerators(g: pd.DataFrame) -> pd.DataFrame:
        # all rows of a token are in this group: its GLOBAL count is
        # sum(tf); a doc's numerator partial is Σ tf·C_token
        tf = g["tf"].to_numpy().astype("int64")
        cnt = g.groupby("th")["tf"].transform("sum").to_numpy()
        out = pd.DataFrame({"doc_id": g["doc_id"].to_numpy(),
                            "freq_sum": tf * cnt, "n_tok": tf})
        return out.groupby("doc_id", as_index=False).sum()

    parts = _read(sf_dir, "documents", ["doc_id", "text"]) \
        .map_batches(explode, batch_format="pyarrow") \
        .groupby("bucket").map_groups(partial_numerators,
                                      batch_format="pandas")
    # final per-doc sum: the output is one row per DOC (unbounded key
    # space), so the scale path stays a real groupby shuffle; below the
    # toy threshold a one-task combine replaces it — the sort shuffle's
    # fixed cost measured ~10 s at sf0.1 for a reduce whose combine form
    # runs in under a second.
    if n_docs > 2_000_000:
        per_doc = parts.groupby("doc_id").aggregate(
            Sum("freq_sum", alias_name="freq_sum"),
            Sum("n_tok", alias_name="n_tokens"))
    else:
        per_doc = parts.repartition(1).map_batches(
            lambda df: df.groupby("doc_id", as_index=False).sum()
            .rename(columns={"n_tok": "n_tokens"}),
            batch_format="pandas")

    def finish(t: pa.Table) -> pa.Table:
        fs = t["freq_sum"].to_numpy().astype("int64")
        nt = t["n_tokens"].to_numpy().astype("int64")
        mean = np.divide(fs, nt, out=np.zeros(len(fs), dtype="float64"),
                         where=nt > 0)
        return pa.table({
            "doc_id": t["doc_id"],
            "freq_sum": pa.array(fs, pa.int64()),
            "n_tokens": pa.array(nt, pa.int64()),
            "mean_freq": pa.array(mean, pa.float64()),
        })

    # docs with zero tokens never appear in the explode; re-attach them
    def empty_side(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        text = pc.fill_null(t["text"], "")
        n = pc.count_substring_regex(text, r"\S+")
        z = t.filter(pc.equal(n, 0))
        k = len(z)
        return pa.table({
            "doc_id": z["doc_id"],
            "freq_sum": pa.array(np.zeros(k, dtype="int64")),
            "n_tokens": pa.array(np.zeros(k, dtype="int64")),
            "mean_freq": pa.array(np.zeros(k, dtype="float64")),
        })

    empties = _read(sf_dir, "documents", ["doc_id", "text"]) \
        .map_batches(empty_side, batch_format="pyarrow")
    return per_doc.map_batches(finish, batch_format="pyarrow").union(empties)


TOKEN_FREQ_SCORE_SQL = """
WITH toks AS (
  SELECT doc_id, unnest(list_filter(regexp_split_to_array(text, '\\s+'),
                                    x -> x <> '')) AS tok
  FROM documents
),
cnt AS (
  SELECT tok, count(*) AS c FROM toks GROUP BY tok
),
per AS (
  SELECT t.doc_id, sum(c.c) AS freq_sum, count(*) AS n_tokens
  FROM toks t JOIN cnt c USING (tok) GROUP BY t.doc_id
)
SELECT d.doc_id,
       CAST(coalesce(p.freq_sum, 0) AS BIGINT) AS freq_sum,
       CAST(coalesce(p.n_tokens, 0) AS BIGINT) AS n_tokens,
       CASE WHEN p.n_tokens > 0
            THEN CAST(p.freq_sum AS DOUBLE) / p.n_tokens
            ELSE 0.0 END AS mean_freq
FROM documents d LEFT JOIN per p USING (doc_id)
"""


# --------------------------------------------------------------------------
# chunk_documents: fixed-token-budget chunking — the sequence-prep step a
# training pipeline runs before packing/tokenization. One flat_map-shaped
# map_batches (rows out ∝ total tokens / CHUNK_TOKENS); no shuffle at all,
# so it streams at any scale. A token is one \S+ run after trim, identical
# to the oracle's string_split_regex(trim(text), '\s+'); empty/blank docs
# produce zero chunks.
# --------------------------------------------------------------------------
CHUNK_TOKENS = 64


def chunk_documents_batch(t: pa.Table,
                          chunk_tokens: int = CHUNK_TOKENS) -> pa.Table:
    import pyarrow.compute as pc
    text = pc.utf8_trim_whitespace(pc.fill_null(t["text"], ""))
    nonblank = pc.not_equal(text, "")
    ids = t["doc_id"].to_numpy(zero_copy_only=False)[
        nonblank.to_numpy(zero_copy_only=False)]
    toks = pc.split_pattern_regex(text.filter(nonblank), r"\s+")
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    lens = pc.list_value_length(toks).to_numpy().astype("int64")
    flat = toks.values.to_pylist()  # one boxing pass for the join below
    starts = np.concatenate([[0], np.cumsum(lens)[:-1]])
    n_chunks = -(-lens // chunk_tokens)
    doc_out = np.repeat(ids, n_chunks).astype("int64")
    chunk_id = np.concatenate(
        [np.arange(c) for c in n_chunks]) if len(n_chunks) else \
        np.array([], dtype="int64")
    # per-CHUNK offsets (the only Python loop is one str.join per chunk,
    # C-speed inside)
    cs = np.repeat(starts, n_chunks) + chunk_id * chunk_tokens
    ce = np.minimum(cs + chunk_tokens, np.repeat(starts + lens, n_chunks))
    texts = [" ".join(flat[a:b]) for a, b in zip(cs, ce)]
    return pa.table({
        "doc_id": pa.array(doc_out),
        "chunk_id": pa.array(chunk_id.astype("int64")),
        "chunk_text": pa.array(texts, pa.string()),
        "n_tokens": pa.array((ce - cs).astype("int64")),
    })


def chunk_documents(sf_dir: str, chunk_tokens: int = CHUNK_TOKENS):
    """(doc_id, chunk_id, chunk_text, n_tokens): each document split into
    consecutive chunks of ≤ chunk_tokens whitespace tokens, chunk text
    re-joined with single spaces."""
    return _read(sf_dir, "documents", ["doc_id", "text"]) \
        .map_batches(lambda t: chunk_documents_batch(t, chunk_tokens),
                     batch_format="pyarrow")


CHUNK_DOCUMENTS_SQL = f"""
WITH toks AS (
  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS tk
  FROM documents
  WHERE length(trim(coalesce(text, ''))) > 0
), bound AS (
  SELECT CAST(ceil(max(len(tk)) / {CHUNK_TOKENS}.0) AS BIGINT) AS mx
  FROM toks
)
SELECT doc_id, i AS chunk_id,
       array_to_string(tk[i*{CHUNK_TOKENS}+1 : (i+1)*{CHUNK_TOKENS}], ' ')
         AS chunk_text,
       len(tk[i*{CHUNK_TOKENS}+1 : (i+1)*{CHUNK_TOKENS}]) AS n_tokens
FROM toks, (SELECT unnest(range(0, (SELECT mx FROM bound))) AS i) ix
WHERE i * {CHUNK_TOKENS} < len(tk)
"""


# --------------------------------------------------------------------------
# length_percentile_filter: keep documents whose char length lies within
# the corpus [p05, p95] band — the outlier-trim gate of a cleaning
# pipeline. Exact distributed quantiles WITHOUT a sort: lengths are
# bounded integers, so pass 1 reduces the corpus to a (n_chars, cnt)
# histogram (per-batch np.unique partials → one small groupby); the
# driver sees only distinct lengths (≤ corpus max, thousands of rows at
# any sf), computes the quantile_disc rank ceil(q·n)−1 by cumsum, and
# pass 2 is a broadcast-threshold filter. No all-to-all on row data.
# --------------------------------------------------------------------------
PCTL_LO = 0.05
PCTL_HI = 0.95


def _length_hist(sf_dir: str):
    def partial(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        mask = pc.is_valid(t["text"])
        n = pc.utf8_length(t["text"].filter(mask)).to_numpy() \
            .astype("int64")
        v, c = np.unique(n, return_counts=True)
        return pa.table({"n_chars_c": pa.array(v),
                         "cnt": pa.array(c.astype("int64"))})

    from ray.data.aggregate import Sum
    return _read(sf_dir, "documents", ["text"]) \
        .map_batches(partial, batch_format="pyarrow") \
        .groupby("n_chars_c").aggregate(Sum("cnt", alias_name="cnt"))


def _quantile_disc(vals: np.ndarray, cnts: np.ndarray, q: float) -> int:
    """DuckDB quantile_disc: element at 0-based rank ceil(q·n)−1 of the
    sorted multiset (verified against duckdb 1.x on edge cases)."""
    order = np.argsort(vals)
    vals, cnts = vals[order], cnts[order]
    n = int(cnts.sum())
    rank = max(0, int(np.ceil(q * n)) - 1)
    return int(vals[np.searchsorted(np.cumsum(cnts), rank, side="right")])


def length_percentile_filter(sf_dir: str, lo: float = PCTL_LO,
                             hi: float = PCTL_HI):
    """(doc_id, n_chars_c) of documents with p05 ≤ length(text) ≤ p95
    (discrete quantiles over non-null texts)."""
    import pyarrow.compute as pc

    hist = _length_hist(sf_dir).to_pandas()
    vals = hist["n_chars_c"].to_numpy().astype("int64")
    cnts = hist["cnt"].to_numpy().astype("int64")
    lo_v = _quantile_disc(vals, cnts, lo)
    hi_v = _quantile_disc(vals, cnts, hi)

    def keep(t: pa.Table) -> pa.Table:
        n = pc.utf8_length(pc.fill_null(t["text"], ""))
        mask = pc.and_(pc.is_valid(t["text"]),
                       pc.and_(pc.greater_equal(n, lo_v),
                               pc.less_equal(n, hi_v)))
        return pa.table({
            "doc_id": t["doc_id"].filter(mask),
            "n_chars_c": pc.cast(n.filter(mask), pa.int64()),
        })

    return _read(sf_dir, "documents", ["doc_id", "text"]) \
        .map_batches(keep, batch_format="pyarrow")


LENGTH_PERCENTILE_SQL = f"""
WITH lens AS (
  SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars_c
  FROM documents WHERE text IS NOT NULL
), q AS (
  SELECT quantile_disc(n_chars_c, {PCTL_LO}) AS lo,
         quantile_disc(n_chars_c, {PCTL_HI}) AS hi
  FROM lens
)
SELECT doc_id, n_chars_c FROM lens, q
WHERE n_chars_c BETWEEN lo AND hi
"""


# --------------------------------------------------------------------------
# bigram_topk: corpus-wide top-k adjacent word pairs — the n-gram statistic
# a tokenizer-training / contamination-analysis pass needs. Same
# partial-count shape as word_count_topk, but pairing must respect
# document boundaries: tokens are flattened WITH a repeated doc index and
# adjacent-token pairs are formed only where the doc index matches —
# all numpy on the flattened arrays, never a per-document Python loop.
# --------------------------------------------------------------------------
BIGRAM_TOPK = 20


def bigram_topk(sf_dir: str, k: int = BIGRAM_TOPK):
    """(bigram, n, rank) for the k most frequent token bigrams,
    (n desc, bigram asc)-ordered."""
    import pyarrow.compute as pc

    def partial(t: pa.Table) -> pa.Table:
        text = pc.utf8_lower(pc.fill_null(t["text"], ""))
        lists = pc.split_pattern_regex(text, "[^a-z0-9]+").combine_chunks()
        lens = pc.list_value_length(lists).to_numpy()
        v = lists.flatten().to_numpy(zero_copy_only=False)
        d = np.repeat(np.arange(len(lens), dtype="int64"), lens)
        keep = v != ""          # split() emits empty boundary tokens
        v, d = v[keep], d[keep]
        if len(v) < 2:
            return pa.table({"bigram": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        same = d[1:] == d[:-1]  # pair only within one document
        big = pd.Series(v[:-1][same]) + " " + pd.Series(v[1:][same])
        vc = big.value_counts()
        return pa.table({"bigram": pa.array(vc.index, pa.string()),
                         "n": pa.array(vc.to_numpy(), pa.int64())})

    from ray.data.aggregate import Sum
    agg = _read(sf_dir, "documents", ["text"]) \
        .map_batches(partial, batch_format="pyarrow") \
        .groupby("bigram").aggregate(Sum("n", alias_name="n"))

    def partial_topk(t: pa.Table) -> pa.Table:
        idx = pc.sort_indices(t, sort_keys=[("n", "descending"),
                                            ("bigram", "ascending")])
        return t.take(idx[:k])

    import ray as _ray
    parts = [p for p in
             _ray.get(agg.map_batches(partial_topk, batch_format="pyarrow")
                      .to_arrow_refs()) if p.num_rows]
    tbl = pa.concat_tables(parts) if parts else pa.table(
        {"bigram": pa.array([], pa.string()),
         "n": pa.array([], pa.int64())})
    idx = pc.sort_indices(tbl, sort_keys=[("n", "descending"),
                                          ("bigram", "ascending")])
    tbl = tbl.take(idx[:k]).combine_chunks()
    return tbl.append_column(
        "rank", pa.array(np.arange(1, tbl.num_rows + 1), pa.int64()))


BIGRAM_TOPK_SQL = f"""
WITH toks AS (
  SELECT list_filter(regexp_extract_all(lower(text), '[a-z0-9]+'),
                     x -> x <> '') AS l
  FROM documents
), bg AS (
  SELECT l[i] || ' ' || l[i + 1] AS bigram
  FROM toks, LATERAL (SELECT unnest(generate_series(1, len(l) - 1)) AS i) g
), c AS (
  SELECT bigram, count(*) AS n FROM bg GROUP BY bigram
)
SELECT bigram, n,
       row_number() OVER (ORDER BY n DESC, bigram ASC) AS rank
FROM c ORDER BY n DESC, bigram ASC LIMIT {BIGRAM_TOPK}
"""


# --------------------------------------------------------------------------
# doc_length_histogram: corpus length profile — the first diagnostic a
# training-data pass runs. Per-batch bucket counts (one row per occupied
# bucket per batch) → tiny groupby sum; shuffle ∝ buckets, never rows.
# --------------------------------------------------------------------------
LEN_HIST_BUCKET = 100  # chars per bucket


def doc_length_histogram(sf_dir: str):
    """(len_bucket, n_docs) with len_bucket = floor(len(text)/100)."""
    import pyarrow.compute as pc

    def partial(t: pa.Table) -> pa.Table:
        ln = pc.utf8_length(pc.fill_null(t["text"], "")).to_numpy()
        b = (ln // LEN_HIST_BUCKET).astype("int64")
        vals, cnt = np.unique(b, return_counts=True)
        return pa.table({"len_bucket": pa.array(vals, pa.int64()),
                         "n_docs": pa.array(cnt.astype("int64"),
                                            pa.int64())})

    from ray.data.aggregate import Sum
    return _read(sf_dir, "documents", ["text"]) \
        .map_batches(partial, batch_format="pyarrow") \
        .groupby("len_bucket").aggregate(Sum("n_docs", alias_name="n_docs"))


DOC_LENGTH_HISTOGRAM_SQL = f"""
SELECT CAST(length(text) // {LEN_HIST_BUCKET} AS BIGINT) AS len_bucket,
       CAST(count(*) AS BIGINT) AS n_docs
FROM documents GROUP BY len_bucket
"""


# --------------------------------------------------------------------------
# global_length_rank: ROW_NUMBER over a GLOBAL total order (length desc,
# doc_id asc) — the distributed total-sort/rank shape — without a full
# range-partitioned sort. Pass 1 folds per-batch length histograms (one
# row per distinct length per batch); the driver cumsums the bounded
# distinct-length table into prefix offsets and broadcasts it. Pass 2
# buckets rows BY LENGTH so each group owns one contiguous rank range:
# rank = offset(len) + position of doc_id within the equal-length group.
# Shuffle volume: pass 1 ∝ distinct lengths, pass 2 one row per doc into
# ∝-CPU buckets (each length's group is small; a skewed single length
# would be salted by doc_id range with offsets accumulated per sub-range).
# --------------------------------------------------------------------------
def global_length_rank(sf_dir: str):
    """(doc_id, n_chars, rank) with rank = global ROW_NUMBER ordered by
    (n_chars desc, doc_id asc)."""
    import pyarrow.compute as pc
    import ray

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def with_len(t: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": t["doc_id"],
            "n_chars": pc.cast(pc.utf8_length(pc.fill_null(t["text"], "")),
                               pa.int64()),
        })

    lens = ds.map_batches(with_len, batch_format="pyarrow").materialize()

    def hist(t: pa.Table) -> pa.Table:
        vals, cnt = np.unique(t["n_chars"].to_numpy(), return_counts=True)
        return pa.table({"n_chars": pa.array(vals, pa.int64()),
                         "n": pa.array(cnt.astype("int64"), pa.int64())})

    from ray.data.aggregate import Sum
    h = lens.map_batches(hist, batch_format="pyarrow") \
        .groupby("n_chars").aggregate(Sum("n", alias_name="n")).to_pandas()
    h = h.sort_values("n_chars", ascending=False).reset_index(drop=True)
    # offset(len) = #rows with a strictly greater length (0-based)
    h["offset"] = h["n"].cumsum().shift(1).fillna(0).astype("int64")
    offsets = dict(zip(h["n_chars"].to_numpy(), h["offset"].to_numpy()))
    off_ref = ray.put(offsets)

    n_buckets = h.shape[0] if h.shape[0] > 0 else 1

    def bucket(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        ln = t["n_chars"].to_numpy().astype("int64")
        return pa.table({
            "doc_id": pc.cast(t["doc_id"], pa.int64()),
            "n_chars": pa.array(ln, pa.int64()),
            "bucket": pa.array((ln.astype("uint64")
                                % np.uint64(n_buckets)).astype("int64"),
                               pa.int64()),
        })

    def rank_bucket(g: pd.DataFrame) -> pd.DataFrame:
        off = ray.get(off_ref)
        g = g.sort_values(["n_chars", "doc_id"],
                          ascending=[False, True],
                          kind="mergesort").reset_index(drop=True)
        within = g.groupby("n_chars").cumcount().to_numpy()
        base = g["n_chars"].map(off).to_numpy().astype("int64")
        return pd.DataFrame({
            "doc_id": g["doc_id"],
            "n_chars": g["n_chars"],
            "rank": base + within + 1,
        })

    return lens.map_batches(bucket, batch_format="pyarrow") \
        .groupby("bucket").map_groups(rank_bucket, batch_format="pandas")


GLOBAL_LENGTH_RANK_SQL = """
SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars,
       row_number() OVER (ORDER BY length(text) DESC, doc_id ASC) AS rank
FROM documents
"""


# --------------------------------------------------------------------------
# curation_pipeline: the composed END-TO-END training-set assembly —
# corpus_filter survivors (language + length gates ∩ exact-dedup reps −
# near-dup drops, the full cleaning stack) sequence-packed per source.
# Demonstrates stage composition as one lazy Dataset DAG: the survivor id
# set is corpus-scale, so it semi-joins the documents read through one
# doc_id-hash bucket shuffle (never a driver-side set), then the pack is
# the sequence_pack kernel over source buckets.
# --------------------------------------------------------------------------
def curation_pipeline(sf_dir: str, budget: int = PACK_BUDGET):
    """(doc_id, source, n_tokens, seq_id) over corpus_filter survivors."""
    import pyarrow.compute as pc

    from .analytics import _n_join_buckets
    n_buckets = _n_join_buckets()

    keep = _corpus_filter_ds(sf_dir)

    def tag_keep(t: pa.Table) -> pa.Table:
        d = t["doc_id"].to_numpy().astype("int64")
        return pa.table({
            "doc_id": pa.array(d, pa.int64()),
            "source": pa.array([""] * len(d), pa.string()),
            "n_tokens": pa.array(np.full(len(d), -1, dtype="int64")),
            "jbucket": pa.array(
                (d.astype("uint64") % np.uint64(n_buckets))
                .astype("int64"), pa.int64()),
        })

    def tag_docs(t: pa.Table) -> pa.Table:
        text = pc.fill_null(t["text"], "")
        n = pc.cast(pc.count_substring_regex(text, r"\S+"), pa.int64())
        d = t["doc_id"].to_numpy().astype("int64")
        return pa.table({
            "doc_id": t["doc_id"],
            "source": t["source"],
            "n_tokens": n,
            "jbucket": pa.array(
                (d.astype("uint64") % np.uint64(n_buckets))
                .astype("int64"), pa.int64()),
        })

    def semi(g: pd.DataFrame) -> pd.DataFrame:
        have = g.loc[g["n_tokens"] == -1, "doc_id"].to_numpy()
        rows = g[g["n_tokens"] >= 0]
        keep_rows = rows[rows["doc_id"].isin(have)]
        return keep_rows[["doc_id", "source", "n_tokens"]]

    docs = _read(sf_dir, "documents", ["doc_id", "source", "text"]) \
        .map_batches(tag_docs, batch_format="pyarrow")
    survivors = keep.map_batches(tag_keep, batch_format="pyarrow") \
        .union(docs) \
        .groupby("jbucket").map_groups(semi, batch_format="pandas")

    def bucket_src(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["bucket"] = _source_bucket_ids(df["source"].to_numpy())
        return df

    return survivors.map_batches(bucket_src, batch_format="pandas") \
        .groupby("bucket").map_groups(lambda g: _pack_group(g, budget),
                                      batch_format="pandas")


CURATION_PIPELINE_SQL = f"""
WITH keep AS ({CORPUS_FILTER_SQL}),
toks AS (
  SELECT d.doc_id, d.source,
         CAST(len(list_filter(string_split_regex(trim(d.text), '\\s+'),
                              x -> x <> '')) AS BIGINT)
           AS n_tokens
  FROM documents d JOIN keep k ON k.doc_id = d.doc_id
), cums AS (
  SELECT doc_id, source, n_tokens,
         sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                             ROWS UNBOUNDED PRECEDING) - n_tokens
           AS start_tok
  FROM toks
)
SELECT doc_id, source, n_tokens,
       CAST(start_tok // {PACK_BUDGET} AS BIGINT) AS seq_id
FROM cums
"""


# --------------------------------------------------------------------------
# source_mix_weights: domain-mixture weights ∝ token mass per source —
# the sampling-weights table a pretraining data mix is built from.
# Integer partials per (source, batch); the total crosses the driver as
# ONE int; each weight is a single operand-rounded IEEE division
# mirrored in the oracle.
# --------------------------------------------------------------------------
def source_mix_weights(sf_dir: str):
    """(source, n_docs, n_tokens, weight) with weight = source token
    share of the corpus."""
    import pyarrow.compute as pc

    def partial(t: pa.Table) -> pa.Table:
        n = pc.cast(pc.count_substring_regex(
            pc.fill_null(t["text"], ""), r"\S+"), pa.int64())
        one = pa.array(np.ones(len(t), dtype="int64"))
        g = pa.table({"source": t["source"], "n": n, "one": one}) \
            .group_by("source").aggregate([("one", "sum"), ("n", "sum")])
        return pa.table({"source": g["source"],
                         "n_docs": pc.cast(g["one_sum"], pa.int64()),
                         "n_tokens": pc.cast(g["n_sum"], pa.int64())})

    from ray.data.aggregate import Sum
    agg = _read(sf_dir, "documents", ["source", "text"]) \
        .map_batches(partial, batch_format="pyarrow") \
        .groupby("source").aggregate(Sum("n_docs", alias_name="n_docs"),
                                     Sum("n_tokens",
                                         alias_name="n_tokens"))

    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        total = float(int(df["n_tokens"].sum()))
        df = df.copy()
        df["weight"] = df["n_tokens"].to_numpy().astype("float64") / total
        return df

    # the per-source table is bounded (sources ≪ docs): one-task combine
    return agg.repartition(1).map_batches(finalize, batch_format="pandas")


SOURCE_MIX_WEIGHTS_SQL = """
WITH t AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(len(list_filter(string_split_regex(trim(text), '\\s+'),
                                  x -> x <> ''))) AS BIGINT)
           AS n_tokens
  FROM documents GROUP BY source
)
SELECT source, n_docs, n_tokens,
       CAST(n_tokens AS DOUBLE) / (SELECT CAST(sum(n_tokens) AS DOUBLE)
                                   FROM t) AS weight
FROM t
"""


# --------------------------------------------------------------------------
# Bigram language-model scoring: per-doc mean log-probability under the
# corpus's own MLE bigram model — the CCNet/Gopher-style "perplexity
# gate" computed WITHOUT an external model: the corpus is the model.
# score(doc) = mean over doc bigrams (w1,w2) of ln(C(w1,w2)/C(w1)),
# where C are corpus-global counts over bigram positions. Docs with <2
# tokens have no bigrams and are excluded on both sides by construction.
# --------------------------------------------------------------------------
def bigram_lm_score(sf_dir: str):
    """Distributed shape: explode per-doc (h1,h2,tf) bigram rows, hash-
    bucket by h1 — every bigram sharing a LEFT word lands in one bucket,
    so one map_groups computes the global left-unigram count C1(w1) and
    the global bigram count C2(w1,w2) in the same pass and emits per-doc
    partial Σ tf·(ln C2 − ln C1); a second narrow per-doc reduce divides
    by the doc's bigram total. Two shuffles total, both carrying
    pre-aggregated rows (one per distinct (bigram, doc), not one per
    occurrence). Token identity is by 64-bit hash in Ray vs string in
    SQL — identical modulo ~n²/2⁶⁵ collision odds (same contract as
    token_freq_score).
    """
    from .dedup import _adaptive_buckets, _doc_count
    n_docs = _doc_count(sf_dir)
    nb = np.uint64(_adaptive_buckets(n_docs * 64))

    def explode(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        text = pc.fill_null(t["text"], "")
        toks = pc.split_pattern_regex(text, r"\s+")
        flat = pc.list_flatten(toks)
        parent = pc.list_parent_indices(toks)
        keep = pc.not_equal(flat, "")
        flat = flat.filter(keep)
        parent = parent.filter(keep).to_numpy().astype("int64")
        th = token_hash64_many(flat).astype("int64")
        if len(th) < 2:
            return pa.table({"h1": pa.array([], pa.int64()),
                             "h2": pa.array([], pa.int64()),
                             "doc_id": pa.array([], pa.int64()),
                             "tf": pa.array([], pa.int64()),
                             "bucket": pa.array([], pa.int64())})
        adjacent = parent[:-1] == parent[1:]  # bigrams never cross docs
        h1 = th[:-1][adjacent]
        h2 = th[1:][adjacent]
        doc = pc.take(t["doc_id"], pa.array(parent[:-1][adjacent]))
        g = pa.table({"h1": pa.array(h1), "h2": pa.array(h2),
                      "doc_id": pc.cast(doc, pa.int64())}) \
            .group_by(["h1", "h2", "doc_id"]).aggregate([([], "count_all")])
        return pa.table({
            "h1": g["h1"], "h2": g["h2"], "doc_id": g["doc_id"],
            "tf": pc.cast(g["count_all"], pa.int64()),
            "bucket": pa.array((g["h1"].to_numpy().astype("uint64") % nb)
                               .astype("int64")),
        })

    def partial_scores(g: pd.DataFrame) -> pd.DataFrame:
        tf = g["tf"].to_numpy().astype("int64")
        # C1(w1): all rows of a left word are in this bucket
        c1 = g.groupby("h1")["tf"].transform("sum").to_numpy()
        c2 = g.groupby(["h1", "h2"])["tf"].transform("sum").to_numpy()
        part = tf * (np.log(c2.astype("float64"))
                     - np.log(c1.astype("float64")))
        out = pd.DataFrame({"doc_id": g["doc_id"].to_numpy(),
                            "logp_sum": part, "n_bi": tf})
        return out.groupby("doc_id", as_index=False).sum()

    parts = _read(sf_dir, "documents", ["doc_id", "text"]) \
        .map_batches(explode, batch_format="pyarrow") \
        .groupby("bucket").map_groups(partial_scores,
                                      batch_format="pandas")
    # per-doc final reduce: same scale-vs-toy split as token_freq_score
    if n_docs > 2_000_000:
        from ray.data.aggregate import Sum
        per_doc = parts.groupby("doc_id").aggregate(
            Sum("logp_sum", alias_name="logp_sum"),
            Sum("n_bi", alias_name="n_bigrams"))
    else:
        per_doc = parts.repartition(1).map_batches(
            lambda df: df.groupby("doc_id", as_index=False).sum()
            .rename(columns={"n_bi": "n_bigrams"}),
            batch_format="pandas")

    def finish(t: pa.Table) -> pa.Table:
        s = t["logp_sum"].to_numpy().astype("float64")
        n = t["n_bigrams"].to_numpy().astype("int64")
        # the log-prob sum's float accumulation ORDER is engine-dependent
        # (bucketed partials here vs one serial sum in the oracle), so pin
        # the contract at 9 decimals — the driver's own hash tolerance —
        # on both sides
        return pa.table({"doc_id": t["doc_id"],
                         "n_bigrams": pa.array(n),
                         "lm_score": pa.array(np.round(s / n, 9))})

    return per_doc.map_batches(finish, batch_format="pyarrow")


BIGRAM_LM_SCORE_SQL = r"""
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(trim(text), '\s+'),
                     x -> x <> '') AS ws
  FROM documents),
bi AS (
  SELECT doc_id, ws[i] AS w1, ws[i + 1] AS w2
  FROM toks, unnest(range(1, len(ws))) AS u(i)),
c1 AS (SELECT w1, count(*) AS c FROM bi GROUP BY w1),
c2 AS (SELECT w1, w2, count(*) AS c FROM bi GROUP BY w1, w2)
SELECT b.doc_id,
       count(*) AS n_bigrams,
       round(sum(ln(c2.c) - ln(c1.c)) / count(*), 9) AS lm_score
FROM bi b
JOIN c1 ON b.w1 = c1.w1
JOIN c2 ON b.w1 = c2.w1 AND b.w2 = c2.w2
GROUP BY b.doc_id
"""


# --------------------------------------------------------------------------
# inverted_index: the local indexer's product as a table — per-term
# dictionary row (document frequency, total term frequency, best doc)
# over the corpus. Reference: dist/local_indexer.py / local_indexer.cc
# tokenize-and-index loop; the postings build shares tfidf_top_terms'
# Arrow-native kernel and term-hash bucketing, so the corpus-wide
# dictionary costs ONE coarse-bucket shuffle (rows ∝ distinct terms).
# --------------------------------------------------------------------------
INVIDX_MIN_DF = 3


def inverted_index(sf_dir: str, min_df: int = INVIDX_MIN_DF):
    """(term, df, total_tf, top_doc) for every [A-Za-z0-9]+ ASCII-lower
    term with document frequency ≥ ``min_df``; top_doc = the doc with
    the highest tf (ties → smallest doc_id)."""
    import pyarrow.compute as pc

    from .dedup import N_BUCKETS, sorted_or_empty

    def postings(t: pa.Table) -> pa.Table:
        text = pc.fill_null(t["text"], "")
        toks = pc.split_pattern_regex(text, "[^A-Za-z0-9]+")
        flat = pc.list_flatten(toks)
        parent = pc.list_parent_indices(toks)
        keep = pc.not_equal(flat, "")
        flat = pc.utf8_lower(flat.filter(keep))
        doc = pc.take(t["doc_id"], parent.filter(keep))
        tf = pa.table({"doc_id": doc, "term": flat}) \
            .group_by(["doc_id", "term"]).aggregate([([], "count_all")])
        term_hash = token_hash64_many(tf["term"])
        return pa.table({
            "doc_id": pc.cast(tf["doc_id"], pa.int64()),
            "term": tf["term"],
            "tf": pc.cast(tf["count_all"], pa.int64()),
            "tbucket": pa.array(
                (term_hash % np.uint64(N_BUCKETS)).astype("int64")),
        })

    def dictionary(g: pd.DataFrame) -> pd.DataFrame:
        # every posting of a term lands in this bucket group
        g = g.sort_values(["term", "tf", "doc_id"],
                          ascending=[True, False, True])
        agg = g.groupby("term", sort=True).agg(
            df=("doc_id", "nunique"), total_tf=("tf", "sum"),
            top_doc=("doc_id", "first"))
        agg = agg[agg["df"] >= min_df].reset_index()
        return agg.astype({"df": "int64", "total_tf": "int64",
                           "top_doc": "int64"})

    out = _read(sf_dir, "documents", ["doc_id", "text"]) \
        .map_batches(postings, batch_format="pyarrow") \
        .groupby("tbucket").map_groups(dictionary, batch_format="pandas")
    return sorted_or_empty(
        out, "term",
        pa.table({"term": pa.array([], pa.string()),
                  "df": pa.array([], pa.int64()),
                  "total_tf": pa.array([], pa.int64()),
                  "top_doc": pa.array([], pa.int64())}))


INVERTED_INDEX_SQL = f"""
WITH toks AS (
  SELECT doc_id,
         lower(unnest(regexp_extract_all(text, '[A-Za-z0-9]+'))) AS term
  FROM documents
), tf AS (
  SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2
), agg AS (
  SELECT term, count(*) AS df, sum(tf) AS total_tf
  FROM tf GROUP BY 1
), best AS (
  SELECT term, doc_id AS top_doc,
         row_number() OVER (PARTITION BY term
                            ORDER BY tf DESC, doc_id ASC) AS rn
  FROM tf
)
SELECT a.term,
       CAST(a.df AS BIGINT) AS df,
       CAST(a.total_tf AS BIGINT) AS total_tf,
       CAST(b.top_doc AS BIGINT) AS top_doc
FROM agg a JOIN best b ON b.term = a.term AND b.rn = 1
WHERE a.df >= {INVIDX_MIN_DF}
ORDER BY a.term
"""


# --------------------------------------------------------------------------
# train_val_split: deterministic corpus partitioning for training —
# every pipeline that feeds a trainer ends with one of these. The split
# is a pure function of doc identity (Knuth multiplicative hash, HIGH
# bits, ~1/10 validation), so reruns, resumes and multi-job readers all
# agree with zero coordination AND the split stays uncorrelated with
# source/doc_id stripes (a doc_id % k rule puts whole sources in one
# split on this corpus); the query reports the per-(split, source)
# document and token mass the trainer's data-mixing config consumes.
# --------------------------------------------------------------------------
VAL_EVERY = 10
_SPLIT_KNUTH = 2654435761


def train_val_split(sf_dir: str):
    """(split, source, n_docs, n_tokens) — map-side split assignment +
    Arrow per-batch partials; the shuffle carries ≤ 2×n_sources rows."""
    import pyarrow.compute as pc

    ds = _read(sf_dir, "documents", ["doc_id", "text", "source"])

    def partial(t: pa.Table) -> pa.Table:
        text = pc.fill_null(t["text"], "")
        tok = pc.cast(pc.count_substring_regex(text, r"\S+"), pa.int64())
        h = (t["doc_id"].to_numpy().astype(np.uint64)
             * _SPLIT_KNUTH) % (1 << 32)
        is_val = pa.array(((h >> 16) % VAL_EVERY) == 0)
        split = pc.if_else(is_val, pa.scalar("val"), pa.scalar("train"))
        g = pa.table({"split": split, "source": t["source"],
                      "n_docs": pa.array(np.ones(len(t), np.int64)),
                      "n_tokens": tok}) \
            .group_by(["split", "source"]) \
            .aggregate([("n_docs", "sum"), ("n_tokens", "sum")])
        return g.rename_columns(["split", "source", "n_docs", "n_tokens"])

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby(["split", "source"], as_index=False).agg(
            n_docs=("n_docs", "sum"), n_tokens=("n_tokens", "sum"))
        return out.astype({"n_docs": "int64", "n_tokens": "int64"})

    return ds.map_batches(partial, batch_format="pyarrow") \
        .repartition(1).map_batches(combine, batch_format="pandas")


TRAIN_VAL_SPLIT_SQL = f"""
SELECT CASE WHEN ((doc_id * {_SPLIT_KNUTH}) % 4294967296 // 65536)
              % {VAL_EVERY} = 0
            THEN 'val' ELSE 'train' END AS split,
       source,
       count(*) AS n_docs,
       CAST(sum(len(list_filter(string_split_regex(trim(text), '\\s+'),
                                x -> x <> ''))) AS BIGINT) AS n_tokens
FROM documents
GROUP BY 1, 2
"""


# --------------------------------------------------------------------------
# charset_decode: the text-transcode leg of the fetch path (M18/M19) —
# wire payloads arrive in whatever encoding the server used; the engine
# sniffs (BOM-first) and decodes to UTF-8 before any text op runs.
# --------------------------------------------------------------------------

def charset_decode(sf_dir: str):
    """(doc_id, encoding, n_bytes, text_sha256) — derived wire payloads
    (doc_id%4 selects utf-8 / utf-8 with BOM / utf-16-le / utf-16-be,
    integer rules the oracle mirrors) are sniffed by the real
    BOM/UTF-8-trial sniffer and decoded; text_sha256 hashes the DECODED
    text, so a single wrong byte anywhere in encode→sniff→decode breaks
    the oracle match against sha256(text) computed from the source
    column. Map-side only: one streaming pass, zero shuffle."""
    import hashlib

    from ..http_headers import sniff_charset

    # wire encoders (explicit BOMs — python's utf-16-le/-be codecs are
    # BOM-less) and the BOM-stripping decoder for each sniff verdict
    _WIRE = [
        lambda s: s.encode("utf-8"),
        lambda s: b"\xef\xbb\xbf" + s.encode("utf-8"),
        lambda s: b"\xff\xfe" + s.encode("utf-16-le"),
        lambda s: b"\xfe\xff" + s.encode("utf-16-be"),
    ]
    _DECODE = {"utf-8": "utf-8", "utf-8-sig": "utf-8-sig",
               "utf-16-le": "utf-16", "utf-16-be": "utf-16",
               "latin-1": "latin-1"}

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def run(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        texts = t["text"].to_pylist()
        encs, nbytes, shas = [], [], []
        for d, tx in zip(ids, texts):
            payload = _WIRE[d % 4](tx or "")     # the simulated wire bytes
            got = sniff_charset(payload)
            # utf-8 without BOM sniffs as plain utf-8 (ASCII corpus);
            # the utf-16 decode goes through the BOM-aware codec
            decoded = payload.decode(_DECODE[got])
            encs.append(got)
            nbytes.append(len(payload))
            shas.append(hashlib.sha256(decoded.encode("utf-8")).hexdigest())
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "encoding": pa.array(encs, pa.string()),
            "n_bytes": pa.array(nbytes, pa.int64()),
            "text_sha256": pa.array(shas, pa.string()),
        })

    return ds.map_batches(run, batch_format="pyarrow")


CHARSET_DECODE_SQL = """
SELECT doc_id,
       CASE doc_id % 4 WHEN 0 THEN 'utf-8'
                       WHEN 1 THEN 'utf-8-sig'
                       WHEN 2 THEN 'utf-16-le'
                       ELSE 'utf-16-be' END AS encoding,
       CAST(CASE WHEN doc_id % 4 = 0 THEN strlen(text)
                 WHEN doc_id % 4 = 1 THEN strlen(text) + 3
                 ELSE 2 * strlen(text) + 2 END AS BIGINT) AS n_bytes,
       sha256(text) AS text_sha256
FROM documents
"""


def unicode_nfc(sf_dir: str):
    """(doc_id, norm_text, changed) — Unicode NFC normalization (the M19
    transcode dual at the codepoint level: combining sequences compose,
    canonical singletons like U+212B ANGSTROM map to U+00C5). Engine
    side runs CPython's unicodedata over per-doc derived strings with
    planted decomposed/singleton/ASCII classes; the oracle recomputes
    with DuckDB's utf8proc-backed nfc_normalize — two INDEPENDENT
    normalization implementations cross-validated value-for-value."""
    import unicodedata

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id"])

    def run(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        outs, changed = [], []
        for d in ids:
            if d % 3 == 0:
                raw = f"v{d}"                          # pure ASCII
            elif d % 3 == 1:
                raw = f"v{d}é"                   # combining acute
            else:
                raw = f"v{d}Å"                    # NFC singleton
            n = unicodedata.normalize("NFC", raw)
            outs.append(n)
            changed.append(n != raw)
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "norm_text": pa.array(outs, pa.string()),
            "changed": pa.array(changed, pa.bool_()),
        })

    return ds.map_batches(run, batch_format="pyarrow")


UNICODE_NFC_SQL = """
SELECT doc_id,
       nfc_normalize('v' || CAST(doc_id AS VARCHAR) ||
         CASE WHEN doc_id % 3 = 0 THEN ''
              WHEN doc_id % 3 = 1 THEN 'e' || chr(769)
              ELSE chr(8491) END) AS norm_text,
       doc_id % 3 <> 0 AS changed
FROM documents
"""
