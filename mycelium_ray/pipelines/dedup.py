"""Deduplication operators over the ``documents`` table.

Exact dedup (hash-partition + per-group first — the distributed form of the
reference's upsert-by-key, /root/reference/src/common/Doc.cc:79 and A3/A4 in
SURVEY.md §2.5), n-gram Jaccard pairs, MinHash+LSH near-dup, SimHash
near-dup. All are map_batches → (pre-aggregate) → groupby shapes; the LSH
variants shuffle only (band_hash → doc ids) candidate rows, never documents.

Scale notes: at 100 TB the exact-dedup groupby runs on 8-byte content
hashes (not text); minhash emits B band rows per doc (B≈16) and the
band-bucket groupby is the only all-to-all; verification joins fetch only
candidate texts. Thresholded exact-Jaccard verification makes LSH output a
subset of the exact pair set (no false positives by construction).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

from ..hashing import splitmix64, url_hash64_many

_U64 = np.uint64


def _read_docs(sf_dir: str, n_blocks: int = 32):
    # the table is one parquet file → one block → ONE map task; split
    # so per-doc CPU work (shingling, hashing) actually parallelizes
    return rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"]).repartition(n_blocks)


# --------------------------------------------------------------------------
# exact dedup: keep min(doc_id) per distinct text
# --------------------------------------------------------------------------
def dedup_exact(sf_dir: str):
    """(doc_id) of the kept representative per distinct text.

    map_batches computes 64-bit content hashes and PRE-AGGREGATES (min
    doc_id per hash within batch) so the groupby shuffles one row per
    distinct hash per batch, not one per document.
    """
    def partial(df: pd.DataFrame) -> pd.DataFrame:
        h = url_hash64_many(df["text"].fillna("").tolist()).astype("int64")
        g = pd.DataFrame({"content_hash": h, "doc_id": df["doc_id"]})
        return g.groupby("content_hash", as_index=False)["doc_id"].min()

    ds = _read_docs(sf_dir).map_batches(partial, batch_format="pandas")
    from ray.data.aggregate import Min
    out = ds.groupby("content_hash").aggregate(Min("doc_id", alias_name="doc_id"))
    return out.select_columns(["doc_id"])


DEDUP_EXACT_SQL = """
SELECT min(doc_id) AS doc_id FROM documents GROUP BY text
"""


# --------------------------------------------------------------------------
# n-gram (trigram) sets + exact Jaccard pairs
# --------------------------------------------------------------------------
def _trigrams(words: list[str]) -> list[str]:
    if len(words) < 3:
        return [" ".join(words)] if words else []
    return [" ".join(words[i:i + 3]) for i in range(len(words) - 2)]


def _doc_shingle_hashes(texts: list[str]) -> list[np.ndarray]:
    out = []
    for t in texts:
        grams = sorted(set(_trigrams((t or "").split())))
        out.append(url_hash64_many(grams))
    return out


def ngram_jaccard_pairs(sf_dir: str, threshold: float = 0.5):
    """All pairs (doc_id_a < doc_id_b) with trigram-set Jaccard ≥ threshold.

    Distributed shape: per-batch shingle hashing, then an inverted-index
    explode (shingle_hash → doc_id) + groupby to count intersections —
    the same skeleton as the SQL oracle's unnest/join/group. Jaccard is one
    IEEE division of two int counts, so value-hash comparison is exact.
    """
    docs = _read_docs(sf_dir)

    def explode(df: pd.DataFrame) -> pd.DataFrame:
        hs = _doc_shingle_hashes(df["text"].tolist())
        return pd.DataFrame({
            "doc_id": np.repeat(df["doc_id"].to_numpy(), [len(h) for h in hs]),
            "sh": np.concatenate(hs).astype("int64") if hs else
                  np.array([], dtype="int64"),
        })

    ex = docs.map_batches(explode, batch_format="pandas")
    # set sizes per doc
    from ray.data.aggregate import Count, Sum
    sizes = ex.groupby("doc_id").aggregate(Count(alias_name="n_sh"))
    sizes_df = sizes.to_pandas().set_index("doc_id")["n_sh"]

    # pairwise intersections, bucketed: grouping by raw shingle would make
    # ~n_docs×n_shingles tiny Ray groups (one Python call each); hashing
    # shingles into 256 buckets keeps the shuffle coarse and does the
    # per-shingle pairing vectorized in pandas inside each bucket
    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df["bucket"] = (df["sh"].to_numpy().astype("uint64") % 256).astype("int64")
        return df

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        m = g.merge(g, on="sh")
        m = m[m["doc_id_x"] < m["doc_id_y"]]
        if len(m) == 0:
            return pd.DataFrame({"doc_id_a": pd.Series([], dtype="int64"),
                                 "doc_id_b": pd.Series([], dtype="int64"),
                                 "n_inter": pd.Series([], dtype="int64")})
        out = m.groupby(["doc_id_x", "doc_id_y"], as_index=False).size()
        return out.rename(columns={"doc_id_x": "doc_id_a",
                                   "doc_id_y": "doc_id_b",
                                   "size": "n_inter"})

    cand = ex.map_batches(add_bucket, batch_format="pandas") \
        .groupby("bucket").map_groups(bucket_pairs, batch_format="pandas")
    # final reduce over the candidate-pair partials: pack the pair key into
    # one int64 and sum with a single vectorized pandas groupby — the pair
    # key space is dense enough that a full sort-shuffle is wasted work
    parts = []
    for batch in cand.iter_batches(batch_size=1 << 20, batch_format="pandas"):
        key = (batch["doc_id_a"].to_numpy().astype("int64") << 32) \
            | batch["doc_id_b"].to_numpy().astype("int64")
        p = pd.DataFrame({"key": key, "n_inter": batch["n_inter"]})
        parts.append(p.groupby("key", as_index=False)["n_inter"].sum())
    if not parts:
        pdf = pd.DataFrame({"doc_id_a": [], "doc_id_b": [], "n_inter": []})
    else:
        agg = pd.concat(parts).groupby("key", as_index=False)["n_inter"].sum()
        pdf = pd.DataFrame({
            "doc_id_a": (agg["key"].to_numpy() >> 32).astype("int64"),
            "doc_id_b": (agg["key"].to_numpy() & 0xFFFFFFFF).astype("int64"),
            "n_inter": agg["n_inter"].to_numpy(),
        })
    if len(pdf) == 0:
        return pa.table({"doc_id_a": pa.array([], pa.int64()),
                         "doc_id_b": pa.array([], pa.int64()),
                         "jaccard": pa.array([], pa.float64())})
    na = sizes_df.reindex(pdf["doc_id_a"]).to_numpy()
    nb = sizes_df.reindex(pdf["doc_id_b"]).to_numpy()
    jac = pdf["n_inter"].to_numpy() / (na + nb - pdf["n_inter"].to_numpy())
    pdf = pdf.assign(jaccard=jac)
    pdf = pdf[pdf["jaccard"] >= threshold]
    pdf = pdf.sort_values(["doc_id_a", "doc_id_b"]).reset_index(drop=True)
    return pa.table({
        "doc_id_a": pa.array(pdf["doc_id_a"].astype("int64")),
        "doc_id_b": pa.array(pdf["doc_id_b"].astype("int64")),
        "jaccard": pa.array(pdf["jaccard"].astype("float64")),
    })


NGRAM_JACCARD_SQL = """
WITH toks AS (
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
)
SELECT da AS doc_id_a, db AS doc_id_b,
       CAST(i AS DOUBLE) / (sa.n + sb.n - i) AS jaccard
FROM inter
JOIN sz sa ON sa.doc_id = da
JOIN sz sb ON sb.doc_id = db
WHERE CAST(i AS DOUBLE) / (sa.n + sb.n - i) >= 0.5
"""


# --------------------------------------------------------------------------
# MinHash + LSH near-dup (probabilistic candidate gen, exact verification)
# --------------------------------------------------------------------------
N_PERM = 64
N_BANDS = 16
ROWS_PER_BAND = N_PERM // N_BANDS


def _minhash_sig(shingles: np.ndarray, seeds: np.ndarray) -> np.ndarray:
    """(N_PERM,) signature: min over splitmix64(shingle ^ seed)."""
    if len(shingles) == 0:
        return np.full(N_PERM, np.iinfo(np.uint64).max, dtype=_U64)
    # (n_sh, n_perm) — vectorized over both axes
    mixed = splitmix64(shingles[:, None] ^ seeds[None, :])
    return mixed.min(axis=0)


def minhash_lsh_dedup(sf_dir: str, threshold: float = 0.5):
    """Near-dup pairs via MinHash banding, verified with exact Jaccard.

    Pipeline: shingle+sign per batch → explode (band_id, band_hash, doc_id)
    → groupby band bucket → candidate pairs → exact-Jaccard verify →
    pairs ≥ threshold. Output ⊆ the exact pair set (verification removes
    LSH false positives); recall is probabilistic (tested ≥ in pytest).
    """
    seeds = splitmix64(np.arange(1, N_PERM + 1, dtype=_U64) * _U64(0x9E3779B97F4A7C15))

    def sign(df: pd.DataFrame) -> pd.DataFrame:
        """One distributed pass: band rows AND the doc's shingle hashes
        (the verify stage needs the latter; recomputing them serially on
        the driver was the original hot spot)."""
        rows = {"doc_id": [], "band_id": [], "band_hash": [], "shingles": []}
        for doc_id, text in zip(df["doc_id"], df["text"]):
            grams = sorted(set(_trigrams((text or "").split())))
            sh = url_hash64_many(grams)
            sig = _minhash_sig(sh, seeds)
            for b in range(N_BANDS):
                band = sig[b * ROWS_PER_BAND:(b + 1) * ROWS_PER_BAND]
                bh = int(splitmix64(np.bitwise_xor.reduce(
                    splitmix64(band + _U64(b + 1))))) & 0x7FFFFFFFFFFFFFFF
                rows["doc_id"].append(doc_id)
                rows["band_id"].append(b)
                rows["band_hash"].append(bh)
                # ship shingles once (band 0 rows only) to keep rows narrow
                rows["shingles"].append(sh.tobytes() if b == 0 else b"")
        return pd.DataFrame(rows)

    signed = _read_docs(sf_dir).map_batches(
        sign, batch_format="pandas").to_pandas()
    sh_by_doc = {
        int(d): np.frombuffer(s, dtype=_U64)
        for d, s, b in zip(signed["doc_id"], signed["shingles"],
                           signed["band_id"]) if b == 0}
    bands_df = signed[["doc_id", "band_id", "band_hash"]].copy()
    # coarse bucketing: grouping by raw (band_id, band_hash) makes ~one Ray
    # group (and one Python call) per DOC; 256 hash buckets keep the
    # shuffle coarse and pair discovery vectorized per bucket
    bands_df["bucket"] = (bands_df["band_hash"] % 256).astype("int64")
    bands = rd.from_pandas(bands_df)

    def pairs_of_bucket(g: pd.DataFrame) -> pd.DataFrame:
        m = g.merge(g, on=["band_id", "band_hash"])
        m = m[m["doc_id_x"] < m["doc_id_y"]]
        return pd.DataFrame({
            "doc_id_a": m["doc_id_x"].astype("int64"),
            "doc_id_b": m["doc_id_y"].astype("int64"),
        })

    cand = bands.groupby("bucket") \
        .map_groups(pairs_of_bucket, batch_format="pandas").to_pandas()
    if len(cand) == 0:
        return pa.table({"doc_id_a": pa.array([], pa.int64()),
                         "doc_id_b": pa.array([], pa.int64()),
                         "jaccard": pa.array([], pa.float64())})
    cand = cand.drop_duplicates().astype("int64")
    out = {"doc_id_a": [], "doc_id_b": [], "jaccard": []}
    for a, b in cand.itertuples(index=False):
        sa, sb = sh_by_doc[a], sh_by_doc[b]
        inter = len(np.intersect1d(sa, sb))
        union = len(sa) + len(sb) - inter
        j = inter / union if union else 0.0
        if j >= threshold:
            out["doc_id_a"].append(a)
            out["doc_id_b"].append(b)
            out["jaccard"].append(j)
    order = np.lexsort((out["doc_id_b"], out["doc_id_a"]))
    return pa.table({
        "doc_id_a": pa.array(np.asarray(out["doc_id_a"], dtype="int64")[order]),
        "doc_id_b": pa.array(np.asarray(out["doc_id_b"], dtype="int64")[order]),
        "jaccard": pa.array(np.asarray(out["jaccard"], dtype="float64")[order]),
    })


# --------------------------------------------------------------------------
# SimHash near-dup
# --------------------------------------------------------------------------
def simhash_batch(df: pd.DataFrame) -> pd.DataFrame:
    """64-bit SimHash over token hashes (weight 1 per occurrence)."""
    sims = np.zeros(len(df), dtype="int64")
    for i, text in enumerate(df["text"].fillna("")):
        ws = text.split()
        if not ws:
            continue
        hs = url_hash64_many(ws)
        bits = ((hs[:, None] >> np.arange(64, dtype=_U64)) & _U64(1)).astype(np.int64)
        acc = (2 * bits - 1).sum(axis=0)
        val = int((acc > 0).astype(np.uint64) @ (np.uint64(1) << np.arange(64, dtype=_U64)))
        sims[i] = val - (1 << 64) if val >= (1 << 63) else val
    return pd.DataFrame({"doc_id": df["doc_id"], "simhash": sims})


def simhash(sf_dir: str):
    return _read_docs(sf_dir).map_batches(simhash_batch, batch_format="pandas")


def simhash_neardup(sf_dir: str, max_hamming: int = 8):
    """Pairs with simhash hamming distance ≤ max_hamming, via 4-segment
    pigeonhole blocking (any pair within distance 8 must agree on ≥1 of 8
    8-bit segments... we use 4 16-bit segments, guaranteed to share one when
    distance ≤ 3; wider distances verified from the blocked candidates)."""
    sims = simhash(sf_dir).to_pandas()
    h = sims["simhash"].to_numpy().astype("uint64")
    ids = sims["doc_id"].to_numpy()
    cand = set()
    for seg in range(4):
        key = (h >> _U64(seg * 16)) & _U64(0xFFFF)
        df = pd.DataFrame({"k": key, "i": np.arange(len(h))})
        for _, g in df.groupby("k"):
            idx = g["i"].to_numpy()
            if len(idx) > 1:
                ia, ib = np.triu_indices(len(idx), k=1)
                cand.update(zip(idx[ia].tolist(), idx[ib].tolist()))
    rows = {"doc_id_a": [], "doc_id_b": [], "hamming": []}
    for i, j in cand:
        d = bin(int(h[i] ^ h[j])).count("1")
        if d <= max_hamming:
            a, b = sorted((int(ids[i]), int(ids[j])))
            rows["doc_id_a"].append(a)
            rows["doc_id_b"].append(b)
            rows["hamming"].append(d)
    order = np.lexsort((rows["doc_id_b"], rows["doc_id_a"]))
    return pa.table({
        "doc_id_a": pa.array(np.asarray(rows["doc_id_a"], dtype="int64")[order]),
        "doc_id_b": pa.array(np.asarray(rows["doc_id_b"], dtype="int64")[order]),
        "hamming": pa.array(np.asarray(rows["hamming"], dtype="int64")[order]),
    })
