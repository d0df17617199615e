"""Deduplication operators over the ``documents`` table.

Exact dedup (hash-partition + per-group first — the distributed form of the
reference's upsert-by-key, /root/reference/src/common/Doc.cc:79 and A3/A4 in
SURVEY.md §2.5), n-gram Jaccard pairs, MinHash+LSH near-dup, SimHash
near-dup. All are map_batches → (pre-aggregate) → groupby shapes; the LSH
variants shuffle only (band_hash → doc ids) candidate rows plus the doc
payloads the verify stage actually references, never all-pairs.

Scale notes: at 100 TB the exact-dedup groupby runs on 8-byte content
hashes (not text); minhash emits B band rows per doc (B≈16); candidate
VERIFICATION is fully distributed — pairs join back to the shingle
dataset by doc_id and verify inside map_groups (nothing row-shaped ever
reaches the driver; only the final thresholded pair set, which is the
query result, is collected). Coarse 256-way bucketing keeps every shuffle
group large enough to vectorize in pandas (one Ray group per raw key
would mean one Python call per key — catastrophic at scale).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

from ..hashing import splitmix64, token_hash64_many, url_hash64_many

_U64 = np.uint64
N_BUCKETS = 256  # coarse-bucket floor; the cap scales ∝ cluster CPUs below
SMALL_GRAPH_EDGES = 1 << 22  # ≤4M edges: one-task union-find beats rounds
_TOY_ROWS = 2_000_000  # above this a parquet scan is already many blocks


def _cluster_cpus() -> int:
    """Total cluster CPUs (falls back to 8 when Ray isn't up yet)."""
    try:
        import ray
        return max(1, int(ray.cluster_resources().get("CPU", 8)))
    except Exception:
        return 8


def _adaptive_buckets(n_rows: int) -> np.int64:
    """Shuffle width proportional to stage input size: every bucketed
    groupby pays ~n_buckets fixed task cost per pass, so toy inputs must
    not shuffle at 100-TB width. One bucket per ~20k rows, floor 16
    (keeps multi-core spread at test scale). The cap is N_BUCKETS or
    8×cluster CPUs, whichever is larger — a constant cap would bound
    shuffle parallelism at 256 tasks on a 256-node cluster."""
    cap = max(N_BUCKETS, 8 * _cluster_cpus())
    return np.int64(min(cap, max(16, n_rows // 20_000)))


def _doc_count(sf_dir: str) -> int:
    """Row count of the documents table from parquet footer metadata —
    free (no scan), used to size shuffle widths before the pipeline runs."""
    import pyarrow.parquet as pq
    return pq.ParquetFile(f"{sf_dir}/documents.parquet").metadata.num_rows

_POPCOUNT_LUT = np.array([bin(i).count("1") for i in range(256)],
                         dtype="uint8")


def _popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized popcount of a uint64 array via byte-view LUT."""
    return _POPCOUNT_LUT[x.view("uint8").reshape(len(x), 8)] \
        .sum(axis=1).astype("int64")


def _read_docs(sf_dir: str, n_blocks: int | None = None):
    # the testdata table is one parquet file → one block → ONE map task;
    # split so per-doc CPU work (shingling, hashing) actually
    # parallelizes. Width scales with row count (footer metadata, free):
    # every block costs fixed scheduling overhead in EVERY downstream
    # shuffle stage, so toy inputs must not fan out to full-cluster width
    # (32 blocks → 8 measured 6.7s → 2.3s on the minhash pipeline at
    # sf0.1). Above _TOY_ROWS the scan itself yields many blocks and a
    # repartition here would only COALESCE a wide read and serialize the
    # per-doc CPU work — so it is skipped entirely; the explicit cap
    # scales with cluster CPUs, never a constant.
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    if n_blocks is None:
        n_rows = _doc_count(sf_dir)
        if n_rows > _TOY_ROWS:
            return ds
        n_blocks = min(max(32, 4 * _cluster_cpus()),
                       max(8, n_rows // 1000))
    return ds.repartition(n_blocks)


def sorted_or_empty(ds, keys, empty: pa.Table):
    """Distributed final order for a data-dependent (possibly empty)
    result set: materialize the result blocks into the object store
    (spillable, cluster-wide — NOT a driver collect), then either hand
    back the typed empty table (Ray drops the schema of an all-empty
    dataset through sort) or the distributed sort. Used by every pair-
    emitting dedup/near-dup op so nothing row-shaped crosses the driver
    regardless of result size."""
    pre = ds.materialize()
    if pre.count() == 0:
        return empty
    return pre.sort(keys)


def _pack_pair(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """(a, b) → one int64 key (doc ids < 2^31 in the corpus design)."""
    return (a.astype("int64") << 32) | b.astype("int64")


# --------------------------------------------------------------------------
# exact dedup: keep min(doc_id) per distinct text
# --------------------------------------------------------------------------
def dedup_exact(sf_dir: str):
    """(doc_id) of the kept representative per distinct text.

    map_batches computes 64-bit content hashes and PRE-AGGREGATES (min
    doc_id per hash within batch) so the groupby shuffles one row per
    distinct hash per batch, not one per document.
    """
    def partial(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        h = token_hash64_many(
            pc.fill_null(t["text"], "")).astype("int64")
        g = pa.table({"content_hash": pa.array(h), "doc_id": t["doc_id"]}) \
            .group_by("content_hash").aggregate([("doc_id", "min")])
        return pa.table({"content_hash": g["content_hash"],
                         "doc_id": g["doc_id_min"]})

    ds = _read_docs(sf_dir).map_batches(partial, batch_format="pyarrow")
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


def _verify_pairs_exact(cand, doc_blobs, nb: np.uint64, threshold: float):
    """Distributed exact-Jaccard verification of candidate pairs — the
    shared tail of minhash_lsh_dedup and _jaccard_pairs_ds.

    ``cand``: Dataset[(doc_id_a < doc_id_b)], duplicates across source
    buckets allowed (they collapse in the pair-key groupby).
    ``doc_blobs``: Dataset[(doc_id, shingles)] — one row per document,
    blob = the doc's uint64 shingle-hash set as raw bytes.

    Symmetric two-hop join: each candidate pair fans out to two
    (join_key=doc_id, pair_key, side) rows, unioned with the blob rows;
    the doc-id-bucket groupby attaches the blob to each referencing
    side; the pair-key-bucket groupby brings both sides together and
    computes exact Jaccard vectorized (concatenate both sides' blobs
    tagged with a pair index, lexsort by (pair, hash) — a hash appears
    at most once per side, so every adjacent duplicate is exactly one
    a∩b element; bincount yields per-pair |a∩b|). Nothing row-shaped
    touches the driver."""

    def pair_sides(df: pd.DataFrame) -> pa.Table:
        a = df["doc_id_a"].to_numpy().astype("int64")
        b = df["doc_id_b"].to_numpy().astype("int64")
        pk = _pack_pair(a, b)
        jk = np.concatenate([a, b]).astype("int64")
        return pa.table({
            "jk": pa.array(jk, pa.int64()),
            "pk": pa.array(np.concatenate([pk, pk]), pa.int64()),
            "side": pa.array(np.concatenate([
                np.zeros(len(pk), dtype="int64"),
                np.ones(len(pk), dtype="int64")]), pa.int64()),
            "shingles": pa.array([b""] * (2 * len(pk)), pa.binary()),
            "jbucket": pa.array((jk.astype("uint64") % nb)
                                .astype("int64"), pa.int64()),
        })

    def doc_rows(t: pa.Table) -> pa.Table:
        jk = t["doc_id"].to_numpy().astype("int64")
        n = len(t)
        return pa.table({
            "jk": pa.array(jk, pa.int64()),
            "pk": pa.array(np.full(n, -1, dtype="int64"), pa.int64()),
            "side": pa.array(np.full(n, -1, dtype="int64"), pa.int64()),
            "shingles": t["shingles"],
            "jbucket": pa.array((jk.astype("uint64") % nb)
                                .astype("int64"), pa.int64()),
        })

    def attach_blob(g: pd.DataFrame) -> pd.DataFrame:
        blobs = g[g["side"] < 0].drop_duplicates("jk") \
            .set_index("jk")["shingles"]
        refs = g[g["side"] >= 0]
        if len(refs) == 0:
            return pd.DataFrame({"pk": pd.Series([], dtype="int64"),
                                 "side": pd.Series([], dtype="int64"),
                                 "shingles": pd.Series([], dtype="object"),
                                 "pbucket": pd.Series([], dtype="int64")})
        sh = blobs.reindex(refs["jk"]).to_numpy()
        out = pd.DataFrame({"pk": refs["pk"].to_numpy(),
                            "side": refs["side"].to_numpy(),
                            "shingles": sh})
        out["pbucket"] = (out["pk"].to_numpy().astype("uint64")
                          % nb).astype("int64")
        return out

    def verify(g: pd.DataFrame) -> pa.Table:
        # cross-source duplicate pair references collapse here.
        # Arrow-typed output keeps the schema stable on all-empty buckets.
        g = g.drop_duplicates(["pk", "side"])
        piv = g.pivot(index="pk", columns="side", values="shingles")
        n = len(piv)
        if n == 0 or 0 not in piv.columns or 1 not in piv.columns:
            return pa.table({
                "doc_id_a": pa.array([], pa.int64()),
                "doc_id_b": pa.array([], pa.int64()),
                "jaccard": pa.array([], pa.float64())})
        blobs_a, blobs_b = piv[0].to_numpy(), piv[1].to_numpy()
        la = np.fromiter((len(b) for b in blobs_a), dtype="int64",
                         count=n) // 8
        lb = np.fromiter((len(b) for b in blobs_b), dtype="int64",
                         count=n) // 8
        allh = np.frombuffer(b"".join(blobs_a) + b"".join(blobs_b),
                             dtype=_U64)
        gid = np.concatenate([np.repeat(np.arange(n), la),
                              np.repeat(np.arange(n), lb)])
        order = np.lexsort((allh, gid))
        g2, h2 = gid[order], allh[order]
        dup = (g2[1:] == g2[:-1]) & (h2[1:] == h2[:-1])
        inter = np.bincount(g2[1:][dup], minlength=n)
        union = la + lb - inter
        jac = np.divide(inter, union,
                        out=np.zeros(n, dtype="float64"),
                        where=union > 0)
        keep = jac >= threshold
        pk = piv.index.to_numpy()[keep].astype("int64")
        return pa.table({
            "doc_id_a": pa.array((pk >> 32).astype("int64"), pa.int64()),
            "doc_id_b": pa.array((pk & 0xFFFFFFFF).astype("int64"),
                                 pa.int64()),
            "jaccard": pa.array(jac[keep].astype("float64"), pa.float64()),
        })

    sides = cand.map_batches(pair_sides, batch_format="pandas")
    docs = doc_blobs.map_batches(doc_rows, batch_format="pyarrow")
    return sides.union(docs) \
        .groupby("jbucket").map_groups(attach_blob, batch_format="pandas") \
        .groupby("pbucket").map_groups(verify, batch_format="pandas")


_PAIR_CHUNK = 1 << 22  # per-task expansion chunk (~4M pair events ≈
                       # 400 MB of scratch): bounds peak memory per task
                       # so a full-width actor fleet fits the worker heap


def _jaccard_group_size(n_docs: int) -> int:
    """Doc-group count G for the blocked all-pairs join: G(G+1)/2 tasks,
    each holding two groups' shingle rows (~2R/G rows, R ≈ 64·n_docs).
    Sized so a task's rows stay ~1M (vectorized numpy territory) with a
    floor of 8 (task fan-out ≥ 36 keeps a 32-core box busy) and a cap of
    64 (replication factor = G; beyond that exact all-pairs is the wrong
    tool — use minhash_lsh_dedup, which exists for exactly that reason)."""
    est_rows = 64 * max(1, n_docs)
    return int(min(64, max(8, -(-2 * est_rows // 1_000_000))))


def _jaccard_pairs_ds(sf_dir: str, threshold: float = 0.5):
    """Dataset of (doc_id_a < doc_id_b, jaccard ≥ threshold) pairs — the
    uncollected form of ngram_jaccard_pairs, reused by dedup_clusters and
    corpus_filter/curation_pipeline.

    Distributed shape: blocked exact all-pairs (the 1-Bucket-Theta /
    block-replication join). Docs hash into G groups; each doc's shingle
    rows replicate to the G tasks covering its group's pairings, so every
    unordered doc pair (a, b) meets in EXACTLY ONE task — task
    (min(g_a,g_b), max(g_a,g_b)) — with both docs' full shingle sets
    present. The task computes exact |A∩B| for all its co-occurring pairs
    in one vectorized numpy pass (sort by shingle → per-shingle cross
    expansion → bincount on packed pair keys) and emits ONLY pairs that
    clear the threshold.

    Why not an inverted-index pair-count groupby (the r3 shape) or
    PPJoin prefix filtering: the corpus vocabulary is small, so trigram
    document frequency is dense and flat (sf1: 30k distinct shingles,
    ALL with df ≥ 2, mean df ≈ 87) — there are no rare shingles to
    prefix-prune, and emitting one row per co-occurrence shuffles ~120M
    pair partials (measured 341 s at sf1). Block replication ships each
    shingle row G≈8 times ONCE (narrow 32-byte rows, one shuffle) and
    turns the 120M co-occurrence events into in-task memory-bandwidth
    numpy work; nothing pair-shaped is ever shuffled or collected.
    Replication cost is O(R·G) — the documented partitioning assumption;
    at 100-TB corpus sizes exact all-pairs is the wrong op and
    minhash_lsh_dedup is the scale path.

    Jaccard is one IEEE division of two int counts, so value-hash
    comparison vs the SQL oracle is exact.
    """
    docs = _read_docs(sf_dir)
    G = _jaccard_group_size(_doc_count(sf_dir))

    def explode_replicate(t: pa.Table) -> pa.Table:
        # one pass: shingle the text, emit each (doc, sh) row G times
        # tagged with every task id its group participates in
        hs = _doc_shingle_hashes(t["text"].to_pylist())
        lens = np.array([len(h) for h in hs], dtype="int64")
        sh = (np.concatenate(hs).astype("int64") if hs
              else np.array([], dtype="int64"))
        doc_id = np.repeat(t["doc_id"].to_numpy(), lens).astype("int64")
        n_sh = np.repeat(lens, lens)
        g = (doc_id % G)[:, None]
        k = np.arange(G, dtype="int64")[None, :]
        task = (np.minimum(g, k) * G + np.maximum(g, k)).ravel()
        return pa.table({
            "doc_id": pa.array(np.repeat(doc_id, G), pa.int64()),
            "sh": pa.array(np.repeat(sh, G), pa.int64()),
            "n_sh": pa.array(np.repeat(n_sh, G), pa.int64()),
            "task": pa.array(task, pa.int64()),
        })

    empty = pa.table({"doc_id_a": pa.array([], pa.int64()),
                      "doc_id_b": pa.array([], pa.int64()),
                      "jaccard": pa.array([], pa.float64())})

    def count_pairs(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return empty
        i, j = divmod(int(t["task"][0].as_py()), G)
        doc = t["doc_id"].to_numpy()
        sh = t["sh"].to_numpy()
        nsh = t["n_sh"].to_numpy()
        if i == j:
            da_rows = db_rows = np.arange(len(doc))
        else:
            grp = doc % G
            da_rows = np.flatnonzero(grp == i)
            db_rows = np.flatnonzero(grp == j)
        if len(da_rows) == 0 or len(db_rows) == 0:
            return empty
        # sort each side by shingle; run-length match the shared values
        oa = da_rows[np.argsort(sh[da_rows], kind="stable")]
        ob = db_rows[np.argsort(sh[db_rows], kind="stable")]
        sha, shb = sh[oa], sh[ob]
        ua, a_start, ca = np.unique(sha, return_index=True,
                                    return_counts=True)
        ub, b_start, cb = np.unique(shb, return_index=True,
                                    return_counts=True)
        pos = np.searchsorted(ub, ua)
        pos_c = np.minimum(pos, len(ub) - 1)
        m = ub[pos_c] == ua
        ma, mb = np.flatnonzero(m), pos_c[m]
        # per-shared-shingle cross sizes; chunk the expansion so one hot
        # task never materializes more than _PAIR_CHUNK pair events
        tm = ca[ma] * cb[mb]
        bounds = np.searchsorted(np.cumsum(tm), np.arange(
            _PAIR_CHUNK, tm.sum() + _PAIR_CHUNK, _PAIR_CHUNK), side="left")
        parts: list[tuple[np.ndarray, ...]] = []
        lo_m = 0
        for hi_m in np.minimum(bounds + 1, len(tm)):
            if hi_m <= lo_m:
                continue
            s = slice(lo_m, hi_m)
            lo_m = hi_m
            t_s = tm[s]
            total = int(t_s.sum())
            if total == 0:
                continue
            mid = np.repeat(np.arange(len(t_s)), t_s)
            off0 = np.concatenate(([0], np.cumsum(t_s)[:-1]))
            within = np.arange(total) - np.repeat(off0, t_s)
            cbs = cb[mb[s]][mid]
            a_idx = oa[a_start[ma[s]][mid] + within // cbs]
            b_idx = ob[b_start[mb[s]][mid] + within % cbs]
            da, db_ = doc[a_idx], doc[b_idx]
            if i == j:
                keep = da < db_
                da, db_, a_idx, b_idx = (da[keep], db_[keep],
                                         a_idx[keep], b_idx[keep])
            lo_d = np.minimum(da, db_)
            hi_d = np.maximum(da, db_)
            key = _pack_pair(lo_d, hi_d)
            n_lo = np.where(da <= db_, nsh[a_idx], nsh[b_idx])
            n_hi = np.where(da <= db_, nsh[b_idx], nsh[a_idx])
            uk, first, cnt = np.unique(key, return_index=True,
                                       return_counts=True)
            parts.append((uk, cnt.astype("int64"),
                          n_lo[first].astype("int64"),
                          n_hi[first].astype("int64")))
        if not parts:
            return empty
        key = np.concatenate([p[0] for p in parts])
        cnt = np.concatenate([p[1] for p in parts])
        na = np.concatenate([p[2] for p in parts])
        nb_ = np.concatenate([p[3] for p in parts])
        # a pair's count may be split across chunks — final re-aggregate
        uk, first = np.unique(key, return_index=True)
        n_inter = np.zeros(len(uk), dtype="int64")
        np.add.at(n_inter, np.searchsorted(uk, key), cnt)
        na, nb_ = na[first], nb_[first]
        jac = n_inter / (na + nb_ - n_inter)
        keep = jac >= threshold
        uk = uk[keep]
        return pa.table({
            "doc_id_a": pa.array((uk >> 32).astype("int64"), pa.int64()),
            "doc_id_b": pa.array((uk & 0xFFFFFFFF).astype("int64"),
                                 pa.int64()),
            "jaccard": pa.array(jac[keep].astype("float64"), pa.float64()),
        })

    return docs.map_batches(explode_replicate, batch_format="pyarrow") \
        .groupby("task").map_groups(count_pairs, batch_format="pyarrow")


def ngram_jaccard_pairs(sf_dir: str, threshold: float = 0.5):
    """All pairs (doc_id_a < doc_id_b) with trigram-set Jaccard ≥ threshold
    (see _jaccard_pairs_ds for the distributed shape). The pair set is
    data-dependent and unbounded at scale, so the final order is a
    distributed sort — nothing row-shaped collects on the driver."""
    return sorted_or_empty(
        _jaccard_pairs_ds(sf_dir, threshold), ["doc_id_a", "doc_id_b"],
        pa.table({"doc_id_a": pa.array([], pa.int64()),
                  "doc_id_b": pa.array([], pa.int64()),
                  "jaccard": pa.array([], pa.float64())}))


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

    Fully distributed pipeline (nothing row-shaped touches the driver):

    1. sign: one map_batches pass emits per-doc band rows (doc_id,
       band_id, band_hash) with the doc's shingle-hash blob riding on its
       band-0 row only; the signed dataset is materialized ONCE into the
       object store because two consumers (banding, verify-join) read it
       — at 100 TB this is the natural stage boundary you'd persist to
       parquet for resume.
    2. candidates: coarse band-hash-bucket groupby → vectorized pair
       discovery per bucket (dedup within bucket).
    3. verify join (symmetric two-hop): each candidate pair fans out to
       two (join_key=doc_id, pair_key, side) rows, unioned with the
       (join_key=doc_id, shingles) rows; groupby doc-id bucket attaches
       the blob to each referencing side; groupby pair-key bucket brings
       both sides of a pair together (cross-band duplicates collapse
       here) and computes exact Jaccard.

    Output ⊆ the exact pair set (verification removes LSH false
    positives); recall is probabilistic (tested ≥0.8 in pytest).
    """
    seeds = splitmix64(np.arange(1, N_PERM + 1, dtype=_U64) * _U64(0x9E3779B97F4A7C15))

    def sign(t: pa.Table) -> pa.Table:
        rows = {"doc_id": [], "band_id": [], "band_hash": [], "shingles": []}
        for doc_id, text in zip(t["doc_id"].to_pylist(),
                                t["text"].to_pylist()):
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
        return pa.table({
            "doc_id": pa.array(rows["doc_id"], pa.int64()),
            "band_id": pa.array(rows["band_id"], pa.int64()),
            "band_hash": pa.array(rows["band_hash"], pa.int64()),
            "shingles": pa.array(rows["shingles"], pa.binary()),
        })

    signed = _read_docs(sf_dir).map_batches(
        sign, batch_format="pyarrow").materialize()
    # signed rows = docs × N_BANDS exactly; parquet footer metadata gives
    # the doc count for free (no count() pass over the materialized set)
    nb = _U64(_adaptive_buckets(_doc_count(sf_dir) * N_BANDS))

    # ---- stage 2: candidate pairs from band-hash buckets ----
    def band_bucket(t: pa.Table) -> pd.DataFrame:
        df = t.select(["doc_id", "band_id", "band_hash"]).to_pandas()
        df["bucket"] = (df["band_hash"].to_numpy().astype("uint64")
                        % nb).astype("int64")
        return df

    def pairs_of_bucket(g: pd.DataFrame) -> pd.DataFrame:
        m = g.merge(g, on=["band_id", "band_hash"])
        m = m[m["doc_id_x"] < m["doc_id_y"]]
        out = pd.DataFrame({
            "doc_id_a": m["doc_id_x"].astype("int64"),
            "doc_id_b": m["doc_id_y"].astype("int64"),
        }).drop_duplicates()
        return out

    cand = signed.map_batches(band_bucket, batch_format="pyarrow") \
        .groupby("bucket").map_groups(pairs_of_bucket, batch_format="pandas")

    # ---- stage 3: distributed exact-Jaccard verify (shared machinery) ----
    def blob_rows(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        t = t.filter(pc.equal(t["band_id"], 0))
        return pa.table({"doc_id": t["doc_id"], "shingles": t["shingles"]})

    # Distributed final order — the verified pair set is data-dependent
    # and unbounded at 100 TB, so it never collects on the driver
    verified = _verify_pairs_exact(
        cand, signed.map_batches(blob_rows, batch_format="pyarrow"),
        nb, threshold)
    return sorted_or_empty(
        verified, ["doc_id_a", "doc_id_b"],
        pa.table({"doc_id_a": pa.array([], pa.int64()),
                  "doc_id_b": pa.array([], pa.int64()),
                  "jaccard": pa.array([], pa.float64())}))


# --------------------------------------------------------------------------
# SimHash near-dup
# --------------------------------------------------------------------------
def simhash_batch(t: pa.Table) -> pa.Table:
    """64-bit SimHash over token hashes (weight 1 per occurrence).

    Arrow in/out (no pandas round-trip of the text column). The per-doc
    loop here is deliberate: ~75% of the stage is the token hashing
    itself (measured 0.29 s of 0.40 s on 500k tokens), and a whole-batch
    flat vectorization (unpackbits + reduceat over doc boundaries) was
    measured SLOWER (0.51 s) because the (n_tokens × 64) bit-matrix
    traffic exceeds the loop overhead it removes. Per-doc arrays
    amortize numpy fine at ~100 tokens/doc and stay in cache."""
    texts = t["text"].to_pylist()
    sims = np.zeros(len(texts), dtype="int64")
    for i, text in enumerate(texts):
        ws = (text or "").split()
        if not ws:
            continue
        hs = url_hash64_many(ws)
        bits = ((hs[:, None] >> np.arange(64, dtype=_U64)) & _U64(1)).astype(np.int64)
        acc = (2 * bits - 1).sum(axis=0)
        val = int((acc > 0).astype(np.uint64) @ (np.uint64(1) << np.arange(64, dtype=_U64)))
        sims[i] = val - (1 << 64) if val >= (1 << 63) else val
    return pa.table({"doc_id": t["doc_id"],
                     "simhash": pa.array(sims, pa.int64())})


def simhash(sf_dir: str):
    return _read_docs(sf_dir).map_batches(simhash_batch,
                                          batch_format="pyarrow")


def _simhash_segments(max_hamming: int) -> list[tuple[int, int]]:
    """(shift, width) spans of max_hamming+1 disjoint segments covering the
    64-bit hash. Pigeonhole: ≤ max_hamming flipped bits over max_hamming+1
    disjoint segments leave at least one segment untouched → any true pair
    matches exactly on ≥1 segment key, for ANY segment widths. Fewer, wider
    segments (small d) mean exponentially fewer candidate collisions, so
    the segment count adapts to the contract instead of being fixed."""
    n_segs = max_hamming + 1
    if not 1 <= n_segs <= 64:
        raise ValueError(f"max_hamming={max_hamming} out of range [0, 63]")
    base, extra = divmod(64, n_segs)
    spans, shift = [], 0
    for i in range(n_segs):
        w = base + (1 if i < extra else 0)
        spans.append((shift, w))
        shift += w
    return spans


def simhash_neardup_pairs(sims_ds, max_hamming: int = 3,
                          n_rows: int | None = None):
    """Distributed hamming-≤d pairs over a (doc_id, simhash) dataset.

    Blocking: d+1 disjoint pigeonhole segments (see _simhash_segments) —
    the candidate set is COMPLETE for the advertised max_hamming (the
    round-1 4×16 scheme advertised d≤8 but was only complete for d≤3;
    now the blocking always matches the contract). Verification
    (vectorized popcount on the two hashes riding in each candidate row)
    and cross-segment dedup both run inside bucketed map_groups — nothing
    reaches the driver but the result. Candidate volume is ~n²·(d+1)/2^w
    per segment of width w, so tighter contracts are dramatically cheaper;
    d≤3 (4×16-bit segments) is the standard web-dedup operating point.
    """
    spans = _simhash_segments(max_hamming)
    # shuffle width ∝ exploded (d+1 segment rows per doc) input when the
    # caller can tell us the row count; else the 100-TB default
    nb = (np.int64(N_BUCKETS) if n_rows is None
          else _adaptive_buckets(n_rows * len(spans)))

    def explode_segments(df: pd.DataFrame) -> pd.DataFrame:
        h = df["simhash"].to_numpy().astype("uint64")
        ids = df["doc_id"].to_numpy().astype("int64")
        segs = []
        for seg, (shift, width) in enumerate(spans):
            mask = _U64((1 << width) - 1)
            key = ((h >> _U64(shift)) & mask).astype("int64")
            segs.append(pd.DataFrame({
                "seg": np.full(len(h), seg, dtype="int64"),
                "key": key,
                "doc_id": ids,
                "simhash": h.astype("int64"),
            }))
        out = pd.concat(segs, ignore_index=True)
        # bucket on (seg, key) so one Ray group holds many segment cells
        out["bucket"] = ((out["seg"].to_numpy() * 65599 + out["key"].to_numpy())
                         % nb).astype("int64")
        return out

    def seg_pairs(g: pd.DataFrame) -> pd.DataFrame:
        m = g.merge(g, on=["seg", "key"])
        m = m[m["doc_id_x"] < m["doc_id_y"]]
        if len(m) == 0:
            return pd.DataFrame({"pk": pd.Series([], dtype="int64"),
                                 "hamming": pd.Series([], dtype="int64"),
                                 "pbucket": pd.Series([], dtype="int64")})
        m = m.drop_duplicates(["doc_id_x", "doc_id_y"])
        x = m["simhash_x"].to_numpy().astype("uint64") ^ \
            m["simhash_y"].to_numpy().astype("uint64")
        ham = _popcount64(x)
        keep = ham <= max_hamming
        pk = _pack_pair(m["doc_id_x"].to_numpy()[keep],
                        m["doc_id_y"].to_numpy()[keep])
        return pd.DataFrame({
            "pk": pk,
            "hamming": ham[keep],
            "pbucket": (pk.astype("uint64") % _U64(nb)).astype("int64"),
        })

    def dedup_pairs(g: pd.DataFrame) -> pa.Table:
        # Arrow-typed final: schema survives all-empty results
        g = g.drop_duplicates("pk")
        pk = g["pk"].to_numpy()
        return pa.table({
            "doc_id_a": pa.array((pk >> 32).astype("int64"), pa.int64()),
            "doc_id_b": pa.array((pk & 0xFFFFFFFF).astype("int64"),
                                 pa.int64()),
            "hamming": pa.array(g["hamming"].to_numpy().astype("int64"),
                                pa.int64()),
        })

    # Distributed final order (pair set is unbounded at scale)
    pairs = sims_ds.map_batches(explode_segments, batch_format="pandas") \
        .groupby("bucket").map_groups(seg_pairs, batch_format="pandas") \
        .groupby("pbucket").map_groups(dedup_pairs, batch_format="pandas")
    return sorted_or_empty(
        pairs, ["doc_id_a", "doc_id_b"],
        pa.table({"doc_id_a": pa.array([], pa.int64()),
                  "doc_id_b": pa.array([], pa.int64()),
                  "hamming": pa.array([], pa.int64())}))


def simhash_neardup(sf_dir: str, max_hamming: int = 3):
    """Pairs with simhash hamming distance ≤ max_hamming. The blocking is
    pigeonhole-complete for whatever contract is requested (d+1 segments);
    the default d≤3 matches standard web-scale simhash dedup practice."""
    return simhash_neardup_pairs(simhash(sf_dir), max_hamming=max_hamming,
                                 n_rows=_doc_count(sf_dir))


# --------------------------------------------------------------------------
# near-dup cluster resolution: pair graph → connected components
# --------------------------------------------------------------------------
def connected_components(pairs_ds, n_buckets: int | None = None):
    """(doc_id, rep) for every node of a (doc_id_a, doc_id_b) pair Dataset,
    where rep = min doc_id in the node's connected component — the dedup
    DECISION step that turns near-dup pairs into keep/drop clusters.

    Distributed iterative min-label propagation: each round, every node's
    label and its incident edges meet in a bucketed groupby keyed on the
    node; labels flow across edges; a second bucketed groupby takes the
    min per node. Converges in O(component diameter) rounds; the
    path-doubling variant (Hash-to-Min, Rastogi et al. 2013) drops it to
    O(log d) at the cost of label-set blowup and isn't warranted at
    near-dup diameters. Per round the driver sees ONE counter (number of
    labels that changed); labels/edges stay in the object store.

    ``n_buckets`` (the shuffle width of both per-round groupbys) defaults
    to edge-count-proportional: every round pays ~n_buckets fixed task
    cost, so a toy graph must not shuffle at 100-TB width — and a 100-TB
    graph gets a bucket per ~64k edges, which is the right grain for a
    multi-node shuffle. The static edge messages are materialized once
    (not re-derived every round).
    """
    edges = pairs_ds.map_batches(
        lambda df: pd.DataFrame({
            "u": np.concatenate([df["doc_id_a"].to_numpy(),
                                 df["doc_id_b"].to_numpy()]).astype("int64"),
            "v": np.concatenate([df["doc_id_b"].to_numpy(),
                                 df["doc_id_a"].to_numpy()]).astype("int64"),
        }), batch_format="pandas").materialize()
    n_edges = edges.count()
    if n_edges <= SMALL_GRAPH_EDGES:
        # Small-graph fast path: the whole edge list fits one worker's
        # heap (~16 B/edge), so O(diameter) shuffle rounds are pure
        # overhead — run ONE union-find task off-driver instead. The
        # iterative path below is the >4M-edge / multi-node shape.
        def whole_graph_cc(df: pd.DataFrame) -> pd.DataFrame:
            parent: dict[int, int] = {}

            def find(x: int) -> int:
                r = x
                while parent.get(r, r) != r:
                    r = parent[r]
                while parent.get(x, x) != r:  # path compression
                    parent[x], x = r, parent[x]
                return r

            for u, v in zip(df["u"].to_numpy(), df["v"].to_numpy()):
                ru, rv = find(int(u)), find(int(v))
                if ru != rv:
                    # union by min so the root IS the min label
                    lo, hi = (ru, rv) if ru < rv else (rv, ru)
                    parent[hi] = lo
            nodes = np.unique(df["u"].to_numpy())
            return pd.DataFrame({
                "node": nodes.astype("int64"),
                "label": np.array([find(int(n)) for n in nodes],
                                  dtype="int64"),
            })

        return edges.map_batches(
            lambda df: df.assign(one=np.int64(0)), batch_format="pandas") \
            .groupby("one").map_groups(
                lambda g: whole_graph_cc(g), batch_format="pandas") \
            .materialize()

    if n_buckets is None:
        n_buckets = int(min(N_BUCKETS, max(8, n_edges // 65536)))
    N_BUCKETS_CC = np.int64(n_buckets)

    def init_labels(df: pd.DataFrame) -> pd.DataFrame:
        u = np.unique(df["u"].to_numpy())
        return pd.DataFrame({"node": u, "label": u,
                             "bucket": (u % N_BUCKETS_CC).astype("int64")})

    def dedup_nodes(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates("node")
        return g[["node", "label"]]

    labels = edges.map_batches(init_labels, batch_format="pandas") \
        .groupby("bucket").map_groups(dedup_nodes, batch_format="pandas") \
        .materialize()

    def edge_rows(df: pd.DataFrame) -> pd.DataFrame:
        key = df["u"].to_numpy()
        return pd.DataFrame({
            "key": key, "val": df["v"].to_numpy(),
            "kind": np.ones(len(df), dtype="int64"),
            "bucket": (key % N_BUCKETS_CC).astype("int64"),
        })

    def label_rows(df: pd.DataFrame) -> pd.DataFrame:
        key = df["node"].to_numpy()
        return pd.DataFrame({
            "key": key, "val": df["label"].to_numpy(),
            "kind": np.zeros(len(df), dtype="int64"),
            "bucket": (key % N_BUCKETS_CC).astype("int64"),
        })

    def propagate(g: pd.DataFrame) -> pd.DataFrame:
        lab = g[g["kind"] == 0].drop_duplicates("key").set_index("key")["val"]
        e = g[g["kind"] == 1]
        lu = lab.reindex(e["key"]).to_numpy()  # label of each edge's source
        node = np.concatenate([e["val"].to_numpy(), lab.index.to_numpy()])
        label = np.concatenate([lu, lab.to_numpy()])
        # the self row carries the node's previous label so the reducer can
        # count changes; message rows carry -1 there
        old = np.concatenate([np.full(len(e), -1, dtype="int64"),
                              lab.to_numpy()])
        return pd.DataFrame({
            "node": node.astype("int64"), "label": label.astype("int64"),
            "old": old,
            "nbucket": (node % N_BUCKETS_CC).astype("int64"),
        })

    def reduce_min(g: pd.DataFrame) -> pd.DataFrame:
        agg = g.groupby("node", as_index=False).agg(
            label=("label", "min"), old=("old", "max"))
        return pd.DataFrame({
            "node": agg["node"].astype("int64"),
            "label": agg["label"].astype("int64"),
            "changed": (agg["label"] != agg["old"]).astype("int64"),
        })

    edge_msgs = edges.map_batches(edge_rows, batch_format="pandas") \
        .materialize()  # static across rounds — derive once
    while True:
        lab_msgs = labels.map_batches(label_rows, batch_format="pandas")
        new_labels = lab_msgs.union(edge_msgs) \
            .groupby("bucket").map_groups(propagate, batch_format="pandas") \
            .groupby("nbucket").map_groups(reduce_min, batch_format="pandas") \
            .materialize()
        n_changed = new_labels.sum("changed")
        labels = new_labels.drop_columns(["changed"]).materialize()
        if not n_changed:
            break
    return labels


def dedup_clusters(sf_dir: str, threshold: float = 0.5):
    """(doc_id, rep) cluster assignment over the exact-Jaccard near-dup
    pair graph: rep = min doc_id of the connected component (the kept
    representative; every other member is a drop candidate). Only docs
    that appear in ≥1 pair are emitted — singletons are trivially their
    own rep and would dominate the output without informing dedup."""
    labels = connected_components(_jaccard_pairs_ds(sf_dir, threshold))

    def rename(t: pa.Table) -> pa.Table:
        # typed-Arrow final (schema survives the zero-pair case, where
        # the empty groupby upstream yields schema-less blocks) + the
        # final order is a distributed sort — the label set is
        # corpus-sized, so it never collects on the driver
        if t.num_rows == 0 or "node" not in t.column_names:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "rep": pa.array([], pa.int64())})
        return pa.table({"doc_id": t["node"].cast(pa.int64()),
                         "rep": t["label"].cast(pa.int64())})

    return sorted_or_empty(
        labels.map_batches(rename, batch_format="pyarrow"), "doc_id",
        pa.table({"doc_id": pa.array([], pa.int64()),
                  "rep": pa.array([], pa.int64())}))


DEDUP_CLUSTERS_SQL = """
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
  UNION ALL
  SELECT db, da FROM pairs
), reach(node, lab) AS (
  SELECT u, u FROM edges
  UNION
  SELECT e.v, r.lab FROM reach r JOIN edges e ON e.u = r.node
)
SELECT node AS doc_id, min(lab) AS rep FROM reach GROUP BY node
"""


# --------------------------------------------------------------------------
# Exact-substring dedup (duplicated-span removal)
# --------------------------------------------------------------------------
SUBSTR_W = 8  # window width in whitespace tokens


def _window_keys(tokens: list[str], mult: np.ndarray) -> np.ndarray:
    """64-bit key per w-token window: per-token hash once, then a
    position-weighted linear combine over a sliding view (the vectorized
    stand-in for re-hashing every window string; order-sensitive)."""
    w = len(mult)
    th = url_hash64_many(tokens)
    if len(th) < w:
        return np.empty(0, dtype=_U64)
    wv = np.lib.stride_tricks.sliding_window_view(th, w)
    return splitmix64((wv * mult[None, :]).sum(axis=1, dtype=_U64))


def substring_dedup(sf_dir: str, w: int = SUBSTR_W):
    """ExactSubstr-style duplicated-span removal (the windowed form of
    Lee et al. 2021, "Deduplicating Training Data Makes Language Models
    Better"): a w-token window is *duplicated* when its exact token
    sequence occurs in ≥2 distinct documents; every token covered by any
    duplicated window is removed from every document. Output one row per
    document: (doc_id, n_tokens, n_removed, clean_text).

    Distributed shape (nothing row-shaped on the driver):
      1. map_batches: tokenize, hash each w-token window (vectorized
         sliding combine over per-token hashes — the batch analog of a
         suffix-array scan), emit (wkey, doc_id, pos) rows bucketed by
         wkey. At 100 TB this is the one token-width shuffle; stride>1
         plus a first-pass bloom on wkey are the documented thinning
         knobs, full fidelity here.
      2. groupby wkey-bucket: all rows of one window key land together,
         so dup detection (≥2 distinct docs) AND the semi-join back to
         (doc_id, pos) happen inside one map_groups — no second join.
      3. union with the docs table, groupby doc-bucket: per doc, expand
         start positions to a coverage mask (difference-array cumsum)
         and rebuild the cleaned text.

    Window equality is by 64-bit hash (collision odds ~n²/2⁶⁵); the SQL
    oracle compares exact window strings — identical semantics modulo
    that negligible collision risk.
    """
    mult = splitmix64(np.arange(1, w + 1, dtype=_U64)
                      * _U64(0x9E3779B97F4A7C15))
    n_docs = _doc_count(sf_dir)
    # window rows ≈ docs × tokens/doc (~60 for the corpus shape)
    nb = _U64(_adaptive_buckets(n_docs * 64))
    nd = _U64(_adaptive_buckets(n_docs))

    def wins_of(t: pa.Table) -> pa.Table:
        ids, poss, keys = [], [], []
        for doc_id, text in zip(t["doc_id"].to_pylist(),
                                t["text"].to_pylist()):
            wk = _window_keys((text or "").split(), mult)
            if len(wk) == 0:
                continue
            ids.append(np.full(len(wk), doc_id, dtype="int64"))
            poss.append(np.arange(len(wk), dtype="int64"))
            keys.append(wk)
        if not ids:
            return pa.table({"wkey": pa.array([], pa.int64()),
                             "doc_id": pa.array([], pa.int64()),
                             "pos": pa.array([], pa.int64()),
                             "wbucket": pa.array([], pa.int64())})
        wk = np.concatenate(keys)
        return pa.table({
            "wkey": pa.array(wk.astype("int64"), pa.int64()),
            "doc_id": pa.array(np.concatenate(ids), pa.int64()),
            "pos": pa.array(np.concatenate(poss), pa.int64()),
            "wbucket": pa.array((wk % nb).astype("int64"), pa.int64()),
        })

    def dup_starts(g: pd.DataFrame) -> pa.Table:
        # Arrow-typed output: the downstream union with the Arrow doc_side
        # stream must be block-type homogeneous for Ray's shuffle sampler
        ndist = g.groupby("wkey")["doc_id"].transform("nunique")
        hit = g[ndist.to_numpy() > 1]
        ids = hit["doc_id"].to_numpy().astype("int64")
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "pos": pa.array(hit["pos"].to_numpy().astype("int64"),
                            pa.int64()),
            "text": pa.array([""] * len(hit), pa.string()),
            "dbucket": pa.array((ids.astype("uint64") % nd).astype("int64"),
                                pa.int64()),
        })

    def doc_side(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        doc_id = t["doc_id"].to_numpy()
        return pa.table({
            "doc_id": pa.array(doc_id, pa.int64()),
            "pos": pa.array(np.full(len(doc_id), -1, dtype="int64"),
                            pa.int64()),
            "text": pc.coalesce(
                t["text"].combine_chunks()
                if isinstance(t["text"], pa.ChunkedArray) else t["text"],
                pa.scalar("", pa.string())),
            "dbucket": pa.array((doc_id.astype("uint64")
                                 % nd).astype("int64"), pa.int64()),
        })

    def rebuild(g: pd.DataFrame) -> pd.DataFrame:
        texts = g[g["pos"] < 0]
        starts = g[g["pos"] >= 0].groupby("doc_id")["pos"].apply(np.asarray)
        out = {"doc_id": [], "n_tokens": [], "n_removed": [],
               "clean_text": []}
        for doc_id, text in zip(texts["doc_id"], texts["text"]):
            toks = text.split()
            n = len(toks)
            s = starts.get(doc_id)
            if s is None or n == 0:
                out["doc_id"].append(doc_id)
                out["n_tokens"].append(n)
                out["n_removed"].append(0)
                out["clean_text"].append(" ".join(toks))
                continue
            diff = np.zeros(n + 1, dtype="int64")
            diff[s] += 1
            diff[np.minimum(s + w, n)] -= 1
            covered = np.cumsum(diff[:n]) > 0
            kept = [t for t, c in zip(toks, covered) if not c]
            out["doc_id"].append(doc_id)
            out["n_tokens"].append(n)
            out["n_removed"].append(int(covered.sum()))
            out["clean_text"].append(" ".join(kept))
        return pd.DataFrame({
            "doc_id": pd.Series(out["doc_id"], dtype="int64"),
            "n_tokens": pd.Series(out["n_tokens"], dtype="int64"),
            "n_removed": pd.Series(out["n_removed"], dtype="int64"),
            "clean_text": pd.Series(out["clean_text"], dtype="object"),
        })

    docs = _read_docs(sf_dir)
    dup = docs.map_batches(wins_of, batch_format="pyarrow") \
        .groupby("wbucket").map_groups(dup_starts, batch_format="pandas")
    sides = docs.map_batches(doc_side, batch_format="pyarrow")
    return sides.union(dup) \
        .groupby("dbucket").map_groups(rebuild, batch_format="pandas")


SUBSTRING_DEDUP_SQL = """
WITH arrs AS (
  SELECT doc_id, list_filter(regexp_split_to_array(text, '\\s+'),
                             x -> x <> '') AS tl
  FROM documents
),
wins AS (
  SELECT doc_id, i AS pos, array_to_string(tl[i:i+7], ' ') AS win
  FROM arrs, unnest(range(1, len(tl) - 8 + 2)) AS t(i)
),
dupstarts AS (
  SELECT doc_id, list(pos) AS starts
  FROM wins
  WHERE win IN (SELECT win FROM wins
                GROUP BY win HAVING count(DISTINCT doc_id) > 1)
  GROUP BY doc_id
)
SELECT a.doc_id,
       len(a.tl) AS n_tokens,
       coalesce(len(list_filter(range(1, len(a.tl) + 1),
         i -> len(list_filter(coalesce(d.starts, []),
                  s -> s BETWEEN i - 7 AND i)) > 0)), 0) AS n_removed,
       coalesce(array_to_string(list_transform(
         list_filter(range(1, len(a.tl) + 1),
           i -> len(list_filter(coalesce(d.starts, []),
                    s -> s BETWEEN i - 7 AND i)) = 0),
         i -> a.tl[i]), ' '), '') AS clean_text
FROM arrs a LEFT JOIN dupstarts d USING (doc_id)
"""


# --------------------------------------------------------------------------
# Edit-distance similarity join (SymSpell-style deletion-neighborhood
# blocking): all distinct part-name pairs within Levenshtein distance 1.
# The string analog of the banded near-dup family above — candidates come
# from a blocking key, never from all-pairs, and exact verification runs
# inside the candidate buckets.
# --------------------------------------------------------------------------
def _lev_le1(a: str, b: str) -> bool:
    """Exact Levenshtein(a, b) <= 1 in O(len) — threshold-1 never needs
    the DP matrix: equal lengths allow one substitution, a length gap of
    one allows one insertion/deletion at the first mismatch."""
    la, lb = len(a), len(b)
    if la == lb:
        return sum(x != y for x, y in zip(a, b)) <= 1
    if abs(la - lb) > 1:
        return False
    if la > lb:
        a, b, la = b, a, lb
    i = 0
    while i < la and a[i] == b[i]:
        i += 1
    return a[i:] == b[i + 1:]


def editdist_pairs(sf_dir: str):
    """All DISTINCT p_name pairs (name_a < name_b) with Levenshtein
    distance <= 1, via deletion-neighborhood blocking: every name emits
    a key for itself and for each single-character deletion; two strings
    within distance 1 ALWAYS share a key (equal -> the string itself;
    one deletion apart -> the shorter string; one substitution apart ->
    the common deletion at the differing position), so blocking loses no
    pairs and exact `_lev_le1` inside each key group removes every hash
    /block false positive.

    Distributed shape: per-batch local distinct + key explode (narrow
    int64 hash + name rows), groupby coarse key-bucket -> candidate
    pairs per exact key, then a second bucketed groupby dedups pairs
    that shared several keys. Group sizes are bounded by the number of
    strings sharing a deletion variant — for natural-language names this
    is a handful, never the corpus (the same bounded-bucket assumption
    minhash bands rely on).
    """
    nb = np.int64(N_BUCKETS)

    def explode(t: pa.Table) -> pa.Table:
        names = np.unique(np.asarray(t["p_name"].to_pylist(), dtype=object))
        keys, owners = [], []
        for s in names:
            vars_ = [s] + [s[:i] + s[i + 1:] for i in range(len(s))]
            keys.extend(vars_)
            owners.extend([s] * len(vars_))
        kh = url_hash64_many(keys).astype("int64")
        return pa.table({
            "kh": pa.array(kh, pa.int64()),
            "name": pa.array(owners, pa.string()),
            "bucket": pa.array((kh.astype("uint64") % _U64(nb))
                               .astype("int64")),
        })

    def key_pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(["kh", "name"])
        m = g.merge(g, on="kh")
        m = m[m["name_x"] < m["name_y"]].drop_duplicates(
            ["name_x", "name_y"])
        keep = [_lev_le1(a, b)
                for a, b in zip(m["name_x"], m["name_y"])]
        m = m[np.array(keep, dtype=bool)] if len(m) else m
        ph = url_hash64_many(
            (m["name_x"] + "\x00" + m["name_y"]).tolist()).astype("int64")
        return pd.DataFrame({"name_a": m["name_x"].to_numpy(),
                             "name_b": m["name_y"].to_numpy(),
                             "pb": (ph.astype("uint64") % _U64(nb))
                             .astype("int64")})

    def dedup_pair(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates(["name_a", "name_b"])[["name_a", "name_b"]]

    pairs = rd.read_parquet(f"{sf_dir}/part.parquet", columns=["p_name"]) \
        .map_batches(explode, batch_format="pyarrow") \
        .groupby("bucket").map_groups(key_pairs, batch_format="pandas") \
        .groupby("pb").map_groups(dedup_pair, batch_format="pandas")
    return sorted_or_empty(
        pairs, ["name_a", "name_b"],
        pa.table({"name_a": pa.array([], pa.string()),
                  "name_b": pa.array([], pa.string())}))


EDITDIST_PAIRS_SQL = """
WITH names AS (SELECT DISTINCT p_name FROM part)
SELECT a.p_name AS name_a, b.p_name AS name_b
FROM names a JOIN names b ON a.p_name < b.p_name
WHERE levenshtein(a.p_name, b.p_name) <= 1
"""


def cdc_image_dedup(sf_dir: str):
    """(image_id, has_chunks, all_chunks_shared) — content-defined
    chunking dedup over the derived image BYTES (gear rolling hash,
    FastCDC cut discipline, functions/cdc.py): every payload is chunked,
    chunk hashes are exploded to (doc, chunk) rows, one chunk-hash
    groupby marks chunks present in ≥2 distinct docs, and a doc-side
    groupby folds that to all_chunks_shared. Byte-identical payloads
    share ALL their chunks, so the oracle predicts all_chunks_shared
    exactly from the corpus content-identity rule (group size ≥ 2);
    unique payloads are compressed pixel streams, which cannot share a
    ≥256-byte run with a different image. Offset-robustness (the reason
    CDC beats fixed blocking) is pinned in tests/test_cdc.py."""
    from ..functions.cdc import chunk_hashes
    from .flagship import derive_images_batch

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    ds = ds.map_batches(derive_images_batch, batch_format="pyarrow",
                        batch_size=256)

    def explode(t: pa.Table) -> pa.Table:
        dids, chunks = [], []
        for d, blob in zip(t["doc_id"].to_pylist(),
                           t["content"].to_pylist()):
            hs = chunk_hashes(bytes(blob))
            dids.extend([d] * len(hs))
            chunks.extend(hs)
        return pa.table({"doc_id": pa.array(dids, pa.int64()),
                         "chunk": pa.array(chunks, pa.int64())})

    pairs = ds.map_batches(explode, batch_format="pyarrow",
                           batch_size=128)

    def mark_shared(g):
        return g.assign(shared=g["doc_id"].nunique() >= 2)

    marked = pairs.groupby("chunk").map_groups(mark_shared,
                                               batch_format="pandas")

    def fold_doc(g):
        import pandas as pd
        return pd.DataFrame({
            "image_id": [f"http://img.test/d/{int(g['doc_id'].iloc[0])}"],
            "has_chunks": [len(g) > 0],
            "all_chunks_shared": [bool(g["shared"].all())],
        })

    return marked.groupby("doc_id").map_groups(fold_doc,
                                               batch_format="pandas")


def _cdc_image_dedup_sql() -> str:
    from .flagship import DUP_EVERY, DUP_GROUPS
    return f"""
WITH g AS (
  SELECT doc_id,
         CASE WHEN doc_id % {DUP_EVERY} = 0
              THEN 'dup:' || CAST(doc_id % {DUP_GROUPS} AS VARCHAR)
              ELSE 'txt:' || coalesce(text, '') END AS ckey
  FROM documents),
m AS (SELECT ckey, count(*) AS n FROM g GROUP BY ckey)
SELECT 'http://img.test/d/' || CAST(g.doc_id AS VARCHAR) AS image_id,
       TRUE AS has_chunks,
       m.n >= 2 AS all_chunks_shared
FROM g JOIN m USING (ckey)
"""


CDC_IMAGE_DEDUP_SQL = _cdc_image_dedup_sql()
