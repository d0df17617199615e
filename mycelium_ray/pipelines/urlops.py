"""Crawl-operator queries expressed over the testdata tables.

The driver's correctness gate runs over ``/root/testdata`` parquet, which
has no URL column — so these operators first DERIVE a deterministic URL per
document row (mixed case, dot segments, %-escapes — the constructions the
canonicalizer must fix), then apply the real crawl operators (urlcanon,
robots, hashing, frontier). The oracle SQL computes the expected output of
the same construction independently with string ops, making these
full-value-checked, not rows-only.

URL construction per doc row::

    HTTP://Src{K}.Example.COM/docs/../d/{doc_id}/%61sset.png
      where K = substr(source, 4)  (source = 'src{K}')

canonical form: http://src{K}.example.com/d/{doc_id}/asset.png
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data as rd

from ..frontier import UrlClassifier, FrontierEmpty
from ..hashing import shard_of, url_hash64_many
from ..robots import Robots
from ..stages.canonicalize import canonicalize_batch

N_SHARDS = 8


def _derive_urls(df: pd.DataFrame) -> pd.Series:
    k = df["source"].str.slice(3)
    return ("HTTP://Src" + k + ".Example.COM/docs/../d/"
            + df["doc_id"].astype(str) + "/%61sset.png")


def url_canonicalize(sf_dir: str):
    """(doc_id, canon_url, host) — the M1-M5 canonicalizer over derived
    URLs, full oracle-checked."""
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "source"])

    def run(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        urls = pa.table({"doc_id": pa.array(df["doc_id"], pa.int64()),
                         "url": pa.array(_derive_urls(df), pa.string())})
        out = canonicalize_batch(urls)
        return out.select(["doc_id", "canon_url", "host"])

    return ds.map_batches(run, batch_format="pyarrow")


URL_CANONICALIZE_SQL = """
SELECT doc_id,
       'http://src' || substr(source, 4) || '.example.com/d/'
         || CAST(doc_id AS VARCHAR) || '/asset.png' AS canon_url,
       'src' || substr(source, 4) || '.example.com' AS host
FROM documents
"""


def url_shard(sf_dir: str):
    """(doc_id, url_hash64 (int64 2s-complement), shard) — the seen-set /
    partition routing columns. sha1-based, not SQL-expressible → rows-only
    oracle; determinism covered by unit tests."""
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "source"])

    def run(df: pd.DataFrame) -> pd.DataFrame:
        k = df["source"].str.slice(3)
        canon = ("http://src" + k + ".example.com/d/"
                 + df["doc_id"].astype(str) + "/asset.png")
        h = url_hash64_many(canon.tolist())
        return pd.DataFrame({
            "doc_id": df["doc_id"],
            "url_hash": h.astype("int64"),
            "shard": shard_of(h, N_SHARDS),
        })

    return ds.map_batches(run, batch_format="pandas")


# robots policy per source: k % 3 == 0 → no robots (all allowed)
#                           k % 3 == 1 → Disallow /d/  (private docs blocked)
#                           k % 3 == 2 → Allow /d/ even ids … via pattern:
#                                        Disallow /d/ paths of odd doc_id?
# Keep it SQL-expressible: kind 2 disallows nothing but has crawl-delay.
_ROBOTS_BODIES = {
    1: "User-agent: *\nDisallow: /d/\n",
    2: "User-agent: *\nCrawl-delay: 2\nDisallow: /private/\n",
}


def robots_filter(sf_dir: str):
    """(doc_id, allowed) — the M9/M10 robots gate over derived URLs, with a
    per-source robots policy. Robots parsing/matching runs the REAL parser;
    the oracle recomputes the expected boolean arithmetically."""
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "source"])

    class RobotsGate:
        def __init__(self):
            self.cache: dict[int, Robots | None] = {}
            for kind, body in _ROBOTS_BODIES.items():
                self.cache[kind] = Robots(body)
            self.cache[0] = None  # no robots → allowed

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            kind = (df["source"].str.slice(3).astype(int) % 3).to_numpy()
            path = "/d/" + df["doc_id"].astype(str) + "/asset.png"
            allowed = np.ones(len(df), dtype=bool)
            # group by robots kind, one vectorized matcher call per group
            for kd in np.unique(kind):
                r = self.cache[int(kd)]
                if r is None:
                    continue
                m = kind == kd
                allowed[m] = r.path_allowed_many("*", path[m])
            return pd.DataFrame({"doc_id": df["doc_id"], "allowed": allowed})

    # Pool sized to the cluster: the actor state is a 3-entry immutable
    # robots cache (cheap to replicate), so the gate must never be the
    # narrow stage — scale the pool with CPUs instead of a fixed width.
    try:
        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        cpus = 8
    return ds.map_batches(RobotsGate, batch_format="pandas",
                          concurrency=(1, max(2, cpus)))


ROBOTS_FILTER_SQL = """
SELECT doc_id,
       (CAST(substr(source, 4) AS INT) % 3) <> 1 AS allowed
FROM documents
"""


def frontier_order(sf_dir: str, n_queues: int = 4):
    """(pos, doc_id) — global drain order of the reference frontier
    (Url_classifier semantics) over the derived URLs fed in doc_id order,
    drained round-robin over n_queues. Stateful by nature → rows-only
    oracle; exact semantics are pinned by tests/test_frontier.py.

    The replay is inherently sequential (one classifier, global order),
    so it runs in ONE remote task — the driver never materializes the
    input table, only the (pos, doc_id) result it is asked for."""
    import ray
    return ray.get(_frontier_order_task.remote(sf_dir, n_queues))


import ray as _ray


@_ray.remote
def _frontier_order_task(sf_dir: str, n_queues: int) -> pa.Table:
    import pyarrow.parquet as pq
    t = pq.read_table(f"{sf_dir}/documents.parquet",
                      columns=["doc_id", "source"]).sort_by("doc_id")
    df = t.to_pandas()
    k = df["source"].str.slice(3)
    hosts = ("src" + k + ".example.com").tolist()
    ids = df["doc_id"].tolist()
    c = UrlClassifier(n_queues)
    for h, d in zip(hosts, ids):
        c.push(h, d)
    pos_col, id_col = [], []
    pos = 0
    while not c.empty():
        progressed = False
        for n in range(n_queues):
            try:
                _, payload = c.peek(n)
                c.pop(n)
            except FrontierEmpty:
                continue
            pos_col.append(pos)
            id_col.append(payload)
            pos += 1
            progressed = True
        if not progressed:
            break
    return pa.table({"pos": pa.array(pos_col, pa.int64()),
                     "doc_id": pa.array(id_col, pa.int64())})


# --------------------------------------------------------------------------
# anchor_text_agg: per-target anchor-text aggregation — the classic IR
# signal built from the reference's link extractor (HTML_lexer.cc
# op_a_c / link records \x01 url \x02 txt \x03, HTML_lexer.cc:802-832):
# every page's outlinks are parsed by the REAL lexer (entity handling,
# rel=nofollow drop) and aggregated per link TARGET.
#
# The HTML corpus is derived from documents by integer arithmetic
# (targets, fan-out, the nofollow plant), so the SQL dual is exact while
# the parse work is real. Shuffle shape: per-batch pyarrow group_by
# partials, then ONE groupby on dst_doc — rows ∝ distinct targets.
# --------------------------------------------------------------------------
_LINK_KNUTH = 2654435761


def anchor_text_agg(sf_dir: str):
    """(dst_doc, n_inlinks, anchor) — inlink count and anchor text per
    link target over a derived HTML corpus. Each doc's page carries
    1 + K%3 followable links (anchor 'doc &amp; link {t}' — the entity
    exercises M17 unescaping) plus one rel=nofollow link the lexer must
    drop (M12 semantics)."""
    import pyarrow.parquet as pq

    from ..functions.htmlparse import extract_links_batch

    n_docs = pq.ParquetFile(
        f"{sf_dir}/documents.parquet").metadata.num_rows
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id"])

    def derive(batch: pa.Table) -> pa.Table:
        urls, pages = [], []
        for d in batch["doc_id"].to_pylist():
            k = (d * _LINK_KNUTH) % (1 << 32)
            parts = [f"<html><head><title>doc {d}</title></head>"
                     f"<body><p>Index page of doc {d}.</p>"]
            for j in range(1 + k % 3):
                t = (d * 3 + 5 * j + 1) % n_docs
                parts.append(f'<a href="http://site.test/d/{t}">'
                             f"doc &amp; link {t}</a>")
            nf = (d * 3 + 11) % n_docs
            parts.append(f'<a rel="nofollow" '
                         f'href="http://site.test/d/{nf}">sponsored</a>')
            parts.append("</body></html>")
            urls.append(f"http://site.test/d/{d}")
            pages.append("".join(parts))
        return pa.table({"url": pa.array(urls, pa.string()),
                         "content": pa.array(pages, pa.string())})

    links = ds.map_batches(derive, batch_format="pyarrow",
                           batch_size=256) \
        .map_batches(extract_links_batch, batch_format="pyarrow")

    def partial(t: pa.Table) -> pa.Table:
        dst = pa.array([int(u.rsplit("/", 1)[1])
                        for u in t["dst_url"].to_pylist()], pa.int64())
        g = (pa.table({"dst_doc": dst, "anchor": t["anchor_text"]})
             .group_by("dst_doc")
             .aggregate([("dst_doc", "count"), ("anchor", "min")]))
        return g.rename_columns(["dst_doc", "n", "anchor"])

    agg = links.map_batches(partial, batch_format="pyarrow")

    def final(g: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        return pa.table({
            "dst_doc": g["dst_doc"][:1],
            "n_inlinks": pa.array([pc.sum(g["n"]).as_py()], pa.int64()),
            "anchor": pa.array([pc.min_max(g["anchor"])["min"].as_py()],
                               pa.string()),
        })

    return agg.groupby("dst_doc") \
        .map_groups(final, batch_format="pyarrow").sort("dst_doc")


ANCHOR_TEXT_AGG_SQL = f"""
WITH n AS (SELECT count(*) AS nd FROM documents),
d AS (
  SELECT doc_id, (doc_id * {_LINK_KNUTH}) % {1 << 32} AS k
  FROM documents
),
l AS (
  SELECT doc_id,
         unnest(generate_series(0, CAST(1 + k % 3 AS BIGINT) - 1)) AS j
  FROM d
),
t AS (
  SELECT (l.doc_id * 3 + 5 * l.j + 1) % n.nd AS dst_doc FROM l, n
)
SELECT CAST(dst_doc AS BIGINT) AS dst_doc,
       CAST(count(*) AS BIGINT) AS n_inlinks,
       'doc & link ' || CAST(dst_doc AS VARCHAR) AS anchor
FROM t
GROUP BY dst_doc
ORDER BY dst_doc
"""


# --------------------------------------------------------------------------
# Sitemap ingestion: the per-host /sitemap.xml discovery surface
# (sitemaps.org protocol) feeding the frontier — the XML dual of the
# HTML-link discovery path (M12/M15).
# --------------------------------------------------------------------------

def sitemap_ingest(sf_dir: str):
    """(doc_id, host, canon_url, lastmod, priority) — per-host sitemap
    XML parsed by the real sitemap parser, locs canonicalized by the
    real canonicalizer, doc identity recovered FROM the parsed+canonical
    loc (the parse is load-bearing; nothing is carried around it).

    Corpus derivation: each source is a host whose urlset lists that
    host's docs as RAW un-canonical locs (mixed case, dot segments,
    %-escapes — the url_canonicalize construction), lastmod/priority
    derived from doc_id by integer rules the SQL oracle mirrors.

    Scale story: one build+parse task per host via groupby(source) —
    sitemap files are per-host artifacts, so host is the natural
    partition key (the same key the frontier and robots cache shard
    by); a 10^10-URL frontier is more hosts and bigger urlsets, never a
    driver-side loop. A malformed sitemap fails its host's task only.
    """
    import datetime

    from ..sitemap import build_urlset, build_urlset_gz, parse_sitemap_auto

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "source"])
    base = datetime.date(1995, 1, 1)

    def build_and_parse(g: pd.DataFrame) -> pa.Table:
        k = g["source"].iloc[0][3:]
        host = f"src{k}.example.com"
        entries = []
        for d in g["doc_id"].tolist():
            raw = (f"HTTP://Src{k}.Example.COM/docs/../d/{d}/%61sset.png")
            lastmod = (base + datetime.timedelta(days=d % 365)).isoformat()
            entries.append((raw, lastmod, (d % 10 + 1) / 10))
        # half the hosts publish sitemap.xml.gz (sniffed by magic on
        # the parse side) — same parsed records, so the oracle is
        # wire-format-independent, as it should be
        wire = (build_urlset_gz(entries) if len(k) % 2 == 0 or k[-1] in
                "02468" else build_urlset(entries))
        kind, recs = parse_sitemap_auto(wire)
        assert kind == "urlset"
        locs = pa.table({"url": pa.array([r["loc"] for r in recs],
                                         pa.string())})
        canon = canonicalize_batch(locs)
        ids = [int(u.rsplit("/", 2)[-2])
               for u in canon["canon_url"].to_pylist()]
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "host": canon["host"],
            "canon_url": canon["canon_url"],
            "lastmod": pa.array([r["lastmod"] for r in recs], pa.string()),
            "priority": pa.array([r["priority"] for r in recs],
                                 pa.float64()),
        })

    return ds.groupby("source").map_groups(build_and_parse,
                                           batch_format="pandas")


SITEMAP_INGEST_SQL = """
SELECT doc_id,
       'src' || substr(source, 4) || '.example.com' AS host,
       'http://src' || substr(source, 4) || '.example.com/d/'
         || CAST(doc_id AS VARCHAR) || '/asset.png' AS canon_url,
       strftime(DATE '1995-01-01' + INTERVAL (doc_id % 365) DAY,
                '%Y-%m-%d') AS lastmod,
       CAST((doc_id % 10) + 1 AS DOUBLE) / 10.0 AS priority
FROM documents
"""


def recrawl_schedule(sf_dir: str):
    """(doc_id, canon_url, due) — the recrawl planner: compare each
    sitemap entry's ``lastmod`` against the store's last-fetch date and
    mark stale URLs due for refetch (the planning-level dual of the T6
    If-Modified-Since revalidation the fetch path does per request —
    crawler.cc sends the conditional GET; this op decides WHO gets one).

    Inputs: the parsed sitemap feed (sitemap_ingest — real XML parse +
    canonicalizer) joined against a derived last-fetch column (fetch
    date = 1995-01-01 + (doc_id*7 % 365) days, an integer rule the SQL
    oracle mirrors). Both sides key on doc_id and the comparison is
    map-side within the sitemap rows (the fetch date derives from the
    same key), so the op is one streaming pass — at 10^10 URLs the real
    store probe is the same per-batch lookup the URL-seen set already
    does (state/urlseen.py), sharded by url hash, never a driver loop.
    """
    import pyarrow.compute as pc

    sm = sitemap_ingest(sf_dir)

    def plan(t: pa.Table) -> pa.Table:
        ids = t["doc_id"]
        # derived store column: last fetch date per URL
        day = pc.cast(
            pc.subtract(pc.multiply(ids, 7),
                        pc.multiply(pc.divide(pc.multiply(ids, 7), 365),
                                    365)), pa.int64())
        base = pa.scalar(9131, pa.int64())  # days(1995-01-01 - epoch)
        fetched_days = pc.add(base, day)
        # parsed lastmod -> days-since-epoch (date32 storage is that int)
        lastmod_days = pc.cast(pc.cast(
            pc.cast(pc.strptime(t["lastmod"], format="%Y-%m-%d", unit="s"),
                    pa.date32()), pa.int32()), pa.int64())
        due = pc.greater(lastmod_days, fetched_days)
        return pa.table({"doc_id": ids,
                         "canon_url": t["canon_url"],
                         "due": due})

    return sm.map_batches(plan, batch_format="pyarrow")


RECRAWL_SCHEDULE_SQL = """
SELECT doc_id,
       'http://src' || substr(source, 4) || '.example.com/d/'
         || CAST(doc_id AS VARCHAR) || '/asset.png' AS canon_url,
       (DATE '1995-01-01' + INTERVAL (doc_id % 365) DAY)
         > (DATE '1995-01-01' + INTERVAL ((doc_id * 7) % 365) DAY) AS due
FROM documents
"""


# --------------------------------------------------------------------------
# crawl_delta: incremental-crawl snapshot diff over the versioned
# TableStore — the change-detection pass every recrawl cycle runs
# between its previous and current fetched tables.
# --------------------------------------------------------------------------

def _delta_snapshot(sf_dir: str, version: int):
    """Derived fetched-table snapshot v1/v2: content hash per URL, with
    deterministic drift between versions (doc_id%13==0 absent from v1
    => NEW in v2; doc_id%11==0 absent from v2 => GONE; doc_id%7==0
    carries different bytes in v2 => CHANGED). The hash is computed
    from the actual content string — the delta op compares HASHES, the
    integer rules exist only so the SQL oracle can mirror the result."""
    from ..hashing import url_hash64_many

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])

    def derive(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy()
        texts = t["text"].to_pylist()
        if version == 1:
            keep = ids % 13 != 0
            salt = np.zeros(len(ids), dtype=bool)
        else:
            keep = ids % 11 != 0
            salt = ids % 7 == 0
        content = [tx + (" [updated]" if s else "")
                   for tx, s in zip(texts, salt)]
        h = url_hash64_many(np.array(content, dtype=object))
        return pa.table({
            "doc_id": pa.array(ids[keep], pa.int64()),
            "content_hash": pa.array(h[keep].astype(np.int64),
                                     pa.int64()),
        })

    return ds.map_batches(derive, batch_format="pyarrow")


def crawl_delta(sf_dir: str):
    """(doc_id, status) with status ∈ {new, gone, changed, same} — the
    diff of fetched-table snapshot v1 vs v2, computed by comparing the
    stored content hashes.

    Physical plan: both snapshots are published to the versioned
    TableStore via ``publish_dataset`` (distributed part writes, atomic
    rename+_OK — a rerun reuses published versions), read back
    version-pinned, and diffed with ONE bucketed shuffle (doc_id % nb,
    nb ∝ cluster CPUs) and a vectorized outer merge per bucket. At
    100 TB snapshots written partition-aligned make this a per-partition
    merge with no shuffle at all; the bucket join is the general case.
    """
    import os

    import ray

    from ..state.store import TableStore

    root = ("/tmp/mycelium_delta_"
            + os.path.basename(os.path.normpath(sf_dir)))
    store = TableStore(root)
    for v in (1, 2):
        if not store.exists("fetched", v):
            store.publish_dataset("fetched", _delta_snapshot(sf_dir, v), v)

    try:
        nb = max(8, int(ray.cluster_resources().get("CPU", 8)))
    except Exception:
        nb = 8

    def tag(side: int):
        def run(t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc
            ids = t["doc_id"]
            bucket = pc.subtract(
                ids, pc.multiply(pc.divide(ids, nb), nb))
            return pa.table({
                "doc_id": ids,
                "bucket": pc.cast(bucket, pa.int64()),
                "side": pa.array(np.full(len(t), side, np.int8)),
                "content_hash": t["content_hash"],
            })
        return run

    v1 = rd.read_parquet(store.version_files("fetched", 1)) \
        .map_batches(tag(0), batch_format="pyarrow")
    v2 = rd.read_parquet(store.version_files("fetched", 2)) \
        .map_batches(tag(1), batch_format="pyarrow")

    def diff(g: pd.DataFrame) -> pd.DataFrame:
        a = g[g["side"] == 0][["doc_id", "content_hash"]]
        b = g[g["side"] == 1][["doc_id", "content_hash"]]
        m = a.merge(b, on="doc_id", how="outer", suffixes=("_a", "_b"))
        ha = m["content_hash_a"]
        hb = m["content_hash_b"]
        status = np.where(ha.isna(), "new",
                          np.where(hb.isna(), "gone",
                                   np.where(ha != hb, "changed", "same")))
        return pd.DataFrame({"doc_id": m["doc_id"].astype("int64"),
                             "status": status})

    return v1.union(v2).groupby("bucket") \
        .map_groups(diff, batch_format="pandas")


CRAWL_DELTA_SQL = """
SELECT doc_id,
       CASE WHEN doc_id % 13 = 0 THEN 'new'
            WHEN doc_id % 11 = 0 THEN 'gone'
            WHEN doc_id % 7 = 0 THEN 'changed'
            ELSE 'same' END AS status
FROM documents
WHERE NOT (doc_id % 13 = 0 AND doc_id % 11 = 0)
"""


# --------------------------------------------------------------------------
# redirect_resolve: follow HTTP-redirect chains to their terminal URL with
# cycle detection — distributed pointer jumping (path doubling), the
# MAXREDIRS/O3 semantics lifted from per-fetch (transport.py) to a corpus
# batch op. Each round rewrites ptr[u] <- ptr[ptr[u]] via ONE bucketed
# hash join, so R = ceil(log2(longest chain)) rounds resolve everything;
# a round that resolves nothing proves the remainder is cyclic (every
# terminal-reaching node at distance <= 2^r is done after round r, and
# the nearest unresolved one sits at 2^r + 1 <= 2^(r+1)), which is the
# loop-exit rule. Shuffle per round ∝ unresolved nodes, ∝ CPUs buckets.
#
# Redirect edges derive from doc_id (SQL mirrors the closed form; the
# engine only ever follows edges):
#   doc_id % 100 in {97, 98, 99} → 3-cycle 97→98→99→97 (crawler traps)
#   doc_id % 10 == 0             → terminal (200 OK)
#   otherwise                    → doc_id - 1
# Corpus sizes are multiples of 100 at every sf, so each hundred-block
# (and thus each cycle) is complete.
# --------------------------------------------------------------------------
def _redirect_dst(doc: np.ndarray) -> np.ndarray:
    """dst per doc, -1 for terminals (no outgoing edge)."""
    m100 = doc % 100
    dst = doc - 1
    dst = np.where(doc % 10 == 0, -1, dst)
    dst = np.where(m100 == 97, doc + 1, dst)
    dst = np.where(m100 == 98, doc + 1, dst)
    dst = np.where(m100 == 99, doc - 2, dst)
    return dst.astype("int64")


def redirect_resolve(sf_dir: str):
    """(doc_id, status, final_doc, hops) — status 'ok' with the terminal
    doc + exact hop count, or 'loop' with final_doc = hops = -1."""
    import ray

    n_buckets = _n_rr_buckets()

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])

    def init_state(t: pa.Table) -> pa.Table:
        doc = t["doc_id"].to_numpy()
        dst = _redirect_dst(doc)
        red = dst >= 0
        return pa.table({
            "u": pa.array(doc[red], pa.int64()),
            "p": pa.array(dst[red], pa.int64()),
            "d": pa.array(np.ones(int(red.sum()), dtype=np.int64)),
            "done": pa.array(np.zeros(int(red.sum()), dtype=bool)),
        })

    def terminals(t: pa.Table) -> pa.Table:
        doc = t["doc_id"].to_numpy()
        term = doc[_redirect_dst(doc) < 0]
        return pa.table({
            "doc_id": pa.array(term, pa.int64()),
            "status": pa.array(["ok"] * len(term), pa.string()),
            "final_doc": pa.array(term, pa.int64()),
            "hops": pa.array(np.zeros(len(term), dtype=np.int64)),
        })

    state = ds.map_batches(init_state, batch_format="pyarrow").materialize()

    def tag_sides(t: pa.Table) -> pa.Table:
        # side 0: probe rows keyed by the pointer target; side 1: the
        # state row itself keyed by its own node id.
        u = t["u"].to_numpy()
        p = t["p"].to_numpy()
        d = t["d"].to_numpy()
        done = t["done"].to_numpy(zero_copy_only=False)
        probe = ~done
        return pa.table({
            "key": pa.array(np.concatenate([p[probe], u]), pa.int64()),
            "bucket": pa.array(
                np.concatenate([p[probe], u]) % n_buckets, pa.int64()),
            "side": pa.array(np.concatenate(
                [np.zeros(int(probe.sum()), dtype=np.int8),
                 np.ones(len(u), dtype=np.int8)])),
            "u": pa.array(np.concatenate([u[probe], u]), pa.int64()),
            "p": pa.array(np.concatenate([p[probe], p]), pa.int64()),
            "d": pa.array(np.concatenate([d[probe], d]), pa.int64()),
            "done": pa.array(np.concatenate(
                [done[probe], done]).astype(bool)),
        })

    def jump(g: pd.DataFrame) -> pd.DataFrame:
        a = g[g["side"] == 0]
        b = g[g["side"] == 1]
        out = [pd.DataFrame({"u": b["u"], "p": b["p"], "d": b["d"],
                             "done": b["done"]})[b["done"]]]
        if len(a):
            m = a.merge(
                b[["key", "p", "d", "done"]].rename(columns={
                    "p": "p2", "d": "d2", "done": "done2"}),
                on="key", how="left")
            hit = m["p2"].notna()
            # pointer target is itself terminal (no state row): resolved
            out.append(pd.DataFrame({
                "u": m.loc[~hit, "u"], "p": m.loc[~hit, "key"],
                "d": m.loc[~hit, "d"], "done": True}))
            h = m[hit]
            out.append(pd.DataFrame({
                "u": h["u"],
                "p": h["p2"].astype("int64"),
                "d": (h["d"] + h["d2"]).astype("int64"),
                "done": h["done2"].astype(bool),
            }))
        res = pd.concat(out, ignore_index=True)
        return res.astype({"u": "int64", "p": "int64", "d": "int64",
                           "done": "bool"})

    from ray.data.aggregate import Sum as _Sum

    def done_count(s) -> int:
        def flag(t: pa.Table) -> pa.Table:
            return pa.table({"f": pa.array(
                t["done"].to_numpy(zero_copy_only=False).astype("int64"))})
        agg = s.map_batches(flag, batch_format="pyarrow").sum("f")
        return int(agg or 0)

    n_done = done_count(state)
    for _ in range(64):  # 2^64 hops — structural upper bound
        state = state.map_batches(tag_sides, batch_format="pyarrow") \
            .groupby("bucket").map_groups(jump, batch_format="pandas") \
            .materialize()
        now_done = done_count(state)
        if now_done == n_done:
            break  # nothing new resolved → the rest is cyclic
        n_done = now_done

    def finish(t: pa.Table) -> pa.Table:
        done = t["done"].to_numpy(zero_copy_only=False)
        u = t["u"].to_numpy()
        p = t["p"].to_numpy()
        d = t["d"].to_numpy()
        return pa.table({
            "doc_id": pa.array(u, pa.int64()),
            "status": pa.array(np.where(done, "ok", "loop")),
            "final_doc": pa.array(np.where(done, p, -1), pa.int64()),
            "hops": pa.array(np.where(done, d, -1), pa.int64()),
        })

    return state.map_batches(finish, batch_format="pyarrow") \
        .union(ds.map_batches(terminals, batch_format="pyarrow")) \
        .sort("doc_id")


def _n_rr_buckets() -> int:
    try:
        import ray
        return max(16, 4 * int(ray.cluster_resources().get("CPU", 4)))
    except Exception:
        return 16


REDIRECT_RESOLVE_SQL = """
SELECT doc_id,
       CASE WHEN doc_id % 100 IN (97, 98, 99) THEN 'loop'
            ELSE 'ok' END AS status,
       CASE WHEN doc_id % 100 IN (97, 98, 99) THEN -1
            ELSE doc_id - doc_id % 10 END AS final_doc,
       CASE WHEN doc_id % 100 IN (97, 98, 99) THEN -1
            ELSE doc_id % 10 END AS hops
FROM documents
ORDER BY doc_id
"""


# --------------------------------------------------------------------------
# mirror_hosts: detect mirrored hosts by content-set Jaccard — the crawl
# dedup that catches whole-site copies rather than per-page duplicates.
# Per-doc content fingerprints derive from doc_id via TWO families whose
# moduli interact with the host stride (source = src{doc_id % 20}):
# family A = doc%16 (hosts share all 4 values iff k ≡ k' mod 4), family
# B = doc%6 + 1000 (hosts share all 3 iff k ≡ k' mod 2). That yields a
# three-tier Jaccard: 1.0 (same mod-4 class), 3/11 (same parity only),
# 0 (cross parity) — the oracle recomputes the same sets in SQL. Plan:
# This is a set-similarity self-join over host → set(cid), so it reuses
# the blocked all-pairs shape of dedup._jaccard_pairs_ds (1-Bucket-Theta
# block-replication join): per-batch distinct (host, cid) Arrow partials
# → one host-bucketed groupby that globally dedups AND attaches each
# host's set size to its rows (no driver-side size dict, no ray.put
# broadcast) → each row replicates to the G block tasks covering its
# host-group's pairings, so every unordered host pair meets in EXACTLY
# ONE task with both sizes present → per-task vectorized intersection
# count + Jaccard gate → distributed final sort. No per-cid all-pairs
# fan-out (a hot fingerprint shared by H hosts costs merge rows split
# across G(G+1)/2 tasks, not H²/2 rows in one), no repartition(1), and
# nothing row-shaped touches the driver. All shuffles ∝ CPUs.
# --------------------------------------------------------------------------
MIRROR_JACCARD_MIN = 0.1


def _mirror_groups() -> int:
    """Host-group count G for the blocked pair join: G(G+1)/2 tasks keeps
    a full-width cluster busy (G=8 → 36 tasks ≥ 32 cores); on a real
    cluster G would additionally scale with the host-count estimate from
    parquet metadata so a block's rows stay ~1M."""
    try:
        return max(8, int(np.ceil(np.sqrt(
            4 * ray.cluster_resources().get("CPU", 4)))))
    except Exception:
        return 8


def mirror_hosts(sf_dir: str):
    """(host_a, host_b, n_common, jaccard) for host pairs with content
    Jaccard ≥ 0.1 — same-mirror-group pairs at every sf."""
    from .dedup import sorted_or_empty

    n_buckets = _n_rr_buckets()
    G = _mirror_groups()
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "source"])

    def cid_partial(df: pd.DataFrame) -> pd.DataFrame:
        both = pd.concat([
            pd.DataFrame({"host": df["source"],
                          "cid": df["doc_id"] % 16}),
            pd.DataFrame({"host": df["source"],
                          "cid": df["doc_id"] % 6 + 1000}),
        ], ignore_index=True)
        # bucket must be a DETERMINISTIC function of host (Python's str
        # hash is per-process salted and would scatter one host across
        # buckets, breaking both the global dedup and the size count)
        d = both.drop_duplicates(["host", "cid"])
        h = url_hash64_many(d["host"].tolist())
        return pd.DataFrame({
            "host": d["host"],
            "cid": d["cid"].astype("int64"),
            "grp": (h % np.uint64(G)).astype("int64"),
            "hbucket": (h % np.uint64(n_buckets)).astype("int64"),
        })

    def dedup_and_size(g: pd.DataFrame) -> pd.DataFrame:
        # all rows of a host land in this group (hbucket is a function
        # of host): finish the distinct, then n_host = |set(cid)|
        d = g.drop_duplicates(["host", "cid"]).copy()
        d["n_host"] = d.groupby("host")["cid"].transform("size") \
            .astype("int64")
        return d[["host", "cid", "grp", "n_host"]]

    sized = ds.map_batches(cid_partial, batch_format="pandas") \
        .groupby("hbucket").map_groups(dedup_and_size,
                                       batch_format="pandas")

    def explode_replicate(df: pd.DataFrame) -> pd.DataFrame:
        # row of host-group g → the G tasks {(min(g,o), max(g,o))}
        grp = df["grp"].to_numpy()
        idx = np.repeat(np.arange(len(df)), G)
        other = np.tile(np.arange(G, dtype="int64"), len(df))
        g_rep = grp[idx]
        task = (np.minimum(g_rep, other) * G + np.maximum(g_rep, other))
        out = df.iloc[idx].reset_index(drop=True)
        out["task"] = task
        # the G task ids of one row are all distinct ((o,g) for o<g,
        # (g,g), (g,o) for o>g) and (host, cid) rows are globally unique
        # after dedup_and_size — no duplicate (host, cid, task) rows
        return out

    empty = pd.DataFrame({"host_a": pd.Series([], dtype="object"),
                          "host_b": pd.Series([], dtype="object"),
                          "n_common": pd.Series([], dtype="int64"),
                          "jaccard": pd.Series([], dtype="float64")})

    def block_pairs(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return empty
        i, j = divmod(int(g["task"].iloc[0]), G)
        a = g[g["grp"] == i]
        b = g[g["grp"] == j] if i != j else a
        m = a.merge(b, on="cid", suffixes=("_x", "_y"))
        if i == j:
            # self block: keep each unordered pair once, drop self-pairs
            m = m[m["host_x"] < m["host_y"]]
        else:
            # cross block: every pair appears exactly once (x from group
            # i, y from group j) — NORMALIZE the order lexicographically
            # (filtering would drop pairs whose group-j host sorts first)
            swap = m["host_x"] > m["host_y"]
            for cx, cy in (("host_x", "host_y"), ("n_host_x", "n_host_y")):
                vx = m[cx].where(~swap, m[cy])
                m[cy] = m[cy].where(~swap, m[cx])
                m[cx] = vx
            m = m[m["host_x"] != m["host_y"]]
        if len(m) == 0:
            return empty
        out = m.groupby(["host_x", "host_y"], as_index=False).agg(
            n_common=("cid", "size"), na=("n_host_x", "first"),
            nb=("n_host_y", "first"))
        jac = (out["n_common"].astype("float64")
               / (out["na"] + out["nb"] - out["n_common"]))
        out["jaccard"] = jac
        out = out[jac >= MIRROR_JACCARD_MIN]
        return pd.DataFrame({
            "host_a": out["host_x"], "host_b": out["host_y"],
            "n_common": out["n_common"].astype("int64"),
            "jaccard": out["jaccard"]})

    pairs = sized.map_batches(explode_replicate, batch_format="pandas") \
        .groupby("task").map_groups(block_pairs, batch_format="pandas")
    return sorted_or_empty(
        pairs, ["host_a", "host_b"],
        pa.table({"host_a": pa.array([], pa.string()),
                  "host_b": pa.array([], pa.string()),
                  "n_common": pa.array([], pa.int64()),
                  "jaccard": pa.array([], pa.float64())}))


MIRROR_HOSTS_SQL = f"""
WITH hc AS (
  SELECT DISTINCT source AS host, doc_id % 16 AS cid FROM documents
  UNION
  SELECT DISTINCT source AS host, doc_id % 6 + 1000 AS cid FROM documents
), sz AS (
  SELECT host, count(*) AS n FROM hc GROUP BY 1
), common AS (
  SELECT a.host AS host_a, b.host AS host_b, count(*) AS n_common
  FROM hc a JOIN hc b ON a.cid = b.cid AND a.host < b.host
  GROUP BY 1, 2
)
SELECT host_a, host_b, CAST(n_common AS BIGINT) AS n_common,
       CAST(n_common AS DOUBLE) / (sa.n + sb.n - n_common) AS jaccard
FROM common
JOIN sz sa ON sa.host = host_a
JOIN sz sb ON sb.host = host_b
WHERE CAST(n_common AS DOUBLE) / (sa.n + sb.n - n_common)
      >= {MIRROR_JACCARD_MIN}
ORDER BY host_a, host_b
"""


# --------------------------------------------------------------------------
# crawl_budget: per-host frontier drain planning — given each host's queue
# length, its robots policy (REAL parser: path rules + Crawl-delay) and
# the 1-in-flight-per-host politeness invariant, how long does the host
# queue take to drain? This is the scheduler's capacity estimate: hosts
# with est_drain dominating the horizon get sharded/deprioritized. Plan:
# per-batch Arrow count partials per source → one bounded groupby → the
# real Robots parser decides fetchability and delay PER BATCH of the
# grouped result (the policy is a pure per-host function, so the plan
# stage needs no global view) → distributed sort. The plan stays
# host-partitioned end to end — no single-partition stage, because at
# web scale "hosts" is the row count, not a dimension. Deci-second ints
# keep the oracle exact.
# --------------------------------------------------------------------------
DEFAULT_DELAY_DS = 5  # 0.5 s between same-host fetches when robots is silent


def crawl_budget(sf_dir: str):
    """(host, n_urls, n_fetchable, crawl_delay_ds, est_drain_ds) per
    source host, value-checked against the arithmetic policy mirror."""
    import pyarrow.compute as pc

    from ray.data.aggregate import Sum

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "source"])

    def count_partial(t: pa.Table) -> pa.Table:
        g = t.group_by("source").aggregate([([], "count_all")])
        return pa.table({"source": g["source"],
                         "n": pc.cast(g["count_all"], pa.int64())})

    per_host = ds.map_batches(count_partial, batch_format="pyarrow") \
        .groupby("source").aggregate(Sum("n", alias_name="n_urls"))

    def plan(df: pd.DataFrame) -> pd.DataFrame:
        cache = {kind: Robots(body) for kind, body in _ROBOTS_BODIES.items()}
        hosts, fetchable, delays = [], [], []
        for src, n in zip(df["source"], df["n_urls"]):
            k = int(src[3:])
            hosts.append(f"src{k}.example.com")
            r = cache.get(k % 3)
            # representative path: every derived URL lives under /d/
            ok = r is None or r.path_allowed("*", "/d/0/asset.png")
            fetchable.append(int(n) if ok else 0)
            d = r.crawl_delay("*") if r is not None else None
            delays.append(int(d * 10) if d else DEFAULT_DELAY_DS)
        out = pd.DataFrame({
            "host": hosts,
            "n_urls": df["n_urls"].astype("int64"),
            "n_fetchable": pd.Series(fetchable, dtype="int64"),
            "crawl_delay_ds": pd.Series(delays, dtype="int64"),
        })
        out["est_drain_ds"] = (out["n_fetchable"]
                               * out["crawl_delay_ds"]).astype("int64")
        return out

    return per_host.map_batches(plan, batch_format="pandas").sort("host")


CRAWL_BUDGET_SQL = f"""
SELECT 'src' || substr(source, 4) || '.example.com' AS host,
       count(*) AS n_urls,
       CASE WHEN CAST(substr(source, 4) AS INT) % 3 = 1 THEN 0
            ELSE count(*) END AS n_fetchable,
       CASE WHEN CAST(substr(source, 4) AS INT) % 3 = 2 THEN 20
            ELSE {DEFAULT_DELAY_DS} END AS crawl_delay_ds,
       CASE WHEN CAST(substr(source, 4) AS INT) % 3 = 1 THEN 0
            ELSE count(*) END
       * CASE WHEN CAST(substr(source, 4) AS INT) % 3 = 2 THEN 20
              ELSE {DEFAULT_DELAY_DS} END AS est_drain_ds
FROM documents
GROUP BY source
ORDER BY host
"""


# --------------------------------------------------------------------------
# robots_sitemap_discovery: the robots→sitemap handshake — a crawler
# learns sitemap locations FROM robots.txt (sitemaps.org: Sitemap lines
# are group-independent). Per-host robots bodies derive from the same
# k%3 policy as robots_filter, plus a Sitemap directive on even-k hosts
# (and a second one on k%4==0 hosts, so multi-sitemap files are
# exercised); the REAL parser extracts them; the oracle mirrors the
# derivation arithmetically. Plan: per-batch distinct sources → global
# distinct via a host-hash-bucketed groupby (a host's rows all land in
# one group, so per-group unique is globally correct) → the parser runs
# per bucket → distributed sort. Host-bucketed end to end; no
# single-partition stage.
# --------------------------------------------------------------------------
def robots_sitemap_discovery(sf_dir: str):
    """(host, n_sitemaps, first_sitemap) parsed by the real robots
    parser from derived per-host robots.txt bodies."""
    n_buckets = _n_rr_buckets()
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["source"])

    def hosts_partial(df: pd.DataFrame) -> pd.DataFrame:
        u = df["source"].unique()
        return pd.DataFrame({
            "source": u,
            "hbucket": (url_hash64_many(list(u))
                        % np.uint64(n_buckets)).astype("int64"),
        })

    def discover(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for src in sorted(df["source"].unique()):
            k = int(src[3:])
            host = f"src{k}.example.com"
            body = _ROBOTS_BODIES.get(k % 3, "User-agent: *\n")
            if k % 2 == 0:
                body += f"Sitemap: http://{host}/sitemap.xml\n"
            if k % 4 == 0:
                body += f"sitemap: http://{host}/sitemap-imgs.xml\n"
            r = Robots(body)
            rows.append((host, len(r.sitemaps),
                         r.sitemaps[0] if r.sitemaps else ""))
        return pd.DataFrame({
            "host": [r[0] for r in rows],
            "n_sitemaps": pd.Series([r[1] for r in rows], dtype="int64"),
            "first_sitemap": pd.Series([r[2] for r in rows],
                                       dtype="object"),
        })

    return ds.map_batches(hosts_partial, batch_format="pandas") \
        .groupby("hbucket").map_groups(discover, batch_format="pandas") \
        .sort("host")


ROBOTS_SITEMAP_DISCOVERY_SQL = """
WITH h AS (SELECT DISTINCT CAST(substr(source, 4) AS BIGINT) AS k
           FROM documents)
SELECT 'src' || CAST(k AS VARCHAR) || '.example.com' AS host,
       CAST(CASE WHEN k % 4 = 0 THEN 2
                 WHEN k % 2 = 0 THEN 1 ELSE 0 END AS BIGINT)
         AS n_sitemaps,
       CASE WHEN k % 2 = 0
            THEN 'http://src' || CAST(k AS VARCHAR)
                 || '.example.com/sitemap.xml'
            ELSE '' END AS first_sitemap
FROM h
ORDER BY host
"""


def url_features(sf_dir: str):
    """(doc_id, host, depth, path_len, n_params, n_digits) — frontier
    prioritization features computed by the REAL URL parser (urlcanon
    Url: host, path segmentation, query split) over derived URLs with
    doc-varying shape (depth = 1 + doc_id%4 segments, 0-2 query params).
    The oracle recomputes every feature arithmetically from doc_id, so
    a parser regression in path/query handling breaks the value hash —
    the SEO/spam-feature leg a crawl scheduler ranks on."""
    from ..urlcanon import Url

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "source"])

    def run(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        k = df["source"].str.slice(3)
        d = df["doc_id"]
        seg = (d % 4).map(lambda n: "s/" * int(n))
        q = (d % 3).map({0: "", 1: "?a=1", 2: "?a=1&b=2"})
        urls = ("http://src" + k + ".example.com/" + seg
                + "p" + d.astype(str) + q)
        hosts, depths, plens, nparams, ndigits = [], [], [], [], []
        for u in urls:
            parsed = Url(u).normalize()
            path = parsed.path.get()
            segs = [s for s in path.split("/") if s]
            query = parsed.query
            hosts.append(parsed.host)
            depths.append(len(segs))
            plens.append(len(path))
            nparams.append(len([p for p in query.split("&") if p])
                           if query else 0)
            ndigits.append(sum(c.isdigit() for c in segs[-1])
                           if segs else 0)
        return pa.table({
            "doc_id": pa.array(df["doc_id"], pa.int64()),
            "host": pa.array(hosts, pa.string()),
            "depth": pa.array(depths, pa.int64()),
            "path_len": pa.array(plens, pa.int64()),
            "n_params": pa.array(nparams, pa.int64()),
            "n_digits": pa.array(ndigits, pa.int64()),
        })

    return ds.map_batches(run, batch_format="pyarrow")


URL_FEATURES_SQL = """
SELECT doc_id,
       'src' || substr(source, 4) || '.example.com' AS host,
       1 + doc_id % 4 AS depth,
       2 + 2 * (doc_id % 4) + length(CAST(doc_id AS VARCHAR)) AS path_len,
       doc_id % 3 AS n_params,
       length(CAST(doc_id AS VARCHAR)) AS n_digits
FROM documents
"""


_RFC9309_ROBOTS = """User-agent: *
Disallow: /*.tmp$
Disallow: /d/1*
Allow: /d/1*0.png
"""


def robots_rfc9309(sf_dir: str):
    """(doc_id, path, rfc_allowed, ref_allowed) — RFC 9309 wildcard
    matching (longest rule wins, Allow wins ties, ``*``/``$``) over the
    real parser, per-doc paths against a wildcard ruleset. The oracle
    recomputes the RFC verdict arithmetically (odd docs are *.tmp →
    denied by the anchored wildcard; docs starting with '1' are denied
    by /d/1* unless the longer /d/1*0.png allow wins). ref_allowed is
    the reference prefix matcher's verdict on the SAME rules — always
    TRUE, because prefix semantics can never match a wildcard rule
    text: exactly the modern-web behavior gap the opt-in closes."""
    from ..robots import Robots

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id"])

    def run(t: pa.Table) -> pa.Table:
        r = Robots(_RFC9309_ROBOTS)
        ids = t["doc_id"].to_pylist()
        paths = [f"/d/{d}" + (".png" if d % 2 == 0 else ".tmp")
                 for d in ids]
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "path": pa.array(paths, pa.string()),
            "rfc_allowed": pa.array(
                [r.path_allowed_rfc9309("mycelium", p) for p in paths],
                pa.bool_()),
            "ref_allowed": pa.array(
                [r.path_allowed("mycelium", p) for p in paths],
                pa.bool_()),
        })

    return ds.map_batches(run, batch_format="pyarrow")


ROBOTS_RFC9309_SQL = """
SELECT doc_id,
       '/d/' || CAST(doc_id AS VARCHAR)
             || CASE WHEN doc_id % 2 = 0 THEN '.png' ELSE '.tmp' END AS path,
       doc_id % 2 = 0
         AND (NOT starts_with(CAST(doc_id AS VARCHAR), '1')
              OR doc_id % 10 = 0) AS rfc_allowed,
       TRUE AS ref_allowed
FROM documents
"""


def http_cache_policy(sf_dir: str):
    """(doc_id, cacheable, lifetime_s, revalidate) — RFC 9111 freshness
    policy (http_headers.freshness_lifetime: s-maxage > max-age >
    Expires-Date precedence, no-store/private/no-cache semantics for a
    SHARED cache, which a crawler is) over per-doc derived Cache-Control
    / Expires headers covering every directive class. The oracle
    recomputes all three outputs arithmetically — a precedence or
    directive-parsing regression breaks the value hash. This is the
    freshness input the recrawl scheduler (recrawl_schedule) ranks by."""
    from ..http_headers import freshness_lifetime

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id"])

    def run(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        cache, life, reval = [], [], []
        for d in ids:
            kind = d % 7
            if kind == 0:
                cc, exp, date = f"max-age={d % 7200}", None, None
            elif kind == 1:
                cc, exp, date = "no-store", None, None
            elif kind == 2:
                cc, exp, date = "no-cache", None, None
            elif kind == 3:
                cc, exp, date = "", 1000 + d % 900, 1000
            elif kind == 4:
                cc = f"private, max-age={d % 100}"
                exp = date = None
            elif kind == 5:
                cc = f"max-age={d % 100}, s-maxage={d % 1000}"
                exp = date = None
            else:
                cc, exp, date = "", None, 100000   # heuristic class
            lm = 100000 - 10 * (d % 5000) if kind == 6 else None
            ln, ca, rv = freshness_lifetime(cc, exp, date, shared=True,
                                            last_modified_epoch=lm)
            cache.append(ca)
            life.append(ln)
            reval.append(rv)
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "cacheable": pa.array(cache, pa.bool_()),
            "lifetime_s": pa.array(life, pa.int64()),
            "revalidate": pa.array(reval, pa.bool_()),
        })

    return ds.map_batches(run, batch_format="pyarrow")


HTTP_CACHE_POLICY_SQL = """
SELECT doc_id,
       doc_id % 7 NOT IN (1, 4) AS cacheable,
       CAST(CASE doc_id % 7
            WHEN 0 THEN doc_id % 7200
            WHEN 1 THEN 0
            WHEN 2 THEN 0
            WHEN 3 THEN doc_id % 900
            WHEN 4 THEN 0
            WHEN 5 THEN doc_id % 1000
            ELSE (10 * (doc_id % 5000)) // 10 END AS BIGINT) AS lifetime_s,
       doc_id % 7 = 2 AS revalidate
FROM documents
"""


# IDN fixtures: (unicode host, ACE form). The ACE literals are pinned
# independently in tests against BOTH the RFC 3492 sample vectors and
# stdlib's idna codec, so the SQL lookup below is a golden-vector
# oracle, not an echo of the implementation.
_IDN_HOSTS = [
    ("plain.example.com", "plain.example.com"),
    ("bücher.example.com", "xn--bcher-kva.example.com"),
    ("münchen.de", "xn--mnchen-3ya.de"),
    ("日本.example", "xn--wgv71a.example"),
    ("россия.рф", "xn--h1alffa9f.xn--p1ai"),
    ("mixed.bücher.net", "mixed.xn--bcher-kva.net"),
]


def idn_hosts(sf_dir: str):
    """(doc_id, unicode_host, ace_host, roundtrip_ok) — IDNA host
    handling with the from-scratch RFC 3492 bootstring codec
    (punycode.py): each doc picks a fixture host (doc_id % 6, ASCII and
    IDN classes), the REAL encoder produces the ACE form, the decoder
    round-trips it, and the oracle pins the expected ACE literal per
    class — the internationalized-hostname leg the ASCII-only reference
    canonicalizer (Url.cc) lacks."""
    from ..punycode import idna_decode_host, idna_encode_host

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id"])

    def run(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        uni, ace, ok = [], [], []
        for d in ids:
            u, _expect = _IDN_HOSTS[d % len(_IDN_HOSTS)]
            a = idna_encode_host(u)
            uni.append(u)
            ace.append(a)
            ok.append(idna_decode_host(a) == u.lower())
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "unicode_host": pa.array(uni, pa.string()),
            "ace_host": pa.array(ace, pa.string()),
            "roundtrip_ok": pa.array(ok, pa.bool_()),
        })

    return ds.map_batches(run, batch_format="pyarrow")


def _idn_hosts_sql() -> str:
    uni_cases = "\n".join(
        f"            WHEN {i} THEN '{u}'"
        for i, (u, _a) in enumerate(_IDN_HOSTS))
    ace_cases = "\n".join(
        f"            WHEN {i} THEN '{a}'"
        for i, (_u, a) in enumerate(_IDN_HOSTS))
    return f"""
SELECT doc_id,
       CASE doc_id % {len(_IDN_HOSTS)}
{uni_cases}
       END AS unicode_host,
       CASE doc_id % {len(_IDN_HOSTS)}
{ace_cases}
       END AS ace_host,
       TRUE AS roundtrip_ok
FROM documents
"""


IDN_HOSTS_SQL = _idn_hosts_sql()
