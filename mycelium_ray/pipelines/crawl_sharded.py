"""Host-sharded crawl: the cluster-scale execution mode.

M planner-shard actors each own the hosts with ``hash(raw_host) % M ==
shard`` (the frontier repartition key of SURVEY.md §7.4) and run the full
reference state machine over their slice with ``parallel // M`` handles and
inline fetching — each shard is exactly one node's crawl executor on a real
cluster. Per-host FIFO ordering and robots/politeness semantics are
preserved within a shard by construction (a host never spans shards);
cross-shard global interleave is concurrent, so *global* reference-order
parity is the single-shard (M=1) configuration used by the parity tests —
this is the documented ordering-vs-throughput tradeoff (SURVEY.md §7.5).

Decode/validate runs as one Ray Data pipeline over all shards' flushed
Arrow batches (object-store refs, zero-copy into map_batches).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray

from ..corpus import SiteGraph, USER_AGENT
from ..hashing import url_hash64
from ..stages.decode import DecodeValidate
from ..urlcanon import Url, UrlParseError


@ray.remote
class PlannerShard:
    def __init__(self, site_ref, shard_id: int, parallel: int,
                 user_agent: str = USER_AGENT, dedup: str = "reference"):
        from .crawl import RayCrawler
        site = site_ref if isinstance(site_ref, SiteGraph) else ray.get(site_ref)
        self.shard_id = shard_id
        self.crawler = RayCrawler(site, parallel=parallel, n_fetchers=0,
                                  user_agent=user_agent, dedup=dedup,
                                  flush_rows=4096)

    def feed(self, seed_lines: list[str]) -> int:
        self.crawler.feed(seed_lines)
        return self.crawler.classifier.size()

    def run(self) -> dict:
        res = self.crawler.run()
        self.crawler._maybe_flush(force=True)
        # ship tables (not refs): refs created here die with this actor,
        # and the decode Dataset is consumed lazily after we're gone
        tables = ray.get(self.crawler._batch_refs)
        return {
            "shard": self.shard_id,
            "n_saved": len(res.saved),
            "n_seen": len(res.url_seen),
            "batches": tables,
            "url_seen": res.url_seen,
        }


def partition_seeds(seed_lines: list[str], n_shards: int) -> list[list[str]]:
    """Route seed lines by hash(raw parsed host) — invalid lines go to
    shard 0 so the reject accounting stays complete."""
    parts: list[list[str]] = [[] for _ in range(n_shards)]
    for line in seed_lines:
        s = line.strip()
        if not s:
            continue
        try:
            host = Url(s).host
        except (UrlParseError, Exception):
            parts[0].append(line)
            continue
        parts[url_hash64(host) % n_shards].append(line)
    return parts


def run_crawl_sharded(site: SiteGraph, seeds: list[str], parallel: int = 64,
                      n_shards: int = 4, dedup: str = "reference",
                      out_dir: str | None = None):
    """Returns (stats: dict, decoded ray.data.Dataset)."""
    site_ref = ray.put(site)
    per_shard = max(1, parallel // n_shards)
    shards = [PlannerShard.remote(site_ref, i, per_shard, dedup=dedup)
              for i in range(n_shards)]
    parts = partition_seeds(seeds, n_shards)
    ray.get([s.feed.remote(p) for s, p in zip(shards, parts)])
    results = ray.get([s.run.remote() for s in shards])

    all_refs = []
    url_seen: set[str] = set()
    n_saved = 0
    for r in results:
        all_refs.extend(ray.put(t) for t in r["batches"])
        url_seen |= r["url_seen"]
        n_saved += r["n_saved"]

    import ray.data as rd
    if all_refs:
        ds = rd.from_arrow_refs(all_refs)
    else:
        from .crawl import FETCHED_SCHEMA
        ds = rd.from_arrow(FETCHED_SCHEMA.empty_table())
    ds = ds.map_batches(DecodeValidate(), batch_format="pyarrow",
                        batch_size=512)
    if out_dir is not None:
        ds.write_parquet(out_dir)
        ds = rd.read_parquet(out_dir)
    stats = {"n_saved": n_saved, "n_seen": len(url_seen),
             "n_shards": n_shards, "parallel": parallel,
             "url_seen": url_seen}
    return stats, ds
