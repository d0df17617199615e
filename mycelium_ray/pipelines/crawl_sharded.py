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


@ray.remote(concurrency_groups={"control": 1})
class PlannerShard:
    def __init__(self, shard_id: int, parallel: int,
                 user_agent: str = USER_AGENT, dedup: str = "reference",
                 follow_links: bool = False, n_shards: int = 1):
        # NOTE: the site graph is NOT a constructor arg. Large actor-
        # constructor args are shipped through the GCS actor-creation path
        # (content-dependent, serialized per actor — measured ~4 s/actor
        # for a 150 MiB blob); a plain method call resolves the same ref
        # from local plasma in ~0.3 s. Hence load_site() below.
        self.shard_id = shard_id
        self.parallel = parallel
        self.user_agent = user_agent
        self.dedup = dedup
        self.follow_links = follow_links
        self.n_shards = n_shards
        self.crawler = None
        self._peers = None
        self._host_to_shard: dict = {}
        self._warm = False

    def load_site(self, site_blob, host_to_shard: dict | None = None,
                  store_root: str | None = None, checkpoint_every: int = 0,
                  resume: bool = False, parallel: int | None = None,
                  dedup: str | None = None, follow_links: bool | None = None,
                  n_shards: int | None = None,
                  user_agent: str | None = None) -> bool:
        """site_blob: pickled SiteGraph bytes (one flat blob — Ray's
        recursive per-object serialization of a 10^5-entry dataclass graph
        is an order of magnitude slower than a flat pickle round-trip).
        ``host_to_shard``: load-balanced ownership map (lowercase host →
        shard); unknown hosts fall back to hash routing.
        ``store_root``/``checkpoint_every``: per-shard durable checkpoints
        under ``store_root/shard=NNN``; ``resume=True`` restores the latest
        checkpoint instead of starting fresh (returns False if none).

        The trailing kwargs reconfigure a POOLED (reused) actor for a new
        crawl job — all per-run state lives in the crawler rebuilt here, so
        one long-lived actor serves any sequence of jobs (the fixed-size-
        cluster executor model: bring-up is paid once per session, not per
        job; cold-starting a 30-process pool mid-session measured 5-31 s on
        this box because Ray Data tasks consume the prestarted workers)."""
        if parallel is not None:
            self.parallel = parallel
        if dedup is not None:
            self.dedup = dedup
        if follow_links is not None:
            self.follow_links = follow_links
        if n_shards is not None:
            self.n_shards = n_shards
        if user_agent is not None:
            self.user_agent = user_agent
        import os
        import pickle
        from ..state.store import TableStore
        from .crawl import RayCrawler
        site = site_blob
        if isinstance(site, (bytes, memoryview)):
            site = pickle.loads(site)
        store = None
        if store_root is not None:
            store = TableStore(os.path.join(store_root,
                                            f"shard={self.shard_id:03d}"))
        self._host_to_shard = host_to_shard or {}
        resumed = False
        if resume and store is not None and store.blob_versions("crawl_ckpt"):
            self.crawler = RayCrawler.restore(site, store, n_fetchers=0)
            self.crawler.checkpoint_every = checkpoint_every
            resumed = True
        else:
            self.crawler = RayCrawler(site, parallel=self.parallel,
                                      n_fetchers=0,
                                      user_agent=self.user_agent,
                                      dedup=self.dedup,
                                      follow_links=self.follow_links,
                                      flush_rows=4096,
                                      store=store,
                                      checkpoint_every=checkpoint_every)
        self._resumed = resumed
        if self.n_shards > 1:
            shard_id, n_shards = self.shard_id, self.n_shards
            omap = host_to_shard or {}

            def owns(host, _map=omap, _id=shard_id, _n=n_shards):
                h = host.lower()
                owner = _map.get(h)
                if owner is None:
                    owner = url_hash64(h) % _n
                return owner == _id

            self.crawler.owns_host = owns
        if not self._warm:
            self._warmup()
            self._warm = True
        return resumed

    def clear(self) -> None:
        """Drop all per-job state (crawler, site slice, peer handles) so an
        idle pooled actor holds ~no memory between jobs."""
        self.crawler = None
        self._peers = None
        self._host_to_shard = {}

    def set_nice(self, value: int | None) -> int:
        """Set this actor process's OS scheduling priority. Idle Ray
        worker processes on this box measurably busy-poll (~20-35% of a
        core EACH — environment-level, not this code), so a parked
        30-actor pool silently taxes every subsequent pipeline stage by
        ~10 cores (measured: decode+write 30 s with the pool at nice 0
        vs 8.8 s without it). Parking the pool at nice 19 keeps the warm
        processes (instant next-job start) while losing every scheduling
        contest against real work; the pool is restored to nice 0 when a
        job reclaims it. Linux nice is per-THREAD and the busy-poll lives
        in the worker's C++ io threads, so every thread in the process is
        reniced, not just the Python main thread. ``value=None`` reads
        the current priority without changing it.

        Raising priority back (nice 19 → 0) needs CAP_SYS_NICE or an
        RLIMIT_NICE allowance — without it, parking would be a one-way
        trap that leaves every later crawl's actors at nice 19. So a
        request to LOWER priority is refused (no-op) unless the process
        can provably restore it."""
        import os
        cur = os.getpriority(os.PRIO_PROCESS, 0)
        if value is None:
            return cur
        if value > cur:  # lowering priority: only if we can come back
            if os.geteuid() != 0:
                import resource
                soft, _ = resource.getrlimit(resource.RLIMIT_NICE)
                # a process may re-lower its nice only to 20 - rlimit
                if soft == resource.RLIM_INFINITY:
                    pass
                elif 20 - soft > cur:
                    return cur  # cannot restore → refuse to park
        for tid in os.listdir("/proc/self/task"):
            try:
                os.setpriority(os.PRIO_PROCESS, int(tid), value)
            except OSError:
                pass  # thread exited between listdir and setpriority
        return os.getpriority(os.PRIO_PROCESS, 0)

    def _warmup(self) -> None:
        """Trigger the lazy imports and plasma-client init that otherwise
        land inside the first measured run (~0.6 s cold per actor): run a
        one-URL crawl on a throwaway fixture and flush it."""
        from ..corpus import Response, SiteGraph
        from .crawl import RayCrawler, saved_docs_to_table
        wsite = SiteGraph()
        wsite.hosts = ["warm.test"]
        wsite.robots["warm.test"] = None
        wsite.responses["http://warm.test/x.png"] = Response(
            status=200, content=b"\x89PNG", content_type="image/png")
        w = RayCrawler(wsite, parallel=1, n_fetchers=0)
        w.feed(["http://warm.test/x.png"])
        w.run()
        ray.put(saved_docs_to_table(w.result.saved))

    def feed(self, seed_lines: list[str]) -> int:
        self.crawler.feed(seed_lines)
        return self.crawler.classifier.size()

    def feed_canonical(self, canon_urls: list[str]) -> int:
        return self.crawler.feed_canonical(canon_urls)

    def set_peers(self, peers: list) -> None:
        """Actor handles of all shards (self included) for direct
        shard-to-shard discovery-link exchange — foreign outlinks flow
        actor→actor by the ownership map; the driver never touches link
        strings, only counters (the 10^10-URL frontier would OOM a
        driver-side exchange)."""
        self._peers = peers

    enqueue_links = feed_canonical  # peer-facing alias (seen-filter at owner)

    @ray.method(concurrency_group="control")
    def status(self) -> dict:
        """S7 control channel (the reference's stdin qlen/status commands,
        crawler.cc:604-625 / 1375-1395): live introspection of this shard
        — queue depths, backlog, counters. Runs in its own concurrency
        group so it answers WHILE a round is crawling (the reference's
        event loop interleaves stdin with transfers the same way); the
        read is approximate-by-design against the running crawl and
        reports ``busy`` if the structures mutate mid-read."""
        if self.crawler is None:
            return {"shard": self.shard_id, "idle": True}
        try:
            c = self.crawler.classifier
            return {
                "shard": self.shard_id,
                "frontier_size": c.size(),
                "qlen_top": c.q_len_top(),
                "qlens": [c.q_len(n) for n in range(c.n_queues)],
                "metrics": dict(self.crawler.metrics),
                "n_saved": len(self.crawler.result.saved),
            }
        except RuntimeError:  # dict resized during concurrent iteration
            return {"shard": self.shard_id, "busy": True}

    @ray.method(concurrency_group="control")
    def dump_frontier(self, limit: int = 1000) -> list[dict]:
        """dumpq analog (crawler.cc:1375-1395): frontier contents as
        (kind, queue_n, host, ord, payload) rows, truncated to ``limit``."""
        if self.crawler is None:
            return []
        try:
            return self.crawler.classifier.to_records()[:limit]
        except RuntimeError:
            return [{"shard": self.shard_id, "busy": True}]

    def run(self, raw_dir: str | None = None, round_no: int = 1,
            stop_after_waves: int = 0, collect_url_seen: bool = False) -> dict:
        """Crawl until this shard's frontier drains.

        With ``raw_dir`` the shard publishes its fetched batches as
        partitioned parquet (``shard=NNN/round-RR-part-MM.parquet``) — the
        resumable layout; the driver never touches row data. Without it
        (small test runs) the Arrow tables are returned by value.
        """
        import time
        t0 = time.perf_counter()
        res = self.crawler.run(stop_after_waves=stop_after_waves)
        run_sec = time.perf_counter() - t0
        if stop_after_waves and self.crawler.store is not None:
            # simulated preemption: leave a consistent checkpoint behind
            self.crawler.checkpoint(999_000 + stop_after_waves)
        self.crawler._maybe_flush(force=True)
        foreign = self.crawler.foreign_links
        self.crawler.foreign_links = []
        tables = ray.get(self.crawler._batch_refs)
        self.crawler._batch_refs = []  # don't re-ship on a later round
        written = []
        if raw_dir is not None and tables:
            import os
            import pyarrow.parquet as pq
            d = os.path.join(raw_dir, f"shard={self.shard_id:03d}")
            os.makedirs(d, exist_ok=True)
            for i, t in enumerate(tables):
                path = os.path.join(d, f"round-{round_no:02d}-part-{i:03d}.parquet")
                pq.write_table(t, path)
                written.append(path)
        # per-partition lineage: rows + seq span + xor-checksum of url
        # hashes per flushed batch (north-rule resume/audit surface)
        lineage = []
        for i, t in enumerate(tables):
            h = t.column("url_hash").to_numpy()
            seqs = t.column("seq").to_numpy()
            lineage.append({
                "shard": self.shard_id, "flush": i, "rows": len(t),
                "min_seq": int(seqs.min()) if len(seqs) else -1,
                "max_seq": int(seqs.max()) if len(seqs) else -1,
                # two's-complement int64 so the Arrow table infers a
                # signed type (uint64 xor can exceed int64 max)
                "checksum": (int(np.bitwise_xor.reduce(h).astype(np.int64))
                             if len(h) else 0),
            })
        # shard-to-shard exchange: route foreign links DIRECTLY to their
        # owner shards (fire-and-forget; the returned refs let the driver
        # barrier on delivery + collect enqueued counts). Peer messages
        # queue behind the target actor's current run() and execute before
        # its next round — no link string ever crosses the driver.
        enqueue_refs = []
        n_foreign_sent = 0
        if foreign:
            by_owner: dict[int, list[str]] = {}
            for cu in foreign:
                h = host_key(cu)
                owner = self._host_to_shard.get(h,
                                                url_hash64(h) % self.n_shards)
                by_owner.setdefault(owner, []).append(cu)
            for owner, links in sorted(by_owner.items()):
                n_foreign_sent += len(links)
                if self._peers is not None and owner != self.shard_id:
                    enqueue_refs.append(
                        self._peers[owner].enqueue_links.remote(links))
                elif owner == self.shard_id:
                    self.crawler.feed_canonical(links)
                else:  # no peers wired (single-shard/test mode): keep local
                    self.crawler.feed_canonical(links)
        return {
            "shard": self.shard_id,
            "n_saved": len(res.saved),
            "n_seen": len(res.url_seen),
            "batches": [] if raw_dir is not None else tables,
            "files": written,
            "url_seen": res.url_seen if collect_url_seen else None,
            "metrics": dict(self.crawler.metrics),
            "lineage": lineage,
            "enqueue_refs": enqueue_refs,
            "n_foreign_sent": n_foreign_sent,
            "frontier_size": self.crawler.classifier.size(),
            "run_sec": run_sec,
        }


# One long-lived planner pool per driver session (the fixed-size-cluster
# executor model). Reused across run_crawl_sharded calls of the same shard
# count; resized (old pool killed) when the count changes; actors clear()
# their job state between runs so an idle pool holds ~no memory.
_POOL: dict = {"n": 0, "actors": None}


def _planner_pool(n_shards: int, per_shard: int, dedup: str,
                  follow_links: bool) -> tuple[list, bool]:
    """Returns (actors, reused)."""
    if _POOL["actors"] is not None and _POOL["n"] == n_shards:
        try:  # liveness ping — a died/OOM-killed actor poisons the pool
            ray.get([a.__ray_ready__.remote() for a in _POOL["actors"]])
            # un-park: restore full scheduling priority for the new job
            ray.get([a.set_nice.remote(0) for a in _POOL["actors"]])
            return _POOL["actors"], True
        except Exception:
            pass
    shutdown_pool()
    actors = [PlannerShard.remote(i, per_shard, dedup=dedup,
                                  follow_links=follow_links,
                                  n_shards=n_shards)
              for i in range(n_shards)]
    _POOL["n"] = n_shards
    _POOL["actors"] = actors
    return actors, False


def shutdown_pool() -> None:
    if _POOL["actors"] is not None:
        for a in _POOL["actors"]:
            ray.kill(a)
    _POOL["n"] = 0
    _POOL["actors"] = None


def partition_seeds(seed_lines: list[str], n_shards: int) -> list[list[str]]:
    """Route seed lines by hash(lowercased parsed host) — case aliases of
    one physical host MUST co-locate or per-shard seen-sets overlap
    (sum ≠ union) and two shards fetch one host concurrently. Invalid
    lines go to shard 0 so the reject accounting stays complete."""
    parts: list[list[str]] = [[] for _ in range(n_shards)]
    for line in seed_lines:
        s = line.strip()
        if not s:
            continue
        try:
            host = Url(s).host.lower()
        except (UrlParseError, Exception):
            parts[0].append(line)
            continue
        parts[url_hash64(host) % n_shards].append(line)
    return parts


def partition_seeds_balanced(seed_lines: list[str], n_shards: int):
    """Load-aware host→shard assignment: greedy bin-packing of hosts by
    their seed counts (largest first, deterministic ties by host name).
    This is the explicit hot-domain skew handling of the north rule: the
    hot host lands alone-ish in the lightest bin instead of whatever hash
    bucket it fell into. Returns (parts, host_to_shard)."""
    import heapq
    by_host: dict[str, list[str]] = {}
    bad: list[str] = []
    for line in seed_lines:
        s = line.strip()
        if not s:
            continue
        try:
            host = Url(s).host.lower()  # aliases of one host must co-locate
        except (UrlParseError, Exception):
            bad.append(line)
            continue
        by_host.setdefault(host, []).append(line)
    heap = [(0, i) for i in range(n_shards)]
    heapq.heapify(heap)
    host_to_shard: dict[str, int] = {}
    for host in sorted(by_host, key=lambda h: (-len(by_host[h]), h)):
        load, shard = heapq.heappop(heap)
        host_to_shard[host] = shard
        heapq.heappush(heap, (load + len(by_host[host]), shard))
    parts: list[list[str]] = [[] for _ in range(n_shards)]
    for host, lines in by_host.items():
        parts[host_to_shard[host]].extend(lines)
    parts[0].extend(bad)
    return parts, host_to_shard


def host_key(url: str) -> str:
    """Fast lowercase host extraction (portless, bracketless) — the
    shard-ownership key. Matches Url(url).host.lower() for the URL shapes
    the crawl produces."""
    try:
        auth = url.split("/", 3)[2]
    except IndexError:
        return ""
    if auth.startswith("["):
        end = auth.find("]")
        return auth[1:end].lower() if end > 0 else auth.lower()
    at = auth.rfind("@")
    if at != -1:
        auth = auth[at + 1:]
    if auth.count(":") == 1:  # host:port (a bare ipv6 would have ≥2 colons)
        auth = auth[:auth.rfind(":")]
    return auth.lower()


def slice_site(site: SiteGraph, hosts: set[str]) -> SiteGraph:
    """The per-shard slice of the fixture web: only the given (lowercase)
    hosts' responses and robots. On a real cluster there is no site object
    at all — each node talks to the network — so per-shard slices are the
    honest memory model: a shard holds state only for hosts it owns."""
    s = SiteGraph()
    s.hosts = [h for h in site.hosts if h in hosts]
    s.robots = {h: b for h, b in site.robots.items() if h in hosts}
    for url, resp in site.responses.items():
        if host_key(url) in hosts:
            s.responses[url] = resp
    return s


def slice_site_all(site: SiteGraph, host_to_shard: dict,
                   n_shards: int) -> list[SiteGraph]:
    """All shards' slices in ONE pass over the site graph. Calling
    slice_site per shard re-parses every response URL per shard —
    O(n_shards × site); this is O(site) (measured 5.2 s → ~0.4 s at
    30 shards × 10^5 responses)."""
    slices = [SiteGraph() for _ in range(n_shards)]
    for h in site.hosts:
        sh = host_to_shard.get(h)
        if sh is not None:
            slices[sh].hosts.append(h)
    for h, b in site.robots.items():
        sh = host_to_shard.get(h)
        if sh is not None:
            slices[sh].robots[h] = b
    for url, resp in site.responses.items():
        sh = host_to_shard.get(host_key(url))
        if sh is not None:
            slices[sh].responses[url] = resp
    return slices


def run_crawl_sharded(site: SiteGraph, seeds: list[str], parallel: int = 64,
                      n_shards: int = 4, dedup: str = "reference",
                      out_dir: str | None = None,
                      store=None, follow_links: bool = False,
                      raw_dir: str | None = None,
                      store_root: str | None = None,
                      checkpoint_every: int = 0,
                      resume: bool = False,
                      collect_url_seen: bool = False,
                      control_stream=None, control_out=None):
    """Returns (stats: dict, decoded ray.data.Dataset).

    When ``store`` (a TableStore) is given, per-shard metrics and
    per-partition lineage rows are published as versioned tables.
    ``control_stream``/``control_out`` (line streams) attach an S7
    interactive control channel (qlen/status/dumpq/quit) for the run —
    ``quit`` stops the crawl gracefully at the next round barrier."""
    import os
    import pickle
    import sys
    import time as _time

    def _t(label, t0):
        if os.environ.get("MYC_TIMING"):
            print(f"[crawl_sharded] {label}: {_time.perf_counter() - t0:.2f}s",
                  file=sys.stderr, flush=True)
        return _time.perf_counter()

    t0 = _time.perf_counter()
    per_shard = max(1, parallel // n_shards)
    parts, host_to_shard = partition_seeds_balanced(seeds, n_shards)
    # hosts that have no seeds yet (reachable only via discovery) still
    # need an owner AND their fixture data in that owner's slice —
    # otherwise link-following dies at the first unseeded host
    known_hosts = set(host_to_shard)
    for h in site.robots:
        if h not in known_hosts:
            host_to_shard[h] = url_hash64(h) % n_shards
            known_hosts.add(h)
    for url in site.responses:
        h = host_key(url)
        if h and h not in known_hosts:
            host_to_shard[h] = url_hash64(h) % n_shards
            known_hosts.add(h)
    t0 = _t("partition", t0)
    # per-shard site slices: each shard holds only its hosts' fixture data
    # (slicing is O(site); shipping+loading drops from O(site) PER SHARD
    # to O(site/n_shards), which is what makes bring-up scale)
    slice_refs = [ray.put(pickle.dumps(sl, protocol=5))
                  for sl in slice_site_all(site, host_to_shard, n_shards)]
    t0 = _t("slice+put", t0)
    shards, _reused = _planner_pool(n_shards, per_shard, dedup, follow_links)
    control = None
    if control_stream is not None:
        import sys as _sys

        from ..control import ControlChannel
        control = ControlChannel(shards, control_stream,
                                 control_out or _sys.stderr)
    resumed = ray.get([s.load_site.remote(ref, host_to_shard,
                                          store_root, checkpoint_every,
                                          resume, parallel=per_shard,
                                          dedup=dedup,
                                          follow_links=follow_links,
                                          n_shards=n_shards)
                       for s, ref in zip(shards, slice_refs)])
    if n_shards > 1:
        ray.get([s.set_peers.remote(shards) for s in shards])
    t0 = _t("spawn+load", t0)
    # a resumed shard's frontier/seen state came from its checkpoint —
    # re-feeding the seed list would enqueue everything twice
    ray.get([s.feed.remote(p)
             for s, p, r in zip(shards, parts, resumed) if not r])
    t0 = _t("feed", t0)

    if raw_dir is None and out_dir is not None:
        raw_dir = out_dir + ".raw"
    if raw_dir is not None and not resume:
        import shutil
        shutil.rmtree(raw_dir, ignore_errors=True)
    all_tables = []
    all_files = []
    url_seen: set[str] = set()
    n_rounds = 0
    lineage_rows = []
    results = []
    while True:
        n_rounds += 1
        results = ray.get([s.run.remote(raw_dir, n_rounds,
                                        collect_url_seen=collect_url_seen)
                           for s in shards])
        enqueue_refs = []
        pending_local = 0
        for r in results:
            all_tables.extend(r["batches"])
            all_files.extend(r["files"])
            if collect_url_seen and r["url_seen"] is not None:
                url_seen |= r["url_seen"]
            enqueue_refs.extend(r["enqueue_refs"])
            pending_local += r["frontier_size"]
            for ln in r["lineage"]:
                lineage_rows.append({**ln, "round": n_rounds})
        # barrier on peer deliveries (counters only — link strings flow
        # shard→shard, never through the driver)
        fed = sum(ray.get(enqueue_refs)) if enqueue_refs else 0
        if fed == 0 and pending_local == 0:
            break
        if control is not None and control.stop.is_set():
            break  # S7 quit: graceful stop at the round barrier
    t0 = _t("run+rounds", t0)
    # shards are done (row data is on disk / in driver-held tables): drop
    # their job state NOW so the idle pool holds ~no memory for the rest
    # of the job (a leaked 32-actor pool per crawl was the round-1
    # driver-bench slowdown), but keep the PROCESSES — cold-starting a
    # fresh 30-worker pool mid-session costs 5-31 s once Ray Data tasks
    # have consumed the prestarted workers, and a fixed-size cluster's
    # executors are long-lived anyway.
    # Drop job state and park the pool at lowest priority (idle Ray
    # workers busy-poll on this box — see PlannerShard.set_nice; an
    # unparked pool measurably triples the following decode+write stage).
    # Fire-and-forget: per-actor FIFO ordering guarantees both complete
    # before any later job's calls on the same actors.
    for s in shards:
        s.clear.remote()
        s.set_nice.remote(19)
    del slice_refs
    # shard-level counters are cumulative; take the final round's values
    n_saved = sum(r["n_saved"] for r in results)
    metrics_rows = [{"shard": r["shard"], "rounds": n_rounds, **r["metrics"]}
                    for r in results]
    # sustained (steady-state) crawl wall: the slowest shard's in-crawl
    # time, excluding cluster bring-up (actor spawn / site distribution) —
    # the BASELINE.md "sustained fetch+dedup throughput" surface
    sustained_sec = max(r["run_sec"] for r in results)
    run_secs = sorted(r["run_sec"] for r in results)
    if store is not None:
        v = (store.latest_version("metrics") or 0) + 1
        store.write("metrics", pa.Table.from_pylist(metrics_rows), v)
        if lineage_rows:
            store.write("lineage", pa.Table.from_pylist(lineage_rows), v)

    if resume and store_root is not None:
        # the complete row log (pre-preemption + post-resume) lives in the
        # per-shard stores as published versions; read those instead of the
        # per-run raw files
        import glob
        files = sorted(glob.glob(os.path.join(
            store_root, "shard=*", "fetched_raw", "v*", "*.parquet")))
        all_files = [f for f in files if os.path.exists(
            os.path.join(os.path.dirname(f), "_OK"))]
        all_tables = []

    import ray.data as rd
    if all_files:
        # shard-written partitioned parquet: the decode pipeline reads it
        # in parallel; row data never flows through the driver. One block
        # per shard file: Ray Data's default parallelism target would
        # split these ~5 MB files 5-ways into ~600-row blocks, and the
        # decode stage then pays 5x the per-task fixed cost for no extra
        # parallelism (files already ≥ CPU count at every real scale).
        # read_parquet_bulk, not read_parquet: the latter's datasource
        # SAMPLES up to 10 fragments on the driver's critical path —
        # each sample reads ~1024 rows of these WIDE BINARY crawl rows —
        # to estimate an encoding ratio we don't need (block count is
        # pinned to the file fan; the shards just wrote the files, so
        # sizes/schema are known). Measured 22-33 s of pure sampling
        # stall at sf0.1 right after the planner pool parks.
        ds = rd.read_parquet_bulk(all_files,
                                  override_num_blocks=max(len(all_files), 1))
    elif all_tables:
        # single concat avoids per-tiny-table dataset overhead
        ds = rd.from_arrow(pa.concat_tables(all_tables))
    else:
        from .crawl import FETCHED_SCHEMA
        ds = rd.from_arrow(FETCHED_SCHEMA.empty_table())
    t0 = _t("dataset-build", t0)
    ds = ds.map_batches(DecodeValidate(), batch_format="pyarrow",
                        batch_size=512)
    if out_dir is not None:
        ds.write_parquet(out_dir)
        ds = rd.read_parquet(out_dir)
    t0 = _t("decode-write", t0)
    # hosts are disjoint across shards, so per-shard seen counts sum
    # exactly; the url string set itself is test-only (flag-gated)
    stats = {"n_saved": n_saved,
             "n_seen": (len(url_seen) if collect_url_seen
                        else sum(r["n_seen"] for r in results)),
             "n_shards": n_shards, "parallel": parallel,
             "url_seen": url_seen if collect_url_seen else None,
             "n_rounds": n_rounds,
             "metrics": metrics_rows, "lineage": lineage_rows,
             "sustained_sec": sustained_sec, "run_secs": run_secs}
    return stats, ds
