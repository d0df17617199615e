"""Distributed crawl pipeline: deterministic planner + Ray fetch actor pool
+ Ray Data decode/validate/write, with per-wave checkpointing.

Architecture (SURVEY.md §3.1 rebuild DAG, adapted for provable parity):

- **Planner** — the serial reference state machine (simulator.py, itself a
  port of crawler.cc:798-1064 + Url_classifier). It handles only URL
  metadata: peek/normalize/robots-decide/assign. Scheduling is therefore
  *data-deterministic*: the (wave, handle) key of every transfer is a pure
  function of the seed list + politeness budget + robots/HEAD outcomes —
  never of wall-clock — which is what makes the distributed run reproduce
  the serial reference order exactly.
- **Fetch actor pool** — ``FetcherActor`` (@ray.remote) holds the transport
  (site graph broadcast once via ``ray.put``, read in ``__init__`` — never
  re-shipped per batch). Each wave's in-flight set (≤ politeness budget N)
  is partitioned across the pool and fetched concurrently; completions are
  applied in handle-id order, exactly like the reference event loop drains
  curl completions.
- **Decode/validate/write** — fetched rows flush as Arrow batches into the
  object store; a ``ray.data`` pipeline (from_arrow_refs → map_batches
  DecodeValidate → write) streams them through decode without the planner
  ever touching pixel data.
- **Checkpoint/resume** — at wave boundaries the planner state (classifier,
  handle machines, robots cache, seen shards, save counter) is a pickleable
  snapshot; flushed batches are published as store versions. A killed run
  restores the snapshot and continues; output is byte-identical (no
  wall-clock in any row; ``crawled`` stamps are the logical wave counter).

Scale notes (10^10 frontier): the planner holds only queue HEADS; the tail
lives in the frontier table and is re-fed per round. At cluster scale the
single planner shards by ``hash(raw_host) % n_planners`` (each planner owns
disjoint hosts + its slice of handle ids, preserving per-host ordering;
cross-shard global order is then only per-shard deterministic — exact
global reference parity requires the single-planner mode, which is the
parity/test configuration).
"""

from __future__ import annotations

import pyarrow as pa

import ray

from ..corpus import USER_AGENT, SiteGraph
from ..hashing import url_hash64_many
from ..simulator import ReferenceSimulator, SavedDoc
from ..state.store import TableStore
from ..state.urlseen import UrlSeen
from ..stages.decode import DecodeValidate
from ..transport import FetchResult, FixtureTransport

FETCHED_SCHEMA = pa.schema([
    ("seq", pa.int64()),
    ("tick", pa.int64()),
    ("handle", pa.int32()),
    ("url", pa.string()),
    ("eff_url", pa.string()),
    ("http_code", pa.int32()),
    ("curl_code", pa.int32()),
    ("curl_error", pa.string()),
    ("content_type", pa.int32()),
    ("content", pa.binary()),
    ("headers", pa.string()),
    ("charset", pa.string()),
    ("crawled", pa.int64()),   # logical stamp = wave counter (resumability)
    ("url_hash", pa.uint64()),
])


def saved_docs_to_table(docs: list[SavedDoc]) -> pa.Table:
    cols = {
        "seq": [d.seq for d in docs],
        "tick": [d.tick for d in docs],
        "handle": [d.handle for d in docs],
        "url": [d.url for d in docs],
        "eff_url": [d.eff_url for d in docs],
        "http_code": [d.http_code for d in docs],
        "curl_code": [d.curl_code for d in docs],
        "curl_error": [d.curl_error for d in docs],
        "content_type": [d.content_type for d in docs],
        "content": [d.content for d in docs],
        "headers": [d.headers for d in docs],
        "charset": [d.charset for d in docs],
        "crawled": [d.tick for d in docs],
    }
    arrays = [pa.array(cols[f.name], f.type) for f in FETCHED_SCHEMA
              if f.name != "url_hash"]
    arrays.append(pa.array(url_hash64_many(cols["url"]), pa.uint64()))
    return pa.Table.from_arrays(arrays, schema=FETCHED_SCHEMA)


@ray.remote
class FetcherActor:
    """One connection-pool worker; transport state built once per actor.

    The site arrives via ``load_site`` (a method call resolves the blob ref
    through local plasma; a large actor-CONSTRUCTOR arg would crawl through
    the GCS actor-creation path — see crawl_sharded.PlannerShard)."""

    def __init__(self):
        self.transport = None

    def load_site(self, site_blob) -> bool:
        import pickle
        site = site_blob
        if isinstance(site, (bytes, memoryview)):
            site = pickle.loads(site)
        self.transport = FixtureTransport(site)
        return True

    def load_socket(self, addr, ca_pem: bytes | None = None,
                    pool: int = 1, dns_addr: tuple | None = None) -> bool:
        """Real-TCP mode: fetch over sockets (httpfixture server / any
        SocketTransport-convention endpoint). No site object is shipped
        anywhere — the actor holds only connections, which is exactly
        the real-internet deployment shape. ``ca_pem`` (a PEM trust
        root) enables https: each actor builds its own fully-verifying
        SSLContext locally — contexts hold OS handles and never cross
        process boundaries, only the PEM bytes do.

        ``pool`` > 1: wire requests within one wave run CONCURRENTLY
        over that many threads, each owning a persistent keep-alive
        SocketTransport (the curl multi-handle shape: connections ∝
        concurrency, not ∝ requests). Safe because the planner's
        politeness holds one in-flight transfer per host, so a wave
        never carries two same-host requests; results are re-ordered by
        request index, so the wave outcome is bit-identical to the
        serial path (pinned by test_fetch_pool_threads_parity). Default
        1 (serial): on loopback, per-request cost is GIL-bound header
        parsing, and threads measurably LOSE (3.0k → 2.7k req/s at 120
        hosts); the pool is for real-RTT deployments where requests are
        network-wait-bound."""
        import threading
        from concurrent.futures import ThreadPoolExecutor

        from ..transport import SocketTransport
        ctx = None
        if ca_pem is not None:
            from ..tlscert import make_client_context
            ctx = make_client_context(bytes(ca_pem))
        resolver = None
        if dns_addr is not None:
            # one resolver (= one DNS cache) per actor, shared across the
            # pool threads — DnsResolver is lock-guarded by design
            from ..dnsfixture import DnsResolver
            resolver = DnsResolver(tuple(dns_addr))
        self.transport = SocketTransport(addr, ssl_context=ctx,
                                         dns_resolver=resolver)

        _local = threading.local()

        def _thread_transport():
            t = getattr(_local, "transport", None)
            if t is None:
                t = SocketTransport(addr, ssl_context=ctx,
                                    dns_resolver=resolver)
                _local.transport = t
            return t

        self._thread_transport = _thread_transport
        self._executor = ThreadPoolExecutor(max_workers=pool) \
            if pool > 1 else None
        return True

    @staticmethod
    def _one(transport, req: tuple) -> tuple:
        idx, kind, url, etag, ims = req
        if kind == 1:  # ROBOTS
            host = url.split("/")[2]
            fr = transport.fetch_robots(host, scheme=url.split(":", 1)[0])
        elif kind == 3:  # HEAD
            fr = transport.request(url, method="HEAD")
        else:  # CONTENT
            fr = transport.request(url, method="GET", if_none_match=etag,
                                   if_modified_since=ims)
        return (idx, (fr.curl_code, fr.http_code, fr.eff_url, fr.headers,
                      fr.content, fr.curl_error, fr.outlinks))

    def fetch_batch(self, reqs: list[tuple]) -> list[tuple]:
        """reqs: [(idx, kind, url, etag, ims)] → [(idx, FetchResult-tuple)],
        in request order. Socket mode fans the wave out over the
        connection-pool threads (see load_socket); fixture mode stays
        serial (in-process lookups have nothing to overlap)."""
        ex = getattr(self, "_executor", None)
        if ex is not None and len(reqs) > 1:
            return list(ex.map(
                lambda r: self._one(self._thread_transport(), r), reqs))
        return [self._one(self.transport, r) for r in reqs]


class RayCrawler(ReferenceSimulator):
    """Planner with batched-parallel transfers and checkpointing.

    ``dedup``: 'reference' (parity; duplicate seeds re-fetched, matching the
    reference's dead load_url path) or 'cuckoo' (bloom/cuckoo URL-seen
    filter drops already-seen canonical URLs at ingest — the north-star
    scale behavior).
    """

    def __init__(self, site: SiteGraph, parallel: int = 20,
                 n_fetchers: int = 4, user_agent: str = USER_AGENT,
                 store: TableStore | None = None,
                 checkpoint_every: int = 0,
                 flush_rows: int = 2048,
                 dedup: str = "reference",
                 seen_shards: int = 4,
                 follow_links: bool = False,
                 honor_crawl_delay: bool = False,
                 refresh_from: dict | None = None,
                 transport_addr: tuple | None = None,
                 transport_ca: bytes | None = None,
                 transport_dns: tuple | None = None,
                 schemes: tuple = ("http",),
                 robots_matcher: str = "reference"):
        super().__init__(site, parallel=parallel, user_agent=user_agent,
                         dedup=dedup, seen_shards=seen_shards,
                         follow_links=follow_links,
                         honor_crawl_delay=honor_crawl_delay,
                         refresh_from=refresh_from, schemes=schemes,
                         robots_matcher=robots_matcher)
        # real-TCP fetch pool: fetchers connect to this address instead of
        # receiving the site fixture (the production shape — see
        # FetcherActor.load_socket)
        self.transport_addr = transport_addr
        self.transport_ca = transport_ca
        self.transport_dns = transport_dns
        self.site = site
        self.n_fetchers = n_fetchers
        self.store = store
        self.checkpoint_every = checkpoint_every
        self.flush_rows = flush_rows
        self._batch_refs: list = []
        self._flushed_rows = 0
        self._flush_version = 0
        self._fetchers = None
        self._site_ref = None

    # ---- wave execution ----
    def _ensure_fetchers(self):
        if self._fetchers is None:
            self._fetchers = [FetcherActor.remote()
                              for _ in range(self.n_fetchers)]
            if self.transport_addr is not None:
                ray.get([f.load_socket.remote(self.transport_addr,
                                              self.transport_ca,
                                              dns_addr=self.transport_dns)
                         for f in self._fetchers])
            else:
                import pickle
                self._site_ref = ray.put(pickle.dumps(self.site, protocol=5))
                ray.get([f.load_site.remote(self._site_ref)
                         for f in self._fetchers])

    def _run_wave(self) -> bool:
        """Complete all in-flight transfers (one logical tick). Returns
        False when nothing was in flight."""
        if self.n_fetchers <= 0:
            # inline mode (sharded planner actors): identical hot path to
            # the serial engine — no snapshot/dict/tuple bookkeeping
            # (_complete counts the request metrics itself)
            progressed = False
            for h in self.handles:
                if h.inflight is not None:
                    if not progressed:
                        self._tick += 1
                        progressed = True
                    self._complete(h)
            if not progressed:
                return False
            for h in self.handles:
                if h.inflight is None:
                    self._reschedule(h)
            return True
        inflight = [(h.hid, *h.inflight) for h in self.handles
                    if h.inflight is not None]
        if not inflight:
            return False
        self._tick += 1
        reqs = [(i, kind, url, etag, ims)
                for i, (_, kind, url, etag, ims) in enumerate(inflight)]
        self._ensure_fetchers()
        chunks = [[] for _ in self._fetchers]
        for r in reqs:
            chunks[r[0] % len(chunks)].append(r)
        futures = [f.fetch_batch.remote(c)
                   for f, c in zip(self._fetchers, chunks) if c]
        results = {}
        for part in ray.get(futures):
            for idx, tup in part:
                results[idx] = tup
        # request-kind metrics (the inline path counts in _complete)
        for _, kind, *_rest in inflight:
            key = {1: "n_robots", 3: "n_head"}.get(kind, "n_get")
            self.metrics[key] += 1
        # apply completions in handle-id order — the reference event loop's
        # deterministic drain order for our parity model
        for i, (hid, kind, url, _etag, _ims) in enumerate(inflight):
            h = self.handles[hid]
            h.inflight = None
            cc, http, eff, headers, content, cerr, outlinks = results[i]
            fr = FetchResult(cc, http, eff, headers, content, cerr,
                             outlinks=tuple(outlinks))
            self._done(h, kind, fr)
        for h in self.handles:
            if h.inflight is None:
                self._reschedule(h)
        return True

    def _maybe_flush(self, force: bool = False) -> None:
        pending = len(self.result.saved) - self._flushed_rows
        if pending <= 0 or (pending < self.flush_rows and not force):
            return
        docs = self.result.saved[self._flushed_rows:]
        tbl = saved_docs_to_table(docs)
        self._flushed_rows = len(self.result.saved)
        self._flush_version += 1
        if self.store is not None:
            self.store.write("fetched_raw", tbl, self._flush_version)
        self._batch_refs.append(ray.put(tbl))

    # ---- checkpoint ----
    def _snapshot(self) -> dict:
        handles = []
        for h in self.handles:
            handles.append({
                "hid": h.hid, "state": h.state,
                "robots": h.robots.to_record() if h.robots is not None else None,
                "robots_host": h.robots_host, "cur_url": h.cur_url,
                "inflight": h.inflight,
            })
        return {
            "tick": self._tick,
            "classifier": self.classifier.to_records(),
            "n_queues": self.classifier.n_queues,
            "handles": handles,
            "saved_flushed": self._flushed_rows,
            "flush_version": self._flush_version,
            "url_seen": sorted(self.result.url_seen),
            "seen_state": ([s.to_state() for s in self.seen.shards]
                           if self.seen else None),
            "dedup": self.dedup,
            "parallel": len(self.handles),
            "next_allowed": dict(self._next_allowed),
            "metrics": dict(self.metrics),
            "follow_links": self.follow_links,
            "honor_crawl_delay": self.honor_crawl_delay,
        }

    def checkpoint(self, version: int) -> None:
        if self.store is None:
            raise RuntimeError("no store configured")
        self._maybe_flush(force=True)
        snap = self._snapshot()
        # Version numbers must be MONOTONIC for restore (newest blob wins)
        # and for vacuum (oldest dropped): the flush_version*1000+waves
        # scheme resets ``waves`` after a resume, so a fresh post-resume
        # snapshot could otherwise sort BELOW stale pre-crash blobs —
        # vacuum would delete the new one and restore the old. Bump past
        # the newest existing blob instead (a redundant snapshot on exact
        # replays is harmless; snapshots are cumulative and vacuumed).
        vs = self.store.blob_versions("crawl_ckpt")
        if vs and version <= vs[-1]:
            version = vs[-1] + 1
        self.store.write_blob("crawl_ckpt", version, snap)
        # snapshots are cumulative (restore reads only the newest blob);
        # bound checkpoint growth over long crawls. fetched_raw versions
        # are DELTAS and are never vacuumed — resume replays all of them.
        self.store.vacuum_blobs("crawl_ckpt", keep_last=2)

    @classmethod
    def restore(cls, site: SiteGraph, store: TableStore,
                version: int | None = None, **kw) -> "RayCrawler":
        from ..frontier import UrlClassifier
        from ..robots import RobotsEntry
        from ..simulator import _Handle
        if version is None:
            version = store.blob_versions("crawl_ckpt")[-1]
        snap = store.read_blob("crawl_ckpt", version)
        c = cls(site, parallel=snap["parallel"], store=store,
                dedup=snap["dedup"],
                follow_links=snap.get("follow_links", False),
                honor_crawl_delay=snap.get("honor_crawl_delay", False),
                **kw)
        c._tick = snap["tick"]
        c._next_allowed = dict(snap.get("next_allowed", {}))
        c.metrics.update(snap.get("metrics", {}))
        c.classifier = UrlClassifier.from_records(snap["n_queues"],
                                                  snap["classifier"])
        c.handles = []
        for hrec in snap["handles"]:
            h = _Handle(hrec["hid"])
            h.state = hrec["state"]
            h.robots = (RobotsEntry.from_record(hrec["robots"])
                        if hrec["robots"] is not None else None)
            h.robots_host = hrec["robots_host"]
            h.cur_url = hrec["cur_url"]
            h.inflight = tuple(hrec["inflight"]) if hrec["inflight"] else None
            c.handles.append(h)
        c._flushed_rows = snap["saved_flushed"]
        c._flush_version = snap["flush_version"]
        c.result.url_seen = set(snap["url_seen"])
        # saved rows up to the checkpoint live in the store as versions;
        # keep the in-memory log aligned by a placeholder offset
        c.result.saved = [None] * snap["saved_flushed"]  # type: ignore
        if snap["seen_state"] is not None:
            from ..state.urlseen import UrlSeenShard
            c.seen = UrlSeen(n_shards=len(snap["seen_state"]))
            c.seen.shards = [UrlSeenShard.from_state(s)
                             for s in snap["seen_state"]]
        return c

    # ---- run ----
    def run(self, max_ticks: int = 1_000_000, stop_after_waves: int = 0):
        """Crawl until the frontier drains. ``stop_after_waves`` (>0) stops
        gracefully after that many waves — the preemption hook used by the
        resume tests (state is checkpointable at any wave boundary)."""
        for h in self.handles:
            if h.inflight is None:
                self._reschedule(h)
        waves = 0
        while self._run_wave() or self._advance_past_delays():
            waves += 1
            if waves > max_ticks:
                raise RuntimeError("crawler did not converge")
            self._maybe_flush()
            if (self.checkpoint_every and self.store is not None
                    and waves % self.checkpoint_every == 0):
                self.checkpoint(self._flush_version * 1000 + waves)
            if stop_after_waves and waves >= stop_after_waves:
                break
        self._maybe_flush(force=True)
        return self.result

    def run_daemon(self, seed_poll=None, idle_grace: float | None = None,
                   poll_interval: float = 0.02,
                   max_events: int = 10_000_000,
                   checkpoint_every_events: int = 0):
        """Continuous (daemon-mode) crawl: a per-completion event loop
        with live seed ingest and NO wave barrier — the reference's
        long-running shape, where ``event_dispatch`` (crawler.cc:1428)
        drains curl completions and re-arms each handle immediately
        (crawler.cc:1222-1230 reschedule loop) while the TCP seed
        channel pushes into the frontier concurrently
        (crawler.cc:1281 connection_read_cb → Url_classifier::push).

        Each handle's transfer is its own single-request future on the
        fetcher pool; ``ray.wait(num_returns=1)`` applies completions as
        they land, so a slow transfer never gates the rest of the fleet
        and freshly-ingested URLs start fetching while older transfers
        are still in flight. Per-host FIFO + the one-in-flight-per-host
        politeness invariant are preserved by construction (a host's
        queue is bound to one handle), so per-host crawl order matches
        the wave engine; GLOBAL completion order is event-driven, which
        is exactly the reference's behavior and why daemon mode is not
        the bit-parity configuration (``run`` is).

        ``seed_poll``: zero-arg callable → newly arrived seed lines
        ([] when idle, None once the channel is closed and drained) —
        e.g. ``TcpSeedListener.poll_lines``. The loop exits when nothing
        is in flight, the frontier is drained, and the channel is closed
        (or, with ``idle_grace`` set, after that many idle seconds).
        """
        import time as _time
        self._ensure_fetchers()
        if not checkpoint_every_events and self.checkpoint_every \
                and self.store is not None:
            # honor the constructor's wave-denominated checkpoint_every
            # (what run() uses): one wave ≈ one completion per handle
            checkpoint_every_events = \
                self.checkpoint_every * max(1, len(self.handles))
        futures: dict = {}   # ObjectRef -> hid
        live: set[int] = set()   # hids with an outstanding future

        def pump() -> bool:
            for h in self.handles:
                if h.inflight is None and h.hid not in live:
                    self._reschedule(h)
            started = False
            for h in self.handles:
                if h.inflight is not None and h.hid not in live:
                    kind, url, etag, ims = h.inflight
                    f = self._fetchers[h.hid % len(self._fetchers)]
                    fut = f.fetch_batch.remote(
                        [(h.hid, kind, url, etag, ims)])
                    futures[fut] = h.hid
                    live.add(h.hid)
                    started = True
            return started

        events = 0
        closed = seed_poll is None
        idle_since = None
        pump()
        while True:
            if not closed:
                lines = seed_poll()
                if lines is None:
                    closed = True
                elif lines:
                    self.feed(lines)
                    self.metrics["n_live_seeds"] = \
                        self.metrics.get("n_live_seeds", 0) + len(lines)
                    idle_since = None
            pump()
            if not futures:
                if self._advance_past_delays():
                    pump()
                    continue
                if closed:
                    break
                if idle_grace is not None:
                    if idle_since is None:
                        idle_since = _time.monotonic()
                    elif _time.monotonic() - idle_since > idle_grace:
                        break
                _time.sleep(poll_interval)
                continue
            done, _ = ray.wait(list(futures), num_returns=1,
                               timeout=poll_interval)
            for fut in done:
                hid = futures.pop(fut)
                live.discard(hid)
                h = self.handles[hid]
                kind = h.inflight[0]
                # 1=ROBOTS, 3=HEAD (FetcherActor._one's kind codes)
                self.metrics[{1: "n_robots", 3: "n_head"}
                             .get(kind, "n_get")] += 1
                (_idx, tup), = ray.get(fut)
                h.inflight = None
                self._tick += 1   # logical stamp = completion event count
                events += 1
                if events > max_events:
                    raise RuntimeError("daemon crawl did not converge")
                cc, http, eff, headers, content, cerr, outlinks = tup
                self._done(h, kind, FetchResult(
                    cc, http, eff, headers, content, cerr,
                    outlinks=tuple(outlinks)))
                if (checkpoint_every_events and self.store is not None
                        and events % checkpoint_every_events == 0):
                    # event-boundary checkpoint: a daemon has no wave
                    # boundaries, but any completion boundary is a
                    # consistent snapshot (in-flight transfers are
                    # recorded and re-issued on restore)
                    self.checkpoint(self._flush_version * 1000 + events)
            self._maybe_flush()
        self._maybe_flush(force=True)
        return self.result

    # ---- output dataset ----
    def fetched_dataset(self):
        """ray.data Dataset over all flushed fetch batches."""
        import ray.data as rd
        if not self._batch_refs and self.store is not None:
            vs = self.store.versions("fetched_raw")
            tables = [self.store.read("fetched_raw", v) for v in vs]
            return rd.from_arrow(tables) if tables else rd.from_arrow(
                FETCHED_SCHEMA.empty_table())
        if not self._batch_refs:
            return rd.from_arrow(FETCHED_SCHEMA.empty_table())
        return rd.from_arrow_refs(list(self._batch_refs))


def run_crawl(site: SiteGraph, seeds: list[str], parallel: int = 20,
              n_fetchers: int = 4, out_dir: str | None = None,
              store: TableStore | None = None, dedup: str = "reference",
              decode_concurrency: int = 4, checkpoint_every: int = 0):
    """End-to-end: plan+fetch, then stream decode/validate (+ optional
    parquet write). Returns (CrawlResult, decoded ray.data.Dataset)."""
    crawler = RayCrawler(site, parallel=parallel, n_fetchers=n_fetchers,
                         store=store, dedup=dedup,
                         checkpoint_every=checkpoint_every)
    crawler.feed(seeds)
    result = crawler.run()
    ds = crawler.fetched_dataset()
    ds = ds.map_batches(DecodeValidate(), batch_format="pyarrow",
                        batch_size=256)
    if out_dir is not None:
        ds.write_parquet(out_dir)
        import ray.data as rd
        ds = rd.read_parquet(out_dir)
    return result, ds
