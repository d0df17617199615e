"""Serial reference-crawler simulator: the crawl-order / URL-seen oracle.

A faithful, deterministic port of the reference crawler's control flow
(/root/reference/src/crawler/crawler.cc) over the FixtureTransport:

- ingest filter:        process_input_buff (:1281-1332) — parse line as Url,
  accept only absolute ``http``;
- frontier:             the ported UrlClassifier (Url_classifier.cc);
- per-handle machine:   EasyHandle states IDLE/ROBOTS/NEXT/HEAD/CONTENT and
  the done() transitions (:860-1064) including the NEXT-loop robots /
  preexistence / allowed dispatch (:1009-1060);
- reschedule:           (:798-850) — robots fetched whenever the handle is
  IDLE/ROBOTS for the peeked host;
- preexistence:         Doc::load_url always returns false in the reference
  (Doc.cc:83-156 — SURVEY.md S3), so the revalidation branch is dead there;
  we model the same (``preexisting=False``).

Determinism model (replacing wall-clock curl completions): logical ticks.
``reschedule`` only *starts* a transfer; each tick completes the in-flight
transfer of every handle in handle-id order, runs ``done()`` (which may
start the next transfer for the following tick). The resulting save order
``(tick, handle_id)`` is the reference crawl order the distributed pipeline
must reproduce (it derives the same keys from data, not from timing).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from .corpus import USER_AGENT, SiteGraph
from .frontier import FrontierEmpty, UrlClassifier
from .hashing import url_hash64
from .http_headers import ContentType, acceptable, parse_http_headers
from .robots import RobotsEntry, RobotsState
from .transport import CURLE_OK, FetchResult, FixtureTransport
from .urlcanon import Url, UrlParseError

IDLE, ROBOTS, NEXT, HEAD, CONTENT = range(5)


@dataclass
class SavedDoc:
    """One Doc::save upsert (Doc.cc:15-81 field set, graft payload)."""
    seq: int
    tick: int
    handle: int
    url: str
    eff_url: str
    http_code: int
    curl_code: int
    curl_error: str
    content_type: int
    content: bytes
    headers: str
    charset: str = ""


@dataclass
class _Handle:
    hid: int
    state: int = IDLE
    robots: RobotsEntry | None = None
    robots_host: str = ""
    cur_url: str = ""           # normalized target url (doc->url)
    inflight: tuple | None = None   # (kind, url) transfer started, completes next tick


@dataclass
class CrawlResult:
    saved: list[SavedDoc] = field(default_factory=list)
    url_seen: set[str] = field(default_factory=set)
    rejected_seeds: list[str] = field(default_factory=list)
    robots_decisions: list[tuple] = field(default_factory=list)  # (host, path, allowed)

    @property
    def url_seen_hashes(self) -> set[int]:
        return {url_hash64(u) for u in self.url_seen}


def ingest_filter(lines: list[str], schemes: tuple = ("http",)):
    """process_input_buff semantics: returns (accepted: list[Url],
    rejected). The reference gate is http-only (crawler.cc:1297) — the
    default; pass ``("http", "https")`` for a TLS-enabled crawl."""
    accepted, rejected = [], []
    for line in lines:
        line = line.strip()
        if not line:
            continue
        try:
            u = Url(line)
        except UrlParseError:
            rejected.append(line)
            continue
        if u.absolute and u.scheme in schemes:
            accepted.append(u)
        else:
            rejected.append(line)
    return accepted, rejected


class ReferenceSimulator:
    """Reference-parity crawl engine (serial form).

    Extensions beyond strict reference parity, each off by default:

    - ``dedup='cuckoo'``: bloom/cuckoo URL-seen filter drops already-seen
      canonical URLs at ingest/discovery (north-rule behavior; the
      reference's load_url dedup is dead code).
    - ``follow_links=True``: resolve each fetched page's outlinks (RFC 3986
      merge, M12 semantics) and enqueue novel ones — the multi-round
      frontier. Requires ``dedup='cuckoo'`` (the reference has no working
      dedup, so following links would loop).
    - ``honor_crawl_delay=True``: per-host token gap from robots
      Crawl-delay (parsed-but-unused in the reference, Robots.hh:48 todo);
      one logical tick ≙ one second.
    - ``refresh_from={canon_url: (etag, last_modified)}``: conditional
      revalidation (T6, crawler.cc:1138-1155) — preexisting URLs go
      straight to CONTENT with If-None-Match / If-Modified-Since and a 304
      is saved without a body.
    """

    def __init__(self, site: SiteGraph, parallel: int = 20,
                 user_agent: str = USER_AGENT, dedup: str = "reference",
                 seen_shards: int = 4, follow_links: bool = False,
                 honor_crawl_delay: bool = False,
                 refresh_from: dict | None = None,
                 transport=None, schemes: tuple = ("http",),
                 robots_matcher: str = "reference"):
        # transport is pluggable (same 2-method interface): the in-process
        # FixtureTransport by default, or SocketTransport for real-TCP
        # fetching — the planner is transport-agnostic by construction
        self.transport = transport if transport is not None \
            else FixtureTransport(site)
        self.classifier = UrlClassifier(parallel)
        self.handles = [_Handle(i) for i in range(parallel)]
        self.user_agent = user_agent
        self.result = CrawlResult()
        self._tick = 0
        self.dedup = dedup
        self.follow_links = follow_links
        self.honor_crawl_delay = honor_crawl_delay
        self.refresh_from = refresh_from or {}
        # accepted URL schemes (seed ingest + outlink gate); the
        # reference accepts http only — https is the TLS-transport
        # extension (opt-in, so reference parity holds on defaults)
        self.schemes = tuple(schemes)
        # robots rule discipline: "reference" (first group, first prefix
        # rule — Robots.cc parity, the default) or "rfc9309" (wildcards,
        # anchors, longest-match — the modern-web opt-in)
        if robots_matcher not in ("reference", "rfc9309"):
            raise ValueError(f"robots_matcher {robots_matcher!r}")
        self.robots_matcher = robots_matcher
        if follow_links and dedup != "cuckoo":
            raise ValueError("follow_links requires dedup='cuckoo' "
                             "(the reference has no working dedup)")
        self.seen = None
        if dedup == "cuckoo":
            from .state.urlseen import UrlSeen
            self.seen = UrlSeen(n_shards=seen_shards)
        self._next_allowed: dict[str, int] = {}  # host → earliest tick
        self.foreign_links: list[str] = []       # canon urls for other shards
        self.metrics = {"n_robots": 0, "n_head": 0, "n_get": 0, "n_304": 0,
                        "n_saved": 0, "bytes_dl": 0, "n_discovered": 0,
                        "n_dropped_seen": 0}
        # normalize memo: every queued URL is normalized at least twice
        # (NEXT-loop probe + reschedule peek); cache (canon, host, path)
        self._norm_cache: dict[str, tuple[str, str, str]] = {}

    def _norm(self, raw: str) -> tuple[str, str, str]:
        hit = self._norm_cache.get(raw)
        if hit is None:
            u = Url(raw).normalize()
            hit = (u.get(), u.host, u.path.get())
            self._norm_cache[raw] = hit
        return hit

    # ---- ingest ----
    def feed(self, seed_lines: list[str]) -> None:
        accepted, rejected = ingest_filter(seed_lines, self.schemes)
        self.result.rejected_seeds.extend(rejected)
        # pre-warm the normalize memo from the ALREADY-PARSED Url objects:
        # _norm would otherwise re-parse every queued string from scratch
        # on first peek (copy+normalize is ~half the parse+normalize cost)
        for u in accepted:
            raw = u.get()
            if raw not in self._norm_cache:
                n = u.copy().normalize()
                self._norm_cache[raw] = (n.get(), n.host, n.path.get())
        if self.seen is not None:
            canon = [self._norm(u.get())[0] for u in accepted]
            novel = self.seen.check_and_insert_urls(canon)
            self.metrics["n_dropped_seen"] += int((~novel).sum())
            accepted = [u for u, nv in zip(accepted, novel) if nv]
        for u in accepted:
            # classifier keys on the *raw parsed* host (push happens before
            # normalize, crawler.cc:1311; normalize happens at reschedule).
            # In discovery mode (follow_links) — where reference-order
            # parity is out of scope — key on the canonical authority
            # instead, so case-variant spellings of one host share a single
            # queue and per-host FIFO/politeness holds (outlink pushes in
            # _discover/feed_canonical already use the canonical key).
            if self.follow_links:
                self.classifier.push(self._norm(u.get())[0].split("/")[2],
                                     u.get())
            else:
                self.classifier.push(u.host, u.get())

    # ---- outlink discovery (M12 analog; rebuild extension) ----
    def _discover(self, base_canon: str, outlinks) -> None:
        if not outlinks:
            return
        candidates = []
        base = None
        for ref in outlinks:
            try:
                r = Url(ref)
            except (UrlParseError, Exception):
                continue
            if r.absolute:
                if r.scheme in self.schemes:
                    candidates.append(r)
                continue
            try:
                if base is None:
                    base = Url(base_canon)
                merged = base.copy().merge_ref(r)
                if merged.scheme in self.schemes:
                    candidates.append(merged)
            except (UrlParseError, Exception):
                continue
        if not candidates:
            return
        canon = [self._norm(c.get())[0] for c in candidates]
        local = [cu for cu in canon if self.owns_host(cu.split("/")[2])]
        foreign = [cu for cu in canon if not self.owns_host(cu.split("/")[2])]
        # foreign hosts belong to another planner shard: hand them to the
        # driver for re-routing (their seen-check happens at the owner)
        self.foreign_links.extend(foreign)
        if local:
            novel = self.seen.check_and_insert_urls(local)
            self.metrics["n_dropped_seen"] += int((~novel).sum())
            for cu, nv in zip(local, novel):
                if nv:
                    self.metrics["n_discovered"] += 1
                    self.classifier.push(cu.split("/")[2], cu)

    def owns_host(self, host: str) -> bool:
        """Sharding hook: which hosts this planner may crawl. The serial
        engine owns everything; PlannerShard overrides by host hash."""
        return True

    def feed_canonical(self, canon_urls: list[str]) -> int:
        """Enqueue already-canonical urls (cross-shard link routing path);
        returns number actually enqueued after the seen filter."""
        if not canon_urls:
            return 0
        n = 0
        if self.seen is not None:
            novel = self.seen.check_and_insert_urls(canon_urls)
            self.metrics["n_dropped_seen"] += int((~novel).sum())
            canon_urls = [u for u, nv in zip(canon_urls, novel) if nv]
        for cu in canon_urls:
            self.metrics["n_discovered"] += 1
            self.classifier.push(cu.split("/")[2], cu)
            n += 1
        return n

    # ---- machinery ----
    def _save(self, h: _Handle, fr: FetchResult, content: bytes,
              ctype: int, headers: str, charset: str = "") -> None:
        eff = fr.eff_url
        if eff == h.cur_url:
            eff_n = eff
        else:
            try:
                eff_n = self._norm(eff)[0]
            except (UrlParseError, Exception):
                eff_n = eff
        r = self.result
        r.saved.append(SavedDoc(
            seq=len(r.saved), tick=self._tick, handle=h.hid,
            url=h.cur_url, eff_url=eff_n if eff_n != h.cur_url else "",
            http_code=fr.http_code, curl_code=fr.curl_code,
            curl_error=fr.curl_error, content_type=int(ctype),
            content=content, headers=headers, charset=charset))
        r.url_seen.add(h.cur_url)

    def _start(self, h: _Handle, kind: int, url: str,
               etag: str = "", ims: str = "") -> None:
        h.inflight = (kind, url, etag, ims)

    def _delayed(self, host: str) -> bool:
        return (self.honor_crawl_delay
                and self._next_allowed.get(host, 0) > self._tick)

    def _reschedule(self, h: _Handle) -> None:
        """EasyHandle::reschedule (crawler.cc:798-850)."""
        if self.classifier.empty_top() and self.classifier.empty(h.hid):
            return
        try:
            host, raw = self.classifier.peek(h.hid)
        except FrontierEmpty:
            return
        canon, uhost, _upath = self._norm(raw)
        if self._delayed(uhost):
            return  # politeness token not refilled; retried next tick
        h.cur_url = canon
        # preexistence: the reference's Doc::load_url always returns false
        # (dead path); the rebuild's refresh_from map revives T6
        preexisting = canon in self.refresh_from
        if preexisting:
            h.state = CONTENT
        if h.state in (IDLE, ROBOTS):
            h.state = ROBOTS
            h.robots_host = uhost
            # robots rides the page's scheme (an https crawl probes
            # robots over https, like curl would)
            rscheme = canon.split(":", 1)[0] if "://" in canon else "http"
            self._start(h, ROBOTS, f"{rscheme}://{uhost}/robots.txt")
        elif h.state == HEAD:
            self._start(h, HEAD, h.cur_url)
        elif h.state == CONTENT:
            etag, ims = self.refresh_from.get(canon, ("", ""))
            self._start(h, CONTENT, h.cur_url, etag, ims)
        else:
            raise RuntimeError("unknown state in reschedule")

    def _done(self, h: _Handle, kind: int, fr: FetchResult) -> None:
        """EasyHandle::done (crawler.cc:860-1064)."""
        if kind == ROBOTS:
            if fr.curl_code == CURLE_OK and fr.http_code == 200:
                h.robots = RobotsEntry(text=fr.content.decode("utf-8", "replace"))
            else:
                h.robots = RobotsEntry(state=RobotsState.NOT_AVAILABLE)
            h.state = NEXT  # no pop: target url still queued
        elif kind == HEAD:
            if fr.curl_code == CURLE_OK and fr.http_code == 200:
                ctype, charset, _ = parse_http_headers(fr.headers)
                if acceptable(ctype):
                    h.state = CONTENT
                else:
                    fr2 = FetchResult(fr.curl_code, 406, fr.eff_url, fr.headers, b"")
                    self._save(h, fr2, b"", int(ctype), fr.headers, charset)
                    self.classifier.pop(h.hid)
                    h.state = NEXT
            else:
                self._save(h, fr, b"", int(ContentType.EMPTY), fr.headers)
                self.classifier.pop(h.hid)
                h.state = NEXT
        elif kind == CONTENT:
            if fr.curl_code == CURLE_OK and fr.http_code == 200:
                ctype, charset, _ = parse_http_headers(fr.headers)
                self._save(h, fr, fr.content, int(ctype), fr.headers, charset)
                self.metrics["bytes_dl"] += len(fr.content)
                if self.follow_links:
                    self._discover(h.cur_url, fr.outlinks)
            else:
                if fr.http_code == 304:
                    self.metrics["n_304"] += 1
                self._save(h, fr, b"", int(ContentType.EMPTY), fr.headers)
            self.classifier.pop(h.hid)
            h.state = NEXT
        else:
            raise RuntimeError("done called in unsupported state")

        self.metrics["n_saved"] = len(self.result.saved)
        if self.honor_crawl_delay and h.robots is not None and h.robots_host:
            delay = h.robots.crawl_delay(self.user_agent) \
                if h.robots.state == RobotsState.PRESENT else None
            if delay:
                import math
                self._next_allowed[h.robots_host] = (
                    self._tick + max(1, math.ceil(delay)))

        if h.state == NEXT:
            h.state = IDLE
            while not self.classifier.empty(h.hid):
                h.state = IDLE
                host, raw = self.classifier.peek(h.hid)
                canon_p, uhost, upath = self._norm(raw)
                preexisting = canon_p in self.refresh_from
                if preexisting:
                    h.state = CONTENT
                    break
                elif h.robots is None or h.robots_host != uhost:
                    h.state = ROBOTS
                    break
                else:
                    match = (h.robots.path_allowed_rfc9309
                             if self.robots_matcher == "rfc9309"
                             else h.robots.path_allowed)
                    allowed = (h.robots.tried_but_failed()
                               or (h.robots.state == RobotsState.PRESENT
                                   and match(self.user_agent, upath)))
                    self.result.robots_decisions.append(
                        (uhost, upath, allowed))
                    if allowed:
                        h.state = HEAD
                        break
                    else:
                        self.classifier.pop(h.hid)
        h.cur_url = ""
        self._reschedule(h)

    def _complete(self, h: _Handle) -> None:
        kind, url, etag, ims = h.inflight
        h.inflight = None
        if kind == ROBOTS:
            self.metrics["n_robots"] += 1
            fr = self.transport.fetch_robots(url.split("/")[2],
                                             scheme=url.split(":", 1)[0])
        elif kind == HEAD:
            self.metrics["n_head"] += 1
            fr = self.transport.request(url, method="HEAD")
        else:
            self.metrics["n_get"] += 1
            fr = self.transport.request(url, method="GET",
                                        if_none_match=etag,
                                        if_modified_since=ims)
        self._done(h, kind, fr)

    def _advance_past_delays(self) -> bool:
        """No transfers in flight but the frontier has work: jump logical
        time to the earliest politeness refill and retry. Returns True if
        new transfers started."""
        if not self.honor_crawl_delay or self.classifier.empty():
            return False
        future = [t for t in self._next_allowed.values() if t > self._tick]
        if not future:
            return False
        self._tick = min(future)
        for h in self.handles:
            if h.inflight is None:
                self._reschedule(h)
        return any(h.inflight for h in self.handles)

    # ---- run ----
    def run(self, max_ticks: int = 1_000_000) -> CrawlResult:
        # initial scheduler pass (scheduler_cb → GlobalInfo::reschedule,
        # crawler.cc:1222-1230): handles in id order
        for h in self.handles:
            if h.inflight is None:
                self._reschedule(h)
        while any(h.inflight for h in self.handles) or self._advance_past_delays():
            self._tick += 1
            if self._tick > max_ticks:
                raise RuntimeError("simulator did not converge")
            for h in self.handles:
                if h.inflight is not None:
                    self._complete(h)
            # periodic rescheduler picks up resting handles when queues
            # became non-empty (5 s tick analog)
            for h in self.handles:
                if h.inflight is None:
                    self._reschedule(h)
        return self.result


def simulate(site: SiteGraph, seeds: list[str], parallel: int = 20) -> CrawlResult:
    sim = ReferenceSimulator(site, parallel=parallel)
    sim.feed(seeds)
    return sim.run()
