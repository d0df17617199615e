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


def ingest_filter(lines: list[str]):
    """process_input_buff semantics: returns (accepted: list[Url], rejected)."""
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
        if u.absolute and u.scheme == "http":
            accepted.append(u)
        else:
            rejected.append(line)
    return accepted, rejected


class ReferenceSimulator:
    def __init__(self, site: SiteGraph, parallel: int = 20,
                 user_agent: str = USER_AGENT):
        self.transport = FixtureTransport(site)
        self.classifier = UrlClassifier(parallel)
        self.handles = [_Handle(i) for i in range(parallel)]
        self.user_agent = user_agent
        self.result = CrawlResult()
        self._tick = 0
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
        accepted, rejected = ingest_filter(seed_lines)
        self.result.rejected_seeds.extend(rejected)
        for u in accepted:
            # classifier keys on the *raw parsed* host (push happens before
            # normalize, crawler.cc:1311; normalize happens at reschedule)
            self.classifier.push(u.host, u.get())

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

    def _start(self, h: _Handle, kind: int, url: str) -> None:
        h.inflight = (kind, url)

    def _reschedule(self, h: _Handle) -> None:
        """EasyHandle::reschedule (crawler.cc:798-850)."""
        if self.classifier.empty_top() and self.classifier.empty(h.hid):
            return
        try:
            host, raw = self.classifier.peek(h.hid)
        except FrontierEmpty:
            return
        canon, uhost, _upath = self._norm(raw)
        h.cur_url = canon
        preexisting = False  # Doc::load_url always returns false (see module doc)
        if preexisting:
            h.state = CONTENT
        if h.state in (IDLE, ROBOTS):
            h.state = ROBOTS
            h.robots_host = uhost
            self._start(h, ROBOTS, f"http://{uhost}/robots.txt")
        elif h.state == HEAD:
            self._start(h, HEAD, h.cur_url)
        elif h.state == CONTENT:
            self._start(h, CONTENT, h.cur_url)
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
            else:
                self._save(h, fr, b"", int(ContentType.EMPTY), fr.headers)
            self.classifier.pop(h.hid)
            h.state = NEXT
        else:
            raise RuntimeError("done called in unsupported state")

        if h.state == NEXT:
            h.state = IDLE
            while not self.classifier.empty(h.hid):
                h.state = IDLE
                host, raw = self.classifier.peek(h.hid)
                _canon, uhost, upath = self._norm(raw)
                preexisting = False
                if preexisting:
                    h.state = CONTENT
                    break
                elif h.robots is None or h.robots_host != uhost:
                    h.state = ROBOTS
                    break
                else:
                    allowed = (h.robots.tried_but_failed()
                               or (h.robots.state == RobotsState.PRESENT
                                   and h.robots.path_allowed(self.user_agent,
                                                             upath)))
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
        kind, url = h.inflight
        h.inflight = None
        if kind == ROBOTS:
            host = url.split("/")[2]
            fr = self.transport.fetch_robots(host)
        elif kind == HEAD:
            fr = self.transport.request(url, method="HEAD")
        else:
            fr = self.transport.request(url, method="GET")
        self._done(h, kind, fr)

    # ---- run ----
    def run(self, max_ticks: int = 1_000_000) -> CrawlResult:
        # initial scheduler pass (scheduler_cb → GlobalInfo::reschedule,
        # crawler.cc:1222-1230): handles in id order
        for h in self.handles:
            if h.state == IDLE and h.inflight is None:
                self._reschedule(h)
        while any(h.inflight for h in self.handles):
            self._tick += 1
            if self._tick > max_ticks:
                raise RuntimeError("simulator did not converge")
            for h in self.handles:
                if h.inflight is not None:
                    self._complete(h)
            # periodic rescheduler picks up idle handles when new queues
            # became non-empty (5 s tick analog)
            for h in self.handles:
                if h.state == IDLE and h.inflight is None:
                    self._reschedule(h)
        return self.result


def simulate(site: SiteGraph, seeds: list[str], parallel: int = 20) -> CrawlResult:
    sim = ReferenceSimulator(site, parallel=parallel)
    sim.feed(seeds)
    return sim.run()
