"""Rebuild-extension features: outlink discovery (multi-round frontier),
crawl-delay politeness, conditional revalidation (T6)."""
import numpy as np
import pytest

from mycelium_ray.corpus import generate_corpus, Response, SiteGraph
from mycelium_ray.simulator import ReferenceSimulator, simulate


def _small_corpus():
    return generate_corpus(n_hosts=4, pages_per_host=3, seed=7)


def test_follow_links_requires_cuckoo():
    _, site, _ = _small_corpus()
    with pytest.raises(ValueError):
        ReferenceSimulator(site, parallel=2, follow_links=True)


def test_follow_links_discovers_more_than_seeds():
    _, site, _ = _small_corpus()
    # seed ONLY one page per host; discovery must reach the sibling pages
    seeds = [u for u in sorted(site.responses) if u.endswith("/img/0.png")]
    sim = ReferenceSimulator(site, parallel=2, dedup="cuckoo",
                             follow_links=True)
    sim.feed(seeds)
    r = sim.run()
    assert sim.metrics["n_discovered"] > 0
    assert len(r.url_seen) > len(seeds)
    # discovered urls were canonicalized (no '..' survives the merge)
    assert all(".." not in u for u in r.url_seen)
    # no url fetched twice (cuckoo dedup) and loops terminate
    urls = [d.url for d in r.saved]
    assert len(urls) == len(set(urls))
    # deterministic
    sim2 = ReferenceSimulator(site, parallel=2, dedup="cuckoo",
                              follow_links=True)
    sim2.feed(seeds)
    r2 = sim2.run()
    assert [d.url for d in r2.saved] == urls


def test_crawl_delay_spreads_ticks():
    site = SiteGraph()
    host = "slow.test"
    site.hosts = [host]
    site.robots[host] = "User-agent: *\nCrawl-delay: 3\n"
    for i in range(4):
        site.responses[f"http://{host}/p{i}.png"] = Response(
            status=200, content=b"\x89PNG\r\n\x1a\nX", content_type="image/png")
    seeds = [f"http://{host}/p{i}.png" for i in range(4)]

    fast = simulate(site, seeds, parallel=2)
    slow_sim = ReferenceSimulator(site, parallel=2, honor_crawl_delay=True)
    slow_sim.feed(seeds)
    slow = slow_sim.run()
    # same coverage
    assert slow.url_seen == fast.url_seen
    # delayed run takes at least ~delay ticks between saves of the host
    fast_span = max(d.tick for d in fast.saved) - min(d.tick for d in fast.saved)
    slow_span = max(d.tick for d in slow.saved) - min(d.tick for d in slow.saved)
    assert slow_span > fast_span
    # gaps between consecutive content saves ≥ 3 ticks
    ticks = sorted(d.tick for d in slow.saved)
    gaps = [b - a for a, b in zip(ticks, ticks[1:])]
    assert all(g >= 3 for g in gaps)


def test_refresh_revalidation_304():
    _, site, seeds = _small_corpus()
    # first crawl collects etags
    r1 = simulate(site, seeds, parallel=4)
    etags = {}
    for d in r1.saved:
        if d.http_code == 200 and 'ETag: "' in d.headers:
            etag = d.headers.split('ETag: ')[1].split("\r\n")[0]
            etags[d.url] = (etag, "")
    assert etags
    # refresh crawl: preexisting urls go straight to CONTENT and get 304
    sim = ReferenceSimulator(site, parallel=4, refresh_from=etags)
    sim.feed(seeds)
    r2 = sim.run()
    saved_304 = [d for d in r2.saved if d.http_code == 304]
    assert len(saved_304) >= len(etags) * 0.9
    assert all(d.content == b"" for d in saved_304)
    assert sim.metrics["n_304"] == len(saved_304)
    # revalidated fetches skip robots+HEAD (direct CONTENT): fewer requests
    assert sim.metrics["n_head"] < len(r2.saved)


def test_metrics_counters():
    _, site, seeds = _small_corpus()
    sim = ReferenceSimulator(site, parallel=4)
    sim.feed(seeds)
    r = sim.run()
    m = sim.metrics
    assert m["n_saved"] == len(r.saved)
    assert m["n_robots"] > 0 and m["n_head"] > 0 and m["n_get"] > 0
    assert m["bytes_dl"] > 0
