"""Corpus + serial simulator sanity: determinism, state-machine behaviors."""
import numpy as np

from mycelium_ray.corpus import generate_corpus, CONTENT_SIZE_LIMIT
from mycelium_ray.http_headers import ContentType
from mycelium_ray.simulator import ReferenceSimulator, ingest_filter, simulate
from mycelium_ray.transport import (
    CURLE_TOO_MANY_REDIRECTS, CURLE_WRITE_ERROR, FixtureTransport)


def _corpus():
    return generate_corpus(n_hosts=8, pages_per_host=4, seed=42)


def test_corpus_deterministic():
    imgs1, site1, seeds1 = _corpus()
    imgs2, site2, seeds2 = _corpus()
    assert imgs1.equals(imgs2)
    assert seeds1 == seeds2
    assert sorted(site1.responses) == sorted(site2.responses)
    assert imgs1.num_rows > 0
    assert set(imgs1.column_names) == {
        "image_id", "bytes", "w", "h", "fmt", "caption", "phash"}


def test_ingest_filter():
    accepted, rejected = ingest_filter([
        "http://a.test/x", "https://a.test/y", "ftp://f/z", "rel/path",
        "not a url %% ::", "http://[::1]/v6", "",
    ])
    urls = [u.get() for u in accepted]
    assert "http://a.test/x" in urls
    assert "http://[::1]/v6" in urls
    assert len(rejected) == 4  # wait: https, ftp, rel, garbage


def test_transport_semantics():
    _, site, _ = _corpus()
    t = FixtureTransport(site)
    # redirect chain of 2 resolves with eff_url
    host = site.hosts[0]
    fr = t.request(f"http://{host}/r1")
    assert fr.http_code == 200 and fr.eff_url.endswith("/img/0.png")
    # redirect loop → too many redirects
    fr = t.request(f"http://{host}/loop")
    assert fr.curl_code == CURLE_TOO_MANY_REDIRECTS
    # oversize → write error with truncated content
    fr = t.request("http://zz-hot.test/huge.png")
    assert fr.curl_code == CURLE_WRITE_ERROR
    assert len(fr.content) == CONTENT_SIZE_LIMIT
    # conditional revalidation
    url = f"http://{host}/img/0.png"
    etag = site.responses[url].etag
    fr = t.request(url, if_none_match=etag)
    assert fr.http_code == 304 and fr.content == b""
    # HEAD has no body
    fr = t.request(url, method="HEAD")
    assert fr.http_code == 200 and fr.content == b""


def test_simulator_deterministic_and_complete():
    _, site, seeds = _corpus()
    r1 = simulate(site, seeds, parallel=4)
    r2 = simulate(site, seeds, parallel=4)
    assert [(d.url, d.http_code, d.curl_code) for d in r1.saved] == \
           [(d.url, d.http_code, d.curl_code) for d in r2.saved]
    assert r1.url_seen == r2.url_seen
    assert len(r1.saved) > 0
    # duplicate seeds ARE re-fetched (Doc::load_url always returns false in
    # the reference — SURVEY.md S3); the upsert makes the final store unique,
    # i.e. url_seen is a set strictly smaller than the save log
    urls = [d.url for d in r1.saved]
    assert len(set(urls)) == len(r1.url_seen) <= len(urls)


def test_simulator_state_machine_outcomes():
    _, site, seeds = _corpus()
    r = simulate(site, seeds, parallel=4)
    by_url = {d.url: d for d in r.saved}
    host0 = site.hosts[0]  # host000: robots kind 0 → missing → all allowed
    # image page fetched with content
    img = by_url.get(f"http://{host0}/img/0.png")
    assert img is not None and img.http_code == 200 and len(img.content) > 0
    assert img.content_type == int(ContentType.IMAGE_PNG)
    # 404 page saved with no content
    missing = by_url.get(f"http://{host0}/missing.png")
    assert missing is not None and missing.http_code == 404
    # weird content type → HEAD gate saves 406 stub (crawler.cc:953-961)
    weird = by_url.get(f"http://{host0}/weird.bin")
    assert weird is not None and weird.http_code == 406 and weird.content == b""
    # kind-1 host (host001): /private disallowed by robots → never saved
    host1 = site.hosts[1]
    assert f"http://{host1}/private/a.png" not in by_url
    # but on host0 (no robots) /private IS fetched
    assert f"http://{host0}/private/a.png" in by_url
    # kind-3 host (EPARSE html robots) → everything allowed
    host3 = site.hosts[3]
    assert f"http://{host3}/private/a.png" in by_url
    # kind-2 host: our UA blocked from /blocked, '*' disallows all → only
    # /blocked pages of OUR ua group rule; UA group matched first: /blocked
    # disallowed, others allowed
    host2 = site.hosts[2]
    assert f"http://{host2}/blocked/b.png" not in by_url
    assert f"http://{host2}/img/0.webp" in by_url or \
           any(u.startswith(f"http://{host2}/img/") for u in by_url)
    # redirect loop produces a failure row, not a crash
    loop = by_url.get(f"http://{host0}/loop")
    assert loop is not None and loop.curl_code == CURLE_TOO_MANY_REDIRECTS


def test_simulator_parallel_levels_same_seen_set():
    # url_seen MEMBERSHIP must not depend on the politeness budget N.
    # (Crawl order legitimately does: the classifier keys queues on the raw
    # pre-normalize host — crawler.cc:1311 pushes before normalize — so
    # mixed-case duplicate seeds interleave differently at different N.
    # Parity is defined at fixed N, per the north rule's "same seed list +
    # politeness budget".)
    _, site, seeds = _corpus()
    r1 = simulate(site, seeds, parallel=1)
    r4 = simulate(site, seeds, parallel=4)
    r20 = simulate(site, seeds, parallel=20)
    assert r1.url_seen == r4.url_seen == r20.url_seen
    # within one raw-host key, per-host fetch order IS invariant across N
    def raw_host_orders(r):
        orders = {}
        for d in r.saved:
            orders.setdefault(d.url.split("/")[2], []).append(d.url)
        return orders
    # compare hosts that have no mixed-case alias in the seeds
    o1, o20 = raw_host_orders(r1), raw_host_orders(r20)
    aliased = {s.split("/")[2].lower() for s in seeds
               if s.startswith(("http://", "HTTP://")) and s.split("/")[2] != s.split("/")[2].lower()}
    for host, order in o1.items():
        if host.lower() not in aliased:
            assert o20.get(host) == order, f"order diverged for {host}"


def test_discovery_mode_case_variant_host_single_queue():
    """follow_links mode: 'HTTP://A.COM/x' and 'http://a.com/y' seeds must
    land in ONE per-host queue (canonical-authority keying), so one host is
    never fetched by two handles concurrently (ADVICE r01)."""
    from mycelium_ray.corpus import Response, SiteGraph
    site = SiteGraph()
    site.hosts = ["a.com"]
    site.robots["a.com"] = None
    for p in ("x", "y"):
        site.responses[f"http://a.com/{p}"] = Response(
            status=200, content=b"\x89PNG", content_type="image/png")
    sim = ReferenceSimulator(site, parallel=4, dedup="cuckoo",
                             follow_links=True)
    sim.feed(["http://A.COM/x", "http://a.com/y"])
    bound = [q for q in sim.classifier._queues if q.q]
    assert len(bound) == 1 and len(bound[0].q) == 2
    res = sim.run()
    assert len(res.saved) == 2
