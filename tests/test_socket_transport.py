"""Real-socket fetch parity: the planner over SocketTransport (actual TCP
via http.client against FixtureHTTPServer) must produce BYTE-IDENTICAL
crawl results to the in-process FixtureTransport — same saved rows, same
order, same url_seen, same metrics. This pins the transport boundary:
nothing in the engine depends on the fixture shortcut."""
import dataclasses

import pytest

from mycelium_ray.corpus import (CONTENT_SIZE_LIMIT, Response, SiteGraph,
                                 generate_corpus)
from mycelium_ray.httpfixture import FixtureHTTPServer
from mycelium_ray.simulator import ReferenceSimulator
from mycelium_ray.transport import (CURLE_COULDNT_RESOLVE_HOST,
                                    CURLE_TOO_MANY_REDIRECTS,
                                    CURLE_WRITE_ERROR, FixtureTransport,
                                    SocketTransport)


@pytest.fixture(scope="module")
def corpus():
    images, site, seeds = generate_corpus(seed=7, n_hosts=12,
                                          pages_per_host=6,
                                          hot_host_factor=3)
    return site, seeds


def _crawl(site, seeds, transport=None, **kw):
    sim = ReferenceSimulator(site, parallel=6, transport=transport, **kw)
    sim.feed(seeds)
    res = sim.run()
    return res, sim.metrics


def test_socket_parity_full_corpus(corpus):
    site, seeds = corpus
    with FixtureHTTPServer(site) as srv:
        res_s, met_s = _crawl(site, seeds, SocketTransport(srv.addr))
    res_f, met_f = _crawl(site, seeds, None)
    assert met_s == met_f
    assert res_s.url_seen == res_f.url_seen
    assert len(res_s.saved) == len(res_f.saved)
    for a, b in zip(res_s.saved, res_f.saved):
        assert dataclasses.asdict(a) == dataclasses.asdict(b), a.url


def test_socket_transport_semantics():
    """Wire-level behaviors: resolve-fail, redirect chain + cap, content
    cutoff, conditional 304, HEAD framing."""
    site = SiteGraph()
    site.hosts = ["h.test"]
    site.robots["h.test"] = "User-agent: *\nDisallow: /private/\n"
    big = b"\x89PNG" + b"z" * (CONTENT_SIZE_LIMIT + 10)
    site.responses["http://h.test/big.png"] = Response(
        status=200, content=big, content_type="image/png")
    site.responses["http://h.test/a"] = Response(
        status=301, content=b"", location="http://h.test/b")
    site.responses["http://h.test/b"] = Response(
        status=200, content=b"ok", content_type="image/png",
        etag='"e1"', last_modified="Tue, 01 Jan 2030 00:00:00 GMT")
    # redirect loop for MAXREDIRS
    site.responses["http://h.test/loop"] = Response(
        status=302, content=b"", location="http://h.test/loop")
    with FixtureHTTPServer(site) as srv:
        t = SocketTransport(srv.addr)
        fx = FixtureTransport(site)
        # robots over the wire == fixture
        assert t.fetch_robots("h.test") == fx.fetch_robots("h.test")
        assert t.fetch_robots("nope.test").curl_code == \
            CURLE_COULDNT_RESOLVE_HOST
        # redirect follow + effective url
        r = t.request("http://h.test/a")
        assert (r.http_code, r.eff_url, r.content) == (200, "http://h.test/b", b"ok")
        assert r == fx.request("http://h.test/a")
        # redirect cap
        assert t.request("http://h.test/loop").curl_code == \
            CURLE_TOO_MANY_REDIRECTS
        # content cutoff
        r = t.request("http://h.test/big.png")
        assert r.curl_code == CURLE_WRITE_ERROR
        assert len(r.content) == CONTENT_SIZE_LIMIT
        assert r == fx.request("http://h.test/big.png")
        # conditional 304 (etag and last-modified)
        r304 = t.request("http://h.test/b", if_none_match='"e1"')
        assert r304.http_code == 304 and r304.content == b""
        assert r304 == fx.request("http://h.test/b", if_none_match='"e1"')
        rims = t.request("http://h.test/b",
                         if_modified_since="Tue, 01 Jan 2030 00:00:00 GMT")
        assert rims == fx.request(
            "http://h.test/b",
            if_modified_since="Tue, 01 Jan 2030 00:00:00 GMT")
        # HEAD == fixture HEAD
        assert t.request("http://h.test/b", method="HEAD") == \
            fx.request("http://h.test/b", method="HEAD")
        # unknown path on known host
        assert t.request("http://h.test/zzz") == fx.request("http://h.test/zzz")


def test_ray_fetch_pool_over_sockets(ray_session, corpus):
    """Distributed fetch actors connecting over real TCP (no site object
    shipped to any actor) reproduce the serial reference crawl exactly."""
    from mycelium_ray.pipelines.crawl import RayCrawler
    from mycelium_ray.simulator import simulate
    site, seeds = corpus
    ref = simulate(site, seeds, parallel=6)
    with FixtureHTTPServer(site) as srv:
        crawler = RayCrawler(site, parallel=6, n_fetchers=3,
                             transport_addr=srv.addr)
        crawler.feed(seeds)
        res = crawler.run()
    assert res.url_seen == ref.url_seen
    assert [(d.url, d.http_code, d.content) for d in res.saved] == \
        [(d.url, d.http_code, d.content) for d in ref.saved]


def test_relative_location_redirect():
    """RFC 7231: Location may be relative — resolve against current url."""
    site = SiteGraph()
    site.hosts = ["r.test"]
    site.robots["r.test"] = None
    site.responses["http://r.test/a"] = Response(
        status=302, content=b"", location="/b")  # relative!
    site.responses["http://r.test/b"] = Response(
        status=200, content=b"ok", content_type="image/png")
    with FixtureHTTPServer(site) as srv:
        t = SocketTransport(srv.addr)
        r = t.request("http://r.test/a")
        assert (r.http_code, r.eff_url, r.content) == \
            (200, "http://r.test/b", b"ok")


def test_robots_error_paths_over_socket():
    """Robots fetch must report failures faithfully: a scripted curl
    failure and a 5xx must NOT be parsed as robots rules, and an explicit
    /robots.txt Response in site.responses must not shadow the robots
    dict for the crawler's robots probe (matching FixtureTransport)."""
    site = SiteGraph()
    site.hosts = ["f.test", "e.test", "s.test"]
    site.robots["f.test"] = None
    site.responses["http://f.test/robots.txt"] = Response(
        status=0, content=b"", curl_fail=28)  # scripted timeout
    site.robots["e.test"] = None
    site.responses["http://e.test/robots.txt"] = Response(
        status=500, content=b"boom", content_type="text/plain")
    site.robots["s.test"] = "User-agent: *\nDisallow: /x/\n"
    site.responses["http://s.test/robots.txt"] = Response(
        status=200, content=b"NOT THE RULES", content_type="text/plain")
    with FixtureHTTPServer(site) as srv:
        t = SocketTransport(srv.addr)
        fx = FixtureTransport(site)
        # curl-fail response at the robots URL: fixture's fetch_robots
        # consults only site.robots (None -> 404); socket probe must agree
        assert t.fetch_robots("f.test") == fx.fetch_robots("f.test")
        assert t.fetch_robots("e.test") == fx.fetch_robots("e.test")
        # robots dict wins over the explicit Response for the probe
        assert t.fetch_robots("s.test") == fx.fetch_robots("s.test")
        assert t.fetch_robots("s.test").content == \
            b"User-agent: *\nDisallow: /x/\n"
        # ...while a PLAIN request for the same URL serves the Response
        assert t.request("http://s.test/robots.txt").content == \
            fx.request("http://s.test/robots.txt").content == b"NOT THE RULES"
