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


def test_wire_encodings_chunked_and_gzip():
    """The fixture server serves a deterministic per-URL mix of identity /
    chunked / gzip wire encodings; the transport must hand back the
    identical LOGICAL response (decoded body + normalized headers ==
    FixtureTransport) for every choice — and this test pins that the
    chunked and gzip paths are actually exercised on the wire (no
    vacuous parity)."""
    import http.client
    import zlib

    site = SiteGraph()
    site.hosts = ["h.test"]
    site.robots["h.test"] = "User-agent: *\n"
    paths = ["/p1", "/p2", "/p4", "/p5", "/p6"]  # crc32%4: 1,3,2,0,2
    for p in paths:
        site.responses[f"http://h.test{p}"] = Response(
            status=200, content=(b"\x89PNG" + p.encode() * 700),
            content_type="image/png",
            etag=f'"{p[1:]}"')
    wire_enc = {f"http://h.test{p}": zlib.crc32(
        f"http://h.test{p}".encode()) % 4 for p in paths}
    assert sorted(wire_enc.values()) == [0, 1, 2, 2, 3]  # all kinds hit

    with FixtureHTTPServer(site) as srv:
        t = SocketTransport(srv.addr)
        fx = FixtureTransport(site)
        for p in paths:
            url = f"http://h.test{p}"
            rs, rf = t.request(url), fx.request(url)
            assert rs == rf, (p, wire_enc[url])

        # raw-wire probe: confirm the server really framed /p4 chunked
        # and really gzip-compressed /p2 for a gzip-accepting client
        conn = http.client.HTTPConnection(*srv.addr)
        conn.putrequest("GET", "/p4", skip_host=True,
                        skip_accept_encoding=True)
        conn.putheader("Host", "h.test")
        conn.endheaders()
        r = conn.getresponse()
        hmap = {k.lower(): v for k, v in r.getheaders()}
        assert hmap.get("transfer-encoding") == "chunked"
        assert "content-length" not in hmap
        r.read()
        conn.putrequest("GET", "/p2", skip_host=True,
                        skip_accept_encoding=True)
        conn.putheader("Host", "h.test")
        conn.putheader("Accept-Encoding", "gzip")
        conn.endheaders()
        r = conn.getresponse()
        hmap = {k.lower(): v for k, v in r.getheaders()}
        body = r.read()
        assert hmap.get("content-encoding") == "gzip"
        assert body[:2] == b"\x1f\x8b"  # gzip magic on the wire
        conn.close()

        # ...and that a client NOT advertising gzip gets identity (server
        # must never force an encoding the client didn't offer)
        conn = http.client.HTTPConnection(*srv.addr)
        conn.putrequest("GET", "/p2", skip_host=True,
                        skip_accept_encoding=True)
        conn.putheader("Host", "h.test")
        conn.putheader("Accept-Encoding", "identity")
        conn.endheaders()
        r = conn.getresponse()
        hmap = {k.lower(): v for k, v in r.getheaders()}
        assert "content-encoding" not in hmap
        assert r.read() == site.responses["http://h.test/p2"].content
        conn.close()


def test_unknown_content_encoding_maps_to_curl_61():
    """An undecodable Content-Encoding must surface as curl's
    CURLE_BAD_CONTENT_ENCODING (61), not a crash or silent garbage."""
    import socket
    import threading

    from mycelium_ray.transport import CURLE_BAD_CONTENT_ENCODING

    payload = (b"HTTP/1.1 200 X\r\nServer: raw\r\n"
               b"Content-Encoding: br\r\nContent-Length: 4\r\n"
               b"Connection: close\r\n\r\nABCD")

    srv = socket.create_server(("127.0.0.1", 0))
    addr = srv.getsockname()

    def one_shot():
        c, _ = srv.accept()
        c.recv(65536)
        c.sendall(payload)
        c.close()

    th = threading.Thread(target=one_shot, daemon=True)
    th.start()
    try:
        t = SocketTransport(addr)
        r = t.request("http://raw.test/x")
        assert r.curl_code == CURLE_BAD_CONTENT_ENCODING
        assert r.content == b""
    finally:
        srv.close()


def test_fetch_pool_threads_parity(ray_session, corpus):
    """pool>1 (concurrent per-wave fetching over per-thread keep-alive
    connections — the high-RTT deployment shape) must be bit-identical
    to the serial default."""
    import ray as _ray

    from mycelium_ray.pipelines.crawl import RayCrawler
    site, seeds = corpus

    def run(pool):
        with FixtureHTTPServer(site) as srv:
            crawler = RayCrawler(site, parallel=6, n_fetchers=2,
                                 transport_addr=srv.addr)
            crawler.feed(seeds)
            crawler._ensure_fetchers()
            _ray.get([f.load_socket.remote(srv.addr, None, pool)
                      for f in crawler._fetchers])
            res = crawler.run()
            return [(d.url, d.http_code, d.curl_code, d.content)
                    for d in res.saved], res.url_seen, dict(crawler.metrics)

    s1, seen1, m1 = run(1)
    s4, seen4, m4 = run(4)
    assert s1 == s4 and seen1 == seen4 and m1 == m4


def test_range_resume_after_content_cap():
    """RFC 9110 Range/206: resuming a capped transfer from the cutoff
    offset (curl's CURLOPT_RESUME_FROM) reassembles the full body —
    plus 416 past the end and full-200 on rangeless servers."""
    full = b"\x89PNG" + bytes(range(256)) * ((CONTENT_SIZE_LIMIT + 9000)
                                             // 256)
    site = SiteGraph()
    site.hosts = ["r.test"]
    site.responses["http://r.test/big.bin"] = Response(
        status=200, content=full, content_type="image/png")
    with FixtureHTTPServer(site) as srv:
        t = SocketTransport(srv.addr)
        first = t.request("http://r.test/big.bin")
        assert first.curl_code == CURLE_WRITE_ERROR
        assert len(first.content) == CONTENT_SIZE_LIMIT
        rest = t.request("http://r.test/big.bin",
                         range_from=len(first.content))
        assert rest.http_code == 206
        assert first.content + rest.content == full
        # past-the-end resume → 416, empty body
        past = t.request("http://r.test/big.bin", range_from=len(full))
        assert past.http_code == 416 and past.content == b""
        # bounded range via raw header path: first 10 bytes
        status, _pairs, hmap, body = t._do(
            "GET", "http://r.test/big.bin", {"Range": "bytes=0-9"})
        assert status == 206 and body == full[:10]
        assert hmap["content-range"] == f"bytes 0-9/{len(full)}"
        # RFC 9110 §14.1.1: last-byte-pos < first-byte-pos is an INVALID
        # range spec — the server must ignore the header (full 200),
        # never answer an empty 206 with "Content-Range: bytes 5-2/len".
        # (body read caps at CONTENT_SIZE_LIMIT+1 client-side, enough to
        # prove the 200-with-full-body path was taken)
        status, _pairs, hmap, body = t._do(
            "GET", "http://r.test/big.bin", {"Range": "bytes=5-2"})
        assert status == 200 and "content-range" not in hmap
        assert body[:10] == full[:10]
