"""Real-TLS fetch path: SocketTransport over an HTTPS FixtureHTTPServer
(actual handshakes + record layer on loopback, FULL certificate
verification — tlscert mints a SAN-127.0.0.1 self-signed root). The
https crawl must be byte-identical to the in-process FixtureTransport on
the same (https-schemed) site graph, and TLS failures must surface as
the curl error family (35 connect / 60 verify), never as retries or
crashes."""

import dataclasses

import pytest

from mycelium_ray.corpus import (Response, SiteGraph, generate_corpus,
                                 to_https as _to_https)
from mycelium_ray.httpfixture import FixtureHTTPServer
from mycelium_ray.simulator import ReferenceSimulator
from mycelium_ray.tlscert import (make_client_context, make_self_signed_cert,
                                  make_server_context)
from mycelium_ray.transport import (CURLE_OK, CURLE_PEER_FAILED_VERIFICATION,
                                    CURLE_SSL_CONNECT_ERROR,
                                    FixtureTransport, SocketTransport)


@pytest.fixture(scope="module")
def https_corpus():
    _, site, seeds = generate_corpus(seed=7, n_hosts=10, pages_per_host=5,
                                     hot_host_factor=3)
    return _to_https(site, seeds)


@pytest.fixture(scope="module")
def tls_material(https_corpus):
    # explicit SANs for every host this module's sites use (corpus hosts
    # + seed hosts + the hand-built "s.test" graphs) — hostname
    # verification is against the URL host, so the cert must cover them
    from mycelium_ray.tlscert import tls_san_hosts
    site, seeds = https_corpus
    san = sorted(set(tls_san_hosts(site, seeds)) | {"s.test"})
    cert_pem, key_pem = make_self_signed_cert(hosts=tuple(san))
    return (make_server_context(cert_pem, key_pem),
            make_client_context(cert_pem),
            cert_pem)


def _crawl(site, seeds, transport):
    # schemes=("https",): the TLS-enabled gate (the reference default is
    # http-only — crawler.cc:1297 — and stays the engine default)
    sim = ReferenceSimulator(site, parallel=6, transport=transport,
                             schemes=("https",))
    sim.feed(seeds)
    return sim.run(), sim.metrics


def test_tls_crawl_parity_full_corpus(tls_material, https_corpus):
    server_ctx, client_ctx, _ = tls_material
    site, seeds = https_corpus
    with FixtureHTTPServer(site, tls_context=server_ctx) as srv:
        res_s, met_s = _crawl(site, seeds,
                              SocketTransport(srv.addr,
                                              ssl_context=client_ctx))
    res_f, met_f = _crawl(site, seeds, FixtureTransport(site))
    assert met_s == met_f
    assert res_s.url_seen == res_f.url_seen
    assert len(res_s.saved) == len(res_f.saved) > 0
    for a, b in zip(res_s.saved, res_f.saved):
        assert dataclasses.asdict(a) == dataclasses.asdict(b), a.url


def test_tls_request_and_robots_semantics(tls_material):
    server_ctx, client_ctx, _ = tls_material
    site = SiteGraph()
    site.hosts = ["s.test"]
    site.robots["s.test"] = "User-agent: *\nDisallow: /private/\n"
    site.responses["https://s.test/a"] = Response(
        status=301, content=b"", location="https://s.test/b")
    site.responses["https://s.test/b"] = Response(
        status=200, content=b"\x89PNGok", content_type="image/png",
        etag='"e9"')
    with FixtureHTTPServer(site, tls_context=server_ctx) as srv:
        t = SocketTransport(srv.addr, ssl_context=client_ctx)
        fr = t.request("https://s.test/a")
        assert (fr.curl_code, fr.http_code) == (CURLE_OK, 200)
        assert fr.eff_url == "https://s.test/b"
        assert fr.content == b"\x89PNGok"
        # conditional revalidation over TLS
        fr304 = t.request("https://s.test/b", if_none_match='"e9"')
        assert fr304.http_code == 304 and fr304.content == b""
        # robots probe rides https and keeps the scheme in eff_url
        rb = t.fetch_robots("s.test", scheme="https")
        assert rb.http_code == 200 and b"Disallow" in rb.content
        assert rb.eff_url == "https://s.test/robots.txt"
        # fixture parity for the same robots probe
        fb = FixtureTransport(site).fetch_robots("s.test", scheme="https")
        assert (rb.curl_code, rb.http_code, rb.eff_url) == \
               (fb.curl_code, fb.http_code, fb.eff_url)


def test_unverified_client_gets_curl_60(tls_material):
    server_ctx, _, _ = tls_material
    # a client trusting a DIFFERENT root must fail verification
    other_cert, _ = make_self_signed_cert()
    bad_ctx = make_client_context(other_cert)
    site = SiteGraph()
    site.hosts = ["s.test"]
    site.responses["https://s.test/x"] = Response(status=200, content=b"ok")
    with FixtureHTTPServer(site, tls_context=server_ctx) as srv:
        t = SocketTransport(srv.addr, ssl_context=bad_ctx)
        fr = t.request("https://s.test/x")
        assert fr.curl_code == CURLE_PEER_FAILED_VERIFICATION
        assert fr.http_code == 0 and fr.content == b""
        rb = t.fetch_robots("s.test", scheme="https")
        assert rb.curl_code == CURLE_PEER_FAILED_VERIFICATION


def test_hostname_mismatch_gets_curl_60(tls_material):
    """Certificate chain is TRUSTED but its SANs don't cover the URL
    host: curl verifies the URL host (CURLOPT_SSL_VERIFYHOST), so this
    must fail verification (60) even though the chain validates. Guards
    against verifying the connect IP instead of the virtual host."""
    site = SiteGraph()
    site.hosts = ["s.test"]
    site.responses["https://s.test/x"] = Response(status=200, content=b"ok")
    # cert for a DIFFERENT name (no *.test wildcard); client trusts it
    cert, key = make_self_signed_cert(hosts=("other.example",))
    with FixtureHTTPServer(site,
                           tls_context=make_server_context(cert, key)) as srv:
        t = SocketTransport(srv.addr, ssl_context=make_client_context(cert))
        fr = t.request("https://s.test/x")
        assert fr.curl_code == CURLE_PEER_FAILED_VERIFICATION
        assert fr.http_code == 0 and fr.content == b""
        # same trust root, matching host: succeeds — proving the failure
        # above was the hostname check, not the chain
        site.responses["https://other.example/x"] = Response(
            status=200, content=b"ok2")
        site.hosts.append("other.example")
        assert t.request("https://other.example/x").content == b"ok2"


def test_plaintext_client_against_tls_listener_gets_curl_35(tls_material):
    server_ctx, client_ctx, _ = tls_material
    site = SiteGraph()
    site.hosts = ["s.test"]
    site.responses["https://s.test/x"] = Response(status=200, content=b"ok")
    with FixtureHTTPServer(site, tls_context=server_ctx) as srv:
        # https URL on a transport with NO ssl_context: TLS is required
        # but unavailable — curl 35, not a crash
        t = SocketTransport(srv.addr)
        fr = t.request("https://s.test/x")
        assert fr.curl_code == CURLE_SSL_CONNECT_ERROR
        assert fr.http_code == 0


def test_http_and_https_coexist_on_one_transport(tls_material):
    """Scheme-keyed connections: one transport instance fetches http
    from a plain listener is NOT tested here (one listener = one
    protocol); what must hold is that an https fetch doesn't poison the
    http connection slot and vice versa."""
    server_ctx, client_ctx, _ = tls_material
    site = SiteGraph()
    site.hosts = ["s.test"]
    site.responses["https://s.test/x"] = Response(status=200, content=b"ok")
    with FixtureHTTPServer(site, tls_context=server_ctx) as srv:
        t = SocketTransport(srv.addr, ssl_context=client_ctx)
        assert t.request("https://s.test/x").content == b"ok"
        # https pool entries are keyed per virtual host (the cert is
        # verified against the URL host, so sessions can't be shared
        # across SNI names)
        key = ("https", srv.addr[0], "s.test")
        assert key in t._conns
        assert not any(k[0] == "http" for k in t._conns)
        # keep-alive: a second request reuses the TLS session's conn
        conn = t._conns[key]
        assert t.request("https://s.test/x").content == b"ok"
        assert t._conns[key] is conn


def test_ray_fetch_pool_over_tls(ray_session, tls_material, https_corpus):
    """Distributed fetch actors doing real TLS handshakes (only PEM bytes
    cross the process boundary; each actor builds its own verifying
    context) reproduce the serial reference crawl exactly."""
    from mycelium_ray.pipelines.crawl import RayCrawler
    server_ctx, _, cert_pem = tls_material
    site, seeds = https_corpus
    ref = ReferenceSimulator(site, parallel=6, schemes=("https",))
    ref.feed(seeds)
    ref_res = ref.run()
    with FixtureHTTPServer(site, tls_context=server_ctx) as srv:
        crawler = RayCrawler(site, parallel=6, n_fetchers=3,
                             transport_addr=srv.addr,
                             transport_ca=cert_pem,
                             schemes=("https",))
        crawler.feed(seeds)
        res = crawler.run()
    assert res.url_seen == ref_res.url_seen
    assert [(d.url, d.http_code, d.content) for d in res.saved] == \
        [(d.url, d.http_code, d.content) for d in ref_res.saved]


def test_tls_san_hosts_collects_every_handshake_name():
    from mycelium_ray.tlscert import tls_san_hosts
    site = SiteGraph()
    site.hosts = ["a.test", "b.test"]
    site.robots["c.test"] = "User-agent: *\n"
    site.responses["https://d.test/x"] = Response(status=200, content=b"")
    site.responses["https://[::1]/v6"] = Response(status=200, content=b"")
    seeds = ["https://seed.test/x", "https://e.test:8443/y",
             "http://bad host.test/z", "not-a-url"]
    sans = tls_san_hosts(site, seeds)
    assert set(sans) == {"a.test", "b.test", "c.test", "d.test",
                         "seed.test", "e.test"}
    # IP literals ride the IP SANs; invalid names and junk are dropped
    assert "[::1]" not in sans and "bad host.test" not in sans
