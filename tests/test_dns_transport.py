"""Real-wire DNS (mycelium_ray/dnsfixture.py): RFC 1035 framing over
actual UDP, the crawl-side resolver cache, and the transport integration
— in DNS mode, unknown hosts fail via a genuine NXDOMAIN exchange (curl
error 6) and never reach the HTTP listener, while the crawl stays
byte-identical to the in-process FixtureTransport."""

import dataclasses
import struct

import pytest

from mycelium_ray.corpus import Response, SiteGraph, generate_corpus
from mycelium_ray.dnsfixture import (DnsError, DnsNxdomain, DnsResolver,
                                     FixtureDNSServer, decode_name,
                                     encode_name, encode_query,
                                     encode_response, parse_query,
                                     parse_response, zone_from_site)
from mycelium_ray.httpfixture import FixtureHTTPServer
from mycelium_ray.simulator import ReferenceSimulator
from mycelium_ray.transport import (CURLE_COULDNT_RESOLVE_HOST,
                                    FixtureTransport, SocketTransport)


# ----------------------------------------------------------------- wire
def test_query_roundtrip():
    q = encode_query(0x1234, "img.host007.test")
    assert parse_query(q) == (0x1234, "img.host007.test", 1)


def test_response_roundtrip_with_compression_pointer():
    r = encode_response(9, "a.test", 1, ["10.1.2.3"])
    # the answer's name is a pointer (0xC00C) back to the question
    assert b"\xc0\x0c" in r
    assert parse_response(r, 9, "a.test") == ["10.1.2.3"]


def test_nxdomain_and_mismatches():
    nx = encode_response(5, "gone.test", 1, [], rcode=3)
    with pytest.raises(DnsNxdomain):
        parse_response(nx, 5, "gone.test")
    ok = encode_response(5, "a.test", 1, ["127.0.0.1"])
    with pytest.raises(DnsError):
        parse_response(ok, 6, "a.test")        # id mismatch
    with pytest.raises(DnsError):
        parse_response(ok, 5, "b.test")        # question echo mismatch
    with pytest.raises(DnsError):
        parse_query(ok)                        # a response is not a query


def test_decode_name_pointer_loop_rejected():
    # two pointers chasing each other
    msg = b"\x00" * 12 + b"\xc0\x0e\xc0\x0c"
    with pytest.raises(DnsError):
        decode_name(msg, 12)


def test_label_limits():
    with pytest.raises(DnsError):
        encode_name("a." + "x" * 64 + ".test")


# ------------------------------------------------------------- resolver
def test_resolver_caches_positive_and_negative():
    with FixtureDNSServer({"a.test": "127.0.0.1"}) as srv:
        res = DnsResolver(srv.addr)
        assert res.resolve("a.test") == "127.0.0.1"
        assert res.resolve("A.test.") == "127.0.0.1"   # normalized hit
        with pytest.raises(DnsNxdomain):
            res.resolve("missing.test")
        with pytest.raises(DnsNxdomain):
            res.resolve("missing.test")                # negative cache
        assert res.n_queries == 2
        assert srv.n_queries == 2


def test_zone_matches_host_known_semantics():
    site = SiteGraph()
    site.hosts = ["h1.test"]
    site.robots["r.test"] = "User-agent: *\n"
    site.responses["http://only-resp.test/x"] = Response(status=200,
                                                         content=b"x")
    zone = zone_from_site(site)
    assert set(zone) == {"h1.test", "r.test", "only-resp.test"}


# ------------------------------------------------------- transport mode
def test_unknown_host_fails_at_dns_never_reaching_http():
    site = SiteGraph()
    site.hosts = ["known.test"]
    site.responses["http://known.test/x"] = Response(status=200,
                                                     content=b"ok")
    with FixtureHTTPServer(site) as http_srv, \
            FixtureDNSServer(zone_from_site(site)) as dns_srv:
        t = SocketTransport(http_srv.addr,
                            dns_resolver=DnsResolver(dns_srv.addr))
        fr = t.request("http://ghost.test/y")
        assert fr.curl_code == CURLE_COULDNT_RESOLVE_HOST
        assert fr.curl_error == "Couldn't resolve host name"
        rb = t.fetch_robots("ghost.test")
        assert rb.curl_code == CURLE_COULDNT_RESOLVE_HOST
        # the known host still works, through a real resolve
        assert t.request("http://known.test/x").content == b"ok"
        assert dns_srv.n_queries >= 2


@pytest.fixture(scope="module")
def corpus():
    _, site, seeds = generate_corpus(seed=7, n_hosts=10, pages_per_host=5,
                                     hot_host_factor=3)
    # an accepted seed whose host exists nowhere: in DNS mode its
    # resolve-fail row must come from a real NXDOMAIN exchange
    seeds = list(seeds) + ["http://never-registered.test/a.png"]
    return site, seeds


def test_dns_crawl_parity_full_corpus(corpus):
    site, seeds = corpus

    def crawl(transport):
        sim = ReferenceSimulator(site, parallel=6, transport=transport)
        sim.feed(seeds)
        return sim.run(), sim.metrics

    with FixtureHTTPServer(site) as http_srv, \
            FixtureDNSServer(zone_from_site(site)) as dns_srv:
        res_d, met_d = crawl(SocketTransport(
            http_srv.addr, dns_resolver=DnsResolver(dns_srv.addr)))
        n_dns = dns_srv.n_queries
    res_f, met_f = crawl(FixtureTransport(site))
    assert met_d == met_f
    assert res_d.url_seen == res_f.url_seen
    for a, b in zip(res_d.saved, res_f.saved):
        assert dataclasses.asdict(a) == dataclasses.asdict(b), a.url
    # the planted unknown host produced a curl-6 row on BOTH sides
    bad = [d for d in res_d.saved if "never-registered" in d.url]
    assert bad and bad[0].curl_code == CURLE_COULDNT_RESOLVE_HOST
    # the cache bounds wire traffic: ~one query per distinct host,
    # never one per request
    n_hosts = len({u.split("/", 3)[2].lower()
                   for u in site.responses} | {"never-registered.test"})
    assert n_dns <= n_hosts + 3


def test_ray_fetch_pool_with_dns(ray_session, corpus):
    from mycelium_ray.pipelines.crawl import RayCrawler
    site, seeds = corpus
    ref = ReferenceSimulator(site, parallel=6)
    ref.feed(seeds)
    ref_res = ref.run()
    with FixtureHTTPServer(site) as http_srv, \
            FixtureDNSServer(zone_from_site(site)) as dns_srv:
        crawler = RayCrawler(site, parallel=6, n_fetchers=3,
                             transport_addr=http_srv.addr,
                             transport_dns=dns_srv.addr)
        crawler.feed(seeds)
        res = crawler.run()
        assert dns_srv.n_queries > 0   # actors really resolved over UDP
    assert res.url_seen == ref_res.url_seen
    assert [(d.url, d.http_code, d.curl_code) for d in res.saved] == \
        [(d.url, d.http_code, d.curl_code) for d in ref_res.saved]


def test_dns_plus_tls_full_stack(corpus):
    """The complete real-wire stack: UDP resolve → TLS handshake →
    HTTP/1.1 — still byte-identical to the in-process fixture."""
    from mycelium_ray.corpus import to_https
    from mycelium_ray.tlscert import (make_client_context,
                                      make_self_signed_cert,
                                      make_server_context)
    site, seeds = corpus
    site, seeds = to_https(site, seeds)
    from mycelium_ray.tlscert import tls_san_hosts
    cert, key = make_self_signed_cert(hosts=tls_san_hosts(site, seeds))

    def crawl(transport):
        sim = ReferenceSimulator(site, parallel=6, transport=transport,
                                 schemes=("https",))
        sim.feed(seeds)
        return sim.run(), sim.metrics

    with FixtureHTTPServer(site, tls_context=make_server_context(cert, key)) \
            as http_srv, FixtureDNSServer(zone_from_site(site)) as dns_srv:
        res_d, met_d = crawl(SocketTransport(
            http_srv.addr, ssl_context=make_client_context(cert),
            dns_resolver=DnsResolver(dns_srv.addr)))
    res_f, met_f = crawl(FixtureTransport(site))
    assert met_d == met_f and res_d.url_seen == res_f.url_seen
    for a, b in zip(res_d.saved, res_f.saved):
        assert dataclasses.asdict(a) == dataclasses.asdict(b), a.url
