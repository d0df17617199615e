"""Property-based robustness tests (hypothesis).

The canonicalization invariants here are what the crawl's seen-set parity
silently depends on: normalize must be idempotent and get/assign must
round-trip, for anything that parses at all.
"""
import hypothesis.strategies as st
import numpy as np
from hypothesis import given, settings

from mycelium_ray.frontier import FrontierEmpty, UrlClassifier
from mycelium_ray.robots import Robots
from mycelium_ray.state.urlseen import UrlSeenShard
from mycelium_ray.urlcanon import Url, UrlParseError

# url-ish strings: printable ascii with url punctuation over-weighted
_url_chars = st.sampled_from(
    list("abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789"
         ":/?#[]@!$&'()*+,;=-._~% \t"))
urlish = st.text(alphabet=_url_chars, min_size=0, max_size=60)
hosts = st.from_regex(r"[a-z][a-z0-9]{0,8}(\.[a-z]{2,4}){0,2}", fullmatch=True)


@settings(max_examples=300, deadline=None)
@given(urlish)
def test_parse_roundtrip_and_normalize_idempotent(s):
    try:
        u = Url(s)
    except UrlParseError:
        return  # rejection is fine; crashing is not
    except RecursionError:
        raise
    # serialize → reparse is stable WHEN the serialized form re-parses.
    # (Quirk preserved from the reference: the scheme setter marks
    # has_authority — Url.cc:391 — so bare "a:" serializes to "a://",
    # which assign() rejects for non-file schemes. Same behavior in C++.)
    s1 = u.get()
    try:
        u2 = Url(s1)
    except UrlParseError:
        return
    assert u2.get() == s1
    # normalize is idempotent
    try:
        n1 = Url(s).normalize().get()
    except UrlParseError:
        return  # normalize re-parses; some degenerate forms fail there
    n2 = Url(n1).normalize().get()
    assert n2 == n1


@settings(max_examples=100, deadline=None)
@given(hosts, st.lists(st.sampled_from("abc/."), min_size=0, max_size=12))
def test_http_urls_always_canonicalize(host, path_chars):
    s = f"http://{host}/" + "".join(path_chars)
    try:
        c = Url(s).normalize().get()
    except UrlParseError:
        return
    assert c.startswith("http://")
    assert Url(c).normalize().get() == c


@settings(max_examples=50, deadline=None)
@given(st.text(min_size=0, max_size=300))
def test_robots_parser_never_crashes(body):
    r = Robots()
    res = r.parse(body)
    assert res in (0, -1)
    assert r.path_allowed("any-agent", "/any/path") in (True, False)


@settings(max_examples=50, deadline=None)
@given(st.lists(st.tuples(hosts, st.integers(0, 10**6)),
                min_size=0, max_size=60),
       st.integers(1, 6))
def test_frontier_conservation(items, n_queues):
    """Everything pushed is popped exactly once; FIFO within host."""
    c = UrlClassifier(n_queues)
    for host, payload in items:
        c.push(host, payload)
    assert c.size() == len(items)
    drained = []
    while not c.empty():
        progressed = False
        for n in range(n_queues):
            try:
                drained.append(c.peek(n))
                c.pop(n)
                progressed = True
            except FrontierEmpty:
                continue
        assert progressed, "frontier stuck with items remaining"
    assert sorted(p for _, p in drained) == sorted(p for _, p in items)
    # FIFO within each host
    per_host: dict = {}
    for h, p in drained:
        per_host.setdefault(h, []).append(p)
    pushed: dict = {}
    for h, p in items:
        pushed.setdefault(h, []).append(p)
    assert per_host == pushed


@settings(max_examples=30, deadline=None)
@given(st.lists(st.integers(0, 2**63 - 1), min_size=0, max_size=300))
def test_urlseen_no_false_drops(keys):
    """check_and_insert never drops a genuinely-novel key (exact-verify
    mode) and never double-admits a seen one."""
    s = UrlSeenShard(0, capacity=1 << 12)
    seen = set()
    arr = np.array(keys, dtype=np.uint64)
    out = s.check_and_insert(arr)
    for k, novel in zip(keys, out):
        assert novel == (k not in seen)
        seen.add(k)
