"""robots.txt parity tests.

The matching table is ported verbatim from the documentation block at
/root/reference/src/crawler/Robots.hh:70-93; grammar cases exercise
/root/reference/src/crawler/robots.ll:31-139 (comments, crawl-delay,
multiple UA groups, HTML-garbage bailout).
"""
import pytest

from mycelium_ray.robots import (
    Robots, RobotsEntry, RobotsState, ALLOW, DISALLOW, CRAWL_DELAY,
    canon_rule_path,
)

# (record_path, url_path, matches) — Robots.hh:73-92
MATCH_TABLE = [
    ("/tmp", "/tmp", True),
    ("/tmp", "/tmp.html", True),
    ("/tmp", "/tmp/a.html", True),
    ("/tmp/", "/tmp", False),
    ("/tmp/", "/tmp/", True),
    ("/tmp/", "/tmp/a.html", True),
    ("/a%3cd.html", "/a%3cd.html", True),
    ("/a%3Cd.html", "/a%3cd.html", True),
    ("/a%3cd.html", "/a%3Cd.html", True),
    ("/a%3Cd.html", "/a%3Cd.html", True),
    ("/a%2fb.html", "/a%2fb.html", True),
    ("/a%2fb.html", "/a/b.html", False),
    ("/a/b.html", "/a%2fb.html", False),
    ("/a/b.html", "/a/b.html", True),
    ("/%7ejoe/index.html", "/~joe/index.html", True),
    ("/~joe/index.html", "/%7Ejoe/index.html", True),
]


@pytest.mark.parametrize("rule,path,matches", MATCH_TABLE)
def test_match_table(rule, path, matches):
    r = Robots(f"User-agent: *\nDisallow: {rule}\n")
    # Disallow rule matching ⇒ path NOT allowed
    assert r.path_allowed("mycelium", path) == (not matches)


def test_first_match_wins_and_default_allowed():
    r = Robots("User-agent: *\nAllow: /pub\nDisallow: /\n")
    assert r.path_allowed("x", "/pub/a.html") is True   # Allow matches first
    assert r.path_allowed("x", "/private") is False     # Disallow / prefix
    r2 = Robots("User-agent: *\nDisallow: /private\n")
    assert r2.path_allowed("x", "/other") is True       # no match ⇒ allowed


def test_ua_groups():
    body = (
        "User-agent: googlebot\n"
        "User-agent: mycelium\n"
        "Disallow: /both\n"
        "\n"
        "User-agent: *\n"
        "Disallow: /\n"
    )
    r = Robots(body)
    assert len(r.groups) == 2
    assert r.groups[0].ua == ["googlebot", "mycelium"]
    # mycelium hits group 1 only: /both disallowed, everything else allowed
    assert r.path_allowed("mycelium", "/both/x") is False
    assert r.path_allowed("mycelium", "/elsewhere") is True
    # unknown UA falls to '*': everything disallowed
    assert r.path_allowed("otherbot", "/elsewhere") is False


def test_comments_and_blank_lines():
    body = (
        "# a full-line comment\n"
        "User-agent: * # trailing comment\n"
        "   \n"
        "Disallow: /secret # also trailing\n"
        "#another\n"
    )
    r = Robots(body)
    assert r.groups[0].ua == ["*"]
    assert r.groups[0].rules == [(DISALLOW, "/secret")]
    assert r.path_allowed("any", "/secret/page") is False


def test_crawl_delay():
    r = Robots("User-agent: *\nCrawl-delay: 2.5\nDisallow: /x\n")
    assert r.crawl_delay("bot") == 2.5
    assert (CRAWL_DELAY, "2.5") in r.groups[0].rules
    # crawl-delay rules never affect matching
    assert r.path_allowed("bot", "/y") is True
    assert r.path_allowed("bot", "/x1") is False


def test_case_insensitive_directives():
    r = Robots("USER-AGENT: *\nDISALLOW: /a\nallow: /a/b\n")
    assert r.groups[0].ua == ["*"]
    # first match wins: Disallow /a precedes Allow /a/b
    assert r.path_allowed("x", "/a/b") is False


def test_html_garbage_eparse():
    html = "<html><body>not robots</body></html>"
    assert Robots().parse(html) == -1
    e = RobotsEntry(text=html)
    assert e.state == RobotsState.EPARSE
    assert e.tried_but_failed()
    assert e.allowed("ua", "/anything") is True  # crawler.cc:1037-1049


def test_entry_states():
    assert RobotsEntry(state=RobotsState.NOT_AVAILABLE).allowed("u", "/p") is True
    present = RobotsEntry(text="User-agent: *\nDisallow: /\n")
    assert present.state == RobotsState.PRESENT
    assert present.allowed("u", "/p") is False
    # EMPTY (never fetched) behaves as allowed at decision level
    assert RobotsEntry().allowed("u", "/p") is True


def test_canon_rule_path():
    assert canon_rule_path("/%7ejoe") == "/~joe"
    assert canon_rule_path("/a%3cd") == "/a%3Cd"
    assert canon_rule_path("/a%2fb") == "/a%2Fb"
    assert canon_rule_path("/a b") == "/a%20b"


def test_roundtrip_record():
    e = RobotsEntry(text="User-agent: a\nDisallow: /x\nUser-agent: *\nAllow: /\n")
    e2 = RobotsEntry.from_record(e.to_record())
    assert e2.state == e.state
    assert [(g.ua, g.rules) for g in e2.groups] == [(g.ua, g.rules) for g in e.groups]
    assert e2.path_allowed("a", "/x/1") == e.path_allowed("a", "/x/1") == False  # noqa: E712


def test_path_allowed_many_matches_scalar():
    """Vectorized matcher ≡ per-path matcher over adversarial paths
    (escapes, case, unicode, allow-before-disallow ordering)."""
    import numpy as np
    body = ("User-agent: a\nDisallow: /never/\n\n"
            "User-agent: *\nAllow: /d/pub\nDisallow: /d/\n"
            "Crawl-delay: 3\nDisallow: /%7Etmp\nAllow: \n")
    r = Robots(body)
    paths = ["/d/1/x.png", "/d/pub/2.png", "/d", "/D/1", "/other",
             "/%7etmp/a", "/~tmp/b", "/%2Fq", "/d/pub", "/d/",
             "/näive/p", "", "/never/ok", "/d/pub/../d/9"]
    got = r.path_allowed_many("*", paths)
    want = np.array([r.path_allowed("*", p) for p in paths])
    assert (got == want).all(), list(zip(paths, got, want))
    got_a = r.path_allowed_many("a", paths)
    want_a = np.array([r.path_allowed("a", p) for p in paths])
    assert (got_a == want_a).all()
    # UA with no matching group: everything allowed
    r2 = Robots("User-agent: onlybot\nDisallow: /\n")
    assert r2.path_allowed_many("*", paths).all() == all(
        r2.path_allowed("*", p) for p in paths)


def test_sitemap_directive_group_independent():
    from mycelium_ray.robots import Robots
    r = Robots("User-agent: *\nDisallow: /a\n"
               "Sitemap: http://h/s1.xml\n"
               "SITEMAP: http://h/s2.xml  # comment\n"
               "User-agent: bot\nDisallow: /b\n")
    assert r.sitemaps == ["http://h/s1.xml", "http://h/s2.xml"]
    # the mid-file Sitemap lines must not have split the UA groups:
    # both groups present with their own rules, '*' still enforced
    assert not r.path_allowed("*", "/a/x")
    assert [g.ua for g in r.groups] == [["*"], ["bot"]]
    assert [len(g.rules) for g in r.groups] == [1, 1]
    # empty Sitemap value ignored, state preserved
    r2 = Robots("Sitemap:\nUser-agent: *\nDisallow: /c\n")
    assert r2.sitemaps == [] and not r2.path_allowed("*", "/c")


class TestRfc9309:
    """Opt-in RFC 9309 matcher beside the reference prefix matcher."""

    def test_wildcard_and_anchor(self):
        from mycelium_ray.robots import Robots
        r = Robots("User-agent: *\nDisallow: /*.tmp$\nDisallow: /d/1*\n"
                   "Allow: /d/1*0.png\n")
        f = r.path_allowed_rfc9309
        assert f("b", "/ok.png")
        assert not f("b", "/x/file.tmp")
        assert f("b", "/x/file.tmpx")        # $ anchors the END
        assert not f("b", "/d/19.png")       # /d/1* disallow
        assert f("b", "/d/10.png")           # longer allow wins
        assert f("b", "/d/2.png")

    def test_longest_match_wins_and_allow_breaks_ties(self):
        from mycelium_ray.robots import Robots
        r = Robots("User-agent: *\nAllow: /p/\nDisallow: /p/\n")
        assert r.path_allowed_rfc9309("b", "/p/x")   # tie → Allow
        r2 = Robots("User-agent: *\nAllow: /p/\nDisallow: /p/deep/\n")
        assert not r2.path_allowed_rfc9309("b", "/p/deep/x")

    def test_specific_ua_beats_star(self):
        from mycelium_ray.robots import Robots
        r = Robots("User-agent: special\nDisallow: /x\n\n"
                   "User-agent: *\nAllow: /x\n")
        assert not r.path_allowed_rfc9309("special", "/x/1")
        assert r.path_allowed_rfc9309("other", "/x/1")

    def test_reference_matcher_unchanged(self):
        from mycelium_ray.robots import Robots
        r = Robots("User-agent: *\nDisallow: /*.tmp$\n")
        # prefix semantics can never match a wildcard rule text
        assert r.path_allowed("b", "/x/file.tmp")
        assert not r.path_allowed_rfc9309("b", "/x/file.tmp")


def test_simulator_rfc9309_mode():
    """Opt-in crawl-level RFC 9309 matching: a wildcard Disallow that the
    reference prefix matcher cannot see blocks fetches in rfc9309 mode
    and not in reference mode; everything else crawls identically."""
    from mycelium_ray.corpus import Response, SiteGraph
    from mycelium_ray.simulator import ReferenceSimulator
    site = SiteGraph()
    site.hosts = ["h.test"]
    site.robots["h.test"] = "User-agent: *\nDisallow: /*.tmp$\n"
    site.responses["http://h.test/a.png"] = Response(
        status=200, content=b"\x89PNGa", content_type="image/png")
    site.responses["http://h.test/b.tmp"] = Response(
        status=200, content=b"junk", content_type="image/png")
    seeds = ["http://h.test/a.png", "http://h.test/b.tmp"]

    def crawl(matcher):
        sim = ReferenceSimulator(site, parallel=2, robots_matcher=matcher)
        sim.feed(seeds)
        res = sim.run()
        return {d.url for d in res.saved if d.http_code == 200}

    ref = crawl("reference")
    rfc = crawl("rfc9309")
    assert "http://h.test/b.tmp" in ref       # prefix matcher: blind
    assert "http://h.test/b.tmp" not in rfc   # wildcard enforced
    assert "http://h.test/a.png" in ref and "http://h.test/a.png" in rfc

    import pytest
    with pytest.raises(ValueError):
        ReferenceSimulator(site, robots_matcher="nope")
