"""URL canonicalization parity tests.

Golden cases ported from /root/reference/src/unit_tests/Url_test.cc:134-183
(Url_test_parsing + Url_test_compare) plus escape-table edge cases from
/root/reference/src/common/Url.hh:167-195.
"""
import pytest

from mycelium_ray.urlcanon import (
    Url, UrlParseError, UrlPath, escape, unescape_safe, unescape_not,
    normalize_escapes_str, canonicalize, try_canonicalize,
    R, U, A, P, Q, F,
)

# (url, scheme, userinfo, host, port, path, query, fragment,
#  has_authority, has_query, has_fragment) — Url_test.cc:137-147
PARSE_CASES = [
    ("", "", "", "", "", "", "", "", False, False, False),
    ("mojito/para/todos", "", "", "", "", "mojito/para/todos", "", "", False, False, False),
    ("mojito?q=a+b+c&r=c#r", "", "", "", "", "mojito", "?q=a+b+c&r=c", "#r", False, True, True),
    ("culo?q=a&r=c#r", "", "", "", "", "culo", "?q=a&r=c", "#r", False, True, True),
    ("file:///", "file", "", "", "", "/", "", "", True, False, False),
    ("file:///a/b/c.html", "file", "", "", "", "/a/b/c.html", "", "", True, False, False),
    ("ftp://foo.com/bar/b.html?q=r#nn", "ftp", "", "foo.com", "", "/bar/b.html", "?q=r", "#nn", True, True, True),
    ("ftp://domo@foo.com:69/bar/b.html?q=r#nn", "ftp", "domo", "foo.com", "69", "/bar/b.html", "?q=r", "#nn", True, True, True),
    ("ftp://%32o@f%33oo.com:69/bar/b.html?q=r#nn", "ftp", "%32o", "f%33oo.com", "69", "/bar/b.html", "?q=r", "#nn", True, True, True),
    ("ftp://%32o@f%33oo.com:69/%2Fbar/b.html?q=r+b#nn", "ftp", "%32o", "f%33oo.com", "69", "/%2Fbar/b.html", "?q=r+b", "#nn", True, True, True),
    ("http://[fe80::202:3fff:feb7:e652]/rabo/mo?q=a#f", "http", "", "fe80::202:3fff:feb7:e652", "", "/rabo/mo", "?q=a", "#f", True, True, True),
]


@pytest.mark.parametrize("case", PARSE_CASES, ids=[c[0] or "<empty>" for c in PARSE_CASES])
def test_parsing(case):
    (url, scheme, userinfo, host, port, path, query, fragment,
     has_authority, has_query, has_fragment) = case
    u = Url(url)
    assert u.scheme == scheme
    assert u.userinfo == userinfo
    assert u.host == host
    assert u.port == port
    assert u.path.get() == path
    assert u.query == query
    assert u.fragment == fragment
    assert u.has_authority == has_authority
    assert u.has_query() == has_query
    assert u.has_fragment() == has_fragment
    # round-trip equality, as in test_parsing's final check
    assert Url(url) == u


# Url_test.cc:154-168
EQ_CASES = [
    ("", ""),
    ("/a/../b/", "/b/"),
    ("/%61/../%62/", "/b/"),
    ("/a/../b", "/b"),
    ("/a/../b", "/%62"),
    ("../b", "../b"),
    ("../b/", "../b/"),
    ("b/../c", "c"),
    ("b/a/i/../c", "b/a/c"),
    ("b/a/././../i/../c", "b/c"),
    (".", "."),
    ("http://domo.com/a/../b", "http://domo.com/b"),
    ("http://domo.com/a/../b/", "http://domo.com/b/"),
    ("http://note@domo.com/a/../b/", "http://note@domo.com/b/"),
]

# Url_test.cc:170-175
NOT_EQ_CASES = [
    ("", "?"),
    ("", "#"),
    ("http://host.com/#", "http://host.com/"),
    ("http://host.com/?", "http://host.com/"),
    ("http://note@domo.com/a/../b/", "http://note@domo.com/?q#f"),
    ("http://note@domo.com/", "http://note@domo.com/?#"),
]

# Url_test.cc:177-182
SIZE_CASES = [
    "http://host.com/#",
    "http://host.com/?",
    "http://host.com/path#crap",
    "http://host.com/omg?query",
    "http://note@domo.com/a/../b/",
    "http://note@domo.com/hello_cat",
]


@pytest.mark.parametrize("a,b", EQ_CASES)
def test_eq(a, b):
    assert Url(a) == Url(b), f"{Url(a).canonical()} != {Url(b).canonical()}"


@pytest.mark.parametrize("a,b", NOT_EQ_CASES)
def test_not_eq(a, b):
    assert Url(a) != Url(b)


@pytest.mark.parametrize("s", SIZE_CASES)
def test_size(s):
    assert Url(s).size() == len(s)


def test_escape_table_edges():
    # '%XX' triplets are preserved, '%' alone is escaped
    assert escape("%2F", P) == "%2F"
    assert escape("a%zz", P) == "a%25zz"
    assert escape("a b", P) == "a%20b"
    # '?' and '#' carry the PATH flag, '/' does not
    assert escape("/a?b#c", P) == "/a%3Fb%23c"
    # AUTH mask escapes '/', '?', '#'
    assert escape("a/b", A) == "a%2Fb"
    # QUERY mask escapes '#' but not '?'
    assert escape("?a#b", Q) == "?a%23b"


def test_unescape_safe():
    assert unescape_safe("%61") == "a"           # 'a' is safe
    assert unescape_safe("%2F") == "%2F"         # '/' is reserved → kept
    assert unescape_safe("%3A") == "%3A"         # ':' reserved|unsafe → kept
    assert unescape_safe("%7E") == "~"           # '~' is safe
    assert normalize_escapes_str("%7e%2f") == "~%2F"  # unescape safe + uppercase rest


def test_path_collapse_runs():
    # Path::assign skips empty segments: 'a//b' → 'a/b'
    assert UrlPath.parse("a//b").get() == "a/b"
    assert UrlPath.parse("/a//b/").get() == "/a/b/"
    assert UrlPath.parse("//").get() == "/"


def test_invalid_urls():
    with pytest.raises(UrlParseError):
        Url("http://")  # empty authority '//' with non-file scheme
    with pytest.raises(UrlParseError):
        Url("http://host:99999999/")  # port out of range
    with pytest.raises(UrlParseError):
        Url("http://ho st/")  # space in host: escaped %20 fails host regex
    ok = try_canonicalize("http://ho st/")
    assert ok == (None, '', False)


def test_merge_ref():
    # RFC 3986 §5.3 cases through Url::merge_ref / Path::merge semantics
    base = Url("http://a/b/c/d;p?q")
    for ref, want in [
        ("g", "http://a/b/c/g"),
        ("./g", "http://a/b/c/g"),
        ("g/", "http://a/b/c/g/"),
        ("/g", "http://a/g"),
        ("?y", "http://a/b/c/d;p?y"),
        ("g?y", "http://a/b/c/g?y"),
        ("#s", "http://a/b/c/d;p?q#s"),
        ("g#s", "http://a/b/c/g#s"),
        ("../g", "http://a/b/g"),
        ("../../g", "http://a/g"),
    ]:
        b = base.copy()
        b.merge_ref(Url(ref))
        assert b.get() == want, f"merge {ref}: {b.get()} != {want}"


def test_canonicalize_api():
    assert canonicalize("HTTP://WwW.ExAmple.COM/a/../b/") == "http://www.example.com/b/"
    assert canonicalize("http://h/%61bc") == "http://h/abc"
    c, host, ok = try_canonicalize("http://HOST.com/x")
    assert ok and c == "http://host.com/x" and host == "host.com"
