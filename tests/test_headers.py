"""HTTP header parsing tests (M7).

Golden block ported from
/root/reference/src/unit_tests/Parse_http_headers_test.cc:14-33.
"""
from mycelium_ray.http_headers import (
    ContentType, acceptable, parse_http_headers, sniff_format)

SLASHDOT = (
    "HTTP/1.1 200 OK\r\n"
    "Server: Apache/2.2.3 (CentOS)\r\n"
    "SLASH_LOG_DATA: shtml\r\n"
    "Cache-Control: no-cache\r\n"
    "Pragma: no-cache\r\n"
    "X-XRDS-Location: http://slashdot.org/slashdot.xrds\r\n"
    "Content-Type: text/html; charset=utf-8\r\n"
    "Content-Length: 98342\r\n"
    "Date: Sat, 07 Apr 2012 21:28:26 GMT\r\n"
    "X-Varnish: 33994908 33994320\r\n"
    "Age: 53\r\n"
    "Connection: keep-alive\r\n"
)


def test_golden_slashdot_block():
    ctype, charset, hmap = parse_http_headers(SLASHDOT)
    assert ctype == ContentType.TEXT_HTML
    assert charset == "utf-8"
    assert hmap["Server"] == " Apache/2.2.3 (CentOS)"
    assert hmap["Age"] == " 53"
    # the status line is not a header (no colon before a separator)
    assert not any(k.startswith("HTTP") for k in hmap)


def test_content_type_chain():
    for value, want in [
        ("text/plain", ContentType.TEXT_PLAIN),
        ("application/xhtml+xml", ContentType.XHTML),
        ("application/pdf", ContentType.APPLICATION_PDF),
        ("application/rss+xml", ContentType.RSS_XML),
        ("application/atom+xml", ContentType.ATOM_XML),
        ("image/jpeg", ContentType.IMAGE_JPEG),
        ("image/png", ContentType.IMAGE_PNG),
        ("image/webp", ContentType.IMAGE_WEBP),
        ("application/x-weird", ContentType.UNRECOGNIZED),
    ]:
        ctype, _, _ = parse_http_headers(f"Content-Type: {value}\r\n")
        assert ctype == want, value


def test_acceptable_gate():
    # UNRECOGNIZED < ctype < EMPTY (crawler.cc:1206-1209)
    assert not acceptable(ContentType.UNRECOGNIZED)
    assert not acceptable(ContentType.EMPTY)
    assert acceptable(ContentType.TEXT_HTML)
    assert acceptable(ContentType.IMAGE_PNG)


def test_line_splitting_edges():
    # mixed LF/CRLF, short segments skipped, trailing partial line dropped
    ctype, charset, hmap = parse_http_headers(
        "A: 1\nB: 2\r\nX\r\nC: 3")  # 'C: 3' has no trailing newline
    assert hmap == {"A": " 1", "B": " 2"}
    assert ctype == ContentType.EMPTY
    # case-insensitive content-type name
    ctype, _, _ = parse_http_headers("content-TYPE: text/plain\n")
    assert ctype == ContentType.TEXT_PLAIN


def test_sniff_magic():
    assert sniff_format(b"\xff\xd8\xff\xe0rest") == "jpeg"
    assert sniff_format(b"%PDF-1.4") == "pdf"
    assert sniff_format(b"RIFFxxxxWEBPrest") == "webp"
    assert sniff_format(b"RIFFxxxxAVI rest") == "avi"   # r4: real demuxer
    assert sniff_format(b"YUV4MPEG2 W2 H2 C444\n") == "y4m"
    assert sniff_format(b"RIFFxxxxWAVErest") == "unknown"


def test_sniff_charset():
    from mycelium_ray.http_headers import sniff_charset

    assert sniff_charset("plain ascii".encode()) == "utf-8"
    assert sniff_charset("déjà vu".encode("utf-8")) == "utf-8"
    assert sniff_charset(b"\xef\xbb\xbf" + b"x") == "utf-8-sig"
    assert sniff_charset(b"\xff\xfe" + "hé".encode("utf-16-le")) == "utf-16-le"
    assert sniff_charset(b"\xfe\xff" + "hé".encode("utf-16-be")) == "utf-16-be"
    # invalid utf-8 falls back to latin-1 (the never-fails browser rule)
    assert sniff_charset("café".encode("latin-1")) == "latin-1"


def test_sniff_charset_roundtrips_non_ascii():
    """The decode mapping used by textops.charset_decode reproduces the
    exact original text for non-ASCII content in every BOM class."""
    from mycelium_ray.http_headers import sniff_charset

    text = "naïve — ünïcodé ✓"
    wires = [
        text.encode("utf-8"),
        b"\xef\xbb\xbf" + text.encode("utf-8"),
        b"\xff\xfe" + text.encode("utf-16-le"),
        b"\xfe\xff" + text.encode("utf-16-be"),
    ]
    dec = {"utf-8": "utf-8", "utf-8-sig": "utf-8-sig",
           "utf-16-le": "utf-16", "utf-16-be": "utf-16"}
    for w in wires:
        got = sniff_charset(w)
        assert w.decode(dec[got]) == text


class TestCachePolicy:
    """RFC 9111 freshness subset (http_headers.freshness_lifetime)."""

    def test_directive_parse(self):
        from mycelium_ray.http_headers import parse_cache_control
        assert parse_cache_control('private, max-age=60, s-maxage="600"') \
            == {"private": True, "max-age": "60", "s-maxage": "600"}
        assert parse_cache_control("") == {}
        assert parse_cache_control(" , ,no-store ") == {"no-store": True}

    def test_precedence_and_semantics(self):
        from mycelium_ray.http_headers import freshness_lifetime as fl
        assert fl("no-store", None, None) == (0, False, False)
        # private blocks a SHARED cache but not a private one
        assert fl("private, max-age=60", None, None) == (0, False, False)
        assert fl("private, max-age=60", None, None, shared=False) \
            == (60, True, False)
        assert fl("no-cache", None, None) == (0, True, True)
        assert fl("max-age=3600", None, None) == (3600, True, False)
        # s-maxage beats max-age for a shared cache
        assert fl("max-age=60, s-maxage=600", None, None) == (600, True,
                                                              False)
        assert fl("max-age=60, s-maxage=600", None, None, shared=False) \
            == (60, True, False)
        # Expires - Date fallback; malformed numerics ignored per spec
        assert fl("", 1000, 400) == (600, True, False)
        assert fl("max-age=oops", 1000, 400) == (600, True, False)
        assert fl("max-age=-5", None, None) == (0, True, False)
        assert fl("", None, None) == (0, True, False)

    def test_heuristic_freshness(self):
        from mycelium_ray.http_headers import freshness_lifetime as fl
        # §4.2.2: no explicit lifetime → 10% of (Date - Last-Modified)
        assert fl("", None, 100000, last_modified_epoch=90000) \
            == (1000, True, False)
        # explicit lifetime wins over the heuristic
        assert fl("max-age=5", None, 100000, last_modified_epoch=0) \
            == (5, True, False)
        # no Last-Modified either → 0
        assert fl("", None, 100000) == (0, True, False)
