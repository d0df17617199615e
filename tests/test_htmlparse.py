"""HTML extraction semantics (M11-M16) tests."""
import pyarrow as pa

from mycelium_ray.functions.htmlparse import extract_links_batch, html_lex

PAGE = """
<html><head>
<title> My  Title </title>
<meta name="robots" content="noindex, follow">
<meta http-equiv="content-type" content="text/html; charset=utf-8">
<meta http-equiv="refresh" content="5; url=/moved/here.html">
<link rel="alternate" type="application/rss+xml" href="/feed.rss">
<link rel="alternate" type="application/atom+xml" href="http://other.test/feed.atom">
<script>var x = "<a href='/not-a-link'>";</script>
</head>
<body>
Hello <b>world</b>.
<a href="/rel/page.html">anchor text</a>
<a href="http://abs.test/x?q=1#frag">abs</a>
<a href="../up.html" rel="nofollow">dropped</a>
<frame src="/framed.html">
<iframe src="sub/inner.html"></iframe>
<style>.a{}</style>
<p>para</p>
</body></html>
"""


def test_html_lex_links():
    res = html_lex(PAGE, "http://base.test/dir/index.html")
    urls = [l.url for l in res.links]
    # meta refresh resolved against base
    assert "http://base.test/moved/here.html" in urls
    # relative href resolved
    assert "http://base.test/rel/page.html" in urls
    # absolute kept (normalized)
    assert "http://abs.test/x?q=1#frag" in urls
    # nofollow dropped (op_a_c semantics)
    assert not any(u.endswith("up.html") for u in urls)
    # frame + iframe srcs
    assert "http://base.test/framed.html" in urls
    assert "http://base.test/dir/sub/inner.html" in urls
    # anchor text captured
    a = next(l for l in res.links if l.url.endswith("rel/page.html"))
    assert a.txt == "anchor text"


def test_html_lex_analysis():
    res = html_lex(PAGE, "http://base.test/dir/index.html")
    an = res.analysis
    assert an.title == "My  Title"
    assert an.index is False and an.follow is True  # noindex, follow
    assert an.charset == "utf-8"
    assert an.rss2 == "http://base.test/feed.rss"
    assert an.atom == "http://other.test/feed.atom"


def test_html_lex_text():
    res = html_lex(PAGE, "http://base.test/")
    # script/style content excluded; body text present with word breaks
    assert "Hello world" in res.text
    assert "not-a-link" not in res.text
    assert "var x" not in res.text
    assert "para" in res.text
    # title text is not body text
    assert "My  Title" not in res.text


def test_meta_robots_none_and_all():
    r = html_lex("<body></body><meta name=robots content='none'>", "")
    assert r.analysis.index is False and r.analysis.follow is False
    r = html_lex("<meta name=robots content='all'><body></body>", "")
    assert r.analysis.index is True and r.analysis.follow is True


def test_extract_links_batch():
    t = pa.table({
        "url": ["http://base.test/dir/index.html", "http://empty.test/"],
        "content": [PAGE.encode(), b"<body>no links</body>"],
    })
    out = extract_links_batch(t)
    assert out.num_rows >= 5
    assert set(out.column_names) == {"src_url", "dst_url", "anchor_text", "follow"}
    assert all(s == "http://base.test/dir/index.html"
               for s in out.column("src_url").to_pylist())


def test_garbage_html_does_not_crash():
    res = html_lex("<<<>><a href=<b>" * 50, "http://x.test/")
    assert isinstance(res.links, list)
