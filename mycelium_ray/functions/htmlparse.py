"""HTML link/metadata extraction — operators M11-M16 of SURVEY.md §2.2.

From-scratch reimplementation (Python ``html.parser`` instead of the
reference's flex SGML lexer, /root/reference/src/html_lexer/html.ll) of the
*extraction semantics*:

- link extraction (M12): ``<a href>`` / ``<frame src>`` / ``<iframe src>``,
  relative refs resolved against base_url via RFC 3986 merge, anchor text
  captured between <a>…</a>, ``rel=nofollow`` drops the link at close
  (HTML_lexer.cc:513-564, link_add/submit at :266-326)
- text extraction (M13): DATA inside <body> excluding <script>/<style>,
  word breaks on block tags, <title> captured (HTML_lexer.cc:87-181,
  :244-253, :730-788)
- meta robots (M14): index/follow booleans from
  ``<meta name=robots content=…>`` (HTML_lexer.cc:344-385); both default
  True (crawler treats absence as all)
- feed discovery (M15): ``<link rel=alternate type=…>`` → rss2/atom/rss,
  absolutized (HTML_lexer.cc:457-507)
- meta refresh (M16): ``content="N; url=…"`` emitted as a link
  (HTML_lexer.cc:426-433, regex :31)
- entity handling (M17): html.parser converts entities via
  ``convert_charrefs`` (the reference's Entity_handler.cc)

Exposed both as a pure function (``html_lex``, mirroring the reference's
Python binding ``common.html_lex`` — common_python.cc:10-124) and as a
``map_batches``-ready batch op.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from html.parser import HTMLParser

from ..urlcanon import Url, UrlParseError

META_REFRESH_RE = re.compile(r"^\d+; url=(.+)$", re.IGNORECASE)
CHARSET_RE = re.compile(r'charset=([^\x00-\x1f()<>@,;\\:"/\[\]?={}\t ]+)')

BLOCK_TAGS = {
    "p", "div", "br", "td", "tr", "table", "li", "ul", "ol", "h1", "h2",
    "h3", "h4", "h5", "h6", "dd", "dl", "dt", "blockquote", "pre", "hr",
    "form", "input", "option", "select", "textarea", "thead", "tbody",
    "tfoot", "th", "caption", "center", "frame", "iframe", "img", "map",
    "area", "object", "param", "address", "fieldset", "legend",
}


@dataclass
class Link:
    url: str = ""
    txt: str = ""


@dataclass
class Analysis:
    title: str = ""
    rss2: str = ""
    rss: str = ""
    atom: str = ""
    charset: str = ""
    index: bool = True
    follow: bool = True


@dataclass
class ProcHTML:
    base_url: str = ""
    text: str = ""
    links: list = field(default_factory=list)
    warnings: list = field(default_factory=list)
    analysis: Analysis = field(default_factory=Analysis)


class _Extractor(HTMLParser):
    def __init__(self, base_url: str):
        super().__init__(convert_charrefs=True)
        self.base: Url | None = None
        try:
            if base_url:
                self.base = Url(base_url).normalize()
        except UrlParseError:
            self.base = None
        self.out = ProcHTML(base_url=base_url)
        self._text: list[str] = []
        self._in_body = False
        self._skip_depth = 0       # inside script/style
        self._in_title = False
        self._cur: Link | None = None
        self._nofollow = False

    # --- url resolution (link_add semantics, HTML_lexer.cc:266-297) ---
    def _resolve(self, link: str) -> str | None:
        try:
            u = Url(link.strip())
            u.normalize()
            if u.absolute:
                return u.get()
            if self.base is None:
                return link
            full = self.base.copy()
            full.merge_ref(u)
            return full.get()
        except (UrlParseError, Exception):
            return None

    def _emit(self, url: str | None, txt: str = "") -> None:
        if url:
            self.out.links.append(Link(url=url, txt=txt.strip()))

    # --- tag handlers ---
    def handle_starttag(self, tag, attrs):
        a = {k.lower(): (v or "") for k, v in attrs}
        if tag in ("script", "style"):
            self._skip_depth += 1
        elif tag == "body":
            self._in_body = True
        elif tag == "title":
            self._in_title = True
        elif tag == "a":
            href = a.get("href")
            rel = a.get("rel", "")
            self._nofollow = "nofollow" in rel.lower().split()
            if href is not None:
                self._cur = Link(url="", txt="")
                self._cur.url = self._resolve(href) or ""
        elif tag in ("frame", "iframe"):
            src = a.get("src")
            if src is not None:
                self._emit(self._resolve(src))
        elif tag == "meta":
            self._meta(a)
        elif tag == "link":
            self._link_rel(a)
        elif tag == "base":
            href = a.get("href")
            if href:
                try:
                    self.base = Url(href).normalize()
                except UrlParseError:
                    pass
        if tag in BLOCK_TAGS:
            self._text.append(" ")

    def handle_startendtag(self, tag, attrs):
        self.handle_starttag(tag, attrs)
        if tag not in ("meta", "link", "base", "frame", "iframe", "br",
                       "img", "hr", "input"):
            self.handle_endtag(tag)

    def handle_endtag(self, tag):
        if tag in ("script", "style"):
            self._skip_depth = max(0, self._skip_depth - 1)
        elif tag == "body":
            self._in_body = False
        elif tag == "title":
            self._in_title = False
        elif tag == "a":
            # op_a_c (HTML_lexer.cc:551-564): nofollow drops, else submit
            if self._cur is not None and not self._nofollow and self._cur.url:
                self.out.links.append(self._cur)
            self._cur = None
            self._nofollow = False
        if tag in BLOCK_TAGS:
            self._text.append(" ")

    def handle_data(self, data):
        if self._in_title:
            self.out.analysis.title += data
        if self._in_body and not self._skip_depth:
            self._text.append(data)
            if self._cur is not None:
                self._cur.txt += data

    # --- meta handling (op_meta, HTML_lexer.cc:387-436) ---
    def _meta(self, a: dict) -> None:
        if a.get("name", "").lower() == "robots" and "content" in a:
            for tok in re.split(r"[, ]+", a["content"].lower()):
                an = self.out.analysis
                if tok == "index":
                    an.index = True
                elif tok == "follow":
                    an.follow = True
                elif tok == "all":
                    an.index = an.follow = True
                    return
                elif tok == "noindex":
                    an.index = False
                elif tok == "nofollow":
                    an.follow = False
                elif tok == "none":
                    an.index = an.follow = False
                    return
        he = a.get("http-equiv", "").lower()
        if he == "content-type" and "content" in a:
            m = CHARSET_RE.search(a["content"])
            if m:
                self.out.analysis.charset = m.group(1).strip()
        elif he == "refresh" and "content" in a:
            m = META_REFRESH_RE.search(a["content"])
            if m:
                self._emit(self._resolve(m.group(1)))

    # --- feed discovery (op_link, HTML_lexer.cc:457-507) ---
    def _link_rel(self, a: dict) -> None:
        if a.get("rel", "").lower() != "alternate" or "href" not in a:
            return
        href = self._resolve(a["href"]) or a["href"].strip()
        t = a.get("type", "").lower()
        if t == "application/rss+xml":
            self.out.analysis.rss2 = href
        elif t == "application/atom+xml":
            self.out.analysis.atom = href
        elif t == "text/xml":
            self.out.analysis.rss = href


def html_lex(html: str, base_url: str = "") -> ProcHTML:
    """Pure-function parse (the reference's ``common.html_lex`` contract,
    doc/sphinx/source/html_lexer.rst:13-30)."""
    ex = _Extractor(base_url)
    try:
        ex.feed(html)
        ex.close()
    except Exception as e:  # parser must never take the pipeline down
        ex.out.warnings.append(str(e))
    ex.out.text = re.sub(r"\s+", " ", "".join(ex._text)).strip()
    ex.out.analysis.title = ex.out.analysis.title.strip()
    return ex.out


def extract_links_batch(batch, html_col: str = "content",
                        url_col: str = "url"):
    """flat_map-shaped map_batches op: page rows → outlink rows
    (src_url, dst_url, anchor_text, follow)."""
    import pyarrow as pa
    src, dst, txt, follow = [], [], [], []
    for u, html in zip(batch[url_col].to_pylist(),
                       batch[html_col].to_pylist()):
        if html is None:
            continue
        if isinstance(html, bytes):
            html = html.decode("utf-8", "replace")
        res = html_lex(html, u)
        for ln in res.links:
            src.append(u)
            dst.append(ln.url)
            txt.append(ln.txt)
            follow.append(res.analysis.follow)
    return pa.table({
        "src_url": pa.array(src, pa.string()),
        "dst_url": pa.array(dst, pa.string()),
        "anchor_text": pa.array(txt, pa.string()),
        "follow": pa.array(follow),
    })
