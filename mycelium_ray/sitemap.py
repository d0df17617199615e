"""Sitemap protocol (sitemaps.org XML) builder + parser.

Crawlers bootstrap per-host URL discovery from ``/sitemap.xml``: a
``<urlset>`` of ``<url><loc>…</loc></url>`` entries, optionally behind a
``<sitemapindex>`` that lists per-section sitemap files. This module
implements both directions over stdlib ``xml.etree`` — build (for the
derived test corpus and the simulator's fixture hosts) and parse (the
crawl-side op: loc/lastmod/priority extraction with entity unescaping
and namespace tolerance).

Reference analog: larroy/mycelium discovers URLs from page links and
``<link rel>`` feeds (HTML_lexer.cc link records, M15 feed discovery);
sitemap ingestion is the same frontier-seeding surface fed from the
standard XML sidecar instead of page bodies.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET
from xml.sax.saxutils import escape

NS = "http://www.sitemaps.org/schemas/sitemap/0.9"


def build_urlset(entries: list[tuple[str, str | None, float | None]]) -> bytes:
    """``<urlset>`` XML for (loc, lastmod, priority) entries. loc text is
    entity-escaped (& -> &amp; etc.) exactly as the spec requires."""
    parts = ['<?xml version="1.0" encoding="UTF-8"?>',
             f'<urlset xmlns="{NS}">']
    for loc, lastmod, priority in entries:
        parts.append("<url>")
        parts.append(f"<loc>{escape(loc)}</loc>")
        if lastmod is not None:
            parts.append(f"<lastmod>{lastmod}</lastmod>")
        if priority is not None:
            parts.append(f"<priority>{priority:.1f}</priority>")
        parts.append("</url>")
    parts.append("</urlset>")
    return "\n".join(parts).encode("utf-8")


def build_sitemapindex(locs: list[str]) -> bytes:
    parts = ['<?xml version="1.0" encoding="UTF-8"?>',
             f'<sitemapindex xmlns="{NS}">']
    for loc in locs:
        parts.append(f"<sitemap><loc>{escape(loc)}</loc></sitemap>")
    parts.append("</sitemapindex>")
    return "\n".join(parts).encode("utf-8")


def _local(tag: str) -> str:
    return tag.rsplit("}", 1)[-1]


def parse_sitemap(xml: bytes) -> tuple[str, list[dict]]:
    """Parse either document kind → (kind, entries).

    kind ``"urlset"``: entries are {loc, lastmod, priority} dicts
    (lastmod None / priority None when absent; entities unescaped by the
    XML parser). kind ``"sitemapindex"``: entries are {loc} dicts naming
    child sitemaps. Raises ValueError on malformed XML or an unknown
    root element — a crawler must treat a broken sitemap as absent, not
    guess."""
    try:
        root = ET.fromstring(xml)
    except ET.ParseError as e:
        raise ValueError(f"sitemap: malformed XML: {e}") from e
    kind = _local(root.tag)
    if kind not in ("urlset", "sitemapindex"):
        raise ValueError(f"sitemap: unknown root element {kind!r}")
    entries: list[dict] = []
    child_tag = "url" if kind == "urlset" else "sitemap"
    for el in root:
        if _local(el.tag) != child_tag:
            continue
        rec: dict = {"loc": None, "lastmod": None, "priority": None}
        for f in el:
            name = _local(f.tag)
            if name in rec:
                rec[name] = (f.text or "").strip()
        if not rec["loc"]:
            continue                      # spec: entries without loc are void
        if rec["priority"] is not None:
            rec["priority"] = float(rec["priority"])
        if kind == "sitemapindex":
            rec = {"loc": rec["loc"]}
        entries.append(rec)
    return kind, entries


_GZ_MAGIC = b"\x1f\x8b"
# sitemaps.org caps an uncompressed sitemap at 50 MB; use it as the
# decompression-bomb guard on the gz path
_MAX_SITEMAP_BYTES = 50 * 1024 * 1024


def build_urlset_gz(entries) -> bytes:
    """Gzipped urlset (the ``sitemap.xml.gz`` convention; deterministic:
    mtime=0)."""
    import gzip
    return gzip.compress(build_urlset(entries), compresslevel=6, mtime=0)


def parse_sitemap_auto(data: bytes) -> tuple[str, list[dict]]:
    """parse_sitemap over either plain XML or a gzipped sitemap
    (``.xml.gz`` — sniffed by magic, not filename, like a crawler must).
    Bounded inflate: a member claiming more than the spec's 50 MB
    uncompressed cap is rejected, not inflated."""
    if data[:2] == _GZ_MAGIC:
        import zlib
        d = zlib.decompressobj(wbits=31)
        try:
            xml = d.decompress(data, _MAX_SITEMAP_BYTES + 1)
        except zlib.error as e:
            raise ValueError(f"sitemap: corrupt gzip: {e}") from e
        if len(xml) > _MAX_SITEMAP_BYTES or d.unconsumed_tail:
            raise ValueError("sitemap: exceeds the 50 MB uncompressed cap")
        data = xml
    return parse_sitemap(data)
