"""Sitemap protocol builder/parser tests: entity escaping round-trip,
namespace tolerance, sitemapindex kind, malformed input, and the
ingest pipeline's parse-is-load-bearing contract."""

import pytest

from mycelium_ray.sitemap import (build_sitemapindex, build_urlset,
                                  parse_sitemap)


def test_urlset_roundtrip_with_entities():
    entries = [
        ("http://h.example.com/a?x=1&y=2", "1995-03-04", 0.5),
        ("http://h.example.com/plain", None, None),
        ("HTTP://H.Example.COM/docs/../d/7/%61sset.png", "1995-01-08", 0.8),
    ]
    xml = build_urlset(entries)
    assert b"&amp;y=2" in xml            # & must be escaped in the XML
    kind, recs = parse_sitemap(xml)
    assert kind == "urlset"
    assert [r["loc"] for r in recs] == [e[0] for e in entries]  # unescaped back
    assert recs[0]["lastmod"] == "1995-03-04"
    assert recs[0]["priority"] == 0.5
    assert recs[1]["lastmod"] is None and recs[1]["priority"] is None


def test_sitemapindex_roundtrip():
    locs = [f"http://h.example.com/sitemap-{i}.xml" for i in range(3)]
    kind, recs = parse_sitemap(build_sitemapindex(locs))
    assert kind == "sitemapindex"
    assert [r["loc"] for r in recs] == locs


def test_parse_namespace_tolerant():
    # no namespace at all — real-world sitemaps are frequently sloppy
    xml = (b"<urlset><url><loc>http://x/a</loc></url>"
           b"<url><loc> http://x/b </loc><priority>1.0</priority></url>"
           b"</urlset>")
    kind, recs = parse_sitemap(xml)
    assert kind == "urlset"
    assert [r["loc"] for r in recs] == ["http://x/a", "http://x/b"]
    assert recs[1]["priority"] == 1.0


def test_parse_rejects_garbage():
    with pytest.raises(ValueError, match="malformed"):
        parse_sitemap(b"<urlset><url></urlset>")
    with pytest.raises(ValueError, match="unknown root"):
        parse_sitemap(b"<rss></rss>")


def test_entry_without_loc_is_skipped():
    xml = (b"<urlset><url><lastmod>1995-01-01</lastmod></url>"
           b"<url><loc>http://x/ok</loc></url></urlset>")
    _, recs = parse_sitemap(xml)
    assert [r["loc"] for r in recs] == ["http://x/ok"]


def test_sitemap_ingest_pipeline(ray_session):
    """doc identity is recovered from the PARSED canonical loc — a
    one-host spot check recomputed serially."""
    import duckdb

    from mycelium_ray.pipelines.urlops import sitemap_ingest

    out = sitemap_ingest("/root/testdata/sf0.001").to_pandas()
    con = duckdb.connect()
    docs = con.execute(
        "SELECT doc_id FROM '/root/testdata/sf0.001/documents.parquet' "
        "WHERE source = 'src3' ORDER BY doc_id").df()["doc_id"]
    got = out[out["host"] == "src3.example.com"].sort_values("doc_id")
    assert got["doc_id"].tolist() == docs.tolist()
    assert (got["canon_url"] ==
            "http://src3.example.com/d/" + got["doc_id"].astype(str)
            + "/asset.png").all()


def test_gzip_sitemap_parse_auto():
    from mycelium_ray.sitemap import (build_urlset, build_urlset_gz,
                                      parse_sitemap_auto)
    e = [("http://a.test/x", "2020-01-01", 0.5),
         ("http://a.test/y?a=1&b=2", None, None)]
    plain = parse_sitemap_auto(build_urlset(e))
    gz = parse_sitemap_auto(build_urlset_gz(e))
    assert plain == gz and plain[0] == "urlset" and len(plain[1]) == 2


def test_gzip_sitemap_corrupt_and_bomb_rejected():
    import gzip

    import pytest

    from mycelium_ray.sitemap import build_urlset_gz, parse_sitemap_auto
    blob = build_urlset_gz([("http://a.test/x", None, None)])
    with pytest.raises(ValueError, match="corrupt gzip"):
        parse_sitemap_auto(blob[:10] + b"\x00\x00" + blob[12:])
    # a 60 MB-of-zeros member must be rejected by the 50 MB cap,
    # without inflating past it
    bomb = gzip.compress(b"\x00" * (60 * 1024 * 1024), 9, mtime=0)
    with pytest.raises(ValueError, match="50 MB"):
        parse_sitemap_auto(bomb)
