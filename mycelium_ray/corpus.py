"""Deterministic synthetic crawl corpus (FIXTURES.md §1/§2/§6).

Generates, from a single seed:

- the ``images`` table (image_id, bytes, w, h, fmt, caption, phash) — the
  canonical input shape from BASELINE.json ``input_hint``;
- a site graph: per-host robots.txt bodies + per-URL responses (statuses,
  redirect chains ≤/&gt; MAXREDIRS, an oversize body for the 1 MiB cap path,
  garbage bodies, 404s, slow hosts) exercising the fetch state machine of
  /root/reference/src/crawler/crawler.cc:860-1064;
- a seed-URL list exercising the ingest filter (crawler.cc:1281-1332):
  absolute-http accepted; https/ftp/relative/garbage rejected; duplicates
  pre- and post-canonicalization; mixed case; %-escapes; query/fragment;
  IPv6 literal; one deliberately hot host (~40% of seeds) for skew tests.

Everything is a pure function of (seed, n_hosts, pages_per_host); no
wall-clock anywhere, so two runs produce byte-identical corpora.
"""

from __future__ import annotations

import random
from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa

from .imaging import encode_image, phash64

USER_AGENT = "mycelium web crawler - https://github.com/larroy/mycelium"
CONTENT_SIZE_LIMIT = 1048576  # crawler.cc:54-55
MAXREDIRS = 5                 # crawler.cc:52

_FMTS = ["png", "jpeg", "webp"]

_CAPTION_BITS = [
    "A photo of {n} {thing}",
    "Un retrato de {thing} — nº {n}",
    "{thing} &amp; friends #{n}",            # entities
    "日本語のキャプション {n}",
    "caption\twith\tcontrol\x07chars {n}",   # control chars (M21 cleaning)
    "  leading/trailing spaces {n}  ",
]
_THINGS = ["cats", "bridges", "mushrooms", "teapots", "nebulae", "bicycles"]


@dataclass
class Response:
    """One URL's canned behavior in the fixture web."""
    status: int = 200
    content: bytes = b""
    content_type: str = ""
    location: str | None = None     # for 3xx
    etag: str = ""
    last_modified: str = ""
    image_id: str = ""              # for image pages
    caption: str = ""
    fmt: str = ""
    curl_fail: int = 0              # nonzero = simulated transport error code
    outlinks: tuple = ()            # embedded links (M12 analog): relative
                                    # refs, absolute urls, cross-host, junk


@dataclass
class SiteGraph:
    responses: dict[str, Response] = field(default_factory=dict)
    robots: dict[str, str | None] = field(default_factory=dict)  # host → body (None = 404)
    hosts: list[str] = field(default_factory=list)

    def headers_for(self, r: Response) -> str:
        lines = ["HTTP/1.1 %d X" % r.status, "Server: fixture/1.0"]
        if r.content_type:
            lines.append(f"Content-Type: {r.content_type}")
        lines.append(f"Content-Length: {len(r.content)}")
        if r.etag:
            lines.append(f"ETag: {r.etag}")
        if r.last_modified:
            lines.append(f"Last-Modified: {r.last_modified}")
        if r.location:
            lines.append(f"Location: {r.location}")
        return "\r\n".join(lines) + "\r\n"


def _make_image(rng: np.random.Generator, idx: int):
    w = int(rng.integers(16, 49))
    h = int(rng.integers(16, 49))
    kind = idx % 3
    if kind == 0:
        px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    elif kind == 1:  # gradient tile
        gx = np.linspace(0, 255, w, dtype=np.uint8)
        gy = np.linspace(0, 255, h, dtype=np.uint8)
        px = np.stack([np.tile(gx, (h, 1)),
                       np.tile(gy[:, None], (1, w)),
                       np.full((h, w), idx % 256, dtype=np.uint8)], axis=2)
    else:  # flat tile
        px = np.full((h, w, 3), int(rng.integers(0, 256)), dtype=np.uint8)
    return px.astype(np.uint8), w, h


def generate_corpus(n_hosts: int = 12, pages_per_host: int = 10, seed: int = 42,
                    hot_host_factor: int = 5, dup_pairs: int = 3):
    """Returns (images: pa.Table, site: SiteGraph, seeds: list[str]).

    Host names are chosen so lexicographic max-host-first backlog ordering
    (Url_classifier.cc:112-115) is exercised; ``zz-hot.test`` is the skewed
    host with ``hot_host_factor ×`` pages.
    """
    rng = np.random.default_rng(seed)
    pyrng = random.Random(seed)
    site = SiteGraph()

    hosts = [f"host{i:03d}.test" for i in range(n_hosts - 1)] + ["zz-hot.test"]
    site.hosts = hosts

    # --- robots bodies: a mix of policies (FIXTURES.md §4) ---
    for i, h in enumerate(hosts):
        kind = i % 6
        if kind == 0:
            site.robots[h] = None  # 404 → NOT_AVAILABLE → allowed
        elif kind == 1:
            site.robots[h] = "User-agent: *\nDisallow: /private\n"
        elif kind == 2:
            site.robots[h] = (
                "# robots for " + h + "\n"
                f"User-agent: {USER_AGENT}\nDisallow: /blocked # inline\n\n"
                "User-agent: *\nDisallow: /\n")
        elif kind == 3:
            site.robots[h] = "<html><body>oops a html page</body></html>"  # EPARSE
        elif kind == 4:
            site.robots[h] = ("User-agent: *\nCrawl-delay: 1\n"
                              "Allow: /img/\nDisallow: /\n")
        else:
            site.robots[h] = "User-agent: *\nDisallow: /%7eprivate/\n"

    # --- image pages ---
    img_rows = {k: [] for k in
                ("image_id", "bytes", "w", "h", "fmt", "caption", "phash")}
    idx = 0
    pixel_cache = []
    for hi, host in enumerate(hosts):
        npages = pages_per_host * (hot_host_factor if host == "zz-hot.test" else 1)
        for k in range(npages):
            fmt = _FMTS[idx % 3]
            if dup_pairs and idx % 17 == 16 and pixel_cache:
                px, w, h = pixel_cache[idx % len(pixel_cache)]  # near-dup pixels
            else:
                px, w, h = _make_image(rng, idx)
                pixel_cache.append((px, w, h))
            # 1/8 of jpeg pages carry PROGRESSIVE (SOF2) streams — the
            # crawl decode stage must handle multi-scan jpegs too; fmt
            # stays "jpeg" (what sniffing and decode_image report)
            enc_fmt = ("jpeg_progressive"
                       if fmt == "jpeg" and idx % 24 == 1 else fmt)
            data = encode_image(px, enc_fmt)
            url = f"http://{host}/img/{k}.{fmt}"
            caption = pyrng.choice(_CAPTION_BITS).format(
                n=idx, thing=pyrng.choice(_THINGS))
            img_rows["image_id"].append(url)
            img_rows["bytes"].append(data)
            img_rows["w"].append(w)
            img_rows["h"].append(h)
            img_rows["fmt"].append(fmt)
            img_rows["caption"].append(caption)
            img_rows["phash"].append(phash64(px))
            # outlinks (M12 semantics exercised at resolve time): relative
            # sibling, absolute same-host, cross-host, and an occasional
            # junk ref that must be dropped by the link filter
            nxt = (k + 1) % npages
            nxt_fmt = _FMTS[(idx + 1) % 3]
            links = [f"/img/{nxt}.{nxt_fmt}",
                     f"../img/{(k + 2) % npages}.{_FMTS[(idx + 2) % 3]}"]
            # cross-host links form an expander (multiplicative stride), so
            # sparse-seed discovery reaches every host in O(log n) rounds
            # rather than O(n) around a ring
            other_host = hosts[(hi * 7 + k + 1) % len(hosts)]
            if k % 3 == 0:
                links.append(f"http://{other_host}/img/0.{_FMTS[0]}")
            if k % 7 == 0:
                links.append("ftp://not-http.test/x")  # filtered out
            site.responses[url] = Response(
                status=200, content=data, content_type=f"image/{fmt}",
                image_id=url, caption=caption, fmt=fmt,
                etag=f'"{idx:08x}"', last_modified="Mon, 01 Jan 2024 00:00:00 GMT",
                outlinks=tuple(links))
            idx += 1

        # per-host special pages exercising the state machine
        site.responses[f"http://{host}/missing.png"] = Response(
            status=404, content=b"not found", content_type="text/plain")
        site.responses[f"http://{host}/private/a.png"] = Response(
            status=200, content=b"should be blocked by robots on some hosts",
            content_type="image/png")
        site.responses[f"http://{host}/blocked/b.png"] = Response(
            status=200, content=b"blocked for our UA on kind-2 hosts",
            content_type="image/png")
        # redirect chain of 2 → lands on img/0
        target_fmt = _FMTS[0]
        site.responses[f"http://{host}/r1"] = Response(
            status=301, location=f"http://{host}/r2")
        site.responses[f"http://{host}/r2"] = Response(
            status=301, location=f"http://{host}/img/0.{target_fmt}")
        # redirect loop (> MAXREDIRS)
        site.responses[f"http://{host}/loop"] = Response(
            status=301, location=f"http://{host}/loop")
        # garbage body served as image
        site.responses[f"http://{host}/garbage.png"] = Response(
            status=200, content=b"\x00\x01garbagegarbage", content_type="image/png")
        # unrecognized content type (406 stub path, crawler.cc:953-961)
        site.responses[f"http://{host}/weird.bin"] = Response(
            status=200, content=b"BINBIN", content_type="application/x-weird")

    # one oversize body on the hot host (1 MiB cap, crawler.cc:54-55)
    site.responses["http://zz-hot.test/huge.png"] = Response(
        status=200, content=b"\x89PNG\r\n\x1a\n" + b"A" * (CONTENT_SIZE_LIMIT + 1024),
        content_type="image/png")

    images = pa.table({
        "image_id": pa.array(img_rows["image_id"], pa.string()),
        "bytes": pa.array(img_rows["bytes"], pa.binary()),
        "w": pa.array(img_rows["w"], pa.int32()),
        "h": pa.array(img_rows["h"], pa.int32()),
        "fmt": pa.array(img_rows["fmt"], pa.string()),
        "caption": pa.array(img_rows["caption"], pa.string()),
        "phash": pa.array(img_rows["phash"], pa.int64()),
    })

    seeds = _make_seeds(site, pyrng)
    return images, site, seeds


def _make_seeds(site: SiteGraph, pyrng: random.Random) -> list[str]:
    """Seed lines per FIXTURES.md §2 — includes lines the ingest filter must
    reject (process_input_buff semantics, crawler.cc:1281-1332)."""
    seeds: list[str] = []
    for url, r in site.responses.items():
        seeds.append(url)
    # duplicates post-canonicalization (mixed case host/scheme, dot segments,
    # %-escapes of safe chars)
    sample = [u for u in sorted(site.responses) if "/img/" in u][:20]
    for u in sample[:6]:
        host = u.split("/")[2]
        seeds.append(u.replace(host, host.upper()))
    for u in sample[6:10]:
        seeds.append(u.replace("http://", "HTTP://"))
    for u in sample[10:13]:
        seeds.append(u.replace("/img/", "/img/../img/"))
    for u in sample[13:16]:
        seeds.append(u.replace("img", "%69mg"))  # %69 = 'i' (safe → unescaped)
    # exact duplicates
    seeds.extend(sample[:5])
    # rejected lines: non-http scheme / relative / garbage / unparseable
    seeds.extend([
        "https://secure.test/x.png",        # non-http scheme → rejected
        "ftp://files.test/y.png",           # non-http
        "relative/path.png",                # not absolute
        "not a url at all %% ::",           # parse error
        "http://bad host.test/x",           # invalid host
        "http://[::1]/ipv6.png",            # absolute http, IPv6 literal: accepted
    ])
    site.responses["http://[::1]/ipv6.png"] = Response(
        status=404, content=b"", content_type="text/plain")
    # urls with query/fragment
    q = sample[16] if len(sample) > 16 else sample[0]
    seeds.append(q + "?size=large#frag")
    site.responses[q + "?size=large"] = Response(
        status=200, content=site.responses[q].content,
        content_type=site.responses[q].content_type)
    pyrng.shuffle(seeds)
    return seeds


def images_to_parquet(images: pa.Table, path: str) -> None:
    import pyarrow.parquet as pq
    pq.write_table(images, path)


def to_https(site: "SiteGraph", seeds: list[str]):
    """Rewrite an http corpus to https (URL keys, redirect Locations,
    absolute outlinks, seeds — including the HTTP:// case-quirk seeds).
    The graph itself is scheme-agnostic; this feeds the TLS fetch path
    (tlscert + FixtureHTTPServer(tls_context=...) + SocketTransport
    ssl_context), crawled with schemes=("https",)."""
    import dataclasses as _dc

    def swap(u):
        if not isinstance(u, str):
            return u
        for p, q in (("http://", "https://"), ("HTTP://", "HTTPS://")):
            if u.startswith(p):
                return q + u[len(p):]
        return u

    out = SiteGraph()
    out.hosts = list(site.hosts)
    out.robots = dict(site.robots)
    for url, r in site.responses.items():
        out.responses[swap(url)] = _dc.replace(
            r, location=swap(r.location),
            outlinks=tuple(swap(o) for o in r.outlinks))
    return out, [swap(s) for s in seeds]
