"""Fetch transport: the boundary the fetch stage talks HTTP through.

``FixtureTransport`` serves the deterministic SiteGraph (corpus.py) with
curl-compatible semantics for the behaviors the reference state machine
depends on (/root/reference/src/crawler/crawler.cc):

- redirect following with MAXREDIRS=5 → CURLE_TOO_MANY_REDIRECTS (:52,:1095)
- content cutoff past CONTENT_SIZE_LIMIT → CURLE_WRITE_ERROR, the write-
  callback-returns-0 abort (:54-55, :579-583)
- effective-url capture after redirects (:862-869)
- HEAD vs GET (no body on HEAD, :1163-1204)
- conditional revalidation If-None-Match / If-Modified-Since → 304 (:1138-1155)
- unknown host → CURLE_COULDNT_RESOLVE_HOST

A real-network transport would implement the same three methods with
aiohttp/urllib; nothing else in the pipeline changes (and none is shipped
here — the sandbox has no network).
"""

from __future__ import annotations

from dataclasses import dataclass

from .corpus import CONTENT_SIZE_LIMIT, MAXREDIRS, SiteGraph

# curl error codes used by the reference's failure rows
CURLE_OK = 0
CURLE_COULDNT_RESOLVE_HOST = 6
CURLE_WRITE_ERROR = 23
CURLE_TOO_MANY_REDIRECTS = 47


@dataclass
class FetchResult:
    curl_code: int
    http_code: int
    eff_url: str
    headers: str
    content: bytes
    curl_error: str = ""
    outlinks: tuple = ()  # links embedded in the fetched page (M12 analog —
                          # a real HTML transport would parse these from the
                          # body; the fixture page carries them as metadata)


class FixtureTransport:
    """Deterministic transport over a SiteGraph."""

    def __init__(self, site: SiteGraph):
        self.site = site

    # -- internals --
    def _lookup(self, url: str):
        url = url.split("#", 1)[0]  # fragments never go on the wire
        return url, self.site.responses.get(url)

    def _host_known(self, url: str) -> bool:
        try:
            host = url.split("/", 3)[2].lower()
        except IndexError:
            return False
        if host.startswith("[") or host in ("", None):
            return any(u.split("/", 3)[2].lower() == host
                       for u in self.site.responses)
        return (host in self.site.hosts
                or any(u.split("/", 3)[2].lower() == host
                       for u in self.site.responses)
                or host in self.site.robots)

    def request(self, url: str, method: str = "GET",
                if_none_match: str = "", if_modified_since: str = "") -> FetchResult:
        cur = url
        redirects = 0
        while True:
            cur_nofrag, resp = self._lookup(cur)
            if resp is None:
                if not self._host_known(cur):
                    return FetchResult(CURLE_COULDNT_RESOLVE_HOST, 0, cur_nofrag,
                                       "", b"", "Couldn't resolve host name")
                return FetchResult(CURLE_OK, 404, cur_nofrag,
                                   "HTTP/1.1 404 Not Found\r\n", b"")
            if resp.curl_fail:
                return FetchResult(resp.curl_fail, 0, cur_nofrag, "", b"",
                                   f"simulated curl failure {resp.curl_fail}")
            if resp.status in (301, 302, 303, 307, 308) and resp.location:
                redirects += 1
                if redirects > MAXREDIRS:
                    return FetchResult(CURLE_TOO_MANY_REDIRECTS, resp.status,
                                       cur_nofrag, self.site.headers_for(resp),
                                       b"", "Maximum redirects followed")
                cur = resp.location
                continue
            headers = self.site.headers_for(resp)
            if method == "HEAD":
                return FetchResult(CURLE_OK, resp.status, cur_nofrag, headers, b"")
            # conditional revalidation
            if resp.status == 200 and (
                    (if_none_match and if_none_match == resp.etag)
                    or (if_modified_since and resp.last_modified
                        and if_modified_since == resp.last_modified)):
                return FetchResult(CURLE_OK, 304, cur_nofrag, headers, b"")
            content = resp.content
            if len(content) > CONTENT_SIZE_LIMIT:
                return FetchResult(CURLE_WRITE_ERROR, resp.status, cur_nofrag,
                                   headers, content[:CONTENT_SIZE_LIMIT],
                                   "Failed writing body (content size cutoff)")
            return FetchResult(CURLE_OK, resp.status, cur_nofrag, headers,
                               content, outlinks=resp.outlinks)

    def fetch_robots(self, host: str) -> FetchResult:
        body = self.site.robots.get(host)
        url = f"http://{host}/robots.txt"
        if body is None:
            if host not in self.site.hosts and not self._host_known(url):
                return FetchResult(CURLE_COULDNT_RESOLVE_HOST, 0, url, "", b"",
                                   "Couldn't resolve host name")
            return FetchResult(CURLE_OK, 404, url,
                               "HTTP/1.1 404 Not Found\r\n", b"")
        return FetchResult(CURLE_OK, 200, url,
                           "HTTP/1.1 200 OK\r\nContent-Type: text/plain\r\n",
                           body.encode())
