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

``SocketTransport`` implements the same interface over REAL sockets
(http.client against httpfixture.FixtureHTTPServer, or any server that
speaks its conventions): actual TCP connections, HTTP/1.1 framing,
client-side redirect following with the same MAXREDIRS cap, client-side
content cutoff (stop reading past CONTENT_SIZE_LIMIT — curl's
write-callback-returns-0 abort), conditional requests. The planner is
transport-agnostic: tests/test_socket_transport.py pins byte-identical
crawl results across the two transports. A real-internet transport is
this class minus the fixture ``X-`` header conventions (the sandbox has
no outbound network).
"""

from __future__ import annotations

import ssl as ssl_mod
from dataclasses import dataclass

from .corpus import CONTENT_SIZE_LIMIT, MAXREDIRS, SiteGraph

# curl error codes used by the reference's failure rows
CURLE_OK = 0
CURLE_COULDNT_RESOLVE_HOST = 6
CURLE_WRITE_ERROR = 23
CURLE_SSL_CONNECT_ERROR = 35     # TLS handshake/protocol failure
CURLE_TOO_MANY_REDIRECTS = 47
CURLE_PEER_FAILED_VERIFICATION = 60  # cert chain/hostname verify failed
CURLE_BAD_CONTENT_ENCODING = 61  # unrecognized/corrupt Content-Encoding


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

    def fetch_robots(self, host: str, scheme: str = "http") -> FetchResult:
        body = self.site.robots.get(host)
        url = f"{scheme}://{host}/robots.txt"
        if body is None:
            if host not in self.site.hosts and not self._host_known(url):
                return FetchResult(CURLE_COULDNT_RESOLVE_HOST, 0, url, "", b"",
                                   "Couldn't resolve host name")
            return FetchResult(CURLE_OK, 404, url,
                               "HTTP/1.1 404 Not Found\r\n", b"")
        return FetchResult(CURLE_OK, 200, url,
                           "HTTP/1.1 200 OK\r\nContent-Type: text/plain\r\n",
                           body.encode())


class TransportDnsError(Exception):
    """Host resolution failed at the transport boundary (NXDOMAIN or a
    resolver failure) — maps to CURLE_COULDNT_RESOLVE_HOST."""


class TransportTlsError(Exception):
    """TLS failure at the transport boundary; ``verify`` marks cert/
    hostname verification failures (curl 60) vs handshake/protocol
    errors (curl 35)."""

    def __init__(self, msg: str, verify: bool = False):
        super().__init__(msg)
        self.verify = verify


class SocketTransport:
    """Fetch over real TCP from a FixtureHTTPServer (see module docstring).

    One persistent HTTP/1.1 connection per transport instance (the
    per-handle connection model of the reference's curl easy handles);
    reconnects transparently if the server closes it."""

    _SKIP_HDRS = frozenset(["x-outlinks", "x-fixture-synthetic-404",
                            "x-fixture-resolve-fail", "x-curl-fail"])

    def __init__(self, addr: tuple[str, int], ssl_context=None,
                 dns_resolver=None):
        """``ssl_context`` (tlscert.make_client_context) enables the
        https scheme: URLs with scheme https connect through a REAL,
        fully-verified TLS session — the CURLOPT_CAINFO analog
        (verification is never disabled). http URLs keep using plain TCP
        on the same transport instance.

        ``dns_resolver`` (dnsfixture.DnsResolver) routes every NEW
        connection through a real RFC 1035 A-record lookup first: the
        URL's host resolves over actual UDP (cached per host, positive
        and negative), NXDOMAIN surfaces as curl error 6 from a genuine
        wire exchange, and the connection targets the RESOLVED address
        at ``addr``'s port. Without it, connections go straight to
        ``addr`` (the forward-proxy shape) and unknown hosts are flagged
        by the HTTP fixture's X- header convention instead."""
        self.addr = tuple(addr)
        self.ssl_context = ssl_context
        self.dns_resolver = dns_resolver
        # http: (scheme, ip); https: (scheme, ip, sni) — TLS sessions
        # are per virtual host because the certificate is verified
        # against the URL host, not the connect address
        self._conns: dict[tuple, object] = {}

    # -- internals --
    def _resolve(self, host: str) -> str:
        """Connection target for a URL host: DNS when configured (IP
        literals bypass, like every resolver), else the fixed addr."""
        if self.dns_resolver is None or host.startswith("["):
            return self.addr[0]
        hostname = host.rsplit(":", 1)[0] if host.count(":") == 1 else host
        try:
            import ipaddress
            ipaddress.ip_address(hostname)
            # IP literal: no resolution (like every resolver). The
            # connect target stays the fixture address — the fixture
            # serves every site host on one IPv4 listener (a real
            # deployment would dial the literal itself)
            return self.addr[0]
        except ValueError:
            pass
        from .dnsfixture import DnsError, DnsNxdomain
        try:
            return self.dns_resolver.resolve(hostname)
        except DnsNxdomain as e:
            raise TransportDnsError(str(e)) from e
        except DnsError as e:
            raise TransportDnsError(f"dns failure: {e}") from e

    @staticmethod
    def _hostname(host: str) -> str:
        """URL host → bare hostname for SNI/cert matching: strips the
        port and IPv6 brackets ("[::1]:8443" → "::1")."""
        if host.startswith("["):
            return host[1:host.index("]")] if "]" in host else host[1:]
        return host.rsplit(":", 1)[0] if host.count(":") == 1 else host

    def _connection(self, key: tuple, scheme: str, ip: str):
        import http.client
        import socket as _socket
        conn = self._conns.get(key)
        if conn is None:
            if scheme == "https":
                if self.ssl_context is None:
                    raise TransportTlsError(
                        "https URL on a transport with no ssl_context")
                # construct with the URL HOST so server_hostname (SNI +
                # hostname verification) is the virtual host being
                # fetched, like curl — then pin the actual TCP connect
                # target to the resolved fixture address
                conn = http.client.HTTPSConnection(
                    key[2], self.addr[1], timeout=30,
                    context=self.ssl_context)
                conn._create_connection = (
                    lambda address, timeout=None, source_address=None:
                    _socket.create_connection((ip, self.addr[1]), timeout))
            else:
                conn = http.client.HTTPConnection(ip, self.addr[1],
                                                  timeout=30)
            # disable Nagle: a request is one small write and the server's
            # reply is two (headers, body) — with Nagle on, the second
            # write of each pair stalls on the peer's delayed ACK, ~28 ms
            # per request measured on loopback (139 req/s); NODELAY on
            # both ends removes the interaction entirely
            conn.connect()
            conn.sock.setsockopt(_socket.IPPROTO_TCP, _socket.TCP_NODELAY, 1)
            self._conns[key] = conn
        return conn

    def _do(self, method: str, url: str, extra: dict[str, str]):
        """One request over the wire; returns (status, header_pairs,
        headermap, body). Retries once on a dropped keep-alive."""
        import http.client
        host_path = url.split("/", 3)
        scheme = url.split(":", 1)[0].lower() if "://" in url else "http"
        host = host_path[2]
        path = "/" + (host_path[3] if len(host_path) > 3 else "")
        ip = self._resolve(host)
        key = ((scheme, ip, self._hostname(host)) if scheme == "https"
               else (scheme, ip))
        for attempt in (0, 1):
            conn = None
            try:
                conn = self._connection(key, scheme, ip)
                conn.putrequest(method, path, skip_host=True,
                                skip_accept_encoding=True)
                conn.putheader("Host", host)
                # advertise decompression support (curl's --compressed /
                # CURLOPT_ACCEPT_ENCODING); the server may then answer
                # with Content-Encoding: gzip
                conn.putheader("Accept-Encoding", "gzip")
                for k, v in extra.items():
                    conn.putheader(k, v)
                conn.endheaders()
                r = conn.getresponse()
                pairs = r.getheaders()
                body = b""
                if method != "HEAD" and r.status != 304:
                    # client-side content cap: stop READING past the
                    # limit (curl's write-callback abort) — the extra
                    # byte detects truncation. http.client de-frames
                    # Transfer-Encoding: chunked transparently, so the
                    # cap applies to de-chunked bytes, like curl.
                    body = r.read(CONTENT_SIZE_LIMIT + 1)
                    if len(body) > CONTENT_SIZE_LIMIT:
                        conn.close()
                        self._conns.pop(key, None)
                r.read()  # drain (no-op when fully read/closed)
                return r.status, pairs, {k.lower(): v for k, v in pairs}, body
            except ssl_mod.SSLCertVerificationError as e:
                self._conns.pop(key, None)
                if conn is not None:
                    conn.close()
                raise TransportTlsError(str(e), verify=True) from e
            except ssl_mod.SSLError as e:
                # handshake/protocol failures are not keep-alive drops —
                # never retried, surfaced as the curl TLS error family
                self._conns.pop(key, None)
                if conn is not None:
                    conn.close()
                raise TransportTlsError(str(e)) from e
            except (http.client.HTTPException, ConnectionError, OSError):
                self._conns.pop(key, None)
                if conn is not None:
                    conn.close()
                if attempt:
                    raise

    def _rebuild_headers(self, status: int, pairs,
                         decoded_len: int | None = None) -> str:
        """Reconstruct the SiteGraph.headers_for block byte-for-byte from
        the wire headers (parity surface for the saved-row `headers`
        column).

        When the wire response was transfer- or content-encoded
        (``decoded_len`` is not None), the block is normalized to the
        LOGICAL representation: Transfer-Encoding / Content-Encoding
        lines drop and Content-Length reflects the decoded body — the
        same view curl's --compressed hands the application, and the
        form headers_for emits."""
        wire_artifacts = {"transfer-encoding", "content-encoding"}
        lines = [f"HTTP/1.1 {status} X"]
        cl_emitted = False
        for k, v in pairs:
            kl = k.lower()
            if kl in self._SKIP_HDRS:
                continue
            if decoded_len is not None:
                if kl in wire_artifacts:
                    continue
                if kl == "content-length":
                    if not cl_emitted:
                        lines.append(f"Content-Length: {decoded_len}")
                        cl_emitted = True
                    continue
                if not cl_emitted and kl in ("etag", "last-modified",
                                             "location"):
                    # chunked responses carry no wire Content-Length;
                    # restore it at its logical position (headers_for
                    # order: ... Content-Type, Content-Length, ETag, ...)
                    lines.append(f"Content-Length: {decoded_len}")
                    cl_emitted = True
            lines.append(f"{k}: {v}")
        if decoded_len is not None and not cl_emitted:
            lines.append(f"Content-Length: {decoded_len}")
        return "\r\n".join(lines) + "\r\n"

    def request(self, url: str, method: str = "GET",
                if_none_match: str = "", if_modified_since: str = "",
                range_from: int | None = None) -> FetchResult:
        """``range_from``: resume a transfer from this byte offset
        (curl's CURLOPT_RESUME_FROM): sends ``Range: bytes=N-`` and
        returns the 206 slice; a server answering 200 (no range
        support) or 416 (past the end) is reported faithfully."""
        import json
        cur = url.split("#", 1)[0]
        redirects = 0
        extra = {}
        if if_none_match:
            extra["If-None-Match"] = if_none_match
        if if_modified_since:
            extra["If-Modified-Since"] = if_modified_since
        if range_from is not None:
            extra["Range"] = f"bytes={int(range_from)}-"
        while True:
            try:
                status, pairs, hmap, body = self._do(method, cur, extra)
            except TransportDnsError:
                return FetchResult(CURLE_COULDNT_RESOLVE_HOST, 0, cur,
                                   "", b"", "Couldn't resolve host name")
            except TransportTlsError as e:
                if e.verify:
                    return FetchResult(
                        CURLE_PEER_FAILED_VERIFICATION, 0, cur, "", b"",
                        f"SSL certificate problem: {e}")
                return FetchResult(CURLE_SSL_CONNECT_ERROR, 0, cur, "", b"",
                                   f"SSL connect error: {e}")
            if "x-fixture-resolve-fail" in hmap:
                return FetchResult(CURLE_COULDNT_RESOLVE_HOST, 0, cur, "", b"",
                                   "Couldn't resolve host name")
            if "x-curl-fail" in hmap:
                code = int(hmap["x-curl-fail"])
                return FetchResult(code, 0, cur, "", b"",
                                   f"simulated curl failure {code}")
            if "x-fixture-synthetic-404" in hmap:
                return FetchResult(CURLE_OK, 404, cur,
                                   "HTTP/1.1 404 Not Found\r\n", b"")
            if status in (301, 302, 303, 307, 308) and "location" in hmap:
                redirects += 1
                if redirects > MAXREDIRS:
                    return FetchResult(CURLE_TOO_MANY_REDIRECTS, status, cur,
                                       self._rebuild_headers(status, pairs),
                                       b"", "Maximum redirects followed")
                # Location may be relative (RFC 7231 §7.1.2): resolve
                # against the current url like curl does
                from urllib.parse import urljoin
                cur = urljoin(cur, hmap["location"]).split("#", 1)[0]
                continue
            # decode wire encodings (gzip content-coding; chunked framing
            # is already de-framed by http.client) and normalize the
            # saved header block to the logical representation
            decoded_len = None
            if method != "HEAD" and status != 304:
                cenc = hmap.get("content-encoding", "").lower()
                if cenc:
                    if cenc != "gzip":
                        return FetchResult(
                            CURLE_BAD_CONTENT_ENCODING, status, cur, "", b"",
                            f"Unrecognized content encoding: {cenc}")
                    try:
                        import gzip as _gzip
                        body = _gzip.decompress(body)
                    except Exception:
                        return FetchResult(
                            CURLE_BAD_CONTENT_ENCODING, status, cur, "", b"",
                            "Error while processing content unencoding")
                if cenc or "chunked" in hmap.get("transfer-encoding",
                                                 "").lower():
                    decoded_len = len(body)
            # fixture semantics: a 304's header block is headers_for of
            # the underlying resource, whose own status line is 200
            headers = self._rebuild_headers(200 if status == 304 else status,
                                            pairs, decoded_len)
            if method == "HEAD" or status == 304:
                return FetchResult(CURLE_OK, status, cur, headers, b"")
            if len(body) > CONTENT_SIZE_LIMIT:
                return FetchResult(CURLE_WRITE_ERROR, status, cur, headers,
                                   body[:CONTENT_SIZE_LIMIT],
                                   "Failed writing body (content size cutoff)")
            outlinks = tuple(json.loads(hmap["x-outlinks"])) \
                if "x-outlinks" in hmap else ()
            return FetchResult(CURLE_OK, status, cur, headers, body,
                               outlinks=outlinks)

    def fetch_robots(self, host: str, scheme: str = "http") -> FetchResult:
        # X-Robots-Fetch marks this as the crawler's robots probe so the
        # fixture server answers from site.robots (matching
        # FixtureTransport.fetch_robots, which never consults
        # site.responses) even when an explicit /robots.txt Response
        # exists for a plain request() of the same URL
        url = f"{scheme}://{host}/robots.txt"
        try:
            status, pairs, hmap, body = self._do("GET", url,
                                                 {"X-Robots-Fetch": "1"})
        except TransportDnsError:
            return FetchResult(CURLE_COULDNT_RESOLVE_HOST, 0, url, "", b"",
                               "Couldn't resolve host name")
        except TransportTlsError as e:
            code = (CURLE_PEER_FAILED_VERIFICATION if e.verify
                    else CURLE_SSL_CONNECT_ERROR)
            return FetchResult(code, 0, url, "", b"", f"SSL error: {e}")
        if "x-fixture-resolve-fail" in hmap:
            return FetchResult(CURLE_COULDNT_RESOLVE_HOST, 0, url, "", b"",
                               "Couldn't resolve host name")
        if "x-curl-fail" in hmap:
            code = int(hmap["x-curl-fail"])
            return FetchResult(code, 0, url, "", b"",
                               f"simulated curl failure {code}")
        if "x-fixture-synthetic-404" in hmap or status == 404:
            return FetchResult(CURLE_OK, 404, url,
                               "HTTP/1.1 404 Not Found\r\n", b"")
        if status != 200:
            # non-200 robots (5xx etc.): report the status faithfully —
            # the planner maps it to NOT_AVAILABLE (tried_but_failed)
            return FetchResult(CURLE_OK, status, url,
                               self._rebuild_headers(status, pairs), body)
        return FetchResult(CURLE_OK, 200, url,
                           "HTTP/1.1 200 OK\r\nContent-Type: text/plain\r\n",
                           body)
