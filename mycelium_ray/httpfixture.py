"""Real-socket HTTP fixture: serves a SiteGraph over actual TCP.

``FixtureHTTPServer`` is a threading HTTP/1.1 server that virtual-hosts
every site host on one listener (the Host header routes, exactly like a
crawl through a forward proxy), and ``transport.SocketTransport`` fetches
from it with real sockets via http.client. Together they exercise the
fetch path end-to-end over the wire — connection handling, HEAD vs GET
framing, redirect following, conditional 304s, content-cap abort — while
remaining byte-parity-comparable with the in-process FixtureTransport
(tests/test_socket_transport.py asserts identical crawl results).

Fixture-only affordances (each marked on the wire with an ``X-`` header):
- ``X-Outlinks``: the page's embedded outlinks as JSON (a real HTML
  transport would parse these from the body; the graft payload is image
  bytes, so the fixture carries them as metadata, mirroring
  ``Response.outlinks``).
- ``X-Fixture-Resolve-Fail`` (status 599): the Host is unknown to the
  site — the transport maps it to CURLE_COULDNT_RESOLVE_HOST, which a
  real transport would get from DNS.
- ``X-Curl-Fail`` (status 598): a scripted transfer failure
  (Response.curl_fail), mapped back to its curl code.
- ``X-Fixture-Synthetic-404``: a 404 synthesized for an unknown path
  (vs an explicit 404 Response in the site).
"""

from __future__ import annotations

import gzip as _gzip
import json
import threading
import zlib
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from .corpus import CONTENT_SIZE_LIMIT, SiteGraph

_CHUNK = 1024  # chunked-transfer frame size (wire artifact only)

import re as _re

_RANGE_RE = _re.compile(r"bytes=(\d+)-(\d*)$")


class _Handler(BaseHTTPRequestHandler):
    protocol_version = "HTTP/1.1"
    server_version = "fixture/1.0"
    # headers and body go out as separate writes; without NODELAY the
    # body write stalls on the client's delayed ACK (see SocketTransport)
    disable_nagle_algorithm = True
    site: SiteGraph = None  # set on the server class

    def log_message(self, *args):  # quiet
        pass

    def setup(self):
        # TLS listener defers the handshake off the accept loop (see
        # FixtureHTTPServer); run it here, in this connection's thread
        import ssl
        if isinstance(self.request, ssl.SSLSocket):
            self.request.do_handshake()
        super().setup()

    # ---- routing ----
    def _host(self) -> str:
        h = self.headers.get("Host") or ""
        if h.startswith("["):  # ipv6 literal: [::1] or [::1]:port
            end = h.find("]")
            return h[:end + 1] if end >= 0 else h
        return h.split(":")[0]

    def _send(self, status: int, headers: list[tuple[str, str]],
              body: bytes, head_only: bool) -> None:
        self.send_response_only(status, "X")
        names = {k.lower() for k, _ in headers}
        for k, v in headers:
            self.send_header(k, v)
        if "content-length" not in names:
            self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        if not head_only and body:
            self.wfile.write(body)

    def _serve(self, head_only: bool) -> None:
        site = self.server.site  # type: ignore[attr-defined]
        host = self._host()
        scheme = getattr(self.server, "scheme", "http")
        url = f"{scheme}://{host}{self.path}"
        url = url.split("#", 1)[0]

        # robots.txt: the crawler's robots probe (X-Robots-Fetch) is
        # ALWAYS answered from site.robots — FixtureTransport.fetch_robots
        # never consults site.responses; a plain request() for the same
        # URL falls through to the responses lookup below (also mirroring
        # the fixture)
        if self.path == "/robots.txt" and (
                self.headers.get("X-Robots-Fetch")
                or url not in site.responses):
            body = site.robots.get(host)
            if body is not None:
                self._send(200, [("Content-Type", "text/plain")],
                           body.encode(), head_only)
                return
            if host in site.hosts or host in site.robots \
                    or self._host_known(host):
                self._send(404, [("X-Fixture-Synthetic-404", "1")],
                           b"", head_only)
                return
            self._send(599, [("X-Fixture-Resolve-Fail", "1")], b"", head_only)
            return

        resp = site.responses.get(url)
        if resp is None:
            if self._host_known(host):
                self._send(404, [("X-Fixture-Synthetic-404", "1")],
                           b"", head_only)
            else:
                self._send(599, [("X-Fixture-Resolve-Fail", "1")],
                           b"", head_only)
            return
        if resp.curl_fail:
            self._send(598, [("X-Curl-Fail", str(resp.curl_fail))],
                       b"", head_only)
            return
        # conditional revalidation
        inm = self.headers.get("If-None-Match") or ""
        ims = self.headers.get("If-Modified-Since") or ""
        not_modified = resp.status == 200 and (
            (inm and inm == resp.etag)
            or (ims and resp.last_modified and ims == resp.last_modified))
        # header block mirrors SiteGraph.headers_for line-for-line (the
        # transport rebuilds the block for byte parity with the fixture)
        hdrs: list[tuple[str, str]] = [("Server", "fixture/1.0")]
        if resp.content_type:
            hdrs.append(("Content-Type", resp.content_type))
        hdrs.append(("Content-Length", str(len(resp.content))))
        if resp.etag:
            hdrs.append(("ETag", resp.etag))
        if resp.last_modified:
            hdrs.append(("Last-Modified", resp.last_modified))
        if resp.location:
            hdrs.append(("Location", resp.location))
        if resp.outlinks:
            hdrs.append(("X-Outlinks", json.dumps(list(resp.outlinks))))
        if not_modified:
            self._send(304, hdrs, b"", True)
            return
        # Range requests (RFC 9110 §14): bytes=N- and bytes=N-M on a 200
        # resource → 206 with Content-Range; malformed/unsatisfiable
        # ranges fall back to the full 200 / 416 per spec
        rng = self.headers.get("Range")
        if rng and resp.status == 200 and not head_only:
            m = _RANGE_RE.match(rng.strip())
            if m:
                lo = int(m.group(1))
                if m.group(2) and int(m.group(2)) < lo:
                    # RFC 9110 §14.1.1: an EXPLICIT last-byte-pos below
                    # first-byte-pos is an invalid range spec — ignore
                    # the header entirely (full 200), don't synthesize
                    # an empty 206. (Open-ended "bytes=N-" past the end
                    # is unsatisfiable, not invalid → 416 below.)
                    m = None
            if m:
                hi = int(m.group(2)) if m.group(2) else len(resp.content) - 1
                if lo >= len(resp.content):
                    self._send(416, [("Content-Range",
                                      f"bytes */{len(resp.content)}")],
                               b"", False)
                    return
                hi = min(hi, len(resp.content) - 1)
                part = resp.content[lo:hi + 1]
                phdrs = [(k, v) for k, v in hdrs
                         if k.lower() != "content-length"]
                phdrs.append(("Content-Range",
                              f"bytes {lo}-{hi}/{len(resp.content)}"))
                phdrs.append(("Content-Length", str(len(part))))
                self._send(206, phdrs, part, False)
                return
        # Wire-encoding exercise (GET 200 with a body only): a
        # deterministic per-URL choice serves ~1/4 of pages chunked and
        # ~1/4 gzip (when the client advertises Accept-Encoding), so the
        # socket-transport parity tests cover HTTP/1.1 chunked framing
        # and content decompression end-to-end — the two wire behaviors
        # a real-internet fetch hits first. The LOGICAL response
        # (status, decoded body, normalized headers) is unchanged.
        # (over-limit pages stay identity-encoded: the client-side cutoff
        # aborts mid-body, and only an identity response lets the saved
        # header block still carry the true Content-Length for parity)
        if resp.status == 200 and resp.content and not head_only \
                and len(resp.content) <= CONTENT_SIZE_LIMIT:
            enc = zlib.crc32(url.encode()) % 4
            if enc == 2:
                self._send_chunked(resp.status, hdrs, resp.content)
                return
            if enc == 3 and "gzip" in (
                    self.headers.get("Accept-Encoding") or ""):
                gz = _gzip.compress(resp.content, compresslevel=6, mtime=0)
                if len(gz) <= CONTENT_SIZE_LIMIT:
                    wire = [(k, v) for k, v in hdrs
                            if k.lower() != "content-length"]
                    wire.append(("Content-Encoding", "gzip"))
                    wire.append(("Content-Length", str(len(gz))))
                    self._send(resp.status, wire, gz, False)
                    return
        self._send(resp.status, hdrs, resp.content, head_only)

    def _send_chunked(self, status: int,
                      headers: list[tuple[str, str]], body: bytes) -> None:
        self.send_response_only(status, "X")
        for k, v in headers:
            if k.lower() == "content-length":
                continue  # chunked framing forbids Content-Length
            self.send_header(k, v)
        self.send_header("Transfer-Encoding", "chunked")
        self.end_headers()
        for off in range(0, len(body), _CHUNK):
            part = body[off:off + _CHUNK]
            self.wfile.write(b"%x\r\n" % len(part) + part + b"\r\n")
        self.wfile.write(b"0\r\n\r\n")

    def _host_known(self, host: str) -> bool:
        site = self.server.site  # type: ignore[attr-defined]
        h = host.lower()
        return (h in (x.lower() for x in site.hosts)
                or h in (x.lower() for x in site.robots)
                or any(u.split("/", 3)[2].lower() == h
                       for u in site.responses))

    def do_GET(self):
        self._serve(head_only=False)

    def do_HEAD(self):
        self._serve(head_only=True)


class _Server(ThreadingHTTPServer):
    def handle_error(self, request, client_address):
        import ssl
        import sys
        et, _, _ = sys.exc_info()
        if et is not None and issubclass(et, (ConnectionResetError,
                                              BrokenPipeError,
                                              ssl.SSLError)):
            # client hung up mid-request (content-cap abort) or failed
            # its TLS handshake (untrusting client) — that connection's
            # problem, not the listener's
            return
        super().handle_error(request, client_address)


class FixtureHTTPServer:
    """Threaded HTTP server over a SiteGraph; use as a context manager.

    ``addr`` is ("127.0.0.1", port) once started; pass it to
    SocketTransport (locally or into fetch actors — any process on the
    box can fetch from it)."""

    def __init__(self, site: SiteGraph, tls_context=None):
        """``tls_context``: an ssl.SSLContext (tlscert.make_server_context)
        turns the listener into a real HTTPS endpoint — every request then
        rides an actual TLS handshake + record layer on loopback."""
        self._srv = _Server(("127.0.0.1", 0), _Handler)
        self._srv.scheme = "http"  # type: ignore[attr-defined]
        if tls_context is not None:
            # handshake deferred off the accept loop: with the default
            # do_handshake_on_connect, a single slow or failing client
            # would serialize (or kill) serve_forever; deferring runs the
            # handshake lazily on first read IN THE HANDLER THREAD, where
            # a failure is that connection's problem only
            self._srv.socket = tls_context.wrap_socket(
                self._srv.socket, server_side=True,
                do_handshake_on_connect=False)
            self._srv.scheme = "https"  # type: ignore[attr-defined]
        self._srv.site = site  # type: ignore[attr-defined]
        self._srv.daemon_threads = True
        self._thread = threading.Thread(target=self._srv.serve_forever,
                                        daemon=True)

    @property
    def addr(self) -> tuple[str, int]:
        return self._srv.server_address[:2]

    def __enter__(self) -> "FixtureHTTPServer":
        self._thread.start()
        return self

    def __exit__(self, *exc) -> None:
        self._srv.shutdown()
        self._srv.server_close()
