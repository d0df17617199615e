"""S1 — continuous TCP seed-URL source (reference: crawler.cc TCP listener).

The reference crawler listens on a TCP port, accepts any number of client
connections, buffers each connection's bytes, and splits the buffer into
URL lines (crawler.cc:1211-1217 listen, :627-640 accept, :679-704 read,
:1281-1332 process_input_buff). This module rebuilds that ingest boundary
with the same observable semantics, feeding a Ray Data pipeline instead of
the in-process classifier:

- lines are split on ANY of ``\\n`` / ``\\r`` (``find_first_of("\\n\\r")``,
  crawler.cc:1288), so ``\\r\\n`` pairs and separator runs yield no empty
  lines;
- a mid-buffer line is processed only when it is at least 2 characters
  long — the reference's ``hare > tortoise+1`` guard (crawler.cc:1289)
  silently drops 1-char lines, and we reproduce that quirk;
- mid-stream lines must parse as URLs AND be absolute http to be accepted
  (crawler.cc:1297-1302); anything else is counted as rejected;
- on EOF the remaining unterminated tail is flushed, and the reference's
  flush path (crawler.cc:1310-1323) pushes the parsed URL WITHOUT the
  absolute/http check — a reference quirk we mirror (an ftp:// tail line
  is accepted where the same line mid-stream is rejected);
- partial reads are buffered across ``recv`` boundaries exactly like the
  reference appends to ``m_input_buff`` (crawler.cc:700-702) — a URL split
  across TCP segments reassembles.

The listener is an ingest-edge component (one per head/ingest node); the
accepted URLs flow into the normal canonicalize → seen-filter → frontier
Dataset pipeline via ``to_dataset()``. At scale you run one listener per
ingest node and union the shards; the listener itself holds only the
per-connection partial-line buffers, never the corpus.
"""

from __future__ import annotations

import re
import socket
import threading
from dataclasses import dataclass, field

_SEP = re.compile(r"[\n\r]")

from ..urlcanon import Url, UrlParseError


@dataclass
class SeedIngestStats:
    n_accepted: int = 0
    n_rejected: int = 0
    n_connections: int = 0
    rejected_lines: list = field(default_factory=list)


class _ConnState:
    __slots__ = ("buf",)

    def __init__(self) -> None:
        self.buf = ""


def _split_lines(state: _ConnState, data: str) -> list[str]:
    """process_input_buff (crawler.cc:1281-1307): consume complete lines
    out of the buffer, keeping the unterminated tail. Returns the lines
    that survive the >=2-char guard."""
    state.buf += data
    lines: list[str] = []
    tortoise = 0
    buf = state.buf
    for m in _SEP.finditer(buf):
        hare = m.start()
        if hare > tortoise + 1:  # reference guard: 1-char lines dropped
            lines.append(buf[tortoise:hare])
        tortoise = hare + 1
    state.buf = buf[tortoise:]
    return lines


def _flush(state: _ConnState) -> str | None:
    """EOF flush (crawler.cc:1310-1323): the unterminated tail, if any."""
    tail, state.buf = state.buf, ""
    return tail if tail else None


class TcpSeedListener:
    """Accepts seed-URL lines over TCP and accumulates parsed seeds.

    Usage::

        with TcpSeedListener() as src:        # OS-assigned port
            ...clients connect to src.port and write URL lines...
        ds = src.to_dataset()                 # ray.data.Dataset of seeds
    """

    def __init__(self, host: str = "127.0.0.1", port: int = 0,
                 backlog: int = 16):
        self._sock = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        self._sock.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self._sock.bind((host, port))
        self._sock.listen(backlog)
        self._sock.settimeout(0.1)
        self.host, self.port = self._sock.getsockname()
        self._lock = threading.Lock()
        self._urls: list[Url] = []
        self.stats = SeedIngestStats()
        self._stop = threading.Event()
        self._threads: list[threading.Thread] = []
        self._acceptor = threading.Thread(target=self._accept_loop,
                                          daemon=True)
        self._acceptor.start()

    # -- ingest semantics ---------------------------------------------------

    def _push_line(self, line: str, flush: bool) -> None:
        try:
            url = Url(line)
        except UrlParseError:
            with self._lock:
                self.stats.n_rejected += 1
                self.stats.rejected_lines.append(line)
            return
        if flush or (url.absolute and url.scheme == "http"):
            # flush path pushes without the scheme gate — reference quirk
            # (crawler.cc:1310-1323 has no absolute()/http check)
            with self._lock:
                self._urls.append(url)
                self.stats.n_accepted += 1
        else:
            with self._lock:
                self.stats.n_rejected += 1
                self.stats.rejected_lines.append(line)

    def _serve_conn(self, conn: socket.socket) -> None:
        state = _ConnState()
        conn.settimeout(0.1)
        try:
            while not self._stop.is_set():
                try:
                    data = conn.recv(4096)
                except socket.timeout:
                    continue
                except OSError:
                    break
                if not data:  # EOF → flush tail (connection_read_cb cnt==0)
                    tail = _flush(state)
                    if tail is not None:
                        self._push_line(tail, flush=True)
                    break
                for line in _split_lines(state,
                                         data.decode("utf-8", "replace")):
                    self._push_line(line, flush=False)
        finally:
            conn.close()

    def _accept_loop(self) -> None:
        while not self._stop.is_set():
            try:
                conn, _ = self._sock.accept()
            except socket.timeout:
                continue
            except OSError:
                break
            with self._lock:
                self.stats.n_connections += 1
            t = threading.Thread(target=self._serve_conn, args=(conn,),
                                 daemon=True)
            t.start()
            self._threads.append(t)

    # -- lifecycle ----------------------------------------------------------

    def close(self) -> None:
        self._stop.set()
        for t in self._threads:
            t.join(timeout=2)
        self._acceptor.join(timeout=2)
        self._sock.close()

    def __enter__(self) -> "TcpSeedListener":
        return self

    def __exit__(self, *exc) -> None:
        self.close()

    # -- outputs ------------------------------------------------------------

    def urls(self) -> list[Url]:
        with self._lock:
            return list(self._urls)

    def drain(self) -> list[Url]:
        """Pop-and-return seeds accumulated since the last drain — the
        daemon crawl's live-ingest hook (subsequent ``urls()`` no longer
        include drained seeds; ``stats`` keep counting)."""
        with self._lock:
            out = self._urls
            self._urls = []
        return out

    def poll_lines(self) -> list[str] | None:
        """``RayCrawler.run_daemon`` seed_poll protocol: new URL lines
        since the last call; [] when idle, None once the listener is
        closed AND fully drained (the daemon's shutdown signal).

        None requires the connection threads to have exited too: close()
        sets ``_stop`` before joining them, so a thread that passed its
        stop check may still append a just-received seed for ~0.1 s —
        returning None on ``_stop`` alone could drop a seed accepted at
        the listen-window boundary. While threads are winding down this
        returns [], and the post-join drain picks up the stragglers."""
        batch = self.drain()
        if batch:
            return [u.get() for u in batch]
        if not self._stop.is_set():
            return []
        if self._acceptor.is_alive() or any(t.is_alive()
                                            for t in self._threads):
            return []
        # threads are joined: one final race-free drain decides
        batch = self.drain()
        return [u.get() for u in batch] if batch else None

    def to_dataset(self):
        """Seeds as a Ray Data Dataset (url string rows), the head of the
        canonicalize → seen-filter → frontier pipeline."""
        import ray.data as rd
        rows = [{"url": u.get()} for u in self.urls()]
        return rd.from_items(rows) if rows else rd.from_items(
            [{"url": ""}]).filter(lambda r: False)
