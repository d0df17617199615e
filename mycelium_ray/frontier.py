"""Host-grouped URL frontier, reference-parity semantics.

From-scratch reimplementation of the behavior of the reference's
``Url_classifier`` (/root/reference/src/crawler/Url_classifier.{hh,cc}):

- N numbered queues, each bound to one host while non-empty; FIFO within a
  queue (Url_classifier.cc:70-94 push, :117-131 pop).
- ``push``: host already owns a queue → append; else claim the first empty
  queue in *insertion-sequence* order; else park in the backlog ``top_q``.
- ``top_q`` is a priority queue ordered by hostname where the MAX hostname
  is served first (Compare_hostname at Url_classifier.cc:112-115 is
  ``left.host() < right.host()`` under std::priority_queue). When queue n
  runs empty, ``peek(n)`` adopts the backlog's top host and drains ALL its
  contiguous same-host entries into queue n (Url_classifier.cc:134-171).
- Within-host order is FIFO (documented intent; we keep a stable heap keyed
  by (host, -seq) so equal-host backlog entries drain in insertion order —
  the C++ binary heap leaves equal-key order unspecified, FIFO is the
  documented semantics O2 that our parity oracle pins down).

The distributed crawl pipeline shards this structure by ``hash(host) %
n_shards`` (each shard owns a disjoint host set, so per-host FIFO and
backlog ordering are preserved within the shard), with queue numbering
global across shards. Scale note: at a 10^10-URL frontier this in-memory
structure holds only the *heads*; the long tail stays in the frontier table
on storage and is re-fed per round (see pipelines/crawl.py).
"""

from __future__ import annotations

import heapq
from collections import deque
from dataclasses import dataclass, field


class FrontierEmpty(Exception):
    pass


@dataclass
class _Queue:
    n: int
    host: str = ""
    q: deque = field(default_factory=deque)


class UrlClassifier:
    """Reference-parity frontier over opaque items.

    Items are (host, payload) where payload is anything (usually the
    canonical URL string). The reference stores full Url objects; host is
    the only routing key it ever inspects.
    """

    def __init__(self, n_queues: int):
        # queues keep their creation order == insertion-sequence order used
        # by push's claim-an-empty-queue scan (table.get<seq>())
        self._queues: list[_Queue] = [_Queue(i) for i in range(n_queues)]
        self._by_n: dict[int, _Queue] = {q.n: q for q in self._queues}
        self._by_host: dict[str, _Queue] = {}
        self._top: list[tuple] = []  # heap of (neg-host-key, seq, host, payload)
        self._seq = 0

    # ---- helpers ----
    @staticmethod
    def _negkey(host: str) -> tuple:
        # max-host-first under heapq's min-heap: invert byte order. The
        # trailing 256 sentinel (greater than any inverted byte) makes a
        # prefix host compare GREATER than a host that extends it, matching
        # C++ std::string operator< under std::priority_queue: 'a.com.mx'
        # > 'a.com' lexicographically, so 'a.com.mx' is served first
        # (Compare_hostname, Url_classifier.cc:112-115). Without the
        # sentinel the inverted-prefix tuple is a min-heap prefix and the
        # SHORTER host would pop first — the wrong order.
        return tuple(255 - b for b in host.encode("utf-8", "surrogatepass")) + (256,)

    def _claim(self, q: _Queue, host: str) -> None:
        if q.host in self._by_host and self._by_host.get(q.host) is q:
            del self._by_host[q.host]
        q.host = host
        self._by_host[host] = q

    # ---- reference API ----
    def push(self, host: str, payload) -> None:
        """Url_classifier::push (Url_classifier.cc:70-94)."""
        q = self._by_host.get(host)
        if q is not None:
            q.q.append(payload)
            return
        for cand in self._queues:  # seq order
            if not cand.q:
                self._claim(cand, host)
                cand.q.append(payload)
                return
        heapq.heappush(self._top, (self._negkey(host), self._seq, host, payload))
        self._seq += 1

    def _drain_top_into(self, q: _Queue) -> None:
        """Adopt backlog's max host; drain all its entries (FIFO) into q."""
        host = self._top[0][2]
        self._claim(q, host)
        while self._top and self._top[0][2] == host:
            q.q.append(heapq.heappop(self._top)[3])

    def peek(self, n: int):
        """Url_classifier::peek (Url_classifier.cc:134-171).

        Returns (host, payload) of the front of queue n, adopting a backlog
        host when the queue is empty. Raises FrontierEmpty when nothing is
        available for this queue.
        """
        q = self._by_n.get(n)
        if q is None:
            raise KeyError(f"no queue {n}")
        if not q.q:
            if not self._top:
                raise FrontierEmpty()
            self._drain_top_into(q)
        return q.host, q.q[0]

    def pop(self, n: int) -> None:
        """Url_classifier::pop (Url_classifier.cc:117-131)."""
        q = self._by_n.get(n)
        if q is None:
            raise KeyError(f"no queue {n}")
        if not q.q:
            raise FrontierEmpty("empty classifying queue")
        q.q.popleft()

    # ---- introspection (Url_classifier.cc:13-67) ----
    def empty(self, n: int | None = None) -> bool:
        if n is not None:
            return not self._by_n[n].q
        return not self._top and all(not q.q for q in self._queues)

    def empty_top(self) -> bool:
        return not self._top

    def q_len(self, n: int) -> int:
        return len(self._by_n[n].q)

    def q_len_top(self) -> int:
        return len(self._top)

    def size(self) -> int:
        return len(self._top) + sum(len(q.q) for q in self._queues)

    @property
    def n_queues(self) -> int:
        return len(self._queues)

    # ---- checkpoint (for Lance/parquet frontier persistence) ----
    def to_records(self) -> list[dict]:
        """Flatten to rows (kind, queue_n, host, ord, payload) — stable,
        byte-identical across runs for the same logical state."""
        rows = []
        for q in self._queues:
            for i, p in enumerate(q.q):
                rows.append({"kind": "queue", "queue_n": q.n, "host": q.host,
                             "ord": i, "payload": p})
            if q.host and not q.q:
                rows.append({"kind": "binding", "queue_n": q.n, "host": q.host,
                             "ord": -1, "payload": ""})
        for negkey, seq, host, payload in sorted(self._top):
            rows.append({"kind": "top", "queue_n": -1, "host": host,
                         "ord": seq, "payload": payload})
        return rows

    @classmethod
    def from_records(cls, n_queues: int, rows: list[dict]) -> "UrlClassifier":
        c = cls(n_queues)
        byq: dict[int, list] = {}
        for r in rows:
            if r["kind"] == "queue":
                byq.setdefault(r["queue_n"], []).append(r)
            elif r["kind"] == "binding":
                c._claim(c._by_n[r["queue_n"]], r["host"])
        for n, rs in byq.items():
            rs.sort(key=lambda r: r["ord"])
            q = c._by_n[n]
            c._claim(q, rs[0]["host"])
            q.q.extend(r["payload"] for r in rs)
        tops = [r for r in rows if r["kind"] == "top"]
        tops.sort(key=lambda r: r["ord"])
        for r in tops:
            heapq.heappush(c._top, (cls._negkey(r["host"]), c._seq, r["host"], r["payload"]))
            c._seq += 1
        return c
