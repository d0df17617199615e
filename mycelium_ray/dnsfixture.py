"""Real-wire DNS for the fetch path: RFC 1035 framing over actual UDP.

The reference crawler gets host resolution (and
CURLE_COULDNT_RESOLVE_HOST) from libcurl's resolver; the sandbox has no
outbound network, so — same pattern as httpfixture/tlscert — the protocol
runs for real against a loopback fixture:

- ``FixtureDNSServer``: a threaded UDP server answering A queries from a
  zone built out of a SiteGraph (every crawlable host → 127.0.0.1,
  everything else → NXDOMAIN). Wire format is genuine RFC 1035:
  compression-pointer name encoding in answers, QR/AA/RD/RA flags,
  rcode 3 for unknown names, FORMERR on malformed queries.
- ``DnsResolver``: the client — builds queries, matches IDs, validates
  the echoed question, parses compressed answers, caches positive AND
  negative results per host (the crawl-side DNS cache: one UDP round
  trip per host, not per request), honors a timeout with one retry.

``SocketTransport(dns_resolver=...)`` then routes every new connection
through a REAL resolve first; NXDOMAIN surfaces as curl error 6 from an
actual wire exchange instead of the fixture's X-header convention.
"""

from __future__ import annotations

import socket
import struct
import threading

QTYPE_A = 1
QCLASS_IN = 1
RCODE_OK = 0
RCODE_FORMERR = 1
RCODE_NXDOMAIN = 3


class DnsError(Exception):
    """Malformed message / server failure / timeout."""


class DnsNxdomain(DnsError):
    """The authoritative answer: this name does not exist."""


# --------------------------------------------------------------------------
# wire format
# --------------------------------------------------------------------------
def encode_name(name: str) -> bytes:
    out = bytearray()
    for label in name.rstrip(".").split("."):
        raw = label.encode("idna") if not label.isascii() \
            else label.encode("ascii")
        if not 1 <= len(raw) <= 63:
            raise DnsError(f"bad label in {name!r}")
        out.append(len(raw))
        out += raw
    out.append(0)
    return bytes(out)


def decode_name(msg: bytes, pos: int) -> tuple[str, int]:
    """Returns (name, next_pos). Follows RFC 1035 §4.1.4 compression
    pointers (with loop protection)."""
    labels = []
    jumped = False
    next_pos = pos
    seen = set()
    while True:
        if pos >= len(msg):
            raise DnsError("name overruns message")
        ln = msg[pos]
        if ln & 0xC0 == 0xC0:           # compression pointer
            if pos + 2 > len(msg):
                raise DnsError("truncated pointer")
            target = struct.unpack(">H", msg[pos:pos + 2])[0] & 0x3FFF
            if target in seen:
                raise DnsError("pointer loop")
            seen.add(target)
            if not jumped:
                next_pos = pos + 2
                jumped = True
            pos = target
            continue
        if ln & 0xC0:
            raise DnsError("reserved label type")
        if ln == 0:
            if not jumped:
                next_pos = pos + 1
            return ".".join(labels), next_pos
        if pos + 1 + ln > len(msg):
            raise DnsError("label overruns message")
        labels.append(msg[pos + 1:pos + 1 + ln].decode("ascii",
                                                       "surrogateescape"))
        pos += 1 + ln


def encode_query(qid: int, qname: str, qtype: int = QTYPE_A) -> bytes:
    # flags: RD set (recursion desired), everything else 0
    header = struct.pack(">HHHHHH", qid, 0x0100, 1, 0, 0, 0)
    return header + encode_name(qname) + struct.pack(">HH", qtype, QCLASS_IN)


def parse_query(msg: bytes) -> tuple[int, str, int]:
    """(qid, qname, qtype); raises DnsError on malformed input."""
    if len(msg) < 12:
        raise DnsError("short header")
    qid, flags, qd, _an, _ns, _ar = struct.unpack(">HHHHHH", msg[:12])
    if flags & 0x8000:
        raise DnsError("response bit set on a query")
    if qd != 1:
        raise DnsError("expected exactly one question")
    qname, pos = decode_name(msg, 12)
    if pos + 4 > len(msg):
        raise DnsError("truncated question")
    qtype, qclass = struct.unpack(">HH", msg[pos:pos + 4])
    if qclass != QCLASS_IN:
        raise DnsError("only class IN served")
    return qid, qname, qtype


def encode_response(qid: int, qname: str, qtype: int,
                    addrs: list[str], rcode: int = RCODE_OK,
                    ttl: int = 60) -> bytes:
    # QR=1, AA=1, RD=1 (echoed), RA=1
    flags = 0x8580 | (rcode & 0xF)
    header = struct.pack(">HHHHHH", qid, flags, 1, len(addrs), 0, 0)
    question = encode_name(qname) + struct.pack(">HH", qtype, QCLASS_IN)
    out = bytearray(header + question)
    for ip in addrs:
        # answer name: compression pointer to the question name at off 12
        out += struct.pack(">H", 0xC000 | 12)
        out += struct.pack(">HHIH", QTYPE_A, QCLASS_IN, ttl, 4)
        out += socket.inet_aton(ip)
    return bytes(out)


def parse_response(msg: bytes, want_qid: int,
                   want_qname: str) -> list[str]:
    """A-record addresses; raises DnsNxdomain on rcode 3, DnsError on
    anything malformed / mismatched."""
    if len(msg) < 12:
        raise DnsError("short header")
    qid, flags, qd, an, _ns, _ar = struct.unpack(">HHHHHH", msg[:12])
    if qid != want_qid:
        raise DnsError("response id mismatch")
    if not flags & 0x8000:
        raise DnsError("not a response")
    rcode = flags & 0xF
    pos = 12
    if qd:
        qname, pos = decode_name(msg, pos)
        if qname.lower() != want_qname.rstrip(".").lower():
            raise DnsError("question echo mismatch")
        pos += 4
    if rcode == RCODE_NXDOMAIN:
        raise DnsNxdomain(want_qname)
    if rcode != RCODE_OK:
        raise DnsError(f"server rcode {rcode}")
    addrs = []
    for _ in range(an):
        _name, pos = decode_name(msg, pos)
        if pos + 10 > len(msg):
            raise DnsError("truncated answer")
        rtype, rclass, _ttl, rdlen = struct.unpack(">HHIH",
                                                   msg[pos:pos + 10])
        pos += 10
        if pos + rdlen > len(msg):
            raise DnsError("rdata overruns message")
        if rtype == QTYPE_A and rclass == QCLASS_IN and rdlen == 4:
            addrs.append(socket.inet_ntoa(msg[pos:pos + rdlen]))
        pos += rdlen
    return addrs


# --------------------------------------------------------------------------
# fixture server
# --------------------------------------------------------------------------
def zone_from_site(site) -> dict[str, str]:
    """Every host the HTTP fixture would consider known → 127.0.0.1
    (matching FixtureTransport._host_known, so resolve-fail rows agree
    byte-for-byte between the transports)."""
    hosts = set(site.hosts) | set(site.robots)
    for url in site.responses:
        try:
            hosts.add(url.split("/", 3)[2].lower())
        except IndexError:
            pass
    return {h: "127.0.0.1" for h in hosts if h}


class FixtureDNSServer:
    """Threaded UDP DNS answering A queries from a host → IP zone; use
    as a context manager. ``addr`` is ("127.0.0.1", port) once started."""

    def __init__(self, zone: dict[str, str]):
        self.zone = {k.rstrip(".").lower(): v for k, v in zone.items()}
        self._sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        self._sock.bind(("127.0.0.1", 0))
        self._sock.settimeout(0.2)
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._serve, daemon=True)
        self.n_queries = 0

    @property
    def addr(self) -> tuple[str, int]:
        return self._sock.getsockname()[:2]

    def _serve(self):
        while not self._stop.is_set():
            try:
                msg, peer = self._sock.recvfrom(4096)
            except socket.timeout:
                continue
            except OSError:
                return
            self.n_queries += 1
            try:
                qid, qname, qtype = parse_query(msg)
            except DnsError:
                if len(msg) >= 2:  # echo the id with FORMERR when possible
                    (qid,) = struct.unpack(">H", msg[:2])
                    hdr = struct.pack(">HHHHHH", qid,
                                      0x8580 | RCODE_FORMERR, 0, 0, 0, 0)
                    self._sock.sendto(hdr, peer)
                continue
            ip = self.zone.get(qname.rstrip(".").lower())
            if ip is None:
                resp = encode_response(qid, qname, qtype, [],
                                       rcode=RCODE_NXDOMAIN)
            elif qtype == QTYPE_A:
                resp = encode_response(qid, qname, qtype, [ip])
            else:   # known name, unserved type: NOERROR with zero answers
                resp = encode_response(qid, qname, qtype, [])
            self._sock.sendto(resp, peer)

    def __enter__(self) -> "FixtureDNSServer":
        self._thread.start()
        return self

    def __exit__(self, *exc) -> None:
        self._stop.set()
        self._thread.join(timeout=2)
        self._sock.close()


# --------------------------------------------------------------------------
# client
# --------------------------------------------------------------------------
class DnsResolver:
    """A-record resolver with a positive AND negative per-host cache —
    the crawl-side DNS cache (one UDP round trip per host, not per
    request). Deterministic query ids (a counter, not randomness) keep
    crawl runs reproducible; the fixture link is loopback, where id
    spoofing is not in the threat model."""

    def __init__(self, server_addr: tuple[str, int],
                 timeout: float = 2.0):
        self.server_addr = (server_addr[0], int(server_addr[1]))
        self.timeout = timeout
        self._cache: dict[str, str | None] = {}  # host → ip | None (nx)
        self._qid = 0
        self._lock = threading.Lock()
        self.n_queries = 0

    def resolve(self, host: str) -> str:
        """IP for host; raises DnsNxdomain (cached) when it doesn't
        exist, DnsError on timeout/malformed."""
        key = host.rstrip(".").lower()
        with self._lock:
            if key in self._cache:
                hit = self._cache[key]
                if hit is None:
                    raise DnsNxdomain(host)
                return hit
            self._qid = (self._qid + 1) & 0xFFFF
            qid = self._qid
        query = encode_query(qid, key)
        sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        try:
            sock.settimeout(self.timeout)
            last_err = None
            for _attempt in (0, 1):
                try:
                    sock.sendto(query, self.server_addr)
                    with self._lock:
                        self.n_queries += 1
                    msg, _peer = sock.recvfrom(4096)
                    addrs = parse_response(msg, qid, key)
                    if not addrs:
                        raise DnsError(f"no A records for {host!r}")
                    with self._lock:
                        self._cache[key] = addrs[0]
                    return addrs[0]
                except DnsNxdomain:
                    with self._lock:
                        self._cache[key] = None
                    raise
                except (socket.timeout, DnsError) as e:
                    last_err = e
            raise DnsError(f"resolve {host!r} failed: {last_err}")
        finally:
            sock.close()
