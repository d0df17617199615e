"""RFC 3986 URL parsing / canonicalization, semantics-compatible with the
reference engine's URL handling.

This is a from-scratch Python implementation of the *behavior* specified by
the reference's URL unit tests and documented semantics:

- parse regex / decomposition:      /root/reference/src/common/Url.cc:51-117
  (primary regex table at           /root/reference/src/common/Url.hh:117-132)
- char-class escape table:          /root/reference/src/common/Url.hh:167-195
- escape/unescape family:           /root/reference/src/common/Url.cc:673-813
- normalization (scheme/host/
  escapes/path):                    /root/reference/src/common/Url.cc:330-379
- dot-segment removal + merge:      /root/reference/src/common/Path.cc:13-74
- relative-reference merge:         /root/reference/src/common/Url.cc:195-264
- validity predicates:              /root/reference/src/common/Url.cc:119-193
- golden cases ported from:         /root/reference/src/unit_tests/Url_test.cc:134-183

Everything downstream (URL-seen membership, frontier partitioning, robots
path matching) keys on the canonical form produced here, so this module is
the bit-exactness root for crawl parity.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

# --------------------------------------------------------------------------
# Char-class table (verbatim semantics of Url.hh:167-195).
# --------------------------------------------------------------------------
R = 0x01  # URL_CHAR_RESERVED
U = 0x02  # URL_CHAR_UNSAFE
E = 0x04  # URL_CHAR_ESC
A = 0x08  # URL_CHAR_AUTH
P = 0x10  # URL_CHAR_PATH
Q = 0x20  # URL_CHAR_QUERY
F = 0x40  # URL_CHAR_FRAGMENT
RU = R | U
X = U | E | A | P | Q | F

_TBL = [X] * 256
# printable ASCII rows, exactly as the reference table lays them out
_row = {
    ' ': X, '!': 0, '"': X, '#': RU | A | P | Q, '$': R, '%': X, '&': R, "'": 0,
    '(': 0, ')': 0, '*': 0, '+': R, ',': R, '-': 0, '.': 0, '/': R | A,
    '0': 0, '1': 0, '2': 0, '3': 0, '4': 0, '5': 0, '6': 0, '7': 0,
    '8': 0, '9': 0, ':': RU, ';': R, '<': X, '=': R, '>': X, '?': R | A | P,
    '@': RU, '[': RU, '\\': X, ']': RU, '^': X, '_': 0,
    '`': X, '{': X, '|': X, '}': X, '~': 0, '\x7f': X,
}
for _c in range(0x41, 0x5B):  # A-Z
    _row[chr(_c)] = 0
for _c in range(0x61, 0x7B):  # a-z
    _row[chr(_c)] = 0
for _ch, _flags in _row.items():
    _TBL[ord(_ch)] = _flags
URL_CHAR_TABLE = tuple(_TBL)
del _TBL, _row

_HEX_UPPER = "0123456789ABCDEF"
_HEXDIGITS = set("0123456789abcdefABCDEF")


def char_test(ch: str, mask: int) -> bool:
    return bool(URL_CHAR_TABLE[ord(ch) & 0xFF] & mask)


# --------------------------------------------------------------------------
# escape / unescape family (Url.cc:673-813 semantics)
# --------------------------------------------------------------------------
# per-mask str.translate tables (C-speed fast path when no '%' is present)
_ESCAPE_TRANS: dict[int, dict[int, str]] = {}


def _trans_for(mask: int) -> dict[int, str]:
    t = _ESCAPE_TRANS.get(mask)
    if t is None:
        t = {b: '%' + _HEX_UPPER[b >> 4] + _HEX_UPPER[b & 0xF]
             for b in range(256) if URL_CHAR_TABLE[b] & mask}
        _ESCAPE_TRANS[mask] = t
    return t


def escape(s: str, mask: int) -> str:
    """Percent-escape chars whose class matches ``mask``.

    Existing valid %XX triplets are preserved (the '%' is not re-escaped).
    """
    if not s:
        return s
    if '%' not in s:
        # no triplet-preservation concern → single C-level translate
        t = _ESCAPE_TRANS.get(mask)
        return s.translate(t if t is not None else _trans_for(mask))
    out = []
    i, n = 0, len(s)
    while i < n:
        c = s[i]
        b = ord(c)
        if b < 256 and URL_CHAR_TABLE[b] & mask:
            if c == '%' and i + 2 < n and s[i + 1] in _HEXDIGITS and s[i + 2] in _HEXDIGITS:
                out.append(s[i:i + 3])
                i += 3
                continue
            out.append('%')
            out.append(_HEX_UPPER[b >> 4])
            out.append(_HEX_UPPER[b & 0xF])
        else:
            out.append(c)
        i += 1
    return ''.join(out)


def escape_reserved_unsafe(s: str) -> str:
    return escape(s, R | U)


def _unescape_pred(s: str, keep) -> str:
    """Shared body of the unescape variants: decode %XX when ``keep(c)`` is
    False for the decoded char; otherwise leave the triplet alone."""
    if not s or '%' not in s:
        return s
    out = []
    i, n = 0, len(s)
    while i < n:
        c = s[i]
        if c == '%' and i + 2 < n and s[i + 1] in _HEXDIGITS and s[i + 2] in _HEXDIGITS:
            dec = chr(int(s[i + 1:i + 3], 16))
            if not keep(dec):
                out.append(dec)
                i += 3
                continue
        out.append(c)
        i += 1
    return ''.join(out)


def unescape_all(s: str) -> str:
    return _unescape_pred(s, lambda c: False)


def unescape(s: str, mask: int) -> str:
    """Unescape %XX whose decoded char matches mask."""
    return _unescape_pred(s, lambda c: not (URL_CHAR_TABLE[ord(c) & 0xFF] & mask))


def unescape_not(s: str, mask: int) -> str:
    """Unescape %XX whose decoded char does NOT match mask."""
    return _unescape_pred(s, lambda c: bool(URL_CHAR_TABLE[ord(c) & 0xFF] & mask))


def unescape_safe(s: str) -> str:
    """Unescape %XX whose decoded char is neither reserved nor unsafe."""
    return unescape_not(s, R | U)


def normalize_escapes_str(s: str) -> str:
    """unescape-safe, then uppercase the hex of remaining escapes
    (Url.cc:346-357)."""
    s = unescape_safe(s)
    if '%' not in s:
        return s
    out = []
    i, n = 0, len(s)
    while i < n:
        c = s[i]
        if c == '%' and i + 2 < n and s[i + 1] in _HEXDIGITS and s[i + 2] in _HEXDIGITS:
            out.append('%')
            out.append(s[i + 1].upper())
            out.append(s[i + 2].upper())
            i += 3
            continue
        out.append(c)
        i += 1
    return ''.join(out)


# --------------------------------------------------------------------------
# Path (Path.hh / Path.cc semantics): segment list + SLASH_BEGIN/SLASH_END
# --------------------------------------------------------------------------
@dataclass
class UrlPath:
    segs: list[str] = field(default_factory=list)
    slash_begin: bool = False
    slash_end: bool = False

    @classmethod
    def parse(cls, s: str) -> "UrlPath":
        """Path::assign (Path.cc:133-177): runs of '/' collapse, leading and
        trailing '/' recorded as flags."""
        p = cls()
        if not s:
            return p
        if s[0] == '/':
            p.slash_begin = True
        p.segs = [seg for seg in s.split('/') if seg]
        if s[-1] == '/':
            p.slash_end = True
        return p

    def copy(self) -> "UrlPath":
        return UrlPath(list(self.segs), self.slash_begin, self.slash_end)

    @property
    def empty(self) -> bool:
        return not self.segs and not self.slash_begin and not self.slash_end

    @property
    def absolute(self) -> bool:
        return self.slash_begin

    def get(self) -> str:
        """Path::get (Path.cc:101-131)."""
        if self.empty:
            return ""
        if self.segs:
            res = ('/' if self.slash_begin else '') + '/'.join(self.segs)
            if self.slash_end:
                res += '/'
            if res == '//':
                res = '/'
            return res
        return '/'

    def normalize(self) -> None:
        """Dot-segment removal, ported from Path::normalize (Path.cc:43-74).

        Removes "seg/.." pairs (where seg is not itself '.'/'..') and '.'
        segments; a removal that lands at the end of the path sets the
        trailing-slash flag.
        """
        segs = self.segs
        i = 1  # the first element is never examined on entry (C++ starts at begin+1)
        while i < len(segs):
            j = i - 1 if i > 0 else 0  # predecessor; j == i when i is at the head
            if segs[i] == '..' and j != i and segs[j] not in ('..', '.'):
                del segs[i]
                del segs[j]
                i = j  # element after the erased pair now sits at index j
                if i >= len(segs):
                    self.slash_end = True
            elif segs[i] == '.':
                del segs[i]
                if i >= len(segs):
                    self.slash_end = True
            else:
                i += 1
        # a single leading '.'/'..' in a relative path survives (the loop
        # never starts at the head) — matching test_eq(".", ".") and
        # test_eq("../b", "../b") in Url_test.cc:159-164.

    def merge(self, p: "UrlPath") -> None:
        """RFC 3986 §5.3 path merge, ported from Path::merge (Path.cc:13-41)."""
        if p.slash_begin:
            self.segs = list(p.segs)
            self.slash_begin = p.slash_begin
            self.slash_end = p.slash_end
            return
        if not self.slash_end and self.segs and not p.empty:
            self.segs.pop()  # drop the file element
        for seg in p.segs:
            if seg == '.':
                self.slash_end = True
            elif seg == '..':
                if self.segs:
                    self.segs.pop()
                    self.slash_end = True
            else:
                self.segs.append(seg)
                self.slash_end = False
        if p.slash_end:
            self.slash_end = True


# --------------------------------------------------------------------------
# Url
# --------------------------------------------------------------------------
class UrlParseError(ValueError):
    pass


# primary decomposition regex — Url.hh:119
_URL_RE = re.compile(r'(([^:/?#]+):)?(//([^/?#]*)|///)?([^?#]*)(\?[^#]*)?(#.*)?')
_SCHEME_RE = re.compile(r'[A-Za-z][A-Za-z0-9+.\-]*')
_HOST_RE = re.compile(r'[A-Za-z0-9]([A-Za-z0-9.\-]*[A-Za-z0-9.])?')
_PORT_RE = re.compile(r'\d{1,5}')
_IPVFUT_RE = re.compile(r"v[0-9A-Fa-f]\.1[A-Za-z0-9._~!$&'()*+,;=:\-]*")
# IPv6 / IPv4 validation per the ABNF in Url.hh:62-102
_DECOCT = r'([01]?[0-9]?[0-9]|2[0-4][0-0]|25[0-5])'
_IPV4 = r'(' + _DECOCT + r'\.' + _DECOCT + r'\.' + _DECOCT + r'\.' + _DECOCT + r')'
_H16 = r'([0-9A-Fa-f]{1,4})'
_LS32 = r'(([0-9A-Fa-f]{1,4}:[0-9A-Fa-f]{1,4})|' + _IPV4 + r')'
_IPV6 = ('('
         + r'((' + _H16 + r':){6}' + _LS32 + r')'
         + r'|(::(' + _H16 + r':){5}' + _LS32 + r')'
         + r'|((' + _H16 + r')?::(' + _H16 + r':){4}' + _LS32 + r')'
         + r'|(((' + _H16 + r':){0,1}' + _H16 + r')?::(' + _H16 + r':){3}' + _LS32 + r')'
         + r'|(((' + _H16 + r':){0,2}' + _H16 + r')?::(' + _H16 + r':){2}' + _LS32 + r')'
         + r'|(((' + _H16 + r':){0,3}' + _H16 + r')?::(' + _H16 + r':){1}' + _LS32 + r')'
         + r'|(((' + _H16 + r':){0,4}' + _H16 + r')?::' + _LS32 + r')'
         + r'|(((' + _H16 + r':){0,5}' + _H16 + r')?::' + _H16 + r')'
         + r'|(((' + _H16 + r':){0,6}' + _H16 + r')?::)'
         + ')')
_IPV4_RE = re.compile(_IPV4)
_IPV6_RE = re.compile(_IPV6)


def _valid_host(h: str) -> bool:
    """Url::valid_host (Url.cc:169-193): empty is valid; else reg-name,
    IPvFuture, IPv6 or IPv4 after safe-unescaping."""
    if not h:
        return True
    h = unescape_safe(h)
    return bool(
        _HOST_RE.fullmatch(h)
        or _IPVFUT_RE.fullmatch(h)
        or _IPV6_RE.fullmatch(h)
        or _IPV4_RE.fullmatch(h)
    )


class Url:
    __slots__ = ('scheme', 'userinfo', 'host', 'port', 'path', 'query',
                 'fragment', 'has_authority', 'host_ip_literal')

    def __init__(self, s: str | None = None):
        self.clear()
        if s is not None:
            self.assign(s)

    def clear(self) -> None:
        self.scheme = ''
        self.userinfo = ''
        self.host = ''
        self.port = ''
        self.path = UrlPath()
        self.query = ''
        self.fragment = ''
        self.has_authority = False
        self.host_ip_literal = False

    def copy(self) -> "Url":
        u = Url()
        u.scheme, u.userinfo, u.host, u.port = self.scheme, self.userinfo, self.host, self.port
        u.path = self.path.copy()
        u.query, u.fragment = self.query, self.fragment
        u.has_authority, u.host_ip_literal = self.has_authority, self.host_ip_literal
        return u

    # --- component setters with reference validation semantics ---
    def set_scheme(self, s: str) -> None:
        if not _SCHEME_RE.fullmatch(s):
            raise UrlParseError(f"scheme: {s!r} doesn't match scheme validation regex")
        self.scheme = s.lower()
        # quirk preserved from Url.cc:391: setting a scheme marks the url
        # as having an authority (file:/// etc. rely on it)
        self.has_authority = True

    def set_authority(self, s: str) -> None:
        """Url::authority (Url.cc:406-452)."""
        host_b = 0
        at = s.find('@')
        if at != -1:
            self.userinfo = escape(s[:at], A)
            host_b = at + 1
            if host_b >= len(s):
                raise UrlParseError("authority doesn't have host part: " + s)
        if host_b < len(s) and s[host_b] == '[':
            self.host_ip_literal = True
            host_b += 1
            if host_b >= len(s):
                raise UrlParseError("authority incomplete host part after '['")
            close = s.find(']', host_b)
            if close == -1:
                raise UrlParseError("authority incomplete host part, no closing ']'")
            self._set_host(s[host_b:close])
        else:
            colon = s.find(':', host_b)
            if colon == -1:
                self._set_host(s[host_b:])
            elif colon == host_b:
                raise UrlParseError("authority starts with : without @ part")
            else:
                self._set_host(s[host_b:colon])
                if colon + 1 < len(s):
                    self._set_port(s[colon + 1:])
                else:
                    raise UrlParseError("no port number after :")

    def _set_host(self, s: str) -> None:
        norm = escape(s, A)
        if not _valid_host(norm):
            raise UrlParseError(f"Url::host({s!r}): Invalid host")
        self.host = norm
        self.has_authority = True

    def _set_port(self, s: str) -> None:
        if not s:
            self.port = ''
            return
        if not _PORT_RE.fullmatch(s):
            raise UrlParseError(f"Url::port({s!r}): invalid port")
        p = int(s)
        if not (0 < p < (1 << 16)):
            raise UrlParseError(f"Url::port({s!r}): out of range")
        self.port = s

    def set_path(self, s: str) -> None:
        self.path = UrlPath.parse(escape(s, P))
        if self.has_authority:
            self.path.slash_begin = True

    def set_query(self, s: str) -> None:
        # stored WITH its leading '?' (the regex group includes it)
        self.query = escape(s, Q)

    def set_fragment(self, s: str) -> None:
        # stored WITH its leading '#'
        self.fragment = escape(s, F)

    # --- parse ---
    def assign(self, s: str) -> "Url":
        """Url::assign (Url.cc:51-117)."""
        self.clear()
        m = _URL_RE.fullmatch(s)
        if m is None:
            raise UrlParseError("Url doesn't match primary url regex")
        scheme, dslash, auth, path, query, frag = (
            m.group(2), m.group(3), m.group(4), m.group(5), m.group(6), m.group(7))
        if scheme is not None:
            self.set_scheme(scheme)
        if dslash is not None and dslash == '//':
            if self.scheme and self.scheme != 'file':
                raise UrlParseError(
                    "empty authority part with // only allowed for scheme 'file'")
        if auth is not None:
            self.set_authority(auth)
        if path is not None:
            self.set_path(path)
        if query is not None:
            self.set_query(query)
        if frag is not None:
            self.set_fragment(frag)
        if not self.syntax_ok():
            raise UrlParseError("syntax_ok() sanity checks failed: " + s)
        if not _valid_host(self.host):
            raise UrlParseError("valid_host() sanity checks failed: " + s)
        return self

    # --- predicates (Url.cc:119-167) ---
    def syntax_ok(self) -> bool:
        if self.has_authority and not (self.path.empty or self.path.absolute):
            return False
        if any(c in self.scheme for c in ':/?#'):
            return False
        if any(c in self.host for c in '/?#'):
            return False
        if not _valid_host(self.host):
            return False
        if any(c in self.path.get() for c in '?#'):
            return False
        if '#' in self.query:
            return False
        return True

    @property
    def absolute(self) -> bool:
        return bool(self.scheme)

    @property
    def empty(self) -> bool:
        return not (self.scheme or self.has_authority or not self.path.empty
                    or self.query or self.fragment)

    def has_query(self) -> bool:
        return bool(self.query)

    def has_fragment(self) -> bool:
        return bool(self.fragment)

    # --- serialization (Url.cc:621-645) ---
    def authority_str(self) -> str:
        if not self.host:
            return ''
        res = ''
        if self.userinfo:
            res += self.userinfo + '@'
        if self.host_ip_literal:
            res += '[' + self.host + ']'
        else:
            res += self.host
        if self.port:
            res += ':' + self.port
        return res

    def get(self) -> str:
        res = ''
        if self.scheme:
            res += self.scheme + ':'
        if self.has_authority:
            res += '//' + self.authority_str()
        res += self.path.get()
        res += self.query
        res += self.fragment
        return res

    def __str__(self) -> str:
        return self.get()

    def __repr__(self) -> str:
        return f'Url({self.get()!r})'

    # --- normalization (Url.cc:330-379) ---
    def normalize(self) -> "Url":
        self.scheme = self.scheme.lower()
        # RFC 4343: only lowercase ASCII A-Z in host
        if not self.host.isascii() or not self.host.islower():
            self.host = ''.join(
                chr(ord(c) + 0x20) if 'A' <= c <= 'Z' else c
                for c in self.host)
        # normalize_escapes re-parses the full serialized form; skip the
        # re-parse when it is a provable no-op (no escapes anywhere)
        s = self.get()
        ns = normalize_escapes_str(s)
        if ns != s:
            self.assign(ns)
        self.path.normalize()
        return self

    def canonical(self) -> str:
        return self.copy().normalize().get()

    def __eq__(self, other) -> bool:
        if not isinstance(other, Url):
            return NotImplemented
        return self.canonical() == other.canonical()

    def __ne__(self, other) -> bool:
        eq = self.__eq__(other)
        return NotImplemented if eq is NotImplemented else not eq

    def __hash__(self):
        return hash(self.canonical())

    def size(self) -> int:
        return len(self.get())

    # --- relative-reference merge (Url.cc:195-264) ---
    def merge_ref(self, u: "Url") -> "Url":
        if not u.syntax_ok():
            raise UrlParseError("supplied url ! syntax_ok")
        if self.absolute and not u.absolute:
            if u.scheme:
                # unreachable: absolute == has scheme; kept for parity shape
                self.clear()
                self.set_scheme(u.scheme)
                if u.has_authority:
                    self.set_authority(u.authority_str())
                self.set_path(u.path.get())
                self.query = u.query
            else:
                if u.has_authority:
                    self.set_authority(u.authority_str())
                    self.set_path(u.path.get())
                    if u.has_query():
                        self.query = u.query
                else:
                    if u.path.empty:
                        if u.has_query():
                            self.query = u.query
                    else:
                        self.path.merge(u.path)
                        self.query = u.query if u.has_query() else ''
            self.fragment = u.fragment if u.has_fragment() else ''
            return self
        raise UrlParseError("merge_ref requires absolute base and relative ref")


# --------------------------------------------------------------------------
# convenience API used by the pipeline stages
# --------------------------------------------------------------------------
def canonicalize(s: str) -> str:
    """Parse + normalize; raises UrlParseError on invalid input."""
    return Url(s).normalize().get()


def try_canonicalize(s: str):
    """Returns (canonical:str|None, host:str, ok:bool) — never raises."""
    try:
        u = Url(s).normalize()
        return u.get(), u.host, True
    except (UrlParseError, Exception):
        return None, '', False
