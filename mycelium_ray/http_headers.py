"""HTTP header-block parsing (reference operator M7).

Behavior from ``utils::parse_http_headers``
(/root/reference/src/common/utils.cc:624-731): split the block on ``\\n\\r``
runs, match ``name:value`` with the token/separator classes of the HEADER_RE
(utils.cc:612-618), extract Content-Type → enum and ``charset=`` → charset.

The content-type chain implements the *intended* contains-substring checks
(text/html, text/plain, xhtml, pdf, rss, atom); the reference has an
operator-precedence slip at utils.cc:700 (``value.find(..)`` without
``!= npos``) that the intent and its own unit test
(Parse_http_headers_test.cc:12-34) contradict.

``content_type_t`` ordering mirrors the acceptability gate
``UNRECOGNIZED < ctype < EMPTY`` (crawler.cc:1206-1209). The enum header
itself (content_type.hh) is absent from the reference tree; values are
reconstructed from usage. Image types are the graft's addition: they sit in
the acceptable range so the fetch gate admits image payloads.
"""

from __future__ import annotations

import re
from enum import IntEnum


class ContentType(IntEnum):
    UNRECOGNIZED = 0
    TEXT_HTML = 1
    XHTML = 2
    TEXT_PLAIN = 3
    APPLICATION_PDF = 4
    RSS_XML = 5
    ATOM_XML = 6
    IMAGE_JPEG = 7
    IMAGE_PNG = 8
    IMAGE_WEBP = 9
    EMPTY = 10
    # video containers sit past EMPTY on purpose: `acceptable` keeps the
    # reference crawler's gate (html/text/pdf/images only — the reference
    # had no video path), while the sniffer still types the bytes
    VIDEO_AVI = 11
    VIDEO_Y4M = 12
    # tiff/bmp likewise sit past EMPTY: the sniffer types the bytes, but
    # the fetch gate keeps the reference's accepted set unchanged (the
    # crawl corpus carries png/jpeg/webp/gif only)
    IMAGE_TIFF = 13
    IMAGE_BMP = 14


def acceptable(ctype: ContentType) -> bool:
    """EasyHandle::acceptable (crawler.cc:1206-1209)."""
    return ContentType.UNRECOGNIZED < ctype < ContentType.EMPTY


# separator class from utils.cc:613; header name is one-or-more non-separators
_SEPARATOR = r'()<>@,;\\:"/\[\]?={}\t'
_HEADER_RE = re.compile(r'([^' + _SEPARATOR + r']+):(.+)')
# token class from utils.cc:613 (no controls/separators)
_CHARSET_RE = re.compile(r'charset=([^\x00-\x1f()<>@,;\\:"/\[\]?={}\t ]+)')
_CT_RE = re.compile(r'^content-type$', re.IGNORECASE)

_CT_CHAIN = [
    ("text/html", ContentType.TEXT_HTML),
    ("text/plain", ContentType.TEXT_PLAIN),
    ("application/xhtml+xml", ContentType.XHTML),
    ("application/pdf", ContentType.APPLICATION_PDF),
    ("application/rss+xml", ContentType.RSS_XML),
    ("application/atom+xml", ContentType.ATOM_XML),
    # graft additions: image payloads
    ("image/jpeg", ContentType.IMAGE_JPEG),
    ("image/jpg", ContentType.IMAGE_JPEG),
    ("image/png", ContentType.IMAGE_PNG),
    ("image/webp", ContentType.IMAGE_WEBP),
]


_SEP_SET = frozenset('()<>@,;\\:"/[]?={}\t')  # utils.cc:613 separator class
_SEP_SEARCH = re.compile(r'[()<>@,;\\:"/\[\]?={}\t]').search
_LINE_SPLIT = re.compile(r"[\n\r]")
# content-type VALUES repeat across millions of responses while full header
# blocks don't (Content-Length/ETag vary): memoize the chain+charset scan
# on the value string — this runs twice per fetched URL in the planner
_CT_CACHE: dict[str, tuple["ContentType", str]] = {}


def parse_http_headers(headers: str):
    """Returns (content_type: ContentType, charset: str, headermap: dict).

    Splitting follows the tortoise/hare ``find_first_of("\\n\\r")`` loop of
    utils.cc:681-729: separator runs are skipped, segments shorter than 2
    chars are dropped, and a trailing segment without a final newline is
    dropped. The name:value match is the HEADER_RE semantics
    (utils.cc:612-618) implemented with partition + a separator-set check
    (this runs twice per fetched URL — it must stay off the regex engine).
    """
    ctype = ContentType.EMPTY
    charset = ""
    headermap: dict[str, str] = {}
    segs = _LINE_SPLIT.split(headers)
    for line in segs[:-1]:  # last segment has no trailing separator → drop
        if len(line) < 2:
            continue
        name, colon, value = line.partition(":")
        if not colon or not name or not value:
            continue
        if _SEP_SEARCH(name):
            continue
        if name.lower() == "content-type":
            hit = _CT_CACHE.get(value)
            if hit is None:
                ctype = ContentType.UNRECOGNIZED
                for needle, ct in _CT_CHAIN:
                    if needle in value:
                        ctype = ct
                        break
                cm = _CHARSET_RE.search(value)
                cs = cm.group(1) if cm else ""
                if len(_CT_CACHE) < 4096:
                    _CT_CACHE[value] = (ctype, cs)
                hit = (ctype, cs)
            ctype, cs = hit
            if cs:
                charset = cs
        headermap[name] = value
    return ctype, charset, headermap


# --- graft analog of M18/M31: payload format sniffing by magic bytes ---
_MAGIC = [
    (b"\xff\xd8\xff", "jpeg"),
    (b"\x89PNG\r\n\x1a\n", "png"),
    (b"RIFF", "webp"),        # RIFF....WEBP checked below
    (b"RIFF", "avi"),         # RIFF....AVI  checked below
    (b"GIF87a", "gif"),
    (b"GIF89a", "gif"),
    (b"%PDF-", "pdf"),
    (b"YUV4MPEG2", "y4m"),
    (b"II*\x00", "tiff"),     # little-endian TIFF (tiff.py)
    (b"MM\x00*", "tiff"),     # big-endian TIFF
    (b"BM", "bmp"),
    (b"FAKEJPG1", "jpeg"),    # deterministic stub codec (imaging.py)
    (b"FAKEWEBP", "webp"),
]

_RIFF_KIND = {"webp": b"WEBP", "avi": b"AVI "}


def sniff_format(data: bytes) -> str:
    """Magic-byte format sniff (graft analog of utils.cc:445-481)."""
    for magic, fmt in _MAGIC:
        if data.startswith(magic):
            if magic == b"RIFF":
                # RIFF is a container family: bytes 8:12 name the kind
                if len(data) < 12 or data[8:12] != _RIFF_KIND[fmt]:
                    continue
            if magic == b"BM":
                # "BM" alone is two printable bytes — require a plausible
                # DIB header size word so text never sniffs as bmp
                if (len(data) < 54 or data[14:18] not in
                        (b"\x0c\x00\x00\x00", b"\x28\x00\x00\x00",
                         b"\x34\x00\x00\x00", b"\x38\x00\x00\x00",
                         b"\x40\x00\x00\x00", b"\x6c\x00\x00\x00",
                         b"\x7c\x00\x00\x00")):
                    continue
            return fmt
    return "unknown"


FMT_TO_CTYPE = {
    "jpeg": ContentType.IMAGE_JPEG,
    "png": ContentType.IMAGE_PNG,
    "webp": ContentType.IMAGE_WEBP,
    "pdf": ContentType.APPLICATION_PDF,
    "avi": ContentType.VIDEO_AVI,
    "y4m": ContentType.VIDEO_Y4M,
    "tiff": ContentType.IMAGE_TIFF,
    "bmp": ContentType.IMAGE_BMP,
    "unknown": ContentType.UNRECOGNIZED,
}


# --- text charset sniffing (BOM + UTF-8 heuristic) -----------------------
# The M18 charset leg: the reference converts fetched text to UTF-8 before
# lexing (utils.cc charset path); the Ray stage sniffs the wire bytes and
# the decode itself happens vectorized in the pipeline (textops).

_BOMS = [
    (b"\xef\xbb\xbf", "utf-8-sig"),
    (b"\xff\xfe", "utf-16-le"),
    (b"\xfe\xff", "utf-16-be"),
]


def sniff_charset(data: bytes) -> str:
    """BOM-first charset sniff; BOM-less input falls back to a strict
    UTF-8 trial, then latin-1 (which never fails — the browser rule)."""
    for bom, enc in _BOMS:
        if data.startswith(bom):
            return enc
    try:
        data.decode("utf-8")
        return "utf-8"
    except UnicodeDecodeError:
        return "latin-1"


# --- HTTP caching policy (RFC 9111 subset) --------------------------------
# The recrawl scheduler's freshness input: Cache-Control directives +
# Expires/Date fallback, with the spec's precedence (s-maxage > max-age >
# Expires-Date). The reference crawler recrawls unconditionally; this is
# the policy layer a production recrawl loop ranks by.

def parse_cache_control(value: str) -> dict:
    """Cache-Control header value → {directive: value|True}; token
    directives map to True, =arguments keep their (unquoted) string.
    Unknown directives are preserved — callers pick what they honor."""
    out: dict = {}
    for part in value.split(","):
        part = part.strip()
        if not part:
            continue
        name, _, arg = part.partition("=")
        name = name.strip().lower()
        if not name:
            continue
        if arg:
            out[name] = arg.strip().strip('"')
        else:
            out[name] = True
    return out


def freshness_lifetime(cache_control: str, expires_epoch: int | None,
                       date_epoch: int | None,
                       shared: bool = True,
                       last_modified_epoch: int | None = None) -> tuple[int, bool, bool]:
    """(lifetime_s, cacheable, revalidate) per RFC 9111 §4.2.1/§5.2:

    - ``no-store`` → not cacheable at all;
    - ``private`` → not cacheable by a SHARED cache (a crawler is one);
    - ``no-cache`` → cacheable but must revalidate every use (lifetime 0);
    - else lifetime = s-maxage (shared) > max-age > (Expires - Date),
      falling back to the §4.2.2 HEURISTIC when none is present and
      Last-Modified is: 10% of (Date - Last-Modified) — the rule every
      cache (and polite recrawler) applies to lifetime-less responses.
    Malformed numeric arguments are ignored per the spec's error
    handling (treat as absent)."""
    cc = parse_cache_control(cache_control or "")
    if "no-store" in cc:
        return 0, False, False
    if shared and "private" in cc:
        return 0, False, False
    if "no-cache" in cc:
        return 0, True, True
    def _num(name):
        v = cc.get(name)
        if isinstance(v, str):
            try:
                n = int(v)
                return max(0, n)
            except ValueError:
                return None
        return None
    life = None
    if shared:
        life = _num("s-maxage")
    if life is None:
        life = _num("max-age")
    if life is None and expires_epoch is not None \
            and date_epoch is not None:
        life = max(0, int(expires_epoch) - int(date_epoch))
    if life is None and last_modified_epoch is not None \
            and date_epoch is not None:
        life = max(0, (int(date_epoch) - int(last_modified_epoch)) // 10)
    return (life if life is not None else 0), True, False
