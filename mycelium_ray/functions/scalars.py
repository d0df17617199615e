"""Scalar function library (SURVEY.md §2.8 parity surface).

Formatting and codec helpers matching the reference's utils:
- fmt_bytes / fmt_kbytes_s:   /root/reference/src/common/utils.cc:577-610
  (decimal-1000 steps over binary suffixes, 2-decimal fixed — quirk kept)
- hex digit codecs:           utils.hh:299-316, utils.cc:263-301
- valid_utf8:                 dist/utils/__init__.py:5-25 (M23)
- uniq (stable distinct):     dist/utils/__init__.py:81-90 (A4)
- tokenize / word_tokenize:   dist/utils/__init__.py:66-79 (M25)
- casefold:                   Case_folder.cc analog (M20) via str.casefold /
  pyarrow.compute.utf8_casefold for columns
"""

from __future__ import annotations

import re

_BYTE_SUFFIXES = ("iB", "KiB", "MiB", "GiB", "TiB", "PiB")
_RATE_SUFFIXES = ("KB/s", "MB/s", "GB/s", "TB/s", "PB/s")


def fmt_bytes(n: int) -> str:
    res, i = float(n), 0
    while res > 1000 and i <= 4:
        res /= 1000
        i += 1
    return f"{res:.2f} {_BYTE_SUFFIXES[i]}"


def fmt_kbytes_s(kbs: float) -> str:
    res, i = float(kbs), 0
    while res > 1000 and i <= 3:
        res /= 1000
        i += 1
    return f"{res:.2f} {_RATE_SUFFIXES[i]}"


def sha1_to_hex(digest: bytes) -> str:
    return digest.hex()


def hex_to_sha1(s: str) -> bytes:
    return bytes.fromhex(s)


def valid_utf8(data: bytes) -> bool:
    try:
        data.decode("utf-8", "strict")
        return True
    except UnicodeDecodeError:
        return False


def uniq(seq):
    """Order-preserving distinct (dist/utils/__init__.py:81-90)."""
    seen = set()
    out = []
    for x in seq:
        if x not in seen:
            seen.add(x)
            out.append(x)
    return out


_TOKEN_RE = re.compile(r"\w+", re.UNICODE)
_WORD_RE = re.compile(r"[A-Za-z]+(?:'[A-Za-z]+)?|\d+", re.UNICODE)


def tokenize(text: str) -> list[str]:
    """Whitespace+word-char tokenizer (M25 first variant)."""
    return _TOKEN_RE.findall(text)


def word_tokenize(text: str) -> list[str]:
    """Contractions-aware word tokenizer (M25 second variant)."""
    return _WORD_RE.findall(text)


def casefold(text: str) -> str:
    return text.casefold()


def casefold_column(arr):
    """Column form (pyarrow)."""
    import pyarrow.compute as pc
    return pc.utf8_casefold(arr)
