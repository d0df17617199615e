"""From-scratch Punycode (RFC 3492) + IDNA host labels — the
internationalized-hostname leg of URL canonicalization (the reference's
Url.cc is ASCII-only; real crawl frontiers meet IDN hosts immediately).

``punycode_encode``/``punycode_decode`` implement the published
bootstring algorithm with the standard Punycode parameters (base 36,
tmin 1, tmax 26, skew 38, damp 700, initial bias 72, initial n 0x80).
``idna_encode_host``/``idna_decode_host`` apply it per dot-label with
the ``xn--`` ACE prefix and casefolding (the IDNA2008 lookup subset a
crawler needs: no mapping tables beyond lowercase, mixed-ACE rejected).

Verified against the RFC 3492 §7.1 sample strings in tests plus
stdlib-interop (``'…'.encode('idna')``) both directions.
"""

from __future__ import annotations

_BASE, _TMIN, _TMAX = 36, 1, 26
_SKEW, _DAMP = 38, 700
_INITIAL_BIAS, _INITIAL_N = 72, 0x80
_DELIM = "-"


class PunycodeError(ValueError):
    pass


def _adapt(delta: int, numpoints: int, firsttime: bool) -> int:
    delta = delta // _DAMP if firsttime else delta // 2
    delta += delta // numpoints
    k = 0
    while delta > ((_BASE - _TMIN) * _TMAX) // 2:
        delta //= _BASE - _TMIN
        k += _BASE
    return k + (((_BASE - _TMIN + 1) * delta) // (delta + _SKEW))


def _digit_char(d: int) -> str:
    return chr(d + 22 + 75 * (d < 26))   # 0..25 → a..z, 26..35 → 0..9


def _char_digit(c: str) -> int:
    o = ord(c)
    if 0x30 <= o <= 0x39:
        return o - 22
    if 0x41 <= o <= 0x5A:
        return o - 0x41
    if 0x61 <= o <= 0x7A:
        return o - 0x61
    raise PunycodeError(f"invalid punycode digit {c!r}")


def punycode_encode(s: str) -> str:
    """Unicode label → punycode string (RFC 3492 §6.3)."""
    basic = [c for c in s if ord(c) < 0x80]
    out = basic.copy()
    h = b = len(basic)
    if b:
        out.append(_DELIM)
    n, delta, bias = _INITIAL_N, 0, _INITIAL_BIAS
    codepoints = [ord(c) for c in s]
    while h < len(s):
        m = min(cp for cp in codepoints if cp >= n)
        delta += (m - n) * (h + 1)
        if delta < 0:
            raise PunycodeError("overflow")
        n = m
        for cp in codepoints:
            if cp < n:
                delta += 1
            elif cp == n:
                q = delta
                k = _BASE
                while True:
                    t = (_TMIN if k <= bias
                         else (_TMAX if k >= bias + _TMAX else k - bias))
                    if q < t:
                        break
                    out.append(_digit_char(t + (q - t) % (_BASE - t)))
                    q = (q - t) // (_BASE - t)
                    k += _BASE
                out.append(_digit_char(q))
                bias = _adapt(delta, h + 1, h == b)
                delta = 0
                h += 1
        delta += 1
        n += 1
    return "".join(out)


def punycode_decode(s: str) -> str:
    """Punycode string → Unicode label (RFC 3492 §6.2)."""
    pos = s.rfind(_DELIM)
    if pos > 0:
        output = [c for c in s[:pos]]
        if any(ord(c) >= 0x80 for c in output):
            raise PunycodeError("non-basic code point in basic part")
        rest = s[pos + 1:]
    else:
        output = []
        rest = s[1:] if pos == 0 else s
    i, n, bias = 0, _INITIAL_N, _INITIAL_BIAS
    ri = 0
    while ri < len(rest):
        oldi = i
        w = 1
        k = _BASE
        while True:
            if ri >= len(rest):
                raise PunycodeError("truncated variable-length integer")
            d = _char_digit(rest[ri])
            ri += 1
            i += d * w
            if i < 0:
                raise PunycodeError("overflow")
            t = (_TMIN if k <= bias
                 else (_TMAX if k >= bias + _TMAX else k - bias))
            if d < t:
                break
            w *= _BASE - t
            k += _BASE
        bias = _adapt(i - oldi, len(output) + 1, oldi == 0)
        n += i // (len(output) + 1)
        if n > 0x10FFFF:
            raise PunycodeError("code point out of range")
        i %= len(output) + 1
        output.insert(i, chr(n))
        i += 1
    return "".join(output)


_ACE = "xn--"


def idna_encode_host(host: str) -> str:
    """Unicode hostname → ACE form, per dot-label: lowercase, ASCII
    labels pass through, non-ASCII labels get ``xn--`` + punycode.
    A label that already starts with the ACE prefix but contains
    non-ASCII is rejected (mixed form)."""
    out = []
    for label in host.lower().split("."):
        if label.isascii():
            out.append(label)
        elif label.startswith(_ACE):
            raise PunycodeError(f"mixed ACE/unicode label {label!r}")
        else:
            enc = _ACE + punycode_encode(label)
            if len(enc) > 63:
                raise PunycodeError(f"label too long after ACE: {label!r}")
            out.append(enc)
    return ".".join(out)


def idna_decode_host(host: str) -> str:
    """ACE hostname → Unicode, per dot-label; non-ACE labels pass
    through; round-trip is verified (a decode whose re-encode differs
    is a spoofing vector and rejected)."""
    out = []
    for label in host.lower().split("."):
        if label.startswith(_ACE):
            uni = punycode_decode(label[len(_ACE):])
            if idna_encode_host(uni) != label:
                raise PunycodeError(f"non-canonical ACE label {label!r}")
            out.append(uni)
        else:
            out.append(label)
    return ".".join(out)
