"""From-scratch minimal PDF text extraction (M22 conversion path).

The reference's local indexer forks ``pdftotext`` per file
(src/local_indexer/local_indexer.cc:98-131, dist/local_indexer.py:88-97);
this container ships no poppler, so the conversion itself is implemented
here from the public PDF 1.7 spec (ISO 32000-1): a tolerant object
scanner, FlateDecode via stdlib zlib, and a content-stream tokenizer for
the text-showing operators (Tj, TJ, ', ") with full literal-string escape
handling. Scope is the "simple text PDF" class pdftotext handles without
font CMaps: byte strings are mapped through the standard Latin-1-ish
single-byte assumption (exact for ASCII WinAnsi/Standard encodings, which
is what generated/report PDFs use). Anything outside that scope raises
``PdfError`` and the indexer records the reference's 415 conversion-failure
row — the same failure contract, never a wrong-text success.

No external libraries: zlib (stdlib) only.
"""

from __future__ import annotations

import re
import zlib


class PdfError(ValueError):
    """Unparseable / out-of-scope PDF (maps to the 415 indexer path)."""


_OBJ_RE = re.compile(rb"(\d+)\s+(\d+)\s+obj\b")
_STREAM_RE = re.compile(rb"stream\r?\n?")
_FLATE_RE = re.compile(rb"/(?:Filter\s*/FlateDecode|Filter\s*\[\s*/FlateDecode\s*\])")
_FILTER_RE = re.compile(rb"/Filter\b")
_LEN_RE = re.compile(rb"/Length\s+(\d+)(?:\s+(\d+)\s+R)?")

# text-showing / positioning operators we honor inside BT..ET
_TEXT_OPS = (b"Tj", b"TJ", b"'", b'"')


def _iter_objects(data: bytes):
    """Yield (objnum, dict_bytes, stream_bytes|None) for every ``N G obj``
    in the file — a tolerant linear scan that needs no xref table (works
    on linearized, incrementally-updated, and slightly damaged files, the
    same robustness posture pdftotext takes)."""
    for m in _OBJ_RE.finditer(data):
        start = m.end()
        end = data.find(b"endobj", start)
        if end < 0:
            continue
        body = data[start:end]
        sm = _STREAM_RE.search(body)
        if sm is None:
            yield int(m.group(1)), body, None
            continue
        head = body[:sm.start()]
        raw = body[sm.end():]
        # prefer the declared /Length when it is a direct integer and sane
        lm = _LEN_RE.search(head)
        if lm is not None and lm.group(2) is None:
            ln = int(lm.group(1))
            if ln <= len(raw):
                yield int(m.group(1)), head, raw[:ln]
                continue
        # fall back to scanning for endstream
        es = raw.rfind(b"endstream")
        if es < 0:
            continue
        yield int(m.group(1)), head, raw[:es].rstrip(b"\r\n")


def _decode_stream(head: bytes, raw: bytes) -> bytes | None:
    """Decoded stream bytes, or None when the filter chain is out of
    scope (images, CCITT, crypt...)."""
    if _FLATE_RE.search(head):
        try:
            return zlib.decompress(raw)
        except zlib.error as e:
            raise PdfError(f"corrupt FlateDecode stream: {e}") from e
    if _FILTER_RE.search(head):
        return None  # some other filter — out of scope, skip the stream
    return raw  # unfiltered stream


_ESCAPES = {ord("n"): "\n", ord("r"): "\r", ord("t"): "\t",
            ord("b"): "\b", ord("f"): "\f",
            ord("("): "(", ord(")"): ")", ord("\\"): "\\"}


def _parse_literal(data: bytes, i: int) -> tuple[str, int]:
    """PDF literal string starting at the '(' at ``data[i]`` → (text,
    index past the closing ')'). Handles nesting, all escapes, octal
    codes, and escaped line continuations (ISO 32000-1 §7.3.4.2)."""
    assert data[i] == 0x28  # (
    out: list[str] = []
    depth = 1
    i += 1
    n = len(data)
    while i < n:
        c = data[i]
        if c == 0x5C:  # backslash
            i += 1
            if i >= n:
                break
            e = data[i]
            if e in _ESCAPES:
                out.append(_ESCAPES[e])
                i += 1
            elif 0x30 <= e <= 0x37:  # octal, 1-3 digits
                oct_digits = chr(e)
                i += 1
                for _ in range(2):
                    if i < n and 0x30 <= data[i] <= 0x37:
                        oct_digits += chr(data[i])
                        i += 1
                    else:
                        break
                out.append(chr(int(oct_digits, 8) & 0xFF))
            elif e in (0x0A, 0x0D):  # escaped newline: line continuation
                i += 1
                if e == 0x0D and i < n and data[i] == 0x0A:
                    i += 1
            else:  # unknown escape: the backslash is dropped per spec
                out.append(chr(e))
                i += 1
        elif c == 0x28:
            depth += 1
            out.append("(")
            i += 1
        elif c == 0x29:
            depth -= 1
            if depth == 0:
                return "".join(out), i + 1
            out.append(")")
            i += 1
        else:
            out.append(chr(c))
            i += 1
    raise PdfError("unterminated literal string")


def _parse_hex(data: bytes, i: int) -> tuple[str, int]:
    """PDF hex string starting at '<' → (text, index past '>')."""
    assert data[i] == 0x3C  # <
    j = data.find(b">", i + 1)
    if j < 0:
        raise PdfError("unterminated hex string")
    hx = bytes(c for c in data[i + 1:j]
               if not chr(c).isspace())
    if len(hx) % 2:
        hx += b"0"  # odd count: pad with 0 per spec
    try:
        return bytes.fromhex(hx.decode("ascii")).decode("latin-1"), j + 1
    except ValueError as e:
        raise PdfError(f"bad hex string: {e}") from e


def _extract_from_content(content: bytes) -> list[str]:
    """Text runs from one decoded content stream, in stream order.

    Stack-free scan: strings are accumulated; a text-showing operator
    flushes the pending strings to the output, any other operator clears
    them (they were arguments to something else, e.g. a /GS name). Line-
    advance operators (Td, TD, T*, ', ") start a new output run, which
    ``pdf_to_text`` joins with newlines — the same layout approximation
    pdftotext's -raw mode makes."""
    runs: list[str] = []
    cur: list[str] = []  # strings seen since the last operator
    line: list[str] = []  # text of the current visual line
    i, n = 0, len(content)
    in_tj_array = False

    def endline():
        if line:
            runs.append("".join(line))
            line.clear()

    while i < n:
        c = content[i]
        if c == 0x28:  # (
            s, i = _parse_literal(content, i)
            cur.append(s)
        elif c == 0x3C:  # < — hex string (<< dict start is skipped)
            if i + 1 < n and content[i + 1] == 0x3C:
                i += 2
            else:
                s, i = _parse_hex(content, i)
                cur.append(s)
        elif c == 0x5B:  # [ — a TJ array may follow
            in_tj_array = True
            i += 1
        elif c == 0x5D:  # ]
            in_tj_array = False
            i += 1
        elif c == 0x25:  # % comment to EOL
            j = content.find(b"\n", i)
            i = n if j < 0 else j + 1
        else:
            m = re.match(rb"[A-Za-z'\"*]+", content[i:i + 8])
            if m:
                op = m.group(0)
                if op in (b"Tj", b"TJ"):
                    line.extend(cur)
                elif op in (b"'", b'"'):
                    endline()
                    line.extend(cur)
                elif op in (b"Td", b"TD", b"T*"):
                    endline()
                elif op == b"ET":
                    endline()
                # any operator consumes the pending strings: they were
                # its arguments (shown above for text ops, dropped else)
                cur = []
                i += len(op)
            else:
                i += 1
    endline()
    return [r for r in runs if r]


def pdf_to_text(data: bytes) -> str:
    """Extract the text of a simple PDF, newline-joined in stream order.

    Raises PdfError when the file is not a PDF or no stream parses —
    the caller maps that to the reference's http 415 conversion-failure
    row, never a silent empty success."""
    if not data.startswith(b"%PDF-"):
        raise PdfError("not a PDF (missing %PDF- header)")
    runs: list[str] = []
    saw_stream = False
    for _num, head, raw in _iter_objects(data):
        if raw is None:
            continue
        decoded = _decode_stream(head, raw)
        if decoded is None:
            continue
        # only tokenize streams that look like page content
        if b"BT" not in decoded and b"Tj" not in decoded \
                and b"TJ" not in decoded:
            continue
        saw_stream = True
        runs.extend(_extract_from_content(decoded))
    if not runs and not saw_stream:
        raise PdfError("no parseable content stream")
    return "\n".join(runs)


# ---------------------------------------------------------------------------
# Minimal deterministic PDF writer — test fixture generator only (the
# engine never writes PDFs); one page, Flate-compressed content stream.
# ---------------------------------------------------------------------------
def make_pdf(lines: list[str], compress: bool = True) -> bytes:
    """A valid single-page PDF showing ``lines`` with Tj, one per line."""
    def esc(s: str) -> str:
        return s.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")

    content = b"BT /F1 12 Tf 72 720 Td " + b" ".join(
        b"(%s) Tj 0 -14 Td" % esc(ln).encode("latin-1") for ln in lines
    ) + b" ET"
    if compress:
        body = zlib.compress(content)
        filt = b"/Filter /FlateDecode "
    else:
        body, filt = content, b""
    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        b"/Contents 4 0 R /Resources << /Font << /F1 5 0 R >> >> >>",
        b"<< " + filt + b"/Length %d >>\nstream\n" % len(body) + body
        + b"\nendstream",
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
    ]
    out = bytearray(b"%PDF-1.4\n")
    offsets = []
    for i, o in enumerate(objs, start=1):
        offsets.append(len(out))
        out += b"%d 0 obj\n" % i + o + b"\nendobj\n"
    xref_at = len(out)
    out += b"xref\n0 %d\n" % (len(objs) + 1)
    out += b"0000000000 65535 f \n"
    for off in offsets:
        out += b"%010d 00000 n \n" % off
    out += (b"trailer\n<< /Size %d /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF\n"
            % (len(objs) + 1, xref_at))
    return bytes(out)
