"""From-scratch PDF text extraction (M22 conversion path,
reference src/local_indexer/local_indexer.cc:98-131 forks pdftotext)."""

import zlib

import pytest

from mycelium_ray.functions.pdftext import (PdfError, make_pdf,
                                            pdf_to_text)


def test_roundtrip_compressed():
    lines = ["Hello World", "second line", "third"]
    assert pdf_to_text(make_pdf(lines)) == "\n".join(lines)


def test_roundtrip_uncompressed():
    assert pdf_to_text(make_pdf(["plain"], compress=False)) == "plain"


def test_escapes_and_latin1():
    lines = ["parens (nested (deep)) ok",
             "back\\slash and tab\there",
             "caf\xe9 na\xefve \xdcber"]
    assert pdf_to_text(make_pdf(lines)) == "\n".join(lines)


def test_octal_and_hex_strings():
    # hand-built content stream: octal escape + hex string via TJ
    content = b"BT (A\\101B) Tj 0 -14 Td [<48656C6C6F> (!)] TJ ET"
    body = zlib.compress(content)
    pdf = (b"%PDF-1.4\n1 0 obj\n<< /Filter /FlateDecode /Length "
           + str(len(body)).encode() + b" >>\nstream\n" + body
           + b"\nendstream\nendobj\n%%EOF\n")
    assert pdf_to_text(pdf) == "AAB\nHello!"


def test_tj_array_concatenates():
    content = b"BT [(Hel) -20 (lo)] TJ ET"
    pdf = (b"%PDF-1.4\n1 0 obj\n<< /Length " + str(len(content)).encode()
           + b" >>\nstream\n" + content + b"\nendstream\nendobj\n")
    assert pdf_to_text(pdf) == "Hello"


def test_quote_ops_newline():
    content = b"BT (a) Tj (b) ' (c) \" ET"
    pdf = (b"%PDF-1.4\n1 0 obj\n<< /Length " + str(len(content)).encode()
           + b" >>\nstream\n" + content + b"\nendstream\nendobj\n")
    assert pdf_to_text(pdf) == "a\nb\nc"


def test_non_text_operands_dropped():
    # the string is an argument to a non-text operator -> not shown
    content = b"BT (shown) Tj ET (not text) SomeOp"
    pdf = (b"%PDF-1.4\n1 0 obj\n<< /Length " + str(len(content)).encode()
           + b" >>\nstream\n" + content + b"\nendstream\nendobj\n")
    assert pdf_to_text(pdf) == "shown"


def test_not_a_pdf_raises():
    with pytest.raises(PdfError):
        pdf_to_text(b"plain text file")


def test_no_content_raises():
    with pytest.raises(PdfError):
        pdf_to_text(b"%PDF-1.4\nnothing here\n%%EOF")


def test_corrupt_flate_raises():
    pdf = (b"%PDF-1.4\n1 0 obj\n<< /Filter /FlateDecode /Length 8 >>\n"
           b"stream\nXXXXXXXX\nendstream\nendobj\n")
    with pytest.raises(PdfError):
        pdf_to_text(pdf)


def test_other_filter_skipped():
    # a DCTDecode (jpeg) stream must be skipped, not crash the parser
    pdf = (b"%PDF-1.4\n1 0 obj\n<< /Filter /DCTDecode /Length 4 >>\n"
           b"stream\n\xff\xd8\xff\xd9\nendstream\nendobj\n"
           b"2 0 obj\n<< /Length 15 >>\nstream\nBT (ok) Tj ET\nendstream\n"
           b"endobj\n")
    assert pdf_to_text(pdf) == "ok"


def test_indexer_pdf_path(ray_session, tmp_path):
    """Local indexer converts .pdf files (200 + text) and records 415 on
    conversion failure — the reference's exact contract."""
    from mycelium_ray.sources.files import index_directory
    (tmp_path / "doc.pdf").write_bytes(make_pdf(["alpha", "beta"]))
    (tmp_path / "broken.pdf").write_bytes(b"%PDF-1.4\nbroken")
    df = index_directory(str(tmp_path)).to_pandas()
    assert len(df) == 2
    ok = df[df["http_code"] == 200].iloc[0]
    bad = df[df["http_code"] == 415].iloc[0]
    assert ok["path"].endswith("doc.pdf")
    assert ok["text"] == "alpha\nbeta" and ok["fmt"] == "pdf"
    assert bad["path"].endswith("broken.pdf") and "reason" in bad["error"]
