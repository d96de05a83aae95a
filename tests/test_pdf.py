"""PDF extraction invariants beyond the oracle row: string-literal
escape semantics, /Length-authoritative stream framing, page-tree
walking, and structural refusals."""

from __future__ import annotations

import zlib

import pytest

from sparkga1_spark.operators.pdfdoc import (
    build_pdf,
    extract_content_text,
    extract_pdf_text,
)


def test_pdf_roundtrip_pages_and_flate():
    text = "alpha bravo charlie delta echo foxtrot golf hotel india juliet"
    words = text.split()
    for d in range(9):
        n = d % 3 + 1
        got, n_pages = extract_pdf_text(
            build_pdf(d, text, flate=d % 2 == 1, n_pages=n)
        )
        assert n_pages == n
        exp = " ".join(
            " ".join(words[p::n]) + f" marker ({d}) p{p} A\\B octal: A"
            for p in range(n)
        )
        assert got == exp, d


def test_pdf_string_escape_semantics():
    # octal stops at 3 digits: \1011 is 'A' + '1'; \12 is LF (2 digits)
    assert extract_content_text(rb"BT (\1011) Tj ET") == ["A1"]
    assert extract_content_text(rb"BT (a\12b) Tj ET") == ["a\nb"]
    # escaped newline is a line continuation (no char)
    assert extract_content_text(b"BT (a\\\nb) Tj ET") == ["ab"]
    assert extract_content_text(b"BT (a\\\r\nb) Tj ET") == ["ab"]
    # unknown escape: the char stands for itself
    assert extract_content_text(rb"BT (a\zb) Tj ET") == ["azb"]
    # balanced unescaped parens are legal inside strings
    assert extract_content_text(b"BT (a (b (c)) d) Tj ET") == ["a (b (c)) d"]
    # all three show operators + hex
    assert extract_content_text(
        b"BT (x) Tj [(y) -120 (z)] TJ (w) ' <4142> Tj ET"
    ) == ["x", "y", "z", "w", "AB"]
    # strings outside BT/ET never count; "<<" dict-open is not a hex string
    assert extract_content_text(b"(no) Tj BT << /X (dict) >> (yes) Tj ET") == [
        "yes"
    ]
    with pytest.raises(ValueError, match="unterminated string"):
        extract_content_text(b"BT (never closed Tj ET")
    with pytest.raises(ValueError, match="unterminated hex"):
        extract_content_text(b"BT <4142 Tj ET")


def test_pdf_stream_length_is_authoritative():
    """A stream whose body CONTAINS the literal 'endstream' bytes (and
    an 'endobj') must be framed by /Length, never by marker search —
    the classic shortcut that corrupts real PDFs."""
    body = b"BT (before) Tj ET\n% endstream endobj trap\nBT (after) Tj ET"
    pdf = (
        b"%PDF-1.4\n"
        b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
        b"2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n"
        b"3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>\nendobj\n"
        b"4 0 obj\n<< /Length " + str(len(body)).encode() + b" >>\nstream\n"
        + body + b"\nendstream\nendobj\n"
    )
    text, n_pages = extract_pdf_text(pdf)
    assert text == "before after" and n_pages == 1


def test_pdf_nested_page_tree_order():
    """Kids may be intermediate /Pages nodes; extraction follows tree
    order depth-first."""
    def page(num, cnum):
        return (
            f"{num} 0 obj\n<< /Type /Page /Contents {cnum} 0 R >>\nendobj\n"
        ).encode()

    def content(num, s):
        b = f"BT ({s}) Tj ET".encode()
        return (
            f"{num} 0 obj\n<< /Length {len(b)} >>\nstream\n".encode()
            + b + b"\nendstream\nendobj\n"
        )

    pdf = (
        b"%PDF-1.4\n"
        b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
        b"2 0 obj\n<< /Type /Pages /Kids [10 0 R 5 0 R] /Count 3 >>\nendobj\n"
        b"10 0 obj\n<< /Type /Pages /Kids [3 0 R 4 0 R] /Count 2 >>\nendobj\n"
        + page(3, 6) + page(4, 7) + page(5, 8)
        + content(6, "one") + content(7, "two") + content(8, "three")
    )
    text, n_pages = extract_pdf_text(pdf)
    assert text == "one two three" and n_pages == 3


def test_pdf_refusals():
    good = build_pdf(1, "a b c", flate=True)
    with pytest.raises(ValueError, match="bad magic"):
        extract_pdf_text(b"not a pdf")
    with pytest.raises(ValueError, match="never ends"):
        extract_pdf_text(b"%PDF-1.4\n1 0 obj\n<< >>")
    with pytest.raises(ValueError, match="no document catalog"):
        extract_pdf_text(b"%PDF-1.4\n1 0 obj\n<< /X 1 >>\nendobj\n")
    # stream shorter than /Length
    bad = good.replace(b"/Length ", b"/Length 9", 1)
    with pytest.raises(ValueError):
        extract_pdf_text(bad)
    # corrupt Flate bytes
    at = good.find(b"stream\n") + 7
    corrupt = good[:at] + b"\xff\xff" + good[at + 2 :]
    with pytest.raises(ValueError):
        extract_pdf_text(corrupt)
    # a page-tree cycle refuses instead of recursing forever
    cyc = (
        b"%PDF-1.4\n"
        b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
        b"2 0 obj\n<< /Type /Pages /Kids [2 0 R] /Count 1 >>\nendobj\n"
    )
    with pytest.raises(ValueError, match="too deep"):
        extract_pdf_text(cyc)
    # a Flate bomb refuses at the inflate bound
    bomb_raw = zlib.compress(b"\x00" * (1 << 27), 9)
    bomb = (
        b"%PDF-1.4\n"
        b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
        b"2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n"
        b"3 0 obj\n<< /Type /Page /Contents 4 0 R >>\nendobj\n"
        b"4 0 obj\n<< /Length " + str(len(bomb_raw)).encode()
        + b" /Filter /FlateDecode >>\nstream\n" + bomb_raw
        + b"\nendstream\nendobj\n"
    )
    with pytest.raises(ValueError, match="inflate bound"):
        extract_pdf_text(bomb)


def test_pdf_truncated_flate_refuses():
    """A truncated FlateDecode stream inflates silently to a PREFIX —
    that is corrupt text entering the corpus, so it must refuse
    (review-caught; the WARC gzip walker had the d.eof check, the PDF
    path didn't)."""
    import zlib as _z

    content = b"BT /F1 12 Tf (hello) Tj (world) Tj ET"
    flate = _z.compress(content, 9)
    cut = flate[:-5]
    pdf = (
        b"%PDF-1.4\n"
        b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
        b"2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n"
        b"3 0 obj\n<< /Type /Page /Contents 4 0 R >>\nendobj\n"
        b"4 0 obj\n<< /Length " + str(len(cut)).encode()
        + b" /Filter /FlateDecode >>\nstream\n" + cut
        + b"\nendstream\nendobj\n"
    )
    with pytest.raises(ValueError, match="truncated Flate"):
        extract_pdf_text(pdf)


def test_review2_pdf_contents_forms():
    """Second review pass: /Contents arrays concatenate in order (ISO
    32000 §7.7.3.3 — real writers emit them; silently dropping the
    page was data loss), and the indirect '/Length N 0 R' form
    REFUSES instead of misframing the stream as length N."""
    pdf = (
        b"%PDF-1.4\n"
        b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
        b"2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n"
        b"3 0 obj\n<< /Type /Page /Contents [4 0 R 5 0 R] >>\nendobj\n"
        b"4 0 obj\n<< /Length 14 >>\nstream\nBT (one) Tj ET\nendstream\nendobj\n"
        b"5 0 obj\n<< /Length 14 >>\nstream\nBT (two) Tj ET\nendstream\nendobj\n"
    )
    assert extract_pdf_text(pdf) == ("one two", 1)
    ind = (
        b"%PDF-1.4\n"
        b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
        b"2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n"
        b"3 0 obj\n<< /Type /Page /Contents 4 0 R >>\nendobj\n"
        b"4 0 obj\n<< /Length 9 0 R >>\nstream\nBT (x) Tj ET\nendstream\nendobj\n"
    )
    with pytest.raises(ValueError, match="indirect /Length"):
        extract_pdf_text(ind)
