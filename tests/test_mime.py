"""MIME parsing invariants: header folding, encoded-words, boundary
framing, QP/base64 decode, and refusals."""

from __future__ import annotations

import base64

import pytest

from sparkga1_spark.operators.mime import (
    _qp_decode,
    _qp_encode,
    build_mime,
    parse_mime,
)


def test_mime_roundtrip_both_subject_forms():
    text = "the quick brown fox jumps over the lazy dog " * 3
    text = text.strip()
    for d in range(6):
        msg = parse_mime(build_mime(d, text))
        assert msg["subject"] == f"Doc {d} résumé"
        assert msg["from"] == f"Crawl Bot <bot@src{d % 20}.example.com>"
        (t1, b1, cs1), (t2, b2, cs2) = msg["parts"]
        assert t1 == "text/plain" and b1.decode() == text and cs1 == "utf-8"
        assert t2 == "text/html" and b2.decode() == f"<p>{text}</p>"


def test_qp_roundtrip_and_soft_breaks():
    s = "equals = sign and words " * 10
    enc = _qp_encode(s)
    assert "=\r\n" in enc, "soft line breaks must appear"
    assert "=3D" in enc, "'=' must be escaped"
    assert max(len(ln) for ln in enc.split("=\r\n")) <= 43
    assert _qp_decode(enc.encode()).decode() == s
    with pytest.raises(ValueError, match="quoted-printable"):
        _qp_decode(b"bad =ZZ escape")


def test_encoded_word_forms():
    from sparkga1_spark.operators.mime import _decode_encoded_words

    assert _decode_encoded_words("=?utf-8?Q?a_b=C3=A9c?=") == "a béc"
    b64 = base64.b64encode("héllo".encode()).decode()
    assert _decode_encoded_words(f"=?UTF-8?B?{b64}?=") == "héllo"
    # plain text around tokens survives; unknown charset refuses
    assert _decode_encoded_words("pre =?utf-8?Q?x?= post") == "pre x post"
    with pytest.raises(ValueError, match="charset"):
        _decode_encoded_words("=?klingon?Q?x?=")
    with pytest.raises(ValueError, match="base64"):
        _decode_encoded_words("=?utf-8?B?!!!?=")


def test_boundary_framing_preamble_epilogue():
    """Preamble and epilogue are NOT parts; a missing terminator
    refuses; a boundary-like string INSIDE a QP body does not split
    the part (it never starts a line after CRLF split on the real
    delimiter)."""
    msg = parse_mime(build_mime(4, "alpha bravo"))
    assert len(msg["parts"]) == 2  # preamble/epilogue dropped
    raw = build_mime(4, "alpha bravo").decode()
    with pytest.raises(ValueError, match="terminator"):
        parse_mime(raw.split("------=_bnd_4--")[0].encode())
    with pytest.raises(ValueError, match="boundary"):
        parse_mime(
            b"Content-Type: multipart/mixed\r\n\r\n--x\r\n\r\nb\r\n--x--\r\n"
        )


def test_header_folding_and_refusals():
    from sparkga1_spark.operators.mime import _parse_headers

    h = _parse_headers(b"A: one\r\n two\r\nB: x\r\n\tthree four")
    assert h == {"a": "one two", "b": "x three four"}
    with pytest.raises(ValueError, match="continuation"):
        _parse_headers(b" leading fold with no header")
    with pytest.raises(ValueError, match="malformed"):
        _parse_headers(b"no colon here")
    with pytest.raises(ValueError, match="separator"):
        parse_mime(b"Subject: x")
    with pytest.raises(ValueError, match="transfer encoding"):
        parse_mime(
            b"Content-Type: text/plain\r\n"
            b"Content-Transfer-Encoding: uuencode\r\n\r\nbody"
        )


def test_page_meta_extraction_discipline():
    from sparkga1_spark.operators.crawl import build_html, extract_page_meta

    og, desc, canon = extract_page_meta(build_html(11, "a b c"))
    assert og == "OG doc 11"
    assert desc == "summary & notes 2"  # entity-decoded '&'
    assert canon == "/doc/11/canonical"
    # meta inside comments or scripts never counts; single quotes work
    html = (
        "<!-- <meta property='og:title' content='ghost'> -->"
        "<script>var s = '<meta name=description content=js>';</script>"
        "<meta property='og:title' content='real'>"
    )
    assert extract_page_meta(html) == ("real", None, None)
    assert extract_page_meta("") == (None, None, None)


def test_boundary_sequence_mid_line_is_data():
    """RFC 2046 §5.1.1: a delimiter exists only at a LINE START
    (CRLF--boundary); the same bytes mid-line are part data. A naive
    body.split('--boundary') corrupts exactly this case."""
    body = (
        "preamble\r\n"
        "--bnd\r\n"
        "Content-Type: text/plain\r\n\r\n"
        "data with --bnd mid-line stays\r\n"
        "--bnd--\r\n"
        "epilogue"
    )
    raw = ('Content-Type: multipart/mixed; boundary="bnd"\r\n\r\n' + body).encode()
    msg = parse_mime(raw)
    assert msg["parts"] == [("text/plain", b"data with --bnd mid-line stays",
                             None)]
    # trailing junk on a delimiter line refuses (mis-framed message)
    bad = raw.replace(b"--bnd\r\nContent-Type", b"--bnd junk\r\nContent-Type")
    with pytest.raises(ValueError, match="boundary line"):
        parse_mime(bad)


def test_qp_encode_is_octet_based():
    """QP is an OCTET encoding: non-ASCII text must escape its UTF-8
    bytes (=C3=A9), never its codepoint (=E9 mixes encodings, =20AC is
    structurally invalid) — review-caught; the whole mime roundtrip
    must survive non-ASCII corpus text."""
    from sparkga1_spark.operators.mime import extract_mime  # noqa: F401

    s = "aaaaaaaé and € too"
    enc = _qp_encode(s)
    assert all(ord(c) < 128 for c in enc), "QP output must be pure ASCII"
    assert _qp_decode(enc.encode()).decode("utf-8") == s
    msg = parse_mime(build_mime(2, s))
    assert msg["parts"][0][1].decode("utf-8") == s
    # stdlib agreement on the non-ASCII payload too
    import quopri

    assert quopri.decodestring(enc.encode()).decode("utf-8") == s


def test_qp_decode_truncated_escape_refuses():
    with pytest.raises(ValueError, match="truncated quoted-printable"):
        _qp_decode(b"abc=3")
    with pytest.raises(ValueError, match="truncated quoted-printable"):
        _qp_decode(b"abc=")


def test_review2_mime_robustness():
    """Second review pass: media types and parameter NAMES are
    case-insensitive (RFC 2045); transport padding after a boundary
    is legal (RFC 2046 §5.1.1); the text/plain part decodes in its
    DECLARED charset (hardcoded utf-8 crashed on latin-1 mail)."""
    from sparkga1_spark.operators.crawl import decode_http_body

    raw = build_mime(4, "a b c d").replace(
        b"Content-Type: multipart/alternative; boundary=",
        b"Content-Type: Multipart/Alternative; BOUNDARY=",
    )
    assert len(parse_mime(raw)["parts"]) == 2
    padded = build_mime(4, "a b c d").replace(
        b"----=_bnd_4\r\nContent-Type: text/plain",
        b"----=_bnd_4 \t\r\nContent-Type: text/plain",
    )
    assert len(parse_mime(padded)["parts"]) == 2
    latin = (
        'Content-Type: multipart/mixed; boundary="b"\r\n\r\n'
        "--b\r\nContent-Type: text/plain; charset=iso-8859-1\r\n\r\n"
    ).encode() + "résumé".encode("latin-1") + b"\r\n--b--\r\n"
    ctype, body, cs = parse_mime(latin)["parts"][0]
    assert (ctype, cs) == ("text/plain", "iso-8859-1")
    assert decode_http_body(body, f"text/plain; charset={cs}")[0] == "résumé"
