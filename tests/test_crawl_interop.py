"""Differential tests for the crawl/MIME parsers against INDEPENDENT
implementations (Python stdlib: urllib, html, quopri, email) plus
hypothesis roundtrip properties — the GIF foreign-encoder lesson
applied to the ingestion layer: our parser and a second, unrelated
implementation must agree on the same bytes, so a shared
misunderstanding of the spec can't hide behind a self-roundtrip."""

from __future__ import annotations

import quopri
from email import message_from_bytes
from email.header import decode_header, make_header
from html import unescape as stdlib_unescape
from urllib.parse import urljoin

from hypothesis import HealthCheck, given, settings, strategies as st

from sparkga1_spark.operators.crawl import (
    _decode_entities,
    _entity_encode_positions,
    build_html,
    build_warc,
    extract_html,
    parse_warc,
    resolve_url,
)
from sparkga1_spark.operators.mime import _qp_decode, _qp_encode, build_mime, parse_mime
from sparkga1_spark.operators.pdfdoc import build_pdf, extract_pdf_text

SETTINGS = settings(
    max_examples=60,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

WORDS = st.lists(
    st.text(alphabet="abcdefghijklmnopqrstuvwxyz0123456789", min_size=1, max_size=10),
    min_size=3,
    max_size=40,
)


def test_resolve_url_agrees_with_urljoin():
    bases = [
        "https://h.example.com/doc/5/0",
        "http://x.org/a/b/c",
        "https://h.example.com/",
    ]
    hrefs = [
        "/abs", "rel", "rel/deeper", "//other.com/x", "http://third.com/y",
        "/p#frag", "q?a=1&b=2", "",
    ]
    for base in bases:
        for href in hrefs:
            ours = resolve_url(base, href)
            theirs = urljoin(base, href.split("#", 1)[0])
            assert ours == theirs, (base, href, ours, theirs)


def test_entity_decode_agrees_with_stdlib():
    cases = [
        "a &amp; b", "&lt;x&gt;", "&quot;q&quot; &apos;a&apos;",
        "&#65;&#x42;&#x6a;", "mixed &amp;#65; literal",
        "no entities at all", "&#97;&#98;&#99;",
    ]
    for s in cases:
        assert _decode_entities(s) == stdlib_unescape(s), s
    # documented divergences: nbsp maps to a plain space for corpus text
    # (stdlib gives U+00A0), and unknown entities stay literal in both
    assert _decode_entities("a&nbsp;b") == "a b"
    assert stdlib_unescape("a&nbsp;b") == "a\xa0b"
    assert _decode_entities("&bogus;") == stdlib_unescape("&bogus;") == "&bogus;"


@given(words=WORDS)
@SETTINGS
def test_positional_entity_encoding_roundtrips(words):
    s = " ".join(words)
    enc = _entity_encode_positions(s)
    assert _decode_entities(enc) == s
    assert stdlib_unescape(enc) == s  # stdlib agrees on our encoding


@given(words=WORDS, doc_id=st.integers(min_value=0, max_value=40))
@SETTINGS
def test_html_roundtrip_property(words, doc_id):
    text = " ".join(words)
    title, main, links, dropped = extract_html(build_html(doc_id, text))
    assert title == f'doc "{doc_id}"'
    assert main == f"heading {doc_id} {text}"
    assert links == 4 + doc_id % 3 and dropped == 1


@given(
    s=st.text(
        alphabet="abcdefghijklmnopqrstuvwxyz =._-0123456789", min_size=0,
        max_size=200,
    )
)
@SETTINGS
def test_qp_decode_agrees_with_quopri(s):
    enc = _qp_encode(s).encode()
    ours = _qp_decode(enc)
    theirs = quopri.decodestring(enc)
    assert ours == theirs == s.encode()


UNICODE_WORDS = st.lists(
    st.text(alphabet="abcdefghijklmnopqrstuvwxyz0123456789éüñß€中",
            min_size=1, max_size=10),
    min_size=3,
    max_size=40,
)


@given(words=UNICODE_WORDS, doc_id=st.integers(min_value=0, max_value=24))
@SETTINGS
def test_mime_agrees_with_stdlib_email(words, doc_id):
    """The stdlib email package is a full independent RFC 2045/2047
    implementation: subjects, unfolded froms, and decoded part
    payloads must match ours exactly — INCLUDING non-ASCII corpus
    text through the octet-based QP path (the review-caught encoding
    bug lived exactly in the gap this alphabet now covers)."""
    text = " ".join(words)
    raw = build_mime(doc_id, text)
    ours = parse_mime(raw)
    theirs = message_from_bytes(raw)
    assert ours["subject"] == str(make_header(decode_header(theirs["Subject"])))
    assert ours["from"] == " ".join(theirs["From"].split())
    their_parts = [
        (p.get_content_type(), p.get_payload(decode=True))
        for p in theirs.walk()
        if not p.is_multipart()
    ]
    assert [(t, b) for t, b, _cs in ours["parts"]] == their_parts


@given(words=WORDS, doc_id=st.integers(min_value=0, max_value=24))
@SETTINGS
def test_warc_roundtrip_property(words, doc_id):
    text = " ".join(words)
    for gz in (False, True):
        recs = parse_warc(build_warc(doc_id, "s", text, gzip_members=gz))
        assert len(recs) == 1 + 2 * (doc_id % 3 + 1)
        for r in range(doc_id % 3 + 1):
            assert recs[2 + 2 * r]["payload"].decode() == f"{text} r{r}"


@given(words=WORDS, doc_id=st.integers(min_value=0, max_value=24))
@SETTINGS
def test_pdf_roundtrip_property(words, doc_id):
    text = " ".join(words)
    n = doc_id % 3 + 1
    got, n_pages = extract_pdf_text(
        build_pdf(doc_id, text, flate=doc_id % 2 == 1, n_pages=n)
    )
    assert n_pages == n
    exp = " ".join(
        (" ".join(words[p::n]) + f" marker ({doc_id}) p{p} A\\B octal: A")
        if words[p::n]
        else f"marker ({doc_id}) p{p} A\\B octal: A"
        for p in range(n)
    )
    assert got == exp


def test_dsir_importance_separates_target(spark):
    """The DSIR invariant that makes the weights USEFUL, not just
    deterministic: documents from the target slice must score a higher
    mean log importance ratio than background documents (their tokens
    are, by construction, more probable under the target LM). A
    sign/ratio bug that still hashed consistently would pass the
    oracle row; this audit pins the semantics."""
    from sparkga1_spark.plans.registry import all_queries

    df = all_queries()["x_dsir_importance"](spark, "/root/testdata/sf0.01")
    rows = df.groupBy("is_target").avg("avg_log_ratio").collect()
    means = {r[0]: r[1] for r in rows}
    assert set(means) == {True, False}
    assert means[True] > means[False], means
    assert means[True] > 0 > means[False], (
        "target docs should be MORE probable under the target LM, "
        f"background less: {means}"
    )
