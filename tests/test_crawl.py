"""WARC framing + HTML tokenizer invariants beyond what the oracle
rows certify: refusal paths, gzip member accounting, and the
adversarial HTML shapes (quoted '>', raw-text script content, entity
forms) a naive extractor silently corrupts."""

from __future__ import annotations

import zlib

import pytest

from sparkga1_spark.operators.crawl import (
    build_html,
    build_warc,
    extract_html,
    parse_warc,
)


def test_warc_roundtrip_plain_and_gzip_members():
    text = "alpha bravo charlie delta echo"
    for d in range(8):
        for gz in (False, True):
            recs = parse_warc(build_warc(d, f"src{d}", text, gzip_members=gz))
            assert len(recs) == 1 + 2 * (d % 3 + 1)
            assert all(r["compressed"] is gz for r in recs)
            resp0 = recs[2]
            assert resp0["payload"].decode() == f"{text} r0"
            assert resp0["http_status"] == (404 if d % 5 == 0 else 200)


def test_warc_gzip_member_boundaries_are_strict():
    """One member per record is the .warc.gz contract: a member
    holding two records refuses, junk between members refuses, and a
    truncated member refuses — never a silently short record list."""
    plain = build_warc(2, "s", "w x y z", gzip_members=False)
    recs = parse_warc(plain)
    assert len(recs) == 7  # doc 2: warcinfo + 3 pairs

    def gz(b: bytes) -> bytes:
        co = zlib.compressobj(9, zlib.DEFLATED, 31)
        return co.compress(b) + co.flush()

    # the whole plain file as ONE member = many records in one member
    with pytest.raises(ValueError, match="more than one record"):
        parse_warc(gz(plain))
    ok = build_warc(3, "s", "w", gzip_members=True)
    with pytest.raises(ValueError, match="junk between gzip members"):
        parse_warc(ok + b"garbage")
    with pytest.raises(ValueError, match="truncated gzip member"):
        parse_warc(ok[:-3])


def test_warc_framing_refusals():
    good = build_warc(1, "s", "a b c", gzip_members=False)
    with pytest.raises(ValueError, match="bad version line"):
        parse_warc(b"HTTP/1.1 200 OK\r\n\r\n")
    # break the Content-Length framing: shrink the first block by one
    idx = good.find(b"Content-Length: ")
    end = good.find(b"\r\n", idx)
    n = int(good[idx + 16 : end])
    broken = good[:idx] + f"Content-Length: {n - 1}".encode() + good[end:]
    with pytest.raises(ValueError, match="separator missing"):
        parse_warc(broken)
    with pytest.raises(ValueError, match="Content-Length"):
        parse_warc(b"WARC/1.0\r\nWARC-Type: response\r\n\r\nbody\r\n\r\n")


def test_warc_http_split_and_status_parse():
    recs = parse_warc(build_warc(0, "s", "one two", gzip_members=False))
    req = recs[1]
    assert req["http_status"] is None and req["payload"] == b""
    # a response block with no head/body split refuses
    bad = (
        b"WARC/1.0\r\nWARC-Type: response\r\n"
        b"Content-Type: application/http;msgtype=response\r\n"
        b"Content-Length: 17\r\n\r\nHTTP/1.1 200 OK\r\n\r\n\r\n"
    )
    with pytest.raises(ValueError, match="no header/body split"):
        parse_warc(bad)


def test_html_roundtrip_exact_text():
    """The planted page must give back the document text EXACTLY:
    entities decoded, boilerplate gone, script/style content gone."""
    text = "the quick brown fox jumps over the lazy dog again and again"
    for d in (0, 1, 2, 5, 14):
        title, main, links, dropped = extract_html(build_html(d, text))
        assert title == f'doc "{d}"'
        assert main == f"heading {d} {text}"
        assert links == 4 + d % 3
        assert dropped == 1  # the link-only div


def test_html_tokenizer_adversarial_shapes():
    # quoted '>' inside an attribute must not close the tag
    _, m, links, _ = extract_html(
        '<body><p>before <a href="/x" title="a>b">link</a> after</p></body>'
    )
    assert m == "before link after" and links == 1
    # script raw-text: markup inside a JS string is data, not tags
    _, m, _, _ = extract_html(
        "<body><p>keep</p><script>if (1<2) { document.write(\"<p>no</p>\"); }"
        "</script><p>tail</p></body>"
    )
    assert m == "keep tail"
    # style raw-text with a child combinator '>'
    _, m, _, _ = extract_html(
        "<body><style>div > p { color: red; }</style><p>only</p></body>"
    )
    assert m == "only"
    # entity forms: named, decimal, hex, unknown-kept-literal, nbsp
    _, m, _, _ = extract_html(
        "<body><p>&lt;tag&gt; &amp; &#65;&#x42; &bogus; a&nbsp;b</p></body>"
    )
    assert m == "<tag> & AB &bogus; a b"
    # comments and doctype are ignored
    _, m, _, _ = extract_html(
        "<!DOCTYPE html><body><!-- <p>ghost</p> --><p>real</p></body>"
    )
    assert m == "real"


def test_html_link_density_boundary():
    # exactly 80% link text drops; below keeps ("12345" link + " abc")
    _, m, _, dropped = extract_html(
        '<body><div><a href="/x">12345</a>2345</div></body>'
    )
    assert m == "123452345" and dropped == 0  # 5/9 < 0.8
    _, m, _, dropped = extract_html(
        '<body><div><a href="/x">12345678</a>12</div></body>'
    )
    assert m == "" and dropped == 1  # 8/10 >= 0.8
    # nav containers drop regardless of density; nested blocks resume
    _, m, _, _ = extract_html(
        "<body><nav><p>menu text menu text</p></nav><p>content</p></body>"
    )
    assert m == "content"


def test_html_empty_and_degenerate():
    assert extract_html("") == (None, "", 0, 0)
    assert extract_html("plain text no tags") == (None, "plain text no tags", 0, 0)
    # unterminated tag at EOF: text before it survives
    _, m, _, _ = extract_html("<body><p>ok</p><a href=")
    assert m == "ok"


def test_robots_rfc9309_precedence():
    """Group selection (most-specific UA prefix), longest-path-match,
    allow-wins-ties, '*' wildcards, '$' anchors, no-rule-allows."""
    from sparkga1_spark.operators.crawl import robots_allowed

    R = (
        "# policy\n"
        "User-agent: sparkga1-crawler\n"
        "Disallow: /private/\n"
        "Allow: /private/ok/\n"
        "Disallow: /*.pdf$\n"
        "Allow: /doc/\n\n"
        "User-agent: *\n"
        "Disallow: /\n"
    )
    ua = "sparkga1-crawler"
    assert robots_allowed(R, ua, "/doc/123")
    assert not robots_allowed(R, ua, "/private/x")
    assert robots_allowed(R, ua, "/private/ok/x")  # longer allow wins
    assert not robots_allowed(R, ua, "/doc/file.pdf")  # anchored wildcard
    assert robots_allowed(R, ua, "/doc/file.pdfx")  # anchor must END
    assert robots_allowed(R, ua, "/elsewhere")  # no matching rule
    assert not robots_allowed(R, "randombot", "/anything")  # '*' group
    # length tie → allow wins
    assert robots_allowed("User-agent: *\nDisallow: /a/\nAllow: /a/*\n", ua, "/a/x")
    # most-specific agent group REPLACES shorter groups (not additive)
    G = (
        "User-agent: spark\nDisallow: /s\n"
        "User-agent: sparkga1\nDisallow: /g\n"
        "User-agent: *\nDisallow: /\n"
    )
    assert not robots_allowed(G, ua, "/g")
    assert robots_allowed(G, ua, "/s")
    # consecutive user-agent lines share one group
    M = "User-agent: a\nUser-agent: sparkga1\nDisallow: /m\n"
    assert not robots_allowed(M, ua, "/m")
    # empty Disallow (the 'allow everything' idiom) matches nothing
    assert robots_allowed("User-agent: *\nDisallow:\n", ua, "/x")


def test_charset_decode_paths_and_refusals():
    from sparkga1_spark.operators.crawl import decode_http_body

    s = "héllo wörld ünïcode"
    assert decode_http_body(s.encode("utf-8"), "text/html; charset=utf-8") == (
        s, "utf-8", True,
    )
    assert decode_http_body(
        s.encode("latin-1"), "text/html; charset=iso-8859-1"
    ) == (s, "iso-8859-1", True)
    assert decode_http_body(s.encode("utf-16le"), "charset=UTF-16LE") == (
        s, "utf-16le", True,
    )
    # sniff: valid utf-8 wins; invalid utf-8 falls back to latin-1
    assert decode_http_body(s.encode("utf-8"), "text/html") == (s, "utf-8", False)
    assert decode_http_body(s.encode("latin-1"), None) == (s, "latin-1", False)
    with pytest.raises(ValueError, match="unsupported declared"):
        decode_http_body(b"x", "text/html; charset=klingon")
    with pytest.raises(ValueError, match="declared charset"):
        decode_http_body(s.encode("latin-1"), "charset=utf-8")


def test_streaming_warc_ingest(spark, tmp_path):
    """The crawl arrival path as a STREAM: .warc.gz files land in a
    directory, a binaryFile source drains them incrementally
    (maxFilesPerTrigger=2 ⇒ two micro-batches for four files), and the
    same strict record parse runs per micro-batch — record counts
    match the batch parse of the same files exactly."""
    import pyspark.sql.functions as F

    from sparkga1_spark.operators.crawl import build_warc, parse_warc_records

    src = tmp_path / "warcs"
    src.mkdir()
    expected = 0
    for d in range(4):
        data = build_warc(d, f"src{d}", "alpha bravo charlie", gzip_members=True)
        (src / f"crawl-{d}.warc.gz").write_bytes(data)
        expected += 1 + 2 * (d % 3 + 1)

    # binaryFile's schema is fixed but streaming sources still demand
    # it explicitly (Spark requires a schema for stream DataFrames)
    binary_schema = spark.read.format("binaryFile").load(str(src)).schema
    stream = (
        spark.readStream.format("binaryFile")
        .schema(binary_schema)
        .option("pathGlobFilter", "*.warc.gz")
        .option("maxFilesPerTrigger", 2)
        .load(str(src))
        .select(
            F.regexp_extract(F.col("path"), r"crawl-(\d+)\.warc\.gz", 1)
            .cast("long")
            .alias("doc_id"),
            F.col("content").alias("payload"),
        )
    )
    q = (
        parse_warc_records(stream)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("warc_stream")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    batches = [p for p in q.recentProgress if p["numInputRows"] > 0]
    assert len(batches) == 2, [p["numInputRows"] for p in q.recentProgress]
    got = spark.sql(
        "SELECT count(*) AS n, sum(CASE WHEN rec_type='response' THEN 1 "
        "ELSE 0 END) AS resp FROM warc_stream"
    ).collect()[0]
    assert got.n == expected
    assert got.resp == sum(d % 3 + 1 for d in range(4))
    assert spark.sql(
        "SELECT count(*) AS n FROM warc_stream WHERE NOT compressed"
    ).collect()[0].n == 0


def test_resolve_url_host_only_base():
    """A host-only base URL ('https://h.com', no path) resolves
    path-relative hrefs against the origin — the rsplit('/') shortcut
    would otherwise produce 'https:/rel'."""
    from urllib.parse import urljoin

    from sparkga1_spark.operators.crawl import resolve_url

    for base in ("https://h.example.com", "https://h.example.com/",
                 "https://h.example.com/a/b"):
        for href in ("rel", "/abs", "x/y", ""):
            assert resolve_url(base, href) == urljoin(base, href), (base, href)


def test_robots_review_findings_regressions():
    """Round-6 session-7 review catches: (1) anchored wildcard patterns
    need BACKTRACKING — '/*.pdf$' must match '/a.pdfx.pdf' (the first
    '.pdf' is not at the end; a first-occurrence scan wrongly ALLOWS
    it); (2) RFC 9309 §2.2.1 requires groups with the same user-agent
    to MERGE — rules in a repeated 'User-agent: x' block must not be
    dropped."""
    from sparkga1_spark.operators.crawl import robots_allowed

    ua = "bot"
    assert not robots_allowed("User-agent: *\nDisallow: /*.pdf$\n", ua,
                              "/a.pdfx.pdf")
    assert robots_allowed("User-agent: *\nDisallow: /*.pdf$\n", ua,
                          "/a.pdf.x")
    merged = "User-agent: bot\nDisallow: /a\n\nUser-agent: bot\nDisallow: /b\n"
    assert not robots_allowed(merged, ua, "/a")
    assert not robots_allowed(merged, ua, "/b")  # second group's rule kept
    # '*' groups merge too
    star = "User-agent: *\nDisallow: /a\n\nUser-agent: *\nDisallow: /b\n"
    assert not robots_allowed(star, ua, "/b")


def test_warc_negative_content_length_refuses():
    with pytest.raises(ValueError, match="negative Content-Length"):
        parse_warc(b"WARC/1.0\r\nWARC-Type: x\r\nContent-Length: -4\r\n\r\n")


def test_html_uppercase_title_and_raw_text():
    """Close-tag searches are case-insensitive for title AND raw-text
    elements (the copies had diverged — review-caught)."""
    t, m, _, _ = extract_html("<TITLE>Hi There</TITLE><p>hello world</p>")
    assert t == "Hi There" and m == "hello world"
    _, m, _, _ = extract_html("<SCRIPT>var x = '<p>no</p>';</SCRIPT><p>yes</p>")
    assert m == "yes"


def test_resolve_url_schemes_and_dot_segments():
    """mailto:/javascript:/ftp:/tel: hrefs pass through (never
    path-joined into garbage frontier URLs); dot segments normalize so
    one resource gets one frontier key — both pinned against urljoin."""
    from urllib.parse import urljoin

    from sparkga1_spark.operators.crawl import resolve_url

    for base in ("https://h.com/a/b/c", "https://h.com/a/b", "https://h.com"):
        for href in ("mailto:x@y.com", "javascript:void(0)", "ftp://f.com/z",
                     "tel:+15551234", "../x", "./x", "../../x", "/../x",
                     "a/../b", "/a/./b"):
            assert resolve_url(base, href) == urljoin(base, href), (base, href)


def test_sitemap_parser_protocol_and_refusals():
    """Both protocol shapes roundtrip; CDATA text is not markup; XML's
    five entities decode and UNDEFINED entities refuse (XML is not
    HTML); mismatched close tags, unknown roots, unterminated CDATA
    refuse."""
    from sparkga1_spark.operators.crawl import build_sitemap, parse_sitemap

    kind, entries = parse_sitemap(build_sitemap(8, "src8"))  # 8%4==0
    assert kind == "sitemapindex" and len(entries) == 8 % 3 + 1
    kind, entries = parse_sitemap(build_sitemap(7, "src7"))
    assert kind == "urlset" and len(entries) == 7 % 5 + 1
    assert entries[1]["loc"].endswith("?a=1&b=2")   # CDATA raw '&'
    assert entries[2]["loc"].endswith("?x=1&y=2")   # &amp; decoded
    # CDATA may contain markup-looking bytes
    _, e = parse_sitemap(
        "<urlset><url><loc><![CDATA[https://h/x?a=<1>&b=2]]></loc></url></urlset>"
    )
    assert e[0]["loc"] == "https://h/x?a=<1>&b=2"
    for bad in (
        "<urlset><url></sitemap></urlset>",       # mismatched close
        "<feed><entry/></feed>",                  # unknown root
        "<urlset><url><loc>&nbsp;</loc></url></urlset>",  # HTML-only entity
        "<urlset><url><loc><![CDATA[x</loc></url></urlset>",  # CDATA EOF
        "<urlset><url><loc>x</loc></url>",        # unclosed root
    ):
        with pytest.raises(ValueError):
            parse_sitemap(bad)


def test_review2_html_robustness():
    """Second review pass catches: bare '<' before a non-tag char is
    TEXT (browser rule — '< >' and '<3' must not eat content or
    crash); '</>' skips like a bogus comment; a length-changing
    lowercase ('İ'.lower() is two codepoints) must not desync the
    raw-text close-tag scan; broken numeric character references
    decode to U+FFFD (never chr() crashes or lone surrogates that
    kill the Arrow batch); quoted charset parameter values parse."""
    from sparkga1_spark.operators.crawl import (
        _decode_entities,
        decode_http_body,
        extract_html,
    )

    assert extract_html("<p>x < > y</p>")[1] == "x < > y"
    assert extract_html("<p>2 <3 but 5>4</p>")[1] == "2 <3 but 5>4"
    assert extract_html("<p>a</><p>b</p>")[1] == "a b"
    t = extract_html(
        "<p>İİİ</p><script>var a = '</p>hidden';</script><p>after</p>"
    )
    assert t[1] == "İİİ after", t
    assert _decode_entities("x &#1114112; y") == "x � y"
    assert _decode_entities("&#xD800;&#0;") == "��"
    s = "résumé"
    assert decode_http_body(
        s.encode("utf-16le"), 'text/html; charset="utf-16le"'
    ) == (s, "utf-16le", True)


def test_image_text_pair_mining():
    """The LAION keep rule (empty/missing alt is decorative), figure
    caption pairing, attribute entity decoding, and src resolution —
    plus the multi-img figure and unclosed-figure edge cases."""
    from sparkga1_spark.operators.crawl import (
        build_gallery_html,
        extract_image_pairs,
    )

    html, base = build_gallery_html(5, "src5")
    pairs = extract_image_pairs(html, base)
    assert len(pairs) == 1 + 5 % 4 + 1  # hero + figures; decoratives dropped
    assert pairs[0]["caption"] is None
    assert pairs[1]["caption"] == "caption 5-0 & note"
    assert extract_image_pairs(
        '<img src="/a.png" alt=""><img src="/b.png">', "https://h/x"
    ) == []
    # one figure, two imgs: both get the caption
    pairs = extract_image_pairs(
        '<figure><img src="a.jpg" alt="one"><img src="b.jpg" alt="two">'
        "<figcaption>both</figcaption></figure>",
        "https://h/d/p",
    )
    assert [(p["alt_text"], p["caption"]) for p in pairs] == [
        ("one", "both"), ("two", "both"),
    ]
    # unclosed figure at EOF: pairs kept with NULL caption
    pairs = extract_image_pairs(
        '<figure><img src="a.jpg" alt="x">', "https://h/p"
    )
    assert pairs == [{"img_url": "https://h/a.jpg", "alt_text": "x",
                      "caption": None}]


def test_review3_image_pair_regressions():
    """Third review pass (post-addition code): data-src must not
    shadow src (attribute-name boundary); an unclosed </figcaption>
    must not leak body text into the next caption; an unclosed
    <figure> at EOF keeps its already-parsed caption; src-less images
    yield no pair; a null base falls back to the raw src instead of
    crashing the Arrow batch."""
    from sparkga1_spark.operators.crawl import extract_image_pairs

    p = extract_image_pairs(
        '<img data-src="/lazy.jpg" src="/real.jpg" alt="x">', "https://h/p"
    )
    assert p[0]["img_url"] == "https://h/real.jpg"
    p = extract_image_pairs(
        '<figure><img src="a.jpg" alt="x"><figcaption>A</figure><p>BODY</p>'
        '<figure><img src="b.jpg" alt="y"><figcaption>B</figcaption></figure>',
        "https://h/p",
    )
    assert [q["caption"] for q in p] == ["A", "B"]
    p = extract_image_pairs(
        '<figure><img src="a.jpg" alt="x"><figcaption>The cap</figcaption>',
        "https://h/p",
    )
    assert p[0]["caption"] == "The cap"
    assert extract_image_pairs('<img alt="logo">', "https://h/p") == []
    assert extract_image_pairs('<img src="/a.png" alt="x">', "")[0][
        "img_url"
    ] == "/a.png"


def test_robots_matcher_linear_time_and_regex_equivalent():
    """r6 ADVICE (high): the old backtracking-regex matcher was a DoS
    hole — robots.txt is remote attacker-controlled, and a 12-wildcard
    Disallow measured 118s against a 41-char path. The linear matcher
    must (1) finish the pathological case instantly and (2) agree with
    a regex reference on an exhaustive small pattern/path grid."""
    import itertools
    import re as _re
    import time as _time

    from sparkga1_spark.operators.crawl import _robots_pattern_match

    hostile = "/" + "a*" * 12 + "b"
    path = "/" + "a" * 40
    t0 = _time.time()
    assert _robots_pattern_match(hostile, path) is False
    assert _robots_pattern_match(hostile + "$", path) is False
    # 118s before the fix; linear matcher is microseconds — 1s is slack
    assert _time.time() - t0 < 1.0

    def ref(pattern: str, p: str) -> bool:
        if not pattern:
            return False
        anchored = pattern.endswith("$")
        if anchored:
            pattern = pattern[:-1]
        rx = ".*".join(_re.escape(s) for s in pattern.split("*"))
        return _re.match(rx + ("$" if anchored else ""), p) is not None

    alphabet = "ab*"
    pats = [
        "".join(t) + anchor
        for n in range(0, 5)
        for t in itertools.product(alphabet, repeat=n)
        for anchor in ("", "$")
    ]
    paths = ["".join(t) for n in range(0, 5)
             for t in itertools.product("ab", repeat=n)]
    for pat in pats:
        for p in paths:
            assert _robots_pattern_match(pat, p) == ref(pat, p), (pat, p)


def test_sitemap_invalid_charref_refuses():
    """r6 ADVICE (medium): a sitemap loc with &#xD800; must refuse with
    ValueError, not produce a lone surrogate that later kills the Arrow
    batch with UnicodeEncodeError (non-ValueError crash = contract
    violation). Same for NUL and out-of-range references; valid
    references still decode."""
    from sparkga1_spark.operators.crawl import _xml_unescape, parse_sitemap

    assert _xml_unescape("&#x48;&#105;&amp;") == "Hi&"
    for bad in ("&#xD800;", "&#xDFFF;", "&#0;", "&#x110000;"):
        with pytest.raises(ValueError, match="invalid character reference"):
            _xml_unescape(bad)
    with pytest.raises(ValueError, match="invalid character reference"):
        parse_sitemap(
            "<urlset><url><loc>https://h/&#xD800;</loc></url></urlset>"
        )
