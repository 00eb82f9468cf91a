"""Web main-content extraction: DOM heuristics, boilerplate stripping and
the PDF layout parser on inputs the fixture generator never produces —
the classifier must be generic, not fixture-overfit."""

import zlib

import pytest

from newocr_spark.web.boilerplate import extract_content, main_text
from newocr_spark.web.dom import parse_html, segment_blocks
from newocr_spark.web.pdf import (
    extract_pdf_text,
    make_pdf,
)

LONG_A = "the committee approved the updated budget after a long debate over funding"
LONG_B = "council members voted nine to two in favor of the revised proposal text"
LONG_C = "construction on the new bridge is expected to begin early next spring"


def test_plain_divs_no_semantic_tags():
    """Content in anonymous divs, no <article>/<main>: word-count + link
    density rules alone must find it."""
    html = f"""
    <html><body>
    <div class="hdr"><a href="/">Site</a> <a href="/a">News</a> <a href="/b">Sports</a></div>
    <div id="page">
      <div><p>{LONG_A}</p><p>{LONG_B}</p><p>{LONG_C}</p></div>
      <div class="foot"><a href="/tos">Terms</a> <a href="/p">Privacy</a></div>
    </div>
    </body></html>"""
    assert main_text(html) == f"{LONG_A}\n\n{LONG_B}\n\n{LONG_C}"


def test_link_dense_list_is_boiler_even_with_many_words():
    menu = " ".join(f'<a href="/{i}">item number {i} here</a>' for i in range(12))
    html = f"<body><div>{menu}</div><div><p>{LONG_A}</p></div></body>"
    assert main_text(html) == LONG_A


def test_long_comment_text_is_stripped_by_class():
    html = f"""
    <body><article><p>{LONG_A}</p></article>
    <div class="comments"><div class="comment">{LONG_B} {LONG_C} {LONG_B}</div></div>
    </body>"""
    assert main_text(html) == LONG_A


def test_nav_aside_footer_subtrees_always_boiler():
    html = f"""
    <body>
    <nav><p>{LONG_B}</p></nav>
    <article><p>{LONG_A}</p></article>
    <aside><p>{LONG_C}</p></aside>
    <footer><p>{LONG_B}</p></footer>
    </body>"""
    assert main_text(html) == LONG_A


def test_short_block_smoothing_same_parent():
    html = f"""
    <body><div id="content">
    <p>{LONG_A}</p><p>short tail line</p>
    </div><div class="sidebar"><p>{LONG_C}</p></div></body>"""
    # sidebar blacklisted; trailing short sibling paragraph kept
    assert main_text(html) == f"{LONG_A}\n\nshort tail line"


def test_heading_attaches_to_following_content():
    html = f"""
    <body><div>
    <h2>Budget approved</h2><p>{LONG_A}</p>
    </div></body>"""
    out = extract_content(html)
    kinds = [k for k, _, _ in out["items"]]
    assert kinds == ["heading", "text"]
    assert out["title"] == "Budget approved"


def test_orphan_heading_is_boiler():
    html = f"<body><div><h2>Lonely heading</h2></div><article><p>{LONG_A}</p></article></body>"
    out = extract_content(html)
    assert all(t != "Lonely heading" for _, t, _ in out["items"])


def test_images_follow_container_not_position():
    html = f"""
    <body>
    <header class="top"><img src="logo.png"></header>
    <article><p>{LONG_A}</p><img src="m-000042"><p>{LONG_B}</p></article>
    <aside><img src="ad.gif"></aside>
    </body>"""
    out = extract_content(html)
    assert [m for k, _, m in out["items"] if k == "media"] == ["m-000042"]


def test_malformed_html_tolerated():
    html = f"<body><div><p>{LONG_A}<p>{LONG_B}</em></div extra></body></html></html>"
    assert f"{LONG_A}" in main_text(html)
    assert f"{LONG_B}" in main_text(html)


def test_entities_and_uppercase_tags():
    html = f"<BODY><ARTICLE><P>{LONG_A} &amp; more &#8212; done</P></ARTICLE></BODY>"
    assert main_text(html) == f"{LONG_A} & more — done"


def test_script_style_content_never_leaks():
    html = f"""
    <body><script>var x = "{LONG_B}";</script><style>p {{color:red}}</style>
    <article><p>{LONG_A}</p></article></body>"""
    assert main_text(html) == LONG_A


def test_whitespace_normalized_within_blocks():
    html = f"<body><article><p>  {LONG_A.replace(' ', '   ')}\n\t</p></article></body>"
    assert main_text(html) == LONG_A


def test_empty_and_degenerate_pages():
    assert main_text("") == ""
    assert main_text("<body></body>") == ""
    assert extract_content("<body><nav><a href='/'>x</a></nav></body>")["items"] == []


def test_segment_blocks_link_density():
    root = parse_html(
        '<body><div><a href="/">one two three</a> four five six</div></body>'
    )
    blocks = segment_blocks(root)
    assert len(blocks) == 1
    assert blocks[0].n_words == 6
    assert blocks[0].n_anchor_words == 3
    assert blocks[0].link_density == pytest.approx(0.5)


# ---------------------------------------------------------------------------
# PDF
# ---------------------------------------------------------------------------


def test_pdf_multipage_pagination():
    lines = [f"line number {i} of the test document body" for i in range(15)]
    n_pages, text = extract_pdf_text(make_pdf(lines))
    assert n_pages == 3  # 6 lines per single-column page
    assert text == "\n".join(lines)


def test_pdf_two_column_reading_order():
    lines = [f"col line {i}" for i in range(10)]
    n_pages, text = extract_pdf_text(make_pdf(lines, two_col=True))
    assert n_pages == 1
    assert text == "\n".join(lines)  # left column first, then right


def test_pdf_raw_and_flate_agree():
    lines = ["alpha beta gamma", "delta epsilon zeta"]
    for compress in (True, False):
        _, text = extract_pdf_text(make_pdf(lines, compress=compress))
        assert text == "\n".join(lines)


def test_pdf_string_escapes_roundtrip():
    lines = ["parens (nested (deep)) fine", "back\\slash and close) paren"]
    _, text = extract_pdf_text(make_pdf(lines))
    assert text == "\n".join(lines)


def test_pdf_quote_operators_and_octal():
    """Content stream using TL/T*/'/octal escapes — operators our writer
    doesn't emit — must still parse."""
    content = b"BT /F1 11 Tf 14 TL 72 720 Td (first line) Tj (second\\040line) ' (third) ' ET"
    data = zlib.compress(content)
    pdf = (
        b"%PDF-1.4\n"
        b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
        b"2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n"
        b"3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>\nendobj\n"
        b"4 0 obj\n<< /Length " + str(len(data)).encode() + b" /Filter /FlateDecode >>\n"
        b"stream\n" + data + b"\nendstream\nendobj\n"
        b"trailer\n<< /Size 5 /Root 1 0 R >>\n%%EOF\n"
    )
    n_pages, text = extract_pdf_text(pdf)
    assert n_pages == 1
    assert text == "first line\nsecond line\nthird"


def test_pdf_empty_input():
    n_pages, text = extract_pdf_text(make_pdf([]))
    assert n_pages == 1
    assert text == ""


# ---------------------------------------------------------------------------
# property fuzz: round-trip identity on random content
# ---------------------------------------------------------------------------

try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    _HAS_HYPOTHESIS = True
except ImportError:  # pragma: no cover
    _HAS_HYPOTHESIS = False

if _HAS_HYPOTHESIS:
    # words over a printable alphabet incl. HTML/PDF metacharacters
    _word = st.text(
        alphabet="abcdefghijklmnopqrstuvwxyzABC0123456789&<>()\\\"'%",
        min_size=1,
        max_size=10,
    )
    _text = st.lists(_word, min_size=1, max_size=60).map(" ".join)

    @settings(max_examples=60, deadline=None)
    @given(doc_id=st.integers(0, 10**6 - 1), text=_text)
    def test_html_roundtrip_random_text(doc_id, text):
        from newocr_spark.web.htmlgen import page_html, paragraphs_of, has_figure

        out = extract_content(page_html(doc_id, text))
        assert [t for k, t, _ in out["items"] if k == "text"] == paragraphs_of(text)
        media = [m for k, _, m in out["items"] if k == "media"]
        assert media == ([f"m-{doc_id:06d}"] if has_figure(doc_id) else [])
        assert out["title"] == f"Report {doc_id:06d}"

    @settings(max_examples=60, deadline=None)
    @given(
        lines=st.lists(
            st.text(
                alphabet="abcdefghijklmnop ()\\%0123456789",
                min_size=0,
                max_size=40,
            ),
            min_size=1,
            max_size=30,
        ),
        two_col=st.booleans(),
        compress=st.booleans(),
    )
    def test_pdf_roundtrip_random_lines(lines, two_col, compress):
        # the extractor normalizes intra-line whitespace and drops blank
        # lines — compare against the same normalization
        expect = [" ".join(l.split()) for l in lines]
        expect = [l for l in expect if l]
        _, text = extract_pdf_text(make_pdf(lines, two_col=two_col, compress=compress))
        assert text == "\n".join(expect)


def test_adjacent_anchor_word_count():
    """<a>x</a><a>y</a> is one text run ('xy') but two anchor words —
    a link bar's density must not collapse because anchors touch."""
    root = parse_html('<body><div><a href="/a">alpha</a><a href="/b">beta</a></div></body>')
    (b,) = segment_blocks(root)
    assert b.text == "alphabeta"  # correct HTML text semantics
    assert b.n_anchor_words == 2
    assert b.link_density > 0.4  # all-link block stays boiler-dense


def test_table_layout_page():
    """1998-style table layout, no semantic tags: menu cell and byline
    stripped, content cell found by features alone."""
    html = f"""
    <body><table><tr>
    <td class="menu-cell"><ul><li><a href="/1">alpha beta</a></li>
    <li><a href="/2">gamma delta</a></li></ul></td>
    <td><div class="post">
      <div class="meta byline">Posted by <a href="/u/1">user1</a> yesterday</div>
      <div class="post-body"><h1>Title Here</h1><p>{LONG_A}</p><p>{LONG_B}</p></div>
    </div></td>
    </tr></table></body>"""
    out = extract_content(html)
    assert out["title"] == "Title Here"
    assert [t for k, t, _ in out["items"] if k == "text"] == [LONG_A, LONG_B]


# ---------------------------------------------------------------------------
# page metadata: clean title / author / published date (web/metadata.py)
# ---------------------------------------------------------------------------


def test_metadata_meta_tags_win():
    from newocr_spark.web.metadata import page_metadata

    html = f"""<html><head>
    <title>Bridge Opens Early | Daily Planet</title>
    <meta name="author" content="Lois Lane">
    <meta property="article:published_time" content="2025-11-03T08:30:00Z">
    </head><body>
    <h1>Bridge Opens Early</h1>
    <p class="byline">by Someone Else — 2024-01-01</p>
    <p>{LONG_A}</p><p>{LONG_B}</p>
    </body></html>"""
    md = page_metadata(html)
    assert md["title"] == "Bridge Opens Early"  # h1-matching segment wins
    assert md["author"] == "Lois Lane"  # meta beats byline
    assert md["published"] == "2025-11-03"  # ISO date extracted from stamp


def test_metadata_time_tag_and_byline_author():
    from newocr_spark.web.metadata import page_metadata

    html = f"""<html><head><title>Weekly Notes</title></head><body>
    <h1>Weekly Notes</h1>
    <div class="byline">Written by J. Q. Public</div>
    <time datetime="2026-03-14">March 14</time>
    <p>{LONG_A}</p>
    </body></html>"""
    md = page_metadata(html)
    assert md["author"] == "J. Q. Public"
    assert md["published"] == "2026-03-14"


def test_metadata_title_longest_segment_without_h1_match():
    from newocr_spark.web.metadata import page_metadata

    html = f"""<html><head>
    <title>Short | A Considerably Longer Article Headline Here</title>
    </head><body><p>{LONG_A}</p></body></html>"""
    md = page_metadata(html)
    assert md["title"] == "A Considerably Longer Article Headline Here"


def test_metadata_absent_fields_are_none():
    from newocr_spark.web.metadata import page_metadata

    md = page_metadata(f"<html><body><p>{LONG_A}</p></body></html>")
    assert md["title"] == "" and md["author"] is None and md["published"] is None


def test_metadata_hyphenated_title_not_split():
    from newocr_spark.web.metadata import page_metadata

    html = "<html><head><title>State-of-the-art OCR</title></head><body></body></html>"
    assert page_metadata(html)["title"] == "State-of-the-art OCR"


def test_metadata_fixture_templates_both_ways():
    """Both generator templates must satisfy the closed-form oracle law."""
    from newocr_spark.web.htmlgen import page_html
    from newocr_spark.web.metadata import page_metadata

    text = " ".join([LONG_A, LONG_B, LONG_C])
    for doc_id in (4, 7, 23, 46):  # both templates, both author moduli
        md = page_metadata(page_html(doc_id, text))
        assert md["title"] == f"Report {doc_id:06d}"
        if doc_id % 2 == 0:
            assert md["author"] == "staff writer"
            assert md["published"] == f"2026-01-{1 + doc_id % 28:02d}"
        else:
            assert md["author"] == f"user{doc_id % 23}"
            assert md["published"] == f"2026-02-{1 + doc_id % 28:02d}"


def test_html_tables_classifier_data_vs_layout():
    """Structure-only classification: a table is DATA iff it has a <th>
    and no nested table — class names are never consulted. thead/tbody
    wrappers are transparent; layout grids (nested tables / no header
    cells) contribute nothing."""
    from newocr_spark.web.dom import parse_html
    from newocr_spark.web.extract import _is_data_table, _table_cells, _tables_of

    html = """
    <table class="data-looking"><tr><td>menu</td><td>
      <table><thead><tr><th>name</th><th>qty</th></tr></thead>
      <tbody><tr><td>bolt</td><td>7</td></tr>
             <tr><td>nut &amp; washer</td><td>12</td></tr></tbody></table>
    </td></tr></table>
    <table class="layout"><tr><td>no header cells here</td></tr></table>
    """
    tables = _tables_of(parse_html(html))
    assert len(tables) == 3
    flags = [_is_data_table(t) for t in tables]
    # outer wrapper nests a table (not data, despite the class); the inner
    # one is data; the th-less grid is layout
    assert flags == [False, True, False]
    cells = list(_table_cells(tables[1]))
    assert cells == [
        (0, 0, True, "name"), (0, 1, True, "qty"),
        (1, 0, False, "bolt"), (1, 1, False, "7"),
        (2, 0, False, "nut & washer"), (2, 1, False, "12"),
    ]


def test_html_tables_fixture_extracts_only_the_data_table(spark):
    """End-to-end over the synthesized fixture page: exactly one data
    table per doc, header row c0..c2, 2 + doc_id % 3 body rows drawn from
    the doc's tokens, and nothing from either layout table (menu words,
    footer links)."""
    from newocr_spark.web.extract import q_html_tables

    out = q_html_tables(spark, "/root/testdata/sf0.001", max_docs=12).toPandas()
    assert set(out.table_idx) == {0}
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    texts = {r.doc_id: r.text for r in docs.filter("doc_id < 12").collect()}
    for did, text in texts.items():
        words = text.split(" ")
        mine = out[out.doc_id == f"doc-{did:06d}"]
        n_rows = 2 + did % 3
        assert len(mine) == 3 * (1 + n_rows)
        hdr = mine[mine.is_header]
        assert sorted(hdr.cell) == ["c0", "c1", "c2"]
        body = mine[~mine.is_header]
        for _, r in body.iterrows():
            assert r.cell == words[((r.row_idx - 1) * 3 + r.col_idx) % len(words)]
        assert not any(c in set(mine.cell) for c in ("Terms", "more"))


def test_html_links_document_order_and_conditional_ad(spark):
    """Anchor extraction is in document order; the inline-ad link exists
    exactly on docs whose article exceeds two paragraphs; both templates'
    inventories start and end with their fixed chrome anchors."""
    from newocr_spark.web.extract import q_html_links

    out = q_html_links(spark, "/root/testdata/sf0.001", max_docs=10).toPandas()
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    texts = {r.doc_id: r.text for r in docs.filter("doc_id < 10").collect()}
    for did, text in texts.items():
        mine = out[out.doc_id == f"doc-{did:06d}"].sort_values("link_idx")
        hrefs = list(mine.href)
        anchors = list(mine.anchor)
        has_ad = len(text.split(" ")) > 24
        assert ("click here" in anchors) == has_ad
        if did % 2 == 0:  # semantic: nav first, /privacy footer last
            assert anchors[:2] == ["Home", "Reports"]
            assert hrefs[-1] == "/privacy"
            assert hrefs.count("/") == 2  # nav Home + breadcrumb Home
        else:  # tabular: topbar first, /priv footer last
            assert hrefs[0] == "/s/0"
            assert hrefs[-1] == "/priv"
            assert f"user{did % 23}" in anchors
        # link_idx is dense 0..n-1
        assert list(mine.link_idx) == list(range(len(mine)))


def test_url_canonical_rules(spark):
    """Each RFC-3986-style rule in isolation: case, www, default port,
    trailing slash (non-root only), fragment, utm strip, param sort,
    empty-query drop."""
    from newocr_spark.web.extract import url_canonical

    rows = [
        (1, "HTTPS://WWW.News.Example.COM:443/a/b/?z=2&utm_x=1&a=3#top"),
        (2, "http://example.com:80/"),          # root path: slash-only trims to bare host
        (3, "https://Example.com/path?utm_source=x&utm_medium=y"),  # query empties
        (4, "https://example.com:8080/p?b=2&a=1"),  # NON-default port kept
        (5, "https://example.com/p/q"),
        # default-port elision is scheme-relative: the OTHER scheme's
        # default is a real, distinct origin and must survive
        (6, "https://example.com:80/p"),
        (7, "http://example.com:443/p"),
        # schemeless/malformed: canonicalizes to ITSELF (never NULL —
        # a NULL canon would collapse all such docs into one dedup row)
        (8, "example.com/x?a=1#f"),
        (9, "//cdn.example.com/asset"),
    ]
    docs = spark.createDataFrame(rows, "doc_id bigint, url string")
    out = {r.doc_id: r.canon_url for r in url_canonical(docs).collect()}
    assert out[1] == "https://news.example.com/a/b?a=3&z=2"
    assert out[2] == "http://example.com"
    assert out[3] == "https://example.com/path"
    assert out[4] == "https://example.com:8080/p?a=1&b=2"
    assert out[5] == "https://example.com/p/q"
    assert out[6] == "https://example.com:80/p"
    assert out[7] == "http://example.com:443/p"
    assert out[8] == "example.com/x?a=1#f"
    assert out[9] == "//cdn.example.com/asset"
    # canonical equality groups what a URL-dedup stage should group
    pair = [
        (10, "https://www.site.com/x?b=2&a=1"),
        (11, "HTTPS://site.com:443/x/?a=1&utm_c=z&b=2#f"),
    ]
    docs = spark.createDataFrame(pair, "doc_id bigint, url string")
    canon = {r.canon_url for r in url_canonical(docs).collect()}
    assert len(canon) == 1


def test_url_dedup_keeps_longest_fetch(spark):
    """Re-crawl groups of 3 collapse to one row keyed by canonical URL;
    the kept doc is the longest fetch (ties -> lowest doc_id)."""
    from newocr_spark.web.extract import domain_stats, url_dedup

    rows = [(i, int(100 + (i * 37) % 50)) for i in range(12)]
    # force a tie inside page group 2 (docs 6,7,8)
    rows[6] = (6, 120)
    rows[7] = (7, 120)
    rows[8] = (8, 90)
    docs = spark.createDataFrame(rows, "doc_id bigint, n_chars bigint")
    out = {r.canon_url: r for r in url_dedup(docs).collect()}
    # 12 docs / 3 crawls = 4 pages, each fully collided by canonicalization
    assert len(out) == 4
    assert all(r.n_crawls == 3 for r in out.values())
    for page, grp in ((0, rows[0:3]), (1, rows[3:6]), (3, rows[9:12])):
        url = f"https://site{page % 20}.example.com/p/{page}?a={page % 5}&z=2"
        best = max(grp, key=lambda t: (t[1], -t[0]))
        assert out[url].keep_doc_id == best[0]
        assert out[url].keep_chars == best[1]
    # the tied group: equal n_chars -> lowest doc_id wins
    tie = out["https://site2.example.com/p/2?a=2&z=2"]
    assert (tie.keep_doc_id, tie.keep_chars) == (6, 120)

    # domain rollup over the same synthesis: pages 0-3 land on site0..site3
    doms = {r.domain: r for r in domain_stats(docs).collect()}
    assert set(doms) == {f"site{i}.example.com" for i in range(4)}
    for i in range(4):
        d = doms[f"site{i}.example.com"]
        assert (d.n_crawls, d.n_pages) == (3, 1)
        grp = rows[3 * i : 3 * i + 3]
        assert d.total_chars == sum(t[1] for t in grp)
        assert d.avg_chars == round(sum(t[1] for t in grp) / 3, 3)


def test_crawl_frontier_semantics(spark):
    """Frontier = wave-2 discoveries only: chrome links are all seen in
    wave 1 and never surface; every frontier URL is a doc-dependent
    discovery href on the linking doc's own domain; the politeness cap
    and (n_refs desc, url asc) ranking hold."""
    from newocr_spark.web.extract import q_crawl_frontier

    out = q_crawl_frontier(
        spark, "/root/testdata/sf0.001", max_docs=120, split=60, per_domain=5
    ).collect()
    assert out, "frontier empty"
    chrome = ("/reports", "/tags", "/contact", "/tos", "/privacy", "/priv")
    for r in out:
        path = r.url.split(".example.com", 1)[1]
        assert r.url.startswith(f"https://{r.domain}")
        assert path.startswith(("/r/", "/cat/", "/u/", "/s/")) or path not in chrome
        assert 1 <= r.rank <= 5
    # per-domain: ranks dense from 1, ordered by (n_refs desc, url asc)
    bydom = {}
    for r in out:
        bydom.setdefault(r.domain, []).append(r)
    for rows in bydom.values():
        rows.sort(key=lambda r: r.rank)
        assert [r.rank for r in rows] == list(range(1, len(rows) + 1))
        keys = [(-r.n_refs, r.url) for r in rows]
        assert keys == sorted(keys)
    # chrome URLs really are excluded by the seen-set, not by accident:
    # wave 1 contains every chrome href per domain
    assert all(
        not r.url.endswith(("/tos", "/privacy", "/priv")) for r in out
    )


def test_warc_roundtrip_framing(spark):
    """Record-level WARC roundtrip: blob packing (warcinfo + grouped
    responses in doc order), ISO 28500 framing walk, HTTP parse — every
    field recovered exactly."""
    from newocr_spark.sources.warc import (
        RECORDS_PER_BLOB, doc_uri, parse_warc, synth_warc_blobs,
    )
    from newocr_spark.web.htmlgen import page_html

    rows = [(i, f"alpha beta gamma delta {i}") for i in range(10)]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    recs = parse_warc(synth_warc_blobs(docs)).collect()
    by_blob = {}
    for r in recs:
        by_blob.setdefault(r.blob_id, []).append(r)
    assert set(by_blob) == {0, 1, 2}  # 10 docs / 4 per blob
    for blob_id, rs in by_blob.items():
        rs.sort(key=lambda r: r.rec_idx)
        assert rs[0].warc_type == "warcinfo"
        assert rs[0].http_status is None and rs[0].payload is None
        body = rs[1:]
        want = [i for i in range(10) if i // RECORDS_PER_BLOB == blob_id]
        assert [r.rec_idx for r in rs] == list(range(len(rs)))
        for r, did in zip(body, want):
            assert r.warc_type == "response"
            assert r.target_uri == doc_uri(did)
            assert r.http_status == 200
            assert r.content_type == "text/html; charset=utf-8"
            assert r.payload == page_html(did, f"alpha beta gamma delta {did}")


def test_robots_gate_rfc9309_semantics(spark):
    """Longest-match wins; allow beats disallow on the /u/1-vs-/u/
    override; unmatched URLs pass with a null rule; crawl_delay is the
    domain law."""
    from newocr_spark.web.extract import q_robots_gate

    rows = q_robots_gate(spark, "/root/testdata/sf0.001").collect()
    assert rows
    saw_override = saw_block = False
    for r in rows:
        d = int(r.domain.split("site")[1].split(".")[0])
        path = r.url.split(".example.com")[1]
        assert r.crawl_delay == d % 5
        if r.matched_rule is None:
            assert r.allowed
            assert not (path.startswith("/cat/") and d % 3 == 0)
            assert not (path.startswith("/u/") and d % 2 == 0)
        elif r.matched_rule == "/u/1":
            assert r.allowed and d % 4 == 0 and path.startswith("/u/1")
            saw_override = True
        else:
            assert not r.allowed
            assert path.startswith(r.matched_rule)
            saw_block = True
    assert saw_block, "no disallowed rows - fixture lost its bite"
    # the override needs a /u/1x URL on a d%4==0 domain in the frontier;
    # assert it when present (sf0.001 has them)
    assert saw_override


def test_anchor_text_cap_and_order(spark):
    """The anchor corpus is the SORTED distinct set, capped at max_terms
    while n_anchor_variants still counts all variants."""
    from newocr_spark.web.extract import q_anchor_text

    full = {
        r.href: r
        for r in q_anchor_text(
            spark, "/root/testdata/sf0.001", max_docs=64
        ).collect()
    }
    capped = {
        r.href: r
        for r in q_anchor_text(
            spark, "/root/testdata/sf0.001", max_docs=64, max_terms=4
        ).collect()
    }
    assert set(full) == set(capped)
    saw_cap = False
    for href, r in full.items():
        terms = r.anchor_corpus.split(" | ")
        assert terms == sorted(terms)
        assert len(terms) == min(r.n_anchor_variants, 16)
        c = capped[href]
        assert c.n_anchor_variants == r.n_anchor_variants
        assert c.anchor_corpus.split(" | ") == terms[:4]
        if r.n_anchor_variants > 4:
            saw_cap = True
    assert saw_cap


def test_url_canonical_crosscheck_random(spark):
    """300 seeded-random messy URLs through the JVM canonicalizer vs an
    independent literal-Python transcription of the documented rules —
    catches any divergence between the higher-order-expression pipeline
    and the spec it claims."""
    import random
    import re

    from newocr_spark.web.extract import url_canonical

    def reference(url: str) -> str:
        no_frag = url.split("#", 1)[0]
        if "://" not in no_frag:
            return url  # schemeless: canonicalizes to itself
        scheme, _, rest = no_frag.partition("://")
        scheme = scheme.lower()
        hostpath, _, query = rest.partition("?")
        host, slash, rawpath = hostpath.partition("/")
        host = host.lower()
        host = re.sub(r"^www\.", "", host)
        # default-port elision is scheme-relative (RFC 3986 §6.2.3)
        if scheme == "https":
            host = re.sub(r":443$", "", host)
        elif scheme == "http":
            host = re.sub(r":80$", "", host)
        path = "" if not slash or rawpath == "" else "/" + re.sub(
            "/$", "", rawpath
        )
        params = sorted(
            p for p in query.split("&") if p and not p.startswith("utm_")
        )
        q = "?" + "&".join(params) if params else ""
        return f"{scheme}://{host}{path}{q}"

    rng = random.Random(20260820)
    schemes = ["http", "https", "HTTPS", "Http", ""]
    hosts = ["www.Ex.COM", "ex.com", "WWW.SITE9.example.com", "a.b.c"]
    ports = ["", ":443", ":80", ":8080"]
    paths = ["", "/", "/a", "/a/", "/a/b", "/a/b//", "/p/7"]
    queries = [
        "", "?", "?a=1", "?b=2&a=1", "?utm_x=9", "?utm_x=9&z=0&a=1",
        "?a=1&a=1&", "?z=1&utm_source=f&b=3",
        # repeated separators: the query may itself contain '?' / '://'
        "?next=https://ex.com/cb&a=1", "?q=a?b",
    ]
    frags = ["", "#f", "#a#b"]
    urls = []
    for _ in range(300):
        sch = rng.choice(schemes)
        # empty scheme → a genuinely schemeless / protocol-relative URL
        # (no '://' at all): must canonicalize to itself on both sides
        prefix = sch + "://" if sch else rng.choice(["", "//"])
        urls.append(
            prefix + rng.choice(hosts) + rng.choice(ports)
            + rng.choice(paths) + rng.choice(queries) + rng.choice(frags)
        )
    docs = spark.createDataFrame(
        list(enumerate(urls)), "doc_id bigint, url string"
    )
    got = {r.doc_id: r.canon_url for r in url_canonical(docs).collect()}
    for i, u in enumerate(urls):
        assert got[i] == reference(u), (u, got[i], reference(u))

    # the DuckDB oracle CHAIN gets the same treatment: _canon_chain_sql
    # must agree with the literal reference on arbitrary messy URLs, not
    # just the fixture synthesis it normally certifies (regression pin
    # for the limit-2-split / scheme-relative-port oracle divergences)
    import duckdb
    import pandas as pd

    from newocr_spark.web.extract import _canon_chain_sql

    con = duckdb.connect()
    con.register(
        "rnd", pd.DataFrame({"doc_id": range(len(urls)), "url": urls})
    )
    sql = _canon_chain_sql("SELECT doc_id, url FROM rnd") + \
        "SELECT doc_id, canon_url FROM canon"
    for i, canon in con.execute(sql).fetchall():
        assert canon == reference(urls[i]), (urls[i], canon)


def test_robots_gate_fetch_schedule(spark):
    """The k-th allowed URL per domain fetches at (k-1)*crawl_delay;
    disallowed rows have no slot; the allowed sequence is dense."""
    from newocr_spark.web.extract import q_robots_gate

    rows = q_robots_gate(spark, "/root/testdata/sf0.001").collect()
    bydom = {}
    for r in rows:
        bydom.setdefault(r.domain, []).append(r)
    for dom, rs in bydom.items():
        rs.sort(key=lambda r: r.rank)
        k = 0
        for r in rs:
            if r.allowed:
                assert r.fetch_at == k * r.crawl_delay, (dom, r)
                k += 1
            else:
                assert r.fetch_at is None, (dom, r)


def test_sitemap_delta_laws(spark):
    """The delta covers EVERY hosted page exactly once in canonical
    form; phantoms (the p%7==0 advertisements past SITEMAP_PHANTOM_BASE)
    are the 'new' rows and only they; lastmod/priority survive the XML
    round trip as the closed-form page-id laws."""
    import datetime

    from newocr_spark.web.extract import SITEMAP_PHANTOM_BASE, q_sitemap_delta

    rows = q_sitemap_delta(spark, "/root/testdata/sf0.001").collect()
    assert rows
    seen = set()
    for r in rows:
        pid = int(r.url.split("/p/")[1].split("?")[0])
        assert pid not in seen, "advertised page listed twice"
        seen.add(pid)
        d = pid % 20
        assert r.domain == f"site{d}.example.com"
        # canonical form: no www., no port, no trailing slash, params
        # sorted, no fragment
        assert r.url == f"https://site{d}.example.com/p/{pid}?a={pid % 5}&z=2"
        assert r.status == ("new" if pid >= SITEMAP_PHANTOM_BASE else "crawled")
        if pid >= SITEMAP_PHANTOM_BASE:
            assert (pid - SITEMAP_PHANTOM_BASE) % 7 == 0
        exp = datetime.date(2026, 1, 1) + datetime.timedelta(days=pid % 365)
        assert r.lastmod == exp.isoformat()
        assert r.priority == 0.5 + (pid % 5) / 10.0
    # every crawled page p = doc_id//3 is advertised, plus its phantom
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    pages = {int(x[0]) // 3 for x in docs.select("doc_id").collect()}
    expect = pages | {p + SITEMAP_PHANTOM_BASE for p in pages if p % 7 == 0}
    assert seen == expect


def test_robots_gate_urls_scheme_general(spark):
    """The shared gate helper strips ANY RFC 3986 scheme's authority
    before prefix-matching — a non-https URL must not bypass Disallow
    (regression pin for the once-hardcoded '^https://' strip)."""
    from newocr_spark.web.extract import robots_gate_urls, robots_rules

    rows = [
        ("site3.example.com", "http://site3.example.com/cat/7"),
        ("site3.example.com", "ftp+ssh://site3.example.com/cat/8"),
        ("site3.example.com", "https://site3.example.com/cat/9"),
        ("site3.example.com", "http://site3.example.com/ok"),
    ]
    urls = spark.createDataFrame(rows, "domain string, url string")
    rules = robots_rules(urls.select("domain"))
    out = {r.url: r for r in robots_gate_urls(urls, rules).collect()}
    # d=3 -> d%3==0 synthesizes 'Disallow: /cat/'
    for u in list(out)[:3]:
        if "/cat/" in u:
            assert not out[u].allowed and out[u].matched_rule == "/cat/"
    assert out["http://site3.example.com/ok"].allowed


def test_parse_sitemap_pretty_printed(spark):
    """Real sitemaps are pretty-printed (newlines + indentation inside
    each <url> block); the parser must read them identically to the
    fixture's single-line entries."""
    from newocr_spark.web.extract import parse_sitemap

    xml = """<?xml version="1.0" encoding="UTF-8"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <url>
    <loc>
      https://www.site7.example.com/p/42/?z=2&a=2
    </loc>
    <lastmod> 2026-02-12 </lastmod>
    <priority>0.7</priority>
  </url>
  <url><loc>https://www.site7.example.com/p/43/?z=2&a=3</loc><lastmod>2026-02-13</lastmod><priority>0.8</priority></url>
</urlset>"""
    rows = sorted(
        parse_sitemap(spark.createDataFrame([(xml,)], "xml string")).collect(),
        key=lambda r: r.doc_id,
    )
    assert [r.doc_id for r in rows] == [42, 43]
    assert rows[0].url == "https://www.site7.example.com/p/42/?z=2&a=2"
    assert rows[0].lastmod == "2026-02-12"
    assert rows[0].priority == 0.7
    assert rows[1].url == "https://www.site7.example.com/p/43/?z=2&a=3"


def test_sitemap_index_covers_every_shard(spark):
    """The index inventory lists exactly the shard files the synthesis
    produced — one row per (domain, shard) with the shard's advertised
    URL count — and the counts sum to the full delta inventory."""
    from newocr_spark.web.extract import q_sitemap_delta, q_sitemap_index

    sf = "/root/testdata/sf0.001"
    rows = q_sitemap_index(spark, sf).collect()
    assert rows
    seen = set()
    for r in rows:
        key = (r.domain, r.shard)
        assert key not in seen, "shard listed twice"
        seen.add(key)
        assert r.sitemap_url == f"https://{r.domain}/sitemap-{r.shard}.xml"
        assert r.n_urls > 0
    assert sum(r.n_urls for r in rows) == q_sitemap_delta(spark, sf).count()


def test_parse_sitemap_index_pretty_printed(spark):
    """Pretty-printed index documents parse identically to the
    fixture's single-line entries."""
    from newocr_spark.web.extract import parse_sitemap_index

    ixml = """<?xml version="1.0" encoding="UTF-8"?>
<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <sitemap>
    <loc>
      https://site4.example.com/sitemap-0.xml
    </loc>
  </sitemap>
  <sitemap><loc>https://site4.example.com/sitemap-3.xml</loc></sitemap>
</sitemapindex>"""
    rows = sorted(
        parse_sitemap_index(
            spark.createDataFrame([(ixml,)], "ixml string")
        ).collect(),
        key=lambda r: r.shard,
    )
    assert [(r.domain, r.shard) for r in rows] == [
        ("site4.example.com", 0), ("site4.example.com", 3)
    ]
    assert rows[1].sitemap_url == "https://site4.example.com/sitemap-3.xml"


def test_robots_sitemaps_discovery_hook(spark):
    """robots.txt advertises each domain's sitemap index (RFC 9309 §2.4
    Sitemap directive); the extractor reads exactly one per domain and
    the URL matches the index synthesis law — while the allow/disallow
    rule parse keeps ignoring the non-group line."""
    from newocr_spark.web.extract import robots_rules, robots_sitemaps

    doms = spark.createDataFrame(
        [(f"site{d}.example.com",) for d in range(6)], "domain string"
    )
    out = {r.domain: r.sitemap_url for r in robots_sitemaps(doms).collect()}
    assert len(out) == 6
    for d in range(6):
        assert out[f"site{d}.example.com"] == (
            f"https://site{d}.example.com/sitemap-index.xml"
        )
    # the rules parse never leaks the Sitemap line as a path rule
    for r in robots_rules(doms).collect():
        assert r.rule_path.startswith("/")
