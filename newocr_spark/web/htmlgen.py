"""Deterministic HTML page synthesis from the driver's documents table.

north_rule mandates extraction fixtures we synthesise ourselves. Each
(doc_id, text) row becomes a full page: the text, split into 12-word
paragraphs, is the article body; everything else is boilerplate chrome —
site header + nav, breadcrumbs, link-dense sidebar, a link-heavy byline,
an inline ad between paragraphs, a comments section with *long* comment
text (a blacklist trap: word-count rules alone would keep it), and a
footer. Docs with ``doc_id % 3 == 0`` embed a figure image pointing at
the corpus media ref ``m-%06d`` (the same ref corpus_fixture_tables
renders), so extracted spans interleave text + media exactly like the
input_hint shape.

Because the construction is a pure function of (doc_id, text), the
expected extractor output is expressible in DuckDB SQL over the same
documents table (web/extract.py builds those oracles).
"""

from __future__ import annotations

import html as _html

PARA_WORDS = 12
MEDIA_EVERY = 3  # docs with doc_id % MEDIA_EVERY == 0 carry a figure

_VOCAB = (
    "alpha beta gamma delta epsilon zeta theta kappa sigma omega quartz "
    "lumen vertex cobalt fathom zephyr onyx raven tundra ember"
).split()


def _junk_words(doc_id: int, salt: int, n: int) -> str:
    return " ".join(
        _VOCAB[(doc_id * 7 + salt * 13 + i * 3) % len(_VOCAB)] for i in range(n)
    )


def paragraphs_of(text: str) -> list[str]:
    """12-word chunks of text.split(' ') — mirrored by the SQL oracles
    (string_split(text,' ') grouped by (pos-1)/12)."""
    words = text.split(" ")
    return [
        " ".join(words[i : i + PARA_WORDS]) for i in range(0, len(words), PARA_WORDS)
    ]


def has_figure(doc_id: int) -> bool:
    return doc_id % MEDIA_EVERY == 0


def template_of(doc_id: int) -> str:
    """Two page skeletons so the extractor can't key on one layout:
    'semantic' (header/nav/aside/article/footer) and 'tabular' (1998-style
    table layout, div soup, zero semantic tags)."""
    return "semantic" if doc_id % 2 == 0 else "tabular"


def page_html(doc_id: int, text: str) -> str:
    if template_of(doc_id) == "tabular":
        return _page_html_tabular(doc_id, text)
    return _page_html_semantic(doc_id, text)


def _article_body(doc_id: int, text: str, e, byline: str | None = None) -> str:
    """Shared inner article: h1, optional byline, paragraphs, optional
    figure after the first paragraph, inline ad between paragraphs 2/3."""
    paras = paragraphs_of(text)
    title = f"Report {doc_id:06d}"
    body_parts: list[str] = [f"<h1>{title}</h1>"]
    if byline:
        body_parts.append(byline)
    for i, p in enumerate(paras):
        body_parts.append(f"<p>{e(p)}</p>")
        if i == 0 and has_figure(doc_id):
            body_parts.append(
                f'<figure><img src="m-{doc_id:06d}" alt="figure {doc_id}">'
                f"<figcaption>fig. {doc_id % 9}</figcaption></figure>"
            )
        if i == 1 and len(paras) > 2:
            body_parts.append(
                f'<div class="ad-inline">Sponsored: {_junk_words(doc_id, 5, 6)} '
                '<a href="#">click here</a></div>'
            )
    return "\n".join(body_parts)


def _page_html_tabular(doc_id: int, text: str) -> str:
    """Table-layout page: link bar, menu cell, post div — no semantic
    tags, no <article>; the classifier must find the content cell by
    features alone."""
    title = f"Report {doc_id:06d}"
    e = lambda s: _html.escape(s, quote=False)
    menu = "\n".join(
        f'<li><a href="/cat/{(doc_id + k) % 40}">{_junk_words(doc_id, 40 + k, 2)}</a></li>'
        for k in range(6)
    )
    topbar = " | ".join(
        f'<a href="/s/{k}">{_junk_words(doc_id, 50 + k, 1)}</a>' for k in range(6)
    )
    comments = "\n".join(
        f'<div class="comment">{_junk_words(doc_id, 60 + k, 13)}</div>'
        for k in range(2)
    )
    return f"""<html><head><title>{title}</title>
<script type="text/javascript">document.write('{doc_id}');</script></head>
<body bgcolor="#ffffff">
<div class="topbar">{topbar}</div>
<table class="layout" width="100%"><tr>
<td class="menu-cell" width="180" valign="top">
<ul>
{menu}
</ul>
<div class="promo">Hot deal: {_junk_words(doc_id, 70, 4)} <a href="#">buy</a></div>
</td>
<td valign="top">
<div class="post">
<div class="meta byline">Posted by <a href="/u/{doc_id % 23}">user{doc_id % 23}</a> on 2026-02-{1 + doc_id % 28:02d}</div>
<div class="post-body">
{_article_body(doc_id, text, e)}
</div>
</div>
</td>
</tr></table>
<div class="comments">{comments}</div>
<div class="footer-links"><a href="/tos">Terms</a> <a href="/priv">Privacy</a> &copy; 2026</div>
</body></html>"""


def _page_html_semantic(doc_id: int, text: str) -> str:
    title = f"Report {doc_id:06d}"
    e = lambda s: _html.escape(s, quote=False)

    byline = (
        f'<p class="byline"><a href="/u/{doc_id % 17}">staff writer</a>'
        f" &mdash; 2026-01-{1 + doc_id % 28:02d}</p>"
    )
    article = _article_body(doc_id, text, e, byline=byline)

    sidebar_links = "\n".join(
        f'<li><a href="/r/{(doc_id + k) % 100}">{_junk_words(doc_id, k, 3)}</a></li>'
        for k in range(5)
    )
    comments = "\n".join(
        f'<div class="comment"><span class="author">user{(doc_id + k) % 50}</span> '
        f"{_junk_words(doc_id, 20 + k, 14)}</div>"
        for k in range(2)
    )

    return f"""<!DOCTYPE html>
<html><head><title>{title} &mdash; Example Corpus</title>
<script>var page={doc_id};</script><style>.layout{{display:flex}}</style></head>
<body>
<header class="site-header">
<img src="/static/logo.png" class="logo" alt="logo">
<nav class="top-nav"><ul>
<li><a href="/">Home</a></li><li><a href="/reports">Reports</a></li>
<li><a href="/tags">{_junk_words(doc_id, 31, 2)}</a></li>
<li><a href="/contact">Contact</a></li>
</ul></nav>
</header>
<div class="breadcrumbs"><a href="/">Home</a> &raquo; <a href="/reports">Reports</a> &raquo; {title}</div>
<div class="layout">
<aside class="sidebar">
<h3>Related reports</h3>
<ul>
{sidebar_links}
</ul>
<div class="ad-box">Sponsored: {_junk_words(doc_id, 9, 5)} <a href="#">Learn more</a></div>
</aside>
<main class="content-area">
<article class="report">
{article}
</article>
</main>
</div>
<div class="comments">
<h3>Comments</h3>
{comments}
</div>
<footer class="site-footer">
<p>&copy; 2026 Example Corp. All rights reserved.</p>
<ul class="footer-links"><li><a href="/tos">Terms</a></li><li><a href="/privacy">Privacy</a></li></ul>
</footer>
</body></html>"""


TABLE_COLS = 3


def table_rows_of(doc_id: int, text: str) -> list[list[str]]:
    """Data-table body for the table-extraction fixture: 2 + doc_id % 3
    rows × TABLE_COLS cells drawn deterministically from the doc's own
    tokens — mirrored cell-for-cell by the SQL oracle."""
    words = text.split(" ")
    n_rows = 2 + doc_id % 3
    return [
        [words[(r * TABLE_COLS + c) % len(words)] for c in range(TABLE_COLS)]
        for r in range(n_rows)
    ]


def table_page_html(doc_id: int, text: str) -> str:
    """Page for the table-extraction fixture: a 1998-style LAYOUT table
    (nested tables, no <th>) whose menu cell also holds an inner layout
    table, and whose content cell holds the one DATA table (header row of
    <th> + token-derived body). A correct extractor must emit exactly the
    data table's cells and nothing from either layout table."""
    e = lambda s: _html.escape(s, quote=False)
    header = "".join(f"<th>c{c}</th>" for c in range(TABLE_COLS))
    body = "\n".join(
        "<tr>" + "".join(f"<td>{e(cell)}</td>" for cell in row) + "</tr>"
        for row in table_rows_of(doc_id, text)
    )
    menu = "\n".join(
        f'<li><a href="/cat/{(doc_id + k) % 40}">{_junk_words(doc_id, 80 + k, 2)}</a></li>'
        for k in range(4)
    )
    inner_layout = (
        '<table class="inner-layout"><tr>'
        f"<td>{_junk_words(doc_id, 90, 3)}</td>"
        '<td><a href="#">more</a></td>'
        "</tr></table>"
    )
    return f"""<html><head><title>Table report {doc_id:06d}</title></head>
<body>
<table class="layout" width="100%"><tr>
<td class="menu-cell" valign="top">
<ul>
{menu}
</ul>
{inner_layout}
</td>
<td valign="top">
<h1>Table report {doc_id:06d}</h1>
<table class="data">
<tr>{header}</tr>
{body}
</table>
</td>
</tr></table>
<div class="footer-links"><a href="/tos">Terms</a> &copy; 2026</div>
</body></html>"""
