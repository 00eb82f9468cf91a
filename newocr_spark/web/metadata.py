"""Page metadata extraction: clean title, author, published date.

Heuristics follow the public extractors, not the fixture generator:

* **title** — ``<title>`` tag text, de-branded the Readability.js way:
  split on separator runs (``|``, ``-``, en/em dash, ``»``, ``::``); if a
  segment matches the page's first ``<h1>``, that segment wins, else the
  longest segment; a missing/empty ``<title>`` falls back to the h1.
* **published date** — priority order used by trafilatura's date module:
  ``<meta property="article:published_time">`` (or ``name=date`` /
  ``itemprop=datePublished``), then ``<time datetime=...>``, then the
  first ISO ``YYYY-MM-DD`` inside a byline-classed block.
* **author** — ``<meta name="author">`` first, else the byline block
  (class/id token matching Readability's byline regex: byline, author,
  dateline, writtenby) with dates and "posted/written by" affixes
  stripped.

Everything is UDF-local pure Python over one page, like web/dom.py.
"""

from __future__ import annotations

import re
from html import unescape as _unescape

from .dom import Block, parse_html, segment_blocks

# --- head scanning (the DOM builder deliberately skips <head>) -------------

_TITLE_RE = re.compile(r"<title[^>]*>(.*?)</title\s*>", re.I | re.S)
_META_RE = re.compile(r"<meta\b[^>]*>", re.I)
_META_KEY_RE = re.compile(
    r"""(?:name|property|itemprop)\s*=\s*["']?([^"'\s>]+)""", re.I
)
_META_CONTENT_RE = re.compile(r"""content\s*=\s*("[^"]*"|'[^']*'|[^\s>]+)""", re.I)
_TIME_RE = re.compile(r"""<time\b[^>]*\bdatetime\s*=\s*["']?([^"'\s>]+)""", re.I)

_DATE_KEYS = frozenset(
    (
        "article:published_time articlepublished_time date publishdate "
        "publish_date published_time datepublished dc.date dc.date.issued "
        "og:published_time"
    ).split()
)
_AUTHOR_KEYS = frozenset("author article:author dc.creator og:author".split())

# no trailing \b: a timestamp's 'T' ("2025-11-03T08:30:00Z") is a word
# char, so a boundary there would reject full ISO datetimes
_ISO_DATE_RE = re.compile(r"\b(\d{4}-\d{2}-\d{2})")

BYLINE_TOKENS = frozenset("byline author dateline writtenby postmeta".split())
MAX_BYLINE_WORDS = 16  # Readability caps bylines at ~100 chars

_SEP_SPLIT_RE = re.compile(r"\s+[|\-–—\xbb]+\s+|\s+::\s+")


def _norm(s: str) -> str:
    return " ".join(_unescape(s).split())


def _scan_head(html: str) -> dict:
    """One regex pass over the raw markup for <title>, <meta>, <time> —
    cheap, order-preserving, tolerant of malformed heads."""
    out = {"raw_title": "", "meta_author": None, "meta_date": None, "time": None}
    m = _TITLE_RE.search(html)
    if m:
        out["raw_title"] = _norm(m.group(1))
    for tag in _META_RE.findall(html):
        key_m = _META_KEY_RE.search(tag)
        content_m = _META_CONTENT_RE.search(tag)
        if not key_m or not content_m:
            continue
        key = key_m.group(1).lower()
        content = _norm(content_m.group(1).strip("\"'"))
        if not content:
            continue
        if key in _DATE_KEYS and out["meta_date"] is None:
            out["meta_date"] = content
        elif key in _AUTHOR_KEYS and out["meta_author"] is None:
            out["meta_author"] = content
    t = _TIME_RE.search(html)
    if t:
        out["time"] = _norm(t.group(1))
    return out


def _clean_title(raw_title: str, h1: str) -> str:
    if not raw_title:
        return h1
    parts = [p for p in _SEP_SPLIT_RE.split(raw_title) if p]
    if len(parts) <= 1:
        return raw_title
    if h1:
        for p in parts:
            if p.casefold() == h1.casefold():
                return p
    return max(parts, key=len)


def _find_byline(blocks: list[Block]) -> str | None:
    for b in blocks:
        if b.kind != "text":
            continue
        if not (b.class_tokens & BYLINE_TOKENS):
            continue
        if 0 < b.n_words <= MAX_BYLINE_WORDS:
            return b.text
    return None


def _author_from_byline(byline: str) -> str | None:
    t = _ISO_DATE_RE.split(byline)[0]  # drop the date and what follows it
    t = re.sub(r"(?i)^\s*(posted\s+by|written\s+by|by)\b[:\s]*", "", t)
    t = re.sub(r"(?i)(\s+(on|at))?[\s\-–—|,:]*$", "", t)
    return t or None


def page_metadata(html: str) -> dict:
    """Extract ``{"title", "byline", "author", "published"}`` from one
    page. ``byline`` is the raw byline block text (queryable evidence);
    author/published are the cleaned fields."""
    head = _scan_head(html)
    root = parse_html(html)
    blocks = segment_blocks(root)
    # prefer a literal <h1> (sidebars often carry earlier h3s); fall back
    # to the first heading of any rank
    h1 = next(
        (b.text for b in blocks if b.kind == "heading" and b.container.tag == "h1"),
        next((b.text for b in blocks if b.kind == "heading"), ""),
    )
    byline = _find_byline(blocks)

    published = None
    for candidate in (head["meta_date"], head["time"]):
        if candidate:
            m = _ISO_DATE_RE.search(candidate)
            published = m.group(1) if m else candidate
            break
    if published is None and byline:
        m = _ISO_DATE_RE.search(byline)
        if m:
            published = m.group(1)

    author = head["meta_author"]
    if author is None and byline:
        author = _author_from_byline(byline)

    return {
        "title": _clean_title(head["raw_title"], h1),
        "byline": byline,
        "author": author,
        "published": published,
    }
