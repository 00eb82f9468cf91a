"""Boilerplate classification + main-content selection over DOM blocks.

Heuristics follow the public literature, not the fixture generator:

* shallow text features — word count, link density, contextual smoothing
  across neighbour blocks (Kohlschuetter et al., WSDM 2010 boilerpipe
  NumWordsRulesClassifier shape);
* class/id token lists and parent scoring in the spirit of
  arc90 Readability / Mozilla Readability.js (public domain heuristics):
  blacklist tokens vote a subtree out, whitelist tokens vote it in;
* main-container selection: each content block contributes
  ``words * (1 - link_density)`` to every ancestor; the *deepest* element
  retaining >= 95% of the best score wins, which picks <article>/<main>
  over <body> without hardcoding tag names.

Everything is deterministic (ties resolve to document order).
"""

from __future__ import annotations

from .dom import Block, Element, parse_html, segment_blocks

BLACKLIST_TOKENS = frozenset(
    (
        "nav menu navbar breadcrumb breadcrumbs footer sidebar aside ad ads advert "
        "advertisement banner promo sponsored comment comments share social related "
        "widget cookie copyright legal disclaimer pagination pager masthead subnav "
        "toolbar dropdown login signup newsletter popup modal skyscraper outbrain "
        # byline detection after Readability.js REGEXPS.byline — author/date
        # rows otherwise ride a container's whitelist token into the output
        "byline author dateline writtenby topbar"
    ).split()
)

WHITELIST_TOKENS = frozenset(
    (
        "article articlebody content main maincontent post entry story body text "
        "blog page prose"
    ).split()
)

MAX_LINK_DENSITY = 0.40
MIN_CONTENT_WORDS = 8
MIN_STANDALONE_WORDS = 4


def _base_label(b: Block) -> str:
    if b.kind == "media":
        return "media"
    if b.semantic_boiler or (b.class_tokens & BLACKLIST_TOKENS):
        return "boiler"
    if b.link_density > MAX_LINK_DENSITY:
        return "boiler"
    if b.class_tokens & WHITELIST_TOKENS and b.n_words >= 1:
        return "content"
    if b.n_words >= MIN_CONTENT_WORDS:
        return "content"
    if b.link_density == 0.0 and b.n_words >= MIN_STANDALONE_WORDS:
        return "content"
    return "boiler"


def classify_blocks(blocks: list[Block]) -> None:
    """Label every block 'content' / 'boiler' ('media' resolved later
    relative to the main container). Three passes: base rules, neighbour
    smoothing, heading attachment."""
    for b in blocks:
        b.label = _base_label(b)

    text_blocks = [b for b in blocks if b.kind in ("text", "heading")]

    # contextual smoothing: a short, link-free, non-blacklisted block
    # sandwiched between (or adjacent to) content from the same parent
    # element flips to content (trailing short paragraphs, captions)
    for i, b in enumerate(text_blocks):
        if b.label != "boiler" or b.kind == "heading":
            continue
        if b.semantic_boiler or (b.class_tokens & BLACKLIST_TOKENS):
            continue
        if b.link_density > 0.33:
            continue
        prev_c = i > 0 and text_blocks[i - 1].label == "content"
        next_c = i + 1 < len(text_blocks) and text_blocks[i + 1].label == "content"
        same_parent = (
            (prev_c and text_blocks[i - 1].container.parent is b.container.parent)
            or (next_c and text_blocks[i + 1].container.parent is b.container.parent)
        )
        if (prev_c and next_c) or same_parent:
            b.label = "content"

    # a heading is content iff one of the next two text blocks is content
    for i, b in enumerate(text_blocks):
        if b.kind != "heading":
            continue
        if b.semantic_boiler or (b.class_tokens & BLACKLIST_TOKENS):
            b.label = "boiler"
            continue
        following = [x for x in text_blocks[i + 1 : i + 3] if x.kind == "text"]
        b.label = "content" if any(x.label == "content" for x in following) else "boiler"


def select_main_container(blocks: list[Block]) -> Element | None:
    """Deepest element whose accumulated content score is >= 95% of the
    maximum. Content blocks score words*(1-link_density) into every
    ancestor; <body>/<html> tie with the true article container, so depth
    breaks the tie toward the article."""
    scores: dict[int, float] = {}
    nodes: dict[int, Element] = {}
    for b in blocks:
        if b.label != "content" or b.kind != "text":
            continue
        contrib = b.n_words * (1.0 - b.link_density)
        # score ancestors from the PARENT up: a block must not elect its
        # own element (that would orphan sibling headings/media), and
        # headings don't vote (an orphan heading can't drag the container
        # to a shallower common ancestor)
        anc = b.container.parent
        while anc is not None:
            key = id(anc)
            scores[key] = scores.get(key, 0.0) + contrib
            nodes[key] = anc
            anc = anc.parent
    if not scores:
        return None
    best = max(scores.values())
    candidates = [nodes[k] for k, v in scores.items() if v >= 0.95 * best]
    return max(candidates, key=lambda el: el.depth)


def _inside(el: Element, container: Element) -> bool:
    return any(anc is container for anc in el.ancestors())


def extract_content(html: str) -> dict:
    """Parse → segment → classify → select. Returns::

        {"title": str,
         "items": [(kind, text, media_ref)],   # document order, kind in
                                               # {'heading','text','media'}
         "n_blocks": int, "n_boiler": int}

    Media inside the main container survives unless its own subtree is
    boilerplate (ad images, logos); media text is None.
    """
    root = parse_html(html)
    blocks = segment_blocks(root)
    classify_blocks(blocks)
    main = select_main_container(blocks)

    items: list[tuple[str, str | None, str | None]] = []
    title = ""
    for b in blocks:
        if main is None or not _inside(b.container, main):
            continue
        if b.kind == "media":
            if b.semantic_boiler or (b.class_tokens & BLACKLIST_TOKENS):
                continue
            if b.media_ref:
                items.append(("media", None, b.media_ref))
        elif b.in_figure:
            continue  # captions attach to their media item, not body text
        elif b.label == "content":
            if b.kind == "heading" and not title:
                title = b.text
            items.append((b.kind, b.text, None))
    n_boiler = sum(1 for b in blocks if b.label == "boiler")
    return {
        "title": title,
        "items": items,
        "n_blocks": len(blocks),
        "n_boiler": n_boiler,
    }


def main_text(html: str) -> str:
    """Paragraph text of the main content (headings excluded), joined by
    blank lines — the conventional clean-text emission."""
    out = extract_content(html)
    return "\n\n".join(t for k, t, _ in out["items"] if k == "text")
