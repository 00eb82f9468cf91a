"""Lightweight DOM + block segmentation for boilerplate stripping.

Stdlib ``html.parser.HTMLParser`` builds a tolerant element tree (no
external deps in this environment); the tree is then flattened into an
ordered list of *blocks* — maximal runs of inline content under a
block-level element — carrying the shallow text features that the
boilerplate classifier consumes (word counts, anchor-word counts, link
density, ancestor class/id tokens), after Kohlschuetter et al.,
"Boilerplate Detection Using Shallow Text Features" (WSDM 2010).

This module is pure Python and UDF-local: one document per call, inside
an Arrow batch. Nothing here touches Spark.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from html.parser import HTMLParser

VOID_TAGS = frozenset(
    "area base br col embed hr img input link meta param source track wbr".split()
)

# Tags that open a new text block when entered (CSS display:block-ish).
BLOCK_TAGS = frozenset(
    (
        "address article aside blockquote body caption dd details dialog div dl dt "
        "fieldset figcaption figure footer form h1 h2 h3 h4 h5 h6 header hgroup hr "
        "html li main nav ol p pre section summary table tbody td tfoot th thead tr ul"
    ).split()
)

HEADING_TAGS = frozenset({"h1", "h2", "h3", "h4", "h5", "h6"})

# Entire subtrees that are semantically never main content.
SKIP_TAGS = frozenset({"script", "style", "noscript", "template", "head", "svg"})

SEMANTIC_BOILER_TAGS = frozenset({"nav", "footer", "aside", "form"})


@dataclass
class Element:
    tag: str
    attrs: dict
    parent: "Element | None" = None
    children: list = field(default_factory=list)  # Element | str (text)
    depth: int = 0

    def class_tokens(self) -> set[str]:
        """Lowercased alnum tokens of this element's class/id attributes."""
        raw = f"{self.attrs.get('class', '')} {self.attrs.get('id', '')}".lower()
        out, cur = set(), []
        for ch in raw:
            if ch.isalnum():
                cur.append(ch)
            elif cur:
                out.add("".join(cur))
                cur = []
        if cur:
            out.add("".join(cur))
        return out

    def ancestors(self):
        node = self
        while node is not None:
            yield node
            node = node.parent


class _TreeBuilder(HTMLParser):
    """Tolerant tree builder: mismatched end tags pop to the nearest match
    (or are ignored), void tags never push, SKIP_TAGS content is dropped."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.root = Element("#root", {})
        self.stack = [self.root]
        self._skip_depth = 0

    def handle_starttag(self, tag, attrs):
        tag = tag.lower()
        if self._skip_depth:
            if tag in SKIP_TAGS:
                self._skip_depth += 1
            return
        if tag in SKIP_TAGS:
            self._skip_depth = 1
            return
        el = Element(tag, dict(attrs), parent=self.stack[-1],
                     depth=len(self.stack))
        self.stack[-1].children.append(el)
        if tag not in VOID_TAGS:
            self.stack.append(el)

    def handle_startendtag(self, tag, attrs):
        tag = tag.lower()
        if self._skip_depth or tag in SKIP_TAGS:
            return
        el = Element(tag, dict(attrs), parent=self.stack[-1],
                     depth=len(self.stack))
        self.stack[-1].children.append(el)

    def handle_endtag(self, tag):
        tag = tag.lower()
        if self._skip_depth:
            if tag in SKIP_TAGS:
                self._skip_depth -= 1
            return
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].tag == tag:
                del self.stack[i:]
                return
        # unmatched end tag: ignore (tolerant parse)

    def handle_data(self, data):
        if self._skip_depth or not data:
            return
        self.stack[-1].children.append(data)


def parse_html(html: str) -> Element:
    builder = _TreeBuilder()
    builder.feed(html)
    builder.close()
    return builder.root


@dataclass
class Block:
    """One segment of the flattened document: a run of inline text, a
    heading, or a media element — plus the shallow features used by the
    classifier (web/boilerplate.py)."""

    index: int
    kind: str  # 'text' | 'heading' | 'media'
    text: str
    media_ref: str | None
    container: Element
    n_words: int = 0
    n_anchor_words: int = 0
    class_tokens: set = field(default_factory=set)
    semantic_boiler: bool = False
    in_figure: bool = False  # caption text rides with its media item
    label: str = ""  # filled by the classifier: 'content' | 'boiler'

    @property
    def link_density(self) -> float:
        return self.n_anchor_words / self.n_words if self.n_words else 0.0


def _normalize(fragments: list[str]) -> str:
    return " ".join("".join(fragments).split())


def _ancestor_context(el: Element) -> tuple[set, bool]:
    tokens: set = set()
    semantic = False
    for anc in el.ancestors():
        tokens |= anc.class_tokens()
        if anc.tag in SEMANTIC_BOILER_TAGS:
            semantic = True
        # header only counts as boiler chrome at page level (site header),
        # not inside an article
        if anc.tag == "header" and not any(
            a.tag in ("article", "main") for a in anc.ancestors()
        ):
            semantic = True
    return tokens, semantic


def segment_blocks(root: Element) -> list[Block]:
    """Flatten the tree into ordered blocks. A block closes whenever a
    block-level element starts or ends; <img> emits a media block at its
    position; anchor text is tallied separately for link density."""
    blocks: list[Block] = []
    frags: list[str] = []
    anchor_frags: list[str] = []
    state = {"container": root}

    def flush():
        text = _normalize(frags)
        if text:
            container = state["container"]
            kind = "heading" if container.tag in HEADING_TAGS else "text"
            tokens, semantic = _ancestor_context(container)
            anchor_words = len(_normalize(anchor_frags).split())
            blocks.append(
                Block(
                    index=len(blocks),
                    kind=kind,
                    text=text,
                    media_ref=None,
                    container=container,
                    n_words=len(text.split()),
                    n_anchor_words=anchor_words,
                    class_tokens=tokens,
                    semantic_boiler=semantic,
                    in_figure=any(
                        a.tag in ("figure", "figcaption")
                        for a in container.ancestors()
                    ),
                )
            )
        frags.clear()
        anchor_frags.clear()

    def walk(el: Element, in_anchor: bool):
        for child in el.children:
            if isinstance(child, str):
                frags.append(child)
                if in_anchor:
                    anchor_frags.append(child)
                continue
            if child.tag == "img":
                flush()
                src = child.attrs.get("src") or ""
                tokens, semantic = _ancestor_context(child)
                blocks.append(
                    Block(
                        index=len(blocks),
                        kind="media",
                        text="",
                        media_ref=src,
                        container=child,
                        class_tokens=tokens,
                        semantic_boiler=semantic,
                    )
                )
                continue
            if child.tag == "br":
                frags.append(" ")
                continue
            if child.tag in BLOCK_TAGS:
                flush()
                prev = state["container"]
                state["container"] = child
                walk(child, in_anchor)
                flush()
                state["container"] = prev
            else:
                walk(child, in_anchor or child.tag == "a")
        # text directly under the current container after the last child
        # is flushed by the caller

    walk(root, False)
    flush()
    return blocks


def page_title(root: Element) -> str:
    """<title> text, if present (head is skipped by the tree builder, so
    look for the first <h1> instead; fall back to empty)."""
    result: list[str] = []

    def find(el: Element):
        for child in el.children:
            if isinstance(child, str):
                continue
            if child.tag == "h1" and not result:
                texts = [c for c in child.children if isinstance(c, str)]
                result.append(_normalize(texts))
                return
            find(child)

    find(root)
    return result[0] if result else ""
