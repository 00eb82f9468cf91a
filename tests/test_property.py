"""Property-based cross-checks: the vectorized kernel operators must agree
with literal (slow, obviously-correct) transcriptions of the reference
algorithms on random inputs."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from newocr_spark.kernel.ccl import connected_components
from newocr_spark.kernel.features import featurize
from newocr_spark.kernel.lines import line_bounds


# ---------------- reference transcriptions ----------------

def _bfs_components(grid):
    """Literal SearchImage.scanFrom semantics (destructive 8-conn BFS in
    raster order, detection/SearchImage.java:42-115)."""
    g = grid.copy()
    h, w = g.shape
    comps = []
    for y in range(h):
        for x in range(w):
            if not g[y, x]:
                continue
            stack = [(x, y)]
            g[y, x] = False
            coords = []
            while stack:
                cx, cy = stack.pop()
                coords.append((cx, cy))
                for dx in (-1, 0, 1):
                    for dy in (-1, 0, 1):
                        nx, ny = cx + dx, cy + dy
                        if 0 <= nx < w and 0 <= ny < h and g[ny, nx]:
                            g[ny, nx] = False
                            stack.append((nx, ny))
            xs = [c[0] for c in coords]
            ys = [c[1] for c in coords]
            comps.append(
                (min(xs), min(ys), max(xs) - min(xs) + 1, max(ys) - min(ys) + 1,
                 frozenset(coords))
            )
    return comps


def _java_line_bounds(populated, max_pct=0.5):
    """Literal OCRActions.getLineBoundsForTraining (:292-365)."""
    lines = []
    height = 0
    n = len(populated)
    y = 0
    while y < n:
        if populated[y]:
            height += 1
        elif height > 0:
            height_until = 0
            final_space = -1
            for i in range(height):
                if y + i >= n:
                    final_space = 0
                    break
                if populated[y + i]:
                    if final_space == -1:
                        final_space = height_until
                else:
                    height_until += 1
            if final_space > 0 and height == final_space:
                y += final_space + 1
                height += final_space
                continue
            lines.append([y - height, y])
            height = 0
        y += 1
    remove = []
    i = 0
    while i < len(lines):
        cur = lines[i]
        ch = cur[1] - cur[0]
        if i != len(lines) - 1:
            below = lines[i + 1]
            bh = below[1] - below[0]
            if bh / ch <= max_pct and (cur[0] - below[0]) / ch <= max_pct:
                i += 1
                remove.append(i)
                cur[1] = below[1]
        i += 1
    for idx in sorted(remove, reverse=True):
        del lines[idx]
    return [(a, b) for a, b in lines]


# ---------------- properties ----------------

@settings(max_examples=80, deadline=None)
@given(
    st.integers(0, 2**32 - 1),
    st.integers(2, 24),
    st.integers(2, 24),
    st.floats(0.1, 0.7),
)
def test_ccl_matches_bfs(seed, h, w, density):
    rng = np.random.RandomState(seed)
    grid = rng.rand(h, w) < density
    got = connected_components(grid)
    exp = _bfs_components(grid)
    assert len(got) == len(exp)
    for g, e in zip(got, exp):
        assert (g.x, g.y, g.width, g.height) == e[:4]
        ys, xs = np.nonzero(g.grid)
        assert frozenset(zip((xs + g.x).tolist(), (ys + g.y).tolist())) == e[4]


@settings(max_examples=80, deadline=None)
@given(st.integers(0, 2**32 - 1), st.integers(1, 40))
def test_line_bounds_matches_java(seed, n):
    rng = np.random.RandomState(seed)
    populated = (rng.rand(n) < 0.6).tolist()
    assert line_bounds(populated) == _java_line_bounds(populated)


@settings(max_examples=60, deadline=None)
@given(st.integers(0, 2**32 - 1), st.integers(1, 15), st.integers(1, 15))
def test_featurize_bounds_and_shape(seed, h, w):
    rng = np.random.RandomState(seed)
    grid = rng.rand(h, w) < 0.5
    v = featurize(grid)
    assert v.shape == (17,)
    assert ((v >= 0.0) & (v <= 1.0)).all()
    # empty-segment rule: a glyph with no pixels anywhere still yields 1.0s
    z = featurize(np.zeros((h, w), dtype=bool))
    filled = featurize(np.ones((h, w), dtype=bool))
    assert np.allclose(filled, 1.0)
    assert ((z == 0.0) | (z == 1.0)).all()


# ---------------- text-level fuzz: render → scan is the identity ----------------

_GLYPH_ALPHABET = (
    "!\"#$%&'()*+,-./0123456789:;<=>?@ABCDEFGHIJKLMNOPQRSTUVWXYZ"
    "[\\]^_`abcdefghijklmnopqrstuvwxyz{|}~"
)

_words = st.text(alphabet=_GLYPH_ALPHABET, min_size=1, max_size=8)
# at least one alphanumeric (full-height glyph): a line whose tallest glyph
# is short (e.g. only '_') legitimately gains margin-relative leading
# spaces, because the reference measures the FIRST letter's gap from x=0
# (OCRScan.java:210: leftX = prev == null ? 0 : ...) against a usedWidth
# scaled by the line's max height — faithful behavior, pinned separately
_texts = (
    st.lists(_words, min_size=1, max_size=6)
    .map(" ".join)
    .filter(lambda t: any(c.isalnum() for c in t))
    # a space immediately before '!' is swallowed by the reference's
    # '!'-floor rule (spaces = floor(gap/usedWidth), OCRScan.java:217):
    # one space advance lands at gap/usedWidth ~ 0.86 < 1 in this font's
    # geometry at every scale — faithful behavior, pinned separately
    .filter(lambda t: " !" not in t)
    # '`' is the trained custom-space char: its override widens usedWidth
    # by the trained post-backtick gap ratio (A5), discounting a trailing
    # gap this renderer does not emit — a real space after '`' divides to
    # ~0.53 usedWidths and floors away; faithful to the trained tables
    .filter(lambda t: "` " not in t)
    # 'o' is a percent-dot (fonts/Default.conf puts lowercase o in the
    # percent-dot set) and PercentMergeRule matches on LINE-LIST adjacency
    # with no X-distance gate (PercentMergeRule.java:46-62): an 'o'
    # immediately left of '%' (even across a space — mergence runs before
    # space insertion) or an o/o sandwich gets consumed into a percent —
    # faithful behavior, pinned in test_percent_dot_hijack_reference_quirk
    .filter(lambda t: "o%" not in t.replace(" ", "") and "o/o" not in t.replace(" ", ""))
    # adjacent short vertical-line pieces merge pairwise in x-order into '"'
    # (ApostropheMergeRule pairs a piece with its NEXT list neighbor; an
    # apostrophe next to a quote steals the quote's left piece, two
    # apostrophes fuse) — faithful, pinned in
    # test_apostrophe_adjacency_reference_quirk
    .filter(lambda t: not any(
        p in t.replace(" ", "") for p in ("''", "'\"", "\"'")
    ))
    # a line whose ONLY tall glyphs are two-plus vertical lines (l, |) is
    # indistinguishable from a quote to the reference: ApostropheMergeRule
    # includes l/i/| in its vertical-line set and its comparator veto scans
    # the line for any non-excluded letter within 50% height — with no such
    # comparator, adjacent l's fuse into '"' (avgLength = height *
    # apostropheRatio ~ 2.5 spans any letter gap). Faithful, pinned in
    # test_lonely_vertical_pair_reference_quirk
    .filter(lambda t: sum(c in "l|" for c in t) < 2 or any(
        (c.isalnum() and c not in "l|") or c in "#$&@(){}[]/\\<>?" for c in t
    ))
)


@settings(max_examples=60, deadline=None)
@given(_texts, st.integers(min_value=1, max_value=3))
def test_render_scan_identity_fuzz(text, scale):
    """Any renderable string with a full-height glyph must survive render →
    binarize → segment → match → merge → space → assemble EXACTLY, at any
    integer scale — the end-to-end contract the per-operator semantics
    serve."""
    from newocr_spark.artifacts import get_model
    from newocr_spark.font.render import render_text_png
    from newocr_spark.kernel.scan import scan_image_bytes

    got = scan_image_bytes(render_text_png([text], scale), get_model())
    assert got == text, f"{text!r} @x{scale} -> {got!r}"


def test_percent_dot_hijack_reference_quirk():
    """'o' belongs to the percent-dot similarity set (the reference's
    Default.conf adds lowercase o), and PercentMergeRule takes the target's
    immediate LINE-LIST neighbors with only a Y-overlap gate — no X
    distance (PercentMergeRule.java:46-62). So when the rule visits the
    percent's left dot first, its neighbors are ('o', base) → the 'o' is
    consumed as a dot and the orphaned right dot cleans up to '.'; and an
    o/o sandwich around '/' (percent-base includes '/') fuses to '%'.
    Pinned so a 'fix' can't silently diverge from the reference."""
    from newocr_spark.artifacts import get_model
    from newocr_spark.font.render import render_text_png
    from newocr_spark.kernel.scan import scan_image_bytes

    m = get_model()
    for text, expected in (("o%", "%."), ("o %", "%."), ("o/o", "%"),
                           ("%o", "%o"), ("x/o", "x/o")):
        got = scan_image_bytes(render_text_png([text], 2), m)
        assert got == expected, f"{text!r} -> {got!r} (want {expected!r})"


def test_apostrophe_adjacency_reference_quirk():
    """ApostropheMergeRule pairs a short vertical-line piece with its NEXT
    line-list neighbor when their heights agree within 25% and the x-gap is
    inside height*apostropheRatio (ApostropheMergeRule.java:52-97) — so an
    apostrophe adjacent to a quote steals the quote's left piece ('0\\'"'
    → '0"\\''), and two apostrophes fuse into one quote ('a''b' → 'a"b').
    A nearby full-height reference char suppresses the merge ("|'", "l'",
    "'x'" all survive). Pinned faithful behavior."""
    from newocr_spark.artifacts import get_model
    from newocr_spark.font.render import render_text_png
    from newocr_spark.kernel.scan import scan_image_bytes

    m = get_model()
    for text, expected in (
        ("0'\"", "0\"'"), ("a''b", 'a"b'),
        ("|'", "|'"), ("l'", "l'"), ("'x'", "'x'"),
    ):
        got = scan_image_bytes(render_text_png([text], 2), m)
        assert got == expected, f"{text!r} -> {got!r} (want {expected!r})"


def test_lonely_vertical_pair_reference_quirk():
    """Two-plus vertical-line glyphs (l, |) ALONE on a line fuse into '"':
    the vertical-line similarity set includes full-height l/i/PIPE
    (VerticalLineSimilarityRule.java:16), the comparator veto only fires
    when some OTHER non-excluded letter sits within 50% height
    (ApostropheMergeRule.java:70-85 — an isolated pair has no such
    letter), and the trained apostropheRatio (quoteHeight/gap ~ 2.5,
    OCRTrain.java:163-165) makes avgLength span any letter gap. Any
    alphanumeric or tall-symbol comparator on the line suppresses the
    merge; the excluded small marks (period, comma, caret, tilde, ...)
    do not. Pinned faithful behavior (fuzz strategy excludes the class)."""
    from newocr_spark.artifacts import get_model
    from newocr_spark.font.render import render_text_png
    from newocr_spark.kernel.scan import scan_image_bytes

    m = get_model()
    for scale in (1, 2):
        for text, expected in (
            ("ll", '"'), ("l l", '"'), ("l|", '"'),
            ("ll a", "ll a"), ("llx", "llx"), ("ll 0", "ll 0"),
            ("ll .", '" .'), ("ll ~", '" ~'),
        ):
            got = scan_image_bytes(render_text_png([text], scale), m)
            assert got == expected, f"{text!r} @x{scale} -> {got!r} (want {expected!r})"


def test_short_glyph_line_leading_space_reference_quirk():
    """A line of only short glyphs shrinks fontSize to the glyph height, so
    the left margin rounds to leading space(s) — exactly what the
    reference computes (gap from x=0 for the first letter,
    OCRScan.java:210, against usedWidth = spaceRatio * max line height).
    Pin the faithful behavior so a 'fix' can't silently diverge."""
    from newocr_spark.artifacts import get_model
    from newocr_spark.font.render import render_text_png
    from newocr_spark.kernel.scan import scan_image_bytes

    got = scan_image_bytes(render_text_png(["_"], 1), get_model())
    assert got.lstrip(" ") == "_" and got != "_"


def test_space_before_bang_floor_reference_quirk():
    """'x !' scans as 'x!': the reference floors (never rounds) the space
    count when the right-hand character is '!' (OCRScan.java:217), and one
    space advance sits just under one usedWidth in this font. Pinned as
    faithful behavior."""
    from newocr_spark.artifacts import get_model
    from newocr_spark.font.render import render_text_png
    from newocr_spark.kernel.scan import scan_image_bytes

    for scale in (1, 2, 3):
        assert scan_image_bytes(render_text_png(["0 !"], scale), get_model()) == "0!"


def test_custom_space_after_backtick_quirk():
    """The trained custom-space override for '`' (A5) inflates usedWidth by
    the measured post-backtick ratio, so a single real space after '`'
    under-counts to zero — consistent between trainer and scanner."""
    from newocr_spark.artifacts import get_model
    from newocr_spark.font.render import render_text_png
    from newocr_spark.kernel.scan import scan_image_bytes

    assert scan_image_bytes(render_text_png(["` 0"], 2), get_model()) == "`0"


# ---------------- WARC framing (sources/warc.py) ----------------

_payload_text = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)), max_size=400
)


@settings(max_examples=80, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 10**6), _payload_text), max_size=6))
def test_warc_framing_roundtrip_adversarial(docs):
    """Content-Length delimits, nothing else: payloads containing
    CRLFCRLF, 'WARC/1.0' lines, or raw HTML must round-trip exactly
    through pack → walk, record order and count preserved."""
    from newocr_spark.sources.warc import (
        doc_uri, response_record, walk_records, warcinfo_record,
    )

    # make payloads adversarial: embed framing lookalikes
    bombs = ["\r\n\r\n", "WARC/1.0\r\nContent-Length: 0\r\n\r\n", "HTTP/1.1 200 OK"]
    blob = warcinfo_record(7)
    expect = [("warcinfo", None, None, None, None)]
    for i, (did, text) in enumerate(docs):
        payload = text + bombs[i % len(bombs)] + text
        blob += response_record(did, payload)
        expect.append(
            ("response", doc_uri(did), 200, "text/html; charset=utf-8", payload)
        )
    got = walk_records(blob)
    assert got == expect
