"""Scan-side metrics operators (SURVEY §2g A7/A8, §2i X5).

A7 — font-size estimate: mean over a letter's merged pieces of
     trained_ratio(letter, mod) * piece_height, converted px→pt
     (OCRActions.getFontSize, recognition/OCRActions.java:272-289).
     Deviation from the reference documented in SURVEY §3.3: its memo cache
     ignores the modifier (OCRDatabaseManager.java:384); we look up by
     (letter, modifier) — the cache quirk is internal-only.
A8 — diff-based line accuracy, the reference's only published quality bar
     (test/fonts/Accuracy.java:79-107): per line, diff against the
     expectation; differences += max(inserted, deleted); accuracy =
     1 - diff / (lines * len(expected)).
X5 — pixel↔point via 4/3 (utils/ConversionUtils.java:19-31).
"""

from __future__ import annotations

import difflib
from typing import TYPE_CHECKING

if TYPE_CHECKING:  # pragma: no cover
    from ..model import FontModel
    from .scan import ImageLetter


def pixel_to_point(px: float) -> float:
    return px * 3.0 / 4.0


def point_to_pixel(pt: float) -> float:
    return pt * 4.0 / 3.0


def font_size_of(letter: "ImageLetter", model: "FontModel") -> float | None:
    """A7: estimated pt size of one recognized letter."""
    pieces = letter.merged_pieces or [(letter.letter, letter.mod, letter.height)]
    sizes = []
    for lt, mod, height in pieces:
        ratio = model.font_size_ratios.get((lt, mod))
        if ratio is not None:
            sizes.append(ratio * height)
    if not sizes:
        return None
    return pixel_to_point(sum(sizes) / len(sizes))


def line_accuracy(got_lines: list[str], expected: str) -> float:
    """A8: Accuracy.java semantics with difflib as the diff engine; spaces
    trimmed per line as the harness does (Accuracy.java:32,85)."""
    differences = 0
    for line in got_lines:
        sm = difflib.SequenceMatcher(a=expected.strip(), b=line.strip(), autojunk=False)
        inserted = deleted = 0
        for op, i1, i2, j1, j2 in sm.get_opcodes():
            if op in ("insert", "replace"):
                inserted += j2 - j1
            if op in ("delete", "replace"):
                deleted += i2 - i1
        differences += max(inserted, deleted)
    total = len(got_lines) * len(expected)
    return 1.0 - differences / total if total else 0.0
