"""Full recognition kernel: bool grid → recognized text lines.

This is the UDF-local core (SURVEY §3.1 steps 3-10) — pure numpy + small
Python over per-image glyph lists, exactly the granularity at which the
reference is imperative. Pipeline:

  line_bounds (G1) → connected_components (G2/G3) → featurize (G5)
  → line assignment, consume-on-match (J2/X1, OCRScan.java:142-166)
  → vectorized NN vs the broadcast font model (J1, OCRActions.java:197-269)
  → mergence rules (M1-M6) → space insertion (O3, OCRScan.java:189-238)
  → assembly (O1/O2/O4).

The NN hot loop is one (n_glyphs, N_trained) matrix expression instead of
the reference's per-character hash-map loop (OCRActions.java:199-210).

Deterministic deviation (documented): the reference sorts NN candidates with
equal scores in hash-map iteration order and runs merge rules over
ConcurrentHashMap iteration order — both nondeterministic in Java. We
tie-break candidates by (letter, modifier) and iterate letters in reading
order (line insertion order, then x), which is deterministic and matches the
reference wherever the reference itself is well-defined.
"""

from __future__ import annotations

import numpy as np

from ..model import FontModel
from .ccl import connected_components
from .features import featurize_many
from .grid import binarize, rows_populated
from .lines import line_bounds
from .mergence import run_mergence
from .spacing import insert_spaces


class ImageLetter:
    """A matched glyph (character/ImageLetter.java)."""

    __slots__ = (
        "letter", "mod", "x", "y", "width", "height",
        "avg_w", "avg_h", "ratio", "min_center", "max_center",
        "closest", "amount_of_merges", "merged_pieces", "center_offset",
    )

    def __init__(self, letter, mod, x, y, width, height, avg_w, avg_h,
                 ratio, min_center=0.0, max_center=0.0):
        self.letter = letter
        self.mod = mod
        self.x = x
        self.y = y
        self.width = width
        self.height = height
        self.avg_w = avg_w
        self.avg_h = avg_h
        self.ratio = ratio
        self.min_center = min_center
        self.max_center = max_center
        self.closest: list[tuple] = []  # [(letter, mod, avg_w, avg_h, score)]
        self.amount_of_merges = 0
        # pieces merged into this letter: [(letter, mod, height)] incl. self
        self.merged_pieces: list[tuple[str, int, int]] | None = None
        self.center_offset = 0.0

    def set_next_closest(self) -> None:
        """ImageLetter.setNextClosest (ImageLetter.java:203-205): adopt the
        next-best NN candidate's identity/averages."""
        letter, mod, avg_w, avg_h, _score = self.closest.pop(0)
        self.letter = letter
        self.mod = mod
        self.avg_w = avg_w
        self.avg_h = avg_h

    def merge(self, other: "ImageLetter") -> None:
        """CoordinateCharacter.merge (:30-77). Union bboxes; note the
        reference quirk: merged width/height lose the +1 used at
        construction (:67-68) — replicated."""
        if self.merged_pieces is None:
            self.merged_pieces = [(self.letter, self.mod, self.height)]
        if other.merged_pieces is not None:
            self.merged_pieces.extend(other.merged_pieces)
        else:
            self.merged_pieces.append((other.letter, other.mod, other.height))
        self.amount_of_merges += 1
        min_x = min(self.x, other.x)
        max_x = max(self.x + self.width - 1, other.x + other.width - 1)
        min_y = min(self.y, other.y)
        max_y = max(self.y + self.height - 1, other.y + other.height - 1)
        self.x, self.y = min_x, min_y
        self.width = max_x - min_x
        self.height = max_y - min_y

    def overlaps_x(self, other: "ImageLetter") -> bool:
        """Character.isOverlappingX (character/Character.java:150-156)."""
        return (self.x + self.width > other.x) and (other.x + other.width > self.x)

    def overlaps_y(self, other: "ImageLetter") -> bool:
        return (self.y + self.height > other.y) and (other.y + other.height > self.y)

    def __repr__(self) -> str:  # pragma: no cover
        return f"<{self.letter!r}/{self.mod} @({self.x},{self.y}) {self.width}x{self.height}>"


def _match_all(features: np.ndarray, ratios: np.ndarray, model: FontModel) -> tuple:
    """Vectorized NN scoring of all glyphs against the broadcast model (J1).

    score = sum((g - t)^2 over 17 segments)            (OCRUtils.java:90-99)
          + weight(letter) * (trained_ratio - glyph_ratio)^2
                                                        (OCRActions.java:248-258)
    Returns (order, scores): order[i] = candidate row indices sorted by
    (score, letter, modifier) — deterministic tie-break.
    """
    T = model.segments  # (N, 17)
    G = features        # (g, 17)
    seg_d = ((G[:, None, :] - T[None, :, :]) ** 2).sum(axis=-1)  # (g, N)
    tr = np.nan_to_num(model.trained_ratios, nan=0.0)
    ratio_d = model.ratio_weights[None, :] * (tr[None, :] - ratios[:, None]) ** 2
    scores = seg_d + ratio_d
    n = len(model.letters)
    letter_codes = np.array([ord(lm[0]) for lm in model.letters])
    mods = np.array([lm[1] for lm in model.letters])
    order = np.empty_like(scores, dtype=np.int64)
    for i in range(scores.shape[0]):
        order[i] = np.lexsort((mods, letter_codes, scores[i]))
    return order, scores


def scan_grid(grid: np.ndarray, model: FontModel) -> list[tuple[int, list[ImageLetter]]]:
    """bool grid → [(line_y, [ImageLetter sorted by x])] (OCRScan.scanImage)."""
    # G1 — line bounds on the uncut grid
    bounds = line_bounds(
        rows_populated(grid), model.config.max_percent_diff_to_merge
    )
    # G2/G3/G5 — components in discovery order, featurized
    comps = connected_components(grid)
    feats = featurize_many([c.grid for c in comps])
    ratios = np.array([c.width / c.height for c in comps], dtype=np.float64)
    if comps:
        order, scores = _match_all(feats, ratios, model)

    # J2 — line assignment: lines sorted by rounded center; each remaining
    # glyph whose vertical center falls in-bounds is consumed in discovery
    # order (OCRScan.java:142-166)
    line_entries = sorted(
        ((top, bottom, int(np.floor((bottom - top) / 2.0 + top + 0.5)))
         for top, bottom in bounds),
        key=lambda e: e[2],
    )
    remaining = list(range(len(comps)))
    sorted_lines: list[tuple[int, list[ImageLetter]]] = []
    for top, bottom, center_y in line_entries:
        matched: list[ImageLetter] = []
        still: list[int] = []
        for ci in remaining:
            c = comps[ci]
            center = c.y + c.height / 2.0
            if not (top <= center <= bottom):
                still.append(ci)
                continue
            cand = order[ci]
            head = int(cand[0])
            letter, mod = model.letters[head]
            il = ImageLetter(
                letter, mod, c.x, c.y, c.width, c.height,
                float(model.avg_width[head]), float(model.avg_height[head]),
                c.width / c.height,
                float(model.min_center[head]), float(model.max_center[head]),
            )
            il.center_offset = center - c.y
            il.closest = [
                (
                    model.letters[int(j)][0], model.letters[int(j)][1],
                    float(model.avg_width[int(j)]), float(model.avg_height[int(j)]),
                    float(scores[ci, int(j)]),
                )
                for j in cand[1:]
            ]
            matched.append(il)
        remaining = still
        if not matched:
            continue
        matched.sort(key=lambda l: l.x)
        sorted_lines.append((center_y, matched))

    # M1-M6 — mergence (mutates lines in place, may drop emptied lines)
    sorted_lines = run_mergence(sorted_lines, model)

    # O3 — spaces, per line, based on the line's max glyph height
    for _y, line in sorted_lines:
        if line:
            font_size = max(l.height for l in line)
            line.extend(insert_spaces(line, font_size, model))

    # O1/O2 — final ordering
    out: list[tuple[int, list[ImageLetter]]] = []
    for y, line in sorted(sorted_lines, key=lambda e: e[0]):
        out.append((y, sorted(line, key=lambda l: l.x)))
    return out


def render_text(lines: list[tuple[int, list[ImageLetter]]]) -> str:
    """O4: DefaultScannedImage.getPrettyString (:35-47)."""
    return "\n".join("".join(l.letter for l in line) for _y, line in lines)


def scan_image_bytes(png: bytes, model: FontModel) -> str:
    """Convenience: PNG bytes → recognized text."""
    from ..codecs.png import decode_png

    return render_text(scan_grid(binarize(decode_png(png)), model))
