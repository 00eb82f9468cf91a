"""Line-bounds detection (SURVEY §2c: G1).

Faithful port of OCRActions.getLineBoundsForTraining
(recognition/OCRActions.java:292-365), used by the reference for both
training and scanning:

  pass 1 — runs of populated rows become (topY, bottomY) pairs. When an
  unpopulated gap appears after a run of height h, the next h rows are
  probed: if the gap until the next populated row equals h exactly, the gap
  is swallowed into the line (the dot-of-an-i heuristic, :310-331).

  pass 2 — an adjacent following line merges into the current one when
  belowHeight/currentHeight <= maxPercentDiffToMerge and
  (current.top - below.top)/currentHeight <= maxPercentDiffToMerge
  (underscore heuristic, :344-362; option train/OCROptions.java:62-78,
  default 0.5). Note the second operand is top-minus-top, which is negative
  for ordered lines — replicated as-is.

Quirk replicated deliberately: the reference never flushes a run still open
at the bottom edge of the image (the loop ends without appending), so an
image whose last row is populated loses its final line. Our renderer always
pads a blank bottom row; this port keeps the reference behavior.
"""

from __future__ import annotations

import numpy as np


def line_bounds(populated: np.ndarray, max_percent_diff_to_merge: float = 0.5) -> list[tuple[int, int]]:
    """bool[h] per-row populated flags → list of (topY, bottomY) line bounds."""
    pop = np.asarray(populated, dtype=bool)
    n = len(pop)
    lines: list[list[int]] = []

    height = 0
    y = 0
    while y < n:
        if pop[y]:
            height += 1
        elif height > 0:
            height_until = 0
            final_space = -1
            for i in range(height):
                if y + i >= n:
                    final_space = 0
                    break
                if pop[y + i]:
                    if final_space == -1:
                        final_space = height_until
                else:
                    height_until += 1
            if final_space > 0 and height == final_space:
                # swallow the gap (dot-of-i): jump past it, count it as height
                y += final_space
                height += final_space
                y += 1
                continue
            lines.append([y - height, y])
            height = 0
        y += 1

    # pass 2: merge small adjacent lines (underscores)
    remove: list[int] = []
    i = 0
    while i < len(lines):
        current = lines[i]
        current_height = current[1] - current[0]
        if i != len(lines) - 1 and current_height > 0:
            below = lines[i + 1]
            below_height = below[1] - below[0]
            if (
                below_height / current_height <= max_percent_diff_to_merge
                and (current[0] - below[0]) / current_height <= max_percent_diff_to_merge
            ):
                i += 1
                remove.append(i)
                current[1] = below[1]
        i += 1

    for idx in sorted(remove, reverse=True):
        del lines[idx]
    return [(a, b) for a, b in lines]
