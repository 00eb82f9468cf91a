"""Deterministic text renderer (training-image generator analogue).

Mirrors the layout contract of ComputerTrainGenerator
(train/ComputerTrainGenerator.java:37-89): one line of RAW_STRING per font
size, left margin, fixed inter-line gap, white background — but with our
SparkGrid bitmap font at exact integer scales, so the rendered goldens are
bit-deterministic (SURVEY §7: goldens come from our renderer + the
reference's algorithm semantics).

One deliberate deviation: training lines are laid out smallest-size-first
(ascending scale). The reference renders largest-first, but with its
coarse size steps two adjacent lines can hit the pass-2 line-merge gate
(belowHeight/currentHeight <= 0.5, OCRActions.java:344-362); ascending
order makes that ratio always > 1 and is equally valid training input.
"""

from __future__ import annotations

import numpy as np

from .glyphs import (
    DEFAULT_FACE, FontFace, GLYPHS, MARGIN_LEFT, SPACE_WIDTH, TRACKING,
    pt_to_scale,
)

# The reference's scan/train alphabets (recognition/OCRScan.java:39,
# recognition/OCRTrain.java:37) — verbatim.
RAW_STRING = (
    "!\"#$%&'()*+,-./0123456789:;<=>?@ABCDEFGHIJKLMNOPQRSTUVWXYZ"
    "[\\]^_`abcdefghijklmnopqrstuvwxyz{|}~W W"
)
TRAIN_STRING = (
    "!!\"#$%%%&'()*+,-./0123456789::;;<==>??@ABCDEFGHIJKLMNOPQRSTUVWXYZ"
    "[\\]^_`abcdefghiijjklmnopqrstuvwxyz{|}~W W"
)

# scales the trainer covers; "pt" size == 12 * scale
TRAIN_SCALES = (1, 2, 3, 4, 5, 6, 7, 8)


def render_line(text: str, face: FontFace = DEFAULT_FACE) -> np.ndarray:
    """Render one text line at design scale 1 → bool grid (cell_height, w)."""
    cols: list[np.ndarray] = []
    track = np.zeros((face.cell_height, face.tracking), dtype=bool)
    first = True
    for ch in text:
        if ch == " ":
            cols.append(
                np.zeros(
                    (face.cell_height, face.space_width + face.tracking), dtype=bool
                )
            )
            first = True  # the space includes the following tracking
            continue
        if not first:
            cols.append(track)
        cols.append(face.glyphs[ch])
        first = False
    if not cols:
        return np.zeros((face.cell_height, 1), dtype=bool)
    return np.concatenate(cols, axis=1)


def render_text_image(
    lines: list[str], scale: int = 1, face: FontFace = DEFAULT_FACE
) -> np.ndarray:
    """Render text lines → uint8 grayscale image (white 255 / black 0).

    Layout at design scale then integer-upscale via np.kron, so every
    height/gap ratio the merge rules depend on is scale-invariant.
    Always pads a blank bottom row (the reference's line detector never
    flushes a run still open at the image edge — OCRActions.java:299-340).
    """
    rendered = [render_line(ln, face) for ln in lines]
    width = max(r.shape[1] for r in rendered) + MARGIN_LEFT + 1
    rows: list[np.ndarray] = []
    gap = np.zeros((face.line_gap, width), dtype=bool)
    for i, r in enumerate(rendered):
        if i > 0:
            rows.append(gap)
        padded = np.zeros((face.cell_height, width), dtype=bool)
        padded[:, MARGIN_LEFT : MARGIN_LEFT + r.shape[1]] = r
        rows.append(padded)
    grid = np.concatenate(rows, axis=0)
    # top margin; bottom margin guarantees the final line is flushed
    grid = np.pad(grid, ((1, 1), (0, 0)))
    if scale > 1:
        grid = np.kron(grid, np.ones((scale, scale), dtype=bool))
    return np.where(grid, np.uint8(0), np.uint8(255))


def render_train_image(face: FontFace = DEFAULT_FACE) -> np.ndarray:
    """RAW_STRING at every training scale, ascending, one line per scale."""
    blocks: list[np.ndarray] = []
    for i, s in enumerate(TRAIN_SCALES):
        img = render_text_image([RAW_STRING], scale=s, face=face)
        if i > 0:
            blocks.append(np.full((face.line_gap, 1), 255, dtype=np.uint8))
        blocks.append(img)
    width = max(b.shape[1] for b in blocks)
    padded = [
        np.pad(b, ((0, 0), (0, width - b.shape[1])), constant_values=255)
        for b in blocks
    ]
    return np.concatenate(padded, axis=0)


def render_text_png(
    lines: list[str], scale: int = 1, face: FontFace = DEFAULT_FACE
) -> bytes:
    from ..codecs.png import encode_png

    return encode_png(render_text_image(lines, scale, face))
