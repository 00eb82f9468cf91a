"""Pixel-level projections/filters (SURVEY §2b: F1-F4).

All operations are whole-array numpy expressions — one vectorized pass per
image inside the Arrow UDF, never per-pixel Python.
"""

from __future__ import annotations

import numpy as np

# (R+G+B)/3 < 255*0.75  (reference OCRUtils.isBlack, utils/OCRUtils.java:188-195)
_BLACK_THRESHOLD = 255 * 0.75


def binarize(img: np.ndarray) -> np.ndarray:
    """uint8 image (h,w) gray or (h,w,3) RGB → bool grid, True = black.

    F1/F2: mirrors OCRUtils.filter + toGrid (utils/OCRUtils.java:168-178,
    134-145): a pixel is black iff mean(R,G,B) < 191.25. For integer
    pixels the comparison is computed in integers — (R+G+B)/3 < 191.25
    ⟺ R+G+B < 573.75 ⟺ R+G+B <= 573 — identical result with no float64
    temporary (8x the memory traffic on big pages).
    """
    a = np.asarray(img)
    if a.dtype == np.uint8:
        if a.ndim == 3:
            s = a.sum(axis=2, dtype=np.uint16)
            return s <= 573
        return a < 192
    if a.ndim == 3:
        return a.astype(np.float64).mean(axis=2) < _BLACK_THRESHOLD
    return a.astype(np.float64) < _BLACK_THRESHOLD


def rows_populated(grid: np.ndarray) -> np.ndarray:
    """F3: per-row 'contains any black pixel' (OCRUtils.isRowPopulated :154-160)."""
    return grid.any(axis=1)


def remove_leading_spaces(text: str) -> str:
    """F4: strip the min common leading-space count across lines
    (OCRUtils.removeLeadingSpaces, utils/OCRUtils.java:46-55)."""
    lines = text.split("\n")
    common = min((len(ln) - len(ln.lstrip(" ")) for ln in lines), default=0)
    if common == 0:
        return text
    return "\n".join(ln[common:] for ln in lines)
