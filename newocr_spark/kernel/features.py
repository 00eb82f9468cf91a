"""17-segment glyph featurization (SURVEY §2c: G5).

Faithful numpy re-expression of SearchCharacter.applySections/analyzeSlices
(character/SearchCharacter.java:82-107) and SegmentationUtils
(utils/SegmentationUtils.java:27-202):

  * 8 values: the glyph split into 2x2 quadrants (top-half→vertical-half,
    order TL, TR, BL, BR), each quadrant split diagonally into (top, bottom)
    fill fractions. Quirk replicated deliberately: the reference's
    ``index.get() == 1 || index.getAndIncrement() == 2`` short-circuits, so
    the diagonal slope flag is increasing=[False, True, True, True] for the
    four quadrants — NOT alternating (SearchCharacter.java:86).
  * 9 values: 3x3 grid fill fractions; third sizes use the reference's
    integer split: first = len/3, middle = len - 2*(len/3)
    (SegmentationUtils.java:52-53, 112-113).
  * empty segment (total == 0) → 1.0 (SearchCharacter.java:103).

Halves use topHeight = h/2 (bottom gets the remainder) and
leftWidth = w/2 (right gets the remainder) (SegmentationUtils.java:28-29, 80-81).
"""

from __future__ import annotations

import numpy as np

N_FEATURES = 17

# quadrant order TL, TR, BL, BR; reference slope flags (see module docstring)
_DIAG_INCREASING = (False, True, True, True)


def _diagonal_pairs(section: np.ndarray, increasing: bool) -> tuple[tuple[int, int], tuple[int, int]]:
    """(topTrue, topSize), (bottomTrue, bottomSize) per SegmentationUtils.getDiagonal.

    For each column x: y_pos = int(slope*x) (or int(h - slope*x) if
    increasing); rows y < y_pos count as 'bottom', the rest as 'top'
    (SegmentationUtils.java:154-202).
    """
    h, w = section.shape
    if h == 0 or w == 0:
        return (0, 0), (0, 0)
    slope = h / w
    xs = np.arange(w, dtype=np.float64)
    y = slope * xs
    if increasing:
        y = h - y
    y_pos = y.astype(np.int64)  # Java (int) cast truncation; values are >= 0 here
    rows = np.arange(h, dtype=np.int64)[:, None]
    bottom_mask = rows < y_pos[None, :]
    bottom_true = int(section[bottom_mask].sum())
    bottom_size = int(bottom_mask.sum())
    total_true = int(section.sum())
    return (total_true - bottom_true, h * w - bottom_size), (bottom_true, bottom_size)


def _pct(true: int, size: int) -> float:
    return 1.0 if size == 0 else true / size


def featurize(grid: np.ndarray) -> np.ndarray:
    """bool glyph grid → float64[17] segment percentages."""
    g = np.ascontiguousarray(grid, dtype=bool)
    h, w = g.shape
    out = np.empty(N_FEATURES, dtype=np.float64)

    # --- 8 diagonal-split quadrant values ---
    top_h = h // 2
    left_w = w // 2
    quadrants = (
        g[:top_h, :left_w], g[:top_h, left_w:],
        g[top_h:, :left_w], g[top_h:, left_w:],
    )
    k = 0
    for q, inc in zip(quadrants, _DIAG_INCREASING):
        (tt, ts), (bt, bs) = _diagonal_pairs(q, inc)
        out[k] = _pct(tt, ts)
        out[k + 1] = _pct(bt, bs)
        k += 2

    # --- 9 grid values: horizontal thirds × vertical thirds ---
    th = h // 3
    mh = h - 2 * th
    tw = w // 3
    mw = w - 2 * tw
    row_cuts = (0, th, th + mh, h)
    col_cuts = (0, tw, tw + mw, w)
    for r in range(3):
        block_rows = g[row_cuts[r] : row_cuts[r + 1]]
        for c in range(3):
            block = block_rows[:, col_cuts[c] : col_cuts[c + 1]]
            out[k] = _pct(int(block.sum()), block.size)
            k += 1
    return out


def featurize_many(grids: list[np.ndarray]) -> np.ndarray:
    """Featurize a batch of glyph grids → (n, 17) float64."""
    if not grids:
        return np.empty((0, N_FEATURES), dtype=np.float64)
    return np.stack([featurize(g) for g in grids])
