"""Connected-component labelling (SURVEY §2c: G2/G3).

The reference raster-scans the grid and BFS flood-fills with 8-connectivity
from each black pixel, destructively clearing visited pixels
(recognition/OCRActions.java:63-82, detection/SearchImage.java:42-115).
The observable contract is: the set of 8-connected components, each with its
bounding box and cropped pixel grid, discovered in raster order of each
component's first-encountered pixel.

We reproduce that contract with run-based two-pass labelling: horizontal
runs per row are found vectorized (np.diff on the padded row bitmap), then
union-find joins runs of adjacent rows whose column intervals touch within
±1 (8-connectivity). This is O(runs α(runs)) with only small-Python work
proportional to the number of runs, not pixels — no scipy in this env.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np


@dataclass
class Component:
    """One glyph blob: bbox + cropped grid (SearchCharacter.java:39-77)."""

    x: int
    y: int
    width: int
    height: int
    grid: np.ndarray  # (height, width) bool, cropped
    pixel_count: int = 0
    # carried through matching/mergence
    extras: dict = field(default_factory=dict)


def _runs_per_row(grid: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Vectorized horizontal run extraction.

    Returns (row_idx, start_col, end_col_exclusive) arrays over all runs,
    ordered by (row, start).
    """
    h, w = grid.shape
    padded = np.zeros((h, w + 2), dtype=bool)
    padded[:, 1:-1] = grid
    d = np.diff(padded.astype(np.int8), axis=1)
    starts = np.nonzero(d == 1)
    ends = np.nonzero(d == -1)
    # np.nonzero returns row-major order, so starts/ends align pairwise per row
    return starts[0], starts[1], ends[1]


def _union_pairs(rows: np.ndarray, starts: np.ndarray, ends: np.ndarray,
                 height: int) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized 8-conn overlap pairs between runs of adjacent rows.

    Runs within a row are sorted and disjoint, so for a run [sb, eb) in row
    r+1, the overlapping runs of row r form the contiguous index range
    [searchsorted(ends_r, sb), searchsorted(starts_r, eb, 'right')).
    Per-row searches collapse into two GLOBAL searchsorted calls on
    composite row-major keys (row*K + col, K > any col): every row's key
    block is disjoint and internally sorted, so a probe keyed to row r-1
    lands inside that row's segment automatically — no Python loop over
    rows, no per-row slicing.
    """
    n = len(rows)
    if n == 0:
        e = np.empty(0, dtype=np.int64)
        return e, e
    K = np.int64(int(ends.max()) + 2)
    start_keys = rows.astype(np.int64) * K + starts
    end_keys = rows.astype(np.int64) * K + ends
    prev = (rows.astype(np.int64) - 1) * K
    # overlap in row above: runs a with ea >= sb AND sa <= eb — half-open
    # runs touching at a column (ea == sb / sa == eb) are diagonal
    # neighbours, which 8-connectivity joins
    lo = np.searchsorted(end_keys, prev + starts, side="left")
    hi = np.searchsorted(start_keys, prev + ends, side="right")
    # empty previous row → lo/hi land on the same segment boundary → 0
    counts = np.maximum(hi - lo, 0)
    total = int(counts.sum())
    if total == 0:
        e = np.empty(0, dtype=np.int64)
        return e, e
    b_idx = np.repeat(np.arange(n, dtype=np.int64), counts)
    csum = np.cumsum(counts) - counts
    a_idx = np.arange(total, dtype=np.int64) - np.repeat(csum, counts) + np.repeat(lo, counts)
    return a_idx, b_idx


def connected_components(grid: np.ndarray) -> list[Component]:
    """8-connected components of a bool grid, in reference discovery order."""
    if grid.size == 0:
        return []
    rows, starts, ends = _runs_per_row(grid)
    n_runs = len(rows)
    if n_runs == 0:
        return []

    pair_a, pair_b = _union_pairs(rows, starts, ends, grid.shape[0])
    # min-label propagation with pointer jumping (vectorized union-find):
    # converges to the per-component minimum run index
    labels = np.arange(n_runs, dtype=np.int64)
    while True:
        prev = labels.copy()
        if len(pair_a):
            np.minimum.at(labels, pair_a, labels[pair_b])
            np.minimum.at(labels, pair_b, labels[pair_a])
        labels = np.minimum(labels, labels[labels])
        labels = np.minimum(labels, labels[labels])
        if np.array_equal(labels, prev):
            break

    roots = labels
    # root → discovery index, in (row, start) order of first run.
    # np.unique sorts roots ascending; the root IS the component's first
    # run index (minimum), so ascending == raster discovery order
    first_seen, inverse = np.unique(roots, return_inverse=True)
    comp_of_run = inverse

    n_comp = len(first_seen)
    min_x = np.full(n_comp, np.iinfo(np.int64).max, dtype=np.int64)
    max_x = np.full(n_comp, -1, dtype=np.int64)
    min_y = np.full(n_comp, np.iinfo(np.int64).max, dtype=np.int64)
    max_y = np.full(n_comp, -1, dtype=np.int64)
    counts = np.zeros(n_comp, dtype=np.int64)
    np.minimum.at(min_x, comp_of_run, starts)
    np.maximum.at(max_x, comp_of_run, ends - 1)
    np.minimum.at(min_y, comp_of_run, rows)
    np.maximum.at(max_y, comp_of_run, rows)
    np.add.at(counts, comp_of_run, ends - starts)

    comps: list[Component] = []
    for c in range(n_comp):
        x0, x1 = int(min_x[c]), int(max_x[c])
        y0, y1 = int(min_y[c]), int(max_y[c])
        comps.append(
            Component(
                x=x0, y=y0,
                width=x1 - x0 + 1, height=y1 - y0 + 1,
                grid=np.zeros((y1 - y0 + 1, x1 - x0 + 1), dtype=bool),
                pixel_count=int(counts[c]),
            )
        )

    # vectorized run → pixel expansion, then one fancy-index fill per comp
    lengths = ends - starts
    total = int(lengths.sum())
    csum = np.cumsum(lengths) - lengths
    px_col = np.repeat(starts, lengths) + (np.arange(total) - np.repeat(csum, lengths))
    px_row = np.repeat(rows, lengths)
    px_comp = np.repeat(comp_of_run, lengths)
    order = np.argsort(px_comp, kind="stable")
    px_row, px_col, px_comp = px_row[order], px_col[order], px_comp[order]
    breaks = np.searchsorted(px_comp, np.arange(n_comp + 1))
    for c in range(n_comp):
        s, e = breaks[c], breaks[c + 1]
        comp = comps[c]
        comp.grid[px_row[s:e] - comp.y, px_col[s:e] - comp.x] = True
    return comps
