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


class _UnionFind:
    __slots__ = ("parent",)

    def __init__(self, n: int) -> None:
        self.parent = list(range(n))

    def find(self, a: int) -> int:
        p = self.parent
        while p[a] != a:
            p[a] = p[p[a]]
            a = p[a]
        return a

    def union(self, a: int, b: int) -> None:
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            # keep the smaller root so earlier-discovered runs stay canonical
            if ra < rb:
                self.parent[rb] = ra
            else:
                self.parent[ra] = rb


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


def connected_components(grid: np.ndarray) -> list[Component]:
    """8-connected components of a bool grid, in reference discovery order."""
    if grid.size == 0:
        return []
    rows, starts, ends = _runs_per_row(grid)
    n_runs = len(rows)
    if n_runs == 0:
        return []

    uf = _UnionFind(n_runs)
    # row → (slice of run indices); rows array is sorted
    row_break = np.searchsorted(rows, np.arange(grid.shape[0] + 1))
    for r in range(1, grid.shape[0]):
        a0, a1 = row_break[r - 1], row_break[r]
        b0, b1 = row_break[r], row_break[r + 1]
        if a0 == a1 or b0 == b1:
            continue
        ia, ib = a0, b0
        # two-pointer sweep over sorted intervals; 8-conn: touch within ±1
        while ia < a1 and ib < b1:
            # prev-run [sa, ea), cur-run [sb, eb) overlap iff sb <= ea and sa <= eb
            sa, ea = starts[ia], ends[ia]
            sb, eb = starts[ib], ends[ib]
            if sb <= ea and sa <= eb:  # intervals expanded by 1 on each side touch
                uf.union(ia, ib)
            if ea < eb:
                ia += 1
            else:
                ib += 1

    roots = np.fromiter((uf.find(i) for i in range(n_runs)), dtype=np.int64, count=n_runs)
    order = {}  # root → discovery index, in (row, start) order of first run
    for i in range(n_runs):
        r = roots[i]
        if r not in order:
            order[r] = len(order)

    n_comp = len(order)
    min_x = np.full(n_comp, np.iinfo(np.int64).max, dtype=np.int64)
    max_x = np.full(n_comp, -1, dtype=np.int64)
    min_y = np.full(n_comp, np.iinfo(np.int64).max, dtype=np.int64)
    max_y = np.full(n_comp, -1, dtype=np.int64)
    counts = np.zeros(n_comp, dtype=np.int64)
    comp_of_run = np.fromiter((order[r] for r in roots), dtype=np.int64, count=n_runs)

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
    for i in range(n_runs):
        comp = comps[comp_of_run[i]]
        comp.grid[rows[i] - comp.y, starts[i] - comp.x : ends[i] - comp.x] = True
    return comps
