"""Deterministic image perturbations for recognition-robustness evaluation.

The reference certifies >= 98% per-line accuracy on CLEAN renders of its
six trained fonts (test/fonts/Accuracy.java:31-44); its kernel has no
noise-specific handling, so tolerance to scan noise is an emergent
property of the binarize -> CCL -> 17-segment features -> NN-scoring
chain. The exact self-scan tests never exercise that property. These
perturbations measure it on our port, with the budgets at which the
reference's own >= 98% bar still holds pinned in
tests/test_noise_robustness.py.

Three physically-motivated noise models, all pure numpy and seed-
deterministic (no wall-clock randomness — reruns are bit-identical):

  * ``salt``            — ink dropout: a fraction of BLACK pixels flips
                          white (toner voids, sensor dead pixels). The
                          dominant failure mode is a split small
                          component: a comma/semicolon tail severed by
                          one void becomes two CCL components and
                          misreads as quote/period fragments.
  * ``pepper_boundary`` — edge roughening: a fraction of white pixels
                          8-adjacent to ink flips black (ink bleed,
                          sensor blur at edges). Restricted to the
                          boundary because free-field pepper creates
                          detached 1-px components the reference would
                          faithfully classify as periods — that measures
                          the noise model, not the recognizer.
  * ``dilate``          — uniform 1-px 4-neighbour ink dilation (a
                          bolder scan/overexposure). Deterministic, no
                          seed.

These run driver/executor-side on decoded grayscale arrays (uint8,
white 255 / black 0 — the renderer's contract, font/render.py:65), the
same arrays `kernel.scan.scan_image_bytes` consumes, so a perturbed
corpus drops into any existing scan path.
"""

from __future__ import annotations

import numpy as np


def salt(img: np.ndarray, rate: float, seed: int) -> np.ndarray:
    """Flip ``rate`` of the black pixels to white (ink dropout)."""
    out = img.copy()
    blacks = np.argwhere(img == 0)
    k = int(len(blacks) * rate)
    if k == 0:
        return out
    idx = np.random.default_rng(seed).choice(len(blacks), size=k, replace=False)
    out[blacks[idx, 0], blacks[idx, 1]] = 255
    return out


def pepper_boundary(img: np.ndarray, rate: float, seed: int) -> np.ndarray:
    """Flip ``rate`` of the white pixels 8-adjacent to ink to black
    (edge roughening / ink bleed)."""
    black = img == 0
    p = np.pad(black, 1)
    neighbours = np.zeros(black.shape, dtype=np.uint8)
    h, w = black.shape
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dy == 0 and dx == 0:
                continue
            neighbours += p[1 + dy : 1 + dy + h, 1 + dx : 1 + dx + w]
    cand = np.argwhere(~black & (neighbours > 0))
    k = int(len(cand) * rate)
    out = img.copy()
    if k == 0:
        return out
    idx = np.random.default_rng(seed).choice(len(cand), size=k, replace=False)
    out[cand[idx, 0], cand[idx, 1]] = 0
    return out


def dilate(img: np.ndarray) -> np.ndarray:
    """1-px 4-neighbour dilation of the ink (a uniformly bolder scan)."""
    black = img == 0
    p = np.pad(black, 1)
    d = (
        black
        | p[:-2, 1:-1]
        | p[2:, 1:-1]
        | p[1:-1, :-2]
        | p[1:-1, 2:]
    )
    return np.where(d, np.uint8(0), np.uint8(255))
