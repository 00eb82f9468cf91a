"""Multi-font support: the engine's analogue of the reference's per-font
trained databases + HOCON configs (Accuracy.java trains one DB per font;
six font test classes). SparkGridWide is a geometrically distinct face —
every trained ratio differs from SparkGrid — exercising that the trainer,
broadcast model, NN scoring, mergence gates and space insertion are all
driven by the trained tables, not by constants."""

import numpy as np
import pytest

from newocr_spark.artifacts import get_model
from newocr_spark.font.glyphs import DEFAULT_FACE, wide_face
from newocr_spark.font.render import RAW_STRING, render_text_png
from newocr_spark.kernel.scan import scan_image_bytes


@pytest.fixture(scope="module")
def wide_model():
    return get_model("SparkGridWide")


@pytest.fixture(scope="module")
def narrow_model():
    return get_model("SparkGrid")


MERGE_HEAVY = 'i j ; ! ? % = : " W W'


@pytest.mark.parametrize("scale", [1, 2, 3])
def test_wide_self_scan_exact(wide_model, scale):
    for text in (RAW_STRING, MERGE_HEAVY, "Hello, World! 42"):
        png = render_text_png([text], scale, face=wide_face())
        got = scan_image_bytes(png, wide_model)
        assert got == text.rstrip(), f"scale {scale}: {got!r}"


def test_trained_geometry_differs(wide_model, narrow_model):
    sw, sn = wide_model.row(" ", 0), narrow_model.row(" ", 0)
    assert wide_model.avg_width[sw] > 1.3 * narrow_model.avg_width[sn]
    assert wide_model.avg_height[sw] == narrow_model.avg_height[sn]
    aw, an = wide_model.row("A", 0), narrow_model.row("A", 0)
    w_ratio = wide_model.avg_width[aw] / wide_model.avg_height[aw]
    n_ratio = narrow_model.avg_width[an] / narrow_model.avg_height[an]
    assert w_ratio == pytest.approx(1.5 * n_ratio)  # 'A' is even-width: exact
    # x-gap-based metadata shrinks by the stretch (ratio = height / x-dist)
    assert wide_model.meta["apostropheRatio"] == pytest.approx(
        narrow_model.meta["apostropheRatio"] / 1.5
    )
    # custom trailing-space ratio (gap / height) grows with the stretch
    assert wide_model.custom_spaces["`"] > 1.3 * narrow_model.custom_spaces["`"]
    # y-axis merge distances are width-invariant (vertical geometry shared)
    for name in ("distancei", "colonDistance", "equalsDistance"):
        assert wide_model.meta[name] == pytest.approx(narrow_model.meta[name])


def test_wrong_model_changes_spacing(wide_model, narrow_model):
    """Scanning wide-rendered text with the narrow model mis-spaces: the
    narrow space ratio is 2/3 of the wide one, so a two-space gap counts
    as three (2 * 1.5 rounds up) — demonstrating output depends on the
    per-font trained tables. (A single space survives: 1.5 has fractional
    part < the 0.8 rounding threshold, OCRScan.java:233-238.)"""
    text = "W  W"
    png = render_text_png([text], 2, face=wide_face())
    right = scan_image_bytes(png, wide_model)
    wrong = scan_image_bytes(png, narrow_model)
    assert right == text
    assert wrong != text


def test_wide_training_deterministic():
    from newocr_spark.font.train import train_font

    a = train_font(face=wide_face())
    b = train_font(face=wide_face())
    assert a.letters == b.letters
    assert np.array_equal(a.segments, b.segments)
    assert a.meta == b.meta


def test_default_face_unchanged(narrow_model):
    """Adding faces must not disturb the default font's goldens."""
    png = render_text_png(["Hello, World! 42"], 2)
    assert scan_image_bytes(png, narrow_model) == "Hello, World! 42"
    assert wide_face().glyphs["A"].shape[1] == DEFAULT_FACE.glyphs["A"].shape[1] * 3 // 2
