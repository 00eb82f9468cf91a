"""A7 font-size estimate, A8 accuracy harness, X5 conversions, streaming."""

import pytest

from newocr_spark.font.render import RAW_STRING, render_text_png
from newocr_spark.kernel.metrics import (
    font_size_of, line_accuracy, pixel_to_point, point_to_pixel,
)


def test_conversions():
    assert pixel_to_point(4) == 3
    assert point_to_pixel(3) == 4
    assert point_to_pixel(pixel_to_point(10)) == pytest.approx(10)


def test_accuracy_harness_exact():
    assert line_accuracy([RAW_STRING], RAW_STRING) == 1.0


def test_accuracy_harness_partial():
    # one substitution in a 10-char expectation → 0.9
    assert line_accuracy(["abcdefghiX"], "abcdefghij") == pytest.approx(0.9)


def test_self_scan_accuracy_at_reference_bar(font_model):
    """The reference's own bar: >= 98% per-line diff accuracy on self-scan
    (test/fonts/Accuracy.java:31). Ours is exact, so trivially >= 98%."""
    from newocr_spark.codecs.png import decode_png
    from newocr_spark.kernel.grid import binarize
    from newocr_spark.kernel.scan import render_text, scan_grid

    png = render_text_png([RAW_STRING], 2)
    got = render_text(scan_grid(binarize(decode_png(png)), font_model))
    acc = line_accuracy(got.split("\n"), RAW_STRING)
    assert acc >= 0.98
    assert acc == 1.0


def test_font_size_estimate(font_model):
    """Rendering at 'pt' 12*k must estimate ~12*k back (A7)."""
    from newocr_spark.codecs.png import decode_png
    from newocr_spark.kernel.grid import binarize
    from newocr_spark.kernel.scan import scan_grid

    for scale in (1, 2, 4):
        lines = scan_grid(
            binarize(decode_png(render_text_png(["ABC def 123"], scale))), font_model
        )
        sizes = [
            s for _y, line in lines for l in line
            if l.letter != " " and (s := font_size_of(l, font_model)) is not None
        ]
        est = sum(sizes) / len(sizes)
        # px→pt is 3/4; trained ratio pt/height averaged over scales
        expected = pixel_to_point(12 * scale * 4 / 3) * (4 / 3)  # == 12*scale*4/3
        # loose band: the estimate mixes per-letter height ratios
        assert 0.5 * 12 * scale < est < 2.5 * 12 * scale, (scale, est)


def test_stream_extract(spark, font_model, tmp_path):
    from newocr_spark.fixtures import synth_fixture
    from newocr_spark.pipeline.streaming import stream_extract

    d = str(tmp_path / "fx")
    synth_fixture(d, n_docs=12, seed=7, model=font_model, verify=True)
    docs_dir = str(tmp_path / "docs_stream")
    import shutil, os

    os.makedirs(docs_dir)
    shutil.copy(f"{d}/documents.parquet", f"{docs_dir}/part-0.parquet")
    media = spark.read.parquet(f"{d}/media.parquet")

    out = str(tmp_path / "out")
    q = stream_extract(
        spark, docs_dir, media, font_model, out, str(tmp_path / "ckpt"),
    )
    q.awaitTermination(120)
    result = spark.read.parquet(out)
    golden = spark.read.parquet(f"{d}/golden_spans.parquet")
    assert result.count() == golden.count()
