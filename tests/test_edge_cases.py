"""Degenerate-input robustness: the kernel and pipeline must handle the
shapes a 10^12-doc crawl actually contains — blank images, tiny images,
all-black scans, huge aspect ratios — without crashing, and the pipeline
must isolate any per-image failure into an error row."""

import numpy as np
import pytest

from newocr_spark.artifacts import get_model
from newocr_spark.codecs.png import decode_png, encode_png
from newocr_spark.kernel.grid import binarize
from newocr_spark.kernel.scan import render_text, scan_grid, scan_image_bytes


@pytest.fixture(scope="module")
def model():
    return get_model()


def _scan_gray(img: np.ndarray, model) -> str:
    return render_text(scan_grid(binarize(img), model))


def test_all_white_image(model):
    assert _scan_gray(np.full((40, 60), 255, dtype=np.uint8), model) == ""


def test_all_black_image(model):
    # one giant component; must classify as SOMETHING without crashing
    out = _scan_gray(np.zeros((40, 60), dtype=np.uint8), model)
    assert isinstance(out, str)


def test_single_pixel_images(model):
    assert _scan_gray(np.full((1, 1), 255, dtype=np.uint8), model) == ""
    out = _scan_gray(np.zeros((1, 1), dtype=np.uint8), model)
    assert isinstance(out, str)


def test_extreme_aspect_ratios(model):
    wide = np.full((2, 5000), 255, dtype=np.uint8)
    wide[0, ::7] = 0  # dotted 1px noise line
    assert isinstance(_scan_gray(wide, model), str)
    tall = np.full((5000, 2), 255, dtype=np.uint8)
    tall[::11, 0] = 0
    assert isinstance(_scan_gray(tall, model), str)


def test_noise_speckle_does_not_crash(model):
    rng = np.random.RandomState(7)
    img = np.where(rng.rand(64, 200) < 0.02, 0, 255).astype(np.uint8)
    assert isinstance(_scan_gray(img, model), str)


def test_png_roundtrip_degenerate():
    for shape in ((1, 1), (1, 500), (500, 1)):
        img = np.full(shape, 255, dtype=np.uint8)
        assert np.array_equal(decode_png(encode_png(img)), img)


def test_scan_bytes_garbage_raises(model):
    with pytest.raises(Exception):
        scan_image_bytes(b"\x89PNG\r\n\x1a\ngarbage", model)


def test_pipeline_isolates_bad_images(spark, model):
    """Blank, garbage, and valid images in one batch: valid rows recognized,
    bad bytes become error rows, blank becomes an empty text span."""
    from newocr_spark.font.render import render_text_png
    from newocr_spark.pipeline.extract import extract_spans

    blank = encode_png(np.full((10, 10), 255, dtype=np.uint8))
    good = render_text_png(["ok 1"], 2)
    docs = spark.createDataFrame(
        [
            ("d1", [("media", None, "m-good", 0)]),
            ("d2", [("media", None, "m-blank", 0)]),
            ("d3", [("media", None, "m-garbage", 0)]),
        ],
        "doc_id string, spans array<struct<kind:string,text:string,media_ref:string,offset:int>>",
    )
    media = spark.createDataFrame(
        [
            ("m-good", bytearray(good)),
            ("m-blank", bytearray(blank)),
            ("m-garbage", bytearray(b"not a png at all")),
        ],
        "media_ref string, png binary",
    )
    rows = {r.doc_id: r for r in extract_spans(spark, docs, media, model).collect()}
    assert rows["d1"].text == "ok 1" and rows["d1"].error is None
    assert rows["d2"].text == "" and rows["d2"].error is None
    assert rows["d3"].error is not None and rows["d3"].text is None


# ---------------------------------------------------------------------------
# BMP container + magic-byte decode dispatch (reference parity: multiple
# image read strategies, train/ImageReadMethod.java:18-67)
# ---------------------------------------------------------------------------

def test_bmp_roundtrip():
    from newocr_spark.codecs.bmp import decode_bmp, encode_bmp

    rng = np.random.RandomState(3)
    gray = (rng.rand(13, 37) * 255).astype(np.uint8)  # odd width → padding
    assert np.array_equal(decode_bmp(encode_bmp(gray)), gray)
    rgb = (rng.rand(7, 5, 3) * 255).astype(np.uint8)
    assert np.array_equal(decode_bmp(encode_bmp(rgb)), rgb)


def test_decode_image_dispatch(model):
    from newocr_spark.codecs.bmp import decode_image, encode_bmp
    from newocr_spark.font.render import render_text_image

    img = render_text_image(["Mixed 42"], 2)
    assert np.array_equal(decode_image(encode_png(img)), img)
    assert np.array_equal(decode_image(encode_bmp(img)), img)


def test_pipeline_mixed_containers(spark, model):
    """One media table mixing PNG and BMP bytes: both recognized exactly."""
    from newocr_spark.codecs.bmp import encode_bmp
    from newocr_spark.font.render import render_text_image
    from newocr_spark.pipeline.extract import extract_spans

    png = encode_png(render_text_image(["png row 1"], 2))
    bmp = encode_bmp(render_text_image(["bmp row 2"], 2))
    docs = spark.createDataFrame(
        [
            ("d1", [("media", None, "m-png", 0)]),
            ("d2", [("media", None, "m-bmp", 0)]),
        ],
        "doc_id string, spans array<struct<kind:string,text:string,media_ref:string,offset:int>>",
    )
    media = spark.createDataFrame(
        [("m-png", bytearray(png)), ("m-bmp", bytearray(bmp))],
        "media_ref string, png binary",
    )
    rows = {r.doc_id: r for r in extract_spans(spark, docs, media, model).collect()}
    assert rows["d1"].text == "png row 1" and rows["d1"].error is None
    assert rows["d2"].text == "bmp row 2" and rows["d2"].error is None


def test_half_up_rounding_emulation_on_exact_ties():
    """The numpy kernels emulate HALF_UP with floor(x*1e6+0.5)/1e6 so that
    6-digit boundary decisions match F.round / DuckDB round. Pin the
    emulation on exactly-representable .5 ties, where np.round (banker's)
    demonstrably flips the other way — the class of value the ADVICE r2
    ulp note is about."""
    import duckdb
    import numpy as np

    ties = [1 / 128, 3 / 256, 5 / 128, 0.4999995]
    emulated = [float(np.floor(x * 1e6 + 0.5) / 1e6) for x in ties]
    oracle = [
        float(r[0])
        for x in ties
        for r in duckdb.sql(f"select round({x!r}::double, 6)").fetchall()
    ]
    assert emulated == oracle
    # banker's rounding disagrees on the even-tie cases — the emulation is
    # load-bearing, not cosmetic
    assert float(np.round(1 / 128, 6)) != emulated[0]
