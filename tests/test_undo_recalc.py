"""§2 T4 — undo/recalc (TrainedCharacterData.undoLastRecalculations,
src/main/java/com/uddernetworks/newocr/character/TrainedCharacterData.java
:147-163): dropping the last k training sightings and re-averaging. The
Spark expression is immutable (filter + re-aggregate over the sighting
history table) — undo(0) must reproduce the trained model bit-for-bit in
double tolerance, and undo(k) must equal a direct numpy recompute over
the first n-k sightings."""

import numpy as np
import pytest

from newocr_spark.font.train import train_font, train_sightings, undo_recalculations


@pytest.fixture(scope="module")
def sightings(spark):
    return train_sightings(spark).cache()


def _rows(df):
    return {(r.letter, r.modifier): r for r in df.collect()}


def test_undo_zero_reproduces_trained_model(spark, font_model, sightings):
    got = _rows(undo_recalculations(sightings, k=0))
    model = font_model
    for idx, (letter, modifier) in enumerate(model.letters):
        r = got[(letter, modifier)]
        assert np.allclose(r.segments, model.segments[idx], atol=1e-12), letter
        assert np.isclose(r.avg_width, model.avg_width[idx], atol=1e-12)
        assert np.isclose(r.avg_height, model.avg_height[idx], atol=1e-12)
        if letter != " ":  # the space never records a center (-1 sentinel)
            assert np.isclose(r.min_center, model.min_center[idx])
            assert np.isclose(r.max_center, model.max_center[idx])
    assert set(got) == set(model.letters)


def test_undo_k_matches_numpy_recompute(spark, sightings):
    pdf = sightings.toPandas()
    got = _rows(undo_recalculations(sightings, k=2))
    checked = 0
    for (letter, modifier), grp in pdf.groupby(["letter", "modifier"]):
        grp = grp.sort_values("seq")
        keep = grp.iloc[:-2] if len(grp) > 2 else grp.iloc[0:0]
        if not len(keep):
            assert (letter, modifier) not in got  # fully undone → drops out
            continue
        r = got[(letter, modifier)]
        assert r.n_sightings == len(keep)
        segs = np.stack(keep["segments"].to_numpy())
        assert np.allclose(r.segments, segs.mean(axis=0), atol=1e-12)
        assert np.isclose(r.avg_width, keep["width"].mean(), atol=1e-12)
        assert np.isclose(r.avg_height, keep["height"].mean(), atol=1e-12)
        assert np.isclose(r.min_center, keep["center_off"].min())
        assert np.isclose(r.max_center, keep["center_off"].max())
        checked += 1
    assert checked > 50  # the trained alphabet, not a toy subset


def test_undo_pops_width_list_independently(spark):
    """The reference appends width/height only for non-zero-dim sightings
    (recalculateTo, TrainedCharacterData.java:136-139) and undo pops each
    of the three lists on its own length (:147-163). A zero-dim sighting
    (NULL width/height in the history table) therefore shifts the
    width-undo window relative to the segment window: undo(2) over
    segments [s0 s1 s2 s3] keeps {s0, s1}, but over widths [w0 w1 w3]
    (w2 never recorded) keeps only {w0}."""
    rows = [
        {"letter": "a", "modifier": 0, "seq": s,
         "segments": [float(s)] * 17,
         "width": None if s == 2 else 10.0 + s,
         "height": None if s == 2 else 20.0 + s,
         "center_off": float(s)}
        for s in range(4)
    ]
    sightings = spark.createDataFrame(
        rows,
        "letter string, modifier int, seq int, segments array<double>, "
        "width double, height double, center_off double",
    )
    r = _rows(undo_recalculations(sightings, k=2))[("a", 0)]
    assert r.n_sightings == 2  # segments list: s0, s1 survive
    assert np.allclose(r.segments, [0.5] * 17)
    assert r.avg_width == 10.0 and r.avg_height == 20.0  # width list: only w0
    assert r.min_center == 0.0 and r.max_center == 1.0
    # undo(3) empties the width list but not the segment list: averages
    # fall back to finishRecalculations' orElse(0D)
    r3 = _rows(undo_recalculations(sightings, k=3))[("a", 0)]
    assert r3.n_sightings == 1
    assert r3.avg_width == 0.0 and r3.avg_height == 0.0


def test_sightings_collection_does_not_change_training(spark, font_model):
    rows = []
    model2 = train_font(_sightings=rows)
    assert rows  # history actually captured
    assert np.allclose(model2.segments, font_model.segments)
    assert np.allclose(model2.avg_width, font_model.avg_width)
    assert model2.letters == font_model.letters
