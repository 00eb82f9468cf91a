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


def test_sightings_collection_does_not_change_training(spark, font_model):
    rows = []
    model2 = train_font(_sightings=rows)
    assert rows  # history actually captured
    assert np.allclose(model2.segments, font_model.segments)
    assert np.allclose(model2.avg_width, font_model.avg_width)
    assert model2.letters == font_model.letters
