"""Incremental near-dup dedup against a persisted band-signature index
(dedup.band_index / dedup.incremental_neardup) — the batch complement of
the streaming band-key dedup, sharing its suppression semantics."""

import pytest

from newocr_spark.analytics.dedup import (
    N_BANDS, band_index, incremental_neardup,
)

HIST_A = (
    "the quick brown fox jumps over the lazy dog and runs far away from home tonight"
)
NEAR_A = (
    "the quick brown fox jumps over the lazy dog and runs far away from home today"
)
DISTINCT = "completely different content about spark structured streaming state stores"


@pytest.fixture()
def history_index(spark):
    hist = spark.createDataFrame(
        [("h1", HIST_A), ("h2", "some other historical page about cooking pasta")],
        "doc_id string, text string",
    )
    return band_index(hist)


def _gate(spark, history_index, rows):
    inc = spark.createDataFrame(rows, "doc_id string, text string")
    return {
        r.doc_id: r for r in incremental_neardup(inc, history_index).collect()
    }


def test_exact_copy_of_history_suppressed(spark, history_index):
    got = _gate(spark, history_index, [("n1", HIST_A)])
    r = got["n1"]
    assert not r.keep
    # an exact copy collides on EVERY band
    assert r.n_hit_bands == r.n_bands == N_BANDS


def test_neardup_of_history_suppressed(spark, history_index):
    got = _gate(spark, history_index, [("n1", NEAR_A)])
    r = got["n1"]
    assert not r.keep
    # near-dup: SOME but not all bands collide (fixture pinned at 2/4 in
    # test_metrics_streaming.test_stream_dedup_neardup_band_keys_match_batch_path)
    assert 0 < r.n_hit_bands < r.n_bands


def test_novel_and_short_docs_pass(spark, history_index):
    got = _gate(
        spark, history_index, [("n1", DISTINCT), ("tiny", "word")]
    )
    assert got["n1"].keep and got["n1"].n_hit_bands == 0
    # sub-n-token docs have no signature: no bands, always pass
    assert got["tiny"].keep and got["tiny"].n_bands == 0


def test_index_append_makes_recrawl_idempotent(spark, history_index):
    """The documented update cycle: append survivors' band_index rows to
    the store; a re-crawl of a previously ADMITTED doc is then suppressed."""
    inc = spark.createDataFrame([("n1", DISTINCT)], "doc_id string, text string")
    first = {r.doc_id: r for r in incremental_neardup(inc, history_index).collect()}
    assert first["n1"].keep
    updated = history_index.unionByName(band_index(inc))
    recrawl = spark.createDataFrame(
        [("n1-again", DISTINCT)], "doc_id string, text string"
    )
    second = {
        r.doc_id: r for r in incremental_neardup(recrawl, updated).collect()
    }
    assert not second["n1-again"].keep
    assert second["n1-again"].n_hit_bands == N_BANDS


def test_index_hot_bucket_cannot_fan_out(spark):
    """1000 historical copies of one page contribute ONE distinct index
    row per band signature: the increment's hit count is bounded by its
    own band count, never by historical frequency."""
    hist = spark.createDataFrame(
        [(f"h{i}", HIST_A) for i in range(1000)], "doc_id string, text string"
    )
    idx = band_index(hist)
    got = _gate(spark, idx, [("n1", HIST_A)])
    assert got["n1"].n_hit_bands == N_BANDS  # not 1000 * N_BANDS
