"""Multimodal column plumbing: real image decode/resize, stubbed
audio/video decode with real Arrow batch shapes."""

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def media_df(spark, font_model):
    from newocr_spark.fixtures import synth_fixture
    import tempfile

    d = tempfile.mkdtemp(prefix="mmfx")
    synth_fixture(d, n_docs=20, seed=11, model=font_model, verify=False)
    return spark.read.parquet(f"{d}/media.parquet").cache()


def test_image_metadata(spark, media_df):
    from newocr_spark.analytics.multimodal import image_metadata

    meta = image_metadata(media_df)
    rows = meta.collect()
    assert rows and all(r.error is None for r in rows)
    assert all(r.width > 0 and r.height > 0 and r.channels == 1 for r in rows)
    # rendered text pages are mostly white with some black
    assert all(0.0 < r.black_ratio < 0.5 for r in rows)


def test_image_resize(spark, media_df):
    from newocr_spark.analytics.multimodal import image_resize
    from newocr_spark.codecs.png import decode_png

    thumbs = image_resize(media_df, 16, 16).collect()
    assert len(thumbs) == media_df.count()
    img = decode_png(bytes(thumbs[0].thumb_png))
    assert img.shape == (16, 16)


def test_audio_features_stub(spark, media_df):
    from newocr_spark.analytics.multimodal import audio_features

    feats = audio_features(media_df).collect()
    assert all(r.rms > 0 and 0 <= r.zcr <= 1 for r in feats)
    # deterministic: rerun gives identical values
    again = {r.media_ref: r.rms for r in audio_features(media_df).collect()}
    assert all(again[r.media_ref] == r.rms for r in feats)


def test_video_frame_sample_stub(spark, media_df):
    from newocr_spark.analytics.multimodal import video_frame_sample

    frames = video_frame_sample(media_df, every_n=10, max_frames=3)
    agg = frames.groupBy("media_ref").agg(F.count("*").alias("n")).collect()
    assert all(1 <= r.n <= 3 for r in agg)


# ---------------------------------------------------------------------------
# ANN recall: both approximate paths (LSH buckets, IVF cells) vs exact top-k
# ---------------------------------------------------------------------------

def _topk_sets(df):
    out = {}
    for r in df.collect():
        out.setdefault(r.query_id, set()).add(r.neighbor_id)
    return out


def test_ann_recall_vs_exact(spark):
    from newocr_spark.analytics.similarity import (
        cosine_topk, ivf_ann_topk, lsh_ann_topk,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    exact = _topk_sets(cosine_topk(emb, n_queries=5, k=5))
    for name, ann in (
        ("lsh", lsh_ann_topk(emb, n_queries=5, k=5)),
        ("ivf", ivf_ann_topk(emb, n_queries=5, k=5)),
    ):
        pdf = ann.toPandas()
        # shape contract: ranks are 1..k' contiguous per query, k' <= 5
        for qid, grp in pdf.groupby("query_id"):
            assert sorted(grp["rank"]) == list(range(1, len(grp) + 1)), name
            assert len(grp) <= 5, name
        approx = _topk_sets(ann)
        hits = sum(len(exact[q] & approx.get(q, set())) for q in exact)
        total = sum(len(v) for v in exact.values())
        recall = hits / total
        # sanity floor: the probe structure must beat random chance by far
        # (random 5-of-500 ~ 1%); exact parameters are tuned for speed
        assert recall >= 0.2, f"{name} recall {recall:.2f}"
