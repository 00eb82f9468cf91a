"""Multimodal column plumbing: real image decode/resize, real WAV audio
decode, real .y4m video decode — every modality through its own
pure-stdlib codec over Arrow batches."""

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


def test_wav_codec_roundtrip():
    import numpy as np

    from newocr_spark.codecs.wav import decode_wav, encode_wav

    rng = np.random.RandomState(7)
    mono = (rng.rand(1000) * 1.8 - 0.9).astype(np.float64)
    got, sr = decode_wav(encode_wav(mono, 16000))
    assert sr == 16000 and got.shape == (1000, 1)
    # exact quantization contract: round(x*32767) stored, /32768 decoded
    expected = np.round(mono * 32767.0) / 32768.0
    assert np.abs(got[:, 0] - expected.astype(np.float32)).max() < 1e-7
    stereo = np.stack([mono, -mono], axis=1)
    got2, _ = decode_wav(encode_wav(stereo, 8000))
    assert got2.shape == (1000, 2)


def test_audio_features_real_decode(spark, media_df):
    """audio_features exercises REAL WAV bytes end-to-end: synth →
    encode_wav → Spark binary column → decode_wav → features, and the
    distributed result matches a direct numpy computation of the same
    waveform."""
    import numpy as np

    from newocr_spark.analytics.multimodal import (
        audio_features, synth_audio_table, synth_wav_bytes,
    )
    from newocr_spark.codecs.wav import decode_wav

    wavs = synth_audio_table(media_df)
    feats = audio_features(wavs).collect()
    assert feats and all(r.error is None for r in feats)
    assert all(r.sample_rate == 8000 and r.channels == 1 for r in feats)
    assert all(r.rms > 0 and 0 <= r.zcr <= 1 for r in feats)
    # dominant partials live well below Nyquist → centroid in (0, 4000)
    assert all(0 < r.spectral_centroid_hz < 4000 for r in feats)

    # cross-check one row against a direct (non-Spark) computation
    r0 = feats[0]
    samples, sr = decode_wav(synth_wav_bytes(r0.media_ref))
    w = samples.mean(axis=1)
    assert r0.n_samples == len(w)
    assert abs(r0.rms - float(np.sqrt((w ** 2).mean()))) < 1e-5


def test_audio_features_fault_isolation(spark):
    from newocr_spark.analytics.multimodal import audio_features

    bad = spark.createDataFrame(
        [("m-ok", None), ("m-garbage", bytearray(b"not a wav"))],
        "media_ref string, wav binary",
    )
    rows = {r.media_ref: r for r in audio_features(bad).collect()}
    assert rows["m-ok"].error is not None
    assert rows["m-garbage"].error is not None


def test_y4m_codec_roundtrip():
    import numpy as np

    from newocr_spark.codecs.y4m import decode_y4m, encode_y4m

    rng = np.random.RandomState(7)
    frames = (rng.rand(5, 12, 18) * 255).astype(np.uint8)
    data = encode_y4m(frames, fps=30)
    assert data.startswith(b"YUV4MPEG2 W18 H12 F30:1")
    out, fps = decode_y4m(data)
    assert fps == 30 and out.shape == (5, 12, 18)
    assert (out == frames).all()  # bit-exact: raw container, no loss


def test_y4m_decode_420_chroma_skipped():
    """ffmpeg's default C420 family parses too: chroma skipped, luma kept."""
    import numpy as np

    from newocr_spark.codecs.y4m import decode_y4m

    w, h = 8, 4
    luma = np.arange(h * w, dtype=np.uint8).reshape(h, w)
    chroma = bytes((w // 2) * (h // 2) * 2)
    data = (
        b"YUV4MPEG2 W8 H4 F25:1 Ip A1:1 C420jpeg\n"
        + b"FRAME\n" + luma.tobytes() + chroma
        + b"FRAME\n" + luma.tobytes() + chroma
    )
    out, fps = decode_y4m(data)
    assert out.shape == (2, 4, 8) and (out[1] == luma).all()


def test_y4m_decode_rejects_garbage():
    import pytest as _pytest

    from newocr_spark.codecs.y4m import decode_y4m

    with _pytest.raises(ValueError):
        decode_y4m(b"RIFF....not a video")
    with _pytest.raises(ValueError):  # truncated frame payload
        decode_y4m(b"YUV4MPEG2 W4 H4 F25:1 Cmono\nFRAME\n\x00\x00")


def test_video_frame_sample_real_decode(spark, media_df):
    """Sampled frame stats must equal the closed-form fixture law:
    16x16 frames, indices 0,10,20[,30], mean luma == base + 15."""
    import hashlib

    from newocr_spark.analytics.multimodal import (
        synth_video_table, video_frame_sample,
    )

    vids = synth_video_table(media_df)
    frames = video_frame_sample(vids, every_n=10, max_frames=3)
    rows = frames.collect()
    assert rows and all(r.error is None for r in rows)
    by_ref = {}
    for r in rows:
        by_ref.setdefault(r.media_ref, []).append(r)
    for ref, rs in by_ref.items():
        seed = int.from_bytes(hashlib.md5(ref.encode()).digest()[:4], "big")
        n_frames = 30 + seed % 120
        expect_idx = list(range(0, min(n_frames, 30), 10))
        assert sorted(r.frame_idx for r in rs) == expect_idx
        for r in rs:
            assert (r.width, r.height) == (16, 16)
            assert r.mean_luma == (seed + 31 * r.frame_idx) % 200 + 15

    # PNG stills decode back to the exact frame the codec produced
    from newocr_spark.codecs.png import decode_png
    from newocr_spark.codecs.y4m import decode_y4m
    from newocr_spark.analytics.multimodal import synth_y4m_bytes

    r0 = next(r for r in rows if r.frame_idx == 10)
    still = decode_png(bytes(r0.frame_png))
    src, _ = decode_y4m(synth_y4m_bytes(r0.media_ref))
    assert (still == src[10]).all()


def test_video_frame_sample_fault_isolation(spark):
    from newocr_spark.analytics.multimodal import (
        synth_y4m_bytes, video_frame_sample,
    )

    bad = spark.createDataFrame(
        [("m-ok", bytearray(synth_y4m_bytes("m-ok"))),
         ("m-garbage", bytearray(b"not a video")),
         ("m-null", None)],
        "media_ref string, y4m binary",
    )
    rows = {r.media_ref: r for r in video_frame_sample(bad).collect()
            if r.error is not None}
    assert set(rows) == {"m-garbage", "m-null"}


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
