"""Multimodal column operators: opaque binary media + typed metadata.

Every modality decodes REAL bytes through a pure-stdlib codec: images via
the OCR pipeline's own PNG codec, audio via a stdlib-`wave` 16-bit PCM
codec (codecs/wav.py), and video via a YUV4MPEG2 (.y4m) raw-video codec
(codecs/y4m.py) — the uncompressed interchange container ffmpeg emits
with `-f yuv4mpeg`. A *compressed* video decoder (H.264 etc.) is out of
scope for this environment; a real deployment swaps the y4m decode for an
ffmpeg-backed frame iterator with the same output schema.

All operators are `mapInPandas` over binary columns: one Arrow batch in,
vectorized numpy per item, one Arrow batch out.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

IMAGE_META_SCHEMA = (
    "media_ref string, width int, height int, channels int, "
    "mean_luma double, black_ratio double, error string"
)


def image_metadata(media: DataFrame) -> DataFrame:
    """Decode PNG bytes → per-image shape + luminance stats (real decode)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..codecs.png import decode_png

        for pdf in batches:
            rows = []
            for ref, png in zip(pdf["media_ref"], pdf["png"]):
                try:
                    img = decode_png(png)
                    h, w = img.shape[:2]
                    ch = 1 if img.ndim == 2 else img.shape[2]
                    luma = float(img.mean())
                    black = float((img < 128).mean())
                    rows.append((ref, w, h, ch, round(luma, 6), round(black, 6), None))
                except Exception as exc:
                    rows.append((ref, None, None, None, None, None, repr(exc)))
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_ref", "width", "height", "channels",
                    "mean_luma", "black_ratio", "error",
                ],
            )

    return media.select("media_ref", "png").mapInPandas(fn, IMAGE_META_SCHEMA)


def image_resize(media: DataFrame, out_w: int = 32, out_h: int = 32) -> DataFrame:
    """Nearest-neighbour resize to a fixed thumbnail (real numpy resize);
    returns re-encoded PNG bytes — the shape every image-preprocessing
    pipeline stage (augment, tile, normalize) follows."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..codecs.png import decode_png, encode_png

        for pdf in batches:
            refs, thumbs = [], []
            for ref, png in zip(pdf["media_ref"], pdf["png"]):
                img = decode_png(png)
                h, w = img.shape[:2]
                yi = (np.arange(out_h) * h // out_h).clip(0, h - 1)
                xi = (np.arange(out_w) * w // out_w).clip(0, w - 1)
                thumb = img[yi][:, xi]
                refs.append(ref)
                thumbs.append(bytearray(encode_png(np.ascontiguousarray(thumb))))
            yield pd.DataFrame({"media_ref": refs, "thumb_png": thumbs})

    return media.select("media_ref", "png").mapInPandas(
        fn, "media_ref string, thumb_png binary"
    )


def synth_wav_bytes(ref: str, sample_rate: int = 8000) -> bytes:
    """Deterministic fixture waveform for a media ref: two sine partials +
    low noise, all parameters derived from the ref's md5. REAL WAV bytes —
    encode_wav → decode_wav roundtrips through the actual codec."""
    from ..codecs.wav import encode_wav

    seed = int.from_bytes(hashlib.md5(ref.encode()).digest()[:4], "big")
    rng = np.random.RandomState(seed & 0x7FFFFFFF)
    n = 2048 + (seed % 4) * 512
    t = np.arange(n) / sample_rate
    f1 = 100.0 + seed % 1500
    f2 = 200.0 + (seed >> 8) % 2500
    w = (
        0.5 * np.sin(2 * np.pi * f1 * t)
        + 0.3 * np.sin(2 * np.pi * f2 * t)
        + 0.05 * rng.standard_normal(n)
    )
    return encode_wav(w, sample_rate)


AUDIO_FEATURES_SCHEMA = (
    "media_ref string, sample_rate int, n_samples int, channels int, "
    "rms double, zcr double, spectral_centroid_hz double, error string"
)


def audio_features(media: DataFrame, wav_col: str = "wav") -> DataFrame:
    """Audio feature extraction over REAL decoded WAV bytes (stdlib-`wave`
    codec, codecs/wav.py): rms, zero-crossing rate, spectral centroid in
    Hz. Multi-channel input is mono-mixed before analysis; per-item fault
    isolation mirrors image_metadata."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..codecs.wav import decode_wav

        for pdf in batches:
            rows = []
            for ref, data in zip(pdf["media_ref"], pdf[wav_col]):
                try:
                    if data is None:
                        raise ValueError("missing audio bytes")
                    samples, sr = decode_wav(bytes(data))
                    n, ch = samples.shape
                    w = samples.mean(axis=1)
                    rms = float(np.sqrt((w ** 2).mean()))
                    zcr = float((np.diff(np.signbit(w)) != 0).mean())
                    spec = np.abs(np.fft.rfft(w))
                    freqs = np.fft.rfftfreq(n, d=1.0 / sr)
                    denom = spec.sum()
                    centroid = float((spec * freqs).sum() / denom) if denom else 0.0
                    rows.append(
                        (ref, sr, n, ch, round(rms, 6), round(zcr, 6),
                         round(centroid, 6), None)
                    )
                except Exception as exc:
                    rows.append((ref, None, None, None, None, None, None, repr(exc)))
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_ref", "sample_rate", "n_samples", "channels",
                    "rms", "zcr", "spectral_centroid_hz", "error",
                ],
            )

    return media.select("media_ref", wav_col).mapInPandas(fn, AUDIO_FEATURES_SCHEMA)


def synth_audio_table(media: DataFrame) -> DataFrame:
    """media_ref → deterministic (media_ref, wav) fixture table, rendered
    DISTRIBUTED (mapInPandas, never a driver loop)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_ref": pdf["media_ref"],
                    "wav": [synth_wav_bytes(r) for r in pdf["media_ref"]],
                }
            )

    return media.select("media_ref").mapInPandas(fn, "media_ref string, wav binary")


def audio_metadata_sql(max_docs: int = 40) -> str:
    """DuckDB oracle for the audio decode roundtrip on the synth fixture:
    synth_wav_bytes derives n_samples from the ref's md5 (first 4 digest
    bytes big-endian = first 8 hex chars), so the decoded container
    properties are pure SQL over documents.doc_id."""
    ref = "printf('m-%06d', doc_id)"
    seed = f"CAST('0x' || substr(md5({ref}), 1, 8) AS BIGINT)"
    return f"""
    SELECT {ref} AS media_ref, 8000 AS sample_rate,
           CAST(2048 + ({seed} % 4) * 512 AS INT) AS n_samples,
           1 AS channels
    FROM documents WHERE doc_id < {max_docs}
    """


def synth_y4m_bytes(ref: str) -> bytes:
    """Deterministic fixture video for a media ref: 16x16 mono frames, one
    diagonal-gradient frame per index, all parameters derived from the
    ref's md5. REAL .y4m bytes — encode_y4m → decode_y4m roundtrips
    through the actual codec. Frame ``fi`` is ``base + (y + x)`` with
    ``base = (seed + 31*fi) % 200`` (max value 229, no uint8 wrap), so the
    decoded per-frame mean luma is exactly ``base + 15`` — a pure SQL
    function of the ref (see video_frame_sample_sql)."""
    from ..codecs.y4m import encode_y4m

    seed = int.from_bytes(hashlib.md5(ref.encode()).digest()[:4], "big")
    n_frames = 30 + seed % 120
    yy, xx = np.mgrid[0:16, 0:16]
    grad = (yy + xx).astype(np.int64)  # mean 15.0 over the 16x16 grid
    bases = (seed + 31 * np.arange(n_frames, dtype=np.int64)) % 200
    frames = (bases[:, None, None] + grad[None]).astype(np.uint8)
    return encode_y4m(frames, fps=25)


def synth_video_table(media: DataFrame) -> DataFrame:
    """media_ref → deterministic (media_ref, y4m) fixture table, rendered
    DISTRIBUTED (mapInPandas, never a driver loop)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_ref": pdf["media_ref"],
                    "y4m": [synth_y4m_bytes(r) for r in pdf["media_ref"]],
                }
            )

    return media.select("media_ref").mapInPandas(fn, "media_ref string, y4m binary")


VIDEO_FRAME_SCHEMA = (
    "media_ref string, frame_idx int, width int, height int, "
    "mean_luma double, frame_png binary, error string"
)


def video_frame_sample(
    media: DataFrame,
    y4m_col: str = "y4m",
    every_n: int = 10,
    max_frames: int = 4,
) -> DataFrame:
    """Frame sampling over REAL decoded .y4m bytes (codecs/y4m.py): every
    ``every_n``-th frame, at most ``max_frames`` per video, each emitted
    with its decoded geometry + mean luma and re-encoded as a PNG still —
    the shape a vision-training sampler (decode → subsample → thumbnail)
    follows. Per-item fault isolation mirrors image_metadata."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..codecs.png import encode_png
        from ..codecs.y4m import decode_y4m

        for pdf in batches:
            rows = []
            for ref, data in zip(pdf["media_ref"], pdf[y4m_col]):
                try:
                    if data is None:
                        raise ValueError("missing video bytes")
                    frames, _fps = decode_y4m(bytes(data))
                    n, h, w = frames.shape
                    for fi in range(0, min(n, every_n * max_frames), every_n):
                        frame = frames[fi]
                        rows.append(
                            (ref, fi, w, h, round(float(frame.mean()), 6),
                             bytearray(encode_png(frame)), None)
                        )
                except Exception as exc:
                    rows.append((ref, None, None, None, None, None, repr(exc)))
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_ref", "frame_idx", "width", "height",
                    "mean_luma", "frame_png", "error",
                ],
            )

    return media.select("media_ref", y4m_col).mapInPandas(fn, VIDEO_FRAME_SCHEMA)


def video_frame_sample_sql(max_docs: int = 40, every_n: int = 10, max_frames: int = 4) -> str:
    """DuckDB oracle for the video decode + frame-sample roundtrip on the
    synth fixture: synth_y4m_bytes derives frame count and per-frame base
    luma from the ref's md5, so every decoded property — which frame
    indices get sampled, the 16x16 geometry, and the exact mean luma
    (base + 15, gradient mean) — is pure SQL over documents.doc_id."""
    ref = "printf('m-%06d', doc_id)"
    seed = f"CAST('0x' || substr(md5({ref}), 1, 8) AS BIGINT)"
    return f"""
    WITH v AS (
      SELECT {ref} AS media_ref, {seed} AS seed
      FROM documents WHERE doc_id < {max_docs}
    ), s AS (
      SELECT media_ref, seed,
             unnest(range(0, least(30 + seed % 120, {every_n * max_frames}),
                          {every_n})) AS fi
      FROM v
    )
    SELECT media_ref, CAST(fi AS INT) AS frame_idx,
           16 AS width, 16 AS height,
           CAST((seed + 31 * fi) % 200 + 15 AS DOUBLE) AS mean_luma
    FROM s
    """
