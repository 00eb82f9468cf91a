"""Multimodal column operators: opaque binary media + typed metadata.

Images are first-class (the OCR pipeline's own pure-Python PNG codec gives
real decode). Audio is REAL too: a stdlib-`wave` 16-bit PCM codec
(codecs/wav.py) decodes actual bytes end-to-end. Video remains the one
STUBBED decoder (no av library in this environment), clearly marked below
— its Spark-side plumbing (schema, partitioning, Arrow UDF signature,
batch shape) is real and tested.

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


def video_frame_sample(media: DataFrame, every_n: int = 10, max_frames: int = 4) -> DataFrame:
    """Frame sampling: one row per sampled frame index. Decode is STUBBED
    (no video libs here): frame count derives deterministically from the
    ref; a real deployment swaps in an ffmpeg-backed iterator with the
    same output schema (media_ref, frame_idx, frame_png)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..codecs.png import encode_png

        for pdf in batches:
            refs, idxs, frames = [], [], []
            for ref in pdf["media_ref"]:
                seed = int.from_bytes(hashlib.md5(ref.encode()).digest()[:4], "big")
                n_frames = 30 + seed % 120
                for k, fi in enumerate(range(0, n_frames, every_n)):
                    if k >= max_frames:
                        break
                    rng = np.random.RandomState((seed + fi) & 0x7FFFFFFF)
                    frame = (rng.rand(8, 8) * 255).astype(np.uint8)  # STUB frame
                    refs.append(ref)
                    idxs.append(fi)
                    frames.append(bytearray(encode_png(frame)))
            yield pd.DataFrame(
                {"media_ref": refs, "frame_idx": idxs, "frame_png": frames}
            )

    return media.select("media_ref").mapInPandas(
        fn, "media_ref string, frame_idx int, frame_png binary"
    )
