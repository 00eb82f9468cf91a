"""Multimodal column operators: opaque binary media + typed metadata.

Images are first-class (the OCR pipeline's own pure-Python PNG codec gives
real decode); audio/video decoding has no library in this environment, so
those decoders are STUBBED behind deterministic fakes clearly marked below
— the Spark-side plumbing (schema, partitioning, Arrow UDF signature,
batch shape) is real and tested either way.

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


def _stub_wave(ref: str, n: int = 256) -> np.ndarray:
    """STUB: deterministic fake decoded audio (no audio libs in this env).
    Replace with a real decoder (soundfile/ffmpeg) on a full deployment;
    the signature and batch shape are what a real decoder would produce."""
    seed = int.from_bytes(hashlib.md5(ref.encode()).digest()[:4], "big")
    rng = np.random.RandomState(seed)
    return rng.standard_normal(n).astype(np.float32)


def audio_features(media: DataFrame, n_samples: int = 256) -> DataFrame:
    """Audio feature extraction: rms / zero-crossing-rate / spectral
    centroid over (stubbed) decoded waveforms. The numpy feature math is
    real; only the decode is a deterministic fake (see _stub_wave)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for ref in pdf["media_ref"]:
                w = _stub_wave(ref, n_samples)
                rms = float(np.sqrt((w ** 2).mean()))
                zcr = float((np.diff(np.signbit(w)) != 0).mean())
                spec = np.abs(np.fft.rfft(w))
                freqs = np.arange(len(spec))
                centroid = float((spec * freqs).sum() / spec.sum())
                rows.append((ref, round(rms, 6), round(zcr, 6), round(centroid, 6)))
            yield pd.DataFrame(
                rows, columns=["media_ref", "rms", "zcr", "spectral_centroid"]
            )

    return media.select("media_ref").mapInPandas(
        fn, "media_ref string, rms double, zcr double, spectral_centroid double"
    )


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
