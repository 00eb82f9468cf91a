"""Pure-stdlib WAV codec (16-bit PCM), matching the repo's codec pattern
(png.py / bmp.py: no external libs, bytes <-> numpy).

The reference has no audio path; this backs the training-data pipeline's
multimodal operators (analytics/multimodal.py) with a REAL decoder so the
audio feature extraction exercises actual bytes end-to-end — stdlib
``wave`` handles the RIFF container, numpy the PCM block.
"""

from __future__ import annotations

import io
import wave

import numpy as np


def encode_wav(samples: np.ndarray, sample_rate: int = 8000) -> bytes:
    """float samples in [-1, 1], shape (n,) or (n, channels) → 16-bit PCM
    WAV bytes. Values are clipped and rounded to int16."""
    arr = np.asarray(samples, dtype=np.float64)
    if arr.ndim == 1:
        arr = arr[:, None]
    pcm = np.clip(np.round(arr * 32767.0), -32768, 32767).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(arr.shape[1])
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(pcm.tobytes())
    return buf.getvalue()


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes → (float32 samples in [-1, 1] shaped (n, channels),
    sample_rate). 16-bit PCM only — the format our encoder writes and the
    overwhelmingly common interchange case."""
    with wave.open(io.BytesIO(data), "rb") as w:
        n_frames = w.getnframes()
        channels = w.getnchannels()
        width = w.getsampwidth()
        rate = w.getframerate()
        raw = w.readframes(n_frames)
    if width != 2:
        raise ValueError(f"unsupported WAV sample width: {width} bytes")
    pcm = np.frombuffer(raw, dtype="<i2").reshape(-1, channels)
    return pcm.astype(np.float32) / 32768.0, rate
