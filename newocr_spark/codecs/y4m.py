"""Pure-stdlib YUV4MPEG2 (.y4m) video codec, matching the repo's codec
pattern (png.py / bmp.py / wav.py: no external libs, bytes <-> numpy).

Y4M is the standard *uncompressed* raw-video interchange container
(mjpegtools/ffmpeg `-f yuv4mpeg`): an ASCII stream header
``YUV4MPEG2 W<w> H<h> F<num>:<den> ... [C<colourspace>]`` followed by
``FRAME[ params]\n`` markers, each carrying one raw plane dump. We write
and read the ``Cmono`` colourspace (Y plane only, 8-bit grayscale) — the
OCR engine is grayscale end-to-end, and mono keeps each frame exactly
``w*h`` bytes with no chroma subsampling ambiguity. ``C420``-family
streams (the ffmpeg default) decode too: the U/V half-planes are parsed
and skipped, luma is returned.

The reference has no video path; this backs the training-data pipeline's
multimodal operators (analytics/multimodal.py) with a REAL decoder so
frame sampling exercises actual container bytes end-to-end.
"""

from __future__ import annotations

import numpy as np

_MAGIC = b"YUV4MPEG2"


def encode_y4m(frames: np.ndarray, fps: int = 25) -> bytes:
    """uint8 grayscale frames shaped (n, h, w) → mono .y4m bytes."""
    arr = np.asarray(frames, dtype=np.uint8)
    if arr.ndim != 3:
        raise ValueError(f"frames must be (n, h, w), got {arr.shape}")
    n, h, w = arr.shape
    out = [b"YUV4MPEG2 W%d H%d F%d:1 Ip A1:1 Cmono\n" % (w, h, fps)]
    for i in range(n):
        out.append(b"FRAME\n")
        out.append(arr[i].tobytes())
    return b"".join(out)


def decode_y4m(data: bytes) -> tuple[np.ndarray, int]:
    """.y4m bytes → (uint8 luma frames shaped (n, h, w), fps numerator).

    Accepts ``Cmono`` (what we write) and the ``C420``/``C422``/``C444``
    families (chroma planes parsed and discarded). Raises ValueError on a
    bad magic, missing W/H, or a truncated frame payload.
    """
    if not data.startswith(_MAGIC):
        raise ValueError("not a YUV4MPEG2 stream")
    nl = data.index(b"\n")
    header = data[:nl].decode("ascii", "replace")
    w = h = fps = None
    colour = "420"  # spec default when C is absent
    for tok in header.split(" ")[1:]:
        if not tok:
            continue
        tag, val = tok[0], tok[1:]
        if tag == "W":
            w = int(val)
        elif tag == "H":
            h = int(val)
        elif tag == "F":
            fps = int(val.split(":")[0])
        elif tag == "C":
            colour = val
    if not w or not h:
        raise ValueError(f"missing W/H in header: {header!r}")
    luma_len = w * h
    if colour.startswith("mono"):
        chroma_len = 0
    elif colour.startswith("420"):
        chroma_len = 2 * ((w // 2) * (h // 2))
    elif colour.startswith("422"):
        chroma_len = 2 * ((w // 2) * h)
    elif colour.startswith("444"):
        chroma_len = 2 * luma_len
    else:
        raise ValueError(f"unsupported colourspace C{colour}")
    frames = []
    pos = nl + 1
    while pos < len(data):
        fnl = data.index(b"\n", pos)
        if data[pos:fnl].split(b" ")[0] != b"FRAME":
            raise ValueError(f"bad frame marker at byte {pos}")
        start = fnl + 1
        end = start + luma_len + chroma_len
        if end > len(data):
            raise ValueError("truncated frame payload")
        frames.append(
            np.frombuffer(data[start : start + luma_len], dtype=np.uint8)
            .reshape(h, w)
            .copy()
        )
        pos = end
    return np.stack(frames) if frames else np.empty((0, h, w), np.uint8), fps or 25
