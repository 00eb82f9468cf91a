"""Pretrained model artifact management.

The SparkGrid font model is fully deterministic (seeded glyphs, fixed
trainer), so the trained tables are committed under newocr_spark/data/ and
loaded at runtime; train_font() regenerates bit-identical tables (asserted
in tests/test_recognition.py)."""

from __future__ import annotations

import os

from .model import FontModel

_MODEL: FontModel | None = None

DATA_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "data", "font_model")


def get_model() -> FontModel:
    global _MODEL
    if _MODEL is None:
        if os.path.exists(os.path.join(DATA_DIR, "font_model.parquet")):
            _MODEL = FontModel.load(DATA_DIR)
        else:
            from .font.train import train_font

            _MODEL = train_font()
            try:
                _MODEL.save(DATA_DIR)
            except OSError:
                pass  # read-only deployments train in-memory
    return _MODEL
