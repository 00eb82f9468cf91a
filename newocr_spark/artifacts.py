"""Pretrained model artifact management.

The SparkGrid font models are fully deterministic (seeded glyphs, fixed
trainer), so the trained tables are committed under newocr_spark/data/ and
loaded at runtime; train_font() regenerates bit-identical tables (asserted
in tests/test_recognition.py). Six faces are shipped — exact parity with
the reference's per-font trained DBs (Accuracy.java trains one HSQLDB per
font; six certified font classes): "SparkGrid", the 1.5x-X-stretched
"SparkGridWide", the topology-distinct "SparkGridSerif", the
stretched-serif "SparkGridWideSerif", and the 1.5x-Y-stretched
"SparkGridTall"/"SparkGridTallSerif" — a {base, wide, tall} x
{sans, serif} metric grid."""

from __future__ import annotations

import os

from .model import FontConfig, FontModel

_MODELS: dict[str, FontModel] = {}

_BASE = os.path.join(os.path.dirname(os.path.abspath(__file__)), "data")
DATA_DIR = os.path.join(_BASE, "font_model")  # default face (back-compat)
_DIRS = {
    "SparkGrid": DATA_DIR,
    "SparkGridWide": os.path.join(_BASE, "font_model_wide"),
    "SparkGridSerif": os.path.join(_BASE, "font_model_serif"),
    "SparkGridWideSerif": os.path.join(_BASE, "font_model_wideserif"),
    "SparkGridTall": os.path.join(_BASE, "font_model_tall"),
    "SparkGridTallSerif": os.path.join(_BASE, "font_model_tallserif"),
}


def get_model(name: str = "SparkGrid") -> FontModel:
    if name not in _MODELS:
        data_dir = _DIRS[name]
        if os.path.exists(os.path.join(data_dir, "font_model.parquet")):
            # config comes from the font_config.json shipped next to the
            # trained tables (FontModel.load auto-reads it); fall back to
            # defaults only when the file is absent
            cfg = None
            if not os.path.exists(os.path.join(data_dir, "font_config.json")):
                cfg = FontConfig(name=name)
            _MODELS[name] = FontModel.load(data_dir, config=cfg)
        else:
            from .font.glyphs import FACES
            from .font.train import train_font

            _MODELS[name] = train_font(face=FACES[name]())
            try:
                _MODELS[name].save(data_dir)
            except OSError:
                pass  # read-only deployments train in-memory
    return _MODELS[name]
