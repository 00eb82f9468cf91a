"""Main-content extraction over interleaved text+media web documents.

The north rule (BASELINE.json) mandates a PySpark-native main-content
extraction pipeline: HTML boilerplate strip, PDF/layout parse, DOM
heuristics — over the same interleaved span table the OCR pipeline
consumes. Everything here is stdlib-only (html.parser, zlib) and runs
per-document inside Arrow-batched ``mapInPandas`` UDFs: a narrow map with
no shuffle, so the stage scales linearly with executors at 10^12-doc
scale.
"""
