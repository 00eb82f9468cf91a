"""The flagship extraction job (SURVEY §3.1, Spark-native re-expression).

    documents ──explode──▶ spans ──┬─ kind='text' ───────────────────────┐
                                   └─ kind='media' ─ join(media) ─ salt ─┤
                                        └ mapInPandas(OCR kernel) ───────┤
                                                                         ▼
                    unionByName ─ row_number per doc ─▶ extracted spans
                    (groupBy(doc_id) + sort_array(collect_list(...)) for
                     the assembled-document variant)

Physical design (SURVEY §4, "needs explicit engineering"):
  * the font model ships as ONE sc.broadcast of numpy arrays — the NN loop
    is numpy inside the Arrow UDF, zero per-lookup IO (vs the reference's
    per-character DB futures, OCRScan.java:209, OCRDatabaseManager.java:234-302);
  * media work is repartitioned on xxhash64(media_ref) so one document's
    many images and any size-skewed hot keys spread across the cluster
    (the salted-repartition requirement of the north rule); AQE skew-join
    handles the residual;
  * everything before/after the UDF is plain DataFrame ops — Catalyst
    pushes the kind filter and column pruning into the parquet scan and
    picks broadcast-hash for the small media dim automatically.

At 100 TB: the documents scan is columnar with only (doc_id, spans) read;
the only wide shuffles are the media repartition (sized by
ocr_partitions) and the final per-doc assembly, both keyed on high-
cardinality ids — no skewed groupBy keys.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..model import FontModel

OCR_OUTPUT_SCHEMA = (
    "doc_id string, offset int, kind string, text string, media_ref string, "
    "glyph_count long, line_count int, font_size_pt double, error string"
)


def make_ocr_udf(broadcast_model):
    """mapInPandas generator: (doc_id, offset, media_ref, png) batches →
    recognized spans + per-image metrics. Decode → binarize → kernel scan,
    all numpy inside the Arrow batch (north rule: no per-row Python at the
    DataFrame level — the per-image loop is the reference's own granularity)."""

    def ocr_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..codecs.bmp import decode_image
        from ..kernel.grid import binarize
        from ..kernel.metrics import font_size_of
        from ..kernel.scan import render_text, scan_grid

        model: FontModel = broadcast_model.value
        for pdf in batches:
            n = len(pdf)
            texts: list = [None] * n
            glyphs = [0] * n
            line_counts = [0] * n
            font_sizes: list = [None] * n
            errors: list = [None] * n
            for i, png in enumerate(pdf["png"]):
                try:
                    if png is None:
                        raise ValueError("missing media bytes")
                    lines = scan_grid(binarize(decode_image(png)), model)
                    texts[i] = render_text(lines)
                    glyphs[i] = int(sum(len(l) for _y, l in lines))
                    line_counts[i] = len(lines)
                    # A7: per-image mean font-size estimate
                    sizes = [
                        s for _y, line in lines for l in line
                        if l.letter != " " and (s := font_size_of(l, model)) is not None
                    ]
                    font_sizes[i] = sum(sizes) / len(sizes) if sizes else None
                except Exception as exc:  # per-image fault isolation
                    errors[i] = f"{type(exc).__name__}: {exc}"
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].values,
                    "offset": pdf["offset"].values,
                    "kind": ["text"] * n,
                    "text": texts,
                    "media_ref": pdf["media_ref"].values,
                    "glyph_count": glyphs,
                    "line_count": line_counts,
                    "font_size_pt": font_sizes,
                    "error": errors,
                }
            )

    return ocr_batches


def extract_spans(
    spark: SparkSession,
    documents: DataFrame,
    media: DataFrame,
    model: FontModel,
    ocr_partitions: int | None = None,
    media_join: str = "broadcast_meta",
) -> DataFrame:
    """documents (doc_id, spans) + media (media_ref, png) → extracted spans
    (doc_id, seq, kind, text, media_ref, offset, glyph_count, error).

    media_join picks the physical strategy for attaching image bytes:

    * ``broadcast_meta`` (default): broadcast the tiny (doc_id, offset,
      media_ref) span-metadata side onto the media table, so the IMAGE
      BYTES NEVER SHUFFLE — OCR runs on media's natural size-balanced
      partitioning (parquet splits are bounded by maxPartitionBytes, so
      per-task byte volume is already even). Missing media is detected by
      a metadata-only anti-join (no bytes move) and surfaces as the same
      error rows the shuffle path produces. Right whenever the media-span
      metadata of the processed slice fits the broadcast budget — true for
      per-bucket-group processing (pipeline/state.py) at any corpus size.
    * ``shuffle``: spans-side left join + explicit salted repartition on
      xxhash64(media_ref). The unbounded-slice fallback; also the shape a
      bucketed/co-located table layout turns into a zero-exchange SMJ.
    """
    bmodel = spark.sparkContext.broadcast(model)

    spans = documents.select(
        "doc_id", F.explode("spans").alias("span")
    ).select("doc_id", "span.kind", "span.text", "span.media_ref", "span.offset")

    text_spans = (
        spans.filter(F.col("kind") == "text")
        .select(
            "doc_id", "offset", F.lit("text").alias("kind"), "text",
            F.lit(None).cast("string").alias("media_ref"),
            F.lit(0).cast("long").alias("glyph_count"),
            F.lit(0).cast("int").alias("line_count"),
            F.lit(None).cast("double").alias("font_size_pt"),
            F.lit(None).cast("string").alias("error"),
        )
    )

    meta = spans.filter(F.col("kind") == "media").select(
        "doc_id", "offset", "media_ref"
    )
    if media_join == "broadcast_meta":
        # bytes stay put: inner-join media → broadcast(meta); missing media
        # recovered via metadata-only anti-join (null png → error row)
        with_png = media.select("media_ref", "png").join(
            F.broadcast(meta), "media_ref", "inner"
        ).select("doc_id", "offset", "media_ref", "png")
        missing = meta.join(
            media.select("media_ref"), "media_ref", "left_anti"
        ).select(
            "doc_id", "offset", "media_ref", F.lit(None).cast("binary").alias("png")
        )
        media_spans = with_png.unionByName(missing)
    else:
        media_spans = meta.join(media.select("media_ref", "png"), "media_ref", "left")
        if ocr_partitions:
            # spread size skew: hash the (unique) media_ref, never doc_id alone
            media_spans = media_spans.repartition(
                ocr_partitions, F.xxhash64("media_ref")
            )

    ocr_spans = media_spans.mapInPandas(make_ocr_udf(bmodel), OCR_OUTPUT_SCHEMA)

    result = text_spans.unionByName(ocr_spans)
    seq = Window.partitionBy("doc_id").orderBy("offset")
    return result.withColumn("seq", (F.row_number().over(seq) - 1).cast("int")).select(
        "doc_id", "seq", "kind", "text", "media_ref", "offset",
        "glyph_count", "line_count", "font_size_pt", "error",
    )


def assemble_documents(extracted: DataFrame) -> DataFrame:
    """O5: splice recognized spans back into per-doc ordered arrays.
    sort_array on struct sorts by the first field = offset (SURVEY §2f O5)."""
    return extracted.groupBy("doc_id").agg(
        F.sort_array(
            F.collect_list(F.struct("offset", "seq", "kind", "text", "media_ref"))
        ).alias("spans"),
        F.sum("glyph_count").alias("glyph_count"),
        F.max(F.when(F.col("error").isNotNull(), 1).otherwise(0)).alias("has_error"),
    )
