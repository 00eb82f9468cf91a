"""Structured Streaming front-end for the extraction pipeline.

The reference is strictly batch (SURVEY §2j: no watermarks/streaming state
exist to port); this wrapper is Spark-native infrastructure for continuous
ingestion of new document files: ``readStream`` over the documents
directory → ``foreachBatch`` → the same ``extract_spans`` plan per
micro-batch, with Spark's own checkpointLocation providing exactly-once
file-source progress (complementing the doc-bucket state table used for
batch backfills, pipeline/state.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..model import FontModel
from .extract import extract_spans


def stream_extract(
    spark: SparkSession,
    documents_path: str,
    media: DataFrame,
    model: FontModel,
    output_path: str,
    checkpoint_path: str,
    schema=None,
    ocr_partitions: int | None = None,
    trigger_once: bool = True,
):
    """Start a streaming query: new document parquet files → extracted spans.

    Returns the StreamingQuery; callers await .awaitTermination(). With
    trigger_once=True this drains available input and stops — the pattern
    for incremental backfill jobs.
    """
    if schema is None:
        schema = spark.read.parquet(documents_path).schema
    stream = spark.readStream.schema(schema).parquet(documents_path)

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        extracted = extract_spans(
            spark, batch_df, media, model, ocr_partitions=ocr_partitions
        )
        extracted.write.mode("append").parquet(output_path)

    writer = stream.writeStream.foreachBatch(process_batch).option(
        "checkpointLocation", checkpoint_path
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()
