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


def stream_web_extract(
    spark: SparkSession,
    corpus_path: str,
    media: DataFrame,
    model: FontModel,
    output_path: str,
    checkpoint_path: str,
    html_col: str | None = None,
    schema=None,
    trigger_once: bool = True,
):
    """Continuous ingestion for the round-2 web pipeline: new raw-page
    files → boilerplate strip → interleaved spans → OCR of media spans →
    extracted span rows, appended exactly-once per input file (file-source
    checkpoint). Same micro-batch composition as the batch job
    (jobs/web_extract_job.py): the HTML stage is stateless/narrow, so the
    streaming wrapper adds no state beyond the source progress log."""
    from ..web.extract import html_to_documents

    if schema is None:
        schema = spark.read.parquet(corpus_path).schema
    stream = spark.readStream.schema(schema).parquet(corpus_path)

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        docs = html_to_documents(batch_df, html_col=html_col)
        extracted = extract_spans(spark, docs, media, model)
        extracted.write.mode("append").parquet(output_path)

    writer = stream.writeStream.foreachBatch(process_batch).option(
        "checkpointLocation", checkpoint_path
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_metrics(
    spark: SparkSession,
    extracted_path: str,
    output_path: str,
    checkpoint_path: str,
    window_duration: str = "1 minute",
    watermark_delay: str = "2 minutes",
    schema=None,
    trigger_once: bool = True,
):
    """Watermarked event-time rollup over the extraction output stream:
    per-window doc/glyph/error counts, tolerating late rows up to the
    watermark (classic Structured Streaming state management — late data
    beyond the delay is dropped, state for closed windows is evicted, so
    the operator's memory is bounded on an unbounded stream).

    Expects rows with a `committed_at` timestamp column (the state-table
    sink writes one; batch outputs can synthesize it). Append output mode:
    a window emits once, when the watermark passes its end."""
    from pyspark.sql import functions as F

    if schema is None:
        schema = spark.read.parquet(extracted_path).schema
    stream = spark.readStream.schema(schema).parquet(extracted_path)
    agg = (
        stream.withWatermark("committed_at", watermark_delay)
        .groupBy(F.window("committed_at", window_duration).alias("win"))
        .agg(
            F.count("*").alias("spans"),
            # exact distinct is unsupported in streaming aggs; HLL sparse
            # mode is exact at per-window doc counts this small anyway
            F.approx_count_distinct("doc_id").alias("docs"),
            F.sum("glyph_count").alias("glyphs"),
            F.sum(F.when(F.col("error").isNotNull(), 1).otherwise(0)).alias("errors"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "spans", "docs", "glyphs", "errors",
        )
    )
    writer = (
        agg.writeStream.outputMode("append")
        .format("parquet")
        .option("path", output_path)
        .option("checkpointLocation", checkpoint_path)
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_assemble(
    spark: SparkSession,
    spans_path: str,
    output_path: str,
    checkpoint_path: str,
    gap_seconds: int = 300,
    watermark_delay: str = "10 seconds",
    schema=None,
    trigger_once: bool = True,
):
    """Custom stateful streaming operator (``applyInPandasWithState``):
    cross-micro-batch per-document span assembly.

    Spans for one document can arrive across micro-batches (sharded
    extraction, multi-part uploads). Per ``doc_id``, arriving spans are
    buffered in group state; when the event-time watermark passes the
    document's last span + ``gap_seconds`` (an event-time *session gap*),
    the document is assembled in offset order, emitted once, and its state
    evicted — so state is bounded on an unbounded stream and a document is
    never emitted half-complete. This is the stateful pattern the built-in
    windowed aggregates can't express: the emission condition is per-KEY
    quiescence, not a fixed window boundary.

    Expects span rows with a ``committed_at`` timestamp (the state-table
    sink writes one). Output: one row per completed document with span
    counts and the offset-ordered text body.

    State layout: TYPED parallel arrays (seqs/offsets/is_media/texts), not
    a JSON blob — per-span state cost is the Arrow-encoded scalar width
    (no quoting/key overhead, no per-batch json parse/serialize of the
    whole buffer), bounded-tested with a multi-thousand-span document in
    tests/test_metrics_streaming.py.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    if schema is None:
        schema = spark.read.parquet(spans_path).schema
    # Arrow renders committed_at as a tz-NAIVE pandas timestamp in the
    # SESSION timezone, while getCurrentWatermarkMs/setTimeoutTimestamp are
    # UTC epoch-ms; .timestamp() on a naive value assumes UTC, so on a
    # non-UTC session the quiesce deadline would shift by the tz delta
    # (early → duplicate half-complete docs; late → docs held past the
    # gap). Localize to the session tz before epoch conversion.
    session_tz = spark.conf.get("spark.sql.session.timeZone")
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)  # one file = one micro-batch
        .parquet(spans_path)
        .withWatermark("committed_at", watermark_delay)
        .select("doc_id", "seq", "kind", "text", "offset", "committed_at")
    )

    out_schema = "doc_id string, n_spans int, n_media int, text string"
    state_schema = (
        "seqs array<int>, offsets array<int>, is_media array<boolean>, "
        "texts array<string>, last_ms long"
    )

    def _epoch_ms(ts) -> int:
        t = pd.Timestamp(ts)
        if t.tzinfo is None:
            # DST transitions: a committed_at in an ambiguous local hour
            # resolves to the DST side, one in a nonexistent hour shifts
            # forward — the default `raise` would kill the whole query on
            # any non-fixed-offset session tz twice a year.
            t = t.tz_localize(
                session_tz, ambiguous=True, nonexistent="shift_forward"
            )
        return int(t.timestamp() * 1000)

    def assemble(key, pdfs, state):
        if state.hasTimedOut:
            seqs, offsets, is_media, texts, _last = state.get
            order = sorted(range(len(seqs)), key=lambda i: (offsets[i], seqs[i]))
            body = [
                texts[i] for i in order if not is_media[i] and texts[i]
            ]
            state.remove()
            yield pd.DataFrame(
                [
                    {
                        "doc_id": key[0],
                        "n_spans": len(seqs),
                        "n_media": int(sum(1 for m in is_media if m)),
                        "text": "\n\n".join(body),
                    }
                ]
            )
            return
        seqs, offsets, is_media, texts = [], [], [], []
        last_ms = 0
        if state.exists:
            seqs, offsets, is_media, texts, last_ms = state.get
            seqs, offsets = list(seqs), list(offsets)
            is_media, texts = list(is_media), list(texts)
        for pdf in pdfs:
            for r in pdf.itertuples():
                seqs.append(int(r.seq))
                offsets.append(int(r.offset))
                is_media.append(str(r.kind) == "media")
                texts.append(None if pd.isna(r.text) else str(r.text))
                last_ms = max(last_ms, _epoch_ms(r.committed_at))
        state.update((seqs, offsets, is_media, texts, last_ms))
        # quiesce deadline; a timeout at-or-before the watermark would be
        # rejected, so clamp just past it (fires next micro-batch)
        state.setTimeoutTimestamp(
            max(last_ms + gap_seconds * 1000, state.getCurrentWatermarkMs() + 1)
        )

    assembled = stream.groupBy("doc_id").applyInPandasWithState(
        assemble,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
    writer = (
        assembled.writeStream.outputMode("append")
        .format("parquet")
        .option("path", output_path)
        .option("checkpointLocation", checkpoint_path)
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_dedup_exact(
    spark: SparkSession,
    documents_path: str,
    output_path: str,
    checkpoint_path: str,
    watermark_delay: str = "10 minutes",
    ts_col: str = "ingested_at",
    schema=None,
    trigger_once: bool = True,
):
    """Continuous exact dedup at ingestion: emit each document CONTENT
    (md5 of text) once within the watermark horizon — the streaming
    analogue of `analytics/dedup.exact_duplicates` for pipelines that
    dedup as data lands instead of in a batch pass.

    `dropDuplicatesWithinWatermark` keys state on the content hash and
    EVICTS an entry once the watermark passes its event time — bounded
    state on an unbounded stream, where a plain `dropDuplicates` would
    grow state forever. A duplicate arriving within the horizon is
    suppressed; a re-crawl after the horizon re-emits and the downstream
    batch dedup catches it. At 100 TB the horizon is the policy knob:
    state ≈ distinct hashes per horizon × ~16 bytes, partitioned by hash
    across executors. Expects rows carrying a `ts_col` event-time column
    (ingestion sinks stamp one)."""
    from pyspark.sql import functions as F

    if schema is None:
        schema = spark.read.parquet(documents_path).schema
    stream = spark.readStream.schema(schema).parquet(documents_path)
    deduped = (
        stream.withColumn("text_hash", F.md5("text"))
        .withWatermark(ts_col, watermark_delay)
        .dropDuplicatesWithinWatermark(["text_hash"])
    )
    writer = (
        deduped.writeStream.outputMode("append")
        .format("parquet")
        .option("path", output_path)
        .option("checkpointLocation", checkpoint_path)
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()
