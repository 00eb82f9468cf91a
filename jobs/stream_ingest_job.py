#!/usr/bin/env python
"""Cluster entry point: continuous ingestion dedup via spark-submit.

  python scripts/package.py
  spark-submit --py-files dist/newocr_spark.zip jobs/stream_ingest_job.py \\
      --documents s3://bucket/incoming --output s3://bucket/ingested \\
      --checkpoint s3://bucket/ckpt --mode neardup --horizon "30 minutes"

The streaming front door of the curation pipeline: new document files →
exact (`--mode exact`, content-hash dropDuplicatesWithinWatermark) or
near-dup (`--mode neardup`, MinHash band-signature claims —
pipeline/streaming.stream_dedup_neardup) suppression as data lands, with
bounded watermark-evicted state and exactly-once file-source progress via
the checkpoint. Downstream, the batch `curate_job` (optionally in
incremental mode against the persisted band index) runs the heavy
quality/decontamination/packing stages on what this admits — the two
jobs share suppression semantics, so a doc the stream admits and a doc
the batch gate admits agree.

``--once`` drains available input and stops (incremental backfill /
cron); without it the query runs until terminated (continuous tail).
"""

from __future__ import annotations

import argparse


def main(argv: list[str] | None = None, spark=None) -> int:
    """Returns the number of admitted docs in --output after the drain
    (``--once`` mode; continuous mode returns 0 after termination).
    argv/spark are injectable for the in-process e2e test."""
    p = argparse.ArgumentParser()
    p.add_argument("--documents", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--mode", choices=("exact", "neardup"), default="neardup")
    p.add_argument("--watermark-delay", default="10 minutes")
    p.add_argument("--horizon", default="10 minutes")
    p.add_argument("--ts-col", default="ingested_at")
    p.add_argument("--once", action="store_true", default=True)
    p.add_argument("--continuous", dest="once", action="store_false")
    p.add_argument("--timeout-sec", type=int, default=None)
    args = p.parse_args(argv)

    from pyspark.sql import SparkSession

    from newocr_spark.pipeline.streaming import (
        stream_dedup_exact, stream_dedup_neardup,
    )

    owns_session = spark is None
    if owns_session:
        spark = SparkSession.builder.appName("newocr-stream-ingest").getOrCreate()

    if args.mode == "exact":
        q = stream_dedup_exact(
            spark, args.documents, args.output, args.checkpoint,
            watermark_delay=args.watermark_delay, ts_col=args.ts_col,
            trigger_once=args.once,
        )
    else:
        q = stream_dedup_neardup(
            spark, args.documents, args.output, args.checkpoint,
            watermark_delay=args.watermark_delay, horizon=args.horizon,
            ts_col=args.ts_col, trigger_once=args.once,
        )
    if args.timeout_sec is not None:
        q.awaitTermination(args.timeout_sec)
    else:
        q.awaitTermination()

    n = 0
    if args.once:
        try:
            n = spark.read.parquet(args.output).count()
        except Exception:
            n = 0  # nothing admitted yet -> no output files
        print(f"ingested {n} docs -> {args.output}")
    if owns_session:
        spark.stop()
    return n


if __name__ == "__main__":
    main()
