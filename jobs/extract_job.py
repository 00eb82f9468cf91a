#!/usr/bin/env python
"""Cluster entry point: resumable OCR extraction via spark-submit.

  python scripts/package.py
  spark-submit --py-files dist/newocr_spark.zip jobs/extract_job.py \\
      --documents s3://bucket/documents --media s3://bucket/media \\
      --output s3://bucket/extracted --state s3://bucket/extract_state \\
      --snapshot <input-snapshot-id> --run-id <id> \\
      --buckets 4096 --group-size 64

At 10^12-document scale: buckets are the unit of resume (pick buckets >>
executor count so stragglers rebalance), group-size bounds the work lost to
a mid-run failure, and ocr-partitions sizes the media shuffle under
--media-join shuffle only (default 2x total cores via
spark.sparkContext.defaultParallelism; the default broadcast_meta path
never shuffles image bytes and takes no partition count).
"""

from __future__ import annotations

import argparse


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--documents", required=True)
    p.add_argument("--media", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--state", required=True)
    p.add_argument("--snapshot", required=True)
    p.add_argument("--run-id", required=True)
    p.add_argument("--buckets", type=int, default=4096)
    p.add_argument("--group-size", type=int, default=64)
    p.add_argument("--model-dir", default=None)
    p.add_argument(
        "--ocr-partitions", type=int, default=None,
        help="sizes the salted media repartition; ONLY applies with "
        "--media-join shuffle (the default broadcast_meta path runs OCR on "
        "the media table's natural parquet splits and ignores this). "
        "Default under shuffle: 2x total cores.",
    )
    p.add_argument(
        "--media-join", choices=("shuffle", "broadcast_meta"),
        default="broadcast_meta",
        help="broadcast_meta (default): span metadata broadcasts onto each "
        "bucket's media slice, image bytes never shuffle; shuffle adds a "
        "salted repartition before OCR for size-skewed bucket splits",
    )
    args = p.parse_args()

    from newocr_spark.artifacts import get_model
    from newocr_spark.model import FontModel
    from newocr_spark.pipeline.session import build_session
    from newocr_spark.pipeline.state import ExtractRunner, StateTable

    spark = build_session(app="newocr-extract")
    model = (
        FontModel.load(args.model_dir) if args.model_dir else get_model()
    )
    ocr_parts = None
    if args.media_join == "shuffle":
        ocr_parts = args.ocr_partitions or spark.sparkContext.defaultParallelism * 2
    elif args.ocr_partitions:
        p.error("--ocr-partitions requires --media-join shuffle")
    runner = ExtractRunner(
        spark, model, args.output, StateTable(spark, args.state),
        n_buckets=args.buckets, group_size=args.group_size,
        ocr_partitions=ocr_parts, media_join=args.media_join,
    )
    docs = spark.read.parquet(args.documents)
    media = spark.read.parquet(args.media)
    stats = runner.run(docs, media, input_snapshot=args.snapshot, run_id=args.run_id)
    print(stats)


if __name__ == "__main__":
    main()
