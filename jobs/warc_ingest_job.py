#!/usr/bin/env python
"""Cluster entry point: WARC archive → interleaved documents table via
spark-submit — the ingest bridge from a raw crawl archive into the
north_rule input shape every other job consumes.

  python scripts/package.py
  spark-submit --py-files dist/newocr_spark.zip jobs/warc_ingest_job.py \\
      --blobs s3://bucket/warc_blobs --output s3://bucket/documents \\
      --records-out s3://bucket/warc_inventory

Stages (all narrow except the optional synthesis packer):

  blobs(blob_id, data:binary)                      # record-aligned WARC files
    → parse_warc (ISO 28500 framing walk + HTTP parse, one mapInPandas)
    → keep HTTP-200 text/html response records
    → html_to_documents(html_col=...)              # boilerplate strip →
      documents(doc_id=WARC-Target-URI, spans)     #   input_hint shape
    → write parquet

With --records-out the full record inventory (warcinfo + every response,
with status/content-type) also lands as parquet — the archive audit
table. With --synthesize-from DOCS the blob table is first built from a
(doc_id, text) documents table via sources/warc.synth_warc_blobs (the
deterministic fixture path used by the e2e test; a real deployment
points --blobs at archives written by the crawler).

100 TB shape: parsing + extraction are narrow maps over opaque binary
cells — zero shuffles on the read path; per-document fault isolation via
html_to_documents' kind='error' spans keeps one bad page from poisoning
a partition.
"""

from __future__ import annotations

import argparse


def main(argv: list[str] | None = None, spark=None) -> int:
    """Returns the emitted document count (argv/spark injectable for the
    in-process e2e test, same pattern as curate_job)."""
    p = argparse.ArgumentParser()
    p.add_argument("--blobs", default=None,
                   help="parquet of (blob_id, data) WARC blobs")
    p.add_argument("--output", required=True)
    p.add_argument("--records-out", default=None,
                   help="also write the parsed record inventory here")
    p.add_argument("--synthesize-from", default=None, metavar="DOCS",
                   help="build the blob table from this (doc_id, text) "
                   "documents parquet first (fixture/test path)")
    p.add_argument("--max-docs", type=int, default=None,
                   help="with --synthesize-from: cap the doc count")
    args = p.parse_args(argv)
    if (args.blobs is None) == (args.synthesize_from is None):
        raise SystemExit("pass exactly one of --blobs / --synthesize-from")

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from newocr_spark.sources.warc import parse_warc, synth_warc_blobs
    from newocr_spark.web.extract import html_to_documents

    owns_session = spark is None
    if owns_session:
        spark = SparkSession.builder.appName("newocr-warc-ingest").getOrCreate()

    if args.synthesize_from:
        docs = spark.read.parquet(args.synthesize_from).select(
            "doc_id", "text"
        )
        if args.max_docs:
            docs = docs.filter(F.col("doc_id") < args.max_docs)
        blobs = synth_warc_blobs(docs)
    else:
        blobs = spark.read.parquet(args.blobs).select("blob_id", "data")

    recs = parse_warc(blobs)
    if args.records_out:
        recs.write.mode("overwrite").parquet(args.records_out)
        recs = spark.read.parquet(args.records_out)  # reuse the parse

    pages = recs.filter(
        (F.col("warc_type") == "response")
        & (F.col("http_status") == 200)
        & F.col("content_type").startswith("text/html")
    ).select(F.col("target_uri").alias("doc_id"), F.col("payload").alias("html"))
    out = html_to_documents(pages, html_col="html")
    out.write.mode("overwrite").parquet(args.output)
    n = spark.read.parquet(args.output).count()
    print({"documents": n})
    if owns_session:
        spark.stop()
    return n


if __name__ == "__main__":
    main()
