#!/usr/bin/env python
"""Cluster entry point: end-to-end training-corpus curation via
spark-submit.

  python scripts/package.py
  spark-submit --py-files dist/newocr_spark.zip jobs/curate_job.py \\
      --documents s3://bucket/documents --output s3://bucket/curated \\
      --benchmark-mod 53 --seq-budget 2048 --shards 4096

Pipeline (each stage is the registered contract operator, so the whole
job is declarative where the operator is, and shapes are the 100 TB ones
documented in analytics/curation.py / analytics/dedup.py):

  near-dup cluster resolution (MinHash-LSH → connected components)
    → keep one doc per cluster (doc_id == cluster_id), all singletons
    → drop benchmark-contaminated docs (broadcast shingle semi-join)
    → PII scrub (narrow JVM regexp map)
    → per-language stratified sample (hash-bucket filter, no RNG state)
    → pack into fixed-budget training sequences (one shuffle by shard,
      one within-shard running-sum window)
    → write parquet partitioned by shard

At 10^12-document scale: --shards sizes the packing shuffle (pick
shards >> executor count); set spark.sparkContext.setCheckpointDir so the
cluster-resolution rounds use RELIABLE checkpoints (dedup._iter_checkpoint
flips automatically when a dir is configured).
"""

from __future__ import annotations

import argparse


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--documents", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--dedup-threshold", type=float, default=0.5)
    p.add_argument("--benchmark-mod", type=int, default=53)
    p.add_argument("--min-overlap", type=int, default=3)
    p.add_argument("--seq-budget", type=int, default=2048)
    p.add_argument("--shards", type=int, default=4096)
    p.add_argument("--checkpoint-dir", default=None)
    args = p.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from newocr_spark.analytics import curation as C
    from newocr_spark.analytics.dedup import dup_clusters

    spark = SparkSession.builder.appName("newocr-curate").getOrCreate()
    if args.checkpoint_dir:
        spark.sparkContext.setCheckpointDir(args.checkpoint_dir)

    docs = spark.read.parquet(args.documents)

    # 1. near-dup clusters: drop every clustered doc except its canonical
    clusters = dup_clusters(docs, threshold=args.dedup_threshold)
    drop_dups = clusters.filter(F.col("doc_id") != F.col("cluster_id")).select(
        "doc_id"
    )
    kept = docs.join(drop_dups, "doc_id", "left_anti")

    # 2. benchmark decontamination: drop flagged docs. --benchmark-mod 0
    # disables the stage. NB: on the driver's synthetic corpus the tiny
    # shared vocabulary makes bigram overlap pervasive, so the default
    # min_overlap drops most docs there — real text does not behave this
    # way; tune --min-overlap per corpus.
    if args.benchmark_mod > 0:
        contaminated = C.decontaminate(
            kept, min_overlap=args.min_overlap, bench_mod=args.benchmark_mod
        ).select("doc_id")
        kept = kept.join(contaminated, "doc_id", "left_anti")

    # 3. PII scrub (keeps every doc; swaps text for the scrubbed version)
    scrubbed = C.pii_scrub(kept).select(
        "doc_id", F.col("clean_text").alias("text"), "n_emails", "n_phones", "n_ips"
    )
    kept = kept.drop("text").join(scrubbed, "doc_id")

    # 4. per-language stratified sample (deterministic hash buckets)
    sampled = C.stratified_sample(kept).select("doc_id")
    kept = kept.join(sampled, "doc_id", "left_semi")

    # 5. pack into fixed-budget training sequences, write sharded
    packed = C.pack_sequences(kept, budget=args.seq_budget, n_shards=args.shards)
    out = kept.join(packed, "doc_id").select(
        "doc_id", "lang", "text", "n_emails", "n_phones", "n_ips",
        "shard", "seq_id", "n_tok", "tok_offset",
    )
    out.write.mode("overwrite").partitionBy("shard").parquet(args.output)

    n = spark.read.parquet(args.output).count()
    print(f"curated {n} docs -> {args.output}")
    spark.stop()


if __name__ == "__main__":
    main()
