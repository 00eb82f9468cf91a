"""Resumable checkpointing with per-partition lineage + metrics.

Implements FIXTURES.md §6 / SURVEY §4 item 4: the extraction job over a
10^12-document table must survive restarts without duplicating or losing
documents. Mechanics:

  * documents are assigned a deterministic bucket
    ``pmod(xxhash64(doc_id), n_buckets)`` — stable across runs and input
    snapshots, so a bucket is a durable unit of work;
  * buckets are processed in groups; each group's output lands in the sink
    partitioned by bucket with dynamic partition overwrite (idempotent —
    re-running a group replaces exactly its own partitions);
  * after a group commits, one state row per bucket is appended with
    lineage (input snapshot, doc-id range) and metrics (docs, glyphs,
    errors, wall ms, attempt);
  * resume = read the state table, skip buckets already committed for the
    same input snapshot; everything else is recomputed.

The sink here is Parquet (this sandbox has no Iceberg runtime on the
classpath); on an Iceberg deployment the same logic maps to
``writeTo(...).overwritePartitions()`` for the sink and a MERGE into the
state table keyed by (run_id, partition_id) — the unit of idempotency is
identical.
"""

from __future__ import annotations

import time
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..model import FontModel
from .extract import extract_spans

STATE_SCHEMA = (
    "run_id string, partition_id int, doc_id_min string, doc_id_max string, "
    "input_snapshot string, docs_done long, glyph_count long, error_count long, "
    "wall_ms long, attempt int, committed_at timestamp"
)


class StateTable:
    """Append-only parquet state table (Iceberg-state-table stand-in)."""

    def __init__(self, spark: SparkSession, path: str) -> None:
        self.spark = spark
        self.path = path

    def read(self) -> DataFrame:
        try:
            return self.spark.read.parquet(self.path)
        except Exception:
            return self.spark.createDataFrame([], STATE_SCHEMA)

    def completed_buckets(self, input_snapshot: str) -> set[int]:
        df = self.read().filter(F.col("input_snapshot") == input_snapshot)
        return {r.partition_id for r in df.select("partition_id").distinct().collect()}

    def append(self, rows: list[dict]) -> None:
        if rows:
            self.spark.createDataFrame(rows, STATE_SCHEMA).coalesce(1).write.mode(
                "append"
            ).parquet(self.path)

    def attempts(self, input_snapshot: str) -> int:
        df = self.read().filter(F.col("input_snapshot") == input_snapshot)
        row = df.agg(F.max("attempt")).collect()[0]
        return int(row[0]) if row[0] is not None else 0


@dataclass
class ExtractRunner:
    """Bucketed, resumable driver for the extraction job."""

    spark: SparkSession
    model: FontModel
    output_path: str
    state: StateTable
    n_buckets: int = 16
    group_size: int = 4
    ocr_partitions: int | None = None
    # "shuffle" is the unbounded-group-safe default; pass "broadcast_meta"
    # when a group's media-span metadata fits the broadcast budget
    # (n_buckets large enough), which keeps image bytes from shuffling
    media_join: str = "shuffle"
    # test hook: raise after committing this many groups (simulated crash)
    fail_after_groups: int | None = None

    def run(self, documents: DataFrame, media: DataFrame, input_snapshot: str, run_id: str) -> dict:
        spark = self.spark
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")

        done = self.state.completed_buckets(input_snapshot)
        attempt = self.state.attempts(input_snapshot) + 1
        todo = [b for b in range(self.n_buckets) if b not in done]
        groups = [
            todo[i : i + self.group_size]
            for i in range(0, len(todo), self.group_size)
        ]

        docs_b = documents.withColumn(
            "bucket", F.pmod(F.xxhash64("doc_id"), F.lit(self.n_buckets)).cast("int")
        )

        committed = 0
        stats = {"groups_run": 0, "buckets_done": len(done)}
        for group in groups:
            t0 = time.time()
            part = docs_b.filter(F.col("bucket").isin(group))
            extracted = extract_spans(
                spark, part.drop("bucket"), media, self.model,
                ocr_partitions=self.ocr_partitions, media_join=self.media_join,
            ).withColumn(
                "bucket", F.pmod(F.xxhash64("doc_id"), F.lit(self.n_buckets)).cast("int")
            )
            # idempotent per-bucket sink: dynamic partition overwrite
            extracted.write.mode("overwrite").partitionBy("bucket").parquet(
                self.output_path
            )
            wall_ms = int((time.time() - t0) * 1000)
            metrics = (
                extracted.groupBy("bucket")
                .agg(
                    F.countDistinct("doc_id").alias("docs_done"),
                    F.sum("glyph_count").alias("glyph_count"),
                    F.sum(F.when(F.col("error").isNotNull(), 1).otherwise(0)).alias(
                        "error_count"
                    ),
                    F.min("doc_id").alias("doc_id_min"),
                    F.max("doc_id").alias("doc_id_max"),
                )
                .collect()
            )
            by_bucket = {r.bucket: r for r in metrics}
            import datetime

            now = datetime.datetime.now(datetime.timezone.utc)
            self.state.append(
                [
                    {
                        "run_id": run_id,
                        "partition_id": int(b),
                        "doc_id_min": by_bucket[b].doc_id_min if b in by_bucket else None,
                        "doc_id_max": by_bucket[b].doc_id_max if b in by_bucket else None,
                        "input_snapshot": input_snapshot,
                        "docs_done": int(by_bucket[b].docs_done) if b in by_bucket else 0,
                        "glyph_count": int(by_bucket[b].glyph_count) if b in by_bucket else 0,
                        "error_count": int(by_bucket[b].error_count) if b in by_bucket else 0,
                        "wall_ms": wall_ms,
                        "attempt": attempt,
                        "committed_at": now,
                    }
                    for b in group
                ]
            )
            committed += 1
            stats["groups_run"] += 1
            stats["buckets_done"] += len(group)
            if self.fail_after_groups is not None and committed >= self.fail_after_groups:
                raise RuntimeError(
                    f"injected failure after {committed} group(s) (test hook)"
                )
        return stats

    def read_output(self) -> DataFrame:
        return self.spark.read.parquet(self.output_path)
