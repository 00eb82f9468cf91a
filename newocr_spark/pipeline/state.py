"""Resumable checkpointing with per-partition lineage + metrics.

Implements FIXTURES.md §6 / SURVEY §4 item 4: the extraction job over a
10^12-document table must survive restarts without duplicating or losing
documents. The checkpointed unit is the EXPENSIVE stage — per-image OCR —
keyed on the media table itself:

  * media rows get a deterministic bucket
    ``pmod(xxhash64(media_ref), n_buckets)`` — stable across runs and
    snapshots. Bucketing on the media key (not doc_id) means a bucket
    group touches only ITS OWN slice of the image bytes; with the media
    table stored partitioned/bucketed the same way, each group is a
    partition-pruned scan instead of a full pass (a doc-keyed bucket
    can reference media anywhere, forcing every group to rescan all
    media — measured 4.4x overhead before this design);
  * buckets are processed in groups; each group's OCR output lands in an
    intermediate sink partitioned by bucket with dynamic partition
    overwrite (idempotent — re-running a group replaces exactly its own
    partitions); per-bucket metrics are aggregated from the WRITTEN rows
    (never by re-executing the OCR plan);
  * after a group commits, one state row per bucket is appended with
    lineage (input snapshot, doc-id range) and metrics (docs, glyphs,
    errors, wall ms, attempt);
  * resume = read the state table, skip buckets already committed for the
    same input snapshot; everything else is recomputed;
  * once all buckets are committed, the CHEAP assembly stage (text spans
    pass-through + missing-media error rows + per-doc seq numbering) runs
    once over the intermediate — idempotent full overwrite.

All writes and the state log go through the SpanSink / StateStore seam
(pipeline/sinks.py): the shipped implementation is Parquet (this sandbox
has no Iceberg runtime on the classpath), and the Iceberg classes there
are drop-ins — ``overwritePartitions()`` for the per-bucket sinks,
``createOrReplace()`` for the assembly, MERGE keyed on
(input_snapshot, partition_id) for the state commits. The unit of
idempotency is identical; sinks.py documents the mapping guarantee by
guarantee.
"""

from __future__ import annotations

import time
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..model import FontModel
from .sinks import STATE_SCHEMA, ParquetSpanSink, ParquetStateStore, SpanSink, StateStore


class StateTable(ParquetStateStore):
    """Back-compat name for the parquet StateStore implementation."""


@dataclass
class ExtractRunner:
    """Bucketed, resumable driver for the extraction job."""

    spark: SparkSession
    model: FontModel
    output_path: str
    state: StateStore
    n_buckets: int = 16
    group_size: int = 4
    ocr_partitions: int | None = None
    # the runner always broadcasts the span metadata onto the bucket's
    # media slice (image bytes never shuffle); "shuffle" additionally
    # salt-repartitions the joined rows before OCR — useful when a
    # bucket's natural file splits are size-skewed
    media_join: str = "broadcast_meta"
    # test hook: raise after committing this many groups (simulated crash)
    fail_after_groups: int | None = None
    # sink seam: default parquet sinks derive from output_path; pass
    # IcebergSpanSink instances (sinks.py) on a catalog deployment — the
    # runner never touches paths or write modes itself
    ocr_sink: SpanSink | None = None
    out_sink: SpanSink | None = None

    def __post_init__(self) -> None:
        if self.ocr_sink is None:
            self.ocr_sink = ParquetSpanSink(self.spark, self.output_path + "_ocr")
        if self.out_sink is None:
            self.out_sink = ParquetSpanSink(self.spark, self.output_path)

    def _bucket_of(self, col: str):
        return F.pmod(F.xxhash64(col), F.lit(self.n_buckets)).cast("int")

    def snapshot_key(self, input_snapshot: str) -> str:
        """Effective checkpoint key: folds n_buckets into the snapshot id.
        Dynamic partition overwrite only replaces bucket partitions PRESENT
        in the current run's output, so a rerun against a changed input (or
        different bucketing) could otherwise leave stale rows from a prior
        snapshot in untouched partitions. Every intermediate row is tagged
        with this key and both the metrics read and the assembly filter on
        it — stale rows can never leak into the output."""
        return f"{input_snapshot}#b{self.n_buckets}"

    def _read_intermediate(self) -> DataFrame:
        from .extract import OCR_OUTPUT_SCHEMA

        return self.ocr_sink.read(OCR_OUTPUT_SCHEMA + ", snapshot string, bucket int")

    def run(self, documents: DataFrame, media: DataFrame, input_snapshot: str, run_id: str) -> dict:
        from pyspark.sql import Window

        from .extract import OCR_OUTPUT_SCHEMA, make_ocr_udf

        spark = self.spark
        if self.ocr_partitions and self.media_join != "shuffle":
            import warnings

            warnings.warn(
                "ocr_partitions only applies with media_join='shuffle'; the "
                "default broadcast_meta path runs OCR on the media table's "
                "natural parquet splits",
                stacklevel=2,
            )
        snap = self.snapshot_key(input_snapshot)
        done = self.state.completed_buckets(snap)
        attempt = self.state.attempts(snap) + 1
        todo = [b for b in range(self.n_buckets) if b not in done]
        groups = [
            todo[i : i + self.group_size]
            for i in range(0, len(todo), self.group_size)
        ]

        spans = documents.select(
            "doc_id", F.explode("spans").alias("span")
        ).select("doc_id", "span.kind", "span.text", "span.media_ref", "span.offset")
        meta = spans.filter(F.col("kind") == "media").select(
            "doc_id", "offset", "media_ref"
        )
        media_b = media.select("media_ref", "png").withColumn(
            "bucket", self._bucket_of("media_ref")
        )
        bmodel = spark.sparkContext.broadcast(self.model)

        committed = 0
        stats = {"groups_run": 0, "buckets_done": len(done)}
        for group in groups:
            t0 = time.time()
            # media-keyed bucket filter: only this group's image bytes are
            # read (a partition-pruned scan when media is stored bucketed)
            part = media_b.filter(F.col("bucket").isin(group))
            with_png = part.join(F.broadcast(meta), "media_ref", "inner").select(
                "doc_id", "offset", "media_ref", "png"
            )
            if self.ocr_partitions and self.media_join == "shuffle":
                with_png = with_png.repartition(
                    self.ocr_partitions, F.xxhash64("media_ref")
                )
            ocr = (
                with_png.mapInPandas(make_ocr_udf(bmodel), OCR_OUTPUT_SCHEMA)
                .withColumn("bucket", self._bucket_of("media_ref"))
                .withColumn("snapshot", F.lit(snap))
            )
            # idempotent per-bucket intermediate: replaces exactly this
            # group's bucket partitions (dynamic overwrite / Iceberg
            # overwritePartitions, per the sink)
            self.ocr_sink.overwrite_partitions(ocr, "bucket")
            wall_ms = int((time.time() - t0) * 1000)
            # metrics from the WRITTEN rows — never re-execute the OCR plan;
            # explicit schema so an all-empty group (no data files yet)
            # reads as an empty frame instead of a schema-inference error
            metrics = (
                self._read_intermediate()
                .filter((F.col("snapshot") == snap) & F.col("bucket").isin(group))
                .groupBy("bucket")
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
                        "input_snapshot": snap,
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

        # ---- assembly stage (cheap, idempotent): runs once all buckets are
        # committed — text spans pass through, missing media become error
        # rows (metadata-only anti-join), per-doc seq numbering
        if stats["buckets_done"] >= self.n_buckets:
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
            ocr_all = (
                self._read_intermediate()
                .filter(F.col("snapshot") == snap)  # never prior-snapshot rows
                .drop("bucket", "snapshot")
            )
            missing = (
                meta.join(media.select("media_ref"), "media_ref", "left_anti")
                .select(
                    "doc_id", "offset", F.lit("text").alias("kind"),
                    F.lit(None).cast("string").alias("text"), "media_ref",
                    F.lit(0).cast("long").alias("glyph_count"),
                    F.lit(0).cast("int").alias("line_count"),
                    F.lit(None).cast("double").alias("font_size_pt"),
                    F.lit("ValueError: missing media bytes").alias("error"),
                )
            )
            result = text_spans.unionByName(ocr_all).unionByName(missing)
            seq = Window.partitionBy("doc_id").orderBy("offset")
            final = result.withColumn(
                "seq", (F.row_number().over(seq) - 1).cast("int")
            ).withColumn("bucket", self._bucket_of("doc_id"))
            # FULL overwrite: the assembly is the one stage allowed to
            # rewrite everything — a dynamic/partition overwrite of a
            # shrunken snapshot would leave prior-run output partitions in
            # buckets this run doesn't touch
            self.out_sink.overwrite_all(final, "bucket")
        return stats

    def read_output(self) -> DataFrame:
        return self.out_sink.read()
