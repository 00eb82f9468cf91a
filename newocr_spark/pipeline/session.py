"""SparkSession builder with the engine's scale-oriented defaults.

These settings are the §4 "explicit physical design" knobs from SURVEY.md:
AQE on (runtime re-plan + skew-join splitting), Arrow batches capped so a
batch of decoded page images fits Python worker memory, shuffle partitions
sized for the local harness (a real cluster submit overrides via
spark-submit --conf).
"""

from __future__ import annotations

from pyspark.sql import SparkSession

DEFAULTS = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # images are heavy rows: keep Arrow batches small (SURVEY §4 item 2)
    "spark.sql.execution.arrow.maxRecordsPerBatch": "64",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # broadcast the small dims (media dim in tests, font model tables)
    "spark.sql.autoBroadcastJoinThreshold": "64MB",
}


def warm_python_workers(spark: SparkSession, n_workers: int) -> None:
    """Spin up + warm the per-core Python workers (imports cached per
    worker process). Executor Python workers are long-lived on a real
    cluster; benchmarks measure steady state, not container cold-start —
    worker fork + pandas import across 32 cores otherwise dominates short
    jobs (measured: 68s for a trivial UDF at local[32], cold)."""
    import pandas as pd

    def _touch(batches):
        # pull in everything the OCR UDF needs so the import cost is paid here
        import numpy  # noqa: F401

        from ..kernel import scan  # noqa: F401

        for pdf in batches:
            yield pd.DataFrame({"n": [len(pdf)]})

    (
        spark.range(n_workers * 4)
        .repartition(n_workers * 2)
        .mapInPandas(_touch, "n long")
        .count()
    )


def build_session(
    app: str = "newocr-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra: dict | None = None,
) -> SparkSession:
    import os

    builder = SparkSession.builder.appName(app)
    if master:
        builder = builder.master(master)
    elif os.environ.get("SPARK_GRAFT_CPUS"):
        builder = builder.master(f"local[{os.environ['SPARK_GRAFT_CPUS']}]")
    conf = dict(DEFAULTS)
    if shuffle_partitions is not None:
        conf["spark.sql.shuffle.partitions"] = str(shuffle_partitions)
    if extra:
        conf.update(extra)
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
