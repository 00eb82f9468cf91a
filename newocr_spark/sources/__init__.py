"""Document-table sources: one reader surface over multiple formats.

The engine's canonical storage is parquet (Iceberg on a full deployment),
but crawl-scale interchange also arrives as JSONL and CSV; this module
normalizes any of them to the canonical shape from BASELINE.json
``input_hint``:

    documents(doc_id: string,
              spans: array<struct<kind:string, text:string,
                                  media_ref:string, offset:int>>)

All readers are schema-explicit (never schema inference on a 10^12-row
table: one pass saved, and drift becomes a loud cast error instead of a
silent type change). CSV carries the nested spans as a JSON-encoded
string column, parsed JVM-side with from_json — no Python in the path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType, IntegerType, StringType, StructField, StructType,
)

SPAN_TYPE = StructType(
    [
        StructField("kind", StringType()),
        StructField("text", StringType()),
        StructField("media_ref", StringType()),
        StructField("offset", IntegerType()),
    ]
)
DOCUMENTS_SCHEMA = StructType(
    [
        StructField("doc_id", StringType()),
        StructField("spans", ArrayType(SPAN_TYPE)),
    ]
)


def read_documents(spark: SparkSession, path: str, fmt: str = "parquet") -> DataFrame:
    """Read a documents table in `fmt` ∈ {parquet, json, csv} → canonical
    (doc_id, spans) shape."""
    if fmt == "parquet":
        df = spark.read.parquet(path)
        return df.select("doc_id", F.col("spans").cast(ArrayType(SPAN_TYPE)))
    if fmt == "json":
        return spark.read.schema(DOCUMENTS_SCHEMA).json(path).select("doc_id", "spans")
    if fmt == "csv":
        raw = spark.read.schema("doc_id string, spans_json string").option(
            "header", "true"
        ).csv(path)
        return raw.select(
            "doc_id", F.from_json("spans_json", ArrayType(SPAN_TYPE)).alias("spans")
        )
    raise ValueError(f"unsupported documents format: {fmt}")


def write_documents(df: DataFrame, path: str, fmt: str = "parquet") -> None:
    """Write (doc_id, spans) as `fmt`; CSV gets spans JSON-encoded."""
    if fmt == "parquet":
        df.write.mode("overwrite").parquet(path)
    elif fmt == "json":
        df.write.mode("overwrite").json(path)
    elif fmt == "csv":
        df.select(
            "doc_id", F.to_json("spans").alias("spans_json")
        ).write.mode("overwrite").option("header", "true").csv(path)
    else:
        raise ValueError(f"unsupported documents format: {fmt}")
