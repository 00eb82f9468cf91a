"""Similarity search over embeddings(vec_id, embedding array<float>, label).

cosine_topk — exact brute-force baseline: query set × corpus via a
broadcast-able crossJoin; the dot product stays JVM-side in higher-order
functions (zip_with + aggregate), no Python in the loop.

lsh_ann_topk — the scale path: random-hyperplane LSH buckets (deterministic
seeded hyperplanes broadcast as numpy, signs computed in a vectorized
pandas UDF), candidates only within matching buckets, exact re-rank on the
candidates. At 100 TB the bucket join replaces the full crossJoin; recall
is tunable via n_planes/n_tables.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType


def _cosine_expr(a: str, b: str):
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    na = F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0), lambda acc, v: acc + v,
        )
    )
    nb = F.sqrt(
        F.aggregate(
            F.transform(b, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0), lambda acc, v: acc + v,
        )
    )
    return dot / (na * nb)


def cosine_topk(embeddings: DataFrame, n_queries: int = 5, k: int = 5) -> DataFrame:
    """Top-k cosine neighbours for the first n_queries vec_ids (exact)."""
    from pyspark.sql import Window

    q = embeddings.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    c = embeddings.select(
        F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("cv")
    )
    scored = (
        q.crossJoin(c)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cosine", F.round(_cosine_expr("qv", "cv"), 6))
        .select("query_id", "neighbor_id", "cosine")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def cosine_topk_sql(n_queries: int = 5, k: int = 5) -> str:
    """DuckDB oracle: identical double-precision formula, same tie-break."""
    return f"""
    WITH q AS (
      SELECT vec_id AS query_id, embedding AS qv FROM embeddings
      WHERE vec_id < {n_queries}
    ),
    scored AS (
      SELECT q.query_id, c.vec_id AS neighbor_id,
             round(
               list_sum(list_transform(list_zip(qv, c.embedding),
                        p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
               / (sqrt(list_sum(list_transform(qv, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
                  * sqrt(list_sum(list_transform(c.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))),
             6) AS cosine
      FROM q, embeddings c
      WHERE c.vec_id != q.query_id
    )
    SELECT query_id, neighbor_id, cosine,
           CAST(row_number() OVER (PARTITION BY query_id
                                   ORDER BY cosine DESC, neighbor_id) AS INT) AS rank
    FROM scored
    QUALIFY rank <= {k}
    """


def embedding_neardup_pairs(embeddings: DataFrame, threshold: float = 0.9) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (vec_a < vec_b, cosine >= t).

    Exact baseline: symmetric self-crossJoin with the dot product in JVM
    higher-order functions (no Python). The threshold compares the
    6-digit-rounded cosine so the Spark plan and the DuckDB oracle make the
    same boundary decision. At 100 TB this becomes the banded-LSH shape of
    lsh_ann_topk (hyperplane buckets -> equi-join -> exact verify on
    candidates only); the exact variant exists to verify that path and as
    the small-corpus tool."""
    a = embeddings.select(F.col("vec_id").alias("vec_a"), F.col("embedding").alias("va"))
    b = embeddings.select(F.col("vec_id").alias("vec_b"), F.col("embedding").alias("vb"))
    return (
        a.crossJoin(b)
        .filter(F.col("vec_a") < F.col("vec_b"))
        .withColumn("cosine", F.round(_cosine_expr("va", "vb"), 6))
        .filter(F.col("cosine") >= threshold)
        .select("vec_a", "vec_b", "cosine")
    )


def embedding_neardup_sql(threshold: float = 0.9) -> str:
    return f"""
    WITH scored AS (
      SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
             round(
               list_sum(list_transform(list_zip(a.embedding, b.embedding),
                        p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
               / (sqrt(list_sum(list_transform(a.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
                  * sqrt(list_sum(list_transform(b.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))),
             6) AS cosine
      FROM embeddings a, embeddings b
      WHERE a.vec_id < b.vec_id
    )
    SELECT vec_a, vec_b, cosine FROM scored WHERE cosine >= {threshold}
    """


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> np.ndarray:
    return np.random.RandomState(seed).standard_normal((n_planes, dim))


def lsh_ann_topk(
    embeddings: DataFrame,
    n_queries: int = 5,
    k: int = 5,
    n_planes: int = 6,
    seed: int = 42,
) -> DataFrame:
    """ANN via random-hyperplane LSH buckets + exact re-rank in-bucket."""
    from pyspark.sql import Window

    spark = embeddings.sparkSession
    dim = len(embeddings.select("embedding").first()[0])
    planes_b = spark.sparkContext.broadcast(_hyperplanes(dim, n_planes, seed))

    @F.pandas_udf(LongType())
    def bucket_of(emb: pd.Series) -> pd.Series:
        planes = planes_b.value
        mat = np.stack(emb.to_numpy())  # (batch, dim) — one matmul per batch
        signs = (mat @ planes.T) > 0
        powers = 1 << np.arange(planes.shape[0], dtype=np.int64)
        return pd.Series((signs @ powers).astype(np.int64))

    bucketed = embeddings.withColumn("bucket", bucket_of("embedding"))
    q = bucketed.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv"), "bucket"
    )
    c = bucketed.select(
        F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("cv"), "bucket"
    )
    scored = (
        q.join(c, "bucket")  # equi-join on bucket replaces the crossJoin
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cosine", F.round(_cosine_expr("qv", "cv"), 6))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )
