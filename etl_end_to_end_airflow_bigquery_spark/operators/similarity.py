"""Vector similarity search over an embedding column (extension pack).

Two paths, per the standard ANN playbook:

- **brute-force cosine top-k** (the exactness baseline): queries ×
  corpus, dot products computed engine-side. Cost O(|Q|·N·d) — fine for
  small |Q| at any N because the corpus side streams; the per-query
  top-k is a windowed rank, not a global sort.
- **LSH-bucketed ANN** (the scale path): random-hyperplane signatures
  (sign of ⟨e, h_p⟩ over P fixed planes) bucket the corpus; search only
  the query's bucket. At 100 TB the bucket column is a partition key —
  candidate scans touch one bucket, not the corpus.

Numerics are engineered for cross-engine exactness: float32 embeddings
are cast to double, per-dimension products are summed through exact
DECIMAL accumulation (order-insensitive ⇒ identical in Spark and the
DuckDB oracle), and sqrt/divide run on identical doubles. Hyperplanes
come from a fixed numpy seed and are embedded as literals in both
engines.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

N_PLANES = 8
PLANE_SEED = 7
EMB_DIM = 64
DEC = "decimal(25,12)"  # exact accumulator for |x|<0.6 dim-64 products


def hyperplanes(n_planes: int = N_PLANES, dim: int = EMB_DIM) -> np.ndarray:
    """Fixed random hyperplanes, identical across engines/runs."""
    return np.random.RandomState(PLANE_SEED).randn(n_planes, dim)


def _vectors(df: DataFrame) -> DataFrame:
    """vec_id + embedding cast float→double (all math in double)."""
    return df.select(
        "vec_id",
        "label",
        F.expr("transform(embedding, x -> cast(x as double))").alias("e"),
    )


def _norms(v: DataFrame) -> DataFrame:
    """Squared L2 norm per vector via exact decimal accumulation."""
    return (
        v.select("vec_id", F.explode(F.expr("zip_with(e, e, (x, y) -> x * y)")).alias("p"))
        .groupBy("vec_id")
        .agg(F.sum(F.col("p").cast(DEC)).cast("double").alias("norm2"))
    )


def cosine_topk(
    embeddings: DataFrame,
    query_pred: str = "vec_id < 5",
    k: int = 5,
) -> DataFrame:
    """Brute-force cosine top-k: (q_id, neighbor_id, cosine, rank).

    The query side is tiny and broadcast; the corpus side never
    collects. Dot products explode to (pair, dim) rows and sum through
    decimal — one shuffle keyed by pair, then a per-query window rank.
    """
    v = _vectors(embeddings)
    norms = _norms(v)
    q = v.filter(query_pred).select(
        F.col("vec_id").alias("q_id"), F.col("e").alias("qe")
    )
    dots = (
        F.broadcast(q)
        .crossJoin(v)
        .select(
            "q_id",
            "vec_id",
            F.explode(F.expr("zip_with(qe, e, (x, y) -> x * y)")).alias("p"),
        )
        .groupBy("q_id", "vec_id")
        .agg(F.sum(F.col("p").cast(DEC)).cast("double").alias("dot"))
    )
    scored = (
        dots.filter(F.col("q_id") != F.col("vec_id"))
        .join(norms.withColumnsRenamed({"vec_id": "q_id", "norm2": "qn"}), "q_id")
        .join(norms, "vec_id")
        .withColumn("cosine", F.col("dot") / (F.sqrt("qn") * F.sqrt("norm2")))
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cosine").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
        .select("q_id", F.col("vec_id").alias("neighbor_id"), "cosine", "rank")
    )


def lsh_buckets(spark: SparkSession, embeddings: DataFrame) -> DataFrame:
    """vec_id → LSH bucket id (random-hyperplane sign bits).

    Plane dots go through the same decimal accumulation, so the sign —
    and therefore the bucket — is engine-exact.
    """
    v = _vectors(embeddings)
    planes = spark.createDataFrame(
        [(i, [float(x) for x in row]) for i, row in enumerate(hyperplanes())],
        "plane_idx int, w array<double>",
    )
    plane_dots = (
        v.crossJoin(F.broadcast(planes))
        .select(
            "vec_id",
            "plane_idx",
            F.explode(F.expr("zip_with(e, w, (x, y) -> x * y)")).alias("p"),
        )
        .groupBy("vec_id", "plane_idx")
        .agg(F.sum(F.col("p").cast(DEC)).cast("double").alias("dot"))
    )
    return plane_dots.groupBy("vec_id").agg(
        F.sum(
            F.expr("CASE WHEN dot >= 0 THEN shiftleft(cast(1 as bigint), plane_idx) ELSE 0 END")
        ).alias("bucket")
    )


def ann_lsh_topk(
    spark: SparkSession,
    embeddings: DataFrame,
    query_pred: str = "vec_id < 5",
    k: int = 3,
) -> DataFrame:
    """ANN via LSH buckets: top-k cosine *within the query's bucket*.

    (q_id, neighbor_id, bucket, cosine, rank). Recall trades against the
    number of planes; candidates shrink ~2^-P per bucket so the pairwise
    stage touches a constant fraction of the corpus.
    """
    v = _vectors(embeddings)
    buckets = lsh_buckets(spark, embeddings)
    norms = _norms(v)
    vb = v.join(buckets, "vec_id")
    q = vb.filter(query_pred).select(
        F.col("vec_id").alias("q_id"),
        F.col("e").alias("qe"),
        F.col("bucket"),
    )
    cands = F.broadcast(q).join(vb.select("vec_id", "e", "bucket"), "bucket").filter(
        F.col("q_id") != F.col("vec_id")
    )
    dots = (
        cands.select(
            "q_id",
            "vec_id",
            "bucket",
            F.explode(F.expr("zip_with(qe, e, (x, y) -> x * y)")).alias("p"),
        )
        .groupBy("q_id", "vec_id", "bucket")
        .agg(F.sum(F.col("p").cast(DEC)).cast("double").alias("dot"))
    )
    scored = (
        dots.join(norms.withColumnsRenamed({"vec_id": "q_id", "norm2": "qn"}), "q_id")
        .join(norms, "vec_id")
        .withColumn("cosine", F.col("dot") / (F.sqrt("qn") * F.sqrt("norm2")))
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cosine").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
        .select("q_id", F.col("vec_id").alias("neighbor_id"), "bucket", "cosine", "rank")
    )
