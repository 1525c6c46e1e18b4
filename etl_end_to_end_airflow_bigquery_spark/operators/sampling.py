"""Deterministic sampling, splitting, and sharding — the training-data
pipeline staples (reproducible train/val/test cuts, stable shard files
for distributed loaders).

Everything here is *hash-based*, never RNG-based: a row's assignment is
a pure function of its key and a salt, so splits are reproducible across
runs, engines, cluster sizes, and data re-partitioning — the property
that matters when the corpus is rebuilt incrementally (a doc keeps its
split forever; no train/test leakage on refresh). Buckets come from the
first 8 hex digits of md5 (identical in every engine — Spark's builtin
``hash()`` is Murmur3 and does NOT match DuckDB/BigQuery), so every
assignment is oracle-verifiable bit-for-bit.

All operators are row-local projections: zero shuffle, codegen'd,
pushdown-transparent.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SPLIT_BUCKETS = 10_000


def hash_bucket(
    key_col: str, salt: str = "v1", buckets: int = SPLIT_BUCKETS
) -> Column:
    """Engine-portable bucket in [0, buckets): md5 of 'salt|key', first
    32 bits, mod buckets. Change the salt to draw an independent
    assignment (e.g. a fresh split version) without touching the data."""
    h = F.expr(
        f"conv(substring(md5(concat('{salt}|', CAST({key_col} AS STRING))), 1, 8),"
        " 16, 10)"
    ).cast("bigint")
    return (h % buckets).alias("bucket")


def hash_split(
    df: DataFrame,
    key: str,
    weights: dict[str, float],
    salt: str = "v1",
    col: str = "split",
) -> DataFrame:
    """Assign each row to a named split by cumulative hash-bucket ranges.

    ``weights`` maps split name → fraction (must sum to ~1; the last
    split absorbs rounding). Fractions resolve to whole buckets of
    1/SPLIT_BUCKETS, so realized proportions are exact to 0.01 %.
    """
    total = sum(weights.values())
    if not 0.999 <= total <= 1.001:
        raise ValueError(f"split weights must sum to 1, got {total}")
    b = hash_bucket(key, salt)
    expr = None
    cum = 0.0
    names = list(weights)
    for name in names[:-1]:
        cum += weights[name]
        cond = b < int(round(cum * SPLIT_BUCKETS))
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    expr = (
        F.lit(names[0]) if expr is None else expr.otherwise(names[-1])
    )
    return df.withColumn(col, expr)


def shard_assign(
    df: DataFrame, key: str, n_shards: int, salt: str = "shard", col: str = "shard"
) -> DataFrame:
    """Stable shard id in [0, n_shards) per key — write one output file
    per shard (``.repartition(col).write.partitionBy(col)``) and a
    distributed trainer addresses shards directly. Uniformity comes from
    md5; stability from the salt."""
    if n_shards < 1:
        raise ValueError("n_shards must be >= 1")
    return df.withColumn(col, hash_bucket(key, salt, buckets=n_shards))
