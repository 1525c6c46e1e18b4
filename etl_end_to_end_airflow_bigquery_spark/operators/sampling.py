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

from pyspark.sql import Column, DataFrame, Window
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


def hash_sample(
    df: DataFrame, key: str, fraction: float, salt: str = "sample"
) -> DataFrame:
    """Deterministic Bernoulli sample: keep a row iff its hash bucket
    falls below ``fraction``. Unlike ``df.sample()`` (seeded RNG over
    partition order), the decision is a pure function of the key — the
    same doc is in or out regardless of partitioning, cluster size, or
    engine, and a re-run over a refreshed corpus keeps prior decisions.
    Row-local filter; pushes down past it like any other predicate."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0,1], got {fraction}")
    cutoff = int(round(fraction * SPLIT_BUCKETS))
    return df.filter(hash_bucket(key, salt) < cutoff)


def cap_per_group(
    df: DataFrame,
    group: str,
    key: str,
    max_rows: int,
    salt: str = "cap",
) -> DataFrame:
    """Deterministic per-group downsampling: keep at most ``max_rows``
    rows per group, chosen by hash order (bucket, then key as a total
    tiebreak) — the "cap each source/language at N docs" curation staple.
    Selection is stable across runs and engines.

    One shuffle on ``group`` (the rank window). At 100 TB with a hot
    group, pre-filter with ``hash_sample`` to an over-sample (e.g.
    3·max_rows/|group| fraction) before ranking so the window input is
    bounded; the final rank keeps the result exact."""
    w = Window.partitionBy(group).orderBy(
        hash_bucket(key, salt).asc(), F.col(key).asc()
    )
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= max_rows)
        .drop("_rk")
    )


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


def stratified_hash_sample(
    df: DataFrame,
    stratum: str,
    key: str,
    fractions: dict[str, float],
    default: float = 1.0,
    salt: str = "strat",
) -> DataFrame:
    """Per-stratum deterministic sampling: each stratum keeps its own
    hash-gated fraction of rows (corpus rebalancing: downsample the
    dominant language/source, keep the rare ones whole). Decisions are
    key-pure — stable across runs, engines, partitionings, and corpus
    refreshes. Row-local filter; no shuffle, pushdown-transparent.

    ``fractions`` maps stratum value → keep fraction; unmapped strata
    keep ``default``.
    """
    for s, f in fractions.items():
        if not 0.0 <= f <= 1.0:
            raise ValueError(f"fraction for {s!r} must be in [0,1], got {f}")
    if not 0.0 <= default <= 1.0:
        raise ValueError(f"default must be in [0,1], got {default}")
    cutoff = F.lit(int(round(default * SPLIT_BUCKETS)))
    for s, f in sorted(fractions.items()):
        cutoff = (
            F.when(F.col(stratum) == s, int(round(f * SPLIT_BUCKETS)))
            .otherwise(cutoff)
        )
    return df.filter(hash_bucket(key, salt) < cutoff)


def weighted_hash_sample(
    df: DataFrame, key: str, weight: Column, salt: str = "wsample"
) -> DataFrame:
    """Per-row weighted Bernoulli: keep a row with probability equal to
    its own ``weight`` column (clamped to [0,1]) — quality-weighted
    corpus downsampling (a doc scoring 0.9 survives 9× as often as one
    scoring 0.1), still fully deterministic: the coin flip is the row's
    hash bucket, so membership is stable across runs/engines/refreshes.
    Row-local filter, no shuffle."""
    cutoff = F.least(F.greatest(weight, F.lit(0.0)), F.lit(1.0)) * SPLIT_BUCKETS
    return df.filter(hash_bucket(key, salt) < cutoff)
