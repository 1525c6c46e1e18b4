"""Hash-based splits/shards: stability and proportion guarantees."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_end_to_end_airflow_bigquery_spark.operators.sampling import (
    hash_split,
    shard_assign,
)


@pytest.fixture(scope="module")
def keys(spark):
    return spark.range(0, 5000).withColumnRenamed("id", "doc_id")


def test_split_is_stable_and_proportional(keys):
    w = {"train": 0.8, "val": 0.1, "test": 0.1}
    a = {r.doc_id: r.split for r in hash_split(keys, "doc_id", w).collect()}
    b = {r.doc_id: r.split for r in hash_split(keys, "doc_id", w).collect()}
    assert a == b  # pure function of (key, salt): rerun-identical
    n = len(a)
    frac = {s: sum(1 for v in a.values() if v == s) / n for s in w}
    for s, target in w.items():
        assert abs(frac[s] - target) < 0.03, (s, frac[s])


def test_split_changes_with_salt_not_with_partitioning(keys):
    w = {"train": 0.5, "test": 0.5}
    a = {r.doc_id: r.split for r in hash_split(keys, "doc_id", w).collect()}
    rep = {r.doc_id: r.split
           for r in hash_split(keys.repartition(13), "doc_id", w).collect()}
    assert a == rep  # partitioning-independent
    salted = {r.doc_id: r.split
              for r in hash_split(keys, "doc_id", w, salt="v2").collect()}
    assert a != salted  # a new salt draws an independent assignment


def test_split_weight_validation(keys):
    with pytest.raises(ValueError):
        hash_split(keys, "doc_id", {"train": 0.5, "test": 0.2})


def test_shards_cover_range_roughly_uniformly(keys):
    counts = {
        r.shard: r.n
        for r in shard_assign(keys, "doc_id", 8)
        .groupBy("shard")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert set(counts) == set(range(8))
    assert max(counts.values()) < 2 * min(counts.values())
    with pytest.raises(ValueError):
        shard_assign(keys, "doc_id", 0)


def test_hash_sample_fraction_and_stability(keys):
    from etl_end_to_end_airflow_bigquery_spark.operators.sampling import hash_sample

    a = {r.doc_id for r in hash_sample(keys, "doc_id", 0.2).collect()}
    b = {r.doc_id for r in hash_sample(keys.repartition(7), "doc_id", 0.2).collect()}
    assert a == b  # membership is key-pure, not partition-dependent
    assert abs(len(a) / 5000 - 0.2) < 0.03
    # widening the fraction keeps prior members (nested cutoffs, same salt)
    wide = {r.doc_id for r in hash_sample(keys, "doc_id", 0.5).collect()}
    assert a <= wide
    with pytest.raises(ValueError):
        hash_sample(keys, "doc_id", 1.5)


def test_cap_per_group_bounds_and_determinism(spark):
    from etl_end_to_end_airflow_bigquery_spark.operators.sampling import cap_per_group

    df = spark.range(0, 900).select(
        (F.col("id") % 3).cast("string").alias("grp"), F.col("id").alias("k")
    )
    capped = cap_per_group(df, "grp", "k", 50)
    rows = capped.collect()
    per = {}
    for r in rows:
        per.setdefault(r.grp, set()).add(r.k)
    assert all(len(v) == 50 for v in per.values())
    again = cap_per_group(df.repartition(11), "grp", "k", 50).collect()
    assert {(r.grp, r.k) for r in again} == {(r.grp, r.k) for r in rows}
    # groups under the cap pass through untouched
    small = cap_per_group(df.filter("k < 30"), "grp", "k", 50)
    assert small.count() == 30


def test_stratified_sample_per_group_fractions(spark):
    from etl_end_to_end_airflow_bigquery_spark.operators.sampling import (
        stratified_hash_sample,
    )

    df = spark.range(0, 9000).select(
        F.col("id").alias("k"),
        (F.col("id") % 3).cast("string").alias("grp"),
    )
    out = stratified_hash_sample(df, "grp", "k", {"0": 0.1, "1": 0.5})
    per = {
        r.grp: r.n
        for r in out.groupBy("grp").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert abs(per["0"] / 3000 - 0.1) < 0.03
    assert abs(per["1"] / 3000 - 0.5) < 0.03
    assert per["2"] == 3000  # default 1.0: untouched
    # stable across partitioning
    again = stratified_hash_sample(
        df.repartition(13), "grp", "k", {"0": 0.1, "1": 0.5}
    )
    assert {(r.grp, r.k) for r in again.collect()} == {
        (r.grp, r.k) for r in out.collect()}
    with pytest.raises(ValueError):
        stratified_hash_sample(df, "grp", "k", {"0": 2.0})


def test_weighted_sample_tracks_weights(spark):
    from etl_end_to_end_airflow_bigquery_spark.operators.sampling import (
        weighted_hash_sample,
    )

    df = spark.range(0, 6000).select(
        F.col("id").alias("k"),
        F.when(F.col("id") % 3 == 0, 0.1)
        .when(F.col("id") % 3 == 1, 0.6)
        .otherwise(1.5)  # clamps to 1.0
        .alias("w"),
    )
    out = weighted_hash_sample(df, "k", F.col("w"))
    per = {
        int(r.grp): r.n
        for r in out.withColumn("grp", F.col("k") % 3)
        .groupBy("grp").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert abs(per[0] / 2000 - 0.1) < 0.03
    assert abs(per[1] / 2000 - 0.6) < 0.04
    assert per[2] == 2000  # weight >= 1 keeps everything
    # determinism across partitionings
    again = weighted_hash_sample(df.repartition(9), "k", F.col("w"))
    assert {r.k for r in again.collect()} == {r.k for r in out.collect()}
