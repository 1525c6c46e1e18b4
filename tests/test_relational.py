"""decimal_sum overflow semantics: exact, and never silently wrong.

The int64 fixed-point accumulator is the fast path; ANSI mode (pinned in
session.get_spark) must turn an overflow into a loud ARITHMETIC_OVERFLOW
instead of a silent wrap, and wide=True must keep the sum exact past the
int64 bound via DECIMAL(38,0) accumulation.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_end_to_end_airflow_bigquery_spark.operators.relational import (
    decimal_sum,
)


def test_ansi_mode_is_pinned(spark):
    assert spark.conf.get("spark.sql.ansi.enabled") == "true"


def test_decimal_sum_overflow_raises_not_wraps(spark):
    # each scaled element ≈ 9e17·1e6 ≫ int64 on the very first add
    df = spark.createDataFrame([(9.0e17,), (9.0e17,)], "x double")
    with pytest.raises(Exception, match="ARITHMETIC_OVERFLOW|overflow"):
        df.agg(decimal_sum(F.col("x")).alias("s")).collect()


def test_decimal_sum_wide_survives_past_int64(spark):
    # 4 × 4.0e12 scaled by 1e6 → 1.6e19 > 2^63-1 ≈ 9.22e18; the wide
    # DECIMAL(38,0) accumulator stays exact where int64 would overflow
    df = spark.createDataFrame([(4.0e12,)] * 4, "x double")
    (got,) = df.agg(decimal_sum(F.col("x"), wide=True).alias("s")).collect()
    assert got.s == 1.6e13
    with pytest.raises(Exception, match="ARITHMETIC_OVERFLOW|overflow"):
        df.agg(decimal_sum(F.col("x")).alias("s")).collect()


def test_decimal_sum_wide_matches_narrow_in_range(spark):
    vals = [(1.234567,), (-2.5,), (3.000001,), (0.0000004,)]
    df = spark.createDataFrame(vals, "x double")
    (narrow,) = df.agg(decimal_sum(F.col("x")).alias("s")).collect()
    (wide,) = df.agg(decimal_sum(F.col("x"), wide=True).alias("s")).collect()
    assert narrow.s == wide.s


class TestTableDiff:
    def test_insert_delete_update_and_null_safety(self, spark):
        from etl_end_to_end_airflow_bigquery_spark.operators.relational import (
            table_diff,
        )

        old = spark.createDataFrame(
            [(1, "a"), (2, None), (3, "c"), (4, "d")], "k int, v string"
        )
        new = spark.createDataFrame(
            [(1, "a"), (2, None), (3, "C"), (5, "e")], "k int, v string"
        )
        d = {r.k: r.change_type for r in table_diff(old, new, ["k"]).collect()}
        # 1 unchanged (absent); 2 has null==null (eqNullSafe: unchanged)
        assert d == {3: "update", 4: "delete", 5: "insert"}

    def test_null_transition_is_update(self, spark):
        from etl_end_to_end_airflow_bigquery_spark.operators.relational import (
            table_diff,
        )

        old = spark.createDataFrame([(1, "x")], "k int, v string")
        new = spark.createDataFrame([(1, None)], "k int, v string")
        rows = table_diff(old, new, ["k"]).collect()
        assert [r.change_type for r in rows] == ["update"]


def test_global_cumsum_matches_single_partition_window(spark):
    """Distributed prefix sum == the (non-scalable) global window, on a
    unique key with mixed-sign values, and the result is NOT computed in
    one partition."""
    from pyspark.sql import Window

    from etl_end_to_end_airflow_bigquery_spark.operators.relational import (
        global_cumsum,
    )

    df = spark.range(0, 20000).select(
        (F.col("id") * 37 % 20000).alias("k"),
        ((F.col("id") % 7) - 3).cast("bigint").alias("v"),
    )
    got = global_cumsum(df, ["k"], "v", out="run")
    w = Window.orderBy("k").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    want = df.withColumn("run", F.sum("v").over(w))
    mism = (
        got.alias("g")
        .join(want.alias("w"), "k")
        .filter("g.run <> w.run")
        .count()
    )
    assert mism == 0
    # the window must be keyed (per-partition prefix sums), never the
    # single-task global Window.orderBy form; AQE may coalesce the tiny
    # OUTPUT to 1 partition, so assert on the plan, not partition count
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "rangepartitioning" in plan.lower()
    window_lines = [
        ln for ln in plan.splitlines() if "Window " in ln and "sum(" in ln
    ]
    assert window_lines and all("__pid" in ln for ln in window_lines), plan


def test_global_cumsum_partitioning_invariant(spark):
    """The running sums must be identical under different partition
    counts (the whole point of the exact two-phase design), including
    values large enough that a careless int accumulator would overflow
    32 bits."""
    from etl_end_to_end_airflow_bigquery_spark.operators.relational import (
        global_cumsum,
    )

    df = spark.range(0, 5000).select(
        (F.col("id") * 131 % 5000).alias("k"),
        (F.col("id") % 97 * (1 << 40)).cast("bigint").alias("v"),
    )
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    results = []
    try:
        for n in ("3", "32"):
            spark.conf.set("spark.sql.shuffle.partitions", n)
            got = sorted(
                (r.k, r.run)
                for r in global_cumsum(df, ["k"], "v", out="run").collect()
            )
            results.append(got)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert results[0] == results[1]
    assert results[0][-1][1] == sum(
        i % 97 * (1 << 40) for i in range(5000)
    )


def test_global_cumsum_cache_registry_enables_cleanup(spark):
    """ADVICE r05: the persisted range-partitioned frame can't be
    unpersisted inside the operator (the returned plan reads it), so a
    long-lived caller collects it via cache_registry and unpersists
    after consuming the result."""
    from etl_end_to_end_airflow_bigquery_spark.operators.relational import (
        global_cumsum,
    )

    df = spark.range(0, 100).select(
        F.col("id").alias("k"), F.lit(1).cast("bigint").alias("v")
    )
    reg: list = []
    out = global_cumsum(df, ["k"], "v", out="run", cache_registry=reg)
    assert out.count() == 100
    assert len(reg) == 1 and reg[0].storageLevel.useMemory
    for f in reg:
        f.unpersist()
    assert not reg[0].storageLevel.useMemory
