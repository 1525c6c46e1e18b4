"""Unit + property tests for temporal.asof_join and skew.salted_count_sum.

The asof operator is validated two ways: hand-built tiny frames with
known answers (boundary semantics: <=, ties, unmatched rows), and a
property check against the naive quadratic spelling on a slice of real
events — the union-scan plan must return exactly what the obvious
range-join + row_number would.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Window
from pyspark.sql import functions as F

from etl_end_to_end_airflow_bigquery_spark.operators.skew import salted_count_sum
from etl_end_to_end_airflow_bigquery_spark.operators.temporal import asof_join
from etl_end_to_end_airflow_bigquery_spark.sources.events import load_events

SF = "/root/testdata/sf0.001"


def _t(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


def test_asof_picks_latest_at_or_before(spark):
    left = spark.createDataFrame(
        [(1, _t("2024-01-01 10:00:00"), "a"),
         (1, _t("2024-01-01 12:00:00"), "b"),
         (2, _t("2024-01-01 09:00:00"), "c")],
        "k long, ts timestamp, tag string",
    )
    right = spark.createDataFrame(
        [(1, _t("2024-01-01 09:30:00"), 100),
         (1, _t("2024-01-01 11:00:00"), 200),
         (2, _t("2024-01-01 09:00:00"), 300),   # equal ts: <= must match
         (3, _t("2024-01-01 00:00:00"), 400)],
        "k long, ts timestamp, v int",
    )
    out = {
        (r.k, r.tag): r.v
        for r in asof_join(left, right, on="k", right_cols=["v"]).collect()
    }
    assert out == {(1, "a"): 100, (1, "b"): 200, (2, "c"): 300}


def test_asof_unmatched_left_rows_keep_nulls(spark):
    left = spark.createDataFrame(
        [(1, _t("2024-01-01 08:00:00"), "early")],
        "k long, ts timestamp, tag string",
    )
    right = spark.createDataFrame(
        [(1, _t("2024-01-01 09:00:00"), 1)], "k long, ts timestamp, v int"
    )
    rows = asof_join(left, right, on="k", right_cols=["v"]).collect()
    assert len(rows) == 1 and rows[0].v is None and rows[0].tag == "early"


def test_asof_matches_naive_range_join_on_real_events(spark):
    ev = load_events(spark, SF)
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id", "ts", F.col("event_id").alias("view_id")
    )
    fast = asof_join(
        purchases,
        views.select("user_id", "ts", F.col("ts").alias("view_ts"), "view_id"),
        on="user_id",
        right_cols=["view_ts", "view_id"],
    ).select("event_id", "view_id")

    v = views.select(
        F.col("user_id").alias("v_user"),
        F.col("ts").alias("v_ts"),
        "view_id",
    )
    naive = (
        purchases.join(
            v, (purchases.user_id == v.v_user) & (v.v_ts <= purchases.ts), "left"
        )
        .withColumn(
            "__rn",
            F.row_number().over(
                Window.partitionBy("event_id").orderBy(
                    F.desc_nulls_last("v_ts"), F.desc_nulls_last("view_id")
                )
            ),
        )
        .filter(F.col("__rn") == 1)
        .select("event_id", "view_id")
    )
    assert fast.exceptAll(naive).isEmpty() and naive.exceptAll(fast).isEmpty()


def test_salted_count_sum_equals_plain_aggregate(spark):
    ev = load_events(spark, SF)
    salted = salted_count_sum(
        ev, keys=["event_type"], value_col="value", salt_src="event_id"
    )
    p = 1_000_000.0
    plain = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_rows"),
        (
            F.sum(F.floor(F.col("value") * F.lit(p) + F.lit(0.5))).cast("double")
            / F.lit(p)
        ).alias("sum_value"),
    )
    assert sorted(map(tuple, salted.collect())) == sorted(
        map(tuple, plain.collect())
    )


class TestResampleFfill:
    def test_gaps_filled_per_key(self, spark):
        from etl_end_to_end_airflow_bigquery_spark.operators.temporal import (
            resample_ffill,
        )

        df = spark.createDataFrame(
            [
                ("a", "2024-01-01", 1.0, 10),
                ("a", "2024-01-04", 4.0, 40),
                ("b", "2024-01-02", 2.0, 20),
                ("b", "2024-01-03", 3.0, 30),
            ],
            "k string, d string, v double, n int",
        ).selectExpr("k", "CAST(d AS DATE) AS d", "v", "n")
        out = resample_ffill(df, "k", "d", ["v"])
        rows = {(r.k, str(r.d)): (r.v, r.n) for r in out.collect()}
        # key a: Jan 2 and 3 are synthesized, carry v=1.0, n stays null
        assert rows[("a", "2024-01-02")] == (1.0, None)
        assert rows[("a", "2024-01-03")] == (1.0, None)
        assert rows[("a", "2024-01-04")] == (4.0, 40)
        # key b has its own bounds — no rows outside [Jan 2, Jan 3]
        assert [k for k in rows if k[0] == "b"] == [
            ("b", "2024-01-02"), ("b", "2024-01-03")]
        assert len(rows) == 6

    def test_custom_step(self, spark):
        from etl_end_to_end_airflow_bigquery_spark.operators.temporal import (
            resample_ffill,
        )

        df = spark.createDataFrame(
            [("a", "2024-01-01 00:00:00", 1.0), ("a", "2024-01-01 06:00:00", 7.0)],
            "k string, t string, v double",
        ).selectExpr("k", "CAST(t AS TIMESTAMP_NTZ) AS t", "v")
        out = resample_ffill(df, "k", "t", ["v"], step="2 hours")
        vals = [r.v for r in out.orderBy("t").collect()]
        assert vals == [1.0, 1.0, 1.0, 7.0]


# --- range_join (bin-bucketed interval join, no equi-key) ----------------


def test_range_join_bounds_and_edges(spark):
    from etl_end_to_end_airflow_bigquery_spark.operators.temporal import (
        range_join,
    )

    iv = spark.createDataFrame(
        [("a", _t("2024-01-01 00:00:00"), _t("2024-01-01 00:02:00")),
         ("b", _t("2024-01-01 00:05:00"), _t("2024-01-01 00:05:30")),
         # pre-epoch: negative unix_micros exercises the floor-div fix
         ("pre", _t("1969-12-31 23:58:00"), _t("1969-12-31 23:59:30")),
         # empty interval must match nothing (and not crash sequence())
         ("empty", _t("2024-01-02 00:00:00"), _t("2024-01-01 00:00:00"))],
        "iv_id string, lo timestamp, hi timestamp",
    )
    pt = spark.createDataFrame(
        [("p1", _t("2024-01-01 00:01:00")),
         ("p2", _t("2024-01-01 00:02:00")),   # == hi: closed bound matches
         ("p3", _t("2024-01-01 00:04:59")),   # just outside b
         ("p4", _t("2024-01-01 00:05:10")),
         ("p5", _t("1969-12-31 23:58:30"))],
        "pt_id string, p timestamp",
    )
    got = sorted(
        (r.iv_id, r.pt_id)
        for r in range_join(iv, pt, "lo", "hi", "p", bin_width_s=120)
        .collect()
    )
    assert got == [("a", "p1"), ("a", "p2"), ("b", "p4"), ("pre", "p5")]


def test_range_join_matches_naive_on_events(spark):
    """Property: bin-bucketed plan == naive cross-filter on real data,
    for a bin width both larger and smaller than the interval length
    (multi-bin replication path)."""
    from etl_end_to_end_airflow_bigquery_spark.operators.temporal import (
        range_join,
    )

    ev = load_events(spark, SF).limit(300).cache()
    iv = ev.select(
        F.col("event_id").alias("a_id"),
        (F.col("ts").cast("timestamp") - F.expr("INTERVAL 90 SECONDS"))
        .alias("lo"),
        (F.col("ts").cast("timestamp") + F.expr("INTERVAL 90 SECONDS"))
        .alias("hi"),
    )
    pt = ev.select(
        F.col("event_id").alias("b_id"),
        F.col("ts").cast("timestamp").alias("b_ts"),
    )
    naive = sorted(
        (r.a_id, r.b_id)
        for r in iv.crossJoin(pt)
        .filter((F.col("lo") <= F.col("b_ts")) & (F.col("b_ts") <= F.col("hi")))
        .collect()
    )
    for width in (180, 45):  # one bin covers all; intervals span 5+ bins
        got = sorted(
            (r.a_id, r.b_id)
            for r in range_join(iv, pt, "lo", "hi", "b_ts", bin_width_s=width)
            .collect()
        )
        assert got == naive, f"bin_width_s={width}"


def test_range_join_rejects_column_overlap(spark):
    import pytest as _pytest

    from etl_end_to_end_airflow_bigquery_spark.operators.temporal import (
        range_join,
    )

    df = spark.range(1).select(
        F.current_timestamp().alias("lo"),
        F.current_timestamp().alias("hi"),
        F.current_timestamp().alias("p"),
    )
    with _pytest.raises(ValueError, match="share column names"):
        range_join(df, df.select("p"), "lo", "hi", "p")


def test_range_join_auto_bin_width(spark):
    """bin_width_s=None derives the width from max(hi-lo) and must give
    the same pairs as an explicit width."""
    import pytest as _pytest

    from etl_end_to_end_airflow_bigquery_spark.operators.temporal import (
        range_join,
    )

    iv = spark.createDataFrame(
        [("a", _t("2024-01-01 00:00:00"), _t("2024-01-01 00:02:00")),
         ("b", _t("2024-01-01 00:05:00"), _t("2024-01-01 00:05:30"))],
        "iv_id string, lo timestamp, hi timestamp",
    )
    pt = spark.createDataFrame(
        [("p1", _t("2024-01-01 00:01:00")), ("p2", _t("2024-01-01 00:05:10"))],
        "pt_id string, p timestamp",
    )
    auto = sorted(
        (r.iv_id, r.pt_id)
        for r in range_join(iv, pt, "lo", "hi", "p", bin_width_s=None)
        .collect()
    )
    assert auto == [("a", "p1"), ("b", "p2")]
    empty = iv.filter("iv_id = 'nope'")
    with _pytest.raises(ValueError, match="empty intervals frame"):
        range_join(empty, pt, "lo", "hi", "p", bin_width_s=None)


def test_interval_overlap_join_emits_each_pair_once(spark):
    """Two-sided overlap join == naive cross-filter, including long
    intervals spanning many bins (the once-only lowest-shared-bin guard
    is what's under test), touching endpoints (closed bounds), and
    disjoint intervals."""
    from etl_end_to_end_airflow_bigquery_spark.operators.temporal import (
        interval_overlap_join,
    )

    left = spark.createDataFrame(
        [("a", _t("2024-01-01 00:00:00"), _t("2024-01-01 03:00:00")),
         ("b", _t("2024-01-01 01:00:00"), _t("2024-01-01 01:00:30")),
         ("c", _t("2024-01-01 05:00:00"), _t("2024-01-01 05:10:00"))],
        "l_id string, a_lo timestamp, a_hi timestamp",
    )
    right = spark.createDataFrame(
        [("x", _t("2024-01-01 00:30:00"), _t("2024-01-01 02:00:00")),
         # touches a's end exactly: closed bounds must match
         ("y", _t("2024-01-01 03:00:00"), _t("2024-01-01 04:00:00")),
         ("z", _t("2024-01-01 04:30:00"), _t("2024-01-01 04:59:59"))],
        "r_id string, b_lo timestamp, b_hi timestamp",
    )
    for width in (120, 3600):
        got = sorted(
            (r.l_id, r.r_id)
            for r in interval_overlap_join(
                left, right, "a_lo", "a_hi", "b_lo", "b_hi",
                bin_width_s=width,
            ).collect()
        )
        assert got == [("a", "x"), ("a", "y"), ("b", "x")], (width, got)
