"""Approximate aggregates: sketch results land within their documented
error bounds of the exact answer.

These are the scale-path duals of the exact operators already gated
(`quantile_pack`, `distinct_parts_per_supplier`): HLL++ count-distinct
and GK quantiles cost O(sketch) memory per group instead of O(n)
shuffle, which is what you reach for when the exact pass is the
bottleneck at 100 TB. They can't be oracle-hash-checked (sketch
internals differ across engines), so the check here is the error bound
itself vs the exact Spark answer — the contract a user relies on.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def events(spark):
    from etl_end_to_end_airflow_bigquery_spark.sources.events import load_events

    return load_events(spark, SF_DIR)


def test_approx_count_distinct_within_rsd(events):
    exact = events.select(F.countDistinct("user_id")).first()[0]
    approx = events.select(
        F.approx_count_distinct("user_id", rsd=0.02)
    ).first()[0]
    assert abs(approx - exact) / exact < 0.06  # 3σ of rsd=0.02


def test_approx_count_distinct_grouped(events):
    ex = {
        r.event_type: r.n
        for r in events.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    ap = {
        r.event_type: r.n
        for r in events.groupBy("event_type")
        .agg(F.approx_count_distinct("user_id", rsd=0.02).alias("n"))
        .collect()
    }
    assert set(ap) == set(ex)
    for k in ex:
        assert abs(ap[k] - ex[k]) / ex[k] < 0.06, k


def test_approx_percentile_within_accuracy(events):
    # percentile_approx(accuracy=a) guarantees rank error <= n/a
    n = events.count()
    acc = 1000
    approx = events.select(
        F.percentile_approx("value", [0.25, 0.5, 0.75], acc).alias("q")
    ).first()["q"]
    exact_ranks = events.select(
        F.expr(
            "percentile_disc(array(0.25, 0.5, 0.75)) WITHIN GROUP (ORDER BY value)"
        ).alias("q")
    ).first()["q"]
    vals = sorted(r.value for r in events.select("value").collect())
    tol = n // acc + 1
    import bisect

    for a, e in zip(approx, exact_ranks):
        # rank distance between approx and exact answer is within bound
        ra = bisect.bisect_left(vals, a)
        re = bisect.bisect_left(vals, e)
        assert abs(ra - re) <= tol
