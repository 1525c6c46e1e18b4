"""Incremental aggregate maintenance == full recompute, bit-for-bit,
under any batch arrival order."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_end_to_end_airflow_bigquery_spark.operators.incremental import (
    finish_avg,
    merge_avg_state,
    partial_avg_state,
)

SF_DIR = "/root/testdata/sf0.01"
KEYS = ["report_date", "event_type"]


def _events(spark):
    from etl_end_to_end_airflow_bigquery_spark.sources.events import load_events

    return load_events(spark, SF_DIR).select(
        F.to_date("ts").alias("report_date"), "event_type", "value", "event_id"
    )


def test_incremental_equals_full_recompute(spark):
    ev = _events(spark)
    full = finish_avg(partial_avg_state(ev, KEYS, "value"))

    # arbitrary 3-way batch split (hash on event_id), applied incrementally
    batches = [ev.filter(F.pmod(F.hash("event_id"), F.lit(3)) == i) for i in range(3)]
    state = partial_avg_state(batches[0], KEYS, "value")
    for b in batches[1:]:
        state = merge_avg_state(state, partial_avg_state(b, KEYS, "value"), KEYS)
    inc = finish_avg(state)

    key = KEYS + ["sum_u", "n", "avg_value"]
    a = sorted(tuple(r) for r in full.select(*key).collect())
    b = sorted(tuple(r) for r in inc.select(*key).collect())
    assert a == b  # exact: scaled-int state is associative


def test_late_batch_only_touches_its_groups(spark):
    ev = _events(spark)
    state0 = partial_avg_state(ev, KEYS, "value")
    # a late batch for ONE (day, type) group
    one = ev.orderBy("report_date", "event_type").limit(1)
    late = one.select("report_date", "event_type",
                      (F.col("value") * 2).alias("value"), "event_id")
    merged = merge_avg_state(
        state0, partial_avg_state(late, KEYS, "value"), KEYS
    )
    changed = (
        merged.alias("m")
        .join(state0.alias("s"), KEYS)
        .filter("m.n <> s.n OR m.sum_u <> s.sum_u")
        .count()
    )
    assert changed == 1  # exactly the late group restates
    assert merged.count() == state0.count()
