"""End-to-end FX pipelines: the reference's DAG flows as batch functions.

The central property (why v2/v3 of the reference exist): re-running any
tick or report is safe — twice ≡ once.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_end_to_end_airflow_bigquery_spark.operators.writers import read_table
from etl_end_to_end_airflow_bigquery_spark.pipelines import run_ingest, run_report


def _ts(s):
    return F.to_timestamp(F.lit(s))


def test_ingest_then_report_merge_flow(spark, tmp_path, fx_payload):
    raw = str(tmp_path / "exchange_rate")
    rep = str(tmp_path / "exchange_rate_report")

    run_ingest(spark, fx_payload, raw, mode="merge", ingest_ts=_ts("2026-01-05 09:00:00"))
    # same tick re-delivered (scheduler retry) → no duplicates
    run_ingest(spark, fx_payload, raw, mode="merge", ingest_ts=_ts("2026-01-05 09:05:00"))
    assert read_table(spark, raw).count() == 3  # one row per currency

    run_report(spark, raw, rep, mode="merge")
    first = {(r.from_cur, r.to_cur): r.avg_rate for r in read_table(spark, rep).collect()}
    assert first[("EUR", "USD")] == 1.1664

    # new intra-day rate arrives; report re-run overwrites (latest wins)
    newer = dict(fx_payload, rates={"USD": 1.2000})
    run_ingest(spark, newer, raw, mode="merge", ingest_ts=_ts("2026-01-05 10:00:00"))
    run_report(spark, raw, rep, mode="merge")
    rep_rows = read_table(spark, rep).collect()
    got = {(r.from_cur, r.to_cur): r.avg_rate for r in rep_rows}
    assert got[("EUR", "USD")] == 1.2  # merge replaced, not appended
    assert len(rep_rows) == 3


def test_idempotent_mode_first_write_wins(spark, tmp_path, fx_payload):
    raw = str(tmp_path / "raw")
    run_ingest(spark, fx_payload, raw, mode="idempotent", ingest_ts=_ts("2026-01-05 09:00:00"))
    changed = dict(fx_payload, rates={"USD": 9.9})
    run_ingest(spark, changed, raw, mode="idempotent", ingest_ts=_ts("2026-01-05 10:00:00"))
    got = {r.to_cur: r.rate for r in read_table(spark, raw).collect()}
    assert got["USD"] == 1.1664  # guarded: existing key not replaced


def test_append_mode_duplicates(spark, tmp_path, fx_payload):
    raw = str(tmp_path / "raw")
    run_ingest(spark, fx_payload, raw, mode="append", ingest_ts=_ts("2026-01-05 09:00:00"))
    run_ingest(spark, fx_payload, raw, mode="append", ingest_ts=_ts("2026-01-05 09:01:00"))
    assert spark.read.parquet(raw).count() == 6  # v1 semantics


def test_report_last_k_window(spark, tmp_path, fx_payload):
    """avg over the last-k ticks only (reference LIMIT 10 → numpy mean)."""
    raw = str(tmp_path / "raw")
    rep = str(tmp_path / "rep")
    for i, rate in enumerate([1.0, 2.0, 3.0]):
        p = dict(fx_payload, rates={"USD": rate})
        run_ingest(spark, p, raw, mode="append", ingest_ts=_ts(f"2026-01-05 0{i}:00:00"))
    run_report(spark, raw, rep, mode="merge", last_k=2)
    got = {r.to_cur: r.avg_rate for r in read_table(spark, rep).collect()}
    assert got["USD"] == 2.5  # mean of the 2 most recent (2.0, 3.0)
