"""Batch FX pipelines — the reference's two Airflow DAGs as plain,
externally-schedulable functions (BASELINE.json: "Spark for ETL
transformations orchestrated externally").

Reference mapping (SURVEY.md §3):

- ``run_ingest`` = ``fetch_fx_rate`` → ``insert_to_bigquery``
  (``dags/ FXRate_Reporting_Pipeline.py:23-100``): payload → flattened
  tick rows → write. The three DAG variants' write semantics are the
  ``mode`` parameter: ``append`` (v1), ``merge`` (v2,
  fx_pipeline_with_merge), ``idempotent`` (v3, idempotent_fx_pipeline).
- ``run_report`` = ``query_exchange_rate``
  (``dags/ FXRate_Reporting_Pipeline.py:128-192``): read recent ticks →
  avg(rate) rounded 4dp → one summary row per (day, pair), upserted
  latest-wins. Unlike the reference there is no engine→client→engine
  round-trip: the whole report is one lazy plan ending in the writer.

Cron scheduling stays external (the reference's `schedule=` strings);
idempotency lives in the writers, so re-running a tick is always safe.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.relational import decimal_avg, round_half_up
from ..operators.writers import (
    append,
    idempotent_append,
    merge_upsert,
    read_table,
)
from ..sources.payload import payload_to_rows
from ..sources.rest import payload_dataframe

RAW_KEYS = ["date", "from_cur", "to_cur"]
REPORT_KEYS = ["date", "from_cur", "to_cur"]


def run_ingest(
    spark: SparkSession,
    payload: dict[str, Any],
    target_path: str,
    mode: str = "merge",
    ingest_ts: Column | None = None,
) -> DataFrame:
    """One ingest tick: payload dict → RAW_SCHEMA rows → write.

    Returns the batch written (for inspection/chaining). ``mode``:
    append | merge | idempotent — the reference's three variants.
    """
    rows = payload_to_rows(payload_dataframe(spark, payload), ingest_ts=ingest_ts)
    if mode == "append":
        append(rows, target_path)
    elif mode == "merge":
        merge_upsert(spark, target_path, rows, keys=RAW_KEYS)
    elif mode == "idempotent":
        idempotent_append(spark, target_path, rows, keys=RAW_KEYS)
    else:
        raise ValueError(f"unknown mode: {mode}")
    return rows


def build_report(raw: DataFrame, last_k: int = 10) -> DataFrame:
    """The report computation: avg of the ``last_k`` most recent ticks
    per pair, rounded to 4 dp, stamped with the quote day.

    The reference pulls 10 rows to the client and means them in numpy
    (``:144-152``); here top-k-per-key (window rank — one shuffle) feeds
    the aggregate in-plan.
    """
    from pyspark.sql import Window

    w = Window.partitionBy("from_cur", "to_cur").orderBy(
        F.col("timestamp").desc(), F.col("rate")
    )
    recent = raw.withColumn("__rn", F.row_number().over(w)).filter(
        F.col("__rn") <= last_k
    )
    return (
        recent.groupBy(
            F.date_trunc("day", F.col("date")).alias("date"),
            "from_cur",
            "to_cur",
        )
        .agg(round_half_up(decimal_avg(F.col("rate")), 4).alias("avg_rate"))
    )


def run_report(
    spark: SparkSession,
    raw_path: str,
    report_path: str,
    mode: str = "merge",
    last_k: int = 10,
) -> DataFrame:
    """One report tick: raw table → daily average per pair → upsert.

    ``merge`` gives the v2 latest-wins semantic (intra-day re-runs
    overwrite, ``README.md:8,66``); ``idempotent`` gives v3 (first write
    of the day wins); ``append`` gives v1.
    """
    raw = read_table(spark, raw_path)
    report = build_report(raw, last_k=last_k)
    if mode == "append":
        append(report, report_path)
    elif mode == "merge":
        merge_upsert(spark, report_path, report, keys=REPORT_KEYS)
    elif mode == "idempotent":
        idempotent_append(spark, report_path, report, keys=REPORT_KEYS)
    else:
        raise ValueError(f"unknown mode: {mode}")
    return report
