"""Streaming report — the reference's periodic aggregation DAG (T2/T3)
as an event-time windowed stream.

Reference: a cron fires a query that averages recent ticks and MERGEs
one row per (day, pair), latest analysis winning
(``dags/fx_pipeline_with_merge.py:141-195``; README.md:8,66). Streaming
re-expression:

- 1-day tumbling event-time window + watermark bounds state and admits
  late ticks up to the watermark (T2);
- ``outputMode("update")`` emits a (day, pair) row whenever its average
  changes — the intra-day refresh the reference gets by re-running the
  DAG;
- the sink is ``foreachBatch(merge_upsert)``: each micro-batch upserts
  into the report table, so the latest emission overwrites (T3). This is
  the standard upsert-sink pattern for engines without native streaming
  MERGE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.relational import decimal_avg, round_half_up
from ..operators.writers import merge_upsert

REPORT_KEYS = ["date", "from_cur", "to_cur"]


def daily_report_stream(ticks: DataFrame, watermark: str | None = None) -> DataFrame:
    """Streaming daily-average per pair over a 1-day tumbling window.

    State is bounded by the watermark: windows older than it finalize
    and evict. Pass ``watermark`` only for raw streams; leave None when
    the input already carries one (e.g. from ``stream_payloads`` — Spark
    forbids redefining a watermark mid-plan). Output matches
    REPORT_SCHEMA.
    """
    if watermark is not None:
        ticks = ticks.withWatermark("date", watermark)
    return (
        ticks
        .groupBy(F.window("date", "1 day").alias("w"), "from_cur", "to_cur")
        .agg(round_half_up(decimal_avg(F.col("rate")), 4).alias("avg_rate"))
        .select(
            F.col("w.start").alias("date"),
            "from_cur",
            "to_cur",
            "avg_rate",
        )
    )


def report_merge_batch(spark: SparkSession, report_path: str):
    """The foreachBatch function of the report sink, factored out so the
    at-least-once contract is directly testable: foreachBatch MAY
    re-deliver a batch after a recovery, so applying the SAME
    ``(batch_id, df)`` twice must leave the table equal to the
    once-applied state. merge_upsert gives that: key-matched rows
    overwrite with identical values, nothing inserts twice — the
    streaming analog of the reference's idempotent load
    (``dags/idempotent_fx_pipeline.py:73-87``). Asserted by
    ``tests/test_streaming.py::test_report_merge_batch_replay_idempotent``.
    """

    def _merge(batch: DataFrame, _batch_id: int) -> None:
        if batch.isEmpty():
            return
        merge_upsert(spark, report_path, batch, keys=REPORT_KEYS)

    return _merge


def streaming_report_to_merge(
    spark: SparkSession,
    report: DataFrame,
    report_path: str,
    checkpoint_dir: str,
    available_now: bool = True,
):
    """Run the report stream into a MERGE-upsert parquet sink.

    foreachBatch gives at-least-once batch delivery; merge_upsert makes
    it effectively-once (same (day, pair) keys overwrite in place).
    """
    writer = (
        report.writeStream.foreachBatch(report_merge_batch(spark, report_path))
        .outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
