"""Streaming ingest — the reference's cron tick (T1) as Structured
Streaming.

The reference's scheduler fires ``fetch_fx_rate`` on a cron
(``dags/ FXRate_Reporting_Pipeline.py:106``); each tick lands one JSON
payload. Engine-side, that is a file-source stream of payload documents:
drop payload JSON into a directory (any collector can do this), Spark
discovers, flattens and writes ticks exactly-once per file via
checkpointing. ``trigger(availableNow=True)`` replays whatever has
accumulated and stops — the reference's ``catchup=False`` deploy
semantic (T5) and its backfill story in one switch.

Duplicate ticks across restarts are handled by
``dropDuplicatesWithinWatermark`` (T4) — the engine-level version of the
reference's check-then-insert guard.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schemas import API_PAYLOAD_SCHEMA
from ..sources.payload import payload_to_rows


def stream_payloads(
    spark: SparkSession,
    payload_dir: str,
    dedup_watermark: str = "2 days",
) -> DataFrame:
    """payload-JSON directory → streaming frame of RAW_SCHEMA ticks.

    The ingestion timestamp is the engine clock at micro-batch time
    (reference: ``pd.Timestamp.now(tz='UTC')``, :52). Late/duplicate
    payloads within the watermark are dropped on the composite key
    (date, from_cur, to_cur) — the reference's idempotency key. The
    watermark rides the event-time ``date`` column so downstream
    stateful operators (the windowed report) chain on the same
    watermark — Spark disallows redefining it per-operator.
    """
    payloads = spark.readStream.schema(API_PAYLOAD_SCHEMA).json(payload_dir)
    ticks = payload_to_rows(payloads, ingest_ts=F.current_timestamp())
    return ticks.withWatermark("date", dedup_watermark).dropDuplicatesWithinWatermark(
        ["date", "from_cur", "to_cur"]
    )


def write_ticks(
    ticks: DataFrame,
    target_path: str,
    checkpoint_dir: str,
    available_now: bool = True,
):
    """Append the tick stream to the raw parquet table, exactly-once per
    source file via the checkpoint. Returns the StreamingQuery."""
    writer = (
        ticks.writeStream.format("parquet")
        .option("path", target_path)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
