"""Streaming + Pandas-UDF queries wired into the correctness gate.

``streaming_daily_avg`` proves the Structured Streaming path computes the
same answer as the batch plan: it runs the events parquet through a
readStream → grouped aggregate → memory sink with
``trigger(availableNow=True)`` (bounded replay, the T5 semantic), then
returns the materialized result — hash-checked against the *same* DuckDB
oracle as the batch ``daily_avg_report``.

``grouped_stats_pandas`` exercises the §2.10 UDF surface (Arrow-batched
``applyInPandas``) with integer-exact outputs so even the Python path is
oracle-verifiable bit-for-bit.
"""

from __future__ import annotations

import os

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .queries import QueryFn

_SINK_SEQ = 0


def streaming_daily_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The flagship daily report, computed by the streaming engine.

    Micro-batch plan: file-stream over the events parquet → ns→µs tick
    conversion → grouped daily average (complete mode over bounded
    replay) → in-memory table. At production scale the memory sink
    becomes the foreachBatch merge writer (streaming/report.py); the
    aggregation plan is identical.
    """
    global _SINK_SEQ
    _SINK_SEQ += 1
    sink = f"stream_daily_avg_{_SINK_SEQ}"
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    # file streams want a directory source; glob-filter down to the
    # events file within the sf dir (at production scale: the events/
    # landing directory itself).
    raw = (
        spark.readStream.schema(
            "event_id long, ts long, user_id long, event_type string, "
            "value double, props string"
        )
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    ticks = raw.withColumn(
        "ts", F.timestamp_micros(F.expr("ts div 1000")).cast("timestamp_ntz")
    )
    agg = (
        ticks.groupBy(F.to_date("ts").alias("report_date"), "event_type")
        .agg(
            (
                (
                    F.sum(F.floor(F.col("value") * 1000000.0 + 0.5)).cast("double")
                    / 1000000.0
                    / F.count("value")
                ).alias("__avg")
            ),
            F.count(F.lit(1)).alias("n_ticks"),
        )
    )
    from ..operators.relational import round_half_up

    out = agg.select(
        "report_date",
        "event_type",
        round_half_up(F.col("__avg"), 4).alias("avg_rate"),
        "n_ticks",
    )
    q = (
        out.writeStream.format("memory")
        .queryName(sink)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return spark.table(sink).orderBy("report_date", "event_type")


def grouped_stats_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type tick statistics via Arrow-batched applyInPandas (§2.10 —
    the reference's whole-batch Python tasks, done the vectorized way).

    The pandas function accumulates in scaled int64 (numpy), so results
    are exact and the Python path hash-matches SQL engines. One shuffle
    on the group key; each group is one Arrow batch.
    """
    from ..sources.events import load_events

    ev = load_events(spark, sf_dir).select("event_type", "value")

    def stats(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        u = np.floor(pdf["value"].to_numpy() * 1e6 + 0.5).astype("int64")
        n = len(u)
        total = int(u.sum())
        mean = float(total) / 1e6 / n
        mean_r = float(np.floor(abs(mean) * 1e4 + 0.5) / 1e4 * (1 if mean >= 0 else -1))
        return pd.DataFrame(
            {
                "event_type": [pdf["event_type"].iloc[0]],
                "n_ticks": [n],
                "sum_value_u": [total],
                "avg_value": [mean_r],
            }
        )

    return (
        ev.groupBy("event_type")
        .applyInPandas(
            stats,
            schema="event_type string, n_ticks long, sum_value_u long, avg_value double",
        )
        .orderBy("event_type")
    )


def streaming_dedup_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T4 (late/duplicate handling) through the gate:
    ``dropDuplicatesWithinWatermark`` over the tick stream, emitting each
    (user_id, event_type) key once. The watermark horizon covers the
    bounded replay, so state is exact here; at production scale the
    horizon bounds state size and duplicates arriving later than the
    delay re-emit — the documented trade. Output is the distinct key
    set (deterministic regardless of which physical row survived), so
    the oracle is a plain SELECT DISTINCT.
    """
    global _SINK_SEQ
    _SINK_SEQ += 1
    sink = f"stream_dedup_{_SINK_SEQ}"
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    raw = (
        spark.readStream.schema(
            "event_id long, ts long, user_id long, event_type string, "
            "value double, props string"
        )
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    ticks = raw.withColumn(
        "ts", F.timestamp_micros(F.expr("ts div 1000")).cast("timestamp")
    )
    deduped = (
        ticks.withWatermark("ts", "31 days")
        .dropDuplicatesWithinWatermark(["user_id", "event_type"])
        .select("user_id", "event_type")
    )
    q = (
        deduped.writeStream.format("memory")
        .queryName(sink)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return spark.table(sink).orderBy("user_id", "event_type")


STREAM_QUERIES: dict[str, QueryFn] = {
    "streaming_daily_avg": streaming_daily_avg,
    "grouped_stats_pandas": grouped_stats_pandas,
    "streaming_dedup_events": streaming_dedup_events,
}
