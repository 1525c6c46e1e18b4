"""Event-stream source: parquet tick table with a normalized timestamp.

The driver's ``events.parquet`` stores ``ts`` as parquet
``TIMESTAMP(MICROS, isAdjustedToUTC=false)``, which Spark reads natively
as ``timestamp_ntz`` (the session pins
``spark.sql.parquet.inferTimestampNTZ.enabled=true``). Earlier driver
builds wrote ``TIMESTAMP(NANOS)``, which Spark's vectorized reader
rejects outright ([PARQUET_TYPE_ILLEGAL]); for those files the supported
path is the ``nanosAsLong`` legacy conf (column surfaces as raw long
nanoseconds) followed by an integer ``div 1000`` truncation — exactly
how DuckDB/pyarrow truncate ns→µs, so oracle comparisons line up to the
microsecond. ``load_events`` detects which encoding it got and
normalizes both to microsecond ``timestamp_ntz``; the legacy conf is
only ever left set when a nanos file is actually in play, so on current
data the session conf is untouched (no cross-query side effects).

Reference analog: the raw tick table scan (S2,
``dags/ FXRate_Reporting_Pipeline.py:141-144``) — `events` is the
driver's stand-in for the `exchange_rate` tick stream (FIXTURES.md §C).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_NANOS_CONF = "spark.sql.legacy.parquet.nanosAsLong"


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events table with ``ts`` as microsecond-precision timestamp_ntz.

    Columns: event_id long, ts timestamp_ntz, user_id long,
    event_type string, value double, props string (JSON).
    """
    path = os.path.join(sf_dir, "events.parquet")
    try:
        raw = spark.read.parquet(path)
    except Exception:
        # Legacy nanos file: readable only via the nanosAsLong conf. The
        # conf must stay set for the scan itself, so it is only mutated
        # on this (legacy-data) branch.
        spark.conf.set(_NANOS_CONF, "true")
        raw = spark.read.parquet(path)
    ts_type = dict(raw.dtypes)["ts"]
    if ts_type == "bigint":
        # Raw long nanoseconds (legacy nanos parquet via nanosAsLong).
        return raw.withColumn(
            "ts",
            F.timestamp_micros(F.expr("ts div 1000")).cast("timestamp_ntz"),
        )
    # Native timestamp (µs) — normalize tz-typed reads to NTZ so plans
    # hash identically regardless of reader conf.
    return raw.withColumn("ts", F.col("ts").cast("timestamp_ntz"))
