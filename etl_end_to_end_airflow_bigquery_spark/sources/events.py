"""Event-stream source: parquet with nanosecond timestamps.

The driver's ``events.parquet`` stores ``ts`` as parquet
``TIMESTAMP(NANOS, isAdjustedToUTC=false)``, which Spark's vectorized
reader rejects outright ([PARQUET_TYPE_ILLEGAL]). The supported path is
the ``nanosAsLong`` legacy conf (reads the column as raw long
nanoseconds), after which we convert to a microsecond ``timestamp_ntz``
— integer ``div 1000`` truncation, exactly matching how DuckDB/pyarrow
truncate ns→µs, so oracle comparisons line up to the microsecond.

Reference analog: the raw tick table scan (S2,
``dags/ FXRate_Reporting_Pipeline.py:141-144``) — `events` is the
driver's stand-in for the `exchange_rate` tick stream (FIXTURES.md §C).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _prep(spark: SparkSession) -> None:
    # Runtime-settable SQL confs; deterministic regardless of what session
    # the caller hands us (the driver owns the SparkSession).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events table with ``ts`` as microsecond-precision timestamp_ntz.

    Columns: event_id long, ts timestamp_ntz, user_id long,
    event_type string, value double, props string (JSON).
    """
    _prep(spark)
    raw = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    return raw.withColumn(
        "ts",
        F.timestamp_micros(F.expr("ts div 1000")).cast("timestamp_ntz"),
    )
