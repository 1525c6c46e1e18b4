"""Payload flattening: JSON rates map → raw tick rows (P2, F5-F7, F10).

Reference: the ``for target_currency, rate in rates.items()`` loop that
builds row dicts (``dags/ FXRate_Reporting_Pipeline.py:46-62``) —
re-expressed as a single engine-side ``explode`` over the map column, so
the same code path scales from the reference's 1-row payloads to bulk
payload backfills.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def payload_to_rows(payload_df: DataFrame, ingest_ts: Column | None = None) -> DataFrame:
    """Flatten payload frames into RAW_SCHEMA-shaped tick rows.

    Output columns: timestamp (ingestion time), date (quote date at
    midnight — ``pd.to_datetime(s).normalize()`` in the reference, :50-51),
    from_cur, to_cur, rate.
    """
    ts = ingest_ts if ingest_ts is not None else F.current_timestamp()
    exploded = payload_df.filter(
        F.col("rates").isNotNull() & (F.map_keys("rates") != F.array())
    ).select(
        ts.alias("timestamp"),
        # 'yyyy-MM-dd' string parses to midnight; F5's normalize() is a no-op.
        F.to_timestamp(F.col("date"), "yyyy-MM-dd").alias("date"),
        F.col("base").alias("from_cur"),
        F.explode(F.col("rates")).alias("to_cur", "rate"),
    )
    return exploded.withColumn("rate", F.col("rate").cast("double"))
