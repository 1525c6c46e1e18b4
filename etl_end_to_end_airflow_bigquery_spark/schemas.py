"""Explicit schemas — schema-on-write, mirroring the reference's DDL.

The reference declares its tables twice: DDL in ``README.md:27-40`` and
explicit ``SchemaField`` lists on every load job
(``dags/ FXRate_Reporting_Pipeline.py:75-85``). We keep the same stance:
never rely on inference for the core tables.
"""

from __future__ import annotations

from pyspark.sql import types as T

# Raw FX tick table (reference: `exchange_rate`, README.md:27-33).
RAW_SCHEMA = T.StructType(
    [
        T.StructField("timestamp", T.TimestampType(), False),  # ingestion time (UTC)
        T.StructField("date", T.TimestampType(), False),  # quote date @ midnight
        T.StructField("from_cur", T.StringType(), False),
        T.StructField("to_cur", T.StringType(), False),
        T.StructField("rate", T.DoubleType(), False),
    ]
)

# Daily-average report table (reference: `exchange_rate_report`, README.md:35-40).
REPORT_SCHEMA = T.StructType(
    [
        T.StructField("date", T.TimestampType(), False),
        T.StructField("from_cur", T.StringType(), False),
        T.StructField("to_cur", T.StringType(), False),
        T.StructField("avg_rate", T.DoubleType(), False),  # round(x, 4)
    ]
)

# Frankfurter-style API payload (reference: dags/test_api.ipynb outputs;
# README.md:76-81): {"amount":1.0,"base":"EUR","date":"...","rates":{CUR:rate}}
API_PAYLOAD_SCHEMA = T.StructType(
    [
        T.StructField("amount", T.DoubleType(), True),
        T.StructField("base", T.StringType(), True),
        T.StructField("date", T.StringType(), True),
        T.StructField("rates", T.MapType(T.StringType(), T.DoubleType()), True),
    ]
)

# Multimodal column pattern: opaque binary payload + typed metadata struct.
# (Extension surface — no binary columns exist in the reference; this is the
# schema contract for image/audio/video blobs at 100 TB.)
MULTIMODAL_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("modality", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType(), True),
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.LongType(), True),
                    T.StructField("sha256", T.StringType(), True),
                ]
            ),
            True,
        ),
    ]
)

# Driver-generated synthetic tables (TESTDATA.md / FIXTURES.md §B).
TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)
