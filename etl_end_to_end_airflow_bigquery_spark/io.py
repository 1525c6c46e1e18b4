"""Parquet table loading for the driver's synthetic testdata.

Reference analog: the BigQuery table scan (`client.query(sql)`,
``dags/ FXRate_Reporting_Pipeline.py:141-144``) becomes
``spark.read.parquet`` — Catalyst handles predicate pushdown and column
pruning, so callers should express filters/projections on the returned
DataFrame rather than pre-materializing.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from .schemas import TESTDATA_TABLES

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _tune(spark: SparkSession) -> None:
    """Runtime-settable tuning for caller-owned sessions.

    The driver constructs its own SparkSession; if it still carries the
    stock 200 shuffle partitions (oversized for this host), size it to
    the local core budget, and make sure AQE is on. Only the stock value
    is overridden — an explicitly configured session is respected.
    """
    try:
        if spark.conf.get("spark.sql.shuffle.partitions") == "200":
            spark.conf.set(
                "spark.sql.shuffle.partitions",
                os.environ.get("SPARK_GRAFT_CPUS", "32"),
            )
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    except Exception:
        pass  # tuning must never break a query


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one synthetic table. Plain columnar scan; filters push down."""
    _tune(spark)
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Scan every synthetic table into a dict of DataFrames."""
    return {name: load_table(spark, sf_dir, name) for name in TESTDATA_TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register each table as a temp view for the SQL API."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
