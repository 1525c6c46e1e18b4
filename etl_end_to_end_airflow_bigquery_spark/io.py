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


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one synthetic table. Plain columnar scan; filters push down."""
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Scan every synthetic table into a dict of DataFrames."""
    return {name: load_table(spark, sf_dir, name) for name in TESTDATA_TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register each table as a temp view for the SQL API."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
