"""Catalog / DDL surface (S5, S6) — the SQL-side table lifecycle the
reference manages in BigQuery.

Reference parity:

- ``bq mk --dataset PROJECT_ID:airflow_challenge``
  (``/root/reference/README.md:22``) → :func:`ensure_database`
  (``CREATE DATABASE IF NOT EXISTS``).
- ``CREATE TABLE IF NOT EXISTS `…exchange_rate` (…)``
  (``/root/reference/README.md:27-40``) → :func:`create_table_if_not_exists`
  — idempotent: a second call with the same name is a no-op and never
  touches existing data.
- ``client.delete_table(table_id, not_found_ok=True)``
  (``dags/fx_pipeline_with_merge.py:109-111``) → :func:`drop_table` with
  ``if_exists=True`` (the ``not_found_ok`` analog).

Tables are ``USING parquet``; with ``location`` they are *external* (drop
removes only catalog metadata, the 100 TB-safe default for shared data
lakes), without it they are managed in ``spark.sql.warehouse.dir`` (drop
deletes data — BigQuery-table semantics). ``partitioned_by`` maps the
README's "consider partitioning by DATE(date)" note onto physical
Hive-style partition pruning.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def _q(identifier: str) -> str:
    """Backtick-quote a (possibly dotted) identifier; reject backticks."""
    parts = identifier.split(".")
    if any(not p or "`" in p for p in parts):
        raise ValueError(f"invalid identifier: {identifier!r}")
    return ".".join(f"`{p}`" for p in parts)


def ensure_database(spark: SparkSession, name: str) -> None:
    """``bq mk --dataset`` analog: CREATE DATABASE IF NOT EXISTS."""
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {_q(name)}")


def create_table_if_not_exists(
    spark: SparkSession,
    name: str,
    schema_ddl: str,
    location: str | None = None,
    partitioned_by: list[str] | None = None,
) -> bool:
    """Declare a table idempotently; returns True iff it was created.

    ``schema_ddl`` is a column list like ``"date TIMESTAMP, rate DOUBLE"``
    (the README's CREATE TABLE body). Safe to run on every pipeline start,
    exactly how the reference deploys its DDL.
    """
    quoted = _q(name)  # validate before any catalog call
    existed = spark.catalog.tableExists(name)
    stmt = f"CREATE TABLE IF NOT EXISTS {quoted} ({schema_ddl}) USING parquet"
    if partitioned_by:
        stmt += " PARTITIONED BY (" + ", ".join(_q(c) for c in partitioned_by) + ")"
    if location:
        stmt += f" LOCATION '{location}'"
    spark.sql(stmt)
    return not existed


def drop_table(spark: SparkSession, name: str, if_exists: bool = True) -> None:
    """``client.delete_table(…, not_found_ok=if_exists)`` analog.

    Managed tables lose their data; external (LOCATION) tables only lose
    the catalog entry.
    """
    spark.sql(f"DROP TABLE {'IF EXISTS ' if if_exists else ''}{_q(name)}")


def drop_database(spark: SparkSession, name: str, cascade: bool = False) -> None:
    spark.sql(
        f"DROP DATABASE IF EXISTS {_q(name)}{' CASCADE' if cascade else ''}"
    )
