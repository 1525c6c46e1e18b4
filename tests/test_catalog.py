"""Catalog DDL surface (S5/S6): idempotent create, drop, dataset analog.

The invariant the reference's deploy relies on: CREATE TABLE IF NOT
EXISTS is safe to run on every pipeline start and never clobbers data
(``/root/reference/README.md:27-40``); delete_table with not_found_ok
never fails on a missing table (``dags/fx_pipeline_with_merge.py:109-111``).
"""

from __future__ import annotations

import pytest

from etl_end_to_end_airflow_bigquery_spark.catalog import (
    create_table_if_not_exists,
    drop_database,
    drop_table,
    ensure_database,
)

SCHEMA = "date TIMESTAMP, from_cur STRING, to_cur STRING, rate DOUBLE"


@pytest.fixture()
def db(spark):
    ensure_database(spark, "cat_test")
    yield "cat_test"
    drop_database(spark, "cat_test", cascade=True)


def test_create_is_idempotent_and_preserves_data(spark, db):
    name = f"{db}.exchange_rate"
    assert create_table_if_not_exists(spark, name, SCHEMA) is True
    spark.sql(
        f"INSERT INTO {name} VALUES (TIMESTAMP '2026-01-05 00:00:00', 'EUR', 'USD', 1.1664)"
    )
    # second create: no-op, returns False, row survives
    assert create_table_if_not_exists(spark, name, SCHEMA) is False
    assert spark.table(name).count() == 1


def test_drop_table_not_found_ok(spark, db):
    drop_table(spark, f"{db}.never_created")  # must not raise
    with pytest.raises(Exception):
        drop_table(spark, f"{db}.never_created", if_exists=False)


def test_external_table_location_and_partitioning(spark, db, tmp_path):
    name = f"{db}.rate_ext"
    loc = str(tmp_path / "rate_ext")
    assert create_table_if_not_exists(
        spark, name, SCHEMA, location=loc, partitioned_by=["from_cur"]
    )
    # partitioned tables order partition columns last — name the columns
    spark.sql(
        f"INSERT INTO {name} (date, from_cur, to_cur, rate) "
        "VALUES (TIMESTAMP '2026-01-05 00:00:00', 'EUR', 'USD', 1.2)"
    )
    # partition pruning is physical: hive-style leaf dir exists
    import os

    assert any(d.startswith("from_cur=") for d in os.listdir(loc))
    # dropping an external table keeps the data files
    drop_table(spark, name)
    assert not spark.catalog.tableExists(name)
    assert any(d.startswith("from_cur=") for d in os.listdir(loc))


def test_ensure_database_idempotent(spark):
    ensure_database(spark, "cat_test2")
    ensure_database(spark, "cat_test2")  # no raise
    assert spark.catalog.databaseExists("cat_test2")
    drop_database(spark, "cat_test2", cascade=True)


def test_identifier_validation(spark):
    with pytest.raises(ValueError):
        create_table_if_not_exists(spark, "bad`name", SCHEMA)
