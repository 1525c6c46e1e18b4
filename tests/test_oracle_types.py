"""Registry-wide oracle result-type lint (VERDICT r06 item 2).

Root cause of the r5/r6 driver hash mismatches: DuckDB types
``SUM(BIGINT)`` as HUGEINT, a type Spark cannot produce, and the
driver's hash canonicalizes HUGEINT cells differently from BIGINT even
when every value is identical.  Local value-equality (selfcheck's
``str()`` canon) masks the divergence entirely — so the guard has to
work at the TYPE level, before any values are compared.

This lint binds (does not execute) every oracle in the registry against
the sf0.001 views and asserts each result column's DuckDB type is in
the closed set that maps 1:1 onto a Spark type the queries actually
emit.  Anything outside the set (HUGEINT, DECIMAL, unsigned ints,
TIMESTAMP WITH TIME ZONE, …) fails loudly with the offending
query/column so the fix happens before a driver round is spent on it.
"""

from __future__ import annotations

import duckdb
import pytest

from etl_end_to_end_airflow_bigquery_spark.plans import ORACLES
from etl_end_to_end_airflow_bigquery_spark.schemas import TESTDATA_TABLES

SF_SMALL = "/root/testdata/sf0.001"

# DuckDB result types with an exact Spark counterpart used by the
# registry: BIGINT<->LongType, INTEGER<->IntegerType, DOUBLE<->DoubleType,
# VARCHAR<->StringType, DATE<->DateType, TIMESTAMP<->TimestampNTZ,
# BOOLEAN<->BooleanType.  Extend deliberately; never add HUGEINT or
# DECIMAL — cast those to BIGINT/DOUBLE in the oracle instead.
ALLOWED_TYPES = {
    "BIGINT",
    "INTEGER",
    "DOUBLE",
    "FLOAT",
    "VARCHAR",
    "DATE",
    "TIMESTAMP",
    "BOOLEAN",
}


@pytest.fixture(scope="module")
def con():
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS "
            f"SELECT * FROM read_parquet('{SF_SMALL}/{t}.parquet')"
        )
    yield con
    con.close()


def lint_oracle(con: duckdb.DuckDBPyConnection, sql: str) -> list[tuple[str, str]]:
    """Bind *sql* and return (column, type) pairs outside ALLOWED_TYPES."""
    rel = con.sql(sql)
    return [
        (c, str(ty))
        for c, ty in zip(rel.columns, rel.types)
        if str(ty) not in ALLOWED_TYPES
    ]


def test_registry_oracle_types_clean(con):
    offenders = {}
    for name, sql in ORACLES.items():
        bad = lint_oracle(con, sql)
        if bad:
            offenders[name] = bad
    assert not offenders, (
        "oracles emitting driver-hash-unsafe DuckDB types (cast the "
        f"output column to BIGINT/DOUBLE): {offenders}"
    )


def test_lint_catches_uncast_sum_bigint(con):
    # The exact shape that burned r5/r6: SUM over a BIGINT column.
    bad = lint_oracle(
        con, "SELECT o_custkey, SUM(o_orderkey) AS s FROM orders GROUP BY 1"
    )
    assert bad == [("s", "HUGEINT")]


def test_lint_catches_decimal_literal_promotion(con):
    # BIGINT * decimal-typed literal promotes to DECIMAL(p,s) in DuckDB
    # while Spark yields DOUBLE for long * float.
    bad = lint_oracle(con, "SELECT o_orderkey * 5000.0 AS v FROM orders")
    assert bad and bad[0][0] == "v" and bad[0][1].startswith("DECIMAL")


def test_lint_passes_cast_sum(con):
    assert (
        lint_oracle(
            con,
            "SELECT CAST(SUM(o_orderkey) AS BIGINT) AS s FROM orders",
        )
        == []
    )
