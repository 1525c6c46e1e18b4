"""The driver's correctness gate as a pytest: every queries() entry vs
its DuckDB oracle_sql() at sf0.001 (row count + columns + canonical
order-insensitive values). The heavier sf0.01 sweep runs via
tools/selfcheck.py.
"""

from __future__ import annotations

import sys
from pathlib import Path

import duckdb
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import __spark_entry__ as entrymod
from etl_end_to_end_airflow_bigquery_spark.schemas import TESTDATA_TABLES
from tools.selfcheck import frame_to_rows

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def oracle_con():
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con


QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()


def test_every_query_has_an_oracle():
    assert set(QUERIES) == set(ORACLES)


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, oracle_con, name):
    sdf = QUERIES[name](spark, SF_DIR)
    scols, svals = frame_to_rows(sdf.columns, [tuple(r) for r in sdf.collect()])
    rel = oracle_con.execute(ORACLES[name])
    dcols, dvals = frame_to_rows([d[0] for d in rel.description], rel.fetchall())
    assert scols == dcols
    assert len(svals) == len(dvals)
    assert svals == dvals
