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


def test_gate_first_50_spans_operator_families():
    """The driver verifies the FIRST 50 queries() entries in dict order;
    this pins the curated ordering (plans/__init__._GATE_PRIORITY) so a
    future registry edit can't silently push a whole operator family —
    streaming, pandas-UDF, multimodal, OLAP, CDC — past the gate again
    (VERDICT r02 top item)."""
    names = list(QUERIES)[:50]
    got = set(names)
    assert sum(n.startswith("streaming") for n in names) >= 3
    assert "grouped_stats_pandas" in got  # pandas-UDF surface
    assert sum(n.startswith("multimodal") for n in names) >= 2
    assert {"minhash_pairs", "jaccard_near_dups", "dedup_clusters"} <= got
    assert {"cosine_topk", "ann_lsh_topk", "ivf_topk", "ivf_topk_kmeans"} <= got
    assert {"q5_local_supplier_volume", "q18_big_orders"} <= got  # OLAP heavies
    assert {"scd2_orders_status", "snapshot_diff_orders"} <= got  # CDC
    assert {"merge_upsert_orders", "idempotent_append_orders"} <= got
    assert "curated_corpus_v2" in got  # capstone
    assert {"resample_daily_rates", "incremental_daily_state"} <= got


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
