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


def test_gate_first_50_spans_families_and_rotates():
    """The driver verifies the FIRST 50 queries() entries in dict order.
    Two properties, both load-bearing (VERDICT r02 item 1 + r03 item 2):

    1. ANCHORS — every operator family keeps at least one hard-signal
       row: a registry edit can't silently push streaming, pandas-UDF,
       multimodal, dedup, ANN, OLAP, or CDC past the gate.
    2. ROTATION — the non-anchor slots hold queries that have NEVER had
       a green driver row in a prior round (per the recorded
       CORRECTNESS history), so coverage widens every round instead of
       re-verifying the same 50 forever.
    """
    from etl_end_to_end_airflow_bigquery_spark.plans import (
        GATED_THROUGH_R15,
        _GATE_ANCHORS,
        _GATE_ROTATION,
        _REPROOF_BACKFILL,
    )

    names = list(QUERIES)[:50]
    got = set(names)
    # anchors: one per family, permanently gated
    assert set(_GATE_ANCHORS) <= got
    assert sum(n.startswith("streaming") for n in names) >= 1
    assert "grouped_stats_pandas" in got          # pandas-UDF surface
    assert any(n.startswith("multimodal") for n in names)
    assert {"dedup_exact_docs", "curated_corpus_v2"} <= got  # dedup chain
    assert {"cosine_topk", "ivf_topk_kmeans"} <= got         # ANN
    assert {"merge_upsert_orders", "idempotent_append_orders"} <= got
    assert "scd2_orders_status" in got                       # SCD2/CDC
    # r8+ policy (VERDICT r07 item 1): the registry is 100% driver-proven
    # through the last folded round, so rotation slots hold exactly the
    # round's NEW queries and every backfill slot is a deliberate
    # re-proof of a prior green.
    assert all(n not in GATED_THROUGH_R15 for n in _GATE_ROTATION)
    assert all(n in GATED_THROUGH_R15 for n in _REPROOF_BACKFILL)
    from etl_end_to_end_airflow_bigquery_spark.plans import rotation_candidates

    assert rotation_candidates() == [], (
        "never-driver-proven queries left outside the gate: "
        f"{rotation_candidates()}"
    )


def test_gated_history_matches_correctness_files():
    """GATED_THROUGH_R0N is the rotation's ground truth — pin it to the
    actual driver artifacts so it can't drift. Rounds 1–4 had no red
    rows, so every recorded name counts; from r05 on, only GREEN rows
    (rows+schema+hash all matching) enter the ledger — r05's hash
    mismatch (mix_sources_tokens) and r06's two (mix_sources_tokens,
    variant_function_pack — the HUGEINT oracle-type bug) stayed
    rotation-eligible until their green r07 rows."""
    import json

    root = Path(__file__).resolve().parent.parent
    u: set[str] = set()
    for p in sorted(root.glob("CORRECTNESS_r0[1-4].json")):
        u |= set(json.load(open(p)))

    def greens(path):
        rows = json.load(open(path))
        return {
            n
            for n, v in rows.items()
            if v.get("rows_match")
            and v.get("schema_match")
            and v.get("hash_match", True)
            and not v.get("err")
        }

    for p in sorted(root.glob("CORRECTNESS_r0[56].json")):
        u |= greens(p)
    from etl_end_to_end_airflow_bigquery_spark.plans import (
        GATED_THROUGH_R06,
        GATED_THROUGH_R07,
        GATED_THROUGH_R08,
        GATED_THROUGH_R09,
        GATED_THROUGH_R10,
        GATED_THROUGH_R11,
        GATED_THROUGH_R12,
        GATED_THROUGH_R13,
        GATED_THROUGH_R14,
        GATED_THROUGH_R15,
    )

    assert GATED_THROUGH_R06 == frozenset(u)
    u |= greens(root / "CORRECTNESS_r07.json")
    assert GATED_THROUGH_R07 == frozenset(u)
    u |= greens(root / "CORRECTNESS_r08.json")
    assert GATED_THROUGH_R08 == frozenset(u)
    u |= greens(root / "CORRECTNESS_r09.json")
    assert GATED_THROUGH_R09 == frozenset(u)
    u |= greens(root / "CORRECTNESS_r10.json")
    assert GATED_THROUGH_R10 == frozenset(u)
    u |= greens(root / "CORRECTNESS_r11.json")
    assert GATED_THROUGH_R11 == frozenset(u)
    u |= greens(root / "CORRECTNESS_r12.json")
    assert GATED_THROUGH_R12 == frozenset(u)
    u |= greens(root / "CORRECTNESS_r13.json")
    assert GATED_THROUGH_R13 == frozenset(u)
    u |= greens(root / "CORRECTNESS_r14.json")
    assert GATED_THROUGH_R14 == frozenset(u)
    u |= greens(root / "CORRECTNESS_r15.json")
    assert GATED_THROUGH_R15 == frozenset(u)


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
