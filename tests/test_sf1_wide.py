"""sf1-scale validation of the wide=True decimal sweep (VERDICT r03 item 6).

The round-2 wide=True sweep exists because at high SF the fixed-point
accumulator Σ(x·10⁶) exceeds int64 (~6e8 rows · 4e4 avg price · 1e6 >
2^63) and a narrow BIGINT sum raises ARITHMETIC_OVERFLOW under the
session's pinned ANSI mode. The unit tests in test_relational.py prove
that for a bare column; this module proves it for the actual *queries*
that carry wide=True — pricing_summary, star_join_revenue,
q18_big_orders — end-to-end against the DuckDB oracle.

No sf1 directory exists (the driver generates testdata, and /root/
testdata is read-only), so the 2^63 crossing is reproduced by magnitude
instead of row count: lineitem.l_extendedprice is scaled ×10⁷, which
puts every per-group Σ(price·10⁶) around 3e20 — far past int64's 9.2e18
— while each *element*'s scaled value (~3e17, max ~1.1e18 for the
charge = price·(1-disc)·(1+tax) term) still fits int64, exactly the
regime the DECIMAL(38,0) accumulator was built for. Equivalent stress
to ~10⁷× the row count at original magnitudes, i.e. beyond sf1.

Both engines read the same widened parquet and execute the same IEEE
float ops (floor(x·10⁶+0.5) → exact integer sum → /10⁶), so the compare
is exact string equality on canonicalized values — the same gate the
driver runs.
"""

from __future__ import annotations

import shutil
from pathlib import Path

import duckdb
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from etl_end_to_end_airflow_bigquery_spark.operators.relational import decimal_sum
from etl_end_to_end_airflow_bigquery_spark.plans import ORACLES, QUERIES
from etl_end_to_end_airflow_bigquery_spark.schemas import TESTDATA_TABLES

SF_SRC = "/root/testdata/sf0.001"
PRICE_SCALE = 1e7  # element scaled value stays < int64, group sums do not

WIDE_QUERIES = ["pricing_summary", "star_join_revenue", "q18_big_orders"]


@pytest.fixture(scope="module")
def wide_sf_dir(tmp_path_factory) -> str:
    """A synthetic 'sf1-equivalent' table set: sf0.001 with lineitem
    prices widened ×1e7 so every wide=True accumulator crosses 2^63."""
    d = tmp_path_factory.mktemp("sf_wide")
    for t in TESTDATA_TABLES:
        src = Path(SF_SRC) / f"{t}.parquet"
        if t != "lineitem":
            shutil.copy(src, d / f"{t}.parquet")
            continue
        tbl = pq.read_table(src)
        widened = tbl.set_column(
            tbl.schema.get_field_index("l_extendedprice"),
            "l_extendedprice",
            pc.multiply(tbl.column("l_extendedprice"), pa.scalar(PRICE_SCALE)),
        )
        pq.write_table(widened, d / "lineitem.parquet")
    return str(d)


def _canon_frame(cols, rows):
    from tools.selfcheck import frame_to_rows

    return frame_to_rows(cols, rows)


def test_widened_data_actually_overflows_int64(spark, wide_sf_dir):
    """The gate below is only meaningful if the narrow path genuinely
    overflows on this data — prove the crossing, don't assume it."""
    li = spark.read.parquet(f"{wide_sf_dir}/lineitem.parquet")
    with pytest.raises(Exception, match="ARITHMETIC_OVERFLOW|overflow"):
        li.agg(decimal_sum(F.col("l_extendedprice")).alias("s")).collect()
    # the wide accumulator absorbs the same sum
    (row,) = li.agg(
        decimal_sum(F.col("l_extendedprice"), wide=True).alias("s")
    ).collect()
    assert row.s > 2**63 / 1e6  # the unscaled sum itself is past int64/1e6


@pytest.mark.parametrize("name", WIDE_QUERIES)
def test_wide_query_matches_oracle_past_int64(spark, wide_sf_dir, name):
    sdf = QUERIES[name](spark, wide_sf_dir)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]
    assert srows, f"{name} returned no rows on the widened data"

    con = duckdb.connect()
    try:
        for t in TESTDATA_TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{wide_sf_dir}/{t}.parquet')"
            )
        rel = con.execute(ORACLES[name])
        dcols = [dd[0] for dd in rel.description]
        drows = rel.fetchall()
    finally:
        con.close()

    sc, sv = _canon_frame(scols, srows)
    dc, dv = _canon_frame(dcols, drows)
    assert sc == dc
    assert sv == dv
