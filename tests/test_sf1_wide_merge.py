"""sf1-scale validation of the MERGE / SCD2 write paths (VERDICT r04
item 4): keys at overflow-adjacent magnitudes.

tests/test_sf1_wide.py proves the wide=True decimal AGGREGATES past
int64; this module proves the WRITERS stay exact when the key domain
crosses the magnitudes where naive arithmetic breaks: keys straddling
2^31 (int32 wraps), 2^53 (doubles lose integer exactness — the classic
silent key-collision failure if anything casts a key through float),
and 2^63-adjacent (int64 edge). Row count is generated, never stored
(spark.range), so the test is cheap locally while exercising the exact
key values a >2^31-row production table would carry.

Reference semantics matched: MERGE updates every non-key column and
inserts unmatched source rows atomically
(``dags/fx_pipeline_with_merge.py:90-111``).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_end_to_end_airflow_bigquery_spark.operators.writers import (
    merge_upsert,
    merge_upsert_df,
    read_table,
    scd2_apply,
)

# Key bands around each dangerous boundary. 2^53 ± k is the sharpest:
# if any plan casts keys through double, 2^53 and 2^53 + 1 collide and
# the merged row count drops — an assert below would catch it.
N_PER_BAND = 20_000
# top band leaves room for the inserted half-band below int64 max
BANDS = [
    2**31 - N_PER_BAND // 2,
    2**53 - N_PER_BAND // 2,
    2**63 - 2 * N_PER_BAND - 7,
]


def _keyed(spark, start: int, n: int, v_expr: str):
    return spark.range(start, start + n).selectExpr(
        "id AS k", f"{v_expr} AS v"
    )


@pytest.fixture(scope="module")
def band_frames(spark):
    """(target, source) per band: target = all keys, source = the even
    half updated + N_PER_BAND/2 brand-new keys above the band."""
    out = []
    for start in BANDS:
        target = _keyed(spark, start, N_PER_BAND, "CAST(id % 97 AS DOUBLE)")
        src_upd = _keyed(
            spark, start, N_PER_BAND, "CAST(id % 97 AS DOUBLE) + 1000.0"
        ).filter(F.col("k") % 2 == 0)
        src_new = _keyed(
            spark, start + N_PER_BAND, N_PER_BAND // 2,
            "CAST(-1 AS DOUBLE)",
        )
        out.append((start, target, src_upd.unionByName(src_new)))
    return out


def test_merge_df_exact_at_overflow_adjacent_keys(band_frames):
    for start, target, source in band_frames:
        merged = merge_upsert_df(target, source, keys=["k"])
        # row count: all originals + the new half-band (no collisions,
        # no double-rounded key collapsing 2^53 with 2^53+1)
        assert merged.count() == N_PER_BAND + N_PER_BAND // 2, start
        agg = merged.agg(
            F.count_distinct("k").alias("nk"),
            F.sum(F.when(F.col("v") >= 1000.0, 1).otherwise(0)).alias("upd"),
            F.sum(F.when(F.col("v") == -1.0, 1).otherwise(0)).alias("ins"),
        ).collect()[0]
        assert agg.nk == N_PER_BAND + N_PER_BAND // 2, start
        assert agg.upd == N_PER_BAND // 2, start  # even half updated
        assert agg.ins == N_PER_BAND // 2, start  # new keys inserted
        # spot-check the sharpest pair: 2^53 and 2^53 + 1 stayed distinct
        if start < 2**53 < start + N_PER_BAND:
            pair = merged.filter(
                F.col("k").isin(2**53, 2**53 + 1)
            ).collect()
            assert len(pair) == 2


def test_merge_versioned_table_roundtrip_at_2p53(spark, tmp_path, band_frames):
    """The versioned-commit writer (partition-scoped atomic rewrite)
    preserves the exact key set through a parquet round-trip at the
    2^53 band — proving the on-disk path, not just the plan."""
    start, target, source = band_frames[1]
    path = str(tmp_path / "wide_merge")
    merge_upsert(spark, path, target, keys=["k"])
    merge_upsert(spark, path, source, keys=["k"])
    got = read_table(spark, path)
    assert got.count() == N_PER_BAND + N_PER_BAND // 2
    assert got.agg(F.count_distinct("k")).collect()[0][0] == (
        N_PER_BAND + N_PER_BAND // 2
    )
    # idempotency at this magnitude: re-merging the batch changes nothing
    merge_upsert(spark, path, source, keys=["k"])
    again = read_table(spark, path)
    assert again.count() == N_PER_BAND + N_PER_BAND // 2
    assert again.filter(F.col("v") >= 1000.0).count() == N_PER_BAND // 2


def test_scd2_exact_at_overflow_adjacent_keys(spark, band_frames):
    import datetime as dt

    for start, target, source in band_frames:
        t = target.select(
            "k", "v",
            F.lit("2026-01-01 00:00:00").cast("timestamp").alias("valid_from"),
            F.lit(None).cast("timestamp").alias("valid_to"),
            F.lit(True).alias("is_current"),
        )
        out = scd2_apply(t, source, keys=["k"], effective_ts="2026-02-01 00:00:00")
        # every source row changed or is new → closed + opened versions
        n_changed = N_PER_BAND // 2
        n_new = N_PER_BAND // 2
        assert out.count() == N_PER_BAND + n_changed + n_new, start
        cur = out.filter("is_current")
        assert cur.count() == N_PER_BAND + n_new, start
        # one current row per key — the invariant double-keyed collisions break
        assert cur.agg(F.count_distinct("k")).collect()[0][0] == (
            N_PER_BAND + n_new
        ), start
        closed = out.filter(
            (~F.col("is_current"))
            & (F.col("valid_to") == dt.datetime(2026, 2, 1))
        )
        assert closed.count() == n_changed, start


# --- VERDICT r05 item 7: range-join bin math at the timestamp edges ----
#
# range_join / interval_overlap_join quantize time into bins with exact
# bigint floor division on unix_micros. The representable timestamp
# domain IS the int64 microsecond domain (±(2^63 − 1) µs ≈ years
# −290308 / +294247), so bin ids, the negative-remainder correction,
# and sequence() must stay exact at its edges — where a double cast
# would collide adjacent micros (2^63 spacing ≫ 1 µs ulp) and a naive
# `us div w` without the sign fix would shift pre-epoch bins by one.

TS_EDGE_BANDS = [
    # leave headroom inside ±(2^63 − 1) µs for the generated offsets
    # (points reach start − 13.5e6 µs, intervals start + ~66e6 µs)
    -(2**63) + 20 * 10**6,    # just above the most-negative timestamp
    -(2**62) - 3,             # deep pre-epoch, straddles a bin boundary
    -5 * 10**6,               # the epoch sign flip (bins -1/0)
    2**53 - 2 * 10**6,        # double-exactness edge in µs
    2**63 - 80 * 10**6 - 1,   # near the most-positive timestamp
]
BIN_W_S = 7  # deliberately not a divisor of any band start


def _ts_edge_frames(spark, start_us: int):
    """15 intervals (varying lengths incl. empty-adjacent) + 60 points
    scattered across ±4 bins around start_us, all built from explicit
    µs longs via timestamp_micros (no Python datetime — it can't
    represent the edges)."""
    iv = spark.range(15).selectExpr(
        f"timestamp_micros({start_us}L + id * 3500000L) AS lo",
        f"timestamp_micros({start_us}L + id * 3500000L"
        " + (id % 5) * 4200000L) AS hi",
        "id AS iv_id",
    )
    pt = spark.range(60).selectExpr(
        f"timestamp_micros({start_us}L + (id - 15) * 900000L) AS p",
        "id AS pt_id",
    )
    return iv, pt


@pytest.mark.parametrize("start_us", TS_EDGE_BANDS)
def test_range_join_exact_at_timestamp_edges(spark, start_us):
    from etl_end_to_end_airflow_bigquery_spark.operators.temporal import (
        range_join,
    )

    iv, pt = _ts_edge_frames(spark, start_us)
    # collect ids only: edge-of-domain timestamps exceed Python
    # datetime's year range, so Row conversion would raise
    got = sorted(
        (r.iv_id, r.pt_id)
        for r in range_join(iv, pt, "lo", "hi", "p", BIN_W_S)
        .select("iv_id", "pt_id")
        .collect()
    )
    brute = sorted(
        (r.iv_id, r.pt_id)
        for r in iv.crossJoin(pt)
        .filter((F.col("lo") <= F.col("p")) & (F.col("p") <= F.col("hi")))
        .select("iv_id", "pt_id")
        .collect()
    )
    assert got == brute and len(brute) > 0


@pytest.mark.parametrize("start_us", TS_EDGE_BANDS)
def test_interval_overlap_join_exact_at_timestamp_edges(spark, start_us):
    from etl_end_to_end_airflow_bigquery_spark.operators.temporal import (
        interval_overlap_join,
    )

    iv, _ = _ts_edge_frames(spark, start_us)
    left = iv.selectExpr("lo AS l_lo", "hi AS l_hi", "iv_id AS l_id")
    right = iv.selectExpr(
        # shift by a non-multiple of the bin width so overlaps cross bins
        "timestamp_micros(unix_micros(lo) + 1300000L) AS r_lo",
        "timestamp_micros(unix_micros(hi) + 2600000L) AS r_hi",
        "iv_id AS r_id",
    )
    got = sorted(
        (r.l_id, r.r_id)
        for r in interval_overlap_join(
            left, right, "l_lo", "l_hi", "r_lo", "r_hi", BIN_W_S
        )
        .select("l_id", "r_id")
        .collect()
    )
    brute = sorted(
        (r.l_id, r.r_id)
        for r in left.crossJoin(right)
        .filter(
            (F.col("l_lo") <= F.col("r_hi"))
            & (F.col("r_lo") <= F.col("l_hi"))
        )
        .select("l_id", "r_id")
        .collect()
    )
    assert got == brute and len(brute) > 0
