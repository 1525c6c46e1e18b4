"""Round-11 wave-5 operator tests: properties the oracle gate's corpus
can't pin down — grid spatial join losslessness on adversarial point
sets (negatives, cell borders, ties), CEP tie-ordering and within-edge
semantics, RANGE-frame tie inclusivity, and the Q21 decorrelation on a
hand-built blame scenario."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from etl_end_to_end_airflow_bigquery_spark.operators.spatial import (
    grid_within_radius,
)


def _brute_pairs(pts_l, pts_r, r):
    out = set()
    for lid, lx, ly in pts_l:
        for rid, rx, ry in pts_r:
            d2 = (lx - rx) ** 2 + (ly - ry) ** 2
            if d2 <= r * r:
                out.add((lid, rid, d2))
    return out


_coord = st.integers(min_value=-40, max_value=40)
_points = st.lists(
    st.tuples(_coord, _coord), min_size=0, max_size=12, unique=True
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(left=_points, right=_points, r=st.integers(min_value=1, max_value=9))
def test_grid_join_equals_brute_force(spark, left, right, r):
    """The 9-cell candidate join loses no in-radius pair and invents
    none, on arbitrary point sets including negative coordinates (the
    floor-div cell id) and points exactly on cell borders / at exactly
    distance r."""
    lrows = [(i, x, y) for i, (x, y) in enumerate(left)]
    rrows = [(i + 1000, x, y) for i, (x, y) in enumerate(right)]
    ldf = spark.createDataFrame(lrows or [(0, 0, 0)], "lid long, lx long, ly long")
    rdf = spark.createDataFrame(rrows or [(1000, 99, 99)], "rid long, rx long, ry long")
    if not lrows:
        ldf = ldf.filter(F.lit(False))
    if not rrows:
        rdf = rdf.filter(F.lit(False))
    got = {
        (row.lid, row.rid, row.d2)
        for row in grid_within_radius(
            ldf, rdf, r, ("lx", "ly"), ("rx", "ry")
        ).collect()
    }
    assert got == _brute_pairs(lrows, rrows, r)


def test_grid_join_shuffle_fallback_matches_broadcast_path(spark):
    """broadcast_right=False (the too-big-to-broadcast fallback) takes
    the shuffle equi-join on the cell id — same pairs, different
    physical join."""
    lrows = [(i, x, y) for i, (x, y) in enumerate([(0, 0), (5, 5), (-7, 3)])]
    rrows = [(1000 + i, x, y) for i, (x, y) in enumerate([(1, 1), (-6, 2), (40, 40)])]
    ldf = spark.createDataFrame(lrows, "lid long, lx long, ly long")
    rdf = spark.createDataFrame(rrows, "rid long, rx long, ry long")
    want = _brute_pairs(lrows, rrows, 5)
    for bc in (True, False):
        got = {
            (r.lid, r.rid, r.d2)
            for r in grid_within_radius(
                ldf, rdf, 5, ("lx", "ly"), ("rx", "ry"), broadcast_right=bc
            ).collect()
        }
        assert got == want, f"broadcast_right={bc}"


def test_grid_join_rejects_reserved_column_names(spark):
    ldf = spark.createDataFrame([(1, 2, 3)], "a long, b long, d2 long")
    rdf = spark.createDataFrame([(1, 2, 3)], "d long, e long, f long")
    with pytest.raises(ValueError, match="reserved"):
        grid_within_radius(ldf, rdf, 5, ("a", "b"), ("e", "f"))


def test_grid_join_rejects_overlapping_columns(spark):
    df = spark.createDataFrame([(1, 2, 3)], "id long, x long, y long")
    with pytest.raises(ValueError, match="disjoint"):
        grid_within_radius(df, df, 5, ("x", "y"), ("x", "y"))


def test_grid_join_rejects_nonpositive_radius(spark):
    ldf = spark.createDataFrame([(1, 2, 3)], "a long, b long, c long")
    rdf = spark.createDataFrame([(1, 2, 3)], "d long, e long, f long")
    with pytest.raises(ValueError, match="radius"):
        grid_within_radius(ldf, rdf, 0, ("b", "c"), ("e", "f"))


def _cep_matches(spark, rows, within_hours=24):
    """The cep_pattern_funnel core (lead window + within filter) on an
    in-memory events frame."""
    from pyspark.sql import Window

    e = spark.createDataFrame(
        rows, "user_id long, ts timestamp_ntz, event_id long, e string"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = (
        e.withColumn("e1", F.lead("e", 1).over(w))
        .withColumn("e2", F.lead("e", 2).over(w))
        .withColumn("ts2", F.lead("ts", 2).over(w))
    )
    return (
        seq.filter(
            (F.col("e") == "v")
            & (F.col("e1") == "c")
            & (F.col("e2") == "p")
            & (
                F.col("ts2")
                <= F.col("ts") + F.expr(f"INTERVAL {within_hours} HOURS")
            )
        )
        .select("user_id", "ts")
        .collect()
    )


def test_cep_equal_ts_resolved_by_event_id(spark):
    """Three events sharing one timestamp: the event_id tiebreak makes
    v->c->p adjacency deterministic — ordered by id it matches, and the
    within-check (0 elapsed) passes."""
    import datetime as dt

    t = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = [(1, t, 10, "v"), (1, t, 11, "c"), (1, t, 12, "p")]
    assert len(_cep_matches(spark, rows)) == 1
    # reversed ids -> pattern reads p,c,v -> no match
    rows = [(1, t, 12, "v"), (1, t, 11, "c"), (1, t, 10, "p")]
    assert len(_cep_matches(spark, rows)) == 0


def test_cep_within_boundary_inclusive_and_interloper_breaks_adjacency(spark):
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    h = dt.timedelta(hours=1)
    # completes at exactly +24h -> inclusive match
    rows = [(1, t0, 1, "v"), (1, t0 + h, 2, "c"), (1, t0 + 24 * h, 3, "p")]
    assert len(_cep_matches(spark, rows)) == 1
    # one hour later -> out of the within window
    rows = [(1, t0, 1, "v"), (1, t0 + h, 2, "c"), (1, t0 + 25 * h, 3, "p")]
    assert len(_cep_matches(spark, rows)) == 0
    # an interloping event between c and p breaks ADJACENT pattern
    rows = [
        (1, t0, 1, "v"),
        (1, t0 + h, 2, "c"),
        (1, t0 + 2 * h, 3, "e"),
        (1, t0 + 3 * h, 4, "p"),
    ]
    assert len(_cep_matches(spark, rows)) == 0


def test_range_frame_is_tie_inclusive(spark):
    """Two rows at the SAME ordering value: a RANGE frame includes both
    in each row's frame (unlike ROWS) — the property that makes the
    rolling sum deterministic without an id tiebreak."""
    from pyspark.sql import Window

    df = spark.createDataFrame(
        [(1, 100, 5), (1, 100, 7), (1, 200, 11)], "u long, t long, v long"
    )
    w = Window.partitionBy("u").orderBy("t").rangeBetween(-50, 0)
    rolls = sorted(
        r.roll for r in df.withColumn("roll", F.sum("v").over(w)).collect()
    )
    # both t=100 rows see 5+7=12; t=200 is alone in its frame (window
    # [150, 200] excludes t=100)
    assert rolls == [11, 12, 12]


def test_q21_decorrelation_blames_only_sole_late_multi_supplier(spark, tmp_path):
    """Hand-built scenario against the decorrelated engine form:
    order 1: suppliers 10 (late) + 11 (on time)  -> blame 10
    order 2: suppliers 10 (late) + 11 (late)     -> nobody (two late)
    order 3: supplier 10 alone (late)            -> nobody (single-supplier)
    order 4: status 'O'                          -> out of scope entirely
    """
    import datetime as dt

    from etl_end_to_end_airflow_bigquery_spark.plans.queries_olap import (
        q21_sole_late_supplier,
    )

    d0 = dt.datetime(1995, 1, 1)
    late = d0 + dt.timedelta(days=120)
    ok = d0 + dt.timedelta(days=10)
    orders = [(1, 1, "F", 0.0, d0, "1-URGENT"), (2, 1, "F", 0.0, d0, "1-URGENT"),
              (3, 1, "F", 0.0, d0, "1-URGENT"), (4, 1, "O", 0.0, d0, "1-URGENT")]
    li = [
        (1, 1, 10, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", late),
        (1, 1, 11, 2, 1.0, 1.0, 0.0, 0.0, "N", "O", ok),
        (2, 1, 10, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", late),
        (2, 1, 11, 2, 1.0, 1.0, 0.0, 0.0, "N", "O", late),
        (3, 1, 10, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", late),
        (4, 1, 10, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", late),
    ]
    supp = [(10, "Supplier#10", 1, 0.0), (11, "Supplier#11", 1, 0.0)]
    spark.createDataFrame(
        orders,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp_ntz, o_orderpriority string",
    ).write.parquet(str(tmp_path / "orders.parquet"))
    spark.createDataFrame(
        li,
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int, "
        "l_quantity double, l_extendedprice double, l_discount double, "
        "l_tax double, l_returnflag string, l_linestatus string, "
        "l_shipdate timestamp_ntz",
    ).write.parquet(str(tmp_path / "lineitem.parquet"))
    spark.createDataFrame(
        supp, "s_suppkey long, s_name string, s_nationkey long, s_acctbal double"
    ).write.parquet(str(tmp_path / "supplier.parquet"))
    got = q21_sole_late_supplier(spark, str(tmp_path)).collect()
    assert [(r.s_name, r.numwait) for r in got] == [("Supplier#10", 1)]


# --- decorrelation properties vs brute-force references ---------------------


def _write_q21_fixture(spark, d, orders, li, supp):
    spark.createDataFrame(
        orders,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp_ntz, o_orderpriority string",
    ).write.parquet(str(d / "orders.parquet"))
    spark.createDataFrame(
        li,
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int, "
        "l_quantity double, l_extendedprice double, l_discount double, "
        "l_tax double, l_returnflag string, l_linestatus string, "
        "l_shipdate timestamp_ntz",
    ).write.parquet(str(d / "lineitem.parquet"))
    spark.createDataFrame(
        supp, "s_suppkey long, s_name string, s_nationkey long, s_acctbal double"
    ).write.parquet(str(d / "supplier.parquet"))


def _q21_brute(orders, li, late_days=90):
    """Literal double-correlated EXISTS / NOT-EXISTS semantics."""
    import datetime as dt

    odate = {o[0]: o[4] for o in orders if o[2] == "F"}
    pairs = set()
    for l1 in li:
        ok, sk = l1[0], l1[2]
        if ok not in odate:
            continue
        late1 = l1[10] > odate[ok] + dt.timedelta(days=late_days)
        if not late1:
            continue
        others = [l2 for l2 in li if l2[0] == ok and l2[2] != sk]
        if not others:
            continue
        other_late = any(
            l3[10] > odate[ok] + dt.timedelta(days=late_days) for l3 in others
        )
        if other_late:
            continue
        pairs.add((ok, sk))
    counts: dict[int, int] = {}
    for _, sk in pairs:
        counts[sk] = counts.get(sk, 0) + 1
    return counts


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(data=st.data())
def test_q21_decorrelation_matches_bruteforce_exists(spark, data):
    """The two-counter window decorrelation == the literal correlated
    EXISTS/NOT-EXISTS semantics, on random multi-supplier order sets
    (random statuses, random late/on-time mixes, single-supplier
    orders, all-late orders)."""
    import datetime as dt
    import shutil
    import tempfile
    from pathlib import Path

    from etl_end_to_end_airflow_bigquery_spark.plans.queries_olap import (
        q21_sole_late_supplier,
    )

    d0 = dt.datetime(1995, 1, 1)
    n_orders = data.draw(st.integers(min_value=1, max_value=6))
    orders, li = [], []
    lineno = 0
    for ok in range(1, n_orders + 1):
        status = data.draw(st.sampled_from(["F", "F", "O"]))
        orders.append((ok, 1, status, 0.0, d0, "1-URGENT"))
        for _ in range(data.draw(st.integers(min_value=1, max_value=4))):
            lineno += 1
            sk = data.draw(st.integers(min_value=10, max_value=12))
            days = data.draw(st.sampled_from([10, 89, 90, 91, 150]))
            li.append(
                (ok, 1, sk, lineno, 1.0, 1.0, 0.0, 0.0, "N", "O",
                 d0 + dt.timedelta(days=days))
            )
    supp = [(k, f"Supplier#{k}", 1, 0.0) for k in (10, 11, 12)]
    tmp = Path(tempfile.mkdtemp(prefix="q21prop_"))
    try:
        _write_q21_fixture(spark, tmp, orders, li, supp)
        got = {
            r.s_name: r.numwait
            for r in q21_sole_late_supplier(spark, str(tmp)).collect()
        }
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    want = {
        f"Supplier#{sk}": n for sk, n in _q21_brute(orders, li).items()
    }
    assert got == want


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(data=st.data())
def test_q2_decorrelation_matches_bruteforce_min(spark, data):
    """The per-part window-min decorrelation == the literal correlated
    min-subquery semantics, ties kept — random costs (engineered tie
    clusters), suppliers split across an in-region and an out-of-region
    nation, parts split across the filtered and unfiltered size."""
    import datetime as dt
    import shutil
    import tempfile
    from pathlib import Path

    from etl_end_to_end_airflow_bigquery_spark.plans.queries_olap import (
        Q2_REGION,
        Q2_SIZE,
        q2_min_cost_supplier,
    )

    n_li = data.draw(st.integers(min_value=1, max_value=12))
    li = []
    for i in range(n_li):
        li.append(
            (
                i,                                       # orderkey (unused)
                data.draw(st.integers(min_value=1, max_value=3)),   # partkey
                data.draw(st.integers(min_value=10, max_value=13)), # suppkey
                1, 1.0,
                float(data.draw(st.sampled_from([5.0, 5.0, 7.5, 9.0]))),
                0.0, 0.0, "N", "O", dt.datetime(1995, 1, 1),
            )
        )
    # suppliers 10,11 in-region (nation 1 -> region 1 EUROPE); 12,13 out
    supp = [(10, "S10", 1, 3.0), (11, "S11", 1, 2.0),
            (12, "S12", 2, 9.0), (13, "S13", 2, 9.0)]
    nation = [(1, "N1", 1), (2, "N2", 2)]
    region = [(1, Q2_REGION), (2, "ASIA")]
    part = [(1, "P1", "B", "PROMO", Q2_SIZE, 1.0),
            (2, "P2", "B", "PROMO", Q2_SIZE, 1.0),
            (3, "P3", "B", "PROMO", Q2_SIZE + 1, 1.0)]
    tmp = Path(tempfile.mkdtemp(prefix="q2prop_"))
    try:
        spark.createDataFrame(
            li,
            "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int, "
            "l_quantity double, l_extendedprice double, l_discount double, "
            "l_tax double, l_returnflag string, l_linestatus string, "
            "l_shipdate timestamp_ntz",
        ).write.parquet(str(tmp / "lineitem.parquet"))
        spark.createDataFrame(
            supp, "s_suppkey long, s_name string, s_nationkey long, s_acctbal double"
        ).write.parquet(str(tmp / "supplier.parquet"))
        spark.createDataFrame(
            nation, "n_nationkey long, n_name string, n_regionkey long"
        ).write.parquet(str(tmp / "nation.parquet"))
        spark.createDataFrame(
            region, "r_regionkey long, r_name string"
        ).write.parquet(str(tmp / "region.parquet"))
        spark.createDataFrame(
            part,
            "p_partkey long, p_name string, p_brand string, p_type string, "
            "p_size int, p_retailprice double",
        ).write.parquet(str(tmp / "part.parquet"))
        got = {
            (r.p_partkey, r.s_name, r.best_price)
            for r in q2_min_cost_supplier(spark, str(tmp)).collect()
        }
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    # brute force: per (part, in-region supplier) min cost; keep every
    # supplier hitting the part-wide min; only size-filtered parts
    in_region = {10: "S10", 11: "S11"}
    cost: dict[tuple[int, int], float] = {}
    for row in li:
        pk, sk, price = row[1], row[2], row[5]
        if sk in in_region:
            key = (pk, sk)
            cost[key] = min(cost.get(key, price), price)
    want = set()
    for pk in (1, 2):  # size-5 parts only
        pmins = [c for (p, _), c in cost.items() if p == pk]
        if not pmins:
            continue
        pmin = min(pmins)
        for (p, sk), c in cost.items():
            if p == pk and c == pmin:
                want.add((pk, in_region[sk], pmin))
    assert got == want
