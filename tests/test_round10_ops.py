"""Round-10 operator unit tests: properties the gate's corpus can't
pin down — containment asymmetry vs Jaccard, packing feasibility,
trailing-window brute-force equivalence, cascade losslessness, robust
stats on hand-computed values, bucketed-join plan shape."""

from __future__ import annotations

import os
import tempfile

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_ORACLE


def _write_docs(spark, rows, d):
    df = spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    df.write.parquet(os.path.join(d, "documents.parquet"))


def test_containment_catches_pair_jaccard_misses(spark):
    """A short doc fully embedded in a long one: containment ≈ 1 while
    Jaccard = |A|/|B| sits far below the near-dup cut — the asymmetric
    operator must flag it, with the smaller side as contained."""
    from etl_end_to_end_airflow_bigquery_spark.operators.dedup import (
        containment_pairs,
    )

    quote = "alpha beta gamma delta epsilon"
    filler = " ".join(f"w{i} x{i} y{i}" for i in range(30))
    rows = [
        (1, quote, "en", "s", 0),
        (2, f"{filler} {quote}", "en", "s", 0),
        (3, "totally unrelated text about nothing at all here", "en", "s", 0),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    got = {
        (r.doc_a, r.doc_b): (r.cont_a, r.cont_b, r.contained_id)
        for r in containment_pairs(docs).collect()
    }
    assert (1, 2) in got
    cont_a, cont_b, contained = got[(1, 2)]
    assert cont_a == 1.0          # every shingle of doc 1 is in doc 2
    assert cont_b < 0.5           # Jaccard-style symmetric view misses it
    assert contained == 1         # smaller shingle set is the contained side
    assert all(3 not in pair for pair in got)


def test_containment_df_cap_drops_boilerplate_shingles(spark):
    """Shingles shared by more than df_cap docs must not generate
    candidate pairs (the quadratic-blowup guard)."""
    from etl_end_to_end_airflow_bigquery_spark.operators.dedup import (
        containment_pairs,
    )

    # 5 docs all sharing one boilerplate sentence, otherwise disjoint
    rows = [
        (i, f"common legal header text u{i} v{i} w{i} z{i}", "en", "s", 0)
        for i in range(5)
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    # df_cap=2: the shared shingles appear in 5 docs -> dropped; the
    # per-doc unique shingles pair with nothing
    assert containment_pairs(docs, df_cap=2).count() == 0


def test_bin_pack_nextfit_feasible_and_greedy(spark):
    """Every bin fits the capacity unless it holds a single oversized
    doc; offsets tile each bin contiguously; bin ids are per-shard
    contiguous from 0."""
    from etl_end_to_end_airflow_bigquery_spark.plans.queries_ext import (
        PACK_NF_CAPACITY,
        bin_pack_nextfit,
    )

    with tempfile.TemporaryDirectory() as d:
        rows = [
            (i, " ".join(f"t{j}" for j in range(n)), "en", "s", 0)
            for i, n in enumerate(
                [300, 200, 150, 100, 90, 80, 70, 60, 50, 40, 30, 20, 10, 5, 0]
            )
        ]
        _write_docs(spark, rows, d)
        out = bin_pack_nextfit(spark, d).collect()
    by_bin: dict[tuple, list] = {}
    for r in out:
        by_bin.setdefault((r.shard, r.bin_id), []).append(r)
    for (_shard, _bin), docs in by_bin.items():
        total = sum(r.n_tokens for r in docs)
        if total > PACK_NF_CAPACITY:
            assert len(docs) == 1  # oversized doc alone, loudly visible
        docs.sort(key=lambda r: r.offset)
        fill = 0
        for r in docs:
            assert r.offset == fill
            fill += r.n_tokens
    for shard in {r.shard for r in out}:
        bins = sorted({r.bin_id for r in out if r.shard == shard})
        assert bins == list(range(len(bins)))


def test_trailing_active_users_matches_bruteforce(spark):
    from etl_end_to_end_airflow_bigquery_spark.plans.queries_olap import (
        trailing_active_users,
    )

    got = {
        r.report_d: (r.dau, r.wau, r.mau)
        for r in trailing_active_users(spark, SF_ORACLE).collect()
    }
    ev = spark.read.parquet(os.path.join(SF_ORACLE, "events.parquet"))
    pairs = {
        (r.d, r.user_id)
        for r in ev.select(
            F.to_date("ts").alias("d"), "user_id"
        ).distinct().collect()
    }
    days = sorted({d for d, _ in pairs})
    for rd in days:
        dau = len({u for d, u in pairs if d == rd})
        wau = len({u for d, u in pairs if 0 <= (rd - d).days < 7})
        mau = len({u for d, u in pairs if 0 <= (rd - d).days < 28})
        assert got[rd] == (dau, wau, mau)
    assert set(got) == set(days)


def test_rollup_cascade_is_lossless(spark):
    """hour→day re-merge must equal the direct day-grain aggregate on
    a frame with awkward values (negative, repeated, null)."""
    from etl_end_to_end_airflow_bigquery_spark.plans.queries_olap import (
        rollup_cascade_daily,
    )

    rows = [
        (1, "2024-01-01 00:10:00", 1, "a", -1.5, "{}"),
        (2, "2024-01-01 05:20:00", 1, "a", 2.25, "{}"),
        (3, "2024-01-01 23:59:59", 2, "a", 0.0, "{}"),
        (4, "2024-01-02 00:00:00", 2, "a", 7.125, "{}"),
        (5, "2024-01-01 12:00:00", 3, "b", 100.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts string, user_id long, event_type string,"
        " value double, props string",
    ).withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(os.path.join(d, "events.parquet"))
        out = {
            (str(r.day), r.event_type): (
                r.n_events, r.sum_value, r.avg_value, r.min_value, r.max_value
            )
            for r in rollup_cascade_daily(spark, d).collect()
        }
    assert out[("2024-01-01", "a")] == (3, 0.75, 0.25, -1.5, 2.25)
    assert out[("2024-01-02", "a")] == (1, 7.13, 7.125, 7.125, 7.125)
    assert out[("2024-01-01", "b")] == (1, 100.0, 100.0, 100.0, 100.0)


def test_robust_stats_hand_computed(spark):
    """Tiny single-group frame with known median/MAD/p10/p90."""
    from etl_end_to_end_airflow_bigquery_spark.plans.queries_olap import (
        robust_stats_orders,
    )

    # values 1..10 (one group 'O'): median 5.5, deviations from 5.5 are
    # .5,.5,1.5,1.5,...,4.5,4.5 -> MAD 2.5; p10 = ceil(0.1*10)=rank1 -> 1,
    # p90 = rank 9 -> 9; winsorized values clamp 10 -> 9: mean 5.4
    rows = [
        (i, 1, "O", float(i), "1996-01-01 00:00:00", "1-URGENT")
        for i in range(1, 11)
    ]
    df = spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate string, o_orderpriority string",
    ).withColumn("o_orderdate", F.col("o_orderdate").cast("timestamp"))
    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(os.path.join(d, "orders.parquet"))
        (r,) = robust_stats_orders(spark, d).collect()
    assert (r.median_price, r.mad, r.p10, r.p90, r.winsor_mean) == (
        5.5, 2.5, 1.0, 9.0, 5.4
    )


def test_bucketed_join_plan_has_no_join_exchange(spark):
    """The physical plan's SMJ must consume the bucketed scans without
    an Exchange on either side (the point of the layout)."""
    from etl_end_to_end_airflow_bigquery_spark.plans.queries_olap import (
        bucketed_colocated_join,
    )

    df = bucketed_colocated_join(spark, SF_ORACLE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    smj_at = plan.index("SortMergeJoin")
    below_join = plan[smj_at:]
    # the only exchanges sit ABOVE the join (final agg + sort)
    assert "Exchange" not in below_join
    assert "SortMergeJoin" in plan


def test_corpus_drift_chi2_zero_on_identical_halves(spark):
    """Even/odd halves with identical token distributions → every
    chi-square term is exactly 0 (D = O1·N − S1·t vanishes)."""
    from etl_end_to_end_airflow_bigquery_spark.plans.queries_ext import (
        corpus_drift_chi2,
    )

    text = " ".join(["tok"] * 25)  # one token, 25 occurrences per doc
    rows = [(i, text, "en", "s", 0) for i in range(4)]  # 2 even, 2 odd
    with tempfile.TemporaryDirectory() as d:
        _write_docs(spark, rows, d)
        out = corpus_drift_chi2(spark, d).collect()
    assert [(r.token, r.o1, r.o2, r.chi2) for r in out] == [
        ("tok", 50, 50, 0.0)
    ]


def test_streaming_rollup_state_versions_on_disk(spark):
    """The streaming cascade's committed state versions must be
    resolvable from disk alone (restart-safe lookup contract)."""
    from etl_end_to_end_airflow_bigquery_spark.plans.queries_stream import (
        streaming_rollup_cascade,
    )
    from etl_end_to_end_airflow_bigquery_spark.plans.queries_olap import (
        rollup_cascade_daily,
    )

    got = [tuple(r) for r in streaming_rollup_cascade(spark, SF_ORACLE).collect()]
    want = [tuple(r) for r in rollup_cascade_daily(spark, SF_ORACLE).collect()]
    assert got == want
