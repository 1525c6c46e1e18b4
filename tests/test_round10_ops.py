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


# ---------------------------------------------------------------- wave 2


def test_bfs_levels_matches_brute_force(spark):
    """Level-synchronous BFS vs a driver-side Dijkstra-on-unit-weights
    over a hand-built graph with a cycle, a chain longer than the hop
    cap, and an isolated seed."""
    from etl_end_to_end_airflow_bigquery_spark.operators.dedup import (
        bfs_levels,
    )

    edges = [(1, 2), (2, 3), (3, 4), (4, 5), (5, 6), (6, 7), (7, 8),
             (2, 9), (9, 10), (10, 1),   # cycle back to seed
             (20, 21)]                   # far component, unreachable
    pairs = spark.createDataFrame(edges, "doc_a long, doc_b long")
    seeds = spark.createDataFrame([(1,), (30,)], "node long")  # 30 isolated
    got = {r.node: r.dist for r in bfs_levels(pairs, seeds, 4).collect()}

    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    want = {1: 0, 30: 0}
    frontier = {1}
    for d in range(1, 5):
        frontier = {
            n for f in frontier for n in adj.get(f, ())
        } - set(want)
        for n in frontier:
            want[n] = d
    assert got == want
    assert 6 not in got  # beyond the 4-hop cap
    assert 20 not in got  # disconnected component never reached


def test_time_weighted_avg_hand_case(spark, tmp_path):
    """Two samples at 00:00 and 18:00 with values 1.00 and 5.00: the
    plain mean is 3.0 but the time-weighted mean is
    (1*18h + 5*6h)/24h = 2.0 — the operator must weight by holding
    time, carrying the last sample to midnight."""
    from etl_end_to_end_airflow_bigquery_spark.plans.queries_olap import (
        time_weighted_avg_daily,
    )

    rows = [
        (1, "2024-01-01 00:00:00", 7, "click", 1.0, "{}"),
        (2, "2024-01-01 18:00:00", 7, "click", 5.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts string, user_id long, event_type string,"
        " value double, props string",
    ).withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    df.write.parquet(os.path.join(str(tmp_path), "events.parquet"))
    out = time_weighted_avg_daily(spark, str(tmp_path)).collect()
    assert len(out) == 1
    assert out[0].twa_value == 2.0
    assert out[0].n_samples == 2


def test_counter_rate_undercounts_hidden_reset(spark, tmp_path):
    """When the scrape grid misses a midnight reset AND the new day
    overtakes the previous reading, the fold must report the
    Prometheus answer (the positive delta, undercounting the reset)
    with n_resets = 0 — not the true total."""
    from etl_end_to_end_airflow_bigquery_spark.plans.queries_olap import (
        counter_rate_resets,
    )

    # user 7: day1 has events v=2.0 each at ids 3,4,5 (retained: 3);
    # day2 events at ids 6,7,8,9 v=3.0 (retained: 6,9).
    # Counters: day1 cum at id3 = 2.0; day2 cum at id6 = 3.0, id9 = 12.0.
    # Retained stream: 2.0 -> 3.0 -> 12.0: deltas +1.0, +9.0; no reset
    # seen, first sample contributes 2.0 => total 12.0 (true total 14.0).
    rows = [
        (3, "2024-01-01 01:00:00", 7, "click", 2.0, "{}"),
        (4, "2024-01-01 02:00:00", 7, "click", 2.0, "{}"),
        (5, "2024-01-01 03:00:00", 7, "click", 2.0, "{}"),
        (6, "2024-01-02 01:00:00", 7, "click", 3.0, "{}"),
        (7, "2024-01-02 02:00:00", 7, "click", 3.0, "{}"),
        (8, "2024-01-02 03:00:00", 7, "click", 3.0, "{}"),
        (9, "2024-01-02 04:00:00", 7, "click", 3.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts string, user_id long, event_type string,"
        " value double, props string",
    ).withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    df.write.parquet(os.path.join(str(tmp_path), "events.parquet"))
    out = counter_rate_resets(spark, str(tmp_path)).collect()
    assert len(out) == 1
    r = out[0]
    assert r.n_samples == 3
    assert r.n_resets == 0
    assert r.total_increase == 12.0


def test_counter_rate_detects_visible_reset(spark, tmp_path):
    """When the post-midnight reading is BELOW the previous scrape the
    reset is visible: contribution = current reading, n_resets = 1."""
    from etl_end_to_end_airflow_bigquery_spark.plans.queries_olap import (
        counter_rate_resets,
    )

    # Retained (id%3==0): day1 cum 6.0 (id 3 after 2.0+2.0+2.0);
    # day2 first retained cum 1.0 < 6.0 -> reset, contributes 1.0.
    rows = [
        (1, "2024-01-01 01:00:00", 7, "click", 2.0, "{}"),
        (2, "2024-01-01 02:00:00", 7, "click", 2.0, "{}"),
        (3, "2024-01-01 03:00:00", 7, "click", 2.0, "{}"),
        (6, "2024-01-02 01:00:00", 7, "click", 1.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts string, user_id long, event_type string,"
        " value double, props string",
    ).withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    df.write.parquet(os.path.join(str(tmp_path), "events.parquet"))
    r = counter_rate_resets(spark, str(tmp_path)).collect()[0]
    assert (r.n_samples, r.n_resets, r.total_increase) == (2, 1, 7.0)


def test_cdc_apply_resurrect_and_terminal_delete(spark, tmp_path):
    """Key 42 (%3,%6,%7,%14 all hit): the seq-5 update must outlive the
    seq-4 delete. Key 13 (%13 only): the seq-3 delete is terminal."""
    from etl_end_to_end_airflow_bigquery_spark.plans.queries_olap import (
        cdc_out_of_order_apply,
    )

    rows = [(42, 1, "O", 100.0, "2024-01-01 00:00:00", "P1"),
            (13, 2, "O", 50.0, "2024-01-01 00:00:00", "P1"),
            (5, 3, "O", 10.0, "2024-01-01 00:00:00", "P1")]
    df = spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate string, o_orderpriority string",
    ).withColumn("o_orderdate", F.col("o_orderdate").cast("timestamp"))
    df.write.parquet(os.path.join(str(tmp_path), "orders.parquet"))
    got = {r.o_orderkey: r for r in
           cdc_out_of_order_apply(spark, str(tmp_path)).collect()}
    assert 13 not in got                      # terminal delete
    assert got[42].final_status == "P7"       # seq 5 beats the seq-4 delete
    assert got[42].final_price == 300.0
    assert got[42].winning_seq == 5
    assert got[42].n_versions == 5            # I + seq 2,1 (%3,%6) + seq 5,4 (%7,%14)
    assert got[5].final_status == "O"         # untouched key keeps insert
    assert got[5].n_versions == 1


def test_hll_day_merge_equals_direct(spark):
    """Register-wise MAX over day slices must equal the direct
    whole-period registers — the mergeability law on a small frame."""
    from etl_end_to_end_airflow_bigquery_spark.operators.sketch import (
        hll_est_from_registers,
        hll_ranked,
    )

    rows = [(i % 97, "t", f"2024-01-{(i % 9) + 1:02d}") for i in range(400)]
    df = spark.createDataFrame(rows, "user_id long, g string, d string")
    direct = (
        hll_ranked(df, "user_id", ["g"])
        .groupBy("g", "reg").agg(F.max("rank").alias("mx"))
    )
    merged = (
        hll_ranked(df, "user_id", ["g", "d"])
        .groupBy("g", "d", "reg").agg(F.max("rank").alias("mx"))
        .groupBy("g", "reg").agg(F.max("mx").alias("mx"))
    )
    e1 = hll_est_from_registers(direct, ["g"]).collect()[0].hll_estimate
    e2 = hll_est_from_registers(merged, ["g"]).collect()[0].hll_estimate
    assert e1 == e2  # bit-identical, not approximately


def test_quantile_cascade_matches_sorted_list(spark, tmp_path):
    """Histogram-walk cuts vs a driver-side sorted list on a small
    skewed sample (ceil(p*n) disc semantics, 2-dp quantization)."""
    import math

    from etl_end_to_end_airflow_bigquery_spark.plans.queries_olap import (
        quantile_rollup_cascade,
    )

    vals = [0.01 * (i ** 2 % 157) for i in range(101)]
    rows = [
        (i, f"2024-01-01 {i % 24:02d}:{i % 60:02d}:00", 1, "click", v, "{}")
        for i, v in enumerate(vals)
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts string, user_id long, event_type string,"
        " value double, props string",
    ).withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    df.write.parquet(os.path.join(str(tmp_path), "events.parquet"))
    out = quantile_rollup_cascade(spark, str(tmp_path)).collect()
    assert len(out) == 1
    cents = sorted(int(math.floor(v * 100 + 0.5)) for v in vals)
    n = len(cents)
    for col, p in (("p50", 50), ("p90", 90), ("p99", 99)):
        want = cents[(p * n + 99) // 100 - 1] / 100.0
        assert getattr(out[0], col) == want, col


def test_partition_pruned_scan_plan_prunes(spark):
    """BOTH date bounds must sit in PartitionFilters with DataFilters
    EMPTY — the catalog-level pruning mechanism itself, so a regression
    that demotes the range to a post-scan data filter (scanning all ~31
    day directories) fails even though the row counts would still
    match. The written layout must hold one parquet file per day
    directory (the small-files discipline the docstring claims)."""
    import glob
    import re

    from etl_end_to_end_airflow_bigquery_spark.plans.queries_olap import (
        partition_pruned_scan,
    )

    df = partition_pruned_scan(spark, SF_ORACLE)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    scan_lines = [
        ln for ln in plan.split("\n")
        if "FileScan parquet" in ln or "Scan parquet" in ln
    ]
    assert scan_lines, plan
    scan = scan_lines[0]
    pf = re.search(r"PartitionFilters: \[([^\]]*)\]", scan)
    assert pf, scan
    assert "event_date" in pf.group(1)
    assert ">= 2024-01-08" in pf.group(1) and "<= 2024-01-14" in pf.group(1)
    dfil = re.search(r"DataFilters: \[([^\]]*)\]", scan)
    assert dfil and dfil.group(1).strip() == "", scan  # nothing post-scan
    # layout: one file per day directory
    loc = re.search(r"InMemoryFileIndex\(\d+ paths\)\[file:([^\]]+)\]", scan)
    assert loc, scan
    day_dirs = glob.glob(loc.group(1) + "/event_date=*")
    assert len(day_dirs) > 7  # many more days on disk than the range reads
    for d in day_dirs:
        assert len(glob.glob(d + "/*.parquet")) == 1  # ...one file each
    assert df.count() == 35  # 7 days x 5 event types at sf0.01


def test_er_closure_merges_second_generation_variant(spark, tmp_path):
    """Base ~ V1 (1 edit) and V1 ~ V2 (1 edit) but base !~ V2 (2
    edits): the cluster must still merge all three — transitive
    closure, not pairwise matching — and survivorship must pick the
    highest composed ordkey (same cents -> highest key wins)."""
    from etl_end_to_end_airflow_bigquery_spark.plans.queries_olap import (
        er_golden_record,
    )

    rows = [
        (21, "Customer#000000021", 3, 100.00, "BUILDING"),  # %7 and %21
        (22, "Customer#000000022", 3, 100.00, "BUILDING"),  # same block, 1 edit from 21 -- but base-base pair
        (5, "Customer#000000005", 9, 50.00, "AUTOMOBILE"),  # no variants
    ]
    df = spark.createDataFrame(
        rows,
        "c_custkey long, c_name string, c_nationkey long,"
        " c_acctbal double, c_mktsegment string",
    )
    df.write.parquet(os.path.join(str(tmp_path), "customer.parquet"))
    out = {r.cluster_id: r for r in
           er_golden_record(spark, str(tmp_path)).collect()}
    # cluster of 21 (record ids: base 84, V1 85, V2 86, plus base 22 ->
    # 88, same nation+cents block at levenshtein 1 from 21); V2 reaches
    # the cluster only through V1 (2 edits from base) — pure closure
    assert 84 in out
    c = out[84]
    assert c.n_members == 4
    assert c.golden_key == 88            # same cents -> max record key
    assert c.golden_name == "Customer#000000022"
    # customer 5 (record 20) has no variants and no block-mates: no
    # cluster at all
    assert 20 not in out and len(out) == 1


def test_corpus_drift_empty_half_reports_no_drift(spark, tmp_path):
    """A corpus whose docs are all even-id (one side empty) must return
    an empty drift report, not a division error."""
    from etl_end_to_end_airflow_bigquery_spark.plans.queries_ext import (
        corpus_drift_chi2,
    )

    rows = [(2, " ".join(["tok"] * 25), "en", "s", 0)]
    _write_docs(spark, rows, str(tmp_path))
    assert corpus_drift_chi2(spark, str(tmp_path)).count() == 0


def test_latest_wins_merge_tombstone_beats_late_update(spark):
    """A delete tombstone at seq 4 already in state must defeat a
    LATER-ARRIVING batch carrying seq 3 for the same key (transport
    reorder across micro-batches) — and lose to a later seq-5 update
    arriving after that. Exercises the associativity the shared-oracle
    gate certifies, at the single-fold grain."""
    from etl_end_to_end_airflow_bigquery_spark.operators.incremental import (
        latest_wins_merge,
    )

    schema = (
        "o_orderkey long,"
        " win struct<seq:bigint,op:string,status:string,price:double>,"
        " n_versions bigint"
    )
    state = spark.createDataFrame(
        [(1, (4, "D", None, None), 2)], schema
    )
    late_update = spark.createDataFrame(
        [(1, (3, "U", "OLD", 9.0), 1)], schema
    )
    s1 = latest_wins_merge(state, late_update)
    (r,) = s1.collect()
    assert (r.win.seq, r.win.op, r.n_versions) == (4, "D", 3)  # tombstone holds
    resurrect = spark.createDataFrame(
        [(1, (5, "U", "NEW", 11.0), 1)], schema
    )
    (r2,) = latest_wins_merge(s1, resurrect).collect()
    assert (r2.win.seq, r2.win.op, r2.win.status, r2.n_versions) == (
        5, "U", "NEW", 4
    )
