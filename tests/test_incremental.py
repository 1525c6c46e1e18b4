"""Incremental aggregate maintenance == full recompute, bit-for-bit,
under any batch arrival order."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_end_to_end_airflow_bigquery_spark.operators.incremental import (
    finish_avg,
    merge_avg_state,
    partial_avg_state,
    signed_partial_state,
)

SF_DIR = "/root/testdata/sf0.01"
KEYS = ["report_date", "event_type"]


def _events(spark):
    from etl_end_to_end_airflow_bigquery_spark.sources.events import load_events

    return load_events(spark, SF_DIR).select(
        F.to_date("ts").alias("report_date"), "event_type", "value", "event_id"
    )


def test_incremental_equals_full_recompute(spark):
    ev = _events(spark)
    full = finish_avg(partial_avg_state(ev, KEYS, "value"))

    # arbitrary 3-way batch split (hash on event_id), applied incrementally
    batches = [ev.filter(F.pmod(F.hash("event_id"), F.lit(3)) == i) for i in range(3)]
    state = partial_avg_state(batches[0], KEYS, "value")
    for b in batches[1:]:
        state = merge_avg_state(state, partial_avg_state(b, KEYS, "value"), KEYS)
    inc = finish_avg(state)

    key = KEYS + ["sum_u", "n", "avg_value"]
    a = sorted(tuple(r) for r in full.select(*key).collect())
    b = sorted(tuple(r) for r in inc.select(*key).collect())
    assert a == b  # exact: scaled-int state is associative


def test_late_batch_only_touches_its_groups(spark):
    ev = _events(spark)
    state0 = partial_avg_state(ev, KEYS, "value")
    # a late batch for ONE (day, type) group
    one = ev.orderBy("report_date", "event_type").limit(1)
    late = one.select("report_date", "event_type",
                      (F.col("value") * 2).alias("value"), "event_id")
    merged = merge_avg_state(
        state0, partial_avg_state(late, KEYS, "value"), KEYS
    )
    changed = (
        merged.alias("m")
        .join(state0.alias("s"), KEYS)
        .filter("m.n <> s.n OR m.sum_u <> s.sum_u")
        .count()
    )
    assert changed == 1  # exactly the late group restates
    assert merged.count() == state0.count()


def test_retraction_deltas_equal_post_cdc_recompute(spark):
    """Update/delete retractions (VERDICT r06 item 6): stored state ⊕
    signed CDC deltas lands bit-identically on a full recompute of the
    post-CDC table."""
    ev = _events(spark)
    stored = partial_avg_state(ev, KEYS, "value")

    # CDC: delete every 5th event, double the value of every 7th
    h = F.pmod(F.hash("event_id"), F.lit(35))
    deletes = ev.filter(h % 5 == 0).withColumn("__w", F.lit(-1))
    upd = ev.filter((h % 7 == 0) & (h % 5 != 0))
    cdc = deletes.unionByName(
        upd.withColumn("__w", F.lit(-1))
    ).unionByName(
        upd.withColumn("value", F.col("value") * 2).withColumn("__w", F.lit(1))
    )
    merged = merge_avg_state(
        stored, signed_partial_state(cdc, KEYS, "value"), KEYS
    ).filter(F.col("n") > 0)

    post = ev.filter(h % 5 != 0).withColumn(
        "value",
        F.when(h % 7 == 0, F.col("value") * 2).otherwise(F.col("value")),
    )
    expect = partial_avg_state(post, KEYS, "value")

    cols = KEYS + ["sum_u", "n"]
    a = sorted(tuple(r) for r in merged.select(*cols).collect())
    b = sorted(tuple(r) for r in expect.select(*cols).collect())
    assert a == b


def test_fully_retracted_group_exits_the_view(spark):
    """Retracting every row of a group drives its count to zero; the
    n > 0 filter removes it from the maintained view."""
    rows = [("a", 1.0), ("a", 3.0), ("b", 2.0)]
    base = spark.createDataFrame(rows, "k string, value double")
    stored = partial_avg_state(base, ["k"], "value")
    cdc = spark.createDataFrame(
        [("a", 1.0, -1), ("a", 3.0, -1)], "k string, value double, __w int"
    )
    merged = merge_avg_state(
        stored, signed_partial_state(cdc, ["k"], "value"), ["k"]
    ).filter(F.col("n") > 0)
    got = {(r.k, r.sum_u, r.n) for r in merged.collect()}
    assert got == {("b", 2_000_000, 1)}


def test_null_valued_retraction_is_a_noop(spark):
    """ADVICE r7: a NULL-valued CDC row contributes to NEITHER sum_u nor
    n — matching partial_avg_state's count(value) semantics — so
    retracting it leaves the maintained average untouched instead of
    silently decrementing the count."""
    base = spark.createDataFrame(
        [("a", 1.0), ("a", None), ("a", 3.0)], "k string, value double"
    )
    stored = partial_avg_state(base, ["k"], "value")
    # retract the NULL row (e.g. a late correction deleting it)
    cdc = spark.createDataFrame(
        [("a", None, -1)], "k string, value double, __w int"
    )
    merged = merge_avg_state(
        stored, signed_partial_state(cdc, ["k"], "value"), ["k"]
    )
    got = {(r.k, r.sum_u, r.n) for r in merged.collect()}
    assert got == {("a", 4_000_000, 2)}  # unchanged: NULL never counted


def test_versioned_fold_replay_is_idempotent(spark, tmp_path):
    """foreachBatch's at-least-once window: re-delivering the same
    micro-batch must recompute its state version identically instead of
    folding twice (fold_signed_batch_versioned keys the output version
    by batch id and overwrites)."""
    import os

    from pyspark.sql import functions as F

    from etl_end_to_end_airflow_bigquery_spark.operators.incremental import (
        fold_signed_batch_versioned,
        merge_avg_state,
        partial_avg_state,
        signed_partial_state,
    )

    base = spark.createDataFrame(
        [("A", 10.0), ("A", 20.0), ("B", 5.0)], "seg string, v double"
    )
    prev = str(tmp_path / "state_init")
    partial_avg_state(base, ["seg"], "v").write.parquet(prev)

    cdc = spark.createDataFrame(
        [("A", 10.0, -1), ("B", 7.0, 1)], "seg string, v double, __w int"
    )
    delta = signed_partial_state(cdc, ["seg"], "v")
    nxt = str(tmp_path / "state_b0")

    fold_signed_batch_versioned(spark, delta, ["seg"], prev, nxt)
    once = sorted(
        spark.read.parquet(nxt).collect(), key=lambda r: r.seg
    )
    # redeliver the SAME batch → same version recomputed, not re-folded
    fold_signed_batch_versioned(spark, delta, ["seg"], prev, nxt)
    twice = sorted(
        spark.read.parquet(nxt).collect(), key=lambda r: r.seg
    )
    assert once == twice
    got = {r.seg: (r.sum_u, r.n) for r in twice}
    assert got["A"] == (20_000_000, 1)   # 10 retracted from {10, 20}
    assert got["B"] == (12_000_000, 2)   # 5 + inserted 7


def test_latest_committed_state_survives_restart(spark, tmp_path):
    """ADVICE r9: the previous-version lookup must come from DISK, not
    driver memory — after a restart, a replayed batch k must fold onto
    the committed version < k its first delivery saw, and a half-written
    version (no _SUCCESS marker) must be invisible."""
    import os

    from etl_end_to_end_airflow_bigquery_spark.operators.incremental import (
        fold_signed_batch_versioned,
        latest_committed_state,
        partial_avg_state,
        signed_partial_state,
    )

    base_dir = str(tmp_path)
    init = os.path.join(base_dir, "state_init")
    base = spark.createDataFrame(
        [("A", 10.0), ("B", 5.0)], "seg string, v double"
    )
    partial_avg_state(base, ["seg"], "v").write.parquet(init)

    # no versions yet → the initial build, from any process
    assert latest_committed_state(base_dir, init) == init
    assert latest_committed_state(base_dir, init, below=3) == init

    d0 = signed_partial_state(
        spark.createDataFrame([("A", 2.0, 1)], "seg string, v double, __w int"),
        ["seg"], "v",
    )
    b0 = os.path.join(base_dir, "state_b0")
    fold_signed_batch_versioned(spark, d0, ["seg"], init, b0)
    d2 = signed_partial_state(
        spark.createDataFrame([("B", 3.0, 1)], "seg string, v double, __w int"),
        ["seg"], "v",
    )
    b2 = os.path.join(base_dir, "state_b2")  # batch 1 was empty: gap
    fold_signed_batch_versioned(spark, d2, ["seg"], b0, b2)

    # a FRESH process (no in-memory map) replaying batch 2 resolves b0
    assert latest_committed_state(base_dir, init, below=2) == b0
    # and the final read resolves the newest committed version
    assert latest_committed_state(base_dir, init) == b2

    # a crashed fold leaves no _SUCCESS → invisible to the lookup
    half = os.path.join(base_dir, "state_b5")
    os.makedirs(half)
    assert latest_committed_state(base_dir, init) == b2
    assert latest_committed_state(base_dir, init, below=6) == b2
