"""Structured Streaming layer (T1-T5): file-source payload ingest with
availableNow, exactly-once re-runs, windowed report with merge sink."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from etl_end_to_end_airflow_bigquery_spark.operators.writers import read_table
from etl_end_to_end_airflow_bigquery_spark.streaming import (
    daily_report_stream,
    stream_payloads,
    streaming_report_to_merge,
)
from etl_end_to_end_airflow_bigquery_spark.streaming.ingest import write_ticks


def _drop_payload(payload_dir, name, date, rates):
    payload_dir.mkdir(parents=True, exist_ok=True)
    (payload_dir / f"{name}.json").write_text(
        json.dumps({"amount": 1.0, "base": "EUR", "date": date, "rates": rates})
    )


def test_stream_ingest_available_now_exactly_once(spark, tmp_path):
    pdir = tmp_path / "payloads"
    raw = str(tmp_path / "raw")
    ckpt = str(tmp_path / "ckpt")
    _drop_payload(pdir, "t1", "2026-01-05", {"USD": 1.1, "GBP": 0.8})

    q = write_ticks(stream_payloads(spark, str(pdir)), raw, ckpt)
    q.awaitTermination(120)
    assert spark.read.parquet(raw).count() == 2

    # re-running with the same checkpoint reprocesses nothing (T5/catchup)
    q = write_ticks(stream_payloads(spark, str(pdir)), raw, ckpt)
    q.awaitTermination(120)
    assert spark.read.parquet(raw).count() == 2

    # a new payload file is picked up incrementally
    _drop_payload(pdir, "t2", "2026-01-06", {"USD": 1.2})
    q = write_ticks(stream_payloads(spark, str(pdir)), raw, ckpt)
    q.awaitTermination(120)
    assert spark.read.parquet(raw).count() == 3


def test_streaming_daily_report_merge_sink(spark, tmp_path):
    pdir = tmp_path / "payloads"
    rep = str(tmp_path / "report")
    ckpt = str(tmp_path / "ckpt_rep")
    _drop_payload(pdir, "d1", "2026-01-05", {"USD": 1.0})
    _drop_payload(pdir, "d2", "2026-01-05", {"USD": 3.0})
    _drop_payload(pdir, "d3", "2026-01-06", {"USD": 5.0})

    ticks = stream_payloads(spark, str(pdir))
    report = daily_report_stream(ticks)
    q = streaming_report_to_merge(spark, report, rep, ckpt)
    q.awaitTermination(120)

    got = {str(r.date)[:10]: r.avg_rate for r in read_table(spark, rep).collect()}
    # note: the two Jan-5 payloads dedup to ONE tick (same (date, pair)
    # within the watermark — T4), so the day's average is the first tick
    assert set(got) == {"2026-01-05", "2026-01-06"}
    assert got["2026-01-06"] == 5.0

    # late re-run with an additional day merges in without disturbing old rows
    _drop_payload(pdir, "d4", "2026-01-07", {"USD": 7.0})
    ticks = stream_payloads(spark, str(pdir))
    q = streaming_report_to_merge(spark, daily_report_stream(ticks), rep, ckpt)
    q.awaitTermination(120)
    got2 = {str(r.date)[:10]: r.avg_rate for r in read_table(spark, rep).collect()}
    assert got2["2026-01-07"] == 7.0 and got2["2026-01-06"] == 5.0


def test_gate_queries_leave_session_conf_untouched(spark):
    """VERDICT r02 item 7: streaming gate queries must not leak session
    conf — the UTC pin is scoped (restored on exit) and the legacy nanos
    flag is only ever set for legacy nanos files (never on current µs
    data)."""
    from etl_end_to_end_airflow_bigquery_spark.plans.queries_stream import (
        streaming_dedup_events,
    )

    tz_before = spark.conf.get("spark.sql.session.timeZone")
    nanos_before = spark.conf.get(
        "spark.sql.legacy.parquet.nanosAsLong", None
    )
    streaming_dedup_events(spark, "/root/testdata/sf0.001").collect()
    assert spark.conf.get("spark.sql.session.timeZone") == tz_before
    assert (
        spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", None)
        == nanos_before
    )


def test_streaming_burst_pairs_matches_batch(spark):
    """The bin-bucketed pure-range stream-stream join must emit exactly
    the pair set the batch plan finds (±60 s, closed bounds, self
    excluded)."""
    from pyspark.sql import functions as F

    from etl_end_to_end_airflow_bigquery_spark.plans.queries_stream import (
        streaming_burst_pairs,
    )
    from etl_end_to_end_airflow_bigquery_spark.sources.events import (
        load_events,
    )

    sf = "/root/testdata/sf0.001"
    got = sorted(
        (r.a_id, r.b_id) for r in streaming_burst_pairs(spark, sf).collect()
    )
    ev = load_events(spark, sf).select(
        "event_id", F.col("ts").cast("timestamp").alias("ts")
    )
    a = ev.select(F.col("event_id").alias("a_id"), F.col("ts").alias("a_ts"))
    b = ev.select(F.col("event_id").alias("b_id"), F.col("ts").alias("b_ts"))
    want = sorted(
        (r.a_id, r.b_id)
        for r in a.join(
            b,
            (F.col("b_ts") >= F.col("a_ts") - F.expr("INTERVAL 60 SECONDS"))
            & (F.col("b_ts") <= F.col("a_ts") + F.expr("INTERVAL 60 SECONDS"))
            & (F.col("a_id") != F.col("b_id")),
        ).collect()
    )
    assert got == want and len(got) > 0


def test_report_merge_batch_replay_idempotent(spark, tmp_path):
    """VERDICT r05 item 6: foreachBatch is at-least-once — a batch can
    be re-delivered after recovery. Applying the SAME (batch_id, df)
    twice must leave the report table equal to the once-applied state
    (the streaming analog of the reference's idempotent load,
    ``dags/idempotent_fx_pipeline.py:73-87``)."""
    from etl_end_to_end_airflow_bigquery_spark.streaming import (
        report_merge_batch,
    )

    rep = str(tmp_path / "replay_report")
    merge = report_merge_batch(spark, rep)
    batch1 = spark.createDataFrame(
        [("2026-01-05", "EUR", "USD", 1.1), ("2026-01-05", "EUR", "GBP", 0.8)],
        "date string, from_cur string, to_cur string, avg_rate double",
    ).withColumn("date", F.to_timestamp("date"))

    merge(batch1, 0)
    once = sorted(map(tuple, read_table(spark, rep).collect()))
    merge(batch1, 0)  # redelivery of the identical batch
    assert sorted(map(tuple, read_table(spark, rep).collect())) == once

    # a later batch that UPDATES one key and ADDS one, replayed twice:
    # converges to the same state as a single delivery
    batch2 = spark.createDataFrame(
        [("2026-01-05", "EUR", "USD", 1.2), ("2026-01-06", "EUR", "USD", 1.3)],
        "date string, from_cur string, to_cur string, avg_rate double",
    ).withColumn("date", F.to_timestamp("date"))
    merge(batch2, 1)
    twice_state = sorted(map(tuple, read_table(spark, rep).collect()))
    merge(batch2, 1)
    assert sorted(map(tuple, read_table(spark, rep).collect())) == twice_state
    got = {
        (str(r.date)[:10], r.to_cur): r.avg_rate
        for r in read_table(spark, rep).collect()
    }
    assert got == {
        ("2026-01-05", "USD"): 1.2,
        ("2026-01-05", "GBP"): 0.8,
        ("2026-01-06", "USD"): 1.3,
    }

    # an empty re-delivery (fully-filtered batch) is a no-op
    merge(batch2.limit(0), 2)
    assert sorted(map(tuple, read_table(spark, rep).collect())) == twice_state


def test_state_reader_metadata_and_agg_state(spark, tmp_path):
    """Spark 4 state-store batch sources: state-metadata lists the
    operator, statestore returns its keyed state, and for a streaming
    aggregation the state IS the aggregate (count per key here)."""
    from etl_end_to_end_airflow_bigquery_spark.streaming.state_reader import (
        read_state,
        state_keys,
        state_metadata,
    )

    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt_state")
    spark.createDataFrame(
        [(1, "a"), (1, "b"), (2, "c")], "k long, v string"
    ).write.parquet(src)
    stream = spark.readStream.schema("k long, v string").parquet(src)
    q = (
        stream.groupBy("k")
        .count()
        .writeStream.format("noop")
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    meta = state_metadata(spark, ckpt)
    ops = {(r.operatorId, r.operatorName) for r in meta.collect()}
    assert (0, "stateStoreSave") in ops

    st = read_state(spark, ckpt, operator_id=0)
    got = {(r.key.k, r.value["count"]) for r in st.collect()}
    assert got == {(1, 2), (2, 1)}
    assert sorted(r.k for r in state_keys(spark, ckpt).collect()) == [1, 2]
