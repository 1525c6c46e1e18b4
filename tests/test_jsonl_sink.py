"""Manifest-committed JSONL sink (sources.jsonl_sink): the Spark 4
Python DataSource WRITER surface — batch + streaming writes, two-phase
manifest commit, exactly-once read view under batch re-delivery."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from etl_end_to_end_airflow_bigquery_spark.sources.jsonl_sink import (
    JsonlCommitDataSource,
    ShardCommitMessage,
    _commit_batch,
    read_jsonl_commit,
)


def _register(spark):
    spark.dataSource.register(JsonlCommitDataSource)


def test_batch_write_commit_and_readback(spark, tmp_path):
    _register(spark)
    path = str(tmp_path / "sink_batch")
    os.makedirs(path)
    df = spark.range(100).selectExpr("id AS k", "CAST(id * 2 AS STRING) AS v")
    df.write.format("jsonl_commit").mode("append").option("path", path).save()

    back = read_jsonl_commit(spark, path, schema="k long, v string")
    got = sorted((r.k, r.v) for r in back.collect())
    assert got == [(i, str(2 * i)) for i in range(100)]
    # staging left empty; manifest records the full row count
    assert os.listdir(os.path.join(path, "_staging")) == []
    mdir = os.path.join(path, "_manifest")
    (mf,) = os.listdir(mdir)
    assert json.load(open(os.path.join(mdir, mf)))["rows"] == 100


def test_two_sequential_batch_appends_accumulate(spark, tmp_path):
    """ADVICE r6 (medium): a second mode('append') write must ADD to the
    read view, not replace the first write's manifest and sweep its
    files (the old fixed batch_id=-1 behavior)."""
    _register(spark)
    path = str(tmp_path / "sink_append2")
    os.makedirs(path)
    a = spark.range(3).selectExpr("id AS k")
    b = spark.range(3, 5).selectExpr("id AS k")
    a.write.format("jsonl_commit").mode("append").option("path", path).save()
    b.write.format("jsonl_commit").mode("append").option("path", path).save()

    back = read_jsonl_commit(spark, path, schema="k long")
    assert sorted(r.k for r in back.collect()) == [0, 1, 2, 3, 4]
    mdir = os.path.join(path, "_manifest")
    assert len(os.listdir(mdir)) == 2  # one manifest per append


def test_batch_overwrite_replaces_prior_commits(spark, tmp_path):
    """mode('overwrite') leaves exactly the new write visible and
    removes the superseded manifests + shard files from disk."""
    _register(spark)
    path = str(tmp_path / "sink_overwrite")
    os.makedirs(path)
    spark.range(5).selectExpr("id AS k").write.format("jsonl_commit").mode(
        "append"
    ).option("path", path).save()
    spark.range(100, 102).selectExpr("id AS k").write.format(
        "jsonl_commit"
    ).mode("overwrite").option("path", path).save()

    back = read_jsonl_commit(spark, path, schema="k long")
    assert sorted(r.k for r in back.collect()) == [100, 101]
    mdir = os.path.join(path, "_manifest")
    assert len(os.listdir(mdir)) == 1
    shards = [f for f in os.listdir(path) if f.endswith(".jsonl")]
    committed = json.load(
        open(os.path.join(mdir, os.listdir(mdir)[0]))
    )["files"]
    assert sorted(shards) == sorted(committed)


def test_stream_write_available_now(spark, tmp_path):
    _register(spark)
    src = str(tmp_path / "src")
    path = str(tmp_path / "sink_stream")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(path)
    spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "k long, v string"
    ).write.parquet(src)
    stream = spark.readStream.schema("k long, v string").parquet(src)
    q = (
        stream.writeStream.format("jsonl_commit")
        .option("path", path)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    back = read_jsonl_commit(spark, path, schema="k long, v string")
    assert sorted((r.k, r.v) for r in back.collect()) == [
        (1, "a"), (2, "b"), (3, "c"),
    ]


def test_batch_redelivery_overwrites_manifest(spark, tmp_path):
    """At-least-once delivery: committing the SAME batch id twice (the
    foreachBatch recovery case) replaces that batch's manifest — the
    read view holds each batch exactly once and the superseded
    attempt's files are swept."""
    path = str(tmp_path / "sink_replay")
    staging = os.path.join(path, "_staging")
    os.makedirs(staging)

    def stage(name: str, rows: list[dict]) -> ShardCommitMessage:
        with open(os.path.join(staging, name), "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")
        return ShardCommitMessage(file=name, rows=len(rows))

    m1 = stage("shard-attempt1.jsonl", [{"k": 1}, {"k": 2}])
    _commit_batch(path, [m1], batch_id=7)
    # re-delivery of batch 7: different task file, same rows
    m2 = stage("shard-attempt2.jsonl", [{"k": 1}, {"k": 2}])
    _commit_batch(path, [m2], batch_id=7)

    back = read_jsonl_commit(spark, path, schema="k long")
    assert sorted(r.k for r in back.collect()) == [1, 2]
    assert not os.path.exists(os.path.join(path, "shard-attempt1.jsonl"))


def test_overwrite_publishes_before_sweeping(tmp_path, monkeypatch):
    """ADVICE r7: overwrite must write the new manifest (atomic
    os.replace) BEFORE deleting superseded manifests/files, so a crash
    mid-commit always leaves >=1 committed manifest readable. Simulated
    by crashing the first post-publish os.remove and asserting the new
    manifest is already on disk."""
    path = str(tmp_path)
    os.makedirs(os.path.join(path, "_staging"))

    def stage(name, rows):
        with open(os.path.join(path, "_staging", name), "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")
        return ShardCommitMessage(file=name, rows=len(rows))

    m1 = stage("shard-old.jsonl", [{"v": 1}])
    _commit_batch(path, [m1], batch_id="w-old")

    m2 = stage("shard-new.jsonl", [{"v": 2}])
    real_remove = os.remove
    def crashing_remove(p):
        # the first removal happens only after the publish point
        mdir = os.path.join(path, "_manifest")
        published = [
            f for f in os.listdir(mdir) if f.endswith(".json")
        ]
        assert "committed-batch-w-new.json" in published, (
            "sweep ran before the new manifest was published"
        )
        raise OSError("simulated crash during sweep")
    monkeypatch.setattr(os, "remove", crashing_remove)
    try:
        _commit_batch(path, [m2], batch_id="w-new", clear_existing=True)
    except OSError:
        pass
    monkeypatch.setattr(os, "remove", real_remove)
    # both manifests present (sweep crashed) — view is still readable
    # and includes the committed overwrite
    mdir = os.path.join(path, "_manifest")
    names = sorted(os.listdir(mdir))
    assert "committed-batch-w-new.json" in names
    listed = json.load(
        open(os.path.join(mdir, "committed-batch-w-new.json"))
    )["files"]
    assert listed == ["shard-new.jsonl"]
    assert os.path.exists(os.path.join(path, "shard-new.jsonl"))


def test_crashed_overwrite_sweep_finished_by_next_append(
    spark, tmp_path, monkeypatch
):
    """ADVICE r8: a crash between the overwrite's publish point and its
    sweep used to leave old+new manifests visible until the NEXT
    OVERWRITE. Now the overwrite persists its intent pre-publish, so
    (a) readers skip the superseded manifest immediately, and (b) any
    subsequent commit — here a plain append — finishes the sweep."""
    path = str(tmp_path)
    os.makedirs(os.path.join(path, "_staging"))

    def stage(name, rows):
        with open(os.path.join(path, "_staging", name), "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")
        return ShardCommitMessage(file=name, rows=len(rows))

    _commit_batch(path, [stage("shard-old.jsonl", [{"v": 1}])], "w-old")

    m2 = stage("shard-new.jsonl", [{"v": 2}])
    real_remove = os.remove

    def crashing_remove(p):
        raise OSError("simulated crash during sweep")

    monkeypatch.setattr(os, "remove", crashing_remove)
    try:
        _commit_batch(path, [m2], batch_id="w-new", clear_existing=True)
    except OSError:
        pass
    monkeypatch.setattr(os, "remove", real_remove)

    mdir = os.path.join(path, "_manifest")
    assert "committed-batch-w-old.json" in os.listdir(mdir)  # sweep crashed
    assert "overwrite-intent-w-new.json" in os.listdir(mdir)
    # (a) the duplicated window is invisible to readers even pre-sweep
    got = read_jsonl_commit(spark, path, "v long").collect()
    assert [r.v for r in got] == [2]
    # (b) a later APPEND (not an overwrite) finishes the sweep
    _commit_batch(path, [stage("shard-app.jsonl", [{"v": 3}])], "w-app")
    names = set(os.listdir(mdir))
    assert "committed-batch-w-old.json" not in names
    assert "overwrite-intent-w-new.json" not in names
    assert not os.path.exists(os.path.join(path, "shard-old.jsonl"))
    got = sorted(r.v for r in read_jsonl_commit(spark, path, "v long").collect())
    assert got == [2, 3]


def test_unpublished_overwrite_intent_is_dropped(tmp_path):
    """An intent whose manifest never published (crash pre-publish)
    must NOT trigger deletions — the old view is still the truth."""
    path = str(tmp_path)
    os.makedirs(os.path.join(path, "_staging"))
    with open(os.path.join(path, "_staging", "s.jsonl"), "w") as f:
        f.write(json.dumps({"v": 1}) + "\n")
    _commit_batch(path, [ShardCommitMessage(file="s.jsonl", rows=1)], "w1")
    mdir = os.path.join(path, "_manifest")
    # forge an intent pointing at a manifest that never landed
    with open(os.path.join(mdir, "overwrite-intent-ghost.json"), "w") as f:
        json.dump(
            {
                "manifest": "committed-batch-ghost.json",
                "stale_manifests": ["committed-batch-w1.json"],
                "stale_files": ["s.jsonl"],
            },
            f,
        )
    with open(os.path.join(path, "_staging", "s2.jsonl"), "w") as f:
        f.write(json.dumps({"v": 2}) + "\n")
    _commit_batch(path, [ShardCommitMessage(file="s2.jsonl", rows=1)], "w2")
    names = set(os.listdir(mdir))
    assert "committed-batch-w1.json" in names  # old view untouched
    assert "overwrite-intent-ghost.json" not in names  # spent intent dropped
    assert os.path.exists(os.path.join(path, "s.jsonl"))
