"""Engine-robustness surface: schema evolution on read, file lineage
metadata, and streaming observability."""

from __future__ import annotations

from pyspark.sql import functions as F


class TestSchemaEvolution:
    def test_merge_schema_unions_columns(self, spark, tmp_path):
        """Parquet schema evolution: an old batch (2 cols) and a new
        batch (3 cols) read back as one table with the union schema,
        nulls where the old batch predates the column."""
        path = str(tmp_path / "evolving")
        spark.range(0, 5).selectExpr("id", "id * 2 AS v").write.parquet(
            path + "/batch=1"
        )
        spark.range(5, 10).selectExpr(
            "id", "id * 2 AS v", "'new' AS tag"
        ).write.parquet(path + "/batch=2")
        df = spark.read.option("mergeSchema", "true").parquet(path)
        assert set(df.columns) >= {"id", "v", "tag"}
        rows = {r.id: r.tag for r in df.collect()}
        assert rows[0] is None and rows[9] == "new"

    def test_batch_dirs_become_partition_column(self, spark, tmp_path):
        """Directory-style batches double as a partition column: writing
        under batch=N leaves makes `batch` queryable and partition-pruned
        — the idiom the first test's layout relies on."""
        path = str(tmp_path / "evolving2")
        spark.range(0, 5).selectExpr("id").write.parquet(path + "/batch=1")
        spark.range(5, 10).selectExpr("id", "'x' AS tag").write.parquet(
            path + "/batch=2"
        )
        merged = spark.read.option("mergeSchema", "true").parquet(path)
        assert set(merged.columns) == {"id", "tag", "batch"}
        assert merged.filter("batch = 2").count() == 5


class TestFileLineage:
    def test_metadata_file_path_column(self, spark, tmp_path):
        """Row-level lineage via the hidden _metadata struct: every row
        knows its source file — the audit/debugging hook for bad-file
        quarantine at scale (no extra scan cost; populated from the
        reader, not stored)."""
        path = str(tmp_path / "lineage")
        spark.range(0, 100).repartition(4).write.parquet(path)
        df = spark.read.parquet(path).select(
            "id", F.col("_metadata.file_path").alias("src"),
            F.col("_metadata.file_size").alias("sz"),
        )
        rows = df.collect()
        assert len(rows) == 100
        assert all(r.src.endswith(".parquet") and r.sz > 0 for r in rows)
        assert len({r.src for r in rows}) == 4  # one path per physical file


class TestStreamingObservability:
    def test_progress_metrics_after_stream(self, spark, tmp_path):
        """lastProgress exposes per-batch rows/sec + state metrics — the
        monitoring surface a production pipeline scrapes."""
        src = str(tmp_path / "in")
        spark.range(0, 1000).selectExpr("id", "id % 7 AS k").write.parquet(src)
        stream = spark.readStream.schema("id long, k long").parquet(src)
        q = (
            stream.groupBy("k").count()
            .writeStream.format("memory")
            .queryName("obs_sink")
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        prog = q.lastProgress
        assert prog is not None
        assert prog["numInputRows"] == 1000
        assert prog["sink"]["description"].startswith("MemorySink")
        assert prog["stateOperators"][0]["numRowsTotal"] == 7


def test_variant_type_surface(spark):
    """Spark 4 VARIANT: parse_json -> binary variant, schema inference,
    typed extraction, missing-path NULL (not error), and try_parse_json
    NULL on malformed input."""
    df = spark.createDataFrame(
        [('{"k": 7, "s": "x"}',), ('{"k": 9}',), ("not json",)],
        "j string",
    )
    good = df.filter(F.col("j").startswith("{")).select(
        F.parse_json("j").alias("v")
    )
    rows = good.select(
        F.expr("variant_get(v, '$.k', 'bigint')").alias("k"),
        F.expr("variant_get(v, '$.s', 'string')").alias("s"),
        F.expr("variant_get(v, '$.missing', 'bigint')").alias("m"),
        F.expr("schema_of_variant(v)").alias("sch"),
    ).collect()
    assert [r.k for r in rows] == [7, 9]
    assert [r.s for r in rows] == ["x", None]
    assert all(r.m is None for r in rows)
    assert rows[0].sch == "OBJECT<k: BIGINT, s: STRING>"
    bad = df.select(F.try_parse_json("j").alias("v")).collect()
    assert [b.v is None for b in bad] == [False, False, True]


def test_observation_metrics(spark):
    """Spark Observation API: named metrics collected as a side effect
    of the action — the zero-extra-pass way a production pipeline
    reports row counts / sums for data-quality monitoring (vs running
    a second aggregate job)."""
    from pyspark.sql import Observation

    obs = Observation("ingest_metrics")
    df = spark.range(0, 1000).observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("id").alias("id_sum"),
    )
    assert df.filter("id % 2 = 0").count() == 500  # the one action
    got = obs.get
    assert got["n_rows"] == 1000 and got["id_sum"] == 499500
