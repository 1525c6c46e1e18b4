"""MERGE INTO SQL front (operators.merge_sql): the reference's literal
statement text (``dags/fx_pipeline_with_merge.py:90-103``) lowered onto
the sentinel-tracked full-outer merge plan."""

from __future__ import annotations

import pytest

from etl_end_to_end_airflow_bigquery_spark.operators.merge_sql import (
    MergeSpec,
    merge_into,
    parse_merge,
)

REFERENCE_SHAPE = """
    MERGE `fx_rates` T
    USING `fx_staging` S
    ON T.date = S.date
       AND T.from_cur = S.from_cur
       AND T.to_cur = S.to_cur
    WHEN MATCHED THEN
        UPDATE SET
            T.rate = S.rate,
            T.timestamp = S.timestamp
    WHEN NOT MATCHED THEN
        INSERT (date, from_cur, to_cur, rate, timestamp)
        VALUES (S.date, S.from_cur, S.to_cur, S.rate, S.timestamp)
"""


def test_parse_reference_statement():
    spec = parse_merge(REFERENCE_SHAPE)
    assert spec == MergeSpec(
        target="fx_rates",
        source="fx_staging",
        keys=("date", "from_cur", "to_cur"),
        update_cols=("rate", "timestamp"),
        insert_cols=("date", "from_cur", "to_cur", "rate", "timestamp"),
    )


@pytest.mark.parametrize(
    "bad",
    [
        "SELECT 1",
        # non-identity update expression
        "MERGE a T USING b S ON T.k = S.k WHEN MATCHED THEN UPDATE SET "
        "T.v = S.v + 1 WHEN NOT MATCHED THEN INSERT (k) VALUES (S.k)",
        # ON clause comparing different columns
        "MERGE a T USING b S ON T.k = S.j WHEN MATCHED THEN UPDATE SET "
        "T.v = S.v WHEN NOT MATCHED THEN INSERT (k) VALUES (S.k)",
        # INSERT values out of order vs the column list
        "MERGE a T USING b S ON T.k = S.k WHEN MATCHED THEN UPDATE SET "
        "T.v = S.v WHEN NOT MATCHED THEN INSERT (k, v) VALUES (S.v, S.k)",
    ],
)
def test_parse_rejects_unsupported(bad):
    with pytest.raises(ValueError):
        parse_merge(bad)


def test_merge_into_subset_update_and_insert(spark):
    spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0)], "k int, status string, v double"
    ).createOrReplaceTempView("msql_t")
    spark.createDataFrame(
        [(2, "B", 99.0), (3, "c", 30.0)], "k int, status string, v double"
    ).createOrReplaceTempView("msql_s")
    got = {
        r.k: (r.status, r.v)
        for r in merge_into(
            spark,
            "MERGE INTO msql_t T USING msql_s S ON T.k = S.k "
            "WHEN MATCHED THEN UPDATE SET T.status = S.status "
            "WHEN NOT MATCHED THEN INSERT (k, status, v) "
            "VALUES (S.k, S.status, S.v)",
        ).collect()
    }
    # matched row: only status updated, v kept from the target
    assert got == {1: ("a", 10.0), 2: ("B", 20.0), 3: ("c", 30.0)}
    # MERGE mutates the table: the view now resolves to the merged frame
    assert spark.table("msql_t").count() == 3


def test_merge_into_insert_subset_nulls_unlisted(spark):
    spark.createDataFrame([(1, "a", 10.0)], "k int, s string, v double"
                          ).createOrReplaceTempView("msql_t2")
    spark.createDataFrame([(2, "b", 20.0)], "k int, s string, v double"
                          ).createOrReplaceTempView("msql_s2")
    rows = merge_into(
        spark,
        "MERGE msql_t2 T USING msql_s2 S ON T.k = S.k "
        "WHEN MATCHED THEN UPDATE SET T.v = S.v "
        "WHEN NOT MATCHED THEN INSERT (k, s) VALUES (S.k, S.s)",
    ).collect()
    by_k = {r.k: (r.s, r.v) for r in rows}
    assert by_k == {1: ("a", 10.0), 2: ("b", None)}


def test_merge_into_validates_columns(spark):
    spark.createDataFrame([(1,)], "k int").createOrReplaceTempView("msql_t3")
    spark.createDataFrame([(1, 2)], "k int, z int"
                          ).createOrReplaceTempView("msql_s3")
    with pytest.raises(ValueError, match="not in target schema"):
        merge_into(
            spark,
            "MERGE msql_t3 T USING msql_s3 S ON T.k = S.k "
            "WHEN MATCHED THEN UPDATE SET T.k = S.k "
            "WHEN NOT MATCHED THEN INSERT (k, z) VALUES (S.k, S.z)",
        )


def test_merge_into_validates_insert_cols_against_source(spark):
    """ADVICE r05: an INSERT column in the target but absent from the
    source must raise the module's loud ValueError, not an opaque
    AnalysisException on ``S.<col>`` later."""
    spark.createDataFrame([(1, 2)], "k int, z int"
                          ).createOrReplaceTempView("msql_t4")
    spark.createDataFrame([(1,)], "k int").createOrReplaceTempView("msql_s4")
    with pytest.raises(ValueError, match="not in source frame"):
        merge_into(
            spark,
            "MERGE msql_t4 T USING msql_s4 S ON T.k = S.k "
            "WHEN MATCHED THEN UPDATE SET T.k = S.k "
            "WHEN NOT MATCHED THEN INSERT (k, z) VALUES (S.k, S.z)",
        )


def test_merge_into_rejects_duplicate_source_keys(spark):
    """ADVICE r05: SQL MERGE raises a cardinality violation when one
    target row matches multiple source rows; the lowering's full-outer
    join would instead silently duplicate the target row. Guarded by
    default; an explicit opt-out restores the raw join behavior."""
    spark.createDataFrame([(1, 10.0)], "k int, v double"
                          ).createOrReplaceTempView("msql_t5")
    spark.createDataFrame([(1, 11.0), (1, 12.0)], "k int, v double"
                          ).createOrReplaceTempView("msql_s5")
    stmt = (
        "MERGE msql_t5 T USING msql_s5 S ON T.k = S.k "
        "WHEN MATCHED THEN UPDATE SET T.v = S.v "
        "WHEN NOT MATCHED THEN INSERT (k, v) VALUES (S.k, S.v)"
    )
    with pytest.raises(ValueError, match="cardinality violation"):
        merge_into(spark, stmt)
    # opt-out: the documented raw-join behavior (one output row per
    # matching source row), for batches dedup'd upstream
    assert merge_into(spark, stmt, validate_source_keys=False).count() == 2


def test_merge_into_key_column_named_count(spark):
    """ADVICE r6: the cardinality guard used .count() and filtered on
    the literal column name 'count' — a merge whose KEY column is named
    'count' collided and died with an ambiguous-column
    AnalysisException. The guard now aggregates under a reserved-prefix
    alias, so both the happy path and the duplicate-key contract error
    work for that key name."""
    spark.createDataFrame([(1, 10.0)], "count int, v double"
                          ).createOrReplaceTempView("msql_t6")
    spark.createDataFrame([(1, 11.0), (2, 12.0)], "count int, v double"
                          ).createOrReplaceTempView("msql_s6")
    stmt = (
        "MERGE msql_t6 T USING msql_s6 S ON T.count = S.count "
        "WHEN MATCHED THEN UPDATE SET T.v = S.v "
        "WHEN NOT MATCHED THEN INSERT (count, v) VALUES (S.count, S.v)"
    )
    got = {(r["count"], r.v) for r in merge_into(spark, stmt).collect()}
    assert got == {(1, 11.0), (2, 12.0)}
    # duplicate keys under the same column name still raise the LOUD
    # contract error, not an AnalysisException
    spark.createDataFrame([(1, 11.0), (1, 12.0)], "count int, v double"
                          ).createOrReplaceTempView("msql_s6")
    with pytest.raises(ValueError, match="cardinality violation"):
        merge_into(spark, stmt)


def test_merge_into_rejects_dotted_target(spark):
    """ADVICE r05: a parsed ``db.tbl`` target would read fine and then
    crash at temp-view re-registration — reject it up front."""
    with pytest.raises(ValueError, match="dotted"):
        merge_into(
            spark,
            "MERGE `proj.ds.tbl` T USING msql_s5 S ON T.k = S.k "
            "WHEN MATCHED THEN UPDATE SET T.v = S.v "
            "WHEN NOT MATCHED THEN INSERT (k, v) VALUES (S.k, S.v)",
        )


def test_parse_delete_clause():
    spec = parse_merge(
        REFERENCE_SHAPE + " WHEN NOT MATCHED BY SOURCE THEN DELETE"
    )
    assert spec.delete_unmatched_target is True
    assert parse_merge(REFERENCE_SHAPE).delete_unmatched_target is False


def test_merge_into_delete_unmatched_target(spark):
    """Full-sync MERGE: target rows with no source match are deleted;
    matched rows update; source-only rows insert."""
    spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (9, "z", 90.0)],
        "k int, status string, v double",
    ).createOrReplaceTempView("msql_t6")
    spark.createDataFrame(
        [(2, "B", 99.0), (3, "c", 30.0)], "k int, status string, v double"
    ).createOrReplaceTempView("msql_s6")
    got = {
        r.k: (r.status, r.v)
        for r in merge_into(
            spark,
            "MERGE INTO msql_t6 T USING msql_s6 S ON T.k = S.k "
            "WHEN MATCHED THEN UPDATE SET T.status = S.status "
            "WHEN NOT MATCHED THEN INSERT (k, status, v) "
            "VALUES (S.k, S.status, S.v) "
            "WHEN NOT MATCHED BY SOURCE THEN DELETE",
        ).collect()
    }
    # rows 1 and 9 (target-only) deleted; 2 updated (v kept); 3 inserted
    assert got == {2: ("B", 20.0), 3: ("c", 30.0)}
