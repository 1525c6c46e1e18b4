"""Corrupt-record quarantine ingestion (VERDICT r10 item 3): PERMISSIVE
parse + dead-letter split must never silently drop OR silently pass a
row — every input lands in exactly one of (clean, quarantined).

Reference basis: ``dags/ FXRate_Reporting_Pipeline.py:27,46-48`` guards
arbitrary REST JSON with only ``if not data``."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_end_to_end_airflow_bigquery_spark.sources.quarantine import (
    observed_parse,
    parse_json_quarantine,
    quarantine_split,
)

ROWS = [
    (1, '{"k": 5, "name": "a"}'),   # clean
    (2, '{"k": 7'),                 # truncated — corrupt
    (3, None),                      # NULL payload — quarantined ('' marker)
    (4, '{"k": "not a number"}'),   # type coercion failure — corrupt
    (5, '[1, 2, 3]'),               # non-object top level — corrupt
    (6, '{"k": null}'),             # explicit null field — clean
    (7, 'garbage'),                 # not JSON — corrupt
    (8, '{"k": 8, "extra": 1}'),    # unknown extra field — clean
]


@pytest.fixture()
def raw(spark):
    return spark.createDataFrame(ROWS, "id int, payload string")


def test_every_row_lands_in_exactly_one_bucket(spark, raw):
    parsed = parse_json_quarantine(raw, "payload", "k BIGINT, name STRING")
    clean, bad = quarantine_split(parsed)
    clean_ids = sorted(r.id for r in clean.collect())
    bad_ids = sorted(r.id for r in bad.collect())
    assert clean_ids == [1, 6, 8]
    assert bad_ids == [2, 3, 4, 5, 7]
    assert len(clean_ids) + len(bad_ids) == len(ROWS)  # no silent drops


def test_clean_rows_parse_values_and_drop_marker(spark, raw):
    clean, _ = quarantine_split(
        parse_json_quarantine(raw, "payload", "k BIGINT, name STRING")
    )
    assert "_corrupt_record" not in clean.columns
    got = {r.id: (r.k, r.name) for r in clean.collect()}
    assert got == {1: (5, "a"), 6: (None, None), 8: (8, None)}


def test_quarantined_rows_keep_original_payload(spark, raw):
    _, bad = quarantine_split(
        parse_json_quarantine(raw, "payload", "k BIGINT, name STRING")
    )
    got = {r.id: r._corrupt_record for r in bad.collect()}
    assert got == {
        2: '{"k": 7',
        3: "",  # NULL payload: empty-string marker (documented policy)
        4: '{"k": "not a number"}',
        5: "[1, 2, 3]",
        7: "garbage",
    }


def test_observe_counters_emitted_in_one_pass(spark, raw):
    parsed, obs = observed_parse(raw, "payload", "k BIGINT")
    parsed.write.format("noop").mode("overwrite").save()
    assert obs.get == {"n_rows": 8, "n_corrupt": 5, "n_clean": 3}


def test_reserved_corrupt_column_rejected(spark):
    df = spark.createDataFrame(
        [(1, "{}", "x")], "id int, payload string, _corrupt_record string"
    )
    with pytest.raises(ValueError, match="already present"):
        parse_json_quarantine(df, "payload", "k BIGINT")


def test_nested_schema_fields_pass_through(spark):
    df = spark.createDataFrame(
        [(1, '{"tags": ["a", "b"], "m": {"x": 1}}'), (2, '{"tags": [}')],
        "id int, payload string",
    )
    clean, bad = quarantine_split(
        parse_json_quarantine(
            df, "payload", "tags ARRAY<STRING>, m STRUCT<x: BIGINT>"
        )
    )
    row = clean.collect()[0]
    assert row.tags == ["a", "b"] and row.m.x == 1
    assert [r.id for r in bad.collect()] == [2]


def test_schema_field_collision_rejected(spark):
    df = spark.createDataFrame([(1, "{}")], "k int, payload string")
    with pytest.raises(ValueError, match="collide with input columns"):
        parse_json_quarantine(df, "payload", "k BIGINT")


def test_nested_schema_commas_do_not_false_positive(spark):
    # STRUCT<x: INT, y: INT> commas must not split field parsing
    df = spark.createDataFrame([(1, '{"m": {"x": 1, "y": 2}}')],
                               "id int, payload string")
    clean, bad = quarantine_split(
        parse_json_quarantine(df, "payload", "m STRUCT<x: INT, y: INT>")
    )
    assert clean.collect()[0].m.y == 2 and bad.count() == 0
