"""Sources: payload → DataFrame → RAW_SCHEMA rows (S1, P2, F5-F7, F10)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from etl_end_to_end_airflow_bigquery_spark.schemas import RAW_SCHEMA
from etl_end_to_end_airflow_bigquery_spark.sources import (
    fetch_fx_payload,
    payload_dataframe,
    payload_to_rows,
)


def test_fixture_short_circuits_network(fx_payload):
    assert fetch_fx_payload(fixture=fx_payload) is fx_payload


def test_payload_to_rows_explodes_rates_map(spark, fx_payload):
    rows = payload_to_rows(
        payload_dataframe(spark, fx_payload),
        ingest_ts=F.to_timestamp(F.lit("2026-01-05 12:00:00")),
    )
    got = {r.to_cur: r for r in rows.collect()}
    assert set(got) == {"USD", "GBP", "JPY"}
    assert got["USD"].rate == 1.1664
    assert got["USD"].from_cur == "EUR"
    # quote date parses to midnight (F5 normalize equivalent)
    assert got["USD"].date == dt.datetime(2026, 1, 5, 0, 0)
    assert [f.name for f in rows.schema.fields] == [f.name for f in RAW_SCHEMA.fields]


def test_empty_rates_guard(spark, fx_payload):
    """Reference skips on empty payload (:41-43); here it's an empty frame."""
    empty = dict(fx_payload, rates={})
    assert payload_to_rows(payload_dataframe(spark, empty)).isEmpty()


def test_missing_fields_survive_as_nulls(spark):
    rows = payload_to_rows(
        payload_dataframe(spark, {"amount": 1.0, "rates": {"USD": 2.0}})
    )
    r = rows.collect()[0]
    assert r.from_cur is None and r.date is None and r.rate == 2.0
