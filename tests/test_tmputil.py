"""Session-scoped temp-dir registry (VERDICT r06 item 7): queries that
materialize intermediate parquet register their dirs; a sweep after the
result is consumed removes them, so repeated gate/bench invocations
don't accumulate table copies under /tmp."""

from __future__ import annotations

import os

from etl_end_to_end_airflow_bigquery_spark import tmputil

SF_DIR = "/root/testdata/sf0.001"


def test_session_tmpdir_registers_and_sweeps():
    before = len(tmputil._TMP_ROOTS)
    d = tmputil.session_tmpdir("tmputil_test_")
    assert os.path.isdir(d)
    assert tmputil._TMP_ROOTS[-1] == d
    removed = tmputil.sweep_tmpdirs()
    assert removed == before + 1
    assert not os.path.exists(d)
    assert tmputil._TMP_ROOTS == []


def test_sweep_is_idempotent_and_tolerates_missing_dirs():
    d = tmputil.session_tmpdir("tmputil_gone_")
    os.rmdir(d)  # something else cleaned it first
    assert tmputil.sweep_tmpdirs() >= 1
    assert tmputil.sweep_tmpdirs() == 0


def test_temp_materializing_queries_leave_nothing_after_sweep(spark):
    """Temp-materializing gated queries (ADVICE r6 low): run, consume,
    sweep — every directory they created is gone. (rfm_segments left
    this roster in r15: its staging parquet round-trips became eager
    localCheckpoints, so it no longer touches /tmp at all.)"""
    from etl_end_to_end_airflow_bigquery_spark.plans import QUERIES

    tmputil.sweep_tmpdirs()
    created: list[str] = []
    for name in ("time_travel_orders", "ivm_join_revenue",
                 "variant_shredded_roundtrip"):
        n0 = len(tmputil._TMP_ROOTS)
        QUERIES[name](spark, SF_DIR).collect()
        new = tmputil._TMP_ROOTS[n0:]
        assert new, f"{name} no longer registers its temp dirs"
        created.extend(new)
    assert tmputil.sweep_tmpdirs() == len(created)
    for d in created:
        assert not os.path.exists(d), f"stray temp dir survives sweep: {d}"
