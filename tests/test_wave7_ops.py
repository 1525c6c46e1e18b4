"""Round-12 wave tests: file_lineage_scan's physical contract (the
gated query proves the ACCOUNTING matches the logical load slices;
these pin the MECHANISM — exactly one parquet file per hive load leaf,
and provenance recovered from the file path rather than the partition
column)."""

from __future__ import annotations

import glob
import os

from tests.conftest import SF_SMALL


def test_lineage_landing_is_one_file_per_load(spark):
    """The writer contract the oracle's row count relies on: the
    ``repartition(load).partitionBy(load)`` landing produces exactly
    one data file under each ``__load=K`` leaf, and the query emits
    exactly one row per file."""
    from etl_end_to_end_airflow_bigquery_spark.plans.queries_olap import (
        LINEAGE_N_LOADS,
        file_lineage_scan,
    )
    from etl_end_to_end_airflow_bigquery_spark import tmputil
    from etl_end_to_end_airflow_bigquery_spark.tmputil import sweep_tmpdirs

    rows = file_lineage_scan(spark, SF_SMALL).collect()
    assert len(rows) == LINEAGE_N_LOADS
    assert sorted(r.load_id for r in rows) == list(range(LINEAGE_N_LOADS))
    # the fixture dir is registered with tmputil and still on disk
    # until swept — inspect the physical layout directly
    roots = [
        d
        for d in tmputil._TMP_ROOTS
        if os.path.basename(d).startswith("lineage_") and os.path.isdir(d)
    ]
    assert roots, "lineage fixture dir not found"
    landing = os.path.join(roots[-1], "events_landing")
    for k in range(LINEAGE_N_LOADS):
        leaf = os.path.join(landing, f"__load={k}")
        files = glob.glob(os.path.join(leaf, "*.parquet"))
        assert len(files) == 1, f"load {k}: expected 1 file, got {files}"
    sweep_tmpdirs()


def test_lineage_provenance_comes_from_file_path(spark):
    """Row counts per load must equal the logical slice sizes — and the
    load ids must have been parsed out of input_file_name(), so a row
    landed in the wrong leaf would be charged to the WRONG load (the
    failure input_file_name provenance exists to catch)."""
    from etl_end_to_end_airflow_bigquery_spark.io import load_table
    from etl_end_to_end_airflow_bigquery_spark.plans.queries_olap import (
        LINEAGE_N_LOADS,
        file_lineage_scan,
    )
    from etl_end_to_end_airflow_bigquery_spark.tmputil import sweep_tmpdirs
    from pyspark.sql import functions as F

    got = {
        r.load_id: (r.n_rows, r.id_checksum)
        for r in file_lineage_scan(spark, SF_SMALL).collect()
    }
    want = {
        r.load_id: (r.n_rows, r.id_checksum)
        for r in load_table(spark, SF_SMALL, "events")
        .groupBy(
            F.pmod(F.col("event_id"), F.lit(LINEAGE_N_LOADS)).alias("load_id")
        )
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("event_id").alias("id_checksum"),
        )
        .collect()
    }
    assert got == want
    sweep_tmpdirs()
