from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from etl_end_to_end_airflow_bigquery_spark.session import get_spark

SF_SMALL = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    spark = get_spark("tests", shuffle_partitions=8)
    yield spark
    spark.stop()


@pytest.fixture()
def fx_payload():
    """Frankfurter-style payload (dags/test_api.ipynb shape)."""
    return {
        "amount": 1.0,
        "base": "EUR",
        "date": "2026-01-05",
        "rates": {"USD": 1.1664, "GBP": 0.8421, "JPY": 170.34},
    }
