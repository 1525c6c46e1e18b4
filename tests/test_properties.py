"""Property-based checks (hypothesis) for the write-path algebra —
the invariants the reference's v2/v3 pipeline variants exist to provide
(SURVEY.md §5): idempotency and key uniqueness under arbitrary batches.

Kept to few, small examples: each example spins Spark jobs, so the
budget goes to input diversity, not example count.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from etl_end_to_end_airflow_bigquery_spark.operators.writers import (
    idempotent_append_df,
    merge_upsert_df,
)

row = st.tuples(
    st.integers(min_value=0, max_value=9),  # key (small domain → collisions)
    st.floats(min_value=-1e6, max_value=1e6, allow_nan=False, width=32),
)
batch = st.lists(row, min_size=0, max_size=8)


def _df(spark, rows):
    return spark.createDataFrame(
        [(k, float(v)) for k, v in rows] or [], "k int, v double"
    )


def _sorted(df):
    return sorted(tuple(r) for r in df.collect())


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(target=batch, source=batch)
def test_merge_upsert_idempotent_and_unique(spark, target, source):
    t = _df(spark, {k: v for k, v in target}.items())  # unique-key target
    s = _df(spark, {k: v for k, v in source}.items())
    once = merge_upsert_df(t, s, keys=["k"])
    twice = merge_upsert_df(once, s, keys=["k"])
    assert _sorted(once) == _sorted(twice)  # applying a batch twice ≡ once
    keys = [r.k for r in once.select("k").collect()]
    assert len(keys) == len(set(keys))  # key uniqueness preserved
    # every source key holds the source value (source wins)
    got = dict((r.k, r.v) for r in once.collect())
    for k, v in {k: v for k, v in source}.items():
        assert got[k] == v


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(target=batch, b=batch)
def test_idempotent_append_monotone_and_stable(spark, target, b):
    t = _df(spark, {k: v for k, v in target}.items())
    s = _df(spark, b)
    once = idempotent_append_df(t, s, keys=["k"])
    twice = idempotent_append_df(once, s, keys=["k"])
    assert _sorted(once) == _sorted(twice)
    # original target rows never change
    got = dict((r.k, r.v) for r in once.collect())
    for k, v in {k: v for k, v in target}.items():
        assert got[k] == v
