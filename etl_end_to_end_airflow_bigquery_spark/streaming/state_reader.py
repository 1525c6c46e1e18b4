"""Streaming state-store reader (Spark 4 ``statestore`` /
``state-metadata`` batch sources) — inspect a streaming query's state
as DataFrames.

The reference operates its pipelines blind: the only visibility into
the BigQuery MERGE's idempotency state is re-querying the output table
(``dags/idempotent_fx_pipeline.py:73-87``). Spark 4 exposes the
streaming engine's own state as a first-class BATCH source: every
stateful operator's keyed state (dedup keys, window aggregation
buffers, join buffers, session state) can be read from the checkpoint
directory — the standard tool for debugging watermark/state bugs and
for state audits, with no side channel into the running query.

Scale: the read is a normal partitioned batch scan over the state
files (one task per state-store partition — the operator's shuffle
partition count), so inspecting a 10k-partition production checkpoint
is an ordinary parallel job, never a driver loop.

Gated proof: ``streaming_state_dedup_keys`` replays the tick stream
through ``dropDuplicatesWithinWatermark``, then answers from the STATE
STORE instead of the sink — sharing ``streaming_dedup_events``'s
DuckDB oracle verbatim, so the gate proves the engine's internal state
agrees with the semantic answer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def state_metadata(spark: SparkSession, checkpoint_dir: str) -> DataFrame:
    """Operator-level metadata of every state store under a checkpoint:
    (operatorId, operatorName, stateStoreName, numPartitions, min/max
    batch id, ...). Use it to discover operator ids for
    :func:`read_state` on multi-operator queries."""
    return spark.read.format("state-metadata").load(checkpoint_dir)


def read_state(
    spark: SparkSession,
    checkpoint_dir: str,
    operator_id: int | None = None,
    batch_id: int | None = None,
    store_name: str | None = None,
) -> DataFrame:
    """Keyed state of one operator as (key struct, value struct,
    partition_id). Defaults: operator 0, the latest committed batch,
    the default store — pass explicit values for multi-operator /
    multi-store plans (see :func:`state_metadata`).
    """
    r = spark.read.format("statestore")
    if operator_id is not None:
        r = r.option("operatorId", operator_id)
    if batch_id is not None:
        r = r.option("batchId", batch_id)
    if store_name is not None:
        r = r.option("storeName", store_name)
    return r.load(checkpoint_dir)


def state_keys(
    spark: SparkSession, checkpoint_dir: str, operator_id: int | None = None
) -> DataFrame:
    """The flattened key columns of an operator's state — for dedup
    operators this IS the distinct key set the engine guarantees."""
    return read_state(spark, checkpoint_dir, operator_id).select("key.*")
