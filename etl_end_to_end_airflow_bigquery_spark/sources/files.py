"""Schema-enforced file ingestion with corrupt-record quarantine.

The reference's load path trusts BigQuery's load-job validation
(``WRITE_APPEND`` with a declared schema — bad rows fail the job). A
standalone engine needs the equivalent: declared-schema reads where
malformed records are *captured*, not silently nulled and not
job-fatal, so the pipeline can land good rows and route bad ones to a
dead-letter table.

Both readers use Spark's PERMISSIVE mode with an explicit
``_corrupt_record`` column. One structural Spark caveat, handled here:
the corrupt-record column is populated lazily at parse time, so a plan
that re-reads the source per consumer may legally return nulls for it
(Spark refuses queries referencing *only* that column for the same
reason). The split therefore pins the parsed batch with ``persist()``
before filtering — batch-scoped, unpersisted by the caller via
``valid.unpersist()`` when both sides are consumed. At 100 TB the
equivalent is a single-pass foreachBatch split or a first-class
dead-letter sink; the semantics stay the same.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

CORRUPT_COL = "_corrupt_record"


def _split_quarantine(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    df = df.persist()
    valid = df.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    rejected = df.filter(F.col(CORRUPT_COL).isNotNull()).select(
        F.col(CORRUPT_COL).alias("raw_record")
    )
    return valid, rejected


def read_jsonl(
    spark: SparkSession, path: str, schema: str
) -> tuple[DataFrame, DataFrame]:
    """Read newline-delimited JSON under a declared schema.

    Returns ``(valid, rejected)``: rows that parse and type-check under
    ``schema``, and the raw text of every record that didn't (malformed
    JSON, or a field whose value can't be cast to the declared type).
    """
    full = f"{schema}, {CORRUPT_COL} string"
    df = (
        spark.read.schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
    )
    return _split_quarantine(df)


def read_csv(
    spark: SparkSession,
    path: str,
    schema: str,
    header: bool = True,
    sep: str = ",",
) -> tuple[DataFrame, DataFrame]:
    """Read CSV under a declared schema; same quarantine contract as
    ``read_jsonl`` (a row with the wrong column count or an uncastable
    value lands in ``rejected`` as raw text)."""
    full = f"{schema}, {CORRUPT_COL} string"
    df = (
        spark.read.schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .option("header", str(header).lower())
        .option("sep", sep)
        .csv(path)
    )
    return _split_quarantine(df)
