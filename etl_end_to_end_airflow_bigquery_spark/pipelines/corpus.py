"""End-to-end training-corpus build: the capstone pipeline composing the
individually-gated operators into the artifact a trainer actually reads.

    documents
      → quality score + language ID      (row-local projections)
      → curation cuts                    (filters, before any shuffle)
      → exact dedup                      (one shuffle on content hash)
      → train/val/test split             (hash-based, row-local)
      → token-window chunking            (Generate fan-out, row-local)
      → shard assignment                 (hash-based, row-local)
      → write partitioned by (split, shard)

Operator order is the 100 TB order: every row-local step runs before
the single dedup shuffle, and the write's ``partitionBy`` gives the
trainer direct ``split=train/shard=7`` paths. The whole build is one
lazy plan — nothing materializes until the write.

Every stage is the same operator the correctness gate verifies
(``curated_corpus``, ``dataset_split``, ``chunk_documents``,
``shard_histogram`` oracles); this module only composes them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import load_table
from ..operators.sampling import hash_split, shard_assign
from ..operators.text import chunk_tokens, fingerprint, marker_count, text_stats


def build_training_corpus(
    spark: SparkSession,
    sf_dir: str,
    out_dir: str,
    lang: str = "en",
    min_quality: float = 0.5,
    min_tokens: int = 30,
    split_weights: dict[str, float] | None = None,
    chunk_size: int = 20,
    overlap: int = 5,
    n_shards: int = 4,
) -> DataFrame:
    """Build and write the sharded chunk corpus; returns the (lazy)
    chunk frame for inspection. Deterministic end to end: re-running
    over the same input produces byte-identical shard membership."""
    from ..plans.queries_ext import LANG_CASE_SQL, QUALITY_SQL

    docs = load_table(spark, sf_dir, "documents")
    scored = (
        text_stats(docs)
        .withColumns({f"c_{lg}": marker_count(lg) for lg in ("en", "de", "es", "fr")})
        .withColumn("pred_lang", F.expr(LANG_CASE_SQL))
        .withColumn("quality", F.expr(QUALITY_SQL))
    )
    kept = scored.filter(
        (F.col("pred_lang") == lang)
        & (F.col("quality") >= min_quality)
        & (F.col("n_tokens") >= min_tokens)
    )
    w = Window.partitionBy(fingerprint()).orderBy("doc_id")
    deduped = (
        kept.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select("doc_id", "text", "quality")
    )
    split = hash_split(
        deduped, "doc_id", split_weights or {"train": 0.8, "val": 0.1, "test": 0.1}
    )
    chunks = chunk_tokens(split, "text", chunk_size, overlap)
    sharded = shard_assign(chunks, "doc_id", n_shards)
    (
        sharded.repartition("split", "shard")
        .write.mode("overwrite")
        .partitionBy("split", "shard")
        .parquet(out_dir)
    )
    return sharded
