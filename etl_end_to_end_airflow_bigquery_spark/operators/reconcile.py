"""Bucketed table reconciliation — the anti-entropy diff two replicas
of a 100 TB table run to find what drifted without shipping either
side.

Protocol (the Merkle-/segment-checksum pattern every replicated store
uses, expressed relationally):

1. **Level 1 — bucket digests.** Each side folds to ``n_buckets`` rows:
   per md5-derived key bucket, the row count, the int64 SUM and the
   BIT_XOR of a per-row fingerprint (first 32 md5 bits of a canonical
   column rendering the caller provides). One aggregate pass per side,
   output size = buckets, not rows.
2. **Level 2 — drill-down.** Only buckets whose (count, sum, xor)
   digests disagree are re-read at row grain (a broadcast semi-join of
   the mismatched bucket ids against each side) and full-outer joined
   on the key: present-left-only => ``deleted``, present-right-only =>
   ``inserted``, both-present with differing fingerprints =>
   ``modified``.

Cost: two full scans that reduce map-side to bucket grain, then row
work proportional to (diff size x n/buckets amplification) — at 100 TB
with a small drift the level-2 scan touches a vanishing fraction of
either table. The fingerprint space is 32 bits per row; sum AND xor
must BOTH collide (over the same bucket) for a drift to hide, and the
gated query's relational oracle certifies no such collision occurred
on the data under test.

Both the fingerprint and the bucket id use the engine-portable
md5/conv idiom (the bucket IS ``sampling.hash_bucket``). The
fingerprint renders each compared column NULL-safely with a per-field
null FLAG — NULL renders as ``n``, a value as ``v:<value>`` — so a
value moving between columns, a column going NULL, or a drift between
NULL and any literal string (including one spelled like a sentinel)
always changes the fingerprint (ADVICE r12: a coalesce-to-sentinel
rendering made NULL vs the genuine string '<null>' invisible); a field
whose real string value contains the separator can still alias across
field boundaries, so pre-escape such columns if the data allows '|'.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from .sampling import hash_bucket

DIFF_BUCKETS = 64
_FP_SALT = "tdiff"
_BK_SALT = "tdiffbk"


def row_fingerprint(cols: list[str]) -> Column:
    """First 32 md5 bits of the canonical row rendering: each compared
    column is an engine-portable SQL expression (BIGINT/STRING/DATE;
    money as cents ints, never raw doubles, whose string forms differ
    across engines), rendered NULL-safely field-by-field (code-review
    r12: a caller-side concat_ws would DROP null fields, so
    ('X', NULL) -> (NULL, 'X') fingerprinted identically and the drift
    vanished; plain concat would NULL the whole fingerprint). Each
    field carries a null FLAG — ``n`` for NULL, ``v:<value>`` for a
    value — so NULL is distinguishable from EVERY string, including a
    would-be sentinel like '<null>' (ADVICE r12: coalesce-to-sentinel
    made that one drift invisible)."""
    rendered = ", ".join(
        f"coalesce(concat('v:', CAST({c} AS STRING)), 'n')" for c in cols
    )
    return F.expr(
        f"conv(substring(md5(concat_ws('|', '{_FP_SALT}', {rendered})),"
        " 1, 8), 16, 10)"
    ).cast("bigint")


def _key_bucket(key_col: str) -> Column:
    """Bucket id from the KEY alone (``sampling.hash_bucket``, distinct
    salt): a modified row must land in the SAME bucket on both sides,
    or the level-2 join would misread one modification as an unrelated
    delete + insert."""
    return hash_bucket(key_col, salt=_BK_SALT, buckets=DIFF_BUCKETS)


def _digests(df: DataFrame, key_col: str, cols: list[str]) -> DataFrame:
    fp = row_fingerprint(cols)
    return (
        df.select(_key_bucket(key_col).alias("bucket"), fp.alias("fp"))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("fp").alias("fp_sum"),
            F.expr("bit_xor(fp)").alias("fp_xor"),
        )
    )


def bucketed_table_diff(
    left: DataFrame, right: DataFrame, key_col: str, cols: list[str]
) -> DataFrame:
    """(diff_kind, key) rows: ``deleted`` = in left only, ``inserted`` =
    in right only, ``modified`` = both sides but canonical fingerprints
    differ. ``cols`` lists the compared columns as portable SQL
    expressions (see :func:`row_fingerprint`); the key column must be
    among them. Level-2 row work is restricted to buckets whose
    level-1 digests disagree.

    PRECONDITION: ``key_col`` must be unique per side (ADVICE r12 —
    duplicate keys would fan out the level-2 full-outer join into a
    per-key cross product, and reorderings of duplicates could collide
    in the level-1 sum/xor digests). The level-2 stage enforces it with
    a plan-embedded guard: the drill-down rows are grouped by key and a
    group with more than one row raises at execution time. The guard is
    free at scale — it only sees rows from already-mismatched buckets,
    and it keys on the same column the full-outer join shuffles on.
    (A duplicate key in a bucket whose digests happen to agree is not
    observed — the guard certifies the rows the protocol actually
    classifies, not the whole table.)"""
    ld, rd = _digests(left, key_col, cols), _digests(right, key_col, cols)
    mism = (
        ld.alias("l")
        .join(rd.alias("r"), "bucket", "full_outer")
        .filter(
            ~(
                F.col("l.n").eqNullSafe(F.col("r.n"))
                & F.col("l.fp_sum").eqNullSafe(F.col("r.fp_sum"))
                & F.col("l.fp_xor").eqNullSafe(F.col("r.fp_xor"))
            )
        )
        .select("bucket")
    )

    def _rows(df: DataFrame) -> DataFrame:
        fp = row_fingerprint(cols)
        return (
            df.select(
                F.col(key_col).alias("key"),
                fp.alias("fp"),
                _key_bucket(key_col).alias("bucket"),
            )
            .join(F.broadcast(mism), "bucket", "semi")
            # unique-key guard (ADVICE r12): fold to one row per key and
            # make the guard LOAD-BEARING in the fp column itself (an
            # unreferenced assert_true column would be pruned away).
            # when/otherwise evaluates branches lazily per row, so
            # raise_error fires only on an actual duplicate.
            .groupBy("key")
            .agg(F.count(F.lit(1)).alias("_n"), F.max("fp").alias("_fp"))
            .select(
                "key",
                F.when(F.col("_n") == 1, F.col("_fp"))
                .otherwise(
                    F.raise_error(
                        F.concat(
                            F.lit(
                                "bucketed_table_diff requires a unique "
                                f"key per side: duplicate {key_col}="
                            ),
                            F.col("key").cast("string"),
                        )
                    )
                )
                .alias("fp"),
            )
        )

    lr, rr = _rows(left).alias("l"), _rows(right).alias("r")
    joined = lr.join(rr, F.col("l.key") == F.col("r.key"), "full_outer")
    return joined.select(
        F.when(F.col("l.key").isNull(), F.lit("inserted"))
        .when(F.col("r.key").isNull(), F.lit("deleted"))
        .when(F.col("l.fp") != F.col("r.fp"), F.lit("modified"))
        .alias("diff_kind"),
        F.coalesce(F.col("l.key"), F.col("r.key")).alias("key"),
    ).filter(F.col("diff_kind").isNotNull())
