"""MERGE INTO SQL front: run the reference's literal MERGE text on Spark.

The reference expresses idempotent upserts as a BigQuery MERGE statement
(``dags/fx_pipeline_with_merge.py:90-103``):

    MERGE `target` T USING `staging` S
    ON T.date = S.date AND T.from_cur = S.from_cur AND T.to_cur = S.to_cur
    WHEN MATCHED THEN UPDATE SET T.rate = S.rate, T.timestamp = S.timestamp
    WHEN NOT MATCHED THEN INSERT (date, ...) VALUES (S.date, ...)

Spark's own ``MERGE INTO`` requires a DSv2 catalog with row-level
operation support, which plain temp views / parquet paths don't have —
so this module accepts the SAME statement text against the session's
temp-view catalog and lowers it onto the repo's join-based merge plan
(the one :func:`writers.merge_upsert_df` uses: one full-outer equi-join,
sentinel-tracked row presence, per-column winners). Capability parity
with the reference's spelling, executed Spark-first.

Supported grammar (the reference's shape, upper/lower case free):

    MERGE [INTO] <target> [AS] <T> USING <source> [AS] <S>
    ON <T>.<k> = <S>.<k> [AND ...]
    WHEN MATCHED THEN UPDATE SET <T>.<c> = <S>.<c> [, ...]
    WHEN NOT MATCHED THEN INSERT (<c> [, ...]) VALUES (<S>.<c> [, ...])
    [WHEN NOT MATCHED BY SOURCE THEN DELETE]

The trailing DELETE clause (the full-sync form Delta and BigQuery users
expect; the reference's own statement omits it) drops target rows with
no source match — lowered as a right-outer join so deleted rows never
materialize.

Only identity column copies are supported on the right-hand sides —
arbitrary expressions are rejected loudly rather than silently
mis-evaluated. Backtick-quoted table names are accepted (the reference
quotes its BigQuery ids). Multiple source rows matching one target row
raise SQL MERGE's cardinality-violation error by default
(``validate_source_keys``, ADVICE r05) instead of silently duplicating
target rows through the join.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_MERGE_RE = re.compile(
    r"""^\s*
    MERGE \s+ (?:INTO\s+)? (?P<target>`[^`]+`|[\w.]+) \s+ (?:AS\s+)? (?P<t>\w+) \s+
    USING \s+ (?P<source>`[^`]+`|[\w.]+) \s+ (?:AS\s+)? (?P<s>\w+) \s+
    ON \s+ (?P<cond>.+?) \s+
    WHEN \s+ MATCHED \s+ THEN \s+ UPDATE \s+ SET \s+ (?P<set>.+?) \s+
    WHEN \s+ NOT \s+ MATCHED \s+ THEN \s+
    INSERT \s* \( (?P<icols>[^)]*) \) \s* VALUES \s* \( (?P<ivals>[^)]*) \)
    (?P<delete> \s+ WHEN \s+ NOT \s+ MATCHED \s+ BY \s+ SOURCE \s+
                THEN \s+ DELETE )?
    \s*;?\s*$""",
    re.I | re.X | re.S,
)

_EQ_RE = re.compile(r"^\s*(\w+)\.(\w+)\s*=\s*(\w+)\.(\w+)\s*$")
_COL_RE = re.compile(r"^\s*(?:(\w+)\.)?(\w+)\s*$")


@dataclass(frozen=True)
class MergeSpec:
    """Parsed MERGE statement: table names, key columns, the
    matched-update / not-matched-insert column sets, and whether
    target rows with no source match are deleted (``WHEN NOT MATCHED
    BY SOURCE THEN DELETE`` — the full-sync clause Delta/BigQuery users
    expect, absent from the reference's statement)."""

    target: str
    source: str
    keys: tuple[str, ...]
    update_cols: tuple[str, ...]
    insert_cols: tuple[str, ...]
    delete_unmatched_target: bool = False


def _unquote(name: str) -> str:
    return name[1:-1] if name.startswith("`") else name


def parse_merge(sql: str) -> MergeSpec:
    """Parse a MERGE statement of the supported grammar; loud
    ValueError (with the offending fragment) on anything else."""
    m = _MERGE_RE.match(sql)
    if not m:
        raise ValueError(
            "unsupported MERGE statement; expected the reference shape "
            "MERGE [INTO] t T USING s S ON ... WHEN MATCHED THEN UPDATE "
            "SET ... WHEN NOT MATCHED THEN INSERT (...) VALUES (...)"
        )
    t_alias, s_alias = m.group("t"), m.group("s")

    keys: list[str] = []
    for clause in re.split(r"\s+AND\s+", m.group("cond"), flags=re.I):
        eq = _EQ_RE.match(clause)
        if not eq:
            raise ValueError(f"unsupported ON clause (need a.k = b.k): {clause!r}")
        a_al, a_col, b_al, b_col = eq.groups()
        if {a_al, b_al} != {t_alias, s_alias} or a_col != b_col:
            raise ValueError(
                f"ON clause must equate the same column across the two "
                f"aliases ({t_alias}, {s_alias}): {clause!r}"
            )
        keys.append(a_col)

    update_cols: list[str] = []
    for item in m.group("set").split(","):
        eq = _EQ_RE.match(item)
        if not eq:
            raise ValueError(
                f"unsupported UPDATE SET item (need {t_alias}.c = "
                f"{s_alias}.c identity copies only): {item.strip()!r}"
            )
        l_al, l_col, r_al, r_col = eq.groups()
        if l_al != t_alias or r_al != s_alias or l_col != r_col:
            raise ValueError(
                f"UPDATE SET must copy {s_alias}.c into {t_alias}.c "
                f"(same column name): {item.strip()!r}"
            )
        update_cols.append(l_col)

    icols = [c.strip() for c in m.group("icols").split(",") if c.strip()]
    ivals = [v for v in m.group("ivals").split(",")]
    if len(icols) != len(ivals):
        raise ValueError("INSERT column list and VALUES arity differ")
    for col, val in zip(icols, ivals):
        vm = _COL_RE.match(val)
        if not vm or vm.group(1) not in (None, s_alias) or vm.group(2) != col:
            raise ValueError(
                f"INSERT VALUES must be identity copies {s_alias}.{col}: "
                f"{val.strip()!r}"
            )

    return MergeSpec(
        target=_unquote(m.group("target")),
        source=_unquote(m.group("source")),
        keys=tuple(keys),
        update_cols=tuple(update_cols),
        insert_cols=tuple(icols),
        delete_unmatched_target=m.group("delete") is not None,
    )


def merge_into(
    spark: SparkSession, sql: str, validate_source_keys: bool = True
) -> DataFrame:
    """Execute a MERGE statement against the session's temp-view
    catalog and return the merged frame (also re-registered under the
    target view name, mirroring MERGE's in-place table semantics).

    Lowering: ONE full-outer equi-join on the key columns (eqNullSafe —
    NULL keys merge like values, as in writers.merge_upsert_df), row
    presence tracked by sentinel columns on each side (never by key
    nullability — ADVICE r04), and per-column winners:

    - key:                          COALESCE(source, target)
    - matched row, col in SET:      source value
    - matched row, col not in SET:  target value (MERGE leaves it)
    - source-only row:              INSERT-listed columns, else NULL
    - target-only row:              target value

    The plan is broadcast-friendly (Catalyst broadcasts a small batch
    side) and AQE-skew-safe — identical physical shape to the gated
    ``merge_upsert_orders`` path.

    ``validate_source_keys=True`` (default) enforces SQL MERGE's
    cardinality rule: a staging batch with duplicate key tuples would
    otherwise silently duplicate target rows through the full-outer
    join, where BigQuery raises "UPDATE/MERGE must match at most one
    source row" (ADVICE r05). The guard is one bounded job — a grouped
    count with LIMIT 1 — on the (small) batch side; pass ``False`` only
    when the batch is dedup'd upstream and the extra job matters.

    Targets must be UNDOTTED temp-view names: the lowering reads and
    re-registers through the session temp-view catalog, and qualified
    ``db.tbl`` names are illegal temp-view names — a dotted target is
    rejected here, at the start, instead of surfacing as a confusing
    registration error after the merge ran (ADVICE r05). To run the
    reference's literal dotted BigQuery ids, register the target under
    the table's base name first.
    """
    spec = parse_merge(sql)
    if "." in spec.target:
        raise ValueError(
            f"MERGE target {spec.target!r} is dotted: the temp-view "
            "lowering re-registers the result under the target name, "
            "and qualified names are illegal temp-view names — register "
            "the target as an undotted temp view and merge into that"
        )
    target = spark.table(spec.target)
    source = spark.table(spec.source)
    for k in (*spec.keys, *spec.update_cols):
        if k not in target.columns or k not in source.columns:
            raise ValueError(f"column {k!r} missing from target or source")
    unknown = [c for c in spec.insert_cols if c not in target.columns]
    if unknown:
        raise ValueError(f"INSERT columns not in target schema: {unknown}")
    missing_src = [c for c in spec.insert_cols if c not in source.columns]
    if missing_src:
        # without this, S.<col> surfaces later as an opaque
        # AnalysisException instead of the module's loud contract error
        raise ValueError(
            f"INSERT columns not in source frame: {missing_src}"
        )
    if validate_source_keys:
        # Reserved-prefix alias, not .count(): a key column literally
        # named "count" would make the bare filter ambiguous and die
        # with an opaque AnalysisException (ADVICE r6), consistent with
        # the __merge_tgt_present naming below.
        dup = (
            source.groupBy(*spec.keys)
            .agg(F.count(F.lit(1)).alias("__merge_dup_n"))
            .filter(F.col("__merge_dup_n") > 1)
            .limit(1)
            .collect()
        )
        if dup:
            key_vals = {k: dup[0][k] for k in spec.keys}
            raise ValueError(
                "MERGE source has duplicate rows for key "
                f"{key_vals} (SQL MERGE cardinality violation: each "
                "target row must match at most one source row); "
                "dropDuplicates the batch or pass "
                "validate_source_keys=False"
            )

    t_mark, s_mark = "__merge_tgt_present", "__merge_src_present"
    for reserved in (t_mark, s_mark):
        if reserved in target.columns or reserved in source.columns:
            raise ValueError(f"column name {reserved!r} is reserved by merge")
    t = target.withColumn(t_mark, F.lit(True)).alias("t")
    s = source.withColumn(s_mark, F.lit(True)).alias("s")

    cond = None
    for k in spec.keys:
        c = F.col(f"t.{k}").eqNullSafe(F.col(f"s.{k}"))
        cond = c if cond is None else (cond & c)
    matched = F.col(f"t.{t_mark}").isNotNull() & F.col(f"s.{s_mark}").isNotNull()
    src_only = F.col(f"t.{t_mark}").isNull()

    cols = []
    for name in target.columns:
        if name in spec.keys:
            cols.append(
                F.coalesce(F.col(f"s.{name}"), F.col(f"t.{name}")).alias(name)
            )
            continue
        upd = F.col(f"s.{name}") if name in spec.update_cols else F.col(f"t.{name}")
        ins = (
            F.col(f"s.{name}")
            if name in spec.insert_cols
            else F.lit(None).cast(target.schema[name].dataType)
        )
        cols.append(
            F.when(matched, upd).when(src_only, ins)
            .otherwise(F.col(f"t.{name}"))
            .alias(name)
        )

    # WHEN NOT MATCHED BY SOURCE THEN DELETE drops exactly the
    # target-only rows — i.e. every surviving row HAS a source row, so
    # the lowering tightens full-outer to right-outer (source side
    # preserved): the deleted rows never materialize, instead of being
    # joined and then filtered. Same exchanges, strictly less join
    # output at scale.
    how = "right_outer" if spec.delete_unmatched_target else "full_outer"
    merged = t.join(s, cond, how).select(*cols)
    merged.createOrReplaceTempView(spec.target)
    return merged
