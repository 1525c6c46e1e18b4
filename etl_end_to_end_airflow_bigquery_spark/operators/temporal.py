"""Temporal join operators Spark lacks natively: as-of (most-recent-prior)
join and the supporting pieces for interval joins.

The reference's closest analog is its latest-wins MERGE semantics
(``dags/fx_pipeline_with_merge.py:173-189``: the newest intra-day analysis
overwrites the previous one) — an as-of join is the read-side dual: for
each observation, the latest state row at-or-before it. FX pipelines use
exactly this to stamp each trade with the prevailing rate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: list[str] | None = None,
) -> DataFrame:
    """ASOF LEFT JOIN: each left row picks up the latest right row with
    ``right_ts <= left_ts`` for the same ``on`` key; unmatched left rows
    keep nulls in the right columns.

    Spark has no ASOF JOIN, and the naive spelling (equi-join on key plus
    a range predicate, then row_number) materializes the full
    left×right-per-key cross-product before pruning — quadratic on hot
    keys, dead at scale. This is the single-pass union-scan form instead:
    tag each side, union, and run ``last(payload, ignorenulls)`` over a
    key-partitioned window ordered by (time, side). Right rows sort
    before left rows at equal timestamps, so the ``<=`` bound holds.
    Cost: one hash exchange of each side on the key + one linear sorted
    scan per key — the same shape streaming engines use for temporal
    joins, and it survives 100 TB because no per-key cross-product ever
    exists.

    Ties between right rows at the same (key, timestamp) resolve to the
    struct-greatest payload — exactly equivalent to pre-deduping the
    right side to one row per (key, ts) keeping ``max(payload)``, but
    without the extra (key, ts) aggregation exchange. Callers get
    determinism by listing a unique column in ``right_cols``; an oracle
    comparing against this operator must pin the same rule (e.g. DuckDB
    ASOF JOIN picks an *unspecified* row on ties — pre-dedup its right
    side with ``GROUP BY key, ts`` + ``max``, see
    ``plans/oracles.py::asof_attribution``).
    """
    right_cols = right_cols or [
        c for c in right.columns if c not in (on, right_ts)
    ]
    payload = F.struct(*[F.col(c) for c in right_cols])
    payload_t = right.select(payload.alias("__p")).schema["__p"].dataType
    left_row = F.struct(*[F.col(c) for c in left.columns])
    left_row_t = left.select(left_row.alias("__l")).schema["__l"].dataType

    tagged_left = left.select(
        F.col(on).alias("__k"),
        F.col(left_ts).alias("__t"),
        F.lit(1).alias("__side"),
        left_row.alias("__l"),
        F.lit(None).cast(payload_t).alias("__p"),
    )
    tagged_right = right.select(
        F.col(on).alias("__k"),
        F.col(right_ts).alias("__t"),
        F.lit(0).alias("__side"),
        F.lit(None).cast(left_row_t).alias("__l"),
        payload.alias("__p"),
    )
    w = (
        Window.partitionBy("__k")
        .orderBy("__t", "__side", "__p")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = (
        tagged_left.unionByName(tagged_right)
        .withColumn("__m", F.last("__p", ignorenulls=True).over(w))
        .filter(F.col("__side") == 1)
    )
    return matched.select(
        "__l.*", *[F.col(f"__m.{c}").alias(c) for c in right_cols]
    )


def resample_ffill(
    df: DataFrame,
    key: str,
    ts: str,
    values: list[str],
    step: str = "1 day",
) -> DataFrame:
    """Gap-fill + forward-fill: densify each key's timeline to a regular
    grid (``step`` apart, from that key's first to last observation) and
    carry the last observed value into the gaps — the time-series
    resampling primitive (FX: publish a rate for every calendar day even
    when no tick arrived; metrics: zero-free daily panels).

    Shape at 100 TB: one grouped agg for per-key bounds, the spine
    explodes JVM-side (``sequence`` — rows never exist on the driver), a
    co-partitioned left join on (key, ts), then one ``last(...,
    ignorenulls)`` window per key. Three hash exchanges, all on ``key``
    — AQE coalesces them; no per-key cross-product, no driver loop.
    """
    bounds = df.groupBy(key).agg(
        F.min(ts).alias("_lo"), F.max(ts).alias("_hi")
    )
    spine = bounds.select(
        key,
        F.explode(
            F.expr(f"sequence(_lo, _hi, interval {step})")
        ).alias(ts),
    )
    joined = spine.join(df, [key, ts], "left")
    w = Window.partitionBy(key).orderBy(ts)
    filled = {v: F.last(v, ignorenulls=True).over(w) for v in values}
    return joined.withColumns(filled)


def resample_interpolate(
    df: DataFrame,
    key: str,
    ts: str,
    value: str,
    step: str = "1 day",
) -> DataFrame:
    """Gap-fill + LINEAR interpolation: like :func:`resample_ffill`, but
    missing grid points take the straight line between the neighboring
    observations instead of carrying the last one — the resampling mode
    for continuous signals (sensor panels, rates) where a step function
    biases downstream aggregates.

    Adds ``is_interpolated`` so consumers can tell observed from
    synthesized. Same scale shape as forward-fill (spine explode + one
    co-partitioned join) plus two ignore-nulls windows per key (previous
    and next observation). The interpolation weight is a ratio of exact
    integer epoch-microsecond differences — exact for ANY ``step``
    (sub-day grids put neighbors on the same calendar day, where a
    day-granular datediff would divide by zero); for whole-day grids the
    double ratio rounds identically to the day-ratio, so oracles built
    on datediff still match bit-for-bit. The denominator is strictly
    positive on interpolated rows (prev/next are distinct observations).
    Grid points outside the key's observed range never exist (the spine
    spans first→last observation).
    """
    bounds = df.groupBy(key).agg(F.min(ts).alias("_lo"), F.max(ts).alias("_hi"))
    spine = bounds.select(
        key,
        F.explode(F.expr(f"sequence(_lo, _hi, interval {step})")).alias(ts),
    )
    joined = spine.join(df, [key, ts], "left")
    w_past = (
        Window.partitionBy(key)
        .orderBy(ts)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_next = (
        Window.partitionBy(key)
        .orderBy(ts)
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    obs_ts = F.when(F.col(value).isNotNull(), F.col(ts))
    staged = joined.withColumns(
        {
            "__prev_v": F.last(value, ignorenulls=True).over(w_past),
            "__prev_t": F.last(obs_ts, ignorenulls=True).over(w_past),
            "__next_v": F.first(value, ignorenulls=True).over(w_next),
            "__next_t": F.first(obs_ts, ignorenulls=True).over(w_next),
        }
    )
    frac = F.expr(
        f"CAST(timestampdiff(MICROSECOND, __prev_t, {ts}) AS DOUBLE)"
        " / CAST(timestampdiff(MICROSECOND, __prev_t, __next_t) AS DOUBLE)"
    )
    interp = F.col("__prev_v") + (F.col("__next_v") - F.col("__prev_v")) * frac
    return staged.select(
        key,
        ts,
        F.when(F.col(value).isNotNull(), F.col(value))
        .otherwise(interp)
        .alias(value),
        F.col(value).isNull().alias("is_interpolated"),
    )


def range_join(
    intervals: DataFrame,
    points: DataFrame,
    lo: str,
    hi: str,
    point: str,
    bin_width_s: int | None = 120,
) -> DataFrame:
    """Bin-bucketed interval join: every (interval, point) pair with
    ``lo <= point <= hi`` (closed bounds), with NO equi-key required.

    Spark's optimizer spells a pure range predicate as
    BroadcastNestedLoopJoin (all-pairs when neither side fits in a
    broadcast) — dead at scale. This is the published time-bin
    technique instead (the same trick behind Databricks' range-join
    hint): quantize time into fixed bins of ``bin_width``, replicate
    each interval once per bin it covers (JVM-side ``sequence`` +
    ``explode`` — ceil(len/W)+1 rows, ≤2 when W ≥ the longest
    interval), tag each point with its single containing bin, then
    hash-join on the bin and re-check the exact predicate as a
    residual. Each qualifying pair meets in exactly one bin (the
    point's own), so no post-join dedup is needed.

    Cost at 100 TB: one hash exchange of each side on ``__bin`` + a
    residual filter — the cross-product never exists. Bin collision
    density (rows per bin) is the knob: pick ``bin_width_s`` near the
    longest interval length. Empty intervals (``lo > hi``) match
    nothing and are dropped up front (also keeps ``sequence`` from
    generating a descending range).

    Bin ids are exact bigint floor-division on ``unix_micros`` — no
    double rounding, correct for pre-1970 (negative-microsecond)
    timestamps too.

    Column names must be disjoint between the two inputs (rename
    before calling) — verified loudly here rather than silently
    suffixed.

    ``bin_width_s=None`` derives the width from the data: one bounded
    aggregate computes ``max(hi - lo)`` (a single scalar to the driver,
    same class as the writers' min/max collects) and the width becomes
    that maximum rounded up to a whole second — the replication-minimal
    choice (every interval spans ≤2 bins). Pass an explicit width when
    the interval length is known statically (no extra job) or when a
    few long outlier intervals would otherwise stretch the bins and
    pile unrelated points into each bucket.
    """
    overlap = set(intervals.columns) & set(points.columns)
    if overlap:
        raise ValueError(
            f"range_join inputs share column names {sorted(overlap)}; "
            "rename one side before joining"
        )
    if bin_width_s is None:
        longest = intervals.agg(
            F.max(
                F.unix_micros(F.col(hi)) - F.unix_micros(F.col(lo))
            ).alias("m")
        ).collect()[0]["m"]
        if longest is None:
            raise ValueError(
                "range_join(bin_width_s=None) on an empty intervals frame"
                " — pass an explicit bin width"
            )
        bin_width_s = max(1, -(-max(longest, 0) // 1_000_000))
    if bin_width_s <= 0:
        raise ValueError(f"bin_width_s must be positive, got {bin_width_s}")
    w_us = f"{int(bin_width_s) * 1_000_000}L"

    def _bin(col: str) -> str:
        # exact floor division for bigints (div truncates toward zero;
        # correct it for negative dividends so pre-epoch bins are right)
        us = f"unix_micros({col})"
        return (
            f"(({us} div {w_us}) - (CASE WHEN {us} % {w_us} < 0"
            " THEN 1 ELSE 0 END))"
        )

    iv = intervals.filter(F.col(lo) <= F.col(hi)).withColumn(
        "__bin",
        F.explode(F.expr(f"sequence({_bin(lo)}, {_bin(hi)})")),
    )
    pt = points.withColumn("__bin", F.expr(_bin(point)))
    return (
        iv.join(pt, "__bin")
        .filter((F.col(lo) <= F.col(point)) & (F.col(point) <= F.col(hi)))
        .drop("__bin")
    )


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    l_lo: str,
    l_hi: str,
    r_lo: str,
    r_hi: str,
    bin_width_s: int = 120,
) -> DataFrame:
    """Interval × interval overlap join (closed bounds: pairs where
    ``l_lo <= r_hi AND r_lo <= l_hi``), no equi-key — the two-sided
    sibling of ``range_join``.

    Both sides replicate across the time bins they cover, the join is
    bin-equality + the exact overlap residual, and each qualifying pair
    is emitted EXACTLY once without any post-join dedup: two
    overlapping intervals share a timestamp, hence share that
    timestamp's bin, and the first shared bin is always
    ``max(bin(l_lo), bin(r_lo))`` (integer ranges intersect starting at
    the larger lower bound) — the guard keeps only that bin's match.
    Dedup-free matters at scale: a distinct on the pair key would be a
    second full shuffle of the join output.

    Replication factor per row is ceil(len/W)+1 bins; pick
    ``bin_width_s`` near the longest interval. Empty intervals
    (``lo > hi``) are dropped on both sides. Same exact bigint bin
    math as ``range_join`` (pre-epoch safe).
    """
    overlap = set(left.columns) & set(right.columns)
    if overlap:
        raise ValueError(
            f"interval_overlap_join inputs share column names "
            f"{sorted(overlap)}; rename one side before joining"
        )
    if bin_width_s <= 0:
        raise ValueError(f"bin_width_s must be positive, got {bin_width_s}")
    w_us = f"{int(bin_width_s) * 1_000_000}L"

    def _bin(col: str) -> str:
        us = f"unix_micros({col})"
        return (
            f"(({us} div {w_us}) - (CASE WHEN {us} % {w_us} < 0"
            " THEN 1 ELSE 0 END))"
        )

    lt = left.filter(F.col(l_lo) <= F.col(l_hi)).withColumn(
        "__bin", F.explode(F.expr(f"sequence({_bin(l_lo)}, {_bin(l_hi)})"))
    )
    rt = right.filter(F.col(r_lo) <= F.col(r_hi)).withColumn(
        "__rbin", F.explode(F.expr(f"sequence({_bin(r_lo)}, {_bin(r_hi)})"))
    )
    first_shared = F.greatest(
        F.expr(_bin(l_lo)), F.expr(_bin(r_lo))
    )
    return (
        lt.join(rt, F.col("__bin") == F.col("__rbin"))
        .filter(
            (F.col(l_lo) <= F.col(r_hi))
            & (F.col(r_lo) <= F.col(l_hi))
            & (F.col("__bin") == first_shared)
        )
        .drop("__bin", "__rbin")
    )
