"""Grid-cell spatial join: within-radius / nearest-neighbor pairing on
planar integer coordinates, without the all-pairs cross join.

The scale pattern (Sedona/PostGIS "grid partition then refine",
same candidate-generation discipline as the MinHash-LSH and
containment dedup operators in this repo): bucket both sides into
square cells of side ``r``; any pair within Euclidean distance ``r``
lands in the same or an adjacent cell (Chebyshev distance <= r implies
cell offsets in {-1,0,1}x{-1,0,1}), so the candidate set is exactly a
9-cell neighborhood equi-join, then an exact distance refine on those
candidates only. Cost is bounded by cell co-occupancy (data density x
cell area), never |L| x |R|.

Design choices for 100 TB:

- The NEIGHBOR EXPANSION (x9) is applied to the side the caller says is
  smaller (dims/stations/warehouses), keeping the big side's rows
  un-replicated; with ``broadcast_right=True`` the exploded small side
  ships to the executors and the big side is never shuffled at all.
- Coordinates are INTEGER fixed-point (callers derive them from keys or
  quantize real lon/lat); distance compares use the SQUARED distance so
  the whole refine stays in exact int64 arithmetic inside codegen — no
  sqrt, no float epsilon, and the DuckDB oracle can reproduce results
  byte-for-byte.
- Cell ids use exact integer FLOOR division
  (``(x - pmod(x, r)) div r`` — bare ``div`` truncates toward zero and
  would merge the cells either side of 0; float ``floor(x / r)`` loses
  exactness past 2^53), the same convention as the bitmap bucketing
  fix (code-review r11).

Reference basis: the reference engine (BigQuery) exposes ST_DWITHIN
over geography; this is the engine-native analog for planar fixed-point
data (SURVEY.md §2.8 scalar-function surface extension).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_NEIGHBOR_OFFSETS = tuple(
    (dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)
)


def grid_within_radius(
    left: DataFrame,
    right: DataFrame,
    r: int,
    left_xy: tuple[str, str],
    right_xy: tuple[str, str],
    broadcast_right: bool = True,
) -> DataFrame:
    """All (left, right) row pairs with squared Euclidean distance
    <= r*r, via 9-cell neighborhood candidate join + exact refine.

    ``left`` and ``right`` must have disjoint column names (the result
    carries every column of both, plus ``d2``). The right side is
    replicated x9 (one row per neighbor cell) — pass the SMALLER side
    as ``right``. With ``broadcast_right`` the candidate join is a
    broadcast hash join (no shuffle of ``left``); set it False when the
    right side is too big to broadcast, which falls back to a shuffle
    equi-join on the cell id.

    Coordinate-magnitude bound (ADVICE r11): the refine is exact int64
    arithmetic ONLY while every coordinate satisfies ``|coord| <
    2**31`` (then ``(lx-rx)**2 + (ly-ry)**2 < 2**63`` cannot wrap
    Spark's non-ANSI long multiply). Quantized lon/lat at micro-degree
    precision (<= 1.8e8) is comfortably inside; validated loudly below
    rather than silently wrapping.
    """
    if r <= 0:
        raise ValueError(f"radius must be positive, got {r}")
    lx, ly = left_xy
    rx, ry = right_xy
    overlap = set(left.columns) & set(right.columns)
    if overlap:
        raise ValueError(f"left/right column names must be disjoint: {overlap}")
    reserved = {"_cx", "_cy", "d2"} & (set(left.columns) | set(right.columns))
    if reserved:
        raise ValueError(
            f"column names {reserved} are reserved by grid_within_radius "
            "(cell ids and the output distance) — rename them on the input"
        )

    def _cell(col: str) -> F.Column:
        # exact int64 floor division (see module docstring)
        return F.expr(f"({col} - pmod({col}, {int(r)})) div {int(r)}")

    lc = left.withColumn("_cx", _cell(lx)).withColumn("_cy", _cell(ly))
    offsets = F.array(
        *[
            F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
            for dx, dy in _NEIGHBOR_OFFSETS
        ]
    )
    rc = (
        right.withColumn("_o", F.explode(offsets))
        .withColumn("_cx", _cell(rx) + F.col("_o.dx"))
        .withColumn("_cy", _cell(ry) + F.col("_o.dy"))
        .drop("_o")
    )
    if broadcast_right:
        rc = F.broadcast(rc)
    # ANSI-safe refine (ADVICE r11): try_* ops turn an int64 wrap into
    # NULL, which the when-branch converts into a LOUD error instead of
    # a silently wrong (possibly negative) distance. Post-join
    # coordinates are non-null (a NULL coord has a NULL cell id and
    # never joins), so NULL here can only mean overflow.
    # operands are widened to BIGINT first (code-review r12): with
    # INT-typed coordinate columns the try_* ops would otherwise run in
    # int32 and raise the overflow error for inputs well inside the
    # documented 2^31 bound.
    dx = f"try_subtract(CAST({lx} AS BIGINT), CAST({rx} AS BIGINT))"
    dy = f"try_subtract(CAST({ly} AS BIGINT), CAST({ry} AS BIGINT))"
    d2_raw = F.expr(
        f"try_add(try_multiply({dx}, {dx}), try_multiply({dy}, {dy}))"
    )
    d2 = F.when(
        d2_raw.isNull(),
        F.expr(
            "raise_error('grid_within_radius: squared distance overflowed"
            " int64 — coordinates exceed the documented 2^31 magnitude"
            " bound')"
        ).cast("long"),
    ).otherwise(d2_raw)
    return (
        lc.join(rc, ["_cx", "_cy"])
        .withColumn("d2", d2)
        .filter(F.col("d2") <= F.lit(int(r) * int(r)))
        .drop("_cx", "_cy")
    )


def hash_point(key: str, mult: int, offset: int, modulus: int) -> F.Column:
    """Deterministic synthetic planar coordinate from an integer key —
    pure int64 arithmetic both engines compute identically
    ((key * mult + offset) mod modulus). Used by fixtures/queries that
    need reproducible geometry over the key-only testdata."""
    return (F.col(key) * F.lit(int(mult)) + F.lit(int(offset))) % F.lit(
        int(modulus)
    )
