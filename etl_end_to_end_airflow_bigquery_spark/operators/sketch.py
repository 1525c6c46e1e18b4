"""Probabilistic sketches, engine-exact: count-min and HyperLogLog.

Sketches are usually treated as "approximate ⇒ unverifiable", but both
structures here are PURE FUNCTIONS of the data once the hash functions
are fixed: md5-derived positions/ranks, integer counter sums, and a
register sum whose terms are exact powers of two (64 terms spanning
< 53 bits of exponent — IEEE-exact and order-independent). The DuckDB
oracle rebuilds the identical sketch, so estimates — not just bounds —
hash-match across engines.

Scale story: a sketch is the canonical 100 TB aggregation shape — the
full pass reduces map-side to a bounded state (d·w counters / m
registers) regardless of input size, then merges by + / max, both
associative. The groupBy plans here partial-aggregate exactly that way.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

CMS_DEPTH = 4      # hash rows
CMS_WIDTH = 256    # counters per row
HLL_M = 64         # registers
# alpha(m=64): the standard HLL bias constant 0.7213/(1+1.079/m)
HLL_ALPHA = 0.7213 / (1.0 + 1.079 / 64.0)


def _bucket(col: str, salt: str, mod: int) -> Column:
    """First 32 md5 bits of 'salt|value' mod ``mod`` (the same portable
    primitive as sampling.hash_bucket)."""
    return (
        F.expr(
            f"conv(substring(md5(concat('{salt}|', CAST({col} AS STRING))),"
            " 1, 8), 16, 10)"
        ).cast("bigint")
        % mod
    )


def cms_table(
    items: DataFrame, col: str, depth: int = CMS_DEPTH, width: int = CMS_WIDTH
) -> DataFrame:
    """Count-min sketch of an item column → (r, pos, cnt): depth rows of
    width counters, each counting the items hashing there. One explode
    by depth (a constant), one grouped sum — the shuffle carries at most
    d·w pre-aggregated rows per partition."""
    rows = F.array(
        *[
            F.struct(
                F.lit(r).alias("r"), _bucket(col, f"cms{r}", width).alias("pos")
            )
            for r in range(depth)
        ]
    )
    return (
        items.select(F.explode(rows).alias("rp"))
        .groupBy(F.col("rp.r").alias("r"), F.col("rp.pos").alias("pos"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_estimates(
    items: DataFrame,
    col: str,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """(item, n_exact, cms_estimate): the min-over-rows point estimate
    for every distinct item, next to its exact count. The sketch never
    underestimates (estimate ≥ exact, asserted in tests); collisions
    show up as overestimates bounded by 2N/width per row."""
    sketch = cms_table(items, col, depth, width)
    exact = items.groupBy(col).agg(F.count(F.lit(1)).alias("n_exact"))
    probes = exact.select(
        col,
        "n_exact",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("r"),
                        _bucket(col, f"cms{r}", width).alias("pos"),
                    )
                    for r in range(depth)
                ]
            )
        ).alias("rp"),
    ).select(col, "n_exact", F.col("rp.r").alias("r"), F.col("rp.pos").alias("pos"))
    return (
        probes.join(F.broadcast(sketch), ["r", "pos"])
        .groupBy(col, "n_exact")
        .agg(F.min("cnt").alias("cms_estimate"))
    )


def hll_ranked(
    items: DataFrame, col: str, cols: list[str], m: int = HLL_M
) -> DataFrame:
    """Per-item HLL primitive shared by the one-shot estimator and the
    mergeable day-state path: (cols..., reg, rank) with reg the md5
    register index and rank the first-1-bit position of a second md5
    slice (+1; all-zero slice caps at 33 — bin() drops leading zeros in
    both engines, so rank = 33 - length(bin(x)) for x > 0)."""
    reg = _bucket(col, "hllreg", m)
    rank_src = F.expr(
        f"conv(substring(md5(concat('hllrank|', CAST({col} AS STRING))),"
        " 9, 8), 16, 10)"
    ).cast("bigint")
    return items.select(
        *cols,
        reg.alias("reg"),
        F.when(rank_src == 0, F.lit(33))
        .otherwise(F.lit(33) - F.length(F.expr(
            f"bin(CAST(conv(substring(md5(concat('hllrank|',"
            f" CAST({col} AS STRING))), 9, 8), 16, 10) AS BIGINT))"
        )))
        .cast("bigint")
        .alias("rank"),
    )


def hll_est_from_registers(
    registers: DataFrame, group_cols: list[str], m: int = HLL_M
) -> DataFrame:
    """Finish an HLL estimate from (group..., reg, mx) register rows —
    the serve-time step of the mergeable path (register tables fold by
    MAX, then this computes α·m²/Σ2^−M_j once). Absent registers
    contribute 2^0 = 1. The 64-term register sum is exact in double
    (powers of two spanning < 53 exponent bits), order-independent."""
    sums = registers.groupBy(*group_cols).agg(
        F.sum(F.pow(F.lit(2.0), -F.col("mx"))).alias("__s"),
        F.count(F.lit(1)).alias("__present"),
    )
    return sums.select(
        *group_cols,
        (
            F.lit(HLL_ALPHA * m * m)
            / (F.col("__s") + (F.lit(m) - F.col("__present")))
        ).alias("hll_estimate"),
    )


def hll_estimate(
    items: DataFrame, col: str, group: str, m: int = HLL_M
) -> DataFrame:
    """Raw HyperLogLog distinct-count estimate per ``group`` →
    (group, n_exact, hll_estimate): m max-rank registers from md5 bits,
    estimate = α·m²/Σ2^−M_j (no small/large-range correction — the raw
    deterministic estimator, so both engines compute the identical
    number; n_exact rides along for the error column).

    The register sum's 64 terms are exact powers of two spanning < 53
    exponent bits, so double addition is exact and order-independent —
    no fixed-point machinery needed.
    """
    ranked = hll_ranked(items, col, [group], m)
    registers = ranked.groupBy(group, "reg").agg(F.max("rank").alias("mx"))
    est = hll_est_from_registers(registers, [group], m)
    exact = items.groupBy(group).agg(
        F.countDistinct(col).alias("n_exact")
    )
    return exact.join(est, group)


BLOOM_K = 3        # hash functions
BLOOM_BITS = 4096  # bitset size (64 longs)


def bloom_bitmask(
    keys: DataFrame, col: str, k: int = BLOOM_K, bits: int = BLOOM_BITS
) -> list[int]:
    """Build a Bloom filter over a (small) key set as a list of
    ``bits/64`` longs — the literal bitmask shape Spark's own runtime
    bloom-join pushes into scans. The build collects ONLY the distinct
    bit positions (bounded by ``bits`` rows regardless of key count);
    the probe side then needs no join at all.
    """
    pos_col = F.explode(
        F.array(*[_bucket(col, f"bloom{i}", bits) for i in range(k)])
    ).alias("pos")
    positions = {r.pos for r in keys.select(pos_col).distinct().collect()}
    words = [0] * (bits // 64)
    for p in positions:
        words[p // 64] |= 1 << (p % 64)
    # Python ints are unbounded; fold to signed 64-bit for LongType
    return [w - (1 << 64) if w >= (1 << 63) else w for w in words]


def bloom_probe(
    col: str, mask: list[int], k: int = BLOOM_K, bits: int = BLOOM_BITS
) -> Column:
    """Row-local membership test against a bloom_bitmask: true iff all
    ``k`` positions are set. Pure bitwise arithmetic on a literal array
    — codegen'd, zero shuffle, zero join (the semi-join reduction that
    prunes a 100 TB probe side before the real join)."""
    arr = "array(" + ", ".join(f"{w}L" for w in mask) + ")"
    conds = []
    for i in range(k):
        pos = (
            f"(CAST(conv(substring(md5(concat('bloom{i}|',"
            f" CAST({col} AS STRING))), 1, 8), 16, 10) AS BIGINT)"
            f" % {bits})"
        )
        conds.append(
            f"((shiftright(element_at({arr},"
            f" CAST({pos} div 64 AS INT) + 1),"
            f" CAST({pos} % 64 AS INT)) & 1) = 1)"
        )
    return F.expr(" AND ".join(conds))


# --- Misra-Gries deterministic heavy-hitter candidates ----------------------

def mg_prune(counts: dict, k: int) -> dict:
    """Order-invariant Misra-Gries summary of EXACT within-part counts:
    subtract d = the (k+1)-th largest count (0 when there are <= k
    distinct items) and keep the positive residuals.

    This is the summary a faithful one-pass MG stream build converges
    to when equal items are adjacent, with two properties the stream
    form lacks: it is a pure function of the part's multiset (row order
    inside a partition cannot change the candidates) and it is fully
    vectorizable. The classic guarantees carry over:

    * size: at most k items survive (everything above the (k+1)-th
      largest — at most k values);
    * undercount: every residual undercounts its true in-part count by
      exactly d, and since >= k+1 items have count >= d,
      ``d <= n_part // (k + 1)``;
    * merge (Agarwal et al., "Mergeable Summaries", PODS'12): summing
      residual weights across parts undercounts each item's TRUE total
      by at most ``sum_p n_p/(k+1) = n/(k+1)``, so every item with
      true count > n/(k+1) survives the merged summary with positive
      weight — candidate recall 1.0 for that threshold.
    """
    if k < 1:
        raise ValueError(f"mg_prune needs k >= 1, got {k}")
    if len(counts) <= k:
        return {i: c for i, c in counts.items() if c > 0}
    d = sorted(counts.values(), reverse=True)[k]
    return {i: c - d for i, c in counts.items() if c > d}


def mg_candidates(df: DataFrame, col: str, k: int) -> DataFrame:
    """Per-physical-partition Misra-Gries summaries (NO raw shuffle —
    the entire point of the structure at 100 TB): each input partition
    is folded map-side into exact local counts (pandas ``value_counts``,
    one vectorized pass per Arrow batch) and pruned to <= ``k``
    ``(item, weight)`` rows by :func:`mg_prune`. Only those bounded
    summaries ever leave the scan stage; the caller merges them with a
    plain ``groupBy(col).sum(weight)`` over k·P rows instead of n.

    The candidate SET may vary with the physical partitioning (each
    part's d depends on its local skew) — which is why consumers must
    recount candidates exactly and filter on the true threshold; the
    final answer is then partitioning-independent. Deliberate pandas
    surface: counting is vectorized per batch and state is one bounded
    dict per partition.
    """

    def _summarize(batches):
        import pandas as pd

        acc: dict = {}
        for pdf in batches:
            for item, c in pdf[col].value_counts().items():
                acc[item] = acc.get(item, 0) + int(c)
        pruned = mg_prune(acc, k)
        yield pd.DataFrame(
            {col: list(pruned.keys()), "mg_weight": list(pruned.values())}
        )

    # item type follows the input column (code-review r12: a hardcoded
    # string field broke/coerced non-string item columns)
    item_type = df.schema[col].dataType.simpleString()
    return df.select(col).mapInPandas(
        _summarize, schema=f"{col} {item_type}, mg_weight bigint"
    )


def mg_prune_df(summary: DataFrame, col: str, k: int) -> DataFrame:
    """Relational :func:`mg_prune` over a ``(col, mg_weight)`` frame —
    the re-prune a STREAMING fold applies after merging each batch's
    summaries into state, keeping state bounded at k rows (Mergeable
    Summaries PODS'12: merge-then-prune preserves the total
    n/(k+1) undercount bound, so the candidate-recall guarantee
    survives arbitrary micro-batch slicing).

    The global window is over the summary frame itself (<= k + one
    batch's candidates — state-sized, never data-sized), so the single
    partition is bounded by construction. d = the (k+1)-th largest
    weight is tie-safe: equal weights across the rank boundary yield
    the same d whichever row ranks k+1.
    """
    from pyspark.sql import Window

    w = Window.orderBy(F.desc("mg_weight"), col)
    ranked = summary.withColumn("_rn", F.row_number().over(w))
    d = ranked.agg(
        F.coalesce(
            F.max(F.when(F.col("_rn") == k + 1, F.col("mg_weight"))),
            F.lit(0).cast("bigint"),
        ).alias("_d")
    )
    return (
        ranked.crossJoin(F.broadcast(d))
        .withColumn("mg_weight", F.col("mg_weight") - F.col("_d"))
        .filter(F.col("mg_weight") > 0)
        .select(col, "mg_weight")
    )
