"""Vector similarity search over an embedding column (extension pack).

Two paths, per the standard ANN playbook:

- **brute-force cosine top-k** (the exactness baseline): queries ×
  corpus, dot products computed engine-side. Cost O(|Q|·N·d) — fine for
  small |Q| at any N because the corpus side streams; the per-query
  top-k is a windowed rank, not a global sort.
- **LSH-bucketed ANN** (the scale path): random-hyperplane signatures
  (sign of ⟨e, h_p⟩ over P fixed planes) bucket the corpus; search only
  the query's bucket. At 100 TB the bucket column is a partition key —
  candidate scans touch one bucket, not the corpus.

Numerics are engineered for cross-engine exactness without leaving the
row: float32 embeddings are cast to double, each per-dimension product
is scaled by 1e12 and floored to BIGINT, and the integer sum — exact and
associative, so partitioning-independent — folds in-row via
``aggregate()`` (no explode, no extra shuffle). The DuckDB oracle runs
the same scaled-integer arithmetic; sqrt/divide then operate on
identical doubles. Hyperplanes come from a fixed numpy seed and are
embedded as literals in both engines.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import spread_small_scan as _spread  # guide §2.5

N_PLANES = 8
PLANE_SEED = 7
EMB_DIM = 64
DEC = "decimal(25,12)"  # exact accumulator for grouped vector averages
# Fixed-point scale for exact dot products: |x|<0.6, d=64 ⇒ |dot·1e12| ≲
# 2e13 ≪ 2^53, so the BIGINT sum converts to double exactly.
DOT_SCALE = "1000000000000.0"


def dot_fold(a: str, b: str) -> str:
    """Spark SQL expr: exact scaled-integer dot product of two double
    arrays, folded in-row (see module docstring)."""
    return (
        f"CAST(aggregate(zip_with({a}, {b}, (x, y) -> x * y), "
        f"CAST(0 AS BIGINT), (acc, p) -> acc + floor(p * {DOT_SCALE})) "
        f"AS DOUBLE) / {DOT_SCALE}"
    )


def hyperplanes(
    n_planes: int = N_PLANES, dim: int = EMB_DIM, seed: int = PLANE_SEED
) -> np.ndarray:
    """Fixed random hyperplanes, identical across engines/runs. Distinct
    ``seed``s give the independent tables of multi-table LSH."""
    return np.random.RandomState(seed).randn(n_planes, dim)


def _vectors(df: DataFrame) -> DataFrame:
    """vec_id + embedding cast float→double + exact squared norm."""
    return df.select(
        "vec_id",
        "label",
        F.expr("transform(embedding, x -> cast(x as double))").alias("e"),
    ).withColumn("norm2", F.expr(dot_fold("e", "e")))


def cosine_topk(
    embeddings: DataFrame,
    query_pred: str = "vec_id < 5",
    k: int = 5,
) -> DataFrame:
    """Brute-force cosine top-k: (q_id, neighbor_id, cosine, rank).

    Query side broadcast; one pass over the corpus computes the dot
    in-row; the per-query top-k is a window rank partitioned by query —
    the only shuffle is on q_id.
    """
    v = _vectors(embeddings)
    q = v.filter(query_pred).select(
        F.col("vec_id").alias("q_id"),
        F.col("e").alias("qe"),
        F.col("norm2").alias("qn"),
    )
    scored = (
        F.broadcast(q)
        .crossJoin(v.select("vec_id", "e", "norm2"))
        .filter(F.col("q_id") != F.col("vec_id"))
        .select(
            "q_id",
            "vec_id",
            (
                F.expr(dot_fold("qe", "e"))
                / (F.sqrt("qn") * F.sqrt("norm2"))
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cosine").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
        .select("q_id", F.col("vec_id").alias("neighbor_id"), "cosine", "rank")
    )


def lsh_buckets(
    spark: SparkSession,
    embeddings: DataFrame,
    dim: int = EMB_DIM,
    seed: int = PLANE_SEED,
) -> DataFrame:
    """vec_id → LSH bucket id (random-hyperplane sign bits).

    Plane dots use the same exact fold, so the sign — and therefore the
    bucket — is engine-exact. One broadcast of P planes, one grouped sum
    over (vec, plane) sign bits.
    """
    del spark  # kept in the signature for API compatibility
    return _with_buckets(_vectors(embeddings), dim=dim, seed=seed).select(
        "vec_id", "bucket"
    )


def _with_buckets(
    v: DataFrame, dim: int = EMB_DIM, seed: int = PLANE_SEED
) -> DataFrame:
    """``v`` + its LSH ``bucket`` column, computed IN-ROW (r15, guide
    §2.4): the hyperplanes are compile-time constants (fixed numpy
    seed), so the per-plane sign bits fold over a literal plane array
    in one projection — the broadcast cross of P planes and the
    grouped bit-sum exchange of the r14 spelling are gone, and callers
    that need (e, norm2, bucket) together skip the ``vec_id`` re-join.
    The fold sums the same CASE/shiftleft BIGINT terms in plane order
    (integer adds — associative), so buckets are bit-identical."""
    # one parsed SQL expression — see _cents_arr for why not F.lit
    planes_arr = F.expr(
        "array("
        + ",".join(
            "named_struct('plane_idx', {i}, 'w', array({w}))".format(
                i=i, w=",".join(_sql_double(x) for x in row)
            )
            for i, row in enumerate(hyperplanes(dim=dim, seed=seed))
        )
        + ")"
    )
    dot = dot_fold("e", "pl.w")
    bucket = F.expr(
        "aggregate(__planes, CAST(0 AS BIGINT), (accb, pl) -> accb + "
        f"(CASE WHEN {dot} >= 0 THEN shiftleft(CAST(1 AS BIGINT), "
        "pl.plane_idx) ELSE CAST(0 AS BIGINT) END))"
    )
    return (
        v.withColumn("__planes", planes_arr)
        .withColumn("bucket", bucket)
        .drop("__planes")
    )


def ann_lsh_topk(
    spark: SparkSession,
    embeddings: DataFrame,
    query_pred: str = "vec_id < 5",
    k: int = 3,
    dim: int = EMB_DIM,
    n_planes: int = N_PLANES,
    probe_hamming: int = 0,
) -> DataFrame:
    """ANN via LSH buckets: top-k cosine *within the query's bucket(s)*.

    (q_id, neighbor_id, bucket, cosine, rank). Recall trades against the
    number of planes; candidates shrink ~2^-P per bucket so the pairwise
    stage touches a constant fraction of the corpus. The candidate join
    keys on the bucket — at scale, a partition-pruned scan.

    ``probe_hamming=1`` is the multi-probe recall knob: each query also
    probes the P buckets at Hamming distance 1 (one sign bit flipped —
    the buckets a near neighbor most likely fell into when its dot with
    one hyperplane landed on the other side of zero). Candidate cost
    grows ×(P+1) buckets ≈ ×(P+1)/2^P of the corpus — still bucket-keyed
    and partition-pruned; each corpus vector lives in exactly one bucket,
    so no candidate dedup stage is needed.
    """
    if probe_hamming not in (0, 1):
        raise ValueError("probe_hamming must be 0 or 1")
    # r15 (guide §2.4): bucket computed in-row (literal planes) — no
    # bucket join; the candidate join keys the in-row bucket directly.
    v = _vectors(embeddings)
    vb = _with_buckets(v, dim=dim).select("vec_id", "e", "norm2", "bucket")
    q = vb.filter(query_pred).select(
        F.col("vec_id").alias("q_id"),
        F.col("e").alias("qe"),
        F.col("norm2").alias("qn"),
        F.col("bucket"),
    )
    if probe_hamming == 1:
        flips = ", ".join(f"bucket ^ {1 << i}" for i in range(n_planes))
        q = q.select(
            "q_id",
            "qe",
            "qn",
            F.explode(F.expr(f"array(bucket, {flips})")).alias("bucket"),
        )
    scored = (
        F.broadcast(q)
        .join(vb, "bucket")
        .filter(F.col("q_id") != F.col("vec_id"))
        .select(
            "q_id",
            "vec_id",
            "bucket",
            (
                F.expr(dot_fold("qe", "e"))
                / (F.sqrt("qn") * F.sqrt("norm2"))
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cosine").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
        .select("q_id", F.col("vec_id").alias("neighbor_id"), "bucket", "cosine", "rank")
    )


TABLE_SEED_STRIDE = 101  # table t hashes with seed PLANE_SEED + t·stride


def ann_lsh_multitable(
    spark: SparkSession,
    embeddings: DataFrame,
    query_pred: str = "vec_id < 5",
    k: int = 3,
    dim: int = EMB_DIM,
    n_tables: int = 4,
) -> DataFrame:
    """Multi-table LSH ANN: L independent hyperplane tables, candidates
    OR-combined — the *production* recall lever (recall = 1−(1−p^P)^L vs
    a single table's p^P; at p=0.9, P=8: 0.43 → 0.90 with L=4).

    (q_id, neighbor_id, cosine, rank). Each table is its own bucket
    column — at scale, L bucket-partitioned index tables, each probed
    with one partition-pruned scan; candidate lists union and dedup on
    (q_id, vec_id) before the (unchanged) scoring/rank stage, so a pair
    found by several tables is scored once.
    """
    if n_tables < 1:
        raise ValueError("n_tables must be >= 1")
    v = _vectors(embeddings)
    qv = v.filter(query_pred).select(
        F.col("vec_id").alias("q_id"),
        F.col("e").alias("qe"),
        F.col("norm2").alias("qn"),
    )
    cands = None
    for t in range(n_tables):
        # r15: per-table buckets in-row (literal planes) on both sides —
        # the per-table bucket join against the corpus disappears.
        bt = _with_buckets(
            v, dim=dim, seed=PLANE_SEED + t * TABLE_SEED_STRIDE
        ).select("vec_id", "bucket")
        qb = bt.filter(query_pred).select(
            F.col("vec_id").alias("q_id"), "bucket"
        )
        ct = F.broadcast(qb).join(bt, "bucket").select("q_id", "vec_id")
        cands = ct if cands is None else cands.union(ct)
    cands = cands.filter(F.col("q_id") != F.col("vec_id")).distinct()
    scored = (
        cands.join(F.broadcast(qv), "q_id")
        .join(v.select("vec_id", "e", "norm2"), "vec_id")
        .select(
            "q_id",
            "vec_id",
            (
                F.expr(dot_fold("qe", "e")) / (F.sqrt("qn") * F.sqrt("norm2"))
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cosine").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
        .select("q_id", F.col("vec_id").alias("neighbor_id"), "cosine", "rank")
    )


N_IVF_SEEDS = 8
NEAR_DUP_COSINE = 0.95


def embedding_near_dups(
    spark: SparkSession,
    embeddings: DataFrame,
    threshold: float = NEAR_DUP_COSINE,
    dim: int = EMB_DIM,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (vec_a < vec_b, cosine).

    Scale path: candidates are restricted to same-LSH-bucket pairs (near
    duplicates at cosine ≥ 0.95 almost surely agree on every hyperplane
    sign), so the pairwise stage runs within buckets — ~2^-P of the
    all-pairs cost — and the bucket is the shuffle/partition key.
    """
    v = _vectors(embeddings)
    vb = _with_buckets(v, dim=dim).select(
        "vec_id", "e", "norm2", "bucket"
    ).repartition("bucket")  # exchange barrier → self-join reuses one computation
    a = vb.alias("a")
    b = vb.alias("b")
    pairs = a.join(
        b,
        (F.col("a.bucket") == F.col("b.bucket"))
        & (F.col("a.vec_id") < F.col("b.vec_id")),
    ).select(
        F.col("a.vec_id").alias("vec_a"),
        F.col("b.vec_id").alias("vec_b"),
        (
            F.expr(dot_fold("a.e", "b.e"))
            / (F.sqrt(F.col("a.norm2")) * F.sqrt(F.col("b.norm2")))
        ).alias("cosine"),
    )
    return pairs.filter(F.col("cosine") >= threshold)


def embedding_decontaminate(
    spark: SparkSession,
    embeddings: DataFrame,
    eval_pred: "Column",
    threshold: float = NEAR_DUP_COSINE,
    dim: int = EMB_DIM,
) -> DataFrame:
    """Semantic decontamination: find TRAIN vectors that are
    near-duplicates (cosine ≥ threshold) of any EVAL vector — the
    embedding-space sibling of n-gram decontamination
    (``decontaminate_ngrams``), catching paraphrased benchmark leakage
    that exact n-grams miss (the check modern training pipelines run
    against eval sets; see e.g. the GPT-3/Llama contamination
    appendices).

    ``eval_pred`` is a boolean Column over the embeddings frame marking
    the eval side; everything else is train. Asymmetric LSH-bucket
    join: both sides get the same hyperplane signature, candidates are
    same-bucket (train, eval) pairs only — at 100 TB the cost is
    Σ|train_bucket|·|eval_bucket|, not |train|·|eval|, and the bucket
    is the shuffle key. Same exact fixed-point dot machinery as
    ``embedding_near_dups``, so the result is engine-exact.

    Returns (train_id, eval_id, cosine) — one row per leaking pair;
    downstream either drops the train docs or audits the pairs.
    """
    v = _vectors(embeddings)
    vb = _with_buckets(v, dim=dim).select(
        "vec_id", "e", "norm2", "bucket", eval_pred.alias("__is_eval")
    ).repartition("bucket")
    t = vb.filter(~F.col("__is_eval")).alias("t")
    q = vb.filter(F.col("__is_eval")).alias("q")
    pairs = t.join(
        q, F.col("t.bucket") == F.col("q.bucket")
    ).select(
        F.col("t.vec_id").alias("train_id"),
        F.col("q.vec_id").alias("eval_id"),
        (
            F.expr(dot_fold("t.e", "q.e"))
            / (F.sqrt(F.col("t.norm2")) * F.sqrt(F.col("q.norm2")))
        ).alias("cosine"),
    )
    return pairs.filter(F.col("cosine") >= threshold)


def ivf_cells(embeddings: DataFrame, n_seeds: int = N_IVF_SEEDS) -> DataFrame:
    """vec_id → IVF cell (nearest seed by cosine).

    Seeds are the first ``n_seeds`` vectors by vec_id — deterministic
    coarse quantizer initialization (a production index would k-means
    them; the partition/search mechanics are identical and this keeps
    the assignment exactly reproducible in any engine). Cell assignment
    uses the same exact dot fold, so the partitioning is engine-exact.
    """
    v = _vectors(embeddings)
    # r15 (guide §2.4): seeds are n_seeds bounded rows — collect them
    # and assign in-row (projection; no crossJoin, no argmax exchange).
    # Same dots, same tie rule → identical assignments.
    seed_rows = (
        v.filter(F.col("vec_id") < n_seeds)
        .select(
            F.col("vec_id").alias("cell"),
            F.col("e").alias("ce"),
            F.col("norm2").alias("cn"),
        )
        .collect()
    )
    return _with_cells_lit(v, seed_rows).select("vec_id", "cell")


def _sql_double(x: float) -> str:
    """Shortest-round-trip double literal (``repr`` → Java
    ``parseDouble`` is IEEE-exact both ways), ``D``-suffixed."""
    return repr(float(x)) + "D"


def _cents_arr(cent_rows) -> "F.Column":
    """Literal ``array<struct<cell,ce,cn>>`` from collected centroid
    rows — the K-row driver-side centroid state every Lloyd round
    already materializes (``ivf_cells_kmeans``), re-entered into the
    plan as a literal so assignment can run IN-ROW (guide §2.4: the
    crossJoin + argmax-aggregate exchange disappears; see
    :func:`_with_cells_lit`). Doubles round-trip driver↔plan
    bit-exactly (same IEEE values), so results are unchanged.

    Built as ONE parsed SQL expression, not per-element ``F.lit``
    composition: K·d literals as individual py4j Column calls cost
    seconds of driver time PER QUERY CONSTRUCTION (measured — the
    first spelling of this refactor was driver-bound, guide §7.3);
    one ``expr()`` parse of the same text is milliseconds. The
    optimizer constant-folds the parsed tree to a single Literal."""
    return F.expr(
        "array("
        + ",".join(
            "named_struct('cell', CAST({c} AS BIGINT), 'ce', array({ce}),"
            " 'cn', {cn})".format(
                c=int(r["cell"]),
                ce=",".join(_sql_double(x) for x in r["ce"]),
                cn=_sql_double(r["cn"]),
            )
            for r in cent_rows
        )
        + ")"
    )


def _with_cells_lit(
    v: DataFrame, cent_rows, keep_centroid: bool = False
) -> DataFrame:
    """``v`` + its nearest-centroid ``cell`` column, computed IN-ROW
    over a literal centroid array — a pure projection: zero exchanges,
    zero joins, where :func:`_assign_cells` costs a broadcast cross +
    a grouped struct-max exchange (guide §2.4 "remove shuffles
    outright"). EXACT-identical to the aggregate spelling: the cosine
    is the same ``dot_fold`` fixed-point expression on the same
    doubles, and ``array_max`` over ``struct(cos_to_seed, neg_cell)``
    uses the very struct ordering ``F.max`` used — max cosine, ties →
    lowest cell (A/B-verified equal at sf0.01/sf0.1).

    ``keep_centroid=True`` additionally emits the winning centroid's
    ``ce``/``cn`` (rides in the same struct; the comparator never
    reaches those fields because ``neg_cell`` is unique) so residual
    computation needs no join back to the centroid table.
    """
    dot = dot_fold("e", "c.ce")
    best = F.expr(
        "array_max(transform(__cents, c -> struct("
        f"{dot} / (sqrt(norm2) * sqrt(c.cn)) AS cos_to_seed, "
        "-c.cell AS neg_cell, c.ce AS ce, c.cn AS cn)))"
    )
    out = (
        v.withColumn("__cents", _cents_arr(cent_rows))
        .withColumn("__best", best)
        .withColumn("cell", -F.col("__best.neg_cell"))
    )
    if keep_centroid:
        out = out.withColumn("__ce", F.col("__best.ce")).withColumn(
            "__cn", F.col("__best.cn")
        )
    return out.drop("__cents", "__best")


def _probe_cells_lit(q: DataFrame, cent_rows, nprobe: int) -> DataFrame:
    """Per-query top-``nprobe`` centroids by cosine, IN-ROW (explode of
    a sorted literal-array slice) — replaces the broadcast-cross +
    row_number window of the probe stage with a projection (guide
    §2.4). Ordering is EXACT-identical to the window spelling
    ``orderBy(cos_to_seed DESC, cell)``: ``array_sort`` on
    ``struct(neg_cos, cell, ce, cn)`` compares neg_cos ascending
    (= cosine descending), then cell ascending; ce/cn ride along for
    the residual/LUT stage (never compared — (neg_cos, cell) is
    already a total order).

    ``q`` must carry ``qe``/``qn``; output adds (cell, ce, cn) one row
    per probed cell.
    """
    dot = dot_fold("qe", "c.ce")
    probes = F.expr(
        f"slice(array_sort(transform(__cents, c -> struct("
        f"-({dot} / (sqrt(qn) * sqrt(c.cn))) AS neg_cos, "
        f"c.cell AS cell, c.ce AS ce, c.cn AS cn))), 1, {int(nprobe)})"
    )
    return (
        q.withColumn("__cents", _cents_arr(cent_rows))
        .withColumn("__p", F.explode(probes))
        .select(
            *[c for c in q.columns],
            F.col("__p.cell").alias("cell"),
            F.col("__p.ce").alias("ce"),
            F.col("__p.cn").alias("cn"),
        )
    )


def _argmax_cell(scored: DataFrame) -> DataFrame:
    """(vec_id, cell, cos_to_seed) → (vec_id, cell) keeping the highest
    cosine, ties → lowest cell id.

    Struct-max aggregation, NOT a row_number window: a grouped max gets
    partial aggregation map-side, so only ~N pre-aggregated rows cross
    the exchange instead of the full N·K scored cross product being
    shuffled and sorted (VERDICT r03 item 5). The tie rule is pinned
    inside the struct ordering (max cosine, then max of the NEGATED cell
    = lowest cell) — fully deterministic, same result as the window
    spelling."""
    return (
        scored.groupBy("vec_id")
        .agg(
            F.max(
                F.struct(
                    F.col("cos_to_seed"), (-F.col("cell")).alias("neg_cell")
                )
            ).alias("__m")
        )
        .select("vec_id", (-F.col("__m.neg_cell")).alias("cell"))
    )


KMEANS_ITERS = 2
MEAN_SCALE = "1000000000000.0"  # fixed-point scale for exact centroid means

# Quantizer TRAINING sample (VERDICT r04 item 2): Lloyd refinement runs
# on a deterministic hash sample of the corpus, not the corpus — the
# FAISS practice (train on a bounded sample, assign/encode everything).
# The sample is a pure function of vec_id (same md5-bucket scheme as
# operators.sampling.hash_bucket), so membership is identical across
# engines, partitionings, and re-runs, and the DuckDB oracles apply the
# same predicate. At 100 TB this turns the n_iters training scans from
# full-corpus passes into sample passes; assignment and encoding still
# see every vector.
TRAIN_FRACTION = 0.5
TRAIN_SALT = "qtrain"
_TRAIN_BUCKETS = 10_000


def _train_sample(df: DataFrame, fraction: float = TRAIN_FRACTION) -> DataFrame:
    """Deterministic Bernoulli training sample keyed on vec_id."""
    if not 0.0 < fraction <= 1.0:
        raise ValueError(f"train fraction must be in (0,1], got {fraction}")
    if fraction >= 1.0:
        return df
    cutoff = int(round(fraction * _TRAIN_BUCKETS))
    h = F.expr(
        f"conv(substring(md5(concat('{TRAIN_SALT}|', "
        f"CAST(vec_id AS STRING))), 1, 8), 16, 10)"
    ).cast("bigint")
    return df.filter((h % _TRAIN_BUCKETS) < cutoff)


def _assign_cells(v: DataFrame, centroids: DataFrame) -> DataFrame:
    """vec_id → nearest centroid by cosine (ties → lowest cell id).

    One broadcast of the K centroids, one in-row dot per (vector,
    centroid), argmax via a partial-aggregating struct max
    (:func:`_argmax_cell`) — O(N·K·d) compute but only ~N rows ever
    cross the exchange."""
    scored = (
        v.select("vec_id", "e", "norm2")
        .crossJoin(F.broadcast(centroids))
        .select(
            "vec_id",
            "cell",
            (
                F.expr(dot_fold("e", "ce")) / (F.sqrt("norm2") * F.sqrt("cn"))
            ).alias("cos_to_seed"),
        )
    )
    return _argmax_cell(scored)


def ivf_cells_kmeans(
    embeddings: DataFrame,
    n_seeds: int = N_IVF_SEEDS,
    n_iters: int = KMEANS_ITERS,
    dim: int = EMB_DIM,
    train_fraction: float = TRAIN_FRACTION,
) -> tuple[DataFrame, DataFrame]:
    """Production coarse quantizer: deterministic seeded Lloyd k-means
    (VERDICT r02 item 6). Returns (cells, centroids) where cells =
    (vec_id, cell) and centroids = (cell, ce, cn).

    Init = the first ``n_seeds`` vectors by vec_id (same deterministic
    seeding as :func:`ivf_cells`); each Lloyd round reassigns the
    TRAINING SAMPLE (``train_fraction`` of the corpus by deterministic
    vec_id hash — see :func:`_train_sample`) to the nearest centroid
    and recomputes centroids as the per-cell, per-dimension mean —
    entirely JVM-side: exact fixed-point SUMs keyed (cell, dim) with
    map-side partial aggregation (the exchange carries K·d rows),
    overflow-proof via a decimal(38,0) accumulator; the assignment is a
    broadcast cross of K centroids folded by a partial-aggregating
    struct max. Engine-exact: scaled-int sums and a pinned divide order
    make every centroid component bit-identical in the DuckDB oracle,
    so cell assignments — and therefore search results — hash-match.
    Cells that lose all sampled members drop out (deterministically, in
    both engines).

    At 100 TB this is the index-build step: n_iters bounded scans of
    the persisted training sample (FAISS practice: train on a sample,
    assign everything), then ONE full-corpus assignment pass. Each
    round's centroid table (K rows — bounded regardless of corpus size)
    is materialized to the driver and re-created as a literal frame:
    without this, every round's plan embeds COPIES of all prior rounds'
    subtrees (cents is referenced by both the assignment and the means
    of the next round), so the lineage grows exponentially in n_iters —
    fatal at production iteration counts. The K-row collect is the same
    driver-side centroid state every distributed k-means keeps (e.g.
    Spark MLlib's KMeans); doubles round-trip bit-exactly, verified by
    an A/B run (identical search results, ~10% faster even at 2
    rounds).
    """
    va, cents = kmeans_vectors(embeddings, n_seeds, n_iters, dim, train_fraction)
    return va.select("vec_id", "cell"), cents


def kmeans_vectors(
    embeddings: DataFrame,
    n_seeds: int = N_IVF_SEEDS,
    n_iters: int = KMEANS_ITERS,
    dim: int = EMB_DIM,
    train_fraction: float = TRAIN_FRACTION,
) -> tuple[DataFrame, DataFrame]:
    """:func:`ivf_cells_kmeans` with the full vector columns kept:
    returns (va, cents) where ``va`` is :func:`_vectors` of the corpus
    PLUS its ``cell`` column — computed in ONE in-row projection over
    the literal centroids (r15, guide §2.4), so callers that need
    (e, norm2, cell) together (the IVF search lists, SemDeDup's
    within-cell join, the residual encode) no longer pay the
    ``v.join(cells, "vec_id")`` shuffle that re-attaching the
    assignment used to cost. Training arithmetic is unchanged — same
    exact fixed-point means, same tie rules — so centroids and
    assignments are bit-identical to the r14 spelling (A/B-verified)."""
    va, cent_rows = _kmeans_state(embeddings, n_seeds, n_iters, dim, train_fraction)
    cents = embeddings.sparkSession.createDataFrame(
        cent_rows, schema="cell bigint, ce array<double>, cn double"
    )
    return va, cents


def _kmeans_state(
    embeddings: DataFrame,
    n_seeds: int = N_IVF_SEEDS,
    n_iters: int = KMEANS_ITERS,
    dim: int = EMB_DIM,
    train_fraction: float = TRAIN_FRACTION,
) -> tuple[DataFrame, list]:
    """(va, cent_rows): the Lloyd trainer returning the collected
    centroid ROWS (the driver-side state each round materializes
    anyway) so in-row consumers skip re-collecting the literal frame."""
    v = _vectors(embeddings)
    # Lloyd refinement runs on the deterministic training sample (see
    # _train_sample); only the FINAL assignment scans the full corpus.
    # The sample is persisted across rounds — n_iters re-scans of the
    # source would otherwise re-read parquet and recompute norms per
    # round, and at 100 TB the training set is the bounded piece you
    # want resident, exactly like FAISS keeping its train matrix in RAM.
    tv = _spread(_train_sample(v, train_fraction)).persist()
    # Seed centroids collected up front (n_seeds rows — the same bounded
    # driver state every later round keeps anyway): with literal
    # centroids, EVERY round's assignment is an in-row projection
    # (guide §2.4) — the per-round crossJoin + struct-max exchange of
    # the r14 spelling is gone, and each Lloyd round is exactly one
    # grouped-means job over (cell, dim).
    cent_rows = (
        v.filter(F.col("vec_id") < n_seeds)
        .select(
            F.col("vec_id").alias("cell"),
            F.col("e").alias("ce"),
            F.col("norm2").alias("cn"),
        )
        .collect()
    )
    scale = F.lit(float(MEAN_SCALE))
    for _ in range(n_iters):
        member = _with_cells_lit(tv, cent_rows)
        # Per-cell per-dimension exact fixed-point means, keyed
        # (cell, dim) after a posexplode rather than as `dim` separate
        # wide aggregates: hash partial aggregation combines map-side,
        # so the exchange still carries only K·d pre-aggregated rows,
        # and the narrow plan codegens ~4× faster than the 64-column
        # decimal aggregate it replaces (measured 1.07 s vs 4.02 s
        # first-compile, 0.07 s vs 0.18 s warm, bit-identical output).
        # decimal(38,0) accumulator (ADVICE r03): each member
        # contributes up to ~1e12 per dimension, so a BIGINT sum
        # overflows past ~9.2M members per cell under ANSI mode;
        # decimal(38,0) holds ~1e26 members.
        ex = member.select("cell", F.posexplode("e").alias("__p", "__v"))
        sums = ex.groupBy("cell", "__p").agg(
            F.count(F.lit(1)).alias("__n"),
            F.sum(
                F.floor(F.col("__v") * scale).cast("decimal(38,0)")
            ).alias("__s"),
        )
        comp = sums.select(
            "cell",
            "__p",
            (F.col("__s").cast("double") / scale / F.col("__n")).alias("__c"),
        )
        cents = (
            comp.groupBy("cell")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("__p", "__c"))),
                    lambda s: s["__c"],
                ).alias("ce")
            )
            .withColumn("cn", F.expr(dot_fold("ce", "ce")))
        )
        cent_rows = cents.collect()
    tv.unpersist()
    return _with_cells_lit(_spread(v), cent_rows), cent_rows


def ivf_topk_kmeans(
    embeddings: DataFrame,
    query_pred: str = "vec_id < 5",
    k: int = 3,
    n_seeds: int = N_IVF_SEEDS,
    n_iters: int = KMEANS_ITERS,
    nprobe: int = 2,
) -> DataFrame:
    """IVF search over the k-means quantizer (q_id, neighbor_id, cell,
    cosine, rank): rank the Lloyd centroids per query, probe the top
    ``nprobe`` cells, exact top-k within the probed lists. Identical
    search mechanics to :func:`ivf_topk`; only the quantizer (and hence
    cell quality/balance) differs."""
    if nprobe < 1 or nprobe > n_seeds:
        raise ValueError("nprobe must be in 1..n_seeds")
    # r15 (guide §2.4): the quantizer returns vectors WITH their cell —
    # a projection — so the probed-list side needs no vec_id re-join;
    # probe ranking is the in-row sorted-slice over literal centroids
    # instead of a broadcast cross + row_number window. Search results
    # are bit-identical (same dots, same tie order).
    va, cents = kmeans_vectors(embeddings, n_seeds, n_iters)
    cent_rows = cents.collect()
    vc = va.select("vec_id", "e", "norm2", "cell")
    q = _probe_cells_lit(
        va.filter(query_pred).select(
            F.col("vec_id").alias("q_id"),
            F.col("e").alias("qe"),
            F.col("norm2").alias("qn"),
        ),
        cent_rows,
        nprobe,
    ).select("q_id", "qe", "qn", "cell")
    scored = (
        F.broadcast(q)
        .join(vc, "cell")
        .filter(F.col("q_id") != F.col("vec_id"))
        .select(
            "q_id",
            "vec_id",
            "cell",
            (
                F.expr(dot_fold("qe", "e")) / (F.sqrt("qn") * F.sqrt("norm2"))
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cosine").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
        .select(
            "q_id", F.col("vec_id").alias("neighbor_id"), "cell", "cosine", "rank"
        )
    )


def ivf_topk(
    embeddings: DataFrame,
    query_pred: str = "vec_id < 5",
    k: int = 3,
    n_seeds: int = N_IVF_SEEDS,
    nprobe: int = 1,
) -> DataFrame:
    """IVF search: top-k cosine within the query's ``nprobe`` nearest
    cells (q_id, neighbor_id, cell, cosine, rank).

    At scale the cell is the physical partition key of the index table:
    a query reads ``nprobe`` cells' lists (nprobe/n_seeds of the corpus
    on average), never the full corpus. ``nprobe`` is the standard
    recall/cost knob; ``nprobe=1`` degenerates to the query's own cell.
    Each corpus vector is assigned to exactly one cell and the probed
    cells are distinct, so candidates are already unique — the rank
    window is unchanged.
    """
    if nprobe < 1 or nprobe > n_seeds:
        raise ValueError("nprobe must be in 1..n_seeds")
    v = _vectors(embeddings)
    cells = ivf_cells(embeddings, n_seeds)
    vc = v.join(cells, "vec_id").select("vec_id", "e", "norm2", "cell")
    if nprobe == 1:
        q = vc.filter(query_pred).select(
            F.col("vec_id").alias("q_id"),
            F.col("e").alias("qe"),
            F.col("norm2").alias("qn"),
            F.col("cell"),
        )
    else:
        # rank every seed per query by cosine (same exact arithmetic as
        # the cell assignment) and probe the top-nprobe cells
        seeds = v.filter(F.col("vec_id") < n_seeds).select(
            F.col("vec_id").alias("cell"),
            F.col("e").alias("se"),
            F.col("norm2").alias("sn"),
        )
        qs = (
            v.filter(query_pred)
            .select(
                F.col("vec_id").alias("q_id"),
                F.col("e").alias("qe"),
                F.col("norm2").alias("qn"),
            )
            .crossJoin(F.broadcast(seeds))
            .select(
                "q_id",
                "qe",
                "qn",
                "cell",
                (
                    F.expr(dot_fold("qe", "se")) / (F.sqrt("qn") * F.sqrt("sn"))
                ).alias("cos_to_seed"),
            )
        )
        wq = Window.partitionBy("q_id").orderBy(
            F.col("cos_to_seed").desc(), F.col("cell")
        )
        q = (
            qs.withColumn("__rn", F.row_number().over(wq))
            .filter(F.col("__rn") <= nprobe)
            .select("q_id", "qe", "qn", "cell")
        )
    scored = (
        F.broadcast(q)
        .join(vc, "cell")
        .filter(F.col("q_id") != F.col("vec_id"))
        .select(
            "q_id",
            "vec_id",
            "cell",
            (
                F.expr(dot_fold("qe", "e")) / (F.sqrt("qn") * F.sqrt("norm2"))
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cosine").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
        .select("q_id", F.col("vec_id").alias("neighbor_id"), "cell", "cosine", "rank")
    )


# --- product quantization (PQ / ADC search) ------------------------------

# Hyperparameters picked by a measured recall sweep on the synthetic
# embeddings (iid noise — the worst case for any quantizer): finer
# subspaces dominate everything else. (M, K, iters) → recall@3 vs exact
# cosine at sf0.01: (8,16,1)=0.40, (16,32,2)=0.53, (32,16,1)=0.67,
# (32,32,1)=0.67-0.73. 32 subspaces of 2 dims, 32 codes: 8× compression.
PQ_M = 32                      # subspaces
PQ_SUBDIM = EMB_DIM // PQ_M    # dims per subspace
PQ_K = 32                      # codes per sub-codebook
PQ_ITERS = 1                   # Lloyd refinement rounds per sub-quantizer
ADC_SCALE = "1000000000.0"     # fixed-point scale for the ADC score sum


def _subvectors(v: DataFrame) -> DataFrame:
    """(vec_id, s, x, xn): each vector split into PQ_M contiguous
    subvectors with exact squared subnorms. The posexplode is a narrow
    transformation (no shuffle) — N·M rows exist only inside the stage
    that consumes them."""
    slices = F.array(
        *[
            F.slice(F.col("e"), s * PQ_SUBDIM + 1, PQ_SUBDIM)
            for s in range(PQ_M)
        ]
    )
    return (
        v.select("vec_id", F.posexplode(slices).alias("s", "x"))
        .withColumn("xn", F.expr(dot_fold("x", "x")))
    )


def _assign_codes(sv: DataFrame, cb: DataFrame) -> DataFrame:
    """(vec_id, s, code): nearest sub-codeword by exact L2 (ties →
    lowest code). d² = ‖x‖² − 2·x·c + ‖c‖² from the exact fixed-point
    dots, so the argmin is bit-identical in any engine; the argmin
    itself is a partial-aggregating struct max (only ~N·M pre-aggregated
    rows cross the exchange, never N·M·K)."""
    d2 = F.col("xn") - 2.0 * F.expr(dot_fold("x", "ce")) + F.col("cn")
    scored = sv.join(F.broadcast(cb), "s").select(
        "vec_id", "s", "code", d2.alias("d2")
    )
    return (
        scored.groupBy("vec_id", "s")
        .agg(
            F.max(
                F.struct((-F.col("d2")).alias("neg_d2"),
                         (-F.col("code")).alias("neg_code"))
            ).alias("__m")
        )
        .select("vec_id", "s", (-F.col("__m.neg_code")).alias("code"))
    )


# In-row nearest-sub-codeword: d² = ‖x‖² − 2·x·c + ‖c‖² from the exact
# fixed-point dots (identical expression to _assign_codes), argmin via
# array_max over struct(neg_d2, neg_code) — the same comparator the
# grouped struct-max used, so ties (→ lowest code) decide identically.
def _code_argmin_sql(x: str, xn: str, cb_slot: str) -> str:
    dot = dot_fold(x, "k.ce")
    return (
        f"-array_max(transform({cb_slot}, "
        f"k -> struct(-(({xn} - (2.0 * {dot})) + k.cn) AS neg_d2, "
        "-k.code AS neg_code))).neg_code"
    )


def _cb_attach(df: DataFrame, cb_rows) -> DataFrame:
    """``df`` + the trained codebook as a ``__cb`` column
    (array-by-subspace of (code, ce, cn) structs) via a ONE-ROW
    broadcast cross — the repo's adjudicated bounded-scalar pattern.

    Why not a literal: an M·K nested literal is a ~15k-node expression
    tree; parsing + analyzing it cost seconds of DRIVER time per query
    construction (guide §7.3 — measured on the first spelling of this
    refactor). A one-row LocalTableScan broadcast carries the same
    values with a constant-size plan."""
    spark = df.sparkSession
    by_s: dict[int, list] = {}
    for r in cb_rows:
        by_s.setdefault(int(r["s"]), []).append(r)
    data = [
        [
            (int(r["code"]), [float(x) for x in r["ce"]], float(r["cn"]))
            for r in sorted(by_s[s], key=lambda r: int(r["code"]))
        ]
        for s in range(PQ_M)
    ]
    cb_df = spark.createDataFrame(
        [(data,)],
        "__cb array<array<struct<code:bigint,ce:array<double>,cn:double>>>",
    )
    return df.crossJoin(F.broadcast(cb_df))


def _codes_arr_sql(e: str = "e") -> str:
    """SQL (over ``__cb``): ALL ``PQ_M`` sub-codes of vector column
    ``e`` as one in-row array — the full PQ encode as a projection,
    replacing the posexplode→join→argmin-exchange pipeline. ‖x‖² is
    hoisted per subspace (computed once, not once per codeword) with
    the same ``dot_fold`` the exploded frame precomputed, so d² values
    are bit-identical."""
    slice_x = f"slice({e}, sidx * {PQ_SUBDIM} + 1, {PQ_SUBDIM})"
    xn = dot_fold("sv0.x", "sv0.x")
    argmin = _code_argmin_sql(
        "sv.x", "sv.xn", "element_at(__cb, sv.s + 1)"
    )
    return (
        f"transform(transform(transform(sequence(0, {PQ_M - 1}), "
        f"sidx -> struct(sidx AS s, {slice_x} AS x)), "
        f"sv0 -> struct(sv0.s AS s, sv0.x AS x, {xn} AS xn)), "
        f"sv -> {argmin})"
    )


def _lut_arr_sql(e: str = "e") -> str:
    """SQL (over ``__cb``): the per-query ADC lookup table as an
    in-row array indexed by ``s`` of ``map<code, q·c_code>`` — exact
    ``dot_fold`` dots of the query('s residual) subvectors against the
    literal codebook, built in one projection on the (tiny) query side
    instead of a posexplode + broadcast-join LUT frame."""
    slice_x = f"slice({e}, sidx * {PQ_SUBDIM} + 1, {PQ_SUBDIM})"
    dot = dot_fold("sv.x", "k.ce")
    return (
        f"transform(transform(sequence(0, {PQ_M - 1}), "
        f"sidx -> struct(sidx AS s, {slice_x} AS x)), "
        "sv -> map_from_entries(transform(element_at(__cb, sv.s + 1), "
        f"k -> struct(k.code, {dot}))))"
    )


# The ADC score: Σ_s floor(LUT[s][code_s]·1e9 + 0.5) as exact BIGINT
# adds (associative — any order gives the sum the grouped F.sum
# produced), finished with the same single double division.
_ADC_SUM_SQL = (
    f"CAST(aggregate(sequence(0, {PQ_M - 1}), CAST(0 AS BIGINT), "
    "(acc2, sidx) -> acc2 + CAST(floor("
    f"element_at(element_at(__luts, sidx + 1), element_at(codes, sidx + 1))"
    f" * {ADC_SCALE} + 0.5) AS BIGINT)) AS DOUBLE) / {ADC_SCALE}"
)


def pq_codebooks(
    embeddings: DataFrame,
    n_codes: int = PQ_K,
    n_iters: int = PQ_ITERS,
) -> DataFrame:
    """Train the PQ sub-codebooks: (s, code, ce, cn), one K-entry
    codebook per subspace (Jégou et al., "Product Quantization for
    Nearest Neighbor Search", TPAMI 2011).

    Init = the subvectors of the first ``n_codes`` vectors by vec_id
    (deterministic, mirroring ivf_cells_kmeans seeding), refined by
    ``n_iters`` Lloyd rounds run for ALL subspaces at once: assignment
    is one broadcast join + struct-max argmin keyed (vec_id, s); the
    centroid update is ONE grouped pass keyed (s, code) with
    PQ_SUBDIM exact fixed-point decimal sums — M sub-quantizers never
    cost M separate shuffles. Codewords that lose all members drop out
    deterministically in both engines.

    At 100 TB the codebook is M·K rows (bounded), the training scans
    are n_iters passes over the persisted deterministic sample (FAISS
    practice — encode everything, train on a sample), and every
    exchange carries only partial-aggregated rows. Per round, the
    M·K-row codebook is
    materialized to the driver and re-created as a literal frame — the
    same bounded-state pattern (and rationale) as ivf_cells_kmeans:
    unrolled Lloyd lineage grows exponentially in n_iters.
    """
    sv = _subvectors(_vectors(embeddings))
    spark = embeddings.sparkSession
    rows = _pq_train_rows(sv, n_codes, n_iters)
    return spark.createDataFrame(
        rows, schema="s int, code bigint, ce array<double>, cn double"
    )


def _pq_train_rows(
    sv: DataFrame,
    n_codes: int,
    n_iters: int,
    train_fraction: float = TRAIN_FRACTION,
) -> list:
    """The Lloyd loop of :func:`pq_codebooks`, over any prepared
    subvector frame (vec_id, s, x, xn) — also trains the RESIDUAL
    sub-quantizers of :func:`ivfpq_topk`. Refinement runs on the
    deterministic training sample (:func:`_train_sample`), persisted
    across rounds; only code ASSIGNMENT (done by callers) sees the
    full corpus. Returns the collected codebook ROWS (s, code, ce, cn)
    — the same bounded M·K driver state every round materialized —
    so callers assign codes IN-ROW over the literal codebook (r15,
    guide §2.4): each round is ONE grouped-means job; the per-round
    assignment crossJoin + argmin exchange of the r14 spelling is
    gone. Arithmetic unchanged — codebooks are bit-identical."""
    cb_rows = (
        sv.filter(F.col("vec_id") < n_codes)
        .select(
            "s",
            F.col("vec_id").alias("code"),
            F.col("x").alias("ce"),
            F.col("xn").alias("cn"),
        )
        .collect()
    )
    tsv = _spread(_train_sample(sv, train_fraction)).persist()
    scale = F.lit(float(MEAN_SCALE))
    for _ in range(n_iters):
        member = _assign_codes_member(tsv, cb_rows)
        sums = member.groupBy("s", "code").agg(
            F.count(F.lit(1)).alias("__n"),
            *[
                F.sum(
                    F.floor(F.col("x")[i] * scale).cast("decimal(38,0)")
                ).alias(f"__s{i}")
                for i in range(PQ_SUBDIM)
            ],
        )
        cb = sums.select(
            "s",
            "code",
            F.array(
                *[
                    F.col(f"__s{i}").cast("double") / scale / F.col("__n")
                    for i in range(PQ_SUBDIM)
                ]
            ).alias("ce"),
        ).withColumn("cn", F.expr(dot_fold("ce", "ce")))
        cb_rows = cb.collect()
    tsv.unpersist()
    return cb_rows


def _assign_codes_member(sv: DataFrame, cb_rows) -> DataFrame:
    """``sv`` + its in-row ``code`` column (projection — the join-free
    member frame the Lloyd means pass consumes)."""
    code = F.expr(
        _code_argmin_sql("x", "xn", "element_at(__cb, s + 1)")
    )
    return _cb_attach(sv, cb_rows).withColumn("code", code)


def pq_topk(
    embeddings: DataFrame,
    query_pred: str = "vec_id < 5",
    k: int = 3,
    n_codes: int = PQ_K,
    n_iters: int = PQ_ITERS,
) -> DataFrame:
    """PQ/ADC approximate top-k by inner product: (q_id, neighbor_id,
    approx_dot, rank).

    The compressed index is the code table (vec_id, s, code) — M small
    ints per vector instead of EMB_DIM floats (here M=32 codes over 64
    floats, K=32 codewords per sub-codebook: 32 bytes vs 256, 8×
    compression at byte codes; ADVICE r04). Search is asymmetric distance
    computation: each query builds an M·K lookup table of exact
    subspace dots against the codebook (bounded — broadcast), the
    corpus code rows join it map-side, and the per-(q, vec) score is a
    fixed-point SUM over the M looked-up entries — partial aggregation
    makes the only exchange carry ≤ N·|Q| pre-aggregated rows. No
    full-width vector is touched at search time; at 100 TB the scan
    reads the code table (M bytes/vector), not the embeddings.

    Ranking is by the ADC approximation of the raw inner product
    (standard PQ practice; a production pipeline re-ranks the short
    list with exact dots — composable here as cosine_topk over the
    candidate ids).
    """
    # r15 (guide §2.4/§8): encode, LUT and the ADC sum all run IN-ROW
    # over the literal codebook — the corpus side is ONE projection
    # (vec_id, codes[M]) with no posexplode and no (s, code) join, the
    # query side is |Q| rows carrying their M lookup maps, attached by
    # a broadcast cross (|Q| bounded by query_pred — the repo's
    # adjudicated one-row-broadcast-cross pattern), and the per-pair
    # score is the same exact Σ floor(val·1e9 + 0.5) BIGINT fold the
    # grouped sum produced. The N·M·K scored intermediate and its
    # partial-agg exchange are gone; the only exchanges left are the
    # rank window and the caller's output sort. Bit-identical results.
    v = _vectors(embeddings)
    cb_rows = _pq_train_rows(_subvectors(v), n_codes, n_iters)
    vcodes = (
        _cb_attach(_spread(v), cb_rows)
        .withColumn("codes", F.expr(_codes_arr_sql("e")))
        .select("vec_id", "codes")
    )
    qlut = (
        _cb_attach(v.filter(query_pred), cb_rows)
        .select(
            F.col("vec_id").alias("q_id"),
            F.expr(_lut_arr_sql("e")).alias("__luts"),
        )
    )
    scored = (
        vcodes.join(F.broadcast(qlut), F.col("vec_id") != F.col("q_id"))
        .select(
            "q_id", "vec_id", F.expr(_ADC_SUM_SQL).alias("approx_dot")
        )
    )
    w = Window.partitionBy("q_id").orderBy(
        F.col("approx_dot").desc(), F.col("vec_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
        .select("q_id", F.col("vec_id").alias("neighbor_id"), "approx_dot", "rank")
    )


# --- IVF-PQ: coarse cells + PQ-coded residuals (the FAISS IVFPQ layout) --


def ivfpq_topk(
    embeddings: DataFrame,
    query_pred: str = "vec_id < 5",
    k: int = 3,
    n_seeds: int = N_IVF_SEEDS,
    kmeans_iters: int = KMEANS_ITERS,
    n_codes: int = PQ_K,
    pq_iters: int = PQ_ITERS,
    nprobe: int = 2,
    cache_registry: list | None = None,
) -> DataFrame:
    """IVF-PQ approximate top-k by inner product: the canonical
    100 TB vector index (Jégou et al. 2011; the FAISS ``IVFPQ``
    layout). The coarse Lloyd quantizer partitions the corpus into
    cells; each vector stores only its cell id + M sub-codes of its
    RESIDUAL (x − centroid); search probes the ``nprobe`` nearest
    cells and scores candidates as q·x ≈ q·c + Σₛ LUT[s, code_s],
    where the lookup table holds exact dots of the query's per-cell
    residual against the residual codebook.

    Decomposition is exact: q·x = q·c + q·r with r = x − c, and the
    only approximation is r → its codeword — the standard IVFPQ error
    model. Every arithmetic step (centroid means, residual subtract,
    dots, the ADC sum) is the engine-exact fixed-point machinery the
    component operators already gate, so the full index hash-matches
    the DuckDB oracle.

    Scale: the stored index is cell id + M codes per vector (here
    8 + 32 bytes vs 256 B of floats); search touches only the probed
    cells' code rows, the LUT is Q·nprobe·M·K rows (bounded —
    broadcast), and the score aggregation partial-aggregates to
    ≤ |probed candidates| rows before its exchange.

    The coarse-assignment and residual frames stay persisted for the
    life of the returned lazy plan (the plan reads them; unpersisting
    here would recompute the argmax cross per pass). A long-lived
    session issuing many calls can pass ``cache_registry=[]`` — the
    frames left cached are appended to it, to ``unpersist()`` once the
    result is consumed (ADVICE r05; the serving path,
    ``build_ivfpq_index``, already unpersists eagerly).
    """
    if nprobe < 1 or nprobe > n_seeds:
        raise ValueError("nprobe must be in 1..n_seeds")
    # r15 (guide §2.4/§8): the whole index side — coarse assignment,
    # residual, PQ encode — is ONE in-row projection over the literal
    # centroid/codebook state (both already materialize to the driver
    # per training round): the r14 spelling's persisted cells frame,
    # its two vec_id re-joins, the posexplode'd residual frame, the
    # probe window, and the (cell, s, code) LUT join + grouped ADC
    # exchange are all gone — the only exchanges left are the rank
    # window and the caller's output sort. Training still runs on the
    # persisted deterministic sample; every arithmetic step is
    # unchanged, so the index and search results are bit-identical
    # (oracle-verified). ``cache_registry`` is kept for API
    # compatibility — nothing outlives the call anymore (training
    # samples unpersist inside their loops).
    del cache_registry
    va, cent_rows = _kmeans_state(embeddings, n_seeds, kmeans_iters)
    vac = _with_cells_lit(
        _spread(_vectors(embeddings)), cent_rows, keep_centroid=True
    )
    res = vac.select(
        "vec_id",
        "cell",
        F.expr("zip_with(e, __ce, (a, b) -> a - b)").alias("e"),
    )
    cb_rows = _pq_train_rows(
        _subvectors(res.select("vec_id", "e")), n_codes, pq_iters
    )
    codes = (
        _cb_attach(res, cb_rows)
        .withColumn("codes", F.expr(_codes_arr_sql("e")))
        .select("vec_id", "cell", "codes")
    )

    # probe ranking: nprobe nearest centroids per query by cosine —
    # in-row sorted slice over the literal centroids (same order as
    # the window spelling); the probed centroid rides along, so the
    # q·c term, the query residual and its LUT maps are one projection
    q = va.filter(query_pred).select(
        F.col("vec_id").alias("q_id"),
        F.col("e").alias("qe"),
        F.col("norm2").alias("qn"),
    )
    qlut = (
        _probe_cells_lit(q, cent_rows, nprobe)
        .select(
            "q_id",
            "cell",
            F.expr(dot_fold("qe", "ce")).alias("qdotc"),
            F.expr("zip_with(qe, ce, (a, b) -> a - b)").alias("e"),
        )
        .transform(lambda d: _cb_attach(d, cb_rows))
        .select(
            "q_id", "cell", "qdotc", F.expr(_lut_arr_sql("e")).alias("__luts")
        )
    )

    scored = (
        codes.join(F.broadcast(qlut), "cell")
        .filter(F.col("vec_id") != F.col("q_id"))
        .select(
            "q_id",
            "vec_id",
            "cell",
            (F.col("qdotc") + F.expr(_ADC_SUM_SQL)).alias("approx_ip"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(
        F.col("approx_ip").desc(), F.col("vec_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
        .select(
            "q_id",
            F.col("vec_id").alias("neighbor_id"),
            "cell",
            "approx_ip",
            "rank",
        )
    )


def build_ivfpq_index(
    embeddings: DataFrame,
    path: str,
    n_seeds: int = N_IVF_SEEDS,
    kmeans_iters: int = KMEANS_ITERS,
    n_codes: int = PQ_K,
    pq_iters: int = PQ_ITERS,
) -> None:
    """Materialize the IVF-PQ index: train once, search many — the
    production shape (ivfpq_topk rebuilds per call, which is the right
    thing for an oracle-gated query but not for a serving path).

    Layout under ``path``:
      centroids/   (cell, ce, cn)            — K rows
      codebooks/   (s, code, ce, cn)         — M·K rows
      codes/       cell=<c>/ (vec_id, s, code) — PARTITIONED BY cell,
                   so a search's probed cells prune to their own leaf
                   dirs at planning time: at 100 TB an nprobe=2 search
                   reads 2/K of the code table and nothing else.

    Doubles round-trip parquet bit-exactly, so a search over the stored
    index returns byte-identical results to the in-line operator
    (asserted in tests).
    """
    spark = embeddings.sparkSession
    # r15: same in-row build as ivfpq_topk (guide §2.4) — assignment,
    # residual and encode are one projection; the stored layout and
    # every stored value are byte-identical to the r14 build (doubles
    # round-trip parquet bit-exactly; asserted in tests).
    _, cent_rows = _kmeans_state(embeddings, n_seeds, kmeans_iters)
    vac = _with_cells_lit(
        _spread(_vectors(embeddings)), cent_rows, keep_centroid=True
    )
    res = vac.select(
        "vec_id", "cell", F.expr("zip_with(e, __ce, (a, b) -> a - b)").alias("e")
    )
    cb_rows = _pq_train_rows(
        _subvectors(res.select("vec_id", "e")), n_codes, pq_iters
    )
    cents = spark.createDataFrame(
        cent_rows, schema="cell bigint, ce array<double>, cn double"
    )
    cb = spark.createDataFrame(
        cb_rows, schema="s int, code bigint, ce array<double>, cn double"
    )
    codes = (
        _cb_attach(res, cb_rows)
        .select(
            "vec_id",
            F.posexplode(F.expr(_codes_arr_sql("e"))).alias("s", "code"),
            "cell",
        )
    )
    cents.write.mode("overwrite").parquet(f"{path}/centroids")
    cb.write.mode("overwrite").parquet(f"{path}/codebooks")
    codes.write.mode("overwrite").partitionBy("cell").parquet(
        f"{path}/codes"
    )


def search_ivfpq_index(
    spark: SparkSession,
    path: str,
    embeddings: DataFrame,
    query_pred: str = "vec_id < 5",
    k: int = 3,
    nprobe: int = 2,
) -> DataFrame:
    """ADC probe search over a stored IVF-PQ index (build_ivfpq_index).

    The centroid and codebook tables are bounded → broadcast; the code
    table is read WITH the probed-cell predicate, which Spark turns
    into partition pruning on the ``cell=`` leaf dirs — the scan
    touches nprobe/K of the index. Arithmetic is identical to
    ivfpq_topk, so results match the in-line operator exactly.
    """
    # r15 (guide §2.4): centroids and codebooks are bounded index
    # METADATA (K and M·K rows) — collect them once and run probe
    # ranking, the q·c term, the query residual and its LUT maps as
    # one in-row projection over the literals, exactly like the
    # in-line ivfpq_topk: the probe window, the centroid re-join and
    # the posexplode'd LUT frame disappear from the search plan. The
    # code-table scan and its (cell, s, code) scoring join are
    # unchanged (the stored grain IS (vec_id, s, code)).
    cent_rows = spark.read.parquet(f"{path}/centroids").collect()
    cb_rows = spark.read.parquet(f"{path}/codebooks").collect()
    codes = spark.read.parquet(f"{path}/codes")

    v = _vectors(embeddings)
    q = v.filter(query_pred).select(
        F.col("vec_id").alias("q_id"),
        F.col("e").alias("qe"),
        F.col("norm2").alias("qn"),
    )
    qp = _probe_cells_lit(q, cent_rows, nprobe)
    qr = qp.select(
        "q_id",
        "cell",
        F.expr(dot_fold("qe", "ce")).alias("qdotc"),
        F.expr("zip_with(qe, ce, (a, b) -> a - b)").alias("e"),
    )
    slices = F.array(
        *[
            F.slice(F.col("e"), s * PQ_SUBDIM + 1, PQ_SUBDIM)
            for s in range(PQ_M)
        ]
    )
    qsv = qr.select(
        "q_id", "cell", "qdotc", F.posexplode(slices).alias("s", "qx")
    )
    cb = spark.createDataFrame(
        cb_rows, schema="s int, code bigint, ce array<double>, cn double"
    )
    lut = qsv.join(F.broadcast(cb), "s").select(
        "q_id", "cell", "qdotc", "s", "code",
        F.expr(dot_fold("qx", "ce")).alias("val"),
    )
    # probed-cell predicate reaches the partitioned scan (pruned leaves)
    probed = [r.cell for r in qp.select("cell").distinct().collect()]
    scored = (
        codes.filter(F.col("cell").isin(probed))
        .join(F.broadcast(lut), ["cell", "s", "code"])
        .filter(F.col("vec_id") != F.col("q_id"))
        .groupBy("q_id", "vec_id", "cell")
        .agg(
            F.max("qdotc").alias("__qdotc"),
            (
                F.sum(
                    F.floor(F.col("val") * F.lit(float(ADC_SCALE)) + 0.5)
                ).cast("double")
                / F.lit(float(ADC_SCALE))
            ).alias("__adc"),
        )
        .select(
            "q_id",
            "vec_id",
            "cell",
            (F.col("__qdotc") + F.col("__adc")).alias("approx_ip"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(
        F.col("approx_ip").desc(), F.col("vec_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
        .select(
            "q_id",
            F.col("vec_id").alias("neighbor_id"),
            "cell",
            "approx_ip",
            "rank",
        )
    )


def add_to_ivfpq_index(
    spark: SparkSession, path: str, new_embeddings: DataFrame
) -> None:
    """Incremental index maintenance: encode NEW vectors against the
    STORED quantizers (centroids + sub-codebooks are read back, never
    retrained — the standard IVFPQ add path: retraining is a scheduled
    rebuild, adds are cheap) and append their code rows to the
    partitioned code table. Append is per-cell leaf-dir parquet append —
    bounded by the new batch, never touching existing files.
    """
    cents = spark.read.parquet(f"{path}/centroids")
    cb = spark.read.parquet(f"{path}/codebooks")
    v = _vectors(new_embeddings)
    cells = _assign_cells(v, cents)
    member = v.join(cells, "vec_id").join(F.broadcast(cents), "cell")
    res = member.select(
        "vec_id", F.expr("zip_with(e, ce, (a, b) -> a - b)").alias("e")
    )
    codes = _assign_codes(_subvectors(res), cb).join(cells, "vec_id")
    codes.write.mode("append").partitionBy("cell").parquet(f"{path}/codes")


KNN_K = 5  # neighbors per vector in the k-NN graph


def knn_join(
    spark: SparkSession,
    embeddings: DataFrame,
    k: int = KNN_K,
    dim: int = EMB_DIM,
) -> DataFrame:
    """k-NN GRAPH: the top-k most-cosine-similar same-LSH-bucket
    neighbors for EVERY vector — the all-vectors generalization of
    ``ann_lsh_topk``, and the primitive under SemDeDup-style dedup,
    near-dup clustering, and graph-based retrieval indexes.

    The scale shape differs from the few-queries ANN path on purpose:
    there the query set broadcasts; here every vector is a query, so
    the candidate stage is a bucket-keyed SELF-join (each vector lives
    in exactly one hyperplane-sign bucket → no candidate dedup), the
    same shape as ``embedding_near_dups``. Cost tracks Σ|bucket|², i.e.
    ~2^-P of all-pairs, with the bucket as the shuffle key; the per-q
    top-k window then keys on q_id. All candidates of a given q share
    q's bucket, so no row crosses buckets between the two stages.

    Exactness: cosine uses the fixed-point ``dot_fold`` (engine-exact),
    ranking ties break on neighbor id — a total order, so the graph is
    deterministic and oracle-comparable. Vectors whose bucket has fewer
    than k others return fewer edges (no padding).
    """
    v = _vectors(embeddings)
    vb = (
        _with_buckets(v, dim=dim)
        .select("vec_id", "e", "norm2", "bucket")
        .repartition("bucket")
    )
    q = vb.select(
        F.col("bucket"),
        F.col("vec_id").alias("q_id"),
        F.col("e").alias("qe"),
        F.col("norm2").alias("qn"),
    )
    scored = (
        q.join(vb, "bucket")
        .filter(F.col("q_id") != F.col("vec_id"))
        .select(
            "q_id",
            "vec_id",
            (
                F.expr(dot_fold("qe", "e"))
                / (F.sqrt("qn") * F.sqrt("norm2"))
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
        .select("q_id", F.col("vec_id").alias("neighbor_id"), "cosine", "rank")
    )


# --- MMR-diversified rerank --------------------------------------------------

MMR_FANOUT = 20
MMR_K = 5
MMR_LAMBDA = 0.3   # low lambda => diversity term dominates; shared verbatim
                   # with the oracle ladder so the literal parses identically


def mmr_rerank(
    embeddings: DataFrame,
    query_pred: str = "vec_id < 5",
    k: int = MMR_K,
    fanout: int = MMR_FANOUT,
    lam: float = MMR_LAMBDA,
    candidate_ids: DataFrame | None = None,
) -> DataFrame:
    """Maximal Marginal Relevance rerank over the ANN stack (Carbonell &
    Goldstein, SIGIR'98): per query, fetch ``fanout`` candidates by
    exact cosine (:func:`cosine_topk` — swap in any ANN candidate
    generator at scale), then greedily pick ``k`` of them maximizing
    ``lam*rel(q,d) - (1-lam)*max_{s in picked} sim(d,s)`` — relevance
    traded against redundancy with what's already picked.

    Exactness: every similarity is the scaled-integer ``dot_fold``
    (floor(x*y*1e12) summed as int — associative, engine-portable),
    and the greedy loop recomputes candidate-candidate sims in the UDF
    with the SAME fold (python floats are IEEE doubles; floor/mul/div
    ordering replicated term-for-term), so scores are bit-identical to
    the oracle's SQL ladder and tie-breaks (score DESC, vec_id ASC)
    decide identically.

    Scale: the greedy stage is grouped ``applyInPandas`` over
    (query, fanout-candidates) groups — O(k·fanout) work and
    O(fanout·dim) state per query, embarrassingly parallel across
    queries; the candidate stage is whatever ANN index serves top-N.
    The k x fanout pairwise-sim matrix never leaves the group.
    """
    import math

    import pandas as pd

    scale = float(DOT_SCALE)
    v = _vectors(embeddings)
    if candidate_ids is None:
        rel = cosine_topk(embeddings, query_pred=query_pred, k=fanout)
    else:
        # SERVING path: candidates came from an ANN index (ids only) —
        # rerank computes the TRUE cosine for just those pairs, which
        # then doubles as the MMR relevance. Same arithmetic as
        # cosine_topk, restricted to the candidate set.
        q = v.filter(query_pred).select(
            F.col("vec_id").alias("q_id"),
            F.col("e").alias("qe"),
            F.col("norm2").alias("qn"),
        )
        rel = (
            candidate_ids.select("q_id", "neighbor_id")
            .join(
                v.select(
                    F.col("vec_id").alias("neighbor_id"),
                    F.col("e").alias("ne"),
                    F.col("norm2").alias("nn"),
                ),
                "neighbor_id",
            )
            .join(F.broadcast(q), "q_id")
            .select(
                "q_id",
                "neighbor_id",
                (
                    F.expr(dot_fold("qe", "ne"))
                    / (F.sqrt("qn") * F.sqrt("nn"))
                ).alias("cosine"),
            )
        )
    cands = rel.join(
        v.select(F.col("vec_id").alias("neighbor_id"), "e", "norm2"),
        "neighbor_id",
    )

    def _greedy(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("neighbor_id").reset_index(drop=True)
        ids = pdf["neighbor_id"].tolist()
        rel = pdf["cosine"].tolist()
        es = [list(map(float, e)) for e in pdf["e"]]
        norms = [math.sqrt(float(n)) for n in pdf["norm2"]]

        def sim(i: int, j: int) -> float:
            acc = 0
            a, b = es[i], es[j]
            for x, y in zip(a, b):
                acc += math.floor((x * y) * scale)
            return (float(acc) / scale) / (norms[i] * norms[j])

        picked: list[int] = []
        out = []
        while len(picked) < min(k, len(ids)):
            best = None
            for i in range(len(ids)):
                if i in picked:
                    continue
                red = max((sim(i, j) for j in picked), default=0.0)
                score = lam * rel[i] - (1 - lam) * red
                key = (score, -ids[i])
                if best is None or key > best[0]:
                    best = (key, i, score)
            _, i, score = best
            picked.append(i)
            out.append(
                (
                    int(pdf["q_id"].iloc[0]),
                    len(picked),
                    ids[i],
                    rel[i],
                    score,
                )
            )
        return pd.DataFrame(
            out, columns=["q_id", "pick", "neighbor_id", "relevance", "mmr"]
        )

    return cands.groupBy("q_id").applyInPandas(
        _greedy,
        schema="q_id bigint, pick bigint, neighbor_id bigint, "
        "relevance double, mmr double",
    )
