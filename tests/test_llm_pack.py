"""Round-3 LLM-pipeline pack: sequence packing laws, n-gram
decontamination on planted overlaps, repetition-ratio extremes, linear
interpolation on a hand-checkable series."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_end_to_end_airflow_bigquery_spark.operators.text import (
    pack_sequences,
    repetition_ratio,
)
from etl_end_to_end_airflow_bigquery_spark.operators.temporal import (
    resample_interpolate,
)


def _doc(n: int) -> str:
    return " ".join(f"w{i}" for i in range(n))


def test_pack_sequences_hand_case(spark):
    rows = [(i + 1, "s", _doc(n)) for i, n in enumerate([10, 60, 30, 64, 5])]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    got = {
        r.doc_id: (r.pack_id, r.pack_offset, r.crosses_boundary)
        for r in pack_sequences(df, budget=64).collect()
    }
    # cumulative starts: 0, 10, 70, 100, 164
    assert got == {
        1: (0, 0, False),   # tokens 0..9
        2: (0, 10, True),   # 10..69 spans the 64 edge
        3: (1, 6, False),   # 70..99
        4: (1, 36, True),   # 100..163 spans the 128 edge
        5: (2, 36, False),  # 164..168
    }


def test_pack_sequences_groups_are_independent(spark):
    rows = [(1, "a", _doc(60)), (2, "a", _doc(60)), (3, "b", _doc(60))]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    got = {
        (r.source, r.doc_id): (r.pack_id, r.pack_offset)
        for r in pack_sequences(df, budget=64).collect()
    }
    assert got[("b", 3)] == (0, 0)  # new shard restarts the packing
    assert got[("a", 2)] == (0, 60)


def test_repetition_ratio_extremes(spark):
    df = spark.createDataFrame(
        [
            (1, "x x x x"),          # 2 identical trigrams -> 1.0
            (2, "a b a b a b a b"),  # 6 grams, max freq 3 -> 0.5
            (3, "a b"),              # < 3 tokens -> NULL
        ],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: r.r
        for r in df.select("doc_id", repetition_ratio(3).alias("r")).collect()
    }
    assert got[1] == 1.0
    assert got[2] == 0.5
    assert got[3] is None


def test_decontaminate_planted_overlap(spark):
    """A corpus doc embedding a benchmark 5-gram verbatim is flagged;
    a disjoint-vocabulary doc is not."""
    from etl_end_to_end_airflow_bigquery_spark.plans.queries_ext import (
        decontaminate_ngrams,
    )
    import tempfile, os

    bench_text = "alpha beta gamma delta epsilon zeta"
    leaky = "intro words then alpha beta gamma delta epsilon closing"
    clean = "one two three four five six seven"
    docs = spark.createDataFrame(
        [
            (0, bench_text, "en", "src0", len(bench_text)),  # doc_id%20==0 → eval set
            (1, leaky, "en", "src1", len(leaky)),
            (2, clean, "en", "src2", len(clean)),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    d = tempfile.mkdtemp()
    docs.coalesce(1).write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))
    out = {r.doc_id: r.n_shared for r in decontaminate_ngrams(spark, d).collect()}
    # exactly one eval 5-gram ("alpha beta gamma delta epsilon") appears
    # verbatim in doc 1; doc 2 shares nothing and has no row
    assert out == {1: 1}


def test_interpolate_linear_hand_case(spark):
    df = spark.createDataFrame(
        [("k", "2026-01-01", 1.0), ("k", "2026-01-04", 4.0)],
        "k string, d string, v double",
    ).select("k", F.col("d").cast("date").alias("d"), "v")
    got = {
        str(r.d): (r.v, r.is_interpolated)
        for r in resample_interpolate(df, "k", "d", "v").collect()
    }
    assert got["2026-01-01"] == (1.0, False)
    assert got["2026-01-02"] == (2.0, True)
    assert got["2026-01-03"] == (3.0, True)
    assert got["2026-01-04"] == (4.0, False)


def test_interpolate_subday_step(spark):
    # neighbors land on the SAME calendar day — a day-granular datediff
    # weight would divide by zero here; the epoch-µs weight is exact
    df = spark.createDataFrame(
        [("k", "2026-01-01 00:00:00", 10.0), ("k", "2026-01-01 18:00:00", 22.0)],
        "k string, t string, v double",
    ).select("k", F.col("t").cast("timestamp_ntz").alias("t"), "v")
    got = {
        str(r.t): (r.v, r.is_interpolated)
        for r in resample_interpolate(df, "k", "t", "v", step="6 hours").collect()
    }
    assert got["2026-01-01 00:00:00"] == (10.0, False)
    assert got["2026-01-01 06:00:00"] == (14.0, True)
    assert got["2026-01-01 12:00:00"] == (18.0, True)
    assert got["2026-01-01 18:00:00"] == (22.0, False)
