"""Cross-engine exactness of the SHARED formula strings.

Round 5 found two real bugs of the same class: a formula string shared
verbatim between Spark (``F.expr``) and DuckDB can still evaluate
differently by an ulp, because the engines type numeric literals
(decimal vs double) and promote mixed expressions differently. An ulp
is invisible until it crosses a rounding boundary or a cut — then a
4-dp display flips (quality 0.7477 vs 0.7478) or a keep decision
inverts (logit exactly 0).

This test pins the fix: every shared score evaluates bit-identically in
both engines over (a) the REAL adversarial feature tuples from the
sf0.1 documents that exposed the bugs — including the exact-zero-logit
tuple — and (b) a deterministic grid of feature combinations. If
someone reintroduces a decimal-literal chain, this fails before the
driver gate does.
"""

from __future__ import annotations

import math

import duckdb

from etl_end_to_end_airflow_bigquery_spark.operators.text import (
    CLASSIFIER_KEEP_SQL,
    CLASSIFIER_SCORE_SQL,
    CLASSIFIER_ZNUM_SQL,
)
from etl_end_to_end_airflow_bigquery_spark.plans.oracles import _round
from etl_end_to_end_airflow_bigquery_spark.plans.queries_ext import (
    AVG_TOK_SQL,
    QUALITY_SQL,
    STOP_RATIO_SQL,
)

# (n_tokens, n_stopwords, n_chars_calc, n_nonalpha)
ADVERSARIAL = [
    (70, 11, 389, 0),    # classifier logit EXACTLY 0 (sf0.1 docs 1489/3970)
    (76, 13, 416, 0),    # quality 4-dp round tie (sf0.1 doc 4156)
]


def _grid():
    rows = list(ADVERSARIAL)
    # deterministic pseudo-random sweep, multiplicative congruential
    x = 12345
    for _ in range(400):
        x = (x * 48271) % 2147483647
        nt = 1 + x % 500
        ns = (x // 7) % (nt + 1)
        nc = nt + (x // 11) % 4000  # n_chars >= n_tokens (spaces exist)
        na = (x // 13) % (nc + 1)
        rows.append((nt, ns, nc, na))
    return rows


def test_shared_formulas_bit_identical(spark):
    rows = _grid()
    exprs = {
        "stop_ratio": STOP_RATIO_SQL,
        "avg_tok": AVG_TOK_SQL,
        "quality": QUALITY_SQL,
        # CAST: Spark types the oracle _round string as DECIMAL (its
        # numeric literals are decimal); production Spark paths use
        # relational.round_half_up (double) instead, so compare as double
        "quality_r4": f"CAST({_round(QUALITY_SQL, 4)} AS DOUBLE)",
        "logit_num": CLASSIFIER_ZNUM_SQL,
        "score": CLASSIFIER_SCORE_SQL,
        "score_r6": f"CAST({_round(CLASSIFIER_SCORE_SQL, 6)} AS DOUBLE)",
        "keep": CLASSIFIER_KEEP_SQL,
    }
    sdf = spark.createDataFrame(
        rows,
        "n_tokens bigint, n_stopwords bigint, n_chars_calc bigint,"
        " n_nonalpha bigint",
    )
    select = ", ".join(f"{sql} AS {name}" for name, sql in exprs.items())
    sdf.createOrReplaceTempView("feat_exact")
    got_spark = (
        spark.sql(f"SELECT {select} FROM feat_exact").collect()
    )

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE feat(n_tokens BIGINT, n_stopwords BIGINT,"
        " n_chars_calc BIGINT, n_nonalpha BIGINT)"
    )
    con.executemany("INSERT INTO feat VALUES (?,?,?,?)", rows)
    got_duck = con.execute(f"SELECT {select} FROM feat").fetchall()

    def canon(v):
        if isinstance(v, float):
            return "nan" if math.isnan(v) else repr(v)
        return str(v)

    assert len(got_spark) == len(got_duck) == len(rows)
    for i, (s, d) in enumerate(zip(got_spark, got_duck)):
        srow = tuple(canon(x) for x in s)
        drow = tuple(canon(x) for x in d)
        assert srow == drow, (rows[i], srow, drow)
    # and the planted zero-logit tuple really sits ON the cut
    assert got_spark[0]["logit_num"] == 0 and got_spark[0]["keep"] is True
