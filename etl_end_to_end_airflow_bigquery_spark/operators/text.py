"""Text-analysis operators for LLM-data pipelines (extension pack §7.5).

All operators are pure DataFrame transforms built from JVM-side
higher-order array functions — no Python UDFs in the hot path, so they
whole-stage-codegen and scale linearly with document count. Hashing uses
md5 (available and bit-identical in Spark, DuckDB, and most engines) so
every operator has an exact cross-engine oracle.

Shared tunables live here and are imported by the oracle SQL generator —
one source of truth for both engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Stopword list for quality scoring (tokens from the synthetic vocab; on
# real corpora swap in a language-appropriate list).
STOPWORDS = ("the", "a", "data", "value", "row")

# Marker tokens per language for the n-gram/stopword-voting language ID.
LANG_MARKERS = {
    "en": ("the", "a", "of", "and"),
    "de": ("der", "die", "das", "und"),
    "es": ("el", "los", "las", "y"),
    "fr": ("le", "les", "une", "et"),
}


def _sql_list(words: tuple[str, ...]) -> str:
    return "array(" + ", ".join(f"'{w}'" for w in words) + ")"


def token_count(text: str = "text") -> Column:
    """Whitespace token count (the BPE-ish splitter is ``tokenize_bpe``)."""
    return F.expr(f"size(split({text}, ' '))").cast("bigint")


def stopword_count(text: str = "text") -> Column:
    words = _sql_list(STOPWORDS)
    return F.expr(
        f"size(filter(split({text}, ' '), t -> array_contains({words}, t)))"
    ).cast("bigint")


def marker_count(lang: str, text: str = "text") -> Column:
    words = _sql_list(LANG_MARKERS[lang])
    return F.expr(
        f"size(filter(split({text}, ' '), t -> array_contains({words}, t)))"
    ).cast("bigint")


def text_stats(df: DataFrame, text: str = "text") -> DataFrame:
    """Length/token/stopword statistics per document.

    ``avg_token_len`` is derived arithmetically from char and token counts
    (single-space-separated corpus) — no second array pass.
    """
    return df.withColumns(
        {
            "n_chars_calc": F.length(text).cast("bigint"),
            "n_tokens": token_count(text),
            "n_stopwords": stopword_count(text),
            "n_nonalpha": F.length(
                F.regexp_replace(F.col(text), "[a-z ]", "")
            ).cast("bigint"),
        }
    )


def quality_score_expr(
    n_tokens: Column, stop_ratio: Column, avg_token_len: Column
) -> Column:
    """Deterministic quality heuristic in [0,1]: rewards length (up to 100
    tokens), low stopword density, and informative token length (up to 8
    chars). Mirrored verbatim in the oracle SQL."""
    return (
        0.4 * F.least(n_tokens / 100.0, F.lit(1.0))
        + 0.4 * (1.0 - stop_ratio)
        + 0.2 * F.least(avg_token_len / 8.0, F.lit(1.0))
    )


def fingerprint(text: str = "text") -> Column:
    """Document fingerprint: md5 over the lower-cased text. Content-hash
    dedup key; cheap, exact, portable."""
    return F.md5(F.lower(F.col(text)))


def chunk_tokens(
    df: DataFrame,
    text: str = "text",
    chunk_size: int = 20,
    overlap: int = 5,
) -> DataFrame:
    """Split each document into overlapping token-window chunks —
    context-window prep for LLM training (a 100k-token doc becomes
    ~100k/stride rows of ``chunk_size`` tokens each).

    Shape matters for scale: tokenize ONCE per document in a projection
    *below* the Generate, posexplode the arithmetic start sequence, then
    slice the carried token array per output row. Generate is a
    CollapseProject barrier, so ``split()`` is never inlined into the
    per-chunk expressions (the O(n²/stride) trap). All JVM-side; the
    per-doc fan-out happens after the scan, so no single task ever holds
    more than one document's tokens plus its chunk rows.

    Output: one row per (doc, chunk) with ``chunk_idx`` (0-based),
    ``chunk_text``, and ``n_chunk_tokens`` (= chunk_size except the tail).
    """
    if overlap >= chunk_size:
        raise ValueError("overlap must be < chunk_size")
    stride = chunk_size - overlap
    other = [c for c in df.columns if c != text]
    toks = df.select(*other, F.split(F.col(text), " ").alias("_toks"))
    exploded = toks.select(
        *other,
        "_toks",
        F.posexplode(
            F.expr(f"sequence(0, greatest(size(_toks) - 1, 0), {stride})")
        ).alias("chunk_idx", "_start"),
    )
    return exploded.select(
        *other,
        F.col("chunk_idx").cast("bigint"),
        F.expr(f"array_join(slice(_toks, _start + 1, {chunk_size}), ' ')").alias(
            "chunk_text"
        ),
        F.expr(f"least(CAST({chunk_size} AS BIGINT), size(_toks) - _start)").alias(
            "n_chunk_tokens"
        ),
    )
