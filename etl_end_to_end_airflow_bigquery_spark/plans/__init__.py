"""Query/oracle registry.

The driver's correctness gate verifies **the first 50 entries of
``queries()`` in dict-iteration order** (observed across rounds 1–3).
With 114 registered queries, a naive module-merge order left whole
operator families past position 50 with no hard-signal row — VERDICT
r02's top item. Round 3 fixed the families; round 4 adds ROTATION
(VERDICT r03 item 2): 47 queries had never had a driver row because the
gate membership was a frozen list.

The gate is now two explicit tiers:

1. ``_GATE_ANCHORS`` — ~20 names, one per §2 family and per
   LLM-pipeline component family, permanently gated so no family ever
   loses its hard signal: batch relational core, top-k, JSON explode,
   window, set ops, scalar functions, OLAP agg + star join, MERGE +
   idempotent-append writers, sessionize, as-of, skew-safe agg, exact
   dedup, the curated-corpus capstone (LSH chain + connected components
   + decontamination), text quality, brute-force cosine (also the
   bench-noise watch query), k-means IVF, multimodal decode (Arrow
   UDF), streaming, grouped pandas UDF, SCD2.
2. ``_GATE_ROTATION`` — slots filled each round with names that have
   NEVER had a green driver row in any prior round's CORRECTNESS file.
   Round 7 (VERDICT r06 item 3) gated ALL remaining never-proven
   names and came back 50/50 green — the registry is 100%
   driver-proven (union of CORRECTNESS_r01–r07), and
   ``rotation_candidates()`` is empty.

   **Round-8+ gate policy (VERDICT r07 item 1)**: with the rotation
   pool exhausted, rotation slots hold exactly the round's NEW queries
   (never-proven by construction), and ``_REPROOF_BACKFILL`` pads the
   gate to exactly 50 with deliberate re-proofs, chosen in priority
   order: (a) every previously-green query whose code or oracle this
   round touches (ADVICE fixes, shared-helper edits), then (b) the
   names with the STALEST driver evidence (the r01/r02-only rows),
   so old proofs are refreshed against current code rather than
   re-verifying recent greens. Both tiers stay guarded by the
   inverse invariants below.

Membership invariants are enforced with explicit raises (not bare
``assert`` — stripped under ``python -O``, ADVICE r03): every name
registered, exactly 50 unique, anchors and rotation disjoint.
"""

from .oracles import ORACLES as _CORE_ORACLES
from .oracles_ext import EXT_ORACLES
from .oracles_olap import OLAP_ORACLES
from .queries import QUERIES as _CORE_QUERIES
from .queries_ext import EXT_QUERIES
from .queries_olap import OLAP_QUERIES
from .queries_stream import STREAM_QUERIES
from .oracles_stream import STREAM_ORACLES

# Names with a green driver row in some prior round (union of
# CORRECTNESS_r01–r06; a round contributes its green rows only — red
# rows stay rotation-eligible until a green driver row exists). Used to
# pick rotation slots and asserted against by
# tests/test_queries_oracle.py — append, don't rewrite, when a new
# round's CORRECTNESS file lands.
GATED_THROUGH_R06: frozenset[str] = frozenset(
    {
        # round-6 rotation rows (CORRECTNESS_r06 greens; the two reds —
        # mix_sources_tokens and variant_function_pack, the HUGEINT
        # oracle-type bug — are deliberately absent and re-slotted)
        "merge_sql_orders", "burst_events_window",
        "session_concurrency_daily", "overlapping_sessions",
        "ohlc_daily", "daily_returns_volatility", "max_drawdown_series",
        "knn_graph", "quality_classifier_docs", "chunk_documents_udtf",
        "cogroup_asof_pandas", "order_streaks_rcte", "sql_udf_pack",
        "parameterized_sql_pack", "streaming_burst_pairs",
        "streaming_ohlc_daily", "quantile_pack", "profile_orders",
        "unpivot_part_measures", "grouping_sets_sql", "histogram_prices",
        "richest_customer_per_nation", "conditional_agg_pack",
        "anomaly_zscore_daily", "unreferenced_parts",
        "dq_expectations_orders",
        # round-5 rotation rows (CORRECTNESS_r05 greens; the 28th slot,
        # mix_sources_tokens, was the round's one hash mismatch and is
        # deliberately absent)
        "ivfpq_topk_adc", "pq_topk_adc", "ivfpq_rerank_topk",
        "bm25_retrieval", "hybrid_rrf_retrieval", "phrase_search_docs",
        "unigram_logprob_docs", "bigram_logprob_docs",
        "curated_corpus_v3", "semantic_dedup_kmeans", "pii_scrub_docs",
        "pagerank_dedup_graph", "leakage_safe_split",
        "duplicate_spans_docs", "cms_heavy_hitters",
        "hll_distinct_users", "bloom_join_prune", "streaming_cms_counts",
        "url_function_pack", "map_function_pack", "json_function_pack",
        "array_function_pack", "null_function_pack", "try_function_pack",
        "datetime_function_pack", "string_function_pack2", "stats_pack",
        # round-4 rotation rows (CORRECTNESS_r04, all green)
        "ann_lsh_multiprobe", "ann_lsh_multitable", "bitwise_function_pack",
        "chunk_documents", "dataset_split", "decontaminate_ngrams",
        "ewma_daily_rates", "hash_sample_docs", "interpolate_daily_rates",
        "ivf_topk_nprobe", "pack_training_sequences", "q10_returned_revenue",
        "q13_order_distribution", "q14_promo_share", "q15_top_supplier",
        "q19_or_pushdown", "q22_idle_customers", "q7_volume_shipping",
        "q8_market_share", "regex_string_pack", "repetition_ratio_docs",
        "stratified_sample_docs", "streaming_segment_counts",
        "streaming_sessionize", "streaming_sliding_avg",
        "streaming_view_purchase_join", "tfidf_top_terms",
        "window_function_pack",
        # rounds 1–3
        "daily_avg_report", "topk_recent_events", "count_guard_inlist",
        "json_map_explode", "latest_event_per_key",
        "window_topk_per_customer", "setops_intersect",
        "scalar_function_pack", "pricing_summary", "star_join_revenue",
        "shipping_priority", "distinct_parts_per_supplier", "rollup_qty",
        "pivot_event_counts", "merge_upsert_orders",
        "idempotent_append_orders", "sessionize_events",
        "asof_attribution", "reorder_gap_by_segment",
        "cumulative_monthly_revenue", "order_priority_exists",
        "skew_safe_event_counts", "median_price_by_status",
        "ivf_topk_kmeans", "dedup_exact_docs", "minhash_pairs",
        "jaccard_near_dups", "dedup_clusters", "simhash_docs",
        "text_stats_quality", "cosine_topk", "ann_lsh_topk", "ivf_topk",
        "embedding_near_dups", "multimodal_meta", "curated_corpus_v2",
        "vocab_top_tokens", "multimodal_decode", "multimodal_resize",
        "streaming_daily_avg", "streaming_report_merge",
        "streaming_dedup_events", "grouped_stats_pandas",
        "q5_local_supplier_volume", "q18_big_orders",
        "scd2_orders_status", "snapshot_diff_orders",
        "resample_daily_rates", "incremental_daily_state",
        "fuzzy_name_pairs",
        # r01/r02-only rows (demoted from later gates but green there)
        "avg_last10", "cube_counts", "curated_corpus", "doc_fingerprint",
        "forecast_revenue", "json_field_extract", "label_centroids",
        "lang_id_heuristic", "multimodal_features", "report_exists_guard",
        "session_window_native", "setops_except", "setops_union",
        "small_qty_revenue", "token_count_bpe", "top_orders_by_date",
        "views_before_purchase",
    }
)

# Round-7 fold (CORRECTNESS_r07: 50/50 green — the whole gate passed).
# Anchors and the two backfill re-proofs were already in the R06 ledger;
# the union adds exactly the 26 rotation rows.
GATED_THROUGH_R07: frozenset[str] = GATED_THROUGH_R06 | frozenset(
    {
        "mix_sources_tokens", "variant_function_pack",
        "variant_shredded_roundtrip", "merge_sql_sync_orders",
        "time_travel_orders", "frame_sample_assets", "shard_histogram",
        "weighted_sample_docs", "cap_docs_per_source",
        "decontaminate_embeddings", "streaming_view_purchase_left",
        "streaming_state_dedup_keys", "ivm_join_revenue",
        "ivm_join_revenue_retract", "regression_trend_events",
        "funnel_view_click_purchase", "cohort_retention_weekly",
        "basket_part_pairs", "revenue_gini", "session_paths_top",
        "rfm_segments", "jsonl_commit_roundtrip", "string_agg_pack",
        "lateral_topk_orders", "bpe_merge_candidates",
        "token_diversity_docs",
    }
)

# Round-8 fold (CORRECTNESS_r08: 50/50 green). Anchors and the 25
# backfill re-proofs were already in the R07 ledger; the union adds
# exactly the 3 rotation rows (the r8-new queries).
GATED_THROUGH_R08: frozenset[str] = GATED_THROUGH_R07 | frozenset(
    {
        "ivm_minmax_recompute", "bpe_train_merges",
        "substring_dedup_spans",
    }
)

# Round-9 fold (CORRECTNESS_r09: 50/50 green). Anchors and the 18
# backfill re-proofs were already in the R08 ledger; the union adds
# exactly the 10 rotation rows (the r9-new queries).
GATED_THROUGH_R09: frozenset[str] = GATED_THROUGH_R08 | frozenset(
    {
        "bpe_encode_corpus", "phash_near_dup_assets",
        "streaming_ivm_revenue", "ivm_distinct_support",
        "streaming_phash_assets", "triangle_count_dedup",
        "pipe_syntax_pack", "observed_write_metrics",
        "incremental_dedup_batch", "streaming_incremental_dedup",
    }
)

# Round-10 fold (CORRECTNESS_r10: 50/50 green). Anchors and the 5
# tier-a backfill re-proofs were already in the R09 ledger; the union
# adds exactly the 23 rotation rows (the r10-new queries).
GATED_THROUGH_R10: frozenset[str] = GATED_THROUGH_R09 | frozenset(
    {
        "trailing_active_users", "rollup_cascade_daily",
        "streaming_rollup_cascade", "robust_stats_orders",
        "bucketed_colocated_join", "sql_variables_pack",
        "containment_near_dups", "bin_pack_nextfit",
        "corpus_drift_chi2", "time_weighted_avg_daily",
        "counter_rate_resets", "pmi_collocations",
        "cdc_out_of_order_apply", "streaming_cdc_apply",
        "bfs_dedup_distance", "quantile_rollup_cascade",
        "hll_merge_days", "partition_pruned_scan",
        "null_semantics_pack", "er_golden_record",
        "streaming_quantile_cascade", "skyline_pareto_orders",
        "multi_touch_attribution",
    }
)

# Round-11 fold (CORRECTNESS_r11: 50/50 green — the whole gate passed).
# Anchors were already in the R10 ledger; the union adds exactly the 28
# rotation rows (the r11-new queries).
GATED_THROUGH_R11: frozenset[str] = GATED_THROUGH_R10 | frozenset(
    {
        "merge_cdf_ivm_roundtrip", "merge_sql_multi_clause",
        "quarantine_ingest_events", "skew_join_hot_keys",
        "zorder_skipping_report", "sql_scripting_pack",
        "bitmap_distinct_users", "streaming_bitmap_distinct",
        "ngram_novelty_docs", "funnel_time_to_convert",
        "multimodal_arrow_stats", "schema_evolution_read",
        "collation_pack", "bitmap_audience_overlap",
        "merge_cdf_join_ivm", "cdf_squash_roundtrip",
        "k_anonymity_report", "udf_iter_text_scores",
        "prefix_filter_near_dups", "weighted_median_prices",
        "q21_sole_late_supplier", "cep_pattern_funnel",
        "range_frame_peak_window", "q2_min_cost_supplier",
        "spatial_grid_knn", "dpp_partitioned_join",
        "approx_quantile_certified", "streaming_cep_funnel",
    }
)

# Round-12 fold (CORRECTNESS_r12: 50/50 green — the whole gate passed).
# Anchors and the 21 backfill re-proofs were already in the R11 ledger;
# the union adds exactly the 9 rotation rows (the r12-new queries).
GATED_THROUGH_R12: frozenset[str] = GATED_THROUGH_R11 | frozenset(
    {
        "file_lineage_scan", "misra_gries_heavy_hitters",
        "mmr_rerank_topk", "cep_kleene_funnel", "streaming_cep_kleene",
        "history_skip_scan", "table_diff_audit", "streaming_misra_gries",
        "partition_evolution_read",
    }
)

# Round-13 fold (CORRECTNESS_r13: 50/50 green — the whole gate passed).
# Anchors and the 23 backfill re-proofs were already in the R12 ledger;
# the union adds exactly the 5 rotation rows (the r13-new queries).
GATED_THROUGH_R13: frozenset[str] = GATED_THROUGH_R12 | frozenset(
    {
        "partition_evolution_history", "mmr_rerank_stored",
        "streaming_partition_evolution", "manifest_skipping_read",
        "evolved_merge_cdf",
    }
)

# Round-14 fold (CORRECTNESS_r14: 50/50 green — the whole gate passed).
# Anchors and the 23 backfill re-proofs (incl. the full 9-name r03/r04
# stale pool, now retired) were already in the R13 ledger; the union
# adds exactly the 5 rotation rows (the r14-new queries).
GATED_THROUGH_R14: frozenset[str] = GATED_THROUGH_R13 | frozenset(
    {
        "partition_spec_rollback", "sharded_manifest_read",
        "cdf_retention_feed", "evolved_subject_delete",
        "evolved_compaction_read",
    }
)

# Round-15 fold (CORRECTNESS_r15: 50/50 green — the whole gate passed).
# Anchors and the 25 backfill re-proofs (the 22-name r05 stale-pool
# retirement + 3 writer-path re-proofs) were already in the R14 ledger;
# the union adds exactly the 3 rotation rows (the r15-new queries from
# the interrupted build round).
GATED_THROUGH_R15: frozenset[str] = GATED_THROUGH_R14 | frozenset(
    {
        "cdf_compacted_feed_ivm", "lakehouse_daily_report",
        "evolved_layout_pruned_read",
    }
)

_GATE_ANCHORS: tuple[str, ...] = (
    "daily_avg_report",        # flagship grouped avg + time bucket (A2)
    "topk_recent_events",      # projection + ORDER BY DESC LIMIT (P1/O1)
    "json_map_explode",        # JSON extraction + map→rows (P2/F10)
    "latest_event_per_key",    # window functions (§2.5)
    "setops_intersect",        # set operations (§2.7)
    "scalar_function_pack",    # scalar function surface (F1–F9)
    "pricing_summary",         # OLAP partial+final agg (decimal path)
    "star_join_revenue",       # broadcast star join
    "merge_upsert_orders",     # MERGE equi-join upsert (J1)
    "idempotent_append_orders",# existence anti-join append (J2)
    "sessionize_events",       # gap-based sessionization
    "asof_attribution",        # as-of temporal join
    "skew_safe_event_counts",  # salted two-phase agg
    "dedup_exact_docs",        # exact dedup
    "curated_corpus_v2",       # capstone: LSH chain + components + decon
    "text_stats_quality",      # text stats / quality / lang-ID
    "cosine_topk",             # brute-force cosine (bench-noise watch)
    "ivf_topk_kmeans",         # k-means IVF quantizer + probed search
    "multimodal_decode",       # Arrow-batched multimodal UDF
    "streaming_daily_avg",     # streaming windowed agg (T2)
    "grouped_stats_pandas",    # grouped pandas UDF surface (§2.10)
    "scd2_orders_status",      # SCD2 history merge
)

# Round 16 (optimization round — no new queries by rule): rotation is
# EMPTY and every non-anchor slot is a deliberate re-proof. VERDICT r15
# item 2: the r15 optimizer rewrote the ANN/ADC family, the Arrow BPE
# kernels, the stored-index search, the graph-loop folds, SemDeDup's
# salt and the rfm/sql_scripting staging with only 2 of ~19 touched
# names in the r15 gate — round 16 gates EVERY r15-touched query plus
# everything the r16 optimizer touches.
_GATE_ROTATION: tuple[str, ...] = ()

# Backfill to 50 (r8 policy, see module docstring). Tier (a) leads and
# fills the round: first the queries the R16 optimizer itself rewrote
# (containment metadata-verify, PPJoin positional filter, ivm_minmax
# CDC fold, the three newly spread text folds), then the full VERDICT
# r15 item-2 list — the r15-rewritten ANN/ADC + Arrow-BPE + dedup
# tokenization + SemDeDup + graph-loop + staging paths that had no r15
# driver row on the new code (incl. the 5-name r05 stale-pool
# remainder: ivfpq/pq/ivfpq_rerank, streaming_cms_counts,
# semantic_dedup_kmeans).
_REPROOF_BACKFILL: tuple[str, ...] = (
    # tier (a.1) — r16-rewritten operators, most-affected first:
    "containment_near_dups", "prefix_filter_near_dups",
    "ivm_minmax_recompute", "repetition_ratio_docs",
    "substring_dedup_spans", "duplicate_spans_docs",
    # tier (a.2) — the r15-rewritten paths (VERDICT r15 item 2 list,
    # plus the rest of the in-row ANN family from the same commits):
    "ivfpq_topk_adc", "pq_topk_adc", "ivfpq_rerank_topk",
    "bpe_train_merges", "bpe_encode_corpus", "minhash_pairs",
    "simhash_docs", "jaccard_near_dups", "semantic_dedup_kmeans",
    "er_golden_record", "bfs_dedup_distance", "dedup_clusters",
    "mmr_rerank_topk", "mmr_rerank_stored", "rfm_segments",
    "sql_scripting_pack", "pagerank_dedup_graph", "streaming_cms_counts",
    "knn_graph", "embedding_near_dups", "ann_lsh_topk",
    "decontaminate_embeddings",
)

_GATE_PRIORITY: tuple[str, ...] = (
    _GATE_ANCHORS + _GATE_ROTATION + _REPROOF_BACKFILL
)

_ALL_QUERIES = {
    **_CORE_QUERIES,
    **EXT_QUERIES,
    **STREAM_QUERIES,
    **OLAP_QUERIES,
}

# Import-time invariants — explicit raises, not `assert` (ADVICE r03:
# asserts vanish under python -O, silently shrinking the verified gate).
_missing = [n for n in _GATE_PRIORITY if n not in _ALL_QUERIES]
if _missing:
    raise RuntimeError(f"_GATE_PRIORITY names not registered: {_missing}")
if len(_GATE_PRIORITY) != len(set(_GATE_PRIORITY)):
    raise RuntimeError("gate priority list contains duplicates")
if len(_GATE_PRIORITY) != 50:
    raise RuntimeError(
        f"gate priority list must be exactly 50 names, got {len(_GATE_PRIORITY)}"
    )
_stale = [n for n in _GATE_ROTATION if n in GATED_THROUGH_R15]
if _stale:
    raise RuntimeError(
        f"rotation slots must hold never-gated names, got: {_stale}"
    )
# Backfill names are the opposite: each must be a deliberate RE-proof
# (previously green) — a never-proven name hiding there would dodge the
# stale-slot bookkeeping.
_not_reproof = [n for n in _REPROOF_BACKFILL if n not in GATED_THROUGH_R15]
if _not_reproof:
    raise RuntimeError(
        f"backfill slots must hold previously-green names, got: {_not_reproof}"
    )


def rotation_candidates() -> list[str]:
    """Registered queries that have never had a driver row and are not
    in the current gate — the pool for next round's rotation slots."""
    gated = set(_GATE_PRIORITY) | GATED_THROUGH_R15
    return [n for n in _ALL_QUERIES if n not in gated]


QUERIES = {n: _ALL_QUERIES[n] for n in _GATE_PRIORITY}
QUERIES.update(
    (n, fn) for n, fn in _ALL_QUERIES.items() if n not in QUERIES
)

ORACLES = {**_CORE_ORACLES, **EXT_ORACLES, **STREAM_ORACLES, **OLAP_ORACLES}
# Keep oracle iteration order aligned with the gate order (harmless for
# lookup, helpful for humans diffing CORRECTNESS files).
ORACLES = {
    n: ORACLES[n] for n in list(QUERIES) if n in ORACLES
} | {n: s for n, s in ORACLES.items() if n not in QUERIES}

__all__ = [
    "QUERIES", "ORACLES", "GATED_THROUGH_R06", "GATED_THROUGH_R07",
    "GATED_THROUGH_R08", "GATED_THROUGH_R09", "GATED_THROUGH_R10",
    "GATED_THROUGH_R11", "GATED_THROUGH_R12", "GATED_THROUGH_R13",
    "GATED_THROUGH_R14", "GATED_THROUGH_R15",
    "rotation_candidates",
]
