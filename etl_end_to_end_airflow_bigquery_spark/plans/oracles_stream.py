"""Oracles for the streaming / Pandas-UDF gate queries.

The streaming daily average must equal the batch daily average — it
reuses the batch oracle verbatim (same aliases, same rounding). The
pandas grouped stats mirror the scaled-int accumulation the UDF does in
numpy.
"""

from __future__ import annotations

from .oracles import ORACLES, _round

_SUM_U = "sum(CAST(floor(value * 1000000.0 + 0.5) AS BIGINT))"

STREAM_ORACLES: dict[str, str] = {
    # identical output contract to the batch flagship — one oracle fits both
    "streaming_daily_avg": ORACLES["daily_avg_report"],
    # bit-identical sessions from the streaming engine — batch oracle reused
    "streaming_sessionize": ORACLES["session_window_native"],
    "streaming_view_purchase_join": """
        SELECT p.event_id AS purchase_id, v.event_id AS view_id
        FROM (SELECT event_id, user_id, ts FROM events
              WHERE event_type = 'purchase') p
        JOIN (SELECT event_id, user_id, ts FROM events
              WHERE event_type = 'view') v
          ON p.user_id = v.user_id
         AND v.ts < p.ts
         AND v.ts >= p.ts - INTERVAL 1 HOUR
        ORDER BY purchase_id, view_id
    """,
    "streaming_view_purchase_left": """
        SELECT p.event_id AS purchase_id,
               p.ts AS p_ts,
               coalesce(v.event_id, -1) AS view_id
        FROM (SELECT event_id, user_id, ts FROM events
              WHERE event_type = 'purchase') p
        LEFT JOIN (SELECT event_id, user_id, ts FROM events
                   WHERE event_type = 'view') v
          ON p.user_id = v.user_id
         AND v.ts < p.ts
         AND v.ts >= p.ts - INTERVAL 1 HOUR
        WHERE p.ts <= (SELECT max(ts) FROM events) - INTERVAL 2 HOUR
        ORDER BY purchase_id, view_id
    """,
    "streaming_segment_counts": f"""
        SELECT c_mktsegment,
               count(*) AS n_events,
               {_round("CAST(" + _SUM_U + " AS DOUBLE) / 1000000.0", 4)}
                   AS sum_value
        FROM events JOIN customer ON user_id = c_custkey
        GROUP BY c_mktsegment
        ORDER BY c_mktsegment
    """,
    "streaming_sliding_avg": f"""
        WITH ticks AS (
            SELECT CAST(ts AS DATE) AS d, event_type, value FROM events
        ), ks AS (
            SELECT unnest(range(0, 7)) AS k
        ), expanded AS (
            SELECT d - CAST(k AS INTEGER) AS win_start, event_type, value
            FROM ticks CROSS JOIN ks
        )
        SELECT win_start, event_type,
               {_round("CAST(" + _SUM_U + " AS DOUBLE) / 1000000.0 / count(value)", 4)}
                   AS avg_rate,
               count(*) AS n_ticks
        FROM expanded
        GROUP BY win_start, event_type
        ORDER BY win_start, event_type
    """,
    "grouped_stats_pandas": f"""
        SELECT event_type,
               count(*) AS n_ticks,
               CAST({_SUM_U} AS BIGINT) AS sum_value_u,
               {_round(f"CAST({_SUM_U} AS DOUBLE) / 1000000.0 / count(value)", 4)}
                   AS avg_value
        FROM events
        GROUP BY event_type
        ORDER BY event_type
    """,
    "streaming_dedup_events": """
        SELECT DISTINCT user_id, event_type
        FROM events
        ORDER BY user_id, event_type
    """,
    # the production update-mode + foreachBatch-merge sink must converge
    # to the same table as the batch flagship — same oracle again
    "streaming_report_merge": ORACLES["daily_avg_report"],
}

# state-store reader: the engine's retained dedup state must BE the
# distinct key set — shares the sink-side twin's oracle verbatim
STREAM_ORACLES["streaming_state_dedup_keys"] = STREAM_ORACLES[
    "streaming_dedup_events"
]

from ..operators.sketch import CMS_DEPTH, CMS_WIDTH  # noqa: E402

_SCMS_ROWS = "\n        UNION ALL\n".join(
    f"        SELECT {r} AS r,"
    " CAST(concat('0x', substr(md5(concat('cms" + str(r) + "|',"
    " CAST(user_id AS VARCHAR))), 1, 8)) AS BIGINT) % "
    + str(CMS_WIDTH)
    + " AS pos FROM events"
    for r in range(CMS_DEPTH)
)

STREAM_ORACLES["streaming_cms_counts"] = f"""
    WITH rp AS (
{_SCMS_ROWS}
    )
    SELECT r, pos, count(*) AS cnt
    FROM rp
    GROUP BY r, pos
    ORDER BY r, pos
"""

STREAM_ORACLES["streaming_burst_pairs"] = """
    SELECT a.event_id AS a_id, b.event_id AS b_id
    FROM events a
    JOIN events b
      ON b.ts >= a.ts - INTERVAL 60 SECOND
     AND b.ts <= a.ts + INTERVAL 60 SECOND
     AND a.event_id <> b.event_id
    ORDER BY a_id, b_id
"""

# argmin/argmax by (ts, event_id) == the batch row_number spelling:
# streaming OHLC shares the batch oracle verbatim.
from .oracles import ORACLES as _CORE  # noqa: E402

STREAM_ORACLES["streaming_ohlc_daily"] = _CORE["ohlc_daily"]

# Streaming IVM shares the batch retraction twin's oracle VERBATIM (the
# full post-CDC recompute): hash-equality proves the micro-batched
# signed fold lands bit-identically regardless of how the engine slices
# the CDC feed (r5/r6 shared-oracle pattern).
from .oracles_olap import OLAP_ORACLES as _OLAP  # noqa: E402

STREAM_ORACLES["streaming_ivm_revenue"] = _OLAP["ivm_join_revenue_retract"]

# Streaming pHash shares the batch blockhash recomputation MECHANISM
# AND TEXT: the byt+hh CTE chain is the single shared constant in
# oracles_ext, so the two pHash twins can never silently diverge.
from .oracles_ext import BLOCKHASH_HH_CTE as _HH  # noqa: E402

STREAM_ORACLES["streaming_phash_assets"] = f"""
    WITH {_HH}
    SELECT doc_id AS asset_id,
           'text' AS modality,
           phash
    FROM hh
    ORDER BY asset_id
"""

# Streaming incremental dedup shares the batch twin's oracle VERBATIM:
# per-doc verdicts depend only on the base corpus, so micro-batch
# slicing cannot change them — the gate proves it.
from .oracles_ext import EXT_ORACLES as _EXT  # noqa: E402

STREAM_ORACLES["streaming_incremental_dedup"] = _EXT[
    "incremental_dedup_batch"
]

# Streaming rollup cascade shares the batch cascade's oracle VERBATIM
# (direct day-grain recompute from raw events): micro-batch slicing
# must be invisible in the maintained state.
STREAM_ORACLES["streaming_rollup_cascade"] = _OLAP["rollup_cascade_daily"]

# Shared verbatim with the batch twin: the gate proves micro-batch
# slicing (and the latest-wins ⊕ fold) is invisible to the applied view.
STREAM_ORACLES["streaming_cdc_apply"] = _OLAP["cdc_out_of_order_apply"]

# Shared verbatim with the batch cascade: histogram merging must
# commute with any micro-batch slicing of the stream.
STREAM_ORACLES["streaming_quantile_cascade"] = _OLAP["quantile_rollup_cascade"]

# Shared verbatim with the batch twin: OR-merging membership masks must
# commute with any micro-batch slicing (and replay, by idempotence).
STREAM_ORACLES["streaming_bitmap_distinct"] = _OLAP["bitmap_distinct_users"]

# Shared verbatim with the batch CEP twin: the boundary-tail fold must
# make micro-batch edges invisible to the match census.
STREAM_ORACLES["streaming_cep_funnel"] = _OLAP["cep_pattern_funnel"]

# Shared verbatim with the batch Kleene twin: the cap+1 boundary tail
# plus the purchase-in-batch filter must make micro-batch edges
# invisible to the match census.
STREAM_ORACLES["streaming_cep_kleene"] = _OLAP["cep_kleene_funnel"]

# Shared verbatim with the batch MG twin: summary merge + re-prune is
# commutative/associative, so micro-batch edges are invisible to the
# candidate set the exact recount serves from.
from .oracles_ext import EXT_ORACLES as _EXT

STREAM_ORACLES["streaming_misra_gries"] = _EXT["misra_gries_heavy_hitters"]

# Shared verbatim with the batch spec-evolution twin: the streamed
# cutover (old spec -> new spec mid-stream, idempotent landing appends)
# must reproduce the un-evolved relational aggregate exactly — no row
# dropped or duplicated at the boundary, whatever the micro-batch
# slicing or redelivery.
STREAM_ORACLES["streaming_partition_evolution"] = _OLAP[
    "partition_evolution_read"
]
