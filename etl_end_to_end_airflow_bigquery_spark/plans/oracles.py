"""DuckDB oracle SQL — one ANSI-SQL statement per query in
``queries.py``, value-equivalent by construction:

- identical aliases and column order;
- identical rounding (round after exact-decimal accumulation);
- identical tie-breaks on every ORDER BY feeding a LIMIT;
- identical µs precision on the events timestamp (both engines read the
  parquet TIMESTAMP(MICROS) column natively; legacy nanos files were
  truncated ns→µs identically on both sides).

The driver registers the parquet tables as views named
``region nation customer supplier part orders lineitem events documents
embeddings`` before running these.
"""

from __future__ import annotations

from .queries import (
    BURST_HALF_WINDOW_S,
    EVENT_TYPES,
    GUARD_EVENT_DATE,
    GUARD_EVENT_TYPE,
    GUARD_FLAGS,
    GUARD_SHIP_DATE,
    PRICING_CUTOFF,
    Q4_HI,
    Q4_LO,
    Q17_BRAND,
    SESSION_GAP_US,
    STAR_HI,
    STAR_LO,
)


def _round(expr: str, digits: int) -> str:
    """Portable ROUND — same floor-based half-up formula as
    relational.round_half_up, so ties behave identically in both engines."""
    p = 10**digits
    return (
        f"(floor(abs({expr}) * {p} + 0.5) / {p}.0)"
        f" * (CASE WHEN ({expr}) < 0 THEN -1.0 ELSE 1.0 END)"
    )


def _dsum(expr: str) -> str:
    """Exact fixed-point accumulation, back to double (mirrors
    relational.decimal_sum: floor(x·10⁶ + 0.5) summed as integers)."""
    return (
        f"CAST(sum(CAST(floor({expr} * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE)"
        " / 1000000.0"
    )


def _davg(expr: str) -> str:
    return f"{_dsum(expr)} / count({expr})"


_ORDERS_COLS = [
    "o_orderkey",
    "o_custkey",
    "o_orderstatus",
    "o_totalprice",
    "o_orderdate",
    "o_orderpriority",
]

_MERGE_SELECT = ",\n       ".join(
    [
        "coalesce(s.o_orderkey, t.o_orderkey) AS o_orderkey",
        *[
            f"CASE WHEN s.o_orderkey IS NOT NULL THEN s.{c} ELSE t.{c} END AS {c}"
            for c in _ORDERS_COLS
            if c != "o_orderkey"
        ],
    ]
)

_PIVOT_AGGS = ",\n       ".join(
    f"count(*) FILTER (WHERE event_type = '{t}') AS n_{t}" for t in EVENT_TYPES
)

ORACLES: dict[str, str] = {
    "daily_avg_report": f"""
        SELECT CAST(ts AS DATE) AS report_date,
               event_type,
               {_round(_davg('value'), 4)} AS avg_rate,
               count(*) AS n_ticks
        FROM events
        GROUP BY 1, 2
        ORDER BY 1, 2
    """,
    "topk_recent_events": """
        SELECT event_id, ts, value
        FROM events
        ORDER BY ts DESC, event_id DESC
        LIMIT 10
    """,
    "avg_last10": f"""
        SELECT {_round(_davg('value'), 4)} AS avg_rate,
               count(*) AS n_rows
        FROM (SELECT value FROM events ORDER BY ts DESC, event_id DESC LIMIT 10)
    """,
    "top_orders_by_date": """
        SELECT o_orderkey, o_orderdate, o_totalprice
        FROM orders
        ORDER BY o_orderdate DESC, o_orderkey DESC
        LIMIT 10
    """,
    "count_guard_inlist": f"""
        SELECT count(*) AS n_rows
        FROM lineitem
        WHERE CAST(l_shipdate AS DATE) = DATE '{GUARD_SHIP_DATE}'
          AND l_returnflag IN {GUARD_FLAGS!r}
    """,
    "report_exists_guard": f"""
        SELECT count(*) AS n_existing
        FROM events
        WHERE CAST(ts AS DATE) = DATE '{GUARD_EVENT_DATE}'
          AND event_type = '{GUARD_EVENT_TYPE}'
    """,
    "json_field_extract": """
        SELECT event_id,
               CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val
        FROM events
    """,
    "json_map_explode": """
        SELECT event_id,
               k AS prop_key,
               CAST(json_extract_string(props, '$.' || k) AS BIGINT) AS prop_val
        FROM (
            SELECT event_id, props, unnest(json_keys(props)) AS k
            FROM events
        )
    """,
    "latest_event_per_key": """
        SELECT user_id, event_type,
               event_id AS last_event_id,
               value AS last_value
        FROM (
            SELECT *, row_number() OVER (
                PARTITION BY user_id, event_type
                ORDER BY ts DESC, event_id DESC) AS rn
            FROM events
        )
        WHERE rn = 1
    """,
    "window_topk_per_customer": """
        SELECT o_custkey, o_orderkey, o_orderdate, CAST(rn AS BIGINT) AS rn
        FROM (
            SELECT o_custkey, o_orderkey, o_orderdate, row_number() OVER (
                PARTITION BY o_custkey
                ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
            FROM orders
        )
        WHERE rn <= 3
    """,
    "setops_intersect": """
        SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
        INTERSECT
        SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    """,
    "setops_except": """
        SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
        EXCEPT
        SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    """,
    "setops_union": """
        SELECT o_custkey, 'open' AS bucket
        FROM orders WHERE o_orderstatus = 'O'
        UNION ALL
        SELECT o_custkey, 'finished' AS bucket
        FROM orders WHERE o_orderstatus = 'F'
    """,
    "scalar_function_pack": f"""
        SELECT l_orderkey,
               CAST(l_shipdate AS DATE) AS ship_date,
               CAST(date_trunc('month', l_shipdate) AS DATE) AS ship_month,
               {_round('l_extendedprice * (1 - l_discount)', 4)} AS net_price,
               'ITEM_' || CAST(l_orderkey AS VARCHAR) AS item_tag,
               upper(l_returnflag) AS flag_u,
               greatest(l_tax, l_discount) AS max_rate
        FROM lineitem
        WHERE l_linenumber = 1
    """,
    "pricing_summary": f"""
        SELECT l_returnflag, l_linestatus,
               {_round(_dsum('l_quantity'), 2)} AS sum_qty,
               {_round(_dsum('l_extendedprice'), 2)} AS sum_base_price,
               {_round(_dsum('l_extendedprice * (1 - l_discount)'), 2)} AS sum_disc_price,
               {_round(_dsum('l_extendedprice * (1 - l_discount) * (1 + l_tax)'), 2)} AS sum_charge,
               {_round(_davg('l_quantity'), 4)} AS avg_qty,
               {_round(_davg('l_extendedprice'), 4)} AS avg_price,
               {_round(_davg('l_discount'), 4)} AS avg_disc,
               count(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '{PRICING_CUTOFF} 00:00:00'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
    """,
    "star_join_revenue": f"""
        SELECT r_name, n_name,
               {_round(_dsum('l_extendedprice * (1 - l_discount)'), 2)} AS revenue,
               count(*) AS n_items
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation   ON c_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        WHERE l_shipdate >= TIMESTAMP '{STAR_LO} 00:00:00'
          AND l_shipdate <= TIMESTAMP '{STAR_HI} 00:00:00'
        GROUP BY r_name, n_name
        ORDER BY r_name, n_name
    """,
    "shipping_priority": f"""
        SELECT l_orderkey,
               CAST(o_orderdate AS DATE) AS order_date,
               o_orderpriority,
               {_round(_dsum('l_extendedprice * (1 - l_discount)'), 2)} AS revenue
        FROM customer
        JOIN orders   ON c_custkey = o_custkey
        JOIN lineitem ON o_orderkey = l_orderkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1999-01-01 00:00:00'
        GROUP BY l_orderkey, CAST(o_orderdate AS DATE), o_orderpriority
        ORDER BY revenue DESC, l_orderkey
        LIMIT 10
    """,
    "forecast_revenue": f"""
        SELECT {_round(_dsum('l_extendedprice * l_discount'), 2)} AS forecast_revenue,
               count(*) AS n_rows
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
          AND l_discount >= 0.05 AND l_discount <= 0.07
          AND l_quantity < 24
    """,
    "distinct_parts_per_supplier": """
        SELECT l_suppkey, count(DISTINCT l_partkey) AS n_parts
        FROM lineitem
        GROUP BY l_suppkey
        ORDER BY l_suppkey
    """,
    "rollup_qty": f"""
        SELECT l_returnflag, l_linestatus,
               {_round(_dsum('l_quantity'), 2)} AS sum_qty,
               count(*) AS n_rows,
               CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS grp_id
        FROM lineitem
        GROUP BY ROLLUP (l_returnflag, l_linestatus)
        ORDER BY grp_id, l_returnflag, l_linestatus
    """,
    "cube_counts": """
        SELECT o_orderstatus, o_orderpriority,
               count(*) AS n_orders,
               CAST(GROUPING(o_orderstatus, o_orderpriority) AS BIGINT) AS grp_id
        FROM orders
        GROUP BY CUBE (o_orderstatus, o_orderpriority)
        ORDER BY grp_id, o_orderstatus, o_orderpriority
    """,
    "pivot_event_counts": f"""
        SELECT CAST(ts AS DATE) AS report_date,
               {_PIVOT_AGGS}
        FROM events
        GROUP BY 1
        ORDER BY 1
    """,
    "merge_upsert_orders": f"""
        WITH target AS (
            SELECT * FROM orders WHERE o_orderkey % 3 <> 0
        ), source AS (
            SELECT o_orderkey, o_custkey,
                   'M' AS o_orderstatus,
                   {_round('o_totalprice * 1.1', 2)} AS o_totalprice,
                   o_orderdate, o_orderpriority
            FROM orders WHERE o_orderkey % 2 = 0
        )
        SELECT {_MERGE_SELECT}
        FROM target t
        FULL OUTER JOIN source s ON t.o_orderkey = s.o_orderkey
    """,
    # identity oracle: the Spark side goes documents → two jsonl_commit
    # appends → manifest read-back; equality proves lossless roundtrip
    # AND accumulating append semantics (ADVICE r6 regression)
    "jsonl_commit_roundtrip": """
        SELECT doc_id, source, text FROM documents ORDER BY doc_id
    """,
    # The oracle KNOWS the injection (event_id % 7 truncates the
    # payload) and recomputes both halves relationally: clean-row
    # aggregate from the uncorrupted complement, quarantine count from
    # the corrupted slice. The Spark side must get there through
    # PERMISSIVE from_json + the dead-letter sink roundtrip.
    "quarantine_ingest_events": """
        SELECT event_type,
               count(*) AS n_rows,
               CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT))
                   AS BIGINT) AS sum_k
        FROM events
        WHERE event_id % 7 <> 0
        GROUP BY event_type
        UNION ALL
        SELECT '_quarantined' AS event_type,
               count(*) AS n_rows,
               CAST(NULL AS BIGINT) AS sum_k
        FROM events
        WHERE event_id % 7 = 0
        ORDER BY event_type
    """,
    "time_travel_orders": f"""
        WITH target AS (
            SELECT * FROM orders WHERE o_orderkey % 3 <> 0
        ), source AS (
            SELECT o_orderkey, o_custkey,
                   'M' AS o_orderstatus,
                   {_round('o_totalprice * 1.1', 2)} AS o_totalprice,
                   o_orderdate, o_orderpriority
            FROM orders WHERE o_orderkey % 2 = 0
        ), merged AS (
            SELECT {_MERGE_SELECT}
            FROM target t
            FULL OUTER JOIN source s ON t.o_orderkey = s.o_orderkey
        )
        SELECT 'v1_premerge' AS snapshot,
               count(*) AS n_rows,
               {_dsum('o_totalprice')} AS sum_price,
               count(*) FILTER (WHERE o_orderstatus = 'M') AS n_merged
        FROM target
        UNION ALL
        SELECT 'v2_current' AS snapshot,
               count(*) AS n_rows,
               {_dsum('o_totalprice')} AS sum_price,
               count(*) FILTER (WHERE o_orderstatus = 'M') AS n_merged
        FROM merged
        ORDER BY snapshot
    """,
    "merge_sql_orders": f"""
        WITH target AS (
            SELECT * FROM orders WHERE o_orderkey % 3 <> 0
        ), source AS (
            SELECT o_orderkey, o_custkey,
                   'M' AS o_orderstatus,
                   {_round('o_totalprice * 1.1', 2)} AS o_totalprice,
                   o_orderdate, '0-STAGED' AS o_orderpriority
            FROM orders WHERE o_orderkey % 2 = 0
        )
        SELECT COALESCE(s.o_orderkey, t.o_orderkey) AS o_orderkey,
               CASE WHEN t.o_orderkey IS NOT NULL THEN t.o_custkey
                    ELSE s.o_custkey END AS o_custkey,
               CASE WHEN t.o_orderkey IS NOT NULL AND s.o_orderkey IS NOT NULL
                         THEN s.o_orderstatus
                    WHEN t.o_orderkey IS NULL THEN s.o_orderstatus
                    ELSE t.o_orderstatus END AS o_orderstatus,
               CASE WHEN t.o_orderkey IS NOT NULL AND s.o_orderkey IS NOT NULL
                         THEN s.o_totalprice
                    WHEN t.o_orderkey IS NULL THEN s.o_totalprice
                    ELSE t.o_totalprice END AS o_totalprice,
               CASE WHEN t.o_orderkey IS NOT NULL THEN t.o_orderdate
                    ELSE s.o_orderdate END AS o_orderdate,
               CASE WHEN t.o_orderkey IS NOT NULL THEN t.o_orderpriority
                    ELSE s.o_orderpriority END AS o_orderpriority
        FROM target t
        FULL OUTER JOIN source s ON t.o_orderkey = s.o_orderkey
        ORDER BY o_orderkey
    """,
    # full-sync MERGE: WHEN NOT MATCHED BY SOURCE THEN DELETE drops
    # target-only rows, so the oracle right-joins (source preserved) —
    # the same tightening the Spark lowering applies
    "merge_sql_sync_orders": f"""
        WITH target AS (
            SELECT * FROM orders WHERE o_orderkey % 3 <> 0
        ), source AS (
            SELECT o_orderkey, o_custkey,
                   'M' AS o_orderstatus,
                   {_round('o_totalprice * 1.1', 2)} AS o_totalprice,
                   o_orderdate, o_orderpriority
            FROM orders WHERE o_orderkey % 2 = 0
        )
        SELECT s.o_orderkey AS o_orderkey,
               CASE WHEN t.o_orderkey IS NOT NULL THEN t.o_custkey
                    ELSE s.o_custkey END AS o_custkey,
               s.o_orderstatus AS o_orderstatus,
               s.o_totalprice AS o_totalprice,
               CASE WHEN t.o_orderkey IS NOT NULL THEN t.o_orderdate
                    ELSE s.o_orderdate END AS o_orderdate,
               CASE WHEN t.o_orderkey IS NOT NULL THEN t.o_orderpriority
                    ELSE s.o_orderpriority END AS o_orderpriority
        FROM target t
        RIGHT JOIN source s ON t.o_orderkey = s.o_orderkey
        ORDER BY o_orderkey
    """,
    # The conditional clause ladder spelled as explicit CASE logic, in
    # the statement's clause order (delete → urgent-status-only →
    # general update → guarded insert). A clause-precedence bug in the
    # lowering flips the price of every matched urgent row.
    "merge_sql_multi_clause": f"""
        WITH target AS (
            SELECT * FROM orders WHERE o_orderkey % 3 <> 0
        ), source AS (
            SELECT o_orderkey, o_custkey,
                   'M' AS o_orderstatus,
                   {_round('o_totalprice * 1.1', 2)} AS o_totalprice,
                   o_orderdate, o_orderpriority
            FROM orders WHERE o_orderkey % 2 = 0
        ), j AS (
            SELECT t.o_orderkey AS tk, s.o_orderkey AS sk,
                   t.o_custkey AS t_custkey, s.o_custkey AS s_custkey,
                   t.o_orderstatus AS t_status, s.o_orderstatus AS s_status,
                   t.o_totalprice AS t_price, s.o_totalprice AS s_price,
                   t.o_orderdate AS t_date, s.o_orderdate AS s_date,
                   t.o_orderpriority AS t_prio, s.o_orderpriority AS s_prio
            FROM target t
            FULL OUTER JOIN source s ON t.o_orderkey = s.o_orderkey
        )
        SELECT COALESCE(sk, tk) AS o_orderkey,
               CASE WHEN tk IS NOT NULL THEN t_custkey
                    ELSE s_custkey END AS o_custkey,
               CASE WHEN tk IS NOT NULL AND sk IS NOT NULL THEN s_status
                    WHEN tk IS NULL THEN s_status
                    ELSE t_status END AS o_orderstatus,
               CASE WHEN tk IS NOT NULL AND sk IS NOT NULL
                         AND t_prio = '1-URGENT' THEN t_price
                    WHEN tk IS NOT NULL AND sk IS NOT NULL THEN s_price
                    WHEN tk IS NULL THEN s_price
                    ELSE t_price END AS o_totalprice,
               CASE WHEN tk IS NULL THEN s_date ELSE t_date END AS o_orderdate,
               CASE WHEN tk IS NULL THEN s_prio ELSE t_prio END
                   AS o_orderpriority
        FROM j
        WHERE NOT (tk IS NOT NULL AND sk IS NOT NULL AND s_price > 400000)
          AND NOT (tk IS NULL AND NOT (s_price < 150000))
        ORDER BY o_orderkey
    """,
    "idempotent_append_orders": """
        WITH target AS (
            SELECT * FROM orders WHERE o_orderkey % 3 <> 0
        ), batch AS (
            SELECT * FROM orders WHERE o_orderkey % 5 = 0
        )
        SELECT * FROM target
        UNION ALL
        SELECT b.* FROM batch b
        WHERE NOT EXISTS (
            SELECT 1 FROM target t WHERE t.o_orderkey = b.o_orderkey
        )
    """,
    "sessionize_events": f"""
        WITH e AS (
            SELECT event_id, user_id, ts, epoch_us(ts) AS ts_us FROM events
        ), f AS (
            SELECT *,
                   CASE WHEN ts_us - lag(ts_us) OVER
                        (PARTITION BY user_id ORDER BY ts_us, event_id)
                        > {SESSION_GAP_US} THEN 1 ELSE 0 END AS new_session
            FROM e
        ), s AS (
            SELECT *,
                   CAST(sum(new_session) OVER (
                       PARTITION BY user_id ORDER BY ts_us, event_id
                       ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
            FROM f
        )
        SELECT user_id, session_id,
               count(*) AS n_events,
               min(ts) AS session_start,
               max(ts) AS session_end
        FROM s
        GROUP BY user_id, session_id
        ORDER BY user_id, session_id
    """,
    "session_window_native": f"""
        WITH e AS (
            SELECT event_id, user_id, ts, epoch_us(ts) AS ts_us FROM events
        ), f AS (
            SELECT *,
                   -- >= (not >): a gap of exactly the timeout starts a new
                   -- session under Spark's session_window merge rule
                   CASE WHEN ts_us - lag(ts_us) OVER
                        (PARTITION BY user_id ORDER BY ts_us, event_id)
                        >= {SESSION_GAP_US} THEN 1 ELSE 0 END AS new_session
            FROM e
        ), s AS (
            SELECT *,
                   sum(new_session) OVER (
                       PARTITION BY user_id ORDER BY ts_us, event_id
                       ROWS UNBOUNDED PRECEDING) AS sid
            FROM f
        )
        SELECT user_id,
               min(ts) AS session_start,
               max(ts) + INTERVAL 30 MINUTE AS session_end,
               count(*) AS n_events
        FROM s
        GROUP BY user_id, sid
        ORDER BY user_id, session_start
    """,
    "asof_attribution": """
        -- The right side is pre-deduped to one row per (user_id, ts) with
        -- an explicit max-by rule: DuckDB's ASOF JOIN picks an unspecified
        -- row on timestamp ties, while the Spark operator deterministically
        -- takes the struct-greatest payload (= max view_id at equal ts).
        -- The GROUP BY pins both engines to the identical row.
        SELECT p.event_id, p.user_id, v.view_id,
               epoch_us(p.ts) - epoch_us(v.ts) AS lag_us
        FROM (SELECT event_id, user_id, ts FROM events
              WHERE event_type = 'purchase') p
        ASOF LEFT JOIN (SELECT user_id, ts, max(event_id) AS view_id
                        FROM events
                        WHERE event_type = 'view'
                        GROUP BY user_id, ts) v
          ON p.user_id = v.user_id AND p.ts >= v.ts
        ORDER BY p.event_id
    """,
    "views_before_purchase": """
        SELECT p.event_id, p.user_id, count(v.ts) AS n_views
        FROM (SELECT event_id, user_id, ts FROM events
              WHERE event_type = 'purchase') p
        LEFT JOIN (SELECT user_id, ts FROM events
                   WHERE event_type = 'view') v
          ON p.user_id = v.user_id
         AND v.ts < p.ts
         AND v.ts >= p.ts - INTERVAL 1 HOUR
        GROUP BY p.event_id, p.user_id
        ORDER BY p.event_id
    """,
    "burst_events_window": f"""
        SELECT a.event_id AS event_id,
               count(CASE WHEN b.event_id <> a.event_id THEN 1 END)
                   AS n_nearby,
               {_dsum("CASE WHEN b.event_id <> a.event_id THEN b.value ELSE 0.0 END")}
                   AS nearby_value
        FROM events a
        JOIN events b
          ON b.ts >= a.ts - INTERVAL {BURST_HALF_WINDOW_S} SECOND
         AND b.ts <= a.ts + INTERVAL {BURST_HALF_WINDOW_S} SECOND
        GROUP BY a.event_id
        ORDER BY event_id
    """,
    "session_concurrency_daily": f"""
        WITH e AS (
            SELECT event_id, user_id, ts, epoch_us(ts) AS ts_us FROM events
        ), f AS (
            SELECT *,
                   CASE WHEN ts_us - lag(ts_us) OVER
                        (PARTITION BY user_id ORDER BY ts_us, event_id)
                        > {SESSION_GAP_US} THEN 1 ELSE 0 END AS new_session
            FROM e
        ), s AS (
            SELECT *,
                   CAST(sum(new_session) OVER (
                       PARTITION BY user_id ORDER BY ts_us, event_id
                       ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
            FROM f
        ), sess AS (
            SELECT user_id, session_id,
                   min(ts) AS session_start, max(ts) AS session_end
            FROM s GROUP BY user_id, session_id
        ), deltas AS (
            SELECT session_start AS ts, 1 AS delta FROM sess
            UNION ALL
            SELECT session_end AS ts, -1 AS delta FROM sess
        ), sweep AS (
            SELECT ts,
                   CAST(sum(delta) OVER (
                       ORDER BY epoch_us(ts), -delta
                       ROWS UNBOUNDED PRECEDING) AS BIGINT) AS active
            FROM deltas
        )
        SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
               max(active) AS peak_concurrent
        FROM sweep
        GROUP BY day
        ORDER BY day
    """,
    "overlapping_sessions": f"""
        WITH e AS (
            SELECT event_id, user_id, ts, epoch_us(ts) AS ts_us FROM events
        ), f AS (
            SELECT *,
                   CASE WHEN ts_us - lag(ts_us) OVER
                        (PARTITION BY user_id ORDER BY ts_us, event_id)
                        > {SESSION_GAP_US} THEN 1 ELSE 0 END AS new_session
            FROM e
        ), s AS (
            SELECT *,
                   CAST(sum(new_session) OVER (
                       PARTITION BY user_id ORDER BY ts_us, event_id
                       ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
            FROM f
        ), sess AS (
            SELECT user_id, session_id,
                   min(ts) AS session_start, max(ts) AS session_end
            FROM s GROUP BY user_id, session_id
            HAVING count(*) >= 2
        )
        SELECT a.user_id AS u1, a.session_id AS s1,
               b.user_id AS u2, b.session_id AS s2,
               epoch_us(least(a.session_end, b.session_end))
                 - epoch_us(greatest(a.session_start, b.session_start))
                 AS overlap_us
        FROM sess a
        JOIN sess b
          ON a.user_id < b.user_id
         AND a.session_start <= b.session_end
         AND b.session_start <= a.session_end
        ORDER BY u1, s1, u2, s2
    """,
    "ohlc_daily": """
        WITH e AS (
            SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
                   event_type, ts, event_id, value
            FROM events
        ), r AS (
            SELECT *,
                   row_number() OVER (PARTITION BY day, event_type
                       ORDER BY ts, event_id) AS rn_a,
                   row_number() OVER (PARTITION BY day, event_type
                       ORDER BY ts DESC, event_id DESC) AS rn_d
            FROM e
        )
        SELECT day, event_type,
               max(CASE WHEN rn_a = 1 THEN value END) AS open,
               max(value) AS high,
               min(value) AS low,
               max(CASE WHEN rn_d = 1 THEN value END) AS close,
               count(*) AS n_ticks
        FROM r
        GROUP BY day, event_type
        ORDER BY day, event_type
    """,
    "daily_returns_volatility": f"""
        WITH e AS (
            SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
                   event_type, ts, event_id, value
            FROM events
        ), r AS (
            SELECT *,
                   row_number() OVER (PARTITION BY day, event_type
                       ORDER BY ts DESC, event_id DESC) AS rn_d
            FROM e
        ), closes AS (
            SELECT day, event_type, value AS close FROM r WHERE rn_d = 1
        ), rets AS (
            SELECT event_type,
                   close / lag(close) OVER (PARTITION BY event_type
                       ORDER BY day) - CAST(1.0 AS DOUBLE) AS ret
            FROM closes
        ), moments AS (
            SELECT event_type,
                   CAST(count(*) AS DOUBLE) AS n,
                   CAST(sum(CAST(floor(ret * 1000000000000.0 + 0.5)
                       AS BIGINT)) AS DOUBLE) / 1000000000000.0 AS sr,
                   CAST(sum(CAST(floor(ret * ret * 1000000000000.0 + 0.5)
                       AS BIGINT)) AS DOUBLE) / 1000000000000.0 AS sr2
            FROM rets
            WHERE ret IS NOT NULL
            GROUP BY event_type
        )
        SELECT event_type,
               CAST(n AS BIGINT) AS n_days,
               {_round("sr / n", 8)} AS mean_ret,
               {_round("sqrt((sr2 - sr * sr / n) / (n - CAST(1.0 AS DOUBLE)))", 8)}
                   AS volatility
        FROM moments
        ORDER BY event_type
    """,
    "max_drawdown_series": f"""
        WITH e AS (
            SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
                   event_type, ts, event_id, value
            FROM events
        ), r AS (
            SELECT *,
                   row_number() OVER (PARTITION BY day, event_type
                       ORDER BY ts DESC, event_id DESC) AS rn_d
            FROM e
        ), closes AS (
            SELECT day, event_type, value AS close FROM r WHERE rn_d = 1
        ), dd AS (
            SELECT day, event_type,
                   close / max(close) OVER (PARTITION BY event_type
                       ORDER BY day ROWS UNBOUNDED PRECEDING)
                     - CAST(1.0 AS DOUBLE) AS drawdown
            FROM closes
        ), worst AS (
            SELECT event_type, min(drawdown) AS mdd FROM dd
            GROUP BY event_type
        )
        SELECT dd.event_type,
               {_round("min(dd.drawdown)", 8)} AS max_drawdown,
               min(dd.day) AS trough_day
        FROM dd JOIN worst ON dd.event_type = worst.event_type
                          AND dd.drawdown = worst.mdd
        GROUP BY dd.event_type
        ORDER BY dd.event_type
    """,
    "reorder_gap_by_segment": f"""
        WITH g AS (
            SELECT o_custkey,
                   date_diff('day',
                       CAST(lag(o_orderdate) OVER (
                           PARTITION BY o_custkey
                           ORDER BY o_orderdate, o_orderkey) AS DATE),
                       CAST(o_orderdate AS DATE)) AS gap_days
            FROM orders
        )
        SELECT c_mktsegment,
               {_round('CAST(sum(gap_days) AS DOUBLE) / count(gap_days)', 4)}
                   AS avg_gap_days,
               count(gap_days) AS n_gaps
        FROM g JOIN customer ON g.o_custkey = customer.c_custkey
        WHERE gap_days IS NOT NULL
        GROUP BY c_mktsegment
        ORDER BY c_mktsegment
    """,
    "cumulative_monthly_revenue": """
        WITH m AS (
            SELECT o_orderstatus,
                   CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
                   CAST(sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT))
                        AS BIGINT) AS cents
            FROM orders
            GROUP BY 1, 2
        )
        SELECT o_orderstatus, month,
               CAST(cents AS DOUBLE) / 100.0 AS revenue,
               CAST(CAST(sum(cents) OVER (
                   PARTITION BY o_orderstatus ORDER BY month
                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS DOUBLE) / 100.0
                   AS cum_revenue
        FROM m
        ORDER BY o_orderstatus, month
    """,
    "order_priority_exists": f"""
        SELECT o_orderpriority, count(*) AS n_orders
        FROM orders o
        WHERE o.o_orderdate >= TIMESTAMP '{Q4_LO} 00:00:00'
          AND o.o_orderdate <  TIMESTAMP '{Q4_HI} 00:00:00'
          AND EXISTS (SELECT 1 FROM lineitem l
                      WHERE l.l_orderkey = o.o_orderkey
                        AND l.l_shipdate > o.o_orderdate)
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
    """,
    "small_qty_revenue": f"""
        WITH lb AS (
            SELECT l.l_partkey, l.l_quantity, l.l_extendedprice
            FROM lineitem l
            JOIN part p ON l.l_partkey = p.p_partkey
            WHERE p.p_brand = '{Q17_BRAND}'
        ), t AS (
            SELECT l_partkey,
                   ({_davg('l_quantity')}) * 0.2 AS qty_thresh
            FROM lb
            GROUP BY l_partkey
        )
        SELECT {_round(_dsum('lb.l_extendedprice') + ' / 7.0', 2)} AS avg_yearly
        FROM lb JOIN t USING (l_partkey)
        WHERE lb.l_quantity < t.qty_thresh
    """,
    "median_price_by_status": """
        WITH r AS (
            SELECT o_orderstatus, o_totalprice,
                   row_number() OVER (PARTITION BY o_orderstatus
                                      ORDER BY o_totalprice, o_orderkey) AS rn,
                   count(*) OVER (PARTITION BY o_orderstatus) AS n
            FROM orders
        )
        SELECT o_orderstatus,
               sum(o_totalprice) / count(*) AS median_price
        FROM r
        WHERE rn = (n + 1) // 2 OR rn = n // 2 + 1
        GROUP BY o_orderstatus
        ORDER BY o_orderstatus
    """,
    "skew_safe_event_counts": f"""
        SELECT event_type,
               count(*) AS n_events,
               {_dsum('value')} AS sum_value
        FROM events
        GROUP BY event_type
        ORDER BY event_type
    """,
}
