"""DuckDB oracles for the round-2 OLAP pack (queries_olap.py), built
from the same literals and the shared exact-arithmetic helpers."""

from __future__ import annotations

from .oracles import _davg, _dsum, _round
from .queries_olap import (
    Q7_HI,
    Q7_LO,
    Q7_NATION_A,
    Q7_NATION_B,
    Q8_NATION,
    Q8_REGION,
    Q8_TYPE,
    Q10_HI,
    Q10_LO,
    Q14_HI,
    Q14_LO,
    Q18_MIN_QTY,
    Q19_BRANDS,
    Q22_CUTOFF,
)

_REV = "l_extendedprice * (1 - l_discount)"

_Q19_ARMS = " OR ".join(
    f"(p_brand = '{b}' AND p_size BETWEEN {slo} AND {shi} "
    f"AND l_quantity BETWEEN {qlo} AND {qhi})"
    for b, slo, shi, qlo, qhi in Q19_BRANDS
)
_Q19_BRAND_LIST = ", ".join(f"'{b}'" for b, *_ in Q19_BRANDS)

OLAP_ORACLES: dict[str, str] = {
    "q7_volume_shipping": f"""
        SELECT n1.n_name AS supp_nation,
               n2.n_name AS cust_nation,
               CAST(year(l_shipdate) AS BIGINT) AS l_year,
               {_round(_dsum(_REV), 2)} AS revenue
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
        WHERE l_shipdate >= TIMESTAMP '{Q7_LO} 00:00:00'
          AND l_shipdate <  TIMESTAMP '{Q7_HI} 00:00:00'
          AND ((n1.n_name = '{Q7_NATION_A}' AND n2.n_name = '{Q7_NATION_B}')
            OR (n1.n_name = '{Q7_NATION_B}' AND n2.n_name = '{Q7_NATION_A}'))
        GROUP BY n1.n_name, n2.n_name, year(l_shipdate)
        ORDER BY supp_nation, cust_nation, l_year
    """,
    "q8_market_share": f"""
        SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
               {_round(
                   "(" + _dsum(f"CASE WHEN sn.n_name = '{Q8_NATION}' THEN {_REV} ELSE 0.0 END")
                   + ") / (" + _dsum(_REV) + ")", 6)} AS mkt_share,
               count(*) AS n_lines
        FROM lineitem
        JOIN part     ON l_partkey = p_partkey
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation cn ON c_nationkey = cn.n_nationkey
        JOIN region   ON cn.n_regionkey = r_regionkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation sn ON s_nationkey = sn.n_nationkey
        WHERE p_type = '{Q8_TYPE}' AND r_name = '{Q8_REGION}'
        GROUP BY year(o_orderdate)
        ORDER BY o_year
    """,
    "q10_returned_revenue": f"""
        SELECT c_custkey, c_name, n_name, c_acctbal,
               {_round(_dsum(_REV), 2)} AS revenue
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation   ON c_nationkey = n_nationkey
        WHERE l_returnflag = 'R'
          AND o_orderdate >= TIMESTAMP '{Q10_LO} 00:00:00'
          AND o_orderdate <  TIMESTAMP '{Q10_HI} 00:00:00'
        GROUP BY c_custkey, c_name, n_name, c_acctbal
        ORDER BY revenue DESC, c_custkey
        LIMIT 20
    """,
    "q14_promo_share": f"""
        SELECT {_round(
                   "100.0 * ("
                   + _dsum(f"CASE WHEN p_type = '{Q8_TYPE}' THEN {_REV} ELSE 0.0 END")
                   + ") / (" + _dsum(_REV) + ")", 4)} AS promo_pct,
               count(*) AS n_lines
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        WHERE l_shipdate >= TIMESTAMP '{Q14_LO} 00:00:00'
          AND l_shipdate <  TIMESTAMP '{Q14_HI} 00:00:00'
    """,
    "q18_big_orders": f"""
        WITH big AS (
            SELECT l_orderkey, sum(l_quantity) AS sum_qty
            FROM lineitem
            GROUP BY l_orderkey
            HAVING sum(l_quantity) > {Q18_MIN_QTY}
        )
        SELECT c_custkey, c_name, o_orderkey,
               CAST(o_orderdate AS DATE) AS order_date,
               o_totalprice,
               CAST(sum_qty AS BIGINT) AS sum_qty
        FROM big
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        ORDER BY o_totalprice DESC, o_orderkey
        LIMIT 20
    """,
    "q19_or_pushdown": f"""
        SELECT {_round(_dsum(_REV), 2)} AS revenue,
               count(*) AS n_lines
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        WHERE p_brand IN ({_Q19_BRAND_LIST})
          AND ({_Q19_ARMS})
    """,
    "q22_idle_customers": f"""
        WITH t AS (
            SELECT {_davg('c_acctbal')} AS avg_bal
            FROM customer WHERE c_acctbal > 0.0
        )
        SELECT c_nationkey,
               count(*) AS n_cust,
               {_round(_dsum('c_acctbal'), 2)} AS total_bal
        FROM customer, t
        WHERE c_acctbal > t.avg_bal
          AND NOT EXISTS (
              SELECT 1 FROM orders
              WHERE o_custkey = c_custkey
                AND o_orderdate >= TIMESTAMP '{Q22_CUTOFF} 00:00:00')
        GROUP BY c_nationkey
        ORDER BY c_nationkey
    """,
}
