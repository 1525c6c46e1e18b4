"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {name: sec, ...}, "sf": <sf>}

Each query executes its full physical plan into the `noop` sink (no
driver collect, no result pruning — the honest end-to-end cost of the
plan). One tiny warmup query amortizes JVM/codegen startup out of the
measurement.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from etl_end_to_end_airflow_bigquery_spark.plans import QUERIES
from etl_end_to_end_airflow_bigquery_spark.session import get_spark

# Headliners: the reference-surface aggregate/join/window core plus the
# heavy extension operators (LSH dedup, vector search).
BENCH_QUERIES = [
    "pricing_summary",
    "star_join_revenue",
    "daily_avg_report",
    "latest_event_per_key",
    "sessionize_events",
    "asof_attribution",
    "merge_upsert_orders",
    "dedup_exact_docs",
    "minhash_pairs",
    "simhash_docs",
    "cosine_topk",
    # round 2: the LLM-pack heavy hitters join the record (same min-of-2
    # noop-sink measurement; r01's 11 queries keep their per-query analogs)
    "jaccard_near_dups",
    "embedding_near_dups",
    "ann_lsh_topk",
    "curated_corpus",
    # round 3: the widest joins in the repo join the record (VERDICT r02
    # item 8); r02's 15 queries stay a prefix so the shared subtotal is
    # directly comparable across rounds.
    "q5_local_supplier_volume",
    "q18_big_orders",
    "scd2_orders_status",
    "curated_corpus_v2",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0
    spark = get_spark("bench")

    # Warmup: JVM + codegen + parquet footer caches.
    QUERIES["top_orders_by_date"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()

    timings: dict[str, float] = {}
    for name in BENCH_QUERIES:
        best = float("inf")
        for _ in range(2):  # min-of-2: damps JIT/GC noise in the record
            t0 = time.perf_counter()
            QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_runtime",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
