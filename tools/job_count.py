"""Spark JOB COUNT per query — the machine-noise-immune evidence channel
for driver-loop optimizations (VERDICT r15 item 9).

Wall-clock A/Bs on loop-shaped queries (connected components, BFS,
pagerank, IVM maintenance) measure scheduler latency under whatever load
the host carries; the number of Spark jobs a query launches is a
deterministic property of the code. This tool runs each named query
once into the noop sink and reports the statusTracker job-id delta —
the per-query job count — so loop-fold claims are reproducible rather
than quoted.

Usage: python tools/job_count.py [sf_dir] query [query ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, ".")


def main() -> int:
    rest = sys.argv[1:]
    if rest and os.path.isdir(rest[0]):
        sf_dir, names = rest[0], rest[1:]
    else:
        sf_dir, names = "/root/testdata/sf0.1", rest

    from etl_end_to_end_airflow_bigquery_spark.plans import QUERIES
    from etl_end_to_end_airflow_bigquery_spark.session import get_spark
    from etl_end_to_end_airflow_bigquery_spark.tmputil import sweep_tmpdirs

    spark = get_spark("job_count")
    tracker = spark.sparkContext.statusTracker()
    # Warmup so JVM/codegen startup jobs don't land in the first query.
    QUERIES["top_orders_by_date"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    for name in names:
        before = tracker.getJobIdsForGroup(None)
        hi = max(before) if before else -1
        QUERIES[name](spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        after = tracker.getJobIdsForGroup(None)
        n = len([j for j in after if j > hi])
        sweep_tmpdirs()
        print(f"{n:5d} jobs  {name}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
