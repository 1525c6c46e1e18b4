"""PySpark-native analytics engine re-expressing the capabilities of the
reference repo ``capolaniaq95/ETL-end-to-end-Airflow-Bigquery``.

The reference is an Airflow + BigQuery FX-rate ETL (see SURVEY.md). This
package re-expresses every computation it performs — and the orchestration
semantics it delegates to Airflow/BigQuery — as idiomatic PySpark, with
Catalyst as the only engine:

- ``session``    — SparkSession factory (UTC, Arrow, AQE) for 100 TB-minded
                   defaults.
- ``schemas``    — explicit StructType schemas (reference DDL: README.md:27-40).
- ``io``         — parquet table loaders for the driver's synthetic testdata.
- ``sources``    — REST/JSON payload source (reference: fetch_fx_rate,
                   ``dags/ FXRate_Reporting_Pipeline.py:23-30``).
- ``operators``  — writers (append / merge-upsert / idempotent-append),
                   relational helpers, and the LLM-data-pipeline extension
                   pack (dedup, similarity, text analysis, multimodal).
- ``plans``      — the named query inventory wired into ``__spark_entry__``.
- ``streaming``  — Structured Streaming equivalents of the reference's
                   cron-scheduled micro-batch semantics.
- ``pipelines``  — batch ``run_ingest`` / ``run_report`` entry points that
                   replace the Airflow DAGs.
"""

__version__ = "0.1.0"
