"""Spark 4 Python DataSource for Frankfurter-style FX payloads (S1).

SURVEY.md §2.1 S1 names this the idiomatic re-expression of the
reference's driver-side ``requests.get`` fetch: a registerable source so
users write ``spark.read.format("fx_rest")`` like any other connector.

    from etl_end_to_end_airflow_bigquery_spark.sources.rest_datasource import (
        FxRestDataSource,
    )
    spark.dataSource.register(FxRestDataSource)
    df = (spark.read.format("fx_rest")
          .option("fixture_dir", "/path/with/payload/json")  # offline
          # .option("url", "https://api.frankfurter.dev/v1/latest")
          # .option("symbols", "USD,GBP")                    # live
          .load())

Yields one row per (payload, currency): the flattened tick shape
(quote_date string, from_cur, to_cur, rate) — downstream code applies
``F.to_timestamp`` and the writers exactly as with the batch source.
Offline-first: with ``fixture_dir`` no network is touched (this
container has no egress; the live path is the production mode).
"""

from __future__ import annotations

import json
import os
from collections.abc import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)
from pyspark.sql.types import StructType

PAYLOAD_ROW_SCHEMA = (
    "quote_date string, from_cur string, to_cur string, rate double"
)


class FxRestDataSource(DataSource):
    """Registerable REST/fixture source for FX payload documents."""

    @classmethod
    def name(cls) -> str:
        return "fx_rest"

    def schema(self) -> str:
        return PAYLOAD_ROW_SCHEMA

    def reader(self, schema: StructType) -> "FxRestReader":
        return FxRestReader(self.options)

    def simpleStreamReader(self, schema: StructType) -> "FxRestStreamReader":
        return FxRestStreamReader(self.options)


class FxRestReader(DataSourceReader):
    def __init__(self, options: dict) -> None:
        self.fixture_dir = options.get("fixture_dir")
        self.url = options.get("url")
        self.symbols = options.get("symbols", "USD")
        if not self.fixture_dir and not self.url:
            raise ValueError("fx_rest requires option 'fixture_dir' or 'url'")

    def partitions(self) -> list[InputPartition]:
        """One partition per fixture file (parallel read); the live API
        is a single tiny document → one partition."""
        if self.fixture_dir:
            files = sorted(
                os.path.join(self.fixture_dir, f)
                for f in os.listdir(self.fixture_dir)
                if f.endswith(".json")
            )
            return [InputPartition(f) for f in files] or [InputPartition(None)]
        return [InputPartition(None)]

    def read(self, partition: InputPartition) -> Iterator[tuple]:
        if self.fixture_dir:
            if partition.value is None:
                return
            with open(partition.value, encoding="utf-8") as fh:
                payload = json.load(fh)
        else:
            import urllib.request

            with urllib.request.urlopen(
                f"{self.url}?symbols={self.symbols}", timeout=10
            ) as resp:
                payload = json.loads(resp.read().decode("utf-8"))
        base = payload.get("base")
        date = payload.get("date")
        for cur, rate in (payload.get("rates") or {}).items():
            yield (date, base, str(cur), float(rate))


class FxRestStreamReader(SimpleDataSourceStreamReader):
    """Streaming face of the same source — T1's periodic ingest tick as a
    first-class ``readStream.format("fx_rest")`` stream.

    Offsets are a plain tick counter, so replay is exact:
    ``readBetweenOffsets`` re-derives the identical rows for a recovered
    micro-batch (the Python-source analog of a replayable log — this is
    what makes checkpoint recovery exactly-once here). Offline mode
    synthesizes deterministic rate ticks from the offset (no wall clock,
    no RNG — a re-run of the same offset range is byte-identical); the
    live mode polls the API once per micro-batch.
    """

    def __init__(self, options: dict) -> None:
        self.url = options.get("url")
        self.symbols = options.get("symbols", "USD").split(",")
        self.base = options.get("base", "EUR")
        self.batch_ticks = int(options.get("batch_ticks", "1"))

    def initialOffset(self) -> dict:
        return {"tick": 0}

    def _rows_for(self, lo: int, hi: int) -> list[tuple]:
        rows = []
        for t in range(lo, hi):
            quote_date = f"2026-01-{(t % 28) + 1:02d}"
            for i, cur in enumerate(self.symbols):
                rate = round(1.0 + ((t * 7 + i * 13) % 1000) / 1000.0, 6)
                rows.append((quote_date, self.base, cur, rate))
        return rows

    def read(self, start: dict) -> tuple:
        lo = start["tick"]
        hi = lo + self.batch_ticks
        if self.url:
            import json as _json
            import urllib.request

            with urllib.request.urlopen(
                f"{self.url}?symbols={','.join(self.symbols)}", timeout=10
            ) as resp:
                payload = _json.loads(resp.read().decode("utf-8"))
            rows = [
                (payload.get("date"), payload.get("base"), str(c), float(r))
                for c, r in (payload.get("rates") or {}).items()
            ]
            return iter(rows), {"tick": hi}
        return iter(self._rows_for(lo, hi)), {"tick": hi}

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[tuple]:
        # exact replay for recovery; live mode cannot re-poll the past, so
        # replay uses the deterministic synthesis (documented trade).
        return iter(self._rows_for(start["tick"], end["tick"]))
