"""Spark 4 Python DataSource WRITER: a manifest-committed JSONL sink.

Completes the custom-connector surface started by ``rest_datasource``
(S1 reader + simpleStreamReader): users write
``df.write.format("jsonl_commit")`` / ``writeStream.format(
"jsonl_commit")`` like any built-in sink. The reference's closest
analog is the BigQuery load job — a destination that either fully
commits a batch or leaves nothing visible; this sink reproduces that
contract on plain files with the classic two-phase manifest commit:

- ``write`` (executors): each task streams its rows to a uniquely
  named shard under ``<path>/_staging/`` and returns the file name +
  row count as its commit message. A failed/retried task leaves only
  unreferenced staging garbage.
- ``commit`` (driver): move the acked shards into ``<path>`` and write
  a manifest (``_manifest/committed-batch-<id>.json``; streaming uses
  the engine batch id, batch append a unique ``w<uuid>`` id, batch
  overwrite publishes its manifest atomically FIRST and only then
  removes superseded manifests + files, so a crash mid-commit always
  leaves a committed, readable view) listing exactly the committed
  files. foreachBatch-style re-delivery of a streaming batch OVERWRITES
  that batch's manifest — the re-run's files replace the old list, so
  readers never see a batch twice (exactly-once READ view over an
  at-least-once writer; orphaned files from the superseded attempt are
  swept by the next commit).
- ``abort``: drop this attempt's staged files.

:func:`read_jsonl_commit` is the read side: it lists the manifests and
reads ONLY manifest-listed files — uncommitted/orphaned shards are
invisible. At 100 TB the per-batch manifest is a few KB on the driver;
shards stream executor-side and never transit the driver.
"""

from __future__ import annotations

import json
import os
import uuid
from collections.abc import Iterator
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamWriter,
    DataSourceWriter,
    WriterCommitMessage,
)
from pyspark.sql.types import Row, StructType


@dataclass
class ShardCommitMessage(WriterCommitMessage):
    file: str
    rows: int


def _write_shard(path: str, iterator: Iterator[Row]) -> ShardCommitMessage:
    staging = os.path.join(path, "_staging")
    os.makedirs(staging, exist_ok=True)
    name = f"shard-{uuid.uuid4().hex}.jsonl"
    n = 0
    tmp = os.path.join(staging, name)
    with open(tmp, "w", encoding="utf-8") as f:
        for row in iterator:
            f.write(json.dumps(row.asDict(), default=str, sort_keys=True))
            f.write("\n")
            n += 1
    return ShardCommitMessage(file=name, rows=n)


def _finish_pending_sweeps(path: str) -> None:
    """Complete any overwrite sweep a crash left half-done (ADVICE r8):
    an overwrite records its intent (the manifests/files it supersedes)
    BEFORE the publish point. If the new manifest is visible, ANY
    subsequent commit — append or overwrite — finishes the removals
    here, so the transient old+new duplicated view cannot outlive the
    next commit of any kind. If the intent's manifest is absent the
    overwrite crashed pre-publish and never became visible; its promoted
    shards are manifest-less orphans readers already ignore — either
    way the intent is spent and dropped."""
    mdir = os.path.join(path, "_manifest")
    if not os.path.isdir(mdir):
        return
    for itf in os.listdir(mdir):
        if not (itf.startswith("overwrite-intent-") and itf.endswith(".json")):
            continue
        ipath = os.path.join(mdir, itf)
        try:
            intent = json.load(open(ipath))
        except (json.JSONDecodeError, FileNotFoundError):
            continue  # torn intent write: its .tmp never replaced; skip
        if os.path.exists(os.path.join(mdir, intent["manifest"])):
            for mf in intent["stale_manifests"]:
                try:
                    os.remove(os.path.join(mdir, mf))
                except FileNotFoundError:
                    pass
            for f in intent["stale_files"]:
                try:
                    os.remove(os.path.join(path, f))
                except FileNotFoundError:
                    pass
        try:
            os.remove(ipath)
        except FileNotFoundError:
            pass


def _pending_stale_manifests(mdir: str) -> set[str]:
    """Manifest basenames a PUBLISHED overwrite intent marks superseded
    — the read side skips them so even the crash window between publish
    and sweep never serves old rows next to the overwrite."""
    skip: set[str] = set()
    if not os.path.isdir(mdir):
        return skip
    for itf in os.listdir(mdir):
        if not (itf.startswith("overwrite-intent-") and itf.endswith(".json")):
            continue
        try:
            intent = json.load(open(os.path.join(mdir, itf)))
        except (json.JSONDecodeError, FileNotFoundError):
            continue
        if os.path.exists(os.path.join(mdir, intent["manifest"])):
            skip |= set(intent["stale_manifests"])
    return skip


def _commit_batch(
    path: str, messages, batch_id: int | str, *, clear_existing: bool = False
) -> None:
    """Driver-side: promote acked shards, then (over)write the batch
    manifest. Replays of the same batch id replace that manifest, so the
    manifest set — the read surface — records each batch exactly once;
    files orphaned by a superseded attempt are removed here too.

    ``clear_existing`` implements batch ``mode("overwrite")``: every
    previously committed manifest (any id) and its files are removed
    before the new manifest lands, leaving exactly this write visible.
    """
    mdir = os.path.join(path, "_manifest")
    os.makedirs(mdir, exist_ok=True)
    _finish_pending_sweeps(path)
    staging = os.path.join(path, "_staging")
    files, rows = [], 0
    for m in messages:
        if m is None:
            continue
        os.replace(
            os.path.join(staging, m.file), os.path.join(path, m.file)
        )
        files.append(m.file)
        rows += m.rows
    manifest = os.path.join(mdir, f"committed-batch-{batch_id}.json")
    # Collect what this commit supersedes BEFORE publishing, but delete
    # only AFTER the atomic os.replace (ADVICE r7): a crash anywhere in
    # this function leaves at least one committed manifest readable —
    # either the old view (pre-replace) or the new one (post-replace).
    # Overwrite additionally persists its sweep as an intent file
    # BEFORE the publish point (ADVICE r8): a crash between the replace
    # and the removals no longer depends on a future overwrite — any
    # subsequent commit finishes the sweep via _finish_pending_sweeps,
    # and read_jsonl_commit skips intent-superseded manifests meanwhile.
    stale_manifests: list[str] = []
    stale: set[str] = set()
    if clear_existing:
        for mf in os.listdir(mdir):
            if (
                mf.startswith("committed-batch-")
                and mf.endswith(".json")
                and mf != os.path.basename(manifest)
            ):
                stale |= set(json.load(open(os.path.join(mdir, mf)))["files"])
                stale_manifests.append(os.path.join(mdir, mf))
    if os.path.exists(manifest):
        stale |= set(json.load(open(manifest))["files"])
    intent_path = None
    if clear_existing and (stale_manifests or stale):
        intent_path = os.path.join(mdir, f"overwrite-intent-{batch_id}.json")
        with open(intent_path + ".tmp", "w") as f:
            json.dump(
                {
                    "manifest": os.path.basename(manifest),
                    "stale_manifests": [
                        os.path.basename(m) for m in stale_manifests
                    ],
                    "stale_files": sorted(stale - set(files)),
                },
                f,
            )
        os.replace(intent_path + ".tmp", intent_path)
    with open(manifest + ".tmp", "w") as f:
        json.dump({"batch_id": batch_id, "files": files, "rows": rows}, f)
    os.replace(manifest + ".tmp", manifest)  # publish point
    for mf in stale_manifests:
        try:
            os.remove(mf)
        except FileNotFoundError:
            pass
    for f in stale - set(files):
        try:
            os.remove(os.path.join(path, f))
        except FileNotFoundError:
            pass
    if intent_path is not None:
        try:
            os.remove(intent_path)
        except FileNotFoundError:
            pass


def _abort_batch(path: str, messages) -> None:
    staging = os.path.join(path, "_staging")
    for m in messages:
        if m is None:
            continue
        try:
            os.remove(os.path.join(staging, m.file))
        except FileNotFoundError:
            pass


class JsonlBatchWriter(DataSourceWriter):
    """Batch writer honoring the save mode (ADVICE r6, medium): append
    commits under a UNIQUE manifest id so successive appends accumulate
    — the earlier fixed ``batch_id=-1`` made the second append replace
    the first one's manifest and sweep its files, silently truncating.
    Overwrite clears every prior manifest + file, then commits."""

    def __init__(self, options: dict, overwrite: bool) -> None:
        self._path = options["path"]
        self._overwrite = overwrite

    def write(self, iterator: Iterator[Row]) -> ShardCommitMessage:
        return _write_shard(self._path, iterator)

    def commit(self, messages) -> None:
        _commit_batch(
            self._path,
            messages,
            batch_id=f"w{uuid.uuid4().hex}",
            clear_existing=self._overwrite,
        )

    def abort(self, messages) -> None:
        _abort_batch(self._path, messages)


class JsonlStreamWriter(DataSourceStreamWriter):
    def __init__(self, options: dict) -> None:
        self._path = options["path"]

    def write(self, iterator: Iterator[Row]) -> ShardCommitMessage:
        return _write_shard(self._path, iterator)

    def commit(self, messages, batchId: int) -> None:
        _commit_batch(self._path, messages, batchId)

    def abort(self, messages, batchId: int) -> None:
        _abort_batch(self._path, messages)


class JsonlCommitDataSource(DataSource):
    """Registerable manifest-committed JSONL sink (batch + streaming)."""

    @classmethod
    def name(cls) -> str:
        return "jsonl_commit"

    def schema(self) -> str:  # writer-only source; schema is the frame's
        return "value string"

    def writer(self, schema: StructType, overwrite: bool) -> JsonlBatchWriter:
        return JsonlBatchWriter(self.options, overwrite)

    def streamWriter(
        self, schema: StructType, overwrite: bool
    ) -> JsonlStreamWriter:
        return JsonlStreamWriter(self.options)


def read_jsonl_commit(
    spark: SparkSession, path: str, schema: str | StructType | None = None
) -> DataFrame:
    """Read ONLY the manifest-committed shards (uncommitted staging
    files and superseded-attempt orphans are invisible). The manifest
    listing is bounded driver work (one small JSON per batch)."""
    mdir = os.path.join(path, "_manifest")
    files: list[str] = []
    superseded = _pending_stale_manifests(mdir)
    if os.path.isdir(mdir):
        for mf in sorted(os.listdir(mdir)):
            if mf in superseded:
                continue  # published overwrite's sweep interrupted
            if mf.startswith("committed-batch-") and mf.endswith(".json"):
                files.extend(
                    os.path.join(path, f)
                    for f in json.load(open(os.path.join(mdir, mf)))["files"]
                )
    if not files:
        raise ValueError(f"no committed manifests under {path!r}")
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(files)
