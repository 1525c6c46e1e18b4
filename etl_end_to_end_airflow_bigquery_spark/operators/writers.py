"""Write-path semantics: append, MERGE upsert, idempotent append.

These are the reference's three pipeline variants, re-expressed as
engine-level writers (SURVEY.md §2.1, §2.3, §7 step 2):

- **append** — ``WRITE_APPEND`` load job
  (``dags/ FXRate_Reporting_Pipeline.py:75-94``).
- **merge_upsert** — BigQuery ``MERGE target USING source ON <keys>
  WHEN MATCHED THEN UPDATE … WHEN NOT MATCHED THEN INSERT``
  (``dags/fx_pipeline_with_merge.py:90-103,173-189``; README.md:50-64).
  Plain Parquet has no row-level ops, so MERGE = full-outer join with
  source-wins coalesce + atomic directory swap. At 100 TB you never
  rewrite the whole table: when ``partition_col`` is given, only the
  partitions present in the source batch are read, merged, and swapped
  (partition-scoped rewrite); untouched partitions are never opened.
- **idempotent_append** — the check-then-insert guard
  (``dags/idempotent_fx_pipeline.py:73-87``), strengthened from the
  reference's all-or-nothing COUNT check to a per-row left-anti join
  (only genuinely-new keys are appended).

The pure DataFrame forms (``*_df``) are the algebra; the path forms add
storage atomicity via a **versioned-commit layout** (VERDICT r02 item 4
— reader-safe, unlike a rename swap which has a window where the table
directory doesn't exist):

    table/
      _CURRENT              ← text pointer, atomically replaced
      v_000001_<uuid>/…parquet
      v_000002_<uuid>/…parquet

A commit writes a fresh ``v_*`` directory, then flips ``_CURRENT`` with
``os.replace`` (atomic on POSIX; on an object store the pointer PUT is
the commit). Readers resolve the pointer via :func:`read_table`; a
reader that resolved the previous pointer keeps a fully-intact directory
— the last ``keep_versions`` versions are retained (the Delta/Iceberg
snapshot-retention trade: shrink it and a very slow reader can lose its
snapshot to cleanup, exactly like VACUUM).

The partition-scoped merge path still uses per-leaf directory swaps —
its contract is single-writer with no concurrent readers of the touched
partitions (documented below); the versioned layout per leaf is the
production upgrade when that contract is too weak.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_CURRENT_PTR = "_CURRENT"


def _resolve_data_dir(path: str) -> str:
    """Data directory a reader should scan: the ``_CURRENT``-pointed
    version for versioned tables, the path itself for plain directories
    (append tables, driver testdata, partition-scoped merge targets)."""
    ptr = os.path.join(path, _CURRENT_PTR)
    if os.path.isfile(ptr):
        with open(ptr, encoding="utf-8") as f:
            return os.path.join(path, f.read().strip())
    return path


def read_table(
    spark: SparkSession, path: str, version: int | None = None
) -> DataFrame:
    """Read a table written by these writers, resolving the versioned
    ``_CURRENT`` pointer when present (plain directories pass through).

    ``version`` time-travels to a specific retained snapshot sequence
    (the integer in the ``v_<seq>_<uuid>`` name) — the audit/debug read
    every snapshotting table format offers. Only snapshots inside the
    retention window exist; asking for a swept one raises with the
    available sequence numbers.
    """
    if version is None:
        return spark.read.parquet(_resolve_data_dir(path))
    avail: dict[int, str] = {}
    if os.path.isdir(path):
        for d in os.listdir(path):
            seq = d.split("_")[1] if d.startswith("v_") and d.count("_") >= 2 else ""
            if seq.isdigit() and os.path.isdir(os.path.join(path, d)):
                avail[int(seq)] = d
    if version not in avail:
        raise ValueError(
            f"snapshot v_{version:06d} not present under {path!r}; retained "
            f"sequences: {sorted(avail) or 'none'} (older snapshots are "
            "swept by keep_versions retention)"
        )
    return spark.read.parquet(os.path.join(path, avail[version]))


def _commit_version(path: str, vdir: str, keep_versions: int) -> None:
    """Flip ``_CURRENT`` to ``vdir`` atomically, then drop versions older
    than the newest ``keep_versions`` (never the one just committed or
    its predecessor when keep_versions ≥ 2, so in-flight readers keep an
    intact snapshot)."""
    vname = os.path.basename(vdir)
    tmp_ptr = os.path.join(path, f".{_CURRENT_PTR}.{uuid.uuid4().hex[:8]}.tmp")
    with open(tmp_ptr, "w", encoding="utf-8") as f:
        f.write(vname)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp_ptr, os.path.join(path, _CURRENT_PTR))
    # numeric sort on the sequence — lexicographic breaks once sequence
    # digits differ (v_1000000 < v_999999 lexically), which would let a
    # crash-orphaned high-seq dir outlive retention forever
    versions = sorted(
        (
            d
            for d in os.listdir(path)
            if d.startswith("v_") and os.path.isdir(os.path.join(path, d))
        ),
        key=lambda d: int(d.split("_")[1]) if d.split("_")[1].isdigit() else -1,
    )
    for stale in versions[: max(0, len(versions) - max(1, keep_versions))]:
        if stale == vname:
            continue
        shutil.rmtree(os.path.join(path, stale), ignore_errors=True)


def _next_version_dir(path: str) -> str:
    os.makedirs(path, exist_ok=True)
    seqs = [
        int(d.split("_")[1])
        for d in os.listdir(path)
        if d.startswith("v_") and d.split("_")[1].isdigit()
    ]
    seq = (max(seqs) + 1) if seqs else 1
    return os.path.join(path, f"v_{seq:06d}_{uuid.uuid4().hex[:8]}")


def _validate_keys(df: DataFrame, keys: list[str]) -> None:
    missing = [k for k in keys if k not in df.columns]
    if missing:
        raise ValueError(f"key columns missing from frame: {missing}")


def merge_upsert_df(target: DataFrame, source: DataFrame, keys: list[str]) -> DataFrame:
    """MERGE semantics as a pure transform: source wins on key match.

    Equi-join on the composite key (J1); matched rows take every source
    column (the reference's MERGE updates all non-key columns,
    ``dags/fx_pipeline_with_merge.py:96-101``), unmatched target rows pass
    through, unmatched source rows are inserted. Column order follows the
    target schema. The join is a plain full-outer equi-join — Catalyst
    broadcasts the source side when it is small (the reference's batches
    are 1 row/currency), and AQE handles skew at scale.
    """
    _validate_keys(target, keys)
    _validate_keys(source, keys)
    t = target.alias("t")
    s = source.alias("s")
    cond = None
    for k in keys:
        c = F.col(f"t.{k}").eqNullSafe(F.col(f"s.{k}"))
        cond = c if cond is None else (cond & c)
    matched = F.col(f"s.{keys[0]}").isNotNull()
    cols = []
    for name in target.columns:
        if name in keys:
            cols.append(F.coalesce(F.col(f"s.{name}"), F.col(f"t.{name}")).alias(name))
        elif name in source.columns:
            # source wins when the key matched, even if the new value is null
            cols.append(
                F.when(matched, F.col(f"s.{name}")).otherwise(F.col(f"t.{name}")).alias(name)
            )
        else:
            cols.append(F.col(f"t.{name}").alias(name))
    return t.join(s, cond, "full_outer").select(*cols)


def idempotent_append_df(target: DataFrame, batch: DataFrame, keys: list[str]) -> DataFrame:
    """Append only rows whose key is absent from the target (J2).

    Left-anti join — strictly better than the reference's COUNT(*)>0
    skip-everything guard (``dags/idempotent_fx_pipeline.py:73-87``): a
    partially-loaded batch completes instead of being dropped.
    """
    _validate_keys(target, keys)
    _validate_keys(batch, keys)
    fresh = batch.dropDuplicates(keys).join(target, on=keys, how="left_anti")
    return target.unionByName(fresh.select(*target.columns))


def scd2_apply(
    target: DataFrame,
    batch: DataFrame,
    keys: list[str],
    effective_ts: str,
    ts_col: str = "valid_from",
    end_col: str = "valid_to",
    flag_col: str = "is_current",
) -> DataFrame:
    """Type-2 slowly-changing-dimension merge: history-keeping MERGE
    (the read-side dual of the reference's latest-wins overwrite,
    ``dags/fx_pipeline_with_merge.py:90-103`` — instead of losing the
    previous analysis, close it out and version the new one).

    ``target`` carries (keys…, attrs…, valid_from, valid_to, is_current);
    ``batch`` carries (keys…, attrs…). For each batch key whose attrs
    differ from the current version (or that is new), the current row is
    closed (``valid_to = effective_ts``, ``is_current = false``) and a
    new current version opens at ``effective_ts``. Unchanged keys and
    history rows pass through untouched — re-applying the same batch is
    a no-op (idempotent).

    Shape: one equi-join of batch against the *current* slice plus one
    union — never touches closed history (at scale: partition the table
    on ``is_current`` or cluster by it so the current slice is a pruned
    scan).
    """
    _validate_keys(target, keys)
    _validate_keys(batch, keys)
    attrs = [
        c for c in batch.columns if c not in keys and c not in (ts_col, end_col, flag_col)
    ]
    eff = F.lit(effective_ts).cast(target.schema[ts_col].dataType)

    cur = target.filter(F.col(flag_col))
    b = batch.dropDuplicates(keys).alias("b")
    c = cur.alias("c")
    on = [F.col(f"b.{k}").eqNullSafe(F.col(f"c.{k}")) for k in keys]
    cond = on[0]
    for x in on[1:]:
        cond = cond & x
    diff = None
    for a in attrs:
        d = ~F.col(f"b.{a}").eqNullSafe(F.col(f"c.{a}"))
        diff = d if diff is None else (diff | d)
    joined = b.join(c, cond, "left")
    is_new = F.col(f"c.{keys[0]}").isNull()
    changed = joined.filter(is_new | diff).select(
        *[F.col(f"b.{k}").alias(k) for k in keys],
        *[F.col(f"b.{a}").alias(a) for a in attrs],
    )
    # rows to open: one new current version per changed/new key
    opened = changed.select(
        *keys,
        *attrs,
        eff.alias(ts_col),
        F.lit(None).cast(target.schema[end_col].dataType).alias(end_col),
        F.lit(True).alias(flag_col),
    )
    # target splits in one pass: superseded current rows get closed,
    # everything else (history + unchanged current) passes through
    closing_keys = changed.select(*keys).withColumn("__close", F.lit(1))
    marked = target.join(F.broadcast(closing_keys), keys, "left")
    superseded = F.col(flag_col) & F.col("__close").isNotNull()
    kept = marked.filter(~superseded).drop("__close")
    closed = (
        marked.filter(superseded)
        .drop("__close")
        .withColumn(end_col, eff)
        .withColumn(flag_col, F.lit(False))
    )
    return kept.unionByName(closed).unionByName(opened.select(*target.columns))


def _reject_versioned(path: str, op: str) -> None:
    """Append-style writers mutate a directory in place — incompatible
    with the versioned-commit layout (they would write outside the
    ``_CURRENT`` snapshot and silently vanish from readers). Fail loudly
    instead of losing data."""
    if os.path.isfile(os.path.join(path, _CURRENT_PTR)):
        raise ValueError(
            f"{op}: {path!r} is a versioned table (has {_CURRENT_PTR}); "
            "use merge_upsert on it, or a different path for append-mode "
            "writes"
        )


def append(df: DataFrame, path: str, partition_by: list[str] | None = None) -> None:
    """WRITE_APPEND load job (S3). Schema is whatever ``df`` declares."""
    _reject_versioned(path, "append")
    writer = df.write.mode("append")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def _atomic_swap(tmp: str, dst: str) -> None:
    """Replace ``dst`` with ``tmp`` via two renames. NOT reader-safe:
    there is a window where ``dst`` does not exist, and a crash between
    the renames strands the ``.__old__`` dir — callers own a
    single-writer/no-concurrent-reader contract (used for partition-leaf
    swaps and plain-directory compaction; the versioned-commit layout is
    the reader-safe path)."""
    old = dst + f".__old__{uuid.uuid4().hex[:8]}"
    if os.path.exists(dst):
        os.rename(dst, old)
    os.rename(tmp, dst)
    if os.path.exists(old):
        shutil.rmtree(old, ignore_errors=True)


def merge_upsert(
    spark: SparkSession,
    target_path: str,
    source: DataFrame,
    keys: list[str],
    partition_col: str | None = None,
    keep_versions: int = 2,
) -> None:
    """MERGE a source batch into a Parquet directory table.

    First write creates the table. Without ``partition_col`` the table
    uses the versioned-commit layout (module docstring): each merge
    writes a new ``v_*`` snapshot and atomically flips ``_CURRENT`` —
    readers using :func:`read_table` always see a complete snapshot,
    concurrent with any merge, and a crash mid-merge leaves the previous
    snapshot current (orphaned ``v_*`` dirs are swept by later commits'
    retention pass).

    With ``partition_col`` (must be a key and the table's physical
    partition column), only source-touched partitions are rewritten —
    the 100 TB-safe path: read scope and write scope are both bounded by
    the batch's partition footprint, not the table size. Contract:
    **single writer, no concurrent readers of the touched partitions**
    (each leaf directory is rename-swapped; untouched partitions are
    always safe to read).
    """
    source = source.dropDuplicates(keys)
    if partition_col is None:
        vdir = _next_version_dir(target_path)
        ptr_exists = os.path.isfile(os.path.join(target_path, _CURRENT_PTR))
        # One-time migration of a pre-versioning plain directory: its
        # loose top-level files are the current table. Read them by
        # explicit file list (immune to the new v_* subdir appearing in
        # a directory listing), then retire them after the commit.
        legacy_files = (
            []
            if ptr_exists
            else [
                os.path.join(target_path, f)
                for f in (
                    os.listdir(target_path)
                    if os.path.isdir(target_path)
                    else []
                )
                if f.endswith(".parquet")
            ]
        )
        if ptr_exists:
            merged = merge_upsert_df(read_table(spark, target_path), source, keys)
        elif legacy_files:
            merged = merge_upsert_df(spark.read.parquet(*legacy_files), source, keys)
        else:
            merged = source
        merged.write.mode("overwrite").parquet(vdir)
        _commit_version(target_path, vdir, keep_versions)
        for f in legacy_files:
            try:
                os.remove(f)
            except OSError:
                pass
        return

    if not os.path.exists(target_path):
        source.write.mode("overwrite").partitionBy(partition_col).parquet(
            target_path
        )
        return

    target = spark.read.parquet(target_path)

    # Partition-scoped rewrite: enumerate the batch's partitions (a small
    # driver-side list — one entry per touched day/key, not per row),
    # merge only those partitions, then swap each directory.
    parts = [r[0] for r in source.select(partition_col).distinct().collect()]
    scoped_target = target.filter(F.col(partition_col).isin(parts))
    merged = merge_upsert_df(scoped_target, source, keys)
    tmp = target_path + f".__tmp__{uuid.uuid4().hex[:8]}"
    merged.write.mode("overwrite").partitionBy(partition_col).parquet(tmp)
    # Swap the leaf dirs Spark actually wrote rather than reconstructing
    # their names from the collected values — Spark URL-escapes partition
    # values (':' → '%3A') and renders timestamps with its own formatting,
    # so a reconstructed name can miss the dir and silently drop the batch.
    prefix = f"{partition_col}="
    for leaf in os.listdir(tmp):
        src_dir = os.path.join(tmp, leaf)
        if not leaf.startswith(prefix) or not os.path.isdir(src_dir):
            continue
        _atomic_swap(src_dir, os.path.join(target_path, leaf))
    shutil.rmtree(tmp, ignore_errors=True)


def idempotent_append(
    spark: SparkSession,
    target_path: str,
    batch: DataFrame,
    keys: list[str],
) -> None:
    """Cross-batch idempotent append to a Parquet directory table (T4/J2)."""
    _reject_versioned(target_path, "idempotent_append")
    if not os.path.exists(target_path):
        batch.dropDuplicates(keys).write.mode("overwrite").parquet(target_path)
        return
    target = spark.read.parquet(target_path)
    fresh = batch.dropDuplicates(keys).join(target, on=keys, how="left_anti")
    fresh.select(*target.columns).write.mode("append").parquet(target_path)


def compact_parquet(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    shuffle: bool = False,
) -> int:
    """Small-file compaction: rewrite a Parquet directory into
    ceil(total_bytes / target) files and atomically swap it in. Returns
    the output file count.

    The small-files problem is THE silent scale killer for append-heavy
    tables (a streaming sink or per-batch ``merge_upsert`` emitting
    thousands of KB-sized files turns every downstream scan into
    task-scheduling overhead). Default is ``coalesce`` — no shuffle,
    each output task concatenates whole input files; pass
    ``shuffle=True`` for an even-size rebalance when input files are
    badly skewed. Partitioned tables: compact each partition directory
    independently (this keeps the rewrite scoped exactly like
    ``merge_upsert``'s partition path).

    Versioned tables (``_CURRENT`` pointer present) compact into a new
    ``v_*`` snapshot + pointer flip — fully reader-safe; plain
    directories fall back to the rename swap (single-writer contract).

    File sizing uses ``os.path.getsize`` on ``file:`` URIs — correct for
    local/NFS storage. On an object store, swap in the Hadoop
    ``FileSystem.getContentSummary`` listing (or the store's inventory
    API); ``inputFiles()`` still enumerates the right paths.
    """
    data_dir = _resolve_data_dir(path)
    df = spark.read.parquet(data_dir)
    total = 0
    for f in df.inputFiles():
        local = f.removeprefix("file:")
        if os.path.exists(local):
            total += os.path.getsize(local)
    n = max(1, -(-total // target_file_bytes))
    shaped = df.repartition(n) if shuffle else df.coalesce(n)
    if data_dir != path:
        vdir = _next_version_dir(path)
        shaped.write.mode("overwrite").parquet(vdir)
        _commit_version(path, vdir, keep_versions=2)
        return n
    tmp = path + f".__compact__{uuid.uuid4().hex[:8]}"
    shaped.write.mode("overwrite").parquet(tmp)
    _atomic_swap(tmp, path)
    return n


def cluster_write(
    df: DataFrame,
    path: str,
    cluster_by: list[str],
    n_files: int | None = None,
    partition_by: list[str] | None = None,
) -> None:
    """Write with range-clustered layout: rows range-partition on
    ``cluster_by`` and sort within each file, so every parquet row-group
    carries tight min/max bounds on those columns — the data-skipping
    (zone-map) layout. A later scan with a ``cluster_by`` predicate
    prunes whole files/row-groups at planning time instead of reading
    them; at 100 TB this is the difference between touching one file and
    touching all of them for a point/range query.

    One range exchange (with a driver-side sample to pick bounds) + a
    local sort — the standard cost of producing clustered output.
    """
    cols = [F.col(c) for c in cluster_by]
    shaped = (
        df.repartitionByRange(n_files, *cols)
        if n_files
        else df.repartitionByRange(*cols)
    )
    shaped = shaped.sortWithinPartitions(*cols)
    writer = shaped.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)
