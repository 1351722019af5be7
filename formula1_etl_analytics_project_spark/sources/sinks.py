"""Sinks: batch parquet writes and the merge-on-key upsert.

Reference behavior being replaced (SURVEY.md section 2.1/2.4):
  * S4/S5 - one string-built ``INSERT`` per row executed through a
    fresh ``MsSqlOperator`` (``driver_etl.py:87-96``) - the reference's
    dominant perf bug. Here: a single distributed columnar write.
  * S6 - idempotent reset via ``DELETE FROM`` x14 (``DDL
    Final.sql:338-352``) -> ``mode='overwrite'``.
  * J3 - the orphaned ``MERGE INTO`` upsert experiment
    (``__pycache__/resultssss.cpython-38.pyc``) -> left-anti join of
    existing rows against incoming keys, then union-append. With plain
    parquet (no Delta in this image) the merge materializes a new
    snapshot; on Delta/Iceberg the same logical plan becomes MERGE.

Scale notes: ``partition_by`` should be a low-cardinality natural key
(e.g. year) so 100 TB writes produce prunable directories; the upsert
shuffles both sides by the key - at scale, bucketing the base table on
the merge key turns that into a shuffle-free join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def write_parquet(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
) -> None:
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_orc(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
) -> None:
    """ORC twin of ``write_parquet`` - same columnar/pushdown properties
    through Spark's native ORC source, for sinks that feed Hive/Trino
    estates standardized on ORC."""
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.orc(path)


def write_sharded(
    df: DataFrame,
    path: str,
    order_col: str | list[str],
    rows_per_file: int = 100_000,
    num_shards: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Training-shard writer: globally ORDERED, size-BOUNDED output
    files - the layout a data loader streams sequentially (e.g. the
    epoch-shuffle key from `epoch_shuffle_docs` as ``order_col`` gives
    resumable pseudorandom shards).

    Mechanics: ``repartitionByRange(order_col)`` gives disjoint,
    ordered key ranges per partition (sampled range bounds - one extra
    sampling pass, no global sort); ``sortWithinPartitions`` orders
    rows inside each; ``maxRecordsPerFile`` splits any oversized
    partition into sequential files, so EVERY output file holds a
    contiguous key range of at most ``rows_per_file`` rows. Verified
    by tests/test_sharded_write.py (per-file caps + non-overlapping
    per-file key ranges).

    At 100 TB this is the answer to both small-files and
    giant-file problems at once: AQE/range sampling sizes the
    partitions, the record cap bounds the worst case, and no stage
    ever funnels through a single task (contrast ``coalesce(1)`` or a
    global ``orderBy`` + single writer).
    """
    if rows_per_file < 1:
        raise ValueError(f"rows_per_file must be >= 1, got {rows_per_file}")
    cols = [order_col] if isinstance(order_col, str) else list(order_col)
    out = (
        df.repartitionByRange(num_shards, *cols)
        if num_shards
        else df.repartitionByRange(*cols)
    )
    (
        out.sortWithinPartitions(*cols)
        .write.mode(mode)
        .option("maxRecordsPerFile", rows_per_file)
        .parquet(path)
    )


def upsert(
    existing: DataFrame,
    incoming: DataFrame,
    keys: list[str],
    order_col: str | None = None,
    evolve_schema: bool = False,
) -> DataFrame:
    """Merge-on-key: incoming rows win; existing rows survive only when
    their key is absent from incoming. Logical twin of SQL MERGE
    (WHEN MATCHED UPDATE / WHEN NOT MATCHED INSERT) for full-row
    updates.

    SQL MERGE errors when the source matches a target row twice; this
    twin resolves it instead: pass ``order_col`` to keep the LAST
    incoming row per key deterministically (highest ``order_col``,
    ANSI "latest version wins"). Without ``order_col`` the caller must
    provide key-unique batches - duplicate incoming keys would
    otherwise all survive the union and corrupt the snapshot's key
    invariant.

    ``evolve_schema`` (Delta ``mergeSchema`` twin): columns that exist
    on only one side surface on the merged output with NULLs for the
    other side's rows - the append-only corpus-growth pattern where
    new metadata columns appear mid-stream and rewriting history is
    not an option. Off by default: silent schema drift in a strict
    pipeline should fail loudly, not widen the table.
    """
    if evolve_schema:
        for c in incoming.columns:
            if c not in existing.columns:
                existing = existing.withColumn(
                    c, F.lit(None).cast(incoming.schema[c].dataType)
                )
        for c in existing.columns:
            if c not in incoming.columns:
                incoming = incoming.withColumn(
                    c, F.lit(None).cast(existing.schema[c].dataType)
                )
    if order_col is not None:
        from pyspark.sql import Window

        w = Window.partitionBy(*keys).orderBy(F.col(order_col).desc())
        incoming = (
            incoming.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )
    survivors = existing.join(
        incoming.select(*keys).distinct(), on=keys, how="left_anti"
    )
    return survivors.unionByName(incoming)


def apply_changes(
    snapshot: DataFrame,
    changes: DataFrame,
    keys: list[str],
    seq_col: str,
    op_col: str = "op",
) -> DataFrame:
    """Apply a CDC change feed (insert/update/delete) to a snapshot.

    ``changes`` carries the snapshot's columns plus ``op_col`` in
    {'I','U','D'} and a monotonically increasing ``seq_col`` (commit
    LSN / binlog position). Per key, only the HIGHEST-``seq_col``
    change matters for a snapshot rebuild - intermediate versions are
    skipped entirely (no row-at-a-time replay):

      1. window row_number per key over ``seq_col`` desc -> latest
         change per key (ties broken by ``op_col`` for determinism;
         a well-formed feed never ties).
      2. snapshot rows whose key appears in the feed are dropped
         (one left-anti join).
      3. latest changes with op != 'D' are unioned in - an 'I'/'U'
         whose key was absent from the snapshot simply inserts, and a
         'D'-then-'I' key at higher seq correctly survives (the
         reducer sees only the final 'I').

    Both steps shuffle on ``keys`` only; at scale the snapshot side
    prunes to touched partitions first (compose with
    ``upsert_parquet_partitioned``). This is the generalization of
    ``upsert`` (which cannot express deletes) and the logical twin of
    ``MERGE ... WHEN MATCHED AND op='D' THEN DELETE`` on Delta/Iceberg
    (unavailable in this image).

    Reference scope note: the reference's loads are truncate-and-
    reload (``DDL Final.sql:338-352``); a daily-batch CDC apply is
    what that pattern becomes when the table no longer fits a full
    daily rewrite.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(*keys).orderBy(
        F.col(seq_col).desc(), F.col(op_col).desc()
    )
    latest = (
        changes.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    survivors = snapshot.join(
        latest.select(*keys).distinct(), on=keys, how="left_anti"
    )
    upserts = latest.filter(F.col(op_col) != "D").drop(op_col, seq_col)
    return survivors.unionByName(upserts)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_by: str | list[str],
    buckets: int = 8,
    sort_by: str | list[str] | None = None,
    mode: str = "overwrite",
    path: str | None = None,
) -> None:
    """Bucketed managed-table write (``bucketBy`` + ``saveAsTable``).

    Two tables co-bucketed on their join key with the same bucket count
    join WITHOUT a shuffle - each bucket pair joins locally (the plan
    shows SortMergeJoin with no Exchange). This is the 100 TB answer to
    repeated fact-fact joins: pay the partitioning once at write time,
    never again per query. Spark bucketing requires a managed table
    (plain ``.parquet(path)`` cannot record bucket metadata).
    """
    cols = [bucket_by] if isinstance(bucket_by, str) else list(bucket_by)
    writer = df.write.mode(mode).bucketBy(buckets, *cols)
    if sort_by:
        scols = [sort_by] if isinstance(sort_by, str) else list(sort_by)
        writer = writer.sortBy(*scols)
    if path is not None:
        # external table: bucket METADATA lives in the catalog, data
        # files under the caller's path - keeps the warehouse dir (and
        # therefore the CWD) untouched
        writer = writer.option("path", path)
    writer.format("parquet").saveAsTable(table)


def write_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    mode: str = "append",
    batch_size: int = 10_000,
    num_partitions: int | None = None,
    properties: dict[str, str] | None = None,
    create_table_column_types: str | None = None,
) -> None:
    """JDBC sink - the batch replacement for the reference's
    one-INSERT-per-row ``MsSqlOperator`` loop (driver_etl.py:87-96).

    Executors write concurrently with ``batchsize``-row prepared-
    statement batches; ``num_partitions`` caps the number of concurrent
    connections. ``create_table_column_types`` overrides the default
    SQL types on CREATE (e.g. ``"tag VARCHAR(64)"`` - Spark's default
    StringType mapping is CLOB/TEXT on several dialects, which some
    engines cannot compare or index).

    Executed end-to-end in tests/test_jdbc_derby.py against embedded
    Derby (the in-JVM database Spark ships) - batch write, commit,
    read-back; no external DB needed.
    """
    writer_df, props = prepare_jdbc_write(df, batch_size, num_partitions, properties)
    writer = writer_df.write
    if create_table_column_types:
        writer = writer.option(
            "createTableColumnTypes", create_table_column_types
        )
    writer.jdbc(url=url, table=table, mode=mode, properties=props)


def prepare_jdbc_write(
    df: DataFrame,
    batch_size: int = 10_000,
    num_partitions: int | None = None,
    properties: dict[str, str] | None = None,
) -> tuple[DataFrame, dict[str, str]]:
    """Construction step of the JDBC sink, split out so the
    batching/concurrency config is testable without a database.

    Returns the (possibly repartitioned) DataFrame and the final JDBC
    properties. One partition = one connection = one stream of
    ``batch_size``-row executeBatch calls - the distributed replacement
    for the reference's one-INSERT-per-row loop.
    """
    if batch_size < 1:
        raise ValueError(f"batch_size must be >= 1, got {batch_size}")
    writer_df = df.repartition(num_partitions) if num_partitions else df
    props = {"batchsize": str(batch_size), **(properties or {})}
    return writer_df, props


def upsert_parquet(
    spark,
    incoming: DataFrame,
    path: str,
    keys: list[str],
    order_col: str | None = None,
) -> DataFrame:
    """foreachBatch-compatible incremental load onto a parquet snapshot.

    Durability: the merged snapshot is written to a STAGING directory
    first, then swapped into place (delete old + rename staging) - a
    crash mid-write leaves the previous snapshot intact; only the
    narrow delete/rename window is exposed. Plain parquet has no
    atomic commit, so this is at-least-once, not exactly-once; a table
    format with a transactional MERGE (Delta/Iceberg) is the scale
    answer, and this function is its drop-in logical twin.
    """
    import uuid as _uuid

    try:
        existing = spark.read.parquet(path)
    except Exception:
        existing = None
    merged = (
        incoming
        if existing is None
        else upsert(existing, incoming, keys, order_col=order_col)
    )
    staging = f"{path}__staging_{_uuid.uuid4().hex[:12]}"
    write_parquet(merged, staging, mode="overwrite")
    jvm = spark._jvm
    hconf = spark._jsc.hadoopConfiguration()
    Path = jvm.org.apache.hadoop.fs.Path
    fs = Path(path).getFileSystem(hconf)
    fs.delete(Path(path), True)
    fs.rename(Path(staging), Path(path))
    return spark.read.parquet(path)


# ---------------------------------------------------------------------------
# Versioned snapshot store: write-new-then-repoint, never delete-before-write
# ---------------------------------------------------------------------------

_CURRENT = "_current"
_VERSION_PREFIX = "_v"


def _pointer_path(path: str) -> str:
    import posixpath as _pp

    return _pp.join(path, _CURRENT)


def read_current_version(path: str) -> str | None:
    """Name of the live snapshot version (e.g. ``_v00000003``), or None
    for an empty store. The pointer line may carry an ``epoch=N``
    suffix (see :func:`read_current_epoch`); only the first token is
    the version."""
    try:
        with open(_pointer_path(path)) as f:
            line = f.read().strip()
            return line.split()[0] if line else None
    except (FileNotFoundError, NotADirectoryError):
        return None


def read_current_epoch(path: str) -> int | None:
    """Streaming epoch committed WITH the live snapshot (the
    ``epoch=N`` token of the pointer line), or None if the store is
    empty / was never written by an epoch-tagged merge. Because the
    pointer is replaced atomically, the epoch and the snapshot it
    describes can never be observed out of sync - this is what makes
    foreachBatch replay EXACTLY-once (see incremental_upsert_stream).
    """
    try:
        with open(_pointer_path(path)) as f:
            for tok in f.read().strip().split():
                if tok.startswith("epoch="):
                    return int(tok[len("epoch="):])
    except (FileNotFoundError, NotADirectoryError, ValueError):
        return None
    return None


def read_snapshot(spark, path: str) -> DataFrame:
    """Read the live snapshot of a versioned store (see
    :func:`upsert_parquet_versioned`). Raises ``FileNotFoundError`` on
    an empty store."""
    import posixpath as _pp

    version = read_current_version(path)
    if version is None:
        raise FileNotFoundError(f"no current snapshot under {path}")
    return spark.read.parquet(_pp.join(path, version))


def _write_new_version(
    spark, merged: DataFrame, path: str, current: str | None
) -> str:
    """Step 1 of the swap: materialize the merged snapshot under the
    NEXT version directory. Crash-safe by construction - nothing
    existing is touched; a crash here strands an underscore-prefixed
    orphan dir that readers skip and the next upsert prunes."""
    import posixpath as _pp

    n = int(current[len(_VERSION_PREFIX):]) if current else 0
    version = f"{_VERSION_PREFIX}{n + 1:08d}"
    write_parquet(merged, _pp.join(path, version), mode="overwrite")
    return version


def _repoint(path: str, version: str, epoch_id: int | None = None) -> None:
    """Step 2 of the swap: atomically flip the ``_current`` pointer.

    Local/POSIX ``os.replace`` is an atomic overwrite, so a reader sees
    either the old pointer or the new one, never a missing/partial
    file. (HDFS equivalent: FileContext.rename(..., Options.Rename.
    OVERWRITE); S3 has no atomic rename - there a table format's commit
    log (Delta/Iceberg) is the real answer, and this store is its
    plain-parquet logical twin.)"""
    import os as _os
    import uuid as _uuid

    tmp = _pp_join_safe(path, f"._current_tmp_{_uuid.uuid4().hex[:12]}")
    with open(tmp, "w") as f:
        f.write(version + (f" epoch={epoch_id}" if epoch_id is not None else "") + "\n")
        f.flush()
        _os.fsync(f.fileno())
    _os.replace(tmp, _pointer_path(path))


def _pp_join_safe(*parts: str) -> str:
    import posixpath as _pp

    return _pp.join(*parts)


def _prune_versions(path: str, keep: tuple[str, ...]) -> None:
    """Drop version dirs other than ``keep`` (current + previous stay
    so in-flight readers holding the old pointer can finish their
    scan). Also removes orphans from crashed step-1 writes."""
    import os as _os
    import shutil as _shutil

    try:
        names = _os.listdir(path)
    except FileNotFoundError:
        return
    for name in names:
        if name.startswith(_VERSION_PREFIX) and name not in keep:
            _shutil.rmtree(_pp_join_safe(path, name), ignore_errors=True)


def upsert_parquet_versioned(
    spark,
    incoming: DataFrame,
    path: str,
    keys: list[str],
    order_col: str | None = None,
    epoch_id: int | None = None,
) -> DataFrame:
    """Crash-safe merge-on-key onto a versioned parquet snapshot store.

    Layout::

        path/_current        <- tiny pointer file, atomically replaced
        path/_v00000001/     <- immutable plain-parquet snapshots
        path/_v00000002/

    The swap is write-new-then-repoint: the merged snapshot is fully
    written under the next ``_v...`` dir (step 1), THEN the pointer is
    atomically flipped (step 2). There is no delete-before-write
    anywhere, so a reader through :func:`read_snapshot` observes either
    the previous complete snapshot or the new complete snapshot at
    every instant - the delete/rename data-loss window of the in-place
    :func:`upsert_parquet` does not exist. A crash in step 1 strands an
    orphan version dir (underscore-prefixed - invisible to readers,
    pruned by the next successful upsert); a crash before step 2 leaves
    the old pointer live. The previous version is retained after the
    flip so in-flight readers finish; older versions are pruned.

    Each snapshot stays plain parquet - any engine can read
    ``path/<version>`` directly after resolving the one-line pointer.

    ``epoch_id`` (streaming callers) rides in the pointer line and
    commits atomically with the flip; replayed micro-batches are then
    detectable via :func:`read_current_epoch` BEFORE re-merging -
    exactly-once for the single-writer streaming upsert even when the
    merge itself is not idempotent.
    """
    current = read_current_version(path)
    if current is None:
        import os as _os

        _os.makedirs(path, exist_ok=True)
        merged = incoming
    else:
        existing = read_snapshot(spark, path)
        merged = upsert(existing, incoming, keys, order_col=order_col)
    version = _write_new_version(spark, merged, path, current)
    _repoint(path, version, epoch_id)
    keep = (version, current) if current else (version,)
    _prune_versions(path, keep)
    return read_snapshot(spark, path)


def upsert_parquet_partitioned(
    spark,
    incoming: DataFrame,
    path: str,
    keys: list[str],
    partition_col: str,
    order_col: str | None = None,
    check_moved_keys: bool | str = True,
    evolve_schema: bool = False,
) -> None:
    """Fact-scale MERGE on partitioned parquet: only the partitions
    that contain incoming keys are read, merged, and rewritten -
    untouched partitions are never scanned and never written. This is
    the plain-parquet form of Delta/Iceberg's row-level MERGE
    (reference's orphaned MERGE INTO experiment, SURVEY J3) at the
    grain that matters at 100 TB: a day's late data rewrites that
    day's partition, not the table.

    PARTITION-STABILITY INVARIANT: a key's partition value must never
    change between batches. Dynamic overwrite only rewrites partitions
    present in the incoming batch, so an incoming row whose key already
    exists under a DIFFERENT partition value would leave the old row in
    place - the key silently duplicated across partitions. With
    ``check_moved_keys=True`` (default) violations are detected before
    any write and raise ``ValueError``: the snapshot is scanned as a
    (keys, partition_col) projection - column-pruned, no data columns -
    and inner-joined against the incoming keys on key-equal AND
    partition-different. The check is skipped automatically when
    ``partition_col`` is itself part of ``keys`` (a moved "key" is then
    a different key by definition). Callers that guarantee stability
    upstream can pass ``check_moved_keys=False`` to skip the
    key-column scan.

    SCALE: the exact check's key-projection scan is O(table) per merge
    - measured in SCALING.md ("Moved-key check at scale": +0.37 s at
    sf0.1 where job latency dominates; the scan term crosses the Bloom
    path's ~3 s fixed overhead around O(10^8) rows on this container,
    far below the 100 TB design point where it becomes a multi-TB
    key-column scan per merge. Decision recorded there. Pass
    ``check_moved_keys="bloom"`` to check against the per-partition
    Bloom index sidecar instead (operators/bloom_index.py): the merge
    then (1) checks exactly inside the partitions it already reads,
    (2) probes incoming keys against the OR of every OTHER partition's
    filter - no table IO - and (3) verifies the FPP-bounded positives
    with a partition-PRUNED exact scan of just the suspect partitions.
    The index must exist (build_key_bloom_index, a one-time full-key
    scan); this function keeps it fresh by rebuilding the touched
    partitions' filters from the merge result after the data write.

    Mechanics: the affected-partition list comes from the incoming
    batch (one tiny distinct - cardinality = touched partitions, e.g.
    days, NOT rows); the existing side is read WITH that partition
    filter (partition pruning - the scan never touches other
    directories); the merge result is localCheckpoint-materialized,
    then written with dynamic partition overwrite, which replaces
    exactly the partitions present in the result. Commit is per
    partition directory, so the non-atomicity window of
    ``upsert_parquet`` shrinks to the touched partitions.

    ``evolve_schema`` (Delta ``mergeSchema``-on-MERGE twin): the
    incoming batch may carry columns the snapshot lacks (and vice
    versa); :func:`upsert` widens both sides with NULLs. Only the
    TOUCHED partitions are rewritten with the widened schema -
    untouched partition directories keep their old files, so the lake
    is mixed-schema afterwards and readers must scan with
    ``.option("mergeSchema", True)`` (the ``schema_evolution_scan``
    pattern). Off by default: schema drift in a strict pipeline
    should fail loudly.
    """
    if check_moved_keys == "bloom" and partition_col not in keys:
        from formula1_etl_analytics_project_spark.operators import (
            bloom_index as _bi,
        )

        if _bi.read_meta(spark, path) is None:
            raise FileNotFoundError(
                f"check_moved_keys='bloom' but no Bloom index under "
                f"{path}; run build_key_bloom_index(spark, path, keys, "
                f"partition_col, expected_keys_per_partition) once "
                f"(for a brand-new table, after the first upsert)"
            )
    parts = [
        r[0] for r in incoming.select(partition_col).distinct().collect()
    ]
    try:
        # Under evolve_schema the lake may already be mixed-schema
        # from a PRIOR evolving merge (only touched partitions carry
        # new columns). A plain read picks its schema from an
        # arbitrary file footer; if an old-schema file wins, the
        # evolved column vanishes from `existing` and this merge
        # would rewrite its partitions with the stored values
        # NULLed out - silent data loss. mergeSchema unifies the
        # footers so previously-evolved columns always survive.
        existing = (
            spark.read.option("mergeSchema", evolve_schema)
            .parquet(path)
            .filter(F.col(partition_col).isin(parts))
        )
        existing.head(1)
    except Exception:
        existing = None
    if (
        check_moved_keys
        and existing is not None
        and partition_col not in keys
    ):
        incoming_keys = incoming.select(*keys, partition_col).distinct()
        if check_moved_keys == "bloom":
            from formula1_etl_analytics_project_spark.operators import (
                bloom_index as _bi,
            )

            # within the partitions this merge already scans, check
            # exactly (no extra IO); everywhere else, via the index
            snapshot_keys = existing.select(*keys, partition_col)
            moved_outside = _bi.probe_moved_keys(
                spark, path, incoming, keys, partition_col
            ).withColumnRenamed("suspect_partition", "__old_part")
        else:
            snapshot_keys = spark.read.parquet(path).select(
                *keys, partition_col
            )
            moved_outside = None
        moved = (
            snapshot_keys.withColumnRenamed(partition_col, "__old_part")
            .join(incoming_keys, on=keys, how="inner")
            .filter(F.col("__old_part") != F.col(partition_col))
            .select(*keys, "__old_part", partition_col)
        )
        if moved_outside is not None:
            moved = moved.unionByName(
                moved_outside.select(*keys, "__old_part", partition_col)
            )
        n_moved = moved.limit(1).count()
        if n_moved:
            sample = moved.head(5)
            raise ValueError(
                "upsert_parquet_partitioned: incoming batch moves key(s) "
                f"across partitions (e.g. {sample}); dynamic overwrite "
                "would duplicate them. Delete/migrate the old rows first "
                "or include the partition column in the merge keys."
            )
    merged = (
        incoming
        if existing is None
        else upsert(
            existing,
            incoming,
            keys,
            order_col=order_col,
            evolve_schema=evolve_schema,
        )
    )
    # materialize before overwriting the files the plan reads
    merged = merged.localCheckpoint()
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        merged.write.mode("overwrite").partitionBy(partition_col).parquet(path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    if check_moved_keys == "bloom" and partition_col not in keys:
        from formula1_etl_analytics_project_spark.operators import (
            bloom_index as _bi,
        )

        _bi.update_key_bloom_index(spark, path, merged, keys, partition_col)


def compact_parquet(
    spark,
    path: str,
    target_file_bytes: int = 128 << 20,
) -> int:
    """Small-files compaction: rewrite a parquet directory into
    ceil(total_bytes / target) files. The 100 TB lake-maintenance op -
    streaming sinks and fine-grained upserts accrete kilobyte files,
    and every downstream scan then pays a task per file; periodic
    compaction restores ~``target_file_bytes`` files (128 MB default,
    the usual HDFS/S3 sweet spot).

    Uses the staging + swap pattern of :func:`upsert_parquet` so a
    crash keeps the original directory. Returns the output file count.
    ``coalesce`` (not ``repartition``) avoids a shuffle - compaction is
    pure IO. Partitioned layouts should compact per partition directory
    (call this per partition path) so untouched partitions stay put.

    Staging safety: the staging dir lives in the SAME parent (so the
    final rename is a same-filesystem metadata op) but under an
    underscore-prefixed basename - ``<parent>/_compact_tmp_<base>_<hex>``
    - which Spark/Hive/Presto readers skip by convention. A plain
    ``<path>__compact_<hex>`` sibling would parse as an extra Hive
    partition of the parent table when ``path`` is a partition
    directory like ``.../part=A``, silently duplicating rows after a
    crash or during the write window. ``<base>`` is sanitized to
    alphanumerics (an ``=`` in the staging name would itself be parsed
    as a partition column by directory discovery, underscore prefix or
    not); keeping the per-target prefix means concurrent compactions of
    SIBLING partitions never clean each other's live staging. Stale
    ``_compact_tmp_<base>_*`` dirs for the same target (from a crashed
    earlier run) are cleaned on entry.
    """
    import math as _math
    import posixpath as _pp
    import re as _re
    import uuid as _uuid

    jvm = spark._jvm
    hconf = spark._jsc.hadoopConfiguration()
    Path = jvm.org.apache.hadoop.fs.Path
    fs = Path(path).getFileSystem(hconf)
    parent, base = _pp.split(path.rstrip("/"))
    safe_base = _re.sub(r"[^A-Za-z0-9]+", "-", base)
    stale_prefix = f"_compact_tmp_{safe_base}_"
    for status in fs.listStatus(Path(parent)):
        name = status.getPath().getName()
        if name.startswith(stale_prefix):
            fs.delete(status.getPath(), True)
    summary = fs.getContentSummary(Path(path))
    n_files = max(1, _math.ceil(summary.getLength() / target_file_bytes))
    df = spark.read.parquet(path)
    staging = _pp.join(parent, f"{stale_prefix}{_uuid.uuid4().hex[:12]}")
    df.coalesce(n_files).write.mode("overwrite").parquet(staging)
    fs.delete(Path(path), True)
    fs.rename(Path(staging), Path(path))
    return n_files


# ---------------------------------------------------------------------------
# Commit-log snapshot store: optimistic concurrency on plain parquet
# ---------------------------------------------------------------------------

_LOG_DIR = "_log"


def _log_path(path: str) -> str:
    return _pp_join_safe(path, _LOG_DIR)


def read_committed(path: str) -> tuple[int, str] | None:
    """Latest committed (commit number, snapshot dir name) from the
    commit log, or None for an empty store. The log is the source of
    truth: a data dir without a commit file does not exist."""
    import os as _os

    try:
        names = _os.listdir(_log_path(path))
    except FileNotFoundError:
        return None
    commits = sorted(n for n in names if n.endswith(".commit"))
    if not commits:
        return None
    latest = commits[-1]
    with open(_pp_join_safe(_log_path(path), latest)) as f:
        return int(latest.split(".")[0]), f.read().strip()


def read_committed_snapshot(
    spark, path: str, version: int | None = None
) -> DataFrame:
    """Read the latest committed snapshot, or - time travel - the
    snapshot as of commit ``version``. Every commit file names its
    immutable snapshot dir, so any still-retained version is readable
    by number (Delta's ``VERSION AS OF`` twin; retention is bounded by
    the prune policy: current + previous are always kept, older
    versions only until the next successful commit)."""
    import os as _os

    if version is None:
        committed = read_committed(path)
        if committed is None:
            raise FileNotFoundError(f"no committed snapshot under {path}")
        return spark.read.parquet(_pp_join_safe(path, committed[1]))
    claim = _pp_join_safe(_log_path(path), f"{version:08d}.commit")
    try:
        with open(claim) as f:
            snap_dir = f.read().strip()
    except FileNotFoundError:
        raise FileNotFoundError(
            f"commit {version} does not exist under {path}"
        ) from None
    full = _pp_join_safe(path, snap_dir)
    if not _os.path.isdir(full):
        raise FileNotFoundError(
            f"commit {version} exists but its snapshot {snap_dir} was "
            f"pruned by the retention policy"
        )
    return spark.read.parquet(full)


def commit_log_upsert(
    spark,
    incoming: DataFrame,
    path: str,
    keys: list[str],
    order_col: str | None = None,
    max_retries: int = 8,
) -> int:
    """Merge-on-key with OPTIMISTIC CONCURRENCY - the multi-writer
    upsert the pointer store (:func:`upsert_parquet_versioned`,
    single-writer by contract) cannot provide, and the plain-parquet
    logical twin of a Delta/Iceberg transactional MERGE:

      1. read the latest commit N from ``path/_log/`` and merge
         against its snapshot;
      2. write the merged snapshot under a WRITER-UNIQUE dir (uuid
         suffix - two racing writers never collide on data files);
      3. try to claim commit N+1 by hard-LINKING a fully-written
         temp file to ``_log/<N+1>.commit`` - one atomic directory
         operation that publishes the claim WITH its content (no
         empty-claim window). Exactly one racer wins; the loser
         deletes its orphan snapshot, re-reads, RE-MERGES against the
         winner's result, and retries. A snapshot-write failure is
         also treated as a lost race (the winner's retention pruning
         may remove a lagging writer's base mid-scan) and retries.

    Lost updates are impossible: a commit is only ever created against
    the snapshot it merged (the exclusive create fails if anyone
    committed in between) - proven by the genuinely-concurrent
    two-writer test (tests/test_commit_log.py), which the pointer
    store fails by design. Returns the commit number claimed.

    Durability/portability: link-into-place is atomic on POSIX; the
    HDFS equivalent is rename-without-overwrite, and on S3 it maps to
    conditional PUT (If-None-Match) of the full payload - the same
    primitive Delta's commit protocol uses there. Crash windows:
    before the claim -> an orphan underscore-prefixed data dir (and
    possibly a dot-prefixed temp claim) invisible to readers, pruned
    by later winners; after the claim -> the commit is complete;
    there is no in-between because the claim publishes atomically
    with its content.
    """
    import os as _os
    import shutil as _shutil
    import uuid as _uuid

    last_err: Exception | None = None
    for _ in range(max_retries):
        committed = read_committed(path)
        if committed is None:
            _os.makedirs(_log_path(path), exist_ok=True)
            base_n, merged = 0, incoming
        else:
            base_n = committed[0]
            existing = spark.read.parquet(
                _pp_join_safe(path, committed[1])
            )
            merged = upsert(existing, incoming, keys, order_col=order_col)
        next_n = base_n + 1
        snap_dir = f"_snap_{next_n:08d}_{_uuid.uuid4().hex[:8]}"
        try:
            write_parquet(
                merged, _pp_join_safe(path, snap_dir), mode="overwrite"
            )
        except Exception as exc:
            # A lagging writer can lose its base snapshot mid-scan when
            # a faster writer commits twice and prunes (retention keeps
            # current + previous only). Treat ANY write failure as a
            # lost race: clean up and re-merge against the new head.
            last_err = exc
            _shutil.rmtree(_pp_join_safe(path, snap_dir), ignore_errors=True)
            continue
        # Claim commit next_n ATOMICALLY WITH ITS CONTENT: the payload
        # is written to a writer-private temp file first, then
        # os.link() publishes it under the claim name - link fails
        # with FileExistsError if anyone else claimed, and succeeds
        # as one atomic directory operation otherwise. There is no
        # window where the claim exists empty (an O_EXCL-create-then-
        # write sequence would expose exactly that window to readers
        # and to crashes).
        claim = _pp_join_safe(_log_path(path), f"{next_n:08d}.commit")
        tmp_claim = _pp_join_safe(
            _log_path(path), f".claim_tmp_{_uuid.uuid4().hex[:12]}"
        )
        with open(tmp_claim, "w") as f:
            f.write(snap_dir + "\n")
            f.flush()
            _os.fsync(f.fileno())
        try:
            _os.link(tmp_claim, claim)
        except FileExistsError:
            # lost the race: drop our snapshot, re-merge against winner
            _os.unlink(tmp_claim)
            _shutil.rmtree(
                _pp_join_safe(path, snap_dir), ignore_errors=True
            )
            continue
        _os.unlink(tmp_claim)
        # prune snapshots older than previous (keep winner + previous
        # for in-flight readers), plus orphans from crashed losers
        keep_dirs = {snap_dir}
        if committed is not None:
            keep_dirs.add(committed[1])
        # NB: stale ".claim_tmp_" files from crashed writers are left
        # in place deliberately - unlinking them here would race an
        # in-flight writer between its temp write and its link().
        # They are dot-prefixed (invisible to readers) and tiny.
        for name in _os.listdir(path):
            if name.startswith("_snap_") and name not in keep_dirs:
                n_part = name.split("_")[2]
                if n_part.isdigit() and int(n_part) < base_n:
                    _shutil.rmtree(
                        _pp_join_safe(path, name), ignore_errors=True
                    )
        return next_n
    raise RuntimeError(
        f"commit_log_upsert lost the commit race {max_retries} times "
        f"under {path}; raise max_retries or reduce writer contention"
    ) from last_err


def vacuum_commit_log(path: str, keep_last: int = 2) -> int:
    """Retention management for the commit-log store: keep the
    snapshots of the last ``keep_last`` commits (the current one is
    always kept), delete older snapshot dirs AND loser/crash orphans.
    Commit FILES are never deleted - the log stays a complete history
    (they are bytes-sized); time travel to a vacuumed version fails
    loudly via read_committed_snapshot's pruned-snapshot error rather
    than silently reading nothing. Returns the number of snapshot
    dirs removed.

    The Delta VACUUM analogue, minus retention-by-timestamp: callers
    decide cadence; in-flight readers of a just-vacuumed version are
    protected the same way as the upsert prune (keep_last >= 2 keeps
    current + previous).

    Safe alongside concurrent writers: a writer stages its snapshot dir
    BEFORE linking the claim that commits it, so an in-flight writer's
    just-written ``_snap_<n+1>_...`` is not referenced by any commit
    yet. Deleting it would let the writer's subsequent link succeed
    with the head commit pointing at a vacuumed dir — bricking the
    store. Like commit_log_upsert's own prune (which guards with
    ``int(n_part) < base_n``), vacuum therefore only removes snapshot
    dirs whose embedded commit number is <= the latest COMMITTED
    number; dirs numbered beyond the head are in-flight claims (or
    crash orphans that the next upsert's prune reclaims once the head
    passes them) and survive.
    """
    import os as _os
    import shutil as _shutil

    if keep_last < 1:
        raise ValueError(f"keep_last must be >= 1, got {keep_last}")
    committed = read_committed(path)
    if committed is None:
        return 0
    head_n = committed[0]
    keep_dirs = set()
    try:
        names = _os.listdir(_log_path(path))
    except FileNotFoundError:
        return 0
    commits = sorted(n for n in names if n.endswith(".commit"))
    for name in commits[-keep_last:]:
        with open(_pp_join_safe(_log_path(path), name)) as f:
            keep_dirs.add(f.read().strip())
    removed = 0
    for name in _os.listdir(path):
        if name.startswith("_snap_") and name not in keep_dirs:
            n_part = name.split("_")[2]
            if not n_part.isdigit() or int(n_part) > head_n:
                continue  # in-flight (not-yet-claimed) writer snapshot
            _shutil.rmtree(_pp_join_safe(path, name), ignore_errors=True)
            removed += 1
    return removed
