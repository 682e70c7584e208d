"""Batch IO: JSON/parquet/CSV readers and partitioned sinks.

Re-expresses the reference's storage layers natively (SURVEY.md §2.1):

- raw layer: newline-delimited, optionally gzipped JSON, Hive-partitioned
  by ``estado`` (Firehose dynamic partitioning + AppendDelimiterToRecord,
  ddk_app/custom/historical.py:216-254) -> ``spark.read.json`` with an
  explicit schema and PERMISSIVE corrupt-record capture (the Firehose
  ``error/`` prefix becomes a ``_corrupt_record`` column / bad-records path).
- stage/spec layers: snappy parquet partitioned by a column
  (glue_scripts/stage.py:51-61, glue_scripts/spec.py:67-77) ->
  ``df.write.partitionBy(col).parquet``.

Scale notes: explicit schemas avoid a full inference pass over 100 TB of
JSON; partitioned layout gives Catalyst partition pruning on the partition
column for free; writers never coalesce to 1 — output parallelism follows
the upstream plan (AQE coalesces small shuffles on its own).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StringType, StructField, StructType

CORRUPT_COL = "_corrupt_record"


def read_json(
    spark: SparkSession,
    path: str,
    schema: StructType | None = None,
    keep_corrupt: bool = False,
) -> DataFrame:
    """Read JSON-lines (plain or .gz — Spark decompresses by extension).

    With a schema, undecodable lines are captured in ``_corrupt_record``
    (reference parity: Firehose routes failed records to an ``error/``
    prefix, historical.py:227). ``keep_corrupt=True`` runs PERMISSIVE and
    returns the corrupt column; the default drops bad lines via
    DROPMALFORMED (scan-side, no post-filter — also sidesteps Spark's
    restriction on plans that reference only the corrupt column).

    NOTE for ``keep_corrupt=True`` callers: Spark disallows queries that
    reference *only* ``_corrupt_record``; ``.cache()`` the returned frame
    before counting/filtering corrupt rows in isolation.
    """
    reader = spark.read
    if schema is not None:
        if keep_corrupt:
            schema_with_corrupt = StructType(
                list(schema.fields) + [StructField(CORRUPT_COL, StringType())]
            )
            return (
                reader.schema(schema_with_corrupt)
                .option("mode", "PERMISSIVE")
                .option("columnNameOfCorruptRecord", CORRUPT_COL)
                .json(path)
            )
        return reader.schema(schema).option("mode", "DROPMALFORMED").json(path)
    return reader.json(path)


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC scan — same columnar pruning/pushdown properties as parquet
    (vectorized reader, predicate pushdown, partition discovery); offered
    for lake interop where upstream systems write ORC."""
    return spark.read.orc(path)


def write_orc_partitioned(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """ORC sink with snappy + Hive partitioning (parquet sink twin)."""
    writer = df.write.mode(mode).option("compression", "snappy")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.orc(path)


def read_csv(
    spark: SparkSession, path: str, schema: StructType | None = None, header: bool = True
) -> DataFrame:
    reader = spark.read.option("header", str(header).lower())
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", "true")
    return reader.csv(path)


def write_csv_partitioned(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
    header: bool = True,
    compression: str = "gzip",
) -> None:
    """CSV sink with gzip + Hive partitioning (the interchange-format twin
    of the parquet/ORC sinks — for handoff to systems that ingest flat
    files; lake-internal storage stays columnar)."""
    writer = (
        df.write.mode(mode)
        .option("header", str(header).lower())
        .option("compression", compression)
    )
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.csv(path)


def write_parquet_partitioned(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Snappy parquet, Hive-partitioned (stage/spec sink parity: S8/S9)."""
    writer = df.write.mode(mode).option("compression", "snappy")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_json_partitioned(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
    compression: str = "gzip",
) -> None:
    """JSON-lines sink, gzip by default (raw-layer parity: S2/S4/S5)."""
    writer = df.write.mode(mode).option("compression", compression)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.json(path)


def read_json_with_errors(
    spark: SparkSession,
    path: str,
    schema: StructType,
    error_path: str,
) -> DataFrame:
    """S5 full parity: good rows returned, undecodable lines WRITTEN to an
    ``error/`` location as raw text — the Firehose failed-record prefix
    (ddk_app/custom/historical.py:227).

    The corrupt capture requires materializing before splitting (Spark
    disallows plans over only the corrupt column), hence the cache; the
    error payload is the original line, so it can be replayed after a
    schema fix.
    """
    from pyspark.sql import functions as F

    df = read_json(spark, path, schema=schema, keep_corrupt=True).cache()
    bad = df.filter(F.col(CORRUPT_COL).isNotNull()).select(
        F.col(CORRUPT_COL).alias("value")
    )
    if not bad.isEmpty():
        bad.write.mode("append").text(error_path)
    return df.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)


def _bucket_parallelism_warning(
    cores: int, n_buckets: int, name: str
) -> str | None:
    """Warning text when an aligned bucketed write would serialize on a
    bucket count far below the cluster's task slots (>8x) — None when
    the configuration is healthy. Pure so the policy is unit-testable at
    any simulated cluster width."""
    if cores > 8 * n_buckets:
        return (
            f"write_bucketed_table({name!r}): align_partitions collapses "
            f"the write to {n_buckets} tasks (one per bucket) but the "
            f"cluster offers {cores} slots — if this write is "
            "parallelism-bound, raise n_buckets (it sizes both file "
            "count and write parallelism)"
        )
    return None


def write_bucketed_table(
    spark: SparkSession,
    df: DataFrame,
    name: str,
    bucket_cols: list[str],
    n_buckets: int,
    path: str,
    sort_cols: list[str] | None = None,
    align_partitions: bool = True,
) -> None:
    """Bucketed table for co-located joins: both sides bucketed by the join
    key join with ZERO shuffle (asserted in tests/test_bucketing.py) — the
    storage-layout lever for repeated 100 TB fact-fact joins where even one
    shuffle dominates the job.

    ``align_partitions`` hash-repartitions the input on the bucket columns
    into ``n_buckets`` partitions before the write. Spark's bucket id is
    ``pmod(murmur3(bucket_cols), n_buckets)`` — the SAME mapping a
    ``repartition(n_buckets, cols)`` shuffle uses — so each write task then
    holds exactly one bucket and the table lands as one file per bucket.
    Without it a bucketed write fans out to (input tasks x buckets
    present) files: measured on the sf0.1 near-dup shingle table, 1,019
    files of ~9 KB for 9 MB of data, and every standing-index probe,
    fold and reload re-paid the per-file open/commit constant (guide §6
    small-files: this is the Iceberg hash distribution-mode trade — one
    bounded shuffle of the index rows at write time buys a file count
    that equals the bucket count). ``n_buckets`` stays the caller's
    scaling knob: a production deployment sizes it to data volume, which
    sizes both files and write parallelism with it."""
    spark.sql(f"DROP TABLE IF EXISTS `{name}`")
    if align_partitions:
        # align_partitions caps write parallelism at n_buckets tasks. At
        # real scale a small bucket count would silently serialize the
        # whole write even when the cluster has far more cores — warn so
        # a misconfigured production write surfaces (the fix is a bigger
        # n_buckets, which sizes files AND parallelism together; the
        # round-14 advisor finding). defaultParallelism is the free
        # proxy for cluster width — df.rdd.getNumPartitions() would pay
        # a plan->RDD conversion per write, the very planning constant
        # the save paths just shed.
        msg = _bucket_parallelism_warning(
            spark.sparkContext.defaultParallelism, n_buckets, name
        )
        if msg:
            import warnings

            warnings.warn(msg, stacklevel=2)
    out = df.repartition(n_buckets, *bucket_cols) if align_partitions else df
    writer = (
        out.write.mode("overwrite")
        .format("parquet")
        .option("path", path)
        .bucketBy(n_buckets, *bucket_cols)
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(name)


def register_table(spark: SparkSession, df: DataFrame, name: str) -> None:
    """Catalog registration (crawler parity, S10): expose a DataFrame as a
    SQL-addressable table in the session catalog."""
    df.createOrReplaceTempView(name)


def hadoop_fs(spark: SparkSession, path: str):
    """(FileSystem, Path) for ``path`` resolved through the JVM Hadoop
    filesystem API — the scheme-aware way to touch storage from the
    driver. ``os.path`` only understands the driver's local disk, so any
    feature gated on it silently disables itself when the same code runs
    against ``hdfs://`` / ``s3a://`` roots (the production posture)."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    return hpath.getFileSystem(spark._jsc.hadoopConfiguration()), hpath


def fs_exists(spark: SparkSession, path: str) -> bool:
    """Scheme-aware existence check (see ``hadoop_fs``): stream ledgers
    and delta-pair sinks gate behavior on directory presence, and that
    gate must hold on any supported filesystem, not just ``file://``."""
    fs, hpath = hadoop_fs(spark, path)
    return bool(fs.exists(hpath))


def pid_alive(pid: int) -> bool:
    """HOST-LOCAL process liveness (os.kill(pid, 0)) — the shared gate
    for reclaiming another run's leaked artifacts (leaked index tables,
    dead fold leftovers). Only meaningful for pids on THIS host; callers
    sweeping a storage system shared across driver hosts must scope the
    sweep to a single maintenance host (see index_manifest)."""
    import os

    try:
        os.kill(pid, 0)
    except ProcessLookupError:
        return False
    except PermissionError:
        return True  # exists, owned by someone else
    return True


def host_tag() -> str:
    """Six-hex-char tag of THIS host's identity, embedded next to
    creator pids in generation/artifact names: ``pid_alive`` is
    host-local, so a sweep must be able to tell "a pid from my host
    that died" (safe to reclaim) from "a pid from ANOTHER driver host"
    (unknowable here — treat as alive). The tag hashes the MACHINE ID
    (``/etc/machine-id`` — unique per installed OS instance) TOGETHER
    with the hostname: hostname alone collides across hosts cloned
    from one image or containers reporting a default name, and a tag
    collision silently re-enables the cross-host sweep hazard the tag
    exists to prevent (round-14 review finding). Hosts without a
    readable machine-id fall back to hostname-only — same risk class
    as before, no worse. A hash keeps the tag a fixed-width,
    charset-safe token for catalog table names; changing the identity
    source only makes PRE-UPGRADE local leftovers read as foreign
    (never swept automatically — reclaimed by ``gc_foreign_leftovers``'
    age path), the conservative direction."""
    import hashlib
    import socket

    ident = socket.gethostname()
    for p in ("/etc/machine-id", "/var/lib/dbus/machine-id"):
        try:
            with open(p) as fh:
                ident += "|" + fh.read().strip()
            break
        except OSError:
            continue
    return hashlib.md5(ident.encode()).hexdigest()[:6]


def fs_rmtree(spark: SparkSession, path: str) -> None:
    """Scheme-aware recursive delete (no-op when absent) — the
    ``shutil.rmtree`` twin for arbitrary Hadoop filesystems."""
    fs, hpath = hadoop_fs(spark, path)
    fs.delete(hpath, True)


def read_small_json(spark: SparkSession, path: str) -> dict | None:
    """Read a small driver-side JSON control file through the Hadoop FS
    API (manifest entries, index maintenance meta); ``None`` when
    absent. One audited implementation for every control-file reader —
    the scheme-aware twin of ``json.load(open(...))``."""
    import json

    fs, hpath = hadoop_fs(spark, path)
    if not fs.exists(hpath):
        return None
    stream = fs.open(hpath)
    try:
        txt = spark._jvm.org.apache.commons.io.IOUtils.toString(
            stream, "UTF-8"
        )
    finally:
        stream.close()
    return json.loads(txt)


def write_small_json(
    spark: SparkSession, path: str, obj: dict, tmp_name: str
) -> bool:
    """Write a small JSON control file as temp-then-rename: the full
    content lands in ``tmp_name`` (a hidden sibling) first, then ONE
    rename publishes it — on HDFS and the local scheme a rename onto an
    existing destination returns False instead of overwriting, which
    makes the rename a CAS claim. Returns the rename's outcome with the
    temp deleted on failure; the caller owns failure policy (raise a
    conflict, or pre-delete the destination for overwrite semantics).
    Content is never observable half-written."""
    import json
    import os

    fs, hpath = hadoop_fs(spark, path)
    fs.mkdirs(hpath.getParent())
    tmp = os.path.join(os.path.dirname(path) or ".", tmp_name)
    _, htmp = hadoop_fs(spark, tmp)
    out = fs.create(htmp, True)
    try:
        out.write(bytearray(json.dumps(obj, sort_keys=True).encode()))
    finally:
        out.close()
    if not fs.rename(htmp, hpath):
        fs.delete(htmp, False)
        return False
    return True


def compact_parquet(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> int:
    """Small-file compaction: rewrite a parquet directory into
    ``ceil(total_bytes / target_file_bytes)`` files and return that count.

    Streaming sinks and incremental jobs accrete micro-batch-sized files;
    at 100 TB the resulting per-file open/footer overhead dominates scan
    time and floods the driver's file index. Compaction trades one rewrite
    for permanently right-sized scans (HDFS/S3 sweet spot ~128 MB —
    aligned with ``spark.sql.files.maxPartitionBytes``).

    The rewrite goes through a staging directory, so a crash never leaves
    a half-written directory; the rmtree+rename swap is NOT atomic for
    concurrent readers (a read between the two calls sees a missing
    path) — compact in a maintenance window, or use Delta/Iceberg
    (OPTIMIZE) for snapshot-isolated compaction under live readers.
    """
    import math
    import os
    import shutil

    total = sum(
        os.path.getsize(os.path.join(root, f))
        for root, _, files in os.walk(path)
        for f in files
        if f.endswith(".parquet")
    )
    n_files = max(1, math.ceil(total / target_file_bytes))
    df = spark.read.parquet(path)
    staging = path.rstrip("/") + "__compact"
    df.repartition(n_files).write.mode("overwrite").parquet(staging)
    shutil.rmtree(path)
    os.rename(staging, path)
    return n_files


def zorder_value(df: DataFrame, cols: list[str], bits: int = 8):
    """Z-order (Morton) key over ``cols`` as a Column: each column is
    quantile-bucketed into 2^bits cells (boundaries from a driver-side
    ``approxQuantile`` — KBs, never data), and the cell indices'

    bits are interleaved. Rows close in z-value are close in EVERY
    dimension, so range-partitioning + sorting by it gives parquet files
    whose min/max stats are narrow on all ``cols`` at once — multi-column
    row-group skipping where a single-key sort only serves one column.
    The whole expression is plain arithmetic/bitwise ops (codegen)."""
    from pyspark.sql import functions as F

    cells = 1 << bits
    cell_cols = []
    for c in cols:
        # interior boundaries; approximate is fine — layout quality, not
        # correctness, depends on them.
        qs = df.stat.approxQuantile(c, [i / cells for i in range(1, cells)], 0.01)
        cell = F.lit(0)
        prev = None
        for b in qs:
            if prev is None or b != prev:  # collapse duplicate boundaries
                cell = cell + F.when(F.col(c) >= F.lit(b), 1).otherwise(0)
            prev = b
        cell_cols.append(cell.cast("long"))
    z = F.lit(0).cast("long")
    for bit in range(bits):
        for ci, cell in enumerate(cell_cols):
            z = z + F.shiftleft(
                F.shiftright(cell, bit).bitwiseAND(F.lit(1)),
                bit * len(cols) + ci,
            )
    return z


def write_parquet_zorder(
    df: DataFrame,
    path: str,
    cols: list[str],
    bits: int = 8,
    mode: str = "overwrite",
    n_files: int | None = None,
) -> None:
    """Parquet laid out in z-order over ``cols``: range-partition + sort by
    the interleaved-bits key, so point/range predicates on ANY of the
    z-ordered columns skip most files/row-groups via min/max statistics —
    the multi-column generalization of ``write_parquet_sorted`` (which is
    the better choice when only one access path matters). One shuffle
    (range partitioning on the z key), local sort, no second shuffle."""
    from pyspark.sql import functions as F

    zed = df.withColumn("_z", zorder_value(df, cols, bits))
    out = (
        zed.repartitionByRange(n_files, F.col("_z"))
        if n_files
        else zed.repartitionByRange(F.col("_z"))
    ).sortWithinPartitions("_z").drop("_z")
    out.write.mode(mode).option("compression", "snappy").parquet(path)


def write_parquet_sorted(
    df: DataFrame,
    path: str,
    sort_cols: list[str],
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
    n_files: int | None = None,
) -> None:
    """Parquet with a sorted physical layout: rows are range-partitioned
    then sorted WITHIN each output file on ``sort_cols``, so every file
    (and every row group inside it) covers a narrow, non-overlapping value
    range. Point/range predicates on the sort key then skip whole row
    groups via parquet min/max statistics — at 100 TB this is the
    difference between scanning a few files and scanning the table, and it
    is the poor-man's Z-order for single-key access paths.

    ``repartitionByRange`` does one shuffle (sampling the key distribution
    for balanced files); ``sortWithinPartitions`` is a local sort, no
    second shuffle.
    """
    from pyspark.sql import functions as F

    cols = [F.col(c) for c in sort_cols]
    # n_files pins the range-partition count (size to ~128 MB/file); the
    # default lets AQE pick from the key-sample + shuffle-size estimate.
    out = (
        df.repartitionByRange(n_files, *cols)
        if n_files
        else df.repartitionByRange(*cols)
    ).sortWithinPartitions(*cols)
    writer = out.write.mode(mode).option("compression", "snappy")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def swap_parquet(df: DataFrame, path: str) -> None:
    """Rewrite ``path`` with ``df`` when ``df`` reads from ``path``:
    materialize to a staging dir first, then swap directories. Crash-safe
    (never a half-written ``path``) but not reader-atomic — between rmtree
    and rename the path is briefly absent; a concurrently-served store
    needs the versioned store (sources/store.py) or a table format.

    Appropriate ONLY for stores whose size tracks the OUTPUT of each
    refresh (an aggregate mart, an SCD2 dimension snapshot, a sketch
    table): the whole-directory rewrite is then O(result), the natural
    cost. Keyed row stores that grow with history must use the
    bucket-partitioned ``operators/serving.merge_into_store`` instead —
    rewriting those whole-table per batch is the O(table) anti-pattern
    this module's round-6 change removed from the streaming serving sink.

    The swap runs through the Hadoop FS API (any scheme, consistent with
    ``fs_exists`` gates upstream), parks the previous contents at
    ``<path>__old`` until the new directory is in place (so a crash
    mid-swap always leaves a complete copy on disk — at ``__old`` and/or
    ``__staging``, never only half a store), and checks every rename's
    boolean return (object stores can refuse a rename without raising).
    A pre-existing ``__old`` makes the swap REFUSE to run (see
    ``swap_staging_into_dir``) — it may be the only complete copy from a
    crashed swap, and deleting it to proceed would make the crash-safety
    guarantee exactly one invocation deep.
    """
    spark = df.sparkSession
    staging = path.rstrip("/") + "__staging"
    _assert_no_parked_swap(spark, path)  # fail BEFORE the staging write
    df.write.mode("overwrite").parquet(staging)
    swap_staging_into_dir(spark, staging, path)


def _assert_no_parked_swap(spark: SparkSession, path: str) -> None:
    old = path.rstrip("/") + "__old"
    if fs_exists(spark, old):
        raise IOError(
            f"refusing to swap {path}: {old} exists — a previous swap "
            "crashed mid-sequence and the parked copy may be the ONLY "
            "complete one (the target may since have been recreated "
            "partially). Inspect: if the current directory is complete, "
            f"delete {old}; if the previous swap crashed between its "
            f"renames, restore by renaming {old} back. Never auto-deleted."
        )


def swap_staging_into_dir(spark: SparkSession, staging: str, path: str) -> None:
    """The shared directory-swap tail used by ``swap_parquet`` and the
    streaming sink compaction: park ``path`` at ``<path>__old``, move
    ``staging`` in, drop the parked copy — with every rename's boolean
    checked and a restore attempt if the second rename fails. Refuses to
    run while a parked ``__old`` from a previous crashed swap exists:
    that copy is potentially the only complete one, so resolving it is
    an explicit operator decision, never an automatic delete (the
    round-12 review found the auto-delete made crash-safety exactly one
    invocation deep)."""
    _assert_no_parked_swap(spark, path)
    old = path.rstrip("/") + "__old"
    fs, hpath = hadoop_fs(spark, path)
    _, hstaging = hadoop_fs(spark, staging)
    _, hold = hadoop_fs(spark, old)
    parked = fs.exists(hpath)
    if parked and not fs.rename(hpath, hold):
        raise IOError(f"directory swap: could not park {path} at {old}")
    if not fs.rename(hstaging, hpath):
        # put the previous contents back before failing — the store
        # must never be left absent when we can restore it; the restore
        # rename's boolean is checked like every other (round-12 advisor
        # finding: an ignored failed restore would raise a message that
        # implies the store is back when it is actually absent), and a
        # first-write swap (nothing was parked) must not direct the
        # operator at a nonexistent __old
        if not parked:
            state = (
                f"{path} did not previously exist; the only copy is the "
                f"staging at {staging}"
            )
        elif fs.rename(hold, hpath):
            state = f"previous contents RESTORED at {path}"
        else:
            state = (
                f"restore ALSO failed — {path} is ABSENT; the only "
                f"complete copies are parked at {old} and {staging}"
            )
        raise IOError(
            f"directory swap: could not move {staging} into {path}; {state}"
        )
    if parked:
        fs.delete(hold, True)
