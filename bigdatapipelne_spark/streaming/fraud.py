"""The realtime fraud-alert pipeline, Spark-native (SURVEY.md §3.2).

Reference semantics being reproduced (flink_app/app.py):

- S11 source table: fixed-schema streaming scan with an event-time
  watermark of 10 s (``WATERMARK FOR horario_transacao AS
  horario_transacao - INTERVAL '10' SECOND``, app.py:47-53) ->
  ``readStream`` with explicit schema + ``withWatermark`` (W1).
- A3/W2: 10-second tumble, group by key(s), SUM(value), window *end*
  projected as the new event time (app.py:70-79).
- P4/W3: post-aggregation HAVING ``> threshold`` (app.py:80); rows later
  than the watermark are dropped in append mode — same observable
  semantics as Flink's default late-data handling.
- W4 append output, W5 checkpointing, W6 start position (file sources
  always start from the earliest unprocessed file — TRIM_HORIZON), W8
  micro-batch boundaries (``maxFilesPerTrigger`` / ``availableNow``).
- S13/S14/L3 consumer: ``foreachBatch`` upsert into a keyed serving store
  with TTL — the Lambda/DynamoDB path (lambda_app/consumer/function.py:11-25).

Batch/stream parity by construction: the aggregation expressions here are
the same ``exact_sum`` decimal-sum used by the batch ``fraud_windows``
query, so a drained stream equals the batch query over the same input minus
windows still open at the final watermark (asserted in
tests/test_streaming.py).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from bigdatapipelne_spark.operators.aggregate import exact_sum

FRAUD_THRESHOLD = 50.0

EVENTS_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)

# Some testdata generations store events.ts as parquet TIMESTAMP(NANOS),
# which Spark's reader only accepts as int64
# (spark.sql.legacy.parquet.nanosAsLong) — streaming scans of those files
# read ts as long and convert (testdata.py rationale). Other generations
# store TIMESTAMP(MICROS), which Spark reads natively. Streaming sources
# need an explicit schema, so the unit must be sniffed from the footer
# before the readStream is declared: use read_events_parquet_stream.
EVENTS_NANOS_SCHEMA = StructType(
    [f if f.name != "ts" else StructField("ts", LongType()) for f in EVENTS_SCHEMA.fields]
)


def read_events_parquet_stream(spark: SparkSession, path: str) -> DataFrame:
    """Streaming scan of an events parquet file/dir with ``ts`` normalized
    to TimestampType regardless of the file's physical unit.

    Reads the parquet footer (driver-side, no data IO) to pick the schema:
    TIMESTAMP(NANOS) files stream as int64 under nanosAsLong and convert
    with integer division (never float — precision above 2^53 ns); native
    MICROS files stream with TimestampType directly. Pins the UTC session
    timezone either way so downstream window math is wall-clock-independent.
    """
    import glob as _glob

    import pyarrow.parquet as pq
    import pyarrow.types as pat

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    if os.path.isfile(path):
        probe = path
    else:
        candidates = sorted(_glob.glob(f"{path}/*.parquet")) or sorted(
            _glob.glob(f"{path}/**/*.parquet", recursive=True)
        )
        if not candidates:
            raise FileNotFoundError(
                f"read_events_parquet_stream: no *.parquet files under {path!r} "
                "to probe for the timestamp unit (empty or non-parquet directory)"
            )
        probe = candidates[0]
    unit = next(
        (f.type.unit for f in pq.read_schema(probe) if pat.is_timestamp(f.type)),
        None,
    )
    if unit is None:
        # No physical timestamp column in the footer: fall back to the
        # canonical EVENTS_SCHEMA (MICROS path) instead of an opaque
        # StopIteration — a genuinely incompatible file then fails in the
        # scan with the column name in the error.
        unit = "us"
    if unit == "ns":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        src = read_events_stream(spark, path, schema=EVENTS_NANOS_SCHEMA, fmt="parquet")
        return src.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    return read_events_stream(spark, path, schema=EVENTS_SCHEMA, fmt="parquet")


def read_events_stream(
    spark: SparkSession,
    path: str,
    schema: StructType = EVENTS_SCHEMA,
    fmt: str = "json",
    max_files_per_trigger: int | None = None,
    bundle=None,
) -> DataFrame:
    """S11: streaming source with explicit schema (Structured Streaming does
    not infer — matching Flink's DDL discipline). ``max_files_per_trigger``
    sets the micro-batch boundary (W8).

    The source choice goes through the streaming/bus.py seam: the default
    is the file bundle built from (path, schema, fmt), and a production
    deployment passes ``bundle=SourceBundle(fmt="kafka", schema=...,
    options={...})`` — the downstream plan (watermark/window/agg) is the
    same lineage either way (reference: flink_app/app.py:47-67 kinesis
    DDL)."""
    from bigdatapipelne_spark.streaming import bus

    if bundle is None:
        bundle = bus.file_source(path, schema, fmt, max_files_per_trigger)
    return bus.open_stream(spark, bundle)


def fraud_alerts(
    events: DataFrame,
    time_col: str = "ts",
    keys: tuple[str, ...] = ("user_id",),
    value_col: str = "value",
    threshold: float = FRAUD_THRESHOLD,
    window: str = "10 seconds",
    watermark: str = "10 seconds",
) -> DataFrame:
    """W1+W2+A3+P4+P5 on a streaming (or batch) DataFrame: watermark,
    tumble, exact decimal SUM, HAVING, window bounds projected out.

    Works unchanged on a batch frame (withWatermark is a no-op there) —
    that IS the lambda-architecture parity story."""
    src = events
    if src.isStreaming:
        src = src.withWatermark(time_col, watermark)
    return (
        src.groupBy(F.window(F.col(time_col), window).alias("w"), *keys)
        .agg(exact_sum(value_col, "sum_value"), F.count(F.lit(1)).alias("n_events"))
        .filter(F.col("sum_value") > threshold)
        .select(
            *keys,
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "sum_value",
            "n_events",
        )
    )


ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


def run_available_now(
    sdf: DataFrame,
    out_path: str,
    checkpoint_path: str,
    fmt: str = "parquet",
    output_mode: str = "append",
    state_partitions: int | None = None,
    state_store_provider: str | None = None,
) -> None:
    """Drain everything currently available through the streaming plan and
    stop (W4 append + W5 checkpoint + the availableNow trigger).

    This is also the job-bookmark story (S10/Glue `--job-bookmark-enable`,
    ddk_app/custom/historical.py:358): the checkpoint tracks processed
    files, so re-running with the same checkpoint processes only new files
    — incremental ingestion without a bespoke ledger.

    ``state_partitions`` sizes the stateful operators' state-store
    partitioning to the WORKLOAD instead of the session's batch shuffle
    default. Structured Streaming pins ``spark.sql.shuffle.partitions``
    into the checkpoint at first start (restarts reuse the pinned value,
    so the post-drain restore below can never re-plan an existing query);
    every micro-batch then pays a per-partition, per-state-store
    load/commit constant — a stream-stream join carries FOUR state stores
    per partition, and the availableNow watermark cycle runs multiple
    batches. Oversized state partitioning therefore buys pure overhead:
    measured warm at sf0.1 (local[32]), the left-outer purchase/view
    drain runs 7.3s with 32 nearly-empty state partitions and 2.7s with
    4 (full-outer 7.7s→2.4s, inner 6.9s→2.2s — identical output rows;
    .profiling/prof_drain_parts_r10.py). Size it from expected state
    volume (streaming/joins.py size_state_partitions); a 1000-executor
    deployment sizes the same knob UP (2-3x total cores) for state
    throughput — the point is matching the workload, not a small number.
    ``None`` keeps the session default unchanged.

    ``state_store_provider`` picks the state-store backend for THIS query
    (pinned into the checkpoint at first start, like the partition
    count). The default HDFSBackedStateStoreProvider holds every loaded
    partition's state map ON-HEAP — at 100 TB a stream-stream join's
    four stores x partitions is the real OOM risk — while
    ``ROCKSDB_PROVIDER`` keeps state off-heap in per-partition RocksDB
    instances with changelog/snapshot files under the checkpoint, the
    at-scale deployment choice. Output is provider-independent
    (hash-certified both by the gated purchase_view_outer_drain, which
    runs RocksDB permanently, and by the A/B identity test in
    tests/test_streaming.py); the per-batch constant differs — see
    STATUS.md round-11 notes for the measured delta.
    """
    spark = sdf.sparkSession
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    prev_provider = spark.conf.get(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming."
        "state.HDFSBackedStateStoreProvider",
    )
    if state_partitions is not None:
        spark.conf.set("spark.sql.shuffle.partitions", str(state_partitions))
    if state_store_provider is not None:
        spark.conf.set(
            "spark.sql.streaming.stateStore.providerClass", state_store_provider
        )
    try:
        q = (
            sdf.writeStream.format(fmt)
            .option("path", out_path)
            .option("checkpointLocation", checkpoint_path)
            .outputMode(output_mode)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        if state_partitions is not None:
            spark.conf.set("spark.sql.shuffle.partitions", prev)
        if state_store_provider is not None:
            spark.conf.set(
                "spark.sql.streaming.stateStore.providerClass", prev_provider
            )


def read_serving(spark: SparkSession, serving_path: str) -> DataFrame:
    """Typed view of the keyed serving store (operators/serving.py
    read_store) — the physical bucket column stays an implementation
    detail."""
    from bigdatapipelne_spark.operators.serving import read_store

    return read_store(spark, serving_path)


def stream_to_serving(
    sdf: DataFrame,
    serving_path: str,
    key_cols: list[str],
    checkpoint_path: str,
    num_buckets: int | None = None,
) -> None:
    """S13/S14/L3 streaming form: drain alerts into a keyed serving store
    with last-writer-wins upsert per micro-batch (foreachBatch), parity with
    the Lambda consumer's per-record ``put_item``. ``update`` output mode so
    a growing window re-upserts its row — exactly DynamoDB's behavior.

    Per-batch cost is bounded by the BATCH, not the table (the reference's
    per-record put is O(batch) — lambda_app/consumer/function.py:16-24):
    the store is hash-partitioned on the key (operators/serving.py
    merge_into_store), each micro-batch reads and dynamically overwrites
    ONLY the buckets its keys touch. Untouched bucket files are never read
    or rewritten (asserted byte-for-byte in
    tests/test_streaming.py::test_stream_to_serving_rewrites_only_touched_buckets).

    On a real deployment the store would be Delta/Iceberg and this becomes
    MERGE INTO; bucket-partitioned parquet keeps the dependency surface
    zero with the same asymptotics.
    """
    from bigdatapipelne_spark.operators.serving import (
        SERVING_BUCKETS,
        merge_into_store,
    )

    spark = sdf.sparkSession
    n = num_buckets if num_buckets is not None else SERVING_BUCKETS

    def _merge(batch_df: DataFrame, _batch_id: int) -> None:
        merge_into_store(spark, serving_path, batch_df, key_cols, n)

    q = (
        sdf.writeStream.foreachBatch(_merge)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
