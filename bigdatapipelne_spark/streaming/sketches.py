"""Streaming sketch-rollup maintenance: a per-day DataSketches HLL store
folded from an event stream, one sketch-union per micro-batch.

This is the streaming face of the batch hll_users_rollup query
(queries_analytics): instead of rescanning history, each micro-batch
aggregates its own rows into per-day sketches and ``hll_union_agg``-merges
them into the stored ones. Mergeability is what makes this exact-ish under
re-aggregation: a user seen in three different batches collapses to one
registration inside the union, so continuous maintenance estimates the
SAME cardinality as a one-shot scan — no double counting across batch
boundaries, the property a streaming distinct-count dashboard needs at
100 TB (per-batch cost scales with batch size; the store holds one
fixed-size sketch blob per day regardless of history length).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdatapipelne_spark.sources.io import swap_parquet as _swap_parquet


def hll_stream_to_rollup(
    events: DataFrame,
    store_path: str,
    checkpoint_path: str,
    ts_col: str = "ts",
    key_col: str = "user_id",
) -> None:
    """Drain a streaming event feed into a per-day HLL sketch store at
    ``store_path`` (columns: day timestamp, sk binary). Each micro-batch
    unions its per-day sketches into the stored blobs; the store swap is
    staged-then-rename (crash-safe, not reader-atomic — same contract as
    stream_to_serving; concurrent readers want the versioned store or
    Delta/Iceberg underneath)."""

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        daily = batch_df.groupBy(
            F.date_trunc("day", ts_col).alias("day")
        ).agg(F.hll_sketch_agg(key_col).alias("sk"))
        if os.path.exists(store_path):
            old = spark.read.parquet(store_path)
            daily = (
                old.unionByName(daily)
                .groupBy("day")
                .agg(F.hll_union_agg("sk").alias("sk"))
            )
        _swap_parquet(daily, store_path)

    q = (
        events.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def read_rollup_estimates(spark: SparkSession, store_path: str) -> DataFrame:
    """The stored sketches as (day, est_users) — the serving-side read."""
    return spark.read.parquet(store_path).select(
        "day", F.hll_sketch_estimate("sk").alias("est_users")
    )
