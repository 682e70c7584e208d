"""Streaming SCD Type 2 maintenance: a change-data-capture stream folded
into a versioned dimension store, one ``scd2_merge`` per micro-batch.

This is the streaming face of ``operators/scd.py`` — the same motive as
``stream_to_serving`` (foreachBatch upsert, fraud.py) but maintaining
HISTORY instead of last-writer-wins state: each micro-batch rebuilds only
the keys it touches (anti-join pass-through for the rest), so per-batch
cost scales with batch size, not dimension size — the property that makes
a continuously-maintained 100 TB dimension feasible at all.

Exactness contract: with batches arriving in per-key event-time order
(the CDC norm; guaranteed here by staging change files in ascending time
ranges with strictly increasing mtimes, which the file source replays in
order), the drained dimension is hash-identical to a full re-snapshot of
the whole feed — certified by user_scd2_stream_drain sharing the batch
queries' full-rebuild DuckDB oracle. Out-of-order BATCHES degrade
gracefully via scd2_merge's replay (see its collapsed-restatement
caveat); out-of-order records WITHIN a batch are always fine.
"""

from __future__ import annotations

import glob
import os
import shutil

from pyspark.sql import DataFrame, SparkSession

from bigdatapipelne_spark.operators.scd import scd2_merge, scd2_snapshot
from bigdatapipelne_spark.sources.io import swap_parquet as _swap_parquet


def stage_ordered_files(frames: list[DataFrame], staging_dir: str) -> None:
    """Write each frame as one parquet file ``NNN.parquet`` with strictly
    increasing mtimes, so a file-stream source with maxFilesPerTrigger=1
    replays them as ordered micro-batches (the file source batches oldest
    mtime first; explicit utimes remove the filesystem-resolution race)."""
    os.makedirs(staging_dir, exist_ok=True)
    for i, df in enumerate(frames):
        _stage_indexed_file(df, staging_dir, i)


# Fixed epoch for staged-file mtimes; only the ordering matters, but it
# must stay well within the FileStreamSource maxFileAge window (7 days by
# default) RELATIVE TO every other staged file — late additions go through
# stage_one_more_file so they share this base rather than wall-clock time.
_STAGE_BASE_EPOCH = 1_600_000_000


def _stage_indexed_file(df: DataFrame, staging_dir: str, index: int) -> None:
    tmp = os.path.join(staging_dir, f"_tmp{index}")
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    (part,) = glob.glob(os.path.join(tmp, "part-*.parquet"))
    dest = os.path.join(staging_dir, f"{index:03d}.parquet")
    shutil.move(part, dest)
    shutil.rmtree(tmp)
    ts = _STAGE_BASE_EPOCH + index
    os.utime(dest, (ts, ts))


def stage_one_more_file(df: DataFrame, staging_dir: str) -> str:
    """Append one more ordered file to a directory previously populated by
    ``stage_ordered_files`` — next index, next mtime off the SAME base
    epoch. Restart tests use this to land a late file the resumed stream
    must pick up; deriving the mtime here (not at the call site) keeps it
    inside the source's maxFileAge window by construction."""
    existing = glob.glob(os.path.join(staging_dir, "[0-9][0-9][0-9].parquet"))
    index = len(existing)
    _stage_indexed_file(df, staging_dir, index)
    return os.path.join(staging_dir, f"{index:03d}.parquet")


def scd2_stream_to_dim(
    changes: DataFrame,
    dim_path: str,
    checkpoint_path: str,
    keys: list[str],
    ts_col: str,
    attrs: list[str],
    tiebreak: list[str] | None = None,
) -> None:
    """Drain a streaming change feed into an SCD2 dimension at
    ``dim_path``: first batch snapshots, every later batch merges
    incrementally. The store swap is staged-then-rename (crash-safe, not
    reader-atomic — same contract as stream_to_serving; a concurrently
    read store wants Delta/Iceberg underneath instead)."""

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        if os.path.exists(dim_path):
            dim = spark.read.parquet(dim_path)
            merged = scd2_merge(dim, batch_df, keys, ts_col, attrs, tiebreak)
        else:
            merged = scd2_snapshot(batch_df, keys, ts_col, attrs, tiebreak)
        _swap_parquet(merged, dim_path)

    q = (
        changes.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def read_dim(spark: SparkSession, dim_path: str) -> DataFrame:
    return spark.read.parquet(dim_path)
