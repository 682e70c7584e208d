"""Session-tunable eager checkpointing — the engine's one memory-pressure
knob.

Every hot dedup/selection/graph path materializes reused frames with an
eager localCheckpoint (single evaluation + a CollapseProject/CSE barrier;
see the verify skill's gotchas). The default storage level
(MEMORY_AND_DISK deserialized) is right when executors have headroom, but
under a tight memory budget the cached blocks and the sorters fight over
the unified pool: measured at the round-11 spill rehearsal, the sf10
dedup band on local[32] with a 4x-cut heap (2g) dies in
UnsafeExternalSorter with SparkOutOfMemoryError "got 0" while the shingle
checkpoint is materializing — the protected storage region starves
execution and an unrolling task cannot be evicted mid-write.

``eager_checkpoint`` keeps the default behavior unless the session sets

    spark.bigdatapipelne.checkpoint.storageLevel = DISK_ONLY

(or any pyspark StorageLevel name). Checkpoint blocks are re-readable
from disk by construction, so DISK_ONLY trades one serialize/read pass
for the entire storage-pool footprint — the correct posture for
memory-constrained executors, and the posture the spill rehearsal
(bench_spill.py) certifies OOM-free. All call sites chain it as
``df.transform(eager_checkpoint)``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.storagelevel import StorageLevel

CHECKPOINT_LEVEL_CONF = "spark.bigdatapipelne.checkpoint.storageLevel"


def eager_checkpoint(df: DataFrame) -> DataFrame:
    """``localCheckpoint(eager=True)`` at the session's configured
    storage level (``CHECKPOINT_LEVEL_CONF``; unset = engine default)."""
    level = df.sparkSession.conf.get(CHECKPOINT_LEVEL_CONF, None)
    if not level:
        return df.localCheckpoint(eager=True)
    try:
        sl = getattr(StorageLevel, level)
        if not isinstance(sl, StorageLevel):
            raise AttributeError(level)
    except AttributeError:
        valid = sorted(
            k for k, v in vars(StorageLevel).items()
            if isinstance(v, StorageLevel)
        )
        raise ValueError(
            f"{CHECKPOINT_LEVEL_CONF}={level!r} is not a StorageLevel; "
            f"valid names: {valid}"
        ) from None
    return df.localCheckpoint(eager=True, storageLevel=sl)


def checkpoint_rdd_id(df: DataFrame) -> int | None:
    """The id of the cached RDD backing a localCheckpointed DataFrame, or
    None if ``df`` is not checkpoint-backed. Used by ``release_checkpoint``
    and by tests that must assert on THIS frame's blocks rather than
    whatever else the shared session has cached."""
    analyzed = df._jdf.queryExecution().analyzed()
    if analyzed.getClass().getSimpleName() != "LogicalRDD":
        return None
    return analyzed.rdd().id()


def release_checkpoint(df: DataFrame) -> None:
    """Free a localCheckpointed DataFrame's cached blocks NOW.

    ``DataFrame.unpersist()`` is a silent no-op on a checkpointed frame
    (verified on PySpark 4.1.2: it clears only the SQL cache manager,
    while the blocks belong to the RDD-level persist backing the
    LogicalRDD — they otherwise live until driver GC + ContextCleaner,
    which is exactly how a long sweep accumulated 5.6 GB of orphaned
    blocks in an earlier round). This unpersists the backing RDD itself;
    the frame must not be used afterwards."""
    analyzed = df._jdf.queryExecution().analyzed()
    if analyzed.getClass().getSimpleName() == "LogicalRDD":
        analyzed.rdd().unpersist(True)
    else:  # not checkpoint-backed; best effort
        df.unpersist(True)
