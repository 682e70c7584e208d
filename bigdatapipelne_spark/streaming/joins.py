"""Stream-stream join: correlate two event streams on a key within an
event-time lookback window.

The reference has no stream-stream joins (SURVEY.md §2.4 explicit
non-goal); this is the Spark-native capability a realtime attribution /
fraud-context pipeline needs (e.g. "each purchase with the views that
preceded it by <= 6 h").

Execution model (Structured Streaming micro-batch):

- Both sides are watermarked; the time-range condition bounds how long each
  side's rows stay in the join state store, so state is
  O(key-rate x lookback), not unbounded.
- INNER join rows emit as soon as both sides have arrived — emission does
  not wait for the watermark (only state *eviction* does), so a fully
  drained inner join equals the batch join over the same inputs exactly.
  That equivalence is what the oracle-checked drain query certifies.
- At 100 TB-rate both sides shuffle on the join key once; the state store
  is partitioned the same way, so a restart resumes from the checkpoint
  with no rescan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def correlate_streams(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_time: str,
    right_time: str,
    lookback: str = "6 hours",
    watermark: str = "10 seconds",
    how: str = "inner",
) -> DataFrame:
    """Join ``left`` rows to ``right`` rows with the same ``key`` whose
    ``right_time`` falls in ``[left_time - lookback, left_time]``.

    ``how='inner'`` emits as soon as both sides arrive (drained == batch
    join exactly). ``how='left_outer'`` additionally emits null-extended
    rows for unmatched left rows — but only once the watermark passes the
    point where a match is impossible (arriving right rows always have
    ``right_time`` >= watermark, so a left row is closed when watermark >
    ``left_time``): left rows still inside the watermark at drain end stay
    unemitted, exactly like append-mode aggregation tails
    (tests/test_streaming pins this emission semantics).
    ``how='full_outer'`` adds the symmetric right-side rule: an unmatched
    right row closes when the watermark passes the last left_time that
    could still match it (``right_time + lookback``) — both eviction
    rules are reproduced in the gated drain's oracle.

    Column names must be disjoint apart from ``key`` (rename before
    calling). Works identically on batch frames (withWatermark is a no-op)
    — the lambda-parity story again."""
    if how not in ("inner", "left_outer", "full_outer"):
        raise ValueError(
            "correlate_streams supports how='inner', 'left_outer' or 'full_outer'"
        )
    lw = left.withWatermark(left_time, watermark) if left.isStreaming else left
    rw = right.withWatermark(right_time, watermark) if right.isStreaming else right
    cond = (
        (lw[key] == rw[key])
        & (rw[right_time] <= lw[left_time])
        & (rw[right_time] >= lw[left_time] - F.expr(f"INTERVAL {lookback}"))
    )
    joined = lw.join(rw, cond, how)
    if how == "full_outer":
        # Right-only rows have a NULL left key: surface the key as the
        # coalesce of both sides, then drop the originals.
        return joined.withColumn(
            f"__{key}", F.coalesce(lw[key], rw[key])
        ).drop(lw[key]).drop(rw[key]).withColumnRenamed(f"__{key}", key)
    return joined.drop(rw[key])


def size_state_partitions(
    n_state_rows: int,
    rows_per_partition: int = 250_000,
    floor: int = 4,
    cap: int | None = None,
) -> int:
    """Size a streaming query's state-store partition count from its
    expected state volume (for ``run_available_now(state_partitions=...)``).

    Rationale: each state partition costs a fixed load/commit per
    micro-batch per state store (a stream-stream join keeps four stores
    per partition), so partitions holding almost no state are pure
    overhead — at sf0.1 the purchase/view drains spend ~5s of their ~7s
    wall on 32 nearly-empty state partitions (measured,
    .profiling/prof_drain_parts_r10.py). ~250k state rows per partition
    keeps the HDFS-backed store's in-memory map comfortably sized while
    amortizing the constant; a floor of 4 preserves minimal parallelism.
    On a real cluster pass ``cap=2-3x total cores`` — beyond that, extra
    partitions stop adding throughput and resume/commit constants
    dominate again.
    """
    parts = max(floor, -(-n_state_rows // max(rows_per_partition, 1)))
    return min(parts, cap) if cap is not None else parts


def enrich_stream(
    stream: DataFrame,
    dim: DataFrame,
    on: str | list[str],
    how: str = "left",
) -> DataFrame:
    """Stream-static enrichment: join each micro-batch against a batch
    dimension table (the standard "decorate events with the customer/device
    record" stage).

    Semantics Structured Streaming gives for free — and that matter at
    scale:

    - The static side is re-evaluated **per micro-batch**, so a dimension
      backed by a parquet directory picks up newly written files without a
      stream restart (slowly-changing dims come along for the ride).
    - No state store is involved: unlike a stream-stream join, nothing is
      buffered past the micro-batch, so this never grows memory with
      stream lifetime.
    - The dim side is broadcast when it fits (AQE sizes it per batch); a
      genuinely fact-sized dim falls back to a shuffled join per batch —
      at that point pre-bucket the dim on the key (sources/io.py bucketed
      writers) so only the stream side shuffles.

    Left join keeps unmatched events (enrichment must not drop facts).
    """
    return stream.join(dim, on, how)
