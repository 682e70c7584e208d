"""Time-window aggregation, batch form (SURVEY.md §2.3 A3 / §2.4 W2).

The reference's realtime path tumbles event time into 10-second windows and
sums ``valor`` per key (flink_app/app.py:70-83). ``tumbling_window_agg`` is
the batch-identical form on ``F.window`` — the streaming form (with
watermark) lives in ``bigdatapipelne_spark.streaming.fraud`` and shares
these semantics, so batch backfill and the live stream agree (the classic
lambda-architecture parity problem solved by construction).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def tumbling_window_agg(
    df: DataFrame,
    time_col: str,
    duration: str,
    keys: list[str],
    aggs: list[Column],
    having: Column | None = None,
) -> DataFrame:
    """Tumble ``time_col`` into fixed windows, aggregate per (window, keys).

    Emits ``window_start`` / ``window_end`` columns (the reference projects
    the window *end* as the new event time, flink_app/app.py:79). ``having``
    is a post-aggregation predicate — the streaming HAVING of
    flink_app/app.py:80 (``valor > 5000``). Windows are epoch-aligned
    (Spark default), matching any epoch-aligned bucketing downstream.
    """
    out = (
        df.groupBy(F.window(F.col(time_col), duration).alias("w"), *keys)
        .agg(*aggs)
        .withColumn("window_start", F.col("w.start"))
        .withColumn("window_end", F.col("w.end"))
        .drop("w")
    )
    if having is not None:
        out = out.filter(having)
    return out
