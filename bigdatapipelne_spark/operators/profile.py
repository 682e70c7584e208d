"""Data-quality profiling: per-column statistics in one aggregation pass.

The operational companion to a 100 TB ingest pipeline (schema drift, null
floods, and range regressions are caught here before they poison a mart).
One ``df.agg`` computes every column's stats simultaneously — a single
scan + a 1-row shuffle regardless of table width; the wide result is then
unpivoted to one row per column with an array+explode (no second pass).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_numeric(df: DataFrame, columns: list[str]) -> DataFrame:
    """Profile numeric columns: (column, n_rows, n_nulls, n_distinct,
    min_value, max_value) — mins/maxes surfaced as double.

    ``n_distinct`` is exact (one expanded distinct aggregate per column —
    acceptable for profiling runs; swap for approx_count_distinct when
    profiling every load at full scale)."""
    aggs = []
    for c in columns:
        aggs += [
            F.count(F.lit(1)).alias(f"{c}__rows"),
            F.sum(F.col(c).isNull().cast("long")).alias(f"{c}__nulls"),
            F.countDistinct(c).alias(f"{c}__distinct"),
            F.min(F.col(c).cast("double")).alias(f"{c}__min"),
            F.max(F.col(c).cast("double")).alias(f"{c}__max"),
        ]
    wide = df.agg(*aggs)
    rows = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                F.col(f"{c}__rows").alias("n_rows"),
                F.col(f"{c}__nulls").alias("n_nulls"),
                F.col(f"{c}__distinct").alias("n_distinct"),
                F.col(f"{c}__min").alias("min_value"),
                F.col(f"{c}__max").alias("max_value"),
            )
            for c in columns
        ]
    )
    return wide.select(F.explode(rows).alias("p")).select("p.*")


def mad_outliers(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    *,
    threshold: float = 3.5,
    broadcast_stats: bool = False,
) -> DataFrame:
    """Robust anomaly detection: per-group modified z-score from the median
    and the median absolute deviation (Iglewicz-Hoberg: z = 0.6745 *
    (x - median) / MAD), appended as a ``robust_z`` column (null when the
    group's MAD is 0) plus an ``is_outlier`` flag at |z| >= threshold.

    Mean/stddev z-scores break on the very rows they should catch (one
    extreme value inflates sigma and hides itself); median/MAD have a 50%
    breakdown point. Plan shape: two grouped percentile aggregations over
    the same key (median, then MAD of the residuals) and two joins of the
    tiny per-group stats frame back to the data — with low-cardinality
    groups both joins broadcast, so the full pass is two scans and zero
    wide shuffles of the fact table.

    ``group_cols`` cardinality is caller-controlled, so the stats frames
    are NOT force-broadcast by default: AQE sizes them at runtime and
    broadcasts when they fit (a forced hint on a high-cardinality group
    set would OOM the driver). Pass ``broadcast_stats=True`` only when the
    caller knows the group count is small and wants to pin the plan.
    """
    def _hint(frame: DataFrame) -> DataFrame:
        return F.broadcast(frame) if broadcast_stats else frame

    med = df.groupBy(*group_cols).agg(
        F.expr(f"percentile({value_col}, 0.5)").alias("_med")
    )
    mad = (
        df.join(_hint(med), group_cols)
        .groupBy(*group_cols)
        .agg(
            F.expr(f"percentile(abs({value_col} - _med), 0.5)").alias("_mad"),
            F.first("_med").alias("_med"),
        )
    )
    scored = df.join(_hint(mad), group_cols)
    z = F.when(
        F.col("_mad") > 0,
        0.6745 * (F.col(value_col) - F.col("_med")) / F.col("_mad"),
    )
    return (
        scored.withColumn("robust_z", z)
        .withColumn("is_outlier", F.abs(F.round(z, 6)) >= threshold)
        .drop("_med", "_mad")
    )
