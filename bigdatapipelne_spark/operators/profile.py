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


def psi_drift(
    df: DataFrame,
    group_col: str,
    value_col: str,
    ts_col: str,
    split_ts: str,
    bins: int = 10,
) -> DataFrame:
    """Population Stability Index between the value distributions before
    and after ``split_ts``, per group — the standard drift monitor a
    pipeline runs over every landing batch ("did this feed's value
    distribution move?"). PSI < 0.1 is stable, 0.1-0.25 drifting, > 0.25
    a shifted population.

    Values bin into ``bins`` equal-width buckets over the GLOBAL
    [min, max] (one 1-row stats broadcast; a shared grid — per-era grids
    would hide shift by re-normalizing it away), the top edge clamped
    into the last bin. Bin proportions are Laplace-smoothed,
    ``p = (cnt + 1) / (n + bins)``, so empty bins contribute a finite
    term instead of a log singularity — and therefore every (group, era,
    bin) cell must exist: the bin domain is densified by cross-joining
    the observed groups with ``sequence(0, bins-1)`` (groups x bins x 2
    rows — KB at any scale) before the left join of observed counts.

    PSI = sum over bins of (p_after - p_before) * ln(p_after / p_before),
    rounded to 6 dp at emission (ln-sum precedent: doc_char_entropy).
    Emits ``group_col, n_before, n_after, psi``.

    Scale shape: one scan -> (group, era, bin) counted with map-side
    combine (cells, not rows, cross the shuffle); everything after
    operates on the cells frame. The fixed split keeps the operator a
    pure function of the data; callers slide ``split_ts`` per run.
    """
    stats = df.agg(
        F.min(F.col(value_col).cast("double")).alias("__lo"),
        F.max(F.col(value_col).cast("double")).alias("__hi"),
    )
    width = (F.col("__hi") - F.col("__lo")) / F.lit(float(bins))
    era = F.when(F.col(ts_col) < F.lit(split_ts).cast("timestamp"), "before").otherwise(
        "after"
    )
    # Degenerate distribution guard: a constant column makes hi == lo, so
    # width is 0 and (v - lo) / width would be 0.0/0.0 = NaN — the result
    # would then hinge on each engine's NaN ordering in least/floor rather
    # than defined behavior. Every value IS the single observed point, so
    # force bin 0 explicitly (PSI degenerates to ~0, correctly: no drift
    # is observable in a one-point distribution).
    raw_bin = F.when(
        F.col("__hi") == F.col("__lo"), F.lit(0)
    ).otherwise(
        F.least(
            F.lit(bins - 1),
            F.floor((F.col(value_col).cast("double") - F.col("__lo")) / width),
        )
    )
    cells = (
        df.crossJoin(F.broadcast(stats))
        .select(
            F.col(group_col),
            era.alias("__era"),
            raw_bin.cast("int").alias("__bin"),
        )
        .groupBy(group_col, "__era", "__bin")
        .agg(F.count(F.lit(1)).alias("__cnt"))
    )
    domain = (
        cells.select(group_col)
        .distinct()
        .crossJoin(
            cells.sparkSession.createDataFrame(
                [("before",), ("after",)], "__era string"
            )
        )
        .select(
            group_col, "__era", F.explode(F.sequence(F.lit(0), F.lit(bins - 1))).alias("__bin")
        )
    )
    dense = domain.join(cells, [group_col, "__era", "__bin"], "left").withColumn(
        "__cnt", F.coalesce(F.col("__cnt"), F.lit(0))
    )
    totals = dense.groupBy(group_col, "__era").agg(F.sum("__cnt").alias("__n"))
    smoothed = dense.join(totals, [group_col, "__era"]).withColumn(
        "__p",
        (F.col("__cnt") + F.lit(1)).cast("double")
        / (F.col("__n") + F.lit(bins)).cast("double"),
    )
    before = smoothed.filter(F.col("__era") == "before").select(
        group_col, "__bin", F.col("__p").alias("__pb"), F.col("__n").alias("__nb")
    )
    after = smoothed.filter(F.col("__era") == "after").select(
        group_col, "__bin", F.col("__p").alias("__pa"), F.col("__n").alias("__na")
    )
    return (
        before.join(after, [group_col, "__bin"])
        .groupBy(group_col)
        .agg(
            F.max("__nb").alias("n_before"),
            F.max("__na").alias("n_after"),
            F.round(
                F.sum(
                    (F.col("__pa") - F.col("__pb"))
                    * F.log(F.col("__pa") / F.col("__pb"))
                ),
                6,
            ).alias("psi"),
        )
    )
