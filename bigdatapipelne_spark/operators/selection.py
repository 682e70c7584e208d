"""Corpus selection: token-budget selection via a distributed prefix sum,
and deterministic per-stratum fraction sampling.

The "which documents make the training cut" step after dedup/quality
scoring. Both operators are built so the document text never moves: they
compute over narrow (id, score, n_tokens) projections and the caller joins
the verdict back by id.

Token-budget selection ("take the best documents until the token budget is
spent") is a global cumulative sum over a total order — the textbook
straggler if expressed as one unpartitioned window (every row funnels
through a single WindowExec task). The scale design is the classic
two-pass distributed prefix sum:

1. range-repartition the narrow projection on the order key, so partition
   p holds ranks strictly before partition p+1 (Spark's RangePartitioner
   samples boundaries — one extra pass over the narrow frame);
2. per-partition token subtotals (a tiny P-row aggregate) are collected,
   cumulated on the driver (P numbers, KB-sized at any data scale), and
   broadcast back as each partition's starting offset;
3. a window partitioned BY the partition id (parallel, no global funnel)
   adds the in-partition running sum to the offset — the exact global
   cumulative sum, computed with no single-task bottleneck.

Reference scope: the reference pipeline has no selection step; this is
north-star surface for the 100 TB training-data use case (SURVEY.md §2
extension family, same tier as dedup/sampling/packing).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from bigdatapipelne_spark.operators.checkpoint import eager_checkpoint


def budget_select(
    df: DataFrame,
    id_col: str,
    tokens_col: str,
    score_col: str,
    *,
    budget: int,
    num_partitions: int | None = None,
) -> DataFrame:
    """Greedy token-budget selection: walk documents in (score DESC, id ASC)
    order, keep each while the running token total stays <= ``budget``.

    Emits ``id_col, n_tokens, score, cum_tokens, selected`` — one row per
    input document, ``selected`` true for the kept prefix (callers filter
    or join back by id). ``cum_tokens`` includes the document's own tokens,
    so the selection rule is exactly ``cum_tokens <= budget`` — a document
    that would overflow the budget is dropped but later smaller documents
    are NOT back-filled (strict prefix semantics: deterministic, order-
    independent, and SQL-replicable with one window — knapsack-style
    back-filling would be none of those).

    The global cumsum runs as the two-pass distributed prefix sum described
    in the module docstring; only (id, tokens, score) rows are ever
    shuffled. The driver materializes one number per partition — KB-sized
    at any scale.
    """
    narrow = df.select(
        F.col(id_col),
        F.col(tokens_col).cast("long").alias("n_tokens"),
        F.col(score_col).cast("double").alias("score"),
    )
    parts = num_partitions or narrow.sparkSession.conf.get(
        "spark.sql.shuffle.partitions", "32"
    )
    # Materialized ONCE (localCheckpoint) before pass 1 collects subtotals:
    # row->partition assignment is not guaranteed stable across jobs (range
    # boundaries come from sampling; AQE or a nondeterministic upstream can
    # reshape the input), and pairing pass-1 offsets with a re-evaluated
    # assignment would silently double-count or skip tokens. Freezing _pid
    # as data costs one narrow (id, tokens, score) pass of storage — the
    # same pass the at-scale caller would persist anyway.
    ranged = (
        narrow.repartitionByRange(int(parts), F.desc("score"), F.asc(id_col))
        .withColumn("_pid", F.spark_partition_id())
        .transform(eager_checkpoint)
    )

    # Pass 1: per-partition subtotals -> driver-side running offsets.
    # RangePartitioner keys partition p strictly before p+1 in the sort
    # order, so offsets[p] = sum of tokens in partitions < p.
    subtotals = {
        r["_pid"]: r["subtotal"]
        for r in ranged.groupBy("_pid")
        .agg(F.sum("n_tokens").alias("subtotal"))
        .collect()
    }
    offsets, acc = [], 0
    for pid in sorted(subtotals):
        offsets.append((pid, acc))
        acc += subtotals[pid]
    spark = narrow.sparkSession
    offsets_df = spark.createDataFrame(
        offsets or [(0, 0)], "_pid int, _offset long"
    )

    # Pass 2: in-partition running sum (window partitioned by _pid — every
    # partition cumulates in parallel) + the broadcast per-partition offset,
    # both reading the checkpointed blocks from pass 1.
    w = (
        Window.partitionBy("_pid")
        .orderBy(F.desc("score"), F.asc(id_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        ranged.join(F.broadcast(offsets_df), "_pid", "left")
        .withColumn(
            "cum_tokens",
            F.sum("n_tokens").over(w) + F.coalesce(F.col("_offset"), F.lit(0)),
        )
        .withColumn("selected", F.col("cum_tokens") <= F.lit(budget))
        .drop("_pid", "_offset")
    )


def uniform_hash(col: Column | str) -> Column:
    """Deterministic cross-engine uniform in [0, 1): the first 8 hex chars
    of md5(value as string) scaled by 2^32. DuckDB mirror:
    ``('0x' || substring(md5(CAST(x AS VARCHAR)), 1, 8))::BIGINT /
    4294967296.0`` — the same construction dataset_splits/md5_bucket use,
    widened to a unit float."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c.cast("string")), 1, 8), 16, 10).cast(
        "double"
    ) / F.lit(4294967296.0)


def mixture_fractions(
    df: DataFrame,
    group_col: str,
    target_shares: dict[str, float],
) -> DataFrame:
    """Per-group keep fractions that rebalance a corpus to a target
    mixture WITHOUT upsampling: the output corpus is the largest one
    achievable at the target shares given what each group actually has.

    With ``n(g)`` rows in group g and target share ``s(g)``, the reachable
    corpus size is ``C = min over g of n(g)/s(g)`` (the binding group is
    the one the corpus is shortest on), and ``keep_fraction(g) =
    least(1, s(g) * C / n(g))`` — the binding group keeps everything,
    over-represented groups downsample. One grouped count plus arithmetic
    on a groups-sized frame (KB at any scale); pair with
    ``sample_fraction_per_group``'s deterministic coin to materialize the
    sample. Groups absent from ``target_shares`` get share 0 (dropped).

    Emits ``group_col, n_rows, keep_fraction`` (full-precision double —
    round only at presentation boundaries).
    """
    share = F.lit(0.0)
    for g, s in sorted(target_shares.items()):
        share = F.when(F.col(group_col) == g, F.lit(float(s))).otherwise(share)
    counts = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("n_rows")).withColumn(
        "_share", share
    )
    reachable = counts.filter(F.col("_share") > 0).agg(
        F.min(F.col("n_rows") / F.col("_share")).alias("_c")
    )
    return (
        counts.crossJoin(F.broadcast(reachable))
        .select(
            group_col,
            "n_rows",
            F.when(
                F.col("_share") > 0,
                F.least(
                    F.lit(1.0), F.col("_share") * F.col("_c") / F.col("n_rows")
                ),
            )
            .otherwise(F.lit(0.0))
            .alias("keep_fraction"),
        )
    )


def sample_fraction_per_group(
    df: DataFrame,
    id_col: str,
    group_col: str,
    fractions: dict[str, float],
    default_fraction: float = 0.0,
) -> DataFrame:
    """Stratified Bernoulli sampling with a deterministic coin: keep a row
    when ``uniform_hash(id) < fraction(group)``.

    Unlike ``DataFrame.sampleBy`` the decision is a pure function of the
    row's id — re-runs, retries, and other engines (the DuckDB oracle)
    reproduce the exact same sample, and the expected rate per stratum is
    ``fractions[group]``. No shuffle: the filter evaluates in the scan
    stage and pushes into codegen.
    """
    frac = F.lit(float(default_fraction))
    for g, f in sorted(fractions.items()):
        frac = F.when(F.col(group_col) == g, F.lit(float(f))).otherwise(frac)
    return df.filter(uniform_hash(id_col) < frac)


def global_rank(
    df: DataFrame,
    order_by: list[Column],
    *,
    num_partitions: int | None = None,
) -> DataFrame:
    """Exact global 1-based rank over a total order WITHOUT the
    single-task window funnel — the same two-pass distributed prefix
    pattern as ``budget_select``, counting rows instead of tokens:
    range-repartition on the order, collect one row-count per partition
    (P numbers), cumulate on the driver, and add each partition's
    broadcast offset to its parallel in-partition row_number.

    ``order_by`` must be a TOTAL order (include a unique tiebreaker) or
    ranks are nondeterministic. Emits the input columns plus ``rank``.

    The ranged frame is materialized ONCE (``localCheckpoint``) before the
    per-partition counts are collected: range boundaries come from a
    sample and row→partition assignment is not stable across jobs (AQE
    re-plans, nondeterministic upstreams, unioned file order), so
    evaluating the frame twice — once for counts, once in the returned
    plan — could silently pair offsets with a DIFFERENT assignment,
    yielding duplicate or skipped ranks. Checkpointing freezes ``_pid``
    as data; both reads see the same rows in the same partitions. The
    storage cost is one pass of the input (memory-and-disk, released when
    the frame is GC'd) — the price of exactness, same as ``persist()``
    in the classic two-pass prefix-sum pattern.
    """
    parts = num_partitions or df.sparkSession.conf.get(
        "spark.sql.shuffle.partitions", "32"
    )
    ranged = (
        df.repartitionByRange(int(parts), *order_by)
        .withColumn("_pid", F.spark_partition_id())
        .transform(eager_checkpoint)
    )
    counts = {
        r["_pid"]: r["c"]
        for r in ranged.groupBy("_pid").agg(F.count(F.lit(1)).alias("c")).collect()
    }
    offsets, acc = [], 0
    for pid in sorted(counts):
        offsets.append((pid, acc))
        acc += counts[pid]
    offsets_df = df.sparkSession.createDataFrame(
        offsets or [(0, 0)], "_pid int, _offset long"
    )
    w = Window.partitionBy("_pid").orderBy(*order_by)
    return (
        ranged.join(F.broadcast(offsets_df), "_pid", "left")
        .withColumn(
            "rank",
            F.row_number().over(w) + F.coalesce(F.col("_offset"), F.lit(0)),
        )
        .drop("_pid", "_offset")
    )
