"""Deterministic sampling operators.

Complements the rate-based samplers in queries_llm (dataset_splits /
stratified_sample, md5-bucket fractions): ``sample_k_per_group`` draws an
exact COUNT per group — "5 examples per (lang, source)" — as a pure
function of the row key, so the same rows are drawn on any cluster size,
any partitioning, any run.

The draw order is md5(seed:id): a keyed hash is a uniform random permutation
for sampling purposes, and ranking by it is exactly reservoir sampling's
distribution without reservoir state. Changing ``seed`` redraws.

Scale design: naive ``row_number() OVER (PARTITION BY group)`` sorts every
group in full — a single hot group (half a 100 TB table in one skewed key)
serializes onto one task. Instead top-k-by-hash decomposes: stage 1 ranks
within (group, salt) — ``salts`` parallel sorts of 1/salts of the group
each — and keeps k per salted subgroup; stage 2 re-ranks the survivors
(<= salts*k rows per group, trivial) for the true per-group top k. Both
stages pick by the same total order (md5, then id), so the two-stage
result is row-identical to the naive form — asserted in
tests/test_operators.py — while the heavy sort parallelizes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sample_k_per_group(
    df: DataFrame,
    group_cols: list[str],
    id_col: str,
    k: int,
    seed: str = "sample",
    salts: int = 16,
) -> DataFrame:
    """Exactly min(k, |group|) rows per group, drawn deterministically by
    md5(seed:id) with ``id_col`` as the tiebreaker; adds ``sample_rank``
    (1-based draw order within the group). ``salts=1`` degenerates to the
    naive single-sort form."""
    if k < 1:
        raise ValueError("k must be >= 1")
    draw = F.md5(F.concat(F.lit(f"{seed}:"), F.col(id_col).cast("string")))
    salted = df.withColumn("_draw", draw).withColumn(
        "_salt", F.pmod(F.xxhash64(id_col), F.lit(salts))
    )
    w1 = Window.partitionBy(*group_cols, "_salt").orderBy("_draw", id_col)
    survivors = (
        salted.withColumn("_r1", F.row_number().over(w1))
        .filter(F.col("_r1") <= k)
        .drop("_r1", "_salt")
    )
    w2 = Window.partitionBy(*group_cols).orderBy("_draw", id_col)
    return (
        survivors.withColumn(
            "sample_rank", F.row_number().over(w2).cast("bigint")
        )
        .filter(F.col("sample_rank") <= k)
        .drop("_draw")
    )


def weighted_sample_topk(
    df: DataFrame, id_col: str, weight_col: str, k: int
) -> DataFrame:
    """Deterministic weighted sampling without replacement (Efraimidis-
    Spirakis A-ES): every row draws the key ``u ** (1 / weight)`` with
    ``u = uniform_hash(id)`` and the k largest keys win — each row's
    inclusion probability is proportional to its weight, with no RNG
    state to coordinate across executors (the draw is a pure function of
    the row id, so re-runs, retries, other engines, and any partitioning
    reproduce the identical sample).

    The top-k runs as TakeOrdered (per-partition heap of k, then one
    k-row merge) — never a global sort. Rows with weight <= 0 or NULL
    are excluded (they can never win under A-ES semantics).

    Emits ``id_col, weight, sample_key`` with the key rounded to 6 dp at
    the presentation boundary (pow is within 1 ulp across engines; the
    ranking itself stays full-precision — a boundary flip would need two
    keys within ~1e-16, far below any real corpus's key spacing).
    """
    from bigdatapipelne_spark.operators.selection import uniform_hash

    w = F.col(weight_col).cast("double")
    # Ineligible rows (w <= 0 / NULL) get a NULL key instead of a pre-sort
    # filter: PushDownPredicates would substitute the WHOLE weight
    # expression into a pushed ``w > 0`` filter below the caller's
    # projections (and below any widening repartition), evaluating an
    # expensive weight — e.g. the quality tokenize — twice, once on the
    # narrow scan (measured 2x cost + one-core stage on
    # weighted_docs_sample in the round-6 sf10 rehearsal). DESC NULLS LAST
    # ranks the null keys behind every eligible row and the post-limit
    # filter drops any that straggle into an under-full top-k, so the
    # emitted set is exactly the filter-first A-ES result.
    key = F.when(w > 0, F.pow(uniform_hash(id_col), F.lit(1.0) / w))
    return (
        df.select(
            F.col(id_col),
            w.alias("weight"),
            key.alias("__key"),
        )
        .orderBy(F.desc_nulls_last("__key"), F.asc(id_col))
        .limit(k)
        .filter(F.col("__key").isNotNull())
        .select(
            id_col, "weight", F.round(F.col("__key"), 6).alias("sample_key")
        )
    )


def weighted_sample_per_group(
    df: DataFrame, id_col: str, group_col: str, weight_col: str, k: int
) -> DataFrame:
    """Per-group A-ES weighted sampling without replacement: the
    ``weighted_sample_topk`` draw key ranked WITHIN each group — "the k
    quality-weighted picks per language". Same determinism story (pure
    function of the row id); the per-group window parallelizes across
    groups, and a pathologically hot group takes the salted two-stage
    route of ``sample_k_per_group``. Emits ``group_col, id_col, weight,
    sample_key, rk``.
    """
    from bigdatapipelne_spark.operators.selection import uniform_hash

    w = F.col(weight_col).cast("double")
    # NULL-key form for ineligible rows — same pushed-filter double-eval
    # rationale as weighted_sample_topk above.
    key = F.when(w > 0, F.pow(uniform_hash(id_col), F.lit(1.0) / w))
    # Group cardinality is CONSTANT in corpus size (languages, domains),
    # so a single per-group window concentrates the whole corpus sort on
    # n_groups cores no matter the scale — measured 42x at 100x data on
    # ~10 langs. Salted two-stage top-k instead: a per-(group, salt)
    # window prunes to k survivors per salt (parallelism n_groups x
    # SALTS), then the exact per-group window ranks the tiny survivor
    # set (n_groups x SALTS x k rows). Identical result: every
    # per-group top-k row is top-k within its own salt bucket. The
    # widening repartition also lifts an expensive weight expression
    # (e.g. the quality tokenize) off a narrow single-file scan.
    SALTS = 32
    par = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < par:
        # widen BEFORE projecting the key: a projection stays below a
        # repartition added above it, which would evaluate the weight on
        # the narrow scan
        df = df.repartition(par)
    keyed = df.select(
        F.col(group_col), F.col(id_col), w.alias("weight"), key.alias("__key")
    )
    salt = F.pmod(F.xxhash64(F.col(id_col)), F.lit(SALTS))
    pre = Window.partitionBy(group_col, "__salt").orderBy(
        F.desc_nulls_last("__key"), F.asc(id_col)
    )
    survivors = (
        keyed.withColumn("__salt", salt)
        .withColumn("__prk", F.row_number().over(pre))
        .filter(F.col("__prk") <= k)
        .drop("__salt", "__prk")
    )
    win = Window.partitionBy(group_col).orderBy(
        F.desc_nulls_last("__key"), F.asc(id_col)
    )
    return (
        survivors.withColumn("rk", F.row_number().over(win))
        .filter((F.col("rk") <= k) & F.col("__key").isNotNull())
        .select(
            group_col, id_col, "weight",
            F.round(F.col("__key"), 6).alias("sample_key"),
            F.col("rk").cast("int").alias("rk"),
        )
    )
