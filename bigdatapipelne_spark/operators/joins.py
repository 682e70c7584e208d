"""Join operators beyond vanilla equi-joins: as-of (point-in-time) join,
banded interval join, and salted joins for skewed keys.

The reference has no joins at all (SURVEY.md §2.7); these are part of the
engine's added analytics surface, built for 100 TB:

- ``as_of_join`` uses the union+window formulation, NOT a range join: both
  sides are tagged and unioned, one shuffle on the key co-locates them, and
  a ``last(..., ignorenulls=True)`` running window carries the most recent
  right-side values onto each left row. Cost is one shuffle + one
  within-partition sort — no range-condition join that Catalyst would
  execute as a broadcast nested loop, and no per-key explosion on hot keys.
- ``interval_join`` rewrites a per-key time-range join as a plain
  equi-join on (key, time band) with <=3x replication of one side — the
  banding trick that keeps "within +-delta" correlation shuffle-bound at
  100 TB instead of nested-loop or per-key-quadratic.
- ``salted_join`` spreads one hot build-side key over ``salt`` replicas so
  a skewed probe side parallelizes; AQE's skew splitting handles moderate
  skew automatically, salting is for the pathological single-key case
  (e.g. the null/default key of a 100 TB fact table).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_time: str,
    right_time: str,
    how: str = "left",
) -> DataFrame:
    """Point-in-time join: for every left row, attach the right row with the
    greatest ``right_time`` <= ``left_time`` within the same ``on`` keys
    (backward as-of, exact matches allowed — same semantics as
    ``ASOF LEFT JOIN ... ON l.k = r.k AND l.t >= r.t``).

    Right-side columns (everything except ``on`` + ``right_time``) are
    carried onto the left rows; ``right_time`` itself is kept too. Left rows
    with no prior right row get NULLs (``how='left'``) or are dropped
    (``how='inner'``).

    Ties inside the right side on (key, time) resolve to the row last in
    the union sort — give the right side unique timestamps per key (or
    pre-aggregate) for fully deterministic output.
    """
    if how not in ("left", "inner"):
        raise ValueError("as_of_join supports how='left' or 'inner'")
    right_payload = [c for c in right.columns if c not in on]
    overlap = set(right_payload) & set(left.columns)
    if overlap:
        raise ValueError(
            f"right-side columns {sorted(overlap)} collide with left columns; "
            "rename before joining"
        )

    # Tag and union: right rows sort before left rows at equal timestamps so
    # an exact-time right row is visible to the left row (ASOF >= semantics).
    l_tagged = left.select(
        *on,
        F.col(left_time).alias("_t"),
        F.lit(1).alias("_side"),
        *[F.col(c) for c in left.columns if c not in on],
        *[F.lit(None).cast(right.schema[c].dataType).alias(c) for c in right_payload],
    )
    r_tagged = right.select(
        *on,
        F.col(right_time).alias("_t"),
        F.lit(0).alias("_side"),
        *[
            F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in left.columns
            if c not in on
        ],
        *[F.col(c) for c in right_payload],
    )
    combined = l_tagged.unionByName(r_tagged)

    w = (
        Window.partitionBy(*on)
        .orderBy("_t", "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = combined.select(
        *on,
        "_side",
        *[F.col(c) for c in left.columns if c not in on],
        *[F.last(c, ignorenulls=True).over(w).alias(c) for c in right_payload],
    )
    out = carried.filter(F.col("_side") == 1).drop("_side")
    if how == "inner":
        out = out.filter(F.col(right_time).isNotNull())
    return out


def as_of_join_cogroup(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_time: str,
    right_time: str,
    num_buckets: int = 64,
) -> DataFrame:
    """The two-sided Arrow extension surface: ``as_of_join`` re-expressed
    as ``cogroup(...).applyInPandas`` with ``pd.merge_asof``.

    Row-identical to ``as_of_join`` (left semantics; certified by sharing
    its DuckDB oracle in queries_analytics), and deliberately NOT the hot
    path — the union+window form stays pure Catalyst. This exists to prove
    the escape hatch a user needs when per-key logic outgrows the
    expression language (bespoke alignment rules, model scoring over
    aligned pairs).

    Scale design: cogrouping directly on ``on`` would invoke Python once
    per key — at 10^8 keys that is 10^8 Arrow batches and the per-call
    overhead, not the merge, dominates. Instead both sides cogroup on a
    hash BUCKET of the key (``num_buckets`` fixed, so Python-call count is
    bounded and independent of key cardinality) and ``merge_asof(by=on)``
    does the per-key alignment vectorized in C inside each bucket. One
    shuffle per side either way; ties on (key, time) resolve identically
    because the bucket-wide stable sort preserves each key's relative row
    order. A bucket's two sides must fit in one worker's memory — size
    ``num_buckets`` to rows/num_buckets ≈ a few million rows. Time columns
    must be non-null (nulls would poison merge_asof's sort contract);
    right-side payload columns get NULL for unmatched lefts."""
    import pandas as pd
    from pyspark.sql.types import StructType

    right_payload = [c for c in right.columns if c not in on]
    overlap = set(right_payload) & set(left.columns)
    if overlap:
        raise ValueError(
            f"right-side columns {sorted(overlap)} collide with left columns; "
            "rename before joining"
        )
    out_schema = StructType(
        list(left.schema.fields) + [right.schema[c] for c in right_payload]
    )
    out_cols = [f.name for f in out_schema.fields]

    # When both sides share lineage (e.g. two filters of one scan), the
    # right side's key attributes carry the SAME exprIds as the left's and
    # Spark's self-cogroup dedup prunes them from the right Arrow frame.
    # Re-aliasing the right keys mints fresh attributes so they survive;
    # the pandas side renames them back before merge_asof(by=...).
    key_alias = {c: f"_k{i}" for i, c in enumerate(on)}
    r_keyed = right.select(
        *[F.col(c).alias(key_alias[c]) for c in on],
        *[F.col(c) for c in right_payload],
    )
    l_bucket = F.pmod(F.xxhash64(*on), F.lit(num_buckets))
    r_bucket = F.pmod(
        F.xxhash64(*[key_alias[c] for c in on]), F.lit(num_buckets)
    )

    def merge(l_pdf: pd.DataFrame, r_pdf: pd.DataFrame) -> pd.DataFrame:
        l_pdf = l_pdf.drop(columns=["_b"])
        if len(l_pdf) == 0:
            return pd.DataFrame(columns=out_cols)
        l_sorted = l_pdf.sort_values(left_time, kind="mergesort")
        if len(r_pdf) == 0:
            out = l_sorted.copy()
            for c in right_payload:
                out[c] = None
            return out[out_cols]
        r_sorted = (
            r_pdf.drop(columns=["_b"])
            .rename(columns={v: k for k, v in key_alias.items()})
            .sort_values(right_time, kind="mergesort")
        )
        return pd.merge_asof(
            l_sorted, r_sorted, left_on=left_time, right_on=right_time,
            by=list(on), direction="backward",
        )[out_cols]

    return (
        left.withColumn("_b", l_bucket)
        .groupBy("_b")
        .cogroup(r_keyed.withColumn("_b", r_bucket).groupBy("_b"))
        .applyInPandas(merge, out_schema)
    )


def interval_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_time: str,
    right_time: str,
    lower: str,
    upper: str,
) -> DataFrame:
    """Banded interval join: all (left, right) pairs with the same ``on``
    keys and ``right_time`` in ``[left_time - lower, left_time + upper]``.

    NOT executed as a range join (Catalyst would plan the pure range
    condition as a nested loop, or explode per-key when keys are hot).
    Instead the classic banding rewrite: time is bucketed into
    ``width = lower + upper`` bands; a right row can only match left rows
    whose band is its own or one of its two neighbors, so the right side
    is replicated to <= 3 bands and the join becomes a plain EQUI-join on
    (keys..., band) with the exact interval predicate applied after. At
    100 TB: one hash shuffle on (key, band), ~3x replication of the
    smaller side, zero nested loops — cost scales with matches, not with
    |key group|^2.
    """
    width_us = _interval_us(lower) + _interval_us(upper)
    if width_us <= 0:
        raise ValueError("interval_join needs lower + upper > 0")
    l_us = F.unix_micros(F.col(left_time))
    r_us = F.unix_micros(F.col(right_time))

    l = left.withColumn("_band", F.floor(l_us / F.lit(width_us)))
    r = right.withColumn(
        "_band",
        F.explode(
            F.array(
                *[F.floor(r_us / F.lit(width_us)) + F.lit(d) for d in (-1, 0, 1)]
            )
        ),
    )
    lo_us, up_us = _interval_us(lower), _interval_us(upper)
    cond = (
        F.unix_micros(F.col(right_time)) >= F.unix_micros(F.col(left_time)) - F.lit(lo_us)
    ) & (
        F.unix_micros(F.col(right_time)) <= F.unix_micros(F.col(left_time)) + F.lit(up_us)
    )
    return l.join(r, [*on, "_band"]).filter(cond).drop("_band")


def _interval_us(spec: str) -> int:
    amount, unit = spec.split()
    unit_us = {
        "second": 1_000_000,
        "seconds": 1_000_000,
        "minute": 60_000_000,
        "minutes": 60_000_000,
        "hour": 3_600_000_000,
        "hours": 3_600_000_000,
        "day": 86_400_000_000,
        "days": 86_400_000_000,
    }[unit]
    return int(amount) * unit_us


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the probe side salted over ``salt`` buckets and the
    build side replicated ``salt`` times — turns one hot key's single
    straggler task into ``salt`` parallel tasks.

    Semantically identical to ``left.join(right, on, how)`` for 1:N joins
    (``right`` unique per key). The salt column is deterministic
    (``pmod(hash(id-ish row), salt)`` via ``monotonically_increasing_id`` is
    NOT used — we hash the whole left row's key + a per-row random-free
    component ``spark_partition_id`` + row position is unstable, so we use
    ``pmod(hash(<all left columns>), salt)``, stable for a given row
    content).

    Relationship to AQE's skew-join (certified in
    tests/test_joins.py::test_aqe_skew_join_splits_and_preserves_semantics):
    ``spark.sql.adaptive.skewJoin`` splits the hot shuffle partition at
    runtime with zero code change, and is the first choice for a BARE
    sort-merge join. But OptimizeSkewedJoin declines whenever the join
    output must keep its hash distribution — e.g. a groupBy on the join
    key directly downstream, the common agg-after-join pipeline shape —
    because splitting would break the required partitioning (unless
    ``forceOptimizeSkewedJoin`` buys it back with an extra shuffle).
    Manual salting stays the predictable path there: the salt is part of
    the join key, so the split survives into any downstream distribution
    at the cost of replicating the build side ``salt`` times."""
    salt_col = F.pmod(F.hash(*[F.col(c) for c in left.columns]), F.lit(salt))
    l = left.withColumn("_salt", salt_col)
    r = right.withColumn("_salt", F.explode(F.array(*[F.lit(i) for i in range(salt)])))
    return l.join(r, [on, "_salt"], how).drop("_salt")
