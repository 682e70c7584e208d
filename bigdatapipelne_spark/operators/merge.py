"""Batch MERGE INTO semantics over plain DataFrames: the warehouse
upsert/update/delete primitive (ANSI MERGE / Delta-Iceberg MERGE INTO)
expressed as ONE full-outer join — no table format required.

Complements the serving-store paths: ``serving.upsert_batch`` is
last-writer-wins by key (the DynamoDB analog); this is the general form —
conditional updates that can reference BOTH sides, a matched-delete
predicate, and typed insert mappings — the thing you reach for when
maintaining a published dimension/fact from a change batch.

Scale design: exactly one shuffle (the full-outer hash join on the merge
keys; broadcast if the batch side is small), then a codegen projection
per branch. The optional source-uniqueness guard is a window count that
``raise_error``s on violation — ANSI MERGE's "multiple source rows match"
error, enforced distributed, no collect.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def merge_into(
    target: DataFrame,
    source: DataFrame,
    on: list[str],
    matched_update: dict[str, Column] | None = None,
    matched_delete: Column | None = None,
    not_matched_insert: dict[str, Column] | None = None,
    strict_keys: bool = True,
) -> DataFrame:
    """Merge ``source`` into ``target`` by the ``on`` keys; returns the
    new target (same schema/column order as ``target``).

    - ``matched_update``: target-column -> expression over the aliased
      sides ``t`` / ``s`` (e.g. ``F.col("t.bal") + F.col("s.delta")``);
      unlisted columns keep their target values.
    - ``matched_delete``: boolean expression over ``t``/``s``; matched
      rows where it holds are dropped (evaluated BEFORE update, like
      WHEN MATCHED AND <cond> THEN DELETE).
    - ``not_matched_insert``: target-column -> expression over ``s`` for
      source-only keys; None disables inserts (source-only rows ignored).
    - ``strict_keys``: raise at execution when source has duplicate keys
      (ANSI MERGE cardinality rule). Disable only if upstream dedups.
    """
    if strict_keys:
        # the guard must live in a FILTER — a projected-then-dropped column
        # would be pruned by Catalyst and the raise_error never evaluated
        w = Window.partitionBy(*on)
        guard = F.when(
            F.count(F.lit(1)).over(w) > 1,
            F.raise_error(
                F.concat(
                    F.lit("merge_into: duplicate source key ("),
                    F.concat_ws(",", *[F.col(k).cast("string") for k in on]),
                    F.lit(")"),
                )
            ).isNotNull(),
        ).otherwise(F.lit(True))
        source = source.withColumn("_g", guard).filter("_g").drop("_g")

    t = target.withColumn("_t", F.lit(True)).alias("t")
    s = source.withColumn("_s", F.lit(True)).alias("s")
    cond = [F.col(f"t.{k}").eqNullSafe(F.col(f"s.{k}")) for k in on]
    j = t.join(s, on=cond, how="full_outer")

    is_matched = F.col("t._t").isNotNull() & F.col("s._s").isNotNull()
    t_only = F.col("t._t").isNotNull() & F.col("s._s").isNull()

    if matched_delete is not None:
        j = j.filter(~(is_matched & F.coalesce(matched_delete, F.lit(False))))
    if not_matched_insert is None:
        j = j.filter(F.col("t._t").isNotNull())

    upd = matched_update or {}
    out_cols = []
    for f_ in target.schema.fields:
        c = f_.name
        tc = F.col(f"t.{c}")
        matched_val = upd[c] if c in upd else tc
        expr = F.when(is_matched, matched_val).when(t_only, tc)
        if not_matched_insert is not None:
            ins = not_matched_insert.get(c, F.lit(None))
            expr = expr.otherwise(ins.cast(f_.dataType))
        out_cols.append(expr.cast(f_.dataType).alias(c))
    return j.select(*out_cols)


def golden_record(
    df: DataFrame,
    keys: list[str],
    order_by: list[Column],
) -> DataFrame:
    """Survivorship dedup (MDM golden record): keep exactly one row per
    key, chosen by a deterministic rule cascade — ``order_by`` is the
    priority order (e.g. completeness DESC, recency DESC, id ASC; make
    the last rule a unique column so the winner is total-ordered).

    One window shuffle on the keys; same shape as exact_duplicates'
    canonical pick but with caller-supplied survivorship rules instead of
    min-id."""
    w = Window.partitionBy(*keys).orderBy(*order_by)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
