"""Declarative data-quality expectations: a rule set evaluated against a
DataFrame, producing one violations row per rule.

The reference's only quality surface is bad-RECORD capture at parse time
(glue_scripts/stage.py's from_catalog read drops malformed JSON — our
sources/io.py S5 path); it has nothing for semantic validity of parsed
rows. This is the standard contract-check layer (dbt tests /
Deequ-style) a 100 TB pipeline runs before publishing a table.

Scale design: every ROW-LEVEL rule (not_null, accepted_values, in_range,
matches_regex, custom predicate) compiles to a conditional count inside
ONE global aggregate — a single scan of the table, map-side partial, no
shuffle beyond the 1-row combine, no matter how many rules. Rules that
are irreducibly relational cost one extra aggregation each: ``unique``
is a groupBy on the key columns (one shuffle), ``referential`` is a
left-anti join against the referenced keys (broadcast when the dimension
is small). Results are tiny (one row per rule) and union cheaply.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Expectation:
    """One rule. ``kind`` picks the check; ``column`` is the checked
    column (or comma-joined columns for ``unique``); ``params`` carries
    the per-kind arguments (values / lo / hi / pattern / ref)."""

    kind: str
    column: str
    params: dict[str, Any] = field(default_factory=dict)

    @property
    def name(self) -> str:
        return f"{self.kind}:{self.column}"


def not_null(column: str) -> Expectation:
    return Expectation("not_null", column)


def accepted_values(column: str, values: list) -> Expectation:
    return Expectation("accepted_values", column, {"values": list(values)})


def in_range(column: str, lo, hi) -> Expectation:
    """Violated when the value is outside [lo, hi] or NULL-unsafe checks
    fail; NULLs are NOT range violations (add not_null separately)."""
    return Expectation("in_range", column, {"lo": lo, "hi": hi})


def matches_regex(column: str, pattern: str) -> Expectation:
    return Expectation("matches_regex", column, {"pattern": pattern})


def satisfies(column: str, predicate_sql: str) -> Expectation:
    """Escape hatch: a boolean SQL expression over the row; violated when
    it evaluates to FALSE or NULL."""
    return Expectation("satisfies", column, {"predicate": predicate_sql})


def unique(columns: list[str]) -> Expectation:
    return Expectation("unique", ",".join(columns))


def referential(column: str, ref: DataFrame, ref_column: str) -> Expectation:
    """Every non-null value of ``column`` must exist in ``ref.ref_column``."""
    return Expectation("referential", column, {"ref": ref, "ref_column": ref_column})


def _row_violation(e: Expectation) -> Column:
    c = F.col(e.column)
    if e.kind == "not_null":
        return c.isNull()
    if e.kind == "accepted_values":
        return c.isNotNull() & ~c.isin(e.params["values"])
    if e.kind == "in_range":
        return c.isNotNull() & ~c.between(e.params["lo"], e.params["hi"])
    if e.kind == "matches_regex":
        return c.isNotNull() & ~c.rlike(e.params["pattern"])
    if e.kind == "satisfies":
        return ~F.coalesce(F.expr(e.params["predicate"]), F.lit(False))
    raise ValueError(f"not a row-level expectation: {e.kind}")


def check_expectations(df: DataFrame, rules: list[Expectation]) -> DataFrame:
    """Evaluate ``rules`` against ``df``; returns one row per rule:
    (expectation, kind, violations, total, passed). Row-level rules share
    one aggregate/scan; unique and referential each add one aggregation."""
    row_rules = [r for r in rules if r.kind not in ("unique", "referential")]
    total = F.count(F.lit(1)).cast("bigint")
    # ONE total-count frame shared by every relational rule: the identical
    # 1-row aggregate subplans are eligible for AQE stage reuse at runtime
    # (static planning still shows one count-only scan per use)
    totals = df.agg(total.alias("total"))

    parts: list[DataFrame] = []
    if row_rules:
        aggs = [
            F.sum(_row_violation(r).cast("bigint")).alias(f"_v{i}")
            for i, r in enumerate(row_rules)
        ]
        wide = df.agg(*aggs, total.alias("_n"))
        # one scan -> one wide row; unpivot to the per-rule shape
        stacked = wide.select(
            F.explode(
                F.array(*[
                    F.struct(
                        F.lit(r.name).alias("expectation"),
                        F.lit(r.kind).alias("kind"),
                        F.coalesce(F.col(f"_v{i}"), F.lit(0)).alias("violations"),
                        F.col("_n").alias("total"),
                    )
                    for i, r in enumerate(row_rules)
                ])
            ).alias("s")
        ).select("s.*")
        parts.append(stacked)

    for r in rules:
        if r.kind == "unique":
            cols = r.column.split(",")
            dup = (
                df.groupBy(*cols)
                .agg(F.count(F.lit(1)).alias("_c"))
                .filter(F.col("_c") > 1)
                .agg(
                    F.coalesce(F.sum("_c"), F.lit(0)).cast("bigint")
                    .alias("violations")
                )
            )
            parts.append(
                dup.crossJoin(totals).select(
                    F.lit(r.name).alias("expectation"),
                    F.lit(r.kind).alias("kind"),
                    "violations",
                    "total",
                )
            )
        elif r.kind == "referential":
            ref = r.params["ref"].select(
                F.col(r.params["ref_column"]).alias(r.column)
            ).distinct()
            orphans = (
                df.filter(F.col(r.column).isNotNull())
                .join(ref, on=r.column, how="left_anti")
                .agg(F.count(F.lit(1)).cast("bigint").alias("violations"))
            )
            parts.append(
                orphans.crossJoin(totals).select(
                    F.lit(r.name).alias("expectation"),
                    F.lit(r.kind).alias("kind"),
                    "violations",
                    "total",
                )
            )

    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.withColumn("passed", F.col("violations") == 0)
