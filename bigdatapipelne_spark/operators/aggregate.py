"""Aggregation operators (SURVEY.md §2.3, A1-A2).

The reference's only bespoke dataflow code is ``sparkAggregate``
(glue_scripts/spec.py:11-22): a generic string-named group-by aggregator,
``getattr(functions, func)(column)`` over ``groupBy(*groups)``, with a
global-aggregation fallback when ``groups == []``. ``group_agg`` keeps that
exact contract.

Scale notes: ``groupBy().agg()`` compiles to HashAggregateExec with
partial (map-side) + final aggregation, so the shuffle carries one row per
(partition, group) — the only safe shape at 100 TB. No ``collect`` anywhere.

``exact_sum`` addresses double-summation nondeterminism: floating-point
addition is not associative, so a 1000-executor sum of doubles is not
bit-reproducible run-to-run. Money columns are summed as DECIMAL(18,2)
(exact, order-independent) and only then cast back to double.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def group_agg(
    df: DataFrame,
    groups: list[str],
    aggs: list[tuple[str, str] | Column],
    aliases: list[str] | None = None,
) -> DataFrame:
    """Generic group-by aggregation with the reference's A1 contract.

    ``aggs`` entries are either ``(column, func_name)`` pairs — where
    ``func_name`` is any ``pyspark.sql.functions`` aggregate (``sum``,
    ``avg``, ``count``, ``max``...), the reference's string-dispatch
    contract — or ready-made aggregate ``Column``s (e.g. ``exact_sum``) for
    the engine's deterministic aggregates. ``groups == []`` produces a
    global aggregate — the reference's explicit fallback branch
    (glue_scripts/spec.py:19-21).
    """
    exprs: list[Column] = []
    for i, spec in enumerate(aggs):
        if isinstance(spec, Column):
            expr = spec
        else:
            column, func_name = spec
            expr = getattr(F, func_name)(column)
        if aliases is not None:
            expr = expr.alias(aliases[i])
        exprs.append(expr)
    if groups:
        return df.groupBy(*groups).agg(*exprs)
    return df.agg(*exprs)


def exact_sum(col: str | Column, alias: str, scale: int = 2) -> Column:
    """Order-independent sum of a money-like double column.

    Casting to DECIMAL(18, scale) first makes the sum exact regardless of
    partial-aggregation order (cluster-size independent), then we surface a
    double for a stable, engine-neutral result schema.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal(18,{scale})")).cast("double").alias(alias)


def exact_avg(col: str | Column, alias: str, scale: int = 2) -> Column:
    """Deterministic mean: exact decimal sum divided by exact count, the
    division done once in double space (identical in any engine)."""
    c = F.col(col) if isinstance(col, str) else col
    return (
        F.sum(c.cast(f"decimal(18,{scale})")).cast("double")
        / F.count(c).cast("double")
    ).alias(alias)
