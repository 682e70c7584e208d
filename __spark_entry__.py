"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship medallion rollup at sf0.001;
``queries()`` / ``oracle_sql()`` expose every implemented operator from
SURVEY.md §2 (plus the north-star extensions) for the duckdb correctness
gate at sf0.01. Implementations live in ``bigdatapipelne_spark``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bigdatapipelne_spark.queries import ORACLE, QUERIES, finalize_registry  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the reference's one real
    analytical question — the spec-mart rollup (SURVEY.md §3.1)."""
    return QUERIES["spec_rollup"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2, gate-priority
    order (the driver records correctness for the first 50)."""
    finalize_registry()
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalent for each query (keys without an
    oracle get the driver's weaker rows-only check)."""
    finalize_registry()
    return dict(ORACLE)
