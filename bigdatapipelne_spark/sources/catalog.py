"""Catalog registration (S10 — crawler parity).

The reference crawls raw/stage prefixes into a Glue Data Catalog database
(ddk_app/custom/historical.py:312-353); tables are then addressed by name
from both Glue jobs. Natively that's Spark catalog registration:

- ``register_parquet_table``: ``CREATE TABLE ... USING parquet LOCATION`` —
  an *external* table over existing files, exactly what a crawler produces
  (schema inferred from the footer, data stays in place, partitions
  discoverable via ``MSCK REPAIR TABLE``).
- ``register_view``: session temp view (lightweight, test-scoped).

With the default in-memory catalog these registrations live for the
session; point ``spark.sql.catalogImplementation`` at a Hive metastore (or
a Delta/Iceberg catalog) in production and the same calls persist across
sessions — the API surface is identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def _quote(name: str) -> str:
    return ".".join(f"`{part}`" for part in name.split("."))


def register_parquet_table(
    spark: SparkSession,
    path: str,
    name: str,
    partitioned_by: list[str] | None = None,
) -> None:
    """Register an external parquet table over ``path`` (crawler parity).

    For Hive-partitioned layouts pass ``partitioned_by`` and the partitions
    are discovered from the directory structure (the reference's crawler
    does the same walk, historical.py:323-337)."""
    spark.sql(f"DROP TABLE IF EXISTS {_quote(name)}")
    spark.sql(f"CREATE TABLE {_quote(name)} USING parquet LOCATION '{path}'")
    if partitioned_by:
        spark.sql(f"MSCK REPAIR TABLE {_quote(name)}")


def register_view(spark: SparkSession, df: DataFrame, name: str) -> None:
    """Session temp view (the lightweight registration used by tests and
    the oracle harness)."""
    df.createOrReplaceTempView(name)


def drop_table(spark: SparkSession, name: str) -> None:
    spark.sql(f"DROP TABLE IF EXISTS {_quote(name)}")
