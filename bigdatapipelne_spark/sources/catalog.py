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
session; ``persistent_session`` builds a warehouse-backed Hive-catalog
session instead, so the same calls persist across sessions/JVM restarts
(proved by tests/test_catalog.py, which registers in one subprocess and
reads back in a fresh one) — the crawler-populated-catalog behavior of
the reference (historical.py:312-353) without any service dependency.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def persistent_session(
    app: str,
    warehouse_dir: str,
    metastore_dir: str,
    master: str = "local[2]",
) -> SparkSession:
    """SparkSession whose catalog survives process restarts: Hive catalog
    implementation with an embedded Derby metastore at ``metastore_dir``
    and table data under ``warehouse_dir``. Any two processes pointing at
    the same pair see the same tables (one at a time — embedded Derby is
    single-writer; use a networked metastore for concurrent jobs at
    scale, the Spark-side API is unchanged)."""
    return (
        SparkSession.builder.master(master)
        .appName(app)
        .config("spark.sql.warehouse.dir", warehouse_dir)
        .config(
            "spark.hadoop.javax.jdo.option.ConnectionURL",
            f"jdbc:derby:;databaseName={metastore_dir};create=true",
        )
        .enableHiveSupport()
        .getOrCreate()
    )


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
