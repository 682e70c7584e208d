"""Loaders for the driver-generated testdata (TESTDATA.md).

Tables live at ``{sf_dir}/{name}.parquet``. We read them lazily and never
cache by default — at 100 TB these are straight parquet scans and the win
comes from column pruning + predicate pushdown, not caching.
"""

from __future__ import annotations

import functools
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


@functools.lru_cache(maxsize=256)
def _timestamp_cols(path: str) -> tuple[tuple[str, str], ...]:
    """(name, unit) of every timestamp column, read once from the parquet
    footer (driver-side, no data IO). The driver regenerates testdata
    between rounds with varying units (ns in round 2, us in round 3), so
    nothing downstream may hardcode either."""
    import pyarrow.parquet as pq
    import pyarrow.types as pat

    schema = pq.read_schema(path)
    return tuple(
        (f.name, f.type.unit) for f in schema if pat.is_timestamp(f.type)
    )


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one testdata table, normalizing every timestamp column to plain
    TimestampType regardless of the file's physical unit.

    Parquet TIMESTAMP(NANOS) is unsupported by Spark's parquet reader; with
    ``spark.sql.legacy.parquet.nanosAsLong`` (runtime-settable) the column
    arrives as int64 nanoseconds and we convert to TimestampType with integer
    division (``div 1000`` — never float division, which loses precision
    above 2^53 ns). Truncation toward zero matches DuckDB's ns->us handling.

    TIMESTAMP(MICROS) files read natively — but with isAdjustedToUTC=false
    they surface as TIMESTAMP_NTZ, which functions like ``unix_micros`` and
    time-zone-aware window math reject. Cast to TimestampType: the session
    zone is pinned to UTC first, so the cast is value-preserving and every
    query sees the same type and values in every testdata generation.
    """
    path = f"{sf_dir}/{name}.parquet"
    # The caller may hand us a vanilla session (the correctness driver does);
    # pin the runtime-settable confs our semantics depend on: UTC so
    # window/unix_timestamp math is wall-clock-independent, nanosAsLong so
    # the scan accepts TIMESTAMP(NANOS) files.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    ts_cols = _timestamp_cols(path)
    if any(unit == "ns" for _, unit in ts_cols):
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    for c, unit in ts_cols:
        if unit == "ns":
            df = df.withColumn(c, F.expr(f"timestamp_micros(`{c}` div 1000)"))
        else:
            df = df.withColumn(c, F.col(c).cast("timestamp"))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load every table that exists under ``sf_dir`` and register each as a
    temp view so ``spark.sql`` works against them."""
    out: dict[str, DataFrame] = {}
    for name in TABLES:
        path = f"{sf_dir}/{name}.parquet"
        if os.path.exists(path):
            df = load_table(spark, sf_dir, name)
            df.createOrReplaceTempView(name)
            out[name] = df
    return out
