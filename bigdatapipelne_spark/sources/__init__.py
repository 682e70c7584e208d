"""Source / sink connectors (SURVEY.md §2.1)."""

from bigdatapipelne_spark.sources.io import (
    read_json,
    read_parquet,
    write_json_partitioned,
    write_parquet_partitioned,
)
from bigdatapipelne_spark.sources.testdata import TABLES, load_table, load_tables

__all__ = [
    "read_json",
    "read_parquet",
    "write_json_partitioned",
    "write_parquet_partitioned",
    "TABLES",
    "load_table",
    "load_tables",
]
