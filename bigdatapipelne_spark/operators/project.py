"""Projection / mapping operators (SURVEY.md §2.2, P1-P3).

The reference's stage job is Glue's ``ApplyMapping`` + ``unnest`` +
``DropFields`` (glue_scripts/stage.py:25-48, glue_scripts/spec.py:40-44).
Here each is a pure Catalyst projection — select/alias/cast expressions that
stay inside whole-stage codegen and let the optimizer prune parquet scans
down to the referenced columns.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StructType


def apply_mapping(df: DataFrame, mapping: list[tuple[str, str, str]]) -> DataFrame:
    """Project + rename + cast in one declarative pass.

    ``mapping`` rows are ``(source_path, target_name, target_type)`` where
    ``source_path`` may be a dotted nested path (``localizacao.cidade``) —
    parity with Glue ApplyMapping's 4-tuples (glue_scripts/stage.py:25-46),
    including the string->double casts for lat/lng (stage.py:40-41).

    Being a single ``select`` means Catalyst prunes the scan to exactly the
    referenced source columns — on a wide 100 TB table only the mapped
    columns are read off parquet.
    """
    cols: list[Column] = []
    for source, target, dtype in mapping:
        c = F.col(source)
        if dtype:
            c = c.cast(dtype)
        cols.append(c.alias(target))
    return df.select(*cols)


def flatten_structs(df: DataFrame, sep: str = "_", explode_arrays: bool = False) -> DataFrame:
    """Recursively flatten struct columns into top-level columns.

    Parity with Glue ``unnest()`` (glue_scripts/stage.py:48). Nested field
    ``a.b.c`` becomes column ``a_b_c``. Pure schema recursion producing one
    ``select`` — no data movement, no UDFs; executes as a codegen'd
    projection. Arrays are left opaque unless ``explode_arrays`` (exploding
    multiplies rows, which is a semantic choice the caller must make).
    """

    def _flatten(schema: StructType, prefix: str) -> list[Column]:
        cols: list[Column] = []
        for field in schema.fields:
            path = f"{prefix}.{field.name}" if prefix else field.name
            name = path.replace(".", sep)
            if isinstance(field.dataType, StructType):
                cols.extend(_flatten(field.dataType, path))
            else:
                cols.append(F.col(path).alias(name))
        return cols

    flat = df.select(*_flatten(df.schema, ""))
    if explode_arrays:
        for field in flat.schema.fields:
            if isinstance(field.dataType, ArrayType):
                flat = flat.withColumn(field.name, F.explode_outer(field.name))
    return flat


def drop_fields(df: DataFrame, *fields: str) -> DataFrame:
    """Drop columns (PII scrub parity: DropFields of ``nome``/``cvv`` before
    the spec aggregation, glue_scripts/spec.py:40-44). ``df.drop`` tolerates
    missing names just like Glue's DropFields."""
    return df.drop(*fields)
