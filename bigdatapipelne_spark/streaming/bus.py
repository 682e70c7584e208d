"""Pluggable stream-bus seam (round-5 verdict item 4).

The reference ingests from a managed bus — Kinesis in the generator
(generator_app/app.py:41-46), Firehose landing
(ddk_app/custom/historical.py:259-262) and the Flink DDL's kinesis
connector (flink_app/app.py:47-67) — while this sandbox has no bus, so
every certified pipeline streams files. This module makes the source/sink
choice a CONFIG VALUE instead of baked-in code: a ``SourceBundle`` /
``SinkBundle`` names the format and carries its options verbatim, and the
pipelines (streaming/fraud.py, streaming/landing.py) accept one.

Semantics a production flip relies on:

- **File formats** (json/parquet/csv/text/orc/avro) need an explicit
  schema and a path; rows arrive already typed.
- **Bus formats** (kafka/kinesis/...) load with their options untouched
  and arrive as an envelope with a binary payload column (``value`` for
  kafka, ``data`` for the kinesis connectors); ``decode_payload`` turns
  that into the SAME typed rows the file path produces — one shared,
  schema-checked decode, so the downstream plan (watermark, window, agg)
  is literally the same DataFrame lineage either way. The contract test
  (tests/test_bus.py) drives the decode against a synthetic kafka-wire
  frame and asserts column-for-column equality with the file source's
  schema.
- **Sinks** mirror it: file sinks write typed rows; bus sinks get the
  rows re-encoded as a JSON ``value`` (``encode_payload``), the shape
  ``writeStream.format("kafka")`` requires.

The bus jars aren't in the sandbox, so ``open_stream`` on a kafka bundle
fails only at ``.load()`` with Spark's own missing-data-source error —
nothing here needs to change, which is the point of the seam.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

# Formats whose streaming source is a typed file scan (schema required).
FILE_FORMATS = {"json", "parquet", "csv", "text", "orc", "avro"}

# Bus envelope payload column per format family. Spark's kafka source
# exposes key/value binary columns; the kinesis connectors (e.g.
# spark-sql-kinesis, Glue's) expose `data`.
PAYLOAD_COLUMN = {"kafka": "value", "kinesis": "data"}


@dataclass(frozen=True)
class SourceBundle:
    """Where a streaming pipeline reads from. ``options`` pass through to
    the DataStreamReader untouched (kafka.bootstrap.servers, subscribe,
    startingOffsets/TRIM_HORIZON analogs, maxFilesPerTrigger, ...)."""

    fmt: str
    path: str | None = None  # file formats only
    schema: StructType | None = None  # required for file + payload decode
    options: dict[str, str] = field(default_factory=dict)
    payload_format: str = "json"  # bus payload encoding (json today)


@dataclass(frozen=True)
class SinkBundle:
    """Where a streaming pipeline writes to. File sinks write typed rows
    under ``path``; bus sinks re-encode rows as a JSON ``value``."""

    fmt: str
    path: str | None = None
    options: dict[str, str] = field(default_factory=dict)
    partition_by: tuple[str, ...] = ()


def file_source(
    path: str,
    schema: StructType,
    fmt: str = "json",
    max_files_per_trigger: int | None = None,
) -> SourceBundle:
    """The sandbox/test default: a file-stream bundle."""
    opts = {}
    if max_files_per_trigger is not None:
        opts["maxFilesPerTrigger"] = str(max_files_per_trigger)
    return SourceBundle(fmt=fmt, path=path, schema=schema, options=opts)


def decode_payload(
    raw: DataFrame, schema: StructType, fmt: str, payload_format: str = "json"
) -> DataFrame:
    """Bus envelope -> typed rows, the shared decode both the contract
    test and a production flip exercise. The payload column is parsed
    against the DECLARED schema (never inference — the Flink-DDL
    discipline); a malformed record yields a row whose columns all come
    out NULL, the PERMISSIVE analog, in BOTH branches.

    - ``json``: ``from_json`` over the binary column cast to string —
      whole-stage-codegen JVM path.
    - ``avro``: the spec-level binary record decode in
      ``streaming/avro_codec.py`` (the sandbox has neither the spark-avro
      SQL jar nor a Python avro package), Arrow-batched via
      ``mapInPandas`` so decode cost stays off the per-row JVM<->Python
      boundary. Works on streaming DataFrames (mapInPandas is
      streaming-supported)."""
    col = PAYLOAD_COLUMN.get(fmt, "value")
    if payload_format == "json":
        return raw.select(
            F.from_json(F.col(col).cast("string"), schema).alias("r")
        ).select("r.*")
    if payload_format != "avro":
        raise NotImplementedError(f"payload_format={payload_format!r}")

    from bigdatapipelne_spark.streaming.avro_codec import (
        AvroDecodeError,
        decode_record,
    )

    n_fields = len(schema.fields)
    names = [f.name for f in schema.fields]

    def batches(it):
        import pandas as pd

        for pdf in it:
            rows = []
            for buf in pdf[col]:
                try:
                    rows.append(decode_record(bytes(buf), schema))
                except (AvroDecodeError, TypeError):
                    rows.append((None,) * n_fields)
            yield pd.DataFrame(rows, columns=names)

    return raw.select(col).mapInPandas(batches, schema)


def encode_payload(
    df: DataFrame, key_col: str | None = None, payload_format: str = "json"
) -> DataFrame:
    """Typed rows -> bus wire shape: a ``value`` payload plus optional
    ``key`` (kafka's partitioning key / kinesis' partitionKey). JSON via
    ``to_json`` (codegen); avro via the spec-level binary record encoder,
    Arrow-batched."""
    if payload_format == "json":
        cols = [F.to_json(F.struct(*df.columns)).alias("value")]
        if key_col is not None:
            cols.insert(0, F.col(key_col).cast("string").alias("key"))
        return df.select(*cols)
    if payload_format != "avro":
        raise NotImplementedError(f"payload_format={payload_format!r}")

    from bigdatapipelne_spark.streaming.avro_codec import encode_record

    schema = df.schema
    names = list(df.columns)
    out_schema = (
        ("key string, " if key_col is not None else "") + "value binary"
    )

    def batches(it):
        import pandas as pd

        for pdf in it:
            # object-cast so a NULL in a numeric column stays None, not
            # the NaN float pandas widens it to
            cells = pdf[names].astype(object).where(pdf[names].notna(), None)
            vals = [
                encode_record(tuple(row), schema)
                for row in cells.itertuples(index=False, name=None)
            ]
            out = {"value": vals}
            if key_col is not None:
                # NULL keys must stay NULL (the JSON branch's cast('string')
                # semantics) — astype(str) would render them as the literal
                # string 'None' and silently change bus partitioning.
                # Vectorized: nullable-string cast, then mask NA back to None.
                keys = pdf[key_col].astype("string")
                keys = keys.where(keys.notna(), None).astype(object)
                out = {"key": keys, "value": vals}
            yield pd.DataFrame(out)

    return df.mapInPandas(batches, out_schema)


def open_stream(spark: SparkSession, bundle: SourceBundle) -> DataFrame:
    """S11 through the seam: a typed streaming DataFrame from any bundle.
    File bundles scan ``path`` with the explicit schema; bus bundles load
    with their options verbatim and decode the payload column."""
    reader = spark.readStream.format(bundle.fmt)
    for k, v in bundle.options.items():
        reader = reader.option(k, v)
    if bundle.fmt in FILE_FORMATS:
        if bundle.schema is None or bundle.path is None:
            raise ValueError("file-format SourceBundle needs schema and path")
        import os

        path = bundle.path
        if os.path.isfile(path):
            # file-stream sources reject a bare file path; a glob matching
            # exactly that file keeps the parent as basePath
            path = f"{path[:-1]}[{path[-1]}]"
        return reader.schema(bundle.schema).load(path)
    raw = reader.load()
    if bundle.schema is not None:
        return decode_payload(raw, bundle.schema, bundle.fmt, bundle.payload_format)
    return raw


def open_sink(sdf: DataFrame, bundle: SinkBundle, checkpoint_path: str):
    """A configured DataStreamWriter for any bundle (caller sets trigger /
    outputMode and starts). Bus sinks re-encode rows to the wire shape."""
    out = sdf
    if bundle.fmt not in FILE_FORMATS:
        out = encode_payload(sdf)
    writer = out.writeStream.format(bundle.fmt).option(
        "checkpointLocation", checkpoint_path
    )
    if bundle.path is not None:
        writer = writer.option("path", bundle.path)
    for k, v in bundle.options.items():
        writer = writer.option(k, v)
    if bundle.partition_by:
        writer = writer.partitionBy(*bundle.partition_by)
    return writer
