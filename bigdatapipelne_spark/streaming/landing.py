"""Raw-landing streaming job (SURVEY.md §2.1 S1/S2/S4/S5): stream ->
buffered, newline-delimited, gzip JSON files, Hive-partitioned.

Reference behavior being reproduced (ddk_app/custom/historical.py:204-270):
Firehose buffers the Kinesis stream (900 s / 128 MB), JQ-extracts the
``estado`` partition value from the nested JSON, appends a newline per
record, GZIPs, and writes ``raw/estado=<uf>/...``. Natively:

- the buffer boundary is the micro-batch trigger (W8):
  ``processingTime='900 seconds'`` in production, ``availableNow`` in tests
  and backfills;
- partition extraction is a ``withColumn`` from the nested path (S3);
- newline-delimited + gzip is Spark's JSON writer with
  ``option('compression','gzip')`` (S4);
- dynamic partitioning is ``partitionBy`` (S5) — malformed *inbound*
  records are captured at read time by ``sources.io.read_json``'s
  corrupt-record handling (the Firehose ``error/`` prefix analog).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def extract_partition(df: DataFrame, source_path: str, alias: str) -> DataFrame:
    """S3 (Firehose MetadataExtraction parity): pull the partition value out
    of a nested column, e.g. ``localizacao.estado`` -> ``estado``
    (historical.py:232-245)."""
    return df.withColumn(alias, F.col(source_path))


def land_raw_stream(
    sdf: DataFrame,
    out_path: str,
    checkpoint_path: str,
    partition_by: list[str] | None = None,
    compression: str = "gzip",
    processing_interval: str | None = None,
    sink=None,
) -> None:
    """Drain (or continuously run) a stream into newline-delimited JSON
    files. ``processing_interval=None`` uses availableNow (drain-and-stop,
    the test/backfill mode); pass ``'900 seconds'`` for the reference's
    Firehose buffer cadence.

    The sink goes through the streaming/bus.py seam: the default is the
    gzip-JSON file bundle the Firehose parity story needs; a production
    deployment passes ``sink=SinkBundle(fmt="kafka", options={...})`` and
    the rows are re-encoded to the bus wire shape."""
    from bigdatapipelne_spark.streaming import bus

    if sink is None:
        sink = bus.SinkBundle(
            fmt="json",
            path=out_path,
            options={"compression": compression},
            partition_by=tuple(partition_by or ()),
        )
    writer = bus.open_sink(sdf, sink, checkpoint_path).outputMode("append")
    if processing_interval is None:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
    else:
        writer.trigger(processingTime=processing_interval).start()
