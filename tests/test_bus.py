"""Contract tests for the stream-bus seam (streaming/bus.py).

The claim a production flip relies on: a file bundle and a bus bundle
produce the SAME typed rows into the same downstream plan. The bus jars
aren't in the sandbox, so the kafka/kinesis side is exercised at the wire
level — synthetic envelope frames with the connector's documented schema
— through the exact decode the streaming path uses.
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from bigdatapipelne_spark.streaming import bus
from bigdatapipelne_spark.streaming.fraud import EVENTS_SCHEMA, read_events_stream

# Spark's kafka source envelope (spark-sql-kafka docs).
KAFKA_WIRE = StructType(
    [
        StructField("key", BinaryType()),
        StructField("value", BinaryType()),
        StructField("topic", StringType()),
        StructField("partition", IntegerType()),
        StructField("offset", LongType()),
        StructField("timestamp", TimestampType()),
        StructField("timestampType", IntegerType()),
    ]
)

EVENTS = [
    {"event_id": 1, "ts": "2026-01-01T00:00:00.000Z", "user_id": 7,
     "event_type": "view", "value": 1.5, "props": "{\"k\": 3}"},
    {"event_id": 2, "ts": "2026-01-01T00:00:05.000Z", "user_id": 8,
     "event_type": "purchase", "value": 99.0, "props": "{\"k\": 4}"},
]


def _kafka_frame(spark, payloads: list[bytes]):
    rows = [
        (str(i).encode(), p, "events", 0, i, None, 0)
        for i, p in enumerate(payloads)
    ]
    return spark.createDataFrame(rows, KAFKA_WIRE)


def test_kafka_wire_decodes_to_file_source_rows(spark, tmp_path):
    """Column-for-column: decode(kafka envelope) == file-stream rows."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    payloads = [json.dumps(e).encode() for e in EVENTS]
    decoded = bus.decode_payload(
        _kafka_frame(spark, payloads), EVENTS_SCHEMA, "kafka"
    )
    assert decoded.schema == EVENTS_SCHEMA

    src_dir = tmp_path / "in"
    src_dir.mkdir()
    (src_dir / "events.json").write_text(
        "\n".join(json.dumps(e) for e in EVENTS)
    )
    sdf = read_events_stream(spark, str(src_dir), fmt="json")
    assert sdf.isStreaming and sdf.schema == EVENTS_SCHEMA
    out = tmp_path / "out"
    ck = tmp_path / "ck"
    (
        sdf.writeStream.format("parquet")
        .option("path", str(out))
        .option("checkpointLocation", str(ck))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    from_file = sorted(spark.read.parquet(str(out)).collect())
    from_bus = sorted(decoded.collect())
    assert from_bus == from_file


def test_kinesis_wire_uses_data_column(spark):
    wire = StructType(
        [
            StructField("data", BinaryType()),
            StructField("partitionKey", StringType()),
            StructField("sequenceNumber", StringType()),
        ]
    )
    frame = spark.createDataFrame(
        [(json.dumps(EVENTS[0]).encode(), "7", "1")], wire
    )
    decoded = bus.decode_payload(frame, EVENTS_SCHEMA, "kinesis")
    assert decoded.schema == EVENTS_SCHEMA
    assert decoded.first()["event_id"] == 1


def test_malformed_payload_yields_null_row_not_error(spark):
    decoded = bus.decode_payload(
        _kafka_frame(spark, [b"{not json"]), EVENTS_SCHEMA, "kafka"
    )
    row = decoded.first()
    assert all(row[f.name] is None for f in EVENTS_SCHEMA.fields)


def test_encode_decode_roundtrip(spark):
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = spark.createDataFrame(
        [(1, 7, "view", 1.5)], "event_id long, user_id long, event_type string, value double"
    )
    wire = bus.encode_payload(df, key_col="user_id")
    assert wire.columns == ["key", "value"]
    back = bus.decode_payload(
        wire.withColumn("value", F.col("value").cast("binary")),
        df.schema,
        "kafka",
    )
    assert back.collect() == df.collect()


def test_file_and_bundle_paths_share_lineage(spark, tmp_path):
    """read_events_stream(default) and an equivalent explicit bundle build
    the same streaming plan (same schema, same source relation)."""
    src_dir = tmp_path / "in"
    src_dir.mkdir()
    (src_dir / "events.json").write_text(json.dumps(EVENTS[0]))
    via_default = read_events_stream(spark, str(src_dir), fmt="json")
    via_bundle = read_events_stream(
        spark,
        str(src_dir),
        bundle=bus.file_source(str(src_dir), EVENTS_SCHEMA, "json"),
    )
    assert via_default.schema == via_bundle.schema
    assert str(via_default.printSchema) != ""  # both constructed
    # identical logical source: same format + path in the plan text
    p1 = via_default._jdf.queryExecution().logical().toString()
    p2 = via_bundle._jdf.queryExecution().logical().toString()
    assert p1 == p2


def test_kafka_bundle_fails_only_at_load(spark):
    """The seam itself accepts a kafka bundle; without the connector jar
    the failure is Spark's missing-data-source error at .load() — i.e. a
    production cluster with the jar needs NO code change here."""
    bundle = bus.SourceBundle(
        fmt="kafka",
        schema=EVENTS_SCHEMA,
        options={"kafka.bootstrap.servers": "broker:9092", "subscribe": "events"},
    )
    with pytest.raises(Exception) as ei:
        bus.open_stream(spark, bundle)
    assert "kafka" in str(ei.value).lower()


def test_open_sink_bus_format_encodes_rows(spark, tmp_path):
    df = spark.createDataFrame([(1, "a")], "id long, s string")
    # memory sink stands in for a bus: open_sink on a non-file format wraps
    # rows into the wire shape before handing to the writer
    wire = bus.encode_payload(df)
    assert wire.columns == ["value"]
    assert json.loads(wire.first()["value"]) == {"id": 1, "s": "a"}
