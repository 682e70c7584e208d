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

# ---------------------------------------------------------------- avro

def test_avro_zigzag_vectors_match_spec():
    """Byte-level pin against the Apache Avro 1.12 spec's own varint
    examples (specification #binary-encoding: 0->00, -1->01, 1->02,
    -2->03, 2->04, -64->7f, 64->80 01) — certifies this is real Avro
    wire format, not a private encoding."""
    from bigdatapipelne_spark.streaming.avro_codec import (
        _decode_long,
        _encode_long,
    )

    spec = {0: b"\x00", -1: b"\x01", 1: b"\x02", -2: b"\x03", 2: b"\x04",
            -64: b"\x7f", 64: b"\x80\x01"}
    for n, wire in spec.items():
        assert _encode_long(n) == wire, n
        assert _decode_long(wire, 0) == (n, len(wire)), n
    # string encoding example from the spec: "foo" -> 06 66 6f 6f
    from bigdatapipelne_spark.streaming.avro_codec import _encode_value

    assert _encode_value("string", "foo") == b"\x06foo"


def test_avro_record_roundtrip_with_nulls():
    from pyspark.sql.types import StructType

    from bigdatapipelne_spark.streaming.avro_codec import (
        decode_record,
        encode_record,
    )

    schema = StructType.fromDDL(
        "id long, name string, score double, ok boolean, blob binary"
    )
    rows = [
        (1, "alpha", 1.5, True, b"\x00\xff"),
        (-7, None, None, False, b""),
        (None, "", 0.0, None, None),
    ]
    for row in rows:
        assert decode_record(encode_record(row, schema), schema) == row


def test_avro_wire_decodes_to_file_source_rows(spark, tmp_path):
    """The avro twin of the kafka-JSON contract test: encode the events
    as Avro binary union-records, ship them through the kafka envelope,
    and assert the decode equals the file source's typed rows."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    from bigdatapipelne_spark.streaming.avro_codec import encode_record

    src_dir = tmp_path / "in"
    src_dir.mkdir()
    (src_dir / "events.json").write_text(
        "\n".join(json.dumps(e) for e in EVENTS)
    )
    typed = spark.read.schema(EVENTS_SCHEMA).json(str(src_dir))
    payloads = [
        encode_record(tuple(r), EVENTS_SCHEMA) for r in typed.collect()
    ]
    decoded = bus.decode_payload(
        _kafka_frame(spark, payloads), EVENTS_SCHEMA, "kafka",
        payload_format="avro",
    )
    assert decoded.schema == EVENTS_SCHEMA
    assert sorted(decoded.collect()) == sorted(typed.collect())


def test_avro_encode_payload_roundtrip_distributed(spark):
    """encode_payload(avro) -> decode_payload(avro) through Spark (the
    mapInPandas path both directions), keys preserved."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = spark.createDataFrame(
        [(1, 7, "view", 1.5), (2, None, "purchase", None)],
        "event_id long, user_id long, event_type string, value double",
    )
    wire = bus.encode_payload(df, key_col="event_id", payload_format="avro")
    assert wire.columns == ["key", "value"]
    assert wire.schema["value"].dataType.typeName() == "binary"
    back = bus.decode_payload(wire, df.schema, "kafka", payload_format="avro")
    assert sorted(back.collect()) == sorted(df.collect())


def test_avro_malformed_payload_yields_null_row_not_error(spark):
    """PERMISSIVE analog parity with the JSON branch: truncated varint,
    trailing garbage, and a NULL payload each decode to the all-NULL row."""
    from bigdatapipelne_spark.streaming.avro_codec import encode_record

    schema = EVENTS_SCHEMA
    good = encode_record((1, None, 7, "view", 1.5, "{}"), schema)
    frames = [b"\x80", good + b"\xff", None]
    decoded = bus.decode_payload(
        _kafka_frame(spark, frames), schema, "kafka", payload_format="avro"
    )
    rows = decoded.collect()
    assert len(rows) == 3
    for row in rows:
        assert all(row[f.name] is None for f in schema.fields)


def test_avro_timestamp_micros_roundtrip(spark):
    """timestamp fields ride the timestamp-micros logical-type encoding
    (epoch micros as a zigzag varint)."""
    import datetime as dt

    from pyspark.sql.types import StructType

    from bigdatapipelne_spark.streaming.avro_codec import (
        decode_record,
        encode_record,
    )

    schema = StructType.fromDDL("ts timestamp, v long")
    t = dt.datetime(2026, 1, 1, 0, 0, 5, 123456)
    assert decode_record(encode_record((t, 9), schema), schema) == (t, 9)


def test_avro_null_key_stays_null_in_encode_payload(spark):
    """A NULL key must encode to a NULL bus key (JSON-branch cast('string')
    parity), not the literal string 'None' — the two payload formats must
    not partition the bus differently."""
    df = spark.createDataFrame(
        [(None, "view"), (7, "purchase")], "user_id long, event_type string"
    )
    for fmt in ("json", "avro"):
        wire = bus.encode_payload(df, key_col="user_id", payload_format=fmt)
        keys = sorted(r.key for r in wire.collect() if r.key is not None)
        nulls = [r.key for r in wire.collect() if r.key is None]
        assert keys == ["7"], fmt
        assert len(nulls) == 1, fmt


def test_avro_oversized_varint_stays_on_null_row_path(spark):
    """A 10-byte varint carries up to 70 bits; values past int64 must raise
    AvroDecodeError inside decode (-> all-NULL PERMISSIVE row), not escape
    as a Python int that kills the task at Arrow conversion."""
    from bigdatapipelne_spark.streaming.avro_codec import AvroDecodeError, _decode_long

    # zigzag(2^65) — six continuation bytes of 0x80|0x7f then the tail
    big = (1 << 65) << 1
    buf = bytearray()
    z = big
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            buf.append(b | 0x80)
        else:
            buf.append(b)
            break
    with pytest.raises(AvroDecodeError):
        _decode_long(bytes(buf), 0)

    # end-to-end: the malformed frame decodes to the all-NULL row
    decoded = bus.decode_payload(
        _kafka_frame(spark, [bytes(buf) * 4]), EVENTS_SCHEMA, "kafka",
        payload_format="avro",
    )
    rows = decoded.collect()
    assert len(rows) == 1
    assert all(v is None for v in rows[0])
