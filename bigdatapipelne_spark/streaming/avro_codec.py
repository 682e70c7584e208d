"""Avro binary record codec for the bus seam's ``payload_format="avro"``.

The reference's bus payloads are JSON today, but a production Kafka/Kinesis
deployment routinely ships Avro; the seam (``streaming/bus.py``) declares
``payload_format`` for exactly that flip. This sandbox has neither the
``spark-avro`` SQL connector jar (``from_avro`` raises
AVRO_NOT_LOADED_SQL_FUNCTIONS_UNUSABLE) nor a Python avro package, so the
decode is implemented directly against the PUBLIC Apache Avro 1.12
specification's binary encoding (https://avro.apache.org/docs/1.12.0/
specification/#binary-encoding):

- ``int``/``long``: zigzag-mapped varint (little-endian 7-bit groups,
  high bit = continuation);
- ``float``/``double``: IEEE-754 little-endian 4/8 bytes;
- ``boolean``: one byte 0/1;
- ``string``/``bytes``: varint byte-length prefix + UTF-8/raw bytes;
- ``null``: zero bytes;
- nullable fields: the 2-branch union ``["null", T]`` — a varint branch
  index (0 = null, 1 = value) then the value's encoding;
- a record: the concatenation of its fields' encodings in schema order.

The schema is DERIVED from the declared Spark ``StructType`` (the same
Flink-DDL discipline the JSON branch uses — never inference): long/int →
long, double/float → double, string → string, binary → bytes, boolean →
boolean, timestamp → long micros with the ``timestamp-micros`` logical
type's representation. Every field is encoded as the nullable union, which
is how Avro schemas generated from SQL DDL almost universally declare
columns.

Used Arrow-batched (``mapInPandas`` in bus.decode_payload) — the codec
itself is per-record Python, but it runs inside Arrow batches off the hot
JVM path, and bus decode is IO-bound at the consumer edge. Spec-pinned
byte-level tests live in tests/test_bus.py (zigzag vectors straight from
the Avro spec's own examples).
"""

from __future__ import annotations

import struct
from typing import Any

from pyspark.sql.types import (
    BooleanType,
    DataType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructType,
    TimestampType,
)
from pyspark.sql.types import BinaryType


class AvroDecodeError(ValueError):
    """Raised on a malformed Avro binary record (truncated varint, branch
    index out of range, length overrun). decode_payload maps it to the
    all-NULL row, mirroring the JSON branch's PERMISSIVE analog."""


# ---------------------------------------------------------------- varints


def _encode_long(n: int) -> bytes:
    """Zigzag + varint (Avro spec 'binary encoding / primitive types')."""
    z = ((n << 1) ^ (n >> 63)) & ((1 << 64) - 1)
    out = bytearray()
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _decode_long(buf: bytes, pos: int) -> tuple[int, int]:
    shift = 0
    acc = 0
    while True:
        if pos >= len(buf):
            raise AvroDecodeError("truncated varint")
        b = buf[pos]
        pos += 1
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
        if shift > 63:
            raise AvroDecodeError("varint too long")
    if acc >= 1 << 64:
        # a 10-byte varint can carry up to 70 bits; anything past the
        # zigzag-encoded int64 range must stay on the AvroDecodeError
        # (all-NULL PERMISSIVE row) path, not escape as a Python int that
        # fails Arrow conversion outside decode_payload's try
        raise AvroDecodeError("varint exceeds int64 range")
    # un-zigzag
    n = (acc >> 1) ^ -(acc & 1)
    return n, pos


# ------------------------------------------------------- per-type codecs


def _avro_kind(dt: DataType) -> str:
    if isinstance(dt, (LongType, IntegerType)):
        return "long"
    if isinstance(dt, (DoubleType, FloatType)):
        return "double"
    if isinstance(dt, StringType):
        return "string"
    if isinstance(dt, BinaryType):
        return "bytes"
    if isinstance(dt, BooleanType):
        return "boolean"
    if isinstance(dt, TimestampType):
        return "timestamp-micros"
    raise NotImplementedError(f"avro codec: unsupported Spark type {dt}")


def _encode_value(kind: str, v: Any) -> bytes:
    if kind == "long":
        return _encode_long(int(v))
    if kind == "double":
        return struct.pack("<d", float(v))
    if kind == "string":
        raw = str(v).encode("utf-8")
        return _encode_long(len(raw)) + raw
    if kind == "bytes":
        raw = bytes(v)
        return _encode_long(len(raw)) + raw
    if kind == "boolean":
        return b"\x01" if v else b"\x00"
    if kind == "timestamp-micros":
        # datetime -> epoch micros (naive values are UTC by load_table's
        # session pin); ints pass through
        if hasattr(v, "timestamp"):
            import calendar

            micros = (
                calendar.timegm(v.timetuple()) * 1_000_000 + v.microsecond
            )
        else:
            micros = int(v)
        return _encode_long(micros)
    raise NotImplementedError(kind)


def _decode_value(kind: str, buf: bytes, pos: int) -> tuple[Any, int]:
    if kind == "long":
        return _decode_long(buf, pos)
    if kind == "double":
        if pos + 8 > len(buf):
            raise AvroDecodeError("truncated double")
        return struct.unpack_from("<d", buf, pos)[0], pos + 8
    if kind in ("string", "bytes"):
        ln, pos = _decode_long(buf, pos)
        if ln < 0 or pos + ln > len(buf):
            raise AvroDecodeError("bad length")
        raw = bytes(buf[pos : pos + ln])
        pos += ln
        return (raw.decode("utf-8") if kind == "string" else raw), pos
    if kind == "boolean":
        if pos >= len(buf):
            raise AvroDecodeError("truncated boolean")
        b = buf[pos]
        if b not in (0, 1):
            raise AvroDecodeError("bad boolean byte")
        return bool(b), pos + 1
    if kind == "timestamp-micros":
        micros, pos = _decode_long(buf, pos)
        from datetime import datetime, timezone

        return (
            datetime.fromtimestamp(micros / 1_000_000, tz=timezone.utc)
            .replace(tzinfo=None),
            pos,
        )
    raise NotImplementedError(kind)


# ------------------------------------------------------------ record API


def record_kinds(schema: StructType) -> list[str]:
    """The derived per-field Avro kind list — the record 'schema'."""
    return [_avro_kind(f.dataType) for f in schema.fields]


def encode_record(values: tuple, schema: StructType) -> bytes:
    """One record -> Avro binary, every field as the ``["null", T]``
    union (branch varint 0/1 then the value)."""
    out = bytearray()
    for v, kind in zip(values, record_kinds(schema)):
        if v is None:
            out += _encode_long(0)
        else:
            out += _encode_long(1)
            out += _encode_value(kind, v)
    return bytes(out)


def decode_record(buf: bytes, schema: StructType) -> tuple:
    """Avro binary -> one record tuple. Raises AvroDecodeError on any
    malformation, INCLUDING trailing bytes (a record that doesn't consume
    the buffer was encoded against a different schema)."""
    pos = 0
    vals: list[Any] = []
    for kind in record_kinds(schema):
        branch, pos = _decode_long(buf, pos)
        if branch == 0:
            vals.append(None)
        elif branch == 1:
            v, pos = _decode_value(kind, buf, pos)
            vals.append(v)
        else:
            raise AvroDecodeError(f"union branch {branch} out of range")
    if pos != len(buf):
        raise AvroDecodeError("trailing bytes after record")
    return tuple(vals)
