"""Multimodal column plumbing: Arrow-batched metadata extraction over
binary payloads, deterministic format sniffing, and the gated decode stubs."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from bigdatapipelne_spark.operators.multimodal import (
    attach_fake_media,
    decode_image,
    extract_media_metadata,
    sample_frames,
    sniff_format,
)


def test_sniff_format_magic_numbers():
    assert sniff_format(b"\x89PNG\r\n\x1a\nrest") == "png"
    assert sniff_format(b"\xff\xd8\xff\xe0JFIF") == "jpeg"
    assert sniff_format(b"GIF89a...") == "gif"
    assert sniff_format(b"RIFF\x00\x00\x00\x00WAVEfmt") == "wav"
    assert sniff_format(b"RIFF\x00\x00\x00\x00WEBPVP8") == "webp"
    assert sniff_format(b"\x00\x00\x00\x18ftypmp42") == "mp4"
    assert sniff_format(b"plain text") == "unknown"
    assert sniff_format(b"") == "empty"
    assert sniff_format(None) == "empty"


def test_extract_media_metadata_batches(spark):
    df = spark.createDataFrame(
        [(1, "alpha beta"), (2, "gamma"), (3, "delta epsilon zeta")],
        "doc_id long, text string",
    )
    media = attach_fake_media(df, "text", media_format="png")
    out = {r.doc_id: r for r in
           extract_media_metadata(media, "doc_id", "data").collect()}

    header = b"\x89PNG\r\n\x1a\n"
    for doc_id, text in [(1, "alpha beta"), (2, "gamma"), (3, "delta epsilon zeta")]:
        payload = header + text.encode()
        assert out[doc_id].byte_len == len(payload)
        assert out[doc_id].sha256 == hashlib.sha256(payload).hexdigest()
        assert out[doc_id].format == "png"


def test_extract_media_metadata_small_arrow_batches(spark):
    """The mapInPandas path must be batch-size independent."""
    prev = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "2")
    try:
        df = spark.createDataFrame(
            [(i, f"text number {i}") for i in range(17)], "doc_id long, text string"
        )
        media = attach_fake_media(df, "text", media_format="none")
        out = extract_media_metadata(media, "doc_id", "data").collect()
        assert len(out) == 17
        assert all(r.format == "unknown" for r in out)
        assert {r.doc_id for r in out} == set(range(17))
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", prev)


def test_metadata_drops_payload_column(spark):
    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    media = attach_fake_media(df, "text")
    out = extract_media_metadata(media, "doc_id", "data")
    assert out.columns == ["doc_id", "byte_len", "sha256", "format"]


def test_decode_stubs_gated():
    with pytest.raises(NotImplementedError, match="image decode"):
        decode_image(b"\x89PNG\r\n\x1a\n")
    with pytest.raises(NotImplementedError, match="frame sampling"):
        sample_frames(b"\x00\x00\x00\x18ftyp")
