"""Multimodal columns: image/audio/video as opaque ``binary`` payloads with
typed metadata (north-star scope, BASELINE.json).

Design: media never becomes a first-class engine type — it rides as a
``binary`` column plus a metadata struct, partitioned like any other column,
and the compute-heavy steps (decode, feature-extract, resize, frame-sample)
run as Arrow-batched ``mapInPandas`` stages so bytes move executor-side in
columnar batches, never row-at-a-time through the driver.

This container has no image/audio codecs, so the *decode* step is stubbed:
``decode_image``/``decode_audio`` raise ``NotImplementedError`` unless the
optional library import succeeds. Everything around the stub — schema,
Arrow batch shape, deterministic format sniffing, hashing, batch-size
accounting — is real and tested (tests/test_multimodal.py).

Scale notes: ``extract_media_metadata`` is embarrassingly parallel (no
shuffle); batch size is bounded by
``spark.sql.execution.arrow.maxRecordsPerBatch`` so a partition of large
blobs cannot OOM an executor. At 100 TB you'd keep payloads in their own
parquet column chunk (written last, read only when referenced) — column
pruning means metadata-only queries never touch the bytes.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# Magic-number table for the formats a training pipeline actually meets.
_MAGIC = (
    (b"\x89PNG\r\n\x1a\n", "png"),
    (b"\xff\xd8\xff", "jpeg"),
    (b"GIF87a", "gif"),
    (b"GIF89a", "gif"),
    (b"RIFF", "riff"),  # wav/avi/webp container; refined below
    (b"ID3", "mp3"),
    (b"\x1a\x45\xdf\xa3", "webm"),
    (b"%PDF", "pdf"),
)


def sniff_format(data: bytes | None) -> str:
    """Deterministic container sniff from magic numbers (pure function,
    usable inside any batch UDF)."""
    if not data:
        return "empty"
    for magic, name in _MAGIC:
        if data.startswith(magic):
            if name == "riff" and len(data) >= 12:
                sub = data[8:12]
                if sub == b"WAVE":
                    return "wav"
                if sub == b"WEBP":
                    return "webp"
                if sub == b"AVI ":
                    return "avi"
            return name
    if data[:4] in (b"\x00\x00\x00\x18", b"\x00\x00\x00\x20") or data[4:8] == b"ftyp":
        return "mp4"
    return "unknown"


def decode_image(data: bytes):
    """Decode an image payload to a numpy array. STUB: requires an imaging
    library this environment does not ship; the call is gated so pipelines
    degrade to metadata-only rather than crashing at import time."""
    try:
        from PIL import Image  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "image decode needs PIL/pillow, not available in this environment; "
            "metadata extraction (extract_media_metadata) works without it"
        ) from e
    import io

    from PIL import Image as _Image

    return _Image.open(io.BytesIO(data))


def decode_audio(data: bytes):
    """Decode an audio payload to samples. STUB — see decode_image."""
    try:
        import soundfile  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "audio decode needs soundfile/librosa, not available here"
        ) from e
    import io

    import soundfile as sf

    return sf.read(io.BytesIO(data))


def sample_frames(data: bytes, every_n: int = 30):
    """Frame-sample a video payload. STUB — video decode needs ffmpeg/ av,
    absent here; the Spark-side plumbing is ``mapInPandas`` identical to
    extract_media_metadata."""
    raise NotImplementedError("video frame sampling needs an ffmpeg binding")


METADATA_SCHEMA_SUFFIX = [
    StructField("byte_len", LongType()),
    StructField("sha256", StringType()),
    StructField("format", StringType()),
]


def extract_media_metadata(
    df: DataFrame, id_col: str = "doc_id", data_col: str = "data"
) -> DataFrame:
    """Arrow-batched metadata extraction over a binary media column.

    Output: (id_col, byte_len, sha256 hex, sniffed format). Runs as
    ``mapInPandas`` — one Python invocation per Arrow batch, not per row; no
    shuffle; the binary column is pruned from the output so downstream
    stages don't drag payloads along.
    """
    id_field = df.schema[id_col]
    out_schema = StructType([StructField(id_col, id_field.dataType)] + METADATA_SCHEMA_SUFFIX)

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf[data_col]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "byte_len": payloads.map(lambda b: len(b) if b is not None else 0).astype("int64"),
                    "sha256": payloads.map(
                        lambda b: hashlib.sha256(b).hexdigest() if b is not None else None
                    ),
                    "format": payloads.map(sniff_format),
                }
            )

    return df.select(id_col, data_col).mapInPandas(_extract, schema=out_schema)


def fake_decode_image(data: bytes, height: int = 8, width: int = 8, channels: int = 3):
    """DETERMINISTIC FAKE decoder (clearly not a codec): expands the
    payload's sha256 digest into an (h, w, c) uint8 pixel array by cyclic
    repetition. Stands in for ``decode_image`` so the decode →resize →
    feature plumbing is executable and byte-for-byte reproducible in this
    codec-less environment; swap in the real decoder via the ``decode=``
    hook of ``image_features`` when PIL is available."""
    import numpy as np

    digest = hashlib.sha256(data or b"").digest()  # 32 bytes
    n = height * width * channels
    flat = np.frombuffer((digest * (n // len(digest) + 1))[:n], dtype=np.uint8)
    return flat.reshape(height, width, channels)


def block_mean_resize(pixels, out_h: int = 4, out_w: int = 4):
    """Resize by block averaging (the downsample a feature pipeline uses):
    (h, w, c) -> (out_h, out_w, c) float32, each output pixel the mean of
    its input block. Pure numpy — runs inside the Arrow batch."""
    h, w, c = pixels.shape
    return (
        pixels.astype("float32")
        .reshape(out_h, h // out_h, out_w, w // out_w, c)
        .mean(axis=(1, 3))
    )


def image_features(
    df: DataFrame,
    id_col: str = "doc_id",
    data_col: str = "data",
    height: int = 8,
    width: int = 8,
    channels: int = 3,
    out_h: int = 4,
    out_w: int = 4,
    decode=None,
) -> DataFrame:
    """Decode → resize → feature-extract as ONE Arrow-batched ``mapInPandas``
    stage: per payload, per-channel means/stds plus a block-mean-resized
    flattened embedding (ready for the similarity operators).

    ``decode`` defaults to the deterministic fake; pass ``decode_image``
    (PIL) in a codec-equipped deployment — the Spark plumbing (schema,
    batch shape, no shuffle, payload pruned from output) is identical.

    Output: (id, height, width, channels, channel_means array<double>,
    channel_stds array<double>, embedding array<double> of out_h*out_w*c).
    """
    import numpy as np

    from pyspark.sql.types import ArrayType, DoubleType, IntegerType

    decode_fn = decode or (
        lambda b: fake_decode_image(b, height, width, channels)
    )
    id_field = df.schema[id_col]
    out_schema = StructType(
        [
            StructField(id_col, id_field.dataType),
            StructField("height", IntegerType()),
            StructField("width", IntegerType()),
            StructField("channels", IntegerType()),
            StructField("channel_means", ArrayType(DoubleType())),
            StructField("channel_stds", ArrayType(DoubleType())),
            StructField("embedding", ArrayType(DoubleType())),
        ]
    )

    def _featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in out_schema.fields]
        for pdf in batches:
            if len(pdf) == 0:
                yield pd.DataFrame(columns=cols)
                continue
            # Decode is inherently per payload (a real codec is too), but
            # the reductions are BATCHED: stacking the decoded batch into
            # one (N, h, w, c) array turns 3 tiny per-row numpy reductions
            # x N rows into 3 array-wide reductions — the per-row numpy
            # dispatch overhead dominated the whole stage at 500k payloads
            # (84.8s -> the batched form at the 100x corpus).
            decoded = [np.asarray(decode_fn(p)) for p in pdf[data_col]]
            if len({d.shape for d in decoded}) > 1:
                # ragged batch (a real codec with mixed image sizes):
                # per-row reductions, same columns
                rows = []
                for rid, d in zip(pdf[id_col], decoded):
                    e = block_mean_resize(d, out_h, out_w)
                    rows.append(
                        (rid, d.shape[0], d.shape[1], d.shape[2],
                         d.astype("float64").mean(axis=(0, 1)).tolist(),
                         d.astype("float64").std(axis=(0, 1)).tolist(),
                         e.astype("float64").flatten().tolist())
                    )
                yield pd.DataFrame(rows, columns=cols)
                continue
            px = np.stack(decoded).astype("float64")
            n, h, w, c = px.shape
            means = px.mean(axis=(1, 2))
            stds = px.std(axis=(1, 2))
            emb = (
                px.astype("float32")
                .reshape(n, out_h, h // out_h, out_w, w // out_w, c)
                .mean(axis=(2, 4))
                .astype("float64")
                .reshape(n, -1)
            )
            yield pd.DataFrame(
                {
                    cols[0]: pdf[id_col].to_numpy(),
                    "height": np.full(n, h, dtype="int32"),
                    "width": np.full(n, w, dtype="int32"),
                    "channels": np.full(n, c, dtype="int32"),
                    "channel_means": list(means),
                    "channel_stds": list(stds),
                    "embedding": list(emb),
                }
            )

    src = df.select(id_col, data_col)
    # Spread a narrow scan: the mapInPandas stage inherits the input's
    # partitioning, and a single-file 100x corpus arrives as ~14 scan
    # partitions on 32 cores — the decode loop is the whole cost here.
    par = df.sparkSession.sparkContext.defaultParallelism
    if src.rdd.getNumPartitions() < par:
        src = src.repartition(par)
    return src.mapInPandas(_featurize, schema=out_schema)


def fake_frame_sample(
    df: DataFrame,
    id_col: str = "doc_id",
    data_col: str = "data",
    frame_len: int = 64,
    every_n: int = 2,
) -> DataFrame:
    """Frame sampling plumbing over a FAKE fixed-frame-length 'video': the
    payload is treated as a concatenation of ``frame_len``-byte frames and
    every ``every_n``-th frame is emitted as its own row — the fan-out
    ``mapInPandas`` shape (one input row -> many output rows) a real
    ffmpeg-backed ``sample_frames`` would use, with the same schema.

    Output: (id, frame_idx, frame bytes).
    """
    id_field = df.schema[id_col]
    out_schema = StructType(
        [
            StructField(id_col, id_field.dataType),
            StructField("frame_idx", LongType()),
            StructField("frame", BinaryType()),
        ]
    )

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for rid, payload in zip(pdf[id_col], pdf[data_col]):
                payload = payload or b""
                n_frames = len(payload) // frame_len
                for idx in range(0, n_frames, every_n):
                    rows.append(
                        (rid, idx, bytes(payload[idx * frame_len : (idx + 1) * frame_len]))
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in out_schema.fields])

    return df.select(id_col, data_col).mapInPandas(_sample, schema=out_schema)


def attach_fake_media(
    df: DataFrame, text_col: str = "text", media_format: str = "png"
) -> DataFrame:
    """Deterministic fake media payload for tests/fixtures: the UTF-8 bytes
    of ``text_col`` prefixed with a real magic header, as column ``data``.
    Gives the multimodal path genuine binary bytes without a codec."""
    headers = {"png": b"\x89PNG\r\n\x1a\n", "jpeg": b"\xff\xd8\xff", "none": b""}
    header = headers[media_format if media_format in headers else "none"]
    return df.withColumn(
        "data",
        F.concat(F.lit(bytearray(header)), F.encode(F.col(text_col), "UTF-8")),
    )
