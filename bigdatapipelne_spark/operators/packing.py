"""Sequence packing: place variable-length items (tokenized documents)
into fixed-capacity context windows — the step between "deduped corpus"
and "training batches" in an LLM data pipeline.

Packing is inherently sequential (where item i lands depends on items
before it), so a single global packing cannot be distributed. The scale
design is BUCKETED NEXT-FIT: items are hashed into ``n_buckets``
independent buckets, each bucket packs its items alone, and sequence ids
are namespaced by bucket. Buckets are embarrassingly parallel — at 100 TB
raise ``n_buckets`` so each bucket's item list fits one task's memory
(the pandas frame holds (id, length) pairs only, never the text), and the
single shuffle is the hash partition by bucket. Next-fit within a bucket
wastes at most one item's worth of slack per boundary versus first-fit
decreasing, and unlike FFD it is oracle-checkable by a linear recurrence
(DuckDB recursive CTE) because it never looks back.

The bucket hash and the in-bucket order are both pure functions of the
item id (md5-mod and id sort), so any engine re-derives the exact same
layout — no RNG state, no partition-layout dependence.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def md5_bucket(id_col: Column | str, n_buckets: int) -> Column:
    """Deterministic cross-engine bucket id: first md5 byte of the id's
    decimal string, mod ``n_buckets``. DuckDB mirror:
    ``CAST(('0x' || substring(md5(CAST(id AS VARCHAR)), 1, 2)) AS INTEGER)
    % n`` (same expression dataset_splits uses for split assignment)."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    return (
        F.conv(F.substring(F.md5(c.cast("string")), 1, 2), 16, 10).cast("int")
        % n_buckets
    )


TARGET_ROWS_PER_BUCKET = 5_000_000
"""Adaptive-default bound on a bucket's (id, length) pandas frame: ~5 M
16-byte pairs ≈ 80 MB per task — comfortable executor headroom."""


def pick_n_buckets(n_rows: int, target_rows_per_bucket: int = TARGET_ROWS_PER_BUCKET) -> int:
    """Bucket count sizing: enough buckets that no bucket's (id, length)
    list exceeds ``target_rows_per_bucket`` in expectation, floored at 32
    so small inputs still parallelize. Pure function of the row count, so
    the derived layout stays a pure function of the data."""
    return max(32, -(-n_rows // max(1, target_rows_per_bucket)))


def pack_sequences(
    df: DataFrame,
    id_col: str,
    len_col: str,
    *,
    seq_len: int,
    n_buckets: int | None = None,
    target_rows_per_bucket: int = TARGET_ROWS_PER_BUCKET,
) -> DataFrame:
    """Assign every item a ``(bucket, seq_no, start_off)`` packing slot.

    Lengths are capped at ``seq_len`` (an oversized item occupies one full
    sequence; trimming the payload is the consumer's choice). Within a
    bucket, items are packed in ascending ``id_col`` order by NEXT-FIT:
    keep filling the current sequence until the next item would overflow,
    then start a new one. Emits one row per item:

    ``id_col, bucket int, seq_no bigint, n_tokens bigint, start_off bigint``

    Only (id, length) rows cross the shuffle — pack first, then join the
    payload back by id, so the text/token arrays never funnel through the
    per-bucket pandas frames.

    ``n_buckets=None`` (the default) sizes the fan-out from the input via
    ``pick_n_buckets`` (one count job) so per-bucket memory stays bounded
    at ANY corpus size — a fixed default would grow each bucket's pandas
    frame linearly with the data. Pass an explicit ``n_buckets`` when the
    layout must be reproducible independent of the row count (the
    oracle-checked gate query does).
    """
    if n_buckets is None:
        n_buckets = pick_n_buckets(df.count(), target_rows_per_bucket)
    out_schema = (
        f"{id_col} long, bucket int, seq_no long, n_tokens long, start_off long"
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col, ignore_index=True)
        seq = acc = 0
        seqs, offs = [], []
        for n in pdf["_n"]:
            if acc + n > seq_len and acc > 0:
                seq += 1
                acc = 0
            offs.append(acc)
            seqs.append(seq)
            acc += n
        return pd.DataFrame(
            {
                id_col: pdf[id_col],
                "bucket": pdf["bucket"],
                "seq_no": seqs,
                "n_tokens": pdf["_n"],
                "start_off": offs,
            }
        )

    sized = df.select(
        F.col(id_col),
        F.least(F.col(len_col), F.lit(seq_len)).cast("long").alias("_n"),
        md5_bucket(id_col, n_buckets).alias("bucket"),
    )
    return sized.groupBy("bucket").applyInPandas(pack, out_schema)


def packing_stats(packed: DataFrame, *, seq_len: int) -> DataFrame:
    """Utilization summary of a packing: one row per (bucket, seq_no) with
    item count and fill ratio — the metric that tells you whether
    ``n_buckets``/``seq_len`` are leaving padding on the table."""
    return packed.groupBy("bucket", "seq_no").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum("n_tokens").alias("used"),
        (F.sum("n_tokens") / F.lit(float(seq_len))).alias("fill_ratio"),
    )
