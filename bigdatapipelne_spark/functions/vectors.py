"""Vector math over ``array<float>`` embedding columns — pure Catalyst.

``aggregate(zip_with(...))`` runs element-wise inside codegen; accumulation
is sequential left-to-right in double precision, which is bit-identical to
DuckDB's ``list_sum(list_transform(...))`` — verified — so cosine scores
hash-match the oracle with no rounding fudge.

Scale: these are per-row expressions (no shuffle). The quadratic part of
similarity search is the *pairing* strategy, handled in
operators/similarity.py (broadcast for small query sets, LSH buckets for
corpus-x-corpus).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column | str, b: Column | str) -> Column:
    ca = F.col(a) if isinstance(a, str) else a
    cb = F.col(b) if isinstance(b, str) else b
    return F.aggregate(
        F.zip_with(ca, cb, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column | str) -> Column:
    ca = F.col(a) if isinstance(a, str) else a
    return F.sqrt(
        F.aggregate(
            F.transform(ca, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def cosine_from_norms(
    a: Column | str, b: Column | str, norm_a: Column | str, norm_b: Column | str
) -> Column:
    """Cosine with the norms precomputed per ROW (one l2 pass per vector)
    instead of per PAIR — numerically identical to ``cosine_similarity``
    (same dot, same norm values, same final division) but O(N) norm work
    instead of O(N^2) in pairwise pipelines."""
    na = F.col(norm_a) if isinstance(norm_a, str) else norm_a
    nb = F.col(norm_b) if isinstance(norm_b, str) else norm_b
    return dot(a, b) / (na * nb)


def l2_normalize(a: Column | str, norm: Column | str | None = None) -> Column:
    """Unit-normalize an embedding (zero vectors stay zero).

    Pass ``norm`` as a PRECOMPUTED column in pairwise/hot paths: Spark does
    no CSE across higher-order-function lambda boundaries, so an inlined
    norm is re-evaluated per element — O(dim^2) per row instead of O(dim)
    (same trap as tokenize-inside-shingle in operators/dedup.py)."""
    ca = F.col(a) if isinstance(a, str) else a
    n = (F.col(norm) if isinstance(norm, str) else norm) if norm is not None else l2_norm(ca)
    return F.when(
        n == F.lit(0.0), F.transform(ca, lambda x: F.lit(0.0))
    ).otherwise(F.transform(ca, lambda x: x.cast("double") / n))


def int8_scale(a: Column | str) -> Column:
    """Symmetric per-vector int8 quantization scale: max|x| / 127, so the
    widest component maps to +-127 exactly. 0.0 for the zero vector."""
    ca = F.col(a) if isinstance(a, str) else a
    return F.array_max(F.transform(ca, lambda x: F.abs(x.cast("double")))) / F.lit(127.0)


def quantize_int8(a: Column | str, scale: Column | str) -> Column:
    """array<float> -> array<tinyint> with the given per-vector scale
    (use ``int8_scale`` materialized as a real column first — see
    ``l2_normalize`` on why it must not be inlined). 4x smaller than
    float32 at rest; |q| <= 127 by construction of the scale. Zero-scale
    (zero vector) quantizes to zeros."""
    ca = F.col(a) if isinstance(a, str) else a
    s = F.col(scale) if isinstance(scale, str) else scale
    return F.transform(
        ca,
        lambda x: F.when(s == F.lit(0.0), F.lit(0.0))
        .otherwise(F.round(x.cast("double") / s))
        .cast("tinyint"),
    )


def dequantize_int8(q: Column | str, scale: Column | str) -> Column:
    """array<tinyint> -> array<double> reconstruction (q * scale)."""
    cq = F.col(q) if isinstance(q, str) else q
    s = F.col(scale) if isinstance(scale, str) else scale
    return F.transform(cq, lambda x: x.cast("double") * s)


def feature_hash_buckets(tok_col, dim: int):
    """Hashing-trick bucket id per token: first 8 md5 hex chars mod
    ``dim`` — the model-free featurizer that maps unbounded vocabulary
    into a fixed-dimension space (Weinberger et al.'s feature hashing).
    Deterministic and engine-portable; DuckDB mirror:
    ``CAST(('0x' || substring(md5(tok), 1, 8)) AS BIGINT) % dim``."""
    from pyspark.sql import functions as F

    c = F.col(tok_col) if isinstance(tok_col, str) else tok_col
    return F.conv(F.substring(F.md5(c), 1, 8), 16, 10).cast("bigint") % dim


def feature_hash_counts(df, id_col: str, text_col: str, dim: int = 64):
    """Sparse hashed bag-of-words: one row per (id, bucket) with the token
    count landing in that bucket. The fixed-dimension representation a
    pipeline feeds to clustering/classification without training a
    vocabulary; collisions are the accepted trade (bounded by 1/dim).

    Plan shape: tokenize (narrow, codegen) -> explode -> ONE grouped count
    on (id, bucket) with map-side partial aggregation — the shuffle
    carries at most dim rows per document regardless of document length.
    Assemble the dense ``array`` form downstream with
    ``F.array([F.sum(F.when(bucket == i, cnt)) ...])`` or a pivot only
    when a consumer needs it; the sparse rows are the scale form."""
    from pyspark.sql import functions as F

    from bigdatapipelne_spark.functions.text import tokens

    toks = df.select(F.col(id_col), tokens(text_col).alias("__toks"))
    exploded = toks.select(id_col, F.explode("__toks").alias("tok"))
    return (
        exploded.withColumn("bucket", feature_hash_buckets("tok", dim))
        .groupBy(id_col, "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
