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
    (same trap as tokenize-inside-shingle; see .claude verify notes)."""
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
