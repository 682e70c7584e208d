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
