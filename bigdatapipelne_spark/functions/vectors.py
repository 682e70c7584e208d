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
