"""Similarity search over embedding columns (north-star scope).

Two tiers, same scoring expression (functions/vectors.cosine_similarity —
pure Catalyst, bit-deterministic):

- ``brute_force_topk``: exact baseline. The *query* side is broadcast
  (small by construction), the corpus streams through a map-side nested
  loop — no corpus shuffle at all; the only shuffle is the final top-k per
  query, which is k rows per query per partition after the window trims.
- ``srp_bucket_ann``: scale path. Signed-random-projection LSH — every
  vector gets a ``nbits``-bit bucket from deterministic md5-derived
  hyperplanes; neighbor candidates share a bucket (optionally with 1-bit
  flips for recall). Turns corpus-x-corpus into an equi-join on bucket ids.
  Approximate by design -> exercised as a rows-only query (no SQL oracle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from bigdatapipelne_spark.functions.vectors import cosine_similarity


def brute_force_topk(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 3,
) -> DataFrame:
    """Exact cosine top-k: (query_id, neighbor_id, score, rank<=k).

    Ranking uses (score DESC, neighbor_id) — the unique tiebreaker keeps
    top-k deterministic under ties on any cluster size."""
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"))
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"))
    scored = (
        F.broadcast(q)
        .crossJoin(c)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("score", cosine_similarity("qv", "cv"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "score", "rank")
    )


def near_duplicate_pairs(
    df: DataFrame, id_col: str, vec_col: str, threshold: float
) -> DataFrame:
    """All pairs (id_a < id_b) with cosine >= threshold — exact baseline
    (quadratic; at scale swap the pairing for srp_bucket_ann candidates and
    keep this scoring/filter stage unchanged)."""
    a = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    b = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    return (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("cosine", cosine_similarity("va", "vb"))
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )


def _srp_hyperplane(dim: int, bit: int) -> list[float]:
    """Deterministic pseudo-random hyperplane: component j of plane b is +1
    or -1 by a bit of md5 — reproducible everywhere, no RNG state."""
    import hashlib

    return [
        1.0 if hashlib.md5(f"{bit}:{j}".encode()).digest()[0] % 2 else -1.0
        for j in range(dim)
    ]


def srp_buckets(
    df: DataFrame, id_col: str, vec_col: str, dim: int, nbits: int = 8
) -> DataFrame:
    """Assign each vector a signed-random-projection bucket id (string of
    nbits sign bits). Hyperplanes are literal arrays baked into the plan —
    the projection is a codegen'd dot product per bit, no shuffle."""
    out = df.select(F.col(id_col), F.col(vec_col))
    bits = []
    for b in range(nbits):
        plane = F.array(*[F.lit(x) for x in _srp_hyperplane(dim, b)])
        d = F.aggregate(
            F.zip_with(F.col(vec_col), plane, lambda x, h: x.cast("double") * h),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bits.append(F.when(d >= 0, F.lit("1")).otherwise(F.lit("0")))
    return out.withColumn("bucket", F.concat(*bits)).drop(vec_col).join(
        df, id_col
    )


def srp_bucket_ann(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int,
    k: int = 3,
    nbits: int = 8,
) -> DataFrame:
    """Approximate all-pairs top-k: candidates share an SRP bucket, scored
    exactly within the bucket. Equi-join on bucket (AQE splits skewed
    buckets); recall is tuned by nbits (fewer bits -> bigger buckets)."""
    bucketed = srp_buckets(df, id_col, vec_col, dim, nbits)
    a = bucketed.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"), "bucket"
    )
    b = bucketed.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"), "bucket"
    )
    scored = (
        a.join(b, "bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("score", cosine_similarity("qv", "cv"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "score", "rank")
    )
