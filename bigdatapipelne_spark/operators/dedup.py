"""Deduplication operators for training-data pipelines (north-star scope,
BASELINE.json): exact, MinHash+LSH, SimHash, n-gram Jaccard.

Design for 100 TB:

- **Exact** dedup is a hash-groupBy on a 128-bit fingerprint — one shuffle
  keyed by the hash, map-side partial aggregation collapses duplicates
  before the wire.
- **MinHash+LSH** never compares all pairs: signatures are computed per
  document (narrow), candidates come from an equi-join on (band, band_key)
  — bounded buckets instead of a quadratic cross join — and the exact
  Jaccard verification runs only on candidate pairs.
- **SimHash** is one grouped aggregation per document; matching is again an
  equi-join on the signature (or banded substrings for hamming<k).
- Everything is md5-based and deterministic: same input -> same candidate
  set on any cluster size, and the duckdb oracle can replicate it exactly.

All expressions are built-in functions — no Python on the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from bigdatapipelne_spark.functions.text import fingerprint, shingles, tokens

# MinHash parameters: k = BANDS * ROWS hash functions. With r=2, b=6 the
# LSH candidate-capture probability at Jaccard j is 1-(1-j^2)^6 (~0.82 at
# j=0.5, ~0.99 at j=0.7) — tuned for a 0.5 near-dup threshold.
NUM_PERM = 12
BANDS = 6
ROWS_PER_BAND = 2


def exact_duplicates(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Map every document to the canonical (minimum) id of its exact-content
    group. Output: id, canonical_id, group_size.

    One shuffle on the md5 fingerprint; the heavy text column is dropped
    before the shuffle (only hash + id move).
    """
    keyed = df.select(F.col(id_col), fingerprint(text_col).alias("fp"))
    groups = keyed.groupBy("fp").agg(
        F.min(id_col).alias("canonical_id"),
        F.count(F.lit(1)).alias("group_size"),
    )
    return keyed.join(groups, "fp").select(id_col, "canonical_id", "group_size")


def _minhash_exprs(shingle_col: str, num_perm: int = NUM_PERM) -> list[Column]:
    """One min-expression per permutation: min(md5('<seed>:' || shingle)).

    md5 hex strings compare lexicographically the same in every engine, so
    the 'permutation' is just a seeded rehash — deterministic and portable.
    Min over the exploded multiset equals min over the set, so no distinct
    pass is needed before aggregation.
    """
    return [
        F.min(F.md5(F.concat(F.lit(f"{seed}:"), F.col(shingle_col)))).alias(f"mh{seed}")
        for seed in range(num_perm)
    ]


def minhash_signatures(
    df: DataFrame, id_col: str, text_col: str, n: int = 3, num_perm: int = NUM_PERM
) -> DataFrame:
    """Per-document MinHash signature: id, mh0..mh{k-1}.

    explode(shingles) -> groupBy(id) with k min-aggregates. Partial
    aggregation collapses each document's shingles map-side, so the shuffle
    carries one row per (partition, document)."""
    exploded = df.select(
        F.col(id_col), F.explode(shingles(text_col, n)).alias("shingle")
    )
    return exploded.groupBy(id_col).agg(*_minhash_exprs("shingle", num_perm))


def lsh_bands(
    sigs: DataFrame, id_col: str, bands: int = BANDS, rows: int = ROWS_PER_BAND
) -> DataFrame:
    """Signature -> (id, band, band_key) rows; band_key = md5 of the band's
    concatenated minhashes. Stacked via an array+explode so it stays one
    projection."""
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.md5(
                    F.concat_ws("|", *[F.col(f"mh{b * rows + r}") for r in range(rows)])
                ).alias("band_key"),
            )
            for b in range(bands)
        ]
    )
    return sigs.select(F.col(id_col), F.explode(band_structs).alias("bb")).select(
        id_col, F.col("bb.band").alias("band"), F.col("bb.band_key").alias("band_key")
    )


def minhash_candidate_pairs(
    df: DataFrame, id_col: str, text_col: str, n: int = 3
) -> DataFrame:
    """Distinct candidate pairs (id_a < id_b) sharing at least one LSH band.

    The self-join is on (band, band_key) — an equi-join over hash buckets,
    not a cross join; AQE's skew handling splits any pathological bucket."""
    b = lsh_bands(minhash_signatures(df, id_col, text_col, n), id_col)
    left = b.select(F.col(id_col).alias("id_a"), "band", "band_key")
    right = b.select(F.col(id_col).alias("id_b"), "band", "band_key")
    return (
        left.join(right, ["band", "band_key"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def minhash_near_duplicates(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """MinHash-LSH candidates verified with exact n-gram-Jaccard.

    Output: id_a, id_b, jaccard (>= threshold). Verification joins each
    candidate pair to the two documents' distinct-shingle sets — proportional
    to candidates, never quadratic in corpus size. jaccard is an int/int
    double division (engine-exact)."""
    cands = minhash_candidate_pairs(df, id_col, text_col, n)
    sets_ = df.select(
        F.col(id_col).alias("sid"),
        F.array_distinct(shingles(text_col, n)).alias("sset"),
    )
    a = sets_.select(F.col("sid").alias("id_a"), F.col("sset").alias("set_a"))
    b = sets_.select(F.col("sid").alias("id_b"), F.col("sset").alias("set_b"))
    inter = F.size(F.array_intersect("set_a", "set_b")).cast("double")
    union = (F.size("set_a") + F.size("set_b")).cast("double") - inter
    return (
        cands.join(a, "id_a")
        .join(b, "id_b")
        .withColumn("jaccard", inter / union)
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


SIMHASH_BITS = 64
_HEX = "0123456789abcdef"


def simhash_signatures(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """64-bit SimHash per document, emitted as a 64-char '0'/'1' string
    (portable across engines — no int64 sign games).

    Per distinct token: h = md5(token); hex char p contributes 4 bits. Bit
    (p,i) votes +1/-1 per document; the signature bit is 1 iff the vote sum
    is positive. One explode + one grouped aggregation with 64 sum
    expressions — all codegen, shuffle is one row per document."""
    tok = df.select(
        F.col(id_col), F.explode(F.array_distinct(tokens(text_col))).alias("tok")
    ).withColumn("h", F.md5("tok"))
    votes = []
    for p in range(16):
        digit = F.instr(F.lit(_HEX), F.substring("h", p + 1, 1)) - 1
        for i in range(4):
            bit = (digit / (2**i)).cast("int") % 2
            votes.append(
                F.sum(F.when(bit == 1, 1).otherwise(-1)).alias(f"v{p * 4 + i}")
            )
    sums = tok.groupBy(id_col).agg(*votes)
    sig = F.concat(
        *[
            F.when(F.col(f"v{j}") > 0, F.lit("1")).otherwise(F.lit("0"))
            for j in range(SIMHASH_BITS)
        ]
    )
    return sums.select(F.col(id_col), sig.alias("simhash"))
