"""Keyword search over a document corpus: BM25 ranking as pure Catalyst
expressions — the relevance-scoring half of a training-data curation
pipeline (topical filtering, eval-set retrieval, targeted decontamination).

Scale design: for a FIXED query (a handful of terms), the corpus text is
tokenized exactly ONCE and reduced to a per-document (dl, tf...) profile
before anything else touches it:

- per-doc term frequencies and length come from one explode + one
  map-side-combined conditional aggregation (all whole-stage codegen —
  array-lambda ``filter`` HOFs are interpreted per element and were the
  dominant cost at scale), localCheckpointed because both the stats pass
  and the scoring pass consume it;
- corpus stats (N, avgdl, per-term document frequencies) are ONE global
  aggregate over that profile — cross-joined back as a 1-row broadcast;
- the score is an explicit left-to-right sum over the term list, so
  float addition order is fixed by construction (not by shuffle order),
  which is what lets a distributed run hash-match a single-threaded
  oracle;
- top-k is a TakeOrdered with (score DESC, id) — k rows to the driver,
  never a global sort.

Determinism note: idf uses ln(), and libm/JVM ln can differ in the last
ulp — so exact ties (identical tf/dl profiles) are bit-identical in both
engines and break deterministically on the id tiebreaker, while the
EMITTED score is rounded to 6 decimals to absorb the ulp (bm25 docstring;
the ranking itself compares full-precision scores).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from bigdatapipelne_spark.operators.checkpoint import eager_checkpoint

from bigdatapipelne_spark.functions.text import tokens


def bm25_topk(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    terms: list[str],
    k: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Top-k documents for a bag-of-terms query under BM25
    (idf = ln(1 + (N - df + 0.5)/(df + 0.5)), the Robertson-Sparck Jones
    form that stays positive). Returns (id, score, rank) for docs matching
    at least one term; rank is dense 1..k ordered by (score DESC, id).
    """
    if not terms:
        raise ValueError("terms must be non-empty")
    # One tokenize + one explode; explode_outer keeps empty documents (one
    # NULL token row) so dl=0 docs still count toward N/avgdl. Conditional
    # sums stay in whole-stage codegen and combine map-side, so the shuffle
    # is one row per document; the checkpoint stops the stats pass and the
    # scoring pass from each re-tokenizing the corpus.
    ex = docs.select(
        F.col(id_col), F.explode_outer(tokens(F.col(text_col))).alias("_t")
    )
    scored_base = (
        ex.groupBy(id_col)
        .agg(
            F.count("_t").cast("double").alias("_dl"),
            *[
                F.sum(F.when(F.col("_t") == term, 1).otherwise(0))
                .cast("double")
                .alias(f"_tf{i}")
                for i, term in enumerate(terms)
            ],
        )
        .transform(eager_checkpoint)
    )

    stats = scored_base.agg(
        F.count(F.lit(1)).cast("double").alias("_N"),
        F.sum("_dl").cast("bigint").alias("_sumdl"),
        *[
            F.sum((F.col(f"_tf{i}") > 0).cast("bigint")).cast("double")
            .alias(f"_df{i}")
            for i in range(len(terms))
        ],
    )

    with_stats = scored_base.crossJoin(F.broadcast(stats))
    avgdl = F.col("_sumdl").cast("double") / F.col("_N")
    norm = F.lit(1.0) - F.lit(b) + F.lit(b) * F.col("_dl") / avgdl

    def term_score(i: int) -> Column:
        tf = F.col(f"_tf{i}")
        idf = F.log(
            F.lit(1.0)
            + (F.col("_N") - F.col(f"_df{i}") + F.lit(0.5))
            / (F.col(f"_df{i}") + F.lit(0.5))
        )
        return idf * (tf * F.lit(k1 + 1.0)) / (tf + F.lit(k1) * norm)

    # explicit left-to-right chain: addition order fixed by the term list
    score = term_score(0)
    for i in range(1, len(terms)):
        score = score + term_score(i)

    ranked = (
        with_stats.select(id_col, score.alias("_score"))
        .filter(F.col("_score") > 0)
        .orderBy(F.col("_score").desc(), F.col(id_col))
        .limit(k)
    )
    from pyspark.sql import Window

    w = Window.orderBy(F.col("_score").desc(), F.col(id_col))
    return ranked.select(
        id_col,
        F.round("_score", 6).alias("score"),
        F.row_number().over(w).cast("bigint").alias("rank"),
    )
