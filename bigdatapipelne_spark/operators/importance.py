"""Data Selection via Importance Resampling (DSIR) — hashed-n-gram
importance weights for target-distribution corpus selection (Xie et al.
2023, arXiv:2302.03169).

The method: fit two bag-of-hashed-n-grams unigram models — one on a TARGET
sample (the distribution you want more of: a reference corpus, a language,
a domain), one on the RAW corpus — and score every raw document by its log
importance weight

    log w(doc) = sum over n-gram occurrences f of
                 ln p_target(bucket(f)) - ln p_raw(bucket(f))

where ``bucket(f)`` hashes word unigrams and bigrams into a fixed number
of buckets. High-weight documents look like the target; selection is then
top-k by weight (this module) or sampling proportional to weight (compose
``dsir_scores`` with ``operators/sampling.weighted_sample_topk``, the A-ES
sampler, for the paper's resampling form).

Scale shape (the 100 TB design):

- Document text never shuffles. Tokenization + hashing are narrow
  projections; each document reduces to ``(id, bucket)`` cells — a small
  int per n-gram occurrence — before the first exchange.
- Both n-gram distributions are at most ``n_buckets`` rows (default 4096)
  regardless of corpus size: one map-side-combinable aggregate each, then
  the joined log-ratio table BROADCASTS onto the cell stream (explicit
  ``F.broadcast`` — it is bounded by construction, no estimator needed).
- The per-document score is one more map-side-combinable sum, and top-k
  compiles to TakeOrdered (per-partition top-k + a k-row driver merge) —
  never a global sort.

Hashing uses the repo's cross-engine md5->BIGINT idiom (first 15 hex
digits via ``conv``, bit-equal to DuckDB's ``CAST(concat('0x', ...) AS
BIGINT)``), so the whole pipeline is replayable in ANSI SQL for the
oracle gate. Scores are rounded to 6 dp on both engines before ranking —
the established absorption for cross-engine ``ln`` ulp and double-sum
reassociation (same posture as bm25/mad_outliers); ranking ties break by
document id, so the selected set is engine- and partitioning-independent.

Reference scope: the reference pipeline has no selection step; this is
north-star surface for the training-data use case (same extension family
as dedup/selection/sampling — SURVEY.md §2 extensions).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from bigdatapipelne_spark.functions.text import tokens
from bigdatapipelne_spark.operators.checkpoint import eager_checkpoint
from bigdatapipelne_spark.operators.dedup import _widen_narrow_input

# Default feature-space size. DSIR's paper uses 10^4; any power-of-two-ish
# bucket count works — the tables stay broadcast-sized at any corpus scale.
DSIR_BUCKETS = 4096


def hashed_ngram_cells(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    *,
    n_buckets: int = DSIR_BUCKETS,
    carry: list[str] | None = None,
) -> DataFrame:
    """One ``(id, bucket)`` row per word unigram AND bigram occurrence.

    ``bucket = conv(md5(feature)[:15], 16, 10) % n_buckets`` — the
    cross-engine hash idiom. Bigrams are real bigrams only (documents with
    one token contribute just the unigram; Spark's ``sequence(1, 0)``
    counts DOWN, so the short-doc case is guarded explicitly).
    ``carry`` columns (e.g. a target flag) pass through per cell."""
    carry = carry or []
    toked = _widen_narrow_input(docs).select(
        F.col(id_col), *[F.col(c) for c in carry], tokens(text_col).alias("__w")
    )
    bigrams = F.when(
        F.size("__w") >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size("__w") - 1),
            lambda i: F.concat_ws(" ", F.slice("__w", i, 2)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    feats = toked.select(
        F.col(id_col),
        *[F.col(c) for c in carry],
        F.explode(F.concat(F.col("__w"), bigrams)).alias("__f"),
    )
    # bucket = conv(md5[:15], 16, 10) % n_buckets, computed over the
    # SHORTEST hex suffix that preserves the residue: when 16^L is a
    # multiple of n_buckets, the higher digits of the 15-digit prefix
    # contribute multiples of n_buckets and drop out of the mod, so only
    # the last L digits need the (expensive, per-occurrence) string base
    # conversion. For the default 4096 = 16^3 that is 3 digits instead of
    # 15 — bit-identical buckets (asserted against the full-width form in
    # tests/test_importance.py), and the oracle SQL keeps the full-width
    # idiom, so the driver hash gate re-proves the equivalence per run.
    suffix = next((k for k in range(1, 16) if (16**k) % n_buckets == 0), 15)
    return feats.select(
        F.col(id_col),
        *[F.col(c) for c in carry],
        (
            F.conv(
                F.substring(F.md5("__f"), 16 - suffix, suffix), 16, 10
            ).cast("long")
            % n_buckets
        ).alias("bucket"),
    )


def dsir_logratio_table(
    cells: DataFrame, target_col: str, *, n_buckets: int = DSIR_BUCKETS
) -> DataFrame:
    """The per-bucket log importance ratio ``ln p_target(b) - ln p_raw(b)``
    with add-one (Laplace) smoothing over the full bucket domain:

        p(b) = (count(b) + 1) / (total + n_buckets)

    ``cells`` carries occurrence counts in column ``n`` (the per-(doc,
    bucket) frame ``dsir_scores`` builds; pass ``n = 1`` rows for raw
    occurrences). The raw distribution is over ALL cells, the target over
    cells whose ``target_col`` is true — so every bucket any document
    touches exists in the raw table, and the left join densifies the
    target side with ``coalesce(0)``. Output is at most ``n_buckets``
    rows: ``(bucket, logratio)`` — broadcast it onto the cell stream."""
    raw = cells.groupBy("bucket").agg(F.sum("n").alias("n_raw"))
    tgt = (
        cells.filter(F.col(target_col))
        .groupBy("bucket")
        .agg(F.sum("n").alias("n_tgt"))
    )
    # Totals as 1-row frames cross-joined in-plan (the tfidf pattern):
    # no driver round-trip, and the plan stays one lazy unit.
    n_raw_tot = cells.agg(F.sum("n").alias("tot_raw"))
    n_tgt_tot = (
        cells.filter(F.col(target_col)).agg(F.sum("n").alias("tot_tgt"))
    )
    b = float(n_buckets)
    return (
        raw.join(tgt, "bucket", "left")
        .crossJoin(F.broadcast(n_raw_tot))
        .crossJoin(F.broadcast(n_tgt_tot))
        .select(
            "bucket",
            (
                F.log(
                    (F.coalesce(F.col("n_tgt"), F.lit(0)) + F.lit(1.0))
                    / (F.col("tot_tgt") + F.lit(b))
                )
                - F.log(
                    (F.col("n_raw") + F.lit(1.0)) / (F.col("tot_raw") + F.lit(b))
                )
            ).alias("logratio"),
        )
    )


def dsir_scores(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    target_col: str,
    *,
    n_buckets: int = DSIR_BUCKETS,
) -> DataFrame:
    """Per-document DSIR log importance weight: ``(id, dsir_score)`` with
    the score rounded to 6 dp (cross-engine determinism — see module
    docstring). Documents with no tokens have no features and are absent
    (a zero-evidence document has no defined weight).

    ``target_col`` is a boolean column on ``docs`` naming the target
    sample; the raw distribution is the whole input. The tokenize/hash
    projection runs ONCE: occurrences collapse to per-(doc, bucket)
    counts behind an eager checkpoint, both distribution aggregates and
    the scoring sum derive from that small frame (bounded by
    min(doc_len, n_buckets) rows per doc), and the per-doc score is
    ``sum(n * logratio)`` — identical to the per-occurrence sum up to the
    6 dp rounding both engines apply."""
    cells = hashed_ngram_cells(
        docs, id_col, text_col, n_buckets=n_buckets, carry=[target_col]
    )
    doc_cells = (
        cells.groupBy(id_col, target_col, "bucket")
        .agg(F.count(F.lit(1)).alias("n"))
        .transform(eager_checkpoint)
    )
    lr = dsir_logratio_table(doc_cells, target_col, n_buckets=n_buckets)
    return (
        doc_cells.join(F.broadcast(lr), "bucket")
        .groupBy(id_col)
        .agg(F.round(F.sum(F.col("n") * F.col("logratio")), 6).alias("dsir_score"))
    )


def dsir_select_topk(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    target_col: str,
    *,
    k: int,
    n_buckets: int = DSIR_BUCKETS,
) -> DataFrame:
    """Top-``k`` documents by DSIR importance weight, ties broken by id
    ascending — the deterministic selection form (for the paper's
    sampling-proportional-to-weight form, feed ``dsir_scores`` into the
    A-ES sampler ``operators/sampling.weighted_sample_topk``). Compiles
    to TakeOrdered: per-partition top-k + a k-row driver-side merge,
    never a global sort."""
    scored = dsir_scores(
        docs, id_col, text_col, target_col, n_buckets=n_buckets
    )
    return scored.orderBy(F.desc("dsir_score"), F.asc(id_col)).limit(k)
