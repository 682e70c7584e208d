"""Distributed frequency analysis over token streams: provably-exact heavy
hitters (Misra-Gries candidates + exact recount) and top-V vocabulary
coverage.

Reference scope: the reference pipeline has no frequency surface; this is
north-star training-data tooling (vocabulary construction, boilerplate /
stop-token discovery) in the same extension family as dedup/selection.

Why not just ``explode -> groupBy(token)``? At 100 TB the token column's
cardinality is corpus-sized (URLs, typos, code identifiers), so the full
groupBy shuffles one row per *distinct token per partition* — fine for the
31-word test corpus, a multi-TB exchange on a web crawl. The heavy-hitter
path instead:

1. runs a Misra-Gries summary (capacity ``m``) inside each partition — an
   Arrow-batched ``mapInPandas`` with O(m) state, no shuffle;
2. unions the per-partition survivor sets into a candidate list of at most
   ``m × P`` tokens (KB-sized — it ships as a broadcast);
3. exact-recounts ONLY candidate tokens (the explode is filtered by the
   broadcast before any exchange) and keeps ``count * m > total``.

The summed-summary guarantee makes step 3 exact, not approximate: any token
with global count > n/m must end a partition pass with a positive MG
counter somewhere (decrements across all partitions destroy at most
n/(m+1) < n/m of its occurrences in total), so the candidate union is a
superset of every token the threshold can admit, and the recount prunes the
false positives with exact counts. Output is therefore identical to the
full groupBy — a pure function of the data, independent of partitioning —
which is what lets the DuckDB oracle hash-match it.
"""

from __future__ import annotations

from typing import Iterable, Iterator, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def misra_gries_candidates(
    tokens_df: DataFrame, tokens_col: str, capacity: int
) -> DataFrame:
    """Per-partition Misra-Gries survivor tokens (distinct across the frame).

    ``tokens_df`` carries an ``array<string>`` column; each partition folds
    its arrays through one MG summary of at most ``capacity`` counters and
    emits just the surviving token strings — at most ``capacity`` rows per
    partition, whatever the partition's size.

    Vectorized as MERGEABLE summaries (Agarwal/Cormode et al.): each Arrow
    batch is counted in one C-speed ``value_counts``, merged into the
    running summary pointwise, then shrunk by subtracting the
    (capacity+1)-th largest count and dropping non-positives. Each shrink
    of ``s`` removes >= s*(capacity+1) count mass (the top capacity+1
    counters all hold >= s), so the cumulative deficit of any token stays
    <= n/(capacity+1) < n/capacity — every true-frequent token survives
    as a candidate, exactly the per-token MG guarantee, without the
    per-token Python loop (~30M dict ops at the 100x corpus). Candidates
    are a SUPERSET-noise-tolerant intermediate: ``frequent_items``
    re-counts them exactly, so the final output is loop-form-identical.

    Memory: shrinking happens after absorbing a whole Arrow batch, so the
    counters dict transiently holds capacity + (distinct tokens in the
    batch) entries — the loop form's strict O(capacity) bound now depends
    on ``spark.sql.execution.arrow.maxRecordsPerBatch`` (default 10k rows;
    at ~50 tokens/doc that is <=500k transient entries, a few tens of MB).
    If batches can be very wide, shrink against the merged summary per
    value_counts chunk instead; correctness is unaffected either way."""
    import pandas as pd  # noqa: PLC0415 — worker-side import

    def summarize(batches: Iterable["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np

        counters: dict[str, int] = {}
        for pdf in batches:
            arrays = [a for a in pdf[tokens_col] if a is not None and len(a)]
            if not arrays:
                continue
            flat = np.concatenate([np.asarray(a, dtype=object) for a in arrays])
            for tok, c in pd.Series(flat).value_counts().items():
                counters[tok] = counters.get(tok, 0) + int(c)
            if len(counters) > capacity:
                sub = sorted(counters.values(), reverse=True)[capacity]
                counters = {
                    t: c - sub for t, c in counters.items() if c > sub
                }
        yield pd.DataFrame({"token": list(counters)})

    return (
        tokens_df.select(F.col(tokens_col).alias(tokens_col))
        .mapInPandas(summarize, "token string")
        .distinct()
    )


def frequent_items(
    df: DataFrame, text_tokens: F.Column, capacity: int
) -> DataFrame:
    """Tokens with global count strictly above ``total_tokens / capacity``,
    with their EXACT counts — computed without ever shuffling the full
    token distribution (module docstring has the proof sketch).

    The threshold compares in integer arithmetic (``cnt * capacity >
    total``), so Spark and the SQL oracle agree bit-for-bit — no float
    division on the decision boundary. Emits ``token, cnt``.
    """
    tok = df.select(text_tokens.alias("w"))
    candidates = misra_gries_candidates(tok, "w", capacity)

    exploded = tok.select(F.explode("w").alias("token"))
    total = exploded.agg(F.count(F.lit(1)).alias("total"))
    counted = (
        exploded.join(F.broadcast(candidates), "token")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return (
        counted.crossJoin(F.broadcast(total))
        .filter(F.col("cnt") * F.lit(capacity) > F.col("total"))
        .select("token", "cnt")
    )


def vocab_coverage(
    df: DataFrame,
    text_tokens: F.Column,
    vocab_sizes: Sequence[int],
    spark: SparkSession | None = None,
) -> DataFrame:
    """Corpus coverage of the top-V vocabulary for each requested V — the
    tokenizer-design question "how much of the corpus do V types cover?".

    One grouped count builds the token frequency table (map-side combine;
    rows = vocabulary size, not corpus size), ``limit(max(V))`` takes the
    head via TakeOrdered (no global sort materializes), and only that
    max(V)-row frame funnels through the single-partition ranking window —
    bounded by the caller's largest V, never by the corpus. Ties on count
    break by token text so the ranking is total and engine-independent.

    Emits one row per V: ``vocab_size, covered_tokens, coverage`` (coverage
    rounded to 6 dp at the presentation boundary).
    """
    spark = spark or df.sparkSession
    top_v = max(vocab_sizes)
    freq = (
        df.select(text_tokens.alias("w"))
        .select(F.explode("w").alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    total = freq.agg(F.sum("cnt").alias("total"))
    head = freq.orderBy(F.desc("cnt"), F.asc("token")).limit(top_v)
    w = Window.orderBy(F.desc("cnt"), F.asc("token")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    ranked = head.select(
        F.row_number().over(w).alias("rank"), F.sum("cnt").over(w).alias("cum")
    )
    sizes = spark.createDataFrame([(int(v),) for v in vocab_sizes], "vocab_size int")
    return (
        ranked.join(F.broadcast(sizes), F.col("rank") <= F.col("vocab_size"))
        .groupBy("vocab_size")
        .agg(
            F.max("rank").cast("bigint").alias("covered_types"),
            F.max("cum").alias("covered_tokens"),
        )
        .crossJoin(F.broadcast(total))
        .select(
            "vocab_size",
            "covered_types",
            "covered_tokens",
            F.round(F.col("covered_tokens") / F.col("total"), 6).alias("coverage"),
        )
    )


def unigram_logprob(
    df: DataFrame, id_col: str, text_tokens: F.Column
) -> DataFrame:
    """Per-document mean unigram log-probability under the corpus's own
    unigram language model — the cheap perplexity-proxy quality filter
    (the KenLM-scoring step of CCNet-style pipelines, reduced to the
    model that needs no external artifact): documents whose tokens are
    collectively improbable in the corpus score low (gibberish, wrong
    language); repetitive high-frequency runs score high.

    mean_logprob(d) = (1/n_d) * sum over tokens t of cnt_dt * ln(cnt_t/N)

    Scale shape: the "model" is the token frequency table (vocabulary-
    sized, built with one map-side-combined groupBy); documents reduce to
    (doc, token, cnt_dt) rows — bounded by distinct-tokens-per-doc, not
    document length — before the token-keyed join against it. The global
    N rides as a 1-row broadcast.

    ln sums are rounded to 6 dp at emission (the doc_char_entropy
    precedent: JVM and libm ln differ by 1 ulp on ~4% of inputs, and
    double addition order differs per engine — both effects are ~1e-15,
    nine orders below the rounding grain). Emits ``id_col, n_tokens,
    mean_logprob, ppl_proxy`` (ppl = exp(-mean), rounded from the
    already-rounded mean so both engines exponentiate the same double).
    """
    tok = df.select(F.col(id_col), text_tokens.alias("w"))
    per_doc_tok = (
        tok.select(F.col(id_col), F.explode("w").alias("token"))
        .groupBy(id_col, "token")
        .agg(F.count(F.lit(1)).alias("cnt_dt"))
    )
    freq = per_doc_tok.groupBy("token").agg(F.sum("cnt_dt").alias("cnt_t"))
    total = freq.agg(F.sum("cnt_t").alias("total"))
    model = freq.crossJoin(F.broadcast(total)).select(
        "token",
        F.log(F.col("cnt_t").cast("double") / F.col("total").cast("double")).alias(
            "__lp"
        ),
    )
    scored = (
        per_doc_tok.join(model, "token")
        .groupBy(id_col)
        .agg(
            F.sum("cnt_dt").alias("n_tokens"),
            F.round(
                F.sum(F.col("cnt_dt") * F.col("__lp")) / F.sum("cnt_dt"), 6
            ).alias("mean_logprob"),
        )
    )
    return scored.select(
        id_col,
        "n_tokens",
        "mean_logprob",
        F.round(F.exp(-F.col("mean_logprob")), 6).alias("ppl_proxy"),
    )
