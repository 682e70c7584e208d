"""Unit tests for operators/selection.py: the distributed-prefix-sum
token-budget selector and the deterministic stratified sampler."""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdatapipelne_spark.operators.selection import (
    budget_select,
    sample_fraction_per_group,
    uniform_hash,
)


def test_budget_select_prefix_semantics(spark):
    # quality order: d3 (0.9, 40) -> d1 (0.8, 50) -> d4 (0.8, 30) ->
    # d2 (0.1, 100); budget 100 keeps d3+d1 (90), drops d4 (would hit 120)
    # and everything after — strict prefix, no back-filling.
    df = spark.createDataFrame(
        [(1, 50, 0.8), (2, 100, 0.1), (3, 40, 0.9), (4, 30, 0.8)],
        "doc_id long, n long, q double",
    )
    out = {r.doc_id: r for r in budget_select(df, "doc_id", "n", "q", budget=100).collect()}
    assert len(out) == 4  # one row per input doc, selected or not
    assert [out[i].selected for i in (3, 1, 4, 2)] == [True, True, False, False]
    assert [out[i].cum_tokens for i in (3, 1, 4, 2)] == [40, 90, 120, 220]


def test_budget_select_matches_single_window(spark):
    """The two-pass distributed prefix sum must equal the single global
    window cumsum exactly, at several partition counts."""
    rows = [(i, (i * 7) % 50 + 1, float((i * 13) % 97) / 97.0) for i in range(500)]
    df = spark.createDataFrame(rows, "doc_id long, n long, q double")
    from pyspark.sql.window import Window

    w = Window.orderBy(F.desc("q"), F.asc("doc_id")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    expect = {
        r.doc_id: r.cum
        for r in df.withColumn("cum", F.sum("n").over(w)).collect()
    }
    for parts in (1, 5, 32):
        got = {
            r.doc_id: r.cum_tokens
            for r in budget_select(
                df, "doc_id", "n", "q", budget=10_000, num_partitions=parts
            ).collect()
        }
        assert got == expect, parts


def test_budget_select_empty_and_zero_budget(spark):
    df = spark.createDataFrame([], "doc_id long, n long, q double")
    assert budget_select(df, "doc_id", "n", "q", budget=10).count() == 0
    df2 = spark.createDataFrame([(1, 5, 0.5)], "doc_id long, n long, q double")
    row = budget_select(df2, "doc_id", "n", "q", budget=0).collect()[0]
    assert row.selected is False and row.cum_tokens == 5


def test_sample_fraction_deterministic_and_stratified(spark):
    df = spark.createDataFrame(
        [(i, "en" if i % 2 == 0 else "de") for i in range(2000)],
        "doc_id long, lang string",
    )
    kept = sample_fraction_per_group(
        df, "doc_id", "lang", {"en": 0.5, "de": 0.1}
    )
    counts = {r.lang: r.n for r in kept.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    # Bernoulli at n=1000 per stratum: generous 5-sigma-ish bands
    assert 400 <= counts["en"] <= 600
    assert 50 <= counts["de"] <= 160
    # deterministic: identical membership on rerun and after repartition
    again = sample_fraction_per_group(
        df.repartition(13), "doc_id", "lang", {"en": 0.5, "de": 0.1}
    )
    assert {r.doc_id for r in kept.collect()} == {r.doc_id for r in again.collect()}
    # default fraction 0 drops unlisted strata entirely
    extra = spark.createDataFrame([(99999, "fr")], "doc_id long, lang string")
    assert sample_fraction_per_group(extra, "doc_id", "lang", {"en": 1.0}).count() == 0


def test_mixture_fractions(spark):
    from bigdatapipelne_spark.operators.selection import mixture_fractions

    # a: 100 rows, b: 300, c: 50; target 50/25/25 -> binding group is a
    # (100/0.5 = 200 < 300/0.25 = 1200, 50/0.25 = 200 ties): C = 200.
    rows = (
        [(i, "a") for i in range(100)]
        + [(1000 + i, "b") for i in range(300)]
        + [(5000 + i, "c") for i in range(50)]
        + [(9000, "dropme")]
    )
    df = spark.createDataFrame(rows, "id long, g string")
    fr = {
        r.g: r
        for r in mixture_fractions(
            df, "g", {"a": 0.5, "b": 0.25, "c": 0.25}
        ).collect()
    }
    assert fr["a"].keep_fraction == 1.0  # binding group keeps everything
    assert abs(fr["b"].keep_fraction - 200 * 0.25 / 300) < 1e-12
    assert fr["c"].keep_fraction == 1.0  # ties the binding ratio exactly
    assert fr["dropme"].keep_fraction == 0.0  # unlisted -> dropped
    assert fr["b"].n_rows == 300
    # resulting expected mixture hits the target: 100 : 50 : 50
    expected = {g: fr[g].n_rows * fr[g].keep_fraction for g in ("a", "b", "c")}
    assert expected == {"a": 100.0, "b": 50.0, "c": 50.0}


def test_uniform_hash_range(spark):
    df = spark.range(0, 5000).select(uniform_hash("id").alias("u"))
    row = df.agg(
        F.min("u").alias("lo"), F.max("u").alias("hi"), F.avg("u").alias("mu")
    ).collect()[0]
    assert 0.0 <= row.lo and row.hi < 1.0
    assert 0.45 < row.mu < 0.55  # uniform-ish


def test_global_rank_exact_and_partition_invariant(spark):
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from bigdatapipelne_spark.operators.selection import global_rank

    df = spark.createDataFrame(
        [(i, float((i * 37) % 100)) for i in range(500)], "id long, score double"
    )
    order = [F.desc("score"), F.asc("id")]
    expected = {
        (r["id"], r["rank"])
        for r in df.withColumn(
            "rank", F.row_number().over(Window.orderBy(*order))
        ).collect()
    }
    for parts in (1, 5, 32):
        got = {
            (r["id"], r["rank"])
            for r in global_rank(df.repartition(parts), order).collect()
        }
        assert got == expected, parts
