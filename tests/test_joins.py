"""Unit tests for as_of_join (vs a hand-computed truth and edge cases) and
salted_join equivalence with a vanilla join."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from bigdatapipelne_spark.operators.joins import as_of_join, salted_join


def _ts(sec: int) -> datetime.datetime:
    return datetime.datetime(2024, 1, 1) + datetime.timedelta(seconds=sec)


@pytest.fixture()
def trades_quotes(spark):
    trades = spark.createDataFrame(
        [(1, _ts(10), 100.0), (1, _ts(20), 101.0), (2, _ts(15), 50.0),
         (3, _ts(5), 9.0)],
        "sym long, ts timestamp, price double",
    )
    quotes = spark.createDataFrame(
        [(1, _ts(8), 99.5), (1, _ts(10), 99.9), (1, _ts(19), 100.5),
         (2, _ts(30), 49.0)],
        "sym long, qts timestamp, quote double",
    )
    return trades, quotes


def test_as_of_join_backward_with_exact_match(spark, trades_quotes):
    trades, quotes = trades_quotes
    out = as_of_join(trades, quotes, ["sym"], "ts", "qts")
    rows = {(r.sym, r.ts.second): (r.quote, r.qts.second if r.qts else None)
            for r in out.collect()}
    assert rows[(1, 10)] == (99.9, 10)   # exact-time quote wins over 8s
    assert rows[(1, 20)] == (100.5, 19)  # latest prior
    assert rows[(2, 15)] == (None, None)  # only future quote -> NULL (left)
    assert rows[(3, 5)] == (None, None)   # key absent on right
    assert out.count() == trades.count()  # left join preserves all trades


def test_as_of_join_inner_drops_unmatched(spark, trades_quotes):
    trades, quotes = trades_quotes
    out = as_of_join(trades, quotes, ["sym"], "ts", "qts", how="inner")
    assert {(r.sym, r.ts.second) for r in out.collect()} == {(1, 10), (1, 20)}


def test_as_of_join_rejects_column_collision(spark, trades_quotes):
    trades, quotes = trades_quotes
    bad = quotes.withColumnRenamed("quote", "price")
    with pytest.raises(ValueError, match="collide"):
        as_of_join(trades, bad, ["sym"], "ts", "qts")


def test_as_of_join_single_shuffle_no_range_join(spark, trades_quotes):
    """The plan must be window-over-union — no join node at all (the naive
    range-join formulation becomes a broadcast nested loop at scale)."""
    trades, quotes = trades_quotes
    plan = as_of_join(trades, quotes, ["sym"], "ts", "qts")._jdf.queryExecution(
    ).executedPlan().toString()
    assert "Join" not in plan
    assert "Window" in plan


def test_interval_join_matches_range_join(spark):
    import datetime

    from bigdatapipelne_spark.operators.joins import interval_join

    t0 = datetime.datetime(2024, 1, 1)

    def at(minutes):
        return t0 + datetime.timedelta(minutes=minutes)

    # Crafted boundary cases: exactly -lower, exactly +upper, just outside
    # both, a band-crossing match, and a key mismatch.
    left = spark.createDataFrame(
        [(1, 100, at(60)), (1, 101, at(185)), (2, 200, at(60))],
        "k long, lid long, lt timestamp",
    )
    right = spark.createDataFrame(
        [
            (1, 900, at(30)),   # == lt - lower for lid=100 -> match
            (1, 901, at(75)),   # == lt + upper for lid=100 -> match
            (1, 902, at(29)),   # 1 min outside lower -> no
            (1, 903, at(76)),   # 1 min outside upper -> no
            (1, 904, at(170)),  # matches lid=101 across a band boundary
            (3, 905, at(60)),   # wrong key
        ],
        "k long, rid long, rt timestamp",
    )
    got = {
        (r.lid, r.rid)
        for r in interval_join(
            left, right, on=["k"], left_time="lt", right_time="rt",
            lower="30 minutes", upper="15 minutes",
        ).collect()
    }
    expected = {
        (l.lid, r.rid)
        for l in left.collect()
        for r in right.collect()
        if l.k == r.k
        and r.rt >= l.lt - datetime.timedelta(minutes=30)
        and r.rt <= l.lt + datetime.timedelta(minutes=15)
    }
    assert got == expected
    # No duplicate pairs from the 3-band replication.
    rows = interval_join(
        left, right, on=["k"], left_time="lt", right_time="rt",
        lower="30 minutes", upper="15 minutes",
    ).count()
    assert rows == len(expected)


def test_salted_join_matches_plain_join(spark):
    left = spark.range(0, 1000).select(
        (F.col("id") % 7).alias("k"), F.col("id").alias("lv")
    )
    right = spark.createDataFrame(
        [(i, f"r{i}") for i in range(7)], "k long, rv string"
    )
    plain = {(r.k, r.lv, r.rv) for r in left.join(right, "k").collect()}
    salted = {(r.k, r.lv, r.rv) for r in salted_join(left, right, "k", salt=8).collect()}
    assert salted == plain
    assert len(salted) == 1000


def test_runtime_bloom_filter_injected_and_preserves_semantics(spark, tmp_path):
    """The third runtime-optimization pillar certified (after AQE
    coalesce/skew): InjectRuntimeFilter plants a bloom filter from the
    SELECTIVE side of a shuffle join onto the big side's scan — at 100 TB
    this prunes the fact scan before the shuffle, the difference between
    reading a partition and reading a table. Thresholds are lowered so the
    rule fires at test scale (defaults need a >=10 GB application-side
    scan); result equality with the rule off proves it is pure pruning."""
    fact_p, dim_p = str(tmp_path / "fact"), str(tmp_path / "dim")
    spark.range(0, 200_000).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("v")
    ).write.parquet(fact_p)
    spark.range(0, 50_000).select(
        F.col("id").alias("k"), F.col("id").cast("string").alias("name")
    ).write.parquet(dim_p)
    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",  # force shuffle join
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "1KB",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        fact = spark.read.parquet(fact_p)
        dim = spark.read.parquet(dim_p).filter(F.col("k") % 1000 == 0)
        joined = fact.join(dim, "k")
        got = {(r.k, r.v, r.name) for r in joined.collect()}
        assert len(got) == 50
        plan = joined._jdf.queryExecution().optimizedPlan().toString()
        assert "bloom" in plan.lower(), "runtime bloom filter was not injected"

        spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
        fact2 = spark.read.parquet(fact_p)
        dim2 = spark.read.parquet(dim_p).filter(F.col("k") % 1000 == 0)
        unfiltered = fact2.join(dim2, "k")
        assert {(r.k, r.v, r.name) for r in unfiltered.collect()} == got
        assert "bloom" not in (
            unfiltered._jdf.queryExecution().optimizedPlan().toString().lower()
        )
    finally:
        spark.conf.unset("spark.sql.optimizer.runtime.bloomFilter.enabled")
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_aqe_skew_join_splits_and_preserves_semantics(spark):
    """The engine's stance on skew at scale, certified end-to-end: AQE's
    OptimizeSkewedJoin splits the hot partition of a bare sort-merge join
    (the plan literally shows SortMergeJoin(skew=true) + AQEShuffleRead
    skewed) and the result is identical to the unsplit join and to the
    manual salted_join. Thresholds are lowered so the optimization fires
    at test scale; at 100 TB the defaults (256 MB / 5x median) fire on
    real hot keys.

    Also documents WHY salted_join still exists: with a groupBy on the
    join key downstream, OptimizeSkewedJoin declines (splitting would
    break the required distribution), so the agg-after-join shape needs
    the salt — asserted below by the absence of the skew marker."""
    skew_confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",  # force SMJ
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2.0",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "32KB",
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
    }
    saved = {k: spark.conf.get(k, None) for k in skew_confs}
    try:
        for k, v in skew_confs.items():
            spark.conf.set(k, v)
        # 90% of 300k rows on one key; 97 cold keys carry the rest
        big = spark.range(0, 300_000).select(
            F.when(F.col("id") % 10 < 9, F.lit("hot"))
            .otherwise((F.col("id") % 97).cast("string"))
            .alias("k"),
            F.col("id").alias("v"),
        )
        right = spark.range(0, 98).select(
            F.when(F.col("id") == 97, F.lit("hot"))
            .otherwise(F.col("id").cast("string"))
            .alias("k"),
            (F.col("id") * 2).alias("w"),
        )
        joined = big.join(right, "k")
        got = {(r.k, r.v, r.w) for r in joined.collect()}
        plan = joined._jdf.queryExecution().toString()
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan, "AQE did not split the skewed partition"

        # semantics preserved: identical to the join with skew-split off
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
        unsplit = {(r.k, r.v, r.w) for r in big.join(right, "k").collect()}
        assert got == unsplit
        # and to the manual salted path (the agg-friendly alternative)
        salted = {
            (r.k, r.v, r.w) for r in salted_join(big, right, "k", salt=8).collect()
        }
        assert got == salted

        # the agg-after-join shape: distribution requirement forbids the
        # split, so the skew marker must NOT appear — the case salted_join
        # is for
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
        agged = big.join(right, "k").groupBy("k").agg(F.count(F.lit(1)).alias("n"))
        agged.collect()
        assert "skew=true" not in agged._jdf.queryExecution().toString()
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
