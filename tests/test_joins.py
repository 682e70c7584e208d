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
