"""Custom stateful streaming (applyInPandasWithState sessionization) and
streaming dedup (dropDuplicatesWithinWatermark):

- crafted-input session closure by in-batch gap, cross-batch gap, and
  event-time timeout; open tail held back,
- drained real-data sessions == the oracle-checked batch session_window
  aggregate minus sessions still open at the final watermark,
- at-least-once duplicates collapse to one row.
"""

from __future__ import annotations

import datetime
import glob
import os

from pyspark.sql import Window
from pyspark.sql import functions as F

from bigdatapipelne_spark.sources.testdata import load_table
from bigdatapipelne_spark.streaming.fraud import (
    EVENTS_SCHEMA,
    read_events_stream,
    run_available_now,
)
from bigdatapipelne_spark.streaming.sessions import deduped_stream, sessionize_stream

from .conftest import SF_SMALL


def _ev(event_id: int, ts_sec: float, user_id: int, value: float):
    ts = datetime.datetime(2024, 1, 1) + datetime.timedelta(seconds=ts_sec)
    return (event_id, ts, user_id, "purchase", value, "{}")


def _write_file(spark, rows, src_dir: str, seq: int = 0) -> None:
    before = set(glob.glob(os.path.join(src_dir, "*.parquet")))
    spark.createDataFrame(rows, EVENTS_SCHEMA).coalesce(1).write.mode("append").parquet(
        src_dir
    )
    stamp = 1700000000 + seq * 60
    for f in set(glob.glob(os.path.join(src_dir, "*.parquet"))) - before:
        os.utime(f, (stamp, stamp))


def test_session_stream_watermark_gap_guard(spark, tmp_path):
    # watermark > gap breaks the batch-equivalence precondition (an event
    # can arrive a whole gap older than the open session): must refuse.
    import pytest

    src = str(tmp_path / "src")
    _write_file(spark, [_ev(1, 0, 1, 1.0)], src, 0)
    sdf = read_events_stream(spark, src, fmt="parquet")
    with pytest.raises(ValueError, match="watermark"):
        sessionize_stream(sdf, gap="10 seconds", watermark="1 minutes")


def test_session_stream_crafted(spark, tmp_path):
    src, out, cp = (str(tmp_path / d) for d in ("src", "out", "cp"))
    # user 1: session A (0s,10s) then — after a >60s gap — session B
    # (200s,210s); user 2: one event; user 9's far-future event pushes the
    # final watermark past every timeout except its own session's.
    _write_file(spark, [_ev(1, 0, 1, 10.0), _ev(2, 10, 1, 5.5), _ev(3, 5, 2, 7.25)], src, 0)
    _write_file(spark, [_ev(4, 200, 1, 1.0), _ev(5, 210, 1, 2.0)], src, 1)
    _write_file(spark, [_ev(6, 1000, 9, 0.5)], src, 2)

    sdf = read_events_stream(spark, src, fmt="parquet", max_files_per_trigger=1)
    run_available_now(sessionize_stream(sdf, gap="1 minutes", watermark="10 seconds"), out, cp)

    t0 = datetime.datetime(2024, 1, 1)

    def at(sec):
        return t0 + datetime.timedelta(seconds=sec)

    got = sorted(map(tuple, spark.read.parquet(out).collect()))
    assert got == [
        (1, at(0), at(70), 15.5, 2),     # closed by the cross-batch gap
        (1, at(200), at(270), 3.0, 2),   # closed by event-time timeout
        (2, at(5), at(65), 7.25, 1),     # closed by event-time timeout
        # user 9's session is still open at the final watermark: held back
    ]


def test_session_stream_matches_batch(spark, tmp_path):
    """Real data: drained stateful sessions == batch session_window(30 min)
    minus each user's final session when its timeout lies beyond the final
    watermark (ms-floored, exactly as the state store compares)."""
    ev = load_table(spark, SF_SMALL, "events")
    src, out, cp = (str(tmp_path / d) for d in ("src", "out", "cp"))

    ranked = ev.withColumn("rn", F.row_number().over(Window.orderBy("ts", "event_id")))
    total = ev.count()
    per = (total + 2) // 3
    for i in range(3):
        part = ranked.filter(
            (F.col("rn") > i * per) & (F.col("rn") <= (i + 1) * per)
        ).drop("rn")
        part.coalesce(1).write.mode("append").parquet(src)
        stamp = 1700000000 + i * 60
        newest = max(glob.glob(os.path.join(src, "*.parquet")), key=os.path.getmtime)
        os.utime(newest, (stamp, stamp))

    sdf = read_events_stream(spark, src, fmt="parquet", max_files_per_trigger=1)
    run_available_now(
        sessionize_stream(sdf, gap="30 minutes", watermark="10 seconds"), out, cp
    )
    got = sorted(map(tuple, spark.read.parquet(out).collect()))

    batch = (
        ev.groupBy(F.session_window("ts", "30 minutes").alias("sw"), "user_id")
        .agg(
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select(
            "user_id",
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            "sum_value",
            "n_events",
        )
    )
    max_ts = ev.agg(F.max("ts")).first()[0]
    final_wm_ms = (
        int(max_ts.replace(tzinfo=datetime.timezone.utc).timestamp() * 1000) - 10_000
    )
    rows = batch.collect()
    last_start = {}
    for r in rows:
        cur = last_start.get(r.user_id)
        if cur is None or r.session_start > cur:
            last_start[r.user_id] = r.session_start
    expected = []
    for r in rows:
        end_ms = int(
            r.session_end.replace(tzinfo=datetime.timezone.utc).timestamp() * 1000
        )
        is_last = r.session_start == last_start[r.user_id]
        if (not is_last) or end_ms <= final_wm_ms:
            expected.append(
                (r.user_id, r.session_start, r.session_end, r.sum_value, r.n_events)
            )
    assert got == sorted(expected)
    assert len(got) > 0


def test_dedup_stream_collapses_replays(spark, tmp_path):
    """At-least-once replays (same event_id, same event time) across
    micro-batches within the watermark horizon emit exactly once."""
    src, out, cp = (str(tmp_path / d) for d in ("src", "out", "cp"))
    _write_file(spark, [_ev(1, 0, 1, 10.0), _ev(2, 1, 1, 5.0)], src, 0)
    # Replay of event 2 plus one new event.
    _write_file(spark, [_ev(2, 1, 1, 5.0), _ev(3, 2, 2, 1.0)], src, 1)

    sdf = read_events_stream(spark, src, fmt="parquet", max_files_per_trigger=1)
    run_available_now(
        deduped_stream(sdf, keys=["event_id"], watermark="10 seconds"), out, cp
    )
    got = spark.read.parquet(out)
    assert got.count() == 3
    assert sorted(r.event_id for r in got.collect()) == [1, 2, 3]


def test_stream_stream_join_across_batches(spark, tmp_path):
    """A view buffered in batch 0's join state matches a purchase arriving
    in batch 1; a purchase outside the lookback window doesn't."""
    from bigdatapipelne_spark.streaming.joins import correlate_streams

    src, out, cp = (str(tmp_path / d) for d in ("src", "out", "cp"))
    _write_file(spark, [_ev(1, 0, 1, 1.0)], src, 0)                # view @0s
    _write_file(spark, [_ev(2, 30, 1, 9.0), _ev(3, 300, 1, 8.0)], src, 1)

    def side(pred, cols):
        s = read_events_stream(spark, src, fmt="parquet", max_files_per_trigger=1)
        return s.filter(pred).select(
            "user_id", *[F.col(c).alias(a) for c, a in cols.items()]
        )

    views = side(F.col("event_id") == 1, {"event_id": "view_id", "ts": "vts"})
    purchases = side(
        F.col("event_id") != 1, {"event_id": "purchase_id", "ts": "pts"}
    )
    joined = correlate_streams(
        purchases, views, key="user_id", left_time="pts", right_time="vts",
        lookback="1 minutes",
    )
    run_available_now(joined, out, cp)
    got = sorted((r.purchase_id, r.view_id) for r in spark.read.parquet(out).collect())
    # purchase @30s is within 1 min of the view @0s; purchase @300s is not.
    assert got == [(2, 1)]
