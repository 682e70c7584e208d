"""Structured Streaming semantics (SURVEY.md §2.4 W1-W8, §3.2):

- drained stream == batch query modulo the final-watermark tail (lambda
  parity by construction),
- late rows beyond the watermark are dropped (W3),
- the checkpoint is a job bookmark: restarts process only new files, state
  carries across runs, re-running without new data emits nothing (W5/W6 +
  Glue `--job-bookmark-enable` parity, historical.py:358),
- foreachBatch upsert keeps last-writer-wins serving rows (S13/S14/L3).
"""

from __future__ import annotations

import datetime
import os

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from bigdatapipelne_spark.sources.testdata import load_table
from bigdatapipelne_spark.streaming.fraud import (
    EVENTS_SCHEMA,
    fraud_alerts,
    read_events_stream,
    read_serving,
    run_available_now,
    stream_to_serving,
)

from .conftest import SF_SMALL

UTC = datetime.timezone.utc


def _ev(event_id: int, ts_sec: float, user_id: int, value: float):
    ts = datetime.datetime(2024, 1, 1, tzinfo=UTC) + datetime.timedelta(seconds=ts_sec)
    return (event_id, ts.replace(tzinfo=None), user_id, "purchase", value, "{}")


def _write_file(spark, rows, src_dir: str, seq: int = 0) -> None:
    """Append one parquet file; pin its mtime by ``seq`` so the file stream
    source (which orders by modification time) sees files in write order
    even when writes land within the same clock tick."""
    import glob

    before = set(glob.glob(os.path.join(src_dir, "*.parquet")))
    spark.createDataFrame(rows, EVENTS_SCHEMA).coalesce(1).write.mode("append").parquet(
        src_dir
    )
    stamp = 1700000000 + seq * 60
    for f in set(glob.glob(os.path.join(src_dir, "*.parquet"))) - before:
        os.utime(f, (stamp, stamp))


def _drain(spark, src, out, cp, max_files=1):
    sdf = read_events_stream(
        spark, src, fmt="parquet", max_files_per_trigger=max_files
    )
    run_available_now(fraud_alerts(sdf), out, cp)
    return spark.read.parquet(out)


def test_stream_matches_batch(spark, tmp_path):
    """Drained stream over time-sorted files == batch fraud query minus the
    windows still open at the final watermark (max ts - 10 s)."""
    ev = load_table(spark, SF_SMALL, "events")
    src = str(tmp_path / "src")
    # Three contiguous time ranges -> three files -> three micro-batches
    # with an advancing watermark and zero late rows.
    ranked = ev.withColumn(
        "rn", F.row_number().over(Window.orderBy("ts", "event_id"))
    )
    total = ev.count()
    per = (total + 2) // 3
    for i in range(3):
        part = ranked.filter(
            (F.col("rn") > i * per) & (F.col("rn") <= (i + 1) * per)
        ).drop("rn")
        part.coalesce(1).write.mode("append").parquet(src)

    got = _drain(spark, src, str(tmp_path / "out"), str(tmp_path / "cp"))

    max_ts = ev.agg(F.max("ts")).first()[0]
    cutoff = max_ts - datetime.timedelta(seconds=10)
    expected = fraud_alerts(ev).filter(F.col("window_end") <= F.lit(cutoff))

    got_rows = sorted(map(tuple, got.collect()))
    exp_rows = sorted(map(tuple, expected.collect()))
    assert got_rows == exp_rows
    assert len(got_rows) > 0


def test_late_data_dropped(spark, tmp_path):
    """W3: once the watermark finalizes and emits a window, a late row for
    it is dropped — it neither re-opens the window nor duplicates the
    append-mode output (same observable semantics as Flink's default late
    handling, flink_app/app.py:52).

    (Rows late-but-within-state are still merged — that is what the 10 s
    bounded out-of-orderness *means*; the drop applies post-eviction.)"""
    src = str(tmp_path / "src")
    # Batch 0: [0,10) collects 60; max ts 31 -> watermark becomes 21 s.
    _write_file(spark, [_ev(1, 1.0, 1, 60.0), _ev(2, 31.0, 1, 60.0)], src, seq=0)
    # Batch 1 (wm=21): emits + evicts [0,10)=60. Advances wm to 25.
    _write_file(spark, [_ev(3, 35.0, 1, 60.0)], src, seq=1)
    # Batch 2 (wm=25): ts=2 s targets the already-emitted window -> dropped.
    _write_file(spark, [_ev(4, 2.0, 1, 60.0), _ev(5, 45.0, 1, 60.0)], src, seq=2)

    got = _drain(spark, src, str(tmp_path / "out"), str(tmp_path / "cp"))
    rows = [(r.window_start.second, r.sum_value) for r in got.collect()]
    # Exactly one emission of [0,10) with the on-time sum; the late 60 is
    # gone (batch over the same input would report 120).
    assert rows == [(0, 60.0)]


def test_checkpoint_is_a_bookmark(spark, tmp_path):
    """W5/W6 + incremental parity: a second run with the same checkpoint
    processes only new files; window state survives the restart; a third
    run with nothing new emits nothing."""
    src = str(tmp_path / "src")
    out, cp = str(tmp_path / "out"), str(tmp_path / "cp")

    # Run 1: watermark only reaches 5 s -> nothing closes, nothing emitted.
    _write_file(spark, [_ev(1, 1.0, 1, 60.0), _ev(2, 15.0, 1, 60.0)], src, seq=0)
    got1 = _drain(spark, src, out, cp)
    assert got1.count() == 0

    # Run 2 (restart, new file): watermark 25 s closes [0,10) and [10,20) —
    # their state was built in run 1 and must survive the restart.
    _write_file(spark, [_ev(3, 35.0, 1, 60.0)], src, seq=1)
    got2 = _drain(spark, src, out, cp)
    rows = {(r.window_start.second, r.sum_value) for r in got2.collect()}
    assert rows == {(0, 60.0), (10, 60.0)}

    # Run 3: no new files -> no reprocessing, no duplicate emissions.
    got3 = _drain(spark, src, out, cp)
    assert sorted(map(tuple, got3.collect())) == sorted(map(tuple, got2.collect()))


def test_stream_to_serving_upsert(spark, tmp_path):
    """S13/S14/L3: update-mode foreachBatch upsert — a window whose sum grows
    across batches ends up as ONE serving row with the final sum."""
    src = str(tmp_path / "src")
    serving = str(tmp_path / "serving")
    cp = str(tmp_path / "cp")

    _write_file(spark, [_ev(1, 1.0, 1, 60.0)], src, seq=0)
    _write_file(spark, [_ev(2, 2.0, 1, 60.0)], src, seq=1)  # same window, on time

    sdf = read_events_stream(spark, src, fmt="parquet", max_files_per_trigger=1)
    stream_to_serving(
        fraud_alerts(sdf), serving, ["user_id", "window_start"], cp
    )

    rows = read_serving(spark, serving).collect()
    assert len(rows) == 1
    assert rows[0].sum_value == 120.0
    assert rows[0].n_events == 2
    assert "__bucket" not in read_serving(spark, serving).columns


def _serving_file_state(serving: str) -> dict[str, tuple[int, float]]:
    state = {}
    for root, _dirs, files in os.walk(serving):
        for f in files:
            if f.endswith(".parquet"):
                p = os.path.join(root, f)
                st = os.stat(p)
                state[p] = (st.st_size, st.st_mtime)
    return state


def test_stream_to_serving_rewrites_only_touched_buckets(spark, tmp_path):
    """The per-batch serving rewrite is bounded by the BATCH, not the
    table: a micro-batch whose keys land in one hash bucket leaves every
    other bucket's files byte-identical on disk (same path/size/mtime) —
    the parquet analog of the reference consumer's O(batch) per-record
    put (lambda_app/consumer/function.py:16-24)."""
    src = str(tmp_path / "src")
    serving = str(tmp_path / "serving")
    cp = str(tmp_path / "cp")

    # seed: 12 users in 12 separate windows -> rows spread over many buckets
    seed = [_ev(i, 20.0 * i, i, 60.0) for i in range(1, 13)]
    _write_file(spark, seed, src, seq=0)
    sdf = read_events_stream(spark, src, fmt="parquet", max_files_per_trigger=1)
    stream_to_serving(fraud_alerts(sdf), serving, ["user_id", "window_start"], cp)
    before = _serving_file_state(serving)
    assert len({os.path.dirname(p) for p in before}) > 1, "seed spans buckets"

    # delta: one new window for ONE existing user — touches one bucket
    _write_file(spark, [_ev(100, 1000.0, 1, 75.0)], src, seq=1)
    sdf = read_events_stream(spark, src, fmt="parquet", max_files_per_trigger=1)
    stream_to_serving(fraud_alerts(sdf), serving, ["user_id", "window_start"], cp)
    after = _serving_file_state(serving)

    rows = read_serving(spark, serving)
    assert rows.count() == 13  # 12 seed windows + the new one, all live

    surviving = {p: s for p, s in before.items() if p in after}
    untouched = [p for p, s in surviving.items() if after[p] == s]
    # every pre-existing file outside the touched bucket dir must survive
    # byte-identical; only the touched bucket may differ
    changed_dirs = {
        os.path.dirname(p)
        for p in set(before) | set(after)
        if before.get(p) != after.get(p)
    }
    assert len(changed_dirs) == 1, (
        f"batch touching one bucket rewrote {len(changed_dirs)} bucket dirs: "
        f"{sorted(changed_dirs)}"
    )
    assert untouched, "at least one bucket must survive byte-identical"


def test_stream_stream_left_outer_emission(spark, tmp_path):
    """Left-outer stream-stream join: matched rows emit like the inner
    join; an unmatched left row emits null-extended only once the final
    watermark passes its event time (match impossible); a left row still
    inside the watermark stays unemitted — the append-tail rule."""
    from pyspark.sql.types import (
        LongType,
        StructField,
        StructType,
        TimestampType,
    )

    from bigdatapipelne_spark.streaming.joins import correlate_streams

    t0 = datetime.datetime(2024, 1, 1)

    def at(sec):
        return t0 + datetime.timedelta(seconds=sec)

    p_schema = StructType(
        [
            StructField("user_id", LongType()),
            StructField("purchase_id", LongType()),
            StructField("pts", TimestampType()),
        ]
    )
    v_schema = StructType(
        [
            StructField("user_id", LongType()),
            StructField("view_id", LongType()),
            StructField("vts", TimestampType()),
        ]
    )
    # p1 matched; p2 unmatched + closed by the final watermark (990 s);
    # p3 unmatched but at the watermark frontier -> held back.
    purchases = [(1, 100, at(100)), (2, 200, at(200)), (3, 300, at(1000))]
    # v1 matches p1; v99 only advances the right-side watermark.
    views = [(1, 900, at(50)), (99, 999, at(1000))]

    p_src, v_src = str(tmp_path / "p"), str(tmp_path / "v")
    spark.createDataFrame(purchases, p_schema).coalesce(1).write.parquet(p_src)
    spark.createDataFrame(views, v_schema).coalesce(1).write.parquet(v_src)

    joined = correlate_streams(
        spark.readStream.schema(p_schema).parquet(p_src),
        spark.readStream.schema(v_schema).parquet(v_src),
        key="user_id",
        left_time="pts",
        right_time="vts",
        lookback="1 minutes",
        watermark="10 seconds",
        how="left_outer",
    )
    out, cp = str(tmp_path / "out"), str(tmp_path / "cp")
    run_available_now(joined, out, cp)
    got = {
        (r.purchase_id, r.view_id)
        for r in spark.read.parquet(out).collect()
    }
    assert got == {(100, 900), (200, None)}


def test_enrich_stream_matches_batch_and_keeps_unmatched(spark, tmp_path):
    """Stream-static enrichment: drained stream⋈dim == batch join, and the
    left join keeps events whose key misses the dim (facts never drop)."""
    from bigdatapipelne_spark.streaming.joins import enrich_stream

    ev = load_table(spark, SF_SMALL, "events").limit(200)
    src = str(tmp_path / "src")
    ev.coalesce(1).write.mode("append").parquet(src)

    # Dim covers only even user ids -> odd-id events must survive with nulls.
    dim = (
        ev.select("user_id").distinct()
        .filter(F.col("user_id") % 2 == 0)
        .withColumn("segment", F.concat(F.lit("seg_"), F.col("user_id") % 3))
    )

    stream = spark.readStream.schema(ev.schema).parquet(src)
    enriched = enrich_stream(stream, dim, "user_id")
    out = str(tmp_path / "out")
    (
        enriched.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "cp"))
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    got = sorted(map(tuple, spark.read.parquet(out).collect()))
    exp = sorted(map(tuple, enrich_stream(ev, dim, "user_id").collect()))
    assert got == exp
    assert len(got) == 200  # left join: every event survives
    assert any(r[-1] is None for r in got)  # odd ids enriched with null


def test_scd2_stream_drain_equals_snapshot(spark, tmp_path):
    from bigdatapipelne_spark.operators.scd import scd2_snapshot
    from bigdatapipelne_spark.streaming.scd import (
        read_dim,
        scd2_stream_to_dim,
        stage_ordered_files,
    )

    feed = spark.createDataFrame(
        [  # batch 1: v1 + a restatement; batch 2: change, change-back
            (1, 10, 100, 1), (1, 20, 101, 1), (2, 15, 200, 9),
            (1, 30, 102, 2), (1, 40, 103, 1), (3, 35, 300, 5),
        ],
        "user_id int, ts int, event_id int, plan int",
    )
    b1 = feed.filter("ts < 25")
    b2 = feed.filter("ts >= 25")
    staging = str(tmp_path / "staged")
    stage_ordered_files([b1, b2], staging)

    src = (
        spark.readStream.schema(feed.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(staging)
    )
    dim_path = str(tmp_path / "dim")
    scd2_stream_to_dim(
        src, dim_path, str(tmp_path / "cp"),
        keys=["user_id"], ts_col="ts", attrs=["plan"], tiebreak=["event_id"],
    )
    got = sorted(map(tuple, read_dim(spark, dim_path).collect()))
    want = sorted(map(tuple, scd2_snapshot(
        feed, keys=["user_id"], ts_col="ts", attrs=["plan"],
        tiebreak=["event_id"],
    ).collect()))
    assert got == want


def test_size_state_partitions_workload_sizing():
    """State partitions scale with state volume: floor at tiny SF, linear
    past rows_per_partition, cap honored (the run_available_now knob —
    round-10 drain constant fix)."""
    from bigdatapipelne_spark.streaming.joins import size_state_partitions

    assert size_state_partitions(0) == 4
    assert size_state_partitions(100_000) == 4  # sf0.1 events
    assert size_state_partitions(1_000_000) == 4
    assert size_state_partitions(10_000_000) == 40  # sf10: ceil(10M/250k)
    assert size_state_partitions(10_000_000, cap=32) == 32
    assert size_state_partitions(250_001) == 4  # ceil -> 2, floor wins
    assert size_state_partitions(2_000_000, rows_per_partition=100_000) == 20


def test_run_available_now_state_partitions_sets_and_restores(spark, tmp_path):
    """The drain harness pins the workload-sized state partition count into
    the streaming query (checkpoint offsets record it) and restores the
    session conf afterwards, even though the query ran with the override."""
    import json

    events = load_table(spark, SF_SMALL, "events").select("event_id", "user_id", "ts")
    src_dir = str(tmp_path / "src")
    events.write.parquet(src_dir)

    prev = spark.conf.get("spark.sql.shuffle.partitions")
    s = (
        spark.readStream.schema(spark.read.parquet(src_dir).schema)
        .parquet(src_dir)
        .withWatermark("ts", "10 seconds")
        .dropDuplicates(["event_id"])
    )
    out, cp = str(tmp_path / "out"), str(tmp_path / "cp")
    run_available_now(s, out, cp, state_partitions=5)
    assert spark.conf.get("spark.sql.shuffle.partitions") == prev

    # The checkpoint's offset log records the pinned shuffle-partition
    # count — the knob actually reached the streaming query.
    offset_files = sorted(
        f for f in os.listdir(os.path.join(cp, "offsets")) if not f.startswith(".")
    )
    with open(os.path.join(cp, "offsets", offset_files[0])) as f:
        lines = f.read().splitlines()
    conf = json.loads(lines[1])["conf"]
    assert conf["spark.sql.shuffle.partitions"] == "5"


def test_near_dup_stream_drain_matches_batch_and_catches_cross_batch(
    spark, tmp_path
):
    """The streaming standing-index near-dup drain (streaming/
    dedup_stream.py): corpus pairs across micro-batches equal the
    one-shot batch probe, and a planted cross-batch near-copy — doc Y in
    batch 2 is doc X from batch 1 plus one token, invisible to any
    per-batch standing-index probe — is caught by the run-ledger probe
    and lands in the delta_pairs side sink."""
    from bigdatapipelne_spark.operators.dedup import (
        build_near_dup_index,
        incremental_near_duplicates,
        save_near_dup_index,
    )
    from bigdatapipelne_spark.streaming.dedup_stream import (
        read_delta_pairs,
        run_near_dup_probe_stream,
    )
    from bigdatapipelne_spark.streaming.scd import stage_ordered_files

    docs = load_table(spark, SF_SMALL, "documents").select("doc_id", "text")
    corpus = docs.filter(F.col("doc_id") % 3 != 0)
    # batch 1 carries X (a corpus near-copy, so corpus_pairs is non-empty
    # too); batch 2 carries Y = X + one token (the cross-batch plant).
    x = corpus.orderBy("doc_id").limit(1).select(
        F.lit(900_000).alias("doc_id"),
        F.concat("text", F.lit(" drift")).alias("text"),
    )
    y = x.select(
        F.lit(900_001).alias("doc_id"),
        F.concat("text", F.lit(" more")).alias("text"),
    )
    b1 = docs.filter(F.col("doc_id") % 3 == 0).unionByName(x)
    b2 = docs.filter(F.col("doc_id") % 9 == 1).select(
        (F.col("doc_id") + F.lit(1 << 40)).alias("doc_id"), "text"
    ).unionByName(y)

    ix = build_near_dup_index(corpus, "doc_id", "text")
    name = "nd_ix_drain_t"
    try:
        save_near_dup_index(ix, name, str(tmp_path / "ndix"))
        staging = str(tmp_path / "staging")
        stage_ordered_files([b1, b2], staging)
        out_root = str(tmp_path / "out")
        got = run_near_dup_probe_stream(spark, staging, name, out_root)

        want = incremental_near_duplicates(
            b1.unionByName(b2), corpus, "doc_id", "text"
        )
        assert sorted(map(tuple, got.collect())) == sorted(
            map(tuple, want.collect())
        )

        cross = read_delta_pairs(spark, out_root).collect()
        assert any(
            r.delta_id == 900_001 and r.ledger_id == 900_000 and r.jaccard >= 0.5
            for r in cross
        ), cross
    finally:
        for t in (f"{name}_bands", f"{name}_shingles", f"{name}_sizes"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_near_dup_stream_drain_plan_audit_trips_on_unbucketed_index(
    spark, tmp_path
):
    """The in-stream zero-index-shuffle assertion must actually fire: an
    UNBUCKETED index registered under the expected catalog names (with
    broadcast disabled so its exchanges are visible — at toy SF the
    planner otherwise hides the re-shuffle behind a broadcast) blows the
    hash-exchange budget and aborts the stream."""
    from pyspark.errors.exceptions.captured import StreamingQueryException

    from bigdatapipelne_spark.operators.dedup import build_near_dup_index
    from bigdatapipelne_spark.streaming.dedup_stream import (
        run_near_dup_probe_stream,
    )
    from bigdatapipelne_spark.streaming.scd import stage_ordered_files

    docs = load_table(spark, SF_SMALL, "documents").select("doc_id", "text")
    corpus = docs.filter(F.col("doc_id") % 3 != 0)
    delta = docs.filter(F.col("doc_id") % 3 == 0)

    ix = build_near_dup_index(corpus, "doc_id", "text")
    name = "nd_ix_trip_t"
    bcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        for part in ("bands", "shingles", "sizes"):
            getattr(ix, part).write.saveAsTable(f"{name}_{part}")
        staging = str(tmp_path / "staging")
        stage_ordered_files([delta], staging)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        with pytest.raises(StreamingQueryException) as exc:
            run_near_dup_probe_stream(
                spark, staging, name, str(tmp_path / "out")
            )
        assert "the standing index re-shuffled" in str(exc.value)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", bcast)
        for t in (f"{name}_bands", f"{name}_shingles", f"{name}_sizes"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_near_dup_probe_exchange_budget_is_calibrated(spark, tmp_path):
    """PROBE_EXCHANGE_BUDGET is a pinned constant (so an unbucketed index
    cannot recalibrate the audit away) — this keeps it honest against the
    measured reference plan: the bucketed full-delta probe must fit the
    budget, and the unbucketed no-broadcast form must exceed it."""
    from bigdatapipelne_spark.operators.dedup import (
        build_near_dup_index,
        save_near_dup_index,
    )
    from bigdatapipelne_spark.streaming.dedup_stream import (
        PROBE_EXCHANGE_BUDGET,
        calibrate_probe_exchange_budget,
    )
    from bigdatapipelne_spark.streaming.scd import stage_ordered_files

    docs = load_table(spark, SF_SMALL, "documents").select("doc_id", "text")
    corpus = docs.filter(F.col("doc_id") % 3 != 0)
    delta = docs.filter(F.col("doc_id") % 3 == 0)

    ix = build_near_dup_index(corpus, "doc_id", "text")
    name = "nd_ix_calib_t"
    try:
        save_near_dup_index(ix, name, str(tmp_path / "ndix"))
        staging = str(tmp_path / "staging")
        stage_ordered_files([delta], staging)
        assert (
            calibrate_probe_exchange_budget(spark, staging, name)
            <= PROBE_EXCHANGE_BUDGET
        )
    finally:
        for t in (f"{name}_bands", f"{name}_shingles", f"{name}_sizes"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_stream_join_output_identical_under_rocksdb_state_store(
    spark, tmp_path
):
    """State-store provider is an executor-memory decision, never a
    semantics one: the same left-outer stream-stream join drained under
    the default on-heap HDFS-backed provider and under RocksDB (the
    at-scale backend the gated purchase_view_outer_drain runs) must emit
    row-identical output. Also pins that the RocksDB drain really used
    RocksDB (zip-snapshot state layout, not the HDFS .delta files)."""
    import glob as _glob

    from bigdatapipelne_spark.streaming.fraud import (
        ROCKSDB_PROVIDER,
        read_events_parquet_stream,
        run_available_now,
    )
    from bigdatapipelne_spark.streaming.joins import correlate_streams

    src = os.path.join(SF_SMALL, "events.parquet")

    def drain(provider, tag):
        def side(event_type, cols):
            s = read_events_parquet_stream(spark, src)
            s = s.filter(F.col("event_type") == event_type)
            return s.select(
                "user_id", *[F.col(c).alias(a) for c, a in cols.items()]
            )

        joined = correlate_streams(
            side("purchase", {"event_id": "purchase_id", "ts": "pts"}),
            side("view", {"event_id": "view_id", "ts": "vts"}),
            key="user_id", left_time="pts", right_time="vts",
            lookback="6 hours", how="left_outer",
        )
        out = str(tmp_path / f"out_{tag}")
        cp = str(tmp_path / f"cp_{tag}")
        run_available_now(
            joined, out, cp, state_partitions=4, state_store_provider=provider
        )
        return spark.read.parquet(out), cp

    hdfs_df, hdfs_cp = drain(None, "hdfs")
    rocks_df, rocks_cp = drain(ROCKSDB_PROVIDER, "rocks")
    assert sorted(map(tuple, hdfs_df.collect())) == sorted(
        map(tuple, rocks_df.collect())
    )
    # provider actually took effect: RocksDB snapshots state as N.zip
    # (under state/0/<part>/<joinStoreName>/), the HDFS provider as
    # N.delta files
    assert _glob.glob(
        os.path.join(rocks_cp, "state", "**", "*.zip"), recursive=True
    )
    assert not _glob.glob(
        os.path.join(rocks_cp, "state", "**", "*.delta"), recursive=True
    )
    assert _glob.glob(
        os.path.join(hdfs_cp, "state", "**", "*.delta"), recursive=True
    )


def test_sessionizer_output_identical_under_rocksdb_state_store(
    spark, tmp_path
):
    """Provider-independence for the CUSTOM-state path too: the
    applyInPandasWithState sessionizer drained under the default provider
    and under RocksDB emits row-identical sessions — together with the
    stream-stream join A/B this covers both state-store API families the
    engine uses (the windowed/join stores and the arbitrary-state
    store)."""
    import glob as _glob

    from bigdatapipelne_spark.streaming.fraud import (
        ROCKSDB_PROVIDER,
        read_events_parquet_stream,
        run_available_now,
    )
    from bigdatapipelne_spark.streaming.sessions import sessionize_stream

    src = os.path.join(SF_SMALL, "events.parquet")

    def drain(provider, tag):
        sessions = sessionize_stream(
            read_events_parquet_stream(spark, src),
            gap="30 minutes",
            watermark="10 seconds",
        )
        out = str(tmp_path / f"out_{tag}")
        cp = str(tmp_path / f"cp_{tag}")
        run_available_now(
            sessions, out, cp, state_partitions=4,
            state_store_provider=provider,
        )
        return spark.read.parquet(out), cp

    hdfs_df, _ = drain(None, "hdfs")
    rocks_df, rocks_cp = drain(ROCKSDB_PROVIDER, "rocks")
    assert sorted(map(tuple, hdfs_df.collect())) == sorted(
        map(tuple, rocks_df.collect())
    )
    assert _glob.glob(
        os.path.join(rocks_cp, "state", "**", "*.zip"), recursive=True
    )


def test_decontaminate_stream_drain_matches_batch_and_audit_trips(
    spark, tmp_path
):
    """The streaming decontamination drain: per-batch pairs across
    micro-batches equal the one-shot decontaminate, and the plan audit
    trips on an unbucketed index registered under the expected names
    (broadcast disabled so the index-side exchanges are visible)."""
    from pyspark.errors.exceptions.captured import StreamingQueryException

    from bigdatapipelne_spark.operators.dedup import (
        build_benchmark_index,
        decontaminate,
        save_benchmark_index,
    )
    from bigdatapipelne_spark.streaming.dedup_stream import (
        run_decontaminate_stream,
    )
    from bigdatapipelne_spark.streaming.scd import stage_ordered_files

    docs = load_table(spark, SF_SMALL, "documents").select("doc_id", "text")
    corpus = docs.filter(F.col("doc_id") >= 25)
    bench = docs.filter(F.col("doc_id") < 25)
    ix = build_benchmark_index(bench, "doc_id", "text")
    name = "bm_ix_drain_t"
    bcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        save_benchmark_index(ix, name, str(tmp_path / "bmix"))
        staging = str(tmp_path / "staging")
        stage_ordered_files(
            [corpus.filter(F.col("doc_id") % 2 == r) for r in range(2)],
            staging,
        )
        # compact_sink_bytes: the decon drain's post-completion sink
        # maintenance (no fold point exists — the suite is static);
        # equality below doubles as the value-neutrality certificate
        got = run_decontaminate_stream(
            spark, staging, name, str(tmp_path / "out"), threshold=0.15,
            compact_sink_bytes=128 * 1024 * 1024,
        )
        import glob as _glob

        assert _glob.glob(
            str(tmp_path / "out" / "pairs" / "__batch_id=-1")
        ), "decon sink not compacted to the base partition"
        want = decontaminate(corpus, bench, "doc_id", "text", threshold=0.15)
        assert sorted(map(tuple, got.collect())) == sorted(
            map(tuple, want.collect())
        )

        # trip: replace the catalog tables with unbucketed ones
        for part in ("shingles", "sizes"):
            spark.sql(f"DROP TABLE IF EXISTS {name}_{part}")
            getattr(ix, part).write.saveAsTable(f"{name}_{part}")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        with pytest.raises(StreamingQueryException) as exc:
            run_decontaminate_stream(
                spark, staging, name, str(tmp_path / "out2"), threshold=0.15
            )
        assert "the standing index re-shuffled" in str(exc.value)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", bcast)
        for t in (f"{name}_shingles", f"{name}_sizes"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_checkpoint_bookmark_under_rocksdb(spark, tmp_path):
    """W5/W6 under the at-scale provider: the same restart scenario as
    test_checkpoint_is_a_bookmark, with RocksDB backing the state store —
    window state built in run 1 must survive the restart out of the
    RocksDB snapshot, and a third run with nothing new emits nothing."""
    from bigdatapipelne_spark.streaming.fraud import (
        ROCKSDB_PROVIDER,
        fraud_alerts,
    )

    src = str(tmp_path / "src")
    out, cp = str(tmp_path / "out"), str(tmp_path / "cp")

    def drain():
        sdf = read_events_stream(
            spark, src, fmt="parquet", max_files_per_trigger=1
        )
        run_available_now(
            fraud_alerts(sdf), out, cp,
            state_partitions=4, state_store_provider=ROCKSDB_PROVIDER,
        )
        return spark.read.parquet(out)

    _write_file(spark, [_ev(1, 1.0, 1, 60.0), _ev(2, 15.0, 1, 60.0)], src, seq=0)
    assert drain().count() == 0  # watermark 5 s: nothing closes yet

    _write_file(spark, [_ev(3, 35.0, 1, 60.0)], src, seq=1)
    got2 = drain()  # restart: state from run 1 must close [0,10) and [10,20)
    rows = {(r.window_start.second, r.sum_value) for r in got2.collect()}
    assert rows == {(0, 60.0), (10, 60.0)}

    got3 = drain()  # no new files -> no duplicates
    assert sorted(map(tuple, got3.collect())) == sorted(map(tuple, got2.collect()))


def test_near_dup_stream_drain_resumes_from_checkpoint(spark, tmp_path):
    """The production resume story for the standing-index near-dup drain:
    a restarted drain with the same checkpoint processes ONLY the late
    file, appends its pairs, and the run ledger built by the FIRST
    invocation still catches a cross-invocation near-copy — bookmark,
    sink and ledger all continue across restarts."""
    from bigdatapipelne_spark.operators.dedup import (
        build_near_dup_index,
        incremental_near_duplicates,
        save_near_dup_index,
    )
    from bigdatapipelne_spark.streaming.dedup_stream import (
        read_delta_pairs,
        run_near_dup_probe_stream,
    )
    from bigdatapipelne_spark.streaming.scd import (
        stage_one_more_file,
        stage_ordered_files,
    )

    docs = load_table(spark, SF_SMALL, "documents").select("doc_id", "text")
    corpus = docs.filter(F.col("doc_id") % 3 != 0)
    x = corpus.orderBy("doc_id").limit(1).select(
        F.lit(900_000).alias("doc_id"),
        F.concat("text", F.lit(" drift")).alias("text"),
    )
    # y (the late file) is a near-copy of x (landed in invocation 1)
    y = x.select(
        F.lit(900_001).alias("doc_id"),
        F.concat("text", F.lit(" more")).alias("text"),
    )
    b1 = docs.filter(F.col("doc_id") % 3 == 0).unionByName(x)
    b2 = docs.filter(F.col("doc_id") % 9 == 1).select(
        (F.col("doc_id") + F.lit(1 << 40)).alias("doc_id"), "text"
    )

    name = "nd_ix_resume_t"
    try:
        save_near_dup_index(
            build_near_dup_index(corpus, "doc_id", "text"),
            name, str(tmp_path / "ndix"),
        )
        staging = str(tmp_path / "staging")
        stage_ordered_files([b1, b2], staging)
        out_root = str(tmp_path / "out")
        first = run_near_dup_probe_stream(spark, staging, name, out_root)
        n_first = first.count()

        stage_one_more_file(y, staging)
        resumed = run_near_dup_probe_stream(spark, staging, name, out_root)

        want = incremental_near_duplicates(
            b1.unionByName(b2).unionByName(y), corpus, "doc_id", "text"
        )
        assert sorted(map(tuple, resumed.collect())) == sorted(
            map(tuple, want.collect())
        )
        assert resumed.count() >= n_first
        # the ledger admitted x during invocation 1; the RESUMED stream's
        # probe of the late file must still see it
        cross = read_delta_pairs(spark, out_root).collect()
        assert any(
            r.delta_id == 900_001 and r.ledger_id == 900_000 for r in cross
        ), cross
    finally:
        for t in (f"{name}_bands", f"{name}_shingles", f"{name}_sizes"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_drain_batch_writes_are_replay_idempotent(spark, tmp_path):
    """foreachBatch is at-least-once: a replayed micro-batch must rewrite
    exactly its own partition, never append a duplicate — _write_batch's
    contract (batch-id partition + dynamic overwrite), shared by all
    three standing-index drains' sinks and ledgers."""
    from bigdatapipelne_spark.streaming.dedup_stream import (
        _read_batched,
        _write_batch,
    )

    schema = "delta_id long, corpus_id long, jaccard double"
    path = str(tmp_path / "sink")
    b0 = spark.range(5).selectExpr(
        "id as delta_id", "id + 100 as corpus_id", "0.9 as jaccard"
    )
    b1 = spark.range(3).selectExpr(
        "id + 10 as delta_id", "id + 200 as corpus_id", "0.8 as jaccard"
    )
    _write_batch(b0, path, 0)
    _write_batch(b1, path, 1)
    assert _read_batched(spark, path, schema).count() == 8
    # replay of batch 0 (same content) — no duplicates
    _write_batch(b0, path, 0)
    assert _read_batched(spark, path, schema).count() == 8
    # replay that recomputes slightly differently (e.g. post-failure with
    # a partial first write) still converges to its own latest content
    _write_batch(b0.limit(4), path, 0)
    got = _read_batched(spark, path, schema)
    assert got.count() == 7
    # batch 1 untouched throughout
    assert got.filter("delta_id >= 10").count() == 3


def test_near_dup_drain_releases_per_batch_checkpoints(spark, tmp_path):
    """Long-running-drain memory hygiene: each micro-batch's two
    checkpointed frames (shingles + bands) must be FREED when the batch
    ends — DataFrame.unpersist is a no-op on checkpointed frames, so this
    pins that release_checkpoint actually runs and works; a regression
    here re-creates the orphaned-block accumulation the DISK_ONLY
    posture exists to avoid."""
    from bigdatapipelne_spark.operators.dedup import (
        build_near_dup_index,
        save_near_dup_index,
    )
    from bigdatapipelne_spark.streaming.dedup_stream import (
        run_near_dup_probe_stream,
    )
    from bigdatapipelne_spark.streaming.scd import stage_ordered_files

    docs = load_table(spark, SF_SMALL, "documents").select("doc_id", "text")
    corpus = docs.filter(F.col("doc_id") % 3 != 0)
    delta = docs.filter(F.col("doc_id") % 3 == 0)

    name = "nd_ix_release_t"
    try:
        save_near_dup_index(
            build_near_dup_index(corpus, "doc_id", "text"),
            name, str(tmp_path / "ndix"),
        )
        staging = str(tmp_path / "staging")
        stage_ordered_files(
            [delta.filter(F.col("doc_id") % 2 == r) for r in range(2)],
            staging,
        )
        jsc = spark.sparkContext._jsc.sc()
        before = {i.id() for i in jsc.getRDDStorageInfo()}
        run_near_dup_probe_stream(
            spark, staging, name, str(tmp_path / "out")
        ).count()
        after = {i.id() for i in jsc.getRDDStorageInfo()}
        leaked = after - before
        assert not leaked, (
            f"drain leaked cached RDD blocks: {sorted(leaked)}"
        )
    finally:
        for t in (f"{name}_bands", f"{name}_shingles", f"{name}_sizes"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_fold_ledger_into_index_equals_rebuilt_and_promotes_ledger(
    spark, tmp_path
):
    """Ledger compaction (fold_ledger_into_index): after a drain admits
    two batches, folding the run ledger into the standing index must
    yield EXACTLY the index a from-scratch build over corpus ∪ admitted
    would produce (bands are re-derived from the union of the shingle
    tables — the build_near_dup_index derivation — so signatures,
    banding and the cumulative cap replay identically), the consumed
    ledger must be gone, and a resumed drain against the folded index
    must (a) pass the per-batch zero-index-shuffle audit on the folded
    layout and (b) emit a pair against a PROMOTED ledger document in the
    gated corpus_pairs sink — the pair that pre-fold only the ledger
    probe could see."""
    from bigdatapipelne_spark.operators.checkpoint import release_checkpoint
    from bigdatapipelne_spark.operators.dedup import (
        build_near_dup_index,
        save_near_dup_index,
    )
    from bigdatapipelne_spark.sources.io import fs_exists
    from bigdatapipelne_spark.streaming.dedup_stream import (
        fold_ledger_into_index,
        run_near_dup_probe_stream,
    )
    from bigdatapipelne_spark.streaming.scd import (
        stage_one_more_file,
        stage_ordered_files,
    )

    docs = load_table(spark, SF_SMALL, "documents").select("doc_id", "text")
    corpus = docs.filter(F.col("doc_id") % 3 != 0)
    # W rides batch 1 (not a corpus member); Z (batch 3, post-fold) is W
    # plus one token — pre-fold only the ledger probe could pair them.
    w = corpus.orderBy("doc_id").limit(1).select(
        F.lit(900_000).alias("doc_id"),
        F.concat("text", F.lit(" fold")).alias("text"),
    )
    z = w.select(
        F.lit(900_001).alias("doc_id"),
        F.concat("text", F.lit(" more")).alias("text"),
    )
    b1 = docs.filter(F.col("doc_id") % 9 == 0).unionByName(w)
    b2 = docs.filter(F.col("doc_id") % 9 == 3).select(
        (F.col("doc_id") + F.lit(1 << 40)).alias("doc_id"), "text"
    )
    b3 = z

    name, folded, rebuilt = "nd_fold_t", "nd_fold_t_f", "nd_fold_t_r"
    all_tables = [
        f"{n}_{p}"
        for n in (name, folded, rebuilt)
        for p in ("bands", "shingles", "sizes")
    ]
    try:
        ix = build_near_dup_index(corpus, "doc_id", "text")
        save_near_dup_index(ix, name, str(tmp_path / "ndix"))
        release_checkpoint(ix.shingles)
        staging = str(tmp_path / "staging")
        out = str(tmp_path / "out")
        stage_ordered_files([b1, b2], staging)
        run_near_dup_probe_stream(spark, staging, name, out)

        fold_ledger_into_index(
            spark, name, out, folded, str(tmp_path / "ndix_folded")
        )
        for part in ("bands", "shingles", "sizes"):
            assert not fs_exists(spark, os.path.join(out, "ledger", part))

        # folded == rebuilt-from-scratch, table by table (multiset)
        rix = build_near_dup_index(
            corpus.unionByName(b1).unionByName(b2), "doc_id", "text"
        )
        save_near_dup_index(rix, rebuilt, str(tmp_path / "ndix_rebuilt"))
        release_checkpoint(rix.shingles)
        for part in ("bands", "shingles", "sizes"):
            got = sorted(
                map(tuple, spark.table(f"{folded}_{part}").collect())
            )
            want = sorted(
                map(tuple, spark.table(f"{rebuilt}_{part}").collect())
            )
            assert got == want, f"{part}: folded != rebuilt"

        # resumed drain: same checkpoint, folded index, fresh ledger —
        # the W/Z pair is now a STANDING-INDEX hit (corpus_pairs)
        stage_one_more_file(b3, staging)
        pairs = run_near_dup_probe_stream(spark, staging, folded, out)
        assert any(
            r.delta_id == 900_001 and r.corpus_id == 900_000
            and r.jaccard >= 0.5
            for r in pairs.collect()
        )
    finally:
        for t in all_tables:
            spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_fold_ledger_without_ledger_raises(spark, tmp_path):
    from bigdatapipelne_spark.streaming.dedup_stream import (
        fold_ledger_into_index,
    )

    with pytest.raises(ValueError, match="nothing to fold"):
        fold_ledger_into_index(
            spark, "whatever", str(tmp_path / "empty"), "x", str(tmp_path / "o")
        )


def test_compact_batched_sink_preserves_rows_and_cuts_files(spark, tmp_path):
    """Drain-sink small-files maintenance: compacting a _write_batch sink
    collapses the per-batch partition dirs into one base partition with
    fewer files, reads back value-identical through _read_batched, and
    composes with a later batch's idempotent partition write."""
    import glob as _glob

    from bigdatapipelne_spark.streaming.dedup_stream import (
        _read_batched,
        _write_batch,
        compact_batched_sink,
    )

    sink = str(tmp_path / "sink")
    schema = "doc_id long, status string"
    for b in range(4):
        df = spark.range(b * 10, b * 10 + 10).select(
            F.col("id").alias("doc_id"), F.lit(f"s{b}").alias("status")
        ).repartition(4)
        _write_batch(df, sink, b)

    def nfiles():
        return len(_glob.glob(os.path.join(sink, "**", "*.parquet"), recursive=True))

    before_rows = sorted(map(tuple, _read_batched(spark, sink, schema).collect()))
    before_files = nfiles()
    n = compact_batched_sink(spark, sink)
    assert nfiles() < before_files
    assert nfiles() <= n + 0  # exactly the computed budget inside one partition
    after_rows = sorted(map(tuple, _read_batched(spark, sink, schema).collect()))
    assert after_rows == before_rows

    # a post-compaction batch writes its own partition beside the base
    df5 = spark.range(90, 95).select(
        F.col("id").alias("doc_id"), F.lit("s9").alias("status")
    )
    _write_batch(df5, sink, 9)
    final = sorted(map(tuple, _read_batched(spark, sink, schema).collect()))
    assert final == sorted(before_rows + [(i, "s9") for i in range(90, 95)])

    # a sink directory that was never created (zero staged batches) is a
    # no-op, not a raw FileNotFoundException from listFiles (r13 ADVICE:
    # run_decontaminate_stream(compact_sink_bytes=...) over an empty
    # staging dir hits exactly this)
    assert compact_batched_sink(spark, str(tmp_path / "never_written")) == 0


def test_hll_rollup_replay_union_is_idempotent(spark):
    """Round-12 foreachBatch replay audit for the HLL sketch store: a
    replayed micro-batch re-unions the SAME per-day sketches into blobs
    that already absorbed them, and HLL union is register max-merge: the
    registered-value state is unchanged under re-union, so every served
    estimate is unchanged (hll_stream_to_rollup is therefore naturally
    idempotent, no batch-id guard needed). Byte equality is deliberately
    NOT asserted — in sparse/coupon mode the serialized coupon order can
    permute under re-union while the coupon SET (and thus the estimate)
    is identical."""
    rows = [(d, u) for d in range(3) for u in range(d * 40, d * 40 + 50)]
    ev = spark.createDataFrame(rows, "day int, user_id int")
    daily = ev.groupBy("day").agg(F.hll_sketch_agg("user_id").alias("sk"))

    once = (
        daily.unionByName(daily)
        .groupBy("day")
        .agg(F.hll_union_agg("sk").alias("sk"))
    )
    twice = (
        once.unionByName(daily)
        .groupBy("day")
        .agg(F.hll_union_agg("sk").alias("sk"))
    )
    est_once = {
        r.day: r.est
        for r in once.select(
            "day", F.hll_sketch_estimate("sk").alias("est")
        ).collect()
    }
    est = {
        r.day: r.est
        for r in twice.select(
            "day", F.hll_sketch_estimate("sk").alias("est")
        ).collect()
    }
    assert est == est_once
    one_shot = {
        r.day: r.est
        for r in ev.groupBy("day")
        .agg(F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("est"))
        .collect()
    }
    assert est == one_shot


def test_serving_upsert_replay_is_idempotent(spark, tmp_path):
    """Round-12 foreachBatch replay audit for the serving sink:
    merge_into_store is a keyed last-writer-wins upsert, so re-applying
    the SAME micro-batch (an at-least-once replay) leaves the store
    byte-value identical — naturally idempotent, no batch-id guard
    needed."""
    from bigdatapipelne_spark.operators.serving import (
        merge_into_store,
        read_store,
    )

    store = str(tmp_path / "store")
    base = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "k int, v string"
    )
    merge_into_store(spark, store, base, ["k"], 4)
    batch = spark.createDataFrame([(2, "B"), (4, "d")], "k int, v string")
    merge_into_store(spark, store, batch, ["k"], 4)
    once = sorted(map(tuple, read_store(spark, store).collect()))
    merge_into_store(spark, store, batch, ["k"], 4)  # replay
    assert sorted(map(tuple, read_store(spark, store).collect())) == once
    assert once == [(1, "a"), (2, "B"), (3, "c"), (4, "d")]


def test_fold_seen_into_fingerprint_index_equals_rebuilt(spark, tmp_path):
    """The exact-dedup fold twin: folding the drain's admitted-
    fingerprint ledger into the standing index equals a from-scratch
    build_fingerprint_index over corpus ∪ admitted documents, the
    consumed ledger is deleted, and a second fold attempt raises."""
    from bigdatapipelne_spark.functions.text import fingerprint
    from bigdatapipelne_spark.operators.dedup import (
        build_fingerprint_index,
        save_fingerprint_index,
    )
    from bigdatapipelne_spark.sources.io import fs_exists
    from bigdatapipelne_spark.streaming.dedup_stream import (
        _write_batch,
        fold_seen_into_fingerprint_index,
    )

    docs = load_table(spark, SF_SMALL, "documents").select("doc_id", "text")
    corpus = docs.filter(F.col("doc_id") % 3 != 0)
    b1 = docs.filter(F.col("doc_id") % 9 == 0)
    b2 = docs.filter(F.col("doc_id") % 9 == 3)

    name, folded, rebuilt = "fp_fold_t", "fp_fold_t_f", "fp_fold_t_r"
    try:
        save_fingerprint_index(
            build_fingerprint_index(corpus, "doc_id", "text"),
            name, str(tmp_path / "fpix"),
        )
        seen = str(tmp_path / "seen")
        # the drain ledgers exactly the fingerprints that classified
        # 'new' — for disjoint fresh batches that is each batch's fps
        for i, b in enumerate((b1, b2)):
            _write_batch(
                b.select(fingerprint("text").alias("__fp")).distinct(),
                seen, i,
            )
        fold_seen_into_fingerprint_index(
            spark, name, seen, folded, str(tmp_path / "fpix_folded")
        )
        assert not fs_exists(spark, seen)

        save_fingerprint_index(
            build_fingerprint_index(
                corpus.unionByName(b1).unionByName(b2), "doc_id", "text"
            ),
            rebuilt, str(tmp_path / "fpix_rebuilt"),
        )
        got = sorted(map(tuple, spark.table(folded).collect()))
        want = sorted(map(tuple, spark.table(rebuilt).collect()))
        assert got == want

        with pytest.raises(ValueError, match="nothing to fold"):
            fold_seen_into_fingerprint_index(
                spark, folded, seen, "x", str(tmp_path / "o")
            )
    finally:
        for t in (name, folded, rebuilt):
            spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_fold_ledger_is_repeatable_across_cycles(spark, tmp_path):
    """The steady state is PERIODIC folds: drain -> fold -> drain ->
    fold again. The second fold consumes the post-first-fold ledger into
    the already-folded index, and the result must equal one
    from-scratch build over corpus ∪ all admitted batches — i.e. the
    fold is closed over its own output, not a one-shot operation."""
    from bigdatapipelne_spark.operators.checkpoint import release_checkpoint
    from bigdatapipelne_spark.operators.dedup import (
        build_near_dup_index,
        save_near_dup_index,
    )
    from bigdatapipelne_spark.streaming.dedup_stream import (
        fold_ledger_into_index,
        run_near_dup_probe_stream,
    )
    from bigdatapipelne_spark.streaming.scd import (
        stage_one_more_file,
        stage_ordered_files,
    )

    docs = load_table(spark, SF_SMALL, "documents").select("doc_id", "text")
    corpus = docs.filter(F.col("doc_id") % 3 != 0)
    b1 = docs.filter(F.col("doc_id") % 9 == 0)
    b2 = docs.filter(F.col("doc_id") % 9 == 3)

    name = "nd_refold_t"
    names = [name, f"{name}_f1", f"{name}_f2", f"{name}_r"]
    try:
        ix = build_near_dup_index(corpus, "doc_id", "text")
        save_near_dup_index(ix, name, str(tmp_path / "ix0"))
        release_checkpoint(ix.shingles)
        staging, out = str(tmp_path / "staging"), str(tmp_path / "out")

        stage_ordered_files([b1], staging)
        run_near_dup_probe_stream(spark, staging, name, out)
        fold_ledger_into_index(
            spark, name, out, f"{name}_f1", str(tmp_path / "ix1")
        )
        stage_one_more_file(b2, staging)
        run_near_dup_probe_stream(spark, staging, f"{name}_f1", out)
        fold_ledger_into_index(
            spark, f"{name}_f1", out, f"{name}_f2", str(tmp_path / "ix2")
        )

        rix = build_near_dup_index(
            corpus.unionByName(b1).unionByName(b2), "doc_id", "text"
        )
        save_near_dup_index(rix, f"{name}_r", str(tmp_path / "ixr"))
        release_checkpoint(rix.shingles)
        for part in ("bands", "shingles", "sizes"):
            got = sorted(
                map(tuple, spark.table(f"{name}_f2_{part}").collect())
            )
            want = sorted(
                map(tuple, spark.table(f"{name}_r_{part}").collect())
            )
            assert got == want, f"{part}: second fold != rebuilt"
    finally:
        for n in names:
            for part in ("bands", "shingles", "sizes"):
                spark.sql(f"DROP TABLE IF EXISTS {n}_{part}")


def test_directory_swap_refuses_to_destroy_parked_copy(spark, tmp_path):
    """Crash-recovery contract of the shared directory swap: a leftover
    <path>__old from a previous crashed swap may be the ONLY complete
    copy of the store, so both swap_parquet and compact_batched_sink
    must REFUSE to run (operator decision) rather than auto-delete it —
    the auto-delete made crash safety exactly one invocation deep
    (round-12 review finding)."""
    import os as _os

    from bigdatapipelne_spark.sources.io import swap_parquet
    from bigdatapipelne_spark.streaming.dedup_stream import (
        _write_batch,
        compact_batched_sink,
    )

    store = str(tmp_path / "store")
    df = spark.range(5).selectExpr("id AS k", "CAST(id AS STRING) AS v")
    swap_parquet(df, store)  # normal path works
    assert spark.read.parquet(store).count() == 5

    _os.makedirs(store + "__old")  # simulate a crashed previous swap
    with pytest.raises(IOError, match="refusing to swap"):
        swap_parquet(df, store)
    # the parked dir and the store are both untouched
    assert _os.path.isdir(store + "__old")
    assert spark.read.parquet(store).count() == 5

    sink = str(tmp_path / "sink")
    _write_batch(df.selectExpr("k AS doc_id", "v AS status"), sink, 0)
    _os.makedirs(sink + "__old")
    with pytest.raises(IOError, match="refusing to swap"):
        compact_batched_sink(spark, sink)
    assert _os.path.isdir(sink + "__old")
