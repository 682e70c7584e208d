"""Long-stream amortization + state-store-provider constants for the
stateful drains (round-10 verdict items #2 and #3).

The r10 record attributed drain cells to a per-INVOCATION state-store
constant and ASSERTED it amortizes on a long-running stream; this script
measures that claim instead of asserting it:

1. **Amortization curves** — the same N-micro-batch workload (events
   split into N time-contiguous staged files) driven two ways:
   (a) ONE started stream, maxFilesPerTrigger=1, availableNow — the
       production long-running shape; per-batch triggerExecution from
       query.recentProgress;
   (b) N separate availableNow invocations against one checkpoint — the
       repeated-batch-job shape every drain gate cell pays; wall-clock
       per invocation.
   For BOTH the stream-stream left-outer join (four state stores) and
   the applyInPandasWithState sessionizer. Row counts of the two modes
   are asserted equal (same data, same semantics, different driving).

2. **Provider constants** — the gate-shaped single-file join drain under
   the default HDFS-backed provider vs RocksDB
   (streaming/fraud.ROCKSDB_PROVIDER), warm repeats, best-of.

Output: one JSON line + BENCH_drains.json. Timing caveats per
.claude/skills/verify: run alone (no concurrent JVMs), warm repeats in
one session.
"""

from __future__ import annotations

import gc
import json
import os
import shutil

import tempfile
import time

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from bigdatapipelne_spark.session import get_spark
from bigdatapipelne_spark.sources.testdata import load_table
from bigdatapipelne_spark.streaming.fraud import (
    ROCKSDB_PROVIDER,
    read_events_parquet_stream,
    run_available_now,
)
from bigdatapipelne_spark.streaming.joins import (
    correlate_streams,
    size_state_partitions,
)
from bigdatapipelne_spark.streaming.scd import _stage_indexed_file
from bigdatapipelne_spark.streaming.sessions import sessionize_stream

N_BATCHES = 20

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def stage_event_chunks(spark, tmp: str) -> tuple[str, list[str]]:
    """Split events into N_BATCHES time-contiguous chunks, each staged as
    one parquet file (a crawl/ingest micro-batch). Returns the final
    staging dir (all files, for single-stream mode) and the ordered list
    of chunk files (for one-at-a-time invocation mode)."""
    ev = load_table(spark, SF_DIR, "events").select(
        "event_id", "user_id", "event_type", "ts", "value"
    )
    chunked = ev.withColumn(
        "__chunk", F.ntile(N_BATCHES).over(Window.orderBy("ts"))
    )
    chunked = chunked.localCheckpoint(eager=True)
    staging = os.path.join(tmp, "staging")
    os.makedirs(staging)
    for i in range(N_BATCHES):
        _stage_indexed_file(
            chunked.filter(F.col("__chunk") == i + 1).drop("__chunk"),
            staging,
            i,
        )
    chunked.unpersist()
    files = sorted(
        os.path.join(staging, f) for f in os.listdir(staging)
        if f.endswith(".parquet")
    )
    return staging, files


def _events_stream(spark, path: str, max_files: int | None) -> DataFrame:
    schema = "event_id long, user_id long, event_type string, ts timestamp, value double"
    r = spark.readStream.schema(schema)
    if max_files is not None:
        r = r.option("maxFilesPerTrigger", max_files)
    return r.parquet(path)


def _join_plan(src: DataFrame) -> DataFrame:
    def side(et, cols):
        return src.filter(F.col("event_type") == et).select(
            "user_id", *[F.col(c).alias(a) for c, a in cols.items()]
        )

    return correlate_streams(
        side("purchase", {"event_id": "purchase_id", "ts": "pts"}),
        side("view", {"event_id": "view_id", "ts": "vts"}),
        key="user_id", left_time="pts", right_time="vts",
        lookback="6 hours", how="left_outer",
    )


def _session_plan(src: DataFrame) -> DataFrame:
    return sessionize_stream(src, gap="30 minutes", watermark="10 seconds")


def run_single_stream(spark, plan_fn, staging: str, tmp: str, parts: int):
    """Mode (a): one started availableNow stream over all staged files,
    one file per micro-batch. Returns (total_sec, per-batch progress
    rows, output row count)."""
    out, cp = os.path.join(tmp, "out_stream"), os.path.join(tmp, "cp_stream")
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(parts))
    try:
        t0 = time.time()
        q = (
            plan_fn(_events_stream(spark, staging, max_files=1))
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", cp)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        total = time.time() - t0
        prog = [
            {
                "batch": p["batchId"],
                "rows_in": p["numInputRows"],
                "trigger_ms": p["durationMs"].get("triggerExecution", 0),
                "add_batch_ms": p["durationMs"].get("addBatch", 0),
            }
            for p in q.recentProgress
        ]
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    n_out = spark.read.parquet(out).count()
    return total, prog, n_out


def run_invocations(spark, plan_fn, files: list[str], tmp: str, parts: int):
    """Mode (b): N separate availableNow invocations, one new staged file
    each, one shared checkpoint (the bookmark carries state across runs).
    Returns (total_sec, per-invocation wall seconds, output row count)."""
    incoming = os.path.join(tmp, "incoming")
    os.makedirs(incoming)
    out, cp = os.path.join(tmp, "out_inv"), os.path.join(tmp, "cp_inv")
    per = []
    t_all = time.time()
    for i, f in enumerate(files):
        shutil.copy2(f, os.path.join(incoming, os.path.basename(f)))
        t0 = time.time()
        run_available_now(
            plan_fn(_events_stream(spark, incoming, max_files=None)),
            out, cp, state_partitions=parts,
        )
        per.append(round(time.time() - t0, 3))
    total = time.time() - t_all
    n_out = spark.read.parquet(out).count()
    return total, per, n_out


def provider_constants(spark, reps: int = 2):
    """Gate-shaped single-file join drain (the purchase_view_outer_drain
    workload) under HDFS-backed vs RocksDB state stores, warm repeats."""
    n_events = spark.read.parquet(f"{SF_DIR}/events.parquet").count()
    parts = size_state_partitions(n_events)
    res = {}
    for tag, provider in (("hdfs", None), ("rocksdb", ROCKSDB_PROVIDER)):
        times = []
        for _ in range(reps):
            tmp = tempfile.mkdtemp(prefix=f"prov_{tag}_")
            src = read_events_parquet_stream(spark, f"{SF_DIR}/events.parquet")
            plan = _join_plan(src)
            t0 = time.time()
            run_available_now(
                plan, os.path.join(tmp, "out"), os.path.join(tmp, "cp"),
                state_partitions=parts, state_store_provider=provider,
            )
            times.append(round(time.time() - t0, 3))
            shutil.rmtree(tmp, ignore_errors=True)
            gc.collect()
        res[tag] = {"times": times, "best": min(times)}
    return res


def main() -> None:
    spark = get_spark("bench-drains", master=f"local[{CPUS}]")
    record: dict = {
        "metric": "drain_amortization",
        "unit": "sec",
        "sf_dir": SF_DIR,
        "n_batches": N_BATCHES,
        "workloads": {},
    }
    for name, plan_fn, sizing in (
        ("stream_join", _join_plan, {}),
        (
            "sessionizer",
            _session_plan,
            {"rows_per_partition": 12_500, "floor": 8},
        ),
    ):
        tmp = tempfile.mkdtemp(prefix=f"amort_{name}_")
        staging, files = stage_event_chunks(spark, tmp)
        n_events = sum(
            spark.read.parquet(f).count() for f in files
        )
        parts = size_state_partitions(
            n_events,
            cap=spark.sparkContext.defaultParallelism,
            **sizing,
        )
        s_total, s_prog, s_rows = run_single_stream(
            spark, plan_fn, staging, tmp, parts
        )
        gc.collect()
        i_total, i_per, i_rows = run_invocations(
            spark, plan_fn, files, tmp, parts
        )
        gc.collect()
        assert s_rows == i_rows, (name, s_rows, i_rows)
        data_batches = [p for p in s_prog if p["rows_in"] > 0]
        record["workloads"][name] = {
            "state_partitions": parts,
            "rows_out": s_rows,
            "single_stream": {
                "total_sec": round(s_total, 3),
                "n_progress_batches": len(s_prog),
                "per_batch_trigger_ms": [p["trigger_ms"] for p in s_prog],
                "mean_data_batch_sec": round(
                    sum(p["trigger_ms"] for p in data_batches)
                    / max(len(data_batches), 1)
                    / 1000.0,
                    3,
                ),
            },
            "per_invocation": {
                "total_sec": round(i_total, 3),
                "per_invocation_sec": i_per,
                "mean_invocation_sec": round(sum(i_per) / len(i_per), 3),
            },
            "amortization_ratio": round(
                (sum(i_per) / len(i_per))
                / max(
                    sum(p["trigger_ms"] for p in data_batches)
                    / max(len(data_batches), 1)
                    / 1000.0,
                    1e-9,
                ),
                2,
            ),
        }
        shutil.rmtree(tmp, ignore_errors=True)

    record["provider_constants_join_drain"] = provider_constants(spark)
    line = json.dumps(record)
    print(line)
    with open(os.path.join(os.path.dirname(__file__), "BENCH_drains.json"), "w") as fh:
        fh.write(line + "\n")


if __name__ == "__main__":
    main()
