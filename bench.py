#!/usr/bin/env python
"""Per-round benchmark harness (driver contract).

Runs every registered query at ``$SPARK_GRAFT_SF_DIR`` (default
``/root/testdata/sf0.1``) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE
SHORT JSON line (headline total + slowest five only — the driver's tail
capture truncates long lines, which swallowed the full per-query dict in
rounds 1-2)::

    {"metric": "query_sweep_total", "value": <sec>, "unit": "sec",
     "queries": {<slowest 5>}, "n_queries": N, "sf": 0.1}

The COMPLETE per-query timing dict is written to ``BENCH_local.json`` at
the repo root (committed per round) — read that file for the full sweep.

Each query is forced through a ``noop``-format write so the full result
(every column, every row) is computed on executors — ``count()`` alone would
let Catalyst prune the payload columns and under-report the work.

Streaming-drain cells carry a per-invocation constant that is machinery,
not data work: micro-batch scheduling + sink/checkpoint commits (the
identity-drain floor) plus, for stateful plans, a per-state-partition
store load/commit each batch. So the sweep measures and records the
identity-drain constant (``identity_drain_sec``: a projection of
events.parquet through the same availableNow parquet sink + checkpoint;
the MEDIAN of three min-of-two probes taken at the start, middle and
end of the sweep — ``identity_drain_secs`` holds all three) in
BENCH_local.json each run — drain-cell swings across
rounds can then be attributed against the same-box constant instead of
cross-round archaeology. The stateful drain queries size their state
partitioning to the workload (streaming/joins.py size_state_partitions;
round-10 change — earlier records paid ~5 s/query of empty-partition
store commits at 32 partitions).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    from bigdatapipelne_spark.queries import QUERIES, finalize_registry
    from bigdatapipelne_spark.session import get_spark

    finalize_registry()

    spark = get_spark("bench", master=f"local[{cpus}]", shuffle_partitions=cpus)

    # Warm the JVM/codegen once so per-query timings measure the plan, not
    # first-touch class loading.
    spark.range(1000).selectExpr("sum(id)").write.format("noop").mode("overwrite").save()
    # Warm the Arrow/Python workers too: daemon + worker spin-up is a
    # per-session environment constant (~3-8 s) that would otherwise be
    # charged entirely to whichever applyInPandas query runs first.
    from pyspark.sql import functions as F  # noqa: PLC0415

    (
        spark.range(64)
        .withColumn("g", F.col("id") % 8)
        .groupBy("g")
        .applyInPandas(lambda p: p, "id long, g long")
        .write.format("noop").mode("overwrite").save()
    )

    import gc

    def identity_drain_once() -> float:
        """Time the streaming fixed overhead alone: identity projection of
        events.parquet through the availableNow parquet sink + checkpoint
        (no stateful operator). This is the floor every drain cell pays."""
        import shutil
        import tempfile

        from bigdatapipelne_spark.streaming.fraud import (
            read_events_parquet_stream,
            run_available_now,
        )

        tmp = tempfile.mkdtemp(prefix="bench_idrain_")
        try:
            t0 = time.perf_counter()
            s = read_events_parquet_stream(
                spark, f"{sf_dir}/events.parquet"
            ).select("event_id", "user_id", "ts")
            run_available_now(s, f"{tmp}/out", f"{tmp}/cp")
            return time.perf_counter() - t0
        finally:
            shutil.rmtree(tmp, ignore_errors=True)

    def identity_probe() -> float:
        # min-of-two per probe point, same rationale as the query cells
        return round(min(identity_drain_once(), identity_drain_once()), 3)

    # Three probes — start / middle / end of the sweep — normalized by
    # the MEDIAN (round-13 verdict #3): a single probe that lands
    # unusually fast inflates every drain cell's normalized ratio past
    # the bar (bench_compare cried wolf on two untouched cells in the
    # r13 driver record); the median of three spread across the session
    # is robust to one outlier probe.
    identity_probes = [identity_probe()]

    def run_once(name: str) -> float:
        # Release dead localCheckpoint RDD blocks first — the
        # ContextCleaner unpersists them only after the Python DataFrame
        # refs are collected, and a 143-query session otherwise
        # accumulates GBs of orphaned checkpoint blocks that degrade
        # later queries (see bench_sf10.py).
        gc.collect()
        t0 = time.perf_counter()
        try:
            QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            return time.perf_counter() - t0
        except Exception as e:  # a broken query must not kill the sweep
            print(f"# bench error in {name}: {e}", file=sys.stderr)
            return float("nan")

    # Best-of-two: this box shows 2-10x run-to-run swings on identical
    # plans (noisy neighbors); the min of two passes is a far better
    # estimate of the plan's cost than either single sample. Queries
    # whose first pass exceeds the cap are not re-run (bounds added wall
    # time; at that size the relative noise is smaller anyway).
    RERUN_CAP_S = 30.0
    timings: dict[str, float] = {}
    samples: dict[str, list[float]] = {}
    cap_hits: list[str] = []
    total = 0.0
    first = {name: run_once(name) for name in sorted(QUERIES)}
    identity_probes.append(identity_probe())  # mid-sweep probe
    for name, dt1 in first.items():
        dt = dt1
        samples[name] = [round(dt1, 3)]
        if dt1 == dt1 and dt1 < RERUN_CAP_S:
            dt2 = run_once(name)
            if dt2 == dt2:
                dt = min(dt1, dt2)
                samples[name].append(round(dt2, 3))
        elif dt1 == dt1:
            # A sample at/over the cap means the min-of-two methodology
            # silently degraded to single-pass for this query — record it
            # loudly so a regression can't hide behind the cap.
            cap_hits.append(name)
        timings[name] = round(dt, 3)
        if dt == dt:  # not NaN
            total += dt

    identity_probes.append(identity_probe())  # end-of-sweep probe
    identity_drain_sec = sorted(identity_probes)[1]  # median of three

    if cap_hits:
        print(
            f"# BENCH CAP HIT ({len(cap_hits)}): {', '.join(sorted(cap_hits))} "
            f"— single-sample timings; investigate before trusting the total",
            file=sys.stderr,
        )

    full = {
        "cap_hits": sorted(cap_hits),
        "metric": "query_sweep_total",
        "value": round(total, 3),
        "unit": "sec",
        # Methodology is tagged (and both raw samples recorded) so
        # cross-round totals are comparable: rounds 1-2 were single-pass,
        # round 3+ is min-of-two capped at 30 s. Compare like with like —
        # samples[name][0] is the single-pass-equivalent figure.
        "methodology": "best_of_two_min_capped_30s",
        # Same-box streaming fixed overhead (identity availableNow drain).
        # identity_drain_secs: three min-of-two probes at start / middle /
        # end of the sweep; identity_drain_sec is their MEDIAN — the
        # value bench_compare normalizes by (one outlier probe no longer
        # skews every drain cell's normalized ratio).
        "identity_drain_sec": identity_drain_sec,
        "identity_drain_secs": identity_probes,
        "queries": timings,
        "samples": samples,
        "n_queries": len(timings),
        "sf": sf,
    }
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_local.json"), "w") as f:
        json.dump(full, f, indent=1, sort_keys=True)
        f.write("\n")

    slowest = dict(
        sorted(timings.items(), key=lambda kv: -(kv[1] if kv[1] == kv[1] else 0.0))[:5]
    )
    print(
        json.dumps(
            {
                "metric": "query_sweep_total",
                "value": round(total, 3),
                "unit": "sec",
                "methodology": "best_of_two_min_capped_30s",
                "identity_drain_sec": identity_drain_sec,
                "queries": slowest,
                "n_queries": len(timings),
                "cap_hits": len(cap_hits),
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
