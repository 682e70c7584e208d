#!/usr/bin/env python
"""Steady-state probe benchmark for the standing dedup indexes
(round-8 verdict #1).

The gate queries incremental_dedup_indexed / incremental_near_dup_indexed
time build + bucketed save + reload + probe in ONE cell, so the number a
production pipeline pays per batch — the probe against an ALREADY-BUILT
standing index — is buried under the one-time sorted index write. This
harness splits them: each index is built and saved ONCE (timed separately
as ``build_save_sec``), then the probe phase — load the bucketed catalog
table, classify the delta, materialize every row through a noop write —
is timed over warm repeats (``probe_sec`` = min, ``probe_samples`` = all).

The delta/corpus construction is imported from the gate queries
(queries_llm._incr_dedup_delta / _incr_near_dup_delta), so the probe
workload is exactly the gate's. Writes ``BENCH_probe.json``::

    {"metric": "probe_only", "sf": ..., "queries": {
        "incremental_dedup_probe":   {"build_save_sec": ..., "probe_sec": ...,
                                      "probe_samples": [...], "rows": N},
        "incremental_near_dup_probe": {...}}}

Usage: ``python bench_probe.py [sf_dir]`` (default $SPARK_GRAFT_SF_DIR or
/root/testdata/sf0.1). Pass ``.localdata/sf10`` for the 100x rehearsal.
"""

from __future__ import annotations

import gc
import json
import os
import re
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

REPS = 3


def main() -> None:
    sf_dir = (
        sys.argv[1]
        if len(sys.argv) > 1
        else os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    from bigdatapipelne_spark.operators.dedup import (
        build_fingerprint_index,
        build_near_dup_index,
        incremental_exact_duplicates,
        incremental_near_duplicates,
        load_fingerprint_index,
        load_near_dup_index,
        save_fingerprint_index,
        save_near_dup_index,
    )
    from bigdatapipelne_spark.queries_llm import (
        _incr_dedup_delta,
        _incr_near_dup_delta,
    )
    from bigdatapipelne_spark.session import get_spark
    from bigdatapipelne_spark.sources.testdata import load_table

    spark = get_spark(
        "bench_probe", master=f"local[{cpus}]", shuffle_partitions=cpus
    )
    # Warm JVM + Python workers (same rationale as bench.py).
    spark.range(1000).selectExpr("sum(id)").write.format("noop").mode(
        "overwrite"
    ).save()
    from pyspark.sql import functions as F

    (
        spark.range(64)
        .withColumn("g", F.col("id") % 8)
        .groupBy("g")
        .applyInPandas(lambda p: p, "id long, g long")
        .write.format("noop")
        .mode("overwrite")
        .save()
    )

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "source"
    )
    pid = os.getpid()
    results: dict[str, dict] = {}

    def timed(fn) -> float:
        gc.collect()
        t0 = time.perf_counter()
        fn()
        return time.perf_counter() - t0

    # ---- exact fingerprint index -------------------------------------
    delta, corpus = _incr_dedup_delta(docs)
    fp_path = tempfile.mkdtemp(prefix="bench_fp_ix_")
    fp_name = f"bench_fp_ix_{pid}"
    spark.sql(f"DROP TABLE IF EXISTS {fp_name}")
    build_save = timed(
        lambda: save_fingerprint_index(
            build_fingerprint_index(corpus, "doc_id", "text"), fp_name, fp_path
        )
    )

    def fp_probe():
        incremental_exact_duplicates(
            delta, None, "doc_id", "text",
            corpus_index=load_fingerprint_index(spark, fp_name),
        ).write.format("noop").mode("overwrite").save()

    samples = [round(timed(fp_probe), 3) for _ in range(REPS)]
    rows = incremental_exact_duplicates(
        delta, None, "doc_id", "text",
        corpus_index=load_fingerprint_index(spark, fp_name),
    ).count()
    results["incremental_dedup_probe"] = {
        "build_save_sec": round(build_save, 3),
        "probe_sec": min(samples),
        "probe_samples": samples,
        "rows": rows,
    }
    spark.sql(f"DROP TABLE IF EXISTS {fp_name}")

    # ---- near-dup (MinHash band) index -------------------------------
    delta, corpus = _incr_near_dup_delta(docs)
    nd_root = tempfile.mkdtemp(prefix="bench_nd_ix_")
    nd_name = f"bench_nd_ix_{pid}"
    for part in ("bands", "shingles", "sizes"):
        spark.sql(f"DROP TABLE IF EXISTS {nd_name}_{part}")
    build_save = timed(
        lambda: save_near_dup_index(
            build_near_dup_index(corpus, "doc_id", "text"), nd_name, nd_root
        )
    )

    def nd_probe():
        incremental_near_duplicates(
            delta, None, "doc_id", "text",
            corpus_index=load_near_dup_index(spark, nd_name),
        ).write.format("noop").mode("overwrite").save()

    samples = [round(timed(nd_probe), 3) for _ in range(REPS)]
    rows = incremental_near_duplicates(
        delta, None, "doc_id", "text",
        corpus_index=load_near_dup_index(spark, nd_name),
    ).count()
    results["incremental_near_dup_probe"] = {
        "build_save_sec": round(build_save, 3),
        "probe_sec": min(samples),
        "probe_samples": samples,
        "rows": rows,
    }
    for part in ("bands", "shingles", "sizes"):
        spark.sql(f"DROP TABLE IF EXISTS {nd_name}_{part}")

    path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_probe.json"
    )
    out = {
        "metric": "probe_only",
        "unit": "sec",
        "note": (
            "Steady-state per-batch cost against a PRE-BUILT standing "
            "index (bucketed catalog layout; index read in place, zero "
            "index-side exchange — plan-asserted in tests/test_bucketing). "
            "build_save_sec is the one-time index build + sorted bucketed "
            "write the gate cells (incremental_*_indexed) additionally "
            "pay; probe_sec is min of warm repeats of load+probe+noop. "
            "Keyed by SF so the 100x probe scaling reads directly."
        ),
        "by_sf": {},
    }
    if os.path.exists(path):
        try:
            with open(path) as f:
                prev = json.load(f)
            out["by_sf"] = prev.get("by_sf", {})
        except (ValueError, OSError):
            pass
    out["by_sf"][str(sf)] = results
    with open(path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
        f.write("\n")
    print(json.dumps({"metric": "probe_only", "sf": sf, "queries": results}))


if __name__ == "__main__":
    main()
