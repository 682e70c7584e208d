#!/usr/bin/env python
"""Managed-IVF maintenance cost envelope (round 14).

A billion-vector inverted file pays exactly three maintenance costs,
and their SCALING classes are the whole design argument for
``run_managed_ivf_insert`` (streaming/index_manifest.py):

- bootstrap build+save — O(corpus x cells x iters), paid once;
- managed assign-only insert — O(|batch| x cells): one broadcast-
  centroid Arrow matmul + appends touching only the batch's own
  cluster partitions; the STANDING CORPUS IS NEVER READ, so this cost
  must be flat in corpus size (the steady-state per-batch cost a
  production pipeline pays daily);
- policy retrain (``ivf_refresh_if_due``) — reads the inverted file
  itself (fixed-width rows, no corpus rescan), paid once per drift
  period.

This script measures all three at sf0.1 AND the 100x rehearsal scale
(.localdata/sf10, ~200k synthetic vectors), through the
MANAGED path (manifest resolve -> insert -> policy), and writes
BENCH_ivf.json. The honest claim to check in the record: the insert
cell grows with its batch (10% of corpus), NOT with the corpus; build
and retrain grow with corpus; retrain < build (no quantize-assign of
raw text/vectors, no corpus scan).

Timings are single-pass after the standard JVM/Arrow warmups —
envelope figures, not A/B evidence (box-noise discipline per
.claude/skills/verify).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

SFS = {
    "sf0.1": "/root/testdata/sf0.1",
    "sf10": os.path.join(
        os.path.dirname(os.path.abspath(__file__)), ".localdata", "sf10"
    ),
}


def main() -> None:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.driver.memory", "48g")
        .appName("bench_ivf")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    (
        spark.range(64).withColumn("g", F.col("id") % 8)
        .groupBy("g").applyInPandas(lambda p: p, "id long, g long")
        .write.format("noop").mode("overwrite").save()
    )

    from bigdatapipelne_spark.operators.similarity import (
        build_ivf_index,
        save_ivf_index,
    )
    from bigdatapipelne_spark.sources.testdata import load_table
    from bigdatapipelne_spark.streaming.index_manifest import (
        current_index_entry,
        init_index_manifest,
        run_managed_ivf_insert,
    )

    record: dict[str, dict] = {}
    for sf, sf_dir in SFS.items():
        if not os.path.isdir(sf_dir):
            record[sf] = {"error": f"{sf_dir} missing"}
            continue
        emb = load_table(spark, sf_dir, "embeddings")
        n = emb.count()
        base = emb.filter(F.col("vec_id") % 10 != 0)
        batch = emb.filter(F.col("vec_id") % 10 == 0)
        tmp = tempfile.mkdtemp(prefix=f"bench_ivf_{sf}_")
        try:
            root = os.path.join(tmp, "ivf")
            t0 = time.perf_counter()
            ix = build_ivf_index(base, "vec_id", "embedding", iters=1)
            save_ivf_index(ix, "vec_id", root)
            build_s = time.perf_counter() - t0
            n_cells = len(ix.centroids)

            mroot = os.path.join(tmp, "manifest")
            init_index_manifest(
                spark, mroot, "ivf", f"bench_ivf_{sf}", root,
                ivf_params={
                    "id_col": "vec_id", "vec_col": "embedding",
                    "n_centroids": n_cells, "iters": 1,
                },
            )
            # steady-state cost: managed insert of the 10% batch, policy
            # consulted but not tripped (factor above the batch's drift)
            t0 = time.perf_counter()
            r = run_managed_ivf_insert(spark, mroot, batch, factor=10.0)
            insert_s = time.perf_counter() - t0
            assert not r["rotated"]
            # once-per-period cost: force the retrain through the policy
            from bigdatapipelne_spark.streaming.index_manifest import (
                ivf_refresh_if_due,
            )

            t0 = time.perf_counter()
            nxt = ivf_refresh_if_due(spark, mroot, factor=0.01)
            retrain_s = time.perf_counter() - t0
            assert nxt is not None
            assert current_index_entry(spark, mroot)["generation"] == 2
            record[sf] = {
                "vectors": n,
                "n_cells": n_cells,
                "batch_rows": r["inserted"],
                "bootstrap_build_save_sec": round(build_s, 2),
                "managed_insert_sec": round(insert_s, 2),
                "policy_retrain_sec": round(retrain_s, 2),
            }
            print(json.dumps({sf: record[sf]}), flush=True)
        finally:
            shutil.rmtree(tmp, ignore_errors=True)

    out = {
        "metric": "managed_ivf_maintenance_costs",
        "cells": record,
        "note": (
            "managed path end-to-end (manifest resolve -> ivf_insert -> "
            "retrain policy). Scaling classes to verify: insert is "
            "O(batch x cells) — flat in corpus size modulo the batch "
            "being 10% of it; build and retrain are one corpus-sized "
            "pass each, retrain cheaper (reads the fixed-width inverted "
            "file, never the raw vectors' source). Single-pass walls "
            "after warmup — envelope figures."
        ),
    }
    path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_ivf.json"
    )
    with open(path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
        f.write("\n")
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
