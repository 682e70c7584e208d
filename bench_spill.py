"""Spill-safety rehearsal for the dedup/corpus band (round-10 verdict #4).

SURVEY §7.2 claims the dedup family is "spill-safe, AQE-friendly"; this
script exercises the claim instead of asserting it: the sf10 dedup band
(minhash, ngram, winnow, chunk_dup, corpus_pipeline) re-run under a
deliberately small memory budget — driver/executor heap cut 4x from the
bench default (8g -> 2g on local[32], where driver heap IS executor
heap) — recording completion, wall time, and shuffle/spill bytes per
cell from the status-store REST API. Pass criterion: zero OOMs/errors at
2g; spills are allowed (that is the point of spilling).

Usage: one budget per PROCESS (driver heap is a JVM-launch option):
    SPILL_MEM=2g python bench_spill.py     # constrained pass
    SPILL_MEM=8g python bench_spill.py     # unconstrained reference
Each pass merges its results into BENCH_spill.json under its budget key.
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time
import urllib.request

MEM = os.environ.get("SPILL_MEM", "2g")
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", ".localdata/sf10")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

CELLS = [
    "minhash_near_dups",
    "ngram_jaccard_pairs",
    "winnowed_doc_pairs",
    "chunk_dup_docs",
    "corpus_pipeline",
]


def _spill_totals(spark) -> dict[str, int]:
    """Cumulative memory/disk spill + shuffle-write bytes across all
    completed stages, via the UI REST API (the listener-backed status
    store; spark.ui.enabled must be true in this session)."""
    app_id = spark.sparkContext.applicationId
    url = f"http://localhost:4040/api/v1/applications/{app_id}/stages"
    with urllib.request.urlopen(url, timeout=30) as r:
        stages = json.load(r)
    return {
        "memory_spill": sum(s.get("memoryBytesSpilled", 0) for s in stages),
        "disk_spill": sum(s.get("diskBytesSpilled", 0) for s in stages),
        "shuffle_write": sum(s.get("shuffleWriteBytes", 0) for s in stages),
    }


def main() -> None:
    os.environ["SPARK_GRAFT_DRIVER_MEM"] = MEM
    from bigdatapipelne_spark import queries as Q
    from bigdatapipelne_spark.queries import QUERIES
    from bigdatapipelne_spark.session import get_spark

    Q.finalize_registry()
    spark = get_spark(
        f"bench-spill-{MEM}",
        master=f"local[{CPUS}]",
        extra_conf={"spark.ui.enabled": "true"},
    )
    mb = 1024 * 1024
    out: dict = {"mem": MEM, "sf_dir": SF_DIR, "cells": {}}
    prev = _spill_totals(spark)
    for name in CELLS:
        t0 = time.time()
        try:
            n = QUERIES[name](spark, SF_DIR).count()
            err = None
        except Exception as e:  # noqa: BLE001 — the record IS the outcome
            n, err = -1, f"{type(e).__name__}: {e}"[:300]
        sec = round(time.time() - t0, 2)
        cur = _spill_totals(spark)
        out["cells"][name] = {
            "completed": err is None,
            "error": err,
            "sec": sec,
            "rows": n,
            "memory_spill_mb": round((cur["memory_spill"] - prev["memory_spill"]) / mb),
            "disk_spill_mb": round((cur["disk_spill"] - prev["disk_spill"]) / mb),
            "shuffle_write_mb": round((cur["shuffle_write"] - prev["shuffle_write"]) / mb),
        }
        prev = cur
        gc.collect()
        print(name, out["cells"][name], flush=True)

    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_spill.json")
    record = {}
    if os.path.exists(path):
        with open(path) as fh:
            record = json.load(fh)
    record[MEM] = out
    with open(path, "w") as fh:
        json.dump(record, fh, indent=1)
    print(json.dumps({"metric": "spill_rehearsal", "mem": MEM,
                      "ooms": sum(1 for c in out["cells"].values() if not c["completed"])}))
    ok = all(c["completed"] for c in out["cells"].values())
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
