"""Spill-safety rehearsal for the dedup/corpus band (round-10 verdict #4).

SURVEY §7.2 claims the dedup family is "spill-safe, AQE-friendly"; this
script exercises the claim instead of asserting it: the sf10 dedup band
(minhash, ngram, winnow, chunk_dup, corpus_pipeline) re-run with the
Spark-managed memory pool cut 4x (spark.memory.fraction 0.6 -> 0.15,
same heap, same 32 cores) under the engine's documented memory-pressure
posture (operators/checkpoint.py: checkpoint storageLevel=DISK_ONLY),
recording completion, wall time, and spill bytes per cell from the
status-store REST API. Pass criterion: zero OOMs; spills are expected —
they are the point.

Round-11 failure-mode study (why the posture is what it is, all probed
on this box at the sf10 minhash cell):

- frac=0.15 + DEFAULT checkpoints (deserialized in-memory blocks): the
  checkpoint cache fills the protected storage region and 32 concurrent
  sorters die in UnsafeExternalSorter with "Unable to acquire ... got 0"
  (also reproduced through the ObjectHashAggregate fallback and with
  useObjectHashAggregateExec=false — the cached blocks, not one
  operator, are the structural cause).
- DISK_ONLY checkpoints empty the storage pool; the same cell then
  completes by spilling (2.3 GB memory-spill / 1.0 GB disk at the probe).
- Absolute-heap cuts (2g x 32 cores = 64 MB/core) fail on JVM mechanics
  (GCLocker starvation in the text-explode scan) at ANY posture — a
  deployment floor note (size heap per core), not a Spark-memory-manager
  behavior this rehearsal can exercise.

Usage (one pass per process; results merge into BENCH_spill.json):
    SPILL_PASS=constrained python bench_spill.py   # frac 0.15 + DISK_ONLY
    SPILL_PASS=reference  python bench_spill.py    # engine defaults
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time
import urllib.request

PASS = os.environ.get("SPILL_PASS", "constrained")
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
    try:
        with urllib.request.urlopen(url, timeout=30) as r:
            stages = json.load(r)
    except Exception:  # UI gone (e.g. the context died mid-cell)
        return {"memory_spill": 0, "disk_spill": 0, "shuffle_write": 0}
    return {
        "memory_spill": sum(s.get("memoryBytesSpilled", 0) for s in stages),
        "disk_spill": sum(s.get("diskBytesSpilled", 0) for s in stages),
        "shuffle_write": sum(s.get("shuffleWriteBytes", 0) for s in stages),
    }


def main() -> None:
    from bigdatapipelne_spark import queries as Q
    from bigdatapipelne_spark.operators.checkpoint import CHECKPOINT_LEVEL_CONF
    from bigdatapipelne_spark.queries import QUERIES
    from bigdatapipelne_spark.session import get_spark

    Q.finalize_registry()
    conf = {"spark.ui.enabled": "true"}
    if PASS == "constrained":
        conf["spark.memory.fraction"] = "0.15"
        conf[CHECKPOINT_LEVEL_CONF] = "DISK_ONLY"
    spark = get_spark(
        f"bench-spill-{PASS}", master=f"local[{CPUS}]", extra_conf=conf
    )
    mb = 1024 * 1024
    out: dict = {"pass": PASS, "conf": conf, "sf_dir": SF_DIR, "cells": {}}
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
    record[PASS] = out
    with open(path, "w") as fh:
        json.dump(record, fh, indent=1)
    print(json.dumps({"metric": "spill_rehearsal", "pass": PASS,
                      "ooms": sum(1 for c in out["cells"].values() if not c["completed"])}))
    ok = all(c["completed"] for c in out["cells"].values())
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
