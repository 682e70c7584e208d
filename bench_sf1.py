"""Scale check: the FULL query registry at sf0.1 vs a synthetic sf1
(10x data; see make_sf1.py), verifying the near-linear claims for every
registered operator — not just a hand-picked subset.

Excluded (SKIPPED, listed in the record): the deterministically-capped
exact certification queries — at 10x data they measure their cap
constant, or an O(N^2) exact baseline, not the engine:

- ann_topk_recall / ivf_topk_recall / ivfpq_topk_recall: exact top-k twin
  capped at TOPK_RECALL_CAP=2048 vectors (sf1 has 20k).
- embedding_near_dup / embedding_ann_recall: exact all-pairs cosine —
  quadratic by design (400M pairs at sf1); the scale path
  (embedding_near_dup_ann / embedding_ann) IS swept.

Writes BENCH_sf1.json: per-query seconds at both SFs, the ratio, and an
explanatory note for every query whose ratio exceeds 10x. Single warm
pass per (query, sf) — coarse by the box's noise standards (see
BENCH_local.json methodology note), but the claim being checked is
coarse too (ratio ~<= 12 at 10x data for linear paths).

Known super-linear candidate growth and why it is bounded, not runaway:

- minhash_near_dups (measured 14.4x in the round-4 23-query record,
  4.6x in the round-5 full sweep — the box's 2-10x noise band straddles
  both): candidate pairs grow with the number of colliding
  (band, signature) groups; the synthetic corpus's shuffled replicas
  add ~10x docs but collisions within a band bucket grow as
  C(bucket,2). The growth is BOUNDED by the banding parameters (b bands
  of r rows cap the collision probability at s^r per band for Jaccard
  s), not by corpus size: the pair count converges to ~(pairs with
  s >= (1/b)^(1/r)) which scales with TRUE duplicate mass, linear in
  corpus for fixed dup rate. A 10x corpus with the same dup rate does
  ~10x-15x work; it cannot approach N^2 unless the corpus is one giant
  near-dup class — which banding would surface, not hide.
"""

from __future__ import annotations

import json
import os
import sys
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

SKIP = {
    "ann_topk_recall": "exact twin capped at TOPK_RECALL_CAP; measures the cap",
    "ivf_topk_recall": "exact twin capped at TOPK_RECALL_CAP; measures the cap",
    "ivf_index_topk_recall": "exact twin capped at TOPK_RECALL_CAP; measures the cap",
    "ivf_insert_topk_recall": "exact twin capped at TOPK_RECALL_CAP; measures the cap",
    "managed_ivf_insert_recall": "exact twin capped at TOPK_RECALL_CAP; measures the cap",
    "ivfpq_topk_recall": "exact twin capped at TOPK_RECALL_CAP; measures the cap",
    "embedding_near_dup": "O(N^2) exact all-pairs baseline (400M pairs at sf1)",
    "embedding_ann_recall": "embeds the O(N^2) exact pair set certificate",
}

RATIO_NOTES = {
    "minhash_near_dups": (
        "candidate pairs grow ~C(bucket,2) within colliding band buckets; "
        "bounded by the banding parameters (s^r per band), linear in corpus "
        "for a fixed dup rate — see module docstring"
    ),
}

SF01 = "/root/testdata/sf0.1"
SF1 = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".localdata", "sf1")


def main() -> None:
    from bigdatapipelne_spark.queries import QUERIES, finalize_registry

    finalize_registry()
    only = (
        sys.argv[1].split(",")
        if len(sys.argv) > 1
        else [n for n in sorted(QUERIES) if n not in SKIP]
    )
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.driver.memory", "48g")
        .appName("bench_sf1")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    (
        spark.range(64).withColumn("g", F.col("id") % 8)
        .groupBy("g").applyInPandas(lambda p: p, "id long, g long")
        .write.format("noop").mode("overwrite").save()
    )

    def run(name: str, sf_dir: str) -> float:
        t0 = time.perf_counter()
        QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        return round(time.perf_counter() - t0, 3)

    import gc

    out: dict[str, dict] = {}
    for name in only:
        # Free dead localCheckpoint blocks between cells (see bench_sf10.py).
        gc.collect()
        try:
            s01 = run(name, SF01)
            s1 = run(name, SF1)
        except Exception as e:  # record, keep sweeping
            out[name] = {"error": str(e)[:300]}
            print(json.dumps({name: out[name]}), flush=True)
            continue
        cell = {
            "sf0.1_sec": s01,
            "sf1_sec": s1,
            "ratio": round(s1 / s01, 2) if s01 > 0 else None,
        }
        if cell["ratio"] is not None and cell["ratio"] > 10:
            cell["note"] = RATIO_NOTES.get(
                name, "over 10x at 10x data — investigate"
            )
        out[name] = cell
        print(json.dumps({name: out[name]}), flush=True)

    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_sf1.json")
    existing = {}
    partial = len(sys.argv) > 1
    if os.path.exists(path) and partial:  # partial rerun merges
        with open(path) as f:
            existing = json.load(f).get("queries", {})
        # prune rows for queries that no longer exist in the registry so a
        # rename/removal can't leave a stale green cell behind
        existing = {k: v for k, v in existing.items() if k in QUERIES}
    existing.update(out)
    note = (
        "synthetic sf1 from make_sf1.py (all 10 tables); single "
        "warm pass per cell; full registry minus capped exact baselines"
    )
    if partial:
        note = f"PARTIAL rerun of {sorted(only)} merged into prior record; " + note
    record = {
        "metric": "sf1_scale_check",
        "data_ratio": 10,
        "queries": existing,
        "skipped": SKIP,
        "note": note,
    }
    with open(path, "w") as f:
        json.dump(record, f, indent=1, sort_keys=True)
        f.write("\n")
    spark.stop()


if __name__ == "__main__":
    main()
