"""Scale spot-check: the slowest SCALE-PATH queries at sf0.1 vs a
synthetic sf1 (10x data; see make_sf1.py), verifying the near-linear
claims for the dedup/ANN/CC/streaming paths.

Included queries are the ones whose cost is designed to scale with the
data (bucketed candidates, fixed-width state, mergeable sketches). The
by-design-quadratic certification queries (embedding_ann_recall,
embedding_near_dup, *_topk_recall) are EXCLUDED: their exact twins are
deterministically capped, so at 10x data they measure the cap, not the
engine.

Writes BENCH_sf1.json: per-query seconds at both SFs and the ratio.
Single warm pass per (query, sf) after a JVM/Arrow warm-up — coarse by
the box's noise standards (see BENCH_local.json methodology note), but
the claim being checked is coarse too (ratio ~<= 12 at 10x data).
"""

from __future__ import annotations

import json
import os
import sys
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

SCALE_QUERIES = [
    "exact_dedup",
    "minhash_near_dups",
    "simhash_near_dups",
    "deduped_documents",
    "near_dup_clusters",
    "near_dup_clusters_pd",
    "embedding_near_dup_ann",
    "embedding_ann",
    "embedding_ivf",
    "corpus_pipeline",
    "hll_users_rollup",
    "session_stream_drain",
    "stream_dedup_drain",
    "purchase_view_outer_drain",
    # round-4 wave-2/3 operators, all scale-path (no caps): span dedup,
    # MG heavy hitters, unigram LM scoring, repeat collapse, PSI drift,
    # delta-vs-corpus dedup.
    "chunk_dup_docs",
    "embedding_ivfpq",
    "quality_deciles",
    "exact_stratified_split",
    "frequent_tokens",
    "doc_unigram_logprob",
    "doc_collapse_repeats",
    "value_drift_psi",
    "incremental_dedup",
]

SF01 = "/root/testdata/sf0.1"
SF1 = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".localdata", "sf1")


def main() -> None:
    from bigdatapipelne_spark.queries import QUERIES, finalize_registry

    finalize_registry()
    only = sys.argv[1].split(",") if len(sys.argv) > 1 else SCALE_QUERIES
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

    out: dict[str, dict] = {}
    for name in only:
        s01 = run(name, SF01)
        s1 = run(name, SF1)
        out[name] = {
            "sf0.1_sec": s01,
            "sf1_sec": s1,
            "ratio": round(s1 / s01, 2) if s01 > 0 else None,
        }
        print(json.dumps({name: out[name]}), flush=True)

    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_sf1.json")
    existing = {}
    if os.path.exists(path):
        with open(path) as f:
            existing = json.load(f).get("queries", {})
    existing.update(out)
    record = {
        "metric": "sf1_scale_check",
        "data_ratio": 10,
        "queries": existing,
        "note": "synthetic sf1 from make_sf1.py; single warm pass per cell",
    }
    with open(path, "w") as f:
        json.dump(record, f, indent=1, sort_keys=True)
        f.write("\n")
    spark.stop()


if __name__ == "__main__":
    main()
