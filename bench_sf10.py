"""100x dress rehearsal: the scale-critical query families at sf0.1 vs a
synthetic sf10 (100x data, 60M lineitem rows / 500k docs / 200k vectors;
see make_sf10.py), answering the brief's actual question — would these
plans survive a 100x scale-up — with measurements, not design arguments.

Swept set (~25 queries): every dedup variant, the three production ANN
paths, the selection/frequency family, the text-quality fix from round 6,
three streaming drains, and three shuffle-heavy TPC-H joins/aggs. The
capped exact baselines are excluded for the same reasons as bench_sf1.py
(they measure their caps, not the engine).

Interpretation bar: a linear path should land at <= ~120x cost at 100x
data (box noise band included); anything above 150x gets a note and is a
round finding. Fixed per-run overhead (JVM/stream micro-batch spin-up)
deflates ratios for fast queries — the sf10_sec column is the honest
absolute cost.

Writes BENCH_sf10.json (same shape as BENCH_sf1.json, data_ratio=100).
"""

from __future__ import annotations

import json
import os
import sys
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

# The scale-critical families (SURVEY north-star + shuffle-heavy TPC-H).
SWEEP = [
    # text quality (round-6 fix target)
    "doc_quality",
    "text_stats",
    # dedup family
    "exact_dedup",
    "minhash_near_dups",
    "simhash_near_dups",
    "ngram_jaccard_pairs",
    "winnowed_doc_pairs",
    "chunk_dup_docs",
    "incremental_near_dup",
    "near_dup_clusters",
    "deduped_best_quality",
    # ANN scale paths
    "embedding_ann",
    "embedding_ivf",
    "embedding_ivfpq",
    "embedding_near_dup_ann",
    # selection / packing / frequency
    "corpus_budget_select",
    "quality_deciles",
    "packed_sequences",
    "frequent_tokens",
    "tfidf_top_terms",
    # streaming drains (micro-batch overhead dominates at sf0.1; the sf10
    # column shows whether state/throughput scale)
    "fraud_stream_drain",
    "session_stream_drain",
    "stream_dedup_drain",
    # shuffle-heavy TPC-H
    "q1_pricing_summary",
    "q9_product_profit",
    "q18_large_orders",
    "q21_waiting_orders",
    # broad-coverage wave 2: windows/sessions/sketches/analytics/medallion
    "stage_events",
    "events_time_rollup",
    "user_sessions",
    "session_window_agg",
    "sliding_window_traffic",
    "hll_users_rollup",
    "approx_users_per_type",
    "value_percentiles",
    "cube_order_stats",
    "salted_skew_join",
    "asof_purchase_view",
    "purchase_funnel",
    "golden_events",
    "user_scd2",
    "exact_stratified_split",
    "weighted_docs_sample",
    "mixture_rebalanced",
    "doc_char_entropy",
    "pii_redaction",
    "doc_unigram_logprob",
    # broad-coverage wave 3: the rest of the document/embedding surface
    "corpus_pipeline",
    "lang_confusion",
    "doc_chunks",
    "doc_chunks_udtf",
    "doc_repetition",
    "doc_collapse_repeats",
    "vocab_coverage",
    "doc_feature_hash",
    "bm25_search",
    "decontaminated_overlap",
    "simhash_sigs",
    "incremental_dedup",
    "deduped_documents",
    "near_dup_clusters_pd",
    "embedding_topk",
    "embedding_quantized",
]

RATIO_NOTES = {
    "minhash_near_dups": (
        "candidate pairs grow ~C(bucket,2) within colliding band buckets; "
        "bounded by banding parameters, linear for fixed dup rate — see "
        "bench_sf1.py docstring"
    ),
}

SF01 = "/root/testdata/sf0.1"
SF10 = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".localdata", "sf10")


def main() -> None:
    from bigdatapipelne_spark.queries import QUERIES, finalize_registry

    finalize_registry()
    only = sys.argv[1].split(",") if len(sys.argv) > 1 else SWEEP
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.driver.memory", "48g")
        .appName("bench_sf10")
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
        try:
            s01 = run(name, SF01)
            s10 = run(name, SF10)
        except Exception as e:  # record, keep sweeping
            out[name] = {"error": str(e)[:300]}
            print(json.dumps({name: out[name]}), flush=True)
            continue
        cell = {
            "sf0.1_sec": s01,
            "sf10_sec": s10,
            "ratio": round(s10 / s01, 2) if s01 > 0 else None,
        }
        if cell["ratio"] is not None and cell["ratio"] > 150:
            cell["note"] = RATIO_NOTES.get(
                name, "over 150x at 100x data — investigate"
            )
        out[name] = cell
        print(json.dumps({name: out[name]}), flush=True)

    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_sf10.json")
    existing = {}
    partial = len(sys.argv) > 1
    if os.path.exists(path) and partial:
        with open(path) as f:
            existing = json.load(f).get("queries", {})
        existing = {k: v for k, v in existing.items() if k in QUERIES}
    existing.update(out)
    note = (
        "synthetic sf10 from make_sf10.py (100x sf0.1, all 10 tables); "
        "single warm pass per cell; scale-critical families only"
    )
    if partial:
        note = f"PARTIAL rerun of {sorted(only)} merged into prior record; " + note
    record = {
        "metric": "sf10_scale_check",
        "data_ratio": 100,
        "queries": existing,
        "note": note,
    }
    with open(path, "w") as f:
        json.dump(record, f, indent=1, sort_keys=True)
        f.write("\n")
    spark.stop()


if __name__ == "__main__":
    main()
