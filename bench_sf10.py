"""100x dress rehearsal: the scale-critical query families at sf0.1 vs a
synthetic sf10 (100x data, 60M lineitem rows / 500k docs / 200k vectors;
see make_sf10.py), answering the brief's actual question — would these
plans survive a 100x scale-up — with measurements, not design arguments.

Swept set: the FULL registry minus the capped exact baselines (excluded
for the same reasons as bench_sf1.py — they measure their caps, not the
engine). `python bench_sf10.py` sweeps everything; pass a comma-separated
subset to re-time specific queries, or `--missing` to top the record up
to full-registry coverage without re-running existing cells. SWEEP below
is kept as the scale-critical shortlist documentation.

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
    "session_window_stream_drain",
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
    "session_stream_drain": (
        "priced contract (round-10 decision record, streaming/sessions.py "
        "sessionize_stream): ~320us/group applyInPandasWithState harness "
        "serde x 150k groups dominates the sf10 cell; state partitions "
        "are workload-sized (fewer at small SF for the store constant, "
        "core-capped at volume for Python parallelism). Bulk callers use "
        "the native session_window twin (session_window_stream_drain). "
        "Round 12 flips the gate to RocksDB permanently: the sf10 wall is "
        "FLAT vs the r11 HDFS-provider cell (58.9s -> ~57s), so the "
        "higher ratio is a FASTER sf0.1 denominator (7.65s -> ~4.8s, the "
        "r10 sizing finally measured warm), not grown scale cost"
    ),
    "incremental_near_dup": (
        "pays the one-time corpus index build inside the cell by design; "
        "the steady-state probe alone is certified in BENCH_probe.json"
    ),
    "corpus_pipeline": (
        "five chained certified stages (quality filter -> exact dedup -> "
        "decontamination -> split -> budgets) over a corpus UNIONED with "
        "a re-keyed copy of itself; the sf0.1 denominator is mostly the "
        "chain's fixed stage constants, so the ratio reads high while "
        "the sf10 wall is the honest absolute cost of the 1M-doc chain"
    ),
    "near_dup_clusters_pd": (
        "cell = the shared ngram pair mining (2-exchange inverted-index "
        "plan, ~13s warm at sf10) + a collect-bounded driver union-find "
        "(0.8s warm at sf10's 7.8k edges); the ratio is the mining "
        "stage's JIT mode vs a ~1.7s sf0.1 denominator, not the closure"
    ),
    "near_dup_clusters": (
        "same chain as near_dup_clusters_pd: pair mining dominates, the "
        "closure itself is a sub-second driver union-find below "
        "CC_DRIVER_MAX_EDGES (the distributed loop is the >100k-edge "
        "path)"
    ),
    "sliding_window_traffic": (
        "built-in F.window(30s, 10s) explodes every event into 3 "
        "overlapping windows before one groupBy — the plan is the one "
        "you'd want; the sf0.1 denominator is a sub-second constant, so "
        "the ratio reads high while the sf10 wall tracks the 30M "
        "window-instance rows"
    ),
    "doc_chunks": (
        "sub-3s sf10 wall; the sf0.1 denominator is a ~0.3s session "
        "constant, so the ratio is dominated by fixed overhead, not "
        "scaling"
    ),
    "q21_waiting_orders": (
        "double EXISTS/NOT-EXISTS decorrelated to two grouped passes "
        "over 60M lineitem with the smax subplan localCheckpointed "
        "(round-8 rewrite); the sf10 wall matches the r8 same-code cell "
        "(15.5s) — ratio movement is sf0.1 denominator drift on this "
        "box, not a scaling change"
    ),
    "packed_sequences": (
        "next-fit packing is sequential WITHIN a bucket by definition; "
        "buckets are sized ~5M rows so per-bucket wall is bounded at "
        "any corpus size and bucket count grows with the data — the "
        "sf10 wall is the per-bucket Python pass, parallel across 32 "
        "cores"
    ),
    "compaction_disk": (
        "rewrites 100x the parquet bytes through one process' disk "
        "(read + write inside the cell) — IO volume scales with data "
        "by design; the computed file budget and DECIMAL-exact "
        "aggregate are the certified part"
    ),
    "embedding_near_dup_ann": (
        "SRP candidate growth: multi-probe bucket populations grow with "
        "corpus density at fixed nbits, so verified-pair volume rises "
        "faster than N — bounded by max_bucket_size; the exact-verify "
        "cosine over candidates is the cell's cost, the documented "
        "approximate-path trade (round-9 attribution, standing)"
    ),
    "decontaminated_overlap": (
        "remaining cost is the corpus tokenize/shingle scan probed "
        "against a 25-doc benchmark index — at 100 TB the corpus scan "
        "IS the data being checked, an irreducible single pass; the "
        "round-11 standing BenchmarkIndex probe path removes the "
        "per-run benchmark rebuild (negligible at this benchmark size, "
        "the point at real eval-suite sizes). The sf10 wall is FLAT "
        "across rounds (10.5 -> 10.7s); the round-12 ratio moved "
        "because the SF0.1 DENOMINATOR dropped under a second (the "
        "inline path no longer checkpoints the throwaway benchmark "
        "index), the sub-second-denominator inflation this record's "
        "convention flags rather than hides"
    ),
    "purchase_view_outer_drain": (
        "runs the ROCKSDB state store permanently (round-11 "
        "certification): the cell is a per-invocation stateful "
        "constant, not data throughput, and includes the off-heap "
        "provider's ~0.7s premium over the HDFS store at toy state "
        "(BENCH_drains.json provider constants)"
    ),
    "incremental_dedup_stream_drain": (
        "per-invocation streaming-cell constant: stages micro-batch "
        "files, builds+saves the standing bucketed index, then drains "
        "3 audited micro-batches; the steady-state per-batch probe "
        "cost is certified separately (BENCH_probe.json, "
        "BENCH_drains.json amortization curves)"
    ),
    "incremental_near_dup_stream_drain": (
        "same shape as incremental_dedup_stream_drain for the MinHash "
        "index: index build+save + 3 audited micro-batch probes + "
        "ledger maintenance inside one cell; steady-state probe cost "
        "lives in BENCH_probe.json"
    ),
    "near_dup_fold_drain": (
        "the heaviest per-invocation streaming cell BY DESIGN: TWO "
        "bucketed index saves (initial build + the mid-stream "
        "fold_ledger_into_index rewrite), two availableNow stream "
        "invocations around the fold, three audited micro-batch probes, "
        "and in-gate sink compaction; the steady-state payoff it "
        "certifies (per-batch O(ledger) term reset) is measured in "
        "BENCH_fold.json's with/without-fold curves"
    ),
    "incremental_dedup_fold_drain": (
        "per-invocation constant like its near-dup twin: index "
        "build+save, two drain invocations around "
        "fold_seen_into_fingerprint_index, 3 audited micro-batches"
    ),
    "decontaminated_overlap_stream_drain": (
        "per-invocation streaming-cell constant: benchmark-index "
        "build+save + 3 audited micro-batch probes; each batch's cost "
        "is its own corpus-slice tokenize scan against the static "
        "25-doc index — the same irreducible single pass as the batch "
        "form, paid in thirds"
    ),
    "dsir_selected": (
        "re-measured r15 after the round-14 suffix-conv fix (the 258.3s "
        "/ 22.8x record cell predated the change that targeted it): the "
        "per-occurrence hash stage now converts 3 hex digits instead of "
        "15; the remaining sf10 wall is the irreducible "
        "tokenize+explode+md5 occurrence stream (54M cells), one narrow "
        "projection ahead of the per-doc (bucket,count) collapse"
    ),
    "embedding_semdedup": (
        "cold single-pass convention dominates this cell: warm phase "
        "attribution at sf10 (r15) is ~10s k-means assignments (2 Lloyd "
        "passes over 200k x 64 doubles), ~5s cluster-scoped Arrow "
        "matmul pair scan, ~12s full prune end-to-end — the N^1.5 "
        "design shape with the quadratic term vectorized; the recorded "
        "wall is mostly fresh-JVM/Arrow-worker spin-up and first-touch "
        "codegen, swinging 86-137s across same-code sessions, and the "
        "ratio is denominator-driven (the sf0.1 cell swings 12-28s on "
        "the same code)"
    ),
    "near_dup_managed_drain": (
        "everything near_dup_fold_drain pays (two bucketed index saves, "
        "two stream invocations, audited probes) PLUS manifest init, "
        "the policy's pointer CAS, and post-fold compaction of BOTH "
        "pair sinks — the self-operating twin is the heaviest cell "
        "family by design; its sf0.1 denominator is first-cell "
        "cold-inflated in the r13 record (bench.py same-HEAD: 15.0s), "
        "so the low ratio is optics, the sf10 wall (~52s) matches its "
        "manual twin"
    ),
    "incremental_dedup_managed_drain": (
        "incremental_dedup_fold_drain plus manifest resolve/CAS and "
        "policy sink compaction — per-invocation constant, exact twin "
        "of the managed near-dup cell"
    ),
}

# Same exclusions (and reasons) as bench_sf1.py: these queries measure a
# deterministic cap or an O(N^2) exact baseline, not the engine.
SKIP = {
    "ann_topk_recall": "exact twin capped at TOPK_RECALL_CAP; measures the cap",
    "ivf_topk_recall": "exact twin capped at TOPK_RECALL_CAP; measures the cap",
    "ivf_index_topk_recall": "exact twin capped at TOPK_RECALL_CAP; measures the cap",
    "ivf_insert_topk_recall": "exact twin capped at TOPK_RECALL_CAP; measures the cap",
    "managed_ivf_insert_recall": "exact twin capped at TOPK_RECALL_CAP; measures the cap",
    "ivfpq_topk_recall": "exact twin capped at TOPK_RECALL_CAP; measures the cap",
    "embedding_near_dup": "O(N^2) exact all-pairs baseline",
    "embedding_ann_recall": "embeds the O(N^2) exact pair set certificate",
    "semdedup_recall": "embeds the O(N^2) exact pair set certificate",
}

SF01 = "/root/testdata/sf0.1"
SF10 = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".localdata", "sf10")


def main() -> None:
    from bigdatapipelne_spark.queries import QUERIES, finalize_registry

    finalize_registry()
    if len(sys.argv) > 1 and sys.argv[1] == "--missing":
        # top up the record to the full registry (minus SKIP)
        existing_cells = {}
        path0 = os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "BENCH_sf10.json"
        )
        if os.path.exists(path0):
            with open(path0) as f:
                existing_cells = json.load(f).get("queries", {})
        only = [
            n
            for n in sorted(QUERIES)
            if n not in SKIP and n not in existing_cells
        ]
    elif len(sys.argv) > 1:
        # explicit subsets CONSULT SKIP too (the r13 leak: a subset pass
        # bypassed it and re-timed a capped certificate into `queries`
        # while it was also listed as skipped)
        req = sys.argv[1].split(",")
        only = [n for n in req if n not in SKIP]
        dropped = sorted(set(req) & set(SKIP))
        if dropped:
            print(
                f"# subset names in SKIP, not timed: {', '.join(dropped)}",
                file=sys.stderr,
            )
    else:
        only = [n for n in sorted(QUERIES) if n not in SKIP]
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

    import gc

    out: dict[str, dict] = {}
    for name in only:
        # Release dead localCheckpoint RDD blocks between queries: the
        # ContextCleaner only unpersists them once the Python-side
        # DataFrame references are collected, and a 100x sweep otherwise
        # accumulates multi-GB of orphaned checkpoint blocks in the block
        # manager (measured 5.6 GB after a handful of dedup cells),
        # degrading later cells via storage eviction + GC pressure.
        gc.collect()
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
        if name in RATIO_NOTES:
            cell["note"] = RATIO_NOTES[name]
        elif cell["ratio"] is not None and cell["ratio"] > 150:
            cell["note"] = "over 150x at 100x data — investigate"
        out[name] = cell
        print(json.dumps({name: out[name]}), flush=True)

    _write_record(out, only, partial=len(sys.argv) > 1)
    spark.stop()


def _write_record(
    out: dict[str, dict], only: list[str] | None, partial: bool
) -> None:
    """Merge ``out`` into BENCH_sf10.json and rewrite it with the record
    invariant enforced: ``queries`` and the live SKIP list PARTITION the
    registry — no cell for a SKIP-listed query (the r13 subset-pass leak
    put ivfpq_topk_recall in both maps), ``skipped`` regenerated from
    the live list on every write (tests/test_bench_records.py pins the
    invariant on the committed file)."""
    from bigdatapipelne_spark.queries import QUERIES, finalize_registry

    finalize_registry()
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_sf10.json")
    existing = {}
    if os.path.exists(path) and partial:
        with open(path) as f:
            existing = json.load(f).get("queries", {})
    existing.update(out)
    # the invariant filter: registered, benchable cells only
    existing = {
        k: v for k, v in existing.items() if k in QUERIES and k not in SKIP
    }
    # Standing attributions attach to every cell they name on ANY record
    # write (not only when that cell is in the rerun subset), so a known
    # cell can't shed its explanation by being skipped in a partial pass.
    for name, note_text in RATIO_NOTES.items():
        if name in existing and isinstance(existing[name], dict):
            existing[name]["note"] = note_text
    ratios = [
        c["ratio"]
        for c in existing.values()
        if isinstance(c, dict) and c.get("ratio") is not None
    ]
    ratios.sort()
    errors = sum(1 for c in existing.values() if "error" in c)
    # an empty/ratio-less record (fresh checkout --repair-record, or the
    # invariant filter dropped everything) still writes cleanly
    ratio_txt = (
        f"median ratio {ratios[len(ratios) // 2]:.2f}x / "
        f"max {max(ratios):.1f}x"
        if ratios
        else "no ratio-bearing cells yet"
    )
    note = (
        "synthetic sf10 from make_sf10.py (100x sf0.1, all 10 tables; 60M "
        "lineitem / 500k docs / 200k vectors); single warm pass per cell; "
        f"{len(existing)} cells (full registry minus capped exact "
        f"baselines), {errors} errors, {ratio_txt} at 100x "
        "data. Cells carrying a 'sessions' field are the "
        "session-consistent (sf0.1, sf10) pair with the minimal sf10 "
        "wall across that many same-code sessions — the round-10 box "
        "ran the interpreted tokenize/shingle stage JIT-bimodally "
        "(identical code measured 14.0s and 50.8s at sf10 "
        "back-to-back), the same best-of-N methodology bench.py uses. "
        "Round-6 rehearsal findings and their fixes are logged in "
        "STATUS.md (stop-shingle caps, sqrt(N) IVF cells, narrow-scan "
        "widening, A-ES filter hoist, corpus_pipeline checkpoint, "
        "minhash tokenize-once + band-bucket cap + length prefilter, "
        "bm25 explode-aggregate profile). Streaming-drain cells measure a "
        "per-invocation stateful-machinery constant, not data throughput: "
        "the stream-stream outer-join drain costs ~6s WARM at BOTH sf0.01 "
        "and sf0.1 on this box (state-store load/commit across 32 "
        "partitions x the multi-batch availableNow watermark cycle), "
        "while a trivial identity drain is ~0.5s and the equivalent "
        "batch join ~0.6s — measured round 9, "
        ".profiling/prof_drain_overhead_r9.py; the constant amortizes "
        "away on a long-running stream, so drain sf-ratios overstate "
        "scaling honesty only in the conservative direction."
    )
    if partial and only:
        note = f"last rerun subset: {sorted(only)}; " + note
    record = {
        "metric": "sf10_scale_check",
        "data_ratio": 100,
        "queries": existing,
        "skipped": SKIP,
        "note": note,
    }
    with open(path, "w") as f:
        json.dump(record, f, indent=1, sort_keys=True)
        f.write("\n")


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--repair-record":
        # rewrite the committed record under the live invariant (drops
        # SKIP-leaked / unregistered cells, regenerates `skipped`) with
        # no Spark session and no re-timing
        _write_record({}, None, partial=True)
    else:
        main()
