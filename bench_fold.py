"""Ledger-growth curve + fold payoff for the streaming near-dup drain
(round-11 verdict item #1), plus the gate cell's setup-vs-drain split
(item #5).

The drain's per-batch ledger probe re-reads and re-caps the CUMULATIVE
run ledger — an O(ledger) term that grows every batch until
``fold_ledger_into_index`` compacts the ledger into the standing index.
This script measures that curve instead of asserting it:

1. **no_fold** — N_BATCHES document micro-batches drained through
   ``run_near_dup_probe_stream`` against a standing index built from the
   corpus; per-batch ``triggerExecution`` from the query progress feed.
2. **with_fold** — the SAME staged batches, but after N/2 the stream is
   stopped (availableNow boundary), the ledger is folded into the index,
   and the remaining batches resume against the folded index with an
   empty ledger. Records the fold's own wall time and the post-fold
   per-batch curve (expected: drops back to the early-batch floor while
   no_fold keeps climbing).
   Row-count sanity: corpus_pairs of both modes are asserted EQUAL as
   multisets on (delta_id, corpus_id) — folding moves an admitted
   document's future pairs from the delta_pairs side sink into
   corpus_pairs, so corpus_pairs alone differs by construction; the
   assert therefore compares corpus_pairs ∪ delta_pairs (the complete
   pair set, which the fold must preserve exactly).
3. **uncapped** (round-12 verdict #2) — the same batches with the
   band-bucket cap disabled end to end: the candidate-superset
   reference that bounds the cap's recall cost. Each capped mode
   ⊆ uncapped is asserted (structural: capped candidate buckets are a
   subset, verification is a pure filter); the two capped modes are
   recorded against each other WITHOUT an order — the static
   joint-vs-separate split points folded below no-fold
   (tests/test_llm_ops.py::test_cap_bound_containment_direction) while
   the fold's ledger reset points it above, so their streaming sets
   can diverge both ways. ``cap_bound_certificate`` turns "the cap is
   a one-sided undercount" from asserted into measured at the
   cap-binding SF.
4. **gate_cell_split** — the incremental_near_dup_stream_drain gate
   cell's phases timed separately (stage + index build/save = setup vs
   the audited 3-batch drain), so the driver-record cell (~10s at sf0.1)
   reads as the per-invocation constant it is (verdict item #5).

Output: one JSON line + BENCH_fold.json. Timing caveats per
.claude/skills/verify: run alone, one session, warm box.
"""

from __future__ import annotations

import gc
import json
import os
import shutil
import tempfile
import time

from pyspark.sql import functions as F

from bigdatapipelne_spark.operators.checkpoint import release_checkpoint
from bigdatapipelne_spark.operators.dedup import (
    build_near_dup_index,
    save_near_dup_index,
)
from bigdatapipelne_spark.session import get_spark
from bigdatapipelne_spark.sources.testdata import load_table
from bigdatapipelne_spark.streaming.dedup_stream import (
    fold_ledger_into_index,
    read_delta_pairs,
    run_near_dup_probe_stream,
)
from bigdatapipelne_spark.streaming.scd import stage_ordered_files

N_BATCHES = 50

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def _delta_batches(spark):
    """The incremental_near_dup gate construction (src3 slice + drifted
    re-crawls of every 17th corpus doc), split into N_BATCHES md5-hash
    batches — a deterministic shuffle so every batch mixes sources the
    way a crawl frontier does."""
    from bigdatapipelne_spark.queries_llm import _incr_near_dup_delta

    docs = load_table(spark, SF_DIR, "documents").select(
        "doc_id", "text", "source"
    )
    delta, corpus = _incr_near_dup_delta(docs)
    delta = delta.withColumn(
        "__b",
        F.abs(F.hash(F.md5(F.col("doc_id").cast("string")))) % N_BATCHES,
    ).localCheckpoint(eager=True)
    batches = [
        delta.filter(F.col("__b") == i).drop("__b") for i in range(N_BATCHES)
    ]
    return batches, corpus, delta


def _build_index(spark, corpus, name: str, root: str) -> None:
    ix = build_near_dup_index(corpus, "doc_id", "text")
    save_near_dup_index(ix, name, root)
    release_checkpoint(ix.shingles)


def _pair_multiset(spark, out_root):
    corpus_pairs = [
        (r.delta_id, r.corpus_id)
        for r in run_collected[out_root].select("delta_id", "corpus_id").collect()
    ]
    dp = [
        (r.delta_id, r.ledger_id)
        for r in read_delta_pairs(spark, out_root).collect()
    ]
    return sorted(corpus_pairs + dp)


run_collected: dict = {}


def main() -> None:
    spark = get_spark("bench-fold", master=f"local[{CPUS}]")
    pid = os.getpid()
    batches, corpus, delta_ck = _delta_batches(spark)
    record: dict = {
        "metric": "near_dup_ledger_fold",
        "unit": "sec",
        "sf_dir": SF_DIR,
        "n_batches": N_BATCHES,
    }

    # ---- mode 1: no fold -------------------------------------------------
    tmp1 = tempfile.mkdtemp(prefix="fold_no_")
    name1 = f"bf_nf_{pid}"
    t0 = time.time()
    _build_index(spark, corpus, name1, os.path.join(tmp1, "ix"))
    build_sec = time.time() - t0
    staging1 = os.path.join(tmp1, "staging")
    stage_ordered_files(batches, staging1)
    prog1: list = []
    out1 = os.path.join(tmp1, "out")
    t0 = time.time()
    run_collected[out1] = run_near_dup_probe_stream(
        spark, staging1, name1, out1, progress_out=prog1
    )
    no_fold_drain_sec = time.time() - t0
    pairs_no_fold = _pair_multiset(spark, out1)
    gc.collect()

    # ---- mode 2: fold at N/2 --------------------------------------------
    tmp2 = tempfile.mkdtemp(prefix="fold_yes_")
    name2 = f"bf_wf_{pid}"
    _build_index(spark, corpus, name2, os.path.join(tmp2, "ix"))
    staging2a = os.path.join(tmp2, "staging")
    half = N_BATCHES // 2
    stage_ordered_files(batches[:half], staging2a)
    prog2: list = []
    out2 = os.path.join(tmp2, "out")
    t0 = time.time()
    run_near_dup_probe_stream(
        spark, staging2a, name2, out2, progress_out=prog2
    )
    phase1_sec = time.time() - t0

    folded = f"bf_wf_{pid}_f"
    t0 = time.time()
    fold_ledger_into_index(
        spark, name2, out2, folded, os.path.join(tmp2, "ix_folded")
    )
    fold_sec = time.time() - t0

    # pre-fold delta_pairs must be captured BEFORE phase 2 appends more
    pre_fold_delta = [
        (r.delta_id, r.ledger_id)
        for r in read_delta_pairs(spark, out2).collect()
    ]
    from bigdatapipelne_spark.streaming.scd import stage_one_more_file

    for b in batches[half:]:
        stage_one_more_file(b, staging2a)
    t0 = time.time()
    run_collected[out2] = run_near_dup_probe_stream(
        spark, staging2a, folded, out2, progress_out=prog2
    )
    phase2_sec = time.time() - t0
    pairs_with_fold = _pair_multiset(spark, out2)
    gc.collect()

    # ---- mode 3: UNCAPPED reference (round-12 verdict #2) ----------------
    # The same staged batches drained with the band-bucket cap disabled
    # on both the standing index (built max_band_bucket=None) and the
    # per-batch ledger re-cap — the candidate-superset reference that
    # bounds what the cumulative cap suppresses. Containment is a
    # theorem (capped candidate buckets ⊆ uncapped; verification is a
    # pure filter; and a bucket surviving the JOINT cap survives both
    # separate caps, so folded ⊆ no-fold — direction pinned by
    # tests/test_llm_ops.py::test_cap_bound_containment_direction); this
    # mode MEASURES the loss at a scale where the cap binds.
    from bigdatapipelne_spark.operators.checkpoint import (
        release_checkpoint as _rc,
    )

    tmp3u = tempfile.mkdtemp(prefix="fold_uncap_")
    name_u = f"bf_uc_{pid}"
    ix_u = build_near_dup_index(
        corpus, "doc_id", "text", max_band_bucket=None
    )
    save_near_dup_index(ix_u, name_u, os.path.join(tmp3u, "ix"))
    _rc(ix_u.shingles)
    staging_u = os.path.join(tmp3u, "staging")
    stage_ordered_files(batches, staging_u)
    out_u = os.path.join(tmp3u, "out")
    t0 = time.time()
    run_collected[out_u] = run_near_dup_probe_stream(
        spark, staging_u, name_u, out_u, max_band_bucket=None
    )
    uncapped_drain_sec = time.time() - t0
    pairs_uncapped = _pair_multiset(spark, out_u)
    gc.collect()

    s_nf, s_wf, s_uc = (
        set(pairs_no_fold), set(pairs_with_fold), set(pairs_uncapped)
    )
    # STRUCTURAL containments only: each capped mode ⊆ uncapped (capped
    # candidate buckets are a subset of uncapped ones; verification is a
    # pure filter). The two capped STREAMING modes are NOT ordered
    # against each other: the static joint-vs-separate split alone would
    # give folded ⊆ no-fold (test_cap_bound_containment_direction), but
    # the fold also RESETS the ledger — post-fold batches re-cap a small
    # fresh ledger where no-fold re-caps the large cumulative one — and
    # that asymmetry points the other way, so at a cap-binding scale the
    # two sets can differ in BOTH directions; the certificate measures
    # the symmetric difference instead of asserting an order.
    assert s_nf <= s_uc and s_wf <= s_uc, (
        "cap is not a one-sided undercount vs the uncapped reference: "
        f"nofold-uncapped diff {len(s_nf - s_uc)}, "
        f"folded-uncapped diff {len(s_wf - s_uc)}"
    )
    record["cap_bound_certificate"] = {
        "note": (
            "uncapped = same drain, max_band_bucket=None on index build "
            "and ledger re-cap; mode ⊆ uncapped is structural "
            "(asserted); the capped modes are mutually unordered in "
            "streaming (joint-vs-separate capping pulls folded down, "
            "the fold's ledger reset pulls it up) — their divergence is "
            "recorded, not asserted"
        ),
        "uncapped_drain_sec": round(uncapped_drain_sec, 3),
        "pairs_uncapped": len(s_uc),
        "pairs_no_fold": len(s_nf),
        "pairs_with_fold": len(s_wf),
        "lost_to_cap_no_fold": len(s_uc - s_nf),
        "lost_to_cap_with_fold": len(s_uc - s_wf),
        "nofold_minus_folded": len(s_nf - s_wf),
        "folded_minus_nofold": len(s_wf - s_nf),
        "loss_frac_no_fold": round(
            len(s_uc - s_nf) / max(len(s_uc), 1), 6
        ),
        "loss_frac_with_fold": round(
            len(s_uc - s_wf) / max(len(s_uc), 1), 6
        ),
    }

    # The no_fold == with_fold complete-pair-set equality is only an
    # invariant while the band-bucket cap is a NO-OP at this SF: no_fold
    # caps the standing index and the ledger SEPARATELY while the folded
    # index caps their union JOINTLY (fold_ledger_into_index documents
    # the divergence — a bucket crossing the cap only jointly), so at a
    # cap-binding corpus the two modes legitimately differ by
    # cap-suppressed candidates. Check the precondition and record it.
    from bigdatapipelne_spark.operators.dedup import (
        MINHASH_MAX_BAND_BUCKET,
        _sigs_from_hash_rows,
        _shingle_hash_rows,
        lsh_bands,
    )

    everything = corpus.unionByName(delta_ck.drop("__b"))
    max_bucket = (
        lsh_bands(
            _sigs_from_hash_rows(
                _shingle_hash_rows(everything, "doc_id", "text"), "doc_id"
            ),
            "doc_id",
        )
        .groupBy("band", "band_key")
        .count()
        .agg(F.max("count"))
        .first()[0]
    )
    # <=: _capped_bands drops only buckets with count > cap (its filter
    # keeps __n <= max_bucket), so a bucket exactly AT the cap survives
    # in both modes and the equality still holds
    cap_noop = max_bucket <= MINHASH_MAX_BAND_BUCKET
    record["cap_noop_at_this_sf"] = {
        "max_band_bucket": int(max_bucket),
        "cap": MINHASH_MAX_BAND_BUCKET,
        "holds": bool(cap_noop),
    }
    if cap_noop:
        assert pairs_no_fold == pairs_with_fold, (
            "fold changed the complete pair set: "
            f"{len(pairs_no_fold)} vs {len(pairs_with_fold)}"
        )

    def curve(prog):
        return [
            {"batch": p["batch"], "rows_in": p["rows_in"],
             "trigger_sec": round(p["trigger_ms"] / 1000.0, 3)}
            for p in prog if p["rows_in"] > 0
        ]

    c1, c2 = curve(prog1), curve(prog2)
    record["no_fold"] = {
        "index_build_save_sec": round(build_sec, 3),
        "drain_sec": round(no_fold_drain_sec, 3),
        "per_batch": c1,
        "last5_mean_sec": round(
            sum(p["trigger_sec"] for p in c1[-5:]) / max(len(c1[-5:]), 1), 3
        ),
        "first5_mean_sec": round(
            sum(p["trigger_sec"] for p in c1[:5]) / max(len(c1[:5]), 1), 3
        ),
    }
    record["with_fold"] = {
        "fold_at_batch": half,
        "fold_sec": round(fold_sec, 3),
        "phase1_sec": round(phase1_sec, 3),
        "phase2_sec": round(phase2_sec, 3),
        "per_batch": c2,
        "post_fold_first5_mean_sec": round(
            sum(p["trigger_sec"] for p in c2[half:half + 5])
            / max(len(c2[half:half + 5]), 1),
            3,
        ),
        "last5_mean_sec": round(
            sum(p["trigger_sec"] for p in c2[-5:]) / max(len(c2[-5:]), 1), 3
        ),
        "pre_fold_delta_pairs": len(pre_fold_delta),
        "total_pairs": len(pairs_with_fold),
    }

    # ---- gate-cell setup vs drain split (verdict item #5) ----------------
    tmp3 = tempfile.mkdtemp(prefix="gate_split_")
    name3 = f"bf_gate_{pid}"
    t0 = time.time()
    _build_index(spark, corpus, name3, os.path.join(tmp3, "ix"))
    setup_build = time.time() - t0
    gate_staging = os.path.join(tmp3, "staging")
    from bigdatapipelne_spark.queries_llm import _RECRAWL_OFF_1

    t0 = time.time()
    stage_ordered_files(
        [
            delta_ck.filter(
                (F.col("doc_id") < _RECRAWL_OFF_1) & (F.col("doc_id") % 2 == 0)
            ).drop("__b"),
            delta_ck.filter(
                (F.col("doc_id") < _RECRAWL_OFF_1) & (F.col("doc_id") % 2 == 1)
            ).drop("__b"),
            delta_ck.filter(F.col("doc_id") >= _RECRAWL_OFF_1).drop("__b"),
        ],
        gate_staging,
    )
    setup_stage = time.time() - t0
    t0 = time.time()
    run_near_dup_probe_stream(
        spark, gate_staging, name3, os.path.join(tmp3, "out")
    ).count()
    gate_drain = time.time() - t0
    record["gate_cell_split"] = {
        "note": (
            "incremental_near_dup_stream_drain's driver cell is "
            "~per-invocation setup by construction: index build+save and "
            "file staging happen INSIDE the cell; the audited 3-batch "
            "drain is the steady-state part"
        ),
        "setup_index_build_save_sec": round(setup_build, 3),
        "setup_stage_files_sec": round(setup_stage, 3),
        "drain_3_batches_sec": round(gate_drain, 3),
    }

    for t in (tmp1, tmp2, tmp3, tmp3u):
        shutil.rmtree(t, ignore_errors=True)
    for n in (name1, name2, folded, name3, name_u):
        for part in ("bands", "shingles", "sizes"):
            spark.sql(f"DROP TABLE IF EXISTS {n}_{part}")

    # merge by sf_dir so curves at several scales coexist in one record
    # (the O(ledger) per-batch term needs a big-enough delta to rise
    # above the ~2s streaming constant — sf0.1's 30-doc batches barely
    # show it, sf1's ~300-doc batches do)
    path = os.path.join(os.path.dirname(__file__), "BENCH_fold.json")
    merged: dict = {"metric": "near_dup_ledger_fold", "unit": "sec", "by_sf": {}}
    if os.path.exists(path):
        try:
            prev = json.load(open(path))
            if "by_sf" in prev:
                merged["by_sf"] = prev["by_sf"]
        except Exception:
            pass
    merged["by_sf"][SF_DIR] = {
        k: v for k, v in record.items() if k not in ("metric", "unit")
    }
    line = json.dumps(merged)
    print(json.dumps(record))
    with open(path, "w") as fh:
        fh.write(line + "\n")


if __name__ == "__main__":
    main()
