#!/usr/bin/env python
"""Skewed-BOILERPLATE dedup rehearsal (round-8 verdict #3).

The sf10 rehearsal corpus is engineered not-near-dup, so its shingle /
fingerprint doc-frequency distributions stay uniform and the stop-key
caps (NGRAM_MAX_DOC_FREQ=256, WINNOW_MAX_DOC_FREQ=32, minhash
MINHASH_MAX_BAND_BUCKET=256) never bind — the exact hot-key hazard they
exist to bound goes unexercised. Real crawl corpora have boilerplate:
shared footers/headers whose n-grams appear in a large fraction of all
documents, driving the inverted-index self-join's sum-of-df^2 quadratic.

This harness builds that corpus deliberately: sf1 documents (50k) with a
fixed ~50-token boilerplate footer appended to 10% of them (5,000 docs →
every footer shingle lands at df≈5,000, 20x past the n-gram cap and 150x
past the winnow cap), then measures each dedup operator on the BASE vs
the SKEWED corpus, caps at their defaults, best-of-REPS alternating warm
passes. The claim under test: the caps hold wall-time under a hot
fingerprint (skew/base ratio stays small and bounded, not df^2-shaped).

It also re-asserts the caps' ONE-SIDED semantics on a small slice where
the unbounded form is feasible: with a cap forced to bind, the capped
pair set must be a SUBSET of the uncapped one (missed pairs allowed,
invented pairs never), and per shared pair the capped jaccard/shared
must never exceed the uncapped value.

Writes BENCH_skew_corpus.json and prints one short JSON line.
Usage: ``python bench_skew_corpus.py [sf_dir]`` (default .localdata/sf1).
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

REPS = 2

# ~50 tokens of plausible boilerplate — enough distinct trigrams (~48) and
# 20-char-gram fingerprints to dominate the capped index if the caps fail.
FOOTER = (
    " all rights reserved terms of service privacy policy contact us "
    "subscribe to our newsletter follow us on social media copyright "
    "notice this material may not be published broadcast rewritten or "
    "redistributed without prior written permission the views expressed "
    "here are those of the individual authors and commenters alone"
)


def main() -> None:
    here = os.path.dirname(os.path.abspath(__file__))
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        here, ".localdata", "sf1"
    )
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from bigdatapipelne_spark.operators.dedup import (
        NGRAM_MAX_DOC_FREQ,
        WINNOW_MAX_DOC_FREQ,
        _shingle_hash_rows,
        minhash_near_duplicates,
        ngram_jaccard_duplicates,
        simhash_near_duplicates,
        winnowed_pairs,
    )
    from bigdatapipelne_spark.session import get_spark
    from bigdatapipelne_spark.sources.testdata import load_table

    spark = get_spark(
        "bench_skew_corpus", master=f"local[{cpus}]", shuffle_partitions=cpus
    )
    spark.sparkContext.setLogLevel("ERROR")
    # warm JVM + Arrow workers (bench.py rationale)
    spark.range(1000).selectExpr("sum(id)").write.format("noop").mode(
        "overwrite"
    ).save()
    (
        spark.range(64)
        .withColumn("g", F.col("id") % 8)
        .groupBy("g")
        .applyInPandas(lambda p: p, "id long, g long")
        .write.format("noop")
        .mode("overwrite")
        .save()
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    base = docs
    skew = docs.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 10 == 0, F.concat(F.col("text"), F.lit(FOOTER))
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    n_docs = docs.count()
    n_hot = skew.filter(F.col("doc_id") % 10 == 0).count()

    # --- the caps BIND on the skewed corpus (the rehearsal is honest) ---
    sh = _shingle_hash_rows(skew, "doc_id", "text")
    hot_df = (
        sh.groupBy("sh")
        .agg(F.count(F.lit(1)).alias("df"))
        .agg(
            F.max("df").alias("max_df"),
            F.sum(
                F.when(F.col("df") > NGRAM_MAX_DOC_FREQ, 1).otherwise(0)
            ).alias("n_capped"),
        )
        .collect()[0]
    )
    assert hot_df.n_capped > 0, "footer shingles must exceed the n-gram cap"

    OPS = {
        "minhash_near_dups": lambda d: minhash_near_duplicates(
            d, "doc_id", "text"
        ),
        "ngram_jaccard_pairs": lambda d: ngram_jaccard_duplicates(
            d, "doc_id", "text"
        ),
        "winnowed_doc_pairs": lambda d: winnowed_pairs(d, "doc_id", "text"),
        "simhash_near_dups": lambda d: simhash_near_duplicates(
            d, "doc_id", "text"
        ),
    }

    def cell(fn, d) -> tuple[float, int]:
        gc.collect()
        t0 = time.perf_counter()
        out = fn(d)
        out.write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        return dt, out.count()

    results: dict[str, dict] = {}
    for name, fn in OPS.items():
        b_samp, s_samp, rows = [], [], {}
        for rep in range(REPS):
            order = (
                [("base", base), ("skew", skew)]
                if rep % 2 == 0
                else [("skew", skew), ("base", base)]
            )
            for tag, d in order:
                dt, n = cell(fn, d)
                (b_samp if tag == "base" else s_samp).append(round(dt, 3))
                rows[tag] = n
        results[name] = {
            "base_sec": min(b_samp),
            "skew_sec": min(s_samp),
            "ratio": round(min(s_samp) / min(b_samp), 2),
            "base_samples": b_samp,
            "skew_samples": s_samp,
            "base_pairs": rows["base"],
            "skew_pairs": rows["skew"],
        }
        print(f"# {name}: {results[name]}", file=sys.stderr, flush=True)

    # --- one-sided semantics on a small slice (uncapped is feasible) ---
    small = skew.filter(F.col("doc_id") % 16 == 0)  # ~3k docs, ~300 hot
    tight_cap = 64  # forced to bind: footer df ≈ 300 > 64

    def keyset(df, val_col):
        return {
            (r.id_a, r.id_b): r[val_col]
            for r in df.select("id_a", "id_b", val_col).collect()
        }

    ng_cap = keyset(
        ngram_jaccard_duplicates(
            small, "doc_id", "text", max_doc_freq=tight_cap
        ),
        "jaccard",
    )
    ng_unc = keyset(
        ngram_jaccard_duplicates(small, "doc_id", "text", max_doc_freq=None),
        "jaccard",
    )
    assert set(ng_cap) <= set(ng_unc), "ngram cap invented a pair"
    assert all(
        ng_cap[k] <= ng_unc[k] + 1e-12 for k in ng_cap
    ), "ngram cap inflated a jaccard"

    wn_cap = keyset(
        winnowed_pairs(small, "doc_id", "text", max_doc_freq=8), "shared"
    )
    wn_unc = keyset(
        winnowed_pairs(small, "doc_id", "text", max_doc_freq=None), "shared"
    )
    assert set(wn_cap) <= set(wn_unc), "winnow cap invented a pair"
    assert all(
        wn_cap[k] <= wn_unc[k] for k in wn_cap
    ), "winnow cap inflated a shared count"

    mh_cap = keyset(
        minhash_near_duplicates(small, "doc_id", "text", max_band_bucket=8),
        "jaccard",
    )
    mh_unc = keyset(
        minhash_near_duplicates(
            small, "doc_id", "text", max_band_bucket=None
        ),
        "jaccard",
    )
    assert set(mh_cap) <= set(mh_unc), "band cap invented a pair"
    assert all(
        abs(mh_cap[k] - mh_unc[k]) < 1e-12 for k in mh_cap
    ), "verification jaccard must be cap-independent"

    # --- probe-path skew (round-10 verdict #4) -------------------------
    # The daily-batch case the one-shot rehearsal above misses: a hot
    # boilerplate footer in the DELTA probing a PRE-BUILT standing index
    # (hot band_key buckets on the probe equi-join). The index is built
    # once from the skewed corpus — boilerplate lives in a real crawl's
    # standing index too, and its bucket cap binds at index-write time —
    # and only the probe is timed, base vs skewed delta, alternating warm.
    import tempfile

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

    pid = os.getpid()
    _DELTA_OFF = 1 << 42
    slice_ = docs.filter(F.col("doc_id") % 7 == 0).select(
        (F.col("doc_id") + F.lit(_DELTA_OFF)).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" recrawl")).alias("text"),
    )
    delta_base = slice_
    delta_skew = slice_.select(
        "doc_id", F.concat(F.col("text"), F.lit(FOOTER)).alias("text")
    )

    nd_name, nd_root = f"skew_nd_ix_{pid}", tempfile.mkdtemp(prefix="skew_nd_")
    for part in ("bands", "shingles", "sizes"):
        spark.sql(f"DROP TABLE IF EXISTS {nd_name}_{part}")
    save_near_dup_index(
        build_near_dup_index(skew, "doc_id", "text"), nd_name, nd_root
    )

    def nd_probe(d):
        return incremental_near_duplicates(
            d, None, "doc_id", "text",
            corpus_index=load_near_dup_index(spark, nd_name),
        )

    b_samp, s_samp, rows = [], [], {}
    for rep in range(REPS):
        order = (
            [("base", delta_base), ("skew", delta_skew)]
            if rep % 2 == 0
            else [("skew", delta_skew), ("base", delta_base)]
        )
        for tag, d in order:
            dt, n = cell(nd_probe, d)
            (b_samp if tag == "base" else s_samp).append(round(dt, 3))
            rows[tag] = n
    results["incremental_near_dup_probe"] = {
        "base_sec": min(b_samp),
        "skew_sec": min(s_samp),
        "ratio": round(min(s_samp) / min(b_samp), 2),
        "base_samples": b_samp,
        "skew_samples": s_samp,
        "base_pairs": rows["base"],
        "skew_pairs": rows["skew"],
    }
    print(
        f"# incremental_near_dup_probe: {results['incremental_near_dup_probe']}",
        file=sys.stderr, flush=True,
    )
    for part in ("bands", "shingles", "sizes"):
        spark.sql(f"DROP TABLE IF EXISTS {nd_name}_{part}")

    # exact-probe hot fingerprint: a viral page duplicated across 10% of
    # the delta — ONE hot __fp key on the probe join (matches stay 1:1
    # against the distinct index, so this prices the skewed shuffle, not
    # a quadratic blowup; the assertion is the ratio itself).
    viral = docs.orderBy("doc_id").limit(1).select("text").collect()[0].text
    exact_skew = slice_.select(
        "doc_id",
        F.when(F.col("doc_id") % 10 == 0, F.lit(viral))
        .otherwise(F.col("text"))
        .alias("text"),
    )
    fp_name, fp_root = f"skew_fp_ix_{pid}", tempfile.mkdtemp(prefix="skew_fp_")
    spark.sql(f"DROP TABLE IF EXISTS {fp_name}")
    save_fingerprint_index(
        build_fingerprint_index(skew, "doc_id", "text"), fp_name, fp_root
    )

    def fp_probe(d):
        return incremental_exact_duplicates(
            d, None, "doc_id", "text",
            corpus_index=load_fingerprint_index(spark, fp_name),
        )

    b_samp, s_samp, rows = [], [], {}
    for rep in range(REPS):
        order = (
            [("base", delta_base), ("skew", exact_skew)]
            if rep % 2 == 0
            else [("skew", exact_skew), ("base", delta_base)]
        )
        for tag, d in order:
            dt, n = cell(fp_probe, d)
            (b_samp if tag == "base" else s_samp).append(round(dt, 3))
            rows[tag] = n
    results["incremental_dedup_probe"] = {
        "base_sec": min(b_samp),
        "skew_sec": min(s_samp),
        "ratio": round(min(s_samp) / min(b_samp), 2),
        "base_samples": b_samp,
        "skew_samples": s_samp,
        "base_pairs": rows["base"],
        "skew_pairs": rows["skew"],
    }
    print(
        f"# incremental_dedup_probe: {results['incremental_dedup_probe']}",
        file=sys.stderr, flush=True,
    )
    spark.sql(f"DROP TABLE IF EXISTS {fp_name}")

    # one-sided semantics on the PROBE path, index cap forced to bind:
    # pairs from the capped standing index must be a subset of the
    # uncapped index's pairs, with identical verification jaccard.
    small_delta = delta_skew.filter(F.col("doc_id") % 16 == 0)

    def probe_keyset(cap):
        idx = build_near_dup_index(small, "doc_id", "text", max_band_bucket=cap)
        return {
            (r.delta_id, r.corpus_id): r.jaccard
            for r in incremental_near_duplicates(
                small_delta, None, "doc_id", "text", corpus_index=idx
            ).collect()
        }

    pr_cap, pr_unc = probe_keyset(8), probe_keyset(None)
    assert set(pr_cap) <= set(pr_unc), "probe index cap invented a pair"
    assert all(
        abs(pr_cap[k] - pr_unc[k]) < 1e-12 for k in pr_cap
    ), "probe verification jaccard must be cap-independent"

    out = {
        "metric": "skew_corpus_dedup_sec",
        "unit": "sec",
        "sf_dir": sf_dir,
        "n_docs": n_docs,
        "n_boilerplate_docs": n_hot,
        "footer_tokens": len(FOOTER.split()),
        "hot_shingle_max_df": hot_df.max_df,
        "shingles_over_ngram_cap": hot_df.n_capped,
        "caps": {
            "ngram_max_doc_freq": NGRAM_MAX_DOC_FREQ,
            "winnow_max_doc_freq": WINNOW_MAX_DOC_FREQ,
        },
        "methodology": f"best_of_{REPS}_alternating_warm",
        "one_sided_semantics_asserted": True,
        "queries": results,
        "note": (
            "10% of sf1 docs share a 50-token boilerplate footer; every "
            "footer shingle/fingerprint is a hot key far past the caps. "
            "ratio = skew_sec/base_sec with caps at defaults; the subset/"
            "no-inflation assertions re-prove the caps' one-sided "
            "undercount contract with a cap forced to bind. The "
            "incremental_*_probe rows are the STEADY-STATE skew case "
            "(round-10): base vs boilerplate/viral-duplicate delta "
            "probing a pre-built bucketed standing index (built from the "
            "skewed corpus, untimed) — hot band_key / __fp keys on the "
            "probe join; one-sided semantics re-asserted on the probe "
            "path with the index cap forced to bind."
        ),
    }
    with open(os.path.join(here, "BENCH_skew_corpus.json"), "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
        f.write("\n")
    print(
        json.dumps(
            {
                "metric": out["metric"],
                "queries": {
                    k: {kk: v[kk] for kk in ("base_sec", "skew_sec", "ratio")}
                    for k, v in results.items()
                },
                "one_sided_semantics_asserted": True,
            }
        )
    )


if __name__ == "__main__":
    main()
