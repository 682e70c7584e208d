"""Skew-join bench: the one shuffle class the main sweep doesn't stress.

Measures a pathologically skewed join (90% of rows on one key) three ways
on local[$SPARK_GRAFT_CPUS]:

- ``smj_plain``   — bare sort-merge join, AQE skew-split disabled: the hot
                    key is one straggler task.
- ``smj_aqe_skew``— same join with ``spark.sql.adaptive.skewJoin`` on
                    (thresholds at defaults scaled to the data): AQE splits
                    the hot partition at runtime.
- ``salted``      — operators/joins.salted_join: the manual split that also
                    survives a downstream same-key aggregation (where AQE
                    declines; see tests/test_joins.py).

Timing methodology: per strategy, best of ``REPS`` alternating warm passes
(this box swings 2-10x run-to-run; see BENCH_local.json methodology tag).
Writes BENCH_skew.json and prints one short JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

ROWS = int(os.environ.get("SKEW_BENCH_ROWS", "20000000"))
REPS = 3


def main() -> None:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.driver.memory", "16g")
        .appName("bench_skew")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ

    # 90% of ROWS on 'hot', remainder over 97 cold keys; dim side has no
    # aggregation so the SMJ(Sort(Stage), Sort(Stage)) shape lets
    # OptimizeSkewedJoin fire (a HashAggregate child blocks the pattern).
    big = spark.range(0, ROWS, numPartitions=int(cpus)).select(
        F.when(F.col("id") % 10 < 9, F.lit("hot"))
        .otherwise((F.col("id") % 97).cast("string"))
        .alias("k"),
        F.col("id").alias("v"),
    )
    right = spark.range(0, 98).select(
        F.when(F.col("id") == 97, F.lit("hot"))
        .otherwise(F.col("id").cast("string"))
        .alias("k"),
        (F.col("id") * 2).alias("w"),
    )

    from bigdatapipelne_spark.operators.joins import salted_join

    def smj(df_l, df_r):
        return df_l.join(df_r, "k")

    def run(strategy: str) -> float:
        if strategy == "smj_plain":
            spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
            out = smj(big, right)
        elif strategy == "smj_aqe_skew":
            spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
            # Defaults (256 MB / 5x median) are sized for cluster-scale
            # shuffles; scale them to this dataset so the optimization
            # fires here the way it would on a 100 TB hot key.
            spark.conf.set(
                "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16MB"
            )
            spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2.0")
            spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16MB")
            out = smj(big, right)
        else:
            spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
            out = salted_join(big, right, "k", salt=int(cpus))
        t0 = time.perf_counter()
        out.write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    strategies = ["smj_plain", "smj_aqe_skew", "salted"]
    for s in strategies:  # warm-up: JVM/codegen/scan caches off the clock
        run(s)
    samples: dict[str, list[float]] = {s: [] for s in strategies}
    for _ in range(REPS):  # alternating order so drift charges all equally
        for s in strategies:
            samples[s].append(round(run(s), 3))

    result = {
        "metric": "skew_join_sec",
        "unit": "sec",
        "rows": ROWS,
        "hot_fraction": 0.9,
        "methodology": f"best_of_{REPS}_alternating_warm",
        "timings": {s: min(v) for s, v in samples.items()},
        "samples": samples,
    }
    here = os.path.dirname(os.path.abspath(__file__))
    with open(os.path.join(here, "BENCH_skew.json"), "w") as f:
        json.dump(result, f, indent=1, sort_keys=True)
        f.write("\n")
    print(json.dumps({k: result[k] for k in ("metric", "unit", "rows", "timings")}))
    spark.stop()


if __name__ == "__main__":
    main()
