"""SparkSession factory with scale-aware defaults.

Local testing runs on ``local[N]``; the same configuration block is what we
would ship to a 1000-executor cluster — AQE on (runtime shuffle-partition
coalescing + skew-join splitting), broadcast threshold sized for dimension
tables, UTC session time so event-time semantics are deployment-independent
(the reference pins ISO-8601 event time in its Flink DDL,
flink_app/app.py:51-52).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "bigdatapipelne_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the engine's SparkSession.

    Defaults are chosen to survive a 100x scale-up unchanged:

    - AQE enabled: coalesces post-shuffle partitions at small SF and splits
      skewed partitions at large SF without re-tuning.
    - ``spark.sql.shuffle.partitions`` is only the pre-AQE upper bound; we
      size it from the core count locally (cluster deploys override it to
      ~2-3x total cores).
    - Arrow enabled for the (rare) Pandas-UDF paths.
    - UTC session timezone so window/bucket computations are reproducible.
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = max(cpus, 8)

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        .config("spark.sql.parquet.compression.codec", "snappy")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.shuffle.spill.compress", "true")
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    return builder.getOrCreate()
