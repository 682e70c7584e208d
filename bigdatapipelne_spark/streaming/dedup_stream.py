"""Streaming standing-index NEAR-duplicate drain — the steady state of a
continuously-crawled corpus pipeline: each arriving micro-batch of
documents is MinHash-probed against a persisted, bucketed band index
(``operators/dedup.py save_near_dup_index`` layout) plus a run-scoped
ledger of previously-admitted batch documents, and then admitted into
that ledger (the per-batch index maintenance a real pipeline performs).

This is the MinHash twin of the exact-fingerprint streaming drain
(queries_llm.py incremental_dedup_stream_drain): same foreachBatch
shape, same in-stream plan audit. The streaming-source seam mirrors the
reference's streaming consumer (reference: flink_app/app.py:47-67 — a
Flink SQL job draining a Kinesis stream into windowed inserts); the
near-dup probe itself is the north-star LLM-pipeline extension over the
``documents`` table.

Scale contract (100 TB): the standing index is the big side and is never
shuffled — its three catalog tables are bucketed on their probe-join
keys, so every micro-batch plan shuffles ONLY the batch's own 40-byte
hash rows. That property is not aspirational: every batch asserts it
against the executed plan and aborts the stream loudly on violation
(see ``_assert_probe_plan``). The run ledger is the small, growing side
(documents admitted SINCE the standing index was built); it rides
broadcast joins until a compaction folds it into the standing index —
out of scope here, it is the same ``save_near_dup_index`` write.

Delivery contract: foreachBatch is AT-LEAST-ONCE, so every sink and
ledger write here is idempotent per micro-batch (``_write_batch``:
batch-id partition + dynamic overwrite — a replayed batch rewrites
exactly its own partition), and ledger probes see only STRICTLY EARLIER
batches' admissions so a replay can never match its own first attempt.
The ledger's band side is re-capped at probe time (the write-time cap
bounds one admission batch, not the cumulative bucket).
"""

from __future__ import annotations

import os
from concurrent.futures import ThreadPoolExecutor

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdatapipelne_spark.operators.checkpoint import (
    eager_checkpoint,
    release_checkpoint,
)

from bigdatapipelne_spark.operators.dedup import (
    MINHASH_MAX_BAND_BUCKET,
    NearDupIndex,
    _capped_bands,
    _shingle_hash_rows,
    _sigs_from_hash_rows,
    load_near_dup_index,
    lsh_bands,
    probe_near_dup_index,
)

# Hash-exchange budget for one micro-batch's standing-index probe plan:
# the batch side of probe_near_dup_index contributes a bounded set of
# hashpartitioning exchanges (signature/size/set aggregates over the
# batch's rows + the candidate/verify joins), and the standing index
# contributes NONE (bucketed scan or, at toy SF, a broadcast — neither is
# an "Exchange hashpartitioning" node). Measured via
# calibrate_probe_exchange_budget: 9 with the bucketed index at sf0.001
# AND sf0.01; an unbucketed index with broadcast disabled reads 20 (the
# trip case, exercised in tests/test_streaming.py). Smaller batches only
# ever flip joins TOWARD broadcast (fewer hash exchanges), so the
# full-delta measurement bounds every micro-batch.
PROBE_EXCHANGE_BUDGET = 9

_PAIR_SCHEMA = "delta_id long, corpus_id long, jaccard double"
_DELTA_PAIR_SCHEMA = "delta_id long, ledger_id long, jaccard double"


def calibrate_probe_exchange_budget(
    spark: SparkSession, staging_dir: str, index_name: str, threshold: float = 0.5
) -> int:
    """Count the hash exchanges in the REFERENCE probe plan — the whole
    staged delta probed against the bucketed standing index as one batch.
    Each micro-batch re-runs identical code on a subset, so its static
    plan carries the same or fewer hashpartitioning exchanges (size-based
    planner flips only go toward broadcast). Used to sanity-check
    PROBE_EXCHANGE_BUDGET in tests; the drain itself pins the constant so
    a silently-unbucketed index cannot recalibrate the audit away."""
    idx = load_near_dup_index(spark, index_name)
    ref = spark.read.schema("doc_id long, text string").parquet(staging_dir)
    shd = (
        _shingle_hash_rows(ref, "doc_id", "text")
        .withColumnRenamed("doc_id", "delta_id")
        .transform(eager_checkpoint)
    )
    try:
        pairs = probe_near_dup_index(shd, idx, threshold)
        plan = pairs._jdf.queryExecution().executedPlan().toString()
    finally:
        release_checkpoint(shd)
    return plan.count("Exchange hashpartitioning")


def _assert_probe_plan(
    pairs: DataFrame,
    index_name: str,
    budget: int,
    parts: tuple[str, ...] = ("bands", "shingles", "sizes"),
) -> None:
    """The in-stream zero-index-shuffle audit (same role as the exact
    drain's per-batch assertion): the executed probe plan must (a) read
    the standing index's catalog tables — all of ``parts`` — and (b)
    contain no more hashpartitioning exchanges than the batch side alone
    accounts for. AQE can coalesce or broadcast-flip exchanges (both
    reduce the count) but never adds one above a scan, so the static plan
    suffices. Raising here aborts the stream: a drain that silently
    re-shuffles a 100 TB index per micro-batch must fail loudly, not
    degrade."""
    plan = pairs._jdf.queryExecution().executedPlan().toString()
    for part in parts:
        if f"{index_name}_{part}" not in plan:
            raise AssertionError(
                f"probe plan does not read standing index table "
                f"{index_name}_{part}:\n{plan}"
            )
    n_ex = plan.count("Exchange hashpartitioning")
    if n_ex > budget:
        raise AssertionError(
            f"expected <={budget} hash exchanges (batch side only), got "
            f"{n_ex} — the standing index re-shuffled:\n{plan}"
        )


def _write_batch(df: DataFrame, path: str, batch_id: int) -> None:
    """Idempotent per-micro-batch sink write. foreachBatch is
    AT-LEAST-ONCE: a driver death between the sink write and the offset
    commit replays the batch on restart, and a bare append would then
    duplicate the replayed batch's rows. Partitioning by the engine's
    batch id and dynamic-overwriting makes the replay rewrite exactly its
    own partition — every other batch's data is untouched."""
    (
        df.withColumn("__batch_id", F.lit(batch_id))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("__batch_id")
        .parquet(path)
    )


def _read_batched(spark: SparkSession, path: str, schema: str) -> DataFrame:
    """Read a ``_write_batch`` layout back without the partition column;
    the explicit schema keeps an all-empty sink readable."""
    cols = [c.split()[0] for c in schema.split(",")]
    return (
        spark.read.schema(schema + ", __batch_id long")
        .parquet(path)
        .select(*cols)
    )


def _drive_staged_stream(spark: SparkSession, staging_dir: str, probe_fn, cp_dir: str) -> None:
    """The shared drain scaffold: one staged file per micro-batch through
    ``foreachBatch(probe_fn)`` with an availableNow trigger — the
    checkpoint is the job bookmark, so re-invoking with the same ``cp_dir``
    processes only files staged since the last run."""
    src = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(staging_dir)
    )
    (
        src.writeStream.foreachBatch(probe_fn)
        .option("checkpointLocation", cp_dir)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )


def run_near_dup_probe_stream(
    spark: SparkSession,
    staging_dir: str,
    index_name: str,
    out_root: str,
    threshold: float = 0.5,
    exchange_budget: int = PROBE_EXCHANGE_BUDGET,
) -> DataFrame:
    """Drain a staged document stream (``stage_ordered_files`` layout,
    one file per micro-batch) against the standing near-dup index
    ``index_name`` (a ``save_near_dup_index`` catalog layout).

    Per micro-batch:

    1. shingle-hash the batch ONCE (the only text scan); derive its band
       frame once — both local-checkpointed so the two probes and the
       ledger admission share one evaluation;
    2. probe the STANDING index -> ``(delta_id, corpus_id, jaccard)``
       appended to ``<out_root>/corpus_pairs`` — the oracle-gated output;
       the executed plan is audited (zero index-side shuffle) and the
       stream aborts on violation;
    3. probe the RUN LEDGER (documents admitted by earlier batches) ->
       ``(delta_id, ledger_id, jaccard)`` appended to
       ``<out_root>/delta_pairs`` — cross-batch near-dups WITHIN the
       arriving stream, the pairs a one-shot batch run never sees
       split-by-batch (certified in tests/test_streaming.py with a
       planted cross-batch near-copy);
    4. admit the batch into the ledger: its band rows, shingle rows and
       size rows appended under ``<out_root>/ledger/`` — the per-batch
       index maintenance. Every fetched document is admitted (a crawl
       pipeline indexes everything it saw so future fetches can match
       it); dedup DECISIONS are downstream of the emitted pairs.

    Returns the corpus-pairs frame — the union over batches, which equals
    the one-shot ``incremental_near_duplicates`` of the full delta because
    each document's standing-index pairs are independent of its batch.
    """
    idx = load_near_dup_index(spark, index_name)
    corpus_sink = os.path.join(out_root, "corpus_pairs")
    delta_sink = os.path.join(out_root, "delta_pairs")
    ledger = {
        p: os.path.join(out_root, "ledger", p)
        for p in ("bands", "shingles", "sizes")
    }

    def _probe_batch(batch_df: DataFrame, batch_id: int) -> None:
        shb = (
            _shingle_hash_rows(batch_df, "doc_id", "text")
            .withColumnRenamed("doc_id", "delta_id")
            .transform(eager_checkpoint)
        )
        bb = lsh_bands(
            _sigs_from_hash_rows(shb, "delta_id"), "delta_id"
        ).transform(eager_checkpoint)
        try:
            pairs = probe_near_dup_index(shb, idx, threshold, bands=bb)
            _assert_probe_plan(pairs, index_name, exchange_budget)
            _write_batch(pairs, corpus_sink, batch_id)

            if os.path.isdir(ledger["bands"]):
                # Probe only STRICTLY EARLIER batches' admissions: an
                # at-least-once replay of this batch would otherwise see
                # its own first-attempt admission and emit bogus
                # self-pairs. The ledger band side is re-capped here —
                # the cap is a property of the CUMULATIVE bucket, so
                # capping per admission batch alone would let a hot
                # boilerplate bucket grow without bound across the
                # stream's lifetime (same one-sided-undercount contract
                # as the standing index's write-time cap).
                def _led(part: str, schema: str) -> DataFrame:
                    return (
                        spark.read.schema(schema + ", __batch_id long")
                        .parquet(ledger[part])
                        .filter(F.col("__batch_id") < batch_id)
                        .drop("__batch_id")
                    )

                led = NearDupIndex(
                    bands=_capped_bands(
                        _led("bands", "corpus_id long, band int, band_key string"),
                        MINHASH_MAX_BAND_BUCKET,
                    ),
                    shingles=_led("shingles", "corpus_id long, sh string"),
                    sizes=_led("sizes", "corpus_id long, sz_c long"),
                )
                _write_batch(
                    probe_near_dup_index(shb, led, threshold, bands=bb)
                    .withColumnRenamed("corpus_id", "ledger_id"),
                    delta_sink,
                    batch_id,
                )
            # Ledger admission AFTER the ledger probe. The three writes
            # read only the two checkpointed frames and target distinct
            # directories, so they run concurrently (thread-submitted
            # jobs — the save_near_dup_index pattern); each is
            # idempotent per batch id like the sinks.
            admissions = [
                (
                    bb.select(
                        F.col("delta_id").alias("corpus_id"),
                        "band",
                        "band_key",
                    ),
                    ledger["bands"],
                ),
                (
                    shb.select(F.col("delta_id").alias("corpus_id"), "sh"),
                    ledger["shingles"],
                ),
                (
                    shb.groupBy("delta_id")
                    .agg(F.count(F.lit(1)).alias("sz_c"))
                    .select(F.col("delta_id").alias("corpus_id"), "sz_c"),
                    ledger["sizes"],
                ),
            ]
            with ThreadPoolExecutor(max_workers=3) as pool:
                for f in [
                    pool.submit(_write_batch, d, p, batch_id)
                    for d, p in admissions
                ]:
                    f.result()
        finally:
            release_checkpoint(bb)
            release_checkpoint(shb)

    _drive_staged_stream(
        spark, staging_dir, _probe_batch, os.path.join(out_root, "cp")
    )
    return _read_batched(spark, corpus_sink, _PAIR_SCHEMA)


def read_delta_pairs(spark: SparkSession, out_root: str) -> DataFrame:
    """The cross-batch (stream-internal) near-dup pairs a finished drain
    accumulated — empty if no later batch near-matched an earlier one."""
    path = os.path.join(out_root, "delta_pairs")
    if not os.path.isdir(path):
        return spark.createDataFrame([], _DELTA_PAIR_SCHEMA)
    return _read_batched(spark, path, _DELTA_PAIR_SCHEMA)


# Decontamination probe budget: the bucketed BenchmarkIndex probe plan
# carries exactly ONE hashpartitioning exchange — the batch side's
# (corpus_id, bench_id) intersection groupBy; the shingle equi-join rides
# the index bucketing (or a broadcast at toy SF) and the sizes join rides
# the bucketed bench_id layout. Measured at sf0.001 AND sf0.01; the
# unbucketed no-broadcast form reads 5 (trip case, exercised in
# tests/test_streaming.py).
DECON_PROBE_EXCHANGE_BUDGET = 1

_DECON_SCHEMA = "corpus_id long, bench_id long, containment double"


def run_decontaminate_stream(
    spark: SparkSession,
    staging_dir: str,
    index_name: str,
    out_root: str,
    threshold: float = 0.5,
    n: int = 3,
    exchange_budget: int = DECON_PROBE_EXCHANGE_BUDGET,
) -> DataFrame:
    """The third streaming standing-index member: per-micro-batch
    benchmark DECONTAMINATION of an arriving corpus stream against the
    persisted ``BenchmarkIndex`` (operators/dedup.py
    save_benchmark_index layout — shingles bucketed on the probe join
    key, sizes on bench_id). Unlike the dedup drains there is no ledger:
    the benchmark suite is static by definition, so per-batch maintenance
    is vacuous — each batch probes, appends its contaminated pairs to
    ``<out_root>/pairs``, and is done. The per-batch executed plan is
    audited (both index tables read in place, hash-exchange budget
    pinned) and the stream aborts on violation.

    Returns the pair frame — the union over batches, which equals the
    one-shot ``decontaminate`` of the full corpus because containment is
    a pure function of one corpus document and the index."""
    from bigdatapipelne_spark.operators.dedup import (
        decontaminate,
        load_benchmark_index,
    )

    idx = load_benchmark_index(spark, index_name)
    sink = os.path.join(out_root, "pairs")

    def _probe_batch(batch_df: DataFrame, batch_id: int) -> None:
        pairs = decontaminate(
            batch_df, None, "doc_id", "text", n=n, threshold=threshold,
            benchmark_index=idx,
        )
        _assert_probe_plan(
            pairs, index_name, exchange_budget, parts=("shingles", "sizes")
        )
        _write_batch(pairs, sink, batch_id)

    _drive_staged_stream(
        spark, staging_dir, _probe_batch, os.path.join(out_root, "cp")
    )
    return _read_batched(spark, sink, _DECON_SCHEMA)
