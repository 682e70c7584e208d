"""End-to-end medallion pipeline on the card schema (SURVEY.md §3.1,
FIXTURES.md A1-A3): gzip JSON-lines raw (Hive-partitioned by estado, with a
corrupt record) -> 16-field ApplyMapping stage parquet -> 10-dim spec mart,
chained by the Pipeline runner; spec totals verified against DuckDB reading
the stage parquet; incremental ledger + availableNow bookmarks."""

from __future__ import annotations

import gzip
import os

import duckdb
import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from bigdatapipelne_spark.plans.medallion import (
    CARD_RAW_SCHEMA,
    CARD_STAGE_MAPPING,
    SPEC_DIMS,
    incremental_paths,
    run_medallion,
    spec_transform,
    stage_transform,
)
from bigdatapipelne_spark.queries_pipeline import card_raw_from_events
from bigdatapipelne_spark.sources.catalog import drop_table, register_parquet_table
from bigdatapipelne_spark.sources.io import (
    read_json,
    write_json_partitioned,
)
from bigdatapipelne_spark.sources.testdata import load_table

from .conftest import SF_SMALL

# Raw files carry every column EXCEPT estado, which lives in the Hive
# partition directory (Firehose dynamic partitioning, historical.py:217-228).
RAW_FILE_SCHEMA = StructType([f for f in CARD_RAW_SCHEMA.fields if f.name != "estado"])


@pytest.fixture(scope="module")
def raw_dir(spark, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("medallion")
    raw_path = str(tmp / "raw")
    raw = card_raw_from_events(load_table(spark, SF_SMALL, "events"))
    write_json_partitioned(raw, raw_path, ["estado"])  # gzip JSON-lines
    # Inject one undecodable line into a partition (Firehose error/ parity).
    bad = os.path.join(raw_path, "estado=SP", "bad.json.gz")
    with gzip.open(bad, "wt") as f:
        f.write('{"nome": broken\n')
    return raw_path


def test_raw_read_drops_corrupt(spark, raw_dir):
    df = read_json(spark, raw_dir, schema=RAW_FILE_SCHEMA)
    assert df.count() == 1000  # 1000 good rows, bad line dropped
    assert "estado" in df.columns  # partition column discovered


def test_raw_read_keeps_corrupt(spark, raw_dir):
    df = read_json(spark, raw_dir, schema=RAW_FILE_SCHEMA, keep_corrupt=True).cache()
    try:
        assert df.count() == 1001
        assert df.filter(F.col("_corrupt_record").isNotNull()).count() == 1
    finally:
        df.unpersist()


def test_medallion_end_to_end(spark, raw_dir, tmp_path):
    stage_path = str(tmp_path / "stage")
    spec_path = str(tmp_path / "spec")
    done = run_medallion(spark, raw_dir, stage_path, spec_path)
    assert done == ["stage", "spec"]

    # Stage schema = the 16 ApplyMapping outputs (FIXTURES.md A2), incl. the
    # loc-estado rename and double lat/lng.
    stage = spark.read.parquet(stage_path)
    assert sorted(stage.columns) == sorted(t for _, t, _ in CARD_STAGE_MAPPING)
    types = {f.name: f.dataType.simpleString() for f in stage.schema.fields}
    assert types["latitude"] == "double" and types["longitude"] == "double"
    assert types["loc-estado"] == "string"
    assert stage.count() == 1000

    # Spec totals vs DuckDB aggregating the SAME stage parquet.
    spec = spark.read.parquet(spec_path)
    assert sorted(spec.columns) == sorted(SPEC_DIMS + ["sum_valor"])
    con = duckdb.connect()
    dims = ", ".join(d for d in SPEC_DIMS)
    oracle = con.execute(
        f"""
        SELECT {dims},
               CAST(CAST(SUM(CAST(valor AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE)
                 AS sum_valor
        FROM read_parquet('{stage_path}/*/*.parquet', hive_partitioning=1)
        GROUP BY {dims}
        """
    ).fetchall()
    cols = SPEC_DIMS + ["sum_valor"]
    got = sorted(tuple(r[c] for c in cols) for r in spec.collect())
    assert got == sorted(map(tuple, oracle))


def test_stage_catalog_registration(spark, raw_dir, tmp_path):
    """S10: external-table registration over the partitioned stage layout —
    the crawler parity path (historical.py:323-353)."""
    stage_path = str(tmp_path / "stage_cat")
    raw = read_json(spark, raw_dir, schema=RAW_FILE_SCHEMA)
    stage_transform(raw).write.mode("overwrite").partitionBy("estado").parquet(stage_path)
    register_parquet_table(spark, stage_path, "stage_tbl", partitioned_by=["estado"])
    try:
        assert spark.table("stage_tbl").count() == 1000
        assert spark.sql("SELECT DISTINCT estado FROM stage_tbl").count() == 3
    finally:
        drop_table(spark, "stage_tbl")


def test_incremental_ledger(raw_dir, tmp_path):
    ledger = str(tmp_path / "ledger.json")
    new, commit = incremental_paths(raw_dir, ledger)
    assert len(new) > 0
    commit()
    again, _ = incremental_paths(raw_dir, ledger)
    assert again == []  # everything bookmarked

    # A new landing file shows up incrementally.
    extra = os.path.join(raw_dir, "estado=SP", "late.json.gz")
    with gzip.open(extra, "wt") as f:
        f.write("{}\n")
    try:
        newer, commit2 = incremental_paths(raw_dir, ledger)
        assert newer == [extra]
        commit2()
        final, _ = incremental_paths(raw_dir, ledger)
        assert final == []
    finally:
        os.remove(extra)


def test_incremental_spec_mart_matches_one_shot(spark, tmp_path):
    """Two availableNow drains over growing raw data == the one-shot
    spec_transform over everything, bit-equal doubles; a rerun with no new
    files leaves the mart untouched (checkpoint = bookmark)."""
    from bigdatapipelne_spark.plans.medallion import (
        incremental_spec_mart,
        spec_mart_view,
    )

    raw = card_raw_from_events(load_table(spark, SF_SMALL, "events"))
    half_a = raw.filter(F.col("transaction_id") % 2 == 0)
    half_b = raw.filter(F.col("transaction_id") % 2 == 1)

    raw_path = str(tmp_path / "raw")
    spec_path = str(tmp_path / "spec")
    cp = str(tmp_path / "cp")

    half_a.write.mode("append").json(raw_path)
    incremental_spec_mart(spark, raw_path, spec_path, cp)
    n_after_first = spec_mart_view(spark, spec_path).count()

    half_b.write.mode("append").json(raw_path)
    incremental_spec_mart(spark, raw_path, spec_path, cp)

    got = sorted(map(tuple, spec_mart_view(spark, spec_path).collect()))
    exp = sorted(map(tuple, spec_transform(stage_transform(raw)).collect()))
    assert got == exp
    assert n_after_first < len(got)

    # No new files -> no merge runs -> mtimes untouched.
    import glob

    before = {p: os.path.getmtime(p) for p in glob.glob(spec_path + "/*")}
    incremental_spec_mart(spark, raw_path, spec_path, cp)
    after = {p: os.path.getmtime(p) for p in glob.glob(spec_path + "/*")}
    assert before == after


def test_merge_spec_batch_replay_is_noop(spark, tmp_path):
    """foreachBatch is at-least-once and the spec-mart merge is ADDITIVE
    — the one sink shape that is not naturally idempotent. The stored
    __batch_id guard must make a replayed batch a no-op (driver death
    between the mart swap and the offset commit re-runs exactly the
    already-merged batch), while the next real batch still merges."""
    from bigdatapipelne_spark.plans.medallion import (
        merge_spec_batch,
        spec_mart_view,
        stage_transform,
    )

    raw = card_raw_from_events(load_table(spark, SF_SMALL, "events"))
    b0 = stage_transform(raw.filter(F.col("transaction_id") % 2 == 0))
    b1 = stage_transform(raw.filter(F.col("transaction_id") % 2 == 1))
    assert b1.limit(1).count() == 1  # the second batch must really add rows
    spec_path = str(tmp_path / "spec")

    merge_spec_batch(spark, b0, 0, spec_path)
    once = sorted(map(tuple, spec_mart_view(spark, spec_path).collect()))
    merge_spec_batch(spark, b0, 0, spec_path)  # replay: must not double-add
    replayed = sorted(map(tuple, spec_mart_view(spark, spec_path).collect()))
    assert replayed == once

    merge_spec_batch(spark, b1, 1, spec_path)
    both = sorted(map(tuple, spec_mart_view(spark, spec_path).collect()))
    assert both != once
    merge_spec_batch(spark, b1, 1, spec_path)  # replay of the later batch
    assert sorted(map(tuple, spec_mart_view(spark, spec_path).collect())) == both

    # a batch BELOW the stored id is not a replay (replays re-run only
    # the most recent batch) — it means the checkpoint no longer matches
    # the mart, which an additive store cannot resolve either way
    with pytest.raises(ValueError, match="no longer matches the mart"):
        merge_spec_batch(spark, b0, 0, spec_path)
    assert sorted(map(tuple, spec_mart_view(spark, spec_path).collect())) == both


def test_merge_spec_batch_legacy_mart_without_marker(spark, tmp_path):
    """A mart written before the __batch_id marker existed merges through
    once unguarded and gains the marker on its first post-upgrade batch."""
    from bigdatapipelne_spark.plans.medallion import (
        SPEC_DIMS,
        merge_spec_batch,
        spec_mart_view,
        stage_transform,
    )

    raw = card_raw_from_events(load_table(spark, SF_SMALL, "events"))
    b0 = stage_transform(raw.filter(F.col("transaction_id") % 2 == 0))
    b1 = stage_transform(raw.filter(F.col("transaction_id") % 2 == 1))
    spec_path = str(tmp_path / "spec")

    # legacy layout: groups + sum only, no marker column
    legacy = b0.groupBy(*SPEC_DIMS).agg(
        F.sum(F.col("valor").cast("decimal(18,2)"))
        .cast("decimal(38,2)")
        .alias("sum_valor_dec")
    )
    legacy.write.parquet(spec_path)
    before = sorted(map(tuple, spec_mart_view(spark, spec_path).collect()))

    merge_spec_batch(spark, b1, 7, spec_path)
    after = sorted(map(tuple, spec_mart_view(spark, spec_path).collect()))
    assert after != before
    stored = spark.read.parquet(spec_path)
    assert "__batch_id" in stored.columns
    assert stored.agg(F.max("__batch_id")).first()[0] == 7
    # and the marker now guards: replaying batch 7 is a no-op
    merge_spec_batch(spark, b1, 7, spec_path)
    assert sorted(map(tuple, spec_mart_view(spark, spec_path).collect())) == after


def test_merge_spec_batch_same_id_different_content_raises(spark, tmp_path):
    """The == batch-id case alone is ambiguous when the stored id is 0 (a
    reset checkpoint's first delivery is also batch 0): the stored content
    signature disambiguates — an identical batch is a replay (no-op), a
    different batch under the same id is a checkpoint/mart mismatch and
    must raise, never silently skip or double-add."""
    from bigdatapipelne_spark.plans.medallion import (
        merge_spec_batch,
        spec_mart_view,
        stage_transform,
    )

    raw = card_raw_from_events(load_table(spark, SF_SMALL, "events"))
    b0 = stage_transform(raw.filter(F.col("transaction_id") % 2 == 0))
    other = stage_transform(raw)  # a reset stream's batch 0: MORE data
    spec_path = str(tmp_path / "spec")

    merge_spec_batch(spark, b0, 0, spec_path)
    once = sorted(map(tuple, spec_mart_view(spark, spec_path).collect()))
    merge_spec_batch(spark, b0, 0, spec_path)  # true replay: no-op
    assert sorted(map(tuple, spec_mart_view(spark, spec_path).collect())) == once
    with pytest.raises(ValueError, match="content signature"):
        merge_spec_batch(spark, other, 0, spec_path)
    assert sorted(map(tuple, spec_mart_view(spark, spec_path).collect())) == once


def test_merge_spec_batch_accepts_legacy_signature_formats(spark, tmp_path):
    """Signature-format migration (round-13 advisor): a mart whose stored
    __batch_sig predates the versioned "v2:" struct format — either the
    unprefixed struct md5 or the older concat_ws("|") line md5 — must
    keep replay-skip semantics on a genuine same-id replay (no rebuild
    on upgrade), while a same-id DIFFERENT-content batch still raises."""
    import shutil

    from bigdatapipelne_spark.plans.medallion import (
        merge_spec_batch,
        spec_mart_view,
        stage_transform,
    )

    raw = card_raw_from_events(load_table(spark, SF_SMALL, "events"))
    b0 = stage_transform(raw.filter(F.col("transaction_id") % 2 == 0))
    other = stage_transform(raw)
    spec_path = str(tmp_path / "spec")
    merge_spec_batch(spark, b0, 0, spec_path)
    once = sorted(map(tuple, spec_mart_view(spark, spec_path).collect()))

    part = b0.groupBy(*SPEC_DIMS).agg(
        F.sum(F.col("valor").cast("decimal(18,2)")).alias("sum_valor_dec")
    )
    v1_sig = part.agg(
        F.md5(
            F.to_json(
                F.sort_array(
                    F.collect_list(
                        F.concat_ws(
                            "|", *SPEC_DIMS, F.col("sum_valor_dec").cast("string")
                        )
                    )
                )
            )
        )
    ).first()[0]
    stored_v2 = (
        spark.read.parquet(spec_path).agg(F.max("__batch_sig")).first()[0]
    )
    assert stored_v2.startswith("v2:")

    def rewrite_sig(legacy_sig):
        df = spark.read.parquet(spec_path).withColumn(
            "__batch_sig", F.lit(legacy_sig)
        )
        tmp = str(tmp_path / "rewrite")
        df.write.mode("overwrite").parquet(tmp)
        shutil.rmtree(spec_path)
        shutil.move(tmp, spec_path)

    for legacy in (stored_v2.removeprefix("v2:"), v1_sig):
        rewrite_sig(legacy)
        merge_spec_batch(spark, b0, 0, spec_path)  # replay: must no-op
        assert (
            sorted(map(tuple, spec_mart_view(spark, spec_path).collect()))
            == once
        )
        # the no-op path leaves the legacy sig in place: different
        # content under the same id still raises against it
        with pytest.raises(ValueError, match="content signature"):
            merge_spec_batch(spark, other, 0, spec_path)
