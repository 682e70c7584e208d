"""Unit tests for the batch operator library paths not covered by the
oracle sweep: flatten on deep/array structs, group_agg string dispatch,
upsert last-writer-wins, live_view TTL filter, apply_mapping casts."""

from __future__ import annotations

import pytest

from pyspark.sql import Row
from pyspark.sql import functions as F

from bigdatapipelne_spark.operators.aggregate import exact_sum, group_agg
from bigdatapipelne_spark.operators.project import (
    apply_mapping,
    drop_fields,
    flatten_structs,
)
from bigdatapipelne_spark.operators.serving import live_view, upsert_batch
from bigdatapipelne_spark.sources.testdata import load_table

from .conftest import SF_SMALL


def test_apply_mapping_rename_cast_nested(spark):
    df = spark.createDataFrame(
        [Row(a="1.5", loc=Row(lat="-23.5", city="sp"))]
    )
    out = apply_mapping(
        df,
        [("a", "valor", "double"), ("loc.lat", "latitude", "double"),
         ("loc.city", "cidade", "")],
    )
    row = out.first()
    assert out.columns == ["valor", "latitude", "cidade"]
    assert row.valor == 1.5 and row.latitude == -23.5 and row.cidade == "sp"


def test_flatten_structs_deep(spark):
    df = spark.createDataFrame(
        [Row(id=1, a=Row(b=Row(c=7, d="x"), e=2.0), tags=["t1", "t2"])]
    )
    flat = flatten_structs(df)
    assert sorted(flat.columns) == ["a_b_c", "a_b_d", "a_e", "id", "tags"]
    r = flat.first()
    assert r.a_b_c == 7 and r.a_b_d == "x" and r.a_e == 2.0
    assert r.tags == ["t1", "t2"]  # arrays left opaque by default


def test_flatten_structs_explode_arrays(spark):
    df = spark.createDataFrame([Row(id=1, tags=["t1", "t2"])])
    flat = flatten_structs(df, explode_arrays=True)
    assert flat.count() == 2


def test_group_agg_string_dispatch_and_empty_groups(spark):
    df = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), ("b", 10.0)], "k string, v double"
    )
    grouped = group_agg(df, ["k"], [("v", "sum"), ("v", "max")], aliases=["s", "m"])
    rows = {r.k: (r.s, r.m) for r in grouped.collect()}
    assert rows == {"a": (3.0, 2.0), "b": (10.0, 10.0)}

    # groups == [] -> global aggregate (the reference's fallback branch).
    glob = group_agg(df, [], [("v", "sum")], aliases=["s"]).first()
    assert glob.s == 13.0

    # Column-valued aggs (engine determinism helpers) compose with pairs.
    mixed = group_agg(df, ["k"], [exact_sum("v", "es"), ("v", "count")]).collect()
    assert {r.k: r.es for r in mixed} == {"a": 3.0, "b": 10.0}


def test_drop_fields_tolerates_missing(spark):
    df = spark.createDataFrame([(1, "x")], "a long, b string")
    out = drop_fields(df, "b", "not_there")
    assert out.columns == ["a"]


def test_upsert_batch_last_writer_wins(spark):
    serving = spark.createDataFrame(
        [(1, "t1", 100.0), (2, "t2", 200.0)], "k long, id string, v double"
    )
    updates = spark.createDataFrame(
        [(2, "t2", 999.0), (3, "t3", 300.0)], "k long, id string, v double"
    )
    merged = {(r.k, r.id): r.v for r in
              upsert_batch(serving, updates, ["k", "id"]).collect()}
    assert merged == {(1, "t1"): 100.0, (2, "t2"): 999.0, (3, "t3"): 300.0}


def test_live_view_ttl_filter(spark):
    df = spark.createDataFrame([(1, 100), (2, 200), (3, 300)], "id long, ttl long")
    alive = live_view(df, now_epoch=F.lit(150))
    assert {r.id for r in alive.collect()} == {2, 3}


def test_compact_parquet_shrinks_files(spark, tmp_path):
    import glob

    from bigdatapipelne_spark.sources.io import compact_parquet

    path = str(tmp_path / "frag")
    # 20 single-row files, the streaming-sink accretion pattern.
    for i in range(20):
        spark.range(i, i + 1).coalesce(1).write.mode("append").parquet(path)
    assert len(glob.glob(f"{path}/*.parquet")) == 20

    n = compact_parquet(spark, path, target_file_bytes=1 << 30)
    assert n == 1
    assert len(glob.glob(f"{path}/*.parquet")) == 1
    assert sorted(r.id for r in spark.read.parquet(path).collect()) == list(range(20))


def test_expire_serving_reclaims_rows(spark, tmp_path):
    from bigdatapipelne_spark.operators.serving import expire_serving, live_view
    from pyspark.sql import functions as F

    path = str(tmp_path / "serving")
    spark.createDataFrame(
        [(1, 100), (2, 200), (3, 300)], "k long, ttl long"
    ).write.parquet(path)

    # Read-side filter and storage reclaim agree on what is live at t=150.
    live = live_view(spark.read.parquet(path), now_epoch=F.lit(150))
    assert sorted(r.k for r in live.collect()) == [2, 3]
    assert expire_serving(spark, path, now_epoch=150) == 1
    assert sorted(r.k for r in spark.read.parquet(path).collect()) == [2, 3]
    assert expire_serving(spark, path, now_epoch=150) == 0  # idempotent


def test_expire_serving_versioned_is_reader_atomic(spark, tmp_path):
    """TTL expiry over a versioned-store root (sources/store.py): a reader
    concurrent with the sweep sees the pre- or post-expiry snapshot, never
    a missing path — DynamoDB's TTL sweeper never blocks reads
    (lambda_app/consumer/function.py:12). The pre-expiry snapshot stays
    readable (gc keep=2) until GC passes it."""
    import threading

    from bigdatapipelne_spark.operators.serving import expire_serving, live_view
    from bigdatapipelne_spark.sources.store import (
        commit_version,
        current_version,
        read_current,
    )
    from pyspark.sql import functions as F

    root = str(tmp_path / "serving_store")
    df = spark.createDataFrame([(1, 100), (2, 200), (3, 300)], "k long, ttl long")
    commit_version(df, root)

    # Pin a snapshot BEFORE the sweep — must stay valid after it.
    before = read_current(spark, root)
    assert sorted(r.k for r in live_view(before, now_epoch=F.lit(150)).collect()) == [2, 3]

    # Concurrent-reader certificate: poll the manifest while the sweep
    # runs — every resolution must land on an existing version directory.
    stop = threading.Event()
    failures: list[str] = []

    def reader() -> None:
        import os

        while not stop.is_set():
            cur = current_version(root)
            if cur is None or not os.path.isdir(os.path.join(root, cur)):
                failures.append(f"unreadable store state: {cur!r}")

    poller = threading.Thread(target=reader)
    poller.start()
    try:
        assert expire_serving(spark, root, now_epoch=150) == 1
    finally:
        stop.set()
        poller.join()
    assert not failures

    # New readers see the swept snapshot; the pinned pre-sweep snapshot
    # still collects (its version dir survives gc keep=2).
    assert sorted(r.k for r in read_current(spark, root).collect()) == [2, 3]
    assert sorted(r.k for r in before.collect()) == [1, 2, 3]
    assert expire_serving(spark, root, now_epoch=150) == 0  # idempotent, no commit
    assert current_version(root) == "v_00000002"


def test_partitioned_write_prunes_partitions(spark, tmp_path):
    """Partition pruning: a filter on the partition column reaches the scan
    as a PartitionFilter, so only that directory is read."""
    from bigdatapipelne_spark.sources.io import write_parquet_partitioned

    df = spark.createDataFrame(
        [("SP", 1.0), ("RJ", 2.0), ("MG", 3.0), ("SP", 4.0)],
        "estado string, valor double",
    )
    path = str(tmp_path / "byestado")
    write_parquet_partitioned(df, path, ["estado"])

    q = spark.read.parquet(path).filter("estado = 'SP'")
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(estado" in plan
    assert q.count() == 2


def test_orc_roundtrip_with_partition_pruning(spark, tmp_path):
    """ORC sink/scan twin of the parquet path: values survive the
    round-trip exactly and a partition-column filter prunes at the scan."""
    from bigdatapipelne_spark.sources.io import read_orc, write_orc_partitioned

    df = spark.createDataFrame(
        [("SP", 1.5, "a"), ("RJ", 2.25, "b"), ("SP", 4.75, "c")],
        "estado string, valor double, tag string",
    )
    path = str(tmp_path / "orc_byestado")
    write_orc_partitioned(df, path, ["estado"])

    back = read_orc(spark, path)
    assert {tuple(r) for r in back.select("estado", "valor", "tag").collect()} == {
        ("SP", 1.5, "a"), ("RJ", 2.25, "b"), ("SP", 4.75, "c")
    }
    q = back.filter("estado = 'SP'")
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(estado" in plan
    assert q.count() == 2


def test_zorder_layout_narrows_minmax_on_both_columns(spark, tmp_path):
    """Z-order layout: every output file's (min, max) envelope must be
    narrow on BOTH z-ordered columns, so row-group skipping works for
    predicates on either — the property a single-key sort cannot give the
    second column."""
    import pyarrow.parquet as pq

    from bigdatapipelne_spark.sources.io import (
        write_parquet_sorted,
        write_parquet_zorder,
    )
    from bigdatapipelne_spark.sources.testdata import load_table

    ev = load_table(spark, SF_SMALL, "events").select("user_id", "value")
    lo_u, hi_u = 0, 99  # user_id range in testdata
    lo_v, hi_v = [r[0] for r in ev.agg({"value": "min"}).collect()], None

    def coverage(path, col, lo, hi):
        import glob as _glob

        widths = []
        for f in _glob.glob(f"{path}/*.parquet"):
            md = pq.read_metadata(f)
            idx = md.schema.names.index(col)
            stats = [md.row_group(i).column(idx).statistics
                     for i in range(md.num_row_groups)]
            mn = min(s.min for s in stats)
            mx = max(s.max for s in stats)
            widths.append((mx - mn) / (hi - lo))
        return sum(widths) / len(widths), len(widths)

    zpath = str(tmp_path / "zorder")
    write_parquet_zorder(ev, zpath, ["user_id", "value"], bits=4, n_files=16)
    spath = str(tmp_path / "sorted")
    write_parquet_sorted(ev, spath, ["user_id"], n_files=16)

    vmin = ev.agg({"value": "min"}).collect()[0][0]
    vmax = ev.agg({"value": "max"}).collect()[0][0]

    zu, nz = coverage(zpath, "user_id", lo_u, hi_u)
    zv, _ = coverage(zpath, "value", vmin, vmax)
    su, _ = coverage(spath, "user_id", lo_u, hi_u)
    sv, _ = coverage(spath, "value", vmin, vmax)

    assert nz > 1
    # single-key sort: first column tight, second column wide (~0.70 here —
    # each file still spans most of the value range)
    assert su < 0.1 and sv > 0.5
    # z-order: BOTH columns substantially narrowed (measured ~0.05 / ~0.22),
    # and the second column strictly better than the sorted layout's
    assert zu < 0.3 and zv < 0.4, (zu, zv)
    assert zv < sv

    # and the layout is a pure permutation: same multiset of rows
    back = spark.read.parquet(zpath)
    assert back.count() == ev.count()
    assert back.subtract(ev).count() == 0 and ev.subtract(back).count() == 0


def test_stage_schema_evolution_merge(spark, tmp_path):
    """Schema evolution: a new column appearing in later loads is readable
    across old+new files with mergeSchema (old rows null)."""
    path = str(tmp_path / "stage")
    spark.createDataFrame([(1, 10.0)], "id long, valor double").write.mode(
        "append"
    ).parquet(path)
    spark.createDataFrame(
        [(2, 20.0, "gold")], "id long, valor double, tier string"
    ).write.mode("append").parquet(path)

    merged = spark.read.option("mergeSchema", "true").parquet(path)
    assert set(merged.columns) == {"id", "valor", "tier"}
    rows = {r.id: r.tier for r in merged.collect()}
    assert rows == {1: None, 2: "gold"}


def test_approx_percentile_rank_error_bounded(spark):
    """The GK sketch at accuracy 10000 must land within 1% rank error of
    the exact percentiles (its contract), checked per return flag — both
    directly (bisect against the sorted values) and through the gated
    query's in-plan certificate booleans."""
    from bigdatapipelne_spark.queries import QUERIES

    # the gated query certifies the same bound in-plan
    for row in QUERIES["value_percentiles_approx"](spark, SF_SMALL).collect():
        assert row["p50_ok"] and row["p90_ok"] and row["p99_ok"], row

    li = load_table(spark, SF_SMALL, "lineitem")
    approx = {
        r["l_returnflag"]: r
        for r in li.groupBy("l_returnflag")
        .agg(
            F.expr(
                "approx_percentile(l_extendedprice, array(0.5, 0.9, 0.99), 10000)"
            ).alias("p")
        )
        .collect()
    }
    for flag, row in approx.items():
        vals = sorted(
            v[0]
            for v in li.filter(F.col("l_returnflag") == flag)
            .select("l_extendedprice")
            .collect()
        )
        n = len(vals)
        for got, q in zip(row["p"], (0.5, 0.9, 0.99)):
            import bisect

            lo = bisect.bisect_left(vals, got)
            hi = bisect.bisect_right(vals, got)
            target = q * n
            # rank of the returned value must be within 1% of target rank
            assert lo - 0.01 * n <= target <= hi + 0.01 * n, (flag, q, got)


# ---------------------------------------------------------------------------
# SCD Type 2 (operators/scd.py)
# ---------------------------------------------------------------------------

def _scd2_rows(out):
    return sorted(
        (r.user_id, r.version, r.plan,
         r.effective_from, r.effective_to, r.is_current)
        for r in out.collect()
    )


def test_scd2_snapshot_collapses_noops_and_versions(spark):
    from bigdatapipelne_spark.operators.scd import scd2_snapshot

    feed = spark.createDataFrame(
        [  # user 1: plan 1 -> restated 1 (no-op) -> 2 -> 1 again
            (1, 10, 100, 1), (1, 20, 101, 1), (1, 30, 102, 2), (1, 40, 103, 1),
            # user 2: single record
            (2, 15, 200, 9),
        ],
        "user_id int, ts int, event_id int, plan int",
    )
    out = scd2_snapshot(
        feed, keys=["user_id"], ts_col="ts", attrs=["plan"],
        tiebreak=["event_id"],
    )
    assert _scd2_rows(out) == [
        (1, 1, 1, 10, 30, False),   # no-op at ts=20 absorbed
        (1, 2, 2, 30, 40, False),
        (1, 3, 1, 40, None, True),  # change BACK to 1 is a new version
        (2, 1, 9, 15, None, True),
    ]


def test_scd2_snapshot_null_attr_transitions(spark):
    from bigdatapipelne_spark.operators.scd import scd2_snapshot

    feed = spark.createDataFrame(
        [(1, 10, 100, None), (1, 20, 101, None), (1, 30, 102, 5)],
        "user_id int, ts int, event_id int, plan int",
    )
    out = scd2_snapshot(
        feed, keys=["user_id"], ts_col="ts", attrs=["plan"],
        tiebreak=["event_id"],
    )
    # null==null is a no-op (null-safe compare); null->5 is a change
    assert _scd2_rows(out) == [
        (1, 1, None, 10, 30, False),
        (1, 2, 5, 30, None, True),
    ]


def test_scd2_merge_untouched_keys_pass_through_and_splice(spark):
    from bigdatapipelne_spark.operators.scd import scd2_merge, scd2_snapshot

    base = spark.createDataFrame(
        [(1, 10, 100, 1), (1, 30, 102, 2), (2, 15, 200, 9)],
        "user_id int, ts int, event_id int, plan int",
    )
    dim = scd2_snapshot(
        base, keys=["user_id"], ts_col="ts", attrs=["plan"],
        tiebreak=["event_id"],
    )
    # late correction splices BETWEEN user 1's existing versions
    batch = spark.createDataFrame(
        [(1, 20, 300, 3)], "user_id int, ts int, event_id int, plan int"
    )
    merged = scd2_merge(
        dim, batch, keys=["user_id"], ts_col="ts", attrs=["plan"],
        tiebreak=["event_id"],
    )
    full = scd2_snapshot(
        base.unionByName(batch), keys=["user_id"], ts_col="ts",
        attrs=["plan"], tiebreak=["event_id"],
    )
    assert _scd2_rows(merged) == _scd2_rows(full)
    # untouched key 2 still has its single current row
    assert [r for r in _scd2_rows(merged) if r[0] == 2] == [
        (2, 1, 9, 15, None, True)
    ]


def test_scd2_merge_replay_idempotent(spark):
    """Round-12 foreachBatch replay audit: scd2_stream_to_dim re-merges
    the SAME batch when foreachBatch replays it (at-least-once), and the
    merge must be naturally idempotent — the replayed rows are exact
    (key, ts, attrs, tiebreak) duplicates of existing version starts, so
    the snapshot's null-safe no-op collapse absorbs them. merge(merge(D,
    B), B) == merge(D, B), row for row."""
    from bigdatapipelne_spark.operators.scd import scd2_merge, scd2_snapshot

    base = spark.createDataFrame(
        [(1, 10, 100, 1), (1, 30, 102, 2), (2, 15, 200, 9)],
        "user_id int, ts int, event_id int, plan int",
    )
    dim = scd2_snapshot(
        base, keys=["user_id"], ts_col="ts", attrs=["plan"],
        tiebreak=["event_id"],
    )
    batch = spark.createDataFrame(
        [(1, 40, 300, 3), (3, 5, 400, 7)],
        "user_id int, ts int, event_id int, plan int",
    )

    def merge(d, b):
        return scd2_merge(
            d, b, keys=["user_id"], ts_col="ts", attrs=["plan"],
            tiebreak=["event_id"],
        )

    once = merge(dim, batch)
    replayed = merge(once, batch)
    assert _scd2_rows(replayed) == _scd2_rows(once)


# ---------------------------------------------------------------------------
# Data-quality expectations (operators/quality.py)
# ---------------------------------------------------------------------------

def test_check_expectations_all_kinds(spark):
    from bigdatapipelne_spark.operators import quality as Q

    df = spark.createDataFrame(
        [
            (1, "A", 10.0, "ok@x.io", 100),
            (1, "A", -5.0, "bad", 100),    # dup key, range viol, regex viol
            (None, "Z", 20.0, None, 999),  # null id, bad value, orphan ref
        ],
        "id int, flag string, qty double, email string, ref int",
    )
    ref = spark.createDataFrame([(100,)], "k int")
    out = {
        r.expectation: (r.violations, r.total, r.passed)
        for r in Q.check_expectations(
            df,
            [
                Q.not_null("id"),
                Q.accepted_values("flag", ["A", "B"]),
                Q.in_range("qty", 0, 100),
                Q.matches_regex("email", r"^[^@]+@[^@]+$"),
                Q.satisfies("qty", "qty > 0"),
                Q.unique(["id"]),
                Q.referential("ref", ref, "k"),
            ],
        ).collect()
    }
    assert out["not_null:id"] == (1, 3, False)
    assert out["accepted_values:flag"] == (1, 3, False)
    assert out["in_range:qty"] == (1, 3, False)
    # NULL email is not a regex violation (pair with not_null to require it)
    assert out["matches_regex:email"] == (1, 3, False)
    assert out["satisfies:qty"] == (1, 3, False)
    # both rows of the duplicated key count as violations
    assert out["unique:id"] == (2, 3, False)
    assert out["referential:ref"] == (1, 3, False)


def test_check_expectations_clean_table_passes(spark):
    from bigdatapipelne_spark.operators import quality as Q

    df = spark.createDataFrame([(1, "A"), (2, "B")], "id int, flag string")
    rows = Q.check_expectations(
        df, [Q.not_null("id"), Q.unique(["id"]),
             Q.accepted_values("flag", ["A", "B"])]
    ).collect()
    assert all(r.passed and r.violations == 0 for r in rows)
    assert all(r.total == 2 for r in rows)


def test_sample_k_per_group_two_stage_equals_naive(spark):
    from bigdatapipelne_spark.operators.sampling import sample_k_per_group

    df = load_table(spark, SF_SMALL, "documents").select(
        "doc_id", "lang", "source"
    )
    salted = sample_k_per_group(df, ["lang"], "doc_id", k=7, salts=16)
    naive = sample_k_per_group(df, ["lang"], "doc_id", k=7, salts=1)
    assert sorted(map(tuple, salted.collect())) == sorted(
        map(tuple, naive.collect())
    )
    # exact count per group (unless the group is smaller than k)
    sizes = {r.lang: r.n for r in df.groupBy("lang").count()
             .withColumnRenamed("count", "n").collect()}
    got = {r.lang: r.n for r in salted.groupBy("lang").count()
           .withColumnRenamed("count", "n").collect()}
    for lang, n in got.items():
        assert n == min(7, sizes[lang])
    # deterministic across runs, redraws under a different seed
    again = sample_k_per_group(df, ["lang"], "doc_id", k=7, salts=16)
    assert sorted(map(tuple, again.collect())) == sorted(
        map(tuple, salted.collect())
    )
    other = sample_k_per_group(df, ["lang"], "doc_id", k=7, seed="B")
    assert sorted(map(tuple, other.collect())) != sorted(
        map(tuple, salted.collect())
    )


# ---------------------------------------------------------------------------
# MERGE INTO (operators/merge.py)
# ---------------------------------------------------------------------------

def test_merge_into_branches(spark):
    from bigdatapipelne_spark.operators.merge import merge_into

    target = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        "id int, name string, bal double",
    )
    source = spark.createDataFrame(
        [(1, 5.0, False), (2, 0.0, True), (9, 99.0, False)],
        "id int, delta double, kill boolean",
    )
    out = merge_into(
        target, source, on=["id"],
        matched_update={"bal": F.col("t.bal") + F.col("s.delta")},
        matched_delete=F.col("s.kill"),
        not_matched_insert={
            "id": F.col("s.id"), "name": F.lit("ins"),
            "bal": F.col("s.delta"),
        },
    )
    rows = {r.id: (r.name, r.bal) for r in out.collect()}
    assert rows == {
        1: ("a", 15.0),    # matched update
        3: ("c", 30.0),    # target-only pass-through
        9: ("ins", 99.0),  # source-only insert
    }                      # id 2 deleted


def test_merge_into_insert_disabled_and_schema(spark):
    from bigdatapipelne_spark.operators.merge import merge_into

    target = spark.createDataFrame([(1, 10.0)], "id int, bal double")
    source = spark.createDataFrame([(9, 1.0)], "id int, delta double")
    out = merge_into(target, source, on=["id"], not_matched_insert=None)
    assert out.columns == target.columns
    assert out.schema == target.schema
    assert [tuple(r) for r in out.collect()] == [(1, 10.0)]


def test_merge_into_duplicate_source_keys_raise(spark):
    import pytest
    from pyspark.errors.exceptions.captured import SparkRuntimeException
    from bigdatapipelne_spark.operators.merge import merge_into

    target = spark.createDataFrame([(1, 10.0)], "id int, bal double")
    dup = spark.createDataFrame(
        [(1, 1.0), (1, 2.0)], "id int, delta double"
    )
    merged = merge_into(
        target, dup, on=["id"],
        matched_update={"bal": F.col("s.delta")},
    )
    with pytest.raises(Exception, match="duplicate source key"):
        merged.collect()
    # opting out accepts the duplicates (last-writer unspecified -> both rows join)
    relaxed = merge_into(
        target, dup, on=["id"],
        matched_update={"bal": F.col("s.delta")}, strict_keys=False,
    )
    assert relaxed.count() == 2


# ---------------------------------------------------------------------------
# Versioned snapshot store (sources/store.py)
# ---------------------------------------------------------------------------

def test_versioned_store_snapshot_isolation(spark, tmp_path):
    import os
    from bigdatapipelne_spark.sources import store

    root = str(tmp_path / "vstore")
    v1 = store.commit_version(
        spark.createDataFrame([(1, "a")], "id int, x string"), root
    )
    reader_v1 = store.read_current(spark, root)   # resolves manifest NOW
    v2 = store.commit_version(
        spark.createDataFrame([(2, "b")], "id int, x string"), root
    )
    # the v1 snapshot still reads its original files after the v2 commit
    assert [tuple(r) for r in reader_v1.collect()] == [(1, "a")]
    assert [tuple(r) for r in store.read_current(spark, root).collect()] == [
        (2, "b")
    ]
    # manifest never absent across commits
    assert store.current_version(root) == os.path.basename(v2)
    assert os.path.exists(os.path.join(root, "MANIFEST"))

    store.commit_version(
        spark.createDataFrame([(3, "c")], "id int, x string"), root
    )
    deleted = store.gc_versions(root, keep=2)
    assert deleted == [os.path.basename(v1)]
    # current still readable after GC
    assert store.read_current(spark, root).count() == 1


def test_versioned_store_read_version_time_travel(spark, tmp_path):
    import pytest
    from bigdatapipelne_spark.sources import store

    root = str(tmp_path / "vstore")
    store.commit_version(spark.createDataFrame([(1,)], "id int"), root)
    store.commit_version(spark.createDataFrame([(2,)], "id int"), root)
    # pinned-version read bypasses the manifest
    assert [tuple(r) for r in
            store.read_version(spark, root, "v_00000001").collect()] == [(1,)]
    assert store.read_current(spark, root).collect()[0][0] == 2
    with pytest.raises(FileNotFoundError, match="v_00000009"):
        store.read_version(spark, root, "v_00000009")
    # GC reclaims the old version; the pinned read then fails fast
    store.gc_versions(root, keep=1)
    with pytest.raises(FileNotFoundError):
        store.read_version(spark, root, "v_00000001")


def test_versioned_store_crash_orphan_invisible_and_gcd(spark, tmp_path):
    import os
    from bigdatapipelne_spark.sources import store

    root = str(tmp_path / "vstore")
    store.commit_version(spark.createDataFrame([(1,)], "id int"), root)
    cur = store.current_version(root)
    # simulate a crash AFTER writing v_2 but BEFORE the manifest flip
    spark.createDataFrame([(9,)], "id int").write.parquet(
        os.path.join(root, "v_00000002")
    )
    assert store.current_version(root) == cur          # orphan invisible
    assert store.read_current(spark, root).count() == 1
    store.commit_version(spark.createDataFrame([(2,)], "id int"), root)
    # next commit went PAST the orphan (v_3), orphan reclaimable by gc
    assert store.current_version(root) == "v_00000003"
    deleted = store.gc_versions(root, keep=2)
    assert "v_00000001" in deleted


def test_versioned_store_concurrent_commit_cas(spark, tmp_path):
    """Two writers building on the same parent: exactly one commit wins;
    the loser raises ConcurrentCommitError (its staged version removed)
    instead of silently discarding the winner's version, and succeeds on
    retry against the fresh parent."""
    import os
    import pytest
    from bigdatapipelne_spark.sources import store

    root = str(tmp_path / "vstore")
    base = store.commit_version(spark.createDataFrame([(0,)], "id int"), root)
    parent = store.current_version(root)

    # deterministic interleave: both writers captured `parent`; A lands first
    a = store.commit_version(
        spark.createDataFrame([(1,)], "id int"), root, expected_parent=parent
    )
    with pytest.raises(store.ConcurrentCommitError):
        store.commit_version(
            spark.createDataFrame([(2,)], "id int"), root,
            expected_parent=parent,
        )
    # winner's pointer intact; loser's staged dir cleaned up
    assert store.current_version(root) == os.path.basename(a)
    assert store._versions(root) == [os.path.basename(base), os.path.basename(a)]
    # retry against the fresh parent succeeds
    store.commit_version(spark.createDataFrame([(2,)], "id int"), root)
    assert store.read_current(spark, root).collect()[0][0] == 2


def test_versioned_store_concurrent_commit_threads(spark, tmp_path):
    """The racing form: N threads commit concurrently on the same captured
    parent; exactly one wins per round, losers retry — every row number
    eventually lands, no version is ever silently discarded, and the
    manifest always points at a readable version."""
    import threading
    from bigdatapipelne_spark.sources import store

    root = str(tmp_path / "vstore")
    store.commit_version(spark.createDataFrame([(0,)], "id int"), root)
    barrier = threading.Barrier(4)
    outcomes: dict[int, str] = {}

    def writer(i: int) -> None:
        parent = store.current_version(root)
        barrier.wait()
        df = spark.createDataFrame([(i,)], "id int")
        try:
            store.commit_version(df, root, expected_parent=parent)
            outcomes[i] = "won"
        except store.ConcurrentCommitError:
            while True:  # standard OCC loop: re-read parent, retry
                try:
                    store.commit_version(df, root)
                    break
                except store.ConcurrentCommitError:
                    continue
            outcomes[i] = "retried"

    threads = [threading.Thread(target=writer, args=(i,)) for i in range(1, 5)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert len(outcomes) == 4
    assert "won" in outcomes.values()
    # every surviving version dir is a committed (pointed-at-some-point or
    # retried) commit; the current version reads cleanly
    assert store.read_current(spark, root).count() == 1


def test_versioned_store_commit_with_retry(spark, tmp_path):
    """The packaged OCC loop: a blind append retries past a conflicting
    commit; a read-modify-write callable is rebuilt against the FRESH
    parent each attempt; the bound re-raises after max_retries."""
    import pytest
    from bigdatapipelne_spark.sources import store

    root = str(tmp_path / "vstore")
    store.commit_version(spark.createDataFrame([(0,)], "id int"), root)

    # read-modify-write via callable: append one row to the current
    # snapshot; a rival commit lands between attempt 1's read and its CAS
    state = {"rival_done": False}

    def build(parent):
        if not state["rival_done"]:
            state["rival_done"] = True
            store.commit_version(
                spark.createDataFrame([(100,)], "id int"), root
            )  # moves the manifest -> attempt 1's CAS must lose
        cur = store.read_current(spark, root)
        return cur.unionByName(spark.createDataFrame([(1,)], "id int"))

    store.commit_with_retry(build, root, max_retries=3)
    # attempt 2 rebuilt on the rival's snapshot: both rows present
    assert sorted(
        r.id for r in store.read_current(spark, root).collect()
    ) == [1, 100]

    # exhaustion: a callable that always moves the manifest first never
    # commits; the bounded loop re-raises instead of spinning
    def always_lose(parent):
        store.commit_version(spark.createDataFrame([(9,)], "id int"), root)
        return spark.createDataFrame([(2,)], "id int")

    with pytest.raises(store.ConcurrentCommitError):
        store.commit_with_retry(always_lose, root, max_retries=2)

    # blind DataFrame form still commits (no conflict)
    store.commit_with_retry(spark.createDataFrame([(3,)], "id int"), root)
    assert [r.id for r in store.read_current(spark, root).collect()] == [3]

    # a callable returning None aborts: nothing committed, None returned
    before = store.current_version(root)
    assert store.commit_with_retry(lambda parent: None, root) is None
    assert store.current_version(root) == before


def test_versioned_store_gc_reclaims_dead_stage_only(spark, tmp_path):
    """gc_versions removes a crash-orphaned .stage_* dir (its writer's
    flock is acquirable) but never a stage whose writer still holds the
    lock; committed versions are untouched either way."""
    import fcntl
    import os
    from bigdatapipelne_spark.sources import store

    root = str(tmp_path / "vstore")
    store.commit_version(spark.createDataFrame([(1,)], "id int"), root)
    store.commit_version(spark.createDataFrame([(2,)], "id int"), root)

    # dead writer: lock file exists, nobody holds it. Backdated past the
    # gc grace window (a FRESH unheld lock must survive gc — the writer
    # may be inside its create->flock gap; asserted below with `young`).
    import time

    dead = os.path.join(root, ".stage_dead")
    os.mkdir(dead)
    dead_lock = os.path.join(dead, store._STAGE_LOCK)
    open(dead_lock, "w").close()
    backdated = time.time() - store._STAGE_GC_GRACE_S - 5
    os.utime(dead_lock, (backdated, backdated))
    # young unheld lock: inside the grace window, must be skipped
    young = os.path.join(root, ".stage_young")
    os.mkdir(young)
    open(os.path.join(young, store._STAGE_LOCK), "w").close()
    # live writer: this test holds the flock on a separate descriptor
    live = os.path.join(root, ".stage_live")
    os.mkdir(live)
    live_fd = os.open(
        os.path.join(live, store._STAGE_LOCK), os.O_CREAT | os.O_RDWR
    )
    fcntl.flock(live_fd, fcntl.LOCK_EX)
    try:
        deleted = store.gc_versions(root, keep=2)
        assert ".stage_dead" in deleted
        assert not os.path.exists(dead)
        assert os.path.exists(live)          # in-flight stage survives gc
        assert os.path.exists(young)         # create->flock window survives gc
        assert store._versions(root) == ["v_00000001", "v_00000002"]
        assert store.read_current(spark, root).count() == 1
    finally:
        fcntl.flock(live_fd, fcntl.LOCK_UN)
        os.close(live_fd)


def test_versioned_store_version_numbers_monotone_with_commit_order(
    spark, tmp_path
):
    """A CAS loser must not burn a version number: numbering is allocated
    under the commit lock, so after any loss the next successful commit
    takes exactly max+1 and _versions order == commit order."""
    import os
    import pytest
    from bigdatapipelne_spark.sources import store

    root = str(tmp_path / "vstore")
    store.commit_version(spark.createDataFrame([(0,)], "id int"), root)
    parent = store.current_version(root)
    store.commit_version(
        spark.createDataFrame([(1,)], "id int"), root, expected_parent=parent
    )
    with pytest.raises(store.ConcurrentCommitError):
        store.commit_version(
            spark.createDataFrame([(2,)], "id int"), root,
            expected_parent=parent,
        )
    v = store.commit_version(spark.createDataFrame([(3,)], "id int"), root)
    # loser left no gap and no stale dir: numbering is dense and ordered
    assert store._versions(root) == ["v_00000001", "v_00000002", "v_00000003"]
    assert os.path.basename(v) == "v_00000003"
    assert not [
        d for d in os.listdir(root) if d.startswith(".stage_")
    ], "loser's stage dir must be cleaned up"


def test_mad_outliers_robustness(spark):
    """MAD flags a gross outlier that inflates the mean/stddev z-score;
    a constant group (MAD=0) yields null z and no flags."""
    from bigdatapipelne_spark.operators.profile import mad_outliers

    rows = [("a", float(v)) for v in [10, 11, 9, 10, 12, 10, 11, 9, 10, 1000]]
    rows += [("b", 5.0)] * 6
    df = spark.createDataFrame(rows, "grp string, v double")
    out = mad_outliers(df, "v", ["grp"], threshold=3.5).collect()

    a = [r for r in out if r.grp == "a"]
    flagged = [r for r in a if r.is_outlier]
    assert [r.v for r in flagged] == [1000.0]
    # the robust score of the outlier is enormous; inliers stay small
    assert abs(flagged[0].robust_z) > 100
    assert all(abs(r.robust_z) < 3.5 for r in a if not r.is_outlier)

    b = [r for r in out if r.grp == "b"]
    assert all(r.robust_z is None and not r.is_outlier for r in b)


def test_csv_roundtrip_with_partition_pruning(spark, tmp_path):
    """CSV sink/scan twin (gzip, header, Hive-partitioned): values survive
    the round-trip with an explicit schema and a partition-column filter
    prunes at the scan, same contract as the parquet/ORC twins."""
    from bigdatapipelne_spark.sources.io import read_csv, write_csv_partitioned

    df = spark.createDataFrame(
        [("SP", 1.5, "a"), ("RJ", 2.25, "b"), ("SP", 4.75, "c")],
        "estado string, valor double, tag string",
    )
    path = str(tmp_path / "csv_byestado")
    write_csv_partitioned(df, path, ["estado"])

    from pyspark.sql.types import (
        DoubleType, StringType, StructField, StructType,
    )
    schema = StructType(
        [
            StructField("valor", DoubleType()),
            StructField("tag", StringType()),
            StructField("estado", StringType()),
        ]
    )
    back = read_csv(spark, path, schema=schema)
    assert {tuple(r) for r in back.select("estado", "valor", "tag").collect()} == {
        ("SP", 1.5, "a"), ("RJ", 2.25, "b"), ("SP", 4.75, "c")
    }
    q = back.filter("estado = 'SP'")
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(estado" in plan
    assert q.count() == 2


def test_eager_checkpoint_storage_level_conf(spark):
    """The memory-pressure knob (operators/checkpoint.py): unset -> the
    engine default (memory+disk deserialized); DISK_ONLY -> blocks never
    enter the storage pool. Assertions resolve THIS frame's backing RDD
    (checkpoint_rdd_id), not whatever else the shared session has cached;
    release_checkpoint must actually free the blocks (DataFrame.unpersist
    is a verified no-op on checkpoint-backed frames)."""
    from bigdatapipelne_spark.operators.checkpoint import (
        CHECKPOINT_LEVEL_CONF,
        checkpoint_rdd_id,
        eager_checkpoint,
        release_checkpoint,
    )

    def level_of(df):
        rid = checkpoint_rdd_id(df)
        assert rid is not None, "frame is not checkpoint-backed"
        jsc = spark.sparkContext._jsc.sc()
        for info in jsc.getRDDStorageInfo():
            if info.id() == rid:
                return info.storageLevel().description()
        return None  # released

    d1 = eager_checkpoint(spark.range(100))
    assert d1.count() == 100
    assert "Memory" in level_of(d1), level_of(d1)

    spark.conf.set(CHECKPOINT_LEVEL_CONF, "DISK_ONLY")
    try:
        d2 = eager_checkpoint(spark.range(100, 200))
        assert d2.count() == 100
        lvl = level_of(d2)
        assert lvl is not None and "Memory" not in lvl, lvl

        with pytest.raises(ValueError, match=CHECKPOINT_LEVEL_CONF):
            spark.conf.set(CHECKPOINT_LEVEL_CONF, "disk_only")  # bad case
            eager_checkpoint(spark.range(5))
    finally:
        spark.conf.unset(CHECKPOINT_LEVEL_CONF)
    release_checkpoint(d1)
    release_checkpoint(d2)
    assert level_of(d1) is None and level_of(d2) is None
