"""Bucketed-table co-located join: both sides bucketed on the join key must
join with no shuffle at all — the plan contains zero Exchange nodes."""

from __future__ import annotations

from bigdatapipelne_spark.sources.io import write_bucketed_table
from bigdatapipelne_spark.sources.testdata import load_table

from .conftest import SF_SMALL


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    orders = load_table(spark, SF_SMALL, "orders").select(
        "o_orderkey", "o_orderdate", "o_totalprice"
    )
    lineitem = load_table(spark, SF_SMALL, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    write_bucketed_table(
        spark, orders, "orders_b", ["o_orderkey"], 8, str(tmp_path / "ob")
    )
    write_bucketed_table(
        spark, lineitem, "lineitem_b", ["l_orderkey"], 8, str(tmp_path / "lb")
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        o = spark.table("orders_b")
        li = spark.table("lineitem_b")
        joined = li.join(o, li.l_orderkey == o.o_orderkey)
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan  # bucket layout replaces the shuffle
        assert "SortMergeJoin" in plan
        # And it is still correct.
        n = joined.count()
        plain = lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey).count()
        assert n == plain
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS orders_b")
        spark.sql("DROP TABLE IF EXISTS lineitem_b")


def test_bucketed_write_warns_when_buckets_cap_parallelism(spark, tmp_path):
    """align_partitions collapses the write to n_buckets tasks; when the
    cluster offers far more slots (>8x), the write must say so loudly —
    n_buckets is the production knob that sizes files AND parallelism
    (round-14 advisor finding). The policy is pure
    (_bucket_parallelism_warning) so the >8x boundary is pinned at a
    simulated production width; the write path is checked silent at the
    local session's healthy config."""
    import warnings

    from bigdatapipelne_spark.sources.io import _bucket_parallelism_warning

    # policy: 512-slot cluster, 32 buckets -> serialized write, warn
    msg = _bucket_parallelism_warning(512, 32, "t")
    assert msg and "raise n_buckets" in msg
    # boundary: exactly 8x stays silent (the cap is >8x, not >=)
    assert _bucket_parallelism_warning(256, 32, "t") is None
    assert _bucket_parallelism_warning(8, 32, "t") is None
    # write path: healthy local config emits nothing
    df = spark.range(100).selectExpr("id AS k", "id * 2 AS v")
    try:
        with warnings.catch_warnings(record=True) as caught:
            warnings.simplefilter("always")
            write_bucketed_table(
                spark, df, "warn_b2", ["k"], 8, str(tmp_path / "wb2")
            )
        assert not [w for w in caught if "raise n_buckets" in str(w.message)]
    finally:
        spark.sql("DROP TABLE IF EXISTS warn_b2")


def test_read_json_with_errors_routes_bad_lines(spark, tmp_path):
    import glob
    import gzip
    import os

    from pyspark.sql.types import LongType, StringType, StructField, StructType

    from bigdatapipelne_spark.sources.io import read_json_with_errors

    src = tmp_path / "in"
    src.mkdir()
    with gzip.open(src / "a.json.gz", "wt") as f:
        f.write('{"id": 1, "v": "x"}\n')
        f.write("THIS IS NOT JSON\n")
        f.write('{"id": 2, "v": "y"}\n')
    schema = StructType([StructField("id", LongType()), StructField("v", StringType())])
    err = str(tmp_path / "error")

    good = read_json_with_errors(spark, str(src), schema, err)
    assert {r.id for r in good.collect()} == {1, 2}

    bad_lines = []
    for p in sorted(set(glob.glob(os.path.join(err, "part-*")))):
        with open(p) as f:
            bad_lines += [ln.strip() for ln in f if ln.strip()]
    assert bad_lines == ["THIS IS NOT JSON"]


def test_sorted_layout_has_disjoint_file_ranges(spark, tmp_path):
    """write_parquet_sorted yields files whose [min, max] ranges on the
    sort key do not overlap — the property parquet min/max row-group
    skipping needs to prune range scans."""
    import glob

    import pyarrow.parquet as pq

    from bigdatapipelne_spark.sources.io import write_parquet_sorted

    li = load_table(spark, SF_SMALL, "lineitem").select(
        "l_orderkey", "l_extendedprice"
    )
    out = str(tmp_path / "sorted")
    write_parquet_sorted(li.repartition(8), out, ["l_orderkey"], n_files=4)

    ranges = []
    for f in glob.glob(out + "/*.parquet"):
        md = pq.ParquetFile(f).metadata
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(0).statistics
            mins.append(st.min)
            maxs.append(st.max)
        ranges.append((min(mins), max(maxs)))
    ranges.sort()
    assert len(ranges) > 1
    for (lo_a, hi_a), (lo_b, _) in zip(ranges, ranges[1:]):
        assert hi_a <= lo_b, f"overlapping file ranges: {ranges}"

    # Round trip preserves the rows.
    assert spark.read.parquet(out).count() == li.count()


def _exchange_count(df) -> int:
    return df._jdf.queryExecution().executedPlan().toString().count("Exchange")


def test_bucketed_fingerprint_index_probe_reads_index_in_place(spark, tmp_path):
    """Round-8 steady-state layout claim: with the standing fingerprint
    index persisted bucketed on __fp, a batch's membership probe must NOT
    re-shuffle the index — only the batch's fingerprints move. Asserted
    comparatively (bucketed plan has strictly fewer exchanges than the
    plain-parquet reload) plus a bucketed-scan marker, with AQE off for a
    fully-determined plan; results equal the inline form exactly."""
    from pyspark.sql import functions as F

    from bigdatapipelne_spark.operators.dedup import (
        build_fingerprint_index,
        incremental_exact_duplicates,
        load_fingerprint_index,
        save_fingerprint_index,
    )

    docs = load_table(spark, SF_SMALL, "documents").select("doc_id", "text")
    corpus = docs.filter(F.col("doc_id") % 3 != 0)
    delta = docs.filter(F.col("doc_id") % 3 == 0)

    ix = build_fingerprint_index(corpus, "doc_id", "text")
    # bucket count == session shuffle partitions so the batch side's
    # existing exchange satisfies the bucketed join directly (in
    # production you size buckets to the index and Spark shuffles each
    # batch to the bucket count)
    nb = int(spark.conf.get("spark.sql.shuffle.partitions"))
    try:
        save_fingerprint_index(ix, "fp_ix_b", str(tmp_path / "fpix"), n_buckets=nb)
        plain_path = str(tmp_path / "fpix_plain")
        ix.write.parquet(plain_path)

        aqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
        bcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        try:
            spark.conf.set("spark.sql.adaptive.enabled", "false")
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
            probe_b = incremental_exact_duplicates(
                delta, None, "doc_id", "text",
                corpus_index=load_fingerprint_index(spark, "fp_ix_b"),
            )
            probe_p = incremental_exact_duplicates(
                delta, None, "doc_id", "text",
                corpus_index=spark.read.parquet(plain_path),
            )
            plan_b = probe_b._jdf.queryExecution().executedPlan().toString()
            assert "SelectedBucketsCount" in plan_b or "Bucketed: true" in plan_b
            assert _exchange_count(probe_b) < _exchange_count(probe_p), (
                "bucketed index probe must drop the index-side exchange"
            )
        finally:
            spark.conf.set("spark.sql.adaptive.enabled", aqe)
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", bcast)

        inline = incremental_exact_duplicates(delta, corpus, "doc_id", "text")
        assert sorted(map(tuple, probe_b.collect())) == sorted(
            map(tuple, inline.collect())
        )
    finally:
        # an assertion failure above must not leak the catalog table into
        # later tests sharing the session's warehouse
        spark.sql("DROP TABLE IF EXISTS fp_ix_b")


def test_bucketed_near_dup_index_probe_reads_index_in_place(spark, tmp_path):
    """Same layout claim for the NearDupIndex: bands bucketed on
    (band, band_key) — the candidate join's FULL key set, so the layout
    serves sort-merge as well as broadcast plans (round-12 finding) —
    and shingles on corpus_id (the verify semi-join + collect_list key).
    The bucketed probe plan has strictly fewer exchanges than the plain
    reload and identical results; additionally, under forced sort-merge
    (AQE off, broadcast off) the structural walk must find NO shuffle
    fed purely by the bucketed index — the exact plan shape whose
    band_key-only regression the fold gate's in-stream audit caught at
    the sf10 rehearsal."""
    from pyspark.sql import functions as F

    from bigdatapipelne_spark.operators.dedup import (
        NearDupIndex,
        build_near_dup_index,
        incremental_near_duplicates,
        load_near_dup_index,
        save_near_dup_index,
    )

    docs = load_table(spark, SF_SMALL, "documents").select("doc_id", "text")
    corpus = docs.filter(F.col("doc_id") % 3 != 0)
    delta = docs.filter(F.col("doc_id") % 3 == 0).unionByName(
        corpus.filter(F.col("doc_id") % 7 == 0).select(
            (F.col("doc_id") + F.lit(1 << 40)).alias("doc_id"),
            F.concat(F.col("text"), F.lit(" drift")).alias("text"),
        )
    )

    ix = build_near_dup_index(corpus, "doc_id", "text")
    nb = int(spark.conf.get("spark.sql.shuffle.partitions"))
    try:
        save_near_dup_index(ix, "nd_ix_b", str(tmp_path / "ndix"), n_buckets=nb)
        for part in ("bands", "shingles", "sizes"):
            getattr(ix, part).write.parquet(str(tmp_path / f"ndix_plain_{part}"))
        plain = NearDupIndex(
            bands=spark.read.parquet(str(tmp_path / "ndix_plain_bands")),
            shingles=spark.read.parquet(str(tmp_path / "ndix_plain_shingles")),
            sizes=spark.read.parquet(str(tmp_path / "ndix_plain_sizes")),
        )

        aqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
        bcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        try:
            spark.conf.set("spark.sql.adaptive.enabled", "false")
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
            probe_b = incremental_near_duplicates(
                delta, None, "doc_id", "text",
                corpus_index=load_near_dup_index(spark, "nd_ix_b"),
            )
            probe_p = incremental_near_duplicates(
                delta, None, "doc_id", "text", corpus_index=plain
            )
            plan_b = probe_b._jdf.queryExecution().executedPlan().toString()
            assert "SelectedBucketsCount" in plan_b or "Bucketed: true" in plan_b
            assert _exchange_count(probe_b) < _exchange_count(probe_p), (
                "bucketed near-dup index probe must drop index-side exchanges"
            )
            # the structural zero-index-shuffle property must hold in the
            # FORCED sort-merge regime too — no shuffle Exchange fed
            # purely by the standing index's scans (the band_key-only
            # bucket layout failed exactly this)
            from bigdatapipelne_spark.streaming.dedup_stream import (
                _index_reshuffled_table,
            )

            hit = _index_reshuffled_table(
                probe_b._jdf.queryExecution().executedPlan(),
                [f"nd_ix_b_{p}" for p in ("bands", "shingles", "sizes")],
            )
            assert hit is None, f"standing index table {hit} re-shuffled"
        finally:
            spark.conf.set("spark.sql.adaptive.enabled", aqe)
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", bcast)

        inline = incremental_near_duplicates(delta, corpus, "doc_id", "text")
        assert sorted(map(tuple, probe_b.collect())) == sorted(
            map(tuple, inline.collect())
        )
    finally:
        # an assertion failure above must not leak the catalog tables into
        # later tests sharing the session's warehouse
        for t in ("nd_ix_b_bands", "nd_ix_b_shingles", "nd_ix_b_sizes"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")
