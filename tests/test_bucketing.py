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
