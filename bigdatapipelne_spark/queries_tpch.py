"""TPC-H-shaped multi-join / subquery queries adapted to the driver's star
schema (no partsupp / commitdate / phone columns — variants are adapted where
the classic query needs one; each docstring states the adaptation).

These widen the analytics surface beyond the reference (SURVEY.md §2.7: the
reference has no joins at all) with the join shapes a real warehouse runs:
nation-pair volume (Q7), market share (Q8), returned items top-k (Q10),
order-count histogram (Q13), promo share (Q14), top supplier (Q15),
small-quantity revenue with a correlated average (Q17), large orders (Q18),
OR-of-ANDs predicate join (Q19), idle high-balance customers anti-join (Q22).

Scale notes (100 TB): no explicit broadcast hints here — every dimension side
is either pre-filtered to a handful of rows (AQE converts the join to
broadcast at runtime) or genuinely fact-sized (sort-merge is the right
answer). All money math follows the engine's determinism rules
(queries.py module docstring): DECIMAL sums surfaced as doubles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from bigdatapipelne_spark.operators.checkpoint import eager_checkpoint

from bigdatapipelne_spark.operators.aggregate import exact_sum as dsum
from bigdatapipelne_spark.queries import (
    OSUM,
    OSUM_RAW,
    _DISC_PRICE,
    _disc_price,
    query,
)
from bigdatapipelne_spark.sources.testdata import load_table as t


@query(
    "q7_nation_volume",
    oracle=f"""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(year(l_shipdate) AS INTEGER) AS l_year,
           {OSUM_RAW(_DISC_PRICE)} AS revenue
    FROM supplier s, lineitem, orders o, customer c, nation n1, nation n2
    WHERE s.s_suppkey = l_suppkey AND o.o_orderkey = l_orderkey
      AND c.c_custkey = o.o_custkey
      AND s.s_nationkey = n1.n_nationkey AND c.c_nationkey = n2.n_nationkey
      AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
      AND l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1998-01-01'
    GROUP BY supp_nation, cust_nation, l_year
    """,
)
def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7: bilateral trade volume between two nations by ship year.
    Supplier and customer are each pre-filtered through their nation join to
    a tiny slice, so AQE broadcasts both onto the fact scan; the only real
    shuffle is orders⋈lineitem, then a 4-row aggregate."""
    n = t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    pair = F.col("n_name").isin("NATION_1", "NATION_2")
    supp = (
        t(spark, sf_dir, "supplier")
        .join(n.filter(pair), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    cust = (
        t(spark, sf_dir, "customer")
        .join(n.filter(pair), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey", F.col("n_name").alias("cust_nation"))
    )
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    return (
        li.join(supp, li.l_suppkey == supp.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(cust, o.o_custkey == cust.c_custkey)
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(F.sum(_disc_price()).cast("double").alias("revenue"))
    )


@query(
    "q8_market_share",
    oracle=f"""
    WITH base AS (
      SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
             {_DISC_PRICE} AS volume,
             n2.n_name AS supp_nation
      FROM part, lineitem, orders o, customer c, supplier s,
           nation n1, nation n2, region
      WHERE p_partkey = l_partkey AND o.o_orderkey = l_orderkey
        AND c.c_custkey = o.o_custkey AND s.s_suppkey = l_suppkey
        AND c.c_nationkey = n1.n_nationkey AND n1.n_regionkey = r_regionkey
        AND s.s_nationkey = n2.n_nationkey
        AND r_name = 'ASIA' AND p_type = 'ECONOMY'
    )
    SELECT o_year,
           CAST(CAST(SUM(CASE WHEN supp_nation = 'NATION_5' THEN volume END)
                AS VARCHAR) AS DOUBLE)
             / CAST(CAST(SUM(volume) AS VARCHAR) AS DOUBLE) AS mkt_share
    FROM base GROUP BY o_year
    """,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 (adapted: p_type = 'ECONOMY', region ASIA, share nation
    NATION_5): national market share within a region by order year. Both
    sums stay exact DECIMAL until one double division per year. Part and
    the region-filtered customer side collapse to small broadcastable
    slices under AQE; null share (years with no NATION_5 volume) is
    identical in both engines."""
    p = t(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY").select("p_partkey")
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    cust = (
        t(spark, sf_dir, "customer")
        .join(n, F.col("c_nationkey") == F.col("n_nationkey"))
        .join(r, F.col("n_regionkey") == F.col("r_regionkey"))
        .select("c_custkey")
    )
    supp = (
        t(spark, sf_dir, "supplier")
        .join(
            n.select(F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")),
            F.col("s_nationkey") == F.col("sn_key"),
        )
        .select("s_suppkey", "supp_nation")
    )
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_orderdate")
    base = (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(cust, o.o_custkey == cust.c_custkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .select(
            F.year("o_orderdate").alias("o_year"),
            _disc_price().alias("volume"),
            "supp_nation",
        )
    )
    return base.groupBy("o_year").agg(
        (
            F.sum(F.when(F.col("supp_nation") == "NATION_5", F.col("volume"))).cast("double")
            / F.sum("volume").cast("double")
        ).alias("mkt_share")
    )


@query(
    "q10_returned_items",
    oracle=f"""
    SELECT c.c_custkey, c.c_name, {OSUM_RAW(_DISC_PRICE)} AS revenue,
           c.c_acctbal, n.n_name
    FROM customer c, orders o, lineitem, nation n
    WHERE c.c_custkey = o.o_custkey AND l_orderkey = o.o_orderkey
      AND o.o_orderdate >= TIMESTAMP '1996-10-01'
      AND o.o_orderdate <  TIMESTAMP '1997-01-01'
      AND l_returnflag = 'R' AND c.c_nationkey = n.n_nationkey
    GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
    ORDER BY revenue DESC, c.c_custkey
    LIMIT 20
    """,
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10: top-20 customers by revenue lost to returns in a quarter.
    Orders is date-pruned before the fact join; the revenue doubles are
    exact (decimal sums) so the top-k cut is deterministic with c_custkey as
    the unique tiebreaker."""
    c = t(spark, sf_dir, "customer")
    n = t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    o = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-10-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(n, c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.sum(_disc_price()).cast("double").alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


@query(
    "q13_custdist",
    oracle="""
    SELECT c_count, COUNT(*) AS custdist
    FROM (
      SELECT c_custkey, COUNT(o_orderkey) AS c_count
      FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey
      GROUP BY c_custkey
    )
    GROUP BY c_count
    """,
)
def q13_custdist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 (without the o_comment filter — the column doesn't exist
    here): distribution of customers by order count. Left outer join keeps
    zero-order customers (c_count = 0); two cascaded aggregations, the
    second over at most ~50 distinct counts."""
    c = t(spark, sf_dir, "customer").select("c_custkey")
    o = t(spark, sf_dir, "orders").select("o_custkey", "o_orderkey")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@query(
    "q14_promo_revenue",
    oracle=f"""
    SELECT 100.0 * CAST(CAST(SUM(CASE WHEN p_type = 'PROMO'
                    THEN {_DISC_PRICE} END) AS VARCHAR) AS DOUBLE)
             / {OSUM_RAW(_DISC_PRICE)} AS promo_revenue
    FROM lineitem, part
    WHERE l_partkey = p_partkey
      AND l_shipdate >= TIMESTAMP '1996-03-01'
      AND l_shipdate <  TIMESTAMP '1996-04-01'
    """,
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 (adapted: p_type = 'PROMO' exactly, the schema's types are
    single words): promo share of one month's revenue. Part joins onto the
    date-pruned fact slice (AQE broadcast); global single-row aggregate, one
    double division at the end."""
    p = t(spark, sf_dir, "part").select("p_partkey", "p_type")
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-03-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .agg(
            (
                F.lit(100.0)
                * F.sum(F.when(F.col("p_type") == "PROMO", _disc_price())).cast("double")
                / F.sum(_disc_price()).cast("double")
            ).alias("promo_revenue")
        )
    )


@query(
    "q15_top_supplier",
    oracle=f"""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             SUM({_DISC_PRICE}) AS total_rev
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate <  TIMESTAMP '1996-04-01'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name,
           CAST(CAST(total_rev AS VARCHAR) AS DOUBLE) AS total_revenue
    FROM supplier, revenue
    WHERE s_suppkey = supplier_no
      AND total_rev = (SELECT MAX(total_rev) FROM revenue)
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: supplier(s) with the maximum revenue in a quarter. The
    max-equality comparison happens in exact DECIMAL space (ties kept, as
    the spec requires), surfaced as double only in the output. Implemented
    with a window MAX over the per-supplier aggregate — no second scan, no
    self-join."""
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    rev = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(_disc_price()).alias("total_rev")
    )
    top = rev.withColumn(
        "max_rev", F.max("total_rev").over(Window.partitionBy())
    ).filter(F.col("total_rev") == F.col("max_rev"))
    s = t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        top.join(s, top.supplier_no == s.s_suppkey)
        .select("s_suppkey", "s_name", F.col("total_rev").cast("double").alias("total_revenue"))
    )


@query(
    "q17_small_qty_revenue",
    oracle=f"""
    SELECT {OSUM('l_extendedprice')} / 7.0 AS avg_yearly
    FROM lineitem, part p
    WHERE p.p_partkey = l_partkey AND p.p_brand = 'Brand#1'
      AND l_quantity < 0.2 * (
        SELECT CAST(CAST(SUM(CAST(l2.l_quantity AS DECIMAL(18,2))) AS VARCHAR)
                    AS DOUBLE) / COUNT(*)
        FROM lineitem l2 WHERE l2.l_partkey = p.p_partkey
      )
    """,
)
def q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17: revenue of below-one-fifth-of-average-quantity orders for
    one brand. The correlated per-part average is a window aggregate over
    the already-joined slice (every lineitem of a part survives the partkey
    equi-join, so the window sees the full population) — one shuffle on
    l_partkey instead of a second scan + re-join. Threshold math is
    exact-decimal sum → one double division → one multiply, bit-identical
    across engines."""
    p = t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#1").select("p_partkey")
    li = t(spark, sf_dir, "lineitem").select("l_partkey", "l_quantity", "l_extendedprice")
    joined = li.join(p, li.l_partkey == p.p_partkey)
    w = Window.partitionBy("l_partkey")
    thresh = F.lit(0.2) * (
        F.sum(F.col("l_quantity").cast("decimal(18,2)")).over(w).cast("double")
        / F.count(F.lit(1)).over(w).cast("double")
    )
    return (
        joined.withColumn("qty_thresh", thresh)
        .filter(F.col("l_quantity") < F.col("qty_thresh"))
        .agg((dsum("l_extendedprice", "s").cast("double") / F.lit(7.0)).alias("avg_yearly"))
    )


@query(
    "q18_large_orders",
    oracle=f"""
    SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice,
           {OSUM('l_quantity')} AS sum_qty
    FROM customer c, orders o, lineitem
    WHERE o.o_orderkey IN (
        SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
        HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 300
      )
      AND c.c_custkey = o.o_custkey AND o.o_orderkey = l_orderkey
    GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice
    """,
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18: orders whose total quantity exceeds 300, with their
    customer. The HAVING pre-aggregate shrinks the key set to a handful of
    orderkeys; that tiny set then drives semi-join pruning of orders and the
    lineitem re-aggregation (AQE broadcasts it both times)."""
    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("qty"))
        .filter(F.col("qty") > 300)
        .select(F.col("l_orderkey").alias("big_key"))
    )
    o = t(spark, sf_dir, "orders").join(
        big, F.col("o_orderkey") == F.col("big_key"), "left_semi"
    )
    c = t(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(dsum("l_quantity", "sum_qty"))
    )


@query(
    "q19_discounted_revenue",
    oracle=f"""
    SELECT {OSUM_RAW(_DISC_PRICE)} AS revenue
    FROM lineitem, part
    WHERE p_partkey = l_partkey AND (
        (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
         AND l_quantity BETWEEN 1 AND 11)
     OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25
         AND l_quantity BETWEEN 10 AND 20)
     OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35
         AND l_quantity BETWEEN 20 AND 30))
    """,
)
def q19_discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 (adapted: brand/size/quantity bands — the schema has no
    container column): OR-of-ANDs predicate spanning both join sides.
    Catalyst pushes the disjunction of part-only predicates
    (brand ∈ {1,2,3}) down to the part scan; the cross-side residual
    evaluates post-join inside codegen."""
    p = t(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    li = t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    band = (
        (F.col("p_brand") == "Brand#1")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(1, 11)
    ) | (
        (F.col("p_brand") == "Brand#2")
        & F.col("p_size").between(1, 25)
        & F.col("l_quantity").between(10, 20)
    ) | (
        (F.col("p_brand") == "Brand#3")
        & F.col("p_size").between(1, 35)
        & F.col("l_quantity").between(20, 30)
    )
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .filter(band)
        .agg(F.sum(_disc_price()).cast("double").alias("revenue"))
    )


@query(
    "q22_idle_customers",
    oracle=f"""
    WITH avgbal AS (
      SELECT {OSUM('c_acctbal')} / COUNT(*) AS a
      FROM customer WHERE c_acctbal > 0
    )
    SELECT c_nationkey, COUNT(*) AS n_custs,
           {OSUM('c_acctbal')} AS total_acctbal
    FROM customer, avgbal
    WHERE c_acctbal > a
      AND NOT EXISTS (
        SELECT 1 FROM orders
        WHERE o_custkey = c_custkey
          AND o_orderdate >= TIMESTAMP '2000-01-01'
      )
    GROUP BY c_nationkey
    """,
)
def q22_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 (adapted: grouped by c_nationkey — no phone column — and
    "idle" = no orders since 2000-01-01, since every customer here has at
    least one order overall): above-average-balance customers gone quiet.
    The scalar average rides in as a broadcast cross join (stays
    distributed, no driver collect); the NOT EXISTS is a left-anti join on
    the date-pruned, deduplicated custkey set."""
    c = t(spark, sf_dir, "customer")
    avgbal = c.filter(F.col("c_acctbal") > 0).agg(
        (
            F.sum(F.col("c_acctbal").cast("decimal(18,2)")).cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("a")
    )
    active = (
        t(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp"))
        .select("o_custkey")
        .distinct()
    )
    return (
        c.crossJoin(F.broadcast(avgbal))
        .filter(F.col("c_acctbal") > F.col("a"))
        .join(active, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_custs"),
            dsum("c_acctbal", "total_acctbal"),
        )
    )


@query(
    "q16_supplier_diversity",
    oracle="""
    SELECT p_brand, p_type, p_size,
           COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
    JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#1'
      AND p_size IN (1, 5, 10, 15, 20, 25, 30, 35)
    GROUP BY p_brand, p_type, p_size
    """,
)
def q16_supplier_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 (adapted: the part-supplier relation is derived as the
    DISTINCT (l_partkey, l_suppkey) pairs from lineitem — there is no
    partsupp table in this schema; no %Customer%Complaints% filter — no
    comment column): supplier diversity per part attribute. Distinct
    pre-aggregation shrinks lineitem to the pair set before the part join;
    the count-distinct re-shuffles on the group key once."""
    li = t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey").distinct()
    p = t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & F.col("p_size").isin(1, 5, 10, 15, 20, 25, 30, 35)
    )
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )

# Q9's supply cost term (ps_supplycost * l_quantity) has no partsupp source in
# this schema; the adaptation proxies unit cost as 60% of p_retailprice. All
# terms stay in exact decimal space until the final VARCHAR-routed double.
_Q9_COST = (
    "(CAST(p_retailprice AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(12,2)))"
    " * CAST(0.6 AS DECIMAL(2,1))"
)


@query(
    "q9_product_profit",
    oracle=f"""
    SELECT n_name AS nation, CAST(year(o_orderdate) AS INTEGER) AS o_year,
           {OSUM_RAW(f"({_DISC_PRICE} - {_Q9_COST})")} AS profit
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation ON n_nationkey = s_nationkey
    JOIN orders ON o_orderkey = l_orderkey
    WHERE p_name LIKE '%red%'
    GROUP BY n_name, year(o_orderdate)
    """,
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 (adapted: no partsupp, so unit supply cost is proxied as 60%
    of p_retailprice; the '%green%' name filter becomes '%red%' — this
    part-name vocabulary has no 'green'): profit by supplier nation and order
    year over parts whose name contains 'red'.

    Scale shape: the part filter keeps ~13% of parts — small enough for AQE
    to broadcast onto the lineitem scan, which prunes ~87% of fact rows
    before the orders join (the one real shuffle). supplier⋈nation is a
    runtime broadcast. Profit stays in exact decimal space end-to-end
    (queries.py determinism rules), surfaced as double."""
    p = t(spark, sf_dir, "part").filter(F.col("p_name").like("%red%")).select(
        "p_partkey", "p_retailprice"
    )
    s = t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    cost = (
        F.col("p_retailprice").cast("decimal(12,2)")
        * F.col("l_quantity").cast("decimal(12,2)")
    ) * F.lit("0.6").cast("decimal(2,1)")
    return (
        t(spark, sf_dir, "lineitem")
        .join(p, F.col("l_partkey") == F.col("p_partkey"))
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(n, F.col("s_nationkey") == F.col("n_nationkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(F.sum(_disc_price() - cost).cast("double").alias("profit"))
    )


# ---------------------------------------------------------------------------
# The remaining classic TPC-H shapes, adapted to the driver schema (no
# partsupp / l_commitdate / l_shipmode columns): each keeps the defining
# plan shape — correlated scalar-min (Q2), group-vs-global threshold (Q11),
# CASE-sum over a join (Q12), nested semi-join with a correlated share
# threshold (Q20), double-correlated EXISTS / NOT EXISTS (Q21).
# ---------------------------------------------------------------------------

_AVG_COST = (
    "CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE)"
    " / CAST(COUNT(*) AS DOUBLE)"
)


@query(
    "q2_min_cost_supplier",
    oracle=f"""
    WITH cost AS (
      SELECT l_partkey, l_suppkey, {_AVG_COST} AS cost
      FROM lineitem GROUP BY l_partkey, l_suppkey
    )
    SELECT s.s_acctbal, s.s_name, n.n_name, p.p_partkey, p.p_type, c.cost
    FROM part p
    JOIN cost c ON c.l_partkey = p.p_partkey
    JOIN supplier s ON s.s_suppkey = c.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE p.p_size = 15
      AND c.cost = (SELECT MIN(c2.cost) FROM cost c2
                    WHERE c2.l_partkey = p.p_partkey)
    """,
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (adapted: no partsupp table, so 'supply cost' is the
    supplier's exact average sale price of the part from lineitem): for
    every size-15 part, the supplier(s) offering it at the minimum cost —
    the correlated scalar-min subquery, decorrelated into a per-part min
    join (ties keep every minimal supplier, as the classic query does).
    The per-(part, supplier) aggregate reduces the fact table before any
    dimension join, so the correlated min costs one grouped pass + a
    broadcastable per-part min table. The size-15 part filter is applied
    BEFORE the aggregate via a broadcast semi-join (Catalyst cannot push
    a join filter below an aggregation on its own): only ~1/50 of
    lineitem ever reaches the per-(part, supplier) groupBy, and per-part
    results are unchanged — the min is over suppliers WITHIN each part."""
    p = t(spark, sf_dir, "part").filter(F.col("p_size") == 15)
    li = t(spark, sf_dir, "lineitem").join(
        F.broadcast(p.select(F.col("p_partkey").alias("l_partkey"))),
        "l_partkey",
        "left_semi",
    )
    cost = li.groupBy("l_partkey", "l_suppkey").agg(
        (
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("cost")
    )
    min_cost = cost.groupBy("l_partkey").agg(F.min("cost").alias("min_cost"))
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation")
    return (
        cost.join(min_cost, "l_partkey")
        .filter(F.col("cost") == F.col("min_cost"))
        .join(F.broadcast(p), F.col("l_partkey") == p.p_partkey)
        .join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_type", "cost")
    )


@query(
    "q11_value_concentration",
    oracle=f"""
    WITH v AS (
      SELECT l_partkey, {OSUM_RAW(_DISC_PRICE)} AS part_value
      FROM lineitem l
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation n ON s.s_nationkey = n.n_nationkey
      WHERE n.n_name = 'NATION_3'
      GROUP BY l_partkey
    )
    SELECT l_partkey, part_value FROM v
    WHERE part_value > 0.001 * (SELECT SUM(part_value) FROM v)
    """,
)
def q11_value_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape (adapted: part value = revenue shipped by one
    nation's suppliers instead of partsupp stock value): parts whose value
    exceeds a fraction of the nation's total — the group-vs-global-scalar
    threshold. The global total is a 1-row broadcast over the SAME grouped
    frame (computed once, reused via localCheckpoint), so the fact table
    is scanned and aggregated exactly once."""
    li = t(spark, sf_dir, "lineitem")
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    v = (
        li.join(F.broadcast(s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
                            .select("s_suppkey")),
                li.l_suppkey == F.col("s_suppkey"))
        .groupBy("l_partkey")
        .agg(F.sum(_disc_price()).cast("double").alias("part_value"))
        .transform(eager_checkpoint)
    )
    total = v.agg(F.sum("part_value").alias("_t"))
    return (
        v.crossJoin(F.broadcast(total))
        .filter(F.col("part_value") > 0.001 * F.col("_t"))
        .select("l_partkey", "part_value")
    )


@query(
    "q12_priority_late_lines",
    oracle="""
    SELECT l_linestatus,
           -- CAST: DuckDB SUM(int) is HUGEINT, which pandas fetches as
           -- float64 — the driver's canonicalizer would see 5840.0 vs 5840
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     AND l_shipdate > o_orderdate + INTERVAL '60 days'
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_late_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                     AND l_shipdate > o_orderdate + INTERVAL '60 days'
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_late_count,
           COUNT(*) AS n_lines
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    GROUP BY l_linestatus
    """,
)
def q12_priority_late_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (adapted: no shipmode/commitdate — lines are 'late'
    when shipped >60 days after the order date, classified by order
    priority, grouped by linestatus): the CASE-sum-over-join scan. One
    fact-fact join on orderkey, then a 2-row aggregate; the CASE terms are
    pure codegen arithmetic."""
    o = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem")
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high & late, 1).otherwise(0)).alias("high_late_count"),
            F.sum(F.when((~high) & late, 1).otherwise(0)).alias("low_late_count"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@query(
    "q20_dominant_suppliers",
    oracle="""
    WITH pq AS (
      SELECT l_partkey, l_suppkey,
             CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS VARCHAR)
                  AS DOUBLE) AS q
      FROM lineitem GROUP BY l_partkey, l_suppkey
    ),
    tot AS (SELECT l_partkey, SUM(q) AS tq FROM pq GROUP BY l_partkey)
    SELECT s.s_name, s.s_acctbal
    FROM supplier s
    WHERE s.s_suppkey IN (
      SELECT pq.l_suppkey FROM pq
      JOIN tot ON pq.l_partkey = tot.l_partkey
      JOIN part p ON p.p_partkey = pq.l_partkey
      WHERE p.p_name LIKE 'red%' AND pq.q > 0.15 * tot.tq
    )
    """,
)
def q20_dominant_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (adapted: no partsupp availqty — a supplier has
    'excess share' of a part when it shipped >15% of the part's total
    quantity): suppliers holding a dominant share of any 'red...' part —
    the nested semi-join with a correlated share threshold. The share test
    runs on the twice-grouped fact table (partial aggregates both times);
    the supplier table is only semi-joined, never exploded."""
    li = t(spark, sf_dir, "lineitem")
    pq = li.groupBy("l_partkey", "l_suppkey").agg(
        F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double").alias("q")
    ).transform(eager_checkpoint)
    tot = pq.groupBy("l_partkey").agg(F.sum("q").alias("tq"))
    red = t(spark, sf_dir, "part").filter(F.col("p_name").like("red%")).select("p_partkey")
    dominant = (
        pq.join(tot, "l_partkey")
        .join(F.broadcast(red), F.col("l_partkey") == F.col("p_partkey"))
        .filter(F.col("q") > 0.15 * F.col("tq"))
        .select("l_suppkey")
    )
    s = t(spark, sf_dir, "supplier")
    return (
        s.join(dominant, s.s_suppkey == dominant.l_suppkey, "left_semi")
        .select("s_name", "s_acctbal")
    )


@query(
    "q21_waiting_orders",
    oracle="""
    WITH li AS (
      SELECT l.l_orderkey, l.l_suppkey, l.l_shipdate
      FROM lineitem l
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      WHERE o.o_orderstatus = 'F'
    ),
    smax AS (
      SELECT l_orderkey, l_suppkey, MAX(l_shipdate) AS s_max
      FROM li GROUP BY l_orderkey, l_suppkey
    )
    SELECT s.s_name, COUNT(*) AS numwait
    FROM smax m
    JOIN supplier s ON s.s_suppkey = m.l_suppkey
    WHERE EXISTS (SELECT 1 FROM smax o2
                  WHERE o2.l_orderkey = m.l_orderkey
                    AND o2.l_suppkey <> m.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM smax o3
                      WHERE o3.l_orderkey = m.l_orderkey
                        AND o3.l_suppkey <> m.l_suppkey
                        AND o3.s_max > m.s_max)
    GROUP BY s.s_name
    """,
)
def q21_waiting_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (adapted: no receiptdate/commitdate — a supplier
    'kept the order waiting' when it shipped the final line of a
    multi-supplier completed order): per supplier, the number of 'F'
    orders where another supplier participated (EXISTS) but none shipped
    strictly later (NOT EXISTS). Decorrelated: per (order, supplier) max
    ship date, then per order the global max and supplier count — a
    supplier qualifies iff n_suppliers >= 2 and its max equals the
    order's max (strict-inequality NOT EXISTS keeps ties, matching the
    classic query). Two grouped passes + one broadcastable order-stats
    join instead of two correlated subqueries per row."""
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    li = t(spark, sf_dir, "lineitem").join(
        o.select("o_orderkey"), F.col("l_orderkey") == F.col("o_orderkey"), "left_semi"
    )
    # smax feeds two consumers that need DIFFERENT partitionings (the
    # order-stats agg on l_orderkey; the qualifying join re-keyed by
    # Catalyst on (s_max, l_orderkey)), so ReusedExchange can never fire
    # and without pinning the lineitem semi-join + first groupBy runs
    # TWICE (executed-plan audit: 2 lineitem scans, 0 ReusedExchange).
    # At 100 TB that is a second full fact-table pass; localCheckpoint
    # computes it once (A/B at sf10: 9.6s -> 8.1s best-of-3 locally).
    smax = li.groupBy("l_orderkey", "l_suppkey").agg(
        F.max("l_shipdate").alias("s_max")
    ).transform(eager_checkpoint)
    ordstats = smax.groupBy("l_orderkey").agg(
        F.max("s_max").alias("m1"), F.countDistinct("l_suppkey").alias("n_sup")
    )
    s = t(spark, sf_dir, "supplier")
    waiting = (
        smax.join(ordstats, "l_orderkey")
        .filter((F.col("n_sup") >= 2) & (F.col("s_max") == F.col("m1")))
    )
    return (
        waiting.join(F.broadcast(s), waiting.l_suppkey == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )
