"""Advanced analytics queries: as-of join, session windows, sliding
windows, rollup/grouping sets, approximate distinct — surface the reference
never had (SURVEY.md §2.7) but a Spark engine exposes naturally, each with
an exact DuckDB oracle where the semantics are deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdatapipelne_spark.operators.joins import as_of_join
from bigdatapipelne_spark.queries import OSUM, dsum, query
from bigdatapipelne_spark.sources.testdata import load_table as t


_ASOF_ORACLE = """
    SELECT p.user_id, p.event_id, p.ts, p.value, v.view_ts, v.view_value
    FROM (SELECT user_id, event_id, ts, value FROM events
          WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT user_id, ts AS view_ts, value AS view_value
                    FROM events WHERE event_type = 'view') v
      ON p.user_id = v.user_id AND p.ts >= v.view_ts
    """


@query("asof_purchase_view", oracle=_ASOF_ORACLE)
def asof_purchase_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of (point-in-time) join: each purchase gets the user's most recent
    prior (or simultaneous) view. Implemented as union+window — one shuffle
    on user_id, no range join, no per-key explosion (operators/joins.py:
    as_of_join); the oracle is DuckDB's native ASOF LEFT JOIN."""
    ev = t(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "event_id", "ts", "value"
    )
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id",
        F.col("ts").alias("view_ts"),
        F.col("value").alias("view_value"),
    )
    return as_of_join(
        purchases, views, on=["user_id"], left_time="ts", right_time="view_ts"
    )


@query("asof_purchase_view_cogroup", oracle=_ASOF_ORACLE)
def asof_purchase_view_cogroup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SAME as-of join through the cogrouped-Arrow extension surface
    (operators/joins.py: as_of_join_cogroup — cogroup + applyInPandas +
    per-key merge_asof), hash-checked against the same ASOF LEFT JOIN
    oracle as asof_purchase_view: certifies the two-sided escape hatch the
    way doc_chunks_udtf certifies UDTFs and user_value_median_udaf
    certifies grouped aggregates. The union+window form stays the hot
    path."""
    from bigdatapipelne_spark.operators.joins import as_of_join_cogroup

    ev = t(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "event_id", "ts", "value"
    )
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id",
        F.col("ts").alias("view_ts"),
        F.col("value").alias("view_value"),
    )
    return as_of_join_cogroup(
        purchases, views, on=["user_id"], left_time="ts", right_time="view_ts"
    )


@query(
    "session_window_agg",
    oracle=f"""
    WITH flagged AS (
      SELECT user_id, ts, value,
             CASE WHEN epoch_us(ts) - LAG(epoch_us(ts))
                       OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       >= 1800000000
                  OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_s,
             event_id
      FROM events
    ),
    sess AS (
      SELECT user_id, ts, value,
             SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      FROM flagged
    )
    SELECT user_id,
           MIN(ts) AS session_start,
           MAX(ts) + INTERVAL '30 minutes' AS session_end,
           {OSUM('value')} AS sum_value,
           COUNT(*) AS n_events
    FROM sess
    GROUP BY user_id, sid
    """,
)
def session_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native session windows (``F.session_window``, 30 min gap): dynamic
    merge-on-overlap windows per user. The oracle reproduces Spark's exact
    semantics with the classic gaps-and-islands construction: a session
    closes when the next event is >= gap after the previous one, and the
    window end is last-event + gap."""
    ev = t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.session_window("ts", "30 minutes").alias("sw"), "user_id")
        .agg(dsum("value", "sum_value"), F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            "sum_value",
            "n_events",
        )
    )


@query(
    "sliding_window_traffic",
    oracle=f"""
    WITH slotted AS (
      SELECT user_id, value,
             CAST(floor(epoch(ts) / 10) * 10 AS BIGINT) AS f
      FROM events
    ),
    exploded AS (
      SELECT user_id, value, unnest([f - 20, f - 10, f]) AS ws
      FROM slotted
    )
    SELECT user_id,
           TIMESTAMP '1970-01-01 00:00:00' + ws * INTERVAL '1 second'
             AS window_start,
           {OSUM('value')} AS sum_value,
           COUNT(*) AS n_events
    FROM exploded
    GROUP BY user_id, ws
    HAVING {OSUM('value')} > 100.0
    """,
)
def sliding_window_traffic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding windows (30 s length, 10 s slide): every event lands in three
    overlapping windows; per-user sums with a HAVING cut. Spark explodes to
    the per-window rows internally; the oracle does the same explicitly
    (each event's 10 s slot f contributes to windows starting f-20, f-10,
    f)."""
    ev = t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "30 seconds", "10 seconds").alias("w"), "user_id")
        .agg(dsum("value", "sum_value"), F.count(F.lit(1)).alias("n_events"))
        .filter(F.col("sum_value") > 100.0)
        .select(
            "user_id",
            F.col("w.start").alias("window_start"),
            "sum_value",
            "n_events",
        )
    )


@query(
    "priority_rollup",
    oracle=f"""
    SELECT o_orderstatus, o_orderpriority,
           COUNT(*) AS n_orders,
           {OSUM('o_totalprice')} AS total_price
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
)
def priority_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP aggregation (subtotals + grand total in one pass — Spark
    expands grouping sets, one shuffle). Group columns are non-null in the
    data, so the NULLs in the output unambiguously mark subtotal rows in
    both engines."""
    o = t(spark, sf_dir, "orders")
    return o.rollup("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        dsum("o_totalprice", "total_price"),
    )


# ONE SQL string, executed verbatim by BOTH engines (Spark runs it through
# spark.sql over registered views; DuckDB runs it as the oracle). STRING and
# the decimal VARCHAR-routing cast mean the same thing in both dialects.
_Q6_SHARED_SQL = """
    SELECT CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                          * CAST(l_discount AS DECIMAL(6,4))) AS STRING) AS DOUBLE)
             AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
"""


@query("q6_forecast_revenue", oracle=_Q6_SHARED_SQL)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape through the engine's SQL entry point: the IDENTICAL
    SQL string runs on Spark (via registered views) and on DuckDB (as the
    oracle) and hash-matches — the determinism rules (decimal sums,
    VARCHAR-routed double casts) are dialect-portable. All three predicates
    push into the parquet scan."""
    from bigdatapipelne_spark.sources.testdata import load_tables

    load_tables(spark, sf_dir)
    return spark.sql(_Q6_SHARED_SQL)


# Gaps-and-islands session construction shared by session_window_agg's
# oracle (above) and the streaming drain below.
_SESSIONS_CTE = f"""
    flagged AS (
      SELECT user_id, ts, value,
             CASE WHEN epoch_us(ts) - LAG(epoch_us(ts))
                       OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       >= 1800000000
                  OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_s,
             event_id
      FROM events
    ),
    sess AS (
      SELECT user_id, ts, value,
             SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      FROM flagged
    ),
    sessions AS (
      SELECT user_id,
             MIN(ts) AS session_start,
             MAX(ts) + INTERVAL '30 minutes' AS session_end,
             {OSUM('value')} AS sum_value,
             COUNT(*) AS n_events
      FROM sess
      GROUP BY user_id, sid
    )
"""


@query(
    "session_stream_drain",
    oracle=f"""
    WITH {_SESSIONS_CTE},
    ranked AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                                   ORDER BY session_start DESC) AS rn
      FROM sessions
    ),
    wm AS (SELECT epoch_ms(MAX(ts)) - 10000 AS wm_ms FROM events)
    SELECT user_id, session_start, session_end, sum_value, n_events
    FROM ranked, wm
    WHERE rn > 1 OR epoch_ms(session_end) <= wm_ms
    """,
)
def session_stream_drain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful streaming (applyInPandasWithState, event-time
    timeout) drained over the events table: per-user sessionization with
    30 min gap (streaming/sessions.py). Emitted rows are the sessions
    closed by an in-batch gap plus those whose timeout (last event + gap,
    ms-floored exactly as the state store compares) lies at or before the
    final watermark — the oracle reproduces both the session construction
    AND the emission semantics, so the stateful operator's late/tail
    behavior is hash-checked, not just its happy path."""
    import os
    import tempfile

    from bigdatapipelne_spark.streaming.fraud import (
        ROCKSDB_PROVIDER,
        read_events_parquet_stream,
        run_available_now,
    )
    from bigdatapipelne_spark.streaming.sessions import sessionize_stream

    from bigdatapipelne_spark.streaming.joins import size_state_partitions

    src = read_events_parquet_stream(spark, f"{sf_dir}/events.parquet")
    sessions = sessionize_stream(src, gap="30 minutes", watermark="10 seconds")

    tmp = tempfile.mkdtemp(prefix="session_stream_")
    out, cp = os.path.join(tmp, "out"), os.path.join(tmp, "cp")
    # The sessionizer wants OPPOSITE sizing at the two ends (measured,
    # .profiling/prof_session_drain_r10.py): under ~100k events the
    # per-partition state-store open/commit constant dominates (32
    # partitions 8.8s -> 8 partitions 4.9s at sf0.1), while at volume
    # the ~320us/group Python serde needs a worker per core (sf10: 32
    # partitions 64s, 8 partitions 167s). Size by event volume with a
    # core cap: floor 8, +1 partition per 12.5k events, capped at cores.
    n_events = spark.read.parquet(f"{sf_dir}/events.parquet").count()
    parts = size_state_partitions(
        n_events,
        rows_per_partition=12_500,
        floor=8,
        cap=spark.sparkContext.defaultParallelism,
    )
    # RocksDB permanently (round-11 verdict #3): with the join-store
    # family certified under RocksDB by purchase_view_outer_drain, this
    # gate carries the OTHER state-store API family
    # (applyInPandasWithState arbitrary state) on the at-scale off-heap
    # provider every round, under the unchanged oracle.
    run_available_now(
        sessions, out, cp, state_partitions=parts,
        state_store_provider=ROCKSDB_PROVIDER,
    )
    return spark.read.parquet(out).select(
        "user_id", "session_start", "session_end", "sum_value", "n_events"
    )


@query(
    "purchase_view_interval_join",
    oracle="""
    SELECT p.user_id, p.purchase_id, p.pts, v.view_id, v.vts
    FROM (SELECT user_id, event_id AS purchase_id, ts AS pts
          FROM events WHERE event_type = 'purchase') p
    JOIN (SELECT user_id, event_id AS view_id, ts AS vts
          FROM events WHERE event_type = 'view') v
      ON p.user_id = v.user_id
     AND v.vts >= p.pts - INTERVAL '1 hour'
     AND v.vts <= p.pts + INTERVAL '1 hour'
    """,
)
def purchase_view_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval (banded-range) join: every view within +-1 h of a purchase
    by the same user. Executed as a plain equi-join on (user, time band)
    with <=3x replication of the view side (operators/joins.py:
    interval_join) — the oracle runs the literal range join; the engine
    plan must contain no nested loop (asserted in test_plans)."""
    from bigdatapipelne_spark.operators.joins import interval_join

    ev = t(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("purchase_id"), F.col("ts").alias("pts")
    )
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id", F.col("event_id").alias("view_id"), F.col("ts").alias("vts")
    )
    return interval_join(
        purchases, views, on=["user_id"], left_time="pts", right_time="vts",
        lower="1 hour", upper="1 hour",
    ).select("user_id", "purchase_id", "pts", "view_id", "vts")


@query(
    "user_value_median_udaf",
    oracle="""
    SELECT user_id,
           median(value) AS median_value
    FROM events
    GROUP BY user_id
    """,
)
def user_value_median_udaf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom-aggregate extension surface: per-user exact median through a
    Pandas GROUPED_AGG UDAF (functions/udafs.py: median_agg), hash-checked
    against DuckDB's median — certifying the Arrow aggregate path
    end-to-end the way doc_chunks_udtf certifies UDTFs. The builtin twin
    (value_percentiles uses Spark's own percentile) remains the hot-path
    choice. (Spark disallows mixing GROUPED_AGG pandas UDFs with builtin
    aggregates in one agg — a real constraint of this surface, worth
    knowing before reaching for it.)"""
    from bigdatapipelne_spark.functions.udafs import median_agg

    ev = t(spark, sf_dir, "events")
    return ev.groupBy("user_id").agg(median_agg("value").alias("median_value"))


@query(
    "approx_users_per_type",
    oracle="""
    SELECT event_type,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
           TRUE AS within_tol
    FROM events GROUP BY event_type
    """,
)
def approx_users_per_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HyperLogLog++): the constant-memory distinct
    estimate a 100 TB pipeline uses instead of exact COUNT(DISTINCT).

    Sketch estimates are engine-specific, so the estimate itself can't be
    hash-compared with DuckDB; instead the query emits a BOUNDED-ERROR
    certificate the oracle CAN check: ``within_tol`` is true iff the HLL
    estimate lands within 5% of the exact count (rsd=0.02, so 5% = 2.5
    standard errors; HLL++ is exact in sparse mode at these cardinalities).
    The oracle emits literal TRUE — if the sketch ever drifts out of
    tolerance the hash check fails. Same pattern as embedding_ann_recall."""
    ev = t(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd=0.02).alias("_approx"),
        F.countDistinct("user_id").alias("exact_users"),
    ).select(
        "event_type",
        "exact_users",
        (
            F.abs(F.col("_approx") - F.col("exact_users"))
            <= 0.05 * F.col("exact_users")
        ).alias("within_tol"),
    )


_EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


@query(
    "user_type_pivot",
    oracle=f"""
    SELECT user_id,
           {", ".join(OSUM(f"CASE WHEN event_type = '{et}' THEN value END")
                      + f" AS {et}_value" for et in _EVENT_TYPES)}
    FROM events GROUP BY user_id
    """,
)
def user_type_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (long -> wide): per-user spend by event type as columns. The
    pivot values are pinned explicitly, so this is ONE pass / one shuffle
    (Spark needs no extra distinct-values job) with the same plan shape as
    a grouped aggregation — wide CASE aggregates, which is exactly what the
    oracle spells out. Users with no events of a type get NULL in both
    engines."""
    ev = t(spark, sf_dir, "events")
    wide = (
        ev.groupBy("user_id")
        .pivot("event_type", _EVENT_TYPES)
        .agg(F.sum(F.col("value").cast("decimal(18,2)")).cast("double"))
    )
    return wide.select(
        "user_id", *[F.col(et).alias(f"{et}_value") for et in _EVENT_TYPES]
    )


@query(
    "cube_order_stats",
    oracle=f"""
    SELECT o_orderstatus, o_orderpriority,
           COUNT(*) AS n_orders,
           {OSUM('o_totalprice')} AS total_price
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def cube_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE: all 2^2 grouping sets in one pass (priority_rollup covers the
    hierarchical subset). Spark expands the sets before the shuffle and
    partial-aggregates each — still one exchange."""
    o = t(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        dsum("o_totalprice", "total_price"),
    )


@query(
    "value_percentiles",
    oracle="""
    SELECT l_returnflag,
           quantile_cont(l_extendedprice, 0.5) AS median_price,
           quantile_cont(l_extendedprice, 0.9) AS p90_price,
           quantile_cont(l_extendedprice, 0.99) AS p99_price,
           COUNT(*) AS n
    FROM lineitem GROUP BY l_returnflag
    """,
)
def value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (Spark ``percentile`` == DuckDB
    ``quantile_cont``, verified bit-identical: both sort and linearly
    interpolate). The exact form needs the full value multiset per group —
    fine at dimension-bounded cardinality; the sketch counterpart for
    100 TB fact tables is ``percentile_approx`` (rows-only cousin of
    approx_users_per_type)."""
    li = t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.expr("percentile(l_extendedprice, 0.5)").alias("median_price"),
        F.expr("percentile(l_extendedprice, 0.9)").alias("p90_price"),
        F.expr("percentile(l_extendedprice, 0.99)").alias("p99_price"),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "purchase_only_days",
    oracle="""
    SELECT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day
    FROM events WHERE event_type = 'purchase'
    EXCEPT
    SELECT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day
    FROM events WHERE event_type = 'view'
    """,
)
def purchase_only_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set difference (EXCEPT DISTINCT): (user, day) pairs with a purchase
    but no view — Spark plans it as a distinct + left-anti-style aggregate,
    one shuffle on the pair key."""
    ev = t(spark, sf_dir, "events")
    days = lambda et: ev.filter(F.col("event_type") == et).select(  # noqa: E731
        "user_id", F.date_trunc("day", "ts").alias("day")
    )
    return days("purchase").subtract(days("view"))


@query(
    "engaged_days",
    oracle="""
    SELECT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day
    FROM events WHERE event_type = 'purchase'
    INTERSECT
    SELECT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day
    FROM events WHERE event_type = 'view'
    """,
)
def engaged_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set intersection (INTERSECT DISTINCT): (user, day) pairs with both a
    purchase and a view."""
    ev = t(spark, sf_dir, "events")
    days = lambda et: ev.filter(F.col("event_type") == et).select(  # noqa: E731
        "user_id", F.date_trunc("day", "ts").alias("day")
    )
    return days("purchase").intersect(days("view"))


@query(
    "user_moving_avg",
    oracle=f"""
    SELECT user_id, event_id, ts, value,
           CAST(CAST(SUM(CAST(value AS DECIMAL(18,2)))
                     OVER w AS VARCHAR) AS DOUBLE)
             / CAST(COUNT(*) OVER w AS DOUBLE) AS moving_avg
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
    """,
)
def user_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Moving average over a 5-row trailing window per user (the smoothing
    pass of a behavioral time series). Deterministic framing: unique
    (ts, event_id) ordering, decimal-exact windowed sum, one double
    division — same rules as user_running_total."""
    from pyspark.sql import Window

    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-4, Window.currentRow)
    )
    ev = t(spark, sf_dir, "events")
    return ev.select(
        "user_id",
        "event_id",
        "ts",
        "value",
        (
            F.sum(F.col("value").cast("decimal(18,2)")).over(w).cast("double")
            / F.count(F.lit(1)).over(w).cast("double")
        ).alias("moving_avg"),
    )


@query(
    "top_parts_per_brand",
    oracle="""
    SELECT p_brand, p_partkey, p_name, p_retailprice, CAST(rnk AS INTEGER) AS rank
    FROM (
      SELECT p_brand, p_partkey, p_name, p_retailprice,
             ROW_NUMBER() OVER (PARTITION BY p_brand
                                ORDER BY p_retailprice DESC, p_partkey) AS rnk
      FROM part
    )
    WHERE rnk <= 3
    """,
)
def top_parts_per_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k per group (the canonical pattern: row_number over a
    partitioned desc window + filter, one shuffle on the group key, k rows
    retained per group map-side-able via WindowGroupLimit). Deterministic
    via the unique p_partkey tiebreaker."""
    from pyspark.sql import Window

    p = t(spark, sf_dir, "part")
    w = Window.partitionBy("p_brand").orderBy(
        F.desc("p_retailprice"), F.asc("p_partkey")
    )
    return (
        p.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("p_brand", "p_partkey", "p_name", "p_retailprice", "rank")
    )


@query(
    "salted_skew_join",
    oracle=f"""
    SELECT event_type, type_weight,
           {OSUM('value')} AS sum_value,
           COUNT(*) AS n_events
    FROM events
    JOIN (SELECT 'click' AS event_type, 1 AS type_weight UNION ALL
          SELECT 'error', 5 UNION ALL
          SELECT 'purchase', 10 UNION ALL
          SELECT 'signup', 2 UNION ALL
          SELECT 'view', 1) dim
    USING (event_type)
    GROUP BY event_type, type_weight
    """,
)
def salted_skew_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-mitigated join through the real ``salted_join`` operator: the
    join key has 5 values over ~N rows (pathological skew — each key is a
    straggler task in a plain shuffle join), so the probe side salts into
    16 sub-keys and the tiny dim side replicates. The oracle is the plain
    join — certifying that salting changes the schedule, not the
    semantics."""
    from bigdatapipelne_spark.operators.joins import salted_join

    ev = t(spark, sf_dir, "events")
    dim = spark.createDataFrame(
        [("click", 1), ("error", 5), ("purchase", 10), ("signup", 2), ("view", 1)],
        "event_type string, type_weight int",
    )
    return (
        salted_join(ev, dim, on="event_type", salt=16)
        .groupBy("event_type", "type_weight")
        .agg(dsum("value", "sum_value"), F.count(F.lit(1)).alias("n_events"))
    )


@query(
    "customer_order_gaps",
    oracle="""
    SELECT o_custkey, o_orderkey, o_orderdate,
           COALESCE(CAST(date_diff('day',
                LAG(o_orderdate) OVER (PARTITION BY o_custkey
                                       ORDER BY o_orderdate, o_orderkey),
                o_orderdate) AS BIGINT), -1) AS days_since_prev,
           CAST(ntile(4) OVER (PARTITION BY o_custkey
                               ORDER BY o_totalprice, o_orderkey) AS INTEGER)
             AS price_quartile
    FROM orders
    """,
)
def customer_order_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LAG + NTILE window functions: per customer, days since the previous
    order and the order's price quartile (first order marked -1, keeping
    the column sortable for the hash gate). Deterministic framing via the
    unique o_orderkey tiebreaker in both orderings."""
    from pyspark.sql import Window

    o = t(spark, sf_dir, "orders")
    wd = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wp = Window.partitionBy("o_custkey").orderBy("o_totalprice", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.coalesce(
            F.datediff(
                F.col("o_orderdate"), F.lag("o_orderdate").over(wd)
            ).cast("bigint"),
            F.lit(-1).cast("bigint"),
        ).alias("days_since_prev"),
        F.ntile(4).over(wp).alias("price_quartile"),
    )


_PROFILE_COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]


@query(
    "lineitem_profile",
    oracle="\nUNION ALL\n".join(
        f"""
    SELECT '{c}' AS "column", COUNT(*) AS n_rows,
           COUNT(*) - COUNT({c}) AS n_nulls,
           COUNT(DISTINCT {c}) AS n_distinct,
           CAST(MIN({c}) AS DOUBLE) AS min_value,
           CAST(MAX({c}) AS DOUBLE) AS max_value
    FROM lineitem
    """
        for c in _PROFILE_COLS
    ),
)
def lineitem_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality profile of the fact table's numeric columns
    (operators/profile.py): one scan, every column's null/distinct/range
    stats simultaneously, unpivoted to one row per column — the ingest
    drift check a production pipeline runs per load."""
    from bigdatapipelne_spark.operators.profile import profile_numeric

    li = t(spark, sf_dir, "lineitem")
    return profile_numeric(li, _PROFILE_COLS)


@query(
    "price_histogram",
    oracle=f"""
    SELECT CAST(floor(l_extendedprice / 10000) AS BIGINT) AS bucket,
           COUNT(*) AS n,
           {OSUM('l_extendedprice')} AS bucket_total
    FROM lineitem
    GROUP BY bucket
    """,
)
def price_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram (10k-wide buckets) over the price column —
    one scan, one tiny aggregate; the distribution profile that sizes skew
    handling and sampling rates at 100 TB."""
    li = t(spark, sf_dir, "lineitem")
    return (
        li.groupBy(
            F.floor(F.col("l_extendedprice") / 10000).cast("bigint").alias("bucket")
        )
        .agg(F.count(F.lit(1)).alias("n"), dsum("l_extendedprice", "bucket_total"))
    )


@query(
    "value_percentiles_approx",
    oracle="""
    SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n,
           TRUE AS p50_ok, TRUE AS p90_ok, TRUE AS p99_ok
    FROM lineitem GROUP BY l_returnflag
    """,
)
def value_percentiles_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_percentile (Greenwald-Khanna sketch): the bounded-memory
    quantile path for 100 TB — exact percentile() must materialize each
    group's values, the sketch merges map-side in O(1/accuracy) space.

    Sketch outputs are engine-specific, so the quantile values can't be
    hash-compared with DuckDB; instead the query emits a BOUNDED-ERROR
    certificate the oracle CAN check: for each p, ``p{p}_ok`` is true iff
    the sketch value lands inside the exact [p-0.01, p+0.01] rank bracket
    (accuracy 10000 guarantees rank error <= 1/10000, far inside the
    bracket). The exact percentile() twin runs only to certify — the
    scale path is the sketch alone (value_percentiles is the exact twin).
    Oracle emits literal TRUE per bracket; sketch drift fails the hash."""
    li = t(spark, sf_dir, "lineitem")
    agg = li.groupBy("l_returnflag").agg(
        F.expr(
            "approx_percentile(l_extendedprice, array(0.5, 0.9, 0.99), 10000)"
        ).alias("_apx"),
        F.expr(
            "percentile(l_extendedprice,"
            " array(0.49, 0.51, 0.89, 0.91, 0.98, 1.0))"
        ).alias("_brk"),
        F.count(F.lit(1)).alias("n"),
    )
    def ok(i: int, lo: int, hi: int):
        return (
            (F.col("_apx")[i] >= F.col("_brk")[lo])
            & (F.col("_apx")[i] <= F.col("_brk")[hi])
        )
    return agg.select(
        "l_returnflag",
        "n",
        ok(0, 0, 1).alias("p50_ok"),
        ok(1, 2, 3).alias("p90_ok"),
        ok(2, 4, 5).alias("p99_ok"),
    )


_SCD2_ORACLE = """
    WITH changes AS (
      SELECT user_id, ts, event_id,
             CAST(FLOOR(value) AS INTEGER) % 3 AS plan
      FROM events WHERE event_type = 'signup'
    ), flagged AS (
      SELECT *,
             LAG(plan) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS prev_plan,
             LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS prev_ts
      FROM changes
    ), versions AS (
      SELECT user_id, ts, event_id, plan FROM flagged
      WHERE prev_ts IS NULL OR plan IS DISTINCT FROM prev_plan
    )
    SELECT user_id, plan,
           ts AS effective_from,
           LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
             AS effective_to,
           (LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
             IS NULL) AS is_current,
           CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id)
             AS BIGINT) AS version,
           event_id
    FROM versions
    """


def _signup_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Signup events as an SCD2 change feed: the tracked attribute is a
    3-valued plan derived from the event value, so consecutive no-op
    restatements (same plan twice in a row) genuinely occur and the
    collapse path is exercised, not just compiled."""
    ev = t(spark, sf_dir, "events")
    return ev.filter(F.col("event_type") == "signup").select(
        "user_id",
        "ts",
        "event_id",
        (F.floor("value").cast("int") % 3).alias("plan"),
    )


@query("user_scd2", oracle=_SCD2_ORACLE)
def user_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type 2 dimension history from a change feed (operators/scd.py:
    scd2_snapshot): collapse no-op restatements, then effective_from/
    effective_to/is_current/version via LEAD + ROW_NUMBER — two window
    passes over ONE shuffle on the dimension key. The warehouse history
    surface the reference's full-rebuild spec mart lacks."""
    from bigdatapipelne_spark.operators.scd import scd2_snapshot

    return scd2_snapshot(
        _signup_changes(spark, sf_dir),
        keys=["user_id"], ts_col="ts", attrs=["plan"], tiebreak=["event_id"],
    )


@query("user_scd2_incremental", oracle=_SCD2_ORACLE)
def user_scd2_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SAME history built INCREMENTALLY (operators/scd.py: scd2_merge):
    snapshot the feed up to Jan 16, then fold the rest in as a CDC batch —
    untouched keys pass through anti-join-only, affected keys replay
    version-starts + batch. Hash-equality with the full-rebuild oracle
    certifies merge == snapshot for append-style batches."""
    from bigdatapipelne_spark.operators.scd import scd2_merge, scd2_snapshot

    changes = _signup_changes(spark, sf_dir)
    cutoff = F.lit("2024-01-16 00:00:00").cast("timestamp")
    dim = scd2_snapshot(
        changes.filter(F.col("ts") < cutoff),
        keys=["user_id"], ts_col="ts", attrs=["plan"], tiebreak=["event_id"],
    )
    return scd2_merge(
        dim,
        changes.filter(F.col("ts") >= cutoff),
        keys=["user_id"], ts_col="ts", attrs=["plan"], tiebreak=["event_id"],
    )


@query(
    "lineitem_quality",
    oracle="""
    WITH n AS (SELECT CAST(COUNT(*) AS BIGINT) AS total FROM lineitem),
    checks AS (
      SELECT 'not_null:l_orderkey' AS expectation, 'not_null' AS kind,
             CAST(SUM(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END)
               AS BIGINT) AS violations,
             (SELECT total FROM n) AS total
      FROM lineitem
      UNION ALL
      SELECT 'accepted_values:l_returnflag', 'accepted_values',
             CAST(SUM(CASE WHEN l_returnflag IS NOT NULL
                            AND l_returnflag NOT IN ('A','N','R')
                           THEN 1 ELSE 0 END) AS BIGINT),
             (SELECT total FROM n)
      FROM lineitem
      UNION ALL
      SELECT 'in_range:l_quantity', 'in_range',
             CAST(SUM(CASE WHEN l_quantity IS NOT NULL
                            AND l_quantity NOT BETWEEN 1 AND 50
                           THEN 1 ELSE 0 END) AS BIGINT),
             (SELECT total FROM n)
      FROM lineitem
      UNION ALL
      SELECT 'in_range:l_discount', 'in_range',
             CAST(SUM(CASE WHEN l_discount IS NOT NULL
                            AND l_discount NOT BETWEEN 0 AND 0.05
                           THEN 1 ELSE 0 END) AS BIGINT),
             (SELECT total FROM n)
      FROM lineitem
      UNION ALL
      SELECT 'matches_regex:l_linestatus', 'matches_regex',
             CAST(SUM(CASE WHEN l_linestatus IS NOT NULL
                            AND NOT regexp_matches(l_linestatus, '^[OF]$')
                           THEN 1 ELSE 0 END) AS BIGINT),
             (SELECT total FROM n)
      FROM lineitem
      UNION ALL
      SELECT 'satisfies:l_extendedprice', 'satisfies',
             CAST(SUM(CASE WHEN NOT COALESCE(l_extendedprice > 0, FALSE)
                           THEN 1 ELSE 0 END) AS BIGINT),
             (SELECT total FROM n)
      FROM lineitem
      UNION ALL
      SELECT 'unique:l_orderkey,l_linenumber', 'unique',
             CAST(COALESCE((SELECT SUM(c) FROM (
               SELECT COUNT(*) AS c FROM lineitem
               GROUP BY l_orderkey, l_linenumber HAVING COUNT(*) > 1)), 0)
               AS BIGINT),
             (SELECT total FROM n)
      UNION ALL
      SELECT 'referential:l_orderkey', 'referential',
             CAST((SELECT COUNT(*) FROM lineitem l
                   WHERE l_orderkey IS NOT NULL AND NOT EXISTS (
                     SELECT 1 FROM orders o
                     WHERE o.o_orderkey = l.l_orderkey)) AS BIGINT),
             (SELECT total FROM n)
    )
    SELECT expectation, kind, violations, total,
           (violations = 0) AS passed
    FROM checks
    """,
)
def lineitem_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative quality contract over lineitem (operators/quality.py):
    six row-level rules fused into ONE scan/aggregate plus a uniqueness
    groupBy and a referential anti-join against orders — the dbt/Deequ-
    style publish gate the reference's parse-time bad-record capture
    (S5) stops short of. in_range:l_discount is deliberately tighter
    than the data so the violations path is certified with real
    nonzero counts, not just zeros."""
    from bigdatapipelne_spark.operators import quality as Q

    li = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders")
    return Q.check_expectations(
        li,
        [
            Q.not_null("l_orderkey"),
            Q.accepted_values("l_returnflag", ["A", "N", "R"]),
            Q.in_range("l_quantity", 1, 50),
            Q.in_range("l_discount", 0, 0.05),
            Q.matches_regex("l_linestatus", "^[OF]$"),
            Q.satisfies("l_extendedprice", "l_extendedprice > 0"),
            Q.unique(["l_orderkey", "l_linenumber"]),
            Q.referential("l_orderkey", orders, "o_orderkey"),
        ],
    )


@query("user_scd2_stream_drain", oracle=_SCD2_ORACLE)
def user_scd2_stream_drain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SAME dimension maintained by STREAMING CDC (streaming/scd.py:
    scd2_stream_to_dim): the signup feed is staged as four ascending
    time-range files, replayed as ordered micro-batches
    (maxFilesPerTrigger=1), and folded into the dim store one scd2_merge
    per batch — snapshot, then three incremental merges. The drained
    store hash-matches the full-rebuild oracle shared with user_scd2:
    continuous maintenance loses nothing vs batch rebuild."""
    import os
    import tempfile

    from bigdatapipelne_spark.streaming.scd import (
        read_dim,
        scd2_stream_to_dim,
        stage_ordered_files,
    )

    changes = _signup_changes(spark, sf_dir)
    cuts = ["2024-01-08", "2024-01-16", "2024-01-24"]
    lo = [None, *cuts]
    hi = [*cuts, None]
    frames = []
    for a, b in zip(lo, hi):
        part = changes
        if a is not None:
            part = part.filter(F.col("ts") >= F.lit(a).cast("timestamp"))
        if b is not None:
            part = part.filter(F.col("ts") < F.lit(b).cast("timestamp"))
        frames.append(part)

    tmp = tempfile.mkdtemp(prefix="scd2_stream_")
    staging = os.path.join(tmp, "staged")
    stage_ordered_files(frames, staging)

    src = (
        spark.readStream.schema(frames[0].schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(staging)
    )
    dim_path = os.path.join(tmp, "dim")
    scd2_stream_to_dim(
        src,
        dim_path,
        os.path.join(tmp, "cp"),
        keys=["user_id"], ts_col="ts", attrs=["plan"], tiebreak=["event_id"],
    )
    return read_dim(spark, dim_path).select(
        "user_id", "plan", "effective_from", "effective_to",
        "is_current", "version", "event_id",
    )


@query(
    "customer_merge",
    oracle=f"""
    WITH src AS (
      SELECT o_custkey AS c_custkey,
             {OSUM('o_totalprice')} AS total_spent,
             COUNT(*) AS n_orders
      FROM orders GROUP BY o_custkey
    ), srcall AS (
      SELECT * FROM src
      UNION ALL
      SELECT -c_custkey - 1, total_spent, n_orders
      FROM src WHERE c_custkey % 7 = 0
    )
    SELECT
      COALESCE(c.c_custkey, s.c_custkey) AS c_custkey,
      CASE WHEN c.c_custkey IS NOT NULL THEN c.c_name
           ELSE 'new#' || CAST(s.c_custkey AS VARCHAR) END AS c_name,
      CASE WHEN c.c_custkey IS NOT NULL THEN c.c_nationkey
           ELSE 0 END AS c_nationkey,
      CASE WHEN c.c_custkey IS NOT NULL AND s.c_custkey IS NOT NULL
             THEN c.c_acctbal + s.total_spent
           WHEN c.c_custkey IS NOT NULL THEN c.c_acctbal
           ELSE s.total_spent END AS c_acctbal,
      CASE WHEN c.c_custkey IS NOT NULL THEN c.c_mktsegment
           ELSE 'NEW' END AS c_mktsegment
    FROM customer c FULL OUTER JOIN srcall s ON c.c_custkey = s.c_custkey
    WHERE NOT (c.c_custkey IS NOT NULL AND s.c_custkey IS NOT NULL
               AND s.n_orders >= 20)
    """,
)
def customer_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI MERGE INTO over plain DataFrames (operators/merge.py): fold a
    per-customer order summary into the customer dimension in ONE
    full-outer join — matched rows get a both-sides update (acctbal +=
    exact-decimal total spent), heavy customers (>=20 orders) are
    deleted, source-only keys (a synthetic new-customer slice) insert
    typed rows, and customers with no orders pass through. All four
    branches are live on real data and hash-checked at once."""
    from bigdatapipelne_spark.operators.merge import merge_into

    cust = t(spark, sf_dir, "customer")
    src = (
        t(spark, sf_dir, "orders")
        .groupBy(F.col("o_custkey").alias("c_custkey"))
        .agg(
            dsum("o_totalprice", "total_spent"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )
    # New-customer slice keys are the NEGATIVE mirror (-k-1) of real keys:
    # unlike a fixed "+1000000" offset, that can never collide with a real
    # custkey at any scale factor (the 100x replica construction re-keys
    # customers past 1M, where an additive offset lands on live keys and
    # the strict duplicate-source-key guard correctly refuses the merge).
    srcall = src.unionByName(
        src.filter(F.col("c_custkey") % 7 == 0).select(
            (-F.col("c_custkey") - 1).alias("c_custkey"),
            "total_spent",
            "n_orders",
        )
    )
    return merge_into(
        cust,
        srcall,
        on=["c_custkey"],
        matched_update={
            "c_acctbal": F.col("t.c_acctbal") + F.col("s.total_spent")
        },
        matched_delete=F.col("s.n_orders") >= 20,
        not_matched_insert={
            "c_custkey": F.col("s.c_custkey"),
            "c_name": F.concat(
                F.lit("new#"), F.col("s.c_custkey").cast("string")
            ),
            "c_nationkey": F.lit(0),
            "c_acctbal": F.col("s.total_spent"),
            "c_mktsegment": F.lit("NEW"),
        },
    )


@query(
    "purchase_funnel",
    oracle="""
    WITH s1 AS (
      SELECT user_id, MIN(CASE WHEN event_type = 'view' THEN ts END) AS t1
      FROM events GROUP BY user_id
    ), s2 AS (
      SELECT e.user_id, s1.t1,
             MIN(CASE WHEN e.event_type = 'click' AND e.ts > s1.t1
                      THEN e.ts END) AS t2
      FROM events e JOIN s1 ON e.user_id = s1.user_id
      GROUP BY e.user_id, s1.t1
    ), s3 AS (
      SELECT e.user_id, s2.t1, s2.t2,
             MIN(CASE WHEN e.event_type = 'purchase' AND e.ts > s2.t2
                      THEN e.ts END) AS t3
      FROM events e JOIN s2 ON e.user_id = s2.user_id
      GROUP BY e.user_id, s2.t1, s2.t2
    )
    SELECT COUNT(*) AS n_users,
           COUNT(t1) AS n_viewed,
           COUNT(t2) AS n_clicked_after_view,
           COUNT(t3) AS n_purchased_after_click
    FROM s3
    """,
)
def purchase_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered-step funnel (view -> click-after-view -> purchase-after-
    click): each step's timestamp is the MIN event time strictly after
    the previous step's, so out-of-order events can't fake a conversion.
    Three grouped aggregates all keyed on user_id — Catalyst reuses the
    exchange, so it's one logical shuffle of the events table plus two
    joins of tiny per-user frames; counts are null-skipping COUNTs, no
    window sort of the raw events."""
    ev = t(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    s1 = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("t1")
    )
    s2 = (
        ev.join(s1, "user_id")
        .groupBy("user_id", "t1")
        .agg(
            F.min(
                F.when(
                    (F.col("event_type") == "click") & (F.col("ts") > F.col("t1")),
                    F.col("ts"),
                )
            ).alias("t2")
        )
    )
    s3 = (
        ev.join(s2, "user_id")
        .groupBy("user_id", "t1", "t2")
        .agg(
            F.min(
                F.when(
                    (F.col("event_type") == "purchase")
                    & (F.col("ts") > F.col("t2")),
                    F.col("ts"),
                )
            ).alias("t3")
        )
    )
    return s3.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.count("t1").alias("n_viewed"),
        F.count("t2").alias("n_clicked_after_view"),
        F.count("t3").alias("n_purchased_after_click"),
    )


@query(
    "golden_events",
    oracle="""
    SELECT user_id, event_type, event_id, ts, value
    FROM (
      SELECT user_id, event_type, event_id, ts, value,
             row_number() OVER (
               PARTITION BY user_id, event_type
               ORDER BY (value IS NULL), ts DESC, event_id
             ) AS rn
      FROM events
    ) WHERE rn = 1
    """,
)
def golden_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Survivorship dedup (operators/merge.py: golden_record): one
    representative event per (user, type) by rule cascade — non-null
    value beats null, then most recent, then lowest event_id as the
    total-order tiebreak. The MDM best-record pattern over a raw feed."""
    from bigdatapipelne_spark.operators.merge import golden_record

    ev = t(spark, sf_dir, "events").select(
        "user_id", "event_type", "event_id", "ts", "value"
    )
    return golden_record(
        ev,
        keys=["user_id", "event_type"],
        order_by=[
            F.col("value").isNull().asc(),
            F.col("ts").desc(),
            F.col("event_id").asc(),
        ],
    )


@query(
    "events_time_rollup",
    oracle=f"""
    SELECT COALESCE(CAST(date_trunc('day', ts) AS TIMESTAMP),
                    TIMESTAMP '1900-01-01') AS day,
           COALESCE(EXTRACT(hour FROM ts), -1) AS hour,
           COUNT(*) AS n_events,
           {OSUM('value')} AS sum_value
    FROM events
    GROUP BY ROLLUP (CAST(date_trunc('day', ts) AS TIMESTAMP),
                     EXTRACT(hour FROM ts))
    """,
)
def events_time_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-grain time rollup (the hypertable/continuous-aggregate
    pattern): hourly, daily and grand-total aggregates of the event
    stream in ONE pass via ROLLUP(day, hour) — Spark expands the grouping
    sets map-side, so the fact table is scanned and shuffled once for
    all three grains instead of once per grain. DuckDB date_trunc
    returns DATE and EXTRACT returns a wider int — both cast to match
    Spark's TIMESTAMP/BIGINT. Subtotal-marker NULLs are COALESCEd to
    sentinels (1900-01-01 / -1) on both sides: the harness sorts rows as
    tuples and None is unordered against real values."""
    ev = t(spark, sf_dir, "events")
    return (
        ev.select(
            F.date_trunc("day", "ts").alias("day"),
            F.hour("ts").cast("bigint").alias("hour"),
            "value",
        )
        .rollup("day", "hour")
        .agg(F.count(F.lit(1)).alias("n_events"), dsum("value", "sum_value"))
        .select(
            F.coalesce(F.col("day"), F.lit("1900-01-01").cast("timestamp"))
            .alias("day"),
            F.coalesce(F.col("hour"), F.lit(-1).cast("bigint")).alias("hour"),
            "n_events",
            "sum_value",
        )
    )


@query(
    "value_anomalies",
    oracle="""
    WITH med AS (
      SELECT event_type, median(value) AS med FROM events GROUP BY event_type
    ),
    mad AS (
      SELECT e.event_type, median(abs(e.value - m.med)) AS mad, MAX(m.med) AS med
      FROM events e JOIN med m USING (event_type) GROUP BY e.event_type
    ),
    scored AS (
      SELECT e.event_id, e.event_type, e.value,
             CASE WHEN m.mad > 0
                  THEN 0.6745 * (e.value - m.med) / m.mad END AS z
      FROM events e JOIN mad m USING (event_type)
    )
    SELECT event_id, event_type, value, ROUND(z, 6) AS robust_z
    FROM scored WHERE abs(ROUND(z, 6)) >= 3.5
    """,
)
def value_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust anomaly detection (operators/profile.py: mad_outliers):
    modified z-score from per-type median + MAD, flagging |z| >= 3.5 —
    the outlier sweep a 100 TB ingest runs per load. Median/MAD resist
    the very outliers being hunted (50% breakdown vs mean/stddev's 0%).
    Two tiny stat aggregates broadcast back onto the fact scan — no wide
    shuffle. z is emitted rounded to 6 dp and the threshold compares the
    ROUNDED value on both engines, absorbing the cross-engine percentile
    interpolation ulp."""
    from bigdatapipelne_spark.operators.profile import mad_outliers

    ev = t(spark, sf_dir, "events").select("event_id", "event_type", "value")
    out = mad_outliers(ev, "value", ["event_type"], threshold=3.5)
    return out.filter("is_outlier").select(
        "event_id", "event_type", "value", F.round("robust_z", 6).alias("robust_z")
    )


@query(
    "hll_users_rollup",
    oracle="""
    SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
           TRUE AS within_tol
    FROM events GROUP BY 1
    UNION ALL
    SELECT TIMESTAMP '1970-01-01 00:00:00',
           CAST(COUNT(DISTINCT user_id) AS BIGINT),
           TRUE
    FROM events
    """,
)
def hll_users_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGEABLE sketch rollup (Apache DataSketches HLL via
    hll_sketch_agg / hll_union_agg): per-day user sketches, then the
    global cardinality re-derived by UNIONING the daily sketches — never
    rescanning the facts. This re-aggregability is why sketches beat
    exact COUNT(DISTINCT) at 100 TB: daily sketch bytes persist in a
    rollup mart and any coarser grain (week/month/all-time) is a cheap
    sketch merge. Emits the bounded-error certificate pattern
    (approx_users_per_type): each estimate — including the one from the
    MERGED sketch, sentinel day 1970-01-01 — must land within 5% of the
    exact count or the oracle hash fails. countDistinct here only
    certifies; the scale path carries sketches alone."""
    ev = t(spark, sf_dir, "events")
    daily = ev.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        F.hll_sketch_agg("user_id").alias("sk"),
        F.countDistinct("user_id").alias("exact_users"),
    )
    tol = lambda est, exact: F.abs(est - exact) <= 0.05 * exact  # noqa: E731
    daily_rows = daily.select(
        "day",
        "exact_users",
        tol(F.hll_sketch_estimate("sk"), F.col("exact_users")).alias("within_tol"),
    )
    merged = daily.agg(F.hll_union_agg("sk").alias("sk")).select(
        F.hll_sketch_estimate("sk").alias("est")
    )
    global_exact = ev.agg(F.countDistinct("user_id").alias("exact_users"))
    total_row = merged.crossJoin(global_exact).select(
        F.lit("1970-01-01 00:00:00").cast("timestamp").alias("day"),
        "exact_users",
        tol(F.col("est"), F.col("exact_users")).alias("within_tol"),
    )
    return daily_rows.unionByName(total_row)


@query(
    "hll_stream_rollup",
    oracle="""
    SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
           TRUE AS within_tol
    FROM events GROUP BY 1
    """,
)
def hll_stream_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The HLL rollup MAINTAINED FROM A STREAM (streaming/sketches.py):
    events staged as four ascending time-range files replay as ordered
    micro-batches (maxFilesPerTrigger=1), each folding its per-day
    sketches into the store via hll_union_agg — so a day spanning a
    batch boundary accumulates across batches, and a user seen in
    several batches registers once inside the union (no double count).
    The drained store's estimates carry the same bounded-error
    certificate as the batch twin (hll_users_rollup): every estimate
    within 5% of the exact per-day distinct count or the oracle hash
    fails. Continuous maintenance == one-shot scan, certified."""
    import os
    import tempfile

    from bigdatapipelne_spark.streaming.fraud import (
        EVENTS_SCHEMA,
        read_events_stream,
    )
    from bigdatapipelne_spark.streaming.scd import stage_ordered_files
    from bigdatapipelne_spark.streaming.sketches import (
        hll_stream_to_rollup,
        read_rollup_estimates,
    )

    ev = t(spark, sf_dir, "events")
    cuts = ["2024-01-08", "2024-01-16", "2024-01-24"]
    lo = [None, *cuts]
    hi = [*cuts, None]
    frames = []
    for a, b in zip(lo, hi):
        part = ev
        if a is not None:
            part = part.filter(F.col("ts") >= F.lit(a).cast("timestamp"))
        if b is not None:
            part = part.filter(F.col("ts") < F.lit(b).cast("timestamp"))
        frames.append(part.select([f.name for f in EVENTS_SCHEMA.fields]))

    tmp = tempfile.mkdtemp(prefix="hll_stream_")
    staging = os.path.join(tmp, "staging")
    stage_ordered_files(frames, staging)
    src = read_events_stream(
        spark, staging, schema=EVENTS_SCHEMA, fmt="parquet",
        max_files_per_trigger=1,
    )
    store, cp = os.path.join(tmp, "store"), os.path.join(tmp, "cp")
    hll_stream_to_rollup(src, store, cp)

    exact = ev.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        F.countDistinct("user_id").alias("exact_users")
    )
    est = read_rollup_estimates(spark, store)
    return est.join(exact, "day").select(
        "day",
        "exact_users",
        (
            F.abs(F.col("est_users") - F.col("exact_users"))
            <= 0.05 * F.col("exact_users")
        ).alias("within_tol"),
    )


@query(
    "value_drift_psi",
    oracle="""
    WITH stats AS (
      SELECT MIN(CAST(value AS DOUBLE)) AS lo, MAX(CAST(value AS DOUBLE)) AS hi
      FROM events
    ),
    cells AS (
      SELECT event_type,
             CASE WHEN ts < TIMESTAMP '2024-01-16 00:00:00'
                  THEN 'before' ELSE 'after' END AS era,
             CASE WHEN hi = lo THEN 0
                  ELSE LEAST(9, CAST(FLOOR((CAST(value AS DOUBLE) - lo)
                                     / ((hi - lo) / 10.0)) AS INTEGER))
             END AS bin,
             COUNT(*) AS cnt
      FROM events, stats GROUP BY 1, 2, 3
    ),
    domain AS (
      SELECT event_type, era, bin
      FROM (SELECT DISTINCT event_type FROM events),
           (VALUES ('before'), ('after')) AS e(era),
           unnest(generate_series(0, 9)) AS b(bin)
    ),
    dense AS (
      SELECT d.event_type, d.era, d.bin, COALESCE(c.cnt, 0) AS cnt
      FROM domain d LEFT JOIN cells c
        ON d.event_type = c.event_type AND d.era = c.era AND d.bin = c.bin
    ),
    tot AS (SELECT event_type, era, SUM(cnt) AS n FROM dense GROUP BY 1, 2),
    sm AS (
      SELECT d.event_type, d.era, d.bin,
             CAST(cnt + 1 AS DOUBLE) / CAST(n + 10 AS DOUBLE) AS p, n
      FROM dense d JOIN tot USING (event_type, era)
    ),
    bef AS (SELECT event_type, bin, p AS pb, n AS nb FROM sm WHERE era = 'before'),
    aft AS (SELECT event_type, bin, p AS pa, n AS na FROM sm WHERE era = 'after')
    SELECT bef.event_type,
           CAST(MAX(nb) AS BIGINT) AS n_before,
           CAST(MAX(na) AS BIGINT) AS n_after,
           round(SUM((pa - pb) * ln(pa / pb)), 6) AS psi
    FROM bef JOIN aft USING (event_type, bin)
    GROUP BY bef.event_type
    """,
)
def value_drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index per event_type between the first and
    second half of the month (operators/profile.py psi_drift) — the
    standard landing-batch drift monitor. Equal-width bins over the
    global value range (1-row stats broadcast), Laplace-smoothed over a
    densified (group, era, bin) domain so empty bins contribute finite
    terms; one map-side-combined cell count is the only corpus-sized
    shuffle. The oracle replays grid, smoothing, and the ln-sum (rounded
    6 dp, doc_char_entropy precedent) exactly."""
    from bigdatapipelne_spark.operators.profile import psi_drift

    ev = t(spark, sf_dir, "events")
    return psi_drift(
        ev, "event_type", "value", "ts", "2024-01-16 00:00:00", bins=10
    )


@query(
    "user_type_unpivot",
    oracle=f"""
    SELECT user_id, event_type, {OSUM('value')} AS sum_value
    FROM events GROUP BY user_id, event_type
    """,
)
def user_type_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (wide -> long, the melt operator): the user_type_pivot
    wide frame melted back to (user_id, event_type, sum_value) rows via
    DataFrame.unpivot, absent combinations (pivot NULLs) dropped. The
    oracle is the plain long-form grouped sum, so the hash certifies the
    pivot -> unpivot round trip is lossless — names, values, and row set.
    Unpivot is a zero-shuffle projection (each wide row expands to its
    value columns in place)."""
    ev = t(spark, sf_dir, "events")
    wide = (
        ev.groupBy("user_id")
        .pivot("event_type", _EVENT_TYPES)
        .agg(F.sum(F.col("value").cast("decimal(18,2)")).cast("double"))
    )
    return (
        wide.unpivot("user_id", _EVENT_TYPES, "event_type", "sum_value")
        .filter(F.col("sum_value").isNotNull())
    )


@query(
    "session_window_stream_drain",
    oracle=f"""
    WITH {_SESSIONS_CTE},
    wm AS (SELECT epoch_ms(MAX(ts)) - 10000 AS wm_ms FROM events)
    SELECT user_id, session_start, session_end, sum_value, n_events
    FROM sessions, wm
    WHERE epoch_ms(session_end) <= wm_ms
    """,
)
def session_window_stream_drain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The BUILT-IN streaming session operator (F.session_window +
    watermark, JVM state store) drained over the same events — the
    scale-preferred twin of the custom applyInPandasWithState
    sessionizer (session_stream_drain). Same gaps-and-islands session
    set, but the native append-mode emission rule differs from the
    custom operator's: ONLY watermark passage emits (session_end <=
    final watermark); a session closed by a later in-batch event stays
    in state until the watermark clears it. The oracle reproduces
    exactly that rule, so the two drains certify both emission
    disciplines against one session construction."""
    import os
    import tempfile

    from bigdatapipelne_spark.streaming.fraud import (
        read_events_parquet_stream,
        run_available_now,
    )

    src = read_events_parquet_stream(spark, f"{sf_dir}/events.parquet")
    agg = (
        src.withWatermark("ts", "10 seconds")
        .groupBy(F.session_window("ts", "30 minutes"), "user_id")
        .agg(dsum("value", "sum_value"), F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "sum_value",
            "n_events",
        )
    )
    from bigdatapipelne_spark.streaming.joins import size_state_partitions

    tmp = tempfile.mkdtemp(prefix="native_session_stream_")
    out, cp = os.path.join(tmp, "out"), os.path.join(tmp, "cp")
    # JVM state op: the standard state-volume sizing applies (state rows
    # ~ open sessions <= events); no Python-worker parallelism concern.
    n_events = spark.read.parquet(f"{sf_dir}/events.parquet").count()
    run_available_now(
        agg, out, cp, state_partitions=size_state_partitions(n_events)
    )
    return spark.read.parquet(out).select(
        "user_id", "session_start", "session_end", "sum_value", "n_events"
    )
