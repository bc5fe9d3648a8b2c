"""Join / set-op / window / sort surface (SURVEY §2.C) — every operator
declared as an oracle-checked query.

Scale conventions: dimension sides broadcast explicitly; window partitions
use high-cardinality keys; theta joins keep an equi-key component so the
planner never falls back to a cross product (except the declared cross
join, which is bounded: region × nation).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .operators.joins import asof_join_union, range_join
from .queries import _dec2, _disc_price, query
from .sources import load_table


# ---------------------------------------------------------------------------
# Join battery
# ---------------------------------------------------------------------------

@query(
    "join_left_outer_orders",
    """
    SELECT c_custkey, c_name, o_orderkey, o_totalprice
    FROM customer LEFT JOIN orders ON o_custkey = c_custkey AND o_orderstatus = 'F'
    ORDER BY c_custkey, o_orderkey
    """,
    "join",
)
def join_left_outer_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .select("c_custkey", "c_name", "o_orderkey", "o_totalprice")
        .orderBy("c_custkey", "o_orderkey")
    )


@query(
    "join_right_outer_nation",
    """
    SELECT n_name, s_suppkey, s_name
    FROM supplier RIGHT JOIN nation ON s_nationkey = n_nationkey
    ORDER BY n_name, s_suppkey
    """,
    "join",
)
def join_right_outer_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    return (
        s.join(n, s.s_nationkey == n.n_nationkey, "right")
        .select("n_name", "s_suppkey", "s_name")
        .orderBy("n_name", "s_suppkey")
    )


@query(
    "join_full_outer_customer_supplier_nations",
    """
    SELECT cn.nk AS c_nationkey, cn.n_cust, sn.nk AS s_nationkey, sn.n_supp
    FROM (SELECT c_nationkey AS nk, COUNT(*) AS n_cust FROM customer GROUP BY 1) cn
    FULL OUTER JOIN (SELECT s_nationkey AS nk, COUNT(*) AS n_supp FROM supplier GROUP BY 1) sn
    ON cn.nk = sn.nk
    ORDER BY 1, 3
    """,
    "join", "agg",
)
def join_full_outer_customer_supplier_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    cn = (
        load_table(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("nk"))
        .agg(F.count(F.lit(1)).alias("n_cust"))
    )
    sn = (
        load_table(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("nk"))
        .agg(F.count(F.lit(1)).alias("n_supp"))
    )
    return (
        cn.alias("cn")
        .join(sn.alias("sn"), F.col("cn.nk") == F.col("sn.nk"), "full")
        .select(
            F.col("cn.nk").alias("c_nationkey"),
            "n_cust",
            F.col("sn.nk").alias("s_nationkey"),
            "n_supp",
        )
        .orderBy("c_nationkey", "s_nationkey")
    )


@query(
    "join_semi_customers_with_urgent_orders",
    """
    SELECT c_custkey, c_name FROM customer
    WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')
    ORDER BY c_custkey
    """,
    "join",
)
def join_semi_customers_with_urgent_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


@query(
    "join_anti_customers_without_orders",
    """
    SELECT c_custkey, c_name FROM customer
    WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_custkey IS NOT NULL)
    ORDER BY c_custkey
    """,
    "join",
)
def join_anti_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


@query(
    "join_cross_region_nation",
    """
    SELECT r_name, n_name FROM region CROSS JOIN nation ORDER BY r_name, n_name
    """,
    "join",
)
def join_cross_region_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = load_table(spark, sf_dir, "region")
    n = load_table(spark, sf_dir, "nation")
    return r.crossJoin(n).select("r_name", "n_name").orderBy("r_name", "n_name")


@query(
    "join_theta_richer_customers_same_nation",
    """
    SELECT s_suppkey, c_custkey, s_acctbal, c_acctbal
    FROM supplier JOIN customer
      ON s_nationkey = c_nationkey AND c_acctbal > s_acctbal
    ORDER BY s_suppkey, c_custkey
    """,
    "join",
)
def join_theta_richer_customers_same_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-equi (theta) join with an equi component — planner keeps it a
    hash join on nationkey with a residual predicate, never a cross
    product."""
    s = load_table(spark, sf_dir, "supplier")
    c = load_table(spark, sf_dir, "customer")
    return (
        s.join(
            F.broadcast(c),
            (s.s_nationkey == c.c_nationkey) & (c.c_acctbal > s.s_acctbal),
        )
        .select("s_suppkey", "c_custkey", "s_acctbal", "c_acctbal")
        .orderBy("s_suppkey", "c_custkey")
    )


@query(
    "q5_local_supplier_volume",
    """
    SELECT n_name,
      CAST(SUM(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
    FROM customer
      JOIN orders   ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      JOIN nation   ON s_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY n_name
    ORDER BY revenue DESC, n_name
    """,
    "join", "agg",
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-way join. Scale: only the constant-size tables
    (nation 25 rows, region 5) carry a forced broadcast hint. Orders,
    customer, and supplier all grow with the data — at 100 TB a
    broadcast HINT on any of them is a driver OOM — so AQE chooses by
    measured size: it broadcasts them at this scale (lineitem never
    shuffles) and degrades to shuffled equi-joins at full scale."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp_ntz"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(
            s,
            (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(F.sum(_disc_price()).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), "n_name")
    )


@query(
    "asof_join_user_value_at_checkpoints",
    """
    WITH checkpoints AS (
      SELECT u.user_id, cp.cp_ts
      FROM (SELECT DISTINCT user_id FROM events) u
      CROSS JOIN (SELECT unnest(generate_series(TIMESTAMP '2024-01-05 00:00:00',
                                                TIMESTAMP '2024-01-30 00:00:00',
                                                INTERVAL 5 DAY)) AS cp_ts) cp
    )
    SELECT c.user_id, c.cp_ts, e.ts AS event_ts, e.value AS event_value
    FROM checkpoints c
    LEFT JOIN LATERAL (
      SELECT ts, value FROM events ev
      WHERE ev.user_id = c.user_id AND ev.ts <= c.cp_ts
      ORDER BY ev.ts DESC, ev.event_id DESC LIMIT 1
    ) e ON TRUE
    ORDER BY c.user_id, c.cp_ts
    """,
    "join", "asof", "kiji",
)
def asof_join_user_value_at_checkpoints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (A4's time-range read as a join): the latest event value
    per user at each checkpoint. Implemented with the union+last_value
    carry — one shuffle, no join blow-up (operators/joins.py)."""
    ev = load_table(spark, sf_dir, "events")
    users = ev.select("user_id").distinct()
    cps = spark.sql(
        "SELECT explode(sequence(timestamp_ntz'2024-01-05 00:00:00', "
        "timestamp_ntz'2024-01-30 00:00:00', interval 5 days)) AS cp_ts"
    )
    left = users.crossJoin(F.broadcast(cps))
    # deterministic as-of: ties on ts resolve to the highest event_id,
    # matching the oracle's ORDER BY ts DESC, event_id DESC
    right = ev.select(
        "user_id", "ts", "event_id",
        F.col("ts").alias("event_ts"), F.col("value").alias("event_value"),
    )
    out = asof_join_union(
        left,
        right,
        on=["user_id"],
        left_ts="cp_ts",
        right_ts="ts",
        value_cols=["event_ts", "event_value"],
        tiebreak=["event_id"],
    )
    return out.select("user_id", "cp_ts", "event_ts", "event_value").orderBy(
        "user_id", "cp_ts"
    )


@query(
    "range_join_events_per_day_window",
    """
    WITH days AS (
      SELECT unnest(generate_series(TIMESTAMP '2024-01-01 00:00:00',
                                    TIMESTAMP '2024-01-30 00:00:00',
                                    INTERVAL 1 DAY)) AS day_start
    )
    SELECT day_start, COUNT(event_id) AS n_events,
      CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM days LEFT JOIN events
      ON ts >= day_start AND ts < day_start + INTERVAL 1 DAY
    GROUP BY day_start
    ORDER BY day_start
    """,
    "join", "range", "agg",
)
def range_join_events_per_day_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval/range join: events falling in [day, day+1). The interval
    side is tiny → broadcast; at scale bucket the big side by
    date_trunc so the range predicate stays within a bucket."""
    ev = load_table(spark, sf_dir, "events")
    days = spark.sql(
        "SELECT explode(sequence(timestamp_ntz'2024-01-01 00:00:00', "
        "timestamp_ntz'2024-01-30 00:00:00', interval 1 day)) AS day_start"
    ).withColumn("day_end", F.col("day_start") + F.expr("interval 1 day"))
    joined = range_join(ev, F.broadcast(days), None, "ts", "day_start", "day_end", "inner")
    # left-join semantics for empty days: re-join aggregates onto days
    agg = joined.groupBy("day_start").agg(
        F.count("event_id").alias("n_events"),
        F.sum(_dec2("value")).cast("double").alias("total_value"),
    )
    return (
        days.select("day_start")
        .join(agg, "day_start", "left")
        .withColumn("n_events", F.coalesce("n_events", F.lit(0)))
        .orderBy("day_start")
    )


@query(
    "range_join_bucketed_sessions",
    """
    WITH wins AS (
      SELECT win_id,
        1704067200000 + win_id * 432000000 AS lo_ms,
        1704067200000 + (win_id + 1) * 432000000 AS hi_ms
      FROM (SELECT unnest(generate_series(0, 5)) AS win_id)
    )
    SELECT win_id, COUNT(*) AS n_events,
      COUNT(DISTINCT user_id) AS n_users
    FROM wins JOIN events
      ON CAST(epoch_ms(ts) AS BIGINT) >= lo_ms
     AND CAST(epoch_ms(ts) AS BIGINT) <  hi_ms
    GROUP BY win_id ORDER BY win_id
    """,
    "join", "range", "agg",
)
def range_join_bucketed_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The bucketed interval-join rewrite (operators.joins.
    range_join_bucketed) under the oracle gate: six 5-day windows over
    January 2024, events matched by bucket equi-join + residual interval
    predicate instead of a theta join. At 100 TB this is the difference
    between a hash join on (bucket) and a broadcast-nested-loop over the
    fact table — the bucket explode on the small interval side costs
    interval_len/width rows each."""
    from .operators.joins import range_join_bucketed

    DAY_MS = 86_400_000
    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        (F.unix_micros(F.col("ts").cast("timestamp")) / 1000).cast("long").alias("ts_ms"),
    )
    wins = spark.sql(
        "SELECT explode(sequence(0, 5)) AS win_id"
    ).select(
        "win_id",
        (F.lit(1_704_067_200_000) + F.col("win_id").cast("long") * (5 * DAY_MS)).alias("lo_ms"),
        (F.lit(1_704_067_200_000) + (F.col("win_id").cast("long") + 1) * (5 * DAY_MS)).alias("hi_ms"),
    )
    joined = range_join_bucketed(ev, wins, None, "ts_ms", "lo_ms", "hi_ms", DAY_MS)
    return (
        joined.groupBy("win_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .orderBy("win_id")
    )


# ---------------------------------------------------------------------------
# Set operations
# ---------------------------------------------------------------------------

@query(
    "setop_union_all_parties",
    """
    SELECT c_custkey AS id, c_name AS name, 'customer' AS kind FROM customer
    UNION ALL
    SELECT s_suppkey AS id, s_name AS name, 'supplier' AS kind FROM supplier
    ORDER BY kind, id
    """,
    "setop",
)
def setop_union_all_parties(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("id"), F.col("c_name").alias("name"), F.lit("customer").alias("kind")
    )
    s = load_table(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("id"), F.col("s_name").alias("name"), F.lit("supplier").alias("kind")
    )
    return c.unionAll(s).orderBy("kind", "id")


@query(
    "setop_union_distinct_nationkeys",
    """
    SELECT c_nationkey AS nationkey FROM customer
    UNION
    SELECT s_nationkey AS nationkey FROM supplier
    ORDER BY nationkey
    """,
    "setop",
)
def setop_union_distinct_nationkeys(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.union(s).distinct().orderBy("nationkey")


@query(
    "setop_intersect_nationkeys",
    """
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey AS nationkey FROM supplier
    ORDER BY nationkey
    """,
    "setop",
)
def setop_intersect_nationkeys(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.intersect(s).orderBy("nationkey")


@query(
    "setop_except_nationkeys",
    """
    SELECT c_nationkey AS nationkey FROM customer
    EXCEPT
    SELECT s_nationkey AS nationkey FROM supplier
    ORDER BY nationkey
    """,
    "setop",
)
def setop_except_nationkeys(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    # subtract == EXCEPT (set semantics); exceptAll would be bag difference
    return c.subtract(s).orderBy("nationkey")


@query(
    "setop_intersect_all_priorities",
    """
    SELECT o_orderpriority AS priority FROM orders
      WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND o_orderdate <  TIMESTAMP '1996-02-01 00:00:00'
    INTERSECT ALL
    SELECT o_orderpriority AS priority FROM orders
      WHERE o_orderdate >= TIMESTAMP '1996-02-01 00:00:00'
        AND o_orderdate <  TIMESTAMP '1996-03-01 00:00:00'
    ORDER BY priority
    """,
    "setop",
)
def setop_intersect_all_priorities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL — bag semantics: each priority survives
    min(count_jan, count_feb) times. Catalyst plans it as a counted
    semi-join, one shuffle per side on the value."""
    o = load_table(spark, sf_dir, "orders")
    jan = o.filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1996-02-01 00:00:00").cast("timestamp_ntz"))
    ).select(F.col("o_orderpriority").alias("priority"))
    feb = o.filter(
        (F.col("o_orderdate") >= F.lit("1996-02-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1996-03-01 00:00:00").cast("timestamp_ntz"))
    ).select(F.col("o_orderpriority").alias("priority"))
    return jan.intersectAll(feb).orderBy("priority")


@query(
    "setop_except_all_priorities",
    """
    SELECT o_orderpriority AS priority FROM orders
      WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND o_orderdate <  TIMESTAMP '1996-02-01 00:00:00'
    EXCEPT ALL
    SELECT o_orderpriority AS priority FROM orders
      WHERE o_orderdate >= TIMESTAMP '1996-02-01 00:00:00'
        AND o_orderdate <  TIMESTAMP '1996-03-01 00:00:00'
    ORDER BY priority
    """,
    "setop",
)
def setop_except_all_priorities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL — bag difference: each priority survives
    max(0, count_jan - count_feb) times."""
    o = load_table(spark, sf_dir, "orders")
    jan = o.filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1996-02-01 00:00:00").cast("timestamp_ntz"))
    ).select(F.col("o_orderpriority").alias("priority"))
    feb = o.filter(
        (F.col("o_orderdate") >= F.lit("1996-02-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1996-03-01 00:00:00").cast("timestamp_ntz"))
    ).select(F.col("o_orderpriority").alias("priority"))
    return jan.exceptAll(feb).orderBy("priority")


@query(
    "distinct_segments_per_nation",
    "SELECT DISTINCT c_nationkey, c_mktsegment FROM customer ORDER BY c_nationkey, c_mktsegment",
    "setop", "dedup",
)
def distinct_segments_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "customer")
        .select("c_nationkey", "c_mktsegment")
        .dropDuplicates()
        .orderBy("c_nationkey", "c_mktsegment")
    )


# ---------------------------------------------------------------------------
# Window analytics
# ---------------------------------------------------------------------------

@query(
    "window_lag_lead_user_values",
    """
    SELECT user_id, event_id, value,
      LAG(value)  OVER w AS prev_value,
      LEAD(value) OVER w AS next_value,
      value - LAG(value) OVER w AS delta
    FROM events
    WHERE user_id < 10
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ORDER BY user_id, event_id
    """,
    "window",
)
def window_lag_lead_user_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 10)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.select(
            "user_id",
            "event_id",
            "value",
            F.lag("value").over(w).alias("prev_value"),
            F.lead("value").over(w).alias("next_value"),
            (F.col("value") - F.lag("value").over(w)).alias("delta"),
        )
        .orderBy("user_id", "event_id")
    )


@query(
    "window_running_order_total",
    """
    SELECT o_custkey, o_orderkey, o_orderdate,
      CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
        OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
        AS running_total,
      COUNT(*) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        AS order_seq
    FROM orders WHERE o_custkey < 50
    ORDER BY o_custkey, order_seq
    """,
    "window",
)
def window_running_order_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate-over-frame window (rowsBetween). Decimal-sum trick keeps
    the running total exact so parallel frame evaluation matches the
    oracle."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") < 50)
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            "o_orderdate",
            F.sum(_dec2("o_totalprice")).over(w).cast("double").alias("running_total"),
            F.count(F.lit(1)).over(w).alias("order_seq"),
        )
        .orderBy("o_custkey", "order_seq")
    )


@query(
    "window_rank_dense_ntile",
    """
    SELECT p_partkey, p_brand, p_retailprice,
      RANK()         OVER w AS rnk,
      DENSE_RANK()   OVER w AS drnk,
      NTILE(4)       OVER w AS quartile,
      FIRST_VALUE(p_partkey) OVER w AS cheapest_key
    FROM part
    WINDOW w AS (PARTITION BY p_brand ORDER BY p_retailprice, p_partkey)
    ORDER BY p_brand, p_retailprice, p_partkey
    """,
    "window",
)
def window_rank_dense_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    w = Window.partitionBy("p_brand").orderBy("p_retailprice", "p_partkey")
    return (
        p.select(
            "p_partkey",
            "p_brand",
            "p_retailprice",
            F.rank().over(w).alias("rnk"),
            F.dense_rank().over(w).alias("drnk"),
            F.ntile(4).over(w).alias("quartile"),
            F.first("p_partkey").over(w).alias("cheapest_key"),
        )
        .orderBy("p_brand", "p_retailprice", "p_partkey")
    )


# ---------------------------------------------------------------------------
# Sorts / top-k / having / grouping sets / cube
# ---------------------------------------------------------------------------

@query(
    "sort_limit_largest_orders",
    """
    SELECT o_orderkey, o_totalprice, o_orderdate FROM orders
    ORDER BY o_totalprice DESC, o_orderkey LIMIT 25
    """,
    "sort", "topk",
)
def sort_limit_largest_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k: Spark plans TakeOrderedAndProject — per-partition
    heaps + driver merge, no full sort at any scale."""
    return (
        load_table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_totalprice", "o_orderdate")
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(25)
    )


@query(
    "having_big_customers",
    """
    SELECT o_custkey, COUNT(*) AS n_orders,
      CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_spent
    FROM orders GROUP BY o_custkey
    HAVING COUNT(*) >= 3 AND SUM(CAST(o_totalprice AS DECIMAL(18,2))) > 50000
    ORDER BY o_custkey
    """,
    "agg",
)
def having_big_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(_dec2("o_totalprice")).alias("__total_dec__"),
        )
        .filter((F.col("n_orders") >= 3) & (F.col("__total_dec__") > 50000))
        .select("o_custkey", "n_orders", F.col("__total_dec__").cast("double").alias("total_spent"))
        .orderBy("o_custkey")
    )


@query(
    "cube_orders_status_priority",
    """
    SELECT o_orderstatus, o_orderpriority,
      GROUPING(o_orderstatus, o_orderpriority) AS grp,
      COUNT(*) AS n,
      CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    -- Spark emits NO grouping-set rows over empty input (DuckDB emits the
    -- grand-total row with count 0, per the SQL standard); COUNT(*) > 0
    -- makes the oracle Spark-equivalent in every regime and is a no-op on
    -- non-empty data (only the empty grand total can have a zero count)
    HAVING COUNT(*) > 0
    ORDER BY grp, o_orderstatus, o_orderpriority
    """,
    "agg", "rollup",
)
def cube_orders_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.grouping_id().alias("grp"),
            F.count(F.lit(1)).alias("n"),
            F.sum(_dec2("o_totalprice")).cast("double").alias("total"),
        )
        .select("o_orderstatus", "o_orderpriority", "grp", "n", "total")
        .orderBy("grp", "o_orderstatus", "o_orderpriority")
    )


@query(
    "grouping_sets_nation_and_segment",
    """
    SELECT n_name, c_mktsegment, COUNT(*) AS n_customers
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    GROUP BY GROUPING SETS ((n_name), (c_mktsegment))
    ORDER BY n_name, c_mktsegment
    """,
    "agg", "rollup",
)
def grouping_sets_nation_and_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = load_table(spark, sf_dir, "customer").join(
        F.broadcast(load_table(spark, sf_dir, "nation")),
        F.col("c_nationkey") == F.col("n_nationkey"),
    )
    df.createOrReplaceTempView("__gs_cust_nation__")
    return spark.sql(
        """
        SELECT n_name, c_mktsegment, COUNT(*) AS n_customers
        FROM __gs_cust_nation__
        GROUP BY GROUPING SETS ((n_name), (c_mktsegment))
        ORDER BY n_name, c_mktsegment
        """
    )


@query(
    "agg_count_distinct_suppliers",
    """
    SELECT l_returnflag,
      COUNT(DISTINCT l_suppkey) AS n_supps,
      COUNT(DISTINCT l_partkey) AS n_parts,
      COUNT(*) AS n_rows
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
    "agg",
)
def agg_count_distinct_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_suppkey").alias("n_supps"),
            F.countDistinct("l_partkey").alias("n_parts"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "agg_approx_count_distinct_customers",
    """
    SELECT n_name, COUNT(DISTINCT c_custkey) AS n_exact, 1 AS approx_ok
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name ORDER BY n_name
    """,
    "agg", "approx",
)
def agg_approx_count_distinct_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (SURVEY §2.C): HyperLogLog++ distinct
    customers per nation. Sketch values differ across engines by design,
    so the hash-checked output carries (a) the exact count and (b) an
    in-engine tolerance assertion that the HLL estimate lands within 15%
    (3× the 5% rsd) of exact — the oracle pins it to the literal 1.
    Scale: this is THE distinct-count at 100 TB — the sketch partial-aggs
    map-side (fixed-size, mergeable) where exact COUNT DISTINCT shuffles
    every distinct key."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.countDistinct("c_custkey").alias("n_exact"),
            F.approx_count_distinct("c_custkey", 0.05).alias("n_approx"),
        )
        .select(
            "n_name",
            "n_exact",
            (
                F.abs(F.col("n_approx") - F.col("n_exact"))
                <= F.col("n_exact") * F.lit(0.15)
            )
            .cast("int")
            .alias("approx_ok"),
        )
        .orderBy("n_name")
    )


@query(
    "agg_stddev_via_exact_sums",
    """
    SELECT p_brand,
      COUNT(*) AS n,
      CAST(SUM(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE) AS s1,
      CAST(SUM(CAST(p_retailprice*p_retailprice AS DECIMAL(28,4))) AS DOUBLE) AS s2,
      sqrt((CAST(SUM(CAST(p_retailprice*p_retailprice AS DECIMAL(28,4))) AS DOUBLE)
            - CAST(SUM(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE)
              * CAST(SUM(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*))
           / (COUNT(*) - 1)) AS stddev_price
    FROM part GROUP BY p_brand HAVING COUNT(*) > 1 ORDER BY p_brand
    """,
    "agg",
)
def agg_stddev_via_exact_sums(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample stddev from exact decimal moments — order-independent, so it
    hash-matches the serial oracle (plain stddev over doubles would not)."""
    p = load_table(spark, sf_dir, "part")
    s1d = F.sum(_dec2("p_retailprice")).cast("double")
    s2d = F.sum((F.col("p_retailprice") * F.col("p_retailprice")).cast("decimal(28,4)")).cast("double")
    n = F.count(F.lit(1))
    return (
        p.groupBy("p_brand")
        .agg(
            n.alias("n"),
            s1d.alias("s1"),
            s2d.alias("s2"),
            F.sqrt((s2d - s1d * s1d / n) / (n - F.lit(1))).alias("stddev_price"),
        )
        .filter(F.col("n") > 1)
        .orderBy("p_brand")
    )


@query(
    "agg_bool_or_needs_reread",
    """
    SELECT user_id,
      bool_or(event_type = 'error') AS needs_reread,
      bool_and(value IS NOT NULL) AS all_valued,
      count(*) AS n_events
    FROM events GROUP BY user_id ORDER BY user_id
    """,
    "agg", "kiji",
)
def agg_bool_or_needs_reread(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A12 — the reference's only aggregation: boolean OR over per-column
    'needs reread' signals (GetFuture.call() ||-fold,
    InternalFreshKijiTableReader.java:624-661) — expressed relationally as
    bool_or/bool_and per entity. One partial+final agg; booleans shuffle
    as single bytes."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id")
        .agg(
            F.bool_or(F.col("event_type") == "error").alias("needs_reread"),
            F.bool_and(F.col("value").isNotNull()).alias("all_valued"),
            F.count("*").alias("n_events"),
        )
        .orderBy("user_id")
    )


@query(
    "window_range_frame_value_sums",
    """
    SELECT event_id, user_id, value,
      CAST(sum(CAST(value AS DECIMAL(18,2)))
        OVER (PARTITION BY user_id ORDER BY event_id
              RANGE BETWEEN 100 PRECEDING AND CURRENT ROW) AS DOUBLE)
        AS recent_value_sum
    FROM events
    WHERE user_id < 5
    ORDER BY user_id, event_id
    """,
    "window",
)
def window_range_frame_value_sums(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE-frame window (§2.C): per-user sum over a VALUE range of the
    ordering key (event ids within 100), not a row count — rangeBetween,
    the frame type rowsBetween can't express. Probe-limited to 5 users;
    partitions by user so frames never cross executors."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 5)
    w = (
        Window.partitionBy("user_id")
        .orderBy("event_id")
        .rangeBetween(-100, Window.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        "value",
        F.sum(F.col("value").cast("decimal(18,2)"))
        .over(w)
        .cast("double")
        .alias("recent_value_sum"),
    ).orderBy("user_id", "event_id")


@query(
    "window_percent_rank_cume_dist",
    """
    SELECT c_custkey, c_nationkey,
      -- NULLS FIRST: Spark's ASC window default; DuckDB defaults NULLS
      -- LAST, so the explicit clause keeps ranks aligned when balances
      -- can be NULL (no-op on data without nulls)
      round(percent_rank() OVER (PARTITION BY c_nationkey
                                 ORDER BY c_acctbal NULLS FIRST, c_custkey), 9)
        AS pct_rank,
      round(cume_dist() OVER (PARTITION BY c_nationkey
                              ORDER BY c_acctbal NULLS FIRST, c_custkey), 9)
        AS cume_d
    FROM customer WHERE c_nationkey < 3
    ORDER BY c_nationkey, c_custkey
    """,
    "window",
)
def window_percent_rank_cume_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relative-position window functions (§2.C ranking tail):
    percent_rank and cume_dist per nation over account balance — the
    normalized-rank primitives quantile bucketing and percentile
    feature-engineering build on. Ordering carries a c_custkey tiebreak
    so rank positions are total; values rounded to 9 dp so the two
    engines' division cannot differ in the last ulp.
    Scale: one shuffle on the partition key, same as any ranking window;
    nation-keyed partitions are balanced by design."""
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_nationkey") < 3)
    w = Window.partitionBy("c_nationkey").orderBy("c_acctbal", "c_custkey")
    return c.select(
        "c_custkey",
        "c_nationkey",
        F.round(F.percent_rank().over(w), 9).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 9).alias("cume_d"),
    ).orderBy("c_nationkey", "c_custkey")


@query(
    "join_null_safe_returnflag",
    """
    WITH a AS (
      SELECT NULLIF(l_returnflag, 'N') AS rf, count(*) AS n_rows
      FROM lineitem GROUP BY NULLIF(l_returnflag, 'N')
    ), b AS (
      SELECT NULLIF(l_returnflag, 'N') AS rf,
        CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS BIGINT) AS sum_qty
      FROM lineitem GROUP BY NULLIF(l_returnflag, 'N')
    )
    SELECT a.rf, a.n_rows, b.sum_qty
    FROM a JOIN b ON a.rf IS NOT DISTINCT FROM b.rf
    ORDER BY a.rf NULLS FIRST
    """,
    "join",
)
def join_null_safe_returnflag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equi-join (§2.C joins tail): `<=>` / IS NOT DISTINCT
    FROM, where NULL keys match each other instead of dropping out —
    required when a join key legitimately carries NULL as a category
    (here: return flag 'N' nulled to model unknown). A plain equi-join
    silently loses the NULL group; the null-safe row count proves it
    survived.
    Scale: null-safe equality still hash-partitions both sides (NULL
    hashes to one partition — if NULLs dominate, pre-split them as a
    skew key; see operators/skew.py)."""
    li = load_table(spark, sf_dir, "lineitem")
    rf = F.nullif(F.col("l_returnflag"), F.lit("N")).alias("rf")
    a = li.groupBy(rf).agg(F.count(F.lit(1)).alias("n_rows"))
    b = li.groupBy(rf).agg(
        F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("bigint").alias("sum_qty")
    )
    return (
        a.join(b, a["rf"].eqNullSafe(b["rf"]))
        .select(a["rf"], "n_rows", "sum_qty")
        .orderBy(F.asc_nulls_first("rf"))
    )


@query(
    "recursive_cte_month_spine_orders",
    """
    WITH RECURSIVE spine(m, hi) AS (
      SELECT CAST(date_trunc('month', MIN(o_orderdate)) AS DATE),
             CAST(date_trunc('month', MAX(o_orderdate)) AS DATE)
      FROM orders
      UNION ALL
      SELECT CAST(m + INTERVAL 1 MONTH AS DATE), hi FROM spine WHERE m < hi
    )
    SELECT strftime(s.m, '%Y-%m') AS month, COUNT(o.o_orderkey) AS n_orders
    FROM spine s LEFT JOIN orders o
      ON CAST(date_trunc('month', o.o_orderdate) AS DATE) = s.m
    GROUP BY s.m ORDER BY month
    """,
    "relational", "recursive-cte",
)
def recursive_cte_month_spine_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE (§2.C extension; Spark 4 WITH RECURSIVE): generate a
    complete month spine from MIN to MAX order date, then LEFT JOIN order
    counts onto it — the gap-free calendar shape reports need, expressed
    as the standard SQL recursion instead of a driver-side loop.

    Scale: recursion depth = number of months (bounded by the data's time
    span, ~84 here), each step a one-row projection — the iterative part
    is O(months) driver-scheduled tiny jobs, never data-sized. MAX
    RECURSION LEVEL is raised to 10000 (≈830 years of months): Spark's
    default cap is 100 levels, and the ts-edge regime proved one 1970
    sentinel date in a 1998 corpus blows past it (r6) — a 100 TB ingest
    WILL contain sentinel/corrupt dates, and the spine must absorb them
    rather than kill the report. BOTH date
    bounds are computed in the anchor's single orders pass and the upper
    bound rides along as recursion state: a scalar subquery in the
    recursive member's WHERE would re-execute a full orders scan+agg per
    step (measured: 13.8 s vs 0.9 s at sf0.1 — O(months) table scans).
    The spine (~100 rows) broadcasts into the join against orders, so the
    only data-sized operation is one pass over orders pre-aggregated on
    the month key (partial agg before the shuffle)."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        WITH RECURSIVE spine(m, hi) MAX RECURSION LEVEL 10000 AS (
          SELECT CAST(date_trunc('month', MIN(o_orderdate)) AS DATE),
                 CAST(date_trunc('month', MAX(o_orderdate)) AS DATE)
          FROM orders
          UNION ALL
          SELECT add_months(m, 1), hi FROM spine WHERE m < hi
        )
        SELECT date_format(s.m, 'yyyy-MM') AS month, COUNT(o.o_orderkey) AS n_orders
        FROM spine s LEFT JOIN orders o
          ON CAST(date_trunc('month', o.o_orderdate) AS DATE) = s.m
        GROUP BY s.m ORDER BY month
        """
    )


@query(
    "asof_join_pairwise_event_probes",
    """
    WITH probes AS (
      SELECT event_id, user_id, ts FROM events WHERE event_id % 97 = 0
    ), r AS (
      SELECT user_id, ts, MAX(value) AS value FROM events GROUP BY user_id, ts
    )
    SELECT p.event_id, p.user_id, m.value AS asof_value
    FROM probes p
    LEFT JOIN LATERAL (
      SELECT value FROM r WHERE r.user_id = p.user_id AND r.ts <= p.ts
      ORDER BY r.ts DESC LIMIT 1
    ) m ON TRUE
    ORDER BY p.event_id
    """,
    "join", "asof",
)
def asof_join_pairwise_event_probes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PAIRWISE as-of join variant (operators/joins.asof_join) on a
    deterministic ~1% probe sample, driver-checked alongside the union
    variant: equi-join on user_id + backward time inequality + per-left-row
    window keyed on the caller-supplied unique event_id — the
    retry-deterministic path (round-4: a synthetic
    monotonically_increasing_id can renumber on stage retry; a real key
    cannot). Right side is deduped to unique (user_id, ts) so the single
    match is well-defined on both engines.

    Scale: both sides shuffle once on user_id; the dedup window's state is
    one row per (left row, match), with the window key one long column.
    Use asof_join_union instead when the right side is dense per key (no
    join fan-out there); this shape wins when matches per key are few."""
    from .operators.joins import asof_join

    ev = load_table(spark, sf_dir, "events")
    probes = ev.filter(F.col("event_id") % 97 == 0).select(
        "event_id", "user_id", "ts"
    )
    r = ev.groupBy("user_id", "ts").agg(F.max("value").alias("value"))
    out = asof_join(probes, r, ["user_id"], "ts", "ts", left_id="event_id")
    return out.select(
        "event_id", "user_id", F.col("value").alias("asof_value")
    ).orderBy("event_id")


@query(
    "agg_argextreme_median_battery",
    """
    WITH k AS (
      SELECT c_nationkey, c_name, c_acctbal,
        lpad(CAST(CAST(ROUND(c_acctbal * 100) AS BIGINT) + 1000000 AS VARCHAR),
             12, '0') || c_name AS ordkey
      FROM customer
    )
    SELECT c_nationkey,
      arg_max(c_name, ordkey) AS richest_customer,
      arg_min(c_name, ordkey) AS poorest_customer,
      ROUND(median(c_acctbal), 6) AS median_acctbal
    FROM k GROUP BY c_nationkey ORDER BY c_nationkey
    """,
    "agg", "relational",
)
def agg_argextreme_median_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arg-extreme + median aggregates (§2.C): per nation, the customer
    holding the max/min balance (max_by/min_by) and the exact interpolated
    median balance. Determinism under ties: the ordering key is the cent
    balance zero-padded to fixed width (offset keeps it non-negative so
    lexicographic == numeric) concatenated with the unique name — both
    engines order identically, so arg extremes can never disagree on a
    tied balance.

    Scale: all three are single partial+final hash aggregates except
    median, which buffers per-group values — bounded here by customers
    per nation; for uncountable groups use approx_percentile(0.5)."""
    c = load_table(spark, sf_dir, "customer")
    ordkey = F.concat(
        F.lpad(
            (F.round(F.col("c_acctbal") * 100).cast("bigint") + 1_000_000).cast(
                "string"
            ),
            12,
            "0",
        ),
        F.col("c_name"),
    )
    return (
        c.withColumn("ordkey", ordkey)
        .groupBy("c_nationkey")
        .agg(
            F.max_by("c_name", F.col("ordkey")).alias("richest_customer"),
            F.min_by("c_name", F.col("ordkey")).alias("poorest_customer"),
            F.round(F.median("c_acctbal"), 6).alias("median_acctbal"),
        )
        .orderBy("c_nationkey")
    )


@query(
    "agg_empty_relation_semantics",
    """
    SELECT COUNT(*) AS n_rows,
      COUNT(l_orderkey) AS n_vals,
      CAST(SUM(l_quantity) AS DOUBLE) AS sum_empty,
      MAX(l_returnflag) AS max_empty,
      CAST(COALESCE(SUM(l_quantity), 0) AS DOUBLE) AS sum_coalesced,
      CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS n_distinct_empty
    FROM lineitem WHERE l_orderkey < 0
    """,
    "agg", "relational", "edge-case",
)
def agg_empty_relation_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI empty-relation aggregate semantics (§2.C edge case): a
    grand-total aggregate over zero rows yields exactly ONE row with
    COUNT = 0 and NULL for SUM/MAX — the corner where engines (and
    hand-rolled pipelines) classically diverge. Pinned against the
    oracle so the engine's no-GROUP-BY aggregation path can't silently
    drift to zero-row output or 0-instead-of-NULL sums.

    Scale: the l_orderkey < 0 predicate is pushed to the scan, which
    prunes every row group by min/max stats — the query reads metadata
    only, the degenerate-but-important fast path for always-false
    filters."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 0)
    return li.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("l_orderkey").alias("n_vals"),
        F.sum("l_quantity").cast("double").alias("sum_empty"),
        F.max("l_returnflag").alias("max_empty"),
        F.coalesce(F.sum("l_quantity"), F.lit(0)).cast("double").alias("sum_coalesced"),
        F.count_distinct(F.col("l_suppkey")).alias("n_distinct_empty"),
    )


@query(
    "join_null_key_semantics_battery",
    """
    WITH l AS (
      SELECT CASE WHEN user_id % 7 = 0 THEN NULL ELSE user_id END AS k,
        COUNT(*) AS n
      FROM events WHERE user_id < 60 GROUP BY k
    ), r AS (
      SELECT CASE WHEN c_custkey % 5 = 0 THEN NULL ELSE c_custkey END AS k
      FROM customer WHERE c_custkey < 60
    )
    SELECT 'anti' AS join_type, COUNT(*) AS n_rows FROM l
      WHERE NOT EXISTS (SELECT 1 FROM r WHERE r.k = l.k)
    UNION ALL
    SELECT 'full_null_rows', COUNT(*) FROM l FULL JOIN r ON l.k = r.k
      WHERE l.k IS NULL OR r.k IS NULL
    UNION ALL
    SELECT 'inner', COUNT(*) FROM l JOIN r ON l.k = r.k
    UNION ALL
    SELECT 'left_all', COUNT(*) FROM l LEFT JOIN r ON l.k = r.k
    UNION ALL
    SELECT 'nullsafe_inner', COUNT(*) FROM l JOIN r ON l.k IS NOT DISTINCT FROM r.k
    UNION ALL
    SELECT 'semi', COUNT(*) FROM l
      WHERE EXISTS (SELECT 1 FROM r WHERE r.k = l.k)
    ORDER BY join_type
    """,
    "join", "semantics",
)
def join_null_key_semantics_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL join-key semantics pinned across six join shapes — the
    rules every engine must agree on and engineers routinely misremember:
    a NULL key matches NOTHING under `=` (so inner/semi drop it, anti
    KEEPS it — the classic NOT IN trap), outer joins preserve null-key
    rows unmatched on the other side, and only the null-safe equality
    (`<=>` / IS NOT DISTINCT FROM) lets NULL meet NULL. Both sides
    derive keys with a deterministic %-to-NULL mapping so every class
    (null-left, null-right, matched, unmatched) is populated; the six
    counts pin the full behavior matrix against the oracle.

    Scale: each leg is a broadcast join over pre-aggregated key sets;
    the null-safe leg is the one that hashes NULL as a real key value —
    worth knowing because at 100 TB a null-heavy column under `<=>`
    funnels every NULL row into ONE hash bucket (salt it or pre-split
    the null partition)."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 60)
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") < 60)
    left = (
        ev.select(
            F.when(F.col("user_id") % 7 == 0, F.lit(None))
            .otherwise(F.col("user_id"))
            .alias("k")
        )
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    right = c.select(
        F.when(F.col("c_custkey") % 5 == 0, F.lit(None))
        .otherwise(F.col("c_custkey"))
        .alias("k")
    )

    def cnt(df: DataFrame, label: str) -> DataFrame:
        return df.agg(
            F.lit(label).alias("join_type"), F.count(F.lit(1)).alias("n_rows")
        )

    rows = [
        cnt(left.join(right, left.k == right.k, "anti"), "anti"),
        cnt(
            left.join(right.withColumnRenamed("k", "rk"), F.col("k") == F.col("rk"), "full")
            .filter(F.col("k").isNull() | F.col("rk").isNull()),
            "full_null_rows",
        ),
        cnt(left.join(right, left.k == right.k, "inner"), "inner"),
        cnt(left.join(right.withColumnRenamed("k", "rk"), F.col("k") == F.col("rk"), "left"), "left_all"),
        cnt(
            left.join(right.withColumnRenamed("k", "rk"), F.col("k").eqNullSafe(F.col("rk")), "inner"),
            "nullsafe_inner",
        ),
        cnt(left.join(right, left.k == right.k, "semi"), "semi"),
    ]
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out.orderBy("join_type")


@query(
    "stats_theil_sen_slope",
    """
    WITH pts AS (
      SELECT c_nationkey, c_custkey AS x, c_acctbal AS y
      FROM customer WHERE c_custkey < 150
    ), slopes AS (
      SELECT a.c_nationkey,
        (b.y - a.y) / CAST(b.x - a.x AS DOUBLE) AS slope
      FROM pts a JOIN pts b
        ON a.c_nationkey = b.c_nationkey AND a.x < b.x
    )
    SELECT c_nationkey, COUNT(*) AS n_pairs,
      MEDIAN(slope) AS theil_sen_slope
    FROM slopes GROUP BY c_nationkey
    ORDER BY c_nationkey
    """,
    "stats", "agg",
)
def stats_theil_sen_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-Sen robust slope per nation — the median of all pairwise
    slopes, the estimator that shrugs off the outliers that wreck OLS
    (stats_linear_regression_price_qty is the OLS counterpart). Each
    pairwise slope is ONE double division (exact, order-free), and the
    exact median either selects an element or averages the two middle
    ones — deterministic on both engines, so no rounding shim is
    needed anywhere.

    Scale: pairwise slopes are O(n²) PER GROUP by definition — the
    estimator is meant for small-n panels (the bounded probe set here);
    at large n the standard move is Theil-Sen over a deterministic
    md5-sampled pair subset (the sample_deterministic_documents
    pattern), identical plan shape. The in-group pair join is an
    equi-join on the group key with the a.x < b.x residual — never a
    global cross join."""
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") < 150)
    pts = c.select(
        "c_nationkey", F.col("c_custkey").alias("x"), F.col("c_acctbal").alias("y")
    )
    a = pts.alias("a")
    b = pts.alias("b")
    slopes = (
        a.join(
            b,
            (F.col("a.c_nationkey") == F.col("b.c_nationkey"))
            & (F.col("a.x") < F.col("b.x")),
        )
        .select(
            F.col("a.c_nationkey").alias("c_nationkey"),
            (
                (F.col("b.y") - F.col("a.y"))
                / (F.col("b.x") - F.col("a.x")).cast("double")
            ).alias("slope"),
        )
    )
    return (
        slopes.groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.median("slope").alias("theil_sen_slope"),
        )
        .orderBy("c_nationkey")
    )


@query(
    "window_running_distinct_types",
    """
    SELECT user_id, event_id,
      COUNT(DISTINCT event_type) OVER (
        PARTITION BY user_id ORDER BY ts, event_id
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS n_types_seen
    FROM events WHERE user_id < 30
    ORDER BY user_id, event_id
    """,
    "window",
)
def window_running_distinct_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running DISTINCT count over a window — a shape Spark's window
    engine refuses natively (COUNT(DISTINCT) OVER throws
    DISTINCT_WINDOW_FUNCTION_UNSUPPORTED). Implemented (round 6) in the
    SCALABLE first-seen-flag form, which is what a library user should
    copy at 100×: flag each row that is the first occurrence of its
    (user, type) — computed with a lag() comparison under a per-user
    sort by (type, ts, id), O(1) window state — then running-SUM the
    flags under the cumulative (ts, id) frame. Both windows partition
    on user_id, so Spark satisfies them with ONE exchange and two
    in-partition sorts (plan-gated: single Exchange, no collect_set in
    tests/test_plans.py); per-row state never grows with the distinct
    domain, unlike the size(collect_set() OVER) translation this
    replaces, whose frame set is O(distinct values) per row and which
    survives only while the domain is tiny. The oracle states the
    semantics directly as COUNT(DISTINCT) OVER.

    NULL semantics match COUNT(DISTINCT): NULL types never flag. The
    NULLS FIRST per-user sort makes the lag() seed correct — the first
    NON-null row of a user sees lag ∈ {NULL-type row, nothing} and
    flags either way, as the true first occurrence of its type."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 30)
    w_type = Window.partitionBy("user_id").orderBy(
        F.asc_nulls_first("event_type"), "ts", "event_id"
    )
    first_seen = F.when(
        F.col("event_type").isNotNull()
        & (
            F.lag("event_type").over(w_type).isNull()
            | (F.lag("event_type").over(w_type) != F.col("event_type"))
        ),
        1,
    ).otherwise(0)
    w_run = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        ev.select("user_id", "event_id", "ts", first_seen.alias("first_seen"))
        .select(
            "user_id",
            "event_id",
            F.sum("first_seen").over(w_run).alias("n_types_seen"),
        )
        .orderBy("user_id", "event_id")
    )
