"""Query registry — every operator from SURVEY.md §2 declared as a named
query with (a) an idiomatic-PySpark implementation and (b) an ANSI-SQL
oracle for DuckDB hash-matching.

Conventions (the correctness gate depends on these):

- Every computed column is aliased IDENTICALLY in the Spark plan and the
  oracle SQL.
- Double aggregation is made order-independent by summing in DECIMAL
  (exact) and casting the result to DOUBLE: partial/final aggregation
  order then cannot change the value, so Spark (parallel) and DuckDB
  (serial) agree bit-for-bit. Products of 2-dp monetary values are cast
  to DECIMAL with enough scale (4 or 6) to hold the exact result before
  summing.
- Top-k queries always carry a deterministic tiebreaker key.

Scale notes are inline per query; the common ones: dimension joins are
broadcast (customer/nation/region/part/supplier are tiny vs lineitem),
aggregations rely on Catalyst partial+final, and window functions
partition by high-cardinality keys so no single partition explodes.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .sources import load_table


@dataclass
class QuerySpec:
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # ANSI SQL for DuckDB; None → rows-only check
    tags: tuple[str, ...] = field(default_factory=tuple)


QUERIES: dict[str, QuerySpec] = {}


def query(name: str, oracle: str | None, *tags: str):
    def deco(fn):
        QUERIES[name] = QuerySpec(fn=fn, oracle=oracle, tags=tags)
        return fn

    return deco


def _dec2(c: str | F.Column) -> F.Column:
    col = F.col(c) if isinstance(c, str) else c
    return col.cast("decimal(18,2)")


def _disc_price() -> F.Column:
    # exact 4-dp product of two 2-dp monetary values
    return (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,4)")


def _charge() -> F.Column:
    return (
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax"))
    ).cast("decimal(18,6)")


# ---------------------------------------------------------------------------
# Aggregation surface (SURVEY §2.C "Aggregation")
# ---------------------------------------------------------------------------

@query(
    "q1_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
      CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
      CAST(ROUND(SUM(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(18,4))), 2) AS DOUBLE) AS sum_disc_price,
      CAST(ROUND(SUM(CAST(l_extendedprice*(1-l_discount)*(1+l_tax) AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_charge,
      CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_price,
      CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_disc,
      COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
    "agg",
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: scan-heavy grouped aggregation. Scale: the filter and
    the 7-column projection push to the parquet scan; partial aggregation
    (16 groups) makes the shuffle negligible at any SF.

    The high-scale decimal sums (disc_price at 4 dp, charge at 6 dp)
    round to 2 dp BEFORE their double cast (round-6 hardening): a
    6-dp group sum crosses 2^53 unscaled around sf0.13, past which
    DECIMAL→DOUBLE conversion is engine-dependent in the last ulp (see
    scalar_try_functions_battery, where the sf0.1 null sweep proved the
    divergence is real). Rounding first keeps the cast bit-identical at
    any SF while preserving monetary (cent) precision."""
    li = load_table(spark, sf_dir, "lineitem")
    cnt = F.count(F.lit(1))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(_dec2("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(_dec2("l_extendedprice")).cast("double").alias("sum_base_price"),
            F.round(F.sum(_disc_price()), 2).cast("double").alias("sum_disc_price"),
            F.round(F.sum(_charge()), 2).cast("double").alias("sum_charge"),
            (F.sum(_dec2("l_quantity")).cast("double") / cnt).alias("avg_qty"),
            (F.sum(_dec2("l_extendedprice")).cast("double") / cnt).alias("avg_price"),
            (F.sum(_dec2("l_discount")).cast("double") / cnt).alias("avg_disc"),
            cnt.alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@query(
    "q3_shipping_priority",
    """
    SELECT l_orderkey,
      CAST(SUM(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
      o_orderdate, o_orderpriority
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l_shipdate  > TIMESTAMP '1996-03-15 00:00:00'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
    "join", "agg", "topk",
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape. Scale: no forced broadcast — orders and customer
    are fact-sized at 100 TB, so a broadcast HINT would be a driver OOM;
    at small scale AQE broadcasts them anyway (both under the 10 MB
    threshold here, so lineitem still never shuffles), and at full scale
    the same plan degrades gracefully to a shuffled join on the
    equi-keys instead of failing."""
    cust = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15 00:00:00").cast("timestamp_ntz")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1996-03-15 00:00:00").cast("timestamp_ntz")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(_disc_price()).cast("double").alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


# ---------------------------------------------------------------------------
# Point / bulk reads (SURVEY §2.A rows A1-A2 → Spark keyed lookup)
# ---------------------------------------------------------------------------

@query(
    "point_get_customer",
    "SELECT * FROM customer WHERE c_custkey = 42",
    "kiji", "source",
)
def point_get_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 point read. Scale: the key predicate pushes into the parquet scan
    (row-group/page skip via min-max stats) — no shuffle, no full read."""
    return load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") == 42)


@query(
    "bulk_get_customers",
    "SELECT * FROM customer WHERE c_custkey IN (1,2,3,5,8,13,21,34,55,89) ORDER BY c_custkey",
    "kiji", "source", "join",
)
def bulk_get_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2 bulk read as a broadcast left-semi join of a keys DataFrame — the
    reference's per-key thread fan-out (InternalFreshKijiTableReader.java:
    767-806) becomes Spark task parallelism. Scale: broadcast semi-join
    means the big table is scanned once, no shuffle. The keys relation is
    built JVM-side (VALUES) — createDataFrame from Python objects costs a
    Python-worker round trip."""
    keys = spark.sql(
        "SELECT * FROM VALUES (1),(2),(3),(5),(8),(13),(21),(34),(55),(89) AS t(c_custkey)"
    )
    cust = load_table(spark, sf_dir, "customer")
    return cust.join(F.broadcast(keys), "c_custkey", "semi").orderBy("c_custkey")


# ---------------------------------------------------------------------------
# Filters (SURVEY §2.C "Filter")
# ---------------------------------------------------------------------------

@query(
    "filter_in_between_like",
    """
    SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderpriority
    FROM orders
    WHERE o_orderstatus IN ('F','O')
      AND o_totalprice BETWEEN 1000 AND 50000
      AND o_orderpriority LIKE '1-%'
      AND o_custkey IS NOT NULL
    ORDER BY o_orderkey
    """,
    "filter",
)
def filter_in_between_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Predicate battery: IN / BETWEEN / LIKE / IS NOT NULL — all reach the
    scan as pushed filters."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.filter(F.col("o_orderstatus").isin("F", "O"))
        .filter(F.col("o_totalprice").between(1000, 50000))
        .filter(F.col("o_orderpriority").like("1-%"))
        .filter(F.col("o_custkey").isNotNull())
        .select("o_orderkey", "o_orderstatus", "o_totalprice", "o_orderpriority")
        .orderBy("o_orderkey")
    )


# ---------------------------------------------------------------------------
# Rollup / grouping sets (SURVEY §2.C "Aggregation")
# ---------------------------------------------------------------------------

@query(
    "rollup_acctbal_by_nation_segment",
    """
    SELECT n_name, c_mktsegment,
      GROUPING(n_name, c_mktsegment) AS grp,
      CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_acctbal,
      COUNT(*) AS n_customers
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    GROUP BY ROLLUP (n_name, c_mktsegment)
    HAVING COUNT(*) > 0  -- Spark: no grouping-set rows over empty input
    ORDER BY grp, n_name, c_mktsegment
    """,
    "agg", "rollup", "join",
)
def rollup_acctbal_by_nation_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP with grouping_id disambiguation. Scale: nation broadcast;
    rollup is partial-aggregated per grouping set before the shuffle."""
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    return (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .rollup("n_name", "c_mktsegment")
        .agg(
            F.grouping_id().alias("grp"),
            F.sum(_dec2("c_acctbal")).cast("double").alias("total_acctbal"),
            F.count(F.lit(1)).alias("n_customers"),
        )
        .select("n_name", "c_mktsegment", "grp", "total_acctbal", "n_customers")
        .orderBy("grp", "n_name", "c_mktsegment")
    )


# ---------------------------------------------------------------------------
# Window functions (SURVEY §2.C "Window functions")
# ---------------------------------------------------------------------------

@query(
    "topk_parts_per_brand",
    """
    SELECT p_brand, p_partkey, p_name, p_retailprice, rn FROM (
      SELECT p_brand, p_partkey, p_name, p_retailprice,
             ROW_NUMBER() OVER (PARTITION BY p_brand
                                ORDER BY p_retailprice DESC, p_partkey) AS rn
      FROM part) t
    WHERE rn <= 3
    ORDER BY p_brand, rn
    """,
    "window", "topk",
)
def topk_parts_per_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k per group via ranking window + filter. Scale: one shuffle on
    the partition key; skew-safe because every group emits ≤ k rows."""
    p = load_table(spark, sf_dir, "part")
    w = Window.partitionBy("p_brand").orderBy(F.desc("p_retailprice"), F.asc("p_partkey"))
    return (
        p.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("p_brand", "p_partkey", "p_name", "p_retailprice", "rn")
        .orderBy("p_brand", "rn")
    )


@query(
    "most_recent_event_per_user",
    """
    SELECT user_id, event_id, ts, event_type, value FROM (
      SELECT user_id, event_id, ts, event_type, value,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events) t
    WHERE rn = 1
    ORDER BY user_id
    """,
    "kiji", "window",
)
def most_recent_event_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's most-recent-version read (KijiDataRequest
    maxVersions=1, FreshKijiTableReader.java:59-75) expressed relationally:
    latest event per entity. Scale: single shuffle by user_id; AQE splits
    skewed users."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_id", "ts", "event_type", "value")
        .orderBy("user_id")
    )


# -- widen the registry: importing these modules registers their queries ----
from . import queries_relational  # noqa: E402,F401
from . import queries_scalar  # noqa: E402,F401
from . import queries_kiji  # noqa: E402,F401
from . import queries_pipeline  # noqa: E402,F401
from . import queries_sources  # noqa: E402,F401
from . import queries_ml  # noqa: E402,F401
from . import queries_scale  # noqa: E402,F401
from . import queries_tpch  # noqa: E402,F401
from . import queries_analytics  # noqa: E402,F401
from . import queries_train  # noqa: E402,F401
from . import queries_warehouse  # noqa: E402,F401
from . import queries_behavior  # noqa: E402,F401
from . import queries_subquery  # noqa: E402,F401
from . import queries_graph  # noqa: E402,F401
