"""Correlated and uncorrelated subquery surface (SURVEY §2.C extension).

The reference has no subqueries (its only "query IR" is a KijiDataRequest,
``FreshKijiTableReader.java:62-67``); a user querying scored tables needs
the standard SQL subquery forms. Catalyst decorrelates every shape below
into joins/aggregates (RewriteCorrelatedScalarSubquery,
RewritePredicateSubquery), so these run as distributed hash joins — no
per-row re-execution — which is exactly why expressing them declaratively
matters at 100 TB: EXISTS becomes a left-semi shuffle/broadcast join,
NOT EXISTS a left-anti join, a correlated scalar subquery a grouped
aggregate joined back on the correlation key.

Parity rules: DECIMAL accumulation for monetary comparisons, explicit
tiebreakers, identical aliases both sides.
"""

from __future__ import annotations

from .queries import query
from .sources import load_table


def _views(spark, sf_dir, *names):
    for n in names:
        load_table(spark, sf_dir, n).createOrReplaceTempView(n)


# ---------------------------------------------------------------------------
# Correlated EXISTS — customers with at least one URGENT order.
# Catalyst plans this as a left-semi join on c_custkey (verify:
# .explain shows LeftSemi); at scale the orders side is shuffled once on
# o_custkey, no per-customer probe.
# ---------------------------------------------------------------------------

@query(
    "subquery_exists_urgent_customers",
    """
    SELECT c_custkey, c_name, c_mktsegment
    FROM customer c
    WHERE EXISTS (
      SELECT 1 FROM orders o
      WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT'
    )
    ORDER BY c_custkey
    """,
    "subquery", "exists",
)
def subquery_exists_urgent_customers(spark, sf_dir):
    _views(spark, sf_dir, "customer", "orders")
    return spark.sql(
        """
        SELECT c_custkey, c_name, c_mktsegment
        FROM customer c
        WHERE EXISTS (
          SELECT 1 FROM orders o
          WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT'
        )
        ORDER BY c_custkey
        """
    )


# ---------------------------------------------------------------------------
# Correlated NOT EXISTS — suppliers with no lineitem shipped after a date.
# Plans as a left-anti join (null-safe); the anti side carries only the
# filtered fact columns, so the shuffle is narrow.
# ---------------------------------------------------------------------------

@query(
    "subquery_not_exists_quiet_suppliers",
    """
    SELECT s_suppkey, s_name
    FROM supplier s
    WHERE NOT EXISTS (
      SELECT 1 FROM lineitem l
      WHERE l.l_suppkey = s.s_suppkey AND l.l_shipdate >= DATE '1997-01-01'
    )
    ORDER BY s_suppkey
    """,
    "subquery", "not-exists",
)
def subquery_not_exists_quiet_suppliers(spark, sf_dir):
    _views(spark, sf_dir, "supplier", "lineitem")
    return spark.sql(
        """
        SELECT s_suppkey, s_name
        FROM supplier s
        WHERE NOT EXISTS (
          SELECT 1 FROM lineitem l
          WHERE l.l_suppkey = s.s_suppkey AND l.l_shipdate >= DATE '1997-01-01'
        )
        ORDER BY s_suppkey
        """
    )


# ---------------------------------------------------------------------------
# Correlated scalar subquery — customers above their nation's average
# balance. Decorrelated to groupBy(nation).avg + equi-join back. The
# average is computed identically on both engines: exact DECIMAL sum
# (aggregation order cannot change it), one IEEE-rounded cast to DOUBLE,
# one double division by COUNT(*). Both engines therefore compare the
# same IEEE doubles, so no boundary row can flip. The output column is
# DOUBLE per the registry parity rule (queries.py header): Spark returns
# DECIMAL as Python Decimal objects (pandas dtype object) while DuckDB
# returns float64, so a DECIMAL final projection can never hash-match.
# ---------------------------------------------------------------------------

@query(
    "subquery_scalar_above_nation_avg",
    """
    SELECT c_custkey, c_nationkey,
      CAST(CAST(c_acctbal AS DECIMAL(18,2)) AS DOUBLE) AS acctbal
    FROM customer c
    WHERE CAST(CAST(c_acctbal AS DECIMAL(18,2)) AS DOUBLE) > (
      SELECT CAST(SUM(CAST(c2.c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
      FROM customer c2 WHERE c2.c_nationkey = c.c_nationkey
    )
    ORDER BY c_custkey
    """,
    "subquery", "scalar-correlated",
)
def subquery_scalar_above_nation_avg(spark, sf_dir):
    _views(spark, sf_dir, "customer")
    return spark.sql(
        """
        SELECT c_custkey, c_nationkey,
          CAST(CAST(c_acctbal AS DECIMAL(18,2)) AS DOUBLE) AS acctbal
        FROM customer c
        WHERE CAST(CAST(c_acctbal AS DECIMAL(18,2)) AS DOUBLE) > (
          SELECT CAST(SUM(CAST(c2.c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
          FROM customer c2 WHERE c2.c_nationkey = c.c_nationkey
        )
        ORDER BY c_custkey
        """
    )


# ---------------------------------------------------------------------------
# IN subquery — orders placed by customers in the BUILDING segment.
# Plans as left-semi; with a small inner side AQE converts to broadcast.
# ---------------------------------------------------------------------------

@query(
    "subquery_in_building_segment_orders",
    """
    SELECT o_orderpriority, COUNT(*) AS n_orders
    FROM orders
    WHERE o_custkey IN (
      SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    )
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    "subquery", "in",
)
def subquery_in_building_segment_orders(spark, sf_dir):
    _views(spark, sf_dir, "customer", "orders")
    return spark.sql(
        """
        SELECT o_orderpriority, COUNT(*) AS n_orders
        FROM orders
        WHERE o_custkey IN (
          SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        )
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
        """
    )


# ---------------------------------------------------------------------------
# LATERAL join — top-2 orders per customer for a small key range, the
# "for each row, run a dependent subquery" shape. Catalyst decorrelates
# LATERAL + LIMIT into a ranked window, so it scales as one shuffle on the
# correlation key instead of N point queries.
# ---------------------------------------------------------------------------

@query(
    "lateral_top2_orders_per_customer",
    """
    SELECT c.c_custkey, t.o_orderkey,
      CAST(CAST(t.o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS totalprice
    FROM customer c,
    LATERAL (
      SELECT o_orderkey, o_totalprice
      FROM orders o
      WHERE o.o_custkey = c.c_custkey
      ORDER BY o_totalprice DESC, o_orderkey
      LIMIT 2
    ) t
    WHERE c.c_custkey <= 100
    ORDER BY c_custkey, totalprice DESC, o_orderkey
    """,
    "subquery", "lateral",
)
def lateral_top2_orders_per_customer(spark, sf_dir):
    """Output column is DOUBLE (not DECIMAL) per the registry parity rule;
    the DECIMAL cast stays inside the projection so cents are exact before
    the single IEEE rounding, and ordering/tiebreak inside the LATERAL is
    on the raw column identically on both engines."""
    _views(spark, sf_dir, "customer", "orders")
    return spark.sql(
        """
        SELECT c.c_custkey, t.o_orderkey,
          CAST(CAST(t.o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS totalprice
        FROM customer c,
        LATERAL (
          SELECT o_orderkey, o_totalprice
          FROM orders o
          WHERE o.o_custkey = c.c_custkey
          ORDER BY o_totalprice DESC, o_orderkey
          LIMIT 2
        ) t
        WHERE c.c_custkey <= 100
        ORDER BY c_custkey, totalprice DESC, o_orderkey
        """
    )
