"""Classic TPC-H query shapes adapted to the driver's synthetic star
schema (TESTDATA.md) — deepens the relational surface of SURVEY §2.C with
the canonical scan/semi-join/join-agg/having patterns (q1/q3/q5 live in
queries.py).

Determinism follows the registry conventions: money sums in exact
DECIMAL, every top-k ordered with a tiebreaker, dates pinned.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .queries import query
from .sources import load_table


def _ts(lit: str) -> F.Column:
    return F.lit(lit).cast("timestamp_ntz")


@query(
    "q6_forecast_revenue",
    """
    SELECT CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(18,4))) AS DOUBLE)
      AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
    "agg", "filter",
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: pure scan-filter-aggregate, zero shuffle of raw
    rows. All three predicates push to the parquet reader; the global sum
    is partial+final over one scalar — at 100 TB this is the cheapest
    query class there is, bounded by scan bandwidth alone."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= _ts("1996-01-01 00:00:00"))
        & (F.col("l_shipdate") < _ts("1997-01-01 00:00:00"))
        & (F.col("l_discount").between(0.05, 0.07))
        & (F.col("l_quantity") < 24)
    ).agg(
        F.sum((F.col("l_extendedprice") * F.col("l_discount")).cast("decimal(18,4)"))
        .cast("double")
        .alias("revenue")
    )


@query(
    "q4_late_ship_priority",
    """
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1996-04-01 00:00:00'
      AND EXISTS (
        SELECT 1 FROM lineitem
        WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate + INTERVAL 60 DAY
      )
    GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
    "join", "agg",
)
def q4_late_ship_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS decorrelated to a left-semi join with a
    cross-table predicate (shipped >60 days after order — the synthetic
    schema has no commit/receipt dates). Scale: the date filter prunes
    orders before the join; the semi join shuffles only (orderkey,
    orderdate) pairs, never lineitem payload columns."""
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ts("1996-01-01 00:00:00"))
        & (F.col("o_orderdate") < _ts("1996-04-01 00:00:00"))
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    semi = o.join(
        li,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAY")),
        "left_semi",
    )
    return (
        semi.groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
        .orderBy("o_orderpriority")
    )


@query(
    "q14_promo_revenue",
    """
    SELECT
      CAST(100.0 AS DOUBLE) *
        CAST(SUM(CASE WHEN p_type = 'PROMO'
              THEN CAST(l_extendedprice*(1-l_discount) AS DECIMAL(18,4))
              ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
        / CAST(SUM(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(18,4))) AS DOUBLE)
        AS promo_revenue_pct
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-09-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1996-10-01 00:00:00'
    """,
    "join", "agg",
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: fact-to-dimension join + conditional aggregation.
    Scale: no forced broadcast hint — part grows with the data, so the
    hint that is safe at sf0.1 is a driver OOM at 100 TB; AQE broadcasts
    part here by measured size (the month of lineitem never shuffles)
    and falls back to a shuffled equi-join at full scale. The CASE folds
    into the same partial aggregate pass."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1996-09-01 00:00:00"))
        & (F.col("l_shipdate") < _ts("1996-10-01 00:00:00"))
    )
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    disc = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,4)")
    zero = F.lit(0).cast("decimal(18,4)")
    return (
        li.join(p, F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            (
                F.lit(100.0)
                * F.sum(F.when(F.col("p_type") == "PROMO", disc).otherwise(zero))
                .cast("double")
                / F.sum(disc).cast("double")
            ).alias("promo_revenue_pct")
        )
    )


@query(
    "q18_large_volume_customers",
    """
    SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
      CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (
      SELECT l_orderkey FROM lineitem
      GROUP BY l_orderkey
      HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 210
    )
    GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 20
    """,
    "join", "agg", "topk",
)
def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: HAVING-filtered subquery feeding joins + top-k.

    Round-2 plan: lineitem is aggregated per orderkey ONCE and the >210
    filter applied to that aggregate directly — the original formulation
    (semi-join on the filtered keys, then re-join raw lineitem and
    re-aggregate) scanned and shuffled lineitem twice for the same
    number. One lineitem shuffle; AQE then broadcasts the highly
    selective filtered aggregate into orders by its MEASURED size (no
    forced hint — the qualifying-order count grows with the data, so a
    static hint would eventually OOM; AQE re-plans the join after the
    aggregate materializes). Result is identical because
    orderkey is unique in the aggregate — the 5-column GROUP BY of the
    SQL is just carrying order/customer attributes through the join."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("__q__"))
        .filter(F.col("__q__") > 210)
    )
    return (
        o.join(big, F.col("o_orderkey") == big["l_orderkey"])
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .select(
            "c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice",
            F.col("__q__").cast("double").alias("total_qty"),
        )
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(20)
    )


@query(
    "q7_nation_volume_shipping",
    """
    SELECT supp_nation, cust_nation, l_year,
      CAST(SUM(vol) AS DOUBLE) AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        year(l_shipdate) AS l_year,
        CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)) AS vol
      FROM supplier
        JOIN lineitem ON s_suppkey = l_suppkey
        JOIN orders   ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
      WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
          OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    ) t
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
    """,
    "join", "agg",
)
def q7_nation_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: five-way join with a DISJUNCTIVE cross-dimension
    pair predicate and per-year rollup. Scale: both nation copies and
    customer/supplier joins are AQE-sized (broadcast here, shuffled at
    100 TB — no forced hints); the disjunction evaluates after the dim
    joins, so lineitem shuffles once (to orders) at most — with orders
    also broadcastable at dimension scale, not at all."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1996-01-01 00:00:00"))
        & (F.col("l_shipdate") < _ts("1998-01-01 00:00:00"))
    )
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    n1 = n.select(F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation"))
    n2 = n.select(F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation"))
    vol = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,4)")
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        li.join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(pair)
        .select("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"), vol.alias("vol"))
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(F.sum("vol").cast("double").alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@query(
    "q8_market_share",
    """
    SELECT o_year,
      CAST(SUM(CASE WHEN supp_nation = 'NATION_2' THEN vol
               ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
        / CAST(SUM(vol) AS DOUBLE) AS mkt_share
    FROM (
      SELECT year(o_orderdate) AS o_year,
        CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)) AS vol,
        n2.n_name AS supp_nation
      FROM part
        JOIN lineitem ON p_partkey = l_partkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation n1 ON c_nationkey = n1.n_nationkey
        JOIN region   ON n1.n_regionkey = r_regionkey
        JOIN nation n2 ON s_nationkey = n2.n_nationkey
      WHERE r_name = 'ASIA' AND p_type = 'PROMO'
        AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    ) t GROUP BY o_year ORDER BY o_year
    """,
    "join", "agg",
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: national market share — a conditional share of a
    sum, 8-way star join. Scale: nation/region carry forced broadcasts
    (constant-size); part/supplier/customer are AQE-sized; the only
    shuffle is lineitem→orders (and the final 2-row-per-year agg).
    Exact-DECIMAL numerator/denominator make the double ratio
    bit-reproducible across engines."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ts("1996-01-01 00:00:00"))
        & (F.col("o_orderdate") < _ts("1998-01-01 00:00:00"))
    )
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n1 = n.select(F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_region"))
    n2 = n.select(F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("supp_nation"))
    vol = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,4)")
    zero = F.lit(0).cast("decimal(18,4)")
    return (
        li.join(p, F.col("p_partkey") == F.col("l_partkey"))
        .join(s, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n1_key"))
        .join(F.broadcast(r), F.col("n1_region") == F.col("r_regionkey"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_key"))
        .select(F.year("o_orderdate").alias("o_year"), vol.alias("vol"), "supp_nation")
        .groupBy("o_year")
        .agg(
            (
                F.sum(F.when(F.col("supp_nation") == "NATION_2", F.col("vol")).otherwise(zero))
                .cast("double")
                / F.sum("vol").cast("double")
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


@query(
    "q11_important_parts",
    """
    SELECT l_partkey,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS part_value
    FROM lineitem
    GROUP BY l_partkey
    HAVING CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) > (
      SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) * 0.002
      FROM lineitem
    )
    ORDER BY part_value DESC, l_partkey
    """,
    "agg", "having",
)
def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape (partsupp-free adaptation): per-part value filtered
    by a GLOBAL-scalar threshold — HAVING against a scalar subquery.
    Scale: two aggregations over one scan; the scalar total broadcasts
    into the filter (a 1-row cross join), so no second shuffle. Both
    sides sum in DECIMAL and compare as doubles derived identically."""
    li = load_table(spark, sf_dir, "lineitem")
    per_part = li.groupBy("l_partkey").agg(
        F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("part_value")
    )
    total = li.agg(
        (F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast("double") * 0.002)
        .alias("__threshold__")
    )
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(F.col("part_value") > F.col("__threshold__"))
        .select("l_partkey", "part_value")
        .orderBy(F.desc("part_value"), F.asc("l_partkey"))
    )


@query(
    "q13_customer_distribution",
    """
    SELECT c_count, COUNT(*) AS custdist FROM (
      SELECT c_custkey, COUNT(o_orderkey) AS c_count
      FROM customer LEFT OUTER JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey
    ) t
    GROUP BY c_count ORDER BY custdist DESC, c_count DESC
    """,
    "join", "agg",
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: left-outer join with a JOIN-condition filter (not
    a WHERE — customers with zero matching orders must survive with count
    0), then a distribution-of-counts second aggregation. Scale: one
    shuffle on custkey; the second agg is over at most max-orders-per-
    customer distinct values."""
    c = load_table(spark, sf_dir, "customer").select("c_custkey")
    o = load_table(spark, sf_dir, "orders").select("o_custkey", "o_orderkey", "o_orderpriority")
    joined = c.join(
        o,
        (F.col("c_custkey") == F.col("o_custkey"))
        & (F.col("o_orderpriority") != "1-URGENT"),
        "left",
    )
    return (
        joined.groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


@query(
    "q15_top_supplier",
    """
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
        CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE)
          AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    ORDER BY s_suppkey
    """,
    "join", "agg", "topk",
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: agg view + equality against the view's own MAX
    (scalar subquery). Implemented with an unpartitioned max window over
    the tiny per-supplier aggregate — at 100 TB the aggregate is
    |suppliers| rows, so the single-partition window is safe; the raw
    fact table never sees the window. Equality on doubles is sound
    because both sides derive the value identically (exact DECIMAL sum)."""
    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1996-01-01 00:00:00"))
        & (F.col("l_shipdate") < _ts("1996-04-01 00:00:00"))
    )
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    rev = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum((F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,4)"))
        .cast("double")
        .alias("total_revenue")
    )
    w = Window.partitionBy()  # global max over the supplier-sized aggregate
    top = rev.withColumn("__mx__", F.max("total_revenue").over(w)).filter(
        F.col("total_revenue") == F.col("__mx__")
    )
    return (
        s.join(F.broadcast(top), F.col("s_suppkey") == F.col("supplier_no"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


@query(
    "q17_small_quantity_revenue",
    """
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0
      AS avg_yearly
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#13'
      AND l_quantity < (
        SELECT 0.2 * (CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*))
        FROM lineitem l2 WHERE l2.l_partkey = lineitem.l_partkey
      )
    """,
    "join", "agg",
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: correlated per-part average threshold. The
    correlated subquery decorrelates into a per-part aggregate joined
    back to the fact rows. Scale: the per-part avg table is part-sized →
    is AQE-sized into a broadcast here (no forced hint — part-cardinality
    grows with the data); lineitem never shuffles at this scale. The avg
    is computed as exact
    DECIMAL sum / count in both engines so the 0.2× threshold is the
    identical double."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#13")
    per_part_avg = li.groupBy(F.col("l_partkey").alias("avg_partkey")).agg(
        (
            F.lit(0.2)
            * (
                F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double")
                / F.count(F.lit(1))
            )
        ).alias("__qty_thresh__")
    )
    return (
        li.join(p, F.col("p_partkey") == F.col("l_partkey"))
        .join(per_part_avg, F.col("l_partkey") == F.col("avg_partkey"))
        .filter(F.col("l_quantity") < F.col("__qty_thresh__"))
        .agg(
            (
                F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast("double")
                / F.lit(7.0)
            ).alias("avg_yearly")
        )
    )


@query(
    "q19_discounted_revenue",
    """
    SELECT CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE)
      AS revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#13' AND p_size BETWEEN 1 AND 10
           AND l_quantity >= 1 AND l_quantity <= 11)
       OR (p_brand = 'Brand#5'  AND p_size BETWEEN 1 AND 15
           AND l_quantity >= 10 AND l_quantity <= 20)
       OR (p_brand = 'Brand#19' AND p_size BETWEEN 1 AND 25
           AND l_quantity >= 20 AND l_quantity <= 30)
    """,
    "join", "agg", "filter",
)
def q19_discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: disjunction of conjunctive (brand, size, qty)
    triples across the join — the classic OR-of-ANDs predicate. Scale:
    part joins via AQE-sized broadcast; Catalyst pushes the common
    qty/size bounds where it
    can and evaluates the residual disjunction post-join in codegen."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    cond = (
        (F.col("p_brand") == "Brand#13")
        & F.col("p_size").between(1, 10)
        & F.col("l_quantity").between(1, 11)
    ) | (
        (F.col("p_brand") == "Brand#5")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(10, 20)
    ) | (
        (F.col("p_brand") == "Brand#19")
        & F.col("p_size").between(1, 25)
        & F.col("l_quantity").between(20, 30)
    )
    return (
        li.join(p, F.col("p_partkey") == F.col("l_partkey"))
        .filter(cond)
        .agg(
            F.sum((F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,4)"))
            .cast("double")
            .alias("revenue")
        )
    )


@query(
    "q22_global_sales_opportunity",
    """
    SELECT cust_code, COUNT(*) AS numcust,
      CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
    FROM (
      SELECT right(c_name, 2) AS cust_code, c_acctbal
      FROM customer
      WHERE right(c_name, 2) IN ('00','11','22','33','44','55','66')
        AND c_acctbal > (
          SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
          FROM customer WHERE c_acctbal > 0.0
        )
        AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    ) t
    GROUP BY cust_code ORDER BY cust_code
    """,
    "join", "agg", "filter",
)
def q22_global_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape (phone → customer-name suffix adaptation):
    substring-derived code filter + global-average scalar threshold +
    anti join against orders. Scale: the scalar avg broadcasts; the anti
    join shuffles only custkeys; NOT EXISTS is the left-anti primitive."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").select("o_custkey")
    codes = ("00", "11", "22", "33", "44", "55", "66")
    avg_bal = c.filter(F.col("c_acctbal") > 0.0).agg(
        (
            F.sum(F.col("c_acctbal").cast("decimal(18,2)")).cast("double")
            / F.count(F.lit(1))
        ).alias("__avg_bal__")
    )
    return (
        c.withColumn("cust_code", F.expr("right(c_name, 2)"))
        .filter(F.col("cust_code").isin(*codes))
        .crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("__avg_bal__"))
        .join(o, F.col("o_custkey") == F.col("c_custkey"), "left_anti")
        .groupBy("cust_code")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(F.col("c_acctbal").cast("decimal(18,2)")).cast("double").alias("totacctbal"),
        )
        .orderBy("cust_code")
    )


@query(
    "q10_returned_items",
    """
    SELECT c_custkey, c_name,
      CAST(SUM(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(18,4))) AS DOUBLE)
        AS revenue,
      c_acctbal, n_name
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
                  JOIN nation ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1996-10-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    "join", "agg", "topk",
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: four-way join with two selective fact filters and
    a top-k by aggregated revenue. Scale: nation carries the only forced
    broadcast; customer is AQE-sized;
    lineitem's returnflag filter and orders' date filter push to the
    scans, so the join input is a small slice of each fact table."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ts("1996-10-01 00:00:00"))
        & (F.col("o_orderdate") < _ts("1997-01-01 00:00:00"))
    )
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    disc = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,4)")
    return (
        o.join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.sum(disc).cast("double").alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


@query(
    "q2_min_cost_supplier",
    """
    WITH eligible AS (
      SELECT l_partkey, l_suppkey, MIN(l_extendedprice / l_quantity) AS pair_min
      FROM lineitem
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN nation ON n_nationkey = s_nationkey
        JOIN region ON r_regionkey = n_regionkey
        JOIN part ON p_partkey = l_partkey
      WHERE r_name = 'EUROPE' AND p_type = 'STANDARD' AND p_size BETWEEN 10 AND 15
      GROUP BY l_partkey, l_suppkey
    ), ranked AS (
      SELECT e.*, MIN(pair_min) OVER (PARTITION BY l_partkey) AS part_min
      FROM eligible e
    )
    SELECT s_acctbal, s_name, n_name, l_partkey AS p_partkey, pair_min AS min_price
    FROM ranked
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN nation ON n_nationkey = s_nationkey
    WHERE pair_min = part_min
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
    LIMIT 50
    """,
    "join", "subquery", "window",
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (partsupp-free: lineitem is the part-supplier
    relation, unit sale price stands in for supply cost): for each
    STANDARD mid-size part, the EUROPE supplier(s) offering the minimum
    unit price — the correlated scalar-MIN subquery decorrelated into a
    per-part window MIN over pre-aggregated (part, supplier) pairs.
    Scale: nation/region force-broadcast; supplier/part and the derived
    euro-supplier set are AQE-sized into the
    lineitem scan; one shuffle on (partkey, suppkey) for the pair agg,
    window MIN reuses the partkey clustering (no second exchange of the
    fact side). Unit price is a per-row division — deterministic across
    engines, unlike an order-dependent float SUM/AVG."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_type") == "STANDARD") & (F.col("p_size").between(10, 15))
    )
    euro_supp = s.join(F.broadcast(n), F.col("n_nationkey") == F.col("s_nationkey")).join(
        F.broadcast(r), F.col("r_regionkey") == F.col("n_regionkey")
    )
    eligible = (
        li.join(euro_supp.select("s_suppkey"), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(p.select("p_partkey"), F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("pair_min"))
    )
    from pyspark.sql import Window

    w = Window.partitionBy("l_partkey")
    ranked = eligible.withColumn("part_min", F.min("pair_min").over(w))
    return (
        ranked.filter(F.col("pair_min") == F.col("part_min"))
        .join(
            euro_supp.select("s_suppkey", "s_name", "s_acctbal", "n_name"),
            F.col("s_suppkey") == F.col("l_suppkey"),
        )
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            F.col("l_partkey").alias("p_partkey"),
            F.col("pair_min").alias("min_price"),
        )
        .orderBy(F.desc("s_acctbal"), F.asc("n_name"), F.asc("s_name"), F.asc("p_partkey"))
        .limit(50)
    )


@query(
    "q9_product_type_profit",
    """
    SELECT n_name AS supp_nation, year(o_orderdate) AS o_year,
      CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                    - p_retailprice * l_quantity * 0.1 AS DECIMAL(18,4))) AS DOUBLE)
        AS profit
    FROM lineitem
      JOIN part ON p_partkey = l_partkey AND p_name LIKE '%widget%'
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      JOIN orders ON o_orderkey = l_orderkey
    GROUP BY supp_nation, o_year
    ORDER BY supp_nation, o_year DESC
    """,
    "join", "agg",
)
def q9_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (supply cost proxied by 10% of retail price ×
    quantity — the schema has no partsupp): profit on widget parts by
    supplier nation and order year. Scale: part (name-filtered),
    supplier/part AQE-size to broadcasts, nation force-broadcasts;
    lineitem↔orders is the only fact-fact
    join, on orderkey — both sides shuffle once and AQE handles skew;
    the profit expression folds into the scan projection. Money in
    DECIMAL, per-row, so both engines round identically before summing."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%widget%"))
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    o = load_table(spark, sf_dir, "orders")
    amount = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - F.col("p_retailprice") * F.col("l_quantity") * 0.1
    ).cast("decimal(18,4)")
    return (
        li.join(p.select("p_partkey", "p_retailprice"), F.col("p_partkey") == F.col("l_partkey"))
        .join(s.select("s_suppkey", "s_nationkey"), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(n), F.col("n_nationkey") == F.col("s_nationkey"))
        .join(o.select("o_orderkey", "o_orderdate"), F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy(
            F.col("n_name").alias("supp_nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(F.sum(amount).cast("double").alias("profit"))
        .orderBy(F.asc("supp_nation"), F.desc("o_year"))
    )


@query(
    "q12_late_shipment_priority_split",
    """
    SELECT l_returnflag,
      CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END)
           AS BIGINT) AS high_line_count,
      CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END)
           AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate > o_orderdate + INTERVAL 30 DAY
    GROUP BY l_returnflag ORDER BY l_returnflag
    """,
    "join", "agg",
)
def q12_late_shipment_priority_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (returnflag stands in for shipmode; "late" =
    shipped >30 days after ordering replaces the commit/receipt-date
    window): conditional aggregation splitting line counts by order
    priority class. Scale: the shipdate year-filter pushes to the
    lineitem scan; the cross-table lateness predicate applies at the
    join; 3-row output from a partial+final count — no wide shuffle."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1996-01-01 00:00:00"))
        & (F.col("l_shipdate") < _ts("1997-01-01 00:00:00"))
    )
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate", "o_orderpriority")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS"))
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "q16_supplier_part_counts",
    """
    SELECT p_brand, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM part JOIN lineitem ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO'
      AND p_size IN (5, 10, 15, 20, 25, 30)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_size
    """,
    "join", "agg", "subquery",
)
def q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct-supplier counts per part attribute with
    a NOT IN exclusion subquery — decorrelated to a broadcast left-anti
    join (s_suppkey is non-null, so NOT IN ≡ anti join). Scale: the
    excluded-supplier list is small (negative balances) → AQE-sized
    broadcast anti (no forced hint; it grows with supplier count);
    part filters broadcast into the lineitem scan; COUNT DISTINCT
    shuffles (brand, size, suppkey) — narrow, partial-deduped by AQE."""
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & (F.col("p_size").isin(5, 10, 15, 20, 25, 30))
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    bad = load_table(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        li.join(bad, F.col("s_suppkey") == F.col("l_suppkey"), "left_anti")
        .join(p.select("p_partkey", "p_brand", "p_size"), F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("p_brand", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), F.asc("p_brand"), F.asc("p_size"))
    )


@query(
    "q20_excess_share_suppliers",
    """
    WITH qty AS (
      SELECT l_partkey, l_suppkey, SUM(l_quantity) AS supp_qty
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
        AND l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'small%')
      GROUP BY l_partkey, l_suppkey
    ), tot AS (
      SELECT l_partkey, SUM(supp_qty) AS part_qty FROM qty GROUP BY l_partkey
    )
    SELECT DISTINCT s_name, n_name
    FROM supplier JOIN nation ON n_nationkey = s_nationkey
    WHERE s_suppkey IN (
      SELECT q.l_suppkey FROM qty q JOIN tot t ON q.l_partkey = t.l_partkey
      WHERE q.supp_qty > 0.3 * t.part_qty
    )
    ORDER BY s_name
    """,
    "join", "subquery", "agg",
)
def q20_excess_share_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (no partsupp.availqty, so "excess stock" becomes
    "dominant supplier": shipped >30% of a small-part's 1996 volume):
    nested aggregate subqueries decorrelated into two groupBys sharing
    one clustering + a semi join. Scale: the second groupBy (partkey)
    reuses the (partkey, suppkey) shuffle's clustering — no re-exchange
    of fact rows; the qualifying-supplier set is bounded by |supplier| →
    AQE-sized broadcast semi. l_quantity is integral, so double sums are
    exact and
    the 0.3× threshold compares identically across engines."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1996-01-01 00:00:00"))
        & (F.col("l_shipdate") < _ts("1997-01-01 00:00:00"))
    )
    small = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("small%"))
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    qty = (
        li.join(small.select("p_partkey"), F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum("l_quantity").alias("supp_qty"))
    )
    tot = qty.groupBy("l_partkey").agg(F.sum("supp_qty").alias("part_qty"))
    dominant = (
        qty.join(tot, "l_partkey")
        .filter(F.col("supp_qty") > 0.3 * F.col("part_qty"))
        .select("l_suppkey")
    )
    return (
        s.join(dominant, F.col("l_suppkey") == F.col("s_suppkey"), "left_semi")
        .join(F.broadcast(n), F.col("n_nationkey") == F.col("s_nationkey"))
        .select("s_name", "n_name")
        .dropDuplicates()
        .orderBy("s_name")
    )


@query(
    "q21_waiting_suppliers",
    """
    WITH late AS (
      SELECT l_orderkey, l_suppkey,
        MAX(CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY THEN 1 ELSE 0 END)
          AS is_late
      FROM lineitem JOIN orders ON o_orderkey = l_orderkey AND o_orderstatus = 'F'
      GROUP BY l_orderkey, l_suppkey
    ), per_order AS (
      SELECT l_orderkey, COUNT(*) AS n_supp, SUM(is_late) AS n_late
      FROM late GROUP BY l_orderkey
    )
    SELECT s_name, COUNT(*) AS numwait
    FROM late JOIN per_order USING (l_orderkey)
              JOIN supplier ON s_suppkey = l_suppkey
    WHERE is_late = 1 AND n_supp > 1 AND n_late = 1
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 100
    """,
    "join", "agg", "subquery",
)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape ("late" = shipped >60 days after ordering — the
    schema has no commit/receipt dates): suppliers who were the SOLE
    late supplier on a multi-supplier finalized order. The EXISTS
    (another supplier) / NOT EXISTS (another late supplier) pair is
    decorrelated into per-order supplier/late counts computed as WINDOW
    aggregates over the per-(order,supplier) rollup — one orderkey
    shuffle serves both counts AND the filter, where an agg-then-join
    would shuffle the rollup twice and re-join it with itself (measured
    1.7× at sf0.1). The explicit repartition("l_orderkey") before the
    rollup makes that sharing real: HashPartitioning(l_orderkey)
    satisfies the groupBy's (l_orderkey, l_suppkey) clustering (subset
    rule) AND the window's l_orderkey clustering, so the rollup and both
    window aggs run in ONE exchange — without it a broadcast orders join
    leaves the agg free to pick two-key partitioning and the window
    re-shuffles (measured another 1.3× at sf0.1). Scale: per-order window
    state is two longs over a handful of suppliers per order; the
    supplier join is AQE-sized (broadcast here, shuffled at 100 TB).
    All-integer arithmetic — no float parity risk."""
    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey", "l_shipdate")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F").select(
        "o_orderkey", "o_orderdate"
    )
    s = load_table(spark, sf_dir, "supplier")
    late = (
        li.join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .repartition("l_orderkey")
        .groupBy("l_orderkey", "l_suppkey")
        .agg(
            F.max(
                F.when(
                    F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"), 1
                ).otherwise(0)
            ).alias("is_late")
        )
    )
    w = Window.partitionBy("l_orderkey")
    return (
        late.withColumn("n_supp", F.count(F.lit(1)).over(w))
        .withColumn("n_late", F.sum("is_late").over(w))
        .filter((F.col("is_late") == 1) & (F.col("n_supp") > 1) & (F.col("n_late") == 1))
        .join(s.select("s_suppkey", "s_name"), F.col("s_suppkey") == F.col("l_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(100)
    )
