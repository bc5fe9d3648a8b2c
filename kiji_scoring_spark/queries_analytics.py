"""Analytics-surface widening (SURVEY §2.C tail): pivot / unpivot,
exact interpolated percentiles, order-deterministic collect aggregates,
and deterministic hash-based sampling (the reproducible train/holdout
splitter a 100 TB training-data pipeline needs — seed-free, engine-
portable, re-runnable).

Parity conventions follow the registry rules: money in DECIMAL,
collections sorted before comparison, md5 as the portable hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .queries import query
from .sources import load_table


@query(
    "pivot_segment_revenue_by_status",
    """
    SELECT c_mktsegment,
      CAST(SUM(CASE WHEN o_orderstatus = 'F'
               THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS rev_f,
      CAST(SUM(CASE WHEN o_orderstatus = 'O'
               THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS rev_o,
      CAST(SUM(CASE WHEN o_orderstatus = 'P'
               THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS rev_p
    FROM orders JOIN customer ON c_custkey = o_custkey
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
    "agg", "pivot",
)
def pivot_segment_revenue_by_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT: order revenue per market segment, one column per order
    status. Spark's `groupBy().pivot(col, values)` with the value list
    pinned — an explicit list keeps the plan a single pass (no extra
    distinct-values job) and makes the output schema static, which is
    what a 100 TB run wants: the same conditional-aggregation plan as
    the hand-written CASE form, partial+final, one shuffle on the
    5-row group key."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    piv = (
        o.join(F.broadcast(c.select("c_custkey", "c_mktsegment")), o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double"))
    )
    return piv.select(
        "c_mktsegment",
        F.col("F").alias("rev_f"),
        F.col("O").alias("rev_o"),
        F.col("P").alias("rev_p"),
    ).orderBy("c_mktsegment")


@query(
    "unpivot_part_metrics",
    """
    SELECT p_partkey, metric, val FROM (
      SELECT p_partkey, 'size' AS metric, CAST(p_size AS DOUBLE) AS val FROM part
      UNION ALL
      SELECT p_partkey, 'retailprice' AS metric, p_retailprice AS val FROM part
    ) t
    WHERE p_partkey < 100
    ORDER BY p_partkey, metric
    """,
    "pivot",
)
def unpivot_part_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT (melt): wide part attributes to (key, metric, value)
    rows. `DataFrame.unpivot` is a zero-shuffle narrow transform —
    each input row expands in place, so it scales with scan bandwidth;
    the oracle shows the equivalent UNION ALL which would scan twice."""
    p = load_table(spark, sf_dir, "part").filter(F.col("p_partkey") < 100)
    return (
        p.select(
            "p_partkey",
            F.col("p_size").cast("double").alias("size"),
            F.col("p_retailprice").alias("retailprice"),
        )
        .unpivot("p_partkey", ["size", "retailprice"], "metric", "val")
        .orderBy("p_partkey", "metric")
    )


@query(
    "agg_exact_percentiles_quantity",
    """
    SELECT l_returnflag,
      quantile_cont(l_quantity, 0.25) AS q25,
      quantile_cont(l_quantity, 0.5)  AS median,
      quantile_cont(l_quantity, 0.75) AS q75
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
    "agg", "stats",
)
def agg_exact_percentiles_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (median + quartiles) per group.
    Spark `percentile` and DuckDB `quantile_cont` share the linear-
    interpolation definition, and l_quantity is integral so the
    interpolation arithmetic is exact. Scale note: exact percentile
    buffers per-group values — fine for bounded groups like the 3
    returnflags; the registry's `stats_quantiles_price` covers the
    approx_percentile path for unbounded cardinality."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.percentile("l_quantity", 0.25).alias("q25"),
            F.percentile("l_quantity", 0.5).alias("median"),
            F.percentile("l_quantity", 0.75).alias("q75"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "agg_collect_ordered_suppliers",
    """
    SELECT n_name,
      CAST(COUNT(*) AS BIGINT) AS n_suppliers,
      array_to_string(list_sort(list(s_name)), ',') AS supplier_csv
    FROM supplier JOIN nation ON n_nationkey = s_nationkey
    GROUP BY n_name ORDER BY n_name
    """,
    "agg",
)
def agg_collect_ordered_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collection aggregates (array_agg / string_agg analogs) made
    deterministic: collect_list order is execution-dependent, so the
    result is sorted before exposure (and serialized to CSV — sortable
    by any downstream comparator) — the only way a distributed collect
    can be reproducible. Scale: per-group arrays are bounded by
    suppliers-per-nation; for unbounded groups prefer top-k windows."""
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    sorted_names = F.array_sort(F.collect_list("s_name"))
    return (
        s.join(F.broadcast(n), F.col("n_nationkey") == F.col("s_nationkey"))
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_suppliers"),
            F.array_join(sorted_names, ",").alias("supplier_csv"),
        )
        .orderBy("n_name")
    )


@query(
    "sample_deterministic_documents",
    """
    SELECT lang, COUNT(*) AS n_sampled, CAST(SUM(n_chars) AS BIGINT) AS chars
    FROM (
      SELECT *, ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100
        AS bucket
      FROM documents
    ) d
    WHERE bucket < 10
    GROUP BY lang ORDER BY lang
    """,
    "pipeline", "sample",
)
def sample_deterministic_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~10% document sample via md5 bucketing — the
    training-pipeline splitter: the same doc lands in the same split on
    every engine, every run, every scale (unlike `df.sample`, whose
    seed is partition-layout-dependent). The hash is a narrow map over
    the scan — no shuffle until the small post-filter aggregate; at
    100 TB the filter drops 90% of rows before anything wide happens."""
    d = load_table(spark, sf_dir, "documents")
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("bigint")
        % 100
    )
    return (
        d.withColumn("bucket", bucket)
        .filter(F.col("bucket") < 10)
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_sampled"),
            F.sum("n_chars").cast("bigint").alias("chars"),
        )
        .orderBy("lang")
    )


@query(
    "gapfill_forward_daily_user_values",
    """
    WITH days AS (
      SELECT unnest(generate_series(TIMESTAMP '2024-01-01 00:00:00',
                                    TIMESTAMP '2024-01-30 00:00:00',
                                    INTERVAL 1 DAY)) AS day
    ), users AS (
      SELECT DISTINCT user_id FROM events
    ), daily AS (
      SELECT user_id, date_trunc('day', ts) AS day,
        CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS day_value
      FROM events GROUP BY user_id, date_trunc('day', ts)
    )
    SELECT g.user_id, g.day,
      LAST_VALUE(d.day_value IGNORE NULLS)
        OVER (PARTITION BY g.user_id ORDER BY g.day) AS filled_value
    FROM (SELECT user_id, day FROM users CROSS JOIN days) g
    LEFT JOIN daily d ON d.user_id = g.user_id AND d.day = g.day
    ORDER BY g.user_id, g.day
    """,
    "window", "pipeline", "timeseries",
)
def gapfill_forward_daily_user_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series densification + forward-fill (the pandas
    resample('D').ffill() idiom, distributed): every (user, day) cell
    over a fixed calendar, carrying the last observed daily value across
    gaps via last(ignorenulls) — days before a user's first event stay
    NULL. Scale: the calendar is a tiny broadcast literal; the grid is
    |users| × |days| rows but only (user_id, day, double) wide; one
    shuffle on user_id serves both the left join and the fill window
    (same clustering, Catalyst reuses the exchange)."""
    ev = load_table(spark, sf_dir, "events")
    from pyspark.sql import Window

    users = ev.select("user_id").distinct()
    days = spark.sql(
        "SELECT explode(sequence(timestamp_ntz'2024-01-01 00:00:00', "
        "timestamp_ntz'2024-01-30 00:00:00', interval 1 day)) AS day"
    )
    daily = ev.groupBy("user_id", F.date_trunc("day", F.col("ts")).alias("day")).agg(
        F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("day_value")
    )
    grid = users.crossJoin(F.broadcast(days))
    w = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        grid.join(daily, ["user_id", "day"], "left")
        .withColumn("filled_value", F.last("day_value", ignorenulls=True).over(w))
        .select("user_id", "day", "filled_value")
        .orderBy("user_id", "day")
    )


@query(
    "stats_iqr_outlier_values",
    """
    WITH q AS (
      SELECT event_type,
        quantile_cont(value, 0.25) AS q1,
        quantile_cont(value, 0.75) AS q3
      FROM events GROUP BY event_type
    )
    SELECT e.event_type,
      CAST(COUNT(*) AS BIGINT) AS n_outliers,
      MIN(value) AS min_outlier,
      MAX(value) AS max_outlier
    FROM events e JOIN q ON e.event_type = q.event_type
    WHERE value < q1 - 1.5 * (q3 - q1)
       OR value > q3 + 1.5 * (q3 - q1)
    GROUP BY e.event_type
    ORDER BY e.event_type
    """,
    "stats", "agg",
)
def stats_iqr_outlier_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IQR outlier detection (Tukey fences) per event type — the
    standard data-cleaning pass before training (the skewed events.value
    distribution actually has tail outliers; uniform columns like
    prices never trip a 1.5×IQR fence). Two jobs: exact quartiles per
    group (5 bounded groups), then the fences broadcast back into a
    scan-side filter — the second pass is filter + partial agg, no wide
    shuffle. The fences derive from identical quantile values on both
    engines, so the strict comparisons can't disagree."""
    ev = load_table(spark, sf_dir, "events")
    q = ev.groupBy("event_type").agg(
        F.percentile("value", 0.25).alias("q1"),
        F.percentile("value", 0.75).alias("q3"),
    )
    iqr = F.col("q3") - F.col("q1")
    return (
        ev.join(F.broadcast(q), "event_type")
        .filter(
            (F.col("value") < F.col("q1") - 1.5 * iqr)
            | (F.col("value") > F.col("q3") + 1.5 * iqr)
        )
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_outliers"),
            F.min("value").alias("min_outlier"),
            F.max("value").alias("max_outlier"),
        )
        .orderBy("event_type")
    )
