"""Analytics-surface widening (SURVEY §2.C tail): pivot / unpivot,
exact interpolated percentiles, order-deterministic collect aggregates,
and deterministic hash-based sampling (the reproducible train/holdout
splitter a 100 TB training-data pipeline needs — seed-free, engine-
portable, re-runnable).

Parity conventions follow the registry rules: money in DECIMAL,
collections sorted before comparison, md5 as the portable hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
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
        o.join(c.select("c_custkey", "c_mktsegment"), o.o_custkey == c.c_custkey)
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
    "gapfill_linear_interpolation",
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
    ), anchored AS (
      SELECT g.user_id, g.day, d.day_value,
        LAST_VALUE(d.day_value IGNORE NULLS) OVER (
          PARTITION BY g.user_id ORDER BY g.day
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS p_val,
        LAST_VALUE(CASE WHEN d.day_value IS NOT NULL THEN g.day END IGNORE NULLS)
          OVER (PARTITION BY g.user_id ORDER BY g.day
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS p_day,
        FIRST_VALUE(d.day_value IGNORE NULLS) OVER (
          PARTITION BY g.user_id ORDER BY g.day
          ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS n_val,
        FIRST_VALUE(CASE WHEN d.day_value IS NOT NULL THEN g.day END IGNORE NULLS)
          OVER (PARTITION BY g.user_id ORDER BY g.day
          ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS n_day
      FROM (SELECT user_id, day FROM users CROSS JOIN days) g
      LEFT JOIN daily d ON d.user_id = g.user_id AND d.day = g.day
    )
    SELECT user_id, day,
      CASE
        WHEN p_day IS NULL OR n_day IS NULL THEN NULL
        WHEN p_day = n_day THEN p_val
        ELSE p_val + (n_val - p_val)
          * (CAST(date_diff('day', p_day::DATE, day::DATE) AS DOUBLE)
             / CAST(date_diff('day', p_day::DATE, n_day::DATE) AS DOUBLE))
      END AS lin_value
    FROM anchored
    ORDER BY user_id, day
    """,
    "window", "pipeline", "timeseries",
)
def gapfill_linear_interpolation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series densification + LINEAR interpolation (the pandas
    resample('D').interpolate() idiom, distributed): gaps between two
    observed days are filled along the line joining them; edges (before
    the first / after the last observation) stay NULL — interpolation,
    never extrapolation. Observed days reproduce their own value exactly
    (p_day == n_day branch, no 0/0).

    Scale: same shape as the forward-fill — tiny broadcast calendar,
    one shuffle on user_id serving the left join and ALL FOUR window
    functions (two frames, one partition spec, exchange reused). The
    arithmetic is scalar double ops on each row — identical IEEE
    sequence in both engines, so the hash gate holds bit-for-bit.
    """
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
    base = Window.partitionBy("user_id").orderBy("day")
    prev_w = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    next_w = base.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    obs_day = F.when(F.col("day_value").isNotNull(), F.col("day"))
    anchored = (
        grid.join(daily, ["user_id", "day"], "left")
        .withColumn("p_val", F.last("day_value", ignorenulls=True).over(prev_w))
        .withColumn("p_day", F.last(obs_day, ignorenulls=True).over(prev_w))
        .withColumn("n_val", F.first("day_value", ignorenulls=True).over(next_w))
        .withColumn("n_day", F.first(obs_day, ignorenulls=True).over(next_w))
    )
    frac = F.datediff(F.col("day"), F.col("p_day")).cast("double") / F.datediff(
        F.col("n_day"), F.col("p_day")
    ).cast("double")
    return anchored.select(
        "user_id",
        "day",
        F.when(F.col("p_day").isNull() | F.col("n_day").isNull(), F.lit(None))
        .when(F.col("p_day") == F.col("n_day"), F.col("p_val"))
        .otherwise(F.col("p_val") + (F.col("n_val") - F.col("p_val")) * frac)
        .alias("lin_value"),
    ).orderBy("user_id", "day")


@query(
    "window_moving_median_order_value",
    """
    SELECT o_custkey, o_orderkey, o_totalprice,
      MEDIAN(o_totalprice) OVER (
        PARTITION BY o_custkey
        ORDER BY o_orderdate, o_orderkey
        ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS med7
    FROM orders
    WHERE o_custkey < 200
    ORDER BY o_custkey, o_orderkey
    """,
    "window", "stats", "timeseries",
)
def window_moving_median_order_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Moving EXACT median (robust rolling baseline — the outlier-proof
    cousin of a moving average) of each customer's order values over a
    7-order sliding frame. The frame is made deterministic by the
    (o_orderdate, o_orderkey) tiebreak — without the key, equal-date
    orders could enter frames in either order and flip the median.

    Scale: one exchange on o_custkey; the frame is ROWS-bounded (7), so
    per-row work is O(frame log frame) regardless of a customer's order
    count — no unbounded state. Spark's `median` aggregate rejects
    window frames (INVALID_WINDOW_SPEC_FOR_AGGREGATION_FUNC), so the
    frame's values are gathered with collect_list over the same window
    — bounded at 7 elements, still whole-stage-codegen array math — and
    the median taken from the sorted array. Exactness: the median of an
    odd frame is an element; of an even frame the midpoint average of
    two doubles — the same IEEE op both engines, so the hash gate
    holds."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") < 200)
    from pyspark.sql import Window

    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(-6, Window.currentRow)
    )
    arr = F.sort_array(F.collect_list("o_totalprice").over(w))
    n = F.size(arr)
    half = ((n + 1) / F.lit(2)).cast("int")  # ceil(n/2): exact when n odd
    lo = (n / F.lit(2)).cast("int")  # n/2: exact when n even
    odd = F.try_element_at(arr, half)
    even = (F.try_element_at(arr, lo) + F.try_element_at(arr, lo + 1)) / F.lit(2.0)
    # n == 0 guard: collect_list SKIPS nulls, so an all-null frame yields an
    # empty array and lo == 0 — and even try_element_at throws
    # INVALID_INDEX_OF_ZERO on index 0 under ANSI. MEDIAN of no non-null
    # values is NULL, matching the oracle.
    med = F.when(n == 0, F.lit(None)).when(n % 2 == 1, odd).otherwise(even)
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            med.alias("med7"),
        )
        .orderBy("o_custkey", "o_orderkey")
    )


@query(
    "sessionize_dynamic_gap",
    """
    WITH e AS (
      SELECT user_id, ts, event_id, value,
        ts + CASE event_type WHEN 'view' THEN 30
                             WHEN 'click' THEN 20
                             ELSE 45 END * INTERVAL 1 MINUTE AS endts
      FROM events WHERE user_id < 50
    ), o AS (
      SELECT *, MAX(endts) OVER (
          PARTITION BY user_id ORDER BY ts, event_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_end
      FROM e
    ), m AS (
      SELECT *, CASE WHEN prev_end IS NULL OR ts > prev_end
                     THEN 1 ELSE 0 END AS brk
      FROM o
    ), s AS (
      SELECT *, SUM(brk) OVER (
          PARTITION BY user_id ORDER BY ts, event_id) AS sess
      FROM m
    )
    SELECT user_id, MIN(ts) AS session_start, MAX(endts) AS session_end,
      COUNT(*) AS n_events,
      CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM s GROUP BY user_id, sess
    ORDER BY user_id, session_start
    """,
    "window", "timeseries", "session",
)
def sessionize_dynamic_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization with a PER-EVENT gap: a view keeps its session
    alive 30 minutes, a click 20, everything else 45 — the
    engagement-weighted timeout real clickstream analytics uses, which a
    fixed-gap sessionizer can't express. Spark side: the built-in
    `session_window` with a gap-duration COLUMN, evaluated entirely in
    the native session-merge exec (one shuffle on user_id, no UDF).

    The oracle rebuilds the same semantics from first principles —
    gaps-and-islands with a RUNNING MAX of per-event window ends
    (plain MAX-over-preceding; a session's reach is the furthest end
    seen so far, not the previous row's) — so the hash gate cross-checks
    Spark's native implementation against an independent derivation.
    Boundary pinned by probe: an event exactly AT the previous reach
    merges (break only when strictly later), hence `ts > prev_end`.
    """
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 50)
    gap = (
        F.when(F.col("event_type") == "view", F.lit("30 minutes"))
        .when(F.col("event_type") == "click", F.lit("20 minutes"))
        .otherwise(F.lit("45 minutes"))
    )
    return (
        ev.groupBy("user_id", F.session_window("ts", gap).alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "sum_value",
        )
        .orderBy("user_id", "session_start")
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


@query(
    "sessionize_events_gap",
    """
    WITH flagged AS (
      SELECT user_id, ts, event_id, value,
        CASE WHEN LAG(ts) OVER w IS NULL
               OR ts - LAG(ts) OVER w > INTERVAL 30 MINUTE
             THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sess AS (
      SELECT *, CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                            ROWS UNBOUNDED PRECEDING) AS BIGINT)
        AS session_seq
      FROM flagged
    )
    SELECT user_id, session_seq,
      COUNT(*) AS n_events,
      MIN(ts) AS session_start,
      MAX(ts) AS session_end,
      CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS session_value
    FROM sess
    GROUP BY user_id, session_seq
    ORDER BY user_id, session_seq
    """,
    "window", "timeseries", "pipeline",
)
def sessionize_events_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization — the gap-based session id assignment every
    clickstream/training-telemetry pipeline needs (the batch twin of the
    streaming `session_window` query): a new session starts when a user
    is idle > 30 minutes; session ids are the running count of
    session-start flags. Scale: ONE shuffle on user_id serves the lag
    window, the running sum, and the final per-session aggregate (same
    clustering — Catalyst reuses the exchange); per-user window state is
    a single row. Ties broken by event_id so the flag assignment is
    deterministic."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    new_session = F.when(
        F.lag("ts").over(w).isNull()
        | (F.col("ts") - F.lag("ts").over(w) > F.expr("INTERVAL 30 MINUTES")),
        1,
    ).otherwise(0)
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        ev.select("user_id", "ts", "event_id", "value")
        .withColumn("new_session", new_session)
        .withColumn("session_seq", F.sum("new_session").over(run))
        .groupBy("user_id", "session_seq")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("session_value"),
        )
        .orderBy("user_id", "session_seq")
    )


@query(
    "rollup_hierarchical_event_stats",
    """
    SELECT event_type, date_trunc('day', ts) AS day,
      COUNT(*) AS n_events,
      CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
      MIN(value) AS min_value,
      MAX(value) AS max_value,
      CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_value
    FROM events
    GROUP BY event_type, date_trunc('day', ts)
    ORDER BY event_type, day
    """,
    "agg", "timeseries", "pipeline",
)
def rollup_hierarchical_event_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical (hypertable-style) rollup: events aggregate to HOURLY
    partials first, and the daily result REAGGREGATES the hourly layer —
    sum of sums, min of mins, count of counts — never touching raw rows
    twice. This is the continuous-aggregate pattern for 100 TB telemetry:
    the hourly layer is what you'd persist and incrementally refresh;
    every coarser granularity derives from it (cheap — one row per
    (type, hour)), and the avg derives from reaggregated sum/count, not
    an avg of avgs. The oracle computes the same result directly from raw
    events, proving reaggregation correctness. DECIMAL partials keep the
    double sums order-independent across both layers."""
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("hour")
    ).agg(
        F.count(F.lit(1)).alias("h_n"),
        F.sum(F.col("value").cast("decimal(18,2)")).alias("h_sum"),
        F.min("value").alias("h_min"),
        F.max("value").alias("h_max"),
    )
    return (
        hourly.groupBy("event_type", F.date_trunc("day", F.col("hour")).alias("day"))
        .agg(
            F.sum("h_n").alias("n_events"),
            F.sum("h_sum").cast("double").alias("sum_value"),
            F.min("h_min").alias("min_value"),
            F.max("h_max").alias("max_value"),
            (F.sum("h_sum").cast("double") / F.sum("h_n")).alias("avg_value"),
        )
        .orderBy("event_type", "day")
    )


@query(
    "merge_upsert_customer_scores",
    """
    WITH target AS (
      SELECT c_custkey, c_acctbal AS score FROM customer WHERE c_custkey % 3 <> 0
    ), updates AS (
      SELECT c_custkey, c_acctbal + 100.0 AS score FROM customer WHERE c_custkey % 2 = 0
    )
    SELECT COALESCE(t.c_custkey, u.c_custkey) AS c_custkey,
      COALESCE(u.score, t.score) AS score,
      CASE WHEN t.c_custkey IS NULL THEN 'insert'
           WHEN u.c_custkey IS NULL THEN 'keep'
           ELSE 'update' END AS action
    FROM target t FULL OUTER JOIN updates u ON t.c_custkey = u.c_custkey
    ORDER BY c_custkey
    """,
    "join", "sink", "pipeline",
)
def merge_upsert_customer_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE/upsert semantics on a scored table without a table format
    that has MERGE INTO: full-outer join of target and updates, source
    value wins where present (matched → update, unmatched source →
    insert, unmatched target → keep). This is the A8 writeback pattern
    generalized to set-oriented maintenance — at scale both sides
    shuffle once on the key (or the updates side broadcasts when small,
    the common case for incremental scoring); the result overwrites the
    scored-table partition. The `action` tag makes the row-level merge
    decision auditable — and hash-checkable."""
    c = load_table(spark, sf_dir, "customer")
    target = c.filter(F.col("c_custkey") % 3 != 0).select(
        "c_custkey", F.col("c_acctbal").alias("score")
    )
    updates = c.filter(F.col("c_custkey") % 2 == 0).select(
        "c_custkey", (F.col("c_acctbal") + 100.0).alias("score")
    )
    t, u = target.alias("t"), updates.alias("u")
    return (
        t.join(u, F.col("t.c_custkey") == F.col("u.c_custkey"), "full_outer")
        .select(
            F.coalesce(F.col("t.c_custkey"), F.col("u.c_custkey")).alias("c_custkey"),
            F.coalesce(F.col("u.score"), F.col("t.score")).alias("score"),
            F.when(F.col("t.c_custkey").isNull(), "insert")
            .when(F.col("u.c_custkey").isNull(), "keep")
            .otherwise("update")
            .alias("action"),
        )
        .orderBy("c_custkey")
    )


@query(
    "sample_stratified_documents",
    """
    SELECT lang, COUNT(*) AS n_sampled, CAST(SUM(n_chars) AS BIGINT) AS chars
    FROM (
      SELECT *, ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100
        AS bucket
      FROM documents
    ) d
    WHERE bucket < (CASE WHEN lang = 'en' THEN 10 ELSE 40 END)
    GROUP BY lang ORDER BY lang
    """,
    "pipeline", "sample",
)
def sample_stratified_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified deterministic sampling — per-stratum rates (10% of the
    dominant 'en' stratum, 40% of everything else): the
    rebalance-by-downsampling step of corpus construction, done with the
    same md5 bucketing as `sample_deterministic_documents` so the
    selection is engine- and run-stable (df.sampleBy is seed- and
    partition-layout-dependent — unusable for reproducible corpora).
    Scale: narrow map + scan-side filter, no shuffle before the tiny
    per-stratum aggregate."""
    d = load_table(spark, sf_dir, "documents")
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("bigint")
        % 100
    )
    rate = F.when(F.col("lang") == "en", 10).otherwise(40)
    return (
        d.withColumn("bucket", bucket)
        .filter(F.col("bucket") < rate)
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_sampled"),
            F.sum("n_chars").cast("bigint").alias("chars"),
        )
        .orderBy("lang")
    )


@query(
    "feature_decayed_engagement",
    """
    WITH e AS (
      SELECT user_id, event_id, value,
        CAST(epoch_us(ts) AS DOUBLE) / 86400000000.0 AS td
      FROM events WHERE user_id < 50
    ), n AS (
      SELECT user_id, event_id, value,
        td - MIN(td) OVER (PARTITION BY user_id) AS d
      FROM e
    )
    SELECT user_id, event_id,
      ROUND(
        SUM(value * exp(d / 7.0)) OVER (
          PARTITION BY user_id ORDER BY d, event_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
        ) * exp(-d / 7.0), 6) AS decayed_sum
    FROM n ORDER BY user_id, event_id
    """,
    "window", "feature", "timeseries",
)
def feature_decayed_engagement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially time-decayed engagement score per user (7-day
    half-life-ish τ): decayed_i = Σ_{j≤i} v_j·exp(-(t_i-t_j)/τ) — the
    standard recency-weighted feature for scoring models, computed WITHOUT
    a stateful UDAF via the factorization Σ v_j·exp(t_j/τ) · exp(-t_i/τ):
    one ordered running sum per user. Times are normalized to days since
    the user's first event (one extra window min) so the exponentials stay
    in range regardless of epoch magnitude.

    Scale: two windows over the same (user_id) partitioning — one
    exchange, state is a single running double per user; no UDAF, no
    Python. Ordered running sums accumulate in the same row order on both
    engines, so rounding to 6 dp is deterministic. The τ knob moves into
    a column for per-segment decay without changing the plan."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 50)
    td = (F.unix_micros(F.col("ts").cast("timestamp")) / F.lit(86_400_000_000.0))
    e = ev.select("user_id", "event_id", "value", td.alias("td"))
    w_min = Window.partitionBy("user_id")
    n = e.withColumn("d", F.col("td") - F.min("td").over(w_min))
    w_run = (
        Window.partitionBy("user_id")
        .orderBy("d", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    decayed = (
        F.sum(F.col("value") * F.exp(F.col("d") / 7.0)).over(w_run)
        * F.exp(-F.col("d") / 7.0)
    )
    return n.select(
        "user_id", "event_id", F.round(decayed, 6).alias("decayed_sum")
    ).orderBy("user_id", "event_id")


@query(
    "stats_ab_welch_ttest",
    """
    WITH s AS (
      SELECT
        COUNT(*) FILTER (WHERE user_id % 2 = 1 AND value IS NOT NULL) AS n_t,
        COUNT(*) FILTER (WHERE user_id % 2 = 0 AND value IS NOT NULL) AS n_c,
        CAST(SUM(CAST(value AS DECIMAL(18,2)))
             FILTER (WHERE user_id % 2 = 1) AS DOUBLE) AS sum_t,
        CAST(SUM(CAST(value AS DECIMAL(18,2)))
             FILTER (WHERE user_id % 2 = 0) AS DOUBLE) AS sum_c,
        CAST(SUM(CAST(value * value AS DECIMAL(28,4)))
             FILTER (WHERE user_id % 2 = 1) AS DOUBLE) AS ss_t,
        CAST(SUM(CAST(value * value AS DECIMAL(28,4)))
             FILTER (WHERE user_id % 2 = 0) AS DOUBLE) AS ss_c
      FROM events
    )
    SELECT n_t AS n_treat, n_c AS n_control,
      sum_t / n_t AS mean_treat,
      sum_c / n_c AS mean_control,
      CASE WHEN n_t >= 2 AND n_c >= 2 THEN
        ((sum_t / n_t) - (sum_c / n_c))
          / sqrt(((ss_t - sum_t * sum_t / n_t) / (n_t - 1)) / n_t
               + ((ss_c - sum_c * sum_c / n_c) / (n_c - 1)) / n_c)
      END AS t_stat
    FROM s
    """,
    "stats", "agg",
)
def stats_ab_welch_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch two-sample t-test over an A/B split (odd user_id =
    treatment) — the experiment-analysis primitive computed the only
    way that is deterministic on a cluster: every statistic derives
    from EXACT mergeable sums (count, DECIMAL sum, DECIMAL sum of
    squares — the 2-dp values square to exact 4-dp), and the means /
    variances / t-statistic are evaluated in ONE final double
    projection with the identical expression tree the oracle states.
    Partial-aggregation order can touch none of it, so the hash gate
    holds to the last bit.

    Scale: one conditional aggregation pass, map-side partials, a
    single-row shuffle. The same exact-sums trick extends to any
    moment-based statistic (CUPED adjustment, variance reduction) —
    accumulate exact low-order moments, derive at the end."""
    ev = load_table(spark, sf_dir, "events")
    treat = F.col("user_id") % 2 == 1

    def fsum(col: F.Column, cond) -> F.Column:
        return F.sum(F.when(cond, col))

    s = ev.agg(
        F.count(F.when(treat & F.col("value").isNotNull(), 1)).alias("n_t"),
        F.count(F.when(~treat & F.col("value").isNotNull(), 1)).alias("n_c"),
        fsum(F.col("value").cast("decimal(18,2)"), treat).cast("double").alias("sum_t"),
        fsum(F.col("value").cast("decimal(18,2)"), ~treat).cast("double").alias("sum_c"),
        fsum((F.col("value") * F.col("value")).cast("decimal(28,4)"), treat)
        .cast("double")
        .alias("ss_t"),
        fsum((F.col("value") * F.col("value")).cast("decimal(28,4)"), ~treat)
        .cast("double")
        .alias("ss_c"),
    )
    mean_t = F.col("sum_t") / F.col("n_t")
    mean_c = F.col("sum_c") / F.col("n_c")
    var_t = (F.col("ss_t") - F.col("sum_t") * F.col("sum_t") / F.col("n_t")) / (
        F.col("n_t") - 1
    )
    var_c = (F.col("ss_c") - F.col("sum_c") * F.col("sum_c") / F.col("n_c")) / (
        F.col("n_c") - 1
    )
    # degenerate-sample guard: with fewer than 2 observations on either
    # side the variance's n-1 denominator hits zero and the engines
    # diverge on 0-division doubles (Inf vs NULL) — the statistically
    # honest answer is NULL, stated identically by the oracle's CASE
    t = F.when(
        (F.col("n_t") >= 2) & (F.col("n_c") >= 2),
        (mean_t - mean_c) / F.sqrt(var_t / F.col("n_t") + var_c / F.col("n_c")),
    )
    return s.select(
        F.col("n_t").alias("n_treat"),
        F.col("n_c").alias("n_control"),
        mean_t.alias("mean_treat"),
        mean_c.alias("mean_control"),
        t.alias("t_stat"),
    )


@query(
    "window_ratio_to_report",
    """
    WITH nat AS (
      SELECT r_name, n_name,
        SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS total_dec
      FROM orders
        JOIN customer ON c_custkey = o_custkey
        JOIN nation ON n_nationkey = c_nationkey
        JOIN region ON r_regionkey = n_regionkey
      GROUP BY r_name, n_name
    )
    SELECT r_name, n_name,
      CAST(CAST(total_dec AS VARCHAR) AS DOUBLE) AS total,
      CAST(CAST(total_dec AS VARCHAR) AS DOUBLE)
        / CAST(CAST(SUM(total_dec) OVER (PARTITION BY r_name) AS VARCHAR)
               AS DOUBLE) AS share
    FROM nat
    ORDER BY r_name, n_name
    """,
    "window", "agg",
)
def window_ratio_to_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ratio-to-report (percent-of-total) — each nation's share of its
    region's order revenue. The float trap: a window SUM over DOUBLE is
    partial-order-dependent, so the share would be engine- and
    partitioning-unstable in the last bit. Both levels therefore sum in
    exact DECIMAL — the per-nation total AND the window's region total
    (decimal window aggregation is order-independent) — and only the
    final division runs in doubles, on the identical operand pair in
    both engines. One exchange on the region key serves the window;
    the dimension joins broadcast."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    from pyspark.sql import Window

    nat = (
        o.join(c.select("c_custkey", "c_nationkey"), o.o_custkey == c.c_custkey)
        .join(
            F.broadcast(n.select("n_nationkey", "n_name", "n_regionkey")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .join(
            F.broadcast(r.select("r_regionkey", "r_name")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .groupBy("r_name", "n_name")
        .agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("total_dec"))
    )
    w = Window.partitionBy("r_name")
    return nat.select(
        "r_name",
        "n_name",
        # string-bridged decimal→double (r7, sf10 spot-sweep lesson): a
        # region's total passes 2^53 unscaled cents at ~sf10, where the
        # engines' direct decimal→double casts can disagree by one ulp;
        # decimal→string→double is correctly rounded on both
        F.col("total_dec").cast("string").cast("double").alias("total"),
        (
            F.col("total_dec").cast("string").cast("double")
            / F.sum("total_dec").over(w).cast("string").cast("double")
        ).alias("share"),
    ).orderBy("r_name", "n_name")


@query(
    "trend_mom_revenue_growth",
    """
    WITH m AS (
      SELECT date_trunc('month', o_orderdate) AS mth,
        SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev_dec
      FROM orders GROUP BY mth
    )
    SELECT mth,
      CAST(rev_dec AS DOUBLE) AS revenue,
      CAST(LAG(rev_dec) OVER (ORDER BY mth) AS DOUBLE) AS prev_revenue,
      (CAST(rev_dec AS DOUBLE)
       - CAST(LAG(rev_dec) OVER (ORDER BY mth) AS DOUBLE))
        / CAST(LAG(rev_dec) OVER (ORDER BY mth) AS DOUBLE) AS mom_growth
    FROM m ORDER BY mth
    """,
    "window", "timeseries", "agg",
)
def trend_mom_revenue_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-over-month growth — the period-over-period trend every BI
    layer ships: monthly revenue in exact DECIMAL, LAG carries the
    prior month's EXACT value (lagging the decimal, not the double,
    so no re-rounding drift), and the growth ratio is one double
    division on identical operands both engines. The first month's
    growth is NULL by LAG semantics, not zero — the honest answer.
    Scale: the month grain collapses the table map-side; the window
    runs over |months| rows."""
    o = load_table(spark, sf_dir, "orders")
    from pyspark.sql import Window

    m = o.groupBy(F.date_trunc("month", "o_orderdate").alias("mth")).agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("rev_dec")
    )
    w = Window.orderBy("mth")
    prev = F.lag("rev_dec").over(w)
    return m.select(
        "mth",
        F.col("rev_dec").cast("double").alias("revenue"),
        prev.cast("double").alias("prev_revenue"),
        (
            (F.col("rev_dec").cast("double") - prev.cast("double"))
            / prev.cast("double")
        ).alias("mom_growth"),
    ).orderBy("mth")


@query(
    "pareto_cumulative_revenue_share",
    """
    WITH c AS (
      SELECT o_custkey, SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev_dec
      FROM orders GROUP BY o_custkey
    ), ranked AS (
      SELECT o_custkey, rev_dec,
        ROW_NUMBER() OVER (ORDER BY rev_dec DESC, o_custkey) AS rnk,
        SUM(rev_dec) OVER (ORDER BY rev_dec DESC, o_custkey
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
          AS cum_dec,
        SUM(rev_dec) OVER () AS total_dec,
        COUNT(*) OVER () AS n_cust
      FROM c
    )
    SELECT rnk, o_custkey,
      CAST(CAST(rev_dec AS VARCHAR) AS DOUBLE) AS revenue,
      CAST(CAST(cum_dec AS VARCHAR) AS DOUBLE)
        / CAST(CAST(total_dec AS VARCHAR) AS DOUBLE) AS cum_share,
      CAST(rnk AS DOUBLE) / n_cust AS cust_frac
    FROM ranked
    WHERE rnk <= 100
    ORDER BY rnk
    """,
    "window", "agg",
)
def pareto_cumulative_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto (80/20) concentration curve: customers ranked by revenue,
    cumulative share of total against cumulative fraction of customers —
    the 'how few customers are half the business' readout. Every sum on
    the path (per-customer, running, grand total) stays in exact
    DECIMAL; the two divisions to double happen last, per row, on
    identical operands. The running frame needs a TOTAL order —
    (revenue DESC, custkey) — or ties would make the cumulative sums
    partitioning-dependent. Scale: one shuffle to the customer grain,
    one global window over |customers| rows (top-100 output; at larger
    grains pre-bucket by revenue percentile, same algebra per bucket)."""
    o = load_table(spark, sf_dir, "orders")
    from pyspark.sql import Window

    c = o.groupBy("o_custkey").agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("rev_dec")
    )
    order = [F.desc("rev_dec"), F.asc("o_custkey")]
    w_run = Window.orderBy(*order).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    w_all = Window.partitionBy()
    ranked = c.select(
        F.row_number().over(Window.orderBy(*order)).alias("rnk"),
        "o_custkey",
        "rev_dec",
        F.sum("rev_dec").over(w_run).alias("cum_dec"),
        F.sum("rev_dec").over(w_all).alias("total_dec"),
        F.count(F.lit(1)).over(w_all).alias("n_cust"),
    )
    return (
        ranked.filter(F.col("rnk") <= 100)
        .select(
            "rnk",
            "o_custkey",
            # string-bridged decimal→double (r7): the grand total and the
            # deep cumulative sums pass 2^53 unscaled cents by ~sf10;
            # see stats_gini_revenue for the full rationale
            F.col("rev_dec").cast("string").cast("double").alias("revenue"),
            (
                F.col("cum_dec").cast("string").cast("double")
                / F.col("total_dec").cast("string").cast("double")
            ).alias("cum_share"),
            (F.col("rnk").cast("double") / F.col("n_cust")).alias("cust_frac"),
        )
        .orderBy("rnk")
    )


@query(
    "agg_mode_deterministic",
    """
    WITH counts AS (
      SELECT user_id, event_type, COUNT(*) AS n
      FROM events GROUP BY user_id, event_type
    )
    SELECT user_id, event_type AS mode_type, n AS mode_count FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY user_id ORDER BY n DESC, event_type) AS rn
      FROM counts
    ) t WHERE rn = 1
    ORDER BY user_id
    """,
    "agg", "stats",
)
def agg_mode_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic MODE (most frequent value) per group. Native
    `mode()` is the trap: both engines leave tie-breaking
    implementation-defined, so two users with a 3-3 view/click split
    can flip between runs, partitionings, or engines. The portable
    form makes the tie rule explicit — (count DESC, value ASC) — via
    count-then-rank, which is also the scale shape: the heavy work is
    an ordinary two-key aggregation with map-side partials, and the
    rank runs over |user x distinct-type| rows, never buffering raw
    events."""
    ev = load_table(spark, sf_dir, "events")
    from pyspark.sql import Window

    counts = ev.groupBy("user_id", "event_type").agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("user_id").orderBy(F.desc("n"), F.asc("event_type"))
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("event_type").alias("mode_type"),
            F.col("n").alias("mode_count"),
        )
        .orderBy("user_id")
    )


@query(
    "stats_weighted_median",
    """
    WITH w AS (
      SELECT l_returnflag, l_extendedprice AS v,
        CAST(l_quantity AS BIGINT) AS wt
      FROM lineitem
    ), ranked AS (
      SELECT *,
        SUM(wt) OVER (PARTITION BY l_returnflag ORDER BY v, wt
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        SUM(wt) OVER (PARTITION BY l_returnflag) AS total
      FROM w
    )
    SELECT l_returnflag, MIN(v) AS weighted_median
    FROM ranked WHERE 2 * cum >= total
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    "stats", "window", "agg",
)
def stats_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted median — the smallest value whose cumulative weight
    reaches half the total (each price weighted by its quantity): the
    robust center that plain median gets wrong whenever observations
    carry different mass. Exact by construction: weights are integer,
    the cumulative and total sums are integer window aggregates under
    a TOTAL order (value, weight — ties cannot shift the crossing
    point), and the threshold test is the integer cross-multiplication
    2*cum >= total, no division anywhere. Scale: one exchange on the
    group key serves both window sums; the crossing-point filter and
    MIN collapse without another shuffle."""
    li = load_table(spark, sf_dir, "lineitem")
    from pyspark.sql import Window

    w = li.select(
        "l_returnflag",
        F.col("l_extendedprice").alias("v"),
        F.col("l_quantity").cast("bigint").alias("wt"),
    )
    run = (
        Window.partitionBy("l_returnflag")
        .orderBy("v", "wt")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ranked = w.withColumn("cum", F.sum("wt").over(run)).withColumn(
        "total", F.sum("wt").over(Window.partitionBy("l_returnflag"))
    )
    return (
        ranked.filter(2 * F.col("cum") >= F.col("total"))
        .groupBy("l_returnflag")
        .agg(F.min("v").alias("weighted_median"))
        .orderBy("l_returnflag")
    )


@query(
    "stats_chi_square_independence",
    """
    WITH obs AS (
      SELECT CASE WHEN user_id % 2 = 1 THEN 'odd' ELSE 'even' END AS seg,
        event_type, COUNT(*) AS n
      FROM events GROUP BY seg, event_type
    ), tot AS (
      SELECT SUM(n) AS total FROM obs
    ), margins AS (
      SELECT o.seg, o.event_type, o.n,
        SUM(o.n) OVER (PARTITION BY o.seg) AS row_n,
        SUM(o.n) OVER (PARTITION BY o.event_type) AS col_n
      FROM obs o
    )
    SELECT seg, event_type, n,
      CAST(row_n AS DOUBLE) * col_n / total AS expected,
      (n - CAST(row_n AS DOUBLE) * col_n / total)
        * (n - CAST(row_n AS DOUBLE) * col_n / total)
        / (CAST(row_n AS DOUBLE) * col_n / total) AS chi2_term
    FROM margins, tot
    ORDER BY seg, event_type
    """,
    "stats", "agg",
)
def stats_chi_square_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square independence screen (user segment x event type) — the
    categorical counterpart of the Welch t-test: per-cell observed
    counts, expected counts under independence (row x col / total), and
    the chi-square contribution of each cell. Every count is an exact
    integer (one aggregation pass + two marginal windows over the 10
    cells); each expected value and chi2 term is derived PER CELL in
    one double expression with no cross-row float accumulation, so the
    hash gate holds. (The caller sums chi2_term against the chi-square
    CDF off-engine; emitting per-cell terms also shows WHERE the
    dependence lives, which the scalar statistic hides.)"""
    ev = load_table(spark, sf_dir, "events")
    from pyspark.sql import Window

    obs = ev.groupBy(
        F.when(F.col("user_id") % 2 == 1, F.lit("odd"))
        .otherwise(F.lit("even"))
        .alias("seg"),
        "event_type",
    ).agg(F.count(F.lit(1)).alias("n"))
    withm = obs.withColumn(
        "row_n", F.sum("n").over(Window.partitionBy("seg"))
    ).withColumn("col_n", F.sum("n").over(Window.partitionBy("event_type")))
    total = obs.agg(F.sum("n").alias("total"))
    expected = F.col("row_n").cast("double") * F.col("col_n") / F.col("total")
    return (
        withm.crossJoin(F.broadcast(total))
        .select(
            "seg",
            "event_type",
            "n",
            expected.alias("expected"),
            (
                (F.col("n") - expected) * (F.col("n") - expected) / expected
            ).alias("chi2_term"),
        )
        .orderBy("seg", "event_type")
    )


@query(
    "stats_categorical_entropy_per_user",
    """
    WITH counts AS (
      SELECT user_id, event_type, COUNT(*) AS n
      FROM events WHERE user_id < 60 GROUP BY user_id, event_type
    ), packed AS (
      SELECT user_id, SUM(n) AS total,
        list_sort(list(n)) AS ns
      FROM counts GROUP BY user_id
    )
    SELECT user_id, CAST(total AS BIGINT) AS n_events,
      round(list_reduce(
        list_transform(ns, x -> -(CAST(x AS DOUBLE) / total)
                                 * ln(CAST(x AS DOUBLE) / total)),
        (p, q) -> p + q), 9) AS entropy_nats
    FROM packed
    ORDER BY user_id
    """,
    "stats", "agg",
)
def stats_categorical_entropy_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Behavioral entropy per user (how spread their activity is across
    event types) — and a demonstration of DETERMINISTIC float
    summation: -Σ p·ln(p) over a handful of terms would normally be
    partial-agg-order-dependent, so the counts are packed into a
    SORTED array first and the entropy computed by a left fold over it
    — a sequential, order-pinned reduction both engines execute
    identically (Spark aggregate == DuckDB list_reduce), rounded to 9
    dp at the end. The heavy work stays exact-integer aggregation;
    only the bounded per-user fold (<= 5 terms) runs in floats."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 60)
    counts = ev.groupBy("user_id", "event_type").agg(F.count(F.lit(1)).alias("n"))
    packed = counts.groupBy("user_id").agg(
        F.sum("n").alias("total"), F.array_sort(F.collect_list("n")).alias("ns")
    )
    p = lambda x: x.cast("double") / F.col("total")  # noqa: E731
    entropy = F.aggregate(
        F.transform("ns", lambda x: -p(x) * F.log(p(x))),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    return packed.select(
        "user_id",
        F.col("total").cast("bigint").alias("n_events"),
        F.round(entropy, 9).alias("entropy_nats"),
    ).orderBy("user_id")


@query(
    "stats_gini_revenue",
    """
    WITH c AS (
      SELECT o_custkey, SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
      FROM orders GROUP BY o_custkey
    ), ranked AS (
      SELECT rev, ROW_NUMBER() OVER (ORDER BY rev, o_custkey) AS i,
        COUNT(*) OVER () AS n
      FROM c WHERE rev IS NOT NULL
    )
    SELECT CAST(MAX(n) AS BIGINT) AS n_customers,
      2.0 * CAST(CAST(SUM(i * rev) AS VARCHAR) AS DOUBLE)
        / (MAX(n) * CAST(CAST(SUM(rev) AS VARCHAR) AS DOUBLE))
        - (MAX(n) + 1.0) / MAX(n) AS gini
    FROM ranked
    """,
    "stats", "window", "agg",
)
def stats_gini_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of customer revenue concentration — the scalar
    the Pareto curve integrates to. Computed by the rank formula
    G = 2·Σ(i·x_i)/(n·Σx_i) − (n+1)/n over ascending-sorted revenues,
    and EXACT until the last step: revenues are DECIMAL, ranks are
    integers, so Σ(i·x_i) and Σx_i are exact decimal sums under a total
    order (rev, custkey); the two casts and three float ops happen once
    on identical operands. The decimal→double casts go through a STRING
    BRIDGE (cast to string, then to double): at sf10 the sf10 spot-sweep
    caught Σ(i·x_i) past 2^53 unscaled diverging by one ulp between the
    engines' direct decimal→double casts (the r6 bug class — and here
    the integer part alone exceeds 2^53, so the r6 round-first fix can't
    apply). Decimal→string is exact and string→double is correctly
    rounded on BOTH engines (Java parseDouble / C strtod), so the bridge
    yields the bit-identical correctly-rounded double of the exact sum
    at any magnitude. Scale: customer-grain aggregation then one
    global window — same envelope as the Pareto query, one scalar out.

    Customers with NO observed revenue (every order price NULL) are
    EXCLUDED before ranking (round-6 fix, found by the sf0.1 null-regime
    sweep): a NULL can't take a rank in the Lorenz order, and leaving
    it in makes the ranks engine-dependent — Spark sorts NULLS FIRST
    ascending where DuckDB sorts NULLS LAST, shifting every i."""
    o = load_table(spark, sf_dir, "orders")
    from pyspark.sql import Window

    c = o.groupBy("o_custkey").agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("rev")
    ).filter(F.col("rev").isNotNull())
    ranked = c.select(
        "rev",
        F.row_number().over(Window.orderBy("rev", "o_custkey")).alias("i"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("n"),
    )
    return ranked.agg(
        F.max("n").cast("bigint").alias("n_customers"),
        (
            F.lit(2.0)
            * F.sum(F.col("i") * F.col("rev")).cast("string").cast("double")
            / (F.max("n") * F.sum("rev").cast("string").cast("double"))
            - (F.max("n") + F.lit(1.0)) / F.max("n")
        ).alias("gini"),
    )
