"""Behavioral / product-analytics operators (SURVEY §2.C extensions):
cohort retention, ordered funnels, fuzzy entity-resolution joins, and
fixed-width histograms.

The event-log analyses a product warehouse runs daily, plus the
entity-resolution join an identity pipeline needs. Parity rules: date
arithmetic via date_trunc (ISO weeks in both engines), conditional
aggregation instead of engine-specific funnel intrinsics, unit-cost
levenshtein (identical definition in Spark and DuckDB), and integer bin
arithmetic for histograms.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .queries import query
from .sources import load_table


# ---------------------------------------------------------------------------
# Cohort retention (first-seen week × activity week)
# ---------------------------------------------------------------------------

@query(
    "cohort_retention_weekly",
    """
    WITH firsts AS (
      SELECT user_id, date_trunc('week', MIN(ts)) AS cohort_week
      FROM events GROUP BY user_id
    ), activity AS (
      SELECT DISTINCT e.user_id, f.cohort_week,
        CAST(date_diff('day', f.cohort_week, date_trunc('week', e.ts)) // 7
             AS BIGINT) AS week_offset
      FROM events e JOIN firsts f USING (user_id)
    )
    SELECT cohort_week, week_offset,
      COUNT(*) AS n_active_users
    FROM activity
    GROUP BY cohort_week, week_offset
    ORDER BY cohort_week, week_offset
    """,
    "behavior", "agg", "timeseries",
)
def cohort_retention_weekly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention — users grouped by first-seen week, counted
    in every subsequent week they were active: the retention triangle
    every product-analytics warehouse materializes. date_trunc('week')
    is ISO-Monday in both engines and the offset is exact day arithmetic
    divided by 7 (integer), so no timezone/week-numbering drift.

    Scale: two shuffles — one user_id aggregate for first-seen, one
    (cohort, offset) aggregate after a user-keyed join. The firsts side
    is one row per user; at 100 TB both sides of the join are clustered
    on user_id so AQE plans a co-located join off the same exchange, and
    the DISTINCT dedupes (user, week) map-side before the final count."""
    ev = load_table(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    activity = (
        ev.join(firsts, "user_id")
        .select(
            "user_id",
            "cohort_week",
            (
                F.datediff(F.date_trunc("week", F.col("ts")), F.col("cohort_week"))
                .cast("long")
                / 7
            )
            .cast("long")
            .alias("week_offset"),
        )
        .distinct()
    )
    return (
        activity.groupBy("cohort_week", "week_offset")
        .agg(F.count(F.lit(1)).alias("n_active_users"))
        .orderBy("cohort_week", "week_offset")
    )


# ---------------------------------------------------------------------------
# Ordered funnel (view -> click -> purchase)
# ---------------------------------------------------------------------------

@query(
    "funnel_view_click_purchase",
    """
    WITH s1 AS (
      SELECT user_id,
        MIN(CASE WHEN event_type = 'view' THEN ts END) AS t_view
      FROM events GROUP BY user_id
    ), s2 AS (
      SELECT e.user_id, s1.t_view,
        MIN(CASE WHEN e.event_type = 'click' AND e.ts > s1.t_view
                 THEN e.ts END) AS t_click
      FROM events e JOIN s1 USING (user_id)
      GROUP BY e.user_id, s1.t_view
    ), s3 AS (
      SELECT e.user_id, s2.t_view, s2.t_click,
        MIN(CASE WHEN e.event_type = 'purchase' AND e.ts > s2.t_click
                 THEN e.ts END) AS t_purchase
      FROM events e JOIN s2 USING (user_id)
      GROUP BY e.user_id, s2.t_view, s2.t_click
    )
    SELECT
      CAST(COUNT(t_view) AS BIGINT) AS n_view,
      CAST(COUNT(CASE WHEN t_click IS NOT NULL THEN 1 END) AS BIGINT)
        AS n_view_click,
      CAST(COUNT(CASE WHEN t_purchase IS NOT NULL THEN 1 END) AS BIGINT)
        AS n_view_click_purchase
    FROM s3
    """,
    "behavior", "agg", "window",
)
def funnel_view_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel — how many users did view, then click AFTER the
    view, then purchase AFTER the click. Each stage is a conditional MIN
    over the user's events anchored at the previous stage's timestamp —
    the strictly-ordered funnel definition (an unordered intersect
    overcounts users who purchased before ever viewing).

    Scale: the three stages are window passes over ONE user_id
    clustering — Spark computes them as chained window aggregates on a
    single exchange (the SQL mirror re-joins per stage because plain SQL
    cannot chain window-derived predicates, but the Spark plan shuffles
    events once). Final output is a 3-number global rollup."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    w = Window.partitionBy("user_id")
    t_view = F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(w)
    staged = ev.withColumn("t_view", t_view)
    t_click = F.min(
        F.when(
            (F.col("event_type") == "click") & (F.col("ts") > F.col("t_view")),
            F.col("ts"),
        )
    ).over(w)
    staged = staged.withColumn("t_click", t_click)
    t_purchase = F.min(
        F.when(
            (F.col("event_type") == "purchase") & (F.col("ts") > F.col("t_click")),
            F.col("ts"),
        )
    ).over(w)
    staged = staged.withColumn("t_purchase", t_purchase)
    per_user = staged.groupBy("user_id").agg(
        F.min("t_view").alias("t_view"),
        F.min("t_click").alias("t_click"),
        F.min("t_purchase").alias("t_purchase"),
    )
    return per_user.agg(
        F.count("t_view").alias("n_view"),
        F.count(F.when(F.col("t_click").isNotNull(), 1)).alias("n_view_click"),
        F.count(F.when(F.col("t_purchase").isNotNull(), 1)).alias(
            "n_view_click_purchase"
        ),
    )


# ---------------------------------------------------------------------------
# Fuzzy entity-resolution join (blocked levenshtein match)
# ---------------------------------------------------------------------------

#: dirty probe records an identity pipeline must resolve — typos within
#: edit distance 2 of real customer names, plus one non-match control.
_DIRTY_NAMES = (
    "Custmer#000000042",     # deletion
    "Customer#00000O113",    # 0 -> O substitution
    "Customer#0000001377",   # insertion
    "Costumer#000000205",    # transposition-ish (2 substitutions)
    "Customer#999999999",    # control: no real customer within distance 2
)


@query(
    "fuzzy_join_customer_names",
    f"""
    WITH probes AS (
      SELECT * FROM (VALUES {", ".join(f"('{n}')" for n in _DIRTY_NAMES)})
        AS t(dirty_name)
    ), blocked AS (
      SELECT p.dirty_name, c.c_custkey, c.c_name,
        levenshtein(p.dirty_name, c.c_name) AS edit_dist
      FROM probes p
      JOIN customer c
        ON substr(p.dirty_name, length(p.dirty_name) - 2, 3)
         = substr(c.c_name, length(c.c_name) - 2, 3)
    )
    SELECT dirty_name, c_custkey, c_name, edit_dist
    FROM blocked
    WHERE edit_dist <= 2
    ORDER BY dirty_name, c_custkey
    """,
    "behavior", "join", "pipeline",
)
def fuzzy_join_customer_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy entity-resolution join: match dirty probe names to the
    customer master within levenshtein distance 2, BLOCKED on the last
    3 characters so the match is an equi-join plus a cheap residual —
    never an all-pairs cross join. Blocking on a suffix works here
    because the discriminating digits are name-final; real pipelines
    block on phonetic keys or q-gram LSH, same plan shape
    (dedup_minhash_candidate_pairs is that scale path).

    Scale: probes are benchmark-sized → broadcast equi-join on the
    block key; levenshtein (unit-cost edit distance, identical
    definition in both engines) runs only inside blocks. The control
    probe proves non-matches drop out."""
    c = load_table(spark, sf_dir, "customer")
    probes = spark.createDataFrame(
        [(n,) for n in _DIRTY_NAMES], ["dirty_name"]
    )
    blocked = probes.join(
        c,
        F.expr(
            "substring(dirty_name, length(dirty_name) - 2, 3)"
            " = substring(c_name, length(c_name) - 2, 3)"
        ),
    ).select(
        "dirty_name",
        "c_custkey",
        "c_name",
        F.levenshtein("dirty_name", "c_name").alias("edit_dist"),
    )
    return (
        blocked.where(F.col("edit_dist") <= 2)
        .orderBy("dirty_name", "c_custkey")
    )


# ---------------------------------------------------------------------------
# Fixed-width histogram
# ---------------------------------------------------------------------------

@query(
    "histogram_order_totalprice",
    """
    WITH b AS (
      SELECT CAST(LEAST(FLOOR(o_totalprice / 30000.0), 19) AS BIGINT) AS bin,
        o_totalprice
      FROM orders
    )
    SELECT bin,
      bin * 30000.0 AS bin_lo,
      (bin + 1) * 30000.0 AS bin_hi,
      COUNT(*) AS n_orders,
      MIN(o_totalprice) AS min_price,
      MAX(o_totalprice) AS max_price
    FROM b
    GROUP BY bin
    ORDER BY bin
    """,
    "behavior", "agg", "stats",
)
def histogram_order_totalprice(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram of order values: 20 bins of 30k with an
    open-ended top bin — the profile/EDA primitive behind every
    dashboard distribution chart. Bin assignment is FLOOR on a single
    division (identical IEEE double op in both engines) capped with
    LEAST, so bins are bit-deterministic; no width_bucket intrinsic
    needed.

    Scale: map-side bin arithmetic, one 20-key partial-aggregated
    shuffle — the cheapest possible profile of a 100 TB column. The
    equal-frequency companion is bucketize_decile_order_value."""
    o = load_table(spark, sf_dir, "orders")
    binned = o.select(
        F.least(F.floor(F.col("o_totalprice") / 30000.0), F.lit(19))
        .cast("bigint")
        .alias("bin"),
        "o_totalprice",
    )
    return (
        binned.groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.min("o_totalprice").alias("min_price"),
            F.max("o_totalprice").alias("max_price"),
        )
        .select(
            "bin",
            (F.col("bin") * 30000.0).alias("bin_lo"),
            ((F.col("bin") + 1) * 30000.0).alias("bin_hi"),
            "n_orders",
            "min_price",
            "max_price",
        )
        .orderBy("bin")
    )


#: probes for the multipass blocking query: two corrupt the SUFFIX (the
#: single-pass block key — pass A must miss them, pass B recovers), one
#: corrupts the middle (pass B misses, pass A recovers), one matches
#: nothing. All target custkeys < 150 so every SF's customer table
#: contains them.
_MULTIPASS_PROBES = [
    "Customer#00000000Z7",   # insert into suffix of ...007  -> pass B only
    "Customer#000000X42",    # corrupt suffix of ...042      -> pass B only
    "Customer#000100123",    # corrupt middle of ...123      -> pass A only
    "Nobody#999999999",      # control: no match either pass
]


@query(
    "er_multipass_blocking_names",
    f"""
    WITH probes AS (
      SELECT * FROM (VALUES {", ".join(f"('{n}')" for n in _MULTIPASS_PROBES)})
        AS t(dirty_name)
    ), pass_a AS (
      SELECT p.dirty_name, c.c_custkey, c.c_name
      FROM probes p JOIN customer c
        ON substr(p.dirty_name, length(p.dirty_name) - 2, 3)
         = substr(c.c_name, length(c.c_name) - 2, 3)
    ), pass_b AS (
      SELECT p.dirty_name, c.c_custkey, c.c_name
      FROM probes p JOIN customer c
        ON substr(p.dirty_name, 13, 3) = substr(c.c_name, 13, 3)
    ), candidates AS (
      SELECT DISTINCT * FROM (
        SELECT * FROM pass_a UNION ALL SELECT * FROM pass_b) u
    )
    SELECT dirty_name, c_custkey, c_name,
      levenshtein(dirty_name, c_name) AS edit_dist
    FROM candidates
    WHERE levenshtein(dirty_name, c_name) <= 2
    ORDER BY dirty_name, c_custkey
    """,
    "behavior", "join", "pipeline",
)
def er_multipass_blocking_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-pass blocking for entity resolution: ANY single blocking
    key has a blind spot — a corruption inside the key itself makes the
    true match unblockable (fuzzy_join_customer_names blocks on the
    name suffix, so suffix typos escape it). The fix every production
    ER pipeline uses: run several ORTHOGONAL blocking passes (here:
    suffix 3-gram and middle 3-gram), union the candidate pairs,
    deduplicate, and verify once with the expensive residual
    (levenshtein <= 2). The probe set is adversarial by construction —
    two probes are invisible to pass A and recovered by pass B, one the
    reverse, one matches nothing — so the hash gate proves the union
    actually widens recall rather than just re-finding pass A's pairs.

    Scale: each pass is a broadcast equi-join on its block key (probes
    are tiny; for corpus-vs-corpus ER each pass is a shuffle equi-join
    on the key — same shape as dedup_minhash_candidate_pairs' bands,
    which IS multi-pass blocking with 16 passes); the verify cost is
    |union of candidates|, and dedup before verify keeps pairs caught
    by both passes from paying levenshtein twice."""
    c = load_table(spark, sf_dir, "customer")
    probes = spark.createDataFrame([(n,) for n in _MULTIPASS_PROBES], ["dirty_name"])
    pass_a = probes.join(
        c,
        F.expr(
            "substring(dirty_name, length(dirty_name) - 2, 3)"
            " = substring(c_name, length(c_name) - 2, 3)"
        ),
    ).select("dirty_name", "c_custkey", "c_name")
    pass_b = probes.join(
        c, F.expr("substring(dirty_name, 13, 3) = substring(c_name, 13, 3)")
    ).select("dirty_name", "c_custkey", "c_name")
    candidates = pass_a.unionByName(pass_b).distinct()
    return (
        candidates.withColumn(
            "edit_dist", F.levenshtein("dirty_name", "c_name")
        )
        .where(F.col("edit_dist") <= 2)
        .orderBy("dirty_name", "c_custkey")
    )


@query(
    "funnel_pattern_no_error_between",
    """
    WITH ordered AS (
      SELECT user_id, event_type, ts, event_id,
        ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
      FROM events
    ), anchored AS (
      SELECT *,
        MAX(CASE WHEN event_type = 'click' THEN rn END) OVER (
          PARTITION BY user_id ORDER BY rn
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_click_rn,
        MAX(CASE WHEN event_type = 'error' THEN rn END) OVER (
          PARTITION BY user_id ORDER BY rn
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_error_rn
      FROM ordered
    )
    SELECT user_id,
      COUNT(*) AS n_purchases,
      CAST(SUM(CASE WHEN last_click_rn IS NOT NULL
                AND (last_error_rn IS NULL OR last_error_rn < last_click_rn)
               THEN 1 ELSE 0 END) AS BIGINT) AS n_clean
    FROM anchored
    WHERE event_type = 'purchase'
    GROUP BY user_id
    ORDER BY user_id
    """,
    "behavior", "window", "pattern",
)
def funnel_pattern_no_error_between(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-pattern matching with an EXCLUSION constraint — the
    MATCH_RECOGNIZE shape (`CLICK (NOT ERROR)* PURCHASE`) that plain
    funnels can't express: a purchase counts as clean only if the
    user's most recent click happened AFTER their most recent error.
    Two running-MAX windows over the per-user event sequence turn the
    "no X between Y and Z" pattern into a single position comparison —
    no self-join, no exploding all (click, purchase) pairs and
    filtering, which is the naive plan and is quadratic per user.

    Determinism: "between" is defined on the (ts, event_id) total
    order, not raw timestamps, so tied timestamps cannot flip matches
    between engines. Scale: one exchange on user_id serves the row
    numbering and both anchor windows; the purchase filter then feeds
    the same-key aggregation without a further shuffle."""
    ev = load_table(spark, sf_dir, "events")
    from pyspark.sql import Window

    seq = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prior = (
        Window.partitionBy("user_id")
        .orderBy("rn")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    anchored = (
        ev.select("user_id", "event_type", "ts", "event_id")
        .withColumn("rn", F.row_number().over(seq))
        .withColumn(
            "last_click_rn",
            F.max(F.when(F.col("event_type") == "click", F.col("rn"))).over(prior),
        )
        .withColumn(
            "last_error_rn",
            F.max(F.when(F.col("event_type") == "error", F.col("rn"))).over(prior),
        )
    )
    clean = F.col("last_click_rn").isNotNull() & (
        F.col("last_error_rn").isNull()
        | (F.col("last_error_rn") < F.col("last_click_rn"))
    )
    return (
        anchored.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            F.sum(F.when(clean, 1).otherwise(0)).cast("bigint").alias("n_clean"),
        )
        .orderBy("user_id")
    )


@query(
    "funnel_time_to_convert_percentiles",
    """
    WITH ordered AS (
      SELECT user_id, event_type, ts, event_id,
        ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
      FROM events
    ), anchored AS (
      SELECT *,
        MAX(CASE WHEN event_type = 'click' THEN ts END) OVER (
          PARTITION BY user_id ORDER BY rn
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_click_ts
      FROM ordered
    ), conv AS (
      SELECT CAST(date_diff('second', last_click_ts, ts) AS BIGINT) AS secs
      FROM anchored
      WHERE event_type = 'purchase' AND last_click_ts IS NOT NULL
    )
    SELECT COUNT(*) AS n_conversions,
      quantile_cont(secs, 0.5) AS p50_secs,
      quantile_cont(secs, 0.9) AS p90_secs,
      quantile_cont(secs, 0.99) AS p99_secs
    FROM conv
    """,
    "behavior", "window", "stats",
)
def funnel_time_to_convert_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-convert distribution — the funnel's companion metric:
    for every purchase preceded by a click, the seconds since that
    user's MOST RECENT click (running-MAX anchor over the (ts,
    event_id) order, same single-exchange shape as the pattern
    query), summarized as exact interpolated p50/p90/p99. Latencies
    are integer seconds, so the percentile interpolation arithmetic is
    exact and both engines agree bit-for-bit — the reason the metric
    is stated in seconds rather than float days.

    Scale: one exchange on user_id for the anchor window; the
    percentile runs over the (small) conversions subset — for an
    unbounded conversion stream swap in approx_percentile, same plan
    shape (stats_quantiles_price is that precedent)."""
    ev = load_table(spark, sf_dir, "events")
    from pyspark.sql import Window

    seq = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prior = (
        Window.partitionBy("user_id")
        .orderBy("rn")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    conv = (
        ev.select("user_id", "event_type", "ts", "event_id")
        .withColumn("rn", F.row_number().over(seq))
        .withColumn(
            "last_click_ts",
            F.max(F.when(F.col("event_type") == "click", F.col("ts"))).over(prior),
        )
        .filter(
            (F.col("event_type") == "purchase") & F.col("last_click_ts").isNotNull()
        )
        .select(
            (
                F.unix_timestamp("ts") - F.unix_timestamp("last_click_ts")
            ).alias("secs")
        )
    )
    return conv.agg(
        F.count(F.lit(1)).alias("n_conversions"),
        F.percentile("secs", 0.5).alias("p50_secs"),
        F.percentile("secs", 0.9).alias("p90_secs"),
        F.percentile("secs", 0.99).alias("p99_secs"),
    )


@query(
    "behavior_transition_matrix",
    """
    WITH seq AS (
      SELECT user_id, event_type, ts, event_id,
        LAG(event_type) OVER (
          PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
      FROM events
    )
    SELECT prev_type, event_type AS next_type, COUNT(*) AS n_transitions
    FROM seq WHERE prev_type IS NOT NULL
    GROUP BY prev_type, next_type
    ORDER BY prev_type, next_type
    """,
    "behavior", "window",
)
def behavior_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition counts between consecutive events
    per user — the raw material of path analysis, next-action models,
    and anomaly screens (a spike in error→error transitions is an
    incident signature). LAG over the per-user (ts, event_id) total
    order pins which event is 'previous' under tied timestamps; each
    user's first event has no predecessor and is excluded rather than
    faked as a self-transition. Scale: one exchange on user_id for the
    LAG, then the 5x5 transition matrix aggregates map-side to
    nothing."""
    ev = load_table(spark, sf_dir, "events")
    from pyspark.sql import Window

    seq = ev.select(
        "user_id",
        "event_type",
        F.lag("event_type")
        .over(Window.partitionBy("user_id").orderBy("ts", "event_id"))
        .alias("prev_type"),
    )
    return (
        seq.filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count(F.lit(1)).alias("n_transitions"))
        .orderBy("prev_type", "next_type")
    )
