"""Warehouse-maintenance and data-layout operators (SURVEY §2.C/§2.G
extensions): SCD Type-2 dimension history, partitioned table checksums,
quantile bucketing, weighted sampling, Z-order layout keys, and
runtime-bloom-filter joins.

These are the table-maintenance steps a 100 TB lakehouse runs around the
analytical queries: building slowly-changing dimension history from an
event log, fingerprinting tables for cross-system sync verification,
discretizing features into quantile buckets, drawing weighted corpus
samples, clustering file layout for data skipping, and pruning the probe
side of selective joins with runtime bloom filters.

Parity rules as everywhere in the registry: portable md5 hashing,
integer arithmetic at decision boundaries, DECIMAL accumulation for
money, identical tiebreakers in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .queries import query
from .sources import load_table


# ---------------------------------------------------------------------------
# SCD Type-2 dimension history from an event log
# ---------------------------------------------------------------------------

@query(
    "scd2_event_type_history",
    """
    WITH flagged AS (
      SELECT user_id, ts, event_id, event_type,
        CASE WHEN LAG(event_type) OVER w IS NULL
               OR LAG(event_type) OVER w <> event_type
             THEN 1 ELSE 0 END AS chg
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), runs AS (
      SELECT *, CAST(SUM(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING) AS BIGINT)
        AS period_seq
      FROM flagged
    ), periods AS (
      SELECT user_id, period_seq,
        MIN(event_type) AS event_type,
        MIN(ts) AS valid_from,
        COUNT(*) AS n_events
      FROM runs GROUP BY user_id, period_seq
    )
    SELECT user_id, period_seq, event_type, valid_from,
      LEAD(valid_from) OVER (PARTITION BY user_id ORDER BY period_seq)
        AS valid_to,
      LEAD(valid_from) OVER (PARTITION BY user_id ORDER BY period_seq)
        IS NULL AS is_current,
      n_events
    FROM periods
    ORDER BY user_id, period_seq
    """,
    "warehouse", "window", "timeseries",
)
def scd2_event_type_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type-2 dimension build — collapse an append-only event log
    into validity periods: one row per (user, consecutive run of the same
    event_type) with valid_from / valid_to / is_current, the standard
    slowly-changing-dimension shape every warehouse keeps for
    point-in-time joins. Gaps-and-islands via a change flag + running
    sum.

    Scale: ONE shuffle total. The lag window, the running sum, the
    per-period aggregate, and the valid_to lead window all cluster by
    user_id — HashPartitioning(user_id) satisfies the grouped
    distribution on (user_id, period_seq) by the subset rule, so
    Catalyst plans a single exchange for the whole pipeline. Per-user
    window state is one row. Ties broken by event_id so run boundaries
    are deterministic."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    lagged = F.lag("event_type").over(w)
    chg = F.when(
        lagged.isNull() | (lagged != F.col("event_type")), F.lit(1)
    ).otherwise(F.lit(0))
    runs = (
        ev.select("user_id", "ts", "event_id", "event_type")
        .withColumn("chg", chg)
        .withColumn(
            "period_seq",
            F.sum("chg").over(w.rowsBetween(Window.unboundedPreceding, 0)),
        )
    )
    periods = runs.groupBy("user_id", "period_seq").agg(
        F.min("event_type").alias("event_type"),
        F.min("ts").alias("valid_from"),
        F.count(F.lit(1)).alias("n_events"),
    )
    wp = Window.partitionBy("user_id").orderBy("period_seq")
    return (
        periods.withColumn("valid_to", F.lead("valid_from").over(wp))
        .withColumn("is_current", F.col("valid_to").isNull())
        .select(
            "user_id", "period_seq", "event_type", "valid_from",
            "valid_to", "is_current", "n_events",
        )
        .orderBy("user_id", "period_seq")
    )


# ---------------------------------------------------------------------------
# Partitioned table checksum (cross-system sync verification)
# ---------------------------------------------------------------------------

@query(
    "table_checksum_by_nation",
    """
    SELECT c_nationkey,
      COUNT(*) AS n_rows,
      CAST(SUM(('0x' || substr(md5(
        CAST(c_custkey AS VARCHAR) || '|' || c_name || '|' ||
        c_mktsegment || '|' ||
        COALESCE(CAST(CAST(ROUND(c_acctbal * 100) AS BIGINT) AS VARCHAR),
                 'NULL')
      ), 1, 12))::BIGINT) AS BIGINT) AS row_checksum
    FROM customer
    GROUP BY c_nationkey
    ORDER BY c_nationkey
    """,
    "warehouse", "agg",
)
def table_checksum_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-independent table fingerprint, partitioned by nation: SUM of
    a 48-bit md5 prefix of each row's canonical serialization. Two
    systems holding the same rows produce the same checksum regardless of
    row order or partitioning — the anti-entropy check used to verify a
    replicated/migrated table without shipping the data.

    Parity details: money is serialized as integer cents (a DOUBLE
    rendered as text is not portable across engines); the 48-bit prefix
    keeps every per-row value and the SUM of 6 digits * rows within
    BIGINT range; DuckDB's SUM(BIGINT)→HUGEINT is cast back to BIGINT.
    Scale: embarrassingly parallel — map-side hash + partial sum, one
    25-key shuffle; no sort anywhere."""
    c = load_table(spark, sf_dir, "customer")
    cents = F.round(F.col("c_acctbal") * 100).cast("bigint")
    # a checksum must DEFINE its null serialization: concat_ws silently
    # SKIPS nulls (canon would lose a field and two different rows could
    # collide), so null cents serialize as the explicit 'NULL' sentinel,
    # mirrored in the oracle via COALESCE
    canon = F.concat_ws(
        "|",
        F.col("c_custkey").cast("string"),
        F.col("c_name"),
        F.col("c_mktsegment"),
        F.coalesce(cents.cast("string"), F.lit("NULL")),
    )
    row_hash = F.conv(F.substring(F.md5(canon), 1, 12), 16, 10).cast("bigint")
    return (
        c.withColumn("rh", row_hash)
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("rh").alias("row_checksum"),
        )
        .orderBy("c_nationkey")
    )


# ---------------------------------------------------------------------------
# Quantile bucketing (feature discretization)
# ---------------------------------------------------------------------------

@query(
    "bucketize_decile_order_value",
    """
    WITH b AS (
      SELECT o_orderpriority, o_totalprice,
        NTILE(10) OVER (PARTITION BY o_orderpriority
                        ORDER BY o_totalprice, o_orderkey) AS decile
      FROM orders WHERE o_totalprice IS NOT NULL
    )
    SELECT o_orderpriority, decile,
      COUNT(*) AS n_orders,
      MIN(o_totalprice) AS lo,
      MAX(o_totalprice) AS hi
    FROM b
    GROUP BY o_orderpriority, decile
    ORDER BY o_orderpriority, decile
    """,
    "warehouse", "window", "agg",
)
def bucketize_decile_order_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile bucketing — assign each order its within-priority decile
    of o_totalprice and emit the bucket boundaries, the feature-
    discretization step (equal-frequency binning) of an ML feature
    pipeline. NTILE with a unique tiebreaker (o_orderkey) is exactly
    deterministic and identically defined in both engines, unlike
    approximate bucketizers.

    Scale: one shuffle on o_orderpriority for the window; the bucket
    aggregate reuses the same clustering (subset rule — no second
    exchange). Skew note: 5 priorities means 5-way parallelism on the
    sort; at 100 TB swap NTILE for range-partitioned percentile bounds
    (stats_quantiles_price shows the approx_percentile path)."""
    # deciles are defined over OBSERVED prices (the engines also disagree
    # on NULL placement under NTILE: Spark nulls first, DuckDB nulls last)
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice").isNotNull())
    w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    return (
        o.select("o_orderpriority", "o_totalprice", "o_orderkey")
        .withColumn("decile", F.ntile(10).over(w))
        .drop("o_orderkey")
        .groupBy("o_orderpriority", "decile")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.min("o_totalprice").alias("lo"),
            F.max("o_totalprice").alias("hi"),
        )
        .orderBy("o_orderpriority", "decile")
    )


# ---------------------------------------------------------------------------
# Weighted sampling (Efraimidis–Spirakis A-Res, deterministic)
# ---------------------------------------------------------------------------

@query(
    "sample_weighted_documents",
    """
    WITH keyed AS (
      SELECT doc_id, n_chars,
        ln((('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 12))::BIGINT
            + 0.5) / 281474976710656.0) / n_chars AS k
      FROM documents
    ), top AS (
      SELECT doc_id, n_chars FROM keyed
      ORDER BY k DESC, doc_id LIMIT 25
    )
    SELECT doc_id, n_chars FROM top ORDER BY doc_id
    """,
    "warehouse", "sample", "pipeline",
)
def sample_weighted_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling without replacement (Efraimidis–Spirakis A-Res):
    each document draws u = md5-uniform in (0,1) and the k = ln(u)/w
    ranking key with w = n_chars; the top-25 keys are a size-weighted
    sample — longer documents proportionally more likely. Deterministic:
    u derives from md5(doc_id), not a RNG, so the sample is reproducible
    across engines and runs (the property a training-corpus sampler
    needs for auditability).

    Scale: a TakeOrderedAndProject top-k — per-partition heaps, no
    global sort, driver holds 25 rows. The (h + 0.5)/2^48 transform
    keeps u strictly inside (0,1) so ln is finite."""
    d = load_table(spark, sf_dir, "documents")
    h = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 12), 16, 10
    ).cast("bigint")
    u = (h + F.lit(0.5)) / F.lit(281474976710656.0)
    keyed = d.select(
        "doc_id", "n_chars", (F.log(u) / F.col("n_chars")).alias("k")
    )
    return (
        keyed.orderBy(F.desc("k"), "doc_id")
        .limit(25)
        .select("doc_id", "n_chars")
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# Z-order layout keys (multi-dimensional clustering for data skipping)
# ---------------------------------------------------------------------------

#: bit-interleave of two 4-bit bucket columns via div/mod arithmetic —
#: identical integer semantics in Spark SQL (`div`) and DuckDB (`//`).
_Z_SPARK = " + ".join(
    f"((xb div {1 << i}) % 2) * {4 ** i} + 2 * ((yb div {1 << i}) % 2) * {4 ** i}"
    for i in range(4)
)
_Z_DUCK = " + ".join(
    f"((xb // {1 << i}) % 2) * {4 ** i} + 2 * ((yb // {1 << i}) % 2) * {4 ** i}"
    for i in range(4)
)


@query(
    "zorder_layout_event_tiles",
    f"""
    WITH b AS (
      SELECT user_id % 16 AS xb, event_id % 16 AS yb, value
      FROM events
    ), z AS (
      SELECT CAST({_Z_DUCK} AS BIGINT) AS zval, value FROM b
    )
    SELECT zval // 16 AS z_tile,
      COUNT(*) AS n_events,
      MIN(zval) AS z_lo,
      MAX(zval) AS z_hi,
      CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS tile_value
    FROM z
    GROUP BY z_tile
    ORDER BY z_tile
    """,
    "warehouse", "layout",
)
def zorder_layout_event_tiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) layout keys: interleave the bits of two bucketed
    dimensions (user_id, event_id) into one clustering key, then profile
    the 16 Z-tiles. Writing files range-partitioned and sorted by zval
    gives every file a tight min/max envelope on BOTH dimensions — the
    multi-dimensional data-skipping layout (Delta/Iceberg OPTIMIZE
    ZORDER) that lets a 100 TB scan prune files for predicates on either
    column. The interleave is pure div/mod integer arithmetic — no
    engine-specific bit intrinsics, bit-identical everywhere.

    Scale: map-side arithmetic + one 16-key aggregate shuffle. The
    actual rewrite path is `df.repartitionByRange(N, zval)
    .sortWithinPartitions(zval).write` — range exchange, local sort,
    no global sort (same shape plan-gated in ids_contiguous query)."""
    ev = load_table(spark, sf_dir, "events")
    z = ev.select(
        (F.col("user_id") % 16).alias("xb"),
        (F.col("event_id") % 16).alias("yb"),
        "value",
    ).select(F.expr(f"CAST({_Z_SPARK} AS BIGINT)").alias("zval"), "value")
    return (
        z.groupBy(F.expr("zval div 16").alias("z_tile"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("zval").alias("z_lo"),
            F.max("zval").alias("z_hi"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("tile_value"),
        )
        .orderBy("z_tile")
    )


# ---------------------------------------------------------------------------
# Runtime bloom-filter join (probe-side pruning for selective joins)
# ---------------------------------------------------------------------------

@query(
    "runtimefilter_bloom_join_revenue",
    """
    SELECT l.l_returnflag,
      COUNT(*) AS n_items,
      CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                    AS DECIMAL(18,4))) AS DOUBLE) AS revenue
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderpriority = '1-URGENT' AND o.o_totalprice > 150000
    GROUP BY l.l_returnflag
    ORDER BY l.l_returnflag
    """,
    "warehouse", "join",
)
def runtimefilter_bloom_join_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Selective fact-to-fact join with runtime bloom-filter pruning
    enabled: the filtered orders side builds a bloom filter on
    o_orderkey at runtime and Catalyst injects a `might_contain` probe
    into the lineitem scan, discarding non-matching rows BEFORE the
    join shuffle. At 100 TB this is the difference between shuffling
    the full fact table and shuffling the ~2% that survives the
    filter; locally AQE turns the small build side into a broadcast
    join instead, which is the same pruning by different means
    (tests/test_plans.py forces the shuffle path and asserts the
    BloomFilterMightContain node appears).

    The conf flags are session-safe to leave on: they only ever ADD a
    semi-join filter where a selective shuffle join exists."""
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
        "0",
    )
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderpriority") == "1-URGENT")
        & (F.col("o_totalprice") > 150000)
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                    "decimal(18,4)"
                )
            )
            .cast("double")
            .alias("revenue"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "dq_constraint_audit",
    """
    SELECT 'customer_acctbal_null' AS check_name,
      COUNT(*) FILTER (WHERE c_acctbal IS NULL) AS n_violations FROM customer
    UNION ALL
    SELECT 'lineitem_fk_orders', COUNT(*) FROM lineitem l
      WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
    UNION ALL
    SELECT 'lineitem_qty_out_of_range',
      COUNT(*) FILTER (WHERE l_quantity NOT BETWEEN 1 AND 50) FROM lineitem
    UNION ALL
    SELECT 'orders_fk_customer', COUNT(*) FROM orders o
      WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
    UNION ALL
    SELECT 'orders_orderdate_out_of_range',
      COUNT(*) FILTER (WHERE o_orderdate < TIMESTAMP '1995-01-01 00:00:00'
                          OR o_orderdate > TIMESTAMP '2000-12-31 00:00:00')
      FROM orders
    UNION ALL
    SELECT 'orders_totalprice_nonpositive',
      COUNT(*) FILTER (WHERE o_totalprice <= 0) FROM orders
    ORDER BY check_name
    """,
    "warehouse", "dq",
)
def dq_constraint_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality constraint audit — the expectations pass
    (null-rate, range, referential-integrity checks) every ingest gate
    runs before publishing a 100 TB table. Six checks over three
    tables; the date-range check is deliberately violated by the data
    (orders run past 2000-12-31), so the audit provably counts real
    violations rather than rubber-stamping zeros.

    Scale shape: scalar checks per table fold into ONE conditional
    aggregation per scan (a map literal exploded into (check, count)
    rows — adding a check costs a column, not a pass); FK checks are
    broadcast anti-joins against the dimension key sets (customer and
    orders keys broadcast; at larger dims switch to a shuffled
    left_anti, same code shape). Nothing here sorts or collects raw
    rows — violations aggregate map-side."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")

    def one(cond) -> F.Column:
        # coalesce: an audit over an EMPTY shard must report 0 violations
        # per check, not NULL (sum over zero rows) — empty is clean
        return F.coalesce(F.sum(F.when(cond, 1).otherwise(0)), F.lit(0)).cast("long")

    cust_checks = c.agg(
        one(F.col("c_acctbal").isNull()).alias("customer_acctbal_null")
    )
    order_checks = o.agg(
        one(
            (F.col("o_orderdate") < F.lit("1995-01-01 00:00:00").cast("timestamp_ntz"))
            | (F.col("o_orderdate") > F.lit("2000-12-31 00:00:00").cast("timestamp_ntz"))
        ).alias("orders_orderdate_out_of_range"),
        one(F.col("o_totalprice") <= 0).alias("orders_totalprice_nonpositive"),
    )
    li_checks = li.agg(
        one(~F.col("l_quantity").between(1, 50)).alias("lineitem_qty_out_of_range")
    )
    fk_orders = (
        o.join(
            F.broadcast(c.select("c_custkey")),
            o.o_custkey == F.col("c_custkey"),
            "left_anti",
        )
        .agg(F.count(F.lit(1)).alias("orders_fk_customer"))
    )
    fk_lineitem = (
        li.join(
            F.broadcast(o.select("o_orderkey")),
            li.l_orderkey == F.col("o_orderkey"),
            "left_anti",
        )
        .agg(F.count(F.lit(1)).alias("lineitem_fk_orders"))
    )

    def melt(df: DataFrame) -> DataFrame:
        pairs = []
        for name in df.columns:
            pairs += [F.lit(name), F.col(name)]
        return df.select(
            F.explode(F.create_map(*pairs)).alias("check_name", "n_violations")
        )

    parts = [cust_checks, order_checks, li_checks, fk_orders, fk_lineitem]
    out = melt(parts[0])
    for p in parts[1:]:
        out = out.unionByName(melt(p))
    return out.orderBy("check_name")


@query(
    "dq_sequence_gaps",
    """
    WITH keys AS (
      SELECT DISTINCT o_orderkey AS k FROM orders
    ), marked AS (
      SELECT k, k - ROW_NUMBER() OVER (ORDER BY k) AS grp FROM keys
    ), islands AS (
      SELECT MIN(k) AS island_start, MAX(k) AS island_end
      FROM marked GROUP BY grp
    )
    SELECT island_end + 1 AS gap_start,
      LEAD(island_start) OVER (ORDER BY island_start) - 1 AS gap_end,
      LEAD(island_start) OVER (ORDER BY island_start) - island_end - 1
        AS n_missing
    FROM islands
    QUALIFY gap_end IS NOT NULL
    ORDER BY gap_start
    """,
    "warehouse", "dq", "window",
)
def dq_sequence_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-gap detection (missing-data audit): which o_orderkey
    ranges are absent? Classic gaps-and-islands — k - ROW_NUMBER() is
    constant within each consecutive run, islands collapse to
    (start, end), and LEAD exposes the holes between them. The ingest
    monitor that catches a dropped batch by its key range rather than
    by comparing row counts.

    Scale note: the single global ROW_NUMBER is the textbook shape but
    a 100 TB anti-pattern (one-partition sort); the scale-out variant
    assigns per-partition offsets exactly like ids_contiguous_no_global_sort
    does, then runs the same island algebra — the algebra is
    partition-local once keys are range-partitioned. At the audit's
    typical grain (daily shard) the global window is fine."""
    o = load_table(spark, sf_dir, "orders")
    from pyspark.sql import Window

    keys = o.select(F.col("o_orderkey").alias("k")).distinct()
    marked = keys.withColumn(
        "grp", F.col("k") - F.row_number().over(Window.orderBy("k"))
    )
    islands = marked.groupBy("grp").agg(
        F.min("k").alias("island_start"), F.max("k").alias("island_end")
    )
    nxt = F.lead("island_start").over(Window.orderBy("island_start"))
    return (
        islands.select(
            (F.col("island_end") + 1).alias("gap_start"),
            (nxt - 1).alias("gap_end"),
            (nxt - F.col("island_end") - 1).alias("n_missing"),
        )
        .filter(F.col("gap_end").isNotNull())
        .orderBy("gap_start")
    )


@query(
    "dq_benford_first_digit",
    """
    WITH digits AS (
      SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR), 1, 1)
                  AS INTEGER) AS d
      FROM orders WHERE o_totalprice >= 1
    ), n AS (SELECT COUNT(*) AS n FROM digits)
    SELECT d, COUNT(*) AS n_obs,
      CAST(COUNT(*) AS DOUBLE) / any_value(n.n) AS p_obs,
      ln(1.0 + 1.0 / d) / ln(10.0) AS p_benford
    FROM digits, n
    GROUP BY d
    ORDER BY d
    """,
    "warehouse", "dq", "stats",
)
def dq_benford_first_digit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford first-digit audit — the fraud/synthetic-data screen:
    naturally-occurring monetary amounts follow P(d) = log10(1 + 1/d),
    and a shard whose leading-digit histogram deviates hard was
    fabricated, truncated, or double-counted. Counts are exact map-side
    integers (one conditional-agg pass); observed shares and the
    Benford expectation are derived per-row from those exact counts in
    identical double expressions both engines, so even the float
    columns hash-match. (The synthetic TPC-H price distribution is NOT
    Benford — uniform-ish over a bounded range — which the output
    shows; the audit reports, it does not assert.)"""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") >= 1)
    digits = o.select(
        F.substring(
            F.floor(F.col("o_totalprice")).cast("bigint").cast("string"), 1, 1
        )
        .cast("int")
        .alias("d")
    )
    n = digits.agg(F.count(F.lit(1)).alias("n"))
    return (
        digits.groupBy("d")
        .agg(F.count(F.lit(1)).alias("n_obs"))
        .crossJoin(F.broadcast(n))
        .select(
            "d",
            "n_obs",
            (F.col("n_obs").cast("double") / F.col("n")).alias("p_obs"),
            (F.log(1.0 + 1.0 / F.col("d")) / F.log(F.lit(10.0))).alias("p_benford"),
        )
        .orderBy("d")
    )
