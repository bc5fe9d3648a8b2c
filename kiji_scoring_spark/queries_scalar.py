"""Scalar-function surface (SURVEY §2.D) — string / datetime / math /
conditional / array / JSON batteries, each an oracle-checked query.

Determinism rules: only exactly-representable math in oracles (sqrt, abs,
floor/ceil, round of integer-valued doubles, integer mod) — transcendental
functions (exp/ln) can differ in the last ulp between libm builds, so they
are exercised in pytest instead. Array folds run left-to-right in both
engines (Spark ``aggregate`` init 0.0 ≡ DuckDB ``list_reduce`` from the
first element).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .queries import query
from .sources import load_table


@query(
    "scalar_string_battery",
    r"""
    SELECT p_partkey,
      upper(p_name) AS name_upper,
      lower(p_brand) AS brand_lower,
      length(p_name) AS name_len,
      substr(p_name, 1, 5) AS name_head,
      concat(p_brand, '/', p_type) AS brand_type,
      regexp_extract(p_brand, '(\d+)', 1) AS brand_num,
      regexp_replace(p_type, '[aeiou]', '_') AS type_devoweled,
      replace(p_type, ' ', '-') AS type_dashed,
      lpad(CAST(p_size AS VARCHAR), 4, '0') AS size_padded,
      reverse(p_brand) AS brand_rev,
      trim('  ' || p_brand || ' ') AS brand_trimmed,
      split_part(p_type, ' ', 1) AS type_first_word,
      strpos(p_name, 'a') AS first_a
    FROM part ORDER BY p_partkey
    """,
    "scalar", "string",
)
def scalar_string_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.lower("p_brand").alias("brand_lower"),
        F.length("p_name").alias("name_len"),
        F.substring("p_name", 1, 5).alias("name_head"),
        F.concat(F.col("p_brand"), F.lit("/"), F.col("p_type")).alias("brand_type"),
        F.regexp_extract("p_brand", r"(\d+)", 1).alias("brand_num"),
        F.regexp_replace("p_type", "[aeiou]", "_").alias("type_devoweled"),
        F.replace(F.col("p_type"), F.lit(" "), F.lit("-")).alias("type_dashed"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_padded"),
        F.reverse("p_brand").alias("brand_rev"),
        F.trim(F.concat(F.lit("  "), F.col("p_brand"), F.lit(" "))).alias("brand_trimmed"),
        F.split_part(F.col("p_type"), F.lit(" "), F.lit(1)).alias("type_first_word"),
        F.instr(F.col("p_name"), "a").alias("first_a"),
    ).orderBy("p_partkey")


@query(
    "scalar_datetime_battery",
    """
    SELECT o_orderkey,
      CAST(year(o_orderdate) AS INT) AS yr,
      CAST(month(o_orderdate) AS INT) AS mo,
      CAST(day(o_orderdate) AS INT) AS dy,
      CAST(quarter(o_orderdate) AS INT) AS qtr,
      date_trunc('month', o_orderdate) AS month_start,
      CAST(o_orderdate AS DATE) AS order_date,
      last_day(CAST(o_orderdate AS DATE)) AS month_end,
      o_orderdate + INTERVAL 30 DAY AS due_ts,
      CAST(date_diff('day', TIMESTAMP '1995-01-01 00:00:00', o_orderdate) AS INT) AS days_since_epoch_start,
      CAST(EXTRACT(dow FROM o_orderdate) AS INT) + 1 AS dow_sunday1,
      CAST(epoch_ms(o_orderdate) AS BIGINT) AS epoch_millis
    FROM orders WHERE o_orderkey < 500 ORDER BY o_orderkey
    """,
    "scalar", "datetime",
)
def scalar_datetime_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 500)
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mo"),
        F.dayofmonth("o_orderdate").alias("dy"),
        F.quarter("o_orderdate").alias("qtr"),
        F.date_trunc("month", "o_orderdate").cast("timestamp_ntz").alias("month_start"),
        F.to_date("o_orderdate").alias("order_date"),
        F.last_day("o_orderdate").alias("month_end"),
        (F.col("o_orderdate") + F.expr("interval 30 days")).alias("due_ts"),
        F.datediff("o_orderdate", F.lit("1995-01-01").cast("date")).alias(
            "days_since_epoch_start"
        ),
        F.dayofweek("o_orderdate").alias("dow_sunday1"),
        (F.unix_micros(F.col("o_orderdate").cast("timestamp")) / F.lit(1000))
        .cast("bigint")
        .alias("epoch_millis"),
    ).orderBy("o_orderkey")


@query(
    "scalar_math_battery",
    """
    SELECT l_orderkey, l_linenumber,
      round(l_discount * 100) AS discount_pct,
      CAST(floor(l_quantity / 7) AS BIGINT) AS qty_div7,
      CAST(ceil(l_extendedprice / 1000) AS BIGINT) AS price_k_ceil,
      abs(l_quantity - 25) AS qty_dev,
      sqrt(l_quantity) AS qty_sqrt,
      l_quantity * l_quantity AS qty_sq,
      CAST(l_partkey % 7 AS BIGINT) AS partkey_mod7,
      CAST(sign(l_discount - 0.05) AS DOUBLE) AS disc_sign,
      greatest(l_tax, l_discount) AS max_rate,
      least(l_tax, l_discount) AS min_rate
    FROM lineitem WHERE l_orderkey < 100 ORDER BY l_orderkey, l_linenumber
    """,
    "scalar", "math",
)
def scalar_math_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 100)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.col("l_discount") * 100).alias("discount_pct"),
        F.floor(F.col("l_quantity") / 7).alias("qty_div7"),
        F.ceil(F.col("l_extendedprice") / 1000).alias("price_k_ceil"),
        F.abs(F.col("l_quantity") - 25).alias("qty_dev"),
        F.sqrt("l_quantity").alias("qty_sqrt"),
        (F.col("l_quantity") * F.col("l_quantity")).alias("qty_sq"),
        (F.col("l_partkey") % 7).alias("partkey_mod7"),
        F.signum(F.col("l_discount") - 0.05).alias("disc_sign"),
        F.greatest("l_tax", "l_discount").alias("max_rate"),
        F.least("l_tax", "l_discount").alias("min_rate"),
    ).orderBy("l_orderkey", "l_linenumber")


@query(
    "scalar_conditional_battery",
    """
    SELECT c_custkey,
      CASE WHEN c_acctbal < 0 THEN 'debt'
           WHEN c_acctbal < 5000 THEN 'mid'
           ELSE 'rich' END AS wealth_band,
      coalesce(nullif(c_mktsegment, 'BUILDING'), 'OTHER') AS segment_masked,
      CASE WHEN c_nationkey % 2 = 0 THEN c_nationkey ELSE -c_nationkey END AS signed_nation,
      greatest(c_acctbal, 0.0) AS acctbal_floor0,
      CASE WHEN c_name LIKE '%1%' THEN 1 ELSE 0 END AS has_one
    FROM customer ORDER BY c_custkey
    """,
    "scalar", "conditional",
)
def scalar_conditional_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.when(F.col("c_acctbal") < 0, "debt")
        .when(F.col("c_acctbal") < 5000, "mid")
        .otherwise("rich")
        .alias("wealth_band"),
        F.coalesce(F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")), F.lit("OTHER")).alias(
            "segment_masked"
        ),
        F.when(F.col("c_nationkey") % 2 == 0, F.col("c_nationkey"))
        .otherwise(-F.col("c_nationkey"))
        .alias("signed_nation"),
        F.greatest(F.col("c_acctbal"), F.lit(0.0)).alias("acctbal_floor0"),
        F.when(F.col("c_name").like("%1%"), 1).otherwise(0).alias("has_one"),
    ).orderBy("c_custkey")


@query(
    "scalar_array_embedding_battery",
    """
    SELECT vec_id,
      len(embedding) AS dim,
      CAST(embedding[1] AS DOUBLE) AS first_component,
      list_reduce(list_transform(embedding, x -> CAST(x AS DOUBLE)), (a,b) -> a + b) AS component_sum,
      sqrt(list_reduce(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (a,b) -> a + b)) AS l2_norm,
      list_reduce(list_transform(embedding, x -> CASE WHEN x > 0 THEN CAST(1.0 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END), (a,b) -> a + b) AS n_positive
    FROM embeddings ORDER BY vec_id
    """,
    "scalar", "array",
)
def scalar_array_embedding_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array functions — the same primitives the versioned-cell
    model (§1.2) is built on, exercised over the embeddings table."""
    e = load_table(spark, sf_dir, "embeddings")
    dbl = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    return e.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.col("embedding")[0].cast("double").alias("first_component"),
        F.aggregate(dbl, F.lit(0.0), lambda a, x: a + x).alias("component_sum"),
        F.sqrt(F.aggregate(dbl, F.lit(0.0), lambda a, x: a + x * x)).alias("l2_norm"),
        F.aggregate(
            F.transform(F.col("embedding"), lambda x: F.when(x > 0, 1.0).otherwise(0.0)),
            F.lit(0.0),
            lambda a, x: a + x,
        ).alias("n_positive"),
    ).orderBy("vec_id")


@query(
    "scalar_json_events_battery",
    """
    SELECT event_id,
      CASE WHEN json_valid(props)
           THEN CAST(props->>'$.k' AS INT) END AS k_val,
      CASE WHEN json_valid(props)
           THEN json_extract_string(props, '$.k') END AS k_str,
      CASE WHEN json_valid(props) THEN 1 ELSE 0 END AS is_valid_json
    FROM events WHERE event_id < 200 ORDER BY event_id
    """,
    "scalar", "json",
)
def scalar_json_events_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON access (§2.D): the reference serializes policy state as JSON
    (ShelfLife.java:118-134); here the JSON column is events.props.

    Malformed-input contract (r6, text-shape regime): a non-JSON props
    value ('' in the regime; truncated blobs in any real stream) yields
    NULL extractions and is_valid_json=0 — Spark's get_json_object is
    natively lenient; the oracle needs the explicit json_valid guard
    because DuckDB's ->> THROWS on malformed input."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 200)
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("int").alias("k_val"),
        F.get_json_object("props", "$.k").alias("k_str"),
        F.when(F.from_json("props", "k INT").isNotNull(), 1).otherwise(0).alias("is_valid_json"),
    ).orderBy("event_id")


@query(
    "variant_shred_event_props",
    """
    SELECT event_type,
      COUNT(*) AS n_events,
      CAST(SUM(CASE WHEN json_valid(props)
               THEN CAST(props->>'$.k' AS INTEGER) END) AS BIGINT) AS sum_k,
      MIN(CASE WHEN json_valid(props)
          THEN CAST(props->>'$.k' AS INTEGER) END) AS min_k,
      MAX(CASE WHEN json_valid(props)
          THEN CAST(props->>'$.k' AS INTEGER) END) AS max_k
    FROM events GROUP BY event_type ORDER BY event_type
    """,
    "scalar", "json", "variant",
)
def variant_shred_event_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured VARIANT path (§2.D extension, Spark 4): parse the
    JSON props column to VARIANT once, then typed ``variant_get``
    extractions feed the aggregation. Unlike get_json_object (which
    re-parses the string per extraction), VARIANT is a shredded binary
    encoding — repeated field access is an offset lookup, the right shape
    when a 100 TB event stream is queried on a handful of props keys.
    The oracle shreds the same fields with DuckDB's JSON extraction.

    try_parse_json, not parse_json (r6, text-shape regime): a single
    malformed props value KILLED the whole aggregation under ANSI —
    exactly the per-row-error-becomes-job-error failure the try_ family
    exists for. Malformed rows shred to NULL and aggregate away; the
    oracle mirrors with a json_valid guard."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.try_parse_json("props").alias("v")
    )
    k = F.variant_get(F.col("v"), "$.k", "int")
    return (
        ev.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(k).alias("sum_k"),
            F.min(k).alias("min_k"),
            F.max(k).alias("max_k"),
        )
        .orderBy("event_type")
    )


@query(
    "scalar_map_battery",
    """
    SELECT n_nationkey,
      m[n_name][1] AS own_pop,
      CAST(cardinality(m) AS INTEGER) AS map_size,
      array_to_string(map_keys(m), ',') AS keys_csv,
      map_concat(m, map(['__extra__'], [0]))['__extra__'][1] AS extra_v
    FROM (
      SELECT n_nationkey, n_name, map([n_name, 'ALL'], [n_nationkey, -1]) AS m
      FROM nation
    ) ORDER BY n_nationkey
    """,
    "scalar", "map",
)
def scalar_map_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-function battery (§2.D, the map-type-family toolkit §1.1):
    construction, element_at lookup, size, map_keys, map_concat upsert.
    Outputs are scalars so both engines compare exactly (DuckDB map
    extraction yields single-element lists — indexed [1] in the oracle)."""
    n = load_table(spark, sf_dir, "nation")
    m = F.map_from_arrays(
        F.array(F.col("n_name"), F.lit("ALL")),
        F.array(F.col("n_nationkey"), F.lit(-1)),
    )
    with_m = n.select("n_nationkey", "n_name", m.alias("m"))
    extra = F.map_concat(
        F.col("m"), F.create_map(F.lit("__extra__"), F.lit(0))
    )
    return with_m.select(
        "n_nationkey",
        F.element_at(F.col("m"), F.col("n_name")).alias("own_pop"),
        F.size("m").alias("map_size"),
        F.concat_ws(",", F.map_keys("m")).alias("keys_csv"),
        F.element_at(extra, "__extra__").alias("extra_v"),
    ).orderBy("n_nationkey")


@query(
    "scalar_timezone_battery",
    """
    SELECT event_id,
      strftime(timezone('America/New_York', timezone('UTC', ts)),
               '%Y-%m-%d %H:%M:%S') AS ny_wall,
      strftime(timezone('Asia/Kolkata', timezone('UTC', ts)),
               '%Y-%m-%d %H:%M:%S') AS kolkata_wall,
      strftime(timezone('Asia/Tokyo', timezone('UTC', ts)),
               '%Y-%m-%d %H:%M:%S') AS tokyo_wall,
      CAST(hour(timezone('America/New_York', timezone('UTC', ts))) AS INTEGER)
        AS ny_hour
    FROM events WHERE event_id < 300 ORDER BY event_id
    """,
    "scalar", "datetime", "timezone",
)
def scalar_timezone_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Timezone conversion battery (§2.D): UTC instants to wall-clock time
    in a DST zone (America/New_York — crosses the March/November
    transitions), a half-hour-offset zone (Asia/Kolkata, +05:30), and a
    fixed-offset zone (Asia/Tokyo). Both engines resolve against the IANA
    tzdb; results are FORMATTED to strings because the interesting
    failure modes (DST gap/fold handling, fractional offsets) live in the
    wall-clock rendering, and timestamp dtypes differ across engines
    (Spark ntz vs DuckDB tz-aware) while strings cannot. The oracle
    interprets the naive ts via timezone('UTC', ts) — never a bare
    ::TIMESTAMPTZ cast, which would resolve in the DuckDB session
    TimeZone and shift every wall-clock column on non-UTC hosts.

    Scale: pure per-row codegen projections fused with the scan — tz
    conversion at 100 TB is free; the expensive mistake is storing wall
    times instead of instants, which this engine never does (all
    timestamps are UTC instants; wall time is a presentation projection)."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 300)
    fmt = "yyyy-MM-dd HH:mm:ss"
    return ev.select(
        "event_id",
        F.date_format(
            F.from_utc_timestamp("ts", "America/New_York"), fmt
        ).alias("ny_wall"),
        F.date_format(F.from_utc_timestamp("ts", "Asia/Kolkata"), fmt).alias(
            "kolkata_wall"
        ),
        F.date_format(F.from_utc_timestamp("ts", "Asia/Tokyo"), fmt).alias(
            "tokyo_wall"
        ),
        F.hour(F.from_utc_timestamp("ts", "America/New_York"))
        .cast("int")
        .alias("ny_hour"),
    ).orderBy("event_id")


@query(
    "scalar_bitwise_battery",
    """
    SELECT event_type,
      COUNT(*) AS n,
      BIT_AND(user_id) AS band,
      BIT_OR(user_id) AS bor,
      BIT_XOR(user_id) AS bxor,
      BIT_OR(CASE WHEN user_id % 8 = 0 THEN 1 ELSE 0 END
           | CASE WHEN user_id % 3 = 0 THEN 2 ELSE 0 END) AS flag_union
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
    "scalar", "agg",
)
def scalar_bitwise_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise aggregate battery — BIT_AND / BIT_OR / BIT_XOR over the
    key domain plus a flag-word union (the compact permission/feature
    mask idiom). All three aggregates are associative and commutative
    on integers, so partial/final merge order cannot change a bit —
    the same mergeability argument as the bitmap shards, in scalar
    form. One conditional-agg pass, map-side partials."""
    ev = load_table(spark, sf_dir, "events")
    flags = (
        F.when(F.col("user_id") % 8 == 0, F.lit(1)).otherwise(F.lit(0))
    ).bitwiseOR(F.when(F.col("user_id") % 3 == 0, F.lit(2)).otherwise(F.lit(0)))
    return (
        ev.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.bit_and("user_id").alias("band"),
            F.bit_or("user_id").alias("bor"),
            F.bit_xor("user_id").alias("bxor"),
            F.bit_or(flags).alias("flag_union"),
        )
        .orderBy("event_type")
    )


@query(
    "scalar_try_functions_battery",
    """
    WITH base AS (
      SELECT o_orderkey,
        CASE WHEN o_custkey % 5 = 0 THEN NULL
             ELSE o_totalprice / (o_custkey % 5) END AS safe_div,
        TRY_CAST(substr(o_orderpriority, 1, 1) AS INTEGER) AS pri_num,
        TRY_CAST(o_orderstatus AS INTEGER) AS status_num,
        CASE WHEN length(string_split(o_orderpriority, '-')) >= 3
             THEN string_split(o_orderpriority, '-')[3] END AS tok3
      FROM orders
    )
    SELECT COUNT(*) AS n_rows,
      COUNT(safe_div) AS n_div_ok,
      CAST(ROUND(SUM(CAST(safe_div AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_div,
      COUNT(pri_num) AS n_pri_parsed,
      CAST(SUM(pri_num) AS BIGINT) AS sum_pri,
      COUNT(status_num) AS n_status_parsed,
      COUNT(tok3) AS n_tok3
    FROM base
    """,
    "scalar", "ansi",
)
def scalar_try_functions_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI error-safety battery: Spark 4 runs ANSI mode, where divide-
    by-zero, bad casts, and out-of-bounds element access THROW — the
    `try_` family converts each failure to NULL, and this battery pins
    that contract on live data: try_divide hits a zero divisor on every
    5th customer key, try_cast parses the priority's leading digit
    (always succeeds) and the alphabetic order status (never does), and
    try_element_at probes a token index most rows don't have. The
    oracle states every rule with its portable equivalent (guarded
    CASE / TRY_CAST / bounds-checked list index); counts and exact
    sums of the successes prove NULL landed in exactly the same rows.

    sum_div rounds the exact DECIMAL sum to 2 places BEFORE the double
    cast (round-6 fix, found by the sf0.1 null-regime sweep): once a
    decimal's UNSCALED value exceeds 2^53 — which a 6-decimal sum over
    150k orders does — decimal→double conversion is no longer exact and
    Spark and DuckDB round the last ulp differently. Rounding first
    shrinks the unscaled value back under 53 bits, making the cast
    bit-identical on both engines at any corpus size.

    The engine-design point: try_ semantics are what make ANSI mode
    deployable on dirty 100 TB data — errors become per-row NULLs that
    aggregate away instead of killing a 10-hour job at row 9 billion."""
    o = load_table(spark, sf_dir, "orders")
    base = o.select(
        "o_orderkey",
        F.try_divide(F.col("o_totalprice"), F.col("o_custkey") % 5).alias("safe_div"),
        F.try_to_number(
            F.substring("o_orderpriority", 1, 1), F.lit("9")
        ).cast("int").alias("pri_num"),
        F.expr("try_cast(o_orderstatus AS INT)").alias("status_num"),
        F.try_element_at(F.split("o_orderpriority", "-"), F.lit(3)).alias("tok3"),
    )
    return base.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("safe_div").alias("n_div_ok"),
        F.round(F.sum(F.col("safe_div").cast("decimal(18,6)")), 2)
        .cast("double")
        .alias("sum_div"),
        F.count("pri_num").alias("n_pri_parsed"),
        F.sum("pri_num").cast("bigint").alias("sum_pri"),
        F.count("status_num").alias("n_status_parsed"),
        F.count("tok3").alias("n_tok3"),
    )


@query(
    "scalar_calendar_arithmetic_battery",
    """
    SELECT o_orderkey,
      o_orderdate + INTERVAL 1 MONTH AS plus_month,
      last_day(o_orderdate) AS month_end,
      CAST(date_trunc('week', o_orderdate) AS TIMESTAMP) AS week_start,
      CAST(EXTRACT(ISOYEAR FROM o_orderdate) AS INTEGER) AS iso_year,
      CAST(EXTRACT(WEEK FROM o_orderdate) AS INTEGER) AS iso_week,
      CAST(date_diff('day', o_orderdate,
                     o_orderdate + INTERVAL 3 MONTH) AS INTEGER) AS days_in_3mo
    FROM orders WHERE o_orderkey < 300
    ORDER BY o_orderkey
    """,
    "scalar", "datetime",
)
def scalar_calendar_arithmetic_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar-arithmetic battery — the semantics that silently differ
    between engines and corrupt month-grain pipelines when they do:
    month addition CLAMPS at month end (Jan 31 + 1 month = Feb 28/29 —
    both engines agree, pinned here), last_day, ISO week numbering
    (week 1 = the week containing the first Thursday, so early-January
    dates can belong to the PREVIOUS iso_year — the classic
    year-boundary bug), Monday week truncation, and day counts across
    variable-length month spans. All pure scalar expressions —
    codegen, zero shuffle beyond the final sort."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 300)
    return o.select(
        "o_orderkey",
        F.add_months("o_orderdate", 1)
        .cast("timestamp_ntz")
        .alias("plus_month"),
        F.last_day("o_orderdate").cast("timestamp_ntz").alias("month_end"),
        F.date_trunc("week", "o_orderdate").alias("week_start"),
        F.expr("EXTRACT(YEAROFWEEK FROM o_orderdate)").cast("int").alias("iso_year"),
        F.weekofyear("o_orderdate").cast("int").alias("iso_week"),
        F.datediff(F.add_months("o_orderdate", 3), F.col("o_orderdate"))
        .cast("int")
        .alias("days_in_3mo"),
    ).orderBy("o_orderkey")
