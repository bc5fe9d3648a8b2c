"""UDF-surface and skew-mitigation queries (SURVEY §2.E, §4.3).

Covers the engine's user-extension points with full oracle checks:

- grouped custom aggregation (UDAF shape) via ``applyInPandas``
- table function (UDTF shape) via a registered Python UDTF + LATERAL
- salted two-phase aggregation and salted replicate-join
  (operators/skew.py) — proven byte-identical to their unsalted SQL
  equivalents, which is the whole point of salting.

Float discipline: the pandas UDAF works in integer cents so its sums are
exact and engine-order-independent; the salted paths use algebraic
aggregates only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .operators import skew
from .queries import query
from .sources import load_table


@query(
    "udaf_trimmed_mean_acctbal",
    """
    WITH ranked AS (
      SELECT c_nationkey,
        CAST(round(c_acctbal * 100) AS BIGINT) AS cents,
        row_number() OVER (PARTITION BY c_nationkey
                           ORDER BY c_acctbal, c_custkey) AS rn,
        count(*) OVER (PARTITION BY c_nationkey) AS n
      FROM customer WHERE c_acctbal IS NOT NULL
    )
    SELECT c_nationkey,
      CAST(sum(cents) AS DOUBLE) / (100.0 * count(*)) AS trimmed_mean_acctbal
    FROM ranked
    WHERE rn > n // 10 AND rn <= n - n // 10
    GROUP BY c_nationkey ORDER BY c_nationkey
    """,
    "udaf", "agg", "pandas",
)
def udaf_trimmed_mean_acctbal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom grouped aggregation (the UDAF surface, §2.E) via
    ``applyInPandas``: 10%-trimmed mean of customer balance per nation —
    order statistics that built-in algebraic aggregates can't express.
    Arithmetic is integer cents, so the Python sum and the SQL sum are
    exact and identical regardless of accumulation order.
    Scale: one shuffle on the group key; each group is processed as one
    Arrow batch, so per-group size must fit an executor — fine for
    bounded-cardinality keys, use window-rank + filter for giant groups."""
    import pandas as pd

    def trimmed(pdf: pd.DataFrame) -> pd.DataFrame:
        # a trimmed mean is over OBSERVED values: drop null balances (the
        # oracle filters identically); a group with none vanishes
        pdf = pdf.dropna(subset=["c_acctbal"])
        if len(pdf) == 0:
            return pd.DataFrame(
                {"c_nationkey": [], "trimmed_mean_acctbal": []}
            )
        pdf = pdf.sort_values(["c_acctbal", "c_custkey"])
        n = len(pdf)
        k = n // 10
        cents = (pdf["c_acctbal"] * 100).round().astype("int64").iloc[k : n - k]
        return pd.DataFrame(
            {
                "c_nationkey": [pdf["c_nationkey"].iloc[0]],
                "trimmed_mean_acctbal": [cents.sum() / (100.0 * len(cents))],
            }
        )

    c = load_table(spark, sf_dir, "customer")
    return (
        c.groupBy("c_nationkey")
        .applyInPandas(trimmed, "c_nationkey int, trimmed_mean_acctbal double")
        .orderBy("c_nationkey")
    )


@query(
    "udtf_positional_tokens",
    """
    SELECT doc_id, t.i AS pos, w[t.i] AS tok
    FROM (SELECT doc_id, string_split(text, ' ') AS w
          FROM documents WHERE doc_id < 5 AND text IS NOT NULL),
         LATERAL (SELECT unnest(generate_series(1, len(w))) AS i) AS t
    ORDER BY doc_id, pos
    """,
    "udtf", "text",
)
def udtf_positional_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (§2.E): one input row → many output rows through a
    registered table function consumed with LATERAL. Restricted to 5 probe
    docs — UDTFs run row-at-a-time Python and are the engine's extension
    point, not its hot path (bulk tokenization uses JVM split/explode,
    see text_token_counts)."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="pos int, tok string")
    class Tokenize:
        def eval(self, text: str):
            for i, tok in enumerate((text or "").split(" "), start=1):
                yield i, tok

    spark.udtf.register("tokenize_udtf", Tokenize)
    load_table(spark, sf_dir, "documents").createOrReplaceTempView("__docs_udtf__")
    return spark.sql(
        """
        SELECT doc_id, t.pos, t.tok
        FROM __docs_udtf__, LATERAL tokenize_udtf(text) t
        WHERE doc_id < 5 AND text IS NOT NULL
        ORDER BY doc_id, pos
        """
    )


@query(
    "udf_pandas_scalar_discounted_cents",
    """
    SELECT l_orderkey, l_linenumber,
      CAST(round(l_extendedprice * 100) AS BIGINT)
        * (100 - CAST(round(l_discount * 100) AS BIGINT)) AS discounted_c4
    FROM lineitem WHERE l_orderkey < 2000
    ORDER BY l_orderkey, l_linenumber
    """,
    "udf", "pandas", "scalar",
)
def udf_pandas_scalar_discounted_cents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar ``pandas_udf`` (§2.E — the Series→Series vectorized UDF,
    completing the UDAF/UDTF/scalar trio): discounted price in exact
    integer 10⁻⁴-dollar units. The UDF works in int64 cents (price and
    discount are 2-dp, so round() only ever snaps float noise, never a
    true half) — no float accumulation, so Python and SQL agree exactly.
    Scale: Arrow-batched, one batch per task — the 10-100× path over
    row-at-a-time Python; still 10× slower than the equivalent built-in
    expression, which is why only the declared UDF queries use Python."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def _discounted(price, disc):
        # pandas NULLABLE Int64 (not numpy int64): a NULL price/discount
        # must propagate to a NULL result exactly like the SQL `*` does —
        # numpy astype("int64") CRASHES the whole Arrow batch on one NaN
        # (round-6 bug, found by the key-level null regime: lineitem rows
        # whose l_discount is NULL killed the task instead of nulling the
        # row). Extension Int64 carries the mask through the arithmetic
        # and Arrow hands Spark a proper nullable bigint column.
        cents = (price * 100).round().astype("Int64")
        disc_pct = (disc * 100).round().astype("Int64")
        return cents * (100 - disc_pct)

    # real (non-string) annotations: `from __future__ import annotations`
    # stringifies inline hints, which pandas_udf's signature probe rejects
    _discounted.__annotations__ = {
        "price": pd.Series, "disc": pd.Series, "return": pd.Series
    }
    discounted_c4 = pandas_udf(_discounted, "bigint")

    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 2000)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        discounted_c4("l_extendedprice", "l_discount").alias("discounted_c4"),
    ).orderBy("l_orderkey", "l_linenumber")


@query(
    "salted_agg_event_type_stats",
    """
    SELECT event_type, count(*) AS n_events,
      CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
      min(value) AS min_value, max(value) AS max_value
    FROM events GROUP BY event_type ORDER BY event_type
    """,
    "agg", "skew",
)
def salted_agg_event_type_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted two-phase aggregation (§4.3): events grouped by a
    low-cardinality key (a handful of event types over every event — the
    shape where one reducer would take a whole key). The salt spreads each
    key over 16 sub-groups; algebraic combine makes the result identical
    to the plain GROUP BY, which is exactly what the oracle asserts."""
    ev = load_table(spark, sf_dir, "events")
    ev = ev.withColumn("value_dec", F.col("value").cast("decimal(18,2)"))
    out = skew.salted_groupby_agg(
        ev,
        ["event_type"],
        [
            ("count", "event_id", "n_events"),
            ("sum", "value_dec", "sum_value_dec"),
            ("min", "value", "min_value"),
            ("max", "value", "max_value"),
        ],
        salt_src="event_id",
        n_salts=16,
    )
    return out.select(
        "event_type",
        "n_events",
        F.col("sum_value_dec").cast("double").alias("sum_value"),
        "min_value",
        "max_value",
    ).orderBy("event_type")


@query(
    "salted_join_event_labels",
    """
    WITH dim AS (
      SELECT DISTINCT event_type, upper(event_type) AS label FROM events
    )
    SELECT d.label, count(*) AS n_events
    FROM events e JOIN dim d ON e.event_type = d.event_type
    GROUP BY d.label ORDER BY d.label
    """,
    "join", "skew",
)
def salted_join_event_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted replicate-join (§4.3): the fact side joins a tiny dimension
    on a heavily-skewed key (every event has one of ~5 types). The dim is
    replicated once per salt and each fact row routes to one replica, so
    a hot key spreads over 8 reducers. A shuffle-hash hint forces the
    skew-relevant plan — with a broadcastable dim you would broadcast
    instead, and the helper's docstring says so. Result is provably
    identical to the plain join (the oracle runs the unsalted SQL)."""
    ev = load_table(spark, sf_dir, "events")
    dim = ev.select("event_type").distinct().withColumn(
        "label", F.upper("event_type")
    )
    joined = skew.salted_replicate_join(
        ev.select("event_id", "event_type"),
        dim.hint("shuffle_hash"),
        key="event_type",
        salt_src="event_id",
        n_salts=8,
    )
    return (
        joined.groupBy("label")
        .agg(F.count("*").alias("n_events"))
        .orderBy("label")
    )
