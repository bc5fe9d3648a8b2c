"""MLlib batch scoring + Structured Streaming queries with full oracles.

MLlib batch scoring is the engine's translation of the reference's online
producers (BASELINE.json "spark_approach"; producer surface at
``KijiProducer`` → ``InternalFreshKijiTableReader.java:568-579``): instead
of a per-row produce() call inline with a read, a fitted ``PipelineModel``
transforms the whole stale partition in one distributed pass.

The scoring query here uses deterministic, closed-form MLlib stages
(VectorAssembler + StandardScaler) so the oracle can replicate the fitted
parameters in SQL — iterative trainers would score fine but could not be
hash-checked against an independent engine.

The streaming query executes a REAL StreamingQuery (file micro-batch
source → stateful window aggregation → memory sink, AvailableNow trigger)
and returns the result as a batch DataFrame, so the §2.F surface gets the
same oracle gate as everything else instead of a weaker rows-only check.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .queries import query
from .sources import load_table


@query(
    "mllib_scored_customers",
    """
    WITH stats AS (
      SELECT avg(c_acctbal) AS mu_bal, stddev_samp(c_acctbal) AS sd_bal,
             avg(CAST(c_nationkey AS DOUBLE)) AS mu_nat,
             stddev_samp(CAST(c_nationkey AS DOUBLE)) AS sd_nat
      FROM customer
    )
    SELECT c_custkey,
      round(1.0 / (1.0 + exp(-(
        0.8 * (c_acctbal - mu_bal) / sd_bal
        - 0.2 * (CAST(c_nationkey AS DOUBLE) - mu_nat) / sd_nat
        + 0.1))), 9) AS churn_score
    FROM customer, stats
    ORDER BY c_custkey
    """,
    "scoring", "mllib", "kiji",
)
def mllib_scored_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MLlib batch scoring (the reference's producer surface as a
    PipelineModel): VectorAssembler → StandardScaler(withMean) fitted on
    the table, then a fixed-weight logistic layer over the scaled
    features. ``Pipeline.fit`` + ``model.transform`` run distributed;
    fitting StandardScaler is one aggregation pass (mean/std), transform
    is a narrow map — no shuffle at any scale. The oracle replays the
    closed-form fit in SQL."""
    from pyspark.ml import Pipeline
    from pyspark.ml.feature import StandardScaler, VectorAssembler
    from pyspark.ml.functions import vector_to_array

    c = load_table(spark, sf_dir, "customer").withColumn(
        "nat_d", F.col("c_nationkey").cast("double")
    )
    pipeline = Pipeline(
        stages=[
            VectorAssembler(inputCols=["c_acctbal", "nat_d"], outputCol="features"),
            StandardScaler(
                inputCol="features", outputCol="scaled", withMean=True, withStd=True
            ),
        ]
    )
    model = pipeline.fit(c)
    scaled = model.transform(c).withColumn("z", vector_to_array("scaled"))
    margin = (
        F.lit(0.8) * F.col("z")[0] - F.lit(0.2) * F.col("z")[1] + F.lit(0.1)
    )
    return scaled.select(
        "c_custkey",
        F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-margin)), 9).alias("churn_score"),
    ).orderBy("c_custkey")


@query(
    "streaming_hourly_event_stats",
    """
    SELECT date_trunc('hour', ts) AS window_start,
      count(*) AS n_events,
      CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY window_start ORDER BY window_start
    """,
    "streaming", "agg",
)
def streaming_hourly_event_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling-window aggregation executed as a REAL StreamingQuery
    (§2.F): parquet micro-batch source → groupBy(window(ts, '1 hour')) →
    memory sink, AvailableNow trigger, then the sink table is returned as
    the batch result. Complete output mode because the bounded replay must
    emit every window, including ones a watermark would hold open.
    Scale: the window agg is incremental state-store aggregation — state
    is one row per open window, never raw events; on an unbounded source
    you'd add ``withWatermark`` to expire windows (see
    streaming.with_watermark and tests/test_streaming.py)."""
    ev_schema = load_table(spark, sf_dir, "events").schema
    raw_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    stream = (
        spark.readStream.schema(raw_schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    if dict(stream.dtypes).get("ts") == "bigint":
        stream = stream.withColumn(
            "ts", F.expr("CAST(timestamp_micros(ts DIV 1000) AS timestamp_ntz)")
        )
    agg = stream.groupBy(F.window("ts", "1 hour").alias("w")).agg(
        F.count("*").alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
    )
    sink = "streaming_hourly_event_stats_sink"
    q = (
        agg.writeStream.format("memory")
        .queryName(sink)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return (
        spark.table(sink)
        .select(
            F.col("w.start").cast(ev_schema["ts"].dataType).alias("window_start"),
            "n_events",
            "sum_value",
        )
        .orderBy("window_start")
    )


@query(
    "session_window_user_sessions",
    """
    WITH marked AS (
      SELECT user_id, ts, event_id, value,
        CASE WHEN lag(ts) OVER w IS NULL
             OR ts - lag(ts) OVER w >= INTERVAL 4 HOUR THEN 1 ELSE 0 END AS new_s
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sess AS (
      SELECT user_id, ts, value,
        sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS UNBOUNDED PRECEDING) AS sid
      FROM marked
    )
    SELECT user_id, min(ts) AS session_start, count(*) AS n_events,
      CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM sess GROUP BY user_id, sid
    ORDER BY user_id, session_start
    """,
    "streaming", "window", "agg",
)
def session_window_user_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows (§2.F): per-user activity sessions closed by 4 hours
    of inactivity, via ``session_window`` — the same incremental operator
    Structured Streaming uses (update-mode streaming run covered in
    tests/test_streaming.py). The oracle proves the gap-merge semantics
    independently with lag + cumulative-sum sessionization.
    Scale: one shuffle on user_id; state per open session is a single
    (start, end, aggregates) row."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.session_window("ts", "4 hours").alias("w"), "user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            "n_events",
            "sum_value",
        )
        .orderBy("user_id", "session_start")
    )


def _embed_oracle() -> str:
    dims = ",\n      ".join(
        f"((('0x' || substr(sha256(text), {2 * i + 1}, 2))::INT - 128) / 128.0) AS e{i}"
        for i in range(8)
    )
    return f"""
    SELECT doc_id AS media_id,
      {dims}
    FROM documents ORDER BY media_id
    """


@query("multimodal_payload_embeddings", _embed_oracle(), "multimodal", "pipeline")
def multimodal_payload_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Payload → embedding feature-extraction stage (multimodal training
    pipelines): Arrow-batched mapInPandas over binary payloads producing a
    fixed-dim vector per item (operators/multimodal.embed_payloads; stub
    digest-based embedder, deterministic). Exploded to one column per
    dimension so the oracle checks every component exactly."""
    from .operators import multimodal as mm

    d = load_table(spark, sf_dir, "documents")
    media = mm.attach_media_columns(d, "doc_id", F.encode("text", "utf-8"))
    emb = mm.embed_payloads(media, dim=8)
    return emb.select(
        "media_id", *[F.col("embedding")[i].alias(f"e{i}") for i in range(8)]
    ).orderBy("media_id")


@query(
    "streaming_sliding_window_counts",
    """
    WITH expanded AS (
      SELECT unnest([date_trunc('hour', ts) - INTERVAL 1 HOUR,
                     date_trunc('hour', ts)]) AS window_start,
             value
      FROM events
    )
    SELECT window_start, count(*) AS n_events,
      CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM expanded GROUP BY window_start ORDER BY window_start
    """,
    "streaming", "agg", "window",
)
def streaming_sliding_window_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window aggregation (§2.F): 2-hour windows sliding every
    hour, executed as a REAL StreamingQuery like
    streaming_hourly_event_stats. Every event lands in exactly two
    windows; the oracle expands that membership explicitly (unnest of the
    two aligned window starts) — proving Spark's slide semantics, not
    just re-running them.
    Scale: state is one row per open window; slide/width only change the
    per-event fan-out (2 here), not the state shape."""
    ev_schema = load_table(spark, sf_dir, "events").schema
    raw_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    stream = (
        spark.readStream.schema(raw_schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    if dict(stream.dtypes).get("ts") == "bigint":
        stream = stream.withColumn(
            "ts", F.expr("CAST(timestamp_micros(ts DIV 1000) AS timestamp_ntz)")
        )
    agg = stream.groupBy(
        F.window("ts", "2 hours", "1 hour").alias("w")
    ).agg(
        F.count("*").alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
    )
    sink = "streaming_sliding_window_counts_sink"
    q = (
        agg.writeStream.format("memory")
        .queryName(sink)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return (
        spark.table(sink)
        .select(
            F.col("w.start").cast(ev_schema["ts"].dataType).alias("window_start"),
            "n_events",
            "sum_value",
        )
        .orderBy("window_start")
    )


@query(
    "streaming_static_join_segments",
    """
    SELECT c_mktsegment, count(*) AS n_events,
      CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM events JOIN customer ON user_id = c_custkey
    GROUP BY c_mktsegment ORDER BY c_mktsegment
    """,
    "streaming", "join", "agg",
)
def streaming_static_join_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static join (§2.F, the A9 side-input analog): the event
    stream enriches against the static customer dimension per micro-batch
    (broadcast on the static side), then aggregates by segment — run as a
    real StreamingQuery into a memory sink. The oracle is the equivalent
    batch join.
    Scale: the static side broadcasts once per batch; stream state is one
    row per segment."""
    ev_schema = load_table(spark, sf_dir, "events").schema
    raw_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    stream = (
        spark.readStream.schema(raw_schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    if dict(stream.dtypes).get("ts") == "bigint":
        stream = stream.withColumn(
            "ts", F.expr("CAST(timestamp_micros(ts DIV 1000) AS timestamp_ntz)")
        )
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    joined = stream.join(
        F.broadcast(cust), stream["user_id"] == cust["c_custkey"]
    )
    agg = joined.groupBy("c_mktsegment").agg(
        F.count("*").alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
    )
    sink = "streaming_static_join_segments_sink"
    q = (
        agg.writeStream.format("memory")
        .queryName(sink)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(sink).orderBy("c_mktsegment")
