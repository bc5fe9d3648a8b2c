"""The stock `kiji_scoring_spark.lib` producers are registry-loadable by
dotted name (A17 surface) but two of them had no executing test: pin the
demo counter producer (TestFreshnessDemo.java:85-97 shape) and the
TestProducer-analog constant writer through the real freshen path."""

from pyspark.sql.types import LongType, StringType, StructField, StructType

from kiji_scoring_spark import model
from kiji_scoring_spark.fresh import FreshTableReader
from kiji_scoring_spark.registry import FreshenerRegistry, TableLayout

NOW_MS = 1_000_000_000


def _value_table(spark, value_type, rows):
    schema = StructType(
        [
            StructField("entity_id", StringType(), False),
            StructField("value_versions", model.versions_type(value_type)),
        ]
    )
    return spark.createDataFrame(rows, schema)


def _reader(spark, df, producer_path):
    reg = FreshenerRegistry()
    reg.store(
        TableLayout(df.schema),
        "t",
        "value:versions",
        producer_path,
        "kiji_scoring_spark.policies.AlwaysFreshen",
        "",
    )
    return FreshTableReader(spark, "t", df, reg)


def _newest(df):
    return {
        r["entity_id"]: r["v"]
        for r in df.select(
            "entity_id", model.most_recent_value("value_versions").alias("v")
        ).collect()
    }


def test_increment_latest_value_producer_by_dotted_name(spark):
    df = _value_table(spark, LongType(), [("foo", [(1, 10)]), ("bar", [(2, 41)])])
    reader = _reader(
        spark, df, "kiji_scoring_spark.lib.IncrementLatestValueProducer"
    )
    assert _newest(reader.scan(NOW_MS)) == {"foo": 11, "bar": 42}


def test_constant_producer_by_dotted_name(spark):
    df = _value_table(
        spark, StringType(), [("foo", [(1, "old")]), ("bar", [(2, "older")])]
    )
    reader = _reader(spark, df, "kiji_scoring_spark.lib.ConstantProducer")
    assert _newest(reader.scan(NOW_MS)) == {"foo": "new-val", "bar": "new-val"}


def test_streaming_window_helpers_batch_semantics(spark):
    """sliding_window_agg / session_window_agg are the streaming module's
    generic window builders (same API batch or stream — Spark's window()
    and session_window() are mode-agnostic); pin their grouping semantics
    on a batch frame where the expected answer is closed-form."""
    import datetime as dt

    from pyspark.sql import functions as F

    from kiji_scoring_spark.streaming import session_window_agg, sliding_window_agg

    base = dt.datetime(2025, 1, 1)
    rows = [
        ("u1", base, 1.0),
        ("u1", base + dt.timedelta(minutes=4), 2.0),
        ("u1", base + dt.timedelta(minutes=20), 4.0),  # new session (gap 10m)
        ("u2", base + dt.timedelta(minutes=1), 8.0),
    ]
    df = spark.createDataFrame(rows, "user string, ts timestamp, v double")

    slid = sliding_window_agg(
        df, "ts", "10 minutes", "5 minutes", {"total": F.sum("v")}, keys=["user"]
    )
    got = {
        (r["user"], r["window"]["start"].minute, r["total"])
        for r in slid.collect()
    }
    # each event lands in exactly two 10m/5m windows
    assert ("u1", 0, 3.0) in got and ("u1", 55, 3.0) in got
    assert ("u1", 20, 4.0) in got and ("u1", 15, 4.0) in got
    assert ("u2", 0, 8.0) in got and ("u2", 55, 8.0) in got

    sess = session_window_agg(df, "ts", "10 minutes", ["user"], {"n": F.count("*")})
    counts = sorted((r["user"], r["n"]) for r in sess.collect())
    # u1: events at 0,4 merge into one session; 20 is its own; u2: one
    assert counts == [("u1", 1), ("u1", 2), ("u2", 1)]
