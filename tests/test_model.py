"""Versioned-cell model tests — golden values from the reference fixtures
(FIXTURES.md §1-3; TestInternalFreshKijiTableReader.java:206-216)."""

from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    MapType,
    StringType,
    StructField,
    StructType,
)

from kiji_scoring_spark import model


def fixture_df(spark):
    """row_data_test fixture (FIXTURES.md §1)."""
    schema = StructType(
        [
            StructField("entity_id", StringType(), False),
            StructField("family_qual0", model.versions_type(StringType()), True),
            StructField("map", MapType(StringType(), model.versions_type(IntegerType())), True),
        ]
    )
    rows = [
        ("foo", [(7, "foo-v2"), (5, "foo-val")], {"qualifier": [(5, 1)]}),
        ("bar", [(5, "bar-val")], None),
        ("baz", None, None),
    ]
    return spark.createDataFrame(rows, schema)


def collect_map(df, key, val):
    return {r[key]: r[val] for r in df.collect()}


def test_most_recent_value(spark):
    df = fixture_df(spark)
    out = df.select("entity_id", model.most_recent_value("family_qual0").alias("v"))
    assert collect_map(out, "entity_id", "v") == {
        "foo": "foo-v2",
        "bar": "bar-val",
        "baz": None,
    }


def test_most_recent_ts_and_contains(spark):
    df = fixture_df(spark)
    out = df.select(
        "entity_id",
        model.most_recent_ts("family_qual0").alias("ts"),
        model.contains_column("family_qual0").alias("has"),
    )
    got = {r["entity_id"]: (r["ts"], r["has"]) for r in out.collect()}
    assert got == {"foo": (7, True), "bar": (5, True), "baz": (None, False)}


def test_time_range_half_open(spark):
    df = fixture_df(spark)
    out = df.select(
        "entity_id",
        model.versions_in_range("family_qual0", 5, 7).alias("vr"),
    )
    got = collect_map(out, "entity_id", "vr")
    # [5, 7) excludes ts=7, keeps ts=5
    assert [(v["ts"], v["value"]) for v in got["foo"]] == [(5, "foo-val")]


def test_max_versions_and_value_at(spark):
    df = fixture_df(spark)
    out = df.select(
        "entity_id",
        model.latest_versions("family_qual0", 1).alias("v1"),
        model.value_at("family_qual0", 6).alias("at6"),
        model.value_at("family_qual0", 4).alias("at4"),
    )
    got = {r["entity_id"]: r for r in out.collect()}
    assert [x["value"] for x in got["foo"]["v1"]] == ["foo-v2"]
    assert got["foo"]["at6"] == "foo-val"  # newest ts <= 6 is 5
    assert got["foo"]["at4"] is None


def test_with_put_prepends_sorted(spark):
    df = fixture_df(spark)
    out = df.select(
        "entity_id",
        model.with_put("family_qual0", 6, F.lit("mid")).alias("v"),
    )
    got = collect_map(out, "entity_id", "v")
    assert [(v["ts"], v["value"]) for v in got["foo"]] == [
        (7, "foo-v2"),
        (6, "mid"),
        (5, "foo-val"),
    ]
    # NULL column behaves as empty version set
    assert [(v["ts"], v["value"]) for v in got["baz"]] == [(6, "mid")]


def test_with_put_overwrites_equal_ts(spark):
    df = fixture_df(spark)
    out = df.select("entity_id", model.with_put("family_qual0", 5, F.lit("NEW")).alias("v"))
    got = collect_map(out, "entity_id", "v")
    assert [(v["ts"], v["value"]) for v in got["foo"]] == [(7, "foo-v2"), (5, "NEW")]


def test_map_family_put_and_get(spark):
    df = fixture_df(spark)
    out = df.select(
        "entity_id",
        model.map_most_recent_value("map", "qualifier").alias("mv"),
        model.map_with_put("map", "qualifier", 10, F.lit(2)).alias("m2"),
    )
    got = {r["entity_id"]: r for r in out.collect()}
    assert got["foo"]["mv"] == 1
    # upsert: qualifier history gains ts=10 value=2 at the head
    hist = got["foo"]["m2"]["qualifier"]
    assert [(v["ts"], v["value"]) for v in hist] == [(10, 2), (5, 1)]
    # NULL family behaves as empty map
    hist_bar = got["bar"]["m2"]["qualifier"]
    assert [(v["ts"], v["value"]) for v in hist_bar] == [(10, 2)]
