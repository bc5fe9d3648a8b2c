"""Golden-value tests for the as-of / range join operators, including the
duplicate-left-row semantics (each identical left row keeps its own match
— round-2 fix; previously the all-columns window key collapsed them)."""

from pyspark.sql import functions as F

from kiji_scoring_spark.operators import joins


def test_asof_backward_basic(spark):
    left = spark.createDataFrame(
        [("u1", 100), ("u1", 250), ("u2", 50)], ["uid", "ts"]
    )
    right = spark.createDataFrame(
        [("u1", 90, "a"), ("u1", 200, "b"), ("u2", 60, "c")], ["uid", "ts", "val"]
    )
    got = {
        (r.uid, r.ts, r.val)
        for r in joins.asof_join(left, right, ["uid"], "ts", "ts").collect()
    }
    # u1@100 -> right ts=90 ("a"); u1@250 -> ts=200 ("b"); u2@50 -> no match
    assert got == {("u1", 100, "a"), ("u1", 250, "b"), ("u2", 50, None)}


def test_asof_forward(spark):
    left = spark.createDataFrame([("u1", 100)], ["uid", "ts"])
    right = spark.createDataFrame(
        [("u1", 90, "past"), ("u1", 150, "next"), ("u1", 300, "later")],
        ["uid", "ts", "val"],
    )
    got = joins.asof_join(left, right, ["uid"], "ts", "ts", direction="forward").collect()
    assert len(got) == 1 and got[0].val == "next"


def test_asof_duplicate_left_rows_each_survive(spark):
    # Two IDENTICAL left rows must produce two output rows (true per-row
    # semantics), not collapse into one window partition.
    left = spark.createDataFrame([("u1", 100), ("u1", 100)], ["uid", "ts"])
    right = spark.createDataFrame([("u1", 90, 1.5)], ["uid", "ts", "score"])
    rows = joins.asof_join(left, right, ["uid"], "ts", "ts").collect()
    assert len(rows) == 2
    assert all(r.score == 1.5 for r in rows)


def test_asof_equal_ts_right_row_included(spark):
    left = spark.createDataFrame([("u1", 100)], ["uid", "ts"])
    right = spark.createDataFrame([("u1", 100, "eq")], ["uid", "ts", "val"])
    rows = joins.asof_join(left, right, ["uid"], "ts", "ts").collect()
    assert rows[0].val == "eq"


def test_asof_join_matches_union_variant(spark, sf_dir):
    from kiji_scoring_spark.sources import load_table

    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "value")
    left = ev.select("user_id", "ts").limit(200)
    # dedupe right to unique (user_id, ts) so both variants are deterministic
    right = ev.groupBy("user_id", "ts").agg(F.max("value").alias("value"))
    a = joins.asof_join(left, right, ["user_id"], "ts", "ts")
    b = joins.asof_join_union(left, right, ["user_id"], "ts", "ts", ["value"])
    ga = sorted((r.user_id, r.ts, r.value) for r in a.collect())
    gb = sorted((r.user_id, r.ts, r.value) for r in b.collect())
    assert ga == gb
