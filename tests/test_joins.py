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


def test_asof_without_left_id_deterministic_fallback(spark):
    """r7: the old monotonically_increasing_id fallback (nondeterministic
    under stage retries) is retired. Without left_id the plan must (a) keep
    per-row multiplicity for DUPLICATE left rows, (b) contain no
    nondeterministic id expression, and (c) give the same multiset as the
    explicit-left_id plan."""
    left = spark.createDataFrame(
        [("u1", 100), ("u1", 100), ("u1", 50), ("u2", 10)], ["uid", "ts"]
    ).repartition(4)
    right = spark.createDataFrame(
        [("u1", 90, "a"), ("u1", 40, "b"), ("u2", 99, "c")], ["uid", "ts", "val"]
    )
    out = joins.asof_join(left, right, ["uid"], "ts", "ts")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "monotonically_increasing_id" not in plan
    got = sorted((r.uid, r.ts, r.val) for r in out.collect())
    # the two identical (u1,100) rows EACH keep their match
    assert got == [
        ("u1", 50, "b"),
        ("u1", 100, "a"),
        ("u1", 100, "a"),
        ("u2", 10, None),
    ]


def test_range_join_bucketed_matches_plain(spark, sf_dir):
    """The interval-bucketing rewrite returns exactly the rows of the
    plain theta range join (and the join on bucket is an equi hash join,
    not a cross product)."""
    from kiji_scoring_spark.sources import load_table

    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        (F.unix_micros(F.col("ts").cast("timestamp")) / 1000).cast("long").alias("ts_ms"),
    ).limit(2000)
    HOUR = 3_600_000
    # synthetic intervals: 6 windows of varying width per user bucket
    iv = spark.sql(
        "SELECT * FROM VALUES (0), (1), (2), (3), (4), (5) AS t(win_id)"
    ).select(
        "win_id",
        (F.lit(1_704_067_200_000) + F.col("win_id").cast("long") * (5 * 24 * HOUR)).alias("lo_ms"),
        (F.lit(1_704_067_200_000) + (F.col("win_id").cast("long") + 1) * (5 * 24 * HOUR)).alias("hi_ms"),
    )
    plain = joins.range_join(ev, iv, None, "ts_ms", "lo_ms", "hi_ms")
    bucketed = joins.range_join_bucketed(ev, iv, None, "ts_ms", "lo_ms", "hi_ms", 24 * HOUR)
    got_a = sorted((r.event_id, r.win_id) for r in plain.collect())
    got_b = sorted((r.event_id, r.win_id) for r in bucketed.collect())
    assert got_a == got_b and len(got_a) > 0


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
