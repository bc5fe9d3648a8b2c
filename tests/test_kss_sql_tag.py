"""The ``_kss_sql`` fast path (r15) builds wide expressions as ONE parsed
SQL string when inputs carry SQL-text tags. These tests pin its two safety
contracts (r15 VERDICT #4 / ADVICE):

1. the string path and the Column-tree path produce the SAME analyzed
   plan (canonicalized) for every consumer shape — a divergence here is
   a silently different expression;
2. names F.col accepts but F.expr would MISPARSE (hyphens, dots, spaces)
   never get a tag, so they take the always-correct tree path instead of
   parsing 'fam_my-col' as subtraction.
"""

from pyspark.sql import functions as F

from kiji_scoring_spark import model
from kiji_scoring_spark.pq_common import pq_drift_expr


def _canon(df):
    return df._jdf.queryExecution().analyzed().canonicalized().toString()


def _drift_fixture(spark):
    cb = F.expr(
        "map(1L, array(1L, 2L, 3L, 4L, 5L, 6L, 7L, 8L))"
    )  # tiny LUT; drift still builds its full 64-term sum
    return (
        spark.range(3)
        .select(
            F.expr(
                "transform(sequence(1, 64), i -> CAST(i + id AS LONG))"
            ).alias("emb_q"),
            F.expr("transform(sequence(1, 8), i -> 1L)").alias("codes"),
            cb.alias("cb_map"),
        )
    )


def test_drift_string_and_tree_paths_equal_plans(spark):
    df = _drift_fixture(spark)
    # string path: plain-string args carry their own SQL text
    fast = df.select(pq_drift_expr("emb_q", "codes", "cb_map").alias("d"))
    # tree path: untagged Column objects force the fold build
    slow = df.select(
        pq_drift_expr(F.col("emb_q"), F.col("codes"), F.col("cb_map")).alias("d")
    )
    assert _canon(fast) == _canon(slow)
    assert fast.collect() == slow.collect()


def test_tagged_model_col_equal_plans(spark):
    df = spark.range(3).select(
        F.expr(
            "array(struct(2L AS ts, CAST(id AS DOUBLE) AS value),"
            " struct(1L AS ts, 0.0D AS value))"
        ).alias("fam_visits")
    )
    tagged = model.most_recent_value("fam_visits")  # carries _kss_sql
    assert vars(tagged).get("_kss_sql") == "try_element_at(`fam_visits`, 1).value"
    via_sql = df.select(F.expr(vars(tagged)["_kss_sql"]).alias("v"))
    via_tree = df.select(
        model.most_recent_value(F.col("fam_visits")).alias("v")
    )
    assert _canon(via_sql) == _canon(via_tree)


def test_non_identifier_names_never_tagged(spark):
    # F.col accepts these; F.expr would misparse them — they must fall
    # back to the tree path (no tag), not produce a wrong expression
    for bad in ("fam_my-col", "a b", "x.y"):
        col = model._col(bad)
        assert vars(col).get("_kss_sql") is None, bad
    # reserved words ARE python identifiers — the backtick quoting makes
    # them parse as identifiers on the string path
    assert vars(model._col("select")).get("_kss_sql") == "`select`"
    # and the drift expr still computes over such a column via the tree
    df = (
        _drift_fixture(spark)
        .withColumnRenamed("emb_q", "emb-q")
    )
    out = df.select(
        pq_drift_expr(model._col("`emb-q`"), "codes", "cb_map").alias("d")
    )
    ref = df.withColumnRenamed("emb-q", "emb_q").select(
        pq_drift_expr("emb_q", "codes", "cb_map").alias("d")
    )
    assert out.collect() == ref.collect()
