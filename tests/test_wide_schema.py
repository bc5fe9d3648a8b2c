"""Round-9 wide-schema gates: the failure modes 500-column tables and
deep structs trigger that NO pruned registry query can reach (every
registry query names its columns, so on the `wide` regime they only
prove pruning works). This file drives the unpruned paths directly:

- project-ALL aggregation over ~500 columns (the wide UnsafeProjection /
  hash-aggregate codegen that classically trips Janino's 64 KB method
  limit — Spark must either split methods or fall back to interpreted
  mode, and either way values must match DuckDB exactly);
- a wide SHUFFLE (join carrying all ~600 combined columns through an
  exchange);
- deep-struct leaf access (10 levels), wide-struct field access,
  list-of-struct and map extraction — the nested-reader shapes;
- the pruning assertion itself: a 2-column query over the 495-column
  table must reach the scan with a 2-field ReadSchema.

The full-registry sweep over the same regime dir is the umbrella
(SPARK_GRAFT_SF_DIR_TEST=/tmp/regimes/wide pytest tests/test_oracle_parity.py
— recorded in REGIMES.md); this file pins the width-specific invariants
per session at sf0.001 cost."""

import os
import sys

import pytest

sys.path.insert(
    0,
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"),
)

from kiji_scoring_spark.sources import TABLES, load_table


@pytest.fixture(scope="session")
def wide_dir(tmp_path_factory):
    import duckdb

    from build_regimes import WIDE_MODS

    src = os.environ.get("SPARK_GRAFT_SCALE_SRC_SMALL", "/root/testdata/sf0.001")
    d = tmp_path_factory.mktemp("widesf")
    con = duckdb.connect()
    for t in TABLES:
        stmt = WIDE_MODS.get(t, "SELECT *")
        con.execute(
            f"COPY ({stmt} FROM read_parquet('{src}/{t}.parquet'))"
            f" TO '{d}/{t}.parquet' (FORMAT parquet)"
        )
    con.close()
    return str(d)


def _duck(wide_dir):
    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{wide_dir}/{t}.parquet')"
        )
    return con


def test_project_all_columns_aggregates_exactly(spark, wide_dir):
    """Group-by over the FULL 495-column projection: sums across all 121
    wide int columns and row counts per group must equal DuckDB. This is
    the plan whose generated consume/produce methods blow past 64 KB if
    Spark didn't split them — a silent Janino fallback is acceptable, a
    wrong or crashed answer is not."""
    from pyspark.sql import functions as F

    li = load_table(spark, wide_dir, "lineitem")  # no column pruning below
    assert len(li.columns) >= 490
    int_cols = [c for c in li.columns if c.startswith("wl_int_")]
    got = (
        li.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            *[F.sum(c).alias(f"s_{c}") for c in int_cols],
        )
        .orderBy("l_returnflag")
        .collect()
    )
    want = (
        _duck(wide_dir)
        .execute(
            "SELECT l_returnflag, COUNT(*) AS n, "
            + ", ".join(f"SUM(wl_int_{i:03d}) AS s_{i}" for i in range(121))
            + " FROM lineitem GROUP BY 1 ORDER BY 1"
        )
        .fetchall()
    )
    assert len(got) == len(want)
    for g, w in zip(got, want):
        assert g[0] == w[0] and g[1] == w[1]
        for i in range(121):
            assert g[2 + i] == w[2 + i], f"wl_int_{i:03d} sum diverged"


def test_wide_shuffle_join_carries_all_columns(spark, wide_dir):
    """Join lineitem (495 cols) to orders (110 cols) WITHOUT projecting
    first, forcing the full combined row through the exchange, then
    checksum a spread of wide columns from both sides."""
    from pyspark.sql import functions as F

    li = load_table(spark, wide_dir, "lineitem")
    o = load_table(spark, wide_dir, "orders")
    j = li.join(o, li.l_orderkey == o.o_orderkey)
    got = j.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("wl_int_120").alias("a"),
        F.sum("wo_int_051").alias("b"),
        F.sum(F.length("wl_str_120")).alias("c"),
    ).collect()[0]
    want = _duck(wide_dir).execute(
        "SELECT COUNT(*), SUM(wl_int_120), SUM(wo_int_051),"
        " SUM(length(wl_str_120))"
        " FROM lineitem JOIN orders ON l_orderkey = o_orderkey"
    ).fetchone()
    assert (got.n, got.a, got.b, got.c) == want


def test_deep_struct_leaf_and_nested_shapes(spark, wide_dir):
    """10-level struct leaf, 48-field wide struct, list-of-struct and map
    access must all read back exactly (DuckDB-written nested parquet →
    Spark nested readers)."""
    from pyspark.sql import functions as F

    ev = load_table(spark, wide_dir, "events")
    got = (
        ev.select(
            "event_id",
            F.col("w_deep.l1.l2.l3.l4.l5.l6.l7.l8.l9.l10").alias("leaf"),
            F.col("w_wide.f47").alias("wf"),
            F.element_at("w_list", 2)["v"].alias("lv"),
            F.element_at("w_map", "const").alias("mv"),
        )
        .orderBy("event_id")
        .limit(50)
        .collect()
    )
    want = _duck(wide_dir).execute(
        "SELECT event_id, w_deep.l1.l2.l3.l4.l5.l6.l7.l8.l9.l10,"
        " w_wide.f47, w_list[2].v, w_map['const'][1]"  # DuckDB map[k] yields a list
        " FROM events ORDER BY event_id LIMIT 50"
    ).fetchall()
    assert [(r.event_id, r.leaf, r.wf, r.lv, r.mv) for r in got] == [
        tuple(w) for w in want
    ]


def test_pruning_reads_two_fields_from_495(spark, wide_dir):
    """The point of a wide warehouse table: a 2-column aggregate must
    reach the parquet scan with a 2-field ReadSchema — reading 495
    columns for it at 100 TB is a ~250x I/O regression."""
    from pyspark.sql import functions as F

    li = load_table(spark, wide_dir, "lineitem")
    df = li.groupBy("l_returnflag").agg(F.sum("l_quantity").alias("q"))
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    read = plan.split("ReadSchema: ")[1].splitlines()[0]
    assert "l_returnflag" in read and "l_quantity" in read
    assert "wl_" not in read, f"wide columns leaked into the scan: {read}"
    # struct<...> with exactly the two needed fields
    assert read.count(":") <= 3, f"scan reads more than the 2 columns: {read}"


def test_deep_struct_pruning_reads_single_leaf(spark, wide_dir):
    """Nested-schema pruning: selecting one leaf of the 10-level struct
    must not read the sibling wide struct or the map."""
    from pyspark.sql import functions as F

    ev = load_table(spark, wide_dir, "events")
    df = ev.select(F.col("w_deep.l1.l2.l3.l4.l5.l6.l7.l8.l9.l10").alias("leaf"))
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    read = plan.split("ReadSchema: ")[1].splitlines()[0]
    assert "w_deep" in read
    assert "w_wide" not in read and "w_map" not in read and "w_list" not in read
