"""The scan layer's convenience surface (sources.load_all /
register_views) had no executing test: pin that every driver table loads
with oracle-compatible types and that the registered SQL views answer
spark.sql queries — the entry point a SQL-only user of the engine takes."""

from kiji_scoring_spark.sources import TABLES, load_all, register_views


def test_load_all_covers_every_table_with_converted_types(spark, sf_dir):
    dfs = load_all(spark, sf_dir)
    assert set(dfs) == set(TABLES)
    # the nanos quirk is converted at the scan layer, not left to queries
    assert dict(dfs["events"].dtypes)["ts"] == "timestamp_ntz"
    for t, df in dfs.items():
        assert len(df.schema.fields) > 0, t


def test_register_views_serves_sql_surface(spark, sf_dir):
    register_views(spark, sf_dir)
    n = spark.sql("SELECT count(*) AS n FROM nation").collect()[0]["n"]
    assert n == 25
    # views compose: a join through the SQL surface over two views
    rows = spark.sql(
        """
        SELECT r.r_name, count(*) AS n_nations
        FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
        GROUP BY r.r_name ORDER BY r.r_name
        """
    ).collect()
    assert sum(r["n_nations"] for r in rows) == 25 and len(rows) == 5
