"""Semantic gates for the round-5 graph / incremental-state queries
(queries_graph.py) beyond the oracle parity sweep: BFS level invariants,
partial-merge == full recompute, tombstone semantics, HLL determinism."""

import shutil

import pytest
from pyspark.sql import functions as F

from kiji_scoring_spark.queries import QUERIES
from kiji_scoring_spark.queries_graph import _state_path
from kiji_scoring_spark.sources import load_table


def test_bfs_levels_are_minimal_and_connected(spark, sf_dir):
    """Every hop-0 row is exactly the seed set; every hop-k>0 vertex has
    an edge from some hop-(k-1) vertex and appears at exactly one hop."""
    out = QUERIES["graph_bfs_copurchase_hops"].fn(spark, sf_dir).collect()
    hops = {}
    for r in out:
        assert r.partkey not in hops, "vertex reported at two hop levels"
        hops[r.partkey] = r.hops

    seeds = {
        r.p_partkey
        for r in load_table(spark, sf_dir, "part")
        .filter(F.col("p_partkey") % 500 == 0)
        .collect()
    }
    assert {pk for pk, h in hops.items() if h == 0} == seeds

    qual = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_quantity") >= 40)
        .select("l_orderkey", "l_partkey")
        .collect()
    )
    by_order = {}
    for r in qual:
        by_order.setdefault(r.l_orderkey, set()).add(r.l_partkey)
    adj = {}
    for pks in by_order.values():
        for a in pks:
            adj.setdefault(a, set()).update(pks - {a})

    for pk, h in hops.items():
        if h == 0:
            continue
        preds = {n for n, nbrs in adj.items() if pk in nbrs}
        assert any(hops.get(p) == h - 1 for p in preds), (
            f"vertex {pk} at hop {h} has no predecessor at hop {h - 1}"
        )
        # minimality: no neighbor sits more than one level below
        assert all(hops.get(p, 99) >= h - 1 for p in preds)


def test_incremental_merge_equals_full_recompute(spark, sf_dir):
    """Partial-state merge must be indistinguishable from a one-shot
    groupBy over the whole orders table (algebraic-aggregate contract)."""
    merged = QUERIES["incremental_agg_partial_merge"].fn(spark, sf_dir)
    o = load_table(spark, sf_dir, "orders")
    full = (
        o.groupBy(
            F.col("o_orderpriority").alias("pri"),
            F.month("o_orderdate").alias("mth"),
        )
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("td"),
        )
        .select(
            "pri",
            "mth",
            "cnt",
            F.col("td").cast("double").alias("total"),
            (F.col("td").cast("double") / F.col("cnt")).alias("avg_price"),
        )
        .orderBy("pri", "mth")
    )
    assert merged.collect() == full.collect()


def test_incremental_merge_scans_only_delta_after_state_write(spark, sf_dir):
    """Once the base state parquet exists, the executed plan must not
    contain a scan of the full orders table without the delta filter —
    i.e. the base corpus is read from the persisted partial aggs."""
    fn = QUERIES["incremental_agg_partial_merge"].fn
    fn(spark, sf_dir).collect()  # ensure state exists
    plan = fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    # the persisted partial-agg state is scanned (its schema carries the
    # pre-aggregated columns, which no raw table has) ...
    assert "total_dec" in plan
    # ... and the raw orders table is scanned exactly once (the delta side)
    assert plan.count("o_totalprice:double") == 1


def test_cdc_tombstone_removes_key_and_late_upsert_loses(spark, sf_dir):
    """A key whose highest-seq change is a delete is absent from the
    output, regardless of how many earlier upserts it had; a key whose
    highest-seq change is an upsert is present with exactly that row."""
    ev = load_table(spark, sf_dir, "events").collect()
    last = {}
    counts = {}
    for r in ev:
        counts[r.user_id] = counts.get(r.user_id, 0) + 1
        prev = last.get(r.user_id)
        if prev is None or r.event_id > prev.event_id:
            last[r.user_id] = r
    expect_present = {
        u: r for u, r in last.items() if r.event_type != "error"
    }
    expect_absent = {u for u, r in last.items() if r.event_type == "error"}

    out = {r.user_id: r for r in QUERIES["cdc_apply_changes_ordered"].fn(spark, sf_dir).collect()}
    assert set(out) == set(expect_present)
    assert expect_absent.isdisjoint(out)
    for u, r in expect_present.items():
        assert out[u].last_seq == r.event_id
        assert out[u].n_changes == counts[u]


def test_hll_union_estimate_deterministic_and_tight(spark, sf_dir):
    """The shard-union estimate must be reproducible run-to-run (HLL
    max-merge is order-independent) and within 2% of exact — tighter
    than the 5% the oracle contract gates on."""
    fn = QUERIES["sketch_hll_shard_union"].fn
    shutil.rmtree(_state_path(sf_dir, "hll_user_shards.parquet"), ignore_errors=True)
    ev = load_table(spark, sf_dir, "events")
    exact = ev.agg(F.countDistinct("user_id")).first()[0]
    ests = []
    for _ in range(2):
        first = fn(spark, sf_dir).first()
        assert first.estimate_ok
        assert first.exact_users == exact
        # recompute raw estimate from the persisted shards directly
        shards = spark.read.parquet(_state_path(sf_dir, "hll_user_shards.parquet"))
        est = shards.agg(
            F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("e")
        ).first().e
        ests.append(est)
        shutil.rmtree(
            _state_path(sf_dir, "hll_user_shards.parquet"), ignore_errors=True
        )
    assert ests[0] == ests[1], "HLL union estimate not deterministic"
    assert abs(ests[0] - exact) <= 0.02 * max(exact, 1)


@pytest.mark.parametrize(
    "name",
    [
        "graph_bfs_copurchase_hops",
        "incremental_agg_partial_merge",
        "cdc_apply_changes_ordered",
    ],
)
def test_no_cartesian_in_graph_queries(spark, sf_dir, name):
    plan = (
        QUERIES[name].fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan
