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


def test_triangle_count_matches_naive_enumeration(spark, sf_dir):
    """The degree-oriented count must equal the naive a<b<c three-way
    self-join, computed independently here in Spark."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") >= 40)
    qual = li.select("l_orderkey", "l_partkey").collect()
    by_order = {}
    for r in qual:
        by_order.setdefault(r.l_orderkey, set()).add(r.l_partkey)
    edges = set()
    for pks in by_order.values():
        s = sorted(pks)
        for i, a in enumerate(s):
            for b in s[i + 1 :]:
                edges.add((a, b))
    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
    naive = sum(
        1
        for (a, b) in edges
        for c in adj.get(b, ())
        if c in adj.get(a, ())
    )
    row = QUERIES["graph_triangle_count_copurchase"].fn(spark, sf_dir).first()
    assert row.n_edges == len(edges)
    assert row.n_triangles == naive


def test_bitmap_shards_exact_and_idempotent_remerge(spark, sf_dir):
    """Bitmap counts equal exact COUNT(DISTINCT); OR-ing the stored
    shards in twice (simulating a replayed ingest batch) changes
    nothing — the exactly-once-without-dedup property."""
    import shutil as _sh

    _sh.rmtree(_state_path(sf_dir, "bitmap_user_shards.parquet"), ignore_errors=True)
    out = {
        r.event_type: r.n_users
        for r in QUERIES["bitmap_exact_distinct_shards"].fn(spark, sf_dir).collect()
    }
    ev = load_table(spark, sf_dir, "events")
    exact = {
        r.event_type: r.n
        for r in ev.groupBy("event_type").agg(F.countDistinct("user_id").alias("n")).collect()
    }
    exact["ALL"] = ev.agg(F.countDistinct("user_id")).first()[0]
    assert out == exact

    shards = spark.read.parquet(_state_path(sf_dir, "bitmap_user_shards.parquet"))
    doubled = (
        shards.unionByName(shards)
        .groupBy("bkt")
        .agg(F.bitmap_or_agg("bm").alias("bm"))
        .agg(F.sum(F.bitmap_count("bm")).alias("n"))
        .first()
        .n
    )
    assert doubled == exact["ALL"]


def test_table_diff_classifies_every_change_and_prunes_buckets(spark, sf_dir):
    """Every %89 key is a D, every %97-not-%89 key a U with exactly
    +100 cents, nothing else appears; and the checksum stage must prune
    — fewer changed buckets than populated buckets."""
    out = QUERIES["table_diff_checksum_buckets"].fn(spark, sf_dir).collect()
    o = load_table(spark, sf_dir, "orders")
    keys = [r.o_orderkey for r in o.select("o_orderkey").collect()]
    expect_d = {k for k in keys if k % 89 == 0}
    expect_u = {k for k in keys if k % 97 == 0 and k % 89 != 0}
    got_d = {r.o_orderkey for r in out if r.change == "D"}
    got_u = {r.o_orderkey for r in out if r.change == "U"}
    assert got_d == expect_d
    assert got_u == expect_u
    assert len(out) == len(expect_d) + len(expect_u)
    for r in out:
        if r.change == "U":
            assert r.new_cents == r.old_cents + 100
        else:
            assert r.new_cents is None

    changed_buckets = {k % 256 for k in expect_d | expect_u}
    populated = {k % 256 for k in keys}
    assert len(changed_buckets) < len(populated), (
        "diff should row-compare only a strict subset of buckets"
    )


@pytest.mark.parametrize(
    "name",
    [
        "graph_bfs_copurchase_hops",
        "incremental_agg_partial_merge",
        "cdc_apply_changes_ordered",
        "graph_triangle_count_copurchase",
        "table_diff_checksum_buckets",
    ],
)
def test_no_cartesian_in_graph_queries(spark, sf_dir, name):
    plan = (
        QUERIES[name].fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan
