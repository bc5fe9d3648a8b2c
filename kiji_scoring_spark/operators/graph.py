"""Distributed graph primitives (SURVEY §2.C round-5 deepening):
frontier-iterative BFS and degree-oriented triangle counting, the two
traversal shapes a 100 TB entity-resolution / related-items pipeline
needs. Both are exact (integer hop counts / counts), so they sit under
the DuckDB hash gate via queries_graph.py and under hypothesis
property tests against pure-Python references.

Reference grounding: the reference has no graph surface; these extend
the capability set the way §2.G does, reusing its scale idioms
(localCheckpoint iteration from operators/dedup.py's connected
components, bounded in-bucket expansion)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bfs_hops(
    edges: DataFrame,
    seeds: DataFrame,
    max_hops: int,
    src: str = "src",
    dst: str = "dst",
    vertex: str = "pk",
    broadcast_frontier: bool = True,
) -> DataFrame:
    """Minimum-hop BFS from `seeds` over a DIRECTED edge list (pass both
    directions for an undirected graph). Returns one row per reachable
    vertex: (vertex, hops), seeds at hop 0, each vertex at its minimal
    hop exactly once.

    Scale shape: the edge list is hash-partitioned on `src` once and
    persisted so every level probes the same partitioning; the frontier
    (one level's vertex set, orders of magnitude smaller than the
    edges) is broadcast; each level is `localCheckpoint`-ed so level
    k+1 plans against materialized output instead of replaying the
    prefix. On a graph whose levels outgrow the broadcast threshold
    (dense expander graphs), pass broadcast_frontier=False — the
    identical loop degrades to a co-partitioned shuffle join against
    the edges' pinned `src` partitioning.
    """
    # The src repartition matters even under a broadcast frontier — NOT
    # for join partitioning (a BroadcastHashJoin never consults it) but
    # as the PARALLELISM SPREAD for the cached edges: AQE coalesces the
    # upstream distinct to advisory-size partitions (ONE partition at
    # small inputs), and every per-level join+distinct then runs
    # single-task. Removing it was tried r15 and benched 1.7 s -> 6.0 s
    # at sf0.1; the shuffle pays for itself three times over.
    edges = edges.select(
        F.col(src).alias("__src"), F.col(dst).alias("__dst")
    ).repartition("__src").persist()
    seeds = seeds.select(F.col(vertex).alias(vertex)).distinct()
    reached = seeds.withColumn("hops", F.lit(0))
    frontier = seeds
    for hop in range(1, max_hops + 1):
        probe = F.broadcast(frontier) if broadcast_frontier else frontier
        nxt = (
            edges.join(probe, on=F.col("__src") == F.col(vertex))
            .select(F.col("__dst").alias(vertex))
            .distinct()
            .join(reached.select(vertex), on=vertex, how="left_anti")
            .localCheckpoint()
        )
        reached = reached.unionByName(nxt.withColumn("hops", F.lit(hop)))
        frontier = nxt
    edges.unpersist()
    return reached


def triangle_count(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Exact triangle count over a CANONICAL undirected edge list
    (src < dst, distinct). Returns a single-row DataFrame
    (n_triangles BIGINT).

    Degree-ordered orientation: every edge is directed from its
    lower-(degree, id) endpoint to the higher one, wedges are
    enumerated only among each vertex's out-neighbors, and closed
    against the canonical edge set. Every triangle has exactly one
    pivot (its minimum-rank vertex) so it is counted exactly once, and
    after orientation every out-degree is O(sqrt(m)) on ANY graph — a
    degree-d hub contributes O(m) wedge work instead of O(d^2), so no
    single join key explodes a shuffle partition at 100 TB.
    """
    # lazy localCheckpoint: materialized once on first use, then shared by
    # every consumer (degree count, orientation, wedge-close) — a
    # persist()/unpersist() pair around a LAZY plan would unpersist before
    # anything executed and silently recompute the edge list per consumer
    ce = edges.select(
        F.col(src).alias("src"), F.col(dst).alias("dst")
    ).localCheckpoint(eager=False)
    deg = (
        ce.select(F.explode(F.array("src", "dst")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    ranked = ce.join(
        deg.withColumnRenamed("node", "src").withColumnRenamed("d", "ds"), "src"
    ).join(deg.withColumnRenamed("node", "dst").withColumnRenamed("d", "dd"), "dst")
    oriented = ranked.select(
        F.when(
            (F.col("ds") < F.col("dd"))
            | ((F.col("ds") == F.col("dd")) & (F.col("src") < F.col("dst"))),
            F.struct(F.col("src").alias("u"), F.col("dst").alias("v")),
        )
        .otherwise(F.struct(F.col("dst").alias("u"), F.col("src").alias("v")))
        .alias("e")
    ).select("e.u", "e.v")

    o1 = oriented.alias("o1")
    o2 = oriented.alias("o2")
    wedges = (
        o1.join(o2, on="u")
        .filter(F.col("o1.v") < F.col("o2.v"))
        .select(F.col("o1.v").alias("src"), F.col("o2.v").alias("dst"))
    )
    return wedges.join(ce, on=["src", "dst"], how="inner").agg(
        F.count(F.lit(1)).alias("n_triangles")
    )
