"""Property-based tests (SURVEY §5.2) for the round-5 graph and
maintenance operators: hypothesis-generated graphs / changelogs / table
edits, checked against straight-line Python references. Each example
builds small DataFrames and runs the real operators — no mocks."""

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BooleanType,
    LongType,
    StructField,
    StructType,
)

from kiji_scoring_spark.operators.graph import bfs_hops, triangle_count
from kiji_scoring_spark.operators.maintenance import apply_changes, checksum_diff

EDGE_SCHEMA = StructType(
    [StructField("src", LongType()), StructField("dst", LongType())]
)

# small random undirected graphs on vertices 0..9
undirected_edges = st.sets(
    st.tuples(st.integers(0, 9), st.integers(0, 9)).filter(lambda e: e[0] != e[1]),
    max_size=20,
)


@settings(max_examples=8, deadline=None)
@given(edges=undirected_edges, seeds=st.sets(st.integers(0, 9), min_size=1, max_size=3))
def test_bfs_hops_matches_python_bfs(spark, edges, seeds):
    canon = {(min(a, b), max(a, b)) for a, b in edges}
    both = [(a, b) for a, b in canon] + [(b, a) for a, b in canon]
    edf = spark.createDataFrame(both or [(None, None)], EDGE_SCHEMA).filter(
        F.col("src").isNotNull()
    )
    sdf = spark.createDataFrame([(s,) for s in seeds], ["pk"])
    got = {r.pk: r.hops for r in bfs_hops(edf, sdf, max_hops=3).collect()}

    # reference: level-order BFS
    adj = {}
    for a, b in canon:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    want = {s: 0 for s in seeds}
    frontier = set(seeds)
    for hop in (1, 2, 3):
        nxt = set()
        for u in frontier:
            nxt |= adj.get(u, set())
        nxt -= set(want)
        for v in nxt:
            want[v] = hop
        frontier = nxt
    assert got == want


@settings(max_examples=8, deadline=None)
@given(edges=undirected_edges)
def test_triangle_count_matches_python(spark, edges):
    canon = {(min(a, b), max(a, b)) for a, b in edges}
    if not canon:
        return
    edf = spark.createDataFrame(sorted(canon), EDGE_SCHEMA)
    got = triangle_count(edf).first().n_triangles

    adj = {}
    for a, b in canon:
        adj.setdefault(a, set()).add(b)
    want = sum(1 for a, b in canon for c in adj.get(b, ()) if c in adj.get(a, ()))
    assert got == want


CHANGE_SCHEMA = StructType(
    [
        StructField("k", LongType()),
        StructField("seq", LongType()),
        StructField("is_del", BooleanType()),
        StructField("val", LongType()),
    ]
)

changelogs = st.lists(
    st.tuples(
        st.integers(0, 4),  # key
        st.integers(0, 100),  # seq (uniqueness enforced below)
        st.booleans(),
        st.integers(-5, 5),
    ),
    min_size=1,
    max_size=15,
    unique_by=lambda r: r[1],
)


@settings(max_examples=8, deadline=None)
@given(rows=changelogs)
def test_apply_changes_matches_dict_replay(spark, rows):
    df = spark.createDataFrame(rows, CHANGE_SCHEMA)
    out = {
        r.k: (r.val, r.last_seq, r.n_changes)
        for r in apply_changes(
            df, keys=["k"], seq="seq", is_delete=F.col("is_del"), payload=["val"]
        ).collect()
    }

    last, counts = {}, {}
    for k, seq, is_del, val in rows:
        counts[k] = counts.get(k, 0) + 1
        if k not in last or seq > last[k][0]:
            last[k] = (seq, is_del, val)
    want = {
        k: (val, seq, counts[k])
        for k, (seq, is_del, val) in last.items()
        if not is_del
    }
    assert out == want


@settings(max_examples=8, deadline=None)
@given(rows=changelogs, split=st.integers(2, 4))
def test_apply_changes_incremental_fold_equals_one_shot(spark, rows, split):
    """fold(fold(batch1), batch2) == fold(batch1 ∪ batch2), PROVIDED the
    intermediate state keeps tombstones — the reason keep_tombstones
    exists. A lower-seq upsert in batch 2 must not resurrect a key whose
    batch-1 winner was a delete."""
    b1 = [r for r in rows if r[1] % split != 0]
    b2 = [r for r in rows if r[1] % split == 0]
    if not b1 or not b2:
        return
    kw = dict(keys=["k"], seq="seq", is_delete=F.col("is_del"), payload=["val"])

    one_shot = apply_changes(spark.createDataFrame(rows, CHANGE_SCHEMA), **kw)
    state1 = apply_changes(
        spark.createDataFrame(b1, CHANGE_SCHEMA), keep_tombstones=True, **kw
    ).select(
        "k",
        F.col("last_seq").alias("seq"),
        F.col("is_deleted").alias("is_del"),
        "val",
    )
    folded = apply_changes(
        state1.unionByName(spark.createDataFrame(b2, CHANGE_SCHEMA).select(state1.columns)),
        **kw,
    )
    got = {(r.k, r.val, r.last_seq) for r in folded.collect()}
    want = {(r.k, r.val, r.last_seq) for r in one_shot.collect()}
    assert got == want


TABLE_SCHEMA = StructType(
    [StructField("k", LongType()), StructField("v", LongType())]
)

tables = st.dictionaries(st.integers(0, 20), st.integers(-5, 5), max_size=12)


@settings(max_examples=8, deadline=None)
@given(
    base=tables,
    updates=st.dictionaries(st.integers(0, 20), st.integers(-5, 5), max_size=6),
    deletes=st.sets(st.integers(0, 20), max_size=4),
)
def test_checksum_diff_classifies_edits(spark, base, updates, deletes):
    new = dict(base)
    new.update(updates)  # keys not in base become inserts
    for k in deletes:
        new.pop(k, None)
    if not base and not new:
        return

    bdf = spark.createDataFrame(sorted(base.items()) or [(None, None)], TABLE_SCHEMA).filter(
        F.col("k").isNotNull()
    )
    ndf = spark.createDataFrame(sorted(new.items()) or [(None, None)], TABLE_SCHEMA).filter(
        F.col("k").isNotNull()
    )
    got = {
        r.k: (r.change, r.old_v, r.new_v)
        for r in checksum_diff(bdf, ndf, key="k", canon_cols=["v"], n_buckets=8).collect()
    }

    want = {}
    for k in set(base) | set(new):
        inb, inn = k in base, k in new
        if inb and not inn:
            want[k] = ("D", base[k], None)
        elif inn and not inb:
            want[k] = ("I", None, new[k])
        elif base[k] != new[k]:
            want[k] = ("U", base[k], new[k])
    assert got == want
