"""Property-based tests (SURVEY §5.2): the versioned-cell helpers and
dedup idempotence, checked against straight-line Python references over
hypothesis-generated inputs. Each example builds one small DataFrame and
runs the real engine expressions — no mocks."""

from hypothesis import given, settings, strategies as st

from kiji_scoring_spark import model
from kiji_scoring_spark.operators import dedup as dd
from pyspark.sql import functions as F
from pyspark.sql.types import IntegerType, StructField, StructType

VERSIONS_SCHEMA = StructType(
    [StructField("vs", model.versions_type(IntegerType()))]
)

# (ts, value) version sets: distinct timestamps, arbitrary small ints
versions_strategy = st.lists(
    st.tuples(st.integers(0, 50), st.integers(-5, 5)),
    max_size=8,
    unique_by=lambda tv: tv[0],
)


def to_cells(tvs):
    """Python reference ordering: ts-desc, the model's invariant."""
    return sorted(tvs, key=lambda tv: -tv[0])


def run_expr(spark, tvs, expr_fn):
    df = spark.createDataFrame(
        [([{"ts": t, "value": v} for t, v in to_cells(tvs)],)], VERSIONS_SCHEMA
    )
    return df.select(expr_fn(F.col("vs")).alias("out")).first()["out"]


@settings(max_examples=12, deadline=None)
@given(tvs=versions_strategy, as_of=st.integers(0, 50))
def test_value_at_matches_reference(spark, tvs, as_of):
    got = run_expr(spark, tvs, lambda vs: model.value_at(vs, as_of))
    eligible = [v for t, v in to_cells(tvs) if t <= as_of]
    assert got == (eligible[0] if eligible else None)


@settings(max_examples=12, deadline=None)
@given(tvs=versions_strategy, lo=st.integers(0, 50), hi=st.integers(0, 50))
def test_versions_in_range_half_open(spark, tvs, lo, hi):
    got = run_expr(spark, tvs, lambda vs: model.versions_in_range(vs, lo, hi))
    want = [{"ts": t, "value": v} for t, v in to_cells(tvs) if lo <= t < hi]
    assert [r.asDict() for r in got] == want


@settings(max_examples=12, deadline=None)
@given(tvs=versions_strategy, ts=st.integers(0, 50), value=st.integers(-5, 5))
def test_with_put_keeps_desc_order_and_overwrites(spark, tvs, ts, value):
    got = run_expr(spark, tvs, lambda vs: model.with_put(vs, ts, value))
    ref = {t: v for t, v in tvs}
    ref[ts] = value  # equal-ts put overwrites (HBase semantics)
    want = [{"ts": t, "value": v} for t, v in sorted(ref.items(), key=lambda x: -x[0])]
    assert [r.asDict() for r in got] == want


@settings(max_examples=12, deadline=None)
@given(tvs=versions_strategy, k=st.integers(1, 10))
def test_latest_versions_prefix(spark, tvs, k):
    got = run_expr(spark, tvs, lambda vs: model.latest_versions(vs, k))
    want = [{"ts": t, "value": v} for t, v in to_cells(tvs)[:k]]
    assert [r.asDict() for r in got] == want


# -- dedup idempotence ------------------------------------------------------

docs_strategy = st.lists(
    st.text(alphabet="ab ", min_size=0, max_size=12), min_size=1, max_size=20
)


@settings(max_examples=10, deadline=None)
@given(texts=docs_strategy)
def test_exact_dedup_idempotent_and_canonical(spark, texts):
    """dedup(dedup(x)) == dedup(x), and the canonical survivor per text is
    the minimum doc_id — the exact-dedup contract queries rely on."""
    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    def dedup(d):
        return (
            d.groupBy("text")
            .agg(F.min("doc_id").alias("doc_id"))
            .select("doc_id", "text")
        )

    once = dedup(df)
    got = sorted((r.doc_id, r.text) for r in once.collect())
    twice = sorted((r.doc_id, r.text) for r in dedup(once).collect())
    want = sorted(
        (min(i for i, t2 in rows if t2 == t), t) for t in {t for _, t in rows}
    )
    assert got == want
    assert twice == got


@settings(max_examples=10, deadline=None)
@given(texts=docs_strategy)
def test_minhash_band_pairs_symmetric_and_ordered(spark, texts):
    """band_pairs invariants: doc_a < doc_b, no self-pairs, no duplicates,
    and identical texts (with >= 3 words) always pair."""
    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    sig = dd.minhash_signature_df(df, "doc_id", "text")
    bands = dd.minhash_band_keys(sig, "doc_id")
    pairs = [(r.doc_a, r.doc_b) for r in dd.band_pairs(bands, "doc_id").collect()]
    assert all(a < b for a, b in pairs)
    assert len(pairs) == len(set(pairs))
    by_text = {}
    for i, t in rows:
        if len(t.split(" ")) >= 3:
            by_text.setdefault(t, []).append(i)
    for ids in by_text.values():
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                assert (ids[i], ids[j]) in pairs


# ---------------------------------------------------------------------------
# as-of join with a caller-supplied unique left id (round-4: the
# retry-deterministic path) vs a straight-line Python reference, with
# duplicate left (key, ts) rows that the id must keep apart.
# ---------------------------------------------------------------------------

left_rows_strategy = st.lists(
    st.tuples(st.integers(0, 2), st.integers(0, 50)), min_size=1, max_size=8
)
right_rows_strategy = st.lists(
    st.tuples(st.integers(0, 2), st.integers(0, 50), st.integers(-9, 9)),
    max_size=8,
    unique_by=lambda r: (r[0], r[1]),
)


@settings(max_examples=12, deadline=None)
@given(lrows=left_rows_strategy, rrows=right_rows_strategy)
def test_asof_join_left_id_matches_reference(spark, lrows, rrows):
    from kiji_scoring_spark.operators import joins

    left = spark.createDataFrame(
        [(i, u, t) for i, (u, t) in enumerate(lrows)], "rowid long, uid long, ts long"
    )
    right = spark.createDataFrame(rrows, "uid long, ts long, val long") if rrows else (
        spark.createDataFrame([], "uid long, ts long, val long")
    )
    got = sorted(
        (r.rowid, r.val)
        for r in joins.asof_join(
            left, right, ["uid"], "ts", "ts", left_id="rowid"
        ).collect()
    )
    want = []
    for i, (u, t) in enumerate(lrows):
        matches = [(rt, rv) for ru, rt, rv in rrows if ru == u and rt <= t]
        want.append((i, max(matches)[1] if matches else None))
    # every left row survives exactly once — duplicates of (uid, ts) keep
    # their own identity under the caller-supplied id
    assert got == sorted(want)
