"""IVF ANN quality gate: no SQL oracle exists (KMeans is iterative), so
correctness is asserted as recall against the exact brute-force top-k —
the standard way ANN indexes are validated."""

import pytest
from pyspark.sql import functions as F

from kiji_scoring_spark.operators import similarity as sim
from kiji_scoring_spark.sources import load_table

K = 5
N_PROBE = 6


@pytest.fixture(scope="module")
def parts(spark, sf_dir):
    e = load_table(spark, sf_dir, "embeddings")
    centers = sim.train_ivf_centroids(e, "vec_id", "embedding", k=16)
    normed = sim.unit_normalized(e, "vec_id", "embedding")
    return e, centers, normed


def exact_topk(normed, probe_ids, k):
    a = normed.filter(F.col("vec_id").isin(probe_ids)).select(
        F.col("vec_id").alias("probe_id"), F.col("ne").alias("probe_ne")
    )
    b = normed.select(F.col("vec_id").alias("neighbor_id"), F.col("ne").alias("corpus_ne"))
    from pyspark.sql import Window

    w = Window.partitionBy("probe_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    dot = F.aggregate(
        F.zip_with("probe_ne", "corpus_ne", lambda x, y: x * y),
        F.lit(0.0),
        lambda s, v: s + v,
    )
    return (
        F.broadcast(a)
        .join(b, F.col("neighbor_id") != F.col("probe_id"))
        .withColumn("cos", F.round(dot, 9))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
    )


def test_ivf_recall_against_exact(spark, parts):
    e, centers, normed = parts
    probe_ids = list(range(10))
    corpus_cells = sim.with_cells(normed, centers)
    fanout = sim.probe_cell_fanout(
        normed.filter(F.col("vec_id").isin(probe_ids)), centers, N_PROBE
    )
    got = sim.ivf_topk(corpus_cells, fanout, K).collect()
    exact = exact_topk(normed, probe_ids, K).collect()

    by_probe_got = {}
    for r in got:
        by_probe_got.setdefault(r.probe_id, set()).add(r.neighbor_id)
    by_probe_exact = {}
    for r in exact:
        by_probe_exact.setdefault(r.probe_id, set()).add(r.neighbor_id)

    assert set(by_probe_got) == set(by_probe_exact) == set(probe_ids)
    hits = sum(
        len(by_probe_got[p] & by_probe_exact[p]) for p in probe_ids
    )
    recall = hits / (K * len(probe_ids))
    # 6/16 cells probed: recall well above random, below perfect by design
    # (measured 0.64 deterministic at sf0.001 with seed-42 KMeans)
    assert recall >= 0.6, f"IVF recall {recall:.2f} below bound"

    # ANN results are always a subset of the corpus with correct ordering
    for r in got:
        assert 1 <= r.rn <= K
        assert r.neighbor_id != r.probe_id


def test_cell_assignment_partitions_corpus(spark, parts):
    e, centers, normed = parts
    cells = sim.with_cells(normed, centers)
    n = e.count()
    assert cells.count() == n  # every vector lands in exactly one cell
    dist = cells.groupBy("cell_id").count().collect()
    assert 1 < len(dist) <= 16
    assert sum(r["count"] for r in dist) == n


def test_deterministic_across_runs(spark, parts):
    e, centers, _ = parts
    again = sim.train_ivf_centroids(e, "vec_id", "embedding", k=16)
    assert centers == again  # fixed seed → stable quantizer


def test_zero_norm_vector_yields_zero_not_nan(spark):
    """Round-2 guard: an all-zero embedding must normalize to the zero
    vector (cosine 0 everywhere), not divide by 0.0 and poison rankings
    with NaN/Inf."""
    import math

    df = spark.createDataFrame(
        [(1, [0.0, 0.0, 0.0]), (2, [3.0, 4.0, 0.0])],
        "vec_id INT, embedding ARRAY<DOUBLE>",
    )
    rows = {r.vec_id: r.ne for r in sim.unit_normalized(df, "vec_id", "embedding").collect()}
    assert rows[1] == [0.0, 0.0, 0.0]
    assert all(not math.isnan(x) for x in rows[1])
    assert rows[2] == [0.6, 0.8, 0.0]
