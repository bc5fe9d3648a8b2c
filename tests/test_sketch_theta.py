"""Theta-sketch set operations (sketch_theta_set_ops): the below-θ
recoverability property and the θ/exact-mode arms pinned on population
shapes the registry dataset doesn't produce. Core claim: for θ = min of
the full samples' K-th minima, EVERY population key with h < θ is
inside its own sample's bottom-K, so intersection/union counts below θ
computed from the SAMPLES alone equal the same counts over the FULL
populations — the estimator's inputs are exact, only the 1/θ scaling
is statistical.
"""

import hashlib

K = 64


def _h(x):
    return hashlib.md5(str(x).encode()).hexdigest()


def _bottomk(keys, k=K):
    return sorted(((_h(x), x) for x in set(keys)))[:k]


def _theta(sa, sb, na, nb, k=K):
    """NULL (exact mode) when both pops fit inside K; else the smaller
    K-th minimum among the FULL samples — the query's CASE exactly."""
    full_a = len(sa) >= k
    full_b = len(sb) >= k
    if full_a and full_b:
        return min(sa[-1][0], sb[-1][0])
    if full_a:
        return sa[-1][0]
    if full_b:
        return sb[-1][0]
    return None


def _below(sample, theta):
    return {key for h, key in sample if theta is None or h < theta}


def test_below_theta_counts_are_exact_over_full_populations():
    # two overlapping populations, both far beyond K
    a = set(range(0, 3000))
    b = set(range(1500, 5000))
    sa, sb = _bottomk(a), _bottomk(b)
    theta = _theta(sa, sb, len(a), len(b))
    assert theta is not None
    # sample-side counts
    inter_s = _below(sa, theta) & _below(sb, theta)
    union_s = _below(sa, theta) | _below(sb, theta)
    # full-population truth below theta
    inter_f = {x for x in a & b if _h(x) < theta}
    union_f = {x for x in a | b if _h(x) < theta}
    assert inter_s == inter_f
    assert union_s == union_f


def test_exact_mode_when_both_populations_fit_in_k():
    a = set(range(10))
    b = set(range(5, 20))
    sa, sb = _bottomk(a), _bottomk(b)
    assert _theta(sa, sb, len(a), len(b)) is None
    # samples ARE the populations: set ops are exact
    assert {k for _, k in sa} & {k for _, k in sb} == a & b
    assert {k for _, k in sa} | {k for _, k in sb} == a | b


def test_one_sided_theta_uses_the_full_samples_kth():
    a = set(range(3000))          # full sample
    b = set(range(2990, 3005))    # 15 keys, under K
    sa, sb = _bottomk(a), _bottomk(b)
    theta = _theta(sa, sb, len(a), len(b))
    assert theta == sa[-1][0]
    # below-theta set ops still exact vs the full populations
    inter_s = _below(sa, theta) & _below(sb, theta)
    assert inter_s == {x for x in a & b if _h(x) < theta}


def test_registry_query_matches_python_reference(spark, sf_dir):
    from pyspark.sql import functions as F

    from kiji_scoring_spark.queries import QUERIES
    from kiji_scoring_spark.sources import load_table

    row = QUERIES["sketch_theta_set_ops"].fn(spark, sf_dir).collect()
    assert len(row) == 1
    row = row[0]
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_custkey").isNotNull())
        .select("o_custkey", "o_orderpriority")
        .collect()
    )
    a = {r.o_custkey for r in o if r.o_orderpriority == "1-URGENT"}
    b = {r.o_custkey for r in o if r.o_orderpriority == "5-LOW"}
    assert (row.n_a_exact, row.n_b_exact) == (len(a), len(b))
    assert row.n_inter_exact == len(a & b)
    assert row.n_union_exact == len(a | b)
    sa, sb = _bottomk(a), _bottomk(b)
    theta = _theta(sa, sb, len(a), len(b))
    assert row.theta_hex == theta
    assert row.n_inter_below == len(_below(sa, theta) & _below(sb, theta))
    assert row.n_union_below == len(_below(sa, theta) | _below(sb, theta))
    if theta is None:
        assert row.est_intersection == float(row.n_inter_below)
    else:
        prefix = int(theta[:15], 16)
        assert row.est_intersection == float(row.n_inter_below) * float(16**15) / float(prefix)


def test_state_reuse_is_deterministic(spark, sf_dir):
    from kiji_scoring_spark.queries import QUERIES

    fn = QUERIES["sketch_theta_set_ops"].fn
    first = [tuple(r) for r in fn(spark, sf_dir).collect()]
    second = [tuple(r) for r in fn(spark, sf_dir).collect()]
    assert first == second
