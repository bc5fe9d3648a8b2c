"""Hot-bucket quarantine for in-bucket pair generation (round-5).

The one 100-TB scale risk flagged in round 4: boilerplate-heavy corpora
produce LSH/prefix buckets with thousands of near-identical docs, and the
fast path's single-row k(k-1)/2 expansion becomes one unsplittable
quadratic task. Buckets over MAX_BUCKET now take a block-decomposed,
shuffled path with per-task work bounded by CHUNK². These tests pin
(a) bit-identical pair sets between the two paths, and (b) that a
5k-identical-doc corpus — every doc in the same bucket of every band —
completes and yields exactly C(5000, 2) candidate pairs.
"""

import random

from pyspark.sql import functions as F

# the registry must load before any queries_* module is imported directly
# (queries_train pulls helpers from queries_pipeline mid-registration)
from kiji_scoring_spark import queries as _registry  # noqa: F401
from kiji_scoring_spark.operators import dedup as dd


def _pairs(df):
    return sorted((r["doc_a"], r["doc_b"]) for r in df.collect())


def test_bucket_pairs_capped_equals_uncapped(spark):
    rng = random.Random(42)
    rows = []
    for b in range(30):
        k = rng.randint(2, 40)
        rows.append((b, sorted(rng.sample(range(100_000), k))))
    # sizes straddling the cap exactly: max_bucket, max_bucket+1, one block
    rows.append((90, list(range(6))))
    rows.append((91, list(range(7))))
    rows.append((92, list(range(200, 205))))
    df = spark.createDataFrame(rows, "bucket int, ids array<bigint>")
    uncapped = _pairs(dd.bucket_pairs(df, max_bucket=10_000))
    capped = _pairs(dd.bucket_pairs(df, max_bucket=6, chunk=4))
    assert capped == uncapped  # multiset equality: same pairs, same counts
    # sanity: the diagonal-block a<b invariant holds
    assert all(a < b for a, b in capped)


def test_cross_bucket_pairs_capped_equals_uncapped(spark):
    rng = random.Random(7)
    rows = []
    for b in range(25):
        ka, kb = rng.randint(1, 30), rng.randint(1, 30)
        olds = sorted(rng.sample(range(0, 50_000), ka))
        news = sorted(rng.sample(range(50_000, 100_000), kb))
        rows.append((b, olds, news))
    df = spark.createDataFrame(
        rows, "bucket int, olds array<bigint>, news array<bigint>"
    )
    uncapped = _pairs(dd.cross_bucket_pairs(df, "olds", "news", max_bucket=10_000))
    capped = _pairs(dd.cross_bucket_pairs(df, "olds", "news", max_bucket=5, chunk=3))
    assert capped == uncapped
    n_expected = sum(len(r[1]) * len(r[2]) for r in rows)
    assert len(capped) == n_expected


def test_hot_bucket_path_is_shuffled(spark):
    """The quarantine's whole point is the SHUFFLE that spreads a hot
    bucket's block rows across tasks — pin it in the executed plan so a
    refactor can't quietly turn the block path back into a single-task
    expansion."""
    big = spark.createDataFrame(
        [(0, list(range(1000)))], "bucket int, ids array<bigint>"
    )
    df = dd.bucket_pairs(big, max_bucket=256, chunk=128)
    df.count()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" in plan or "ShuffleExchange" in plan


def test_ppjoin_length_filter_prunes_candidates(spark, sf_dir):
    """PPJoin's length filter (5·|shorter| >= 3·|longer|) must strictly
    shrink the candidate set on real data while the final verified result
    is unchanged (it is a J >= 0.6 necessity — parity with the brute-force
    oracle pins losslessness separately). The counts come from the
    Observation riding each plan, not a second scan."""
    from kiji_scoring_spark.queries_pipeline import _setsim_candidates

    with_filter, obs_on = _setsim_candidates(spark, sf_dir, length_filter=True)
    without, obs_off = _setsim_candidates(spark, sf_dir, length_filter=False)
    n_on, n_off = with_filter.count(), without.count()
    assert n_on < n_off
    assert obs_on.get["n_rows"] == n_on
    assert obs_off.get["n_rows"] == n_off


def test_five_thousand_identical_docs_complete(spark):
    """The adversarial corpus: 5000 byte-identical docs — every doc lands
    in the SAME bucket of every band. Pre-quarantine this was one task
    materializing a 12.5M-struct array per band; now it's ~1600 bounded
    block rows spread across the cluster. Expect exactly C(5000,2)
    distinct candidate pairs."""
    docs = spark.range(5000).select(
        F.col("id").alias("doc_id"),
        F.lit("the same boilerplate footer text appears on every page").alias(
            "text"
        ),
    )
    sig = dd.minhash_signature_df(docs, "doc_id", "text")
    bands = dd.minhash_band_keys(sig, "doc_id")
    n = dd.band_pairs(bands, "doc_id").count()
    assert n == 5000 * 4999 // 2
