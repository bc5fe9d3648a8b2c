#!/usr/bin/env python
"""Assert the hot-bucket quarantine at MASS (round 10, per the r9 verdict).

tests/test_dedup_hotbucket.py proves bucket_pairs' block-decomposed path
equals the fast path on a synthetic 5000-identical-doc flood; this script
proves the same thing on a real scale tier: over the sf100 corpus
(~5 M docs where every document is a ~1000-way duplicate) it

  1. builds the band-0 LSH buckets the dedup family uses,
  2. asserts HOT buckets (> operators/dedup.MAX_BUCKET ids — the ones
     that take the quarantined block-decomposed path) exist at mass,
  3. counts bucket_pairs' emitted pair multiset and asserts it equals
     the combinatorial expectation sum k·(k−1)/2 EXACTLY — i.e. the
     quarantine decomposition neither drops nor duplicates a single
     pair at a scale where the fast path alone would be one
     unsplittable O(k²) task per clique.

The pair count is a COUNT aggregate — ~10⁹ pair structs are expanded
across tasks and reduced, never materialized to the driver.

    SPARK_GRAFT_DRIVER_MEM=24g python scripts/assert_hotbucket_mass.py /tmp/sf100

Prints one JSON line; exit 0 iff all assertions hold.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from pyspark.sql import functions as F  # noqa: E402

from kiji_scoring_spark.operators import dedup as dd  # noqa: E402
from kiji_scoring_spark.session import get_spark  # noqa: E402
from kiji_scoring_spark.sources import load_table  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf100"
    spark = get_spark(app_name="hotbucket-mass-assert")
    spark.sparkContext.setLogLevel("ERROR")
    t0 = time.perf_counter()

    d = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    sig = dd.minhash_signature_df(d, "doc_id", "text")
    bands = dd.minhash_band_keys(sig, "doc_id").filter(F.col("band_idx") == 0)
    buckets = (
        bands.groupBy("band_key")
        .agg(F.sort_array(F.collect_list("doc_id")).alias("ids"))
        .filter(F.size("ids") > 1)
    )
    # one signature pass, shared by the census and the pair count
    buckets = buckets.localCheckpoint(eager=True)

    census = buckets.agg(
        F.count(F.lit(1)).alias("n_buckets"),
        F.max(F.size("ids")).alias("max_bucket"),
        F.sum((F.size("ids") > dd.MAX_BUCKET).cast("long")).alias("n_hot"),
        F.sum(F.expr("size(ids) * (size(ids) - 1) DIV 2")).alias("expected_pairs"),
    ).collect()[0]

    emitted = dd.bucket_pairs(buckets).count()

    out = {
        "sf_dir": sf_dir,
        "n_buckets": census.n_buckets,
        "max_bucket": census.max_bucket,
        "n_hot_buckets": census.n_hot,
        "expected_pairs": census.expected_pairs,
        "emitted_pairs": emitted,
        "hot_path_triggered": bool(census.n_hot and census.n_hot > 0),
        "pair_multiset_exact": emitted == census.expected_pairs,
        "wall_sec": round(time.perf_counter() - t0, 1),
    }
    print(json.dumps(out), flush=True)
    spark.stop()
    return 0 if (out["hot_path_triggered"] and out["pair_multiset_exact"]) else 1


if __name__ == "__main__":
    sys.exit(main())
