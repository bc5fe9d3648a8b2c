#!/usr/bin/env python
"""Assert IVF ANN recall at MASS (round 11, r10 verdict stretch item).

tests/test_similarity_ivf.py pins the recall contract (>= 0.6 at
n_probe 6 of 16 cells against exact brute-force top-5) at the pytest
scale factor; this script runs the SAME contract on a real scale tier —
2 M vectors at /tmp/sf100 — so the IVF family's quality claim is
measured at mass, not argued. Mechanics mirror the test exactly:
seed-42 KMeans quantizer, 10 probe vectors, exact reference = broadcast
probes x full corpus cosine (codegen zip_with dot products, a top-k
window — never an all-pairs materialization).

    SPARK_GRAFT_DRIVER_MEM=24g python scripts/assert_ivf_recall.py /tmp/sf100

Prints one JSON line; exit 0 iff recall >= 0.6.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from kiji_scoring_spark.operators import similarity as sim  # noqa: E402
from kiji_scoring_spark.session import get_spark  # noqa: E402
from kiji_scoring_spark.sources import load_table  # noqa: E402

K = 5
N_PROBE = 6
N_CELLS = 16
RECALL_FLOOR = 0.6


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf100"
    spark = get_spark(app_name="ivf-recall-mass-assert")
    spark.sparkContext.setLogLevel("ERROR")
    t0 = time.perf_counter()

    e = load_table(spark, sf_dir, "embeddings")
    n_vectors = e.count()
    centers = sim.train_ivf_centroids(e, "vec_id", "embedding", k=N_CELLS)
    normed = sim.unit_normalized(e, "vec_id", "embedding")
    probe_ids = [r.vec_id for r in e.select("vec_id").orderBy("vec_id").limit(10).collect()]

    corpus_cells = sim.with_cells(normed, centers)
    fanout = sim.probe_cell_fanout(
        normed.filter(F.col("vec_id").isin(probe_ids)), centers, N_PROBE
    )
    got = sim.ivf_topk(corpus_cells, fanout, K).collect()

    a = normed.filter(F.col("vec_id").isin(probe_ids)).select(
        F.col("vec_id").alias("probe_id"), F.col("ne").alias("probe_ne")
    )
    b = normed.select(
        F.col("vec_id").alias("neighbor_id"), F.col("ne").alias("corpus_ne")
    )
    w = Window.partitionBy("probe_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    dot = F.aggregate(
        F.zip_with("probe_ne", "corpus_ne", lambda x, y: x * y),
        F.lit(0.0),
        lambda s, v: s + v,
    )
    exact = (
        F.broadcast(a)
        .join(b, F.col("neighbor_id") != F.col("probe_id"))
        .withColumn("cos", F.round(dot, 9))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= K)
        .collect()
    )

    by_got: dict = {}
    for r in got:
        by_got.setdefault(r.probe_id, set()).add(r.neighbor_id)
    by_exact: dict = {}
    for r in exact:
        by_exact.setdefault(r.probe_id, set()).add(r.neighbor_id)

    assert set(by_got) == set(by_exact) == set(probe_ids), "probe coverage"
    hits = sum(len(by_got[p] & by_exact[p]) for p in probe_ids)
    recall = hits / (K * len(probe_ids))

    out = {
        "sf_dir": sf_dir,
        "n_vectors": n_vectors,
        "n_probes": len(probe_ids),
        "k": K,
        "n_probe_cells": f"{N_PROBE}/{N_CELLS}",
        "recall": round(recall, 4),
        "floor": RECALL_FLOOR,
        "ok": recall >= RECALL_FLOOR,
        "elapsed_sec": round(time.perf_counter() - t0, 1),
    }
    print(json.dumps(out))
    return 0 if out["ok"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
