"""Model-based randomized gate for the snapshot table format: a seeded
random interleaving of commit/append/compact/vacuum ops runs against a
trivial in-memory reference model (a dict version -> expected row
multiset), and after every op EVERY retained version must read back
exactly its modeled contents. This catches cross-op invariant breaks —
e.g. compaction corrupting time travel, vacuum deleting a dir an
append-composed version still references — that the per-op unit tests
in test_snapshots.py can't see."""

import os
import random
import shutil
import tempfile

import pytest

from kiji_scoring_spark.operators import snapshots as sn


def _rows(df):
    return sorted((r.k, r.v) for r in df.collect())


@pytest.mark.parametrize("seed", [7, 21, 1999])
def test_random_op_sequences_match_model(spark, seed):
    rng = random.Random(seed)
    root = tempfile.mkdtemp(prefix="kss_snapmodel_")
    path = os.path.join(root, "t")
    try:
        model: dict[int, list] = {}  # version -> expected sorted rows
        retained_from = 1
        next_k = 0

        def fresh_batch(n):
            nonlocal next_k
            batch = [(next_k + i, f"s{seed}r{next_k + i}") for i in range(n)]
            next_k += n
            return batch

        # first op must be a commit
        batch = fresh_batch(rng.randrange(1, 4))
        v = sn.commit_snapshot(
            spark.createDataFrame(batch, ["k", "v"]), path, mode="overwrite"
        )
        model[v] = sorted(batch)

        for _ in range(7):
            op = rng.choice(["append", "overwrite", "append", "compact", "vacuum"])
            latest = max(model)
            if op in ("append", "overwrite"):
                batch = fresh_batch(rng.randrange(0, 4))  # 0 = empty commit
                v = sn.commit_snapshot(
                    spark.createDataFrame(batch, "k long, v string"),
                    path,
                    mode=op,
                )
                prev = model[latest] if op == "append" else []
                model[v] = sorted(prev + batch)
            elif op == "compact":
                v = sn.compact_snapshot(spark, path, target_files=1)
                model[v] = model[latest]
            else:  # vacuum up to a random retained horizon
                keep = rng.choice(
                    [x for x in sorted(model) if x >= retained_from]
                )
                sn.vacuum_snapshots(path, keep_from=keep)
                for old in [x for x in model if x < keep]:
                    del model[old]
                retained_from = keep

            # EVERY retained version reads back exactly its modeled rows
            for ver, expected in model.items():
                assert _rows(sn.read_snapshot(spark, path, ver)) == expected, (
                    f"seed={seed}: version {ver} diverged from model"
                )
            assert sn.latest_version(path) == max(model)
    finally:
        shutil.rmtree(root, ignore_errors=True)
