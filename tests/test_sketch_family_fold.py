"""Streaming maintenance of the HLL / DDSketch / Misra-Gries family
(streaming_sketch_family_fold): the fold laws behind the registry query,
pinned on splits the one registry dataset doesn't produce.

- HLL: fold(fold(s,b1),b2) == sketch(b1∪b2) EXACTLY — the union is a
  register-wise max, so the folded sketch's estimate must equal the
  one-shot estimate bit-for-bit, for any split and any fold order.
- DDSketch: bucket counts fold by integer SUM — the folded histogram is
  row-identical to the one-shot histogram, for any split.
- Misra-Gries: the fold is NOT one-shot-equal (the decrement depends on
  batching), but the PODS-2012 merge guarantee must hold at every
  split: weights never overestimate, every heavy item (cnt > 2n/(K+1))
  survives with weight within 2n/(K+1), and the summary stays <= K rows.
"""

import math
import random
from collections import Counter

from pyspark.sql import functions as F

from kiji_scoring_spark.queries_graph import (
    _DDSKETCH_GAMMA,
    _MG_K,
    _grouped_top_k,
)

K = _MG_K
LN_G = math.log(_DDSKETCH_GAMMA)


def _hll_sketch(spark, keys):
    df = spark.createDataFrame([(int(x),) for x in keys] or [(None,)], "key long")
    return df.agg(F.hll_sketch_agg("key").alias("sk"))


def _hll_fold(spark, batches):
    state = None
    for keys in batches:
        bs = _hll_sketch(spark, keys)
        state = bs if state is None else (
            state.unionByName(bs).agg(F.hll_union_agg("sk").alias("sk"))
        )
    return state.select(F.hll_sketch_estimate("sk").alias("est")).collect()[0].est


def test_hll_fold_equals_one_shot(spark):
    rng = random.Random(7)
    keys = [rng.randrange(0, 3000) for _ in range(9000)]
    want = _hll_fold(spark, [keys])  # one-shot
    for splits in ([3000, 6000], [5, 8000], [1, 2, 3]):
        cuts = [0] + sorted(splits) + [len(keys)]
        batches = [keys[c:d] for c, d in zip(cuts, cuts[1:])]
        assert _hll_fold(spark, batches) == want, f"splits {splits}"
    # fold order cannot matter either (register max is commutative)
    b = [keys[:100], keys[100:5000], keys[5000:]]
    assert _hll_fold(spark, list(reversed(b))) == want


def _dd_hist(spark, vals):
    df = spark.createDataFrame([(float(v),) for v in vals] or [(None,)], "v double")
    return (
        df.filter(F.col("v").isNotNull() & (F.col("v") > 0))
        .select(F.ceil(F.log("v") / F.lit(LN_G)).alias("bkt"))
        .groupBy("bkt")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def _dd_fold(spark, batches):
    state = None
    for vals in batches:
        bh = _dd_hist(spark, vals)
        state = bh if state is None else (
            state.unionByName(bh).groupBy("bkt").agg(F.sum("cnt").alias("cnt"))
        )
    return sorted((r.bkt, r.cnt) for r in state.collect())


def test_ddsketch_fold_equals_one_shot(spark):
    rng = random.Random(11)
    vals = [rng.uniform(0.01, 5000.0) for _ in range(6000)]
    want = _dd_fold(spark, [vals])
    for splits in ([2000, 4000], [3, 5999]):
        cuts = [0] + sorted(splits) + [len(vals)]
        batches = [vals[c:d] for c, d in zip(cuts, cuts[1:])]
        assert _dd_fold(spark, batches) == want, f"splits {splits}"


def _mg_prune(weights):
    ranked = _grouped_top_k(
        weights, [], [F.col("w").desc(), F.col("item").asc()], K + 1, "rn"
    )
    wk1 = ranked.agg(
        F.coalesce(F.max(F.when(F.col("rn") == K + 1, F.col("w"))), F.lit(0)).alias(
            "wk1"
        )
    )
    return (
        ranked.filter(F.col("rn") <= K)
        .crossJoin(F.broadcast(wk1))
        .select("item", (F.col("w") - F.col("wk1")).alias("weight"))
        .filter(F.col("weight") > 0)
    )


def _mg_batch(spark, items):
    df = spark.createDataFrame([(int(i),) for i in items] or [(None,)], "item long")
    return _mg_prune(
        df.filter(F.col("item").isNotNull())
        .groupBy("item")
        .agg(F.count(F.lit(1)).alias("w"))
    )


def _mg_fold(spark, batches):
    state = None
    for items in batches:
        bs = _mg_batch(spark, items)
        state = bs if state is None else _mg_prune(
            state.select("item", F.col("weight").alias("w"))
            .unionByName(bs.select("item", F.col("weight").alias("w")))
            .groupBy("item")
            .agg(F.sum("w").alias("w"))
        )
    return {r.item: r.weight for r in state.collect()}


def _zipfish_items(rng, n):
    # 7-item heavy head over ~60% of draws, 2000-item tail for the rest
    return [
        rng.randrange(0, 7) if rng.random() < 0.6 else 100 + rng.randrange(0, 2000)
        for _ in range(n)
    ]


def test_mg_fold_guarantee_holds_at_every_split(spark):
    rng = random.Random(13)
    items = _zipfish_items(rng, 8000)
    exact = Counter(items)
    n = len(items)
    band = 2.0 * n / (K + 1)
    heavy = {i for i, c in exact.items() if c > band}
    assert heavy, "test corpus must contain heavy items"
    for splits in ([4000], [100, 5000], [1, 2, 7999]):
        cuts = [0] + sorted(splits) + [n]
        folded = _mg_fold(spark, [items[c:d] for c, d in zip(cuts, cuts[1:])])
        assert len(folded) <= K, f"splits {splits}: summary exceeded K"
        assert all(w <= exact[i] for i, w in folded.items()), (
            f"splits {splits}: a weight overestimates"
        )
        missing = heavy - set(folded)
        assert not missing, f"splits {splits}: heavy items lost {missing}"
        assert all(exact[i] - folded[i] <= band for i in heavy), (
            f"splits {splits}: a heavy weight fell outside 2n/(K+1)"
        )


def test_mg_single_batch_fold_is_exact_mg(spark):
    # one batch == the static Misra-Gries summary: weights are the exact
    # counts minus the (K+1)-th count, like the batch shard build
    items = [i % 5 for i in range(1000)]  # 5 distinct < K: no decrement
    folded = _mg_fold(spark, [items])
    assert folded == {i: Counter(items)[i] for i in range(5)}
