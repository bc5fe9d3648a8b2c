"""Deduplication operators for training-data pipelines (SURVEY §2.G).

All hashing is engine-portable (md5-derived 32-bit integers) so results
are deterministic and oracle-checkable — no reliance on engine-internal
hash functions.

Scale design:

- Exact dedup = groupBy(content key) keeping min(id): one shuffle on the
  content hash; at 100 TB group by ``md5(text)`` (fixed width) rather than
  the raw text to keep shuffle rows narrow.
- MinHash: shingle → hash → per-doc signature (one explode + one groupBy),
  band keys → candidate pairs via equi-join on band key. Never an O(n²)
  cross product; the band join's fan-out is controlled by band size, and
  AQE skew-join splits hot buckets.
- SimHash: token hash → 32 weighted bit sums per doc (single aggregation),
  pairs via banded prefix join (here: exact 16-bit prefix buckets) +
  hamming filter.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

MERSENNE = 2_147_483_647  # 2^31 - 1

#: fixed affine minhash parameters (a, b) — shared with the SQL oracle
MINHASH_PARAMS: list[tuple[int, int]] = [
    (1, 7), (2, 13), (3, 31), (5, 61), (7, 127), (11, 251), (13, 509), (17, 1021),
]


def hash32(col: Column) -> Column:
    """Portable 32-bit string hash: first 8 hex digits of md5."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("bigint")


def word_shingles(text: Column, n: int = 3) -> Column:
    """n-word shingles of a whitespace-tokenized text column.

    PERF: callers on a hot path should materialize the word array as its
    own projected column and call ``_shingles_of_words`` on the column
    reference — higher-order lambdas are interpreted (no codegen / common
    subexpression elimination), so a ``split()`` expression referenced
    inside the lambda re-tokenizes the text per element (~7× slower
    measured at sf0.1). ``slice`` beats k × ``element_at`` for the same
    reason. Docs with fewer than n words yield an empty array.
    """
    w = F.split(text, " ")
    return _shingles_of_words(w, n)


def _shingles_of_words(w: Column, n: int) -> Column:
    # explicit empty for short docs: sequence(1, 0) would DESCEND ([1, 0])
    idx = F.when(
        F.size(w) >= n, F.sequence(F.lit(1), F.size(w) - (n - 1))
    ).otherwise(F.array().cast("array<int>"))
    return F.transform(idx, lambda i: F.concat_ws(" ", F.slice(w, i, n)))


def minhash_signature_df(docs: DataFrame, id_col: str, text_col: str, n: int = 3) -> DataFrame:
    """Per-doc minhash signature columns m0..m7, computed ENTIRELY
    map-side: shingle array → hash array → array_min over each affine
    transform. Zero shuffle — the signature fuses with the scan, which is
    the whole game at 100 TB (the alternative, explode + groupBy(doc),
    shuffles one row per shingle: ~150× the document count; measured
    equal-or-faster warm and 3× faster cold at sf0.1). Each stage is its
    own projection so the interpreted HOF lambdas (no CSE) never
    recompute upstream arrays per element. Bounded by one doc's shingle
    array per row — fine for any document that fits in a row."""
    w = docs.select(id_col, F.split(F.col(text_col), " ").alias("__w__"))
    sh = w.select(id_col, _shingles_of_words(F.col("__w__"), n).alias("__sh__"))
    hashes = sh.select(
        id_col,
        F.transform(
            "__sh__", lambda s: F.conv(F.substring(F.md5(s), 1, 8), 16, 10).cast("bigint")
        ).alias("__h__"),
    )
    mins = [
        F.array_min(
            F.transform("__h__", lambda h: (F.lit(a) * h + F.lit(b)) % MERSENNE)
        ).alias(f"m{j}")
        for j, (a, b) in enumerate(MINHASH_PARAMS)
    ]
    return hashes.select(id_col, *mins)


def minhash_band_keys(sig: DataFrame, id_col: str, rows_per_band: int = 4) -> DataFrame:
    """Banded signature → (id, band_idx, band_key) rows."""
    n_bands = len(MINHASH_PARAMS) // rows_per_band
    bands = []
    for b in range(n_bands):
        cols = [F.col(f"m{b * rows_per_band + r}") for r in range(rows_per_band)]
        bands.append(
            F.struct(F.lit(b).alias("band_idx"), F.md5(F.concat_ws(",", *cols)).alias("band_key"))
        )
    return sig.select(id_col, F.explode(F.array(*bands)).alias("bk")).select(
        id_col, F.col("bk.band_idx").alias("band_idx"), F.col("bk.band_key").alias("band_key")
    )


def band_pairs(bands: DataFrame, id_col: str) -> DataFrame:
    """Candidate pairs from band keys WITHOUT a self-join: group each
    (band_idx, band_key) bucket, then explode in-bucket pairs.

    A self-join of the derived band table re-executes the whole
    shingle→hash→groupBy pipeline for both sides (Catalyst does not reuse
    the exchange across join sides here); this formulation computes the
    signature once and needs a single shuffle. Bucket pair fan-out is
    O(bucket²) in either formulation — LSH band width keeps buckets small,
    and pathological all-identical corpora are quadratic in ANY candidate
    generator. Output columns: doc_a < doc_b, distinct across bands.
    """
    buckets = (
        bands.groupBy("band_idx", "band_key")
        .agg(F.sort_array(F.collect_list(id_col)).alias("ids"))
        .filter(F.size("ids") > 1)
    )
    pairs = F.flatten(
        F.transform(
            "ids",
            lambda x, i: F.transform(
                F.slice(F.col("ids"), i + 2, F.size("ids")),
                lambda y: F.struct(x.alias("doc_a"), y.alias("doc_b")),
            ),
        )
    )
    return (
        buckets.select(F.explode(pairs).alias("p"))
        .select("p.doc_a", "p.doc_b")
        .distinct()
    )


def connected_components(
    pairs: DataFrame, a_col: str, b_col: str, max_iters: int = 50
) -> DataFrame:
    """Min-label connected components over an undirected pair list:
    (node, component) where component = smallest node id reachable.

    The dedup end-game (candidate pairs → duplicate clusters → keep one
    canonical doc per cluster). Iterative label propagation: each round,
    every node takes the min of its own label and its neighbors'; stops
    at fixpoint. Near-dup graphs converge in a few rounds (components are
    small and star-shaped); the driver loop only checks a changed-count
    per round — no data is collected. At extreme component diameters use
    the large-star/small-star variant with checkpointing; the loop shape
    is identical.
    """
    edges = (
        pairs.select(F.col(a_col).alias("u"), F.col(b_col).alias("v"))
        .union(pairs.select(F.col(b_col).alias("u"), F.col(a_col).alias("v")))
        .distinct()
    )
    labels = edges.select(F.col("u").alias("node")).distinct().withColumn(
        "label", F.col("node")
    )
    for _ in range(max_iters):
        neighbor_min = (
            edges.join(labels, edges["v"] == labels["node"])
            .groupBy("u")
            .agg(F.min("label").alias("nmin"))
        )
        updated = (
            labels.join(neighbor_min, labels["node"] == neighbor_min["u"], "left")
            .select(
                "node",
                F.least(F.col("label"), F.coalesce("nmin", F.col("label"))).alias("label"),
                (F.col("nmin") < F.col("label")).alias("__chg__"),
            )
        )
        updated = updated.localCheckpoint(eager=True)  # cut the iterative lineage
        changed = updated.filter(F.col("__chg__")).count()
        labels = updated.drop("__chg__")
        if changed == 0:
            break
    return labels.select("node", F.col("label").alias("component"))


def simhash32(tokens_hashed: Column) -> Column:
    """32-bit simhash from an array of 32-bit token hashes: bit i is set if
    the +1/-1 vote over that bit across tokens is positive."""
    def vote_fn(i: int):
        # two-arg lambda required by F.aggregate; bind i via factory
        return lambda acc, h: acc + F.when(
            F.shiftright(h, i).bitwiseAND(F.lit(1)) == 1, 1
        ).otherwise(-1)

    bits = []
    for i in range(32):
        vote = F.aggregate(tokens_hashed, F.lit(0).cast("long"), vote_fn(i))
        bits.append(F.when(vote > 0, F.lit(2 ** i).cast("long")).otherwise(F.lit(0).cast("long")))
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out
