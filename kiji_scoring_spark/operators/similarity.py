"""Similarity-search operators over embedding columns (SURVEY §2.G).

Three tiers, by corpus scale:

- **Brute-force cosine top-k** — exact; probes broadcast against one full
  scan. Right up to ~10⁷ corpus × small probe set (queries_pipeline.
  similarity_cosine_topk).
- **Sign-LSH buckets** — probes compare only within their hyperplane-sign
  bucket; equi-join scales out (similarity_bucketed_ann).
- **IVF (inverted file)** — this module: a KMeans coarse quantizer
  partitions the corpus into cells; probes search only the ``n_probe``
  nearest cells. The standard recipe behind FAISS-style ANN at billion
  scale. The centroid set is tiny by construction (k entries), so cell
  assignment compiles to a NARROW map over literal centroid arrays — no
  join, no shuffle; only the probe search shuffles, and only the probed
  cells. Training is iterative (MLlib KMeans), so IVF queries are
  rows-only in the oracle gate — recall against exact top-k is asserted
  in tests instead.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def unit_normalized(df: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    """(id, ne): L2-normalized double vectors. Norm is materialized as a
    column before the divide-lambda (HOF lambdas are interpreted, no CSE)."""
    norm = F.sqrt(
        F.aggregate(
            F.transform(vec_col, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda s, v: s + v,
        )
    )
    # Zero-norm guard: an all-zero vector would divide by 0.0 and propagate
    # NaN/Inf through every cosine it touches; map it to the zero vector
    # instead (cosine 0 against everything — never ranks into top-k).
    return df.withColumn("__norm__", norm).select(
        F.col(id_col),
        F.transform(
            vec_col,
            lambda x: F.when(
                F.col("__norm__") > 0, x.cast("double") / F.col("__norm__")
            ).otherwise(F.lit(0.0)),
        ).alias("ne"),
    )


def _lit_vec(vals: list[float]) -> Column:
    return F.array(*[F.lit(float(v)) for v in vals])


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda s, v: s + v
    )


def train_ivf_centroids(
    corpus: DataFrame, id_col: str, vec_col: str, k: int, seed: int = 42,
    max_iter: int = 10,
) -> list[list[float]]:
    """Fit the coarse quantizer: k L2-normalized centroids, returned as a
    plain Python list (k × dim floats — driver-sized by definition, like
    FAISS's quantizer). MLlib KMeans over unit vectors ≈ spherical
    k-means; the fit is the only iterative step and runs distributed."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    normed = unit_normalized(corpus, id_col, vec_col).select(
        array_to_vector("ne").alias("features")
    )
    model = KMeans(k=k, seed=seed, maxIter=max_iter).fit(normed)
    return [[float(x) for x in c] for c in model.clusterCenters()]


def _cell_sims(ne: Column, centers: list[list[float]]) -> Column:
    """Array of cosine(ne, centroid_i) — literal centroids, narrow eval."""
    return F.array(*[_dot(ne, _lit_vec(c)) for c in centers])


def with_cells(
    normed: DataFrame, centers: list[list[float]]
) -> DataFrame:
    """Attach each vector's nearest-centroid ``cell_id``: argmax over the
    literal centroid sims — a narrow map, zero shuffle, any corpus size.
    Ties break to the lowest centroid id (array_position finds first)."""
    sims = _cell_sims(F.col("ne"), centers)
    return normed.withColumn("__sims__", sims).withColumn(
        "cell_id",
        (F.array_position(F.col("__sims__"), F.array_max("__sims__")) - 1).cast("int"),
    ).drop("__sims__")


def probe_cell_fanout(
    probes_normed: DataFrame, centers: list[list[float]], n_probe: int
) -> DataFrame:
    """(probe_id, probe_ne, cell_id) — each probe fans out to its n_probe
    nearest cells. Ranking happens inside a sorted struct array (narrow);
    the output is n_probe rows per probe."""
    k = len(centers)
    ranked = F.sort_array(
        F.zip_with(
            _cell_sims(F.col("ne"), centers),
            F.sequence(F.lit(0), F.lit(k - 1)),
            lambda s, i: F.struct(s.alias("sim"), i.alias("cid")),
        ),
        asc=False,
    )
    return (
        probes_normed.select(
            F.col("ne").alias("probe_ne"),
            F.col(probes_normed.columns[0]).alias("probe_id"),
            F.explode(F.slice(ranked, 1, n_probe)).alias("rc"),
        )
        .select("probe_id", "probe_ne", F.col("rc.cid").alias("cell_id"))
    )


def ivf_topk(
    corpus_cells: DataFrame,
    probe_fanout: DataFrame,
    k: int,
) -> DataFrame:
    """Search the probed cells only: equi-join on cell_id, exact cosine
    within, top-k per probe.

    Scale: the corpus shuffles by cell_id once (or never, if the corpus
    is stored bucketed by cell — the intended layout for repeated query
    batches); per-probe top-k windows over the probed slice only."""
    corpus = corpus_cells.select(
        F.col(corpus_cells.columns[0]).alias("neighbor_id"),
        F.col("ne").alias("corpus_ne"),
        "cell_id",
    )
    w = Window.partitionBy("probe_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        probe_fanout.join(corpus, "cell_id")
        .filter(F.col("neighbor_id") != F.col("probe_id"))
        .withColumn("cos_sim", F.round(_dot(F.col("probe_ne"), F.col("corpus_ne")), 9))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("probe_id", "neighbor_id", "cos_sim", "rn")
    )
