"""LLM-training-data pipeline queries (SURVEY §2.G-2.H): dedup, similarity
search, text analysis, multimodal plumbing — each oracle-checked where SQL
can express it (portable md5-derived hashing keeps both engines identical).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .operators import audit
from .operators import dedup as dd
from .operators import multimodal as mm
from .queries import query
from .sources import load_table

# ---------------------------------------------------------------------------
# Deduplication
# ---------------------------------------------------------------------------

@query(
    "dedup_exact_documents",
    """
    SELECT md5(text) AS content_key, min(doc_id) AS canonical_doc_id,
           COUNT(*) AS n_copies
    FROM documents GROUP BY md5(text) ORDER BY canonical_doc_id
    """,
    "dedup", "pipeline",
)
def dedup_exact_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup with deterministic canonical representative (min id).
    Scale: group by the fixed-width md5, not the raw text — narrow shuffle
    rows at 100 TB."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.groupBy(F.md5("text").alias("content_key"))
        .agg(F.min("doc_id").alias("canonical_doc_id"), F.count(F.lit(1)).alias("n_copies"))
        .orderBy("canonical_doc_id")
    )


def _minhash_bands_cte() -> str:
    """The shared WITH-prefix deriving the (doc_id, band_idx, band_key)
    relation — byte-identical to what the candidate-pair oracle always
    used, factored so the census oracle composes the same derivation."""
    mins = ",\n        ".join(
        f"min(({a}*h + {b}) % {dd.MERSENNE}) AS m{j}"
        for j, (a, b) in enumerate(dd.MINHASH_PARAMS)
    )
    b0 = "||','||".join(f"m{r}" for r in range(4))
    b1 = "||','||".join(f"m{r}" for r in range(4, 8))
    return f"""
    WITH words AS (
      SELECT doc_id, string_split(text, ' ') AS w FROM documents
      WHERE text IS NOT NULL
    ), shingles AS (
      SELECT doc_id,
        unnest(list_transform(generate_series(1, len(w)-2),
                              i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS sh
      FROM words
    ), hashes AS (
      SELECT doc_id, ('0x' || substr(md5(sh), 1, 8))::BIGINT AS h FROM shingles
    ), sigs AS (
      SELECT doc_id, {mins}
      FROM hashes GROUP BY doc_id
    ), bands AS (
      SELECT doc_id, 0 AS band_idx, md5({b0}) AS band_key FROM sigs
      UNION ALL
      SELECT doc_id, 1 AS band_idx, md5({b1}) AS band_key FROM sigs
    )"""


def _minhash_oracle_sql() -> str:
    return f"""{_minhash_bands_cte()}
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM bands a JOIN bands b
      ON a.band_key = b.band_key AND a.band_idx = b.band_idx AND a.doc_id < b.doc_id
    ORDER BY doc_a, doc_b
    """


@query("dedup_minhash_candidate_pairs", _minhash_oracle_sql(), "dedup", "pipeline", "lsh")
def dedup_minhash_candidate_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-dup candidates: 3-word shingles → 8 portable
    minhashes → 2 bands of 4 → in-bucket pairs. One explode, one groupBy,
    one bucket-group — the signature pipeline runs exactly once (a band
    self-join would execute it twice; see operators/dedup.band_pairs).
    Null-body docs are dropped first (the hygiene contract both engines
    state: a shingle pipeline over NULL text is undefined)."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    sig = dd.minhash_signature_df(d, "doc_id", "text")
    bands = dd.minhash_band_keys(sig, "doc_id")
    return dd.band_pairs(bands, "doc_id").orderBy("doc_a", "doc_b")


@query(
    "dedup_minhash_bucket_census",
    f"""{_minhash_bands_cte()}
    , buckets AS (
      SELECT band_idx, band_key, COUNT(*) AS k
      FROM bands GROUP BY band_idx, band_key
    )
    SELECT band_idx,
      COUNT(*) AS n_buckets,
      CAST(SUM(k) AS BIGINT) AS n_collided_docs,
      CAST(MAX(k) AS BIGINT) AS max_bucket,
      CAST(SUM(CASE WHEN k > {dd.MAX_BUCKET} THEN 1 ELSE 0 END) AS BIGINT)
        AS n_hot_buckets,
      CAST(SUM(k * (k - 1) // 2) AS BIGINT) AS candidate_pairs
    FROM buckets WHERE k >= 2
    GROUP BY band_idx ORDER BY band_idx
    """,
    "dedup", "pipeline", "lsh", "stats",
)
def dedup_minhash_bucket_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH bucket census — the MASS-TIER face of the minhash family
    (round 10): per band, how many collision buckets exist, how many
    documents they hold, the largest bucket, how many buckets are HOT
    (past operators/dedup.MAX_BUCKET, i.e. would take the quarantined
    block-decomposed pair path), and the total candidate-pair count
    computed COMBINATORIALLY (sum k·(k−1)/2, exact integers — never by
    materializing pairs).

    Why this query exists: the pair-materializing queries above are the
    CORRECTNESS exhibit, but on a worst-case corpus (every document
    duplicated ~1000×, which is exactly what the replicated sf100 tier
    is) the candidate-pair SET is ~10⁹ rows — unmaterializable by ANY
    engine, which is an output-size property, not a plan defect. The
    audit a 100 TB dedup pass actually runs first is THIS census: linear
    in the corpus, one extra groupBy over the band keys, and it reports
    the skew profile (n_hot_buckets) that decides quarantine pressure.
    At the sf100 tier its green row is the in-gate proof that hot
    buckets exist at mass and are counted exactly; the quarantine path's
    pair-level equivalence at that scale is asserted by
    scripts/assert_hotbucket_mass.py (unit-scale equivalence:
    tests/test_dedup_hotbucket.py)."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    sig = dd.minhash_signature_df(d, "doc_id", "text")
    bands = dd.minhash_band_keys(sig, "doc_id")
    k = (
        bands.groupBy("band_idx", "band_key")
        .agg(F.count(F.lit(1)).alias("k"))
        .filter(F.col("k") >= 2)
    )
    return (
        k.groupBy("band_idx")
        .agg(
            F.count(F.lit(1)).alias("n_buckets"),
            F.sum("k").alias("n_collided_docs"),
            F.max("k").alias("max_bucket"),
            F.sum((F.col("k") > dd.MAX_BUCKET).cast("long")).alias("n_hot_buckets"),
            F.sum(F.expr("k * (k - 1) DIV 2")).alias("candidate_pairs"),
        )
        .orderBy("band_idx")
    )


def _minhash_components_oracle() -> str:
    return f"""
    WITH RECURSIVE base AS ({_minhash_oracle_sql().replace("ORDER BY doc_a, doc_b", "")}
    ), edges AS (
      SELECT doc_a AS u, doc_b AS v FROM base
      UNION ALL
      SELECT doc_b, doc_a FROM base
    ), cc(node, label) AS (
      SELECT u, u FROM (SELECT DISTINCT u FROM edges)
      UNION
      SELECT e.v, cc.label FROM cc JOIN edges e ON e.u = cc.node
    )
    SELECT node AS doc_id, min(label) AS canonical_doc_id
    FROM cc GROUP BY node ORDER BY doc_id
    """


@query(
    "dedup_minhash_components",
    _minhash_components_oracle(),
    "dedup", "pipeline", "lsh",
)
def dedup_minhash_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dedup end-game (§2.G): MinHash candidate pairs → connected
    components → canonical representative (min doc_id) per duplicate
    cluster. Spark side is iterative min-label propagation with
    per-round localCheckpoint (operators/dedup.connected_components);
    the oracle re-derives components with a recursive CTE — an iterative
    distributed algorithm still hash-checked against an independent
    engine."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    sig = dd.minhash_signature_df(d, "doc_id", "text")
    bands = dd.minhash_band_keys(sig, "doc_id")
    pairs = dd.band_pairs(bands, "doc_id")
    return (
        dd.connected_components(pairs, "doc_a", "doc_b")
        .select(F.col("node").alias("doc_id"), F.col("component").alias("canonical_doc_id"))
        .orderBy("doc_id")
    )


def _simhash_oracle_sql() -> str:
    bit_terms = []
    for i in range(32):
        bit_terms.append(
            f"CASE WHEN sum(CASE WHEN (h >> {i}) & 1 = 1 THEN 1 ELSE -1 END) > 0 "
            f"THEN {2 ** i}::BIGINT ELSE 0::BIGINT END"
        )
    bits_sum = " + ".join(bit_terms)
    return f"""
    WITH toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
      WHERE text IS NOT NULL
    ), hashes AS (
      SELECT doc_id, ('0x' || substr(md5(tok), 1, 8))::BIGINT AS h FROM toks
    )
    SELECT doc_id, {bits_sum} AS simhash
    FROM hashes GROUP BY doc_id ORDER BY doc_id
    """


@query("dedup_simhash_signatures", _simhash_oracle_sql(), "dedup", "pipeline")
def dedup_simhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """32-bit SimHash per document (portable token hashing). Near-dup pairs
    = signatures within small hamming distance; the signature computation
    is the oracle-checked part, pair search is a bit_count(xor) filter."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    toks = d.select(
        "doc_id", F.transform(F.split("text", " "), dd.hash32).alias("th")
    )
    return toks.select("doc_id", dd.simhash32(F.col("th")).alias("simhash")).orderBy("doc_id")


@query(
    "dedup_ngram_jaccard_pairs",
    """
    WITH words AS (
      SELECT doc_id, string_split(text, ' ') AS w FROM documents
      WHERE text IS NOT NULL
    ), shingles AS (
      SELECT doc_id,
        list_distinct(list_transform(generate_series(1, len(w)-2),
                      i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS sh
      FROM words
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
      CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
        / NULLIF(len(list_distinct(a.sh || b.sh)), 0) AS jaccard
    FROM shingles a JOIN shingles b ON a.doc_id < b.doc_id AND a.doc_id < 20
    WHERE len(list_intersect(a.sh, b.sh)) * 10
          >= len(list_distinct(a.sh || b.sh))
      AND len(list_distinct(a.sh || b.sh)) > 0
    ORDER BY doc_a, doc_b
    """,
    "dedup", "pipeline",
)
def dedup_ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """n-gram Jaccard near-dup scoring: pairs with jaccard >= 0.1 among
    probe docs (doc_id < 20) vs all. The threshold comparison is done in
    exact integer arithmetic (inter*10 >= union) so the filter can't
    disagree between engines on float rounding.

    Pairs where BOTH shingle sets are empty (docs under 3 words — empty
    and whitespace-only docs exist in any real corpus) are EXCLUDED:
    Jaccard is undefined on no evidence, and under ANSI the bare 0/0
    killed the job before round 6's text-shape regime pinned the rule
    (union > 0 filter + NULLIF on both engines)."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    # words materialized before the shingle lambda (dedup.word_shingles PERF note)
    sh = d.select("doc_id", F.split("text", " ").alias("w")).select(
        "doc_id", F.array_distinct(dd._shingles_of_words(F.col("w"), 3)).alias("sh")
    )
    a = sh.alias("a").filter(F.col("doc_id") < 20)
    b = sh.alias("b")
    inter = F.size(F.array_intersect(F.col("a.sh"), F.col("b.sh")))
    union = F.size(F.array_distinct(F.concat(F.col("a.sh"), F.col("b.sh"))))
    return (
        a.join(b, F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            (inter.cast("double") / F.nullif(union, F.lit(0))).alias("jaccard"),
            inter.alias("__i__"),
            union.alias("__u__"),
        )
        .filter((F.col("__i__") * 10 >= F.col("__u__")) & (F.col("__u__") > 0))
        .drop("__i__", "__u__")
        .orderBy("doc_a", "doc_b")
    )


# ---------------------------------------------------------------------------
# Similarity search over embeddings
# ---------------------------------------------------------------------------

_COS_SQL = """
    list_reduce(list_transform(a.embedding, (x,i) -> CAST(x AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)), (p,q) -> p+q)
    / (sqrt(list_reduce(list_transform(a.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (p,q) -> p+q))
       * sqrt(list_reduce(list_transform(b.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (p,q) -> p+q)))
"""


def _spark_cosine(a_emb, b_emb):
    da = F.transform(a_emb, lambda x: x.cast("double"))
    db = F.transform(b_emb, lambda x: x.cast("double"))
    dot = F.aggregate(F.zip_with(da, db, lambda x, y: x * y), F.lit(0.0), lambda s, v: s + v)
    na = F.sqrt(F.aggregate(da, F.lit(0.0), lambda s, v: s + v * v))
    nb = F.sqrt(F.aggregate(db, F.lit(0.0), lambda s, v: s + v * v))
    return dot / (na * nb)


@query(
    "similarity_cosine_topk",
    f"""
    SELECT query_id, neighbor_id, cos_sim, rn FROM (
      SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
        round({_COS_SQL}, 9) AS cos_sim,
        ROW_NUMBER() OVER (PARTITION BY a.vec_id
                           ORDER BY round({_COS_SQL}, 9) DESC, b.vec_id) AS rn
      FROM embeddings a JOIN embeddings b ON a.vec_id < 10 AND b.vec_id != a.vec_id
    ) t WHERE rn <= 5 ORDER BY query_id, rn
    """,
    "similarity", "pipeline",
)
def similarity_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k (the ANN baseline): 10 probe vectors vs the
    corpus, top-5 each. Similarity rounded to 9 dp BEFORE ranking so the
    two engines can't disagree on last-ulp ordering; vec_id tiebreak.
    Scale: probes broadcast against the corpus — one scan, no shuffle;
    top-k via per-partition heaps (window over bounded probe count).

    PERF: per-row norm and double-cast elements are materialized BEFORE
    the join (hand-CSE: the corpus norm was being re-folded once per
    probe pair), and the per-pair dot product runs over 64 unpacked
    primitive columns in whole-stage codegen instead of interpreted
    zip_with/aggregate lambdas. Bit-parity with the oracle is preserved
    because the products are still summed in index order, left-assoc —
    the same fold list_reduce performs."""
    e = load_table(spark, sf_dir, "embeddings")
    nrm2 = F.aggregate(
        F.transform("embedding", lambda x: x.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v * v,
    )
    # one parsed projection (r15: the r14 parsed-string lesson applied to
    # wide PROJECTIONS — 64 aliased Column objects cost ~0.4 s of driver
    # py4j per build; selectExpr parses the identical plan in one call)
    flat = e.withColumn("nrm", F.sqrt(nrm2)).selectExpr(
        "vec_id",
        "nrm",
        *[f"CAST(embedding[{i}] AS DOUBLE) AS e{i}" for i in range(_EMBED_DIM)],
    )
    a = flat.alias("a").filter(F.col("vec_id") < 10)
    b = flat.alias("b")
    # parsed-string dot product: one py4j call instead of ~190 (the
    # r14 PQ driver-cost find; canonicalized plans identical)
    dot = F.expr(" + ".join(f"a.e{i} * b.e{i}" for i in range(_EMBED_DIM)))
    sim = F.round(dot / (F.col("a.nrm") * F.col("b.nrm")), 9)
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        F.broadcast(a)
        .join(b, F.col("b.vec_id") != F.col("a.vec_id"))
        .select(
            F.col("a.vec_id").alias("query_id"),
            F.col("b.vec_id").alias("neighbor_id"),
            sim.alias("cos_sim"),
        )
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .orderBy("query_id", "rn")
    )


_BUCKET_SQL = (
    "(CASE WHEN embedding[1] > 0 THEN 8 ELSE 0 END + "
    "CASE WHEN embedding[2] > 0 THEN 4 ELSE 0 END + "
    "CASE WHEN embedding[3] > 0 THEN 2 ELSE 0 END + "
    "CASE WHEN embedding[4] > 0 THEN 1 ELSE 0 END)"
)


@query(
    "similarity_bucketed_ann",
    f"""
    WITH bucketed AS (
      SELECT vec_id, embedding, {_BUCKET_SQL} AS bucket FROM embeddings
    )
    SELECT query_id, neighbor_id, cos_sim, rn FROM (
      SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
        round({_COS_SQL}, 9) AS cos_sim,
        ROW_NUMBER() OVER (PARTITION BY a.vec_id
                           ORDER BY round({_COS_SQL}, 9) DESC, b.vec_id) AS rn
      FROM bucketed a JOIN bucketed b
        ON a.bucket = b.bucket AND a.vec_id < 10 AND b.vec_id != a.vec_id
    ) t WHERE rn <= 3 ORDER BY query_id, rn
    """,
    "similarity", "pipeline", "lsh",
)
def similarity_bucketed_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed (LSH-style) approximate NN — the scale path: sign-bits of
    the first 4 components partition the corpus into 16 buckets; probes
    only compare within their bucket (equi-join on bucket, ~16× less work;
    with random hyperplanes this is classic SRP-LSH)."""
    e = load_table(spark, sf_dir, "embeddings")
    bucket = (
        F.when(F.col("embedding")[0] > 0, 8).otherwise(0)
        + F.when(F.col("embedding")[1] > 0, 4).otherwise(0)
        + F.when(F.col("embedding")[2] > 0, 2).otherwise(0)
        + F.when(F.col("embedding")[3] > 0, 1).otherwise(0)
    )
    be = e.withColumn("bucket", bucket)
    a = be.alias("a").filter(F.col("vec_id") < 10)
    b = be.alias("b")
    sim = F.round(_spark_cosine(F.col("a.embedding"), F.col("b.embedding")), 9)
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        F.broadcast(a)
        .join(b, (F.col("a.bucket") == F.col("b.bucket")) & (F.col("b.vec_id") != F.col("a.vec_id")))
        .select(
            F.col("a.vec_id").alias("query_id"),
            F.col("b.vec_id").alias("neighbor_id"),
            sim.alias("cos_sim"),
        )
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .orderBy("query_id", "rn")
    )


# ---------------------------------------------------------------------------
# Text analysis
# ---------------------------------------------------------------------------

STOPWORDS = ("the", "a", "value", "data", "row")


@query(
    "text_quality_scores",
    f"""
    WITH t AS (
      SELECT doc_id, lang, string_split(text, ' ') AS toks, length(text) AS n_chars_actual
      FROM documents
    )
    SELECT doc_id, lang,
      len(toks) AS n_tokens,
      n_chars_actual,
      CAST(len(list_filter(toks, x -> list_contains({list(STOPWORDS)}, x))) AS DOUBLE)
        / len(toks) AS stopword_ratio,
      CAST(n_chars_actual - len(toks) + 1 AS DOUBLE) / len(toks) AS avg_token_len
    FROM t ORDER BY doc_id
    """,
    "text", "pipeline",
)
def text_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-scoring battery: token count, char count, stopword ratio,
    average token length — all exact integer arithmetic until the final
    division."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda x: F.array_contains(stop_arr, x)))
    return d.select(
        "doc_id",
        "lang",
        F.size(toks).alias("n_tokens"),
        F.length("text").alias("n_chars_actual"),
        (n_stop.cast("double") / F.size(toks)).alias("stopword_ratio"),
        ((F.length("text") - F.size(toks) + 1).cast("double") / F.size(toks)).alias(
            "avg_token_len"
        ),
    ).orderBy("doc_id")


@query(
    "text_lang_id_heuristic",
    f"""
    WITH t AS (
      SELECT doc_id, lang, string_split(text, ' ') AS toks FROM documents
    ), scored AS (
      SELECT doc_id, lang,
        CAST(len(list_filter(toks, x -> list_contains({list(STOPWORDS)}, x))) AS DOUBLE)
          / len(toks) AS stop_ratio
      FROM t
    )
    SELECT doc_id, lang,
      CASE WHEN stop_ratio >= 0.08 THEN 'en' ELSE 'other' END AS predicted_lang,
      CASE WHEN (CASE WHEN stop_ratio >= 0.08 THEN 'en' ELSE 'other' END) = lang
           THEN 1 ELSE 0 END AS correct
    FROM scored ORDER BY doc_id
    """,
    "text", "pipeline",
)
def text_lang_id_heuristic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID by stopword-density heuristic (n-gram heuristics reduce
    to the same shape: token/char-class densities + threshold)."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    ratio = (
        F.size(F.filter(toks, lambda x: F.array_contains(stop_arr, x))).cast("double")
        / F.size(toks)
    )
    pred = F.when(ratio >= 0.08, "en").otherwise("other")
    return d.select(
        "doc_id",
        "lang",
        pred.alias("predicted_lang"),
        F.when(pred == F.col("lang"), 1).otherwise(0).alias("correct"),
    ).orderBy("doc_id")


@query(
    "text_fingerprint_rolling_hash",
    """
    WITH t AS (SELECT doc_id, substr(text, 1, 64) AS head FROM documents
               WHERE text IS NOT NULL)
    SELECT doc_id,
      list_reduce(
        list_prepend(0::BIGINT,
          list_transform(generate_series(1, length(head)), i -> ord(substr(head, i, 1))::BIGINT)),
        (acc, c) -> (acc * 31 + c) % 1000000007) AS fingerprint
    FROM t ORDER BY doc_id
    """,
    "text", "pipeline",
)
def text_fingerprint_rolling_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprint: polynomial rolling hash (base 31, mod 1e9+7)
    over the first 64 chars — identical left-fold in both engines.
    Null-body docs are dropped (hygiene contract, both sides)."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    head = F.substring("text", 1, 64)
    codes = F.transform(
        F.sequence(F.lit(1), F.length(head)),
        lambda i: F.ascii(head.substr(i, F.lit(1))).cast("long"),
    )
    fp = F.aggregate(
        codes, F.lit(0).cast("long"), lambda acc, c: (acc * 31 + c) % 1_000_000_007
    )
    return d.select("doc_id", fp.alias("fingerprint")).orderBy("doc_id")


# ---------------------------------------------------------------------------
# Multimodal plumbing (binary payload columns)
# ---------------------------------------------------------------------------

@query(
    "multimodal_binary_metadata",
    """
    SELECT doc_id,
      octet_length(encode(text)) AS payload_len,
      md5(text) AS payload_md5,
      hex(encode(substr(text, 1, 8))) AS header_hex
    FROM documents ORDER BY doc_id
    """,
    "multimodal", "pipeline",
)
def multimodal_binary_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Opaque-binary-column pattern (§2.G multimodal): payload as BINARY +
    typed metadata. Here the payload is the utf-8 encoding of text
    (standing in for arbitrary binary assets; the PNG/WAV/APNG codec
    queries exercise real containers); length/digest/header extraction
    are the real plumbing."""
    d = load_table(spark, sf_dir, "documents")
    payload = F.encode("text", "utf-8")
    return d.select(
        "doc_id",
        F.octet_length(payload).alias("payload_len"),
        F.md5(payload).alias("payload_md5"),
        F.hex(F.encode(F.substring("text", 1, 8), "utf-8")).alias("header_hex"),
    ).orderBy("doc_id")


#: fixed embedding dimensionality of the corpus (64 across every SF of the
#: testdata). Training-data embedding columns are fixed-dim in practice;
#: knowing the width statically lets the pair-dedup query unpack vectors
#: into primitive columns so the dot product runs in whole-stage codegen.
#: (constant lives in pq_common — a leaf module — so queries_ml's
#: decoration-time oracle strings can import it without a cycle)
from .pq_common import _EMBED_DIM  # noqa: E402

#: unit-normalized embedding (shared Spark/DuckDB formula: double-cast
#: elements divided by the left-fold L2 norm, so both engines produce
#: bit-identical normalized values and the downstream dot products agree)
_NORM_SQL = (
    "list_transform(embedding, x -> CAST(x AS DOUBLE) / "
    "sqrt(list_reduce(list_transform(embedding, "
    "x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (p,q) -> p+q)))"
)

_DOT_NE_SQL = (
    "list_reduce(list_transform(a.ne, (x,i) -> x * b.ne[i]), (p,q) -> p+q)"
)

#: 6 sign bits → 64 LSH buckets for the pair-dedup sweep (vs 4 bits for
#: the probe-style ANN query): quadratically fewer intra-bucket pairs and
#: more join parallelism, at slightly lower recall — the right trade for
#: corpus-wide dedup, where candidate volume is the cost driver.
_BUCKET6_SQL = " + ".join(
    f"(CASE WHEN embedding[{i + 1}] > 0 THEN {1 << (5 - i)} ELSE 0 END)"
    for i in range(6)
)


@query(
    "dedup_embedding_cosine_pairs",
    f"""
    WITH bucketed AS (
      SELECT vec_id, {_NORM_SQL} AS ne, {_BUCKET6_SQL} AS bucket FROM embeddings
    )
    SELECT a.vec_id AS dup_a, b.vec_id AS dup_b, round({_DOT_NE_SQL}, 9) AS cos_sim
    FROM bucketed a JOIN bucketed b
      ON a.bucket = b.bucket AND a.vec_id < b.vec_id
    WHERE round({_DOT_NE_SQL}, 9) >= 0.15
    ORDER BY dup_a, dup_b
    """,
    "dedup", "similarity", "pipeline",
)
def dedup_embedding_cosine_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (§2.G): sign-bucket LSH blocks
    the corpus (64 buckets from the first 6 component signs), then exact
    cosine only within blocks — the O(n²) comparison shrinks ~64× and the
    bucket equi-join shuffles both sides by bucket, scaling out on any
    cluster. Pairs with cosine >= 0.15 (rounded to 9 dp before the
    threshold so engines can't disagree on last-ulp values).

    PERF: vectors are unit-normalized ONCE per row before the join, so the
    per-pair cost is a single dot product instead of dot + two norms. The
    normalized vector is then UNPACKED into 64 scalar double columns so
    the per-pair dot product compiles into whole-stage codegen (a chain of
    mul/add over primitive columns) instead of interpreted
    zip_with/aggregate lambdas — at ~125k intra-bucket pairs × 64 dims
    that is ~8M lambda invocations avoided (measured 1.9s → 1.2s warm at
    sf0.1 on top of the earlier 6.6s → 2.1s normalization win). Both
    engines multiply in index order and sum left-associated, so every bit
    of the rounded cosine matches the oracle."""
    e = load_table(spark, sf_dir, "embeddings")
    norm = F.sqrt(
        F.aggregate(
            F.transform("embedding", lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda s, v: s + v,
        )
    )
    bucket = sum(
        (
            F.when(F.col("embedding")[i] > 0, 1 << (5 - i)).otherwise(0)
            for i in range(6)
        ),
        start=F.lit(0),
    )
    # norm materialized as a column so each unpacked element reads a cheap
    # reference instead of re-folding the array (HOF lambdas are
    # interpreted with no CSE — see operators/dedup.word_shingles)
    # one parsed projection for the 64 normalized columns (r15 — see
    # similarity_cosine_topk; identical plan, one py4j call)
    be = (
        e.withColumn("norm", norm)
        .withColumn("bucket", bucket)
        .selectExpr(
            "vec_id",
            "bucket",
            *[
                f"CAST(embedding[{i}] AS DOUBLE) / norm AS n{i}"
                for i in range(_EMBED_DIM)
            ],
        )
    )
    a, b = be.alias("a"), be.alias("b")
    # parsed-string dot product (r14 PQ driver-cost find)
    dot = F.expr(" + ".join(f"a.n{i} * b.n{i}" for i in range(_EMBED_DIM)))
    return (
        a.join(
            b,
            (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(
            F.col("a.vec_id").alias("dup_a"),
            F.col("b.vec_id").alias("dup_b"),
            F.round(dot, 9).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= 0.15)
        .orderBy("dup_a", "dup_b")
    )


# NOTE (round 6): the registry entry `similarity_ivf_topk` — the
# k-means-quantized IVF variant — was RETIRED as redundant. Its rows-only
# driver row certified nothing the hash-verified
# `similarity_ivf_deterministic_seeds` (identical assignment / routing /
# probed-search mechanics, closed-form centroids) doesn't already pin,
# and its real contract — recall vs exact brute force under a trained
# quantizer — is exactly what tests/test_similarity_ivf.py asserts
# (recall >= 0.6 at n_probe=6/16, seed-42 KMeans). The operators it
# exercised (operators/similarity.py train_ivf_centroids / with_cells /
# probe_cell_fanout / ivf_topk) all remain covered by that test.


#: BPE-ish tokenizer regex: runs of letters, runs of digits, or any single
#: non-alphanumeric symbol — the shape of byte-pair-encoding pre-tokenizers.
_TOKEN_RE = "[a-z]+|[0-9]+|[^a-z0-9 ]"


@query(
    "text_token_counts",
    f"""
    SELECT doc_id,
      len(string_split(text, ' ')) AS n_ws_tokens,
      len(regexp_extract_all(text, '{_TOKEN_RE}')) AS n_bpe_tokens,
      CAST(length(replace(text, ' ', '')) AS DOUBLE)
        / NULLIF(len(regexp_extract_all(text, '{_TOKEN_RE}')), 0)
        AS chars_per_bpe_token
    FROM documents ORDER BY doc_id
    """,
    "text", "pipeline",
)
def text_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting (§2.G text analysis): whitespace tokens and a BPE-ish
    regex pre-tokenization (letter runs / digit runs / single symbols), plus
    the chars-per-token compression proxy used for quality filtering. All
    JVM-side regex — no Python in the scan path."""
    d = load_table(spark, sf_dir, "documents")
    bpe = F.regexp_extract_all("text", F.lit(_TOKEN_RE), 0)
    return d.select(
        "doc_id",
        F.size(F.split("text", " ")).alias("n_ws_tokens"),
        F.size(bpe).alias("n_bpe_tokens"),
        # NULLIF guard (r6, text-shape regime): an EMPTY or whitespace-only
        # document has zero BPE tokens, and under ANSI the bare division
        # KILLS the whole job — at 100 TB empty docs are a certainty. The
        # compression ratio of a token-less doc is NULL, on both engines.
        (
            F.length(F.regexp_replace("text", " ", "")).cast("double")
            / F.nullif(F.size(bpe), F.lit(0))
        ).alias("chars_per_bpe_token"),
    ).orderBy("doc_id")


def _multimodal_features_oracle() -> str:
    # the oracle recomputes the DECODED raster's statistics from the text
    # the fixture image was rendered from (r7 — real codec): pixel i =
    # ord(text[i]) % 256, raster rows of 16, zero-padded final row, empty
    # text = one all-zero row. Char-level ord + non-negative modulo means
    # Python and SQL agree on every codepoint — the r6 unicode sweep's
    # ASCII stub precondition is gone. list_sum of an empty list is NULL,
    # so COALESCE states the empty-text rule (all-pad image, mean 0).
    return """
    WITH t AS (
      SELECT doc_id, length(text) AS n,
        list_transform(generate_series(1, length(text)),
                       i -> CAST(ord(substr(text, i, 1)) % 256 AS BIGINT)) AS px
      FROM documents WHERE text IS NOT NULL
    )
    SELECT doc_id AS media_id,
      CAST(16 AS INTEGER) AS width,
      CAST(greatest(1, (n + 15) // 16) AS INTEGER) AS height,
      CAST(1 AS INTEGER) AS n_channels,
      CAST(COALESCE(list_sum(px), 0) AS DOUBLE)
        / (16 * greatest(1, (n + 15) // 16)) AS mean_intensity
    FROM t ORDER BY media_id
    """


@query("multimodal_image_features", _multimodal_features_oracle(), "multimodal", "pipeline")
def multimodal_image_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image modality (§2.G) — REAL codec as of round 7: text renders to
    genuine PNG containers (operators/multimodal.py `_png_encode`, stdlib
    zlib — fixture stage standing in for real assets), then
    `extract_image_features` PARSES the PNG (CRC-verified chunks, inflated
    IDAT, unfiltered scanlines) and computes width/height/channels/mean
    intensity from the decoded pixels, Arrow batch by Arrow batch. The
    oracle replays the raster math from the source text, so the decoder's
    output — not a digest proxy — is under the value-hash gate."""
    # a NULL body is a missing asset: dropped before decode (both sides)
    d = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    # Codec pipelines are COMPUTE-bound, not byte-bound: the text fixture
    # is ~100 input bytes per ~ms of codec work, so byte-based scan
    # splits undersubscribe the cluster ~100× (sf10 = 500 K docs arrived
    # as 2 splits → 2 tasks for all Python work, r11). One round-robin
    # spread of the cheap SOURCE TEXT (never the payloads) before
    # synthesis sizes tasks to compute; the codec stages stay narrow
    # from there (plan-gated: no hashpartitioning exchange).
    d = d.repartition(spark.sparkContext.defaultParallelism)
    png = mm.synthesize_png_payloads(d, "doc_id", "text")
    media = mm.attach_media_columns(png, "media_id", "payload")
    return mm.extract_image_features(media).orderBy("media_id")


@query(
    "multimodal_mixed_codec_features",
    # The oracle replays BOTH codecs' decoded-raster math from the source
    # text (r9): even doc_ids render as grayscale PNGs (pixel-per-char,
    # rows of 16, zero-padded — the multimodal_image_features grammar),
    # odd doc_ids as single-frame baseline JPEGs (flat 8x8 block per
    # char, 2 blocks per row — the multimodal_mjpeg_motion grammar at
    # frame 0, where pads are 0). JPEG pixel mean over 64-pixel flat
    # blocks reduces to block-sum / block-count: sum*64/(1024*hb) is the
    # same correctly-rounded double as sum/(2*hb). JPEG-branch text is
    # truncated to 2048 chars — the fixture's render budget (r10, see
    # multimodal_mjpeg_motion: O(chars) DCT blocks made uncapped 60 KB
    # textshape docs dominate the sweep; the ITU-T T.81 format bound is
    # 16382); PNG dimensions are 32-bit and zlib is cheap, no cap.
    """
    WITH d AS (
      SELECT doc_id, CASE WHEN doc_id % 2 = 1 THEN substr(text, 1, 2048)
                          ELSE text END AS text
      FROM documents WHERE text IS NOT NULL
    ), t AS (
      SELECT doc_id, length(text) AS n,
        list_transform(generate_series(1, length(text)),
                       i -> CAST(ord(substr(text, i, 1)) % 256 AS BIGINT)) AS px
      FROM d
    )
    SELECT doc_id AS media_id,
      CAST(16 AS INTEGER) AS width,
      CAST(CASE WHEN doc_id % 2 = 0 THEN greatest(1, (n + 15) // 16)
                ELSE 8 * greatest(1, (n + 1) // 2) END AS INTEGER) AS height,
      CAST(1 AS INTEGER) AS n_channels,
      CAST(COALESCE(list_sum(px), 0) AS DOUBLE)
        / (CASE WHEN doc_id % 2 = 0 THEN 16 * greatest(1, (n + 15) // 16)
                ELSE 2 * greatest(1, (n + 1) // 2) END) AS mean_intensity
    FROM t ORDER BY media_id
    """,
    "multimodal", "pipeline",
)
def multimodal_mixed_codec_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MIXED-FORMAT image corpus (§2.G) — what a real 100 TB ingest looks
    like: no format monoculture. Even doc_ids arrive as PNGs, odd ones as
    baseline JPEGs, one binary column; `extract_image_features` (r9)
    dispatches per payload on MAGIC BYTES — no side-channel format
    column, because at ingest scale the bytes are the only trustworthy
    format signal — and decodes each with the matching REAL codec
    (zlib+unfilter for PNG, Huffman+IDCT for JPEG). Both fixtures derive
    from the same text grammar, so one oracle replays both decoders'
    outputs exactly. Plan shape: two filtered scans of documents, each
    through its narrow synthesize mapInPandas, unioned (still narrow —
    no shuffle before the presentation orderBy), one attach + one decode
    stage over the union."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    # compute-spread round-robin of the source text before the codec
    # stages (see multimodal_image_features — the JPEG branch is ~7 ms
    # of Huffman+IDCT per ~300 input bytes, so byte-based splits ran the
    # whole corpus on 2 tasks at sf10)
    d = d.repartition(spark.sparkContext.defaultParallelism)
    png = mm.synthesize_png_payloads(
        d.filter(F.col("doc_id") % 2 == 0), "doc_id", "text"
    )
    jpg = mm.synthesize_mjpeg_payloads(
        d.filter(F.col("doc_id") % 2 == 1), "doc_id", "text",
        max_frames=1, max_chars=2048,
    )
    media = mm.attach_media_columns(png.unionByName(jpg), "media_id", "payload")
    return mm.extract_image_features(media).orderBy("media_id")


@query(
    "multimodal_audio_features",
    # the oracle recomputes the DECODED signal's statistics from the text
    # the fixture waveform was rendered from: sample i =
    # ((ord(c_i)+96) % 128 - 64)*256 (== (ord-96)*256 on printable ASCII;
    # the modulo keeps any codepoint int16-safe), 16 kHz mono 16-bit PCM
    # in a 44-byte-header WAV container
    """
    WITH t AS (
      SELECT doc_id, length(text) AS n,
        list_transform(generate_series(1, length(text)),
                       i -> CAST(((ord(substr(text, i, 1)) + 96) % 128 - 64) * 256 AS BIGINT)) AS s
      FROM documents WHERE text IS NOT NULL
    )
    SELECT doc_id AS media_id,
      CAST(44 + 2 * n AS BIGINT) AS n_bytes,
      CAST(16000 AS INTEGER) AS sample_rate,
      CAST(n AS BIGINT) AS n_frames,
      CAST(n * 1000 // 16000 AS BIGINT) AS duration_ms,
      CASE WHEN n = 0 THEN 0.0 ELSE
        CAST(list_sum(list_transform(s, v -> abs(v))) AS DOUBLE) / n END
        AS mean_abs_amplitude,
      CAST(COALESCE(list_max(list_transform(s, v -> abs(v))), 0) AS INTEGER)
        AS peak_amplitude,
      CAST(len(list_filter(generate_series(2, n), i -> s[i] * s[i-1] < 0)) AS BIGINT)
        AS zero_crossings
    FROM t ORDER BY media_id
    """,
    "multimodal", "pipeline",
)
def multimodal_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio modality (§2.G) — REAL codec as of round 6: text renders to
    genuine PCM WAV containers (stdlib `wave`, fixture stage standing in
    for real assets), then `extract_audio_features` PARSES the WAV header
    and computes duration / mean-abs / peak / zero-crossing statistics
    from the decoded int16 samples, Arrow batch by Arrow batch. The
    oracle replays the signal math from the source text, so the decoder's
    output — not a byte-length proxy — is under the value-hash gate."""
    # a NULL body is a missing asset: dropped before decode (both sides)
    d = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    wav = mm.synthesize_wav_payloads(d, "doc_id", "text")
    media = mm.attach_media_columns(wav, "media_id", "payload")
    return mm.extract_audio_features(media).orderBy("media_id")


@query(
    "multimodal_frame_samples",
    # the oracle replays the DECODED animation's per-frame statistics from
    # the text the fixture was rendered from (r7 — real APNG codec):
    # frame f pixel i = (ord(text[i]) + f) % 256, pads at f, geometry
    # rows-of-16 like the still image, frame count = min(8, height).
    # Char-level ord + non-negative modulo: every codepoint, both engines.
    """
    WITH t AS (
      SELECT doc_id, length(text) AS n,
        greatest(1, (length(text) + 15) // 16) AS h,
        list_transform(generate_series(1, length(text)),
                       i -> CAST(ord(substr(text, i, 1)) % 256 AS BIGINT)) AS px
      FROM documents WHERE text IS NOT NULL
    ), f AS (
      SELECT doc_id, n, h, px,
        unnest(generate_series(0, least(8, h) - 1)) AS frame_idx
      FROM t
    ), s AS (
      SELECT doc_id, n, h, frame_idx,
        list_transform(px, v -> (v + frame_idx) % 256) AS sp
      FROM f
    )
    SELECT doc_id AS media_id, CAST(frame_idx AS INT) AS frame_idx,
      CAST(COALESCE(list_sum(sp), 0) + (h * 16 - n) * frame_idx AS DOUBLE)
        / (h * 16) AS frame_mean,
      CAST(CASE WHEN h * 16 > n
                THEN greatest(COALESCE(list_max(sp), 0), frame_idx)
                ELSE list_max(sp) END AS INTEGER) AS frame_peak
    FROM s ORDER BY media_id, frame_idx
    """,
    "multimodal", "pipeline",
)
def multimodal_frame_samples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Animation/video modality (§2.G) — REAL container parse as of round
    7: text renders to genuine Animated PNGs (operators/multimodal.py
    `_apng_encode` — acTL/fcTL/fdAT chunks per the public APNG spec; a
    browser plays these), then `sample_frames` PARSES the container
    (CRC-verified chunks, sequence-counter validation, per-frame inflate
    + unfilter) and emits one row per decoded frame with exact pixel
    statistics. One-to-many mapInPandas explode, no shuffle. The oracle
    replays every frame's raster math from the source text, so the
    decoder's output is under the value-hash gate. True video codecs
    (H.264/VP9) still require ffmpeg — documented boundary."""
    # a NULL body is a missing asset: dropped before decode (both sides)
    d = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    apng = mm.synthesize_apng_payloads(d, "doc_id", "text")
    media = mm.attach_media_columns(apng, "media_id", "payload")
    return mm.sample_frames(media).orderBy("media_id", "frame_idx")


@query(
    "multimodal_video_motion",
    # the oracle replays the DECODED video's per-frame luma statistics AND
    # the temporal-difference motion signal from the text the fixture was
    # rendered from (r8 — real YUV4MPEG2 container): frame f pixel i =
    # (ord(text[i]) + f) % 256, pads at f, rows of 16, min(8, h) frames.
    # Motion |luma(f) − luma(f−1)| is 1 per pixel except where the +1
    # step wraps 255→0, i.e. (v + f) % 256 = 0, where it is 255; pads
    # (v = 0) never wrap for f in 1..7, so they contribute 1 each.
    """
    WITH t AS (
      SELECT doc_id, length(text) AS n,
        greatest(1, (length(text) + 15) // 16) AS h,
        list_transform(generate_series(1, length(text)),
                       i -> CAST(ord(substr(text, i, 1)) % 256 AS BIGINT)) AS px
      FROM documents WHERE text IS NOT NULL
    ), f AS (
      SELECT doc_id, n, h, px,
        unnest(generate_series(0, least(8, h) - 1)) AS frame_idx
      FROM t
    ), s AS (
      SELECT doc_id, n, h, frame_idx,
        list_transform(px, v -> (v + frame_idx) % 256) AS sp,
        CASE WHEN frame_idx = 0 THEN NULL
             ELSE COALESCE(list_sum(list_transform(px,
                    v -> CASE WHEN (v + frame_idx) % 256 = 0
                              THEN CAST(255 AS BIGINT)
                              ELSE CAST(1 AS BIGINT) END)), 0)
                  + (h * 16 - n) END AS motion_sum
      FROM f
    )
    SELECT doc_id AS media_id, CAST(frame_idx AS INT) AS frame_idx,
      CAST(COALESCE(list_sum(sp), 0) + (h * 16 - n) * frame_idx AS DOUBLE)
        / (h * 16) AS frame_mean,
      CAST(CASE WHEN h * 16 > n
                THEN greatest(COALESCE(list_max(sp), 0), frame_idx)
                ELSE list_max(sp) END AS INTEGER) AS frame_peak,
      CAST(motion_sum AS DOUBLE) / (h * 16) AS motion_mean
    FROM s ORDER BY media_id, frame_idx
    """,
    "multimodal", "pipeline",
)
def multimodal_video_motion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video modality (§2.G) — REAL container parse as of round 8: text
    renders to genuine YUV4MPEG2 streams (operators/multimodal.py
    `_y4m_encode` — the uncompressed interchange container ffmpeg / mpv /
    x264 read and write; `ffmpeg -i` plays these), then
    `sample_video_frames` PARSES the container (header grammar, FRAME
    markers, exact per-frame plane walk with truncation guards) and emits
    one row per decoded frame with exact luma statistics PLUS
    ``motion_mean`` — mean absolute temporal difference vs the previous
    frame, the signal scene-cut detection and keyframe selection build
    on (NULL for frame 0). One-to-many mapInPandas explode, no shuffle;
    all sums exact integers with one double division. The oracle replays
    every frame's raster and motion math from the source text, so the
    decoder's output is under the value-hash gate. COMPRESSED codecs
    (H.264/VP9, MJPEG) still require ffmpeg — the documented boundary;
    a deployment swaps the y4m walk for ffmpeg decode, Spark shape
    unchanged."""
    # a NULL body is a missing asset: dropped before decode (both sides)
    d = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    y4m = mm.synthesize_y4m_payloads(d, "doc_id", "text")
    media = mm.attach_media_columns(y4m, "media_id", "payload")
    return mm.sample_video_frames(media).orderBy("media_id", "frame_idx")


@query(
    "multimodal_mjpeg_motion",
    # The oracle replays the DECODED MJPEG stream's per-frame luma
    # statistics from the text the fixture was rendered from (r9 — real
    # Huffman+DCT codec): char b is one flat 8x8 BLOCK of value
    # (ord(text[b]) + f) % 256 in frame f, pads at f, blocks in rows of
    # 2, min(4, block_rows) frames. Flat blocks survive the lossy codec
    # exactly (DC-only spectrum, DC quantizer step 1), so pixel stats
    # equal block stats: each block contributes 64 identical pixels and
    # sum_px/(64*nb) is the same correctly-rounded double as sum_blk/nb.
    # Motion per block is 1 except where +1 wraps 255 -> 0 (i.e.
    # (v + f) % 256 = 0), where it is 255; pads (v = 0) never wrap for
    # f in 1..3. Text is truncated to 2048 chars first — an explicit
    # render BUDGET below ITU-T T.81's 8191-block-row format bound
    # (r10: encoding is O(chars*frames) DCT blocks, and the textshape
    # regime's 60 KB documents made the uncapped fixture dominate the
    # sweep; 1024 block rows x 4 frames still exercises every decoder
    # path). Same substr rule both engines.
    """
    WITH d AS (
      SELECT doc_id, substr(text, 1, 2048) AS text
      FROM documents WHERE text IS NOT NULL
    ), t AS (
      SELECT doc_id, length(text) AS n,
        greatest(1, (length(text) + 1) // 2) AS h,
        list_transform(generate_series(1, length(text)),
                       i -> CAST(ord(substr(text, i, 1)) % 256 AS BIGINT)) AS px
      FROM d
    ), f AS (
      SELECT doc_id, n, h, px,
        unnest(generate_series(0, least(4, h) - 1)) AS frame_idx
      FROM t
    ), s AS (
      SELECT doc_id, n, h, frame_idx,
        list_transform(px, v -> (v + frame_idx) % 256) AS sp,
        CASE WHEN frame_idx = 0 THEN NULL
             ELSE COALESCE(list_sum(list_transform(px,
                    v -> CASE WHEN (v + frame_idx) % 256 = 0
                              THEN CAST(255 AS BIGINT)
                              ELSE CAST(1 AS BIGINT) END)), 0)
                  + (h * 2 - n) END AS motion_sum
      FROM f
    )
    SELECT doc_id AS media_id, CAST(frame_idx AS INT) AS frame_idx,
      CAST(COALESCE(list_sum(sp), 0) + (h * 2 - n) * frame_idx AS DOUBLE)
        / (h * 2) AS frame_mean,
      CAST(CASE WHEN h * 2 > n
                THEN greatest(COALESCE(list_max(sp), 0), frame_idx)
                ELSE list_max(sp) END AS INTEGER) AS frame_peak,
      CAST(motion_sum AS DOUBLE) / (h * 2) AS motion_mean
    FROM s ORDER BY media_id, frame_idx
    """,
    "multimodal", "pipeline",
)
def multimodal_mjpeg_motion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COMPRESSED video modality (§2.G) — the round-8 verdict's open
    codec boundary, closed for MJPEG: text renders to raw Motion-JPEG
    streams of genuinely entropy-coded baseline JPEGs
    (operators/multimodal.py `_jpeg_encode` — 8x8 DCT, Annex K
    quantization and Huffman tables, byte-stuffed bitstream; any JPEG
    reader decodes the frames, `ffmpeg -f mjpeg` demuxes the stream),
    then `sample_mjpeg_frames` FULLY DECODES each sampled frame
    (`_jpeg_decode_at`: marker walk, Huffman decode, dequantize, IDCT,
    level shift) and emits one row per frame with exact luma statistics
    plus the temporal-difference ``motion_mean`` (NULL for frame 0) —
    same contract as `multimodal_video_motion`, so uncompressed y4m and
    compressed MJPEG are drop-in container alternatives. The fixture's
    flat-block raster makes the lossy codec losslessly replayable
    (DC-only spectra under a step-1 DC quantizer), putting the
    Huffman+DCT round trip under the value-hash gate. One-to-many
    mapInPandas explode, no shuffle; decode stops at the sample cap so
    unsampled frames cost nothing. Inter-frame codecs (H.264/VP9) remain
    the documented ffmpeg boundary."""
    # a NULL body is a missing asset: dropped before decode (both sides)
    d = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    mj = mm.synthesize_mjpeg_payloads(d, "doc_id", "text", max_chars=2048)
    media = mm.attach_media_columns(mj, "media_id", "payload")
    return mm.sample_mjpeg_frames(media).orderBy("media_id", "frame_idx")


@query(
    "chunk_documents_token_windows",
    """
    WITH t AS (
      SELECT doc_id, string_split(text, ' ') AS w, len(string_split(text, ' ')) AS n
      FROM documents
    ), starts AS (
      SELECT doc_id, w, n, unnest(generate_series(1, n, 30)) AS start FROM t
    )
    SELECT doc_id,
      CAST((start - 1) // 30 AS BIGINT) AS chunk_idx,
      CAST(LEAST(40, n - start + 1) AS BIGINT) AS n_tokens,
      array_to_string(list_slice(w, start, start + 39), ' ') AS chunk_text
    FROM starts
    ORDER BY doc_id, chunk_idx
    """,
    "text", "pipeline",
)
def chunk_documents_token_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document chunking into overlapping token windows (40-token chunks,
    stride 30 → 10-token overlap) — the context-window packing step of
    every LLM training pipeline. The token array materializes ONCE as a
    projected column; chunk starts come from `sequence` (stride as step)
    and each chunk is a `slice` + join — all JVM-side HOFs, no Python,
    no shuffle: chunking is a pure flatMap over the scan, which is
    exactly what you want at 100 TB (explode fan-out ≈ n_tokens/stride
    per doc, linear in corpus size). Short docs yield one short chunk."""
    d = load_table(spark, sf_dir, "documents")
    words = d.select(
        "doc_id", F.split("text", " ").alias("w")
    ).withColumn("n", F.size("w"))
    starts = words.withColumn(
        "start", F.explode(F.sequence(F.lit(1), F.col("n"), F.lit(30)))
    )
    return starts.select(
        "doc_id",
        ((F.col("start") - 1) / F.lit(30)).cast("bigint").alias("chunk_idx"),
        F.least(F.lit(40), F.col("n") - F.col("start") + 1)
        .cast("bigint")
        .alias("n_tokens"),
        F.concat_ws(" ", F.slice(F.col("w"), F.col("start"), 40)).alias("chunk_text"),
    ).orderBy("doc_id", "chunk_idx")


@query(
    "pii_redact_event_props",
    """
    SELECT event_id,
      regexp_replace(
        regexp_replace(props, '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+', '<EMAIL>', 'g'),
        '[0-9]+', '<NUM>', 'g') AS props_redacted,
      CAST(len(regexp_extract_all(props, '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+', 0))
        + len(regexp_extract_all(
            regexp_replace(props, '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+', '<EMAIL>', 'g'),
            '[0-9]+', 0)) AS INT) AS n_redactions
    FROM events
    ORDER BY event_id
    """,
    "text", "pipeline", "scalar",
)
def pii_redact_event_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing over a raw-payload column — the redaction pass a
    training pipeline runs before anything else persists: emails first
    (so their digits don't double-count), then digit runs, each replaced
    by a typed placeholder, with a per-row redaction count for audit
    sampling. Both patterns are RE2-safe (no backrefs/lookahead) so
    Spark's Java regex and the oracle's RE2 agree. Scale: pure scan-side
    projection in codegen — no shuffle, no Python; the count lets you
    route high-PII rows to quarantine with a filter instead of a second
    scan."""
    email = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+"
    deemailed = F.regexp_replace("props", email, "<EMAIL>")
    return (
        load_table(spark, sf_dir, "events")
        .select(
            "event_id",
            F.regexp_replace(deemailed, "[0-9]+", "<NUM>").alias("props_redacted"),
            (
                F.regexp_count("props", F.lit(email))
                + F.regexp_count(deemailed, F.lit("[0-9]+"))
            )
            .cast("int")
            .alias("n_redactions"),
        )
        .orderBy("event_id")
    )


@query(
    "embedding_centroids_per_label",
    """
    WITH ex AS (
      SELECT label, embedding,
        unnest(generate_series(1, len(embedding))) AS pos
      FROM embeddings
    )
    SELECT label, CAST(pos AS INT) AS pos,
      CAST(SUM(CAST(FLOOR(CAST(embedding[pos] AS DOUBLE) * 1000000) AS BIGINT))
           AS DOUBLE) / COUNT(*) AS centroid_q6,
      COUNT(*) AS n_vectors
    FROM ex
    GROUP BY label, pos
    ORDER BY label, pos
    """,
    "similarity", "agg", "pipeline",
)
def embedding_centroids_per_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-class embedding centroids — the building block of IVF coarse
    quantizers, class prototypes, and drift monitoring: posexplode the
    vector to (label, pos, component) rows and average per cell. The
    component is fixed-pointed (floor(x·1e6), exact on doubles, no
    rounding-mode ambiguity) so the sum is an exact integer in ANY
    aggregation order — float centroid sums would differ between Spark's
    parallel partial aggregation and a serial engine in the last ulp.
    Scale: one shuffle of (label, pos) pairs, 64·|labels| cells of
    two-long state; the explode is map-side and fuses with the scan."""
    e = load_table(spark, sf_dir, "embeddings")
    return (
        e.select("label", F.posexplode("embedding").alias("pos0", "x"))
        .select(
            "label",
            (F.col("pos0") + 1).cast("int").alias("pos"),
            F.floor(F.col("x").cast("double") * 1_000_000).cast("bigint").alias("q"),
        )
        .groupBy("label", "pos")
        .agg(
            (F.sum("q").cast("double") / F.count(F.lit(1))).alias("centroid_q6"),
            F.count(F.lit(1)).alias("n_vectors"),
        )
        .orderBy("label", "pos")
    )


_INCR_SPLIT = 400  # docs >= split form the "newly arrived shard"


@query(
    "dedup_incremental_new_vs_corpus",
    _minhash_oracle_sql().replace(
        "AND a.doc_id < b.doc_id",
        f"AND a.doc_id < {_INCR_SPLIT} AND b.doc_id >= {_INCR_SPLIT}",
    ),
    "dedup", "pipeline", "lsh", "incremental",
)
def dedup_incremental_new_vs_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental ingestion dedup (§2.G): candidate near-dup pairs
    between a NEWLY ARRIVED shard (doc_id >= 400) and the EXISTING corpus
    (doc_id < 400) — the shape a continuously-fed training pipeline runs
    on every batch, where re-deduping the whole corpus per arrival would
    be quadratic over time.

    Scale: in production the corpus band index is PERSISTED parquet and
    each new shard probes it with an equi-join on (band_idx, band_key),
    appending its own bands afterward — the signature pipeline runs once
    per document ever. Here both sides derive from the same scan, so a
    literal two-sided join would re-execute that pipeline per side
    (verified: 4 scans, no exchange reuse); instead the band buckets are
    grouped ONCE (one shuffle, pipeline executed once — the band_pairs
    formulation) and cross-boundary pairs are built in-bucket with array
    HOFs. doc_a < doc_b holds by construction (old < split <= new);
    DISTINCT collapses pairs that collide in both bands."""
    # null-body hygiene, same contract as every shingle pipeline
    d = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    sig = dd.minhash_signature_df(d, "doc_id", "text")
    bands = dd.minhash_band_keys(sig, "doc_id")
    buckets = (
        bands.groupBy("band_idx", "band_key")
        .agg(F.sort_array(F.collect_list("doc_id")).alias("ids"))
        .filter(F.size("ids") > 1)
    )
    # olds/news materialized as projected columns BEFORE the pair HOF —
    # interpreted lambdas have no CSE, so referencing the filter
    # expressions inside the nested transform would re-run them per element
    split_buckets = buckets.select(
        F.filter("ids", lambda x: x < F.lit(_INCR_SPLIT)).alias("olds"),
        F.filter("ids", lambda x: x >= F.lit(_INCR_SPLIT)).alias("news"),
    ).filter((F.size("olds") > 0) & (F.size("news") > 0))
    # hot buckets (either side > MAX_BUCKET) take the block-decomposed
    # quarantine path — bounded per-task pair expansion at any bucket size
    return (
        dd.cross_bucket_pairs(split_buckets, "olds", "news")
        .distinct()
        .orderBy("doc_a", "doc_b")
    )


def _setsim_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct token sets of the setsim probe slice (shared by candidate
    generation and the verify join)."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 150)
    return d.select(
        "doc_id",
        F.array_distinct(
            F.filter(F.split("text", " "), lambda x: x != "")
        ).alias("tk"),
    ).filter(F.size("tk") > 0)


def _setsim_candidates(
    spark: SparkSession, sf_dir: str, length_filter: bool = True
):
    """PPJoin candidate pairs: rare-first prefix buckets -> quarantined
    in-bucket pairs -> (optional) length filter. Returns (candidates,
    Observation) — the Observation reports the post-prune candidate count
    after any action, riding the plan at zero extra cost.

    The length filter is PPJoin's |shorter| >= t·|longer| necessity in
    exact integers (5·min >= 3·max for t = 3/5): J <= |shorter|/|longer|,
    so size-mismatched pairs cannot reach 0.6 and are pruned BEFORE the
    verify join rather than during it. Lossless by construction."""
    toks = _setsim_tokens(spark, sf_dir)
    # global rare-first order: (corpus frequency, token)
    exploded = toks.select("doc_id", F.explode("tk").alias("tok"))
    freq = exploded.groupBy("tok").agg(F.count(F.lit(1)).alias("cnt"))
    # per-doc tokens sorted rare-first; prefix keeps n - ceil(0.6n) + 1
    ordered = (
        exploded.join(F.broadcast(freq), "tok")
        .groupBy("doc_id")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("cnt", "tok"))),
                lambda s: s["tok"],
            ).alias("sorted_tk")
        )
    )
    n = F.size("sorted_tk")
    prefix_len = n - F.floor((3 * n + 4) / 5).cast("int") + 1
    # n rides along into the buckets so the length filter needs no join:
    # bucket elements are (doc_id, n) structs — doc_id leads, so struct
    # ordering (and the a<b pair invariant) still follows doc_id
    prefix = ordered.select(
        "doc_id",
        n.alias("n"),
        F.explode(F.slice("sorted_tk", 1, prefix_len)).alias("tok"),
    )
    buckets = (
        prefix.groupBy("tok")
        .agg(F.sort_array(F.collect_set(F.struct("doc_id", "n"))).alias("ids"))
        .filter(F.size("ids") > 1)
    )
    # hot prefix buckets (a boilerplate token shared by thousands of docs)
    # quarantine into the bounded block-pair path
    raw = dd.bucket_pairs(buckets)
    if length_filter:
        na, nb = F.col("doc_a.n"), F.col("doc_b.n")
        raw = raw.filter(5 * F.least(na, nb) >= 3 * F.greatest(na, nb))
    cands = raw.select(
        F.col("doc_a.doc_id").alias("doc_a"), F.col("doc_b.doc_id").alias("doc_b")
    ).distinct()
    return audit.audit_counts(cands, "setsim_candidates")


@query(
    "setsim_join_exact_jaccard",
    """
    WITH toks0 AS (
      SELECT doc_id,
        list_distinct(list_filter(string_split(text, ' '), x -> x <> '')) AS tk
      FROM documents WHERE doc_id < 150
    ),
    -- len(tk) > 0 mirrors the engine's size(tk) > 0: without it two
    -- empty-token docs satisfy 8*0 >= 3*0 and emit a bogus n_union=0 pair
    toks AS (SELECT doc_id, tk FROM toks0 WHERE len(tk) > 0)
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
      CAST(len(list_intersect(a.tk, b.tk)) AS BIGINT) AS n_inter,
      CAST(len(a.tk) + len(b.tk) - len(list_intersect(a.tk, b.tk)) AS BIGINT)
        AS n_union
    FROM toks a JOIN toks b ON a.doc_id < b.doc_id
    WHERE 8 * len(list_intersect(a.tk, b.tk)) >= 3 * (len(a.tk) + len(b.tk))
    ORDER BY doc_a, doc_b
    """,
    "dedup", "pipeline", "setsim",
)
def setsim_join_exact_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT set-similarity self-join (Jaccard >= 0.6) via PPJoin-style
    prefix filtering — the deterministic complement to probabilistic
    minhash: no false negatives, no tuning, same never-all-pairs shape.
    Two sets with J >= t MUST share a token among each one's first
    n - ceil(t*n) + 1 tokens under any shared global order; ordering
    rare-tokens-first makes those prefix buckets tiny. Candidates come
    from grouping prefix-token buckets (one shuffle, in-bucket pairs —
    the band_pairs formulation); the exact Jaccard check then keeps true
    pairs, compared in integer cross-multiplication (8*inter >= 3*(|a|+|b|)
    <=> J >= 0.6) so no float threshold exists.

    The oracle brute-forces all pairs on the bounded probe set — valid
    precisely because prefix filtering is LOSSLESS, so the scale path and
    the quadratic path must return identical rows.

    Scale: prefix explode is ~(1-t)·|tokens| rows; buckets are rare-token
    buckets; PPJoin's LENGTH filter (5·|shorter| >= 3·|longer|, a J >= 0.6
    necessity since J <= |shorter|/|longer|) prunes size-mismatched
    candidates before they reach the verify join; the verify join
    re-derives token arrays from the scan (a narrow map fused with it)
    keyed by doc — never a cross product. The candidate count after
    pruning rides the plan as an Observation (zero extra scans)."""
    cands, _obs = _setsim_candidates(spark, sf_dir)
    toks = _setsim_tokens(spark, sf_dir)
    a = toks.select(F.col("doc_id").alias("doc_a"), F.col("tk").alias("tka"))
    b = toks.select(F.col("doc_id").alias("doc_b"), F.col("tk").alias("tkb"))
    inter = F.size(F.array_intersect("tka", "tkb"))
    verified = (
        cands.join(a, "doc_a")
        .join(b, "doc_b")
        .withColumn("n_inter", inter)
        .filter(
            8 * F.col("n_inter") >= 3 * (F.size("tka") + F.size("tkb"))
        )
        .select(
            "doc_a",
            "doc_b",
            F.col("n_inter").cast("long").alias("n_inter"),
            (F.size("tka") + F.size("tkb") - F.col("n_inter"))
            .cast("long")
            .alias("n_union"),
        )
    )
    return verified.orderBy("doc_a", "doc_b")


@query(
    "similarity_ivf_deterministic_seeds",
    f"""
    WITH corpus AS (SELECT vec_id, embedding FROM embeddings),
    seeds AS (
      SELECT vec_id AS seed_id, embedding FROM embeddings WHERE vec_id % 100 = 0
    ),
    asg AS (
      SELECT vec_id, seed_id FROM (
        SELECT a.vec_id, b.seed_id,
          ROW_NUMBER() OVER (PARTITION BY a.vec_id
                             ORDER BY round({_COS_SQL}, 9) DESC, b.seed_id) AS rn
        FROM corpus a JOIN seeds b ON TRUE
      ) t WHERE rn = 1
    ),
    pcell AS (
      SELECT vec_id AS probe_id, seed_id FROM (
        SELECT a.vec_id, b.seed_id,
          ROW_NUMBER() OVER (PARTITION BY a.vec_id
                             ORDER BY round({_COS_SQL}, 9) DESC, b.seed_id) AS rn
        FROM corpus a JOIN seeds b ON TRUE
        WHERE a.vec_id < 10
      ) t WHERE rn <= 2
    ),
    cand AS (
      SELECT p.probe_id, g.vec_id AS neighbor_id
      FROM pcell p JOIN asg g ON g.seed_id = p.seed_id
      WHERE g.vec_id <> p.probe_id
    )
    SELECT query_id, neighbor_id, cos_sim, rn FROM (
      SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
        round({_COS_SQL}, 9) AS cos_sim,
        ROW_NUMBER() OVER (PARTITION BY a.vec_id
                           ORDER BY round({_COS_SQL}, 9) DESC, b.vec_id) AS rn
      FROM cand c
        JOIN corpus a ON a.vec_id = c.probe_id
        JOIN corpus b ON b.vec_id = c.neighbor_id
    ) t WHERE rn <= 5 ORDER BY query_id, rn
    """,
    "similarity", "pipeline",
)
def similarity_ivf_deterministic_seeds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN under the FULL hash gate — the trick that upgrades it from
    rows-only: the coarse quantizer's centroids are DETERMINISTIC SEED
    VECTORS (every 100th corpus vector) instead of k-means output, so
    cell assignment, probe selection (n_probe = 2 nearest cells), and
    the in-cell search are all closed-form and bit-reproducible, and
    the oracle replays the identical three stages. The k-means variant
    (`similarity_ivf_topk`) stays recall-gated; this query pins the IVF
    MECHANICS — assignment, cell routing, probed-cells-only search —
    exactly.

    Scale shape is the real IVF one: the seed set is tiny and broadcast
    (assignment is a narrow pass over the corpus — no shuffle of
    embeddings); the probe search touches only the two probed cells'
    vectors, reached by equi-join on the cell id. Float parity: dots
    are left-assoc sums over unpacked primitive columns in codegen —
    the same fold order as the oracle's list_reduce — and similarities
    round to 9 dp before ranking with id tiebreaks."""
    e = load_table(spark, sf_dir, "embeddings")
    nrm2 = F.aggregate(
        F.transform("embedding", lambda x: x.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v * v,
    )
    # one parsed projection each (r15 — see similarity_cosine_topk)
    flat = e.withColumn("nrm", F.sqrt(nrm2)).selectExpr(
        "vec_id",
        "nrm",
        *[f"CAST(embedding[{i}] AS DOUBLE) AS e{i}" for i in range(_EMBED_DIM)],
    )
    seeds = flat.filter(F.col("vec_id") % 100 == 0).selectExpr(
        "vec_id AS seed_id",
        "nrm AS snrm",
        *[f"e{i} AS s{i}" for i in range(_EMBED_DIM)],
    )

    def seed_cos():
        # parsed-string dot product (r14 PQ driver-cost find)
        dot = F.expr(" + ".join(f"e{i} * s{i}" for i in range(_EMBED_DIM)))
        return F.round(dot / (F.col("nrm") * F.col("snrm")), 9)

    scored = (
        flat.crossJoin(F.broadcast(seeds))
        .withColumn("c", seed_cos())
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("vec_id").orderBy(F.desc("c"), F.asc("seed_id"))
            ),
        )
    )
    asg = scored.filter(F.col("rn") == 1).select("vec_id", "seed_id")
    pcell = (
        scored.filter((F.col("vec_id") < 10) & (F.col("rn") <= 2))
        .select(F.col("vec_id").alias("probe_id"), "seed_id")
    )
    cand = (
        pcell.join(asg, "seed_id")
        .filter(F.col("vec_id") != F.col("probe_id"))
        .select("probe_id", F.col("vec_id").alias("neighbor_id"))
    )

    a = flat.alias("a")
    b = flat.alias("b")
    # parsed-string dot product (r14 PQ driver-cost find)
    dot = F.expr(" + ".join(f"a.e{i} * b.e{i}" for i in range(_EMBED_DIM)))
    sim = F.round(dot / (F.col("a.nrm") * F.col("b.nrm")), 9)
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        cand.join(a, F.col("a.vec_id") == F.col("probe_id"))
        .join(b, F.col("b.vec_id") == F.col("neighbor_id"))
        .select(
            F.col("probe_id").alias("query_id"),
            F.col("neighbor_id"),
            sim.alias("cos_sim"),
        )
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .orderBy("query_id", "rn")
    )


# PQ constants + DuckDB oracle fragments live in pq_common (leaf module)
from .pq_common import (  # noqa: E402
    _PQ_SUB,
    _PQ_SUBDIM,
    _PQ_Q_SQL,
    _pq_subdist_sql,
)


@query(
    "similarity_pq_adc_topk",
    f"""
    -- Product quantization with integer-exact arithmetic: quantize to
    -- q = round(x*100) BIGINT, 8 subspaces x 8 dims, a deterministic
    -- 16-entry codebook (vec_id % 31 = 0, < 496 -- the IVF-seeds trick),
    -- codes = per-subspace argmin, ADC top-10 from codes + LUT only.
    WITH src AS (
      SELECT vec_id, {_PQ_Q_SQL} AS q
      FROM embeddings
      WHERE vec_id IS NOT NULL AND embedding IS NOT NULL
        AND len(embedding) = 64
    ),
    cb AS (
      SELECT vec_id AS cb_id, q FROM src
      WHERE vec_id % 31 = 0 AND vec_id < 496
    ),
    probe AS (
      SELECT vec_id AS probe_id, q AS pq FROM src
      WHERE NOT (vec_id % 31 = 0 AND vec_id < 496)
      ORDER BY vec_id LIMIT 1
    ),
    sub AS (SELECT unnest(range(0, 8)) AS ss),
    codes AS (
      SELECT vec_id, ss, cb_id FROM (
        SELECT s.vec_id, sub.ss, c.cb_id,
          ROW_NUMBER() OVER (PARTITION BY s.vec_id, sub.ss
            ORDER BY {_pq_subdist_sql("s.q", "c.q")}, c.cb_id) AS rn
        FROM src s CROSS JOIN cb c CROSS JOIN sub
      ) t WHERE rn = 1
    ),
    lut AS (
      SELECT c.cb_id, sub.ss,
        {_pq_subdist_sql("c.q", "p.pq")} AS pd
      FROM cb c CROSS JOIN probe p CROSS JOIN sub
    ),
    adc AS (
      SELECT codes.vec_id AS neighbor_id,
        CAST(SUM(lut.pd) AS BIGINT) AS adc_dist
      FROM codes
      JOIN lut ON codes.ss = lut.ss AND codes.cb_id = lut.cb_id
      CROSS JOIN probe
      WHERE codes.vec_id <> probe.probe_id
      GROUP BY codes.vec_id
    ),
    top AS (
      SELECT neighbor_id, adc_dist,
        ROW_NUMBER() OVER (ORDER BY adc_dist, neighbor_id) AS rn
      FROM adc
    )
    SELECT t.neighbor_id, t.adc_dist,
      CAST(list_sum(list_transform(range(1, 65), i ->
        (s.q[i] - p.pq[i]) * (s.q[i] - p.pq[i]))) AS BIGINT) AS exact_dist,
      t.rn
    FROM top t
    JOIN src s ON s.vec_id = t.neighbor_id
    CROSS JOIN probe p
    WHERE t.rn <= 10
    ORDER BY t.rn
    """,
    "similarity", "pipeline", "sketch",
)
def similarity_pq_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN under the FULL hash gate — the compression
    path a 100 TB vector corpus actually ships (Jégou et al., TPAMI 2011:
    store 8 one-byte codes per vector instead of 64 floats; answer
    queries from codes + a per-probe lookup table, touching the raw
    vectors only to rescore the winners). Every stage is integer-exact so
    the oracle states every value: vectors quantize to q = round(x·100)
    BIGINT (the int8-style quantization step itself part of the
    technique); the codebook is DETERMINISTIC — the 16 corpus vectors
    with vec_id % 31 = 0 (< 496), the same seeds-not-kmeans trick that
    put IVF under the hash gate (similarity_ivf_deterministic_seeds);
    codes are per-subspace argmin of exact BIGINT squared distances with
    cb_id tie-break; the ADC top-10 ranks on exact BIGINT sums.

    The PQ INDEX (vec_id, c0..c7) is persisted once per corpus — the
    same build-once-query-forever state discipline as the sketch shard
    family — and the query phase reads CODES ONLY: the probe's 8×16
    lookup table collapses into ONE broadcast row of per-subspace maps
    and the ADC distance is pure try_element_at lookups in the scan
    (zero joins over the corpus — the register-resident-LUT shape real
    ADC implementations use), with the top-10 a TakeOrdered. The raw
    corpus is touched once more only to attach the winners' exact
    quantized distances (a 10-row broadcast join back) — the output's
    own compression-quality report: adc_dist vs exact_dist per winner
    is the PQ reconstruction error, stated exactly.

    Scale: codes are 8 longs per vector (vs 64 floats — 97% smaller at
    byte-width parity with real uint8 codes); the encode pass is one
    broadcast nested-loop against 16 codebook rows with map-side
    partial min_by (one 1-row-per-vector shuffle, paid once at index
    build); ADC never shuffles. Reference parity: kiji-scoring persists
    derived per-entity artifacts to the metatable
    (KijiFreshnessManager.java:235-239) — the codes table is that
    pattern for embeddings."""
    import os

    from .queries_graph import _state_path

    e = load_table(spark, sf_dir, "embeddings").filter(
        F.col("vec_id").isNotNull()
        & F.col("embedding").isNotNull()
        & (F.size("embedding") == _EMBED_DIM)
    )
    q = e.selectExpr(
        "vec_id",
        *[
            f"CAST(ROUND(CAST(embedding[{i}] AS DOUBLE) * 100) AS BIGINT)"
            f" AS q{i}"
            for i in range(_EMBED_DIM)
        ],
    )
    is_cb = (F.col("vec_id") % 31 == 0) & (F.col("vec_id") < 496)
    # one parsed projection (r15 — see similarity_cosine_topk)
    cb = q.filter(is_cb).selectExpr(
        "vec_id AS cb_id",
        *[f"q{i} AS cq{i}" for i in range(_EMBED_DIM)],
    )

    def subdist(l_tpl: str, r_tpl: str, ss: int):
        # parsed-string build (one py4j call) — see _sqdiff_sum_expr
        return _sqdiff_sum_expr(
            l_tpl, r_tpl, ss * _PQ_SUBDIM, (ss + 1) * _PQ_SUBDIM
        )

    path = _state_path(sf_dir, "pq_codes_embeddings.parquet")
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        enc = q.crossJoin(F.broadcast(cb))
        (
            enc.groupBy("vec_id")
            .agg(
                *[
                    F.min_by(
                        "cb_id", F.struct(subdist("q{}", "cq{}", s), F.col("cb_id"))
                    ).alias(f"c{s}")
                    for s in range(_PQ_SUB)
                ]
            )
            .write.mode("overwrite")
            .parquet(path)
        )
    codes = spark.read.parquet(path)

    probe = (
        q.filter(~is_cb)
        .orderBy("vec_id")
        .limit(1)
        .selectExpr(
            "vec_id AS probe_id",
            *[f"q{i} AS pq{i}" for i in range(_EMBED_DIM)],
        )
    )
    # The probe subtree (scan → sort → limit(1)) feeds both the LUT and
    # the final exact join-back; lazy localCheckpoint shares one
    # execution across consumers (the triangle_count pattern — persist/
    # unpersist around a lazy plan is a no-op cache; see verify notes).
    probe = probe.localCheckpoint(eager=False)
    lut = cb.crossJoin(F.broadcast(probe)).select(
        "cb_id",
        "probe_id",
        *[subdist("cq{}", "pq{}", s).alias(f"pd{s}") for s in range(_PQ_SUB)],
    )
    # Textbook ADC: the per-subspace LUT collapses into ONE broadcast row
    # of maps (cb_id → partial distance) and the scan does pure map
    # lookups — zero joins over the corpus, which is both the local win
    # (one broadcast instead of eight join stages) and the real ADC
    # implementation shape (a register-resident table indexed by code).
    # try_element_at per the engine's ANSI convention; every code was
    # produced from this codebook, so the lookup never actually misses.
    lut_row = lut.groupBy().agg(
        F.first("probe_id").alias("probe_id"),
        *[
            F.map_from_entries(
                F.collect_list(F.struct("cb_id", f"pd{s}"))
            ).alias(f"m{s}")
            for s in range(_PQ_SUB)
        ],
    )
    adc_dist = F.expr(
        " + ".join(f"try_element_at(m{s}, c{s})" for s in range(_PQ_SUB))
    )
    top = (
        codes.crossJoin(F.broadcast(lut_row))
        .filter(F.col("vec_id") != F.col("probe_id"))
        .select(
            F.col("vec_id").alias("neighbor_id"),
            adc_dist.alias("adc_dist"),
        )
        .orderBy("adc_dist", "neighbor_id")
        .limit(10)
        .withColumn(
            "rn", F.row_number().over(Window.orderBy("adc_dist", "neighbor_id"))
        )
    )
    exact = _sqdiff_sum_expr("q{}", "pq{}", 0, _EMBED_DIM)
    return (
        F.broadcast(top)
        .join(q, F.col("vec_id") == F.col("neighbor_id"))
        .crossJoin(F.broadcast(probe.drop("probe_id")))
        .select("neighbor_id", "adc_dist", exact.alias("exact_dist"), "rn")
        .orderBy("rn")
    )


# IVF-PQ cell count + full-vector distance fragment live in pq_common
# (leaf module; see its docstrings for the seed-spread rationale)
from .pq_common import _IVFPQ_NCELLS, _PQ_FULLDIST_SQL  # noqa: E402


def _sqdiff_sum_expr(l_tpl: str, r_tpl: str, lo: int, hi: int):
    """Exact BIGINT Σ (l_i - r_i)² over simple column names [lo, hi), as
    ONE parsed SQL string. Column-object trees cost a py4j round-trip
    per arithmetic node — ~200 calls for a 64-dim distance, measured
    ~0.7 s of DRIVER time per expression at r14 — while F.expr parses
    the identical AST (canonicalized analyzed plans equal, checked) in
    one call. Templates must expand to plain identifiers."""
    return F.expr(
        " + ".join(
            f"({l_tpl.format(i)} - {r_tpl.format(i)})"
            f" * ({l_tpl.format(i)} - {r_tpl.format(i)})"
            for i in range(lo, hi)
        )
    )


def _ivfpq_subdist(l_tpl: str, r_tpl: str, ss: int):
    """Exact BIGINT squared distance over one PQ subspace's columns."""
    return _sqdiff_sum_expr(
        l_tpl, r_tpl, ss * _PQ_SUBDIM, (ss + 1) * _PQ_SUBDIM
    )


def _ivfpq_fulldist(l_tpl: str, r_tpl: str):
    """Exact BIGINT squared distance over all 64 quantized columns."""
    return _sqdiff_sum_expr(l_tpl, r_tpl, 0, _EMBED_DIM)


def _ivfpq_quantize(e: DataFrame) -> DataFrame:
    """(vec_id, q0..q63): the int8-style round(x*100) BIGINT quantization.
    selectExpr (SQL bracket indexing is 0-based, same as getItem) keeps
    the 64-column projection a single parse instead of ~260 py4j
    Column-op round-trips — identical analyzed plan."""
    return e.selectExpr(
        "vec_id",
        *[
            f"CAST(ROUND(CAST(embedding[{i}] AS DOUBLE) * 100) AS BIGINT)"
            f" AS q{i}"
            for i in range(_EMBED_DIM)
        ],
    )


def _ivfpq_is_cb():
    # a function, not a module constant: Column construction needs an
    # active SparkContext, which import time does not guarantee
    return (F.col("vec_id") % 31 == 0) & (F.col("vec_id") < 496)


def _ivfpq_cb(q: DataFrame) -> DataFrame:
    """The deterministic 16-entry PQ codebook (similarity_pq_adc_topk's).
    One parsed projection — 64 aliased Column objects cost ~0.3 s of
    driver py4j per build (profiled r15), selectExpr parses the
    identical plan in one call."""
    return q.filter(_ivfpq_is_cb()).selectExpr(
        "vec_id AS cb_id",
        *[f"q{i} AS cq{i}" for i in range(_EMBED_DIM)],
    )


def _ivfpq_seeds(q: DataFrame) -> DataFrame:
    """The <=32 coarse-cell seeds: smallest md5(vec_id) — id-space-uniform
    (replicated-tier id remaps can't collapse the set), TakeOrdered."""
    return (
        q.withColumn("sh", F.md5(F.col("vec_id").cast("string")))
        .orderBy("sh", "vec_id")
        .limit(_IVFPQ_NCELLS)
        .selectExpr(
            "vec_id AS seed_id",
            *[f"q{i} AS sq{i}" for i in range(_EMBED_DIM)],
        )
    )


def _ivfpq_encode(q: DataFrame, cb: DataFrame, seeds: DataFrame) -> DataFrame:
    """(vec_id, c0..c7, cell): per-subspace argmin codes against the 16-row
    codebook + full-vector argmin cell against the <=32 seeds, in ONE
    broadcast crossJoin + ONE map-side-partial aggregation. The codebook
    and seed rows ride the same <=48-row broadcast, tagged; each argmin's
    ordering key sends the other tag's rows to +inf, so codebook rows can
    never win the cell and seed rows can never win a code — identical
    output to the two-pass formulation, one shuffle and no join fewer
    (the r13 profile put ~1.2 s of a micro-batch's encode in that extra
    job machinery)."""
    big = F.lit(1 << 62).cast("long")
    # parsed projections (r15 — see _ivfpq_cb)
    both = cb.selectExpr(
        "TRUE AS is_cb",
        "cb_id AS rid",
        *[f"cq{i} AS r{i}" for i in range(_EMBED_DIM)],
    ).unionByName(
        seeds.selectExpr(
            "FALSE AS is_cb",
            "seed_id AS rid",
            *[f"sq{i} AS r{i}" for i in range(_EMBED_DIM)],
        )
    )

    def only(tag_is_cb: bool, expr):
        cond = F.col("is_cb") if tag_is_cb else ~F.col("is_cb")
        return F.when(cond, expr).otherwise(big)

    return (
        q.crossJoin(F.broadcast(both))
        .groupBy("vec_id")
        .agg(
            *[
                F.min_by(
                    "rid",
                    F.struct(
                        only(True, _ivfpq_subdist("q{}", "r{}", s)),
                        only(True, F.col("rid")),
                    ),
                ).alias(f"c{s}")
                for s in range(_PQ_SUB)
            ],
            F.min_by(
                "rid",
                F.struct(
                    only(False, _ivfpq_fulldist("q{}", "r{}")),
                    only(False, F.col("rid")),
                ),
            ).alias("cell"),
        )
    )


_IVFPQ_CODES_SCHEMA = (
    "vec_id long, "
    + ", ".join(f"c{s} long" for s in range(_PQ_SUB))
    + ", cell long"
)


def _ivfpq_probe_of(q: DataFrame) -> DataFrame:
    """The deterministic probe row (first non-codebook vec_id), lazily
    checkpointed so every consumer of one probe frame shares a single
    corpus TakeOrdered execution."""
    return (
        q.filter(~_ivfpq_is_cb())
        .orderBy("vec_id")
        .limit(1)
        .selectExpr(
            "vec_id AS probe_id",
            *[f"q{i} AS pq{i}" for i in range(_EMBED_DIM)],
        )
    ).localCheckpoint(eager=False)


def _ivfpq_rank_phase(
    q: DataFrame,
    cb: DataFrame,
    seeds: DataFrame,
    codes: DataFrame,
    probe: DataFrame,
) -> DataFrame:
    """The DPP-pruned ADC top-10 over a (vec_id, c0..c7, cell) codes table
    WITHOUT the exact join-back: route the probe to its 2 nearest cells
    (the routing join keys on the partition column, so dynamic partition
    pruning reads only those cells' directories), ADC-rank via ONE
    broadcast LUT row of maps, TakeOrdered(10). Returns (neighbor_id,
    cell, adc_dist, rn). Split from the join-back (r16) so multi-version
    callers can union several versions' tops and attach exact distances
    with ONE corpus scan instead of one per version."""
    pcells = (
        seeds.crossJoin(F.broadcast(probe))
        .select(
            F.col("seed_id").alias("cell"),
            _ivfpq_fulldist("sq{}", "pq{}").alias("sd"),
        )
        .orderBy("sd", "cell")
        .limit(2)
        .select("cell")
    )
    cand = codes.join(F.broadcast(pcells), "cell")
    lut = cb.crossJoin(F.broadcast(probe)).select(
        "cb_id",
        "probe_id",
        *[_ivfpq_subdist("cq{}", "pq{}", s).alias(f"pd{s}") for s in range(_PQ_SUB)],
    )
    lut_row = lut.groupBy().agg(
        F.first("probe_id").alias("probe_id"),
        *[
            F.map_from_entries(
                F.collect_list(F.struct("cb_id", f"pd{s}"))
            ).alias(f"m{s}")
            for s in range(_PQ_SUB)
        ],
    )
    adc_dist = F.expr(
        " + ".join(f"try_element_at(m{s}, c{s})" for s in range(_PQ_SUB))
    )
    return (
        cand.crossJoin(F.broadcast(lut_row))
        .filter(F.col("vec_id") != F.col("probe_id"))
        .select(
            F.col("vec_id").alias("neighbor_id"),
            "cell",
            adc_dist.alias("adc_dist"),
        )
        .orderBy("adc_dist", "neighbor_id")
        .limit(10)
        .withColumn(
            "rn", F.row_number().over(Window.orderBy("adc_dist", "neighbor_id"))
        )
    )


def _ivfpq_attach_exact(
    q: DataFrame, probe: DataFrame, tops: DataFrame, lead_cols: list[str] = ()
) -> DataFrame:
    """Attach the winners' exact quantized distances by a broadcast
    join-back against the corpus — ONE scan of ``q`` however many ranked
    phases were unioned into ``tops``. ``lead_cols`` are pass-through
    tag columns (e.g. probe_version) emitted ahead of the ranking."""
    exact = _sqdiff_sum_expr("q{}", "pq{}", 0, _EMBED_DIM)
    return (
        F.broadcast(tops)
        .join(q, F.col("vec_id") == F.col("neighbor_id"))
        .crossJoin(F.broadcast(probe.drop("probe_id")))
        .select(
            *lead_cols,
            "neighbor_id",
            "cell",
            "adc_dist",
            exact.alias("exact_dist"),
            "rn",
        )
        .orderBy("rn")
    )


def _ivfpq_query_phase(
    q: DataFrame,
    cb: DataFrame,
    seeds: DataFrame,
    codes: DataFrame,
    probe: DataFrame | None = None,
) -> DataFrame:
    """Rank one codes version and attach exact distances (see
    _ivfpq_rank_phase / _ivfpq_attach_exact).

    ``probe`` may be passed in by callers that rank more than one codes
    version (time travel, delete rewrite, rebalance): the probe row is
    version-independent, so sharing one lazily-checkpointed frame across
    phases computes its corpus TakeOrdered once instead of per phase."""
    if probe is None:
        probe = _ivfpq_probe_of(q)
    return _ivfpq_attach_exact(
        q, probe, _ivfpq_rank_phase(q, cb, seeds, codes, probe)
    )


@query(
    "similarity_ivfpq_pruned_adc_topk",
    f"""
    -- IVF x PQ, both integer-exact: <=32 deterministic seed cells (the
    -- corpus vectors with smallest md5(vec_id) — id-space-uniform, so
    -- replicated-tier id remaps can't collapse the seed set onto copies
    -- of one base vector), full-vector BIGINT assignment with
    -- seed_id tie-break; the SAME deterministic 16-entry PQ codebook
    -- and per-subspace codes as similarity_pq_adc_topk; the query
    -- probes its 2 nearest cells and ADC-ranks ONLY their codes.
    WITH src AS (
      SELECT vec_id, {_PQ_Q_SQL} AS q
      FROM embeddings
      WHERE vec_id IS NOT NULL AND embedding IS NOT NULL
        AND len(embedding) = 64
    ),
    cb AS (
      SELECT vec_id AS cb_id, q FROM src
      WHERE vec_id % 31 = 0 AND vec_id < 496
    ),
    seeds AS (
      SELECT vec_id AS seed_id, q AS sq FROM (
        SELECT vec_id, q FROM src
        ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT {_IVFPQ_NCELLS}
      )
    ),
    probe AS (
      SELECT vec_id AS probe_id, q AS pq FROM src
      WHERE NOT (vec_id % 31 = 0 AND vec_id < 496)
      ORDER BY vec_id LIMIT 1
    ),
    sub AS (SELECT unnest(range(0, 8)) AS ss),
    asg AS (
      SELECT vec_id, cell FROM (
        SELECT s.vec_id, d.seed_id AS cell,
          ROW_NUMBER() OVER (PARTITION BY s.vec_id
            ORDER BY {_PQ_FULLDIST_SQL.format(l="s.q", r="d.sq")}, d.seed_id
          ) AS rn
        FROM src s CROSS JOIN seeds d
      ) t WHERE rn = 1
    ),
    pcells AS (
      SELECT cell FROM (
        SELECT d.seed_id AS cell,
          ROW_NUMBER() OVER (
            ORDER BY {_PQ_FULLDIST_SQL.format(l="p.pq", r="d.sq")}, d.seed_id
          ) AS rn
        FROM seeds d CROSS JOIN probe p
      ) t WHERE rn <= 2
    ),
    codes AS (
      SELECT vec_id, ss, cb_id FROM (
        SELECT s.vec_id, sub.ss, c.cb_id,
          ROW_NUMBER() OVER (PARTITION BY s.vec_id, sub.ss
            ORDER BY {_pq_subdist_sql("s.q", "c.q")}, c.cb_id) AS rn
        FROM src s CROSS JOIN cb c CROSS JOIN sub
      ) t WHERE rn = 1
    ),
    lut AS (
      SELECT c.cb_id, sub.ss,
        {_pq_subdist_sql("c.q", "p.pq")} AS pd
      FROM cb c CROSS JOIN probe p CROSS JOIN sub
    ),
    adc AS (
      SELECT codes.vec_id AS neighbor_id, a.cell,
        CAST(SUM(lut.pd) AS BIGINT) AS adc_dist
      FROM codes
      JOIN asg a ON a.vec_id = codes.vec_id
      JOIN pcells pc ON pc.cell = a.cell
      JOIN lut ON codes.ss = lut.ss AND codes.cb_id = lut.cb_id
      CROSS JOIN probe
      WHERE codes.vec_id <> probe.probe_id
      GROUP BY codes.vec_id, a.cell
    ),
    top AS (
      SELECT neighbor_id, cell, adc_dist,
        ROW_NUMBER() OVER (ORDER BY adc_dist, neighbor_id) AS rn
      FROM adc
    )
    SELECT t.neighbor_id, t.cell, t.adc_dist,
      CAST(list_sum(list_transform(range(1, 65), i ->
        (s.q[i] - p.pq[i]) * (s.q[i] - p.pq[i]))) AS BIGINT) AS exact_dist,
      t.rn
    FROM top t
    JOIN src s ON s.vec_id = t.neighbor_id
    CROSS JOIN probe p
    WHERE t.rn <= 10
    ORDER BY t.rn
    """,
    "similarity", "pipeline", "sketch", "incremental",
)
def similarity_ivfpq_pruned_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ — the composition production ANN systems actually deploy
    (Jégou et al., TPAMI 2011; FAISS's IVFPQ): a coarse inverted-file
    quantizer routes the query to a few cells, and product-quantization
    codes rank ONLY those cells' vectors. Both layers reuse this repo's
    hash-gate tricks: cells are <=32 DETERMINISTIC seed vectors — the
    corpus vectors with the smallest md5(vec_id), id-space-uniform so a
    replicated tier's id remap cannot collapse the seeds onto copies of
    one base embedding (probed r13: a lowest-ids rule put HALF the 2 M
    corpus in one cell) — with exact BIGINT full-vector assignment (the
    similarity_ivf_deterministic_seeds trick, integer-exact here), codes
    are the same deterministic 16-entry codebook + per-subspace argmin
    as similarity_pq_adc_topk — so assignment, routing, encoding, ADC
    ranking, and the winners' exact distances are ALL stated exactly by
    the DuckDB oracle.

    The Spark-native part: the persisted codes table is written
    PARTITIONED BY cell, so the inverted lists ARE hive partitions, and
    the probe's 2-cell routing joins the scan on the partition column —
    Catalyst's dynamic partition pruning turns "search two cells" into
    "read two directories" at FILE level (plan-gated). That is the IVF
    promise expressed in Spark's own storage machinery: at 2 M vectors
    the ADC pass reads ~6% of the codes, and at 100 TB the unprobed
    inverted lists are never opened. Cell count is FIXED (<=32), so
    lists grow with the corpus but the layout never fragments.

    Scale: index build is one broadcast pass against 16 codebook rows +
    one against <=32 seed rows (paid once, the sketch-family state
    discipline); the query phase is one broadcast LUT row + map lookups
    over the two probed partitions + TakeOrdered(10) + a 10-row exact
    join-back. Zero corpus shuffles after the build. Reference parity:
    the codes-with-cell table extends the persisted-metatable pattern
    (KijiFreshnessManager.java:235-239, mMetaTable.putValue) exactly as
    the PQ and sketch-shard stores do."""
    e = load_table(spark, sf_dir, "embeddings").filter(
        F.col("vec_id").isNotNull()
        & F.col("embedding").isNotNull()
        & (F.size("embedding") == _EMBED_DIM)
    )
    q = _ivfpq_quantize(e)
    cb = _ivfpq_cb(q)
    seeds = _ivfpq_seeds(q)
    codes = _ivfpq_codes_table(spark, sf_dir, q, cb, seeds)
    return _ivfpq_query_phase(q, cb, seeds, codes)


def _ivfpq_codes_table(
    spark: SparkSession, sf_dir: str, q: DataFrame, cb: DataFrame, seeds: DataFrame
) -> DataFrame:
    """The persisted cell-partitioned IVF-PQ codes table, built once per
    dataset (encode is deterministic, so every caller sees the same
    table whichever built it). Shared by the pruned-ADC probe and the
    embedding-drift freshness policy (r13 verdict #4)."""
    import os

    from .queries_graph import _state_path

    path = _state_path(sf_dir, "ivfpq_codes_embeddings.parquet")
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        _ivfpq_encode(q, cb, seeds).write.mode("overwrite").partitionBy(
            "cell"
        ).parquet(path)
    # explicit schema: (a) the hive partition column must read back as
    # LONG, not the inferred INT of its path strings; (b) an EMPTY corpus
    # writes a partitioned dir with no data files, which schema inference
    # cannot read but an explicit schema can (empty scan)
    return spark.read.schema(_IVFPQ_CODES_SCHEMA).parquet(path)


def _ivfpq_snap_adc_cte_sql() -> str:
    """The shared IVF-PQ oracle prelude (quantize → config → probe →
    assignment → routing → codes → LUT → per-candidate ADC distance),
    used by the snapshot-versioned index probes below. Identical math to
    similarity_ivfpq_pruned_adc_topk's oracle; kept as one fragment so
    the two version probes state their restriction as a one-line WHERE
    over the same `adc` relation."""
    return f"""
    WITH src AS (
      SELECT vec_id, {_PQ_Q_SQL} AS q
      FROM embeddings
      WHERE vec_id IS NOT NULL AND embedding IS NOT NULL
        AND len(embedding) = 64
    ),
    cb AS (
      SELECT vec_id AS cb_id, q FROM src
      WHERE vec_id % 31 = 0 AND vec_id < 496
    ),
    seeds AS (
      SELECT vec_id AS seed_id, q AS sq FROM (
        SELECT vec_id, q FROM src
        ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT {_IVFPQ_NCELLS}
      )
    ),
    probe AS (
      SELECT vec_id AS probe_id, q AS pq FROM src
      WHERE NOT (vec_id % 31 = 0 AND vec_id < 496)
      ORDER BY vec_id LIMIT 1
    ),
    sub AS (SELECT unnest(range(0, 8)) AS ss),
    asg AS (
      SELECT vec_id, cell FROM (
        SELECT s.vec_id, d.seed_id AS cell,
          ROW_NUMBER() OVER (PARTITION BY s.vec_id
            ORDER BY {_PQ_FULLDIST_SQL.format(l="s.q", r="d.sq")}, d.seed_id
          ) AS rn
        FROM src s CROSS JOIN seeds d
      ) t WHERE rn = 1
    ),
    pcells AS (
      SELECT cell FROM (
        SELECT d.seed_id AS cell,
          ROW_NUMBER() OVER (
            ORDER BY {_PQ_FULLDIST_SQL.format(l="p.pq", r="d.sq")}, d.seed_id
          ) AS rn
        FROM seeds d CROSS JOIN probe p
      ) t WHERE rn <= 2
    ),
    codes AS (
      SELECT vec_id, ss, cb_id FROM (
        SELECT s.vec_id, sub.ss, c.cb_id,
          ROW_NUMBER() OVER (PARTITION BY s.vec_id, sub.ss
            ORDER BY {_pq_subdist_sql("s.q", "c.q")}, c.cb_id) AS rn
        FROM src s CROSS JOIN cb c CROSS JOIN sub
      ) t WHERE rn = 1
    ),
    lut AS (
      SELECT c.cb_id, sub.ss,
        {_pq_subdist_sql("c.q", "p.pq")} AS pd
      FROM cb c CROSS JOIN probe p CROSS JOIN sub
    ),
    adc AS (
      SELECT codes.vec_id AS neighbor_id, a.cell,
        CAST(SUM(lut.pd) AS BIGINT) AS adc_dist
      FROM codes
      JOIN asg a ON a.vec_id = codes.vec_id
      JOIN pcells pc ON pc.cell = a.cell
      JOIN lut ON codes.ss = lut.ss AND codes.cb_id = lut.cb_id
      CROSS JOIN probe
      WHERE codes.vec_id <> probe.probe_id
      GROUP BY codes.vec_id, a.cell
    )"""


_IVFPQ_SNAP_EXACT_SQL = (
    "CAST(list_sum(list_transform(range(1, 65), i -> "
    "(s.q[i] - p.pq[i]) * (s.q[i] - p.pq[i]))) AS BIGINT)"
)


def _ivfpq_snap_build_base(spark, path, q, cb, seeds) -> None:
    """Build the snapshot-versioned IVF-PQ lineage FROM SCRATCH: v1..v3
    append the three pmod(vec_id,3) ingest tranches' codes (encode runs
    once; the tranche filters slice one lazily-checkpointed frame), v4
    is the partition-preserving compaction. Shared by the time-travel
    probe and the delete rewrite so the lineage shape can't diverge.
    Callers own the rebuild guard; anything less than a complete base
    is a crashed prior build and is purged first."""
    import shutil

    from .operators.snapshots import commit_snapshot, compact_snapshot

    shutil.rmtree(path, ignore_errors=True)
    enc = _ivfpq_encode(q, cb, seeds).localCheckpoint(eager=False)
    for r in range(3):
        commit_snapshot(
            enc.filter(F.pmod(F.col("vec_id"), F.lit(3)) == r),
            path,
            mode="append",
            partition_by=["cell"],
        )
    compact_snapshot(spark, path, 8, partition_by=["cell"])


def _ivfpq_snap_codes_at(spark, path, version: int) -> DataFrame:
    """Explicit-schema snapshot read of a codes version: `cell` keeps
    its declared LONG type (no path-inference cast), no footer-merge
    reads, and the single-dir post-compaction version stays DPP-able."""
    from .operators.snapshots import read_snapshot

    return read_snapshot(spark, path, version, schema=_IVFPQ_CODES_SCHEMA)


@query(
    "ann_index_time_travel_probe",
    _ivfpq_snap_adc_cte_sql()
    + f""",
    top_v2 AS (
      SELECT neighbor_id, cell, adc_dist,
        ROW_NUMBER() OVER (ORDER BY adc_dist, neighbor_id) AS rn
      FROM adc WHERE neighbor_id % 3 < 2
    ),
    top_latest AS (
      SELECT neighbor_id, cell, adc_dist,
        ROW_NUMBER() OVER (ORDER BY adc_dist, neighbor_id) AS rn
      FROM adc
    )
    -- v2 of the snapshot lineage holds ONLY ingest tranches vec_id%3 in
    -- (0, 1); "latest" is the post-compaction v4. The latest block IS
    -- the compaction-zero-effect proof: the oracle ranks the one-shot
    -- FULL corpus, so any row compaction lost or changed hash-fails.
    SELECT 'v2' AS probe_version, t.neighbor_id, t.cell, t.adc_dist,
      {_IVFPQ_SNAP_EXACT_SQL} AS exact_dist, t.rn
    FROM top_v2 t JOIN src s ON s.vec_id = t.neighbor_id CROSS JOIN probe p
    WHERE t.rn <= 10
    UNION ALL
    SELECT 'latest' AS probe_version, t.neighbor_id, t.cell, t.adc_dist,
      {_IVFPQ_SNAP_EXACT_SQL} AS exact_dist, t.rn
    FROM top_latest t JOIN src s ON s.vec_id = t.neighbor_id CROSS JOIN probe p
    WHERE t.rn <= 10
    ORDER BY probe_version DESC, rn
    """,
    "similarity", "pipeline", "snapshot", "incremental",
)
def ann_index_time_travel_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot-VERSIONED ANN index (r13 verdict #3): the IVF-PQ inverted
    lists live in the manifest table format (operators/snapshots.py)
    instead of a bare partitioned dir, so index ingest inherits the same
    guarantees as data tables — ATOMIC commit per ingest batch (a probe
    never sees a half-written list), TIME TRAVEL ("as of version N" —
    the index analog of snapshot_time_travel_orders), and COMPACTION
    (the small files N ingest batches leave inside each cell rewritten
    into one file per cell WITHOUT changing any answer, and without the
    layout flattening: compact_snapshot(partition_by=['cell']) keeps the
    inverted lists hive-partitioned through the rewrite).

    Lineage built here: v1..v3 append the three vec_id%3 ingest
    tranches' codes (encode runs ONCE; the tranche filters slice one
    lazily-checkpointed frame), v4 compacts. The probe then answers
    AS-OF v2 — only tranches 0 and 1 existed — and at latest (v4); the
    latest block's hash gate doubles as the compaction-zero-effect
    proof (the oracle ranks the one-shot full corpus, so any row the
    rewrite lost or changed fails the hash). Encode is per-vector
    deterministic, so every version's answer is stated exactly by the
    oracle restricting the one-shot corpus to that version's tranches.

    Scale: version reads are manifest-named closed file-sets (no dir
    listing races with ingest); the as-of read costs the SAME pruned
    probe as latest — time travel is free because appended dirs are
    immutable. Compaction bounds the per-cell file count however many
    ingest batches have landed — the maintenance pass that keeps a
    100 TB streaming-built index scannable — and old versions stay
    readable until vacuum. Reference parity: the metatable's versioned
    derived artifacts (KijiFreshnessManager.java:235-239) with real
    table-format semantics."""
    import os
    from .operators.snapshots import latest_version
    from .queries_graph import _state_path

    e = load_table(spark, sf_dir, "embeddings").filter(
        F.col("vec_id").isNotNull()
        & F.col("embedding").isNotNull()
        & (F.size("embedding") == _EMBED_DIM)
    )
    q = _ivfpq_quantize(e)
    cb = _ivfpq_cb(q)
    seeds = _ivfpq_seeds(q)

    path = _state_path(sf_dir, "ivfpq_codes_snap")
    if (latest_version(path) or 0) < 4:
        # a complete lineage is v1..v3 appends + v4 compact; anything
        # less is a crashed prior build — rebuild deterministically
        _ivfpq_snap_build_base(spark, path, q, cb, seeds)

    def codes_at(version: int) -> DataFrame:
        return _ivfpq_snap_codes_at(spark, path, version)

    # compaction's zero-logical-effect needs no third probe: the
    # oracle's latest block ranks the one-shot FULL corpus, so the
    # hash gate on the post-compaction (v4) probe IS the proof that the
    # rewrite lost/changed nothing (content equality across the rewrite
    # is additionally pinned by tests/test_snapshots.py's partitioned-
    # compaction case). The ADC plan's ~4 s driver-side construction
    # cost per probe (profiled r14) makes a redundant probe expensive.
    # r15: the version-independent probe/codebook/seed frames are shared
    # (lazy localCheckpoint) so the two phases execute their corpus
    # TakeOrdered/filters once, not per version probed.
    # r16: the phases rank WITHOUT the exact join-back, the tagged tops
    # union, and ONE broadcast join-back attaches exact distances — one
    # corpus scan per invocation instead of one per version probed.
    cb = cb.localCheckpoint(eager=False)
    seeds = seeds.localCheckpoint(eager=False)
    probe = _ivfpq_probe_of(q)
    t2 = _ivfpq_rank_phase(q, cb, seeds, codes_at(2), probe)
    t4 = _ivfpq_rank_phase(q, cb, seeds, codes_at(4), probe)
    tops = t2.select(F.lit("v2").alias("probe_version"), "*").unionByName(
        t4.select(F.lit("latest").alias("probe_version"), "*")
    )
    return _ivfpq_attach_exact(
        q, probe, tops, lead_cols=["probe_version"]
    ).orderBy(F.col("probe_version").desc(), "rn")


@query(
    "ann_index_delete_rewrite",
    _ivfpq_snap_adc_cte_sql()
    + f""",
    top_full AS (
      SELECT neighbor_id, cell, adc_dist,
        ROW_NUMBER() OVER (ORDER BY adc_dist, neighbor_id) AS rn
      FROM adc
    ),
    -- the kill list: the full index's current top-3 (the sharpest
    -- possible deletion test — every killed id WOULD be returned)
    kill AS (SELECT neighbor_id FROM top_full WHERE rn <= 3),
    top_post AS (
      SELECT neighbor_id, cell, adc_dist,
        ROW_NUMBER() OVER (ORDER BY adc_dist, neighbor_id) AS rn
      FROM adc WHERE neighbor_id NOT IN (SELECT neighbor_id FROM kill)
    )
    SELECT 'pre' AS phase, t.neighbor_id, t.cell, t.adc_dist,
      {_IVFPQ_SNAP_EXACT_SQL} AS exact_dist, t.rn,
      TRUE AS deleted_absent
    FROM top_full t JOIN src s ON s.vec_id = t.neighbor_id CROSS JOIN probe p
    WHERE t.rn <= 10
    UNION ALL
    SELECT 'post' AS phase, t.neighbor_id, t.cell, t.adc_dist,
      {_IVFPQ_SNAP_EXACT_SQL} AS exact_dist, t.rn,
      TRUE AS deleted_absent
    FROM top_post t JOIN src s ON s.vec_id = t.neighbor_id CROSS JOIN probe p
    WHERE t.rn <= 10
    ORDER BY phase DESC, rn
    """,
    "similarity", "pipeline", "snapshot", "incremental",
)
def ann_index_delete_rewrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN-index DELETES (r13 verdict #8): a real 100 TB pipeline also
    RETIRES vectors — dedup kills, takedowns — and this expresses the
    retirement as a snapshot commit that rewrites ONLY the affected
    cell partitions (operators/snapshots.py replace_partitions): the
    new version's manifest carries the parent dirs tagged with
    partition-level tombstones (readers PRUNE the replaced cells'
    directories, never scan-and-drop) plus one new dir holding the
    affected cells' survivors. Work is O(affected partitions); the
    other 30 inverted lists' files are never opened, let alone
    rewritten; pre-delete versions stay readable (takedown audit), and
    the retired bytes are physically reclaimed by compact-then-vacuum
    (pinned in tests/test_snapshots.py).

    The deletion test is the sharpest one: the kill list is the full
    index's CURRENT top-3 — every killed id would be returned by the
    probe — and the post-delete probe must return none of them, with
    the next-best candidates promoted into ranks 1..10. Both phases are
    stated exactly by the oracle (rank over the one-shot ADC relation,
    with and without the kill set), and the Spark side adds an in-plan
    anti-join flag. The kill ids cross the driver once at BUILD time
    (3 rows, the avro-probe O(1)-collect precedent) — the probe plans
    themselves stay fully distributed.

    Reference parity: the policy-driven record retirement the reference
    expresses as producer writes over stale cells
    (KijiFreshnessPolicy.java:56-66 deciding, producers rewriting),
    here applied to a derived index artifact with table-format
    history."""
    from .operators.snapshots import (
        commit_snapshot,
        latest_version,
        replace_partitions,
    )
    from .queries_graph import _state_path

    e = load_table(spark, sf_dir, "embeddings").filter(
        F.col("vec_id").isNotNull()
        & F.col("embedding").isNotNull()
        & (F.size("embedding") == _EMBED_DIM)
    )
    q = _ivfpq_quantize(e)
    cb = _ivfpq_cb(q)
    seeds = _ivfpq_seeds(q)

    path = _state_path(sf_dir, "ivfpq_codes_snap_del")

    def codes_at(version: int) -> DataFrame:
        return _ivfpq_snap_codes_at(spark, path, version)

    if (latest_version(path) or 0) < 5:
        # complete lineage: v1..v3 tranche appends + v4 compact (the
        # shared base), then v5 delete
        _ivfpq_snap_build_base(spark, path, q, cb, seeds)
        # kill = the live index's top-3: 3 rows cross the driver, once
        kills = (
            _ivfpq_query_phase(q, cb, seeds, codes_at(4))
            .filter(F.col("rn") <= 3)
            .select("neighbor_id", "cell")
            .collect()
        )
        if kills:
            killed_ids = sorted(int(r.neighbor_id) for r in kills)
            cells = sorted({int(r.cell) for r in kills})
            survivors = (
                codes_at(4)
                .filter(F.col("cell").isin(cells))
                .filter(~F.col("vec_id").isin(killed_ids))
            )
            replace_partitions(survivors, path, "cell", cells)
        else:
            # degenerate corpus (empty regime / too few vectors to
            # probe): nothing to retire — v5 is an explicit empty
            # append so the lineage shape (probe-at-v5) is invariant
            commit_snapshot(
                codes_at(4).limit(0),
                path,
                mode="append",
                partition_by=["cell"],
            )

    # both probe results are consumed twice (output union; kill/absence
    # checks) — lazy localCheckpoint executes each ONCE; the probe/cb/
    # seed frames are shared across the two phases (r15 — see
    # ann_index_time_travel_probe)
    cb = cb.localCheckpoint(eager=False)
    seeds = seeds.localCheckpoint(eager=False)
    probe = _ivfpq_probe_of(q)
    # r16 (the time-travel probe's restructure): checkpoint the RANKED
    # tops (each consumed twice — output union AND the kill/absence
    # check), union them tagged, and attach exact distances with ONE
    # corpus join-back instead of one per phase.
    pre = _ivfpq_rank_phase(q, cb, seeds, codes_at(4), probe).localCheckpoint(
        eager=False
    )
    post = _ivfpq_rank_phase(q, cb, seeds, codes_at(5), probe).localCheckpoint(
        eager=False
    )
    killed = pre.filter(F.col("rn") <= 3).select(
        F.col("neighbor_id").alias("killed_id")
    )
    absent = (
        post.join(
            F.broadcast(killed),
            post["neighbor_id"] == killed["killed_id"],
            "left_semi",
        )
        .agg((F.count(F.lit(1)) == 0).alias("deleted_absent"))
    )
    tops = pre.select(F.lit("pre").alias("phase"), "*").unionByName(
        post.select(F.lit("post").alias("phase"), "*")
    )
    return (
        _ivfpq_attach_exact(q, probe, tops, lead_cols=["phase"])
        .crossJoin(F.broadcast(absent))
        .orderBy(F.col("phase").desc(), "rn")
    )


#: id offset for the rebalance query's synthetic skew tranche — far above
#: any corpus vec_id at any tier (sf100 remaps to ~2e9), so clone ids can
#: never collide with real ones
_IVF_CLONE_OFFSET = 1_000_000_000_000


def _ivf_cell_stats(codes: DataFrame) -> DataFrame:
    """(cell, n_rows, is_hot) for an inverted-list codes table: per-cell
    row counts plus the hot flag (n_rows > 4 x the lower-median cell
    count) — the maintenance view that tells an IVF index its lists have
    skewed. The 4x trigger is deliberate HYSTERESIS against the split's
    ~2x-or-better outcome: a list must bloat well past what one
    mass-directed split achieves before maintenance fires again, so the
    rebalance cannot oscillate. The median window runs over ONE row per
    cell (<= NCELLS + a few split cells forever, by construction), so
    the single-task sort is bounded at any corpus size."""
    counts = codes.groupBy("cell").agg(F.count(F.lit(1)).alias("n_rows"))
    med = (
        counts.withColumn(
            "__rn", F.row_number().over(Window.orderBy("n_rows", "cell"))
        )
        .withColumn("__n", F.count(F.lit(1)).over(Window.partitionBy()))
        .filter(F.col("__rn") == F.expr("(__n + 1) DIV 2"))
        .select(F.col("n_rows").alias("__med"))
    )
    return counts.crossJoin(F.broadcast(med)).select(
        "cell",
        "n_rows",
        (F.col("n_rows") > 4 * F.col("__med")).alias("is_hot"),
    )


#: max sub-cells a hot list splits into — absorbs up to ~16x-median skew
#: in one maintenance pass while keeping the routing fanout bounded
_IVF_SPLIT_MAX = 8


def _ivf_rebalance_hot_cells(
    spark: SparkSession, path: str, vectors: DataFrame, seeds: DataFrame
) -> list[int]:
    """Split every HOT inverted list (> 4x median rows, the hysteresis
    trigger _ivf_cell_stats flags) of the snapshot codes table at
    `path` into up to _IVF_SPLIT_MAX sub-cells, committed
    as ONE copy-on-write partition rewrite. The split is MASS-DIRECTED,
    which is what a skewed ingest needs: sub-seeds are one
    representative per DISTINCT member vector (replicated corpora make
    duplicate masses routine, and identical vectors are irreducible —
    they must land in one sub-cell together), ranked heaviest duplicate
    group first (then md5 for determinism; current seed ids rank last so
    a fresh member wins when one exists and a degenerate all-seed cell
    still gets a sub-seed rather than losing rows). Members are
    reassigned to their nearest sub-seed by exact BIGINT full-vector
    distance (tie: smaller sub-seed id), so each heavy duplicate group
    becomes its own list at distance 0. New cell ids are the sub-seed
    vec_ids, consistent with the cell-=-seed-id convention, so a caller
    updates its routing seed set to (seeds - hot) + sub-seed vectors.

    Scale: the stats pass is a groupBy over the codes table; the rewrite
    reads ONLY the hot cells' directories (partition-pruned), joins them
    to the corpus vectors on vec_id (O(hot rows) shuffle), picks
    representatives with one (cell, vector) groupBy and ranks them via
    the two-stage _grouped_top_k (never a full-cell single-task sort),
    and the commit is O(hot partitions) — the other lists' files are
    never opened. The hot cell ids cross the driver once (<= NCELLS
    rows, the delete query's O(1)-collect precedent) because they
    parameterize the commit itself. Returns the replaced (hot) cell
    ids, empty if the index is balanced."""
    from .operators.snapshots import read_snapshot, replace_partitions
    from .queries_graph import _grouped_top_k

    codes = read_snapshot(spark, path, schema=_IVFPQ_CODES_SCHEMA)
    hot = [
        int(r.cell)
        for r in _ivf_cell_stats(codes).filter("is_hot").select("cell").collect()
    ]
    if not hot:
        return []
    members = (
        codes.filter(F.col("cell").isin(hot))
        .join(vectors, "vec_id")
        .join(
            F.broadcast(seeds.select(F.col("seed_id").alias("__sid"))),
            F.col("vec_id") == F.col("__sid"),
            "left",
        )
        .withColumn("__is_seed", F.col("__sid").isNotNull().cast("int"))
        .drop("__sid")
    )
    # one representative per distinct member vector: the member with the
    # smallest (seed-flag digit || md5) — a string key because both
    # engines arg-min strings identically; md5 is fixed-width hex so the
    # concatenation is order-equivalent to the (flag, md5) pair
    rep_key = F.concat(
        F.col("__is_seed").cast("string"),
        F.md5(F.col("vec_id").cast("string")),
    )
    reps = (
        members.withColumn(
            "__qarr",
            F.expr("array(" + ",".join(f"q{i}" for i in range(_EMBED_DIM)) + ")"),
        )
        .groupBy("cell", "__qarr")
        .agg(
            F.min_by("vec_id", rep_key).alias("sub_id"),
            F.count(F.lit(1)).alias("__n_dup"),
            F.min("__is_seed").alias("__rep_seed"),
        )
    )
    subs = _grouped_top_k(
        reps.withColumn("__sh", F.md5(F.col("sub_id").cast("string"))),
        ["cell"],
        [
            F.col("__rep_seed").asc(),
            F.col("__n_dup").desc(),
            F.col("__sh").asc(),
            F.col("sub_id").asc(),
        ],
        _IVF_SPLIT_MAX,
        "__srank",
    ).selectExpr(
        "cell",
        "sub_id",
        *[f"element_at(__qarr, {i + 1}) AS ssq{i}" for i in range(_EMBED_DIM)],
    )
    dist = _ivfpq_fulldist("q{}", "ssq{}")
    new_rows = (
        members.join(F.broadcast(subs), "cell")
        .groupBy("vec_id")
        .agg(
            *[F.first(f"c{s}").alias(f"c{s}") for s in range(_PQ_SUB)],
            F.min_by("sub_id", F.struct(dist, F.col("sub_id"))).alias("cell"),
        )
        .select("vec_id", *[f"c{s}" for s in range(_PQ_SUB)], "cell")
    )
    replace_partitions(new_rows, path, "cell", hot)
    return hot


def _ivf_rebalance_oracle() -> str:
    fulldist_seed = _PQ_FULLDIST_SQL.format(l="a.q", r="d.sq")
    fulldist_sub = _PQ_FULLDIST_SQL.format(l="m.q", r="s2.ssq")
    return f"""
    -- IVF cell HEALTH, stated one-shot: assign the corpus plus a skew
    -- tranche (clones of the rank-1 seed's vector, jittered on dim 1)
    -- to the 32 deterministic cells, flag lists > 4x the lower-median
    -- count as hot (hysteresis: one mass-directed split lands well
    -- under the trigger, so maintenance cannot oscillate), split each
    -- hot list among up to 8 of its distinct-vector representatives
    -- (heaviest duplicate group first), and restate the per-cell
    -- counts. The post phase's is_hot column IS the restored-balance
    -- claim: every row false means no list exceeds the trigger after
    -- the split.
    WITH src AS (
      SELECT vec_id, {_PQ_Q_SQL} AS q
      FROM embeddings
      WHERE vec_id IS NOT NULL AND embedding IS NOT NULL
        AND len(embedding) = 64
    ),
    seeds AS (
      SELECT vec_id AS seed_id, q AS sq FROM (
        SELECT vec_id, q FROM src
        ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT {_IVFPQ_NCELLS}
      )
    ),
    seed0 AS (
      SELECT seed_id, sq FROM (
        SELECT seed_id, sq,
          ROW_NUMBER() OVER (
            ORDER BY md5(CAST(seed_id AS VARCHAR)), seed_id) AS rn
        FROM seeds
      ) t WHERE rn = 1
    ),
    clones AS (
      SELECT s.vec_id + {_IVF_CLONE_OFFSET} AS vec_id,
        list_transform(range(1, 65), i ->
          z.sq[i] + CASE WHEN i = 1
                         THEN ((s.vec_id % 5) + 5) % 5 ELSE 0 END) AS q
      FROM src s CROSS JOIN seed0 z
      WHERE ((s.vec_id % 4) + 4) % 4 = 1
    ),
    allv AS (
      SELECT vec_id, q FROM src UNION ALL SELECT vec_id, q FROM clones
    ),
    -- assignment via narrow two-phase arg-min, NOT a window over the
    -- cross product: a ROW_NUMBER whose input rows carry two 64-element
    -- lists materializes ~100 bytes/term x |corpus| x 32 in the sort
    -- (OOM-killed at the 200 K-vector tier); projecting (vec_id,
    -- seed_id, dist) first keeps the aggregated relation 3 BIGINTs wide
    -- and the whole assignment a hash agg. Tie-break identical to
    -- ORDER BY dist, seed_id: min seed_id among the min-dist rows.
    dists AS (
      SELECT a.vec_id, d.seed_id, {fulldist_seed} AS dd
      FROM allv a CROSS JOIN seeds d
    ),
    best AS (SELECT vec_id, MIN(dd) AS mind FROM dists GROUP BY vec_id),
    asg AS (
      SELECT d.vec_id, MIN(d.seed_id) AS cell
      FROM dists d JOIN best b ON b.vec_id = d.vec_id AND d.dd = b.mind
      GROUP BY d.vec_id
    ),
    pre AS (SELECT cell, COUNT(*) AS n_rows FROM asg GROUP BY cell),
    pre_med AS (
      SELECT n_rows AS m FROM (
        SELECT n_rows,
          ROW_NUMBER() OVER (ORDER BY n_rows, cell) AS rn,
          COUNT(*) OVER () AS n
        FROM pre
      ) t WHERE rn = (n + 1) // 2
    ),
    hot AS (
      SELECT cell FROM pre WHERE n_rows > 4 * (SELECT m FROM pre_med)
    ),
    members AS (
      SELECT g.vec_id, g.cell, v.q,
        CAST(g.vec_id IN (SELECT seed_id FROM seeds) AS INT) AS is_seed
      FROM asg g
      JOIN allv v ON v.vec_id = g.vec_id
      JOIN hot h ON h.cell = g.cell
    ),
    reps AS (
      -- one representative per DISTINCT member vector (identical
      -- vectors are irreducible and must stay together); the heaviest
      -- duplicate groups become the sub-seeds
      SELECT cell, q AS ssq,
        arg_min(vec_id,
          CAST(is_seed AS VARCHAR) || md5(CAST(vec_id AS VARCHAR))
        ) AS sub_id,
        COUNT(*) AS n_dup,
        MIN(is_seed) AS rep_seed
      FROM members GROUP BY cell, q
    ),
    subseeds AS (
      SELECT cell, sub_id, ssq FROM (
        SELECT r.cell, r.sub_id, r.ssq,
          ROW_NUMBER() OVER (PARTITION BY r.cell
            ORDER BY r.rep_seed, r.n_dup DESC,
                     md5(CAST(r.sub_id AS VARCHAR)), r.sub_id
          ) AS rn
        FROM reps r
      ) t WHERE rn <= {_IVF_SPLIT_MAX}
    ),
    -- same narrow two-phase arg-min as the assignment above
    sub_dists AS (
      SELECT m.vec_id, s2.sub_id, {fulldist_sub} AS dd
      FROM members m JOIN subseeds s2 ON s2.cell = m.cell
    ),
    sub_best AS (
      SELECT vec_id, MIN(dd) AS mind FROM sub_dists GROUP BY vec_id
    ),
    reasg AS (
      SELECT d.vec_id, MIN(d.sub_id) AS new_cell
      FROM sub_dists d JOIN sub_best b
        ON b.vec_id = d.vec_id AND d.dd = b.mind
      GROUP BY d.vec_id
    ),
    post AS (
      SELECT p.cell, p.n_rows FROM pre p
      WHERE p.cell NOT IN (SELECT cell FROM hot)
      UNION ALL
      SELECT new_cell AS cell, COUNT(*) AS n_rows
      FROM reasg GROUP BY new_cell
    ),
    post_med AS (
      SELECT n_rows AS m FROM (
        SELECT n_rows,
          ROW_NUMBER() OVER (ORDER BY n_rows, cell) AS rn,
          COUNT(*) OVER () AS n
        FROM post
      ) t WHERE rn = (n + 1) // 2
    )
    SELECT * FROM (
      SELECT 'pre' AS phase, cell, n_rows,
        n_rows > 4 * (SELECT m FROM pre_med) AS is_hot
      FROM pre
      UNION ALL
      SELECT 'post' AS phase, cell, n_rows,
        n_rows > 4 * (SELECT m FROM post_med) AS is_hot
      FROM post
    ) ORDER BY phase DESC, cell
    """


@query(
    "ann_ivf_cell_rebalance_stats",
    _ivf_rebalance_oracle(),
    "similarity", "pipeline", "snapshot", "maintenance",
)
def ann_ivf_cell_rebalance_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF cell HEALTH after skewed ingest (r14 verdict #6): streaming
    ingest and partition deletes can skew the inverted lists over time —
    a hot cell grows until the probed-fraction guarantee degrades (every
    probe routed near it reads the bloated list). This query runs the
    maintenance loop end-to-end on the snapshot-format index:

    v1 commits the corpus codes cell-partitioned; v2 appends a SKEWED
    ingest tranche (clones of the rank-1 seed's vector with a small
    deterministic jitter, ids offset far past any real vec_id — every
    clone routes to that seed's cell, bloating it to ~8x the median);
    the cell-stats view flags lists > 4x the lower-median count
    (hysteresis against re-triggering on a freshly split list); v3
    REBALANCES every hot list — split mass-directed among up to 8 of
    its distinct-vector representatives (heaviest duplicate group
    first; identical vectors are irreducible and stay together), each
    member reassigned to its nearest sub-seed by exact BIGINT distance
    — committed as ONE copy-on-write partition rewrite
    (_ivf_rebalance_hot_cells): the other 31 lists' files are never
    opened, pre-rebalance versions stay readable, and the probe's seed
    set updates to (seeds - hot) + sub-seeds. Output is the per-cell
    stats of v2 ('pre', hot flags up) and v3 ('post', all flags down
    where the mass is divisible — the restored-balance claim inside
    the hash gate).

    The recall/probed-fraction restoration is pinned by
    tests/test_ivf_rebalance.py (probe through the updated seed set).

    Scale: stats are one groupBy per phase plus a <= 34-row median
    window; the rewrite is O(hot rows); the hot ids cross the driver
    once (<= 32 rows, the delete query's precedent). Reference parity:
    the scheduled maintenance the reference runs as RereadTask timers
    (InternalFreshKijiTableReader.java:211-221), applied to a derived
    index artifact."""
    import shutil

    from .operators.snapshots import commit_snapshot, latest_version
    from .queries_graph import _state_path

    path = _state_path(sf_dir, "ivfpq_codes_rebalance")
    if (latest_version(path) or 0) < 3:
        # the whole encode preamble (quantize, codebook, seeds, the skew
        # clones, their checkpoint analysis — ~1.2 s of driver build,
        # profiled r16) is only needed when the lineage must be BUILT;
        # the steady-state probe reads versions 2 and 3 from the
        # snapshot table alone
        e = load_table(spark, sf_dir, "embeddings").filter(
            F.col("vec_id").isNotNull()
            & F.col("embedding").isNotNull()
            & (F.size("embedding") == _EMBED_DIM)
        )
        q = _ivfpq_quantize(e)
        cb = _ivfpq_cb(q)
        seeds = _ivfpq_seeds(q)
        seed0 = (
            seeds.withColumn("__sh", F.md5(F.col("seed_id").cast("string")))
            .orderBy("__sh", "seed_id")
            .limit(1)
            .drop("__sh")
        )
        clone_q = (
            q.filter(F.pmod(F.col("vec_id"), F.lit(4)) == 1)
            .select("vec_id")
            .crossJoin(F.broadcast(seed0))
            .selectExpr(
                f"vec_id + {_IVF_CLONE_OFFSET}L AS vec_id",
                "sq0 + pmod(vec_id, 5) AS q0",
                *[f"sq{i} AS q{i}" for i in range(1, _EMBED_DIM)],
            )
        )
        allv = q.unionByName(clone_q).localCheckpoint(eager=False)
        shutil.rmtree(path, ignore_errors=True)
        enc = _ivfpq_encode(allv, cb, seeds).localCheckpoint(eager=False)
        commit_snapshot(
            enc.filter(F.col("vec_id") < _IVF_CLONE_OFFSET),
            path,
            mode="append",
            partition_by=["cell"],
        )
        commit_snapshot(
            enc.filter(F.col("vec_id") >= _IVF_CLONE_OFFSET),
            path,
            mode="append",
            partition_by=["cell"],
        )
        if not _ivf_rebalance_hot_cells(spark, path, allv, seeds):
            # degenerate corpus (empty regime): nothing hot — v3 is an
            # explicit empty append so the lineage shape is invariant
            commit_snapshot(
                _ivfpq_snap_codes_at(spark, path, 2).limit(0),
                path,
                mode="append",
                partition_by=["cell"],
            )

    pre = _ivf_cell_stats(_ivfpq_snap_codes_at(spark, path, 2))
    post = _ivf_cell_stats(_ivfpq_snap_codes_at(spark, path, 3))
    return (
        pre.select(F.lit("pre").alias("phase"), "*")
        .unionByName(post.select(F.lit("post").alias("phase"), "*"))
        .orderBy(F.col("phase").desc(), "cell")
    )
