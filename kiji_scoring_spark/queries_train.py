"""Training-corpus preparation operators (SURVEY §2.G tail): benchmark-
contamination detection, repetition-based quality flags, concat-and-chunk
sequence packing, and contiguous ID assignment without a global sort.

These are the corpus-hygiene steps a 100 TB pretraining pipeline runs
between raw ingestion and tokenization. Every query follows the registry
parity rules: engine-portable md5 hashing, integer arithmetic for
threshold flags (no float comparisons at decision boundaries), and
deterministic orderings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .operators.dedup import _shingles_of_words
from .queries import query
from .sources import load_table

#: DuckDB mirror of operators.dedup shingling (3-word shingles)
_SHINGLE_SQL = (
    "list_distinct(list_transform(generate_series(1, len(w)-2), "
    "i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))"
)


@query(
    "contamination_ngram_overlap",
    f"""
    WITH sh AS (
      SELECT doc_id, {_SHINGLE_SQL} AS sh
      FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
    ), eval_sh AS (
      SELECT DISTINCT unnest(sh) AS s FROM sh WHERE doc_id < 25
    ), train AS (
      SELECT doc_id, sh FROM sh WHERE doc_id >= 25 AND len(sh) > 0
    ), hits AS (
      SELECT t.doc_id, count(*) AS n_shared
      FROM (SELECT doc_id, unnest(sh) AS s FROM train) t
      JOIN eval_sh e ON t.s = e.s
      GROUP BY t.doc_id
    )
    SELECT tr.doc_id,
      len(tr.sh) AS n_shingles,
      COALESCE(h.n_shared, 0) AS n_shared,
      CAST(COALESCE(h.n_shared, 0) AS DOUBLE) / len(tr.sh) AS overlap_ratio,
      COALESCE(h.n_shared, 0) * 5 >= len(tr.sh) AS contaminated
    FROM train tr LEFT JOIN hits h USING (doc_id)
    ORDER BY doc_id
    """,
    "pipeline", "dedup", "contamination",
)
def contamination_ngram_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-contamination check: for every training document, the
    fraction of its distinct 3-word shingles that also occur in the
    held-out evaluation set (here: doc_id < 25 stands in for a benchmark
    corpus). Docs sharing >= 20% of their shingles are flagged — the
    n-gram-overlap decontamination step every serious pretraining corpus
    runs against its eval benchmarks.

    Scale: SINGLE PASS over the training corpus — the eval side is
    benchmark-sized (thousands of docs vs billions), so its
    distinct-shingle set BROADCASTS into a LEFT join against the
    exploded training shingles; n_shared is the count of non-null probe
    hits and n_shingles the per-doc row count (the shingle array is
    distinct, so exploded cardinality IS the total), which means
    zero-overlap docs survive with no second scan and no totals re-join
    — the obvious inner-join + join-back shape re-executes the whole
    shingle pipeline twice, which is what kills a 100 TB scan (locally
    the double-scan is ~20% faster because everything is page-cached;
    that trade inverts when the corpus doesn't fit in memory). One
    groupBy(doc_id) shuffle total, partial-aggregated map-side. The
    contamination flag is integer arithmetic (n_shared*5 >= n_shingles)
    — engines cannot disagree on a float threshold."""
    d = load_table(spark, sf_dir, "documents")
    sh = d.select(
        "doc_id", F.split(F.col("text"), " ").alias("w")
    ).select(
        "doc_id",
        F.array_distinct(_shingles_of_words(F.col("w"), 3)).alias("sh"),
    )
    eval_sh = (
        sh.filter(F.col("doc_id") < 25)
        .select(F.explode("sh").alias("s"))
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    train = sh.filter((F.col("doc_id") >= 25) & (F.size("sh") > 0))
    return (
        train.select("doc_id", F.explode("sh").alias("s"))
        .join(F.broadcast(eval_sh), "s", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.count("hit").alias("n_shared"),
        )
        .select(
            "doc_id",
            "n_shingles",
            "n_shared",
            (F.col("n_shared").cast("double") / F.col("n_shingles")).alias(
                "overlap_ratio"
            ),
            (F.col("n_shared") * 5 >= F.col("n_shingles")).alias("contaminated"),
        )
        .orderBy("doc_id")
    )


@query(
    "quality_repetition_flags",
    """
    WITH wc AS (
      SELECT doc_id, w, count(*) AS cnt
      FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents)
      GROUP BY doc_id, w
    )
    SELECT doc_id,
      CAST(SUM(cnt) AS BIGINT) AS n_tokens,
      COUNT(*) AS n_distinct,
      MAX(cnt) AS top_word_count,
      CAST(MAX(cnt) AS DOUBLE) / CAST(SUM(cnt) AS BIGINT) AS top_word_ratio,
      CAST(COUNT(*) AS DOUBLE) / CAST(SUM(cnt) AS BIGINT) AS distinct_ratio,
      MAX(cnt) * 10 >= SUM(cnt) OR COUNT(*) * 3 < SUM(cnt) AS repetitive
    FROM wc GROUP BY doc_id ORDER BY doc_id
    """,
    "pipeline", "text", "quality",
)
def quality_repetition_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition quality signals: per-document token count,
    distinct-token count, most-frequent-token share, and a repetitive
    flag (top token >= 10% of all tokens, or fewer than 1 distinct token
    per 3 tokens). Repetition filters are the highest-yield quality rule
    in published corpus-cleaning recipes (Gopher/MassiveText, RefinedWeb).

    Scale: ONE exchange, moving one compact row per document — the
    repartition(doc_id) runs BEFORE the explode (Generate preserves its
    child's partitioning), so the shuffle carries document rows, not a
    row per token; HashPartitioning(doc_id) then satisfies both the
    (doc_id, word) rollup's clustering (subset rule) and the outer
    groupBy(doc_id). Letting the first groupBy pick its own two-key
    partitioning instead costs a second shuffle (verified 2 → 1).
    Flags use integer cross-multiplication, never float thresholds."""
    d = load_table(spark, sf_dir, "documents")
    wc = (
        d.select("doc_id", "text")
        .repartition("doc_id")
        .select("doc_id", F.explode(F.split("text", " ")).alias("w"))
        .groupBy("doc_id", "w")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return (
        wc.groupBy("doc_id")
        .agg(
            F.sum("cnt").alias("n_tokens"),
            F.count(F.lit(1)).alias("n_distinct"),
            F.max("cnt").alias("top_word_count"),
        )
        .select(
            "doc_id",
            "n_tokens",
            "n_distinct",
            "top_word_count",
            (F.col("top_word_count").cast("double") / F.col("n_tokens")).alias(
                "top_word_ratio"
            ),
            (F.col("n_distinct").cast("double") / F.col("n_tokens")).alias(
                "distinct_ratio"
            ),
            (
                (F.col("top_word_count") * 10 >= F.col("n_tokens"))
                | (F.col("n_distinct") * 3 < F.col("n_tokens"))
            ).alias("repetitive"),
        )
        .orderBy("doc_id")
    )


@query(
    "pack_sequences_token_budget",
    """
    WITH t AS (
      SELECT doc_id, source, len(string_split(text, ' ')) AS n_tokens
      FROM documents
    ), placed AS (
      SELECT doc_id, source, n_tokens,
        CAST(SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                                 ROWS UNBOUNDED PRECEDING) - n_tokens
             AS BIGINT) AS token_start
      FROM t
    )
    SELECT doc_id, source, n_tokens, token_start,
      CAST(floor(token_start / 256.0) AS BIGINT) AS seq_id
    FROM placed ORDER BY source, doc_id
    """,
    "pipeline", "window", "packing",
)
def pack_sequences_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-chunk sequence packing: documents are laid out as one
    contiguous token stream per source (running token offset via a window
    cumsum), and each doc is assigned the 256-token training sequence its
    first token lands in — the packing layout used when pretraining
    batches are built by concatenation + fixed-length chunking.

    Scale: one shuffle on the stream key (source) and a linear
    running-sum window — state is a single long per stream, no buffering
    of rows. At 100 TB the stream key would be (source, shard) to bound
    any one window's length; the offset arithmetic is unchanged because
    the cumsum is per-stream either way. All-integer math."""
    d = load_table(spark, sf_dir, "documents")
    t = d.select(
        "doc_id", "source", F.size(F.split("text", " ")).alias("n_tokens")
    )
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        t.withColumn("token_start", F.sum("n_tokens").over(w) - F.col("n_tokens"))
        .withColumn(
            "seq_id", F.floor(F.col("token_start") / F.lit(256.0)).cast("bigint")
        )
        .orderBy("source", "doc_id")
    )


@query(
    "ids_contiguous_no_global_sort",
    """
    SELECT doc_id, n_chars,
      ROW_NUMBER() OVER (ORDER BY n_chars, doc_id) - 1 AS global_id
    FROM documents ORDER BY global_id
    """,
    "pipeline", "window", "ids",
)
def ids_contiguous_no_global_sort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contiguous 0-based IDs in (n_chars, doc_id) order WITHOUT a global
    single-partition sort — the standard two-pass trick for assigning
    example IDs to a 100 TB corpus:

    1. rows are bucketed by static ranges of the leading sort key
       (``n_chars // 16`` — data-independent, no sampling pass);
    2. per-bucket counts (a tiny aggregate) become cumulative offsets via
       a window over the bucket table, which BROADCASTS back;
    3. each row's id = bucket offset + (row_number within its bucket) - 1.

    The oracle is the naive ``ROW_NUMBER() OVER (ORDER BY ...)``, which
    plans as a 1-partition sort in any engine — correct but the exact
    thing that cannot run at scale. Here the only data-sized movement is
    one shuffle on the bucket key; within-bucket sorting is distributed.
    Skewed buckets (many equal-length docs) are the documented trade-off
    — at scale, widen the bucket key with more sort-key prefix bytes."""
    d = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    b = d.withColumn("bucket", F.floor(F.col("n_chars") / F.lit(16)))
    counts = b.groupBy("bucket").agg(F.count(F.lit(1)).alias("n"))
    offsets = counts.select(
        "bucket",
        (
            F.sum("n").over(
                Window.orderBy("bucket").rowsBetween(
                    Window.unboundedPreceding, Window.currentRow
                )
            )
            - F.col("n")
        ).alias("offset"),
    )
    rn = F.row_number().over(
        Window.partitionBy("bucket").orderBy("n_chars", "doc_id")
    )
    return (
        b.join(F.broadcast(offsets), "bucket")
        .select(
            "doc_id",
            "n_chars",
            (F.col("offset") + rn - 1).alias("global_id"),
        )
        .orderBy("global_id")
    )
