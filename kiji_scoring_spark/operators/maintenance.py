"""Table-maintenance primitives (SURVEY §2.C round-5 deepening): CDC
apply-changes and checksum-bucketed anti-entropy diff — the batch
generalization of the reference's newest-write-wins producer contract
(impl/KijiFreshProducerContext.java:90-131) and the reconciliation
shape a replicated 100 TB table needs. Exact by construction; driven
by queries_graph.py under the DuckDB hash gate and by hypothesis
property tests against pure-Python references."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def apply_changes(
    changelog: DataFrame,
    keys: list[str],
    seq: str,
    is_delete: Column,
    payload: list[str],
    keep_tombstones: bool = False,
) -> DataFrame:
    """Collapse a changelog into current table state: per key, the
    highest-`seq` change wins; keys whose winning change satisfies
    `is_delete` vanish. Returns keys + payload + last_seq + n_changes
    (+ is_deleted when keep_tombstones).

    Out-of-order safe — correctness comes only from the per-key rank
    over seq DESC, never from input order. The tombstone filter runs
    strictly AFTER rank-1 selection: a delete that outranks an earlier
    upsert must erase the key, not resurrect the upsert. One exchange
    on the key serves both window functions (rank + change count share
    the partition spec).

    keep_tombstones=True retains the winning delete rows (flagged
    `is_deleted`) instead of dropping them. A PERSISTED state that will
    absorb future deltas MUST keep tombstones: if the state forgets
    that key k's latest change at seq=100 was a delete, a late-arriving
    upsert for k at seq=90 in the next batch would wrongly resurrect
    the row. With tombstones, folding batches one at a time is exactly
    equivalent to applying the full changelog at once (winner-of-
    winners under a total seq order) — the property
    tests/test_properties_graph.py checks on random changelogs. Filter
    `is_deleted` only when serving the current view."""
    by_key = Window.partitionBy(*keys)
    ranked = (
        changelog.withColumn("__del", is_delete)
        .withColumn("rn", F.row_number().over(by_key.orderBy(F.desc(seq))))
        .withColumn("n_changes", F.count(F.lit(1)).over(by_key))
        .filter(F.col("rn") == 1)
    )
    if keep_tombstones:
        return ranked.select(
            *keys,
            *payload,
            F.col(seq).alias("last_seq"),
            "n_changes",
            F.col("__del").alias("is_deleted"),
        )
    return ranked.filter(~F.col("__del")).select(
        *keys,
        *payload,
        F.col(seq).alias("last_seq"),
        "n_changes",
    )


def checksum_diff(
    base: DataFrame,
    new: DataFrame,
    key: str,
    canon_cols: list[str],
    n_buckets: int = 256,
) -> DataFrame:
    """Anti-entropy diff of two table versions without a full row-level
    comparison: (1) each side computes one (count, 48-bit-md5-sum)
    checksum per key bucket — map-side, order-independent, one
    n_buckets-row shuffle; (2) buckets whose checksums agree are proven
    identical (modulo a deterministic 2^-48 sum collision) and never
    row-compared; (3) only disagreeing buckets are row-diffed via a
    broadcast semi-join on the changed-bucket set. Returns
    (key, change 'D'|'U'|'I', old_<c>, new_<c> for each canon col).

    `canon_cols` must serialize portably (integers/strings — not raw
    DOUBLEs; follow table_checksum_by_nation's integer-cents rule)."""

    def checksums(df: DataFrame) -> DataFrame:
        canon = F.concat_ws(
            "|", F.col(key).cast("string"), *[F.col(c).cast("string") for c in canon_cols]
        )
        rh = F.conv(F.substring(F.md5(canon), 1, 12), 16, 10).cast("bigint")
        return (
            df.withColumn("bkt", F.col(key) % n_buckets)
            .groupBy("bkt")
            .agg(F.count(F.lit(1)).alias("n"), F.sum(rh).alias("ck"))
        )

    cb = checksums(base).withColumnsRenamed({"n": "n_b", "ck": "ck_b"})
    cn = checksums(new).withColumnsRenamed({"n": "n_n", "ck": "ck_n"})
    changed = (
        cb.join(cn, on="bkt", how="full_outer")
        .filter(
            ~F.col("n_b").eqNullSafe(F.col("n_n"))
            | ~F.col("ck_b").eqNullSafe(F.col("ck_n"))
        )
        .select("bkt")
    )

    def in_changed(df: DataFrame, prefix: str, marker: str) -> DataFrame:
        # explicit presence marker: canon columns may legitimately be NULL,
        # so D/I classification must not infer presence from their nullness
        return (
            df.withColumn("bkt", F.col(key) % n_buckets)
            .join(F.broadcast(changed), on="bkt", how="semi")
            .select(
                key,
                *[F.col(c).alias(f"{prefix}{c}") for c in canon_cols],
                F.lit(True).alias(marker),
            )
        )

    b = in_changed(base, "old_", "__in_b")
    n = in_changed(new, "new_", "__in_n")
    any_diff = None
    for c in canon_cols:
        d = ~F.col(f"old_{c}").eqNullSafe(F.col(f"new_{c}"))
        any_diff = d if any_diff is None else (any_diff | d)
    any_diff = (
        any_diff | F.col("__in_b").isNull() | F.col("__in_n").isNull()
    )
    return (
        b.join(n, on=key, how="full_outer")
        .filter(any_diff)
        .select(
            key,
            F.when(F.col("__in_n").isNull(), F.lit("D"))
            .when(F.col("__in_b").isNull(), F.lit("I"))
            .otherwise(F.lit("U"))
            .alias("change"),
            *[F.col(f"old_{c}") for c in canon_cols],
            *[F.col(f"new_{c}") for c in canon_cols],
        )
    )
