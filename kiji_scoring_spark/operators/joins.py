"""Join operators Spark lacks as single primitives (SURVEY §2.C "Joins").

The as-of join is the reference's versioned-read semantics (latest version
with ts <= requested time, ``KijiDataRequest.withTimeRange`` +
maxVersions=1) expressed as a join between two tables instead of within one
versioned column.

Scale design notes:

- ``asof_join`` = equi-join on keys + inequality on time + windowed
  row_number()==1 per left ROW (the caller's ``left_id``, or — fallback —
  a deterministic distinct-then-re-expand plan over the full left column
  set; duplicate left rows each keep their own match either way). The
  equi-key join shuffles
  both sides once on the key; the per-row window adds one narrow exchange
  on the id. Skewed keys are handled by AQE skew-join on the join, and
  the per-(left-row) window state is bounded by matches per key.
- For dense right sides (many versions per key), prefer
  ``asof_join_union`` which avoids the join blow-up entirely: union both
  sides tagged, single window sort per key, then filter — O(n log n) per
  key instead of O(left × right-matches).
- ``range_join`` is a plain conditional join; at scale bucket both sides
  by a coarsened time bucket first so the theta predicate only applies
  within a bucket (classic interval-bucketing — turns the cross product
  into an equi-join on bucket).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    direction: str = "backward",
    suffix: str = "_right",
    left_id: str | None = None,
    right_tiebreak: list[str] | None = None,
) -> DataFrame:
    """For each left row, attach the single right row with the same keys
    and the greatest ``right_ts`` <= ``left_ts`` (direction='backward'; use
    'forward' for the smallest right_ts >= left_ts). Unmatched left rows
    keep NULLs (left-outer semantics).

    ``right_tiebreak`` names columns that totalize the right-side order
    when ``right_ts`` can tie (e.g. a unique event id): without it, two
    right rows at the same timestamp are picked partition-order-
    dependently — nondeterministic across runs and engines. Pass it
    whenever right_ts is not unique per key.

    ``left_id`` names a column that uniquely identifies left rows; when
    given, the per-row window partitions on it directly — the cheapest
    plan (one narrow window key, no extra shuffle). Without it the
    fallback is DETERMINISTIC (r7 — the old ``monotonically_increasing_id``
    path, nondeterministic under stage retries, is retired): duplicate
    left rows are collapsed by a map-side-combinable ``groupBy`` over the
    full left column set, the as-of match runs once per DISTINCT left row
    (window partitioned on the full column set — exact, no hash-collision
    caveat), and each match is re-expanded by the duplicate count. Same
    multiset answer as per-row semantics, deterministic under any retry,
    at the cost of one extra left-side exchange — pass ``left_id`` on
    wide schemas to avoid it.

    Fallback preconditions (the groupBy makes left columns GROUPING
    keys): MapType columns are not groupable — such a left side raises
    ``TypeError`` here with instructions to pass ``left_id`` (loud and
    immediate, instead of Spark's AnalysisException at plan time); and
    Spark normalizes ``-0.0`` to ``0.0`` and collapses NaN payload
    duplicates in grouping keys, so a left side relying on the
    ``-0.0``/``0.0`` distinction should also pass ``left_id``.
    """
    if left_id is not None:
        # caller-supplied unique key: deterministic under retry, pushdown-safe
        lalias = left.withColumn("__lid__", F.col(left_id)).alias("__l__")
        part_cols = [F.col("__l__.__lid__")]
        dup_expand = False
    else:
        from pyspark.sql.types import MapType

        maps = [f.name for f in left.schema.fields if isinstance(f.dataType, MapType)]
        if maps:
            raise TypeError(
                f"asof_join without left_id cannot group left MapType "
                f"column(s) {maps}; pass left_id=<unique key column>"
            )
        lalias = (
            left.groupBy(*left.columns)
            .agg(F.count(F.lit(1)).alias("__dupk__"))
            .alias("__l__")
        )
        part_cols = [F.col(f"__l__.{c}") for c in left.columns]
        dup_expand = True
    ralias = right.alias("__r__")
    keys = [F.col(f"__l__.{k}") == F.col(f"__r__.{k}") for k in on]
    tb = right_tiebreak or []
    if direction == "backward":
        cond = F.col(f"__r__.{right_ts}") <= F.col(f"__l__.{left_ts}")
        order = [F.col(f"__r__.{right_ts}").desc()] + [
            F.col(f"__r__.{c}").desc() for c in tb
        ]
    elif direction == "forward":
        cond = F.col(f"__r__.{right_ts}") >= F.col(f"__l__.{left_ts}")
        order = [F.col(f"__r__.{right_ts}").asc()] + [
            F.col(f"__r__.{c}").asc() for c in tb
        ]
    else:
        raise ValueError(f"unknown direction {direction!r}")

    joined = lalias.join(ralias, functools_reduce_and(keys) & cond, "left")
    left_cols = [F.col(f"__l__.{c}") for c in left.columns]
    right_cols = [
        F.col(f"__r__.{c}").alias(c + suffix if c in left.columns else c)
        for c in right.columns
        if c not in on
    ]
    w = Window.partitionBy(*part_cols).orderBy(*order)
    # rank right matches per left row; rows with no match survive (rn==1
    # over a single all-NULL match row)
    best = joined.withColumn("__rn__", F.row_number().over(w)).filter(
        F.col("__rn__") == 1
    )
    if dup_expand:
        # restore per-row multiplicity: each distinct left row's single best
        # match fans back out to its original duplicate count
        best = best.withColumn(
            "__dup__", F.explode(F.sequence(F.lit(1), F.col("__l__.__dupk__")))
        )
    return best.select(*left_cols, *right_cols)


def functools_reduce_and(conds: list[Column]) -> Column:
    out = conds[0]
    for c in conds[1:]:
        out = out & c
    return out


def asof_join_union(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    suffix: str = "_right",
    tiebreak: list[str] | None = None,
) -> DataFrame:
    """Backward as-of via union + last_value window — the scale path for
    dense right sides: no join blow-up, one shuffle, one sort per key.

    Right rows become carriers of their value columns; left rows pick up
    the latest non-null carried value at or before their timestamp.
    Right timestamps sort before left at equal instants (asof ties include
    the equal-ts right row). ``tiebreak`` columns (right side) make the
    winner among equal-ts right rows deterministic (highest wins).
    """
    tiebreak = tiebreak or []
    # ONE struct carries all value columns: carrying them independently
    # with last(ignorenulls) would let a NULL value on the winning right
    # row be silently replaced by an OLDER non-null value while the other
    # columns come from the winner — tearing one logical row into a
    # chimera. The struct is non-null whenever a right row exists, so the
    # winner's fields (nulls included) travel together.
    lt = left.select(
        *on,
        F.col(left_ts).alias("__ts__"),
        F.lit(1).alias("__is_left__"),
        F.lit(None)
        .cast(
            "struct<"
            + ",".join(
                f"`{c}`:{right.schema[c].dataType.simpleString()}"
                for c in value_cols
            )
            + ">"
        )
        .alias("__pack__"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__t_{c}__") for c in tiebreak],
        F.struct(*left.columns).alias("__row__"),
    )
    rt = right.select(
        *on,
        F.col(right_ts).alias("__ts__"),
        F.lit(0).alias("__is_left__"),
        F.struct(*[F.col(c).alias(c) for c in value_cols]).alias("__pack__"),
        *[F.col(c).alias(f"__t_{c}__") for c in tiebreak],
        F.lit(None).cast(lt.schema["__row__"].dataType).alias("__row__"),
    )
    unioned = lt.unionByName(rt)
    w = (
        Window.partitionBy(*on)
        .orderBy(
            F.col("__ts__").asc(),
            F.col("__is_left__").asc(),
            *[F.col(f"__t_{c}__").asc_nulls_first() for c in tiebreak],
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        "__is_left__",
        "__row__",
        F.last("__pack__", ignorenulls=True).over(w).alias("__c__"),
    )
    out_cols = [F.col("__row__")[c].alias(c) for c in left.columns]
    out_cols += [
        F.col("__c__")[c].alias(c + suffix if c in left.columns else c)
        for c in value_cols
    ]
    return carried.filter(F.col("__is_left__") == 1).select(*out_cols)


def range_join_bucketed(
    left: DataFrame,
    right: DataFrame,
    on: list[str] | None,
    left_ts: str,
    right_lo: str,
    right_hi: str,
    bucket_width: int,
) -> DataFrame:
    """The scale path for ``range_join`` when there is no (or a
    low-selectivity) equi-key: coarsen time into ``bucket_width``-sized
    buckets, explode each right interval into every bucket it covers, and
    equi-join on (keys…, bucket) with the exact interval predicate as a
    residual — the classic interval-bucketing rewrite that turns a
    near-cross-product theta join into a hash join.

    Correctness: a left row's single bucket is covered by the right
    interval iff the interval overlaps it, so each qualifying pair meets
    in EXACTLY one bucket — no dedup needed. Inner-join semantics only.
    Choose ``bucket_width`` ≈ the median interval length: wider wastes
    residual comparisons, narrower multiplies the right side's explode
    fan-out (fan-out = interval_len / width, so total right rows stay
    bounded by Σ len/width).
    ``left_ts``/``right_lo``/``right_hi`` must be numeric (epoch ms).
    """
    lb = left.withColumn("__bkt__", F.floor(F.col(left_ts) / bucket_width))
    rb = right.filter(F.col(right_hi) > F.col(right_lo)).withColumn(
        "__bkt__",
        F.explode(
            F.sequence(
                F.floor(F.col(right_lo) / bucket_width),
                F.floor((F.col(right_hi) - 1) / bucket_width),
            )
        ),
    )
    keys = (on or []) + ["__bkt__"]
    cond = (F.col(f"__l__.{left_ts}") >= F.col(f"__r__.{right_lo}")) & (
        F.col(f"__l__.{left_ts}") < F.col(f"__r__.{right_hi}")
    )
    lalias, ralias = lb.alias("__l__"), rb.alias("__r__")
    eq = functools_reduce_and(
        [F.col(f"__l__.{k}") == F.col(f"__r__.{k}") for k in keys]
    )
    joined = lalias.join(ralias, eq & cond, "inner")
    cols = [F.col(f"__l__.{c}") for c in left.columns] + [
        F.col(f"__r__.{c}") for c in right.columns if not on or c not in on
    ]
    return joined.select(*cols)


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str] | None,
    left_ts: str,
    right_lo: str,
    right_hi: str,
    how: str = "inner",
) -> DataFrame:
    """Interval join: left.ts ∈ [right.lo, right.hi). Equi-keys (if any)
    keep it an equi-join with a residual predicate — no cross product."""
    cond = (F.col(f"__l__.{left_ts}") >= F.col(f"__r__.{right_lo}")) & (
        F.col(f"__l__.{left_ts}") < F.col(f"__r__.{right_hi}")
    )
    lalias, ralias = left.alias("__l__"), right.alias("__r__")
    if on:
        cond = functools_reduce_and(
            [F.col(f"__l__.{k}") == F.col(f"__r__.{k}") for k in on]
        ) & cond
    joined = lalias.join(ralias, cond, how)
    cols = [F.col(f"__l__.{c}") for c in left.columns] + [
        F.col(f"__r__.{c}") for c in right.columns if not on or c not in on
    ]
    return joined.select(*cols)
