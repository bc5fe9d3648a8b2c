"""Skew-mitigation operators (SURVEY §4.3): salting for hot keys.

AQE's skew-join splitting handles most skew at runtime, but two cases
still need explicit salting at 100 TB:

- **Aggregation skew**: one group key holds a large share of all rows
  (e.g. a default/null key). AQE cannot split a single hash-aggregate
  group, so the partial aggregate for that key lands on one task. Salting
  splits the group into n sub-groups, aggregates partially per sub-group,
  then combines — both phases are algebraic, so results are identical.
- **Join skew with non-broadcastable sides**: replicate the small side n
  times (one copy per salt) and route each big-side row to one replica by
  a deterministic hash. Never needed when the small side broadcasts —
  prefer ``F.broadcast`` first.

All salts are deterministic (``xxhash64`` of a stable column), so salted
plans produce byte-identical results to their unsalted equivalents — the
oracle-parity suite checks exactly that.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: supported algebraic aggregates: (partial expr, final-combine expr)
_ALGEBRAIC = {
    "sum": (F.sum, F.sum),
    "count": (F.count, F.sum),
    "min": (F.min, F.min),
    "max": (F.max, F.max),
}


def salt_column(src: Column, n_salts: int) -> Column:
    """Deterministic salt in [0, n_salts) from a stable column."""
    return F.pmod(F.xxhash64(src), F.lit(n_salts)).cast("int")


def salted_groupby_agg(
    df: DataFrame,
    group_keys: list[str],
    aggs: list[tuple[str, str, str]],
    salt_src: str,
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase salted aggregation.

    ``aggs`` is a list of (fn, column, alias) with fn in sum/count/min/max.
    Phase 1 aggregates on (group_keys + salt) — the hot key's rows spread
    over ``n_salts`` tasks; phase 2 combines the ≤ n_salts partial rows
    per key. Identical results to a plain groupBy for algebraic functions.
    """
    salted = df.withColumn("__salt__", salt_column(F.col(salt_src), n_salts))
    partials = [
        _ALGEBRAIC[fn][0](col).alias(f"__p_{alias}__") for fn, col, alias in aggs
    ]
    finals = [
        _ALGEBRAIC[fn][1](f"__p_{alias}__").alias(alias) for fn, _, alias in aggs
    ]
    return (
        salted.groupBy(*group_keys, "__salt__")
        .agg(*partials)
        .groupBy(*group_keys)
        .agg(*finals)
    )


def salted_replicate_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salt_src: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skewed equi-join: replicate ``small`` once per salt and route each
    ``big`` row to one replica by a deterministic hash of ``salt_src``.

    The join key becomes (key, salt), so a hot key's rows shuffle to
    ``n_salts`` reducers instead of one. Results are identical to
    ``big.join(small, key, how)`` for inner/left joins (each big row still
    matches exactly the same small rows). Only for non-broadcastable small
    sides — broadcast beats salting when it fits.
    """
    replicas = small.withColumn(
        "__salt__", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)).cast("array<int>"))
    )
    salted_big = big.withColumn("__salt__", salt_column(F.col(salt_src), n_salts))
    return salted_big.join(replicas, [key, "__salt__"], how).drop("__salt__")
