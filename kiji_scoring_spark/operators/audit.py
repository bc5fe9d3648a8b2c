"""Zero-pass pipeline audit metrics (§2.G pipeline hygiene).

A 100 TB corpus job cannot afford a second scan just to report "rows in,
rows dropped, bytes kept" — and a driver-side ``count()`` per stage is
exactly that second scan. Spark's ``Observation`` API attaches named
aggregate metrics to a point IN the existing plan: they are accumulated
by the tasks that execute the action anyway, cost nothing extra, and are
readable on the driver after the action completes.

``observe_stage`` wraps the pattern; ``audit_counts`` is the common
instance (row count + sum of a size column per stage). The reference's
analog is its per-request freshness metering
(``InternalFreshKijiTableReader.java`` timeout bookkeeping) — here the
bookkeeping rides the batch plan instead of a request loop.

Contract note: observed metrics materialize only after an ACTION runs on
the returned DataFrame, and reflect the rows that flowed past the
observe point in that action's execution (read ``Observation.get`` once;
it blocks until available).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Observation
from pyspark.sql import functions as F


def observe_stage(
    df: DataFrame, name: str, metrics: dict[str, Column]
) -> tuple[DataFrame, Observation]:
    """Attach named aggregate ``metrics`` at this point in the plan.
    Returns (same-shaped DataFrame, Observation to read after an action).
    """
    obs = Observation(name)
    observed = df.observe(obs, *[c.alias(n) for n, c in metrics.items()])
    return observed, obs


def audit_counts(
    df: DataFrame, name: str, size_col: str | None = None
) -> tuple[DataFrame, Observation]:
    """The standard per-stage audit: row count (+ total of ``size_col``)."""
    metrics: dict[str, Column] = {"n_rows": F.count(F.lit(1))}
    if size_col is not None:
        metrics["total_size"] = F.sum(F.col(size_col).cast("long"))
    return observe_stage(df, name, metrics)
