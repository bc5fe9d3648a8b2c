"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query; ``queries()`` /
``oracle_sql()`` expose the engine's full declared operator inventory
(SURVEY.md §2) for the duckdb correctness gate. All real logic lives in
``kiji_scoring_spark`` — this module only adapts it to the driver API.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from kiji_scoring_spark.queries import QUERIES  # noqa: E402
from kiji_scoring_spark.session import tune_existing  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    tune_existing(spark)
    return QUERIES["q1_pricing_summary"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""

    def bind(name):
        spec = QUERIES[name]

        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            tune_existing(spark)
            return spec.fn(spark, sf_dir)

        run.__name__ = name
        return run

    return {name: bind(name) for name in QUERIES}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL mirror for each oracle-checkable query."""
    return {name: spec.oracle for name, spec in QUERIES.items() if spec.oracle}
