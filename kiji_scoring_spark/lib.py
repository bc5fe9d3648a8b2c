"""Stock policy/producer implementations — the analog of the reference's
``org.kiji.scoring.lib`` package. Registry-loadable by dotted name (A17)."""

from __future__ import annotations

from pyspark.sql import functions as F

from . import model
from .producers import ExpressionProducer


class DoubleLatestValueProducer(ExpressionProducer):
    """Example scoring model: score = 2 × most-recent value of the
    attached versioned column ``value_versions``. Used by the
    fresh-batch-scoring query and tests."""

    def __init__(self):
        super().__init__(
            lambda df: model.most_recent_value("value_versions") * 2,
            data_request=["value:versions"],
            output_column="value:versions",
        )


class IncrementLatestValueProducer(ExpressionProducer):
    """The demo's counter producer shape (TestFreshnessDemo.java:85-97):
    score = most-recent value + 1."""

    def __init__(self):
        super().__init__(
            lambda df: model.most_recent_value("value_versions") + 1,
            data_request=["value:versions"],
            output_column="value:versions",
        )


class ConstantProducer(ExpressionProducer):
    """TestProducer analog: writes a constant."""

    value = "new-val"

    def __init__(self):
        super().__init__(
            lambda df: F.lit(self.value),
            data_request=[],
            output_column=None,
        )
