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


class DriftRescoreProducer(ExpressionProducer):
    """Companion producer to ``policies.EmbeddingDrift``: the new score
    IS the measured drift (the PQ reconstruction distance between the
    entity's current embedding and its stored codes), cast to double —
    the A7 freshen pass the drift policy drives. An entity whose drift
    is NULL (no stored codes reachable by the expression) produces
    NULL, so the A10 partial-freshening invariant keeps its old cell."""

    def __init__(self):
        from .pq_common import pq_drift_expr

        super().__init__(
            lambda df: pq_drift_expr(
                "emb_q", model.most_recent_value("codes_versions"), "cb_map"
            ).cast("double"),
            data_request=["emb:q", "codes:versions", "cb:map"],
            output_column="score:versions",
        )
