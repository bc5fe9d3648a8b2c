"""Observation-based audit metrics (operators/audit.py): per-stage
counters must ride the existing action — no extra scan — and match an
independent recomputation exactly."""

from pyspark.sql import functions as F

from kiji_scoring_spark.operators.audit import audit_counts, observe_stage
from kiji_scoring_spark.sources import load_table


def test_stage_metrics_match_recomputation(spark, sf_dir):
    """A two-stage filter pipeline with an observe point per stage: the
    metrics reported by the single action equal what dedicated queries
    compute, stage by stage."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")

    staged_in, obs_in = audit_counts(docs, "ingest", size_col="n_chars")
    kept = staged_in.filter(F.col("n_chars") >= 200)
    staged_kept, obs_kept = audit_counts(kept, "kept", size_col="n_chars")
    result = staged_kept.filter(F.col("lang") == "en")

    n_result = result.count()  # the ONE action; both observe points ride it

    want_in = docs.agg(
        F.count(F.lit(1)).alias("n"), F.sum("n_chars").alias("s")
    ).first()
    want_kept = docs.filter(F.col("n_chars") >= 200).agg(
        F.count(F.lit(1)).alias("n"), F.sum("n_chars").alias("s")
    ).first()

    assert obs_in.get["n_rows"] == want_in["n"]
    assert obs_in.get["total_size"] == want_in["s"]
    assert obs_kept.get["n_rows"] == want_kept["n"]
    assert obs_kept.get["total_size"] == want_kept["s"]
    assert n_result <= want_kept["n"]


def test_observe_stage_custom_metrics(spark, sf_dir):
    """Arbitrary aggregate metrics (distinct-ish via approx, min/max) at
    one observe point."""
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id")
    observed, obs = observe_stage(
        ev,
        "events_profile",
        {
            "n": F.count(F.lit(1)),
            "min_id": F.min("event_id"),
            "max_id": F.max("event_id"),
        },
    )
    total = observed.count()
    got = obs.get
    assert got["n"] == total
    want = ev.agg(F.min("event_id"), F.max("event_id")).first()
    assert (got["min_id"], got["max_id"]) == (want[0], want[1])
