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


#: Queries whose IMPLEMENTATION or ORACLE changed this round: their last
#: green driver row was earned by the OLD code, so they must jump the LRU
#: queue and re-verify under the new code this round. Clear when the round's
#: CORRECTNESS file lands with them green.
_FORCE_RECHECK: frozenset[str] = frozenset(
    {
        # Entries are added as code changes each round; all thirteen r14
        # entries earned fresh green rows in CORRECTNESS_r14 and were
        # cleared per protocol.
        #
        # r15 (r14 verdict #3): the snapshot format's commit path gained
        # optimistic concurrency (operators/snapshots.py): retries>0
        # writes data once into a collision-free dir and retries only
        # the manifest publish; replace_partitions' manifest assembly
        # moved into a shared _tombstoned_dirs helper; compact_snapshot
        # hoists its writer construction; _publish temp names are now
        # unique per attempt (a real two-thread race fix). The DEFAULT
        # single-writer paths emit byte-identical manifests, but every
        # query that commits through the format re-verifies under the
        # restructured code.
        "snapshot_time_travel_orders",
        "snapshot_compaction_roundtrip",
        "snapshot_cdc_upsert_history",
        "snapshot_schema_evolution",
        "snapshot_partitioned_prune",
        "contamination_delta_theta_overlap",
        "ann_index_time_travel_probe",
        "ann_index_delete_rewrite",
        "streaming_ann_index_ingest",
        #
        # r15 OPTIMIZATION round: queries whose construction changed
        # under the driver-cost work (parsed-string projections /
        # pq_drift_expr string path / decode-stage input pruning /
        # worker-reuse cancel-mode change / iterative checkpoint
        # restructuring). Analyzed plans verified equal and the full
        # registry re-passed DuckDB parity locally at sf0.001 AND
        # sf0.01 (247/247), but their last green DRIVER rows predate
        # the new code, so they jump the queue per protocol. (The
        # model._col SQL-tagging touches every versioned read's
        # construction; that blanket change is certified by the full
        # local parity runs and rotates through the LRU tier.)
        "multimodal_image_features",
        "multimodal_mixed_codec_features",
        "multimodal_audio_features",
        "multimodal_frame_samples",
        "multimodal_video_motion",
        "multimodal_mjpeg_motion",
        "multimodal_payload_embeddings",
        "similarity_cosine_topk",
        "dedup_embedding_cosine_pairs",
        "similarity_ivf_deterministic_seeds",
        "similarity_pq_adc_topk",
        "similarity_ivfpq_pruned_adc_topk",
        "fresh_embedding_drift_rescoring",
        "text_bpe_merge_mining",
        "text_bpe_tokenize_corpus",
        "graph_pagerank_fixed_point",
    }
)


def _correctness_priority() -> list[str]:
    """Order queries so the driver's (possibly capped/time-budgeted)
    correctness gate maximizes signal each round, in four tiers:

    0. previously-FAILED queries (a red row turning green is the
       strongest signal);
    1. queries with NO CORRECTNESS_r*.json row yet — plain registry
       order, deliberately NOT cost-sorted: round 5 proved that
       cheap-first sorting inside this tier starves expensive streaming
       queries past the 50-per-round cap forever (they entered the tier
       last and re-entered it last every round);
    2. queries whose code/oracle changed this round (_FORCE_RECHECK) —
       their old green row no longer certifies the current code;
    3. previously-green queries LEAST-RECENTLY-CHECKED first (LRU), so
       the whole registry recycles under the cap: with ~220 greens and
       a 50 cap every query re-checks at least every ~5 rounds. Within
       this tier cheap queries still run first so a time-budgeted gate
       re-verifies more of them per round.

    Round 1 proved the gate walks dict order and stops at the cap;
    anything past it rotates automatically on later rounds."""
    import glob
    import json
    import re

    here = os.path.dirname(os.path.abspath(__file__))
    last_status: dict[str, bool] = {}  # name -> last recorded pass/fail
    last_round: dict[str, int] = {}  # name -> round of most recent row
    for path in sorted(glob.glob(os.path.join(here, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        round_no = int(m.group(1)) if m else 0
        try:
            with open(path) as f:
                rows = json.load(f)
        except (OSError, ValueError):
            continue
        for name, r in rows.items():
            last_round[name] = round_no
            ok = (
                bool(r.get("rows_match"))
                and bool(r.get("schema_match"))
                and bool(r.get("hash_match", True))
                and not r.get("err")
            )
            # "no_oracle" is by design (rows-only check): a row count means
            # the weaker gate ran and passed — don't pin these in the
            # failed-first tier forever.
            if r.get("err") == "no_oracle" and r.get("spark_rows") is not None:
                ok = True
            last_status[name] = ok

    cost_tags = {"streaming": 3, "multimodal": 2, "similarity": 1, "dedup": 1, "mllib": 1}

    def key(item):
        idx, name = item
        spec = QUERIES[name]
        if name not in last_status:
            tier = 1  # never driver-checked: outranks everything but red
        elif not last_status[name]:
            tier = 0  # failed last time
        elif name in _FORCE_RECHECK:
            tier = 2  # green row predates this round's code change
        else:
            tier = 3  # green: LRU-rotated
        cost = max((cost_tags.get(t, 0) for t in spec.tags), default=0)
        # green tier: least-recently-checked round first, then cheap-first;
        # tiers 0-2 keep plain registry order (stale/cost pinned to 0).
        stale = last_round.get(name, 0) if tier == 3 else 0
        return (tier, stale, cost if tier == 3 else 0, idx)

    return [n for _, n in sorted(enumerate(QUERIES), key=key)]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""

    def bind(name):
        spec = QUERIES[name]

        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            tune_existing(spark)
            return spec.fn(spark, sf_dir)

        run.__name__ = name
        return run

    return {name: bind(name) for name in _correctness_priority()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL mirror for each oracle-checkable query."""
    return {
        name: QUERIES[name].oracle
        for name in _correctness_priority()
        if QUERIES[name].oracle
    }
