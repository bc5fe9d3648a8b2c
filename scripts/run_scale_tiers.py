#!/usr/bin/env python
"""Reproducible scale-decade gate (round 8).

Round 7's sf10/sf100 evidence — 63 queries green at 60 M lineitem
(including all 22 TPC-H shapes), 16 at 600 M — was gathered as ad-hoc
pytest invocations recorded in prose (REGIMES.md "Scale-decade"). This
runner captures those exact batch lists as NAMED TIERS so any later
round re-verifies the same program with one command and zero
archaeology:

    python scripts/build_sf1.py /tmp/sf1
    SPARK_GRAFT_SCALE_SRC=/tmp/sf1  python scripts/build_sf1.py /tmp/sf10
    SPARK_GRAFT_SCALE_SRC=/tmp/sf10 python scripts/build_sf1.py /tmp/sf100

    python scripts/run_scale_tiers.py sf10            # all 5 sf10 batches
    python scripts/run_scale_tiers.py sf10-batch1     # one batch
    python scripts/run_scale_tiers.py sf100 --dir /data/sf100
    python scripts/run_scale_tiers.py --list

Each tier shells out to the SAME oracle-parity machinery the driver
gate uses (tests/test_oracle_parity.py: Spark vs DuckDB row counts +
schema + sorted values on identical parquet), pointed at the scale
dataset via SPARK_GRAFT_SF_DIR_TEST. Exit code is pytest's, so this
nests in CI. The full 226-query registry is NOT swept at sf10+ by
design: the heavy list-lambda DuckDB oracles (not the engine) dominate
past 60 M rows — the mass-sensitive families below are the intended
program (REGIMES.md measured ~1-3 min per batch at sf10 on local[32],
~35 min for sf100-batch2, which carries two global-order medians).
"""

import argparse
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

#: tier -> (default dataset dir, ordered query list). Lists are the
#: round-7 spot program verbatim (REGIMES.md "Scale-decade²/³"); keep
#: appends at the END of a batch so recorded timings stay comparable.
TIERS = {
    # batch 1: the 11 most mass-sensitive operators — exact decimal sums,
    # global ranks/cumulatives (the string-bridge trio), bitmap/HLL
    # distinct machinery, exact dedup. This batch CAUGHT the r7 gini
    # past-2^53 decimal->double ulp bug.
    "sf10-batch1": ("/tmp/sf10", [
        "q1_pricing_summary",
        "q18_large_volume_customers",
        "scalar_try_functions_battery",
        "stats_gini_revenue",
        "stats_weighted_median",
        "window_moving_median_order_value",
        "pareto_cumulative_revenue_share",
        "bitmap_exact_distinct_shards",
        "sketch_hll_shard_union",
        "dedup_exact_documents",
        "window_ratio_to_report",
        # r10 appends: the DDSketch quantile shards (global-rank exact
        # reference + merged-walk estimate) and the LSH bucket census
        # (combinatorial pair totals — the minhash family's mass face)
        "sketch_quantile_shard_merge",
        "dedup_minhash_bucket_census",
        # r11 appends: Misra-Gries frequent-items shards (merge O(shards*K);
        # the long-tail item space only ever exists inside the groupBys)
        # and bottom-k KMV sample shards (distinct-union + TakeOrdered)
        "sketch_topk_shard_merge",
        "sketch_bottomk_sample_shards",
        # r12 append: theta-sketch set ops over ~150 K distinct custkeys
        # (first green run 2026-08-16, 17 s standalone at sf10)
        "sketch_theta_set_ops",
    ]),
    # batch 2: global/partitioned windows, running totals, monthly trend,
    # sorted-fold entropy, sessionization, gap-fill, checksums,
    # incremental agg merge, rolling bitmap DAU, q3/q9 join-mass controls
    "sf10-batch2": ("/tmp/sf10", [
        "window_running_order_total",
        "trend_mom_revenue_growth",
        "stats_categorical_entropy_per_user",
        "sessionize_events_gap",
        "gapfill_linear_interpolation",
        "table_checksum_by_nation",
        "incremental_agg_partial_merge",
        "most_recent_event_per_user",
        "bitmap_rolling_distinct_users",
        "q3_shipping_priority",
        "q9_product_type_profit",
        "window_moving_median_order_value",
    ]),
    # batch 3: subqueries, cohort/funnel, both as-of joins, both
    # versioned reads, Avro roundtrip, token counts, SCD2, a real
    # streaming replay over the 10 M-event corpus
    "sf10-batch3": ("/tmp/sf10", [
        "subquery_exists_urgent_customers",
        "subquery_scalar_above_nation_avg",
        "cohort_retention_weekly",
        "funnel_view_click_purchase",
        "funnel_time_to_convert_percentiles",
        "asof_join_user_value_at_checkpoints",
        "asof_join_pairwise_event_probes",
        "versioned_most_recent_read",
        "versioned_time_range_read",
        "avro_cell_roundtrip_nation_stats",
        "text_token_counts",
        "scd2_event_type_history",
        "streaming_hourly_event_stats",
        # late-r9 append: BPE tokenizer training over the 500 K-doc
        # corpus — the iterative vocab-reduction shape (Spark side
        # measured sub-linear: 2.9 s sf0.1 / 2.7 s sf1 / 6.5 s sf10)
        "text_bpe_merge_mining",
        "text_bpe_tokenize_corpus",
        # r12 append: streaming KMV fold over the 10 M-event replay —
        # the state-stays-≤K claim exercised at 1000× the driver corpus
        # (first green run 2026-08-16, 31 s standalone)
        "streaming_sketch_incremental_merge",
        # r13 append: the three-member family fold (HLL + DDSketch + MG
        # through one foreachBatch pipeline) over the same 10 M-event
        # replay; the oracle's global-rank percentiles are its cost
        "streaming_sketch_family_fold",
        # r13 append: streaming ANN-index ingest at 200 K vectors —
        # per-batch encode + partitioned append, ingest == one-shot
        # index under the hash gate (same oracle-cost ceiling as PQ)
        "streaming_ann_index_ingest",
        # r12 append: PQ ADC top-k with the full DuckDB oracle at 200 K
        # vectors — the largest tier where the oracle's encode replay is
        # feasible (sf100 is engine-side only: scripts/assert_pq_adc.py)
        "similarity_pq_adc_topk",
        # r13 append: IVF-PQ (hive-partition inverted lists + DPP-pruned
        # ADC); same oracle-cost ceiling as PQ — the encode replay caps
        # the full-oracle tier at 200 K vectors
        "similarity_ivfpq_pruned_adc_topk",
        # r14 appends: the snapshot-versioned ANN lifecycle (time-travel
        # probe over the committed lineage, partition-rewrite deletes)
        # and the embedding-drift freshness pass — all share the PQ
        # oracle's encode-replay cost ceiling, so 200 K vectors is their
        # largest full-oracle tier too (sf100 is engine-side:
        # scripts/assert_ann_lifecycle.py)
        "ann_index_time_travel_probe",
        "ann_index_delete_rewrite",
        "fresh_embedding_drift_rescoring",
        # r15 appends: the streaming drift freshener (fold == one-shot
        # under the shared drift oracle at the 200 K-vector replay
        # scale) and the IVF cell rebalance (skew stats + mass-directed
        # split, full oracle) — both share the PQ family's encode-replay
        # oracle-cost ceiling, so 200 K vectors is their largest
        # full-oracle tier too (sf100 is engine-side:
        # scripts/assert_ann_lifecycle.py section 5)
        "streaming_drift_rescoring_ingest",
        "ann_ivf_cell_rebalance_stats",
    ]),
    # batch 4: six heavy TPC-H shapes, BFS + triangle counting over the
    # 60 M-row copurchase graph, both salted operators, Z-order tiling,
    # domain caps, mixture rebalance
    "sf10-batch4": ("/tmp/sf10", [
        "q5_local_supplier_volume",
        "q7_nation_volume_shipping",
        "q8_market_share",
        "q12_late_shipment_priority_split",
        "q17_small_quantity_revenue",
        "q21_waiting_suppliers",
        "graph_bfs_copurchase_hops",
        "graph_triangle_count_copurchase",
        "salted_agg_event_type_stats",
        "salted_join_event_labels",
        "zorder_layout_event_tiles",
        "domain_cap_sample_documents",
        "mixture_rebalance_sources",
    ]),
    # batch 5: the remaining 12 TPC-H shapes (completes all 22 at 60 M
    # rows), CDC apply-changes, checksum-bucketed diff, funnel patterns
    "sf10-batch5": ("/tmp/sf10", [
        "q2_min_cost_supplier",
        "q4_late_ship_priority",
        "q6_forecast_revenue",
        "q10_returned_items",
        "q11_important_parts",
        "q13_customer_distribution",
        "q14_promo_revenue",
        "q15_top_supplier",
        "q16_supplier_part_counts",
        "q19_discounted_revenue",
        "q20_excess_share_suppliers",
        "q22_global_sales_opportunity",
        "cdc_apply_changes_ordered",
        "table_diff_checksum_buckets",
        "funnel_pattern_no_error_between",
        # r13 append: per-ingest contamination via snapshot delta +
        # theta set-ops over the 500 K-doc corpus (the diff family's
        # sketch face; the exact shingle intersection is the oracle's
        # cost)
        "contamination_delta_theta_overlap",
    ]),
    # sf100 batch 1: flagship exact-decimal pipelines + the string-bridge
    # trio at ~10^21 unscaled — magnitude-invariance of the correctly-
    # rounded bridge, measured (6/6 in 2:17 at r7)
    "sf100-batch1": ("/tmp/sf100", [
        "q1_pricing_summary",
        "q6_forecast_revenue",
        "stats_gini_revenue",
        "window_ratio_to_report",
        "pareto_cumulative_revenue_share",
        "scalar_try_functions_battery",
    ]),
    # sf100 batch 2: joins at 600 M x 150 M, global-order medians (the
    # wall-clock dominators, expected cost shape), per-user windows over
    # the 100 M-event corpus, distinct machinery, exact dedup at 5 M docs
    "sf100-batch2": ("/tmp/sf100", [
        "q3_shipping_priority",
        "q9_product_type_profit",
        "q18_large_volume_customers",
        "window_moving_median_order_value",
        "stats_weighted_median",
        "most_recent_event_per_user",
        "sessionize_events_gap",
        "bitmap_exact_distinct_shards",
        "sketch_hll_shard_union",
        "dedup_exact_documents",
    ]),
    # sf100 batch 3 (round 9 — broadens the 600 M tier from 16 to 35
    # queries per the r8 verdict): six TPC-H join shapes already green at
    # sf10 plus semi/anti joins, the as-of join, and the salted agg —
    # all cheap-oracle (no global sorts, no list lambdas), so the DuckDB
    # side stays minutes at 600 M rows
    "sf100-batch3": ("/tmp/sf100", [
        "q4_late_ship_priority",
        "q5_local_supplier_volume",
        "q10_returned_items",
        "q12_late_shipment_priority_split",
        "q14_promo_revenue",
        "q19_discounted_revenue",
        "join_semi_customers_with_urgent_orders",
        "join_anti_customers_without_orders",
        "asof_join_user_value_at_checkpoints",
        "salted_agg_event_type_stats",
    ]),
    # sf100 batch 4 (round 9): partitioned windows, monthly trend,
    # per-brand top-k, set ops over 150 M order priorities, correlated
    # subqueries, weekly cohorts, and the per-nation checksum
    "sf100-batch4": ("/tmp/sf100", [
        "window_running_order_total",
        "trend_mom_revenue_growth",
        "topk_parts_per_brand",
        "setop_intersect_all_priorities",
        "setop_except_all_priorities",
        "subquery_exists_urgent_customers",
        "subquery_scalar_above_nation_avg",
        "cohort_retention_weekly",
        "table_checksum_by_nation",
        # late-r9 append: BPE tokenizer training at 5 M documents —
        # Spark 23 s / materialized oracle 4 s, both corpus-pass-bounded
        "text_bpe_merge_mining",
        "text_bpe_tokenize_corpus",
    ]),
    # sf100 batch 5 (late round 9): fact-table behavior/versioned/text
    # families green at sf10, cheap oracles (anchored MINs, gaps-and-
    # islands LAG, argmax, token explode — no global sorts) at
    # 100 M events / 150 M orders / 5 M docs
    "sf100-batch5": ("/tmp/sf100", [
        "funnel_view_click_purchase",
        "versioned_most_recent_read",
        "versioned_time_range_read",
        "scd2_event_type_history",
        "text_token_counts",
        "filter_in_between_like",
        "agg_bool_or_needs_reread",
    ]),
    # sf100 batch 6 (round 10): the near-dup / similarity families at
    # 5 M docs / 2 M vectors. The pair-MATERIALIZING minhash queries
    # (candidate_pairs, components) are deliberately absent: on this
    # tier every document is a ~1000-way duplicate, so their candidate
    # set is ~10^9 OUTPUT rows — unmaterializable by any engine (an
    # output-size property, not a plan defect; REGIMES.md "Scale-decade³
    # near-dup"). The census query carries the family's mass evidence
    # inside the hash gate (hot-bucket counts + combinatorial pair
    # totals); pair-level quarantine equivalence at mass is asserted by
    # scripts/assert_hotbucket_mass.py.
    "sf100-batch6": ("/tmp/sf100", [
        "dedup_minhash_bucket_census",
        "dedup_incremental_new_vs_corpus",
        "similarity_bucketed_ann",
        "similarity_sparse_inverted_index",
        "corpus_prep_end_to_end",
        # r10 append: DDSketch quantile shards at 150 M orders (sketch
        # side flat in mass; the global-rank exact REFERENCE is the cost)
        "sketch_quantile_shard_merge",
        # similarity_pq_adc_topk is deliberately absent at THIS tier
        # (probed r12): the ENGINE side is codes-only and fine, but the
        # DuckDB ORACLE's encode replay is a 2M x 16 x 8 cross join
        # whose spill exceeded the rig's disk — the same oracle-cost
        # (not plan-defect) class as the absent pair-materializing
        # minhash queries above. PQ's sf100 evidence is engine-side:
        # scripts/assert_pq_adc.py (2 M vectors, Spark-internal exact
        # reference + recall floor); the full oracle runs through sf10
        # (200 K vectors) in sf10-batch3.
    ]),
    # sf100 batch 7 (round 11): the last two §2 families with no
    # scale-tier row. Multimodal at 5 M docs — the claim to prove is
    # Arrow-batched codec THROUGHPUT (the r11 compute-spread repartition
    # is what makes this feasible: byte-based splits ran 500 K docs on 2
    # tasks); snapshots at 150 M orders / 100 M events — the claim is
    # manifest scaling (versioned commits, time travel, incremental CDC
    # fold) at real fact-table mass. Plus the new Misra-Gries topk sketch
    # (state O(K)/shard at any scale; the exact top-3 REFERENCE is the
    # TakeOrdered cost).
    "sf100-batch7": ("/tmp/sf100", [
        "multimodal_image_features",
        "multimodal_mixed_codec_features",
        "snapshot_time_travel_orders",
        "snapshot_cdc_upsert_history",
        "sketch_topk_shard_merge",
        "sketch_bottomk_sample_shards",
        # r12 append: theta-sketch set ops at 15 M distinct custkeys /
        # 150 M orders — EXECUTED standalone green 2026-08-16 (31 s,
        # full DuckDB oracle) before being listed here, so the tier
        # table never implies an unrun row (the r11 bookkeeping lesson)
        "sketch_theta_set_ops",
    ]),
}
#: aggregate tiers run every batch of a decade in order
GROUPS = {
    "sf10": [f"sf10-batch{i}" for i in range(1, 6)],
    "sf100": [f"sf100-batch{i}" for i in range(1, 8)],
}


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("tier", nargs="?", help="tier or group name (see --list)")
    ap.add_argument("--dir", help="dataset dir (default: the tier's, e.g. /tmp/sf10)")
    ap.add_argument("--list", action="store_true", help="list tiers and exit")
    ap.add_argument("--cpus", default=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    args = ap.parse_args()

    if args.list or not args.tier:
        for g, parts in GROUPS.items():
            n = sum(len(TIERS[p][1]) for p in parts)
            print(f"{g:14s} {n:3d} queries  ({', '.join(parts)})")
        for t, (d, qs) in TIERS.items():
            print(f"{t:14s} {len(qs):3d} queries  (default dir {d})")
        return 0

    batches = GROUPS.get(args.tier) or ([args.tier] if args.tier in TIERS else None)
    if not batches:
        sys.exit(f"unknown tier {args.tier!r} — try --list")

    sf_dir = args.dir or TIERS[batches[0]][0]
    if not os.path.isdir(sf_dir):
        sys.exit(
            f"dataset dir {sf_dir} missing. Build the chain first:\n"
            "  python scripts/build_sf1.py /tmp/sf1\n"
            "  SPARK_GRAFT_SCALE_SRC=/tmp/sf1  python scripts/build_sf1.py /tmp/sf10\n"
            "  SPARK_GRAFT_SCALE_SRC=/tmp/sf10 python scripts/build_sf1.py /tmp/sf100"
        )

    env = dict(
        os.environ,
        SPARK_GRAFT_SF_DIR_TEST=sf_dir,
        SPARK_GRAFT_CPUS=str(args.cpus),
        SPARK_GRAFT_SHUFFLE=os.environ.get("SPARK_GRAFT_SHUFFLE", str(args.cpus)),
    )
    # Size the single local-mode JVM to the tier: at 600 M rows a batch
    # of 7+ queries sharing one session exceeds the 8 g dev default
    # (observed: the JVM died mid-batch5 and every later query failed
    # with ConnectionRefused; each query passes alone). This is the
    # spill-aware sizing rule applied to the test harness — on a real
    # cluster executor memory is provisioned to the data scale, so the
    # local stand-in must be too. Keyed off the TIER NAME, not the data
    # path: `--dir /data/whatever` on an sf100 tier must still get the
    # big JVM (a path-substring test silently kept the 8 g default and
    # reproduced the mid-batch JVM death).
    if any(b.startswith("sf100") for b in batches):
        env.setdefault("SPARK_GRAFT_DRIVER_MEM", "24g")
    rc = 0
    for b in batches:
        nodes = [
            f"tests/test_oracle_parity.py::test_query_matches_oracle[{q}]"
            for q in TIERS[b][1]
        ]
        print(f"== {b}: {len(nodes)} queries at {sf_dir} ==", flush=True)
        r = subprocess.run([sys.executable, "-m", "pytest", "-q", *nodes], cwd=REPO, env=env)
        rc = rc or r.returncode
    return rc


if __name__ == "__main__":
    sys.exit(main())
