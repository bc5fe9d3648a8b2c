"""Scale-robustness spot-check (round-5): the 10 most data-sensitive
queries re-verified against the DuckDB oracle at ~sf1.

The driver generates sf0.001/0.01/0.1 only, so this builds a 10×-sf0.1
dataset once per session: documents/events/lineitem/orders are replicated
10 times with ids remapped id -> id*10 + copy (so probe filters like
``doc_id < 150`` now cover 10 copies of each original row — heavier
groups, massive tie ranks, near-duplicate floods), while dimension
tables and foreign keys stay consistent (both sides of the
lineitem↔orders key get the same remap; customer/part/supplier keys are
untouched). Both engines read the SAME generated parquet, so the parity
contract is unchanged — only the data volume and tie structure grow.

History says this is where bugs live: every dtype/boundary divergence
ADVICE ever flagged (DECIMAL widening, float tie-flips, empty-group
semantics) was scale-dependent. Exact-median, MAD, percentile,
rank-with-ties, md5-threshold, and entropy paths all cross group-size
boundaries here that sf0.01 cannot reach.

Runtime: ~79 s total at local[4] — ~15 s to generate (~160 MB parquet)
plus the 10 parity checks — measured on the build container. Marked
``slow``; runs in the default suite (no skip) because a gate that
doesn't run isn't a gate.
"""

import os

import pytest

from kiji_scoring_spark.queries import QUERIES
from kiji_scoring_spark.sources import TABLES

from test_oracle_parity import duck_con, normalize

#: 10× replication with id remap for the fact/corpus tables
_REPLICATED = {
    "documents": "doc_id",
    "events": "event_id",
    "lineitem": "l_orderkey",
    "orders": "o_orderkey",
}

SPOT_QUERIES = [
    "agg_argextreme_median_battery",
    "agg_exact_percentiles_quantity",
    "feature_decayed_engagement",
    "mixture_rebalance_sources",
    "quality_char_entropy",
    "quality_unigram_logprob",
    "scalar_timezone_battery",
    "setsim_join_exact_jaccard",
    "stats_mad_robust_outliers",
    "stats_quantiles_price",
    # round-5 state/window additions: id remaps reshape every key-mod
    # split, and 10x orders per customer floods the median frames and
    # diff buckets with ties — the exact boundary structure sf0.01
    # cannot produce
    "cdc_apply_changes_ordered",
    "gapfill_linear_interpolation",
    "incremental_agg_partial_merge",
    "snapshot_cdc_upsert_history",
    "table_diff_checksum_buckets",
    "window_moving_median_order_value",
    # tie-sensitive round-5 stats: 10x replication creates EXACT count
    # and revenue ties, stressing every explicit tie rule (mode's
    # count-then-rank, the weighted-median crossing point, Pareto's and
    # Gini's total orders) at a density sf0.01 cannot produce
    "agg_mode_deterministic",
    "pareto_cumulative_revenue_share",
    "stats_gini_revenue",
    "stats_weighted_median",
    "trend_mom_revenue_growth",
    "window_running_distinct_types",
    # replicated events share TIMESTAMPS across copies (only event_id
    # differs), so every LAG / running-anchor / percentile total order
    # faces dense ts ties here
    "behavior_transition_matrix",
    "funnel_pattern_no_error_between",
    "funnel_time_to_convert_percentiles",
    "stats_categorical_entropy_per_user",
    "stats_chi_square_independence",
]


@pytest.fixture(scope="session")
def scale_dir(tmp_path_factory):
    import duckdb

    src = os.environ.get("SPARK_GRAFT_SCALE_SRC", "/root/testdata/sf0.1")
    d = tmp_path_factory.mktemp("sf1ish")
    con = duckdb.connect()
    for t in TABLES:
        sp, dp = f"{src}/{t}.parquet", f"{d}/{t}.parquet"
        if t in _REPLICATED:
            k = _REPLICATED[t]
            con.execute(
                f"""
                COPY (
                  SELECT p.* REPLACE (p.{k} * 10 + c.copy AS {k})
                  FROM read_parquet('{sp}') p,
                       (SELECT unnest(range(10)) AS copy) c
                ) TO '{dp}' (FORMAT parquet)
                """
            )
        else:
            con.execute(
                f"COPY (SELECT * FROM read_parquet('{sp}')) TO '{dp}' (FORMAT parquet)"
            )
    con.close()
    return str(d)


@pytest.mark.slow
@pytest.mark.parametrize("name", SPOT_QUERIES)
def test_scale_spot_matches_oracle(spark, scale_dir, name):
    import pandas as pd

    spec = QUERIES[name]
    got = normalize(spec.fn(spark, scale_dir).toPandas())
    want = normalize(duck_con(scale_dir).execute(spec.oracle).fetchdf())
    assert list(got.columns) == list(want.columns)
    assert len(got) == len(want), f"{name}: rows {len(got)} vs {len(want)}"
    pd.testing.assert_frame_equal(got, want, check_dtype=True, check_exact=True)
