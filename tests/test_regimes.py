"""Adversarial data-regime gates (round 5): the same parity contract as
test_oracle_parity, but over datasets that stress the value-space edges
where engine semantics diverge — NULL-heavy payload columns, one-row
tables, and (for the state/audit family) fully empty tables.

History: every fix in the round-5 null/one-row/empty hardening wave
(asof tie-break and chimera-carrier operator bugs, max_by null-skipping,
NULLS FIRST/LAST windows, checksum null serialization, Avro nullable
unions, null-body hygiene) was found by exactly these sweeps. The full
226-query sweep per regime runs ~3.5 min and stays an on-demand command
(SPARK_GRAFT_SF_DIR_TEST=<regime dir> pytest tests/test_oracle_parity.py);
this file pins a curated high-sensitivity subset per regime so the
invariants can't silently rot between rounds.
"""

import os

import pytest

from kiji_scoring_spark.queries import QUERIES
from kiji_scoring_spark.sources import TABLES

from test_oracle_parity import duck_con, normalize

#: deterministic ~30% NULLs in payload columns; identity/timestamp columns
#: stay intact (the schema contract guarantees keys; payloads may be null)
_NULL_MODS = {
    "events": (
        "SELECT * REPLACE ("
        "CASE WHEN event_id % 10 < 3 THEN NULL ELSE value END AS value, "
        "CASE WHEN event_id % 7 = 0 THEN NULL ELSE props END AS props)"
    ),
    "customer": (
        "SELECT * REPLACE ("
        "CASE WHEN c_custkey % 10 < 3 THEN NULL ELSE c_acctbal END AS c_acctbal)"
    ),
    "orders": (
        "SELECT * REPLACE ("
        "CASE WHEN o_orderkey % 10 < 3 THEN NULL ELSE o_totalprice END"
        " AS o_totalprice)"
    ),
    "documents": (
        "SELECT * REPLACE (CASE WHEN doc_id % 11 = 0 THEN NULL ELSE text END AS text)"
    ),
}


def _build(tmp_path_factory, name: str, stmt_for) -> str:
    import duckdb

    src = os.environ.get("SPARK_GRAFT_SCALE_SRC_SMALL", "/root/testdata/sf0.001")
    d = tmp_path_factory.mktemp(name)
    con = duckdb.connect()
    for t in TABLES:
        stmt = stmt_for(t, f"read_parquet('{src}/{t}.parquet')")
        con.execute(f"COPY ({stmt}) TO '{d}/{t}.parquet' (FORMAT parquet)")
    con.close()
    return str(d)


@pytest.fixture(scope="session")
def null_dir(tmp_path_factory):
    return _build(
        tmp_path_factory,
        "nullsf",
        lambda t, rp: f"{_NULL_MODS.get(t, 'SELECT *')} FROM {rp}",
    )


@pytest.fixture(scope="session")
def keynull_dir(tmp_path_factory):
    """KEY-level nulls: whole groups go all-NULL in their payload column
    at ANY scale (canonical mods live in scripts/build_regimes.py —
    round 6's regime, which caught 4 bugs the row-level regime missed)."""
    import os
    import sys

    sys.path.insert(
        0,
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"),
    )
    from build_regimes import KEYNULL_MODS

    return _build(
        tmp_path_factory,
        "keynullsf",
        lambda t, rp: f"{KEYNULL_MODS.get(t, 'SELECT *')} FROM {rp}",
    )


@pytest.fixture(scope="session")
def textshape_dir(tmp_path_factory):
    """Text-shape extremes: empty / whitespace-only / 60 KB docs plus
    malformed JSON props (canonical mods in scripts/build_regimes.py —
    round 6's regime; found 3 ANSI job-killers and the minhash
    empty-signature mega-bucket)."""
    import os
    import sys

    sys.path.insert(
        0,
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"),
    )
    from build_regimes import TEXTSHAPE_MODS

    return _build(
        tmp_path_factory,
        "textshapesf",
        lambda t, rp: f"{TEXTSHAPE_MODS.get(t, 'SELECT *')} FROM {rp}",
    )


@pytest.fixture(scope="session")
def onerow_dir(tmp_path_factory):
    return _build(
        tmp_path_factory, "onesf", lambda t, rp: f"SELECT * FROM {rp} LIMIT 1"
    )


@pytest.fixture(scope="session")
def empty_dir(tmp_path_factory):
    return _build(
        tmp_path_factory, "emptysf", lambda t, rp: f"SELECT * FROM {rp} WHERE 1=0"
    )


#: the queries each regime historically broke (plus their operator kin)
NULL_REGIME = [
    "agg_mode_deterministic",
    "asof_join_user_value_at_checkpoints",
    "avro_cell_roundtrip_nation_stats",
    "avro_nested_cell_roundtrip_orders",
    "bucketize_decile_order_value",
    "cdc_apply_changes_ordered",
    "dedup_incremental_new_vs_corpus",
    "dedup_keep_best_per_cluster",
    "dedup_minhash_candidate_pairs",
    "dedup_simhash_signatures",
    "fresh_a6_policy_own_request",
    "fresh_batch_scoring",
    "gapfill_linear_interpolation",
    # r6: an sf0.1-SOURCED null sweep (REGIMES.md) caught these two — gini's
    # NULL-revenue ranks (Spark NULLS FIRST vs DuckDB NULLS LAST) and the
    # try-battery's decimal->double cast past 2^53 unscaled; the small
    # regime can't reproduce the mass, but pins the NULL-handling paths
    "scalar_try_functions_battery",
    "stats_gini_revenue",
    # r6: the KEY-level null regime (whole groups all-NULL at any scale —
    # scripts/build_regimes.py "keynull") caught these four: pandas-UDF
    # astype("int64") crashing on NaN, the versioned-cell fold seeding 0
    # where SQL SUM of all-NULL is NULL, and both stateful-replay oracles
    # needing COALESCE for all-NULL batches
    "udf_pandas_scalar_discounted_cents",
    "versioned_time_range_read",
    "mllib_scored_customers",
    "multimodal_image_features",
    "snapshot_cdc_upsert_history",
    "split_leakage_safe_by_cluster",
    "stats_ab_welch_ttest",
    "stats_weighted_median",
    "table_checksum_by_nation",
    "text_tfidf_top_terms",
    "udaf_trimmed_mean_acctbal",
    "versioned_most_recent_read",
    "versioned_time_range_read",
    "window_moving_median_order_value",
    "window_percent_rank_cume_dist",
]

#: round-6 regime: the queries the keynull sweep broke (all-NULL groups),
#: plus gini — its NULL-rank bug needed all-null groups too, just at the
#: customer grain the sf0.1-sourced row-level regime happened to produce
KEYNULL_REGIME = [
    "udf_pandas_scalar_discounted_cents",
    "versioned_time_range_read",
    "stats_gini_revenue",
    "salted_agg_event_type_stats",
    "most_recent_event_per_user",
    "window_running_distinct_types",
]

#: round-6 regime: the CHEAP queries the text-shape sweep broke (the
#: heavy 60 KB-doc dedup family is covered by the on-demand full sweep —
#: scripts/build_regimes.py "textshape" — at ~30 s/query it stays out of
#: the per-session gate)
TEXTSHAPE_REGIME = [
    "text_token_counts",
    "scalar_json_events_battery",
    "variant_shred_event_props",
    "multimodal_frame_samples",
    "multimodal_image_features",
    # the 60 KB documents that overflowed the JPEG fixture's 16-bit SOF
    # height field (late r9) — pins the ITU-T T.81 format cap
    "multimodal_mjpeg_motion",
    "multimodal_mixed_codec_features",
]

ONEROW_REGIME = [
    "agg_empty_relation_semantics",
    "mllib_scored_customers",
    "cube_orders_status_priority",
    "pareto_cumulative_revenue_share",
    "stats_ab_welch_ttest",
    "stats_gini_revenue",
    "stats_theil_sen_slope",
    "trend_mom_revenue_growth",
    "window_moving_median_order_value",
]

EMPTY_REGIME = [
    "binaryfile_scan_doc_lengths",
    "bitmap_exact_distinct_shards",
    "dpp_partitioned_orders_join",
    "parquet_sink_roundtrip",
    "cube_orders_status_priority",
    "dq_constraint_audit",
    "q1_pricing_summary",
    "rollup_acctbal_by_nation_segment",
    "snapshot_cdc_upsert_history",
    "snapshot_partitioned_prune",
    "snapshot_time_travel_orders",
    "stats_ab_welch_ttest",
    "table_diff_checksum_buckets",
]


def _check(spark, data_dir, name):
    import pandas as pd

    spec = QUERIES[name]
    got = normalize(spec.fn(spark, data_dir).toPandas())
    want = normalize(duck_con(data_dir).execute(spec.oracle).fetchdf())
    assert list(got.columns) == list(want.columns)
    assert len(got) == len(want), f"{name}: rows {len(got)} vs {len(want)}"
    pd.testing.assert_frame_equal(got, want, check_dtype=True, check_exact=True)


@pytest.mark.slow
@pytest.mark.parametrize("name", NULL_REGIME)
def test_null_regime(spark, null_dir, name):
    _check(spark, null_dir, name)


@pytest.mark.slow
@pytest.mark.parametrize("name", KEYNULL_REGIME)
def test_keynull_regime(spark, keynull_dir, name):
    _check(spark, keynull_dir, name)


@pytest.mark.slow
@pytest.mark.parametrize("name", TEXTSHAPE_REGIME)
def test_textshape_regime(spark, textshape_dir, name):
    _check(spark, textshape_dir, name)


@pytest.mark.slow
@pytest.mark.parametrize("name", ONEROW_REGIME)
def test_onerow_regime(spark, onerow_dir, name):
    _check(spark, onerow_dir, name)


@pytest.mark.slow
@pytest.mark.parametrize("name", EMPTY_REGIME)
def test_empty_regime(spark, empty_dir, name):
    _check(spark, empty_dir, name)


#: r7: timestamp-edge events (epoch-0 sentinels, pre-1970, +150-year rows)
#: — the construction under which the three stream-stream joins used to
#: DROP pre/at-epoch rows (Spark's initial watermark is 0). The r7
#: pre-epoch shim (streaming.shift_event_time applied symmetrically at
#: ingest, reversed at emit) closes that boundary; this gate pins it.
_TSEDGE_MODS = {
    "events": (
        "SELECT * REPLACE (CASE "
        "WHEN user_id % 23 = 0 THEN TIMESTAMP '1970-01-01 00:00:00' "
        "WHEN user_id % 29 = 0 THEN TIMESTAMP '1969-06-01 12:00:00' "
        "WHEN user_id % 31 = 0 THEN ts + INTERVAL 150 YEAR "
        "ELSE ts END AS ts)"
    ),
}


@pytest.fixture(scope="session")
def tsedge_dir(tmp_path_factory):
    return _build(
        tmp_path_factory,
        "tsedgesf",
        lambda t, rp: f"{_TSEDGE_MODS.get(t, 'SELECT *')} FROM {rp}",
    )


TSEDGE_STREAM_STREAM = [
    "streaming_stream_stream_join",
    "streaming_stream_stream_left_outer",
    "streaming_stream_stream_full_outer",
]


@pytest.mark.slow
@pytest.mark.parametrize("name", TSEDGE_STREAM_STREAM)
def test_tsedge_stream_stream(spark, tsedge_dir, name):
    _check(spark, tsedge_dir, name)


@pytest.fixture(scope="session")
def skew_dir(tmp_path_factory):
    """KEY SKEW: one mega-key owns a large share of each fact table
    (canonical mods in scripts/build_regimes.py — round 7's regime; the
    full sweep went 226/226 clean on first run). The gate pins the
    skew-value-neutrality of exactly the machinery that exists FOR skew:
    salting, AQE skew-join, the dedup hot-bucket quarantine, and
    per-key streaming state."""
    import os
    import sys

    sys.path.insert(
        0,
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"),
    )
    from build_regimes import SKEW_MODS

    return _build(
        tmp_path_factory,
        "skewsf",
        lambda t, rp: f"{SKEW_MODS.get(t, 'SELECT *')} FROM {rp}",
    )


SKEW_REGIME = [
    # the two operators whose whole purpose is skew: salted agg + join
    "salted_agg_event_type_stats",
    "salted_join_event_labels",
    # 20% of documents collapse into ONE identical text → a single dedup
    # bucket far past the quarantine threshold; candidate pairs and the
    # survivor ranking must come out identical to the oracle's
    "dedup_minhash_candidate_pairs",
    "dedup_keep_best_per_cluster",
    # per-user windows/state with one user owning ~33% of events
    "most_recent_event_per_user",
    "streaming_stateful_running_user_totals",
]


@pytest.mark.slow
@pytest.mark.parametrize("name", SKEW_REGIME)
def test_skew_regime(spark, skew_dir, name):
    _check(spark, skew_dir, name)


@pytest.fixture(scope="session")
def fragmented_dir(tmp_path_factory):
    """FRAGMENTED tables (round 9): every `{t}.parquet` is a DIRECTORY of
    16 part files, rows round-robin-interleaved across parts and reversed
    within each — the small-files lake layout plus adversarial row
    placement. The first full sweep found 9 real bugs: the eight
    streaming queries sourcing events via `pathGlobFilter` matched zero
    LEAF files inside a directory table (empty streams, empty results —
    exactly the silent-wrong-answer class), and the CLI's
    footer-only schema read crashed on a directory. Fixed by
    queries_ml._stream_events + cli._layout_from_parquet; this gate pins
    both, plus the order-sensitive operator families the layout
    scrambles."""
    import sys

    sys.path.insert(
        0,
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"
        ),
    )
    from build_regimes import build_fragmented

    src = os.environ.get("SPARK_GRAFT_SCALE_SRC_SMALL", "/root/testdata/sf0.001")
    d = tmp_path_factory.mktemp("fragsf")
    build_fragmented(str(d), src)
    return os.path.join(str(d), "fragmented")


FRAGMENTED_REGIME = [
    # the two bug classes this regime caught on its first sweep
    "streaming_hourly_event_stats",
    "streaming_stream_stream_join",
    "cli_freshtool_six_modes",
    # order-sensitive operators: file layout must never change answers
    "asof_join_user_value_at_checkpoints",
    "most_recent_event_per_user",
    "sample_deterministic_documents",
    "dedup_exact_documents",
]


@pytest.mark.slow
@pytest.mark.parametrize("name", FRAGMENTED_REGIME)
def test_fragmented_regime(spark, fragmented_dir, name):
    _check(spark, fragmented_dir, name)


@pytest.fixture(scope="session")
def schemadrift_dir(tmp_path_factory):
    """SCHEMA-DRIFT tables (round 9): the fragmented 16-part layout, but
    with SCHEMA EVOLUTION — for events/customer/orders/documents one
    payload column (props / c_acctbal / o_totalprice / text) exists only
    in parts 8-15; the first-listed parts carry the pre-evolution
    schema. Naive single-footer schema sampling (bare
    ``spark.read.parquet``, DuckDB without union_by_name) silently DROPS
    the evolved column — queries naming it crash, ``SELECT *`` loses it.
    This gate pins the schema-discovery layer: load_table's mergeSchema,
    the _stream_events schema probe, the CLI's footer name-union, and
    duck_con's union_by_name, on the queries that read the four evolved
    columns."""
    import sys

    sys.path.insert(
        0,
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"
        ),
    )
    from build_regimes import build_schemadrift

    src = os.environ.get("SPARK_GRAFT_SCALE_SRC_SMALL", "/root/testdata/sf0.001")
    d = tmp_path_factory.mktemp("driftsf")
    build_schemadrift(str(d), src)
    return os.path.join(str(d), "schemadrift")


SCHEMADRIFT_REGIME = [
    # names the evolved events.props column — crashes outright if the
    # merged schema misses it
    "variant_shred_event_props",
    # streaming over a drifted directory (schema probe + per-file
    # null-fill through the file stream source)
    "streaming_hourly_event_stats",
    # CLI attachment validation sees the evolved column via footer union
    "cli_freshtool_six_modes",
    # the other three evolved columns, read through ordinary scans
    "udaf_trimmed_mean_acctbal",
    "histogram_order_totalprice",
    "dedup_exact_documents",
]


@pytest.mark.slow
@pytest.mark.parametrize("name", SCHEMADRIFT_REGIME)
def test_schemadrift_regime(spark, schemadrift_dir, name):
    _check(spark, schemadrift_dir, name)


@pytest.fixture(scope="session")
def hive_dir(tmp_path_factory):
    """HIVE-PARTITIONED tables (round 9): six tables become ``col=value``
    directory trees — the partition column lives in the PATH only (the
    part files exclude it), rows reversed within each partition, and the
    values include a space ('4-NOT SPECIFIED') and '#' ('Brand#13').
    What only this layout tests: partition-column synthesis at schema
    discovery (Spark partition inference, duck_con hive_partitioning,
    the CLI path-walk), special-char round-trips through directory
    names, per-file partition discovery in the streaming source, and
    directory-level pruning (PartitionFilters) for filters on the
    partition column."""
    import sys

    sys.path.insert(
        0,
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"
        ),
    )
    from build_regimes import build_hive

    src = os.environ.get("SPARK_GRAFT_SCALE_SRC_SMALL", "/root/testdata/sf0.001")
    d = tmp_path_factory.mktemp("hivesf")
    build_hive(str(d), src)
    return os.path.join(str(d), "hive")


HIVE_REGIME = [
    # groups by the path-synthesized partition column on the streamed
    # table (empty or NULL event_type if discovery breaks)
    "streaming_hourly_event_stats",
    # CLI layout must synthesize the partition column from the path walk
    "cli_freshtool_six_modes",
    # filters/groups on partition columns with a space and '#' in values
    "setop_intersect_all_priorities",
    "topk_parts_per_brand",
    # partition column consumed through an ordinary dimension scan
    "q3_shipping_priority",
    # corpus queries over lang-partitioned documents
    "dedup_exact_documents",
]


@pytest.mark.slow
@pytest.mark.parametrize("name", HIVE_REGIME)
def test_hive_regime(spark, hive_dir, name):
    _check(spark, hive_dir, name)


@pytest.mark.slow
def test_hive_partition_pruning_plan(spark, hive_dir):
    """Filters on the partition column must prune DIRECTORIES, not rows:
    the executed plan carries them as PartitionFilters with no
    DataFilters — at 100 TB this is the difference between listing one
    directory and scanning the table."""
    from kiji_scoring_spark.sources import load_table

    df = load_table(spark, hive_dir, "orders").filter(
        "o_orderpriority = '1-URGENT'"
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    scan = next(l for l in plan.splitlines() if "FileScan" in l)
    assert "PartitionFilters: [isnotnull(o_orderpriority" in scan
    assert "DataFilters: []" in scan
    assert df.count() > 0
