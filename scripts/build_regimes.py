"""Build the four adversarial data regimes as on-disk parquet dirs, for
the FULL-registry parity sweeps recorded in REGIMES.md.

Same construction as tests/test_regimes.py (which pins a curated subset
per session); this script materializes the dirs at stable paths so the
whole-registry sweep is one reproducible command per regime:

    python scripts/build_regimes.py /tmp/regimes
    SPARK_GRAFT_SF_DIR_TEST=/tmp/regimes/null \\
        python -m pytest tests/test_oracle_parity.py -q
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from kiji_scoring_spark.sources import TABLES  # noqa: E402
from kiji_scoring_spark.state import purge_derived_state  # noqa: E402,F401

#: deterministic ~30% NULLs in payload columns; identity/timestamp columns
#: stay intact (mirrors tests/test_regimes.py exactly)
NULL_MODS = {
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

#: round-6 addition: KEY-level nulls — entire groups go all-NULL in their
#: payload column at ANY scale factor, unlike the row-level ~30% regime
#: where a large-enough group almost surely keeps a non-null row. This is
#: the construction that exposes rank-over-nullable-aggregate divergence
#: (Spark NULLS FIRST vs DuckDB NULLS LAST) regardless of data mass —
#: the gini bug's trigger, reproducible at sf0.001.
KEYNULL_MODS = {
    "events": (
        "SELECT * REPLACE ("
        "CASE WHEN user_id % 7 = 0 THEN NULL ELSE value END AS value, "
        "CASE WHEN user_id % 5 = 0 THEN NULL ELSE props END AS props)"
    ),
    "customer": (
        "SELECT * REPLACE ("
        "CASE WHEN c_nationkey = 3 THEN NULL ELSE c_acctbal END AS c_acctbal)"
    ),
    "orders": (
        "SELECT * REPLACE ("
        "CASE WHEN o_custkey % 11 = 0 THEN NULL ELSE o_totalprice END"
        " AS o_totalprice)"
    ),
    "lineitem": (
        "SELECT * REPLACE ("
        "CASE WHEN l_suppkey % 9 = 0 THEN NULL ELSE l_discount END AS l_discount)"
    ),
    "documents": (
        "SELECT * REPLACE ("
        "CASE WHEN doc_id % 13 = 0 THEN NULL ELSE text END AS text)"
    ),
}

#: round-6 addition: non-ASCII text — CJK / accented / astral-plane
#: characters in documents.text and unicode JSON in events.props. Found
#: three byte-vs-char fixture bugs (REGIMES.md); every text-analysis
#: operator passes on it.
UNICODE_MODS = {
    "documents": (
        "SELECT * REPLACE (CASE WHEN doc_id % 5 = 0 THEN "
        "text || ' café 日本語 Ω≈ç √∫ \U0001F680naïve' "
        "WHEN doc_id % 7 = 0 THEN 'ümläut 中文 ' || text ELSE text END AS text)"
    ),
    "events": (
        "SELECT * REPLACE (CASE WHEN event_id % 13 = 0 THEN "
        '\'{"city": "São Paulo", "note": "測試 \U0001F389"}\' ELSE props END AS props)'
    ),
}

#: round-6 addition: negative and large-magnitude values (refunds,
#: million-scale events, negative balances) — swept clean 225/225 on
#: first run (REGIMES.md), so it guards rather than reproduces.
EXTREMEVAL_MODS = {
    "events": (
        "SELECT * REPLACE (CASE WHEN user_id % 3 = 0 THEN -value "
        "WHEN user_id % 17 = 0 THEN value * 1000000 ELSE value END AS value)"
    ),
    "orders": (
        "SELECT * REPLACE (CASE WHEN o_custkey % 13 = 0 THEN -o_totalprice "
        "ELSE o_totalprice END AS o_totalprice)"
    ),
    "customer": (
        "SELECT * REPLACE (CASE WHEN c_custkey % 7 = 0 THEN -c_acctbal - 100000 "
        "ELSE c_acctbal END AS c_acctbal)"
    ),
    "lineitem": (
        "SELECT * REPLACE ("
        "CASE WHEN l_suppkey % 19 = 0 THEN 0.0 ELSE l_discount END AS l_discount)"
    ),
}

#: round-6 addition: timestamp edges — epoch-0 sentinels, pre-1970, and
#: far-future rows. Caught the versioned-read oracle's unspecified
#: equal-ts tie-break and the month spine blowing Spark's default
#: 100-level recursion cap; the 3 stream-stream joins drop pre/at-epoch
#: event times BY ENGINE DESIGN (initial watermark 0) — documented
#: inherent, excluded from this regime's sweep (REGIMES.md).
TSEDGE_MODS = {
    "events": (
        "SELECT * REPLACE (CASE "
        "WHEN user_id % 23 = 0 THEN TIMESTAMP '1970-01-01 00:00:00' "
        "WHEN user_id % 29 = 0 THEN TIMESTAMP '1969-06-01 12:00:00' "
        "WHEN user_id % 31 = 0 THEN ts + INTERVAL 150 YEAR "
        "ELSE ts END AS ts)"
    ),
    "orders": (
        # DATE sentinel, not TIMESTAMP: mixing a TIMESTAMP literal with the
        # DATE column in one CASE makes DuckDB promote the whole column to
        # TIMESTAMP, silently changing the regime parquet's orders schema
        # from the production DATE type (advice, r6)
        "SELECT * REPLACE (CASE WHEN o_orderkey % 37 = 0 "
        "THEN DATE '1970-01-01' ELSE o_orderdate END AS o_orderdate)"
    ),
}

#: round-6 addition: text-SHAPE extremes — empty strings, whitespace-only
#: docs, long-repeated docs, and malformed/empty JSON props.
#: Found 11 divergences incl. 3 job-killing ANSI crashes (REGIMES.md).
#: r10 resize: the repeated CLASS is 24x (~7 KB — still past every cap
#: and window in the registry: the 2048-char JPEG render budget, chunk
#: windows, shingle/fingerprint strides), with ONE maximal 200x (~60 KB)
#: doc kept so the original extreme extent stays covered (it found the
#: r9 SOF 16-bit bound). 353 docs x 60 KB made every char-level list
#: oracle O(60k) per doc and the full sweep 24 min; one such doc costs
#: nothing and the sweep drops to minutes.
TEXTSHAPE_MODS = {
    "documents": (
        "SELECT * REPLACE (CASE "
        "WHEN doc_id = 13 THEN repeat(text || ' ', 200) "
        "WHEN doc_id % 9 = 0 THEN '' "
        "WHEN doc_id % 11 = 0 THEN '   ' "
        "WHEN doc_id % 13 = 0 THEN repeat(text || ' ', 24) "
        "ELSE text END AS text)"
    ),
    "events": (
        "SELECT * REPLACE (CASE WHEN event_id % 17 = 0 THEN '' "
        "WHEN event_id % 19 = 0 THEN '{}' ELSE props END AS props)"
    ),
}

#: round-7 addition: KEY SKEW — one mega-key absorbs a large share of a
#: fact table (user 7 gets ~33% of events; supplier 1 ~25% of lineitem;
#: customer 1 ~25% of orders; 20% of documents become ONE identical
#: mega-cluster). This is what dirty 100 TB data does to shuffles: a
#: single reducer partition carrying a third of the table, per-key
#: streaming state concentrated on one key, and a dedup bucket far past
#: the hot-bucket quarantine threshold. Results legitimately change (the
#: oracle reads the same skewed parquet); what the sweep checks is that
#: SKEW never changes answers — AQE skew splits, salted aggs, per-key
#: state, and the quarantine path must be value-neutral.
SKEW_MODS = {
    "events": (
        "SELECT * REPLACE ("
        "CASE WHEN user_id % 3 = 0 THEN 7 ELSE user_id END AS user_id)"
    ),
    "lineitem": (
        "SELECT * REPLACE ("
        "CASE WHEN l_suppkey % 4 = 0 THEN 1 ELSE l_suppkey END AS l_suppkey)"
    ),
    "orders": (
        "SELECT * REPLACE ("
        "CASE WHEN o_custkey % 4 = 0 THEN 1 ELSE o_custkey END AS o_custkey)"
    ),
    "documents": (
        "SELECT * REPLACE (CASE WHEN doc_id % 5 = 0 THEN "
        "'skewed mega cluster document about distributed deduplication "
        "banding and hot bucket quarantine at corpus scale' "
        "ELSE text END AS text)"
    ),
}

def _wide_extras(table: str) -> str:
    """Round-9 addition: WIDE SCHEMAS — the regime 100 TB warehouse tables
    actually have. lineitem grows to ~500 columns (ints, doubles,
    varchars, dates derived deterministically from the base row), orders
    to ~120, and events gains the nested shapes that stress readers and
    codegen: a 10-level-deep struct, a 48-field wide struct, a list of
    structs, and a map. Every registry query names its columns
    explicitly, so results must be IDENTICAL to the narrow tables —
    what the sweep checks is that scan pruning, vectorized parquet
    reading, and whole-stage codegen survive the width (Janino's 64 KB
    method limit and reader column-batch sizing are the classic failure
    modes), not that values moved. tests/test_wide_schema.py adds the
    paths no pruned query exercises: project-ALL aggregation, wide
    shuffles, deep-struct leaf access."""
    if table == "lineitem":
        cols = []
        for i in range(121):
            cols.append(f"l_orderkey * 7 + {i} AS wl_int_{i:03d}")
        for i in range(121):
            cols.append(f"l_extendedprice + {i} AS wl_dbl_{i:03d}")
        for i in range(121):
            cols.append(f"l_returnflag || '_{i}_' || l_linestatus AS wl_str_{i:03d}")
        for i in range(121):
            cols.append(f"l_shipdate + INTERVAL {i} DAY AS wl_ts_{i:03d}")
        return "SELECT *, " + ", ".join(cols)
    if table == "orders":
        cols = [f"o_orderkey * 3 + {i} AS wo_int_{i:03d}" for i in range(52)]
        cols += [f"o_totalprice + {i} AS wo_dbl_{i:03d}" for i in range(52)]
        return "SELECT *, " + ", ".join(cols)
    if table == "events":
        deep = "user_id + 41"
        for lvl in range(10, 0, -1):
            deep = f"struct_pack(l{lvl} := {deep})"
        wide_fields = ", ".join(
            f"f{i:02d} := event_id * {i + 1}" for i in range(48)
        )
        return (
            "SELECT *, "
            f"{deep} AS w_deep, "
            f"struct_pack({wide_fields}) AS w_wide, "
            "[struct_pack(k := event_type, v := user_id), "
            " struct_pack(k := event_type || '_x', v := user_id + 1)] AS w_list, "
            "MAP {event_type: user_id, 'const': event_id} AS w_map"
        )
    if table == "documents":
        cols = [f"doc_id * 11 + {i} AS wd_int_{i:03d}" for i in range(24)]
        return "SELECT *, " + ", ".join(cols)
    return "SELECT *"


WIDE_MODS = {
    t: _wide_extras(t) for t in ("lineitem", "orders", "events", "documents")
}

REGIMES = {
    "null": lambda t, rp: f"{NULL_MODS.get(t, 'SELECT *')} FROM {rp}",
    "wide": lambda t, rp: f"{WIDE_MODS.get(t, 'SELECT *')} FROM {rp}",
    "skew": lambda t, rp: f"{SKEW_MODS.get(t, 'SELECT *')} FROM {rp}",
    "keynull": lambda t, rp: f"{KEYNULL_MODS.get(t, 'SELECT *')} FROM {rp}",
    "unicode": lambda t, rp: f"{UNICODE_MODS.get(t, 'SELECT *')} FROM {rp}",
    "extremeval": lambda t, rp: f"{EXTREMEVAL_MODS.get(t, 'SELECT *')} FROM {rp}",
    "tsedge": lambda t, rp: f"{TSEDGE_MODS.get(t, 'SELECT *')} FROM {rp}",
    "textshape": lambda t, rp: f"{TEXTSHAPE_MODS.get(t, 'SELECT *')} FROM {rp}",
    "onerow": lambda t, rp: f"SELECT * FROM {rp} LIMIT 1",
    "empty": lambda t, rp: f"SELECT * FROM {rp} WHERE 1=0",
}


#: round-9 addition: FRAGMENTED tables — each `{t}.parquet` becomes a
#: DIRECTORY of this many part files with rows round-robin-interleaved
#: across parts and REVERSED within each part. This is the small-files
#: lake pathology at 100 TB (a table is never one file there), and the
#: adversarial row placement attacks the bug class the round-5 sweeps
#: kept finding: any operator whose answer silently depends on scan /
#: partition / file order (asof tie-breaks, first-seen flags,
#: deterministic sampling) diverges from the oracle the moment file
#: layout changes. Spark reads the directory natively; the DuckDB view
#: uses the glob form (tests/test_oracle_parity.py::duck_con).
FRAGMENT_PARTS = 16


def build_fragmented(out_root: str, src: str) -> str:
    import duckdb

    d = os.path.join(out_root, "fragmented")
    con = duckdb.connect()
    for t in TABLES:
        td = os.path.join(d, f"{t}.parquet")
        os.makedirs(td, exist_ok=True)
        con.execute(
            f"CREATE OR REPLACE TEMP TABLE tt AS "
            f"SELECT *, row_number() OVER () AS _rn "
            f"FROM read_parquet('{src}/{t}.parquet')"
        )
        for i in range(FRAGMENT_PARTS):
            con.execute(
                f"COPY (SELECT * EXCLUDE (_rn) FROM tt "
                f"WHERE _rn % {FRAGMENT_PARTS} = {i} ORDER BY _rn DESC) "
                f"TO '{td}/part-{i:02d}.parquet' (FORMAT parquet)"
            )
    con.close()
    return d


#: round-9 addition #2: SCHEMA-DRIFT tables — the evolution pathology a
#: bare-directory lake table accumulates: a column added months into the
#: table's life exists only in files written after that; the first-listed
#: (oldest) parts lack it entirely. Engines that sample ONE footer for
#: the schema (Spark's default, DuckDB without union_by_name) either
#: crash on the evolved column or silently drop it. Construction: the
#: fragmented 16-part interleave, but parts 0-7 (listed FIRST, so naive
#: single-footer sampling sees the PRE-evolution schema) are written
#: WITHOUT the evolved columns below, parts 8-15 carry the full schema.
#: Rows landing in old parts thus read as NULL for those columns on both
#: engines — value semantics the null/keynull regimes already certify;
#: what this regime tests is the SCHEMA DISCOVERY layer (load_table
#: mergeSchema, _stream_events probe, CLI footer union, duck_con
#: union_by_name).
DRIFT_EVOLVED: dict[str, str] = {
    "events": "props",
    "customer": "c_acctbal",
    "orders": "o_totalprice",
    "documents": "text",
}


def build_schemadrift(out_root: str, src: str) -> str:
    import duckdb

    d = os.path.join(out_root, "schemadrift")
    con = duckdb.connect()
    for t in TABLES:
        td = os.path.join(d, f"{t}.parquet")
        os.makedirs(td, exist_ok=True)
        con.execute(
            f"CREATE OR REPLACE TEMP TABLE tt AS "
            f"SELECT *, row_number() OVER () AS _rn "
            f"FROM read_parquet('{src}/{t}.parquet')"
        )
        evolved = DRIFT_EVOLVED.get(t)
        for i in range(FRAGMENT_PARTS):
            drop = f", {evolved}" if evolved is not None and i < 8 else ""
            con.execute(
                f"COPY (SELECT * EXCLUDE (_rn{drop}) FROM tt "
                f"WHERE _rn % {FRAGMENT_PARTS} = {i} ORDER BY _rn DESC) "
                f"TO '{td}/part-{i:02d}.parquet' (FORMAT parquet)"
            )
    con.close()
    return d


#: round-9 addition #3: HIVE-PARTITIONED tables — the partitioned-lake
#: layout: six tables become ``col=value`` directory trees (written by
#: DuckDB's PARTITION_BY, read by Spark's partition discovery), rows
#: REVERSED within each partition. What this regime tests that the flat
#: layouts cannot: (a) the partition column lives in the PATH, not in
#: any parquet footer — schema discovery must synthesize it (Spark
#: partition inference, duck_con hive_partitioning, the CLI's path-walk);
#: (b) partition values carrying a SPACE ('4-NOT SPECIFIED') and '#'
#: ('Brand#13') must round-trip through directory names; (c) filters on
#: the partition column should become PartitionFilters (directory
#: pruning), the 100 TB scan-avoidance primitive; (d) the streaming file
#: source must discover partitions per-file. Partition columns are the
#: low-cardinality never-NULL categoricals so the layout is realistic
#: (a date/category-partitioned lake) and the NULL-partition
#: (__HIVE_DEFAULT_PARTITION__) engine-model boundary stays out of scope.
HIVE_PARTITION: dict[str, str] = {
    "orders": "o_orderpriority",
    "lineitem": "l_returnflag",
    "customer": "c_mktsegment",
    "part": "p_brand",
    "events": "event_type",
    "documents": "lang",
}


def build_hive(out_root: str, src: str) -> str:
    """Partition values are written per-directory with the partition
    column EXCLUDED from the part files (the true hive layout — this
    DuckDB's PARTITION_BY also bakes the column into the files, which
    would let schema discovery cheat), rows reversed within each part."""
    import duckdb

    d = os.path.join(out_root, "hive")
    con = duckdb.connect()
    for t in TABLES:
        td = os.path.join(d, f"{t}.parquet")
        pcol = HIVE_PARTITION.get(t)
        if pcol is None:
            os.makedirs(d, exist_ok=True)
            con.execute(
                f"COPY (SELECT * FROM read_parquet('{src}/{t}.parquet')) "
                f"TO '{td}' (FORMAT parquet)"
            )
            continue
        con.execute(
            f"CREATE OR REPLACE TEMP TABLE tt AS "
            f"SELECT *, row_number() OVER () AS _rn "
            f"FROM read_parquet('{src}/{t}.parquet')"
        )
        vals = [
            r[0]
            for r in con.execute(
                f"SELECT DISTINCT {pcol} FROM tt ORDER BY 1"
            ).fetchall()
        ]
        for v in vals:
            pd_dir = os.path.join(td, f"{pcol}={v}")
            os.makedirs(pd_dir, exist_ok=True)
            con.execute(
                f"COPY (SELECT * EXCLUDE ({pcol}, _rn) FROM tt "
                f"WHERE {pcol} = '{v}' ORDER BY _rn DESC) "
                f"TO '{pd_dir}/data_0.parquet' (FORMAT parquet)"
            )
    con.close()
    return d


#: purge_derived_state moved to kiji_scoring_spark.state (r11 ADVICE) so
#: build_sf1.py shares it — every script that rewrites data under an
#: existing path purges that path's derived state.


def main() -> None:
    import duckdb

    out_root = sys.argv[1] if len(sys.argv) > 1 else "/tmp/regimes"
    src = os.environ.get("SPARK_GRAFT_SCALE_SRC_SMALL", "/root/testdata/sf0.001")
    for name, stmt_for in REGIMES.items():
        d = os.path.join(out_root, name)
        os.makedirs(d, exist_ok=True)
        con = duckdb.connect()
        for t in TABLES:
            stmt = stmt_for(t, f"read_parquet('{src}/{t}.parquet')")
            con.execute(f"COPY ({stmt}) TO '{d}/{t}.parquet' (FORMAT parquet)")
        con.close()
        purge_derived_state(d)
        print(f"built {name}: {d}")
    for builder, label in (
        (build_fragmented, "fragmented"),
        (build_schemadrift, "schemadrift"),
        (build_hive, "hive"),
    ):
        d = builder(out_root, src)
        purge_derived_state(d)
        print(f"built {label}: {d}")


if __name__ == "__main__":
    main()
