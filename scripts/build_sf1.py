"""Materialize an ~sf1 dataset (10x sf0.1) for the FULL-registry parity
sweep and the scaling bench recorded in REGIMES.md.

Same id-remap construction as tests/test_scale_spot.py's session fixture
(id -> id*10 + copy on the fact/corpus tables, dimension tables and
foreign keys untouched; lineitem and orders remap their SHARED order key
identically so the join graph stays consistent), but written to a stable
path so the whole-registry sweep and the sf0.1-vs-sf1 bench comparison
are one reproducible command:

    python scripts/build_sf1.py /tmp/sf1
    SPARK_GRAFT_CPUS=32 SPARK_GRAFT_SHUFFLE=32 \
        SPARK_GRAFT_SF_DIR_TEST=/tmp/sf1 \
        python -m pytest tests/test_oracle_parity.py -q

Why replication instead of a synthetic generator: both engines read the
SAME parquet, so the parity contract is unchanged — only data volume,
group sizes, and tie density grow (each original id now has 10 copies
sharing every non-key attribute, which floods rank/median/percentile
paths with exact ties — historically where scale bugs live).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from kiji_scoring_spark.sources import TABLES  # noqa: E402
from kiji_scoring_spark.state import purge_derived_state  # noqa: E402

#: 10x replication with id remap for the fact/corpus tables (shared keys
#: remapped identically on both sides; dimension keys untouched)
REPLICATED = {
    "documents": "doc_id",
    # embeddings joined the replication set in round 10 so the ANN/
    # similarity family has real corpus mass at the scale tiers (it was
    # previously copied as a fixed 2000-row dimension table, leaving the
    # sf100 tier with no vector mass to search). vec_id remaps like the
    # other corpus keys; chained decades compose to vec_id*1000 + copy.
    "embeddings": "vec_id",
    "events": "event_id",
    "lineitem": "l_orderkey",
    "orders": "o_orderkey",
}


def build(src: str, dest: str, copies: int = 10) -> None:
    import duckdb

    os.makedirs(dest, exist_ok=True)
    con = duckdb.connect()
    for t in TABLES:
        sp, dp = f"{src}/{t}.parquet", f"{dest}/{t}.parquet"
        if t in REPLICATED:
            k = REPLICATED[t]
            con.execute(
                f"""
                COPY (
                  SELECT p.* REPLACE (p.{k} * {copies} + c.copy AS {k})
                  FROM read_parquet('{sp}') p,
                       (SELECT unnest(range({copies})) AS copy) c
                ) TO '{dp}' (FORMAT parquet)
                """
            )
        else:
            con.execute(
                f"COPY (SELECT * FROM read_parquet('{sp}')) TO '{dp}' (FORMAT parquet)"
            )
        print(f"built {t}")
    con.close()
    # Rebuilding a tier dir in place invalidates every cache keyed to its
    # path (ddsketch/HLL/bitmap shards, binaryFile materializations,
    # bucketed tables) — the r10 stale-state failure class. Purge here,
    # exactly like build_regimes.py does for its dirs.
    purge_derived_state(dest)


if __name__ == "__main__":
    dest = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
    src = os.environ.get("SPARK_GRAFT_SCALE_SRC", "/root/testdata/sf0.1")
    build(src, dest)
    print(f"sf1-ish dataset at {dest}")
