"""Capture .explain("formatted") output for named registry queries into
plans/<round>/<query>_<tag>.txt (guide §1: measure first, keep plan
evidence).

Usage:
    python scripts/capture_plans.py <round> <tag> <query1> [<query2> ...]
    python scripts/capture_plans.py <round> <tag> --top N   # N slowest from
                                                            # the latest
                                                            # bench detail

<round> is the output dir under plans/ (e.g. "r16"); the tag is usually
"before" or "after" (r15's script hard-coded plans/r15 and crashed without
a query list — ADVICE r15). Also times one cold count() per query (label
only — bench.py medians stay the official numbers).
"""

from __future__ import annotations

import io
import json
import os
import sys
import time
from contextlib import redirect_stdout

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

from kiji_scoring_spark.queries import QUERIES  # noqa: E402
from kiji_scoring_spark.session import get_spark  # noqa: E402

USAGE = (
    "usage: capture_plans.py <round-dir e.g. r16> <tag> "
    "(<query> [<query> ...] | --top N)"
)


def main() -> None:
    if len(sys.argv) < 4:
        raise SystemExit(USAGE)
    round_dir, tag = sys.argv[1], sys.argv[2]
    if sys.argv[3] == "--top":
        if len(sys.argv) < 5:
            raise SystemExit(USAGE)
        n = int(sys.argv[4])
        details = sorted(
            p for p in os.listdir(HERE) if p.startswith("BENCH_DETAIL_r")
        )
        with open(os.path.join(HERE, details[-1])) as f:
            per_q = json.load(f)["queries"]
        names = [
            q
            for q, _ in sorted(per_q.items(), key=lambda kv: -kv[1])
            if not q.startswith("streaming_")
        ][:n]
    else:
        names = sys.argv[3:]
    unknown = [n for n in names if n not in QUERIES]
    if unknown:
        raise SystemExit(f"not in the registry: {unknown}")

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="plan-capture")
    spark.sparkContext.setLogLevel("ERROR")
    out_dir = os.path.join(HERE, "plans", round_dir)
    os.makedirs(out_dir, exist_ok=True)

    for name in names:
        spark.sparkContext.setJobDescription(f"capture:{name}")
        t0 = time.perf_counter()
        df = QUERIES[name].fn(spark, sf_dir)
        t_build = time.perf_counter() - t0
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        t0 = time.perf_counter()
        df.count()
        t_run = time.perf_counter() - t0
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(
                f"-- query: {name}  tag: {tag}  sf_dir: {sf_dir}\n"
                f"-- df-build (driver, plan construction): {t_build:.3f}s; "
                f"one cold count(): {t_run:.3f}s (bench medians are the "
                f"official timings)\n"
            )
            f.write(buf.getvalue())
        print(f"{name}: build {t_build:.3f}s, count {t_run:.3f}s -> {path}")

    spark.stop()


if __name__ == "__main__":
    main()
