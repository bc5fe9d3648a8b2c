"""Driver correctness-cap rotation (__spark_entry__._correctness_priority).

With ~170 green queries and a 50-per-round driver cap, the green tier must
order least-recently-checked first or rows verified in early rounds (under
an older session conf) never re-verify. These tests pin that property
against the repo's real CORRECTNESS_r*.json history.
"""

import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod
from kiji_scoring_spark.queries import QUERIES


def _history():
    here = os.path.dirname(entry_mod.__file__)
    last_round, last_ok = {}, {}
    for path in sorted(glob.glob(os.path.join(here, "CORRECTNESS_r*.json"))):
        rn = int(re.search(r"r(\d+)", os.path.basename(path)).group(1))
        for name, r in json.load(open(path)).items():
            last_round[name] = rn
            ok = (
                bool(r.get("rows_match"))
                and bool(r.get("schema_match"))
                and bool(r.get("hash_match", True))
                and not r.get("err")
            )
            if r.get("err") == "no_oracle" and r.get("spark_rows") is not None:
                ok = True
            last_ok[name] = ok
    return last_round, last_ok


def test_priority_covers_registry_exactly():
    order = entry_mod._correctness_priority()
    assert sorted(order) == sorted(QUERIES)


def test_green_tier_rotates_least_recently_checked_first():
    order = entry_mod._correctness_priority()
    last_round, last_ok = _history()
    green_rounds = [last_round[n] for n in order if last_ok.get(n, False)]
    # staleness sort: green queries appear in non-decreasing last-checked
    # round, so the driver's cap always re-verifies the stalest rows first
    assert green_rounds == sorted(green_rounds)


def test_failed_and_unchecked_precede_green():
    order = entry_mod._correctness_priority()
    _, last_ok = _history()
    tiers = [2 if last_ok.get(n, None) else (1 if n not in last_ok else 0)
             for n in order]
    # every non-green (failed tier 0 / never-checked tier 1) query comes
    # before the first green one
    if 2 in tiers:
        first_green = tiers.index(2)
        assert all(t == 2 for t in tiers[first_green:])
