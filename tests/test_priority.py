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
    green_rounds = [
        last_round[n]
        for n in order
        if last_ok.get(n, False) and n not in entry_mod._FORCE_RECHECK
    ]
    # staleness sort: green queries appear in non-decreasing last-checked
    # round, so the driver's cap always re-verifies the stalest rows first
    # (_FORCE_RECHECK greens are exempt: their row predates this round's
    # code change, so they deliberately jump the LRU queue)
    assert green_rounds == sorted(green_rounds)


def test_failed_and_unchecked_precede_green():
    order = entry_mod._correctness_priority()
    _, last_ok = _history()
    tiers = [
        3
        if (last_ok.get(n, None) and n not in entry_mod._FORCE_RECHECK)
        else (1 if n not in last_ok else 0 if not last_ok[n] else 2)
        for n in order
    ]
    # every non-LRU-green query (failed / never-checked / force-recheck)
    # comes before the first LRU green one
    if 3 in tiers:
        first_green = tiers.index(3)
        assert all(t == 3 for t in tiers[first_green:])


def test_never_checked_outrank_everything_in_registry_order():
    """Round-6 regression: the never-checked tier must come FIRST and in
    plain registry order — round 5's cheap-first sort inside this tier
    starved its expensive streaming queries past the 50 cap forever."""
    order = entry_mod._correctness_priority()
    _, last_ok = _history()
    never = [n for n in order if n not in last_ok]
    if not never:
        return
    k = len(never)
    # they occupy the first k slots (no failed rows exist in history; if
    # some round introduces one, it may precede them — detect that case)
    failed = [n for n in order if n in last_ok and not last_ok[n]]
    assert order[len(failed) : len(failed) + k] == never
    registry_pos = {n: i for i, n in enumerate(QUERIES)}
    assert [registry_pos[n] for n in never] == sorted(registry_pos[n] for n in never)


def test_force_recheck_precede_lru_greens():
    order = entry_mod._correctness_priority()
    _, last_ok = _history()
    forced_green = [
        n for n in entry_mod._FORCE_RECHECK if last_ok.get(n, False)
    ]
    lru_green = [
        n
        for n in order
        if last_ok.get(n, False) and n not in entry_mod._FORCE_RECHECK
    ]
    if not forced_green or not lru_green:
        return
    first_lru = order.index(lru_green[0])
    assert all(order.index(n) < first_lru for n in forced_green)
