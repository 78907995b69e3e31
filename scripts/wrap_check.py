"""Wrap gate: the LAST step before any end-of-round / snapshot commit.

Rounds 7 and 8 both shipped snapshot commits that tripped the registry
hygiene ratchet AFTER the fact (OPERATORS.md/README behind the live
registry, new queries without planted tests) — the ratchet existed but
ran after the horse left (VERDICT r8 #1).  This script makes the wrap
procedure mechanical:

    python scripts/wrap_check.py        # exit 0 = safe to commit

It runs, in order:
  1. the registry/doc hygiene suite (counts, by-name test references,
     LSH band-domain rule),
  2. the plan-shape suite (scale-rule regressions),
  3. the FULL-REGISTRY sf1 sweep record check (VERDICT r9 #5): the
     round-9 ad-hoc sweep caught the only real scale bug of its round,
     so it is now a standing artifact — ``SWEEP_sf1*.json`` files at
     the repo root (written by ``scripts/cross_sf_sweep.py --record``,
     shardable) must together cover every oracle-checked query except
     the PINNED exclusions below, with zero failures,
and exits non-zero on the first failure.  Anything that registers a new
query mid-round must come back here before committing (a new query
missing from the sweep record fails stage 3 until re-swept).
"""

from __future__ import annotations

import glob
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SUITES = [
    ["tests/test_registry_hygiene.py"],
    ["tests/test_plans.py"],
]

# The ONLY queries that may be excluded from the sf1 sweep — both have
# deliberately brute-force O(n^2) DuckDB twins ("banded == brute force"
# is the property checked, DuckDB-tractable at sf <= 0.1 only) or replay
# an output-bound computation whose sf1 cost equals the engine's
# (adjudicated, SCALING.md round-9).  Growing this set requires a
# written ruling in SCALING.md AND an edit here — a review-visible act.
SF1_SWEEP_EXCLUSIONS = {"mm_phash_neardup", "dedup_fuzzy_levenshtein_lsh"}


def check_sf1_sweep_record() -> int:
    sys.path.insert(0, REPO)
    from oracle_parquet_dumper_spark import plans

    oracle_names = set(plans.all_oracles())
    records = sorted(glob.glob(os.path.join(REPO, "SWEEP_sf1*.json")))
    if not records:
        print(
            "wrap_check: NO sf1 sweep record (SWEEP_sf1*.json) — run "
            "scripts/cross_sf_sweep.py <sf1_dir> --record SWEEP_sf1.json "
            "--exclude ... before the wrap commit"
        )
        return 1
    results: dict[str, dict] = {}
    excluded: set[str] = set()
    for path in records:
        with open(path) as fh:
            rec = json.load(fh)
        results.update(rec.get("results", {}))
        excluded.update(rec.get("excluded", []))
    rogue = excluded - SF1_SWEEP_EXCLUSIONS
    if rogue:
        print(f"wrap_check: UNPINNED sf1 exclusions {sorted(rogue)} — every "
              "exclusion needs a written ruling (SCALING.md) and a "
              "SF1_SWEEP_EXCLUSIONS edit")
        return 1
    missing = oracle_names - set(results) - SF1_SWEEP_EXCLUSIONS
    if missing:
        print(f"wrap_check: sf1 sweep record missing {len(missing)} "
              f"oracle-checked queries (e.g. {sorted(missing)[:5]}) — re-sweep")
        return 1
    failed = sorted(n for n, r in results.items() if not r.get("ok"))
    if failed:
        print(f"wrap_check: sf1 sweep FAILURES: {failed}")
        return 1
    print(
        f"wrap_check: sf1 sweep record ok — {len(results)} green, "
        f"exclusions pinned ({sorted(excluded)})"
    )
    return 0


def main() -> int:
    for suite in SUITES:
        print(f"wrap_check: pytest {' '.join(suite)}", flush=True)
        rc = subprocess.call(
            [sys.executable, "-m", "pytest", "-q", *suite], cwd=REPO
        )
        if rc != 0:
            print(f"wrap_check: FAILED on {suite} (rc={rc}) — do not commit")
            return rc
    rc = check_sf1_sweep_record()
    if rc != 0:
        print("wrap_check: FAILED on sf1 sweep record — do not commit")
        return rc
    print("wrap_check: all gates green — safe to commit")
    return 0


if __name__ == "__main__":
    sys.exit(main())
