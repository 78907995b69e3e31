"""Wrap gate: the LAST step before any end-of-round / snapshot commit.

Rounds 7 and 8 both shipped snapshot commits that tripped the registry
hygiene ratchet AFTER the fact (OPERATORS.md/README behind the live
registry, new queries without planted tests) — the ratchet existed but
ran after the horse left (VERDICT r8 #1).  This script makes the wrap
procedure mechanical:

    python scripts/wrap_check.py        # exit 0 = safe to commit

It runs, in order:
  1. the registry/doc hygiene suite (counts, by-name test references),
  2. the plan-shape suite (scale-rule regressions),
and exits non-zero on the first failure.  Anything that registers a new
query mid-round must come back here before committing.
"""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SUITES = [
    ["tests/test_registry_hygiene.py"],
    ["tests/test_plans.py"],
]


def main() -> int:
    for suite in SUITES:
        print(f"wrap_check: pytest {' '.join(suite)}", flush=True)
        rc = subprocess.call(
            [sys.executable, "-m", "pytest", "-q", *suite], cwd=REPO
        )
        if rc != 0:
            print(f"wrap_check: FAILED on {suite} (rc={rc}) — do not commit")
            return rc
    print("wrap_check: all gates green — safe to commit")
    return 0


if __name__ == "__main__":
    sys.exit(main())
