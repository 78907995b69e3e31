"""Fit per-query scaling exponents from bench runs at several scale
factors.

Usage: python scripts/scaling_fit.py out_sf0.01.json out_sf0.1.json out_sf1.json

Each input is one bench.py JSON line (run with SPARK_GRAFT_SF_DIR
pointed at the fixture for that SF).  For every query present in all
runs, fits t ~ c * sf^alpha by least squares on log-log points and
prints a markdown table sorted by alpha — the number that says which
queries would NOT survive a 100x scale-up (alpha near 1 = linear scan
bound, near 0 = fixed-cost dominated at these sizes; >1.2 deserves an
explanation or a fix).

Wall-clock at tiny SFs is mostly fixed overhead (JVM, planning,
scheduling ~0.2-0.5 s/query), so alpha is fit on the raw times and
UNDERSTATES true data-scaling at the small end; the sf0.1 -> sf1 decade
is the informative one and is also printed as a plain ratio.
"""

from __future__ import annotations

import json
import math
import sys


def main() -> None:
    runs = []
    for path in sys.argv[1:]:
        with open(path) as f:
            runs.append(json.load(f))
    if len(runs) < 2:
        raise SystemExit("need >= 2 bench json files")
    runs.sort(key=lambda r: r["sf"])
    names = set(runs[0]["queries"])
    for r in runs[1:]:
        names &= set(r["queries"])

    rows = []
    for name in sorted(names):
        pts = [(math.log(r["sf"]), math.log(r["queries"][name])) for r in runs]
        n = len(pts)
        mx = sum(x for x, _ in pts) / n
        my = sum(y for _, y in pts) / n
        alpha = sum((x - mx) * (y - my) for x, y in pts) / sum(
            (x - mx) ** 2 for x, _ in pts
        )
        last_ratio = runs[-1]["queries"][name] / runs[-2]["queries"][name]
        rows.append((alpha, last_ratio, name))

    sfs = "/".join(str(r["sf"]) for r in runs)
    print(f"| query | alpha (sf {sfs}) | t({runs[-2]['sf']}) s | t({runs[-1]['sf']}) s | last-decade ratio |")
    print("|---|---|---|---|---|")
    for alpha, ratio, name in sorted(rows, reverse=True):
        t_prev = runs[-2]["queries"][name]
        t_last = runs[-1]["queries"][name]
        print(f"| {name} | {alpha:.2f} | {t_prev:.2f} | {t_last:.2f} | {ratio:.1f}x |")
    total_prev = runs[-2]["value"]
    total_last = runs[-1]["value"]
    print(f"\ntotal: {total_prev:.1f} s -> {total_last:.1f} s "
          f"({total_last / total_prev:.1f}x for {runs[-1]['sf'] / runs[-2]['sf']:.0f}x data)")


if __name__ == "__main__":
    main()
