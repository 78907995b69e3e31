"""Physical-plan auditing: parse a query's executed plan into a
structured report and lint it against the engine's scale rules.

The rules are the ones SCALING.md argues and tests/test_plans.py pins
per-query; this module makes them a reusable, user-facing tool:

    python -m oracle_parquet_dumper_spark.plans.audit q1_pricing_summary
    python -m oracle_parquet_dumper_spark.plans.audit --all

``--all`` lints every registered query and exits non-zero if any
non-exempt query violates a rule — the same contract the test suite
enforces, usable against a live cluster before shipping a new query.
The reference has no planner at all (its only "plan" is generated SQL
text, main.py:144-146); this is Part B engine tooling.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field


@dataclass
class PlanAudit:
    name: str
    exchanges: int = 0
    broadcast_exchanges: int = 0
    broadcast_joins: int = 0
    sort_merge_joins: int = 0
    nested_loop_joins: int = 0
    cartesian_products: int = 0
    global_sorts: int = 0
    raw_global_sorts: int = 0
    take_ordered: int = 0
    python_eval: int = 0
    scans: int = 0
    pushed_filter_scans: int = 0
    codegen_stages: int = 0
    aqe: bool = False
    warnings: list[str] = field(default_factory=list)


# Queries allowed to violate a rule, with the reason recorded here so an
# exemption is a documented decision, not a silent skip.
EXEMPT: dict[str, set[str]] = {
    # pandas/python execution is the point of the UDF surface + the
    # mapInPandas multimodal kernels
    "python": {"udf", "pandas_udf", "multimodal", "iterative"},
    # demo-tagged queries knowingly keep the naive shape
    "demo": {"demo"},
}


def audit_text(name: str, plan: str) -> PlanAudit:
    """Parse the executedPlan string (AQE final or initial) into counts."""
    a = PlanAudit(name=name)
    a.exchanges = len(re.findall(r"\bExchange (?:hash|range|Single)", plan))
    a.broadcast_exchanges = plan.count("BroadcastExchange")
    a.broadcast_joins = plan.count("BroadcastHashJoin")
    a.sort_merge_joins = plan.count("SortMergeJoin")
    a.nested_loop_joins = plan.count("BroadcastNestedLoopJoin")
    a.cartesian_products = plan.count("CartesianProduct")
    # a Sort with global=true ("Sort [...], true, 0") is a full-shuffle sort
    a.global_sorts = len(re.findall(r"\bSort \[[^\]]*\], true,", plan))
    # a global sort ABOVE an aggregate orders already-reduced output
    # (bounded rows — fine); one with no aggregate below it orders raw
    # data (the 100 TB foot-gun).  Plans print parent-first, so "no
    # aggregate at any later position" ~= "no aggregate descendant".
    agg_positions = [m.start() for m in re.finditer(r"(?:Hash|Sort|ObjectHash)Aggregate", plan)]
    a.raw_global_sorts = sum(
        1
        for m in re.finditer(r"\bSort \[[^\]]*\], true,", plan)
        if not any(p > m.start() for p in agg_positions)
    )
    a.take_ordered = plan.count("TakeOrderedAndProject")
    # Exact node names — substring counting would double-count
    # ArrowEvalPython (contains "EvalPython") and miss the grouped-map
    # nodes (FlatMapGroupsInPandas is applyInPandas's physical operator).
    a.python_eval = len(
        re.findall(
            r"\b(?:BatchEvalPython|ArrowEvalPython|MapInPandas|"
            r"FlatMapGroupsInPandas|FlatMapCoGroupsInPandas|"
            r"FlatMapGroupsInPandasWithState|PythonMapInArrow|MapInArrow)\b",
            plan,
        )
    )
    a.scans = plan.count("FileScan") + plan.count("BatchScan")
    a.pushed_filter_scans = len(
        re.findall(r"PushedFilters: \[(?!\])", plan)
    )
    a.codegen_stages = len(set(re.findall(r"\*\((\d+)\)", plan)))
    a.aqe = "AdaptiveSparkPlan" in plan
    return a


def lint(a: PlanAudit, tags: tuple[str, ...] = ()) -> list[str]:
    """Apply the engine's scale rules; returns human-readable violations."""
    t = set(tags)
    w: list[str] = []
    if a.cartesian_products and not (t & EXEMPT["demo"]):
        w.append("CartesianProduct: unbounded pair blow-up at scale")
    if a.python_eval and not (t & EXEMPT["python"]):
        w.append("Python execution in a relational path (should be JVM-side)")
    if a.raw_global_sorts and not a.take_ordered and "sort" not in t:
        w.append(
            f"{a.raw_global_sorts} global sort(s) over unaggregated data — "
            "full-shuffle ordering; use top-k or sortWithinPartitions"
        )
    # graph analytics (wedge/closing joins) and multi-stage pipeline
    # resamplers legitimately chain many keyed exchanges; everything
    # else above the threshold has historically been accidental subtree
    # re-derivation (graph_triangle_count hit 109 before materializing
    # its oriented-edge relation once).
    if a.exchanges > 10 and not (t & {"iterative", "graph", "pipeline"}):
        w.append(f"{a.exchanges} exchanges — audit for a reusable partitioning")
    a.warnings = w
    return w


def audit_query(spark, sf_dir: str, name: str, df=None) -> PlanAudit:
    """Audit one registered query.  Pass ``df`` to reuse an
    already-built DataFrame instead of re-running the query function
    (planning a query twice doubles the tool's wall-clock)."""
    from oracle_parquet_dumper_spark.plans import REGISTRY

    spec = REGISTRY[name]
    if df is None:
        df = spec.fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    a = audit_text(name, plan)
    lint(a, spec.tags)
    return a


def _fmt(a: PlanAudit) -> str:
    parts = [
        f"exchanges={a.exchanges}",
        f"bcast_join={a.broadcast_joins + a.nested_loop_joins}",
        f"smj={a.sort_merge_joins}",
        f"scans={a.scans}(pushed={a.pushed_filter_scans})",
        f"codegen={a.codegen_stages}",
        f"topk={a.take_ordered}",
        f"gsort={a.global_sorts}(raw={a.raw_global_sorts})",
        f"py={a.python_eval}",
    ]
    return " ".join(parts)


def main(argv: list[str] | None = None) -> int:
    import argparse

    from oracle_parquet_dumper_spark import plans
    from oracle_parquet_dumper_spark.session import get_spark

    p = argparse.ArgumentParser(
        prog="python -m oracle_parquet_dumper_spark.plans.audit",
        description="Audit registered query plans against the engine's scale rules.",
    )
    p.add_argument("query", nargs="?", help="registered query name (see OPERATORS.md)")
    p.add_argument("--all", action="store_true", help="lint every registered query")
    p.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    p.add_argument("--explain", action="store_true", help="also print the full plan")
    args = p.parse_args(argv)
    if not args.query and not args.all:
        p.error("give a query name or --all")

    spark = get_spark("plan_audit")
    names = sorted(plans.REGISTRY) if args.all else [args.query]
    bad = 0
    for name in names:
        if name not in plans.REGISTRY:
            print(f"unknown query: {name}")
            return 2
        df = plans.REGISTRY[name].fn(spark, args.sf_dir)
        a = audit_query(spark, args.sf_dir, name, df=df)
        status = "WARN" if a.warnings else "ok"
        print(f"{name:40s} {status:4s} {_fmt(a)}")
        for msg in a.warnings:
            print(f"    - {msg}")
        bad += bool(a.warnings)
        if args.explain:
            print(df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
            ))
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
