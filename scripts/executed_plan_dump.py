"""Dump the FINAL ADAPTIVE (executed) plan for named registry queries.

Usage: python scripts/executed_plan_dump.py OUTDIR SUFFIX name1 name2 ...

Unlike scripts/explain_dump.py (initial plan, isFinalPlan=false), this
runs each query to completion through the noop sink first, so the dump
shows what AQE actually executed — ReusedExchange nodes, AQEShuffleRead
coalescing, runtime join-strategy changes (VERDICT r14 "Next" #4: the
static dumps could not prove the band-relation exchange reuse).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    outdir, suffix, names = sys.argv[1], sys.argv[2], sys.argv[3:]
    os.makedirs(outdir, exist_ok=True)
    from oracle_parquet_dumper_spark import plans
    from oracle_parquet_dumper_spark.session import get_spark

    spark = get_spark("executed_plan_dump")
    for name in names:
        df = plans.REGISTRY[name].fn(spark, SF_DIR)
        # collect() (not a noop write, which builds a SEPARATE
        # QueryExecution) so THIS df's adaptive plan is finalized
        df.collect()
        txt = df._jdf.queryExecution().executedPlan().toString()
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(txt)
        reused = txt.count("ReusedExchange")
        print(f"wrote {path} ({len(txt)} bytes, ReusedExchange x{reused})", flush=True)


if __name__ == "__main__":
    main()
