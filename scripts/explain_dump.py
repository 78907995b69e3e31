"""Dump .explain("formatted") for named registry queries to files.

Usage: python scripts/explain_dump.py OUTDIR SUFFIX name1 name2 ...
Writes OUTDIR/<name>_<SUFFIX>.txt for each query (the judge-facing plan
artifacts for optimization rounds).
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

    spark = get_spark("explain_dump")
    for name in names:
        df = plans.REGISTRY[name].fn(spark, SF_DIR)
        txt = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        )
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(txt)
        print(f"wrote {path} ({len(txt)} bytes)", flush=True)


if __name__ == "__main__":
    main()
