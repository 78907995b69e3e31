"""Benchmark runner: times the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is materialized with the no-op sink so the measured time is
scan+compute+shuffle, not result transfer to the driver.  Each query
runs REPS times and reports the per-query MEDIAN (single-shot timings
showed ~3x phantom swings on byte-identical plans round over round);
"value" is the sum of medians.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    from oracle_parquet_dumper_spark import plans
    from oracle_parquet_dumper_spark.session import get_spark
    from oracle_parquet_dumper_spark.sources.tables import load_table

    spark = get_spark("bench")

    # Warm the JVM + parquet footers outside the timed region — every
    # table, so the first-alphabetical query doesn't absorb the cold
    # file-index/codegen cost of whichever tables it happens to touch.
    for t in (
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ):
        load_table(spark, SF_DIR, t).count()

    specs = plans.bench_queries()
    reps = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3")))
    timings: dict[str, float] = {}
    import gc

    for name, spec in sorted(specs.items()):
        runs = []
        for _ in range(reps):
            # Drain leftovers from the PREVIOUS run outside the timed
            # region: iterative queries eagerly localCheckpoint interim
            # relations whose blocks are only freed when the async
            # ContextCleaner notices the Python refs died — left alone,
            # that cleanup (and the executor-memory pressure it relieves)
            # lands randomly inside later timings and shows up as ±30%
            # phantom swings on byte-identical plans.
            gc.collect()
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            materialize(spec.fn(spark, SF_DIR))
            runs.append(time.perf_counter() - t0)
        runs.sort()
        mid = len(runs) // 2
        median = runs[mid] if len(runs) % 2 else (runs[mid - 1] + runs[mid]) / 2
        timings[name] = round(median, 4)

    sf = os.path.basename(SF_DIR.rstrip("/")).replace("sf", "")
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": round(sum(timings.values()), 4),
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf else SF_DIR,
            }
        )
    )


if __name__ == "__main__":
    main()
