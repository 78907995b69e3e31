"""Config-tier A/B (guide §1.2 tier 3, VERDICT r14 "Next" #6): shuffle
codec (lz4 vs zstd) and AQE advisory partition size, measured on the
multi-second shuffle-heavy queries.

spark.io.compression.codec is JVM-session-fixed, so a within-session
interleave is impossible for the codec leg; instead each INVOCATION of
this script is one session with one config, timing the query set
(median of reps), and the caller alternates invocations A B A B so box
drift averages out across the alternation (the same defense the
interleaved A/B gives within a session).

Usage: python scripts/config_ab_r15.py <label> [reps]
  label: base | zstd | adv64 | adv256 | zstd_adv64
Prints one JSON line {"label": ..., "queries": {name: median_sec}}.
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

QUERIES = [
    "dedup_minhash_lsh",
    "dedup_clusters",
    "graph_pagerank",
    "graph_triangle_count_sampled",
    "sim_threshold_join_lsh_capped",
    "dedup_embedding_cosine_lsh",
]

CONFS = {
    "base": {},
    "zstd": {"spark.io.compression.codec": "zstd"},
    "adv64": {"spark.sql.adaptive.advisoryPartitionSizeInBytes": str(64 << 20)},
    "adv256": {"spark.sql.adaptive.advisoryPartitionSizeInBytes": str(256 << 20)},
    "zstd_adv64": {
        "spark.io.compression.codec": "zstd",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": str(64 << 20),
    },
}


def main() -> None:
    label = sys.argv[1]
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    from oracle_parquet_dumper_spark import plans
    from oracle_parquet_dumper_spark.session import get_spark
    from oracle_parquet_dumper_spark.sources.tables import load_table

    spark = get_spark("config_ab_" + label, extra_conf=CONFS[label])
    for t in ("orders", "lineitem", "documents", "events", "embeddings"):
        load_table(spark, SF_DIR, t).count()
    out = {}
    for name in QUERIES:
        runs = []
        for _ in range(reps):
            gc.collect()
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            plans.REGISTRY[name].fn(spark, SF_DIR).write.format("noop").mode(
                "overwrite"
            ).save()
            runs.append(time.perf_counter() - t0)
        runs.sort()
        out[name] = round(runs[len(runs) // 2], 4)
    print(json.dumps({"label": label, "queries": out, "total": round(sum(out.values()), 4)}))


if __name__ == "__main__":
    main()
