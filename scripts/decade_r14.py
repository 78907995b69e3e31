"""r14 decade measurement: median-of-3 noop-sink timings for the round's
touched queries at sf0.1 and .localdata/sf1, one session per SF (the
r12/r13 protocol: gc + clearCache between reps, medians, quiet box).

Usage: python scripts/decade_r14.py <sf_dir> [names...]
Prints one line per query: name median runs.
"""

from __future__ import annotations

import gc
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT_NAMES = [
    "graph_triangle_count_sampled",
    "graph_pagerank",
    "dedup_minhash_lsh",
    "dedup_threshold_sensitivity",
    "pipeline_split_leakage_audit",
    "dedup_cross_source_matrix",
    "dedup_minhash_accuracy_eval",
    "dedup_minhash_accuracy_eval_sampled",
    "pipeline_curation",
    "dedup_incremental",
    "text_bigram_topk",
    "text_ngram_novelty_rate",
    "text_perplexity_kneser_ney",
    "join_interval_overlap_binned",
    "sim_threshold_join_lsh_capped",
    "dedup_embedding_cosine_lsh",
]


def main() -> None:
    sf_dir = sys.argv[1]
    names = sys.argv[2:] or DEFAULT_NAMES
    from oracle_parquet_dumper_spark import plans
    from oracle_parquet_dumper_spark.session import get_spark
    from oracle_parquet_dumper_spark.sources.tables import load_table

    spark = get_spark("decade_r14")
    for t in ("lineitem", "orders", "documents", "embeddings", "events"):
        load_table(spark, sf_dir, t).count()
    for name in names:
        fn = plans.REGISTRY[name].fn
        runs = []
        for _ in range(3):
            gc.collect()
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            runs.append(time.perf_counter() - t0)
        runs.sort()
        print(
            f"{name}: median {runs[1]:.3f}s runs={[round(r, 2) for r in runs]}",
            flush=True,
        )


if __name__ == "__main__":
    main()
