"""Storage layouts for scale: hive-partitioned datasets and bucketed
tables (SURVEY.md §2 Part B sources row; SCALING.md co-location story).

Two layouts turn the engine's biggest shuffles into metadata operations:

- **Hive partitioning** (``partitionBy`` directories): predicates on the
  partition column prune whole directories at planning time — the scan
  never lists, let alone reads, the excluded partitions.  The right
  layout for low-cardinality routing columns (lang, source, dt).

- **Bucketing** (``bucketBy`` + ``saveAsTable``): rows are pre-hashed
  into a fixed bucket count on the join/agg key, so a join of two
  tables bucketed on the same key by the same count runs with NO
  exchange on either side — the shuffle happened once at write time and
  is amortized over every subsequent join.  The right layout for the
  huge fact-fact joins (orders x lineitem) that dominate 100 TB plans.
  ``tests/test_layouts.py`` asserts the exchange-free plan.

The reference (main.py:110-189) always writes one flat directory per
table; both layouts here are Part B extensions over its sink.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    compression: str = "zstd",
    mode: str = "overwrite",
) -> None:
    """Hive-partitioned parquet dataset: one directory level per
    partition column value.  Keep partition columns low-cardinality —
    each distinct tuple is a directory and at least one file; a
    high-cardinality partition column is the small-files anti-pattern."""
    (
        df.write.mode(mode)
        .option("compression", compression)
        .partitionBy(*partition_cols)
        .parquet(path)
    )


def read_partitioned(
    spark: SparkSession, path: str, schema: T.StructType | None = None
) -> DataFrame:
    """Read a hive-partitioned dataset.  Filters on partition columns
    become ``PartitionFilters`` in the scan (directory pruning);
    ``basePath`` semantics and partition-column typing follow Spark's
    defaults (partition values parse as strings unless
    ``spark.sql.sources.partitionColumnTypeInference.enabled``)."""
    r = spark.read
    if schema is not None:
        r = r.schema(schema)
    return r.parquet(path)


def write_bucketed_table(
    df: DataFrame,
    table: str,
    path: str,
    bucket_col: str,
    n_buckets: int,
    sort_col: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed parquet table in the session
    catalog.  ``n_buckets`` is the write-time shuffle width AND the
    read-time parallelism floor — pick it from target partition size
    (total bytes / 128 MB), not from cluster size, and use the SAME
    count for every table that joins on ``bucket_col``; mismatched
    counts reintroduce one side's exchange."""
    w = df.write.mode(mode).option("path", path).bucketBy(n_buckets, bucket_col)
    if sort_col is not None:
        w = w.sortBy(sort_col)
    w.format("parquet").saveAsTable(table)


def bucketed_join(spark: SparkSession, left_table: str, right_table: str, on: str) -> DataFrame:
    """Join two same-bucketed catalog tables on their bucket key.  With
    bucketing aligned this plans as a SortMergeJoin whose children are
    bare bucketed scans — zero Exchange nodes (asserted in
    tests/test_layouts.py); the only remaining cost is the per-bucket
    sort, which ``sort_col`` at write time also removes.  The merge hint
    pins the fact-fact shape (at fixture scale size stats would pick a
    broadcast and never exercise the bucketing)."""
    return spark.table(left_table).hint("merge").join(spark.table(right_table), on)
