"""Fixture table loaders.

The driver's correctness harness points every query at a directory of
parquet files (one per table, ``/root/testdata/sf*/<name>.parquet``).
Loading goes through ``spark.read.parquet`` so Catalyst's vectorized
reader, predicate pushdown, and column pruning all apply — at 100 TB the
same call reads a partitioned table directory instead of one file, with
no code change.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

# Small dimension tables that should always broadcast in joins.
BROADCAST_DIMS = {"region", "nation", "supplier"}

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one fixture table. Keep this the single scan entry point so a
    future switch to a catalog/Delta/iceberg source is one-line.

    ``events.ts`` is a nanosecond parquet timestamp, which Spark's parquet
    reader rejects outright (PARQUET_TYPE_ILLEGAL); we read it as raw
    nanos (``nanosAsLong``) and truncate to microseconds — exactly what
    DuckDB's ``CAST(ts AS TIMESTAMP)`` does — yielding TIMESTAMP_NTZ like
    every other fixture timestamp."""
    from pyspark.sql import functions as F

    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(table_path(sf_dir, name))
        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn(
                "ts", F.timestamp_micros(F.expr("ts div 1000")).cast("timestamp_ntz")
            )
        return df
    return spark.read.parquet(table_path(sf_dir, name))


def register_views(spark: SparkSession, sf_dir: str, tables: list[str] | None = None) -> None:
    """Register fixture tables as temp views for the SQL API surface."""
    for name in tables or TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
