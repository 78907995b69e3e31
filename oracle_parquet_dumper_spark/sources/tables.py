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
    future switch to a catalog/Delta/iceberg source is one-line."""
    return spark.read.parquet(table_path(sf_dir, name))


def register_views(spark: SparkSession, sf_dir: str, tables: list[str] | None = None) -> None:
    """Register fixture tables as temp views for the SQL API surface."""
    for name in tables or TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
