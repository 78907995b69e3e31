"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over ``oracle_parquet_dumper_spark.plans`` — the query registry
is the single source of truth; this file only adapts it to the driver's
three-function interface (entry / queries / oracle_sql).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from oracle_parquet_dumper_spark import plans  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1-style pricing summary) on sf0.001."""
    return plans.REGISTRY["q1_pricing_summary"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return plans.all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL for each SQL-expressible query."""
    return plans.all_oracles()
