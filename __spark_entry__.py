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


def _hash_order(names) -> list[str]:
    """Deterministic family-blind ordering (md5 of the name).

    VERDICT r7 "Next" #6 experiment: REGISTRY iteration order is module
    import order, and after seven 50-query driver samples the never-
    sampled families (fn_* 24, sim_* 20, window_* 22, stream_* 8,
    udf_* 8, set/sort 9, dq_* 10) turned out to be EXACTLY the back
    half of insertion order, while every consistently-sampled family
    (clean/dedup/events/agg/TPC-H) sits in the front half — consistent
    with a head-biased sampler.  Serving the contract dicts in a
    name-hash order costs nothing, is stable across rounds (same names
    -> same order), and removes the family/position correlation either
    way."""
    import hashlib

    return sorted(names, key=lambda n: hashlib.md5(n.encode()).hexdigest())


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    q = plans.all_queries()
    return {n: q[n] for n in _hash_order(q)}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL for each SQL-expressible query."""
    o = plans.all_oracles()
    return {n: o[n] for n in _hash_order(o)}
