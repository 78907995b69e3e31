"""Set operations + global sort / top-k / limit / distinct.

The reference's only ordering is catalog order (main.py:98,201) and its
only row-limiting is FETCH FIRST (main.py:145-146, mapped here to
``df.limit``); set operations are Part B extensions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from oracle_parquet_dumper_spark.plans.registry import query
from oracle_parquet_dumper_spark.sources.tables import load_table


def _half_keys(spark, sf_dir):
    """Two overlapping customer-key sets: buyers of cheap vs pricey orders."""
    o = load_table(spark, sf_dir, "orders")
    lo = o.where(F.col("o_totalprice") < 100000).select(F.col("o_custkey").alias("custkey"))
    hi = o.where(F.col("o_totalprice") >= 150000).select(F.col("o_custkey").alias("custkey"))
    return lo, hi


_HALF_SQL = """
    lo AS (SELECT o_custkey AS custkey FROM orders WHERE o_totalprice < 100000),
    hi AS (SELECT o_custkey AS custkey FROM orders WHERE o_totalprice >= 150000)
"""


@query(
    "set_union_all",
    oracle=f"WITH {_HALF_SQL} SELECT custkey, COUNT(*) AS n FROM (SELECT * FROM lo UNION ALL SELECT * FROM hi) GROUP BY custkey",
    tags=("setop",),
)
def set_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL (bag semantics) — aggregated so duplicates are observable."""
    lo, hi = _half_keys(spark, sf_dir)
    return lo.unionAll(hi).groupBy("custkey").agg(F.count(F.lit(1)).alias("n"))


@query(
    "set_union_distinct",
    oracle=f"WITH {_HALF_SQL} SELECT custkey FROM lo UNION SELECT custkey FROM hi",
    tags=("setop",),
    bench=True,
)
def set_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    lo, hi = _half_keys(spark, sf_dir)
    return lo.union(hi).distinct()


@query(
    "set_intersect",
    oracle=f"WITH {_HALF_SQL} SELECT custkey FROM lo INTERSECT SELECT custkey FROM hi",
    tags=("setop",),
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    lo, hi = _half_keys(spark, sf_dir)
    return lo.intersect(hi)


@query(
    "set_except",
    oracle=f"WITH {_HALF_SQL} SELECT custkey FROM lo EXCEPT SELECT custkey FROM hi",
    tags=("setop",),
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL EXCEPT is set-based: ``subtract`` (distinct anti-join), not the
    bag-semantics ``exceptAll``."""
    lo, hi = _half_keys(spark, sf_dir)
    return lo.subtract(hi)


@query(
    "set_symmetric_diff",
    oracle=f"""WITH {_HALF_SQL}
    SELECT custkey, 'lo_only' AS side FROM (SELECT custkey FROM lo EXCEPT SELECT custkey FROM hi)
    UNION ALL
    SELECT custkey, 'hi_only' AS side FROM (SELECT custkey FROM hi EXCEPT SELECT custkey FROM lo)
    """,
    tags=("setop",),
)
def set_symmetric_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric difference with provenance: keys in exactly one of the
    two sets, tagged with WHICH side — the churn report behind every
    'who appeared / who disappeared' comparison of two snapshots (the
    set-op composition (A∖B) ⊎ (B∖A); dq_snapshot_diff is the row-level
    cousin).  Spark's ``subtract`` is the distinct anti-join both
    EXCEPTs compile to; the union of the two disjoint sides needs no
    re-distinct.  Scale shape: two shuffle anti-joins on the same key +
    a shuffle-free union — no broadcast, no window."""
    lo, hi = _half_keys(spark, sf_dir)
    return lo.subtract(hi).select("custkey", F.lit("lo_only").alias("side")).unionByName(
        hi.subtract(lo).select("custkey", F.lit("hi_only").alias("side"))
    )


@query(
    "sort_topk_global",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 25
    """,
    tags=("sort", "limit"),
    bench=True,
)
def sort_topk_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k: Spark plans TakeOrderedAndProject — per-partition
    heaps + driver merge, never a full global sort (reference's FETCH
    FIRST analog, main.py:145-146, with ordering added)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(25)
        .select("o_orderkey", "o_totalprice")
    )


@query(
    "sort_multi_col",
    oracle="""
    SELECT l_returnflag, l_linestatus, l_orderkey, l_linenumber
    FROM lineitem
    WHERE l_orderkey % 100 = 0
    ORDER BY l_returnflag ASC, l_linestatus DESC, l_orderkey, l_linenumber
    """,
    tags=("sort",),
)
def sort_multi_col(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-column mixed-direction global sort (range-partitioned
    exchange + in-partition sort)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.where(F.col("l_orderkey") % 100 == 0)
        .orderBy(F.asc("l_returnflag"), F.desc("l_linestatus"), "l_orderkey", "l_linenumber")
        .select("l_returnflag", "l_linestatus", "l_orderkey", "l_linenumber")
    )


@query(
    "distinct_rows",
    oracle="SELECT DISTINCT l_returnflag, l_linestatus, CAST(l_quantity % 10 AS BIGINT) AS qty_mod FROM lineitem",
    tags=("setop", "distinct"),
)
def distinct_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTINCT = group-by-all-columns (partial-aggregated map-side)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_returnflag",
        "l_linestatus",
        (F.col("l_quantity") % 10).cast("long").alias("qty_mod"),
    ).distinct()


@query(
    "set_intersect_all",
    oracle=f"WITH {_HALF_SQL} SELECT custkey FROM lo INTERSECT ALL SELECT custkey FROM hi",
    tags=("setop",),
)
def set_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag-semantics INTERSECT ALL (multiplicity = min of the two sides)."""
    lo, hi = _half_keys(spark, sf_dir)
    return lo.intersectAll(hi)


@query(
    "set_except_all",
    oracle=f"WITH {_HALF_SQL} SELECT custkey FROM lo EXCEPT ALL SELECT custkey FROM hi",
    tags=("setop",),
)
def set_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag-semantics EXCEPT ALL (multiplicity subtraction)."""
    lo, hi = _half_keys(spark, sf_dir)
    return lo.exceptAll(hi)


@query(
    "sort_within_partitions",
    oracle="""
    SELECT l_orderkey, l_suppkey, l_quantity
    FROM lineitem WHERE l_orderkey % 40 = 0
    """,
    tags=("sort", "partition"),
)
def sort_within_partitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sortWithinPartitions: partition-local sort with NO exchange — the
    cheap ordering used before bucketed writes and merge-friendly scans.
    Row content is unchanged (the oracle is the plain selection); the
    plan property (Sort with global=false, no Exchange) is what matters."""
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_orderkey") % 40 == 0)
    return li.select("l_orderkey", "l_suppkey", "l_quantity").sortWithinPartitions(
        "l_suppkey", "l_quantity"
    )
