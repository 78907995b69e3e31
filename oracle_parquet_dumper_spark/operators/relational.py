"""Relational operator surface: projection, filter, join, aggregate,
window, sort/limit, set ops, scalar functions.

The reference implements only metadata-level predicates and identity
projection (SURVEY.md §2 Part A: regex table filters main.py:200,205-207,
type-pruned projection main.py:92-99, limit main.py:145-146, sort
main.py:98,201); the full relational surface below is the Part B
extension — the OLAP role the reference's README.md:9 delegates to a SQL
engine.  Everything here is built-in DataFrame API so Catalyst handles
pushdown, join strategy, and whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from oracle_parquet_dumper_spark.plans.registry import (
    dec_avg,
    dec_avg_sql,
    dec_sum,
    dec_sum_sql,
    query,
)
from oracle_parquet_dumper_spark.sources.tables import load_table


# ---------------------------------------------------------------------------
# Flagship: TPC-H Q1-style pricing summary (scan -> filter -> hash agg -> sort)
# ---------------------------------------------------------------------------
@query(
    "q1_pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {dec_sum_sql('l_quantity')} AS sum_qty,
           {dec_sum_sql('l_extendedprice')} AS sum_base_price,
           {dec_sum_sql('l_extendedprice * (1 - l_discount)')} AS sum_disc_price,
           {dec_sum_sql('l_extendedprice * (1 - l_discount) * (1 + l_tax)')} AS sum_charge,
           {dec_avg_sql('l_quantity')} AS avg_qty,
           {dec_avg_sql('l_extendedprice')} AS avg_price,
           {dec_avg_sql('l_discount')} AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
    tags=("agg", "filter", "flagship"),
    bench=True,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pricing summary report: filter on ship date, group by return
    flag/status, 8 aggregates.  Single scan, partial aggregation map-side,
    one shuffle on the (tiny) group keys — the shape survives any scale."""
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.where(F.col("l_shipdate") <= "1998-09-02 00:00:00")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dec_sum("l_quantity").alias("sum_qty"),
            dec_sum("l_extendedprice").alias("sum_base_price"),
            dec_sum(disc_price).alias("sum_disc_price"),
            dec_sum(charge).alias("sum_charge"),
            dec_avg("l_quantity").alias("avg_qty"),
            dec_avg("l_extendedprice").alias("avg_price"),
            dec_avg("l_discount").alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )
