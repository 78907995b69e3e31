"""Bucketed co-located join: writing both sides bucketed by the join key
lets Spark join them with NO shuffle exchange — the core technique for
repeatedly-joined 100 TB fact tables (SURVEY.md §2 scale notes; the
reference's per-table directory layout (A15) extends naturally to
bucketed table layouts)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from oracle_parquet_dumper_spark.sources import load_table


@pytest.fixture(scope="module")
def bucketed_tables(spark, smoke_sf_dir):
    li = load_table(spark, smoke_sf_dir, "lineitem")
    o = load_table(spark, smoke_sf_dir, "orders")
    for name, df, key in (("b_lineitem", li, "l_orderkey"), ("b_orders", o, "o_orderkey")):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        (
            df.write.bucketBy(8, key)
            .sortBy(key)
            .option("path", f"/tmp/spark-graft-test-warehouse/{name}")
            .mode("overwrite")
            .saveAsTable(name)
        )
    return "b_lineitem", "b_orders"


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    li, o = (spark.table(t) for t in bucketed_tables)
    # force SMJ (broadcast would hide the bucketing benefit at this sf)
    joined = li.hint("merge").join(o, li.l_orderkey == o.o_orderkey).groupBy(
        "o_orderstatus"
    ).count()
    joined.collect()
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan
    # the join inputs must come straight from the bucketed scans — no
    # hash-repartition exchange on either join key
    assert "Exchange hashpartitioning(l_orderkey" not in plan, plan
    assert "Exchange hashpartitioning(o_orderkey" not in plan, plan
    assert "Bucketed: true" in plan


def test_bucketed_join_matches_unbucketed(spark, smoke_sf_dir, bucketed_tables):
    li_b, o_b = (spark.table(t) for t in bucketed_tables)
    got = (
        li_b.join(o_b, li_b.l_orderkey == o_b.o_orderkey)
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    li = load_table(spark, smoke_sf_dir, "lineitem")
    o = load_table(spark, smoke_sf_dir, "orders")
    expect = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, expect.collect()))
