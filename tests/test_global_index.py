"""operators/global_index.py: the distributed two-pass global-index
primitives must reproduce the single-partition window functions they
replace — bit-for-bit, on data with duplicate order values, skew, and
group sizes that don't divide the tile count."""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from oracle_parquet_dumper_spark.operators.global_index import (
    ntile_expr,
    with_global_index,
)


def _fixture(spark, n=1000):
    # skewed duplicate-heavy values: v = (id*id) % 97 gives ~97 distinct
    # values over 1000 rows, exercising cross-bucket tie handling
    return spark.range(n).select(
        F.col("id").alias("k"), ((F.col("id") * F.col("id")) % 97).alias("v")
    )


def test_global_index_matches_row_number(spark):
    df = _fixture(spark)
    got = with_global_index(df, "v", ["k"], n_buckets=7).select("k", "_gidx")
    want = df.select(
        "k", (F.row_number().over(W.orderBy("v", "k")) - 1).alias("want")
    )
    diff = got.join(want, "k").where(F.col("_gidx") != F.col("want"))
    assert diff.count() == 0


def test_global_index_grouped(spark):
    df = _fixture(spark).withColumn("g", F.col("k") % 3)
    got = with_global_index(df, "v", ["k"], group_cols=["g"], n_buckets=5)
    want = df.select(
        "k",
        (F.row_number().over(W.partitionBy("g").orderBy("v", "k")) - 1).alias("want"),
        F.count(F.lit(1)).over(W.partitionBy("g")).alias("want_n"),
    )
    joined = got.join(want, "k")
    assert joined.where(F.col("_gidx") != F.col("want")).count() == 0
    assert joined.where(F.col("_gn") != F.col("want_n")).count() == 0


def test_ntile_expr_matches_ntile(spark):
    # sizes that don't divide 4, and N < tiles (each row its own tile)
    for n, tiles in ((1000, 4), (997, 4), (3, 7), (10, 3)):
        df = _fixture(spark, n)
        got = with_global_index(df, "v", ["k"]).select(
            "k", ntile_expr(F.col("_gidx"), F.col("_gn"), tiles).alias("tile")
        )
        want = df.select(
            "k", F.ntile(tiles).over(W.orderBy("v", "k")).alias("want")
        )
        assert got.join(want, "k").where(F.col("tile") != F.col("want")).count() == 0


def test_weighted_cumsum_matches_window_sum(spark):
    df = _fixture(spark).withColumn("wt", (F.col("k") % 13) + 1)
    got = with_global_index(df, "v", ["k"], weight_col="wt").select(
        "k", "_gcum", "_gwtot"
    )
    w_run = W.orderBy("v", "k").rowsBetween(W.unboundedPreceding, W.currentRow)
    want = df.select(
        "k",
        F.sum("wt").over(w_run).alias("want_cum"),
        F.sum("wt").over(W.partitionBy()).alias("want_tot"),
    )
    joined = got.join(want, "k")
    assert joined.where(F.col("_gcum") != F.col("want_cum")).count() == 0
    assert joined.where(F.col("_gwtot") != F.col("want_tot")).count() == 0


def test_precomputed_bounds_same_index(spark):
    df = _fixture(spark).withColumn("lo", F.lit(0)).withColumn("hi", F.lit(96))
    got = with_global_index(
        df, "v", ["k"], precomputed_bounds=("lo", "hi"), n_buckets=9
    ).select("k", "_gidx")
    want = df.select("k", (F.row_number().over(W.orderBy("v", "k")) - 1).alias("want"))
    assert got.join(want, "k").where(F.col("_gidx") != F.col("want")).count() == 0


def test_constant_value_column_degenerates_to_one_bucket(spark):
    df = spark.range(50).select(F.col("id").alias("k"), F.lit(7).alias("v"))
    got = with_global_index(df, "v", ["k"]).select("k", "_gidx", "_gn")
    rows = {r["k"]: r for r in got.collect()}
    assert all(rows[k]["_gidx"] == k for k in range(50))
    assert all(rows[k]["_gn"] == 50 for k in range(50))


def test_data_window_is_partitioned(spark):
    """The only unpartitioned window in the helper's plan is the
    <= n_buckets offsets window; the data-bearing row_number runs
    partitioned by bucket."""
    from oracle_parquet_dumper_spark.plans.audit import audit_text

    df = _fixture(spark, 5000)
    out = with_global_index(df, "v", ["k"], n_buckets=16)
    a = audit_text("gi", out._jdf.queryExecution().executedPlan().toString())
    assert a.unpartitioned_windows == 1  # the bounded offsets pass only
    # grouped form: even the offsets window is partitioned
    out_g = with_global_index(
        df.withColumn("g", F.col("k") % 2), "v", ["k"], group_cols=["g"]
    )
    a_g = audit_text("gig", out_g._jdf.queryExecution().executedPlan().toString())
    assert a_g.unpartitioned_windows == 0
