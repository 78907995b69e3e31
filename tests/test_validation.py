"""Data-quality validation operators: result semantics + plan shapes
(broadcast anti-join for referential integrity, partial aggregation,
single-scan histograms)."""

from __future__ import annotations

import pytest

from oracle_parquet_dumper_spark.plans.registry import REGISTRY


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_constraint_report_all_pass(spark, sf_dir):
    rows = {r.constraint_name: r.n_violations for r in
            REGISTRY["dq_constraint_report"].fn(spark, sf_dir).collect()}
    assert set(rows) == {
        "orderkey_not_null", "orderkey_unique", "status_in_accepted_set",
        "totalprice_positive", "custkey_references_customer",
    }
    # the synthetic data is clean — every constraint holds
    assert all(v == 0 for v in rows.values()), rows


def test_constraint_report_catches_violations(spark, tmp_path):
    src = tmp_path / "dirty"
    src.mkdir()
    spark.createDataFrame(
        [(1, 10, "O", 5.0, "1995-01-01", "x"),
         (1, 10, "Z", -2.0, "1995-01-01", "x"),   # dup key, bad status, bad price
         (3, 999999, "F", 1.0, "1995-01-01", "x")],  # orphan custkey
        "o_orderkey long, o_custkey long, o_orderstatus string, o_totalprice double, "
        "o_orderdate string, o_orderpriority string",
    ).selectExpr("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
                 "CAST(o_orderdate AS DATE) AS o_orderdate", "o_orderpriority") \
        .write.parquet(str(src / "orders.parquet"))
    spark.createDataFrame([(10, "n", 1, 0.0, "B")],
                          "c_custkey long, c_name string, c_nationkey long, "
                          "c_acctbal double, c_mktsegment string") \
        .write.parquet(str(src / "customer.parquet"))
    rows = {r.constraint_name: r.n_violations for r in
            REGISTRY["dq_constraint_report"].fn(spark, str(src)).collect()}
    assert rows["orderkey_unique"] == 1
    assert rows["status_in_accepted_set"] == 1
    assert rows["totalprice_positive"] == 1
    assert rows["custkey_references_customer"] == 1


def test_ri_check_is_broadcast_anti_join(spark, sf_dir):
    plan = _plan(REGISTRY["dq_constraint_report"].fn(spark, sf_dir))
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan


def test_equidepth_tiles_balanced(spark, sf_dir):
    rows = REGISTRY["dq_histogram_equidepth"].fn(spark, sf_dir).collect()
    counts = [r.n for r in rows]
    assert len(rows) == 10
    assert max(counts) - min(counts) <= 1  # NTILE balance property
    los = [r.lo for r in rows]
    assert los == sorted(los)


def test_equiwidth_covers_all_rows(spark, sf_dir):
    from oracle_parquet_dumper_spark.sources.tables import load_table

    rows = REGISTRY["dq_histogram_equiwidth"].fn(spark, sf_dir).collect()
    assert sum(r.n for r in rows) == load_table(spark, sf_dir, "orders").count()
    assert all(0 <= r.bucket <= 9 for r in rows)
    # no driver round-trip: bounds are an in-plan broadcast aggregate
    plan = _plan(REGISTRY["dq_histogram_equiwidth"].fn(spark, sf_dir))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


def test_partition_completeness_flags_drop(spark, tmp_path):
    src = tmp_path / "gappy"
    src.mkdir()
    rows = []
    k = 0
    for month, n in [("1995-01", 100), ("1995-02", 100), ("1995-03", 100),
                     ("1995-04", 10)]:  # 10 < 0.5 * trailing(100)
        for _ in range(n):
            k += 1
            rows.append((k, 1, "O", 1.0, f"{month}-15", "x"))
    spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string, o_totalprice double, "
        "o_orderdate string, o_orderpriority string",
    ).selectExpr("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
                 "CAST(o_orderdate AS DATE) AS o_orderdate", "o_orderpriority") \
        .write.parquet(str(src / "orders.parquet"))
    out = {r.month: r.anomaly for r in
           REGISTRY["dq_partition_completeness"].fn(spark, str(src)).collect()}
    assert out == {"1995-01": False, "1995-02": False, "1995-03": False, "1995-04": True}
