"""Round-13 planted tests: the steady-state driver-sample rotation
(VERDICT r12 #6), the grouped_topk primitive behind the waiver
burn-down (#2), and the heavy-hitters rank-keying contract extension
(#ADVICE) lives in test_round12_ops alongside its family."""

from __future__ import annotations

import json
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo")


# --- steady-state least-recently-sampled rotation (VERDICT r12 #6) --------


def _write_art(tmp_path, idx: int, names: list[str]) -> None:
    (tmp_path / f"CORRECTNESS_r{idx:02d}.json").write_text(
        json.dumps({n: {"err": None, "rows": 1} for n in names})
    )


def test_entry_order_tiers_then_least_recently_sampled(tmp_path, monkeypatch):
    """Tier order: errored retries, never-sampled, then green names by
    the artifact index of their LATEST green record (stalest first)."""
    import __spark_entry__ as entry

    _write_art(tmp_path, 1, ["a", "b"])
    _write_art(tmp_path, 2, ["a", "c"])
    (tmp_path / "CORRECTNESS_r03.json").write_text(
        json.dumps({"e": {"err": "OutOfMemoryError", "rows": None}})
    )
    monkeypatch.setattr(entry.os.path, "dirname", lambda p: str(tmp_path))
    order = entry._hash_order(["a", "b", "c", "d", "e"])
    assert order[0] == "e"  # errored-only retry tier
    assert order[1] == "d"  # never-sampled tier
    assert order[2] == "b"  # seen last in artifact 1 — stalest green
    assert set(order[3:]) == {"a", "c"}  # both last seen in artifact 2


def test_entry_order_steady_state_covers_registry_in_ceil_n_over_k(
    tmp_path, monkeypatch
):
    """The drained steady state is a deterministic rotation: simulating
    the driver (sample the head-k, write the artifact) re-covers ALL
    names in exactly ceil(N/k) rounds — the property that replaces the
    salted hash's coupon-collector re-coverage (VERDICT r12 #6)."""
    import __spark_entry__ as entry

    monkeypatch.setattr(entry.os.path, "dirname", lambda p: str(tmp_path))
    names = [f"q{i:03d}" for i in range(23)]
    _write_art(tmp_path, 1, names)  # pool already drained
    k, covered, rounds = 5, set(), 0
    while len(covered) < len(names):
        rounds += 1
        assert rounds <= -(-len(names) // k), "rotation failed to re-cover"
        head = entry._hash_order(names)[:k]
        remaining = set(names) - covered
        if len(remaining) >= k:
            assert not set(head) & covered, "re-sampled before full coverage"
        else:  # final partial window: all stragglers must be in it
            assert remaining <= set(head)
        covered.update(head)
        _write_art(tmp_path, 1 + rounds, head)
    assert rounds == -(-len(names) // k)  # == ceil(N/k)


def test_entry_order_real_artifacts_serve_unsampled_first():
    """Against the REAL driver artifacts on disk: every name without a
    green record sorts before every green-sampled name, so the r13
    sample window drains the remaining never-sampled pool."""
    import __spark_entry__ as entry
    from oracle_parquet_dumper_spark import plans

    _, seen, errored = entry._sampled_before()
    order = entry._hash_order(list(plans.all_queries()))
    first_green = next(i for i, n in enumerate(order) if n in seen)
    assert all(n in seen or n in errored for n in order[first_green:])


# --- grouped_topk: the waiver burn-down primitive (VERDICT r12 #2) --------


@pytest.fixture(scope="module")
def topk_df(spark):
    rows = [
        (g, f"item{i:02d}", (i * 7 + ord(g)) % 13)
        for g in ("x", "y", "z")
        for i in range(40)
    ] + [("w", "only", 1)]  # a group smaller than k
    return spark.createDataFrame(rows, "g string, item string, v long")


def test_grouped_topk_matches_window_rank(spark, topk_df):
    """Exactness: grouped_topk == row_number window under the same
    total order, for every group — including the <k group — and for a
    DESC order via negation.  The 13-value v domain guarantees ties at
    the k boundary, exercising the unique-tiebreak contract."""
    from pyspark.sql import Window as W

    from oracle_parquet_dumper_spark.operators.global_index import grouped_topk

    df = topk_df.withColumn("_negv", -F.col("v"))
    got = grouped_topk(df, ["g"], ["_negv", "item"], 7, rank_col="rk")
    w = W.partitionBy("g").orderBy("_negv", "item")
    want = df.withColumn("rk", F.row_number().over(w)).where(F.col("rk") <= 7)
    assert sorted(
        (r.g, r.item, r.v, r.rk) for r in got.collect()
    ) == sorted((r.g, r.item, r.v, r.rk) for r in want.collect())


def test_grouped_topk_plan_is_bucket_partitioned(spark, topk_df):
    """Scale shape: no window partitioned only by the group column —
    phase 1 partitions on (g, _gb) (the exempt synthetic bucket), and
    the merge is an aggregate, not a window."""
    from oracle_parquet_dumper_spark.operators.global_index import grouped_topk
    from oracle_parquet_dumper_spark.plans.audit import audit_text

    got = grouped_topk(
        topk_df.withColumn("_negv", -F.col("v")), ["g"], ["_negv", "item"], 3
    )
    plan = got._jdf.queryExecution().executedPlan().toString()
    a = audit_text("planted", plan)
    assert a.bounded_partition_windows == []
    assert "_gb" in plan  # phase-1 bucket key present


def test_grouped_topk_k_larger_than_bucket_yield(spark):
    """k larger than any group's row count returns every row, ranked."""
    from oracle_parquet_dumper_spark.operators.global_index import grouped_topk

    df = spark.createDataFrame(
        [("a", "p", 1), ("a", "q", 2)], "g string, item string, v long"
    )
    got = grouped_topk(df, ["g"], ["v", "item"], 99, rank_col="rk")
    assert sorted((r.item, r.rk) for r in got.collect()) == [("p", 1), ("q", 2)]
