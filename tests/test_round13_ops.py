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


# --- sampled-verify minhash eval twins (VERDICT r12 #3) --------------------


def test_minhash_sampled_twin_consistent_with_exact_eval(spark, smoke_sf_dir):
    """The twin's summary must be EXACTLY what the full eval implies
    under the same hash-mod sample: recompute n_candidates / n_sampled /
    n_good / mean |err| in Python from the exact eval's per-pair rows
    and the documented md5('a:b') % MOD predicate."""
    import hashlib

    from oracle_parquet_dumper_spark.operators.dedup import (
        EVAL_GOOD_PPM,
        EVAL_SAMPLE_MOD,
        dedup_minhash_accuracy_eval,
        dedup_minhash_accuracy_eval_sampled,
    )

    full = dedup_minhash_accuracy_eval(spark, smoke_sf_dir).collect()
    (got,) = dedup_minhash_accuracy_eval_sampled(spark, smoke_sf_dir).collect()

    def in_sample(a, b):
        h = int(hashlib.md5(f"{a}:{b}".encode()).hexdigest()[:15], 16)
        return h % EVAL_SAMPLE_MOD == 0

    sampled = [r for r in full if in_sample(r.a, r.b)]
    assert got.n_candidates == len(full)
    assert got.n_sampled == len(sampled) > 0
    n_good = sum(1 for r in sampled if r.true_ppm >= EVAL_GOOD_PPM)
    assert got.n_good == n_good
    assert got.precision_ppm == (n_good * 1_000_000) // len(sampled)
    assert got.mean_abs_err_ppm == sum(r.err_ppm for r in sampled) // len(sampled)
    # integer z=2 Wald half-width, exactly as documented
    import math

    x = (n_good * (len(sampled) - n_good)) // len(sampled)
    assert got.ci_halfwidth_ppm == (2_000_000 * math.isqrt(x)) // len(sampled)


def test_oph_sampled_twin_summary_shape(spark, smoke_sf_dir):
    """OPH twin: one row, sample is a subset of candidates, and the
    CI is positive whenever the sampled precision is non-degenerate."""
    from oracle_parquet_dumper_spark.operators.dedup import (
        dedup_minhash_oph_eval_sampled,
    )

    (got,) = dedup_minhash_oph_eval_sampled(spark, smoke_sf_dir).collect()
    assert 0 < got.n_sampled <= got.n_candidates
    assert 0 <= got.n_good <= got.n_sampled
    assert 0 <= got.precision_ppm <= 1_000_000
    assert got.ci_halfwidth_ppm >= 0


def test_integer_isqrt_expression_exact_at_square_boundaries(spark):
    """The guarded floor(sqrt(double)) isqrt used by the CI columns is
    exact at m^2-1 / m^2 / m^2+1 — including values large enough that a
    naive floor(sqrt(x)) could round across the boundary."""
    import math

    cases = []
    for m in (1, 2, 3, 10, 65536, 22_360_679, 67_108_864):
        for x in (m * m - 1, m * m, m * m + 1):
            if x >= 0:
                cases.append(x)
    df = spark.createDataFrame([(x,) for x in cases], "x long")
    got = df.selectExpr(
        "x",
        "CAST(FLOOR(SQRT(CAST(x AS DOUBLE))) AS BIGINT) AS s0",
    ).selectExpr(
        "x",
        "s0 + (CASE WHEN (s0+1)*(s0+1) <= x THEN 1 ELSE 0 END)"
        " - (CASE WHEN s0*s0 > x THEN 1 ELSE 0 END) AS s",
    )
    for r in got.collect():
        assert r.s == math.isqrt(r.x), (r.x, r.s)


# --- binned interval-overlap join (round 13) -------------------------------


def test_join_interval_overlap_binned_planted(spark, tmp_path):
    """Tiny hand-built orders+lineitem: a long order lifespan spanning
    several peak windows, a single-day order, and a reversed
    (last ship < orderdate) order the guard must drop; expected output
    is a brute-force Python replay of the declarative semantics."""
    import datetime as dt

    from oracle_parquet_dumper_spark.operators.relational import (
        PEAK_HALF_DAYS,
        PEAK_TOPK,
        join_interval_overlap_binned,
    )

    d = dt.date
    # (orderkey, linenumber, price, shipdate)
    li = [
        (1, 1, 10.00, d(2024, 1, 10)),
        (1, 2, 3.00, d(2024, 1, 20)),     # order 1: 1-05 .. 1-20
        (2, 1, 5.00, d(2024, 3, 1)),      # order 2: 2-25 .. 3-01
        (3, 1, 2.00, d(2024, 3, 5)),      # order 3: 1-08 .. 3-05 (long)
        (4, 1, 9.00, d(2024, 1, 15)),     # order 4: reversed -> dropped
        (5, 1, 4.00, d(2025, 6, 10)),     # order 5: second year
    ]
    # (orderkey, orderdate)
    od = {1: d(2024, 1, 5), 2: d(2024, 2, 25), 3: d(2024, 1, 8),
          4: d(2024, 2, 1), 5: d(2025, 6, 1)}
    orders = [(k, 100 + k, "O", 1.0, v, "1-URGENT") for k, v in od.items()]
    spark.createDataFrame(
        li,
        "l_orderkey long, l_linenumber long, l_extendedprice double, "
        "l_shipdate date",
    ).write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))
    spark.createDataFrame(
        orders,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate date, o_orderpriority string",
    ).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))

    span = {}
    for ok, _, p, s in li:
        last, rev = span.get(ok, (None, 0))
        span[ok] = (max(s, last) if last else s, rev + int(p * 100))
    iv = {
        ok: (od[ok], last, rev)
        for ok, (last, rev) in span.items()
        if last >= od[ok]
    }
    drev: dict[dt.date, int] = {}
    for _, _, p, s in li:
        drev[s] = drev.get(s, 0) + int(p * 100)
    by_yr: dict[int, list[dt.date]] = {}
    for day in drev:
        by_yr.setdefault(day.year, []).append(day)
    windows = [
        (yr, day)
        for yr, days in by_yr.items()
        for day in sorted(days, key=lambda x: (-drev[x], x))[:PEAK_TOPK]
    ]
    pairs = {
        (yr, day, ok)
        for (yr, day) in windows
        for ok, (s, e, _) in iv.items()
        if s <= day + dt.timedelta(days=PEAK_HALF_DAYS)
        and day - dt.timedelta(days=PEAK_HALF_DAYS) <= e
    }
    want = {}
    for yr in by_yr:
        yp = [p for p in pairs if p[0] == yr]
        if not yp:
            continue
        tr = {ok for (_, _, ok) in yp}
        want[yr] = (
            len(yp),
            len(tr),
            len({day for (_, day, _) in yp}),
            sum(iv[ok][2] for ok in tr),
        )
    got = {
        r.yr: (r.n_pairs, r.n_orders, r.n_windows, r.order_rev_cents)
        for r in join_interval_overlap_binned(spark, str(tmp_path)).collect()
    }
    assert got == want
    assert 4 not in {ok for (_, _, ok) in pairs}  # reversed order dropped
    assert got[2024][0] > got[2024][1]  # the long lifespan hit >1 window
