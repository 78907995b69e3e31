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


# --- imputation + calibration ops (round 13) -------------------------------


def test_clean_impute_group_median_planted(spark, tmp_path):
    """Status 'A': prices 1.00 2.00 3.00 (medians from the odd count)
    plus a masked row (orderkey 7); percentile_disc(0.5) over cents
    {100,200,300} = 200, so the masked row imputes to 200 and the
    checksum is 100+200+300+200."""
    import datetime as dt

    rows = [
        (1, 1, "A", 1.00, dt.date(2024, 1, 1), "x"),
        (2, 1, "A", 2.00, dt.date(2024, 1, 1), "x"),
        (3, 1, "A", 3.00, dt.date(2024, 1, 1), "x"),
        (7, 1, "A", 9.99, dt.date(2024, 1, 1), "x"),  # masked (7 % 7 == 0)
        (4, 1, "B", 5.00, dt.date(2024, 1, 1), "x"),
    ]
    spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate date, o_orderpriority string",
    ).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    from oracle_parquet_dumper_spark.operators.cleaning import (
        clean_impute_group_median,
    )

    got = {
        r.o_orderstatus: r
        for r in clean_impute_group_median(spark, str(tmp_path)).collect()
    }
    a = got["A"]
    assert (a.n_rows, a.n_imputed, a.med_cents, a.total_cents) == (4, 1, 200, 800)
    b = got["B"]
    assert (b.n_rows, b.n_imputed, b.med_cents, b.total_cents) == (1, 0, 500, 500)


def test_clean_impute_locf_planted(spark, tmp_path):
    """User 1: v=[1.00, MASKED(id 5), 3.00] in ts order -> the masked
    reading carries 100 forward; user 2 STARTS masked (id 10) -> that
    row is unfillable and contributes 0 to the checksum."""
    import datetime as dt

    t = lambda m: dt.datetime(2024, 1, 1, 0, m)  # noqa: E731
    rows = [
        (1, t(0), 1, "view", 1.00, "{}"),
        (5, t(1), 1, "view", 9.99, "{}"),   # masked (5 % 5 == 0)
        (2, t(2), 1, "view", 3.00, "{}"),
        (10, t(0), 2, "click", 7.00, "{}"), # masked, leading -> unfillable
        (11, t(1), 2, "click", 2.00, "{}"),
    ]
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    from oracle_parquet_dumper_spark.operators.cleaning import clean_impute_locf

    got = {r.event_type: r for r in clean_impute_locf(spark, str(tmp_path)).collect()}
    v = got["view"]
    # filled: 100, 100 (carried), 300
    assert (v.n_rows, v.n_masked, v.n_unfillable, v.filled_cents_sum) == (3, 1, 0, 500)
    c = got["click"]
    # filled: NULL (leading), 200
    assert (c.n_rows, c.n_masked, c.n_unfillable, c.filled_cents_sum) == (2, 1, 1, 200)


def test_dq_calibration_ece_planted(spark, tmp_path):
    """Three hand-set vowel densities: all-vowel 'en' doc clamps to
    conf 1e6 (bin 9, acc 1 -> gap 0); vowel-free 'de' doc clamps to 0
    (bin 0, acc 0 -> gap 0); 30%-vowel 'en' doc maps to exactly
    (5e6*0.3 - 1e6) = 500000 ppm (bin 5, label 1 -> gap 500000)."""
    rows = [
        (1, "aaaa", "en", "s", 4),
        (2, "bbbb", "de", "s", 4),
        (3, "aaabbbbbbb", "en", "s", 10),  # 3 vowels of 10 chars
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars int"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    from oracle_parquet_dumper_spark.operators.validation import dq_calibration_ece

    got = {r.bin: r for r in dq_calibration_ece(spark, str(tmp_path)).collect()}
    assert got[9].n == 1 and got[9].acc_ppm == 1_000_000 and got[9].gap_ppm == 0
    assert got[0].n == 1 and got[0].acc_ppm == 0 and got[0].mean_conf_ppm == 0
    assert got[5].n == 1 and got[5].mean_conf_ppm == 500_000
    assert got[5].gap_ppm == 500_000  # label 1 vs conf 0.5
    # ECE contributions are gap * n_b / N: N = 3
    assert got[5].ece_contrib_ppm == 500_000 // 3


# --- MMR diversified top-k (round 13) --------------------------------------


def test_sim_mmr_diversified_topk_matches_numpy_greedy(spark, smoke_sf_dir):
    """Replay the documented integer greedy in numpy/float64 over the
    smoke fixture and assert pick-for-pick equality: rel/sim quantize
    to round-to-integer ppm, score = 7*rel - 3*max_sim, ties on
    vec_id."""
    import numpy as np
    import pyarrow.parquet as pq

    from oracle_parquet_dumper_spark.operators.similarity import (
        MMR_K,
        MMR_POOL,
        QUERY_VEC_ID,
        sim_mmr_diversified_topk,
    )

    t = pq.read_table(f"{smoke_sf_dir}/embeddings.parquet").to_pandas()
    vecs = {int(r.vec_id): np.asarray(r.embedding, dtype=np.float64)
            for r in t.itertuples()}
    q = vecs[QUERY_VEC_ID]

    def ppm(a, b):
        c = float(a @ b) / (np.sqrt(a @ a) * np.sqrt(b @ b))
        return int(np.floor(c * 1_000_000 + 0.5)) if c >= 0 else -int(
            np.floor(-c * 1_000_000 + 0.5)
        )  # round half away from zero, both engines' integer round

    rel = {v: ppm(vec, q) for v, vec in vecs.items() if v != QUERY_VEC_ID}
    pool = sorted(rel, key=lambda v: (-rel[v], v))[:MMR_POOL]
    picks, chosen = [], []
    first = min(pool, key=lambda v: (-rel[v], v))
    picks.append((1, first, rel[first], 0))
    chosen.append(first)
    for rk in range(2, MMR_K + 1):
        rest = [v for v in pool if v not in chosen]
        if not rest:
            break
        scored = {
            v: max(ppm(vecs[v], vecs[c]) for c in chosen) for v in rest
        }
        nxt = min(rest, key=lambda v: (-(7 * rel[v] - 3 * scored[v]), v))
        picks.append((rk, nxt, rel[nxt], scored[nxt]))
        chosen.append(nxt)

    got = sorted(
        (r.rk, r.vec_id, r.rel_ppm, r.max_sim_ppm)
        for r in sim_mmr_diversified_topk(spark, smoke_sf_dir).collect()
    )
    assert got == sorted(picks)
    assert len(got) == MMR_K
