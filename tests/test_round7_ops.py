"""Planted-math tests for the round-7 operators: known inputs with
hand-computable answers, independent of the DuckDB differential (which
checks Spark==DuckDB but not Spark==math)."""

from __future__ import annotations

import datetime
import math

from pyspark.sql import functions as F


def _write_events(spark, tmp_path, rows):
    spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    ).write.parquet(str(tmp_path / "events.parquet"))


TS0 = datetime.datetime(2025, 1, 1)
TS1 = datetime.datetime(2025, 1, 31)  # pre period
TS2 = datetime.datetime(2025, 6, 1)   # post period (midpoint falls between)


def test_did_estimator_planted_effect(spark, tmp_path):
    """Control trend +10, treatment trend +10 plus a +20 effect:
    DiD must isolate exactly +20 (in cents: +2000) while the naive
    post-only difference would report +120 (baseline gap + effect)."""
    rows = []
    eid = 0
    # control users (even ids): pre mean 100.0, post mean 110.0
    for ts, v in ((TS0, 90.0), (TS1, 110.0), (TS2, 100.0), (TS2, 120.0)):
        rows.append((eid, ts, 2, "purchase", v, "{}")); eid += 1
    # treated users (odd ids): pre mean 200.0, post mean 230.0
    for ts, v in ((TS0, 190.0), (TS1, 210.0), (TS2, 220.0), (TS2, 240.0)):
        rows.append((eid, ts, 3, "purchase", v, "{}")); eid += 1
    # noise of another event type must be ignored
    rows.append((eid, TS2, 3, "view", 999.0, "{}"))
    _write_events(spark, tmp_path, rows)

    from oracle_parquet_dumper_spark.operators.events_analytics import (
        events_did_estimator,
    )

    r = events_did_estimator(spark, str(tmp_path)).collect()[0]
    assert (r.n_treat_pre, r.n_treat_post, r.n_ctrl_pre, r.n_ctrl_post) == (2, 2, 2, 2)
    assert r.mean_treat_pre_cents == 20000.0
    assert r.mean_treat_post_cents == 23000.0
    assert r.mean_ctrl_pre_cents == 10000.0
    assert r.mean_ctrl_post_cents == 11000.0
    assert r.did_cents == 2000.0


def test_psi_no_drift_is_zero(spark, tmp_path):
    """Identical pre/post category distributions => every term and the
    total are exactly 0 (p == q makes (q-p)ln(q/p) = 0 before
    rounding)."""
    rows = []
    eid = 0
    for half_ts in (TS0, TS2):
        for et, n in (("view", 6), ("click", 3)):
            for _ in range(n):
                rows.append((eid, half_ts, 1, et, 1.0, "{}")); eid += 1
    _write_events(spark, tmp_path, rows)

    from oracle_parquet_dumper_spark.operators.events_analytics import (
        events_psi_category_drift,
    )

    out = {r.event_type: r for r in events_psi_category_drift(spark, str(tmp_path)).collect()}
    assert set(out) == {"view", "click"}
    assert all(r.psi_term_micro == 0 for r in out.values())
    assert all(r.psi_total_micro == 0 for r in out.values())


def test_psi_planted_shift_matches_math(spark, tmp_path):
    """A category that doubles its share between halves produces the
    exact smoothed PSI term; terms sum to the stamped total."""
    rows = []
    eid = 0
    for et, n in (("view", 8), ("click", 2)):
        for _ in range(n):
            rows.append((eid, TS0, 1, et, 1.0, "{}")); eid += 1
    for et, n in (("view", 6), ("click", 4)):
        for _ in range(n):
            rows.append((eid, TS2, 1, et, 1.0, "{}")); eid += 1
    _write_events(spark, tmp_path, rows)

    from oracle_parquet_dumper_spark.operators.events_analytics import (
        events_psi_category_drift,
    )

    out = {r.event_type: r for r in events_psi_category_drift(spark, str(tmp_path)).collect()}
    k, tot_pre, tot_post = 2, 10, 10

    def term(n_pre, n_post):
        p = (n_pre + 1.0) / (tot_pre + k)
        q = (n_post + 1.0) / (tot_post + k)
        return round((q - p) * math.log(q / p) * 1_000_000)

    assert out["view"].psi_term_micro == term(8, 6)
    assert out["click"].psi_term_micro == term(2, 4)
    total = term(8, 6) + term(2, 4)
    assert out["view"].psi_total_micro == total > 0


def _write_docs(spark, tmp_path, rows):
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(str(tmp_path / "documents.parquet"))


def test_bigram_perplexity_separates_salad_from_boilerplate(spark, tmp_path):
    """Docs sharing one global unigram distribution: the doc whose
    bigrams match the corpus-frequent chain scores LOWER perplexity
    than the shuffled-word doc — the separation the unigram model
    cannot see (both docs tie under text_perplexity_unigram)."""
    chain = "a b c d"
    rows = [(i, chain, "en", "s", len(chain)) for i in range(10)]
    rows.append((100, "d c b a", "en", "s", 7))  # same unigrams, reversed bigrams
    _write_docs(spark, tmp_path, rows)

    from oracle_parquet_dumper_spark.operators.text import (
        text_perplexity_bigram_interp,
    )

    out = {r.doc_id: r for r in text_perplexity_bigram_interp(spark, str(tmp_path)).collect()}
    assert out[0].n_bigrams == 3 and out[100].n_bigrams == 3
    assert out[0].ppl < out[100].ppl
    # exact value for the boilerplate doc.  Corpus: 10x "a b c d" +
    # 1x "d c b a" => 44 tokens, every unigram count 11.  Doc-0 bigrams
    # and their corpus counts: (a,b) c2=10 with context c1(a)=10 (a is
    # prev only in the chain docs); (b,c) c2=10, c1(b)=11 (chain 10 +
    # "b a" once); (c,d) c2=10, c1(c)=11 (chain 10 + "c b" once).
    lam, n_tok = 0.75, 44
    def nll(c2, c1):
        return round(-math.log(lam * c2 / c1 + 0.25 * 11 / n_tok) * 1_000_000)
    s, t = nll(10, 10) + nll(10, 11) + nll(10, 11), 3
    avg = (2 * s + t) // (2 * t)
    assert out[0].avg_nll == avg / 1_000_000.0


def test_dsir_importance_prefers_target_looking_docs(spark, tmp_path):
    """A zh-tagged doc written in the TARGET (en) token distribution
    outscores a zh doc in the off-target distribution — the DSIR
    estimator keying on content, not the label; en-slice membership
    only defines the target model."""
    rows = [(i, "hello world common", "en", "s", 18) for i in range(8)]
    rows += [(100 + i, "ni hao zhongwen", "zh", "s", 15) for i in range(8)]
    rows.append((200, "hello world common", "zh", "s", 18))  # target-looking
    _write_docs(spark, tmp_path, rows)

    from oracle_parquet_dumper_spark.operators.pipeline_prep import (
        pipeline_dsir_importance,
    )

    out = {r.doc_id: r for r in pipeline_dsir_importance(spark, str(tmp_path)).collect()}
    assert out[200].logw_micro > 0 > out[100].logw_micro
    assert out[200].logw_micro == out[0].logw_micro  # content-identical
    # exact math for one token: raw cnt("hello") = 9, target cnt = 8;
    # raw total = 8*3 + 9*3 = 51, target total = 24, vocab = 6.
    lr = round((math.log((8 + 1) / (24 + 6)) - math.log((9 + 1.0) / (51 + 6))) * 1e6)
    # the doc's three tokens all share that ratio (identical counts)
    assert out[200].logw_micro == 3 * lr


def test_mrl_recall_perfect_when_signal_is_prefix_concentrated(spark, tmp_path):
    """Vectors whose last 48 dims are zero: the 16-dim prefix IS the
    full geometry, so the funnel's top-k equals ground truth and every
    query's recall is exactly 1.0 (the planted MRL property)."""
    import random

    rng = random.Random(7)
    rows = []
    for vid in range(0, 300):
        v = [rng.uniform(-1, 1) for _ in range(16)] + [0.0] * 48
        rows.append((vid, v, vid % 3))
    spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int").write.parquet(
        str(tmp_path / "embeddings.parquet")
    )

    from oracle_parquet_dumper_spark.operators.similarity import (
        sim_matryoshka_prefix_recall,
    )

    out = sim_matryoshka_prefix_recall(spark, str(tmp_path)).collect()
    assert len(out) == 3  # vec_id % 100 == 0 -> 0, 100, 200
    assert all(r.recall_ppm == 1_000_000 for r in out)
    assert all(r.n_truth == 10 for r in out)


def test_poisson_bootstrap_is_deterministic_and_calibrated(spark, sf_dir):
    """The md5-keyed bootstrap is bit-reproducible (two runs, identical
    rows) and calibrated: every replicate's effective n is within 6
    sigma (sigma = sqrt(n), sum of n Poisson(1) draws) of the true n,
    and the replicate means straddle the point estimate."""
    from oracle_parquet_dumper_spark.operators.events_analytics import (
        BOOT_B,
        agg_bootstrap_poisson_means,
    )

    a = sorted(agg_bootstrap_poisson_means(spark, sf_dir).collect())
    b = sorted(agg_bootstrap_poisson_means(spark, sf_dir).collect())
    assert a == b and len(a) == BOOT_B

    from oracle_parquet_dumper_spark.sources.tables import load_table

    n = (
        load_table(spark, sf_dir, "events")
        .where(F.col("event_type") == "purchase")
        .count()
    )
    sigma = 6 * n ** 0.5
    assert all(abs(r.n_eff - n) <= sigma for r in a)
    point = a[0].point_mean_cents
    assert min(r.mean_cents for r in a) < point < max(r.mean_cents for r in a)


def test_uplift_by_decile_planted_monotone(spark, tmp_path):
    """20 users with strictly-decreasing targeting scores, one treated
    and one control per decile; treated response declines 1000, 900,
    ... cents by decile while control is 0 — the table must recover
    exactly that monotone uplift staircase."""
    rows, eid = [], 0
    for i in range(20):
        for _ in range(100 - i):  # pre-period views: the targeting score
            rows.append((eid, TS0, i, "view", 0.0, "{}")); eid += 1
    for d in range(10):
        u = 2 * d + 1  # the odd (treated) user of decile d
        rows.append((eid, TS2, u, "purchase", 10.0 - d, "{}")); eid += 1
    _write_events(spark, tmp_path, rows)

    from oracle_parquet_dumper_spark.operators.events_analytics import (
        events_uplift_by_decile,
    )

    out = {r.decile: r for r in events_uplift_by_decile(spark, str(tmp_path)).collect()}
    assert set(out) == set(range(10))
    for d in range(10):
        r = out[d]
        assert (r.n_treat, r.n_ctrl) == (1, 1)
        assert r.mean_ctrl_cents == 0.0
        assert r.uplift_cents == 1000.0 - 100 * d


def test_u_shape_attribution_conserves_credit(spark, sf_dir):
    """Every closed journey distributes exactly 1,000,000 micro-credits
    (the 40/20/40 split with truncation remainders reassigned), so
    total credit == 1e6 x #purchases at any scale."""
    from oracle_parquet_dumper_spark.operators.events_analytics import (
        events_attribution_u_shape,
    )
    from oracle_parquet_dumper_spark.sources.tables import load_table

    rows = events_attribution_u_shape(spark, sf_dir).collect()
    n_purchases = (
        load_table(spark, sf_dir, "events")
        .where(F.col("event_type") == "purchase")
        .count()
    )
    assert sum(r.credit_micro for r in rows) == 1_000_000 * n_purchases


def test_u_shape_attribution_planted_positions(spark, tmp_path):
    """One user, journey view->click->view->click->purchase: U-split
    gives first (view) 400k, last (click) 400k, middles (click, view)
    100k each => view 500k, click 500k; a second touchless purchase
    lands in 'direct'."""
    rows = [
        (0, TS0, 1, "view", 0.0, "{}"),
        (1, TS0, 1, "click", 0.0, "{}"),
        (2, TS0, 1, "view", 0.0, "{}"),
        (3, TS0, 1, "click", 0.0, "{}"),
        (4, TS1, 1, "purchase", 5.0, "{}"),
        (5, TS2, 1, "purchase", 5.0, "{}"),
    ]
    _write_events(spark, tmp_path, rows)
    from oracle_parquet_dumper_spark.operators.events_analytics import (
        events_attribution_u_shape,
    )

    out = {r.touch_type: r for r in events_attribution_u_shape(spark, str(tmp_path)).collect()}
    assert out["view"].credit_micro == 400_000 + 100_000
    assert out["click"].credit_micro == 100_000 + 400_000
    assert out["direct"].credit_micro == 1_000_000
    assert out["view"].n_touches == 2 and out["click"].n_touches == 2


def test_kneser_ney_continuation_beats_raw_frequency(spark, tmp_path):
    """The KN signature: a word frequent only in ONE context scores far
    worse than its raw frequency suggests.  Corpus: "san francisco"
    x9 (francisco frequent, single context) + diverse "in X" bigrams.
    The doc "in francisco" must score HIGHER perplexity than "in york"
    even though corpus frequency of francisco (9) > york (1), because
    N1+(. , francisco) = 1 — continuation counts, not raw counts."""
    rows = [(i, "san francisco", "en", "s", 13) for i in range(9)]
    cities = ["york", "paris", "tokyo", "lima", "oslo", "cairo", "quito", "dakar"]
    rows += [(20 + j, f"in {c}", "en", "s", 8) for j, c in enumerate(cities)]
    rows.append((100, "in francisco", "en", "s", 12))
    rows.append((101, "in york", "en", "s", 7))
    _write_docs(spark, tmp_path, rows)

    from oracle_parquet_dumper_spark.operators.text import (
        text_perplexity_kneser_ney,
    )

    out = {r.doc_id: r for r in text_perplexity_kneser_ney(spark, str(tmp_path)).collect()}
    assert out[100].ppl > out[101].ppl
    # exact math for doc 101 ("in york"): c2(in,york)=2, c1(in)=10,
    # n1v(in)=9 distinct followers, n1w(york)=1, ntypes=10 distinct
    # bigrams => p = (2-0.75)/10 + 0.75*9/10*1/10
    import math
    p = (2 - 0.75) / 10 + 0.75 * 9 / 10 * 1 / 10
    nll = round(-math.log(p) * 1_000_000)
    avg = (2 * nll + 1) // 2
    assert out[101].avg_nll == avg / 1_000_000.0


def test_neyman_allocation_planted_variance(spark, tmp_path):
    """Two strata with equal size but 10:0 value-spread ratio: the
    zero-variance stratum gets 0 of the budget, the spread stratum
    gets everything (capped at its population) — allocation follows
    N_h*sigma_h exactly."""
    rows = []
    ln = 1
    # stratum A: 50 rows, all price 100.00 (sigma = 0)
    for i in range(50):
        rows.append((i, ln, "A", 100.0)); ln += 1
    # stratum B: 50 rows alternating 50/150 (sigma = 50)
    for i in range(50, 100):
        rows.append((i, ln, "B", 50.0 if i % 2 else 150.0)); ln += 1
    spark.createDataFrame(
        rows, "l_orderkey long, l_linenumber int, l_returnflag string, l_extendedprice double"
    ).write.parquet(str(tmp_path / "lineitem.parquet"))

    from oracle_parquet_dumper_spark.operators.dedup import sample_stratified_neyman

    out = sample_stratified_neyman(spark, str(tmp_path)).collect()
    flags = {r.l_returnflag for r in out}
    assert flags == {"B"}           # sigma_A = 0 -> zero allocation
    assert len(out) == 50           # budget 1000 capped at N_B = 50
    assert len({(r.l_orderkey, r.l_linenumber) for r in out}) == 50


def test_adamic_adar_rare_shared_part_outranks_common(spark, tmp_path):
    """Pair (1,2) shares one RARE part (deg 2); pair (3,4) shares one
    part that EVERY supplier carries (deg 6).  AA must rank the rare
    pair higher: 1e6/ln(2) > 1e6/ln(6), though common-neighbor count
    ties at 1 (plus the ubiquitous part contributes to both)."""
    rows = []
    # part 10: suppliers 1, 2 only (rare)
    # part 20: suppliers 3, 4 only (rare) - give (3,4) ONLY the common part
    # part 99: all suppliers (ubiquitous)
    pairs = [(10, 1), (10, 2)] + [(99, s) for s in (1, 2, 3, 4, 5, 6)]
    rows = [(i, p, s) for i, (p, s) in enumerate(pairs)]
    spark.createDataFrame(rows, "l_orderkey long, l_partkey long, l_suppkey long").write.parquet(
        str(tmp_path / "lineitem.parquet")
    )
    from oracle_parquet_dumper_spark.operators.graph import graph_adamic_adar
    import math

    out = {(r.sa, r.sb): r for r in graph_adamic_adar(spark, str(tmp_path)).collect()}
    w_rare = round(1_000_000 / math.log(2))
    w_common = round(1_000_000 / math.log(6))
    assert out[(1, 2)].aa_micro == w_rare + w_common  # both parts shared
    assert out[(3, 4)].aa_micro == w_common           # only the ubiquitous part
    assert out[(1, 2)].aa_micro > out[(3, 4)].aa_micro
    assert out[(1, 2)].n_common == 2 and out[(3, 4)].n_common == 1


def test_srm_check_planted(spark, tmp_path):
    """48/52 split of 100 users is inside the 95% band (chi2 = 0.16);
    a 35/65 split trips the detector (chi2 = 9.0)."""
    from oracle_parquet_dumper_spark.operators.events_analytics import (
        events_ab_srm_check,
    )

    def run(n_odd, n_even, sub):
        rows = []
        uid = 1
        users = [2 * i + 1 for i in range(n_odd)] + [2 * i for i in range(1, n_even + 1)]
        rows = [(i, TS0, u, "view", 0.0, "{}") for i, u in enumerate(users)]
        d = tmp_path / sub
        d.mkdir()
        _write_events(spark, d, rows)
        return events_ab_srm_check(spark, str(d)).collect()[0]

    ok = run(48, 52, "balanced")
    assert (ok.n_treat, ok.n_ctrl) == (48, 52)
    assert ok.chi2_micro == round((48 - 52) ** 2 * 1e6 / 100)
    assert not ok.srm_detected

    bad = run(35, 65, "mismatched")
    assert bad.chi2_micro == round((35 - 65) ** 2 * 1e6 / 100) == 9_000_000
    assert bad.srm_detected


def test_log2_histogram_exact_at_powers_of_two(spark, tmp_path):
    """Gaps of exactly 1, 2, 4, 8 seconds land in buckets 0, 1, 2, 3 —
    the power-of-two boundaries where a log()-based floor misbuckets
    (ln(8)/ln(2) = 2.9999999999999996)."""
    base = TS0
    rows, eid = [], 0
    t = base
    for gap in (1, 2, 4, 8, 3, 7):
        t = t + datetime.timedelta(seconds=gap)
        rows.append((eid, t, 1, "view", 0.0, "{}")); eid += 1
    rows.insert(0, (99, base, 1, "view", 0.0, "{}"))
    _write_events(spark, tmp_path, rows)

    from oracle_parquet_dumper_spark.operators.validation import (
        dq_histogram_log2_gaps,
    )

    out = {r.bucket: r for r in dq_histogram_log2_gaps(spark, str(tmp_path)).collect()}
    # gaps: 1->b0, 2->b1, 4->b2, 8->b3, 3->b1, 7->b2
    assert out[0].n == 1 and (out[0].lo_s, out[0].hi_s) == (0, 1)
    assert out[1].n == 2 and (out[1].lo_s, out[1].hi_s) == (2, 3)
    assert out[2].n == 2 and (out[2].lo_s, out[2].hi_s) == (4, 7)
    assert out[3].n == 1 and (out[3].lo_s, out[3].hi_s) == (8, 15)
    assert out[3].min_gap_s == out[3].max_gap_s == 8


def test_curriculum_order_planted_phases(spark, tmp_path):
    """8 docs with strictly increasing token counts split into 4 phases
    of 2 (easy -> hard); positions within a phase are a dense 0..1
    permutation; the whole ordering is bit-reproducible."""
    rows = [
        (i, " ".join(["w"] * (i + 1)), "en", "s", 2 * (i + 1)) for i in range(8)
    ]
    _write_docs(spark, tmp_path, rows)
    from oracle_parquet_dumper_spark.operators.pipeline_prep import (
        pipeline_curriculum_order,
    )

    a = sorted(pipeline_curriculum_order(spark, str(tmp_path)).collect())
    b = sorted(pipeline_curriculum_order(spark, str(tmp_path)).collect())
    assert a == b and len(a) == 8
    by_doc = {r.doc_id: r for r in a}
    # doc i has i+1 tokens; quartiles: docs (0,1)->phase0 ... (6,7)->phase3
    for i in range(8):
        assert by_doc[i].phase == i // 2, (i, by_doc[i])
        assert by_doc[i].n_tok == i + 1
    for ph in range(4):
        assert sorted(r.position for r in a if r.phase == ph) == [0, 1]


def test_power_mde_matches_hand_math(spark, tmp_path):
    """Planted two-arm purchase data with known variance: MDE equals
    (z_a + z_b) * sqrt(v1/n1 + v2/n2) computed by hand."""
    rows, eid = [], 0
    # treat (odd users): values 10, 20 -> cents 1000, 2000
    for u, v in ((1, 10.0), (3, 20.0), (1, 10.0), (3, 20.0)):
        rows.append((eid, TS0, u, "purchase", v, "{}")); eid += 1
    # ctrl (even users): values 10, 30
    for u, v in ((2, 10.0), (4, 30.0), (2, 10.0), (4, 30.0)):
        rows.append((eid, TS0, u, "purchase", v, "{}")); eid += 1
    _write_events(spark, tmp_path, rows)
    from oracle_parquet_dumper_spark.operators.events_analytics import (
        Z_ALPHA_2,
        Z_BETA,
        events_power_mde,
    )

    r = events_power_mde(spark, str(tmp_path)).collect()[0]
    assert (r.n_treat, r.n_ctrl) == (4, 4)
    import statistics

    v1 = statistics.variance([1000, 2000, 1000, 2000])
    v2 = statistics.variance([1000, 3000, 1000, 3000])
    assert r.var_treat == v1 and r.var_ctrl == v2
    assert r.mde_cents == (Z_ALPHA_2 + Z_BETA) * (v1 / 4 + v2 / 4) ** 0.5


def test_any_order_funnel_planted(spark, tmp_path):
    """User 1 completes out of order (purchase first) within 72h; user
    2 has all three but spread past 72h; user 3 has two steps."""
    h = datetime.timedelta(hours=1)
    rows = [
        # user 1: purchase -> view -> click within 3 hours (completes)
        (0, TS0, 1, "purchase", 1.0, "{}"),
        (1, TS0 + h, 1, "view", 0.0, "{}"),
        (2, TS0 + 2 * h, 1, "click", 0.0, "{}"),
        # user 2: all three but 100h spread (3 steps, not completed)
        (3, TS0, 2, "view", 0.0, "{}"),
        (4, TS0 + 50 * h, 2, "click", 0.0, "{}"),
        (5, TS0 + 100 * h, 2, "purchase", 1.0, "{}"),
        # user 3: two steps only
        (6, TS0, 3, "view", 0.0, "{}"),
        (7, TS0 + h, 3, "click", 0.0, "{}"),
    ]
    _write_events(spark, tmp_path, rows)
    from oracle_parquet_dumper_spark.operators.events_analytics import (
        events_funnel_any_order,
    )

    out = {
        (r.n_steps, r.completed): r.n_users
        for r in events_funnel_any_order(spark, str(tmp_path)).collect()
    }
    assert out == {(3, True): 1, (3, False): 1, (2, False): 1}


def test_code_likeness_planted(spark, tmp_path):
    """A Python snippet trips the screen; plain prose does not; counts
    match hand arithmetic."""
    code = "def f(x):\n    return {x: (x + 1)};  # comment"
    prose = "the quick brown fox jumps over the lazy dog again and again"
    _write_docs(
        spark,
        tmp_path,
        [(1, code, "en", "s", len(code)), (2, prose, "en", "s", len(prose))],
    )
    from oracle_parquet_dumper_spark.operators.text import (
        CODE_SYMBOLS,
        text_code_likeness,
    )

    out = {r.doc_id: r for r in text_code_likeness(spark, str(tmp_path)).collect()}
    assert out[1].n_sym == sum(code.count(c) for c in CODE_SYMBOLS)
    assert out[1].kw_hits == 2  # 'def ' + 'return '
    assert out[1].is_code and not out[2].is_code
    assert out[2].n_sym == 0 and out[2].kw_hits == 0
    expected = (1000 * out[1].n_sym) // len(code) + 200
    assert out[1].code_score_milli == expected
