"""Planted-case tests for the round-5 events/timeseries/semantic-dedup
operators (oracle equivalence is covered by test_correctness; these pin
the SEMANTICS on hand-built inputs where the right answer is obvious)."""

from __future__ import annotations

import datetime as dt

import pytest

from oracle_parquet_dumper_spark.plans import REGISTRY


def _write_events(spark, tmp_path, rows):
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    df.write.parquet(str(tmp_path / "events.parquet"))
    return str(tmp_path)


def _t(m):
    return dt.datetime(2026, 1, 1, 0, m)


def test_attribution_last_touch_planted(spark, tmp_path):
    rows = [
        # user 1: click -> view -> purchase(10)  => view credited
        (1, _t(1), 1, "click", 1.0, "{}"),
        (2, _t(2), 1, "view", 1.0, "{}"),
        (3, _t(3), 1, "purchase", 10.0, "{}"),
        # user 2: purchase with no prior touch => direct
        (4, _t(1), 2, "purchase", 5.0, "{}"),
        # user 2: click then purchase => click (error events don't count)
        (5, _t(2), 2, "click", 1.0, "{}"),
        (6, _t(3), 2, "error", 1.0, "{}"),
        (7, _t(4), 2, "purchase", 7.0, "{}"),
    ]
    sf = _write_events(spark, tmp_path, rows)
    got = {
        r.touch_type: (r.n_purchases, r.revenue)
        for r in REGISTRY["events_attribution_last_touch"].fn(spark, sf).collect()
    }
    assert got == {"view": (1, 10.0), "direct": (1, 5.0), "click": (1, 7.0)}


def test_path_trigrams_planted(spark, tmp_path):
    rows = [
        (1, _t(1), 1, "a", 0.0, "{}"),
        (2, _t(2), 1, "b", 0.0, "{}"),
        (3, _t(3), 1, "c", 0.0, "{}"),
        (4, _t(4), 1, "d", 0.0, "{}"),
        # user 2 too short for any trigram
        (5, _t(1), 2, "a", 0.0, "{}"),
        (6, _t(2), 2, "b", 0.0, "{}"),
    ]
    sf = _write_events(spark, tmp_path, rows)
    got = {r.path: r.n for r in REGISTRY["events_path_trigrams"].fn(spark, sf).collect()}
    assert got == {"a>b>c": 1, "b>c>d": 1}


def test_rolling_zscore_flags_planted_spike(spark, tmp_path):
    # 20 calm samples (100.00 +/- 0.02 alternating) then one huge spike:
    # only the spike must be flagged (calm rows deviate by < 3 sigma).
    rows = []
    for i in range(20):
        rows.append((i, _t(i), 1, "view", 100.0 + (0.02 if i % 2 else -0.02), "{}"))
    rows.append((99, _t(30), 1, "view", 400.0, "{}"))
    sf = _write_events(spark, tmp_path, rows)
    got = REGISTRY["ts_anomaly_rolling_zscore"].fn(spark, sf).collect()
    assert [r.event_id for r in got] == [99]
    (spike,) = got
    assert spike.n_win == 20
    # z ~ (400-100)/0.02 sigma -> astronomically large z^2
    assert spike.z2_milli > 9_000


def test_rolling_zscore_128bit_no_overflow(spark, tmp_path):
    # Regression (round-6 ADVICE): a $40k spike over a calm ~$10k window
    # drives the z2_milli numerator 1000(n-1)(nv-s)^2 to ~6.8e19 — past
    # BIGINT — which under ANSI mode crashed the old all-BIGINT
    # formulation.  The DECIMAL(38,0)/HUGEINT arithmetic must (a) not
    # error, (b) produce the exact big-int value, (c) agree with the
    # DuckDB oracle at the same magnitude.
    rows = []
    for i in range(20):
        rows.append((i, _t(i), 1, "view", 10_000.0 + (0.02 if i % 2 else -0.02), "{}"))
    rows.append((99, _t(30), 1, "view", 40_000.0, "{}"))
    sf = _write_events(spark, tmp_path, rows)
    got = REGISTRY["ts_anomaly_rolling_zscore"].fn(spark, sf).collect()
    assert [r.event_id for r in got] == [99]
    (spike,) = got
    # exact expected value in arbitrary-precision Python ints
    win = [1_000_000 + (2 if i % 2 else -2) for i in range(20)]
    n, v = len(win), 4_000_000
    s, ssq = sum(win), sum(x * x for x in win)
    num = 1000 * (n - 1) * (n * v - s) ** 2
    assert num > 2**63 - 1  # the planted case really does exceed BIGINT
    assert spike.z2_milli == num // (n * (n * ssq - s * s))
    # cross-engine at the overflow-triggering magnitude
    import duckdb

    from oracle_parquet_dumper_spark.testing import compare

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{tmp_path}/events.parquet/*.parquet')"
    )
    spec = REGISTRY["ts_anomaly_rolling_zscore"]
    rep = compare("zscore_128bit", spec.fn(spark, sf), con, spec.oracle)
    con.close()
    assert rep.match, rep.detail


def test_rolling_zscore_zero_variance_window(spark, tmp_path):
    # Identical history then a different value: flagged (infinite z),
    # z2_milli NULL via the nullif guard, and no crash in ANSI mode.
    rows = [(i, _t(i), 1, "view", 50.0, "{}") for i in range(15)]
    rows.append((99, _t(30), 1, "view", 51.0, "{}"))
    sf = _write_events(spark, tmp_path, rows)
    got = REGISTRY["ts_anomaly_rolling_zscore"].fn(spark, sf).collect()
    assert [r.event_id for r in got] == [99]
    assert got[0].z2_milli is None


def test_semantic_kmeans_rep_invariants(spark, sf_dir):
    rows = REGISTRY["dedup_semantic_kmeans"].fn(spark, sf_dir).collect()
    assert rows
    by_cluster_reps = {}
    for r in rows:
        by_cluster_reps.setdefault(r.cluster, set()).add(r.rep_id)
    # exactly one representative per cluster
    assert all(len(v) == 1 for v in by_cluster_reps.values())
    for r in rows:
        if r.vec_id == r.rep_id:
            assert r.cos == 1.0 and not r.dropped  # self-cosine, kept
        if r.dropped:
            assert r.cos >= 0.2
    # membership matches the kmeans query's cluster sizes
    sizes = {r.cluster: r.n_members for r in REGISTRY["emb_kmeans_lloyd"].fn(spark, sf_dir).collect()}
    got_sizes = {}
    for r in rows:
        got_sizes[r.cluster] = got_sizes.get(r.cluster, 0) + 1
    assert got_sizes == sizes


def test_audio_frame_energy_planted(spark, tmp_path):
    # 'AB' repeated: A=65 (s=-63), B=66 (s=-62) — no sign changes, known
    # energy; 300 chars -> frame 0 has 256 samples, frame 1 has 44.
    text = "AB" * 150
    docs = spark.createDataFrame(
        [(1, text, "en", "s", len(text))],
        ["doc_id", "text", "lang", "source", "n_chars"],
    )
    docs.write.parquet(str(tmp_path / "documents.parquet"))
    from oracle_parquet_dumper_spark.plans import REGISTRY

    rows = {r.frame_id: r for r in REGISTRY["mm_audio_frame_energy"].fn(spark, str(tmp_path)).collect()}
    assert set(rows) == {0, 1}
    assert rows[0].n_samples == 256 and rows[1].n_samples == 44
    assert rows[0].energy == 128 * 63 * 63 + 128 * 62 * 62
    assert rows[0].n_crossings == 0 and rows[1].n_crossings == 0


def test_moving_median_planted(spark, tmp_path):
    # values 10,20,30,1000,40: trailing-15 frame covers all-so-far;
    # median doubled in cents.
    vals = [10.0, 20.0, 30.0, 1000.0, 40.0]
    rows = [(i, _t(i), 1, "view", vals[i], "{}") for i in range(5)]
    sf = _write_events(spark, tmp_path, rows)
    got = {r.event_id: r.med_x2_cents for r in REGISTRY["window_moving_median"].fn(spark, sf).collect()}
    assert got[0] == 2 * 1000  # [10] -> 10.00 => 1000 + 1000
    assert got[1] == 1000 + 2000  # [10,20] -> (10+20)
    assert got[2] == 2 * 2000  # [10,20,30] -> 20
    assert got[3] == 2000 + 3000  # [10,20,30,1000] -> (20+30)
    assert got[4] == 2 * 3000  # [10,20,30,40,1000] -> 30 (robust to spike)


def test_minhash_accuracy_eval_consistency(spark, sf_dir):
    rows = REGISTRY["dedup_minhash_accuracy_eval"].fn(spark, sf_dir).collect()
    assert rows  # fixture plants near-duplicates, so candidates exist
    lsh = {
        (r.a, r.b)
        for r in REGISTRY["dedup_minhash_lsh"].fn(spark, sf_dir).collect()
    }
    got_pairs = {(r.a, r.b) for r in rows}
    # every flagship pair (est >= 0.5) is among the eval's candidates
    assert lsh <= got_pairs
    for r in rows:
        assert 0 <= r.agree <= 16 and 0 < r.nu
        assert r.est_ppm == r.agree * 1_000_000 // 16
        assert r.true_ppm == r.inter * 1_000_000 // r.nu
        assert abs(r.est_ppm - r.true_ppm) <= r.err_ppm + 1  # floor slack


def test_seasonal_profile_mad_planted(spark, tmp_path):
    # hour 0, type 'view': values 1.00, 2.00, 3.00 -> mean 200 cents,
    # MAD = (100+0+100)/3 = 66.666 -> 66666 milli-cents (floored)
    rows = [
        (1, _t(1), 1, "view", 1.0, "{}"),
        (2, _t(2), 2, "view", 2.0, "{}"),
        (3, _t(3), 3, "view", 3.0, "{}"),
    ]
    sf = _write_events(spark, tmp_path, rows)
    (r,) = REGISTRY["ts_seasonal_profile_mad"].fn(spark, sf).collect()
    assert (r.event_type, r.hour_of_day, r.n) == ("view", 0, 3)
    assert r.mean_milli_cents == 200_000
    assert r.mad_milli_cents == 66_666


def test_cohort_ltv_planted(spark, tmp_path):
    # one user, first seen day 0; purchases of 10 on day 0 and 5 on day 2
    d0 = dt.datetime(2026, 1, 1)
    rows = [
        (1, d0, 1, "purchase", 10.0, "{}"),
        (2, d0 + dt.timedelta(days=1), 1, "view", 0.0, "{}"),
        (3, d0 + dt.timedelta(days=2), 1, "purchase", 5.0, "{}"),
    ]
    sf = _write_events(spark, tmp_path, rows)
    got = {
        r.day_offset: (r.revenue, r.cum_revenue)
        for r in REGISTRY["events_cohort_ltv"].fn(spark, sf).collect()
    }
    assert got == {0: (10.0, 10.0), 2: (5.0, 15.0)}


def test_dataset_card_planted(spark, tmp_path):
    docs = spark.createDataFrame(
        [
            (1, "a b c", "en", "web", 5),
            (2, "a b c", "en", "book", 5),  # exact dup of 1
            (3, "x " * 60, "fr", "web", 120),  # 60 tokens -> not short
        ],
        ["doc_id", "text", "lang", "source", "n_chars"],
    )
    docs.write.parquet(str(tmp_path / "documents.parquet"))
    (r,) = REGISTRY["pipeline_dataset_card"].fn(spark, str(tmp_path)).collect()
    assert (r.n_docs, r.n_langs, r.n_sources) == (3, 2, 2)
    assert r.total_ws_tokens == 3 + 3 + 60
    assert r.short_doc_ppm == 2 * 1_000_000 // 3
    assert r.exact_dup_ppm == 1_000_000 // 3


def test_range_time_window_planted(spark, tmp_path):
    # events at 0:00, 0:30, 1:00, 2:30 — the 1h trailing frame at 1:00
    # includes 0:00 (boundary inclusive) and 0:30; at 2:30 only itself.
    d0 = dt.datetime(2026, 1, 1)
    rows = [
        (1, d0, 1, "view", 1.0, "{}"),
        (2, d0 + dt.timedelta(minutes=30), 1, "view", 2.0, "{}"),
        (3, d0 + dt.timedelta(hours=1), 1, "view", 4.0, "{}"),
        (4, d0 + dt.timedelta(hours=2, minutes=30), 1, "view", 8.0, "{}"),
    ]
    sf = _write_events(spark, tmp_path, rows)
    got = {
        r.event_id: (r.n_last_hour, r.sum_last_hour)
        for r in REGISTRY["window_range_time"].fn(spark, sf).collect()
    }
    assert got == {1: (1, 1.0), 2: (2, 3.0), 3: (3, 7.0), 4: (1, 8.0)}


def test_inter_arrival_percentiles_planted(spark, tmp_path):
    # user 1 'view' at 0, 10, 30 s -> gaps 10, 20; p50 = 15 (interpolated)
    d0 = dt.datetime(2026, 1, 1)
    rows = [
        (1, d0, 1, "view", 0.0, "{}"),
        (2, d0 + dt.timedelta(seconds=10), 1, "view", 0.0, "{}"),
        (3, d0 + dt.timedelta(seconds=30), 1, "view", 0.0, "{}"),
    ]
    sf = _write_events(spark, tmp_path, rows)
    (r,) = REGISTRY["events_inter_arrival_percentiles"].fn(spark, sf).collect()
    assert (r.event_type, r.n_gaps, r.max_s) == ("view", 2, 20)
    assert r.p50_s == 15.0


def test_exact_normalized_dedup_planted(spark, tmp_path):
    docs = spark.createDataFrame(
        [
            (1, "Hello,   World!", "en", "s", 15),
            (2, "hello world", "en", "s", 11),  # same after normalization
            (3, "goodbye world", "en", "s", 13),
        ],
        ["doc_id", "text", "lang", "source", "n_chars"],
    )
    docs.write.parquet(str(tmp_path / "documents.parquet"))
    rows = REGISTRY["dedup_exact_normalized"].fn(spark, str(tmp_path)).collect()
    by_keeper = {r.keeper_id: r.n_copies for r in rows}
    assert by_keeper == {1: 2, 3: 1}


def test_source_vocab_overlap_planted(spark, tmp_path):
    docs = spark.createDataFrame(
        [
            (1, "a b c", "web", "en", 5),
            (2, "b c d", "book", "en", 5),
            (3, "x y", "forum", "en", 3),
        ],
        ["doc_id", "text", "source", "lang", "n_chars"],
    )
    docs.write.parquet(str(tmp_path / "documents.parquet"))
    got = {
        (r.src_a, r.src_b): (r.n_common, r.jaccard_ppm)
        for r in REGISTRY["text_source_vocab_overlap"].fn(spark, str(tmp_path)).collect()
    }
    # web={a,b,c}, book={b,c,d}: inter 2, union 4 -> 500000 ppm;
    # forum shares nothing -> pairs with 0 common never appear (inner join)
    assert got == {("book", "web"): (2, 500_000)}


def test_dau_wau_planted(spark, tmp_path):
    d0 = dt.datetime(2026, 1, 1)
    rows = [
        # user 1 active day 0; user 2 active day 0 and day 3
        (1, d0, 1, "view", 0.0, "{}"),
        (2, d0, 2, "view", 0.0, "{}"),
        (3, d0 + dt.timedelta(days=3), 2, "view", 0.0, "{}"),
    ]
    sf = _write_events(spark, tmp_path, rows)
    got = {r.day: (r.dau, r.wau) for r in REGISTRY["events_dau_wau"].fn(spark, sf).collect()}
    # day 0: dau 2, wau 2; day 3: dau 1, wau 2 (both users active in the
    # trailing week that ends on day 3)
    assert got == {"2026-01-01": (2, 2), "2026-01-04": (1, 2)}


def test_quality_funnel_monotone_and_consistent(spark, sf_dir):
    rows = {r.stage: r.n_surviving for r in REGISTRY["pipeline_quality_funnel"].fn(spark, sf_dir).collect()}
    assert list(rows) == ["total", "nonempty", "gopher_quality", "exact_dedup"] or set(rows) == {
        "total", "nonempty", "gopher_quality", "exact_dedup"
    }
    # funnel counts must be monotonically non-increasing
    assert rows["total"] >= rows["nonempty"] >= rows["gopher_quality"] >= rows["exact_dedup"]
    # stage 2 must agree with the standalone gate query's keep flags
    gate = REGISTRY["clean_gopher_quality"].fn(spark, sf_dir)
    n_keep = gate.where("keep").count()
    assert rows["gopher_quality"] == n_keep
