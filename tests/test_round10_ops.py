"""Round-10 planted tests: stored-state lifecycle hardening (ADVICE r9
medium + low), SPRT rounding-mode parity, entry-ordering robustness."""

from __future__ import annotations

import os
import time

import pytest


def _write_documents(spark, tmp_path, rows):
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))


def _corpus_rows(version, n=21):
    return [
        (i, f"{version} common words {i % 3} repeated here for shingles", "en", "s1", 40)
        for i in range(1, n + 1)
    ]


# --- promote_state_build: rename failure is only benign when dest is
# --- verifiably complete (ADVICE r9, medium) --------------------------------


def test_promote_state_build_raises_on_incomplete_destination(tmp_path):
    """A failed rename onto a HALF-WRITTEN destination must raise, not
    silently discard the fresh build (round 9 swallowed every OSError
    as a 'concurrent identical build won')."""
    from oracle_parquet_dumper_spark.sources.layouts import promote_state_build

    src = tmp_path / "build.tmp.abc"
    src.mkdir()
    (src / "part-0").write_text("fresh")
    dest = tmp_path / "keyed"
    dest.mkdir()
    (dest / "junk").write_text("partial")  # no completeness marker

    with pytest.raises(OSError):
        promote_state_build(
            str(src), str(dest), complete=lambda: (dest / "_SUCCESS").exists()
        )
    assert not src.exists(), "failed build tmp dir must not leak"

    # complete destination: the loss IS benign (concurrent win)
    src2 = tmp_path / "build.tmp.def"
    src2.mkdir()
    (dest / "_SUCCESS").write_text("")
    promote_state_build(
        str(src2), str(dest), complete=lambda: (dest / "_SUCCESS").exists()
    )
    assert not src2.exists()
    assert (dest / "junk").exists()  # winner's bytes untouched


def test_write_dedup_corpus_state_explicit_dir_overwrites_stale(spark, tmp_path):
    """ADVICE r9 (medium): an explicit state_dir that already exists is
    REPLACED by a rebuild — the fresh state must be served, never the
    pre-existing (stale) one."""
    from oracle_parquet_dumper_spark.operators.dedup import write_dedup_corpus_state

    state = str(tmp_path / "state")
    _write_documents(spark, tmp_path, _corpus_rows("alpha", n=21))
    write_dedup_corpus_state(spark, str(tmp_path), state)
    n1 = spark.read.parquet(state + "/corpus_digests").count()
    assert n1 > 0

    # corpus changes (every text distinct now); same explicit target
    _write_documents(
        spark,
        tmp_path,
        [
            (i, f"beta distinct text {i} with plenty of shingle room", "en", "s1", 40)
            for i in range(1, 34)
        ],
    )
    write_dedup_corpus_state(spark, str(tmp_path), state)
    n2 = spark.read.parquet(state + "/corpus_digests").count()
    assert n2 > n1, "stale explicit state served after rebuild"
    assert os.path.isfile(os.path.join(state, "corpus_bands", "_SUCCESS"))
    # the aside dir from the swap must not linger
    siblings = [d for d in os.listdir(tmp_path) if ".superseded." in d]
    assert siblings == []


# --- gc_state_siblings: tombstone + grace protocol, .tmp sweep --------------


def test_gc_state_siblings_two_phase_and_tmp_sweep(tmp_path):
    from oracle_parquet_dumper_spark.sources.layouts import gc_state_siblings

    base = tmp_path / "base"
    base.mkdir()
    (base / "current").mkdir()
    (base / "old1").mkdir()
    (base / "old1" / "data").write_text("x")
    stale_tmp = base / "build.tmp.dead"
    stale_tmp.mkdir()
    fresh_tmp = base / "build.tmp.live"
    fresh_tmp.mkdir()
    # age the stale tmp dir past any grace period
    old = time.time() - 7200
    os.utime(stale_tmp, (old, old))

    # pass 1: superseded sibling only TOMBSTONED (files intact); the
    # crashed build's 2h-old .tmp dir is past the 1h grace -> swept;
    # the in-flight .tmp dir (mtime now) survives
    removed = gc_state_siblings(str(base), "current", grace_s=3600)
    assert removed == []
    assert (base / "old1" / ".superseded").exists()
    assert (base / "old1" / "data").exists()
    assert not stale_tmp.exists(), "abandoned .tmp build dir not swept"
    assert fresh_tmp.exists(), "in-flight .tmp build dir swept too early"

    # pass 2 with grace elapsed: tombstoned sibling is removed
    dropped = []
    removed3 = gc_state_siblings(
        str(base), "current", grace_s=0, on_remove=dropped.append
    )
    assert "old1" in removed3 and dropped == ["old1"]
    assert not (base / "old1").exists()
    assert (base / "current").exists()


# --- sim_threshold_join_lsh_capped: the occupancy-cap trade, pinned ---------


def test_sim_threshold_lsh_cap_planted(spark, tmp_path):
    """40 identical embeddings: identical sign bits put every vector in
    the same (band, bucket) for all 4 bands.  The capped variant admits
    only the {SIM_LSH_CAP}=32 smallest vec_ids per bucket => exactly
    C(32,2) = 496 pairs (cos 1.0), none involving the 8 largest ids;
    the uncapped flagship returns all C(40,2) = 780 — the declared
    recall-for-boundedness trade, pinned (the sim twin of
    test_levenshtein_lsh_cap_planted)."""
    vec = [round(0.1 * ((i % 7) + 1), 1) for i in range(64)]
    rows = [(i, vec, 0) for i in range(1, 41)]
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).write.parquet(str(tmp_path / "embeddings.parquet"))

    from oracle_parquet_dumper_spark.operators.similarity import (
        SIM_LSH_CAP,
        sim_threshold_join_lsh,
        sim_threshold_join_lsh_capped,
    )

    capped = [
        tuple(r)
        for r in sim_threshold_join_lsh_capped(spark, str(tmp_path)).collect()
    ]
    kept = set(range(1, SIM_LSH_CAP + 1))
    assert len(capped) == SIM_LSH_CAP * (SIM_LSH_CAP - 1) // 2  # 496
    assert all(a in kept and b in kept and c == 1.0 for a, b, c in capped)

    full = sim_threshold_join_lsh(spark, str(tmp_path)).count()
    assert full == 40 * 39 // 2  # 780: the uncapped flagship keeps all


# --- entry serving-order robustness (ADVICE r9) -----------------------------


def test_entry_order_env_gate_and_artifact_shape_validation(monkeypatch, tmp_path):
    """ADVICE r9: (a) SPARK_GRAFT_STABLE_ORDER=1 must yield plain
    sorted-by-name order, independent of on-disk driver artifacts;
    (b) _sampled_before must reject artifacts whose JSON shape is not
    {query_name: record_dict} instead of polluting the seen-set."""
    import json
    import sys

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as entry

    names = ["b_q", "a_q", "c_q"]
    monkeypatch.setenv("SPARK_GRAFT_STABLE_ORDER", "1")
    assert entry._hash_order(names) == sorted(names)
    monkeypatch.delenv("SPARK_GRAFT_STABLE_ORDER")

    # shape validation: point the artifact glob at a controlled dir
    good = {"q_ok": {"rows_match": True}}
    (tmp_path / "CORRECTNESS_r01.json").write_text(json.dumps(good))
    (tmp_path / "CORRECTNESS_r02.json").write_text(json.dumps(["q_list_member"]))
    (tmp_path / "CORRECTNESS_r03.json").write_text(json.dumps({"q_bad": "str_rec"}))
    (tmp_path / "CORRECTNESS_r04.json").write_text("not json at all")
    monkeypatch.setattr(entry, "__file__", str(tmp_path / "__spark_entry__.py"))
    (tmp_path / "CORRECTNESS_r05.json").write_text(
        json.dumps({"q_crashed": {"err": "boom"}, "q_ok": {"err": None}})
    )
    salt, seen, errored = entry._sampled_before()
    assert set(seen) == {"q_ok"}, "malformed artifacts leaked into the seen-set"
    # r13: seen maps name -> LAST valid artifact index it was green in
    # (q_ok appears in valid artifacts 1 and 2 -> 2)
    assert seen["q_ok"] == 2
    assert errored == {"q_crashed"}, "errored-only names must form the retry tier"
    assert salt == 2, "salt must count only shape-valid artifacts"
    # retry tier sorts FIRST (VERDICT r9 #1: the agg_approx resample)
    order = entry._hash_order(["q_ok", "q_crashed", "q_new"])
    assert order[0] == "q_crashed" and order[-1] == "q_ok"


# --- SPRT kernel rounding mode (ADVICE r9) ----------------------------------


def test_sprt_kernel_rounding_is_half_away_from_zero(spark):
    """The streaming kernel's micro-nat rounding must match the batch
    twin's F.round (HALF_UP = half AWAY from zero, DuckDB-identical) on
    exact .5 ties — where Python's round() (banker's, half-to-even)
    diverges.  Pins both the kernel source (uses the floor/ceil form,
    not bare round()) and the tie semantics against live F.round."""
    import inspect
    import math

    from pyspark.sql import functions as F

    from oracle_parquet_dumper_spark.streaming import stateful

    src = inspect.getsource(stateful.sprt_kernel)
    assert "math.floor(x + 0.5)" in src and "math.ceil(x - 0.5)" in src
    assert "llr = round(" not in src, "kernel regressed to banker's rounding"

    ties = [2.5, 3.5, -2.5, -3.5, 0.5, -0.5]
    kernel_form = [
        math.floor(x + 0.5) if x >= 0 else math.ceil(x - 0.5) for x in ties
    ]
    by_x = {
        r.x: r.r
        for r in spark.createDataFrame([(x,) for x in ties], "x double")
        .select("x", F.round("x").cast("long").alias("r"))
        .collect()
    }
    f_round = [by_x[x] for x in ties]
    assert kernel_form == f_round == [3, 4, -3, -4, 1, -1]
    # and Python round() would NOT have matched (the ADVICE r9 hazard)
    assert [round(x) for x in ties] != kernel_form


def test_revive_state_clears_tombstone(tmp_path):
    from oracle_parquet_dumper_spark.sources.layouts import (
        gc_state_siblings,
        revive_state,
    )

    base = tmp_path / "base"
    (base / "k1").mkdir(parents=True)
    (base / "k2").mkdir()
    gc_state_siblings(str(base), "k2", grace_s=3600)  # tombstones k1
    assert (base / "k1" / ".superseded").exists()
    # k1 becomes current again (corpus regenerated to identical bytes)
    revive_state(str(base / "k1"))
    assert not (base / "k1" / ".superseded").exists()
    # ...so a later supersede restarts the clock at phase 1
    removed = gc_state_siblings(str(base), "k2", grace_s=0)
    assert removed == []  # first pass only re-tombstones


# --- round-10 new operators: planted semantics ------------------------------


def test_copurchase_cap_and_support_planted(spark, tmp_path):
    """Basket 1 has 12 items -> the BASKET_CAP=8 window admits parts
    1..8 only; pair (1,2) recurs in baskets 2 and 3 (support 3); pair
    (9,10) recurs in baskets 4 and 5 but its basket-1 occurrence was
    capped away (support 2, not 3) — the declared bound's bite, pinned.
    All other basket-1 pairs are support-1 and drop at MIN_SUPPORT=2."""
    rows = [(1, p, 1) for p in range(1, 13)]
    rows += [(2, 1, 1), (2, 2, 1), (3, 1, 1), (3, 2, 1)]
    rows += [(4, 9, 1), (4, 10, 1), (5, 9, 1), (5, 10, 1)]
    spark.createDataFrame(
        rows, "l_orderkey long, l_partkey long, l_linenumber int"
    ).write.parquet(str(tmp_path / "lineitem.parquet"))

    from oracle_parquet_dumper_spark.operators.graph import graph_copurchase_pairs

    got = sorted(tuple(r) for r in graph_copurchase_pairs(spark, str(tmp_path)).collect())
    assert got == [(1, 2, 3), (9, 10, 2)]


def test_missingness_patterns_nesting_planted(spark, sf_dir):
    """The nested rule (priority can only be null where price is null)
    must make pattern 'price present + priority missing' IMPOSSIBLE;
    n_missing must equal the zero-count of each pattern; row counts
    must fold back to the full table."""
    from oracle_parquet_dumper_spark.operators.profiling import (
        profile_missingness_patterns,
    )
    from oracle_parquet_dumper_spark.sources.tables import load_table

    rows = profile_missingness_patterns(spark, sf_dir).collect()
    assert rows, "no patterns mined"
    for r in rows:
        assert len(r.pattern) == 4 and set(r.pattern) <= {"0", "1"}
        assert r.n_missing == r.pattern.count("0")
        assert not (r.pattern[0] == "1" and r.pattern[1] == "0"), (
            "nested missingness violated: priority null with price present"
        )
    total = load_table(spark, sf_dir, "orders").count()
    assert sum(r.n_rows for r in rows) == total


def test_bitmap_distinct_equals_count_distinct(spark, sf_dir):
    """The 63-bit-word bitmap fold must be EXACT: per-flag popcount sum
    == COUNT(DISTINCT l_suppkey), and the bitmap state must be at most
    keyspace/63 words."""
    from pyspark.sql import functions as F

    from oracle_parquet_dumper_spark.operators.relational import agg_bitmap_distinct
    from oracle_parquet_dumper_spark.sources.tables import load_table

    got = {r.flag: (r.n_distinct, r.n_words) for r in agg_bitmap_distinct(spark, sf_dir).collect()}
    li = load_table(spark, sf_dir, "lineitem")
    want = {
        r.flag: r.nd
        for r in li.groupBy(F.col("l_returnflag").alias("flag"))
        .agg(F.countDistinct("l_suppkey").alias("nd"))
        .collect()
    }
    assert {k: v[0] for k, v in got.items()} == want
    max_supp = li.agg(F.max("l_suppkey")).collect()[0][0]
    for nd, nw in got.values():
        assert nw <= max_supp // 63 + 1
        assert nd <= nw * 63


def test_canonical_keeper_planted(spark, tmp_path):
    """Three docs over the SAME vocabulary (different order/repetition/
    length) are one cluster: keeper = longest, tie to smallest doc_id;
    singleton clusters are excluded from the ledger."""
    rows = [
        (1, "alpha beta gamma", "en", "s", 16),
        (2, "beta alpha gamma gamma alpha", "en", "s", 29),  # longest -> keep
        (3, "gamma beta alpha", "en", "s", 16),
        (9, "totally different words", "en", "s", 23),  # singleton -> absent
    ]
    _write_documents(spark, tmp_path, rows)

    from oracle_parquet_dumper_spark.operators.pipeline_prep import (
        pipeline_canonical_keeper,
    )

    got = sorted(
        tuple(r) for r in pipeline_canonical_keeper(spark, str(tmp_path)).collect()
    )
    assert got == [
        (1, 1, 3, "drop"),
        (2, 1, 3, "keep"),
        (3, 1, 3, "drop"),
    ]


def test_char_entropy_screen_planted(spark, tmp_path):
    """Hand-computed micro-nat entropies: an all-'a' doc is 0 (flagged),
    'ababab' is 673012 (flagged), the 26-letter alphabet is ln(25) =
    3218876 (NOT flagged) — pins the single-ln integerization and the
    2.5-nat threshold exactly."""
    rows = [
        (1, "aaaaaa", "en", "s", 6),
        (2, "ababab", "en", "s", 6),
        (3, "abcdefghijklmnopqrstuvwxyz", "en", "s", 26),
    ]
    _write_documents(spark, tmp_path, rows)

    from oracle_parquet_dumper_spark.operators.text import text_char_entropy_screen

    got = {
        r.doc_id: (r.n_bigrams, r.n_distinct, r.entropy_micro_nats, r.flag_low_entropy)
        for r in text_char_entropy_screen(spark, str(tmp_path)).collect()
    }
    assert got[1] == (5, 1, 0, True)
    # ababab: c(ab)=3 t=round(ln(5/3)e6)=510826; c(ba)=2 t=round(ln(2.5)e6)=916291
    # H = (3*510826 + 2*916291) div 5 = 673012
    assert got[2] == (5, 2, 673012, True)
    assert got[3] == (25, 25, 3218876, False)


def test_point_in_time_join_planted(spark, tmp_path):
    """Closed-open interval semantics pinned: a fact BEFORE the first
    version drops; a fact AT a version boundary joins the NEW version
    (>= from, < to); the open tail (valid_to NULL) catches late facts."""
    from datetime import datetime as DT

    rows = [
        # versions for user 1: state 10.0 at t10, state 20.0 at t20
        (101, DT(2024, 1, 10), 1, "signup", 10.0, "{}"),
        (102, DT(2024, 1, 20), 1, "purchase", 20.0, "{}"),
        # facts (views)
        (201, DT(2024, 1, 5), 1, "view", 0.0, "{}"),   # before v1 -> dropped
        (202, DT(2024, 1, 10), 1, "view", 0.0, "{}"),  # == v1.from -> v1
        (203, DT(2024, 1, 15), 1, "view", 0.0, "{}"),  # inside [v1, v2) -> v1
        (204, DT(2024, 1, 20), 1, "view", 0.0, "{}"),  # == v2.from -> v2 (not v1)
        (205, DT(2024, 2, 1), 1, "view", 0.0, "{}"),   # open tail -> v2
        # another user, no versions: all facts drop
        (301, DT(2024, 1, 15), 2, "view", 0.0, "{}"),
    ]
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.parquet(str(tmp_path / "events.parquet"))

    from oracle_parquet_dumper_spark.operators.relational import join_point_in_time

    got = sorted(
        (r.fact_id, r.version_id, r.state_value)
        for r in join_point_in_time(spark, str(tmp_path)).collect()
    )
    assert got == [
        (202, 101, 10.0),
        (203, 101, 10.0),
        (204, 102, 20.0),
        (205, 102, 20.0),
    ]


def test_bloom_returning_users_invariants(spark, sf_dir):
    """Bloom contract: NO false negatives (every truly returning user
    is a bloom hit); the synthetic novel keys (user_id + 10M) are never
    returning; probe count = 2 x last-day actives."""
    from pyspark.sql import functions as F

    from oracle_parquet_dumper_spark.operators.events_analytics import (
        events_bloom_returning_users,
    )
    from oracle_parquet_dumper_spark.sources.tables import load_table

    rows = events_bloom_returning_users(spark, sf_dir).collect()
    assert rows
    for r in rows:
        if r.is_returning:
            assert r.bloom_hit, f"false negative for user {r.user_id}"
    novels = [r for r in rows if r.user_id >= 10_000_000]
    assert novels and all(not r.is_returning for r in novels)

    ev = load_table(spark, sf_dir, "events")
    last = ev.agg(F.max(F.to_date("ts"))).collect()[0][0]
    actives = (
        ev.where(F.to_date("ts") == F.lit(last)).select("user_id").distinct().count()
    )
    assert len(rows) == 2 * actives


def test_clamped_running_sum_planted(spark, tmp_path):
    """Clamp engagement pinned: +50000, then +70000 clips at the
    100000 cap, then -120000 clips at the 0 floor, then +350; a final
    0.005-value view pins the HALF_UP cents rounding (0.5 -> 1)."""
    from datetime import datetime as DT

    rows = [
        (1, DT(2024, 1, 1, 0), 7, "purchase", 500.0, "{}"),
        (2, DT(2024, 1, 1, 1), 7, "purchase", 700.0, "{}"),
        (3, DT(2024, 1, 1, 2), 7, "view", 1200.0, "{}"),
        (4, DT(2024, 1, 1, 3), 7, "purchase", 3.5, "{}"),
        (5, DT(2024, 1, 1, 4), 7, "view", 0.005, "{}"),
    ]
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.parquet(str(tmp_path / "events.parquet"))

    from oracle_parquet_dumper_spark.operators.windows import (
        window_clamped_running_sum,
    )

    got = {
        r.event_id: r.balance_cents
        for r in window_clamped_running_sum(spark, str(tmp_path)).collect()
    }
    assert got == {1: 50000, 2: 100000, 3: 0, 4: 350, 5: 349}


def test_burst_hours_planted(spark, tmp_path):
    """10 quiet hours of 1 event + 1 hour of 30: only the spike hour
    satisfies n * n_hours >= 2 * total (330 >= 80; quiet hours 11 < 80)."""
    from datetime import datetime as DT

    rows = [(h, DT(2024, 1, 1, h), 1, "view", 1.0, "{}") for h in range(10)]
    rows += [
        (100 + i, DT(2024, 1, 1, 12, i % 60), 1, "view", 1.0, "{}")
        for i in range(30)
    ]
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.parquet(str(tmp_path / "events.parquet"))

    from oracle_parquet_dumper_spark.operators.events_analytics import (
        events_burst_hours,
    )

    got = [tuple(r) for r in events_burst_hours(spark, str(tmp_path)).collect()]
    assert len(got) == 1
    et, hour, n, total, n_hours = got[0]
    assert (et, n, total, n_hours) == ("view", 30, 40, 11)
    assert hour.hour == 12


def test_dp_noisy_counts_reproduces_seeded_laplace(spark, sf_dir):
    """The noise must be exactly the seeded inverse-CDF value: recompute
    one cell's Laplace term from md5 in Python and match; true_n must
    fold back to the corpus size (the utility-ledger contract)."""
    import hashlib
    import math

    from oracle_parquet_dumper_spark.operators.pipeline_prep import (
        pipeline_dp_noisy_counts,
    )
    from oracle_parquet_dumper_spark.sources.tables import load_table

    rows = pipeline_dp_noisy_counts(spark, sf_dir).collect()
    assert rows
    total = load_table(spark, sf_dir, "documents").count()
    assert sum(r.true_n for r in rows) == total

    r = min(rows, key=lambda r: (r.lang, r.source))
    u01 = int(hashlib.md5(f"{r.lang}|{r.source}".encode()).hexdigest()[:15], 16) / 2**60
    sign = 1 if u01 < 0.5 else -1
    lap = round(math.log(1.0 - 2.0 * abs(u01 - 0.5)) * 1_000_000)
    # Python round() is banker's; pin vs the engines' HALF_UP only when
    # not on a tie (ties are measure-zero for md5-derived u01)
    assert r.noisy_count_micro == r.true_n * 1_000_000 + sign * lap


def test_bfs_reachability_planted(spark, tmp_path):
    """Path graph 1-2-3-4-5 plus isolated 8-9 (each edge = one
    two-supplier order): seed = min supplier 1, depths pinned 0..3,
    node 5 (depth 4) and the 8-9 component unreachable within
    BFS_DEPTH=3."""
    orders = [(10, 1, 2), (11, 2, 3), (12, 3, 4), (13, 4, 5), (14, 8, 9)]
    rows = []
    for o, a, b in orders:
        rows += [(o, a, 1), (o, b, 2)]
    spark.createDataFrame(
        rows, "l_orderkey long, l_suppkey long, l_linenumber int"
    ).write.parquet(str(tmp_path / "lineitem.parquet"))

    from oracle_parquet_dumper_spark.operators.graph import graph_bfs_reachability

    got = sorted(
        (r.node, r.depth) for r in graph_bfs_reachability(spark, str(tmp_path)).collect()
    )
    assert got == [(1, 0), (2, 1), (3, 2), (4, 3)]


def test_seasonal_decompose_identity_and_grid(spark, sf_dir):
    """Decomposition identity: 1000*n == trend + seasonal + residual
    exactly, on every grid row; output is one row per (type, active
    day)."""
    from pyspark.sql import functions as F

    from oracle_parquet_dumper_spark.operators.events_analytics import (
        events_seasonal_decompose,
    )
    from oracle_parquet_dumper_spark.sources.tables import load_table

    rows = events_seasonal_decompose(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 1000 * r.n == r.trend_milli + r.seasonal_milli + r.residual_milli
    grid = (
        load_table(spark, sf_dir, "events")
        .select("event_type", F.to_date("ts").alias("d"))
        .distinct()
        .count()
    )
    assert len(rows) == grid


def test_tile_contrast_planted(spark, tmp_path):
    """Hand-computed: a flat 32-'a' payload has two identical tiles ->
    contrast 0; 16 'a' + 16 'c' -> tiles (1552, 1584), population
    variance 256 -> 256000 milli; a 17-char doc has a short tail tile."""
    rows = [
        (1, "a" * 32, "en", "s", 32),
        (2, "a" * 16 + "c" * 16, "en", "s", 32),
        (3, "b" * 17, "en", "s", 17),
    ]
    _write_documents(spark, tmp_path, rows)

    from oracle_parquet_dumper_spark.operators.multimodal import mm_tile_contrast

    got = {
        r.doc_id: (r.n_tiles, r.tile_sum_total, r.contrast_milli)
        for r in mm_tile_contrast(spark, str(tmp_path)).collect()
    }
    assert got[1] == (2, 2 * 16 * 97, 0)
    s1, s2 = 16 * 97, 16 * 99
    n, s, ss = 2, s1 + s2, s1 * s1 + s2 * s2
    assert got[2] == (2, s, (1000 * (n * ss - s * s)) // (n * n))
    t1, t2 = 16 * 98, 1 * 98
    n, s, ss = 2, t1 + t2, t1 * t1 + t2 * t2
    assert got[3] == (2, s, (1000 * (n * ss - s * s)) // (n * n))


def test_length_bucket_batching_planted(spark, tmp_path):
    """Power-of-two boundaries pinned via integer bit length: lengths
    {7, 8, 15, 16} split buckets 2/3/3/4 exactly (a float floor(log2)
    can misplace 8 or 16); waste arithmetic hand-checked for bucket 3."""
    rows = [
        (1, "x", "en", "s", 7),
        (2, "x", "en", "s", 8),
        (3, "x", "en", "s", 15),
        (4, "x", "en", "s", 16),
    ]
    _write_documents(spark, tmp_path, rows)

    from oracle_parquet_dumper_spark.operators.pipeline_prep import (
        pipeline_length_bucket_batching,
    )

    got = {
        r.bucket: (r.n_docs, r.max_len, r.tot_len, r.n_batches, r.padding_waste)
        for r in pipeline_length_bucket_batching(spark, str(tmp_path)).collect()
    }
    assert set(got) == {2, 3, 4}
    assert got[2] == (1, 7, 7, 1, 1 * 32 * 7 - 7)
    assert got[3] == (2, 15, 23, 1, 1 * 32 * 15 - 23)  # 8 and 15 share bucket 3
    assert got[4] == (1, 16, 16, 1, 1 * 32 * 16 - 16)


def test_seasonal_anomaly_flags_planted_spike(spark, tmp_path):
    """A flat 4-weeks series (10/day) with ONE 80-event day: the spike
    day must be flagged with the LARGEST positive residual; the only
    other permissible alerts are its +-3 trend-window neighbors
    (the centered MA absorbs the spike into their trend, pushing their
    residuals negative — honest decomposition behavior, pinned rather
    than hidden); nothing outside that window may alert, which is
    exactly what the MAD scale floor guarantees on a flat series."""
    from datetime import datetime as DT, timedelta as TD

    rows = []
    eid = 0
    base = DT(2024, 3, 4)
    for day in range(28):
        n = 80 if day == 14 else 10
        for i in range(n):
            eid += 1
            rows.append((eid, base + TD(days=day, minutes=i), 1 + eid % 5, "view", 1.0, "{}"))
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.parquet(str(tmp_path / "events.parquet"))

    from oracle_parquet_dumper_spark.operators.events_analytics import (
        events_seasonal_anomaly,
    )

    got = events_seasonal_anomaly(spark, str(tmp_path)).collect()
    by_day = {r.day: r for r in got}
    spike = by_day.get("2024-03-18")
    assert spike is not None and spike.n == 80
    assert spike.residual_milli > 0
    assert spike.residual_milli == max(abs(r.residual_milli) for r in got)
    window = {f"2024-03-{d:02d}" for d in range(15, 22)}  # spike +- 3 days
    for r in got:
        assert r.day in window, f"alert outside the spike's trend window: {r.day}"
        if r.day != "2024-03-18":
            assert r.residual_milli < 0  # trend contamination, not a real spike
