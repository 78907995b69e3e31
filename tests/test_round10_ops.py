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
    salt, seen = entry._sampled_before()
    assert seen == {"q_ok"}, "malformed artifacts leaked into the seen-set"
    assert salt == 1, "salt must count only shape-valid artifacts"


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
