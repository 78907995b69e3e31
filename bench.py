"""Benchmark runner: times the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is materialized with the no-op sink so the measured time is
scan+compute+shuffle, not result transfer to the driver.  Each query
runs REPS times and reports the per-query MEDIAN (single-shot timings
showed ~3x phantom swings on byte-identical plans round over round);
"value" is the sum of medians.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def box_state() -> dict:
    """Contamination tripwire: a concurrently-running Spark JVM (or a
    loaded box) inflates every timing near-uniformly — round 5 shipped
    an artifact ~1.8x slow from exactly this.  Sampled BEFORE our own
    JVM starts; stamped into the output JSON so a dirty run is
    self-reporting, with a WARNING on stderr."""
    other_jvms = 0
    me = os.getpid()
    for pid in os.listdir("/proc"):
        if not pid.isdigit() or int(pid) == me:
            continue
        try:
            with open(f"/proc/{pid}/comm") as fh:
                if fh.read().strip() == "java":
                    other_jvms += 1
        except OSError:  # raced process exit
            continue
    load1 = os.getloadavg()[0]
    cores = os.cpu_count() or 1
    clean = other_jvms == 0 and load1 <= cores
    return {
        "other_jvms": other_jvms,
        "load1": round(load1, 2),
        "cores": cores,
        "clean": clean,
    }


def main() -> None:
    from oracle_parquet_dumper_spark import plans
    from oracle_parquet_dumper_spark.session import get_spark
    from oracle_parquet_dumper_spark.sources.tables import load_table

    # Wait-for-quiet (VERDICT r7 #4/"Next" #5: BENCH_r06 and BENCH_r07
    # were both stamped dirty because the driver benched on a busy box).
    # Poll up to BENCH_QUIET_WAIT_S seconds for other JVMs to exit and
    # load to settle before starting; if the box never quiets, proceed
    # and stamp the dirty env as before (the tripwire stays honest, it
    # just defends itself first).  Override with BENCH_QUIET_WAIT_S=0.
    wait_budget = float(os.environ.get("BENCH_QUIET_WAIT_S", "600"))
    waited = 0.0
    env = box_state()
    while not env["clean"] and waited < wait_budget:
        step = 15.0
        print(
            f"bench: box not quiet ({env['other_jvms']} other JVM(s), "
            f"load1={env['load1']}) — waiting {step:.0f}s "
            f"({waited:.0f}/{wait_budget:.0f}s used)",
            file=sys.stderr,
        )
        time.sleep(step)
        waited += step
        env = box_state()
    if waited:
        env["quiet_wait_s"] = round(waited, 1)
    if not env["clean"]:
        print(
            f"WARNING: dirty box at bench start ({env['other_jvms']} other JVM(s), "
            f"load1={env['load1']} vs {env['cores']} cores) after waiting "
            f"{waited:.0f}s — timings are contaminated; rerun on a quiet box. "
            "Stamping env into the JSON.",
            file=sys.stderr,
        )

    spark = get_spark("bench")

    # Warm the JVM + parquet footers outside the timed region — every
    # table, so the first-alphabetical query doesn't absorb the cold
    # file-index/codegen cost of whichever tables it happens to touch.
    for t in (
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ):
        load_table(spark, SF_DIR, t).count()

    # Pre-build the bucketed-state tables OUTSIDE the timed region: the
    # *_bucketed bench entries track the STEADY-STATE loop (state on
    # disk — the regime the variants exist for); the one-time state
    # build is amortized export-layer work, measured separately in
    # SCALING.md.  Stamped into the JSON so the exclusion is explicit.
    warm_state = []
    try:
        from oracle_parquet_dumper_spark.operators.dedup import (
            dedup_state_dir,
            label_prop_edge_state,
            write_dedup_corpus_state,
        )
        from oracle_parquet_dumper_spark.operators.graph import pagerank_edge_state

        warm_state.append(pagerank_edge_state(spark, SF_DIR))
        warm_state.append(label_prop_edge_state(spark, SF_DIR))
        # third stored-state op on the same ledger (VERDICT r9 #8): the
        # standing dedup corpus index, so dedup_incremental_stored's
        # bench row times steady-state admission, not a cold index build
        if not os.path.isfile(
            os.path.join(dedup_state_dir(SF_DIR), "corpus_bands", "_SUCCESS")
        ):
            write_dedup_corpus_state(spark, SF_DIR)
        warm_state.append(dedup_state_dir(SF_DIR))
    except Exception as e:  # state build failure surfaces in the query timing
        print(f"bench: state pre-build failed: {e}", file=sys.stderr)
    env["warm_state"] = warm_state

    # Box-calibration probe (VERDICT r10 "Next" #4): two consecutive
    # rounds argued about environment drift from untouched-query ratios
    # (r8 slow box, r10's uniform 25-30% inflation on byte-identical
    # plans).  Settle it mechanically: a FIXED pure-JVM workload — a
    # single-partition whole-stage-codegen fold over spark.range (no
    # I/O, no shuffle, no Python; single-partition keeps scheduler
    # noise out and makes shuffle/executor settings irrelevant to the
    # probe by construction).  Cross-round comparisons divide by
    # `rows_per_sec` to normalize per-core box speed.
    #
    # r13 rework (VERDICT r12 #4: two same-machine sessions stamped 387
    # vs 578 M rows/s — a 1.5x swing bigger than anything the probe is
    # used to settle, and every stamped run list showed one cold JIT
    # outlier): one DISCARDED warm-up run compiles/tiers the fold before
    # anything is timed, then 3 timed runs of 2G rows each (4x longer —
    # C2-compiled steady state dominates, timer/GC jitter amortizes).
    # `spread` = (max-min)/median of the TIMED runs; `trust_band` is the
    # multiplicative band cross-round per-query comparisons must quote:
    # a ratio inside [1/band, band] is box drift, not code.  The floor
    # of 1.15 carries the r12 finding that session-to-session swing
    # exceeds any within-session spread — even a tight probe cannot
    # license claims below it.
    # IO probe (VERDICT r13 "Next" #5): the CPU calibration probe cannot
    # see page-cache-reclaim IO events — the one noise source left after
    # the r13 rework (checkpoint-heavy queries swing 2-4x when DAMON has
    # reclaimed the cache).  Stamp two plain-Python IO numbers next to
    # it so an IO outlier is attributable by artifact, not narrative:
    #   read_mb_s_first  — sequential read of every fixture parquet AS
    #                      THE BOX CURRENTLY STANDS (cold if reclaimed);
    #   read_mb_s_rere   — immediate re-read (page-cache-warm ceiling);
    #   write_mb_s       — 128 MB write+fsync to the checkpoint tmpdir's
    #                      filesystem (what localCheckpoint spill pays).
    def _io_probe() -> dict:
        import tempfile

        files = [
            os.path.join(SF_DIR, f)
            for f in sorted(os.listdir(SF_DIR))
            if f.endswith(".parquet")
        ]

        def read_all() -> float:
            nbytes = 0
            t0 = time.perf_counter()
            for p in files:
                with open(p, "rb") as fh:
                    while True:
                        chunk = fh.read(1 << 22)
                        if not chunk:
                            break
                        nbytes += len(chunk)
            return nbytes / (1 << 20) / (time.perf_counter() - t0)

        first = read_all()
        rere = read_all()
        # Write to the filesystem localCheckpoint blocks actually spill
        # to: Spark's resolved local dir for this session (ADVICE r14 —
        # a hardcoded /tmp misattributes the cost when spark.local.dir
        # points elsewhere).
        try:
            sc = spark.sparkContext
            local_dir = sc._jvm.org.apache.spark.util.Utils.getLocalDir(
                sc._jsc.sc().conf()
            )
        except Exception:
            local_dir = tempfile.gettempdir()
        blk = b"\x5a" * (1 << 22)
        t0 = time.perf_counter()
        with tempfile.NamedTemporaryFile(dir=local_dir) as tf:
            for _ in range(32):  # 128 MB
                tf.write(blk)
            tf.flush()
            os.fsync(tf.fileno())
        w = 128.0 / (time.perf_counter() - t0)
        return {
            "read_mb_s_first": round(first, 1),
            "read_mb_s_rere": round(rere, 1),
            "write_mb_s": round(w, 1),
            "write_dir": local_dir,
        }

    env["io_probe"] = _io_probe()

    cal_rows = 2_000_000_000
    probe = lambda: spark.range(0, cal_rows, 1, 1).selectExpr(  # noqa: E731
        "sum(id * 3 + 1) AS s"
    ).collect()
    probe()  # warm-up: JIT-compile the codegen'd fold; never timed
    cal_runs = []
    for _ in range(3):
        t0 = time.perf_counter()
        probe()
        cal_runs.append(time.perf_counter() - t0)
    cal_runs.sort()
    cal_sec = cal_runs[1]
    cal_spread = (cal_runs[-1] - cal_runs[0]) / cal_sec
    env["calibration"] = {
        "range_rows": cal_rows,
        "sec": round(cal_sec, 4),
        "rows_per_sec": round(cal_rows / cal_sec),
        "spread": round(cal_spread, 4),
        "trust_band": round(max(1.15, 1 + 2 * cal_spread), 4),
        "runs_sec": [round(r, 4) for r in cal_runs],
        "warmup_discarded": True,
    }

    specs = plans.bench_queries()
    reps = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3")))
    timings: dict[str, float] = {}
    import gc

    for name, spec in sorted(specs.items()):
        runs = []
        for _ in range(reps):
            # Drain leftovers from the PREVIOUS run outside the timed
            # region: iterative queries eagerly localCheckpoint interim
            # relations whose blocks are only freed when the async
            # ContextCleaner notices the Python refs died — left alone,
            # that cleanup (and the executor-memory pressure it relieves)
            # lands randomly inside later timings and shows up as ±30%
            # phantom swings on byte-identical plans.
            gc.collect()
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            materialize(spec.fn(spark, SF_DIR))
            runs.append(time.perf_counter() - t0)
        runs.sort()
        mid = len(runs) // 2
        median = runs[mid] if len(runs) % 2 else (runs[mid - 1] + runs[mid]) / 2
        timings[name] = round(median, 4)

    sf = os.path.basename(SF_DIR.rstrip("/")).replace("sf", "")
    contract = {
        "metric": "headline_queries_total_wall",
        "value": round(sum(timings.values()), 4),
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf else SF_DIR,
    }
    # Artifact-contract hardening (VERDICT r14 "Next" #3): PERF_r14
    # compared nothing because the previous round's one-line JSON — by
    # then carrying a large env block — survived only truncated in the
    # driver's tail window.  Keep the driver-parsed FINAL line minimal
    # (metric/value/unit/queries/sf — every r13/r14 query key unchanged);
    # the env/calibration/io_probe block prints as its own PRECEDING
    # line, and the full combined record is also written to
    # bench_out.json next to this script for artifact-grade retrieval.
    print(json.dumps({"bench_env": env}))
    try:
        with open(
            os.path.join(os.path.dirname(os.path.abspath(__file__)), "bench_out.json"),
            "w",
        ) as fh:
            json.dump({**contract, "env": env}, fh, indent=1)
    except OSError as e:
        print(f"bench: bench_out.json write failed: {e}", file=sys.stderr)
    print(json.dumps(contract))


if __name__ == "__main__":
    main()
