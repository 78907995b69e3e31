"""Cross-scale oracle sweep: run EVERY oracle-checked query against its
DuckDB twin at a given fixture directory and report hash mismatches.

The driver's correctness gate runs at one scale factor; every
cross-engine divergence found in round 3 (float->decimal cast ties,
Python banker's rounding, iterated round-on-double ties, decimal vs
double stringification) surfaced at only ONE of sf0.001/0.01/0.1 — so
any new oracle should be swept at all three:

    python scripts/cross_sf_sweep.py /root/testdata/sf0.001
    python scripts/cross_sf_sweep.py /root/testdata/sf0.01
    python scripts/cross_sf_sweep.py /root/testdata/sf0.1

Exit code is the number of failing queries (0 = all green).
"""

from __future__ import annotations

import hashlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def row_hash(pdf) -> tuple[str, int, list[str]]:
    """The driver's comparison: sort columns by name, stringify every
    value, sort rows, md5 — strict string equality, no float tolerance."""
    cols = sorted(pdf.columns)
    rows = sorted(
        tuple(str(v) for v in r) for r in pdf[cols].itertuples(index=False, name=None)
    )
    return hashlib.md5(repr(rows).encode()).hexdigest()[:12], len(rows), cols


def main() -> int:
    import argparse

    import duckdb

    import __spark_entry__ as entry
    from oracle_parquet_dumper_spark.session import get_spark

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("sf_dir", nargs="?", default="/root/testdata/sf0.01")
    ap.add_argument("names", nargs="*", help="optional query-name filter")
    ap.add_argument(
        "--exclude",
        action="append",
        default=[],
        metavar="NAME",
        help="skip NAME, recording it as excluded (adjudicated demo-oracle "
        "entries only — scripts/wrap_check.py pins the allowed set)",
    )
    ap.add_argument(
        "--record",
        metavar="PATH",
        help="write a JSON sweep record (per-query ok/fail + exclusions) — "
        "the wrap-gate artifact scripts/wrap_check.py validates",
    )
    args = ap.parse_args()
    sf_dir = args.sf_dir
    only = set(args.names)

    spark = get_spark("cross_sf_sweep")
    queries, oracles = entry.queries(), entry.oracle_sql()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    names = sorted(only & set(oracles) if only else oracles)
    excluded = sorted(set(args.exclude) & set(oracles))
    names = [n for n in names if n not in excluded]
    # SWEEP_PROGRESS=1 streams one flushed line per query — long sweeps
    # stay observable (and resumable by passing the remaining names)
    # even if the run is killed before the summary prints.
    progress = os.environ.get("SWEEP_PROGRESS") == "1"
    bad = 0
    results: dict[str, dict] = {}
    import time as _time

    for name in names:
        t0 = _time.monotonic()
        try:
            got = row_hash(queries[name](spark, sf_dir).toPandas())
            want = row_hash(con.sql(oracles[name]).df())
        except Exception as exc:  # noqa: BLE001 - report and continue
            print(f"{name}: ERR {type(exc).__name__}: {str(exc)[:160]}", flush=True)
            bad += 1
            results[name] = {"ok": False, "err": f"{type(exc).__name__}"}
            continue
        ok = got == want
        results[name] = {
            "ok": ok,
            "rows": got[1],
            "sec": round(_time.monotonic() - t0, 1),
        }
        if not ok:
            print(f"{name}: MISMATCH spark={got} oracle={want}", flush=True)
            bad += 1
        elif progress:
            print(f"{name}: ok {_time.monotonic() - t0:.1f}s", flush=True)
    print(f"{sf_dir}: {len(names) - bad}/{len(names)} oracle queries ok", flush=True)
    if args.record:
        import json

        with open(args.record, "w") as fh:
            json.dump(
                {
                    "sf_dir": sf_dir,
                    "excluded": excluded,
                    "n_ok": len(names) - bad,
                    "n_bad": bad,
                    "results": results,
                },
                fh,
                indent=1,
                sort_keys=True,
            )
        print(f"sweep record written: {args.record}", flush=True)
    return bad


if __name__ == "__main__":
    raise SystemExit(main())
