"""ANN quality at scale (VERDICT r4 #7): pin measured recall@k floors for
the two approximate scale paths — multi-probe sign-LSH and IVF coarse
cells — against exact brute-force truth, at sf0.1 (always present) and
sf1 (regenerate with `python scripts/gen_sf.py` if absent).

The fixtures are unstructured gaussian vectors, so the EXPECTED recall is
modest by construction: a random scan of the same fraction of the table
would recall ~fraction of the true top-k.  The assertions therefore pin
two things: (a) an absolute floor below the measured value (regression
guard for the tuning: 8 hyperplanes / 9 probes, 10 cells / nprobe=2), and
(b) that sign-LSH beats the random-scan baseline for its probe fraction
(9/256 ≈ 3.5%) by >2x — i.e. the hash is actually informative, not just
a subsample.  Measured values are recorded in SCALING.md.
"""

from __future__ import annotations

import os

import pytest

SF1_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".localdata/sf1")

# 9 probed buckets of 2^8 — the fraction of the table a RANDOM subsample
# of the same cost would scan (and therefore its expected recall).
LSH_RANDOM_SCAN_PPM = int(9 / 256 * 1_000_000)


def _mean_recall_ppm(spark, sf_dir: str, name: str) -> float:
    from oracle_parquet_dumper_spark.plans import REGISTRY

    rows = REGISTRY[name].fn(spark, sf_dir).collect()
    assert rows, f"{name} returned no per-query rows"
    return sum(r.recall_ppm for r in rows) / len(rows)


@pytest.mark.parametrize(
    "name,floor_ppm",
    [
        # measured at sf0.1: LSH 118750, IVF 150000 (deterministic fixture)
        ("sim_recall_eval", 80_000),
        ("sim_recall_eval_ivf", 100_000),
    ],
)
def test_recall_floor_sf01(spark, name, floor_ppm):
    assert _mean_recall_ppm(spark, "/root/testdata/sf0.1", name) >= floor_ppm


@pytest.mark.skipif(not os.path.isdir(SF1_DIR), reason="sf1 fixture not generated")
@pytest.mark.parametrize(
    "name,floor_ppm",
    [
        # measured at sf1 (gen_sf.py --mult 10): LSH 131250, IVF 206250
        ("sim_recall_eval", 90_000),
        ("sim_recall_eval_ivf", 150_000),
    ],
)
def test_recall_floor_sf1(spark, name, floor_ppm):
    assert _mean_recall_ppm(spark, SF1_DIR, name) >= floor_ppm


@pytest.mark.skipif(not os.path.isdir(SF1_DIR), reason="sf1 fixture not generated")
def test_lsh_beats_random_scan_baseline_sf1(spark):
    got = _mean_recall_ppm(spark, SF1_DIR, "sim_recall_eval")
    assert got >= 2 * LSH_RANDOM_SCAN_PPM, (got, LSH_RANDOM_SCAN_PPM)
