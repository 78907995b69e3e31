"""Bounds + determinism for the DataSketches panel (rows-only in the
driver, so the hard checks live here)."""

from __future__ import annotations

from oracle_parquet_dumper_spark.operators.relational import agg_sketch_panel


def test_sketch_estimates_within_bounds(spark, sf_dir):
    rows = {r.l_returnflag: r for r in agg_sketch_panel(spark, sf_dir).collect()}
    merged = rows.pop("ALL_UNIONED")
    assert rows  # per-group rows present
    for flag, r in rows.items():
        assert r.exact_orders > 0
        # default HLL lgK=12 → ~1.6% standard error; 5% is >3 sigma
        assert abs(r.hll_orders - r.exact_orders) / r.exact_orders < 0.05, flag
        assert abs(r.theta_orders - r.exact_orders) / r.exact_orders < 0.05, flag
    # The union row estimates distinct-over-union from the per-group
    # sketches alone; compare against the sum of group distincts (an
    # upper bound that at this fixture is close to the true union).
    assert merged.theta_orders is None
    assert 0 < merged.hll_orders <= merged.exact_orders * 1.05


def test_sketch_panel_deterministic(spark, sf_dir):
    a = sorted(map(tuple, agg_sketch_panel(spark, sf_dir).collect()))
    b = sorted(map(tuple, agg_sketch_panel(spark, sf_dir).collect()))
    assert a == b
