"""Differential correctness: every registered query with an oracle must
match DuckDB exactly (the driver's t2 gate); oracle-less queries get a
rows-and-schema smoke check (the driver's weaker rows-only check)."""

from __future__ import annotations

import pytest

from oracle_parquet_dumper_spark import plans
from oracle_parquet_dumper_spark.testing import compare

ALL = sorted(plans.REGISTRY)


@pytest.mark.parametrize("name", ALL)
def test_query_matches_oracle(name, spark, duck, sf_dir):
    spec = plans.REGISTRY[name]
    df = spec.fn(spark, sf_dir)
    if spec.oracle is None:
        rows = df.limit(100001).count()
        assert df.schema is not None
        assert rows >= 0
        return
    rep = compare(name, df, duck, spec.oracle)
    assert rep.match, f"{name}: {rep.detail}"
