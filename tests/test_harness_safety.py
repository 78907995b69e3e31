"""Harness-safety sweep: every registered query's output schema must be
hashable/sortable by a pandas-based canonicalizer (columns sorted by
name, rows sorted by value).

This is the repo-wide guard for the convention documented in
``plans/registry.py``: no ArrayType/MapType/StructType output columns
(pandas ``sort_values``/``factorize`` raises ``unhashable type``), no
DateType (pandas renders DuckDB DATE as a midnight datetime so the two
sides' reprs diverge), and no duplicate column names (column-sort
ambiguity).  Round 1 shipped two queries violating this (``agg_approx``,
``mm_image_features``) — this test makes the whole registry fail fast if
it ever happens again.  Schema inspection only: no job is executed, so
the sweep stays cheap even as the registry grows.
"""

from __future__ import annotations

import pytest

from pyspark.sql import types as T

from oracle_parquet_dumper_spark import plans

UNSAFE_TYPES = (T.ArrayType, T.MapType, T.StructType, T.DateType)

ALL = sorted(plans.REGISTRY)


@pytest.mark.parametrize("name", ALL)
def test_output_schema_is_harness_safe(name, spark, sf_dir):
    spec = plans.REGISTRY[name]
    df = spec.fn(spark, sf_dir)

    unsafe = [
        (f.name, f.dataType.simpleString())
        for f in df.schema.fields
        if isinstance(f.dataType, UNSAFE_TYPES)
    ]
    assert not unsafe, f"{name}: harness-unsafe output columns {unsafe}"

    cols = [f.name for f in df.schema.fields]
    assert len(set(cols)) == len(cols), f"{name}: duplicate output columns {cols}"
