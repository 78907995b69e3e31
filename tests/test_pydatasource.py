"""Python DataSource API source: determinism across parallelism, shard
partitioning, and schema stability."""

from __future__ import annotations

from oracle_parquet_dumper_spark.sources.pydatasource import (
    SYNTH_SCHEMA,
    register_synthetic_docs,
)


def _read(spark, **opts):
    r = spark.read.format("synthetic_docs")
    for k, v in opts.items():
        r = r.option(k, v)
    return r.load()


def test_synthetic_source_deterministic_across_parallelism(spark):
    """Content depends only on (doc_id, seed) — shard count must not
    change what is generated, only where."""
    register_synthetic_docs(spark)
    a = _read(spark, rows=200, shards=2, seed="s1")
    b = _read(spark, rows=200, shards=8, seed="s1")
    rows_a = sorted(map(tuple, a.drop("shard").collect()))
    rows_b = sorted(map(tuple, b.drop("shard").collect()))
    assert rows_a == rows_b
    assert a.count() == 200
    assert a.schema.simpleString() == b.schema.simpleString()


def test_synthetic_source_seed_changes_content(spark):
    register_synthetic_docs(spark)
    a = {r.doc_id: r.text for r in _read(spark, rows=50, seed="x").collect()}
    b = {r.doc_id: r.text for r in _read(spark, rows=50, seed="y").collect()}
    assert set(a) == set(b)
    assert any(a[k] != b[k] for k in a)


def test_synthetic_source_feeds_engine_queries(spark):
    """The source composes with ordinary DataFrame ops (it is a real
    scan, not a collected local relation)."""
    from pyspark.sql import functions as F

    register_synthetic_docs(spark)
    df = _read(spark, rows=300, shards=4, seed="s2")
    agg = df.groupBy("shard").agg(F.count(F.lit(1)).alias("n")).collect()
    assert sum(r.n for r in agg) == 300
    assert len(agg) == 4
    assert SYNTH_SCHEMA.startswith("doc_id")
