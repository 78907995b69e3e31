"""Iceberg sink probe (VERDICT r10 #7): always-on probe contract +
a gated round-trip that runs wherever the iceberg-spark-runtime jars
are installed — the test_delta_sink.py convention."""

from __future__ import annotations

import pytest

from oracle_parquet_dumper_spark.sources.iceberg import (
    FALLBACK,
    ICEBERG_CATALOG,
    compact_iceberg,
    iceberg_available,
    iceberg_builder_conf,
    require_iceberg,
    write_iceberg,
)

_ok, _why = iceberg_available()


def test_iceberg_probe_contract():
    """The probe must return a decided (bool, reason) pair, and when
    Iceberg is absent, require_iceberg must fail with a message naming
    BOTH the missing piece and the parquet fallback path."""
    ok, why = iceberg_available()
    assert isinstance(ok, bool)
    if ok:
        assert why == ""
    else:
        assert "iceberg" in why.lower()
        with pytest.raises(RuntimeError) as ei:
            require_iceberg()
        msg = str(ei.value)
        assert "compact_table" in msg and "ensure_bucketed_state" in msg
        assert FALLBACK in msg


def test_iceberg_probe_names_the_missing_half():
    """pyiceberg-without-jars and nothing-at-all are DIFFERENT failure
    modes and the reason string must distinguish them (a user who just
    pip-installed pyiceberg needs to hear 'jar', not 'not installed')."""
    ok, why = iceberg_available()
    if ok:
        pytest.skip("iceberg present — reason-string cases unreachable")
    try:
        import pyiceberg  # noqa: F401

        assert "jar" in why and "catalog client" in why
    except ImportError:
        assert "neither" in why


def test_iceberg_builder_conf_shape():
    """The documented session config must wire the SparkCatalog class,
    the hadoop catalog type, the warehouse path, and the SQL
    extensions — asserted on the builder's option map so the contract
    is pinned even where the jars are absent."""

    class FakeBuilder:
        def __init__(self):
            self.opts = {}

        def config(self, k, v):
            self.opts[k] = v
            return self

    b = iceberg_builder_conf(FakeBuilder(), "/tmp/wh")
    assert (
        b.opts[f"spark.sql.catalog.{ICEBERG_CATALOG}"]
        == "org.apache.iceberg.spark.SparkCatalog"
    )
    assert b.opts[f"spark.sql.catalog.{ICEBERG_CATALOG}.type"] == "hadoop"
    assert b.opts[f"spark.sql.catalog.{ICEBERG_CATALOG}.warehouse"] == "/tmp/wh"
    assert "IcebergSparkSessionExtensions" in b.opts["spark.sql.extensions"]


@pytest.mark.skipif(not _ok, reason=f"iceberg unavailable: {_why}")
def test_iceberg_roundtrip_and_compact(tmp_path):
    """Where the runtime jars exist: createOrReplace, append, compact,
    and a read-back that sees both commits exactly once."""
    from pyspark.sql import SparkSession

    spark = iceberg_builder_conf(
        SparkSession.builder.master("local[4]").config("spark.ui.enabled", "false"),
        str(tmp_path / "wh"),
    ).getOrCreate()
    table = f"{ICEBERG_CATALOG}.db.t"
    df = spark.range(100).selectExpr("id", "id % 7 AS k")
    write_iceberg(df, table, mode="overwrite")
    write_iceberg(df.withColumn("id", df.id + 100), table, mode="append")
    compact_iceberg(spark, table)
    got = spark.table(table)
    assert got.count() == 200
    assert got.select("id").distinct().count() == 200
