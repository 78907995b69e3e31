"""JDBC round-trip integration tests against embedded Derby.

The reference's only test is a real end-to-end export against a
dockerized Oracle (tests/basic_test.py:9-41).  No Oracle exists in this
container, but Spark ships the Derby embedded JDBC driver — same Spark
JDBC reader path, option plumbing (url/driver/fetchsize/
sessionInitStatement), dialect-quoted identifier SQL, partitioned range
reads, and the full catalog -> exporter -> parquet pipeline, all
exercised against a real database over JDBC instead of SQL-gen unit
tests alone.
"""

from __future__ import annotations

import os

import pyarrow.parquet as pq
import pytest

from oracle_parquet_dumper_spark.catalog import JdbcCatalog
from oracle_parquet_dumper_spark.exporter import SparkParquetExporter

N_ROWS = 100


class DerbyCatalog(JdbcCatalog):
    """JdbcCatalog with Derby's data dictionary standing in for Oracle's
    all_tables (SYS.SYSTABLES; Derby has no REGEXP_LIKE, so the regex
    include/exclude runs client-side via the shared ``matches``)."""

    def list_tables(self, schema, include_pattern=".*", exclude_pattern=None):
        from oracle_parquet_dumper_spark.catalog import matches

        df = self._reader(
            "SELECT tablename FROM sys.systables WHERE tabletype = 'T' ORDER BY tablename"
        ).load()
        return [
            r[0] for r in df.collect() if matches(r[0], include_pattern, exclude_pattern)
        ]


@pytest.fixture(scope="module")
def derby(spark, tmp_path_factory):
    """An embedded Derby database with one populated table, plus the
    catalog pointed at it."""
    db = str(tmp_path_factory.mktemp("derby") / "testdb")
    jvm = spark._jvm
    conn = jvm.java.sql.DriverManager.getConnection(f"jdbc:derby:{db};create=true")
    st = conn.createStatement()
    st.execute("CREATE TABLE ITEMS (ID INT NOT NULL, NAME VARCHAR(40), PRICE DOUBLE)")
    ps = conn.prepareStatement("INSERT INTO ITEMS VALUES (?, ?, ?)")
    for i in range(N_ROWS):
        ps.setInt(1, i)
        ps.setString(2, f"item-{i:04d}")
        ps.setDouble(3, float(i) * 1.5)
        ps.addBatch()
    ps.executeBatch()
    st.close()
    conn.close()
    cat = DerbyCatalog(
        spark,
        url=f"jdbc:derby:{db}",
        driver="org.apache.derby.jdbc.EmbeddedDriver",
        isolation_init="SET SCHEMA APP",
        fetchsize=17,
    )
    return cat


def test_jdbc_list_tables(derby):
    assert derby.list_tables("APP") == ["ITEMS"]
    assert derby.list_tables("APP", include_pattern="ITEM") == ["ITEMS"]
    assert derby.list_tables("APP", include_pattern=".*", exclude_pattern="ITEM") == []


def test_jdbc_read_table_full(derby):
    df = derby.read_table("APP", "ITEMS")
    assert df.count() == N_ROWS
    assert [f.name for f in df.schema.fields] == ["ID", "NAME", "PRICE"]


def test_jdbc_read_row_limit(derby):
    assert derby.read_table("APP", "ITEMS", row_limit=7).count() == 7


def test_jdbc_read_column_projection(derby):
    df = derby.read_table("APP", "ITEMS", columns=["ID", "NAME"])
    assert df.columns == ["ID", "NAME"]
    assert df.count() == N_ROWS


def test_jdbc_partitioned_read(derby):
    """Partitioned range read: N concurrent JDBC partitions covering the
    table exactly once (the reference's serial batch loop, distributed)."""
    df = derby.read_table(
        "APP",
        "ITEMS",
        partition_column="ID",
        num_partitions=4,
        bounds=(0, N_ROWS - 1),
    )
    assert df.rdd.getNumPartitions() == 4
    assert df.count() == N_ROWS
    assert {r.ID for r in df.collect()} == set(range(N_ROWS))


def test_jdbc_plan_partitioned_read(derby):
    kwargs = derby.plan_partitioned_read("APP", "ITEMS", "ID", 3)
    assert kwargs["bounds"] == (0, N_ROWS - 1)
    df = derby.read_table("APP", "ITEMS", **kwargs)
    assert df.rdd.getNumPartitions() == 3
    assert df.count() == N_ROWS


def test_jdbc_export_end_to_end(spark, derby, tmp_path):
    """The reference's e2e shape (tests/basic_test.py:34-40) over JDBC:
    catalog -> exporter -> reference-layout parquet with all rows."""
    out = str(tmp_path / "out")
    results = SparkParquetExporter(
        spark=spark,
        catalog=derby,
        output_path=out,
        schemas=["APP"],
        lowercase_object_names=True,
    ).export_tables()
    assert [r.table for r in results] == ["ITEMS"]
    assert results[0].rows == N_ROWS
    path = os.path.join(out, "app", "items", "items_0.parquet")
    assert os.path.exists(path)
    t = pq.read_table(path)
    assert t.num_rows == N_ROWS
    assert t.column_names == ["id", "name", "price"]
