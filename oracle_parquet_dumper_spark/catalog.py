"""Catalog abstraction: enumerate schemas/tables/columns like the
reference does from Oracle's data dictionary (get_tables main.py:191-217,
get_columns main.py:87-108), behind one interface so the exporter is
source-agnostic.

Two implementations:

- ``ParquetDirectoryCatalog`` — a directory of ``<table>.parquet`` (flat,
  single schema) or ``<schema>/<table>.parquet`` trees.  This is the
  test substrate and also the "re-export / compact" path at scale.
- ``JdbcCatalog`` — Oracle's ``all_tables`` / ``all_tab_columns`` via
  Spark JDBC (network-gated; SQL generation is unit-tested without a
  live database).

Regex include/exclude semantics follow Oracle ``REGEXP_LIKE`` (substring
match, reference main.py:200,205-207): Python ``re.search``.
"""

from __future__ import annotations

import os
import re
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

# Reference excludes these Oracle types (main.py:96-97): LOBs, raw binary,
# intervals, LONG.  The Spark-side reproduction excludes the types they
# map to after ingest.
EXCLUDED_SPARK_TYPES: tuple[type, ...] = (
    T.BinaryType,
    T.CalendarIntervalType,
    T.DayTimeIntervalType,
    T.YearMonthIntervalType,
)

EXCLUDED_ORACLE_TYPES = ("BLOB", "BFILE", "CLOB", "UNDEFINED", "UROWID", "LONG", "RAW")


def eligible_fields(schema: T.StructType, exclude_binary: bool = True) -> list[str]:
    """Type-exclusion projection pruning (reference A4, main.py:92-99):
    return the column names whose types survive the exclusion list, in
    schema (= catalog) order."""
    out = []
    for f in schema.fields:
        if exclude_binary and isinstance(f.dataType, EXCLUDED_SPARK_TYPES):
            continue
        out.append(f.name)
    return out


def matches(name: str, include_pattern: str, exclude_pattern: str | None) -> bool:
    """REGEXP_LIKE include + optional negated exclude (A2/A3)."""
    if not re.search(include_pattern, name):
        return False
    if exclude_pattern and re.search(exclude_pattern, name):
        return False
    return True


class ParquetDirectoryCatalog:
    """Treats a directory tree as a database: each ``<name>.parquet``
    file/dir is a table; subdirectories containing tables are schemas.
    A flat directory is exposed as single schema ``main``."""

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root

    def _tables_in(self, path: str) -> list[str]:
        if not os.path.isdir(path):
            return []
        return sorted(
            e[: -len(".parquet")] for e in os.listdir(path) if e.endswith(".parquet")
        )

    def list_schemas(self) -> list[str]:
        subs = sorted(
            e
            for e in os.listdir(self.root)
            if os.path.isdir(os.path.join(self.root, e)) and self._tables_in(os.path.join(self.root, e))
        )
        return subs if subs else ["main"]

    def list_tables(
        self, schema: str, include_pattern: str = ".*", exclude_pattern: str | None = None
    ) -> list[str]:
        """Ordered table list with regex include/exclude (A1-A3,
        main.py:191-217: ORDER BY table_name ASC)."""
        base = self.root if schema == "main" else os.path.join(self.root, schema)
        return [t for t in self._tables_in(base) if matches(t, include_pattern, exclude_pattern)]

    def read_table(self, schema: str, table: str) -> DataFrame:
        from oracle_parquet_dumper_spark.sources.tables import read_parquet_robust

        base = self.root if schema == "main" else os.path.join(self.root, schema)
        return read_parquet_robust(self.spark, os.path.join(base, f"{table}.parquet"))


@dataclass
class OracleConnectionInfo:
    """Connection parameters mirroring the reference CLI (main.py:317-368)."""

    hostname: str
    service_name: str
    port: int = 1521
    username: str = ""
    password: str = ""

    @property
    def jdbc_url(self) -> str:
        return f"jdbc:oracle:thin:@//{self.hostname}:{self.port}/{self.service_name}"


class JdbcCatalog:
    """Oracle catalog via Spark JDBC — the distributed analog of the
    reference's single-connection dictionary queries.

    Each method pushes the dictionary query into Oracle with
    ``option("query", ...)`` so filtering happens server-side, exactly
    like the reference's bind-variable REGEXP_LIKE predicates
    (main.py:195-214).

    NUMBER/DECIMAL mapping policy (pinned by
    tests/test_jdbc_roundtrip.py::test_jdbc_decimal_fidelity_roundtrip):
    SQL ``DECIMAL(p, s)`` with declared precision maps to Spark
    ``DecimalType(p, s)`` verbatim (p <= 38) and parquet stores the
    exact unscaled integer — no digit is rounded anywhere on the JDBC ->
    Spark -> parquet -> reader path, NULLs and max/min boundary values
    included.  The one lossy case is Oracle ``NUMBER`` with NO declared
    precision/scale: Spark's OracleDialect defaults it to
    ``decimal(38, 10)``, so values needing more than 10 fractional
    digits (or > 28 integer digits) would be rounded/overflowed at read
    time.  Declare precision in the source DDL, or pre-cast in a view,
    for such columns.  (The reference is lossier still: it builds arrow
    arrays straight from oracledb fetches, main.py:156-175, and oracledb
    returns unconstrained NUMBER as Python float unless fetch_decimals
    is set.)
    """

    DEFAULT_DRIVER = "oracle.jdbc.OracleDriver"

    def __init__(
        self,
        spark: SparkSession,
        conn: OracleConnectionInfo | None = None,
        isolation_init: str | None = None,
        fetchsize: int = 10000,
        url: str | None = None,
        driver: str | None = None,
    ):
        """``conn`` builds the Oracle thin URL; ``url``/``driver`` override
        them for any other JDBC source (the integration tests exercise the
        full option plumbing against embedded Derby — same reader path,
        different dialect)."""
        if conn is None and url is None:
            raise ValueError("JdbcCatalog needs either conn or url")
        self.spark = spark
        self.conn = conn
        self.isolation_init = isolation_init
        self.fetchsize = fetchsize
        self.url = url or conn.jdbc_url
        self.driver = driver or self.DEFAULT_DRIVER

    def _reader(self, sql: str, *, as_subquery: bool = False):
        r = (
            self.spark.read.format("jdbc")
            .option("url", self.url)
            .option("user", self.conn.username if self.conn else "")
            .option("password", self.conn.password if self.conn else "")
            .option("driver", self.driver)
            .option("fetchsize", str(self.fetchsize))
        )
        if as_subquery:
            # partitionColumn cannot be combined with the 'query' option;
            # a derived-table dbtable is the documented equivalent.
            r = r.option("dbtable", f"({sql}) t")
        else:
            r = r.option("query", sql)
        if self.isolation_init:
            r = r.option("sessionInitStatement", self.isolation_init)
        return r

    @staticmethod
    def _q(value: str) -> str:
        """Escape a value for interpolation into a SQL string literal —
        the Spark JDBC 'query' option cannot carry bind variables (the
        reference binds these, main.py:92-99), so single quotes must be
        doubled or a name/pattern containing ' breaks (and injects into)
        the dictionary query."""
        return value.replace("'", "''")

    @staticmethod
    def tables_sql(schema: str, include_pattern: str, exclude_pattern: str | None) -> str:
        """Generated dictionary SQL, structurally equivalent to reference
        get_tables (main.py:195-207): non-external, non-temporary tables,
        regex include/exclude, deterministic name order."""
        q = JdbcCatalog._q
        sql = (
            "SELECT table_name FROM all_tables "
            f"WHERE owner = '{q(schema)}' "
            "AND temporary = 'N' AND external = 'NO' "
            f"AND REGEXP_LIKE(table_name, '{q(include_pattern)}')"
        )
        if exclude_pattern:
            sql += f" AND NOT REGEXP_LIKE(table_name, '{q(exclude_pattern)}')"
        return sql + " ORDER BY table_name ASC"

    @staticmethod
    def columns_sql(schema: str, table: str) -> str:
        """Dictionary SQL equivalent to reference get_columns
        (main.py:92-99): type-excluded, catalog-ordered."""
        q = JdbcCatalog._q
        excl = ", ".join(f"'{t}'" for t in EXCLUDED_ORACLE_TYPES)
        return (
            "SELECT column_name FROM all_tab_columns "
            f"WHERE owner = '{q(schema)}' AND table_name = '{q(table)}' "
            f"AND data_type NOT IN ({excl}) "
            "AND data_type NOT LIKE 'INTERVAL %' "
            "ORDER BY column_id ASC"
        )

    def list_tables(
        self, schema: str, include_pattern: str = ".*", exclude_pattern: str | None = None
    ) -> list[str]:
        df = self._reader(self.tables_sql(schema, include_pattern, exclude_pattern)).load()
        return [r[0] for r in df.collect()]

    def list_columns(self, schema: str, table: str) -> list[str]:
        df = self._reader(self.columns_sql(schema, table)).load()
        return [r[0] for r in df.collect()]

    def read_table(
        self,
        schema: str,
        table: str,
        columns: list[str] | None = None,
        row_limit: int = -1,
        scn: int | None = None,
        partition_column: str | None = None,
        num_partitions: int = 1,
        bounds: tuple[int, int] | None = None,
    ) -> DataFrame:
        """Distributed table read — the big win over the reference's
        serial batch loop (main.py:156-158): N partitioned JDBC readers.

        ``scn`` threads Oracle flashback ``AS OF SCN`` into every
        partition's query, restoring the snapshot consistency the
        reference gets from one session-level isolation statement
        (main.py:222-223) — a per-session setting cannot span Spark's
        many JDBC connections (SURVEY.md §7 hard part 1).
        """
        cols = ", ".join(f'"{c}"' for c in columns) if columns else "*"
        src = f'"{schema}"."{table}"'
        if scn is not None:
            src += f" AS OF SCN {scn}"
        sql = f"SELECT {cols} FROM {src}"
        if row_limit != -1:
            sql += f" FETCH FIRST {row_limit} ROWS ONLY"
        partitioned = bool(partition_column and bounds and num_partitions > 1)
        r = self._reader(sql, as_subquery=partitioned)
        if partitioned:
            r = (
                r.option("partitionColumn", partition_column)
                .option("lowerBound", str(bounds[0]))
                .option("upperBound", str(bounds[1]))
                .option("numPartitions", str(num_partitions))
            )
        return r.load()

    def current_scn(self) -> int:
        df = self._reader("SELECT current_scn FROM v$database").load()
        return int(df.collect()[0][0])

    @staticmethod
    def bounds_sql(schema: str, table: str, partition_column: str, scn: int | None = None) -> str:
        """Bounds-discovery query for a partitioned read: one cheap
        MIN/MAX pushed to the database decides the range each of the N
        JDBC partitions scans."""
        src = f'"{schema}"."{table}"'
        if scn is not None:
            src += f" AS OF SCN {scn}"
        # Aliases matter: Spark's JDBC reader re-selects columns by name,
        # and unaliased aggregates get dialect-dependent names ("1"/"2"
        # on Derby) that break that re-select.
        return (
            f'SELECT MIN("{partition_column}") AS lo, MAX("{partition_column}") AS hi FROM {src}'
        )

    def plan_partitioned_read(
        self,
        schema: str,
        table: str,
        partition_column: str,
        num_partitions: int,
        scn: int | None = None,
    ) -> dict:
        """Discover bounds and return the kwargs for ``read_table`` —
        the two-step (bounds probe, partitioned scan) that turns the
        reference's serial full-table stream into N concurrent range
        scans sharing one flashback snapshot."""
        row = self._reader(self.bounds_sql(schema, table, partition_column, scn)).load().collect()[0]
        lo, hi = int(row[0]), int(row[1])
        return {
            "partition_column": partition_column,
            "bounds": (lo, hi),
            "num_partitions": num_partitions,
            "scn": scn,
        }
