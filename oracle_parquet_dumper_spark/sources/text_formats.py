"""CSV / JSON (lines) / ORC (and optionally Avro) sources and sinks —
the fixture-interchange formats (SURVEY.md §2 Part B sources row).

Schema policy mirrors §1.2: explicit schema when the caller has one
(no inference job), else Spark's sampling inference.  At scale prefer
explicit schemas — inference scans data before the real job starts.

ORC is first-class in Spark SQL (vectorized reader, predicate pushdown
like parquet).  Avro needs the external spark-avro connector jar; the
helpers probe for it and raise a clear error when absent instead of a
py4j stack.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType | None = None,
    header: bool = True,
    **options,
) -> DataFrame:
    r = spark.read.option("header", str(header).lower())
    if schema is not None:
        r = r.schema(schema)
    else:
        r = r.option("inferSchema", "true")
    for k, v in options.items():
        r = r.option(k, v)
    return r.csv(path)


def read_json(
    spark: SparkSession, path: str, schema: T.StructType | None = None, **options
) -> DataFrame:
    r = spark.read
    if schema is not None:
        r = r.schema(schema)
    for k, v in options.items():
        r = r.option(k, v)
    return r.json(path)


def write_csv(df: DataFrame, path: str, header: bool = True, mode: str = "overwrite") -> None:
    df.write.mode(mode).option("header", str(header).lower()).csv(path)


def write_json(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).json(path)


def read_orc(
    spark: SparkSession, path: str, schema: T.StructType | None = None, **options
) -> DataFrame:
    r = spark.read
    if schema is not None:
        r = r.schema(schema)
    for k, v in options.items():
        r = r.option(k, v)
    return r.orc(path)


def write_orc(
    df: DataFrame, path: str, compression: str = "zstd", mode: str = "overwrite"
) -> None:
    """Columnar alternative sink: same pushdown/pruning properties as
    parquet (vectorized, stripe statistics), same compression choices."""
    df.write.mode(mode).option("compression", compression).orc(path)


def read_xml(
    spark: SparkSession, path: str, row_tag: str = "row", schema: T.StructType | None = None, **options
) -> DataFrame:
    """Native XML source (Spark 4, SPARK-44265 — the former spark-xml
    connector folded into core): schema inference over rowTag elements,
    attributes as `_attr` columns.  Row-tag parsing cannot split inside
    an element, so files split safely across executors like JSON lines."""
    r = spark.read.format("xml").option("rowTag", row_tag)
    if schema is not None:
        r = r.schema(schema)
    for k, v in options.items():
        r = r.option(k, v)
    return r.load(path)


def write_xml(
    df: DataFrame, path: str, row_tag: str = "row", root_tag: str = "rows", mode: str = "overwrite"
) -> None:
    df.write.mode(mode).format("xml").option("rowTag", row_tag).option(
        "rootTag", root_tag
    ).save(path)


def _require_avro(spark: SparkSession) -> None:
    # Resolve through Spark's own DataSource registry — the class file can
    # be present without the format being deployable, so Class.forName is
    # not a reliable probe.
    try:
        spark._jvm.org.apache.spark.sql.execution.datasources.DataSource.lookupDataSource(
            "avro", spark._jsparkSession.sessionState().conf()
        )
    except Exception as exc:  # connector jar not on the classpath
        raise RuntimeError(
            "Avro support needs the spark-avro connector jar "
            "(--packages org.apache.spark:spark-avro_2.13:<spark version>)"
        ) from exc


def read_avro(spark: SparkSession, path: str, **options) -> DataFrame:
    _require_avro(spark)
    r = spark.read.format("avro")
    for k, v in options.items():
        r = r.option(k, v)
    return r.load(path)


def write_avro(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    _require_avro(df.sparkSession)
    df.write.mode(mode).format("avro").save(path)
