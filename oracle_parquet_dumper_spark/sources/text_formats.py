"""CSV / JSON (lines) sources and sinks — the fixture-interchange
formats (SURVEY.md §2 Part B sources row).

Schema policy mirrors §1.2: explicit schema when the caller has one
(no inference job), else Spark's sampling inference.  At scale prefer
explicit schemas — inference scans data before the real job starts.
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
