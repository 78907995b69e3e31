"""OLAP query session over exported Parquet — the "query half" the
reference delegates to an external SQL engine (README.md:9: exported
Parquet is "used in conjunction with the GizmoSQL database engine to
hyper-accelerate ... OLAP workloads").  Here that half is native:
attach an export directory (or fixture directory) and run SQL through
Catalyst.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


class OlapSession:
    """Attach parquet table trees as queryable views and run SQL.

    Accepts either layout:
    - fixture layout: ``<dir>/<table>.parquet``
    - exporter layout (A15): ``<dir>/<schema>/<table>/*.parquet`` —
      views are named ``<schema>_<table>`` (and ``<table>`` when unique).
    """

    def __init__(self, spark: SparkSession):
        self.spark = spark
        self.tables: dict[str, str] = {}

    def attach_dir(self, path: str) -> list[str]:
        registered = []
        for entry in sorted(os.listdir(path)):
            full = os.path.join(path, entry)
            if entry.endswith(".parquet") and os.path.isfile(full):
                name = entry[: -len(".parquet")]
                self._register(name, full)
                registered.append(name)
            elif os.path.isdir(full):
                schema = entry
                for table in sorted(os.listdir(full)):
                    tdir = os.path.join(full, table)
                    if os.path.isdir(tdir):
                        name = f"{schema}_{table}"
                        self._register(name, tdir)
                        registered.append(name)
        return registered

    def _register(self, name: str, path: str) -> None:
        from oracle_parquet_dumper_spark.sources.tables import read_parquet_robust

        df = read_parquet_robust(self.spark, path)
        df.createOrReplaceTempView(name)
        self.tables[name] = path

    def sql(self, statement: str) -> DataFrame:
        return self.spark.sql(statement)
