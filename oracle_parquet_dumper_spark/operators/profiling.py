"""Data profiling: per-column statistics in one declarative pass.

The reference exports tables blind — it never inspects values (its only
schema awareness is the type-exclusion list, main.py:96-97).  A 100 TB
ingest needs the opposite: a cheap profile (row counts, null fractions,
distinct counts, value ranges) per column to validate an export, choose
partition/bucket/Z-order columns, and catch schema drift.

Shape: ONE wide aggregate computes every per-column statistic in a
single scan, then ``stack`` unpivots the 1-row result into one row per
column — the profile never touches the data twice.  Exact
``count_distinct`` over C columns plans an Expand (C passes over the
shuffle); at 100 TB swap it for ``approx_count_distinct`` (HLL, single
pass, mergeable) — the panel query ``agg_sketch_panel`` shows that form.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from oracle_parquet_dumper_spark.plans.registry import query
from oracle_parquet_dumper_spark.sources.tables import load_table

# customer's fixture schema (TESTDATA.md) — no timestamp columns, so the
# min/max string renderings are engine-portable.
CUSTOMER_COLS = (
    "c_custkey",
    "c_name",
    "c_nationkey",
    "c_acctbal",
    "c_mktsegment",
)


def profile_columns(df: DataFrame, cols: list[str]) -> DataFrame:
    """(col_name, n_rows, n_null, n_distinct, min_s, max_s) per column,
    from one aggregate job."""
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        aggs += [
            F.count(c).alias(f"nn_{c}"),
            F.count_distinct(c).alias(f"nd_{c}"),
            F.min(c).cast("string").alias(f"mn_{c}"),
            F.max(c).cast("string").alias(f"mx_{c}"),
        ]
    wide = df.agg(*aggs)
    stack_args = ", ".join(f"'{c}', nn_{c}, nd_{c}, mn_{c}, mx_{c}" for c in cols)
    return wide.select(
        "n_rows",
        F.expr(
            f"stack({len(cols)}, {stack_args}) AS (col_name, n_notnull, n_distinct, min_s, max_s)"
        ),
    ).select(
        "col_name",
        "n_rows",
        (F.col("n_rows") - F.col("n_notnull")).alias("n_null"),
        "n_distinct",
        "min_s",
        "max_s",
    )


def _profile_oracle() -> str:
    branches = [
        f"""SELECT '{c}' AS col_name, (SELECT COUNT(*) FROM customer) AS n_rows,
           (SELECT COUNT(*) FROM customer) - COUNT({c}) AS n_null,
           COUNT(DISTINCT {c}) AS n_distinct,
           CAST(MIN({c}) AS VARCHAR) AS min_s, CAST(MAX({c}) AS VARCHAR) AS max_s
        FROM customer"""
        for c in CUSTOMER_COLS
    ]
    return " UNION ALL ".join(branches)


@query(
    "profile_columns_customer",
    oracle=_profile_oracle(),
    tags=("agg", "profiling"),
)
def profile_columns_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-pass column profile of the customer table — the
    export-validation / layout-selection primitive (see module doc)."""
    c = load_table(spark, sf_dir, "customer")
    return profile_columns(c, list(CUSTOMER_COLS))
