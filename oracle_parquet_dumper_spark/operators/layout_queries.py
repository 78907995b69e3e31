"""Oracle-checked queries over the storage-layout machinery
(sources/layouts.py): the Morton/Z-order clustering key gets a
registered differential query so the layout path has a hard correctness
signal, not just plan-shape tests.

The reference always writes one flat directory per table
(main.py:245-253); multi-dimensional clustering is a Part B extension —
it is what turns parquet row-group min/max stats into file skipping for
predicates on ANY clustered column at 100 TB (Delta/Iceberg's
OPTIMIZE ZORDER, rebuilt from plain column expressions).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from oracle_parquet_dumper_spark.plans.registry import query
from oracle_parquet_dumper_spark.sources.layouts import zorder_key
from oracle_parquet_dumper_spark.sources.tables import load_table

ZQ_BITS = 8  # 8 bits x 2 cols = 16-bit Morton key
ZQ_TILE_SHIFT = 8  # keep the top 8 bits -> 256 z-tiles at any SF


def _zorder_tiles_sql() -> str:
    """DuckDB twin of ``zorder_key(df, [l_partkey, l_suppkey], bits=8)``
    + tile rollup.  Mirrors the Spark expression tree exactly: min-max
    scale each column to 8 bits in DOUBLE ((x-mn)/span*top, floor,
    clamp), then interleave bit b of column i to position b*2+i."""
    top = (1 << ZQ_BITS) - 1
    scale = []
    for i, c in enumerate(("l_partkey", "l_suppkey")):
        mn, mx = f"mn{i}", f"mx{i}"
        span = f"(CASE WHEN {mx} > {mn} THEN {mx} - {mn} ELSE 1.0 END)"
        scale.append(
            f"LEAST(CAST(FLOOR((CAST({c} AS DOUBLE) - {mn}) / {span} * {top}) "
            f"AS BIGINT), {top}) AS s{i}"
        )
    terms = " + ".join(
        f"(((s{i} >> {b}) & 1) << {b * 2 + i})"
        for b in range(ZQ_BITS)
        for i in range(2)
    )
    return f"""
    WITH mm AS (
      SELECT MIN(CAST(l_partkey AS DOUBLE)) AS mn0, MAX(CAST(l_partkey AS DOUBLE)) AS mx0,
             MIN(CAST(l_suppkey AS DOUBLE)) AS mn1, MAX(CAST(l_suppkey AS DOUBLE)) AS mx1
      FROM lineitem
    ),
    scaled AS (
      SELECT l_partkey, l_suppkey, {scale[0]}, {scale[1]}
      FROM lineitem CROSS JOIN mm
    ),
    z AS (SELECT l_partkey, l_suppkey, ({terms}) AS zv FROM scaled)
    SELECT zv >> {ZQ_TILE_SHIFT} AS tile,
           COUNT(*) AS n_rows,
           MIN(l_partkey) AS pk_lo, MAX(l_partkey) AS pk_hi,
           MIN(l_suppkey) AS sk_lo, MAX(l_suppkey) AS sk_hi
    FROM z GROUP BY tile
    """


@query(
    "layout_zorder_tiles",
    oracle=_zorder_tiles_sql(),
    tags=("layout", "scale"),
)
def layout_zorder_tiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order clustering audit: Morton key over (l_partkey, l_suppkey)
    via ``sources.layouts.zorder_key`` (the same expression
    ``write_zordered`` sorts files by), rolled up into the 256 top-level
    z-tiles with each tile's min/max envelope on BOTH columns.

    The output is the file-skipping story made checkable: every tile's
    (pk, sk) envelope is a tight sub-rectangle of the key space — a
    single-column sort gives tight ranges on the first column only.
    Scale shape: one in-plan broadcast 1-row min/max aggregate (no
    driver collect), one map-side bit-interleave expression, one partial
    agg into a fixed 256-row result at any SF."""
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    keyed = zorder_key(li, ["l_partkey", "l_suppkey"], bits=ZQ_BITS)
    return (
        keyed.withColumn("tile", F.shiftrightunsigned(F.col("_z"), ZQ_TILE_SHIFT))
        .groupBy("tile")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("l_partkey").alias("pk_lo"),
            F.max("l_partkey").alias("pk_hi"),
            F.min("l_suppkey").alias("sk_lo"),
            F.max("l_suppkey").alias("sk_hi"),
        )
    )


def _hilbert_tiles_sql() -> str:
    """DuckDB twin of ``hilbert_key(df, [l_partkey, l_suppkey], bits=8)``
    + tile rollup: the xy->d walk unrolled as one chained CTE per level,
    mirroring the Spark projections op-for-op (integer-only — no float
    enters after the initial min-max scaling)."""
    bits = ZQ_BITS
    top = (1 << bits) - 1
    scale = []
    for i, c in enumerate(("l_partkey", "l_suppkey")):
        mn, mx = f"mn{i}", f"mx{i}"
        span = f"(CASE WHEN {mx} > {mn} THEN {mx} - {mn} ELSE 1.0 END)"
        scale.append(
            f"LEAST(CAST(FLOOR((CAST({c} AS DOUBLE) - {mn}) / {span} * {top}) "
            f"AS BIGINT), {top})"
        )
    ctes = [
        f"""lvl{bits} AS (
      SELECT l_partkey, l_suppkey, {scale[0]} AS x, {scale[1]} AS y,
             CAST(0 AS BIGINT) AS d
      FROM lineitem CROSS JOIN mm
    )"""
    ]
    for lvl in range(bits - 1, -1, -1):
        s = 1 << lvl
        prev = f"lvl{lvl + 1}"
        ctes.append(
            f"""lvl{lvl} AS (
      SELECT l_partkey, l_suppkey,
        CASE WHEN (y & {s}) = 0
             THEN CASE WHEN (x & {s}) > 0 THEN {s - 1} - y ELSE y END
             ELSE x END AS x,
        CASE WHEN (y & {s}) = 0
             THEN CASE WHEN (x & {s}) > 0 THEN {s - 1} - x ELSE x END
             ELSE y END AS y,
        d + CAST({s} AS BIGINT) * {s} *
            CAST(xor(3 * (CASE WHEN (x & {s}) > 0 THEN 1 ELSE 0 END),
                     (CASE WHEN (y & {s}) > 0 THEN 1 ELSE 0 END)) AS BIGINT) AS d
      FROM {prev}
    )"""
        )
    chain = ",\n    ".join(ctes)
    return f"""
    WITH mm AS (
      SELECT MIN(CAST(l_partkey AS DOUBLE)) AS mn0, MAX(CAST(l_partkey AS DOUBLE)) AS mx0,
             MIN(CAST(l_suppkey AS DOUBLE)) AS mn1, MAX(CAST(l_suppkey AS DOUBLE)) AS mx1
      FROM lineitem
    ),
    {chain}
    SELECT d >> {ZQ_TILE_SHIFT} AS tile,
           COUNT(*) AS n_rows,
           MIN(l_partkey) AS pk_lo, MAX(l_partkey) AS pk_hi,
           MIN(l_suppkey) AS sk_lo, MAX(l_suppkey) AS sk_hi
    FROM lvl0 GROUP BY tile
    """


@query(
    "layout_hilbert_tiles",
    oracle=_hilbert_tiles_sql(),
    tags=("layout", "scale"),
)
def layout_hilbert_tiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hilbert-curve clustering audit over (l_partkey, l_suppkey) —
    ``sources.layouts.hilbert_key`` rolled up into the 256 top-level
    curve tiles with per-tile min/max envelopes (the
    ``layout_zorder_tiles`` contract on the locality-optimal curve).

    Hilbert vs Morton: consecutive Hilbert positions are always
    grid-adjacent (unit-tested against a pure-Python reference plus the
    bijectivity/adjacency properties in tests/test_layouts.py), so a
    range partitioning of the key produces tighter file envelopes —
    fewer files overlap any query rectangle, which is the file-skipping
    win at 100 TB.  Same scale shape as the Morton audit: one broadcast
    min/max bounds row, ``bits`` chained integer projections (linear
    expression growth), one partial agg to a fixed 256-row result."""
    from oracle_parquet_dumper_spark.sources.layouts import hilbert_key

    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    keyed = hilbert_key(li, ["l_partkey", "l_suppkey"], bits=ZQ_BITS)
    return (
        keyed.withColumn("tile", F.shiftrightunsigned(F.col("_h"), ZQ_TILE_SHIFT))
        .groupBy("tile")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("l_partkey").alias("pk_lo"),
            F.max("l_partkey").alias("pk_hi"),
            F.min("l_suppkey").alias("sk_lo"),
            F.max("l_suppkey").alias("sk_hi"),
        )
    )
