"""Delta Lake sink — capability-probed (VERDICT r9 #7).

The engine's incremental/compaction/Z-order story is implemented on
plain parquet (exporter.compact_table's atomic dir swap + crash replay,
sources/layouts.write_zordered) because ``import delta`` fails in this
container.  Where delta-spark IS installed, the same operations are a
transaction-log one-liner — this module is the probe + the Delta-backed
variants, following the transformWithState precedent
(streaming/transform_state.py:34-53): probe, a clear reason string, and
a documented fallback instead of a hard dependency.

Parity note: the reference writes flat parquet only (main.py:165-187);
both this module and the parquet fallbacks are Part B extensions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

FALLBACK = (
    "delta-spark is not installed; use the plain-parquet equivalents: "
    "exporter.compact_table (atomic small-file compaction with crash "
    "replay) and sources.layouts.write_zordered (OPTIMIZE ZORDER "
    "re-clustering). Install delta-spark and configure "
    "spark.sql.extensions=io.delta.sql.DeltaSparkSessionExtension to "
    "enable the transaction-log path."
)


def delta_available() -> tuple[bool, str]:
    """(usable, reason-if-not).  Needs both the ``delta`` Python
    bindings and the Delta jars on the Spark classpath; the import
    probe covers the first, ``configure_spark_with_delta_pip`` exists
    iff the bindings are installed and knows the right jars."""
    try:
        import delta  # noqa: F401
    except ImportError:
        return False, "the 'delta' package (delta-spark) is not installed"
    return True, ""


def require_delta() -> None:
    ok, why = delta_available()
    if not ok:
        raise RuntimeError(f"Delta Lake sink unavailable: {why}. {FALLBACK}")


def delta_builder_conf(builder):
    """Apply the documented Delta session config to a SparkSession
    builder (extensions + catalog); separate from ``require_delta`` so
    callers can compose it with their own settings."""
    return builder.config(
        "spark.sql.extensions", "io.delta.sql.DeltaSparkSessionExtension"
    ).config(
        "spark.sql.catalog.spark_catalog",
        "org.apache.spark.sql.delta.catalog.DeltaCatalog",
    )


def write_delta(df: DataFrame, path: str, mode: str = "append") -> None:
    """Transactional append/overwrite — the Delta twin of the
    exporter's manifest-committed incremental append
    (exporter.append_table): the transaction log supplies the atomic
    multi-file commit the parquet path builds by staged rename."""
    require_delta()
    df.write.format("delta").mode(mode).save(path)


def compact_delta(
    spark: SparkSession, path: str, zorder_cols: list[str] | None = None
) -> None:
    """OPTIMIZE (+ ZORDER BY) — the Delta twin of
    exporter.compact_table + layouts.write_zordered.  Readers are never
    blocked: the log swaps file sets atomically, the same contract the
    parquet path gets from its ``.compact.old`` dir swap."""
    require_delta()
    from delta import DeltaTable

    t = DeltaTable.forPath(spark, path)
    opt = t.optimize()
    if zorder_cols:
        opt.executeZOrderBy(*zorder_cols)
    else:
        opt.executeCompaction()
