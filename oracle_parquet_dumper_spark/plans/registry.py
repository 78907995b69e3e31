"""Query registry — the single source of truth for the engine's surface.

Every operator the engine claims is registered here exactly once as a
``QuerySpec``: a named Spark function ``(spark, sf_dir) -> DataFrame``
plus (when SQL-expressible) an ANSI-SQL oracle string that DuckDB runs on
the same parquet tables.  ``__spark_entry__.py``, ``tests/`` and
``bench.py`` all iterate this registry, so coverage, correctness checks,
and benchmarks can never drift apart.

Float determinism note: the driver compares an order-insensitive value
hash, so floating-point aggregates must be *bit-identical* between Spark
and DuckDB.  Summing doubles is order-dependent; summing decimals is not.
``dec_sum_sql``/``dec_sum`` therefore cast to DECIMAL(25,6) before SUM and
back to DOUBLE after — both engines then produce the same IEEE double.

The SQL side converts decimal->double THROUGH VARCHAR: DuckDB's direct
decimal->double cast divides the int128 payload by 10^scale in floating
point (two roundings), which goes 1 ulp off the correctly-rounded value
once sums reach ~17 significant digits (seen at sf1), while Java's
BigDecimal.doubleValue and DuckDB's strtod are both correctly rounded —
so the string hop is what makes the two engines agree bit-for-bit.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None = None  # ANSI SQL for DuckDB; None => rows-only check
    tags: tuple[str, ...] = field(default_factory=tuple)
    bench: bool = False  # include in bench.py headline set
    doc: str = ""


REGISTRY: dict[str, QuerySpec] = {}


def query(
    name: str,
    oracle: str | None = None,
    tags: tuple[str, ...] = (),
    bench: bool = False,
):
    """Decorator registering a query implementation under ``name``."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        if bench and "demo" in tags:
            # demo = deliberately-naive form kept for pedagogy (e.g.
            # quadratic-within-block pair scoring); its LSH/bucketed
            # flagship twin is the benchable scale path.
            raise ValueError(f"demo-tagged query {name!r} cannot be a bench query")
        REGISTRY[name] = QuerySpec(
            name=name, fn=fn, oracle=oracle, tags=tags, bench=bench, doc=fn.__doc__ or ""
        )
        return fn

    return deco


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec.fn for name, spec in REGISTRY.items()}


def all_oracles() -> dict[str, str]:
    return {name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle is not None}


def bench_queries() -> dict[str, QuerySpec]:
    return {name: spec for name, spec in REGISTRY.items() if spec.bench}


# ---------------------------------------------------------------------------
# Bit-exact float aggregation helpers (shared Spark/SQL conventions)
# ---------------------------------------------------------------------------

def dec_sum(col: Column | str) -> Column:
    """Order-independent SUM over doubles: decimal-sum, then back to double."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast("decimal(25,6)")).cast("double")


def dec_avg(col: Column | str) -> Column:
    """Order-independent AVG: exact decimal sum divided by count, in double."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast("decimal(25,6)")).cast("double") / F.count(c)


def dec_sum_sql(expr: str) -> str:
    return f"CAST(CAST(SUM(CAST({expr} AS DECIMAL(25,6))) AS VARCHAR(64)) AS DOUBLE)"


# ---------------------------------------------------------------------------
# Exact-decimal PRODUCT terms (for revenue-style Σ price*(1-disc)*(1+tax))
#
# dec_sum makes the SUM order-independent, but when its argument is a
# product of doubles the per-row double->decimal cast itself is not
# portable: Spark rounds the double's SHORTEST DECIMAL REPR
# (BigDecimal.valueOf) while DuckDB rounds the binary value, so about
# one row in millions casts one 6th-decimal ulp apart (first seen as a
# 1-ulp sum_charge divergence at sf1).  The monetary/rate columns are
# 2-decimal-clean, so the portable form captures each FACTOR exactly in
# a small decimal and multiplies in decimal arithmetic — exact on both
# engines, with precisions kept far below the 38-digit clamp.
# ---------------------------------------------------------------------------

def dec_money(col: Column | str) -> Column:
    """Exact DECIMAL(12,2) capture of a 2-decimal money column."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("decimal(12,2)")


def dec_one_minus(col: Column | str) -> Column:
    """(1 - rate) as an exact small decimal (rate is 2-decimal-clean)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.lit(1) - c.cast("decimal(3,2)")


def dec_one_plus(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.lit(1) + c.cast("decimal(3,2)")


def dec_money_sql(expr: str) -> str:
    return f"CAST({expr} AS DECIMAL(12,2))"


def dec_one_minus_sql(expr: str) -> str:
    return f"(1 - CAST({expr} AS DECIMAL(3,2)))"


def dec_one_plus_sql(expr: str) -> str:
    return f"(1 + CAST({expr} AS DECIMAL(3,2)))"


def dec_avg_sql(expr: str) -> str:
    return f"CAST(CAST(SUM(CAST({expr} AS DECIMAL(25,6))) AS VARCHAR(64)) AS DOUBLE) / COUNT({expr})"
