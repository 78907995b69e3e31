"""Vector math over ArrayType(FloatType) columns — pure JVM-side column
expressions (zip_with / aggregate / transform), no Python UDFs, so they
run inside codegen and scale with the executors.

Convention: accumulate in DOUBLE (cast each element before multiply) —
float32 accumulation drifts and cannot be reproduced bit-for-bit by other
engines; the DuckDB oracles cast to DOUBLE[] for the same reason.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column | str, b: Column | str) -> Column:
    """Sequential left-fold dot product in double precision."""
    ca = F.col(a) if isinstance(a, str) else a
    cb = F.col(b) if isinstance(b, str) else b
    prods = F.zip_with(ca, cb, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, v: acc + v)


def norm(a: Column | str) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column | str, b: Column | str) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_rounded(a: Column | str, b: Column | str, digits: int = 6) -> Column:
    """Cosine rounded for cross-engine comparison: the double fold is
    deterministic per engine but the two engines may differ in the last
    ulp; 6 digits is far beyond any ranking need."""
    return F.round(cosine(a, b), digits)


# Matching DuckDB SQL fragments (kept adjacent so they evolve together).
def dot_sql(a: str, b: str) -> str:
    return f"list_dot_product({a}::DOUBLE[], {b}::DOUBLE[])"


def cosine_rounded_sql(a: str, b: str, digits: int = 6) -> str:
    return (
        f"round(list_dot_product({a}::DOUBLE[], {b}::DOUBLE[]) / "
        f"(sqrt(list_dot_product({a}::DOUBLE[], {a}::DOUBLE[])) * "
        f"sqrt(list_dot_product({b}::DOUBLE[], {b}::DOUBLE[]))), {digits})"
    )
