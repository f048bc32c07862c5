"""Vector math over ArrayType(FloatType) columns — JVM-side higher-order
functions only (zip_with/aggregate); no Python UDF in the hot path.

All arithmetic is promoted float→double BEFORE multiply/accumulate, and
folds run sequentially left-to-right, so results are reproducible and match
DuckDB's list_* twins. Similarities are rounded (ROUND_SIM decimals) when
used as sort keys so cross-engine ulp noise can't reorder top-k output.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

ROUND_SIM = 6


def to_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product in double precision."""
    return F.aggregate(
        F.zip_with(to_double(a), to_double(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(to_double(a), F.lit(0.0), lambda acc, x: acc + x * x))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_rounded(a: Column, b: Column) -> Column:
    return F.round(cosine(a, b), ROUND_SIM)


def duck_cosine_sql(a: str, b: str, dim: int) -> str:
    """DuckDB twin of cosine_rounded for FLOAT[] columns (explicit
    element-wise double promotion, same fold order)."""
    return f"""ROUND(
      LIST_SUM(LIST_TRANSFORM(GENERATE_SERIES(1, {dim}),
               i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)))
      / (SQRT(LIST_SUM(LIST_TRANSFORM({a}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
         * SQRT(LIST_SUM(LIST_TRANSFORM({b}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))), 6)"""
