"""Vector/embedding column functions — cosine similarity, norms, dot
products over ``array<float>`` embedding columns.

All native higher-order functions (``zip_with``/``aggregate``): the
arithmetic stays in whole-stage codegen, promotes float32→double
BEFORE multiplying (bit-identical to the DuckDB oracle), and folds
left-to-right (same association order both engines).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double(v: Column | str) -> Column:
    col = F.col(v) if isinstance(v, str) else v
    return col.cast("array<double>")


def dot(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ, left-to-right double fold."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def sumsq(a: Column) -> Column:
    return F.aggregate(
        F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x
    )


def norm(a: Column) -> Column:
    """L2 norm (IEEE sqrt is correctly rounded → portable)."""
    return F.sqrt(sumsq(a))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity; inputs must already be double arrays."""
    return dot(a, b) / (norm(a) * norm(b))


# DuckDB twins (embedding FLOAT[] → cast each element before use).
SQL_AS_DOUBLE = "list_transform({col}, x -> CAST(x AS DOUBLE))"
SQL_DOT = (
    "list_reduce(list_prepend(0.0, "
    "list_transform(range(1, len({a}) + 1), i -> {a}[i] * {b}[i])), "
    "(acc, x) -> acc + x)"
)
SQL_SUMSQ = (
    "list_reduce(list_prepend(0.0, list_transform({a}, x -> x * x)), "
    "(acc, x) -> acc + x)"
)
