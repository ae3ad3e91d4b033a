"""Vector math over ArrayType columns — pure Catalyst expressions (zip_with /
aggregate), no UDFs, so they run inside whole-stage codegen and never leave the
JVM. Left-to-right IEEE summation keeps results bit-stable across engines.

Beyond-reference extension (SURVEY.md §7 step 5): the reference declares LIST
columns but cannot materialize them (translation_utils.cpp:36-37); these
helpers are the embedding-column algebra the 100 TB pipeline needs."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(x: Column, y: Column) -> Column:
    """Σ xᵢ·yᵢ, sequential fold (deterministic summation order)."""
    return F.aggregate(F.zip_with(x, y, lambda p, q: p * q), F.lit(0.0), lambda a, v: a + v)


def l2_norm(x: Column) -> Column:
    return F.sqrt(F.aggregate(x, F.lit(0.0), lambda a, v: a + v * v))


def cosine_similarity(x: Column, y: Column) -> Column:
    return dot(x, y) / (l2_norm(x) * l2_norm(y))


def as_double_array(x: Column) -> Column:
    """Upcast array<float> → array<double> before math (matches the oracle's
    CAST(embedding AS DOUBLE[]) so both engines accumulate in float64)."""
    return F.transform(x, lambda v: v.cast("double"))
