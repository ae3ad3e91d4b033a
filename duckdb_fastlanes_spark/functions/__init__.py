"""Reusable scalar/vector expression helpers (JVM-side built-ins only)."""

from duckdb_fastlanes_spark.functions.vector import cosine_similarity, dot, l2_norm

__all__ = ["cosine_similarity", "dot", "l2_norm"]
