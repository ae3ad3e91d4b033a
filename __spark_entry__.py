"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``duckdb_fastlanes_spark`` (registry pattern): every
operator module registers its named queries + oracle SQL on import; this file
stays a thin adapter.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from duckdb_fastlanes_spark import registry


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1 shape, reference test/sql/simple.test:40) on
    /root/testdata/sf0.001; driver checks rows>0."""
    from duckdb_fastlanes_spark.operators.tpch import tpch_q1

    return tpch_q1(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return registry.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each SQL-expressible query."""
    return registry.oracles()
