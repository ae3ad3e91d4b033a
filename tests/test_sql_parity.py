"""SQL-surface parity: for queries whose DuckDB oracle SQL is plain ANSI,
the SAME SQL text must run through spark.sql over the registered views and
produce the DataFrame implementation's result — the §3.3 whole-engine path
(SQL string → result) with zero custom code."""

from __future__ import annotations

import pytest

from duckdb_fastlanes_spark import registry
from duckdb_fastlanes_spark.catalog import register_views
from tests.conftest import SF_DIR

#: oracle SQL that is ANSI enough for both parsers (no DuckDB list/ DISTINCT ON
#: / FOR-comprehension syntax)
ANSI_PARITY = [
    "tpch_q1",
    "tpch_q3",
    "tpch_q5",
    "tpch_q6",
    "tpch_q7",
    "tpch_q9",
    "tpch_q10",
    "tpch_q13",
    "tpch_q14",
    "tpch_q16",
    "tpch_q18",
    "tpch_q19",
    "count_distinct",
    "topk_orders",
]


@pytest.fixture(scope="module")
def views(spark):
    register_views(spark, SF_DIR)
    return spark


@pytest.mark.parametrize("name", ANSI_PARITY)
def test_sql_text_matches_dataframe_impl(views, name):
    spark = views
    sql = registry.oracles()[name]
    df_impl = registry.queries()[name](spark, SF_DIR)
    via_sql = spark.sql(sql)
    assert sorted(via_sql.columns) == sorted(df_impl.columns)
    a = sorted(map(lambda r: tuple(str(x) for x in r), via_sql.collect()))
    b = sorted(map(lambda r: tuple(str(x) for x in r), df_impl.collect()))
    assert a == b
