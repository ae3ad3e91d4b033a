"""Independent DataFrame twins for a sample of shared_ansi queries.

For every shared_ansi query the Spark body IS the DuckDB oracle text, so the
oracle sweep checks only engine-vs-engine agreement on identical SQL — a
wrong-but-valid shared body hashes identically in both engines and the sweep
no longer validates the query's LOGIC, only dialect consistency (r7 ADVICE).
This module keeps a sample of independently-constructed DataFrame twins
(rebuilt from the query's SEMANTICS with the DataFrame API, not parsed from
the shared text) and asserts value equality, so a logic error in the shared
text is detectable again. The sample spans the converted shapes: scan-agg,
3-way and 6-way join-agg, EXISTS semi-join, disjunctive join predicates,
join-agg-limit, and a windowed rollup.

Runs at sf0.01 (SF_DIR_MULTI) so every group/limit path is populated.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from duckdb_fastlanes_spark.catalog import table
from duckdb_fastlanes_spark.operators.tpch_suite import _usum_col
from duckdb_fastlanes_spark.registry import queries

from tests.conftest import SF_DIR_MULTI


def _rows(df):
    cols = sorted(df.columns)
    out = [tuple(r[c] for c in cols) for r in df.collect()]
    return sorted(out, key=lambda t: tuple(str(x) for x in t))


def _assert_twin(spark, name, twin_df):
    got = queries()[name](spark, SF_DIR_MULTI)
    assert sorted(got.columns) == sorted(twin_df.columns), (
        f"{name}: columns {got.columns} vs twin {twin_df.columns}"
    )
    assert _rows(got) == _rows(twin_df), f"{name}: shared text != independent twin"


def test_twin_tpch_q3(spark):
    cust = table(spark, SF_DIR_MULTI, "customer").where(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = table(spark, SF_DIR_MULTI, "orders").where(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")
    )
    li = table(spark, SF_DIR_MULTI, "lineitem").where(
        F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp")
    )
    twin = (
        cust.join(orders, F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey", "o_orderdate")
        .agg(
            _usum_col(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("revenue")
        )
        .select("l_orderkey", "revenue", "o_orderdate")
        .orderBy(F.col("revenue").desc(), "l_orderkey")
        .limit(10)
    )
    _assert_twin(spark, "tpch_q3", twin)


def test_twin_tpch_q4(spark):
    orders = table(spark, SF_DIR_MULTI, "orders").where(
        (F.col("o_orderdate") >= F.lit("1997-07-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-10-01").cast("timestamp"))
    )
    li = table(spark, SF_DIR_MULTI, "lineitem").select("l_orderkey", "l_shipdate")
    twin = (
        orders.join(
            li,
            (F.col("l_orderkey") == F.col("o_orderkey"))
            & (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 80 DAY")),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )
    _assert_twin(spark, "tpch_q4", twin)


def test_twin_tpch_q5(spark):
    d = SF_DIR_MULTI
    twin = (
        table(spark, d, "customer")
        .join(table(spark, d, "orders"), F.col("c_custkey") == F.col("o_custkey"))
        .join(table(spark, d, "lineitem"), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            table(spark, d, "supplier"),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(table(spark, d, "nation"), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(table(spark, d, "region"), F.col("n_regionkey") == F.col("r_regionkey"))
        .where(
            (F.col("r_name") == "ASIA")
            & (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        .groupBy("n_name")
        .agg(
            _usum_col(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), "n_name")
    )
    _assert_twin(spark, "tpch_q5", twin)


def test_twin_tpch_q6(spark):
    li = table(spark, SF_DIR_MULTI, "lineitem")
    twin = li.where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_discount") >= 0.03)
        & (F.col("l_discount") <= 0.05)
        & (F.col("l_quantity") < 24)
    ).agg(
        F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias(
            "revenue"
        )
    )
    _assert_twin(spark, "tpch_q6", twin)


def test_twin_tpch_q10(spark):
    d = SF_DIR_MULTI
    orders = table(spark, d, "orders").where(
        (F.col("o_orderdate") >= F.lit("1997-10-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = table(spark, d, "lineitem").where(F.col("l_returnflag") == "R")
    twin = (
        table(spark, d, "customer")
        .join(orders, F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            table(spark, d, "nation"),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(
            _usum_col(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("revenue")
        )
        .select(
            "c_custkey",
            "c_name",
            "revenue",
            F.round(F.col("c_acctbal"), 2).alias("acctbal"),
            "n_name",
        )
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )
    _assert_twin(spark, "tpch_q10", twin)


def test_twin_tpch_q19(spark):
    d = SF_DIR_MULTI
    li = table(spark, d, "lineitem")
    part = table(spark, d, "part")
    band = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(1, 25)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(1, 35)
            & F.col("l_quantity").between(20, 30)
        )
    )
    twin = (
        li.join(part, F.col("p_partkey") == F.col("l_partkey"))
        .where(band)
        .agg(
            _usum_col(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("revenue")
        )
    )
    _assert_twin(spark, "tpch_q19", twin)


def test_twin_supplier_pareto(spark):
    li = table(spark, SF_DIR_MULTI, "lineitem")
    rev = li.groupBy("l_suppkey").agg(
        _usum_col(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
            "revenue"
        )
    )
    w_run = (
        Window.orderBy(F.col("revenue").desc(), "l_suppkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    twin = (
        rev.select(
            "l_suppkey",
            "revenue",
            F.round(
                F.sum("revenue").over(w_run)
                / F.sum("revenue").over(
                    Window.partitionBy().rowsBetween(
                        Window.unboundedPreceding, Window.unboundedFollowing
                    )
                ),
                4,
            ).alias("cum_share"),
        )
        .orderBy(F.col("revenue").desc(), "l_suppkey")
    )
    _assert_twin(spark, "supplier_pareto", twin)
