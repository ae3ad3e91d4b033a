"""Exactness of the split hi/lo BIGINT money-sum (operators/tpch_suite._usum_col).

The accumulator claims: for any multiset of ≤6-dp money values (either
sign), the rounded result equals exact Decimal arithmetic — independent of
partitioning, summation order, and value magnitude (up to ~9.2e18 micro-units
per group). These cases concentrate on what double sums get wrong: .005
rounding boundaries, sign cancellation, and large-magnitude groups."""

from __future__ import annotations

from decimal import ROUND_HALF_UP, Decimal

import numpy as np
import pytest

from pyspark.sql import functions as F

from duckdb_fastlanes_spark.operators.tpch_suite import _usum_col


def _exact(vals: list[float]) -> float:
    # ground truth: quantize each value to micro-units exactly as the
    # operator does (round-half-up on the double), sum in integers, then
    # divide and round to cents
    micros = sum(
        int(Decimal(repr(v)).scaleb(6).quantize(0, rounding=ROUND_HALF_UP))
        for v in vals
    )
    return float(
        (Decimal(micros).scaleb(-6)).quantize(Decimal("0.01"), rounding=ROUND_HALF_UP)
    )


@pytest.fixture(scope="module")
def groups():
    rng = np.random.default_rng(20260814)
    gs: dict[int, list[float]] = {}
    gid = 0
    # random 2-dp money values, mixed sign
    for _ in range(20):
        n = int(rng.integers(1, 400))
        gs[gid] = [round(float(x), 2) for x in rng.normal(0, 5e4, n)]
        gid += 1
    # .005-boundary stress: values whose cent rounding flips on sum order
    for _ in range(10):
        n = int(rng.integers(2, 50))
        gs[gid] = [round(float(x) + 0.005, 3) for x in rng.integers(0, 100, n)]
        gid += 1
    # 6-dp products (price * (1 - disc) * (1 + tax) shape)
    for _ in range(10):
        n = int(rng.integers(1, 200))
        p = rng.uniform(900, 105000, n)
        d = rng.integers(0, 11, n) / 100.0
        t = rng.integers(0, 9, n) / 100.0
        gs[gid] = [round(float(x), 6) for x in p * (1 - d) * (1 + t)]
        gid += 1
    # large-magnitude group: ~1e5 values of ~1e5 → sum ~1e10 (cent is far
    # below double ulp of the square-summed path, inside ours exactly)
    gs[gid] = [round(float(x), 2) for x in rng.uniform(9e4, 1.1e5, 20000)]
    return gs


def test_usum_matches_exact_decimal(spark, groups):
    rows = [(g, v) for g, vals in groups.items() for v in vals]
    df = spark.createDataFrame(rows, "g INT, v DOUBLE")
    # several partitionings: the sum must not depend on layout
    for parts in (1, 7):
        got = {
            r["g"]: r["s"]
            for r in df.repartition(parts)
            .groupBy("g")
            .agg(_usum_col(F.col("v")).alias("s"))
            .collect()
        }
        for g, vals in groups.items():
            assert got[g] == pytest.approx(_exact(vals), abs=0), (
                f"group {g} parts {parts}: {got[g]} != {_exact(vals)}"
            )


def test_usum_sql_shared_text_survives_int64_overflow(spark):
    """The SHARED SQL accumulator (tpch_suite._usum_sql, executed verbatim by
    BOTH engines for the shared_ansi money sums) must not wrap where a BIGINT
    sum would: 1M rows of 1e7 currency units = 1e19 micro-units > 2^63. With
    ANSI off Spark silently wraps a bigint sum negative (the r7 ADVICE
    hazard); the DECIMAL(25,0) accumulator stays exact."""
    import duckdb

    from duckdb_fastlanes_spark.operators.tpch_suite import _usum_sql

    frag = _usum_sql("v")
    n, v = 1_000_000, 1e7  # micro total 1e19 — past int64's 9.22e18
    spark.range(n).selectExpr(f"{v!r} AS v").createOrReplaceTempView(
        "usum_overflow_probe"
    )
    got = spark.sql(
        f"SELECT {frag} AS s FROM usum_overflow_probe"
    ).collect()[0]["s"]
    expect = float(n * v)
    assert got == expect, f"spark wrapped: {got} != {expect}"
    # the identical text on DuckDB agrees (the parity contract)
    con = duckdb.connect()
    duck = con.execute(
        f"SELECT {frag} AS s FROM (SELECT {v!r} AS v FROM range({n}))"
    ).fetchone()[0]
    assert duck == expect
