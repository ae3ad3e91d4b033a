"""Type-bridging parity queries — the SURVEY.md §7 risk-register items made
oracle-checkable.

The reference maps every unsigned FastLanes type to DuckDB UBIGINT
(src/reader/translation_utils.cpp:19-24) and serializes HUGEINT/UHUGEINT and
INT128 decimals as strings on write (src/writer/fls_view_writer.cpp:12-46);
TIMESTAMP_NS roundtrips are known-broken in its own test corpus
(test/all_types_single_threaded.test:346-348). Spark has no unsigned or
128-bit integer type, so the documented bridges are: UINT64 → DECIMAL(20,0),
HUGEINT-range arithmetic → DECIMAL(38,0), TIMESTAMP_NS → long nanos +
lossless µs TimestampType view (the same µs conversion DuckDB's parquet
reader applies). Each query exercises one bridge end-to-end against the
DuckDB oracle operating in its native type.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from duckdb_fastlanes_spark.registry import register

#: 2⁶⁴ − 1, the UBIGINT ceiling the reference's unsigned mapping must carry
U64_MAX = "18446744073709551615"


@register(
    "unsigned_mapping",
    oracle=f"""
    WITH g AS (SELECT unnest(range(0, 8)) AS id)
    SELECT count(*) AS n,
           CAST(min(CAST('{U64_MAX}' AS UBIGINT) - id) AS VARCHAR) AS min_v,
           CAST(max(CAST('{U64_MAX}' AS UBIGINT) - id) AS VARCHAR) AS max_v,
           CAST(sum(CAST(CAST('{U64_MAX}' AS UBIGINT) - id AS HUGEINT))
                AS VARCHAR) AS sum_v
    FROM g
    """,
)
def unsigned_mapping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UINT64 bridge: values at the 2⁶⁴ ceiling carried as DECIMAL(20,0)
    (BIGINT would overflow; the reference's UBIGINT has no Spark twin).
    min/max survive at full precision and the sum accumulates in
    DECIMAL(38,0) — matching DuckDB's native UBIGINT/HUGEINT arithmetic.
    Output rendered as digit strings on BOTH engines: the comparison is
    then exact at full 128-bit precision (pandas would otherwise lower
    DuckDB's UBIGINT/HUGEINT to float64, quietly rounding past 2⁵³)."""
    v = F.expr(f"CAST('{U64_MAX}' AS DECIMAL(20,0)) - id")
    return spark.range(0, 8).agg(
        F.count(F.lit(1)).alias("n"),
        F.min(v).cast("string").alias("min_v"),
        F.max(v).cast("string").alias("max_v"),
        F.sum(v).cast("decimal(38,0)").cast("string").alias("sum_v"),
    )


@register(
    "hugeint_decimal38",
    oracle="""
    SELECT CAST(CAST(sum(CAST(o_orderkey AS HUGEINT) * CAST('4294967296000000000' AS HUGEINT))
                AS DECIMAL(38, 0)) AS VARCHAR) AS big_sum,
           CAST(CAST(max(CAST(o_orderkey AS HUGEINT) * CAST('4294967296000000000' AS HUGEINT))
                AS DECIMAL(38, 0)) AS VARCHAR) AS big_max,
           count(*) AS n
    FROM orders
    """,
)
def hugeint_decimal38(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HUGEINT bridge: products far beyond BIGINT range (key × 2³²·10⁹ ≈ 10²⁵)
    computed and summed in DECIMAL(38,0) — the Spark carrier for the
    reference's 128-bit integers (which its own writer can only stringify,
    fls_view_writer.cpp:12-46; DECIMAL(38,0) keeps them numeric here).
    Rendered as digit strings on BOTH engines so the compare is exact at
    full precision (pandas lowers DuckDB DECIMAL(38,0) to float64)."""
    from duckdb_fastlanes_spark.catalog import table

    o = table(spark, sf_dir, "orders")
    big = F.col("o_orderkey").cast("decimal(38,0)") * F.expr(
        "CAST('4294967296000000000' AS DECIMAL(19,0))"
    )
    return o.agg(
        F.sum(big).cast("decimal(38,0)").cast("string").alias("big_sum"),
        F.max(big).cast("decimal(38,0)").cast("string").alias("big_max"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "timestamp_ns_mapping",
    oracle="""
    SELECT count(*) AS n,
           min(epoch_us(ts)) AS min_us,
           max(epoch_us(ts)) AS max_us,
           min(CAST(ts AS TIMESTAMP)) AS min_us_ts,
           max(CAST(ts AS TIMESTAMP)) AS max_us_ts
    FROM events
    """,
)
def timestamp_ns_mapping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Timestamp bridge: whatever the physical parquet encoding of events.ts
    (INT64 TIMESTAMP(NANOS) → nanosAsLong div 1000, or timestamp[us]
    isAdjustedToUTC=false → NTZ cast under the UTC session), the catalog
    normalizes to µs TimestampType — the same µs UTC-instant semantics
    DuckDB's parquet reader applies (its own NS roundtrip is broken,
    all_types_single_threaded.test:346-348). This query proves the bridge:
    epoch-µs extrema and their timestamp views match DuckDB exactly."""
    from duckdb_fastlanes_spark.catalog import table

    ev = table(spark, sf_dir, "events")
    return ev.agg(
        F.count(F.lit(1)).alias("n"),
        F.unix_micros(F.min("ts")).alias("min_us"),
        F.unix_micros(F.max("ts")).alias("max_us"),
        F.min("ts").alias("min_us_ts"),
        F.max("ts").alias("max_us_ts"),
    )
