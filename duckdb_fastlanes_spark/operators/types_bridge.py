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
           min(CAST('{U64_MAX}' AS UBIGINT) - id) AS min_v,
           max(CAST('{U64_MAX}' AS UBIGINT) - id) AS max_v,
           CAST(sum(CAST(CAST('{U64_MAX}' AS UBIGINT) - id AS HUGEINT))
                AS DECIMAL(38, 0)) AS sum_v
    FROM g
    """,
)
def unsigned_mapping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UINT64 bridge: values at the 2⁶⁴ ceiling carried as DECIMAL(20,0)
    (BIGINT would overflow; the reference's UBIGINT has no Spark twin).
    min/max survive at full precision and the sum accumulates in
    DECIMAL(38,0) — matching DuckDB's native UBIGINT/HUGEINT arithmetic."""
    v = F.expr(f"CAST('{U64_MAX}' AS DECIMAL(20,0)) - id")
    return spark.range(0, 8).agg(
        F.count(F.lit(1)).alias("n"),
        F.min(v).alias("min_v"),
        F.max(v).alias("max_v"),
        F.sum(v).cast("decimal(38,0)").alias("sum_v"),
    )


@register(
    "hugeint_decimal38",
    oracle="""
    SELECT CAST(sum(CAST(o_orderkey AS HUGEINT) * CAST('4294967296000000000' AS HUGEINT))
                AS DECIMAL(38, 0)) AS big_sum,
           CAST(max(CAST(o_orderkey AS HUGEINT) * CAST('4294967296000000000' AS HUGEINT))
                AS DECIMAL(38, 0)) AS big_max,
           count(*) AS n
    FROM orders
    """,
)
def hugeint_decimal38(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HUGEINT bridge: products far beyond BIGINT range (key × 2³²·10⁹ ≈ 10²⁵)
    computed and summed in DECIMAL(38,0) — the Spark carrier for the
    reference's 128-bit integers (which its own writer can only stringify,
    fls_view_writer.cpp:12-46; DECIMAL(38,0) keeps them numeric here)."""
    from duckdb_fastlanes_spark.catalog import table

    o = table(spark, sf_dir, "orders")
    big = F.col("o_orderkey").cast("decimal(38,0)") * F.expr(
        "CAST('4294967296000000000' AS DECIMAL(19,0))"
    )
    return o.agg(
        F.sum(big).cast("decimal(38,0)").alias("big_sum"),
        F.max(big).cast("decimal(38,0)").alias("big_max"),
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
    """TIMESTAMP_NS bridge: the events table is INT64 TIMESTAMP(NANOS)
    parquet. Spark reads the raw 64-bit nanos (nanosAsLong) and derives the
    µs view by integer division — the same truncation DuckDB's parquet
    reader applies wholesale (its epoch_ns over this data returns
    µs-aligned values: the sub-µs digits are already gone engine-side,
    which is why the shared contract here is µs). The raw-nanos column
    Spark holds is strictly MORE fidelity than either DuckDB's read or the
    reference's own broken NS roundtrip
    (all_types_single_threaded.test:346-348)."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return ev.agg(
        F.count(F.lit(1)).alias("n"),
        F.expr("min(ts) div 1000").alias("min_us"),
        F.expr("max(ts) div 1000").alias("max_us"),
        F.timestamp_micros(F.expr("min(ts) div 1000")).alias("min_us_ts"),
        F.timestamp_micros(F.expr("max(ts) div 1000")).alias("max_us_ts"),
    )
