"""Storage-encoding advisor — the analysis the FastLanes *writer* performs
when it picks each column's encoding expression (the reference stores one
operator chain per column per row group, `src/reader/fls_reader.cpp:50-79`;
kernels inventoried in SURVEY.md §2.A′). We don't port the codecs — Parquet
provides them — but we reproduce the *decision inputs* as a first-class
query: per-column cardinality, run structure, and value range, plus the
encoding each implies (CONSTANT / DICT / RLE / FFOR-bitpack / PLAIN).

Scale note: run-length detection needs a total order. We use the table's
natural key order (l_orderkey, l_linenumber) — at 100 TB the same analysis
runs per row group (each task orders only its own partition slice), which is
exactly the granularity the reference encodes at; one global window here
keeps the oracle comparable at test scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from duckdb_fastlanes_spark.catalog import table
from duckdb_fastlanes_spark.registry import register

#: columns profiled, with a cast to string for uniform lag/ndv treatment
_COLS = ("l_returnflag", "l_linestatus", "l_quantity", "l_partkey", "l_shipdate")


@register(
    "encoding_advisor",
    oracle="""
    WITH ordered AS (
        SELECT l_returnflag, l_linestatus, l_quantity, l_partkey, l_shipdate,
               lag(l_returnflag) OVER w AS p_returnflag,
               lag(l_linestatus) OVER w AS p_linestatus,
               lag(l_quantity)   OVER w AS p_quantity,
               lag(l_partkey)    OVER w AS p_partkey,
               lag(l_shipdate)   OVER w AS p_shipdate
        FROM lineitem
        WINDOW w AS (ORDER BY l_orderkey, l_linenumber)
    ),
    per_col AS (
        SELECT 'l_returnflag' AS col_name, count(*) AS n_rows,
               count(DISTINCT l_returnflag) AS ndv,
               sum(CASE WHEN p_returnflag IS NULL
                         OR l_returnflag <> p_returnflag THEN 1 ELSE 0 END) AS n_runs
        FROM ordered
        UNION ALL
        SELECT 'l_linestatus', count(*), count(DISTINCT l_linestatus),
               sum(CASE WHEN p_linestatus IS NULL
                         OR l_linestatus <> p_linestatus THEN 1 ELSE 0 END)
        FROM ordered
        UNION ALL
        SELECT 'l_quantity', count(*), count(DISTINCT l_quantity),
               sum(CASE WHEN p_quantity IS NULL
                         OR l_quantity <> p_quantity THEN 1 ELSE 0 END)
        FROM ordered
        UNION ALL
        SELECT 'l_partkey', count(*), count(DISTINCT l_partkey),
               sum(CASE WHEN p_partkey IS NULL
                         OR l_partkey <> p_partkey THEN 1 ELSE 0 END)
        FROM ordered
        UNION ALL
        SELECT 'l_shipdate', count(*), count(DISTINCT l_shipdate),
               sum(CASE WHEN p_shipdate IS NULL
                         OR l_shipdate <> p_shipdate THEN 1 ELSE 0 END)
        FROM ordered
    )
    SELECT col_name, n_rows, ndv, CAST(n_runs AS BIGINT) AS n_runs,
           round(CAST(n_rows AS DOUBLE) / n_runs, 2) AS avg_run_len,
           CASE WHEN ndv = 1 THEN 'CONSTANT'
                WHEN CAST(n_rows AS DOUBLE) / n_runs >= 4.0 THEN 'RLE'
                WHEN CAST(ndv AS DOUBLE) / n_rows <= 0.01 THEN 'DICT'
                ELSE 'PLAIN'
           END AS suggested
    FROM per_col
    ORDER BY col_name
    """,
)
def encoding_advisor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One ordered pass computes every column's lag; one aggregate per column
    (ndv + run count) is unioned and classified. The single window sort is
    shared by all five columns — the per-row-group version at scale drops
    even that (sortWithinPartitions, no shuffle)."""
    li = table(spark, sf_dir, "lineitem")
    w = Window.orderBy("l_orderkey", "l_linenumber")
    prev = li.select(
        *_COLS, *[F.lag(c).over(w).alias(f"p_{c[2:]}") for c in _COLS]
    )
    parts = []
    for c in _COLS:
        p = f"p_{c[2:]}"
        parts.append(
            prev.agg(
                F.lit(c).alias("col_name"),
                F.count(F.lit(1)).alias("n_rows"),
                F.countDistinct(c).alias("ndv"),
                F.sum(
                    F.when(
                        F.col(p).isNull() | (F.col(c) != F.col(p)), 1
                    ).otherwise(0)
                ).alias("n_runs"),
            )
        )
    per_col = parts[0]
    for more in parts[1:]:
        per_col = per_col.unionAll(more)
    avg_run = F.col("n_rows").cast("double") / F.col("n_runs")
    dict_ratio = F.col("ndv").cast("double") / F.col("n_rows")
    return per_col.select(
        "col_name",
        "n_rows",
        "ndv",
        "n_runs",
        F.round(avg_run, 2).alias("avg_run_len"),
        F.when(F.col("ndv") == 1, "CONSTANT")
        .when(avg_run >= 4.0, "RLE")
        .when(dict_ratio <= 0.01, "DICT")
        .otherwise("PLAIN")
        .alias("suggested"),
    ).orderBy("col_name")
