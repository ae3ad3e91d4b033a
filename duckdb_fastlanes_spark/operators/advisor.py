"""Storage-encoding advisor — the analysis the FastLanes *writer* performs
when it picks each column's encoding expression (the reference stores one
operator chain per column per row group, `src/reader/fls_reader.cpp:50-79`;
kernels inventoried in SURVEY.md §2.A′). We don't port the codecs — Parquet
provides them — but we reproduce the *decision inputs* as a first-class
query: per-column cardinality, run structure, and value range, plus the
encoding each implies (CONSTANT / DICT / RLE / FFOR-bitpack / PLAIN).

Scale note: run-length detection needs a total order. We use the table's
natural key order (l_orderkey, l_linenumber), decomposed two-level: adjacent
pairs inside an order count wide (window per l_orderkey), and only a one-row-
per-order first/last frame flows through an ordered window — so the largest
ordered structure is |orders|-sized, exactly the per-row-group granularity
the reference encodes at. The oracle's single global window over all rows is
algebraically identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from duckdb_fastlanes_spark.catalog import table
from duckdb_fastlanes_spark.registry import register

#: columns profiled, with a cast to string for uniform lag/ndv treatment
_COLS = ("l_returnflag", "l_linestatus", "l_quantity", "l_partkey", "l_shipdate")


@register(
    "encoding_advisor",
    oracle="""
    WITH ordered AS (
        SELECT l_returnflag, l_linestatus, l_quantity, l_partkey, l_shipdate,
               lag(l_returnflag) OVER (ORDER BY l_orderkey, l_linenumber, l_returnflag)
                   AS p_returnflag,
               lag(l_linestatus) OVER (ORDER BY l_orderkey, l_linenumber, l_linestatus)
                   AS p_linestatus,
               lag(l_quantity)   OVER (ORDER BY l_orderkey, l_linenumber, l_quantity)
                   AS p_quantity,
               lag(l_partkey)    OVER (ORDER BY l_orderkey, l_linenumber, l_partkey)
                   AS p_partkey,
               lag(l_shipdate)   OVER (ORDER BY l_orderkey, l_linenumber, l_shipdate)
                   AS p_shipdate
        FROM lineitem
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
    """Run counting decomposed two-level so no full-table pass is ever a
    single-partition sort (the oracle's one global window ran every row
    through one task — measured 4.2 s vs ~1 s decomposed at sf0.1):

    - WITHIN: lag windows PARTITION BY l_orderkey — every adjacent pair
      inside an order, computed wide (parallelism = #orders) for all five
      columns in one pass;
    - BOUNDARY: per-order first/last values (min_by/max_by on the line
      number — one key-local aggregate), then ONE lag window over the
      per-ORDER frame, which is |orders|-sized, not |rows|-sized. At 100 TB
      the same shape holds: the only ordered structure is one row per
      order/row-group, exactly the granularity the reference encodes at.

    n_runs = 1 (global first row) + within-changes + boundary-changes —
    algebraically identical to the oracle's lag-over-everything count.
    ndv/count stay one wide aggregate. All three 1-row frames cross-join
    and unpivot via stack()."""
    li = table(spark, sf_dir, "lineitem")
    # (l_orderkey, l_linenumber) is NOT unique (driver data has up to 6
    # duplicate line numbers per order), so the profiled column itself is
    # the tie-breaker — on BOTH engines — making the value sequence, and
    # therefore every run count, a canonical deterministic quantity instead
    # of an artifact of scan order.
    #
    # Expressions are built as SQL strings (one py4j round-trip per
    # expression) instead of composed Column objects: the Column form made
    # ~2,300 py4j calls and cost 0.9-1.5 s of PURE construction per build —
    # the JVM↔Python boundary tax of guide §4 applies to plan construction
    # too, and this operator is the registry's worst offender.
    prev = li.selectExpr(
        "l_orderkey",
        *_COLS,
        *[
            f"lag({c}) OVER (PARTITION BY l_orderkey"
            f" ORDER BY l_linenumber, {c}) AS p_{c}"
            for c in _COLS
        ],
    )
    within = prev.agg(
        *[
            F.expr(
                f"sum(CASE WHEN p_{c} IS NOT NULL AND {c} != p_{c}"
                f" THEN 1 ELSE 0 END) AS w_{c}"
            )
            for c in _COLS
        ]
    )
    per_order = li.groupBy("l_orderkey").agg(
        *[
            F.expr(f"min_by({c}, struct(l_linenumber, {c})) AS first_{c}")
            for c in _COLS
        ],
        *[
            F.expr(f"max_by({c}, struct(l_linenumber, {c})) AS last_{c}")
            for c in _COLS
        ],
    )
    bound = per_order.selectExpr(
        *[f"first_{c}" for c in _COLS],
        *[f"lag(last_{c}) OVER (ORDER BY l_orderkey) AS pl_{c}" for c in _COLS],
    )
    boundary = bound.agg(
        *[
            F.expr(
                f"sum(CASE WHEN pl_{c} IS NOT NULL AND first_{c} != pl_{c}"
                f" THEN 1 ELSE 0 END) AS b_{c}"
            )
            for c in _COLS
        ]
    )
    stats = li.agg(
        F.expr("count(1) AS n_rows"),
        *[F.expr(f"count(DISTINCT {c}) AS ndv_{c}") for c in _COLS],
    )
    wide = stats.crossJoin(within).crossJoin(boundary)
    stack_args = ", ".join(
        f"'{c}', ndv_{c}, 1L + w_{c} + b_{c}" for c in _COLS
    )
    per_col = wide.selectExpr(
        "n_rows",
        f"stack({len(_COLS)}, {stack_args}) AS (col_name, ndv, n_runs)",
    )
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
