"""Plan-inspection helpers: make Catalyst's pushdown/pruning *observable* so
tests can assert the scan shape the reference guarantees by construction
(projection pushdown fls_reader.cpp:560-613, filter pushdown read_fls.cpp:9-11,
zone-map pruning row_group_filter.cpp:75-199)."""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    """Capture df.explain() output as a string."""
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[union-attr]
        df._jdf.queryExecution(), mode
    )


def pushed_filters(df: DataFrame) -> list[str]:
    """Filters the parquet source accepted for pushdown (PushedFilters: [...])."""
    text = explain_str(df)
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", text):
        body = m.group(1).strip()
        if body:
            out.extend(p.strip() for p in body.split(","))
    return out


def read_schema_columns(df: DataFrame) -> list[str]:
    """Column names the scan actually reads (ReadSchema: struct<...>)."""
    text = explain_str(df)
    cols: list[str] = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", text):
        for part in m.group(1).split(","):
            name = part.split(":")[0].strip()
            if name:
                cols.append(name)
    return cols


def wholestage_codegen_spans(df: DataFrame) -> int:
    """Count WholeStageCodegen subtrees — wider is better (fewer JVM↔Python or
    codegen breaks in the hot path). Uses the `codegen` explain mode because
    with AQE the pre-execution plan is an AdaptiveSparkPlan wrapper that hides
    the codegen stage markers. Physical planning is lazy, so AQE is toggled
    off just for this inspection (the df must not have been executed yet)."""
    spark = df.sparkSession
    prev = spark.conf.get("spark.sql.adaptive.enabled")
    try:
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        text = explain_str(df, "codegen")
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", prev)
    m = re.search(r"Found (\d+) WholeStageCodegen subtrees", text)
    return int(m.group(1)) if m else 0
