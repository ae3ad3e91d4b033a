"""Generalized AS-OF join — DuckDB's first-class ASOF JOIN (SURVEY.md §2.C
Joins row, public knowledge) as a reusable DataFrame operator.

For each left row, attach the most recent right row with right_ts <= left_ts
(direction='backward'; 'forward' = next right row at/after), matched within
``by`` equality keys and an optional tolerance.

Scale shape: implemented as union + partitioned window (last non-null over
ordered events), NOT as a range join — one shuffle on the ``by`` keys, no
per-row probe, no range-join explosion. This is the idiomatic Spark
re-expression for dense event tables; a broadcast range join only wins when
the right side is tiny."""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    by: Sequence[str],
    left_ts: str,
    right_ts: str,
    value_cols: Sequence[str],
    direction: str = "backward",
    tolerance_seconds: int | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """AS-OF join: left rows keep all their columns; each gains
    ``<value_col><suffix>`` from the matched right row (NULL when no match
    within direction/tolerance)."""
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")

    by = list(by)
    lcols = left.columns
    tagged_left = left.select(
        *lcols,
        F.col(left_ts).alias("_ts"),
        F.lit(0).alias("_is_right"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_v_{c}") for c in value_cols],
    )
    tagged_right = right.select(
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols if c not in by],
        *[F.col(c) for c in by],
        F.col(right_ts).alias("_ts"),
        F.lit(1).alias("_is_right"),
        *[F.col(c).alias(f"_v_{c}") for c in value_cols],
    ).select(*tagged_left.columns)  # align column order

    unioned = tagged_left.unionByName(tagged_right)
    # backward: right rows sort BEFORE left rows at equal ts (a tick at t is
    # visible to a query at t); forward: mirrored via descending order
    if direction == "backward":
        w = Window.partitionBy(*by).orderBy(F.col("_ts").asc(), F.col("_is_right").desc())
    else:
        w = Window.partitionBy(*by).orderBy(F.col("_ts").desc(), F.col("_is_right").desc())
    w = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)

    filled = unioned.select(
        *unioned.columns,
        *[
            F.last(F.when(F.col("_is_right") == 1, F.col(f"_v_{c}")), ignorenulls=True)
            .over(w)
            .alias(f"_m_{c}")
            for c in value_cols
        ],
        F.last(F.when(F.col("_is_right") == 1, F.col("_ts")), ignorenulls=True)
        .over(w)
        .alias("_m_ts"),
    )

    out = filled.filter(F.col("_is_right") == 0)
    if tolerance_seconds is not None:
        delta = (
            F.unix_timestamp("_ts") - F.unix_timestamp("_m_ts")
            if direction == "backward"
            else F.unix_timestamp("_m_ts") - F.unix_timestamp("_ts")
        )
        in_tol = delta <= tolerance_seconds
        out = out.select(
            *out.columns[: len(out.columns)],
        ).withColumns(
            {f"_m_{c}": F.when(in_tol, F.col(f"_m_{c}")) for c in value_cols}
        )
    return out.select(
        *lcols, *[F.col(f"_m_{c}").alias(f"{c}{suffix}") for c in value_cols]
    )
