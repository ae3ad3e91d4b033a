"""Declarative data-expectations: rule objects compiled into ONE aggregate.

The Great-Expectations-style validation surface a pipeline runs before
publishing a snapshot, built Spark-first: every rule becomes a conditional
count inside a single `agg()` pass, so checking 10 rules over 100 TB costs
one scan + one map-side-combined aggregate — not 10 jobs (compare
dq_integrity_checks, which intentionally spends one job per cross-table
probe; these rules are single-table and fuse).

Usage::

    suite = [
        not_null("o_orderkey"),
        unique("o_orderkey"),
        in_set("o_orderstatus", ["F", "O", "P"]),
        between("o_totalprice", 0, 1e7),
        matches("o_orderpriority", r"^[1-5]-[A-Z]+$"),
    ]
    report = validate(df, suite)   # rule | n_failed, one row per rule
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Rule:
    name: str
    #: builds the per-row "violation" predicate (unique() overrides validate)
    predicate: Callable[[], Column] | None
    #: rules that need their own grouped pass (uniqueness)
    group_cols: tuple[str, ...] = ()


def not_null(col: str) -> Rule:
    return Rule(f"not_null({col})", lambda: F.col(col).isNull())


def between(col: str, lo, hi) -> Rule:
    return Rule(
        f"between({col},{lo},{hi})",
        lambda: ~F.col(col).between(F.lit(lo), F.lit(hi)),
    )


def in_set(col: str, values: list) -> Rule:
    return Rule(
        f"in_set({col})", lambda: ~F.col(col).isin(values)
    )


def matches(col: str, pattern: str) -> Rule:
    return Rule(
        f"matches({col})", lambda: ~F.col(col).rlike(pattern)
    )


def unique(*cols: str) -> Rule:
    return Rule(f"unique({','.join(cols)})", None, tuple(cols))


def validate(df: DataFrame, rules: list[Rule]) -> DataFrame:
    """Run the suite; returns (rule STRING, n_failed BIGINT), suite order
    preserved via an explicit sort key. Row-predicate rules fuse into one
    aggregate pass; each unique() adds one grouped pass counting rows
    beyond the first per key (so n_failed = n_rows - n_distinct_keys)."""
    spark = df.sparkSession
    row_rules = [r for r in rules if r.predicate is not None]
    parts: list[DataFrame] = []
    if row_rules:
        agg_cols = [
            F.count_if(r.predicate()).cast("bigint").alias(f"c{i}")
            for i, r in enumerate(row_rules)
        ]
        one = df.agg(*agg_cols)
        stack = ", ".join(
            f"'{r.name}', c{i}" for i, r in enumerate(row_rules)
        )
        parts.append(
            one.selectExpr(
                f"stack({len(row_rules)}, {stack}) AS (rule, n_failed)"
            )
        )
    for r in rules:
        if r.predicate is None:
            dup = df.groupBy(*r.group_cols).count().filter(F.col("count") > 1)
            n = dup.agg(
                F.coalesce(F.sum(F.col("count") - 1), F.lit(0))
                .cast("bigint")
                .alias("n_failed")
            ).select(F.lit(r.name).alias("rule"), "n_failed")
            parts.append(n)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    order = {r.name: i for i, r in enumerate(rules)}
    mapping = F.create_map(
        *[x for name, i in order.items() for x in (F.lit(name), F.lit(i))]
    )
    return (
        out.withColumn("_ord", mapping[F.col("rule")])
        .orderBy("_ord")
        .drop("_ord")
    )
