"""A/B the tpch_q9 plan at the 1000x cell (r7 verdict item 4).

The last relational cell at the 2.0x bar. Variants, each run in THIS fresh
process (one variant per invocation — a long-lived JVM accumulates residue
that inflates later aggregates; see tools/scale_experiment.py):

- base : the registered tpch_q9 (bucketed merge-pinned lineitem x orders,
         AQE broadcast-converts part/supplier post-filter)
- bcast: explicit broadcast() on the filtered part and on supplier — skips
         the shuffle stage AQE needs before it can convert
- wide : base plan with spark.sql.shuffle.partitions=192 (6x cores, the
         graph.py:246 input-gauge widening pattern)
- duck : the DuckDB oracle on the same parquet

Usage: python tools/q9_ab.py <variant> [sf_dir]   (prints one JSON line)
Run interleaved in both orderings, min-of-2, from a shell loop.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

SF = sys.argv[2] if len(sys.argv) > 2 else "/tmp/dfs_scaled/sf10"


def spark_run(variant: str) -> float:
    from pyspark.sql import functions as F

    from duckdb_fastlanes_spark import get_spark, registry
    from duckdb_fastlanes_spark.catalog import optimize_layout, table, warm_cache
    from duckdb_fastlanes_spark.session import tune_for_input

    spark = get_spark("q9ab")
    spark.sparkContext.setLogLevel("ERROR")
    tune_for_input(spark, SF)
    optimize_layout(spark, SF)
    warm_cache(spark, SF)
    if variant == "wide":
        spark.conf.set("spark.sql.shuffle.partitions", "192")

    if variant == "bcast":
        from duckdb_fastlanes_spark.catalog import is_bucketed

        def q(spark, sf_dir):
            p = F.broadcast(
                table(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
            )
            s = F.broadcast(table(spark, sf_dir, "supplier"))
            li = table(spark, sf_dir, "lineitem")
            o = table(spark, sf_dir, "orders")
            n = F.broadcast(table(spark, sf_dir, "nation"))
            lps = li.join(p, li.l_partkey == p.p_partkey).join(
                s, li.l_suppkey == s.s_suppkey
            )
            if is_bucketed(sf_dir, "lineitem") and is_bucketed(sf_dir, "orders"):
                lps = lps.hint("merge")
            return (
                lps.join(o, li.l_orderkey == o.o_orderkey)
                .join(n, s.s_nationkey == n.n_nationkey)
                .select(
                    F.col("n_name").alias("nation"),
                    F.year("o_orderdate").alias("o_year"),
                    F.round(
                        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100, 0
                    )
                    .cast("bigint")
                    .alias("amount_cents"),
                )
                .groupBy("nation", "o_year")
                .agg(F.round(F.sum("amount_cents") / 100.0, 2).alias("sum_profit"))
                .orderBy(F.col("nation"), F.col("o_year").desc())
            )
    else:
        q = registry.queries()["tpch_q9"]

    q(spark, SF).toArrow()  # warm-up
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        q(spark, SF).toArrow()
        best = min(best, time.perf_counter() - t0)
    return best


def duck_run() -> float:
    import duckdb

    from duckdb_fastlanes_spark import registry

    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem "
        "events documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    sql = registry.oracles()["tpch_q9"]
    con.execute(sql).fetchall()
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        con.execute(sql).fetchall()
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> int:
    variant = sys.argv[1]
    t = duck_run() if variant == "duck" else spark_run(variant)
    print(json.dumps({"variant": variant, "sf_dir": SF, "min2": round(t, 3)}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
