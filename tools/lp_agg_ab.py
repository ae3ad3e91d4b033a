"""A/B the graph_link_prediction candidate-aggregate shapes (r11 session 2).

The SQL metrics showed the cand aggregate plans TWO HashAggregates (partial
+ final, no exchange between — the explicit repartition already satisfies
the distribution), each building a ~20.7 M-group map, together ~77% of the
query's executor time. Variants measured here (each through the anti-join +
top-25, noop sink, alternating reps in one session):

  base    : current shape (repartition + groupBy; 2 hash aggs)
  pack    : pair key packed into ONE bigint through exchange+agg+anti
  sortagg : sortWithinPartitions + spark.sql.execution.replaceHashWithSortAgg
  packsort: packed key + sort-agg replacement
  wide    : base at 4x partitions (smaller per-task maps)

Usage: python tools/lp_agg_ab.py [--n=3] [sf_dir]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from duckdb_fastlanes_spark import get_spark
from duckdb_fastlanes_spark.bench_support import drain_persists


def main() -> int:
    args = sys.argv[1:]
    n = int(next((a.split("=", 1)[1] for a in args if a.startswith("--n=")), "3"))
    pos = [a for a in args if not a.startswith("--")]
    sf_dir = pos[0] if pos else "/root/testdata/sf0.1"

    spark = get_spark("lp-agg-ab")
    spark.sparkContext.setLogLevel("ERROR")
    from duckdb_fastlanes_spark.catalog import optimize_layout, warm_cache
    from duckdb_fastlanes_spark.session import tune_for_input

    tune_for_input(spark, sf_dir)
    optimize_layout(spark, sf_dir)
    warm_cache(spark, sf_dir)

    from duckdb_fastlanes_spark.operators.graph import LP_DEG_CAP, _copurchase_pairs

    width = spark.sparkContext.defaultParallelism

    def build_wedges():
        pairs = _copurchase_pairs(spark, sf_dir).localCheckpoint()
        edges = pairs.selectExpr("s1 AS src", "s2 AS dst").unionAll(
            pairs.selectExpr("s2 AS src", "s1 AS dst")
        )
        deg = (
            edges.groupBy("src")
            .agg(F.count(F.lit(1)).alias("d"))
            .localCheckpoint(eager=False)
        )
        u01 = (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.col("src").cast("string"),
                            F.lit(":"),
                            F.col("dst").cast("string"),
                        )
                    ),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("bigint")
            + F.lit(0.5)
        ) / F.lit(4294967296.0)
        kept = (
            edges.join(
                F.broadcast(deg.selectExpr("src AS node", "d")),
                F.col("dst") == F.col("node"),
            )
            .withColumn(
                "q", F.least(F.lit(1.0), F.lit(float(LP_DEG_CAP)) / F.col("d"))
            )
            .filter(u01 < F.col("q"))
            .select("src", "dst", "d")
        )
        adj = (
            kept.repartition(width, "dst")
            .groupBy("dst")
            .agg(
                F.sort_array(F.collect_list("src")).alias("srcs"),
                F.max("d").alias("d"),
            )
            .where(F.size("srcs") > 1)
        )
        wedges = (
            adj.select(F.posexplode("srcs").alias("pos", "s1"), "srcs", "d")
            .select(
                "s1",
                F.slice(
                    F.col("srcs"),
                    F.col("pos") + 2,
                    F.greatest(F.size("srcs") - F.col("pos") - 1, F.lit(0)),
                ).alias("cand"),
                "d",
            )
            .where(F.size("cand") > 0)
            .select("s1", F.explode("cand").alias("s2"), "d")
        )
        return pairs, wedges

    q = F.least(F.lit(1.0), F.lit(float(LP_DEG_CAP)) / F.col("d"))
    w_u = F.round(F.lit(1000000000.0) / (q * q)).cast("bigint").alias("w_u")
    aa_term = (
        F.round(F.lit(1000000000.0) / (F.log(F.col("d").cast("double")) * q * q))
        .cast("bigint")
        .alias("aa_term")
    )

    def v_base(pairs, wedges, parts):
        cand = (
            wedges.repartition(parts, "s1", "s2")
            .select("s1", "s2", w_u, aa_term)
            .groupBy("s1", "s2")
            .agg(F.sum("w_u").alias("cn_u"), F.sum("aa_term").alias("aa_u"))
        )
        return (
            cand.join(F.broadcast(pairs), ["s1", "s2"], "left_anti")
            .orderBy(F.desc("cn_u"), "s1", "s2")
            .limit(25)
        )

    def v_pack(pairs, wedges, parts, sort):
        pk = (
            F.col("s1").cast("bigint") * F.lit(1 << 32) + F.col("s2").cast("bigint")
        ).alias("pk")
        w = wedges.select(pk, "d").repartition(parts, "pk")
        if sort:
            w = w.sortWithinPartitions("pk")
        cand = (
            w.select("pk", w_u, aa_term)
            .groupBy("pk")
            .agg(F.sum("w_u").alias("cn_u"), F.sum("aa_term").alias("aa_u"))
        )
        ppk = pairs.select(
            (
                F.col("s1").cast("bigint") * F.lit(1 << 32)
                + F.col("s2").cast("bigint")
            ).alias("pk")
        )
        return (
            cand.join(F.broadcast(ppk), ["pk"], "left_anti")
            .select(
                (F.col("pk") / F.lit(1 << 32)).cast("int").alias("s1"),
                (F.col("pk") % F.lit(1 << 32)).cast("int").alias("s2"),
                "cn_u",
                "aa_u",
            )
            .orderBy(F.desc("cn_u"), "s1", "s2")
            .limit(25)
        )

    def v_sortagg(pairs, wedges, parts):
        cand = (
            wedges.repartition(parts, "s1", "s2")
            .sortWithinPartitions("s1", "s2")
            .select("s1", "s2", w_u, aa_term)
            .groupBy("s1", "s2")
            .agg(F.sum("w_u").alias("cn_u"), F.sum("aa_term").alias("aa_u"))
        )
        return (
            cand.join(F.broadcast(pairs), ["s1", "s2"], "left_anti")
            .orderBy(F.desc("cn_u"), "s1", "s2")
            .limit(25)
        )

    out: dict[str, list[float]] = {}

    def run(name: str, df) -> None:
        t0 = time.monotonic()
        df.write.format("noop").mode("overwrite").save()
        out.setdefault(name, []).append(round(time.monotonic() - t0, 3))

    for rep in range(n):
        drain_persists()
        pairs, wedges = build_wedges()
        spark.conf.set("spark.sql.execution.replaceHashWithSortAgg", "false")
        run("base", v_base(pairs, wedges, width))
        run("pack", v_pack(pairs, wedges, width, sort=False))
        run("wide", v_base(pairs, wedges, 4 * width))
        spark.conf.set("spark.sql.execution.replaceHashWithSortAgg", "true")
        run("sortagg", v_sortagg(pairs, wedges, width))
        run("packsort", v_pack(pairs, wedges, width, sort=True))
        spark.conf.set("spark.sql.execution.replaceHashWithSortAgg", "false")

    print(json.dumps(out))
    # sanity: variants agree on the top-25
    spark.conf.set("spark.sql.execution.replaceHashWithSortAgg", "true")
    pairs, wedges = build_wedges()
    a = [tuple(r) for r in v_base(pairs, wedges, width).collect()]
    b = [
        (r["s1"], r["s2"], r["cn_u"], r["aa_u"])
        for r in v_pack(pairs, wedges, width, sort=True).collect()
    ]
    c = [tuple(r) for r in v_sortagg(pairs, wedges, width).collect()]
    print(json.dumps({"pack_matches": a == b, "sortagg_matches": a == c}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
