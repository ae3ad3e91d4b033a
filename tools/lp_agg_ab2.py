"""Second A/B round for the graph_link_prediction candidate aggregate.

pack won round 1 (two hash aggs over ONE bigint key). Round 2: partition
width sweep for pack, plus a window formulation (one radix sort + streaming
window, zero hash maps).

Usage: python tools/lp_agg_ab2.py [--n=3] [sf_dir]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import Window
from pyspark.sql import functions as F

from duckdb_fastlanes_spark import get_spark
from duckdb_fastlanes_spark.bench_support import drain_persists


def main() -> int:
    args = sys.argv[1:]
    n = int(next((a.split("=", 1)[1] for a in args if a.startswith("--n=")), "3"))
    pos = [a for a in args if not a.startswith("--")]
    sf_dir = pos[0] if pos else "/root/testdata/sf0.1"

    spark = get_spark("lp-agg-ab2")
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
    pk_expr = (
        F.col("s1").cast("bigint") * F.lit(1 << 32) + F.col("s2").cast("bigint")
    ).alias("pk")

    def finish(cand, pairs):
        ppk = pairs.select(
            (
                F.col("s1").cast("bigint") * F.lit(1 << 32)
                + F.col("s2").cast("bigint")
            ).alias("pk")
        )
        return (
            cand.join(F.broadcast(ppk), ["pk"], "left_anti")
            .select(
                F.shiftrightunsigned("pk", 32).cast("int").alias("s1"),
                (F.col("pk").bitwiseAND(F.lit((1 << 32) - 1)))
                .cast("int")
                .alias("s2"),
                "cn_u",
                "aa_u",
            )
            .orderBy(F.desc("cn_u"), "s1", "s2")
            .limit(25)
        )

    def v_pack(pairs, wedges, parts):
        cand = (
            wedges.select(pk_expr, "d")
            .repartition(parts, "pk")
            .select("pk", w_u, aa_term)
            .groupBy("pk")
            .agg(F.sum("w_u").alias("cn_u"), F.sum("aa_term").alias("aa_u"))
        )
        return finish(cand, pairs)

    def v_win(pairs, wedges, parts):
        wspec = Window.partitionBy("pk")
        word = Window.partitionBy("pk").orderBy("pk")
        cand = (
            wedges.select(pk_expr, "d")
            .repartition(parts, "pk")
            .select("pk", w_u, aa_term)
            .select(
                "pk",
                F.sum("w_u").over(wspec).alias("cn_u"),
                F.sum("aa_term").over(wspec).alias("aa_u"),
                F.row_number().over(word).alias("rn"),
            )
            .where("rn = 1")
            .select("pk", "cn_u", "aa_u")
        )
        return finish(cand, pairs)

    out: dict[str, list[float]] = {}

    def run(name: str, df) -> None:
        t0 = time.monotonic()
        df.write.format("noop").mode("overwrite").save()
        out.setdefault(name, []).append(round(time.monotonic() - t0, 3))

    for rep in range(n):
        drain_persists()
        pairs, wedges = build_wedges()
        run("pack1", v_pack(pairs, wedges, width))
        run("pack2", v_pack(pairs, wedges, 2 * width))
        run("pack4", v_pack(pairs, wedges, 4 * width))
        run("win1", v_win(pairs, wedges, width))
        run("win2", v_win(pairs, wedges, 2 * width))

    print(json.dumps(out))
    pairs, wedges = build_wedges()
    a = [tuple(r) for r in v_pack(pairs, wedges, width).collect()]
    b = [tuple(r) for r in v_win(pairs, wedges, 2 * width).collect()]
    print(json.dumps({"win_matches": a == b}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
