"""Fifth A/B for the graph_link_prediction candidate aggregate (r12).

Round 4 picked mapInArrow complete aggregation (min 3.45 s vs pack 4.56 s).
This round tests moving the pair anti-join BELOW the pk exchange but ABOVE
the aggregate (result-identical: filtering wedges whose pk is an existing
pair removes exactly the groups the post-agg anti-join would remove, and
leaves every other group's sums untouched) — which (a) shrinks the aggregate
input by the adjacent share and (b) lets the aggregate output feed
TakeOrdered directly with NO post-aggregate join/exchange at any scale
(mapInArrow output loses its partitioning guarantee, so a post-agg
shuffled-hash anti would re-exchange the whole candidate set at the scaled
cells).

  pack       : committed r11 shape
  arrow      : round-4 winner (post-agg anti)
  arrowanti  : pk exchange -> broadcast anti -> mapInArrow agg -> TakeOrdered
  packanti   : pk exchange -> broadcast anti -> JVM agg -> TakeOrdered

Usage: python tools/lp_agg_ab5.py [--n=6] [sf_dir]
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
    n = int(next((a.split("=", 1)[1] for a in args if a.startswith("--n=")), "6"))
    pos = [a for a in args if not a.startswith("--")]
    sf_dir = pos[0] if pos else "/root/testdata/sf0.1"

    spark = get_spark("lp-agg-ab5")
    spark.sparkContext.setLogLevel("ERROR")
    from duckdb_fastlanes_spark.catalog import optimize_layout, warm_cache
    from duckdb_fastlanes_spark.session import tune_for_input

    tune_for_input(spark, sf_dir)
    optimize_layout(spark, sf_dir)
    warm_cache(spark, sf_dir)

    from duckdb_fastlanes_spark.operators.graph import LP_DEG_CAP, _copurchase_pairs
    from duckdb_fastlanes_spark.session import parquet_table_bytes

    li = parquet_table_bytes(sf_dir, "lineitem")
    width = max(
        spark.sparkContext.defaultParallelism, min(4096, li // (18 * 1024**2))
    )

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
    pk = (F.col("s1").cast("bigint") * F.lit(1 << 32) + F.col("s2")).alias("pk")

    def unpack(df):
        return df.select(
            F.shiftrightunsigned("pk", 32).cast("int").alias("s1"),
            F.col("pk").bitwiseAND(F.lit((1 << 32) - 1)).cast("int").alias("s2"),
            "cn_u",
            "aa_u",
        )

    def v_pack(pairs, wedges):
        cand = (
            wedges.select(pk, "d")
            .repartition(width, "pk")
            .select("pk", w_u, aa_term)
            .groupBy("pk")
            .agg(F.sum("w_u").alias("cn_u"), F.sum("aa_term").alias("aa_u"))
        )
        return unpack(
            cand.join(F.broadcast(pairs.select(pk)), ["pk"], "left_anti")
            .orderBy(F.desc("cn_u"), F.col("pk"))
            .limit(25)
        )

    import pyarrow as pa

    def agg2(it):
        batches = list(it)
        if not batches:
            return
        tbl = pa.Table.from_batches(batches)
        out = tbl.group_by("pk").aggregate([("w_u", "sum"), ("aa_term", "sum")])
        out = out.rename_columns(["pk", "cn_u", "aa_u"])
        yield from out.to_batches()

    def v_arrow(pairs, wedges):
        src = (
            wedges.select(pk, "d")
            .repartition(width, "pk")
            .select("pk", w_u, aa_term)
        )
        cand = src.mapInArrow(agg2, "pk bigint, cn_u bigint, aa_u bigint")
        return unpack(
            cand.join(F.broadcast(pairs.select(pk)), ["pk"], "left_anti")
            .orderBy(F.desc("cn_u"), F.col("pk"))
            .limit(25)
        )

    def v_arrowanti(pairs, wedges):
        src = (
            wedges.select(pk, "d")
            .repartition(width, "pk")
            .join(F.broadcast(pairs.select(pk)), ["pk"], "left_anti")
            .select("pk", w_u, aa_term)
        )
        cand = src.mapInArrow(agg2, "pk bigint, cn_u bigint, aa_u bigint")
        return unpack(cand.orderBy(F.desc("cn_u"), F.col("pk")).limit(25))

    def v_packanti(pairs, wedges):
        cand = (
            wedges.select(pk, "d")
            .repartition(width, "pk")
            .join(F.broadcast(pairs.select(pk)), ["pk"], "left_anti")
            .select("pk", w_u, aa_term)
            .groupBy("pk")
            .agg(F.sum("w_u").alias("cn_u"), F.sum("aa_term").alias("aa_u"))
        )
        return unpack(cand.orderBy(F.desc("cn_u"), F.col("pk")).limit(25))

    variants = {
        "pack": v_pack,
        "arrow": v_arrow,
        "arrowanti": v_arrowanti,
        "packanti": v_packanti,
    }

    out: dict[str, list[float]] = {}
    for rep in range(n):
        drain_persists()
        pairs, wedges = build_wedges()
        for name, fn in variants.items():
            df = fn(pairs, wedges)
            t0 = time.monotonic()
            df.write.format("noop").mode("overwrite").save()
            out.setdefault(name, []).append(round(time.monotonic() - t0, 3))
    print(json.dumps(out))
    print(json.dumps({k: min(v) for k, v in out.items()}))

    drain_persists()
    pairs, wedges = build_wedges()
    base = [tuple(r) for r in v_pack(pairs, wedges).collect()]
    agree = {
        name: [tuple(r) for r in fn(pairs, wedges).collect()] == base
        for name, fn in variants.items()
        if name != "pack"
    }
    print(json.dumps(agree))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
