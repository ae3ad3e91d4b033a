"""Fourth A/B for the graph_link_prediction candidate aggregate (r12).

Round 3 (lp_agg_ab3.py) showed: single SortAggregate (sortckpt) is NOT a win
(sorting 20M rows costs more than the saved hash build), and the mapInArrow +
pyarrow.TableGroupBy complete aggregate looked ~12% faster than the committed
pack shape but with high variance. This round takes min-of-N over more reps
on just the contenders:

  pack    : committed r11 shape (partial+final HashAggregate in one stage)
  arrow   : pk exchange -> mapInArrow complete aggregate (pyarrow group_by,
            one hash build, zero JVM builds; guide §4.2)
  arrow1  : same but ships/aggregates ONLY (pk, w_u); aa_u recomputed for
            the 25 survivors from a checkpointed wedge table (narrower
            boundary + narrower hash values, at the cost of materializing
            the wedge stream once)

Usage: python tools/lp_agg_ab4.py [--n=6] [sf_dir]
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

    spark = get_spark("lp-agg-ab4")
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

    def finish(cand, pairs):
        ppk = pairs.select(pk)
        return (
            cand.join(F.broadcast(ppk), ["pk"], "left_anti")
            .orderBy(F.desc("cn_u"), F.col("pk"))
            .limit(25)
            .select(
                F.shiftrightunsigned("pk", 32).cast("int").alias("s1"),
                F.col("pk").bitwiseAND(F.lit((1 << 32) - 1)).cast("int").alias("s2"),
                "cn_u",
                "aa_u",
            )
        )

    def v_pack(pairs, wedges):
        cand = (
            wedges.select(pk, "d")
            .repartition(width, "pk")
            .select("pk", w_u, aa_term)
            .groupBy("pk")
            .agg(F.sum("w_u").alias("cn_u"), F.sum("aa_term").alias("aa_u"))
        )
        return finish(cand, pairs)

    import pyarrow as pa

    def agg2(it):
        tbl = pa.Table.from_batches(list(it))
        if tbl.num_rows == 0:
            yield pa.RecordBatch.from_pylist(
                [],
                schema=pa.schema(
                    [("pk", pa.int64()), ("cn_u", pa.int64()), ("aa_u", pa.int64())]
                ),
            )
            return
        out = tbl.group_by("pk").aggregate([("w_u", "sum"), ("aa_term", "sum")])
        out = out.rename_columns(["pk", "cn_u", "aa_u"])
        for b in out.to_batches():
            yield b

    def v_arrow(pairs, wedges):
        src = (
            wedges.select(pk, "d")
            .repartition(width, "pk")
            .select("pk", w_u, aa_term)
        )
        cand = src.mapInArrow(agg2, "pk bigint, cn_u bigint, aa_u bigint")
        return finish(cand, pairs)

    def agg1(it):
        tbl = pa.Table.from_batches(list(it))
        if tbl.num_rows == 0:
            yield pa.RecordBatch.from_pylist(
                [], schema=pa.schema([("pk", pa.int64()), ("cn_u", pa.int64())])
            )
            return
        out = tbl.group_by("pk").aggregate([("w_u", "sum")])
        out = out.rename_columns(["pk", "cn_u"])
        for b in out.to_batches():
            yield b

    def v_arrow1(pairs, wedges):
        w = (
            wedges.select(pk, "d")
            .repartition(width, "pk")
            .localCheckpoint(eager=False)
        )
        cand = w.select("pk", w_u).mapInArrow(agg1, "pk bigint, cn_u bigint")
        ppk = pairs.select(pk)
        top = (
            cand.join(F.broadcast(ppk), ["pk"], "left_anti")
            .orderBy(F.desc("cn_u"), F.col("pk"))
            .limit(25)
            # lazy: an eager checkpoint here would run the whole expensive
            # pipeline at construction time, outside the A/B timer
            .localCheckpoint(eager=False)
        )
        aa = (
            w.join(F.broadcast(top.select("pk")), ["pk"])
            .select("pk", aa_term)
            .groupBy("pk")
            .agg(F.sum("aa_term").alias("aa_u"))
        )
        return (
            top.join(F.broadcast(aa), ["pk"])
            .orderBy(F.desc("cn_u"), F.col("pk"))
            .select(
                F.shiftrightunsigned("pk", 32).cast("int").alias("s1"),
                F.col("pk").bitwiseAND(F.lit((1 << 32) - 1)).cast("int").alias("s2"),
                "cn_u",
                "aa_u",
            )
        )

    variants = {"pack": v_pack, "arrow": v_arrow, "arrow1": v_arrow1}

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
