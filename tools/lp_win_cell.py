"""One fresh-process timed run of the graph_link_prediction WINDOW variant.

Same query semantics, but the candidate aggregate is ONE radix sort + one
streaming WindowExec (sum, sum, row_number over the same (pk) spec) instead
of the partial+final HashAggregate pair — the hash maps spill at the
2 B-group 1000x scale. Usage: python tools/lp_win_cell.py <sf_dir>
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import Window
from pyspark.sql import functions as F

from duckdb_fastlanes_spark import get_spark


def main() -> int:
    sf_dir = sys.argv[1]
    spark = get_spark("lp-win-cell")
    spark.sparkContext.setLogLevel("ERROR")
    from duckdb_fastlanes_spark.catalog import optimize_layout, table, warm_cache
    from duckdb_fastlanes_spark.session import (
        input_gauge_bytes,
        tune_for_input,
    )

    tune_for_input(spark, sf_dir)
    optimize_layout(spark, sf_dir)
    warm_cache(spark, sf_dir)

    from duckdb_fastlanes_spark.operators.graph import (
        AA_SCALE,
        LP_DEG_CAP,
        _copurchase_pairs,
    )

    t0 = time.monotonic()
    pairs = _copurchase_pairs(spark, sf_dir).localCheckpoint()
    edges = pairs.selectExpr("s1 AS src", "s2 AS dst").unionAll(
        pairs.selectExpr("s2 AS src", "s1 AS dst")
    )
    deg = (
        edges.groupBy("src")
        .agg(F.count(F.lit(1)).alias("d"))
        .localCheckpoint(eager=False)
    )
    from duckdb_fastlanes_spark.session import SMALL_INPUT_BYTES

    _big = input_gauge_bytes(sf_dir) >= SMALL_INPUT_BYTES

    def _dim(df):
        return df.hint("shuffle_hash") if _big else F.broadcast(df)

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
            _dim(deg.selectExpr("src AS node", "d")),
            F.col("dst") == F.col("node"),
        )
        .withColumn("q", F.least(F.lit(1.0), F.lit(float(LP_DEG_CAP)) / F.col("d")))
        .filter(u01 < F.col("q"))
        .select("src", "dst", "d")
    )
    width = max(
        spark.sparkContext.defaultParallelism,
        min(4096, input_gauge_bytes(sf_dir) // (24 * 1024**2)),
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
    q = F.least(F.lit(1.0), F.lit(float(LP_DEG_CAP)) / F.col("d"))
    w_u = F.round(F.lit(1000000000.0) / (q * q)).cast("bigint").alias("w_u")
    aa_term = (
        F.round(F.lit(1000000000.0) / (F.log(F.col("d").cast("double")) * q * q))
        .cast("bigint")
        .alias("aa_term")
    )
    _PK = F.lit(1 << 32).cast("bigint")
    pk = (F.col("s1").cast("bigint") * _PK + F.col("s2")).alias("pk")
    spec = Window.partitionBy("pk").orderBy("pk")
    frame = spec.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    cand = (
        wedges.select(pk, "d")
        .repartition(width, "pk")
        .select("pk", w_u, aa_term)
        .select(
            "pk",
            F.sum("w_u").over(frame).alias("cn_u"),
            F.sum("aa_term").over(frame).alias("aa_u"),
            F.row_number().over(spec).alias("rn"),
        )
        .where("rn = 1")
        .select("pk", "cn_u", "aa_u")
    )
    top = (
        cand.join(_dim(pairs.select(pk)), ["pk"], "left_anti")
        .orderBy(F.desc("cn_u"), "pk")
        .limit(25)
    )
    _kt = dict(pairs.dtypes)["s1"]
    top = top.select(
        F.shiftrightunsigned("pk", 32).cast(_kt).alias("s1"),
        F.col("pk").bitwiseAND(F.lit((1 << 32) - 1)).cast(_kt).alias("s2"),
        "cn_u",
        "aa_u",
    )
    est = F.col("cn_u") / F.lit(1000000000.0)
    out = (
        top.join(_dim(deg.selectExpr("src AS s1", "d AS d1")), "s1")
        .join(_dim(deg.selectExpr("src AS s2", "d AS d2")), "s2")
        .select(
            "s1",
            "s2",
            "cn_u",
            F.round(est, AA_SCALE).alias("common_est"),
            F.round(F.col("aa_u") / 1000000000.0, AA_SCALE).alias("adamic_adar"),
            F.round(est / (F.col("d1") + F.col("d2") - est), AA_SCALE).alias(
                "jaccard"
            ),
        )
        .orderBy(F.desc("cn_u"), "s1", "s2")
        .select("s1", "s2", "common_est", "adamic_adar", "jaccard")
    )
    rows = [tuple(r) for r in out.collect()]
    wall = time.monotonic() - t0
    print(json.dumps({"variant": "window", "sf_dir": sf_dir, "wall": round(wall, 2),
                      "n_rows": len(rows), "head": rows[:3]}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
