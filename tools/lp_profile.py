"""Stage decomposition for graph_link_prediction at sf0.1 (r11 session 2).

Times each pipeline piece with the noop sink (guide §1.4), min-of-N,
fresh-construction per repeat, drain-persists between repeats — the same
discipline as tools/opt_iter.py. Prints one JSON line.

Usage: python tools/lp_profile.py [--n=3] [sf_dir]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from duckdb_fastlanes_spark import get_spark
from duckdb_fastlanes_spark.bench_support import drain_persists


def noop(df) -> float:
    t0 = time.monotonic()
    df.write.format("noop").mode("overwrite").save()
    return time.monotonic() - t0


def main() -> int:
    args = sys.argv[1:]
    n = int(next((a.split("=", 1)[1] for a in args if a.startswith("--n=")), "3"))
    pos = [a for a in args if not a.startswith("--")]
    sf_dir = pos[0] if pos else "/root/testdata/sf0.1"

    spark = get_spark("lp-profile")
    spark.sparkContext.setLogLevel("ERROR")
    from duckdb_fastlanes_spark.catalog import optimize_layout, warm_cache
    from duckdb_fastlanes_spark.session import tune_for_input

    tune_for_input(spark, sf_dir)
    optimize_layout(spark, sf_dir)
    warm_cache(spark, sf_dir)

    from duckdb_fastlanes_spark.catalog import table
    from duckdb_fastlanes_spark.operators.graph import (
        LP_DEG_CAP,
        _copurchase_pairs,
    )
    from duckdb_fastlanes_spark.session import SMALL_INPUT_BYTES, input_gauge_bytes

    _big = input_gauge_bytes(sf_dir) >= SMALL_INPUT_BYTES

    def _dim(df):
        return df.hint("shuffle_hash") if _big else F.broadcast(df)

    out: dict[str, list[float]] = {}

    def rec(k: str, v: float) -> None:
        out.setdefault(k, []).append(round(v, 3))

    width = spark.sparkContext.defaultParallelism

    for rep in range(n):
        drain_persists()
        spark.sparkContext.setJobDescription(f"lp_profile rep{rep}")

        # -- stage 1: co-purchase pairs (checkpoint job, counted as build)
        t0 = time.monotonic()
        pairs = _copurchase_pairs(spark, sf_dir).localCheckpoint()
        rec("pairs_ckpt", time.monotonic() - t0)

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
                _dim(deg.selectExpr("src AS node", "d")),
                F.col("dst") == F.col("node"),
            )
            .withColumn(
                "q", F.least(F.lit(1.0), F.lit(float(LP_DEG_CAP)) / F.col("d"))
            )
            .filter(u01 < F.col("q"))
            .select("src", "dst", "d")
        )
        rec("kept_noop", noop(kept))

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
        rec("wedges_noop", noop(wedges))
        rec("n_wedges", wedges.count())

        q = F.least(F.lit(1.0), F.lit(float(LP_DEG_CAP)) / F.col("d"))
        cand = (
            wedges.repartition(width, "s1", "s2")
            .select(
                "s1",
                "s2",
                F.round(F.lit(1000000000.0) / (q * q)).cast("bigint").alias("w_u"),
                F.round(
                    F.lit(1000000000.0)
                    / (F.log(F.col("d").cast("double")) * q * q)
                )
                .cast("bigint")
                .alias("aa_term"),
            )
            .groupBy("s1", "s2")
            .agg(F.sum("w_u").alias("cn_u"), F.sum("aa_term").alias("aa_u"))
        )
        rec("cand_noop", noop(cand))

        anti = cand.join(_dim(pairs), ["s1", "s2"], "left_anti")
        top = anti.orderBy(F.desc("cn_u"), "s1", "s2").limit(25)
        rec("top_noop", noop(top))

    # full-query wall from the registry for the same session, min-of-n
    from duckdb_fastlanes_spark import registry

    fn = registry.queries()["graph_link_prediction"]
    for rep in range(n):
        drain_persists()
        t0 = time.monotonic()
        df = fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        rec("full_noop", time.monotonic() - t0)

    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
