"""A/B the _copurchase_pairs distinct: (s1, s2) pair vs packed bigint key.

The distinct is an Exchange + partial/final HashAggregate pair over ~9 M
generated pair rows into ~1.2 M distinct pairs, shared by four graph
operators. Packing the pair into one bigint shrinks the exchange row and
both hash builds; unpack is a row-local projection.

Usage: python tools/pairs_ab.py [--n=4] [sf_dir]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from duckdb_fastlanes_spark import get_spark
from duckdb_fastlanes_spark.bench_support import drain_persists
from duckdb_fastlanes_spark.catalog import table


def main() -> int:
    args = sys.argv[1:]
    n = int(next((a.split("=", 1)[1] for a in args if a.startswith("--n=")), "4"))
    pos = [a for a in args if not a.startswith("--")]
    sf_dir = pos[0] if pos else "/root/testdata/sf0.1"

    spark = get_spark("pairs-ab")
    spark.sparkContext.setLogLevel("ERROR")
    from duckdb_fastlanes_spark.catalog import optimize_layout, warm_cache
    from duckdb_fastlanes_spark.session import tune_for_input

    tune_for_input(spark, sf_dir)
    optimize_layout(spark, sf_dir)
    warm_cache(spark, sf_dir)

    def baskets():
        li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
        return li.groupBy("l_orderkey").agg(
            F.sort_array(F.collect_set("l_partkey")).alias("parts")
        )

    def v_base():
        return (
            baskets()
            .where(F.size("parts") > 1)
            .select(F.posexplode("parts").alias("pos", "s1"), "parts")
            .select(
                "s1",
                F.slice(
                    F.col("parts"),
                    F.col("pos") + 2,
                    F.greatest(F.size("parts") - F.col("pos") - 1, F.lit(0)),
                ).alias("cand"),
            )
            .where(F.size("cand") > 0)
            .select("s1", F.explode("cand").alias("s2"))
            .distinct()
        )

    def v_pack():
        pk = F.col("s1").cast("bigint") * F.lit(1 << 32).cast("bigint") + F.col(
            "s2"
        )
        return (
            baskets()
            .where(F.size("parts") > 1)
            .select(F.posexplode("parts").alias("pos", "s1"), "parts")
            .select(
                "s1",
                F.slice(
                    F.col("parts"),
                    F.col("pos") + 2,
                    F.greatest(F.size("parts") - F.col("pos") - 1, F.lit(0)),
                ).alias("cand"),
            )
            .where(F.size("cand") > 0)
            .select("s1", F.explode("cand").alias("s2"))
            .select(pk.alias("pk"))
            .distinct()
            .select(
                F.shiftrightunsigned("pk", 32).cast("bigint").alias("s1"),
                F.col("pk").bitwiseAND(F.lit((1 << 32) - 1)).cast("bigint").alias("s2"),
            )
        )

    # pack the key INSIDE the generation: transform the suffix slice so the
    # exploded element is already packed (saves a projection pass, same plan
    # otherwise)
    def v_pack2():
        return (
            baskets()
            .where(F.size("parts") > 1)
            .select(F.posexplode("parts").alias("pos", "s1"), "parts")
            .select(
                F.expr(
                    "transform(slice(parts, pos + 2,"
                    " greatest(size(parts) - pos - 1, 0)),"
                    " x -> CAST(s1 AS BIGINT) * 4294967296 + x)"
                ).alias("cand")
            )
            .where(F.size("cand") > 0)
            .select(F.explode("cand").alias("pk"))
            .distinct()
            .select(
                F.shiftrightunsigned("pk", 32).cast("bigint").alias("s1"),
                F.col("pk").bitwiseAND(F.lit((1 << 32) - 1)).cast("bigint").alias("s2"),
            )
        )

    out: dict[str, list[float]] = {}

    def run(name, df):
        t0 = time.monotonic()
        d = df.localCheckpoint()
        out.setdefault(name, []).append(round(time.monotonic() - t0, 3))
        d.unpersist()

    for _ in range(n):
        drain_persists()
        run("base", v_base())
        run("pack", v_pack())
        run("pack2", v_pack2())

    print(json.dumps(out))
    a = sorted(map(tuple, v_base().collect()))
    b = sorted(map(tuple, v_pack().collect()))
    c = sorted(map(tuple, v_pack2().collect()))
    print(json.dumps({"pack_matches": a == b, "pack2_matches": a == c}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
