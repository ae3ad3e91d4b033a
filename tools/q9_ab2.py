"""r10 execution-tuning A/B for tpch_q9 at the 1000x cell (r9 verdict item 1).

The PLAN is A/B-proven optimal (r9: pinned SHJ 1.53 s vs merge-pin 1.66 s vs
AQE-alone 8.48 s, and the bucketed-merge path at this cell); the residual is
execution cost. Each variant runs in ITS OWN fresh process (one variant per
invocation) with the registered tpch_q9 UNCHANGED — only session/runtime
confs differ. Timing = min over 3 FRESH plan constructions (re-executing one
DataFrame object reuses registered shuffle map output and measures only the
result stage — a 40x flattering lie caught while building this tool).

Variants:
- base     : engine defaults (the registered configuration)
- part64   : spark.sql.shuffle.partitions=64
- part192  : spark.sql.shuffle.partitions=192
- lz4      : spark.io.compression.codec=lz4 (shuffle/broadcast blocks; zstd
             is the engine default via parquet only — shuffle default is lz4
             already on OSS Spark, so this pins it explicitly)
- zstdsh   : spark.io.compression.codec=zstd (trade CPU for shuffle bytes)
- offheap  : spark.memory.offHeap.enabled=true, 8g
- batch16k : spark.sql.parquet.columnarReaderBatchSize=16384
- duck     : the DuckDB oracle on the same parquet (the paired denominator)

Usage: python tools/q9_ab2.py <variant> [sf_dir]  → one JSON line
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

SF = sys.argv[2] if len(sys.argv) > 2 else "/tmp/dfs_scaled/sf10"

EXTRA = {
    "base": {},
    "part64": {"spark.sql.shuffle.partitions": "64"},
    "part192": {"spark.sql.shuffle.partitions": "192"},
    "lz4": {"spark.io.compression.codec": "lz4"},
    "zstdsh": {"spark.io.compression.codec": "zstd"},
    "offheap": {
        "spark.memory.offHeap.enabled": "true",
        "spark.memory.offHeap.size": "8g",
    },
    "batch16k": {"spark.sql.parquet.columnarReaderBatchSize": "16384"},
    "shj": {},
    "shj_part64": {"spark.sql.shuffle.partitions": "64"},
}


def main() -> int:
    variant = sys.argv[1]
    if variant == "duck":
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
        con.execute(sql).fetchall()  # warm
        best = min(
            (lambda t0: (con.execute(sql).fetchall(), time.perf_counter() - t0)[1])(
                time.perf_counter()
            )
            for _ in range(3)
        )
        print(json.dumps({"variant": "duck", "sf": SF, "sec": round(best, 3)}))
        return 0

    from duckdb_fastlanes_spark import get_spark, registry
    from duckdb_fastlanes_spark.catalog import optimize_layout
    from duckdb_fastlanes_spark.session import tune_for_input

    spark = get_spark("q9ab2", extra_conf=EXTRA[variant])
    spark.sparkContext.setLogLevel("ERROR")
    tune_for_input(spark, SF)
    optimize_layout(spark, SF)
    # runtime-settable confs apply post-build too (static ones only at build)
    for k, v in EXTRA[variant].items():
        try:
            spark.conf.set(k, v)
        except Exception:
            pass  # static conf — applied at session build above
    if variant.startswith("shj"):
        # same bucketed files (autoBucketedScan splits them normally), but
        # the orders join runs as a distributed shuffle-hash build instead
        # of consuming the bucket distribution with a merge
        import duckdb_fastlanes_spark.catalog as C

        C.is_bucketed = lambda *a: False
    fn = registry.queries()["tpch_q9"]
    fn(spark, SF).toArrow()  # JIT/layout warm-up
    best = 1e9
    for _ in range(3):
        df = fn(spark, SF)  # FRESH plan per run — no shuffle-reuse flattery
        t0 = time.perf_counter()
        df.toArrow()
        best = min(best, time.perf_counter() - t0)
    print(json.dumps({"variant": variant, "sf": SF, "sec": round(best, 3)}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
