"""Concurrent workload batch at a SCALE cell: the 12 headline queries
submitted simultaneously (one FAIR-scheduler pool each — bench.py's
concurrent discipline) against the DuckDB oracle running the same batch on
its single process, where one query already saturates all 32 cores so batch
wall ≈ sequential sum. This extends the sf0.1 concurrent story (0.57×) to
the 1000× corpus: Spark's per-query scheduling floor amortizes across the
batch while the scan/shuffle work overlaps.

Usage: python tools/concurrent_cell.py [sf_dir] [n_reps]  → one JSON line
"""

from __future__ import annotations

import concurrent.futures as cf
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = sys.argv[1] if len(sys.argv) > 1 else "/tmp/dfs_scaled/sf10"
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 2

HEADLINE = [
    "tpch_q1", "count_distinct", "scan_filter_range", "join_inner_broadcast",
    "join_full_outer", "agg_rollup", "window_row_number", "topk_orders",
    "dedup_minhash_lsh", "sim_bruteforce_topk", "text_quality_score",
    "stream_tumbling_counts",
]


def main() -> int:
    import duckdb

    from duckdb_fastlanes_spark import get_spark, registry
    from duckdb_fastlanes_spark.bench_support import drain_persists
    from duckdb_fastlanes_spark.catalog import optimize_layout, warm_cache
    from duckdb_fastlanes_spark.session import tune_for_input

    spark = get_spark("conc-cell")
    spark.sparkContext.setLogLevel("ERROR")
    tune_for_input(spark, SF)
    optimize_layout(spark, SF)
    warm_cache(spark, SF)
    qs = registry.queries()

    def run_one(name: str) -> None:
        sc = spark.sparkContext
        sc.setLocalProperty("spark.scheduler.pool", f"cell_{name}")
        try:
            qs[name](spark, SF).toArrow()
        finally:
            sc.setLocalProperty("spark.scheduler.pool", None)

    # warm (stage memoized indexes / JIT) once, untimed
    for name in HEADLINE:
        qs[name](spark, SF).toArrow()

    walls = []
    for _ in range(REPS):
        drain_persists()
        t0 = time.perf_counter()
        with cf.ThreadPoolExecutor(max_workers=12) as ex:
            list(ex.map(run_one, HEADLINE))
        walls.append(round(time.perf_counter() - t0, 3))

    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem "
        "events documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    osql = registry.oracles()
    for name in HEADLINE:
        con.execute(osql[name]).fetchall()  # warm
    duck_walls = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        for name in HEADLINE:
            con.execute(osql[name]).fetchall()
        duck_walls.append(round(time.perf_counter() - t0, 3))

    out = {
        "cell": "concurrent_headline", "sf_dir": SF, "n_queries": len(HEADLINE),
        "spark_concurrent_walls": walls, "duck_batch_walls": duck_walls,
        "ratio": round(min(walls) / min(duck_walls), 3),
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
