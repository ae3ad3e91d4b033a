"""Benchmark harness (driver contract).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
on local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Headline set = the flagship Q1 shape plus one representative per operator
family, so the number tracks the whole engine, not one hot loop. Each query is
executed once to warm (JVM/codegen/file listing) and twice timed (min taken) —
matching how the reference's own TPC-H smoke is a steady-state measurement.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from duckdb_fastlanes_spark import get_spark, registry

HEADLINE = [
    "tpch_q1",
    "count_distinct",
    "scan_filter_range",
    "join_inner_broadcast",
    "join_full_outer",
    "agg_rollup",
    "window_row_number",
    "topk_orders",
    "dedup_minhash_lsh",
    "sim_bruteforce_topk",
    "text_quality_score",
    "stream_tumbling_counts",
]

N_TIMED = 2


def run_once(fn, spark, sf_dir: str) -> float:
    t0 = time.perf_counter()
    df = fn(spark, sf_dir)
    # force full execution without materializing results on the driver
    df.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0
    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")

    qs = registry.queries()
    times: dict[str, float] = {}
    for name in HEADLINE:
        fn = qs[name]
        run_once(fn, spark, sf_dir)  # warm-up
        times[name] = round(min(run_once(fn, spark, sf_dir) for _ in range(N_TIMED)), 3)

    total = round(sum(times.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": times,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
