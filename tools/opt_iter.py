"""Optimization-round iteration helper (r11).

For each named query: time it constructed (min-of-N, drain-persists between
runs, same discipline as bench.py) and optionally dump the formatted physical
plan to plans/r11/<query>_<tag>.txt — the judge-checkable before/after
artifact for OPTIMIZATION_r11.md.

Usage:
    python tools/opt_iter.py [--plan=before|after] [--n=3] [--sf=DIR] q1 q2 ...
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from duckdb_fastlanes_spark import get_spark, registry
from duckdb_fastlanes_spark.bench_support import drain_persists


def main() -> int:
    args = sys.argv[1:]
    tag = next((a.split("=", 1)[1] for a in args if a.startswith("--plan=")), None)
    n = int(next((a.split("=", 1)[1] for a in args if a.startswith("--n=")), "3"))
    sf_dir = next(
        (a.split("=", 1)[1] for a in args if a.startswith("--sf=")),
        os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
    )
    names = [a for a in args if not a.startswith("--")]

    spark = get_spark("opt-iter")
    spark.sparkContext.setLogLevel("ERROR")
    from duckdb_fastlanes_spark.catalog import optimize_layout, warm_cache
    from duckdb_fastlanes_spark.session import tune_for_input

    tune_for_input(spark, sf_dir)
    optimize_layout(spark, sf_dir)
    warm_cache(spark, sf_dir)
    qs = registry.queries()

    out = {}
    for name in names:
        fn = qs[name]
        spark.sparkContext.setJobDescription(f"opt_iter:{name}")
        if tag:
            drain_persists()
            df = fn(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            path = f"/root/repo/plans/r11/{name}_{tag}.txt"
            with open(path, "w") as f:
                f.write(plan)
        drain_persists()
        fn(spark, sf_dir).toArrow()  # warm-up
        runs = []
        for _ in range(n):
            drain_persists()
            t0 = time.perf_counter()
            fn(spark, sf_dir).toArrow()
            runs.append(round(time.perf_counter() - t0, 3))
        drain_persists()
        out[name] = {"min": min(runs), "runs": runs}
        print(json.dumps({name: out[name]}), flush=True)
        spark.sparkContext.setJobDescription(None)
    print(json.dumps({"summary": {k: v["min"] for k, v in out.items()}}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
