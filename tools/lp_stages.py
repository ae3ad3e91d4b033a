"""Per-stage metric dump for one full graph_link_prediction execution.

Runs the registered query once with the noop sink, then reads the Spark
status REST API for every completed stage: wall, executor run time, GC,
shuffle bytes. Prints one JSON line per stage (sorted by submission).

Usage: python tools/lp_stages.py [query] [sf_dir]
"""

from __future__ import annotations

import json
import sys
import time
import urllib.request

sys.path.insert(0, "/root/repo")

from duckdb_fastlanes_spark import get_spark, registry


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    qname = args[0] if args else "graph_link_prediction"
    sf_dir = args[1] if len(args) > 1 else "/root/testdata/sf0.1"

    spark = get_spark("lp-stages", extra_conf={"spark.ui.enabled": "true"})
    spark.sparkContext.setLogLevel("ERROR")
    from duckdb_fastlanes_spark.catalog import optimize_layout, warm_cache
    from duckdb_fastlanes_spark.session import tune_for_input

    tune_for_input(spark, sf_dir)
    optimize_layout(spark, sf_dir)
    warm_cache(spark, sf_dir)

    fn = registry.queries()[qname]
    t0 = time.monotonic()
    df = fn(spark, sf_dir)
    df.write.format("noop").mode("overwrite").save()
    wall = time.monotonic() - t0

    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    url = f"{ui}/api/v1/applications/{app_id}/stages?status=complete"
    data = json.loads(urllib.request.urlopen(url).read())
    data.sort(key=lambda s: s.get("submissionTime") or "")
    total_run = 0
    for s in data:
        row = {
            "stage": s["stageId"],
            "name": s["name"].split("\n")[0][:60],
            "tasks": s["numCompleteTasks"],
            "runTime_s": round(s["executorRunTime"] / 1000, 2),
            "cpuTime_s": round(s.get("executorCpuTime", 0) / 1e9, 2),
            "gc_s": round(s.get("jvmGcTime", 0) / 1000, 2),
            "shufW_mb": round(s.get("shuffleWriteBytes", 0) / 1e6, 1),
            "shufR_mb": round(s.get("shuffleReadBytes", 0) / 1e6, 1),
            "in_mb": round(s.get("inputBytes", 0) / 1e6, 1),
            "desc": (s.get("description") or "")[:40],
        }
        total_run += s["executorRunTime"]
        print(json.dumps(row))
    print(
        json.dumps(
            {
                "wall_s": round(wall, 2),
                "sum_executorRunTime_s": round(total_run / 1000, 2),
                "n_stages": len(data),
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
