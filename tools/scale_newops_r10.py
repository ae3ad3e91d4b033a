"""Scale cells for the r10 operators (funnel, retention, nDCG, DQ gate +
the two r10-upgraded multimodal codecs): wall-time growth at
1x/10x/100x/1000x on BOTH engines (Spark query vs DuckDB oracle over the
same parquet), min-of-2 interleaved, every raw run recorded.

Usage: python tools/scale_newops_r10.py  (writes SCALE_NEWOPS_r10.json)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from duckdb_fastlanes_spark import get_spark, registry

CELLS = [
    ("1x", "/root/testdata/sf0.01"),
    ("10x", "/root/testdata/sf0.1"),
    ("100x", "/tmp/dfs_scaled/sf1"),
    ("1000x", "/tmp/dfs_scaled/sf10"),
]

QUERIES = [
    "events_funnel_conversion",
    "events_retention_matrix",
    "sim_ndcg_eval",
    "dq_expectations_gate",
    "multimodal_features",
    "multimodal_audio_features",
    "scan_zorder_prune",
    "sketch_hll_by_group",
    "events_time_to_convert",
]
PAIRS_QUADRATIC: set = set()

#: static annotations re-emitted into the artifact so a rerun reproduces the
#: committed JSON byte-for-byte (the note records which implementation
#: variant produced the numbers)
NOTES = {
    "sim_ndcg_eval": "bounded audit slice (8 queries x 512 pool) — corpus-size-independent by design above the pool floor",
}

TABLES = (
    "region nation customer supplier part orders lineitem "
    "events documents embeddings"
).split()


def main() -> None:
    spark = get_spark("scale-newops-r10")
    spark.sparkContext.setLogLevel("ERROR")
    qs, osql = registry.queries(), registry.oracles()
    out: dict = {"protocol": "min-of-2 interleaved, warm discarded", "cells": {}}
    for label, sf_dir in CELLS:
        if not os.path.isdir(sf_dir):
            continue
        con = duckdb.connect()
        for t in TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{sf_dir}/{t}.parquet')"
            )
        cell: dict = {}
        for name in QUERIES:
            if label == "100x" and name in PAIRS_QUADRATIC:
                cell[name] = {"skipped": "quadratic-by-design audit slice"}
                continue
            # warm both once
            qs[name](spark, sf_dir).collect()
            con.execute(osql[name]).fetchall()
            s_runs, d_runs = [], []
            for _ in range(2):
                t0 = time.perf_counter()
                qs[name](spark, sf_dir).collect()
                s_runs.append(round(time.perf_counter() - t0, 3))
                t0 = time.perf_counter()
                con.execute(osql[name]).fetchall()
                d_runs.append(round(time.perf_counter() - t0, 3))
            cell[name] = {
                "spark_min": min(s_runs),
                "duck_min": min(d_runs),
                "spark_runs": s_runs,
                "duck_runs": d_runs,
                "ratio": round(min(s_runs) / max(min(d_runs), 1e-9), 2),
            }
            if name in NOTES:
                cell[name]["note"] = NOTES[name]
            print(label, name, cell[name]["spark_min"], cell[name]["duck_min"],
                  cell[name]["ratio"], flush=True)
        out["cells"][label] = cell
        con.close()
    with open("SCALE_NEWOPS_r10.json", "w") as f:
        json.dump(out, f, indent=1)
    print("wrote SCALE_NEWOPS_r10.json")


if __name__ == "__main__":
    main()
