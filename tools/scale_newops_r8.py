"""Scale cells for the r8-continuation operators: wall-time growth at
1x/10x/100x on BOTH engines (Spark query vs DuckDB oracle over the same
parquet), min-of-2 interleaved, every raw run recorded.

The two all-pairs similarity audits run 1x/10x only: their pair count is
(slice_rate * N)^2-shaped BY DESIGN (a fixed 5% audit rate), so both
engines grow ~quadratically and the RATIO is the meaningful signal; the
deployment knob at larger corpora is a fixed absolute audit budget or the
IVF-bucketed siblings (see the operator docstrings).

Usage: python tools/scale_newops_r8.py  (writes SCALE_NEWOPS_r8.json)
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
    ("100x", os.environ.get("SPARK_GRAFT_SCALED_DIR", "/tmp/dfs_scaled/sf1")),
]

QUERIES = [
    "events_sessionization",
    "agg_weighted_median",
    "text_bpe_merge_rounds",
    "vocab_coverage_curve",
    "events_top_paths",
    "window_moving_median",
    "text_char_class_profile",
    "text_readability",
    "subquery_quantified",
    "sim_label_margin",
    "sim_auc_same_label",
]
PAIRS_QUADRATIC = {"sim_label_margin", "sim_auc_same_label"}

#: static annotations re-emitted into the artifact so a rerun reproduces the
#: committed JSON byte-for-byte (the note records which implementation
#: variant produced the numbers)
NOTES = {
    "agg_weighted_median": "histogram-collapse Spark body (post-A/B fix)",
}

TABLES = (
    "region nation customer supplier part orders lineitem "
    "events documents embeddings"
).split()


def main() -> None:
    spark = get_spark("scale-newops")
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
    with open("SCALE_NEWOPS_r8.json", "w") as f:
        json.dump(out, f, indent=1)
    print("wrote SCALE_NEWOPS_r8.json")


if __name__ == "__main__":
    main()
