"""tpch_q9 scan-floor decomposition at the 1000x cell (r10 verdict item 3).

Nine execution variants lost to the bucketed-merge base in r10; the builder's
bound argument — the 5-column lineitem scan ALONE costs >= 0.8x of DuckDB's
whole query, so q9's residual ratio is an engine scan floor, not plan slack —
lived in prose. This tool records it as a re-runnable artifact:

cells (each in its OWN fresh process, cell_runner discipline: tune + staged
layout + warm_cache, one warm-up, then min over 2 fresh plan constructions):

    spark_q9      — the registered tpch_q9
    spark_li_scan — scan probe: the exact 5 lineitem columns q9 reads
                    (l_partkey, l_suppkey, l_orderkey, l_extendedprice,
                    l_discount), one global sum per column — minimal plan
                    whose wall IS the scan
    spark_o_scan  — same probe for q9's orders columns (o_orderkey,
                    o_orderdate)
    duck_q9       — the DuckDB oracle (the paired denominator)
    duck_li_scan / duck_o_scan — the same probes on DuckDB

derived per round (adjacent cells, so host weather cancels like paired_cells):

    scan_floor_s   = spark_li_scan + spark_o_scan
    post_scan_s    = spark_q9 - scan_floor_s      (joins + aggregate slack)
    floor_vs_duck  = scan_floor_s / duck_q9       (>= ~0.8 ==> engine floor)

Usage:
    python tools/q9_decomp.py run [sf_dir] [n_rounds]   # orchestrate + merge
    python tools/q9_decomp.py cell <name> <sf_dir>      # one fresh-process cell
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time

sys.path.insert(0, "/root/repo")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
RUNS_PATH = os.path.join(REPO, "SCALE_RUNS.json")

LI_COLS = ["l_partkey", "l_suppkey", "l_orderkey", "l_extendedprice", "l_discount"]
O_COLS = ["o_orderkey", "o_orderdate"]


def _duck_con(sf_dir: str):
    import duckdb

    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem "
        "events documents embeddings".split()
    ):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def cell(name: str, sf_dir: str) -> None:
    runs: list[float] = []
    if name.startswith("spark_"):
        from duckdb_fastlanes_spark import get_spark, registry
        from duckdb_fastlanes_spark.catalog import optimize_layout, table, warm_cache
        from duckdb_fastlanes_spark.session import tune_for_input
        from pyspark.sql import functions as F

        spark = get_spark("q9-decomp")
        spark.sparkContext.setLogLevel("ERROR")
        tune_for_input(spark, sf_dir)
        optimize_layout(spark, sf_dir)
        warm_cache(spark, sf_dir)

        def build():
            if name == "spark_q9":
                return registry.queries()["tpch_q9"](spark, sf_dir)
            tbl, cols = (
                ("lineitem", LI_COLS) if name == "spark_li_scan" else ("orders", O_COLS)
            )
            df = table(spark, sf_dir, tbl).select(*cols)
            # one aggregate per column so every probed column is READ;
            # max() for the temporal column (no numeric cast), sum otherwise
            return df.agg(
                F.count(F.lit(1)).alias("n"),
                *[
                    (
                        F.max(c) if c == "o_orderdate" else F.sum(F.col(c).cast("double"))
                    ).alias(f"s_{c}")
                    for c in cols
                ],
            )

        build().toArrow()  # warm-up
        for _ in range(2):
            t0 = time.perf_counter()
            build().toArrow()  # fresh plan construction each run (q9_ab2 lesson)
            runs.append(round(time.perf_counter() - t0, 3))
    else:
        from duckdb_fastlanes_spark import registry

        con = _duck_con(sf_dir)
        if name == "duck_q9":
            sql = registry.oracles()["tpch_q9"]
        else:
            tbl, cols = (
                ("lineitem", LI_COLS) if name == "duck_li_scan" else ("orders", O_COLS)
            )
            sums = ", ".join(
                f"max({c}) AS s_{c}"
                if c == "o_orderdate"
                else f"sum(CAST({c} AS DOUBLE)) AS s_{c}"
                for c in cols
            )
            sql = f"SELECT count(*) AS n, {sums} FROM {tbl}"
        con.execute(sql).fetchall()  # warm-up
        for _ in range(2):
            t0 = time.perf_counter()
            con.execute(sql).fetchall()
            runs.append(round(time.perf_counter() - t0, 3))
    print(json.dumps({"cell": name, "sf_dir": sf_dir, "runs": runs}))


def _run_cell(name: str, sf_dir: str) -> float:
    env = dict(os.environ)
    env.setdefault("SPARK_GRAFT_DRIVER_MEM", "24g")
    out = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "cell", name, sf_dir],
        capture_output=True,
        text=True,
        env=env,
        check=True,
    )
    line = [ln for ln in out.stdout.splitlines() if ln.startswith("{")][-1]
    return min(json.loads(line)["runs"])


def run(sf_dir: str, n_rounds: int) -> int:
    cells = [
        "spark_q9",
        "spark_li_scan",
        "spark_o_scan",
        "duck_q9",
        "duck_li_scan",
        "duck_o_scan",
    ]
    rounds = []
    for r in range(n_rounds):
        order = cells if r % 2 == 0 else list(reversed(cells))
        t = {}
        for c in order:
            t[c] = _run_cell(c, sf_dir)
        scan_floor = round(t["spark_li_scan"] + t["spark_o_scan"], 3)
        rec = {
            "round": r,
            **t,
            "scan_floor_s": scan_floor,
            "post_scan_s": round(t["spark_q9"] - scan_floor, 3),
            "floor_vs_duck": round(scan_floor / t["duck_q9"], 3),
            "q9_ratio": round(t["spark_q9"] / t["duck_q9"], 3),
        }
        rounds.append(rec)
        print(json.dumps(rec), flush=True)

    med = lambda k: round(statistics.median(r[k] for r in rounds), 3)  # noqa: E731
    summary = {
        "sf_dir": sf_dir,
        "n_rounds": n_rounds,
        "median_q9_ratio": med("q9_ratio"),
        "median_floor_vs_duck": med("floor_vs_duck"),
        "median_scan_floor_s": med("scan_floor_s"),
        "median_post_scan_s": med("post_scan_s"),
        "verdict": (
            "engine-scan-floor"
            if med("floor_vs_duck") >= 0.8
            else "post-scan slack remains"
        ),
    }
    print(json.dumps({"summary": summary}), flush=True)

    runs = {}
    if os.path.exists(RUNS_PATH):
        with open(RUNS_PATH) as fh:
            runs = json.load(fh)
    runs.setdefault("decomp-r11", {})["tpch_q9@1000x"] = {
        "rounds": rounds,
        **summary,
    }
    with open(RUNS_PATH, "w") as fh:
        json.dump(runs, fh, indent=1)
    print(f"merged into {RUNS_PATH} under decomp-r11/tpch_q9@1000x")
    return 0


if __name__ == "__main__":
    if sys.argv[1] == "cell":
        cell(sys.argv[2], sys.argv[3])
    else:
        sf = sys.argv[2] if len(sys.argv) > 2 else "/tmp/dfs_scaled/sf10"
        n = int(sys.argv[3]) if len(sys.argv) > 3 else 3
        raise SystemExit(run(sf, n))
