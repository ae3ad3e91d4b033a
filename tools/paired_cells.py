"""Weather-normalized measurement for the at-the-bar scale cells.

The shared-VM problem (SCALE.md "Measurement noise"): identical cells on
unchanged code swing 2.5-4× day-to-day on BOTH engines, so a ratio computed
from runs taken at different times measures the weather, not the plan. The
r8 verdict's protocol fix (next-round item 3): run the two engines as
ADJACENT PAIRS — spark then duck (alternating which goes first per pair)
inside the same minutes, compute the ratio PER PAIR, and grade the
median-of-paired-ratios with the spread recorded. Host drift that inflates
one run inflates its pair partner too, so the per-pair ratio cancels the
weather that min-of-N across sessions cannot.

Each engine run is a fresh process (tools/cell_runner.py, 1 measured run
after warm-up) so no JVM/cache residue leaks between pair halves.

Usage:
    python tools/paired_cells.py <query> <sf_dir> <n_pairs> [label]

Prints one JSON line per pair and a summary; merges raw runs + paired
ratios into SCALE_RUNS.json under "paired-r9/<label>".
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
RUNS_PATH = os.path.join(REPO, "SCALE_RUNS.json")


def _cell(query: str, engine: str, sf_dir: str) -> float:
    env = dict(os.environ)
    env.setdefault("SPARK_GRAFT_DRIVER_MEM", "24g")
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "cell_runner.py"),
         query, engine, sf_dir, "1"],
        capture_output=True, text=True, env=env,
    )
    if out.returncode != 0:
        sys.stderr.write(
            f"cell FAILED ({query}/{engine}, rc={out.returncode}); "
            f"stderr tail:\n{out.stderr[-2000:]}\n"
        )
        raise RuntimeError(f"cell failed: {query}/{engine}")
    line = [ln for ln in out.stdout.splitlines() if ln.startswith("{")][-1]
    return json.loads(line)["runs"][0]


def main() -> int:
    query, sf_dir = sys.argv[1], sys.argv[2]
    n_pairs = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    label = sys.argv[4] if len(sys.argv) > 4 else f"{query}@{os.path.basename(sf_dir)}"

    def _merge(pairs: list[dict]) -> dict:
        """Write the pairs-so-far into SCALE_RUNS.json after EVERY pair —
        a later cell crash must not discard completed measurements (the
        r11 triangle/bfs lesson)."""
        ratios = [p["ratio"] for p in pairs]
        summary = {
            "query": query, "sf_dir": sf_dir, "n_pairs": len(pairs),
            "paired_ratios": ratios,
            "median_ratio": round(statistics.median(ratios), 3),
            "min_ratio": min(ratios), "max_ratio": max(ratios),
            "spread": round(max(ratios) / min(ratios), 3),
        }
        runs = {}
        if os.path.exists(RUNS_PATH):
            with open(RUNS_PATH) as fh:
                runs = json.load(fh)
        runs.setdefault("paired-r11", {})[label] = {"pairs": pairs, **summary}
        with open(RUNS_PATH, "w") as fh:
            json.dump(runs, fh, indent=1)
        return summary

    pairs: list[dict] = []
    summary: dict = {}
    for i in range(n_pairs):
        order = ("spark", "duck") if i % 2 == 0 else ("duck", "spark")
        t: dict[str, float] = {}
        for engine in order:
            t[engine] = _cell(query, engine, sf_dir)
        ratio = round(t["spark"] / t["duck"], 3)
        rec = {"pair": i, "order": "/".join(order),
               "spark": t["spark"], "duck": t["duck"], "ratio": ratio}
        pairs.append(rec)
        print(json.dumps(rec), flush=True)
        summary = _merge(pairs)

    print(json.dumps({"summary": summary}), flush=True)
    print(f"merged into {RUNS_PATH} under paired-r11/{label}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
