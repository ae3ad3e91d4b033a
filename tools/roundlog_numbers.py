"""Render the round's benchmark numbers FROM the committed artifacts.

The last two rounds each drifted between ROUNDLOG prose and the committed
BENCH artifacts (mid-round runs quoted instead of the artifact of record).
This tool makes the ROUNDLOG numbers *generated, not typed*: it reads the
BENCH_r{N}.json / BENCH_ALL_r{N}.json (and optionally SCALE.md) actually in
the repo and prints the markdown block the ROUNDLOG section should contain
verbatim. Any number in the ROUNDLOG that this tool cannot reproduce from a
committed artifact does not belong there.

Usage: python tools/roundlog_numbers.py <round>   (e.g. 6)
"""

from __future__ import annotations

import json
import os
import sys


def main() -> None:
    rnd = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    lines: list[str] = []

    bench_path = os.path.join(root, f"BENCH_r{rnd:02d}.json")
    if os.path.exists(bench_path):
        d = json.load(open(bench_path))
        lines.append(f"Headline (BENCH_r{rnd:02d}.json, sf{d.get('sf')}, protocol {d.get('protocol')}):")
        lines.append(
            f"- prepared {d.get('value')} s / constructed {d.get('constructed_total')} s"
            f" vs parquet-view baseline {d.get('baseline_total')} s ->"
            f" **{d.get('ratio_vs_baseline_prepared')}x prepared /"
            f" {d.get('ratio_vs_baseline_constructed')}x constructed**"
        )
        if "ratio_vs_baseline_native_prepared" in d:
            lines.append(
                f"- native-table denominator {d.get('baseline_native_total')} s ->"
                f" {d.get('ratio_vs_baseline_native_prepared')}x prepared /"
                f" {d.get('ratio_vs_baseline_native_constructed')}x constructed"
            )
        if "ratio_vs_baseline_concurrent" in d:
            lines.append(
                f"- concurrent {d.get('concurrent_wall')} s ->"
                f" {d.get('ratio_vs_baseline_concurrent')}x"
            )
        if "spark_floor" in d:
            lines.append(f"- spark job floor {d.get('spark_floor')} s")
        # r7+: bulk maps (dispersion, per-query baselines) live in the side
        # artifact so the driver-captured final line stays under its 2 KB tail
        side_path = os.path.join(root, "BENCH_SIDE.json")
        side = json.load(open(side_path)) if os.path.exists(side_path) else {}
        disp = d.get("queries_dispersion") or side.get("queries_dispersion") or {}
        wide = [
            (k, v)
            for k, v in disp.items()
            if v.get("prepared_median", 0) > 1.5 * max(v.get("prepared_min", 1e9), 1e-9)
        ]
        if wide:
            lines.append(
                "- dispersion flags (median > 1.5x min): "
                + ", ".join(f"{k} ({v['prepared_min']}/{v['prepared_median']})" for k, v in wide)
            )
    else:
        lines.append(f"(no BENCH_r{rnd:02d}.json committed yet)")

    all_path = os.path.join(root, f"BENCH_ALL_r{rnd}.json")
    if os.path.exists(all_path):
        d = json.load(open(all_path))
        n = len(d.get("queries", {}))
        lines.append("")
        lines.append(f"Full registry (BENCH_ALL_r{rnd}.json, protocol {d.get('protocol')}):")
        lines.append(
            f"- {n} queries sequential-constructed {d.get('value')} s vs DuckDB"
            f" {d.get('baseline_total')} s -> **{d.get('ratio_vs_baseline')}x**"
        )
        if "concurrent_wall" in d:
            lines.append(
                f"- concurrent (FAIR pool) {d.get('concurrent_wall')} s ->"
                f" **{d.get('ratio_vs_baseline_concurrent')}x**"
            )
    else:
        lines.append(f"(no BENCH_ALL_r{rnd}.json committed yet)")

    print("\n".join(lines))


if __name__ == "__main__":
    main()
