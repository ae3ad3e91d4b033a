"""Decompose the multimodal codec operators' Spark wall into stage shares.

The r10 verdict (next-round item 1): the DuckDB oracle for
multimodal_features / multimodal_audio_features replays the generative
model in closed form and never touches a byte, while the Spark side writes
a real BMP/WAV payload and parses it back — so the paired ratio compares
codec work against no codec work. This tool quantifies that asymmetry:

    passthrough  — documents scan + an empty mapInPandas stage (the Arrow /
                   Python-worker floor any pandas pipeline pays)
    write        — + the codec WRITER (payload synthesized, length emitted)
    full         — + the codec PARSER + engine-side quantization
                   (the registered operator, orderBy included)

All variants run in ONE warm Spark session, adjacent, min-of-2 — shares of
a single process's wall, not a cross-engine ratio (the cross-engine pairs
live in SCALE_RUNS.json "paired-r11", measured by tools/paired_cells.py).
The derived rows:

    write_share  = write - passthrough   (codec-write work)
    parse_share  = full - write          (codec-parse + quantize work)
    oracle_has   = neither — its closed form touches no byte

Usage: python tools/multimodal_decomp.py [sf_dir] [out_key]
Merges into SCALE_RUNS.json under "decomp-r11/<op>@<basename>".
"""

from __future__ import annotations

import hashlib
import json
import os
import sys
import time
from collections.abc import Iterator

import pandas as pd

sys.path.insert(0, "/root/repo")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
RUNS_PATH = os.path.join(REPO, "SCALE_RUNS.json")


def _variants_bmp():
    from duckdb_fastlanes_spark.pipeline.multimodal import write_bmp

    def passthrough(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame({"doc_id": pdf["doc_id"]})

    def write_only(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = [
                len(write_bmp(hashlib.md5(t.encode("utf-8")).hexdigest()))
                for t in pdf["text"]
            ]
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "nbytes": n})

    return passthrough, "doc_id long", write_only, "doc_id long, nbytes long"


def _variants_wav():
    from duckdb_fastlanes_spark.pipeline.multimodal import write_wav

    def passthrough(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame({"doc_id": pdf["doc_id"]})

    def write_only(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = [
                len(write_wav(hashlib.md5(t.encode("utf-8")).hexdigest()))
                for t in pdf["text"]
            ]
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "nbytes": n})

    return passthrough, "doc_id long", write_only, "doc_id long, nbytes long"


def _time(df_builder, n_runs: int = 2) -> float:
    runs = []
    for _ in range(n_runs):
        t0 = time.perf_counter()
        df_builder().toArrow()
        runs.append(round(time.perf_counter() - t0, 3))
    return min(runs)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/dfs_scaled/sf10"
    tag = sys.argv[2] if len(sys.argv) > 2 else os.path.basename(sf_dir)

    from duckdb_fastlanes_spark import get_spark, registry
    from duckdb_fastlanes_spark.catalog import optimize_layout, table, warm_cache
    from duckdb_fastlanes_spark.session import tune_for_input

    spark = get_spark("multimodal-decomp")
    spark.sparkContext.setLogLevel("ERROR")
    tune_for_input(spark, sf_dir)
    optimize_layout(spark, sf_dir)  # same environment as tools/cell_runner.py
    warm_cache(spark, sf_dir)

    out = {}
    for op, variants in (
        ("multimodal_features", _variants_bmp),
        ("multimodal_audio_features", _variants_wav),
    ):
        passthrough, pt_schema, write_only, w_schema = variants()
        docs = table(spark, sf_dir, "documents").select("doc_id", "text")
        full_fn = registry.queries()[op]

        # warm-up: one run of each shape
        docs.mapInPandas(passthrough, pt_schema).toArrow()
        docs.mapInPandas(write_only, w_schema).toArrow()
        full_fn(spark, sf_dir).toArrow()

        t_pass = _time(lambda: docs.mapInPandas(passthrough, pt_schema))
        t_write = _time(lambda: docs.mapInPandas(write_only, w_schema))
        t_full = _time(lambda: full_fn(spark, sf_dir))
        rec = {
            "sf_dir": sf_dir,
            "passthrough_s": t_pass,
            "write_s": t_write,
            "full_s": t_full,
            "write_share_s": round(t_write - t_pass, 3),
            "parse_share_s": round(t_full - t_write, 3),
            "floor_share_s": t_pass,
            "note": (
                "shares of one warm session's wall (min-of-2, adjacent); the "
                "DuckDB oracle's closed-form replay performs neither the write "
                "nor the parse share — cross-engine pairs are in paired-r11"
            ),
        }
        out[f"{op}@{tag}"] = rec
        print(json.dumps({op: rec}), flush=True)

    runs = {}
    if os.path.exists(RUNS_PATH):
        with open(RUNS_PATH) as fh:
            runs = json.load(fh)
    runs.setdefault("decomp-r11", {}).update(out)
    with open(RUNS_PATH, "w") as fh:
        json.dump(runs, fh, indent=1)
    print(f"merged into {RUNS_PATH} under decomp-r11/")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
