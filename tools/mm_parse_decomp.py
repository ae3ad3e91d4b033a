"""Decompose multimodal_features' 'parse share' (r12).

decomp-r11/r12 attribute ~7.4 s of the 9.3 s 1000× wall to 'parse', but a
cProfile of one full task puts the entire scalar write+decode at ~1.7 s CPU
— so the share is NOT codec CPU. This isolates the steps the 'full'
variant adds over 'write':

  write      — write_bmp per doc, emit (doc_id, nbytes)          [baseline]
  decode     — + decode_bmp per doc, emit all 6 raw columns, no
               quantize, no orderBy
  decode_arr — same, but the output DataFrame is built from typed arrays
               instead of a list of tuples
  quant      — decode + the engine-side round() quantize column
  full       — the registered operator (quantize + ORDER BY doc_id)

min-of-2 per variant, one warm session, noop sink.
Usage: python tools/mm_parse_decomp.py [sf_dir]
"""

from __future__ import annotations

import hashlib
import json
import sys
import time
from collections.abc import Iterator

import pandas as pd

sys.path.insert(0, "/root/repo")


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/dfs_scaled/sf10"

    from duckdb_fastlanes_spark import get_spark, registry
    from duckdb_fastlanes_spark.catalog import optimize_layout, table, warm_cache
    from duckdb_fastlanes_spark.pipeline.multimodal import (
        _BMP_LUMA_MICRO,
        _BMP_RAW_SCHEMA,
        decode_bmp,
        write_bmp,
    )
    from duckdb_fastlanes_spark.session import tune_for_input
    from pyspark.sql import functions as F

    spark = get_spark("mm-parse-decomp")
    spark.sparkContext.setLogLevel("ERROR")
    tune_for_input(spark, sf_dir)
    optimize_layout(spark, sf_dir)
    warm_cache(spark, sf_dir)
    d = table(spark, sf_dir, "documents").select("doc_id", "text")

    def run_write(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                payload = write_bmp(hashlib.md5(text.encode("utf-8")).hexdigest())
                rows.append((int(doc_id), len(payload)))
            yield pd.DataFrame(rows, columns=["doc_id", "nbytes"])

    def run_decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                payload = write_bmp(hashlib.md5(text.encode("utf-8")).hexdigest())
                fmt, w, ht, nbytes, sum_luma = decode_bmp(payload)
                rows.append((int(doc_id), fmt, w, ht, nbytes, sum_luma))
            yield pd.DataFrame(rows, columns=[f.name for f in _BMP_RAW_SCHEMA.fields])

    def run_decode_arr(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            n = len(pdf)
            ids = pdf["doc_id"].to_numpy()
            ws = np.zeros(n, dtype=np.int32)
            hs = np.zeros(n, dtype=np.int32)
            nb = np.zeros(n, dtype=np.int64)
            sl = np.zeros(n, dtype=np.int64)
            for k, text in enumerate(pdf["text"]):
                payload = write_bmp(hashlib.md5(text.encode("utf-8")).hexdigest())
                _, ws[k], hs[k], nb[k], sl[k] = decode_bmp(payload)
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "media_format": "bmp",
                    "width": ws,
                    "height": hs,
                    "payload_bytes": nb,
                    "sum_luma": sl,
                }
            )

    variants = {
        "write": lambda: d.mapInPandas(run_write, "doc_id long, nbytes long"),
        "decode": lambda: d.mapInPandas(run_decode, _BMP_RAW_SCHEMA),
        "decode_arr": lambda: d.mapInPandas(run_decode_arr, _BMP_RAW_SCHEMA),
        "quant": lambda: d.mapInPandas(run_decode, _BMP_RAW_SCHEMA)
        .withColumn("mean_luma_micro", F.expr(_BMP_LUMA_MICRO))
        .drop("sum_luma"),
        "full": lambda: registry.queries()["multimodal_features"](spark, sf_dir),
    }
    out = {}
    for name, build in variants.items():
        runs = []
        for _ in range(2):
            df = build()
            t0 = time.monotonic()
            df.write.format("noop").mode("overwrite").save()
            runs.append(round(time.monotonic() - t0, 3))
        out[name] = min(runs)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
