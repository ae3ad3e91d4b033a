"""Incremental materialized-view maintenance: a streaming aggregation kept
up-to-date in a parquet table via ``foreachBatch`` upsert.

Beyond-reference (the reference has no streaming, SURVEY.md §2.C): this is the
streaming-to-batch bridge a 100 TB pipeline runs continuously — readers query
the materialized parquet table at interactive latency while the stream keeps
it fresh. Update-mode aggregation emits only the (window, key) rows whose
values changed each trigger, so the per-trigger merge cost is proportional to
the *changed* keys, not the view size.

On a production lakehouse the merge step is a Delta/Iceberg MERGE INTO;
with plain parquet the upsert is re-written as anti-join + union + atomic
swap. The swap uses a versioned directory + pointer file because overwriting
a parquet directory that is also the read source corrupts it mid-job.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: view merge keys for the event-counts view
VIEW_KEYS = ("window_start", "event_type")


def _current_path(view_root: str) -> str | None:
    ptr = os.path.join(view_root, "_CURRENT")
    if os.path.exists(ptr):
        with open(ptr) as fh:
            return os.path.join(view_root, fh.read().strip())
    return None


def read_matview(spark: SparkSession, view_root: str) -> DataFrame | None:
    """Read the current version of the materialized view (None before the
    first trigger commits)."""
    cur = _current_path(view_root)
    return spark.read.parquet(cur) if cur else None


def _merge_batch(spark: SparkSession, view_root: str, batch: DataFrame, batch_id: int) -> None:
    """Upsert changed aggregate rows into a new view version, then swap the
    pointer. Versioned-dir-plus-pointer gives readers snapshot isolation and
    avoids overwriting the directory the merge itself reads from."""
    old = read_matview(spark, view_root)
    if old is not None:
        keep = old.join(batch.select(*VIEW_KEYS), list(VIEW_KEYS), "left_anti")
        merged = keep.unionByName(batch)
    else:
        merged = batch
    new_dir = f"v{batch_id}"
    merged.write.mode("overwrite").parquet(os.path.join(view_root, new_dir))
    tmp = os.path.join(view_root, "_CURRENT.tmp")
    with open(tmp, "w") as fh:
        fh.write(new_dir)
    os.replace(tmp, os.path.join(view_root, "_CURRENT"))  # atomic pointer swap


def maintain_event_counts(
    spark: SparkSession,
    input_dir: str,
    schema,
    view_root: str,
    checkpoint: str,
    watermark: str = "2 hours",
):
    """Start the maintenance stream: watermarked 1-hour tumbling counts per
    event_type, update-mode output, foreachBatch upsert into ``view_root``.
    Returns the StreamingQuery (caller decides trigger/termination)."""
    os.makedirs(view_root, exist_ok=True)
    stream = spark.readStream.schema(schema).parquet(input_dir)
    agg = (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )
    return (
        agg.writeStream.outputMode("update")
        .foreachBatch(lambda b, i: _merge_batch(spark, view_root, b, i))
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
