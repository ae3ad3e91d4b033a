"""Materialized-view maintenance: after draining the stream (in multiple
triggers), the view must equal the batch aggregation; later batches must
upsert, not append."""

from __future__ import annotations

from pyspark.sql import functions as F

from duckdb_fastlanes_spark.catalog import table
from duckdb_fastlanes_spark.streaming.events import windowed_event_counts
from duckdb_fastlanes_spark.streaming.matview import (
    maintain_event_counts,
    read_matview,
)
from tests.conftest import SF_DIR


def test_matview_converges_to_batch_answer(spark, tmp_path):
    ev = table(spark, SF_DIR, "events")
    staged = str(tmp_path / "staged")
    # many small files → availableNow with maxFilesPerTrigger-like batching
    ev.repartition(8).write.parquet(staged)
    schema = spark.read.parquet(staged).schema

    view_root = str(tmp_path / "view")
    q = maintain_event_counts(
        spark, staged, schema, view_root, str(tmp_path / "ckpt")
    )
    q.awaitTermination(180)

    got = {
        (r.window_start, r.event_type): (r.n_events, r.total_value)
        for r in read_matview(spark, view_root).collect()
    }
    expect = {
        (r.window_start, r.event_type): (r.n_events, r.total_value)
        for r in windowed_event_counts(ev).collect()
    }
    assert got == expect

    # upsert check: re-running over the same input must not duplicate keys
    q2 = maintain_event_counts(
        spark, staged, schema, view_root, str(tmp_path / "ckpt")  # same checkpoint: no new data
    )
    q2.awaitTermination(60)
    view = read_matview(spark, view_root)
    assert view.groupBy("window_start", "event_type").count().filter(F.col("count") > 1).count() == 0
    assert view.count() == len(expect)
