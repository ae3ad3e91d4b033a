"""applyInPandasWithState sessionization: streaming result must equal the
batch window-function sessionization once the stream drains."""

from __future__ import annotations

from pyspark.sql import functions as F

from duckdb_fastlanes_spark.catalog import table
from duckdb_fastlanes_spark.streaming.stateful import (
    batch_sessionize_closed,
    stream_sessionize,
)
from tests.conftest import SF_DIR


def test_stateful_sessionization_matches_batch(spark, tmp_path):
    # Small deterministic slice: 50 users keeps state-store shards busy but
    # the test fast; stage as files so readStream replays it.
    ev = table(spark, SF_DIR, "events").filter(F.col("user_id") < 50)
    staged = str(tmp_path / "events_staged")
    ev.write.parquet(staged)
    schema = spark.read.parquet(staged).schema

    stream = spark.readStream.schema(schema).parquet(staged)
    q = (
        stream_sessionize(stream)
        .writeStream.format("memory")
        .queryName("sessions_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination(180)

    got = {
        (r.user_id, r.session_seq): (r.n_events, r.session_start, r.session_end)
        for r in spark.sql("SELECT * FROM sessions_out").collect()
    }
    expect = {
        (r.user_id, r.session_seq): (r.n_events, r.session_start, r.session_end)
        for r in batch_sessionize_closed(ev).collect()
    }

    # The final watermark advances only as far as the max event time, so the
    # last open session per user never times out in a drained availableNow
    # run — it is the only admissible difference.
    assert set(got) <= set(expect)
    for k, v in got.items():
        assert v == expect[k], k
    missing = set(expect) - set(got)
    # at most one (the trailing) session per user may still be open
    per_user: dict[int, int] = {}
    for u, _seq in missing:
        per_user[u] = per_user.get(u, 0) + 1
    assert all(n == 1 for n in per_user.values())
    # and each missing one must be that user's LAST session
    last_seq = {u: max(s for (uu, s) in expect if uu == u) for u in per_user}
    assert all(seq == last_seq[u] for (u, seq) in missing)
