"""Custom stateful streaming operator: session windows with
``applyInPandasWithState``.

The reference has no streaming surface at all (SURVEY.md §2.C Streaming row —
nothing in the extension, nothing in DuckDB v1.3.2 core); this is the
Spark-native extension path for operators whose state outlives a microbatch.
``stream_sessionization`` (streaming/events.py) computes the same sessions in
batch via window functions; this module is the true-streaming twin where
session state (open session start/end/count per user) lives in the state
store across triggers and closes on event-time timeout.

Scale shape: state is partitioned by user_id (the group key), so state-store
shards scale with executors; per-trigger work is O(batch + touched groups);
timeouts evict state so it is bounded by *active* users, not all-time users.
"""

from __future__ import annotations

from collections.abc import Iterable
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: inactivity gap that closes a session (matches stream_sessionization's 1800 s)
SESSION_GAP_S = 1800

STATE_SCHEMA = T.StructType(
    [
        T.StructField("start_us", T.LongType()),
        T.StructField("end_us", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("session_seq", T.LongType()),
    ]
)

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_seq", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("session_start", T.TimestampType()),
        T.StructField("session_end", T.TimestampType()),
    ]
)


def _sessionize_group(
    key: tuple[Any, ...], pdfs: Iterable[pd.DataFrame], state: Any
) -> Iterable[pd.DataFrame]:
    """Per-user session accumulator. Emits every CLOSED session; the open
    session stays in the state store with an event-time timeout of
    SESSION_GAP_S past the newest event."""
    (user_id,) = key
    closed: list[tuple[int, int, int, int]] = []  # (seq, n, start_us, end_us)

    if state.hasTimedOut:
        if state.exists:
            start_us, end_us, n_events, seq = state.get
            closed.append((seq, n_events, start_us, end_us))
            state.remove()
    else:
        ts_us: list[int] = []
        for pdf in pdfs:
            ts_us.extend(int(t.value // 1_000) for t in pdf["ts"])
        ts_us.sort()

        if state.exists:
            start_us, end_us, n_events, seq = state.get
        else:
            start_us = end_us = -1
            n_events = 0
            seq = 0

        for t in ts_us:
            if start_us < 0:  # no open session
                seq += 1
                start_us = end_us = t
                n_events = 1
            elif t - end_us > SESSION_GAP_S * 1_000_000:  # gap exceeded → close
                closed.append((seq, n_events, start_us, end_us))
                seq += 1
                start_us = end_us = t
                n_events = 1
            else:
                end_us = max(end_us, t)
                n_events += 1

        if start_us >= 0:
            state.update((start_us, end_us, n_events, seq))
            # timeout API takes milliseconds; round up so it never fires early
            state.setTimeoutTimestamp((end_us + SESSION_GAP_S * 1_000_000 + 999) // 1000)

    if closed:
        yield pd.DataFrame(
            {
                "user_id": [user_id] * len(closed),
                "session_seq": [c[0] for c in closed],
                "n_events": [c[1] for c in closed],
                "session_start": [pd.Timestamp(c[2], unit="us") for c in closed],
                "session_end": [pd.Timestamp(c[3], unit="us") for c in closed],
            }
        )


def stream_sessionize(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Streaming sessionization: watermarked event stream → per-user session
    rows as sessions close (30-min inactivity). State = one open session per
    active user; event-time timeout both closes idle sessions and bounds the
    state store."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _sessionize_group,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def batch_sessionize_closed(events: DataFrame, gap_s: int = SESSION_GAP_S) -> DataFrame:
    """Batch twin of stream_sessionize for equivalence testing: the same
    session assignment via window functions, restricted to sessions that a
    drained stream would have CLOSED (i.e. all of them once the source is
    exhausted and the final watermark passes every timeout)."""
    from pyspark.sql.window import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wrun = w.rowsBetween(Window.unboundedPreceding, 0)
    prev_ts = F.lag("ts").over(w)
    new_session = F.when(
        prev_ts.isNull()
        | (F.unix_timestamp("ts") - F.unix_timestamp(prev_ts) > gap_s),
        1,
    ).otherwise(0)
    return (
        events.select("user_id", "ts", "event_id", new_session.alias("ns"))
        .select("user_id", "ts", F.sum("ns").over(wrun).alias("session_seq"))
        .groupBy("user_id", "session_seq")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
        )
    )


def _register_query() -> None:
    """Expose the stateful operator as a FULLY oracle-checked query (r6
    upgrade from rows-only): a drained applyInPandasWithState sessionization
    equals batch window-function sessionization (test_stateful_streaming.py
    proves the twin equivalence), and THAT is plain SQL — so the DuckDB
    oracle recomputes the same 30-min-gap sessions with lag/cumulative-sum
    windows in µs precision and the driver hash-checks every session row
    (user, seq, event count, start, end)."""
    import tempfile

    from pyspark.sql import SparkSession

    from duckdb_fastlanes_spark.catalog import table
    from duckdb_fastlanes_spark.registry import register

    @register(
        "stream_stateful_sessions",
        oracle=f"""
        WITH ev AS (
          SELECT user_id, epoch_us(ts) AS tus, event_id
          FROM events WHERE user_id < 100
        ), mark AS (
          SELECT user_id, tus, event_id,
                 CASE WHEN lag(tus) OVER w IS NULL
                           OR tus - lag(tus) OVER w > {SESSION_GAP_S} * 1000000
                      THEN 1 ELSE 0 END AS ns
          FROM ev
          WINDOW w AS (PARTITION BY user_id ORDER BY tus, event_id)
        ), sess AS (
          SELECT user_id, tus,
                 sum(ns) OVER (PARTITION BY user_id ORDER BY tus, event_id
                               ROWS UNBOUNDED PRECEDING) AS session_seq
          FROM mark
        )
        SELECT user_id,
               CAST(session_seq AS BIGINT) AS session_seq,
               count(*) AS n_events,
               make_timestamp(min(tus)) AS session_start,
               make_timestamp(max(tus)) AS session_end
        FROM sess
        GROUP BY user_id, session_seq
        ORDER BY user_id, session_seq
        """,
    )
    def stream_stateful_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
        ev = table(spark, sf_dir, "events").filter(F.col("user_id") < 100)
        from duckdb_fastlanes_spark.streaming.events import (
            drain_to_parquet,
            drained_fixture,
            staged_input,
        )

        # WATERMARK FLUSH SENTINEL: in a drained availableNow run the final
        # watermark only advances to the max event time, so any session
        # ending within watermark+gap of the global max never times out and
        # is silently absent from the drained output (test_stateful_
        # streaming.py documents this as the one admissible stream/batch
        # difference). One far-future row for a sentinel user pushes the
        # final watermark past every real session's timeout, so the drain
        # emits EVERY real session and the output is exactly the batch
        # sessionization — which is what makes the DuckDB oracle above an
        # exact hash check. The sentinel's own (single-event) session is
        # the only one left open, and it belongs to user -1, filtered out.
        flush = ev.limit(1).select(
            *[
                (
                    F.lit(-1).cast(f.dataType)
                    if f.name == "user_id"
                    else F.lit("2100-01-01 00:00:00").cast(f.dataType)
                    if f.name == "ts"
                    else F.lit(None).cast(f.dataType)
                ).alias(f.name)
                for f in ev.schema.fields
            ]
        )
        staged = staged_input(ev.unionByName(flush), sf_dir, "stateful_sessions")

        def build() -> DataFrame:
            import shutil

            workdir = tempfile.mkdtemp(prefix="dfs_stateful_")
            stream = spark.readStream.schema(
                spark.read.parquet(staged).schema
            ).parquet(staged)
            out = drain_to_parquet(
                stream_sessionize(stream), workdir, "sessions_out"
            )
            out = (
                out.filter(F.col("user_id") >= 0)
                .orderBy("user_id", "session_seq")
                .localCheckpoint(eager=True)
            )
            shutil.rmtree(workdir, ignore_errors=True)
            return out

        return drained_fixture(spark, "stateful_sessions", [staged], build)


_register_query()
