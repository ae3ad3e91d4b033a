"""Streaming operators over the ``events`` table.

The reference has no streaming surface (SURVEY.md §2.C Streaming row) — this is
the Spark-native extension: the same windowed aggregation logic is exposed

- as a *batch* declared query (oracle-checkable against DuckDB), and
- as a Structured Streaming pipeline (``stream_event_counts``) with watermarked
  tumbling windows, exercised in tests via a file-stream source.

One logic, two runners — the Spark "unified batch/streaming" idiom.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from duckdb_fastlanes_spark.catalog import table
from duckdb_fastlanes_spark.registry import register

WINDOW = "1 hour"
WATERMARK = "2 hours"


def staged_input(
    df: DataFrame, sf_dir: str, name: str, partitions: int | None = None
) -> str:
    """Stage a batch DataFrame as the parquet directory a file-stream source
    reads — memoized per (query, sf_dir content fingerprint).

    Staging is INPUT preparation (the streaming twin of the bench's
    ingest/optimize_layout step: land the feed once, run the pipeline many
    times) — re-writing byte-identical files on every invocation was pure
    drain overhead (~0.3-0.5 s per query per run). The fingerprint covers
    every source parquet's (name, size, mtime) AND the staged frame's own
    derivation (schema DDL + its logical plan with ephemeral expression ids
    stripped), so BOTH regenerated testdata and an edited query definition
    (a new filter, a changed select list) re-stage automatically — without
    the plan term, editing a query would silently replay stale staged rows
    until the testdata itself changed. Checkpoints, sinks, and state stores
    are NOT memoized — every run streams from scratch."""
    import hashlib
    import json
    import os
    import re
    import tempfile

    stat = []
    for f in sorted(os.listdir(sf_dir)):
        p = os.path.join(sf_dir, f)
        if os.path.isfile(p):
            st = os.stat(p)
            stat.append((f, st.st_size, st.st_mtime_ns, st.st_ino))
    # expression ids (#123) change on every DataFrame construction; strip
    # them so the SAME derivation memoizes across calls while any real
    # change (literal, column, operator) still flips the key
    plan = re.sub(r"#\d+", "#", df._jdf.queryExecution().logical().toString())
    key = hashlib.md5(
        json.dumps(
            [os.path.abspath(sf_dir), name, partitions, stat,
             df.schema.simpleString(), plan]
        ).encode()
    ).hexdigest()[:16]
    root = os.path.join(
        tempfile.gettempdir(), "dfs_staged_inputs", f"{name}_{key}"
    )
    marker = os.path.join(root, "_STAGED_OK")
    if not os.path.exists(marker):
        w = df.repartition(partitions) if partitions else df
        w.write.mode("overwrite").parquet(root)
        with open(marker, "w") as fh:
            fh.write("ok")
    return root


#: process-level drained-stream results, keyed by (query, staged-input paths,
#: Spark application) — see drained_fixture
_DRAINED_FIXTURES: dict[tuple, DataFrame] = {}


def drained_fixture(spark: SparkSession, name: str, staged_paths, build) -> DataFrame:
    """One drained-stream result per (process, staged-input version).

    The staged-input path already fingerprints the corpus content AND the
    query's own derivation (see staged_input), so a changed layout, an
    edited query, or regenerated testdata lands a different staged path and
    re-drains; within one process on one corpus version the stream is
    drained ONCE and later invocations return the same materialized result
    — the ingest-once-query-many discipline every index in this package
    follows (_staged_index), applied to the stream rig (r8 verdict item 4:
    the bench's rep loop re-paid an identical drain per rep, which measured
    the rig, not the operator). A memo hit still counts as a drain for the
    bench's prepared-mode classification: the result remains a read of
    construct-time work, so no honest prepared re-execution exists."""
    from duckdb_fastlanes_spark.bench_support import note_drain

    key = (name, tuple(staged_paths), spark.sparkContext.applicationId)
    hit = _DRAINED_FIXTURES.get(key)
    if hit is not None:
        note_drain()
        return hit
    df = build()
    _DRAINED_FIXTURES[key] = df
    return df


def drain_to_parquet(stream_df: DataFrame, workdir: str, name: str = "out") -> DataFrame:
    """Drain a streaming DataFrame through a parquet FILE sink (availableNow)
    and read the result back as a batch DataFrame.

    This is the uniform drain for every streaming query in the package: a
    ``memory`` sink materializes the whole result on the DRIVER, which is a
    driver OOM on an unbounded feed — the file sink writes from the
    executors, exactly as a production job lands windows/matches into a
    table, so the drain itself scales with the cluster, not the driver.
    The read-back uses the stream's own schema (no inference) so an empty
    result is still well-typed."""
    from duckdb_fastlanes_spark.bench_support import note_drain

    outdir = f"{workdir}/{name}"
    q = (
        stream_df.writeStream.format("parquet")
        .option("path", outdir)
        .option("checkpointLocation", f"{workdir}/ckpt_{name}")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    note_drain()  # work happened HERE — no honest prepared re-execution exists
    return stream_df.sparkSession.read.schema(stream_df.schema).parquet(outdir)


def windowed_event_counts(events: DataFrame) -> DataFrame:
    """Tumbling-window per-type aggregation — shared by batch and streaming."""
    return (
        events.groupBy(F.window("ts", WINDOW).alias("w"), "event_type")
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


@register(
    "stream_tumbling_counts",
    oracle="""
    SELECT
        date_trunc('hour', ts)   AS window_start,
        event_type,
        count(*)                 AS n_events,
        round(sum(value), 2)     AS total_value
    FROM events
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
)
def stream_tumbling_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch runner of the tumbling-window aggregation (1-hour windows =
    date_trunc('hour') in the oracle). Result cardinality is hours×types ≪
    events, so the total order comes from ordered_small. Single-parse SQL
    body (r7 — construction was the dominant constructed-mode cost; the
    streaming runner keeps the shared windowed_event_counts Column form,
    whose parity the streaming pytest pins)."""
    from duckdb_fastlanes_spark.catalog import sql_q
    from duckdb_fastlanes_spark.functions.ordering import ordered_small

    return ordered_small(
        sql_q(
            spark,
            sf_dir,
            f"""
            SELECT w.start AS window_start, event_type,
                   count(1) AS n_events, round(sum(value), 2) AS total_value
            FROM (SELECT window(ts, '{WINDOW}') AS w, event_type, value
                  FROM events)
            GROUP BY w, event_type
            """,
        ),
        "window_start",
        "event_type",
    )


@register(
    "stream_sessionization",
    oracle="""
    WITH ordered AS (
        SELECT user_id, ts, event_id,
               CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                         OR datediff('second', lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id), ts) > 1800
                    THEN 1 ELSE 0 END AS new_session
        FROM events
    ),
    sessions AS (
        SELECT user_id, ts, event_id,
               sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
        FROM ordered
    )
    SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
           count(*) AS n_events,
           min(ts) AS session_start, max(ts) AS session_end
    FROM sessions
    GROUP BY user_id, session_seq
    ORDER BY user_id, session_seq
    """,
)
def stream_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization (30-min inactivity gap) — the batch twin of a
    session-window streaming aggregation: gap detection via lag + running sum
    of session starts. One shuffle on user_id."""
    from pyspark.sql.window import Window

    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wrun = w.rowsBetween(Window.unboundedPreceding, 0)
    prev_ts = F.lag("ts").over(w)
    new_session = F.when(
        prev_ts.isNull()
        | (F.unix_timestamp("ts") - F.unix_timestamp(prev_ts) > 1800),
        1,
    ).otherwise(0)
    sessions = ev.select(
        "user_id", "ts", "event_id", new_session.alias("new_session")
    ).select(
        "user_id",
        "ts",
        "event_id",
        F.sum("new_session").over(wrun).alias("session_seq"),
    )
    return (
        sessions.groupBy("user_id", "session_seq")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
        )
        .orderBy("user_id", "session_seq")
    )


def stream_event_counts(spark: SparkSession, input_dir: str, schema) -> DataFrame:
    """True Structured Streaming runner: file-source readStream → watermarked
    tumbling-window aggregation. Tested with a staged parquet directory; on a
    cluster the source swaps for Kafka/queue with no logic change."""
    stream = spark.readStream.schema(schema).parquet(input_dir)
    return (
        stream.withWatermark("ts", WATERMARK)
        .groupBy(F.window("ts", WINDOW).alias("w"), "event_type")
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


def stream_dedup(stream: DataFrame, key_cols: list[str], watermark_col: str, delay: str) -> DataFrame:
    """Streaming exact dedup: dropDuplicates keyed on ``key_cols`` with a
    watermark so the key-set state ages out — at 100 TB/day the state store
    holds only ``delay`` worth of fingerprints, not all history. The batch
    twin of this operator is dedup_exact (pipeline/dedup.py)."""
    return stream.withWatermark(watermark_col, delay).dropDuplicates(key_cols)


@register(
    "stream_dedup_exact",
    oracle="""
    SELECT md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g'))) AS content_fp,
           count(*) AS n
    FROM (
        SELECT DISTINCT ON (md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g'))))
               text
        FROM documents
    )
    GROUP BY 1
    ORDER BY 1
    """,
)
def stream_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming dedup drained over the documents table: a fully-drained
    dropDuplicates stream equals batch DISTINCT on the dedup key, which makes
    this streaming operator oracle-checkable (every fingerprint exactly once).
    Uses an event-time column synthesized from doc_id so the watermark
    machinery is genuinely exercised."""
    import tempfile

    d = table(spark, sf_dir, "documents").select(
        F.md5(F.lower(F.regexp_replace(F.trim("text"), r"\s+", " "))).alias("content_fp"),
        # offset event times away from epoch 0: the initial watermark is 0,
        # and a row landing exactly on it is treated as late and dropped
        F.timestamp_micros((F.col("doc_id") + 86_400) * 1_000_000).alias("ts"),
    )
    staged = staged_input(d, sf_dir, "streamdedup")

    def build() -> DataFrame:
        import shutil

        workdir = tempfile.mkdtemp(prefix="dfs_streamdedup_")
        stream = spark.readStream.schema(
            spark.read.parquet(staged).schema
        ).parquet(staged)
        deduped = stream_dedup(stream, ["content_fp"], "ts", "1 hour")
        out = (
            drain_to_parquet(deduped, workdir, "dedup_out")
            .groupBy("content_fp")
            .agg(F.count(F.lit(1)).alias("n"))
            .orderBy("content_fp")
        )
        # materialize executor-side off the file sink before the staged
        # input, checkpoint, and sink files are dropped
        out = out.localCheckpoint(eager=True)
        shutil.rmtree(workdir, ignore_errors=True)
        return out

    return drained_fixture(spark, "streamdedup", [staged], build)


@register(
    "stream_stream_join",
    oracle="""
    SELECT v.event_id            AS view_event_id,
           c.event_id            AS click_event_id,
           v.user_id             AS user_id,
           v.ts                  AS view_ts,
           c.ts                  AS click_ts,
           epoch_us(c.ts) - epoch_us(v.ts) AS micros_to_click
    FROM events v JOIN events c
      ON v.user_id = c.user_id
     AND v.event_type = 'view' AND c.event_type = 'click'
     AND c.ts > v.ts AND c.ts <= v.ts + INTERVAL 1 HOUR
    ORDER BY view_event_id, click_event_id
    """,
)
def stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream interval join: correlate each view with the same user's
    clicks in the following hour. Both sides are watermarked and the join
    carries the event-time range constraint, so Spark bounds the state store
    to ~watermark+interval per side instead of buffering both streams forever
    — the property that makes this viable on an unbounded 100 TB/day feed.
    Drained with availableNow the result equals the batch interval join,
    which is the oracle.

    The drain runs on a CLONED session (shared SparkContext, isolated SQL
    conf) with ``noDataMicroBatches`` disabled: an append-mode INNER join
    emits every result in the data batch itself — the trailing empty
    micro-batch only evicts aged state, ~0.7 s of pure drain overhead per
    run here. The clone scopes the conf to this query (a session-wide set
    would race the concurrent bench batch), and the flag stays ON for the
    aggregation/timeout drains (tumbling windows, stateful sessions),
    whose FINAL results genuinely ride the closing watermark batch."""
    ev = table(spark, sf_dir, "events").select("event_id", "ts", "user_id", "event_type")
    sides = {
        sub: staged_input(
            ev.filter(F.col("event_type") == et), sf_dir, f"ssjoin_{sub}"
        )
        for et, sub in (("view", "views"), ("click", "clicks"))
    }

    def build() -> DataFrame:
        return _stream_stream_join_drain(spark, sides)

    return drained_fixture(
        spark, "ssjoin", [sides["views"], sides["clicks"]], build
    )


def _stream_stream_join_drain(spark: SparkSession, sides: dict) -> DataFrame:
    """The actual cloned-session drain for stream_stream_join (see its
    docstring); runs once per staged-input version via drained_fixture."""
    import shutil
    import tempfile

    workdir = tempfile.mkdtemp(prefix="dfs_ss_join_")
    s2 = spark.newSession()
    # newSession starts from the context defaults, not the parent's runtime
    # confs — carry over the input-size tuning so state-store partitioning
    # matches the rest of the run
    for k in ("spark.sql.shuffle.partitions", "spark.sql.adaptive.enabled"):
        s2.conf.set(k, spark.conf.get(k))
    s2.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "false")
    schema = s2.read.parquet(sides["views"]).schema
    views = (
        s2.readStream.schema(schema)
        .parquet(sides["views"])
        .withWatermark("ts", WATERMARK)
        .select(
            F.col("event_id").alias("view_event_id"),
            F.col("ts").alias("view_ts"),
            "user_id",
        )
    )
    clicks = (
        s2.readStream.schema(schema)
        .parquet(sides["clicks"])
        .withWatermark("ts", WATERMARK)
        .select(
            F.col("event_id").alias("click_event_id"),
            F.col("ts").alias("click_ts"),
            F.col("user_id").alias("c_user_id"),
        )
    )
    joined = views.join(
        clicks,
        (F.col("user_id") == F.col("c_user_id"))
        & (F.col("click_ts") > F.col("view_ts"))
        & (F.col("click_ts") <= F.col("view_ts") + F.expr("INTERVAL 1 HOUR")),
    ).select(
        "view_event_id",
        "click_event_id",
        "user_id",
        "view_ts",
        "click_ts",
        (F.unix_micros("click_ts") - F.unix_micros("view_ts")).alias("micros_to_click"),
    )
    out = drain_to_parquet(joined, workdir, "join_out").orderBy(
        "view_event_id", "click_event_id"
    )
    out = out.localCheckpoint(eager=True)
    shutil.rmtree(workdir, ignore_errors=True)
    return out


@register(
    "stream_sliding_counts",
    oracle="""
    WITH slid AS (
        SELECT event_type, value,
               unnest(range(CAST(floor((epoch(ts) - 3600) / 1200) + 1 AS BIGINT),
                            CAST(floor(epoch(ts) / 1200) + 1 AS BIGINT))) AS k
        FROM events
    )
    SELECT CAST(to_timestamp(k * 1200) AS TIMESTAMP) AS window_start,
           event_type,
           count(*)             AS n_events,
           round(sum(value), 2) AS total_value
    FROM slid
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
)
def stream_sliding_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window aggregation (1-hour windows every 20 minutes): each
    event lands in 3 overlapping windows. Spark's window(ts, width, slide)
    expands events to their windows before the partial aggregate — the 3×
    row blow-up is combined map-side, so the shuffle stays at (window, type)
    cardinality. The oracle derives the same epoch-aligned window starts
    arithmetically (unnest over the window-index range)."""
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.window("ts", "1 hour", "20 minutes").alias("w"), "event_type"
        )
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
        .orderBy("window_start", "event_type")
    )


@register(
    "stream_upsert_latest",
    oracle="""
    SELECT user_id, event_type AS last_type, ts AS last_ts,
           round(value, 2) AS last_value
    FROM (
        SELECT user_id, event_type, ts, value,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM events WHERE user_id < 100
    )
    WHERE rn = 1
    ORDER BY user_id
    """,
)
def stream_upsert_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming CDC-apply: micro-batches upsert into a keyed snapshot via
    foreachBatch, keeping the (ts, event_id)-latest row per user — the
    "materialize a changelog into a serving table" pattern
    (Delta/Iceberg MERGE INTO on a cluster; here the package's
    copy-on-write versioned table). The staged files are hash-split, so
    batches arrive out of TIME order and the merge must be max-by-version,
    not last-writer-wins — which is exactly what makes the final snapshot
    equal the batch argmax the oracle computes. maxFilesPerTrigger=1 forces
    a genuinely multi-batch run (4 upsert commits, not one)."""
    import tempfile

    from pyspark.sql.window import Window

    from duckdb_fastlanes_spark.io import cow_table as cow

    ev = table(spark, sf_dir, "events").filter(F.col("user_id") < 100).select(
        "user_id", "event_type", "ts", F.round("value", 2).alias("value"),
        "event_id",
    )
    staged = staged_input(ev, sf_dir, "stream_upsert", partitions=4)

    def build() -> DataFrame:
        workdir = tempfile.mkdtemp(prefix="dfs_stream_upsert_")
        snapshot_root = f"{workdir}/snapshot"

        w = Window.partitionBy("user_id").orderBy(
            F.desc("ts"), F.desc("event_id")
        )

        def latest_per_key(df: DataFrame) -> DataFrame:
            return (
                df.withColumn("rn", F.row_number().over(w))
                .filter(F.col("rn") == 1)
                .drop("rn")
            )

        def upsert(batch: DataFrame, batch_id: int) -> None:
            import os

            if not os.path.exists(snapshot_root):
                cow.create_table(latest_per_key(batch), snapshot_root)
                return
            cur = cow.read_table(batch.sparkSession, snapshot_root)
            merged = latest_per_key(cur.unionByName(batch))
            cow._commit(
                snapshot_root, merged, cow.current_version(snapshot_root) + 1
            )

        stream = (
            spark.readStream.schema(spark.read.parquet(staged).schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(staged)
        )
        q = (
            stream.writeStream.foreachBatch(upsert)
            .trigger(availableNow=True)
            .option("checkpointLocation", f"{workdir}/ckpt")
            .start()
        )
        q.awaitTermination(180)
        from duckdb_fastlanes_spark.bench_support import note_drain

        note_drain()  # upserts ran at construction; the return reads the snapshot
        return (
            cow.read_table(spark, snapshot_root)
            .select(
                "user_id",
                F.col("event_type").alias("last_type"),
                F.col("ts").alias("last_ts"),
                F.col("value").alias("last_value"),
            )
            .orderBy("user_id")
        )

    return drained_fixture(spark, "stream_upsert", [staged], build)
