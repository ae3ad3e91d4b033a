"""SparkSession factory tuned for the engine.

Defaults are chosen for correctness parity with the DuckDB oracle and for
scale-readiness (AQE, pushdown, pruning). On a real cluster only
``master``/``shuffle_partitions`` change; the config surface is identical.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "duckdb-fastlanes-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with engine defaults.

    - AQE on (runtime re-planning, skew-join splitting, partition coalescing) —
      the Spark counterpart of the reference's runtime adaptivity
      (adaptive filter ordering, src/reader/fls_reader.cpp:357-380).
    - Parquet filter pushdown + row-group stats pruning — the counterpart of
      zone-map pruning (src/reader/row_group_filter.cpp:75-199).
    - Session timezone pinned to UTC so timestamp semantics match the DuckDB
      oracle (DuckDB TIMESTAMP is naive/UTC-like).
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_GRAFT_SHUFFLE", cpus))

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.sql.parquet.aggregatePushdown", "true")
        .config("spark.sql.parquet.compression.codec", "zstd")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.ansi.enabled", "false")
        # read INT64 TIMESTAMP(NANOS) parquet columns (events.ts) as long;
        # catalog.table converts to µs TimestampType losslessly (values are
        # µs-aligned; DuckDB's reader does the same µs conversion)
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def sf_dir(default: str = "/root/testdata/sf0.1") -> str:
    """Scale-factor directory for benchmarks (driver contract)."""
    return os.environ.get("SPARK_GRAFT_SF_DIR", default)
