"""Copy-on-write versioned tables: the DML surface (DELETE / UPDATE / MERGE)
on immutable parquet.

The reference's embedded DuckDB engine has full DML (SURVEY.md §2.C remainder,
public knowledge); Spark's parquet tables are immutable, so mutation is
re-expressed the way every lakehouse does it — copy-on-write into a new
version directory plus an atomic pointer swap (the same mechanism as
streaming/matview.py). What this buys at 100 TB:

- **snapshot isolation**: readers pin a version directory; a concurrent
  writer never mutates files under them;
- **time travel**: every version stays addressable until vacuumed;
- **cost model**: DELETE/UPDATE rewrite only... everything, in this minimal
  form — one full pass. Partition-pruned rewrites (only touched partitions
  copied) are the production refinement; Delta/Iceberg add file-level
  rewrite + deletion vectors. The API is theirs deliberately, so swapping
  the backend touches no call sites.

Concurrency note: the pointer swap (os.replace) is atomic per POSIX, but two
concurrent writers can still race version numbers — a real deployment puts a
lock/commit-log in front (Delta's optimistic commit protocol). Single-writer
is assumed here.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

_PTR = "_CURRENT"


def _versions(root: str) -> list[int]:
    return sorted(
        int(d[1:]) for d in os.listdir(root) if d.startswith("v") and d[1:].isdigit()
    )


def current_version(root: str) -> int:
    with open(os.path.join(root, _PTR)) as fh:
        return int(fh.read().strip()[1:])


def _commit(root: str, df: DataFrame, version: int) -> None:
    df.write.mode("overwrite").parquet(os.path.join(root, f"v{version}"))
    tmp = os.path.join(root, _PTR + ".tmp")
    with open(tmp, "w") as fh:
        fh.write(f"v{version}")
    os.replace(tmp, os.path.join(root, _PTR))


def create_table(df: DataFrame, root: str) -> None:
    """Create version 0 of a COW table."""
    os.makedirs(root, exist_ok=True)
    _commit(root, df, 0)


def read_table(spark: SparkSession, root: str, version: int | None = None) -> DataFrame:
    """Read the current (or a pinned historical) version — time travel."""
    v = current_version(root) if version is None else version
    return spark.read.parquet(os.path.join(root, f"v{v}"))


def delete_where(spark: SparkSession, root: str, cond: Column) -> int:
    """DELETE FROM t WHERE cond. Returns the new version number."""
    cur = read_table(spark, root)
    v = current_version(root) + 1
    _commit(root, cur.filter(~cond), v)
    return v


def update_set(
    spark: SparkSession, root: str, cond: Column, assignments: dict[str, Column]
) -> int:
    """UPDATE t SET col = expr, ... WHERE cond. Returns the new version."""
    cur = read_table(spark, root)
    updated = cur.select(
        *[
            F.when(cond, assignments[c]).otherwise(F.col(c)).alias(c)
            if c in assignments
            else F.col(c)
            for c in cur.columns
        ]
    )
    v = current_version(root) + 1
    _commit(root, updated, v)
    return v


def merge_into(
    spark: SparkSession,
    root: str,
    source: DataFrame,
    on: list[str],
    when_matched_update: bool = True,
    when_not_matched_insert: bool = True,
) -> int:
    """MERGE INTO t USING source ON keys — upsert: matched target rows are
    replaced by the source row (when_matched_update), unmatched source rows
    append (when_not_matched_insert). Source must have the target's schema."""
    cur = read_table(spark, root)
    if when_matched_update:
        kept = cur.join(source.select(*on), on, "left_anti")
        merged = kept.unionByName(source) if when_not_matched_insert else kept.unionByName(
            source.join(cur.select(*on), on, "left_semi")
        )
    else:
        new_rows = source.join(cur.select(*on), on, "left_anti")
        merged = cur.unionByName(new_rows) if when_not_matched_insert else cur
    v = current_version(root) + 1
    _commit(root, merged, v)
    return v


def vacuum(root: str, keep_last: int = 1) -> list[int]:
    """Drop all but the newest ``keep_last`` versions (never the current).
    Returns the dropped version numbers."""
    vs = _versions(root)
    cur = current_version(root)
    drop = [v for v in vs[:-keep_last] if v != cur] if keep_last else []
    for v in drop:
        shutil.rmtree(os.path.join(root, f"v{v}"), ignore_errors=True)
    return drop


def _register_query() -> None:
    """Declare the DML surface as an oracle-checked query: a DELETE + UPDATE
    sequence on a COW table must equal the relational expression of the same
    mutations (DELETE ≡ anti-filter, UPDATE ≡ conditional projection) — which
    the DuckDB oracle states directly as a SELECT."""
    import tempfile

    from duckdb_fastlanes_spark.catalog import table
    from duckdb_fastlanes_spark.registry import register

    @register(
        "dml_cow_delete_update",
        oracle="""
        SELECT n_nationkey,
               CASE WHEN n_regionkey = 1 THEN n_name || '_EU' ELSE n_name END AS n_name,
               n_regionkey
        FROM nation
        WHERE n_regionkey <> 0
        ORDER BY n_nationkey
        """,
    )
    def dml_cow_delete_update(spark: SparkSession, sf_dir: str) -> DataFrame:
        root = tempfile.mkdtemp(prefix="dfs_cow_")
        create_table(table(spark, sf_dir, "nation"), root)
        delete_where(spark, root, F.col("n_regionkey") == 0)
        update_set(
            spark,
            root,
            F.col("n_regionkey") == 1,
            {"n_name": F.concat(F.col("n_name"), F.lit("_EU"))},
        )
        out = read_table(spark, root).orderBy("n_nationkey")
        # materialize executor-side (no driver round-trip) before dropping
        # the version directories the plan reads
        out = out.localCheckpoint(eager=True)
        shutil.rmtree(root, ignore_errors=True)
        return out


_register_query()


# ---------------------------------------------------------------------------
# Partitioned COW: rewrite cost ∝ touched partitions, not table size
# ---------------------------------------------------------------------------

_META = "_PARTITION_BY"


def create_table_partitioned(df: DataFrame, root: str, partition_by: str) -> None:
    """Create a hive-partitioned COW table (single partition column). DML on
    a partition-column predicate rewrites ONLY the touched partition
    directories; untouched partitions are hardlinked into the new version —
    O(touched data) I/O + O(files) metadata, the refinement that makes COW
    viable at 100 TB (full-table rewrites per DELETE are not)."""
    os.makedirs(root, exist_ok=True)
    with open(os.path.join(root, _META), "w") as fh:
        fh.write(partition_by)
    vdir = os.path.join(root, "v0")
    df.write.mode("overwrite").partitionBy(partition_by).parquet(vdir)
    tmp = os.path.join(root, _PTR + ".tmp")
    with open(tmp, "w") as fh:
        fh.write("v0")
    os.replace(tmp, os.path.join(root, _PTR))


def _hardlink_tree(src: str, dst: str) -> None:
    for dirpath, _dirnames, filenames in os.walk(src):
        rel = os.path.relpath(dirpath, src)
        out = os.path.join(dst, rel) if rel != "." else dst
        os.makedirs(out, exist_ok=True)
        for f in filenames:
            os.link(os.path.join(dirpath, f), os.path.join(out, f))


def delete_partitions_where(
    spark: SparkSession, root: str, values: list[str], rewrite=None
) -> int:
    """Partition-pruned mutation: drop (or rewrite, if ``rewrite`` is given a
    DataFrame→DataFrame function) the partitions whose partition-column value
    is in ``values``. Every other partition directory is hardlinked from the
    current version — no data copied, no data read. Returns the new version."""
    with open(os.path.join(root, _META)) as fh:
        part_col = fh.read().strip()
    cur_v = current_version(root)
    cur_dir = os.path.join(root, f"v{cur_v}")
    new_v = cur_v + 1
    new_dir = os.path.join(root, f"v{new_v}")
    os.makedirs(new_dir, exist_ok=True)

    touched = {f"{part_col}={v}" for v in values}
    for entry in os.listdir(cur_dir):
        src = os.path.join(cur_dir, entry)
        if entry in touched or not entry.startswith(f"{part_col}="):
            continue  # dropped/rewritten partitions and non-partition files skipped
        _hardlink_tree(src, os.path.join(new_dir, entry))

    if rewrite is not None:
        for entry in sorted(touched):
            src = os.path.join(cur_dir, entry)
            if not os.path.isdir(src):
                continue
            part_df = spark.read.parquet(src)
            out = rewrite(part_df)
            out.write.mode("overwrite").parquet(os.path.join(new_dir, entry))

    tmp = os.path.join(root, _PTR + ".tmp")
    with open(tmp, "w") as fh:
        fh.write(f"v{new_v}")
    os.replace(tmp, os.path.join(root, _PTR))
    return new_v


def read_table_partitioned(
    spark: SparkSession, root: str, version: int | None = None
) -> DataFrame:
    """Read a partitioned COW table version (hive partition discovery:
    basePath makes the partition column a real column)."""
    v = current_version(root) if version is None else version
    vdir = os.path.join(root, f"v{v}")
    return spark.read.option("basePath", vdir).parquet(vdir)
