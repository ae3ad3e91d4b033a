"""DML on copy-on-write versioned tables: delete/update/merge must match the
equivalent relational expressions, old versions must stay readable (time
travel), vacuum must never drop the current version."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from duckdb_fastlanes_spark.catalog import table
from duckdb_fastlanes_spark.io.cow_table import (
    create_table,
    current_version,
    delete_where,
    merge_into,
    read_table,
    update_set,
    vacuum,
)
from tests.conftest import SF_DIR


def test_delete_update_merge_and_time_travel(spark, tmp_path):
    root = str(tmp_path / "nation_cow")
    n = table(spark, SF_DIR, "nation")
    create_table(n, root)
    assert current_version(root) == 0

    # DELETE
    delete_where(spark, root, F.col("n_regionkey") == 0)
    after_del = read_table(spark, root)
    assert after_del.filter(F.col("n_regionkey") == 0).count() == 0
    assert after_del.count() == n.filter(F.col("n_regionkey") != 0).count()

    # UPDATE
    update_set(
        spark,
        root,
        F.col("n_regionkey") == 1,
        {"n_name": F.concat(F.col("n_name"), F.lit("_EU"))},
    )
    after_upd = read_table(spark, root)
    assert after_upd.filter(
        (F.col("n_regionkey") == 1) & ~F.col("n_name").endswith("_EU")
    ).count() == 0
    assert after_upd.filter(
        (F.col("n_regionkey") != 1) & F.col("n_name").endswith("_EU")
    ).count() == 0

    # MERGE (upsert: one update + one insert)
    src = spark.createDataFrame(
        [(3, "NATION_3_PATCHED", 1), (99, "NATION_99_NEW", 4)],
        schema=n.schema,
    )
    merge_into(spark, root, src, on=["n_nationkey"])
    after_merge = read_table(spark, root)
    rows = {r.n_nationkey: r.n_name for r in after_merge.collect()}
    assert rows[3] == "NATION_3_PATCHED"
    assert rows[99] == "NATION_99_NEW"
    assert after_merge.count() == after_upd.count() + 1  # 1 update, 1 insert

    # time travel: version 0 still equals the original table
    v0 = read_table(spark, root, version=0)
    assert v0.exceptAll(n).count() == 0 and n.exceptAll(v0).count() == 0

    # vacuum keeps the current version and drops old ones
    dropped = vacuum(root, keep_last=1)
    assert current_version(root) not in dropped
    assert not os.path.exists(os.path.join(root, "v0"))
    assert read_table(spark, root).count() == after_merge.count()


def test_partitioned_cow_prunes_rewrites(spark, tmp_path):
    """Partition-pruned DML: dropping one status partition must hardlink the
    others (same inode - zero data copied) and the result must equal the
    filter; a rewrite callback must touch only its partition."""
    from duckdb_fastlanes_spark.io.cow_table import (
        create_table_partitioned,
        delete_partitions_where,
        read_table_partitioned,
    )

    root = str(tmp_path / "orders_part")
    o = table(spark, SF_DIR, "orders")
    create_table_partitioned(o, root, partition_by="o_orderstatus")

    # DELETE the 'P' partition
    delete_partitions_where(spark, root, ["P"])
    got = read_table_partitioned(spark, root)
    assert got.filter(F.col("o_orderstatus") == "P").count() == 0
    assert got.count() == o.filter(F.col("o_orderstatus") != "P").count()

    # untouched partitions are hardlinks of v0 files (same inode)
    import glob as g

    v0_files = sorted(g.glob(f"{root}/v0/o_orderstatus=F/*.parquet"))
    v1_files = sorted(g.glob(f"{root}/v1/o_orderstatus=F/*.parquet"))
    assert v0_files and len(v0_files) == len(v1_files)
    assert all(
        os.stat(a).st_ino == os.stat(b).st_ino for a, b in zip(v0_files, v1_files)
    )

    # partition-scoped UPDATE: zero out totals only in 'F'
    delete_partitions_where(
        spark,
        root,
        ["F"],
        rewrite=lambda df: df.withColumn("o_totalprice", F.lit(0.0)),
    )
    got2 = read_table_partitioned(spark, root)
    assert got2.filter((F.col("o_orderstatus") == "F") & (F.col("o_totalprice") != 0.0)).count() == 0
    assert got2.filter(F.col("o_orderstatus") == "O").count() == o.filter(
        F.col("o_orderstatus") == "O"
    ).count()
    # time travel intact
    assert read_table_partitioned(spark, root, version=0).count() == o.count()
