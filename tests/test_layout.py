"""Layout primitives for scale: hive partitioning must prune directories,
bucketed tables must join without an exchange."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from duckdb_fastlanes_spark.catalog import table
from duckdb_fastlanes_spark.io.fls import read_fls, write_fls, write_fls_bucketed
from duckdb_fastlanes_spark.plans.checks import explain_str
from tests.conftest import SF_DIR


def test_partitioned_write_prunes_directories(spark, tmp_path):
    out = str(tmp_path / "orders_by_status")
    o = table(spark, SF_DIR, "orders")
    write_fls(o, out, partition_by=["o_orderstatus"])

    # hive layout on disk: one directory per status value
    dirs = {os.path.basename(p) for p in glob.glob(f"{out}/o_orderstatus=*")}
    assert dirs == {"o_orderstatus=F", "o_orderstatus=O", "o_orderstatus=P"}

    df = read_fls(spark, out).filter(F.col("o_orderstatus") == "F")
    plan = explain_str(df)
    # the filter must land in PartitionFilters (directory pruning before I/O),
    # not in PushedFilters/post-scan Filter
    assert "PartitionFilters" in plan
    assert "o_orderstatus" in plan.split("PartitionFilters")[1].split("]")[0]

    expect = o.filter(F.col("o_orderstatus") == "F").count()
    assert df.count() == expect


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    """Two tables bucketed on the join key must sort-merge join with zero
    Exchange nodes — the write-time shuffle is reused."""
    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS o_bucketed")
    li = table(spark, SF_DIR, "lineitem").select("l_orderkey", "l_quantity")
    o = table(spark, SF_DIR, "orders").select("o_orderkey", "o_totalprice")
    write_fls_bucketed(li, "li_bucketed", bucket_by=["l_orderkey"], n_buckets=8)
    write_fls_bucketed(o, "o_bucketed", bucket_by=["o_orderkey"], n_buckets=8)

    lb = spark.table("li_bucketed")
    ob = spark.table("o_bucketed")
    joined = lb.join(ob, lb.l_orderkey == ob.o_orderkey)

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # forbid broadcast so the join must pick SMJ — the interesting case
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        plan = explain_str(joined, "simple")
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)

    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan  # bucketing replaced both shuffles

    # and the answer matches the unbucketed join
    assert joined.count() == li.join(o, li.l_orderkey == o.o_orderkey).count()
