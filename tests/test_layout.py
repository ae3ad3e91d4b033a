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
    import shutil

    # drop both the catalog entries and any orphaned warehouse directories a
    # previous (killed) session left behind — saveAsTable refuses to reuse them
    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for t in ("li_bucketed", "o_bucketed"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(os.path.join(warehouse, t), ignore_errors=True)
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


def test_cluster_by_gives_disjoint_file_ranges(spark, tmp_path):
    """Range clustering must give near-disjoint per-file min/max on the
    cluster key (the zone-map-friendly layout); an unclustered multi-file
    write has full-range stats everywhere."""
    import pyarrow.parquet as pq

    from duckdb_fastlanes_spark.io.fls import cluster_by

    li = table(spark, SF_DIR, "lineitem").select("l_orderkey", "l_quantity")
    out = str(tmp_path / "clustered")
    cluster_by(li, ["l_orderkey"], n_partitions=8).write.parquet(out)

    ranges = []
    for f in glob.glob(f"{out}/*.parquet"):
        md = pq.ParquetFile(f).metadata
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(0).statistics
            mins.append(st.min)
            maxs.append(st.max)
        ranges.append((min(mins), max(maxs)))
    ranges.sort()
    # files overlap at most at their boundary value (range partitioner edges)
    for (a_min, a_max), (b_min, b_max) in zip(ranges, ranges[1:]):
        assert a_max <= b_min, (a_max, b_min)

    # and a selective key filter must prune: read back with a range predicate
    # touching one file's range only — row count matches the true answer
    lo, hi = ranges[0][0], ranges[0][1]
    got = spark.read.parquet(out).filter(F.col("l_orderkey") <= hi).count()
    expect = li.filter(F.col("l_orderkey") <= hi).count()
    assert got == expect


def test_compact_reduces_file_count(spark, tmp_path):
    from duckdb_fastlanes_spark.io.fls import compact

    src = str(tmp_path / "fragmented")
    table(spark, SF_DIR, "orders").repartition(64).write.parquet(src)
    assert len(glob.glob(f"{src}/*.parquet")) == 64

    out = str(tmp_path / "compacted")
    n = compact(spark, src, out, target_file_mb=512)
    files = glob.glob(f"{out}/*.parquet")
    assert len(files) == n == 1  # ~3 MB of data → one 512 MB-target file
    assert spark.read.parquet(out).count() == table(spark, SF_DIR, "orders").count()


def test_zorder_tightens_both_dimensions(spark, tmp_path):
    """Z-ordering on (l_orderkey, l_partkey) must give every file a compact
    range on BOTH columns — the multi-dim locality 1-D clustering can't:
    range-clustering by orderkey alone leaves each file spanning the full
    partkey domain."""
    import pyarrow.parquet as pq

    from duckdb_fastlanes_spark.io.fls import cluster_by, zorder_by

    li = table(spark, SF_DIR, "lineitem").select("l_orderkey", "l_partkey")

    zout = str(tmp_path / "zordered")
    zorder_by(li, ["l_orderkey", "l_partkey"], n_partitions=16).write.parquet(zout)
    cout = str(tmp_path / "clustered1d")
    cluster_by(li, ["l_orderkey"], n_partitions=16).write.parquet(cout)

    def avg_fraction(path, col_idx, global_span):
        fracs = []
        for f in glob.glob(f"{path}/*.parquet"):
            md = pq.ParquetFile(f).metadata
            mins, maxs = [], []
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(col_idx).statistics
                mins.append(st.min)
                maxs.append(st.max)
            fracs.append((max(maxs) - min(mins)) / global_span)
        return sum(fracs) / len(fracs)

    row = li.agg(
        F.max("l_orderkey"), F.min("l_orderkey"), F.max("l_partkey"), F.min("l_partkey")
    ).collect()[0]
    ok_span = row[0] - row[1]
    pk_span = row[2] - row[3]

    # z-order: BOTH dims compact (files cover well under half the domain);
    # 1-D clustering: partkey spans ~the whole domain in every file
    assert avg_fraction(zout, 0, ok_span) < 0.5
    assert avg_fraction(zout, 1, pk_span) < 0.5
    assert avg_fraction(cout, 1, pk_span) > 0.9


def test_optimize_layout_preserves_data_and_parallelizes(spark, tmp_path):
    """Ingest into the optimized layout: same rows, fact tables multi-file
    (parallel scans), redirect active only for the ingested dir."""
    from duckdb_fastlanes_spark import catalog

    root = catalog.optimize_layout(spark, SF_DIR, cache_root=str(tmp_path / "layout"))
    try:
        li_opt = table(spark, SF_DIR, "lineitem")
        assert li_opt.rdd.getNumPartitions() > 1
        raw = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
        assert li_opt.count() == raw.count()
        assert li_opt.exceptAll(raw).count() == 0
        assert os.path.isdir(os.path.join(root, "lineitem.parquet"))
    finally:
        # restore the raw-path redirect for the rest of the suite
        catalog._LAYOUT.pop(SF_DIR.rstrip("/"), None)
        catalog._CACHE.clear()


def test_catalog_bucketed_staging_is_exchange_free_and_fresh(spark, tmp_path):
    """r6 catalog layer: above the input gauge, optimize_layout stages the
    fact tables as bucketBy(32, orderkey) tables and table() serves them —
    the orderkey join AND the distinct-orderkey aggregate must plan with
    ZERO Exchange nodes, rows must match the raw source, and regenerating
    the source must fingerprint to a NEW staged table (no stale serve)."""
    import shutil

    from duckdb_fastlanes_spark import catalog

    # copy the corpus so we can touch mtimes without mutating testdata
    src = str(tmp_path / "sf")
    os.makedirs(src)
    for t in ("lineitem", "orders"):
        shutil.copy(f"{SF_DIR}/{t}.parquet", f"{src}/{t}.parquet")
    root = catalog.optimize_layout(spark, src, cache_root=str(tmp_path / "layout"))
    try:
        # force the bucketed staging (the gauge gate keeps it off for tiny
        # inputs; the layer under test is scale-path-only by design)
        catalog._stage_bucketed(spark, src, root)
        first = catalog._BUCKET_TABLE[(src, "lineitem")][0]
        li = table(spark, src, "lineitem")
        o = table(spark, src, "orders")
        j = li.join(o.hint("merge"), li.l_orderkey == o.o_orderkey).groupBy(
            "l_orderkey"
        ).count()
        assert "Exchange" not in explain_str(j, "simple")
        agg = li.groupBy("l_orderkey").agg(F.count(F.lit(1)).alias("n"))
        assert "Exchange" not in explain_str(agg, "simple")
        raw = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
        assert li.count() == raw.count()
        assert li.exceptAll(raw).count() == 0
        # sorted one-file-per-bucket layout: exactly n_buckets data files
        loc = catalog._BUCKET_TABLE[(src, "lineitem")][1]
        n_files = len([f for f in os.listdir(loc) if f.endswith(".parquet")])
        assert n_files == catalog._BUCKET_N
        # staleness: regenerate the source in place → new fingerprint/table
        os.utime(f"{src}/lineitem.parquet", (1, 1))
        catalog._stage_bucketed(spark, src, root)
        assert catalog._BUCKET_TABLE[(src, "lineitem")][0] != first
    finally:
        for tname, _, _ in catalog._BUCKET_TABLE.values():
            spark.sql(f"DROP TABLE IF EXISTS {tname}")
        catalog._BUCKET_TABLE.clear()
        catalog._LAYOUT.pop(src, None)
        catalog._CACHE.clear()


def test_source_fingerprint_sees_subsecond_and_inode_changes(tmp_path):
    """ADVICE r6: a source regenerated within the same wall-clock second at
    identical byte size must still fingerprint differently — the
    fingerprint reads mtime_ns (and the inode), not whole seconds."""
    from duckdb_fastlanes_spark import catalog

    src = str(tmp_path)
    p = os.path.join(src, "lineitem.parquet")
    with open(p, "wb") as f:
        f.write(b"x" * 64)
    os.utime(p, ns=(1_000_000_000, 1_000_000_000))
    fp1 = catalog.source_fingerprint(src, "lineitem", extra="t")
    # same size, same whole second, +1 nanosecond
    os.utime(p, ns=(1_000_000_000, 1_000_000_001))
    fp2 = catalog.source_fingerprint(src, "lineitem", extra="t")
    assert fp1 != fp2
    # replace the file atomically (new inode, same bytes, restored mtime)
    q = p + ".new"
    with open(q, "wb") as f:
        f.write(b"x" * 64)
    os.replace(q, p)
    os.utime(p, ns=(1_000_000_000, 1_000_000_001))
    fp3 = catalog.source_fingerprint(src, "lineitem", extra="t")
    assert fp3 != fp2
