"""Z-order clustering: correctness-neutral layout + measurable 2-D pruning.

The operator's hash oracle (sweep) proves the layout never changes results;
these tests prove the layout actually BUYS something: the fraction of row
groups whose (l_partkey, l_suppkey) footer ranges intersect the query box
must be far smaller under the Morton layout than under a linear layout —
the physical mechanism behind the 100 TB claim in the operator docstring.
"""

from __future__ import annotations

import glob
import os
import tempfile

import pyarrow.parquet as pq
import pytest

from duckdb_fastlanes_spark.catalog import source_fingerprint, table
from tests.conftest import SF_DIR_MULTI as SF_DIR

BOX = {"l_partkey": (100, 299), "l_suppkey": (2, 5)}


def _intersecting_row_groups(files: list[str]) -> tuple[int, int]:
    """(intersecting, total) row groups whose column stats overlap BOX."""
    hit = total = 0
    for fp in files:
        md = pq.ParquetFile(fp).metadata
        names = {md.schema.column(i).name: i for i in range(md.num_columns)}
        for rg in range(md.num_row_groups):
            total += 1
            ok = True
            for col, (lo, hi) in BOX.items():
                st = md.row_group(rg).column(names[col]).statistics
                if st is None or st.min is None:
                    continue  # no stats → cannot prune → counts as a hit
                if st.min > hi or st.max < lo:
                    ok = False
                    break
            hit += ok
    return hit, total


def test_zorder_prunes_2d_box_vs_linear_layout(spark, tmp_path):
    from duckdb_fastlanes_spark import registry

    # build (or reuse) the operator's staged z-layout
    registry.queries()["scan_zorder_prune"](spark, SF_DIR).collect()
    tag = source_fingerprint(SF_DIR, "lineitem", extra="zorder_v2")
    zdir = os.path.join(tempfile.gettempdir(), f"dfs_zorder_li_{tag}")
    zfiles = glob.glob(os.path.join(zdir, "*.parquet"))
    assert zfiles, "z-order staging produced no files"

    # linear comparison layout: same columns, same file count, sorted by a
    # key the box does not constrain (the orderkey clustering every other
    # staged copy uses)
    ldir = str(tmp_path / "linear")
    li = table(spark, SF_DIR, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice", "l_quantity", "l_orderkey"
    )
    (
        li.repartitionByRange(len(zfiles), "l_orderkey")
        .sortWithinPartitions("l_orderkey")
        .drop("l_orderkey")
        .write.mode("overwrite")
        .parquet(ldir)
    )
    lfiles = glob.glob(os.path.join(ldir, "*.parquet"))

    z_hit, z_total = _intersecting_row_groups(zfiles)
    l_hit, l_total = _intersecting_row_groups(lfiles)
    # the linear layout cannot prune a (partkey, suppkey) box: every row
    # group spans the full key domains
    assert l_hit == l_total
    # the Morton layout must skip a decisive majority of row groups
    # (sf0.01 domains: partkey 0-1999, suppkey 0-99 -> the box is ~0.4%
    # of the key plane; a tight Morton layout touches only the curve
    # segments crossing it)
    assert z_total >= 8
    assert z_hit / z_total <= 0.25, (z_hit, z_total)


def test_zorder_interleave_expr_unit(spark):
    """The Morton expression interleaves bits exactly (spot values)."""
    from duckdb_fastlanes_spark.operators.scan import _zorder_expr

    rows = spark.sql(
        f"SELECT {_zorder_expr('x', 'y')} AS z FROM VALUES "
        "(0L, 0L), (1L, 0L), (0L, 1L), (3L, 5L) AS t(x, y)"
    ).collect()

    def morton(x, y, bits=21):
        z = 0
        for i in range(bits):
            z |= ((x >> i) & 1) << (2 * i)
            z |= ((y >> i) & 1) << (2 * i + 1)
        return z

    assert [r.z for r in rows] == [morton(0, 0), morton(1, 0), morton(0, 1), morton(3, 5)]
