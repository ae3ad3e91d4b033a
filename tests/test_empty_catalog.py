"""Empty-catalog robustness: every operator must either answer correctly on
zero-row tables or return a well-typed empty frame — never crash. These are
exactly the empty-partition / fresh-feed conditions a production pipeline
hits on day one. The full empty-catalog oracle sweep is recorded in
CORRECTNESS_EMPTY_r9.json (regenerate any time with
``python tools/check_correctness.py --empty --json=...``). The r8
agg_cube/agg_rollup divergence (Spark's native CUBE/ROLLUP emit no ANSI
grand-total grouping-set row over empty input) is CLOSED in r9: both are
now an explicit grouping-sets union whose global leg is a plain global
aggregate, which yields its one row on empty input in both engines."""

from __future__ import annotations

import os

import duckdb
import pytest

from duckdb_fastlanes_spark import registry
from tests.conftest import SF_DIR

TABLES = (
    "region nation customer supplier part orders lineitem "
    "events documents embeddings"
).split()

#: queries that crashed (not merely diverged) on empty input before the r8
#: guards, plus the NULL-vs-0 divergences fixed alongside them
GUARDED = [
    "agg_cube",
    "agg_rollup",
    "count_distinct",
    "graph_triangle_count",
    "subquery_quantified",
    "graph_pagerank",
    "window_distribution_scalable",
    "scan_hive_partition_prune",
    "sim_ivf_topk",
    "sim_ivf_batch_topk",
    "sim_ivf_probe2_topk",
    "sim_srp_lsh_topk",
    "sim_mmr_rerank",
    "sim_ivf_kmeans_topk",
    "fls_native_roundtrip",
    "fls_native_prune_scan",
    "fls_native_schema_evolution",
    "fls_native_adaptive_filter_scan",
]


@pytest.fixture(scope="module")
def empty_dir(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("empty_catalog"))
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet') LIMIT 0)"
            f" TO '{os.path.join(root, t)}.parquet' (FORMAT parquet)"
        )
    con.close()
    return root


@pytest.mark.parametrize("name", GUARDED)
def test_query_survives_empty_catalog(spark, empty_dir, name):
    df = registry.queries()[name](spark, empty_dir)
    rows = df.collect()
    assert isinstance(rows, list)  # no crash; schema resolvable
    assert len(df.schema.fields) > 0


@pytest.mark.parametrize("name", ["agg_cube", "agg_rollup"])
def test_rollup_cube_emit_ansi_grand_total_on_empty(spark, empty_dir, name):
    """ANSI (and DuckDB) semantics: the grand-total ``()`` grouping-set row
    exists even over a zero-row table — count 0, aggregates NULL."""
    rows = registry.queries()[name](spark, empty_dir).collect()
    assert len(rows) == 1
    (row,) = rows
    assert row[0] == "ALL" and row[1] == "ALL"
    assert row["n"] == 0
    assert row[3] is None  # sum/avg over empty input is NULL
