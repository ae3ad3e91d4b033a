"""Relative-error envelope for the approximate-aggregate sketches — the
hash-match oracle can't apply (estimates are engine-specific by design), so
this pins accuracy against the exact answers computed in the same query."""

from __future__ import annotations

from duckdb_fastlanes_spark import registry
from tests.conftest import SF_DIR


def test_approx_sketches_within_error_envelope(spark):
    rows = registry.queries()["agg_approx_sketch"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        # HLL++ at default rsd=5%; allow 3x headroom on tiny groups
        assert abs(r["approx_orders"] - r["exact_orders"]) <= max(
            0.15 * r["exact_orders"], 2
        )
        # percentile_approx with accuracy=10k is near-exact at test scale
        assert abs(r["approx_p50"] - r["exact_p50"]) <= 0.05 * r["exact_p50"]
