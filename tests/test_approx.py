"""Relative-error envelope for the approximate-aggregate sketches — the
hash-match oracle can't apply (estimates are engine-specific by design), so
this pins accuracy against the exact answers computed in the same query."""

from __future__ import annotations

from duckdb_fastlanes_spark import registry
from tests.conftest import SF_DIR


def test_approx_sketches_within_error_envelope(spark):
    # raw estimates (the registry query now emits certified booleans; this
    # keeps pinning the underlying sketch error on the raw values)
    from duckdb_fastlanes_spark.operators.relational_ext2 import approx_vs_exact

    rows = approx_vs_exact(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        # HLL++ at default rsd=5%; allow 3x headroom on tiny groups
        assert abs(r["approx_orders"] - r["exact_orders"]) <= max(
            0.15 * r["exact_orders"], 2
        )
        # percentile_approx with accuracy=10k is near-exact at test scale
        assert abs(r["approx_p50"] - r["exact_p50"]) <= 0.05 * r["exact_p50"]

    certified = registry.queries()["agg_approx_sketch"](spark, SF_DIR).collect()
    assert all(r["hll_in_envelope"] and r["p50_in_envelope"] for r in certified)


def test_srp_lsh_invariants(spark):
    """SRP-LSH: exact top-k of the probed buckets, deterministic, and with
    non-trivial overlap vs the exhaustive answer. The corpus is random
    gaussian vectors — every pairwise cosine sits near 0, the regime where
    hyperplane LSH carries the least signal — so the pinned floor is low;
    on clustered real embeddings P(bit match) = 1 − θ/π concentrates
    buckets and recall rises. The oracle already pins exactness of the
    candidates' cosines; this pins the ANN quality floor."""
    from duckdb_fastlanes_spark.registry import queries

    from tests.conftest import SF_DIR

    qs = queries()
    exact = [r.vec_id for r in qs["sim_bruteforce_topk"](spark, SF_DIR).collect()]
    srp1 = [(r.vec_id, r.cosine) for r in qs["sim_srp_lsh_topk"](spark, SF_DIR).collect()]
    srp2 = [(r.vec_id, r.cosine) for r in qs["sim_srp_lsh_topk"](spark, SF_DIR).collect()]
    assert srp1 == srp2  # md5-derived planes: fully deterministic
    assert len(srp1) == 10
    recall = len(set(exact) & {v for v, _ in srp1}) / len(exact)
    assert recall >= 0.1
