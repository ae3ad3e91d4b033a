"""Round-11 ADVICE regression tests.

Each test pins one of the r10 advisor findings closed this round:
1. graph_k_core: the per-round broadcast hint is GATED on the measured
   node count — small surviving sets still broadcast (plan check), while
   the unconditional-hint OOM hazard is gone (gate constant bounds the
   built relation).
2. _zorder_scaled_expr: keys above 2^21 no longer truncate — the domain
   scaling keeps high-bit-distinct keys distinct and maps the domain
   extremes onto the full bit budget.
3. sim_ndcg_eval: the ranking key is quantized to integer micro-units in
   BOTH dialects, so near-tied cosines (sub-micro-unit gaps) fall to the
   deterministic vec_id tiebreak identically in Spark and DuckDB.
4. BMP/WAV quantization: Spark SQL round() and DuckDB round() agree on
   the representable-boundary double where Python's floor(x + 0.5)
   diverges — the primitive the codecs now share engine-side.
"""

from __future__ import annotations

import math

import duckdb

from duckdb_fastlanes_spark import registry
from duckdb_fastlanes_spark.operators.scan import _zorder_scaled_expr
from duckdb_fastlanes_spark.plans.checks import explain_str
from tests.conftest import SF_DIR

BOUNDARY = 0.49999999999999994  # x + 0.5 == 1.0 in IEEE, round(x) == 0


def test_kcore_small_set_still_broadcasts(spark):
    """With the gate in place, a tiny surviving-node set (sf0.001) must
    still ride a broadcast — the gate changes the OOM hazard, not the
    small-scale plan."""
    df = registry.queries()["graph_k_core"](spark, SF_DIR)
    assert "BroadcastHashJoin" in explain_str(df, "simple")


def test_zorder_scaling_keeps_high_bits(spark):
    dom = {"a": (0, 1 << 26), "b": (0, 7)}
    expr = _zorder_scaled_expr("a", "b", dom)
    rows = spark.sql(
        f"SELECT a, b, {expr} AS z FROM VALUES "
        f"(CAST(0 AS BIGINT), CAST(0 AS BIGINT)), "
        f"({1 << 24}, 0), ({1 << 25}, 0), ({1 << 26}, 7) AS t(a, b)"
    ).collect()
    z = {(r.a, r.b): r.z for r in rows}
    # domain extremes hit the budget extremes: (min,min) -> 0, and
    # (max,max) has every interleaved bit set
    assert z[(0, 0)] == 0
    top = (1 << 21) - 1
    expect_max = sum(
        (1 << (2 * i)) + (1 << (2 * i + 1)) for i in range(21) if (top >> i) & 1
    )
    assert z[(1 << 26, 7)] == expect_max
    # keys differing ONLY above bit 21 stay distinct (the r10 truncation
    # collapsed them: low 21 bits of 2^24 and 2^25 are both 0)
    assert z[(1 << 24, 0)] != z[(1 << 25, 0)]
    assert 0 < z[(1 << 24, 0)] < z[(1 << 25, 0)]


def test_ndcg_near_tie_ranks_by_vec_id_both_engines(spark):
    """Two pool vectors whose cosines to the query differ far below one
    micro-unit must rank by vec_id in BOTH engines (the quantized ORDER BY
    erases the cross-engine ulp divergence that raw doubles exposed)."""
    # q = [1, 0]; p10/p11 near-tied at cosine ~1 (gap ~5e-19), p12 clearly
    # worse — the near-tied pair must order 10 before 11 in both engines.
    vecs = [(10, [1.0, 1e-9]), (11, [1.0, -1e-9]), (12, [0.6, 0.8])]
    spark_rows = spark.sql(
        """
        WITH p AS (SELECT * FROM VALUES
            (10, array(1.0D, 1e-9D)), (11, array(1.0D, -1e-9D)),
            (12, array(0.6D, 0.8D)) AS t(vec_id, e)),
        s AS (SELECT vec_id,
                     aggregate(zip_with(array(1.0D, 0.0D), e, (x, y) -> x * y),
                               0D, (a, x) -> a + x)
                     / (sqrt(aggregate(array(1.0D, 0.0D), 0D, (a, x) -> a + x * x))
                        * sqrt(aggregate(e, 0D, (a, x) -> a + x * x))) AS cos
              FROM p)
        SELECT vec_id, row_number() OVER (
            ORDER BY CAST(round(cos * 1000000, 0) AS BIGINT) DESC, vec_id
        ) AS rk FROM s
        """
    ).collect()
    spark_rank = {r.vec_id: r.rk for r in spark_rows}

    con = duckdb.connect()
    duck_rows = con.execute(
        """
        WITH p AS (SELECT * FROM (VALUES
            (10, [1.0, 1e-9]), (11, [1.0, -1e-9]),
            (12, [0.6, 0.8])) t(vec_id, e))
        SELECT vec_id, row_number() OVER (
            ORDER BY CAST(round(list_cosine_similarity(
                CAST([1.0, 0.0] AS DOUBLE[]), CAST(e AS DOUBLE[])) * 1000000, 0)
                AS BIGINT) DESC, vec_id
        ) AS rk FROM p
        """
    ).fetchall()
    duck_rank = dict(duck_rows)
    assert spark_rank == duck_rank == {10: 1, 11: 2, 12: 3}
    assert len(vecs) == 3


def test_round_primitive_parity_on_boundary_double(spark):
    """The exact double just below 0.5: both engines' round() keep it at 0;
    Python's floor(x + 0.5) — the primitive the codecs used until r11 —
    rounds it UP. Pins why quantization moved engine-side."""
    s = spark.sql(f"SELECT CAST(round({BOUNDARY!r}D, 0) AS BIGINT) AS v").first().v
    d = duckdb.sql(f"SELECT CAST(round({BOUNDARY!r}, 0) AS BIGINT) AS v").fetchone()[0]
    assert s == d == 0
    assert math.floor(BOUNDARY + 0.5) == 1  # the removed primitive diverges
