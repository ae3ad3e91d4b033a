"""Salting primitives: results must be identical to the unsalted equivalents,
and the salted plans must actually spread keys (phase-1 groupBy includes the
salt)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from duckdb_fastlanes_spark.catalog import table
from duckdb_fastlanes_spark.functions.skew import (
    salted_agg,
    salted_join,
    top_key_frequencies,
)
from tests.conftest import SF_DIR


def _skewed(spark):
    """90% of rows share one key — the shape salting exists for."""
    return spark.range(0, 20_000).select(
        F.when(F.col("id") % 10 < 9, F.lit(7)).otherwise(F.col("id") % 100).alias("k"),
        (F.col("id") % 1000).cast("double").alias("v"),
    )


def test_salted_agg_matches_plain(spark):
    df = _skewed(spark)
    plain = {
        (r.k,): (r.s, r.n, r.mn, r.mx)
        for r in df.groupBy("k")
        .agg(
            F.sum("v").alias("s"),
            F.count("v").alias("n"),
            F.min("v").alias("mn"),
            F.max("v").alias("mx"),
        )
        .collect()
    }
    salted = {
        (r.k,): (r.s, r.n, r.mn, r.mx)
        for r in salted_agg(
            df,
            ["k"],
            {"s": ("v", "sum"), "n": ("v", "count"), "mn": ("v", "min"), "mx": ("v", "max")},
        ).collect()
    }
    assert salted == plain


def test_salted_agg_rejects_non_algebraic(spark):
    with pytest.raises(ValueError, match="non-algebraic"):
        salted_agg(_skewed(spark), ["k"], {"a": ("v", "avg")})


@pytest.mark.parametrize("how", ["inner", "left"])
def test_salted_join_matches_plain(spark, how):
    li = table(spark, SF_DIR, "lineitem").select("l_orderkey", "l_partkey", "l_quantity")
    p = table(spark, SF_DIR, "part").select("p_partkey", "p_brand")
    plain = sorted(
        map(
            tuple,
            li.join(p, li.l_partkey == p.p_partkey, how)
            .select("l_orderkey", "l_partkey", "l_quantity", "p_brand")
            .collect(),
        )
    )
    salted = sorted(
        map(
            tuple,
            salted_join(li, p, "l_partkey", "p_partkey", n_salts=8, how=how)
            .select("l_orderkey", "l_partkey", "l_quantity", "p_brand")
            .collect(),
        )
    )
    assert salted == plain


def test_salted_join_rejects_right(spark):
    li = table(spark, SF_DIR, "lineitem")
    p = table(spark, SF_DIR, "part")
    with pytest.raises(ValueError, match="inner/left"):
        salted_join(li, p, "l_partkey", "p_partkey", how="right")


def test_top_key_frequencies_finds_hot_key(spark):
    hot = top_key_frequencies(_skewed(spark), ["k"], top_n=1).collect()[0]
    assert hot.k == 7
    assert hot.n == 18_000


def test_min_label_propagation_components(spark):
    """Known graph: {1,2,3} one component, {4,5} another, {6} isolated via
    self-edge; labels converge to component minimums."""
    from duckdb_fastlanes_spark.functions.iterate import min_label_propagation

    edges = spark.createDataFrame(
        [(2, 1), (2, 3), (4, 5), (6, 6), (3, 7), (7, 8)], "a long, b long"
    )
    labels, n_iter = min_label_propagation(edges)
    got = {r.id: r.label for r in labels.collect()}
    assert got == {1: 1, 2: 1, 3: 1, 7: 1, 8: 1, 4: 4, 5: 4, 6: 6}
    assert 1 <= n_iter <= 10
