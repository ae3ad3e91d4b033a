"""Property tests for the deterministic sampling / split operators.

The property that matters at scale: membership is CONTENT-KEYED, so the
same row lands in the same sample/split regardless of partition layout —
the invariant engine-native USING SAMPLE / df.sample cannot give.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from duckdb_fastlanes_spark.catalog import table
from duckdb_fastlanes_spark.operators.sampling import (
    sample_bernoulli_hash,
    sample_stratified_quota,
    split_train_val_test,
    _bucket,
)
from tests.conftest import SF_DIR, SF_DIR_MULTI


def test_bernoulli_fraction_and_determinism(spark):
    orders = table(spark, SF_DIR_MULTI, "orders")
    n_total = orders.count()
    sample = sample_bernoulli_hash(spark, SF_DIR_MULTI)
    n = sample.count()
    # md5 buckets are uniform: 10% ± 2 percentage points at 15k rows
    assert abs(n / n_total - 0.10) < 0.02
    # byte-identical across runs (no rand(), no partition dependence)
    again = {r.o_orderkey for r in sample.collect()}
    assert {r.o_orderkey for r in sample.collect()} == again


def test_bernoulli_partition_invariance(spark):
    orders = table(spark, SF_DIR_MULTI, "orders")
    base = {
        r.o_orderkey
        for r in orders.filter(_bucket("o_orderkey") < 10).collect()
    }
    reparted = {
        r.o_orderkey
        for r in orders.repartition(13).filter(_bucket("o_orderkey") < 10).collect()
    }
    assert base == reparted


def test_stratified_quota_per_stratum(spark):
    rows = sample_stratified_quota(spark, SF_DIR_MULTI).collect()
    per_lang: dict[str, int] = {}
    for r in rows:
        per_lang[r.lang] = per_lang.get(r.lang, 0) + 1
    sizes = {
        r.lang: r.n
        for r in table(spark, SF_DIR_MULTI, "documents")
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert per_lang  # non-vacuous
    for lang, n in per_lang.items():
        assert n == min(40, sizes[lang])


def test_split_covers_everything_and_ratios(spark):
    docs = table(spark, SF_DIR_MULTI, "documents")
    n_total = docs.count()
    rows = split_train_val_test(spark, SF_DIR_MULTI).collect()
    by_split: dict[str, int] = {}
    for r in rows:
        by_split[r.split] = by_split.get(r.split, 0) + r.n_docs
    assert sum(by_split.values()) == n_total  # partition of the corpus
    assert by_split["train"] / n_total > 0.9
    assert 0 < by_split.get("val", 0) < 0.1 * n_total
    assert 0 < by_split.get("test", 0) < 0.1 * n_total


def test_keep_best_is_longest_member(spark):
    from duckdb_fastlanes_spark.pipeline.dedup import (
        dedup_cluster_cc,
        dedup_keep_best,
    )

    clusters = dedup_cluster_cc(spark, SF_DIR).alias("c")
    docs = table(spark, SF_DIR, "documents").select("doc_id", "n_chars")
    best = {r.cluster_id: r.keep_doc_id for r in dedup_keep_best(spark, SF_DIR).collect()}
    assert best  # non-vacuous at sf0.001
    member_rows = clusters.join(docs, "doc_id").collect()
    chars = {r.doc_id: r.n_chars for r in member_rows}
    by_cluster: dict[int, list[int]] = {}
    for r in member_rows:
        by_cluster.setdefault(r.cluster_id, []).append(r.doc_id)
    for cid, members in by_cluster.items():
        want = sorted(members, key=lambda d: (-chars[d], d))[0]
        assert best[cid] == want


def test_leakage_safe_split_keeps_near_dups_together(spark):
    """The defining invariant: every verified near-dup pair lands in ONE
    split — the naive per-doc split (split_train_val_test) cannot promise
    this; the cluster-keyed one must."""
    from duckdb_fastlanes_spark.operators.sampling import split_leakage_safe
    from duckdb_fastlanes_spark.pipeline.dedup import dedup_minhash_lsh

    splits = split_leakage_safe(spark, SF_DIR).select("doc_id", "split")
    pairs = dedup_minhash_lsh(spark, SF_DIR).select("doc_a", "doc_b")
    crossing = (
        pairs.join(splits.withColumnRenamed("doc_id", "doc_a"), "doc_a")
        .withColumnRenamed("split", "split_a")
        .join(splits.withColumnRenamed("doc_id", "doc_b"), "doc_b")
        .filter(F.col("split_a") != F.col("split"))
    )
    assert crossing.count() == 0
    # and the split still covers every document exactly once
    n_docs = table(spark, SF_DIR, "documents").count()
    assert splits.count() == n_docs
