"""Invariant tests for the corpus-curation operators (pipeline/curation.py) —
the hash-match oracle pins exact values; these pin the semantic guarantees a
pipeline relies on (packing conservation, quantization error bound, sampling
determinism, redaction completeness)."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from duckdb_fastlanes_spark import registry
from duckdb_fastlanes_spark.catalog import table
from duckdb_fastlanes_spark.pipeline.curation import EVAL_MOD, PACK_CTX, STRATA_RATES
from tests.conftest import SF_DIR

QUERIES = registry.queries()


def test_pack_sequences_conserves_docs_and_tokens(spark):
    out = QUERIES["pack_sequences"](spark, SF_DIR).collect()
    d = table(spark, SF_DIR, "documents")
    n_docs = d.count()
    assert sum(r["n_docs"] for r in out) == n_docs
    # bins are contiguous from 0 within each source
    by_src: dict[str, list[int]] = {}
    for r in out:
        by_src.setdefault(r["source"], []).append(r["bin_id"])
    for bins in by_src.values():
        assert sorted(bins) == list(range(len(bins)))
    # a bin's docs all start inside its [bin*CTX, (bin+1)*CTX) offset range,
    # so no bin (except via one straddling doc) wildly overshoots: each bin's
    # token total is bounded by CTX + the longest doc in it
    assert all(r["bin_tokens"] > 0 for r in out)


def test_quantization_error_bounded_by_half_scale(spark):
    out = QUERIES["embedding_quantize_int8"](spark, SF_DIR).collect()
    assert out and all(r["q_max"] <= 127 for r in out)
    # nearest-multiple reconstruction ⇒ |err| ≤ scale/2 (+ rounding slack)
    assert all(r["max_abs_err"] <= r["scale"] / 2 + 1e-6 for r in out)


def test_stratified_sampling_is_deterministic_and_hash_based(spark):
    rows1 = QUERIES["sample_stratified"](spark, SF_DIR).collect()
    rows2 = QUERIES["sample_stratified"](spark, SF_DIR).collect()
    assert sorted(map(tuple, rows1)) == sorted(map(tuple, rows2))
    for r in rows1[:50]:
        u = int(hashlib.md5(str(r["doc_id"]).encode()).hexdigest()[:8], 16) / 4294967295.0
        assert r["sampled"] == (u < STRATA_RATES.get(r["lang"], 1.0))


def test_contamination_excludes_eval_docs(spark):
    out = QUERIES["contamination_ngram"](spark, SF_DIR)
    assert out.filter(F.col("doc_id") % EVAL_MOD == 0).count() == 0


def test_pii_redaction_leaves_no_digits(spark):
    out = QUERIES["pii_redact"](spark, SF_DIR)
    assert out.filter(F.col("name_redacted").rlike("[0-9]")).count() == 0
    assert out.filter(F.length("pseudonym") != 12).count() == 0


def test_pack_bin_start_offsets_respect_ctx(spark):
    # recompute offsets independently and check bin assignment
    d = table(spark, SF_DIR, "documents")
    rows = (
        d.select(
            "source",
            "doc_id",
            F.size(
                F.regexp_extract_all(F.lower("text"), F.lit(r"[a-z0-9]+"), F.lit(0))
            ).alias("n"),
        )
        .orderBy("source", "doc_id")
        .collect()
    )
    bins: dict[tuple[str, int], int] = {}
    off: dict[str, int] = {}
    for r in rows:
        start = off.get(r["source"], 0)
        bins[(r["source"], r["doc_id"])] = start // PACK_CTX
        off[r["source"]] = start + r["n"]
    out = QUERIES["pack_sequences"](spark, SF_DIR).collect()
    for r in out:
        assert bins[(r["source"], r["first_doc"])] == r["bin_id"]
        assert bins[(r["source"], r["last_doc"])] == r["bin_id"]
