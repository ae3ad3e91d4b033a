"""Deterministic sampling and dataset-split operators.

The reference's engine layer exposes ``USING SAMPLE`` (DuckDB v1.3.2 core,
SURVEY.md §2.C "Sampling" — marked ➖ there because engine-native sampling is
nondeterministic across runs/partitionings, so it cannot be oracle-hashed).
These operators provide the production alternative used by training-data
pipelines: CONTENT-KEYED sampling, where membership depends only on a key
hash, never on partition layout, executor count, or visit order. That makes
the sample (a) reproducible across engines — the DuckDB oracle computes the
identical subset — and (b) stable under re-partitioning at any scale, which
``df.sample``/``USING SAMPLE`` are not.

Scale design: every operator here is a row-local projection/filter (hash =
md5 of the key), so sampling and split assignment add ZERO shuffles to the
plans they feed; stratified sampling adds the one per-stratum shuffle its
semantics require.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from duckdb_fastlanes_spark.catalog import table
from duckdb_fastlanes_spark.registry import register

#: per-cent bucket from the first 4 hex digits of md5(key) — the same
#: md5-prefix integer decode both engines already share in dedup_simhash
_BUCKET_SQL = "CAST(concat('0x', substr(md5(CAST({key} AS VARCHAR)), 1, 4)) AS INTEGER) % 100"


def _bucket(key) -> F.Column:
    return (
        F.conv(F.substring(F.md5(F.col(key).cast("string")), 1, 4), 16, 10).cast("int")
        % 100
    )


@register(
    "sample_bernoulli_hash",
    oracle=f"""
    SELECT o_orderkey, round(o_totalprice, 2) AS price
    FROM orders
    WHERE {_BUCKET_SQL.format(key="o_orderkey")} < 10
    ORDER BY o_orderkey
    """,
)
def sample_bernoulli_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """~10% Bernoulli sample keyed on md5(o_orderkey): deterministic,
    engine- and partitioning-independent (the ``USING SAMPLE`` analogue a
    reproducible pipeline actually wants). Pure row-local filter — no
    shuffle, pushes below any downstream operator."""
    o = table(spark, sf_dir, "orders")
    return (
        o.filter(_bucket("o_orderkey") < 10)
        .select("o_orderkey", F.round("o_totalprice", 2).alias("price"))
        .orderBy("o_orderkey")
    )


@register(
    "sample_stratified_quota",
    oracle="""
    SELECT doc_id, lang
    FROM (
        SELECT doc_id, lang,
               row_number() OVER (
                   PARTITION BY lang
                   ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
               ) AS rn
        FROM documents
    )
    WHERE rn <= 40
    ORDER BY lang, doc_id
    """,
)
def sample_stratified_quota(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quota-stratified sample (vs pipeline.curation.sample_stratified's
    per-stratum RATES): exactly min(40, |stratum|) docs per language,
    chosen by hash order (unbiased w.r.t. any data ordering, reproducible).
    One shuffle on the stratum key; for a skew-heavy stratum at scale the
    per-partition pre-top-k in operators/windows (top-k pattern) bounds the
    sort input, since only 40 hash-smallest rows per partition can win."""
    from pyspark.sql.window import Window

    d = table(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    return (
        d.select("doc_id", "lang", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= 40)
        .select("doc_id", "lang")
        .orderBy("lang", "doc_id")
    )


@register(
    "split_train_val_test",
    oracle=f"""
    SELECT lang, split, count(*) AS n_docs, round(avg(n_chars), 2) AS avg_chars
    FROM (
        SELECT lang, n_chars,
               CASE WHEN {_BUCKET_SQL.format(key="doc_id")} < 96 THEN 'train'
                    WHEN {_BUCKET_SQL.format(key="doc_id")} < 98 THEN 'val'
                    ELSE 'test' END AS split
        FROM documents
    )
    GROUP BY lang, split
    ORDER BY lang, split
    """,
)
def split_train_val_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 96/2/2 train/val/test assignment keyed on md5(doc_id) —
    the split a document lands in never changes as the corpus grows or
    repartitions, so eval contamination cannot creep in across pipeline
    re-runs. Assignment is a row-local CASE; the summary here is one
    bounded-key aggregate (langs × 3 splits)."""
    from duckdb_fastlanes_spark.functions.ordering import ordered_small

    d = table(spark, sf_dir, "documents")
    b = _bucket("doc_id")
    split = (
        F.when(b < 96, "train").when(b < 98, "val").otherwise("test").alias("split")
    )
    return ordered_small(
        d.select("lang", "n_chars", split)
        .groupBy("lang", "split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg("n_chars"), 2).alias("avg_chars"),
        ),
        "lang",
        "split",
    )


def _leakage_safe_oracle() -> str:
    from duckdb_fastlanes_spark.pipeline.dedup import _ORACLE_CC_CTES

    ckey = "coalesce(c.cluster_id, d.doc_id)"
    return f"""
    WITH RECURSIVE {_ORACLE_CC_CTES}
    SELECT d.doc_id, {ckey} AS cluster_key,
           CASE WHEN {_BUCKET_SQL.format(key=ckey)} < 96 THEN 'train'
                WHEN {_BUCKET_SQL.format(key=ckey)} < 98 THEN 'val'
                ELSE 'test' END AS split
    FROM documents d LEFT JOIN clusters c ON d.doc_id = c.doc_id
    ORDER BY d.doc_id
    """


@register(
    "split_leakage_safe",
    oracle=_leakage_safe_oracle(),
)
def split_leakage_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe train/val/test split: the 96/2/2 hash split is keyed on
    the NEAR-DUP CLUSTER id (min doc_id of the connected component over the
    verified MinHash-LSH pair graph; singletons key on their own doc_id), so
    a document and its near-duplicates always land in the SAME split — the
    property a naive per-doc split violates, silently leaking train text
    into eval. This is the standard contamination control for LLM corpora.

    Scale shape: clustering is the iterative CC already used by
    dedup_cluster_cc (O(component diameter) join+agg rounds); the cluster
    labels (only docs that HAVE a near-dup, a small fraction of the corpus)
    broadcast-join back onto the full corpus, and split assignment itself is
    a row-local md5 CASE — no extra shuffle at any corpus size."""
    from duckdb_fastlanes_spark.functions.iterate import (
        cc_edge_width,
        min_label_propagation,
    )
    from duckdb_fastlanes_spark.functions.ordering import ordered_small
    from duckdb_fastlanes_spark.pipeline.dedup import dedup_minhash_lsh

    pairs = dedup_minhash_lsh(spark, sf_dir).select(
        F.col("doc_a").alias("a"), F.col("doc_b").alias("b")
    )
    labels, _ = min_label_propagation(pairs, width=cc_edge_width(spark, sf_dir))
    d = table(spark, sf_dir, "documents")
    joined = d.join(
        F.broadcast(labels.withColumnRenamed("id", "doc_id")), "doc_id", "left"
    ).select(
        "doc_id", F.coalesce("label", "doc_id").alias("cluster_key")
    )
    b = _bucket("cluster_key")
    return ordered_small(
        joined.select(
            "doc_id",
            "cluster_key",
            F.when(b < 96, "train").when(b < 98, "val").otherwise("test").alias("split"),
        ),
        "doc_id",
    )


#: uniform in (0,1) from the first 8 hex digits of md5(key): (v + 0.5) / 2^32
_UNIF_SQL = (
    "(CAST(concat('0x', substr(md5(CAST({key} AS VARCHAR)), 1, 8)) AS BIGINT)"
    " + 0.5) / 4294967296.0"
)


@register(
    "sample_weighted",
    oracle=f"""
    SELECT doc_id, n_chars,
           round(ln({_UNIF_SQL.format(key="doc_id")}) / n_chars, 9) AS key
    FROM documents
    WHERE n_chars > 0
    ORDER BY key DESC, doc_id
    LIMIT 100
    """,
)
def sample_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling without replacement (Efraimidis–Spirakis A-ES):
    each row draws key = ln(u)/w with u a DETERMINISTIC hash-uniform and
    w = n_chars; the global top-k by key IS an exact weighted sample —
    longer documents proportionally more likely. The length-balanced
    subcorpus draw a training pipeline uses instead of naive Bernoulli.

    Scale shape: embarrassingly parallel scoring (row-local md5, no rand(),
    reproducible across retries/speculative tasks — rand() is NOT stable
    under task replay, hash-uniforms are), then TakeOrderedAndProject top-k:
    per-partition heaps, no global sort, no extra shuffle. ln(u)/w is the
    log-domain form of u^(1/w) — same ordering, no underflow at large w.
    """
    d = table(spark, sf_dir, "documents").where(F.col("n_chars") > 0)
    u = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10).cast(
            "bigint"
        )
        + 0.5
    ) / F.lit(4294967296.0)
    return (
        d.select(
            "doc_id",
            "n_chars",
            F.round(F.log(u) / F.col("n_chars"), 9).alias("key"),
        )
        .orderBy(F.desc("key"), "doc_id")
        .limit(100)
    )


@register(
    "sample_oversample_minority",
    oracle="""
    WITH weighted AS (
        SELECT event_type,
               CASE event_type WHEN 'error' THEN 5 WHEN 'signup' THEN 3
                    ELSE 1 END AS w
        FROM events
    ),
    expanded AS (
        SELECT event_type FROM weighted, LATERAL unnest(range(0, w))
    )
    SELECT event_type, count(*) AS n_after
    FROM expanded GROUP BY event_type ORDER BY event_type
    """,
)
def sample_oversample_minority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic class rebalancing by integer replication: minority
    classes (error ×5, signup ×3) are repeated via explode(sequence(...)) —
    no randomness, so every re-run and every engine produces the identical
    resampled corpus (the reproducibility a training pipeline needs;
    fractional weights decompose into floor(w) replicas + one hash-Bernoulli
    row, the sampling family's idiom). Row-local fan-out: no shuffle until
    the audit count."""
    ev = table(spark, sf_dir, "events")
    w = (
        F.when(F.col("event_type") == "error", 5)
        .when(F.col("event_type") == "signup", 3)
        .otherwise(1)
    )
    expanded = ev.select(
        "event_type", F.explode(F.sequence(F.lit(1), w)).alias("_r")
    )
    return (
        expanded.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_after"))
        .orderBy("event_type")
    )


N_SHARDS = 8


@register(
    "shard_deterministic_shuffle",
    oracle=f"""
    SELECT doc_id, shard,
           CAST(row_number() OVER (
               PARTITION BY shard ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
           ) AS BIGINT) AS pos
    FROM (
        SELECT doc_id,
               {_BUCKET_SQL.format(key="doc_id")} % {N_SHARDS} AS shard
        FROM documents
    )
    ORDER BY shard, pos
    """,
)
def shard_deterministic_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global shuffle into {N_SHARDS} training shards: shard =
    md5-bucket(doc_id), position = rank of md5(doc_id) within the shard. The
    training-data writer's last step — a reproducible, content-keyed order
    (no RNG, no partition dependence), so every re-run of the pipeline and
    every engine emits byte-identical shards, and a resumed training job
    sees the same sequence.

    Scale shape: one shuffle on the shard key, then a per-shard sort — at
    100 TB the shard count is chosen so each shard sorts in one task's
    memory (shards ≈ executors × k), which is exactly how training shards
    are sized in practice. No global total order is ever materialized: the
    ORDER BY here is per-shard (pos) and only for the bounded test output.
    """
    d = table(spark, sf_dir, "documents")
    md5 = F.md5(F.col("doc_id").cast("string"))
    shard = (_bucket("doc_id") % N_SHARDS).alias("shard")
    w = Window.partitionBy("shard").orderBy(md5, "doc_id")
    return (
        d.select("doc_id", shard)
        .withColumn("pos", F.row_number().over(w).cast("bigint"))
        .orderBy("shard", "pos")
    )
