"""Text analysis operators over the ``documents`` table.

All four (language-ID, quality scoring, token counting, fingerprinting) are
pure JVM-side column expressions — no Python UDFs — so they whole-stage-codegen
and scale linearly with input partitions; nothing shuffles except the final
oracle-friendly ordering.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from duckdb_fastlanes_spark.catalog import table
from duckdb_fastlanes_spark.registry import register

#: marker stopwords per language for the n-gram-ish heuristic language ID.
#: Deterministic + SQL-expressible on both engines (word-boundary regex counts).
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "a"],
    "es": ["el", "la", "de", "que"],
    "de": ["der", "die", "und", "das"],
}

#: BPE-ish tokenizer regex: words, numbers, or single non-space symbols
TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

STOPWORDS = ["the", "a", "and", "of", "to", "in", "is", "it"]


def _marker_count(text: Column, word: str) -> Column:
    return F.size(F.regexp_extract_all(text, F.lit(rf"\b{word}\b"), F.lit(0)))


def _oracle_marker(word: str) -> str:
    return rf"len(regexp_extract_all(lower(text), '\b{word}\b'))"


def _oracle_lang_score(lang: str) -> str:
    return " + ".join(_oracle_marker(w) for w in LANG_MARKERS[lang])


@register(
    "text_token_count",
    oracle=f"""
    SELECT
        doc_id,
        len(regexp_extract_all(text, '{TOKEN_RE}'))     AS n_tokens,
        len(regexp_extract_all(text, '[A-Za-z]+'))       AS n_words,
        length(text)                                     AS n_chars_measured,
        n_chars                                          AS n_chars_recorded
    FROM documents
    """,
)
def text_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting: whitespace-free BPE-ish regex token count + word count,
    validated against the recorded n_chars column."""
    d = table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.size(F.regexp_extract_all("text", F.lit(TOKEN_RE), F.lit(0))).alias("n_tokens"),
        F.size(F.regexp_extract_all("text", F.lit(r"[A-Za-z]+"), F.lit(0))).alias("n_words"),
        F.length("text").alias("n_chars_measured"),
        F.col("n_chars").alias("n_chars_recorded"),
    )


@register(
    "text_quality_score",
    oracle="""
    SELECT
        doc_id,
        round(CAST(len(regexp_extract_all(text, '[[:punct:]]')) AS DOUBLE)
              / greatest(length(text), 1), 4)                                    AS punct_ratio,
        round(CAST(len(regexp_extract_all(lower(text),
              '\\b(the|a|and|of|to|in|is|it)\\b')) AS DOUBLE)
              / greatest(len(regexp_extract_all(text, '[A-Za-z]+')), 1), 4)      AS stopword_ratio,
        round(CAST(length(text) AS DOUBLE)
              / greatest(len(regexp_extract_all(text, '[A-Za-z]+')), 1), 4)      AS chars_per_word,
        (length(text) BETWEEN 64 AND 4096)
          AND (len(regexp_extract_all(text, '[A-Za-z]+')) >= 10)                  AS passes_quality
    FROM documents
    """,
)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring: punctuation ratio, stopword ratio, mean word length,
    and a composite keep/drop gate — the standard pretraining-corpus filters.
    Single-parse Spark-dialect SQL body (\\p{Punct} is the Java-regex twin
    of the oracle's POSIX [[:punct:]])."""
    from duckdb_fastlanes_spark.catalog import sql_q

    stop_re = r"\\b(" + "|".join(STOPWORDS) + r")\\b"
    nw = "size(regexp_extract_all(text, '[A-Za-z]+', 0))"
    return sql_q(
        spark,
        sf_dir,
        f"""
        SELECT doc_id,
               round(CAST(size(regexp_extract_all(text, '[\\\\p{{Punct}}]', 0)) AS DOUBLE)
                     / greatest(length(text), 1), 4) AS punct_ratio,
               round(CAST(size(regexp_extract_all(lower(text), '{stop_re}', 0)) AS DOUBLE)
                     / greatest({nw}, 1), 4) AS stopword_ratio,
               round(CAST(length(text) AS DOUBLE) / greatest({nw}, 1), 4) AS chars_per_word,
               (length(text) BETWEEN 64 AND 4096) AND ({nw} >= 10) AS passes_quality
        FROM documents
        """,
    )


@register(
    "text_lang_id",
    oracle=f"""
    SELECT
        doc_id,
        lang AS lang_recorded,
        CASE
            WHEN {_oracle_lang_score("en")} >= {_oracle_lang_score("es")}
             AND {_oracle_lang_score("en")} >= {_oracle_lang_score("de")}
             AND {_oracle_lang_score("en")} > 0 THEN 'en'
            WHEN {_oracle_lang_score("es")} >= {_oracle_lang_score("de")}
             AND {_oracle_lang_score("es")} > 0 THEN 'es'
            WHEN {_oracle_lang_score("de")} > 0 THEN 'de'
            ELSE 'und'
        END AS lang_detected
    FROM documents
    """,
)
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic language ID: count language-marker stopword hits per language,
    argmax with fixed tie order (en > es > de), 'und' when no marker hits.
    The real-world version swaps the marker table for char-n-gram profiles —
    same plan shape (pure projection, no shuffle)."""
    d = table(spark, sf_dir, "documents")
    low = F.lower(F.col("text"))
    scores = {
        lang: sum(
            (_marker_count(low, w) for w in words[1:]),
            _marker_count(low, words[0]),
        )
        for lang, words in LANG_MARKERS.items()
    }
    en, es, de = scores["en"], scores["es"], scores["de"]
    detected = (
        F.when((en >= es) & (en >= de) & (en > 0), "en")
        .when((es >= de) & (es > 0), "es")
        .when(de > 0, "de")
        .otherwise("und")
    )
    return d.select("doc_id", F.col("lang").alias("lang_recorded"), detected.alias("lang_detected"))


@register(
    "text_fingerprint",
    oracle="""
    SELECT
        doc_id,
        md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g')))          AS content_fp,
        CAST(concat('0x', substr(md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g'))), 1, 15)) AS BIGINT) AS fp64
    FROM documents
    """,
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting: whitespace/case-normalized md5 content hash +
    a 60-bit integer fingerprint (hex-sliced) for compact storage/joins."""
    d = table(spark, sf_dir, "documents")
    norm = F.lower(F.regexp_replace(F.trim(F.col("text")), r"\s+", " "))
    fp = F.md5(norm)
    return d.select(
        "doc_id",
        fp.alias("content_fp"),
        F.conv(F.substring(fp, 1, 15), 16, 10).cast("bigint").alias("fp64"),
    )


@register(
    "text_token_count_udf",
    oracle="""
    SELECT doc_id,
           len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS n_tokens,
           len(text)                                         AS n_chars
    FROM documents
    ORDER BY doc_id
    """,
)
def text_token_count_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The §2.C UDF-surface row with a verifiable oracle: the same token count
    as text_token_count, computed in a vectorized Arrow pandas_udf instead of
    JVM built-ins. Demonstrates the Python hot path done right — one Arrow
    batch per ~10k rows crossing the boundary, pandas .str vectorized ops —
    while the hash-match against DuckDB pins its semantics. (Prefer the
    JVM-side variant when expressible; this exists because the reference's
    extension API — its own read_fls/COPY registration, src/read_fls.cpp:45 —
    maps to Spark's UDF/DataSource surface.)"""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("int")
    def count_tokens(texts: pd.Series) -> pd.Series:
        return texts.str.lower().str.count(r"[a-z0-9]+").astype("int32")

    @pandas_udf("int")
    def count_chars(texts: pd.Series) -> pd.Series:
        return texts.str.len().astype("int32")

    d = table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        count_tokens("text").alias("n_tokens"),
        count_chars("text").alias("n_chars"),
    ).orderBy("doc_id")


@register(
    "text_tfidf_top_terms",
    oracle="""
    WITH toks AS (
        SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term
        FROM documents WHERE doc_id < 100
    ),
    tf AS (
        SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2
    ),
    df AS (
        SELECT term, count(DISTINCT doc_id) AS df FROM toks GROUP BY 1
    ),
    n AS (SELECT count(DISTINCT doc_id) AS n_docs FROM toks),
    scored AS (
        SELECT tf.doc_id, tf.term,
               round(tf.tf * ln((SELECT n_docs FROM n) / df.df), 4) AS tfidf
        FROM tf JOIN df USING (term)
    ),
    ranked AS (
        SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, term) AS rk
        FROM scored
    )
    SELECT doc_id, term, tfidf FROM ranked WHERE rk <= 3
    ORDER BY doc_id, tfidf DESC, term
    """,
)
def text_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document top-3 TF-IDF terms: token explode → TF per (doc, term) →
    DF per term (broadcast back — the term dictionary is tiny relative to the
    corpus) → score → per-doc ranking window. The canonical keyword-extraction
    shape for a training-data pipeline; every step is a partial-aggregated
    shuffle on (doc, term) or term."""
    from duckdb_fastlanes_spark.catalog import sql_q

    return sql_q(
        spark,
        sf_dir,
        """
        WITH toks AS (
            SELECT doc_id,
                   explode(regexp_extract_all(lower(text), '[a-z0-9]+', 0))
                     AS term
            FROM documents WHERE doc_id < 100),
        tf AS (SELECT doc_id, term, count(1) AS tf
               FROM toks GROUP BY doc_id, term),
        df AS (SELECT term, count(DISTINCT doc_id) AS df
               FROM toks GROUP BY term),
        nd AS (SELECT count(DISTINCT doc_id) AS n_docs FROM toks),
        scored AS (
            SELECT /*+ BROADCAST(df), BROADCAST(nd) */ doc_id, tf.term,
                   round(tf * log(n_docs / df), 4) AS tfidf
            FROM tf JOIN df ON tf.term = df.term CROSS JOIN nd)
        SELECT doc_id, term, tfidf
        FROM (SELECT *, row_number() OVER (PARTITION BY doc_id
                                           ORDER BY tfidf DESC, term) AS rk
              FROM scored)
        WHERE rk <= 3
        ORDER BY doc_id, tfidf DESC, term
        """,
    )


#: BM25 hyperparameters (Robertson defaults) + a fixed keyword query over the
#: corpus vocabulary; scores are quantized to integer micro-units BEFORE the
#: per-doc sum so both engines add exact integers (float addition is not
#: associative — summing raw doubles in different orders flips last-ulp bits
#: and therefore the driver's value-repr hash)
BM25_K1 = 1.2
BM25_B = 0.75
BM25_TERMS = ("vector", "hash", "join")
BM25_TOPK = 15


@register(
    "text_bm25_topk",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS w
        FROM documents
    ),
    dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY 1),
    stats AS (
        SELECT count(*) AS n_docs, CAST(sum(dl) AS BIGINT) AS tot_dl FROM dl
    ),
    tf AS (
        SELECT doc_id, w, count(*) AS tf FROM toks
        WHERE w IN {BM25_TERMS!r} GROUP BY 1, 2
    ),
    dft AS (SELECT w, count(*) AS df FROM tf GROUP BY 1),
    scored AS (
        SELECT t.doc_id,
               CAST(round(
                   ln(1.0 + (s.n_docs - d.df + 0.5) / (d.df + 0.5))
                   * (t.tf * (1.0 + {BM25_K1}))
                   / (t.tf + {BM25_K1} * (1.0 - {BM25_B}
                      + {BM25_B} * l.dl
                        / (CAST(s.tot_dl AS DOUBLE) / s.n_docs)))
                   * 1000000) AS BIGINT) AS u
        FROM tf t JOIN dft d USING (w) JOIN dl l USING (doc_id)
        CROSS JOIN stats s
    )
    SELECT doc_id,
           count(*) AS n_terms_hit,
           CAST(sum(u) AS BIGINT) / 1000000.0 AS score
    FROM scored
    GROUP BY doc_id
    ORDER BY CAST(sum(u) AS BIGINT) DESC, doc_id
    LIMIT {BM25_TOPK}
    """,
)
def text_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 keyword retrieval: top-{BM25_TOPK} documents for a fixed term
    query — the ranking function under retrieval-corpus construction and
    contamination probes (tfidf's big sibling; completes the text-retrieval
    family next to text_tfidf_top_terms and the inverted-index build).

    Scale shape: token explode → per-doc length (key-local), corpus stats
    as one broadcast row (sum(dl) is an exact integer sum, so avgdl is a
    deterministic double — never a float reduction), term frequencies only
    for the ≤|Q| query terms (the explode filter prunes before the
    shuffle), document frequencies broadcast back. Per-term scores are
    deterministic per-row arithmetic quantized to integer micro-units; the
    per-doc sum is exact, and the top-k orders by that integer with doc_id
    tiebreak — a TakeOrderedAndProject, no global sort."""
    # r11 (guide §2.4, plans/r11/text_bm25_topk_*): the dl/tf CTE split
    # re-ran the regexp tokenize + explode once per consumer (dl was itself
    # read twice — stats and the scoring join — so the corpus tokenized
    # 3×). Doc length and the |Q|={len(BM25_TERMS)} per-term frequencies
    # now come out of ONE per-doc aggregate (conditional counts) that
    # lazily checkpoints (doc-sized), the stack() unpivot emits (w, tf)
    # row-locally with dl riding along (the former dl join disappears),
    # and the corpus tokenizes exactly once. The scoring expression is the
    # same IEEE double tree as the oracle (D-suffixed literals, exact
    # integer micro-unit sum).
    d = table(spark, sf_dir, "documents")
    toks = d.selectExpr(
        "doc_id", "explode(regexp_extract_all(lower(text), '[a-z0-9]+', 0)) AS w"
    )
    per_doc = (
        toks.groupBy("doc_id")
        .agg(
            F.expr("count(1)").alias("dl"),
            *[
                F.expr(f"count_if(w = '{t}')").alias(f"tf_{i}")
                for i, t in enumerate(BM25_TERMS)
            ],
        )
        .localCheckpoint(eager=False)
    )
    stats = per_doc.agg(
        F.expr("count(1)").alias("n_docs"), F.expr("sum(dl)").alias("tot_dl")
    )
    stack_args = ", ".join(f"'{t}', tf_{i}" for i, t in enumerate(BM25_TERMS))
    tf = per_doc.selectExpr(
        "doc_id",
        "dl",
        f"stack({len(BM25_TERMS)}, {stack_args}) AS (w, tf)",
    ).where("tf > 0")
    dft = tf.groupBy("w").agg(F.expr("count(1)").alias("df"))
    scored = (
        tf.join(F.broadcast(dft), "w")
        .crossJoin(F.broadcast(stats))
        .selectExpr(
            "doc_id",
            f"""CAST(round(
                log(1.0D + (n_docs - df + 0.5D) / (df + 0.5D))
                * (tf * (1.0D + {BM25_K1}D))
                / (tf + {BM25_K1}D * (1.0D - {BM25_B}D
                   + {BM25_B}D * dl / (CAST(tot_dl AS DOUBLE) / n_docs)))
                * 1000000) AS BIGINT) AS u""",
        )
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.expr("count(1)").alias("n_terms_hit"),
            F.expr("sum(u)").alias("su"),
        )
        .orderBy(F.desc("su"), "doc_id")
        .limit(BM25_TOPK)
        .selectExpr("doc_id", "n_terms_hit", "su / 1000000.0D AS score")
    )


#: feature-hashing embedding dims (power of two for cheap modulo)
EMBED_DIMS = 64


def embed_text(df: DataFrame, text_col: str = "text", dims: int = EMBED_DIMS) -> DataFrame:
    """Deterministic text → array<float> embedding by feature hashing: each
    token hashes to a dimension (md5 mod dims) with ±1 sign (md5 bit), the
    vector is L2-normalized. This is the embed step of a training pipeline
    with the model swapped for the classic hashing trick (Weinberger et al.,
    public) so it runs JVM-side with zero model weights — a real encoder
    slots in as a pandas_udf over the same (id, text) → (id, array) shape.
    Output feeds every similarity/dedup operator that takes embeddings."""
    toks = df.select("doc_id", F.explode(F.split(F.lower(text_col), r"\s+")).alias("tok"))
    h = F.md5("tok")
    dim = F.conv(F.substring(h, 1, 6), 16, 10).cast("long") % dims
    sign = F.when(F.conv(F.substring(h, 7, 1), 16, 10).cast("int") % 2 == 0, 1.0).otherwise(-1.0)
    weights = (
        toks.groupBy("doc_id", dim.alias("dim"))
        .agg(F.sum(sign).alias("w"))
    )
    # assemble dense vectors: collect (dim, w) per doc into a sorted sparse
    # map, expand to dense via a dims-length sequence lookup
    sparse = weights.groupBy("doc_id").agg(
        F.map_from_entries(
            F.sort_array(F.collect_list(F.struct(F.col("dim"), F.col("w"))))
        ).alias("m")
    )
    dense = F.transform(
        F.sequence(F.lit(0), F.lit(dims - 1)),
        lambda i: F.coalesce(F.element_at(F.col("m"), i.cast("long")), F.lit(0.0)),
    )
    # materialize the vector and its norm as COLUMNS before normalizing:
    # interpreted higher-order lambdas don't common-subexpression-eliminate,
    # so inlining the norm aggregate into the per-element division would
    # re-reduce the whole vector once per element (O(dims²) per row —
    # measured ~3× the whole query's cost at dims=64)
    densed = sparse.select("doc_id", dense.alias("d")).withColumn(
        "nrm",
        F.sqrt(F.aggregate("d", F.lit(0.0), lambda acc, v: acc + v * v)),
    )
    unit = F.transform("d", lambda v: (v / F.col("nrm")).cast("float"))
    return densed.select("doc_id", unit.alias("embedding"))


#: shared micro-unit rounding for the embed checksum: identical double ops
#: on BOTH engines (sign-aware floor), so tie semantics can never diverge
_EMB_MU = "CASE WHEN {x} < 0 THEN -floor(-({x}) + 0.5) ELSE floor(({x}) + 0.5) END"
_EMB_V = "CAST(CAST(w.w / n.nrm AS REAL) AS DOUBLE) * 10000.0"
_EMB_V0 = "CAST(CAST(coalesce(w0.w, 0.0) / n.nrm AS REAL) AS DOUBLE) * 10000.0"


@register(
    "text_embed_hashing",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, unnest(regexp_split_to_array(lower(text), '\\s+')) AS tok
      FROM documents
    ), hashed AS (
      SELECT doc_id,
             CAST(concat('0x', substr(md5(tok), 1, 6)) AS BIGINT) % 64 AS dim,
             CASE WHEN CAST(concat('0x', substr(md5(tok), 7, 1)) AS INT) % 2 = 0
                  THEN 1.0 ELSE -1.0 END AS s
      FROM toks
    ), weights AS (
      SELECT doc_id, dim, sum(s) AS w FROM hashed GROUP BY 1, 2
    ), norms AS (
      SELECT doc_id, sqrt(sum(w * w)) AS nrm FROM weights GROUP BY 1
    )
    SELECT n.doc_id,
           CAST({_EMB_MU.format(x=_EMB_V0)} AS BIGINT) AS e0_u,
           CAST(sum(CAST({_EMB_MU.format(x=_EMB_V)} AS BIGINT) * (w.dim + 1))
                AS BIGINT) AS vec_sum_u,
           64 AS dims
    FROM norms n
    JOIN weights w USING (doc_id)
    LEFT JOIN (SELECT doc_id, w FROM weights WHERE dim = 0) w0 USING (doc_id)
    GROUP BY n.doc_id, n.nrm, w0.w
    ORDER BY doc_id
    """,
)
def text_embed_hashing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature-hashed embeddings for the documents table. Bridges the text
    corpus into the embedding operators: dedup_embedding_cosine / sim_*
    consume exactly this (doc_id, array<float>) shape.

    r6: upgraded from a rows-only check to a FULL value-hash oracle — the
    whole hashing pipeline (md5 token→dim, ±1 sign, L2 normalization) is
    mirrored in DuckDB SQL, and every unit vector is checked through two
    integer statistics: e0_u (first element in 1e-4 micro-units) and
    vec_sum_u (position-weighted micro-unit checksum Σ (i+1)·round(1e4·vᵢ)
    — a relabel-sensitive digest of ALL 64 elements). Micro-units use the
    same sign-aware floor expression on both engines, so no rounding-tie
    can diverge; pytest still pins determinism, dims, and unit norm."""
    from duckdb_fastlanes_spark.catalog import sql_q

    # single-parse SQL body (r7): the embed_text pipeline inlined as SQL
    # text (same expressions; embed_text itself stays the API helper for
    # DataFrame callers and keeps its pytest).
    #
    # r8 HOF diet: Catalyst never codegens higher-order-function lambdas —
    # the former 4 chained layers (dense transform → norm aggregate → /nrm
    # transform → 64-wide zip_with checksum) evaluated ~1.3M interpreted
    # lambdas at sf0.1 and dominated the 1.5 s wall (every earlier stage
    # measures ≤0.03 s). Now: the norm is a plain codegen'd sum(w*w) in the
    # doc aggregate (zeros contribute nothing), the dense unit vector is
    # built in ONE transform, and the position-weighted checksum runs over
    # the SPARSE map entries only (absent dims contribute round(1e4·0) = 0
    # exactly, so the digest is unchanged — same floor CASE, same FLOAT
    # cast as the dense element, integer summation order-free).
    e0 = '(CASE WHEN CAST(element_at(embedding, 1) AS DOUBLE) * 10000.0D < 0 THEN -floor(-(CAST(element_at(embedding, 1) AS DOUBLE) * 10000.0D) + 0.5D) ELSE floor((CAST(element_at(embedding, 1) AS DOUBLE) * 10000.0D) + 0.5D) END)'
    sval = "CAST(CAST(kv.value / nrm AS FLOAT) AS DOUBLE) * 10000.0D"
    sterm = (
        f"(CASE WHEN {sval} < 0 THEN -floor(-({sval}) + 0.5D) "
        f"ELSE floor(({sval}) + 0.5D) END)"
    )
    return sql_q(
        spark,
        sf_dir,
        f"""
        WITH toks AS (
            SELECT doc_id, explode(split(lower(text), '\\\\s+')) AS tok
            FROM documents),
        weights AS (
            SELECT doc_id,
                   CAST(conv(substring(md5(tok), 1, 6), 16, 10) AS BIGINT)
                     % {EMBED_DIMS} AS dim,
                   sum(CASE WHEN CAST(conv(substring(md5(tok), 7, 1), 16, 10)
                                 AS INT) % 2 = 0
                            THEN 1.0D ELSE -1.0D END) AS w
            FROM toks GROUP BY 1, 2),
        sparse AS (
            SELECT doc_id,
                   sqrt(sum(w * w)) AS nrm,
                   map_from_entries(sort_array(collect_list(struct(dim, w))))
                     AS m
            FROM weights GROUP BY doc_id),
        emb AS (
            SELECT doc_id, nrm, m,
                   transform(sequence(0, {EMBED_DIMS - 1}),
                             i -> CAST(coalesce(element_at(m, CAST(i AS BIGINT)),
                                                0.0D) / nrm AS FLOAT))
                     AS embedding
            FROM sparse)
        SELECT doc_id,
               CAST({e0} AS BIGINT) AS e0_u,
               aggregate(map_entries(m), CAST(0 AS BIGINT),
                         (acc, kv) -> acc + CAST({sterm} AS BIGINT)
                                            * (CAST(kv.key AS BIGINT) + 1))
                 AS vec_sum_u,
               size(embedding) AS dims
        FROM emb
        ORDER BY doc_id
        """,
    )


def _curate_oracle() -> str:
    """Assemble the curation-pipeline oracle from the dedup module's shared
    SQL fragments (same shingle/minhash/band definitions as the LSH query)."""
    from duckdb_fastlanes_spark.pipeline import dedup as dd

    minhash_cols = ", ".join(
        f"{dd._oracle_minhash(i)} AS mh{i}" for i in range(dd.N_MINHASH)
    )
    bands_union = " UNION ALL ".join(
        f"SELECT doc_id, shingles, {b} AS band_id, {dd._oracle_band(b)} AS band_key FROM sigs"
        for b in range(dd.N_MINHASH // dd.BAND_WIDTH)
    )
    return f"""
    WITH quality AS (
        SELECT doc_id, text, lang FROM documents
        WHERE length(text) BETWEEN 64 AND 4096
          AND len(regexp_extract_all(text, '[A-Za-z]+')) >= 10
    ),
    exact_kept AS (
        SELECT min(doc_id) AS doc_id
        FROM quality
        GROUP BY md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g')))
    ),
    shingled AS (
        SELECT doc_id, {dd._ORACLE_SHINGLES} AS shingles
        FROM (SELECT doc_id, {dd._ORACLE_WORDS} AS w
              FROM quality WHERE doc_id IN (SELECT doc_id FROM exact_kept))
        WHERE len(w) >= 3
    ),
    sigs AS (
        SELECT doc_id, shingles, {minhash_cols}
        FROM shingled
    ),
    bands AS (
        {bands_union}
    ),
    near_dropped AS (
        SELECT DISTINCT b.doc_id
        FROM bands a JOIN bands b
          ON a.band_key = b.band_key AND a.band_id = b.band_id
         AND a.doc_id < b.doc_id
        WHERE CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
              / (len(a.shingles) + len(b.shingles)
                 - len(list_intersect(a.shingles, b.shingles))) >= {dd.JACCARD_THRESHOLD}
    )
    SELECT q.lang,
           count(*) AS n_docs,
           CAST(sum(len(regexp_extract_all(lower(q.text), '[a-z0-9]+'))) AS BIGINT)
               AS total_tokens
    FROM quality q
    WHERE q.doc_id IN (SELECT doc_id FROM exact_kept)
      AND q.doc_id NOT IN (SELECT doc_id FROM near_dropped)
    GROUP BY q.lang
    ORDER BY q.lang
    """


@register("pipeline_curate_corpus", oracle=_curate_oracle())
def pipeline_curate_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The end-to-end curation pipeline as ONE dataflow: quality gate →
    exact dedup (keep min doc_id per fingerprint) → MinHash-LSH near-dup
    removal (drop the higher doc_id of each verified pair) → per-language
    corpus stats. Every stage is the already-verified operator composed
    lazily — Catalyst optimizes across stage boundaries (the quality filter
    pushes into every branch's scan), which a script of separate jobs
    cannot."""
    from duckdb_fastlanes_spark.catalog import sql_q
    from duckdb_fastlanes_spark.pipeline import dedup as dd

    n_bands = dd.N_MINHASH // dd.BAND_WIDTH
    mh_cols = ", ".join(
        f"min(substring(h, {i * 4 + 1}, 4)) AS mh{i}" for i in range(dd.N_MINHASH)
    )
    bands_sql = ", ".join(dd._band_expr(b) for b in range(n_bands))
    # r11 (guide §2.4, plans/r11/pipeline_curate_corpus_*): Catalyst inlines
    # CTEs, so the one-statement form recomputed the quality gate 3×, the
    # exact-dedup survivor set 2× and — worst — the whole shingle+minhash
    # per_doc pipeline 2× (once per side of the band self-join): 20
    # exchanges / 10 scans at sf0.1. Restructured with the SAME algebra:
    # exact dedup keeps rn=1 per fingerprint via ONE window instead of a
    # min()-groupBy + semi-join back (quality then derives once), and the
    # two frames with multiple consumers (deduped: shingling + final stats;
    # per_doc: both sides of the band join) materialize once as lazy
    # localCheckpoints. Kept set, near-drop set and stats are unchanged.
    deduped = sql_q(
        spark,
        sf_dir,
        """
        WITH quality AS (
            SELECT doc_id, lang, text FROM documents
            WHERE length(text) BETWEEN 64 AND 4096
              AND size(regexp_extract_all(text, '[A-Za-z]+', 0)) >= 10)
        SELECT doc_id, lang, text FROM (
            SELECT doc_id, lang, text,
                   row_number() OVER (
                       PARTITION BY
                           md5(lower(regexp_replace(trim(text), '\\\\s+', ' ')))
                       ORDER BY doc_id) AS rn
            FROM quality)
        WHERE rn = 1
        """,
    ).localCheckpoint(eager=False)
    deduped.createOrReplaceTempView("curate_deduped")
    per_doc = spark.sql(
        f"""
        WITH wtab AS (SELECT doc_id,
                             regexp_extract_all(lower(text), '[a-z0-9]+', 0) AS w
                      FROM curate_deduped),
        shingled AS (
            SELECT doc_id,
                   explode(zip_with(
                       slice(w, 1, size(w) - 2),
                       zip_with(slice(w, 2, size(w) - 2), slice(w, 3, size(w) - 2),
                                (x, y) -> concat(x, ' ', y)),
                       (a, bc) -> concat(a, ' ', bc)
                   )) AS shingle
            FROM wtab WHERE size(w) >= 3)
        SELECT doc_id, collect_set(shingle) AS shingles, {mh_cols}
        FROM (SELECT doc_id, shingle, md5(shingle) AS h FROM shingled)
        GROUP BY doc_id
        """
    ).localCheckpoint(eager=False)
    per_doc.createOrReplaceTempView("curate_per_doc")
    return spark.sql(
        f"""
        WITH banded AS (
            SELECT doc_id, shingles,
                   posexplode(array({bands_sql})) AS (band_id, band_key)
            FROM curate_per_doc),
        near_dropped AS (
            SELECT DISTINCT b.doc_id
            FROM banded a JOIN banded b
              ON a.band_key = b.band_key AND a.band_id = b.band_id
                 AND a.doc_id < b.doc_id
            WHERE CAST(size(array_intersect(a.shingles, b.shingles)) AS DOUBLE)
                  / (size(a.shingles) + size(b.shingles)
                     - size(array_intersect(a.shingles, b.shingles)))
                  >= {dd.JACCARD_THRESHOLD}),
        final AS (
            SELECT d.* FROM curate_deduped d LEFT ANTI JOIN near_dropped n
            ON d.doc_id = n.doc_id)
        SELECT lang, count(1) AS n_docs,
               sum(size(regexp_extract_all(lower(text), '[a-z0-9]+', 0)))
                 AS total_tokens
        FROM final
        GROUP BY lang
        ORDER BY lang
        """
    )


@register(
    "text_bigram_lm_score",
    oracle="""
    WITH toks AS (
        SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS w
        FROM documents
    ),
    bigrams AS (
        SELECT doc_id, w[i] AS w1, w[i + 1] AS w2
        FROM toks, unnest(range(1, len(w))) AS t(i)
        WHERE len(w) >= 2
    ),
    uni AS (SELECT w1 AS w, count(*) AS cu FROM bigrams GROUP BY 1),
    bi  AS (SELECT w1, w2, count(*) AS cb FROM bigrams GROUP BY 1, 2)
    SELECT doc_id,
           count(*) AS n_bigrams,
           round(avg(ln(CAST(cb AS DOUBLE) / cu)), 2) AS avg_logprob
    FROM bigrams JOIN bi USING (w1, w2) JOIN uni ON uni.w = bigrams.w1
    GROUP BY doc_id
    ORDER BY doc_id
    """,
)
def text_bigram_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perplexity-proxy quality score: each document's mean log-likelihood
    under a bigram model estimated from the corpus itself (the KenLM-style
    filter of production data pipelines, model-free). P(w2|w1) =
    c(w1,w2)/c(w1·) with counts over all bigram OCCURRENCES, so probabilities
    normalize exactly and the score is a true avg-log-prob; incoherent or
    boilerplate-shuffled documents score far from the corpus mode.

    Scale shape: bigram rows are corpus-linear; both model joins are
    equi-joins on token keys (shuffle-partitioned, skew on stopword-headed
    bigrams absorbed by AQE) and the per-doc aggregate is partial+final.
    Nothing is driver-side: the "model" never materializes outside the
    cluster. The oracle builds the identical model in SQL."""
    d = table(spark, sf_dir, "documents")
    bigrams = (
        d.selectExpr(
            "doc_id", "regexp_extract_all(lower(text), '[a-z0-9]+', 0) AS w"
        )
        .where("size(w) >= 2")
        .selectExpr(
            "doc_id",
            """explode(zip_with(slice(w, 1, size(w) - 1), slice(w, 2, size(w) - 1),
                                (x, y) -> struct(x AS w1, y AS w2))) AS bg""",
        )
        .select("doc_id", "bg.w1", "bg.w2")
    )
    # r11 (guide §2.3/§2.4, plans/r11/text_bigram_lm_score_*): the bigram
    # stream fed THREE consumers (uni, bi, the scoring join), so CTE
    # inlining ran the regexp tokenize + explode three times and both model
    # joins probed the full occurrence stream. Now: (1) the stream
    # materializes once (lazy localCheckpoint); (2) cu comes from bi
    # (c(w1·) = Σ_w2 c(w1,w2) — exact integers, |bi|-sized aggregate
    # instead of a second full-stream pass); (3) cu attaches to the MODEL
    # (|bi| rows) first, so the occurrence stream is joined once on
    # (w1, w2) instead of twice.
    bigrams = bigrams.localCheckpoint(eager=False)
    bi = bigrams.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("cb"))
    uni = bi.groupBy("w1").agg(F.sum("cb").alias("cu"))
    model = bi.join(uni, "w1")
    return (
        bigrams.join(model, ["w1", "w2"])
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(F.avg(F.log(F.col("cb").cast("double") / F.col("cu"))), 2).alias(
                "avg_logprob"
            ),
        )
        .orderBy("doc_id")
    )


#: RAG-style chunking parameters: 80-token windows, 16-token overlap
CHUNK_TOKENS = 80
CHUNK_STRIDE = CHUNK_TOKENS - 16
CHUNK_OVERLAP = 16


@register(
    "text_chunk_windows",
    oracle=f"""
    WITH d AS (
        SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS w
        FROM documents
    ),
    chunks AS (
        SELECT doc_id,
               CAST((s - 1) / {CHUNK_STRIDE} AS BIGINT) AS chunk_ix,
               w[s : s + {CHUNK_TOKENS - 1}] AS c,
               s
        FROM d, unnest(generate_series(1, len(w), {CHUNK_STRIDE})) AS t(s)
        WHERE len(w) >= 1
    )
    SELECT doc_id, chunk_ix,
           len(c) AS n_tokens,
           md5(array_to_string(c, ' ')) AS chunk_fp
    FROM chunks
    WHERE s = 1 OR len(c) > {CHUNK_OVERLAP}
    ORDER BY doc_id, chunk_ix
    """,
)
def text_chunk_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping-window document chunking (the RAG / context-length
    preprocessing step): {CHUNK_TOKENS}-token windows every {CHUNK_STRIDE}
    tokens ({CHUNK_OVERLAP}-token overlap), every token covered, tail
    windows that add no new tokens dropped. Chunk identity is
    (doc_id, chunk_ix) plus a content fingerprint, so downstream chunk-level
    dedup/embedding stays content-keyed. Pure row-local generate+slice —
    zero shuffles before the output ordering; chunk count scales with token
    count, never with document count × max length."""
    d = table(spark, sf_dir, "documents")
    return (
        d.selectExpr(
            "doc_id", "regexp_extract_all(lower(text), '[a-z0-9]+', 0) AS w"
        )
        .where("size(w) >= 1")
        .selectExpr(
            "doc_id",
            f"posexplode(sequence(1, size(w), {CHUNK_STRIDE})) AS (chunk_ix, s)",
            "w",
        )
        .selectExpr(
            "doc_id",
            "CAST(chunk_ix AS BIGINT) AS chunk_ix",
            "s",
            f"slice(w, s, {CHUNK_TOKENS}) AS c",
        )
        .where(f"s = 1 OR size(c) > {CHUNK_OVERLAP}")
        .selectExpr(
            "doc_id",
            "chunk_ix",
            "size(c) AS n_tokens",
            "md5(array_join(c, ' ')) AS chunk_fp",
        )
        .orderBy("doc_id", "chunk_ix")
    )


@register(
    "text_bpe_pair_stats",
    oracle="""
    WITH words AS (
        SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS w
        FROM documents
    ),
    pairs AS (
        SELECT substr(w, CAST(unnest(range(1, length(w))) AS INTEGER), 2) AS pair
        FROM words
    )
    SELECT pair, count(*) AS cnt
    FROM pairs
    GROUP BY pair
    ORDER BY cnt DESC, pair
    LIMIT 30
    """,
)
def text_bpe_pair_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adjacent-character-pair frequencies over the corpus — the statistic a
    byte-pair-encoding tokenizer trainer computes on every merge step (this
    is step 0: which pair to merge first). Top-30 pairs by count.

    Scale shape: tokenize → per-word pair expansion entirely via JVM
    higher-order functions (sequence + transform + explode; no Python, no
    shuffle until the #pairs-sized count), then one aggregation over a key
    space bounded by alphabet² and a TakeOrderedAndProject top-k. A real BPE
    trainer iterates merge→recount; each round is this same plan over the
    re-paired corpus, so the one-round cost bounds the per-merge cost.
    """
    d = table(spark, sf_dir, "documents")
    words = d.select(
        F.explode(
            F.regexp_extract_all(F.lower("text"), F.lit(r"[a-z0-9]+"), F.lit(0))
        ).alias("w")
    )
    pairs = words.select(
        F.explode(
            # sequence(1, 0) DESCENDS in Spark — guard 1-char words explicitly
            F.expr(
                "CASE WHEN length(w) < 2 THEN array()"
                " ELSE transform(sequence(1, length(w) - 1), i -> substring(w, i, 2)) END"
            )
        ).alias("pair")
    )
    return (
        pairs.groupBy("pair")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), "pair")
        .limit(30)
    )


@register(
    "vocab_oov_rate",
    oracle="""
    WITH toks AS (
        SELECT doc_id, lang,
               unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS tok
        FROM documents
    ),
    vocab AS (
        SELECT tok FROM toks GROUP BY tok ORDER BY count(*) DESC, tok LIMIT 500
    ),
    per_doc AS (
        SELECT t.doc_id, t.lang,
               avg(CASE WHEN v.tok IS NULL THEN 1.0 ELSE 0.0 END) AS oov
        FROM toks t LEFT JOIN vocab v USING (tok)
        GROUP BY t.doc_id, t.lang
    )
    SELECT lang, count(*) AS n_docs, round(avg(oov), 4) AS avg_oov_rate
    FROM per_doc GROUP BY lang ORDER BY lang
    """,
)
def vocab_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-vocabulary coverage audit: build the top-500 token vocab
    *in-engine* (count desc, token asc — a deterministic total order), then
    measure each document's out-of-vocabulary rate against it, rolled up per
    language. The vocab is tiny → broadcast to the token stream; the token
    explode never leaves its partition until the per-doc aggregate (one
    shuffle on doc_id). This is the OOV gate a BPE/tokenizer-training
    pipeline runs before committing a vocab."""
    from duckdb_fastlanes_spark.catalog import sql_q

    return sql_q(
        spark,
        sf_dir,
        """
        WITH toks AS (
            SELECT doc_id, lang,
                   explode(regexp_extract_all(lower(text), '[a-z0-9]+', 0))
                     AS tok
            FROM documents),
        vocab AS (
            SELECT tok AS v_tok
            FROM (SELECT tok, count(1) AS cnt FROM toks GROUP BY tok)
            ORDER BY cnt DESC, tok LIMIT 500),
        per_doc AS (
            SELECT /*+ BROADCAST(vocab) */ doc_id, lang,
                   avg(CASE WHEN v_tok IS NULL THEN 1.0D ELSE 0.0D END) AS oov
            FROM toks LEFT JOIN vocab ON toks.tok = vocab.v_tok
            GROUP BY doc_id, lang)
        SELECT lang, count(1) AS n_docs, round(avg(oov), 4) AS avg_oov_rate
        FROM per_doc
        GROUP BY lang
        ORDER BY lang
        """,
    )


@register(
    "text_sentence_stats",
    oracle="""
    WITH per_doc AS (
        SELECT source,
               len(regexp_extract_all(text, '[^.!?]*[A-Za-z][^.!?]*'))
                   AS n_sentences,
               len(regexp_extract_all(text, '[A-Za-z]+')) AS n_words
        FROM documents
    )
    SELECT source, count(*) AS n_docs,
           round(avg(n_sentences), 2) AS avg_sentences,
           round(CAST(sum(n_words) AS DOUBLE) / sum(n_sentences), 2)
               AS words_per_sentence
    FROM per_doc GROUP BY source ORDER BY source
    """,
)
def text_sentence_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sentence segmentation profile per source: sentences = maximal
    terminator-free runs containing a letter (pure regex count — no explode,
    no UDF, stays in whole-stage codegen), then one partial+final aggregate.
    The words-per-sentence ratio uses corpus totals (sum/sum), not an avg of
    ratios, so short docs don't dominate."""
    d = table(spark, sf_dir, "documents")
    per_doc = d.select(
        "source",
        F.size(
            F.regexp_extract_all("text", F.lit(r"[^.!?]*[A-Za-z][^.!?]*"), F.lit(0))
        ).alias("n_sentences"),
        F.size(F.regexp_extract_all("text", F.lit(r"[A-Za-z]+"), F.lit(0))).alias(
            "n_words"
        ),
    )
    return (
        per_doc.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg("n_sentences"), 2).alias("avg_sentences"),
            F.round(
                F.sum("n_words").cast("double") / F.sum("n_sentences"), 2
            ).alias("words_per_sentence"),
        )
        .orderBy("source")
    )


@register(
    "text_zipf_fit",
    oracle="""
    WITH toks AS (
        SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS tok
        FROM documents
    ),
    counts AS (
        SELECT tok, count(*) AS cnt FROM toks GROUP BY tok
    ),
    ranked AS (
        SELECT cnt, row_number() OVER (ORDER BY cnt DESC, tok) AS rnk
        FROM counts ORDER BY cnt DESC, tok LIMIT 1000
    )
    SELECT round(regr_slope(ln(cnt), ln(rnk)), 3) AS zipf_slope,
           round(regr_intercept(ln(cnt), ln(rnk)), 3) AS zipf_intercept,
           round(regr_r2(ln(cnt), ln(rnk)), 3) AS r2,
           count(*) AS n_ranks
    FROM ranked
    """,
)
def text_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf-law fit over the corpus: token frequencies ranked (count desc,
    token asc — total order), log-log linear regression over the top 1000
    ranks via the built-in regr_* aggregates. A natural-language corpus
    lands near slope −1; synthetic or boilerplate-heavy data drifts — a
    one-number corpus-health probe. The token aggregate partial-combines;
    the window only ever sees the 1000 survivors."""
    from pyspark.sql.window import Window

    d = table(spark, sf_dir, "documents")
    counts = (
        d.select(
            F.explode(
                F.regexp_extract_all(F.lower("text"), F.lit(r"[a-z0-9]+"), F.lit(0))
            ).alias("tok")
        )
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), "tok")
        .limit(1000)
    )
    ranked = counts.withColumn(
        "rnk", F.row_number().over(Window.orderBy(F.col("cnt").desc(), "tok"))
    )
    lc, lr = F.log(F.col("cnt")), F.log(F.col("rnk"))
    return ranked.agg(
        F.round(F.expr("regr_slope(ln(cnt), ln(rnk))"), 3).alias("zipf_slope"),
        F.round(F.expr("regr_intercept(ln(cnt), ln(rnk))"), 3).alias("zipf_intercept"),
        F.round(F.expr("regr_r2(ln(cnt), ln(rnk))"), 3).alias("r2"),
        F.count(F.lit(1)).alias("n_ranks"),
    )


@register(
    "text_nb_source_classifier",
    oracle="""
    WITH toks AS (
        SELECT doc_id, source,
               CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))
                    AS INTEGER) % 100 AS bucket,
               unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS tok
        FROM documents
    ),
    train AS (SELECT * FROM toks WHERE bucket < 80),
    test  AS (SELECT * FROM toks WHERE bucket >= 80),
    class_tot AS (
        SELECT source, count(*) AS tot FROM train GROUP BY source
    ),
    vocab_n AS (SELECT count(DISTINCT tok) AS v FROM train),
    model AS (
        SELECT t.source, t.tok,
               CAST(floor(1000000.0 * ln((count(*) + 1.0) / (ct.tot + vn.v)))
                    AS BIGINT) AS l_tok
        FROM train t, class_tot ct, vocab_n vn
        WHERE ct.source = t.source
        GROUP BY t.source, t.tok, ct.tot, vn.v
    ),
    defaults AS (
        SELECT ct.source,
               CAST(floor(1000000.0 * ln(1.0 / (ct.tot + vn.v))) AS BIGINT)
                   AS l_unseen
        FROM class_tot ct, vocab_n vn
    ),
    scored AS (
        SELECT te.doc_id, te.source AS actual, d.source AS candidate,
               sum(coalesce(m.l_tok, d.l_unseen)) AS score
        FROM test te
        CROSS JOIN defaults d
        LEFT JOIN model m ON m.source = d.source AND m.tok = te.tok
        GROUP BY te.doc_id, te.source, d.source
    ),
    predicted AS (
        SELECT doc_id, actual, candidate AS predicted,
               row_number() OVER (PARTITION BY doc_id
                                  ORDER BY score DESC, candidate) AS rn
        FROM scored
    )
    SELECT actual, predicted, count(*) AS n
    FROM predicted WHERE rn = 1
    GROUP BY actual, predicted
    ORDER BY actual, predicted
    """,
)
def text_nb_source_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multinomial Naive Bayes trained *in-engine*: 80/20 hash split (same
    md5-bucket idiom as the sampling family — partition-invariant), Laplace-
    smoothed per-source token log-likelihoods, argmax over sources, confusion
    matrix out. Log terms are floored to integer micro-nats BEFORE summing,
    so scores are exact integers — order-independent, hash-stable across
    engines (float sums would race in the last ulp).

    Scale shape: the model is |vocab|×|sources| — broadcast if small,
    shuffle-join on tok otherwise (it's here); the per-(doc,source) score is
    one partial+final aggregate. Priors are intentionally uniform (class
    counts are near-equal after the hash split; dropping the prior term
    keeps the score a pure token sum)."""
    from duckdb_fastlanes_spark.catalog import sql_q

    return sql_q(
        spark,
        sf_dir,
        """
        WITH toks AS (
            SELECT doc_id, source,
                   CAST(conv(substring(md5(CAST(doc_id AS STRING)), 1, 4),
                             16, 10) AS INT) % 100 AS bucket,
                   explode(regexp_extract_all(lower(text), '[a-z0-9]+', 0))
                     AS tok
            FROM documents),
        test AS (SELECT * FROM toks WHERE bucket >= 80),
        -- r11 (guide §2.4): the train leg used to be scanned THREE times
        -- (class totals, vocab size, model counts) — and CTE inlining
        -- re-ran the regexp tokenize + explode for each. The (source, tok)
        -- term-frequency aggregate is now the single train-side pass;
        -- class totals (Σ cnt) and vocab size (distinct tok) derive from
        -- it exactly, so the corpus tokenizes twice (train agg + test),
        -- not four times.
        tf AS (SELECT source AS m_source, tok AS m_tok, count(1) AS cnt
               FROM toks WHERE bucket < 80 GROUP BY source, tok),
        class_tot AS (SELECT m_source AS source, sum(cnt) AS tot
                      FROM tf GROUP BY m_source),
        vocab_n AS (SELECT count(DISTINCT m_tok) AS v FROM tf),
        model AS (
            SELECT /*+ BROADCAST(class_tot), BROADCAST(vocab_n) */
                   t.m_source, t.m_tok,
                   CAST(floor(1000000.0D * log((t.cnt + 1.0D) / (tot + v)))
                        AS BIGINT) AS l_tok
            FROM tf t
            JOIN class_tot ON t.m_source = class_tot.source
            CROSS JOIN vocab_n),
        -- r11 second pass (guide §2.3, measured at the 1000x cell): the
        -- former CROSS JOIN defaults LEFT JOIN model multiplied every test
        -- token occurrence by |sources| BEFORE the (source, tok) shuffle
        -- join — 255 s at 1000x, paired 5.3x behind DuckDB. The model now
        -- packs into one source->l_tok map PER TOKEN, the join ships each
        -- occurrence ONCE keyed by tok alone, and the per-candidate
        -- expansion is a row-local broadcast cross join AFTER the join
        -- (element_at misses -> l_unseen, exactly the former coalesce).
        -- Same integer micro-nat sums; 1000x wall 255 s -> 17 s.
        model_packed AS (
            SELECT m_tok,
                   map_from_arrays(collect_list(m_source),
                                   collect_list(l_tok)) AS lmap
            FROM model GROUP BY m_tok),
        defaults AS (
            SELECT /*+ BROADCAST(vocab_n) */ source AS d_source,
                   CAST(floor(1000000.0D * log(1.0D / (tot + v))) AS BIGINT)
                     AS l_unseen
            FROM class_tot CROSS JOIN vocab_n),
        scored AS (
            SELECT /*+ BROADCAST(defaults), SHUFFLE_HASH(mp) */ test.doc_id,
                   test.source AS actual, d_source AS candidate,
                   sum(coalesce(element_at(lmap, d_source), l_unseen))
                     AS score
            FROM test LEFT JOIN model_packed mp ON mp.m_tok = test.tok
                 CROSS JOIN defaults
            GROUP BY test.doc_id, test.source, d_source)
        SELECT actual, candidate AS predicted, count(1) AS n
        FROM (SELECT *, row_number() OVER (PARTITION BY doc_id
                                           ORDER BY score DESC, candidate)
                          AS rn
              FROM scored)
        WHERE rn = 1
        GROUP BY actual, candidate
        ORDER BY actual, predicted
        """,
    )


@register(
    "text_inverted_index",
    oracle="""
    WITH toks AS (
        SELECT doc_id, unnest(list_distinct(regexp_extract_all(lower(text), '[a-z]+'))) AS term
        FROM documents
    ),
    postings AS (
        SELECT term, count(*) AS df,
               array_to_string(list_sort(list(doc_id))[1:20], ',') AS posting_head
        FROM toks GROUP BY term
    )
    SELECT term, df, posting_head
    FROM postings
    ORDER BY df DESC, term
    LIMIT 50
    """,
)
def text_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted index build: term -> document-frequency + sorted posting
    list (head capped at 20 ids and rendered as a CSV string so the checked
    result stays bounded and scalar-typed — the one complex-typed output
    column in the registry would repr-diverge between pandas list and numpy
    array depending on the host session's Arrow setting; a real index keeps
    the full typed list). The core retrieval structure for search /
    contamination lookup over a corpus. Spark shape: explode per-doc
    DISTINCT terms (row-local), one shuffle on term with map-side combine;
    posting lists stay bounded per term by the slice. Top-50 by df with a
    term tiebreak keeps the checked head deterministic."""
    d = table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        F.explode(
            F.array_distinct(
                F.regexp_extract_all(F.lower("text"), F.lit(r"[a-z]+"), F.lit(0))
            )
        ).alias("term"),
    )
    return (
        toks.groupBy("term")
        .agg(
            F.count(F.lit(1)).alias("df"),
            F.array_join(
                F.slice(F.sort_array(F.collect_list("doc_id")), 1, 20), ","
            ).alias("posting_head"),
        )
        .orderBy(F.desc("df"), "term")
        .limit(50)
    )


@register(
    "text_lexical_diversity",
    oracle="""
    WITH toks AS (
        SELECT doc_id,
               regexp_extract_all(lower(text), '[a-z0-9]+') AS w
        FROM documents
    )
    SELECT doc_id,
           CAST(len(w) AS BIGINT) AS n_tokens,
           CAST(len(list_distinct(w)) AS BIGINT) AS n_types,
           round(len(list_distinct(w)) * 1.0 / len(w), 4) AS ttr,
           len(list_distinct(w)) * 1.0 / len(w) < 0.3 AS low_diversity
    FROM toks
    WHERE len(w) > 0
    ORDER BY doc_id
    """,
)
def text_lexical_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-token ratio per document — the lexical-diversity quality gate
    (spam, keyword stuffing, and template text all crater the TTR; a
    curation pipeline drops or down-weights low_diversity docs before
    training). Pure row-local array expressions inside whole-stage codegen:
    one scan, no shuffle except the presentation sort — scale-linear.
    Single-parse SQL body (array_distinct here = list_distinct in the
    oracle; the ratio of two exact ints divides identically in IEEE double
    on both engines)."""
    from duckdb_fastlanes_spark.catalog import sql_q

    return sql_q(
        spark,
        sf_dir,
        """
        SELECT doc_id,
               CAST(size(w) AS BIGINT) AS n_tokens,
               CAST(size(array_distinct(w)) AS BIGINT) AS n_types,
               round(size(array_distinct(w)) * 1.0D / size(w), 4) AS ttr,
               size(array_distinct(w)) * 1.0D / size(w) < 0.3D
                 AS low_diversity
        FROM (SELECT doc_id,
                     regexp_extract_all(lower(text), '[a-z0-9]+', 0) AS w
              FROM documents)
        WHERE size(w) > 0
        ORDER BY doc_id
        """,
    )


def _novelty_oracle() -> str:
    from duckdb_fastlanes_spark.pipeline.dedup import _ORACLE_SHINGLES, _ORACLE_WORDS

    return f"""
    WITH sh AS (
        SELECT DISTINCT doc_id, unnest(shingles) AS shingle FROM (
            SELECT doc_id, {_ORACLE_SHINGLES} AS shingles
            FROM (SELECT doc_id, {_ORACLE_WORDS} AS w FROM documents)
            WHERE len(w) >= 3)
    ),
    firsts AS (SELECT shingle, min(doc_id) AS first_doc FROM sh GROUP BY shingle)
    SELECT s.doc_id,
           count(*) AS n_shingles,
           CAST(sum(CASE WHEN f.first_doc = s.doc_id THEN 1 ELSE 0 END)
                AS BIGINT) AS n_novel,
           round(CAST(sum(CASE WHEN f.first_doc = s.doc_id THEN 1 ELSE 0 END)
                      AS DOUBLE) / count(*), 4) AS novelty
    FROM sh s JOIN firsts f USING (shingle)
    GROUP BY s.doc_id
    ORDER BY s.doc_id
    """


@register("text_ngram_novelty", oracle=_novelty_oracle())
def text_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document n-gram NOVELTY: the share of a document's distinct
    3-gram shingles whose corpus-wide FIRST occurrence (min doc_id) is the
    document itself. The training-data curation read-off: low-novelty late
    documents are recombinations of text the corpus already has (template
    spam, scraped mirrors, quote farms) and add little gradient signal;
    an epoch-ordering or dedup-priority policy keys on exactly this.

    Scale shape: one shuffle keyed on the shingle computes first-occurrence
    (min doc_id, map-side combinable); the join back to the doc-shingle
    rows reuses that shingle partitioning (co-partitioned exchange reuse),
    and the final per-doc aggregate is a second narrow shuffle — linear in
    total shingle volume, no pairwise work anywhere (contrast the dedup
    family, which pays Σ bucket² for pair evidence; novelty needs none).
    Spark body reuses dedup's zipped-slices shingle CTE (regex evaluated
    once per row, no interpreted HOF over element_at)."""
    from duckdb_fastlanes_spark.catalog import sql_q
    from duckdb_fastlanes_spark.pipeline.dedup import _SHINGLE_CTE

    return sql_q(
        spark,
        sf_dir,
        f"""
        WITH {_SHINGLE_CTE},
        sh AS (SELECT DISTINCT doc_id, shingle FROM shingles),
        firsts AS (
            SELECT shingle, min(doc_id) AS first_doc FROM sh GROUP BY shingle)
        SELECT s.doc_id,
               count(*) AS n_shingles,
               sum(CASE WHEN f.first_doc = s.doc_id THEN 1 ELSE 0 END)
                 AS n_novel,
               round(CAST(sum(CASE WHEN f.first_doc = s.doc_id THEN 1 ELSE 0
                                   END) AS DOUBLE) / count(*), 4) AS novelty
        FROM sh s JOIN firsts f USING (shingle)
        GROUP BY s.doc_id
        ORDER BY s.doc_id
        """,
    )


@register(
    "text_char_class_profile",
    oracle="""
    WITH per_doc AS (
        SELECT source,
               length(text)                                    AS n_chars,
               len(regexp_extract_all(text, '[A-Za-z]'))       AS n_alpha,
               len(regexp_extract_all(text, '[0-9]'))          AS n_digit,
               len(regexp_extract_all(text, '[ \t\n\r]'))      AS n_space
        FROM documents)
    SELECT source,
           count(*)                      AS n_docs,
           CAST(sum(n_chars) AS BIGINT)  AS total_chars,
           round(CAST(sum(n_alpha) AS DOUBLE) / sum(n_chars), 4) AS alpha_share,
           round(CAST(sum(n_digit) AS DOUBLE) / sum(n_chars), 4) AS digit_share,
           round(CAST(sum(n_space) AS DOUBLE) / sum(n_chars), 4) AS space_share,
           round(CAST(sum(n_chars) - sum(n_alpha) - sum(n_digit) - sum(n_space)
                      AS DOUBLE) / sum(n_chars), 4)               AS other_share
    FROM per_doc
    GROUP BY source
    ORDER BY source
    """,
)
def text_char_class_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-class composition per source: alpha / digit / whitespace /
    other shares of the raw byte stream — the corpus-level profile that
    flags a feed gone binary, table-dumpy, or boilerplate-heavy before it
    poisons a training mix (complements text_quality_score's per-doc gate).

    Determinism: all four counts are exact BIGINT sums (no float
    accumulation); each share is ONE division of exact integers, then a
    fixed round(4) — bit-stable on both engines. 'other' is computed as
    the integer remainder rather than a punctuation regex, so no
    Java-vs-RE2 character-class dialect risk exists at all.

    Scale shape: a row-local project then one aggregate keyed on `source`
    (bounded domain) — map-side partial aggregation collapses the corpus
    before the single tiny shuffle; no window, no join. At 100 TB this is
    a pure scan-side pass."""
    from duckdb_fastlanes_spark.catalog import sql_q

    return sql_q(
        spark,
        sf_dir,
        """
        WITH per_doc AS (
            SELECT source,
                   length(text)                                      AS n_chars,
                   size(regexp_extract_all(text, '[A-Za-z]', 0))     AS n_alpha,
                   size(regexp_extract_all(text, '[0-9]', 0))        AS n_digit,
                   size(regexp_extract_all(text, '[ \t\n\r]', 0))    AS n_space
            FROM documents)
        SELECT source,
               count(1)                 AS n_docs,
               sum(n_chars)             AS total_chars,
               round(CAST(sum(n_alpha) AS DOUBLE) / sum(n_chars), 4)
                 AS alpha_share,
               round(CAST(sum(n_digit) AS DOUBLE) / sum(n_chars), 4)
                 AS digit_share,
               round(CAST(sum(n_space) AS DOUBLE) / sum(n_chars), 4)
                 AS space_share,
               round(CAST(sum(n_chars) - sum(n_alpha) - sum(n_digit)
                          - sum(n_space) AS DOUBLE) / sum(n_chars), 4)
                 AS other_share
        FROM per_doc
        GROUP BY source
        ORDER BY source
        """,
    )


@register(
    "text_readability",
    oracle="""
    WITH per_doc AS (
        SELECT lang,
               len(regexp_extract_all(text, '[A-Za-z]+'))          AS n_words,
               greatest(len(regexp_extract_all(text, '[.!?]+')), 1) AS n_sents,
               len(regexp_extract_all(text, '[aeiouAEIOU]+'))      AS n_vgroups
        FROM documents),
    scored AS (
        SELECT lang, n_words, n_sents,
               CAST(round((206.835
                           - 1.015 * (CAST(n_words AS DOUBLE) / n_sents)
                           - 84.6 * (CAST(n_vgroups AS DOUBLE) / n_words))
                          * 100) AS BIGINT) AS flesch_c
        FROM per_doc WHERE n_words > 0)
    SELECT lang,
           count(*)                                        AS n_docs,
           round(CAST(sum(n_words) AS DOUBLE) / sum(n_sents), 2)
                                                           AS words_per_sentence,
           round(avg(flesch_c) / 100.0, 2)                 AS avg_flesch
    FROM scored
    GROUP BY lang
    ORDER BY lang
    """,
)
def text_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch-style readability per language: words-per-sentence and a
    reading-ease score with vowel-group runs as the syllable proxy (the
    standard regex-only approximation — no dictionary). The
    low-readability tail is a classic pretraining-quality drop signal.

    Determinism: word/sentence/vowel-group counts are exact integers; the
    per-doc score is ONE fixed double expression snapped to a centi-unit
    BIGINT (round half-away-from-zero agrees on both engines), so the
    per-lang average divides an exact integer sum — no float-order drift.
    Corpus words-per-sentence is a ratio of exact sums, not an avg of
    ratios.

    Scale shape: row-local scoring, one aggregate on the bounded `lang`
    key with map-side combine — scan-dominated at any corpus size."""
    from duckdb_fastlanes_spark.catalog import sql_q

    return sql_q(
        spark,
        sf_dir,
        """
        WITH per_doc AS (
            SELECT lang,
                   size(regexp_extract_all(text, '[A-Za-z]+', 0)) AS n_words,
                   greatest(size(regexp_extract_all(text, '[.!?]+', 0)), 1)
                     AS n_sents,
                   size(regexp_extract_all(text, '[aeiouAEIOU]+', 0))
                     AS n_vgroups
            FROM documents),
        scored AS (
            SELECT lang, n_words, n_sents,
                   CAST(round((206.835
                               - 1.015 * (CAST(n_words AS DOUBLE) / n_sents)
                               - 84.6 * (CAST(n_vgroups AS DOUBLE) / n_words))
                              * 100) AS BIGINT) AS flesch_c
            FROM per_doc WHERE n_words > 0)
        SELECT lang,
               count(1)                                        AS n_docs,
               round(CAST(sum(n_words) AS DOUBLE) / sum(n_sents), 2)
                 AS words_per_sentence,
               round(avg(flesch_c) / 100.0, 2)                 AS avg_flesch
        FROM scored
        GROUP BY lang
        ORDER BY lang
        """,
    )


@register(
    "vocab_coverage_curve",
    oracle="""
    WITH toks AS (
        SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS tok
        FROM documents),
    counts AS (SELECT tok, count(*) AS cnt FROM toks GROUP BY tok),
    total AS (SELECT sum(cnt) AS total_toks FROM counts),
    top AS (SELECT tok, cnt FROM counts ORDER BY cnt DESC, tok LIMIT 2000),
    ranked AS (
        SELECT tok, cnt,
               row_number() OVER (ORDER BY cnt DESC, tok) AS vocab_rank,
               sum(cnt) OVER (ORDER BY cnt DESC, tok
                              ROWS UNBOUNDED PRECEDING) AS cum
        FROM top)
    SELECT vocab_rank, tok, cnt AS tok_count,
           CAST(cum AS BIGINT) AS cum_tokens,
           round(CAST(cum AS DOUBLE) / total_toks, 4) AS coverage
    FROM ranked CROSS JOIN total
    WHERE vocab_rank IN (1, 2, 5, 10, 20, 30, 100, 500, 2000)
    ORDER BY vocab_rank
    """,
)
def vocab_coverage_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative token-coverage curve at candidate vocabulary sizes: what
    share of all corpus tokens the top-N vocab entries cover, sampled at
    the ranks a tokenizer-budget decision actually compares (1..2000;
    the synthetic corpus vocab is ~31 tokens, so the low ranks carry the
    curve there while the high ranks activate on real corpora).
    The corpus-level complement of vocab_oov_rate's per-doc OOV gate —
    this is the curve that picks N in the first place.

    Determinism: the vocab order (count desc, token asc) is a total order;
    cumulative counts are exact BIGINTs; coverage is one division by the
    exact corpus total, round(4).

    Scale shape: token explode collapses to vocab cardinality via ONE
    hash aggregate with map-side combine; the candidate list is a
    top-2000 TakeOrdered (never a global sort of the vocab), the running
    sum is a window over those 2000 rows only, and the corpus total is a
    scalar aggregate cross-joined in as a 1-row broadcast. The curve's
    window work is constant-size regardless of corpus scale."""
    from duckdb_fastlanes_spark.catalog import sql_q

    return sql_q(
        spark,
        sf_dir,
        """
        WITH toks AS (
            SELECT explode(regexp_extract_all(lower(text), '[a-z0-9]+', 0))
                     AS tok
            FROM documents),
        counts AS (SELECT tok, count(1) AS cnt FROM toks GROUP BY tok),
        total AS (SELECT sum(cnt) AS total_toks FROM counts),
        top AS (SELECT tok, cnt FROM counts ORDER BY cnt DESC, tok LIMIT 2000),
        ranked AS (
            SELECT tok, cnt,
                   row_number() OVER (ORDER BY cnt DESC, tok) AS vocab_rank,
                   sum(cnt) OVER (ORDER BY cnt DESC, tok
                                  ROWS UNBOUNDED PRECEDING) AS cum
            FROM top)
        SELECT vocab_rank, tok, cnt AS tok_count,
               CAST(cum AS BIGINT) AS cum_tokens,
               round(CAST(cum AS DOUBLE) / total_toks, 4) AS coverage
        FROM ranked CROSS JOIN total
        WHERE vocab_rank IN (1, 2, 5, 10, 20, 30, 100, 500, 2000)
        ORDER BY vocab_rank
        """,
    )


def _bpe_sql(dialect: str, n_rounds: int = 3) -> str:
    """Build the unrolled BPE-merge SQL for either engine.

    Both dialects express the identical algorithm; only the primitive
    names differ (explode/unnest, size/len, element_at/[], $1/\\1).
    Word types are symbolized with every symbol WRAPPED in its own
    spaces — ``hello`` → ``' h  e  l  l  o '`` — so a pair occurrence
    ``' a  b '`` shares NO characters with an adjacent occurrence, and a
    plain left-to-right non-overlapping replace is EXACTLY the Sennrich
    greedy merge (a naive single-space padding shares the boundary space
    between adjacent occurrences and silently skips every second merge in
    runs — ``a b a b`` → ``ab a b`` instead of ``ab ab``; caught in the
    r8 self-review, proven against an independent token-list reference in
    tests/test_pipeline.py). Per round: (a) count adjacent symbol pairs
    weighted by word frequency (the symbol array is projected ONCE per
    word, not re-split per pair index), (b) pick the heaviest pair
    (count desc, pair asc — a total order), (c) fuse its occurrences."""
    if dialect == "spark":
        symbolize = "regexp_replace(w, '(.)', ' $1 ')"
        syms = "transform(split(w_sym, '  '), s -> trim(s))"
        guard = "size(split(w_sym, '  ')) >= 2"
        pairs = (
            "transform(sequence(1, size(syms) - 1),"
            " i -> concat(element_at(syms, i), ' ', element_at(syms, i + 1)))"
        )
        unnest = "explode"
        toks = (
            "SELECT explode(regexp_extract_all(lower(text), '[a-z]+', 0)) AS w"
            " FROM documents"
        )
        concat3 = "concat(' ', replace({pair}, ' ', '  '), ' ')"
        fused3 = "concat(' ', replace({pair}, ' ', ''), ' ')"
    else:
        symbolize = "regexp_replace(w, '(.)', ' \\1 ', 'g')"
        syms = "list_transform(string_split(w_sym, '  '), s -> trim(s))"
        guard = "len(string_split(w_sym, '  ')) >= 2"
        pairs = (
            "list_transform(range(1, len(syms)),"
            " i -> syms[i] || ' ' || syms[i + 1])"
        )
        unnest = "unnest"
        toks = (
            "SELECT unnest(regexp_extract_all(lower(text), '[a-z]+')) AS w"
            " FROM documents"
        )
        concat3 = "(' ' || replace({pair}, ' ', '  ') || ' ')"
        fused3 = "(' ' || replace({pair}, ' ', '') || ' ')"
    ctes = [
        f"toks AS ({toks})",
        f"words0 AS (SELECT {symbolize} AS w_sym, count(*) AS freq"
        " FROM toks GROUP BY w)",
    ]
    selects = []
    for r in range(1, n_rounds + 1):
        prev, cur = f"words{r - 1}", f"words{r}"
        ctes.append(
            f"p{r} AS (SELECT pair, CAST(sum(freq) AS BIGINT) AS cnt FROM"
            f" (SELECT {unnest}({pairs}) AS pair, freq FROM"
            f" (SELECT {syms} AS syms, freq FROM {prev} WHERE {guard}))"
            f" GROUP BY pair)"
        )
        ctes.append(
            f"b{r} AS (SELECT pair, cnt FROM p{r}"
            f" ORDER BY cnt DESC, pair LIMIT 1)"
        )
        pat = concat3.format(pair=f"b{r}.pair")
        fused = fused3.format(pair=f"b{r}.pair")
        ctes.append(
            f"{cur} AS (SELECT replace({prev}.w_sym, {pat}, {fused})"
            f" AS w_sym, freq FROM {prev} CROSS JOIN b{r})"
        )
        selects.append(
            f"SELECT {r} AS round, pair AS merged_pair, cnt AS pair_count"
            f" FROM b{r}"
        )
    body = "\nUNION ALL\n".join(selects)
    return (
        "WITH " + ",\n".join(ctes) + "\nSELECT * FROM (" + body + ")"
        " ORDER BY round"
    )


@register("text_bpe_merge_rounds", oracle=_bpe_sql("duckdb"))
def text_bpe_merge_rounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE tokenizer training, first three merge rounds, entirely in SQL on
    both engines: word types are symbolized with each symbol wrapped in
    its own spaces, each round counts adjacent symbol pairs weighted by
    word frequency, fuses the heaviest pair corpus-wide, and feeds the
    rewritten vocabulary to the next round — the core loop of
    byte-pair-encoding vocabulary learning (Sennrich et al.), unrolled as
    chained CTEs. Complements text_bpe_pair_stats (round-0 stats only).

    Determinism & exactness: pair weights are exact integer sums; the
    winning pair is a (count desc, pair asc) total order; and because
    every symbol carries its OWN delimiters, adjacent pair occurrences
    share no characters, so the engines' left-to-right non-overlapping
    replace IS the exact Sennrich greedy merge (see _bpe_sql for the
    boundary-sharing bug this encoding eliminates); the fused token (no
    inner space) can never recreate the pattern mid-scan.

    Scale shape: every round operates on the WORD-TYPE table (vocabulary
    cardinality), not the corpus — the corpus is touched once, by the
    freq-counting aggregate with map-side combine. Pair counting explodes
    ≤ (max word length) pairs per type; the argmax is a 1-row TakeOrdered
    broadcast back into the rewrite. That is exactly why BPE trainers run
    on word counts: rounds cost O(vocab), so 100 TB of text costs the
    same per round as the deduplicated vocabulary it induces."""
    from duckdb_fastlanes_spark.catalog import sql_q

    return sql_q(spark, sf_dir, _bpe_sql("spark"))
