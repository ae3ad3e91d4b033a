"""Similarity search over the ``embeddings`` table (array<float> column).

Beyond-reference extension (SURVEY.md §7 build plan step 5; BASELINE.json
north star): the reference has no vector operators — its dormant JPEG column
type (row_group_statistics.cpp:116) is the only hint of non-relational data.


Two paths, per the build plan:
- brute-force cosine top-k: the correctness baseline — one scan, JVM-side
  zip_with/aggregate dot product, TakeOrdered top-k. At scale this is the
  per-query fallback and the verifier for the ANN path.
- IVF-style bucketed ANN: assign every vector to its nearest coarse centroid
  (here: the first NLIST vectors as fixed centroids — deterministic and
  oracle-expressible; k-means at scale), then search only the query's cell.
  Scale shape: centroid assignment is a broadcast-join projection; the search
  touches 1/NLIST of the data per query.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from duckdb_fastlanes_spark.catalog import table
from duckdb_fastlanes_spark.registry import register

QUERY_VEC_ID = 0  # deterministic query vector: embedding of vec_id 0
TOP_K = 10
NLIST = 8  # IVF coarse cells (centroids = vec_id 0..7, deterministic)
#: batch search: all vectors with vec_id < N_QUERIES are query vectors
N_QUERIES = 5


def _dot(x: Column, y: Column) -> Column:
    return F.aggregate(F.zip_with(x, y, lambda p, q: p * q), F.lit(0.0), lambda a, v: a + v)


def _norm(x: Column) -> Column:
    return F.sqrt(F.aggregate(x, F.lit(0.0), lambda a, v: a + v * v))


def _cosine(x: Column, y: Column) -> Column:
    return _dot(x, y) / (_norm(x) * _norm(y))


def _cos_py(a: list[float], b: list[float]) -> float:
    """Driver-side twin of _cosine for bounded lookups (the query vector,
    {NLIST} centroids): identical left-to-right IEEE double summation as
    Spark's ``aggregate(zip_with(...))``, so a driver-computed cell/bucket
    choice can never disagree with the indexed assignment."""
    import math

    dot = 0.0
    for x, y in zip(a, b):
        dot += x * y
    na = 0.0
    for x in a:
        na += x * x
    nb = 0.0
    for y in b:
        nb += y * y
    return dot / (math.sqrt(na) * math.sqrt(nb))


def _fetch_vec(sf_dir: str, vec_id: int) -> list[float] | None:
    """One embedding row, read driver-side from the parquet file (predicate-
    pushed single-row-group read — corpus-size-independent; the query vector
    is CLIENT INPUT in a real deployment, so fetching it must not cost a
    Spark job's floor)."""
    import os

    import pyarrow.dataset as pads

    tbl = pads.dataset(os.path.join(sf_dir, "embeddings.parquet")).to_table(
        columns=["embedding"], filter=pads.field("vec_id") == vec_id
    )
    if tbl.num_rows == 0:
        # query id absent (e.g. empty corpus): signal the caller, which
        # returns a well-typed empty result (empty-catalog robustness gate)
        return None
    return [float(x) for x in tbl.column(0)[0].as_py()]



def _empty_topk(spark: SparkSession, ddl: str = "vec_id bigint, cosine double"):
    """Well-typed empty result for ANN queries whose query vector is absent
    from the corpus (empty-catalog robustness gate)."""
    return spark.createDataFrame([], ddl)


def _ivf_centroids(sf_dir: str) -> dict[int, list[float]]:
    """The {NLIST} fixed coarse centroid vectors (vec_id 0..NLIST-1), read
    driver-side — a bounded lookup, independent of corpus size."""
    import os

    import pyarrow.dataset as pads

    tbl = pads.dataset(os.path.join(sf_dir, "embeddings.parquet")).to_table(
        columns=["vec_id", "embedding"], filter=pads.field("vec_id") < NLIST
    )
    return {
        int(vid): [float(x) for x in emb]
        for vid, emb in zip(tbl.column(0).to_pylist(), tbl.column(1).to_pylist())
    }


def _staged_index(
    sf_dir: str, family: str, key_parts: list, partition_col: str, build
) -> str:
    """Shared memoized-staging discipline for every embedding index
    (_ivf_index / _kmeans_index / _srp_index): fingerprint the source
    parquet (path, size, mtime_ns, ino) + the index derivation, build ONCE,
    serve forever for that corpus version.

    The publish is ATOMIC (r8 code review): each builder writes into its
    own pid-suffixed tmp root and os.rename()s it into place only when
    complete, so two concurrent first callers (parallel pytest + bench on
    the shared VM) can never interleave part-files under one marker — the
    rename loser simply discards its copy and serves the winner's. The
    _INDEX_OK marker is written inside the tmp root BEFORE the rename, so
    a crash mid-build leaves only an ignored tmp dir, never a half-index
    that looks finished."""
    import hashlib
    import json
    import os
    import shutil
    import tempfile

    src = os.path.join(sf_dir, "embeddings.parquet")
    st = os.stat(src)
    key = hashlib.md5(
        json.dumps(
            [os.path.abspath(src), st.st_size, st.st_mtime_ns, st.st_ino]
            + key_parts
        ).encode()
    ).hexdigest()[:16]
    root = os.path.join(tempfile.gettempdir(), f"dfs_{family}", key)
    marker = os.path.join(root, "_INDEX_OK")
    if os.path.exists(marker):
        return root
    tmp = f"{root}.tmp-{os.getpid()}"
    shutil.rmtree(tmp, ignore_errors=True)
    build().repartition(partition_col).write.mode("overwrite").partitionBy(
        partition_col
    ).parquet(tmp)
    with open(os.path.join(tmp, "_INDEX_OK"), "w") as fh:
        fh.write("ok")
    try:
        os.rename(tmp, root)
    except OSError:
        # a concurrent builder won the rename; serve its complete copy
        shutil.rmtree(tmp, ignore_errors=True)
    return root


def _ivf_index(spark: SparkSession, sf_dir: str) -> str:
    """Cell-clustered embedding index: one pass assigns every vector to its
    nearest fixed centroid (broadcast join + max_by, the same expression the
    previous per-query form ran) and lands the corpus as parquet PARTITIONED
    BY cell — ingest once, query many, exactly like _srp_index. Memoized +
    atomically published via _staged_index."""

    def build() -> DataFrame:
        v = _doubled(table(spark, sf_dir, "embeddings"))
        cents = F.broadcast(
            v.filter(F.col("vec_id") < NLIST).select(
                F.col("vec_id").alias("cent_id"), F.col("e").alias("ce")
            )
        )
        scored = v.crossJoin(cents).select(
            "vec_id", "e", "cent_id", _cosine(F.col("e"), F.col("ce")).alias("cscore")
        )
        # nearest centroid per vector: max_by on (score, -cent_id) with the
        # same DESC, cent_id ASC tie rule as the oracle's ORDER BY ... LIMIT 1
        return scored.groupBy("vec_id").agg(
            F.expr("max_by(cent_id, struct(cscore, -cent_id))").alias("cell"),
            F.first("e").alias("e"),
        )

    return _staged_index(sf_dir, "ivf_index", [NLIST, "ivf_index_v1"], "cell", build)


def _doubled(df: DataFrame) -> DataFrame:
    # selectExpr: one JVM parse instead of a deep Py4J Column tree (the
    # construction cost dominates sub-second queries; see bench notes).
    return df.selectExpr("vec_id", "label", "CAST(embedding AS array<double>) AS e")


@register(
    "sim_bruteforce_topk",
    oracle=f"""
    WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
    q AS (SELECT e AS qe FROM v WHERE vec_id = {QUERY_VEC_ID})
    SELECT v.vec_id, round(list_cosine_similarity(v.e, q.qe), 4) AS cosine
    FROM v, q
    WHERE v.vec_id <> {QUERY_VEC_ID}
    ORDER BY list_cosine_similarity(v.e, q.qe) DESC, v.vec_id
    LIMIT {TOP_K}
    """,
)
def sim_bruteforce_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k against the vec_id={QUERY_VEC_ID} query vector.
    Query vector joins in as a broadcast single-row frame (no collect); top-k
    is TakeOrderedAndProject — no global sort."""
    from duckdb_fastlanes_spark.catalog import sql_q

    # single-parse SQL body (r7): one JVM parse instead of the 7-call
    # Column pipeline — the TakeOrderedAndProject + broadcast plan is
    # unchanged (BROADCAST hint on the single-row query side)
    return sql_q(
        spark,
        sf_dir,
        f"""
        SELECT vec_id, round(_cos, 4) AS cosine FROM (
            SELECT /*+ BROADCAST(q) */ v.vec_id,
                   aggregate(zip_with(v.e, q.qe, (x, y) -> x * y), 0D,
                             (acc, x) -> acc + x)
                   / (sqrt(aggregate(v.e, 0D, (acc, x) -> acc + x * x))
                      * sqrt(aggregate(q.qe, 0D, (acc, x) -> acc + x * x)))
                     AS _cos
            FROM (SELECT vec_id, CAST(embedding AS array<double>) AS e
                  FROM embeddings WHERE vec_id <> {QUERY_VEC_ID}) v
            CROSS JOIN (SELECT CAST(embedding AS array<double>) AS qe
                        FROM embeddings WHERE vec_id = {QUERY_VEC_ID}) q
            ORDER BY _cos DESC, vec_id
            LIMIT {TOP_K}
        )
        """,
    )


@register(
    "sim_ivf_topk",
    oracle=f"""
    WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
    cents AS (SELECT vec_id AS cent_id, e AS ce FROM v WHERE vec_id < {NLIST}),
    assigned AS (
        SELECT v.vec_id, v.e,
               (SELECT c.cent_id FROM cents c
                ORDER BY list_cosine_similarity(v.e, c.ce) DESC, c.cent_id
                LIMIT 1) AS cell
        FROM v
    ),
    q AS (SELECT e AS qe, cell AS qcell FROM assigned WHERE vec_id = {QUERY_VEC_ID})
    SELECT a.vec_id, round(list_cosine_similarity(a.e, q.qe), 4) AS cosine
    FROM assigned a, q
    WHERE a.cell = q.qcell AND a.vec_id <> {QUERY_VEC_ID}
    ORDER BY list_cosine_similarity(a.e, q.qe) DESC, a.vec_id
    LIMIT {TOP_K}
    """,
)
def sim_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-bucketed ANN over a CELL-CLUSTERED index: one ingest pass assigns
    every vector to the nearest of {NLIST} fixed coarse centroids (broadcast
    join + max_by) and lands the corpus partitioned by cell (_ivf_index,
    memoized like _srp_index — ingest once, query many); a query then
    brute-forces ONLY its own cell's directory, read with partition
    pruning. Per-query work is one job over |cell| ≈ n/NLIST rows —
    corpus-size work happens at ingest, never at query time, which is what
    an IVF index means at 100 TB (measured at the 1000× cell: 5.3 s
    recompute-per-query → 0.7 s; the DuckDB oracle recomputes the full
    assignment per run, 3.6 s).

    Driver-side work is bounded and corpus-size-independent: the query
    vector and the {NLIST} centroid vectors are single-row-group parquet
    reads, and the query's cell is computed in Python with the same
    left-to-right IEEE summation as the Spark assignment expression
    (_cos_py twins _cosine), so the probed cell always matches the indexed
    assignment."""
    import os

    idx = _ivf_index(spark, sf_dir)
    qe = _fetch_vec(sf_dir, QUERY_VEC_ID)
    if qe is None:
        return _empty_topk(spark)
    cents = _ivf_centroids(sf_dir)
    qcell = max(
        sorted(cents), key=lambda cid: (_cos_py(qe, cents[cid]), -cid)
    )
    cand = spark.read.parquet(os.path.join(idx, f"cell={qcell}")).where(
        f"vec_id <> {QUERY_VEC_ID}"
    )
    qarr = "array(" + ", ".join(f"{x!r}D" for x in qe) + ")"
    cos = (
        f"aggregate(zip_with(e, {qarr}, (p, q) -> p * q), 0D, (a, v) -> a + v)"
        f" / (sqrt(aggregate(e, 0D, (a, v) -> a + v * v))"
        f" * sqrt(aggregate({qarr}, 0D, (a, v) -> a + v * v)))"
    )
    return (
        cand.selectExpr("vec_id", f"{cos} AS _cos")
        .orderBy(F.col("_cos").desc(), F.col("vec_id"))
        .limit(TOP_K)
        .selectExpr("vec_id", "round(_cos, 4) AS cosine")
    )


@register(
    "sim_ivf_batch_topk",
    oracle=f"""
    WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
    cents AS (SELECT vec_id AS cent_id, e AS ce FROM v WHERE vec_id < {NLIST}),
    assigned AS (
        SELECT v.vec_id, v.e,
               (SELECT c.cent_id FROM cents c
                ORDER BY list_cosine_similarity(v.e, c.ce) DESC, c.cent_id
                LIMIT 1) AS cell
        FROM v
    ),
    q AS (SELECT vec_id AS query_id, e AS qe, cell AS qcell
          FROM assigned WHERE vec_id < {N_QUERIES}),
    scored AS (
        SELECT q.query_id, a.vec_id,
               list_cosine_similarity(a.e, q.qe) AS cos
        FROM assigned a JOIN q ON a.cell = q.qcell
        WHERE a.vec_id <> q.query_id
    ),
    ranked AS (
        SELECT *, row_number() OVER (PARTITION BY query_id
                                     ORDER BY cos DESC, vec_id) AS rk
        FROM scored
    )
    SELECT query_id, vec_id, round(cos, 4) AS cosine
    FROM ranked WHERE rk <= {TOP_K}
    ORDER BY query_id, cosine DESC, vec_id
    """,
)
def sim_ivf_batch_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch ANN SERVING over the IVF index: {N_QUERIES} queries answered in
    one job, each probing ONLY its own cell — the union of probed cell
    directories is read once with partition pruning (basePath keeps the
    ``cell`` column so a row only scores against the queries that probe its
    cell), and per-query top-{TOP_K} is a ranking window partitioned by
    query_id. The production shape: query batches share one pruned scan of
    ≤ batch-distinct-cells/NLIST of the corpus, vs sim_batch_topk's full
    brute-force pass (the exactness baseline). Driver work is bounded:
    {N_QUERIES} single-row-group vector fetches + {NLIST} centroids."""
    import os

    idx = _ivf_index(spark, sf_dir)
    cents = _ivf_centroids(sf_dir)
    qrows = []
    for qid in range(N_QUERIES):
        qe = _fetch_vec(sf_dir, qid)
        if qe is None:
            # absent query id: skip it (matches the oracle, whose query set
            # is `WHERE vec_id < N_QUERIES` over the actual corpus), rather
            # than dropping the whole batch (r8 ADVICE)
            continue
        qcell = max(sorted(cents), key=lambda c: (_cos_py(qe, cents[c]), -c))
        qrows.append((qid, qe, qcell))
    if not qrows:
        return _empty_topk(spark, "query_id bigint, vec_id bigint, cosine double")
    paths = sorted(
        {
            p
            for _, _, c in qrows
            if os.path.isdir(p := os.path.join(idx, f"cell={c}"))
        }
    )
    cand = spark.read.option("basePath", idx).parquet(*paths)
    # r11 (guide §4): values_df — the Python-RDD-backed createDataFrame
    # spun Python worker tasks just to emit the ≤N_QUERIES query rows on
    # every broadcast build; a typed VALUES literal is a JVM LocalRelation
    from duckdb_fastlanes_spark.catalog import values_df

    q = F.broadcast(
        values_df(spark, qrows, "query_id bigint, qe array<double>, qcell int")
    )
    from pyspark.sql.window import Window

    scored = (
        cand.join(q, (F.col("cell") == F.col("qcell")) & (F.col("vec_id") != F.col("query_id")))
        .select("query_id", "vec_id", _cosine(F.col("e"), F.col("qe")).alias("cos"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= TOP_K)
        .select("query_id", "vec_id", F.round("cos", 4).alias("cosine"))
        .orderBy("query_id", F.col("cosine").desc(), "vec_id")
    )


@register(
    "sim_ivf_probe2_topk",
    oracle=f"""
    WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
    cents AS (SELECT vec_id AS cent_id, e AS ce FROM v WHERE vec_id < {NLIST}),
    assigned AS (
        SELECT v.vec_id, v.e,
               (SELECT c.cent_id FROM cents c
                ORDER BY list_cosine_similarity(v.e, c.ce) DESC, c.cent_id
                LIMIT 1) AS cell
        FROM v
    ),
    q AS (SELECT e AS qe FROM v WHERE vec_id = {QUERY_VEC_ID}),
    qcells AS (
        SELECT c.cent_id AS pc FROM cents c, q
        ORDER BY list_cosine_similarity(q.qe, c.ce) DESC, c.cent_id
        LIMIT 2
    )
    SELECT a.vec_id, round(list_cosine_similarity(a.e, q.qe), 4) AS cosine
    FROM assigned a, q
    WHERE a.cell IN (SELECT pc FROM qcells) AND a.vec_id <> {QUERY_VEC_ID}
    ORDER BY list_cosine_similarity(a.e, q.qe) DESC, a.vec_id
    LIMIT {TOP_K}
    """,
)
def sim_ivf_probe2_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF with nprobe=2 — the recall/latency knob every production IVF
    index exposes: a query near a cell boundary misses neighbors assigned
    to the adjacent cell, so probing the 2 nearest centroids' cells trades
    ~2× scanned rows for recall (still ≤ 2n/NLIST of the corpus, read via
    partition pruning from the same _ivf_index as sim_ivf_topk — the index
    is built once and serves every nprobe). Cell choice is the same
    driver-side bounded computation (_cos_py over {NLIST} centroids),
    tie-ruled identically to the oracle's ORDER BY ... LIMIT 2."""
    import os

    idx = _ivf_index(spark, sf_dir)
    qe = _fetch_vec(sf_dir, QUERY_VEC_ID)
    if qe is None:
        return _empty_topk(spark)
    cents = _ivf_centroids(sf_dir)
    probe = sorted(
        sorted(cents), key=lambda cid: (-_cos_py(qe, cents[cid]), cid)
    )[:2]
    paths = [p for p in (os.path.join(idx, f"cell={c}") for c in probe) if os.path.isdir(p)]
    cand = spark.read.parquet(*paths).where(f"vec_id <> {QUERY_VEC_ID}")
    qarr = "array(" + ", ".join(f"{x!r}D" for x in qe) + ")"
    cos = (
        f"aggregate(zip_with(e, {qarr}, (p, q) -> p * q), 0D, (a, v) -> a + v)"
        f" / (sqrt(aggregate(e, 0D, (a, v) -> a + v * v))"
        f" * sqrt(aggregate({qarr}, 0D, (a, v) -> a + v * v)))"
    )
    return (
        cand.selectExpr("vec_id", f"{cos} AS _cos")
        .orderBy(F.col("_cos").desc(), F.col("vec_id"))
        .limit(TOP_K)
        .selectExpr("vec_id", "round(_cos, 4) AS cosine")
    )


#: Lloyd iterations for the learned-centroid IVF coarse quantizer
KM_ITERS = 8
#: integer quantization unit for the exact k-means arithmetic (micro-units)
KM_QUANT = "1e6"


def _kmeans_fit_sql(dialect: str) -> str:
    """Deterministic Lloyd's k-means as a CTE chain, generated for BOTH
    dialects from one template — the cross-engine-exact coarse-quantizer
    training that upgrades sim_ivf_kmeans_topk from rows-only to a full
    hash oracle (r9; the sim_pq_topk md5-codebook precedent, extended from
    a deterministic *sample* to a deterministic *training loop*).

    Exactness design: every arithmetic step is either exact-integer or an
    IEEE operation on identical operands, so the fit is bit-identical
    across engines AND across partition layouts (integer sums are
    commutative/associative — the same property that makes the fit
    reduction-order-safe on a 1000-executor cluster):

    - quantize: vu = CAST(round(e[d] * {KM_QUANT}, 0) AS BIGINT) — exact.
    - init: SRP-style sign buckets. The 3 corpus vectors with smallest
      md5(vec_id) act as hyperplanes; each vector's 3-bit sign pattern of
      exact integer dot products picks one of NLIST=8 buckets; initial
      centroids are per-bucket means (spread by construction — measured
      recall@10 0.48 vs 0.26 for a plain md5-sample init).
    - iterate KM_ITERS times: assign = argmin of exact-integer squared-L2
      (tie → smallest cid); update = per-dim mean, re-quantized to integer
      units via round(sum/count) (sum exact ≤ 2^53, division and round on
      identical operands → identical both engines).

    The corpus here is unit-norm so integer squared-L2 argmin equals
    cosine argmax — spherical k-means, matching the cosine probe."""
    if dialect == "duckdb":
        v = "SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings"
        cl = (
            "SELECT vec_id, generate_subscripts(e, 1) AS d, "
            f"CAST(round(unnest(e) * {KM_QUANT}, 0) AS BIGINT) AS vu FROM v"
        )
        md5cast = "md5(CAST(vec_id AS VARCHAR))"
        # DuckDB inlines CTEs; the deep chain is referenced twice by the
        # final query, so pin the expensive nodes or the fit runs twice
        mat = " MATERIALIZED"
    else:
        v = "SELECT vec_id, CAST(embedding AS array<double>) AS e FROM embeddings"
        cl = (
            f"SELECT vec_id, pos + 1 AS d, CAST(round(ev * {KM_QUANT}, 0) AS BIGINT) AS vu "
            "FROM (SELECT vec_id, posexplode(e) AS (pos, ev) FROM v) x"
        )
        md5cast = "md5(CAST(vec_id AS STRING))"
        mat = ""
    parts = [
        f"v AS ({v})",
        f"cl AS{mat} ({cl})",
        # 3 deterministic hyperplanes: smallest-md5 corpus vectors
        # (sort+limit → TakeOrdered in Spark, never a global window)
        "hp AS (SELECT row_number() OVER (ORDER BY h, vec_id) - 1 AS hid, vec_id "
        f"FROM (SELECT {md5cast} AS h, vec_id FROM v ORDER BY h, vec_id LIMIT 3) t)",
        "hpl AS (SELECT hp.hid, cl.d, cl.vu AS hu FROM hp JOIN cl ON hp.vec_id = cl.vec_id)",
        # SRP bucket = 3-bit sign pattern of exact integer dot products
        "sgn AS (SELECT cl.vec_id, "
        "sum(CASE WHEN hpl.hid = 0 THEN cl.vu * hpl.hu ELSE 0 END) AS s0, "
        "sum(CASE WHEN hpl.hid = 1 THEN cl.vu * hpl.hu ELSE 0 END) AS s1, "
        "sum(CASE WHEN hpl.hid = 2 THEN cl.vu * hpl.hu ELSE 0 END) AS s2 "
        "FROM cl JOIN hpl ON cl.d = hpl.d GROUP BY cl.vec_id)",
        "bkt AS (SELECT vec_id, 4 * CASE WHEN s0 >= 0 THEN 1 ELSE 0 END "
        "+ 2 * CASE WHEN s1 >= 0 THEN 1 ELSE 0 END "
        "+ CASE WHEN s2 >= 0 THEN 1 ELSE 0 END AS cid FROM sgn)",
        "c0 AS (SELECT b.cid, cl.d, "
        "CAST(round(CAST(sum(cl.vu) AS DOUBLE) / count(*), 0) AS BIGINT) AS cu "
        "FROM bkt b JOIN cl ON b.vec_id = cl.vec_id GROUP BY b.cid, cl.d)",
    ]
    for t in range(1, KM_ITERS + 1):
        parts.append(
            f"d{t} AS (SELECT cl.vec_id, c.cid, "
            "sum((cl.vu - c.cu) * (cl.vu - c.cu)) AS d2 "
            f"FROM cl JOIN c{t - 1} c ON cl.d = c.d GROUP BY cl.vec_id, c.cid)"
        )
        last = mat if t == KM_ITERS else ""
        parts.append(
            f"a{t} AS{last} (SELECT vec_id, cid AS cell FROM (SELECT vec_id, cid, "
            f"row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rk "
            f"FROM d{t}) r WHERE rk = 1)"
        )
        if t < KM_ITERS:
            parts.append(
                f"c{t} AS (SELECT a.cell AS cid, cl.d, "
                "CAST(round(CAST(sum(cl.vu) AS DOUBLE) / count(*), 0) AS BIGINT) AS cu "
                f"FROM a{t} a JOIN cl ON a.vec_id = cl.vec_id GROUP BY a.cell, cl.d)"
            )
    return "WITH " + ",\n".join(parts)


def _kmeans_index(spark: SparkSession, sf_dir: str) -> str:
    """Learned-centroid IVF index: ONE deterministic k-means fit
    (_kmeans_fit_sql — exact-integer Lloyd, SRP-bucket init) assigns every
    vector to its learned cell and lands the corpus as parquet PARTITIONED
    BY cell — ingest once, query many, exactly like _ivf_index / _srp_index
    (the fixed-centroid and hyperplane siblings). The fitted assignment is
    an INDEX artifact, not per-query work: production IVF trains its coarse
    quantizer once per corpus version and serves millions of queries from
    it, so refitting on every top-k call both mismodels the workload and
    burns a full training job per query. Memoized + atomically published
    via _staged_index (fingerprint: source parquet + k + iterations)."""

    def build() -> DataFrame:
        from duckdb_fastlanes_spark.catalog import sql_q

        return sql_q(
            spark,
            sf_dir,
            _kmeans_fit_sql("spark")
            + f"\nSELECT v.vec_id, v.e, a.cell FROM v JOIN a{KM_ITERS} a USING (vec_id)",
        )

    return _staged_index(
        sf_dir, "kmeans_index", [NLIST, KM_ITERS, "kmeans_index_v2_srp_lloyd"],
        "cell", build,
    )


@register(
    "sim_ivf_kmeans_topk",
    oracle=_kmeans_fit_sql("duckdb")
    + f"""
, assigned AS (SELECT v.vec_id, v.e, a.cell FROM v JOIN a{KM_ITERS} a USING (vec_id)),
q AS (SELECT e AS qe, cell AS qcell FROM assigned WHERE vec_id = {QUERY_VEC_ID})
SELECT a.vec_id, round(list_cosine_similarity(a.e, q.qe), 4) AS cosine
FROM assigned a, q
WHERE a.cell = q.qcell AND a.vec_id <> {QUERY_VEC_ID}
ORDER BY list_cosine_similarity(a.e, q.qe) DESC, a.vec_id
LIMIT {TOP_K}
""",
)
def sim_ivf_kmeans_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF with *learned* coarse centroids — the production ANN path;
    sim_ivf_topk's fixed-centroid variant is the structural twin. Training
    is a deterministic exact-integer Lloyd's k-means (_kmeans_fit_sql:
    SRP-sign-bucket init, KM_ITERS assign/update rounds in integer
    micro-units) that runs ONCE per corpus version as index ingest
    (_kmeans_index, memoized exactly like _ivf_index); the query then
    brute-forces ONLY its own cell's directory, exactly like sim_ivf_topk.
    The query row's learned cell is read driver-side from the staged index
    itself (one predicate-pushed single-row parquet read,
    corpus-size-independent — the assignment was made by the fit, so no
    driver-side re-derivation can disagree).

    FULL HASH ORACLE (r9, closing the last learned-path rows-only check):
    because the fit is bit-identical across engines (exact integer sums are
    reduction-order-invariant — the same property that makes it safe on a
    1000-executor cluster), the DuckDB oracle replays the ENTIRE pipeline
    (init → 8 Lloyd rounds → assign → probe → top-k) and hashes equal.
    recall@10 vs brute force is now a deterministic corpus constant
    (0.34 sf0.001 / 0.48 sf0.01 / 0.34 sf0.1 — the generic-quality band
    of the old seeded fit, whose lucky seed-42 read 0.52 against
    0.30-0.36 for every other seed); pytest pins the sf0.001 constant
    EXACTLY, a tighter gate than any lucky-seed threshold."""
    import os

    import pyarrow.dataset as pads

    src = pads.dataset(os.path.join(sf_dir, "embeddings.parquet"))
    if src.count_rows() == 0:
        # nothing to fit or probe (empty-catalog robustness gate)
        return _empty_topk(spark)
    idx = _kmeans_index(spark, sf_dir)
    ds = pads.dataset(idx, partitioning="hive")
    qrow = ds.to_table(
        columns=["e", "cell"], filter=pads.field("vec_id") == QUERY_VEC_ID
    )
    if qrow.num_rows == 0:
        return _empty_topk(spark)
    qe = [float(x) for x in qrow.column("e")[0].as_py()]
    qcell = int(qrow.column("cell")[0].as_py())
    cand = spark.read.parquet(os.path.join(idx, f"cell={qcell}")).where(
        f"vec_id <> {QUERY_VEC_ID}"
    )
    qarr = "array(" + ", ".join(f"{x!r}D" for x in qe) + ")"
    # the query norm is a CONSTANT: computed once driver-side (same
    # left-to-right IEEE fold as the HOF would run) and embedded as a
    # literal instead of re-folding the 64-element array per candidate row
    # in an interpreted lambda — this query has no SQL oracle requiring
    # expression-level parity (r8 code review)
    qn = 0.0
    for x in qe:
        qn += x * x
    import math

    cos = (
        f"aggregate(zip_with(e, {qarr}, (p, q) -> p * q), 0D, (a, v) -> a + v)"
        f" / (sqrt(aggregate(e, 0D, (a, v) -> a + v * v))"
        f" * {math.sqrt(qn)!r}D)"
    )
    return (
        cand.selectExpr("vec_id", f"{cos} AS _cos")
        .orderBy(F.col("_cos").desc(), F.col("vec_id"))
        .limit(TOP_K)
        .selectExpr("vec_id", "round(_cos, 4) AS cosine")
    )


#: product quantization: M subspaces × SUBDIM dims, K centroids per subspace
PQ_M, PQ_SUBDIM, PQ_K = 8, 8, 16

#: the SQL-text twin of _subvectors, DERIVED from PQ_M/PQ_SUBDIM exactly as
#: the DuckDB oracle derives its slices — hardcoding the eight 8-wide slices
#: in the Spark body silently desyncs it from the constants (r7 ADVICE)
_PQ_SLICES_SQL = ", ".join(
    f"slice(e, {m * PQ_SUBDIM + 1}, {PQ_SUBDIM})" for m in range(PQ_M)
)


def _subvectors(col: Column) -> Column:
    """Split a PQ_M×PQ_SUBDIM vector into an array of PQ_M subvectors."""
    return F.array(
        *[F.slice(col, m * PQ_SUBDIM + 1, PQ_SUBDIM) for m in range(PQ_M)]
    )


def _sq_l2(x: Column, y: Column) -> Column:
    return F.aggregate(
        F.zip_with(x, y, lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


# the squared-L2 over one PQ_SUBDIM subvector, unrolled as a left-associative
# sum: IEEE-identical to Spark's _sq_l2 fold (((0+t1)+t2)+... with 0.0+t1==t1),
# so the nano-unit quantized distances — and therefore the ADC ranking and
# every output value — match the Spark side bit-for-bit
_PQ_D2_SQL = "+".join(
    f"(sub[{i}]-c_sub[{i}])*(sub[{i}]-c_sub[{i}])" for i in range(1, PQ_SUBDIM + 1)
)


@register(
    "sim_pq_topk",
    oracle=f"""
    WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
    seeds AS (
      SELECT * FROM (
        SELECT row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1
                 AS cid, e
        FROM v) WHERE cid < {PQ_K}
    ),
    cb AS (SELECT cid, m, e[m*{PQ_SUBDIM}+1 : m*{PQ_SUBDIM}+{PQ_SUBDIM}] AS c_sub
           FROM seeds, range({PQ_M}) t(m)),
    corpus AS (SELECT vec_id, m, e[m*{PQ_SUBDIM}+1 : m*{PQ_SUBDIM}+{PQ_SUBDIM}] AS sub
               FROM v, range({PQ_M}) t(m)),
    codes AS (
      SELECT vec_id, m, cid FROM (
        SELECT corpus.vec_id, corpus.m, cb.cid,
               row_number() OVER (PARTITION BY corpus.vec_id, corpus.m
                                  ORDER BY {_PQ_D2_SQL}, cb.cid) AS rk
        FROM corpus JOIN cb USING (m)) WHERE rk = 1
    ),
    qsubs AS (SELECT m, e[m*{PQ_SUBDIM}+1 : m*{PQ_SUBDIM}+{PQ_SUBDIM}] AS sub
              FROM v, range({PQ_M}) t(m) WHERE vec_id = {QUERY_VEC_ID}),
    lut AS (
      SELECT m, cid, CAST(round(({_PQ_D2_SQL}) * 1e9) AS BIGINT) AS du
      FROM qsubs JOIN cb USING (m)
    )
    SELECT vec_id, SUM(du) / 1e9 AS adc_dist
    FROM codes JOIN lut USING (m, cid)
    WHERE vec_id <> {QUERY_VEC_ID}
    GROUP BY vec_id
    ORDER BY SUM(du), vec_id
    LIMIT {TOP_K}
    """,
)
def sim_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN (ADC): each vector compresses to PQ_M 4-bit
    codes (64 dims → 8 bytes, a 32× memory cut), queries scan codes with a
    PQ_M×PQ_K lookup table of subspace distances. This is the memory side of
    the ANN scale path — IVF bounds how much is SEARCHED, PQ bounds what a
    100 TB corpus COSTS TO HOLD; production systems (FAISS IVFPQ) compose
    both.

    Codebook: the PQ_K corpus vectors with smallest md5(vec_id) — a
    deterministic sample standing in for per-subspace k-means (sampling the
    corpus for codebook training is standard PQ practice). Scale shape:
    codebook is a 128-row broadcast; encoding is a broadcast-join argmin per
    (vector, subspace) — embarrassingly parallel, no shuffle wider than the
    codes themselves; the query ADC is a 128-entry broadcast lookup join +
    per-vector sum. Subspace distances quantize to integer nano-units before
    the sum, so the ADC ranking is exact-integer and layout-invariant.

    Full hash oracle (r7): the md5-sample codebook is deterministic SQL, so
    the ENTIRE pipeline (codebook → encode → LUT → ADC) is mirrored in the
    DuckDB oracle with the identical left-associative squared-L2 summation
    and nano-unit rounding — bit-exact, not rows-only."""
    from duckdb_fastlanes_spark.catalog import sql_q

    # single-parse SQL body (r7); identical plan to the Column form
    # (broadcast codebook/LUT, map-side min_by argmin, TakeOrdered)
    return sql_q(
        spark,
        sf_dir,
        f"""
        WITH v AS (SELECT vec_id, CAST(embedding AS array<double>) AS e
                   FROM embeddings),
        seeds AS (
            SELECT * FROM (
                SELECT row_number() OVER (
                           ORDER BY md5(CAST(vec_id AS STRING)), vec_id) - 1
                         AS cid, e
                FROM v) WHERE cid < {PQ_K}),
        cb AS (SELECT cid, m, sub AS c_sub FROM (
                   SELECT cid, posexplode(array({_PQ_SLICES_SQL})) AS (m, sub)
                   FROM seeds)),
        corpus AS (SELECT vec_id, m, sub FROM (
                       SELECT vec_id, posexplode(array({_PQ_SLICES_SQL})) AS (m, sub)
                       FROM v)),
        codes AS (
            SELECT /*+ BROADCAST(cb) */ vec_id, m,
                   min_by(cid, struct(aggregate(zip_with(sub, c_sub, (a, b) -> (a - b) * (a - b)), 0.0D, (acc, v) -> acc + v) AS d, cid)) AS cid
            FROM corpus JOIN cb USING (m)
            GROUP BY vec_id, m),
        lut AS (
            SELECT m, cid,
                   CAST(round(aggregate(zip_with(sub, c_sub, (a, b) -> (a - b) * (a - b)), 0.0D, (acc, v) -> acc + v) * 1e9) AS BIGINT) AS du
            FROM (SELECT m, sub FROM (
                      SELECT vec_id, posexplode(array({_PQ_SLICES_SQL})) AS (m, sub)
                      FROM v) WHERE vec_id = {QUERY_VEC_ID}) q
            JOIN cb USING (m))
        SELECT vec_id, adc_u / 1e9 AS adc_dist
        FROM (SELECT /*+ BROADCAST(lut) */ vec_id, sum(du) AS adc_u
              FROM codes JOIN lut USING (m, cid)
              WHERE vec_id <> {QUERY_VEC_ID}
              GROUP BY vec_id)
        ORDER BY adc_u, vec_id
        LIMIT {TOP_K}
        """,
    )


@register(
    "sim_batch_topk",
    oracle=f"""
    WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
    q AS (SELECT vec_id AS query_id, e AS qe FROM v WHERE vec_id < {N_QUERIES}),
    scored AS (
        SELECT q.query_id, v.vec_id,
               list_cosine_similarity(v.e, q.qe) AS cos
        FROM v, q
        WHERE v.vec_id <> q.query_id
    ),
    ranked AS (
        SELECT *, row_number() OVER (PARTITION BY query_id
                                     ORDER BY cos DESC, vec_id) AS rk
        FROM scored
    )
    SELECT query_id, vec_id, round(cos, 4) AS cosine
    FROM ranked WHERE rk <= {TOP_K}
    ORDER BY query_id, cosine DESC, vec_id
    """,
)
def sim_batch_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch similarity search: top-{TOP_K} for {N_QUERIES} query vectors in
    ONE pass — the serving shape (queries arrive in batches, never one scan
    per query). The query set broadcasts against the corpus; per-query top-k
    is a ranking window partitioned by query_id, so adding queries widens the
    broadcast, not the number of scans."""
    from duckdb_fastlanes_spark.catalog import sql_q

    # single-parse SQL body (r7); same plan: broadcast query batch,
    # per-query ranking window
    return sql_q(
        spark,
        sf_dir,
        f"""
        WITH v AS (SELECT vec_id, CAST(embedding AS array<double>) AS e
                   FROM embeddings),
        scored AS (
            SELECT /*+ BROADCAST(q) */ q.query_id, v.vec_id,
                   aggregate(zip_with(v.e, q.qe, (x, y) -> x * y), 0D, (acc, x) -> acc + x) / (sqrt(aggregate(v.e, 0D, (acc, x) -> acc + x * x)) * sqrt(aggregate(q.qe, 0D, (acc, x) -> acc + x * x))) AS cos
            FROM v CROSS JOIN (SELECT vec_id AS query_id, e AS qe FROM v
                               WHERE vec_id < {N_QUERIES}) q
            WHERE v.vec_id <> q.query_id)
        SELECT query_id, vec_id, round(cos, 4) AS cosine
        FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                                           ORDER BY cos DESC, vec_id) AS rk
              FROM scored)
        WHERE rk <= {TOP_K}
        ORDER BY query_id, cosine DESC, vec_id
        """,
    )


@register(
    "sim_ivf_recall",
    oracle=f"""
    WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
    cents AS (SELECT vec_id AS cent_id, e AS ce FROM v WHERE vec_id < {NLIST}),
    assigned AS (
        SELECT v.vec_id, v.e,
               (SELECT c.cent_id FROM cents c
                ORDER BY list_cosine_similarity(v.e, c.ce) DESC, c.cent_id
                LIMIT 1) AS cell
        FROM v
    ),
    q AS (SELECT vec_id AS query_id, e AS qe, cell AS qcell
          FROM assigned WHERE vec_id < {N_QUERIES}),
    bf AS (
        SELECT query_id, vec_id,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY list_cosine_similarity(e, qe) DESC, vec_id) AS rk
        FROM assigned, q WHERE vec_id <> query_id
    ),
    ivf AS (
        SELECT query_id, vec_id,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY list_cosine_similarity(e, qe) DESC, vec_id) AS rk
        FROM assigned, q WHERE cell = qcell AND vec_id <> query_id
    )
    SELECT b.query_id,
           count(i.vec_id) AS n_hits,
           round(count(i.vec_id) / {TOP_K}.0, 4) AS recall
    FROM (SELECT * FROM bf WHERE rk <= {TOP_K}) b
    LEFT JOIN (SELECT * FROM ivf WHERE rk <= {TOP_K}) i
      ON b.query_id = i.query_id AND b.vec_id = i.vec_id
    GROUP BY b.query_id
    ORDER BY b.query_id
    """,
)
def sim_ivf_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN self-evaluation: recall@{TOP_K} of the fixed-centroid IVF path
    against exact brute-force ground truth, per query vector — the metric
    that decides whether an ANN index is usable before pointing it at the
    full corpus. One shared cell-assignment pass feeds BOTH rankings, so the
    comparison is one corpus scan + two bounded window ranks.

    Scale shape: ground truth is only computed for the evaluation query
    sample (N={N_QUERIES} here; thousands in practice), never all-pairs; the
    query set broadcasts; everything downstream of the two rank windows is
    per-query bounded (k rows each)."""
    from duckdb_fastlanes_spark.functions.ordering import ordered_small
    from pyspark.sql.window import Window

    v = _doubled(table(spark, sf_dir, "embeddings"))
    cents = F.broadcast(
        v.filter(F.col("vec_id") < NLIST).select(
            F.col("vec_id").alias("cent_id"), F.col("e").alias("ce")
        )
    )
    scored = v.crossJoin(cents).select(
        "vec_id", "e", "cent_id", _cosine(F.col("e"), F.col("ce")).alias("cscore")
    )
    assigned = scored.groupBy("vec_id").agg(
        F.expr("max_by(cent_id, struct(cscore, -cent_id))").alias("cell"),
        F.first("e").alias("e"),
    )
    q = F.broadcast(
        assigned.filter(F.col("vec_id") < N_QUERIES).select(
            F.col("vec_id").alias("query_id"),
            F.col("e").alias("qe"),
            F.col("cell").alias("qcell"),
        )
    )
    # r11 (guide §2.4, plans/r11/sim_ivf_recall_*): bf and ivf used to be
    # two branches over `cand` — the corpus×queries cosine scoring (the
    # query's dominant work) evaluated twice, each under its own window
    # sort, then re-joined. The IVF ranking is the brute-force ranking
    # restricted to cell-matching rows, so ONE scored pass carries both
    # ranks: rk_all over every candidate, rk_cell partitioned additionally
    # by the cell-match flag (row_number within the in_cell=true slice ==
    # row_number of the former filtered branch). n_hits = |bf ∩ ivf| =
    # count of bf rows that are also ivf rows — same number the former
    # left-join counted, one scoring pass instead of two.
    cand = assigned.crossJoin(q).filter(F.col("vec_id") != F.col("query_id"))
    cos = _cosine(F.col("e"), F.col("qe")).alias("cos")
    scored = cand.select(
        "query_id",
        "vec_id",
        cos,
        (F.col("cell") == F.col("qcell")).alias("in_cell"),
    )
    w_all = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("vec_id"))
    w_cell = Window.partitionBy("query_id", "in_cell").orderBy(
        F.col("cos").desc(), F.col("vec_id")
    )
    flagged = scored.select(
        "query_id",
        "in_cell",
        F.row_number().over(w_all).alias("rk_all"),
        F.row_number().over(w_cell).alias("rk_cell"),
    )
    hit = F.when(F.col("in_cell") & (F.col("rk_cell") <= TOP_K), 1)
    return ordered_small(
        flagged.filter(F.col("rk_all") <= TOP_K)
        .groupBy("query_id")
        .agg(
            F.count(hit).alias("n_hits"),
            F.round(F.count(hit) / TOP_K, 4).alias("recall"),
        ),
        "query_id",
    )


@register(
    "embedding_dim_stats",
    oracle="""
    WITH flat AS (
        SELECT generate_subscripts(embedding, 1) AS dim,
               CAST(unnest(embedding) AS DOUBLE) AS x
        FROM embeddings
    ),
    per_dim AS (
        SELECT dim, count(*) AS n, sum(x) AS s, sum(x * x) AS ss
        FROM flat GROUP BY dim
    )
    SELECT dim,
           round(s / n, 6) AS mean,
           round(ss / n - (s / n) * (s / n), 6) AS variance
    FROM per_dim
    ORDER BY dim
    """,
)
def embedding_dim_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension mean and population variance of the embedding matrix —
    the diagnostic before whitening / quantization: dead dimensions
    (variance ≈ 0) waste index bits, dominant ones distort unnormalized
    distance. posexplode gives (dim, value); everything after the first
    shuffle is #dims-sized.

    Scale shape: sum/sum-of-squares sufficient statistics (single pass,
    map-side partial aggregation) rather than a two-pass mean-then-variance;
    variance = E[x²] − E[x]² over float32 inputs upcast to double. At 100 TB
    the explode is the only large stage and it is embarrassingly parallel —
    64 running sums per partition, one #dims-row shuffle.
    """
    e = table(spark, sf_dir, "embeddings")
    flat = e.select(
        F.posexplode("embedding").alias("dim0", "xf")
    ).select((F.col("dim0") + 1).alias("dim"), F.col("xf").cast("double").alias("x"))
    per_dim = flat.groupBy("dim").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("s"),
        F.sum(F.col("x") * F.col("x")).alias("ss"),
    )
    return (
        per_dim.select(
            "dim",
            F.round(F.col("s") / F.col("n"), 6).alias("mean"),
            F.round(
                F.col("ss") / F.col("n") - (F.col("s") / F.col("n")) ** 2, 6
            ).alias("variance"),
        )
        .orderBy("dim")
    )


@register(
    "sim_hard_negatives",
    oracle=f"""
    WITH v AS (
        SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
    ),
    q AS (SELECT vec_id AS q_id, label AS q_label, e AS qe FROM v WHERE vec_id < 5),
    scored AS (
        SELECT q.q_id, v.vec_id, v.label,
               list_cosine_similarity(v.e, q.qe) AS cos,
               row_number() OVER (PARTITION BY q.q_id
                                  ORDER BY list_cosine_similarity(v.e, q.qe) DESC,
                                           v.vec_id) AS rn
        FROM v JOIN q ON v.label <> q.q_label
    )
    SELECT q_id, vec_id AS neg_id, label AS neg_label, round(cos, 4) AS cosine
    FROM scored WHERE rn <= 3
    ORDER BY q_id, rn
    """,
)
def sim_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining for contrastive training: for each query vector
    (vec_id < 5), the 3 most-similar embeddings carrying a DIFFERENT label —
    the negatives that actually teach the model. Queries broadcast to the
    corpus (the corpus never shuffles); per-query top-3 is a bounded
    per-partition heap via the row_number window on the query key."""
    from duckdb_fastlanes_spark.catalog import sql_q

    # single-parse SQL body (r7); same plan: broadcast query batch joined
    # on label inequality, per-query ranking window
    return sql_q(
        spark,
        sf_dir,
        f"""
        WITH v AS (SELECT vec_id, label,
                          CAST(embedding AS array<double>) AS e
                   FROM embeddings),
        scored AS (
            SELECT /*+ BROADCAST(q) */ q.q_id, v.vec_id, v.label,
                   aggregate(zip_with(v.e, q.qe, (x, y) -> x * y), 0D, (acc, x) -> acc + x) / (sqrt(aggregate(v.e, 0D, (acc, x) -> acc + x * x)) * sqrt(aggregate(q.qe, 0D, (acc, x) -> acc + x * x))) AS cos
            FROM v JOIN (SELECT vec_id AS q_id, label AS q_label, e AS qe
                         FROM v WHERE vec_id < 5) q
              ON v.label <> q.q_label)
        SELECT q_id, vec_id AS neg_id, label AS neg_label,
               round(cos, 4) AS cosine
        FROM (SELECT *, row_number() OVER (PARTITION BY q_id
                                           ORDER BY cos DESC, vec_id) AS rn
              FROM scored)
        WHERE rn <= 3
        ORDER BY q_id, rn
        """,
    )


#: kNN-eval parameters: test slice, candidate pool bound, neighbors
KNN_K = 5
KNN_POOL = 500
KNN_TEST_MOD = 20


@register(
    "sim_knn_label_eval",
    oracle=f"""
    WITH v AS (
        SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e
        FROM embeddings WHERE vec_id < {KNN_POOL}
    ),
    test AS (SELECT * FROM v WHERE vec_id % {KNN_TEST_MOD} = 0),
    train AS (SELECT * FROM v WHERE vec_id % {KNN_TEST_MOD} <> 0),
    neigh AS (
        SELECT t.vec_id, t.label AS actual, tr.label AS nb_label,
               row_number() OVER (
                   PARTITION BY t.vec_id
                   ORDER BY list_cosine_similarity(t.e, tr.e) DESC, tr.vec_id
               ) AS rk
        FROM test t CROSS JOIN train tr
    ),
    votes AS (
        SELECT vec_id, actual, nb_label, count(*) AS n_votes
        FROM neigh WHERE rk <= {KNN_K}
        GROUP BY vec_id, actual, nb_label
    ),
    pred AS (
        SELECT vec_id, actual, nb_label AS predicted,
               row_number() OVER (
                   PARTITION BY vec_id
                   ORDER BY n_votes DESC, nb_label
               ) AS pr
        FROM votes
    )
    SELECT actual, predicted, count(*) AS n
    FROM pred WHERE pr = 1
    GROUP BY actual, predicted
    ORDER BY actual, predicted
    """,
)
def sim_knn_label_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """kNN label evaluation: every {KNN_TEST_MOD}th vector is held out and
    classified by majority vote of its {KNN_K} nearest (cosine) neighbors in
    the rest of the pool; the confusion matrix (actual × predicted counts)
    is the checked result — the standard embedding-quality probe (does
    nearest-neighbor structure respect labels?). Spark shape: the bounded
    test slice broadcasts against the train pool, per-test ranking is a
    window partitioned by test id (no global sort), majority vote is a
    grouped count + one more per-test window. Ties in both rankings carry
    deterministic id/label tiebreaks so both engines pick identical
    neighbors and votes. Scale path: replace the broadcast cross join with
    the IVF cell restriction (sim_ivf_topk) — vote logic unchanged."""
    from duckdb_fastlanes_spark.catalog import sql_q

    return sql_q(
        spark,
        sf_dir,
        f"""
        WITH v AS (SELECT vec_id, label, CAST(embedding AS array<double>) AS e
                   FROM embeddings WHERE vec_id < {KNN_POOL}),
        scored AS (
            SELECT /*+ BROADCAST(test) */ t_id, actual, nb_label, tr_id,
                   aggregate(zip_with(te, tre, (x, y) -> x * y), 0D, (acc, x) -> acc + x) / (sqrt(aggregate(te, 0D, (acc, x) -> acc + x * x)) * sqrt(aggregate(tre, 0D, (acc, x) -> acc + x * x))) AS cos
            FROM (SELECT vec_id AS t_id, label AS actual, e AS te FROM v
                  WHERE vec_id % {KNN_TEST_MOD} = 0) test
            CROSS JOIN (SELECT vec_id AS tr_id, label AS nb_label, e AS tre
                        FROM v WHERE vec_id % {KNN_TEST_MOD} <> 0) train),
        votes AS (
            SELECT t_id, actual, nb_label, count(1) AS n_votes
            FROM (SELECT *, row_number() OVER (PARTITION BY t_id
                                               ORDER BY cos DESC, tr_id) AS rk
                  FROM scored)
            WHERE rk <= {KNN_K}
            GROUP BY t_id, actual, nb_label)
        SELECT actual, nb_label AS predicted, count(1) AS n
        FROM (SELECT *, row_number() OVER (PARTITION BY t_id
                                           ORDER BY n_votes DESC, nb_label)
                          AS pr
              FROM votes)
        WHERE pr = 1
        GROUP BY actual, nb_label
        ORDER BY actual, predicted
        """,
    )


#: MMR rerank parameters
MMR_CAND = 12
MMR_K = 5
MMR_LAMBDA = 0.7


@register(
    "sim_mmr_rerank",
    oracle=f"""
    WITH RECURSIVE
    v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
    q AS (SELECT e AS qe FROM v WHERE vec_id = {QUERY_VEC_ID}),
    cand AS (
        SELECT v.vec_id, v.e,
               list_cosine_similarity(v.e, q.qe) AS rel
        FROM v, q WHERE v.vec_id <> {QUERY_VEC_ID}
        ORDER BY rel DESC, v.vec_id LIMIT {MMR_CAND}
    ),
    sims AS (
        SELECT a.vec_id AS ia, b.vec_id AS ib,
               list_cosine_similarity(a.e, b.e) AS s
        FROM cand a, cand b WHERE a.vec_id <> b.vec_id
    ),
    sel(step, ids, pick, score) AS (
        (SELECT 1, [c.vec_id], c.vec_id, round({MMR_LAMBDA} * c.rel, 9)
         FROM cand c ORDER BY round({MMR_LAMBDA} * c.rel, 9) DESC, c.vec_id
         LIMIT 1)
        UNION ALL
        SELECT sel.step + 1, list_append(sel.ids, nxt.vec_id),
               nxt.vec_id, nxt.score
        FROM sel, LATERAL (
            SELECT c.vec_id,
                   round({MMR_LAMBDA} * c.rel
                         - {1 - MMR_LAMBDA:.1f}
                           * (SELECT max(s) FROM sims
                              WHERE ia = c.vec_id
                                AND list_contains(sel.ids, ib)), 9) AS score
            FROM cand c
            WHERE NOT list_contains(sel.ids, c.vec_id)
            ORDER BY score DESC, c.vec_id LIMIT 1
        ) nxt
        WHERE sel.step < {MMR_K}
    )
    SELECT step, pick AS vec_id, round(score, 4) AS mmr_score
    FROM sel ORDER BY step
    """,
)
def sim_mmr_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal-marginal-relevance rerank: from the cosine top-{MMR_CAND}
    candidates, greedily pick {MMR_K} maximizing λ·relevance − (1−λ)·max
    similarity to the already-picked — the diversity-aware selection a
    retrieval/training pipeline uses so near-duplicate hits don't crowd the
    result. Distribution shape: candidate retrieval and the candidate×
    candidate similarity block are computed in-engine (broadcast query
    vector, TakeOrdered top-k); only the k'-bounded block (≤ {MMR_CAND}² +
    {MMR_CAND} rows, INDEPENDENT of corpus size — the same contract as
    collecting k-means centroids) comes to the driver for the inherently
    sequential greedy loop. Scores are quantized to 9 decimals before each
    argmax so both engines' last-ulp arithmetic picks identical items; the
    oracle runs the same greedy as a recursive CTE with a LATERAL argmax."""
    v = _doubled(table(spark, sf_dir, "embeddings"))
    q = F.broadcast(v.where(f"vec_id = {QUERY_VEC_ID}").selectExpr("e AS qe"))
    cand = (
        v.where(f"vec_id <> {QUERY_VEC_ID}")
        .crossJoin(q)
        .select("vec_id", "e", _cosine(F.col("e"), F.col("qe")).alias("rel"))
        .orderBy(F.desc("rel"), "vec_id")
        .limit(MMR_CAND)
    )
    a = cand.selectExpr("vec_id AS ia", "e AS ea", "rel")
    b = cand.selectExpr("vec_id AS ib", "e AS eb")
    sims_rows = (
        a.join(b, F.col("ia") != F.col("ib"))
        .select("ia", "ib", _cosine(F.col("ea"), F.col("eb")).alias("s"))
        .collect()
    )
    rel = {r["ia"]: None for r in sims_rows}
    sim = {}
    for r in sims_rows:
        sim[(r["ia"], r["ib"])] = r["s"]
    for r in cand.select("vec_id", "rel").collect():
        rel[r["vec_id"]] = r["rel"]

    picked: list[tuple[int, int, float]] = []
    chosen: list[int] = []
    for step in range(1, MMR_K + 1):
        best = None
        for c in sorted(rel):
            if c in chosen:
                continue
            penalty = max((sim[(c, s)] for s in chosen), default=0.0)
            score = round(
                MMR_LAMBDA * rel[c]
                - ((1 - MMR_LAMBDA) * penalty if chosen else 0.0),
                9,
            )
            if best is None or score > best[1]:
                best = (c, score)
        if best is None:
            # fewer candidates than MMR_K (e.g. empty corpus) — stop early
            break
        chosen.append(best[0])
        picked.append((step, best[0], round(best[1], 4)))
    # r11: LocalRelation result (values_df) — the Python-RDD createDataFrame
    # path plus the orderBy's range-sampling pass spun Python workers twice
    # to serve ≤MMR_K driver-computed rows
    from duckdb_fastlanes_spark.catalog import values_df

    return values_df(
        spark, picked, "step INT, vec_id BIGINT, mmr_score DOUBLE"
    ).orderBy("step")


# ---------------------------------------------------------------- SRP-LSH ANN
#: sign-random-projection configuration: P hyperplanes over the 64-dim
#: embeddings; plane components are deterministic ±1 derived from md5 so
#: both engines use bit-identical planes (same device as the sampling
#: hash-uniforms). Multi-probe: query bucket + all Hamming≤2 neighbors.
SRP_PLANES = 8
SRP_DIM = 64


def _srp_signs(p: int) -> list[int]:
    import hashlib

    return [
        1 if int(hashlib.md5(f"{p}:{i}".encode()).hexdigest()[0], 16) < 8 else -1
        for i in range(SRP_DIM)
    ]


def _srp_sig_int_spark() -> str:
    """Integer signature (plane 0 = MSB): the index partition key. Same
    per-plane dot products as _srp_sig_spark, summed as bit weights."""
    terms = []
    for p in range(SRP_PLANES):
        arr = ", ".join(f"{s}D" for s in _srp_signs(p))
        terms.append(
            f"IF(aggregate(zip_with(e, array({arr}), (x, s) -> x * s), 0D,"
            f" (a, v) -> a + v) >= 0, {1 << (SRP_PLANES - 1 - p)}, 0)"
        )
    return " + ".join(terms)


def _srp_sig_py(e: list[float]) -> int:
    """Driver-side twin of _srp_sig_int_spark for the ONE collected query
    vector: identical left-to-right IEEE summation order as Spark's
    ``aggregate(zip_with(...))``, so the boundary case (dot == 0) can never
    disagree between the driver-computed probe set and the indexed sigs."""
    sig = 0
    for p in range(SRP_PLANES):
        signs = _srp_signs(p)
        acc = 0.0
        for x, s in zip(e, signs):
            acc += x * s
        if acc >= 0.0:
            sig |= 1 << (SRP_PLANES - 1 - p)
    return sig


def _srp_probe_ints(qsig: int) -> list[int]:
    """The query bucket plus every Hamming-1/2 neighbor, as partition keys."""
    probes = {qsig}
    probes |= {qsig ^ (1 << i) for i in range(SRP_PLANES)}
    probes |= {
        qsig ^ (1 << i) ^ (1 << j)
        for i in range(SRP_PLANES)
        for j in range(i + 1, SRP_PLANES)
    }
    return sorted(probes)


def _srp_index(spark: SparkSession, sf_dir: str) -> str:
    """Signature-clustered embedding index: one pass computes every vector's
    integer SRP signature and lands the corpus as parquet PARTITIONED BY sig
    (≤ 2^SRP_PLANES directories) — the ingest-once-query-many structure the
    multi-probe search needs so a probe reads ~37/2^SRP_PLANES of the data
    via partition pruning instead of re-hashing and scanning the whole
    corpus per query. Memoized + atomically published via _staged_index:
    the key fingerprints the source parquet AND the index derivation
    (plane count/dim/version), so regenerated testdata or a changed hash
    family rebuilds automatically; the repartition("sig") inside the
    helper makes each task emit only its own buckets (≤ one file per
    present sig, not per task)."""

    def build() -> DataFrame:
        v = _doubled(table(spark, sf_dir, "embeddings"))
        return v.selectExpr(
            "vec_id", "e", f"CAST({_srp_sig_int_spark()} AS INT) AS sig"
        )

    return _staged_index(
        sf_dir, "srp_index", [SRP_PLANES, SRP_DIM, "srp_index_v1"], "sig", build
    )


def _srp_sig_duck() -> str:
    bits = []
    for p in range(SRP_PLANES):
        arr = ", ".join(str(s) for s in _srp_signs(p))
        bits.append(
            f"CASE WHEN list_inner_product(e, [{arr}]) >= 0 THEN '1' ELSE '0' END"
        )
    return " || ".join(bits)


def _flip_duck(k: str, p: int) -> str:
    """DuckDB SQL: ``k`` (a bit-string signature) with 1-based bit ``p``
    flipped — the oracle's Hamming-neighbor generator."""
    return (
        f"substr({k}, 1, {p - 1}) ||"
        f" (CASE WHEN substr({k}, {p}, 1) = '1' THEN '0' ELSE '1' END) ||"
        f" substr({k}, {p + 1}, {SRP_PLANES - p})"
    )


def _probe_list(flip) -> list[str]:
    """Probe-key expressions over a column named qsig: Hamming 0, 1, 2."""
    probes = ["qsig"]
    probes += [flip("qsig", p) for p in range(1, SRP_PLANES + 1)]
    for p1 in range(1, SRP_PLANES + 1):
        for p2 in range(p1 + 1, SRP_PLANES + 1):
            probes.append(flip(flip("qsig", p1), p2))
    return probes


@register(
    "sim_srp_lsh_topk",
    oracle=f"""
    WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
    sigs AS (SELECT vec_id, e, {_srp_sig_duck()} AS sig FROM v),
    q AS (SELECT e AS qe, sig AS qsig FROM sigs WHERE vec_id = {QUERY_VEC_ID}),
    probes AS (
        SELECT DISTINCT unnest([{", ".join(_probe_list(_flip_duck))}]) AS pk
        FROM q
    )
    SELECT s.vec_id, round(list_cosine_similarity(s.e, q.qe), 4) AS cosine
    FROM sigs s JOIN probes ON s.sig = probes.pk, q
    WHERE s.vec_id <> {QUERY_VEC_ID}
    ORDER BY list_cosine_similarity(s.e, q.qe) DESC, s.vec_id
    LIMIT {TOP_K}
    """,
)
def sim_srp_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SRP-LSH approximate nearest neighbors over a SIGNATURE-CLUSTERED
    index: each vector hashes to an {SRP_PLANES}-bit signature (sign of the
    dot product against {SRP_PLANES} fixed ±1 hyperplanes — the
    random-hyperplane LSH family, where P(bit match) = 1 − angle/π), the
    corpus is persisted once partitioned by that signature (_srp_index),
    and a query reads ONLY the probe buckets (query bucket + Hamming≤2
    neighbors, 37 of 2^{SRP_PLANES} partitions) — exact cosine + top-k on
    what's read.

    Scale shape: the r4 form recomputed every signature and scanned every
    row per query (the probe join pruned pairs, not I/O — 6.6× DuckDB at
    the 1000× cell). Clustering the corpus by signature makes the probe a
    PARTITION-PRUNED scan: ~37/2^{SRP_PLANES} ≈ 15% of the data is read,
    decoded, and scored, and nothing is re-hashed at query time — the LSH
    now prunes I/O, which is the point of an index at 100 TB. Driver-side
    work is bounded and corpus-size-independent: ONE collected query row
    (like sim_mmr_rerank's documented collect) + 37 probe ints computed in
    Python with the same left-to-right IEEE summation as the Spark
    signature expression. Planes are md5-derived literals, bit-identical
    on both engines; the oracle recomputes the same buckets from scratch."""
    import os

    idx = _srp_index(spark, sf_dir)
    # the query vector is CLIENT INPUT in a real deployment; fetching it
    # with a Spark job (scan embeddings, filter vec_id) spent one whole
    # job's floor (~0.3 s) on a 1-row lookup — _fetch_vec reads it driver-
    # side instead (predicate-pushed single row-group read, like the footer
    # reads in io/fls.py).
    qe = _fetch_vec(sf_dir, QUERY_VEC_ID)
    if qe is None:
        return _empty_topk(spark)
    probes = _srp_probe_ints(_srp_sig_py(qe))
    # read ONLY the probe buckets' directories — listing all 2^SRP_PLANES
    # partition dirs to prune 219 of them is avoidable metadata work; the
    # probe set is known driver-side, so hand the reader just those paths
    # (the sig column is not needed downstream). Missing dirs = empty
    # buckets, skipped.
    paths = [p for p in (f"{idx}/sig={s}" for s in probes) if os.path.isdir(p)]
    cand = spark.read.parquet(*paths).where(f"vec_id <> {QUERY_VEC_ID}")
    # one parsed SQL fragment instead of a 64-literal Column tree: plan
    # CONSTRUCTION is py4j round-trips per Column call and this query's
    # execution is a single sub-second job, so construction is visible
    qarr = "array(" + ", ".join(f"{x!r}D" for x in qe) + ")"
    cos = (
        f"aggregate(zip_with(e, {qarr}, (p, q) -> p * q), 0D, (a, v) -> a + v)"
        f" / (sqrt(aggregate(e, 0D, (a, v) -> a + v * v))"
        f" * sqrt(aggregate({qarr}, 0D, (a, v) -> a + v * v)))"
    )
    return (
        cand.selectExpr("vec_id", f"{cos} AS _cos")
        .orderBy(F.col("_cos").desc(), F.col("vec_id"))
        .limit(TOP_K)
        .selectExpr("vec_id", "round(_cos, 4) AS cosine")
    )


#: radius search threshold: random 64-d vectors' cosine is ~N(0, 1/8), so
#: 0.25 (~2σ) keeps the result non-trivial (~tens of rows at sf0.01) while
#: production embeddings would use a semantic threshold (0.8+)
RANGE_TAU = 0.25


@register(
    "sim_range_search",
    oracle=f"""
    WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
    q AS (SELECT e AS qe FROM v WHERE vec_id = {QUERY_VEC_ID})
    SELECT v.vec_id, round(list_cosine_similarity(v.e, q.qe), 4) AS cosine
    FROM v, q
    WHERE v.vec_id <> {QUERY_VEC_ID}
      AND list_cosine_similarity(v.e, q.qe) >= {RANGE_TAU}
    ORDER BY v.vec_id
    """,
)
def sim_range_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Radius (range) similarity search — ALL neighbors within a cosine
    threshold, the top-k family's complement (dedup candidates, recall
    sweeps, abuse clustering take every match, not a fixed k). One scan +
    broadcast query vector + row-local filter: embarrassingly parallel,
    output-bounded by the radius, no sort, no window. At 100 TB the same
    predicate runs inside the IVF/LSH cell restriction (sim_ivf_topk /
    sim_srp_lsh_topk) — the filter is unchanged, only the scanned cells
    shrink. Single-parse SQL body."""
    from duckdb_fastlanes_spark.catalog import sql_q

    return sql_q(
        spark,
        sf_dir,
        f"""
        WITH v AS (SELECT vec_id, CAST(embedding AS array<double>) AS e
                   FROM embeddings)
        SELECT vec_id, round(_cos, 4) AS cosine
        FROM (SELECT /*+ BROADCAST(q) */ v.vec_id,
                     aggregate(zip_with(v.e, q.qe, (x, y) -> x * y), 0D,
                               (acc, x) -> acc + x)
                     / (sqrt(aggregate(v.e, 0D, (acc, x) -> acc + x * x))
                        * sqrt(aggregate(q.qe, 0D, (acc, x) -> acc + x * x)))
                       AS _cos
              FROM (SELECT * FROM v WHERE vec_id <> {QUERY_VEC_ID}) v
              CROSS JOIN (SELECT e AS qe FROM v
                          WHERE vec_id = {QUERY_VEC_ID}) q)
        WHERE _cos >= {RANGE_TAU}
        ORDER BY vec_id
        """,
    )


def _centroid_outliers_oracle() -> str:
    # sign-aware floor micro quantization, identical CASE on both engines
    xu = (
        "(CASE WHEN CAST(x AS DOUBLE) * 1000000.0 < 0 "
        "THEN -floor(-(CAST(x AS DOUBLE) * 1000000.0) + 0.5) "
        "ELSE floor(CAST(x AS DOUBLE) * 1000000.0 + 0.5) END)"
    )
    return f"""
    WITH raw AS (
        SELECT vec_id, label,
               generate_subscripts(embedding, 1) AS dim,
               unnest(embedding) AS x
        FROM embeddings
    ),
    flat AS (
        SELECT vec_id, label, dim, CAST({xu} AS BIGINT) AS x_u FROM raw
    ),
    cent AS (
        SELECT label, dim, sum(x_u) AS s_u, count(*) AS n
        FROM flat GROUP BY label, dim
    ),
    d2 AS (
        SELECT f.vec_id, f.label, max(c.n) AS n,
               sum(CAST(f.x_u * c.n - c.s_u AS HUGEINT)
                   * CAST(f.x_u * c.n - c.s_u AS HUGEINT)) AS d2_u
        FROM flat f JOIN cent c ON f.label = c.label AND f.dim = c.dim
        GROUP BY f.vec_id, f.label
    )
    SELECT label, vec_id, rn,
           round(CAST(d2_u AS DOUBLE)
                 / (CAST(n AS DOUBLE) * n * 1e12), 6) AS dist2
    FROM (SELECT *, row_number() OVER (
              PARTITION BY label ORDER BY d2_u DESC, vec_id) AS rn
          FROM d2)
    WHERE rn <= 5
    ORDER BY label, rn
    """


@register("sim_centroid_outliers", oracle=_centroid_outliers_oracle())
def sim_centroid_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space outlier detection: squared L2 distance of every
    vector to its LABEL CENTROID, top-5 per label — the embedding-QA gate
    (mislabeled rows, encoder failures, and corrupt payloads all land far
    from their cluster's center; curation drops or re-routes them before
    the index is built).

    Exactness discipline (the money-sum pattern applied to geometry): both
    the centroid mean and every squared distance are ORDER-DEPENDENT in
    float, so values are quantized to micro-unit BIGINTs first and the
    distance is computed in exact integer arithmetic —
    Σ(x_u·n − s_u)² / (n·1e6)² — with the numerator summed in
    DECIMAL(38,0) (HUGEINT in DuckDB; < 1e33 even at 1e9 rows/label).
    The outlier RANK orders on the exact integer numerator, so the top-5
    pick is layout-invariant and bit-identical across engines.

    Scale shape: posexplode → one (label, dim)-keyed aggregate (64·L rows
    out, map-side combinable), broadcast-joined back (centroid table is
    dims × labels — bounded, NOT corpus-sized), one (vec)-keyed aggregate,
    and a top-5-per-label window that Catalyst runs as WindowGroupLimit.
    No pairwise work anywhere."""
    from duckdb_fastlanes_spark.catalog import sql_q

    xu = (
        "(CASE WHEN CAST(xf AS DOUBLE) * 1000000.0D < 0 "
        "THEN -floor(-(CAST(xf AS DOUBLE) * 1000000.0D) + 0.5D) "
        "ELSE floor(CAST(xf AS DOUBLE) * 1000000.0D + 0.5D) END)"
    )
    return sql_q(
        spark,
        sf_dir,
        f"""
        WITH flat AS (
            SELECT vec_id, label, dim0 + 1 AS dim, CAST({xu} AS BIGINT) AS x_u
            FROM (SELECT vec_id, label, posexplode(embedding) AS (dim0, xf)
                  FROM embeddings)
        ),
        cent AS (
            SELECT label, dim, sum(x_u) AS s_u, count(1) AS n
            FROM flat GROUP BY label, dim
        ),
        d2 AS (
            SELECT /*+ BROADCAST(c) */ f.vec_id, f.label, max(c.n) AS n,
                   sum(CAST(f.x_u * c.n - c.s_u AS DECIMAL(19,0))
                       * CAST(f.x_u * c.n - c.s_u AS DECIMAL(19,0))) AS d2_u
            FROM flat f JOIN cent c ON f.label = c.label AND f.dim = c.dim
            GROUP BY f.vec_id, f.label
        )
        SELECT label, vec_id, rn,
               round(CAST(d2_u AS DOUBLE)
                     / (CAST(n AS DOUBLE) * n * 1e12), 6) AS dist2
        FROM (SELECT *, row_number() OVER (
                  PARTITION BY label ORDER BY d2_u DESC, vec_id) AS rn
              FROM d2)
        WHERE rn <= 5
        ORDER BY label, rn
        """,
    )


#: audited-pairs scaffold shared by the label-noise audits (sim_label_margin,
#: sim_auc_same_label): normed vectors, the deterministic 5% audit slice
#: (vec_id % AUDIT_SLICE_MOD = 0), and the broadcast all-pairs cosine join.
#: One definition so the slice rate, norm association, and broadcast hint
#: cannot silently diverge between the two operators.
AUDIT_SLICE_MOD = 20

_AUDIT_PAIRS_SPARK = f"""
        v AS (SELECT vec_id, label, e,
                      sqrt(aggregate(e, 0D, (acc, x) -> acc + x * x))
                        AS nrm
               FROM (SELECT vec_id, label,
                            CAST(embedding AS array<double>) AS e
                     FROM embeddings)),
        q AS (SELECT * FROM v WHERE vec_id % {AUDIT_SLICE_MOD} = 0)"""

#: per-pair cosine: JVM HOF dot product over the hoisted norms
_AUDIT_COS_SPARK = (
    "aggregate(zip_with(c.e, q.e, (x, y) -> x * y), 0D,"
    " (acc, x) -> acc + x) / (c.nrm * q.nrm)"
)


@register(
    "sim_label_margin",
    oracle=f"""
    WITH v AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e
               FROM embeddings),
    q AS (SELECT * FROM v WHERE vec_id % {AUDIT_SLICE_MOD} = 0)
    SELECT q.vec_id, q.label,
           round(max(CASE WHEN c.label = q.label
                          THEN list_cosine_similarity(c.e, q.e) END), 4)
             AS best_same,
           round(max(CASE WHEN c.label <> q.label
                          THEN list_cosine_similarity(c.e, q.e) END), 4)
             AS best_other,
           round(round(max(CASE WHEN c.label = q.label
                                THEN list_cosine_similarity(c.e, q.e) END), 4)
                 - round(max(CASE WHEN c.label <> q.label
                                  THEN list_cosine_similarity(c.e, q.e) END),
                         4), 4) AS margin
    FROM q JOIN v c ON c.vec_id <> q.vec_id
    GROUP BY q.vec_id, q.label
    ORDER BY q.vec_id
    """,
)
def sim_label_margin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Label-noise audit: for each audited vector, the best cosine to its
    OWN label (excluding itself) vs the best cosine to any OTHER label;
    margin = best_same − best_other. A negative margin means the vector's
    nearest neighborhood belongs to a different class — the standard
    triage signal for mislabeled training examples before a fine-tune.

    Determinism: max() over cosines is order-independent; each max is
    snapped to round(4) BEFORE the subtraction so the margin is a
    difference of already-quantized values (then one final round(4) to
    kill repr noise). The Spark HOF fold and DuckDB's
    list_cosine_similarity pair bit-identically (established across the
    sim_* family).

    Scale shape: the audited slice (vec_id % 20 = 0, a 5% deterministic
    sample) broadcasts against the corpus — a BroadcastNestedLoopJoin by
    construction, because the work IS all-pairs for the audited rows; the
    per-query reduction is a map-side max, so nothing corpus-sized
    shuffles. At 100 TB the audit slice rate is the knob, and the
    blocked/IVF siblings (sim_ivf_*) are the sub-linear path when the
    full corpus must be audited."""
    from duckdb_fastlanes_spark.catalog import sql_q

    return sql_q(
        spark,
        sf_dir,
        f"""
        WITH {_AUDIT_PAIRS_SPARK},
        pairs AS (
            SELECT /*+ BROADCAST(q) */ q.vec_id, q.label,
                   c.label = q.label AS same_label,
                   {_AUDIT_COS_SPARK} AS _cos
            FROM v c JOIN q ON c.vec_id <> q.vec_id)
        SELECT vec_id, label,
               round(max(CASE WHEN same_label THEN _cos END), 4)
                 AS best_same,
               round(max(CASE WHEN NOT same_label THEN _cos END), 4)
                 AS best_other,
               round(round(max(CASE WHEN same_label THEN _cos END), 4)
                     - round(max(CASE WHEN NOT same_label THEN _cos END), 4),
                     4) AS margin
        FROM pairs
        GROUP BY vec_id, label
        ORDER BY vec_id
        """,
    )


@register(
    "sim_auc_same_label",
    oracle=f"""
    WITH v AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e
               FROM embeddings),
    q AS (SELECT * FROM v WHERE vec_id % {AUDIT_SLICE_MOD} = 0),
    pairs AS (
        SELECT CAST(round(list_cosine_similarity(c.e, q.e) * 1000000)
                    AS BIGINT) AS score_u,
               CASE WHEN c.label = q.label THEN 1 ELSE 0 END AS pos
        FROM q JOIN v c ON c.vec_id <> q.vec_id),
    by_score AS (
        SELECT score_u,
               CAST(sum(pos) AS BIGINT)     AS n_pos,
               CAST(count(*) - sum(pos) AS BIGINT) AS n_neg
        FROM pairs GROUP BY score_u),
    cum AS (
        SELECT n_pos, n_neg,
               CAST(coalesce(sum(n_neg) OVER (
                   ORDER BY score_u
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                 AS BIGINT) AS neg_below
        FROM by_score),
    u AS (
        SELECT CAST(sum(n_pos * (2 * neg_below + n_neg)) AS BIGINT) AS u2,
               CAST(sum(n_pos) AS BIGINT) AS npos,
               CAST(sum(n_neg) AS BIGINT) AS nneg
        FROM cum)
    SELECT npos + nneg AS n_pairs, npos AS n_pos, nneg AS n_neg,
           round(u2 / (CAST(2 AS DOUBLE) * npos * nneg), 4) AS auc
    FROM u
    """,
)
def sim_auc_same_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-quality AUC: how well cosine similarity separates same-label
    from cross-label pairs — the single-number retrieval health check run
    before trusting an embedding column for dedup or ANN labeling. Exact
    tie-aware Mann-Whitney: AUC = U / (n_pos·n_neg) with ties counted half,
    computed as 2U = Σ_s n_pos(s)·(2·negatives_below(s) + n_neg(s)) over
    DISTINCT quantized scores — every term an exact integer; the only
    float op is the final division, round(4).

    Determinism: scores snap to micro-units before grouping; the running
    negative count rides the integer score order; sums of integers are
    order-free.

    Scale shape: pairs come from the audited 5% slice broadcast against
    the corpus (map-side, as sim_label_margin); the per-score histogram
    collapses to AT MOST ~2M rows (micro-quantized cosine ∈ [-1, 1]) no
    matter the corpus size, so the single-partition cumulative window is
    bounded by the quantization grid, not the data."""
    from duckdb_fastlanes_spark.catalog import sql_q

    return sql_q(
        spark,
        sf_dir,
        f"""
        WITH {_AUDIT_PAIRS_SPARK},
        pairs AS (
            SELECT /*+ BROADCAST(q) */
                   CAST(round(({_AUDIT_COS_SPARK})
                        * 1000000) AS BIGINT) AS score_u,
                   CASE WHEN c.label = q.label THEN 1 ELSE 0 END AS pos
            FROM v c JOIN q ON c.vec_id <> q.vec_id),
        by_score AS (
            SELECT score_u,
                   sum(pos)            AS n_pos,
                   count(1) - sum(pos) AS n_neg
            FROM pairs GROUP BY score_u),
        cum AS (
            SELECT n_pos, n_neg,
                   coalesce(sum(n_neg) OVER (
                       ORDER BY score_u
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                     AS neg_below
            FROM by_score),
        u AS (
            SELECT sum(n_pos * (2 * neg_below + n_neg)) AS u2,
                   sum(n_pos) AS npos,
                   sum(n_neg) AS nneg
            FROM cum)
        SELECT npos + nneg AS n_pairs, npos AS n_pos, nneg AS n_neg,
               round(u2 / (CAST(2 AS DOUBLE) * npos * nneg), 4) AS auc
        FROM u
        """,
    )
