"""Every registered query hash-matches its DuckDB oracle at sf0.001 — the
pytest twin of the driver's t2 gate (and of the reference's self-checking
sqllogictest corpus, SURVEY.md §5).

Two comparisons per query:

1. value equality (floats to 9 dp, order-insensitive) — catches wrong answers;
2. REPR-FAMILY parity — catches right answers that hash differently. The
   driver compares pandas frames by value repr, where ``5`` (int64) and
   ``5.0`` (float64, what pandas lowers DuckDB HUGEINT/DECIMAL to) differ,
   as do ``datetime.date`` (Spark DATE → object) and ``datetime64`` (DuckDB
   DATE). Int widths and datetime units DO hash alike (driver-verified in
   round 1: tpch_q7/q8/q9 int32-vs-int64 and tpch_q3 ns-vs-us all passed),
   so families — not exact dtypes — are the right bar. This is derived from
   the Spark schema + a DuckDB DESCRIBE, no second execution.
"""

from __future__ import annotations

import math
import re

import pytest

from duckdb_fastlanes_spark import registry
from tests.conftest import SF_DIR

QUERIES = registry.queries()
ORACLES = registry.oracles()


def _spark_family(dt) -> str:
    from pyspark.sql import types as T

    if isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        return "int"
    if isinstance(dt, (T.FloatType, T.DoubleType)):
        return "float"
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
        return "ts"
    if isinstance(dt, T.DateType):
        return "date"  # pandas object — never repr-matches DuckDB datetime64
    if isinstance(dt, T.BooleanType):
        return "bool"
    if isinstance(dt, T.DecimalType):
        return "decimal"  # pandas object(Decimal) vs DuckDB float64
    return "obj"


def _duck_family(type_name: str) -> str:
    t = type_name.upper()
    if re.fullmatch(r"U?(TINYINT|SMALLINT|INTEGER|BIGINT)", t):
        return "int"
    if t in ("HUGEINT", "UHUGEINT", "DOUBLE", "FLOAT") or t.startswith("DECIMAL"):
        return "float"  # pandas lowers all of these to float64
    if t == "DATE" or t.startswith("TIMESTAMP"):
        return "ts"
    if t == "BOOLEAN":
        return "bool"
    return "obj"


def _normalize(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])

    def norm(v):
        if isinstance(v, float):
            return "NaN" if math.isnan(v) else round(v, 9)
        if isinstance(v, (bytes, bytearray)):
            return bytes(v).hex()
        return v

    return sorted(
        (tuple(norm(r[i]) for i in order) for r in rows),
        key=lambda t: tuple(str(x) for x in t),
    )


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(name, spark, duck):
    sdf = QUERIES[name](spark, SF_DIR)
    srows = [tuple(r) for r in sdf.collect()]
    if name not in ORACLES:
        assert len(srows) >= 0  # rows-only contract (non-SQL-expressible op)
        return
    rel = duck.execute(ORACLES[name])
    ocols = [d[0] for d in rel.description]
    orows = rel.fetchall()
    assert sorted(sdf.columns) == sorted(ocols), "column names must match oracle"
    assert len(srows) == len(orows), "row count must match oracle"
    assert _normalize(srows, sdf.columns) == _normalize(orows, ocols)
    # repr-family parity (the driver-hash bar; see module docstring)
    duck_types = {
        r[0].lower(): r[1]
        for r in duck.execute("DESCRIBE " + ORACLES[name]).fetchall()
    }
    mismatches = [
        f"{f.name}: spark={_spark_family(f.dataType)} "
        f"oracle={_duck_family(duck_types[f.name.lower()])}"
        for f in sdf.schema.fields
        if _spark_family(f.dataType) != _duck_family(duck_types[f.name.lower()])
    ]
    assert not mismatches, f"repr-family mismatch (driver hash would differ): {mismatches}"


def test_exact_quartiles_bracketed_matches_percentile(spark):
    """The sketch-refine quartile helper (r8, replaces percentile()'s O(ndv)
    value-histogram buffer in summarize_table) must reproduce percentile()'s
    interpolated values BIT-FOR-BIT on adversarial shapes: heavy ties (90%
    mass on 3 values), near-all-distinct continuous values, skewed
    log-normal, tiny n, and a quartile landing exactly on an integer rank."""
    import numpy as np
    from pyspark.sql import functions as F

    from duckdb_fastlanes_spark.operators.scan import _exact_quartiles_bracketed

    rng = np.random.default_rng(20260815)
    n = 40_001  # odd -> p50 on an integer rank; p25/p75 interpolate
    cases = {
        "ties": np.where(
            rng.random(n) < 0.9,
            rng.choice([1.0, 2.0, 3.0], n),
            np.round(rng.uniform(0, 10, n), 2),
        ),
        "cont": rng.normal(50_000, 20_000, n),
        "skew": np.exp(rng.normal(0, 2, n)),
        "small": np.concatenate([rng.uniform(0, 1, 17), np.full(n - 17, np.nan)]),
    }
    rows = [tuple(float(v) for v in vals) for vals in zip(*cases.values())]
    df = spark.createDataFrame(
        rows, ", ".join(f"{c} DOUBLE" for c in cases)
    ).select(*[F.nanvl(c, F.lit(None)).alias(c) for c in cases])
    cols = list(cases)
    got = _exact_quartiles_bracketed(spark, df, cols).collect()[0]
    ref = df.agg(
        *[
            F.expr(f"percentile({c}, array(0.25D, 0.50D, 0.75D)) AS qs_{c}")
            for c in cols
        ]
    ).collect()[0]
    for c in cols:
        for p, q in zip((25, 50, 75), ref[f"qs_{c}"]):
            assert got[f"q{p}_{c}"] == round(q, 2), (
                f"{c} p{p}: {got[f'q{p}_{c}']} != {round(q, 2)}"
            )


def test_exact_quartiles_all_null_column(spark):
    """All-NULL columns have no quantiles: the helper must emit NULL (what
    percentile()/quantile_cont return), not crash on the empty sketch —
    both when one column of several is all-NULL and when every column is."""
    from pyspark.sql import functions as F

    from duckdb_fastlanes_spark.operators.scan import _exact_quartiles_bracketed

    df = spark.range(100).select(
        F.col("id").cast("double").alias("ok"),
        F.expr("CAST(NULL AS DOUBLE)").alias("allnull"),
    )
    row = _exact_quartiles_bracketed(
        spark, df, ["ok", "allnull"], extra_aggs=[F.count(F.lit(1)).alias("n")]
    ).collect()[0]
    assert row["q50_ok"] == 49.5 and row["q25_ok"] == 24.75
    assert row["q50_allnull"] is None and row["q75_allnull"] is None
    assert row["n"] == 100

    row2 = _exact_quartiles_bracketed(
        spark,
        df.select("allnull"),
        ["allnull"],
        extra_aggs=[F.count(F.lit(1)).alias("n")],
    ).collect()[0]
    assert row2["q25_allnull"] is None and row2["n"] == 100


def test_exact_quartiles_refuses_nonfinite_brackets(spark):
    """NaN near a quartile is not reproducible with value-range brackets
    (percentile() sorts NaN greatest); the helper must refuse LOUDLY rather
    than return a silently different quantile (r8 code review)."""
    import numpy as np
    import pytest as _pytest

    from duckdb_fastlanes_spark.operators.scan import _exact_quartiles_bracketed

    vals = [float("nan")] * 80 + [float(v) for v in np.linspace(0, 1, 20)]
    df = spark.createDataFrame([(v,) for v in vals], "x DOUBLE")
    with _pytest.raises(ValueError, match="non-finite"):
        _exact_quartiles_bracketed(spark, df, ["x"])
