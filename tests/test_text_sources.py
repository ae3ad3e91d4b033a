"""CSV/JSONL source-sink roundtrips with the read_fls multi-file semantics."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from duckdb_fastlanes_spark.catalog import table
from duckdb_fastlanes_spark.io.text_sources import (
    read_csv,
    read_jsonl,
    write_csv,
    write_jsonl,
)
from tests.conftest import SF_DIR


def test_csv_roundtrip_with_schema(spark, tmp_path):
    n = table(spark, SF_DIR, "nation")
    out = str(tmp_path / "nation_csv")
    write_csv(n, out)
    back = read_csv(spark, out, schema=n.schema)
    assert back.exceptAll(n).count() == 0
    assert n.exceptAll(back).count() == 0


def test_csv_requires_schema_or_infer(spark, tmp_path):
    with pytest.raises(ValueError, match="schema"):
        read_csv(spark, str(tmp_path), header=True)


def test_jsonl_roundtrip(spark, tmp_path):
    r = table(spark, SF_DIR, "region")
    out = str(tmp_path / "region_jsonl")
    write_jsonl(r, out)
    back = read_jsonl(spark, out, schema=r.schema)
    assert back.exceptAll(r).count() == 0
    assert r.exceptAll(back).count() == 0


def test_csv_promote_types_across_files(spark, tmp_path):
    a = str(tmp_path / "a")
    b = str(tmp_path / "b")
    spark.range(0, 3).select(F.col("id").cast("int").alias("v")).write.option(
        "header", "true"
    ).csv(a)
    spark.range(3, 6).select(F.col("id").cast("double").alias("v")).write.option(
        "header", "true"
    ).csv(b)
    sa = T.StructType([T.StructField("v", T.IntegerType())])
    sb = T.StructType([T.StructField("v", T.DoubleType())])
    # schema-per-file read then promotion: int ⊔ double → double
    from duckdb_fastlanes_spark.io.schema_promotion import promote_and_align

    frames = [
        read_csv(spark, a, schema=sa),
        read_csv(spark, b, schema=sb),
    ]
    df = promote_and_align(frames)
    assert df.schema["v"].dataType == T.DoubleType()
    assert df.count() == 6


def test_jsonl_malformed_lines_are_quarantined(spark, tmp_path):
    """PERMISSIVE parsing: malformed lines must neither kill the job nor
    silently vanish — they land in _corrupt_record for quarantine (at 100 TB
    one bad record must never fail a pipeline)."""
    from pyspark.sql import types as T

    p = tmp_path / "mixed.jsonl"
    p.write_text('{"id": 1, "v": "ok"}\n{broken json\n{"id": 3, "v": "also ok"}\n')
    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("v", T.StringType()),
            T.StructField("_corrupt_record", T.StringType()),
        ]
    )
    df = read_jsonl(spark, str(p), schema=schema).cache()
    good = df.filter(F.col("_corrupt_record").isNull())
    bad = df.filter(F.col("_corrupt_record").isNotNull())
    assert good.count() == 2
    assert bad.count() == 1
    assert "{broken json" in bad.collect()[0]._corrupt_record
    df.unpersist()
