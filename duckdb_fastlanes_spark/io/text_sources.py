"""CSV / JSON-lines sources & sinks with the same multi-file semantics as
``read_fls``.

The reference reads exactly one format (.fls); its *capabilities* — glob
expansion, union-by-name, cross-file type promotion
(fls_multi_file_info.cpp:70-82, schema_builder.cpp:132-243) — are
format-agnostic, so the Spark engine exposes them uniformly over the text
formats a real ingest pipeline lands first. Schema handling is explicit:
pass a schema for production scans (one-pass, no inference job), or let
``infer=True`` run Spark's sampling inference for exploration.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from duckdb_fastlanes_spark.io.schema_promotion import promote_and_align


def read_csv(
    spark: SparkSession,
    paths: str | Sequence[str],
    *,
    schema: T.StructType | None = None,
    header: bool = True,
    delimiter: str = ",",
    promote_types: bool = False,
    infer: bool = False,
) -> DataFrame:
    """CSV scan. Schema-first: inference reads the data twice — never at scale.
    ``promote_types`` unions heterogeneous files through the promotion lattice."""
    if isinstance(paths, str):
        paths = [paths]
    reader = spark.read.option("header", str(header).lower()).option("sep", delimiter)
    if schema is not None:
        reader = reader.schema(schema)
    elif infer:
        reader = reader.option("inferSchema", "true")
    else:
        raise ValueError("pass schema=... or infer=True (schema-less CSV is all-string)")
    if promote_types and len(paths) > 1:
        return promote_and_align([reader.csv(p) for p in paths])
    return reader.csv(*paths)


def read_jsonl(
    spark: SparkSession,
    paths: str | Sequence[str],
    *,
    schema: T.StructType | None = None,
    promote_types: bool = False,
) -> DataFrame:
    """JSON-lines scan (one object per line — the splittable layout; multiline
    JSON parses per-file and kills parallelism)."""
    if isinstance(paths, str):
        paths = [paths]
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    if promote_types and len(paths) > 1:
        return promote_and_align([reader.json(p) for p in paths])
    return reader.json(*paths)


def write_csv(df: DataFrame, path: str, *, header: bool = True, mode: str = "overwrite") -> None:
    df.write.mode(mode).option("header", str(header).lower()).csv(path)


def write_jsonl(df: DataFrame, path: str, *, mode: str = "overwrite") -> None:
    df.write.mode(mode).json(path)
