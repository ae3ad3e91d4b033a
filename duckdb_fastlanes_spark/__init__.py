"""duckdb_fastlanes_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of the ``sebastiaan-dev/duckdb-fastlanes`` DuckDB
extension (reference surveyed in SURVEY.md).

Architecture stance (SURVEY.md §7): Spark SQL *is* the engine. Catalyst plays the
role of the embedded DuckDB optimizer; the vectorized Parquet+ZSTD reader plays the
role of the FastLanes compressed columnar scan stack; this package provides

- ``io.fls``       — the ``read_fls`` / ``COPY ... (FORMAT fls)`` analogues
                     (glob reads, union_by_name, schema promotion, file_row_number,
                     writer options) — reference src/read_fls.cpp, src/write_fls.cpp
- ``operators``    — the declared relational query inventory (SURVEY.md §2.B/§2.C)
- ``functions``    — scalar/vector helper expressions (JVM-side first)
- ``pipeline``     — large-scale training-data operators beyond the reference:
                     dedup, similarity search, text analysis, multimodal columns
- ``streaming``    — Structured Streaming extension operators over ``events``
- ``plans``        — plan-inspection helpers (pushdown / pruning assertions)
"""

from duckdb_fastlanes_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
