"""Storage layer: the ``read_fls`` / ``COPY ... (FORMAT fls)`` analogues."""

from duckdb_fastlanes_spark.io.fls import read_fls, write_fls

__all__ = ["read_fls", "write_fls"]
