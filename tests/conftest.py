from __future__ import annotations

import sys

import pytest

sys.path.insert(0, "/root/repo")

from duckdb_fastlanes_spark import get_spark

SF_DIR = "/root/testdata/sf0.001"
SF_DIR_MULTI = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    s = get_spark("pytest", shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s


@pytest.fixture(scope="session")
def duck():
    import duckdb

    con = duckdb.connect()
    from duckdb_fastlanes_spark.catalog import TABLES

    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
