"""Property-based tests (hypothesis) for the type-promotion lattice —
the reference applies PromoteType pairwise across row groups in file order
(schema_builder.cpp:205-240), so the result must not depend on grouping or
order: the operation has to be a commutative, associative, idempotent join
with STRING as the absorbing top element. No SparkSession needed."""

from __future__ import annotations

from hypothesis import given
from hypothesis import strategies as st
from pyspark.sql import types as T

from duckdb_fastlanes_spark.io.schema_promotion import promote_type

#: the flat numeric/temporal/string lattice the reference promotes over
TYPES = [
    T.ByteType(),
    T.ShortType(),
    T.IntegerType(),
    T.LongType(),
    T.FloatType(),
    T.DoubleType(),
    T.DecimalType(20, 0),
    T.DateType(),
    T.TimestampType(),
    T.StringType(),
]

#: date⊔numeric (and similar) legitimately raise; properties quantify over
#: pairs that promote
def _try(a, b):
    try:
        return promote_type(a, b)
    except TypeError:
        return None


types = st.sampled_from(TYPES)


@given(types)
def test_idempotent(a):
    assert promote_type(a, a) == a


@given(types, types)
def test_commutative(a, b):
    assert _try(a, b) == _try(b, a)


@given(types, types, types)
def test_associative_when_defined(a, b, c):
    ab = _try(a, b)
    bc = _try(b, c)
    if ab is not None and bc is not None:
        left = _try(ab, c)
        right = _try(a, bc)
        if left is not None and right is not None:
            assert left == right


@given(types)
def test_string_absorbs(a):
    assert promote_type(a, T.StringType()) == T.StringType()


@given(types, types)
def test_result_is_widening(a, b):
    """The promoted type must be re-promotable to itself from either input —
    i.e. it sits above both in the lattice."""
    p = _try(a, b)
    if p is not None:
        assert _try(a, p) == p
        assert _try(b, p) == p
