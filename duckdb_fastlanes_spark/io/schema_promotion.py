"""Cross-source type promotion — reference ``SchemaBuilder::PromoteType``
(/root/reference/src/reader/schema_builder.cpp:132-243) re-expressed for Spark.

The reference widens column types across row groups / files sharing a name:
- within signed ints: widen to the larger rank
- within unsigned ints: widen to the larger rank (Spark: unsigned already maps
  to signed LongType per SURVEY.md §1.2, so this collapses to signed widening)
- mixed signed/unsigned: smallest signed type with ≥ max(signed_bits,
  unsigned_bits+1) bits
- within floats: FLOAT → DOUBLE
- int + float: DOUBLE
- anything + string: STRING (string rank wins)
Column *names* must match exactly across sources (schema_builder.cpp:205-214);
a mismatch raises, like the reference's binder error.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_INT_RANK: dict[str, int] = {"byte": 1, "short": 2, "integer": 3, "long": 4}
_FLOAT_RANK: dict[str, int] = {"float": 1, "double": 2}


def promote_type(a: T.DataType, b: T.DataType) -> T.DataType:
    """Widen two Spark types per the reference's promotion lattice."""
    if a == b:
        return a
    an, bn = a.typeName(), b.typeName()
    if "string" in (an, bn):
        return T.StringType()
    if an in _INT_RANK and bn in _INT_RANK:
        return a if _INT_RANK[an] >= _INT_RANK[bn] else b
    if an in _FLOAT_RANK and bn in _FLOAT_RANK:
        return a if _FLOAT_RANK[an] >= _FLOAT_RANK[bn] else b
    if (an in _INT_RANK and bn in _FLOAT_RANK) or (an in _FLOAT_RANK and bn in _INT_RANK):
        return T.DoubleType()
    if {an, bn} <= {"decimal", *(_INT_RANK.keys())}:
        # int ⊔ decimal → the wider decimal
        da = a if isinstance(a, T.DecimalType) else T.DecimalType(20, 0)
        db = b if isinstance(b, T.DecimalType) else T.DecimalType(20, 0)
        scale = max(da.scale, db.scale)
        prec = max(da.precision - da.scale, db.precision - db.scale) + scale
        return T.DecimalType(min(prec, 38), scale)
    if {an, bn} == {"date", "timestamp"}:
        return T.TimestampType()
    raise TypeError(f"cannot promote {a.simpleString()} ⊔ {b.simpleString()}")


def promoted_schema(schemas: list[T.StructType]) -> T.StructType:
    """Fold promotion across schemas; names must match set-wise (reference
    errors on name mismatch, schema_builder.cpp:205-214)."""
    names = [f.name for f in schemas[0].fields]
    name_set = set(names)
    for s in schemas[1:]:
        if {f.name for f in s.fields} != name_set:
            raise ValueError(
                f"column-name mismatch across sources: {sorted(name_set)} vs "
                f"{sorted(f.name for f in s.fields)}"
            )
    out: list[T.StructField] = []
    for name in names:
        t = reduce(promote_type, [s[name].dataType for s in schemas])
        out.append(T.StructField(name, t, nullable=any(s[name].nullable for s in schemas)))
    return T.StructType(out)


def promote_and_align(frames: list[DataFrame]) -> DataFrame:
    """Cast every frame to the promoted schema and union them."""
    target = promoted_schema([f.schema for f in frames])
    aligned = [
        f.select(*[F.col(fld.name).cast(fld.dataType).alias(fld.name) for fld in target.fields])
        for f in frames
    ]
    return reduce(lambda x, y: x.unionByName(y), aligned)
