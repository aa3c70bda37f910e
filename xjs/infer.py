"""Schema inference: Spark StructType -> draft-04 schema dict.

Completes the user-facing round trip: a table's own structure becomes
a baseline schema (``infer_schema``) that users then tighten with
constraints (enums, bounds, formats).  By construction the inferred
schema validates its source table with zero violations
(tests/test_infer.py pins this).
"""

from __future__ import annotations

from pyspark.sql import types as T


def _field_schema(dt: T.DataType) -> dict:
    if isinstance(dt, (T.StringType, T.VarcharType, T.CharType, T.BinaryType)):
        return {"type": "string"}
    if isinstance(dt, (T.LongType, T.IntegerType, T.ShortType, T.ByteType)):
        return {"type": "integer"}
    if isinstance(dt, (T.DoubleType, T.FloatType, T.DecimalType)):
        return {"type": "number"}
    if isinstance(dt, T.BooleanType):
        return {"type": "boolean"}
    if isinstance(dt, T.ArrayType):
        return {"type": "array", "items": _field_schema(dt.elementType)}
    if isinstance(dt, T.StructType):
        return infer_schema(dt, top_level=False)
    if isinstance(dt, T.MapType):
        return {"type": "object"}
    # timestamps/dates have no draft-04 type: engine checks
    # (monotonicity, range) handle them; schema-wise they are opaque
    return {}


def infer_schema(spark_schema: T.StructType, top_level: bool = True) -> dict:
    props = {}
    required = []
    for f in spark_schema.fields:
        sub = _field_schema(f.dataType)
        if sub:
            props[f.name] = sub
        if not f.nullable:
            required.append(f.name)
    out: dict = {"type": "object"}
    if props:
        out["properties"] = props
    if required:
        out["required"] = required
    return out
