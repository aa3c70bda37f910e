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


# ---------------------------------------------------------------------------
# schema evolution / drift detection (driver-side, no data scan)
# ---------------------------------------------------------------------------

def schema_diff(expected: T.StructType, observed: T.StructType) -> dict:
    """Structural diff between an expected table schema and the one a
    new partition/snapshot actually carries — the schema-evolution
    check a validation engine runs BEFORE compiling the plan (a
    mismatch here invalidates the compiled column references, so it
    must fail fast on the driver, not mid-job on executors).

    Returns {"added": [...], "removed": [...], "changed":
    [(name, expected_type, observed_type)], "nullability":
    [(name, expected_nullable, observed_nullable)], "compatible":
    bool}.  ``compatible`` means the compiled plan over ``expected``
    still binds: no removed columns, no type changes (added columns
    and relaxed nullability are fine — Catalyst resolution is
    name-based).

    Nested structs are compared recursively with dotted paths.
    """
    exp = _flatten(expected)
    obs = _flatten(observed)
    added = sorted(set(obs) - set(exp))
    removed = sorted(set(exp) - set(obs))
    changed = []
    nullability = []
    for name in sorted(set(exp) & set(obs)):
        e_dt, e_null = exp[name]
        o_dt, o_null = obs[name]
        if e_dt != o_dt:
            changed.append((name, e_dt, o_dt))
        if e_null != o_null:
            nullability.append((name, e_null, o_null))
    return {
        "added": added,
        "removed": removed,
        "changed": changed,
        "nullability": nullability,
        "compatible": not removed and not changed,
    }


def _flatten(schema: T.StructType, prefix: str = "") -> dict:
    """{dotted_name: (simpleString-of-type, nullable)} with struct
    recursion; arrays/maps compare as whole type strings."""
    out = {}
    for f in schema.fields:
        name = f"{prefix}{f.name}"
        if isinstance(f.dataType, T.StructType):
            out[name] = ("struct", f.nullable)
            out.update(_flatten(f.dataType, prefix=f"{name}."))
        else:
            out[name] = (f.dataType.simpleString(), f.nullable)
    return out
