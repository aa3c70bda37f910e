"""JSON value helpers: strict type tables, deep equality, duplicates.

Parity notes (all behaviors verified by executing the reference):

* Type checks are ``type(x) == T`` — strict, not isinstance
  (reference schemas/draft_04/keywords.py:42-51). So ``True`` is not
  an integer, ``3`` is not a "number" (only float is), ``1.0 != 1``
  in enums.
* Deep equality is type-strict at every level (reference
  tools.py:25-47).
* ``duplicate_indices`` returns the indices *beyond the first
  occurrence* of any duplicated element (reference tools.py:50-65) —
  the source of uniqueItems' per-duplicate error multiplicity.
"""

from __future__ import annotations

from typing import Any, List, Set

NoneType = type(None)

#: JSON-Schema type name -> the exact Python type the reference maps
#: it to (reference schemas/draft_04/keywords.py:13-21).
PY_TYPE = {
    "array": list,
    "boolean": bool,
    "integer": int,
    "null": NoneType,
    "number": float,
    "object": dict,
    "string": str,
}

JSON_TYPE_NAMES = frozenset(PY_TYPE)

#: Spark-side type-name mapping used by the static planner docs.
SPARK_TYPE = {
    "array": "array",
    "boolean": "boolean",
    "integer": "bigint",
    "null": "void",
    "number": "double",
    "object": "struct|map",
    "string": "string",
}


def deep_equal(a: Any, b: Any) -> bool:
    """Type-strict recursive equality over JSON values."""
    if type(a) is not type(b):
        return False
    if isinstance(a, list):
        if len(a) != len(b):
            return False
        return all(deep_equal(x, y) for x, y in zip(a, b))
    if isinstance(a, dict):
        if a.keys() != b.keys():
            return False
        return all(deep_equal(v, b[k]) for k, v in a.items())
    return a == b


def duplicate_indices(items: List[Any]) -> Set[int]:
    """Indices (beyond first occurrence) of deeply-equal duplicates."""
    dups: Set[int] = set()
    for i in range(len(items)):
        if i in dups:
            continue
        for j in range(i + 1, len(items)):
            if j in dups:
                continue
            if deep_equal(items[i], items[j]):
                dups.add(j)
    return dups
