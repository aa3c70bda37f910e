"""Seeded differential fuzz: xjs dynamic evaluator vs the reference.

Bools are excluded from the value pool (documented isinstance-drift
divergence, SURVEY.md §4.2) and schemas avoid the reference's broken
keywords (maxLength/format — SURVEY.md §2.7).
"""

import json
import os
import random

import pytest

from xjs import build_evaluator

ejs = pytest.importorskip("extendedjsonschema")

N_DOCS = int(os.environ.get("XJS_FUZZ_DOCS", "300"))

SCHEMAS = [
    {"type": "integer", "minimum": 1},
    {"items": {"type": "integer"}, "minItems": 1, "uniqueItems": True},
    {"properties": {"a": {"type": "integer"}}, "required": ["a"], "additionalProperties": False},
    {"anyOf": [{"type": "string", "pattern": "a+b"}, {"type": "integer"}]},
    {"oneOf": [{"type": "integer"}, {"minimum": 1}]},
    {"dependencies": {"a": ["b"]}, "minProperties": 1},
    {"items": [{"type": "integer"}, {"enum": [1, "a"]}], "additionalItems": False},
    {"not": {"type": "object"}},
    {"patternProperties": {"^x": {"type": "integer"}}},
    {"properties": {"a": {"items": {"properties": {"b": {"minimum": 2}}}}}},
    {"allOf": [{"minProperties": 1}, {"required": ["a"]}]},
    {"enum": [1, "ab", [0, 1], {"a": 1}]},
]

LEAVES = [None, 0, 1, 3, 2.5, "", "ab", "aab", "xxaab"]


def rand_doc(rng, depth=0):
    c = rng.random()
    if depth > 2 or c < 0.15:
        return rng.choice(LEAVES)
    if c < 0.5:
        return [rand_doc(rng, depth + 1) for _ in range(rng.randint(0, 4))]
    return {k: rand_doc(rng, depth + 1) for k in rng.sample(["a", "b", "c", "xa"], rng.randint(0, 3))}


def norm(errs):
    if errs is None:
        return []
    return sorted(
        ({"path": e["path"], "keyword": e["keyword"], "value": e["value"]} for e in errs),
        key=lambda e: json.dumps(e, default=str),
    )


@pytest.mark.parametrize("schema", SCHEMAS, ids=lambda s: json.dumps(s)[:50])
def test_fuzz_schema(schema):
    rng = random.Random(42)
    ref = ejs.Validator(schema)
    mine = build_evaluator(schema)
    for _ in range(N_DOCS):
        doc = rand_doc(rng)
        # exact parity including error order (verified 0 order
        # mismatches over the full fuzz space)
        assert mine(doc) == (ref.run(doc) or []), f"doc={doc!r}"
