"""Curated draft-04 corpus in the json-schema-org test-suite format
(SURVEY.md §5.4): spec-level valid/invalid expectations, annotated
where the reference's strict-type semantics deviate from the spec
(``ref_valid`` overrides ``valid`` — SURVEY.md §1.2).

Both engines (dynamic + reference itself, when runnable) are checked
against the REFERENCE semantics; the spec flag documents the
divergence surface.
"""

import pytest

from xjs import build_evaluator

ejs = pytest.importorskip("extendedjsonschema")

# {description, schema, tests: [{data, valid[, ref_valid]}]}
CORPUS = [
    {
        "description": "integer type matches integers",
        "schema": {"type": "integer"},
        "tests": [
            {"data": 1, "valid": True},
            {"data": 1.1, "valid": False},
            # spec: 1.0 is an integer-valued number => valid per draft4;
            # reference: type(1.0) != int => INVALID (strict semantics)
            {"data": 1.0, "valid": True, "ref_valid": False},
            {"data": "1", "valid": False},
        ],
    },
    {
        "description": "number type",
        "schema": {"type": "number"},
        "tests": [
            {"data": 1.1, "valid": True},
            # spec: integers are numbers; reference: only float is
            {"data": 1, "valid": True, "ref_valid": False},
            {"data": "1.1", "valid": False},
        ],
    },
    {
        "description": "required validation",
        "schema": {"properties": {"foo": {}, "bar": {}}, "required": ["foo"]},
        "tests": [
            {"data": {"foo": 1}, "valid": True},
            {"data": {"bar": 1}, "valid": False},
            {"data": 12, "valid": True},  # non-objects vacuous
        ],
    },
    {
        "description": "minimum/exclusiveMinimum",
        "schema": {"minimum": 1.1, "exclusiveMinimum": True},
        "tests": [
            {"data": 1.2, "valid": True},
            {"data": 1.1, "valid": False},
            {"data": 0.6, "valid": False},
            {"data": "x", "valid": True},
        ],
    },
    {
        "description": "maxItems",
        "schema": {"maxItems": 2},
        "tests": [
            {"data": [1], "valid": True},
            {"data": [1, 2], "valid": True},
            {"data": [1, 2, 3], "valid": False},
        ],
    },
    {
        "description": "uniqueItems with type strictness",
        "schema": {"uniqueItems": True},
        "tests": [
            {"data": [1, 2], "valid": True},
            {"data": [1, 1], "valid": False},
            {"data": [{"a": 1}, {"a": 1}], "valid": False},
            # spec: 1 and 1.0 are equal numbers => invalid per draft4;
            # reference deep-equality is type-strict => VALID
            {"data": [1, 1.0], "valid": False, "ref_valid": True},
        ],
    },
    {
        "description": "pattern is prefix-anchored in the reference",
        "schema": {"pattern": "a+b"},
        "tests": [
            {"data": "aab", "valid": True},
            # spec: pattern is SEARCH semantics => "xaab" valid;
            # reference uses re.match => INVALID
            {"data": "xaab", "valid": True, "ref_valid": False},
            {"data": "zzz", "valid": False},
        ],
    },
    {
        "description": "additionalProperties being false does not allow other properties",
        "schema": {
            "properties": {"foo": {"type": "integer"}},
            "additionalProperties": False,
        },
        "tests": [
            {"data": {"foo": 1}, "valid": True},
            {"data": {"foo": 1, "quux": 2}, "valid": False},
            {"data": {}, "valid": True},
        ],
    },
    {
        "description": "items schema validation",
        "schema": {"items": {"type": "integer"}},
        "tests": [
            {"data": [1, 2], "valid": True},
            {"data": [1, "x"], "valid": False},
            {"data": [], "valid": True},
        ],
    },
    {
        "description": "allOf",
        "schema": {"allOf": [{"properties": {"bar": {"type": "integer"}}, "required": ["bar"]},
                              {"properties": {"foo": {"type": "string"}}, "required": ["foo"]}]},
        "tests": [
            {"data": {"foo": "baz", "bar": 2}, "valid": True},
            {"data": {"foo": "baz"}, "valid": False},
            {"data": {"bar": 2}, "valid": False},
        ],
    },
    {
        "description": "anyOf",
        "schema": {"anyOf": [{"type": "integer"}, {"minimum": 2}]},
        "tests": [
            {"data": 1, "valid": True},
            {"data": 2.5, "valid": True},
            {"data": 1.5, "valid": False},
            {"data": "x", "valid": True},  # minimum vacuous for strings
        ],
    },
    {
        "description": "oneOf",
        "schema": {"oneOf": [{"type": "integer"}, {"minimum": 2}]},
        "tests": [
            {"data": 1, "valid": True},
            {"data": 2.5, "valid": True},
            {"data": 1.5, "valid": False},
        ],
    },
    {
        "description": "not",
        "schema": {"not": {"type": "integer"}},
        "tests": [
            {"data": "foo", "valid": True},
            {"data": 1, "valid": False},
        ],
    },
    {
        "description": "dependencies (property form)",
        "schema": {"dependencies": {"bar": ["foo"]}},
        "tests": [
            {"data": {"foo": 1, "bar": 2}, "valid": True},
            {"data": {"bar": 2}, "valid": False},
            {"data": {"foo": 1}, "valid": True},
            {"data": {}, "valid": True},
        ],
    },
    {
        "description": "patternProperties",
        "schema": {"patternProperties": {"f.*o": {"type": "integer"}}},
        "tests": [
            {"data": {"foo": 1}, "valid": True},
            {"data": {"foo": "bar"}, "valid": False},
            {"data": {"bar": "x"}, "valid": True},
        ],
    },
    {
        "description": "enum with heterogeneous values",
        "schema": {"enum": [6, "foo", [], {"foo": 12}]},
        "tests": [
            {"data": [], "valid": True},
            {"data": {"foo": 12}, "valid": True},
            {"data": {"foo": 13}, "valid": False},
            {"data": 6.0, "valid": True, "ref_valid": False},  # type-strict
        ],
    },
    {
        "description": "minLength",
        "schema": {"minLength": 2},
        "tests": [
            {"data": "fo", "valid": True},
            {"data": "f", "valid": False},
            {"data": 1, "valid": True},
        ],
    },
]


def _cases():
    for group in CORPUS:
        for i, t in enumerate(group["tests"]):
            yield pytest.param(
                group["schema"], t, id=f"{group['description']}-{i}"
            )


@pytest.mark.parametrize("schema,case", list(_cases()))
def test_draft4_corpus(schema, case):
    expected_valid = case.get("ref_valid", case["valid"])
    ev = build_evaluator(schema)
    assert (ev(case["data"]) == []) == expected_valid

    # reference agreement wherever it can run the case (bools excluded
    # by corpus construction; broken keywords not used here)
    ref = ejs.Validator(schema)
    out = ref.run(case["data"])
    assert ((out is None) or out == []) == expected_valid
