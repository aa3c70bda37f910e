"""Schema-time parity: SchemaError paths + messages vs the reference."""

import pytest

from xjs import compile_frontend
from xjs.errors import SchemaError

ejs = pytest.importorskip("extendedjsonschema")
from extendedjsonschema.errors import SchemaError as RefSchemaError  # noqa: E402

BAD_SCHEMAS = [
    {"type": "nope"},
    {"type": []},
    {"type": [1]},
    {"type": ["string", "string"]},
    {"type": ["string", "nope"]},
    {"type": 7},
    {"enum": 3},
    {"enum": []},
    {"enum": [1, 1]},
    {"allOf": 3},
    {"allOf": [3]},
    {"anyOf": 3},
    {"anyOf": [1]},
    {"oneOf": 4},
    {"not": 3},
    {"items": 3},
    {"items": [{"type": "string"}, 4]},
    {"additionalItems": 3},
    {"minItems": "x"},
    {"minItems": -1},
    {"minItems": 3, "maxItems": 1},
    {"uniqueItems": 3},
    {"multipleOf": "x"},
    {"multipleOf": -2},
    {"minimum": "x"},
    {"minimum": 3, "maximum": 1},
    {"exclusiveMinimum": 3},
    {"exclusiveMaximum": "x"},
    {"properties": 3},
    {"properties": {}},
    {"properties": {"a": 3}},
    {"patternProperties": {"[": {}}},
    {"patternProperties": {"a": 4}},
    {"additionalProperties": 3},
    {"required": 3},
    {"required": [1]},
    {"required": ["a", "a"]},
    {"required": [""]},
    {"minProperties": -1},
    {"minProperties": 3, "maxProperties": 1},
    {"dependencies": 3},
    {"dependencies": {}},
    {"dependencies": {"a": 3}},
    {"dependencies": {"a": [1]}},
    {"dependencies": {"a": ["b", "b"]}},
    {"minLength": "x"},
    {"minLength": -1},
    {"minLength": 3, "maxLength": 1},
    {"pattern": "["},
    {"format": "nope"},
    {"properties": {"a": {"minItems": -1}}},  # nested path
    {"items": {"enum": []}},  # schema-form items: EMPTY subschema path
    {"items": [{"type": "string"}, {"enum": []}]},  # tuple form: ['items', i, ...]
    {"not": {"enum": []}},  # `not` subschema: empty path
    {"dependencies": {"a": {"minItems": -1}}},  # path excludes the key
    {"$schema": "http://example.com/unknown#"},
]


@pytest.mark.parametrize("schema", BAD_SCHEMAS, ids=lambda s: str(s)[:50])
def test_schema_error_parity(schema):
    with pytest.raises(RefSchemaError) as ref_exc:
        ejs.Validator(schema)
    with pytest.raises(SchemaError) as my_exc:
        compile_frontend(schema)
    assert my_exc.value.path == ref_exc.value.path
    assert my_exc.value.msg == ref_exc.value.msg


def test_valid_schemas_compile_both():
    ok = [
        {},
        {"type": ["integer", "null"]},
        # multipleOf 0 passes schema validation in BOTH (the reference's
        # message/condition mismatch, keywords.py:365-366, mirrored);
        # running it div-zeros at data time in both.
        {"multipleOf": 0},
        {"properties": {"a": {"items": [{"type": "string"}]}}},
    ]
    for schema in ok:
        ejs.Validator(schema)
        compile_frontend(schema)
