"""Dynamic mode on Spark (Arrow pandas-UDF) + static MapType keywords."""

import pytest
from pyspark.sql import functions as F

from xjs.dynamic_spark import dynamic_violations
from xjs.errors import SchemaError
from xjs.plan import compile_static
from xjs.runtime import violations


def test_dynamic_preserves_multiplicity(spark):
    """The reference's error multiplicity (e.g. per-duplicate
    uniqueItems) must survive the Arrow round-trip."""
    df = spark.createDataFrame(
        [
            (1, '[1, 2, 1, 3, 2, 1]'),
            (2, '[1, 2]'),
            (3, 'not json'),
            (4, None),
        ],
        "id long, doc string",
    )
    out = dynamic_violations(df, {"uniqueItems": True}, "doc", "id").collect()
    by_id = {}
    for r in out:
        by_id.setdefault(r["id"], []).append((r["path"], r["keyword"]))
    assert len(by_id.get(1, [])) == 3  # three duplicate indices
    assert 2 not in by_id
    assert by_id[3] == [("", "$malformed")]
    assert 4 not in by_id  # NULL input -> no rows


def test_dynamic_nested_paths(spark):
    df = spark.createDataFrame(
        [(1, '{"a": [{"v": 0}, {"v": 5}]}')], "id long, doc string"
    )
    schema = {"properties": {"a": {"items": {"properties": {"v": {"minimum": 3}}}}}}
    out = dynamic_violations(df, schema, "doc", "id").collect()
    assert [(r["path"], r["keyword"]) for r in out] == [("a.0.v", "minimum")]


def test_dynamic_bad_schema_fails_on_driver(spark):
    df = spark.createDataFrame([(1, "{}")], "id long, doc string")
    with pytest.raises(SchemaError):
        dynamic_violations(df, {"minItems": -1}, "doc", "id")


MAP_SCHEMA = {
    "properties": {
        "m": {
            "type": "object",
            "minProperties": 2,
            "maxProperties": 3,
            "required": ["a"],
            "properties": {"a": {"type": "integer", "minimum": 10}},
            "patternProperties": {"^x": {"type": "integer", "maximum": 5}},
            "additionalProperties": False,
        }
    }
}


def test_maptype_static_keywords(spark):
    rows = [
        (1, {"a": 10, "xq": 3}),          # all pass
        (2, {"a": 5, "xq": 3}),           # properties: a < 10
        (3, {"a": 10}),                   # minProperties
        (4, {"a": 10, "xq": 9}),          # patternProperties: xq > 5
        (5, {"a": 10, "xq": 3, "zz": 1}), # additionalProperties: zz
        (6, {"xq": 3, "b": 1}),           # required a missing (+ AP for b)
        (7, None),                        # null map: vacuous
    ]
    df = spark.createDataFrame(rows, "id long, m map<string,bigint>")
    plan = compile_static(MAP_SCHEMA, df.schema, id_col="id", partition_col=None)
    got = {}
    for r in violations(df, plan).collect():
        got.setdefault(r["id"], set()).add(r["keyword"])
    assert 1 not in got
    assert got[2] == {"properties"}
    assert got[3] == {"minProperties"}
    assert got[4] == {"patternProperties"}
    assert got[5] == {"additionalProperties"}
    assert got[6] == {"required", "additionalProperties"}
    assert 7 not in got
