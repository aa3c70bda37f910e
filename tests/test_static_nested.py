"""Static planner: nested StructType recursion, tuple items,
additionalItems, dependencies — plus the pandas-UDF regex fallback."""

from pyspark.sql import functions as F
from pyspark.sql import types as T

from xjs.plan import compile_static
from xjs.runtime import violations


def _viol(spark, df, schema):
    plan = compile_static(schema, df.schema, id_col="id", partition_col=None)
    got = {}
    for r in violations(df, plan).collect():
        got.setdefault(r["id"], set()).add((r["path"], r["keyword"]))
    return got


def test_nested_struct_recursion(spark):
    df = spark.createDataFrame(
        [
            (1, ("ok", 10)),
            (2, ("toolongvalue", 3)),
            (3, (None, 10)),
            (4, None),
        ],
        "id long, meta struct<name:string, score:bigint>",
    )
    schema = {
        "properties": {
            "meta": {
                "type": "object",
                "required": ["name"],
                "properties": {
                    "name": {"type": "string", "maxLength": 5},
                    "score": {"type": "integer", "minimum": 5},
                },
            }
        }
    }
    got = _viol(spark, df, schema)
    assert 1 not in got
    assert got[2] == {("meta.name", "maxLength"), ("meta.score", "minimum")}
    assert got[3] == {("meta", "required")}
    assert 4 not in got  # null struct = absent key: vacuous


def test_tuple_items_and_additional_items(spark):
    df = spark.createDataFrame(
        [
            (1, [1, 2]),
            (2, [1, 2, 3, 4]),
            (3, [99]),
            (4, []),
        ],
        "id long, arr array<bigint>",
    )
    schema = {
        "properties": {
            "arr": {
                "items": [{"maximum": 10}, {"minimum": 2}],
                "additionalItems": False,
            }
        }
    }
    got = _viol(spark, df, schema)
    assert 1 not in got
    assert got[2] == {("arr", "additionalItems")}
    assert got[3] == {("arr", "items")}  # element 0 > 10; element 1 absent: ok
    assert 4 not in got


def test_struct_dependencies(spark):
    df = spark.createDataFrame(
        [
            (1, (1, 2)),
            (2, (1, None)),
            (3, (None, 2)),
        ],
        "id long, o struct<a:bigint, b:bigint>",
    )
    schema = {"properties": {"o": {"dependencies": {"a": ["b"]}}}}
    got = _viol(spark, df, schema)
    assert 1 not in got
    # path carries the MISSING co-key (reference keywords.py:736-744)
    assert got[2] == {("o.b", "dependencies")}
    assert 3 not in got


def test_regex_unicode_parity(spark):
    """Java \\d is ASCII-only by default; Python's is unicode.  The
    static translation prepends (?U) so both backends agree on
    non-ASCII digits."""
    from xjs import build_evaluator

    docs = ["٣٤", "34", "x4"]
    df = spark.createDataFrame([(i, s) for i, s in enumerate(docs)], "id long, s string")
    schema = {"properties": {"s": {"pattern": r"\d+$"}}}
    plan = compile_static(schema, df.schema, id_col="id", partition_col=None)
    static_fail = {r["id"] for r in violations(df, plan).collect()}
    ev = build_evaluator({"pattern": r"\d+$"})
    dynamic_fail = {i for i, s in enumerate(docs) if ev(s)}
    assert static_fail == dynamic_fail == {2}


def test_python_only_regex_falls_back_to_pandas(spark):
    df = spark.createDataFrame(
        [(1, "abcX"), (2, "abX"), (3, None)], "id long, s string"
    )
    # \Z is Python-only (Java wants \z) -> pandas-UDF path
    schema = {"properties": {"s": {"pattern": r"abc.\Z"}}}
    plan = compile_static(schema, df.schema, id_col="id", partition_col=None)
    [check] = plan.checks
    assert check.uses_python
    got = {r["id"] for r in violations(df, plan).collect()}
    assert got == {2}
