"""Round-2 static-backend closures (VERDICT.md / ADVICE.md items):

* complex-value `enum` via typed literals + <=> (was: lit(False))
* `type` unions containing "null" still reject present mismatches
* StructType `patternProperties` / `additionalProperties` resolved
  driver-side over the compile-time field set
* schema-form `dependencies` on StructType
* `uniqueItems` per-duplicate-index violation multiplicity

Each case is checked against the dynamic (reference-parity) evaluator
on the equivalent JSON documents — the dynamic backend is the
semantic oracle (struct rows map to docs by dropping NULL fields,
the absent-key model).
"""

from pyspark.sql import types as T

from xjs import build_evaluator
from xjs.plan import compile_static
from xjs.runtime import run_plan, violations


def _mkdf(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


def _dynamic_counts(schema, docs):
    """doc index -> total dynamic error count."""
    ev = build_evaluator(schema)
    return {i: len(ev(d)) for i, d in enumerate(docs)}


def _static_counts(df, schema):
    plan = compile_static(schema, df.schema, id_col="id", partition_col=None)
    out = {}
    for r in violations(df, plan).collect():
        out[r["id"]] = out.get(r["id"], 0) + 1
    return out


# ---------------------------------------------------------------------------
# type union with "null"
# ---------------------------------------------------------------------------

def test_null_type_union_rejects_present_mismatches(spark):
    schema = {"properties": {"s": {"type": ["null", "integer"]}}}
    df = _mkdf(spark, [(0, "hello"), (1, None)], "id long, s string")
    plan = compile_static(schema, df.schema, id_col="id", partition_col=None)
    got = {(r["id"], r["keyword"]) for r in violations(df, plan).collect()}
    # dynamic parity: a present string violates ["null","integer"]
    ev = build_evaluator(schema)
    assert len(ev({"s": "hello"})) == 1
    assert len(ev({})) == 0
    assert got == {(0, "type")}


# ---------------------------------------------------------------------------
# complex-value enum
# ---------------------------------------------------------------------------

def test_enum_array_members(spark):
    schema = {"properties": {"a": {"enum": [[1, 2], [3]]}}}
    df = _mkdf(
        spark,
        [(0, [1, 2]), (1, [3]), (2, [1, 3]), (3, None), (4, [])],
        "id long, a array<long>",
    )
    plan = compile_static(schema, df.schema, id_col="id", partition_col=None)
    got = {r["id"] for r in violations(df, plan).collect()}
    # dynamic oracle on the same docs (None = absent key)
    dyn = _dynamic_counts(schema, [{"a": [1, 2]}, {"a": [3]}, {"a": [1, 3]}, {}, {"a": []}])
    assert got == {i for i, n in dyn.items() if n}
    assert got == {2, 4}


def test_enum_struct_members_absent_key_model(spark):
    # {"a": 1} must equal a struct row {a:1, b:NULL} (NULL field = absent)
    schema = {"properties": {"o": {"enum": [{"a": 1}, {"a": 2, "b": "x"}]}}}
    df = _mkdf(
        spark,
        [(0, (1, None)), (1, (2, "x")), (2, (1, "x")), (3, None)],
        "id long, o struct<a: long, b: string>",
    )
    plan = compile_static(schema, df.schema, id_col="id", partition_col=None)
    got = {r["id"] for r in violations(df, plan).collect()}
    dyn = _dynamic_counts(
        schema, [{"o": {"a": 1}}, {"o": {"a": 2, "b": "x"}}, {"o": {"a": 1, "b": "x"}}, {}]
    )
    assert got == {i for i, n in dyn.items() if n}
    assert got == {2}


def test_enum_type_strictness(spark):
    # deep_equal parity: int members never match a double column
    # (1.0 != 1), and unrepresentable members are dropped
    schema = {"properties": {"x": {"enum": [1, 2]}}}
    df = _mkdf(spark, [(0, 1.0), (1, 2.5)], "id long, x double")
    plan = compile_static(schema, df.schema, id_col="id", partition_col=None)
    got = {r["id"] for r in violations(df, plan).collect()}
    ev = build_evaluator(schema)
    assert len(ev({"x": 1.0})) == 1  # reference: 1.0 not deep-equal 1
    assert got == {0, 1}


def test_enum_mixed_scalar_and_complex(spark):
    schema = {"properties": {"a": {"enum": ["scalar-never-matches", [7]]}}}
    df = _mkdf(spark, [(0, [7]), (1, [8])], "id long, a array<long>")
    plan = compile_static(schema, df.schema, id_col="id", partition_col=None)
    got = {r["id"] for r in violations(df, plan).collect()}
    assert got == {1}


def test_enum_map_object_member_raises(spark):
    import pytest

    from xjs.errors import PlanError

    schema = {"properties": {"m": {"enum": [{"k": 1}]}}}
    df = _mkdf(spark, [(0, {"k": 1})], "id long, m map<string, long>")
    with pytest.raises(PlanError):
        compile_static(schema, df.schema, id_col="id", partition_col=None)


# ---------------------------------------------------------------------------
# StructType patternProperties / additionalProperties / dependencies(schema)
# ---------------------------------------------------------------------------

STRUCT_DT = "id long, o struct<name: string, x_a: long, x_b: long, extra: string>"


def _struct_docs(rows):
    docs = []
    for _id, o in rows:
        if o is None:
            docs.append({})
            continue
        d = {k: v for k, v in zip(["name", "x_a", "x_b", "extra"], o) if v is not None}
        docs.append({"o": d})
    return docs


def test_struct_pattern_properties(spark):
    schema = {
        "properties": {
            "o": {
                "properties": {"x_a": {}},  # declared key: pattern skips it
                "patternProperties": {"^x_": {"minimum": 10}},
            }
        }
    }
    rows = [
        (0, ("n", 1, 50, None)),   # x_a declared (skip), x_b=50 ok
        (1, ("n", 1, 3, None)),    # x_b=3 < 10 -> violation
        (2, ("n", None, None, "e")),  # no x_* present -> ok
        (3, None),                 # struct absent -> ok
    ]
    df = _mkdf(spark, rows, STRUCT_DT)
    got = _static_counts(df, schema)
    dyn = _dynamic_counts(schema, _struct_docs(rows))
    assert got == {i: n for i, n in dyn.items() if n}
    assert got == {1: 1}


def test_struct_additional_properties_false(spark):
    schema = {
        "properties": {
            "o": {
                "properties": {"name": {}},
                "patternProperties": {"^x_": {}},
                "additionalProperties": False,
            }
        }
    }
    rows = [
        (0, ("n", 1, 2, None)),    # name declared, x_* pattern-claimed -> ok
        (1, ("n", 1, 2, "boom")),  # extra present -> violation
        (2, None),
    ]
    df = _mkdf(spark, rows, STRUCT_DT)
    got = _static_counts(df, schema)
    dyn = _dynamic_counts(schema, _struct_docs(rows))
    assert got == {i: n for i, n in dyn.items() if n}
    assert got == {1: 1}


def test_struct_additional_properties_schema(spark):
    schema = {
        "properties": {
            "o": {
                "properties": {"name": {}, "x_a": {}, "x_b": {}},
                "additionalProperties": {"maxLength": 2},
            }
        }
    }
    rows = [
        (0, ("n", 1, 2, "ok")),       # extra len 2 -> ok
        (1, ("n", 1, 2, "toolong")),  # extra len 7 -> violation
        (2, ("n", 1, 2, None)),       # extra absent -> ok
    ]
    df = _mkdf(spark, rows, STRUCT_DT)
    got = _static_counts(df, schema)
    dyn = _dynamic_counts(schema, _struct_docs(rows))
    assert got == {i: n for i, n in dyn.items() if n}
    assert got == {1: 1}


def test_struct_schema_form_dependencies(spark):
    # presence of x_a requires name to be at least 3 chars AND x_b present
    schema = {
        "properties": {
            "o": {
                "dependencies": {
                    "x_a": {"required": ["x_b"], "properties": {"name": {"minLength": 3}}}
                }
            }
        }
    }
    rows = [
        (0, ("abc", 1, 2, None)),   # dep satisfied
        (1, ("ab", 1, 2, None)),    # name too short -> violation
        (2, ("ab", None, None, None)),  # x_a absent -> dep vacuous
        (3, ("abc", 1, None, None)),    # x_b missing -> violation
    ]
    df = _mkdf(spark, rows, STRUCT_DT)
    got = _static_counts(df, schema)
    dyn = _dynamic_counts(schema, _struct_docs(rows))
    assert set(got) == {i for i, n in dyn.items() if n}
    assert set(got) == {1, 3}


# ---------------------------------------------------------------------------
# uniqueItems multiplicity
# ---------------------------------------------------------------------------

def test_unique_items_violation_multiplicity(spark):
    schema = {"properties": {"a": {"uniqueItems": True}}}
    rows = [(0, [1, 1, 1, 2]), (1, [1, 2, 3]), (2, [5, 5])]
    df = _mkdf(spark, rows, "id long, a array<long>")
    plan = compile_static(schema, df.schema, id_col="id", partition_col=None)
    res = run_plan(df, plan)
    got = {}
    for r in res.violations.collect():
        got[r["id"]] = got.get(r["id"], 0) + 1
    # dynamic emits one error per duplicate index beyond the first
    dyn = _dynamic_counts(schema, [{"a": list(a)} for _, a in rows])
    assert got == {i: n for i, n in dyn.items() if n}
    assert got == {0: 2, 2: 1}
    # verdict counts carry the same multiplicity (one verdict row per
    # spark partition when partition_col is None — sum them)
    total = sum(
        r["n_violations"] for r in res.verdicts.collect()
        if r["check_name"] == "a.uniqueItems"
    )
    assert total == 3


def test_additional_items_false_multiplicity(spark):
    schema = {"properties": {"a": {"items": [{}, {}], "additionalItems": False}}}
    rows = [(0, [1, 2, 3, 4]), (1, [1, 2])]
    df = _mkdf(spark, rows, "id long, a array<long>")
    plan = compile_static(schema, df.schema, id_col="id", partition_col=None)
    got = {}
    for r in violations(df, plan).collect():
        got[r["id"]] = got.get(r["id"], 0) + 1
    dyn = _dynamic_counts(schema, [{"a": [1, 2, 3, 4]}, {"a": [1, 2]}])
    assert got == {i: n for i, n in dyn.items() if n}
    assert got == {0: 2}


# ---------------------------------------------------------------------------
# plan introspection
# ---------------------------------------------------------------------------

def test_checkplan_explain(spark):
    schema = {
        "required": ["id"],
        "properties": {"s": {"minLength": 2}, "a": {"uniqueItems": True}},
    }
    df = _mkdf(spark, [(0, "xy", [1])], "id long, s string, a array<long>")
    plan = compile_static(schema, df.schema, id_col="id", partition_col=None)
    text = plan.explain()
    assert "id.required" in text
    assert "s.minLength" in text
    assert "a.uniqueItems" in text and "[multiplicity]" in text
    assert repr(plan) == text


def test_items_per_element_indexed_paths(spark):
    """items emits one violation row PER failing element with the
    runtime index in the path (reference keywords.py:227-237)."""
    schema = {"properties": {"a": {"items": {"minimum": 0}}}}
    rows = [(0, [1, -1, 2, -5]), (1, [3, 4]), (2, []), (3, None)]
    df = _mkdf(spark, rows, "id long, a array<long>")
    plan = compile_static(schema, df.schema, id_col="id", partition_col=None)
    got = [(r["id"], r["path"]) for r in violations(df, plan).collect()]
    assert sorted(got) == [(0, "a.1"), (0, "a.3")]
    # dynamic emits the same count at the same indexed paths
    ev = build_evaluator(schema)
    errs = ev({"a": [1, -1, 2, -5]})
    assert sorted(".".join(str(p) for p in e["path"]) for e in errs) == ["a.1", "a.3"]
    assert "[per-element]" in plan.explain()


def test_additional_items_schema_indexed_paths(spark):
    schema = {"properties": {"a": {"items": [{}], "additionalItems": {"maximum": 10}}}}
    rows = [(0, [99, 5, 20, 30])]  # element 0 unchecked (tuple {}), 2 and 3 fail
    df = _mkdf(spark, rows, "id long, a array<long>")
    plan = compile_static(schema, df.schema, id_col="id", partition_col=None)
    got = sorted(r["path"] for r in violations(df, plan).collect())
    assert got == ["a.2", "a.3"]


def test_map_keyword_runtime_key_paths(spark):
    """Map object keywords emit the runtime KEY in the violation path
    (dynamic.py:307-315, 340-344), one row per failing key."""
    schema = {
        "properties": {
            "m": {
                "properties": {"fixed": {"minimum": 100}},
                "patternProperties": {"^x_": {"minimum": 10}},
                "additionalProperties": {"maximum": 0},
            }
        }
    }
    df = _mkdf(
        spark,
        [(0, {"fixed": 1, "x_a": 3, "x_b": 50, "other": 7, "neg": -1})],
        "id long, m map<string, long>",
    )
    plan = compile_static(schema, df.schema, id_col="id", partition_col=None)
    got = sorted((r["path"], r["keyword"]) for r in violations(df, plan).collect())
    assert got == [
        ("m.fixed", "properties"),       # fixed=1 < 100
        ("m.other", "additionalProperties"),  # other=7 > 0
        ("m.x_a", "patternProperties"),  # x_a=3 < 10
    ]
    # dynamic parity on paths (keyword grain differs: dynamic reports
    # the inner keyword, static the object keyword — documented)
    ev = build_evaluator(schema)
    dyn_paths = sorted(
        ".".join(["m"] + [str(p) for p in e["path"][1:]])
        for e in ev({"m": {"fixed": 1, "x_a": 3, "x_b": 50, "other": 7, "neg": -1}})
    )
    assert dyn_paths == [p for p, _ in got]
