"""Property-based cross-backend consistency: hypothesis-generated
schemas × rows, the static Catalyst plan vs the dynamic (reference-
parity) evaluator over a fixed flat table shape.

Grain normalization: the static backend emits one violation per
(row, property, keyword); dynamic per-element array errors roll up to
the property's ``items`` keyword.
"""

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import types as T

from xjs import build_evaluator
from xjs.plan import compile_static
from xjs.runtime import violations

TABLE_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("s", T.StringType()),
        T.StructField("n", T.LongType()),
        T.StructField("x", T.DoubleType()),
        T.StructField("arr", T.ArrayType(T.LongType())),
    ]
)

s_schema = st.fixed_dictionaries(
    {},
    optional={
        "minLength": st.integers(0, 6),
        "maxLength": st.integers(0, 6),
        "pattern": st.sampled_from(["a+", "^[ab]+$", "b$"]),
        "enum": st.lists(st.sampled_from(["a", "ab", "ba", ""]), min_size=1, max_size=3, unique=True),
    },
)
n_schema = st.fixed_dictionaries(
    {},
    optional={
        "minimum": st.integers(-3, 5),
        "maximum": st.integers(-3, 8),
        "multipleOf": st.integers(1, 4),
        "enum": st.lists(st.integers(-2, 6), min_size=1, max_size=4, unique=True),
    },
)
x_schema = st.fixed_dictionaries(
    {}, optional={"minimum": st.integers(-2, 3), "maximum": st.integers(-2, 5)}
)
arr_schema = st.fixed_dictionaries(
    {},
    optional={
        "minItems": st.integers(0, 4),
        "maxItems": st.integers(0, 5),
        "uniqueItems": st.just(True),
        "items": st.fixed_dictionaries(
            {}, optional={"minimum": st.integers(-2, 4), "type": st.just("integer")}
        ),
        # complex enum members (round 2): typed array literals + <=>;
        # mixed with never-matching scalars to exercise the
        # type-strict drop
        "enum": st.lists(
            st.one_of(
                st.lists(st.integers(-2, 3), max_size=3),
                st.sampled_from(["nope"]),
            ),
            min_size=1, max_size=3, unique_by=lambda v: str(v),
        ),
    },
)

schemas = st.builds(
    lambda s, n, x, a, req: {
        "required": req,
        "properties": {"s": s, "n": n, "x": x, "arr": a},
    },
    s_schema, n_schema, x_schema, arr_schema,
    st.lists(st.sampled_from(["s", "n", "x", "arr"]), min_size=1, max_size=2, unique=True),
)

rows = st.lists(
    st.tuples(
        st.one_of(st.none(), st.sampled_from(["", "a", "ab", "ba", "aab", "zzz"])),
        st.one_of(st.none(), st.integers(-4, 9)),
        st.one_of(st.none(), st.floats(allow_nan=False, allow_infinity=False, min_value=-4, max_value=6, width=16)),
        # null ELEMENTS are JSON null (not absent): items keywords must
        # treat them per draft-04 type dispatch (round-1 ADVICE)
        st.one_of(st.none(), st.lists(st.one_of(st.none(), st.integers(-3, 5)), max_size=4)),
    ),
    min_size=1,
    max_size=12,
)


def _sanitize(schema):
    for prop in schema["properties"].values():
        if prop.get("maxLength", 99) < prop.get("minLength", 0):
            prop["maxLength"] = prop["minLength"]
        if prop.get("maximum", 99) < prop.get("minimum", -99):
            prop["maximum"] = prop["minimum"]
        if prop.get("maxItems", 99) < prop.get("minItems", 0):
            prop["maxItems"] = prop["minItems"]
    return schema


@pytest.mark.usefixtures("spark")
@settings(max_examples=25, deadline=None, derandomize=True,
          suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow])
@given(schema=schemas, data=rows)
def test_static_equals_dynamic(spark, schema, data):
    schema = _sanitize(schema)
    df = spark.createDataFrame(
        [(i, *r) for i, r in enumerate(data)], TABLE_SCHEMA
    )
    plan = compile_static(schema, df.schema, id_col="id", partition_col=None)
    # grain normalization: the reference's required error carries path
    # [] (value = whole list); static uses the column name — collapse
    # both to path ""
    # items violations carry the element index in the path ("arr.3");
    # normalize to the property grain for the set comparison
    static = {
        (r["id"], "" if r["keyword"] == "required" else r["path"].split(".")[0],
         r["keyword"])
        for r in violations(df, plan).collect()
    }

    ev = build_evaluator(schema)
    dynamic = set()
    for i, r in enumerate(data):
        doc = {k: v for k, v in zip(["s", "n", "x", "arr"], r) if v is not None}
        for e in ev(doc):
            path0 = str(e["path"][0]) if e["path"] else ""
            kw = e["keyword"]
            if len(e["path"]) > 1:  # per-element error -> items grain
                kw = "items"
            dynamic.add((i, path0, kw))

    assert static == dynamic, f"schema={schema}\nrows={data}"
