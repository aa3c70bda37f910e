"""Property-based static-vs-dynamic parity for StructType OBJECT
keywords (round 2: driver-side patternProperties / additionalProperties
/ dependencies resolution).

Unlike the flat-table fuzz (test_hypothesis_static.py), struct-mode
object keywords compile to per-field leaf checks, so the comparison
runs at FULL grain: multisets of (row, dotted path, keyword) must match
the dynamic (reference-parity) evaluator exactly.  Struct rows map to
JSON docs by dropping NULL fields (the absent-key model).
"""

from collections import Counter

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import types as T

from xjs import build_evaluator
from xjs.plan import compile_static
from xjs.runtime import violations

TABLE_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField(
            "o",
            T.StructType(
                [
                    T.StructField("name", T.StringType()),
                    T.StructField("x_a", T.LongType()),
                    T.StructField("x_b", T.LongType()),
                    T.StructField("extra", T.StringType()),
                ]
            ),
        ),
    ]
)
FIELDS = ["name", "x_a", "x_b", "extra"]

leaf_int = st.fixed_dictionaries(
    {}, optional={"minimum": st.integers(-2, 5), "maximum": st.integers(-2, 8)}
)
leaf_str = st.fixed_dictionaries(
    {}, optional={"minLength": st.integers(0, 4), "pattern": st.just("a")}
)

o_schema = st.fixed_dictionaries(
    {},
    optional={
        "properties": st.fixed_dictionaries(
            {}, optional={"name": leaf_str, "x_a": leaf_int}
        ),
        "patternProperties": st.fixed_dictionaries(
            {}, optional={"^x_": leaf_int, "^e": leaf_str}
        ),
        "additionalProperties": st.one_of(st.just(False), leaf_str),
        "required": st.lists(st.sampled_from(FIELDS), max_size=2, unique=True),
        # list-form dependencies (schema form is unit-tested; its
        # violation grain is the whole-object subschema)
        "dependencies": st.fixed_dictionaries(
            {},
            optional={
                "x_a": st.lists(st.sampled_from(["name", "x_b", "extra"]),
                                min_size=1, max_size=2, unique=True)
            },
        ),
    },
)

rows = st.lists(
    st.one_of(
        st.none(),
        st.tuples(
            st.one_of(st.none(), st.sampled_from(["", "a", "ab", "zzz"])),
            st.one_of(st.none(), st.integers(-4, 9)),
            st.one_of(st.none(), st.integers(-4, 9)),
            st.one_of(st.none(), st.sampled_from(["", "a", "long-extra"])),
        ),
    ),
    min_size=1,
    max_size=8,
)


@pytest.mark.usefixtures("spark")
@settings(max_examples=25, deadline=None, derandomize=True,
          suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow])
@given(o=o_schema, data=rows)
def test_struct_object_keywords_match_dynamic(spark, o, data):
    # the reference rejects empty keyword objects / lists at schema
    # time ("at least one key-value pair") — drop them
    o = {
        k: v
        for k, v in o.items()
        if not (isinstance(v, (dict, list)) and len(v) == 0)
    }
    schema = {"properties": {"o": o}}
    df = spark.createDataFrame([(i, r) for i, r in enumerate(data)], TABLE_SCHEMA)
    plan = compile_static(schema, df.schema, id_col="id", partition_col=None)
    static = Counter(
        (r["id"], r["path"], r["keyword"]) for r in violations(df, plan).collect()
    )

    ev = build_evaluator(schema)
    dynamic = Counter()
    for i, r in enumerate(data):
        doc = (
            {}
            if r is None
            else {"o": {k: v for k, v in zip(FIELDS, r) if v is not None}}
        )
        for e in ev(doc):
            dynamic[(i, ".".join(str(p) for p in e["path"]), e["keyword"])] += 1

    assert static == dynamic, f"o={o}\nrows={data}"
