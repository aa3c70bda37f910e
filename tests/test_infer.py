"""Inferred schemas validate their own source with zero violations."""

from xjs.infer import infer_schema
from xjs.plan import compile_static
from xjs.runtime import violations
from xjs.sources.webpages import webpages


def test_inferred_schema_round_trip(spark, sf_dir):
    wp = webpages(spark, sf_dir)
    schema = infer_schema(wp.schema)
    assert schema["properties"]["url"] == {"type": "string"}
    assert schema["properties"]["doc_id"] == {"type": "integer"}
    plan = compile_static(schema, wp.schema, id_col="url", partition_col="partition_id")
    assert violations(wp, plan).count() == 0


def test_inferred_schema_nested(spark):
    df = spark.createDataFrame(
        [(1, ("x", [1, 2]), {"k": 1.5})],
        "id long, s struct<name:string, xs:array<bigint>>, m map<string,double>",
    )
    schema = infer_schema(df.schema)
    assert schema["properties"]["s"]["properties"]["xs"] == {
        "type": "array", "items": {"type": "integer"}
    }
    assert schema["properties"]["m"] == {"type": "object"}
    plan = compile_static(schema, df.schema, id_col="id", partition_col=None)
    assert violations(df, plan).count() == 0
