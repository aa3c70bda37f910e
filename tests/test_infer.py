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


def test_schema_diff_detects_evolution():
    from pyspark.sql import types as T

    from xjs.infer import schema_diff

    expected = T.StructType([
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), True),
        T.StructField("meta", T.StructType([
            T.StructField("crawler", T.StringType(), True),
        ]), True),
    ])
    observed = T.StructType([
        T.StructField("url", T.StringType(), True),          # relaxed null
        T.StructField("warc_ts", T.StringType(), True),      # type change!
        T.StructField("meta", T.StructType([
            T.StructField("crawler", T.StringType(), True),
            T.StructField("depth", T.IntegerType(), True),   # nested add
        ]), True),
        T.StructField("lang", T.StringType(), True),         # top-level add
    ])
    d = schema_diff(expected, observed)
    assert d["added"] == ["lang", "meta.depth"]
    assert d["removed"] == []
    assert d["changed"] == [("warc_ts", "timestamp", "string")]
    assert d["nullability"] == [("url", False, True)]
    assert d["compatible"] is False

    # identical schemas are compatible
    same = schema_diff(expected, expected)
    assert same["compatible"] and not same["added"] and not same["nullability"]

    # additions alone stay compatible
    d2 = schema_diff(expected, T.StructType(list(expected.fields) + [
        T.StructField("extra", T.LongType(), True)]))
    assert d2["compatible"] and d2["added"] == ["extra"]
