"""Pushdown & pruning evidence: compiled predicates reach the parquet
scan; day-partitioned layout prunes files; column pruning reads only
referenced columns."""

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from xjs.plan import compile_static
from xjs.sources.tables import with_day_partition, write_table
from xjs.sources.webpages import webpages


@pytest.fixture(scope="module")
def lake(spark):
    d = tempfile.mkdtemp(prefix="xjs-lake-", dir="/root/repo/.tmp")
    wp = with_day_partition(webpages(spark, "/root/testdata/sf0.001"))
    write_table(wp, f"{d}/webpages", partition_by=["warc_day"])
    yield f"{d}/webpages"
    shutil.rmtree(d, ignore_errors=True)


def _plan_str(df):
    return df._jdf.queryExecution().executedPlan().toString()


def test_predicate_pushdown_reaches_scan(spark, lake):
    df = spark.read.parquet(lake)
    plan = compile_static(
        {"required": ["url"], "properties": {"text": {"minLength": 10}}},
        df.schema, id_col="url", partition_col="partition_id",
    )
    # filtering with a compiled predicate pushes to the parquet reader
    [req] = [c for c in plan.checks if c.keyword == "required"]
    filtered = df.filter(~req.pred)  # urls that are null
    s = _plan_str(filtered)
    assert "PushedFilters: [IsNull(url)]" in s or "IsNull(url)" in s


def test_partition_pruning(spark, lake):
    df = spark.read.parquet(lake)
    one_day = df.filter(F.col("warc_day") == "2024-01-01")
    s = _plan_str(one_day)
    # partition filters appear as PartitionFilters, not data filters
    assert "PartitionFilters" in s and "warc_day" in s.split("PartitionFilters")[1][:200]


def test_column_pruning(spark, lake):
    df = spark.read.parquet(lake)
    q = df.select(F.length("text").alias("n")).groupBy().sum("n")
    s = _plan_str(q)
    read_schema = s.split("ReadSchema:")[1].splitlines()[0]
    assert "text" in read_schema
    assert "html" not in read_schema  # binary column never read


def test_static_object_queries_are_narrow_and_pruned(spark):
    """The round-2 static queries (struct object keywords, complex
    enum, uniqueItems multiplicity) must stay shuffle-free — pure
    scan -> project -> explode — and prune the scan to exactly the
    referenced columns."""
    from xjs import dynamic_spark as ds

    expected_cols = {
        "static_struct_object": {"doc_id", "lang", "source", "n_chars"},
        "static_enum_complex": {"doc_id", "lang", "source"},
        "static_unique_items": {"doc_id", "text"},
    }
    for name, q in [
        ("static_struct_object", ds.q_static_struct_object),
        ("static_enum_complex", ds.q_static_enum_complex),
        ("static_unique_items", ds.q_static_unique_items),
    ]:
        plan = _plan_str(q(spark, "/root/testdata/sf0.001"))
        assert "Exchange" not in plan, f"{name} shuffles"
        import re

        m = re.search(r"ReadSchema: struct<([^>]*)", plan)
        cols = {c.split(":")[0] for c in m.group(1).split(",") if c}
        assert cols == expected_cols[name], f"{name} reads {cols}"


def test_jsonl_landing_ingest(spark, sf_dir, tmp_path=None):
    """CC-style landing format: the same compiled plan validates a
    JSONL drop (spark.read.json with an explicit schema — schema
    inference at 100 TB means a second full scan, so production always
    passes the DDL)."""
    import os
    import tempfile

    from pyspark.sql import functions as F, types as T

    from xjs.flagship import compile_plan
    from xjs.runtime import violations
    from xjs.sources.webpages import webpages

    os.makedirs("/root/repo/.tmp", exist_ok=True)
    d = tempfile.mkdtemp(prefix="xjs-jsonl-", dir="/root/repo/.tmp")
    wp = webpages(spark, sf_dir)
    # JSON has no binary/timestamp: land as base64 + ISO string (the
    # crawler-side convention), restore types on read
    wp.select(
        "url",
        F.date_format("warc_ts", "yyyy-MM-dd HH:mm:ss").alias("warc_ts"),
        F.base64("html").alias("html_b64"),
        "text", "lang", "partition_id", "doc_id", "source",
    ).write.mode("overwrite").json(d)

    ddl = ("url string, warc_ts string, html_b64 string, text string, "
           "lang string, partition_id int, doc_id bigint, source string")
    landed = (
        spark.read.schema(T.StructType.fromDDL(ddl)).json(d)
        .select(
            "url",
            F.to_timestamp("warc_ts").alias("warc_ts"),
            F.unbase64("html_b64").alias("html"),
            "text", "lang", "partition_id", "doc_id", "source",
        )
    )
    got = violations(landed, compile_plan(landed))
    expected = violations(wp, compile_plan(wp))
    assert got.count() == expected.count()
    assert got.exceptAll(expected.select(got.columns)).count() == 0
    import shutil

    shutil.rmtree(d, ignore_errors=True)
