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
