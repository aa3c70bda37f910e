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
