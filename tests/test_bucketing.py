"""Bucketed co-located joins eliminate the shuffle entirely."""

import pytest
from pyspark.sql import functions as F

from xjs.sources.bucketing import colocated_join, write_bucketed


@pytest.fixture(scope="module")
def bucketed(spark, sf_dir):
    # warehouse dir is a static conf; tests use the default
    # ./spark-warehouse (gitignored)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    for t in ("b_docs_t", "b_meta_t"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    write_bucketed(docs, "b_docs_t", "doc_id", n_buckets=8)
    write_bucketed(
        docs.select("doc_id", F.length("text").alias("text_len")),
        "b_meta_t", "doc_id", n_buckets=8,
    )
    yield ("b_docs_t", "b_meta_t")
    for t in ("b_docs_t", "b_meta_t"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_bucketed_join_is_exchange_free(spark, bucketed):
    left, right = bucketed
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ path
    try:
        j = colocated_join(spark, left, right, "doc_id")
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
        assert j.count() == 500
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_unbucketed_join_does_shuffle(spark, sf_dir):
    """Control: the same join over plain parquet plans two exchanges."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        meta = docs.select("doc_id", F.length("text").alias("text_len"))
        plan = docs.join(meta, "doc_id")._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
