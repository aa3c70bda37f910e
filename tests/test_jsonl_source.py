"""JSONL crawl ingestion: the clean/quarantine split must partition
the input exactly (nothing silently dropped), invert the fixture
generator byte-for-byte on clean rows, and attribute each quarantined
line to the right reason with enough raw context to debug it."""

import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from xjs.sources.jsonl import (
    CORRUPT_MOD,
    RES_BAD_TS,
    RES_TRUNCATED,
    read_jsonl_webpages,
    write_jsonl_fixture,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def fixture_path(spark, sf_dir):
    base = tempfile.mkdtemp(prefix="t-jsonl-", dir=os.path.join(REPO, ".tmp"))
    yield write_jsonl_fixture(spark, sf_dir, os.path.join(base, "jl"))
    shutil.rmtree(base, ignore_errors=True)


def test_split_partitions_input_exactly(spark, sf_dir, fixture_path):
    n_lines = spark.read.text(fixture_path).count()
    clean, quarantine = read_jsonl_webpages(spark, fixture_path)
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert n_lines == n_docs
    assert clean.count() + quarantine.count() == n_lines
    # class sizes follow the residue formula
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_tr = docs.filter(F.col("doc_id") % CORRUPT_MOD == RES_TRUNCATED).count()
    n_bt = docs.filter(F.col("doc_id") % CORRUPT_MOD == RES_BAD_TS).count()
    by_reason = {r.reason: r.n for r in quarantine.groupBy("reason")
                 .agg(F.count(F.lit(1)).alias("n")).collect()}
    assert by_reason == {"corrupt_json": n_tr, "bad_timestamp": n_bt}


def test_clean_rows_invert_the_generator(spark, sf_dir, fixture_path):
    """text/lang round-trip byte-identically through JSON encode +
    Spark's reader for every clean row."""
    clean, _ = read_jsonl_webpages(spark, fixture_path)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", F.col("text").alias("want_text"),
        F.col("lang").alias("want_lang"),
    )
    j = clean.join(docs, "doc_id")
    assert j.count() == clean.count()
    assert j.filter(
        (F.col("text") != F.col("want_text"))
        | ~F.col("lang").eqNullSafe(F.col("want_lang"))
    ).count() == 0
    # timestamps are the stated formula (monotone in doc_id)
    bad = j.filter(
        F.col("warc_ts") != F.to_timestamp(F.lit("2024-01-01 00:00:00"))
        + F.make_interval(secs=F.col("doc_id").cast("double"))
    )
    assert bad.count() == 0


def test_quarantine_rows_carry_debuggable_raw(spark, fixture_path):
    _, quarantine = read_jsonl_webpages(spark, fixture_path)
    corrupt = quarantine.filter(F.col("reason") == "corrupt_json")
    # unparseable lines: no doc_id, raw is the truncated line (opens
    # like JSON, does not close)
    assert corrupt.filter(F.col("doc_id").isNotNull()).count() == 0
    assert corrupt.filter(~F.col("raw").startswith('{"doc_id"')).count() == 0
    assert corrupt.filter(F.col("raw").endswith("}")).count() == 0
    bad_ts = quarantine.filter(F.col("reason") == "bad_timestamp")
    # valid JSON: doc_id recovered, raw is the offending field value
    assert bad_ts.filter(F.col("doc_id").isNull()).count() == 0
    assert bad_ts.filter(F.col("raw") != "not-a-timestamp").count() == 0


def test_fixture_rebuild_is_deterministic(spark, sf_dir):
    base = tempfile.mkdtemp(prefix="t-jsonl-det-", dir=os.path.join(REPO, ".tmp"))
    try:
        a = write_jsonl_fixture(spark, sf_dir, os.path.join(base, "a"))
        b = write_jsonl_fixture(spark, sf_dir, os.path.join(base, "b"))
        la = spark.read.text(a)
        lb = spark.read.text(b)
        assert la.count() == lb.count()
        assert la.exceptAll(lb).count() == 0
    finally:
        shutil.rmtree(base, ignore_errors=True)
