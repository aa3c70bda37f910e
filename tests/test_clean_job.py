"""End-to-end spark-submit smoke of the boilerplate-cleaning job: the
flagged-gram ledger and cleaned corpus must land, every doc must
survive (cleaning never drops rows), and the injected header/footer
must actually be gone from the cleaned text."""

import json
import os
import shutil
import subprocess
import tempfile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture()
def tmp():
    d = tempfile.mkdtemp(prefix="xjs-cleanjob-", dir=os.path.join(REPO, ".tmp"))
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_clean_job_spark_submit(tmp, spark):
    subprocess.run(
        ["python", os.path.join(REPO, "scripts", "make_pyfiles.py")],
        check=True, capture_output=True,
    )
    proc = subprocess.run(
        [
            "/opt/spark/bin/spark-submit",
            "--master", "local[4]",
            "--py-files", os.path.join(REPO, "dist", "xjs.zip"),
            os.path.join(REPO, "jobs", "clean_boilerplate.py"),
            "--input", "/root/testdata/sf0.001",
            "--out", tmp,
        ],
        capture_output=True, text=True, timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    summary = json.loads(proc.stdout.strip().splitlines()[-1])
    assert summary["n_flagged_grams"] > 0
    assert summary["chars_removed"] > 0
    assert os.path.exists(os.path.join(tmp, "grams", "_SUCCESS"))
    assert os.path.exists(os.path.join(tmp, "cleaned", "_SUCCESS"))

    from pyspark.sql import functions as F

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    cleaned = spark.read.parquet(os.path.join(tmp, "cleaned"))
    assert cleaned.count() == docs.count() == summary["n_docs"]
    # the injected footer phrase must be gone from every cleaned doc
    assert (
        cleaned.filter(F.col("clean_text").contains("newsletter today now")).count()
        == 0
    )


def test_remove_substring_dups_job_spark_submit(tmp, spark):
    """spark-submit e2e of the span-removal job: spans + cleaned land,
    no doc is dropped, exact copies lose (essentially) their whole
    text, and the span/cleaned outputs are mutually consistent."""
    subprocess.run(
        ["python", os.path.join(REPO, "scripts", "make_pyfiles.py")],
        check=True, capture_output=True,
    )
    proc = subprocess.run(
        [
            "/opt/spark/bin/spark-submit",
            "--master", "local[4]",
            "--py-files", os.path.join(REPO, "dist", "xjs.zip"),
            os.path.join(REPO, "jobs", "remove_substring_dups.py"),
            "--input", "/root/testdata/sf0.001",
            "--out", tmp,
        ],
        capture_output=True, text=True, timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    summary = json.loads(proc.stdout.strip().splitlines()[-1])
    assert summary["n_spans"] > 0
    assert summary["tokens_cut"] > 0
    assert os.path.exists(os.path.join(tmp, "spans", "_SUCCESS"))
    assert os.path.exists(os.path.join(tmp, "cleaned", "_SUCCESS"))

    from pyspark.sql import functions as F

    from xjs.pipeline.dedup import dedup_corpus

    corpus = dedup_corpus(spark, "/root/testdata/sf0.001")
    cleaned = spark.read.parquet(os.path.join(tmp, "cleaned"))
    assert cleaned.count() == corpus.count() == summary["n_docs"]
    # injected exact copies (doc_id + 2_000_000) share every window
    # with their base doc -> cleaned to nothing (docs shorter than the
    # window have no windows at all and are legitimately kept whole)
    from xjs.pipeline.dedup import SUBSTR_W

    n_toks = F.size(F.split(F.trim(corpus["text"]), r"\s+"))
    long_ids = [
        r["doc_id"]
        for r in corpus.select("doc_id").filter(n_toks >= SUBSTR_W).collect()
        if r["doc_id"] >= 2_000_000
    ]
    ex = cleaned.filter(F.col("doc_id").isin(long_ids))
    assert ex.count() == len(long_ids) > 0
    assert ex.filter(F.length("clean_text") > 0).count() == 0
    # per-doc token accounting: kept tokens == original - span widths
    # (spans are disjoint by construction)
    spans = spark.read.parquet(os.path.join(tmp, "spans"))
    cut = spans.groupBy("doc_id").agg(
        F.sum(F.col("token_end") - F.col("token_start")).alias("n_cut")
    )
    acct = (
        corpus.select("doc_id", n_toks.alias("n_orig"))
        .join(cleaned, "doc_id")
        .join(cut, "doc_id", "left")
        .withColumn(
            "n_kept",
            F.when(F.length("clean_text") == 0, 0).otherwise(
                F.size(F.split("clean_text", r"\s+"))
            ),
        )
    )
    bad = acct.filter(
        F.col("n_kept") != F.col("n_orig") - F.coalesce(F.col("n_cut"), F.lit(0))
    )
    assert bad.count() == 0
    # docs with no flagged span keep all their tokens
    untouched = acct.filter(F.col("n_cut").isNull())
    assert untouched.count() > 0
    assert untouched.filter(F.col("n_kept") != F.col("n_orig")).count() == 0
